package graft.events

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.lake.LakeTable

/** Independent correctness oracle for CDC replay (FIXTURES.md §1.3): a plain
  * Scala fold over the collected, totally-ordered event list — deliberately
  * NOT Spark, so it cannot share a bug with the engine's window/merge path.
  * Test-scale only (collects to the driver).
  */
object ReplayOracle {

  /** Expected final table (same schema the lake table evolves to). */
  def expected(spark: SparkSession, events: Seq[Row]): DataFrame = {
    // total order
    val sorted = events.sortBy(r => (r.getLong(0), r.getLong(1)))

    // first-wins column adds
    var addLsn = Vector.empty[(String, DataType, Long)]
    for (r <- sorted if r.getString(3) == "schema_change" && !r.isNullAt(9)) {
      implicit val fmt: Formats = DefaultFormats
      val j = JsonMethods.parse(r.getString(9)) \ "addColumn"
      val name = (j \ "name").extract[String]
      if (!addLsn.exists(_._1 == name) && !LakeTable.baseSchema.fieldNames.contains(name))
        addLsn :+= ((name, LakeTable.parseTypeName((j \ "type").extract[String]), r.getLong(0)))
    }

    // max-(lsn,event_id)-wins fold per key
    val winner = scala.collection.mutable.Map.empty[(String, String), Row]
    for (r <- sorted if r.getString(3) != "schema_change") {
      val k = (r.getString(4), r.getString(5))
      winner.get(k) match {
        case Some(w) if w.getLong(0) > r.getLong(0) ||
          (w.getLong(0) == r.getLong(0) && w.getLong(1) >= r.getLong(1)) => ()
        case _ => winner(k) = r
      }
    }

    implicit val fmt: Formats = DefaultFormats
    val outRows = winner.values.toSeq
      .filter(_.getString(3) != "delete")
      .map { r =>
        val extras: Map[String, JValue] = Option(r.getString(10))
          .map(s => JsonMethods.parse(s).asInstanceOf[JObject].obj.toMap)
          .getOrElse(Map.empty)
        val evolvedVals = addLsn.map { case (name, dt, at) =>
          if (r.getLong(0) > at)
            extras.get(name).map(jv => castJ(jv, dt)).orNull
          else null
        }
        Row.fromSeq(Seq(r.getString(4), r.getString(5), r.getString(6),
          r.getString(7), r.getString(8)) ++ evolvedVals)
      }

    val schema = StructType(LakeTable.baseSchema.fields.toSeq ++
      addLsn.map { case (n, dt, _) => StructField(n, dt, nullable = true) })
    spark.createDataFrame(
      spark.sparkContext.parallelize(outRows, math.max(1, outRows.size / 10000 + 1)), schema)
  }

  private def castJ(jv: JValue, dt: DataType): Any = (jv, dt) match {
    case (JNull, _) => null
    case (v, LongType) => v match {
      case JInt(i) => i.toLong
      case JLong(l) => l
      case JString(s) => s.toLong
      case JDouble(d) => d.toLong
      case _ => null
    }
    case (v, DoubleType) => v match {
      case JDouble(d) => d
      case JInt(i) => i.toDouble
      case JLong(l) => l.toDouble
      case JString(s) => s.toDouble
      case _ => null
    }
    case (JString(s), StringType) => s
    case (v, StringType) => JsonMethods.compact(JsonMethods.render(v))
    case (JBool(b), BooleanType) => b
    case (v, IntegerType) => castJ(v, LongType) match {
      case l: Long => l.toInt
      case _ => null
    }
    case _ => null
  }
}
