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

    // first-wins column adds + whitelisted type widens (mirrors the engine's
    // schema-change handling: widen gates the PARSE type by its lsn; anything
    // non-whitelisted is quarantined, i.e. ignored here too)
    var addLsn = Vector.empty[(String, DataType, Long)]
    var widenAt = Map.empty[String, (Long, DataType)] // name -> (lsn, FROM type)
    var droppedNames = Set.empty[String] // drop tombstones (PHYSICAL names)
    // current name -> ascending (renameLsn, priorName): the extras key a
    // pre-rename row parses (mirrors the engine's era-gated projection)
    var renameAt = Map.empty[String, Seq[(Long, String)]]
    def physOf(n: String): String =
      renameAt.get(n).flatMap(_.headOption.map(_._2)).getOrElse(n)
    for (r <- sorted if r.getString(3) == "schema_change" && !r.isNullAt(9)) {
      // any unparseable/unknown payload is IGNORED, mirroring the engine's
      // quarantine (an oracle that throws where the engine proceeds cannot
      // compare end states)
      try {
        implicit val fmt: Formats = DefaultFormats
        val sc = JsonMethods.parse(r.getString(9))
        val add = sc \ "addColumn"
        val widen = sc \ "widenColumn"
        val drop = sc \ "dropColumn"
        val rename = sc \ "renameColumn"
        if (add != JNothing) {
          val name = (add \ "name").extract[String]
          if (!addLsn.exists(_._1 == name) && !droppedNames.contains(name) &&
              !renameAt.values.exists(_.headOption.exists(_._2 == name)) &&
              !LakeTable.baseSchema.fieldNames.contains(name))
            addLsn :+= ((name, LakeTable.parseTypeName((add \ "type").extract[String]), r.getLong(0)))
        } else if (drop != JNothing) {
          // mirrors the engine: only LOG-ADDED columns drop (base-schema
          // drops quarantine); the drop tombstones the PHYSICAL name so a
          // later re-add of it is refused (stale values must not resurrect)
          val name = (drop \ "name").extract[String]
          if (addLsn.exists(_._1 == name)) {
            droppedNames += physOf(name)
            addLsn = addLsn.filterNot(_._1 == name)
            widenAt -= name
            renameAt -= name
          }
        } else if (rename != JNothing) {
          // mirrors the engine: value-preserving metadata rename of a
          // log-added column; target must be free of logical, physical,
          // tombstoned, and base names
          val name = (rename \ "name").extract[String]
          val to = (rename \ "to").extract[String]
          val targetTaken = addLsn.exists(_._1 == to) ||
            droppedNames.contains(to) ||
            renameAt.values.exists(_.headOption.exists(_._2 == to)) ||
            LakeTable.baseSchema.fieldNames.contains(to)
          addLsn.zipWithIndex.find(_._1._1 == name) match {
            case Some(((_, dt, at), i)) if !targetTaken =>
              addLsn = addLsn.updated(i, (to, dt, at))
              widenAt.get(name).foreach { w => widenAt += (to -> w); widenAt -= name }
              renameAt += (to -> (renameAt.getOrElse(name, Nil) :+ ((r.getLong(0), name))))
              renameAt -= name
            case _ => () // unknown/base column or taken target: quarantined
          }
        } else if (widen != JNothing) {
          val name = (widen \ "name").extract[String]
          val target = LakeTable.parseTypeName((widen \ "type").extract[String])
          addLsn.zipWithIndex.find(_._1._1 == name) match {
            case Some(((_, from, at), i))
              if from != target && LakeTable.widensTo(from, target) =>
              widenAt += (name -> (r.getLong(0), from))
              addLsn = addLsn.updated(i, (name, target, at))
            case _ => () // no such column / not a safe widening: quarantined
          }
        }
      } catch { case scala.util.control.NonFatal(_) => () }
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
        // BigDecimal numbers: the engine casts the raw JSON token text to the
        // column type (get_json_object(...).cast), so a float extra must
        // round from the TEXT — parsing to double first then narrowing
        // double-rounds and can diverge in the last ulp
        val extras: Map[String, JValue] = Option(r.getString(10))
          .map(s => JsonMethods.parse(s, useBigDecimalForDouble = true)
            .asInstanceOf[JObject].obj.toMap)
          .getOrElse(Map.empty)
        val evolvedVals = addLsn.map { case (name, dt, at) =>
          // era-gated extras key: the name current at THIS row's lsn
          // (earliest rename at-or-after the row wins — engine parity)
          val eraKey = renameAt.getOrElse(name, Nil).collectFirst {
            case (rLsn, prior) if r.getLong(0) <= rLsn => prior
          }.getOrElse(name)
          if (r.getLong(0) > at)
            extras.get(eraKey).map { jv =>
              widenAt.get(name) match {
                // pre-widen rows parse through the ORIGINAL type, then widen
                // (matching both the engine's lsn-gated cast chain and how a
                // stored pre-widen physical value reads back)
                case Some((wLsn, from)) if r.getLong(0) <= wLsn =>
                  widenVal(castJ(jv, from), dt)
                case _ => castJ(jv, dt)
              }
            }.orNull
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

  private def widenVal(v: Any, to: DataType): Any = (v, to) match {
    case (null, _) => null
    case (i: Int, LongType) => i.toLong
    case (f: Float, DoubleType) => f.toDouble
    case _ => v
  }

  private def castJ(jv: JValue, dt: DataType): Any = (jv, dt) match {
    case (JNull, _) => null
    case (JDecimal(d), FloatType) => d.toFloat // correctly rounded from text
    case (v, FloatType) => castJ(v, DoubleType) match {
      case d: Double => d.toFloat
      case _ => null
    }
    case (v, LongType) => v match {
      case JInt(i) => i.toLong
      case JLong(l) => l
      case JString(s) => s.toLong
      case JDouble(d) => d.toLong
      case JDecimal(d) => d.toLong
      case _ => null
    }
    case (v, DoubleType) => v match {
      case JDouble(d) => d
      case JDecimal(d) => d.toDouble
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
