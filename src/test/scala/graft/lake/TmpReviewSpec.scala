package graft.lake

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.events.EventLog

class TmpReviewSpec extends SparkSuite {
  import spark.implicits._

  private def ev(
      lsn: Long, op: String, repo: String = null, path: String = null,
      commit: String = null, lang: String = null, content: String = null,
      sc: String = null, extra: String = null, eventId: Long = 0L): Row =
    Row(lsn, eventId, new java.sql.Timestamp(1700000000000L + lsn * 1000), op,
      repo, path, commit, lang, content, sc, extra)

  private def batch(rows: Row*): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), EventLog.eventSchema)

  private val renameToRating = """{"renameColumn":{"name":"stars","to":"rating"}}"""

  test("verbatim copy of the spec's prune test") {
    val t = new LakeTable(spark, tmpDir("renprune2"))
    t.create(LakeTable.baseSchema)
    val rows = for (i <- 0 until 200)
      yield ev(i + 1, "insert", f"r${i % 20}%02d", f"p$i%03d", s"c$i", "scala",
        s"v$i", extra = s"""{"stars": ${i % 20}}""")
    t.merge(batch(Seq(ev(0, "schema_change",
      sc = """{"addColumn":{"name":"stars","type":"long"}}""")) ++ rows: _*), "e", 0)
    t.merge(batch(ev(1000, "schema_change", sc = renameToRating)), "e", 1)
    t.compact(targetRowsPerFile = 20, full = true)
    val total = t.head().files.count(f => !f.tomb)
    assert(total >= 8, s"expected many files, got $total")
    val pred = col("rating") === 7L
    val pruned = t.readWhere(pred)
    assert(pruned.collect().toSet === t.read().filter(pred).collect().toSet)
    pruned.collect()
    val scanned = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.map(_.metrics("numFiles").value).sum
    println(s"VERBATIM SCANNED $scanned OF $total")
    println(s"INPUT FILES: ${pruned.inputFiles.length}")
    val fresh = new LakeTable(spark, t.root)
    println(s"FRESH INPUT FILES: ${fresh.readWhere(pred).inputFiles.length}")
    println("HEADER DEFINED: " + t.log.readHeader(t.head().version).isDefined)
    assert(scanned < total / 2,
      s"rating bounds should prune via the physical stars stats: $scanned of $total")
  }
}
