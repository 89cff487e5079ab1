package graft.stream

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSuite
import graft.events.EventLog

class ChangeRatesSpec extends SparkSuite {
  import spark.implicits._

  private def eventDf(rows: Seq[(Long, String, String, Long)]) = {
    // (lsn, op, repo, tsSeconds)
    val data = rows.map { case (lsn, op, repo, tss) =>
      org.apache.spark.sql.Row(lsn, 0L, new Timestamp(tss * 1000), op, repo,
        "p", "c", "scala", "v", null, null)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 2), EventLog.eventSchema)
  }

  test("windowedRates: tumbling event-time counts per repo (batch semantics)") {
    val t0 = 1700000000L
    val df = eventDf(Seq(
      (1, "insert", "r1", t0), (2, "update", "r1", t0 + 600),
      (3, "delete", "r1", t0 + 3900), // next hour window
      (4, "insert", "r2", t0 + 60)))
    // run the same plan in batch mode: window semantics identical,
    // watermark is a no-op outside streaming
    val res = ChangeRates.windowedRates(df)
      .select("repo", "changes", "deletes").as[(String, Long, Long)]
      .collect().toSet
    assert(res === Set(("r1", 2L, 0L), ("r1", 1L, 1L), ("r2", 1L, 0L)))
  }

  test("windowedRates over a MemoryStream with watermark emits closed windows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, String)]
    val events = mem.toDF().toDF("lsn", "ts", "op", "repo")
      .withColumn("event_id", lit(0L)).withColumn("path", lit("p"))
      .withColumn("commit", lit("c")).withColumn("lang", lit("s"))
      .withColumn("content", lit("v")).withColumn("schema_change", lit(null: String))
      .withColumn("extra", lit(null: String))
    val q = ChangeRates.windowedRates(events, "1 hour", "1 hour")
      .writeStream.format("memory").queryName("rates").outputMode(OutputMode.Append()).start()
    val t0 = 1700000000L
    def ts(s: Long) = new Timestamp(s * 1000)
    mem.addData((1L, ts(t0), "insert", "r1"), (2L, ts(t0 + 60), "update", "r1"))
    q.processAllAvailable()
    // advance watermark far past the first window → it closes and emits
    mem.addData((3L, ts(t0 + 3 * 3600), "insert", "r1"))
    q.processAllAvailable()
    val rows = spark.table("rates").select("repo", "changes")
      .as[(String, Long)].collect().toSet
    q.stop()
    assert(rows.contains(("r1", 2L)), rows.toString)
  }

  test("repoBursts sessionizes consecutive changes with gap splits") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val t0 = 1700000000L
    def ts(s: Long) = new Timestamp(s * 1000)
    val df = mem.toDF().toDF("repo", "ts")
      .withColumn("op", lit("update"))
    val bursts = ChangeRates.repoBursts(spark, df, gapMs = 600000L) // 10 min gap, event-time
    val q = bursts.writeStream.format("memory").queryName("bursts")
      .outputMode(OutputMode.Append()).start()
    // burst of 3 close changes, then a far-away change → first burst closes
    mem.addData(("r1", ts(t0)), ("r1", ts(t0 + 60)), ("r1", ts(t0 + 120)))
    q.processAllAvailable()
    mem.addData(("r1", ts(t0 + 7200))) // 2h later: new burst, old one emitted
    q.processAllAvailable()
    val rows = spark.table("bursts")
      .select("repo", "changes").as[(String, Long)].collect().toSet
    q.stop()
    assert(rows.contains(("r1", 3L)), rows.toString)
  }
}
