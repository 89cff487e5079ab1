package graft.stream

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSuite

/** Cross-batch stateful exact dedup ([[StreamDedup]]): first arrival wins
  * across micro-batches, least-order wins within one, and the
  * watermark-bounded variant expires suppression state with the horizon.
  */
class StreamDedupSpec extends SparkSuite {
  import spark.implicits._

  test("firstSeen: first arrival wins across batches, min-order within a batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, String)]
    val out = StreamDedup.firstSeen(
      mem.toDF().toDF("content_sha", "lsn", "payload"), "content_sha", "lsn")
    val q = out.writeStream.format("memory").queryName("dedup_first").start()
    try {
      // batch 1: duplicate key "a" within the batch → least-lsn row wins
      mem.addData(("a", 5L, "a5"), ("a", 3L, "a3"), ("b", 10L, "b10"))
      q.processAllAvailable()
      // batch 2: "a" again (even with a SMALLER lsn — first ARRIVAL already
      // emitted), plus a fresh key
      mem.addData(("a", 1L, "a1"), ("c", 7L, "c7"))
      q.processAllAvailable()
      // batch 3: nothing new
      mem.addData(("b", 2L, "b2"))
      q.processAllAvailable()
      val rows = spark.table("dedup_first")
        .as[(String, Long, String)].collect().toSet
      assert(rows === Set(("a", 3L, "a3"), ("b", 10L, "b10"), ("c", 7L, "c7")))
    } finally q.stop()
  }

  test("firstSeen on a batch frame degenerates to min-by-order exact dedup") {
    val df = Seq(("a", 5L, "a5"), ("a", 3L, "a3"), ("b", 10L, "b10"), ("a", 9L, "a9"))
      .toDF("content_sha", "lsn", "payload")
    val got = StreamDedup.firstSeen(df, "content_sha", "lsn")
      .as[(String, Long, String)].collect().toSet
    assert(got === Set(("a", 3L, "a3"), ("b", 10L, "b10")))
  }

  test("firstSeenWithinWatermark: suppresses inside the horizon, state expires past it") {
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000L
    def ts(s: Long) = new Timestamp(s * 1000)
    val mem = MemoryStream[(String, Timestamp, String)]
    val out = StreamDedup.firstSeenWithinWatermark(
      mem.toDF().toDF("content_sha", "ts", "payload"),
      Seq("content_sha"), "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedup_wm")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      mem.addData(("k", ts(t0), "first"), ("k", ts(t0 + 60), "dup-in-horizon"))
      q.processAllAvailable()
      // push the watermark far past k's expiry with an unrelated key
      mem.addData(("w", ts(t0 + 7200), "wm-driver"))
      q.processAllAvailable()
      mem.addData(("w", ts(t0 + 7260), "wm-driver-2")) // batch that evicts k
      q.processAllAvailable()
      // k re-arrives AFTER its state expired → emitted again (the bounded
      // trade: exactness within the horizon only)
      mem.addData(("k", ts(t0 + 7800), "re-arrival"))
      q.processAllAvailable()
      val payloads = spark.table("dedup_wm").select("payload").as[String]
        .collect().toSeq
      assert(payloads.count(_ == "first") === 1)
      assert(!payloads.contains("dup-in-horizon"))
      assert(payloads.contains("re-arrival"))
    } finally q.stop()
  }
}
