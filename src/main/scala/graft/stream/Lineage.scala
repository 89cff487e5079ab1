package graft.stream

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import graft.lake.MergeStats

/** Lineage/metrics sidecar (SURVEY.md §7.6): per-batch merge counters plus
  * StreamingQueryListener progress rows, appended as parquet under
  * `<root>/lineage`. Spark-native replacement for the reference's Prefect
  * artifact/alert pattern (Borderlands src/borderlands/oryx.py:46-80).
  *
  * Long-form rows `(epoch, batch_id, metric, value)` so new counters never
  * change the sidecar schema. Rows are buffered in memory and flushed once
  * per drain — a tiny single-task parquet write per BATCH would otherwise be
  * pure serial time in the ingest loop (it cost ~15% of wall at bench scale).
  *
  * `flushEvery` > 0 additionally flushes after every N record events (batch,
  * progress, or operator counters — anything that buffers rows counts): a
  * run-forever `ProcessingTime` ingest neither grows the buffer unboundedly
  * nor loses more than the last N batches' metrics on a crash (AvailableNow
  * drains still end with an explicit flush, so nothing is lost there).
  */
final class Lineage(spark: SparkSession, root: String, flushEvery: Int = 0) {
  import spark.implicits._
  private val dir = s"$root/lineage"
  private val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long, String, Long)]
  private var sinceFlush = 0

  private def batchRecorded(): Unit = {
    sinceFlush += 1
    if (flushEvery > 0 && sinceFlush >= flushEvery) flush()
  }

  def record(st: MergeStats): Unit = synchronized {
    buf ++= Seq(
      ("eventsSeen", st.eventsSeen),
      ("duplicatesDropped", st.duplicatesDropped),
      ("upserts", st.upserts),
      ("deletes", st.deletes),
      ("schemaChanges", st.schemaChanges),
      ("schemaQuarantined", st.schemaQuarantined),
      ("constraintQuarantined", st.constraintQuarantined),
      ("snapshotVersion", st.version),
      ("noOp", if (st.noOp) 1L else 0L)
    ).map { case (m, v) => (st.epoch, st.batchId, m, v) }
    batchRecorded()
  }

  /** Operator-level counter (batch ops outside the ingest loop — e.g. dedup
    * bucket-cap quarantine counts): epoch = operator name, batch_id = -1.
    */
  def recordOp(op: String, metric: String, value: Long): Unit = synchronized {
    buf += ((op, -1L, metric, value))
    batchRecorded() // op-only workloads must still hit the periodic flush
  }

  def recordProgress(epoch: String, batchId: Long, durationMs: Long, inputRows: Long): Unit =
    synchronized {
      buf += ((epoch, batchId, "batchDurationMs", durationMs))
      buf += ((epoch, batchId, "inputRows", inputRows))
      batchRecorded()
    }

  /** Write buffered rows and clear the buffer. */
  def flush(): Unit = synchronized {
    if (buf.nonEmpty) {
      buf.toSeq.toDF("epoch", "batch_id", "metric", "value")
        .coalesce(1).write.mode("append").parquet(dir)
      buf.clear()
    }
    sinceFlush = 0
  }

  def read(): org.apache.spark.sql.DataFrame = spark.read.parquet(dir)

  /** Attach a listener that lands per-batch duration/rate rows. */
  def listener(epoch: String): StreamingQueryListener = new StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      if (p.name != null && p.name.startsWith("graft-cdc-"))
        recordProgress(epoch, p.batchId, p.batchDuration, p.numInputRows)
    }
  }
}
