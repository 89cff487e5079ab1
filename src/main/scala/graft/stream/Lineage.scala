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
  */
final class Lineage(spark: SparkSession, root: String) {
  import spark.implicits._
  private val dir = s"$root/lineage"
  private val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long, String, Long)]

  def record(st: MergeStats): Unit = synchronized {
    buf ++= Seq(
      ("eventsSeen", st.eventsSeen),
      ("duplicatesDropped", st.duplicatesDropped),
      ("upserts", st.upserts),
      ("deletes", st.deletes),
      ("schemaChanges", st.schemaChanges),
      ("snapshotVersion", st.version),
      ("noOp", if (st.noOp) 1L else 0L)
    ).map { case (m, v) => (st.epoch, st.batchId, m, v) }
  }

  def recordProgress(epoch: String, batchId: Long, durationMs: Long, inputRows: Long): Unit =
    synchronized {
      buf += ((epoch, batchId, "batchDurationMs", durationMs))
      buf += ((epoch, batchId, "inputRows", inputRows))
    }

  /** Write buffered rows and clear the buffer. */
  def flush(): Unit = synchronized {
    if (buf.nonEmpty) {
      buf.toSeq.toDF("epoch", "batch_id", "metric", "value")
        .coalesce(1).write.mode("append").parquet(dir)
      buf.clear()
    }
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
