package graft.stream

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.events.EventLog
import graft.lake.{LakeTable, MergeStats}

/** Structured-Streaming CDC ingest: tail the event-log directory as a file
  * stream and replay each micro-batch into the lake table via
  * `foreachBatch { merge }` (north rule; reimagines Borderlands'
  * cron-batch + state-readback loop, src/flows/media.py:57-83, as a stream).
  *
  * Exactly-once: the checkpoint makes batch composition deterministic
  * (same batchId ⇒ same files ⇒ same events) and [[LakeTable.merge]] is
  * idempotent per (epoch, batchId) via the snapshot ledger — a batch replayed
  * after a crash between merge-commit and checkpoint-commit is a no-op.
  * `Trigger.AvailableNow` drains the log and stops, which is also the
  * catch-up/resume mode.
  */
final class CdcIngest(
    spark: SparkSession,
    tableRoot: String,
    eventsDir: String,
    checkpointDir: String,
    epoch: String = "run0",
    maxFilesPerTrigger: Int = 4,
    saltBuckets: Int = 0,
    lineage: Option[Lineage] = None) {

  val table = new LakeTable(spark, tableRoot)

  @volatile var stats: List[MergeStats] = Nil

  /** Start draining the event log; returns the running query. */
  def start(): StreamingQuery = {
    table.create(LakeTable.baseSchema)
    val stream = spark.readStream
      .schema(EventLog.eventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("latestFirst", "false")
      .parquet(eventsDir)
    stream.writeStream
      .queryName(s"graft-cdc-$epoch")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val st = table.merge(batch, epoch, batchId, saltBuckets)
        stats = st :: stats
        lineage.foreach(_.record(st))
      }
      .start()
  }

  /** Drain everything available and wait. */
  def runToCompletion(): List[MergeStats] = {
    val q = start()
    q.awaitTermination()
    lineage.foreach(_.flush())
    stats.reverse
  }
}
