package graft.stream

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.events.EventLog
import graft.lake.LakeTable

/** Medallion cascade: one lake table's change feed streamed into another
  * lake table (`readStream.format("graft-changes")` → transform →
  * `writeStream.format("graft")`), the bronze→silver pattern a derived-table
  * pipeline runs at scale. The feed's `_lsn` becomes the downstream event
  * LSN, so the silver merge is last-wins in the SAME order the bronze table
  * applied — re-delivery and batch re-splits cannot reorder it — and
  * `_deleted` rows become delete events, so upstream deletes propagate.
  * Exactly-once across restarts comes from the checkpointed source offsets
  * plus the sink's (epoch, batchId) ledger.
  */
class CascadeSpec extends SparkSuite {
  import spark.implicits._

  private def ev(
      lsn: Long, op: String, repo: String = null, path: String = null,
      commit: String = null, lang: String = null, content: String = null): Row =
    Row(lsn, 0L, new java.sql.Timestamp(1700000000000L + lsn * 1000), op,
      repo, path, commit, lang, content, null, null)

  private def batch(rows: Row*): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), EventLog.eventSchema)

  /** Feed rows → downstream event frame: upserts carry the transformed
    * value columns, deletes carry just the key; both reuse the upstream
    * `_lsn` so the silver merge replays bronze's own order.
    */
  private def toEvents(feed: DataFrame): DataFrame =
    feed.select(
      col("_lsn").as("lsn"),
      lit(0L).as("event_id"),
      when(col("_deleted"), "delete").otherwise("insert").as("op"),
      col("repo"), col("path"), col("commit"), col("lang"),
      // the "silver" transform under test: normalized content
      upper(col("content")).as("content"),
      lit(null).cast("string").as("schema_change"),
      lit(null).cast("string").as("extra"))

  test("bronze change feed streams into a silver table: upserts, deletes, restart") {
    val bronzeRoot = tmpDir("cascade-bronze")
    val silverRoot = tmpDir("cascade-silver")
    val chk = tmpDir("cascade-chk")
    val bronze = new LakeTable(spark, bronzeRoot)
    bronze.create(LakeTable.baseSchema)
    bronze.merge(batch(
      ev(1, "insert", "r1", "a", "c1", "scala", "one"),
      ev(2, "insert", "r2", "b", "c1", "scala", "two")), "up", 0)

    def silverState(): Set[(String, String, String)] =
      new LakeTable(spark, silverRoot).read()
        .select("repo", "path", "content").as[(String, String, String)]
        .collect().toSet

    def startCascade() = toEvents(
      spark.readStream.format("graft-changes")
        .option("path", bronzeRoot).option("startingVersion", "earliest")
        .load())
      .writeStream.format("graft")
      .option("path", silverRoot).option("epoch", "cascade")
      .option("checkpointLocation", chk)
      .start()

    val q = startCascade()
    try {
      q.processAllAvailable()
      assert(silverState() === Set(("r1", "a", "ONE"), ("r2", "b", "TWO")))
      // update + delete upstream propagate through the live stream
      bronze.merge(batch(
        ev(3, "update", "r1", "a", "c2", "scala", "one-v2"),
        ev(4, "delete", "r2", "b")), "up", 1)
      q.processAllAvailable()
      assert(silverState() === Set(("r1", "a", "ONE-V2")))
    } finally q.stop()

    // restart from the checkpoint: only versions after the committed offset
    // replay; prior batches are no-ops under the silver ledger
    bronze.merge(batch(ev(5, "insert", "r3", "c", "c3", "scala", "three")), "up", 2)
    val q2 = startCascade()
    try {
      q2.processAllAvailable()
      assert(silverState() === Set(("r1", "a", "ONE-V2"), ("r3", "c", "THREE")))
    } finally q2.stop()
    // and the silver history stayed serial + exactly-once: no version holds
    // a duplicate application of the same bronze window
    val silver = new LakeTable(spark, silverRoot)
    assert(silver.read().count() === 2)
  }
}
