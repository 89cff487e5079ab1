package graft.lake

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.events.EventLog

/** readWhere must equal read().filter even while merge-on-read deltas are
  * pending: non-key stat bounds must not drop a base file whose newer row
  * shadows an older delta row for the same key.
  */
class DeltaPruneSoundnessSpec extends SparkSuite {
  import spark.implicits._

  private def ev(lsn: Long, op: String, repo: String, path: String,
                 lang: String, content: String = null): Row =
    Row(lsn, 0L, new java.sql.Timestamp(1700000000000L + lsn), op,
      repo, path, "c", lang, content, null, null)

  private def batch(rows: Row*) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 2), EventLog.eventSchema)

  test("stat-column readWhere stays exact with pending deltas (stale shadowed row)") {
    val t = new LakeTable(spark, tmpDir("delta-prune"))
    t.create(LakeTable.baseSchema)
    // base: key k at lsn 10, lang=en (copy-on-write)
    t.merge(batch(ev(10, "insert", "r1", "k", "en", "new")), "e", 0)
    // LATE deferred batch: same key at LOWER lsn 5, lang=fr — shadowed by base
    t.mergeDeferred(batch(ev(5, "insert", "r1", "k", "fr", "old")), "e", 1)

    // true state: k -> lang=en (lsn 10 wins); the fr row is stale
    val full = t.read().filter(col("lang") === "fr").count()
    val pruned = t.readWhere(col("lang") === "fr").count()
    assert(full === 0L)
    assert(pruned === full, "readWhere must not surface the stale delta row")

    // and the positive case still works
    assert(t.readWhere(col("lang") === "en").count() === 1L)
    // key-bound pruning stays exact too
    assert(t.readWhere(col("repo") === "r1" && col("path") === "k").count() === 1L)
  }
}
