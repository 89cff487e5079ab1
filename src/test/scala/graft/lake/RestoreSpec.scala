package graft.lake

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.events.EventLog

/** RESTORE (rollback to an earlier snapshot) and the change feed across it. */
class RestoreSpec extends SparkSuite {
  import spark.implicits._

  private def ev(lsn: Long, op: String, repo: String, path: String,
                 content: String = null): Row =
    Row(lsn, 0L, new java.sql.Timestamp(1700000000000L + lsn), op,
      repo, path, "c", "scala", content, null, null)

  private def batch(rows: Row*) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 2), EventLog.eventSchema)

  private def liveState(t: LakeTable): Map[(String, String), (Long, String)] =
    t.readRaw().filter(!col("_deleted"))
      .select("repo", "path", "_lsn", "content")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getString(3)))
      .toMap

  test("restore rewinds state, schema, ledger and maxLsn; files carry by reference") {
    val t = new LakeTable(spark, tmpDir("restore"))
    t.create(LakeTable.baseSchema)
    t.merge(batch(ev(1, "insert", "r1", "a", "v1"), ev(2, "insert", "r2", "b", "v2")), "e", 0)
    val target = t.head()
    t.merge(batch(ev(3, "insert", "r1", "a", "v3"), ev(4, "insert", "r3", "c", "v4")), "e", 1)
    t.merge(batch(ev(5, "delete", "r2", "b")), "e", 2)
    assert(liveState(t) === Map(("r1", "a") -> (3L, "v3"), ("r3", "c") -> (4L, "v4")))

    val restored = t.restoreTo(target.version)
    assert(restored.version === target.version + 3)
    assert(restored.parent === target.version + 2)
    assert(restored.operation === s"restore(v${target.version})")
    // metadata-only: the restored snapshot references the target's files
    assert(restored.files.map(_.path).toSet === target.files.map(_.path).toSet)
    assert(restored.maxLsn === target.maxLsn)
    assert(restored.ledger === target.ledger)
    assert(liveState(t) === Map(("r1", "a") -> (1L, "v1"), ("r2", "b") -> (2L, "v2")))
    // pre-restore head stays time-travel readable
    assert(t.readVersion(target.version + 2).count() === 2)
    // history records the operation
    val ops = t.history().select("operation").as[String].collect()
    assert(ops.head === s"restore(v${target.version})")

    // ledger rollback: batch "e"/1 re-applies after restore (rewind & reprocess)
    t.merge(batch(ev(3, "insert", "r1", "a", "v3")), "e", 1)
    assert(liveState(t)(("r1", "a")) === (3L, "v3"))
  }

  test("restore to the current head is a no-op; restoring forward is rejected") {
    val t = new LakeTable(spark, tmpDir("restore-noop"))
    t.create(LakeTable.baseSchema)
    t.merge(batch(ev(1, "insert", "r1", "a", "v1")), "e", 0)
    val head = t.head()
    assert(t.restoreTo(head.version).version === head.version)
    intercept[IllegalArgumentException] { t.restoreTo(head.version + 5) }
  }

  test("changesBetween across a restore is the exact state diff") {
    val t = new LakeTable(spark, tmpDir("restore-feed"))
    t.create(LakeTable.baseSchema)
    // b0: keys a(r1), b(r2)
    t.merge(batch(ev(1, "insert", "r1", "a", "v1"), ev(2, "insert", "r2", "b", "v2")), "e", 0)
    val vTarget = t.head().version
    // b1: overwrite a, insert new key c, delete b
    t.merge(batch(ev(3, "insert", "r1", "a", "v3"),
      ev(4, "insert", "r3", "c", "v4"), ev(5, "delete", "r2", "b")), "e", 1)
    val vFrom = t.head().version
    // restore to after-b0, then a post-restore merge touching a fresh key d
    t.restoreTo(vTarget)
    t.merge(batch(ev(6, "insert", "r4", "d", "v6")), "e", 2)
    t.merge(batch(ev(7, "insert", "r5", "f", "v7")), "e", 3)
    val vTo = t.head().version

    val net = t.changesBetween(vFrom, vTo)
      .select("repo", "path", "_lsn", "_deleted", "content", "_ver")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3), r.getString(4), r.getLong(5)))).toMap

    // a: re-exposed old row (lsn 1, content v1), attributed to the window end
    // b: re-exposed as LIVE (its delete was restored away) — from-state had a
    //    tombstone, to-state is live at lsn 2
    // c: live at from, absent at to → synthesized tombstone with from's lsn
    // d: plain post-restore insert, keeps its real commit version
    assert(net.keySet ===
      Set(("r1", "a"), ("r2", "b"), ("r3", "c"), ("r4", "d"), ("r5", "f")))
    assert(net(("r1", "a")) === ((1L, false, "v1", vTo)))
    assert(net(("r2", "b")) === ((2L, false, "v2", vTo)))
    assert(net(("r3", "c"))._2 === true)        // deleted
    assert(net(("r3", "c"))._1 === 4L)          // carries the from-row's lsn
    assert(net(("r3", "c"))._3 === null)        // null value columns
    assert(net(("r3", "c"))._4 === vTo)
    assert(net(("r4", "d"))._2 === false)
    assert(net(("r4", "d"))._4 > vFrom && net(("r4", "d"))._4 < vTo) // real _ver kept

    // a window that SKIPS the restore (starts at the restore commit itself)
    // keeps the incremental fast path and sees only the post-restore merge
    val after = t.changesBetween(vFrom + 1, vTo)
      .select("repo", "path").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(after === Set(("r4", "d"), ("r5", "f")))

    // unchanged keys emit nothing: diff of a window whose endpoints hold the
    // same state for key a (restore target == b0 state) — from=b0 to=head:
    // key a restored to its own b0 row must NOT appear
    val sameA = t.changesBetween(vTarget, vTo)
      .select("repo", "path").collect().map(r => (r.getString(0), r.getString(1))).toSet
    // a and b identical at both endpoints; c absent in both
    assert(sameA === Set(("r4", "d"), ("r5", "f")))
  }

  test("streaming change feed crosses a restore; _ver-order collapse reaches final state") {
    val root = tmpDir("restore-stream")
    val t = new LakeTable(spark, root)
    t.create(LakeTable.baseSchema)
    t.merge(batch(ev(1, "insert", "r1", "a", "v1"), ev(2, "insert", "r2", "b", "v2")), "e", 0)
    val vTarget = t.head().version
    t.merge(batch(ev(3, "insert", "r1", "a", "v3"), ev(4, "insert", "r3", "c", "v4")), "e", 1)
    t.restoreTo(vTarget)
    t.merge(batch(ev(6, "insert", "r4", "d", "v6")), "e", 2)

    val cp = tmpDir("restore-stream-cp")
    val sink = s"restore_stream_sink_${java.lang.Integer.toHexString(root.hashCode)}"
    val q = spark.readStream.format("graft-changes")
      .option("path", root).option("startingVersion", "earliest")
      .option("maxVersionsPerTrigger", "1").load()
      .writeStream.format("memory").queryName(sink)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", cp)
      .start()
    q.awaitTermination()
    val delivered = spark.table(sink).localCheckpoint()
    spark.catalog.dropTempView(sink)

    // Collapse deliveries by _ver (commit attribution), NOT by _lsn: the
    // restore re-exposes rows whose lsn is LOWER than superseded deliveries,
    // and the diff attributes them to the restore commit — so _ver order is
    // the correct consumer collapse across restores.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("repo", "path").orderBy(col("_ver").desc, col("_lsn").desc)
    val finalState = delivered.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && !col("_deleted"))
      .select("repo", "path", "_lsn", "content")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getString(3)))
      .toMap
    assert(finalState === liveState(t))
  }

  test("GC after restore keeps re-referenced files") {
    val t = new LakeTable(spark, tmpDir("restore-gc"))
    t.create(LakeTable.baseSchema)
    t.merge(batch(ev(1, "insert", "r1", "a", "v1")), "e", 0)
    val vTarget = t.head().version
    t.merge(batch(ev(2, "insert", "r1", "a", "v2")), "e", 1)
    t.merge(batch(ev(3, "insert", "r2", "b", "v3")), "e", 2)
    t.restoreTo(vTarget)
    // keepLast=2 drops every pre-restore snapshot; the restored head still
    // references the v1 files, which must survive the data-file GC
    t.expireSnapshots(keepLast = 2)
    assert(liveState(t) === Map(("r1", "a") -> (1L, "v1")))
    intercept[Exception] { t.readVersion(vTarget) } // expired metadata
  }
}
