package graft.stream

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSuite
import graft.events.EventLog
import graft.lake.LakeTable

class ChangeFeedSourceSpec extends SparkSuite {
  import spark.implicits._

  private def ev(
      lsn: Long, op: String, repo: String = null, path: String = null,
      commit: String = null, lang: String = null, content: String = null,
      sc: String = null, extra: String = null, eventId: Long = 0L): Row =
    Row(lsn, eventId, new java.sql.Timestamp(1700000000000L + lsn * 1000), op,
      repo, path, commit, lang, content, sc, extra)

  private def batch(rows: Row*): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), EventLog.eventSchema)

  private def freshTable(): LakeTable = {
    val t = new LakeTable(spark, tmpDir("cfeed"))
    t.create(LakeTable.baseSchema)
    t
  }

  private def readFeed(root: String, opts: Map[String, String]): DataFrame =
    opts.foldLeft(
      spark.readStream.format("graft-changes").option("path", root)
    )((r, kv) => r.option(kv._1, kv._2)).load()

  /** Drain the feed with AvailableNow into a buffer; returns (rows, batches). */
  private def drain(df: DataFrame, checkpoint: String): (Seq[Row], Int) = {
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[Row]()
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = df.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, _: Long) =>
        val rows = b.collect()
        if (rows.nonEmpty) batches.incrementAndGet()
        rows.foreach(buf.add)
      }
      .start()
    q.awaitTermination()
    (scala.jdk.CollectionConverters.CollectionHasAsScala(buf).asScala.toSeq, batches.get())
  }

  private def keyed(rows: Seq[Row], schema: Seq[String]): Set[Seq[Any]] =
    rows.map(r => schema.map(c => r.get(r.fieldIndex(c)))).toSet

  private val cols = Seq("repo", "path", "content", "_lsn", "_deleted")

  test("earliest stream == changesBetween(0, head), deletes included") {
    val t = freshTable()
    t.merge(batch(
      ev(1, "insert", "r1", "a", "c1", "scala", "v1"),
      ev(2, "insert", "r1", "b", "c2", "scala", "v2")), "e", 0)
    t.merge(batch(
      ev(3, "update", "r1", "a", "c3", "scala", "v3"),
      ev(4, "delete", "r1", "b")), "e", 1)

    val (rows, _) = drain(
      readFeed(t.root, Map("startingVersion" -> "earliest")), tmpDir("ck"))
    val expect = t.changesBetween(0, t.head().version).collect().toSeq
    assert(keyed(rows, cols) === keyed(expect, cols))
    assert(rows.exists(r => r.getBoolean(r.fieldIndex("_deleted"))))
  }

  test("checkpointed restart delivers only NEW versions, exactly once") {
    val t = freshTable()
    val ck = tmpDir("ck")
    t.merge(batch(ev(1, "insert", "r1", "a", "c1", "scala", "v1")), "e", 0)
    val v1 = t.head().version

    val (first, _) = drain(readFeed(t.root, Map("startingVersion" -> "earliest")), ck)
    assert(keyed(first, cols) === keyed(t.changesBetween(0, v1).collect().toSeq, cols))

    t.merge(batch(
      ev(2, "update", "r1", "a", "c2", "scala", "v2"),
      ev(3, "insert", "r2", "x", "c3", "py", "v3")), "e", 1)
    val v2 = t.head().version

    val (second, _) = drain(readFeed(t.root, Map("startingVersion" -> "earliest")), ck)
    assert(keyed(second, cols) === keyed(t.changesBetween(v1, v2).collect().toSeq, cols))
    // the v1 state of r1/a must NOT be re-delivered
    assert(!second.exists(r => r.getString(r.fieldIndex("content")) == "v1"))
  }

  test("startingVersion=latest sees nothing already committed; numeric start windows correctly") {
    val t = freshTable()
    t.merge(batch(ev(1, "insert", "r1", "a", "c1", "scala", "v1")), "e", 0)
    val v1 = t.head().version
    t.merge(batch(ev(2, "insert", "r1", "b", "c2", "scala", "v2")), "e", 1)

    val (latestRows, _) = drain(
      readFeed(t.root, Map("startingVersion" -> "latest")), tmpDir("ck"))
    assert(latestRows.isEmpty)

    val (fromV1, _) = drain(
      readFeed(t.root, Map("startingVersion" -> v1.toString)), tmpDir("ck"))
    assert(keyed(fromV1, cols) ===
      keyed(t.changesBetween(v1, t.head().version).collect().toSeq, cols))
  }

  test("maxVersionsPerTrigger splits a backlog into multiple micro-batches") {
    val t = freshTable()
    (0 until 4).foreach { i =>
      t.merge(batch(ev(i + 1, "insert", "r1", s"f$i", s"c$i", "scala", s"v$i")), "e", i)
    }
    val head = t.head().version
    val (rows, batches) = drain(
      readFeed(t.root, Map(
        "startingVersion" -> "earliest", "maxVersionsPerTrigger" -> "1")),
      tmpDir("ck"))
    assert(keyed(rows, cols) === keyed(t.changesBetween(0, head).collect().toSeq, cols))
    // one version per trigger → one non-empty micro-batch per merged version
    assert(batches === 4)
  }

  test("AvailableNow freezes the drain target: commits after prepare are not drained") {
    val t = freshTable()
    t.merge(batch(ev(1, "insert", "r1", "a", "c1", "scala", "v1")), "e", 0)
    t.merge(batch(ev(2, "insert", "r1", "b", "c2", "scala", "v2")), "e", 1)
    val src = new ChangeFeedSource(spark, t.root, tmpDir("meta"), "earliest", 1L)
    src.prepareForTriggerAvailableNow()
    t.merge(batch(ev(3, "insert", "r1", "c", "c3", "scala", "v3")), "e", 2) // after prepare
    // drain loop: window by window, rate-limited to 1 version, up to the
    // FROZEN target (v2) — v3 must not appear
    val o1 = src.latestOffset(src.initialOffset(), src.getDefaultReadLimit)
    assert(o1.json === "1")
    val o2 = src.latestOffset(o1, src.getDefaultReadLimit)
    assert(o2.json === "2")
    val o3 = src.latestOffset(o2, src.getDefaultReadLimit)
    assert(o3.json === "2", "drain must stop at the target frozen at prepare time")
  }

  test("empty/torn startVersion marker is re-resolved, not thrown on") {
    val t = freshTable()
    t.merge(batch(ev(1, "insert", "r1", "a", "c1", "scala", "v1")), "e", 0)
    val meta = tmpDir("meta")
    // simulate a crash between create and close: a 0-byte marker on disk
    val markerDir = new java.io.File(meta)
    markerDir.mkdirs()
    val marker = new java.io.File(markerDir, "startVersion")
    assert(marker.createNewFile())
    val src = new ChangeFeedSource(spark, t.root, meta, "earliest", 0L)
    assert(src.initialOffset().json === "0") // re-resolved, not NumberFormatException
    // and the marker was rewritten with the resolved value
    assert(new String(java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8")
      .trim === "0")
  }

  test("startingVersion=earliest resolves to the earliest RETAINED version after expiry") {
    val t = freshTable()
    (0 until 4).foreach { i =>
      t.merge(batch(ev(i + 1, "insert", "r1", s"f$i", s"c$i", "scala", s"v$i")), "e", i)
    }
    t.expireSnapshots(keepLast = 2)
    val floor = t.log.earliestVersion().get
    assert(floor > 0, "expiry must have dropped v0 for this test to bite")
    // a brand-new earliest stream starts at the retention floor and drains
    // (the old hard-coded 0 failed the first getBatch with the retention error)
    val (rows, _) = drain(
      readFeed(t.root, Map("startingVersion" -> "earliest")), tmpDir("ck"))
    val expect = t.changesBetween(floor, t.head().version).collect().toSeq
    assert(keyed(rows, cols) === keyed(expect, cols))
  }

  test("schema evolution MID-stream: running stream keeps its start schema; restart sees the new one") {
    val t = freshTable()
    t.merge(batch(ev(1, "insert", "r1", "a", "c1", "scala", "v1")), "e", 0)
    val ck = tmpDir("ck-midevolve")
    val feed = readFeed(t.root, Map("startingVersion" -> "earliest"))
    assert(!feed.columns.contains("stars"))
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[Row]()
    val q = feed.writeStream
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .option("checkpointLocation", ck)
      .foreachBatch((b: DataFrame, _: Long) => b.collect().foreach(buf.add))
      .start()
    try {
      q.processAllAvailable()
      // widen the table WHILE the stream runs, then commit a post-widen row
      t.merge(batch(
        ev(2, "schema_change", sc = """{"addColumn":{"name":"stars","type":"long"}}"""),
        ev(3, "update", "r1", "a", "c3", "scala", "v3",
          extra = """{"stars": 7}""")), "e", 1)
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"running stream failed on schema evolution: ${q.exception}")
      val delivered = scala.jdk.CollectionConverters.CollectionHasAsScala(buf).asScala.toSeq
      // the post-evolution change WAS delivered — under the START schema
      // (Structured Streaming fixes the schema at stream start)
      assert(delivered.exists(r => r.getString(r.fieldIndex("content")) == "v3"))
      assert(delivered.forall(r => !r.schema.fieldNames.contains("stars")))
    } finally q.stop()

    // restart from the SAME checkpoint: the new column is visible, and new
    // commits deliver its values
    t.merge(batch(ev(4, "update", "r1", "a", "c4", "scala", "v4",
      extra = """{"stars": 9}""")), "e", 2)
    val feed2 = readFeed(t.root, Map("startingVersion" -> "earliest"))
    assert(feed2.columns.contains("stars"))
    val (rows2, _) = drain(feed2, ck)
    val v4 = rows2.filter(r => r.getString(r.fieldIndex("content")) == "v4")
    assert(v4.nonEmpty, "restarted stream missed the post-restart commit")
    assert(v4.forall(r => r.getLong(r.fieldIndex("stars")) == 9L))
  }

  test("RENAME mid-stream: pinned old name null-fills, stream survives, restart sees the new name") {
    val t = freshTable()
    t.merge(batch(
      ev(1, "schema_change", sc = """{"addColumn":{"name":"stars","type":"long"}}"""),
      ev(2, "insert", "r1", "a", "c2", "scala", "v2", extra = """{"stars": 5}""")), "e", 0)
    val ck = tmpDir("ck-midrename")
    val feed = readFeed(t.root, Map("startingVersion" -> "earliest"))
    assert(feed.columns.contains("stars"))
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[Row]()
    val q = feed.writeStream
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .option("checkpointLocation", ck)
      .foreachBatch((b: DataFrame, _: Long) => b.collect().foreach(buf.add))
      .start()
    try {
      q.processAllAvailable()
      // rename WHILE the stream runs, then commit a post-rename row
      t.merge(batch(
        ev(3, "schema_change", sc = """{"renameColumn":{"name":"stars","to":"rating"}}"""),
        ev(4, "update", "r1", "a", "c4", "scala", "v4",
          extra = """{"rating": 8}""")), "e", 1)
      q.processAllAvailable()
      assert(q.exception.isEmpty, s"running stream failed on a mid-stream rename: ${q.exception}")
      val delivered = scala.jdk.CollectionConverters.CollectionHasAsScala(buf).asScala.toSeq
      val v4 = delivered.filter(r => r.getString(r.fieldIndex("content")) == "v4")
      // delivered under the PINNED schema: old name present but null-filled
      // (the value lives under the new name, visible after restart)
      assert(v4.nonEmpty, "post-rename change not delivered to the running stream")
      assert(v4.forall(r => r.isNullAt(r.fieldIndex("stars"))))
    } finally q.stop()

    t.merge(batch(ev(5, "update", "r1", "a", "c5", "scala", "v5",
      extra = """{"rating": 9}""")), "e", 2)
    val feed2 = readFeed(t.root, Map("startingVersion" -> "earliest"))
    assert(feed2.columns.contains("rating") && !feed2.columns.contains("stars"))
    val (rows2, _) = drain(feed2, ck)
    val v5 = rows2.filter(r => r.getString(r.fieldIndex("content")) == "v5")
    assert(v5.nonEmpty, "restarted stream missed the post-restart commit")
    assert(v5.forall(r => r.getLong(r.fieldIndex("rating")) == 9L))
  }

  test("schema evolution: stream carries columns added before stream start") {
    val t = freshTable()
    t.merge(batch(ev(1, "insert", "r1", "a", "c1", "scala", "v1")), "e", 0)
    t.merge(batch(
      ev(2, "schema_change", sc = """{"addColumn":{"name":"stars","type":"long"}}"""),
      ev(3, "update", "r1", "a", "c3", "scala", "v3",
        extra = """{"stars": 7}""")), "e", 1)

    val feed = readFeed(t.root, Map("startingVersion" -> "earliest"))
    assert(feed.columns.contains("stars"))
    val (rows, _) = drain(feed, tmpDir("ck"))
    val expect = t.changesBetween(0, t.head().version).collect().toSeq
    val c2 = cols :+ "stars"
    assert(keyed(rows, c2) === keyed(expect, c2))
  }
}
