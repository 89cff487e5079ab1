package graft.lake

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.events.EventLog

class LakeTableSpec extends SparkSuite {
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
    val t = new LakeTable(spark, tmpDir("lake"))
    t.create(LakeTable.baseSchema)
    t
  }

  test("insert, update, delete across batches — last LSN wins, tombstones retained") {
    val t = freshTable()
    t.merge(batch(
      ev(1, "insert", "r1", "a.scala", "c1", "scala", "v1"),
      ev(2, "insert", "r1", "b.scala", "c2", "scala", "v2"),
      ev(3, "insert", "r2", "x.py", "c3", "py", "v3")), "e", 0)
    t.merge(batch(
      ev(4, "update", "r1", "a.scala", "c4", "scala", "v4"),
      ev(5, "delete", "r2", "x.py")), "e", 1)
    val got = t.read().select("repo", "path", "content").as[(String, String, String)]
      .collect().toSet
    assert(got === Set(("r1", "a.scala", "v4"), ("r1", "b.scala", "v2")))
    // tombstone for the deleted key is physically retained
    val raw = t.readRaw().filter(col("_deleted")).select("repo", "path", "_lsn")
      .as[(String, String, Long)].collect().toSet
    assert(raw === Set(("r2", "x.py", 5L)))
  }

  test("replayed batchId is a no-op (exactly-once ledger)") {
    val t = freshTable()
    val b = batch(ev(1, "insert", "r1", "a", "c1", "scala", "v1"))
    val s1 = t.merge(b, "e", 0)
    assert(!s1.noOp && s1.upserts === 1)
    val s2 = t.merge(batch(ev(99, "update", "r1", "a", "c9", "scala", "SHOULD_NOT_APPLY")), "e", 0)
    assert(s2.noOp)
    assert(t.read().select("content").as[String].collect().toSeq === Seq("v1"))
    // a different epoch is a different ledger key
    val s3 = t.merge(b, "other", 0)
    assert(!s3.noOp)
  }

  test("stale duplicate after a newer delete does not resurrect the row") {
    val t = freshTable()
    t.merge(batch(ev(1, "insert", "r1", "a", "c1", "scala", "v1")), "e", 0)
    t.merge(batch(ev(2, "delete", "r1", "a")), "e", 1)
    // duplicate delivery of the original insert (same lsn, bumped event_id)
    t.merge(batch(ev(1, "insert", "r1", "a", "c1", "scala", "v1", eventId = 1)), "e", 2)
    assert(t.read().count() === 0)
  }

  test("same-LSN duplicate within one batch collapses; re-applied row keeps target") {
    val t = freshTable()
    val s = t.merge(batch(
      ev(1, "insert", "r1", "a", "c1", "scala", "v1"),
      ev(1, "insert", "r1", "a", "c1", "scala", "v1", eventId = 1)), "e", 0)
    assert(s.duplicatesDropped === 1 && s.upserts === 1)
    // identical event arriving again in a later batch → target (equal lsn) wins
    t.merge(batch(ev(1, "insert", "r1", "a", "c1", "scala", "v1")), "e", 1)
    assert(t.read().count() === 1)
  }

  test("type widening: mid-log widen replays identically 1-batch vs N-batch; narrowing quarantined") {
    import org.apache.spark.sql.types._
    val evs = Seq(
      ev(1, "insert", "r1", "a", "c1", "scala", "v1"),
      ev(2, "schema_change", sc = """{"addColumn":{"name":"stars","type":"int"}}"""),
      ev(3, "update", "r1", "a", "c3", "scala", "v3", extra = """{"stars": 7}"""),
      ev(4, "schema_change", sc = """{"addColumn":{"name":"ratio","type":"float"}}"""),
      ev(5, "insert", "r1", "b", "c5", "scala", "v5", extra = """{"stars": 5, "ratio": 1.3}"""),
      ev(6, "schema_change", sc = """{"widenColumn":{"name":"stars","type":"long"}}"""),
      ev(7, "schema_change", sc = """{"widenColumn":{"name":"ratio","type":"double"}}"""),
      ev(8, "update", "r1", "a", "c8", "scala", "v8",
        extra = """{"stars": 9999999999, "ratio": 2.25}"""),
      // six quarantine shapes: narrowing, unknown column, unknown payload,
      // malformed JSON, unknown type name, missing field — NONE may fail
      // the stream
      ev(9, "schema_change", sc = """{"widenColumn":{"name":"stars","type":"int"}}"""),
      ev(10, "schema_change", sc = """{"widenColumn":{"name":"nope","type":"long"}}"""),
      ev(11, "schema_change", sc = """{"renameColumn":{"name":"stars"}}"""),
      ev(12, "schema_change", sc = """{{{not json"""),
      ev(13, "schema_change", sc = """{"addColumn":{"name":"bad","type":"decimal"}}"""),
      ev(14, "schema_change", sc = """{"widenColumn":{"name":"stars"}}"""))
    def mk(kind: String, batches: Seq[Seq[Row]]): (LakeTable, Seq[MergeStats]) = {
      val t = new LakeTable(spark, tmpDir(kind))
      t.create(LakeTable.baseSchema)
      val stats = batches.zipWithIndex.map { case (b, i) => t.merge(batch(b: _*), "e", i) }
      (t, stats)
    }
    val (one, oneStats) = mk("wide1", Seq(evs))
    val (many, manyStats) = mk("wideN", evs.map(Seq(_)))
    for (t <- Seq(one, many)) {
      val sf = t.head().schema.fields.map(f => f.name -> f.dataType).toMap
      assert(sf("stars") === LongType && sf("ratio") === DoubleType)
    }
    val c = Seq("repo", "path", "content", "stars", "ratio")
    def rows(t: LakeTable) =
      t.read().select(c.head, c.tail: _*).collect().toSet
    assert(rows(one) === rows(many), "batch split must not change the widened table")
    // vs the independent fold oracle (same widen gating)
    val oracle = graft.events.ReplayOracle.expected(spark, evs)
      .select(c.head, c.tail: _*).collect().toSet
    assert(rows(one) === oracle)
    // post-widen row used the full long/double range; pre-widen row read back
    // through its original physical type (1.3f → 1.2999999523162842)
    val a = one.read().filter(col("path") === "a").select("stars", "ratio").head()
    assert(a.getLong(0) === 9999999999L && a.getDouble(1) === 2.25)
    val b = one.read().filter(col("path") === "b").select("stars", "ratio").head()
    assert(b.getLong(0) === 5L && b.getDouble(1) === 1.3f.toDouble)
    // quarantined changes counted (never failing the stream) in BOTH splits
    assert(oneStats.map(_.schemaQuarantined).sum === 6)
    assert(manyStats.map(_.schemaQuarantined).sum === 6)
  }

  test("schema evolution: addColumn widens schema, old rows null, extras LSN-gated") {
    val t = freshTable()
    t.merge(batch(
      ev(1, "insert", "r1", "a", "c1", "scala", "v1", extra = """{"stars": 7}""")), "e", 0)
    t.merge(batch(
      ev(2, "schema_change", sc = """{"addColumn":{"name":"stars","type":"long"}}"""),
      ev(3, "insert", "r1", "b", "c2", "scala", "v2", extra = """{"stars": 9}"""),
      ev(4, "insert", "r1", "c", "c3", "scala", "v3")), "e", 1)
    val got = t.read().select("path", "stars").as[(String, Option[Long])].collect().toMap
    // row a: extra existed but PRE-dated the column add (lsn 1 < 2) → null
    assert(got === Map("a" -> None, "b" -> Some(9L), "c" -> None))
    // re-adding the same column is idempotent
    val s = t.merge(batch(
      ev(5, "schema_change", sc = """{"addColumn":{"name":"stars","type":"long"}}""")), "e", 2)
    assert(s.schemaChanges === 0)
    // an update after the add DOES apply the extra to an old row
    t.merge(batch(
      ev(6, "update", "r1", "a", "c1b", "scala", "v1b", extra = """{"stars": 42}""")), "e", 3)
    assert(t.read().filter(col("path") === "a").select("stars").as[Long].head() === 42L)
  }

  test("file pruning carries untouched files forward unchanged") {
    val t = freshTable()
    // two commits with disjoint repo ranges → disjoint file ranges
    t.merge(batch(ev(1, "insert", "aaa", "p", "c", "scala", "x")), "e", 0)
    val aaaFiles = t.head().files.map(_.path).toSet
    t.merge(batch(ev(2, "insert", "zzz", "p", "c", "scala", "y")), "e", 1)
    // touch only the 'zzz' range: the aaa file must be carried forward as-is
    t.merge(batch(ev(3, "update", "zzz", "p", "c2", "scala", "y2")), "e", 2)
    val snap = t.head()
    assert(aaaFiles.subsetOf(snap.files.map(_.path).toSet),
      s"aaa file rewritten though its range was untouched: $aaaFiles vs ${snap.files.map(_.path)}")
    assert(t.read().count() === 2)
    assert(t.read().filter(col("repo") === "zzz").select("content").as[String].head() === "y2")
  }

  test("change feed: net per-key changes between snapshots, carried rows excluded") {
    val t = freshTable()
    t.merge(batch(
      ev(1, "insert", "r1", "a", "c1", "scala", "v1"),
      ev(2, "insert", "r1", "b", "c2", "scala", "v2"),
      ev(3, "insert", "r2", "x", "c3", "py", "v3")), "e", 0)   // v1
    t.merge(batch(
      ev(4, "update", "r1", "a", "c4", "scala", "v4"),
      ev(5, "update", "r1", "a", "c5", "scala", "v5")), "e", 1) // v2: a→v5 (net)
    t.merge(batch(ev(6, "delete", "r2", "x")), "e", 2)          // v3: x deleted
    val feed = t.changesBetween(1, 3)
      .select(col("repo"), col("path"), col("content"), col("_deleted"), col("_lsn"))
      .as[(String, String, Option[String], Boolean, Long)].collect().toSet
    // key 'a' appears once with FINAL state; 'b' never changed → absent even
    // though r1's file was rewritten by the v2 merge (copy-on-write carry)
    assert(feed === Set(
      ("r1", "a", Some("v5"), false, 5L),
      ("r2", "x", None, true, 6L)), feed.toString)
    // full-history feed from the empty snapshot = current live + tombstones
    val all = t.changesBetween(0, 3)
    assert(all.count() === 3) // a, b, x(tombstone) — net, one row per key
    // feed across a compaction still excludes unchanged rows
    t.compact(targetRowsPerFile = 1000000L)
    val afterCompact = t.changesBetween(1, t.head().version)
      .select(col("path")).as[String].collect().toSet
    assert(afterCompact === Set("a", "x"), afterCompact.toString)
  }

  test("change feed prunes whole files by manifest maxVer across a compaction") {
    val t = freshTable()
    // many keys spread across the range; compaction at 1 row/file isolates
    // each key in its own file so maxVer pruning is observable per key
    t.merge(batch((1 to 8).map(i =>
      ev(i, "insert", s"r$i", s"p$i", s"c$i", "scala", s"v$i")): _*), "e", 0) // v1
    t.merge(batch(ev(9, "update", "r3", "p3", "c9", "scala", "v9")), "e", 1)  // v2
    t.compact(targetRowsPerFile = 1L, full = true)                            // v3
    assert(t.head().files.size >= 8)
    // every compacted file carries a maxVer footer stat in the manifest
    assert(t.head().files.forall(_.maxVer.isDefined))
    val feed = t.changesBetween(2, 3)
    // nothing changed in (2, 3] — compaction only rewrote files
    assert(feed.count() === 0)
    assert(feed.inputFiles.isEmpty,
      s"expected all compacted files pruned by maxVer; scanned ${feed.inputFiles.length}")
    // (1, 3]: only r3 changed; exactly the file(s) holding r3 are scanned
    val feed13 = t.changesBetween(1, 3)
    assert(feed13.select("repo").as[String].collect().toSeq === Seq("r3"))
    assert(feed13.inputFiles.length < t.head().files.size,
      s"expected cold files pruned; scanned ${feed13.inputFiles.length} of ${t.head().files.size}")
  }

  test("time travel: readVersion returns each snapshot's live state and schema") {
    val t = freshTable()
    t.merge(batch(ev(1, "insert", "r1", "a", "c1", "scala", "v1")), "e", 0) // v1
    t.merge(batch(
      ev(2, "schema_change", sc = """{"addColumn":{"name":"stars","type":"long"}}"""),
      ev(3, "update", "r1", "a", "c2", "scala", "v2", extra = """{"stars": 5}""")), "e", 1) // v2
    t.merge(batch(ev(4, "delete", "r1", "a")), "e", 2)                      // v3
    assert(t.readVersion(0).count() === 0)
    val atV1 = t.readVersion(1)
    assert(!atV1.columns.contains("stars"))
    assert(atV1.select("content").as[String].collect().toSeq === Seq("v1"))
    val atV2 = t.readVersion(2)
    assert(atV2.select("content", "stars").as[(String, Option[Long])].collect().toSeq
      === Seq(("v2", Some(5L))))
    assert(t.readVersion(3).count() === 0) // deleted at head
    assert(t.read().count() === 0)
  }

  test("feed resume from an expired snapshot fails with a clear retention error") {
    val t = freshTable()
    (0 until 4).foreach { i =>
      t.merge(batch(ev(i + 1, "insert", "r1", s"f$i", s"c$i", "scala", s"v$i")), "e", i)
    }
    t.expireSnapshots(keepLast = 2)
    val err = intercept[IllegalStateException](t.changesBetween(0, t.head().version))
    assert(err.getMessage.contains("snapshot v0 does not exist"), err.getMessage)
    assert(err.getMessage.contains("earliest retained is v3"), err.getMessage)
    // a version above head is a different mistake and says so
    val above = intercept[IllegalStateException](t.log.read(99))
    assert(above.getMessage.contains("head is v4"), above.getMessage)
  }

  test("delete of an absent key creates a tombstone, not a live row") {
    val t = freshTable()
    t.merge(batch(ev(1, "delete", "r9", "ghost")), "e", 0)
    assert(t.read().count() === 0)
    assert(t.readRaw().filter(col("_deleted")).count() === 1)
  }
}
