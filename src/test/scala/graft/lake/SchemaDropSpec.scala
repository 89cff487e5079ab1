package graft.lake

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSuite
import graft.events.EventLog

/** `dropColumn` schema evolution: metadata-only logical drop of a LOG-ADDED
  * column (the schema projection stops reading the physical bytes), with a
  * persisted drop TOMBSTONE so re-adding the name is refused (stale stored
  * values must not resurrect), base-schema / constraint-referenced drops
  * quarantined, batch-split invariance vs the ReplayOracle, and the
  * "dropped-columns" WRITER protocol feature declared while tombstones
  * exist.
  */
class SchemaDropSpec extends SparkSuite {
  import spark.implicits._

  private def ev(
      lsn: Long, op: String, repo: String = null, path: String = null,
      commit: String = null, lang: String = null, content: String = null,
      sc: String = null, extra: String = null, eventId: Long = 0L): Row =
    Row(lsn, eventId, new java.sql.Timestamp(1700000000000L + lsn * 1000), op,
      repo, path, commit, lang, content, sc, extra)

  private def batch(rows: Row*): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), EventLog.eventSchema)

  private val addStars = """{"addColumn":{"name":"stars","type":"long"}}"""
  private val dropStars = """{"dropColumn":{"name":"stars"}}"""

  private def dropLog: Seq[Row] = Seq(
    ev(1, "insert", "r1", "a", "c1", "scala", "v1"),
    ev(2, "schema_change", sc = addStars),
    ev(3, "insert", "r1", "b", "c3", "scala", "v3", extra = """{"stars": 7}"""),
    ev(4, "update", "r1", "a", "c4", "scala", "v4", extra = """{"stars": 9}"""),
    ev(5, "schema_change", sc = dropStars),
    ev(6, "insert", "r2", "c", "c6", "py", "v6"))

  test("drop hides the column; end state is batch-split invariant vs the oracle") {
    def mk(kind: String, batches: Seq[Seq[Row]]): LakeTable = {
      val t = new LakeTable(spark, tmpDir(kind))
      t.create(LakeTable.baseSchema)
      batches.zipWithIndex.foreach { case (b, i) => t.merge(batch(b: _*), "e", i) }
      t
    }
    val one = mk("drop1", Seq(dropLog))
    val many = mk("dropN", dropLog.map(Seq(_)))
    for (t <- Seq(one, many)) {
      assert(!t.head().schema.fieldNames.contains("stars"))
      assert(t.head().droppedAtLsn === Map("stars" -> 5L))
      assert(!t.head().addedAtLsn.contains("stars"))
    }
    val cols = Seq("repo", "path", "content")
    def rows(t: LakeTable) = t.read().select(cols.head, cols.tail: _*).collect().toSet
    assert(rows(one) === rows(many))
    val oracle = graft.events.ReplayOracle.expected(spark, dropLog)
    assert(!oracle.schema.fieldNames.contains("stars"))
    assert(rows(one) === oracle.select(cols.head, cols.tail: _*).collect().toSet)
    // the physical bytes are simply not read: full scan succeeds with the
    // reduced schema and old rows are intact
    assert(one.read().count() === 3)
  }

  test("re-add after drop quarantines and never resurrects stored values") {
    val t = new LakeTable(spark, tmpDir("readd"))
    t.create(LakeTable.baseSchema)
    t.merge(batch(dropLog: _*), "e", 0)
    val s = t.merge(batch(
      ev(7, "schema_change", sc = addStars),
      ev(8, "insert", "r2", "d", "c8", "py", "v8", extra = """{"stars": 1}""")), "e", 1)
    assert(s.schemaQuarantined === 1, "re-add of a dropped name must quarantine")
    assert(!t.head().schema.fieldNames.contains("stars"))
    // rows that held stars=7/9 before the drop must NOT expose them anywhere
    assert(!t.read().columns.contains("stars"))
    // oracle agrees end-state-wise
    val all = dropLog ++ Seq(
      ev(7, "schema_change", sc = addStars),
      ev(8, "insert", "r2", "d", "c8", "py", "v8", extra = """{"stars": 1}"""))
    val oracle = graft.events.ReplayOracle.expected(spark, all)
    assert(!oracle.schema.fieldNames.contains("stars"))
    assert(t.read().select("repo", "path", "content").collect().toSet ===
      oracle.select("repo", "path", "content").collect().toSet)
  }

  test("base-schema and unknown-column drops quarantine; schema unchanged") {
    val t = new LakeTable(spark, tmpDir("basedrop"))
    t.create(LakeTable.baseSchema)
    t.merge(batch(ev(1, "insert", "r1", "a", "c1", "scala", "v1")), "e", 0)
    val s = t.merge(batch(
      ev(2, "schema_change", sc = """{"dropColumn":{"name":"lang"}}"""),
      ev(3, "schema_change", sc = """{"dropColumn":{"name":"nope"}}""")), "e", 1)
    assert(s.schemaQuarantined === 2)
    assert(t.head().schema.fieldNames.contains("lang"))
    assert(t.head().droppedAtLsn.isEmpty)
  }

  test("drop of a constraint-referenced column quarantines until the constraint drops") {
    val t = new LakeTable(spark, tmpDir("cdrop"))
    t.create(LakeTable.baseSchema)
    t.merge(batch(
      ev(1, "insert", "r1", "a", "c1", "scala", "v1"),
      ev(2, "schema_change", sc = addStars),
      ev(3, "update", "r1", "a", "c3", "scala", "v3", extra = """{"stars": 5}""")), "e", 0)
    t.addConstraint("pos_stars", "stars IS NULL OR stars >= 0")
    val s = t.merge(batch(ev(4, "schema_change", sc = dropStars)), "e", 1)
    assert(s.schemaQuarantined === 1)
    assert(t.head().schema.fieldNames.contains("stars"))
    t.dropConstraint("pos_stars")
    val s2 = t.merge(batch(ev(5, "schema_change", sc = dropStars)), "e", 2)
    assert(s2.schemaChanges === 1 && s2.schemaQuarantined === 0)
    assert(!t.head().schema.fieldNames.contains("stars"))
  }

  test("dropped-columns is a WRITER feature: declared with tombstones, reads stay open") {
    val t = new LakeTable(spark, tmpDir("dropfeat"))
    t.create(LakeTable.baseSchema)
    t.merge(batch(dropLog: _*), "e", 0)
    val head = t.head().version
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(t.root, "meta", s"v$head.json")), "UTF-8")
    assert(txt.contains("\"dropped-columns\""))
    assert(txt.contains("\"requiredWriterFeatures\""))
    // NOT a reader feature: requiredFeatures must not name it
    val j = org.json4s.jackson.JsonMethods.parse(txt)
    val readerFeats = (j \ "requiredFeatures") match {
      case org.json4s.JArray(fs) => fs.collect { case org.json4s.JString(s) => s }
      case _ => Nil
    }
    assert(!readerFeats.contains("dropped-columns"))
    // the current build writes on top fine (it supports the feature)
    t.merge(batch(ev(9, "insert", "r3", "z", "c9", "go", "v9")), "e", 1)
    assert(t.head().droppedAtLsn === Map("stars" -> 5L), "tombstone carried forward")
  }

  test("restore to a pre-drop version resurrects the column AND clears the tombstone") {
    val t = new LakeTable(spark, tmpDir("droprestore"))
    t.create(LakeTable.baseSchema)
    t.merge(batch(
      ev(1, "insert", "r1", "a", "c1", "scala", "v1"),
      ev(2, "schema_change", sc = addStars),
      ev(3, "update", "r1", "a", "c3", "scala", "v3", extra = """{"stars": 5}""")), "e", 0)
    val preDrop = t.head().version
    t.merge(batch(ev(4, "schema_change", sc = dropStars)), "e", 1)
    assert(t.head().droppedAtLsn.nonEmpty)
    t.restoreTo(preDrop)
    val restored = t.head()
    assert(restored.schema.fieldNames.contains("stars"))
    assert(restored.droppedAtLsn.isEmpty)
    assert(t.read().filter(col("path") === "a").select("stars").as[Long]
      .collect().toSeq === Seq(5L))
  }

  test("deferred-merge path applies drops identically") {
    val t = new LakeTable(spark, tmpDir("dropmor"))
    t.create(LakeTable.baseSchema)
    t.mergeDeferred(batch(
      ev(1, "insert", "r1", "a", "c1", "scala", "v1"),
      ev(2, "schema_change", sc = addStars),
      ev(3, "update", "r1", "a", "c3", "scala", "v3", extra = """{"stars": 5}""")), "e", 0)
    t.mergeDeferred(batch(ev(4, "schema_change", sc = dropStars)), "e", 1)
    assert(!t.head().schema.fieldNames.contains("stars"))
    assert(t.head().droppedAtLsn === Map("stars" -> 4L))
    assert(t.read().select("content").as[String].collect().toSeq === Seq("v3"))
    // compaction materializes deltas and physically sheds the column
    t.compact()
    val stored = t.readRaw()
    assert(!stored.columns.contains("stars"))
  }
}
