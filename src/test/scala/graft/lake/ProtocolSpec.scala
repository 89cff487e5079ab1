package graft.lake

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.events.EventLog

/** Protocol feature gate: snapshots declare the reader features their
  * content requires; unknown requirements fail loudly instead of misreading.
  */
class ProtocolSpec extends SparkSuite {

  private def ev(lsn: Long, op: String, repo: String, path: String): Row =
    Row(lsn, 0L, new java.sql.Timestamp(1700000000000L + lsn), op,
      repo, path, "c", "scala", "v", null, null)

  private def batch(rows: Row*) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 2), EventLog.eventSchema)

  private def declared(root: String, version: Long, key: String): Set[String] = {
    val txt = scala.io.Source.fromFile(s"$root/meta/v$version.json", "UTF-8").mkString
    s""""$key":\\[([^\\]]*)\\]""".r.findFirstMatchIn(txt)
      .map(_.group(1).split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
        .filter(_.nonEmpty).toSet).getOrElse(Set.empty)
  }

  test("snapshots declare content-derived features; they clear when content does") {
    val root = tmpDir("protocol")
    val t = new LakeTable(spark, root)
    t.create(LakeTable.baseSchema)
    t.merge(batch(ev(1, "insert", "r1", "a")), "e", 0)
    def reader(): Set[String] = declared(root, t.head().version, "requiredFeatures")
    def writer(): Set[String] = declared(root, t.head().version, "requiredWriterFeatures")
    assert(reader() === Set.empty) // plain snapshot needs nothing special
    assert(writer() === Set.empty)
    t.mergeDeferred(batch(ev(2, "insert", "r2", "b")), "e", 1)
    // pending deltas gate BOTH: readers must resolve them, writers preserve them
    assert(reader() === Set("merge-on-read-deltas"))
    assert(writer() === Set("merge-on-read-deltas"))
    t.addConstraint("k", "repo IS NOT NULL")
    // constraints gate only WRITERS: reading past them is safe, an old
    // reader keeps working; a commit must enforce them
    assert(reader() === Set("merge-on-read-deltas"))
    assert(writer() === Set("merge-on-read-deltas", "check-constraints"))
    // compaction materializes the deltas; dropping the constraint clears the
    // rest — any old reader AND writer can use HEAD again
    t.compact(targetRowsPerFile = 1000000L)
    assert(reader() === Set.empty)
    assert(writer() === Set("check-constraints"))
    t.dropConstraint("k")
    assert(reader() === Set.empty)
    assert(writer() === Set.empty)
  }

  test("a snapshot requiring an unknown feature fails loudly on read") {
    val root = tmpDir("protocol-unknown")
    val t = new LakeTable(spark, root)
    t.create(LakeTable.baseSchema)
    t.merge(batch(ev(1, "insert", "r1", "a")), "e", 0)
    val v = t.head().version
    val p = new java.io.File(s"$root/meta/v$v.json")
    val txt = scala.io.Source.fromFile(p, "UTF-8").mkString
    val doctored = txt.replace("\"requiredFeatures\":[]",
      "\"requiredFeatures\":[\"quantum-merge\"]")
    assert(doctored != txt, "fixture expects an empty requiredFeatures list")
    val w = new java.io.PrintWriter(p, "UTF-8")
    try w.write(doctored) finally w.close()
    val fresh = new LakeTable(spark, root)
    val e = intercept[IllegalStateException] { fresh.read() }
    assert(e.getMessage.contains("quantum-merge"))
    assert(e.getMessage.contains("upgrade the reader"))
  }

  test("unknown writer features: the table stays readable but refuses commits") {
    val root = tmpDir("protocol-writer")
    val t = new LakeTable(spark, root)
    t.create(LakeTable.baseSchema)
    t.merge(batch(ev(1, "insert", "r1", "a")), "e", 0)
    val v = t.head().version
    val p = new java.io.File(s"$root/meta/v$v.json")
    val txt = scala.io.Source.fromFile(p, "UTF-8").mkString
    val doctored = txt.replace("\"requiredWriterFeatures\":[]",
      "\"requiredWriterFeatures\":[\"row-tracking\"]")
    assert(doctored != txt, "fixture expects an empty requiredWriterFeatures list")
    val w = new java.io.PrintWriter(p, "UTF-8")
    try w.write(doctored) finally w.close()
    val fresh = new LakeTable(spark, root)
    // reads are unaffected: writer features do not gate row interpretation
    assert(fresh.read().count() === 1L)
    // but extending the history must fail loudly, before anything publishes
    val e = intercept[IllegalStateException] {
      fresh.merge(batch(ev(2, "insert", "r2", "b")), "e", 1)
    }
    assert(e.getMessage.contains("row-tracking"))
    assert(e.getMessage.contains("upgrade the writer"))
    // and nothing landed: head is still the doctored version
    assert(new LakeTable(spark, root).head().version === v)
  }
}
