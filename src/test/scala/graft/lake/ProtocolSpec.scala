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

  test("snapshots declare content-derived features; they clear when content does") {
    val root = tmpDir("protocol")
    val t = new LakeTable(spark, root)
    t.create(LakeTable.baseSchema)
    t.merge(batch(ev(1, "insert", "r1", "a")), "e", 0)
    def declared(): Set[String] = {
      val txt = scala.io.Source.fromFile(
        s"$root/meta/v${t.head().version}.json", "UTF-8").mkString
      "\"requiredFeatures\":\\[([^\\]]*)\\]".r.findFirstMatchIn(txt)
        .map(_.group(1).split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
          .filter(_.nonEmpty).toSet).getOrElse(Set.empty)
    }
    assert(declared() === Set.empty) // plain snapshot needs nothing special
    t.mergeDeferred(batch(ev(2, "insert", "r2", "b")), "e", 1)
    assert(declared() === Set("merge-on-read-deltas"))
    t.addConstraint("k", "repo IS NOT NULL")
    assert(declared() === Set("merge-on-read-deltas", "check-constraints"))
    // compaction materializes the deltas; dropping the constraint clears the
    // rest — an old reader can read HEAD again
    t.compact(targetRowsPerFile = 1000000L)
    t.dropConstraint("k")
    assert(declared() === Set.empty)
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
}
