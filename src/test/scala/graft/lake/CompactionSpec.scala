package graft.lake

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.events.EventLog

class CompactionSpec extends SparkSuite {
  import spark.implicits._

  private def ev(lsn: Long, op: String, repo: String, path: String,
                 content: String = null): Row =
    Row(lsn, 0L, new java.sql.Timestamp(1700000000000L + lsn), op,
      repo, path, "c", "scala", content, null, null)

  private def batch(rows: Row*) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 2), EventLog.eventSchema)

  test("compact bin-packs files, preserves content, expires old tombstones only") {
    val t = new LakeTable(spark, tmpDir("compact"))
    t.create(LakeTable.baseSchema)
    // disjoint repo ranges → later merges never touch the aaa file → >1 file
    t.merge(batch(ev(1, "insert", "aaa", "a", "v1")), "e", 0)
    t.merge(batch(ev(2, "insert", "r2", "b", "v2"), ev(3, "insert", "r3", "c", "v3")), "e", 1)
    t.merge(batch(ev(4, "delete", "r2", "b")), "e", 2)
    t.merge(batch(ev(5, "delete", "r3", "c")), "e", 3)
    val before = t.head()
    assert(before.files.size > 1)
    val pre = t.read().select("repo").as[String].collect().toSet
    assert(pre === Set("aaa"))

    // watermark 4: tombstone at lsn 4 expires, lsn 5 is retained
    val after = t.compact(targetRowsPerFile = 1000000L, tombstoneWatermark = Some(4L))
    assert(after.version === before.version + 1)
    // live rows and retained tombstones are packed into SEPARATE files
    // (Iceberg delete-file analog): one of each here
    assert(after.files.count(!_.tomb) === 1)
    assert(after.files.count(_.tomb) === 1)
    assert(t.read().select("repo").as[String].collect().toSet === pre)
    val tombs = t.readRaw().filter(col("_deleted")).select("_lsn").as[Long].collect().toSet
    assert(tombs === Set(5L))

    // a late duplicate ABOVE the watermark is still guarded by its tombstone:
    t.merge(batch(ev(5, "delete", "r3", "c")), "e", 4) // replayed delete, same lsn
    assert(t.read().select("repo").as[String].collect().toSet === pre)
  }

  test("expireSnapshots drops old metadata and GCs unreferenced files") {
    val t = new LakeTable(spark, tmpDir("expire"))
    t.create(LakeTable.baseSchema)
    // updates to the SAME key: every merge must touch (and so rewrite) the
    // previous file — with (repo,path) bounding-box pruning, disjoint keys
    // would legitimately carry forward untouched and never become garbage
    for (i <- 0 until 4)
      t.merge(batch(ev(i + 1, if (i == 0) "insert" else "update", "r1", "p", s"v$i")), "e", i)
    val rowsBefore = t.read().count()
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    def countData(): Int = {
      val dp = new org.apache.hadoop.fs.Path(t.log.dataDir)
      val it = fs.listFiles(dp, true)
      var n = 0
      while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      n
    }
    val filesBefore = countData()
    t.expireSnapshots(keepLast = 1)
    assert(countData() < filesBefore, "expected GC to remove unreferenced files")
    assert(t.read().count() === rowsBefore) // latest snapshot intact
    assert(t.log.read(t.log.latestVersion().get).files.nonEmpty)
  }
}
