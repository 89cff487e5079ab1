package graft.util

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** F20 parity: datetime key builder (misc.py doctest values) + the
  * partitioned writer's on-disk layout and partition pruning.
  */
class DatePathsSpec extends SparkSuite {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2021-01-01 00:00:00")
  private val t1 = Timestamp.valueOf("2023-11-05 17:42:09")

  test("datetimeKey matches the reference doctest values and truncates per unit") {
    val df = Seq(Tuple1(t0)).toDF("ts")
    def key(unit: String): String =
      df.select(DatePaths.datetimeKey(col("ts"), unit)).as[String].head()
    assert(key("hour") === "year=2021/month=01/day=01/hour=00")
    assert(key("day") === "year=2021/month=01/day=01")
    assert(key("year") === "year=2021")
    assert(key("second") === "year=2021/month=01/day=01/hour=00/minute=00/second=00")
    val k1 = Seq(Tuple1(t1)).toDF("ts")
      .select(DatePaths.datetimeKey(col("ts"), "minute")).as[String].head()
    assert(k1 === "year=2023/month=11/day=05/hour=17/minute=42")
    intercept[IllegalArgumentException] {
      DatePaths.datetimeKey(col("ts"), "week")
    }
  }

  test("dailyReleaseKey: dated key with extension; latest for null (paths.py parity)") {
    val df = Seq(Tuple1(t1), Tuple1(null.asInstanceOf[Timestamp])).toDF("ts")
    val got = df.select(DatePaths.dailyReleaseKey(col("ts"), Some(".parquet")))
      .as[String].collect().toSet
    assert(got === Set("year=2023/month=11/2023-11-05.parquet", "latest.parquet"))
  }

  test("writeDatePartitioned renders year=/month=/day= directories and prunes on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_datepaths").toString
    val df = Seq(
      (1L, Timestamp.valueOf("2021-01-01 05:00:00")),
      (2L, Timestamp.valueOf("2021-01-02 06:00:00")),
      (3L, Timestamp.valueOf("2022-03-09 07:00:00"))).toDF("id", "ts")
    DatePaths.writeDatePartitioned(df, "ts", dir, unit = "day")
    // exact reference layout on disk, zero-padded
    assert(new java.io.File(s"$dir/year=2021/month=01/day=01").isDirectory)
    assert(new java.io.File(s"$dir/year=2021/month=01/day=02").isDirectory)
    assert(new java.io.File(s"$dir/year=2022/month=03/day=09").isDirectory)
    val back = spark.read.parquet(dir)
    assert(back.count() === 3)
    // partition pruning: a filter on the key columns scans one directory
    val pruned = back.filter(col("year") === "2021" && col("month") === "01" &&
      col("day") === "02")
    assert(pruned.select("id").as[Long].collect().toSeq === Seq(2L))
    // partition pruning is physical: the executed scan's numFiles metric
    // counts files actually read (inputFiles reports the pre-pruning index)
    pruned.collect()
    val scan = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.metrics("numFiles").value === 1,
      s"pruned scan should read exactly the day=02 file, read ${scan.metrics("numFiles").value}")
  }

  test("partial re-export overwrites only its own date partitions (dynamic overwrite)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_datepaths_dyn").toString
    DatePaths.writeDatePartitioned(Seq(
      (1L, Timestamp.valueOf("2021-01-01 05:00:00")),
      (2L, Timestamp.valueOf("2021-01-02 06:00:00"))).toDF("id", "ts"), "ts", dir)
    // re-export ONLY day=02 with a corrected row: day=01 history must survive
    DatePaths.writeDatePartitioned(Seq(
      (20L, Timestamp.valueOf("2021-01-02 06:00:00"))).toDF("id", "ts"), "ts", dir)
    val back = spark.read.parquet(dir)
    assert(back.select("id").as[Long].collect().toSet === Set(1L, 20L),
      "static overwrite would have deleted day=01; day=02 must hold only the re-export")
  }
}
