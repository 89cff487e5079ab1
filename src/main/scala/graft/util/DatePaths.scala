package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Datetime-keyed storage paths (SURVEY §2.8 F20) — the reference's
  * `build_datetime_key` / `create_oryx_key` pair
  * (/root/reference/src/borderlands/utilities/misc.py:107-148,
  * /root/reference/src/borderlands/paths.py:8-21) as Catalyst expressions
  * plus a Hive-layout partitioned writer.
  *
  * All formatting is in the session time zone — graft sessions pin UTC
  * (SURVEY §2.8 F16), so keys are reproducible across machines.
  */
object DatePaths {

  /** Unit order, coarsest first; a key includes every unit down to the one
    * requested.
    */
  val units: Seq[String] = Seq("year", "month", "day", "hour", "minute", "second")

  private val fmts = Map(
    "year" -> "yyyy", "month" -> "MM", "day" -> "dd",
    "hour" -> "HH", "minute" -> "mm", "second" -> "ss")

  private def unitIndex(unit: String): Int = {
    val i = units.indexOf(unit)
    require(i >= 0, s"unit must be one of ${units.mkString(", ")}: got $unit")
    i
  }

  /** `year=YYYY/month=MM/.../<unit>=..` key for a timestamp column —
    * zero-padded, slash-joined, truncated at `unit` (misc.py:107-148 parity,
    * doctest: build_datetime_key(2021-01-01 00:00) = year=2021/month=01/
    * day=01/hour=00).
    */
  def datetimeKey(ts: Column, unit: String = "hour"): Column = {
    val parts = units.take(unitIndex(unit) + 1)
      .map(u => concat(lit(u + "="), date_format(ts, fmts(u))))
    concat_ws("/", parts: _*)
  }

  /** Daily release key: `year=YYYY/month=MM/YYYY-MM-DD[.ext]`, or
    * `latest[.ext]` for a null timestamp (paths.py:8-21 create_oryx_key:
    * None → the mutable "latest" pointer; graft's SnapshotLog replaces that
    * pointer with versioned commits, but the literal key builder remains for
    * export layouts).
    */
  def dailyReleaseKey(ts: Column, ext: Option[String] = None): Column = {
    val suffix = ext.map(e => "." + e.stripPrefix(".")).getOrElse("")
    when(ts.isNull, lit("latest" + suffix))
      .otherwise(concat(datetimeKey(ts, "month"), lit("/"),
        date_format(ts, "yyyy-MM-dd"), lit(suffix)))
  }

  /** Write `df` date-partitioned under `dir` with the exact
    * `year=YYYY/month=MM/…` directory layout of [[datetimeKey]] (Hive layout:
    * Spark renders `col=value` per partition column, and the values are
    * zero-padded strings so the on-disk key matches the reference byte for
    * byte). Readers prune on the partition columns without touching data
    * files — the scale property the reference's key scheme exists for.
    *
    * `mode = "overwrite"` (default) uses DYNAMIC partition overwrite: only
    * the date partitions present in `df` are replaced — the reference layout
    * is an incremental daily-export tree, and a static overwrite of the whole
    * directory would silently delete every partition outside `df`'s date
    * range on a partial re-export. Pass "append" to add files to existing
    * partitions instead.
    *
    * Read-back caveat: Spark's partition-column type inference parses
    * `month=01` back as int 1; set
    * `spark.sql.sources.partitionColumnTypeInference.enabled=false` on the
    * reading session to keep the zero-padded strings.
    */
  def writeDatePartitioned(df: DataFrame, tsCol: String, dir: String,
                           unit: String = "day",
                           format: String = "parquet",
                           mode: String = "overwrite"): Seq[String] = {
    val parts = units.take(unitIndex(unit) + 1)
    val withKeys = parts.foldLeft(df) { (acc, u) =>
      acc.withColumn(u, date_format(col(tsCol), fmts(u)))
    }
    withKeys.write.mode(mode)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(parts: _*).format(format).save(dir)
    parts
  }
}
