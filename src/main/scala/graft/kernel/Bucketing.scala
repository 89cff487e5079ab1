package graft.kernel

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-shuffled) tables for co-located joins and aggregations.
  *
  * Scale rationale: a join or groupBy on a non-clustered key shuffles the
  * full fact side every time. Writing the table bucketed + sorted by its
  * join key pays that shuffle ONCE at write time; every later equi-join or
  * aggregation on the bucket key then runs with ZERO Exchange (Spark's
  * bucketing reports HashClusteredDistribution from the scan). At the 10^10
  * design point this is how repeated repo-keyed joins against the lake's
  * state stay map-side — the PlanAudit suite asserts the exchange-free plan.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted parquet table in the
    * session catalog. Both sides of a co-located join must use the same
    * bucket count and key.
    */
  /** Drop `table` from the catalog AND remove an orphaned managed location a
    * previous session may have left behind: an in-memory catalog forgets its
    * tables across JVMs while the warehouse files persist, and a leftover
    * location makes the next managed-table creation fail
    * (LOCATION_ALREADY_EXISTS).
    */
  def dropManaged(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(wh)) fs.delete(wh, true)
  }

  def writeBucketed(df: DataFrame, table: String, buckets: Int, keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "bucket keys required")
    dropManaged(df.sparkSession, table)
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
