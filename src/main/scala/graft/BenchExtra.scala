package graft

import org.apache.spark.sql.functions._

/** Ad-hoc noop-sink sub-pipeline benchmarks (guide §1.4): isolates stages of
  * the expensive queries so optimization work targets the real cost. NOT part
  * of the driver contract — `graft.Bench` remains the frozen measurement
  * surface; numbers from here are cited in OPTIMIZATION_r06.md only.
  *
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 sbt "runMain graft.BenchExtra"
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = BenchUtil.session(cpus)
    import graft.util.Tables._

    def timed(name: String)(f: => Unit): Unit = {
      spark.catalog.clearCache()
      System.gc()
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      f
      println(f"[benchextra] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.sparkContext.setJobDescription(null)
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // warmup
    try noop(documents(spark, sfDir).select(sha2(col("text"), 256)))
    catch { case _: Throwable => () }

    val docs = documents(spark, sfDir)

    // ngram-jaccard sub-stages
    val hsExpr = array_distinct(array_sort(transform(
      graft.ops.TextOps.shingles(col("text"), 3),
      s => substring(sha2(s, 256), 1, 16))))
    timed("ngram: hash arrays only") {
      noop(docs.select(col("doc_id").as("__id"), hsExpr.as("__hs")))
    }
    timed("ngram: + banded window cap") {
      val hs = docs.select(col("doc_id").as("__id"), hsExpr.as("__hs"))
      val banded = hs.select(col("__id"), explode(slice(col("__hs"), 1, 8)).as("__bucket"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__bucket")).orderBy(col("__id"))
      noop(banded.withColumn("__bn", row_number().over(w)).filter(col("__bn") <= 256))
    }
    timed("ngram: + candidate pairs dedup") {
      val hs = docs.select(col("doc_id").as("__id"), hsExpr.as("__hs"))
      val banded = hs.select(col("__id"), explode(slice(col("__hs"), 1, 8)).as("__bucket"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__bucket")).orderBy(col("__id"))
      val capped = banded.withColumn("__bn", row_number().over(w)).filter(col("__bn") <= 256)
      val a = capped.select(col("__bucket"), col("__id").as("id_a"))
      val b = capped.select(col("__bucket"), col("__id").as("id_b"))
      noop(a.join(b, Seq("__bucket")).filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").dropDuplicates("id_a", "id_b"))
    }
    timed("ngram: full op") {
      noop(graft.ops.DedupOps.ngramJaccardPairs(docs, "text", "doc_id",
        shingleK = 3, threshold = 0.3, bottomK = 8, maxBucket = 256))
    }

    // verify-stage variants over a fixed candidate set
    {
      val hs = docs.select(col("doc_id").as("__id"), hsExpr.as("__hs")).persist()
      val banded = hs.select(col("__id"), explode(slice(col("__hs"), 1, 8)).as("__bucket"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__bucket")).orderBy(col("__id"))
      val capped = banded.withColumn("__bn", row_number().over(w)).filter(col("__bn") <= 256)
      val cand = capped.select(col("__bucket"), col("__id").as("id_a"))
        .join(capped.select(col("__bucket"), col("__id").as("id_b")), Seq("__bucket"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
        .localCheckpoint()
      def joined = cand
        .join(hs.select(col("__id").as("id_a"), col("__hs").as("__hs_a")), "id_a")
        .join(hs.select(col("__id").as("id_b"), col("__hs").as("__hs_b")), "id_b")
      timed("ngram-verify: string union") {
        noop(joined.withColumn("jaccard", round(
            size(array_intersect(col("__hs_a"), col("__hs_b"))).cast("double") /
            size(array_union(col("__hs_a"), col("__hs_b"))), 4))
          .filter(col("jaccard") >= 0.3).select("id_a", "id_b", "jaccard"))
      }
      timed("ngram-verify: string arith") {
        val inter = size(array_intersect(col("__hs_a"), col("__hs_b")))
        noop(joined.withColumn("jaccard", round(inter.cast("double") /
            (size(col("__hs_a")) + size(col("__hs_b")) - inter), 4))
          .filter(col("jaccard") >= 0.3).select("id_a", "id_b", "jaccard"))
      }
      timed("ngram-verify: long arith") {
        val hl = hs.select(col("__id"),
          transform(col("__hs"), h => conv(h, 16, -10).cast("long")).as("__hl"))
        val j2 = cand
          .join(hl.select(col("__id").as("id_a"), col("__hl").as("__hl_a")), "id_a")
          .join(hl.select(col("__id").as("id_b"), col("__hl").as("__hl_b")), "id_b")
        val inter = size(array_intersect(col("__hl_a"), col("__hl_b")))
        noop(j2.withColumn("jaccard", round(inter.cast("double") /
            (size(col("__hl_a")) + size(col("__hl_b")) - inter), 4))
          .filter(col("jaccard") >= 0.3).select("id_a", "id_b", "jaccard"))
      }
      hs.unpersist()
    }

    spark.stop()
  }
}
