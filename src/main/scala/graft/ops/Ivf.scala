package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the coarse-quantizer
  * scale path next to sign-LSH (Similarity.lshTopK):
  *
  *  1. TRAIN: Lloyd k-means over the corpus. Assignment is distributed (an
  *     argmin-over-centroids Catalyst expression per row — no UDF, no
  *     shuffle of vectors); each iteration reduces to `nlist × dim` running
  *     means via posexplode + groupBy, and only that tiny table returns to
  *     the driver.
  *  2. INDEX: every corpus vector is tagged with its nearest centroid's cell
  *     id — at scale this is the partition/bucket key, so a cell's vectors
  *     co-locate and a probe touches `nprobe / nlist` of the data.
  *  3. SEARCH: each query probes its `nprobe` nearest cells only; exact
  *     cosine on the probed subset, per-query top-k window.
  *
  * Everything is deterministic given (data, seed): init picks the `nlist`
  * corpus rows with the smallest xxhash64(id).
  */
object Ivf {

  /** Squared L2 distance between a vector column and a centroid literal. */
  private def dist2(v: Column, cent: Array[Double]): Column =
    aggregate(zip_with(v, typedlit(cent.toSeq), (x, y) => (x - y) * (x - y)),
      lit(0.0d), (acc, x) => acc + x)

  /** argmin over centroids: struct(dist, cell) array-min → cell. */
  private def nearestCell(v: Column, cents: Array[Array[Double]]): Column =
    array_min(array(cents.zipWithIndex.map { case (c, i) =>
      struct(dist2(v, c).as("d"), lit(i).as("c"))
    }: _*)).getField("c")

  /** `nprobe` nearest cells, as an array column (for query-side explode). */
  private def nearestCells(v: Column, cents: Array[Array[Double]], nprobe: Int): Column =
    transform(
      slice(array_sort(array(cents.zipWithIndex.map { case (c, i) =>
        struct(dist2(v, c).as("d"), lit(i).as("c"))
      }: _*)), 1, nprobe),
      s => s.getField("c"))

  /** Lloyd iterations; empty cells keep their previous centroid. Collects
    * only `nlist × dim` aggregates per iteration (driver-tiny at any corpus
    * size).
    */
  def trainCentroids(
      df: DataFrame, vecCol: String, idCol: String,
      nlist: Int, iters: Int = 3): Array[Array[Double]] = {
    val v = Similarity.asDoubleVec(col(vecCol))
    var cents: Array[Array[Double]] = df
      .select(v.as("__v"), xxhash64(col(idCol)).as("__h"))
      .orderBy(col("__h")).limit(nlist)
      .collect().map(_.getSeq[Double](0).toArray)
    require(cents.nonEmpty, "empty corpus")
    for (_ <- 0 until iters) {
      val assigned = df.select(v.as("__v"), nearestCell(v, cents).as("__cell"))
      val means = assigned
        .select(col("__cell"), posexplode(col("__v")))
        .groupBy(col("__cell"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .collect()
      val next = cents.map(_.clone())
      for (r <- means) next(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
      cents = next
    }
    cents
  }

  /** IVF top-k: same output shape as Similarity.bruteForceTopK/lshTopK —
    * (query_id, rank, nbr_id, cosine). Recall < 1 by construction (probed
    * cells only); measured against brute force in the test suite.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, vecCol: String, idCol: String,
      k: Int = 5, nlist: Int = 16, nprobe: Int = 4, iters: Int = 3): DataFrame = {
    val cents = trainCentroids(corpus, vecCol, idCol, nlist, iters)
    val v = Similarity.asDoubleVec(col(vecCol))
    val c = corpus.select(col(idCol).as("nbr_id"), v.as("__cv"),
      nearestCell(v, cents).as("__cell"))
    val q = queries.select(col(idCol).as("query_id"), v.as("__qv"),
        nearestCells(v, cents, nprobe).as("__cells"))
      .select(col("query_id"), col("__qv"), explode(col("__cells")).as("__cell"))
    // a corpus row lives in exactly one cell → (query, nbr) matches at most
    // once; no dedup needed
    val scored = c.join(broadcast(q), Seq("__cell"))
      .filter(col("query_id") =!= col("nbr_id"))
      .withColumn("cosine", Similarity.cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nbr_id"),
        round(col("cosine"), 6).as("cosine"))
  }
}
