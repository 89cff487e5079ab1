package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VecOps.vecDot

/** Product quantization (PQ) approximate nearest neighbor — the
  * compressed-domain scale path next to IVF ([[Ivf]]) and sign-LSH
  * ([[Similarity.lshTopK]]), after Jégou/Douze/Schmid, "Product Quantization
  * for Nearest Neighbor Search" (TPAMI 2011): the vector splits into `m`
  * subspaces, each sub-vector quantizes to its nearest codeword in a
  * per-subspace codebook of `ksub` centroids, and the corpus is ENCODED as
  * m small integer codes per vector. Search scans the codes with a
  * per-query ADC (asymmetric distance computation) lookup table instead of
  * raw vectors, shortlists, then exactly reranks the shortlist on the
  * original vectors.
  *
  * Scale shape (why PQ exists): at 10^9 × 64-dim float32 the raw corpus is
  * 256 GB; m=16 codes are 16 GB. The ADC scan is one narrow pass over the
  * codes against a BROADCAST per-query lookup table (m × ksub doubles per
  * query), no vectors move, no shuffle before the per-query top window; only
  * shortlist × queries original vectors are read back for the rerank.
  * Training runs ALL m subspaces jointly — one Spark job per Lloyd
  * iteration regardless of m (the per-subspace loop would pay m × iters job
  * round-trips), and only m × ksub × subDim aggregates return to the driver.
  *
  * Determinism: codebooks seed from the sha256 order of the row id (the
  * same portable seeding as IVF), assignments tiebreak on the smaller code
  * id, and the ADC sum folds the codes array LEFT-TO-RIGHT in one codegen'd
  * expression (a groupBy float sum would re-associate nondeterministically);
  * rerank uses the rounded-cosine + id ordering of
  * [[Similarity.bruteForceTopK]].
  *
  * Rank fidelity: vectors are L2-NORMALIZED before encoding — for unit
  * vectors ‖a−b‖² = 2 − 2·cos(a,b), so ADC's squared-L2 ordering targets
  * exactly the cosine ordering the brute force uses; recall is the only
  * approximation, dialed by `shortlist` (and the code budget m × log2 ksub).
  */
object Pq {

  /** Per-subspace codebooks: `books(s)(code)` is a subDim-wide centroid of
    * the unit-normalized corpus's s-th sub-vector distribution.
    */
  final case class PqModel(dim: Int, m: Int, books: Array[Array[Array[Double]]]) {
    def subDim: Int = dim / m
    def ksub: Int = books.head.length
  }

  private def unit(v: Column): Column = {
    val n = sqrt(vecDot(v, v))
    transform(v, x => x / n)
  }

  /** (id, unit-normalized double vec) projection shared by train/encode. */
  private def projected(df: DataFrame, vecCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("__id"),
      unit(Similarity.asDoubleVec(col(vecCol))).as("__v"))

  /** 1-based sub-vector slice for subspace `s`. */
  private def sub(v: Column, s: Int, subDim: Int): Column =
    slice(v, s * subDim + 1, subDim)

  /** One row per (vector, subspace): (__id, __s, __sv). */
  private def subVectors(pv: DataFrame, m: Int, subDim: Int): DataFrame =
    pv.select(col("__id"), explode(array((0 until m).map(s =>
        struct(lit(s).as("__s"), sub(col("__v"), s, subDim).as("__sv"))): _*)).as("e"))
      .select(col("__id"), col("e.__s").as("__s"), col("e.__sv").as("__sv"))

  /** Codebooks as a broadcastable (subspace, code, centroid) frame. */
  private def booksDf(spark: org.apache.spark.sql.SparkSession,
                      books: Array[Array[Array[Double]]]): DataFrame = {
    import spark.implicits._
    (for {
      (book, s) <- books.zipWithIndex
      (cv, c) <- book.zipWithIndex
    } yield (s, c, cv.toSeq)).toSeq.toDF("__s", "__code", "__bv")
  }

  /** Nearest-codeword id per (vector, subspace): broadcast join against ALL
    * subspaces' codebooks at once, min_by with the (distance, code)
    * tiebreak — one partial-aggregated shuffle on (__id, __s) covers every
    * subspace in a single job.
    */
  private def assignCodes(subs: DataFrame,
                          books: Array[Array[Array[Double]]]): DataFrame =
    subs.join(broadcast(booksDf(subs.sparkSession, books)), Seq("__s"))
      .withColumn("__d", graft.functions.VecOps.vecSqDist(col("__sv"), col("__bv")))
      .groupBy(col("__id"), col("__s"))
      .agg(min_by(struct(col("__code"), col("__sv")), struct(col("__d"), col("__code"))).as("__m"))
      .select(col("__id"), col("__s"),
        col("__m.__code").as("__code"), col("__m.__sv").as("__sv"))

  /** Train all m sub-codebooks jointly: seeds are the `ksub` rows with the
    * smallest sha256(id) (one collect), each Lloyd iteration is ONE job —
    * assign every (vector, subspace) pair, then average per
    * (subspace, code, position); empty codes keep their previous codeword.
    */
  def train(corpus: DataFrame, vecCol: String, idCol: String, dim: Int,
            m: Int = 16, ksub: Int = 64, iters: Int = 4): PqModel = {
    require(dim % m == 0, s"dim $dim does not split into $m subspaces")
    require(ksub >= 2, "ksub must be at least 2")
    val subDim = dim / m
    val pv = projected(corpus, vecCol, idCol)
    val seeds = pv
      .select(col("__v"), sha2(col("__id").cast("string"), 256).as("__h"),
        col("__id").as("__i"))
      .orderBy(col("__h"), col("__i")).limit(ksub)
      .collect().map(_.getSeq[Double](0).toArray)
    require(seeds.nonEmpty, "empty corpus")
    var books: Array[Array[Array[Double]]] =
      Array.tabulate(m, seeds.length)((s, c) => seeds(c).slice(s * subDim, (s + 1) * subDim))
    val subs = subVectors(pv, m, subDim).persist()
    try {
      subs.count() // materialize once; every iteration reads the cache
      for (_ <- 0 until iters) {
        val means = assignCodes(subs, books)
          .select(col("__s"), col("__code"), posexplode(col("__sv")))
          .groupBy(col("__s"), col("__code"), col("pos"))
          .agg(avg(col("col")).as("m"))
          .collect()
        val next = books.map(_.map(_.clone()))
        for (r <- means) next(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3)
        books = next
      }
      PqModel(dim, m, books)
    } finally subs.unpersist()
  }

  /** Encode the corpus: one row per vector, `codes` = the m nearest-codeword
    * ids in subspace order — the compressed representation the ADC scan
    * reads (persist it to search many times without re-encoding).
    */
  def encode(corpus: DataFrame, vecCol: String, idCol: String,
             model: PqModel): DataFrame = {
    val pv = projected(corpus, vecCol, idCol)
    assignCodes(subVectors(pv, model.m, model.subDim), model.books)
      .groupBy(col("__id"))
      .agg(transform(sort_array(collect_list(struct(col("__s"), col("__code")))),
        e => e.getField("__code")).as("codes"))
  }

  /** ADC search + exact rerank over [[encode]]'s output. Per query the
    * driver precomputes the m × ksub sub-distance table from the collected
    * query vectors (queries are small by contract — the same broadcast trade
    * as [[Similarity.bruteForceTopK]]); the corpus side is ONE narrow pass:
    * codes ⨯ broadcast tables, ADC as a left-to-right codegen'd fold over
    * the codes array (deterministic, no re-associated float sum, no
    * pre-window shuffle), per-query shortlist window, then the exact
    * rounded-cosine rerank on shortlist × queries original vectors. Output
    * shape and ordering match [[Similarity.bruteForceTopK]] exactly whenever
    * the shortlist recalls the true top-k.
    */
  def adcTopK(codes: DataFrame, corpus: DataFrame, queries: DataFrame,
              vecCol: String, idCol: String, model: PqModel,
              k: Int = 5, shortlist: Int = 128): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    val subDim = model.subDim
    val qvecs = projected(queries, vecCol, idCol)
      .select(col("__id").cast("long"), col("__v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val luts = qvecs.toSeq.map { case (qid, qv) =>
      val t: Seq[Seq[Double]] = (0 until model.m).map { s =>
        model.books(s).toSeq.map { cv =>
          var d = 0.0
          var i = 0
          while (i < subDim) {
            val x = qv(s * subDim + i) - cv(i); d += x * x; i += 1
          }
          d
        }
      }
      (qid, t)
    }
    val lutDf = luts.toDF("query_id", "__lut")
    val adc = codes.crossJoin(broadcast(lutDf))
      .filter(col("query_id") =!= col("__id"))
      .withColumn("__adc", aggregate(
        zip_with(col("codes"), sequence(lit(0), lit(model.m - 1)),
          (c, s) => element_at(element_at(col("__lut"), s + 1), c + 1)),
        lit(0.0), (acc, x) => acc + x))
    val wShort = Window.partitionBy(col("query_id"))
      .orderBy(col("__adc").asc, col("__id").asc)
    val short = adc.withColumn("__r", row_number().over(wShort))
      .filter(col("__r") <= shortlist)
      .select(col("query_id"), col("__id").as("nbr_id"))
    val c = corpus.select(col(idCol).as("nbr_id"),
      Similarity.asDoubleVec(col(vecCol)).as("__cv"))
    val q = queries.select(col(idCol).as("query_id"),
      Similarity.asDoubleVec(col(vecCol)).as("__qv"))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    short.join(c, Seq("nbr_id")).join(broadcast(q), Seq("query_id"))
      .withColumn("cosine", round(Similarity.cosine(col("__qv"), col("__cv")), 6))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nbr_id"), col("cosine"))
  }

  /** One-shot train → encode → search (the index-free convenience twin;
    * persist [[encode]]'s output to search many times without re-encoding).
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, vecCol: String,
             idCol: String, dim: Int, k: Int = 5, m: Int = 16, ksub: Int = 64,
             iters: Int = 4, shortlist: Int = 128): DataFrame = {
    val model = train(corpus, vecCol, idCol, dim, m, ksub, iters)
    val codes = encode(corpus, vecCol, idCol, model).persist()
    try adcTopK(codes, corpus, queries, vecCol, idCol, model, k, shortlist)
      .localCheckpoint()
    finally codes.unpersist()
  }

  /** A trained, persisted PQ index: `table` holds the encoded corpus (one
    * narrow (id, codes) row per vector — the 16-bytes-per-vector artifact
    * the ADC scan reads) and `table_books` the m × ksub sub-codebooks.
    * Train once, probe many: at the 10^9-vector design point training and
    * encoding are one batch job, and every later search pays only the
    * compressed-code pass + the shortlist rerank — no Lloyd iterations, no
    * full-vector corpus scan before the rerank.
    */
  final case class PqIndex(table: String, model: PqModel)

  /** Train + encode + persist. Codes land as a managed parquet table,
    * codebooks next to it, so a later session can [[loadIndex]] and probe
    * without retraining or re-encoding.
    */
  def buildIndex(corpus: DataFrame, vecCol: String, idCol: String, dim: Int,
                 table: String, m: Int = 16, ksub: Int = 64,
                 iters: Int = 4): PqIndex = {
    val spark = corpus.sparkSession
    val model = train(corpus, vecCol, idCol, dim, m, ksub, iters)
    graft.kernel.Bucketing.dropManaged(spark, table)
    encode(corpus, vecCol, idCol, model)
      .write.mode("overwrite").format("parquet").saveAsTable(table)
    graft.kernel.Bucketing.dropManaged(spark, s"${table}_books")
    booksDf(spark, model.books)
      .coalesce(1).write.mode("overwrite").format("parquet")
      .saveAsTable(s"${table}_books")
    PqIndex(table, model)
  }

  /** Reload a persisted index (no retraining, no corpus scan). Geometry
    * comes back from the books table itself: m = subspace count, subDim =
    * centroid width, dim = m × subDim.
    */
  def loadIndex(spark: org.apache.spark.sql.SparkSession, table: String): PqIndex = {
    val rows = spark.table(s"${table}_books")
      .orderBy(col("__s"), col("__code")).collect()
    require(rows.nonEmpty, s"empty PQ books table ${table}_books")
    val books = rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map { case (_, rs) =>
      rs.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toArray).toArray
    }.toArray
    val m = books.length
    val dim = m * books.head.head.length
    PqIndex(table, PqModel(dim, m, books))
  }

  /** Search a persisted index: the ADC pass reads the narrow codes table
    * instead of re-encoding; `corpus` supplies only the original vectors
    * for the exact shortlist rerank. Output shape matches [[pqTopK]], and
    * for the same (corpus, params) the results are identical —
    * train-once/probe-many changes where the work happens, not the answer.
    */
  def probeTopK(index: PqIndex, corpus: DataFrame, queries: DataFrame,
                vecCol: String, idCol: String, k: Int = 5,
                shortlist: Int = 128): DataFrame =
    adcTopK(corpus.sparkSession.table(index.table), corpus, queries,
      vecCol, idCol, index.model, k, shortlist)
}
