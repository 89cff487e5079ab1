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

  /** Codebooks as a broadcastable (subspace, code, centroid) frame. */
  private def booksDf(spark: org.apache.spark.sql.SparkSession,
                      books: Array[Array[Array[Double]]]): DataFrame = {
    import spark.implicits._
    (for {
      (book, s) <- books.zipWithIndex
      (cv, c) <- book.zipWithIndex
    } yield (s, c, cv.toSeq)).toSeq.toDF("__s", "__code", "__bv")
  }

  /** Bounded training-sample size (rows collected to the driver for Lloyd).
    * PQ codebooks are trained on a bounded sample at every scale — the
    * standard practice for quantizer training (a few 10^4..10^5 vectors
    * saturate m × ksub × subDim means; training on 10^9 rows buys nothing) —
    * so the cap is the 100 TB design, not a shortcut. Env-tunable.
    */
  private[ops] def trainCap: Int =
    sys.env.getOrElse("GRAFT_ANN_TRAIN_CAP", "65536").toInt

  /** Train all m sub-codebooks jointly on a bounded DETERMINISTIC sample
    * (the `trainCap` rows with the smallest (sha256(id), id) — the previous
    * seeding order, extended from ksub seeds to the whole sample; one
    * top-k job, one collect). Lloyd then runs ON THE DRIVER: the state is
    * m × ksub × subDim means (kilobytes) and the flop count is
    * sample × m × ksub × subDim per iteration — the distributed loop paid
    * (broadcast join + min_by shuffle + posexplode shuffle + collect) Spark
    * jobs PER ITERATION to compute the same kilobyte-sized result (guide
    * §1.2: fix the algorithm before the per-task work; §5: the driver may
    * hold bounded state). Assignment semantics are identical (squared-L2,
    * tie → smaller code); only float summation order differs (sample order
    * vs partition order), which the exact rerank makes unobservable.
    */
  def train(corpus: DataFrame, vecCol: String, idCol: String, dim: Int,
            m: Int = 16, ksub: Int = 64, iters: Int = 4): PqModel = {
    require(dim % m == 0, s"dim $dim does not split into $m subspaces")
    require(ksub >= 2, "ksub must be at least 2")
    val subDim = dim / m
    val pv = projected(corpus, vecCol, idCol)
    val sample = pv
      .select(col("__v"), sha2(col("__id").cast("string"), 256).as("__h"),
        col("__id").as("__i"))
      .orderBy(col("__h"), col("__i")).limit(trainCap)
      .collect().map(_.getSeq[Double](0).toArray)
      .filter(v => v.length >= dim && !v.exists(_.isNaN))
    require(sample.nonEmpty, "empty corpus")
    val seeds = sample.take(ksub)
    var books: Array[Array[Array[Double]]] =
      Array.tabulate(m, seeds.length)((s, c) => seeds(c).slice(s * subDim, (s + 1) * subDim))
    val ks = seeds.length
    for (_ <- 0 until iters) {
      val sums = Array.ofDim[Double](m, ks, subDim)
      val counts = Array.ofDim[Long](m, ks)
      for (v <- sample) {
        var s = 0
        while (s < m) {
          val off = s * subDim
          val book = books(s)
          var best = 0
          var bestD = Double.PositiveInfinity
          var c = 0
          while (c < ks) {
            val cw = book(c)
            var d = 0.0
            var j = 0
            while (j < subDim) { val x = v(off + j) - cw(j); d += x * x; j += 1 }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          counts(s)(best) += 1
          val acc = sums(s)(best)
          var j = 0
          while (j < subDim) { acc(j) += v(off + j); j += 1 }
          s += 1
        }
      }
      books = Array.tabulate(m, ks)((s, c) =>
        if (counts(s)(c) == 0) books(s)(c) // empty code keeps its codeword
        else {
          val n = counts(s)(c).toDouble
          sums(s)(c).map(_ / n)
        })
    }
    PqModel(dim, m, books)
  }

  /** Encode the corpus: one row per vector, `codes` = the m nearest-codeword
    * ids in subspace order — the compressed representation the ADC scan
    * reads (persist it to search many times without re-encoding). ONE
    * codegen'd map over the corpus ([[graft.functions.AnnKernels.pqEncode]],
    * codebooks as a plan reference object): the previous explode → broadcast
    * join → two-shuffle groupBy shape moved m rows per vector through two
    * exchanges to compute a per-row argmin (guide §2.4 — a map-side
    * computable value needs no shuffle at all).
    */
  def encode(corpus: DataFrame, vecCol: String, idCol: String,
             model: PqModel): DataFrame = {
    val pv = projected(corpus, vecCol, idCol)
    pv.select(col("__id"),
        graft.functions.AnnKernels.pqEncodeCol(col("__v"), model.books).as("codes"))
      .filter(col("codes").isNotNull)
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
    // ADC as the native codegen'd kernel (AnnKernels.adc — same left-to-right
    // fold; the HOF zip_with/aggregate form paid interpreted lambdas plus an
    // intermediate array per (row, query) pair)
    val adc = codes.crossJoin(broadcast(lutDf))
      .filter(col("query_id") =!= col("__id"))
      .withColumn("__adc",
        graft.functions.AnnKernels.adcCol(col("codes"), col("__lut")))
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
    // the shortlist (≤ shortlist × queries id pairs) BROADCASTS into the
    // corpus-vector scan — the join must never shuffle the corpus vectors by
    // nbr_id (guide §3.1/§2.3: broadcast the provably tiny side; the rerank
    // reads exactly shortlist × queries vectors either way)
    c.join(broadcast(short), Seq("nbr_id")).join(broadcast(q), Seq("query_id"))
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
    // encode is now a shuffle-free codegen map consumed exactly once by the
    // ADC pass — caching it bought nothing and cost a materialization
    val codes = encode(corpus, vecCol, idCol, model)
    adcTopK(codes, corpus, queries, vecCol, idCol, model, k, shortlist)
      .localCheckpoint()
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
    graft.kernel.Bucketing.withLocation(
      encode(corpus, vecCol, idCol, model)
        .write.mode("overwrite").format("parquet"), table)
      .saveAsTable(table)
    graft.kernel.Bucketing.dropManaged(spark, s"${table}_books")
    graft.kernel.Bucketing.withLocation(
      booksDf(spark, model.books)
        .coalesce(1).write.mode("overwrite").format("parquet"), s"${table}_books")
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
