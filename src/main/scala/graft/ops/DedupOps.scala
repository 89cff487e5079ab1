package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.SimHash64.simhash64

/** Deduplication operators for web-scale corpora. Scale design:
  *
  *  - exact: one hash-shuffle on the content digest; map-side partial agg.
  *  - MinHash+LSH / SimHash: candidate generation is a shuffle on small
  *    (band, bucket) keys — never an O(n²) cross join; the quadratic step
  *    runs only inside buckets, whose size is bounded w.h.p. At 100 TB the
  *    only caveat is degenerate buckets (boilerplate shingles) → cap bucket
  *    size and route the overflow to a lineage quarantine (see `maxBucket`).
  *  - pair canonicalization keeps (a < b) once, and connected components are
  *    approximated by min-id propagation within buckets (keep the min doc as
  *    canonical), which is the standard one-pass policy.
  */
object DedupOps {

  /** NO SILENT CAPS: count the rows a `maxBucket` cap drops (and how many
    * buckets overflowed — exactly the rows ranked cap+1) into the lineage
    * sidecar. One extra tiny aggregate over the already-persisted signature
    * frame, run only when a lineage sink is supplied; `numbered` is the
    * banded frame with its `__bn` within-bucket rank. The caller flushes.
    */
  private def recordCapStats(lin: graft.stream.Lineage, op: String,
                             numbered: DataFrame, maxBucket: Int): Unit = {
    val r = numbered.agg(
      coalesce(sum(when(col("__bn") > maxBucket, 1L)), lit(0L)),
      coalesce(sum(when(col("__bn") === maxBucket + 1, 1L)), lit(0L))).collect()(0)
    lin.recordOp(op, "rows_dropped_by_bucket_cap", r.getLong(0))
    lin.recordOp(op, "buckets_capped", r.getLong(1))
  }

  /** Exact dedup (hash-groupBy on sha2 of content): returns survivors —
    * the min-id row per digest. Window over digest; salting unnecessary
    * because identical docs are rare per digest (and bounded).
    */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col("__digest")).orderBy(col(idCol))
    df.withColumn("__digest", sha2(col(textCol), 256))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__digest")
  }

  /** MinHash signature: `numHashes` permutations approximated by seeded
    * xxhash64; sig[i] = min over shingles of h_i(shingle).
    *
    * ONE traversal of the shingle array: fold an accumulator of `numHashes`
    * running minima, deriving h_i(s) = xxhash64(i, xxhash64(s)) so each
    * shingle is string-hashed once. The naive formulation — numHashes
    * separate `array_min(transform(shingles, …))` columns — re-evaluates the
    * whole shingling expression per hash function (HOF lambdas are
    * interpreted and Catalyst re-inlines the alias), which measured 40×
    * slower at 5k docs.
    *
    * portable = a hash space DuckDB can replicate bit-for-bit: the per-
    * permutation hashes are 8-hex-char WINDOWS of `sha256(s) ‖
    * sha256(s + "#") ‖ sha256(s + "##") ‖ …` — h_i(s) = combined[i*8 ..
    * i*8+8) — so ceil(numHashes/8) sha256 calls per shingle instead of
    * numHashes+1 (the previous `sha256("i:" + base)` chain cost 17 digests
    * per shingle at numHashes=16 and measured 33× slower at sf0.1). Min is
    * over 8-hex strings: same lexicographic order in both engines, and
    * sha256's bits are independent, so distinct windows behave as
    * independent hash functions. Default = xxhash64 (codegen'd, ~10×
    * cheaper still) for production paths.
    */
  def minhashSignature(text: Column, shingleK: Int, numHashes: Int,
                       portable: Boolean = false): Column = {
    val shingles = TextOps.shingles(text, shingleK)
    if (portable)
      // native codegen kernel — same digest chain and 8-hex-window minima,
      // asserted exactly equal to the HOF fold in MinhashParitySpec; the
      // interpreted fold paid per-element lambda dispatch plus an
      // intermediate window array per shingle
      graft.functions.MinhashSigPortable.column(shingles, numHashes)
    else
      aggregate(
        transform(shingles, s => xxhash64(s)),
        array_repeat(lit(Long.MaxValue), numHashes),
        (acc, h) => zip_with(
          acc,
          transform(sequence(lit(0), lit(numHashes - 1)), i => xxhash64(i, h)),
          (a, b) => least(a, b)))
  }

  /** MinHash LSH candidate pairs with estimated Jaccard ≥ `threshold`.
    * bands × rowsPerBand = numHashes; est = fraction of matching signature
    * positions. Returns (id_a, id_b, est_jaccard) with id_a < id_b.
    *
    * The signature frame is cached for its three uses (banding + two payload
    * re-joins), the small pair result is materialized eagerly
    * (localCheckpoint), and the cache is released before returning — no
    * cached blocks leak across queries in a long-lived session.
    */
  def minhashLshPairs(
      df: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.5, maxBucket: Int = 1000,
      portable: Boolean = false,
      lineage: Option[graft.stream.Lineage] = None): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sig = df.select(col(idCol).as("__id"),
      minhashSignature(col(textCol), shingleK, numHashes, portable).as("__sig"))
      .persist()
    try {
    // band buckets: hash of each signature slice
    def bucketOf(b: Column): Column =
      if (portable)
        substring(sha2(concat(b.cast("string"), lit("|"),
          array_join(slice(col("__sig"), b * rows + 1, lit(rows)), ",")), 256), 1, 16)
      else xxhash64(b, to_json(slice(col("__sig"), b * rows + 1, lit(rows))))
    val banded = sig.select(col("__id"), col("__sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), bucketOf(_))))
      .withColumnRenamed("pos", "__band").withColumnRenamed("col", "__bucket")
    // bound degenerate buckets (boilerplate) — dropped rows are quarantined
    // BY COUNT into the lineage sidecar when one is supplied (no silent caps)
    val wB = Window.partitionBy(col("__band"), col("__bucket")).orderBy(col("__id"))
    val numbered = banded.withColumn("__bn", row_number().over(wB))
    val capped = numbered.filter(col("__bn") <= maxBucket)
    lineage.foreach(recordCapStats(_, "minhash_lsh", numbered, maxBucket))
    // pair on bare ids (8 bytes each), join signatures back only for the
    // deduped pair set — shipping two 32-long signature arrays through the
    // bucket self-join made degenerate buckets quadratically expensive
    val a = capped.select(col("__band"), col("__bucket"), col("__id").as("id_a"))
    val b = capped.select(col("__band"), col("__bucket"), col("__id").as("id_b"))
    val pairs = a.join(b, Seq("__band", "__bucket")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
    val withSigs = pairs
      .join(sig.select(col("__id").as("id_a"), col("__sig").as("__sig_a")), "id_a")
      .join(sig.select(col("__id").as("id_b"), col("__sig").as("__sig_b")), "id_b")
    val est = size(filter(zip_with(col("__sig_a"), col("__sig_b"), (x, y) => x === y),
      m => m)).cast("double") / numHashes
    withSigs.withColumn("est_jaccard", round(est, 4))
      .filter(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")
      .localCheckpoint()
    } finally sig.unpersist() // cache must not outlive the op, even on failure
  }

  /** SimHash near-dup pairs: 64-bit fingerprint (native Catalyst expression),
    * banded into `bands` equal-width bit slices — by pigeonhole, any pair at
    * Hamming distance ≤ bands-1 shares at least one identical band, so the
    * candidate stage has GUARANTEED recall for `maxHamming < bands` — then
    * exact Hamming ≤ `maxHamming` on candidates via bit_count(xor).
    *
    * The recall/bucket-width dial: more bands → narrower band keys (64/bands
    * bits) → coarser buckets → more candidate pairs. `require` enforces the
    * contract instead of silently returning an incomplete pair set. Pairs are
    * generated on bare ids; fingerprints re-join only on the deduped pair set.
    */
  def simhashPairs(
      df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3, bands: Int = 4): DataFrame = {
    require(64 % bands == 0, s"bands must divide 64, got $bands")
    require(maxHamming < bands,
      s"banding guarantees recall only for hamming < bands: maxHamming=$maxHamming needs > $maxHamming bands")
    val width = 64 / bands
    val mask = if (width == 64) lit(-1L) else lit((1L << width) - 1)
    val sig = df.select(col(idCol).as("__id"),
      simhash64(TextOps.wordTokens(col(textCol))).as("__sim"))
      .persist()
    try {
    val banded = sig.select(col("__id"),
      posexplode(array((0 until bands).map(i =>
        shiftrightunsigned(col("__sim"), i * width).bitwiseAND(mask)): _*)))
      .withColumnRenamed("pos", "__band").withColumnRenamed("col", "__bucket")
    val a = banded.select(col("__band"), col("__bucket"), col("__id").as("id_a"))
    val b = banded.select(col("__band"), col("__bucket"), col("__id").as("id_b"))
    val pairs = a.join(b, Seq("__band", "__bucket")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
    pairs
      .join(sig.select(col("__id").as("id_a"), col("__sim").as("__sim_a")), "id_a")
      .join(sig.select(col("__id").as("id_b"), col("__sim").as("__sim_b")), "id_b")
      .withColumn("hamming", bit_count(col("__sim_a").bitwiseXOR(col("__sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming").cast("int").as("hamming"))
      .localCheckpoint()
    } finally sig.unpersist()
  }

  /** [[simhashPairs]] in a hash space DuckDB can replicate: per-token bit
    * votes come from the first 16 hex chars (64 bits) of sha256(token) —
    * each nibble contributes 4 MSB-first ±1 votes via a 16-entry literal
    * lookup map — and fingerprint bit b = (vote sum > 0). Banding and exact
    * Hamming verify are identical to the FNV-1a fast path, with the same
    * pigeonhole recall guarantee for maxHamming < bands, so the ENTIRE
    * pipeline (votes → bits → band buckets → pairs → Hamming filter)
    * replays in the SQL oracle. The fast path ([[simhashPairs]], native
    * codegen'd expression) remains for production use.
    */
  def simhashPairsPortable(
      df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3, bands: Int = 4): DataFrame = {
    require(64 % bands == 0, s"bands must divide 64, got $bands")
    require(bands >= 2, "bands must be >= 2 (band values are folded into a long)")
    require(maxHamming < bands,
      s"banding guarantees recall only for hamming < bands: maxHamming=$maxHamming needs > $maxHamming bands")
    val width = 64 / bands
    // native codegen kernel for the sha256-nibble ±1 vote fold → 64 bits
    // (asserted exactly equal to the HOF formulation in OpsSpec; the
    // interpreted fold paid a 64-element zip_with per token)
    val bits = graft.functions.SimhashBitsPortable.column(
      TextOps.wordTokens(col(textCol)))
    val sig = df.select(col(idCol).as("__id"), bits.as("__bits")).persist()
    try {
    // band value = MSB-first fold of the band's bit slice (injective within
    // an engine is all a join key needs; width ≤ 32 keeps the fold in-range)
    def bandVal(b: Column): Column =
      aggregate(slice(col("__bits"), b * width + 1, lit(width)),
        lit(0L), (acc, x) => acc * 2 + x)
    val banded = sig.select(col("__id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), bandVal(_))))
      .withColumnRenamed("pos", "__band").withColumnRenamed("col", "__bucket")
    val a = banded.select(col("__band"), col("__bucket"), col("__id").as("id_a"))
    val b = banded.select(col("__band"), col("__bucket"), col("__id").as("id_b"))
    val pairs = a.join(b, Seq("__band", "__bucket")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
    val ham = size(filter(zip_with(col("__bits_a"), col("__bits_b"),
      (x, y) => x =!= y), m => m))
    pairs
      .join(sig.select(col("__id").as("id_a"), col("__bits").as("__bits_a")), "id_a")
      .join(sig.select(col("__id").as("id_b"), col("__bits").as("__bits_b")), "id_b")
      .withColumn("hamming", ham.cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
      .localCheckpoint()
    } finally sig.unpersist()
  }

  /** Exact n-gram Jaccard on bottom-k-sketch candidates. Candidate stage:
    * two docs are candidates iff their `bottomK` smallest shingle hashes
    * intersect (the classic bottom-k minhash sketch) — for true Jaccard j
    * the first collision probability is ≈ 1-(1-j)^k per shared element, far
    * higher near the threshold than banded rows^-amplification, and it costs
    * ONE hash per shingle (a banded signature pays numHashes per shingle).
    *
    * Verification: jac = |A∩B| / |A∪B| over the 16-hex (64-bit) shingle-HASH
    * sets — already computed for the sketch, so the whole pipeline hashes
    * each shingle exactly once, and the verify join ships fixed-width hash
    * arrays instead of raw shingle strings. Set semantics are identical to
    * raw-shingle Jaccard unless two distinct shingles collide in 64 bits:
    * P ≈ n²/2^65 per doc (n = shingles/doc; at n = 10^6 still < 10^-7), and
    * a collision only perturbs |A∩B|/|A∪B| by ±1 element. The per-doc hash
    * arrays are computed ONCE into a persisted frame — the naive composition
    * re-evaluated the tokenize→shingle→hash subtree in every downstream
    * stage (interpreted-HOF re-inlining, ~3× the whole query's cost) — and
    * the small pair result is materialized before unpersist.
    */
  def ngramJaccardPairs(
      df: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 3, threshold: Double = 0.5,
      bottomK: Int = 8, maxBucket: Int = 1000,
      lineage: Option[graft.stream.Lineage] = None): DataFrame = {
    // ONE codegen'd hashing pass per doc (graft.functions.NgramSketch): the
    // bottom-k DISTINCT hex16 bucket keys plus the full distinct hash set as
    // SORTED SIGNED LONGS (bijective reparse of the same 64-bit values, so
    // set sizes — and therefore Jaccard — are exactly the oracle's hex-set
    // numbers). Replaces the interpreted transform(sha2) → array_sort →
    // array_distinct chain (guide §4: no interpreted HOFs on the hot path);
    // the distinct only collapses 64-bit collisions (≈ n²/2^65 per doc).
    // Verify then runs |A∩B| as a merge walk over the sorted long arrays and
    // |A∪B| = |A| + |B| − |A∩B| — no per-pair hash sets or union arrays.
    val hs = df.select(col(idCol).as("__id"),
      graft.functions.NgramSketch.column(
        TextOps.shingles(col(textCol), shingleK), bottomK).as("__sk"))
      .select(col("__id"),
        col("__sk").getField("bottom").as("__hb"),
        col("__sk").getField("hl").as("__hl"))
      .persist()
    try {
    val banded = hs.select(col("__id"), explode(col("__hb")).as("__bucket"))
    val wB = Window.partitionBy(col("__bucket")).orderBy(col("__id"))
    val numbered = banded.withColumn("__bn", row_number().over(wB))
    val capped = numbered.filter(col("__bn") <= maxBucket)
    lineage.foreach(recordCapStats(_, "ngram_jaccard", numbered, maxBucket))
    val a = capped.select(col("__bucket"), col("__id").as("id_a"))
    val b = capped.select(col("__bucket"), col("__id").as("id_b"))
    val cand = a.join(b, Seq("__bucket")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
    val inter = graft.functions.SortedLongIntersectSize.column(
      col("__hl_a"), col("__hl_b"))
    // size prefilter (classic set-similarity length filter): jac ≥ t implies
    // min(|A|,|B|) ≥ t·max(|A|,|B|) (intersect ≤ min, union ≥ max), so a
    // size-skewed pair can be dropped before any per-element work — sound,
    // output-identical
    val sizeOk =
      size(col("__hl_a")).cast("double") >= lit(threshold) * size(col("__hl_b")) &&
      size(col("__hl_b")).cast("double") >= lit(threshold) * size(col("__hl_a"))
    cand
      .join(hs.select(col("__id").as("id_a"), col("__hl").as("__hl_a")), "id_a")
      .join(hs.select(col("__id").as("id_b"), col("__hl").as("__hl_b")), "id_b")
      .filter(sizeOk)
      .withColumn("jaccard", round(inter.cast("double") /
        (size(col("__hl_a")) + size(col("__hl_b")) - inter), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
      .localCheckpoint()
    } finally hs.unpersist()
  }

  /** Canonicalize near-duplicate clusters: every doc appearing in a pair is
    * labeled with the MIN doc id of its connected component — the standard
    * keep-one-canonical policy applied after candidate/verify pair
    * generation.
    *
    * Distributed min-label propagation WITH POINTER DOUBLING: labels start
    * as each node's own id; each round a node takes the min of its own
    * label, its neighbors' labels, and its label's label (the shortcutting
    * step — each node's pointer chain roughly halves per round, the
    * large-star/small-star idea), so convergence is O(log n) rounds even on
    * chain-shaped components where plain propagation needs O(diameter).
    * Fixpoint (min id of the connected component) is identical; fixpoint
    * when zero labels change. Each round is two shuffles on node id, and
    * labels are localCheckpoint'ed so the plan never grows with iteration
    * count (the classic iterative-lineage blowup).
    */
  def canonicalClusters(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
                        maxIters: Int = 20): DataFrame = {
    // materialize the pair set ONCE before mirroring it: both union branches
    // reference `pairs`, and an expensive upstream (e.g. a blocked similarity
    // self-join) would otherwise execute twice when exchange reuse misses
    val p = pairs.select(col(idA).as("src"), col(idB).as("dst")).localCheckpoint()
    // DRIVER FAST PATH: the edge set is the DUPLICATE-PAIR graph — small
    // relative to the corpus by construction (near-dup pairs only, already
    // capped upstream). Under a bounded edge budget, run exact union-find on
    // the driver (min-id representative = the same fixpoint as min-label
    // propagation; string ids compare in UTF-8 byte order exactly like
    // Spark's `min`) instead of paying (2 joins + shortcut join +
    // localCheckpoint + convergence count) Spark jobs PER DOUBLING ROUND
    // (guide §1.2 / §5: O(edges) driver state with a hard cap). Larger edge
    // sets keep the distributed pointer-doubling loop below.
    // default sized so the collected boxed rows + the 2×-entry parent map
    // stay well inside a modest driver heap (~tens of MB, not the ~GB a 2M
    // default risked); env-tunable for drivers with more headroom. Null ids
    // (never produced by the upstream pair generators, but possible for
    // library callers) fall through to the distributed loop, which carries
    // them like any other value instead of NPE-ing in the comparator.
    val ccCap = sys.env.getOrElse("GRAFT_CC_DRIVER_CAP", "500000").toInt
    val probe = p.limit(ccCap + 1).collect()
    if (probe.length <= ccCap && !probe.exists(r => r.isNullAt(0) || r.isNullAt(1))) {
      val spark = pairs.sparkSession
      val idType = p.schema.head.dataType
      val cmp: (Any, Any) => Int = idType match {
        case org.apache.spark.sql.types.StringType =>
          // unsigned UTF-8 byte order — exactly Spark's string min/least
          (a, b) => {
            val x = a.asInstanceOf[String].getBytes("UTF-8")
            val y = b.asInstanceOf[String].getBytes("UTF-8")
            val n = math.min(x.length, y.length)
            var i = 0
            var r = 0
            while (i < n && r == 0) { r = (x(i) & 0xff) - (y(i) & 0xff); i += 1 }
            if (r != 0) r else x.length - y.length
          }
        case _ =>
          (a, b) => java.lang.Long.compare(
            a.asInstanceOf[Number].longValue, b.asInstanceOf[Number].longValue)
      }
      val parent = new java.util.HashMap[Any, Any]()
      def find(x: Any): Any = {
        var r = x
        while (parent.get(r) != r) r = parent.get(r)
        var c = x // path compression
        while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
        r
      }
      probe.foreach { r =>
        val (a, b) = (r.get(0), r.get(1))
        if (!parent.containsKey(a)) parent.put(a, a)
        if (!parent.containsKey(b)) parent.put(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) {
          // min-id representative keeps the exact min-label fixpoint
          if (cmp(ra, rb) <= 0) parent.put(rb, ra) else parent.put(ra, rb)
        }
      }
      import scala.jdk.CollectionConverters._
      val rows: java.util.List[org.apache.spark.sql.Row] =
        parent.keySet().asScala.toSeq
          .map(id => org.apache.spark.sql.Row(id, find(id))).asJava
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", idType, nullable = false),
        org.apache.spark.sql.types.StructField("canonical_id", idType, nullable = false)))
      return spark.createDataFrame(rows, schema)
    }
    val edges = p
      .union(p.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    // convergence = zero labels changed this round: type-agnostic (string ids
    // work), null-safe on empty edge sets (count of an empty frame is 0, where
    // a sum-of-labels fixpoint NPE'd on the null aggregate), and a component
    // needing more than maxIters doubling rounds (> 2^maxIters nodes) FAILS
    // LOUDLY instead of silently returning unconverged canonical ids
    var it = 0
    var converged = labels.isEmpty
    while (!converged && it < maxIters) {
      val nbrMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src")).agg(min(col("label")).as("__nbr"))
      val viaNbr = labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
        .select(col("id"), col("label").as("__old"),
          least(col("label"), coalesce(col("__nbr"), col("label"))).as("__m"))
      // shortcut: label ← min(label, label-of-label)
      val l2 = labels.select(col("id").as("__lid"), col("label").as("__llab"))
      val next = viaNbr.join(l2, col("__m") === col("__lid"), "left")
        .select(col("id"), col("__old"),
          least(col("__m"), coalesce(col("__llab"), col("__m"))).as("label"))
        .localCheckpoint()
      converged = next.filter(col("label") =!= col("__old")).isEmpty
      labels = next.drop("__old")
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"canonicalClusters did not converge in $maxIters rounds " +
          "(component diameter exceeds maxIters); raise maxIters")
    labels.select(col("id").as("doc_id"), col("label").as("canonical_id"))
  }

  /** Candidate recall of (planes, tables) sign-LSH for a pair at cosine `t`:
    * per-plane agreement p = 1 - acos(t)/π (Goemans-Williamson), recall =
    * 1 - (1 - p^planes)^tables (OR-amplification across tables).
    */
  def signLshRecall(threshold: Double, planes: Int, tables: Int): Double = {
    val p = 1.0 - math.acos(math.max(-1.0, math.min(1.0, threshold))) / math.Pi
    1.0 - math.pow(1.0 - math.pow(p, planes), tables)
  }

  /** Largest plane count whose candidate recall at `threshold` still meets
    * `minRecall` with `tables` OR-amplified tables (more planes = finer
    * buckets = cheaper verification, at the cost of recall — this picks the
    * cheapest geometry that honors the contract). Capped at 31 so bucket ids
    * pack into the low 32 bits of a long.
    */
  def signLshPlanesFor(threshold: Double, tables: Int, minRecall: Double): Int = {
    val p = 1.0 - math.acos(math.max(-1.0, math.min(1.0, threshold))) / math.Pi
    val perTable = 1.0 - math.pow(1.0 - minRecall, 1.0 / tables)
    val planes = math.floor(math.log(perTable) / math.log(p)).toInt
    math.max(1, math.min(31, planes))
  }

  /** Embedding-cosine near-dup pairs via sign-LSH bucketing; exact cosine on
    * candidates only (see Similarity.cosine). Pairing runs on bare 8-byte ids
    * — a degenerate bucket goes quadratic in ids, not in vector payload — and
    * the (small) deduped candidate set re-joins the vectors for scoring.
    *
    * HONEST RECALL CONTRACT: `planes = 0` (default) derives the plane count
    * from the threshold so candidate recall for a pair AT the threshold is ≥
    * `minRecall`; an explicit `planes` is REJECTED if its geometry cannot
    * deliver `minRecall` at the threshold (the silent-recall-gap failure
    * mode: 12 planes × 8 tables at threshold 0.3 has recall ≈ 2%). Low
    * thresholds necessarily buy coarse buckets and a near-quadratic verify
    * stage — that cost is inherent to sign-LSH, not a tuning knob; below
    * cosine ~0.5 prefer an exact blocked join or IVF-cell candidates.
    */
  def embeddingNearDupPairs(
      df: DataFrame, vecCol: String, idCol: String,
      threshold: Double = 0.95, planes: Int = 0, tables: Int = 8,
      seed: Long = 42L, minRecall: Double = 0.9): DataFrame = {
    val usePlanes =
      if (planes <= 0) signLshPlanesFor(threshold, tables, minRecall)
      else planes
    val achieved = signLshRecall(threshold, usePlanes, tables)
    require(achieved >= minRecall - 1e-9,
      f"sign-LSH geometry (planes=$usePlanes, tables=$tables) has candidate " +
        f"recall $achieved%.3f < $minRecall%.2f for pairs at cosine $threshold%.2f; " +
        "use fewer planes / more tables (or planes=0 to derive)")
    val vecs = df.select(col(idCol).as("__id"),
      Similarity.asDoubleVec(col(vecCol)).as("__v"))
    val bucketed = Similarity.signBucketsMulti(df, vecCol, idCol, usePlanes, tables, seed)
    val a = bucketed.select(col("__bucket"), col("__id").as("id_a"))
    val b = bucketed.select(col("__bucket"), col("__id").as("id_b"))
    val pairs = a.join(b, Seq("__bucket")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
    pairs
      .join(vecs.select(col("__id").as("id_a"), col("__v").as("__va")), "id_a")
      .join(vecs.select(col("__id").as("id_b"), col("__v").as("__vb")), "id_b")
      .withColumn("cosine", round(Similarity.cosine(col("__va"), col("__vb")), 6))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
