package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language ID, document fingerprinting. All pure
  * Catalyst expressions (built-ins + higher-order functions) — no UDFs on the
  * hot path, whole-stage-codegen friendly, embarrassingly parallel (no
  * shuffle: every op is per-row).
  */
object TextOps {

  /** Whitespace token count. Counts `\S+` matches rather than splitting —
    * split("") yields [""] and would report 1 token for empty/blank text.
    */
  def tokenCountWs(text: Column): Column =
    size(regexp_extract_all(text, lit("\\S+"), lit(0)))

  /** BPE-ish subword token count: runs of letters, runs of digits, or single
    * non-space symbols — a cheap, deterministic proxy for tokenizer cost.
    */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Normalized lowercase word tokens. */
  def wordTokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)

  /** Quality heuristics: alpha ratio, whitespace ratio, punctuation ratio,
    * stopword ratio, mean word length — the usual cheap pre-filters.
    */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "on", "for", "with", "as", "at", "by", "from", "that", "this")

  def qualityScore(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val n = length(t).cast("double")
    val toks = wordTokens(t)
    val nToks = size(toks).cast("double")
    val stopHits = size(filter(toks, w => w.isin(stopwords.map(lit): _*))).cast("double")
    df.withColumn("n_chars", length(t).cast("long"))
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("alpha_ratio", round(length(regexp_replace(t, "[^A-Za-z]", "")) / n, 4))
      .withColumn("space_ratio", round(length(regexp_replace(t, "[^ \\t\\n]", "")) / n, 4))
      .withColumn("punct_ratio", round(length(regexp_replace(t, "[^.,;:!?'\"()]", "")) / n, 4))
      .withColumn("stopword_ratio", round(when(nToks > 0, stopHits / nToks).otherwise(0.0), 4))
      .withColumn("mean_word_len",
        round(when(nToks > 0, aggregate(toks, lit(0L), (acc, w) => acc + length(w)) / nToks)
          .otherwise(0.0), 4))
  }

  /** N-gram-heuristic language ID: score = stopword-marker hits per language,
    * argmax with deterministic tiebreak (score desc, language asc). Markers
    * are tiny constant arrays → codegen'd `isin`, no dictionaries shipped.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "pour"),
    "es" -> Seq("el", "la", "los", "que", "es", "por", "una"),
    "it" -> Seq("il", "la", "che", "di", "non", "per", "una"))

  def langId(text: Column, out: String = "lang_pred"): Column = {
    val toks = wordTokens(text)
    // struct ordering trick: max(struct(score, reverse-alph lang)) = argmax
    val scored = langMarkers.map { case (lang, markers) =>
      struct(size(filter(toks, w => w.isin(markers.map(lit): _*))).as("score"),
             lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("unknown"))
  }

  /** Rolling document fingerprint: chained hash over each k-token window,
    * winnowed to the MIN window hash (robust to small edits away from the
    * minimizing window). Pure higher-order functions: sequence → transform →
    * aggregate; the window chain uses xxhash64(acc, h) rather than a
    * polynomial so it stays overflow-free under ANSI mode.
    */
  def fingerprint(text: Column, k: Int = 8): Column =
    fingerprintChain(text, k, t => xxhash64(t), (a, b) => xxhash64(a, b))

  /** [[fingerprint]] in a hash space DuckDB can replicate (first 16 hex chars
    * of sha256; the min is over hex STRINGS, identical lexicographic order in
    * both engines) — the oracle-checkable twin of the xxhash64 fast path.
    */
  def fingerprintPortable(text: Column, k: Int = 8): Column =
    fingerprintChain(text, k,
      t => substring(sha2(t, 256), 1, 16),
      (a, b) => substring(sha2(concat(a, b), 256), 1, 16))

  private def fingerprintChain(
      text: Column, k: Int,
      hashTok: Column => Column, hashPair: (Column, Column) => Column): Column = {
    // k zip_with passes over shifted views instead of per-window slice+fold:
    // acc_j[i] = H(acc_{j-1}[i], hashes[i+j]) — same chained-window hashes,
    // O(n·k) with k cheap vectorized passes (the slice-per-window form paid
    // an interpreted fold per window and measured 4x slower)
    val toks = wordTokens(text)
    val hashes = transform(toks, hashTok)
    val nWin = greatest(size(hashes) - (k - 1), lit(1))
    val first = slice(hashes, lit(1), nWin)
    val chained = (1 until k).foldLeft(first) { (acc, j) =>
      zip_with(acc, slice(hashes, lit(j + 1), nWin), hashPair)
    }
    // a doc with fewer than k tokens has no full window: null, not a
    // padded-window hash (zip_with null padding differs across engines)
    when(size(toks) >= k, array_min(chained))
  }

  /** Shingle strings: k-token shingles joined with a single space. The
    * space keeps the join injective (tokens contain no whitespace) and
    * PORTABLE: the old separator was a raw \u0001 byte, which an external
    * oracle re-computing shingle hashes cannot see in rendered source.
    */
  def shingles(text: Column, k: Int): Column = {
    val toks = wordTokens(text)
    val nWin = greatest(size(toks) - (k - 1), lit(1))
    array_distinct(transform(sequence(lit(0), nWin - 1), i =>
      array_join(slice(toks, i + 1, lit(k)), " ")))
  }
}
