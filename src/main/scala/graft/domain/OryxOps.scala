package graft.domain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Borderlands domain-operator parity (SURVEY.md §2), re-expressed as pure
  * Catalyst transforms. Everything here is codegen-friendly built-ins except
  * the two tokenizer UDFs, which exist only for literal reference parity and
  * sit off the hot path (reference misc.py:14-104).
  */
object OryxOps {

  /** Status keywords incl. the reference's deliberate typo variants
    * (oryx.py:99-110).
    */
  val statusKeywordMap: Seq[(String, Seq[String])] = Seq(
    "captured"  -> Seq("captured"),
    "destroyed" -> Seq("destroyed"),
    "damaged"   -> Seq("damaged", "damagd"),
    "abandoned" -> Seq("abandoned", "abanonded"),
    "scuttled"  -> Seq("scuttled"),
    "stripped"  -> Seq("stripped"),
    "sunk"      -> Seq("sunk"),
    "raised"    -> Seq("raised"))

  /** Evidence-URL domain → source (oryx.py:114-125). */
  val domainSourceMap: Map[String, String] = Map(
    "i.postimg.cc" -> "postimg", "postimg.cc" -> "postimg", "postlmg.cc" -> "postimg",
    "twitter.com" -> "twitter", "pic.twitter.com" -> "twitter",
    "starkon.city" -> "other", "aviation-safety.net" -> "other",
    "en.wikipedia.org" -> "other")

  /** assign_status (oryx.py:171-213): per-status any-keyword-contains flag
    * (F2/F3/F4), assembled into a sorted, distinct, null-free array
    * (F8-F14). Polars sorts nulls first then slices them off; Spark's
    * array_compact + array_distinct + array_sort lands on the same value.
    */
  def assignStatus(df: DataFrame, descCol: String = "description",
                   out: String = "status"): DataFrame = {
    val flags = statusKeywordMap.map { case (status, kws) =>
      when(kws.map(col(descCol).contains(_)).reduce(_ || _), lit(status))
    }
    df.withColumn(out, array_sort(array_distinct(array_compact(array(flags: _*)))))
  }

  /** map_dict as a column op (oryx.py:228-232, J3/F7): constant map lookup
    * via element_at on a literal map — broadcast-free, codegen'd; unmapped
    * keys stay null (the reference alerts on them rather than dropping).
    */
  def mapDict(c: Column, mapper: Map[String, String]): Column =
    if (mapper.isEmpty) lit(null).cast("string") else element_at(typedlit(mapper), c)

  /** assign_country_of_production (oryx.py:216-233). */
  def assignCountryOfProduction(df: DataFrame, mapper: Map[String, String],
                                flagCol: String = "country_of_production_flag_url",
                                out: String = "country_of_production"): DataFrame =
    df.withColumn(out, mapDict(col(flagCol), mapper))

  /** assign_evidence_source (oryx.py:236-250, F6): urlparse().netloc is
    * Spark's parse_url(url, 'HOST').
    */
  def assignEvidenceSource(df: DataFrame, urlCol: String = "evidence_url",
                           out: String = "evidence_source"): DataFrame =
    df.withColumn(out, mapDict(parse_url(col(urlCol), lit("HOST")), domainSourceMap))

  /** calculate_url_hash (oryx.py:253-267, F5): sha256 hexdigest of the UTF-8
    * URL — built-in sha2, no row-apply.
    */
  def calculateUrlHash(df: DataFrame, urlCol: String = "evidence_url",
                       out: String = "url_hash"): DataFrame =
    df.withColumn(out, sha2(col(urlCol), 256))

  /** resolve_aircraft_and_naval_page_updates (oryx.py:270-342, A1/A2 + J1 +
    * J2): cross-page dedup then category-correction lookup. Both right sides
    * are small → broadcast; the fact side never shuffles.
    *
    * @param corrections columns (model, old_category, new_category)
    */
  def resolveAircraftAndNavalPageUpdates(df: DataFrame, corrections: DataFrame): DataFrame = {
    val oldPages = Seq("Aircraft", "Naval Ships")
    val keys = Seq("country", "model", "url_hash")
    val agg = df.groupBy(keys.map(col): _*)
      .agg(collect_set(col("category")).as("categories"))
      .withColumn("from_original",
        array_contains(col("categories"), oldPages(0)) ||
        array_contains(col("categories"), oldPages(1)))
      .withColumn("pages_shared_on", size(col("categories")))
    val toReplace = agg.filter(col("from_original") && col("pages_shared_on") > 1)
      .select((keys.map(col) :+ lit(1).as("to_replace")): _*)
    val deduped = df.join(broadcast(toReplace), keys, "left")
      .filter(col("to_replace").isNull ||
        (col("to_replace").isNotNull && !col("category").isin(oldPages: _*)))
      .drop("to_replace")
    deduped.join(broadcast(corrections),
        deduped("category") === corrections("old_category") &&
        deduped("model") === corrections("model"), "left")
      .withColumn("category",
        when(col("new_category").isNotNull, col("new_category")).otherwise(deduped("category")))
      .drop(corrections("model")).drop("old_category", "new_category")
  }

  /** calculate_case_id (oryx.py:345-377, W1): running ordinal per dimension
    * group. Polars relies on implicit parse order; on a cluster that order
    * does not exist, so the caller supplies an explicit total order.
    */
  def calculateCaseId(df: DataFrame, ordCols: Seq[Column],
                      keys: Seq[String] = Seq("country", "category", "model", "url_hash"),
                      out: String = "case_id"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordCols: _*)
    df.withColumn(out, row_number().over(w).cast("int"))
  }

  /** Unmapped-flag alert feed (oryx.py:46-80, P3/A5): null-enrichment rows
    * counted per offending URL — the reference renders these as a warning
    * artifact; our engine lands them in the lineage sidecar.
    */
  def unmappedFlagCounts(df: DataFrame,
                         mappedCol: String = "country_of_production",
                         urlCol: String = "country_of_production_flag_url"): DataFrame =
    df.filter(col(mappedCol).isNull).groupBy(col(urlCol)).count()

  // --------------------------------------------------------------------
  // Tokenizer UDFs — literal ports of the reference's two-pointer scanners
  // (misc.py:14-70, misc.py:73-104); domain-parity only, not on hot paths.
  // --------------------------------------------------------------------

  /** parse_alphabet_items: maximal runs of chars from `alphabet`
    * ("12, 34a 5b6 7" with digits → [12, 34, 5, 6, 7]).
    */
  def parseAlphabetItemsFn(alphabet: String): String => Seq[String] = { text =>
    if (text == null) Seq.empty
    else {
      val items = scala.collection.mutable.ArrayBuffer.empty[String]
      var tail = 0
      while (tail < text.length) {
        while (tail < text.length && !alphabet.contains(text(tail))) tail += 1
        if (tail < text.length) {
          var head = tail
          while (head < text.length && alphabet.contains(text(head))) head += 1
          items += text.substring(tail, head)
          tail = head + 1
        }
      }
      items.toSeq
    }
  }

  val digits = "0123456789"
  val alphanumerics = ('a' to 'z').mkString + ('A' to 'Z').mkString + digits

  val parseDigitItems = udf(parseAlphabetItemsFn(digits))
  val parseAlphanumericItems = udf(parseAlphabetItemsFn(alphanumerics))

  /** series_splitter: Oxford-comma list split with and/nor/but/or handling
    * ("a, b, c, and d" → [a, b, c, d]).
    */
  def seriesSplitterFn(delimiter: String = ","): String => Seq[String] = { text =>
    if (text == null) Seq.empty
    else {
      var items = text.split(java.util.regex.Pattern.quote(delimiter + " "), -1)
        .map(_.trim).toVector
      val conjunctions = Seq("and", "nor", "but", "or")
      conjunctions.collectFirst {
        case c if items.last.startsWith(c + " ") =>
          items = items.init :+ items.last.stripPrefix(c + " ")
        case c if items.last.contains(" " + c + " ") =>
          val item = items.last
          items = items.init ++ item.split(" " + c + " ").map(_.trim)
      }
      items
    }
  }

  val seriesSplitter = udf(seriesSplitterFn())

  /** Digit extraction with dedup as used by the evidence parser
    * (evidence.py:51-52): parse digit runs, set-dedup. Codegen path:
    * regexp_extract_all + array_distinct (identical semantics to the
    * two-pointer scan for a digits alphabet).
    */
  def extractCaseCounts(c: Column): Column =
    array_distinct(regexp_extract_all(c, lit("\\d+"), lit(0)))
}
