package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import scala.util.matching.Regex

/** Row emitted per confirmed loss (reference parser cascade output shape,
  * Borderlands src/borderlands/parser: one row per (evidence link × case id)).
  */
final case class OryxLoss(
    country: String,
    category: String,
    model: String,
    country_of_production_flag_url: String,
    evidence_url: String,
    description: String,
    id_ : Int)

/** From-scratch Oryx equipment-loss page parser (SURVEY.md §2.1 S2).
  *
  * The reference walks a BeautifulSoup DOM through a four-level generator
  * cascade (parser.py → article.py → equipment_category.py →
  * equipment_model.py → evidence.py). This implementation is a single-pass
  * regex scanner over the raw page string — no DOM — designed for
  * `Dataset[String].flatMap`: each executor parses whole pages independently,
  * so a crawl of millions of pages parallelizes with zero shuffle.
  *
  * Semantics matched to the reference (same row fan-out):
  *  - multi-country pages: `<h3>Russia - NNN…` headers split country sections
  *    (parser.py:60-80)
  *  - category headers: h3 text matching `^.+\(\d+, .+\)$` → category label =
  *    text before ` (N,` (equipment_category.py:24-31)
  *  - each li under the category's next <ul>: model = text before first ':'
  *    via `^\s*(\d*)\s+(.+)$` (equipment_model.py:31-38); flag = first <img src>
  *  - each <a href>: description = link text stripped of parens; one row per
  *    DISTINCT digit run in it (evidence.py:40-58)
  * Per-item failures are skipped, not fatal (article.py:88-92) — counted by
  * the caller via the returned rows vs page count if needed.
  */
object OryxPageParser {

  private val h3Re: Regex = "(?s)<h3[^>]*>(.*?)</h3>".r
  private val tagRe: Regex = "<[^>]+>".r
  private val countryHeadRe: Regex = "(?s)^(Russia|Ukraine) \\- \\d+.*$".r
  private val categoryHeadRe: Regex = "(?s)^.+\\(\\d+, .+\\)\\s*$".r
  private val ulRe: Regex = "(?s)<ul[^>]*>(.*?)</ul>".r
  private val liSplitRe = "<li[^>]*>"
  private val imgSrcRe: Regex = "(?s)<img[^>]*?src=[\"']([^\"']+)[\"']".r
  private val aRe: Regex = "(?s)<a[^>]*?href=[\"']([^\"']+)[\"'][^>]*>(.*?)</a>".r
  private val modelRe: Regex = "(?s)^\\s*(\\d*)\\s+(.+)$".r
  private val digitsRe: Regex = "\\d+".r

  private[sources] def stripTags(s: String): String =
    unescape(tagRe.replaceAllIn(s, ""))

  private[sources] def unescape(s: String): String = s
    .replace("&nbsp;", " ").replace("&amp;", "&").replace("&lt;", "<")
    .replace("&gt;", ">").replace("&quot;", "\"").replace("&#39;", "'")

  /** All h3 headers with (cleanText, endOffset). */
  private def headers(page: String): Seq[(String, Int)] =
    h3Re.findAllMatchIn(page).map(m => (stripTags(m.group(1)).trim, m.end)).toSeq

  /** Parse one page. `country` None → multi-country page (sections split on
    * "Russia - N" / "Ukraine - N" h3 headers).
    */
  def parsePage(page: String, country: Option[String]): Seq[OryxLoss] = {
    val hs = headers(page)
    // country section boundaries by header offset
    val countryMarks: Seq[(String, Int)] = hs.collect {
      case (t, off) if countryHeadRe.matches(t) =>
        (countryHeadRe.findFirstMatchIn(t).get.group(1), off)
    }
    def countryAt(off: Int): Option[String] = country.orElse(
      countryMarks.filter(_._2 <= off).lastOption.map(_._1))

    hs.collect { case (t, off) if !countryHeadRe.matches(t) && categoryHeadRe.matches(t) =>
      (t, off)
    }.flatMap { case (headText, off) =>
      val category = headText.substring(0, headText.indexOf(" (")).trim
      // the category's list is the next <ul> after the header
      ulRe.findFirstMatchIn(page.substring(off)).map(_.group(1)) match {
        case None => Seq.empty
        case Some(ul) =>
          val items = ul.split(liSplitRe).drop(1).toSeq
          items.flatMap(li => parseModelItem(li, category, countryAt(off)))
      }
    }
  }

  /** One li = one equipment model with its evidence links. */
  private def parseModelItem(li: String, category: String, country: Option[String]): Seq[OryxLoss] =
    try {
      val text = stripTags(li)
      val beforeColon = text.split(":", 2)(0)
      val model = modelRe.findFirstMatchIn(beforeColon).map(_.group(2).trim).getOrElse {
        return Seq.empty // malformed item: skip, don't fail the page
      }
      val flagUrl = imgSrcRe.findFirstMatchIn(li).map(_.group(1)).orNull
      aRe.findAllMatchIn(li).toSeq.flatMap { a =>
        val url = a.group(1)
        val desc = stripTags(a.group(2)).stripPrefix("(").stripSuffix(")")
        // one loss per DISTINCT digit run (evidence.py set-dedup)
        digitsRe.findAllIn(desc).toSeq.distinct.flatMap { idStr =>
          scala.util.Try(idStr.toInt).toOption.map { id =>
            OryxLoss(country.orNull, category, model, flagUrl, url, desc, id)
          }
        }
      }
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }

  /** Spark-first surface: (pageHtml, countryOrNull) → losses, parallel per
    * page, no shuffle.
    */
  def parsePages(spark: SparkSession, pages: Dataset[(String, String)]): Dataset[OryxLoss] = {
    import spark.implicits._
    pages.flatMap { case (html, c) => parsePage(html, Option(c)) }
  }
}
