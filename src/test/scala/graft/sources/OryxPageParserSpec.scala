package graft.sources

import java.io.{BufferedReader, InputStreamReader}
import java.util.zip.GZIPInputStream
import graft.SparkSuite

/** Golden-input parser tests in the reference's own style (its pytest suite
  * parses the same four gzipped Oryx pages, tests/test_parser.py:11-88):
  * assertions on shape/keys/types of the parse output.
  */
class OryxPageParserSpec extends SparkSuite {

  private def loadPage(name: String): String = {
    val in = new GZIPInputStream(new java.io.FileInputStream(
      s"/root/reference/tests/data/pages/$name.html.gz"))
    val r = new BufferedReader(new InputStreamReader(in, "UTF-8"))
    try Iterator.continually(r.readLine()).takeWhile(_ != null).mkString("\n")
    finally r.close()
  }

  test("synthetic page: exact cascade semantics") {
    val page =
      """<html><body>
        |<h3>Tanks (3, of which destroyed: 2, captured: 1)</h3>
        |<ul>
        |<li><img src="http://flags/su.png" />&nbsp;2 T-62M:&nbsp;
        |  <a href="http://ev/1">(1, destroyed)</a>
        |  <a href="http://ev/2">(2, with 23mm ZU-23, captured)</a></li>
        |<li><img src="http://flags/ru.png" /> 1 T-90: <a href="http://ev/3">(1 and 2, destroyed)</a></li>
        |</ul>
        |</body></html>""".stripMargin
    val got = OryxPageParser.parsePage(page, Some("Russia"))
    // li 1, link 2: digit runs {2, 23} (the 23mm) → 2 rows; link 1 → 1 row
    // li 2: digit runs {1, 2} → 2 rows
    assert(got.size === 5)
    assert(got.forall(_.country == "Russia"))
    assert(got.forall(_.category == "Tanks"))
    val t62 = got.filter(_.model == "T-62M")
    assert(t62.map(_.id_).toSet === Set(1, 2, 23))
    assert(t62.forall(_.country_of_production_flag_url == "http://flags/su.png"))
    val fromLink2 = got.filter(_.evidence_url == "http://ev/2")
    assert(fromLink2.map(_.id_).toSet === Set(2, 23))
    assert(fromLink2.head.description === "2, with 23mm ZU-23, captured")
    assert(got.filter(_.model == "T-90").map(_.id_).toSet === Set(1, 2))
  }

  test("golden multi-country page (russia.html.gz) parses with correct shape") {
    val losses = OryxPageParser.parsePage(loadPage("russia"), None)
    assert(losses.size > 5000, s"only ${losses.size} losses parsed")
    assert(losses.forall(l => l.country == "Russia" || l.country == "Ukraine"))
    assert(losses.forall(_.category.nonEmpty))
    assert(losses.forall(_.model.nonEmpty))
    assert(losses.forall(_.evidence_url != null))
    // the reference emits whatever href the page carries; the overwhelming
    // majority are absolute evidence links
    val httpShare = losses.count(_.evidence_url.startsWith("http")).toDouble / losses.size
    assert(httpShare > 0.97, s"httpShare=$httpShare")
    assert(losses.map(_.category).distinct.size > 10)
    // the known categories from the page appear
    val cats = losses.map(_.category).toSet
    assert(cats.contains("Tanks"), cats.take(20).toString)
  }

  test("golden single-country pages parse and fan out via Spark flatMap") {
    import spark.implicits._
    val pages = Seq(
      (loadPage("aircraft"), null.asInstanceOf[String]),
      (loadPage("naval"), null.asInstanceOf[String])).toDS()
    val losses = OryxPageParser.parsePages(spark, pages)
    val n = losses.count()
    assert(n > 100, s"only $n losses")
    // no shuffle in the parse plan: flatMap over the input only
    val plan = losses.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
