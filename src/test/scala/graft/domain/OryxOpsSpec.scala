package graft.domain

import org.apache.spark.sql.functions._
import graft.SparkSuite

class OryxOpsSpec extends SparkSuite {
  import spark.implicits._

  test("assignStatus: keyword flags incl. typos → sorted distinct null-free array") {
    // descriptions in the spirit of the reference corpus (tests/data/descriptions.txt)
    val df = Seq(
      (1, "53, 54, 55, 56 and 57, captured and later destroyed"),
      (2, "26, with 23mm ZU-23, destroyed"),
      (3, "1, damagd and abanonded"), // reference's typo variants
      (4, "2, sunk and later raised and stripped"),
      (5, "pristine, no keyword")
    ).toDF("id", "description")
    val got = OryxOps.assignStatus(df).select("id", "status")
      .as[(Int, Seq[String])].collect().toMap
    assert(got(1) === Seq("captured", "destroyed"))
    assert(got(2) === Seq("destroyed"))
    assert(got(3) === Seq("abandoned", "damaged"))
    assert(got(4) === Seq("raised", "stripped", "sunk"))
    assert(got(5) === Seq.empty)
  }

  test("parseAlphabetItems matches the reference doctests exactly") {
    val digitsFn = OryxOps.parseAlphabetItemsFn(OryxOps.digits)
    assert(digitsFn("12, 34a 5b6 7") === Seq("12", "34", "5", "6", "7"))
    val alnumFn = OryxOps.parseAlphabetItemsFn(OryxOps.alphanumerics)
    assert(alnumFn("one, two three, four") === Seq("one", "two", "three", "four"))
    // codegen path (regexp) agrees with the two-pointer scan for digits
    val viaExpr = Seq("26, with 23mm ZU-23, destroyed").toDF("d")
      .select(OryxOps.extractCaseCounts(col("d"))).as[Seq[String]].head()
    assert(viaExpr === digitsFn("26, with 23mm ZU-23, destroyed").distinct)
  }

  test("seriesSplitter matches the reference doctests exactly") {
    val f = OryxOps.seriesSplitterFn()
    assert(f("a, b, c, and d") === Seq("a", "b", "c", "d"))
    assert(f("a, b, c or d") === Seq("a", "b", "c", "d"))
    assert(f("a, b, c, nor d") === Seq("a", "b", "c", "d"))
    assert(f("single") === Seq("single"))
  }

  test("assignEvidenceSource + calculateUrlHash + country mapping") {
    val df = Seq(
      ("https://i.postimg.cc/abc/photo.jpg", "flagA"),
      ("https://twitter.com/x/status/1", "flagB"),
      ("https://unknown.example.org/x", "flagC")
    ).toDF("evidence_url", "country_of_production_flag_url")
    val out = OryxOps.calculateUrlHash(
      OryxOps.assignEvidenceSource(
        OryxOps.assignCountryOfProduction(df, Map("flagA" -> "SUN", "flagB" -> "USA"))))
    val rows = out.select("evidence_source", "country_of_production", "url_hash")
      .as[(Option[String], Option[String], String)].collect()
    assert(rows(0) === (Some("postimg"), Some("SUN"),
      // sha256 of the URL, independently computed
      java.security.MessageDigest.getInstance("SHA-256")
        .digest("https://i.postimg.cc/abc/photo.jpg".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString))
    assert(rows(1)._1 === Some("twitter") && rows(1)._2 === Some("USA"))
    assert(rows(2)._1 === None && rows(2)._2 === None) // unmapped stays null, alerted not dropped
    // the alert feed counts the unmapped flag url
    val alerts = OryxOps.unmappedFlagCounts(out)
      .as[(String, Long)].collect().toMap
    assert(alerts === Map("flagC" -> 1L))
  }

  test("resolveAircraftAndNavalPageUpdates: cross-page dedup + corrections (oryx.py:270-342)") {
    // same (country,model,url_hash) appears on old page 'Aircraft' AND new page
    // 'List of Aircraft Losses' → old-page row dropped; standalone old-page
    // row kept; corrections then rename category.
    val df = Seq(
      ("Russia", "Su-25", "h1", "Aircraft"),
      ("Russia", "Su-25", "h1", "List of Aircraft Losses"),
      ("Russia", "Mi-8", "h2", "Aircraft"),          // only on old page → kept
      ("Russia", "T-62M", "h3", "Tanks")
    ).toDF("country", "model", "url_hash", "category")
    val corrections = Seq(("Mi-8", "Aircraft", "Helicopters"))
      .toDF("model", "old_category", "new_category")
    val got = OryxOps.resolveAircraftAndNavalPageUpdates(df, corrections)
      .select("model", "url_hash", "category").as[(String, String, String)].collect().toSet
    assert(got === Set(
      ("Su-25", "h1", "List of Aircraft Losses"),
      ("Mi-8", "h2", "Helicopters"),
      ("T-62M", "h3", "Tanks")))
  }

  test("calculateCaseId: docstring example — same dims, two cases") {
    val df = Seq(
      ("Russia", "Tanks", "T-62M", "6c10", 10L, "1, damaged and captured"),
      ("Russia", "Tanks", "T-62M", "6c10", 20L, "1, destroyed"),
      ("Russia", "Tanks", "T-72", "aaaa", 30L, "1, destroyed")
    ).toDF("country", "category", "model", "url_hash", "lsn", "description")
    val got = OryxOps.calculateCaseId(df, Seq(col("lsn")))
      .select("url_hash", "lsn", "case_id").as[(String, Long, Int)].collect().toSet
    assert(got === Set(("6c10", 10L, 1), ("6c10", 20L, 2), ("aaaa", 30L, 1)))
  }

  test("media inventory: collapse, precedence merge, split, key building") {
    val losses = Seq(
      ("h1", "http://a/1.jpg", "postimg", 1L),
      ("h1", "http://a/1.jpg", "postimg", 2L),
      ("h2", "http://b/2", "twitter", 3L)
    ).toDF("url_hash", "evidence_url", "evidence_source", "lsn")
    val inv = MediaOps.createMediaInventory(losses, col("lsn"))
    assert(inv.count() === 2)
    assert(inv.schema.fieldNames.toSeq ===
      graft.meta.Schemas.media.fieldNames.toSeq)
    // current wins over candidates
    val current = inv.withColumn("media_key",
      when(col("url_hash") === "h1", lit("postimg/h1.jpg")))
    val merged = MediaOps.mergeInventoryState(current, inv, Seq(col("url_hash")))
    val (done, todo) = MediaOps.splitDownloaded(merged)
    assert(done.count() === 1 && todo.count() === 1)
    val key = inv.select(MediaOps.mediaKey(col("evidence_source"), col("url_hash"),
      col("file_type"))).as[String].collect().toSet
    assert(key === Set("postimg/h1.unknown", "twitter/h2.unknown"))
  }

  test("tag-filtered projection (schema.py:52-75 semantics)") {
    import graft.meta.Schemas
    val cols = Schemas.columns(Schemas.equipmentLoss,
      exclude = Set(Schemas.Tag.Metadata, Schemas.Tag.Debug))
    assert(!cols.contains("as_of_date") && !cols.contains("description") &&
      !cols.contains("id_") && !cols.contains("country_of_production_flag_url"))
    assert(cols.contains("country") && cols.contains("status"))
    val dims = Schemas.columns(Schemas.equipmentLoss, include = Set(Schemas.Tag.Dimension))
    assert(dims === Seq("country", "category", "model", "url_hash", "case_id"))
  }
}
