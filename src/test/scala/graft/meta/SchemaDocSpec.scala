package graft.meta

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

class SchemaDocSpec extends AnyFunSuite {

  test("formatType collapses widths and recurses into nested types") {
    assert(Schemas.formatType(LongType) === "numeric")
    assert(Schemas.formatType(StringType) === "string")
    assert(Schemas.formatType(ArrayType(StringType)) === "list(string)")
    assert(Schemas.formatType(
      StructType(Seq(StructField("a", IntegerType), StructField("b", ArrayType(DoubleType)))))
      === "struct(a: numeric, b: list(numeric))")
    assert(Schemas.formatType(TimestampType) === "datetime")
  }

  test("toMarkdown renders a pipe table of tag-filtered fields with descriptions") {
    val md = Schemas.toMarkdown(Schemas.media, "media", headerLevel = 3,
      exclude = Set(Schemas.Tag.Metadata))
    assert(md.startsWith("### media"))
    assert(md.contains("| Name"))
    assert(md.contains("| url_hash"))
    assert(md.contains("SHA-256 of evidence_url") === false) // that desc is on equipmentLoss
    assert(!md.contains("as_of_date"), md) // metadata-tagged → excluded
    // every line of the table body is a well-formed pipe row
    val body = md.linesIterator.drop(2).toSeq
    assert(body.forall(l => l.startsWith("|") && l.endsWith("|")), md)
  }

  test("toMarkdown on equipmentLoss carries field descriptions through") {
    val md = Schemas.toMarkdown(Schemas.equipmentLoss, "equipment-loss")
    assert(md.contains("SHA-256 of evidence_url"))
    assert(md.contains("list(string)")) // status array
  }
}
