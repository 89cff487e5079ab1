package graft.meta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Declarative schema registry with tag metadata and tag-filtered projection
  * — Spark-native rendering of the reference's Schema/Field/Tag system
  * (Borderlands src/borderlands/schema/schema.py:15-138, fields.py:11-33):
  * tags and descriptions live in `StructField.metadata`, projection is a
  * plain `select` so Parquet column pruning applies (SURVEY §2.2 P1, §2.1 S7).
  */
object Schemas {

  object Tag {
    val Dimension = "dimension"
    val Attribute = "attribute"
    val Context   = "context"
    val Metadata  = "metadata"
    val Debug     = "debug"
    val Inherited = "inherited"
    val Equipment = "equipment"
    val Media     = "media"
  }

  def field(name: String, dt: DataType, tags: Seq[String],
            description: String = "", nullable: Boolean = true): StructField =
    StructField(name, dt, nullable, new MetadataBuilder()
      .putStringArray("tags", tags.toArray)
      .putString("description", description)
      .build())

  def tagsOf(f: StructField): Set[String] =
    if (f.metadata.contains("tags")) f.metadata.getStringArray("tags").toSet else Set.empty

  /** Tag-filtered column list (schema.py:52-75 semantics): a field is kept if
    * it carries any `include` tag (or include is empty) and no `exclude` tag.
    */
  def columns(schema: StructType, include: Set[String] = Set.empty,
              exclude: Set[String] = Set.empty): Seq[String] =
    schema.fields.toSeq.filter { f =>
      val t = tagsOf(f)
      (include.isEmpty || t.intersect(include).nonEmpty) && t.intersect(exclude).isEmpty
    }.map(_.name)

  def selectByTags(df: DataFrame, schema: StructType,
                   include: Set[String] = Set.empty,
                   exclude: Set[String] = Set.empty): DataFrame =
    df.select(columns(schema, include, exclude).map(col): _*)

  // ---- markdown schema docs (reference schema/formatter.py:17-93,
  // cli/docs.py): legible type names incl. nested list/struct, pipe table
  // of tag-filtered fields ----

  /** format_type (formatter.py:17-58): collapse concrete widths into the
    * reader-facing families; recurse into list/struct.
    */
  def formatType(dt: DataType): String = dt match {
    case _: DecimalType | FloatType | DoubleType | ByteType | ShortType |
         IntegerType | LongType => "numeric"
    case BooleanType => "boolean"
    case StringType => "string"
    case DateType => "date"
    case TimestampType | TimestampNTZType => "datetime"
    case DayTimeIntervalType(_, _) | YearMonthIntervalType(_, _) => "timecode"
    case ArrayType(inner, _) => s"list(${formatType(inner)})"
    case StructType(fields) =>
      s"struct(${fields.map(f => s"${f.name}: ${formatType(f.dataType)}").mkString(", ")})"
    case BinaryType => "binary"
    case other => throw new IllegalArgumentException(s"Unsupported datatype $other")
  }

  /** _format_schema (formatter.py:72-93): markdown pipe table of the
    * tag-filtered fields with legible types + descriptions.
    */
  def toMarkdown(schema: StructType, label: String, headerLevel: Int = 2,
                 include: Set[String] = Set.empty,
                 exclude: Set[String] = Set.empty): String = {
    val kept = columns(schema, include, exclude).toSet
    val rows = schema.fields.toSeq.filter(f => kept.contains(f.name)).map { f =>
      val desc = if (f.metadata.contains("description"))
        f.metadata.getString("description") else ""
      (f.name, formatType(f.dataType), desc)
    }
    val header = s"${"#" * headerLevel} $label"
    val widths = Seq(
      math.max(4, rows.map(_._1.length).maxOption.getOrElse(0)),
      math.max(4, rows.map(_._2.length).maxOption.getOrElse(0)),
      math.max(11, rows.map(_._3.length).maxOption.getOrElse(0)))
    def row(a: String, b: String, c: String): String =
      s"| ${a.padTo(widths(0), ' ')} | ${b.padTo(widths(1), ' ')} | ${c.padTo(widths(2), ' ')} |"
    (Seq(header, "",
      row("Name", "Type", "Description"),
      row("-" * widths(0), "-" * widths(1), "-" * widths(2))) ++
      rows.map((row _).tupled)).mkString("\n")
  }

  /** EquipmentLoss schema (reference definitions.py:10-88); logical key =
    * the five dimension fields.
    */
  val equipmentLoss: StructType = StructType(Seq(
    field("country", StringType, Seq(Tag.Dimension)),
    field("category", StringType, Seq(Tag.Dimension)),
    field("model", StringType, Seq(Tag.Dimension)),
    field("url_hash", StringType, Seq(Tag.Dimension), "SHA-256 of evidence_url"),
    field("case_id", IntegerType, Seq(Tag.Dimension)),
    field("status", ArrayType(StringType), Seq(Tag.Attribute)),
    field("evidence_url", StringType, Seq(Tag.Attribute, Tag.Media)),
    field("country_of_production", StringType, Seq(Tag.Context, Tag.Equipment)),
    field("country_of_production_flag_url", StringType, Seq(Tag.Context, Tag.Debug, Tag.Equipment)),
    field("evidence_source", StringType, Seq(Tag.Context, Tag.Equipment)),
    field("description", StringType, Seq(Tag.Context, Tag.Debug)),
    field("id_", IntegerType, Seq(Tag.Context, Tag.Debug)),
    field("as_of_date", TimestampType, Seq(Tag.Metadata))))

  /** Media inventory schema (reference definitions.py:91-133); key = url_hash. */
  val media: StructType = StructType(Seq(
    field("url_hash", StringType, Seq(Tag.Dimension, Tag.Inherited)),
    field("url", StringType, Seq(Tag.Attribute, Tag.Inherited)),
    field("evidence_source", StringType, Seq(Tag.Attribute, Tag.Inherited)),
    field("media_key", StringType, Seq(Tag.Attribute)),
    field("file_type", StringType, Seq(Tag.Attribute)),
    field("media_type", StringType, Seq(Tag.Attribute)),
    field("as_of_date", TimestampType, Seq(Tag.Metadata))))
}
