package graft.domain

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import org.json4s._
import org.json4s.jackson.JsonMethods

/** File-based enrichment-asset loaders (Borderlands src/borderlands/assets.py).
  *
  * Scale stance: enrichment maps and correction dims live in FILES, not in
  * code literals — they exceed literal size and change without redeploys. A
  * small JSON dict asset becomes a broadcast literal map (map-side lookup,
  * zero shuffle); a CSV dim becomes a DataFrame read with an EXPLICIT schema
  * (never inferSchema — inference is a full extra pass over the asset at
  * every load) that callers broadcast-join against the fact side.
  */
object Assets {

  /** get_country_of_production_url_mapper (assets.py:33-51): a JSON asset
    * shaped `{url: {"Alpha-3": code}}`, loaded whole and flattened to
    * url -> code. The asset is small by contract (a dict someone maintains);
    * it is read driver-side once and shipped as a broadcast/literal map.
    */
  def loadUrlMapper(spark: SparkSession, path: String): Map[String, String] = {
    val txt = spark.read.option("wholetext", "true").text(path)
      .head().getString(0)
    JsonMethods.parse(txt) match {
      case JObject(fields) => fields.collect {
        case (url, lookup) => (lookup \ "Alpha-3") match {
          case JString(code) => url -> code
          case other => throw new IllegalArgumentException(
            s"mapper entry for $url lacks Alpha-3: $other")
        }
      }.toMap
      case other => throw new IllegalArgumentException(s"mapper asset is not an object: $other")
    }
  }

  /** Map-side lookup column over a loaded mapper (J3/F7 shape). */
  def mapperLookup(mapper: Map[String, String], key: Column): Column =
    OryxOps.mapDict(key, mapper)

  /** get_category_corrections (assets.py:54-64): header CSV dim with an
    * explicit schema. Returned as a plain DataFrame — callers broadcast it
    * into their joins (the dim is small; the fact side never shuffles).
    */
  def loadCsvDim(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)
}
