package graft.domain

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.meta.Schemas

/** Dataset publishing (Borderlands src/flows/publish.py:78-98, 125-145):
  * tag-filtered projection staged as row-oriented JSON.
  *
  * Spark-first: `df.write.json` emits one JSON object per row (the
  * distributed analog of polars' row_oriented=true single file), sharded per
  * partition so a 100 TB export never funnels through one writer. The tag
  * filter runs through Schemas.selectByTags, i.e. a plain `select`, so column
  * pruning reaches the source scan.
  */
object Publish {

  /** stage_dataset_as_json: tag-filter `df` against `schema` and write JSON
    * records under `path` (overwrite = idempotent re-stage).
    */
  def stageDatasetAsJson(
      df: DataFrame, schema: StructType, path: String,
      include: Set[String] = Set.empty, exclude: Set[String] = Set.empty): Unit =
    Schemas.selectByTags(df, schema, include, exclude)
      .write.mode("overwrite").json(path)

  /** Read a staged export back under an explicit schema (no inference pass). */
  def readStaged(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
