package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame

/** Bridge to `SparkSession.internalCreateDataFrame(_, _, isStreaming = true)`
  * (package-private to `org.apache.spark.sql`): a DSv1 streaming `Source`'s
  * `getBatch` must return a frame whose logical plan carries
  * `isStreaming = true` (MicroBatchExecution asserts it), but the natural way
  * to BUILD that batch is ordinary DataFrame code over committed parquet —
  * scan, pushed filters, column pruning and all. This re-wraps the compiled
  * physical plan of such a frame as a streaming-marked leaf, preserving the
  * batch plan's optimizations. Same seam Delta Lake's DeltaSource uses for
  * its `getBatch`.
  */
object StreamingBridge {
  def asStreamingFrame(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val session = ds.sparkSession
    session.internalCreateDataFrame(ds.queryExecution.toRdd, ds.schema, isStreaming = true)
  }
}
