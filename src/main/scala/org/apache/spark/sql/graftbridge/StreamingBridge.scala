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

  /** The inverse direction, for a DSv1 streaming `Sink`: the frame handed to
    * `addBatch` is bound to that micro-batch's incremental execution; this
    * re-wraps its compiled plan as a plain BATCH frame so sink code can run
    * ordinary multi-action DataFrame logic over it (Delta's sink uses the
    * same seam).
    */
  def asBatchFrame(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val session = ds.sparkSession
    session.internalCreateDataFrame(ds.queryExecution.toRdd, ds.schema, isStreaming = false)
  }
}
