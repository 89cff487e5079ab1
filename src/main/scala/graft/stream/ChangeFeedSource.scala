package graft.stream

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graftbridge.StreamingBridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType
import graft.lake.LakeTable

/** Offset of the change-feed stream = committed snapshot version. */
final case class VersionOffset(version: Long) extends OffsetV1 {
  override def json: String = version.toString
}

/** Structured-Streaming SOURCE over a lake table's snapshot log — stream the
  * committed change feed into any `writeStream` sink:
  *
  * {{{
  * spark.readStream.format("graft-changes")
  *   .option("path", tableRoot)
  *   .option("startingVersion", "earliest")   // | "latest" (default) | <N>
  *   .load()
  * }}}
  *
  * Rows are [[LakeTable.changeFeedSchema]]-shaped (user columns + `_lsn`,
  * `_deleted`, `_ver`); each micro-batch is `LakeTable.changesBetween(from, to)` for
  * one snapshot-version window — the NET change per key, deletes as tombstone
  * rows. Generalizes the reference's daily "read the latest release and diff
  * it downstream" consumption (Borderlands src/flows/media.py:57-83) into a
  * checkpointed push feed (the batch analog is `changesBetween`, SURVEY §2.9).
  *
  * Exactly-once: offsets are snapshot versions stored in the stream's
  * checkpoint; on restart Spark replays the last uncommitted window
  * `(from, to]` and `changesBetween` is a deterministic function of the two
  * immutable snapshots, so re-delivery is byte-identical (and a committed
  * window is never re-read).
  *
  * Scale shape: a micro-batch reads ONLY data files added in its version
  * window (manifest diff, no data scan to plan) with the `_ver > fromVersion`
  * commit-version predicate pushed to parquet; planning is O(manifest
  * entries), independent of table size. Retention contract: a stream may resume only while its
  * last committed version still exists — run `expireSnapshots(keepLast)`
  * with `keepLast` covering the slowest consumer's lag, and expire tombstones
  * (`compact(tombstoneWatermark)`) only past every consumer's resume horizon
  * (same contract as Iceberg's changelog expiry).
  *
  * `maxVersionsPerTrigger` (default unbounded) caps how many snapshot
  * versions one micro-batch covers, bounding batch size during backlog
  * catch-up.
  */
final class ChangeFeedSource(
    spark: SparkSession,
    root: String,
    metadataPath: String,
    startingVersion: String,
    maxVersionsPerTrigger: Long) extends Source with SupportsTriggerAvailableNow {

  private val table = new LakeTable(spark, root)

  // Resolve the start version ONCE PER STREAM, not per source instance:
  // "latest" resolved again on restart could pass the checkpointed first
  // window's end (from > to). The resolved value is persisted under the
  // stream's own metadata dir (the same pattern FileStreamSource/KafkaSource
  // use for their initial offsets). The marker is written tmp-file + rename
  // (the HDFSMetadataLog pattern) and an empty/unparseable marker — a crash
  // between create and close under a non-atomic writer, or a torn partial
  // write — is treated as ABSENT and re-resolved + rewritten, never thrown
  // on: the old create-then-write path could leave a 0-byte marker that
  // NumberFormatException'd every restart until manual checkpoint surgery.
  private val startVersion: Long = {
    val fs = new org.apache.hadoop.fs.Path(metadataPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(metadataPath, "startVersion")
    def readMarker(): Option[Long] =
      if (!fs.exists(marker)) None
      else {
        val in = fs.open(marker)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
        txt.toLongOption // empty/partial ⇒ None ⇒ re-resolve below
      }
    readMarker().getOrElse {
      val v = startingVersion match {
        case "latest" => table.head().version
        // earliest RETAINED version (Delta's "earliest" semantics): a feed
        // from a table whose v0 was expired starts at the retention floor —
        // delivering changes after that snapshot — instead of failing the
        // first getBatch with the retention error
        case "earliest" => table.log.earliestVersion().getOrElse(0L)
        case s => s.toLong
      }
      fs.mkdirs(new org.apache.hadoop.fs.Path(metadataPath))
      val tmp = new org.apache.hadoop.fs.Path(metadataPath,
        s".startVersion.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
      val out = fs.create(tmp, true)
      try out.write(v.toString.getBytes("UTF-8")) finally out.close()
      // a torn marker blocks rename (HDFS/local rename won't overwrite).
      // RE-READ before clearing: a concurrent resolver may have replaced the
      // torn marker with a VALID one since our first read — deleting that
      // would let two resolvers disagree; adopt the winner's value instead.
      readMarker() match {
        case Some(winner) =>
          fs.delete(tmp, false)
          winner
        case None =>
          if (fs.exists(marker)) fs.delete(marker, false) // still torn: clear
          if (!fs.rename(tmp, marker)) {
            // lost the rename race: adopt whatever the winner persisted
            fs.delete(tmp, false)
            readMarker().getOrElse(throw new IllegalStateException(
              s"could not persist or read startVersion marker at $marker"))
          } else v
      }
    }
  }

  private val fixedSchema: StructType = table.changeFeedSchema()

  override def schema: StructType = fixedSchema

  // ---- admission control (SupportsAdmissionControl / TriggerAvailableNow).
  // The engine hands latestOffset the PREVIOUS end offset as the floor, so
  // rate limiting is stateless; under Trigger.AvailableNow the target is
  // frozen at prepare time (the run drains exactly what was committed then,
  // even if writers keep committing).
  @volatile private var availableTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableTarget = Some(table.log.latestVersion().getOrElse(startVersion))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  private def versionOf(o: OffsetV2): Long = o.json.trim.toLong

  override def initialOffset(): OffsetV2 = VersionOffset(startVersion)

  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val floor = Option(startOffset).map(versionOf).getOrElse(startVersion)
    val head = availableTarget.getOrElse(
      table.log.latestVersion().getOrElse(startVersion))
    val capped =
      if (maxVersionsPerTrigger <= 0) head
      else math.min(head, floor + maxVersionsPerTrigger)
    VersionOffset(math.max(floor, capped))
  }

  // The engine always routes admission-control sources through latestOffset;
  // a silent getOffset fallback here would bypass maxVersionsPerTrigger and
  // the frozen AvailableNow target, so fail loudly instead (FileStreamSource
  // declares the same contract).
  override def getOffset: Option[OffsetV1] =
    throw new UnsupportedOperationException(
      "getOffset is not supported: graft-changes implements SupportsAdmissionControl (latestOffset)")

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val fromV = start.map(o => versionOf(o)).getOrElse(startVersion)
    val toV = versionOf(end)
    val net = table.changesBetween(fromV, toV)
    // align to the stream's fixed schema: columns added by schema evolution
    // after stream start are dropped, and columns RENAMED or DROPPED
    // mid-stream null-fill under their pinned old name (the stream keeps
    // running; a restart picks up the evolved schema — same restart contract
    // as column adds)
    val have = net.columns.toSet
    val aligned = net.select(fixedSchema.fields.toSeq.map { f =>
      if (have.contains(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
    StreamingBridge.asStreamingFrame(aligned)
  }

  override def commit(end: OffsetV2): Unit = ()

  override def stop(): Unit = ()
}

/** DSv1 streaming provider for `format("graft-changes")` (registered via
  * META-INF/services). DSv1 over DSv2 is deliberate: its `getBatch` returns a
  * DataFrame, so each window IS the `changesBetween` plan — parquet scan,
  * pushed `_ver` predicate, pruned columns — instead of a hand-rolled
  * per-file reader (the same trade Delta Lake's streaming source makes).
  */
final class ChangeFeedSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-changes"

  private def tableRoot(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-changes requires option 'path' = lake table root"))

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val t = new LakeTable(sqlContext.sparkSession, tableRoot(parameters))
    (shortName(), t.changeFeedSchema())
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new ChangeFeedSource(
      sqlContext.sparkSession,
      tableRoot(parameters),
      metadataPath,
      parameters.getOrElse("startingVersion", "latest"),
      parameters.get("maxVersionsPerTrigger").map(_.toLong).getOrElse(0L))
}
