package graft.lake

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Expression}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** Snapshot-pinned [[FileIndex]] over a lake table's LIVE data files — the
  * seam that plugs the graft table format into Spark's NATIVE file scan.
  *
  * `spark.read.format("graft")` returns a `HadoopFsRelation` carrying this
  * index, so the physical plan is a plain `FileSourceScan` over Parquet:
  * vectorized columnar reading, whole-stage codegen above it, filter pushdown
  * to row groups, and column pruning — with ZERO row-conversion boundary
  * (this is the architecture Delta Lake uses for its batch relation; a
  * hand-rolled DSv2 `PartitionReader` would re-introduce row-at-a-time reads
  * unless it reimplemented the vectorized Parquet reader wholesale).
  *
  * [[listFiles]] receives the query's pushed data filters at PLANNING time
  * and applies the same manifest bounding-box pruning as
  * [[LakeTable.readWhere]] — a point read through the standard
  * `spark.read` / SQL surface plans O(1) files with no special API.
  * Tombstone files are never listed: live reads read zero tombstone bytes
  * (tombstones live in separate files — see [[LakeTable]]).
  */
final class GraftFileIndex(
    spark: SparkSession, table: LakeTable, val snapshot: Snapshot,
    headerOnly: Boolean = false)
  extends FileIndex {

  def tableRoot: String = table.root

  /** With `headerOnly = true`, `snapshot` is a files-UNLOADED header carrying
    * manifest summaries: filtered [[listFiles]] calls parse only the
    * manifests whose key bounding box overlaps the pushed bounds (two-level
    * metadata pruning), and this lazy full load is forced only by unfiltered
    * scans / [[inputFiles]]. Header indexes are built only for DELTA-FREE
    * snapshots (the provider routes pending deltas to the resolved relation).
    */
  private lazy val live: Seq[DataFileEntry] =
    (if (headerOnly) table.log.loadManifests(snapshot.manifestSummaries.map(_.name))
     else snapshot.files).filterNot(_.tomb)

  private def prunable: (Seq[String], Seq[String]) =
    if (headerOnly) table.typedPrunableFrom(snapshot.schema,
      snapshot.manifestSummaries.iterator.flatMap(_.stattedStr).toSet,
      snapshot.manifestSummaries.iterator.flatMap(_.stattedLong).toSet)
    else table.typedPrunable(snapshot)

  /** Deliberately empty: Spark's analyzer turns `INSERT INTO` over a
    * `HadoopFsRelation` into a DIRECT file write at `rootPaths.head`, which
    * would drop Parquet files into the table unrecorded by any snapshot —
    * silent corruption. With no root paths that fallback fails loudly at
    * analysis; the supported INSERT path is the resolution rule installed by
    * `graft.lake.GraftSparkExtension`, which routes through the committing
    * write path ([[LakeTable.append]]).
    */
  override def rootPaths: Seq[Path] = Seq.empty

  override def partitionSchema: StructType = StructType(Nil)

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept = dataFilters.reduceOption(And) match {
      case Some(pred) =>
        val (strCols, longCols) = prunable
        val bounds = KeyPredicates.extractTyped(pred, strCols, longCols)
        // manifest level first (header indexes: skip whole manifests by key
        // box before parsing any), then file bounds, then the bloom probe
        // layer (same layers as readWhere; this index only ever serves
        // DELTA-FREE snapshots — the provider falls back to the resolved
        // relation otherwise — so non-key stat pruning is sound here)
        val candidates =
          if (headerOnly) table.log.loadManifests(
            snapshot.manifestSummaries.filter(_.overlapsKeys(bounds)).map(_.name))
          else snapshot.files
        val afterBounds = table.pruneEntries(candidates, bounds).filterNot(_.tomb)
        table.bloomPruneFiles(snapshot, pred, afterBounds, strCols, longCols)
      case None => live
    }
    if (kept.isEmpty) Seq.empty
    else Seq(PartitionDirectory(InternalRow.empty, kept.map(status).toArray))
  }

  /** Manifests record each file's length, so planning synthesizes the
    * `FileStatus` without a per-file FS round trip (at 10^5 files that is
    * the difference between an in-memory plan and 10^5 object-store HEADs).
    * A legacy entry without a recorded length falls back to a real lookup —
    * a zero-length status would make split planning emit no read task and
    * silently drop the file's rows.
    */
  private def status(e: DataFileEntry): FileStatus = {
    val p = new Path(e.path)
    if (e.bytes > 0) new FileStatus(e.bytes, false, 1, 128L * 1024 * 1024, 0L, p)
    else p.getFileSystem(spark.sparkContext.hadoopConfiguration).getFileStatus(p)
  }

  override def inputFiles: Array[String] = live.map(_.path).toArray

  /** Snapshot-pinned: one query plans against one immutable version even if
    * writers commit concurrently, so there is nothing to refresh.
    */
  override def refresh(): Unit = ()

  /** Drives broadcast decisions; unknown legacy lengths fall back to a
    * row-count heuristic that deliberately over-estimates (a missed
    * broadcast is slow, a wrong broadcast of a huge table is an OOM).
    * Header indexes answer from the commit's audit aggregate (stored at
    * commit time; includes tombstone bytes — an over-estimate, safe) so
    * estimation does not force the full manifest load; a pre-audit-header
    * snapshot (bytes < 0) falls back to forcing it.
    */
  override lazy val sizeInBytes: Long =
    if (headerOnly) {
      val b = table.log.describe(snapshot.version).bytes
      // trust only a POSITIVE aggregate: 0 can mean "legacy entries with no
      // recorded bytes summed to nothing", and under-estimating here turns
      // into a broadcast of a possibly huge table (OOM) — fall back to the
      // per-file heuristic, which over-estimates by design
      if (b > 0) b else live.map(e => if (e.bytes > 0) e.bytes else e.rows * 1024L).sum
    } else live.map(e => if (e.bytes > 0) e.bytes else e.rows * 1024L).sum
}
