package graft.lake

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.JsonDSL._

/** One committed version of a lake table.
  *
  * @param version        monotonically increasing snapshot id
  * @param schema         user-visible schema (storage adds `_lsn`,`_deleted`)
  * @param addedAtLsn     column name -> lsn of the schema_change that added it
  *                       (absent for base columns); gates extra-payload parsing
  *                       so replay is invariant to batch splits
  * @param files          data files owned by this snapshot
  * @param appliedBatches idempotence ledger: (runEpoch, batchId) already merged;
  *                       replaying one is a no-op (exactly-once under retry)
  */
final case class Snapshot(
    version: Long,
    schema: StructType,
    addedAtLsn: Map[String, Long],
    files: Seq[DataFileEntry],
    appliedBatches: Set[(String, Long)],
    parent: Long)

/** Manifest entry with per-file key-range stats for file pruning. */
final case class DataFileEntry(path: String, rows: Long, minRepo: String, maxRepo: String)

/** From-scratch Iceberg-style snapshot log over any Hadoop FileSystem.
  *
  * Layout: `<root>/meta/v{N}.json`; commit point = atomic create-no-overwrite
  * rename of a temp file to `v{N+1}.json` (two writers racing on the same
  * version: exactly one rename succeeds). Readers list `meta/` and take the
  * max version — no mutable HEAD pointer, so no non-atomic overwrite anywhere.
  * Generalizes the reference's fixed "latest release" pointer
  * (Borderlands src/borderlands/paths.py:16-18) into a versioned, idempotent
  * commit protocol (SURVEY.md §7.2).
  */
final class SnapshotLog(spark: SparkSession, root: String) {
  private val metaDir = new Path(root, "meta")
  private def fs: FileSystem = metaDir.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def dataDir: String = new Path(root, "data").toString

  def latestVersion(): Option[Long] = {
    if (!fs.exists(metaDir)) return None
    val vs = fs.listStatus(metaDir).map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong }
    if (vs.isEmpty) None else Some(vs.max)
  }

  def head(): Option[Snapshot] = latestVersion().map(read)

  def read(version: Long): Snapshot = {
    val p = new Path(metaDir, s"v$version.json")
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    parseSnapshot(txt)
  }

  /** Atomically publish `snap` as v{snap.version}. Throws if that version
    * already exists (single-writer assumed; a retried driver re-reads HEAD
    * and finds its batch in the ledger instead).
    */
  def commit(snap: Snapshot): Unit = {
    fs.mkdirs(metaDir)
    val tmp = new Path(metaDir, s".tmp-v${snap.version}-${java.util.UUID.randomUUID}.json")
    val out = fs.create(tmp, false)
    try out.write(renderSnapshot(snap).getBytes("UTF-8")) finally out.close()
    val dest = new Path(metaDir, s"v${snap.version}.json")
    if (!fs.rename(tmp, dest)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(
        s"commit conflict: ${dest} already exists (concurrent writer?)")
    }
  }

  private def renderSnapshot(s: Snapshot): String = {
    val json: JObject =
      ("version" -> s.version) ~
      ("parent" -> s.parent) ~
      ("schema" -> JsonMethods.parse(s.schema.json)) ~
      ("addedAtLsn" -> s.addedAtLsn) ~
      ("appliedBatches" -> s.appliedBatches.toSeq.sorted.map { case (e, b) =>
        ("epoch" -> e) ~ ("batchId" -> b) }) ~
      ("files" -> s.files.map { f =>
        ("path" -> f.path) ~ ("rows" -> f.rows) ~
        ("minRepo" -> f.minRepo) ~ ("maxRepo" -> f.maxRepo) })
    JsonMethods.pretty(JsonMethods.render(json))
  }

  private def parseSnapshot(txt: String): Snapshot = {
    implicit val fmt: Formats = DefaultFormats
    val j = JsonMethods.parse(txt)
    Snapshot(
      version = (j \ "version").extract[Long],
      schema = DataType.fromJson(JsonMethods.compact(JsonMethods.render(j \ "schema")))
        .asInstanceOf[StructType],
      addedAtLsn = (j \ "addedAtLsn").extract[Map[String, Long]],
      files = (j \ "files").extract[Seq[JObject]].map { f =>
        DataFileEntry((f \ "path").extract[String], (f \ "rows").extract[Long],
          (f \ "minRepo").extract[String], (f \ "maxRepo").extract[String]) },
      appliedBatches = (j \ "appliedBatches").extract[Seq[JObject]]
        .map(b => ((b \ "epoch").extract[String], (b \ "batchId").extract[Long])).toSet,
      parent = (j \ "parent").extract[Long])
  }
}
