package graft.lake

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.kernel.{ChangeOps, Salting}

/** Per-merge lineage counts (SURVEY.md §7.6). */
final case class MergeStats(
    epoch: String,
    batchId: Long,
    version: Long,
    eventsSeen: Long,
    duplicatesDropped: Long,
    upserts: Long,
    deletes: Long,
    schemaChanges: Long,
    noOp: Boolean)

/** Copy-on-write lake table with Iceberg-style semantics, from scratch over
  * Parquet + [[SnapshotLog]] (SURVEY.md §7.2-7.3). Key is fixed to
  * `(repo, path)` per the north rule; rows carry engine columns `_lsn`
  * (last applied change) and `_deleted` (tombstone).
  *
  * Tombstones are retained, not dropped: a duplicate delivery of an OLD
  * update arriving after a newer delete must lose, which requires the delete
  * LSN to still be visible to the merge window. Compaction may expire
  * tombstones older than the max accepted lateness (not needed in-sandbox).
  *
  * MERGE semantics = last-LSN-wins upsert:
  *  - WHEN MATCHED AND src._lsn > tgt._lsn → replace row (or tombstone it)
  *  - WHEN NOT MATCHED → insert
  * expressed as one window over the union of the deduped batch and the
  * touched target files — no SQL MERGE needed, every step is a Catalyst plan.
  */
final class LakeTable(spark: SparkSession, val root: String) {
  import LakeTable._

  val log = new SnapshotLog(spark, root)
  private val keyCols = Seq("repo", "path")

  def create(baseSchema: StructType): Unit = {
    if (log.latestVersion().isEmpty)
      log.commit(Snapshot(0L, baseSchema, Map.empty, Seq.empty, Set.empty, -1L))
  }

  def head(): Snapshot = log.head().getOrElse(
    throw new IllegalStateException(s"no snapshot at $root — call create() first"))

  private def storageSchema(s: Snapshot): StructType =
    StructType(s.schema.fields.toSeq :+
      StructField("_lsn", LongType, nullable = false) :+
      StructField("_deleted", BooleanType, nullable = false))

  /** Read stored rows of the given files under the given snapshot's schema;
    * files written before a schema evolution lack the added columns and the
    * Parquet reader null-fills them (union-by-name evolution, SURVEY §2.7 U2).
    */
  private def readStored(snap: Snapshot, files: Seq[String]): DataFrame = {
    val st = storageSchema(snap)
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], st)
    else spark.read.schema(st).parquet(files: _*)
  }

  /** User-visible table state: live rows only, engine columns hidden. */
  def read(): DataFrame = {
    val snap = head()
    readStored(snap, snap.files.map(_.path))
      .filter(!col("_deleted"))
      .select(snap.schema.fieldNames.map(col).toSeq: _*)
  }

  /** Stored state incl. tombstones and `_lsn` — for tests and compaction. */
  def readRaw(): DataFrame = {
    val snap = head()
    readStored(snap, snap.files.map(_.path))
  }

  /** Apply one micro-batch of change events (EventLog.eventSchema shape).
    * Idempotent per (epoch, batchId): a replayed batch is a no-op.
    */
  def merge(batch: DataFrame, epoch: String, batchId: Long, saltBuckets: Int = 1): MergeStats = {
    val snap = head()
    if (snap.appliedBatches.contains((epoch, batchId))) {
      return MergeStats(epoch, batchId, snap.version, 0, 0, 0, 0, 0, noOp = true)
    }

    // ---- schema-change events: evolve schema, record add-LSN gates ----
    val scRows = batch.filter(col("op") === "schema_change")
      .select("lsn", "schema_change").collect().sortBy(_.getLong(0))
    var schema = snap.schema
    var addedAt = snap.addedAtLsn
    var scApplied = 0L
    for (r <- scRows; if !r.isNullAt(1)) {
      implicit val fmt: Formats = DefaultFormats
      val j = JsonMethods.parse(r.getString(1)) \ "addColumn"
      val name = (j \ "name").extract[String]
      if (!schema.fieldNames.contains(name)) {
        val dt = parseTypeName((j \ "type").extract[String])
        schema = StructType(schema.fields.toSeq :+ StructField(name, dt, nullable = true))
        addedAt += (name -> r.getLong(0))
        scApplied += 1
      }
    }
    val evolved = snap.copy(schema = schema, addedAtLsn = addedAt)

    // ---- dedup data events: max-(lsn, event_id)-wins, salted for hot keys ----
    val obs = Observation(s"graft-merge-$epoch-$batchId")
    val data = batch.filter(col("op") =!= "schema_change")
      .observe(obs, count(lit(1)).as("n"))
    val deduped = Salting.dedupSalted(data, keyCols, Seq(col("lsn"), col("event_id")), saltBuckets)
      .persist()
    try {
      // ---- project winners to storage rows (extra gated by column add-LSN) ----
      val srcCols = evolved.schema.fields.toSeq.map { f =>
        if (keyCols.contains(f.name)) col(f.name)
        else addedAt.get(f.name) match {
          case Some(atLsn) =>
            when(col("lsn") > lit(atLsn) && col("op") =!= "delete",
              get_json_object(col("extra"), s"$$.${f.name}").cast(f.dataType)).as(f.name)
          case None =>
            when(col("op") === "delete", lit(null).cast(f.dataType))
              .otherwise(col(f.name).cast(f.dataType)).as(f.name)
        }
      }
      val src = deduped.select(srcCols ++ Seq(
        col("lsn").as("_lsn"),
        (col("op") === "delete").as("_deleted"),
        col("event_id").as("__tie"),
        lit(false).as("__isTarget")): _*)

      // ---- file pruning: touch only files whose repo range meets batch keys ----
      val touched: Set[String] =
        if (snap.files.isEmpty) Set.empty
        else {
          import spark.implicits._
          val manifest = snap.files.map(f => (f.path, f.minRepo, f.maxRepo))
            .toDF("__file", "__minRepo", "__maxRepo")
          deduped.select(col("repo")).distinct()
            .join(broadcast(manifest),
              col("repo") >= col("__minRepo") && col("repo") <= col("__maxRepo"))
            .select("__file").distinct().collect().map(_.getString(0)).toSet
        }

      val target = readStored(evolved, touched.toSeq)
        .withColumn("__tie", lit(Long.MaxValue)) // target wins LSN ties: re-applied dup is a no-op
        .withColumn("__isTarget", lit(true))

      // ---- the MERGE window: one row per key survives ----
      val merged = ChangeOps.dedupLastWins(
        target.unionByName(src), keyCols, Seq(col("_lsn"), col("__tie")))

      val out = merged.drop("__tie", "__isTarget")

      // ---- write new data files (range-clustered by key for tight pruning) ----
      val newDir = s"${log.dataDir}/v${snap.version + 1}-b$batchId"
      out.repartitionByRange(col("repo"), col("path"))
        .sortWithinPartitions("repo", "path")
        .write.mode("overwrite").option("compression", "zstd").parquet(newDir)

      val newFiles = spark.read.parquet(newDir)
        .groupBy(input_file_name().as("__f"))
        .agg(count(lit(1)).as("rows"), min("repo").as("minRepo"), max("repo").as("maxRepo"))
        .collect()
        .map(r => DataFileEntry(r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
        .toSeq

      val dd = deduped.agg(count(lit(1)), sum(when(col("op") === "delete", 1L).otherwise(0L))).collect()(0)
      val dedupedCnt = dd.getLong(0)
      val delWinners = if (dd.isNullAt(1)) 0L else dd.getLong(1)
      val eventsSeen = obs.get("n").asInstanceOf[Long]

      val next = Snapshot(
        version = snap.version + 1,
        schema = schema,
        addedAtLsn = addedAt,
        files = snap.files.filterNot(f => touched.contains(f.path)) ++ newFiles,
        appliedBatches = snap.appliedBatches + ((epoch, batchId)),
        parent = snap.version)
      log.commit(next)

      MergeStats(epoch, batchId, next.version,
        eventsSeen = eventsSeen + scRows.length,
        duplicatesDropped = eventsSeen - dedupedCnt,
        upserts = dedupedCnt - delWinners,
        deletes = delWinners,
        schemaChanges = scApplied,
        noOp = false)
    } finally deduped.unpersist()
  }
}

object LakeTable {
  /** North-rule base schema (BASELINE.json input_hint). */
  val baseSchema: StructType = StructType(Seq(
    StructField("repo", StringType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("commit", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("content", StringType, nullable = true)))

  def parseTypeName(t: String): DataType = t.toLowerCase match {
    case "string"  => StringType
    case "long" | "bigint" => LongType
    case "int" | "integer" => IntegerType
    case "double"  => DoubleType
    case "boolean" => BooleanType
    case "timestamp" => TimestampType
    case other => throw new IllegalArgumentException(s"unsupported evolved type: $other")
  }
}
