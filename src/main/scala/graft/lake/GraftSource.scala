package graft.lake

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, Row, SQLContext}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** Batch DataSource for lake tables — the `spark.read` twin of the
  * `graft-changes` streaming source:
  *
  * {{{
  * spark.read.format("graft")
  *   .option("path", tableRoot)
  *   .option("versionAsOf", "7")     // optional time travel
  *   .load()
  *   .filter($"repo" === "r1")       // pruned + pushed automatically
  * }}}
  *
  * DSv1 `PrunedFilteredScan`: Spark hands the relation its column projection
  * and pre-translated `sources.Filter`s, which drive the SAME manifest
  * bounding-box file pruning as [[LakeTable.readWhere]] — a point read plans
  * O(1) files with no special API — and the supported filters are re-applied
  * on the inner parquet frame so row-group stats pruning still happens.
  * `unhandledFilters` returns every filter: pruning only SKIPS files, so
  * Spark keeps the residual row-level Filter and results are exact for any
  * predicate shape (fail-open contract).
  *
  * Performance trade: a DSv1 relation surfaces rows through an RDD[Row]
  * boundary (one external-row conversion at the relation edge, and the outer
  * query's codegen starts above it). The inner parquet scan keeps its own
  * whole-stage codegen, columnar reading and row-group pruning, so the scan
  * itself is unchanged — but a hot programmatic path that wants the pure
  * end-to-end codegen plan should call [[LakeTable.readWhere]] directly;
  * this relation exists for the standard `spark.read` / SQL-view UX.
  */
final class GraftSourceProvider extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "graft"

  override def createRelation(
      sqlContext: SQLContext, parameters: Map[String, String]): BaseRelation =
    GraftRelation(
      sqlContext,
      parameters.getOrElse("path", throw new IllegalArgumentException(
        "graft requires option 'path' = lake table root")),
      parameters.get("versionAsOf").map(_.toLong))
}

final case class GraftRelation(
    sqlContext: SQLContext, root: String, versionAsOf: Option[Long])
  extends BaseRelation with PrunedFilteredScan {

  @transient private lazy val table = new LakeTable(sqlContext.sparkSession, root)
  // snapshot resolved once per relation instance: one query plans against
  // one immutable snapshot even if writers commit concurrently
  @transient private lazy val snap: Snapshot =
    versionAsOf.map(table.log.read).getOrElse(table.head())

  override def schema: StructType = snap.schema

  // file pruning only SKIPS files — every filter still needs its residual
  // row-level evaluation above the relation
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] = filters

  override def buildScan(requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    val bounds = KeyPredicates.fromSourceFilters(filters.toSeq, Seq("repo", "path"))
    val base = table.scanLive(snap, table.pruneFiles(snap, bounds).map(_.path))
    val pushed = filters.flatMap(filterToColumn)
      .foldLeft(base)((df, c) => df.filter(c))
    pushed.select(requiredColumns.map(col).toSeq: _*).rdd
  }

  /** Best-effort `sources.Filter` → Column for the inner parquet scan; None
    * for unsupported shapes (Spark's residual filter covers them anyway).
    *
    * Soundness contract: because a pushed predicate can only DROP rows (the
    * residual filter above the relation re-applies the true predicate and can
    * never restore a dropped row), a translation is safe iff it is implied by
    * the original filter — equal or WEAKER, never stronger. Weakening is safe
    * under And (half a conjunction) and under Or (weaker sides yield a weaker
    * disjunction), but NOT under Not: negating a weakened child produces a
    * STRONGER predicate. Under Not we therefore require [[exactColumn]] — an
    * all-or-nothing translation — and give up (None) otherwise.
    */
  private def filterToColumn(f: Filter): Option[Column] = f match {
    case And(l, r) =>
      (filterToColumn(l), filterToColumn(r)) match {
        case (Some(a), Some(b)) => Some(a && b)
        case (one, other) => one.orElse(other) // half a conjunction still filters
      }
    case Or(l, r) =>
      for (a <- filterToColumn(l); b <- filterToColumn(r)) yield a || b
    case Not(c) => exactColumn(c).map(!_)
    case leaf => exactColumn(leaf)
  }

  /** Exact (equivalence-preserving) translation: every connective requires
    * BOTH children translated exactly, so the result can safely be negated.
    */
  private def exactColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toSeq.map(lit): _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case And(l, r) => for (a <- exactColumn(l); b <- exactColumn(r)) yield a && b
    case Or(l, r) => for (a <- exactColumn(l); b <- exactColumn(r)) yield a || b
    case Not(c) => exactColumn(c).map(!_)
    case _ => None
  }
}
