package graft.lake

import org.apache.spark.sql.{Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, InsertIntoStatement, LogicalPlan, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.graftbridge.PlanBridge

/** Session extension wiring SQL DML onto graft tables
  * (`spark.sql.extensions=graft.lake.GraftSparkExtension`):
  *
  * {{{
  * CREATE TEMPORARY VIEW t USING graft OPTIONS (path '<root>');
  * INSERT INTO t VALUES ('r1', 'a', 'c1', 'scala', 'body');
  * INSERT OVERWRITE t SELECT ...;
  * DELETE FROM t WHERE repo = 'r1';          -- tombstone events
  * UPDATE t SET lang = 'scala' WHERE ...;    -- read-project-upsert
  * }}}
  *
  * Why a rule is REQUIRED and not a nicety: Spark's own v1 fallback turns
  * `INSERT INTO` over a `HadoopFsRelation` into a direct file write at the
  * relation's root path — Parquet files dropped into the table that no
  * snapshot records, i.e. silent corruption. This resolution rule runs
  * before that fallback and routes the insert through the committing write
  * path ([[LakeTable.append]] / [[LakeTable.overwrite]]); sessions WITHOUT
  * the extension fail loudly instead ([[GraftFileIndex.rootPaths]] is
  * empty, so the fallback has no target to resolve). Same arrangement as
  * Delta's `DeltaSparkSessionExtension` + `DeltaAnalysis`.
  */
final class GraftSparkExtension extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectResolutionRule(session => new GraftInsertRule(session))
}

final class GraftInsertRule(spark: SparkSession) extends Rule[LogicalPlan] {
  private object GraftRel {
    /** The DML target may sit under the view's SubqueryAlias; aliases
      * preserve attribute ids, so conditions resolved against the aliased
      * output still bind against the bare relation.
      */
    def unapply(p: LogicalPlan): Option[(LogicalRelation, String)] = p match {
      case org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias(_, child) =>
        unapply(child)
      case v: org.apache.spark.sql.catalyst.plans.logical.View => unapply(v.child)
      case lr @ LogicalRelation(h: HadoopFsRelation, _, _, _, _)
          if h.location.isInstanceOf[GraftFileIndex] =>
        Some((lr, h.location.asInstanceOf[GraftFileIndex].tableRoot))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case InsertIntoStatement(GraftRel(lr, root),
        partitionSpec, userCols, query, overwrite, _, byName)
        if query.resolved =>
      require(partitionSpec.isEmpty,
        "graft tables take no PARTITION spec (layout is key-range clustering)")
      GraftInsertCommand(root, query, overwrite, lr.output.map(_.name), userCols, byName)

    // DELETE FROM t WHERE … → tombstone events for the matching keys.
    // Expressions are UNBOUND (attribute refs → names) so the command can
    // re-resolve them against the table's CURRENT head at run time — a DML
    // statement must target current state, not the snapshot the view was
    // created against.
    case DeleteFromTable(GraftRel(_, root), cond) if cond.resolved =>
      GraftDeleteCommand(root, GraftDml.unbind(cond))

    // UPDATE t SET … WHERE … → read matching rows, apply assignments, upsert
    case UpdateTable(GraftRel(_, root), assignments, cond)
        if assignments.forall(a => a.key.resolved && a.value.resolved) &&
          cond.forall(_.resolved) =>
      val byName: Seq[(String, GraftDml.Unbound)] =
        assignments.map { a =>
          a.key match {
            case ar: AttributeReference => ar.name -> GraftDml.unbind(a.value)
            case other => throw new UnsupportedOperationException(
              s"UPDATE assignment target must be a column, got $other")
          }
        }
      require(!byName.exists(kv => kv._1 == "repo" || kv._1 == "path"),
        "cannot UPDATE a key column (repo, path) — DELETE then INSERT instead")
      GraftUpdateCommand(root, byName, cond.map(GraftDml.unbind))
  }
}

/** The committing half of an `INSERT INTO` graft table: executes the query,
  * maps its columns onto the table schema (positionally, via the statement's
  * column list, or by name), and upserts through the merge path.
  */
final case class GraftInsertCommand(
    root: String, query: LogicalPlan, overwrite: Boolean,
    tableCols: Seq[String], userCols: Seq[String], byName: Boolean)
  extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val df0 = PlanBridge.ofRows(spark, query)
    val df =
      if (byName) df0
      else if (userCols.nonEmpty) {
        require(df0.columns.length == userCols.length,
          s"INSERT column list has ${userCols.length} columns, query produced ${df0.columns.length}")
        df0.toDF(userCols: _*)
      } else {
        require(df0.columns.length == tableCols.length,
          s"table has ${tableCols.length} columns, query produced ${df0.columns.length} " +
            "(use an INSERT column list for partial inserts)")
        df0.toDF(tableCols: _*)
      }
    val table = new LakeTable(spark, root)
    // single-shot SQL writes skip the ledger (see LakeTable.merge docs)
    if (overwrite) table.overwrite(df, "adhoc", 0L, recordInLedger = false)
    else table.append(df, "adhoc", 0L, recordInLedger = false)
    Seq.empty
  }
}

private[lake] object GraftDml {
  import org.apache.spark.sql.catalyst.expressions.Expression

  /** A deliberately-unresolved expression hidden from `QueryPlan
    * .expressions` traversal: the command re-resolves it BY NAME against
    * the table's current head at run time, and CheckAnalysis must not
    * reject the plan for carrying it.
    */
  final class Unbound(val e: Expression) extends Serializable {
    override def toString: String = e.sql
  }

  /** Detach a resolved expression from the view's attribute ids so it can
    * re-resolve by NAME against the table's current head in the command.
    */
  def unbind(e: Expression): Unbound = new Unbound(e.transform {
    case a: AttributeReference =>
      org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute.quoted(a.name)
  })

  def asColumn(u: Unbound): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(u.e)
}

/** `DELETE FROM <graft view> WHERE …`: the matching keys become tombstone
  * events through the merge path ([[LakeTable.delete]]) — one committed
  * snapshot, visible to the change feed as ordinary deletes. Matching rows
  * are read via [[LakeTable.readWhere]] at RUN time (current head, with
  * manifest file pruning from the predicate).
  */
final case class GraftDeleteCommand(root: String, cond: GraftDml.Unbound)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val table = new LakeTable(spark, root)
    val keys = table.readWhere(GraftDml.asColumn(cond))
      .select(org.apache.spark.sql.functions.col("repo"),
        org.apache.spark.sql.functions.col("path"))
    table.delete(keys, "adhoc", 0L, recordInLedger = false)
    Seq.empty
  }
}

/** `UPDATE <graft view> SET … WHERE …`: the assignment-projected matching
  * rows (read at RUN time from the current head) upsert back through the
  * merge path — at the next LSN, so they win over their previous versions
  * by ordinary last-LSN-wins semantics.
  */
final case class GraftUpdateCommand(
    root: String,
    assignments: Seq[(String, GraftDml.Unbound)],
    cond: Option[GraftDml.Unbound])
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.col
    val table = new LakeTable(spark, root)
    val matching = cond.map(c => table.readWhere(GraftDml.asColumn(c)))
      .getOrElse(table.read())
    val assigned = assignments.toMap
    val updated = matching.select(matching.columns.toSeq.map { c =>
      assigned.get(c).map(e => GraftDml.asColumn(e).as(c)).getOrElse(col(c))
    }: _*)
    table.append(updated, "adhoc", 0L, recordInLedger = false)
    Seq.empty
  }
}
