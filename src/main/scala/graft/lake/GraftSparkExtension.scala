package graft.lake

import org.apache.spark.sql.{Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.plans.logical.{InsertIntoStatement, LogicalPlan}
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
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case InsertIntoStatement(
        lr @ LogicalRelation(h: HadoopFsRelation, _, _, _, _),
        partitionSpec, userCols, query, overwrite, _, byName)
        if h.location.isInstanceOf[GraftFileIndex] && query.resolved =>
      require(partitionSpec.isEmpty,
        "graft tables take no PARTITION spec (layout is key-range clustering)")
      GraftInsertCommand(
        h.location.asInstanceOf[GraftFileIndex].tableRoot,
        query, overwrite, lr.output.map(_.name), userCols, byName)
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
