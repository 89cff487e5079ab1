package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native vector kernels for the similarity/ANN family, as codegen'd Catalyst
  * expressions. The HOF formulation — `aggregate(zip_with(a, b, _*_), 0.0,
  * _+_)` — allocates an intermediate array per row pair and runs interpreted
  * lambda calls per element; these emit one static call inside whole-stage
  * codegen. Semantics are EXACTLY the HOF fold's, including float summation
  * ORDER (left-to-right, so results are bit-identical to the previous
  * formulation): mismatched lengths or a null element yield NULL (zip_with
  * null-padding / null-propagating arithmetic), empty arrays yield 0.0 (the
  * fold's init).
  */
private[graft] trait VecBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null elements / ragged pairs

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (array<double>, array<double>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  /** Fully-qualified static compute method returning java.lang.Double. */
  protected def computeRef: String

  protected def computeBoxed(a: ArrayData, b: ArrayData): java.lang.Double

  override def nullSafeEval(a: Any, b: Any): Any =
    computeBoxed(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("vecOut")
      s"""
         |java.lang.Double $tmp = $computeRef($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })
}

/** a · b. */
case class DotProduct(left: Expression, right: Expression) extends VecBinaryExpression {
  override def prettyName: String = "vec_dot"
  override protected def computeRef: String = "graft.functions.VecOps.dot"
  override protected def computeBoxed(a: ArrayData, b: ArrayData): java.lang.Double =
    VecOps.dot(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** Σ (a_i - b_i)² — squared L2, the k-means assignment metric. */
case class SquaredDistance(left: Expression, right: Expression) extends VecBinaryExpression {
  override def prettyName: String = "vec_sqdist"
  override protected def computeRef: String = "graft.functions.VecOps.sqDist"
  override protected def computeBoxed(a: ArrayData, b: ArrayData): java.lang.Double =
    VecOps.sqDist(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SquaredDistance =
    copy(left = l, right = r)
}

object VecOps {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  def sqDist(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  /** Column API. */
  def vecDot(a: Column, b: Column): Column = column(DotProduct(expression(a), expression(b)))
  def vecSqDist(a: Column, b: Column): Column = column(SquaredDistance(expression(a), expression(b)))
}
