package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over an array of string tokens, as a native Catalyst
  * expression: per token a 64-bit hash votes ±1 on each bit position; the
  * fingerprint sets bits with positive tally. Near-duplicate docs land within
  * a small Hamming distance (pair with `bit_count(a ^ b)`).
  *
  * Codegen emits a static call into [[SimHash64.compute]], so the operator
  * stays inside whole-stage codegen (no interpreted fallback, no UDF
  * serialization) — the preferred extension point when built-ins can't
  * express the semantics.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash64 needs array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Stable 64-bit token hash (FNV-1a over UTF-8 bytes) — dependency-free and
    * identical across JVMs/executors.
    */
  def hash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def compute(tokens: ArrayData): Long = {
    val tally = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = hash64(tokens.getUTF8String(i))
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) tally(j) += 1 else tally(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (tally(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Column API. */
  def simhash64(tokens: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(SimHash64(
      org.apache.spark.sql.graftbridge.ColumnBridge.expression(tokens)))
}
