package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of a pre-bucketed 2-D point — the
  * locality-optimal alternative to the Morton/Z-order interleave
  * ([[ZValueExpr]]): consecutive curve positions are always
  * grid-ADJACENT, so a file holding a contiguous Hilbert segment covers
  * a tighter hyper-rectangle than the same-length Z segment (the Z curve
  * takes long diagonal jumps at power-of-two boundaries). This is the
  * clustering function behind Databricks liquid clustering and Iceberg's
  * hilbert rewrite; at 100 TB the tighter per-file bounding boxes turn
  * directly into fewer files read per box predicate.
  *
  * Classic per-level rotate-and-accumulate transform (the public-domain
  * `xy2d` formulation, e.g. Hamilton 2006 tech report): `bits` levels,
  * each consuming one bit of x and y, contributing `s²·(3·rx XOR ry)` and
  * rotating the lower quadrant — pure integer arithmetic replicated
  * step-by-step by the DuckDB oracle (one chained CTE per level). Inputs
  * must already be bucketed into `[0, 2^bits)`
  * ([[graft.operators.Layout.fixedPointBucket]]); `2·bits ≤ 62`. NULL in
  * ⇒ NULL out. Shared static [[HilbertIndexExpr.xy2d]] keeps interpreted
  * eval and generated code the same arithmetic. */
case class HilbertIndexExpr(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (bits < 1 || 2 * bits > 62)
      TypeCheckResult.TypeCheckFailure(
        s"2*bits = ${2 * bits} must be in [2, 62]")
    else if (left.dataType != LongType || right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"HilbertIndexExpr expects two bigint inputs, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndexExpr.xy2d(bits, a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.HilbertIndexExpr.xy2d($bits, $x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndexExpr =
    copy(left = newLeft, right = newRight)
}

object HilbertIndexExpr {
  /** Curve position of grid point (x, y) on the order-`bits` Hilbert
    * curve. Bits above `bits` are ignored by construction (each level
    * masks one bit). */
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    var x = x0
    var y = y0
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  def hilbertIndex(x: Column, y: Column, bits: Int): Column =
    GraftSqlBridge.column(HilbertIndexExpr(
      GraftSqlBridge.expression(x), GraftSqlBridge.expression(y), bits))
}
