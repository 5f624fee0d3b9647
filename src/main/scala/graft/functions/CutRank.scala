package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Codegen'd upper-bound binary search over a small constant sorted cut
  * array: returns the COUNT of cuts `<= v` (ties counted on the left,
  * i.e. the rank of `v` on the cut grid). This is the hot-path scorer
  * behind `Profile.quantileTransform(approx = true)`: the obvious
  * `size(filter(cutsArray, c -> c <= v))` spelling routes through
  * Spark's higher-order-function interpreter (ArrayFilter is
  * CodegenFallback — a boxed lambda per element per row), which the ×30
  * bench measured SLOWER than the exact path it was meant to undercut
  * (21.2 s vs 9.3 s on 18M rows). Here the cuts ride the plan once as a
  * primitive double[] and each row pays ~log2(grid) compares inside
  * whole-stage codegen.
  *
  * Null in, null out (UnaryExpression's null-safe contract); NaN ranks
  * 0 (every compare is false — callers null NaNs upstream if they mean
  * "missing"). */
case class CutUpperBound(child: Expression, cuts: Array[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"CutUpperBound expects double, got ${t.simpleString}")
  }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any =
    CutRank.upperBound(cuts, input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cuts", cuts, "double[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.CutRank.upperBound((double[]) $ref, $v)")
  }

  override protected def withNewChildInternal(newChild: Expression): CutUpperBound =
    copy(child = newChild)
}

object CutRank {
  /** Index of the first cut strictly greater than `v` == count of cuts
    * `<= v`. Static so generated code calls it directly (stays inside
    * whole-stage codegen as a plain static invoke — same discipline as
    * the ImageHeaders/Repetition walks). */
  def upperBound(cuts: Array[Double], v: Double): Int = {
    var lo = 0
    var hi = cuts.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cuts(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }
}
