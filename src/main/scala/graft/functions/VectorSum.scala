package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Element-wise vector SUM aggregate: one agg column regardless of the
  * embedding dimension. The per-dimension alternative —
  * `(0 until dim).map(i => avg(element_at(v, i + 1)))` — builds `dim`
  * aggregate expressions, which at production dims (768–4096) risks
  * analysis/codegen blowup (thousands of aggregate columns in one plan);
  * this buffer is a single `Array[Double]` that map-side combines, so the
  * shuffle carries tasks × groups rows of one dim-length array each.
  * Callers divide by `count(*)` for the mean. Null rows are ignored;
  * an all-null group returns an empty array. */
final class VectorSumAggregator
    extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
  override def zero: Array[Double] = Array.emptyDoubleArray
  override def reduce(b: Array[Double], v: Seq[Double]): Array[Double] = {
    if (v == null) b
    else if (b.isEmpty) v.toArray
    else {
      var i = 0
      while (i < b.length && i < v.length) { b(i) += v(i); i += 1 }
      b
    }
  }
  override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      var i = 0
      while (i < a.length && i < b.length) { a(i) += b(i); i += 1 }
      a
    }
  override def finish(b: Array[Double]): Seq[Double] = b.toSeq
  override def bufferEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}

object VectorSum {
  /** `array<double>` sum of an `array<double>` column (cast upstream). */
  def vectorSum(c: Column): Column = udaf(new VectorSumAggregator).apply(c)
}
