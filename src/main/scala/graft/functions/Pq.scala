package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization codebook: `m` contiguous subspaces × `k` centroids
  * × `dim/m` floats (Jégou et al. 2011, "Product Quantization for Nearest
  * Neighbor Search"). Driver-trained, shipped to executors as ONE
  * reference object — the same bounded-broadcast shape as
  * [[CentroidSet]]. A 100 TB embedding corpus encodes to `m` small codes
  * per vector (e.g. 64 fp32 dims → 4 bytes of codes at m=4), the
  * 64×-ish storage/shuffle cut that makes corpus-scale candidate
  * generation memory-feasible; exact fp32 re-ranking runs on survivors
  * only. */
final class PqCodebook(
    val dim: Int,
    val centroids: Array[Array[Array[Float]]]) extends Serializable {
  val m: Int = centroids.length
  require(m > 0, "codebook must have at least one subspace")
  require(dim % m == 0, s"dim $dim must be divisible by m $m")
  val dsub: Int = dim / m
  val k: Int = centroids(0).length
  require(centroids.forall(_.length == k),
    "every subspace must hold the same number of centroids")
  require(centroids.forall(_.forall(_.length == dsub)),
    s"every centroid must have dim/m = $dsub elements")

  /** Per-(subspace, code) self dot product, precomputed once (not once per
    * scanned row): the `cc` term of the L2 distance identity. */
  val selfDots: Array[Array[Double]] = centroids.map(_.map { cv =>
    var s = 0.0; var j = 0
    while (j < cv.length) { s += cv(j).toDouble * cv(j).toDouble; j += 1 }
    s
  })
}

/** PQ encoding as ONE codegen'd scan expression: for each subspace j, the
  * centroid id minimizing the L2² distance to the subvector (ties →
  * smallest id), emitted as `array<int>` of length m.
  *
  * Distance is the dot-product identity `xx − 2·xc + cc` over
  * position-ordered double accumulations — the exact formula an external
  * engine (DuckDB `list_dot_product`) reproduces, which is what makes the
  * trained codes oracle-checkable bit-for-bit. */
case class PqEncodeExpr(child: Expression, cb: PqCodebook)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"PqEncodeExpr expects array<float>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    PqEncodeExpr.compute(input.asInstanceOf[ArrayData], cb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cb, "graft.functions.PqCodebook")
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.PqEncodeExpr.compute($a, $cbRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

object PqEncodeExpr {
  /** Called from both interpreted eval and generated code. */
  def compute(v: ArrayData, cb: PqCodebook): ArrayData = {
    val out = new Array[Int](cb.m)
    var j = 0
    while (j < cb.m) {
      val base = j * cb.dsub
      val n = math.min(cb.dsub, math.max(v.numElements() - base, 0))
      // xx once per (row, subspace) — constant across centroids, but kept
      // in the compared value so the formula matches the oracle's exactly
      var xx = 0.0
      var i = 0
      while (i < n) {
        if (!v.isNullAt(base + i)) {
          val x = v.getFloat(base + i).toDouble; xx += x * x
        }
        i += 1
      }
      var best = 0
      var bestDist = Double.NaN
      var c = 0
      while (c < cb.k) {
        val cv = cb.centroids(j)(c)
        var xc = 0.0
        var i2 = 0
        while (i2 < n) {
          if (!v.isNullAt(base + i2))
            xc += v.getFloat(base + i2).toDouble * cv(i2).toDouble
          i2 += 1
        }
        val dist = xx - 2.0 * xc + cb.selfDots(j)(c)
        // strict < keeps the smallest id on ties; NaN never wins over a
        // number (Double.compare puts NaN greatest, matching SQL ordering)
        if (c == 0 || java.lang.Double.compare(dist, bestDist) < 0) {
          best = c; bestDist = dist
        }
        c += 1
      }
      out(j) = best
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}

/** Asymmetric-distance (ADC) dot product: `Σ_j dot(q_sub_j,
  * centroid[j][codes[j]])` — the query stays full-precision, the corpus
  * row contributes only its m codes. Reads m·dsub floats from the
  * broadcast codebook per row; the corpus side never rehydrates vectors.
  * NULL if either side is NULL (BinaryExpression default). */
case class PqAdcDot(left: Expression, right: Expression, cb: PqCodebook)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"PqAdcDot expects (array<float>, array<int>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(q: Any, codes: Any): Any =
    PqAdcDot.compute(q.asInstanceOf[ArrayData],
      codes.asInstanceOf[ArrayData], cb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cb, "graft.functions.PqCodebook")
    defineCodeGen(ctx, ev, (q, c) =>
      s"graft.functions.PqAdcDot.compute($q, $c, $cbRef)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcDot =
    copy(left = newLeft, right = newRight)
}

object PqAdcDot {
  /** Called from both interpreted eval and generated code. */
  def compute(q: ArrayData, codes: ArrayData, cb: PqCodebook): Double = {
    var acc = 0.0
    val m = math.min(cb.m, codes.numElements())
    var j = 0
    while (j < m) {
      if (!codes.isNullAt(j)) {
        val cv = cb.centroids(j)(codes.getInt(j))
        val base = j * cb.dsub
        val n = math.min(cb.dsub, math.max(q.numElements() - base, 0))
        var i = 0
        while (i < n) {
          if (!q.isNullAt(base + i))
            acc += q.getFloat(base + i).toDouble * cv(i).toDouble
          i += 1
        }
      }
      j += 1
    }
    acc
  }
}

/** Squared norm of the RECONSTRUCTION a code array denotes:
  * `Σ_j selfDot[j][codes[j]]` — per-subspace self dots summed in subspace
  * order (an external engine replicates it as the sum of per-subspace
  * `list_dot_product(c_j, c_j)` terms, preserving the accumulation
  * grouping). Powers the approximate-cosine denominator without touching
  * any vector data. */
case class PqCodeNorm2(child: Expression, cb: PqCodebook)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"PqCodeNorm2 expects array<int>, got ${t.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(codes: Any): Any =
    PqCodeNorm2.compute(codes.asInstanceOf[ArrayData], cb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cb, "graft.functions.PqCodebook")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqCodeNorm2.compute($c, $cbRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodeNorm2 =
    copy(child = newChild)
}

object PqCodeNorm2 {
  /** Called from both interpreted eval and generated code. */
  def compute(codes: ArrayData, cb: PqCodebook): Double = {
    var acc = 0.0
    val m = math.min(cb.m, codes.numElements())
    var j = 0
    while (j < m) {
      if (!codes.isNullAt(j)) acc += cb.selfDots(j)(codes.getInt(j))
      j += 1
    }
    acc
  }
}

object Pq {
  import org.apache.spark.sql.GraftSqlBridge

  /** Codegen'd PQ code assignment (array<int> of m codes). */
  def encode(vec: Column, cb: PqCodebook): Column =
    GraftSqlBridge.column(PqEncodeExpr(GraftSqlBridge.expression(vec), cb))

  /** Codegen'd asymmetric (query fp32 × corpus codes) dot product. */
  def adcDot(query: Column, codes: Column, cb: PqCodebook): Column =
    GraftSqlBridge.column(PqAdcDot(GraftSqlBridge.expression(query),
      GraftSqlBridge.expression(codes), cb))

  /** Codegen'd squared norm of the reconstruction a code array denotes. */
  def codeNorm2(codes: Column, cb: PqCodebook): Column =
    GraftSqlBridge.column(PqCodeNorm2(GraftSqlBridge.expression(codes), cb))
}
