package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.types._

/** Native dot product over two `array<float>` columns, accumulated in
  * double in POSITION ORDER (bit-identical to a left fold / a C loop, so
  * results compare exactly against other engines).
  *
  * Exists because the composable alternative —
  * `aggregate(zip_with(a, b, _ * _), 0d, _ + _)` — runs as INTERPRETED
  * higher-order functions: every element is boxed and every lambda step is
  * a closure call, ~50x slower than this whole-stage-codegen'd loop over
  * `UnsafeArrayData.getFloat`. At 10^7 candidate pairs x 64 dims that is
  * the difference between seconds and an hour (measured in BENCH: the ANN
  * verify stage dominated end-to-end time before this).
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"FloatVectorDot expects two array<float> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        sum += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $sum += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}

/** Intersection size of two SORTED string arrays via a codegen'd merge scan
  * — no per-pair hash set allocation (Spark's `array_intersect` builds a
  * SQLOpenHashSet per row, which dominated the dedup verify stage at 10^7
  * candidate pairs). Inputs MUST be sorted ascending (array_sort), computed
  * once per document, not per pair. */
case class SortedArrayIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"SortedArrayIntersectCount expects two array<string> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var n = 0
    while (i < x.numElements() && j < y.numElements()) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |int $i = 0; int $j = 0; int $n = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($c == 0) { $n++; $i++; $j++; }
         |  else if ($c < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedArrayIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Intersection size of two SORTED int arrays (hashed shingles/tokens) via
  * a codegen'd merge scan — int compares instead of UTF8String compares,
  * another ~3-5x on the dedup verify hot loop. */
case class SortedIntArrayIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"SortedIntArrayIntersectCount expects two array<int> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var n = 0
    while (i < x.numElements() && j < y.numElements()) {
      val xi = x.getInt(i); val yj = y.getInt(j)
      if (xi == yj) { n += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val xi = ctx.freshName("xi")
      val yj = ctx.freshName("yj")
      s"""
         |int $i = 0; int $j = 0; int $n = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  int $xi = $a.getInt($i); int $yj = $b.getInt($j);
         |  if ($xi == $yj) { $n++; $i++; $j++; }
         |  else if ($xi < $yj) { $i++; } else { $j++; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntArrayIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH signature: `nPlanes` sign bits of Rademacher
  * projections packed into a long. The plane matrix is derived from
  * splitmix-mixed (plane, dim) indices at eval time — one expression node
  * instead of the nPlanes x dim literal Add-tree a composed-Column version
  * needs (a 16x64 tree costs ~15 s of analyzer+janino per query; this is a
  * single codegen'd loop). */
case class HyperplaneSignature(child: Expression, nPlanes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"HyperplaneSignature expects array<float>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    HyperplaneSignature.signature(v, nPlanes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.HyperplaneSignature.signature($a, $nPlanes)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignature =
    copy(child = newChild)
}

object HyperplaneSignature {
  /** splitmix-style sign for (plane j, dim d): +1.0 or -1.0. */
  @inline def sign(j: Int, d: Int): Double = {
    var z = (j.toLong << 32 | (d.toLong & 0xFFFFFFFFL)) + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    if ((z ^ (z >>> 31)) % 2 == 0) 1.0 else -1.0
  }

  /** Called from both interpreted eval and generated code. */
  def signature(v: ArrayData, nPlanes: Int): Long = {
    var sig = 0L
    var j = 0
    while (j < nPlanes) {
      var proj = 0.0
      var d = 0
      val n = v.numElements()
      while (d < n) {
        if (!v.isNullAt(d)) proj += v.getFloat(d).toDouble * sign(j, d)
        d += 1
      }
      if (proj > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

object VectorOps {
  /** Codegen'd dot(a, b) over float-array columns. */
  def dotF(a: Column, b: Column): Column =
    GraftSqlBridge.column(FloatVectorDot(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Codegen'd random-hyperplane LSH signature (nPlanes sign bits). */
  def hyperplaneSignature(vec: Column, nPlanes: Int): Column =
    GraftSqlBridge.column(HyperplaneSignature(
      GraftSqlBridge.expression(vec), nPlanes))

  def normF(a: Column): Column = sqrt(dotF(a, a))

  /** Codegen'd |a ∩ b| for sorted string arrays. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftSqlBridge.column(SortedArrayIntersectCount(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Codegen'd |a ∩ b| for sorted int arrays. */
  def sortedIntIntersectCount(a: Column, b: Column): Column =
    GraftSqlBridge.column(SortedIntArrayIntersectCount(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
