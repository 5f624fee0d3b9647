package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) bit-interleave of `k` pre-bucketed non-negative longs
  * into one long sort key — the multi-column data-clustering primitive
  * behind layout optimization (Delta/Iceberg `OPTIMIZE ZORDER BY`): files
  * written in z-value order are simultaneously clustered on EVERY
  * interleaved column, so per-file min/max range indexes prune box
  * predicates on any subset of them. A lexicographic sort clusters only
  * its leading column; at 100 TB the difference is whether a secondary
  * predicate scans 1% or 100% of files.
  *
  * Bit layout: output bit `i*k + (k-1-j)` carries input `j`'s bit `i`, so
  * column 0 owns the most significant bit of each group and low-order
  * bucket bits land in low-order output bits. `k*bits` must fit in 63
  * bits. Inputs are expected in `[0, 2^bits)` (the caller buckets them —
  * [[graft.operators.Layout.fixedPointBucket]]); higher bits are ignored
  * by construction. NULL in ⇒ NULL out.
  *
  * The arithmetic is pure integer shifts replicated term-by-term by the
  * oracle SQL (DuckDB `&`, `<<`), which is what makes z-values
  * hash-checkable bit-for-bit. One expression, codegen'd via the shared
  * static [[ZValueExpr.compute]] — no per-bit Column tree (2·k·bits
  * nested ORs would bloat analysis the way the pre-
  * [[HyperplaneSignature]] Add tree did). */
case class ZValueExpr(children: Seq[Expression], bits: Int)
    extends Expression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.isEmpty)
      TypeCheckResult.TypeCheckFailure("ZValueExpr needs at least one input")
    else if (bits < 1 || children.size * bits > 63)
      TypeCheckResult.TypeCheckFailure(
        s"k*bits = ${children.size}*$bits must be in [1, 63]")
    else children.zipWithIndex.collectFirst {
      case (c, i) if c.dataType != LongType =>
        TypeCheckResult.TypeCheckFailure(
          s"ZValueExpr input $i must be bigint, got ${c.dataType.simpleString}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def eval(input: InternalRow): Any = {
    val k = children.size
    var acc = 0L
    var j = 0
    while (j < k) {
      val v = children(j).eval(input)
      if (v == null) return null
      acc |= ZValueExpr.weave(v.asInstanceOf[Long], bits, k, j)
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = children.size
    val acc = ctx.freshName("zacc")
    val anyNull = ctx.freshName("zAnyNull")
    val evals = children.zipWithIndex.map { case (c, j) =>
      val e = c.genCode(ctx)
      s"""
         |if (!$anyNull) {
         |  ${e.code}
         |  if (${e.isNull}) { $anyNull = true; }
         |  else { $acc |= graft.functions.ZValueExpr.weave(${e.value}, $bits, $k, $j); }
         |}
       """.stripMargin
    }
    val body =
      s"""
         |long $acc = 0L;
         |boolean $anyNull = false;
         |${evals.mkString("\n")}
       """.stripMargin
    if (nullable) {
      ev.copy(code = code"""$body
        |boolean ${ev.isNull} = $anyNull;
        |long ${ev.value} = $acc;""".stripMargin)
    } else {
      ev.copy(code = code"""$body
        |long ${ev.value} = $acc;""".stripMargin, isNull = FalseLiteral)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZValueExpr =
    copy(children = newChildren)
}

object ZValueExpr {
  /** The bits of input `j` spread to their interleaved output positions.
    * Shared by interpreted eval and generated code so both paths are the
    * same arithmetic. */
  def weave(v: Long, bits: Int, k: Int, j: Int): Long = {
    var out = 0L
    var i = 0
    while (i < bits) {
      out |= ((v >>> i) & 1L) << (i * k + (k - 1 - j))
      i += 1
    }
    out
  }

  def zValue(cols: Seq[Column], bits: Int): Column =
    GraftSqlBridge.column(
      ZValueExpr(cols.map(GraftSqlBridge.expression), bits))
}
