package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd membership tests against a BROADCAST sorted array of probe
  * values — the executor-side filter shape for index probes whose value set
  * exceeds the `isin` literal cap but fits the broadcast cap.
  *
  * Why not `isInCollection`/InSet: those embed the set in the serialized
  * plan, shipped with every task. Why not a UDF (the previous shape): boxed
  * lambda per row and an opaque black box to the optimizer. Here only the
  * broadcast HANDLE rides in the plan; executors binary-search a primitive
  * sorted array fetched once from the block manager — no per-row boxing, and
  * the probe stays inside whole-stage codegen (closing the last UDF on a
  * probe path, r4 verdict finding #3).
  *
  * Null inputs return null (a WHERE drops the row — the same outcome as the
  * previous UDF's `false`; pinned by the differential test vs `isin`).
  */
case class BroadcastLongSetContains(child: Expression, bc: Broadcast[Array[Long]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"BroadcastLongSetContains expects bigint, got ${t.simpleString}")
  }

  override def dataType: DataType = BooleanType

  override def nullSafeEval(input: Any): Any =
    java.util.Arrays.binarySearch(bc.value, input.asInstanceOf[Long]) >= 0

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bcLongSet", bc,
      "org.apache.spark.broadcast.Broadcast")
    defineCodeGen(ctx, ev, v =>
      s"java.util.Arrays.binarySearch((long[]) $ref.value(), $v) >= 0")
  }

  override protected def withNewChildInternal(newChild: Expression): BroadcastLongSetContains =
    copy(child = newChild)
}

/** String flavor of [[BroadcastLongSetContains]]: binary search over a
  * sorted `UTF8String` array (binary comparison — consistent with how the
  * driver sorted it). */
case class BroadcastStringSetContains(child: Expression, bc: Broadcast[Array[UTF8String]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"BroadcastStringSetContains expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = BooleanType

  override def nullSafeEval(input: Any): Any =
    java.util.Arrays.binarySearch(bc.value.asInstanceOf[Array[AnyRef]],
      input.asInstanceOf[UTF8String]) >= 0

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bcStringSet", bc,
      "org.apache.spark.broadcast.Broadcast")
    defineCodeGen(ctx, ev, v =>
      s"java.util.Arrays.binarySearch((Object[]) $ref.value(), $v) >= 0")
  }

  override protected def withNewChildInternal(newChild: Expression): BroadcastStringSetContains =
    copy(child = newChild)
}

object BroadcastSets {
  import org.apache.spark.sql.{Column, SparkSession, GraftSqlBridge}

  /** Broadcast + codegen'd membership for long values (input column must
    * already be bigint). Values are deduped and sorted driver-side. */
  def longSetContains(spark: SparkSession, values: Iterable[Long])(c: Column): Column = {
    val arr = values.toArray.distinct.sorted
    val bc = spark.sparkContext.broadcast(arr)
    GraftSqlBridge.column(BroadcastLongSetContains(GraftSqlBridge.expression(c), bc))
  }

  /** Broadcast + codegen'd membership for string values. */
  def stringSetContains(spark: SparkSession, values: Iterable[String])(c: Column): Column = {
    val arr: Array[UTF8String] =
      values.toSeq.distinct.map(UTF8String.fromString).toArray
    java.util.Arrays.sort(arr, null)
    val bc = spark.sparkContext.broadcast(arr)
    GraftSqlBridge.column(BroadcastStringSetContains(GraftSqlBridge.expression(c), bc))
  }
}
