package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Linear bag-of-grams text scorer — the fastText-shaped "model-based
  * quality filter" stage of a curation pipeline (score each document with
  * a tiny linear model, threshold on the probability). The model is a
  * gram→weight table plus a bias; a document's raw score is
  * `bias + Σ weight(gram)` over every token occurrence (and, when
  * `useBigrams`, every adjacent-token bigram joined with one space) of its
  * lowercased space-split text; unknown grams contribute zero. Repeated
  * grams count once per OCCURRENCE — count-weighted bag, matching how the
  * SQL oracle unnests token instances.
  *
  * Execution shape, same family as [[BpeVocab]]: the weight table rides
  * ONE broadcast handle in the plan; scoring is a per-row codegen'd
  * expression — no UDF boxing, no shuffle, no driver participation.
  * Training-side: [[graft.operators.TextAnalysis.trainLogOdds]] builds the
  * table distributively (one gram-count shuffle over a labeled frame). */
final class LinearTextModel(
    val grams: Array[String],
    val weights: Array[Double],
    val bias: Double,
    val useBigrams: Boolean) extends Serializable {
  require(grams.length == weights.length, "grams/weights length mismatch")
  private val table = new java.util.HashMap[String, java.lang.Double](grams.length * 2)
  grams.indices.foreach(i => table.put(grams(i), weights(i)))

  def size: Int = table.size

  /** Raw linear score of one text (non-null input — the expression is
    * null-safe). Called from both interpreted eval and generated code. */
  def score(text: UTF8String): Double = {
    // UTF8String.toLowerCase is the SAME implementation Spark's lower()
    // uses at training time — locale-sensitive characters (e.g. Turkish
    // dotted I) lowercase identically on both sides (r7 advisor)
    val s = text.toLowerCase.toString
    var total = bias
    var prev: String = null
    var wStart = 0
    var i = 0
    val n = s.length
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > wStart) {
          val w = s.substring(wStart, i)
          val uw = table.get(w)
          if (uw != null) total += uw.doubleValue()
          if (useBigrams && prev != null) {
            val bg = table.get(prev + " " + w)
            if (bg != null) total += bg.doubleValue()
          }
          prev = w
        }
        wStart = i + 1
      }
      i += 1
    }
    total
  }
}

/** Codegen'd raw linear score of a string column under a broadcast
  * [[LinearTextModel]]. Null in → null out; apply `sigmoid` downstream for
  * a probability. */
case class LinearTextScore(child: Expression, bc: Broadcast[LinearTextModel])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"LinearTextScore expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(input: Any): Any =
    bc.value.score(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("textModel", bc,
      "org.apache.spark.broadcast.Broadcast")
    defineCodeGen(ctx, ev, v =>
      s"((graft.functions.LinearTextModel) $ref.value()).score($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): LinearTextScore =
    copy(child = newChild)
}

object TextModel {
  import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}

  /** Column form: raw linear score of `c` under the weight table. */
  def score(spark: SparkSession, weights: Map[String, Double], bias: Double,
      useBigrams: Boolean = false)(c: Column): Column = {
    val (g, w) = weights.toArray.sortBy(_._1).unzip
    val bc = spark.sparkContext.broadcast(
      new LinearTextModel(g, w, bias, useBigrams))
    GraftSqlBridge.column(LinearTextScore(GraftSqlBridge.expression(c), bc))
  }

  /** Column form against an already-broadcast model. */
  def score(bc: Broadcast[LinearTextModel])(c: Column): Column =
    GraftSqlBridge.column(LinearTextScore(GraftSqlBridge.expression(c), bc))
}
