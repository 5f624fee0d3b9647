package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-based unigram language model for perplexity-style quality
  * filtering — the CCNet/KenLM-shaped curation step: score every document
  * by how "language-like" its token stream is under a model trained on a
  * trusted corpus, then threshold. (CCNet uses a 5-gram KenLM; the
  * unigram form keeps the exact log-prob walk engine-replicable in a SQL
  * oracle while sharing all the machinery a higher-order model needs.)
  *
  * Probability model (Laplace-smoothed over the top-V gram table plus ONE
  * unk bucket, a proper distribution over V+1 outcomes):
  *   p(w)  = (c(w) + α) / (N + α·(V+1))   for w in the table
  *   p(unk) =       α   / (N + α·(V+1))   for any other token
  * with N = Σ c(w) over the kept table, V = table size. A document's
  * perplexity is `exp(−(Σ_i ln p(w_i)) / n)` over its lowercased
  * space-split tokens; a document with no tokens scores null.
  *
  * Execution shape, same family as [[BpeVocab]]/[[LinearTextModel]]: the
  * log-prob table rides ONE broadcast handle; scoring is a single per-row
  * codegen'd expression (one string walk computes the log-prob sum AND
  * the token count — no second pass, no UDF boxing, no shuffle).
  * Training ([[graft.operators.TextAnalysis.trainUnigramLm]]) is one
  * distributed gram-count shuffle with a bounded top-N collect. Persists
  * via [[graft.store.Artifacts]] (`unigram_lm` manifests). */
final class UnigramLm(
    val grams: Array[String],
    val counts: Array[Long],
    val alpha: Double) extends Serializable {
  require(grams.length == counts.length, "grams/counts length mismatch")
  require(alpha > 0, "alpha must be positive")

  private val table = new java.util.HashMap[String, java.lang.Double](grams.length * 2)
  /** ln p(unk): the Laplace mass of the single unk outcome. */
  val unkLogProb: Double = {
    val n = counts.sum.toDouble
    val denom = n + alpha * (grams.length + 1)
    grams.indices.foreach { i =>
      table.put(grams(i), math.log((counts(i) + alpha) / denom))
    }
    math.log(alpha / denom)
  }

  def size: Int = table.size

  def logProbOf(gram: String): Double = {
    val v = table.get(gram)
    if (v == null) unkLogProb else v.doubleValue()
  }

  /** Perplexity of one text: exp(−avg token ln-prob); null (boxed) when
    * the text has no tokens. Non-null input — the expression is
    * null-safe. Called from interpreted eval and generated code. */
  def perplexity(text: UTF8String): java.lang.Double = {
    // UTF8String.toLowerCase is the SAME implementation Spark's lower()
    // uses at training time — locale-sensitive characters (e.g. Turkish
    // dotted I) lowercase identically on both sides (r7 advisor)
    val s = text.toLowerCase.toString
    var lp = 0.0
    var n = 0L
    var wStart = 0
    var i = 0
    val len = s.length
    while (i <= len) {
      if (i == len || s.charAt(i) == ' ') {
        if (i > wStart) {
          lp += logProbOf(s.substring(wStart, i))
          n += 1
        }
        wStart = i + 1
      }
      i += 1
    }
    if (n == 0) null else java.lang.Double.valueOf(math.exp(-lp / n))
  }
}

/** Codegen'd per-document perplexity under a broadcast [[UnigramLm]].
  * Null in → null out; empty-token documents → null. */
case class UnigramPerplexity(child: Expression, bc: Broadcast[UnigramLm])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"UnigramPerplexity expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    bc.value.perplexity(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramLm", bc,
      "org.apache.spark.broadcast.Broadcast")
    // freshName: with a non-nullable child the block lands unbraced in the
    // enclosing generated function, so a fixed local would collide when
    // two perplexity expressions share a codegen scope
    val ppl = ctx.freshName("ppl")
    nullSafeCodeGen(ctx, ev, v => s"""
      java.lang.Double $ppl =
        ((graft.functions.UnigramLm) $ref.value()).perplexity($v);
      if ($ppl == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = $ppl.doubleValue();
      }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramPerplexity =
    copy(child = newChild)
}

/** Bigram language model with STUPID BACKOFF (Brants et al. 2007, "Large
  * Language Models in Machine Translation" — the standard large-scale
  * choice because unnormalized backoff needs no discount bookkeeping):
  *   s(w | prev) = c(prev, w) / c(prev)      if the bigram is in the table
  *               = backoff · p_uni(w)        otherwise
  * where `p_uni` is the Laplace-smoothed [[UnigramLm]] probability and
  * `condProbs` stores c(prev,w)/c(prev) with c(prev) taken from the FULL
  * unigram counts at train time (so the top-N unigram cut cannot skew
  * conditionals). A document's score is `exp(−avg ln s)` with the FIRST
  * token scored by the unigram model; token-free docs score null. `s` is
  * not a normalized probability (stupid backoff's trade) — fine for
  * filtering, where only the ordering matters.
  *
  * Same execution shape as [[UnigramLm]]: one broadcast handle, one
  * codegen'd per-row walk (bigram lookup + unigram fallback per token). */
final class BigramLm(
    val unigram: UnigramLm,
    val bigrams: Array[String],        // prev + "\u0001" + w keys
    val condProbs: Array[Double],
    val backoff: Double) extends Serializable {
  require(bigrams.length == condProbs.length, "bigrams/condProbs mismatch")
  require(backoff > 0 && backoff <= 1, "backoff must be in (0, 1]")

  private val table = new java.util.HashMap[String, java.lang.Double](bigrams.length * 2)
  bigrams.indices.foreach(i => table.put(bigrams(i), math.log(condProbs(i))))
  private val logBackoff = math.log(backoff)

  def size: Int = table.size

  /** ln s(w | prev); `prev == null` means document start (unigram). */
  def logScoreOf(prev: String, w: String): Double = {
    if (prev == null) unigram.logProbOf(w)
    else {
      val bg = table.get(prev + "\u0001" + w)
      if (bg != null) bg.doubleValue()
      else logBackoff + unigram.logProbOf(w)
    }
  }

  /** exp(−avg ln s) over the non-empty lowercased space-split tokens;
    * null (boxed) when the text has no tokens. */
  def perplexity(text: UTF8String): java.lang.Double = {
    // UTF8String.toLowerCase is the SAME implementation Spark's lower()
    // uses at training time — locale-sensitive characters (e.g. Turkish
    // dotted I) lowercase identically on both sides (r7 advisor)
    val s = text.toLowerCase.toString
    var lp = 0.0
    var n = 0L
    var prev: String = null
    var wStart = 0
    var i = 0
    val len = s.length
    while (i <= len) {
      if (i == len || s.charAt(i) == ' ') {
        if (i > wStart) {
          val w = s.substring(wStart, i)
          lp += logScoreOf(prev, w)
          n += 1
          prev = w
        }
        wStart = i + 1
      }
      i += 1
    }
    if (n == 0) null else java.lang.Double.valueOf(math.exp(-lp / n))
  }
}

/** Codegen'd per-document stupid-backoff perplexity under a broadcast
  * [[BigramLm]]. Null in → null out; empty-token documents → null. */
case class BigramPerplexity(child: Expression, bc: Broadcast[BigramLm])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"BigramPerplexity expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    bc.value.perplexity(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bigramLm", bc,
      "org.apache.spark.broadcast.Broadcast")
    // freshName: with a non-nullable child the block lands unbraced in the
    // enclosing generated function, so a fixed local would collide when
    // two perplexity expressions share a codegen scope
    val ppl = ctx.freshName("ppl")
    nullSafeCodeGen(ctx, ev, v => s"""
      java.lang.Double $ppl =
        ((graft.functions.BigramLm) $ref.value()).perplexity($v);
      if ($ppl == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = $ppl.doubleValue();
      }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): BigramPerplexity =
    copy(child = newChild)
}

object NgramLm {
  import org.apache.spark.sql.{Column, GraftSqlBridge}

  /** Column form: per-row perplexity under an already-broadcast model
    * (reuse the handle across expressions/queries). */
  def perplexity(bc: Broadcast[UnigramLm])(c: Column): Column =
    GraftSqlBridge.column(UnigramPerplexity(GraftSqlBridge.expression(c), bc))

  /** Column form of the stupid-backoff bigram perplexity. (Named, not an
    * overload: `Broadcast[UnigramLm]` and `Broadcast[BigramLm]` erase to
    * the same JVM signature.) */
  def bigramPerplexity(bc: Broadcast[BigramLm])(c: Column): Column =
    GraftSqlBridge.column(BigramPerplexity(GraftSqlBridge.expression(c), bc))
}
