package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row engine for the n-gram half of the Gopher repetition rules
  * (Rae et al. 2021 Table A1): top-n-gram character fraction for each
  * `topNs` and duplicate-n-gram position-coverage character fraction for
  * each `dupNs`, all computed in ONE imperative walk with per-n hash
  * maps — O(tokens × n) per n, Java speed.
  *
  * Why a native expression and not higher-order-function columns: a HOF
  * formulation of "count this gram among all grams, per position" walks
  * the interpreted expression tree once per array ELEMENT (Catalyst
  * lambda evaluation), a ~1000× constant over an imperative loop —
  * measured at ~40 ms/doc on 100-token documents, which is a benchmark
  * non-starter. Same execution family as [[UnigramLm]]: the config rides
  * one reference object, scoring is one per-row call, codegen'd.
  *
  * Definition parity (pinned by the DuckDB oracle and spec fixtures):
  * tokens are the space-split of the lowercased text INCLUDING empties
  * (split semantics); a gram's characters are the sum of its tokens'
  * code-point lengths (separators excluded); the top gram breaks count
  * ties toward the code-point-lexicographically smallest gram (= UTF-8
  * byte order, DuckDB's string order); coverage marks token positions
  * spanned by any n-gram occurring 2+ times, so overlapping duplicates
  * never double-count a token. Documents with more than `maxTokens`
  * tokens (quadratic-guard discipline) or zero token characters yield
  * NULL. */
/** Code-point lexicographic string order == UTF-8 byte order — what both
  * Spark's UTF8String `<` and DuckDB's ORDER BY use. JVM
  * `String.compareTo` (UTF-16 code-unit order) diverges on supplementary
  * characters, so every cross-engine tie-break in this package goes
  * through this ONE shared comparator. */
object CodePointOrder extends java.util.Comparator[String] with Serializable {
  def cpCompare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }
  override def compare(a: String, b: String): Int = cpCompare(a, b)
}

final class RepetitionConfig(
    val topNs: Array[Int],
    val dupNs: Array[Int],
    val maxTokens: Int) extends Serializable {
  require(topNs.forall(_ >= 2) && dupNs.forall(_ >= 2),
    "n-gram sizes must be >= 2")

  private def cpCompare(a: String, b: String): Int =
    CodePointOrder.cpCompare(a, b)

  /** All signals for one document in `topNs ++ dupNs` order, or null
    * when guarded. Called from interpreted eval and generated code. */
  def compute(text: UTF8String): InternalRow = {
    val s = text.toLowerCase.toString
    val toks = s.split(" ", -1)
    val m = toks.length
    if (m > maxTokens) return null
    val lens = new Array[Int](m)
    var tot = 0L
    var i = 0
    while (i < m) {
      lens(i) = toks(i).codePointCount(0, toks(i).length)
      tot += lens(i)
      i += 1
    }
    if (tot == 0L) return null
    val out = new Array[Any](topNs.length + dupNs.length)
    var oi = 0

    // grams + counts are cached per distinct n: an n appearing in BOTH
    // topNs and dupNs pays the gram walk once
    val gramCache =
      new java.util.HashMap[Integer, (Array[String], java.util.HashMap[String, Integer])]
    def gramsAndCounts(n: Int): (Array[String], java.util.HashMap[String, Integer]) = {
      val hit = gramCache.get(Integer.valueOf(n))
      if (hit != null) return hit
      val g = new Array[String](m - n + 1)
      val sb = new java.lang.StringBuilder
      var p = 0
      while (p <= m - n) {
        sb.setLength(0)
        var q = 0
        while (q < n) {
          if (q > 0) sb.append(' ')
          sb.append(toks(p + q))
          q += 1
        }
        g(p) = sb.toString
        p += 1
      }
      val counts = new java.util.HashMap[String, Integer](g.length * 2)
      p = 0
      while (p < g.length) {
        val c = counts.get(g(p))
        counts.put(g(p), if (c == null) 1 else c.intValue() + 1)
        p += 1
      }
      val r = (g, counts)
      gramCache.put(Integer.valueOf(n), r)
      r
    }

    var ti = 0
    while (ti < topNs.length) {
      val n = topNs(ti)
      out(oi) =
        if (m < n) java.lang.Double.valueOf(0.0)
        else {
          val (_, counts) = gramsAndCounts(n)
          var bestCnt = 0
          var bestGram: String = null
          val it = counts.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            val c = e.getValue.intValue()
            if (c > bestCnt ||
                (c == bestCnt && cpCompare(e.getKey, bestGram) < 0)) {
              bestCnt = c
              bestGram = e.getKey
            }
          }
          val gramChars =
            bestGram.codePointCount(0, bestGram.length) - (n - 1)
          java.lang.Double.valueOf(
            bestCnt.toDouble * gramChars / tot.toDouble)
        }
      oi += 1
      ti += 1
    }

    var di = 0
    while (di < dupNs.length) {
      val n = dupNs(di)
      out(oi) =
        if (m < n) java.lang.Double.valueOf(0.0)
        else {
          val (g, counts) = gramsAndCounts(n)
          val covered = new Array[Boolean](m)
          var p = 0
          while (p < g.length) {
            if (counts.get(g(p)).intValue() >= 2) {
              var q = p
              while (q < p + n) { covered(q) = true; q += 1 }
            }
            p += 1
          }
          var cov = 0L
          p = 0
          while (p < m) { if (covered(p)) cov += lens(p); p += 1 }
          java.lang.Double.valueOf(cov.toDouble / tot.toDouble)
        }
      oi += 1
      di += 1
    }
    new GenericInternalRow(out)
  }
}

/** Shannon entropy of a document's token distribution, in nats:
  * `H = −Σ (c/m)·ln(c/m)` over the lowercased space-split tokens
  * (empties included — split semantics). A standard quality-classifier
  * signal: near-zero for degenerate repetition ("buy buy buy …"),
  * `ln(m)` for all-distinct text; threshold low-entropy docs or feed it
  * to a scorer alongside the repetition fractions. One imperative
  * hash-map walk per row (the [[RepetitionConfig]] execution family);
  * the per-distinct-token sum folds in code-point-sorted token order so
  * the float result is deterministic and engine-replicable (the DuckDB
  * oracle sums over `list_sort(list_distinct(...))` — same order, same
  * reassociation, 6-decimal rounding absorbs the rest). */
object TokenEntropy {
  def compute(text: UTF8String): Double = {
    val s = text.toLowerCase.toString
    val toks = s.split(" ", -1)
    val m = toks.length
    val counts = new java.util.TreeMap[String, Integer](CodePointOrder)
    var p = 0
    while (p < m) {
      val c = counts.get(toks(p))
      counts.put(toks(p), if (c == null) 1 else c.intValue() + 1)
      p += 1
    }
    var h = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val f = it.next().doubleValue() / m
      h -= f * math.log(f)
    }
    h
  }
}

/** Codegen'd per-document token-entropy scalar. Null in → null out. */
case class TokenEntropyExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"TokenEntropyExpr expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(input: Any): Any =
    TokenEntropy.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.TokenEntropy.compute($v)")

  override protected def withNewChildInternal(newChild: Expression): TokenEntropyExpr =
    copy(child = newChild)
}

/** Codegen'd per-document repetition signals struct
  * (`top_{n}gram_char_frac` per `topNs`, then `dup_{n}gram_char_frac`
  * per `dupNs`). Null in / guarded doc → null struct. */
case class RepetitionStatsExpr(child: Expression, config: RepetitionConfig)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"RepetitionStatsExpr expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = StructType(
    config.topNs.map(n =>
      StructField(s"top_${n}gram_char_frac", DoubleType, nullable = false)) ++
      config.dupNs.map(n =>
        StructField(s"dup_${n}gram_char_frac", DoubleType, nullable = false)))
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    config.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("repetitionConfig", config,
      "graft.functions.RepetitionConfig")
    val row = ctx.freshName("repRow")
    nullSafeCodeGen(ctx, ev, v => s"""
      org.apache.spark.sql.catalyst.InternalRow $row = $ref.compute($v);
      if ($row == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = $row;
      }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): RepetitionStatsExpr =
    copy(child = newChild)
}
