package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match BPE-style tokenization against a broadcast
  * subword vocabulary — the "real token accounting" upgrade over
  * [[graft.operators.TextAnalysis.bpeTokenCount]]'s pre-tokenizer lower
  * bound. Matching semantics (chosen to be exactly replicable in a SQL
  * oracle): text splits into words on single spaces (empty words from
  * runs of spaces contribute nothing; lowercase upstream with `lower()`),
  * then each word is consumed left-to-right by the LONGEST vocab entry
  * starting at the cursor; a character matched by no entry falls back to
  * one token by itself (the byte-fallback analogue). `maxLen` bounds the
  * probe so each cursor position costs at most maxTokenLen hash lookups.
  *
  * Vocabularies come from [[BpeVocab.train]] (classic merge loop over the
  * corpus word-frequency table) or any hand-picked list. The whole count
  * is one per-row codegen'd expression — no UDF boxing, no shuffle; the
  * vocabulary rides ONE broadcast handle in the plan, not a per-task
  * serialized set. */
final class BpeVocab(val tokens: Array[String]) extends Serializable {
  private val set = new java.util.HashSet[String](tokens.length * 2)
  tokens.foreach(set.add)
  val maxLen: Int = if (tokens.isEmpty) 1 else tokens.map(_.length).max

  def size: Int = set.size

  /** Greedy longest-match segment count of one word range [from, to). */
  private def countWord(s: String, from: Int, to: Int): Long = {
    var i = from
    var c = 0L
    while (i < to) {
      var len = math.min(maxLen, to - i)
      var adv = 1
      var found = false
      while (len >= 1 && !found) {
        if (set.contains(s.substring(i, i + len))) { adv = len; found = true }
        len -= 1
      }
      c += 1
      i += adv
    }
    c
  }

  /** Total token count of a text: sum of per-word greedy segment counts,
    * words split on single spaces. Called from both interpreted eval and
    * generated code (non-null input — the expression is null-safe). */
  def countText(text: UTF8String): Long = {
    val s = text.toString
    val n = s.length
    var total = 0L
    var wStart = 0
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > wStart) total += countWord(s, wStart, i)
        wStart = i + 1
      }
      i += 1
    }
    total
  }

  /** Segmentation of a single word — test/debug surface for the exact
    * greedy walk the count performs. */
  def segmentWord(word: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < word.length) {
      var len = math.min(maxLen, word.length - i)
      var adv = 1
      var found = false
      while (len >= 1 && !found) {
        if (set.contains(word.substring(i, i + len))) { adv = len; found = true }
        len -= 1
      }
      out += word.substring(i, i + adv)
      i += adv
    }
    out.toSeq
  }
}

object BpeVocab {
  /** Classic BPE training over a WORD-FREQUENCY table (the standard
    * formulation — merges are computed on the bounded word→count dict,
    * never on the corpus): start from single characters, then `numMerges`
    * times merge the most frequent adjacent symbol pair (ties broken
    * lexicographically for determinism). The resulting vocabulary is the
    * observed characters plus one entry per merge.
    *
    * 100 TB shape: the corpus-side work is whatever produced `wordCounts`
    * (one [[graft.operators.TextAnalysis.vocabulary]] aggregate — one
    * scan + one gram shuffle with a top-N cut); training itself is
    * driver-side but bounded by the word table, O(numMerges × table ×
    * avgWordLen) — the same bound every reference BPE trainer has. */
  def train(wordCounts: Seq[(String, Long)], numMerges: Int): BpeVocab = {
    require(numMerges >= 0, "numMerges must be >= 0")
    // words as mutable symbol sequences, weighted by count
    val words = wordCounts.map { case (w, c) =>
      (scala.collection.mutable.ArrayBuffer(w.map(_.toString): _*), c)
    }
    val vocab = scala.collection.mutable.LinkedHashSet.empty[String]
    words.foreach { case (syms, _) => syms.foreach(vocab += _) }
    var merges = 0
    while (merges < numMerges) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (pairCounts.isEmpty) merges = numMerges // nothing left to merge
      else {
        val ((a, b), _) = pairCounts.toSeq
          .minBy { case ((x, y), c) => (-c, x, y) }
        vocab += (a + b)
        words.foreach { case (syms, _) =>
          var i = 0
          while (i < syms.length - 1) {
            if (syms(i) == a && syms(i + 1) == b) {
              syms(i) = a + b
              syms.remove(i + 1)
            } else i += 1
          }
        }
        merges += 1
      }
    }
    new BpeVocab(vocab.toArray)
  }
}

/** Codegen'd greedy-BPE token count of a string column (see [[BpeVocab]]).
  * Null in → null out, like the rest of the expression family; `coalesce`
  * to 0 upstream when packing. */
case class BpeSegmentCount(child: Expression, bc: Broadcast[BpeVocab])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"BpeSegmentCount expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    bc.value.countText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeVocab", bc,
      "org.apache.spark.broadcast.Broadcast")
    defineCodeGen(ctx, ev, v =>
      s"((graft.functions.BpeVocab) $ref.value()).countText($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeSegmentCount =
    copy(child = newChild)
}

object Bpe {
  import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}

  /** Column form: token count of `c` under `vocab` (lowercase upstream if
    * the vocabulary is lowercase). */
  def segmentCount(spark: SparkSession, vocab: Seq[String])(c: Column): Column = {
    val bc = spark.sparkContext.broadcast(new BpeVocab(vocab.toArray))
    GraftSqlBridge.column(BpeSegmentCount(GraftSqlBridge.expression(c), bc))
  }

  /** Column form against an already-broadcast vocabulary (reuse across
    * many expressions/queries without re-broadcasting). */
  def segmentCount(bc: Broadcast[BpeVocab])(c: Column): Column =
    GraftSqlBridge.column(BpeSegmentCount(GraftSqlBridge.expression(c), bc))
}
