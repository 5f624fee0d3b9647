package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{coalesce, lit, udaf}

/** ROC AUC as a native mergeable Spark aggregate — the SQL-callable
  * form of [[graft.operators.ModelEval.aucRoc]] (`graft_auc`), so a
  * pure-SQL pipeline can grade a model per GROUP BY slice without the
  * Scala API.
  *
  * Same math, different plan shape: the relational form collapses rows
  * to per-distinct-score counts and walks ranks with a window; this
  * aggregate carries the SAME per-distinct-score histogram as its
  * mergeable buffer (score → (n, n_pos)), merged across partials by
  * pointwise sum, and runs the Mann-Whitney rank-sum walk at finish
  * time — ties by average rank, exactly the trapezoidal AUC. The two
  * forms agree to the shared 6-decimal rounding (differential-pinned
  * in SqlFunctionsSpec).
  *
  * Scale shape: map-side combine bounds the exchange at
  * `tasks × |score alphabet|` histogram entries, never rows. The
  * alphabet is capped at `maxScores` per buffer with a loud failure
  * naming `round(score, 6)` — the same enforced discipline as
  * `spark.graft.modelEvalScoreLimit` on the relational walk (a raw
  * continuous score would otherwise grow the buffer ≈ group size).
  * Null score or null label rows are excluded (a model that abstained
  * can't be graded on the row); NaN scores are excluded with them.
  * Degenerate groups (no positives or no negatives) read a null auc.
  *
  * Ref parity note: no reference equivalent; completes the model-eval
  * tier's SQL parity (r11 verdict item #6).
  */
object AucAgg {

  /** `n_pos | n_neg | auc` — field-parity with ModelEval.aucRoc. */
  case class AucResult(n_pos: Long, n_neg: Long, auc: Option[Double])

  /** Mergeable per-distinct-score histogram: score → [n, nPos]. */
  final class Hist(val maxScores: Int) extends Serializable {
    val counts = new java.util.HashMap[java.lang.Double, Array[Long]]()

    def add(s: Double, pos: Boolean): Unit = {
      // normalize -0.0 to 0.0: java.lang.Double.equals distinguishes the
      // two while Spark's groupBy (and the relational walk it must match)
      // normalizes them into one group — without this, a frame holding
      // both zeros gets two tie-groups here but one in ModelEval.aucRoc
      val key = java.lang.Double.valueOf(if (s == 0.0) 0.0 else s)
      var c = counts.get(key)
      if (c == null) {
        if (counts.size >= maxScores)
          throw new IllegalStateException(
            s"graft_auc: more than $maxScores distinct score values in " +
              "one group - quantize the score (e.g. round(score, 6)) or " +
              "raise the maxScores argument")
        c = new Array[Long](2)
        counts.put(key, c)
      }
      c(0) += 1L
      if (pos) c(1) += 1L
    }

    def merge(o: Hist): Hist = {
      val it = o.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        var c = counts.get(e.getKey)
        if (c == null) {
          if (counts.size >= maxScores)
            throw new IllegalStateException(
              s"graft_auc: more than $maxScores distinct score values " +
                "in one group - quantize the score (e.g. round(score, " +
                "6)) or raise the maxScores argument")
          c = new Array[Long](2)
          counts.put(e.getKey, c)
        }
        c(0) += e.getValue()(0)
        c(1) += e.getValue()(1)
      }
      this
    }

    /** The Mann-Whitney rank-sum identity over the sorted alphabet —
      * term for term the relational walk's `__cum`/`__rs` columns,
      * summed in deterministic ascending-score order. */
    def result(): AucResult = {
      import scala.jdk.CollectionConverters._
      val scores = counts.keySet().asScala.toArray.map(_.doubleValue())
      java.util.Arrays.sort(scores)
      var cum = 0L
      var p = 0L
      var ng = 0L
      var r = 0.0
      scores.foreach { s =>
        val c = counts.get(java.lang.Double.valueOf(s))
        val n = c(0)
        val np = c(1)
        r += np * (cum.toDouble + (n.toDouble + 1.0) / 2.0)
        cum += n
        p += np
        ng += n - np
      }
      val auc =
        if (p == 0L || ng == 0L) None
        else Some(BigDecimal(
            (r - p.toDouble * (p.toDouble + 1.0) / 2.0)
              / (p.toDouble * ng.toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      AucResult(p, ng, auc)
    }
  }

  final class AucAggregator(maxScores: Int)
      extends Aggregator[(Double, Int, Boolean), Hist, AucResult] {
    require(maxScores > 0, "maxScores must be positive")
    override def zero: Hist = new Hist(maxScores)
    override def reduce(b: Hist, v: (Double, Int, Boolean)): Hist = {
      if (v._3 && !v._1.isNaN) b.add(v._1, v._2 == 1)
      b
    }
    override def merge(a: Hist, b: Hist): Hist = a.merge(b)
    override def finish(b: Hist): AucResult = b.result()
    override def bufferEncoder: Encoder[Hist] =
      org.apache.spark.sql.Encoders.kryo[Hist]
    override def outputEncoder: Encoder[AucResult] =
      ExpressionEncoder[AucResult]()
  }

  /** Aggregation column: `struct<n_pos, n_neg, auc>` of the group.
    * Composes with any `groupBy` (the per-slice fairness audit in one
    * SQL clause). */
  def aucAgg(score: Column, label: Column,
      maxScores: Int = 1 << 20): Column =
    udaf(new AucAggregator(maxScores)).apply(
      // null/NaN handling rides a validity flag: a null label must be
      // EXCLUDED, not counted as negative (label values are arbitrary
      // ints — a -1 sentinel would collide with a real -1 label)
      coalesce(score.cast("double"), lit(Double.NaN)),
      coalesce(label.cast("int"), lit(0)),
      score.isNotNull && label.isNotNull)
}
