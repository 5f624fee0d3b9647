package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

import scala.collection.mutable.ArrayBuffer

/** Mergeable quantile sketch as a native Spark aggregate: a compactor
  * stack in the KLL family (Karnin, Lang & Liberty 2016) with uniform
  * per-level capacity and DERANDOMIZED alternating compaction offsets
  * (the Munro–Paterson / Manku–Rajagopalan–Lindsay discipline), so the
  * sketch needs no random source inside an aggregate buffer.
  *
  * The 100 TB question this answers: "what are the p50/p90/p99 of doc
  * length / quality score / token count PER SHARD or per group, and can
  * I fold yesterday's summary into today's?" `percentile_cont` is exact
  * but needs every value of a group collected into one aggregation
  * buffer (Spark's `percentile` holds an in-memory map of the whole
  * value multiset — unbounded on a 100 TB column); this sketch is
  * capacity-bounded: each aggregation buffer holds at most
  * `k × ceil(log2(n/k))` doubles no matter how many rows flow in, the
  * exchange ships that bounded state, and two summaries MERGE — the
  * property percentile_cont fundamentally lacks and the one that lets a
  * petabyte profile run as one map-side-combined pass or accumulate
  * across daily epochs.
  *
  * Mechanics: level `i` holds items each representing `2^i` original
  * rows. Rows append to level 0; a level that overflows `k` sorts and
  * keeps alternate items (offset flips per compaction — deterministic),
  * promoting the survivors to level `i+1`. Merge concatenates level-wise
  * then re-compacts overflowing levels. Quantile render walks the
  * weight-sorted survivors: `quantile(q)` = the smallest item whose
  * cumulative weight reaches `q × N` — exactly DuckDB/Postgres
  * `quantile_disc`/`percentile_disc` semantics, which makes the exact
  * regime oracle-able bit-for-bit.
  *
  * Regimes (the [[FreqItems]] discipline):
  *   - EXACT when a group's row count `n <= k`: no compaction ever
  *     fires anywhere in the merge tree (any sub-buffer holds <= n
  *     items), every value survives at weight 1, and the result equals
  *     the exact discrete quantile under ANY partitioning — the regime
  *     the DuckDB oracle pins.
  *   - SKETCHY when `n > k`: the classic rank guarantee is
  *     `|rank_est - rank_true| <= eps * n` with `eps = O(log2(n/k)/k)`
  *     for the uniform-capacity stack; results may vary with Spark's
  *     partial-aggregation order (compaction outcomes depend on buffer
  *     contents), so specs assert the rank ENVELOPE, not values.
  *
  * Nulls and NaNs are ignored (documented; NaN has no rank order).
  *
  * Ref parity note: the reference has no sketch aggregates; this extends
  * the profiling family per the training-data-ops mandate (SURVEY §2
  * addendum) alongside the Misra–Gries heavy hitters and HLL counts.
  */
object Kll {

  /** One rendered quantile: `value` is an actual data point whose rank
    * is within the sketch's error of `prob × n` (exact in the exact
    * regime). */
  case class QuantileEst(prob: Double, value: Double)

  /** One row of a sketch's full mergeable state: an item at a level
    * (weight `2^level`) — the persistence grain for incremental /
    * streaming quantiles. `n` rides along only on the first row. */
  case class SketchItem(level: Int, value: Double)

  /** A sketch's full state, rendered for persistence: every surviving
    * item with its level, plus the processed row count. Re-ingesting
    * each item at its level ([[Sketch.addAtLevel]]) reconstructs an
    * equivalent summary — the store format for epoch-merged profiles. */
  case class SketchSummary(items: Seq[SketchItem], n: Long)

  /** The mergeable compactor stack. Level 0 is an unsorted append
    * buffer; compaction sorts in place. Capacity `k` per level. */
  final class Sketch(val k: Int) extends Serializable {
    require(k >= 8, "k must be >= 8")
    var levels: ArrayBuffer[ArrayBuffer[Double]] =
      ArrayBuffer(new ArrayBuffer[Double](16))
    // per-level offset flip bits (derandomized compaction)
    var flips: ArrayBuffer[Boolean] = ArrayBuffer(false)
    var n: Long = 0L

    def add(v: Double): Unit = addAtLevel(0, v)

    /** Ingest an item carrying weight `2^level` directly — how a stored
      * summary re-enters a sketch (and how merge could be expressed). */
    def addAtLevel(level: Int, v: Double): Unit = {
      while (levels.length <= level) {
        levels += new ArrayBuffer[Double](16)
        flips += false
      }
      levels(level) += v
      n += (1L << level)
      if (levels(level).length > k) compact(level)
    }

    /** Sort the overflowing level, keep alternate items (offset flips
      * each compaction), promote survivors one level up; cascade. */
    private def compact(level: Int): Unit = {
      var i = level
      while (i < levels.length && levels(i).length > k) {
        val buf = levels(i)
        val arr = buf.toArray
        java.util.Arrays.sort(arr)
        val off = if (flips(i)) 1 else 0
        flips(i) = !flips(i)
        buf.clear()
        if (i + 1 >= levels.length) {
          levels += new ArrayBuffer[Double](16)
          flips += false
        }
        val up = levels(i + 1)
        var j = off
        while (j < arr.length) { up += arr(j); j += 2 }
        // an ODD-length buffer with offset 0 promotes one extra half-row
        // of weight; with offset 1 one less. The flip alternation cancels
        // the bias in expectation (MRL); n tracks TRUE rows, not the
        // post-compaction weight sum, so renders divide by the real count.
        i += 1
      }
    }

    def merge(o: Sketch): Sketch = {
      var i = 0
      while (i < o.levels.length) {
        val src = o.levels(i)
        if (src.nonEmpty) {
          while (levels.length <= i) {
            levels += new ArrayBuffer[Double](16)
            flips += false
          }
          levels(i) ++= src
        }
        i += 1
      }
      n += o.n
      // re-establish the capacity invariant bottom-up
      var l = 0
      while (l < levels.length) {
        if (levels(l).length > k) compact(l)
        l += 1
      }
      this
    }

    /** All surviving (value, weight) pairs, value-sorted. */
    private def weighted(): Array[(Double, Long)] = {
      val out = new ArrayBuffer[(Double, Long)](levels.map(_.length).sum)
      var i = 0
      while (i < levels.length) {
        val w = 1L << i
        levels(i).foreach(v => out += ((v, w)))
        i += 1
      }
      out.sortBy(_._1).toArray
    }

    /** `quantile_disc` walk: smallest item whose cumulative weight
      * reaches `ceil(q * W)` over the SURVIVOR weight mass `W` (equals
      * the true row count in the exact regime; within the rank bound of
      * it otherwise). `q = 0` renders the minimum survivor. */
    def quantiles(probs: Seq[Double]): Seq[QuantileEst] = {
      val pairs = weighted()
      if (pairs.isEmpty) return probs.map(QuantileEst(_, Double.NaN))
      val total = pairs.map(_._2).sum
      probs.map { q =>
        val target = math.max(1L, math.ceil(q * total).toLong)
        var cum = 0L
        var i = 0
        var ans = pairs(pairs.length - 1)._1
        var done = false
        while (i < pairs.length && !done) {
          cum += pairs(i)._2
          if (cum >= target) { ans = pairs(i)._1; done = true }
          i += 1
        }
        QuantileEst(q, ans)
      }
    }

    /** Cumulative survivor-mass fraction at or below each probe value
      * (`value <= x`), over the survivor weight mass — the rank side of
      * the sketch (exact in the exact regime, within the rank envelope
      * otherwise). Probes must be ascending for one walk; unsorted input
      * is handled by sorting probes and un-permuting the answer. */
    def fractionsAtOrBelow(xs: Seq[Double]): Seq[Double] = {
      val pairs = weighted()
      if (pairs.isEmpty) return xs.map(_ => 0.0)
      val total = pairs.map(_._2).sum.toDouble
      val order = xs.zipWithIndex.sortBy(_._1)
      val out = new Array[Double](xs.length)
      var cum = 0L
      var i = 0
      order.foreach { case (x, pos) =>
        while (i < pairs.length && pairs(i)._1 <= x) { cum += pairs(i)._2; i += 1 }
        out(pos) = cum / total
      }
      out.toSeq
    }

    /** Discrete median and MAD (median absolute deviation) from ONE
      * sketch: the median is the usual `quantile_disc` walk; the MAD is
      * the weighted median of `|survivor - median|` — the residual
      * transform is monotone on each side of the median, so the
      * survivors' rank error carries through (~2x the envelope) without
      * a SECOND data pass. Exact (= the discrete median of the true
      * residual multiset) in the exact regime. */
    def medianAbsDev(): (Double, Double) = {
      val pairs = weighted()
      if (pairs.isEmpty) return (Double.NaN, Double.NaN)
      val m = quantiles(Seq(0.5)).head.value
      val resid = pairs.map { case (v, w) => (math.abs(v - m), w) }
        .sortBy(_._1)
      val total = resid.map(_._2).sum
      val target = math.max(1L, math.ceil(0.5 * total).toLong)
      var cum = 0L
      var i = 0
      var ans = resid(resid.length - 1)._1
      var done = false
      while (i < resid.length && !done) {
        cum += resid(i)._2
        if (cum >= target) { ans = resid(i)._1; done = true }
        i += 1
      }
      (m, ans)
    }

    def summary(): SketchSummary = {
      val items = new ArrayBuffer[SketchItem]()
      var i = 0
      while (i < levels.length) {
        // sorted render: deterministic row order for stores/tests
        levels(i).sorted.foreach(v => items += SketchItem(i, v))
        i += 1
      }
      SketchSummary(items.toSeq, n)
    }
  }

  final class KllQuantilesAggregator(k: Int, probs: Seq[Double])
      extends Aggregator[Double, Sketch, Seq[QuantileEst]] {
    require(probs.nonEmpty, "probs must be non-empty")
    require(probs.forall(p => p >= 0.0 && p <= 1.0),
      s"probs must be in [0, 1]: $probs")
    override def zero: Sketch = new Sketch(k)
    override def reduce(b: Sketch, v: Double): Sketch = {
      if (!v.isNaN) b.add(v)
      b
    }
    override def merge(a: Sketch, b: Sketch): Sketch = a.merge(b)
    override def finish(b: Sketch): Seq[QuantileEst] = b.quantiles(probs)
    override def bufferEncoder: Encoder[Sketch] =
      org.apache.spark.sql.Encoders.kryo[Sketch]
    override def outputEncoder: Encoder[Seq[QuantileEst]] =
      ExpressionEncoder[Seq[QuantileEst]]()
  }

  final class KllSketchAggregator(k: Int)
      extends Aggregator[Double, Sketch, SketchSummary] {
    override def zero: Sketch = new Sketch(k)
    override def reduce(b: Sketch, v: Double): Sketch = {
      if (!v.isNaN) b.add(v)
      b
    }
    override def merge(a: Sketch, b: Sketch): Sketch = a.merge(b)
    override def finish(b: Sketch): SketchSummary = b.summary()
    override def bufferEncoder: Encoder[Sketch] =
      org.apache.spark.sql.Encoders.kryo[Sketch]
    override def outputEncoder: Encoder[SketchSummary] =
      ExpressionEncoder[SketchSummary]()
  }

  /** Re-merge aggregator over STORED summary rows: each input is
    * `(level, value)` and re-enters the stack at its level, so a view
    * over `epochs × (k log)` persisted rows rebuilds the merged sketch
    * distributively (map-side combined like any aggregate) — no driver
    * collect, no special merge path. */
  final class KllRemergeAggregator(k: Int, probs: Seq[Double])
      extends Aggregator[(Int, Double), Sketch, Seq[QuantileEst]] {
    require(probs.nonEmpty, "probs must be non-empty")
    override def zero: Sketch = new Sketch(k)
    override def reduce(b: Sketch, v: (Int, Double)): Sketch = {
      if (v._1 >= 0 && !v._2.isNaN) b.addAtLevel(v._1, v._2)
      b
    }
    override def merge(a: Sketch, b: Sketch): Sketch = a.merge(b)
    override def finish(b: Sketch): Seq[QuantileEst] = b.quantiles(probs)
    override def bufferEncoder: Encoder[Sketch] =
      org.apache.spark.sql.Encoders.kryo[Sketch]
    override def outputEncoder: Encoder[Seq[QuantileEst]] =
      ExpressionEncoder[Seq[QuantileEst]]()
  }

  /** One-pass robust location/scale: median AND MAD from a single
    * `k`-bounded sketch per group ([[Sketch.medianAbsDev]]) — the
    * trained side of the outlier gate without the exact path's
    * residual join (two full scans collapse to one bounded aggregate).
    * NaN (empty group) renders as null downstream via nanSafe guards. */
  final class KllRobustStatsAggregator(k: Int)
      extends Aggregator[Double, Sketch, (Double, Double)] {
    override def zero: Sketch = new Sketch(k)
    override def reduce(b: Sketch, v: Double): Sketch = {
      if (!v.isNaN) b.add(v)
      b
    }
    override def merge(a: Sketch, b: Sketch): Sketch = a.merge(b)
    override def finish(b: Sketch): (Double, Double) = b.medianAbsDev()
    override def bufferEncoder: Encoder[Sketch] =
      org.apache.spark.sql.Encoders.kryo[Sketch]
    override def outputEncoder: Encoder[(Double, Double)] =
      ExpressionEncoder[(Double, Double)]()
  }

  /** Aggregation column: `struct<_1: median, _2: mad>` under a
    * `k`-capacity stack, one data pass. */
  def robustStatsAgg(value: Column, k: Int): Column =
    udaf(new KllRobustStatsAggregator(k)).apply(nanSafe(value))

  /** Re-merge aggregator rendering the merged SKETCH STATE rather than
    * quantiles — the loader side of sketch-native drift: fold a store's
    * `(level, value)` rows back into one bounded summary that a driver
    * can walk for both quantiles (bin cuts) and ranks (bin masses). */
  final class KllRemergeSketchAggregator(k: Int)
      extends Aggregator[(Int, Double), Sketch, SketchSummary] {
    override def zero: Sketch = new Sketch(k)
    override def reduce(b: Sketch, v: (Int, Double)): Sketch = {
      if (v._1 >= 0 && !v._2.isNaN) b.addAtLevel(v._1, v._2)
      b
    }
    override def merge(a: Sketch, b: Sketch): Sketch = a.merge(b)
    override def finish(b: Sketch): SketchSummary = b.summary()
    override def bufferEncoder: Encoder[Sketch] =
      org.apache.spark.sql.Encoders.kryo[Sketch]
    override def outputEncoder: Encoder[SketchSummary] =
      ExpressionEncoder[SketchSummary]()
  }

  /** Aggregation column re-merging persisted `(level, value)` rows into
    * the full merged sketch state (`struct<items, n>`). NOTE: the
    * re-merged `n` counts survivor WEIGHT (each row re-enters at its
    * level), which equals the true row count only in the exact regime —
    * the epoch stores therefore persist the true per-epoch count in
    * their `n_rows` column and the count-rendering views sum THAT
    * (`Profile.trueCountPerKey`), never this field. */
  def remergeSketchAgg(level: Column, value: Column, k: Int): Column =
    udaf(new KllRemergeSketchAggregator(k)).apply(
      org.apache.spark.sql.functions.coalesce(
        level.cast("int"), org.apache.spark.sql.functions.lit(-1)),
      nanSafe(value))

  private def nanSafe(value: Column): Column =
    org.apache.spark.sql.functions.coalesce(
      value.cast("double"), org.apache.spark.sql.functions.lit(Double.NaN))

  /** Aggregation column: discrete quantiles of `value` at `probs` under
    * a `k`-capacity KLL stack. Returns `array<struct<prob, value>>`.
    * Composes with any `groupBy`; exact whenever the group has <= `k`
    * non-null rows. Nulls/NaNs ignored. */
  def quantilesAgg(value: Column, k: Int, probs: Seq[Double]): Column =
    udaf(new KllQuantilesAggregator(k, probs)).apply(nanSafe(value))

  /** Aggregation column rendering the FULL sketch state
    * (`struct<items: array<struct<level, value>>, n>`) for persistence. */
  def sketchAgg(value: Column, k: Int): Column =
    udaf(new KllSketchAggregator(k)).apply(nanSafe(value))

  /** Aggregation column re-merging persisted `(level, value)` rows back
    * into quantiles — the view side of an epoch store. */
  def remergeAgg(level: Column, value: Column, k: Int,
      probs: Seq[Double]): Column =
    udaf(new KllRemergeAggregator(k, probs)).apply(
      org.apache.spark.sql.functions.coalesce(
        level.cast("int"), org.apache.spark.sql.functions.lit(-1)),
      nanSafe(value))
}
