package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries frequent-items ("heavy hitters") sketch as a native
  * mergeable Spark aggregate (Misra & Gries 1982; merge rule from
  * Agarwal et al. 2012, "Mergeable Summaries").
  *
  * The 100 TB question this answers: "what are the hot domains / tokens /
  * n-grams?" WITHOUT a full `groupBy(key)` — a corpus-wide groupBy
  * shuffles the entire key universe (billions of distinct URLs or grams),
  * while this sketch map-side combines into a capacity-bounded buffer, so
  * the exchange carries `tasks × capacity` counter rows no matter how
  * many distinct keys the data holds. One pass, no sort, no second scan.
  *
  * Guarantees (classic MG, preserved exactly under merge):
  *   - every reported counter `c` bounds its item's true weight as
  *     `count_min = c <= true <= c + err = count_max` where `err` is the
  *     sketch's accumulated decrement mass;
  *   - `err <= totalWeight / (capacity + 1)`, so ANY item whose true
  *     weight exceeds `totalWeight / (capacity + 1)` is guaranteed to
  *     survive and be reported (given `k` large enough to emit it).
  * When `capacity >=` the number of distinct items seen, no decrement
  * ever fires: counts are EXACT (`count_min == count_max`) and the
  * result is deterministic under any partitioning / merge order — the
  * regime the DuckDB oracle pins. In the sketchy regime the REPORTED
  * BOUNDS still hold on every run, but counter values may vary with
  * Spark's nondeterministic partial-aggregation order (property-tested).
  *
  * Weighted: `add(item, w)` treats an occurrence as `w` units (e.g. a
  * domain weighted by its documents' token counts). Weights must be
  * non-negative; null items and null/zero weights are ignored.
  *
  * Ref parity note: the reference has no sketch aggregates; this extends
  * the profiling family per the training-data-ops mandate (SURVEY §2
  * addendum), alongside `Profile.table`'s HLL cardinality option.
  */
object FreqItems {

  /** One reported heavy hitter; `count_min <= true <= count_max`. */
  case class FreqItem(item: String, count_min: Long, count_max: Long)

  /** The mergeable summary: at most `capacity` live counters, plus the
    * decrement mass `err` and the processed weight `total`. */
  final class Sketch(val capacity: Int) extends Serializable {
    // values are EXPLICITLY boxed java.lang.Long: with scala.Long the
    // compiler unboxes a missing key's null to 0 and `cur != null` folds
    // to constant true, so the shrink branch never runs and the "sketch"
    // silently degrades to an unbounded exact map — counts stay right,
    // but every partial buffer ships the full per-task key universe
    // (caught by the ×30 shuffle-bytes measurement; pinned by the
    // capacity-invariant test)
    val counts = new java.util.HashMap[String, java.lang.Long](capacity * 2)
    var err: Long = 0L
    var total: Long = 0L

    def add(item: String, w: Long): Unit = {
      total += w
      val cur = counts.get(item)
      if (cur != null) counts.put(item, cur.longValue() + w)
      else if (counts.size < capacity) counts.put(item, w)
      else {
        // insert then shrink back to capacity: subtract the (capacity+1)-th
        // largest counter value from every counter and drop the non-positive
        // ones — with a single insert that value is the minimum counter
        counts.put(item, w)
        shrink()
      }
    }

    /** Restore the capacity invariant after an insert or a merge: subtract
      * the (capacity+1)-th largest counter from all counters, pruning
      * non-positives (at least one entry dies). Mergeable-summaries rule —
      * the decrement mass accumulates into `err`, keeping the
      * `[count_min, count_max]` envelope valid after any merge tree. */
    private def shrink(): Unit = {
      if (counts.size <= capacity) return
      val vals = new Array[Long](counts.size)
      val it0 = counts.values().iterator()
      var i = 0
      while (it0.hasNext) { vals(i) = it0.next().longValue(); i += 1 }
      java.util.Arrays.sort(vals)
      // (capacity+1)-th largest = index size-1-capacity in ascending order
      val dec = vals(vals.length - 1 - capacity)
      err += dec
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue.longValue() - dec
        if (nv <= 0L) it.remove() else e.setValue(java.lang.Long.valueOf(nv))
      }
    }

    def merge(o: Sketch): Sketch = {
      err += o.err
      total += o.total
      val it = o.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cur = counts.get(e.getKey)
        counts.put(e.getKey,
          (if (cur == null) 0L else cur.longValue()) + e.getValue.longValue())
      }
      shrink()
      this
    }

    /** Deterministic top-k render: (count desc, item asc), each with its
      * true-count envelope. */
    def topK(k: Int): Seq[FreqItem] = {
      import scala.jdk.CollectionConverters._
      counts.entrySet().asScala.toSeq
        .map(e => FreqItem(e.getKey, e.getValue.longValue(),
          e.getValue.longValue() + err))
        .sortWith { (a, b) =>
          // count desc, then code-point order == UTF-8 byte order: the
          // tie-break DuckDB's ORDER BY item applies (JVM String order
          // diverges on supplementary characters)
          a.count_min > b.count_min || (a.count_min == b.count_min &&
            CodePointOrder.cpCompare(a.item, b.item) < 0)
        }
        .take(k)
    }
  }

  final class FreqItemsAggregator(capacity: Int, k: Int)
      extends Aggregator[(String, Long), Sketch, Seq[FreqItem]] {
    require(capacity > 0, "capacity must be positive")
    require(k > 0 && k <= capacity, "k must be in [1, capacity]")
    override def zero: Sketch = new Sketch(capacity)
    override def reduce(b: Sketch, v: (String, Long)): Sketch = {
      if (v._1 != null) {
        require(v._2 >= 0L, s"freqItems: negative weight ${v._2}")
        if (v._2 > 0L) b.add(v._1, v._2)
      }
      b
    }
    override def merge(a: Sketch, b: Sketch): Sketch = a.merge(b)
    override def finish(b: Sketch): Seq[FreqItem] = b.topK(k)
    override def bufferEncoder: Encoder[Sketch] =
      org.apache.spark.sql.Encoders.kryo[Sketch]
    override def outputEncoder: Encoder[Seq[FreqItem]] =
      ExpressionEncoder[Seq[FreqItem]]()
  }

  /** One raw counter of a rendered sketch state. */
  case class SketchCounter(item: String, cnt: Long)

  /** A sketch's full mergeable state, rendered: every live counter plus
    * the decrement mass and processed weight. Two summaries merge by
    * counter-sum + err-sum (optionally re-shrinking) — the persistence
    * format for incremental / streaming heavy hitters. */
  case class SketchSummary(counters: Seq[SketchCounter], err: Long, total: Long)

  final class FreqSketchAggregator(capacity: Int)
      extends Aggregator[(String, Long), Sketch, SketchSummary] {
    require(capacity > 0, "capacity must be positive")
    override def zero: Sketch = new Sketch(capacity)
    override def reduce(b: Sketch, v: (String, Long)): Sketch = {
      if (v._1 != null) {
        require(v._2 >= 0L, s"freqSketch: negative weight ${v._2}")
        if (v._2 > 0L) b.add(v._1, v._2)
      }
      b
    }
    override def merge(a: Sketch, b: Sketch): Sketch = a.merge(b)
    override def finish(b: Sketch): SketchSummary = {
      import scala.jdk.CollectionConverters._
      SketchSummary(
        b.counts.entrySet().asScala.toSeq
          .map(e => SketchCounter(e.getKey, e.getValue.longValue()))
          .sortWith { (a, b) =>
            a.cnt > b.cnt || (a.cnt == b.cnt &&
              CodePointOrder.cpCompare(a.item, b.item) < 0)
          },
        b.err, b.total)
    }
    override def bufferEncoder: Encoder[Sketch] =
      org.apache.spark.sql.Encoders.kryo[Sketch]
    override def outputEncoder: Encoder[SketchSummary] =
      ExpressionEncoder[SketchSummary]()
  }

  /** Aggregation column rendering the FULL sketch state
    * (`struct<counters: array<struct<item, cnt>>, err, total>`) instead
    * of a top-k cut — what a persistent store keeps so later batches can
    * keep merging. */
  def freqSketchAgg(item: Column, weight: Column, capacity: Int): Column =
    udaf(new FreqSketchAggregator(capacity))
      .apply(item, org.apache.spark.sql.functions.coalesce(
        weight.cast("long"), org.apache.spark.sql.functions.lit(0L)))

  /** Aggregation column: top-`k` heavy hitters of string column `item`
    * (weighted by `weight` units each) under a `capacity`-counter
    * Misra–Gries sketch. Returns `array<struct<item, count_min,
    * count_max>>` sorted (count desc, item asc). Composes with any
    * `groupBy` — per-group sketches merge map-side like every aggregate. */
  def freqItemsAgg(item: Column, weight: Column, capacity: Int, k: Int): Column =
    // NULL weights coalesce to 0 (= ignored) BEFORE the typed encoder:
    // the (String, Long) input encoder's primitive _2 field would throw
    // AssertNotNull on a null weight otherwise, contradicting the
    // null-handling contract above
    udaf(new FreqItemsAggregator(capacity, k))
      .apply(item, org.apache.spark.sql.functions.coalesce(
        weight.cast("long"), org.apache.spark.sql.functions.lit(0L)))

  /** Unweighted form: every occurrence counts 1. */
  def freqItemsAgg(item: Column, capacity: Int, k: Int): Column =
    freqItemsAgg(item, org.apache.spark.sql.functions.lit(1L), capacity, k)
}
