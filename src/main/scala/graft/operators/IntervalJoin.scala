package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range-containment) join: point rows × interval rows with equal
  * keys and `lo <= pt <= hi` — sessionization, event-in-window labeling,
  * time-range feature attachment. Stock Spark plans a range condition as
  * BroadcastNestedLoopJoin (or a per-key explode if rewritten by hand);
  * both collapse at scale.
  *
  * Spark-first shape: quantize the timeline into fixed-width bins. Each
  * interval is exploded to the bins it covers; each point computes its ONE
  * bin; an ordinary equi-join on (keys, bin) + the exact residual predicate
  * does the rest — hash join, AQE, skew handling all apply. A (point,
  * interval) match is found exactly once (in the point's bin), so no
  * dedup pass is needed. Explode fan-out is `interval_len / binWidth + 1`
  * rows per interval: pick binWidth near the typical interval length.
  */
object IntervalJoin {

  /** Attach interval payload columns to every contained point (inner join;
    * points in no interval drop, points in k intervals appear k times).
    *
    * `ptCol`/`loCol`/`hiCol` may be integral OR timestamp columns —
    * timestamps are normalized to epoch-micros internally ([[TimeCols]]),
    * so `binWidth` is in MICROSECONDS for them. Doubles are rejected (bin
    * arithmetic needs exact integer division; doubles lose exactness past
    * 2^53). Keys equal across both sides; `valueCols` are interval-side
    * columns to attach and must not collide with point columns. Null
    * timestamps/bounds never match (SQL comparison rules).
    */
  def joinPointsToIntervals(
      points: DataFrame,
      intervals: DataFrame,
      keyCols: Seq[String],
      ptCol: String,
      loCol: String,
      hiCol: String,
      binWidth: Long,
      valueCols: Seq[String],
      maxBinsPerInterval: Long = 1L << 20): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    TimeCols.requireSameTimeline(
      (points, ptCol), (intervals, loCol), (intervals, hiCol))
    val collisions =
      (valueCols.toSet ++ Set(loCol, hiCol)).intersect(points.columns.toSet)
    require(collisions.isEmpty,
      s"interval-side columns collide with point columns: ${collisions.mkString(", ")}")

    // integral `div` keeps bin ids exact where floor(double) would not.
    // div truncates toward zero (≠ floor for negatives), but correctness
    // only needs MONOTONICITY: lo <= pt <= hi ⇒ their bin ids are ordered,
    // so the point's bin is always inside the interval's exploded bin range
    // — negative timestamps work, bin 0 is merely twice as wide.
    // All arithmetic AND the residual predicate run on the numeric
    // (epoch-micros for timestamps) view — one shared monotonic timeline
    // even when the two sides carry different timestamp flavors.
    val p = points
      .withColumn("__ptn", TimeCols.numericFor(points, ptCol))
      .withColumn("__bin", expr(s"__ptn div ${binWidth}L"))
    // fan-out guard INSIDE the plan (no extra pre-validation job): a single
    // outlier interval spanning more than maxBinsPerInterval bins would
    // otherwise either blow up Spark's max array length with an opaque
    // "too long sequence" error or silently explode the join input;
    // raise_error names the knob to turn instead (r3 advice)
    val spanBins =
      expr(s"(__hin div ${binWidth}L) - (__lon div ${binWidth}L) + 1")
    val binsOrError = when(spanBins <= lit(maxBinsPerInterval),
        expr(s"sequence(__lon div ${binWidth}L, __hin div ${binWidth}L)"))
      .otherwise(raise_error(concat(
        lit(s"interval spans more than $maxBinsPerInterval bins at " +
          s"binWidth=$binWidth: ["), col(loCol).cast("string"), lit(", "),
        col(hiCol).cast("string"),
        lit("] — raise binWidth (or maxBinsPerInterval)"))))
    val iv = intervals
      .where(col(loCol).isNotNull && col(hiCol).isNotNull && col(loCol) <= col(hiCol))
      .select((keyCols ++ Seq(loCol, hiCol) ++ valueCols).distinct.map(col): _*)
      .withColumn("__lon", TimeCols.numericFor(intervals, loCol))
      .withColumn("__hin", TimeCols.numericFor(intervals, hiCol))
      .withColumn("__bin", explode(binsOrError))

    p.join(iv, keyCols :+ "__bin")
      .where(col("__ptn") >= col("__lon") && col("__ptn") <= col("__hin"))
      .drop("__bin", "__ptn", "__lon", "__hin")
      .drop(Seq(loCol, hiCol).filterNot(valueCols.contains)
        .filterNot(points.columns.contains): _*)
  }
}
