package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Time-grid resampling with last-observation-carried-forward: turn an
  * irregular event/measurement stream into one row per (key, grid tick),
  * each carrying the most recent observation in or before that tick —
  * the "regularize before feature extraction / training" step every
  * time-series pipeline needs and no SQL engine ships as one operator.
  * (pandas `resample().last().ffill()` semantics: a tick labeled `t`
  * covers `[t, t + step)`, and an observation is visible from its own
  * tick onward.)
  *
  * Scale shape — composed entirely from this library's own scale-shaped
  * parts, no new shuffle patterns:
  *   1. Per-key tick range: ONE map-side-combined min/max aggregate over
  *      (key) — the grid frame is one row per key before expansion.
  *   2. Grid expansion: `explode(sequence(first_tick, last_tick))` on
  *      that per-key frame. The produced row count IS the output size
  *      (unavoidable — it's the deliverable); an in-plan `raise_error`
  *      guard refuses a key whose span/step exceeds `maxTicksPerKey`
  *      BEFORE the explode materializes it (the
  *      [[Sampling.weightedSample]] guard discipline), because one
  *      mis-keyed row spanning years at millisecond step would otherwise
  *      OOM an executor.
  *   3. Observation compaction: per (key, tick) keep only the LAST
  *      observation — a `max(struct)` aggregate with map-side combine,
  *      so the as-of side carries at most one row per occupied tick,
  *      never the raw event volume.
  *   4. LOCF: [[AsOfJoin.asOf]] backward ON THE TICK INDEX (union + one
  *      in-partition window, join-free, null-key/null-ts SQL semantics
  *      proven there), optionally staleness-bounded via `maxGapTicks`.
  *
  * Ticks are `floor(ts / step)` in exact long arithmetic for integral
  * timelines (the [[Rolling]] bucketing discipline); timestamps
  * normalize to epoch-micros, so `step` is in MICROSECONDS for time
  * columns ([[TimeCols]] contract). Grid tick timestamps render back to
  * the input's own temporal type.
  *
  * Ref parity note: the reference has no resampling operator; this
  * extends the time-series family (as-of, interval, sessionize, rolling)
  * per the training-data-ops mandate (SURVEY §2 addendum).
  */
object Resample {

  /** @param df           observations (irregular)
    * @param keyCols      series identity; null-key rows are dropped (SQL
    *                     join semantics — they belong to no series)
    * @param tsCol        event time (timestamp or numeric)
    * @param step         grid width in timeline units (µs for timestamps)
    * @param valueCols    observation columns to carry forward
    * @param maxGapTicks  max staleness in ticks: a tick only carries an
    *                     observation at most this many ticks back
    *                     (0 = same-tick only; None = carry forever).
    *                     Ticks past the window render null values —
    *                     "gap too old to fill"
    * @param maxTicksPerKey in-plan guard against runaway grids
    * @param gridTsName   output column holding the tick's start time
    * @param obsTsName    if non-empty, also expose the matched
    *                     observation's own timestamp under this name
    */
  def gridLocf(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      step: Long,
      valueCols: Seq[String],
      maxGapTicks: Option[Long] = None,
      maxTicksPerKey: Long = 1L << 20,
      gridTsName: String = "grid_ts",
      obsTsName: String = ""): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(step > 0, "step must be positive")
    require(maxTicksPerKey > 0, "maxTicksPerKey must be positive")
    require(maxGapTicks.forall(_ >= 0), "maxGapTicks must be >= 0")
    require(valueCols.nonEmpty, "at least one value column required")
    val reserved = Set("__ts", "__tick", "__obs", "__obsts", gridTsName)
    require(!df.columns.exists(reserved), "input columns may not use " +
      s"the reserved names ${reserved.mkString("/")}")
    val tsType = df.schema(tsCol).dataType
    val tsN = TimeCols.numericFor(df, tsCol)
    val integralTimeline = TimeCols.isTimeType(tsType) ||
      Set[org.apache.spark.sql.types.DataType](
        ByteType, ShortType, IntegerType, LongType).contains(tsType)
    // Exact floor(ts / step) (the [[Rolling]] bucketing discipline):
    // pmod is non-negative, so the numerator is the exact floor multiple;
    // the division runs in DECIMAL (a long `/` would promote to double
    // and misbucket timelines above 2^53) and casts back losslessly.
    def tick(c: Column): Column =
      if (integralTimeline)
        ((c - pmod(c, lit(step))).cast("decimal(38,0)") / lit(step))
          .cast("long")
      else floor(c / lit(step)).cast("long")

    val obs = df
      .where(col(tsCol).isNotNull && keyCols.map(col(_).isNotNull).reduce(_ && _))
      .withColumn("__ts", tsN)
    // (3) comes first in the plan: one surviving observation per occupied
    // tick — latest ts wins, ties by greatest payload (the asOf tie rule,
    // made explicit so the compacted side is deterministic on any
    // partitioning). The per-key span (1) derives from THIS compacted
    // frame, not the raw input, so observations are scanned once and the
    // materialization covers both consumers (span/grid branch + as-of
    // side). localCheckpoint, not persist: the result is returned lazily
    // so no unpersist hook exists — checkpoint blocks are the same
    // MEMORY_AND_DISK, lineage-cut, and ContextCleaner-reclaimed once
    // the frame is unreachable instead of pinning the cache until LRU
    // eviction (r9 advice; the minhashCrossPairs discipline).
    val compacted = obs
      .groupBy((keyCols.map(col) :+ tick(col("__ts")).as("__tick")): _*)
      .agg(max(struct((col("__ts") +: valueCols.map(col)): _*)).as("__obs"))
      .select(keyCols.map(col) ++
        Seq(col("__tick"), col("__obs.__ts").as("__obsts")) ++
        valueCols.map(c => col(s"__obs.$c").as(c)): _*)
      .localCheckpoint()
    // (1) per-key tick span; (2) guarded grid expansion
    val span = compacted.groupBy(keyCols.map(col): _*)
      .agg(min(col("__tick")).as("__lo"), max(col("__tick")).as("__hi"))
    val guarded = span.withColumn("__hi",
      when(col("__hi") - col("__lo") < lit(maxTicksPerKey), col("__hi"))
        .otherwise(raise_error(concat(
          lit(s"gridLocf: key span exceeds maxTicksPerKey=$maxTicksPerKey " +
            s"ticks at step=$step — key: "),
          concat_ws(",", keyCols.map(c => col(c).cast("string")): _*)))))
    val grid = guarded
      .select(keyCols.map(col) :+
        explode(sequence(col("__lo"), col("__hi"))).as("__tick"): _*)
    // (4) LOCF = backward as-of join on the TICK index: an observation is
    // visible from its own tick onward, staleness counts whole ticks
    val joined = AsOfJoin.asOf(
      left = grid,
      right = compacted,
      keyCols = keyCols,
      leftTsCol = "__tick",
      rightTsCol = "__tick",
      valueCols = "__obsts" +: valueCols,
      direction = "backward",
      tolerance = maxGapTicks)
    val gridOut = TimeCols.fromMicros(col("__tick") * lit(step), tsType)
      .as(gridTsName)
    val obsOut =
      if (obsTsName.nonEmpty)
        Seq(TimeCols.fromMicros(col("__obsts"), tsType).as(obsTsName))
      else Nil
    joined.select(keyCols.map(col) ++ Seq(gridOut) ++
      valueCols.map(col) ++ obsOut: _*)
  }
}
