package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-entity rolling (trailing-window) features over an event timeline —
  * the feature-engineering step a training pipeline runs before
  * sessionization or packing: "this user's click count / mean value over
  * the last hour, and the gap since their previous event", one output row
  * per input event.
  *
  * Ref parity note: the reference has no window/rolling operator (its
  * engine delegates windowing to the host, SURVEY §2.5); this extends
  * the time-series family per the training-data-ops mandate.
  *
  * All Spark-native window frames, nothing custom: a RANGE frame on the
  * epoch-micros view of the timestamp (see [[TimeCols]] — `rangeBack` is
  * MICROSECONDS for timestamp columns, column units for numerics) for the
  * trailing aggregates, and a ROWS frame for previous-event features.
  * Catalyst evaluates all frames over one sort — the plan carries a single
  * per-key exchange+sort, not one per feature.
  *
  * Skew bound, same statement as [[Sessions.assign]]: [[trailingStats]]
  * sorts one key's whole history in one task. For a pathological hot key
  * (bot traffic = one hot user_id at 100 TB) use
  * [[trailingStatsBucketed]] — identical results, per-task work capped at
  * O(rows per time bucket): unlike dense session indexes, a trailing
  * RANGE aggregate needs cross-bucket ROWS (the trailing window spans
  * bucket edges), so each bucket's trailing `rangeBack` slice is
  * replicated into its successor before the bucketed window, and the
  * `prev_*` ROWS features resolve bucket-first rows through the compact
  * per-(key, occupied-bucket) last-event frame (the
  * [[Sessions.assignBucketed]] two-level scan).
  *
  * Determinism at ts ties: RANGE frames include ALL tied rows in each
  * other's trailing window (frame bounds are on the ORDER BY value), so
  * every aggregate is independent of intra-tie order; `prev_*` features
  * use a ROWS frame and therefore need a total order — `tieCols` (e.g.
  * the event id) breaks ties; it must make (key, ts, tieCols) unique for
  * `prev_*` to be deterministic.
  */
object Rolling {

  /** Append trailing-window features per key: count, sum and mean of
    * `valueCol` over `[ts - rangeBack, ts]` (RANGE frame — both bounds
    * inclusive, ties included on both sides), plus
    * `prev_value` (previous event's value) and `gap_micros` (time since
    * previous event; column units for numeric timelines, null for a key's
    * first event). Column names take `outPrefix`. */
  def trailingStats(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCol: String,
      rangeBack: Long,
      tieCols: Seq[String] = Nil,
      outPrefix: String = "roll_"): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(rangeBack > 0, "rangeBack must be positive")
    val tsN: Column = TimeCols.numericFor(df, tsCol)
    val keyed = Window.partitionBy(keyCols.map(col): _*)
    val range = keyed.orderBy(tsN)
      .rangeBetween(-rangeBack, Window.currentRow)
    val rows = keyed.orderBy(tsN +: tieCols.map(col): _*)
    val v = col(valueCol)
    df.withColumn(s"${outPrefix}cnt", count(v).over(range))
      .withColumn(s"${outPrefix}sum", sum(v).over(range))
      .withColumn(s"${outPrefix}avg", avg(v).over(range))
      .withColumn(s"${outPrefix}prev_value", lag(v, 1).over(rows))
      .withColumn(s"${outPrefix}gap", tsN - lag(tsN, 1).over(rows))
  }

  /** Skew-resistant bucketed [[trailingStats]]: same output, different
    * parallelism bound — the heavy windows partition by
    * (key, ts div bucketWidth), so one hot key costs O(rows per bucket)
    * per task instead of its whole history in one sort.
    *
    * Mechanics (two pieces, matching the two frame kinds):
    *  - RANGE aggregates (`cnt`/`sum`/`avg`): every row whose trailing
    *    window a successor-bucket row can see — the bucket's last
    *    `rangeBack` slice, `pmod(ts, width) >= width - rangeBack` — is
    *    replicated once into the next bucket as a frame-only carry row.
    *    `bucketWidth >= rangeBack` guarantees a trailing window spans at
    *    most two buckets, so ONE carry hop suffices; carry rows feed
    *    frames and are dropped before output. Worst-case row inflation is
    *    2× (at `bucketWidth == rangeBack`); wider buckets carry
    *    proportionally less and sort proportionally more per task.
    *  - ROWS features (`prev_value`/`gap`): a bucket's first row's
    *    predecessor may sit ANY number of empty buckets back, which no
    *    fixed carry reaches — so they resolve through the compact
    *    per-(key, occupied-bucket) last-event frame (one row per occupied
    *    bucket; the [[Sessions.assignBucketed]] pattern): an in-bucket
    *    `lag` covers every row but the bucket's first, which takes the
    *    previous occupied bucket's last event from the compact frame.
    *
    * Contract: rows must have a non-null timestamp (filter first — the
    * single-window form's null-ordering behavior is not replicated) and
    * `tieCols` must make (key, ts, tieCols) unique for deterministic
    * `prev_*`, as in [[trailingStats]]. Input/tie columns may not use the
    * reserved `__`-prefixed internal names (enforced). Null KEYS group
    * together, exactly as [[trailingStats]]'s window partitioning treats
    * them (the compact-frame join is null-safe). Pick `bucketWidth` so
    * one bucket holds a bounded slice of the hottest key's traffic. */
  def trailingStatsBucketed(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCol: String,
      rangeBack: Long,
      bucketWidth: Long,
      tieCols: Seq[String] = Nil,
      outPrefix: String = "roll_"): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(rangeBack > 0, "rangeBack must be positive")
    require(bucketWidth >= rangeBack,
      s"bucketWidth ($bucketWidth) must be >= rangeBack ($rangeBack) so a " +
        "trailing window spans at most two buckets")
    val reserved =
      Set("__gts", "__gb", "__carry", "__pv_l", "__pt_l", "__plast", "__v",
        "__last")
    require(!tieCols.exists(reserved),
      s"tieCols may not use the reserved names ${reserved.mkString("/")}")
    require(!df.columns.exists(reserved),
      s"input columns may not use the reserved names ${reserved.mkString("/")}")
    val tsN: Column = TimeCols.numericFor(df, tsCol)
    val v = col(valueCol)
    val wL = lit(bucketWidth)
    // Bucket id = floor(ts / width). For integral timelines (timestamps
    // normalize to epoch-micros; long/int numerics) this runs in LONG
    // arithmetic throughout: pmod is non-negative, so the numerator is the
    // exact floor multiple and SQL `div` (which truncates) agrees with
    // floor on it — a double `/` would round the quotient for timelines
    // above 2^53 (epoch-nanos) and misbucket rows near bucket edges.
    // Fractional timelines carry double precision by nature; plain
    // floor-divide is exact within it.
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val integralTimeline =
      TimeCols.isTimeType(df.schema(tsCol).dataType) ||
        Set[org.apache.spark.sql.types.DataType](
          ByteType, ShortType, IntegerType, LongType)
          .contains(df.schema(tsCol).dataType)
    val base = df.withColumn("__gts", tsN)
      .withColumn("__gb",
        if (integralTimeline)
          expr(s"(__gts - pmod(__gts, ${bucketWidth}L)) div ${bucketWidth}L")
        else floor(col("__gts") / wL).cast("long"))
    val gridCols = (keyCols :+ "__gb").map(col)
    // RANGE aggregates over originals ∪ one-hop carries
    val carry = base
      .where(pmod(col("__gts"), wL) >= lit(bucketWidth - rangeBack))
      .withColumn("__gb", col("__gb") + 1)
      .withColumn("__carry", lit(true))
    val union = base.withColumn("__carry", lit(false)).unionByName(carry)
    val wAgg = Window.partitionBy(gridCols: _*).orderBy(col("__gts"))
      .rangeBetween(-rangeBack, Window.currentRow)
    val agged = union
      .withColumn(s"${outPrefix}cnt", count(v).over(wAgg))
      .withColumn(s"${outPrefix}sum", sum(v).over(wAgg))
      .withColumn(s"${outPrefix}avg", avg(v).over(wAgg))
      .where(!col("__carry"))
    // ROWS features: in-bucket lag + compact-frame fallback for bucket-
    // first rows
    val wRows = Window.partitionBy(gridCols: _*)
      .orderBy(col("__gts") +: tieCols.map(col): _*)
    val withLocal = agged
      .withColumn("__pv_l", lag(v, 1).over(wRows))
      .withColumn("__pt_l", lag(col("__gts"), 1).over(wRows))
    val lastStruct = max(struct(
      col("__gts") +: tieCols.map(col) :+ v.as("__v"): _*))
    val perBucket = base.groupBy(gridCols: _*).agg(lastStruct.as("__last"))
    val wK = Window.partitionBy(keyCols.map(col): _*).orderBy(col("__gb"))
    val bFrame = perBucket
      .withColumn("__plast", lag(col("__last"), 1).over(wK))
      .select((keyCols :+ "__gb").map(col) :+ col("__plast"): _*)
    val hasLocal = col("__pt_l").isNotNull
    // null-SAFE join keys: trailingStats keeps a null key as its own
    // window group, so the compact-frame join must match it too (a plain
    // equi-join would silently drop every null-key row)
    val l = withLocal.as("__l")
    val r = bFrame.as("__r")
    val joinCond = (keyCols :+ "__gb")
      .map(c => col(s"__l.$c") <=> col(s"__r.$c")).reduce(_ && _)
    l.join(r, joinCond)
      .select(col("__l.*"), col("__r.__plast"))
      .withColumn(s"${outPrefix}prev_value",
        when(hasLocal, col("__pv_l")).otherwise(col("__plast.__v")))
      .withColumn(s"${outPrefix}gap", col("__gts") -
        when(hasLocal, col("__pt_l")).otherwise(col("__plast.__gts")))
      .drop("__gts", "__gb", "__carry", "__pv_l", "__pt_l", "__plast")
  }
}
