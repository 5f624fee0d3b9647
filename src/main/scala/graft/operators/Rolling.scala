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
  * Skew bound, same statement as [[Sessions.assign]]: one key's whole
  * history sorts in one task. A pathological hot key wants the two-level
  * bucket treatment; unlike dense session indexes, a trailing RANGE
  * aggregate needs cross-bucket rows (the trailing window spans bucket
  * edges), so the remedy is replicating each bucket's trailing `rangeBack`
  * slice into its successor before a bucketed window — not carried here
  * until a real corpus needs it (events tables are rarely single-key
  * skewed the way document corpora are lang-skewed).
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
}
