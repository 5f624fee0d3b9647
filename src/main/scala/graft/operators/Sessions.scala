package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: consecutive events of the same key belong to
  * one session while the time between them stays within `gap`; a longer
  * silence starts the next session. The standard building block for
  * user-journey training examples, dialogue-turn grouping, and
  * session-level quality filters.
  *
  * Spark-first shape: ONE shuffle (the per-key window). `lag` marks
  * session starts (`gap` exceeded or first event), a running sum turns the
  * marks into a dense per-key session index. No self-join, no interval
  * explosion. Timestamp columns are normalized to epoch-micros
  * ([[TimeCols]]) — `gap` is in MICROSECONDS for them, in the column's own
  * units for numerics.
  *
  * Determinism at ts ties: tied rows see a zero gap among themselves, so
  * they always land in the same session and every row's index is
  * independent of their intra-tie order. A skewed key costs one task's
  * sort of that key's rows — the same bound as any windowed op; at 100 TB,
  * pre-bucketing by key makes the shuffle a local sort (as-of-join note,
  * `AsOfJoin.scala`).
  */
object Sessions {

  /** Append a dense 0-based `outCol` session index per key. Rows with a
    * null timestamp sort first (nulls-first) and join the first session of
    * their key — filter them beforehand if that is not the intent. (A new
    * session opens only when the PREVIOUS row has a real timestamp and the
    * gap is exceeded, so a run of null-ts rows never fragments into
    * singleton sessions and the first real-ts row continues session 0.) */
  def assign(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      gap: Long,
      outCol: String = "session_idx"): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(gap > 0, "gap must be positive")
    require(!df.columns.contains(outCol), s"output column '$outCol' exists")
    val tsN: Column = TimeCols.numericFor(df, tsCol)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(tsN)
    val prev = lag(tsN, 1).over(w)
    val isNew = when(row_number().over(w) === 1, 1L)
      .otherwise(when(prev.isNotNull && tsN - prev > gap, 1L).otherwise(0L))
    df.withColumn(outCol,
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
  }

  /** Per-session summary: first/last event time (epoch-micros for
    * timestamp columns), event count, and duration in the same numeric
    * units — the frame session-level filters and stats run on. */
  def stats(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      gap: Long): DataFrame = {
    val assigned = assign(df, keyCols, tsCol, gap)
    val tsN = TimeCols.numericFor(df, tsCol)
    assigned
      .groupBy((keyCols :+ "session_idx").map(col): _*)
      .agg(min(tsN).as("session_start"),
        max(tsN).as("session_end"),
        count(lit(1)).as("n_events"))
      .withColumn("duration", col("session_end") - col("session_start"))
  }
}
