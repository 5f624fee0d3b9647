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
  * independent of their intra-tie order. A skewed key costs [[assign]] one
  * task's sort of that key's rows — the same bound as any windowed op;
  * [[assignBucketed]] caps that at O(rows per time bucket) via the
  * two-level carry-in scan (the `AsOfJoin.asOfBucketed` pattern).
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

  /** Skew-resistant bucketed sessionization: same results as [[assign]],
    * different parallelism bound. [[assign]] sorts each key's entire
    * history on one window task — a serial bottleneck for a pathological
    * hot key at 100 TB. Here the heavy window partitions by
    * (key, ts div bucketWidth), so a hot key costs O(rows per bucket) per
    * task; cross-bucket state is the asOfBucketed/packByTokenBudget
    * two-level scan: a tiny per-(key, occupied-bucket) frame carries (a)
    * the previous bucket's last timestamp — which decides whether the
    * bucket's FIRST row opens a session — and (b) the running
    * session-start total of earlier buckets, the offset that turns local
    * indexes into the global dense index. Timestamp columns are
    * normalized to epoch-micros; `gap` and `bucketWidth` are
    * MICROSECONDS for them, column units for numerics. Null-ts rows land
    * in a single sentinel first bucket, preserving [[assign]]'s
    * nulls-join-session-0 contract. Pick bucketWidth so one bucket holds
    * a bounded slice of the hottest key's traffic (a day, say); several
    * sessions per bucket and sessions spanning many buckets both work. */
  def assignBucketed(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      gap: Long,
      bucketWidth: Long,
      outCol: String = "session_idx"): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(gap > 0, "gap must be positive")
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(!df.columns.contains(outCol), s"output column '$outCol' exists")
    val tsN: Column = TimeCols.numericFor(df, tsCol)
    val withTs = df.withColumn("__gts", tsN)
      .withColumn("__gb", when(col("__gts").isNull, lit(Long.MinValue))
        .otherwise(expr(s"__gts div ${bucketWidth}L")))
    val gridCols = (keyCols :+ "__gb").map(col)
    // level 1: per-(key, bucket) local session starts + running count —
    // the bucket's first row is DEFERRED to level 2 (its predecessor
    // lives in the previous occupied bucket)
    val wB = Window.partitionBy(gridCols: _*).orderBy(col("__gts"))
    val prev = lag(col("__gts"), 1).over(wB)
    val local = withTs
      .withColumn("__ln",
        when(prev.isNotNull && col("__gts") - prev > gap, 1L).otherwise(0L))
      .withColumn("__run", sum(col("__ln"))
        .over(wB.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // level 2: one row per occupied (key, bucket) — first-row newness from
    // the previous occupied bucket's last ts, plus the exclusive prefix
    // sum of session starts that offsets this bucket's local indexes
    val perBucket = local.groupBy(gridCols: _*)
      .agg(min(col("__gts")).as("__bmin"), max(col("__gts")).as("__bmax"),
        sum(col("__ln")).as("__bnew"))
    val wK = Window.partitionBy(keyCols.map(col): _*).orderBy(col("__gb"))
    val carryLast = lag(col("__bmax"), 1).over(wK)
    val bFrame = perBucket
      .withColumn("__fn", when(row_number().over(wK) === 1, 1L)
        .otherwise(when(carryLast.isNotNull &&
          col("__bmin") - carryLast > gap, 1L).otherwise(0L)))
      .withColumn("__off", coalesce(
        sum(col("__fn") + col("__bnew"))
          .over(wK.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select((keyCols :+ "__gb").map(col) :+ col("__fn") :+ col("__off"): _*)
    local.join(bFrame, keyCols :+ "__gb")
      .withColumn(outCol, col("__off") + col("__fn") + col("__run") - 1)
      .drop("__gts", "__gb", "__ln", "__run", "__fn", "__off")
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
