package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Resample

/** Time-grid LOCF resampling: hand-checked carry-forward over gaps and
  * ties, staleness tolerance, per-key grid bounds, the runaway-grid
  * guard, timestamp/numeric timeline agreement, and a randomized
  * differential against a driver-side reference. */
class ResampleSpec extends GraftSuite {
  import spark.implicits._

  private def ts(micros: Long): Timestamp = {
    val t = new Timestamp(micros / 1000000L * 1000L)
    t.setNanos(((micros % 1000000L) * 1000L).toInt)
    t
  }

  test("LOCF over gaps: ticks carry the latest prior observation; " +
      "leading ticks start at the key's first tick") {
    // key a: obs at t=5 (v=1), t=25 (v=2)  -> ticks 0..2 at step 10
    // key b: obs at t=11 (v=9)             -> tick 1 only
    val df = Seq(("a", 5L, 1.0), ("a", 25L, 2.0), ("b", 11L, 9.0))
      .toDF("k", "t", "v")
    val got = Resample.gridLocf(df, Seq("k"), "t", step = 10L,
        valueCols = Seq("v"))
      .orderBy("k", "grid_ts")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(
      ("a", 0L, 1.0), ("a", 10L, 1.0), ("a", 20L, 2.0),
      ("b", 10L, 9.0)))
  }

  test("same-tick compaction: latest observation in the tick wins; " +
      "equal-ts ties break by greatest payload (deterministic)") {
    val df = Seq(("a", 3L, 1.0), ("a", 7L, 5.0), // tick 0: t=7 wins
      ("a", 12L, 2.0), ("a", 12L, 4.0)) // tick 1: tie -> greater v
      .toDF("k", "t", "v")
    val got = Resample.gridLocf(df, Seq("k"), "t", 10L, Seq("v"),
        obsTsName = "ot")
      .orderBy("grid_ts")
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq == Seq((0L, 5.0, 7L), (10L, 4.0, 12L)))
  }

  test("maxGapTicks bounds staleness: a tick past the window renders " +
      "null; the observation's own tick always carries it") {
    val df = Seq(("a", 0L, 1.0), ("a", 45L, 2.0)).toDF("k", "t", "v")
    val got = Resample.gridLocf(df, Seq("k"), "t", 10L, Seq("v"),
        maxGapTicks = Some(1L))
      .orderBy("grid_ts")
      .collect().map(r => (r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2)))
    // ticks 0,1 carry the t=0 obs (age 0,1); 2,3 too stale; 4 holds t=45
    assert(got.toSeq == Seq((0L, 1.0), (10L, 1.0), (20L, null),
      (30L, null), (40L, 2.0)))
  }

  test("timestamp timeline: grid ticks render as timestamps and agree " +
      "with the numeric micros timeline") {
    val step = 60000000L // 1 minute in micros
    val rows = Seq((1L, 30000000L, 10.0), (1L, 150000000L, 20.0))
    val tsDf = rows.map { case (k, m, v) => (k, ts(m), v) }
      .toDF("k", "t", "v")
    val numDf = rows.toDF("k", "t", "v")
    val a = Resample.gridLocf(tsDf, Seq("k"), "t", step, Seq("v"))
      .select(col("k"), unix_micros(col("grid_ts")).as("g"), col("v"))
    val b = Resample.gridLocf(numDf, Seq("k"), "t", step, Seq("v"))
      .select(col("k"), col("grid_ts").as("g"), col("v"))
    assertSameRows(a, b)
  }

  test("runaway-grid guard: a key span exceeding maxTicksPerKey fails " +
      "loudly before the explode") {
    val df = Seq(("a", 0L, 1.0), ("a", 1000000L, 2.0)).toDF("k", "t", "v")
    val e = intercept[Exception] {
      Resample.gridLocf(df, Seq("k"), "t", step = 1L,
        valueCols = Seq("v"), maxTicksPerKey = 100L).count()
    }
    assert(e.getMessage != null && e.getMessage.contains("maxTicksPerKey"),
      s"unexpected error: ${e.getMessage}")
  }

  test("null keys and null timestamps drop from the series (SQL join " +
      "semantics)") {
    val df = Seq((Some("a"), Some(5L), 1.0), (None, Some(7L), 9.0),
      (Some("a"), None, 8.0)).toDF("k", "t", "v")
    val got = Resample.gridLocf(df, Seq("k"), "t", 10L, Seq("v")).collect()
    assert(got.length == 1 && got.head.getDouble(2) == 1.0)
  }

  test("randomized differential vs driver-side LOCF reference") {
    val rng = new scala.util.Random(23)
    val step = 7L
    val rows = (1 to 400).map { _ =>
      (s"k${rng.nextInt(5)}", rng.nextInt(300).toLong,
        math.floor(rng.nextDouble() * 100) / 10.0)
    }
    // reference: per key, compacted last-obs per tick, then carry forward
    val expect = rows.groupBy(_._1).toSeq.flatMap { case (k, obs) =>
      val byTick = obs.groupBy(o => o._2 / step)
        .map { case (tick, os) => tick -> os.map(o => (o._2, o._3)).max }
      val lo = byTick.keys.min
      val hi = byTick.keys.max
      var carry: Option[(Long, Double)] = None
      (lo to hi).map { tick =>
        carry = byTick.get(tick).orElse(carry)
        (k, tick * step, carry.get._2)
      }
    }.toDF("k", "grid_ts", "v")
    val got = Resample.gridLocf(rows.toDF("k", "t", "v"),
      Seq("k"), "t", step, Seq("v"))
    assertSameRows(got, expect)
  }
}
