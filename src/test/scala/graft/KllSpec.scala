package graft

import org.apache.spark.sql.functions._

import graft.functions.Kll
import graft.operators.Profile

/** KLL quantile sketch: exact-regime equivalence with discrete quantiles
  * under any partitioning, rank-envelope behavior in the sketchy regime,
  * capacity boundedness of the compactor stack, null/NaN handling,
  * per-group composition, and the persisted-store re-merge path. */
class KllSpec extends GraftSuite {
  import spark.implicits._

  /** quantile_disc reference: smallest item with cumulative count >=
    * ceil(q * n) — the DuckDB/Postgres discrete-quantile definition the
    * sketch renders. */
  private def exactDisc(sorted: Seq[Double], q: Double): Double = {
    val target = math.max(1L, math.ceil(q * sorted.length).toLong)
    sorted((target - 1).toInt)
  }

  test("exact regime (n <= k): equals quantile_disc, stable under " +
      "repartitioning") {
    val rng = new scala.util.Random(11)
    val vals = Seq.fill(3000)(rng.nextDouble() * 1000.0)
    val sorted = vals.sorted
    val probs = Seq(0.0, 0.1, 0.25, 0.5, 0.9, 0.99, 1.0)
    for (parts <- Seq(1, 3, 16)) {
      val df = vals.toDF("v").repartition(parts)
      val got = Profile.quantileSketch(df, "v", probs, k = 4096)
        .orderBy("prob").collect()
        .map(r => (r.getDouble(0), r.getDouble(1)))
      val want = probs.map(q => (q, exactDisc(sorted, q)))
      assert(got.toSeq == want, s"parts=$parts")
    }
  }

  test("sketchy regime (n >> k): rank error within a conservative " +
      "envelope on every partitioning") {
    val rng = new scala.util.Random(13)
    val n = 50000
    val vals = Seq.fill(n)(rng.nextDouble())
    val sorted = vals.sorted.toArray
    def rankOf(x: Double): Int = {
      val i = java.util.Arrays.binarySearch(sorted, x)
      if (i >= 0) i else -(i + 1)
    }
    for (parts <- Seq(1, 16)) {
      val df = vals.toDF("v").repartition(parts)
      val got = Profile.quantileSketch(df, "v", Seq(0.1, 0.5, 0.9), k = 256)
        .collect().map(r => (r.getDouble(0), r.getDouble(1)))
      got.foreach { case (q, est) =>
        val err = math.abs(rankOf(est).toDouble / n - q)
        assert(err <= 0.05,
          s"parts=$parts prob=$q: rank error $err exceeds envelope")
      }
    }
  }

  test("compactor stack honors its capacity: items stored stay " +
      "O(k log(n/k)), never O(n)") {
    val sk = new Kll.Sketch(64)
    val rng = new scala.util.Random(17)
    (1 to 200000).foreach(_ => sk.add(rng.nextDouble()))
    val stored = sk.levels.map(_.length).sum
    val levels = sk.levels.length
    assert(levels <= 20, s"level count $levels")
    assert(stored <= 64 * levels,
      s"stored $stored exceeds k x levels = ${64 * levels}")
    assert(sk.n == 200000L)
  }

  test("nulls and NaNs are ignored; all-null input renders NaN") {
    val df = Seq[java.lang.Double](1.0, null, 3.0, Double.NaN, 2.0)
      .toDF("v")
    val got = Profile.quantileSketch(df, "v", Seq(0.5), k = 64).collect()
    assert(got.head.getDouble(1) == 2.0)
    val empty = Seq[java.lang.Double](null, null).toDF("v")
    val g2 = Profile.quantileSketch(empty, "v", Seq(0.5), k = 64).collect()
    assert(g2.head.getDouble(1).isNaN)
  }

  test("per-group composition: exact per-group quantiles") {
    val rows = (1 to 900).map(i => (s"g${i % 3}", i.toDouble))
    val df = rows.toDF("g", "v").repartition(7)
    val got = df.groupBy("g")
      .agg(Kll.quantilesAgg(col("v"), 2048, Seq(0.5)).as("__q"))
      .select(col("g"), inline(col("__q")))
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val vals = rows.filter(_._1 == g).map(_._2).sorted
      assert(got(g) == exactDisc(vals, 0.5), s"group $g")
    }
  }

  test("epoch store + re-merge view: exact regime equality, replayed " +
      "batch replaces instead of double-counting") {
    val store = tmpDir("kll_store_")
    val rng = new scala.util.Random(19)
    val all = Seq.fill(2000)(rng.nextDouble() * 50.0)
    val (b0, b1) = all.splitAt(1000)
    Profile.quantileSketchIncrementalBatch(
      b0.toDF("v"), "v", store, k = 4096, batchId = 0L)
    Profile.quantileSketchIncrementalBatch(
      b1.toDF("v"), "v", store, k = 4096, batchId = 1L)
    // replay batch 1: appendReplacing must swap, not append
    Profile.quantileSketchIncrementalBatch(
      b1.toDF("v"), "v", store, k = 4096, batchId = 1L)
    val got = Profile.quantileSketchView(spark, store,
        Seq(0.1, 0.5, 0.9), k = 4096)
      .orderBy("prob").collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val sorted = all.sorted
    val want = Seq(0.1, 0.5, 0.9).map(q => (q, exactDisc(sorted, q)))
    assert(got.toSeq == want)
  }

  test("merge order invariance in the exact regime: sketch-of-merges " +
      "equals one-shot") {
    val vals = (1 to 500).map(_.toDouble)
    val direct = new Kll.Sketch(1024)
    vals.foreach(direct.add)
    val parts = vals.grouped(97).map { chunk =>
      val s = new Kll.Sketch(1024); chunk.foreach(s.add); s
    }.toSeq
    val merged = parts.reduce((a, b) => a.merge(b))
    val probs = Seq(0.01, 0.33, 0.66, 1.0)
    assert(merged.quantiles(probs) == direct.quantiles(probs))
  }
}
