package graft

import org.apache.spark.sql.functions._

import graft.functions.FreqItems
import graft.operators.Profile

/** Misra–Gries frequent-items aggregate: exact-regime equivalence with a
  * full groupBy, envelope + guaranteed-survivor properties in the sketchy
  * regime (capacity far below cardinality), weighted counting, per-group
  * composition, and partitioning stability where determinism is claimed. */
class FreqItemsSpec extends GraftSuite {
  import spark.implicits._

  private def exactCounts(items: Seq[String]): Map[String, Long] =
    items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  test("exact regime (capacity >= distinct): equals groupBy counts, " +
      "stable under repartitioning") {
    val rng = new scala.util.Random(7)
    val items = Seq.fill(5000)(s"d${rng.nextInt(40)}.example")
    val truth = exactCounts(items)
    val expected = truth.toSeq
      .sortBy { case (k, c) => (-c, k) }.take(10)
    for (parts <- Seq(1, 3, 16)) {
      val df = items.toDF("item").repartition(parts)
      val got = Profile.heavyHitters(df, "item", k = 10, capacity = 64)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(got.toSeq.map(t => (t._1, t._2)) == expected,
        s"parts=$parts")
      assert(got.forall(t => t._2 == t._3), "exact regime must have " +
        "count_min == count_max")
    }
  }

  test("the buffer honors its capacity: counter count stays bounded and " +
      "decrements actually fire past capacity distinct keys") {
    // pins the sketch being a sketch: a boxing bug once made the shrink
    // branch unreachable (scala.Long unboxes a missing key's null to 0),
    // silently degrading to an unbounded exact map — counts stayed right,
    // so only the buffer-size invariant catches the regression
    val sk = new FreqItems.Sketch(16)
    (0 until 1000).foreach(i => sk.add(s"k$i", 1L))
    assert(sk.counts.size <= 16,
      s"buffer grew to ${sk.counts.size} entries past capacity 16")
    assert(sk.err > 0L, "distinct keys past capacity must decrement")
    assert(sk.total == 1000L)
    // merge path too: two over-capacity sketches stay bounded
    val a = new FreqItems.Sketch(16)
    val b = new FreqItems.Sketch(16)
    (0 until 200).foreach(i => a.add(s"a$i", 1L))
    (0 until 200).foreach(i => b.add(s"b$i", 1L))
    val m = a.merge(b)
    assert(m.counts.size <= 16, s"merged buffer ${m.counts.size} > 16")
  }

  test("sketchy regime: envelope holds, error bounded by n/(capacity+1), " +
      "every guaranteed-heavy item survives") {
    val rng = new scala.util.Random(11)
    // zipfish: few hot items + a long tail of distinct noise
    val hot = (0 until 8).flatMap(i => Seq.fill(400 - 40 * i)(s"hot$i"))
    val tail = (0 until 4000).map(i => s"tail${i}_${rng.nextInt(10)}")
    val items = rng.shuffle(hot ++ tail)
    val truth = exactCounts(items)
    val n = items.size.toLong
    val cap = 50
    val got = Profile.heavyHitters(
      items.toDF("item").repartition(8), "item", k = 50, capacity = cap)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val maxErr = n / (cap + 1)
    got.foreach { case (item, lo, hi) =>
      val t = truth(item)
      assert(lo <= t && t <= hi, s"$item: true $t outside [$lo, $hi]")
      assert(hi - lo <= maxErr, s"$item: envelope ${hi - lo} > $maxErr")
    }
    val guaranteed = truth.filter(_._2 > maxErr).keySet
    val reported = got.map(_._1).toSet
    assert(guaranteed.subsetOf(reported),
      s"missing guaranteed heavy hitters: ${guaranteed -- reported}")
  }

  test("weighted counting in the exact regime") {
    val df = Seq(("a", 5L), ("b", 2L), ("a", 1L), ("c", 7L), ("b", 0L))
      .toDF("item", "w")
    val got = Profile.heavyHitters(df, "item", k = 3, capacity = 8,
      weightCol = Some("w")).as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("c", 7L, 7L), ("a", 6L, 6L), ("b", 2L, 2L)))
  }

  test("composes with groupBy: per-group top items (exact regime)") {
    val df = Seq(
      ("en", "x"), ("en", "x"), ("en", "y"),
      ("de", "z"), ("de", "y"), ("de", "y"))
      .toDF("lang", "item")
    val got = df.groupBy("lang")
      .agg(FreqItems.freqItemsAgg(col("item"), 16, 1).as("hh"))
      .select(col("lang"), inline(col("hh")))
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == Set(("en", "x", 2L, 2L), ("de", "y", 2L, 2L)))
  }

  test("incremental store: exact regime merges to the one-shot answer; " +
      "replayed batch does not double-count") {
    val dir = tmpDir("graft_hh_")
    val rng = new scala.util.Random(3)
    val all = Seq.fill(3000)(s"d${rng.nextInt(30)}")
    val (b0, b1) = all.splitAt(1300)
    Profile.heavyHittersIncrementalBatch(
      b0.toDF("item"), "item", dir, capacity = 64, batchId = 0L)
    Profile.heavyHittersIncrementalBatch(
      b1.toDF("item"), "item", dir, capacity = 64, batchId = 1L)
    val oneShot = Profile.heavyHitters(all.toDF("item"), "item", 8, 64)
    assertSameRows(Profile.heavyHittersView(spark, dir, 8), oneShot)
    // replay batch 1: appendReplacing must swap, not add
    Profile.heavyHittersIncrementalBatch(
      b1.toDF("item"), "item", dir, capacity = 64, batchId = 1L)
    assertSameRows(Profile.heavyHittersView(spark, dir, 8), oneShot)
  }

  test("incremental store, sketchy regime: merged envelope still bounds " +
      "the true counts") {
    val dir = tmpDir("graft_hhs_")
    val rng = new scala.util.Random(19)
    val hot = (0 until 6).flatMap(i => Seq.fill(300 - 30 * i)(s"hot$i"))
    val tail = (0 until 3000).map(i => s"t$i")
    val all = rng.shuffle(hot ++ tail)
    val batches = all.grouped((all.size + 2) / 3).toSeq
    batches.zipWithIndex.foreach { case (b, i) =>
      Profile.heavyHittersIncrementalBatch(
        b.toDF("item"), "item", dir, capacity = 40, batchId = i.toLong)
    }
    val truth = exactCounts(all)
    Profile.heavyHittersView(spark, dir, 40).collect().foreach { r =>
      val (item, lo, hi) = (r.getString(0), r.getLong(1), r.getLong(2))
      val t = truth(item)
      assert(lo <= t && t <= hi, s"$item: true $t outside [$lo, $hi]")
    }
  }

  test("nulls and zero weights are ignored; negative weights are rejected") {
    val ok = Profile.heavyHitters(
      Seq(Some("a"), None, Some("a"), None).toDF("item"),
      "item", k = 2, capacity = 4)
      .as[(String, Long, Long)].collect().toSeq
    assert(ok == Seq(("a", 2L, 2L)))
    val bad = Seq(("a", -1L)).toDF("item", "w")
    intercept[Exception] {
      Profile.heavyHitters(bad, "item", k = 1, capacity = 4,
        weightCol = Some("w")).collect()
    }
    // NULL weights are ignored, not a crash: the typed input encoder's
    // primitive weight field would AssertNotNull without the upstream
    // coalesce (review finding)
    val withNullW = Seq(("a", Some(2L)), ("a", None), ("b", Some(1L)))
      .toDF("item", "w")
    val nw = Profile.heavyHitters(withNullW, "item", k = 2, capacity = 4,
      weightCol = Some("w")).as[(String, Long, Long)].collect().toSeq
    assert(nw == Seq(("a", 2L, 2L), ("b", 1L, 1L)))
  }

  test("skewReport: exact regime counts, shares, and salt factors; " +
      "multi-column keys; null keys surface as one row") {
    // 100 rows: key "hot" 60, "warm" 30, "cold" 9, null 1
    val rows = Seq.fill(60)(Some("hot")) ++ Seq.fill(30)(Some("warm")) ++
      Seq.fill(9)(Some("cold")) ++ Seq(None)
    val df = rows.toDF("k")
    val got = Profile.skewReport(df, Seq("k"), kTop = 10,
        capacity = 1000, parallelism = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).sortBy(-_._2)
    // exact regime: count_min == count_max == true counts
    assert(got.map(t => (t._1, t._2)).toSeq ==
      Seq(("hot", 60L), ("warm", 30L), ("cold", 9L), ("", 1L)))
    assert(got.forall(t => t._2 == t._3))
    // salt = ceil(count * parallelism / n): hot -> 6, warm -> 3,
    // cold -> ceil(0.9) = 1, null-key row -> floor at 1
    assert(got.map(_._5).toSeq == Seq(6L, 3L, 1L, 1L))
    assert(got.head._4 == 0.6)
    // composite keys concatenate with a separator: ("ab","c") != ("a","bc")
    val comp = Seq(("ab", "c"), ("a", "bc")).toDF("x", "y")
    assert(Profile.skewReport(comp, Seq("x", "y"), kTop = 5,
      capacity = 100).count() == 2)
  }
}
