package graft

import org.apache.spark.sql.functions._

import graft.operators.Profile

/** HLL distinct-cardinality epoch store: exact in the sparse regime,
  * replay-idempotent, union semantics across overlapping epochs, and
  * accuracy-bounded in the estimating regime. */
class DistinctStoreSpec extends GraftSuite {
  import spark.implicits._

  test("overlapping epochs union (never sum); replayed epoch replaces; " +
      "small-set coupon regime is exact") {
    val store = tmpDir("hll_store_")
    val b0 = (1 to 25).map(i => s"u$i").toDF("u")
    val b1 = (15 to 40).map(i => s"u$i").toDF("u") // 11 overlap
    Profile.distinctSketchIncrementalBatch(b0, "u", store, batchId = 0L)
    Profile.distinctSketchIncrementalBatch(b1, "u", store, batchId = 1L)
    Profile.distinctSketchIncrementalBatch(b1, "u", store, batchId = 1L)
    val got = Profile.distinctSketchView(spark, store)
      .collect().head.getLong(0)
    // a double-count would read >= 51; a sum 91. Small sets are coupon-
    // collision-free in practice (26-bit coupon space); NOT a guarantee
    // past a few hundred items — 450 ids already measured 447 here
    assert(got == 40L, s"union of 1..40, got $got")
  }

  test("empty store reads 0, not null") {
    val got = Profile.distinctSketchView(spark, tmpDir("hll_empty_"))
      .collect().head
    assert(!got.isNullAt(0) && got.getLong(0) == 0L)
  }

  test("estimating regime: within 2.5% of exact at 50k distinct ids") {
    val store = tmpDir("hll_store_")
    val rng = new scala.util.Random(37)
    val ids = Seq.fill(80000)(s"id${rng.nextInt(50000)}")
    val exact = ids.distinct.size.toLong
    val (b0, b1) = ids.splitAt(40000)
    Profile.distinctSketchIncrementalBatch(b0.toDF("u"), "u", store, 0L)
    Profile.distinctSketchIncrementalBatch(b1.toDF("u"), "u", store, 1L)
    val got = Profile.distinctSketchView(spark, store)
      .collect().head.getLong(0)
    val err = math.abs(got - exact).toDouble / exact
    assert(err <= 0.025, s"estimate $got vs exact $exact: err $err")
  }
}
