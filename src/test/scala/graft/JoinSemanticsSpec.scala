package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.harness.Lake
import graft.operators.IndexJoin

/** Join-type semantics: outer/anti joins must return unmatched index rows,
  * so pruning is disabled for exactly those types (the reference shares
  * this sharp edge; its LEFT OUTER tests only cover the catalog read-all
  * path — here the programmatic path is pinned too). */
class JoinSemanticsSpec extends GraftSuite {
  import graft.Index.DataFrameOps

  private lazy val fixture: (Index, Seq[String]) = {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val dir = Files.createTempDirectory("graft_jointypes_").toString
    val files = Lake.splitByBand(orders, dir, "o_custkey", 4)
    val idx = Index(spark, "jointypes_orders", orders.schema, "parquet")
    idx.addIndex("o_custkey")
    idx.addFile(files: _*)
    idx.update()
    (idx, files)
  }

  private def orders = spark.read.parquet(s"$sf/orders.parquet")
  private def probe = spark.read.parquet(s"$sf/customer.parquet")
    .where(col("c_acctbal") > 9000)
    .select(col("c_custkey").as("o_custkey"), col("c_name"))

  test("needsAllIndexRows matrix") {
    assert(!IndexJoin.needsAllIndexRows("inner", indexIsLeft = true))
    assert(!IndexJoin.needsAllIndexRows("left_semi", indexIsLeft = true))
    assert(!IndexJoin.needsAllIndexRows("right", indexIsLeft = true))
    assert(IndexJoin.needsAllIndexRows("left", indexIsLeft = true))
    assert(IndexJoin.needsAllIndexRows("left_outer", indexIsLeft = true))
    assert(IndexJoin.needsAllIndexRows("full", indexIsLeft = true))
    assert(IndexJoin.needsAllIndexRows("left_anti", indexIsLeft = true))
    assert(!IndexJoin.needsAllIndexRows("inner", indexIsLeft = false))
    assert(!IndexJoin.needsAllIndexRows("left", indexIsLeft = false))
    assert(!IndexJoin.needsAllIndexRows("left_anti", indexIsLeft = false))
    assert(IndexJoin.needsAllIndexRows("right", indexIsLeft = false))
    assert(IndexJoin.needsAllIndexRows("full_outer", indexIsLeft = false))
  }

  test("index-left LEFT join returns unmatched index rows with nulls") {
    val (idx, _) = fixture
    val got = idx.join(probe, Seq("o_custkey"), "left")
      .select("o_orderkey", "o_custkey", "c_name")
    val want = orders.join(probe, Seq("o_custkey"), "left")
      .select("o_orderkey", "o_custkey", "c_name")
    assertSameRows(got, want)
    assert(got.where(col("c_name").isNull).count() > 0,
      "left join must surface unmatched orders")
  }

  test("index-left ANTI join returns exactly the non-matching index rows") {
    val (idx, _) = fixture
    val got = idx.join(probe.select("o_custkey"), Seq("o_custkey"), "left_anti")
      .select("o_orderkey", "o_custkey")
    val want = orders.join(probe.select("o_custkey"), Seq("o_custkey"), "left_anti")
      .select("o_orderkey", "o_custkey")
    assertSameRows(got, want)
    assert(got.count() > 0)
  }

  test("index-left FULL join keeps both sides' unmatched rows") {
    val (idx, _) = fixture
    val got = idx.join(probe, Seq("o_custkey"), "full")
      .select("o_orderkey", "o_custkey", "c_name")
    val want = orders.join(probe, Seq("o_custkey"), "full")
      .select("o_orderkey", "o_custkey", "c_name")
    assertSameRows(got, want)
  }

  test("reversed RIGHT join (index right) returns unmatched index rows") {
    val (idx, _) = fixture
    val got = probe.join(idx, Seq("o_custkey"), "right")
      .select("o_orderkey", "o_custkey", "c_name")
    val want = probe.join(orders, Seq("o_custkey"), "right")
      .select("o_orderkey", "o_custkey", "c_name")
    assertSameRows(got, want)
  }

  test("inner/semi joins still prune (fewer files read than registered)") {
    val (idx, files) = fixture
    spark.conf.set("spark.graft.metricsEnabled", "true")
    try {
      // key-local probe: customers in the first band only
      val local = probe.where(col("o_custkey") <= 100)
      idx.join(local, Seq("o_custkey")).count()
      val m = IndexJoin.lastMetrics.get
      assert(m.locatedFiles < files.size,
        s"selective inner join should prune: $m")
    } finally spark.conf.unset("spark.graft.metricsEnabled")
  }
}
