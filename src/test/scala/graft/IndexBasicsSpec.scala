package graft

import org.apache.spark.sql.functions._

/** M1 end-to-end slice: regular index over split orders files; pruned join
  * must exactly match the unpruned join, and probing must actually prune. */
class IndexBasicsSpec extends GraftSuite {
  import spark.implicits._

  private lazy val setup: (Index, String) = {
    val dir = tmpDir("orders_split_")
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    orders.repartitionByRange(4, col("o_custkey")).write.mode("overwrite").parquet(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq

    val idx = Index(spark, "t_orders_basic", orders.schema, "parquet")
    idx.addIndex("o_custkey")
    idx.addFile(files: _*)
    idx.update()
    (idx, dir)
  }

  test("update indexes every registered file exactly once") {
    val (idx, _) = setup
    assert(idx.unindexedFiles.isEmpty)
    assert(idx.files.size == 4)
    idx.update() // idempotent
    assert(idx.unindexedFiles.isEmpty)
  }

  test("regular-index join matches full-scan join") {
    val (idx, dir) = setup
    val probe = spark.read.parquet(s"$sf/customer.parquet")
      .where($"c_nationkey" === 5)
      .select($"c_custkey".as("o_custkey"), $"c_mktsegment")
    val got = idx.join(probe, Seq("o_custkey"))
    val expected = spark.read.parquet(dir).join(probe, Seq("o_custkey"))
    assertSameRows(got, expected)
  }

  test("probe actually prunes files for a selective key") {
    val (idx, _) = setup
    val oneKey = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_custkey").limit(1).collect()(0).getLong(0)
    val located = idx.locateFiles(Map("o_custkey" -> Seq(oneKey)))
    assert(located.nonEmpty && located.size < 4,
      s"expected <4 files for one range-clustered key, got ${located.size}")
  }

  test("empty probe yields empty result with the full read schema") {
    val (idx, _) = setup
    val probe = Seq.empty[Long].toDF("o_custkey")
    val got = idx.join(probe, Seq("o_custkey"))
    assert(got.count() == 0)
    assert(got.columns.contains("o_orderkey") && got.columns.contains("o_orderstatus"))
  }

  test("reverse join enriches probe side and keeps left rows on left join") {
    val (idx, dir) = setup
    import Index.DataFrameOps
    val probe = spark.read.parquet(s"$sf/customer.parquet")
      .where($"c_nationkey" === 2)
      .select($"c_custkey".as("o_custkey"), $"c_name")
    val got = probe.join(idx, Seq("o_custkey"), "left")
    val expected = probe.join(spark.read.parquet(dir), Seq("o_custkey"), "left")
    assertSameRows(got, expected)
  }

  test("deleteFiles drops a file from ledger and index") {
    val (idx, _) = setup
    // use a throwaway index so other tests keep their fixture
    val dir = tmpDir("orders_del_")
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    orders.repartitionByRange(2, col("o_custkey")).write.mode("overwrite").parquet(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    val idx2 = Index(spark, "t_orders_del", orders.schema, "parquet")
    idx2.addIndex("o_custkey").addFile(files: _*).update()
    assert(idx2.files.size == 2)
    idx2.deleteFiles(files.head)
    assert(idx2.files.size == 1)
    assert(idx2.unindexedFiles.isEmpty)
    val remaining = idx2.read()
    assert(remaining.count() == spark.read.parquet(files.tail: _*).count())
  }
}
