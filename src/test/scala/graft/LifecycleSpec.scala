package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.harness.Lake
import graft.store.{IndexStore, StorageMigrations}
import graft.streaming.StreamIngest

/** Storage migrations, range-window queries, stats with large-index
  * contribution, diagnostics, streaming ingestion. */
class LifecycleSpec extends GraftSuite {

  private def freshIndex(name: String, nFiles: Int = 3): (Index, Seq[String]) = {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val dir = Files.createTempDirectory(s"graft_${name}_").toString
    val files = Lake.splitByBand(orders, dir, "o_custkey", nFiles)
    val idx = Index(spark, name, orders.schema, "parquet")
    idx.addIndex("o_custkey")
    idx.addFile(files: _*)
    (idx, files)
  }

  test("v1 store (no file_size) migrates to current on reconnect") {
    val (idx, files) = freshIndex("migrate_orders")
    idx.update()
    val store = new IndexStore(spark, "migrate_orders")
    // simulate a v1 layout: drop file_size, rewind metadata version
    store.indexTable.overwrite(store.indexTable.read().get.drop("file_size"))
    store.writeMetadata(idx.metadata.copy(storageVersion = 1))
    // reconnect triggers the migration chain
    val idx2 = Index.connect(spark, "migrate_orders")
    assert(idx2.metadata.storageVersion == StorageMigrations.CurrentVersion)
    val table = store.indexTable.read().get
    assert(table.columns.contains("file_size"))
    assert(table.where(col("file_size") <= 0L).count() == 0,
      "file_size must be backfilled from the filesystem")
    assert(table.count() == files.size)
  }

  test("queryRange prunes by min/max window and filters residually") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val dir = Files.createTempDirectory("graft_rangeq_").toString
    val files = Lake.splitByBand(orders, dir, "o_orderkey", 4)
    val idx = Index(spark, "rangeq_orders", orders.schema, "parquet")
    idx.addRangeIndex("o_orderkey")
    idx.addFile(files: _*)
    idx.update()
    val got = idx.queryRange("o_orderkey", 100L, 300L)
    val want = orders.where(col("o_orderkey").between(100L, 300L))
    assertSameRows(got.select("o_orderkey", "o_custkey"),
      want.select("o_orderkey", "o_custkey"))
    // banded on o_orderkey → the window must not touch all files
    val located = graft.operators.IndexProbe.collectFiles(
      graft.operators.IndexProbe.rangeWindowCandidates(
        new IndexStore(spark, "rangeq_orders"),
        idx.metadata.indexFor("o_orderkey").get, 100L, 300L))
    assert(located.size < files.size)
  }

  test("stats includes large-index overflow cardinalities") {
    spark.conf.set("spark.graft.largeIndexLimit", "10")
    try {
      val (idx, _) = freshIndex("stats_orders")
      idx.update()
      val s = idx.stats().where(col("column") === "o_custkey").first()
      // every file has >10 distinct custkeys -> all arrays evicted; stats
      // must still report the true per-file cardinalities from overflow
      assert(s.getAs[Long]("max_values") > 10L)
    } finally spark.conf.unset("spark.graft.largeIndexLimit")
  }

  test("streaming foreachBatch ingestion indexes each micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("id", "v")
    val idx = Index(spark, "stream_idx", stream.schema, "parquet")
    idx.addIndex("id")
    val dataDir = tmpDir("graft_stream_")
    val q = StreamIngest.writer(stream, idx, dataDir)
      .option("checkpointLocation", tmpDir("graft_stream_ckpt_"))
      .start()
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      mem.addData((3L, "c"))
      q.processAllAvailable()
    } finally q.stop()
    assert(idx.files.size == 2, s"expected 2 batch files, got ${idx.files}")
    val got = idx.query(Map("id" -> Seq(1L, 3L)))
    assert(got.count() == 2)
    assert(idx.unindexedFiles.isEmpty)
  }

  test("printMetadata and printIndex do not blow up") {
    val (idx, _) = freshIndex("diag_orders", 2)
    idx.update()
    idx.printMetadata()
    idx.printIndex(5)
  }
}
