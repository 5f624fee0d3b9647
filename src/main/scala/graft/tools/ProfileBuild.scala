package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Index
import graft.harness.Lake
import graft.operators.IndexBuild
import graft.store.IndexStore

/** Phase-level profiling of index build + probe at sf0.01 (scratch tool). */
object ProfileBuild {
  def main(args: Array[String]): Unit = {
    val work = java.nio.file.Files.createTempDirectory("graft_prof_").toString
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.graft.storagePath", s"$work/store")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[prof] $name ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }

    val sf = "/root/testdata/sf0.01"
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    val files = t("split") {
      Lake.splitByBand(lineitem, s"$work/lineitem", "l_partkey", 8)
    }
    val idx = Index(spark, "prof_li", lineitem.schema, "parquet")
    idx.addBloomIndex("l_partkey")
    idx.addIndex("l_suppkey")
    t("addFile") { idx.addFile(files: _*) }
    val store = new IndexStore(spark, "prof_li")
    val pending = t("unindexed") { idx.unindexedFiles }
    val batches = t("planBatches") { IndexBuild.planBatches(store, idx.metadata, pending) }
    println(s"[prof] batches=${batches.map(_._1.size).mkString(",")} est=${batches.map(_._2).mkString(",")}")
    batches.foreach { case (batch, est) =>
      val rows = t("buildBatch") {
        IndexBuild.buildBatch(store, idx.metadata, batch, est)
          .withColumn("__staged_at", lit(System.currentTimeMillis()))
      }
      t("stagingAppend") { store.staging.append(rows) }
    }
    t("consolidate") { IndexBuild.consolidate(store) }
    t("probe1") {
      println("rows=" + idx.query(Map("l_partkey" -> Seq(5L, 17L))).count())
    }
    t("probe2") {
      println("rows=" + idx.query(Map("l_partkey" -> Seq(42L))).count())
    }
    // join-shaped probe (the q_select_join shape)
    val probe = spark.read.parquet(s"$sf/orders.parquet").limit(50)
      .select(col("o_custkey").as("l_suppkey")).distinct()
    t("frameJoin") {
      println("rows=" + idx.join(probe, Seq("l_suppkey")).count())
    }
    spark.stop()
  }
}
