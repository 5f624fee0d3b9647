package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scratch breakdown of q_dedup_clusters: minhash pair generation vs the
  * connected-components sweeps (args: sfDir). */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sf/documents.parquet")

    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[cc] $label%-24s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }

    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.95)
    time("minhash_pairs")(println(s"[cc] pairs=${pairs.count()}"))
    val cached = pairs.localCheckpoint()
    time("cc_only")(println(s"[cc] nodes=${Dedup.duplicateClusters(cached).count()}"))
    time("full_clusters")(
      println(s"[cc] nodes=${Dedup.duplicateClusters(
        Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.95)).count()}"))
    spark.stop()
  }
}
