package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scratch profiler for the dedup pipelines (verify-flow tool, not API). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").cache()
    docs.count()

    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    }

    // ---- simhash first (isolate run-order effects) ----
    time("sh_first")(Dedup.simhashPairs(docs, "doc_id", "text").count())
    System.gc()

    // ---- minhash stages ----
    val sigs = Dedup.minhashSignatureArray(docs, "doc_id", "text", 128)
    time("mh_signatures")(sigs.count())
    val cands = Dedup.minhashCandidates(sigs, 128, 16)
    time("mh_candidates")(cands.count())
    System.gc()
    time("mh_full")(Dedup.minhashPairs(docs, "doc_id", "text", 0.95).count())
    System.gc()

    // ---- ngram stages ----
    val grams = docs.select(col("doc_id").as("__id"),
      Dedup.ngramSet(col("text"), 3).as("__g"))
    time("ng_gramset")(grams.count())
    val exploded = grams.select(col("__id"), explode(col("__g")).as("gram"))
    time("ng_exploded")(exploded.count())
    val freq = exploded.groupBy("gram").agg(count(lit(1)).as("df_"))
    time("ng_freq")(freq.count())
    val ranked = exploded.join(freq, "gram")
    time("ng_ranked")(ranked.count())
    System.gc()
    time("ng_full")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.9).count())
    System.gc()

    // ---- simhash ----
    time("sh_full")(Dedup.simhashPairs(docs, "doc_id", "text").count())

    spark.stop()
  }
}
