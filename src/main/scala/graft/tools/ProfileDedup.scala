package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Dedup

/** Times just the two heavy dedup queries at a given SF (scratch tool). */
object ProfileDedup {
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
    def t(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[pd] $name rows=$n ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    t("minhash") { Dedup.minhashPairs(docs, "doc_id", "text", 0.95).count() }
    t("ngram") { Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.9).count() }
    t("simhash") { Dedup.simhashPairs(docs, "doc_id", "text").count() }
    // IVF ANN: must return a nonempty SUBSET of brute-force pairs
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val brute = graft.operators.Similarity
      .cosinePairs(emb, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = graft.operators.Similarity
      .ivfCosinePairs(emb, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[pd] ivf pairs=${ivf.size} brute=${brute.size} subset=${ivf.subsetOf(brute)} nonempty=${ivf.nonEmpty}")
    spark.stop()
  }
}
