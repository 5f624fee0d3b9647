package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scratch profiler for the dedup pipelines (verify-flow tool, not API).
  * r14: decomposes the REAL pipeline stages (persisted frames, hashed
  * gram/token sets) and runs each timing twice so JIT/codegen warm-up is
  * visible instead of polluting the first stage measured. */
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

    def time(label: String)(body: => Long): Unit =
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        val n = body
        println(f"[prof] $label%-28s rep$rep ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
      }

    // ---- minhash stages (the real pipeline shapes) ----
    val sigs = Dedup.minhashSignatureArray(docs, "doc_id", "text", 128)
      .persist()
    time("mh_signatures")(sigs.count())
    // mirrors the SHIPPED minhashCandidates shape (r14 prefix slices +
    // firstEqualIndex === -1) so stage timings reflect production row width
    val buckets = sigs
      .select(col("__id"),
        graft.functions.VectorOps.bandHashes(col("__sig"), 16).as("__bands"))
      .select(col("__id"), col("__bands"),
        posexplode(col("__bands")).as(Seq("band", "bh")))
      .select(col("__id"), col("band"), col("bh"),
        slice(col("__bands"), lit(1), col("band")).as("__pfx"))
      .persist()
    time("mh_buckets")(buckets.count())
    val a = buckets.select(col("band"), col("bh"), col("__id").as("a_id"),
      col("__pfx").as("__pa"))
    val b = buckets.select(col("band"), col("bh"), col("__id").as("b_id"),
      col("__pfx").as("__pb"))
    val joined = a.join(b, Seq("band", "bh"))
    time("mh_bucket_join_raw")(joined.count())
    val cands = joined
      .where(col("a_id") < col("b_id") &&
        graft.functions.VectorOps.firstEqualIndex(col("__pa"), col("__pb")) === -1)
      .select("a_id", "b_id")
    time("mh_cands")(cands.count())
    val candsP = cands.persist()
    candsP.count()
    val toks = docs.select(col("doc_id").as("__tid"),
      Dedup.hashedSet(Dedup.tokenSet(col("text"))).as("__toks"))
    time("mh_toks")(toks.count())
    System.gc()
    time("mh_full")(Dedup.minhashPairs(docs, "doc_id", "text", 0.95).count())
    System.gc()

    // ---- ngram stages (REAL pipeline: hashed gram sets, persisted) ----
    val grams = docs.select(col("doc_id").as("__id"),
      graft.functions.VectorOps.hashedNgramSet(col("text"), 3).as("__g"))
      .persist()
    time("ng_gramset")(grams.count())
    val exploded = grams.select(col("__id"), size(col("__g")).as("__sz"),
      explode(col("__g")).as("gram")).persist()
    time("ng_exploded")(exploded.count())
    val freq = exploded.groupBy("gram").agg(count(lit(1)).as("df_")).persist()
    time("ng_freq")(freq.count())
    val ranked = exploded.join(freq, "gram")
    time("ng_ranked")(ranked.count())
    val withArr = ranked
      .groupBy("__id")
      .agg(sort_array(collect_list(struct(col("df_"), col("gram")))).as("__sorted"),
        first(col("__sz")).as("__n"))
      .withColumn("__L",
        (col("__n") - ceil(lit(0.9) * col("__n")) + 1).cast("int"))
      .select(col("__id"), col("__n"),
        slice(transform(col("__sorted"), s => s.getField("gram")), lit(1),
          greatest(col("__L"), lit(1))).as("__prefix"))
    time("ng_prefix")(withArr.count())
    val inverted = withArr.select(col("__id"), col("__n"),
      explode(col("__prefix")).as("gram")).persist()
    time("ng_inverted")(inverted.count())
    val ia = inverted.select(col("gram"), col("__id").as("a_id"), col("__n").as("__sa"))
    val ib = inverted.select(col("gram"), col("__id").as("b_id"), col("__n").as("__sb"))
    val ncands = ia.join(ib, Seq("gram"))
      .where(col("a_id") < col("b_id") &&
        col("__sa") >= col("__sb") * 0.9 &&
        col("__sb") >= col("__sa") * 0.9)
      .select("a_id", "b_id").distinct()
    time("ng_cands")(ncands.count())
    System.gc()
    time("ng_full")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.9).count())
    System.gc()

    // ---- simhash ----
    time("sh_full")(Dedup.simhashPairs(docs, "doc_id", "text").count())

    spark.stop()
  }
}
