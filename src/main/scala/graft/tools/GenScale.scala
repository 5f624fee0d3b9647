package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator for the scale-validation bench (VERDICT r3 item 5):
  * replicates the driver's sf0.1 testdata `copies`× with consistent key
  * remapping (joins keep their selectivity), synthesizes a NON-self-similar
  * document corpus (the driver's corpus is near-all-pairs-similar, which
  * makes every near-dup bench candidate-bound by construction), and
  * perturbs replicated embeddings so they aren't exact duplicates.
  *
  * Usage: runMain graft.tools.GenScale [srcDir] [outDir] [copies] [tables]
  * Writes `{table}.parquet` per table under outDir — the same layout the
  * driver uses, so `Lake.get(spark, outDir)` works unchanged. `tables` is
  * an optional comma list to (re)generate a subset.
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/root/repo/bench_sf/sf3")
    val copies = args.lift(2).map(_.toInt).getOrElse(30)
    val only: Option[Set[String]] =
      args.lift(3).map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    def wanted(t: String): Boolean = only.forall(_.contains(t))
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-genscale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String, parts: Int): Unit = if (wanted(t)) {
      df.repartition(parts).write.mode("overwrite").parquet(s"$out/$t.parquet")
      System.err.println(s"[genscale] wrote $t x$copies")
    }
    def keySpan(t: String, c: String): Long =
      read(t).agg(max(col(c))).first().getLong(0) + 1
    // one replica per copy index; key columns shift by copy * span.
    // The source is re-spread over the cores FIRST: an sf0.1 table is
    // 1-2 parquet splits, and at x300 the explode would otherwise run
    // the whole copies-multiplication (and the shuffle-write ahead of
    // the output repartition) on 1-2 tasks — observed single-core for
    // 25+ min on lineitem x300
    def rep(df: DataFrame): DataFrame =
      df.repartition(64)
        .withColumn("cp", explode(sequence(lit(0L), lit((copies - 1).toLong))))
    def shift(c: String, span: Long) = col(c) + col("cp") * span

    val ok = keySpan("orders", "o_orderkey")
    val ck = keySpan("customer", "c_custkey")
    val pk = keySpan("part", "p_partkey")
    val sk = keySpan("supplier", "s_suppkey")
    val ek = keySpan("events", "event_id")
    val uk = keySpan("events", "user_id")
    val dk = keySpan("documents", "doc_id")
    val vk = keySpan("embeddings", "vec_id")

    // tiny dims: copy as-is
    Seq("region", "nation").foreach(t => write(read(t), t, 1))

    write(rep(read("customer"))
      .withColumn("c_custkey", shift("c_custkey", ck)).drop("cp"), "customer", 4)
    write(rep(read("supplier"))
      .withColumn("s_suppkey", shift("s_suppkey", sk)).drop("cp"), "supplier", 1)
    write(rep(read("part"))
      .withColumn("p_partkey", shift("p_partkey", pk)).drop("cp"), "part", 4)
    write(rep(read("orders"))
      .withColumn("o_orderkey", shift("o_orderkey", ok))
      .withColumn("o_custkey", shift("o_custkey", ck)).drop("cp"), "orders", 16)
    write(rep(read("lineitem"))
      .withColumn("l_orderkey", shift("l_orderkey", ok))
      .withColumn("l_partkey", shift("l_partkey", pk))
      .withColumn("l_suppkey", shift("l_suppkey", sk)).drop("cp"), "lineitem", 32)
    // ts is TIMESTAMP_NTZ (µs); +cp MICROSECONDS breaks exact ts ties
    // between replicas without moving any row across a time bucket
    write(rep(read("events"))
      .withColumn("event_id", shift("event_id", ek))
      .withColumn("user_id", shift("user_id", uk))
      .withColumn("ts", expr(
        "cast(timestamp_micros(unix_micros(cast(ts as timestamp)) + cp)" +
          " as timestamp_ntz)")).drop("cp"), "events", 16)

    // documents: synthesized token text. ~1/37 of docs are near-duplicates
    // of their predecessor (same seed, one extra token); everything else is
    // hash-unique, so candidate pairs ≪ n² and a near-dup bench measures
    // the bucketing, not an all-pairs verify. Words are base-36 renderings
    // of a 20k vocab (3-4 chars over a 36-letter alphabet): random docs
    // share ~0.5 of 100 TOKENS and only a handful of CHARACTER 3-grams, so
    // both word-level (minhash) and char-level (ngram) dedup see a truly
    // non-self-similar corpus ("w"+small-int words made every doc >90%
    // 3-gram-similar to every other — the 12-char alphabet was the bug).
    val docs = rep(read("documents").select("doc_id", "source"))
      .withColumn("doc_id", shift("doc_id", dk)).drop("cp")
      .withColumn("__dup", pmod(col("doc_id"), lit(37L)) === 0 && pmod(col("doc_id"), lit(dk)) =!= 0)
      .withColumn("__seed", when(col("__dup"), col("doc_id") - 1).otherwise(col("doc_id")))
      .withColumn("__ntok", (pmod(xxhash64(col("__seed")), lit(150L)) + 30).cast("int"))
      .withColumn("text", concat_ws(" ",
        concat(transform(sequence(lit(1), col("__ntok")),
          i => conv((pmod(xxhash64(col("__seed"), i), lit(20000L)) + 10000)
            .cast("string"), 10, 36)),
          when(col("__dup"), array(lit("ZDUPMARKZ"))).otherwise(array()))))
      .withColumn("lang", element_at(
        array(lit("en"), lit("de"), lit("fr"), lit("es")),
        (pmod(xxhash64(col("doc_id")), lit(4L)) + 1).cast("int")))
      .withColumn("n_chars", length(col("text")))
      .select("doc_id", "text", "lang", "source", "n_chars")
    write(docs, "documents", 8)

    // embeddings: replicate + deterministic per-(vector, dim) perturbation so
    // replicas are near- but not exact duplicates of their source vector
    val emb = rep(read("embeddings"))
      .withColumn("vec_id", shift("vec_id", vk))
      .withColumn("embedding", transform(col("embedding"), (x, i) =>
        (x + (pmod(xxhash64(col("vec_id"), i), lit(1000L)).cast("double") / 1000.0 - 0.5)
          * lit(0.1)).cast("float")))
      .drop("cp")
    write(emb, "embeddings", 4)

    System.err.println(s"[genscale] done -> $out")
    spark.stop()
  }
}
