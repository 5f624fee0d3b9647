package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Stage decomposition for q_dedup_best (r15 verdict item 8) plus a direct
  * measurement of verifyPairs' broadcast-decision stats job (item 7).
  * Mirrors the REAL pipeline stages. */
object ProfBest {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").cache()
    docs.count()

    def time(label: String)(body: => Long): Unit =
      (1 to 2).foreach { rep =>
        val t0 = System.nanoTime()
        val n = body
        println(f"[profbest] $label%-24s rep$rep ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
        System.gc()
      }

    // verifyPairs stats job in isolation: the (count, sum(size)) aggregate
    // over the hashed token sets — cold (first materialization of toks)
    // and warm (cache hit) variants
    val toksCold = docs.select(col("doc_id").as("__tid"),
      Dedup.hashedSet(Dedup.tokenSet(col("text"))).as("__toks"))
    time("stats_job_uncached") {
      val r = toksCold.agg(count(lit(1)).as("__n"),
        sum(size(col("__toks"))).as("__e")).first()
      r.getLong(0)
    }
    val toksP = toksCold.persist()
    toksP.count()
    time("stats_job_cached") {
      val r = toksP.agg(count(lit(1)).as("__n"),
        sum(size(col("__toks"))).as("__e")).first()
      r.getLong(0)
    }
    toksP.unpersist(blocking = true)

    // q_dedup_best stage split
    time("mh_pairs_full")(
      Dedup.minhashPairs(docs, "doc_id", "text", 0.95).count())
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", 0.95)
      .localCheckpoint()
    time("clusters_on_ckpt_pairs")(
      Dedup.duplicateClusters(pairs).count())
    val clusters = Dedup.duplicateClusters(pairs).localCheckpoint()
    time("keepbest_tail_only") {
      val df = docs.select(col("doc_id"), col("lang"), col("n_chars"))
      val scored = df.select(col("doc_id"), col("n_chars"))
        .join(clusters.withColumnRenamed("id", "doc_id"), Seq("doc_id"))
      val best = scored.groupBy(col("cluster_id"))
        .agg(max(col("n_chars")).as("__best"))
      val winners = scored.join(best, Seq("cluster_id"))
        .where(col("n_chars") <=> col("__best"))
        .groupBy(col("cluster_id"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
      val losers = scored.select(col("doc_id"))
        .join(winners, Seq("doc_id"), "left_anti")
      df.join(losers, Seq("doc_id"), "left_anti").count()
    }
    time("q_dedup_best_full") {
      val pairs2 = Dedup.minhashPairs(docs, "doc_id", "text", 0.95)
      Dedup.keepBest(docs.select(col("doc_id"), col("lang"), col("n_chars")),
        "doc_id", "n_chars", pairs2).count()
    }
    spark.stop()
  }
}
