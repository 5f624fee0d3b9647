package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scratch A/B: the two sharedWindowPairs formulations (bucket-aggregate
  * vs exchange-reusing self-join), alternated in one JVM to cancel host
  * drift. */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/repo/bench_sf/sf3")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sf/documents.parquet")

    def joinForm(df: DataFrame, windowTokens: Int): DataFrame = {
      val toks = split(lower(col("text")), " ")
      val windows = when(size(toks) >= windowTokens,
        array_distinct(transform(
          sequence(lit(0), size(toks) - windowTokens),
          i => xxhash64(concat_ws("",
            slice(toks, i + 1, lit(windowTokens)))))))
        .otherwise(array().cast("array<long>"))
      val w = df.select(col("doc_id").as("__id"), explode(windows).as("__w"))
      w.as("a").join(w.as("b"),
          col("a.__w") === col("b.__w") && col("a.__id") < col("b.__id"))
        .groupBy(col("a.__id").as("a_id"), col("b.__id").as("b_id"))
        .agg(count(lit(1)).as("shared_windows"))
    }

    def t(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[pd] $name rows=$n ${(System.nanoTime() - t0) / 1e9}%.1fs")
      System.gc()
    }
    (1 to 3).foreach { r =>
      t(s"agg_$r") { Dedup.sharedWindowPairs(docs, "doc_id", "text", 10).count() }
      t(s"join_$r") { joinForm(docs, 10).count() }
    }
    spark.stop()
  }
}
