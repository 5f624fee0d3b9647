package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.harness.Lake
import graft.operators.{Dedup, Graph}

/** Core-scaling probe (r14 verdict item #5): the sf0.1 gate bench cannot
  * demonstrate parallel scaling — all 34 entries run at the per-job
  * scheduling/latency floor, so 8-vs-32-core ratios are ≈1 and every
  * "100 TB shape" claim rests on plan reading alone. This tool runs the
  * heaviest DATA-BOUND query shapes (the exact operator calls SparkEntry's
  * q_dedup_minhash / q_dedup_ngram / q_dedup_best / q_pagerank / q_hits /
  * q_walk_pmi make) over the GenScale ×30 dataset (~sf3: 150k
  * non-self-similar docs, 18M lineitem) at `local[$SPARK_GRAFT_CPUS]`, so
  * a 32-core and an 8-core run of the SAME binary measure whether the
  * shapes actually parallelize.
  *
  * Two timed reps per query: rep1 pays Janino/JIT compilation (identical
  * at both core counts — it is driver-side and single-threaded), rep2 is
  * the warm, data-bound number the scaling ratio should be read from.
  * Prints ONE JSON line: {"metric":"scale_cores", "cpus":N,
  * "queries":{name:[rep1,rep2],...}, "sf":dir}.
  */
object ScaleCores {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/bench_sf/sf3")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scalecores")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lake = Lake.get(spark, sfDir)

    def time(body: => Long): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = body
      (n, (System.nanoTime() - t0) / 1e9)
    }

    val results = scala.collection.mutable.LinkedHashMap[String, List[Double]]()
    val rows = scala.collection.mutable.LinkedHashMap[String, Long]()
    def bench(name: String)(body: => Long): Unit = {
      spark.sparkContext.setJobDescription(name)
      val reps = (1 to 2).map { rep =>
        val (n, sec) = time {
          try body
          catch { case e: Throwable =>
            System.err.println(s"[scalecores] $name rep$rep FAILED: ${e.getMessage}")
            -1L }
        }
        rows(name) = n
        System.err.println(f"[scalecores] $name rep$rep $sec%.1fs ($n rows)")
        System.gc()
        sec
      }
      results(name) = reps.toList
      spark.sparkContext.setJobDescription(null)
    }

    // identical edge frame to SparkEntry's q_pagerank / q_hits
    def supplierCustomerEdges = lake.lineitem
      .join(lake.orders, col("l_orderkey") === col("o_orderkey"))
      .select((col("l_suppkey") + lit(1000000L)).as("src"),
        col("o_custkey").as("dst"))
      .distinct()

    bench("sc_dedup_minhash") {
      Dedup.minhashPairs(lake.documents, "doc_id", "text", threshold = 0.95)
        .count()
    }
    bench("sc_dedup_ngram") {
      Dedup.ngramJaccardPairs(lake.documents, "doc_id", "text",
        threshold = 0.9).count()
    }
    bench("sc_dedup_best") {
      val pairs = Dedup.minhashPairs(lake.documents, "doc_id", "text",
        threshold = 0.95)
      Dedup.keepBest(
        lake.documents.select(col("doc_id"), col("lang"), col("n_chars")),
        "doc_id", "n_chars", pairs).count()
    }
    bench("sc_pagerank") {
      Graph.pageRank(supplierCustomerEdges, "src", "dst", iters = 5).count()
    }
    bench("sc_hits") {
      Graph.hits(supplierCustomerEdges, "src", "dst", iters = 4).count()
    }
    bench("sc_walk_pmi") {
      val e0 = lake.lineitem
        .where(col("l_quantity") === 1 &&
          pmod(col("l_partkey"), lit(5)) === 0)
        .select((col("l_suppkey") + lit(1000000L)).as("src"),
          col("l_partkey").as("dst"))
        .distinct()
      val co = e0.select(col("dst").as("p"), col("src").as("s1"))
        .join(e0.select(col("dst").as("p"), col("src").as("s2")), "p")
        .where(col("s1") < col("s2"))
        .select(col("s1"), col("s2")).distinct()
      val sym = co.unionAll(
        co.select(col("s2").as("s1"), col("s1").as("s2")))
      val walks = Graph.randomWalks(sym, "s1", "s2", walkLength = 3,
        walksPerNode = 2)
      Graph.walkPmi(Graph.walkSkipGrams(walks, window = 2)).count()
    }

    val qs = results.map { case (k, reps) =>
      "\"" + k + "\":[" + reps.map(v => f"$v%.3f").mkString(",") + "]"
    }.mkString("{", ",", "}")
    val rw = rows.map { case (k, n) => "\"" + k + "\":" + n }
      .mkString("{", ",", "}")
    println(s"""{"metric":"scale_cores","cpus":$cpus,"queries":$qs,"rows":$rw,"sf":"$sfDir"}""")
    spark.stop()
  }
}
