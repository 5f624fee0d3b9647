package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.harness.Lake
import graft.operators.IndexJoin

/** Per-round benchmark: lake setup (split + index build) timed separately,
  * then every SparkEntry query, plus headline indexed-vs-fullscan join
  * timings and pruning effectiveness (the BASELINE.md metric plan). Prints
  * ONE JSON line. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // lake setup: file splits + every index build, built concurrently —
    // independent per-table builds parallelize on a cluster the same way
    val (lake, setupSec) = time {
      val lk = Lake.get(spark, sfDir)
      lk.prebuild()
      lk
    }

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    results("x_lake_setup") = setupSec

    // A rep that THROWS must never record its fail-fast elapsed time as a
    // legitimate sample — median3 over {fast-fail, fast-fail, real} would
    // silently SHRINK the committed medians, the exact silent-shrink the
    // missing-gate require below guards against. Failures poison the
    // sample with Double.MaxValue: a failing query can only make the
    // totals loudly absurd, never quietly better.
    val FailedRep = Double.MaxValue
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      var ok = true
      val (_, sec) = time {
        try fn(spark, sfDir).count()
        catch { case e: Throwable =>
          ok = false
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1L }
      }
      results(name) = if (ok) sec else FailedRep
      System.err.println(f"[bench] $name $sec%.1fs")
      // nudge the ContextCleaner: dereferenced shuffles/broadcasts from the
      // previous query are only reclaimed after a GC notices the weak refs;
      // without this, state from the 10^8-row dedup shuffles degrades every
      // subsequent query in the shared JVM
      System.gc()
    }

    // headline: indexed join vs full-scan join on a KEY-LOCAL probe (a
    // customer-segment slice whose keys cluster in few band files — the
    // access pattern file pruning exists for; an acctbal-style predicate
    // spreads over every band and prunes nothing by construction)
    val maxCust = lake.customers.agg(max("c_custkey")).first().getLong(0)
    val probe = lake.customers
      .where(col("c_custkey") <= maxCust / 8 && col("c_acctbal") > 5000)
      .select(col("c_custkey").as("o_custkey"))
    // timed runs measure the join alone; pruning telemetry is collected in a
    // separate untimed run so the indexed side isn't billed for two extra
    // metric aggregates the full scan doesn't pay
    val (_, idxJoinSec) = time {
      lake.ordersIdx.join(probe, Seq("o_custkey")).count()
    }
    val (_, fullJoinSec) = time {
      spark.read.parquet(lake.ordersFiles: _*).join(probe, Seq("o_custkey")).count()
    }
    spark.conf.set("spark.graft.metricsEnabled", "true")
    lake.ordersIdx.join(probe, Seq("o_custkey")).count()
    val pruning = IndexJoin.lastMetrics
    spark.conf.set("spark.graft.metricsEnabled", "false")
    results("x_join_indexed") = idxJoinSec
    results("x_join_fullscan") = fullJoinSec
    pruning.foreach { m =>
      results("x_files_read_frac") =
        if (m.totalFiles == 0) 1.0 else m.locatedFiles.toDouble / m.totalFiles
      results("x_bytes_pruned_pct") = m.pct
    }

    // gate median protocol (r12 verdict item #5): the committed headline
    // numbers are per-query MEDIANS of three interleaved sittings — rep 1
    // is the full-sweep pass above; reps 2-3 re-run the gate set (and the
    // headline joins) rep-major, the TriageBench discipline — so a single
    // ambient spike can no longer move the round's gate_total and the
    // record needs no quiet-box footnotes.
    val gateSet = Seq(
      "q_ann_ivf", "q_ann_lsh", "q_ann_pairs", "q_ann_topk", "q_bloom_probe",
      "q_computed_probe", "q_csv_read", "q_dedup_exact", "q_dedup_hash",
      "q_dedup_minhash", "q_dedup_ngram", "q_dedup_simhash",
      "q_exploded_probe", "q_fingerprint", "q_json_read", "q_lang_id",
      "q_multicol_and", "q_multimodal_meta", "q_pruned_agg", "q_quality",
      "q_range_probe", "q_regular_join", "q_regular_probe", "q_reverse_join",
      "q_select_join", "q_sql_join", "q_sql_where", "q_temporal_latest",
      "q_token_count")
    val missingGate = gateSet.filterNot(results.contains)
    require(missingGate.isEmpty,
      s"gate queries missing from this bench run: ${missingGate.mkString(", ")} — " +
        "a renamed/dropped gate query must fail loudly, not shrink gate_total")
    val reps = scala.collection.mutable.LinkedHashMap[String, List[Double]]()
    (gateSet ++ Seq("x_join_indexed", "x_join_fullscan"))
      .foreach(n => reps(n) = List(results(n)))
    (2 to 3).foreach { rep =>
      gateSet.foreach { name =>
        var ok = true
        val (_, sec) = time {
          try SparkEntry.queries(name)(spark, sfDir).count()
          catch { case e: Throwable =>
            ok = false
            System.err.println(s"[bench] $name rep$rep failed: ${e.getMessage}"); -1L }
        }
        reps(name) = (if (ok) sec else FailedRep) :: reps(name)
        System.gc()
      }
      val (_, i2) = time {
        lake.ordersIdx.join(probe, Seq("o_custkey")).count()
      }
      val (_, f2) = time {
        spark.read.parquet(lake.ordersFiles: _*)
          .join(probe, Seq("o_custkey")).count()
      }
      reps("x_join_indexed") = i2 :: reps("x_join_indexed")
      reps("x_join_fullscan") = f2 :: reps("x_join_fullscan")
      System.err.println(f"[bench] gate rep$rep done")
    }
    def median3(xs: List[Double]): Double = xs.sorted.apply(xs.size / 2)
    reps.foreach { case (n, xs) => results(n) = median3(xs) }

    val qTotal = SparkEntry.queries.keys.map(results).sum
    val qs = results.map { case (k, v) => "\"" + k + f"""":$v%.3f""" }.mkString("{", ",", "}")
    val repsJson = reps.map { case (k, xs) =>
      "\"" + k + "\":[" + xs.reverse.map(v => f"$v%.3f").mkString(",") + "]"
    }.mkString("{", ",", "}")
    val fullLine =
      f"""{"metric":"total","value":$qTotal%.3f,"unit":"sec","gate_protocol":"median3_interleaved","queries":$qs%s,"gate_reps":$repsJson%s,"sf":"$sfDir%s"}"""
    println(fullLine)
    // the harness keeps only the last ~2000 chars of output and parses the
    // final metric line; the full per-query map (~2.8 KB at 98 queries) no
    // longer fits, truncating its head and failing the parse (r6 finding
    // #3). Persist the full line to a file and END with a compact line —
    // total + the r2-baseline 29-query gate set + headline metrics — that
    // fits the capture window whole.
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_SELF.json"),
        (fullLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Exception =>
      System.err.println(s"[bench] BENCH_SELF.json write failed: $e") }
    val gateTotal = gateSet.flatMap(results.get).sum
    val compactQs = (gateSet ++ results.keys.filter(_.startsWith("x_")))
      .flatMap(k => results.get(k).map(v => "\"" + k + f"""":$v%.3f"""))
      .mkString("{", ",", "}")
    println(f"""{"metric":"total","value":$qTotal%.3f,"unit":"sec","gate_total":$gateTotal%.3f,"gate_protocol":"median3_interleaved","queries":$compactQs%s,"sf":"$sfDir%s","full":"BENCH_SELF.json"}""")
    spark.stop()
  }
}
