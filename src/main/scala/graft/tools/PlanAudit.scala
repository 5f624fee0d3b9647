package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Prints the physical-plan scan lines for the core queries: PushedFilters
  * must carry the residual predicates, ReadSchema must be pruned to the
  * selected columns, and no UDF/BatchEval barrier may appear in a scan. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = "/root/testdata/sf0.01"
    Seq("q_regular_probe", "q_select_join", "q_regular_join", "q_pruned_agg",
      "q_autobloom", "q_compact_probe",
      "q_asof_join", "q_asof_index", "q_interval_index", "q_decontaminate",
      "q_pipeline_curate",
      // r4 additions: de-windowed temporal serving path, SQL range pruning,
      // two-level group top-k, header-parsed multimodal metadata
      "q_temporal_latest", "q_sql_range", "q_topk_group", "q_multimodal_meta",
      // r5 additions: corpus-frequency text ops (no UDFs, broadcast strip
      // lists), mixture/shard sampling (explode / one-shuffle window)
      "q_strip_lines", "q_span_removal", "q_vocab", "q_mix_weights",
      "q_shard_assign",
      // r5 late additions: sessionization (one window), trained IVF
      // (k scans + nCells-row aggs), int8 quantization and wav header
      // parsing (pure per-row codegen)
      "q_sessionize", "q_session_stats", "q_kmeans_assign",
      "q_quantize_int8", "q_audio_meta",
      // r6 additions: interval-based span cuts (cross-corpus), paragraph
      // dedup, A-ES weighted sample (TakeOrdered, no full sort), rolling
      // range-frame features (single exchange+sort), greedy BPE counts
      "q_contaminated_spans", "q_dedup_paragraphs", "q_sample_weighted",
      "q_rolling_stats", "q_bpe_tokens", "q_sessionize_bucketed")
      .foreach { name =>
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.collect() // finalize AQE so the printed plan is the executed one
        val plan = df.queryExecution.executedPlan.toString
        println(s"=== $name ===")
        plan.linesIterator
          .filter(l => l.contains("PushedFilters") || l.contains("ReadSchema") ||
            l.contains("Scan parquet") || l.toLowerCase.contains("udf"))
          .take(8)
          .foreach(l => println("  " + l.trim.take(240)))
        // codegen stages appear as "*(n) Op" markers in the finalized plan
        val spans = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan).map(_.group(1).toInt).toSet
        println(s"  wholeStageCodegen-spans=${spans.size}")
      }
    spark.stop()
  }
}
