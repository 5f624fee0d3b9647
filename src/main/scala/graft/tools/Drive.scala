package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Index
import graft.operators.IndexJoin

/** Manual end-to-end drive of the library through its public API — a
  * scratchpad main used by the project verify flow (not part of the API). */
object Drive {
  def main(args: Array[String]): Unit = {
    val work = java.nio.file.Files.createTempDirectory("graft_drive_").toString
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS) which Spark 4 rejects;
      // read as epoch-ns long (matches DuckDB's epoch_ns(ts) for oracles)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.graft.storagePath", s"$work/store")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val sf = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val events = spark.read.parquet(s"$sf/events.parquet")

    // split orders into 8 files by orderkey band
    val lakeDir = s"$work/lake/orders"
    orders.withColumn("band", pmod(col("o_orderkey"), lit(8)))
      .write.partitionBy("band").mode("overwrite").parquet(lakeDir)
    val orderFiles = new java.io.File(lakeDir).listFiles()
      .filter(_.isDirectory).flatMap(_.listFiles())
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    println(s"[drive] orders split into ${orderFiles.size} files")

    // NOTE partitionBy drops the band col from the files; schema = orders minus nothing
    val schema = orders.schema

    // 1) regular index + join: exercises _metadata attribution with no UDF
    val idx = Index(spark, "orders_drive", schema, "parquet")
    idx.addIndex("o_custkey")
    idx.addFile(orderFiles: _*)
    idx.update()
    val probe = spark.read.parquet(s"$sf/customer.parquet")
      .where(col("c_acctbal") > 9000)
      .select(col("c_custkey").as("o_custkey"))
    val joined = idx.join(probe, Seq("o_custkey"))
    val got = joined.count()
    val expect = orders.join(probe, Seq("o_custkey")).count()
    println(s"[drive] 1-regular-join rows got=$got expect=$expect " +
      (if (got == expect) "OK" else "MISMATCH"))
    val plan = joined.queryExecution.executedPlan.toString
    val udfInScan = plan.linesIterator.exists(l =>
      l.contains("Scan parquet") && l.toLowerCase.contains("udf"))
    println(s"[drive] 1-plan-scan-has-udf=$udfInScan (want false); " +
      s"plan mentions UDF anywhere=${plan.toLowerCase.contains("udf")}")

    // 2) metrics off by default
    IndexJoin.lastMetrics = None
    idx.join(probe, Seq("o_custkey")).count()
    println(s"[drive] 2-metrics-default=${IndexJoin.lastMetrics} (want None)")
    spark.conf.set("spark.graft.metricsEnabled", "true")
    idx.join(probe, Seq("o_custkey")).count()
    println(s"[drive] 2-metrics-enabled=${IndexJoin.lastMetrics} (want Some)")
    spark.conf.set("spark.graft.metricsEnabled", "false")

    // 3) temporal + select(): ts column force-read then dropped
    val evDir = s"$work/lake/events"
    events.withColumn("band", pmod(col("event_id"), lit(4)))
      .write.partitionBy("band").mode("overwrite").parquet(evDir)
    val evFiles = new java.io.File(evDir).listFiles()
      .filter(_.isDirectory).flatMap(_.listFiles())
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    val eidx = Index(spark, "events_drive", events.schema, "parquet")
    eidx.addTemporalIndex("user_id", "ts")
    eidx.addFile(evFiles: _*)
    eidx.update()
    val users = Seq(1L, 2L, 3L).toDF("user_id")
    val sel = eidx.select("event_id", "user_id", "event_type")
    val latest = sel.join(users, Seq("user_id"))
    val latestRows = latest.collect()
    println(s"[drive] 3-temporal-select cols=${latest.columns.mkString(",")} " +
      s"rows=${latestRows.length} (want 3 users, no ts col)")
    // oracle: latest event per user over full scan
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").desc)
    val oracle = events.join(users, Seq("user_id"))
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select("event_id").as[Long].collect().toSet
    val gotIds = latestRows.map(_.getAs[Long]("event_id")).toSet
    println(s"[drive] 3-temporal-latest ids match oracle=${gotIds == oracle}")

    // 4) auto-bloom pre-filter on DataFrame probes with large-index eviction
    spark.conf.set("spark.graft.largeIndexLimit", "50")
    val lidx = Index(spark, "orders_large_drive", schema, "parquet")
    lidx.addIndex("o_orderkey")
    lidx.addFile(orderFiles: _*)
    lidx.update()
    val keyProbe = orders.select("o_orderkey").limit(5)
    val lg = lidx.join(keyProbe.distinct(), Seq("o_orderkey")).count()
    val le = orders.join(keyProbe.distinct(), Seq("o_orderkey")).count()
    println(s"[drive] 4-large-index-frame-probe got=$lg expect=$le " +
      (if (lg == le) "OK" else "MISMATCH"))
    spark.conf.unset("spark.graft.largeIndexLimit")

    // 5) SQL catalog: WHERE IN pushdown + join rewrite rule
    spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    val sqlWhere = spark.sql(
      "SELECT o_orderkey, o_custkey FROM graft.orders_drive WHERE o_custkey IN (1, 7, 42)")
    val sqlWhereN = sqlWhere.count()
    val oracleWhereN = orders.where(col("o_custkey").isin(1, 7, 42)).count()
    println(s"[drive] 5-sql-where got=$sqlWhereN expect=$oracleWhereN " +
      (if (sqlWhereN == oracleWhereN) "OK" else "MISMATCH"))

    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.catalog.GraftJoinRule :+
        graft.catalog.GraftBroadcastHintRule
    probe.createOrReplaceTempView("drive_probe")
    val sqlJoin = spark.sql(
      """SELECT o.o_orderkey, o.o_custkey FROM graft.orders_drive o
         JOIN drive_probe p ON o.o_custkey = p.o_custkey""")
    val sqlJoinN = sqlJoin.count()
    println(s"[drive] 5-sql-join got=$sqlJoinN expect=$expect " +
      (if (sqlJoinN == expect) "OK" else "MISMATCH"))
    val rewritten = sqlJoin.queryExecution.optimizedPlan.toString
    // if the rule fired, the graft side is a parquet read, not the catalog table
    println(s"[drive] 5-join-rewrite-applied=${!rewritten.contains("graft.orders_drive")}")

    // user filter above the relation must survive the rewrite
    val sqlJoinF = spark.sql(
      """SELECT o.o_orderkey FROM graft.orders_drive o
         JOIN drive_probe p ON o.o_custkey = p.o_custkey
         WHERE o.o_orderstatus = 'F'""")
    val fGot = sqlJoinF.count()
    val fExpect = orders.join(probe, Seq("o_custkey"))
      .where(col("o_orderstatus") === "F").count()
    val fRewrote = !sqlJoinF.queryExecution.optimizedPlan.toString.contains("graft.orders_drive")
    println(s"[drive] 5-sql-join-filter got=$fGot expect=$fExpect rewrote=$fRewrote " +
      (if (fGot == fExpect) "OK" else "MISMATCH"))

    // 6) streaming replay hygiene: same batchId re-ingested with new content
    val sidx = Index(spark, "stream_drive",
      Seq((1L, "a")).toDF("id", "v").schema, "parquet")
    sidx.addIndex("id")
    val sDir = s"$work/streamdata"
    graft.streaming.StreamIngest.ingestBatch(sidx, sDir)(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), 0L)
    graft.streaming.StreamIngest.ingestBatch(sidx, sDir)(
      Seq((3L, "c"), (4L, "d")).toDF("id", "v"), 0L) // replay, new content
    val sNew = sidx.query(Map("id" -> Seq(3L, 4L))).count()
    val sOld = sidx.query(Map("id" -> Seq(1L, 2L))).count()
    val sDangling = sidx.files.count(f => !graft.store.Fs.exists(spark, f))
    println(s"[drive] 6-stream-replay new=$sNew (want 2) old=$sOld (want 0) " +
      s"dangling=$sDangling (want 0) files=${sidx.files.size} (want 1)")

    // 7. streaming stateful dedup: two micro-batches with in-batch and
    // cross-batch duplicates; only first-seen survives, min-id tiebreak
    {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val mem = MemoryStream[(Long, String)]
      val st = mem.toDF().toDF("doc_id", "text")
        .withColumn("ck", org.apache.spark.sql.functions.md5(col("text")))
      val q = graft.streaming.StreamOps.dedupFirstSeen(st, "ck", "doc_id")
        .writeStream.format("memory").queryName("drive_sdedup")
        .outputMode("append")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("drive_sd_").toString)
        .start()
      try {
        mem.addData((2L, "aa"), (1L, "aa"), (3L, "bb")); q.processAllAvailable()
        mem.addData((4L, "aa"), (5L, "cc")); q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("drive_sdedup").select("doc_id").collect()
        .map(_.getLong(0)).toSet
      println(s"[drive] 7-stream-dedup got=${got.toSeq.sorted.mkString(",")} " +
        s"(want 1,3,5) OK=${got == Set(1L, 3L, 5L)}")
    }

    // 8) index-accelerated as-of join vs brute-force inequality oracle
    {
      val probe = events.where(col("event_type") === "click" && col("user_id") < 5)
        .select(col("user_id"),
          (col("ts") - expr("interval 1 microsecond")).as("q_ts"),
          col("event_id").as("click_id"))
      val got = eidx.asOfJoin(probe, "user_id", "q_ts",
        valueCols = Seq("event_id"), rightTsAlias = "src_ts")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("click_id").orderBy(col("r_ts").desc)
      val brute = probe.join(
          events.select(col("user_id").as("r_uid"), col("ts").as("r_ts"),
            col("event_id").as("r_eid")),
          probe("user_id") === col("r_uid") && col("r_ts") <= probe("q_ts"), "left")
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("click_id"), col("r_eid"))
      val mism = got.select(col("click_id"), col("event_id"))
        .join(brute, Seq("click_id"))
        .where(!(col("event_id") <=> col("r_eid"))).count()
      println(s"[drive] 8-asof-index rows=${got.count()} mismatches=$mism (want 0) " +
        (if (mism == 0) "OK" else "MISMATCH"))
    }

    // 9) shuffle-free IVF assignment vs brute-force pairs (r5 rewrite):
    // candidates are a superset check — every brute pair IVF finds must be
    // real, and the IVF plan must carry NO exchange before the candidate join
    {
      import graft.operators.Similarity
      val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      val ivf = Similarity.ivfCosinePairs(emb, "vec_id", "embedding", 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = Similarity.cosinePairs(emb, "vec_id", "embedding", 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val falsePos = ivf.diff(brute).size
      println(s"[drive] 9-ivf pairs=${ivf.size} brute=${brute.size} " +
        s"falsePositives=$falsePos (want 0) recall=${
          if (brute.isEmpty) 1.0 else ivf.intersect(brute).size.toDouble / brute.size}")
    }

    // 10) time-based vacuum dates from durable markers (r5 fix): compact
    // supersedes a version; retention=168h keeps it, then a backdated marker
    // lets vacuumRetention(1) reap it
    {
      import graft.store.Fs
      idx.compact()
      val tablePath = s"$work/store/indexes/orders_drive/index"
      idx.vacuumRetention(retentionHours = 168)
      val before = Fs.listDirs(spark, tablePath).count(_.startsWith("v"))
      val marked = Fs.listDirs(spark, tablePath).filter(d =>
        Fs.exists(spark, s"$tablePath/$d/_superseded_at"))
      println(s"[drive] 10-vacuum dirs=$before markedSuperseded=${marked.size} " +
        s"(want >=1) probeStillOk=${idx.join(orders.select("o_custkey").distinct(),
          Seq("o_custkey")).count() > 0}")
    }

    // 11) multi-temporal-config dedup (r5): two temporal indexes on events;
    // a probed row survives iff latest under EVERY config, winners computed
    // on the full filtered set. Oracle = window intersection over full scan.
    // Also: temporal column + second filter must read non-latest files.
    {
      val midx = Index(spark, "events_multi_drive", events.schema, "parquet")
      midx.addTemporalIndex("user_id", "ts")
      midx.addTemporalIndex("event_type", "ts")
      midx.addFile(evFiles: _*)
      midx.update()
      val users = (1L to 20L).toSeq
      val types = Seq("click", "view")
      val got = midx.query(Map("user_id" -> users, "event_type" -> types))
        .select("event_id").as[Long].collect().toSet
      val f = events.where(col("user_id").isin(users: _*) &&
        col("event_type").isin(types: _*))
      def winners(part: String) = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(part).orderBy(col("ts").desc, col("event_id").desc)
        f.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
          .select("event_id").as[Long].collect().toSet
      }
      val oracle = winners("user_id").intersect(winners("event_type"))
      println(s"[drive] 11-multi-temporal got=${got.size} oracle=${oracle.size} " +
        (if (got == oracle) "OK" else s"MISMATCH diff=${got.diff(oracle)}|${oracle.diff(got)}"))
      // containment fallback: temporal + regular filter; latest click per
      // user must surface even when the user's globally-latest row is a view
      val cidx = Index(spark, "events_mixed_drive", events.schema, "parquet")
      cidx.addTemporalIndex("user_id", "ts")
      cidx.addIndex("event_type")
      cidx.addFile(evFiles: _*)
      cidx.update()
      val got2 = cidx.query(Map("user_id" -> users, "event_type" -> Seq("click")))
        .select("event_id").as[Long].collect().toSet
      val f2 = events.where(col("user_id").isin(users: _*) &&
        col("event_type") === "click")
      val w2 = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      val oracle2 = f2.withColumn("rn", row_number().over(w2)).where(col("rn") === 1)
        .select("event_id").as[Long].collect().toSet
      println(s"[drive] 11-temporal-plus-filter got=${got2.size} oracle=${oracle2.size} " +
        (if (got2 == oracle2) "OK" else s"MISMATCH diff=${got2.diff(oracle2)}|${oracle2.diff(got2)}"))
    }

    // 12) r8: keepBest aggregate formulation vs the old window oracle on
    // real minhash pairs, + v2 centroid artifact round-trip
    {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      val scored = docs.withColumn("q", length(col("text")).cast("double"))
      val pairs = graft.operators.Dedup.minhashPairs(
        scored, "doc_id", "text", threshold = 0.7)
      val kept = graft.operators.Dedup.keepBest(
        scored.select("doc_id", "q"), "doc_id", "q", pairs)
        .select("doc_id").as[Long].collect().toSet
      val clusters = graft.operators.Dedup.duplicateClusters(pairs)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("cluster_id").orderBy(col("q").desc, col("doc_id"))
      val loserOracle = scored.join(
          clusters.withColumnRenamed("id", "doc_id"), Seq("doc_id"))
        .withColumn("rn", row_number().over(w)).where(col("rn") =!= 1)
        .select("doc_id").as[Long].collect().toSet
      val keptOracle = scored.select("doc_id").as[Long].collect().toSet
        .diff(loserOracle)
      val planStr = graft.operators.Dedup.keepBest(
        scored.select("doc_id", "q"), "doc_id", "q", pairs)
        .queryExecution.executedPlan.toString
      println(s"[drive] 12-keepbest got=${kept.size} oracle=${keptOracle.size} " +
        (if (kept == keptOracle) "OK" else "MISMATCH") +
        s" windowFree=${!planStr.contains("Window")} (want true)")

      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      val (cs, counts) = graft.operators.Similarity.trainCentroidSet(
        emb, "vec_id", "embedding", nCells = 4, iters = 1)
      val apath = s"$work/artifacts/cents.json"
      graft.store.Artifacts.saveCentroids(spark, apath, cs, counts)
      val (lcs, lcounts) = graft.store.Artifacts.loadCentroids(spark, apath,
        Some(graft.store.Artifacts.fingerprintOf(cs, counts)))
      val rt = lcs.vecs.map(_.toSeq).toSeq == cs.vecs.map(_.toSeq).toSeq &&
        lcounts.toSeq == counts.toSeq
      val driftCaught = try {
        val raw = graft.store.Fs.readString(spark, apath)
        val tam = raw.replaceAll(s"""${counts(0)},""", s"${counts(0) + 1},")
        graft.store.Fs.writeStringAtomic(spark, s"$work/artifacts/tam.json",
          if (tam != raw) tam else raw.replaceAll(
            s"""${counts(0)}\\s*\\]""", s"${counts(0) + 1} ]"))
        graft.store.Artifacts.loadCentroids(spark, s"$work/artifacts/tam.json")
        false
      } catch { case _: graft.ArtifactFormatException => true }
      println(s"[drive] 12-centroid-artifact roundTrip=$rt " +
        s"countDriftCaught=$driftCaught (want true true)")
    }

    // 13) r8: seeded corpus shuffle (growth-stable), artifact directory,
    // dedupLinesInDoc pathological-doc guard
    {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      val base = docs.where(col("doc_id") < 400).select("doc_id")
      val grown = docs.select("doc_id")
      def perm(df: org.apache.spark.sql.DataFrame) =
        graft.operators.Sampling.corpusShuffle(df, "doc_id", 4, seed = 99L)
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val pb = perm(base); val pg = perm(grown)
      val shardStable = pb.forall { case (id, (s, _)) => pg(id)._1 == s }
      val orderStable = (0L until 4L).forall { sh =>
        val b = pb.collect { case (id, (s, p)) if s == sh => (p, id) }.toSeq.sorted.map(_._2)
        val g = pg.collect { case (id, (s, p)) if s == sh && pb.contains(id) => (p, id) }
          .toSeq.sorted.map(_._2)
        b == g
      }
      val reseeded = graft.operators.Sampling
        .corpusShuffle(base, "doc_id", 4, seed = 100L)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      println(s"[drive] 13-corpus-shuffle shardStable=$shardStable " +
        s"orderStable=$orderStable seedChanges=${reseeded != pb} (want true true true)")

      val adir = s"$work/artifacts"
      val infos = graft.store.Artifacts.list(spark, adir)
      val df = graft.store.Artifacts.toDF(spark, adir)
      println(s"[drive] 13-artifact-dir n=${infos.size} kinds=" +
        infos.map(_.kind).mkString(",") +
        s" dfRows=${df.count()} summaries=${infos.map(_.summary).mkString("|")}")

      val longDoc = (1 to 10001).map(i => s"repeat line ${i % 2}").mkString("\n")
      val guarded = Seq((1L, longDoc)).toDF("id", "page")
        .select(graft.operators.TextAnalysis.dedupLinesInDoc(col("page")).as("t"))
        .collect().head.getString(0)
      println(s"[drive] 13-lines-guard passthrough=${guarded == longDoc} (want true)")
    }

    // r8: PQ — train, persist, reload, encode; ADC topK vs exact fp32 topK
    {
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      val cb = graft.operators.Similarity.trainPqCodebook(
        emb, "vec_id", "embedding", m = 16, k = 64, iters = 2)
      val path = s"$work/artifacts/pq_drive.json"
      graft.store.Artifacts.savePqCodebook(spark, path, cb)
      val lcb = graft.store.Artifacts.loadPqCodebook(spark, path,
        Some(graft.store.Artifacts.fingerprintOf(cb)))
      val enc = graft.operators.Similarity.pqEncode(emb, "embedding", lcb)
      val queries = emb.where(pmod(col("vec_id"), lit(100)) === 0)
      val approx = graft.operators.Similarity.pqTopK(enc, queries, lcb,
        "vec_id", "embedding", "pq_codes", k = 10, saltBuckets = 4)
      val exact = graft.operators.Similarity.topK(emb, queries,
        "vec_id", "embedding", k = 10)
      val a = approx.select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val x = exact.select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = a.intersect(x).size.toDouble / x.size
      println(f"[drive] 14-pq roundTrip=true recall@10=$recall%.2f " +
        s"(want >= 0.5 at m=16 k=64) rows=${a.size} (want ${x.size})")
      // IVF-PQ: nProbe=nCells degrades exactly to the full ADC scan;
      // pruned nProbe keeps most of the ADC ranking
      val (cs, _) = graft.operators.Similarity.trainCentroidSet(
        emb, "vec_id", "embedding", nCells = 8, iters = 1)
      val prepared = graft.operators.Similarity.ivfPqEncode(
        emb, "embedding", cs, lcb)
      val ivfAll = graft.operators.Similarity.ivfPqTopK(prepared, queries,
        cs, lcb, "vec_id", "embedding", k = 10, nProbe = 8)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val ivfPruned = graft.operators.Similarity.ivfPqTopK(prepared,
        queries, cs, lcb, "vec_id", "embedding", k = 10, nProbe = 2,
        saltBuckets = 4)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val adcRecall = ivfPruned.intersect(a).size.toDouble / a.size
      println(f"[drive] 14-ivfpq allProbe==fullAdc=${ivfAll == a} " +
        f"(want true) prunedVsAdcRecall=$adcRecall%.2f (nProbe 2/8)")
      // r11: the serving tail — exact fp32 re-rank of a 4·k inflated ADC
      // candidate list. Measured against brute-force exact top-10: plain
      // ADC recall vs rerank-tail recall shows what the standard tail
      // buys (the rerank can only fix ORDER errors inside the candidate
      // set, so the lift is bounded by candidate recall@40)
      val adcPlainRecall = a.intersect(x).size.toDouble / x.size
      val cand40 = graft.operators.Similarity.pqTopK(enc, queries, lcb,
        "vec_id", "embedding", "pq_codes", k = 40, saltBuckets = 4)
      val reranked = graft.operators.Similarity.exactRerank(cand40, emb,
        queries, "vec_id", "embedding", k = 10)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val rerankRecall = reranked.intersect(x).size.toDouble / x.size
      println(f"[drive] 14-rerank adc@10=$adcPlainRecall%.2f " +
        f"rerank(4k)@10=$rerankRecall%.2f (want rerank >= adc) " +
        f"lift=${rerankRecall - adcPlainRecall}%.2f rows=${reranked.size}")
    }

    // 15) r8: z-order layout — write z-ordered vs lexicographic, build
    // range indexes on both, compare file pruning for a secondary-column
    // box predicate; hard negatives — IVF(allProbe) == brute, semi-hard
    // bar honored
    {
      val ev = spark.read.parquet(s"$sf/events.parquet")
        .select("event_id", "user_id", "value")
      val zdir = s"$work/layout_z"
      val ldir = s"$work/layout_lex"
      graft.operators.Layout.zorderBy(ev, Seq("user_id", "value"),
        bits = 8, numFiles = 16).write.mode("overwrite").parquet(zdir)
      ev.repartitionByRange(16, col("user_id"), col("value"))
        .sortWithinPartitions("user_id", "value")
        .write.mode("overwrite").parquet(ldir)
      // per-file (min,max) of the SECONDARY column straight from the data
      def filesHit(dir: String): (Long, Long) = {
        val stats = spark.read.parquet(dir)
          .groupBy(input_file_name().as("f"))
          .agg(min("value").as("mn"), max("value").as("mx"))
        val Array(lo, hi) = spark.read.parquet(dir)
          .agg(min("value"), max("value")).collect()(0) match {
          case r => Array(r.getDouble(0), r.getDouble(1))
        }
        val qLo = lo + (hi - lo) * 0.45
        val qHi = lo + (hi - lo) * 0.55
        (stats.where(col("mx") >= qLo && col("mn") <= qHi).count(),
          stats.count())
      }
      val (zHit, zTot) = filesHit(zdir)
      val (lHit, lTot) = filesHit(ldir)
      val rows = spark.read.parquet(zdir).count()
      println(s"[drive] 15-zorder rowsPreserved=${rows == ev.count()} " +
        s"(want true) boxFilesHit z=$zHit/$zTot lex=$lHit/$lTot " +
        s"(want z < lex; lex ~ all)")

      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      val positives = emb.where(col("vec_id") < 12)
        .select(col("vec_id").as("query_id"),
          (col("vec_id") + 30L).as("pos_id"))
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.select("query_id", "neg_id", "rank")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val brute = pairs(graft.operators.Similarity.hardNegatives(
        emb, positives, "vec_id", "embedding", k = 7, semiHard = true))
      val ivfAllCells = pairs(graft.operators.Similarity.hardNegativesIvf(
        emb, positives, "vec_id", "embedding", k = 7, semiHard = true,
        nCells = 8, nProbe = 8, trainIters = 1, saltBuckets = 4))
      // semi-hard bar: every emitted sim strictly below nearest-positive sim
      val withSim = graft.operators.Similarity.hardNegatives(
        emb, positives, "vec_id", "embedding", k = 7, semiHard = true)
      println(s"[drive] 15-hardneg ivfAllProbe==brute=${ivfAllCells == brute} " +
        s"(want true) nPairs=${brute.size} " +
        s"anchors=${brute.map(_._1).size}")
      val noPos = positives.select(col("query_id"),
        col("pos_id").as("neg_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val leaked = brute.map(t => (t._1, t._2)).intersect(noPos)
      val selfHits = brute.count(t => t._1 == t._2)
      println(s"[drive] 15-hardneg-exclusion posLeaked=${leaked.size} " +
        s"selfHits=$selfHits (want 0 0)")
    }

    // 16) r8: streaming near-dup admission — three batches through the
    // persistent band store, with batch 1 REDELIVERED mid-stream; final
    // survivor set must equal the one-shot keepFirst(minhashPairs) oracle
    // over the concatenation, and the replay must re-emit identically.
    // Plus scriptSignals dominant-script routing on a hand-built frame.
    {
      import graft.operators.Dedup
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .select("doc_id", "text")
      val parts = Seq(
        docs.where(col("doc_id") % 3 === 0),
        docs.where(col("doc_id") % 3 === 1),
        docs.where(col("doc_id") % 3 === 2))
      val store = s"$work/neardup_drive"
      def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
        df.select("doc_id").collect().map(_.getLong(0)).toSet
      val s0 = ids(Dedup.nearDupIncrementalBatch(parts(0), "doc_id", "text",
        store, 0.9, batchId = 0))
      val s1 = ids(Dedup.nearDupIncrementalBatch(parts(1), "doc_id", "text",
        store, 0.9, batchId = 1))
      val s1r = ids(Dedup.nearDupIncrementalBatch(parts(1), "doc_id", "text",
        store, 0.9, batchId = 1)) // redelivery
      val s2 = ids(Dedup.nearDupIncrementalBatch(parts(2), "doc_id", "text",
        store, 0.9, batchId = 2))
      // one-shot oracle: id-ordered batches == keepFirst on the union ONLY
      // when batch order == id order; here batches interleave ids, so the
      // contract is the incremental one — first ADMITTED occurrence wins.
      // Check instead: admitted sets are disjoint, their union is dup-free
      // under the same threshold, and every non-admitted doc collides with
      // an earlier-admitted one.
      val admitted = s0 ++ s1 ++ s2
      val survUnion = docs.where(col("doc_id").isin(admitted.toSeq: _*))
      val residualPairs = Dedup.minhashPairs(survUnion, "doc_id", "text",
        threshold = 0.9).count()
      println(s"[drive] 16-neardup-stream replayStable=${s1r == s1} " +
        s"(want true) admitted=${admitted.size}/${docs.count()} " +
        s"residualDupPairs=$residualPairs (want 0)")

      val sdf = spark.createDataFrame(Seq(
        (1L, "plain latin text"), (2L, "привет мир"), (3L, "你好世界"),
        (4L, "مرحبا"), (5L, "12345"))).toDF("doc_id", "text")
      val scripts = graft.operators.TextAnalysis
        .scriptSignals(sdf, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getAs[String]("script")).toMap
      val wantScripts = Map(1L -> "latin", 2L -> "cyrillic", 3L -> "cjk",
        4L -> "arabic", 5L -> "other")
      println(s"[drive] 16-scripts ok=${scripts == wantScripts} " +
        s"got=${scripts.toSeq.sortBy(_._1).mkString(",")}")
    }

    // 17: fourth-wave surfaces — heavy hitters (batch + incremental
    // store), repetition signals vs a hand fixture, hll estimates, and
    // index-accelerated phrase search vs the token-aligned scan.
    {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      val toks = docs.select(explode(split(lower(col("text")), " ")).as("w"))
      val hhTop = graft.operators.Profile.heavyHitters(toks, "w", 5, 64)
        .collect()
      val exactTop = toks.groupBy("w").count()
        .orderBy(col("count").desc, col("w")).limit(5)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val hhOk = hhTop.map(r => (r.getString(0), r.getLong(1))).toSeq ==
        exactTop.toSeq
      val hhDir = java.nio.file.Files
        .createTempDirectory("drive_hh_").toString
      // pin the sample ONCE: un-ordered limit() is not deterministic
      // across re-evaluations, and the idempotence check needs the same
      // rows in all three jobs
      val sample = toks.limit(5000).localCheckpoint()
      graft.operators.Profile.heavyHittersIncrementalBatch(
        sample, "w", hhDir, 64, 0L)
      graft.operators.Profile.heavyHittersIncrementalBatch(
        sample, "w", hhDir, 64, 0L) // replay same epoch
      val viewN = graft.operators.Profile.heavyHittersView(spark, hhDir, 5)
        .agg(sum("count_min")).first().getLong(0)
      val oneN = graft.operators.Profile
        .heavyHitters(sample, "w", 5, 64)
        .agg(sum("count_min")).first().getLong(0)
      println(s"[drive] 17-heavyhitters batch==groupBy=$hhOk (want true) " +
        s"replayIdempotent=${viewN == oneN} (want true)")

      val rep = graft.operators.TextAnalysis.repetitionSignals(
        spark.createDataFrame(Seq((1L, "a b a b a b"))).toDF("id", "t"),
        "id", "t", topNs = Seq(2), dupNs = Seq(2)).first()
      println(s"[drive] 17-repetition top2=${rep.getDouble(1)} (want 1.0) " +
        s"dup2=${rep.getDouble(2)} (want 1.0)")

      val hname = "drive_hll_idx"
      graft.Index.remove(spark, hname)
      val hidx = graft.Index(spark, hname, docs.schema, "parquet")
      hidx.addHllIndex("doc_id") // unique ids: estimate ~ row count
      hidx.addIndex("lang")      // mixed-kind build in one batch
      hidx.addFile(s"$sf/documents.parquet")
      hidx.update()
      val nRows = docs.count()
      val hEst = hidx.distinctEstimate("doc_id")
      val langProbe = hidx.query(Map("lang" -> Seq("en"))).count()
      val langWant = docs.where(col("lang") === "en").count()
      println(s"[drive] 17-hll est=$hEst exact=$nRows " +
        s"ok=${math.abs(hEst - nRows).toDouble / nRows < 0.05} (want true) " +
        s"mixedKindProbe=${langProbe == langWant} (want true)")
      graft.Index.remove(spark, hname)

      val wname = "drive_win_idx"
      graft.Index.remove(spark, wname)
      val widx = graft.Index(spark, wname, docs.schema, "parquet")
      widx.addExplodedIndex("win_hash",
        graft.operators.Dedup.windowHashSqlExpr("text", 10))
      widx.addFile(s"$sf/documents.parquet")
      widx.update()
      val phrase = docs.where(col("doc_id") === 2)
        .select(concat_ws(" ",
          slice(split(lower(col("text")), " "), 1, 10))).first().getString(0)
      val found = widx.searchText(phrase).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      val wantFound = docs.where(contains(
          concat(lit(" "), lower(col("text")), lit(" ")),
          lit(" " + phrase + " ")))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      println(s"[drive] 17-phrase found=${found.size} " +
        s"ok=${found == wantFound && found.contains(2L)} (want true)")
      graft.Index.remove(spark, wname)
    }

    // 18: drift + train/serve robust gate — the serving path end to end:
    // train robust stats on a trusted half, gate the full event stream
    // (batch frame ≡ streaming semantics, StreamOpsSpec pins the stream
    // side), and PSI between the halves of a self-similar column ~ 0.
    {
      val events = spark.read.parquet(s"$sf/events.parquet")
      val trusted = events.where(pmod(col("user_id"), lit(2)) === 0)
      val stats = graft.operators.Profile.robustStats(
        trusted, "value", Seq("event_type"))
      val kept = graft.streaming.StreamOps.outlierFilter(
        events, stats, "value", Seq("event_type"), z = 3.5).count()
      val flagged = graft.streaming.StreamOps.outlierFilter(
        events, stats, "value", Seq("event_type"), z = 3.5,
        keepOutliers = true).count()
      val total = events.count()
      val psi = graft.operators.Profile.driftNumeric(
          trusted, events.where(pmod(col("user_id"), lit(2)) === 1),
          "value", nBins = 8)
        .agg(sum("psi_term")).collect().head.getDouble(0)
      println(s"[drive] 18-outliergate kept=$kept flagged=$flagged " +
        s"partition=${kept + flagged == total} (want true) " +
        s"selfPsiSmall=${math.abs(psi) < 0.05} (want true, psi=$psi)")

      // sketch-native drift round trip: stores built from the same
      // halves must agree with driftNumeric(approx) bin for bin
      val work = java.nio.file.Files.createTempDirectory("drive_drift_")
        .toString
      val refH = events.where(pmod(col("user_id"), lit(2)) === 0)
      val curH = events.where(pmod(col("user_id"), lit(2)) === 1)
      graft.operators.Profile.quantileSketchIncrementalBatch(
        refH, "value", s"$work/ref", k = 65536, batchId = 0L)
      graft.operators.Profile.quantileSketchIncrementalBatch(
        curH, "value", s"$work/cur", k = 65536, batchId = 0L)
      val viaStores = graft.operators.Profile.driftFromSketchStores(
        spark, s"$work/ref", s"$work/cur", nBins = 6, k = 65536)
        .collect().sortBy(_.getInt(0))
      val viaData = graft.operators.Profile.driftNumeric(
        refH, curH, "value", nBins = 6, approx = true, k = 65536)
        .collect().sortBy(_.getInt(0))
      println(s"[drive] 18-sketchdrift bins=${viaStores.length} " +
        s"ok=${viaStores.toSeq == viaData.toSeq} (want true)")

      // r10: the epoch-store fold — 12 epochs at maxEpochs=4 must view
      // identically to the unfolded store (exact regime) while holding
      // fewer registered epochs; a replayed folded epoch must drop
      val vals = events.select(col("value")).where(col("value").isNotNull)
      (0 until 12).foreach { e =>
        val slice = vals.where(pmod(col("value") * 100, lit(12)) === e)
        graft.operators.Profile.quantileSketchIncrementalBatch(
          slice, "value", s"$work/fold", k = 65536, batchId = e.toLong,
          maxEpochs = 4)
        graft.operators.Profile.quantileSketchIncrementalBatch(
          slice, "value", s"$work/plain", k = 65536, batchId = e.toLong,
          maxEpochs = 0)
      }
      def viewOf(dir: String) = graft.operators.Profile.quantileSketchView(
        spark, dir, Seq(0.1, 0.5, 0.9), k = 65536).collect().toSeq
      val foldedView = viewOf(s"$work/fold")
      graft.operators.Profile.quantileSketchIncrementalBatch(
        vals.limit(50), "value", s"$work/fold", k = 65536, batchId = 0L,
        maxEpochs = 4) // epoch 0 is folded: must drop
      val epochsNow = new graft.store.SnapshotTable(
        spark, s"$work/fold/items").read().get
        .select("batch_id").distinct().count()
      println(s"[drive] 19-storefold viewEq=" +
        s"${foldedView == viewOf(s"$work/plain")} (want true) " +
        s"replayDropped=${foldedView == viewOf(s"$work/fold")} (want true) " +
        s"epochs=$epochsNow (want <= 5)")

      // r10: real pixel decode — synthesize a split PNG per event row,
      // decode through ImageIO, compare the mean against the closed form
      val px = events.limit(200)
        .select(col("event_id"),
          graft.operators.Multimodal.pixelStats(
            graft.operators.Multimodal.syntheticImage(
              lit(1), lit(11), lit(6),
              (pmod(col("event_id"), lit(256)) * 65536).cast("int"),
              lit(0x0000FF))).as("s"))
        .select(col("event_id"), col("s.mean_r").as("mr"),
          col("s.mean_b").as("mb"), col("s.n_pixels").as("np"))
      val pxBad = px.where(col("np") =!= 66 ||
        abs(col("mr") - pmod(col("event_id"), lit(256)) * (5.0 * 6 / 66)) > 1e-9 ||
        abs(col("mb") - lit(255.0 * 36 / 66)) > 1e-9).count()
      println(s"[drive] 20-pixeldecode rows=${px.count()} bad=$pxBad (want 0)")

      // r10: governance audits + snapshot diff + overlap vs full-scan
      // Spark oracles
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      val kA = graft.operators.Validate.kAnonymity(
        docs, Seq("lang", "source", "n_chars"), k = 2).count()
      val kOracle = docs.groupBy("lang", "source", "n_chars").count()
        .where(col("count") < 2).count()
      val orph = graft.operators.Validate.referentialOrphans(
        orders, spark.read.parquet(s"$sf/customer.parquet")
          .where(col("c_acctbal") >= 0),
        Seq("o_custkey" -> "c_custkey")).count()
      val orphOracle = orders.join(
        spark.read.parquet(s"$sf/customer.parquet")
          .where(col("c_acctbal") >= 0)
          .select(col("c_custkey").as("o_custkey")).distinct(),
        Seq("o_custkey"), "left_anti").count()
      println(s"[drive] 21-audits kA=$kA oracle=$kOracle " +
        s"orphans=$orph oracle=$orphOracle " +
        s"(want equal pairs)")

      val oldDocs = docs.where(pmod(col("doc_id"), lit(7)) =!= 3)
      val d1 = graft.operators.Diff.snapshotDiff(
        oldDocs, docs, "doc_id", Seq("text", "lang"))
        .groupBy("change").count()
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val dHash = graft.operators.Diff.diffSummary(
        oldDocs, docs, "doc_id", Seq("text", "lang"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val addedOracle = docs.where(pmod(col("doc_id"), lit(7)) === 3)
        .count()
      println(s"[drive] 21-diff added=${d1.getOrElse("added", 0L)} " +
        s"hashAdded=${dHash("added")} oracle=$addedOracle " +
        s"changed=${d1.getOrElse("changed", 0L)}+" +
        s"${dHash("changed")} (want 0+0)")

      val ovl = graft.operators.Profile.overlapEstimate(
        docs.where(col("lang") === "en"), docs, "doc_id", exact = true)
        .collect().head
      val enN = docs.where(col("lang") === "en")
        .select("doc_id").distinct().count()
      println(s"[drive] 21-overlap containment_left=${ovl.getDouble(5)} " +
        s"(want 1.0) n_left=${ovl.getLong(0)} oracle=$enN")

      // r10 closing batch: curriculum bands, incremental diff ledger,
      // info-gain sweep vs one-off association
      val cur = graft.operators.Sampling.curriculumOrder(
        docs.select("doc_id", "n_chars"), "doc_id", "n_chars", bands = 4)
      val bandSizes = cur.groupBy("curriculum_band").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val balanced = bandSizes.size == 4 &&
        bandSizes.values.max <= 2L * bandSizes.values.min
      println(s"[drive] 22-curriculum bands=$bandSizes balanced=$balanced " +
        "(want 4 near-equal bands)")

      val ledger = s"$work/incdiff"
      graft.operators.Diff.diffAndCommit(
        docs.where(pmod(col("doc_id"), lit(3)) =!= 0), "doc_id",
        Seq("text"), ledger)
      val inc = graft.operators.Diff.diffAndCommit(docs, "doc_id",
        Seq("text"), ledger)
        .groupBy("change").count()
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val incOracle = docs.where(pmod(col("doc_id"), lit(3)) === 0).count()
      println(s"[drive] 22-incdiff added=${inc.getOrElse("added", 0L)} " +
        s"oracle=$incOracle changed=${inc.getOrElse("changed", 0L)} " +
        "(want oracle, 0)")

      val ig = graft.operators.Profile.informationGain(
        docs, Seq("lang", "source"), "n_chars")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val igOracle = graft.operators.Profile.association(
        docs, "lang", "n_chars").collect().head.getDouble(4)
      // the two values come from differently-planned aggregations whose
      // float summation order differs — epsilon compare, not ==
      println(s"[drive] 22-infogain lang=${ig("lang")} assoc=$igOracle " +
        s"match=${math.abs(ig("lang") - igOracle) <= 1e-6} (want true)")
    }

    // 23: retrieval + certificate + model-eval wave (r11)
    {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      import spark.implicits._

      // bm25TopK vs a driver-side brute-force of the same formula
      // (independent code path: plain Scala maps over collected rows)
      val qText = "slow table scan merge"
      val queries = Seq((1, qText)).toDF("query_id", "qtext")
      val got = graft.operators.TextAnalysis.bm25TopK(
        docs, "doc_id", "text", queries, "query_id", "qtext", k = 5)
        .collect().map(r => (r.getLong(1), r.getDouble(2)))
      val corpus = docs.select("doc_id", "text").collect()
        .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split(" ", -1))
      val nD = corpus.length.toDouble
      val avgdl = corpus.map(_._2.length.toDouble).sum / nD
      val dfMap = corpus.flatMap { case (_, ts) => ts.distinct }
        .groupBy(identity).map { case (t, xs) => t -> xs.length }
      val qTerms = qText.split(" ").distinct.filter(_.nonEmpty)
      val brute = corpus.map { case (id, ts) =>
        val dl = ts.length.toDouble
        val s = qTerms.map { t =>
          val tf = ts.count(_ == t).toDouble
          if (tf == 0) 0.0
          else {
            val dfT = dfMap(t).toDouble
            math.log((nD - dfT + 0.5) / (dfT + 0.5) + 1.0) *
              tf * (1.2 + 1.0) /
              (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
          }
        }.sum
        id -> BigDecimal(s).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble
      }.filter(_._2 > 0).sortBy { case (id, s) => (-s, id) }.take(5)
      println(s"[drive] 23-bm25 top5=${got.toSeq} " +
        s"brute=${brute.toSeq} match=${got.toSeq == brute.toSeq} " +
        "(want true)")

      // corpus fingerprint: partition-invariant, edit-sensitive, additive
      val cols = Seq("doc_id", "text", "lang")
      val same = graft.operators.Diff.sameContent(
        docs, docs.repartition(13), cols)
      val edited = docs.withColumn("text",
        when(col("doc_id") === 1, concat(col("text"), lit("!")))
          .otherwise(col("text")))
      val differs = !graft.operators.Diff.sameContent(docs, edited, cols)
      val whole = graft.operators.Diff.corpusFingerprint(docs, cols)
        .head()
      val parts = Seq(
        graft.operators.Diff.corpusFingerprint(
          docs.where(pmod(col("doc_id"), lit(2)) === 0), cols).head(),
        graft.operators.Diff.corpusFingerprint(
          docs.where(pmod(col("doc_id"), lit(2)) === 1), cols).head())
      val additive =
        parts.map(_.getLong(0)).sum == whole.getLong(0) &&
        parts.map(r => BigInt(r.getString(1))).sum ==
          BigInt(whole.getString(1)) &&
        parts.map(r => BigInt(r.getString(2))).sum ==
          BigInt(whole.getString(2))
      println(s"[drive] 23-fingerprint same=$same differs=$differs " +
        s"additive=$additive (want true true true)")

      // incremental fingerprint store: 4 epoch quarters + one replayed
      // epoch + a forced fold must all read the one-shot fingerprint
      val store = java.nio.file.Files
        .createTempDirectory("drive_fp_").toString
      (0 until 4).foreach { b =>
        graft.operators.Diff.fingerprintIncrementalBatch(
          docs.where(pmod(col("doc_id"), lit(4)) === b), cols, store,
          batchId = b.toLong)
      }
      graft.operators.Diff.fingerprintIncrementalBatch(
        docs.where(pmod(col("doc_id"), lit(4)) === 2), cols, store,
        batchId = 2L) // replay
      graft.operators.Diff.foldFingerprintStore(spark, store, 2)
      val viewEq = graft.operators.Diff.fingerprintView(spark, store)
        .collect().toSeq == Seq(whole)
      val inventory = graft.operators.Stores.describe(spark, store)
        .collect().head
      println(s"[drive] 23-fpstore viewEq=$viewEq " +
        s"family=${inventory.getString(1)} " +
        s"epochs=${inventory.getLong(4)} (want true fingerprint <=2)")

      // the graders grading the retriever: rankingMetrics over bm25TopK
      // with conjunctive-containment truth — every truth doc carries
      // every query token, so BM25 must surface some of them
      val truthDocs = docs.where(qTerms.map(t =>
          array_contains(graft.operators.TextAnalysis.tokens(col("text")),
            t)).reduce(_ && _))
        .select(lit(1).as("query_id"), col("doc_id"))
      val bmRanked = graft.operators.TextAnalysis.bm25TopK(
        docs, "doc_id", "text", queries, "query_id", "qtext", k = 20)
        .select("query_id", "doc_id", "rank")
      val rm = graft.operators.ModelEval.rankingMetrics(
        bmRanked, truthDocs, "query_id", "doc_id", "rank", k = 20)
        .collect().head
      val nRel = rm.getLong(1)
      val recall = rm.getDouble(3)
      val mrr = rm.getDouble(4)
      val ndcg = rm.getDouble(5)
      println(s"[drive] 23-bm25-graded nRel=$nRel recall@20=$recall " +
        s"mrr=$mrr ndcg=$ndcg (want nRel>0, recall>0, 0<ndcg<=1)")

      // image near-dup e2e: synthesize real PNGs (3 groups: two split
      // classes + solids), pair by perceptual hash, check group algebra
      val imgs = docs.where(col("doc_id") < 24).select(col("doc_id"),
        graft.operators.Multimodal.syntheticImage(lit(1), lit(36), lit(16),
          when(pmod(col("doc_id"), lit(2)) === 0, lit(0x202020))
            .otherwise(lit(0xE0E0E0)).cast("int"),
          when(pmod(col("doc_id"), lit(2)) === 0, lit(0xE0E0E0))
            .otherwise(lit(0x202020)).cast("int")).as("img"))
      val ndp = graft.operators.Multimodal.imageNearDupPairs(
        imgs, "doc_id", "img", maxHamming = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val sameParity = ndp.forall { case (a, b) => a % 2 == b % 2 }
      println(s"[drive] 23-imgneardup pairs=${ndp.length} " +
        s"sameParityOnly=$sameParity (want 132 true)")

      // aucRoc vs the O(n^2) pairwise definition on the synthesized frame
      val scored = docs.select(col("doc_id"),
        (pmod(col("doc_id") * 37, lit(100)).cast("double") / lit(100.0))
          .as("score"),
        when(pmod(col("doc_id") * 37, lit(100))
            + lit(2) * pmod(col("doc_id") * 29, lit(49)) >= 110, 1)
          .otherwise(0).as("label"))
      val auc = graft.operators.ModelEval.aucRoc(scored, "score", "label")
        .head().getDouble(2)
      val pos = scored.where(col("label") === 1)
        .select(col("score").as("sp"))
      val neg = scored.where(col("label") === 0)
        .select(col("score").as("sn"))
      val pair = pos.crossJoin(neg).agg(
          avg(when(col("sp") > col("sn"), 1.0)
            .when(col("sp") === col("sn"), 0.5).otherwise(0.0)))
        .head().getDouble(0)
      val pairR = BigDecimal(pair).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
      println(s"[drive] 23-auc ranksum=$auc pairwise=$pairR " +
        s"match=${math.abs(auc - pairR) <= 1e-6} (want true)")

      // 24: hybrid RRF fusion — fuse BM25 with a second deterministic
      // ranking, replay the reciprocal-rank arithmetic on the driver
      val listA = bmRanked.where(col("rank") <= 10)
      val listB = docs.select(lit(1).as("query_id"), col("doc_id"))
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("query_id")
            .orderBy(pmod(col("doc_id") * 13, lit(97)), col("doc_id"))))
        .where(col("rank") <= 10)
      val fused = graft.operators.TextAnalysis.rrfFuse(
        Seq(listA, listB), "query_id", "doc_id", k = 8)
        .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
      val contrib = (listA.collect() ++ listB.collect())
        .map(r => (r.getLong(r.fieldIndex("doc_id")),
          1.0 / (60.0 + r.getInt(r.fieldIndex("rank")))))
        .groupBy(_._1).map { case (d, cs) =>
          d -> BigDecimal(cs.map(_._2).sum).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble }
      val expect24 = contrib.toSeq.sortBy { case (d, s) => (-s, d) }.take(8)
        .zipWithIndex.map { case ((d, s), i) => (d, s, i + 1) }
      println(s"[drive] 24-rrf rows=${fused.length} " +
        s"match=${fused.toSeq.sortBy(_._3) == expect24} (want 8 true)")

      // 25: control chart over real per-day event counts + an injected
      // level shift; driver replays the recurrences from the same counts
      val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      val daily = ev.groupBy(col("event_type"),
          to_date(col("ts")).as("day"))
        .agg(count(lit(1)).cast("double").as("n"))
        // inject a +5x shift on the last 6 days of one series
        .withColumn("n", when(col("event_type") === "click" &&
          dayofmonth(col("day")) > 24, col("n") * 5).otherwise(col("n")))
      val chart = graft.operators.Profile.controlChart(
          daily, "n", "day", Seq("event_type"), alpha = 0.3, cusumH = 4.0)
        .collect()
      // driver replay: per key, walk the day-sorted series once and emit
      // (key, day) -> expected (ewma, cusum_hi)
      val expByPoint = daily.collect()
        .map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2)))
        .groupBy(_._1).toSeq.flatMap { case (k0, rows) =>
          val series = rows.sortBy(_._2)
          val xs = series.map(_._3)
          val mu = xs.sum / xs.length
          val sg = math.sqrt(xs.map(v => (v - mu) * (v - mu)).sum / xs.length)
          var e = mu; var ch = 0.0; var cl = 0.0
          series.map { case (_, d0, x) =>
            e = 0.3 * x + 0.7 * e
            val z = if (sg > 0) (x - mu) / sg else 0.0
            ch = math.max(0.0, ch + z - 0.5)
            cl = math.max(0.0, cl - z - 0.5)
            (k0, d0) -> ((e, ch))
          }
        }.toMap
      def r6x(x: Double) = BigDecimal(x).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
      var mism = 0
      var clickAlarm = false
      chart.foreach { r =>
        val (e, ch) = expByPoint((r.getString(0), r.getDate(1).toString))
        if (math.abs(r.getDouble(r.fieldIndex("ewma")) - r6x(e)) > 1e-5 ||
            math.abs(r.getDouble(r.fieldIndex("cusum_hi")) - r6x(ch)) > 1e-5)
          mism += 1
        if (r.getString(0) == "click" &&
            r.getBoolean(r.fieldIndex("cusum_alarm")))
          clickAlarm = true
      }
      val quiet = chart.filter(r => r.getString(0) != "click")
        .count(r => r.getBoolean(r.fieldIndex("cusum_alarm")))
      println(s"[drive] 25-controlchart rows=${chart.length} mism=$mism " +
        s"clickAlarm=$clickAlarm quietAlarms=$quiet " +
        "(want mism=0, clickAlarm=true, quietAlarms=0)")

      // 26: PageRank on the real supplier->customer graph vs a full
      // driver replay of the power iteration (collected edges, sf0.001)
      val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      val ord = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      val gEdges = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select((col("l_suppkey") + lit(1000000L)).as("src"),
          col("o_custkey").as("dst")).distinct()
      val pr = graft.operators.Graph.pageRank(gEdges, "src", "dst", iters = 4)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val eList = gEdges.collect().map(r => (r.getLong(0), r.getLong(1)))
      val gNodes = (eList.map(_._1) ++ eList.map(_._2)).distinct.sorted
      val outd = eList.groupBy(_._1).view.mapValues(_.length.toDouble).toMap
      def r12(x: Double) = BigDecimal(x).setScale(12,
        BigDecimal.RoundingMode.HALF_UP).toDouble
      var prRep = gNodes.map(_ -> r12(1.0 / gNodes.length)).toMap
      (1 to 4).foreach { _ =>
        val dm = gNodes.filterNot(outd.contains).map(prRep).sum
        val contrib = eList.groupBy(_._2).view.mapValues(
          _.map { case (u, _) => prRep(u) / outd(u) }.sum).toMap
        prRep = gNodes.map(v => v -> r12(0.15 / gNodes.length +
          0.85 * (contrib.getOrElse(v, 0.0) + dm / gNodes.length))).toMap
      }
      val prMism = pr.count { case (k, v) => math.abs(v - prRep(k)) > 1e-9 }
      val mass = pr.values.sum
      println(s"[drive] 26-pagerank nodes=${pr.size} mism=$prMism " +
        s"mass=${math.abs(mass - 1.0) < 1e-8} (want mism=0, mass=true)")

      // 27: deflate redundancy signal over the real corpus — all ratios
      // in (0, 1.5], and an injected degenerate doc scores below them all
      val ratios = docs.select(graft.operators.TextAnalysis
          .compressionRatio(col("text")).as("r"))
        .agg(min("r"), max("r"), count(lit(1))).head()
      val degenerate = Seq(("spam spam " * 50))
        .toDF("text").select(graft.operators.TextAnalysis
          .compressionRatio(col("text"))).head().getDouble(0)
      println(s"[drive] 27-deflate min=${ratios.getDouble(0)} " +
        s"max=${ratios.getDouble(1)} n=${ratios.getLong(2)} " +
        s"degenerate=$degenerate " +
        s"belowAll=${degenerate < ratios.getDouble(0)} " +
        "(want 0<min<=max<=1.5, belowAll=true)")

      // 28: Poisson bootstrap on the real corpus — the CI must bracket
      // the plain mean and a rerun must reproduce every digit
      val ci = graft.operators.ModelEval.bootstrapMeanCI(
        docs.withColumn("len", length(col("text")).cast("double")),
        "len", "doc_id", b = 64, seed = 3).head()
      val ci2 = graft.operators.ModelEval.bootstrapMeanCI(
        docs.repartition(11)
          .withColumn("len", length(col("text")).cast("double")),
        "len", "doc_id", b = 64, seed = 3).head()
      println(s"[drive] 28-bootstrap n=${ci.getLong(0)} " +
        s"est=${ci.getDouble(2)} ci=[${ci.getDouble(4)},${ci.getDouble(5)}] " +
        s"brackets=${ci.getDouble(4) < ci.getDouble(2) &&
          ci.getDouble(2) < ci.getDouble(5)} stable=${ci == ci2} " +
        "(want brackets=true, stable=true)")

      // 29: index-pruned egonet (r12) — a dedicated src/dst-indexed edge
      // lake; the 1-hop read must locate FEWER files than registered and
      // match a full-scan BFS exactly
      val egoEdges = spark.read.parquet(s"$sf/orders.parquet")
        .select(col("o_custkey").as("src"),
          (col("o_orderkey") + lit(10000000L)).as("dst"))
      val egoDir = s"$work/lake/ego_edges"
      egoEdges.withColumn("band", pmod(col("src"), lit(4)))
        .write.partitionBy("band").mode("overwrite").parquet(egoDir)
      val egoFiles = new java.io.File(egoDir).listFiles()
        .filter(_.isDirectory).flatMap(_.listFiles())
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
      val egoIdx = Index(spark, "ego_drive",
        spark.read.parquet(egoFiles.head).schema, "parquet")
      egoIdx.addIndex("src")
      egoIdx.addIndex("dst")
      egoIdx.addFile(egoFiles: _*)
      egoIdx.update()
      val ego = graft.operators.Graph.neighborhood(egoIdx, "src", "dst",
        Seq(4L, 8L), hops = 1, direction = "out")
      val egoGot = ego.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val egoWant = egoEdges.where(col("src").isin(4L, 8L))
        .select("dst").collect().map(_.getLong(0) -> 1).toMap ++
        Map(4L -> 0, 8L -> 0)
      val egoProbes = graft.operators.Graph.lastNeighborhoodProbes
      println(s"[drive] 29-egonet nodes=${egoGot.size} match=" +
        s"${egoGot == egoWant} probes=$egoProbes pruned=" +
        s"${egoProbes.forall(p => p._1 < p._2)} " +
        "(want match=true, pruned=true)")

      // 30 (r14): serve-shape helper + warm-on-connect + file:-URI
      // score persistence + node2vec walks, all through the public API
      val serveIdx = graft.operators.Graph.buildServeIndex(spark,
        "ego_serve_drive", egoFiles, "src", "dst")
      val egoServe = graft.operators.Graph.neighborhood(serveIdx, "src",
        "dst", Seq(4L, 8L), hops = 1, direction = "out")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      spark.conf.set("spark.graft.warmOnConnect", "true")
      val reconnected = Index(spark, "ego_serve_drive",
        spark.read.parquet(egoFiles.head).schema, "parquet")
      spark.conf.unset("spark.graft.warmOnConnect")
      val egoWarm = graft.operators.Graph.neighborhood(reconnected, "src",
        "dst", Seq(4L, 8L), hops = 1, direction = "out")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      println(s"[drive] 30-serveidx shapeInvariant=${egoServe == egoGot} " +
        s"warmReconnectEq=${egoWarm == egoServe} " +
        "(want both true)")
      val pr30 = graft.operators.Graph.pageRank(egoEdges, "src", "dst",
        iters = 2)
      val scoresDir = "file:" + s"$work/scores_uri"
      val scoresIdx = graft.operators.Graph.persistScoresIndexed(spark,
        scoresDir, pr30, "pagerank", nBuckets = 4,
        indexName = "scores_uri_drive", approx = true)
      val tau30 = pr30.agg(expr("percentile(pagerank, 0.9)"))
        .first().getDouble(0)
      val srvTop = scoresIdx.queryRange("pagerank", tau30, 1.0)
        .select("node").collect().map(_.getLong(0)).toSet
      val fullTop = pr30.where(col("pagerank") >= tau30)
        .select("node").collect().map(_.getLong(0)).toSet
      println(s"[drive] 30-scores-uri kllBandedServeEq=${srvTop == fullTop} " +
        s"n=${srvTop.size} (want true, n>0)")
      val n2vEdges = egoEdges.limit(2000)
        .groupBy("src", "dst").agg(count(lit(1)).cast("double").as("w"))
      val viaN2v = graft.operators.Graph.node2vecWalks(n2vEdges, "src",
          "dst", walkLength = 2, p = 1.0, q = 1.0, weightCol = Some("w"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
          r.getLong(3))).toSet
      val viaRw = graft.operators.Graph.randomWalks(n2vEdges, "src",
          "dst", walkLength = 2, weightCol = Some("w"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
          r.getLong(3))).toSet
      val biased = graft.operators.Graph.node2vecWalks(n2vEdges, "src",
          "dst", walkLength = 2, p = 8.0, q = 0.125,
          weightCol = Some("w")).count()
      println(s"[drive] 30-node2vec pq1EqualsRandomWalks=${viaN2v == viaRw} " +
        s"walkRows=${viaN2v.size} biasedRows=$biased " +
        "(want equal, biasedRows==walkRows)")
    }

    spark.stop()
    println("[drive] done")
  }
}
