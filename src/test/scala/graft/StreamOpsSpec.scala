package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.harness.Lake

import graft.streaming.StreamOps

/** Watermarked windowed aggregation + stateful first-seen dedup
  * (flatMapGroupsWithState) — the Structured-Streaming operators of
  * SURVEY §2.9, tested through MemoryStream with forced batch boundaries. */
class StreamOpsSpec extends GraftSuite {

  test("asOfEnrich: per-micro-batch enrichment equals the batch as-of join") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = spark.read.parquet(s"$sf/events.parquet")
    val dir = tmpDir("events_stream_asof_")
    events.repartitionByRange(3, $"user_id").write.mode("overwrite").parquet(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    val idx = Index(spark, "t_events_stream_asof", events.schema, "parquet")
    idx.addTemporalIndex("user_id", "ts")
    idx.addFile(files: _*)
    idx.update()

    val probes = events.where($"event_type" === "click" && $"user_id" < 6)
      .select($"user_id",
        ($"ts" - expr("interval 1 microsecond")).as("q_ts"),
        $"event_id".as("click_id"))
      .as[(Long, java.time.LocalDateTime, Long)].collect().toSeq
    val mem = MemoryStream[(Long, java.time.LocalDateTime, Long)]
    val stream = mem.toDF().toDF("user_id", "q_ts", "click_id")
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Option[Long])]
    val q = StreamOps.asOfEnrich(stream, idx, "user_id", "q_ts",
        valueCols = Seq("event_id")) { (df, _) =>
        collected.synchronized {
          collected ++= df.select("click_id", "event_id").collect()
            .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
        }
      }
      .option("checkpointLocation", tmpDir("graft_asof_ckpt_")).start()
    try {
      val (b1, b2) = probes.splitAt(probes.size / 2)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val batchRef = idx.asOfJoin(
        probes.toDF("user_id", "q_ts", "click_id"), "user_id", "q_ts",
        valueCols = Seq("event_id"))
      .select("click_id", "event_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    assert(probes.nonEmpty && collected.toSet == batchRef)
  }

  test("windowed doc stats: watermark closes windows, late row within bound counts") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val stream = mem.toDF().toDF("ts", "text")
    val out = StreamOps.windowedDocStats(
      stream, "ts", "text", "10 minutes", "10 minutes", "5 minutes")
    val q = out.writeStream.format("memory").queryName("win_stats")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("graft_win_ckpt_")).start()
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")
    try {
      mem.addData((t(1), "a b c"), (t(4), "d e"))
      q.processAllAvailable()
      // late-but-in-bound row for the 10:00 window, then advance the
      // watermark past 10:10 + 5min so the window closes and emits
      mem.addData((t(7), "f"), (t(21), "g h"))
      q.processAllAvailable()
      mem.addData((t(40), "z"))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("win_stats")
      .select("window_start", "n_docs", "n_tokens").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSet
    // 10:00 window: 3 docs, 3+2+1 tokens — emitted ONCE, complete
    assert(rows.contains((java.sql.Timestamp.valueOf("2026-01-01 10:00:00"), 3L, 6L)),
      s"got $rows")
  }

  test("streaming session stats equals batch sessionization on replayed clicks") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = spark.read.parquet(s"$sf/events.parquet")
    val clicksDf = events.where($"event_type" === "click" && $"user_id" < 10)
      .select($"user_id", $"ts".cast("timestamp").as("ts"), $"event_id")
    val clicks = clicksDf.as[(Long, java.sql.Timestamp, Long)].collect().toSeq
    val lastTs = clicks.map(_._2).max(Ordering.by((t: java.sql.Timestamp) => t.getTime))
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val stream = mem.toDF().toDF("user_id", "ts", "event_id")
    val out = StreamOps.sessionStats(stream, Seq("user_id"), "ts",
      gap = "30 minutes", watermark = "0 seconds")
    val q = out.writeStream.format("memory").queryName("sess_stats")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("graft_sess_ckpt_")).start()
    try {
      // split in event-time order: with watermark "0 seconds", a b2 row
      // older than b1's max event time would be silently dropped as late,
      // and parquet row order is not a contract — sort so batch boundaries
      // can never make rows late
      val (b1, b2) = clicks.sortBy(_._2.getTime).splitAt(clicks.size / 2)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      // sentinel far past everything: watermark passes every session end
      mem.addData((9999L,
        new java.sql.Timestamp(lastTs.getTime + 365L * 86400 * 1000), 0L))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sess_stats").where($"user_id" < 10)
      .select($"user_id", expr("unix_micros(first_ts)").as("session_start"),
        expr("unix_micros(last_ts)").as("session_end"),
        $"n_events")
    // batch reference over the same rows (gap in µs); session bounds and
    // populations must agree exactly — streaming state merges incrementally,
    // the batch window sees the whole history at once
    val want = graft.operators.Sessions.stats(clicksDf,
        Seq("user_id"), "ts", gap = 1800L * 1000 * 1000)
      .select($"user_id", $"session_start", $"session_end", $"n_events")
    assert(got.count() > clicksDf.select("user_id").distinct().count(),
      "fixture must produce multiple sessions per user")
    assertSameRows(got, want)
  }

  test("streaming first-seen dedup matches batch reference and drops cross-batch dups") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
      .withColumn("content_key", md5(col("text")))
    val out = StreamOps.dedupFirstSeen(stream, "content_key", "doc_id")
    val q = out.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append")
      .option("checkpointLocation", tmpDir("graft_dedup_ckpt_")).start()
    try {
      mem.addData((2L, "aa"), (1L, "aa"), (3L, "bb")) // in-batch dup: min id wins
      q.processAllAvailable()
      mem.addData((4L, "aa"), (5L, "cc"))             // cross-batch dup dropped
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("dedup_out").select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "aa"), (3L, "bb"), (5L, "cc")), s"got $got")
  }

  test("nearDupFilter: 3-batch stream equals one-shot keepFirst(minhashPairs)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    // one-shot reference: drop every doc with a smaller-id verified near-dup
    val want = Dedup.keepFirst(docs, "doc_id",
        Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.95))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(want.size < docs.count(), "corpus must contain near-dups")
    // the same corpus in three id-ordered micro-batches
    val rows = docs.as[(Long, String)].collect().sortBy(_._1)
    val batches = rows.grouped((rows.length + 2) / 3).toSeq
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val store = tmpDir("graft_neardup_store_")
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamOps.nearDupFilter(stream, "doc_id", "text", store,
        threshold = 0.95) { (df, _) =>
        val ids = df.select("doc_id").collect().map(_.getLong(0))
        buf.synchronized { buf ++= ids }
      }
      .option("checkpointLocation", tmpDir("graft_neardup_ckpt_")).start()
    try {
      batches.foreach { b =>
        mem.addData(b.toIndexedSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()
    assert(buf.toSet == want,
      s"stream/batch diverge: only-stream=${buf.toSet -- want} " +
        s"only-batch=${want -- buf.toSet}")
    // survivors are unique (no doc emitted twice across batches)
    assert(buf.size == buf.toSet.size)
  }

  test("nearDupIncrementalBatch: replaying a batch id is exactly-once") {
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").where(col("doc_id") < 300)
    val b0 = docs.where(col("doc_id") < 150)
    val b1 = docs.where(col("doc_id") >= 150)
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val store = tmpDir("graft_neardup_replay_")
    val r0 = ids(Dedup.nearDupIncrementalBatch(b0, "doc_id", "text", store,
      0.95, batchId = 0))
    // redelivery of batch 0: same survivors, registration replaced not doubled
    val r0again = ids(Dedup.nearDupIncrementalBatch(b0, "doc_id", "text",
      store, 0.95, batchId = 0))
    assert(r0again == r0, "replay must re-emit the same survivors")
    val r1 = ids(Dedup.nearDupIncrementalBatch(b1, "doc_id", "text", store,
      0.95, batchId = 1))
    // a store that never saw the replay gives the same downstream batch
    val store2 = tmpDir("graft_neardup_replay2_")
    val s0 = ids(Dedup.nearDupIncrementalBatch(b0, "doc_id", "text", store2,
      0.95, batchId = 0))
    val s1 = ids(Dedup.nearDupIncrementalBatch(b1, "doc_id", "text", store2,
      0.95, batchId = 1))
    assert(s0 == r0 && s1 == r1, "replay must not change later admissions")
  }

  test("dedupFirstSeen on a batch frame equals the window reference") {
    import spark.implicits._
    val df = Seq((5L, "x"), (2L, "x"), (9L, "y"), (1L, "z"), (7L, "z"))
      .toDF("doc_id", "text").withColumn("content_key", md5(col("text")))
    val got = StreamOps.dedupFirstSeen(df, "content_key", "doc_id")
    val want = StreamOps.dedupFirstSeenBatch(df, "content_key", "doc_id")
    assertSameRows(got, want)
  }

  test("decontaminateFilter == batch removeExactContaminated on a doc stream") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Lake.get(spark, sf).documents
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val corpus = docs.filter(_._1 % 5 != 0)
    val probeDf = docs.filter(_._1 % 5 == 0).toDF("doc_id", "text")

    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val survived = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamOps.decontaminateFilter(stream, "text", probeDf, "text",
        windowTokens = 10)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        survived.synchronized {
          survived ++= b.select("doc_id").collect().map(_.getLong(0)) }
        ()
      }
      .option("checkpointLocation", tmpDir("graft_decon_ckpt_")).start()
    try {
      val (b1, b2) = corpus.splitAt(corpus.size / 2)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val want = graft.operators.Dedup.removeExactContaminated(
        corpus.toDF("doc_id", "text"), probeDf, "doc_id", "text",
        windowTokens = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(want.nonEmpty && want.size < corpus.size,
      "fixture must actually drop something")
    assert(survived.toSet == want)
  }

  test("fingerprintSink: streamed content certificate equals the batch " +
      "fingerprint of everything ingested") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = (0L until 120L).map(i => (i, s"doc_$i"))
    val store = tmpDir("fpsink_store_")
    val mem = MemoryStream[(Long, String)]
    var last: Array[Row] = Array.empty
    val q = StreamOps.fingerprintSink(mem.toDF().toDF("id", "text"),
        Seq("id", "text"), store) { (view, _) => last = view.collect(); () }
      .option("checkpointLocation", tmpDir("fpsink_ckpt_")).start()
    try {
      val (b1, b2) = rows.splitAt(70)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val want = graft.operators.Diff.corpusFingerprint(
      rows.toDF("id", "text"), Seq("id", "text")).collect().toSeq
    assert(last.toSeq == want)
  }

  test("driftSink: streamed PSI view equals the batch-built stores and " +
      "driftNumeric(approx) in the exact regime") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rng = new scala.util.Random(71)
    val refData = Seq.fill(800)(math.floor(rng.nextDouble() * 50))
    val curData = Seq.fill(600)(math.floor(rng.nextDouble() * 50 + 8))
    val refStore = tmpDir("sdrift_ref_")
    graft.operators.Profile.quantileSketchIncrementalBatch(
      refData.toDF("v"), "v", refStore, k = 4096, batchId = 0L)
    val curStore = tmpDir("sdrift_cur_")

    val mem = MemoryStream[Double]
    val stream = mem.toDF().toDF("v")
    var last: Array[Row] = Array.empty
    val q = StreamOps.driftSink(stream, "v", refStore, curStore,
        k = 4096, nBins = 5) { (view, _) =>
        last = view.collect(); ()
      }
      .option("checkpointLocation", tmpDir("sdrift_ckpt_")).start()
    try {
      val (b1, b2) = curData.splitAt(300)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val want = graft.operators.Profile.driftNumeric(refData.toDF("v"),
      curData.toDF("v"), "v", nBins = 5, approx = true, k = 4096)
      .collect()
    def key(r: Row) = r.getInt(r.fieldIndex("bin"))
    assert(last.sortBy(key).toSeq == want.sortBy(key).toSeq)
    val psi = last.map(_.getDouble(last.head.fieldIndex("psi_term"))).sum
    assert(psi > 0.1, s"constructed shift must register through the sink: $psi")
  }

  test("driftSinkByKey: streamed per-key PSI equals batch-built keyed " +
      "stores") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rng = new scala.util.Random(79)
    val refRows = Seq.fill(300)(("a", math.floor(rng.nextDouble() * 30))) ++
      Seq.fill(300)(("b", math.floor(rng.nextDouble() * 30 + 100)))
    val curRows = Seq.fill(300)(("a", math.floor(rng.nextDouble() * 30))) ++
      Seq.fill(300)(("b", math.floor(rng.nextDouble() * 30 + 110)))
    val refStore = tmpDir("skdrift_ref_")
    graft.operators.Profile.quantileSketchIncrementalBatchByKey(
      refRows.toDF("g", "v"), "v", Seq("g"), refStore, k = 4096,
      batchId = 0L)
    val curStore = tmpDir("skdrift_cur_")
    val mem = MemoryStream[(String, Double)]
    val stream = mem.toDF().toDF("g", "v")
    var last: Array[Row] = Array.empty
    val q = StreamOps.driftSinkByKey(stream, "v", Seq("g"), refStore,
        curStore, k = 4096, nBins = 4) { (view, _) =>
        last = view.collect(); ()
      }
      .option("checkpointLocation", tmpDir("skdrift_ckpt_")).start()
    try {
      val (b1, b2) = curRows.splitAt(300)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val want = graft.operators.Profile.driftNumericByKey(
      refRows.toDF("g", "v"), curRows.toDF("g", "v"), "v", Seq("g"),
      nBins = 4, approx = true, k = 4096).collect()
    def key(r: Row) = (r.getString(0), r.getInt(1))
    assert(last.sortBy(key).toSeq == want.sortBy(key).toSeq)
  }

  test("outlierFilter == batch outliers survivors across micro-batches; " +
      "untrained keys and degenerate scale pass the gate") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rng = new scala.util.Random(53)
    val rows = (1L to 400L).map { i =>
      val g = if (i % 3 == 0) "a" else "b"
      val v = if (i % 97 == 0) 1e5 else rng.nextDouble() * 10
      (i, g, v)
    } ++ Seq((9001L, "untrained", 1e9), (9002L, "const", 7.0))
    val trusted = rows.filter(r => r._2 == "a" || r._2 == "b")
      .toDF("id", "g", "v")
    val stats = graft.operators.Profile.robustStats(trusted, "v", Seq("g"))
      .unionByName(Seq(("const", 7.0, 0.0)).toDF("g", "median", "mad"))

    val mem = MemoryStream[(Long, String, Double)]
    val stream = mem.toDF().toDF("id", "g", "v")
    val survived = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamOps.outlierFilter(stream, stats, "v", Seq("g"), z = 3.5)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        survived.synchronized {
          survived ++= b.select("id").collect().map(_.getLong(0)) }
        ()
      }
      .option("checkpointLocation", tmpDir("graft_outgate_ckpt_")).start()
    try {
      val (b1, b2) = rows.splitAt(rows.size / 2)
      mem.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
      mem.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
    } finally q.stop()

    // batch reference over the SAME frame with the SAME trained stats:
    // outliers() retrains per-group on its input, so compare against the
    // gate's own semantics — z against the trusted stats
    val all = rows.toDF("id", "g", "v")
    val want = StreamOps.outlierFilter(all, stats, "v", Seq("g"), z = 3.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(survived.toSet == want)
    // the planted extremes in trained groups are gone ...
    assert(rows.filter(r => r._3 == 1e5).forall(r => !want.contains(r._1)))
    // ... and on the trusted frame the gate agrees with batch outliers()
    val batchKeep = graft.operators.Profile
      .outliers(trusted, "v", Seq("g"), z = 3.5)
      .where(!col("is_outlier")).select("id").collect()
      .map(_.getLong(0)).toSet
    val gateKeep = StreamOps.outlierFilter(trusted, stats, "v", Seq("g"),
      z = 3.5).select("id").collect().map(_.getLong(0)).toSet
    assert(gateKeep == batchKeep)
    // untrained key (left-join miss) and MAD=0 key pass, never crash
    assert(want.contains(9001L) && want.contains(9002L))

    // global (no keys): literal-injected stats, outlier routed out
    val gstats = graft.operators.Profile.robustStats(trusted, "v")
    val gkeep = StreamOps.outlierFilter(all, gstats, "v", Nil, z = 3.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(!gkeep.contains(9001L), "1e9 must flag under global stats")
    // keepOutliers routes the exact complement
    val grej = StreamOps.outlierFilter(all, gstats, "v", Nil, z = 3.5,
      keepOutliers = true).select("id").collect().map(_.getLong(0)).toSet
    assert((gkeep ++ grej) == rows.map(_._1).toSet && (gkeep & grej).isEmpty)
  }

  test("semanticDecontaminateFilter == batch semanticDecontaminate") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toSeq
    val evalDf = all.filter(_._1 < 30).toDF("vec_id", "embedding")
    val corpus = all.filter(_._1 >= 30)

    val mem = MemoryStream[(Long, Seq[Float])]
    val stream = mem.toDF().toDF("vec_id", "embedding")
    val survived = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamOps.semanticDecontaminateFilter(stream, "embedding",
        evalDf, "embedding", threshold = 0.4)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        survived.synchronized {
          survived ++= b.select("vec_id").collect().map(_.getLong(0)) }
        ()
      }
      .option("checkpointLocation", tmpDir("graft_semdecon_ckpt_")).start()
    try {
      val (b1, b2) = corpus.splitAt(corpus.size / 2)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val want = graft.operators.Similarity.semanticDecontaminate(
        corpus.toDF("vec_id", "embedding"), evalDf, "vec_id", "embedding",
        threshold = 0.4)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(want.nonEmpty && want.size < corpus.size,
      "fixture must actually drop something")
    assert(survived.toSet == want)

    // a null vector cannot be contaminated - it passes the gate
    val withNull = Seq((1L, Seq(1.0f, 0.0f)),
        (2L, null.asInstanceOf[Seq[Float]]))
      .toDF("vec_id", "embedding")
    val keptNull = StreamOps.semanticDecontaminateFilter(withNull,
      "embedding", evalDf, "embedding", threshold = -0.99)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(keptNull.contains(2L), "null vector must pass")
  }

  test("decontaminateFilter: probe over the window budget fails loudly") {
    import spark.implicits._
    val probeDf = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val stream = Seq((1L, "x y z")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      StreamOps.decontaminateFilter(stream, "text", probeDf, "text",
        windowTokens = 2, maxProbeWindows = 1)
    }
  }

  test("perplexityFilter == batch threshold on a doc stream (loaded artifact)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Lake.get(spark, sf).documents
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    // train on the corpus, persist, reload — the serving-path shape
    val lm = graft.operators.TextAnalysis.trainUnigramLm(
      docs.toDF("doc_id", "text"), "text", topN = 500)
    val path = tmpDir("graft_lm_") + "/lm.json"
    graft.store.Artifacts.saveUnigramLm(spark, path, lm)
    val loaded = graft.store.Artifacts.loadUnigramLm(spark, path)
    // pick a mid-distribution cutoff so both sides of the gate are non-empty
    val bc = spark.sparkContext.broadcast(loaded)
    val ppls = docs.toDF("doc_id", "text").select(
        graft.functions.NgramLm.perplexity(bc)($"text").as("p"))
      .collect().map(_.getDouble(0)).sorted
    val cutoff = ppls(ppls.length / 2)

    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val kept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamOps.perplexityFilter(stream, "text", loaded, cutoff)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        kept.synchronized {
          kept ++= b.select("doc_id").collect().map(_.getLong(0)) }
        ()
      }
      .option("checkpointLocation", tmpDir("graft_ppl_ckpt_")).start()
    try {
      val (b1, b2) = docs.splitAt(docs.size / 2)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val want = docs.toDF("doc_id", "text").select($"doc_id",
        graft.functions.NgramLm.perplexity(bc)($"text").as("p"))
      .where($"p" <= cutoff)
      .collect().map(_.getLong(0)).toSet
    assert(want.nonEmpty && want.size < docs.size,
      "cutoff must actually split the corpus")
    assert(kept.toSet == want)
  }

  test("gopherFilter: stream == batch gate across micro-batch boundaries") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Lake.get(spark, sf).documents
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val rules = graft.operators.TextAnalysis.GopherRules(
      minTokens = 40L, minMeanTokenLen = 2.0, minAlphaTokenRatio = 0.5,
      minStopwordHits = 1)
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val kept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamOps.gopherFilter(stream, "text", rules)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        kept.synchronized {
          kept ++= b.select("doc_id").collect().map(_.getLong(0)) }
        ()
      }
      .option("checkpointLocation", tmpDir("graft_gopher_ckpt_")).start()
    try {
      val (b1, b2) = docs.splitAt(docs.size / 2)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val want = graft.operators.TextAnalysis.gopherFilter(
        docs.toDF("doc_id", "text"), "text", rules)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(want.nonEmpty && want.size < docs.size,
      "rules must actually split the corpus")
    assert(kept.toSet == want)
  }

  test("c4Filter: stream == batch gate + cleaning across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Lake.get(spark, sf).documents
      .select(col("doc_id"), concat(col("text"), lit(".\nshort\n"),
        lit("One more. And two. Also three."),
        when(col("doc_id") % 2 === 0, lit("\nThen four. And five."))
          .otherwise(lit(""))).as("text"))
      .as[(Long, String)].collect().toSeq
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val kept = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = StreamOps.c4Filter(stream, "text")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        kept.synchronized {
          kept ++= b.select("doc_id", "text").collect()
            .map(r => (r.getLong(0), r.getString(1))) }
        ()
      }
      .option("checkpointLocation", tmpDir("graft_c4_ckpt_")).start()
    try {
      val (b1, b2) = docs.splitAt(docs.size / 2)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val want = graft.operators.TextAnalysis.c4Filter(
        docs.toDF("doc_id", "text"), "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(want.nonEmpty && want.size < docs.size,
      "the gate must actually split the stream")
    assert(kept.toSet == want,
      "stream must equal batch including the cleaned text")
  }

  test("Validate.quarantine is stateless: streaming gate equals the " +
      "batch split, including violation labels") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.Validate
    val rows = Seq((1L, 5.0, "en"), (2L, -1.0, "en"), (3L, 50.0, "xx"),
      (4L, 200.0, "de"), (5L, 7.0, null.asInstanceOf[String]))
    val rules = Seq(
      Validate.inRange("score", 0.0, 100.0),
      Validate.inSet("lang", Seq("en", "de")))
    val mem = MemoryStream[(Long, Double, String)]
    val stream = mem.toDF().toDF("id", "score", "lang")
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Seq[String], Boolean)]
    val q = Validate.quarantine(stream, rules)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        got.synchronized {
          got ++= b.select("id", "violations", "is_valid").collect()
            .map(r => (r.getLong(0), r.getSeq[String](1), r.getBoolean(2))) }
        ()
      }
      .option("checkpointLocation", tmpDir("graft_vq_ckpt_")).start()
    try {
      val (b1, b2) = rows.splitAt(2)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val want = Validate.quarantine(rows.toDF("id", "score", "lang"), rules)
      .select("id", "violations", "is_valid").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1), r.getBoolean(2))).toSet
    assert(got.toSet == want)
    assert(want.exists(_._3) && want.exists(!_._3),
      "the gate must actually split the stream")
  }

  test("quantileSinkByKey: streamed per-key view equals the one-shot " +
      "per-key discrete quantiles in the exact regime") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rng = new scala.util.Random(83)
    val rows = Seq.fill(600)(
      (if (rng.nextBoolean()) "a" else "b", rng.nextDouble() * 100))
    val store = tmpDir("kqsink_store_")
    val mem = MemoryStream[(String, Double)]
    var last: Array[Row] = Array.empty
    val q = StreamOps.quantileSinkByKey(mem.toDF().toDF("g", "v"), "v",
        Seq("g"), store, k = 4096, probs = Seq(0.25, 0.75)) { (view, _) =>
        last = view.collect(); ()
      }
      .option("checkpointLocation", tmpDir("kqsink_ckpt_")).start()
    try {
      val (b1, b2) = rows.splitAt(300)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    def disc(vs: Seq[Double], p: Double): Double = {
      val s = vs.sorted
      s((math.max(1L, math.ceil(p * s.length).toLong) - 1).toInt)
    }
    val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
      Seq((g, 0.25, disc(rs.map(_._2), 0.25)),
        (g, 0.75, disc(rs.map(_._2), 0.75)))
    }.toSet
    val got = last.map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .toSet
    assert(got == want)
  }

  test("heavyHittersSinkByKey + distinctSinkByKey: streamed per-key views " +
      "equal their batch twins across overlapping micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = (1 to 500).map(i =>
      (if (i % 3 == 0) "a" else "b", s"item_${i % 12}"))
    val hhStore = tmpDir("khh_store_")
    val mem = MemoryStream[(String, String)]
    var lastHH: Array[Row] = Array.empty
    val q = StreamOps.heavyHittersSinkByKey(mem.toDF().toDF("g", "x"),
        "x", Seq("g"), hhStore, capacity = 64, k = 4) { (view, _) =>
        lastHH = view.collect(); ()
      }
      .option("checkpointLocation", tmpDir("khh_ckpt_")).start()
    try {
      val (b1, b2) = rows.splitAt(250)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    // exact regime: top-4 per key == true counts, ties by item asc
    val want = rows.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((g, x), c) => (g, x, c) }
      .groupBy(_._1).flatMap { case (_, rs) =>
        rs.sortBy(r => (-r._3, r._2)).take(4)
      }.toSet
    assert(lastHH.map(r => (r.getString(0), r.getString(1),
      r.getLong(2))).toSet == want)
    assert(lastHH.forall(r => r.getLong(2) == r.getLong(3)),
      "exact regime: count_min == count_max")

    val dStore = tmpDir("kd_store_")
    val mem2 = MemoryStream[(String, String)]
    var lastD: Array[Row] = Array.empty
    val q2 = StreamOps.distinctSinkByKey(mem2.toDF().toDF("g", "u"), "u",
        Seq("g"), dStore) { (view, _) => lastD = view.collect(); () }
      .option("checkpointLocation", tmpDir("kd_ckpt_")).start()
    try {
      // overlapping batches: distinct-union must not double-count
      mem2.addData(rows.take(300): _*); q2.processAllAvailable()
      mem2.addData(rows.drop(200): _*); q2.processAllAvailable()
    } finally q2.stop()
    val wantD = rows.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.size.toLong).toMap
    assert(lastD.map(r => r.getString(0) -> r.getLong(1)).toMap == wantD)
  }
}
