package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming transforms for a training-data ingest pipeline, composing with
  * [[StreamIngest]]: watermarked windowed aggregation (late-data tolerant)
  * and stateful first-seen deduplication. The reference is batch-only
  * (SURVEY §2.9); these are the Structured-Streaming-native operators its
  * incremental `addFile`/`update` loop anticipates.
  *
  * Everything here is plan-level: `readStream → transform → writeStream`
  * with Spark managing state stores, checkpoints and recovery — no custom
  * state persistence to get wrong.
  */
object StreamOps {

  /** Per-window document stats over a text stream: doc count + summed
    * whitespace token count, grouped into sliding event-time windows.
    * `watermark` bounds how late a row may arrive and still be counted —
    * and therefore when a window's state can be dropped (without it,
    * windowed state grows forever; the append-mode sink only emits a
    * window once the watermark passes its end). */
  def windowedDocStats(
      stream: DataFrame,
      tsCol: String,
      textCol: String,
      windowDuration: String,
      slideDuration: String,
      watermark: String): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDuration, slideDuration).as("w"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col(textCol), "\\s+"))).as("n_tokens"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("n_docs"), col("n_tokens"))

  /** Event-time session stats over a stream: Spark's native
    * `session_window` merges a key's events into sessions that close after
    * `gap` of event-time silence; the watermark both admits bounded
    * lateness and lets closed sessions leave the state store (append mode
    * emits a session only once the watermark passes its end — without the
    * watermark, session state would grow forever). The streaming
    * counterpart of batch [[graft.operators.Sessions]]: same gap
    * semantics, incremental state instead of a corpus-wide window. */
  def sessionStats(
      stream: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      gap: String,
      watermark: String): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .groupBy((session_window(col(tsCol), gap).as("w") +:
        keyCols.map(col)): _*)
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("first_ts"),
        max(col(tsCol)).as("last_ts"))
      .select(keyCols.map(col) ++ Seq(
        col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("n_events"), col("first_ts"), col("last_ts")): _*)

  /** Stateful streaming exact-dedup: emit only the FIRST row seen per
    * content key (e.g. `md5(text)`); duplicates in the same micro-batch are
    * broken by the smallest `tiebreakCol` value, so output is deterministic
    * given a deterministic batch sequence. State per key is one boolean
    * (`flatMapGroupsWithState`), dropped after `stateTtl` of processing
    * time if given — bounding state for unbounded streams at the cost of
    * re-admitting a duplicate that arrives after the TTL (the standard
    * trade; Spark's own `dropDuplicates` on a stream keeps state forever
    * unless watermarked).
    *
    * Returns rows of `stream`'s schema. Append output mode. */
  def dedupFirstSeen(
      stream: DataFrame,
      keyCol: String,
      tiebreakCol: String,
      stateTtl: Option[String] = None): DataFrame = {
    val spark = stream.sparkSession
    val schema = stream.schema
    val keyIdx = schema.fieldIndex(keyCol)
    val tieIdx = schema.fieldIndex(tiebreakCol)
    val rowEnc = Encoders.row(schema)
    // state = one boolean per key ("already emitted"); a primitive encoder
    // keeps the state store row trivially small
    val stateEnc = Encoders.scalaBoolean
    val timeout = stateTtl match {
      case Some(_) => GroupStateTimeout.ProcessingTimeTimeout
      case None    => GroupStateTimeout.NoTimeout
    }
    val keyed = stream.groupByKey((r: Row) => String.valueOf(r.get(keyIdx)))(
      Encoders.STRING)
    val deduped = keyed.flatMapGroupsWithState(
      OutputMode.Append, timeout)(
      (key: String, rows: Iterator[Row], state: GroupState[Boolean]) => {
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else {
          val out =
            if (state.exists && state.get) Iterator.empty
            else {
              // deterministic within-batch winner: min tiebreak value,
              // compared in the column's own type (numeric ids must not be
              // compared as strings)
              val first = rows.reduceLeft { (a, b) =>
                val av = a.get(tieIdx).asInstanceOf[Comparable[Any]]
                if (av.compareTo(b.get(tieIdx)) <= 0) a else b
              }
              state.update(true)
              Iterator.single(first)
            }
          stateTtl.foreach(state.setTimeoutDuration)
          out
        }
      })(stateEnc, rowEnc)
    deduped.toDF(schema.fieldNames: _*)
  }

  /** Streaming eval-decontamination filter: drop every incoming document
    * sharing a verbatim `windowTokens`-token run with the STATIC probe
    * corpus (the stream-side form of
    * [[graft.operators.Dedup.removeExactContaminated]]). The probe's
    * distinct window hashes are collected ONCE (bounded by
    * `maxProbeWindows` — eval corpora are small by construction; the
    * collect fails loudly past the budget rather than OOMing the driver)
    * and ride one broadcast sorted array; the stream-side check is a pure
    * per-row predicate (binary search per window via the codegen'd
    * [[graft.functions.BroadcastLongSetContains]]), so it works in ANY
    * output mode with no state store, no watermark, and no stream-static
    * join planning constraints. */
  def decontaminateFilter(
      stream: DataFrame,
      textCol: String,
      probe: DataFrame,
      probeTextCol: String,
      windowTokens: Int = 13,
      maxProbeWindows: Int = 10000000): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    import graft.operators.Dedup
    val winRows = probe
      .select(explode(Dedup.windowHashes(col(probeTextCol), windowTokens,
        distinctWithinDoc = true)).as("__w"))
      .distinct().limit(maxProbeWindows + 1).collect()
    require(winRows.length <= maxProbeWindows,
      s"probe corpus exceeds $maxProbeWindows distinct windows — " +
        "decontaminate in batch (Dedup.removeExactContaminated) instead")
    val sorted = winRows.map(_.getLong(0)).sorted
    val bc = stream.sparkSession.sparkContext.broadcast(sorted)
    val contaminated = exists(
      Dedup.windowHashes(col(textCol), windowTokens, distinctWithinDoc = true),
      h => GraftSqlBridge.column(graft.functions.BroadcastLongSetContains(
        GraftSqlBridge.expression(h), bc)))
    stream.where(!coalesce(contaminated, lit(false)))
  }

  /** Streaming perplexity gate: score each incoming document under a
    * TRAINED unigram LM ([[graft.operators.TextAnalysis.trainUnigramLm]],
    * typically reloaded from its persisted artifact,
    * [[graft.store.Artifacts.loadUnigramLm]]) and keep rows below
    * `maxPerplexity` — the streaming form of the CCNet-style quality
    * filter. The model rides one broadcast handle; scoring is the same
    * stateless codegen'd per-row expression the batch path uses
    * ([[graft.functions.UnigramPerplexity]]) — any output mode, no state
    * store, no watermark. Token-free documents score null and are
    * DROPPED (they carry no trainable signal); flip `keepNullScores` to
    * pass them through. The score is appended as `outCol` so downstream
    * stages can log or re-threshold. */
  def perplexityFilter(
      stream: DataFrame,
      textCol: String,
      lm: graft.functions.UnigramLm,
      maxPerplexity: Double,
      outCol: String = "perplexity",
      keepNullScores: Boolean = false): DataFrame = {
    require(maxPerplexity > 0, "maxPerplexity must be positive")
    require(!stream.columns.contains(outCol), s"output column '$outCol' exists")
    val bc = stream.sparkSession.sparkContext.broadcast(lm)
    val scored = stream.withColumn(outCol,
      graft.functions.NgramLm.perplexity(bc)(col(textCol)))
    if (keepNullScores)
      scored.where(col(outCol).isNull || col(outCol) <= maxPerplexity)
    else scored.where(col(outCol) <= maxPerplexity)
  }

  /** Streaming embedding-space decontamination: the stateless twin of
    * [[graft.operators.Similarity.semanticDecontaminate]] — the eval
    * vectors are collected ONCE (bounded, like [[decontaminateFilter]]'s
    * window collect), broadcast as a reference set, and every streamed
    * row is gated by one codegen'd max-cosine walk
    * ([[graft.functions.MaxCosineToSet]]): no state store, no join, no
    * watermark — any output mode. Rows with a null vector pass (they
    * cannot be contaminated); batch ≡ stream is spec-pinned. */
  def semanticDecontaminateFilter(
      stream: DataFrame,
      vecCol: String,
      eval: DataFrame,
      evalVecCol: String,
      threshold: Double,
      maxEvalRows: Int = 1000000): DataFrame = {
    require(threshold > -1.0 && threshold < 1.0,
      s"threshold $threshold must be a cosine in (-1, 1)")
    val rows = eval.select(col(evalVecCol)).limit(maxEvalRows + 1).collect()
    require(rows.length <= maxEvalRows,
      s"eval side has > $maxEvalRows rows - too big to broadcast; " +
        "reduce it (cluster/sample) or raise maxEvalRows")
    val cs = new graft.functions.CentroidSet(
      rows.map(_.getSeq[Float](0).toArray))
    stream.where(!coalesce(
      graft.functions.VectorOps.maxCosineToSet(col(vecCol), cs) >=
        lit(threshold),
      lit(false)))
  }

  /** Streaming Gopher quality gate: the same pure boolean predicate as
    * [[graft.operators.TextAnalysis.gopherFilter]] — per-row codegen'd
    * HOF arithmetic, no state store, no watermark, any output mode. A
    * streaming ingest can drop rule-failing pages before they ever land
    * in the lake. */
  def gopherFilter(
      stream: DataFrame,
      textCol: String,
      rules: graft.operators.TextAnalysis.GopherRules =
        graft.operators.TextAnalysis.GopherRules()): DataFrame =
    stream.where(
      graft.operators.TextAnalysis.gopherPasses(col(textCol), rules))

  /** Stateless streaming twin of
    * [[graft.operators.TextAnalysis.c4Filter]] — the C4 page gate plus
    * in-place line cleaning, per-row arithmetic only, so it composes
    * into any streaming ingest with no state store or watermark. */
  def c4Filter(
      stream: DataFrame,
      textCol: String,
      rules: graft.operators.TextAnalysis.C4Rules =
        graft.operators.TextAnalysis.C4Rules()): DataFrame =
    stream
      .where(graft.operators.TextAnalysis.c4Passes(col(textCol), rules))
      .withColumn(textCol,
        graft.operators.TextAnalysis.c4CleanText(col(textCol), rules))

  /** Per-micro-batch point-in-time enrichment: each batch of probe rows is
    * as-of joined against a temporal [[graft.Index]] (files pruned by the
    * batch's keys) and handed to `sink`. Stream-static as-of is not
    * natively plannable (the as-of window over a stream∪static union is
    * unsupported), so foreachBatch + the batch operator is the right
    * composition — each micro-batch gets point-in-time-correct state,
    * exactly-once via the caller's checkpointed sink.
    *
    * Returns the configured writer; caller sets checkpoint/options and
    * calls `.start()`. */
  def asOfEnrich(
      stream: DataFrame,
      idx: graft.Index,
      keyCol: String,
      probeTsCol: String,
      valueCols: Seq[String],
      rightTsAlias: String = "")(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      sink(idx.asOfJoin(batch.toDF(), keyCol, probeTsCol, valueCols, rightTsAlias),
        batchId)
    }

  /** Streaming NEAR-dup admission: each micro-batch is MinHash-LSH
    * filtered against a persistent band store
    * ([[graft.operators.Dedup.nearDupIncrementalBatch]]) — a document
    * passes iff it has no verified near-duplicate (token-set Jaccard >=
    * `threshold`) among smaller-id documents of its own batch or ANY
    * previously ingested document; the whole batch (kept and dropped)
    * then registers in the store. Admitting id-ordered batches lands on
    * exactly the batch `keepFirst(minhashPairs(...))` survivor set, so
    * stream and one-shot dedup agree (differential-pinned).
    *
    * Stateful dedup with CONTENT similarity cannot ride the state store
    * (a near-dup check needs bucket joins, not a key lookup), so this is
    * the foreachBatch composition — exactly-once via the caller's
    * checkpointed sink, like [[asOfEnrich]]; the band store registers
    * each micro-batch under its epoch id via `appendReplacing`, so a
    * REDELIVERED batch atomically replaces its own earlier registration
    * and re-emits the same survivors. Returns the configured writer;
    * caller sets checkpoint/options and calls `.start()`. */
  def nearDupFilter(
      stream: DataFrame,
      idCol: String,
      textCol: String,
      storeDir: String,
      threshold: Double,
      numHashes: Int = 128,
      bands: Int = 16)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      sink(graft.operators.Dedup.nearDupIncrementalBatch(batch.toDF(),
        idCol, textCol, storeDir, threshold, batchId, numHashes, bands),
        batchId)
    }

  /** Streaming heavy hitters: every micro-batch folds into a persistent
    * Misra–Gries summary store
    * ([[graft.operators.Profile.heavyHittersIncrementalBatch]]) and the
    * sink receives the MERGED top-`k` view so far — a continuously
    * maintained "hottest domains/tokens" materialized view. Per-batch
    * state is one capacity-bounded sketch registered under the epoch id
    * (`appendReplacing`), so a redelivered batch replaces its own
    * registration and the view never double-counts (replay-pinned, the
    * [[nearDupFilter]] exactly-once discipline); past `maxEpochs` epochs
    * the store folds aged sketches into one consolidated segment, so
    * store size and per-batch view cost stay flat. Returns the
    * configured writer; caller sets checkpoint/options and calls
    * `.start()`. */
  def heavyHittersSink(
      stream: DataFrame,
      itemCol: String,
      storeDir: String,
      capacity: Int,
      k: Int,
      weightCol: Option[String] = None,
      maxEpochs: Int = 64)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      graft.operators.Profile.heavyHittersIncrementalBatch(
        batch.toDF(), itemCol, storeDir, capacity, batchId, weightCol,
        maxEpochs)
      sink(graft.operators.Profile.heavyHittersView(
        batch.sparkSession, storeDir, k), batchId)
    }

  /** Streaming quantiles: every micro-batch folds into a persistent KLL
    * summary store
    * ([[graft.operators.Profile.quantileSketchIncrementalBatch]]) and the
    * sink receives the MERGED quantile view so far — a continuously
    * maintained "p50/p90/p99 of doc length / quality score" materialized
    * view. Per-batch state is one capacity-bounded sketch registered
    * under the epoch id (`appendReplacing`), so a redelivered batch
    * replaces its own registration and the view never double-counts (the
    * [[heavyHittersSink]] exactly-once discipline). Exact while total
    * rows across epochs stay <= `k`. Store size AND per-batch view cost
    * are FLAT in stream lifetime: past `maxEpochs` epochs the store
    * folds aged epochs into one consolidated summary (associative
    * re-merge — the view is unchanged in the exact regime). Returns the
    * configured writer; caller sets checkpoint/options and calls
    * `.start()`. */
  def quantileSink(
      stream: DataFrame,
      valueCol: String,
      storeDir: String,
      k: Int,
      probs: Seq[Double],
      maxEpochs: Int = 64)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      graft.operators.Profile.quantileSketchIncrementalBatch(
        batch.toDF(), valueCol, storeDir, k, batchId, maxEpochs)
      sink(graft.operators.Profile.quantileSketchView(
        batch.sparkSession, storeDir, probs, k), batchId)
    }

  /** Per-key [[quantileSink]]: each micro-batch folds one bounded
    * sketch PER KEY into the keyed epoch store
    * ([[graft.operators.Profile.quantileSketchIncrementalBatchByKey]])
    * and the sink receives the per-key merged quantile view so far —
    * continuously maintained per-domain p50/p99. Same exactly-once and
    * fold disciplines as the global sink. */
  def quantileSinkByKey(
      stream: DataFrame,
      valueCol: String,
      keyCols: Seq[String],
      storeDir: String,
      k: Int,
      probs: Seq[Double],
      maxEpochs: Int = 64)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      graft.operators.Profile.quantileSketchIncrementalBatchByKey(
        batch.toDF(), valueCol, keyCols, storeDir, k, batchId, maxEpochs)
      sink(graft.operators.Profile.quantileSketchViewByKey(
        batch.sparkSession, storeDir, keyCols, probs, k), batchId)
    }

  /** Per-key [[heavyHittersSink]]: one capacity-bounded Misra–Gries
    * sketch PER KEY per micro-batch
    * ([[graft.operators.Profile.heavyHittersIncrementalBatchByKey]]);
    * the sink receives the per-key merged top-`k` so far — continuously
    * maintained "hottest items per domain". Same exactly-once and fold
    * disciplines as the global sink. */
  def heavyHittersSinkByKey(
      stream: DataFrame,
      itemCol: String,
      keyCols: Seq[String],
      storeDir: String,
      capacity: Int,
      k: Int,
      weightCol: Option[String] = None,
      maxEpochs: Int = 64)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      graft.operators.Profile.heavyHittersIncrementalBatchByKey(
        batch.toDF(), itemCol, keyCols, storeDir, capacity, batchId,
        weightCol, maxEpochs)
      sink(graft.operators.Profile.heavyHittersViewByKey(
        batch.sparkSession, storeDir, keyCols, k), batchId)
    }

  /** Streaming distinct cardinality: every micro-batch folds one HLL
    * sketch into the persistent store
    * ([[graft.operators.Profile.distinctSketchIncrementalBatch]]) and
    * the sink receives the union estimate so far — a continuously
    * maintained "distinct users/URLs to date". Distinct-union semantics
    * make overlapping batches AND replays free (never a double-count);
    * the epoch keying + fold keep the store bounded anyway. */
  def distinctSink(
      stream: DataFrame,
      itemCol: String,
      storeDir: String,
      lgK: Int = 12,
      maxEpochs: Int = 64)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      graft.operators.Profile.distinctSketchIncrementalBatch(
        batch.toDF(), itemCol, storeDir, batchId, lgK, maxEpochs)
      sink(graft.operators.Profile.distinctSketchView(
        batch.sparkSession, storeDir), batchId)
    }

  /** Per-key [[distinctSink]]
    * ([[graft.operators.Profile.distinctSketchIncrementalBatchByKey]]):
    * the per-domain distinct-so-far materialized view. */
  def distinctSinkByKey(
      stream: DataFrame,
      itemCol: String,
      keyCols: Seq[String],
      storeDir: String,
      lgK: Int = 12,
      maxEpochs: Int = 64)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      graft.operators.Profile.distinctSketchIncrementalBatchByKey(
        batch.toDF(), itemCol, keyCols, storeDir, batchId, lgK, maxEpochs)
      sink(graft.operators.Profile.distinctSketchViewByKey(
        batch.sparkSession, storeDir, keyCols), batchId)
    }

  /** Continuous quality ledger: every micro-batch's rule-violation
    * report ([[graft.operators.Validate.check]] — ONE codegen'd
    * aggregate over the batch) folds into a persistent epoch-keyed
    * store ([[graft.operators.Validate.checkIncrementalBatch]]) and
    * the sink receives the MERGED per-rule totals so far — "how many
    * nulls / out-of-range / malformed rows has this feed EVER sent",
    * maintained without rescanning a byte of history. Replays replace
    * their own epoch (exactly-once, the sink-family discipline); past
    * `maxEpochs` epochs the aged reports consolidate by plain sum, so
    * store size and view cost stay flat for the stream's lifetime.
    * `Validate.checkTimeline` over the same store answers the
    * per-batch "when did it break?" question. Returns the configured
    * writer; caller sets checkpoint/options and calls `.start()`. */
  def validateSink(
      stream: DataFrame,
      rules: Seq[graft.operators.Validate.Rule],
      storeDir: String,
      maxEpochs: Int = 64)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      graft.operators.Validate.checkIncrementalBatch(
        batch.toDF(), rules, storeDir, batchId, maxEpochs)
      sink(graft.operators.Validate.checkView(
        batch.sparkSession, storeDir), batchId)
    }

  /** Continuous content certificate: every micro-batch folds its
    * [[graft.operators.Diff.corpusFingerprint]] sums into the epoch
    * store ([[graft.operators.Diff.fingerprintIncrementalBatch]] —
    * epoch-keyed `appendReplacing`, replay-idempotent like every other
    * sink here) and the sink receives the running
    * [[graft.operators.Diff.fingerprintView]] — "exactly what has this
    * stream ingested, as a comparable O(1) fingerprint" maintained for
    * the cost of fingerprinting each batch. Compare the view against a
    * batch recompute of the landed table to certify the stream lost or
    * duplicated nothing. Returns the configured writer; caller sets
    * checkpoint/options and calls `.start()`. */
  def fingerprintSink(
      stream: DataFrame,
      cols: Seq[String],
      storeDir: String,
      maxEpochs: Int = 64)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      graft.operators.Diff.fingerprintIncrementalBatch(
        batch.toDF(), cols, storeDir, batchId, maxEpochs)
      sink(graft.operators.Diff.fingerprintView(
        batch.sparkSession, storeDir), batchId)
    }

  /** Continuous drift monitor: every micro-batch folds into a KLL epoch
    * store ([[graft.operators.Profile.quantileSketchIncrementalBatch]] —
    * epoch-keyed `appendReplacing`, replay-idempotent like every other
    * sink here) and the sink receives the PSI of everything-so-far
    * against a PINNED reference store
    * ([[graft.operators.Profile.driftFromSketchStores]]) — "has the
    * stream drifted from the baseline corpus" as a continuously
    * maintained view, with no history rescan at any batch (only two
    * bounded summaries are ever re-merged) AND no store growth past
    * `maxEpochs` epochs (the aged-epoch fold keeps per-batch monitor
    * cost flat for the life of the stream). Returns the configured
    * writer; caller sets checkpoint/options and calls `.start()`. */
  def driftSink(
      stream: DataFrame,
      valueCol: String,
      refStoreDir: String,
      curStoreDir: String,
      k: Int = 8192,
      nBins: Int = 10,
      maxEpochs: Int = 64)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      graft.operators.Profile.quantileSketchIncrementalBatch(
        batch.toDF(), valueCol, curStoreDir, k, batchId, maxEpochs)
      sink(graft.operators.Profile.driftFromSketchStores(
        batch.sparkSession, refStoreDir, curStoreDir, nBins, k), batchId)
    }

  /** Per-key [[driftSink]]: each micro-batch folds one bounded sketch
    * PER KEY into the keyed epoch store and the sink receives the
    * per-domain PSI-so-far against the pinned keyed reference
    * ([[graft.operators.Profile.driftByKeyFromSketchStores]] — fully
    * relational, no driver collect at any batch). */
  def driftSinkByKey(
      stream: DataFrame,
      valueCol: String,
      keyCols: Seq[String],
      refStoreDir: String,
      curStoreDir: String,
      k: Int = 8192,
      nBins: Int = 10,
      maxEpochs: Int = 64)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      graft.operators.Profile.quantileSketchIncrementalBatchByKey(
        batch.toDF(), valueCol, keyCols, curStoreDir, k, batchId, maxEpochs)
      sink(graft.operators.Profile.driftByKeyFromSketchStores(
        batch.sparkSession, refStoreDir, curStoreDir, keyCols, nBins, k),
        batchId)
    }

  /** Streaming robust-outlier gate: score each incoming row's `valueCol`
    * with the Iglewicz–Hoaglin modified z-score against TRAINED per-key
    * robust stats ([[graft.operators.Profile.robustStats]], typically
    * computed once on a trusted batch and persisted) — the
    * train-batch/serve-stream split of [[graft.operators.Profile.outliers]],
    * the numeric twin of [[perplexityFilter]].
    *
    * Keyed stats ride a stream-static equi-join (natively plannable in
    * any output mode, broadcast when the stats side is small — one row
    * per key by construction); global stats (no `keyCols`) are collected
    * ONCE (a single row) and injected as literals, leaving a pure
    * stateless per-row expression. Appends `robust_z` (null when the
    * key is untrained or its MAD is 0) and `is_outlier`, then keeps
    * non-outliers; flip `keepOutliers` to route the reject stream
    * instead. Stream ≡ batch is spec-pinned. */
  def outlierFilter(
      stream: DataFrame,
      stats: DataFrame,
      valueCol: String,
      keyCols: Seq[String] = Nil,
      z: Double = 3.5,
      keepOutliers: Boolean = false,
      broadcastStats: Boolean = true): DataFrame = {
    require(z > 0, "z must be positive")
    val reserved = Seq("__v", "__med", "__mad", "robust_z", "is_outlier")
    require(!stream.columns.exists(reserved.contains(_)),
      s"input columns may not use the reserved names ${reserved.mkString("/")}")
    val expected = keyCols ++ Seq("median", "mad")
    require(expected.forall(stats.columns.contains),
      s"stats frame must carry columns ${expected.mkString(", ")} " +
        "(the Profile.robustStats shape)")
    val v = col(valueCol).cast("double")
    val scored =
      if (keyCols.isEmpty) {
        val rows = stats.select(col("median"), col("mad")).collect()
        require(rows.length == 1,
          s"global stats frame must hold exactly one row, got ${rows.length}")
        val r = rows.head
        stream.withColumn("robust_z",
          if (r.isNullAt(0) || r.isNullAt(1)) lit(null).cast("double")
          else graft.operators.Profile.robustZ(v,
            lit(r.getDouble(0)), lit(r.getDouble(1))))
      } else {
        val s = stats.select(
          (keyCols.map(col) :+ col("median").as("__med")
            :+ col("mad").as("__mad")): _*)
        stream.join(
            if (broadcastStats) broadcast(s) else s, keyCols, "left")
          .withColumn("robust_z",
            graft.operators.Profile.robustZ(v, col("__med"), col("__mad")))
          .drop("__med", "__mad")
      }
    val gated = scored.withColumn("is_outlier",
      coalesce(abs(col("robust_z")) > lit(z), lit(false)))
    if (keepOutliers) gated.where(col("is_outlier"))
    else gated.where(!col("is_outlier"))
  }

  /** Batch-side reference semantics of [[dedupFirstSeen]] for differential
    * testing: one row per key, smallest tiebreak wins. */
  def dedupFirstSeenBatch(df: DataFrame, keyCol: String, tiebreakCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tiebreakCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }
}
