package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Dataset profiling: per-column summary statistics and histograms — the
  * "what is actually in this 100 TB table" first step of any curation or
  * debugging pass, kept oracle-checkable (exact counts, deterministic
  * rendering) rather than sampled. Ref parity note: the reference has
  * no profiling operator; extends the analytics surface per the
  * training-data-ops mandate (SURVEY §2 addendum).
  */
object Profile {

  /** Resolve a literal column name even when it needs quoting (spaces,
    * dots, hyphens): backtick-quote with embedded backticks doubled, so
    * `col` cannot misparse it as a nested path. */
  private def qcol(name: String): Column =
    col("`" + name.replace("`", "``") + "`")

  /** One row per profiled column: `column | n_rows | n_nulls | n_distinct
    * | min_val | max_val | avg_val`. Min/max are computed on the NATIVE
    * type (numeric ordering for numerics, binary for strings) and rendered
    * to string for the transposed output; `avg_val` is the 6-decimal
    * rounded mean for numeric columns, null otherwise. `n_distinct` is
    * exact by default — ONE aggregate pass over the table (Spark plans the
    * multi-distinct via expand: one shuffle, cols× row amplification);
    * `exactDistinct = false` swaps in HyperLogLog `approx_count_distinct`
    * (2% default error), collapsing the expand — the right call at
    * petabyte scale where ±2% on cardinality is noise.
    *
    * The whole profile is one aggregate + a driver-free `inline` transpose
    * of the single result row — no per-column jobs, no collect. */
  def table(
      df: DataFrame,
      cols: Seq[String],
      exactDistinct: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "at least one column required")
    val aggs: Seq[Column] = cols.flatMap { c =>
      val isNum = df.schema(c).dataType.isInstanceOf[NumericType]
      val cc = qcol(c)
      Seq(
        // count(lit(1)), not count(col): n_rows is the TABLE row count and
        // must not silently shrink per-column on nullable columns — nulls
        // are already reported in n_nulls (r6 advice)
        count(lit(1)).as(s"__cnt_$c"),
        count(when(cc.isNull, 1)).as(s"__nul_$c"),
        (if (exactDistinct) count_distinct(cc)
         else approx_count_distinct(cc)).as(s"__dst_$c"),
        min(cc).cast("string").as(s"__min_$c"),
        max(cc).cast("string").as(s"__max_$c"),
        (if (isNum) round(avg(cc), 6) else lit(null).cast("double"))
          .as(s"__avg_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = array(cols.map { c =>
      struct(lit(c).as("column"),
        col(s"__cnt_$c").as("n_rows"),
        col(s"__nul_$c").as("n_nulls"),
        col(s"__dst_$c").as("n_distinct"),
        col(s"__min_$c").as("min_val"),
        col(s"__max_$c").as("max_val"),
        col(s"__avg_$c").as("avg_val"))
    }: _*)
    one.select(inline(rows))
  }

  /** Quantiles of a numeric column: `prob | val`, SQL `percentile_cont`
    * semantics (linear interpolation at rank `p·(n−1)` over the sorted
    * non-null values — identical in any engine implementing the
    * standard). `exact = true` (default) uses Spark's exact percentile
    * aggregate — one pass, but per-partition value-count maps bound
    * memory by column CARDINALITY, so flip to `exact = false`
    * (`percentile_approx`, a positional-error-bounded sketch with
    * `accuracy` controlling the bound) for petabyte high-cardinality
    * columns where ±ε on a quantile is noise. */
  def quantiles(
      df: DataFrame,
      colName: String,
      probs: Seq[Double],
      exact: Boolean = true,
      accuracy: Int = 10000): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1),
      "probs must be in [0, 1]")
    // Column API, not a SQL-string splice: raw interpolation breaks on
    // names needing backticks (spaces, dots, hyphens) — r6 advice
    val agg =
      if (exact) call_function("percentile", qcol(colName), lit(probs.toArray))
      else call_function("percentile_approx", qcol(colName),
        lit(probs.toArray), lit(accuracy))
    df.agg(agg.as("__q"))
      .select(posexplode(col("__q")).as(Seq("__i", "val")))
      .select(element_at(lit(probs.toArray), col("__i") + 1).as("prob"),
        col("val"))
  }

  /** Quantile bucketing: label every row by which quantile slice of
    * `valueCol` it falls in — with the defaults, the CCNet head/middle/
    * tail corpus split (Wenzek et al. 2020: score docs by reference-LM
    * perplexity, cut at the terciles, train preferentially on the fluent
    * "head"). `probs` are the interior cut points (strictly increasing,
    * in (0,1)); `labels` names the `probs.size + 1` slices in value
    * order (lowest slice first — for perplexity that is the most fluent).
    * A row lands in the first slice whose threshold its value does not
    * exceed (`value <= percentile(probs(i))`); rows with NULL values fall
    * to the last slice.
    *
    * Engine-replicable: thresholds are SQL `percentile_cont` semantics
    * over the column (see [[quantiles]]); round the value to 6 decimals
    * upstream (house pattern) and the bucket assignment replays exactly —
    * an interpolated threshold lies strictly between two data values, so
    * last-ulp interpolation differences between engines cannot flip a
    * row's bucket.
    *
    * Scale shape: ONE bounded aggregate (the `probs.size` thresholds on
    * the driver) + a literal CASE projection — no join, no window, no
    * sort. Two passes over the input (threshold pass + label pass); for
    * petabyte columns flip `exact = false` to sketch the thresholds. */
  def quantileBuckets(
      df: DataFrame,
      valueCol: String,
      probs: Seq[Double] = Seq(1.0 / 3, 2.0 / 3),
      labels: Seq[String] = Seq("head", "middle", "tail"),
      bucketCol: String = "bucket",
      exact: Boolean = true,
      accuracy: Int = 10000): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0 && p < 1),
      "probs must be interior points in (0, 1)")
    require(probs == probs.sorted && probs.distinct == probs,
      "probs must be strictly increasing")
    require(labels.size == probs.size + 1,
      s"need ${probs.size + 1} labels for ${probs.size} cut points")
    require(!df.columns.contains(bucketCol),
      s"bucket column $bucketCol collides with an input column")
    val agg =
      if (exact) call_function("percentile", qcol(valueCol), lit(probs.toArray))
      else call_function("percentile_approx", qcol(valueCol),
        lit(probs.toArray), lit(accuracy))
    val row = df.agg(agg.as("__q")).first()
    require(!row.isNullAt(0),
      s"quantileBuckets: no non-null values in $valueCol")
    val ths = row.getSeq[Double](0)
    val bucket = ths.zip(labels).reverse.foldLeft(lit(labels.last)) {
      case (acc, (t, lab)) =>
        when(qcol(valueCol) <= lit(t), lit(lab)).otherwise(acc)
    }
    df.withColumn(bucketCol, bucket)
  }

  /** Quantile (CDF/rank) transform: append `outCol` = the fraction of
    * non-null rows with value `<= v` — `cume_dist` without a global
    * window, the uniformizing feature map (rank-gauss minus the gauss)
    * that makes heavy-tailed signals (views, token counts, scores)
    * comparable and mixture-weight-safe. Nulls transform to null.
    *
    * Exact path (default): per-value counts (one groupBy over the
    * pruned column), a DISTRIBUTED exclusive prefix sum over the value
    * order on that counts frame ([[Sampling.exclusivePrefixSum]]:
    * range-repartition + per-partition cumsum + one offset per
    * partition — no single-task global window), then one join back on
    * the value. Exact at any scale; the join is the cost.
    *
    * `approx = true`: ONE `percentile_approx` aggregate collects
    * `grid - 1` interior cut points; the rank is a codegen'd count of
    * cuts `<= v` over the broadcast cut array — rank granularity `1/
    * grid` plus the sketch's rank error, NO join, no second shuffle:
    * the petabyte path (grid=100 ≈ percentile-resolution features). */
  def quantileTransform(
      df: DataFrame,
      valueCol: String,
      outCol: String = "",
      approx: Boolean = false,
      grid: Int = 100,
      accuracy: Int = 10000): DataFrame = {
    val out = if (outCol.nonEmpty) outCol else s"${valueCol}_q"
    require(!df.columns.contains(out),
      s"output column $out collides with an input column")
    require(grid >= 2, "grid must be >= 2")
    val v = qcol(valueCol).cast("double")
    if (approx) {
      val row = df.agg(call_function("percentile_approx", v,
        lit((1 until grid).map(_.toDouble / grid).toArray),
        lit(accuracy)).as("__q")).first()
      if (row.isNullAt(0)) // all-null column: transform is all-null too
        return df.withColumn(out, lit(null).cast("double"))
      // sorted ascending by construction (quantiles of increasing
      // probs); the codegen'd binary search needs it sorted.
      // size(filter(lit(cuts), _ <= v)) would be the declarative
      // spelling, but ArrayFilter is CodegenFallback — measured 2.3x
      // SLOWER than the exact path on the x30 bench; CutUpperBound
      // keeps the walk inside whole-stage codegen at log2(grid)
      // compares per row.
      val cuts = row.getSeq[Double](0).toArray
      val rank = org.apache.spark.sql.GraftSqlBridge.column(
        graft.functions.CutUpperBound(
          org.apache.spark.sql.GraftSqlBridge.expression(v), cuts))
      df.withColumn(out,
        when(v.isNull, lit(null).cast("double"))
          .otherwise(rank.cast("double") / grid))
    } else {
      val counts = df.where(v.isNotNull)
        .select(v.as("__v")).groupBy("__v")
        .agg(count(lit(1)).as("__cnt"))
      val cum = Sampling.exclusivePrefixSum(
        counts, Seq(col("__v").asc), col("__cnt"), 0)
      val tot = counts.agg(sum("__cnt").as("__n"))
      val ranks = cum.crossJoin(broadcast(tot))
        .select(col("__v"),
          ((col("__cum") + col("__cnt")).cast("double") / col("__n"))
            .as("__rank"))
      df.join(ranks, v <=> col("__v"), "left")
        .drop("__v")
        .withColumnRenamed("__rank", out)
    }
  }

  /** Top-`k` heavy hitters of `itemCol` via a capacity-bounded
    * Misra–Gries sketch ([[graft.functions.FreqItems]]): one pass, ONE
    * map-side-combined aggregate whose exchange carries `tasks ×
    * capacity` counter rows — never the key universe, which is what a
    * plain `groupBy(item).count.orderBy` shuffles on a 100 TB corpus
    * with billions of distinct URLs or grams. Returns
    * `item | count_min | count_max` with the true count guaranteed
    * inside the envelope; `count_min == count_max` (exact) whenever
    * `capacity >=` the distinct item count. Optional `weightCol` counts
    * each occurrence as that many units (non-negative). */
  def heavyHitters(
      df: DataFrame,
      itemCol: String,
      k: Int,
      capacity: Int,
      weightCol: Option[String] = None): DataFrame = {
    val w = weightCol.map(qcol).getOrElse(lit(1L))
    df.agg(graft.functions.FreqItems
        .freqItemsAgg(qcol(itemCol), w, capacity, k).as("__hh"))
      .select(inline(col("__hh")))
  }

  /** Incremental heavy hitters: fold one (micro-)batch into a persistent
    * Misra–Gries summary store under `storeDir`. The batch aggregates
    * into ONE capacity-bounded sketch row (map-side combined, exactly
    * like [[heavyHitters]]), whose counters land in a `counters`
    * SnapshotTable and whose decrement mass + processed weight land in a
    * `meta` table — both keyed by `batchId` via `appendReplacing`, so a
    * REDELIVERED batch atomically replaces its own earlier registration
    * (exactly-once under streaming replay, the
    * [[graft.operators.Dedup.nearDupIncrementalBatch]] discipline);
    * replays of epochs already consolidated by the store fold drop
    * instead ([[foldWatermark]] — their counters live in the folded
    * segment). Recent-epoch merge stays exact-sum (no re-shrink), so the
    * merged envelope only widens by the SUM of per-epoch errs, never
    * loses an item that any epoch kept. Store size is bounded: past
    * `maxEpochs` registered epochs the aged ones re-merge through one
    * capacity-bounded sketch under a sentinel epoch
    * ([[foldHeavyHitterStore]]), capping growth at O(maxEpochs ×
    * capacity) counter rows (`maxEpochs <= 0` disables the fold). */
  def heavyHittersIncrementalBatch(
      batch: DataFrame,
      itemCol: String,
      storeDir: String,
      capacity: Int,
      batchId: Long,
      weightCol: Option[String] = None,
      maxEpochs: Int = 64): Unit = {
    val spark = batch.sparkSession
    if (batchId <= foldWatermark(spark, storeDir)) return
    Stores.register(spark, storeDir, "heavy_hitters", Nil, Some(capacity))
    val w = weightCol.map(qcol).getOrElse(lit(1L))
    val bid = batchId.toString
    // one row; pin it so counters + meta don't re-aggregate the batch
    val s = batch.agg(graft.functions.FreqItems
        .freqSketchAgg(qcol(itemCol), w, capacity).as("__s"))
      .localCheckpoint()
    // meta (err) lands BEFORE counters: a crash between the writes then
    // leaves an orphan err that only WIDENS the merged envelope, while
    // the reverse order would sum orphan counters without their err and
    // break the `count_max >= true` guarantee
    new graft.store.SnapshotTable(spark, s"$storeDir/meta")
      .appendReplacing(
        s.select(col("__s.err").as("err"), col("__s.total").as("total"),
          lit(bid).as("batch_id")),
        "batch_id", Seq(bid))
    new graft.store.SnapshotTable(spark, s"$storeDir/counters")
      .appendReplacing(
        s.select(explode(col("__s.counters")).as("__c"))
          .select(col("__c.item").as("item"), col("__c.cnt").as("cnt"),
            lit(bid).as("batch_id")),
        "batch_id", Seq(bid))
    if (shouldCheckFold(batchId, maxEpochs))
      foldHeavyHitterStore(spark, storeDir, capacity, maxEpochs, Nil)
  }

  /** Keyed incremental heavy hitters: [[heavyHittersIncrementalBatch]]
    * with one capacity-bounded sketch PER KEY per epoch — "hottest
    * tokens/URLs per domain/language" that folds across days, the MG
    * member of the keyed store family
    * ([[quantileSketchIncrementalBatchByKey]],
    * [[distinctSketchIncrementalBatchByKey]]). Store grain: counters
    * `keyCols | item | cnt | batch_id`, meta `keyCols | err | total |
    * batch_id`; epoch-keyed `appendReplacing` (replays replace;
    * already-folded epochs drop), aged epochs consolidate PER KEY. Rows
    * with null keys are excluded (no series identity — the keyed-join
    * contract everywhere else). */
  def heavyHittersIncrementalBatchByKey(
      batch: DataFrame,
      itemCol: String,
      keyCols: Seq[String],
      storeDir: String,
      capacity: Int,
      batchId: Long,
      weightCol: Option[String] = None,
      maxEpochs: Int = 64): Unit = {
    require(keyCols.nonEmpty,
      "keyCols must be non-empty - use heavyHittersIncrementalBatch")
    val reserved = Seq("item", "cnt", "err", "total", "batch_id",
      "__s", "__n", "__w")
    require(!keyCols.exists(reserved.contains(_)),
      s"key columns may not use the reserved names ${reserved.mkString("/")}")
    val spark = batch.sparkSession
    if (batchId <= foldWatermark(spark, storeDir)) return
    Stores.register(spark, storeDir, "heavy_hitters", keyCols,
      Some(capacity))
    val w = weightCol.map(qcol).getOrElse(lit(1L))
    val bid = batchId.toString
    val s = batch
      .where(keyCols.map(qcol(_).isNotNull).reduce(_ && _))
      .groupBy(keyCols.map(qcol): _*)
      .agg(graft.functions.FreqItems
        .freqSketchAgg(qcol(itemCol), w, capacity).as("__s"))
      .localCheckpoint()
    // meta before counters — the global writer's crash discipline
    new graft.store.SnapshotTable(spark, s"$storeDir/meta")
      .appendReplacing(
        s.select(keyCols.map(col) :+ col("__s.err").as("err") :+
          col("__s.total").as("total") :+ lit(bid).as("batch_id"): _*),
        "batch_id", Seq(bid))
    new graft.store.SnapshotTable(spark, s"$storeDir/counters")
      .appendReplacing(
        s.select(keyCols.map(col) :+ explode(col("__s.counters")).as("__c"): _*)
          .select(keyCols.map(col) :+ col("__c.item").as("item") :+
            col("__c.cnt").as("cnt") :+ lit(bid).as("batch_id"): _*),
        "batch_id", Seq(bid))
    if (shouldCheckFold(batchId, maxEpochs))
      foldHeavyHitterStore(spark, storeDir, capacity, maxEpochs, keyCols)
  }

  /** The per-key merged top-`k` view of a
    * [[heavyHittersIncrementalBatchByKey]] store: counter-sum per
    * `(key, item)`, envelope widened by the key's summed decrement mass,
    * top-`k` per key (count_min desc, item asc — deterministic). The
    * rank window is PARTITIONED by key over ≤ maxEpochs × capacity
    * counter rows per key — bounded, never a global sort. */
  def heavyHittersViewByKey(
      spark: org.apache.spark.sql.SparkSession,
      storeDir: String,
      keyCols: Seq[String],
      k: Int): DataFrame = {
    require(keyCols.nonEmpty,
      "keyCols must be non-empty - use heavyHittersView")
    val counters = new graft.store.SnapshotTable(spark, s"$storeDir/counters")
      .read().getOrElse(spark.emptyDataFrame.select(
        keyCols.map(lit(null).cast("string").as(_)) :+
          lit("").as("item") :+ lit(0L).as("cnt"): _*))
    val errs = new graft.store.SnapshotTable(spark, s"$storeDir/meta")
      .read()
      .map(_.groupBy(keyCols.map(col): _*)
        .agg(coalesce(sum("err"), lit(0L)).as("__err")))
      .getOrElse(spark.emptyDataFrame.select(
        keyCols.map(lit(null).cast("string").as(_)) :+
          lit(0L).as("__err"): _*))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("count_min").desc, col("item"))
    counters.groupBy((keyCols :+ "item").map(col): _*)
      .agg(sum("cnt").as("count_min"))
      .join(broadcast(errs), keyCols, "left")
      .select(keyCols.map(col) ++ Seq(col("item"), col("count_min"),
        (col("count_min") + coalesce(col("__err"), lit(0L)))
          .as("count_max")): _*)
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k).drop("__rk")
  }

  /** Bound a Misra–Gries epoch store ([[foldSketchStore]] for the
    * heavy-hitters family): past `maxEpochs` real epochs, the aged
    * epochs' counters re-merge through ONE capacity-bounded sketch
    * (weighted re-ingest — the MG merge; any decrement mass it incurs
    * joins the consolidated `err`) and both tables rewrite as
    * `recent ∪ consolidated`, per key when `keyCols` is non-empty. The
    * envelope stays valid in every regime (`count_min <= true <=
    * count_max` — re-merge decrements only move mass from count_min
    * into err) and the fold is a no-op numerically while `capacity >=`
    * the folded epochs' distinct items (the exact regime). The
    * consolidated meta row carries the SUM of folded true totals. Meta
    * rewrites BEFORE counters (the registration discipline): a crash
    * between them leaves the consolidated err alongside still-unfolded
    * counters — the envelope only widens. */
  private[graft] def foldHeavyHitterStore(
      spark: org.apache.spark.sql.SparkSession,
      storeDir: String,
      capacity: Int,
      maxEpochs: Int,
      keyCols: Seq[String]): Unit = {
    val metaT = new graft.store.SnapshotTable(spark, s"$storeDir/meta")
    val countersT = new graft.store.SnapshotTable(spark, s"$storeDir/counters")
    (metaT.read(), countersT.read()) match {
      case (Some(meta), Some(counters)) =>
        val foldIds = foldableEpochs(meta, maxEpochs)
        if (foldIds.nonEmpty) {
          val foldKeys = foldIds.map(_.toString) :+ FoldedEpochId
          val oldC = counters.where(col("batch_id").isin(foldKeys: _*))
          val keptC = counters.where(!col("batch_id").isin(foldKeys: _*))
          val oldM = meta.where(col("batch_id").isin(foldKeys: _*))
          val keptM = meta.where(!col("batch_id").isin(foldKeys: _*))
          // merged sketch state + folded err/total sums (one row per
          // key; ONE row globally), pinned so the two rewrites don't
          // re-aggregate. full_outer keyed join: a crash-orphaned meta
          // row (err without counters) must keep its err.
          val sk = graft.functions.FreqItems
            .freqSketchAgg(col("item"), col("cnt"), capacity).as("__s")
          val sums = Seq(coalesce(sum("err"), lit(0L)).as("__olderr"),
            coalesce(sum("total"), lit(0L)).as("__oldtotal"))
          val merged = (
            if (keyCols.isEmpty)
              oldC.agg(sk).crossJoin(oldM.agg(sums.head, sums.tail: _*))
            else
              oldC.groupBy(keyCols.map(col): _*).agg(sk)
                .join(oldM.groupBy(keyCols.map(col): _*)
                  .agg(sums.head, sums.tail: _*), keyCols, "full_outer")
          ).localCheckpoint()
          advanceFoldWatermark(spark, storeDir, foldIds)
          metaT.overwrite(keptM.unionByName(merged.select(
            keyCols.map(col) ++ Seq(
              (coalesce(col("__s.err"), lit(0L)) +
                coalesce(col("__olderr"), lit(0L))).as("err"),
              coalesce(col("__oldtotal"), lit(0L)).as("total"),
              lit(FoldedEpochId).as("batch_id")): _*)))
          countersT.overwrite(keptC.unionByName(
            merged.select(keyCols.map(col) :+
                explode(col("__s.counters")).as("__c"): _*)
              .select(keyCols.map(col) ++ Seq(col("__c.item").as("item"),
                col("__c.cnt").as("cnt"),
                lit(FoldedEpochId).as("batch_id")): _*)))
        }
      case _ => ()
    }
  }

  /** The merged top-`k` view of a [[heavyHittersIncrementalBatch]] store:
    * counter-sum per item across every registered batch, envelope widened
    * by the summed decrement mass (`count_min <= true <= count_max`, the
    * mergeable-summaries bound). One aggregate over at most
    * maxEpochs×capacity counter rows (the store fold consolidates aged
    * epochs — view cost is flat in stream lifetime) + a TakeOrdered
    * top-k — no full sort, no driver collect. */
  def heavyHittersView(
      spark: org.apache.spark.sql.SparkSession,
      storeDir: String,
      k: Int): DataFrame = {
    val counters = new graft.store.SnapshotTable(spark, s"$storeDir/counters")
      .read().getOrElse(spark.emptyDataFrame
        .select(lit("").as("item"), lit(0L).as("cnt")))
    val meta = new graft.store.SnapshotTable(spark, s"$storeDir/meta").read()
    val errSum = meta.map(_.agg(coalesce(sum("err"), lit(0L)).as("__err")))
      .getOrElse(spark.range(1).select(lit(0L).as("__err")))
    counters.groupBy("item").agg(sum("cnt").as("count_min"))
      .crossJoin(broadcast(errSum))
      .select(col("item"), col("count_min"),
        (col("count_min") + col("__err")).as("count_max"))
      .orderBy(col("count_min").desc, col("item"))
      .limit(k)
  }

  /** Equi-width histogram of a numeric column over `[lo, hi)`:
    * `bucket | lo_edge | hi_edge | cnt` for every OCCUPIED bucket
    * (standard SQL `width_bucket` numbering — bucket 0 is the underflow
    * bin, `nBins + 1` the overflow bin, identical in any engine that
    * implements the standard; their edges render as the open range's
    * nulls). Nulls are excluded. One scan + one `nBins`-row aggregate. */
  def histogram(
      df: DataFrame,
      colName: String,
      lo: Double,
      hi: Double,
      nBins: Int): DataFrame = {
    require(nBins > 0, "nBins must be positive")
    require(lo < hi, "lo must be < hi")
    val w = (hi - lo) / nBins
    val b = width_bucket(qcol(colName).cast("double"), lit(lo), lit(hi), lit(nBins))
    df.where(qcol(colName).isNotNull)
      .groupBy(b.as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("bucket"),
        when(col("bucket").between(1, nBins),
          round(lit(lo) + (col("bucket") - 1) * lit(w), 6)).as("lo_edge"),
        when(col("bucket").between(1, nBins),
          round(lit(lo) + col("bucket") * lit(w), 6)).as("hi_edge"),
        col("cnt"))
  }

  /** Incremental distinct cardinality: fold one (micro-)batch into a
    * persistent HyperLogLog summary store under `storeDir` — the third
    * member of the mergeable-summaries family (Misra–Gries counts, KLL
    * quantiles, HLL cardinality), answering "how many distinct
    * users/URLs/docs so far, across epochs" without ever re-scanning
    * history or shuffling the key universe. Uses Spark's built-in
    * Datasketches HLL aggregate (`hll_sketch_agg`): the batch collapses
    * to ONE `2^lgK`-byte-bounded sketch row, registered under `batchId`
    * via `appendReplacing` (replays replace — the heavy-hitters store
    * discipline). DETERMINISTIC for a fixed input (hash-based, no RNG);
    * collision-free in practice for small-cardinality columns (the
    * coupon regime — measured: exact at 40, already 447/450 at 450), and
    * ~1–2 % standard error at `lgK = 12` at scale. Keep oracles on
    * small-cardinality columns; assert error bounds, not values, past
    * that (the sketch-regime discipline). */
  def distinctSketchIncrementalBatch(
      batch: DataFrame,
      itemCol: String,
      storeDir: String,
      batchId: Long,
      lgK: Int = 12,
      maxEpochs: Int = 64): Unit = {
    val spark = batch.sparkSession
    if (batchId <= foldWatermark(spark, storeDir)) return
    Stores.register(spark, storeDir, "distinct", Nil, Some(lgK))
    val bid = batchId.toString
    val s = batch
      .agg(hll_sketch_agg(qcol(itemCol), lit(lgK)).as("__s"))
      .localCheckpoint()
    new graft.store.SnapshotTable(spark, s"$storeDir/sketches")
      .appendReplacing(
        s.select(col("__s").as("sketch"), lit(bid).as("batch_id")),
        "batch_id", Seq(bid))
    if (shouldCheckFold(batchId, maxEpochs))
      foldDistinctStore(spark, storeDir, maxEpochs, Nil)
  }

  /** Keyed incremental distinct cardinality:
    * [[distinctSketchIncrementalBatch]] with one HLL sketch PER KEY per
    * epoch — "distinct users/URLs so far, per domain/language", the HLL
    * member of the keyed store family. Store grain: `keyCols | sketch |
    * batch_id`; epoch-keyed `appendReplacing` (replays replace;
    * already-folded epochs drop), aged epochs union PER KEY. Null-key
    * rows are excluded (the keyed-join contract). */
  def distinctSketchIncrementalBatchByKey(
      batch: DataFrame,
      itemCol: String,
      keyCols: Seq[String],
      storeDir: String,
      batchId: Long,
      lgK: Int = 12,
      maxEpochs: Int = 64): Unit = {
    require(keyCols.nonEmpty,
      "keyCols must be non-empty - use distinctSketchIncrementalBatch")
    val reserved = Seq("sketch", "batch_id", "__s")
    require(!keyCols.exists(reserved.contains(_)),
      s"key columns may not use the reserved names ${reserved.mkString("/")}")
    val spark = batch.sparkSession
    if (batchId <= foldWatermark(spark, storeDir)) return
    Stores.register(spark, storeDir, "distinct", keyCols, Some(lgK))
    val bid = batchId.toString
    val s = batch
      .where(keyCols.map(qcol(_).isNotNull).reduce(_ && _))
      .groupBy(keyCols.map(qcol): _*)
      .agg(hll_sketch_agg(qcol(itemCol), lit(lgK)).as("sketch"))
      .localCheckpoint()
    new graft.store.SnapshotTable(spark, s"$storeDir/sketches")
      .appendReplacing(
        s.select(keyCols.map(col) :+ col("sketch") :+
          lit(bid).as("batch_id"): _*),
        "batch_id", Seq(bid))
    if (shouldCheckFold(batchId, maxEpochs))
      foldDistinctStore(spark, storeDir, maxEpochs, keyCols)
  }

  /** The per-key merged view of a
    * [[distinctSketchIncrementalBatchByKey]] store: one union estimate
    * per key — `keyCols | n_distinct`. Distinct-union semantics: epochs
    * overlapping on a key never double-count. */
  def distinctSketchViewByKey(
      spark: org.apache.spark.sql.SparkSession,
      storeDir: String,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty,
      "keyCols must be non-empty - use distinctSketchView")
    val sketches = new graft.store.SnapshotTable(spark, s"$storeDir/sketches")
      .read().getOrElse(spark.emptyDataFrame.select(
        keyCols.map(lit(null).cast("string").as(_)) :+
          lit(null).cast("binary").as("sketch"): _*))
    sketches.groupBy(keyCols.map(col): _*)
      .agg(coalesce(hll_sketch_estimate(
        hll_union_agg(col("sketch"), lit(true))), lit(0L)).as("n_distinct"))
  }

  /** Bound an HLL epoch store: past `maxEpochs` real epochs, the aged
    * sketches union into ONE consolidated sketch under the sentinel
    * epoch (per key when `keyCols` is non-empty). HLL union is
    * associative AND idempotent, so the view is bit-identical across the
    * fold in every regime — the easiest member of the family
    * ([[foldSketchStore]], [[foldHeavyHitterStore]]). */
  private[graft] def foldDistinctStore(
      spark: org.apache.spark.sql.SparkSession,
      storeDir: String,
      maxEpochs: Int,
      keyCols: Seq[String]): Unit = {
    val table = new graft.store.SnapshotTable(spark, s"$storeDir/sketches")
    table.read().foreach { sketches =>
      val foldIds = foldableEpochs(sketches, maxEpochs)
      if (foldIds.nonEmpty) {
        val foldKeys = foldIds.map(_.toString) :+ FoldedEpochId
        val old = sketches.where(col("batch_id").isin(foldKeys: _*))
        val kept = sketches.where(!col("batch_id").isin(foldKeys: _*))
        val u = hll_union_agg(col("sketch"), lit(true)).as("sketch")
        val merged =
          (if (keyCols.isEmpty) old.agg(u)
           else old.groupBy(keyCols.map(col): _*).agg(u))
            .select(keyCols.map(col) :+ col("sketch") :+
              lit(FoldedEpochId).as("batch_id"): _*)
        advanceFoldWatermark(spark, storeDir, foldIds)
        table.overwrite(kept.unionByName(merged))
      }
    }
  }

  /** The merged view of a [[distinctSketchIncrementalBatch]] store: ONE
    * row `n_distinct` — the union estimate across every registered epoch
    * (`hll_union_agg` over epochs×1 sketch rows; distinct-union, never a
    * double-count, no matter how epochs overlap). */
  def distinctSketchView(
      spark: org.apache.spark.sql.SparkSession,
      storeDir: String): DataFrame = {
    val sketches = new graft.store.SnapshotTable(spark, s"$storeDir/sketches")
      .read().getOrElse(spark.emptyDataFrame
        .select(lit(null).cast("binary").as("sketch")))
    // an EMPTY store must read 0, not a null estimate over zero sketches
    sketches
      .agg(coalesce(hll_sketch_estimate(
        hll_union_agg(col("sketch"), lit(true))), lit(0L)).as("n_distinct"))
  }

  /** Corpus overlap on the DISTINCT values of `leftCol`/`rightCol`
    * (`rightCol` defaults to `leftCol`): one row —
    * `n_left | n_right | n_common | n_union | jaccard |
    * containment_left | containment_right` — the "how much of corpus B
    * have we already got?" question that gates a crawl merge, a
    * vendor-data purchase, or a cross-split contamination estimate at
    * the id/url/hash grain (pair with the Dedup family when the grain
    * is fuzzy content rather than exact values). Nulls are not values
    * and never overlap. Jaccard/containments are rounded to 6 places;
    * empty inputs read 0 counts and 0 ratios, never null.
    *
    * Scale shape, `exact = true`: two distinct-collapses and one
    * LEFT SEMI join between them — correct at any scale but
    * shuffle-bound on the distinct sets (the oracle path). `exact =
    * false` (default): one HLL sketch aggregate per side, intersection
    * by inclusion-exclusion (`|A∩B| = |A|+|B|-|A∪B|`, union via the
    * pairwise `hll_union` of the two 2^lgK-byte sketches) — two scans,
    * NO join, a two-sketch exchange, ~1-2 % standard error at the
    * default lgK=12 with the estimate clamped at 0 (inclusion-exclusion
    * noise can read slightly negative on near-disjoint corpora). */
  def overlapEstimate(
      left: DataFrame,
      right: DataFrame,
      leftCol: String,
      rightColOpt: Option[String] = None,
      exact: Boolean = false,
      lgK: Int = 12): DataFrame = {
    val rightCol = rightColOpt.getOrElse(leftCol)
    def r6(c: Column): Column = round(c, 6)
    val withCounts =
      if (exact) {
        val a = left.where(qcol(leftCol).isNotNull)
          .select(qcol(leftCol).as("__v")).distinct()
        val b = right.where(qcol(rightCol).isNotNull)
          .select(qcol(rightCol).as("__v")).distinct()
        val na = a.agg(count(lit(1)).as("n_left"))
        val nb = b.agg(count(lit(1)).as("n_right"))
        val ni = a.join(b, Seq("__v"), "left_semi")
          .agg(count(lit(1)).as("n_common"))
        na.crossJoin(broadcast(nb)).crossJoin(broadcast(ni))
      } else {
        val sa = left.agg(
          hll_sketch_agg(qcol(leftCol), lit(lgK)).as("__sa"))
        val sb = right.agg(
          hll_sketch_agg(qcol(rightCol), lit(lgK)).as("__sb"))
        sa.crossJoin(broadcast(sb))
          .select(
            coalesce(hll_sketch_estimate(col("__sa")), lit(0L))
              .as("n_left"),
            coalesce(hll_sketch_estimate(col("__sb")), lit(0L))
              .as("n_right"),
            // an all-null/empty side yields a null sketch; the union
            // must then fall back to the OTHER side's estimate so the
            // intersection reads 0, not the surviving side's count
            coalesce(
              hll_sketch_estimate(
                hll_union(col("__sa"), col("__sb"),
                  allowDifferentLgConfigK = true)),
              hll_sketch_estimate(col("__sa")),
              hll_sketch_estimate(col("__sb")),
              lit(0L)).as("__nu"))
          .select(col("n_left"), col("n_right"),
            // inclusion-exclusion noise on near-containment corpora can
            // push the estimate past a side's own count (containment
            // would then read > 1.0) — clamp to [0, min(sides)]
            least(least(col("n_left"), col("n_right")),
              greatest(lit(0L),
                col("n_left") + col("n_right") - col("__nu")))
              .as("n_common"))
      }
    withCounts.select(
        col("n_left"), col("n_right"), col("n_common"),
        (col("n_left") + col("n_right") - col("n_common")).as("n_union"))
      .select(col("*"),
        r6(when(col("n_union") === 0, 0.0)
          .otherwise(col("n_common").cast("double") / col("n_union")))
          .as("jaccard"),
        r6(when(col("n_left") === 0, 0.0)
          .otherwise(col("n_common").cast("double") / col("n_left")))
          .as("containment_left"),
        r6(when(col("n_right") === 0, 0.0)
          .otherwise(col("n_common").cast("double") / col("n_right")))
          .as("containment_right"))
  }

  /** Winsorization: clip `valueCol` to its `[loProb, hiProb]` quantile
    * range per `keyCols` group (globally when empty) — the standard
    * tail-capping step before scale-sensitive downstream math (mixture
    * weights, normalization, embedding-training temperatures). Appends
    * `outCol` (default `<valueCol>_wins`); nulls stay null.
    *
    * Scale shape: BOTH cut points come from ONE aggregate pass
    * (`percentile(v, array(lo, hi))`), joined back broadcast-style (one
    * row per key); the clip is a pure codegen'd map. `approx = true`
    * swaps the exact interpolated percentile (group-multiset buffer) for
    * the `k`-capacity KLL sketch (discrete cut points) — the petabyte
    * path. */
  def winsorize(
      df: DataFrame,
      valueCol: String,
      keyCols: Seq[String] = Nil,
      loProb: Double = 0.01,
      hiProb: Double = 0.99,
      approx: Boolean = false,
      k: Int = 8192,
      outCol: String = "",
      broadcastStats: Boolean = true): DataFrame = {
    require(loProb >= 0 && hiProb <= 1 && loProb <= hiProb,
      s"need 0 <= loProb <= hiProb <= 1, got [$loProb, $hiProb]")
    val out = if (outCol.nonEmpty) outCol else s"${valueCol}_wins"
    require(!df.columns.contains(out),
      s"output column '$out' collides with input schema")
    require(!df.columns.exists(Set("__ql", "__qh", "__v")),
      "input columns may not use the reserved names __ql/__qh/__v")
    val v = qcol(valueCol).cast("double")
    val cuts: Column =
      if (approx) graft.functions.Kll.quantilesAgg(col("__v"), k,
        Seq(loProb, hiProb))
      else expr(s"percentile(__v, array($loProb, $hiProb))")
    val cutCols =
      if (approx) Seq(element_at(col("__c"), 1).getField("value").as("__ql"),
        element_at(col("__c"), 2).getField("value").as("__qh"))
      else Seq(element_at(col("__c"), 1).as("__ql"),
        element_at(col("__c"), 2).as("__qh"))
    val withV = df.withColumn("__v", v)
    val qDf = {
      val base = withV.where(col("__v").isNotNull)
      val agged =
        if (keyCols.isEmpty) base.agg(cuts.as("__c"))
        else base.groupBy(keyCols.map(col): _*).agg(cuts.as("__c"))
      agged.select((keyCols.map(col) ++ cutCols): _*)
    }
    val joined =
      if (keyCols.isEmpty) withV.crossJoin(broadcast(qDf))
      else withV.join(
        if (broadcastStats) broadcast(qDf) else qDf, keyCols, "left")
    // Spark's least/greatest SKIP nulls, which is right for a missing cut
    // (one-sided or absent cuts degrade to passthrough) but would turn a
    // NULL VALUE into the lower cut — guard the value explicitly
    joined
      .withColumn(out, when(col("__v").isNotNull,
        least(greatest(col("__v"), col("__ql")), col("__qh"))))
      .drop("__v", "__ql", "__qh")
  }

  /** Robust outlier detection (Iglewicz–Hoaglin modified z-score): flag
    * rows where `|0.6745 (x − median)| / MAD > z`, with median and MAD
    * (median absolute deviation) computed per `keyCols` group (or
    * globally when empty). Median/mean-based z-scores break on the very
    * heavy tails they're meant to find — one pathological 10 GB document
    * drags a mean; it cannot drag a median.
    *
    * Appends `robust_z` (null when `MAD = 0` — a degenerate
    * constant-valued group has no scale to score against; those rows are
    * never flagged, documented) and `is_outlier`. Null values get a null
    * z and `is_outlier = false`.
    *
    * Scale shape: [[robustStats]] trains (exact: two aggregate passes +
    * one residual join; approx: ONE `k`-bounded sketch pass, no join),
    * then the full frame joins the one-row-per-key stats ONCE —
    * broadcast under `broadcastStats` (default), so the big side never
    * exchanges; flip it off for ultra-high-cardinality keys. */
  /** Robust location/scale per group: `keyCols | median | mad` (median
    * absolute deviation), one row per key holding at least one non-null
    * value — the trained side of the Iglewicz–Hoaglin gate. Factored out
    * of [[outliers]] so a pipeline can train the stats ONCE on a trusted
    * batch, persist them (they are one row per key), and serve them to a
    * stream ([[graft.streaming.StreamOps.outlierFilter]]) — the same
    * train-batch/serve-stream split as the perplexity LM.
    *
    * Scale shape, exact path: two aggregate passes over `(keys, value)`
    * only (column-pruned; exact medians interpolate — Spark `percentile`
    * ≡ DuckDB quantile_cont), with the residual pass joining the value
    * frame against the one-row-per-key median frame (broadcast under
    * `broadcastStats`; flip it off for ultra-high-cardinality keys and
    * let AQE plan the shuffle join). `approx = true` is the petabyte
    * path: median AND MAD come out of ONE `k`-bounded KLL sketch per
    * group (the MAD is the weighted median of `|survivor − median|` —
    * [[graft.functions.Kll.Sketch.medianAbsDev]]), so training is a
    * single map-side-combined pass with NO residual join at all;
    * medians are discrete, and the MAD carries ~2× the rank envelope. */
  def robustStats(
      df: DataFrame,
      valueCol: String,
      keyCols: Seq[String] = Nil,
      approx: Boolean = false,
      k: Int = 8192,
      broadcastStats: Boolean = true): DataFrame = {
    val reserved = Seq("__v", "__mm", "median", "mad")
    require(!keyCols.exists(reserved.contains(_)),
      s"key columns may not use the reserved names ${reserved.mkString("/")}")
    def grouped(in: DataFrame, agg: Column, name: String): DataFrame =
      if (keyCols.isEmpty) in.agg(agg.as(name))
      else in.groupBy(keyCols.map(col): _*).agg(agg.as(name))
    val withV = df
      .select(keyCols.map(qcol) :+ qcol(valueCol).cast("double").as("__v"): _*)
      .where(col("__v").isNotNull)
    if (approx) {
      def deNaN(c: Column): Column = when(!isnan(c), c)
      grouped(withV,
          graft.functions.Kll.robustStatsAgg(col("__v"), k), "__mm")
        .select(keyCols.map(col) :+
          deNaN(col("__mm._1")).as("median") :+
          deNaN(col("__mm._2")).as("mad"): _*)
    } else {
      val medDf = grouped(withV, expr("percentile(__v, 0.5)"), "median")
      val j1 =
        if (keyCols.isEmpty) withV.crossJoin(broadcast(medDf))
        else withV.join(
          if (broadcastStats) broadcast(medDf) else medDf, keyCols)
      val madDf = grouped(j1,
        expr("percentile(abs(__v - median), 0.5)"), "mad")
      if (keyCols.isEmpty) medDf.crossJoin(madDf)
      else medDf.join(madDf, keyCols)
    }
  }

  def outliers(
      df: DataFrame,
      valueCol: String,
      keyCols: Seq[String] = Nil,
      z: Double = 3.5,
      approx: Boolean = false,
      k: Int = 8192,
      broadcastStats: Boolean = true): DataFrame = {
    require(z > 0, "z must be positive")
    val reserved = Seq("__v", "__med", "__mad", "robust_z", "is_outlier")
    require(!df.columns.exists(reserved.contains(_)),
      s"input columns may not use the reserved names ${reserved.mkString("/")}")
    val stats = robustStats(df, valueCol, keyCols, approx, k, broadcastStats)
      .withColumnRenamed("median", "__med").withColumnRenamed("mad", "__mad")
    // LEFT join: an all-null-valued group has no stats row (the
    // aggregates run on non-null values), but its rows must still come
    // out — with null robust_z, never silently dropped. Broadcasting the
    // one-row-per-key stats side keeps the full frame exchange-free.
    val withV = df.withColumn("__v", qcol(valueCol).cast("double"))
    val joined =
      if (keyCols.isEmpty) withV.crossJoin(broadcast(stats))
      else withV.join(
        if (broadcastStats) broadcast(stats) else stats, keyCols, "left")
    joined.withColumn("robust_z", robustZ(col("__v"), col("__med"), col("__mad")))
      .withColumn("is_outlier",
        coalesce(abs(col("robust_z")) > lit(z), lit(false)))
      .drop("__v", "__med", "__mad")
  }

  /** The Iglewicz–Hoaglin modified z-score expression shared by the batch
    * gate ([[outliers]]) and the streaming gate
    * ([[graft.streaming.StreamOps.outlierFilter]]): null when MAD is not
    * strictly positive (a constant-valued group has no scale to score
    * against). */
  def robustZ(v: Column, median: Column, mad: Column): Column =
    when(mad > 0, lit(0.6745) * (v - median) / mad)

  /** Discrete quantiles of `valueCol` at `probs` via a `k`-capacity KLL
    * compactor stack ([[graft.functions.Kll]]): ONE map-side-combined
    * aggregate whose buffers are capacity-bounded (`k × log` doubles),
    * unlike exact `percentile` whose buffer holds the whole value
    * multiset of the group. Returns `prob | val`, one row per prob.
    * EXACT (and equal to DuckDB `quantile_disc`) whenever the table has
    * <= `k` non-null rows; within the KLL rank envelope otherwise. */
  def quantileSketch(
      df: DataFrame,
      valueCol: String,
      probs: Seq[Double],
      k: Int): DataFrame =
    df.agg(graft.functions.Kll
        .quantilesAgg(qcol(valueCol), k, probs).as("__q"))
      .select(inline(col("__q")))
      .withColumnRenamed("value", "val")

  /** Sentinel `batch_id` under which the store fold consolidates aged
    * epochs ([[foldSketchStore]]). `~` sorts after every digit and can
    * never collide with a real epoch id (writers mint those from `Long`
    * batch ids). */
  private[graft] val FoldedEpochId = "~folded"

  private def foldWatermarkPath(storeDir: String): String =
    s"$storeDir/fold_watermark"

  /** Largest numeric epoch id already consolidated into the folded
    * segment of the store at `storeDir` (−1 when never folded). Folds
    * advance it monotonically, BEFORE the consolidating rewrite commits:
    * a crash between the two leaves those epochs individually keyed AND
    * replay-dropped — their original registrations still count exactly
    * once (the safe direction; the reverse order could double-count). */
  private[graft] def foldWatermark(
      spark: org.apache.spark.sql.SparkSession, storeDir: String): Long =
    if (!graft.store.Fs.exists(spark, foldWatermarkPath(storeDir))) -1L
    else scala.util.Try(graft.store.Fs
      .readString(spark, foldWatermarkPath(storeDir)).trim.toLong)
      .getOrElse(-1L)

  /** Distinct REAL (numeric, non-sentinel) epoch ids in an epoch-keyed
    * store frame, ascending. Bounded by the fold cap — called only on
    * stores that fold. */
  private[graft] def epochIds(items: DataFrame): Seq[Long] =
    items.select("batch_id").where(col("batch_id") =!= FoldedEpochId)
      .distinct().collect()
      .flatMap(r => scala.util.Try(r.getString(0).toLong).toOption)
      .sorted.toSeq

  /** Epoch ids to consolidate when the store holds more than `maxEpochs`
    * real epochs: everything but the newest `max(1, maxEpochs/2)`.
    * Keeping the recent half individually keyed preserves normal replay
    * replacement for any epoch a restarted stream could redeliver, and
    * amortizes the fold's O(store) rewrite over `maxEpochs/2` appends.
    * Empty when under the cap (or folding is disabled, `maxEpochs <=
    * 0`). */
  private[graft] def foldableEpochs(items: DataFrame, maxEpochs: Int): Seq[Long] = {
    if (maxEpochs <= 0) return Seq.empty
    val epochs = epochIds(items)
    if (epochs.length <= maxEpochs) Seq.empty
    else epochs.dropRight(math.max(1, maxEpochs / 2))
  }

  /** Whether this append should even CHECK the fold condition: counting
    * registered epochs is a (small) Spark job, so paying it every batch
    * roughly doubles per-append cost for trivial batches (measured on
    * the ×30 long-stream bench). Checking every `max(1, maxEpochs/8)`
    * batches keeps the check amortized while bounding the overshoot at
    * `maxEpochs + maxEpochs/8` epochs — still O(maxEpochs). Epoch ids
    * are monotone (structured-streaming batch ids), so consecutive
    * appends hit every residue class. */
  private[graft] def shouldCheckFold(batchId: Long, maxEpochs: Int): Boolean =
    maxEpochs > 0 && batchId % math.max(1, maxEpochs / 8) == 0

  /** Advance the fold watermark to cover `foldIds` (monotone max). Must
    * commit BEFORE the consolidating rewrite — see [[foldWatermark]]. */
  private[graft] def advanceFoldWatermark(
      spark: org.apache.spark.sql.SparkSession,
      storeDir: String,
      foldIds: Seq[Long]): Unit =
    graft.store.Fs.writeStringAtomic(spark, foldWatermarkPath(storeDir),
      math.max(foldIds.max, foldWatermark(spark, storeDir)).toString)

  /** Pre-r10 KLL stores carry no `n_rows` column; a segmented append of
    * the new schema onto old segments would leave the table's inferred
    * schema ambiguous, so the first write after the upgrade rewrites the
    * store once with a null count (views fall back to survivor weight
    * for those epochs — the old rendering, exact in the exact regime). */
  private def upgradeItemsSchema(table: graft.store.SnapshotTable): Unit =
    table.read().foreach { items =>
      if (!items.columns.contains("n_rows"))
        table.overwrite(items.withColumn("n_rows", lit(null).cast("long")))
    }

  private def withNRows(items: DataFrame): DataFrame =
    if (items.columns.contains("n_rows")) items
    else items.withColumn("n_rows", lit(null).cast("long"))

  /** Per-epoch survivor weight (`sum 2^level`) and recorded true count,
    * reduced to one total per `keyCols` group: true counts where the
    * epoch recorded one, survivor weight otherwise (pre-upgrade epochs).
    * Bounded input by construction (the store's item rows). */
  private def trueCountPerKey(
      items: DataFrame, keyCols: Seq[String], out: String): DataFrame = {
    val perEpoch = withNRows(items)
      .groupBy((keyCols :+ "batch_id").map(col): _*)
      .agg(first("n_rows").as("__n"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), level)")).as("__w"))
    val n = sum(coalesce(col("__n"), col("__w"))).as(out)
    if (keyCols.isEmpty) perEpoch.agg(n)
    else perEpoch.groupBy(keyCols.map(col): _*).agg(n)
  }

  /** Bound a KLL epoch store: when more than `maxEpochs` real epochs are
    * registered, re-merge every aged epoch (plus any previous fold) into
    * ONE consolidated summary under [[FoldedEpochId]] and rewrite the
    * store as `recent epochs ∪ consolidated` — view and sink cost become
    * O(maxEpochs × k·log) rows regardless of stream lifetime (the
    * `maxOverflowSegments` fold discipline applied to epoch age). The
    * re-merge aggregate is associative, so every view is UNCHANGED in
    * the exact regime and stays within the rank envelope past it; the
    * consolidated row-set carries the SUM of the folded epochs' true
    * counts, so count rendering survives the fold exactly. Replay of an
    * already-folded epoch is dropped by the watermark check in the
    * writers (its rows are inside the consolidated segment — exactly
    * once either way under deterministic redelivery). */
  private[graft] def foldSketchStore(
      spark: org.apache.spark.sql.SparkSession,
      storeDir: String,
      keyCols: Seq[String],
      k: Int,
      maxEpochs: Int): Unit = {
    val table = new graft.store.SnapshotTable(spark, s"$storeDir/items")
    table.read().foreach { items0 =>
      val foldIds = foldableEpochs(items0, maxEpochs)
      if (foldIds.nonEmpty) {
        val items = withNRows(items0)
        val foldKeys = foldIds.map(_.toString) :+ FoldedEpochId
        val old = items.where(col("batch_id").isin(foldKeys: _*))
        val kept = items.where(!col("batch_id").isin(foldKeys: _*))
        val oldN = trueCountPerKey(old, keyCols, "n_rows")
        val sk = graft.functions.Kll
          .remergeSketchAgg(col("level"), col("value"), k).as("__s")
        val merged =
          if (keyCols.isEmpty) old.agg(sk).crossJoin(oldN)
          else old.groupBy(keyCols.map(col): _*).agg(sk).join(oldN, keyCols)
        val consolidated = merged
          .select(keyCols.map(col) :+ explode(col("__s.items")).as("__i")
            :+ col("n_rows"): _*)
          .select(keyCols.map(col) :+ col("__i.level").as("level")
            :+ col("__i.value").as("value")
            :+ lit(FoldedEpochId).as("batch_id") :+ col("n_rows"): _*)
        advanceFoldWatermark(spark, storeDir, foldIds)
        table.overwrite(kept.unionByName(consolidated))
      }
    }
  }

  /** Incremental quantiles: fold one (micro-)batch into a persistent KLL
    * summary store under `storeDir`. The batch aggregates into ONE
    * bounded sketch row whose `(level, value)` survivors land in an
    * `items` SnapshotTable keyed by `batchId` via `appendReplacing` — a
    * REDELIVERED batch atomically replaces its own earlier registration
    * (exactly-once under streaming replay, the heavy-hitters store
    * discipline); a replay of an epoch ALREADY consolidated by the store
    * fold is dropped instead (its rows live in the folded segment — the
    * [[foldWatermark]] check, still exactly once). Every item row also
    * records the epoch's TRUE ingested count (`n_rows`, non-null values
    * only), so count-rendering views never fall back to survivor-weight
    * estimates. Store size is bounded: past `maxEpochs` registered
    * epochs the aged ones consolidate under one sentinel epoch
    * ([[foldSketchStore]]), capping growth at O(maxEpochs × k·log) item
    * rows for the life of the stream (`maxEpochs <= 0` disables the
    * fold). */
  def quantileSketchIncrementalBatch(
      batch: DataFrame,
      valueCol: String,
      storeDir: String,
      k: Int,
      batchId: Long,
      maxEpochs: Int = 64): Unit = {
    val spark = batch.sparkSession
    if (batchId <= foldWatermark(spark, storeDir)) return
    Stores.register(spark, storeDir, "quantiles", Nil, Some(k))
    val bid = batchId.toString
    val s = batch.agg(graft.functions.Kll
        .sketchAgg(qcol(valueCol), k).as("__s"))
      .localCheckpoint()
    val table = new graft.store.SnapshotTable(spark, s"$storeDir/items")
    upgradeItemsSchema(table)
    table.appendReplacing(
      s.select(explode(col("__s.items")).as("__i"), col("__s.n").as("n_rows"))
        .select(col("__i.level").as("level"), col("__i.value").as("value"),
          lit(bid).as("batch_id"), col("n_rows")),
      "batch_id", Seq(bid))
    foldSketchStore(spark, storeDir, Nil, k, maxEpochs)
  }

  /** The merged quantile view of a [[quantileSketchIncrementalBatch]]
    * store: every persisted `(level, value)` row re-enters a KLL stack at
    * its level ([[graft.functions.Kll.remergeAgg]]) — a distributive
    * aggregate over at most `maxEpochs × k·log` rows (the store fold
    * consolidates aged epochs, so view cost is FLAT in stream lifetime),
    * no driver collect, no special merge path. Exact while total rows
    * across epochs stay <= `k`. */
  def quantileSketchView(
      spark: org.apache.spark.sql.SparkSession,
      storeDir: String,
      probs: Seq[Double],
      k: Int): DataFrame = {
    val items = new graft.store.SnapshotTable(spark, s"$storeDir/items")
      .read().getOrElse(spark.emptyDataFrame
        .select(lit(-1).as("level"), lit(Double.NaN).as("value")))
    items.agg(graft.functions.Kll
        .remergeAgg(col("level"), col("value"), k, probs).as("__q"))
      .select(inline(col("__q")))
      .withColumnRenamed("value", "val")
  }

  /** Keyed incremental quantiles: [[quantileSketchIncrementalBatch]]
    * with one bounded sketch PER KEY per epoch — per-domain p50/p99
    * that folds across days. Store grain: `keyCols | level | value |
    * batch_id | n_rows` (the epoch's true per-key count rides on every
    * item row), epoch-keyed `appendReplacing` (replayed batches replace;
    * already-folded epochs drop — [[foldWatermark]]). Store size is
    * bounded at O(maxEpochs × keys × k·log) item rows by the same aged-
    * epoch consolidation as the global store, applied PER KEY. */
  def quantileSketchIncrementalBatchByKey(
      batch: DataFrame,
      valueCol: String,
      keyCols: Seq[String],
      storeDir: String,
      k: Int,
      batchId: Long,
      maxEpochs: Int = 64): Unit = {
    require(keyCols.nonEmpty,
      "keyCols must be non-empty - use quantileSketchIncrementalBatch")
    val reserved = Seq("level", "value", "batch_id", "n_rows", "__n", "__w")
    require(!keyCols.exists(reserved.contains(_)),
      s"key columns may not use the reserved names ${reserved.mkString("/")}")
    val spark = batch.sparkSession
    if (batchId <= foldWatermark(spark, storeDir)) return
    Stores.register(spark, storeDir, "quantiles", keyCols, Some(k))
    val bid = batchId.toString
    val s = batch
      .where(keyCols.map(qcol(_).isNotNull).reduce(_ && _))
      .groupBy(keyCols.map(qcol): _*)
      .agg(graft.functions.Kll.sketchAgg(qcol(valueCol), k).as("__s"))
      .localCheckpoint()
    val table = new graft.store.SnapshotTable(spark, s"$storeDir/items")
    upgradeItemsSchema(table)
    table.appendReplacing(
      s.select(keyCols.map(col) :+ explode(col("__s.items")).as("__i") :+
          col("__s.n").as("n_rows"): _*)
        .select(keyCols.map(col) :+ col("__i.level").as("level") :+
          col("__i.value").as("value") :+ lit(bid).as("batch_id") :+
          col("n_rows"): _*),
      "batch_id", Seq(bid))
    if (shouldCheckFold(batchId, maxEpochs))
      foldSketchStore(spark, storeDir, keyCols, k, maxEpochs)
  }

  /** The per-key merged quantile view of a
    * [[quantileSketchIncrementalBatchByKey]] store: one distributive
    * re-merge aggregate per key — `keyCols | prob | val`. */
  def quantileSketchViewByKey(
      spark: org.apache.spark.sql.SparkSession,
      storeDir: String,
      keyCols: Seq[String],
      probs: Seq[Double],
      k: Int): DataFrame = {
    val items = new graft.store.SnapshotTable(spark, s"$storeDir/items")
      .read().getOrElse(spark.emptyDataFrame.select(
        keyCols.map(lit(null).cast("string").as(_)) :+
          lit(-1).as("level") :+ lit(Double.NaN).as("value"): _*))
    items.groupBy(keyCols.map(col): _*)
      .agg(graft.functions.Kll
        .remergeAgg(col("level"), col("value"), k, probs).as("__q"))
      .select(keyCols.map(col) :+ explode(col("__q")).as("__e"): _*)
      .select(keyCols.map(col) :+ col("__e.prob").as("prob") :+
        col("__e.value").as("val"): _*)
  }

  /** Per-key sketch-native drift: [[driftNumericByKey]] computed purely
    * from two keyed KLL epoch stores — the per-domain "has this source
    * drifted" monitor with no history rescan. Fully relational and
    * driver-collect-free: per-key cuts come from one distributive
    * re-merge aggregate over the reference store; bin masses come from
    * binning the stores' OWN survivor items (weight `2^level`) against
    * those cuts — one HOF comparison per item row, one `(key, bin)`
    * groupBy per side. Output matches [[driftNumericByKey]] minus the
    * null bin (sketches ingest only non-null values); `n_ref`/`n_cur`
    * render the survivor-weight bin masses RESCALED to each key's
    * recorded true total (per-epoch `n_rows`, summed — the epoch fold
    * preserves the sum), so the count columns are true-count-scaled in
    * all regimes (identically the raw masses in the exact regime, where
    * weight equals count; the PSI fractions never depend on the
    * scaling). Only reference-baselined keys are monitored. */
  def driftByKeyFromSketchStores(
      spark: org.apache.spark.sql.SparkSession,
      refStoreDir: String,
      curStoreDir: String,
      keyCols: Seq[String],
      nBins: Int = 10,
      k: Int = 8192,
      eps: Double = 1e-6,
      broadcastStats: Boolean = true): DataFrame = {
    require(keyCols.nonEmpty,
      "keyCols must be non-empty - use driftFromSketchStores")
    require(nBins >= 2, "need at least 2 bins")
    require(eps > 0, "eps must be positive")
    def load(dir: String): DataFrame =
      new graft.store.SnapshotTable(spark, s"$dir/items").read()
        .getOrElse(throw new IllegalArgumentException(
          s"no keyed sketch store at $dir"))
    val refItems = load(refStoreDir)
    val curItems = load(curStoreDir)
    val probs = (1 until nBins).map(_.toDouble / nBins)
    val cutsDf = refItems.groupBy(keyCols.map(col): _*)
      .agg(graft.functions.Kll
        .remergeAgg(col("level"), col("value"), k, probs)
        .getField("value").as("__cuts"))
    val cutsSide = if (broadcastStats) broadcast(cutsDf) else cutsDf
    def binnedW(items: DataFrame, n: String): DataFrame =
      items.join(cutsSide, keyCols)
        .withColumn("bin",
          aggregate(col("__cuts"), lit(0),
            (acc, c) => acc + when(col("value") > c, 1).otherwise(0)))
        .withColumn("__w", expr("shiftleft(CAST(1 AS BIGINT), level)"))
        .groupBy((keyCols.map(col) :+ col("bin")): _*)
        .agg(sum("__w").as(n))
    val joined = binnedW(refItems, "n_ref")
      .join(binnedW(curItems, "n_cur"), keyCols :+ "bin", "full_outer")
      .na.fill(0L, Seq("n_ref", "n_cur"))
    val totals = joined.groupBy(keyCols.map(col): _*)
      .agg(sum("n_ref").as("__tr"), sum("n_cur").as("__tc"))
    val totalsSide = if (broadcastStats) broadcast(totals) else totals
    // recorded true totals per key (one row per key — broadcastable);
    // left joins: a key absent from one side keeps its 0-mass bins
    val trueRef = trueCountPerKey(refItems, keyCols, "__ntr")
    val trueCur = trueCountPerKey(curItems, keyCols, "__ntc")
    def scaled(mass: Column, total: Column, trueN: Column): Column =
      when(total > 0, round(mass * (trueN / total)).cast("long"))
        .otherwise(mass)
    val pRef = greatest(when(col("__tr") > 0, col("n_ref") / col("__tr")), lit(eps))
    val pCur = greatest(when(col("__tc") > 0, col("n_cur") / col("__tc")), lit(eps))
    joined.join(totalsSide, keyCols)
      .join(if (broadcastStats) broadcast(trueRef) else trueRef, keyCols, "left")
      .join(if (broadcastStats) broadcast(trueCur) else trueCur, keyCols, "left")
      .join(cutsSide, keyCols)
      .select(keyCols.map(col) ++ Seq(col("bin"),
        when(col("bin") > 0, element_at(col("__cuts"), col("bin"))).as("lo"),
        when(col("bin").between(0, nBins - 2),
          element_at(col("__cuts"), col("bin") + 1)).as("hi"),
        scaled(col("n_ref"), col("__tr"), col("__ntr")).as("n_ref"),
        scaled(col("n_cur"), col("__tc"), col("__ntc")).as("n_cur"),
        round(pRef, 6).as("p_ref"), round(pCur, 6).as("p_cur"),
        round((pCur - pRef) * log(pCur / pRef), 6).as("psi_term")): _*)
  }

  /** Distribution drift between a REFERENCE corpus and a CURRENT one —
    * the Population Stability Index over `nBins` equal-frequency bins cut
    * on the reference's own quantiles (the standard monitoring recipe:
    * bins are fixed by the baseline, so the metric moves only when the
    * data does). Returns one row per bin:
    * `bin | lo | hi | n_ref | n_cur | p_ref | p_cur | psi_term`, with
    * `bin = -1` collecting NULL values on both sides (null-rate drift is
    * drift), `lo/hi` the bin's cut bounds (null at the open ends), and
    * `psi_term = (p_cur − p_ref) · ln(p_cur / p_ref)` after clamping both
    * proportions to `eps` (the usual empty-bin guard). Total PSI =
    * `sum(psi_term)`; the common alert bands are 0.1 (watch) / 0.25
    * (act). Proportions and terms are rounded to 6 decimals — determinism
    * across engines beats the 7th decimal of a monitoring statistic.
    *
    * Scale shape: ONE aggregate on the reference for the cut vector
    * (exact `percentile`, or the KLL sketch when `approx = true` — the
    * petabyte path), collected as `nBins − 1` doubles (bounded, the
    * centroid-collect discipline); binning is a pure codegen'd
    * comparison chain (no HOF, no join); each side then pays one
    * ≤ nBins+1-row groupBy, and everything after is arithmetic on a
    * ≤ nBins+1-row frame. Two scans total, no shuffle wider than the bin
    * count. */
  def driftNumeric(
      ref: DataFrame,
      cur: DataFrame,
      valueCol: String,
      nBins: Int = 10,
      approx: Boolean = false,
      k: Int = 8192,
      eps: Double = 1e-6): DataFrame = {
    require(nBins >= 2, "need at least 2 bins")
    require(eps > 0, "eps must be positive")
    val probs = (1 until nBins).map(_.toDouble / nBins)
    val v = qcol(valueCol).cast("double")
    val refV = ref.select(v.as("__v")).where(col("__v").isNotNull)
    val cutRow =
      (if (approx)
         refV.agg(graft.functions.Kll.quantilesAgg(col("__v"), k, probs)
             .getField("value").as("__c"))
       else refV.agg(expr(
           s"percentile(__v, array(${probs.mkString(", ")}))").as("__c")))
        .collect()
    require(cutRow.nonEmpty && !cutRow.head.isNullAt(0),
      "reference has no non-null values to cut bins on")
    val cuts = cutRow.head.getSeq[Double](0).toArray
    // the sketch path renders an EMPTY reference as NaN quantiles (not a
    // null row) — catch it the same loud way, and never bin against NaN
    // (NaN orders largest in Spark: every row would silently land in bin 0)
    require(!cuts.exists(_.isNaN),
      "reference has no non-null values to cut bins on")
    def binOf(c: Column): Column =
      when(c.isNull, lit(-1)).otherwise(
        cuts.foldLeft(lit(0))((acc, cut) =>
          acc + when(c > lit(cut), 1).otherwise(0)))
    def binned(df: DataFrame, n: String): DataFrame =
      df.select(binOf(qcol(valueCol).cast("double")).as("bin"))
        .groupBy("bin").agg(count(lit(1)).as(n))
    val joined = binned(ref, "n_ref").join(binned(cur, "n_cur"),
        Seq("bin"), "full_outer")
      .na.fill(0L, Seq("n_ref", "n_cur"))
    val totals = joined.agg(sum("n_ref").as("__tr"), sum("n_cur").as("__tc"))
    val cutsLit = array(cuts.map(lit(_)): _*)
    val pRef = greatest(when(col("__tr") > 0, col("n_ref") / col("__tr")), lit(eps))
    val pCur = greatest(when(col("__tc") > 0, col("n_cur") / col("__tc")), lit(eps))
    joined.crossJoin(broadcast(totals))
      .select(col("bin"),
        when(col("bin") > 0, element_at(cutsLit, col("bin"))).as("lo"),
        when(col("bin").between(0, cuts.length - 1),
          element_at(cutsLit, col("bin") + 1)).as("hi"),
        col("n_ref"), col("n_cur"),
        round(pRef, 6).as("p_ref"), round(pCur, 6).as("p_cur"),
        round((pCur - pRef) * log(pCur / pRef), 6).as("psi_term"))
  }

  /** Feature standardization: appends `outCol` (default
    * `<valueCol>_std`) = `(v − center) / scale` per `keyCols` group
    * (globally when empty) — the scaling step before distance-based
    * math (embedding mixes, clustering, score fusion). `robust = true`
    * centers on the median and scales by `1.4826 × MAD` (the normal
    * consistency constant), so the tails being normalized cannot drag
    * the scale ([[robustStats]] trains it; `approx` selects its
    * one-pass sketch); the default centers on the mean and scales by
    * the sample stddev (one aggregate pass). A degenerate scale
    * (constant group, single row) yields null — never ±Infinity; nulls
    * stay null. One broadcastable stats join, the [[winsorize]] shape. */
  def standardize(
      df: DataFrame,
      valueCol: String,
      keyCols: Seq[String] = Nil,
      robust: Boolean = false,
      approx: Boolean = false,
      k: Int = 8192,
      outCol: String = "",
      broadcastStats: Boolean = true): DataFrame = {
    val out = if (outCol.nonEmpty) outCol else s"${valueCol}_std"
    require(!df.columns.contains(out),
      s"output column '$out' collides with input schema")
    val reserved = Seq("__v", "__c", "__s")
    require(!df.columns.exists(reserved.contains(_)),
      s"input columns may not use the reserved names ${reserved.mkString("/")}")
    val stats =
      if (robust)
        robustStats(df, valueCol, keyCols, approx, k, broadcastStats)
          .select(keyCols.map(col) :+ col("median").as("__c") :+
            (col("mad") * lit(1.4826)).as("__s"): _*)
      else {
        val withV = df
          .select(keyCols.map(qcol) :+
            qcol(valueCol).cast("double").as("__v"): _*)
          .where(col("__v").isNotNull)
        if (keyCols.isEmpty)
          withV.agg(avg("__v").as("__c"), stddev_samp(col("__v")).as("__s"))
        else withV.groupBy(keyCols.map(col): _*)
          .agg(avg("__v").as("__c"), stddev_samp(col("__v")).as("__s"))
      }
    val withV = df.withColumn("__v", qcol(valueCol).cast("double"))
    val joined =
      if (keyCols.isEmpty) withV.crossJoin(broadcast(stats))
      else withV.join(
        if (broadcastStats) broadcast(stats) else stats, keyCols, "left")
    joined
      .withColumn(out,
        when(col("__s") > 0, (col("__v") - col("__c")) / col("__s")))
      .drop("__v", "__c", "__s")
  }

  /** Join/groupBy skew diagnostic: the top-`kTop` heaviest keys with
    * their row share and the SALT FACTOR that would level them —
    * "which keys will melt this shuffle, and how many ways to split
    * them" answered in ONE Misra–Gries pass
    * ([[heavyHitters]] — no groupBy over the key universe). Output, by
    * descending weight: `key | count_min | count_max | frac | salt`
    * where `frac = count_max / n_rows` and `salt = ceil(count_max /
    * (n_rows / parallelism))` — the number of sub-keys needed so the
    * hottest key's share fits one average task at `parallelism`-way
    * shuffle (1 = no salting needed). Estimates are sketch envelopes:
    * EXACT while `capacity` >= distinct keys (the oracle regime);
    * past it `count_max` over-reports by at most `n/(capacity+1)` —
    * conservative in exactly the direction a salting decision wants.
    * Multi-column keys are unit-separator concatenated (the
    * [[graft.operators.Dedup]] composite-key discipline); null key
    * parts render as empty (they collide into one diagnostic row —
    * null-heavy keys ARE a skew class worth surfacing). */
  def skewReport(
      df: DataFrame,
      keyCols: Seq[String],
      kTop: Int = 20,
      capacity: Int = 100000,
      parallelism: Int = 200): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(parallelism > 0, "parallelism must be positive")
    val keyed = df.select(concat_ws("\u001f",
      keyCols.map(qcol(_).cast("string")): _*).as("__key"))
    val hh = keyed.agg(
      graft.functions.FreqItems
        .freqItemsAgg(col("__key"), lit(1L), capacity, kTop).as("__hh"),
      count(lit(1)).as("__n"))
    hh.select(inline(col("__hh")), col("__n"))
      .select(col("item").as("key"), col("count_min"), col("count_max"),
        round(col("count_max") / col("__n"), 6).as("frac"),
        greatest(lit(1L),
          ceil(col("count_max") * lit(parallelism) / col("__n")))
          .cast("long").as("salt"))
  }

  /** Per-group drift: [[driftNumeric]] with an independent PSI per key
    * (per-source / per-language / per-domain monitoring — corpus-level
    * PSI washes out a shift confined to one domain). Bins are each
    * key's OWN reference quantiles; output is one row per observed
    * `(key, bin)`: `keyCols | bin | lo | hi | n_ref | n_cur | p_ref |
    * p_cur | psi_term` (`bin = -1` collects nulls; per-key total PSI =
    * `sum(psi_term) GROUP BY keys`). Only keys present in the REFERENCE
    * are monitored (a brand-new key has no baseline to drift from —
    * catch key-mix shifts with [[driftCategorical]] on the key column);
    * null-key rows carry no series identity and are excluded, the
    * join-semantics contract everywhere else in the library.
    *
    * Scale shape: one cut aggregate per side of the join (the cut frame
    * is ONE row per key — broadcast under `broadcastStats`), binning is
    * a per-row `aggregate` HOF over that key's `nBins−1` cut array (the
    * cut vector is data, not a literal, so the comparison chain cannot
    * be unrolled driver-side without collecting an unbounded key set —
    * the HOF costs O(nBins) per row, nBins is small by construction),
    * then one `(keys × bins)`-grain groupBy per side and arithmetic on
    * the tiny result. `approx = true` cuts with the KLL sketch. */
  def driftNumericByKey(
      ref: DataFrame,
      cur: DataFrame,
      valueCol: String,
      keyCols: Seq[String],
      nBins: Int = 10,
      approx: Boolean = false,
      k: Int = 8192,
      eps: Double = 1e-6,
      broadcastStats: Boolean = true): DataFrame = {
    require(keyCols.nonEmpty,
      "keyCols must be non-empty - use driftNumeric for corpus-level PSI")
    require(nBins >= 2, "need at least 2 bins")
    require(eps > 0, "eps must be positive")
    val reserved = Seq("__v", "__cuts", "bin", "n_ref", "n_cur")
    require(!keyCols.exists(reserved.contains(_)),
      s"key columns may not use the reserved names ${reserved.mkString("/")}")
    val probs = (1 until nBins).map(_.toDouble / nBins)
    val refV = ref
      .select(keyCols.map(qcol) :+ qcol(valueCol).cast("double").as("__v"): _*)
      .where(keyCols.map(col(_).isNotNull).reduce(_ && _))
    val curV = cur
      .select(keyCols.map(qcol) :+ qcol(valueCol).cast("double").as("__v"): _*)
      .where(keyCols.map(col(_).isNotNull).reduce(_ && _))
    val cutsDf = refV.where(col("__v").isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg((if (approx)
          graft.functions.Kll.quantilesAgg(col("__v"), k, probs)
            .getField("value")
        else expr(s"percentile(__v, array(${probs.mkString(", ")}))"))
        .as("__cuts"))
    val cutsSide = if (broadcastStats) broadcast(cutsDf) else cutsDf
    def binned(in: DataFrame, n: String): DataFrame =
      in.join(cutsSide, keyCols)
        .withColumn("bin",
          when(col("__v").isNull, lit(-1)).otherwise(
            aggregate(col("__cuts"), lit(0),
              (acc, c) => acc + when(col("__v") > c, 1).otherwise(0))))
        .groupBy((keyCols.map(col) :+ col("bin")): _*)
        .agg(count(lit(1)).as(n))
    val joined = binned(refV, "n_ref")
      .join(binned(curV, "n_cur"), keyCols :+ "bin", "full_outer")
      .na.fill(0L, Seq("n_ref", "n_cur"))
    val totals = joined.groupBy(keyCols.map(col): _*)
      .agg(sum("n_ref").as("__tr"), sum("n_cur").as("__tc"))
    val totalsSide = if (broadcastStats) broadcast(totals) else totals
    val pRef = greatest(when(col("__tr") > 0, col("n_ref") / col("__tr")), lit(eps))
    val pCur = greatest(when(col("__tc") > 0, col("n_cur") / col("__tc")), lit(eps))
    joined.join(totalsSide, keyCols)
      .join(cutsSide, keyCols)
      .select(keyCols.map(col) ++ Seq(col("bin"),
        when(col("bin") > 0, element_at(col("__cuts"), col("bin"))).as("lo"),
        when(col("bin").between(0, nBins - 2),
          element_at(col("__cuts"), col("bin") + 1)).as("hi"),
        col("n_ref"), col("n_cur"),
        round(pRef, 6).as("p_ref"), round(pCur, 6).as("p_cur"),
        round((pCur - pRef) * log(pCur / pRef), 6).as("psi_term")): _*)
  }

  /** Sketch-native drift: the PSI of [[driftNumeric]] computed purely
    * from two persisted KLL epoch stores
    * ([[quantileSketchIncrementalBatch]]) — drift monitoring over a
    * stream WITHOUT rescanning any history. Cuts come from the
    * reference sketch's discrete quantiles; each side's bin masses come
    * from the sketch's rank walk (`fractionsAtOrBelow`); both stores
    * fold distributively into ONE bounded summary each (the
    * [[quantileSketchView]] re-merge discipline), and only those two
    * `k·log`-item summaries ever reach the driver.
    *
    * Output matches [[driftNumeric]] minus the null bin (sketches ingest
    * only non-null values): `bin | lo | hi | n_ref | n_cur | p_ref |
    * p_cur | psi_term`. EXACT — bit-equal to `driftNumeric(approx =
    * true)` over the same non-null rows (sketch cuts are DISCRETE
    * quantiles; the exact-percentile path interpolates), and
    * DuckDB-oracle-able via `quantile_disc` — while each store's total
    * row count stays <= `k`; in the estimating regime bins carry the
    * sketch rank envelope. `n_ref`/`n_cur` render against each store's
    * recorded TRUE totals (per-epoch `n_rows`, summed — survives the
    * epoch fold exactly), so the count columns are true-count-scaled in
    * ALL regimes; only epochs written before the `n_rows` column existed
    * fall back to survivor weight. An empty CURRENT store reads as
    * all-eps bins (maximal drift alert, not a crash); an empty reference
    * fails loudly — there is nothing to cut bins on. */
  def driftFromSketchStores(
      spark: org.apache.spark.sql.SparkSession,
      refStoreDir: String,
      curStoreDir: String,
      nBins: Int = 10,
      k: Int = 8192,
      eps: Double = 1e-6): DataFrame = {
    require(nBins >= 2, "need at least 2 bins")
    require(eps > 0, "eps must be positive")
    import spark.implicits._
    val (refSk, refW) = loadSketchAndCount(spark, refStoreDir, k)
    val (curSk, curW) = loadSketchAndCount(spark, curStoreDir, k)
    require(refW > 0, s"reference sketch store at $refStoreDir is empty " +
      "- nothing to cut bins on")
    val probs = (1 until nBins).map(_.toDouble / nBins)
    val cuts = refSk.quantiles(probs).map(_.value)
    def binProps(f: Seq[Double]): Seq[Double] = {
      val ext = 0.0 +: f :+ 1.0
      (0 until nBins).map(i => ext(i + 1) - ext(i))
    }
    val pR = binProps(refSk.fractionsAtOrBelow(cuts))
    val pC =
      if (curW == 0) Seq.fill(nBins)(0.0)
      else binProps(curSk.fractionsAtOrBelow(cuts))
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = (0 until nBins).map { b =>
      val pr = math.max(pR(b), eps)
      val pc = math.max(pC(b), eps)
      (b,
        if (b == 0) None else Some(cuts(b - 1)),
        if (b == nBins - 1) None else Some(cuts(b)),
        math.round(pR(b) * refW), math.round(pC(b) * curW),
        r6(pr), r6(pc), r6((pc - pr) * math.log(pc / pr)))
    }
    rows.toDF("bin", "lo", "hi", "n_ref", "n_cur",
      "p_ref", "p_cur", "psi_term")
  }

  /** Driver-side load of a KLL epoch store: the distributively re-merged
    * sketch (only `k·log` survivor items ever reach the driver) plus the
    * TRUE ingested total — recorded per-epoch counts where present
    * (survives the fold: the consolidated epoch carries their sum),
    * per-epoch survivor weight for pre-upgrade epochs. Shared by the
    * sketch-native monitors ([[driftFromSketchStores]],
    * [[ksFromSketchStores]]). */
  private def loadSketchAndCount(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      k: Int): (graft.functions.Kll.Sketch, Long) = {
    val stored = new graft.store.SnapshotTable(spark, s"$dir/items").read()
    val items = stored.getOrElse(spark.emptyDataFrame
      .select(lit(-1).as("level"), lit(Double.NaN).as("value")))
    val row = items.agg(graft.functions.Kll
      .remergeSketchAgg(col("level"), col("value"), k).as("__s"))
      .collect().head
    val st = row.getStruct(0)
    val sk = new graft.functions.Kll.Sketch(k)
    st.getSeq[org.apache.spark.sql.Row](0).foreach { it =>
      sk.addAtLevel(it.getInt(0), it.getDouble(1))
    }
    val n = stored.map { it =>
      val r = trueCountPerKey(it, Nil, "__n").collect().head
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }.getOrElse(0L)
    (sk, n)
  }

  private def r6d(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The two-sample Kolmogorov–Smirnov walk over two sketches: the
    * max |F_ref − F_cur| over the UNION of survivor values (two ECDF
    * step functions can only differ maximally at a point where one of
    * them steps, and every step point is a survivor), ties broken to
    * the smallest value. Exact when both sketches are in the exact
    * regime (survivors = the data); within ~2× the rank envelope past
    * it. */
  private def ksWalk(
      a: graft.functions.Kll.Sketch,
      b: graft.functions.Kll.Sketch): (Double, Double) = {
    // Array, not the Seq the summaries hand back: the walk indexes
    // positionally, and a List's apply is O(i) — the original spelling
    // was an O(n^2) driver walk that the sf0.1 bench measured at 45 s
    // on 150k exact-regime candidates (0.2 s as arrays).
    val cand: Array[Double] = (a.summary().items.map(_.value) ++
      b.summary().items.map(_.value)).distinct.sorted.toArray
    val fa = a.fractionsAtOrBelow(cand.toSeq).toArray
    val fb = b.fractionsAtOrBelow(cand.toSeq).toArray
    var best = 0.0
    var at = Double.NaN
    var i = 0
    while (i < cand.length) {
      val d = math.abs(fa(i) - fb(i))
      if (d > best) { best = d; at = cand(i) }
      i += 1
    }
    (best, at)
  }

  /** Two-sample Kolmogorov–Smirnov drift between two KLL epoch stores —
    * the CDF-shaped complement of the binned PSI
    * ([[driftFromSketchStores]]): PSI weighs re-distributed MASS, KS
    * catches the largest cumulative displacement (a pure location shift
    * that PSI's coarse bins dilute, KS reads directly). One row:
    * `ks_stat | at_value | n_ref | n_cur` — the statistic (rounded 6),
    * the value where the ECDFs diverge most (smallest such value on
    * ties), and the recorded true counts (the usual
    * `D > c(α)·sqrt((n1+n2)/(n1·n2))` test needs them). Both stores
    * fold distributively to one `k·log` summary each; only those reach
    * the driver. EXACT (and DuckDB-oracle-able against the ECDF walk)
    * while both stores are in the exact regime; within ~2× the rank
    * envelope past it. Empty stores fail loudly — there is no
    * distribution to compare. */
  def ksFromSketchStores(
      spark: org.apache.spark.sql.SparkSession,
      refStoreDir: String,
      curStoreDir: String,
      k: Int = 8192): DataFrame = {
    import spark.implicits._
    val (refSk, refN) = loadSketchAndCount(spark, refStoreDir, k)
    val (curSk, curN) = loadSketchAndCount(spark, curStoreDir, k)
    require(refN > 0, s"reference sketch store at $refStoreDir is empty")
    require(curN > 0, s"current sketch store at $curStoreDir is empty")
    val (stat, at) = ksWalk(refSk, curSk)
    Seq((r6d(stat), at, refN, curN))
      .toDF("ks_stat", "at_value", "n_ref", "n_cur")
  }

  /** Per-epoch drift timeline: the PSI of EACH registered epoch in the
    * current store against the pinned reference — "WHEN did it drift",
    * where [[driftFromSketchStores]] answers "has it drifted overall"
    * (a one-epoch regression that later epochs wash out of the global
    * number stands out in its own row). One row per epoch:
    * `batch_id | psi | n_cur` (true ingested count; the consolidated
    * [[FoldedEpochId]] epoch reports its folded aggregate as one row —
    * per-epoch attribution inside it was traded away by the fold,
    * by design). Fully relational: reference cuts + bin masses load
    * driver-side as ONE bounded summary (the [[ksFromSketchStores]]
    * discipline), the current store pays one codegen'd bin projection +
    * one `(epoch × bin)`-grain groupBy over its ≤ maxEpochs × k·log
    * item rows. EXACT per-epoch PSI (DuckDB-oracle-able) in the exact
    * regime; rank-envelope past it. */
  def driftEpochsFromSketchStores(
      spark: org.apache.spark.sql.SparkSession,
      refStoreDir: String,
      curStoreDir: String,
      nBins: Int = 10,
      k: Int = 8192,
      eps: Double = 1e-6): DataFrame = {
    require(nBins >= 2, "need at least 2 bins")
    require(eps > 0, "eps must be positive")
    val (refSk, refN) = loadSketchAndCount(spark, refStoreDir, k)
    require(refN > 0, s"reference sketch store at $refStoreDir is empty " +
      "- nothing to cut bins on")
    val probs = (1 until nBins).map(_.toDouble / nBins)
    val cuts = refSk.quantiles(probs).map(_.value)
    val pRs = {
      val fr = refSk.fractionsAtOrBelow(cuts)
      val ext = 0.0 +: fr :+ 1.0
      (0 until nBins).map(i => ext(i + 1) - ext(i))
    }
    val items = withNRows(
      new graft.store.SnapshotTable(spark, s"$curStoreDir/items").read()
        .getOrElse(throw new IllegalArgumentException(
          s"no sketch store at $curStoreDir")))
    val binOf = cuts.foldLeft(lit(0))((acc, cut) =>
      acc + when(col("value") > lit(cut), 1).otherwise(0))
    val wExpr = expr("shiftleft(CAST(1 AS BIGINT), level)")
    val binned = items.withColumn("bin", binOf).withColumn("__w", wExpr)
      .groupBy("batch_id", "bin").agg(sum("__w").as("__wb"))
    val totals = items.groupBy("batch_id")
      .agg(first("n_rows").as("__n"), sum(wExpr).as("__wt"))
    val spine = totals.select(col("batch_id"), col("__n"), col("__wt"),
      explode(sequence(lit(0), lit(nBins - 1))).as("bin"))
    val pRLit = array(pRs.map(lit(_)): _*)
    val pc = greatest(col("__wb") / col("__wt"), lit(eps))
    val pr = greatest(element_at(pRLit, col("bin") + 1), lit(eps))
    spine.join(binned, Seq("batch_id", "bin"), "left")
      .na.fill(0L, Seq("__wb"))
      .withColumn("__term", (pc - pr) * log(pc / pr))
      .groupBy("batch_id")
      .agg(round(sum("__term"), 6).as("psi"),
        first(coalesce(col("__n"), col("__wt"))).as("n_cur"))
  }

  /** Operational description of an epoch store (any member of the
    * family — pass the data table name): real epoch count, whether a
    * consolidated fold segment exists, total stored rows, and the fold
    * watermark (−1 = never folded). Diagnostics/ops surface; one bounded
    * scan of the store. */
  def sketchStoreStats(
      spark: org.apache.spark.sql.SparkSession,
      storeDir: String,
      table: String = "items"): DataFrame = {
    import spark.implicits._
    val rows = new graft.store.SnapshotTable(spark, s"$storeDir/$table")
      .read()
    val (nEpochs, hasFolded, nRows) = rows match {
      case None => (0L, false, 0L)
      case Some(df) =>
        val eps = df.select("batch_id").distinct().collect()
          .map(_.getString(0))
        (eps.count(_ != FoldedEpochId).toLong,
          eps.contains(FoldedEpochId), df.count())
    }
    Seq((nEpochs, hasFolded, nRows, foldWatermark(spark, storeDir)))
      .toDF("n_epochs", "has_folded", "n_rows", "fold_watermark")
  }

  /** Batch two-sample KS directly from two frames: each side collapses
    * to ONE `k`-bounded sketch aggregate (map-side combined, no global
    * sort, no window — the exact distributed KS would need a full-order
    * cumulative sum), then the driver walks two bounded summaries.
    * Exact whenever both sides hold <= `k` non-null rows; the petabyte
    * path drops `k` and accepts the rank envelope. Nulls are ignored on
    * both sides (a null has no rank). */
  def ksNumeric(
      ref: DataFrame,
      cur: DataFrame,
      valueCol: String,
      k: Int = 65536): DataFrame = {
    def sketchOf(df: DataFrame): (graft.functions.Kll.Sketch, Long) = {
      val st = df.agg(graft.functions.Kll
        .sketchAgg(qcol(valueCol), k).as("__s"))
        .collect().head.getStruct(0)
      val sk = new graft.functions.Kll.Sketch(k)
      st.getSeq[org.apache.spark.sql.Row](0).foreach { it =>
        sk.addAtLevel(it.getInt(0), it.getDouble(1))
      }
      (sk, st.getLong(1))
    }
    val (refSk, refN) = sketchOf(ref)
    val (curSk, curN) = sketchOf(cur)
    require(refN > 0, "reference frame has no non-null values")
    require(curN > 0, "current frame has no non-null values")
    val (stat, at) = ksWalk(refSk, curSk)
    import ref.sparkSession.implicits._
    Seq((r6d(stat), at, refN, curN))
      .toDF("ks_stat", "at_value", "n_ref", "n_cur")
  }

  /** Incremental deterministic reservoir sample: maintain the `k`-row
    * (optionally weighted) sample of EVERYTHING ingested so far across
    * epochs — the sampling member of the mergeable store family (MG
    * counts / KLL quantiles / HLL cardinality / A-ES sample). Each row
    * draws the SAME deterministic priority as
    * [[graft.operators.Sampling.weightedSample]] (Efraimidis–Spirakis:
    * `u^(1/w)` from the row's md5-hash uniform; `w = 1` uniform), so
    * "top-k by priority" is associative — the sample-so-far of a union
    * is the top-k of the per-epoch top-ks, which is exactly what the
    * store keeps. Per epoch only the batch's own top-`k` rows persist
    * (`id | priority | payloadCols… | batch_id`, epoch-keyed
    * `appendReplacing`: replays replace, folded epochs drop); aged
    * epochs consolidate to their combined top-`k` ([[foldSketchStore]]
    * discipline), so the store holds O(maxEpochs × k) rows for the life
    * of the stream. Semantics: a sample of OBSERVATIONS — an id
    * re-ingested in a LATER epoch can appear twice (append-only id
    * streams, the dominant case, are unaffected; redelivery of the same
    * epoch is still exactly-once). Weights must be strictly positive
    * (enforced in-plan, the [[graft.operators.Sampling.weightedSample]]
    * contract). */
  def sampleReservoirIncrementalBatch(
      batch: DataFrame,
      idCol: String,
      payloadCols: Seq[String],
      storeDir: String,
      k: Int,
      batchId: Long,
      weightCol: Option[String] = None,
      maxEpochs: Int = 64): Unit = {
    require(k > 0, "k must be positive")
    val reserved = Seq("id", "priority", "batch_id")
    require(!payloadCols.exists(reserved.contains(_)),
      s"payload columns may not use the reserved names ${reserved.mkString("/")}")
    val spark = batch.sparkSession
    if (batchId <= foldWatermark(spark, storeDir)) return
    Stores.register(spark, storeDir, "reservoir", Nil, Some(k))
    val bid = batchId.toString
    val u = (conv(graft.operators.Sampling.sampleKey(qcol(idCol)), 16, 10)
      .cast("long") + lit(1L)).cast("double") / lit(4294967296.0)
    val priority = weightCol match {
      case None => u
      case Some(wc) =>
        val w = qcol(wc).cast("double")
        when(w > 0, pow(u, lit(1.0) / w)).otherwise(raise_error(
          concat(lit(s"sampleReservoirIncrementalBatch: weight '$wc' " +
            "must be strictly positive, got "),
            coalesce(w.cast("string"), lit("null")))))
    }
    val top = batch
      .select(qcol(idCol).as("id") +: priority.as("priority") +:
        payloadCols.map(qcol): _*)
      .where(col("id").isNotNull)
      .orderBy(col("priority").desc, col("id"))
      .limit(k)
      .withColumn("batch_id", lit(bid))
    new graft.store.SnapshotTable(spark, s"$storeDir/rows")
      .appendReplacing(top, "batch_id", Seq(bid))
    if (shouldCheckFold(batchId, maxEpochs))
      foldReservoirStore(spark, storeDir, k, maxEpochs)
  }

  /** The merged sample-so-far of a [[sampleReservoirIncrementalBatch]]
    * store: global top-`k` by (priority desc, id asc) over at most
    * maxEpochs × k persisted rows — one bounded TakeOrdered, no full
    * sort. Columns: `id | priority | payloadCols…`. */
  def sampleReservoirView(
      spark: org.apache.spark.sql.SparkSession,
      storeDir: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val rows = new graft.store.SnapshotTable(spark, s"$storeDir/rows")
      .read().getOrElse(spark.emptyDataFrame.select(
        lit(null).cast("string").as("id"),
        lit(null).cast("double").as("priority"),
        lit("").as("batch_id")))
    rows.orderBy(col("priority").desc, col("id")).limit(k)
      .drop("batch_id")
  }

  /** Bound a reservoir store: aged epochs consolidate to their COMBINED
    * top-`k` under the sentinel epoch — "top-k of union = top-k of
    * top-ks" is exactly the associativity the priorities were designed
    * for, so the view is unchanged by the fold in every regime. */
  private[graft] def foldReservoirStore(
      spark: org.apache.spark.sql.SparkSession,
      storeDir: String,
      k: Int,
      maxEpochs: Int): Unit = {
    val table = new graft.store.SnapshotTable(spark, s"$storeDir/rows")
    table.read().foreach { rows =>
      val foldIds = foldableEpochs(rows, maxEpochs)
      if (foldIds.nonEmpty) {
        val foldKeys = foldIds.map(_.toString) :+ FoldedEpochId
        val old = rows.where(col("batch_id").isin(foldKeys: _*))
        val kept = rows.where(!col("batch_id").isin(foldKeys: _*))
        val merged = old.orderBy(col("priority").desc, col("id")).limit(k)
          .withColumn("batch_id", lit(FoldedEpochId))
        advanceFoldWatermark(spark, storeDir, foldIds)
        table.overwrite(kept.unionByName(merged))
      }
    }
  }

  /** Pairwise Pearson correlations of numeric columns in ONE aggregate
    * pass: `col_a | col_b | corr | n` for every unordered pair, with
    * `n` the pair's co-non-null row count (what the correlation was
    * actually computed over — silent null-overlap shrinkage is a
    * classic profile trap) and `corr` rounded to 6 decimals (engine
    * determinism over the 7th decimal of a profile statistic; null for
    * degenerate pairs — constant columns have no correlation). The
    * whole matrix is one map-side-combined aggregate + a driver-free
    * `inline` transpose, the [[table]] shape — no per-pair jobs. */
  def correlations(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    require(cols.distinct.size == cols.size, s"duplicate columns in $cols")
    val pairs = cols.combinations(2).map(p => (p(0), p(1))).toSeq
    val aggs = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      val (ca, cb) = (qcol(a).cast("double"), qcol(b).cast("double"))
      // covar/stddev over the CO-non-null rows, guarded: Spark 4's own
      // `corr` divides 0/0 on a zero-variance column and ANSI mode
      // turns that into a runtime error instead of the null it should be
      val sa = stddev_samp(when(cb.isNotNull, ca))
      val sb = stddev_samp(when(ca.isNotNull, cb))
      Seq(round(when(sa > 0 && sb > 0,
          covar_samp(ca, cb) / (sa * sb)), 6).as(s"__c_$i"),
        count(when(ca.isNotNull && cb.isNotNull, 1)).as(s"__n_$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = array(pairs.zipWithIndex.map { case ((a, b), i) =>
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        col(s"__c_$i").as("corr"), col(s"__n_$i").as("n"))
    }: _*)
    one.select(inline(rows))
  }

  /** Chi-square test of homogeneity between a reference and a current
    * categorical column — the HYPOTHESIS-TEST complement of
    * [[driftCategorical]]'s PSI (PSI sizes the shift; chi-square prices
    * it against sampling noise). One row: `chi2 | dof | n_ref | n_cur`
    * where `chi2 = Σ_cells (obs − exp)² / exp` over the 2×C contingency
    * table (expected under homogeneity: row total × column total /
    * grand), `dof = C − 1`, both rounded/exact as shown. Zero-total
    * categories cannot occur (a category only exists by being observed);
    * null is a category (null-rate shifts count). Shape: one groupBy
    * per side, a null-safe full-outer join on the ≤C-row frame,
    * arithmetic, one final 1-row aggregate. */
  def chiSquareCategorical(
      ref: DataFrame,
      cur: DataFrame,
      colName: String): DataFrame = {
    def counted(df: DataFrame, n: String): DataFrame =
      df.select(qcol(colName).cast("string").as(s"__cat_$n"))
        .groupBy(s"__cat_$n").agg(count(lit(1)).as(n))
    val joined = counted(ref, "n_ref").join(counted(cur, "n_cur"),
        col("__cat_n_ref") <=> col("__cat_n_cur"), "full_outer")
      .select(coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val totals = joined.agg(sum("n_ref").as("__tr"), sum("n_cur").as("__tc"),
      count(lit(1)).as("__cats"))
    def term(obs0: Column, rowTotal: Column): Column = {
      // double arithmetic from the first multiply: long x long products
      // overflow at petabyte row counts
      val obs = obs0.cast("double")
      val exp = rowTotal.cast("double") *
        ((col("n_ref") + col("n_cur")).cast("double") /
          (col("__tr") + col("__tc")).cast("double"))
      (obs - exp) * (obs - exp) / exp
    }
    joined.crossJoin(broadcast(totals))
      .agg(
        round(sum(term(col("n_ref"), col("__tr")) +
          term(col("n_cur"), col("__tc"))), 6).as("chi2"),
        (first(col("__cats")) - 1L).cast("long").as("dof"),
        first(col("__tr")).as("n_ref"), first(col("__tc")).as("n_cur"))
  }

  /** Association strength between two categorical columns in ONE
    * contingency pass: `n | chi2 | dof | cramers_v | mi | nmi` — the
    * "is source correlated with label / lang / quality bucket?"
    * question asked before trusting a mixture weight or a stratified
    * split. `cramers_v` is chi-square normalized to [0,1] (0 =
    * independent, 1 = one column determines the other); `mi` is mutual
    * information in nats over the observed joint; `nmi` normalizes by
    * `sqrt(H(a)·H(b))` (0 when either marginal is constant). Nulls are
    * ordinary categories (a missing value can carry association).
    *
    * Scale shape: one map-side-combined `groupBy(a, b)` count over the
    * two pruned columns; everything after runs on the contingency frame
    * (≤ distinct-pair rows) — marginals by re-aggregation, absent cells
    * NEVER generated (their chi-square mass enters via the closed form
    * `Σ_absent e = n − Σ_present e`, and they contribute 0 to MI).
    * Double arithmetic from the first multiply — long×long marginal
    * products overflow at petabyte row counts. */
  def association(df: DataFrame, colA: String, colB: String): DataFrame = {
    require(colA != colB, "association of a column with itself is 1")
    val joint = df
      .select(qcol(colA).cast("string").as("__a"),
        qcol(colB).cast("string").as("__b"))
      .groupBy("__a", "__b").agg(count(lit(1)).as("__c"))
    val ra = joint.groupBy("__a").agg(sum("__c").as("__ra"))
      .withColumnRenamed("__a", "__a2")
    val cb = joint.groupBy("__b").agg(sum("__c").as("__cb"))
      .withColumnRenamed("__b", "__b2")
    val tot = joint.agg(sum("__c").as("__n"),
      countDistinct(coalesce(col("__a"), lit("\u0000"))).as("__r"),
      countDistinct(coalesce(col("__b"), lit("\u0000"))).as("__k"))
    val cells = joint
      .join(ra, col("__a") <=> col("__a2")).drop("__a2")
      .join(cb, col("__b") <=> col("__b2")).drop("__b2")
      .crossJoin(broadcast(tot))
    val n = col("__n").cast("double")
    val o = col("__c").cast("double")
    val e = col("__ra").cast("double") * col("__cb").cast("double") / n
    val pab = o / n
    val pa = col("__ra").cast("double") / n
    val pb = col("__cb").cast("double") / n
    cells.agg(
        first(col("__n")).as("n"),
        // present cells + the absent-cell closed form
        (sum((o - e) * (o - e) / e) +
          (first(n) - sum(e))).as("__chi2"),
        ((first(col("__r")) - 1) * (first(col("__k")) - 1)).cast("long")
          .as("dof"),
        sum(pab * log(pab / (pa * pb))).as("__mi"),
        (-sum(pab * log(pa)) * -sum(pab * log(pb))).as("__hahb"),
        first(col("__r")).as("__r"), first(col("__k")).as("__k"))
      .select(col("n"), round(col("__chi2"), 6).as("chi2"), col("dof"),
        round(when(col("dof") === 0, 0.0).otherwise(
          sqrt(col("__chi2") / (col("n") *
            least(col("__r") - 1, col("__k") - 1)))), 6).as("cramers_v"),
        round(greatest(col("__mi"), lit(0.0)), 6).as("mi"),
        round(when(col("__hahb") <= 0, 0.0)
          .otherwise(greatest(col("__mi"), lit(0.0)) /
            sqrt(col("__hahb"))), 6).as("nmi"))
  }

  /** Per-feature mutual information against one label for MANY features
    * in ONE job: `feature | mi | nmi | n` — the feature-selection sweep
    * ("which metadata columns actually predict quality/label?") that
    * would otherwise cost one [[association]] pass per column. Rows are
    * melted to `(feature, value, label)` triples by a codegen'd
    * explode (k× the rows, each a 3-tuple — NOT k× the table width),
    * one `groupBy(feature, value, label)` count shuffles them all
    * together, and every marginal re-aggregates the contingency frame.
    * Nulls are categories on both sides ([[association]] semantics);
    * `nmi` normalizes by `sqrt(H(value)·H(label))` per feature. */
  def informationGain(
      df: DataFrame,
      featureCols: Seq[String],
      labelCol: String): DataFrame = {
    require(featureCols.nonEmpty, "at least one feature column")
    require(!featureCols.contains(labelCol),
      "the label is not a feature of itself")
    val melted = df.select(
        explode(array(featureCols.map(f =>
          struct(lit(f).as("__f"),
            qcol(f).cast("string").as("__v"))): _*)).as("__fv"),
        qcol(labelCol).cast("string").as("__l"))
      .select(col("__fv.__f").as("__f"), col("__fv.__v").as("__v"),
        col("__l"))
    val joint = melted.groupBy("__f", "__v", "__l")
      .agg(count(lit(1)).as("__c"))
    val rv = joint.groupBy("__f", "__v").agg(sum("__c").as("__rv"))
      .withColumnRenamed("__f", "__f1").withColumnRenamed("__v", "__v1")
    val rl = joint.groupBy("__f", "__l").agg(sum("__c").as("__rl"))
      .withColumnRenamed("__f", "__f2").withColumnRenamed("__l", "__l2")
    val tot = joint.groupBy("__f").agg(sum("__c").as("__n"))
      .withColumnRenamed("__f", "__f3")
    val cells = joint
      .join(rv, col("__f") === col("__f1") && col("__v") <=> col("__v1"))
      .join(rl, col("__f") === col("__f2") && col("__l") <=> col("__l2"))
      .join(tot, col("__f") === col("__f3"))
    val n = col("__n").cast("double")
    val pab = col("__c").cast("double") / n
    val pv = col("__rv").cast("double") / n
    val pl = col("__rl").cast("double") / n
    cells.groupBy(col("__f").as("feature"))
      .agg(
        sum(pab * log(pab / (pv * pl))).as("__mi"),
        (-sum(pab * log(pv)) * -sum(pab * log(pl))).as("__hvhl"),
        first(col("__n")).as("n"))
      .select(col("feature"),
        round(greatest(col("__mi"), lit(0.0)), 6).as("mi"),
        round(when(col("__hvhl") <= 0, 0.0)
          .otherwise(greatest(col("__mi"), lit(0.0)) /
            sqrt(col("__hvhl"))), 6).as("nmi"),
        col("n"))
  }

  /** Per-key [[overlapEstimate]]: one overlap row PER GROUP —
    * "per-language (or per-domain) containment of crawl B in crawl A",
    * the slice-grain merge audit. Keys present on one side only report
    * zero counts for the other. Null keys are exempt (the keyed-join
    * contract shared by the keyed store family); null values never
    * overlap. Exact path: per-key distinct collapses + one semi join.
    * Sketch path: one HLL sketch per key per side, a full-outer join of
    * the two per-key sketch frames (≤ one row per key each), and
    * inclusion-exclusion per key — no data-grain join at any scale. */
  def overlapEstimateByKey(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      exact: Boolean = false,
      lgK: Int = 12): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty - use overlapEstimate")
    require(!keyCols.contains(valueCol),
      "the value column may not also be a key")
    val reservedOut = Seq("n_left", "n_right", "n_common", "n_union",
      "jaccard", "containment_left", "containment_right")
    require(!keyCols.exists(reservedOut.contains(_)),
      "key columns may not use the reserved output names " +
        reservedOut.mkString("/"))
    def r6(c: Column): Column = round(c, 6)
    def keyed(df: DataFrame): DataFrame = df
      .where(keyCols.map(qcol(_).isNotNull).reduce(_ && _) &&
        qcol(valueCol).isNotNull)
    val k1 = keyCols.map(c => s"__k1_$c")
    val k2 = keyCols.map(c => s"__k2_$c")
    val withCounts =
      if (exact) {
        val da = keyed(left)
          .select((keyCols.map(qcol) :+ qcol(valueCol).as("__v")): _*)
          .distinct()
        val db = keyed(right)
          .select((keyCols.zip(k2).map { case (c, a) => qcol(c).as(a) } :+
            qcol(valueCol).as("__v2")): _*)
          .distinct()
        val na = da.groupBy(keyCols.map(qcol): _*)
          .agg(count(lit(1)).as("n_left"))
        val nb = db.groupBy(k2.map(col): _*)
          .agg(count(lit(1)).as("n_right"))
        val ni = da.join(db,
            keyCols.zip(k2).map { case (c, a) => qcol(c) === col(a) }
              .reduce(_ && _) && col("__v") === col("__v2"),
            "left_semi")
          .groupBy(keyCols.map(qcol): _*)
          .agg(count(lit(1)).as("n_common"))
          .withColumnsRenamed(keyCols.zip(k1).toMap)
        na.join(nb,
            keyCols.zip(k2).map { case (c, a) => qcol(c) <=> col(a) }
              .reduce(_ && _), "full_outer")
          .select((keyCols.zip(k2).map { case (c, a) =>
            coalesce(qcol(c), col(a)).as(c) } ++
            Seq(coalesce(col("n_left"), lit(0L)).as("n_left"),
              coalesce(col("n_right"), lit(0L)).as("n_right"))): _*)
          .join(ni,
            keyCols.zip(k1).map { case (c, a) => qcol(c) === col(a) }
              .reduce(_ && _), "left")
          .select((keyCols.map(qcol) ++ Seq(col("n_left"), col("n_right"),
            coalesce(col("n_common"), lit(0L)).as("n_common"))): _*)
      } else {
        val sa = keyed(left).groupBy(keyCols.map(qcol): _*)
          .agg(hll_sketch_agg(qcol(valueCol), lit(lgK)).as("__sa"))
        val sb = keyed(right)
          .groupBy(keyCols.zip(k2).map { case (c, a) => qcol(c).as(a) }: _*)
          .agg(hll_sketch_agg(qcol(valueCol), lit(lgK)).as("__sb"))
        sa.join(sb,
            keyCols.zip(k2).map { case (c, a) => qcol(c) <=> col(a) }
              .reduce(_ && _), "full_outer")
          .select((keyCols.zip(k2).map { case (c, a) =>
            coalesce(qcol(c), col(a)).as(c) } ++ Seq(
            coalesce(hll_sketch_estimate(col("__sa")), lit(0L))
              .as("n_left"),
            coalesce(hll_sketch_estimate(col("__sb")), lit(0L))
              .as("n_right"),
            coalesce(
              hll_sketch_estimate(hll_union(col("__sa"), col("__sb"),
                allowDifferentLgConfigK = true)),
              hll_sketch_estimate(col("__sa")),
              hll_sketch_estimate(col("__sb")),
              lit(0L)).as("__nu"))): _*)
          .select((keyCols.map(qcol) ++ Seq(col("n_left"), col("n_right"),
            // same clamp as the global sketch path: n_common can never
            // exceed the smaller side
            least(least(col("n_left"), col("n_right")),
              greatest(lit(0L),
                col("n_left") + col("n_right") - col("__nu")))
              .as("n_common"))): _*)
      }
    withCounts.select((keyCols.map(qcol) ++ Seq(
        col("n_left"), col("n_right"), col("n_common"),
        (col("n_left") + col("n_right") - col("n_common"))
          .as("n_union"))): _*)
      .select(col("*"),
        r6(when(col("n_union") === 0, 0.0)
          .otherwise(col("n_common").cast("double") / col("n_union")))
          .as("jaccard"),
        r6(when(col("n_left") === 0, 0.0)
          .otherwise(col("n_common").cast("double") / col("n_left")))
          .as("containment_left"),
        r6(when(col("n_right") === 0, 0.0)
          .otherwise(col("n_common").cast("double") / col("n_right")))
          .as("containment_right"))
  }

  /** Categorical drift: the PSI of [[driftNumeric]] with categories as
    * the bins — one row per category seen on EITHER side (`category`
    * rendered as string, null kept as its own row):
    * `category | n_ref | n_cur | p_ref | p_cur | psi_term`. A category
    * present on one side only is clamped to `eps` on the other (new or
    * vanished categories contribute large, finite terms — exactly the
    * signal wanted). One groupBy per side, a null-safe full-outer join on
    * a one-row-per-category frame, then arithmetic. */
  def driftCategorical(
      ref: DataFrame,
      cur: DataFrame,
      colName: String,
      eps: Double = 1e-6): DataFrame = {
    require(eps > 0, "eps must be positive")
    def counted(df: DataFrame, n: String): DataFrame =
      df.select(qcol(colName).cast("string").as(s"__cat_$n"))
        .groupBy(s"__cat_$n").agg(count(lit(1)).as(n))
    val r = counted(ref, "n_ref")
    val c = counted(cur, "n_cur")
    val joined = r.join(c,
        col("__cat_n_ref") <=> col("__cat_n_cur"), "full_outer")
      .select(coalesce(col("__cat_n_ref"), col("__cat_n_cur")).as("category"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val totals = joined.agg(sum("n_ref").as("__tr"), sum("n_cur").as("__tc"))
    val pRef = greatest(when(col("__tr") > 0, col("n_ref") / col("__tr")), lit(eps))
    val pCur = greatest(when(col("__tc") > 0, col("n_cur") / col("__tc")), lit(eps))
    joined.crossJoin(broadcast(totals))
      .select(col("category"), col("n_ref"), col("n_cur"),
        round(pRef, 6).as("p_ref"), round(pCur, 6).as("p_cur"),
        round((pCur - pRef) * log(pCur / pRef), 6).as("psi_term"))
  }

  /** Spearman rank correlation between two numeric columns — the
    * monotone-agreement complement of [[correlations]]' Pearson: "does
    * my new quality score ORDER documents the way the old one did"
    * survives any monotone rescaling, which is exactly what model swaps
    * do to scores. Ties get average ranks (the standard definition);
    * rows with a null on either side are ignored. One row:
    * `n | spearman` (rounded 6).
    *
    * Scale shape (the [[ModelEval.aucRoc]] discipline): ranks are
    * assigned per DISTINCT VALUE — one groupBy per column, a running
    * prefix over the value alphabet (window over alphabet-grain rows,
    * never the corpus), joined back by value — so nothing corpus-grain
    * is ever sorted. The final ρ comes from exact rank sums (average
    * ranks are half-integers, exact in doubles to 2^51 rows): Σr_a,
    * Σr_b, Σr_a², Σr_b², Σr_a·r_b in one aggregate, then the closed
    * Pearson-on-ranks formula — bit-replicable by any engine that
    * computes the same sums. Quantize continuous columns first
    * (`round(x, 6)`) to bound the alphabet. */
  def spearman(df: DataFrame, colA: String, colB: String): DataFrame = {
    val base = df.select(qcol(colA).cast("double").as("__a"),
        qcol(colB).cast("double").as("__b"))
      .where(col("__a").isNotNull && col("__b").isNotNull)
    def avgRanks(c: String): DataFrame = {
      val byVal = base.groupBy(col(c).as("__v"))
        .agg(count(lit(1)).as("__c"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("__v"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      byVal
        .withColumn("__cum", sum(col("__c")).over(w))
        .select(col("__v").as(c),
          (col("__cum") - col("__c") +
            (col("__c") + lit(1L)).cast("double") / lit(2.0))
            .as(s"__r$c"))
    }
    val ranked = base
      .join(avgRanks("__a"), Seq("__a"))
      .join(avgRanks("__b"), Seq("__b"))
    ranked.agg(
        count(lit(1)).as("n"),
        sum(col("__r__a")).as("__sa"),
        sum(col("__r__b")).as("__sb"),
        sum(col("__r__a") * col("__r__a")).as("__saa"),
        sum(col("__r__b") * col("__r__b")).as("__sbb"),
        sum(col("__r__a") * col("__r__b")).as("__sab"))
      .select(col("n"),
        round(try_divide(
          col("n") * col("__sab") - col("__sa") * col("__sb"),
          sqrt(col("n") * col("__saa") - col("__sa") * col("__sa")) *
            sqrt(col("n") * col("__sbb") - col("__sb") * col("__sb"))), 6)
          .as("spearman"))
  }

  /** Statistical-process-control chart over a monitor timeline — the
    * alarm layer the drift family feeds: [[driftEpochsFromSketchStores]]
    * and the quality ledger say what each epoch LOOKS like; this says
    * when the series has gone out of control. Two standard detectors per
    * point (Montgomery, *Statistical Quality Control*): the EWMA chart
    * (`z_i = α·x_i + (1−α)·z_{i−1}`, seeded at the series mean, alarm
    * when the smoothed value leaves `μ ± L·σ_z(i)` with the usual
    * startup-corrected `σ_z(i) = σ·sqrt(α/(2−α)·(1−(1−α)^{2i}))`) for
    * slow drifts, and the tabular CUSUM (`c⁺_i = max(0, c⁺_{i−1} +
    * z-score_i − slack)`, mirrored low side, alarm past `h`) for
    * accumulated small shifts. Center and scale are self-baselined from
    * the whole series per key (μ, population σ); a zero-σ series never
    * alarms.
    *
    * Output, per input point: `keyCols… | orderCol | value | ewma |
    * ewma_lcl | ewma_ucl | ewma_alarm | cusum_hi | cusum_lo |
    * cusum_alarm` (floats rounded 6).
    *
    * Scale shape: ONE sort-shuffle on the key brings each series
    * together; μ/σ are unordered window aggregates over the same
    * partition (no self-join), the CUSUM recurrences are EXACT closed
    * forms over running sums (`c⁺_i = P_i − min(0, min_{j≤i} P_j)` with
    * `P` the prefix sum of slacked z-scores), and the EWMA recurrence is
    * the rebased closed form `z_i = (1−α)^i·(μ + α·Σ_j x_j·(1−α)^{−j})`
    * — all window functions, no collect, ANSI-replicable (the oracle
    * recomputes the EWMA via an independent recursive CTE). The rebase
    * term `(1−α)^{−i}` overflows a double once `i·−ln(1−α)` nears 709,
    * so series length is guarded in-plan at the α-dependent cap
    * `min(maxPoints, ⌊650/−ln(1−α)⌋)` (α=0.2 → the default 2000 stands;
    * α=0.5 → the cap tightens to ~937 — well before the Inf/NaN region)
    * — monitor timelines are fold-bounded (≤ maxEpochs per store) long
    * before either. Duplicate `(key, order)` points are refused
    * in-plan too: the recurrences need a well-defined total order.
    * Nulls in the value column have no place on a chart and are refused
    * with the duplicates (drop or impute upstream, explicitly).
    * Ref parity note: no reference equivalent; completes the
    * drift-monitoring tier (detection → attribution → ALARM). */
  def controlChart(
      df: DataFrame,
      valueCol: String,
      orderCol: String,
      keyCols: Seq[String] = Seq.empty,
      alpha: Double = 0.2,
      ewmaL: Double = 3.0,
      cusumSlack: Double = 0.5,
      cusumH: Double = 5.0,
      maxPoints: Int = 2000): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    require(ewmaL > 0, "ewmaL must be positive")
    require(cusumSlack >= 0, "cusumSlack must be non-negative")
    require(cusumH > 0, "cusumH must be positive")
    require(maxPoints > 0, "maxPoints must be positive")
    // the rebase factor (1-alpha)^(-i) overflows a double once
    // i * -ln(1-alpha) nears ln(Double.MaxValue) ~ 709.78; 650 leaves
    // headroom for |x| up to ~e^59, so the effective series cap must
    // shrink with alpha (alpha=0.5 caps near 937, not the default 2000)
    val effCap =
      if (alpha == 1.0) maxPoints // degenerates to the raw series, no rebase
      else math.min(maxPoints.toLong,
        math.max(1L, math.floor(650.0 / -math.log1p(-alpha)).toLong)).toInt
    val reserved = Seq("ewma", "ewma_lcl", "ewma_ucl", "ewma_alarm",
      "cusum_hi", "cusum_lo", "cusum_alarm")
    require(!(keyCols :+ valueCol :+ orderCol).exists(reserved.contains),
      s"input columns may not be named any of: ${reserved.mkString(", ")}")
    val keys = keyCols.map(qcol)
    val x = qcol(valueCol).cast("double")

    val wKey = org.apache.spark.sql.expressions.Window.partitionBy(keys: _*)
    val wOrd = wKey.orderBy(qcol(orderCol))

    val mu = avg(x).over(wKey)
    val sigma = stddev_pop(x).over(wKey)
    val n = count(lit(1)).over(wKey)
    val i = row_number().over(wOrd).cast("double")
    // in-plan guards: they ride the same window pass, stay lazy, and
    // fail loudly on the executor instead of silently mis-charting
    val dupes = count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(
        (keys :+ qcol(orderCol)): _*))
    val guard = when(x.isNull, raise_error(lit(
        s"controlChart: null in value column '$valueCol' - drop or " +
          "impute upstream")))
      .when(dupes > 1, raise_error(lit(
        s"controlChart: duplicate (key, $orderCol) point - the " +
          "recurrences need a well-defined total order")))
      .when(n > effCap, raise_error(lit(
        s"controlChart: series longer than $effCap points (maxPoints=" +
          s"$maxPoints, numeric-stability cap for alpha=$alpha) - fold " +
          "the store, shorten the series, or lower alpha")))
      .otherwise(lit(null).cast("string"))

    val base = df.select((keys :+ qcol(orderCol).as("__ord") :+ x.as("__x")
      :+ mu.as("__mu") :+ sigma.as("__sig") :+ i.as("__i")
      :+ guard.as("__guard")): _*)

    val oneMa = lit(1.0 - alpha)
    // EWMA closed form, rebased per point; alpha == 1 degenerates to the
    // raw series (pow(0, -j) would be Inf, so special-case it)
    val ewma =
      if (alpha == 1.0) col("__x")
      else pow(oneMa, col("__i")) * (col("__mu") +
        lit(alpha) * sum(col("__x") / pow(oneMa, col("__i"))).over(
          org.apache.spark.sql.expressions.Window.partitionBy(keys: _*)
            .orderBy(col("__ord")).rowsBetween(
              org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    val sigZ = col("__sig") * sqrt(lit(alpha / (2.0 - alpha)) *
      (lit(1.0) - pow(oneMa * oneMa, col("__i"))))
    // standardized score; a zero-sigma series is flat by definition
    val z = when(col("__sig") > 0, (col("__x") - col("__mu")) / col("__sig"))
      .otherwise(lit(0.0))

    val wRun = org.apache.spark.sql.expressions.Window
      .partitionBy(keys: _*).orderBy(col("__ord")).rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val stepped = base
      .withColumn("__ewma", ewma)
      .withColumn("__sigz", sigZ)
      // prefix sums of the slacked z-scores; the CUSUM recurrence is the
      // exact identity c_i = P_i - min(0, min_{j<=i} P_j) over them
      .withColumn("__phisum", sum(z - lit(cusumSlack)).over(wRun))
      .withColumn("__plosum", sum(-z - lit(cusumSlack)).over(wRun))
      .withColumn("__chi",
        col("__phisum") - least(min(col("__phisum")).over(wRun), lit(0.0)))
      .withColumn("__clo",
        col("__plosum") - least(min(col("__plosum")).over(wRun), lit(0.0)))

    stepped
      .select((keys
        :+ col("__ord").as(orderCol)
        :+ col("__x").as(valueCol)
        // __guard is always null (non-null paths raise); referencing it
        // here keeps the in-plan checks from being pruned away
        :+ when(col("__guard").isNull, round(col("__ewma"), 6)).as("ewma")
        :+ round(col("__mu") - lit(ewmaL) * col("__sigz"), 6).as("ewma_lcl")
        :+ round(col("__mu") + lit(ewmaL) * col("__sigz"), 6).as("ewma_ucl")
        :+ (col("__sig") > 0 && abs(col("__ewma") - col("__mu")) >
          lit(ewmaL) * col("__sigz")).as("ewma_alarm")
        :+ round(col("__chi"), 6).as("cusum_hi")
        :+ round(col("__clo"), 6).as("cusum_lo")
        :+ (col("__chi") > lit(cusumH) ||
          col("__clo") > lit(cusumH)).as("cusum_alarm")): _*)
  }
}
