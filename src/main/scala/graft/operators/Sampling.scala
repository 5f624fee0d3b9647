package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling + context-window packing for training-data
  * pipelines.
  *
  * Every operator here is HASH-deterministic (no RNG, no seed state): the
  * same row always lands in the same sample/chunk, across runs, partitions
  * and engines — which makes samples reproducible, incremental re-runs
  * consistent, and every result exactly replicable in a SQL oracle. The
  * sampling key is the leading 8 hex chars of md5(id) compared against a
  * hex threshold — lexicographic compare on lowercase hex, identical in any
  * engine with md5.
  */
object Sampling {

  /** `floor(fraction * 16^8)` as an 8-hex-digit lower-case threshold. */
  private def hexThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0,1]")
    f"${math.min((fraction * 4294967296.0).toLong, 4294967295L)}%08x"
  }

  /** The per-row sampling key: first 8 hex chars of md5 of the id rendered
    * as a string. */
  def sampleKey(idCol: Column): Column =
    substring(md5(idCol.cast("string")), 1, 8)

  /** Deterministic ~`fraction` sample: a row is kept iff its hash key falls
    * under the threshold. Pure filter — pushes into the scan, no shuffle,
    * no driver state; rerunning (or running on a different partitioning)
    * selects the SAME rows. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.where(sampleKey(col(idCol)) < lit(hexThreshold(fraction)))

  /** Per-stratum deterministic rates (e.g. lang -> fraction): strata not in
    * `rates` default to `defaultFraction`. Thresholds fold into one CASE
    * expression — still a pure pushdown-friendly filter. */
  def stratifiedHashSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      rates: Map[String, Double],
      defaultFraction: Double = 0.0): DataFrame = {
    val threshold = rates.foldLeft(lit(hexThreshold(defaultFraction))) {
      case (acc, (stratum, frac)) =>
        when(col(strataCol) === lit(stratum), lit(hexThreshold(frac))).otherwise(acc)
    }
    df.where(sampleKey(col(idCol)) < threshold)
  }

  /** Deterministic multi-way split (train/val/test): `fractions(i)` of rows
    * get `split_id = i`, assigned by the row's hash position — the same row
    * lands in the same split on every run, partitioning, and engine, and
    * growing the corpus never moves an existing row between splits. Rows
    * past `sum(fractions)` get a null split_id (held out). */
  def hashSplit(df: DataFrame, idCol: String, fractions: Seq[Double]): DataFrame =
    df.withColumn("split_id", splitAssign(col(idCol), fractions))

  /** Group-integrity multi-way split: like [[hashSplit]] but assignment
    * hashes `groupCol`, so every row of a group lands in the SAME split —
    * the leak-proof way to split a near-dup corpus (split on the
    * [[Dedup.duplicateClusters]] cluster id and no duplicate pair ever
    * straddles train/test; same trick for "all pages of a domain
    * co-travel"). Fractions are honored in expectation over GROUPS, so
    * realized row fractions track group-size mixture. Pure per-row
    * expression — no join against a group table, no shuffle. */
  def splitByGroup(df: DataFrame, groupCol: String, fractions: Seq[Double]): DataFrame =
    df.withColumn("split_id", splitAssign(col(groupCol), fractions))

  private def splitAssign(keySrc: Column, fractions: Seq[Double]): Column = {
    require(fractions.nonEmpty && fractions.forall(_ >= 0) && fractions.sum <= 1.0 + 1e-9,
      "fractions must be non-negative and sum to at most 1")
    val cum = fractions.scanLeft(0.0)(_ + _).tail
    val key = sampleKey(keySrc)
    cum.zipWithIndex.reverse.foldLeft(lit(null).cast("int")) {
      case (acc, (c, i)) =>
        // when the cumulative fraction reaches 1.0 the split must be TOTAL:
        // a strict `< 'ffffffff'` would silently hold out the ~1-in-2^32
        // rows whose hash prefix is exactly the max (r3 advice)
        val pred = if (c >= 1.0 - 1e-12) lit(true)
          else key < lit(hexThreshold(c))
        when(pred, lit(i)).otherwise(acc)
    }
  }

  /** Deterministic weighted sample WITHOUT replacement, k rows, inclusion
    * odds ∝ `weightCol` (Efraimidis–Spirakis A-ES: each row draws a
    * deterministic uniform u from its id hash and competes on
    * `u^(1/weight)`; the k largest keys win). Hash-determinism per the
    * module contract: the uniform is `(hash_int + 1) / 2^32` from the same
    * md5 prefix every other sampler here uses, so the winner SET is stable
    * across runs, partitionings, and engines, and exactly replicable in
    * SQL (`pow((CAST(concat('0x', substring(md5(id),1,8)) AS BIGINT)+1)
    * / 4294967296, 1.0/w)`). Weights must be strictly positive.
    *
    * 100 TB shape: key computation is a per-row codegen'd expression in
    * the scan; selection is one `TakeOrdered` (per-partition top-k, then
    * a k-row merge on the driver) — no full sort, no shuffle of the
    * corpus. k is bounded by driver memory (millions, not billions);
    * for larger draws use [[hashSample]] rates or shard first. */
  def weightedSample(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val u = (conv(sampleKey(col(idCol)), 16, 10).cast("long") + lit(1L))
      .cast("double") / lit(4294967296.0)
    // enforce the contract in-plan: a zero weight divides by zero and a
    // negative one flips the A-ES ordering (u^(1/w), w<0 inverts
    // preference) — fail loudly instead of silently mis-sampling (r6 advice)
    val w = col(weightCol).cast("double")
    val key = when(w > 0, pow(u, lit(1.0) / w)).otherwise(raise_error(
      concat(lit(s"weightedSample: weight '$weightCol' must be strictly " +
        "positive, got "), coalesce(w.cast("string"), lit("null")))))
    df.withColumn("__wkey", key)
      .orderBy(col("__wkey").desc, col(idCol))
      .limit(k)
      .drop("__wkey")
  }

  /** Keep the `k` best rows per group by `scoreCol` (descending), ties
    * broken by `tiebreakCol` ascending — "best 100 docs per language"
    * style curation.
    *
    * Default shape is ONE window: correct at any scale, and the cheapest
    * plan while no single group dwarfs a task. For skewed groups (one
    * language holding half a 100 TB corpus), pass `saltBuckets > 1` for
    * two-level top-k: rows salt into `saltBuckets` subgroups by the
    * tiebreak hash, each (group, salt) cell keeps its local top k in
    * parallel, and the final ranking runs over at most `saltBuckets * k`
    * survivors per group. Any global top-k row is necessarily in its
    * cell's top k, so (with a unique (score, tiebreak) per group — e.g. a
    * doc-id tiebreak) the result is EXACTLY the single-window formulation;
    * only the execution shape changes. Salting is opt-in rather than
    * always-on because the extra hash+window pass costs more than it saves
    * on unskewed groups (r4 measured +80% on the bench shape, r4 advice). */
  def topKPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      scoreCol: String,
      k: Int,
      tiebreakCol: String,
      saltBuckets: Int = 1): DataFrame = {
    require(k > 0, "k must be positive")
    require(saltBuckets > 0, "saltBuckets must be positive")
    val pruned =
      if (saltBuckets == 1) df
      else {
        val salted = df.withColumn("__salt",
          pmod(xxhash64(col(tiebreakCol)), lit(saltBuckets.toLong)))
        val w1 = Window
          .partitionBy((groupCols.map(col) :+ col("__salt")): _*)
          .orderBy(col(scoreCol).desc, col(tiebreakCol))
        salted.withColumn("__rk1", row_number().over(w1))
          .where(col("__rk1") <= k)
          .drop("__rk1", "__salt")
      }
    val w2 = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(scoreCol).desc, col(tiebreakCol))
    pruned.withColumn("__rk", row_number().over(w2))
      .where(col("__rk") <= k)
      .drop("__rk")
  }

  /** Downsample a multi-source corpus to TARGET token proportions — the
    * data-mixture step before training (e.g. web 50% / code 30% / books
    * 20%). Computes per-source token totals (ONE aggregate; the collect is
    * bounded by the number of sources), derives the largest achievable
    * mixture where every source's sampling rate stays ≤ 1 —
    * `total = min_s(tokens_s / weight_s)`, `rate_s = weight_s · total /
    * tokens_s` (the limiting source keeps everything) — and applies the
    * same deterministic hash filter as [[hashSample]] per source, folded
    * into one CASE expression: a pure pushdown-friendly filter, stable
    * under reruns and repartitioning. Sources not in `weights` are
    * dropped. Proportions are expectations over the doc-hash sample
    * (exact-fraction-of-tokens selection would need a global
    * order-dependent walk); the law of large numbers does the rest at
    * corpus scale. */
  def mixCorpora(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      tokenCol: Column,
      weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(weights.values.forall(_ > 0.0), "weights must be positive")
    val totals = sourceTokenTotals(df, sourceCol, tokenCol,
      weights.keys.toSeq.sorted)
    applyMixture(df, sourceCol, idCol, totals, weights)
  }

  /** Temperature-scaled corpus mixing (alpha sampling, the multilingual
    * balancing rule published with XLM-R and mC4): target proportions are
    * the NATURAL token proportions raised to `alpha` and renormalized —
    * `alpha = 1` keeps the corpus as-is, `alpha = 0` asks for uniform
    * shares, values in between (0.3 is the published mC4 default, 0.7
    * XLM-R's) lift low-resource sources without letting the head sources
    * drown them. Downsample-only, like [[mixCorpora]]: the mixture is the
    * largest one where every source's sampling rate stays ≤ 1, so the
    * most-lifted (lowest-resource) source keeps everything and the head
    * sources shed mass. To UPsample the tail instead, feed the target
    * weights this derives into [[repeatByWeight]].
    *
    * Determinism across engines: the only non-arithmetic step is
    * `pow(p, alpha)`, whose last ulp may differ between libm
    * implementations — the derived weight is rounded to 9 decimals
    * (HALF_UP, matching SQL `round`) before the exact threshold
    * arithmetic, so a DuckDB oracle replays the chain bit-for-bit.
    * Same execution shape as [[mixCorpora]]: one bounded aggregate, then
    * a pushdown-friendly deterministic hash filter. */
  def mixCorporaTemperature(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      tokenCol: Column,
      sources: Seq[String],
      alpha: Double): DataFrame = {
    require(sources.nonEmpty, "sources must be non-empty")
    require(alpha >= 0.0 && alpha <= 1.0, "alpha must be in [0,1]")
    val totals = sourceTokenTotals(df, sourceCol, tokenCol, sources.sorted)
    val grand = totals.values.sum.toDouble
    val weights = totals.map { case (s, tok) =>
      s -> BigDecimal(math.pow(tok.toDouble / grand, alpha))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    applyMixture(df, sourceCol, idCol, totals, weights)
  }

  /** One bounded aggregate: per-source token totals (collect size = number
    * of sources). Fails loudly on empty sources — a zero-token source has
    * no achievable rate. */
  private def sourceTokenTotals(
      df: DataFrame,
      sourceCol: String,
      tokenCol: Column,
      sources: Seq[String]): Map[String, Long] = {
    val totals = df.where(col(sourceCol).isin(sources: _*))
      .groupBy(col(sourceCol).as("__src"))
      .agg(sum(tokenCol).cast("long").as("__tok"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val missing = sources.filterNot(s => totals.getOrElse(s, 0L) > 0L)
    require(missing.isEmpty,
      s"sources with no tokens cannot be mixed: ${missing.mkString(", ")}")
    totals
  }

  /** Shared mixture application: largest mixture with every rate ≤ 1 —
    * `total = min_s(tokens_s / weight_s)`, `rate_s = weight_s · total /
    * tokens_s` (the limiting source keeps everything) — applied as the
    * [[hashSample]] deterministic hex-threshold filter folded into one
    * CASE expression: pushdown-friendly, rerun/repartition-stable.
    * Sources outside `weights` are dropped. */
  private def applyMixture(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      totals: Map[String, Long],
      weights: Map[String, Double]): DataFrame = {
    val sources = weights.keys.toSeq.sorted
    val total = sources.map(s => totals(s).toDouble / weights(s)).min
    // the limiting source's rate is 1 up to rounding: w·(tokens/w)/tokens
    // can land one ulp above 1.0, so clamp (oracle replicates via least())
    val thresholds = sources.map { s =>
      s -> hexThreshold(
        math.min(weights(s) * total / totals(s).toDouble, 1.0))
    }
    val thresholdExpr = thresholds.foldLeft(lit("00000000")) {
      case (e, (s, t)) => when(col(sourceCol) === lit(s), lit(t)).otherwise(e)
    }
    df.where(col(sourceCol).isin(sources: _*) &&
      sampleKey(col(idCol)) < thresholdExpr)
  }

  /** Cap every group at `maxN` rows, chosen DETERMINISTICALLY: survivors
    * are the rows with the `maxN` smallest [[sampleKey]] hashes (ties by
    * `idCol`) within their group — a seeded-looking but reproducible
    * pseudo-random pick, the standard per-domain balancing step for web
    * corpora (no domain may contribute more than N pages). Unlike a
    * fractional sample, the cap is exact per group and leaves small groups
    * untouched.
    *
    * Scale shape: the same two-level salted top-k as [[topKPerGroup]] —
    * with `saltBuckets > 1` a mega-group (one domain with millions of
    * pages) first ranks within (group, salt) buckets so no single task
    * ever sorts more than its bucket, then the ≤ saltBuckets×maxN
    * survivors re-rank exactly. */
  def capPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      maxN: Int,
      idCol: String,
      saltBuckets: Int = 1): DataFrame = {
    require(maxN > 0, "maxN must be positive")
    require(saltBuckets > 0, "saltBuckets must be positive")
    val key = sampleKey(col(idCol))
    val pruned =
      if (saltBuckets == 1) df
      else {
        val salted = df.withColumn("__salt",
          pmod(xxhash64(col(idCol)), lit(saltBuckets.toLong)))
        val w1 = Window
          .partitionBy((groupCols.map(col) :+ col("__salt")): _*)
          .orderBy(key, col(idCol))
        salted.withColumn("__rk1", row_number().over(w1))
          .where(col("__rk1") <= maxN)
          .drop("__rk1", "__salt")
      }
    val w2 = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(key, col(idCol))
    pruned.withColumn("__rk", row_number().over(w2))
      .where(col("__rk") <= maxN)
      .drop("__rk")
  }

  /** Pack rows into chunks of at most ~`budget` tokens, walking rows in
    * `idCol` order: `chunk_id = floor(exclusive_prefix_sum(tokens) /
    * budget)` — a row straddling a boundary starts the next chunk's count
    * but stays in the chunk its prefix put it in (fixed, engine-replicable
    * semantics).
    *
    * Scale shape: [[exclusivePrefixSum]]'s distributed prefix sum — no
    * global single-task cumsum ever runs. */
  def packByTokenBudget(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      budget: Long,
      numPartitions: Int = 0): DataFrame = {
    require(budget > 0, "budget must be positive")
    exclusivePrefixSum(df, Seq(col(idCol)), col(tokenCol), numPartitions)
      .withColumn("chunk_id", floor(col("__cum") / lit(budget)))
      .drop("__cum")
  }

  /** Packing-efficiency report over a [[packByTokenBudget]] result (or
    * any chunked frame): ONE row — `n_chunks | n_rows | total_tokens |
    * mean_fill | overflow_frac`, where mean_fill is
    * `total_tokens / (n_chunks · budget)` (the fraction of the training
    * window actually filled; `1 − mean_fill` is pad waste) and
    * overflow_frac the fraction of chunks whose token sum exceeds the
    * budget (straddle rows — the rows a sequence-packer truncates or
    * spills). Ratios round to 6. Two bounded aggregates (chunk grain,
    * then one row); the audit that decides whether the packing order /
    * budget is worth re-tuning before a multi-day tokenization run. */
  def packingStats(
      packed: DataFrame,
      chunkCol: String,
      tokenCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    packed.groupBy(col(chunkCol))
      .agg(count(lit(1)).as("__rows"), sum(col(tokenCol)).as("__toks"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("__rows")).as("n_rows"),
        sum(col("__toks")).as("total_tokens"),
        sum(when(col("__toks") > budget, 1L).otherwise(0L)).as("__over"))
      .select(col("n_chunks"), col("n_rows"), col("total_tokens"),
        round(try_divide(col("total_tokens").cast("double"),
          col("n_chunks").cast("double") * budget), 6).as("mean_fill"),
        round(try_divide(col("__over").cast("double"), col("n_chunks")), 6)
          .as("overflow_frac"))
  }

  /** Exclusive distributed prefix sum of `valueCol` under the TOTAL order
    * given by `orderCols` (which must be a unique ordering — include an id
    * tiebreaker), as a `__cum` column.
    *
    * Scale shape: a naive `Window.orderBy(...)` global cumsum runs on ONE
    * task. This is the classic distributed prefix sum instead: range-
    * repartition on the order, per-partition local cumsum (window WITHIN
    * each partition), tiny per-partition totals prefix-scanned on the
    * driver and broadcast back as offsets. Every stage is parallel; the
    * driver holds one number per partition. */
  private[graft] def exclusivePrefixSum(
      df: DataFrame,
      orderCols: Seq[Column],
      valueCol: Column,
      numPartitions: Int): DataFrame = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // localCheckpoint PINS the range-partition assignment. Without it the
    // two consumers below (the per-partition totals job and the final plan)
    // each re-execute the range exchange, and RangePartitioner re-SAMPLES
    // its boundaries per execution (per-RDD seeds) — a boundary that lands
    // a few rows differently between the passes mis-applies the offsets
    // and silently corrupts the prefix near partition edges (caught by the
    // sf0.1 oracle: one boundary doc under-counted a whole chunk). The
    // cost is one materialization of the rows being summed (blocks spill
    // to disk); on a cluster a lost executor fails the job loudly instead
    // of recomputing inconsistently.
    val parted = df.repartitionByRange(n, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    // local EXCLUSIVE prefix sum within each range partition
    val w = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = parted.withColumn("__local",
      coalesce(sum(valueCol).over(w), lit(0L)))
    // per-partition totals -> driver prefix scan -> broadcast offsets.
    // Range partitioning orders partitions by the order columns, so
    // offset(p) = sum of totals of partitions before p.
    val totals = local.groupBy("__pid").agg(sum(valueCol).as("__total"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsetByPid = {
      var acc = 0L
      totals.map { case (pid, tot) => val o = (pid, acc); acc += tot; o }.toMap
    }
    val offsetExpr = offsetByPid.foldLeft(lit(0L)) { case (e, (pid, off)) =>
      when(col("__pid") === lit(pid), lit(off)).otherwise(e)
    }
    local
      .withColumn("__cum", col("__local") + offsetExpr)
      .drop("__pid", "__local")
  }

  /** Curriculum ordering: band rows by score quantile (band 1 = lowest
    * scores, `bands` = highest) and give each row a deterministic
    * within-band shuffle key — the easy-to-hard (or clean-to-noisy)
    * corpus ordering curriculum-training recipes ask for, with the
    * intra-band order decorrelated from ingest order. Appends
    * `curriculum_band` (int; NULL score -> null band — order those
    * explicitly or filter upstream) and `curriculum_key` (md5 of
    * `seed#id` — re-keying with a new seed reshuffles within bands
    * without re-banding). Materialize the order with
    * `.repartitionByRange(n, col("curriculum_band"),
    * col("curriculum_key")).sortWithinPartitions(...)` — contiguous
    * band-ordered files, no global single-task sort.
    *
    * Scale shape: one bounded quantile aggregate for the band cuts
    * ([[Profile.quantileBuckets]]; `exact = false` sketches them on
    * petabyte columns) + a pure codegen'd projection for band and key.
    * Engine-replicable end to end (percentile_cont cuts + md5 keys). */
  def curriculumOrder(
      df: DataFrame,
      idCol: String,
      scoreCol: String,
      bands: Int = 4,
      exact: Boolean = true,
      accuracy: Int = 10000,
      seed: Long = 1L): DataFrame = {
    require(bands >= 2, "need at least 2 bands")
    val banded = Profile.quantileBuckets(df, scoreCol,
      probs = (1 until bands).map(_.toDouble / bands),
      labels = (1 to bands).map(_.toString),
      bucketCol = "curriculum_band", exact = exact, accuracy = accuracy)
    banded
      .withColumn("curriculum_band",
        when(col(scoreCol).isNull, lit(null).cast("int"))
          .otherwise(col("curriculum_band").cast("int")))
      .withColumn("curriculum_key",
        md5(concat(lit(s"$seed#"), col(idCol).cast("string"))))
  }

  /** Quality-ordered corpus cut: keep the BEST rows (by `scoreCol`
    * descending, nulls last, `idCol` tiebreak) until their running token
    * total reaches `budget` — the "take the top 1T tokens" step of corpus
    * construction. A row is kept iff the tokens of all strictly-better
    * rows sum below the budget, so the cut includes the one row that
    * crosses it (the budget is a floor, reached exactly or overshot by at
    * most one document). Deterministic and engine-replicable: the
    * (score desc nulls last, id) order is total, and the same exclusive
    * prefix-sum semantics as [[packByTokenBudget]] decide membership.
    *
    * Scale shape: [[exclusivePrefixSum]]'s distributed prefix sum over the
    * score order — range-repartition + per-partition cumsum + one number
    * per partition on the driver; no global single-task sort, no top-k
    * heap bounded by driver memory (the survivor set stays distributed,
    * unlike a TakeOrdered cut). */
  def takeByTokenBudget(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      scoreCol: String,
      budget: Long,
      numPartitions: Int = 0): DataFrame = {
    require(budget > 0, "budget must be positive")
    exclusivePrefixSum(df,
      Seq(col(scoreCol).desc_nulls_last, col(idCol)), col(tokenCol),
      numPartitions)
      .where(col("__cum") < lit(budget))
      .drop("__cum")
  }

  /** Assemble [[packByTokenBudget]]'s chunks into actual training
    * SEQUENCES: one row per chunk — `chunk_id`, the member texts joined in
    * id order with `sep` (EOS marker), `n_docs`, and the summed token
    * count. The packing step decides WHO shares a context window; this
    * materializes the window itself.
    *
    * Scale shape: one shuffle keyed by chunk_id; each chunk's payload is
    * bounded by the token budget by construction (a chunk holds at most
    * `budget` tokens' worth of text, +1 doc of spill), so the per-group
    * sort+join is bounded no matter the corpus size. Deterministic: member
    * order is the same (id asc) order the prefix sum packed by. */
  def assembleChunks(
      packed: DataFrame,
      idCol: String,
      textCol: String,
      tokenCol: String,
      chunkCol: String = "chunk_id",
      sep: String = "\n",
      withBoundaries: Boolean = false): DataFrame = {
    val members = array_sort(collect_list(struct(col(idCol), col(textCol))))
    val baseAggs = Seq(
      array_join(transform(members, x => x(textCol)), sep).as("sequence"),
      count(lit(1)).as("n_docs"),
      sum(col(tokenCol)).as("n_tokens"))
    if (!withBoundaries)
      packed.groupBy(col(chunkCol)).agg(baseAggs.head, baseAggs.tail: _*)
    else {
      // `doc_starts` = 0-based CHARACTER offset of each member doc inside
      // `sequence` (member order = the id order the texts joined in),
      // rendered as a comma-joined string — the loss-mask / attention-
      // reset boundaries a training loader needs. Offsets come from a
      // per-chunk running sum of (len + sepLen) over the SAME partitioning
      // the assembly groups by, so the window's exchange is reused.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(chunkCol)).orderBy(col(idCol))
      val start = coalesce(
        sum(length(col(textCol)).cast("long") + lit(sep.length.toLong))
          .over(w.rowsBetween(Long.MinValue, -1)), lit(0L))
      val starts = array_join(transform(
        array_sort(collect_list(struct(col(idCol), col("__start")))),
        x => x("__start").cast("string")), ",").as("doc_starts")
      packed.withColumn("__start", start)
        .groupBy(col(chunkCol))
        .agg(baseAggs.head, baseAggs.tail :+ starts: _*)
    }
  }

  /** Mixture re-weighting by fractional epoch count: each row is emitted
    * `floor(weight)` times, plus one more with probability `frac(weight)`
    * — decided by the row's hash, not an RNG, so `weight = 2.3` means every
    * run (and every engine) replicates the SAME deterministic 30% of rows
    * a third time. Weights below 1 downsample (`0.3` keeps the same fixed
    * 30%); rows that draw zero copies disappear. This is the standard
    * domain-mixture knob (e.g. upsample a high-quality source to 2 epochs,
    * downsample a crawl to 0.5) applied in one pass. Output carries
    * `copyCol` (1-based copy index) so downstream shuffles can spread
    * copies apart.
    *
    * Scale shape: pure per-row `explode(sequence)` — no shuffle, no
    * driver state; output size is `sum(weights)` by construction. The
    * hash draw uses a salted key (`id + "#rep"`) so it is independent of
    * [[hashSample]]'s draw on the same ids. */
  def repeatByWeight(
      df: DataFrame,
      idCol: String,
      weight: Column,
      copyCol: String = "copy_ix"): DataFrame = {
    val base = floor(weight).cast("long")
    val fracThreshold = lower(lpad(
      hex(floor((weight - floor(weight)) * 4294967296.0).cast("long")),
      8, "0"))
    val drawKey = substring(
      md5(concat(col(idCol).cast("string"), lit("#rep"))), 1, 8)
    val n = base + when(drawKey < fracThreshold, 1L).otherwise(0L)
    // sequence(1, 0) DESCENDS — zero-copy rows need an explicit empty array
    df.withColumn(copyCol,
      explode(when(n >= 1, sequence(lit(1L), n))
        .otherwise(array().cast("array<long>"))))
  }

  /** Deterministic shard + position assignment — the "global shuffle then
    * split into N files" step that precedes training-data serialization,
    * without a global sort. Rows land in `pmod(shard key, nShards)` and
    * receive a dense 1-based `shard_pos` ordered by the row's hash key
    * (pseudo-random but reproducible order — the shuffle), ties broken by
    * id. Default shard key is the row's md5-derived [[sampleKey]] prefix
    * rendered through `conv`; pass `shardBy` to shard on something else
    * (e.g. `pmod(col("id"), n)` for engine-portable assignment).
    *
    * Scale shape: one shuffle on the shard key + one per-shard sort (the
    * window) — each shard is a single sort task, so pick `nShards` at
    * least the cluster's parallelism (for training output files that is
    * the natural choice anyway). No global single-task sort ever runs. */
  def shardAssign(
      df: DataFrame,
      idCol: String,
      nShards: Int,
      shardBy: Option[Column] = None,
      shardCol: String = "shard_ix",
      posCol: String = "shard_pos"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val key = sampleKey(col(idCol))
    val shard = shardBy.getOrElse(
      pmod(conv(key, 16, 10).cast("long"), lit(nShards.toLong)))
    val w = Window.partitionBy(col(shardCol)).orderBy(key, col(idCol))
    df.withColumn(shardCol, shard)
      .withColumn(posCol, row_number().over(w).cast("long"))
  }

  /** Seeded, deterministic corpus shuffle — the loader-facing "globally
    * shuffle the packed sequences, then write N shard files" step that
    * runs after [[packByTokenBudget]]/[[assembleChunks]], with a seed so
    * each training EPOCH gets an independent permutation of the same
    * corpus (vary only the seed; epoch number is the natural choice).
    *
    * Each row draws the key `md5(seed || '#' || id)` and lands in shard
    * `key mod nShards` at the dense 1-based position of its key within
    * the shard (ties broken by id). Stability contract:
    *
    *  - '''Run-stable''': the permutation is a pure function of
    *    `(seed, id)` — identical across runs, partitionings, and engines
    *    (the module's md5 contract; replicable verbatim in SQL).
    *  - '''Growth-stable''': appending rows NEVER moves an existing row
    *    to a different shard and never reorders two existing rows —
    *    shard and relative order depend only on the row's own key. Dense
    *    positions shift only by the number of new rows hashed ahead.
    *  - '''Seed-independent''': permutations under different seeds are
    *    unrelated (md5 avalanche), so epoch reshuffles don't correlate.
    *
    * Scale shape: one shuffle on the shard key + one per-shard sort;
    * each shard sorts in a single task, so pick `nShards` at least the
    * cluster parallelism — for training output files that is the natural
    * choice anyway. No global single-task sort ever runs. */
  def corpusShuffle(
      df: DataFrame,
      idCol: String,
      nShards: Int,
      seed: Long,
      shardCol: String = "shard_ix",
      posCol: String = "shard_pos"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val key = substring(
      md5(concat(lit(seed.toString), lit("#"), col(idCol).cast("string"))),
      1, 8)
    val shard = pmod(conv(key, 16, 10).cast("long"), lit(nShards.toLong))
    val w = Window.partitionBy(col(shardCol)).orderBy(key, col(idCol))
    df.withColumn(shardCol, shard)
      .withColumn(posCol, row_number().over(w).cast("long"))
  }
}
