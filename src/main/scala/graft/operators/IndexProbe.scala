package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftConf
import graft.functions.Blooms
import graft.model.{IndexDef, IndexMetadata}
import graft.store.IndexStore

/** File-location probes: given queried values (literal list or a distributed
  * probe DataFrame) per indexed column, return the set of files that can
  * possibly contain matching rows.
  *
  * Design deltas vs the reference (SURVEY §7.1 — 100 TB posture):
  *  - candidate sets stay DataFrames of filenames end-to-end; AND-semantics
  *    across queried columns is an inner join on filename, collected ONCE at
  *    the very end (vs per-probe CSV-staging round trips,
  *    reference: IndexQueryOperations.scala:305-365)
  *  - bloom probes run as executor-side UDF filters over the index table
  *    (vs collecting every file's filter bytes to the driver,
  *    reference: BloomFilterOperations.scala:255-287)
  *  - DataFrame probes only collect bounded value lists (capped by
  *    `spark.graft.probeValueLimit`); past the cap, that column degrades to
  *    no pruning — correct, just less selective, and never driver-OOM.
  */
object IndexProbe {

  /** A probe for one column: either literal values or a 1-column DataFrame
    * of probe values (column name irrelevant; first column is used). */
  sealed trait Probe
  final case class Values(values: Seq[Any]) extends Probe
  final case class Frame(df: DataFrame) extends Probe

  /** DataFrame of distinct candidate `filename`s for the probes, honoring
    * AND semantics across columns (reference: IndexQueryOperations.scala:188-287). */
  def candidateFiles(
      store: IndexStore,
      meta: IndexMetadata,
      probes: Map[String, Probe]): DataFrame = {
    val spark = store.spark
    val indexDfOpt = store.indexTable.read()
    val indexed = probes.flatMap { case (c, p) => meta.indexFor(c).map(_ -> p) }.toSeq
    require(indexed.nonEmpty, "at least one probed column must be indexed")
    indexDfOpt match {
      case None => emptyFilenames(spark)
      case Some(indexDf) =>
        // Latest-file winnowing for a temporal column is sound ONLY when it
        // is the sole probed column: the row-level dedup then computes each
        // value's winner over rows filtered by nothing else, and that winner
        // provably lives in the value's latest file. With ANY second probed
        // column (another filter, or a second temporal config), the
        // filtered winner for a value can live in an OLDER file — its
        // globally-latest row may fail the other filter — so temporal
        // columns fall back to key-CONTAINMENT pruning (every file holding
        // the value), which keeps the complete filtered row set readable.
        // Mirrors the SQL catalog's r4 temporal-safety guard on the
        // programmatic path.
        val latestFileOk = indexed.size == 1
        val scores =
          if (indexed.size > 1 && GraftConf.probeOrderingEnabled(spark))
            hllProbeScores(store, indexed)
          else Map.empty[String, Double]
        if (scores.isEmpty) {
          lastProbeTrace = None
          indexed
            .map { case (ix, probe) =>
              candidatesForColumn(store, indexDf, ix, probe, latestFileOk) }
            .map(_.select("filename").distinct())
            .reduce((a, b) => a.join(b, Seq("filename"), "inner"))
        } else orderedCandidateFiles(store, indexDf, indexed, scores)
    }
  }

  /** One step of an ordered multi-column probe, for diagnostics:
    * the column probed, the running candidate count AFTER it (−1 when
    * skipped), and whether the short-circuit skipped it. Recorded only
    * under `spark.graft.metricsEnabled`. */
  final case class ProbeStep(column: String, candidates: Long,
      skipped: Boolean)
  @volatile var lastProbeTrace: Option[Seq[ProbeStep]] = None

  /** Selectivity scores from the HLL distinct-stats SIDECARS the index
    * build writes alongside every membership index
    * ([[IndexBuild.statsColumn]], persisted in the store's separate
    * `stats` table so the hot index table stays lean): for each probed
    * column with a sidecar, estimate the expected per-file match count
    * of its probe as `nValues × avgPerFileDistinct / globalDistinct` —
    * the union-bound probability proxy for "does a given file survive
    * this probe". Lower = more selective = probe earlier. One bounded
    * aggregate over the stats table computes every score (per-file
    * sketches estimate per row; the global estimate is their union —
    * Datasketches HLL, ~1.6 % rse at lgK 12). Literal probes use their
    * exact distinct value count; DataFrame probes a configured prior
    * (counting them would cost a planning scan of the probe side).
    * Columns with no sidecar get no score and keep their original
    * relative order AFTER every scored column. */
  private def hllProbeScores(
      store: IndexStore,
      indexed: Seq[(IndexDef, Probe)]): Map[String, Double] = {
    val spark = store.spark
    val stats = store.statsTable.read().getOrElse(return Map.empty)
    val statCols = indexed.flatMap { case (ix, probe) =>
      val sc = IndexBuild.statsColumn(ix.column)
      if (stats.columns.contains(sc)) Some((ix.column, sc, probe))
      else None
    }
    if (statCols.isEmpty) return Map.empty
    val aggs = statCols.flatMap { case (c, sc, _) =>
      Seq(
        avg(call_function("hll_sketch_estimate", col(sc)))
          .as(s"__avg_$c"),
        call_function("hll_sketch_estimate",
          call_function("hll_union_agg", col(sc), lit(true)))
          .as(s"__u_$c"))
    }
    val row = stats.agg(aggs.head, aggs.tail: _*).first()
    val framePrior = GraftConf.probeOrderFramePrior(spark).toDouble
    statCols.zipWithIndex.flatMap { case ((c, _, probe), i) =>
      val (avgI, uI) = (2 * i, 2 * i + 1)
      if (row.isNullAt(avgI) || row.isNullAt(uI)) None
      else {
        val perFile = row.getDouble(avgI)
        val global = math.max(1L, row.getLong(uI)).toDouble
        val nVals = probe match {
          case Values(vs) => math.max(1, vs.distinct.size).toDouble
          case Frame(_) => framePrior
        }
        Some(c -> nVals * perFile / global)
      }
    }.toMap
  }

  /** Ordered, short-circuiting AND-intersection: probe the most
    * selective column FIRST (ascending [[hllProbeScores]]; unscored
    * columns keep their original relative order after every scored
    * one), restrict each later probe's index frame to the running
    * candidate set, and SKIP remaining probes once the running set is
    * at most `spark.graft.probeShortCircuitFiles` files (or provably
    * empty) — each skipped probe saves a full index-table pass while
    * costing at most that many extra file reads, and the result is a
    * SUPERSET of the fixed-order intersection, which pruning is always
    * allowed to be (residual joins/filters keep results exact). Every
    * step pins its bounded filename frame (≤ one row per file) and
    * counts it — the count is the short-circuit decision AND the
    * intersection-tightness certificate recorded in [[lastProbeTrace]].
    * Overflow-segment candidates are re-intersected with the running
    * set explicitly: the large-table scan is not restricted by the
    * frame, so its matches must not re-admit files an earlier probe
    * eliminated. */
  private def orderedCandidateFiles(
      store: IndexStore,
      indexDf: DataFrame,
      indexed: Seq[(IndexDef, Probe)],
      scores: Map[String, Double]): DataFrame = {
    val spark = store.spark
    // stable sort: scored columns ascending, unscored (MaxValue) keep
    // their original relative order at the end; ties broken by column
    // name for plan determinism
    val ordered = indexed.sortBy { case (ix, _) =>
      (scores.getOrElse(ix.column, Double.MaxValue), ix.column)
    }
    val floor = GraftConf.probeShortCircuitFiles(spark).toLong
    val trace = scala.collection.mutable.ArrayBuffer.empty[ProbeStep]
    var cand: Option[DataFrame] = None
    var candCount = Long.MaxValue
    ordered.foreach { case (ix, probe) =>
      if (candCount <= floor) trace += ProbeStep(ix.column, -1L, true)
      else {
        val frame = cand match {
          case Some(c) => indexDf.join(c, Seq("filename"), "left_semi")
          case None => indexDf
        }
        var next = candidatesForColumn(store, frame, ix, probe,
            latestFileOk = false)
          .select("filename").distinct()
        cand.foreach(c => next = next.join(c, Seq("filename"), "left_semi"))
        val pinned = next.localCheckpoint()
        candCount = pinned.count()
        cand = Some(pinned)
        trace += ProbeStep(ix.column, candCount, false)
      }
    }
    lastProbeTrace =
      if (GraftConf.metricsEnabled(spark)) Some(trace.toSeq) else None
    cand.get
  }

  /** Collect the final (bounded: one row per candidate file) path list. */
  def collectFiles(df: DataFrame): Seq[String] =
    df.select("filename").distinct().collect().map(_.getString(0)).toSeq

  private def emptyFilenames(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("filename", StringType))))
  }

  private def candidatesForColumn(
      store: IndexStore,
      indexDf: DataFrame,
      ix: IndexDef,
      probe: Probe,
      latestFileOk: Boolean = true): DataFrame = {
    // storage column entirely absent = registered but never built (backfill
    // pending): no pruning possible, every file is a candidate
    if (!indexDf.columns.contains(ix.storageColumn))
      return indexDf.select("filename")
    val matched = ix.indexType match {
      case "regular" | "computed" | "exploded" => arrayCandidates(store, indexDf, ix, probe)
      case "bloom" | "exploded_bloom" =>
        bloomCandidates(store.spark, indexDf, ix, probe)
      case "range"    => rangeCandidates(store.spark, indexDf, ix, probe)
      case "temporal" => temporalCandidates(indexDf, ix, probe, latestFileOk)
      case "hll" => throw new IllegalArgumentException(
        s"Column '${ix.column}' carries a statistics-only hll index — " +
          "it cannot answer membership probes; use Index.distinctEstimate")
      case t => throw new IllegalStateException(s"unknown index type $t")
    }
    // Files whose index entry for this column is NULL (registered but not
    // yet backfilled after a later addIndex) may contain ANYTHING and must
    // stay candidates for every probe type — pruning may only ever
    // over-approximate, and residual filters/joins keep results exact.
    // The bloom path already carried this invariant; it holds uniformly now.
    matched.select("filename")
      .unionByName(indexDf.where(col(ix.storageColumn).isNull).select("filename"))
  }

  /** Files that can contain EVERY one of `values` on an exploded /
    * exploded_bloom column — the phrase-search probe: a document holding
    * the phrase holds ALL of its window hashes, so requiring every value
    * (per-file match-count == distinct probe values for arrays; bloom
    * `forall` for blooms) prunes strictly tighter than the any-match
    * candidate set while staying sound (over-approximation only).
    * Registered-but-unbuilt files (null entry) stay candidates, exactly
    * like [[candidateFiles]]. */
  def allValuesCandidates(
      store: IndexStore,
      ix: IndexDef,
      values: Seq[Any]): Seq[String] = {
    require(values.nonEmpty, "allValuesCandidates needs at least one value")
    require(ix.isExplodedShaped,
      s"all-values probe needs an exploded kind, got ${ix.indexType}")
    val idx = store.indexTable.read().getOrElse(return Seq.empty)
    if (!idx.columns.contains(ix.storageColumn))
      return collectFiles(idx) // registered but never built: no pruning
    val matched = ix.indexType match {
      case "exploded_bloom" =>
        idx.where(col(ix.storageColumn).isNull ||
            Blooms.mightContainAll(values.map(v =>
              if (v == null) null else v.toString))(col(ix.storageColumn)))
          .select("filename")
      case _ =>
        val main = idx.where(col(ix.storageColumn).isNotNull)
          .select(col("filename"), explode(col(ix.storageColumn)).as("__v"))
        val all = store.largeTable(ix.column).read() match {
          case Some(large) =>
            main.unionByName(large.select(col("filename"), col("value").as("__v")))
          case None => main
        }
        val need = values.distinct
        all.where(memberFilter(store.spark,
          all.schema("__v").dataType, need)(col("__v")))
          .groupBy("filename")
          .agg(count_distinct(col("__v")).as("__n"))
          .where(col("__n") === need.size)
          .select("filename")
          .unionByName(
            idx.where(col(ix.storageColumn).isNull).select("filename"))
    }
    collectFiles(matched)
  }

  /** Distinct-array columns: explode the per-file array (∪ the large-index
    * overflow rows, pre-filtered by auto-bloom when present) and keep files
    * whose values intersect the probe (reference:
    * IndexQueryOperations.scala:115-135,484-521,687-723). */
  private def arrayCandidates(
      store: IndexStore,
      indexDf: DataFrame,
      ix: IndexDef,
      probe: Probe): DataFrame = {
    val spark = store.spark
    // A Frame probe's distinct values are collected ONCE per column (one
    // job, bounded by the LARGER broadcast cap), then shared by the
    // auto-bloom pre-filter and the value filter below. Value count picks
    // the filter shape: ≤ probeValueLimit inlines an `isin` literal list;
    // ≤ probeBroadcastLimit ships a broadcast hash set into an executor-
    // side membership test (still shuffle-free — measured dominant cost of
    // a 10^5-value indexed join was the old semi-join's explode shuffle);
    // beyond that, a distributed semi-join (never driver-OOM).
    val literalCap = GraftConf.probeValueLimit(spark)
    val frameVals: Option[Seq[Any]] = probe match {
      case Frame(df) => boundedValues(spark, df,
        math.max(literalCap, GraftConf.probeBroadcastLimit(spark)))
      case _         => None
    }
    val frameLiteralVals: Option[Seq[Any]] = frameVals.filter(_.size <= literalCap)
    val main = indexDf.where(col(ix.column).isNotNull)
      .select(col("filename"), explode(col(ix.column)).as("__v"))

    val all = store.largeTable(ix.column).read() match {
      case Some(large) =>
        val largeRows = large.select(col("filename"), col("value").as("__v"))
        // Auto-bloom pre-filter: restrict the (potentially huge) overflow
        // scan to files whose bloom might contain a probe value
        // (reference: IndexQueryOperations.scala:124-131,387-468). Unbounded
        // Frame probes skip it — correct, merely less pruned (r1 verdict
        // bug #1: the join path used to skip the pre-filter entirely).
        val ab = s"auto_bloom_${ix.column}"
        val probeStrings: Option[Seq[String]] = probe match {
          case Values(vs) => Some(vs.map(v => if (v == null) null else v.toString))
          case Frame(_) => frameVals.map(_.map(v => if (v == null) null else v.toString))
        }
        val preFiltered = probeStrings match {
          case Some(vs) if indexDf.columns.contains(ab) =>
            val candidates = indexDf
              .where(bloomAnyFilter(spark, vs)(col(ab)) || col(ab).isNull)
              .select("filename")
            largeRows.join(candidates, Seq("filename"), "left_semi")
          case _ => largeRows
        }
        main.unionByName(preFiltered)
      case None => main
    }

    probe match {
      case Values(vs) => all.where(
        memberFilter(spark, all.schema("__v").dataType, vs)(col("__v")))
      case Frame(df) => frameLiteralVals match {
        case Some(vs) => all.where(isinOrFalse(col("__v"), vs))
        case None =>
          // typed broadcast membership test (long / int / string cover real
          // join keys); other element types — and value counts past the
          // broadcast cap — keep the distributed semi-join
          val elemType = all.schema("__v").dataType
          frameVals.flatMap(vs => broadcastContains(spark, vs, elemType)) match {
            case Some(pred) => all.where(pred(col("__v")))
            case None =>
              all.join(df.toDF("__v").distinct(), Seq("__v"), "left_semi")
          }
      }
    }
  }

  /** `isin` with Spark's empty-list edge pinned to constant false. */
  private def isinOrFalse(c: Column, vs: Seq[Any]): Column =
    if (vs.isEmpty) lit(false) else c.isin(vs: _*)

  /** Row-level membership filter for a bounded Values probe, with the
    * SAME shape discipline as Frame probes: within `probeValueLimit` the
    * values inline as an `isin` literal list; past it they ship ONCE as a
    * broadcast sorted array into a codegen'd membership expression
    * ([[graft.functions.BroadcastSets]]) for the key types real joins use
    * — a 10^4-literal `isin` tree bloats the serialized plan shipped with
    * every task. Element types without a broadcast expression keep the
    * literal list (correct, merely bigger plans). */
  private[operators] def memberFilter(
      spark: SparkSession,
      dt: org.apache.spark.sql.types.DataType,
      vs: Seq[Any]): Column => Column =
    if (vs.isEmpty) (_: Column) => lit(false)
    else if (vs.size <= GraftConf.probeValueLimit(spark))
      (c: Column) => c.isin(vs: _*)
    else broadcastContains(spark, vs, dt)
      .getOrElse((c: Column) => c.isin(vs: _*))

  /** Bloom any-match predicate with the same shape discipline: literal
    * closure list within the cap, broadcast array past it. */
  private def bloomAnyFilter(
      spark: SparkSession,
      strings: Seq[String]): Column => Column =
    if (strings.size <= GraftConf.probeValueLimit(spark))
      Blooms.mightContainAny(strings)
    else {
      val nonNull = strings.filter(_ != null).toArray
      if (nonNull.isEmpty) Blooms.mightContainAny(strings)
      else Blooms.mightContainAnyBroadcast(
        spark.sparkContext.broadcast(nonNull))
    }

  /** Executor-side membership test against a broadcast hash set of probe
    * values, for the key types real joins use. Returns None — caller falls
    * back to a semi-join — for exotic element types AND whenever any
    * non-null probe value fails to convert losslessly to the index element
    * type (a probe of strings against a long-indexed column must NOT
    * become an empty set: an empty candidate filter UNDER-approximates,
    * which pruning may never do). Integral widths cross-match by widening
    * both sides to long. Null probe values never match (isin parity). */
  private def broadcastContains(
      spark: SparkSession,
      vs: Seq[Any],
      dt: org.apache.spark.sql.types.DataType): Option[Column => Column] = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}
    val nonNull = vs.filter(_ != null)
    def asLongs: Option[Set[Long]] = {
      val conv = nonNull.flatMap {
        case x: java.lang.Long    => Some(x.longValue)
        case x: java.lang.Integer => Some(x.longValue)
        case x: java.lang.Short   => Some(x.longValue)
        case x: java.lang.Byte    => Some(x.longValue)
        case _                    => None
      }
      if (conv.size == nonNull.size) Some(conv.toSet) else None
    }
    dt match {
      case LongType | IntegerType | ShortType | ByteType =>
        asLongs.map { s =>
          (c: Column) => graft.functions.BroadcastSets
            .longSetContains(spark, s)(c.cast("long"))
        }
      case StringType if nonNull.forall(_.isInstanceOf[String]) =>
        Some(graft.functions.BroadcastSets
          .stringSetContains(spark, nonNull.map(_.asInstanceOf[String])))
      case _ => None
    }
  }

  private def bloomCandidates(
      spark: SparkSession, indexDf: DataFrame, ix: IndexDef, probe: Probe): DataFrame = {
    val sc = col(ix.storageColumn)
    probe match {
      case Values(vs) =>
        val strings = vs.filter(_ != null).map(_.toString)
        indexDf.where(
          bloomAnyFilter(spark, strings)(sc) || sc.isNull)
      case Frame(df) =>
        // ONE bounded collect under the larger broadcast cap (same shape as
        // arrayCandidates — a second collect would re-execute the whole
        // probe plan). Within the literal cap the values inline as a
        // closure list; within the broadcast cap they ship broadcast into
        // the executor any-match (r3 verdict item 8 — pruning keeps
        // working for 10^4–10^5 values); beyond it, no pruning.
        val litCap = GraftConf.probeValueLimit(spark)
        boundedValues(spark, df,
          math.max(litCap, GraftConf.probeBroadcastLimit(spark))) match {
          case Some(vs) if vs.size <= litCap =>
            bloomCandidates(spark, indexDf, ix, Values(vs))
          case Some(vs) =>
            val strings = vs.filter(_ != null).map(_.toString).toArray
            if (strings.isEmpty) indexDf.where(sc.isNull)
            else {
              val bc = spark.sparkContext.broadcast(strings)
              indexDf.where(
                Blooms.mightContainAnyBroadcast(bc)(sc) || sc.isNull)
            }
          case None => indexDf // beyond even the broadcast cap
        }
    }
  }

  /** Range columns: per-value containment for small probes, min/max
    * bounding-box overlap for big ones (reference:
    * IndexQueryOperations.scala:572-599,818-885 — but collect-free for the
    * big-probe path). */
  private def rangeCandidates(
      spark: SparkSession, indexDf: DataFrame, ix: IndexDef, probe: Probe): DataFrame = {
    val lo = col(s"${ix.storageColumn}.min")
    val hi = col(s"${ix.storageColumn}.max")
    probe match {
      case Values(vs) =>
        val nonNull = vs.filter(_ != null)
        if (nonNull.isEmpty) indexDf.where(lit(false))
        else if (nonNull.size <= GraftConf.rangeProbeExactLimit(spark)) {
          indexDf.where(nonNull.map(v => lo <= lit(v) && hi >= lit(v)).reduce(_ || _))
        } else {
          // Bounding box may admit false-positive files — acceptable: pruning
          // must only ever over-approximate.
          val qmin = nonNull.map(lit).reduce((a, x) => least(a, x))
          val qmax = nonNull.map(lit).reduce((a, x) => greatest(a, x))
          indexDf.where(hi >= qmin && lo <= qmax)
        }
      case Frame(df) =>
        // Collect-free: aggregate the probe frame's bounds, cross-join the
        // single bounds row against the (small) index table.
        val v = col(df.columns.head)
        val bounds = df.agg(min(v).as("__qmin"), max(v).as("__qmax"),
          approx_count_distinct(v).as("__qn"))
        val exact = boundedValues(spark, df,
          cap = GraftConf.rangeProbeExactLimit(spark))
        exact match {
          case Some(vs) => rangeCandidates(spark, indexDf, ix, Values(vs))
          case None =>
            indexDf.crossJoin(broadcast(bounds))
              .where(hi >= col("__qmin") && lo <= col("__qmax"))
              .drop("__qmin", "__qmax", "__qn")
        }
    }
  }

  /** Temporal columns: for each probed value, only the file holding the
    * LATEST timestamp for that value can contribute the latest row
    * (reference: IndexQueryOperations.scala:539-555,769-796). Filename is a
    * determinism tiebreak on equal timestamps.
    *
    * `latestFileOk = false` (multi-column probes — see [[candidateFiles]])
    * skips the latest-file winnowing and returns every file CONTAINING a
    * probed value: with other filters in play the per-value winner can live
    * in a non-latest file, and pruning may only ever over-approximate. */
  private def temporalCandidates(
      indexDf: DataFrame, ix: IndexDef, probe: Probe,
      latestFileOk: Boolean = true): DataFrame = {
    val exploded = indexDf.where(col(ix.column).isNotNull)
      .select(col("filename"), explode(col(ix.column)).as("__s"))
      .select(col("filename"), col("__s.value").as("__v"), col("__s.max_ts").as("__ts"))
    val matched = probe match {
      case Values(vs) => exploded.where(memberFilter(
        indexDf.sparkSession, exploded.schema("__v").dataType, vs)(
        col("__v")))
      case Frame(df) => boundedValues(indexDf.sparkSession, df) match {
        // same bounded literal fast path as arrayCandidates
        case Some(vs) => exploded.where(isinOrFalse(col("__v"), vs))
        case None => exploded.join(df.toDF("__v").distinct(), Seq("__v"), "left_semi")
      }
    }
    // One hash aggregation with partial (map-side) combine instead of a
    // window over the value key: a window shuffles + sorts every matched
    // index row and lands each hot value on ONE task — at 10^6 files a
    // frequently-updated key is exactly such a hot value. max(struct) keeps
    // whole-stage codegen and pre-aggregates per partition, so skewed keys
    // cost O(partitions), not O(rows-for-key) on a single task.
    //
    // EVERY file tying at a key's max ts is kept (null-safe equality
    // against the per-value max): the row-level dedup breaks ts ties by
    // greatest payload, and the winning payload of a tie may live in any
    // tying file — keeping only one (the old greatest-filename pick) could
    // return a different winner than an unpruned read, making pruning
    // observable. The extra join runs on the small per-file index frame,
    // never on data rows; an all-null-ts key keeps all its files (the
    // over-approximation pruning is allowed).
    if (!latestFileOk) return matched.select("filename")
    val winners = matched.groupBy(col("__v")).agg(max(col("__ts")).as("__mx"))
    matched.join(winners, Seq("__v"))
      .where(col("__ts") <=> col("__mx"))
      .select("filename")
  }

  /** Files CONTAINING a probed key in a temporal index, with no
    * latest-timestamp restriction — as-of joins need every historical row
    * for a key (the winner at a probe time may live in any file), so only
    * key-containment pruning is safe. */
  def temporalKeyCandidates(
      store: IndexStore,
      ix: IndexDef,
      probeDf: DataFrame): DataFrame = {
    store.indexTable.read() match {
      case None => emptyFilenames(store.spark)
      case Some(indexDf) if !indexDf.columns.contains(ix.storageColumn) =>
        indexDf.select("filename") // not built yet → no pruning
      case Some(indexDf) =>
        val exploded = indexDf.where(col(ix.column).isNotNull)
          .select(col("filename"), col(ix.column).getField("value").as("__vs"))
          .select(col("filename"), explode(col("__vs")).as("__v"))
        val matched = boundedValues(store.spark, probeDf) match {
          case Some(vs) => exploded.where(isinOrFalse(col("__v"), vs))
          case None =>
            exploded.join(probeDf.toDF("__v").distinct(), Seq("__v"), "left_semi")
        }
        // null entry (not yet backfilled) stays a candidate
        matched.select("filename")
          .unionByName(
            indexDf.where(col(ix.storageColumn).isNull).select("filename"))
          .distinct()
    }
  }

  /** Files whose [min,max] range overlaps ANY of the probed spans — the
    * interval-join pruning probe. A bounded span list collapses to an OR of
    * per-span overlap predicates over the (memory-cached) index table; past
    * the cap it degrades to the spans' bounding box (over-approximates,
    * never misses). `spans` must have (lo, hi) as its first two columns. */
  def rangeSpanCandidates(
      store: IndexStore, ix: IndexDef, spans: DataFrame): DataFrame = {
    store.indexTable.read() match {
      case None => emptyFilenames(store.spark)
      case Some(indexDf) if !indexDf.columns.contains(ix.storageColumn) =>
        indexDf.select("filename") // not built yet → no pruning
      case Some(indexDf) =>
        val fLo = col(s"${ix.storageColumn}.min")
        val fHi = col(s"${ix.storageColumn}.max")
        val loC = col(spans.columns(0))
        val hiC = col(spans.columns(1))
        val cap = GraftConf.rangeProbeExactLimit(store.spark)
        val rows = spans.select(loC, hiC).distinct().limit(cap + 1).collect()
        // null entry (not yet backfilled) stays a candidate in both branches
        val nullEntry = col(ix.storageColumn).isNull
        val pruned =
          if (rows.length <= cap && rows.nonEmpty) {
            indexDf.where(rows.toSeq
              .map(r => fHi >= lit(r.get(0)) && fLo <= lit(r.get(1)))
              .reduce(_ || _) || nullEntry)
          } else {
            val bounds = spans.agg(min(loC).as("__qlo"), max(hiC).as("__qhi"))
            indexDf.crossJoin(broadcast(bounds))
              .where((fHi >= col("__qlo") && fLo <= col("__qhi")) || nullEntry)
          }
        pruned.select("filename").distinct()
    }
  }

  /** Files possibly holding rows passing one-sided comparison filters on a
    * range-indexed column (the SQL-pushdown probe): `> v`/`>= v` keep files
    * whose max ≥ v, `< v`/`<= v` files whose min ≤ v; several bounds on the
    * same column AND together (a BETWEEN arrives as one of each). Strict
    * bounds use ≥/≤ — an over-approximation, which pruning requires. */
  def rangeFilterCandidates(
      store: IndexStore, ix: IndexDef, ops: Seq[(String, Any)]): DataFrame = {
    store.indexTable.read() match {
      case None => emptyFilenames(store.spark)
      case Some(indexDf) if !indexDf.columns.contains(ix.storageColumn) =>
        indexDf.select("filename") // not built yet → no pruning
      case Some(indexDf) =>
        val lo = col(s"${ix.storageColumn}.min")
        val hi = col(s"${ix.storageColumn}.max")
        val preds = ops.map {
          case (">", v)  => hi >= lit(v)
          case (">=", v) => hi >= lit(v)
          case ("<", v)  => lo <= lit(v)
          case ("<=", v) => lo <= lit(v)
          case (op, _) => throw new IllegalArgumentException(s"unknown bound op $op")
        }
        // null entry (not yet backfilled) stays a candidate
        indexDf.where(preds.reduce(_ && _) || col(ix.storageColumn).isNull)
          .select("filename")
    }
  }

  /** Files whose [min,max] overlaps the query window [lo,hi] — the
    * BETWEEN-style pruning probe behind Index.queryRange. */
  def rangeWindowCandidates(
      store: IndexStore, ix: IndexDef, lo: Any, hi: Any): DataFrame = {
    store.indexTable.read() match {
      case None => emptyFilenames(store.spark)
      case Some(indexDf) if !indexDf.columns.contains(ix.storageColumn) =>
        indexDf.select("filename") // not built yet → no pruning
      case Some(indexDf) =>
        val lc = col(s"${ix.storageColumn}.min")
        val hc = col(s"${ix.storageColumn}.max")
        // null entry (not yet backfilled) stays a candidate
        indexDf.where((hc >= lit(lo) && lc <= lit(hi)) ||
            col(ix.storageColumn).isNull)
          .select("filename")
    }
  }

  /** Distinct probe values collected to the driver iff bounded by the cap;
    * None ⇒ caller must degrade gracefully (no pruning for that column). */
  private def boundedValues(
      spark: SparkSession, df: DataFrame, cap: Int = -1): Option[Seq[Any]] = {
    val limit = if (cap > 0) cap else GraftConf.probeValueLimit(spark)
    val rows = df.select(col(df.columns.head)).distinct().limit(limit + 1).collect()
    if (rows.length > limit) None else Some(rows.toSeq.map(_.get(0)))
  }
}
