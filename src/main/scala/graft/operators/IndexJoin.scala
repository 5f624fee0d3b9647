package graft.operators

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftConf
import graft.model.IndexMetadata
import graft.sources.FileReader
import graft.store.IndexStore

/** Index-accelerated equi-joins: locate candidate files from the probe
  * side's values, read ONLY those files, then hand a normal DataFrame join
  * to Catalyst (which picks broadcast / SMJ / shuffled-hash and benefits
  * from AQE) — the pruning is invisible to join planning
  * (reference: IndexJoinOperations.scala:79-286,373-401).
  */
object IndexJoin extends Logging {

  case class PruningMetrics(
      locatedFiles: Long, totalFiles: Long, locatedBytes: Long, totalBytes: Long) {
    def pct: Double =
      if (totalBytes <= 0) 0.0 else 100.0 * (1.0 - locatedBytes.toDouble / totalBytes)
    override def toString: String =
      f"Index pruning: loading $locatedFiles of $totalFiles files " +
        f"($locatedBytes%d of $totalBytes%d bytes, $pct%.1f%% pruned)"
  }

  @volatile var lastMetrics: Option[PruningMetrics] = None

  /** Does this join type need index rows that match NOTHING on the probe
    * side? If so, file pruning by probe values would silently drop result
    * rows and the whole index must be read (pruning is only ever allowed to
    * over-approximate). With the index on the left: LEFT/FULL OUTER keep
    * unmatched index rows, LEFT ANTI returns exactly the non-matching ones.
    * Reversed (index on the right): RIGHT/FULL OUTER. Semi joins and INNER
    * always prune; reversed LEFT ANTI prunes too — a probe row's matches
    * can only live in files the probe located (candidate sets
    * over-approximate). */
  def needsAllIndexRows(joinType: String, indexIsLeft: Boolean): Boolean = {
    val jt = joinType.toLowerCase.replace("_", "")
    val full = Set("full", "fullouter", "outer")
    if (indexIsLeft) full.contains(jt) || jt == "left" || jt == "leftouter" || jt == "leftanti"
    else full.contains(jt) || jt == "right" || jt == "rightouter"
  }

  /** Validate join columns, locate files from the probe frame, return the
    * pruned + temporally-deduplicated index-side data. `pruneIndexSide =
    * false` reads every registered file (outer/anti join types — see
    * [[needsAllIndexRows]]; the reference shares this sharp edge but never
    * pins it: its LEFT OUTER tests run through the catalog's read-all
    * path). */
  def prunedData(
      store: IndexStore,
      meta: IndexMetadata,
      probeDf: DataFrame,
      usingColumns: Seq[String],
      selection: Option[Seq[String]],
      pruneIndexSide: Boolean = true): DataFrame = {
    val spark = store.spark
    val readable = readableColumns(meta)
    usingColumns.foreach { c =>
      require(readable.contains(c),
        s"Join column '$c' is not a column of index '${meta.name}' " +
          s"(available: ${readable.mkString(", ")})")
    }
    val indexedCols = usingColumns.filter(c =>
      meta.indexFor(c).exists(_.canProbe))
    require(indexedCols.nonEmpty,
      s"At least one join column must be indexed; none of " +
        s"${usingColumns.mkString(", ")} is (reference rule, " +
        "IndexJoinOperations.scala:131-137)")

    val files =
      if (pruneIndexSide) {
        val probes: Map[String, IndexProbe.Probe] =
          indexedCols.map(c => c -> IndexProbe.Frame(probeDf.select(col(c)))).toMap
        val t0 = System.nanoTime()
        val located = IndexProbe.collectFiles(IndexProbe.candidateFiles(store, meta, probes))
        // probe-latency telemetry, mirroring the reference's per-locate log
        // (IndexQueryOperations.scala:278-281) — ours is one fused job, so
        // one wall time covers all probed columns
        logInfo(f"index ${meta.name}: located ${located.size} files for " +
          s"columns [${indexedCols.mkString(", ")}] in " +
          f"${(System.nanoTime() - t0) / 1e6}%.0f ms")
        located
      } else {
        store.fileList.read()
          .map(_.select("filename").collect().map(_.getString(0)).toSeq)
          .getOrElse(Seq.empty)
      }
    if (GraftConf.metricsEnabled(spark)) recordMetrics(store, files)

    val aliases = meta.indexes
      .filter(ix => ix.isExplodedShaped && usingColumns.contains(ix.column))
      .map(_.column).toSet
    // Temporal dedup needs each config's timestamp column — force-read the
    // ROOT column of (possibly nested) ts paths even under select(), then
    // drop anything the user didn't ask for after dedup (reference:
    // IndexJoinOperations.scala:96-115,247-271).
    val temporalDefs = meta.indexes.filter(ix =>
      ix.indexType == "temporal" && usingColumns.contains(ix.column))
    val tsRoots = temporalDefs.flatMap(_.tsColumn).map(_.split('.').head)
    val sel = selection.map(s => (s ++ usingColumns ++ tsRoots).distinct)
    var data = FileReader.readFiles(spark, meta, files, aliases, sel)
    data = applyTemporalDedup(data, meta, usingColumns.toSet)
    selection.foreach { s =>
      val wanted = (s ++ usingColumns).distinct
      val extra = tsRoots.filterNot(wanted.contains)
      if (extra.nonEmpty) data = data.drop(extra: _*)
    }
    val rep = GraftConf.repartitionDataFiles(spark)
    if (rep > 0) data = data.repartition(rep)
    data
  }

  /** `index.join(df, cols, joinType)` — index side left (reference:
    * Index.scala:960-964). Any Spark join type passes through. */
  def join(
      store: IndexStore,
      meta: IndexMetadata,
      df: DataFrame,
      usingColumns: Seq[String],
      joinType: String,
      selection: Option[Seq[String]]): DataFrame =
    prunedData(store, meta, df, usingColumns, selection,
      pruneIndexSide = !needsAllIndexRows(joinType, indexIsLeft = true))
      .join(df, usingColumns, joinType)

  /** `df.join(index, cols, joinType)` — enrichment direction (reference:
    * Index.scala:1296-1323). */
  def joinReversed(
      store: IndexStore,
      meta: IndexMetadata,
      df: DataFrame,
      usingColumns: Seq[String],
      joinType: String,
      selection: Option[Seq[String]]): DataFrame =
    df.join(prunedData(store, meta, df, usingColumns, selection,
      pruneIndexSide = !needsAllIndexRows(joinType, indexIsLeft = false)),
      usingColumns, joinType)

  /** Latest-version row filter: for every applicable temporal index, keep
    * the single latest row per value — and with several temporal configs,
    * only rows that are the latest under EVERY config, each winner computed
    * against the original rows before any filtering (reference:
    * IndexJoinOperations.scala:303-337).
    *
    * This sits on every temporal read — programmatic join, `query()` and
    * the SQL catalog scan — so it must not be a window: `row_number() OVER
    * (PARTITION BY value)` shuffles + sorts all data rows and lands each
    * hot value on ONE task, serializing a frequently-updated key (millions
    * of versions of one entity) at scale. Instead, one hash aggregate with
    * map-side partial combine: `max(struct(ts, whole-row))` per value —
    * skewed keys cost O(partitions), not O(rows-for-key) on a single task
    * (the same de-windowing already applied to the probe side in
    * [[IndexProbe.temporalCandidates]]). Struct comparison ranks null ts
    * lowest (same preference as the old `desc_nulls_last`); on exact ts
    * ties the greatest payload wins — deterministic, where the window's
    * tie-break was arbitrary. Rows with non-orderable column types (maps)
    * can't ride a max(struct); they fall back to the window formulation. */
  def applyTemporalDedup(
      df: DataFrame, meta: IndexMetadata, joinColumns: Set[String]): DataFrame = {
    val defs = meta.indexes.filter(ix =>
      ix.indexType == "temporal" && joinColumns.contains(ix.column))
    if (defs.isEmpty) df
    else if (!df.schema.fields.forall(f => orderableType(f.dataType)))
      windowedTemporalDedup(df, defs)
    else if (defs.size == 1) latestRowPerValue(df, defs.head)
    else {
      // Multi-config: a row survives iff it is the winner under EVERY
      // config, each winner computed against the ORIGINAL rows (reference
      // semantics — sequential filtering would compute config 2's winners
      // among config 1's survivors, a different set). Each config's winner
      // set is duplicate-free by construction (one row per group, and the
      // group key rides in the payload), so "in all N winner sets" reduces
      // to: union the winner sets and keep payloads appearing N times —
      // ONE aggregate over the winner union instead of the previous N-1
      // full-row distinct-shuffle intersects (r4 verdict finding #2: each
      // intersect shuffled data-sized frames when values are near-unique).
      val n = defs.size
      val cols = df.columns.toIndexedSeq
      defs.map(ix => latestRowPerValue(df, ix))
        .reduce(_.unionByName(_))
        .groupBy(cols.map(col): _*)
        .agg(count(lit(1)).as("__graft_n"))
        .where(col("__graft_n") === n)
        .drop("__graft_n")
    }
  }

  /** One aggregate replacing the per-value row_number window; output schema
    * is exactly `df`'s (the value column rides inside the payload struct). */
  private def latestRowPerValue(df: DataFrame, ix: graft.model.IndexDef): DataFrame = {
    val payload = struct(df.columns.toIndexedSeq.map(df(_)): _*)
    df.groupBy(df(ix.column))
      .agg(max(struct(col(ix.tsColumn.get).as("__graft_ts"),
        payload.as("__graft_row"))).as("__graft_m"))
      .select(col("__graft_m.__graft_row.*"))
  }

  /** Can values of this type be compared inside a max(struct) aggregate? */
  private def orderableType(dt: org.apache.spark.sql.types.DataType): Boolean =
    org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(dt)

  /** Fallback for non-orderable payloads only (a map column can't be struct-
    * compared): the original window formulation, with its hot-key caveat. */
  private def windowedTemporalDedup(
      df: DataFrame, defs: Seq[graft.model.IndexDef]): DataFrame = {
    val rankCols = defs.indices.map(i => s"__graft_rank_$i")
    val ranked = defs.zipWithIndex.foldLeft(df) { case (d, (ix, i)) =>
      val w = Window.partitionBy(col(ix.column))
        .orderBy(col(ix.tsColumn.get).desc_nulls_last)
      d.withColumn(rankCols(i), row_number().over(w))
    }
    ranked
      .where(rankCols.map(c => col(c) === 1).reduce(_ && _))
      .drop(rankCols: _*)
  }

  /** Columns a join may reference: top-level schema fields, computed
    * aliases, exploded aliases, temporal value columns. */
  def readableColumns(meta: IndexMetadata): Set[String] =
    meta.schema.fieldNames.toSet ++ meta.indexes.map(_.column)

  /** Opt-in (spark.graft.metricsEnabled): one small aggregate over the
    * one-row-per-file index table, with located files joined as a DataFrame
    * rather than an `isin` literal list that could hold 10^6 entries. */
  private[graft] def recordMetrics(store: IndexStore, files: Seq[String]): Unit = {
    try {
      store.indexTable.read().foreach { idx =>
        val spark = store.spark
        import spark.implicits._
        val fdf = files.toDF("filename")
        val total = idx.agg(count("*"), sum("file_size")).first()
        val located = idx.join(broadcast(fdf), Seq("filename"), "left_semi")
          .agg(sum("file_size")).first()
        val m = PruningMetrics(
          files.size.toLong,
          total.getLong(0),
          Option(located.get(0)).map(_.toString.toLong).getOrElse(0L),
          Option(total.get(1)).map(_.toString.toLong).getOrElse(0L))
        lastMetrics = Some(m)
        logInfo(m.toString)
      }
    } catch { case e: Exception => logWarning(s"pruning metrics failed: $e") }
  }
}
