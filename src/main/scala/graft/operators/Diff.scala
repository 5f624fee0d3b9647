package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot diff: what changed between two versions of a keyed
  * table — the audit step an incremental training-data pipeline runs
  * before re-tokenizing ("which documents are new / edited / gone since
  * the last crawl?"), and the cheap certificate that a migration or
  * backfill touched exactly what it claimed.
  *
  * Both inputs are keyed by `idCol` (one row per id per snapshot — the
  * caller's contract; enforce upstream with `Validate.checkUnique`, a
  * duplicated id would fan the join out). The diff is ONE full-outer
  * shuffle join on the id over inputs pruned to `idCol ++ compareCols`;
  * with `hashCompare` the compared payload collapses to a single
  * 128-bit md5 per side BEFORE the exchange, so a wide-document diff
  * shuffles id+16 bytes per row instead of the text itself — the 100 TB
  * path (the changed-column attribution is the price; it reports null).
  *
  * Ref parity note: the reference has no snapshot-diff operator; this
  * extends the maintenance surface per the training-data-ops mandate
  * (SURVEY §2 addendum).
  */
object Diff {

  private def qcol(name: String): Column =
    col("`" + name.replace("`", "``") + "`")

  /** Null-proof per-column render for the hash-compare digest: field
    * separator U+001F between columns, U+0000 sentinel for null
    * (distinct from any realistic value including the empty string —
    * only a payload that itself contains bare U+0000/U+001F bytes could
    * alias, the documented edge of the hash path; the column mode
    * compares values null-safely and has no such edge). */
  private def digest(cols: Seq[String]): Column =
    md5(concat_ws("\u001f",
      cols.map(c => coalesce(qcol(c).cast("string"), lit("\u0000"))): _*))

  /** Row-level diff: `idCol | change | changed_cols` where `change` is
    * `added` (id only in `newDf`), `removed` (only in `oldDf`),
    * `changed` (present in both, some compared column differs
    * null-safely) or `unchanged` (emitted only when
    * `includeUnchanged`). `changed_cols` lists the differing columns in
    * `compareCols` order for `changed` rows, is empty for
    * added/removed, and is null throughout under `hashCompare` (the
    * digest knows THAT something changed, not what).
    */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      compareCols: Seq[String],
      includeUnchanged: Boolean = false,
      hashCompare: Boolean = false): DataFrame = {
    require(compareCols.nonEmpty, "at least one compared column")
    require(!compareCols.contains(idCol),
      "idCol is the join key, not a compared column")
    // the output carries `change`/`changed_cols` next to idCol, and the
    // internal sides alias idCol to `__o_id`/`__n_id` — so idCol may not
    // shadow an output name, and no compared column may alias onto the
    // id marker (a compared column literally named "id" would produce a
    // second `__o_id` and fail later with an ambiguous-reference error)
    val reserved = Seq("change", "changed_cols")
    require(!(compareCols :+ idCol).exists(reserved.contains(_)),
      s"columns may not use the reserved names ${reserved.mkString("/")}")
    require(!compareCols.contains("id"),
      "a compared column named 'id' collides with the internal " +
        "__o_id/__n_id markers")
    require(compareCols.distinct.size == compareCols.size,
      "compareCols must be distinct")

    def side(df: DataFrame, marker: String): DataFrame = {
      val payload =
        if (hashCompare) Seq(digest(compareCols).as(s"${marker}_d"))
        else compareCols.map(c => qcol(c).as(s"${marker}_$c"))
      df.select(qcol(idCol).as(s"${marker}_id") +: payload: _*)
    }
    val o = side(oldDf, "__o")
    val n = side(newDf, "__n")
    val joined = o.join(n, col("__o_id") === col("__n_id"), "full_outer")

    val oldPresent = col("__o_id").isNotNull
    val newPresent = col("__n_id").isNotNull
    val (differs, changedCols) =
      if (hashCompare)
        (col("__o_d") =!= col("__n_d"), lit(null).cast("array<string>"))
      else {
        val diffs = compareCols.map(c =>
          !(col(s"__o_$c") <=> col(s"__n_$c")))
        (diffs.reduce(_ || _),
          filter(array(compareCols.zip(diffs).map { case (c, d) =>
            when(d, lit(c))
          }: _*), _.isNotNull))
      }
    val change = when(!oldPresent, "added")
      .when(!newPresent, "removed")
      .when(differs, "changed")
      .otherwise("unchanged")

    val out = joined.select(
      coalesce(col("__n_id"), col("__o_id")).as(idCol),
      change.as("change"),
      when(change === "changed", changedCols)
        .otherwise(if (hashCompare) lit(null).cast("array<string>")
          else array().cast("array<string>"))
        .as("changed_cols"))
    if (includeUnchanged) out else out.where(col("change") =!= "unchanged")
  }

  /** Incremental corpus diff against the last COMMITTED state: report
    * `idCol | change` (added/removed/changed) of `df` versus the
    * `(id, digest)` ledger at `storeDir`, then atomically commit `df`'s
    * state as the new ledger — "what changed since the last ingest"
    * WITHOUT retaining the previous corpus snapshot. First call reports
    * everything `added`; running the same data twice reports nothing
    * (idempotent — the spec pins it). The ledger is a
    * [[graft.store.SnapshotTable]] (atomic pointer swap; a reader of
    * the returned diff keeps reading the pre-commit version it joined
    * against, and a crash before the swap leaves the old state
    * intact — the next run simply re-reports).
    *
    * 100 TB shape: state is id + one 128-bit digest per row — the
    * minimal diffable memory of a corpus (a wide-document table's
    * ledger is ~24 bytes/row); the diff is one id-keyed join of that
    * ledger against the current digests ([[snapshotDiff]]'s hashCompare
    * exchange discipline), and the digest projection is computed ONCE
    * (localCheckpoint) to serve both the diff and the commit. */
  def diffAndCommit(
      df: DataFrame,
      idCol: String,
      compareCols: Seq[String],
      storeDir: String): DataFrame = {
    require(compareCols.nonEmpty, "at least one compared column")
    require(!compareCols.contains(idCol),
      "idCol is the join key, not a compared column")
    val spark = df.sparkSession
    val snap = df
      .select(qcol(idCol).as("id"), digest(compareCols).as("digest"))
      .localCheckpoint()
    val table = new graft.store.SnapshotTable(spark, s"$storeDir/state")
    val prev = table.read().getOrElse(spark.emptyDataFrame.select(
      lit(null).cast(snap.schema("id").dataType).as("id"),
      lit(null).cast("string").as("digest")))
    val joined = prev.select(col("id").as("__o_id"),
        col("digest").as("__o_d"))
      .join(snap.select(col("id").as("__n_id"),
        col("digest").as("__n_d")),
        col("__o_id") === col("__n_id"), "full_outer")
    val change = when(col("__o_id").isNull, "added")
      .when(col("__n_id").isNull, "removed")
      .when(col("__o_d") =!= col("__n_d"), "changed")
      .otherwise("unchanged")
    val diff = joined
      .select(coalesce(col("__n_id"), col("__o_id")).as(idCol),
        change.as("change"))
      .where(col("change") =!= "unchanged")
      .localCheckpoint()
    table.overwrite(snap)
    diff
  }

  /** Schema diff between two snapshots: one row per column that was
    * added, removed, retyped, or re-nullabled — `column | change |
    * old_type | new_type` (types as Spark SQL type strings; a column
    * whose type AND nullability both moved reports `retyped`, the
    * stronger change). The schema-evolution gate an ingest runs BEFORE
    * [[snapshotDiff]]: a retyped column makes every row "changed" for
    * free, so catch it at the metadata grain first. Pure metadata —
    * no job, no scan; returned as a DataFrame so it composes with
    * `Validate.satisfies` thresholds like every other audit. */
  def schemaDiff(oldDf: DataFrame, newDf: DataFrame): DataFrame = {
    val spark = newDf.sparkSession
    import spark.implicits._
    val o = oldDf.schema.map(f => f.name -> f).toMap
    val n = newDf.schema.map(f => f.name -> f).toMap
    val added = (n.keySet -- o.keySet).toSeq.sorted
      .map(c => (c, "added", null: String, n(c).dataType.sql))
    val removed = (o.keySet -- n.keySet).toSeq.sorted
      .map(c => (c, "removed", o(c).dataType.sql, null: String))
    val common = (o.keySet & n.keySet).toSeq.sorted
    val retyped = common
      .filter(c => o(c).dataType != n(c).dataType)
      .map(c => (c, "retyped", o(c).dataType.sql, n(c).dataType.sql))
    val renulled = common
      .filter(c => o(c).dataType == n(c).dataType &&
        o(c).nullable != n(c).nullable)
      .map(c => (c, "re-nullabled", o(c).dataType.sql, n(c).dataType.sql))
    (added ++ removed ++ retyped ++ renulled)
      .toDF("column", "change", "old_type", "new_type")
  }

  /** The diff folded to one row per change kind: `change | n` over
    * added/removed/changed/unchanged (all four always present, zero
    * counts included — a stable-schema gate row for dashboards and
    * `Validate.satisfies` thresholds). Same single join as
    * [[snapshotDiff]] plus a 4-row aggregate. */
  def diffSummary(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      compareCols: Seq[String],
      hashCompare: Boolean = true): DataFrame = {
    val spark = newDf.sparkSession
    import spark.implicits._
    val counted = snapshotDiff(oldDf, newDf, idCol, compareCols,
        includeUnchanged = true, hashCompare = hashCompare)
      .groupBy("change").agg(count(lit(1)).as("n"))
    val kinds = Seq("added", "removed", "changed", "unchanged")
      .toDF("change")
    kinds.join(counted, Seq("change"), "left")
      .select(col("change"), coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Order-independent corpus content fingerprint: ONE row `(n_rows,
    * fp_hi, fp_lo)` where fp_hi/fp_lo are the SUMS of two 60-bit slices
    * (hex chars 1-15 and 17-31) of each row's 128-bit md5 digest over
    * `cols` (the null-proof [[digest]] rendering snapshotDiff's hash
    * mode uses), carried in decimal so no engine ever overflows
    * (60-bit terms × any realistic row count stay far under 38
    * digits), surfaced as strings. Equal `(n_rows, fp_hi, fp_lo)`
    * certifies "same multiset of rows" up to md5+slice collisions —
    * WITHOUT a sort, a join, or shuffling row content: the whole
    * computation is one map-side-combined aggregate whose only
    * exchange carries two integers + a count PER PARTITION (the
    * partial-aggregate state), so comparing two 100 TB snapshots costs
    * two scans and a few kilobytes of network (vs the diff join when
    * you need to know WHICH rows differ).
    *
    * Because the fingerprint is a plain sum it is also INCREMENTAL:
    * fp(A ⊎ B) = fp(A) + fp(B) term-wise, so an append-only pipeline
    * maintains the corpus fingerprint by adding each batch's
    * fingerprint, and a delete subtracts — no rescan. Empty input
    * yields n_rows=0 with null sums (sum over nothing), same on any
    * ANSI engine.
    *
    * Ref parity note: no reference equivalent; completes the
    * governance family ([[snapshotDiff]] says what changed, this is
    * the O(1)-state certificate that nothing did). */
  def corpusFingerprint(df: DataFrame, cols: Seq[String]): DataFrame =
    fingerprintSums(df, cols).select(col("n_rows"),
      when(col("n_rows") > 0, col("fp_hi_sum").cast("string")).as("fp_hi"),
      when(col("n_rows") > 0, col("fp_lo_sum").cast("string")).as("fp_lo"))

  /** The raw decimal slice-sums behind [[corpusFingerprint]] —
    * zero-filled on empty input so epoch rows stay additive under
    * plain `sum` (the string view re-derives the null-on-empty
    * surface from n_rows). */
  private def fingerprintSums(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one fingerprinted column")
    val h = digest(cols)
    def slice(from: Int): Column = coalesce(
      sum(conv(substring(h, from, 15), 16, 10).cast("decimal(20,0)"))
        .cast("decimal(38,0)"),
      lit(0).cast("decimal(38,0)"))
    df.agg(count(lit(1)).as("n_rows"),
      slice(1).as("fp_hi_sum"), slice(17).as("fp_lo_sum"))
  }

  /** Driver-side convenience over [[corpusFingerprint]]: true iff the
    * two frames carry the same multiset of `cols` rows (both
    * fingerprints' three fields equal, null-safely — two empty frames
    * are the same content). Two bounded scans, zero shuffles. */
  def sameContent(a: DataFrame, b: DataFrame, cols: Seq[String]): Boolean = {
    val fa = corpusFingerprint(a, cols).head()
    val fb = corpusFingerprint(b, cols).head()
    (0 until 3).forall(i => fa.isNullAt(i) == fb.isNullAt(i) &&
      (fa.isNullAt(i) || fa.get(i) == fb.get(i)))
  }

  /** Incremental corpus fingerprint: fold one micro-batch's
    * [[corpusFingerprint]] sums into a persistent epoch-keyed store —
    * the running content certificate of everything a stream has
    * ingested, maintained for the cost of fingerprinting each batch
    * (the additivity note on [[corpusFingerprint]] made durable).
    * Store grain `n_rows | fp_hi_sum | fp_lo_sum | batch_id` — ONE row
    * per epoch, so the store is bounded by epoch count before folding
    * even starts. A redelivered epoch REPLACES its own registration
    * (`appendReplacing`); an epoch at or below the fold watermark
    * drops (already consolidated — the sketch-store replay
    * discipline). Past `maxEpochs` registered epochs, aged epochs
    * consolidate into one summed row under the sentinel epoch — sums
    * are associative, so [[fingerprintView]] is IDENTICAL across the
    * fold. */
  def fingerprintIncrementalBatch(
      batch: DataFrame,
      cols: Seq[String],
      storeDir: String,
      batchId: Long,
      maxEpochs: Int = 64): Unit = {
    val spark = batch.sparkSession
    if (batchId <= Profile.foldWatermark(spark, storeDir)) return
    Stores.register(spark, storeDir, "fingerprint", cols, None)
    val bid = batchId.toString
    val fp = fingerprintSums(batch, cols).localCheckpoint()
    new graft.store.SnapshotTable(spark, s"$storeDir/items")
      .appendReplacing(fp.withColumn("batch_id", lit(bid)),
        "batch_id", Seq(bid))
    if (Profile.shouldCheckFold(batchId, maxEpochs))
      foldFingerprintStore(spark, storeDir, maxEpochs)
  }

  /** The merged view of a [[fingerprintIncrementalBatch]] store:
    * `(n_rows, fp_hi, fp_lo)` summed across every registered epoch —
    * identical to [[corpusFingerprint]] over the concatenated batches
    * (an empty or missing store reads n_rows = 0 with null sums, the
    * empty-input surface). Compare against a batch recompute to
    * certify a stream lost or duplicated nothing. */
  def fingerprintView(
      spark: org.apache.spark.sql.SparkSession,
      storeDir: String): DataFrame =
    new graft.store.SnapshotTable(spark, s"$storeDir/items")
      .read().getOrElse(spark.emptyDataFrame.select(
        lit(null).cast("long").as("n_rows"),
        lit(null).cast("decimal(38,0)").as("fp_hi_sum"),
        lit(null).cast("decimal(38,0)").as("fp_lo_sum")))
      .agg(coalesce(sum("n_rows"), lit(0L)).as("n_rows"),
        sum("fp_hi_sum").cast("decimal(38,0)").as("__hi"),
        sum("fp_lo_sum").cast("decimal(38,0)").as("__lo"))
      .select(col("n_rows"),
        when(col("n_rows") > 0, col("__hi").cast("string")).as("fp_hi"),
        when(col("n_rows") > 0, col("__lo").cast("string")).as("fp_lo"))

  /** The per-epoch timeline of a [[fingerprintIncrementalBatch]] store:
    * `batch_id | n_rows | fp_hi | fp_lo`, real epochs only (the
    * consolidated sentinel segment aggregates FOLDED epochs, not a
    * point on the timeline) — "which batch changed the corpus?"
    * without rescanning any data. */
  def fingerprintTimeline(
      spark: org.apache.spark.sql.SparkSession,
      storeDir: String): DataFrame =
    new graft.store.SnapshotTable(spark, s"$storeDir/items")
      .read().getOrElse(spark.emptyDataFrame.select(
        lit(null).cast("long").as("n_rows"),
        lit(null).cast("decimal(38,0)").as("fp_hi_sum"),
        lit(null).cast("decimal(38,0)").as("fp_lo_sum"),
        lit(null).cast("string").as("batch_id")))
      .where(col("batch_id").isNotNull &&
        col("batch_id") =!= Profile.FoldedEpochId)
      .select(col("batch_id"), col("n_rows"),
        col("fp_hi_sum").cast("string").as("fp_hi"),
        col("fp_lo_sum").cast("string").as("fp_lo"))

  private[graft] def foldFingerprintStore(
      spark: org.apache.spark.sql.SparkSession,
      storeDir: String,
      maxEpochs: Int): Unit = {
    val table = new graft.store.SnapshotTable(spark, s"$storeDir/items")
    table.read().foreach { items =>
      val foldIds = Profile.foldableEpochs(items, maxEpochs)
      if (foldIds.nonEmpty) {
        val foldKeys = foldIds.map(_.toString) :+ Profile.FoldedEpochId
        val old = items.where(col("batch_id").isin(foldKeys: _*))
        val kept = items.where(!col("batch_id").isin(foldKeys: _*))
        val merged = old.agg(
            coalesce(sum("n_rows"), lit(0L)).as("n_rows"),
            sum("fp_hi_sum").cast("decimal(38,0)").as("fp_hi_sum"),
            sum("fp_lo_sum").cast("decimal(38,0)").as("fp_lo_sum"))
          .select(col("n_rows"), col("fp_hi_sum"), col("fp_lo_sum"),
            lit(Profile.FoldedEpochId).as("batch_id"))
        Profile.advanceFoldWatermark(spark, storeDir, foldIds)
        table.overwrite(kept.unionByName(merged))
      }
    }
  }
}
