package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality gate: expectation rules checked in ONE pass,
  * producing either a per-rule violation report or a row-level
  * quarantine split — the contract check every ingest of a 100 TB lake
  * needs before bad shards poison downstream training data.
  *
  * Scale shape: all row-local rules (`notNull`, `inRange`, `inSet`,
  * `matchesRegex`, `satisfies`) compile to plain codegen'd boolean
  * columns and fold into ONE aggregate scan — no per-rule jobs, no
  * second read. `unique` rules are inherently global and each adds one
  * map-side-combined `groupBy(key)` aggregate over the key only (column
  * pruned), reported as "rows beyond the first per duplicated key".
  * [[quarantine]] never aggregates at all: a per-row `violations` array
  * is built by a codegen'd filter over literal rule names, so the
  * pass/fail split is a pure narrow map.
  *
  * Ref parity note: the reference has no validation operator; this
  * extends the ingest surface per the training-data-ops mandate
  * (SURVEY §2 addendum).
  */
object Validate {

  private def qcol(name: String): Column =
    col("`" + name.replace("`", "``") + "`")

  /** One expectation. `test` is TRUE when a row PASSES (nulls in the
    * test result count as failures unless the rule says otherwise). */
  final case class Rule(name: String, test: Column)

  /** `col IS NOT NULL`. */
  def notNull(c: String): Rule =
    Rule(s"not_null($c)", qcol(c).isNotNull)

  /** `lo <= col <= hi`; nulls fail (pair with [[notNull]] if a column
    * is optional — a null is never silently in range). */
  def inRange(c: String, lo: Double, hi: Double): Rule =
    Rule(s"in_range($c)", qcol(c).cast("double").between(lo, hi))

  /** Membership in a literal set; nulls fail. */
  def inSet(c: String, values: Seq[String]): Rule =
    Rule(s"in_set($c)", qcol(c).cast("string").isin(values: _*))

  /** Full-match against `pattern` (anchored RLIKE); nulls fail. */
  def matchesRegex(c: String, pattern: String): Rule =
    Rule(s"matches_regex($c)",
      coalesce(qcol(c).cast("string").rlike("^(?:" + pattern + ")$"),
        lit(false)))

  /** Arbitrary boolean expectation under an explicit name; null results
    * fail (`coalesce(test, false)` is applied at check time). */
  def satisfies(name: String, test: Column): Rule = Rule(name, test)

  /** Per-rule violation report over row-local rules: `rule |
    * n_violations | n_rows`, one row per rule in rule order, computed in
    * ONE aggregate pass. A row violates a rule when the rule's test is
    * false OR null. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule required")
    require(rules.map(_.name).distinct.length == rules.length,
      "rule names must be unique: " + rules.map(_.name).mkString(", "))
    val aggs = rules.zipWithIndex.map { case (r, i) =>
      count(when(!coalesce(r.test, lit(false)), 1)).as(s"__v_$i")
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = array(rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"), col(s"__v_$i").as("n_violations"),
        col("__n").as("n_rows"))
    }: _*)
    one.select(inline(rows.as("__r")))
  }

  /** Uniqueness report for one key: `rule | n_violations | n_rows` where
    * `n_violations` counts rows BEYOND the first per duplicated key
    * (0 = key is unique) and null keys are exempt (SQL UNIQUE
    * semantics). One column-pruned groupBy aggregate. Union with
    * [[check]]'s output for a combined report. */
  def checkUnique(df: DataFrame, c: String): DataFrame = {
    val perKey = df.where(qcol(c).isNotNull)
      .groupBy(qcol(c)).agg(count(lit(1)).as("__cnt"))
    val nRows = df.agg(count(lit(1)).as("__n"))
    perKey.agg(
        coalesce(sum(col("__cnt") - 1), lit(0L)).as("n_violations"))
      .crossJoin(broadcast(nRows))
      .select(lit(s"unique($c)").as("rule"), col("n_violations"),
        col("__n").as("n_rows"))
  }

  /** Equivalence classes below the k-anonymity threshold: rows are
    * grouped by the quasi-identifier tuple and every class with fewer
    * than `k` members is reported (`quasiCols | n_rows`) — the standard
    * re-identification audit before a corpus with user attributes ships
    * as training data (Sweeney 2002, "k-anonymity: a model for
    * protecting privacy"). Empty result = the table IS k-anonymous on
    * those columns. Nulls group as ordinary values (a null quasi tuple
    * is itself a linkable signature, so it is audited, not exempted).
    *
    * 100 TB shape: ONE column-pruned, map-side-combined
    * `groupBy(quasi)` count plus a post-aggregation filter — the same
    * exchange a `GROUP BY` query on the quasi columns would cost; no
    * join, no window, no driver state. The output is bounded by the
    * number of VIOLATING classes (small for a near-anonymous table;
    * if everything is a singleton the report is the corpus and the
    * right fix is coarser quasi-identifiers, not a bigger driver). */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2 (k=$k never violates)")
    require(!quasiCols.contains("n_rows"),
      "a quasi column may not use the reserved output name n_rows")
    df.groupBy(quasiCols.map(qcol): _*)
      .agg(count(lit(1)).as("n_rows"))
      .where(col("n_rows") < k)
  }

  /** Distinct-sensitive-value diversity audit: quasi-identifier classes
    * whose `sensitiveCol` takes fewer than `l` DISTINCT values
    * (`quasiCols | n_rows | n_sensitive`) — k-anonymity's complement
    * (Machanavelli et al. 2007, l-diversity): a class can be large yet
    * still leak when every member shares one sensitive value. Null
    * sensitive values do not count toward diversity (COUNT DISTINCT
    * semantics); classes where the sensitive column is entirely null
    * report `n_sensitive = 0`.
    *
    * 100 TB shape: one `groupBy(quasi)` with a count-distinct aggregate
    * (Spark plans the standard two-phase partial-distinct expand) over
    * the pruned quasi+sensitive columns only; filter after. */
  def lDiversity(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier column")
    require(l >= 2, s"l must be >= 2 (l=$l never violates)")
    require(!quasiCols.contains(sensitiveCol),
      "sensitive column may not also be a quasi-identifier")
    require(!quasiCols.exists(Seq("n_rows", "n_sensitive").contains(_)),
      "a quasi column may not use the reserved output names " +
        "n_rows/n_sensitive")
    df.groupBy(quasiCols.map(qcol): _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(qcol(sensitiveCol)).as("n_sensitive"))
      .where(col("n_sensitive") < l)
  }

  /** Foreign-key orphan audit: child rows whose key tuple has no match
    * in `parent` — `keys` maps child column -> parent column. Rows with
    * ANY null key component are exempt (SQL FK semantics: a null FK is
    * "not asserted", and [[notNull]] is the rule for mandatory keys).
    * Returns the orphan child rows unchanged; wrap in a count or union
    * a [[referentialCheck]] row into a [[check]] report.
    *
    * 100 TB shape: one LEFT ANTI join on the key tuple over a
    * column-pruned, distinct-collapsed parent side — AQE broadcasts the
    * parent when its distinct keys are dimension-sized, else a standard
    * shuffled anti join; either way no data moves twice and the child
    * scan carries only the audited columns plus payload. */
  def referentialOrphans(
      child: DataFrame,
      parent: DataFrame,
      keys: Seq[(String, String)]): DataFrame = {
    require(keys.nonEmpty, "at least one key pair required")
    val asserted = keys.map { case (c, _) => qcol(c).isNotNull }
      .reduce(_ && _)
    // distinct BEFORE the anti join: the join needs parent key EXISTENCE
    // only, and collapsing first keeps the build side minimal
    val parentKeys = parent
      .select(keys.map { case (_, p) => qcol(p) }: _*).distinct()
    val cond = keys.map { case (c, p) =>
      child(c) === parentKeys(p)
    }.reduce(_ && _)
    child.where(asserted).join(parentKeys, cond, "left_anti")
  }

  /** [[referentialOrphans]] folded to one [[check]]-style report row:
    * `rule | n_violations | n_rows` (n_rows = child row count, nulls
    * included — the same denominator every other rule reports). */
  def referentialCheck(
      child: DataFrame,
      parent: DataFrame,
      keys: Seq[(String, String)]): DataFrame = {
    val name = "references(" +
      keys.map { case (c, p) => s"$c->$p" }.mkString(",") + ")"
    val orphans = referentialOrphans(child, parent, keys)
      .agg(count(lit(1)).as("n_violations"))
    val nRows = child.agg(count(lit(1)).as("__n"))
    orphans.crossJoin(broadcast(nRows))
      .select(lit(name).as("rule"), col("n_violations"),
        col("__n").as("n_rows"))
  }

  /** Column-level PII exposure report: for each listed column, how many
    * (non-null, string-rendered) values contain an email address, an
    * IPv4 literal, or a ≥7-digit run — the
    * [[TextAnalysis.redactPii]] pattern family — as
    * `column | n_rows | n_email | n_ip | n_number | frac_email |
    * frac_ip | frac_number` (fractions over non-null rows, rounded to
    * 6; zero rows read 0.0). The "which columns even need redaction"
    * audit that gates a release: run it BEFORE deciding where
    * [[TextAnalysis.redactPii]] must apply, and AFTER redaction as the
    * zero-exposure certificate.
    *
    * 100 TB shape: ONE map-side-combined aggregate computes every
    * (column × pattern) counter in a single scan — codegen'd `RLIKE`
    * predicates, no explode, no shuffle beyond the one-row aggregate;
    * the per-column report rows come from a driver-free `inline`
    * transpose (the [[Profile.correlations]] shape). */
  def piiScan(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column to scan")
    require(cols.distinct.size == cols.size, s"duplicate columns in $cols")
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ip = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
    val num = "[0-9]{7,}"
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      val s = qcol(c).cast("string")
      Seq(count(s).as(s"__n_$i"),
        count(when(s.rlike(email), 1)).as(s"__e_$i"),
        count(when(s.rlike(ip), 1)).as(s"__i_$i"),
        count(when(s.rlike(num), 1)).as(s"__d_$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    def frac(nHits: Column, n: Column): Column =
      round(when(n === 0, 0.0).otherwise(nHits.cast("double") / n), 6)
    val rows = array(cols.zipWithIndex.map { case (c, i) =>
      val (n, e, ipc, d) =
        (col(s"__n_$i"), col(s"__e_$i"), col(s"__i_$i"), col(s"__d_$i"))
      struct(lit(c).as("column"), n.as("n_rows"), e.as("n_email"),
        ipc.as("n_ip"), d.as("n_number"), frac(e, n).as("frac_email"),
        frac(ipc, n).as("frac_ip"), frac(d, n).as("frac_number"))
    }: _*)
    one.select(inline(rows))
  }

  /** Split-leakage audit: groups (near-dup clusters, url domains,
    * users) whose rows landed in MORE than one split — `groupCol |
    * n_splits | n_rows`. Zero rows is the certificate that a
    * train/val/test split is leak-proof at the chosen grain; pair with
    * [[Sampling.splitByGroup]], which guarantees it by construction,
    * or run against any externally-assigned split column to find the
    * contamination a row-hashed split (`Sampling.hashSplit`) inflicts
    * on grouped data. Null split values count as their own split (a
    * row that escaped assignment IS a leak); null groups are exempt
    * (ungrouped rows cannot co-travel).
    *
    * 100 TB shape: one `groupBy(group)` count-distinct over two pruned
    * columns, filter after — the cheapest possible certificate for a
    * property that otherwise surfaces as silent eval contamination. */
  def splitLeakage(
      df: DataFrame,
      groupCol: String,
      splitCol: String): DataFrame = {
    require(groupCol != splitCol, "group and split columns must differ")
    require(!Seq("n_splits", "n_rows").contains(groupCol),
      "the group column may not use the reserved output names " +
        "n_splits/n_rows")
    df.where(qcol(groupCol).isNotNull)
      .groupBy(qcol(groupCol))
      // countDistinct over a struct: struct(null) is a non-null value,
      // so a null split counts as its own distinct assignment with no
      // sentinel string that a real value could alias with
      .agg(countDistinct(struct(qcol(splitCol))).as("n_splits"),
        count(lit(1)).as("n_rows"))
      .where(col("n_splits") > 1)
  }

  /** Incremental quality ledger: fold one micro-batch's [[check]]
    * report into a persistent epoch-keyed store — the state step behind
    * `StreamOps.validateSink`, usable directly from any batch loop.
    * Store grain `rule | n_violations | n_rows | batch_id`; a
    * redelivered epoch REPLACES its own registration
    * (`appendReplacing`) and an epoch at or below the fold watermark
    * drops (already consolidated — the sketch-store replay discipline,
    * see `Profile.foldWatermark`). Past `maxEpochs` registered epochs,
    * aged epochs consolidate into one summed row per rule under the
    * sentinel epoch — counts are plain sums (associative), so the
    * merged view is IDENTICAL across the fold and store size / view
    * cost stay flat in stream lifetime. */
  def checkIncrementalBatch(
      batch: DataFrame,
      rules: Seq[Rule],
      storeDir: String,
      batchId: Long,
      maxEpochs: Int = 64): Unit = {
    val spark = batch.sparkSession
    if (batchId <= Profile.foldWatermark(spark, storeDir)) return
    Stores.register(spark, storeDir, "quality_ledger", Nil, None)
    val bid = batchId.toString
    val report = check(batch, rules).localCheckpoint()
    new graft.store.SnapshotTable(spark, s"$storeDir/items")
      .appendReplacing(
        report.select(col("rule"), col("n_violations"), col("n_rows"),
          lit(bid).as("batch_id")),
        "batch_id", Seq(bid))
    if (Profile.shouldCheckFold(batchId, maxEpochs))
      foldCheckStore(spark, storeDir, maxEpochs)
  }

  /** The merged view of a [[checkIncrementalBatch]] store: one row per
    * rule — `rule | n_violations | n_rows` summed across every
    * registered epoch, identical to [[check]] over the concatenated
    * batches. */
  def checkView(
      spark: org.apache.spark.sql.SparkSession,
      storeDir: String): DataFrame =
    new graft.store.SnapshotTable(spark, s"$storeDir/items")
      .read().getOrElse(spark.emptyDataFrame.select(
        lit(null).cast("string").as("rule"),
        lit(null).cast("long").as("n_violations"),
        lit(null).cast("long").as("n_rows")))
      .groupBy("rule")
      .agg(sum("n_violations").as("n_violations"),
        sum("n_rows").as("n_rows"))
      .where(col("rule").isNotNull)

  /** The per-epoch timeline of a [[checkIncrementalBatch]] store:
    * `batch_id | rule | n_violations | n_rows | violation_frac`, real
    * epochs only (the consolidated sentinel segment is an aggregate of
    * FOLDED epochs, not a point on the timeline) — "did batch 1371
    * suddenly go 40 % null?" without rescanning any data. */
  def checkTimeline(
      spark: org.apache.spark.sql.SparkSession,
      storeDir: String): DataFrame =
    new graft.store.SnapshotTable(spark, s"$storeDir/items")
      .read().getOrElse(spark.emptyDataFrame.select(
        lit(null).cast("string").as("rule"),
        lit(null).cast("long").as("n_violations"),
        lit(null).cast("long").as("n_rows"),
        lit(null).cast("string").as("batch_id")))
      .where(col("batch_id").isNotNull &&
        col("batch_id") =!= Profile.FoldedEpochId)
      .select(col("batch_id").cast("long").as("batch_id"), col("rule"),
        col("n_violations"), col("n_rows"),
        round(col("n_violations").cast("double") /
          greatest(col("n_rows"), lit(1L)), 6).as("violation_frac"))

  /** Bound a [[checkIncrementalBatch]] store: aged epochs' per-rule
    * counts sum into one consolidated row set under the sentinel epoch.
    * Plain-sum consolidation — exact in every regime. */
  private[graft] def foldCheckStore(
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
        val merged = old.groupBy("rule")
          .agg(sum("n_violations").as("n_violations"),
            sum("n_rows").as("n_rows"))
          .select(col("rule"), col("n_violations"), col("n_rows"),
            lit(Profile.FoldedEpochId).as("batch_id"))
        Profile.advanceFoldWatermark(spark, storeDir, foldIds)
        table.overwrite(kept.unionByName(merged))
      }
    }
  }

  /** Row-level gate: appends `violations` (array of failed rule names,
    * rule order, empty = clean) and `is_valid`. Pure codegen'd map —
    * split downstream with `where(col("is_valid"))` /
    * `where(!col("is_valid"))`; both sides reuse one scan. */
  def quarantine(df: DataFrame, rules: Seq[Rule],
      outCol: String = "violations"): DataFrame = {
    require(rules.nonEmpty, "at least one rule required")
    require(rules.map(_.name).distinct.length == rules.length,
      "rule names must be unique: " + rules.map(_.name).mkString(", "))
    require(!df.columns.contains(outCol) && !df.columns.contains("is_valid"),
      s"output columns '$outCol'/'is_valid' collide with input schema")
    val labels = rules.map(r =>
      when(!coalesce(r.test, lit(false)), lit(r.name)))
    val arr = filter(array(labels: _*), _.isNotNull)
    df.withColumn(outCol, arr)
      .withColumn("is_valid", size(col(outCol)) === 0)
  }
}
