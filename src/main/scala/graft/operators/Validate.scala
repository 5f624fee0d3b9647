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
