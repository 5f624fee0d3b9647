package graft

import org.apache.spark.sql.functions._

import graft.operators.Validate

/** Declarative data-quality gate: per-rule counts in one pass, null
  * semantics (a null never silently passes a value rule), uniqueness
  * accounting, quarantine labeling, and the loud-failure contracts. */
class ValidateSpec extends GraftSuite {
  import spark.implicits._

  private val frame = Seq(
    // (id, price, status, tag)
    (1L, 50.0, "O", "1-URGENT"),
    (2L, -5.0, "F", "2-HIGH"),
    (3L, Double.NaN, "X", "9-BAD"),
    (4L, 120.0, null.asInstanceOf[String], "3-MEDIUM"),
    (5L, 80.0, "O", null.asInstanceOf[String])
  ).toDF("id", "price", "status", "tag")
    // NaN -> null for the range rule's null-fails contract
    .withColumn("price", when(isnan(col("price")),
      lit(null).cast("double")).otherwise(col("price")))

  private val rules = Seq(
    Validate.notNull("status"),
    Validate.inRange("price", 0.0, 100.0),
    Validate.inSet("status", Seq("O", "F")),
    Validate.matchesRegex("tag", "[1-3]-[A-Z]+"))

  test("check: one row per rule, violations count false OR null tests") {
    val got = Validate.check(frame, rules)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("not_null(status)", 1L, 5L),       // row 4
      ("in_range(price)", 3L, 5L),        // -5, null(NaN), 120
      ("in_set(status)", 2L, 5L),         // X, null
      ("matches_regex(tag)", 2L, 5L)))    // 9-BAD, null
  }

  test("checkUnique: counts rows beyond the first per duplicated key; " +
      "null keys exempt") {
    val df = Seq(Some(1L), Some(1L), Some(1L), Some(2L), None, None)
      .toDF("k")
    val got = Validate.checkUnique(df, "k").collect().head
    assert((got.getString(0), got.getLong(1), got.getLong(2)) ==
      ("unique(k)", 2L, 6L))
  }

  test("quarantine: failed rule names in rule order, is_valid flags") {
    val got = Validate.quarantine(frame, rules)
      .select(col("id"), col("violations"), col("is_valid"))
      .collect().map(r =>
        (r.getLong(0), r.getSeq[String](1).toList, r.getBoolean(2)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, Nil, true),
      (2L, List("in_range(price)"), false),
      (3L, List("in_range(price)", "in_set(status)",
        "matches_regex(tag)"), false),
      (4L, List("not_null(status)", "in_range(price)",
        "in_set(status)"), false),
      (5L, List("matches_regex(tag)"), false)))
  }

  test("matchesRegex anchors: partial matches do not pass") {
    val df = Seq("ab", "abc", "xab").toDF("s")
    val got = Validate.check(df, Seq(Validate.matchesRegex("s", "ab")))
      .collect().head
    assert(got.getLong(1) == 2L) // only the exact "ab" passes
  }

  test("loud contracts: duplicate rule names and colliding output " +
      "columns throw") {
    val df = Seq(1).toDF("x")
    intercept[IllegalArgumentException] {
      Validate.check(df, Seq(
        Validate.satisfies("r", col("x") > 0),
        Validate.satisfies("r", col("x") < 9)))
    }
    intercept[IllegalArgumentException] {
      Validate.quarantine(df.withColumn("is_valid", lit(true)),
        Seq(Validate.notNull("x")))
    }
  }
}
