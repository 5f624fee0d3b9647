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

  test("kAnonymity: classes below k, nulls group as values") {
    val df = Seq(
      ("en", 25), ("en", 25), ("en", 30),
      ("fr", 25), (null.asInstanceOf[String], 30),
      (null.asInstanceOf[String], 30)
    ).toDF("lang", "age")
    val got = Validate.kAnonymity(df, Seq("lang", "age"), k = 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .toSet
    // (en,25)x2 and (null,30)x2 are k=2-anonymous; singletons violate
    assert(got == Set(("en", 30, 1L), ("fr", 25, 1L)))
    intercept[IllegalArgumentException] {
      Validate.kAnonymity(df, Seq("lang"), k = 1)
    }
  }

  test("lDiversity: distinct sensitive values per class; null " +
      "sensitive does not count as diversity") {
    val df = Seq(
      ("a", "flu"), ("a", "flu"), ("a", "cold"),   // diverse
      ("b", "flu"), ("b", "flu"),                  // 1 distinct -> violates
      ("c", null.asInstanceOf[String])             // 0 distinct -> violates
    ).toDF("zip", "diag")
    val got = Validate.lDiversity(df, Seq("zip"), "diag", l = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == Set(("b", 2L, 1L), ("c", 1L, 0L)))
    intercept[IllegalArgumentException] {
      Validate.lDiversity(df, Seq("diag"), "diag", l = 2)
    }
  }

  test("referentialOrphans/referentialCheck: null FKs exempt, " +
      "multi-column keys, report denominator is all child rows") {
    val child = Seq(
      (1L, Some(10L), Some("x")), (2L, Some(10L), Some("y")),
      (3L, Some(99L), Some("x")), (4L, None, Some("x")),
      (5L, Some(10L), None)
    ).toDF("id", "fk1", "fk2")
    val parent = Seq((10L, "x"), (20L, "y")).toDF("p1", "p2")
    val orphans = Validate.referentialOrphans(child, parent,
        Seq("fk1" -> "p1", "fk2" -> "p2"))
      .select("id").as[Long].collect().sorted
    // 1 matches; 2 (10,y no), 3 (99 no) orphan; 4,5 exempt via null
    assert(orphans.toSeq == Seq(2L, 3L))
    val rep = Validate.referentialCheck(child, parent,
      Seq("fk1" -> "p1", "fk2" -> "p2")).collect().head
    assert((rep.getString(0), rep.getLong(1), rep.getLong(2)) ==
      ("references(fk1->p1,fk2->p2)", 2L, 5L))
  }

  test("splitLeakage: row-hashed split leaks groups, splitByGroup is " +
      "leak-free by construction, null split counts as a split") {
    val docs = (0L until 200L).map(i => (i, s"g${i % 7}"))
      .toDF("id", "grp")
    val leaky = graft.operators.Sampling
      .hashSplit(docs, "id", Seq(0.5, 0.5))
    assert(Validate.splitLeakage(leaky, "grp", "split_id").count() > 0)
    val tight = graft.operators.Sampling
      .splitByGroup(docs, "grp", Seq(0.5, 0.5))
    assert(Validate.splitLeakage(tight, "grp", "split_id").count() == 0)
    // a null split_id is its own split: group g0 with one assigned and
    // one unassigned row leaks
    val mixed = Seq(("a", Some(0)), ("a", None), ("b", Some(1)))
      .toDF("grp", "split_id")
    val got = Validate.splitLeakage(mixed, "grp", "split_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("a", 2L)))
  }

  test("piiScan: per-column email/ip/number hit counts hand-checked; " +
      "nulls excluded from the base; redacted text certifies zero") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Some("write to bob@example.com now"), Some("10.1.2.3")),
      (Some("account 12345678 flagged"), Some("clean")),
      (Some("nothing here"), None),
      (None, Some("also bob@x.org and 1234567"))
    ).toDF("a", "b")
    val got = Validate.piiScan(df, Seq("a", "b"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // a: 3 non-null; 1 email, 0 ip, 1 long number
    assert(got("a") == ((3L, 1L, 0L, 1L)), got.toString)
    // b: 3 non-null; 1 email, 1 ip, 1 long number
    assert(got("b") == ((3L, 1L, 1L, 1L)), got.toString)
    // the audit after redaction reads zero exposure (the certificate)
    val redacted = df.select(
      graft.operators.TextAnalysis.redactPii(col("a")).as("a"),
      graft.operators.TextAnalysis.redactPii(col("b")).as("b"))
    val zero = Validate.piiScan(redacted, Seq("a", "b"))
      .agg(sum("n_email") + sum("n_ip") + sum("n_number"))
      .first().getLong(0)
    assert(zero == 0L, s"redacted corpus must scan clean, got $zero hits")
    intercept[IllegalArgumentException] {
      Validate.piiScan(df, Seq("a", "a"))
    }
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
