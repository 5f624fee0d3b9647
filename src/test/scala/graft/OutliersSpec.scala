package graft

import org.apache.spark.sql.functions._

import graft.operators.Profile

/** Robust (median/MAD) outlier detection: hand-checked modified z-scores,
  * group scoping, degenerate-scale and null handling, row preservation,
  * and exact-vs-sketch median agreement on separated data. */
class OutliersSpec extends GraftSuite {
  import spark.implicits._

  test("modified z-score flags the planted outlier and only it") {
    // median 10, residuals {0,1,1,2,2,90} -> MAD ~ 1.5
    val df = Seq(8.0, 9.0, 10.0, 11.0, 12.0, 100.0).map(("g", _))
      .toDF("g", "v")
    val got = Profile.outliers(df, "v", Seq("g"), z = 3.5)
      .select("v", "is_outlier")
      .collect().map(r => (r.getDouble(0), r.getBoolean(1))).toMap
    assert(got(100.0))
    assert(Seq(8.0, 9.0, 10.0, 11.0, 12.0).forall(!got(_)))
  }

  test("groups score independently; a degenerate (MAD = 0) group flags " +
      "nothing and keeps its rows") {
    val df = (Seq.fill(5)(("const", 7.0)) ++
      Seq(("spread", 1.0), ("spread", 2.0), ("spread", 3.0),
        ("spread", 500.0))).toDF("g", "v")
    val got = Profile.outliers(df, "v", Seq("g"), z = 3.0)
    assert(got.count() == 9, "all rows preserved")
    val const = got.where(col("g") === "const")
      .select("robust_z", "is_outlier").collect()
    assert(const.forall(r => r.isNullAt(0) && !r.getBoolean(1)))
    val flagged = got.where(col("g") === "spread" && col("is_outlier"))
      .select("v").collect().map(_.getDouble(0))
    assert(flagged.toSeq == Seq(500.0))
  }

  test("null values keep their rows with null z; all-null groups survive " +
      "the left joins") {
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", None),
      ("b", None), ("b", None)).toDF("g", "v")
    val got = Profile.outliers(df, "v", Seq("g"), z = 3.0)
    assert(got.count() == 5)
    assert(got.where(col("v").isNull).collect()
      .forall(r => r.isNullAt(r.fieldIndex("robust_z")) &&
        !r.getBoolean(r.fieldIndex("is_outlier"))))
  }

  test("global scope (no keys) works, and the sketch path agrees with " +
      "exact on separated data") {
    val rng = new scala.util.Random(31)
    val df = (Seq.fill(500)(rng.nextDouble()) ++ Seq(1e6, -1e6)).toDF("v")
    val exact = Profile.outliers(df, "v", Nil, z = 5.0)
      .where(col("is_outlier")).select("v")
    val approx = Profile.outliers(df, "v", Nil, z = 5.0,
        approx = true, k = 2048)
      .where(col("is_outlier")).select("v")
    assertSameRows(approx, exact)
    assert(exact.count() == 2)
  }

  test("reserved output names collide loudly") {
    intercept[IllegalArgumentException] {
      Profile.outliers(Seq(1.0).toDF("is_outlier"), "is_outlier")
    }
  }

  test("winsorize clips to the per-group quantile band; nulls stay null; " +
      "rows preserved") {
    val df = (Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("a", Some(4.0)), ("a", Some(100.0)), ("a", None)) ++
      (1 to 5).map(i => ("b", Some(i * 10.0)))).toDF("g", "v")
    val got = Profile.winsorize(df, "v", Seq("g"),
        loProb = 0.25, hiProb = 0.75)
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) null else r.getDouble(1),
        if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(got.length == 11)
    // group a non-null values (1,2,3,4,100): q25 = 2, q75 = 4
    val a = got.filter(_._1 == "a").map(t => (t._2, t._3)).toMap
    assert(a(1.0) == 2.0 && a(2.0) == 2.0 && a(3.0) == 3.0 &&
      a(4.0) == 4.0 && a(100.0) == 4.0)
    assert(a(null) == null, "null value must stay null, not become a cut")
    // group b (10..50): q25 = 20, q75 = 40
    val b = got.filter(_._1 == "b").map(t => (t._2, t._3)).toMap
    assert(b(10.0) == 20.0 && b(30.0) == 30.0 && b(50.0) == 40.0)
  }

  test("winsorize: sketch path agrees with exact on the flagged band " +
      "for separated data; global scope works") {
    val df = ((1 to 100).map(_.toDouble) ++ Seq(1e9, -1e9)).toDF("v")
    val exact = Profile.winsorize(df, "v", Nil, 0.05, 0.95)
      .agg(min("v_wins"), max("v_wins")).collect().head
    // tails must be capped well inside the planted extremes
    assert(math.abs(exact.getDouble(0)) < 1e3 &&
      math.abs(exact.getDouble(1)) < 1e3)
    val approx = Profile.winsorize(df, "v", Nil, 0.05, 0.95,
        approx = true, k = 1024)
      .agg(min("v_wins"), max("v_wins")).collect().head
    assert(math.abs(approx.getDouble(0)) < 1e3 &&
      math.abs(approx.getDouble(1)) < 1e3)
  }

  test("plan shape: sketch-path outliers/standardize serve through " +
      "broadcast joins - no sort-merge exchange of the big side, no window") {
    val df = (1 to 1000).map(i => (s"k${i % 3}", i.toDouble)).toDF("g", "v")
    for (plan <- Seq(
        Profile.outliers(df, "v", Seq("g"), z = 3.5, approx = true)
          .queryExecution.executedPlan.toString,
        Profile.standardize(df, "v", Seq("g"), robust = true,
          approx = true).queryExecution.executedPlan.toString,
        Profile.winsorize(df, "v", Seq("g"))
          .queryExecution.executedPlan.toString)) {
      assert(plan.contains("BroadcastHashJoin") ||
        plan.contains("BroadcastNestedLoopJoin"),
        s"stats must serve via broadcast:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        s"big side must not exchange for a one-row-per-key join:\n$plan")
      assert(!plan.contains("Window"), s"window-free contract:\n$plan")
    }
  }

  test("standardize: robust scaling hand-checked; degenerate scale and " +
      "nulls yield null, rows preserved; classic path matches avg/stddev") {
    val df = Seq(("g", Some(1.0)), ("g", Some(2.0)), ("g", Some(3.0)),
      ("g", Some(4.0)), ("g", None), ("c", Some(7.0)), ("c", Some(7.0)))
      .toDF("k", "v")
    val got = Profile.standardize(df, "v", Seq("k"), robust = true)
    assert(got.count() == 7, "all rows preserved")
    // g: median 2.5, residuals {1.5,.5,.5,1.5} -> mad 1.0 -> scale 1.4826
    val gVals = got.where(col("k") === "g" && col("v") === 4.0)
      .select("v_std").collect().head.getDouble(0)
    assert(math.abs(gVals - 1.5 / 1.4826) < 1e-12)
    // constant group: scale 0 -> null, not Infinity
    assert(got.where(col("k") === "c").collect()
      .forall(_.isNullAt(2)))
    assert(got.where(col("v").isNull).collect().forall(_.isNullAt(2)))
    // classic path: (v - mean) / stddev_samp
    val classic = Profile.standardize(
      Seq(2.0, 4.0, 6.0).toDF("v"), "v", Nil)
      .select("v_std").collect().map(_.getDouble(0)).sorted
    assert(classic.zip(Seq(-1.0, 0.0, 1.0))
      .forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }
}
