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
}
