package graft

import org.apache.spark.sql.functions._

import graft.operators.Profile

/** One-pass correlation profile and chi-square homogeneity (r10): both
  * against hand-computed references, null handling pinned. */
class ProfileStatsSpec extends GraftSuite {
  import spark.implicits._

  test("correlations: exact Pearson on a hand-checkable frame, co-null " +
      "counts, degenerate pair renders null") {
    val df = Seq[(java.lang.Double, java.lang.Double, java.lang.Double)](
      (1.0, 2.0, 5.0), (2.0, 4.0, 5.0), (3.0, 6.0, 5.0),
      (4.0, 8.0, 5.0), (5.0, null, 5.0))
      .toDF("a", "b", "c")
    val got = Profile.correlations(df, Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getLong(3)))
      .toMap
    // b = 2a exactly on the 4 co-non-null rows
    assert(got(("a", "b")) == ((Some(1.0), 4L)))
    // c constant: zero variance, corr undefined -> null
    assert(got(("a", "c")) == ((None, 5L)))
    assert(got(("b", "c")) == ((None, 4L)))
    // anti-correlated check on a second frame
    val df2 = (1 to 100).map(i => (i.toDouble, -2.0 * i + 7)).toDF("x", "y")
    val r = Profile.correlations(df2, Seq("x", "y")).collect().head
    assert(r.getDouble(2) == -1.0 && r.getLong(3) == 100L)
  }

  test("chiSquareCategorical: hand-computed 2x2 statistic; identical " +
      "mixes score ~0; dof counts categories") {
    // ref: 30 A, 10 B; cur: 10 A, 30 B. Expected per cell = 20.
    // chi2 = 4 * (10^2 / 20) = 20
    val ref = (Seq.fill(30)("A") ++ Seq.fill(10)("B")).toDF("c")
    val cur = (Seq.fill(10)("A") ++ Seq.fill(30)("B")).toDF("c")
    val got = Profile.chiSquareCategorical(ref, cur, "c").collect().head
    assert(got.getDouble(0) == 20.0, s"chi2 ${got.getDouble(0)}")
    assert(got.getLong(1) == 1L && got.getLong(2) == 40L && got.getLong(3) == 40L)
    // identical mixes: statistic exactly 0
    val same = Profile.chiSquareCategorical(ref, ref, "c").collect().head
    assert(same.getDouble(0) == 0.0)
    // null is a category; dof = categories - 1
    val r3 = (Seq("A", "B", null) ++ Seq.fill(7)("A")).toDF("c")
    val c3 = (Seq("A", "C") ++ Seq.fill(8)("B")).toDF("c")
    val g3 = Profile.chiSquareCategorical(r3, c3, "c").collect().head
    assert(g3.getLong(1) == 3L, s"A/B/C/null => dof 3, got ${g3.getLong(1)}")
  }
}
