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

  test("association: perfect dependence reads V=1/NMI=1, independence " +
      "reads ~0; hand-computed 2x2; nulls are categories") {
    // perfectly dependent: b determined by a (2x2, diagonal only)
    val dep = (Seq.fill(6)(("x", "p")) ++ Seq.fill(4)(("y", "q")))
      .toDF("a", "b")
    val d = Profile.association(dep, "a", "b").collect().head
    assert(d.getLong(0) == 10L && d.getLong(2) == 1L)
    assert(d.getDouble(3) == 1.0, s"V=${d.getDouble(3)}")   // cramers_v
    assert(d.getDouble(5) == 1.0, s"NMI=${d.getDouble(5)}")
    // chi2 for a perfect 6/4 2x2 split = n = 10
    assert(math.abs(d.getDouble(1) - 10.0) < 1e-6)
    // mi = H(a) = -(0.6 ln 0.6 + 0.4 ln 0.4)
    val hA = -(0.6 * math.log(0.6) + 0.4 * math.log(0.4))
    assert(math.abs(d.getDouble(4) - hA) < 1e-6)

    // independent by construction: balanced cross product
    val ind = (for { a <- Seq("x", "y"); b <- Seq("p", "q");
      _ <- 1 to 25 } yield (a, b)).toDF("a", "b")
    val i = Profile.association(ind, "a", "b").collect().head
    assert(i.getDouble(1) == 0.0 && i.getDouble(3) == 0.0 &&
      i.getDouble(4) == 0.0)

    // absent-cell closed form: 2x2 with one empty cell,
    // hand-computed chi2 = sum over ALL 4 cells
    val sparse = (Seq.fill(4)(("x", "p")) ++ Seq.fill(2)(("x", "q")) ++
      Seq.fill(4)(("y", "q"))).toDF("a", "b")
    val s = Profile.association(sparse, "a", "b").collect().head
    // marginals: ra(x)=6 ra(y)=4, cb(p)=4 cb(q)=6, n=10
    val chi2 = Seq((4.0, 6.0 * 4 / 10), (2.0, 6.0 * 6 / 10),
      (0.0, 4.0 * 4 / 10), (4.0, 4.0 * 6 / 10))
      .map { case (o, e) => (o - e) * (o - e) / e }.sum
    assert(math.abs(s.getDouble(1) - chi2) < 1e-6,
      s"chi2=${s.getDouble(1)} want $chi2")

    // nulls are categories: dof counts the null row/col
    val withNull = Seq(("x", "p"), ("x", "p"), (null, "q"), (null, "q"))
      .toDF("a", "b")
    val nv = Profile.association(withNull, "a", "b").collect().head
    assert(nv.getLong(2) == 1L && nv.getDouble(3) == 1.0)

    // constant column: dof 0, V 0, NMI 0
    val const = Seq(("x", "p"), ("x", "q")).toDF("a", "b")
    val c = Profile.association(const, "a", "b").collect().head
    assert(c.getLong(2) == 0L && c.getDouble(3) == 0.0 &&
      c.getDouble(5) == 0.0)
  }

  test("informationGain: per-feature MI matches association's mi/nmi " +
      "computed one feature at a time; null feature values count") {
    val df = Seq(
      ("x", "p", null.asInstanceOf[String], "hi"),
      ("x", "p", "m", "hi"), ("x", "q", "m", "hi"),
      ("y", "q", "m", "lo"), ("y", "q", null.asInstanceOf[String], "lo"),
      ("y", "p", "m", "lo")
    ).toDF("f1", "f2", "f3", "label")
    val sweep = Profile.informationGain(df, Seq("f1", "f2", "f3"),
        "label")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    assert(sweep.keySet == Set("f1", "f2", "f3"))
    for (f <- Seq("f1", "f2", "f3")) {
      val one = Profile.association(df, f, "label").collect().head
      assert(sweep(f)._1 == one.getDouble(4),
        s"$f mi sweep=${sweep(f)._1} assoc=${one.getDouble(4)}")
      assert(sweep(f)._2 == one.getDouble(5),
        s"$f nmi sweep=${sweep(f)._2} assoc=${one.getDouble(5)}")
      assert(sweep(f)._3 == 6L)
    }
    // f1 determines label perfectly -> nmi 1
    assert(sweep("f1")._2 == 1.0)
  }

  test("quantileTransform: exact equals windowed cume_dist; ties share " +
      "a rank; nulls stay null; approx within 1/grid + sketch error") {
    val df = ((0 until 400).map(i =>
        (i.toLong, Some((i % 100).toDouble))) :+ ((400L, None)))
      .toDF("id", "v")
    val got = Profile.quantileTransform(df, "v")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    // windowed oracle on the 400 non-null rows: 4 ties per value,
    // cume_dist(v=k) = 4(k+1)/400
    for (k <- Seq(0, 37, 99)) {
      val want = 4.0 * (k + 1) / 400
      val ids = (0 until 400).filter(_ % 100 == k).map(_.toLong)
      ids.foreach { id =>
        assert(math.abs(got(id).get - want) < 1e-12,
          s"id=$id got=${got(id)} want=$want") }
    }
    assert(got(400L).isEmpty, "null value must transform to null")

    // approx: rank within 1/grid + epsilon of exact on a smooth column
    val smooth = (0 until 2000).map(i => (i.toLong, i.toDouble))
      .toDF("id", "v")
    val ex = Profile.quantileTransform(smooth, "v")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val ap = Profile.quantileTransform(smooth, "v", approx = true,
        grid = 50)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val worst = ex.keys.map(k => math.abs(ex(k) - ap(k))).max
    assert(worst <= 0.025 + 1e-9, s"worst approx gap $worst")

    // collision guard
    intercept[IllegalArgumentException] {
      Profile.quantileTransform(smooth.withColumn("v_q", lit(1)), "v")
    }
  }

  test("spearman: monotone = 1, reversed = -1, hand-computed ties, " +
      "rescale-invariant, nulls ignored, constant column undefined") {
    import spark.implicits._
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val mono = Seq((1.0, 10.0), (2.0, 20.0), (3.0, 25.0), (4.0, 90.0))
      .toDF("a", "b")
    val m = Profile.spearman(mono, "a", "b").head()
    assert(m.getLong(0) == 4L && m.getDouble(1) == 1.0)
    val rev = Profile.spearman(
      Seq((1.0, 9.0), (2.0, 7.0), (3.0, 3.0)).toDF("a", "b"), "a", "b")
      .head()
    assert(rev.getDouble(1) == -1.0)

    // hand-computed with ties: a = 1,2,2,4  b = 10,20,20,5
    // ranks a: 1, 2.5, 2.5, 4;  b: 2, 3.5, 3.5, 1
    val tied = Seq((1.0, 10.0), (2.0, 20.0), (2.0, 20.0), (4.0, 5.0))
      .toDF("a", "b")
    val ra = Seq(1.0, 2.5, 2.5, 4.0)
    val rb = Seq(2.0, 3.5, 3.5, 1.0)
    val n = 4.0
    val num = n * ra.zip(rb).map { case (x, y) => x * y }.sum -
      ra.sum * rb.sum
    val den = math.sqrt(n * ra.map(x => x * x).sum - ra.sum * ra.sum) *
      math.sqrt(n * rb.map(y => y * y).sum - rb.sum * rb.sum)
    val t = Profile.spearman(tied, "a", "b").head()
    assert(t.getDouble(1) == r6(num / den))

    // invariant under any monotone rescale of either side
    val rescaled = Profile.spearman(
      tied.select((col("a") * 1000 + 7).as("a"), exp(col("b")).as("b")),
      "a", "b").head()
    assert(rescaled.getDouble(1) == t.getDouble(1))

    // null on either side drops the row
    val withNull = tied.union(Seq((null.asInstanceOf[java.lang.Double],
        java.lang.Double.valueOf(1.0)))
      .map { case (x, y) => (x: java.lang.Double, y) }.toDF("a", "b"))
    assert(Profile.spearman(withNull, "a", "b").head() == t)

    // zero variance on a side -> division by zero -> null, not garbage
    val const = Seq((1.0, 5.0), (2.0, 5.0)).toDF("a", "b")
    assert(Profile.spearman(const, "a", "b").head().isNullAt(1))
  }
}
