package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Edit-distance self-join: randomized differential against a driver-side
  * Levenshtein DP over every pair (exact recall — the q-gram pigeonhole
  * plus short-string band join must lose NOTHING), short-string routing,
  * boilerplate-prefix saturation correctness, and null handling. */
class FuzzyJoinSpec extends GraftSuite {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0)
      dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  private def allPairs(strs: Seq[(Long, String)], d: Int) =
    (for {
      (ia, sa) <- strs; (ib, sb) <- strs
      if ia < ib
      dist = lev(sa, sb)
      if dist <= d
    } yield (ia, ib, dist)).toSet

  private def mutate(s: String, n: Int, rng: scala.util.Random): String = {
    var cur = s
    (1 to n).foreach { _ =>
      val ops = rng.nextInt(3)
      val pos = rng.nextInt(math.max(cur.length, 1))
      val ch = ('a' + rng.nextInt(26)).toChar
      cur = ops match {
        case 0 if cur.nonEmpty => cur.updated(pos, ch) // substitute
        case 1 => cur.take(pos) + ch + cur.drop(pos)   // insert
        case _ if cur.nonEmpty => cur.take(pos) + cur.drop(pos + 1) // delete
        case _ => cur + ch
      }
    }
    cur
  }

  test("randomized differential: exact recall and precision vs all-pairs " +
      "DP, across (maxDist, q) settings") {
    val rng = new scala.util.Random(29)
    val bases = Seq.fill(30)(
      (1 to 8 + rng.nextInt(10)).map(_ => ('a' + rng.nextInt(6)).toChar)
        .mkString)
    val strs = bases.zipWithIndex.flatMap { case (b, i) =>
      Seq((i * 10L, b), (i * 10L + 1, mutate(b, 1 + rng.nextInt(3), rng)))
    }
    val df = strs.toDF("id", "s")
    for (d <- Seq(1, 2, 3); q <- Seq(2, 3)) {
      val got = Dedup.editDistancePairs(df, "id", "s", d, q)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == allPairs(strs, d), s"maxDist=$d q=$q")
    }
  }

  test("short strings (below the gram-survival bound) route through the " +
      "band join with exact results") {
    val strs = Seq((1L, "ab"), (2L, "ac"), (3L, "b"), (4L, "abc"),
      (5L, "xy"), (6L, ""), (7L, "a"))
    val df = strs.toDF("id", "s")
    for (d <- Seq(1, 2)) {
      val got = Dedup.editDistancePairs(df, "id", "s", d, q = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == allPairs(strs, d), s"maxDist=$d")
    }
  }

  test("boilerplate-prefix saturation stays CORRECT (the scale note is " +
      "about cost): Customer#-style ids pair exactly") {
    val strs = (0 until 40).map(i => (i.toLong, f"Customer#$i%09d"))
    val df = strs.toDF("id", "s")
    val got = Dedup.editDistancePairs(df, "id", "s", maxDist = 1, q = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == allPairs(strs, 1))
  }

  test("maxDist = 0 fails loudly toward the exact-dedup operators") {
    val df = Seq((1L, "a")).toDF("id", "s")
    val e = intercept[IllegalArgumentException] {
      Dedup.editDistancePairs(df, "id", "s", maxDist = 0)
    }
    assert(e.getMessage.contains("exact"))
  }

  test("null texts never match; dist 0 exact duplicates are included") {
    val df = Seq((1L, "same"), (2L, "same"), (3L, null.asInstanceOf[String]))
      .toDF("id", "s")
    val got = Dedup.editDistancePairs(df, "id", "s", maxDist = 1, q = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == Seq((1L, 2L, 0)))
  }
}
