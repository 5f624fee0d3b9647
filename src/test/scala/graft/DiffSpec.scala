package graft

import org.apache.spark.sql.functions._

import graft.operators.{Diff, Profile}

/** Corpus snapshot diff + corpus overlap: change classification,
  * null-safe column comparison, hash-compare equivalence, summary
  * stability, and the HLL overlap path's error envelope. */
class DiffSpec extends GraftSuite {
  import spark.implicits._

  private val oldDf = Seq(
    (1L, Some("alpha"), Some("en")),   // unchanged
    (2L, Some("beta"), Some("en")),    // text changes
    (3L, Some("gamma"), Some("fr")),   // removed in new
    (4L, None: Option[String], Some("de")), // null -> value = changed
    (6L, Some("zeta"), None: Option[String]) // lang null both = unchanged
  ).toDF("id", "text", "lang")

  private val newDf = Seq(
    (1L, Some("alpha"), Some("en")),
    (2L, Some("beta2"), Some("en")),
    (4L, Some("delta"), Some("de")),
    (5L, Some("epsilon"), Some("es")), // added
    (6L, Some("zeta"), None: Option[String])
  ).toDF("id", "text", "lang")

  test("snapshotDiff: added/removed/changed with per-column " +
      "attribution; null-safe compares; unchanged excluded by default") {
    val got = Diff.snapshotDiff(oldDf, newDf, "id", Seq("text", "lang"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getSeq[String](2)).map(_.toList).orNull))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (2L, "changed", List("text")),
      (3L, "removed", Nil),
      (4L, "changed", List("text")),
      (5L, "added", Nil)))
  }

  test("snapshotDiff: includeUnchanged adds the identical rows with " +
      "empty changed_cols") {
    val got = Diff.snapshotDiff(oldDf, newDf, "id", Seq("text", "lang"),
        includeUnchanged = true)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, "unchanged"), (2L, "changed"),
      (3L, "removed"), (4L, "changed"), (5L, "added"),
      (6L, "unchanged")))
  }

  test("snapshotDiff hashCompare: same change classification, null " +
      "changed_cols (digest cannot attribute)") {
    val cols = Diff.snapshotDiff(oldDf, newDf, "id", Seq("text", "lang"),
        includeUnchanged = true)
      .select("id", "change")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val hashed = Diff.snapshotDiff(oldDf, newDf, "id",
        Seq("text", "lang"), includeUnchanged = true, hashCompare = true)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.isNullAt(2)))
      .sortBy(_._1)
    assert(hashed.map(t => (t._1, t._2)).toSeq == cols.toSeq)
    assert(hashed.forall(_._3), "hashCompare must null changed_cols")
    // digest null-sentinel: null text vs empty-string text IS a change
    val a = Seq((1L, None: Option[String])).toDF("id", "text")
    val b = Seq((1L, Some(""))).toDF("id", "text")
    val d = Diff.snapshotDiff(a, b, "id", Seq("text"),
      hashCompare = true).collect()
    assert(d.length == 1 && d.head.getString(1) == "changed")
  }

  test("snapshotDiff hashCompare plan: every shuffle exchange carries " +
      "id + 16-byte digest only — the payload never moves") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // executedPlan, not sparkPlan: exchanges are inserted by
    // EnsureRequirements during preparation
    def exchangeCols(df: org.apache.spark.sql.DataFrame): Seq[Set[String]] =
      df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e.child.output.map(_.name).toSet
      }
    // big-enough inputs + no broadcast so the join actually shuffles
    val o = spark.range(0, 5000).toDF("id")
      .withColumn("text", concat(lit("doc "), col("id")))
      .withColumn("lang", lit("en"))
    val n = o.withColumn("text",
      when(col("id") % 7 === 0, lit("edited")).otherwise(col("text")))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // AQE wraps the physical plan in AdaptiveSparkPlanExec (a leaf to
    // collect()); turn it off so the exchanges are inspectable
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val hx = exchangeCols(
        Diff.snapshotDiff(o, n, "id", Seq("text", "lang"),
          hashCompare = true))
      assert(hx.nonEmpty, "expected a shuffle for the full-outer join")
      val allowed = Set("__o_id", "__o_d", "__n_id", "__n_d")
      hx.foreach(cols => assert(cols.subsetOf(allowed),
        s"digest-path exchange carries $cols"))
      // the column path, by contrast, must ship the payload columns
      val cx = exchangeCols(
        Diff.snapshotDiff(o, n, "id", Seq("text", "lang")))
      assert(cx.exists(_.exists(_.endsWith("_text"))),
        s"column-path exchanges $cx should carry the compared text")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("diffSummary: all four kinds always present, zero-filled") {
    val got = Diff.diffSummary(oldDf, newDf, "id", Seq("text", "lang"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("added" -> 1L, "removed" -> 1L, "changed" -> 2L,
      "unchanged" -> 2L))
    val same = Diff.diffSummary(oldDf, oldDf, "id", Seq("text", "lang"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(same == Map("added" -> 0L, "removed" -> 0L, "changed" -> 0L,
      "unchanged" -> 5L))
  }

  test("snapshotDiff loud contracts: reserved/id-in-compare throw") {
    intercept[IllegalArgumentException] {
      Diff.snapshotDiff(oldDf, newDf, "id", Seq("id", "text"))
    }
    intercept[IllegalArgumentException] {
      Diff.snapshotDiff(oldDf.withColumnRenamed("text", "change"),
        newDf.withColumnRenamed("text", "change"), "id", Seq("change"))
    }
    // a compared column literally named "id" would alias to __o_id and
    // collide with the internal id markers — rejected up front, not as
    // a confusing ambiguous-reference failure later
    intercept[IllegalArgumentException] {
      Diff.snapshotDiff(
        oldDf.withColumnRenamed("id", "key").withColumnRenamed("text", "id"),
        newDf.withColumnRenamed("id", "key").withColumnRenamed("text", "id"),
        "key", Seq("id"))
    }
    intercept[IllegalArgumentException] {
      Diff.snapshotDiff(oldDf, newDf, "id", Seq("text", "text"))
    }
  }

  test("diffAndCommit: first call all-added, rerun idempotent, " +
      "ledger survives commits and reports against the LAST state") {
    import graft.operators.Diff
    val store = tmpDir("incdiff_")
    val first = Diff.diffAndCommit(oldDf, "id", Seq("text", "lang"),
        store)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(first.values.toSet == Set("added") && first.size == 5)
    // same data again: nothing to report
    assert(Diff.diffAndCommit(oldDf, "id", Seq("text", "lang"), store)
      .count() == 0)
    // new snapshot vs the ledger == snapshotDiff vs the old frame
    val inc = Diff.diffAndCommit(newDf, "id", Seq("text", "lang"), store)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val full = Diff.snapshotDiff(oldDf, newDf, "id", Seq("text", "lang"))
      .select("id", "change")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(inc == full, s"inc $inc vs full $full")
    // and the commit moved the state forward: rerun is empty again
    assert(Diff.diffAndCommit(newDf, "id", Seq("text", "lang"), store)
      .count() == 0)
  }

  test("schemaDiff: added/removed/retyped/re-nullabled at the " +
      "metadata grain; identical schemas diff empty") {
    val o = Seq((1L, "a", 1.0)).toDF("id", "text", "score")
    val n = Seq((1, "a", Some("en"))).toDF("id", "text", "lang")
    val got = Diff.schemaDiff(o, n).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("lang", "added"), ("score", "removed"),
      ("id", "retyped")))
    val types = Diff.schemaDiff(o, n).collect()
      .map(r => r.getString(0) -> (r.getString(2), r.getString(3))).toMap
    assert(types("id") == (("BIGINT", "INT")))
    assert(types("lang") == ((null, "STRING")))
    assert(Diff.schemaDiff(o, o).count() == 0)
    // nullability-only move: primitive Double is non-nullable,
    // Option[Double] is nullable
    val nn = Seq((1L, "a", Some(1.0))).toDF("id", "text", "score")
    val renull = Diff.schemaDiff(o, nn).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(renull.toSeq == Seq(("score", "re-nullabled")))
  }

  test("overlapEstimate exact: counts, jaccard, containments; " +
      "nulls never overlap; empty side reads zeros") {
    val a = Seq(Some(1L), Some(2L), Some(3L), Some(3L), None).toDF("k")
    val b = Seq(Some(3L), Some(4L), None).toDF("k")
    val r = Profile.overlapEstimate(a, b, "k", exact = true)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (3L, 2L, 1L, 4L))
    assert(r.getDouble(4) == 0.25)        // jaccard 1/4
    assert(r.getDouble(5) == 0.333333)    // containment_left 1/3
    assert(r.getDouble(6) == 0.5)         // containment_right 1/2
    val empty = Profile.overlapEstimate(
      a.where(col("k") > 100), b, "k", exact = true).collect().head
    assert((empty.getLong(0), empty.getLong(2), empty.getDouble(4)) ==
      (0L, 0L, 0.0))
  }

  test("overlapEstimateByKey exact: per-key counts with one-side-only " +
      "keys zero-filled; null keys and values exempt") {
    val l = Seq(("en", 1L), ("en", 2L), ("en", 2L), ("fr", 5L),
      (null.asInstanceOf[String], 9L)).toDF("lang", "id")
    val r = Seq(("en", 2L), ("en", 3L), ("de", 7L)).toDF("lang", "id")
    val got = Profile.overlapEstimateByKey(l, r, Seq("lang"), "id",
        exact = true)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(5)))
      .toMap
    assert(got.keySet == Set("en", "fr", "de"))
    assert(got("en") == ((2L, 2L, 1L, 0.333333))) // {1,2} vs {2,3}
    assert(got("fr") == ((1L, 0L, 0L, 0.0)))
    assert(got("de") == ((0L, 1L, 0L, 0.0)))
  }

  test("overlapEstimateByKey sketch: coupon regime equals exact on " +
      "small per-key universes") {
    val l = (0 until 600).map(i => (s"k${i % 3}", (i / 3).toLong))
      .toDF("key", "id")
    val r = (300 until 900).map(i => (s"k${i % 3}", (i / 3).toLong))
      .toDF("key", "id")
    val ex = Profile.overlapEstimateByKey(l, r, Seq("key"), "id",
        exact = true)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    val sk = Profile.overlapEstimateByKey(l, r, Seq("key"), "id")
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(sk.keySet == ex.keySet)
    for (k <- ex.keySet) {
      val (e, s) = (ex(k), sk(k))
      for ((ev, sv) <- Seq(e._1 -> s._1, e._2 -> s._2, e._3 -> s._3))
        assert(math.abs(sv - ev) <= math.max(2.0, 0.05 * ev),
          s"key $k sketch $s vs exact $e")
    }
  }

  test("overlapEstimate sketch: within the HLL envelope of exact on " +
      "a 5k/5k 50%-overlap corpus; empty side reads zero common") {
    val a = spark.range(0, 5000).toDF("k")
    val b = spark.range(2500, 7500).toDF("k")
    val ex = Profile.overlapEstimate(a, b, "k", exact = true)
      .collect().head
    val sk = Profile.overlapEstimate(a, b, "k").collect().head
    // lgK=12 -> ~1.6% standard error per sketch; allow 4x on the
    // inclusion-exclusion difference of three estimates
    for (i <- 0 to 2) {
      val (e, s) = (ex.getLong(i).toDouble, sk.getLong(i).toDouble)
      assert(math.abs(s - e) <= 0.07 * math.max(e, 1.0),
        s"col $i: sketch $s vs exact $e")
    }
    val emptySketch = Profile.overlapEstimate(
      a.where(col("k") < 0), b, "k").collect().head
    assert((emptySketch.getLong(0), emptySketch.getLong(2)) == (0L, 0L))
  }

  test("corpusFingerprint: order/partition invariant, detects one-row " +
      "edits, distinguishes null from empty, additive, plan shuffle-free") {
    val docs = Seq(
      (1L, Some("alpha"), Some("en")),
      (2L, Some("beta"), Some("fr")),
      (3L, None: Option[String], Some("de")),
      (4L, Some(""), Some("de"))
    ).toDF("id", "text", "lang")
    val cols = Seq("id", "text", "lang")
    def fp(df: org.apache.spark.sql.DataFrame): (Long, String, String) = {
      val r = Diff.corpusFingerprint(df, cols).head()
      (r.getLong(0), r.getString(1), r.getString(2))
    }
    val base = fp(docs)
    assert(base._1 == 4L)
    // row order and physical partitioning do not move the sums
    assert(fp(docs.repartition(7)) == base)
    assert(fp(docs.orderBy(col("text").desc_nulls_last)) == base)
    // one edited row moves them
    val edited = docs.withColumn("text",
      when(col("id") === 2L, lit("beta!")).otherwise(col("text")))
    assert(fp(edited) != base && fp(edited)._1 == 4L)
    // the null-sentinel rendering keeps null and '' rows distinct: swap
    // row 3's null for '' and the fingerprint moves
    val nulledToEmpty = docs.withColumn("text",
      when(col("id") === 3L, lit("")).otherwise(col("text")))
    assert(fp(nulledToEmpty) != base)
    // additivity: fp(A union B) = term-wise sum (incremental maintenance)
    val aPart = docs.where(col("id") <= 2L)
    val bPart = docs.where(col("id") > 2L)
    val (fa, fb) = (fp(aPart), fp(bPart))
    assert(fa._1 + fb._1 == base._1)
    assert((BigInt(fa._2) + BigInt(fb._2)).toString == base._2)
    assert((BigInt(fa._3) + BigInt(fb._3)).toString == base._3)
    // empty input: 0 rows, null sums; and sameContent is null-safe there
    val none = Diff.corpusFingerprint(docs.where(col("id") < 0L), cols).head()
    assert(none.getLong(0) == 0L && none.isNullAt(1) && none.isNullAt(2))
    assert(Diff.sameContent(docs.where(col("id") < 0L),
      docs.where(col("id") > 99L), cols))
    // sameContent: permutation-equal yes, edited no
    assert(Diff.sameContent(docs, docs.repartition(3), cols))
    assert(!Diff.sameContent(docs, edited, cols))
    // the certificate plan never moves row content: the only exchange
    // is the single-partition gather of partial-aggregate state (the
    // partial aggregate must sit BELOW it — map-side combine)
    val certified = Diff.corpusFingerprint(docs, cols)
    assert(graft.operators.Layout.shuffleCount(certified) <= 1)
    val planBelowExchange = certified.queryExecution.executedPlan.toString
      .linesIterator.dropWhile(l => !l.contains("Exchange")).mkString("\n")
    assert(planBelowExchange.contains("partial"),
      "partial aggregation must run below the exchange (map-side combine)")
    intercept[IllegalArgumentException] {
      Diff.corpusFingerprint(docs, Seq.empty)
    }
  }

  test("fingerprint store: view == one-shot fingerprint, replay drops, " +
      "fold consolidates with the view unchanged, timeline is per-epoch") {
    val docs = (0L until 90L).map(i => (i, s"text_$i", s"l${i % 3}"))
      .toDF("id", "text", "lang")
    val cols = Seq("id", "text", "lang")
    val store = tmpDir("fp_store_")
    (0 until 3).foreach { b =>
      Diff.fingerprintIncrementalBatch(
        docs.where(pmod(col("id"), lit(3)) === b), cols, store,
        batchId = b.toLong, maxEpochs = 64)
    }
    val whole = Diff.corpusFingerprint(docs, cols).collect().toSeq
    assert(Diff.fingerprintView(spark, store).collect().toSeq == whole)
    // redelivery of an epoch REPLACES, never double-counts
    Diff.fingerprintIncrementalBatch(
      docs.where(pmod(col("id"), lit(3)) === 1), cols, store,
      batchId = 1L, maxEpochs = 64)
    assert(Diff.fingerprintView(spark, store).collect().toSeq == whole)
    // timeline: one row per real epoch, n_rows = 30 each
    val tl = Diff.fingerprintTimeline(spark, store).collect()
    assert(tl.length == 3 && tl.forall(_.getLong(1) == 30L))
    // fold to 2 epochs: view identical, epochs bounded, sentinel present
    Diff.foldFingerprintStore(spark, store, maxEpochs = 2)
    assert(Diff.fingerprintView(spark, store).collect().toSeq == whole)
    assert(Diff.fingerprintTimeline(spark, store).count() <= 2)
    // an epoch at/below the fold watermark drops on replay
    Diff.fingerprintIncrementalBatch(
      docs.where(pmod(col("id"), lit(3)) === 0), cols, store,
      batchId = 0L, maxEpochs = 2)
    assert(Diff.fingerprintView(spark, store).collect().toSeq == whole)
    // empty store surface
    assert(Diff.fingerprintView(spark, tmpDir("fp_none_")).collect()
      .toSeq.map(r => (r.getLong(0), r.isNullAt(1), r.isNullAt(2)))
      == Seq((0L, true, true)))
  }
}
