package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, IntervalJoin, Sessions}

/** As-of and interval joins: checked against brute-force window/inequality
  * formulations (the semantics DuckDB's ASOF JOIN / BETWEEN join computes),
  * plus plan-shape guards — the binned interval join must never plan a
  * BroadcastNestedLoopJoin. */
class TimeJoinsSpec extends GraftSuite {
  import spark.implicits._

  // hand-built micro case: every boundary condition visible by eye
  private lazy val quotes = Seq(
    // key, ts, px
    ("a", 10L, 1.0), ("a", 20L, 2.0), ("a", 20L, 2.5), ("a", 30L, 3.0),
    ("b", 15L, 9.0)
  ).toDF("k", "ts", "px")
  private lazy val trades = Seq(
    ("a", 5L, 100L),  // before any quote -> null
    ("a", 20L, 101L), // equal ts -> inclusive match (latest payload on tie)
    ("a", 25L, 102L), // between -> ts=20
    ("b", 50L, 103L), // -> 15
    ("c", 10L, 104L)  // key never quoted -> null
  ).toDF("k", "t_ts", "trade_id")

  test("asOf backward: boundary, tie, missing-key, tolerance") {
    val got = AsOfJoin.asOf(trades, quotes, Seq("k"), "t_ts", "ts",
      valueCols = Seq("px"), rightTsAlias = "q_ts")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(3)).map(_.toString.toDouble), Option(r.get(4)))).toSet
    assert(got == Set(
      ("a", 5L, None, None),
      ("a", 20L, Some(2.5), Some(20L)), // tie: greatest payload wins, deterministically
      ("a", 25L, Some(2.5), Some(20L)),
      ("b", 50L, Some(9.0), Some(15L)),
      ("c", 10L, None, None)))

    val tol = AsOfJoin.asOf(trades, quotes, Seq("k"), "t_ts", "ts",
      valueCols = Seq("px"), tolerance = Some(10L))
      .where($"trade_id" === 103L).select("px").collect()
    assert(tol.head.isNullAt(0), "b@50 matched 15 only because no tolerance bound")
  }

  test("asOf null keys never match (SQL join semantics)") {
    import spark.implicits._
    val l = Seq((Option.empty[String], 10L, 1L), (Some("a"), 10L, 2L))
      .toDF("k", "t_ts", "lid")
    val r = Seq((Option.empty[String], 5L, 9.0), (Some("a"), 5L, 1.5))
      .toDF("k", "ts", "px")
    val got = AsOfJoin.asOf(l, r, Seq("k"), "t_ts", "ts", valueCols = Seq("px"))
      .collect().map(re => (re.getLong(2), Option(re.get(3)))).toSet
    assert(got == Set((1L, None), (2L, Some(1.5))),
      "null-key left row must come out unmatched, never matched to a null-key right row")
  }

  test("asOf forward: earliest at-or-after, null guard") {
    val got = AsOfJoin.asOf(trades, quotes, Seq("k"), "t_ts", "ts",
      valueCols = Seq("px"), direction = "forward")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(3)).map(_.toString.toDouble))).toSet
    assert(got == Set(
      ("a", 5L, Some(1.0)),
      ("a", 20L, Some(2.5)), // inclusive; greatest payload wins the ts tie
      ("a", 25L, Some(3.0)),
      ("b", 50L, None), // nothing at or after 50
      ("c", 10L, None)))
  }

  test("asOfBucketed equals asOf across bucket widths (incl. empty buckets)") {
    // micro case: bucketWidth 7 puts the b@50 trade in a bucket with no
    // quotes — its match must arrive via the cross-bucket carry-in
    for (width <- Seq(1L, 7L, 1000L); dir <- Seq("backward", "forward")) {
      val got = AsOfJoin.asOfBucketed(trades, quotes, Seq("k"), "t_ts", "ts",
        valueCols = Seq("px"), bucketWidth = width, rightTsAlias = "q_ts",
        direction = dir)
      val want = AsOfJoin.asOf(trades, quotes, Seq("k"), "t_ts", "ts",
        valueCols = Seq("px"), rightTsAlias = "q_ts", direction = dir)
      assertSameRows(got, want)
    }
    // real data: day buckets and week buckets over native TIMESTAMP_NTZ ts
    // (the operator normalizes to epoch-µs internally — widths/tolerance µs)
    val events = spark.read.parquet(s"$sf/events.parquet")
    val clicks = events.where($"event_type" === "click")
      .select("user_id", "ts", "event_id")
    val views = events.where($"event_type" === "view")
      .groupBy($"user_id", $"ts").agg(max($"value").as("state_val"))
    val day = 86400L * 1000 * 1000
    for (width <- Seq(day, 7 * day)) {
      val got = AsOfJoin.asOfBucketed(clicks, views, Seq("user_id"), "ts", "ts",
        valueCols = Seq("state_val"), bucketWidth = width,
        rightTsAlias = "state_ts", tolerance = Some(3 * day))
      val want = AsOfJoin.asOf(clicks, views, Seq("user_id"), "ts", "ts",
        valueCols = Seq("state_val"), rightTsAlias = "state_ts",
        tolerance = Some(3 * day))
      assertSameRows(got, want)
    }
  }

  test("sessionize: boundaries exactly at gap, dense indexes, ts == micros") {
    val events = spark.read.parquet(s"$sf/events.parquet")
    val clicks = events.where($"event_type" === "click")
      .select("user_id", "ts", "event_id")
    val gap = 1800L * 1000 * 1000
    val got = Sessions.assign(clicks, Seq("user_id"), "ts", gap)
    val tsu = expr("unix_micros(cast(ts as timestamp))")
    val w = Window.partitionBy("user_id").orderBy(tsu)
    val check = got.withColumn("prev_ts", lag(tsu, 1).over(w))
      .withColumn("prev_sid", lag($"session_idx", 1).over(w))
      .where($"prev_ts".isNotNull).cache()
    assert(check.where($"session_idx" === $"prev_sid" &&
      tsu - $"prev_ts" > gap).count() == 0, "gap exceeded inside a session")
    assert(check.where($"session_idx" =!= $"prev_sid" &&
      tsu - $"prev_ts" <= gap).count() == 0, "split despite gap respected")
    assert(check.where($"session_idx" - $"prev_sid" > 1).count() == 0,
      "session indexes must be dense")
    assert(got.where($"session_idx" > 0).count() > 0,
      "fixture must produce multi-session users")
    // identical result from the numeric (epoch-micros) formulation
    val want = Sessions.assign(clicks.withColumn("ts", tsu),
      Seq("user_id"), "ts", gap)
    assertSameRows(got.withColumn("ts", tsu), want)
  }

  test("sessionBucketed equals assign across bucket widths (incl. null ts, hot key)") {
    val s = spark
    import s.implicits._
    val events = spark.read.parquet(s"$sf/events.parquet")
    val clicks = events.where($"event_type" === "click")
      .select("user_id", "ts", "event_id")
    val gap = 1800L * 1000 * 1000
    val want = Sessions.assign(clicks, Seq("user_id"), "ts", gap)
    // widths smaller than, equal to, and much larger than the gap —
    // sessions spanning many buckets and buckets holding many sessions
    for (width <- Seq(gap / 7, gap, 40L * gap)) {
      val got = Sessions.assignBucketed(clicks, Seq("user_id"), "ts", gap, width)
      assertSameRows(got, want)
    }
    // hot key + null timestamps: one user owns most rows, nulls must join
    // session 0 exactly as assign's contract says
    val nullRows = Seq((77L, 999001L), (77L, 999002L))
      .toDF("user_id", "event_id")
      .withColumn("ts", lit(null).cast(clicks.schema("ts").dataType))
      .select("user_id", "ts", "event_id")
    val hot = clicks.withColumn("user_id", lit(77L)).unionByName(nullRows)
    val wantHot = Sessions.assign(hot, Seq("user_id"), "ts", gap)
    val gotHot = Sessions.assignBucketed(hot, Seq("user_id"), "ts", gap, gap)
    assertSameRows(gotHot, wantHot)
  }

  test("sessionize: null-ts rows join session 0, never fragment into singletons") {
    val s = spark
    import s.implicits._
    val rows = Seq[(String, java.lang.Long)](
      ("u1", null), ("u1", null), ("u1", 100L), ("u1", 150L), ("u1", 500L),
      ("u2", null),               // only-null key: one session
      ("u3", 10L), ("u3", 400L))  // no-null key: plain gap behavior
      .toDF("k", "ts")
    val got = Sessions.assign(rows, Seq("k"), "ts", gap = 100L)
      .collect().map(r => (r.getString(0), Option(r.get(1)), r.getLong(2)))
    val byKey = got.groupBy(_._1)
    // u1: both nulls AND the first real rows (100, 150) share session 0;
    // 500 opens session 1 (gap 350 > 100 from 150)
    assert(byKey("u1").collect { case (_, None, sid) => sid }.toSet == Set(0L))
    assert(byKey("u1").collect { case (_, Some(ts), sid) => (ts, sid) }.toSet ==
      Set((100L, 0L), (150L, 0L), (500L, 1L)))
    assert(byKey("u2").map(_._3).toSet == Set(0L))
    assert(byKey("u3").map(_._3).toSet == Set(0L, 1L))
  }

  test("asOf/asOfBucketed on timestamps equals the same join on epoch-micros longs") {
    // the timestamp-native path must be a pure re-typing of the numeric
    // path: run the identical join both ways and compare matches
    val events = spark.read.parquet(s"$sf/events.parquet")
    def micros(df: DataFrame) =
      df.withColumn("ts", expr("unix_micros(cast(ts as timestamp))"))
    val clicksT = events.where($"event_type" === "click")
      .select("user_id", "ts", "event_id")
    val viewsT = events.where($"event_type" === "view")
      .groupBy($"user_id", $"ts").agg(max($"value").as("state_val"))
    for (dir <- Seq("backward", "forward")) {
      val gotT = AsOfJoin.asOfBucketed(clicksT, viewsT, Seq("user_id"), "ts", "ts",
        valueCols = Seq("state_val"), bucketWidth = 86400L * 1000 * 1000,
        rightTsAlias = "state_ts", direction = dir)
        .withColumn("ts", expr("unix_micros(cast(ts as timestamp))"))
        .withColumn("state_ts", expr("unix_micros(cast(state_ts as timestamp))"))
      val gotN = AsOfJoin.asOfBucketed(micros(clicksT), micros(viewsT),
        Seq("user_id"), "ts", "ts",
        valueCols = Seq("state_val"), bucketWidth = 86400L * 1000 * 1000,
        rightTsAlias = "state_ts", direction = dir)
      assertSameRows(gotT, gotN)
    }
  }

  /** Brute-force as-of on real data: per left row, max right ts <= left ts
    * via inequality join + window — O(n·m) per key but exact. */
  private def bruteAsOf(left: DataFrame, right: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id", "ts", "event_id")
      .orderBy($"r_ts".desc, $"state_val".desc)
    left.join(right, left("user_id") === right("r_uid") && $"r_ts" <= left("ts"), "left")
      .withColumn("rn", row_number().over(w))
      .where($"rn" === 1)
      .select(left("user_id"), $"ts", $"event_id",
        $"state_val", $"r_ts".as("state_ts"))
  }

  test("asOf on events matches brute-force inequality join, one shuffle") {
    val events = spark.read.parquet(s"$sf/events.parquet")
    val clicks = events.where($"event_type" === "click")
      .select("user_id", "ts", "event_id")
    val views = events.where($"event_type" === "view")
      .groupBy($"user_id".as("r_uid"), $"ts".as("r_ts"))
      .agg(max($"value").as("state_val"))
    val got = AsOfJoin.asOf(clicks,
      views.select($"r_uid".as("user_id"), $"r_ts", $"state_val"),
      Seq("user_id"), "ts", "r_ts",
      valueCols = Seq("state_val"), rightTsAlias = "state_ts")
    assertSameRows(got, bruteAsOf(clicks, views))

    // plan shape: the as-of itself costs ONE key shuffle (the window's);
    // the right side's groupBy adds its own — nothing else may shuffle,
    // and no join operator of any kind should appear
    got.collect()
    // the finalized AQE string repeats the tree under "== Initial Plan ==" —
    // audit only the final section
    val plan = got.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // tree-art prefixes are non-letters, so this misses Reused/Broadcast
    // variants by construction (none should exist here anyway)
    val exchanges = "(?m)^[^A-Za-z]*Exchange ".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected <=2 exchanges (window + agg), got $exchanges:\n$plan")
    assert(!plan.contains("Join"), s"asOf must be join-free:\n$plan")
  }

  test("interval join matches inequality join and plans no nested loop") {
    val events = spark.read.parquet(s"$sf/events.parquet")
    val clicks = events.where($"event_type" === "click")
      .select("user_id", "ts", "event_id")
    val win = 600L * 1000 * 1000 // 10 min in µs (timestamp binning unit)
    val errors = events.where($"event_type" === "error")
      .select($"user_id", $"ts".as("lo"),
        ($"ts" + expr("interval 600 seconds")).as("hi"),
        $"event_id".as("err_id"))

    val got = IntervalJoin.joinPointsToIntervals(
      clicks, errors, Seq("user_id"), "ts", "lo", "hi",
      binWidth = win, valueCols = Seq("err_id"))
    val expected = clicks.join(errors,
        clicks("user_id") === errors("user_id") &&
          $"ts" >= $"lo" && $"ts" <= $"hi")
      .select(clicks("user_id"), $"ts", $"event_id", $"err_id")
    assert(expected.count() > 0, "fixture must produce matches")
    assertSameRows(got, expected)

    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"),
      s"binned interval join must be an equi-join, got:\n$plan")
  }

  test("index intervalJoin prunes by ts-range and matches a full-scan filter") {
    import spark.implicits._
    val events = spark.read.parquet(s"$sf/events.parquet")
    val dir = tmpDir("events_ivj_")
    // event_id is assigned in ts order, so id-range bands have narrow,
    // nearly disjoint ts ranges — the layout range pruning exists for
    events.repartitionByRange(4, $"event_id").write.mode("overwrite").parquet(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    val idx = Index(spark, "t_events_ivj", events.schema, "parquet")
    idx.addRangeIndex("ts")
    idx.addFile(files: _*)
    idx.update()

    val day = 86400L * 1000 * 1000 // µs
    val t0 = events.agg(min($"ts")).first()
      .getAs[java.time.LocalDateTime](0)
    val t2 = t0.plusDays(2)
    val spans = Seq((t0, t2, 7L)).toDF("lo", "hi", "span_id")
    val got = idx.intervalJoin(spans, "ts", Seq.empty, "lo", "hi",
      binWidth = day, valueCols = Seq("span_id"))
    val expected = events.where($"ts" >= lit(t0) && $"ts" <= lit(t2))
      .withColumn("span_id", lit(7L))
    assert(expected.count() > 0)
    assertSameRows(got, expected)

    val located = graft.operators.IndexProbe.collectFiles(
      graft.operators.IndexProbe.rangeSpanCandidates(
        new graft.store.IndexStore(spark, "t_events_ivj"),
        idx.metadata.indexFor("ts").get,
        spans.select($"lo", $"hi")))
    assert(located.size < files.size,
      s"expected range pruning, located ${located.size} of ${files.size}")
  }

  test("mixed timestamp/numeric timelines are rejected loudly") {
    import spark.implicits._
    val tsSide = Seq((1L, java.time.LocalDateTime.of(2026, 1, 1, 0, 0), 1.0))
      .toDF("k", "ts", "px")
    val numSide = Seq((1L, 100L, 10L)).toDF("k", "t_ts", "tid")
    val e1 = intercept[IllegalArgumentException] {
      AsOfJoin.asOfBucketed(numSide, tsSide, Seq("k"), "t_ts", "ts",
        valueCols = Seq("px"), bucketWidth = 10L)
    }
    assert(e1.getMessage.contains("timestamp"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      IntervalJoin.joinPointsToIntervals(
        numSide.select($"k", $"t_ts".as("pt")),
        tsSide.select($"k", $"ts".as("lo"),
          ($"ts" + expr("interval 1 hour")).as("hi"), $"px"),
        Seq("k"), "pt", "lo", "hi", binWidth = 10L, valueCols = Seq("px"))
    }
    assert(e2.getMessage.contains("timestamp"), e2.getMessage)
  }

  test("interval join rejects a pathological fan-out with a named error") {
    import spark.implicits._
    val points = Seq((1L, 500L)).toDF("k", "pt")
    val intervals = Seq((1L, 0L, 10_000_000L, "x")).toDF("k", "lo", "hi", "v")
    val joined = IntervalJoin.joinPointsToIntervals(points, intervals,
      Seq("k"), "pt", "lo", "hi", binWidth = 10L, valueCols = Seq("v"),
      maxBinsPerInterval = 1000L)
    val e = intercept[Exception] { joined.collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val all = messages(e).mkString("\n")
    assert(all.contains("binWidth=10"), s"error must name binWidth, got: $all")
    // the same interval passes with a budget that covers it
    val ok = IntervalJoin.joinPointsToIntervals(points, intervals,
      Seq("k"), "pt", "lo", "hi", binWidth = 10L, valueCols = Seq("v"),
      maxBinsPerInterval = 2_000_000L)
    assert(ok.count() == 1)
  }

  test("index asOfJoin with a ts range index also prunes by probe time") {
    import spark.implicits._
    val events = spark.read.parquet(s"$sf/events.parquet")
    val dir = tmpDir("events_asof_t_")
    // event_id order == ts order, so id-range bands have disjoint ts spans
    events.repartitionByRange(4, $"event_id").write.mode("overwrite").parquet(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    val idx = Index(spark, "t_events_asof_t", events.schema, "parquet")
    idx.addTemporalIndex("user_id", "ts")
    idx.addRangeIndex("ts")
    idx.addFile(files: _*)
    idx.update()

    // probes early in the timeline: later band files can't hold a backward
    // match and must not be read
    val cutUs = events
      .selectExpr("percentile_approx(unix_micros(cast(ts as timestamp)), 0.2)")
      .first().getLong(0)
    val cut = expr(s"cast(timestamp_micros(${cutUs}L) as timestamp_ntz)")
    val probe = events.where($"event_type" === "click" && $"ts" < cut)
      .select($"user_id",
        ($"ts" - expr("interval 1 microsecond")).as("q_ts"),
        $"event_id".as("click_id"))
    val got = idx.asOfJoin(probe, "user_id", "q_ts",
      valueCols = Seq("event_id"), rightTsAlias = "src_ts", timePrune = true)
    val expected = AsOfJoin.asOf(probe, spark.read.parquet(dir),
      Seq("user_id"), "q_ts", "ts",
      valueCols = Seq("event_id"), rightTsAlias = "src_ts")
    assertSameRows(got, expected)
  }

  test("index asOfJoin prunes by key and matches the operator on a full read") {
    val events = spark.read.parquet(s"$sf/events.parquet")
    val dir = tmpDir("events_asof_")
    events.repartitionByRange(4, $"user_id").write.mode("overwrite").parquet(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    val idx = Index(spark, "t_events_asof", events.schema, "parquet")
    idx.addTemporalIndex("user_id", "ts")
    idx.addFile(files: _*)
    idx.update()

    val probe = events.where($"event_type" === "click" && $"user_id" < 8)
      .select("user_id", "ts", "event_id")
    val got = idx.asOfJoin(probe, "user_id", "ts",
      valueCols = Seq("event_type", "value"), rightTsAlias = "src_ts")
    val expected = AsOfJoin.asOf(probe, spark.read.parquet(dir),
      Seq("user_id"), "ts", "ts",
      valueCols = Seq("event_type", "value"), rightTsAlias = "src_ts")
    assertSameRows(got, expected)

    // key pruning: user_id < 8 clusters in the first range file(s)
    val located = graft.operators.IndexProbe.collectFiles(
      graft.operators.IndexProbe.temporalKeyCandidates(
        new graft.store.IndexStore(spark, "t_events_asof"),
        idx.metadata.indexFor("user_id").get,
        probe.select($"user_id")))
    assert(located.size < files.size,
      s"expected key pruning, located ${located.size} of ${files.size}")
  }

  // ---- round 6: nearest-direction as-of ----------------------------------

  test("asOfNearest: closer side wins, exact tie prefers backward, tolerance") {
    val right = Seq(("a", 10L, 1.0), ("a", 30L, 3.0), ("b", 100L, 9.0))
      .toDF("k", "ts", "px")
    val leftDf = Seq(
      ("a", 12L, 1L),  // 2 back vs 18 fwd -> backward (1.0)
      ("a", 28L, 2L),  // 18 back vs 2 fwd -> forward (3.0)
      ("a", 20L, 3L),  // exact tie 10/10 -> backward (1.0)
      ("a", 5L, 4L),   // nothing behind -> forward (1.0)
      ("a", 99L, 5L),  // nothing ahead -> backward (3.0)
      ("c", 7L, 6L)    // key never on right -> null
    ).toDF("k", "t_ts", "id")
    val got = AsOfJoin.asOfNearest(leftDf, right, Seq("k"), "t_ts", "ts",
      valueCols = Seq("px"), rightTsAlias = "m_ts")
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(3)) None else Some((r.getDouble(3), r.getLong(4))))).toMap
    assert(got(1L).contains((1.0, 10L)))
    assert(got(2L).contains((3.0, 30L)))
    assert(got(3L).contains((1.0, 10L)))
    assert(got(4L).contains((1.0, 10L)))
    assert(got(5L).contains((3.0, 30L)))
    assert(got(6L).isEmpty)
    // tolerance 5: id 1 keeps (gap 2), id 4 keeps (gap exactly 5, inclusive),
    // id 3 drops (both gaps 10), id 5 drops (gap 69)
    val tol = AsOfJoin.asOfNearest(leftDf, right, Seq("k"), "t_ts", "ts",
      valueCols = Seq("px"), tolerance = Some(5L))
      .collect().map(r => r.getLong(2) -> !r.isNullAt(3)).toMap
    assert(tol(1L) && !tol(3L) && tol(4L) && !tol(5L) && !tol(6L))
  }

  test("asOfNearest == brute argmin-|dt| on random data") {
    val rnd = new scala.util.Random(7)
    val keys = Seq("a", "b", "c", "d")
    val leftDf = Seq.fill(300)((keys(rnd.nextInt(4)),
      rnd.nextInt(1000).toLong, rnd.nextLong())).toDF("k", "ts", "id")
    val right = Seq.fill(200)((keys(rnd.nextInt(3)),
      rnd.nextInt(1000).toLong, rnd.nextDouble()))
      .toDF("k", "ts", "v")
      .groupBy("k", "ts").agg(max("v").as("v"))  // unique (k, ts)
    val got = AsOfJoin.asOfNearest(leftDf, right, Seq("k"), "ts", "ts",
      valueCols = Seq("v"), rightTsAlias = "rts")
    val cand = leftDf.as("l").join(right.as("r"), Seq("k"))
      .select($"k", $"l.ts".as("ts"), $"id", $"r.ts".as("rts"), $"v",
        abs($"l.ts" - $"r.ts").as("ad"),
        when($"r.ts" <= $"l.ts", 0).otherwise(1).as("fwd"))
    val best = cand.withColumn("rn", row_number().over(
        Window.partitionBy($"k", $"ts", $"id").orderBy($"ad", $"fwd")))
      .where($"rn" === 1).select($"k", $"ts", $"id", $"v", $"rts")
    val want = leftDf.join(best, Seq("k", "ts", "id"), "left")
      .select($"k", $"ts", $"id", $"v", $"rts")
    assertSameRows(got.select($"k", $"ts", $"id", $"v", $"rts"), want)
  }

  test("quantiles: exact matches sorted-seq interpolation; approx close") {
    import graft.operators.Profile
    val vals = (1 to 101).map(_.toDouble)
    val df = vals.toDF("x")
    val got = Profile.quantiles(df, "x", Seq(0.0, 0.25, 0.5, 1.0))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // rank p*(n-1) over 1..101 -> 1 + 100p exactly
    assert(got(0.0) == 1.0 && got(0.25) == 26.0 &&
      got(0.5) == 51.0 && got(1.0) == 101.0)
    val approx = Profile.quantiles(df, "x", Seq(0.5), exact = false)
      .collect()(0).getDouble(1)
    assert(math.abs(approx - 51.0) <= 2.0)
  }

  // ---- round 6: trailing-window rolling features -------------------------

  test("trailingStats: range frame bounds, prev/gap, first-event nulls") {
    val ev = Seq(
      // user 1: 0s, 30m, 61m — the 61m row's trailing hour excludes t=0
      (1L, 1L, 0L, 10.0),
      (2L, 1L, 1800L * 1000000L, 20.0),
      (3L, 1L, 3660L * 1000000L, 40.0),
      // user 2: single event
      (4L, 2L, 500L, 7.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val got = graft.operators.Rolling.trailingStats(ev, Seq("user_id"), "ts",
      "value", rangeBack = 3600L * 1000000L, tieCols = Seq("event_id"))
      .select("event_id", "roll_cnt", "roll_sum", "roll_avg",
        "roll_prev_value", "roll_gap")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getLong(1) == 1L && got(1L).getDouble(2) == 10.0)
    assert(got(1L).isNullAt(4) && got(1L).isNullAt(5))           // first event
    assert(got(2L).getLong(1) == 2L && got(2L).getDouble(2) == 30.0)
    assert(got(2L).getDouble(4) == 10.0 &&
      got(2L).getLong(5) == 1800L * 1000000L)
    // 61m: trailing hour holds [1m, 61m] → the 30m and 61m events only
    assert(got(3L).getLong(1) == 2L && got(3L).getDouble(2) == 60.0 &&
      got(3L).getDouble(3) == 30.0)
    assert(got(4L).getLong(1) == 1L && got(4L).isNullAt(4))
  }

  test("trailingStats: ts ties are frame peers of each other; timestamp timeline") {
    val ev = Seq(
      (1L, 1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
      (2L, 1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 2.0),
      (3L, 1L, java.sql.Timestamp.valueOf("2024-01-01 10:30:00"), 4.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val got = graft.operators.Rolling.trailingStats(ev, Seq("user_id"), "ts",
      "value", rangeBack = 3600L * 1000000L, tieCols = Seq("event_id"))
      .select("event_id", "roll_cnt", "roll_sum", "roll_gap")
      .collect().map(r => r.getLong(0) -> r).toMap
    // RANGE frame: tied rows include each other regardless of row order
    assert(got(1L).getLong(1) == 2L && got(1L).getDouble(2) == 3.0)
    assert(got(2L).getLong(1) == 2L && got(2L).getDouble(2) == 3.0)
    assert(got(2L).getLong(3) == 0L)            // gap to its tie peer
    assert(got(3L).getLong(1) == 3L && got(3L).getDouble(2) == 7.0)
  }

  // ---- round 7: skew-bucketed rolling features ---------------------------

  test("trailingStatsBucketed ≡ trailingStats across bucket widths (random, hot key)") {
    import graft.operators.Rolling
    val rnd = new scala.util.Random(7)
    val rangeBack = 100L
    // hot key 1 holds 60% of rows; ts ties + empty-bucket stretches by
    // construction (ids unique → deterministic prev via tie column)
    val rows = (1 to 600).map { i =>
      val user = if (rnd.nextInt(10) < 6) 1L else 2L + rnd.nextInt(4)
      val ts = (rnd.nextInt(40) * 250L) + (if (rnd.nextBoolean()) 0L else 3000L)
      (i.toLong, user, ts, rnd.nextInt(100).toDouble)
    }
    val ev = rows.toDF("event_id", "user_id", "ts", "value")
    val single = Rolling.trailingStats(ev, Seq("user_id"), "ts", "value",
      rangeBack, tieCols = Seq("event_id"))
    for (width <- Seq(100L, 130L, 250L, 1000L, 100000L)) {
      val bucketed = Rolling.trailingStatsBucketed(ev, Seq("user_id"), "ts",
        "value", rangeBack, bucketWidth = width, tieCols = Seq("event_id"))
      assertSameRows(bucketed, single)
    }
  }

  test("trailingStatsBucketed: null values don't leak the compact fallback") {
    import graft.operators.Rolling
    // event 2's value is null; event 3's prev_value must be null (the real
    // previous event), NOT fall through to event 1 across the bucket edge
    val ev = Seq(
      (1L, 1L, 50L, java.lang.Double.valueOf(5.0)),
      (2L, 1L, 120L, null.asInstanceOf[java.lang.Double]),
      (3L, 1L, 130L, java.lang.Double.valueOf(7.0))
    ).toDF("event_id", "user_id", "ts", "value")
    val got = Rolling.trailingStatsBucketed(ev, Seq("user_id"), "ts", "value",
      rangeBack = 100L, bucketWidth = 100L, tieCols = Seq("event_id"))
      .select("event_id", "roll_cnt", "roll_prev_value", "roll_gap")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(3L).isNullAt(2), "prev_value must be the null-valued event 2")
    assert(got(3L).getLong(3) == 10L)
    // count counts VALUES (nulls excluded), frame [30,130] holds 5.0 & 7.0
    assert(got(3L).getLong(1) == 2L)
    val single = Rolling.trailingStats(ev, Seq("user_id"), "ts", "value",
      100L, tieCols = Seq("event_id"))
    assertSameRows(
      Rolling.trailingStatsBucketed(ev, Seq("user_id"), "ts", "value",
        100L, 100L, tieCols = Seq("event_id")), single)
  }

  test("trailingStatsBucketed: null keys and fractional timelines match single-window") {
    import graft.operators.Rolling
    // null keys form their own group in trailingStats — the compact-frame
    // join must be null-safe, not silently drop them
    val withNullKey = Seq(
      (1L, java.lang.Long.valueOf(1L), 10L, 1.0),
      (2L, null.asInstanceOf[java.lang.Long], 20L, 2.0),
      (3L, null.asInstanceOf[java.lang.Long], 150L, 3.0),
      (4L, java.lang.Long.valueOf(1L), 160L, 4.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val single = Rolling.trailingStats(withNullKey, Seq("user_id"), "ts",
      "value", 100L, tieCols = Seq("event_id"))
    val bucketed = Rolling.trailingStatsBucketed(withNullKey, Seq("user_id"),
      "ts", "value", 100L, 100L, tieCols = Seq("event_id"))
    assert(bucketed.count() == 4, "null-key rows must not be dropped")
    assertSameRows(bucketed, single)
    // fractional (double) timeline takes the floor-divide bucket path
    val frac = Seq((1L, 1L, 0.5, 1.0), (2L, 1L, 99.75, 2.0),
      (3L, 1L, 100.25, 3.0), (4L, 1L, 350.0, 4.0))
      .toDF("event_id", "user_id", "ts", "value")
    assertSameRows(
      Rolling.trailingStatsBucketed(frac, Seq("user_id"), "ts", "value",
        100L, 130L, tieCols = Seq("event_id")),
      Rolling.trailingStats(frac, Seq("user_id"), "ts", "value",
        100L, tieCols = Seq("event_id")))
    // reserved internal names are enforced on input columns too
    intercept[IllegalArgumentException] {
      Rolling.trailingStatsBucketed(
        withNullKey.withColumnRenamed("value", "__gb"),
        Seq("user_id"), "ts", "__gb", 100L, 100L)
    }
  }

  test("trailingStatsBucketed: timestamp timeline and guard rails") {
    import graft.operators.Rolling
    val ev = Seq(
      (1L, 1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
      (2L, 1L, java.sql.Timestamp.valueOf("2024-01-01 10:59:59"), 2.0),
      (3L, 1L, java.sql.Timestamp.valueOf("2024-01-01 12:30:00"), 4.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val hour = 3600L * 1000000L
    assertSameRows(
      Rolling.trailingStatsBucketed(ev, Seq("user_id"), "ts", "value",
        hour, hour, tieCols = Seq("event_id")),
      Rolling.trailingStats(ev, Seq("user_id"), "ts", "value",
        hour, tieCols = Seq("event_id")))
    intercept[IllegalArgumentException] {
      Rolling.trailingStatsBucketed(ev, Seq("user_id"), "ts", "value",
        rangeBack = hour, bucketWidth = hour - 1)
    }
    intercept[IllegalArgumentException] {
      Rolling.trailingStatsBucketed(ev, Seq("user_id"), "ts", "value",
        rangeBack = hour, bucketWidth = hour, tieCols = Seq("__gts"))
    }
  }
}
