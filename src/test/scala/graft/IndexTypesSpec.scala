package graft

import org.apache.spark.sql.functions._

import graft.harness.Lake

/** Per-index-type correctness against unpruned full-scan oracles, mirroring
  * the reference suites BloomFilterOperationsTests / RangeIndexTests /
  * TemporalIndexTests / MixedIndexIntersectionTests. All queries run over
  * the shared sf0.001 Lake (key-banded split files). */
class IndexTypesSpec extends GraftSuite {
  lazy val lake: Lake = Lake.get(spark, sf)

  test("bloom probe matches full-scan filter") {
    val got = lake.lineitemIdx.query(Map("l_partkey" -> Seq(5L, 17L, 42L)))
      .select("l_orderkey", "l_linenumber", "l_partkey")
    val want = lake.lineitem.where(col("l_partkey").isin(5L, 17L, 42L))
      .select("l_orderkey", "l_linenumber", "l_partkey")
    assertSameRows(got, want)
  }

  test("bloom probe on absent values returns empty") {
    assert(lake.lineitemIdx.query(Map("l_partkey" -> Seq(-1L))).isEmpty)
  }

  test("range probe matches full-scan filter") {
    val got = lake.ordersIdx.query(Map("o_orderkey" -> Seq(3L, 57L, 888L)))
    val want = lake.orders.where(col("o_orderkey").isin(3L, 57L, 888L))
    assertSameRows(got.select("o_orderkey", "o_custkey"),
      want.select("o_orderkey", "o_custkey"))
  }

  test("range probe prunes files outside min/max band") {
    // keys near 0 live in band 0 of the o_custkey split; the range index on
    // o_orderkey is uncorrelated, so just assert located set is not all files
    val located = lake.ordersIdx.locateFiles(Map("o_orderkey" -> Seq(3L)))
    assert(located.nonEmpty)
    assert(located.size < lake.ordersFiles.size,
      s"expected pruning, got ${located.size}/${lake.ordersFiles.size}")
  }

  test("computed index probe matches expression filter") {
    val got = lake.ordersIdx.query(Map("o_month" -> Seq(3L)))
      .select("o_orderkey", "o_month")
    val want = lake.orders
      .withColumn("o_month", expr("cast(month(o_orderdate) as bigint)"))
      .where(col("o_month") === 3L).select("o_orderkey", "o_month")
    assertSameRows(got, want)
  }

  test("exploded token index matches unnest filter") {
    val got = lake.docsIdx.query(Map("tok" -> Seq("spark")))
      .select("doc_id", "tok")
    val want = lake.documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .where(col("tok") === "spark")
    assertSameRows(got, want)
  }

  test("temporal probe returns only latest row per key") {
    val users = Seq(1L, 3L, 7L)
    val got = lake.eventsIdx.query(Map("user_id" -> users))
      .select("event_id", "user_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").desc)
    val want = lake.events.where(col("user_id").isin(users: _*))
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select("event_id", "user_id")
    assertSameRows(got, want)
  }

  test("bloom Frame probe past the literal cap still prunes via broadcast") {
    // key-local probe: partkeys from the first band only, but MORE distinct
    // values than the forced-low literal cap — pre-r4 this degraded to a
    // full read; now the values broadcast into an executor-side any-match
    val maxPart = lake.part.agg(max("p_partkey")).first().getLong(0)
    val probe = lake.part.where(col("p_partkey") < maxPart / 8)
      .select(col("p_partkey").as("l_partkey"))
    assert(probe.distinct().count() > 2, "fixture must exceed the lowered cap")
    spark.conf.set("spark.graft.probeValueLimit", "2")
    spark.conf.set("spark.graft.metricsEnabled", "true")
    try {
      graft.operators.IndexJoin.lastMetrics = None
      val got = lake.lineitemIdx.join(probe, Seq("l_partkey"))
        .select("l_orderkey", "l_linenumber", "l_partkey")
      val want = lake.lineitem.join(probe, Seq("l_partkey"))
        .select("l_orderkey", "l_linenumber", "l_partkey")
      assertSameRows(got, want)
      val m = graft.operators.IndexJoin.lastMetrics
      assert(m.nonEmpty && m.get.locatedFiles < m.get.totalFiles,
        s"broadcast bloom probe should still prune: $m")
    } finally {
      spark.conf.unset("spark.graft.probeValueLimit")
      spark.conf.set("spark.graft.metricsEnabled", "false")
    }
  }

  test("regular Frame probe past the literal cap prunes via broadcast set") {
    val maxCust = lake.customers.agg(max("c_custkey")).first().getLong(0)
    val probe = lake.customers.where(col("c_custkey") <= maxCust / 8)
      .select(col("c_custkey").as("o_custkey"))
    assert(probe.distinct().count() > 2)
    spark.conf.set("spark.graft.probeValueLimit", "2")
    spark.conf.set("spark.graft.metricsEnabled", "true")
    try {
      graft.operators.IndexJoin.lastMetrics = None
      val got = lake.ordersIdx.join(probe, Seq("o_custkey"))
        .select("o_orderkey", "o_custkey")
      val want = lake.orders.join(probe, Seq("o_custkey"))
        .select("o_orderkey", "o_custkey")
      assertSameRows(got, want)
      val m = graft.operators.IndexJoin.lastMetrics
      assert(m.nonEmpty && m.get.locatedFiles < m.get.totalFiles,
        s"broadcast array probe should prune: $m")
    } finally {
      spark.conf.unset("spark.graft.probeValueLimit")
      spark.conf.set("spark.graft.metricsEnabled", "false")
    }
  }

  test("windowHashSqlExpr parses to exactly windowHashes (distinct form)") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "the quick Brown fox  jumps over the lazy dog today fine"),
      (2L, "short doc"),
      (3L, ""),
      (4L, "a a a a a a a a a a a a")        // repeated windows -> distinct
    ).toDF("id", "text")
    val viaSql = df.select($"id",
      expr(graft.operators.Dedup.windowHashSqlExpr("text", 10)).as("w"))
    val viaCol = df.select($"id",
      graft.operators.Dedup.windowHashes($"text", 10,
        distinctWithinDoc = true).as("w"))
    assertSameRows(viaSql, viaCol)
    // short/empty docs -> empty array (not null, not a phantom window)
    val short = viaSql.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(short(2L).isEmpty && short(3L).isEmpty)
    assert(short(4L).size == 1)              // 3 identical windows dedup to 1
  }

  test("window-hash index prunes decontamination reads to colliding files") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("graft_winidx_")
    // 3 files; ONLY file 0's docs share a 10-token run with the probe
    val leak = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    def doc(id: Long, text: String) = (id, text)
    val f0 = Seq(doc(1L, s"intro words then $leak and trailing text"),
      doc(2L, "completely different content with many plain words here okay"))
    val f1 = Seq(doc(3L, "this file shares nothing verbatim with the probe corpus at all"),
      doc(4L, "more unrelated material filling out a second training document"))
    val f2 = Seq(doc(5L, "third file also clean of any overlapping token run entirely"))
    val files = Seq(f0, f1, f2).zipWithIndex.map { case (rows, i) =>
      val p = s"$dir/f$i"
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(p)
      new java.io.File(p).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
    }
    val idx = Index(spark, "t_docs_win",
      Seq(doc(0L, "x")).toDF("doc_id", "text").schema, "parquet")
    idx.addExplodedIndex("win_hash",
      graft.operators.Dedup.windowHashSqlExpr("text", 10))
    idx.addFile(files: _*)
    idx.update()
    val probe = Seq((100L, s"eval question containing $leak inside it plus padding tokens"))
      .toDF("doc_id", "text")
    val probeWins = probe.select(explode(
      graft.operators.Dedup.windowHashes($"text", 10,
        distinctWithinDoc = true)).as("win_hash")).distinct()
    spark.conf.set("spark.graft.metricsEnabled", "true")
    try {
      graft.operators.IndexJoin.lastMetrics = None
      val hit = idx.join(probeWins, Seq("win_hash"))
        .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      assert(hit == Set(1L), s"only doc 1 holds the leaked run: $hit")
      val m = graft.operators.IndexJoin.lastMetrics
      assert(m.nonEmpty && m.get.locatedFiles < m.get.totalFiles,
        s"window-hash probe must prune to the colliding file: $m")
      assert(m.get.locatedFiles == 1 && m.get.totalFiles == 3, m.toString)
    } finally {
      spark.conf.set("spark.graft.metricsEnabled", "false")
      Index.remove(spark, "t_docs_win")
    }
  }

  test("exploded-bloom window index: same pruning, same result, no overflow") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("graft_winbloom_")
    val leak = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    def doc(id: Long, text: String) = (id, text)
    val f0 = Seq(doc(1L, s"intro words then $leak and trailing text"),
      doc(2L, "completely different content with many plain words here okay"))
    val f1 = Seq(doc(3L, "this file shares nothing verbatim with the probe corpus at all"),
      doc(4L, "more unrelated material filling out a second training document"))
    val f2 = Seq(doc(5L, "third file also clean of any overlapping token run entirely"))
    val files = Seq(f0, f1, f2).zipWithIndex.map { case (rows, i) =>
      val p = s"$dir/f$i"
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(p)
      new java.io.File(p).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
    }
    val idx = Index(spark, "t_docs_winbloom",
      Seq(doc(0L, "x")).toDF("doc_id", "text").schema, "parquet")
    idx.addExplodedBloomIndex("win_hash",
      graft.operators.Dedup.windowHashSqlExpr("text", 10),
      fpr = 0.001, expectedItems = 10000L)
    idx.addFile(files: _*)
    idx.update()
    try {
      // the index table holds ONE fixed-size binary bloom per file — the
      // whole point: no value arrays, no large-index overflow table
      val st = new graft.store.IndexStore(spark, "t_docs_winbloom")
      val itab = st.indexTable.read().get
      assert(itab.schema("bloom_win_hash").dataType ==
        org.apache.spark.sql.types.BinaryType)
      assert(st.largeTable("win_hash").read().isEmpty,
        "exploded_bloom must never route through the overflow path")
      val probe = Seq((100L, s"eval question containing $leak inside it plus padding tokens"))
        .toDF("doc_id", "text")
      val probeWins = probe.select(explode(
        graft.operators.Dedup.windowHashes($"text", 10,
          distinctWithinDoc = true)).as("win_hash")).distinct()
      spark.conf.set("spark.graft.metricsEnabled", "true")
      graft.operators.IndexJoin.lastMetrics = None
      val hit = idx.join(probeWins, Seq("win_hash"))
        .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      assert(hit == Set(1L), s"only doc 1 holds the leaked run: $hit")
      val m = graft.operators.IndexJoin.lastMetrics
      assert(m.nonEmpty && m.get.locatedFiles == 1 && m.get.totalFiles == 3,
        s"bloom window index must prune to the colliding file: $m")
      // value-list probe path (Map query) answers the same question
      val win = probeWins.collect().map(_.getLong(0)).toSeq
      val got = idx.query(Map("win_hash" -> win))
        .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      assert(got == Set(1L), s"value probe: $got")
    } finally {
      spark.conf.set("spark.graft.metricsEnabled", "false")
      Index.remove(spark, "t_docs_winbloom")
    }
  }

  test("broadcast Frame probe with narrower probe type still matches (int vs long)") {
    // probe column is IntegerType, index column BIGINT; forcing the literal
    // cap below the value count routes through the broadcast set, which
    // must widen the ints — a type-strict set would silently prune to zero
    val s = spark
    import s.implicits._
    val probe = Seq(1, 7, 42).toDF("o_custkey") // IntegerType
    spark.conf.set("spark.graft.probeValueLimit", "2")
    try {
      val got = lake.ordersIdx.join(probe.select(col("o_custkey").cast("long")
        .as("o_custkey_l")).withColumnRenamed("o_custkey_l", "o_custkey"),
        Seq("o_custkey")).select("o_orderkey", "o_custkey")
      // also drive the raw probe frame (int-typed) through candidateFiles
      val store = new graft.store.IndexStore(spark, "orders_idx")
      val meta = store.readMetadata().get
      val files = graft.operators.IndexProbe.collectFiles(
        graft.operators.IndexProbe.candidateFiles(store, meta,
          Map("o_custkey" -> graft.operators.IndexProbe.Frame(probe))))
      assert(files.nonEmpty, "int probe against long index must not prune to zero")
      val want = lake.orders.where(col("o_custkey").isin(1L, 7L, 42L))
        .select("o_orderkey", "o_custkey")
      assertSameRows(got, want)
    } finally spark.conf.unset("spark.graft.probeValueLimit")
  }

  test("null and missing index entries stay candidates (backfill pending)") {
    val s = spark
    import s.implicits._
    import graft.model.IndexDef
    val store = new graft.store.IndexStore(spark, "t_nullentry_probe")
    try {
      val withCol = Seq(("f1", 10L, 20L, true), ("f2", 0L, 0L, false))
        .toDF("filename", "mn", "mx", "has")
        .select(col("filename"), when(col("has"),
          struct(col("mn").as("min"), col("mx").as("max"))).as("range_c"))
      store.indexTable.overwrite(withCol)
      val ix = IndexDef("c", "range")
      def files(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.getString(0)).toSet
      // window [100,200] misses f1's [10,20]; f2's NULL entry must survive
      assert(files(graft.operators.IndexProbe.rangeWindowCandidates(
        store, ix, 100L, 200L)) == Set("f2"))
      assert(files(graft.operators.IndexProbe.rangeFilterCandidates(
        store, ix, Seq(">=" -> 100L))) == Set("f2"))
      // storage column entirely absent → no pruning, both files candidates
      store.indexTable.overwrite(Seq("f1", "f2").toDF("filename"))
      assert(files(graft.operators.IndexProbe.rangeWindowCandidates(
        store, ix, 100L, 200L)) == Set("f1", "f2"))
    } finally store.indexTable.drop()
  }

  test("temporal read plan contains no Window (de-windowed row dedup)") {
    val got = lake.eventsIdx.query(Map("user_id" -> Seq(1L, 3L, 7L)))
      .select("event_id", "user_id")
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"temporal serving path must aggregate, not window:\n$plan")
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"),
      s"expected an aggregate-based latest-row dedup:\n$plan")
  }

  test("temporal dedup: skewed key (1e5 versions) equals window formulation") {
    import graft.model.{IndexDef, IndexMetadata}
    import org.apache.spark.sql.expressions.Window
    val s = spark
    import s.implicits._
    // one pathological key with 100k versions + a spread of normal keys
    val hot = (1 to 100000).map(i => (7L, i.toLong, s"p$i"))
    val cold = (1 to 500).map(i => (100L + i % 50, i.toLong * 3 + 1, s"c$i"))
    val df = (hot ++ cold).toDF("k", "ts", "payload")
    val meta = IndexMetadata("t", "parquet", df.schema.json,
      indexes = List(IndexDef("k", "temporal", tsColumn = Some("ts"))))
    val got = graft.operators.IndexJoin.applyTemporalDedup(df, meta, Set("k"))
    assert(!got.queryExecution.executedPlan.toString.contains("Window"))
    val w = Window.partitionBy("k").orderBy(col("ts").desc_nulls_last)
    val want = df.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1).drop("rn")
    assertSameRows(got, want) // ts values unique per key → tie-break moot
  }

  test("temporal dedup falls back to window for non-orderable (map) payloads") {
    import graft.model.{IndexDef, IndexMetadata}
    val s = spark
    import s.implicits._
    val df = Seq((1L, 10L, Map("a" -> 1)), (1L, 20L, Map("b" -> 2)),
      (2L, 5L, Map("c" -> 3))).toDF("k", "ts", "m")
    val meta = IndexMetadata("t", "parquet", df.schema.json,
      indexes = List(IndexDef("k", "temporal", tsColumn = Some("ts"))))
    val got = graft.operators.IndexJoin.applyTemporalDedup(df, meta, Set("k"))
    val rows = got.select("k", "ts").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set((1L, 20L), (2L, 5L)))
  }

  test("cross-type AND intersection (regular + computed)") {
    val got = lake.ordersIdx.query(
      Map("o_custkey" -> Seq(1L, 7L, 42L), "o_month" -> Seq(3L, 7L)))
      .select("o_orderkey", "o_custkey", "o_month")
    val want = lake.orders
      .withColumn("o_month", expr("cast(month(o_orderdate) as bigint)"))
      .where(col("o_custkey").isin(1L, 7L, 42L) && col("o_month").isin(3L, 7L))
      .select("o_orderkey", "o_custkey", "o_month")
    assertSameRows(got, want)
  }

  test("multi-column join prunes on both indexes") {
    val probe = lake.orders
      .where(col("o_custkey").isin(1L, 7L))
      .select("o_custkey", "o_orderkey").limit(3)
    val got = lake.ordersIdx.join(probe, Seq("o_custkey", "o_orderkey"))
    val want = lake.orders.join(probe, Seq("o_custkey", "o_orderkey"))
    assert(got.count() == want.count())
  }

  test("csv and json indexes round-trip values exactly") {
    val keys = Seq(1L, 7L, 13L)
    val want = lake.orders.where(col("o_custkey").isin(keys: _*))
      .select("o_orderkey", "o_custkey", "o_orderstatus")
    assertSameRows(
      lake.ordersCsvIdx.query(Map("o_custkey" -> keys))
        .select("o_orderkey", "o_custkey", "o_orderstatus"), want)
    assertSameRows(
      lake.ordersJsonIdx.query(Map("o_custkey" -> keys))
        .select("o_orderkey", "o_custkey", "o_orderstatus"), want)
  }

  test("computed md5 index: incremental batch dedup matches full scan and prunes") {
    // "new batch" re-ingests two lake docs under fresh ids; the content-hash
    // index must find their collisions while reading only the lake files
    // that can hold those hashes
    val two = lake.documents.orderBy("doc_id").limit(2)
      .select((col("doc_id") + lit(1000000L)).as("batch_id"),
        md5(col("text")).as("content_md5"))
    spark.conf.set("spark.graft.metricsEnabled", "true")
    try {
      graft.operators.IndexJoin.lastMetrics = None
      val got = lake.docsHashIdx.join(two, Seq("content_md5"))
        .select(col("batch_id"), col("doc_id").as("lake_id"))
      val want = lake.documents.withColumn("content_md5", md5(col("text")))
        .join(two, Seq("content_md5"))
        .select(col("batch_id"), col("doc_id").as("lake_id"))
      assertSameRows(got, want)
      val m = graft.operators.IndexJoin.lastMetrics
      assert(m.nonEmpty, "metrics must be recorded")
      if (m.get.totalFiles > 1)
        assert(m.get.locatedFiles < m.get.totalFiles,
          s"two distinct hashes should not touch every file: $m")
    } finally spark.conf.set("spark.graft.metricsEnabled", "false")
  }

  test("hll index: per-file sketches union to a <=2% distinct estimate, " +
      "subset-scoped, survives deleteFiles, rejects probes") {
    val name = "orders_hll_spec_idx"
    graft.Index.remove(spark, name)
    val idx = graft.Index(spark, name, lake.orders.schema, "parquet")
    idx.addHllIndex("o_custkey")
    idx.addFile(lake.ordersFiles: _*)
    idx.update()
    val exact = lake.orders.agg(
      org.apache.spark.sql.functions.count_distinct(col("o_custkey")))
      .first().getLong(0)
    val est = idx.distinctEstimate("o_custkey")
    assert(math.abs(est - exact).toDouble / exact < 0.05,
      s"estimate $est vs exact $exact")
    // subset: one file's estimate tracks that file's own distinct count
    val f = lake.ordersFiles.head
    val exact1 = spark.read.parquet(f).agg(
      org.apache.spark.sql.functions.count_distinct(col("o_custkey")))
      .first().getLong(0)
    val est1 = idx.distinctEstimate("o_custkey", Some(Seq(f)))
    assert(math.abs(est1 - exact1).toDouble / math.max(exact1, 1) < 0.05,
      s"subset estimate $est1 vs exact $exact1")
    // deleteFiles drops rows; the union re-derives from survivors
    idx.deleteFiles(f)
    val estRest = idx.distinctEstimate("o_custkey")
    val exactRest = spark.read.parquet(lake.ordersFiles.tail: _*).agg(
      org.apache.spark.sql.functions.count_distinct(col("o_custkey")))
      .first().getLong(0)
    assert(math.abs(estRest - exactRest).toDouble / exactRest < 0.05,
      s"post-delete estimate $estRest vs exact $exactRest")
    // statistics-only: membership probes must fail loudly
    val e = intercept[Exception] {
      idx.query(Map("o_custkey" -> Seq(1L))).collect()
    }
    assert(e.getMessage.contains("statistics-only"), e.getMessage)
    // ...but every IMPLICIT pruning site must treat the column as
    // unindexed instead of routing into the throwing probe:
    // (a) SQL pushdown declines the filter (full scan + residual)
    val sb = new graft.catalog.GraftScanBuilder(idx.metadata)
    sb.pushFilters(Array(
      org.apache.spark.sql.sources.EqualTo("o_custkey", 1L)))
    assert(sb.pushedFilters().isEmpty,
      "hll column must not be pushed as a pruning filter")
    // (b) the EXPLICIT index-join API keeps the reference rule: a
    // statistics-only index is not a join index, so the require fires
    // exactly as for an unindexed column
    val probe = lake.customers.limit(5)
      .select(col("c_custkey").as("o_custkey"))
    val ej = intercept[IllegalArgumentException] {
      idx.join(probe, Seq("o_custkey"))
    }
    assert(ej.getMessage.contains("must be indexed"), ej.getMessage)
    // exclusivity unchanged: a second kind on the same column throws
    intercept[IllegalArgumentException](idx.addRangeIndex("o_custkey"))
    graft.Index.remove(spark, name)
  }

  test("searchText: pruned phrase search == full-scan token-aligned " +
      "match; short phrases fall back to a full read") {
    val phrase = lake.documents.where(col("doc_id") === 1)
      .select(concat_ws(" ",
        slice(split(lower(col("text")), " "), 1, 10)).as("p"))
      .first().getString(0)
    val got = lake.docsWindowIdx.searchText(phrase).select("doc_id")
    val want = lake.documents.where(
      org.apache.spark.sql.functions.contains(
        concat(lit(" "), lower(col("text")), lit(" ")),
        lit(" " + phrase + " "))).select("doc_id")
    assertSameRows(got, want)
    assert(got.count() >= 1, "doc 1 itself must match")
    // pruning: the located candidate set must not be the whole lake
    val hashes = spark.range(1)
      .select(explode(graft.operators.Dedup.windowHashes(
        lit(phrase), 10, distinctWithinDoc = true)).as("h"))
      .collect().map(_.getLong(0)).toSeq
    val located = lake.docsWindowIdx.locateFiles(Map("win_hash" -> hashes))
    assert(located.nonEmpty && located.size < lake.documentsFiles.size,
      s"expected pruning, got ${located.size}/${lake.documentsFiles.size}")
    // short phrase (< windowTokens): full-read fallback, same contract
    val short = phrase.split(" ").take(3).mkString(" ")
    val gotShort = lake.docsWindowIdx.searchText(short).select("doc_id")
    val wantShort = lake.documents.where(
      org.apache.spark.sql.functions.contains(
        concat(lit(" "), lower(col("text")), lit(" ")),
        lit(" " + short + " "))).select("doc_id")
    assertSameRows(gotShort, wantShort)
    // a probe on a non-window column still fails loudly
    intercept[IllegalArgumentException](
      lake.ordersIdx.searchText("x y", column = "o_custkey"))
  }
}
