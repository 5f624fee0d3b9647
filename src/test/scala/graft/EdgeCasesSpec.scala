package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.harness.Lake

/** Edge cases mirrored from the reference suites: index-type exclusivity,
  * schema-mismatch reconnects, nested temporal timestamp paths, null keys,
  * zero-row files, and physical-plan audits (projection pushdown, no UDF
  * barriers in scans). */
class EdgeCasesSpec extends GraftSuite {

  private def ordersFixture(name: String, n: Int = 3): (Index, Seq[String]) = {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val dir = Files.createTempDirectory(s"graft_${name}_").toString
    val files = Lake.splitByBand(orders, dir, "o_custkey", n)
    val idx = Index(spark, name, orders.schema, "parquet")
    idx.addIndex("o_custkey")
    idx.addFile(files: _*)
    (idx, files)
  }

  test("one index type per column (exclusivity)") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val idx = Index(spark, "excl_orders", orders.schema, "parquet")
    idx.addIndex("o_custkey")
    intercept[IllegalArgumentException](idx.addBloomIndex("o_custkey"))
    intercept[IllegalArgumentException](idx.addRangeIndex("o_custkey"))
    // same type again is idempotent, not an error
    idx.addIndex("o_custkey")
    assert(idx.metadata.indexes.count(_.column == "o_custkey") == 1)
  }

  test("reconnect with a different schema throws unless allowed; evolution keeps indexed cols") {
    val (idx, _) = ordersFixture("schema_orders")
    idx.update()
    val schema = spark.read.parquet(s"$sf/orders.parquet").schema
    val extended = StructType(schema.fields :+ StructField("extra", StringType))
    intercept[IllegalArgumentException](
      Index(spark, "schema_orders", extended, "parquet"))
    // allowed evolution: superset schema keeps the indexed column
    val evolved = Index(spark, "schema_orders", extended, "parquet",
      allowSchemaMismatch = true)
    assert(evolved.metadata.schema.fieldNames.contains("extra"))
    // dropping an indexed column must be rejected even when allowed
    val dropped = StructType(schema.fields.filterNot(_.name == "o_custkey"))
    intercept[IllegalArgumentException](
      Index(spark, "schema_orders", dropped, "parquet", allowSchemaMismatch = true))
    // format mismatch always throws
    intercept[IllegalArgumentException](
      Index(spark, "schema_orders", extended, "csv", allowSchemaMismatch = true))
  }

  test("temporal index with NESTED ts path works under select()") {
    import spark.implicits._
    val rows = Seq(
      (1L, "a", 10L), (1L, "b", 20L), // key 1: latest is "b"
      (2L, "c", 5L), (2L, "d", 3L)    // key 2: latest is "c"
    ).toDF("k", "payload", "ts")
      .select(col("k"), col("payload"), struct(col("ts").as("updatedAt")).as("meta"))
    val dir = tmpDir("graft_nested_")
    rows.where(col("k") === 1).coalesce(1).write.parquet(s"$dir/f1")
    rows.where(col("k") === 2).coalesce(1).write.parquet(s"$dir/f2")
    def files(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    val idx = Index(spark, "nested_ts_idx", rows.schema, "parquet")
    idx.addTemporalIndex("k", "meta.updatedAt")
    idx.addFile(files(s"$dir/f1") ++ files(s"$dir/f2"): _*)
    idx.update()
    import spark.implicits._
    val probe = Seq(1L, 2L).toDF("k")
    // select() omits the ts root; it must be force-read for dedup then dropped
    val got = idx.select("k", "payload").join(probe, Seq("k"))
      .orderBy("k").collect()
    assert(got.map(_.getString(1)).toSeq == Seq("b", "c"),
      s"latest-per-key via nested ts failed: ${got.mkString(",")}")
    assert(!got.head.schema.fieldNames.contains("meta"))
  }

  test("temporal probe with a second filter column must read non-latest files") {
    import spark.implicits._
    // user 1's LATEST row is type B in f2; the latest TYPE-A row is older,
    // in f1. A query filtered to type A must return it — latest-file-only
    // pruning for the temporal column would drop f1 and return nothing.
    val rows = Seq(
      (1L, "A", "e1", 10L),
      (1L, "B", "e2", 20L)
    ).toDF("u", "typ", "e", "ts")
    val dir = tmpDir("graft_tmix_")
    rows.where(col("e") === "e1").coalesce(1).write.parquet(s"$dir/f1")
    rows.where(col("e") === "e2").coalesce(1).write.parquet(s"$dir/f2")
    def files(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    val idx = Index(spark, "tmix_idx", rows.schema, "parquet")
    idx.addTemporalIndex("u", "ts")
    idx.addIndex("typ")
    idx.addFile(files(s"$dir/f1") ++ files(s"$dir/f2"): _*)
    idx.update()
    val got = idx.query(Map("u" -> Seq(1L), "typ" -> Seq("A")))
      .select("e").collect().map(_.getString(0)).toSeq
    assert(got == Seq("e1"),
      s"filtered latest row lives in a non-latest file and must survive: $got")
    // the single-column probe still serves pure latest-row semantics
    assert(idx.query(Map("u" -> Seq(1L))).select("e")
      .collect().map(_.getString(0)).toSeq == Seq("e2"))
  }

  test("two temporal configs keep only rows that are latest under EVERY config") {
    import spark.implicits._
    val rows = Seq(
      (1L, "A", "a", 10L),
      (1L, "B", "b", 20L), // u1 winner AND type-B winner
      (2L, "A", "c", 30L), // u2 winner AND type-A winner
      (2L, "B", "d", 5L),
      (3L, "A", "x", 25L)  // u3 winner but NOT type-A winner -> dropped
    ).toDF("u", "typ", "e", "ts")
    val dir = tmpDir("graft_tmulti_")
    Seq(1L, 2L, 3L).foreach(u =>
      rows.where(col("u") === u).coalesce(1).write.parquet(s"$dir/f$u"))
    def files(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    val idx = Index(spark, "tmulti_idx", rows.schema, "parquet")
    idx.addTemporalIndex("u", "ts")
    idx.addTemporalIndex("typ", "ts")
    idx.addFile(Seq(1L, 2L, 3L).flatMap(u => files(s"$dir/f$u")): _*)
    idx.update()
    val got = idx.query(Map("u" -> Seq(1L, 2L, 3L), "typ" -> Seq("A", "B")))
      .select("e").collect().map(_.getString(0)).toSet
    assert(got == Set("b", "c"),
      s"multi-config winners must be the per-config intersection: $got")
    // read(latestOnly) applies every config over the unpruned read — same set
    val full = idx.read(latestOnly = true)
      .select("e").collect().map(_.getString(0)).toSet
    assert(full == Set("b", "c"))
  }

  test("exploded FIELD index over array-of-struct (reference addExplodedFieldIndex)") {
    import spark.implicits._
    val rows = Seq(
      (1L, Seq(("sku1", 2), ("sku2", 1))),
      (2L, Seq(("sku2", 5))),
      (3L, Seq(("sku3", 1))))
      .toDF("order_id", "raw")
      .select(col("order_id"),
        expr("transform(raw, x -> struct(x._1 as sku, x._2 as qty))").as("items"))
    val dir = tmpDir("graft_explfield_")
    (1 to 3).foreach(i =>
      rows.where(col("order_id") === i).coalesce(1).write.parquet(s"$dir/f$i"))
    def files(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    val idx = Index(spark, "expl_field_idx", rows.schema, "parquet")
    idx.addExplodedFieldIndex("items", "sku", "item_sku")
    idx.addFile((1 to 3).flatMap(i => files(s"$dir/f$i")): _*)
    idx.update()
    assert(idx.indexes == Set("item_sku"))
    val got = idx.query(Map("item_sku" -> Seq("sku2")))
      .select("order_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L), s"got $got")
  }

  test("null values in an indexed column: rows survive reads, null never matches") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)]((1L, "x"), (null, "y"), (2L, "z"))
      .toDF("k", "v")
    val dir = s"${tmpDir("graft_nulls_")}/data"
    df.coalesce(1).write.parquet(dir)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    val idx = Index(spark, "nulls_idx", df.schema, "parquet")
    idx.addIndex("k")
    idx.addFile(f: _*)
    idx.update()
    assert(idx.query(Map("k" -> Seq(1L, 2L))).count() == 2)
    assert(idx.query(Map("k" -> Seq(99L))).count() == 0)
  }

  test("zero-row file gets an index row and is never re-processed") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("k", "v")
    val dir = s"${tmpDir("graft_zero_")}/data"
    df.where(lit(false)).coalesce(1).write.parquet(dir)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    val idx = Index(spark, "zero_idx", df.schema, "parquet")
    idx.addIndex("k")
    idx.addFile(f: _*)
    idx.update()
    assert(idx.unindexedFiles.isEmpty, "empty file must still be marked indexed")
    assert(idx.query(Map("k" -> Seq(1L))).count() == 0)
  }

  test("typed exceptions: one GraftException marker covers every failure") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val (idx, _) = ordersFixture("t_exc")
    intercept[ColumnNotFoundException](idx.queryRange("nope", 1L, 2L))
    intercept[IndexNotFoundException](Index.connect(spark, "t_never_created"))
    intercept[UnsupportedFormatException](
      Index(spark, "t_exc_fmt", orders.schema, "avro"))
    intercept[FormatMismatchException](
      Index(spark, "t_exc", orders.schema, "csv"))
    intercept[SchemaMismatchException](
      Index(spark, "t_exc", StructType(Seq(StructField("x", LongType))), "parquet"))
    // every one of them is catchable via the marker AND the legacy JDK type
    val e = intercept[GraftException](idx.queryRange("nope", 1L, 2L))
    assert(e.isInstanceOf[IllegalArgumentException])
  }

  test("indexRepartitionCount shapes the index table; debug implies metrics") {
    spark.conf.set("spark.graft.indexRepartitionCount", "3")
    try {
      val (idx, dir) = ordersFixture("t_repart")
      idx.update()
      val table = new graft.store.IndexStore(spark, "t_repart")
        .indexTable.read().get
      assert(table.rdd.getNumPartitions == 3)
      // probes through the reshaped table stay correct
      val got = idx.query(Map("o_custkey" -> Seq(1L, 2L, 3L))).count()
      val want = spark.read.parquet(dir: _*)
        .where(col("o_custkey").isin(1L, 2L, 3L)).count()
      assert(got == want)
    } finally spark.conf.unset("spark.graft.indexRepartitionCount")

    assert(!GraftConf.metricsEnabled(spark))
    spark.conf.set("spark.graft.debug", "true")
    try assert(GraftConf.metricsEnabled(spark))
    finally spark.conf.unset("spark.graft.debug")
  }

  test("plan audit: select() projection reaches the parquet scan, no UDFs") {
    val (idx, _) = ordersFixture("planaudit_orders")
    idx.update()
    import spark.implicits._
    val probe = Seq(1L, 7L).toDF("o_custkey")
    val plan = idx.select("o_orderkey", "o_custkey")
      .join(probe, Seq("o_custkey"))
      .queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("Scan parquet")).getOrElse("")
    assert(scanLine.contains("o_orderkey") && scanLine.contains("o_custkey"))
    assert(!scanLine.contains("o_comment") && !scanLine.contains("o_totalprice"),
      s"unselected columns must be pruned from the scan: $scanLine")
    assert(!plan.toLowerCase.contains("udf"), "no UDF barriers on the read path")
  }

  test("r5 operators: degenerate inputs never crash") {
    import spark.implicits._
    import graft.operators.{Sessions, Similarity, Multimodal}
    // sessionize: empty frame and single row
    val empty = Seq.empty[(Long, Long, Long)].toDF("k", "ts", "id")
    assert(Sessions.assign(empty, Seq("k"), "ts", 10L).count() == 0)
    val one = Seq((1L, 5L, 1L)).toDF("k", "ts", "id")
    assert(Sessions.assign(one, Seq("k"), "ts", 10L)
      .select("session_idx").first().getLong(0) == 0L)
    // trainCentroids: corpus smaller than nCells; iters on 3 vectors
    val tiny = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (3L, Seq(1f, 1f)))
      .toDF("vec_id", "embedding")
    val tc = Similarity.trainCentroids(tiny, "vec_id", "embedding",
      nCells = 16, iters = 2).collect()
    assert(tc.length == 3 && tc.map(_.getLong(2)).sum == 3)
    // quantizeInt8: null vector row passes through with null qvec
    val withNull = Seq((1L, Some(Seq(1f, 2f))), (2L, None))
      .toDF("vec_id", "embedding")
    val qn = Similarity.quantizeInt8(withNull, "embedding")
    assert(qn.where($"vec_id" === 2 && $"qvec".isNull).count() == 1)
    assert(qn.where($"vec_id" === 1 && $"qvec".isNotNull).count() == 1)
    // audioMeta: null payload and empty payload report unknown, no crash
    val binRows = Seq((1L, Option.empty[Array[Byte]]),
      (2L, Some(Array.empty[Byte])), (3L, Some("RIFFxxxx".getBytes)))
      .toDF("id", "payload")
    val am = binRows.select($"id", Multimodal.audioMeta($"payload").as("m"))
      .select($"id", $"m.fmt").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(am(2) == "unknown" && am(3) == "unknown")
    // normalizeText: null text stays null
    val nt = Seq((1L, Option.empty[String]), (2L, Some("A  B")))
      .toDF("id", "t")
      .select($"id", graft.operators.TextAnalysis.normalizeText($"t").as("n"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(nt(1).isEmpty && nt(2).contains("a b"))
  }

  test("round-6 operators on degenerate inputs") {
    val s = spark
    import s.implicits._
    import graft.operators.{Dedup, Profile, Rolling, Sampling}
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val someDocs = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")

    // empty corpus flows through every span/paragraph operator
    assert(Dedup.dedupParagraphs(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.removeContaminatedSpans(emptyDocs, someDocs,
      "doc_id", "text", 2).count() == 0)
    // empty PROBE: every corpus doc passes verbatim with zero removals
    val noProbe = Dedup.removeContaminatedSpans(someDocs, emptyDocs,
      "doc_id", "text", 2).select("text_clean", "n_removed").collect()
    assert(noProbe.forall(r => r.getString(0) == "a b c" && r.getLong(1) == 0L))
    val stats = Dedup.crossContaminationStats(someDocs, emptyDocs,
      "doc_id", "text", 2).select("n_contaminated").collect()
    assert(stats.forall(_.getLong(0) == 0L))

    // a doc that is ONLY separators: every paragraph empty -> untouched
    val seps = Seq((1L, "\n\n")).toDF("doc_id", "text")
    assert(Dedup.dedupParagraphs(seps, "doc_id", "text")
      .select("text_clean").first().getString(0) == "\n\n")

    // weighted sample: empty frame and k=1 singleton
    assert(Sampling.weightedSample(emptyDocs
      .withColumn("w", lit(1L)), "doc_id", "w", 5).count() == 0)
    assert(Sampling.weightedSample(someDocs
      .withColumn("w", lit(1L)), "doc_id", "w", 1).count() == 1)

    // profile/histogram/quantiles on empty + all-null columns
    val prof = Profile.table(emptyDocs, Seq("doc_id", "text")).collect()
    assert(prof.length == 2 && prof.forall(r => r.getLong(1) == 0L))
    val nulls = Seq.empty[Option[Double]].toDF("x")
    assert(Profile.histogram(nulls, "x", 0, 10, 2).count() == 0)
    assert(Profile.quantiles(emptyDocs.select($"doc_id".cast("double").as("x")),
      "x", Seq(0.5)).where($"val".isNotNull).count() == 0)

    // rolling on empty; non-time column rejected loudly
    assert(Rolling.trailingStats(
      Seq.empty[(Long, Long, Double)].toDF("user_id", "ts", "value"),
      Seq("user_id"), "ts", "value", 10L).count() == 0)
    intercept[IllegalArgumentException] {
      Rolling.trailingStats(Seq((1L, "x", 1.0)).toDF("user_id", "ts", "value"),
        Seq("user_id"), "ts", "value", 10L)
    }

    // asOfNearest with empty right: all left rows unmatched
    val ln = Seq(("a", 5L, 1L)).toDF("k", "ts", "id")
    val rn = Seq.empty[(String, Long, Double)].toDF("k", "ts", "v")
    val near = graft.operators.AsOfJoin.asOfNearest(ln, rn, Seq("k"),
      "ts", "ts", valueCols = Seq("v")).collect()
    assert(near.length == 1 && near(0).isNullAt(3))
  }
}
