package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftSqlBridge

import graft.catalog.GraftFunctions
import graft.operators.{Dedup, Sampling, TextAnalysis}

/** SQL ≡ programmatic differentials for the registered curation functions
  * (the AriadneCatalogTests pattern extended to the curation surface):
  * every graft_* SQL function must resolve to the same expression tree —
  * and therefore the same values — as its Scala-API twin. */
class SqlFunctionsSpec extends GraftSuite {

  private lazy val docs = {
    GraftFunctions.register(spark)
    val d = spark.read.parquet(s"$sf/documents.parquet")
    d.createOrReplaceTempView("sqlfn_docs")
    d
  }

  test("scalar functions: SQL == programmatic on the documents fixture") {
    val viaSql = docs.sparkSession.sql(
      """SELECT doc_id,
           graft_lang_id(text) AS lang_id,
           graft_token_count(text) AS n_tok,
           graft_unique_token_count(text) AS n_uniq,
           graft_token_estimate(text) AS est,
           graft_bpe_token_count(text) AS bpe,
           graft_strip_html(text) AS stripped,
           graft_redact_pii(text) AS redacted,
           graft_dedup_lines(text) AS deduped,
           graft_normalize_text(text) AS normed,
           graft_simhash64(text) AS sh,
           graft_minhash_sigs(text, 8) AS mh,
           graft_window_hashes(text, 5) AS wh,
           graft_gopher_passes(text) AS gopher,
           graft_c4_passes(text) AS c4,
           graft_c4_clean(text) AS c4_clean,
           graft_zvalue(doc_id % 16, doc_id % 11, 4) AS zv,
           graft_hilbert(doc_id % 16, doc_id % 11, 4) AS hv,
           graft_script(text) AS script,
           graft_canonical_url('https://WWW.Ex.COM/P/' || doc_id ||
             '?utm_source=x&id=' || doc_id || '#f') AS curl,
           graft_url_domain('https://A.b.Com/' || doc_id) AS udom,
           graft_domain_suffixes('x.y.site.com') AS sufs
         FROM sqlfn_docs""")
    val viaApi = docs.select(col("doc_id"),
      TextAnalysis.langId(col("text")).as("lang_id"),
      TextAnalysis.tokenCount(col("text")).as("n_tok"),
      TextAnalysis.uniqueTokenCount(col("text")).as("n_uniq"),
      TextAnalysis.tokenEstimate(col("text")).as("est"),
      TextAnalysis.bpeTokenCount(col("text")).as("bpe"),
      TextAnalysis.stripHtml(col("text")).as("stripped"),
      TextAnalysis.redactPii(col("text")).as("redacted"),
      TextAnalysis.dedupLinesInDoc(col("text")).as("deduped"),
      TextAnalysis.normalizeText(col("text")).as("normed"),
      graft.functions.VectorOps.simhash64(Dedup.tokenSet(col("text"))).as("sh"),
      graft.functions.VectorOps.minhashSignature(Dedup.tokenSet(col("text")), 8).as("mh"),
      Dedup.windowHashes(col("text"), 5, distinctWithinDoc = true).as("wh"),
      TextAnalysis.gopherPasses(col("text")).as("gopher"),
      TextAnalysis.c4Passes(col("text")).as("c4"),
      TextAnalysis.c4CleanText(col("text")).as("c4_clean"),
      graft.operators.Layout.zValue(
        Seq(col("doc_id") % 16, col("doc_id") % 11), 4).as("zv"),
      graft.functions.HilbertIndexExpr.hilbertIndex(
        col("doc_id") % 16, col("doc_id") % 11, 4).as("hv"),
      TextAnalysis.dominantScript(col("text")).as("script"),
      TextAnalysis.canonicalUrl(concat(lit("https://WWW.Ex.COM/P/"),
        col("doc_id").cast("string"), lit("?utm_source=x&id="),
        col("doc_id").cast("string"), lit("#f"))).as("curl"),
      TextAnalysis.urlDomain(concat(lit("https://A.b.Com/"),
        col("doc_id").cast("string"))).as("udom"),
      TextAnalysis.domainSuffixes(lit("x.y.site.com")).as("sufs"))
    assertSameRows(viaSql, viaApi)
  }

  test("PQ functions score off a persisted codebook: SQL == programmatic") {
    docs // force registration
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    emb.createOrReplaceTempView("sqlfn_emb")
    val cb = graft.operators.Similarity.trainPqCodebook(
      emb, "vec_id", "embedding", m = 4, k = 8, iters = 1)
    val dir = tmpDir("graft_sqlfn_pq_")
    graft.store.Artifacts.savePqCodebook(spark, s"$dir/pq.json", cb)
    val viaSql = spark.sql(
      s"""SELECT vec_id,
            graft_pq_encode(embedding, '$dir/pq.json') AS codes,
            round(graft_pq_cosine(embedding,
              graft_pq_encode(embedding, '$dir/pq.json'),
              '$dir/pq.json'), 6) AS sim
          FROM sqlfn_emb""")
    val viaApi = emb.select(col("vec_id"),
      graft.functions.Pq.encode(col("embedding"), cb).as("codes"),
      round(graft.operators.Similarity.pqCosine(col("embedding"),
        graft.functions.Pq.encode(col("embedding"), cb), cb), 6).as("sim"))
    assertSameRows(viaSql, viaApi)
  }

  test("graft_quality struct has field-parity with TextAnalysis.quality") {
    val viaSql = docs.sparkSession.sql(
      """SELECT doc_id, q.* FROM
           (SELECT doc_id, graft_quality(text) AS q FROM sqlfn_docs) t""")
    val viaApi = TextAnalysis.quality(docs, "doc_id", "text")
    assert(viaSql.columns.toSeq == viaApi.columns.toSeq,
      s"${viaSql.columns.toSeq} vs ${viaApi.columns.toSeq}")
    assertSameRows(viaSql, viaApi)
  }

  test("artifact-backed functions score off persisted manifests") {
    val dir = tmpDir("graft_sqlfn_")
    // unigram + bigram LMs trained on the fixture corpus
    val lm = TextAnalysis.trainUnigramLm(docs, "text", topN = 500)
    graft.store.Artifacts.saveUnigramLm(spark, s"$dir/uni.json", lm)
    val blm = TextAnalysis.trainBigramLm(docs, "text", topNUnigrams = 500)
    graft.store.Artifacts.saveBigramLm(spark, s"$dir/bi.json", blm)
    val vocab = new graft.functions.BpeVocab(Array("th", "the", "he", "is"))
    graft.store.Artifacts.saveBpeVocab(spark, s"$dir/vocab.json", vocab)
    val model = new graft.functions.LinearTextModel(
      Array("fast", "slow", "the"), Array(0.8, -1.2, -0.1), 0.2, false)
    graft.store.Artifacts.saveTextModel(spark, s"$dir/model.json", model)
    val dsir = graft.operators.Dsir.train(
      docs.where(col("lang") === "en"), docs, "text", buckets = 128)
    graft.store.Artifacts.saveDsirModel(spark, s"$dir/dsir.json", dsir)

    val viaSql = docs.sparkSession.sql(
      s"""SELECT doc_id,
            round(graft_perplexity(text, '$dir/uni.json'), 6) AS ppl,
            round(graft_bigram_perplexity(text, '$dir/bi.json'), 6) AS bppl,
            graft_bpe_count(text, '$dir/vocab.json') AS nbpe,
            round(graft_text_score(text, '$dir/model.json'), 6) AS score,
            round(graft_dsir_score(text, '$dir/dsir.json'), 6) AS dsir
          FROM sqlfn_docs""")
    val bcLm = spark.sparkContext.broadcast(lm)
    val bcBlm = spark.sparkContext.broadcast(blm)
    val bcV = spark.sparkContext.broadcast(vocab)
    val bcM = spark.sparkContext.broadcast(model)
    val viaApi = docs.select(col("doc_id"),
      round(graft.functions.NgramLm.perplexity(bcLm)(col("text")), 6).as("ppl"),
      round(graft.functions.NgramLm.bigramPerplexity(bcBlm)(col("text")), 6).as("bppl"),
      graft.functions.Bpe.segmentCount(bcV)(col("text")).as("nbpe"),
      round(graft.functions.TextModel.score(bcM)(col("text")), 6).as("score"),
      round(graft.operators.Dsir.scoreCol(col("text"), dsir), 6).as("dsir"))
    assertSameRows(viaSql, viaApi)
  }

  test("misuse fails loudly: arity and literal-kind errors") {
    docs // force registration
    val e1 = intercept[Exception] {
      spark.sql("SELECT graft_lang_id(text, text) FROM sqlfn_docs").collect()
    }
    assert(e1.getMessage.contains("argument"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_window_hashes(text, doc_id) FROM sqlfn_docs")
        .collect()
    }
    assert(e2.getMessage.contains("INTEGER literal"))
    val e3 = intercept[Exception] {
      spark.sql("SELECT graft_perplexity(text, text) FROM sqlfn_docs")
        .collect()
    }
    assert(e3.getMessage.contains("STRING literal"))
  }

  test("pure-SQL curation pipeline == programmatic composition") {
    docs // force registration
    val viaSql = spark.sql(
      """WITH gated AS (
           SELECT doc_id, md5(text) AS k, graft_token_count(text) AS n_tok
           FROM sqlfn_docs
           WHERE graft_lang_id(text) = 'en' AND graft_token_count(text) >= 5),
         ded AS (
           SELECT min(doc_id) AS doc_id, max(n_tok) AS n_tok
           FROM gated GROUP BY k)
         SELECT doc_id, n_tok FROM ded
         WHERE substring(md5(CAST(doc_id AS STRING)), 1, 8) < '80000000'
         ORDER BY doc_id""")
    val gated = docs
      .where(TextAnalysis.langId(col("text")) === "en" &&
        TextAnalysis.tokenCount(col("text")) >= 5)
      .select(col("doc_id"), md5(col("text")).as("__k"),
        TextAnalysis.tokenCount(col("text")).as("n_tok"))
    val survivors = gated.groupBy("__k")
      .agg(min("doc_id").as("doc_id"), max("n_tok").as("n_tok"))
      .drop("__k")
    val viaApi = Sampling.hashSample(survivors, "doc_id", 0.5)
      .select("doc_id", "n_tok")
    assert(viaSql.count() > 0, "curation pipeline must keep some docs")
    assertSameRows(viaSql, viaApi)
  }

  test("graft_repetition: SQL == programmatic on the documents fixture") {
    docs // force registration
    val viaSql = spark.sql(
      """SELECT doc_id, r.top_2gram_char_frac AS t2,
                r.dup_5gram_char_frac AS d5
         FROM (SELECT doc_id, graft_repetition(text) AS r FROM sqlfn_docs)""")
    val viaApi = TextAnalysis.repetitionSignals(docs, "doc_id", "text")
      .select(col("doc_id"), col("top_2gram_char_frac").as("t2"),
        col("dup_5gram_char_frac").as("d5"))
    assertSameRows(viaSql, viaApi)
  }

  test("graft_freq_items aggregate: SQL == programmatic, grouped and " +
      "weighted") {
    docs // force registration
    val viaSql = spark.sql(
      """SELECT lang, graft_freq_items(source, 64, 2) AS hh
         FROM sqlfn_docs GROUP BY lang""")
    val viaApi = docs.groupBy("lang")
      .agg(graft.functions.FreqItems
        .freqItemsAgg(col("source"), 64, 2).as("hh"))
    assertSameRows(
      viaSql.select(col("lang"), inline(col("hh"))),
      viaApi.select(col("lang"), inline(col("hh"))))
    val wSql = spark.sql(
      """SELECT graft_freq_items(lang, n_chars, 64, 3) AS hh
         FROM sqlfn_docs""").select(inline(col("hh")))
    val wApi = docs.agg(graft.functions.FreqItems
        .freqItemsAgg(col("lang"), col("n_chars"), 64, 3).as("hh"))
      .select(inline(col("hh")))
    assert(wSql.count() == 3)
    assertSameRows(wSql, wApi)
  }

  test("graft_quantiles aggregate: SQL == programmatic, grouped; " +
      "non-literal probs fail loudly") {
    docs // force registration
    val viaSql = spark.sql(
      """SELECT lang, graft_quantiles(n_chars, 4096, 0.25, 0.5, 0.9) AS q
         FROM sqlfn_docs GROUP BY lang""")
    val viaApi = docs.groupBy("lang")
      .agg(graft.functions.Kll
        .quantilesAgg(col("n_chars"), 4096, Seq(0.25, 0.5, 0.9)).as("q"))
    assertSameRows(
      viaSql.select(col("lang"), inline(col("q"))),
      viaApi.select(col("lang"), inline(col("q"))))
    val e = intercept[Exception] {
      spark.sql("SELECT graft_quantiles(n_chars, 64, n_chars) " +
        "FROM sqlfn_docs").collect()
    }
    assert(e.getMessage.contains("numeric literal"),
      s"unexpected: ${e.getMessage}")
  }

  test("monitoring vocabulary: graft_robust_z / graft_psi_term / " +
      "graft_bin == their programmatic twins") {
    docs // force registration
    // robust_z: SQL == Profile.robustZ, including the mad<=0 null
    val zSql = spark.sql(
      """SELECT doc_id,
           graft_robust_z(n_chars, 500.0, 120.0) AS z,
           graft_robust_z(n_chars, 500.0, 0.0) AS z0
         FROM sqlfn_docs""")
    val zApi = docs.select(col("doc_id"),
      graft.operators.Profile.robustZ(col("n_chars").cast("double"),
        lit(500.0), lit(120.0)).as("z"),
      graft.operators.Profile.robustZ(col("n_chars").cast("double"),
        lit(500.0), lit(0.0)).as("z0"))
    assertSameRows(zSql, zApi)
    assert(zSql.where(col("z0").isNotNull).count() == 0)
    // bin: SQL == the driftNumericByKey HOF binning; null value => -1
    val binSql = spark.sql(
      """SELECT doc_id, graft_bin(n_chars, array(100.0, 500.0, 900.0)) b,
                graft_bin(CAST(NULL AS DOUBLE), array(1.0)) bn
         FROM sqlfn_docs""")
    val v = col("n_chars").cast("double")
    val binApi = docs.select(col("doc_id"),
      when(v.isNull, lit(-1)).otherwise(
        aggregate(array(lit(100.0), lit(500.0), lit(900.0)), lit(0),
          (acc, c) => acc + when(v > c, 1).otherwise(0))).as("b"),
      lit(-1).as("bn"))
    assertSameRows(binSql, binApi)
    // psi_term composed over real bins == driftNumeric's psi_term
    val ref = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    val cur = docs.where(pmod(col("doc_id"), lit(2)) === 1)
    // approx = true so BOTH sides cut with the same discrete sketch
    // quantiles (the interpolated-percentile path can bin integer
    // values differently near integral cut points)
    val want = graft.operators.Profile.driftNumeric(ref, cur, "n_chars",
      nBins = 4, approx = true, k = 262144).select("bin", "psi_term")
    docs.createOrReplaceTempView("sqlfn_docs2")
    val got = spark.sql(
      """WITH cuts AS (SELECT transform(
             graft_quantiles(n_chars, 262144, 0.25, 0.5, 0.75),
             x -> x.value) AS c
           FROM sqlfn_docs2 WHERE doc_id % 2 = 0),
         binned AS (SELECT graft_bin(d.n_chars, c.c) AS bin,
             sum(CASE WHEN d.doc_id % 2 = 0 THEN 1 ELSE 0 END) AS n_ref,
             sum(CASE WHEN d.doc_id % 2 = 1 THEN 1 ELSE 0 END) AS n_cur
           FROM sqlfn_docs2 d CROSS JOIN cuts c GROUP BY 1),
         tot AS (SELECT sum(n_ref) tr, sum(n_cur) tc FROM binned)
         SELECT bin, graft_psi_term(
             CASE WHEN tr > 0 THEN n_ref / tr END,
             CASE WHEN tc > 0 THEN n_cur / tc END) AS psi_term
         FROM binned CROSS JOIN tot""")
    val wantPsi = want.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val gotPsi = got.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(gotPsi == wantPsi.filter(_._1 >= 0),
      s"sql $gotPsi vs programmatic $wantPsi")
  }

  test("pure-SQL monitoring capstone: windowed exact KS per epoch == " +
      "Profile.ksNumeric in the exact regime") {
    val s = spark
    val ev = s.read.parquet(s"$sf/events.parquet")
      .select((col("user_id") % 4).cast("long").as("epoch"), col("value"))
      .where(col("value").isNotNull)
    val ref = ev.where(col("epoch") === 0).select("value")
    val want = (0L until 4L).map { e =>
      e -> graft.operators.Profile.ksNumeric(ref,
          ev.where(col("epoch") === e).select("value"), "value", k = 131072)
        .collect().head.getDouble(0)
    }.toMap
    ev.createOrReplaceTempView("sqlfn_events")
    val got = s.sql(
      """WITH eps AS (SELECT DISTINCT epoch FROM sqlfn_events),
         ref AS (SELECT value AS v FROM sqlfn_events WHERE epoch = 0),
         pairs AS (SELECT e.epoch AS epoch, r.v AS v, 1 AS rw, 0 AS cw
                   FROM eps e CROSS JOIN ref r
                   UNION ALL
                   SELECT epoch, value AS v, 0 AS rw, 1 AS cw
                   FROM sqlfn_events),
         cdf AS (SELECT epoch,
                   CAST(sum(rw) OVER (PARTITION BY epoch ORDER BY v
                     RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS DOUBLE)
                     / sum(rw) OVER (PARTITION BY epoch) AS f_ref,
                   CAST(sum(cw) OVER (PARTITION BY epoch ORDER BY v
                     RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS DOUBLE)
                     / sum(cw) OVER (PARTITION BY epoch) AS f_cur
                 FROM pairs)
         SELECT epoch, round(max(abs(f_ref - f_cur)), 6) AS ks_d
         FROM cdf GROUP BY epoch""")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == want, s"sql $got vs programmatic $want")
    assert(want(0L) == 0.0, "baseline vs itself must read 0")
  }

  test("no UDFs in the resolved SQL plans (codegen parity)") {
    val plan = docs.sparkSession.sql(
      """SELECT graft_lang_id(text), graft_simhash64(text),
                graft_window_hashes(text, 5)
         FROM sqlfn_docs""").queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("udf"),
      s"registered functions must resolve to native expressions:\n${plan.take(600)}")
  }

  test("graft_auc aggregate: SQL == ModelEval.aucRoc, global and " +
      "grouped; null rows excluded; degenerate slice reads null; " +
      "alphabet cap fails loudly") {
    import spark.implicits._
    docs // force registration
    // synthetic scored frame with ties, nulls, and a degenerate slice
    val scored = (1 to 400).map { i =>
      val score = if (i % 11 == 0) None else Some((i % 17).toDouble / 17.0)
      val label = if (i % 13 == 0) None
        else Some(if ((i * 7) % 10 < 4) 1 else 0)
      (s"slice_${i % 3}", score, label)
    } ++ Seq(("all_pos", Some(0.5), Some(1)), ("all_pos", Some(0.7), Some(1)))
    val df = scored.toDF("slice", "score", "label")
    df.createOrReplaceTempView("sqlfn_scored")
    // global
    val gSql = spark.sql(
      """SELECT r.n_pos AS n_pos, r.n_neg AS n_neg, r.auc AS auc
         FROM (SELECT graft_auc(score, label) AS r FROM sqlfn_scored)""")
    val gApi = graft.operators.ModelEval.aucRoc(df, "score", "label")
    assertSameRows(gSql, gApi)
    // grouped == per-slice relational walk (incl. the all-positive
    // degenerate slice reading a null auc)
    val kSql = spark.sql(
      """SELECT slice, r.n_pos AS n_pos, r.n_neg AS n_neg, r.auc AS auc
         FROM (SELECT slice, graft_auc(score, label) AS r
               FROM sqlfn_scored GROUP BY slice)""")
    val kApi = graft.operators.ModelEval.aucRocByKey(
      df, "score", "label", Seq("slice"))
    assertSameRows(kSql, kApi)
    assert(kSql.where(col("slice") === "all_pos" && col("auc").isNull)
      .count() == 1)
    // the distinct-score alphabet cap is enforced per group
    val e = intercept[Exception] {
      spark.sql("SELECT graft_auc(score, label, 3) FROM sqlfn_scored")
        .collect()
    }
    assert(e.getMessage.contains("round(score, 6)") ||
      e.getCause != null &&
        e.getCause.getMessage.contains("round(score, 6)"),
      s"unexpected: ${e.getMessage}")
  }

  test("graft_auc: -0.0 and 0.0 share one tie-group (grouping parity " +
      "with the relational walk)") {
    import spark.implicits._
    docs // force registration
    // java.lang.Double.equals distinguishes the zeros; Spark's groupBy
    // (the relational aucRoc walk) does not — the aggregate must agree
    val df = Seq((0.0, 1), (-0.0, 0), (-0.0, 1), (0.5, 0), (1.0, 1))
      .toDF("score", "label")
    df.createOrReplaceTempView("sqlfn_zero_scored")
    val viaSql = spark.sql(
      """SELECT r.n_pos AS n_pos, r.n_neg AS n_neg, r.auc AS auc
         FROM (SELECT graft_auc(score, label) AS r
               FROM sqlfn_zero_scored)""")
    assertSameRows(viaSql,
      graft.operators.ModelEval.aucRoc(df, "score", "label"))
  }

  test("q_sql_graph: the pure-SQL degrees + persisted-pagerank serving " +
      "statement == the programmatic composition") {
    import graft.harness.Lake
    import graft.operators.Graph
    val lk = Lake.get(spark, sf)
    val viaSql = graft.SparkEntry.queries("q_sql_graph")(spark, sf)
    val edges = lk.lineitem
      .join(lk.orders, col("l_orderkey") === col("o_orderkey"))
      .select((col("l_suppkey") + lit(1000000L)).as("src"),
        col("o_custkey").as("dst"))
      .distinct()
    val viaApi = Graph.degrees(edges, "src", "dst")
      .join(Graph.pageRank(edges, "src", "dst", iters = 3), "node")
      .select(col("node"), col("out_degree"), col("in_degree"),
        round(col("pagerank"), 6).as("pagerank"))
    assertSameRows(viaSql, viaApi)
  }
}
