package graft

import org.apache.spark.sql.functions._

import graft.functions.{BpeVocab, CentroidSet, LinearTextModel}
import graft.operators.Similarity
import graft.store.{Artifacts, Fs}

/** Persistence for trained artifacts (r6 verdict item 1): exact round
  * trips for BPE vocabularies, linear text models, unigram/bigram LMs,
  * and IVF centroid sets;
  * kind/version/fingerprint guard rails; and the production reuse path
  * (IVF search with a reloaded quantizer ≡ training in-line). */
class ArtifactsSpec extends GraftSuite {

  test("BpeVocab round-trips exactly, preserving order and counts") {
    val dir = tmpDir("graft_art_")
    val vocab = new BpeVocab(Array("the", "th", "ing", "tion", "é", ""))
    val path = s"$dir/vocab.json"
    Artifacts.saveBpeVocab(spark, path, vocab)
    val fp = Artifacts.fingerprintOf(vocab)
    val loaded = Artifacts.loadBpeVocab(spark, path, Some(fp))
    assert(loaded.tokens.toSeq == vocab.tokens.toSeq)
    assert(loaded.maxLen == vocab.maxLen)
    for (t <- Seq("the thing nation", "xyzzy", "", "é é")) {
      assert(loaded.countText(org.apache.spark.unsafe.types.UTF8String.fromString(t)) ==
        vocab.countText(org.apache.spark.unsafe.types.UTF8String.fromString(t)), t)
    }
    assert(Artifacts.fingerprintOf(loaded) == fp)
  }

  test("LinearTextModel round-trips exactly (bit-identical weights)") {
    val dir = tmpDir("graft_art_")
    val model = new LinearTextModel(
      Array("fast", "slow", "a b"), Array(0.1, -1.0 / 3.0, 1e-300),
      bias = math.Pi, useBigrams = true)
    val path = s"$dir/model.json"
    Artifacts.saveTextModel(spark, path, model)
    val loaded = Artifacts.loadTextModel(spark, path,
      Some(Artifacts.fingerprintOf(model)))
    assert(loaded.grams.toSeq == model.grams.toSeq)
    assert(loaded.weights.toSeq == model.weights.toSeq) // exact doubles
    assert(loaded.bias == model.bias && loaded.useBigrams)
    val u = org.apache.spark.unsafe.types.UTF8String.fromString("fast a b slow")
    assert(loaded.score(u) == model.score(u))
  }

  test("CentroidSet round-trips exactly with assignment counts") {
    val dir = tmpDir("graft_art_")
    val cs = new CentroidSet(Array(
      Array(1.0f, 0.5f, -0.25f), Array(0.1f, 0.2f, 0.3f)))
    val counts = Array(7L, 3L)
    val path = s"$dir/cents.json"
    Artifacts.saveCentroids(spark, path, cs, counts)
    val (lcs, lcounts) = Artifacts.loadCentroids(spark, path,
      Some(Artifacts.fingerprintOf(cs, counts)))
    assert(lcs.vecs.map(_.toSeq).toSeq == cs.vecs.map(_.toSeq).toSeq)
    assert(lcs.norms.toSeq == cs.norms.toSeq)
    assert(lcounts.toSeq == counts.toSeq)
    // r7 advisor: the v2 fingerprint covers nAssigned — edited counts
    // fail the corruption check like every other field
    assert(Artifacts.fingerprintOf(cs, Array(9L, 3L)) !=
      Artifacts.fingerprintOf(cs, counts))
    val raw = Fs.readString(spark, path)
    val drifted = raw.replaceAll("7,\\s*3", "9, 3")
    assert(drifted != raw, "count tamper must hit the manifest")
    Fs.writeStringAtomic(spark, s"$dir/cents_drift.json", drifted)
    val e = intercept[graft.ArtifactFormatException] {
      Artifacts.loadCentroids(spark, s"$dir/cents_drift.json")
    }
    assert(e.getMessage.contains("corrupt"))
  }

  test("UnigramLm round-trips exactly (counts, alpha, scores)") {
    val dir = tmpDir("graft_art_")
    val lm = new graft.functions.UnigramLm(
      Array("the", "a b"), Array(100L, 3L), 0.25)
    val path = s"$dir/lm.json"
    Artifacts.saveUnigramLm(spark, path, lm)
    val loaded = Artifacts.loadUnigramLm(spark, path,
      Some(Artifacts.fingerprintOf(lm)))
    assert(loaded.grams.toSeq == lm.grams.toSeq)
    assert(loaded.counts.toSeq == lm.counts.toSeq)
    assert(loaded.alpha == lm.alpha)
    assert(loaded.unkLogProb == lm.unkLogProb)
    val u = org.apache.spark.unsafe.types.UTF8String.fromString("the zz")
    assert(loaded.perplexity(u) == lm.perplexity(u))
    // wrong kind fails loudly
    val e = intercept[ArtifactFormatException] {
      Artifacts.loadBpeVocab(spark, path)
    }
    assert(e.getMessage.contains("expected 'bpe_vocab'"))
  }

  test("BigramLm round-trips exactly (nested unigram, conditionals, backoff)") {
    val dir = tmpDir("graft_art_")
    val uni = new graft.functions.UnigramLm(
      Array("a", "b"), Array(3L, 2L), 0.5)
    val lm = new graft.functions.BigramLm(uni,
      Array("a\u0001b"), Array(2.0 / 3.0), backoff = 0.4)
    val path = s"$dir/blm.json"
    Artifacts.saveBigramLm(spark, path, lm)
    val loaded = Artifacts.loadBigramLm(spark, path,
      Some(Artifacts.fingerprintOf(lm)))
    assert(loaded.unigram.grams.toSeq == uni.grams.toSeq)
    assert(loaded.unigram.counts.toSeq == uni.counts.toSeq)
    assert(loaded.bigrams.toSeq == lm.bigrams.toSeq)   // U+0001 survives JSON
    assert(loaded.condProbs.toSeq == lm.condProbs.toSeq)
    assert(loaded.backoff == lm.backoff)
    val u = org.apache.spark.unsafe.types.UTF8String.fromString("a b zz")
    assert(loaded.perplexity(u) == lm.perplexity(u))
  }

  test("kind, version, fingerprint, and corruption guards fail loudly") {
    val dir = tmpDir("graft_art_")
    val vocab = new BpeVocab(Array("ab", "cd"))
    val vPath = s"$dir/v.json"
    Artifacts.saveBpeVocab(spark, vPath, vocab)

    // wrong kind: a vocab is not a text model
    val e1 = intercept[ArtifactFormatException] {
      Artifacts.loadTextModel(spark, vPath)
    }
    assert(e1.getMessage.contains("expected 'text_model'"))

    // missing file
    intercept[ArtifactFormatException] {
      Artifacts.loadBpeVocab(spark, s"$dir/absent.json")
    }

    // newer format version than this build
    val raw = Fs.readString(spark, vPath)
    Fs.writeStringAtomic(spark, s"$dir/future.json",
      raw.replace("\"formatVersion\" : 1", "\"formatVersion\" : 99"))
    val e2 = intercept[ArtifactFormatException] {
      Artifacts.loadBpeVocab(spark, s"$dir/future.json")
    }
    assert(e2.getMessage.contains("formatVersion 99"))

    // tampered payload no longer matches the stored fingerprint
    Fs.writeStringAtomic(spark, s"$dir/tampered.json",
      raw.replace("\"ab\"", "\"zz\""))
    val e3 = intercept[ArtifactFormatException] {
      Artifacts.loadBpeVocab(spark, s"$dir/tampered.json")
    }
    assert(e3.getMessage.contains("corrupt"))

    // caller-pinned fingerprint detects a re-trained artifact
    Artifacts.saveBpeVocab(spark, vPath, new BpeVocab(Array("ab", "cd", "ef")))
    val e4 = intercept[ArtifactFormatException] {
      Artifacts.loadBpeVocab(spark, vPath,
        Some(Artifacts.fingerprintOf(vocab)))
    }
    assert(e4.getMessage.contains("pinned"))

    // unparseable JSON
    Fs.writeStringAtomic(spark, s"$dir/garbage.json", "{not json")
    intercept[ArtifactFormatException] {
      Artifacts.loadBpeVocab(spark, s"$dir/garbage.json")
    }
  }

  test("save is an atomic replace: a re-save overwrites cleanly") {
    val dir = tmpDir("graft_art_")
    val path = s"$dir/v.json"
    Artifacts.saveBpeVocab(spark, path, new BpeVocab(Array("aa")))
    Artifacts.saveBpeVocab(spark, path, new BpeVocab(Array("bb", "cc")))
    assert(Artifacts.loadBpeVocab(spark, path).tokens.toSeq == Seq("bb", "cc"))
    // no stray temp files left behind
    val leftovers = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.contains(".tmp-"))
    assert(leftovers.isEmpty, leftovers.mkString(","))
  }

  test("directory: list/describe/toDF enumerate persisted artifacts") {
    val dir = tmpDir("graft_artdir_")
    val vocab = new BpeVocab(Array("aa", "bb", "cc"))
    Artifacts.saveBpeVocab(spark, s"$dir/vocab.json", vocab)
    Artifacts.saveTextModel(spark, s"$dir/model.json",
      new LinearTextModel(Array("x"), Array(1.0), 0.0, useBigrams = false))
    Artifacts.saveCentroids(spark, s"$dir/cents.json",
      new CentroidSet(Array(Array(1.0f, 2.0f))), Array(5L))
    // non-artifact files in the same directory are skipped, not fatal
    Fs.writeStringAtomic(spark, s"$dir/README.txt", "not json")
    Fs.writeStringAtomic(spark, s"$dir/other.json", """{"foo": 1}""")

    val infos = Artifacts.list(spark, dir)
    assert(infos.map(_.name) == Seq("cents.json", "model.json", "vocab.json"))
    assert(infos.map(_.kind) == Seq(Artifacts.CentroidsKind,
      Artifacts.TextModelKind, Artifacts.BpeVocabKind))
    val byName = infos.map(i => i.name -> i).toMap
    assert(byName("vocab.json").fingerprint == Artifacts.fingerprintOf(vocab))
    assert(byName("vocab.json").summary == "3 tokens")
    assert(byName("cents.json").summary == "k=1 dim=2")
    assert(byName("cents.json").formatVersion ==
      Artifacts.CentroidsFormatVersion)
    assert(infos.forall(_.sizeBytes > 0))

    // describe on a single path matches the listing entry
    val one = Artifacts.describe(spark, s"$dir/vocab.json")
    assert(one == byName("vocab.json"))
    // describe on a non-artifact fails loudly
    intercept[ArtifactFormatException] {
      Artifacts.describe(spark, s"$dir/other.json")
    }
    intercept[ArtifactFormatException] {
      Artifacts.describe(spark, s"$dir/absent.json")
    }

    // DataFrame summary: one row per artifact, pin-able fingerprints
    val df = Artifacts.toDF(spark, dir)
    assert(df.columns.toSeq == Seq("name", "kind", "format_version",
      "fingerprint", "size_bytes", "modified_at", "summary", "path"))
    assert(df.count() == 3)
    assert(df.where(col("kind") === Artifacts.BpeVocabKind)
      .select("fingerprint").collect().head.getString(0) ==
        Artifacts.fingerprintOf(vocab))
    // empty / missing directory lists cleanly
    assert(Artifacts.list(spark, s"$dir/nope").isEmpty)
    assert(Artifacts.toDF(spark, s"$dir/nope").count() == 0)
  }

  test("ivfTopK with a reloaded quantizer equals in-line training") {
    val dir = tmpDir("graft_art_")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 8)
    val (cs, counts) = Similarity.trainCentroidSet(
      emb, "vec_id", "embedding", nCells = 8, iters = 2)
    val path = s"$dir/q.json"
    Artifacts.saveCentroids(spark, path, cs, counts)
    val (lcs, _) = Artifacts.loadCentroids(spark, path)
    val viaLoaded = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 3, nCells = 8, quantizer = Some(lcs))
    val viaTrained = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 3, nCells = 8, trainIters = 2)
    assertSameRows(viaLoaded, viaTrained)
  }

  test("PqCodebook round-trips exactly; shape and corruption guards") {
    val dir = tmpDir("graft_art_")
    val cb = new graft.functions.PqCodebook(4, Array(
      Array(Array(1.0f, -0.5f), Array(0.25f, 0.125f)),
      Array(Array(0.0f, 2.0f), Array(-1.0f, 1e-7f))))
    val path = s"$dir/pq.json"
    Artifacts.savePqCodebook(spark, path, cb)
    val fp = Artifacts.fingerprintOf(cb)
    val loaded = Artifacts.loadPqCodebook(spark, path, Some(fp))
    assert(loaded.dim == cb.dim && loaded.m == cb.m && loaded.k == cb.k)
    assert(loaded.centroids.map(_.map(_.toSeq).toSeq).toSeq ==
      cb.centroids.map(_.map(_.toSeq).toSeq).toSeq)
    assert(loaded.selfDots.map(_.toSeq).toSeq ==
      cb.selfDots.map(_.toSeq).toSeq)
    assert(Artifacts.fingerprintOf(loaded) == fp)
    // a tampered centroid value fails the corruption check
    val raw = Fs.readString(spark, path)
    val drifted = raw.replace("2.0", "2.5")
    assert(drifted != raw, "value tamper must hit the manifest")
    Fs.writeStringAtomic(spark, s"$dir/pq_bad.json", drifted)
    val e = intercept[graft.ArtifactFormatException] {
      Artifacts.loadPqCodebook(spark, s"$dir/pq_bad.json")
    }
    assert(e.getMessage.contains("corrupt"))
    // wrong kind fails loudly
    val e2 = intercept[graft.ArtifactFormatException] {
      Artifacts.loadCentroids(spark, path)
    }
    assert(e2.getMessage.contains("pq_codebook"))
  }

  test("DsirModel round-trips exactly; shape and corruption guards") {
    val dir = tmpDir("graft_art_")
    val model = graft.operators.Dsir.DsirModel(8, 0.5,
      Array.tabulate(8)(i => i * 0.25 - 1.0))
    val path = s"$dir/dsir.json"
    Artifacts.saveDsirModel(spark, path, model)
    val fp = Artifacts.fingerprintOf(model)
    val loaded = Artifacts.loadDsirModel(spark, path, Some(fp))
    assert(loaded.buckets == 8 && loaded.alpha == 0.5)
    assert(loaded.logRatios.toSeq == model.logRatios.toSeq)
    assert(Artifacts.fingerprintOf(loaded) == fp)
    val info = Artifacts.describe(spark, path)
    assert(info.kind == Artifacts.DsirModelKind &&
      info.summary == "8 buckets, alpha=0.5")
    // a tampered log ratio fails the corruption check
    val raw = Fs.readString(spark, path)
    val drifted = raw.replace("-0.75", "-0.7")
    assert(drifted != raw, "value tamper must hit the manifest")
    Fs.writeStringAtomic(spark, s"$dir/dsir_bad.json", drifted)
    val e = intercept[graft.ArtifactFormatException] {
      Artifacts.loadDsirModel(spark, s"$dir/dsir_bad.json")
    }
    assert(e.getMessage.contains("corrupt"))
    // declared buckets must match the table length
    val shapeBad = raw.replace("\"buckets\" : 8", "\"buckets\" : 9")
    Fs.writeStringAtomic(spark, s"$dir/dsir_shape.json", shapeBad)
    val e2 = intercept[graft.ArtifactFormatException] {
      Artifacts.loadDsirModel(spark, s"$dir/dsir_shape.json")
    }
    assert(e2.getMessage.contains("buckets"))
    // wrong kind fails loudly
    val e3 = intercept[graft.ArtifactFormatException] {
      Artifacts.loadPqCodebook(spark, path)
    }
    assert(e3.getMessage.contains("expected 'pq_codebook'"))
  }
}
