package graft

import org.json4s.jackson.JsonMethods

import graft.functions.{BpeVocab, CentroidSet, LinearTextModel}
import graft.store.{Artifacts, Fs}

/** Cold-opens the COMMITTED artifact fixtures
  * (`src/test/resources/fixtures/artifacts`, frozen `_v1.json` bytes) —
  * the wire-format compatibility gate for trained artifacts, same regime
  * as the golden store fixture (r6 verdict item 7): if a serialization
  * change alters field names, fingerprint recipes, or value encoding,
  * these tests fail against the frozen files, forcing a formatVersion
  * bump + migration (or a deliberate fixture regeneration) in the same
  * commit. */
class ArtifactFixtureSpec extends GraftSuite {

  private val dir =
    new java.io.File("src/test/resources/fixtures/artifacts").getAbsolutePath

  private def u8(s: String) =
    org.apache.spark.unsafe.types.UTF8String.fromString(s)

  test("committed bpe_vocab_v1 fixture cold-opens with stable accounting") {
    val vocab = Artifacts.loadBpeVocab(spark, s"$dir/bpe_vocab_v1.json",
      expectFingerprint = Some("945ee0daa81bae4c2742d3114cea4f16"))
    assert(vocab.tokens.toSeq ==
      Seq("the", "th", "he", "ing", "tion", "an", "er"))
    // greedy longest-match counts under the frozen vocab are the contract:
    // values below were pinned at freeze time and must never drift
    assert(vocab.countText(u8("the")) == 1L)       // the
    assert(vocab.countText(u8("theing")) == 2L)    // the + ing
    assert(vocab.countText(u8("nation")) == 3L)    // n + a + tion
    assert(vocab.countText(u8("xyz")) == 3L)       // all 1-char fallback
  }

  test("committed text_model_v1 fixture cold-opens with stable scores") {
    val model = Artifacts.loadTextModel(spark, s"$dir/text_model_v1.json")
    assert(model.grams.toSeq == Seq("fast", "good", "slow", "the quick"))
    assert(model.useBigrams && model.bias == -0.125)
    // unigram hits + the bigram "the quick" + unknown word, exact doubles
    assert(model.score(u8("fast good zz")) == -0.125 + 0.75 + 1.25)
    assert(model.score(u8("the quick slow")) == -0.125 + 0.5 - 2.0)
  }

  test("committed ivf_centroids_v1 fixture cold-opens bit-exactly") {
    val (cs, counts) = Artifacts.loadCentroids(
      spark, s"$dir/ivf_centroids_v1.json")
    assert(cs.vecs.map(_.toSeq).toSeq == Seq(
      Seq(1.0f, 0.5f, -0.25f), Seq(0.125f, -0.5f, 2.0f)))
    assert(counts.toSeq == Seq(11L, 4L))
  }

  test("committed unigram_lm_v1 fixture cold-opens with stable perplexity") {
    val lm = Artifacts.loadUnigramLm(spark, s"$dir/unigram_lm_v1.json",
      expectFingerprint = Some("15cae11e386ffb32d8c4f09f389f1e04"))
    assert(lm.grams.toSeq == Seq("the", "of", "and"))
    assert(lm.counts.toSeq == Seq(50L, 20L, 10L) && lm.alpha == 0.5)
    // pinned at freeze time: denom = 80 + 0.5*4; ppl("the zz") =
    // exp(-(ln(50.5/82) + ln(0.5/82)) / 2)
    val p = lm.perplexity(u8("the zz")).doubleValue()
    assert(math.abs(p - 16.318609919443826) < 1e-9, p.toString)
  }

  test("committed bigram_lm_v1 fixture cold-opens with stable perplexity") {
    val lm = Artifacts.loadBigramLm(spark, s"$dir/bigram_lm_v1.json",
      expectFingerprint = Some("554ccd4eeeacb25c84b5ca939cf8bac5"))
    assert(lm.unigram.grams.toSeq == Seq("the", "of"))
    assert(lm.bigrams.toSeq == Seq("the\u0001of"))
    assert(lm.condProbs.toSeq == Seq(0.25) && lm.backoff == 0.4)
    // pinned: denom = 40 + 0.5*3; ppl("the of zz") =
    // exp(-(ln(30.5/41.5) + ln(0.25) + ln(0.4) + ln(0.5/41.5)) / 3)
    val p = lm.perplexity(u8("the of zz")).doubleValue()
    assert(math.abs(p - 10.413789223438892) < 1e-9, p.toString)
  }

  test("the writer still emits the frozen field vocabulary") {
    val tmp = tmpDir("graft_wire_")
    def keysOf(path: String): Set[String] =
      JsonMethods.parse(Fs.readString(spark, path)) match {
        case o: org.json4s.JObject => o.obj.map(_._1).toSet
        case _ => fail(s"$path is not a JSON object")
      }
    Artifacts.saveBpeVocab(spark, s"$tmp/v.json", new BpeVocab(Array("x")))
    assert(keysOf(s"$tmp/v.json") ==
      Set("kind", "formatVersion", "fingerprint", "tokens"))
    Artifacts.saveTextModel(spark, s"$tmp/m.json",
      new LinearTextModel(Array("x"), Array(1.0), 0.0, false))
    assert(keysOf(s"$tmp/m.json") == Set("kind", "formatVersion",
      "fingerprint", "grams", "weights", "bias", "useBigrams"))
    Artifacts.saveCentroids(spark, s"$tmp/c.json",
      new CentroidSet(Array(Array(1.0f))), Array(1L))
    assert(keysOf(s"$tmp/c.json") == Set("kind", "formatVersion",
      "fingerprint", "dim", "centroids", "nAssigned"))
    Artifacts.saveUnigramLm(spark, s"$tmp/lm.json",
      new graft.functions.UnigramLm(Array("x"), Array(1L), 0.5))
    assert(keysOf(s"$tmp/lm.json") == Set("kind", "formatVersion",
      "fingerprint", "grams", "counts", "alpha"))
    Artifacts.saveBigramLm(spark, s"$tmp/blm.json",
      new graft.functions.BigramLm(
        new graft.functions.UnigramLm(Array("x"), Array(1L), 0.5),
        Array.empty, Array.empty, 0.4))
    assert(keysOf(s"$tmp/blm.json") == Set("kind", "formatVersion",
      "fingerprint", "grams", "counts", "alpha", "bigrams", "condProbs",
      "backoff"))
  }
}
