package graft.store

import org.apache.spark.sql.SparkSession
import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

import graft.ArtifactFormatException
import graft.functions.{BpeVocab, CentroidSet, LinearTextModel}

/** Persistence for trained artifacts — BPE vocabularies
  * ([[graft.functions.BpeVocab]]), linear text-model weight tables
  * ([[graft.functions.LinearTextModel]]), unigram/bigram language models
  * ([[graft.functions.UnigramLm]]/[[graft.functions.BigramLm]]), and IVF
  * centroid sets ([[graft.functions.CentroidSet]]). A production pipeline trains once
  * and scores for months; these artifacts previously lived only as
  * in-memory objects (r6 verdict item 1).
  *
  * Wire format: one JSON manifest per artifact, written with the store's
  * atomic-replace pattern ([[Fs.writeStringAtomic]] — readers see the old
  * or the new manifest, never a torn write; same discipline as the index
  * metadata, reference: IndexMetadataOperations.scala:125-155). Every
  * manifest carries `kind` + `formatVersion` + a content `fingerprint`
  * (md5 of the payload fields) so that (a) loading the wrong artifact
  * kind fails loudly instead of mis-scoring, (b) a manifest written by a
  * NEWER build refuses to half-load, and (c) a caller can pin the exact
  * vocabulary a token accounting was computed with and detect silent
  * drift (`expectFingerprint`).
  *
  * Size bound: artifacts are driver-bounded by construction (topN-cut
  * weight tables, merge-bounded vocabularies, ≤nCells centroids), so a
  * single JSON file is the right physical shape — no partitioned table
  * needed at any corpus scale.
  */
object Artifacts {
  implicit private val formats: Formats = DefaultFormats

  val BpeVocabKind = "bpe_vocab"
  val TextModelKind = "text_model"
  val CentroidsKind = "ivf_centroids"
  val UnigramLmKind = "unigram_lm"
  val BigramLmKind = "bigram_lm"
  val PqCodebookKind = "pq_codebook"
  val DsirModelKind = "dsir_model"
  val CurrentFormatVersion = 1
  /** Centroids moved to v2 when the fingerprint grew to cover `nAssigned`
    * (r7 advisor: a corrupted counts array must fail the corruption check
    * like every other field). v1 artifacts still load — their stored
    * fingerprint is verified with the v1 (vectors-only) formula. */
  val CentroidsFormatVersion = 2

  private case class BpeVocabManifest(
      kind: String, formatVersion: Int, fingerprint: String,
      tokens: List[String])

  private case class TextModelManifest(
      kind: String, formatVersion: Int, fingerprint: String,
      grams: List[String], weights: List[Double], bias: Double,
      useBigrams: Boolean)

  private case class UnigramLmManifest(
      kind: String, formatVersion: Int, fingerprint: String,
      grams: List[String], counts: List[Long], alpha: Double)

  private case class BigramLmManifest(
      kind: String, formatVersion: Int, fingerprint: String,
      grams: List[String], counts: List[Long], alpha: Double,
      bigrams: List[String], condProbs: List[Double], backoff: Double)

  private case class CentroidsManifest(
      kind: String, formatVersion: Int, fingerprint: String,
      dim: Int, centroids: List[List[Float]], nAssigned: List[Long])

  private case class PqCodebookManifest(
      kind: String, formatVersion: Int, fingerprint: String,
      dim: Int, m: Int, k: Int, centroids: List[List[List[Float]]])

  private case class DsirModelManifest(
      kind: String, formatVersion: Int, fingerprint: String,
      buckets: Int, alpha: Double, logRatios: List[Double])

  private def md5(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  /** Canonical fingerprint of a vocabulary: md5 over the token list in
    * STORED order (order is part of the artifact identity — it is what a
    * user pins to guarantee stable token accounting). */
  def fingerprintOf(vocab: BpeVocab): String =
    md5(vocab.tokens.mkString("\u0000"))

  def fingerprintOf(model: LinearTextModel): String =
    md5(model.grams.mkString("\u0000") + "\u0001" +
      model.weights.map(w => java.lang.Double.doubleToLongBits(w).toString)
        .mkString("\u0000") + "\u0001" +
      java.lang.Double.doubleToLongBits(model.bias) + "\u0001" +
      model.useBigrams)

  def fingerprintOf(lm: graft.functions.UnigramLm): String =
    md5(lm.grams.mkString("\u0000") + "\u0001" +
      lm.counts.mkString("\u0000") + "\u0001" +
      java.lang.Double.doubleToLongBits(lm.alpha))

  def fingerprintOf(lm: graft.functions.BigramLm): String =
    md5(fingerprintOf(lm.unigram) + "\u0001" +
      lm.bigrams.mkString("\u0000") + "\u0001" +
      lm.condProbs.map(p => java.lang.Double.doubleToLongBits(p).toString)
        .mkString("\u0000") + "\u0001" +
      java.lang.Double.doubleToLongBits(lm.backoff))

  /** v1 (vectors-only) centroid fingerprint — kept to verify v1
    * artifacts on load; new saves use the v2 overload below. */
  def fingerprintOf(cs: CentroidSet): String =
    md5(cs.vecs.map(_.map(f => java.lang.Float.floatToIntBits(f).toString)
      .mkString(",")).mkString("\u0000"))

  /** v2 centroid fingerprint: vectors AND assignment counts, so count
    * drift fails the corruption check like every other field (r7
    * advisor). */
  def fingerprintOf(cs: CentroidSet, nAssigned: Array[Long]): String =
    md5(fingerprintOf(cs) + "\u0001" + nAssigned.mkString("\u0000"))

  /** PQ codebook fingerprint: the full shape (dim, m, k) AND every
    * centroid's float bits - any payload drift fails the corruption
    * check. */
  def fingerprintOf(cb: graft.functions.PqCodebook): String =
    md5(s"${cb.dim},${cb.m},${cb.k}" + "\u0001" +
      cb.centroids.map(_.map(
        _.map(f => java.lang.Float.floatToIntBits(f).toString)
          .mkString(",")).mkString("\u0000")).mkString("\u0001"))

  /** DSIR model fingerprint: shape, smoothing, and every log-ratio's
    * double bits. */
  def fingerprintOf(model: graft.operators.Dsir.DsirModel): String =
    md5(s"${model.buckets}" + "\u0001" +
      java.lang.Double.doubleToLongBits(model.alpha) + "\u0001" +
      model.logRatios.map(r =>
        java.lang.Double.doubleToLongBits(r).toString).mkString("\u0000"))

  private def readManifest[T: Manifest](
      spark: SparkSession, path: String, expectedKind: String,
      maxVersion: Int = CurrentFormatVersion): T = {
    if (!Fs.exists(spark, path))
      throw new ArtifactFormatException(s"no artifact at $path")
    val raw = Fs.readString(spark, path)
    // check the (kind, formatVersion) envelope BEFORE the typed extraction,
    // so a wrong-kind load reports the kind mismatch rather than a generic
    // extraction failure
    val json = try org.json4s.jackson.JsonMethods.parse(raw) catch {
      case e: Exception =>
        throw new ArtifactFormatException(s"unreadable artifact at $path", e)
    }
    val kind = (json \ "kind").extractOpt[String].getOrElse(
      throw new ArtifactFormatException(s"artifact at $path has no 'kind'"))
    if (kind != expectedKind)
      throw new ArtifactFormatException(
        s"artifact at $path is '$kind', expected '$expectedKind'")
    val version = (json \ "formatVersion").extractOpt[Int].getOrElse(
      throw new ArtifactFormatException(
        s"artifact at $path has no 'formatVersion'"))
    if (version > maxVersion)
      throw new ArtifactFormatException(
        s"artifact at $path has formatVersion $version; this build reads " +
          s"<= $maxVersion — refusing a partial load")
    try json.extract[T] catch {
      case e: Exception =>
        throw new ArtifactFormatException(s"unreadable artifact at $path", e)
    }
  }

  private def checkFingerprint(
      path: String, stored: String, recomputed: String,
      expect: Option[String]): Unit = {
    if (stored != recomputed)
      throw new ArtifactFormatException(
        s"artifact at $path is corrupt: stored fingerprint $stored != " +
          s"payload fingerprint $recomputed")
    expect.foreach { e =>
      if (e != stored)
        throw new ArtifactFormatException(
          s"artifact at $path has fingerprint $stored, caller pinned $e — " +
            "the trained artifact changed underneath this pipeline")
    }
  }

  // ---- BPE vocabulary ------------------------------------------------------

  def saveBpeVocab(spark: SparkSession, path: String, vocab: BpeVocab): Unit =
    Fs.writeStringAtomic(spark, path, Serialization.writePretty(
      BpeVocabManifest(BpeVocabKind, CurrentFormatVersion,
        fingerprintOf(vocab), vocab.tokens.toList)))

  /** Load a vocabulary; pass `expectFingerprint` (from a previous
    * [[fingerprintOf]]) to pin the exact vocabulary and fail loudly if it
    * changed — a silently-swapped vocab silently changes every downstream
    * token count. */
  def loadBpeVocab(
      spark: SparkSession, path: String,
      expectFingerprint: Option[String] = None): BpeVocab = {
    val m = readManifest[BpeVocabManifest](spark, path, BpeVocabKind)
    val vocab = new BpeVocab(m.tokens.toArray)
    checkFingerprint(path, m.fingerprint, fingerprintOf(vocab),
      expectFingerprint)
    vocab
  }

  // ---- linear text model ---------------------------------------------------

  def saveTextModel(
      spark: SparkSession, path: String, model: LinearTextModel): Unit =
    Fs.writeStringAtomic(spark, path, Serialization.writePretty(
      TextModelManifest(TextModelKind, CurrentFormatVersion,
        fingerprintOf(model), model.grams.toList, model.weights.toList,
        model.bias, model.useBigrams)))

  def loadTextModel(
      spark: SparkSession, path: String,
      expectFingerprint: Option[String] = None): LinearTextModel = {
    val m = readManifest[TextModelManifest](spark, path, TextModelKind)
    if (m.grams.length != m.weights.length)
      throw new ArtifactFormatException(
        s"artifact at $path: ${m.grams.length} grams vs " +
          s"${m.weights.length} weights")
    val model = new LinearTextModel(m.grams.toArray, m.weights.toArray,
      m.bias, m.useBigrams)
    checkFingerprint(path, m.fingerprint, fingerprintOf(model),
      expectFingerprint)
    model
  }

  // ---- unigram LM ----------------------------------------------------------

  def saveUnigramLm(
      spark: SparkSession, path: String,
      lm: graft.functions.UnigramLm): Unit =
    Fs.writeStringAtomic(spark, path, Serialization.writePretty(
      UnigramLmManifest(UnigramLmKind, CurrentFormatVersion,
        fingerprintOf(lm), lm.grams.toList, lm.counts.toList, lm.alpha)))

  def loadUnigramLm(
      spark: SparkSession, path: String,
      expectFingerprint: Option[String] = None): graft.functions.UnigramLm = {
    val m = readManifest[UnigramLmManifest](spark, path, UnigramLmKind)
    if (m.grams.length != m.counts.length)
      throw new ArtifactFormatException(
        s"artifact at $path: ${m.grams.length} grams vs " +
          s"${m.counts.length} counts")
    val lm = new graft.functions.UnigramLm(
      m.grams.toArray, m.counts.toArray, m.alpha)
    checkFingerprint(path, m.fingerprint, fingerprintOf(lm),
      expectFingerprint)
    lm
  }

  // ---- bigram LM -----------------------------------------------------------

  def saveBigramLm(
      spark: SparkSession, path: String,
      lm: graft.functions.BigramLm): Unit =
    Fs.writeStringAtomic(spark, path, Serialization.writePretty(
      BigramLmManifest(BigramLmKind, CurrentFormatVersion,
        fingerprintOf(lm), lm.unigram.grams.toList, lm.unigram.counts.toList,
        lm.unigram.alpha, lm.bigrams.toList, lm.condProbs.toList,
        lm.backoff)))

  def loadBigramLm(
      spark: SparkSession, path: String,
      expectFingerprint: Option[String] = None): graft.functions.BigramLm = {
    val m = readManifest[BigramLmManifest](spark, path, BigramLmKind)
    if (m.grams.length != m.counts.length ||
        m.bigrams.length != m.condProbs.length)
      throw new ArtifactFormatException(
        s"artifact at $path: gram/count or bigram/condProb length mismatch")
    val lm = new graft.functions.BigramLm(
      new graft.functions.UnigramLm(m.grams.toArray, m.counts.toArray, m.alpha),
      m.bigrams.toArray, m.condProbs.toArray, m.backoff)
    checkFingerprint(path, m.fingerprint, fingerprintOf(lm),
      expectFingerprint)
    lm
  }

  // ---- IVF centroids -------------------------------------------------------

  /** Save a centroid set plus the final-iteration assignment counts
    * ([[graft.operators.Similarity.trainCentroids]]'s `n_assigned`). */
  def saveCentroids(
      spark: SparkSession, path: String, cs: CentroidSet,
      nAssigned: Array[Long]): Unit = {
    require(nAssigned.length == cs.size,
      s"nAssigned length ${nAssigned.length} != ${cs.size} centroids")
    Fs.writeStringAtomic(spark, path, Serialization.writePretty(
      CentroidsManifest(CentroidsKind, CentroidsFormatVersion,
        fingerprintOf(cs, nAssigned),
        if (cs.size == 0) 0 else cs.vecs(0).length,
        cs.vecs.map(_.toList).toList, nAssigned.toList)))
  }

  // ---- PQ codebook ---------------------------------------------------------

  /** Save a product-quantization codebook
    * ([[graft.operators.Similarity.trainPqCodebook]]). */
  def savePqCodebook(
      spark: SparkSession, path: String,
      cb: graft.functions.PqCodebook): Unit =
    Fs.writeStringAtomic(spark, path, Serialization.writePretty(
      PqCodebookManifest(PqCodebookKind, CurrentFormatVersion,
        fingerprintOf(cb), cb.dim, cb.m, cb.k,
        cb.centroids.map(_.map(_.toList).toList).toList)))

  def loadPqCodebook(
      spark: SparkSession, path: String,
      expectFingerprint: Option[String] = None): graft.functions.PqCodebook = {
    val mf = readManifest[PqCodebookManifest](spark, path, PqCodebookKind)
    if (mf.centroids.length != mf.m ||
        mf.centroids.exists(_.length != mf.k) ||
        (mf.m > 0 && mf.m * mf.centroids.head.headOption
          .map(_.length).getOrElse(0) != mf.dim))
      throw new ArtifactFormatException(
        s"artifact at $path: centroid shape " +
          s"${mf.centroids.length}×${mf.centroids.map(_.length).distinct} " +
          s"does not match declared m=${mf.m} k=${mf.k} dim=${mf.dim}")
    val cb = new graft.functions.PqCodebook(mf.dim,
      mf.centroids.map(_.map(_.toArray).toArray).toArray)
    checkFingerprint(path, mf.fingerprint, fingerprintOf(cb),
      expectFingerprint)
    cb
  }

  // ---- DSIR importance model -----------------------------------------------

  /** Save a DSIR importance model ([[graft.operators.Dsir.train]]). */
  def saveDsirModel(
      spark: SparkSession, path: String,
      model: graft.operators.Dsir.DsirModel): Unit =
    Fs.writeStringAtomic(spark, path, Serialization.writePretty(
      DsirModelManifest(DsirModelKind, CurrentFormatVersion,
        fingerprintOf(model), model.buckets, model.alpha,
        model.logRatios.toList)))

  def loadDsirModel(
      spark: SparkSession, path: String,
      expectFingerprint: Option[String] = None): graft.operators.Dsir.DsirModel = {
    val mf = readManifest[DsirModelManifest](spark, path, DsirModelKind)
    if (mf.logRatios.length != mf.buckets)
      throw new ArtifactFormatException(
        s"artifact at $path: ${mf.logRatios.length} log ratios vs " +
          s"declared buckets=${mf.buckets}")
    val model = graft.operators.Dsir.DsirModel(
      mf.buckets, mf.alpha, mf.logRatios.toArray)
    checkFingerprint(path, mf.fingerprint, fingerprintOf(model),
      expectFingerprint)
    model
  }

  // ---- directory -----------------------------------------------------------

  /** One artifact's catalog entry — envelope fields plus a kind-aware
    * payload summary ("50000 tokens", "k=64 dim=128", …). */
  case class ArtifactInfo(
      path: String, name: String, kind: String, formatVersion: Int,
      fingerprint: String, sizeBytes: Long, modifiedMs: Long,
      summary: String)

  private def payloadSummary(kind: String, json: org.json4s.JValue): String = {
    def len(field: String): Int = (json \ field) match {
      case org.json4s.JArray(xs) => xs.length
      case _ => -1
    }
    kind match {
      case BpeVocabKind => s"${len("tokens")} tokens"
      case TextModelKind =>
        val bi = (json \ "useBigrams").extractOpt[Boolean].getOrElse(false)
        s"${len("grams")} grams, bigrams=$bi"
      case UnigramLmKind =>
        s"${len("grams")} grams, alpha=" +
          (json \ "alpha").extractOpt[Double].getOrElse(Double.NaN)
      case BigramLmKind =>
        s"${len("grams")} grams + ${len("bigrams")} bigrams, backoff=" +
          (json \ "backoff").extractOpt[Double].getOrElse(Double.NaN)
      case CentroidsKind =>
        s"k=${len("centroids")} dim=" +
          (json \ "dim").extractOpt[Int].getOrElse(-1)
      case PqCodebookKind =>
        s"m=${(json \ "m").extractOpt[Int].getOrElse(-1)} " +
          s"k=${(json \ "k").extractOpt[Int].getOrElse(-1)} dim=" +
          (json \ "dim").extractOpt[Int].getOrElse(-1)
      case DsirModelKind =>
        s"${(json \ "buckets").extractOpt[Int].getOrElse(-1)} buckets, " +
          "alpha=" + (json \ "alpha").extractOpt[Double].getOrElse(Double.NaN)
      case _ => ""
    }
  }

  /** Catalog entry for ONE artifact manifest. Reads only the envelope +
    * array lengths — no payload validation (that stays in the typed
    * `load*`); throws [[ArtifactFormatException]] if the file isn't an
    * artifact manifest at all. */
  def describe(spark: SparkSession, path: String): ArtifactInfo = {
    if (!Fs.exists(spark, path))
      throw new ArtifactFormatException(s"no artifact at $path")
    val raw = Fs.readString(spark, path)
    val json = try org.json4s.jackson.JsonMethods.parse(raw) catch {
      case e: Exception =>
        throw new ArtifactFormatException(s"unreadable artifact at $path", e)
    }
    val kind = (json \ "kind").extractOpt[String].getOrElse(
      throw new ArtifactFormatException(s"artifact at $path has no 'kind'"))
    val version = (json \ "formatVersion").extractOpt[Int].getOrElse(
      throw new ArtifactFormatException(
        s"artifact at $path has no 'formatVersion'"))
    val fp = (json \ "fingerprint").extractOpt[String].getOrElse(
      throw new ArtifactFormatException(
        s"artifact at $path has no 'fingerprint'"))
    val name = new org.apache.hadoop.fs.Path(path).getName
    ArtifactInfo(path, name, kind, version, fp,
      Fs.fileSize(spark, path), Fs.modificationTime(spark, path),
      payloadSummary(kind, json))
  }

  /** Every artifact manifest directly under `dir` (non-recursive), sorted
    * by name. Files that aren't artifact manifests (no parseable
    * kind/formatVersion/fingerprint envelope) are skipped — a model
    * directory legitimately holds other small files; corruption detection
    * belongs to the typed `load*` fingerprint check, not the listing
    * (the [[graft.IndexCatalog]] discipline). Driver-bounded: one small
    * JSON read per file of ONE directory listing. */
  def list(spark: SparkSession, dir: String): Seq[ArtifactInfo] =
    Fs.listFiles(spark, dir).sorted.flatMap { f =>
      try Some(describe(spark, dir.stripSuffix("/") + "/" + f))
      catch { case _: ArtifactFormatException => None }
    }

  /** [[list]] as a summary DataFrame — the `IndexCatalog.toDF` pattern for
    * persisted models/vocabs: one row per artifact with kind, version,
    * fingerprint (what a pipeline pins via `expectFingerprint`), size and
    * payload summary. */
  def toDF(spark: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    list(spark, dir)
      .map(a => (a.name, a.kind, a.formatVersion, a.fingerprint, a.sizeBytes,
        new java.sql.Timestamp(a.modifiedMs), a.summary, a.path))
      .toDF("name", "kind", "format_version", "fingerprint", "size_bytes",
        "modified_at", "summary", "path")
  }

  def loadCentroids(
      spark: SparkSession, path: String,
      expectFingerprint: Option[String] = None): (CentroidSet, Array[Long]) = {
    val m = readManifest[CentroidsManifest](spark, path, CentroidsKind,
      maxVersion = CentroidsFormatVersion)
    if (m.centroids.exists(_.length != m.dim))
      throw new ArtifactFormatException(
        s"artifact at $path: centroid dims ${m.centroids.map(_.length).distinct} " +
          s"!= declared dim ${m.dim}")
    if (m.nAssigned.length != m.centroids.length)
      throw new ArtifactFormatException(
        s"artifact at $path: ${m.nAssigned.length} counts vs " +
          s"${m.centroids.length} centroids")
    val cs = new CentroidSet(m.centroids.map(_.toArray).toArray)
    // v1 artifacts were fingerprinted over vectors only; v2 folds in the
    // assignment counts so count drift fails like every other field
    val recomputed =
      if (m.formatVersion >= 2) fingerprintOf(cs, m.nAssigned.toArray)
      else fingerprintOf(cs)
    checkFingerprint(path, m.fingerprint, recomputed, expectFingerprint)
    (cs, m.nAssigned.toArray)
  }
}
