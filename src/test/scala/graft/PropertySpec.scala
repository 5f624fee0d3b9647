package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.{Blooms, VectorOps}
import graft.operators.Dedup

/** Seeded randomized checks for the custom codegen'd expressions: they must
  * agree exactly with the composable built-ins they replace, across many
  * random inputs (one Spark job per batch, 200 cases per property). */
class PropertySpec extends GraftSuite {
  private val rnd = new Random(42)
  private val vocab = Vector("a", "b", "c", "dd", "ee", "ff", "longer", "token", "zz")

  private def randomSet(): Seq[String] =
    Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).distinct

  test("sortedIntersectCount == size(array_intersect) over 200 random set pairs") {
    import spark.implicits._
    val cases = Seq.fill(200)((randomSet(), randomSet()))
    val df = cases.toDF("a", "b")
      .select(array_sort(col("a")).as("sa"), array_sort(col("b")).as("sb"))
      .select(
        VectorOps.sortedIntersectCount(col("sa"), col("sb")).as("merge"),
        size(array_intersect(col("sa"), col("sb"))).as("builtin"))
    assert(df.where(col("merge") =!= col("builtin")).count() == 0)
  }

  test("canonicalUrl is idempotent over 200 random messy URLs") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val schemes = Seq("http://", "https://")
    val hosts = Seq("WWW.Example.COM", "a.B.site.org", "CDN.x.Net", "host")
    val paths = Seq("", "/", "/P/Q", "/deep/Path/", "/x")
    val params = Seq("a=1", "utm_source=x", "id=9", "fbclid=zz", "b=", "gclid=k",
      "utm_medium=email", "q=Hello")
    val frags = Seq("", "#frag", "#sec-2")
    def randomUrl(): String = {
      val q = Seq.fill(rnd.nextInt(4))(params(rnd.nextInt(params.size)))
      val qs = if (q.isEmpty) "" else "?" + q.mkString("&")
      schemes(rnd.nextInt(2)) + hosts(rnd.nextInt(hosts.size)) +
        paths(rnd.nextInt(paths.size)) + qs + frags(rnd.nextInt(frags.size))
    }
    val df = Seq.fill(200)(randomUrl()).toDF("url")
      .select(TextAnalysis.canonicalUrl(col("url")).as("c1"))
      .select(col("c1"), TextAnalysis.canonicalUrl(col("c1")).as("c2"))
    val bad = df.where(col("c1") =!= col("c2")).collect()
    assert(bad.isEmpty, bad.take(3).mkString(", "))
  }

  test("jaccardSorted == built-in jaccard over 200 random nonempty set pairs") {
    import spark.implicits._
    val cases = Seq.fill(200)((randomSet() :+ "x", randomSet() :+ "y"))
    val df = cases.toDF("a", "b")
      .select(array_sort(col("a")).as("sa"), array_sort(col("b")).as("sb"))
      .select(
        Dedup.jaccardSorted(col("sa"), col("sb")).as("merge"),
        Dedup.jaccard(col("sa"), col("sb")).as("builtin"))
    assert(df.where(col("merge") =!= col("builtin")).count() == 0)
  }

  test("duplicateClusters == union-find on random graphs (incl. long chains)") {
    import spark.implicits._
    for (trial <- 1 to 3) {
      // random sparse graph over a small id space (forces merges), plus one
      // deliberate 40-node chain — the worst case for plain propagation and
      // exactly what path-halving exists for
      val randomEdges = Seq.fill(60)(
        (rnd.nextInt(50).toLong + 100L, rnd.nextInt(50).toLong + 100L))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      val chain = (0 until 40).map(i => (i.toLong, i.toLong + 1))
      val edges = (randomEdges ++ chain).distinct
      val got = Dedup.duplicateClusters(edges.toDF("a_id", "b_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      // driver union-find oracle
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = parent.keys.map(k => (k, find(k))).toMap
      assert(got == want, s"trial $trial: CC disagrees with union-find")
    }
  }

  test("asOf + asOfBucketed match brute force on random data (dup/negative ts)") {
    import spark.implicits._
    import graft.operators.AsOfJoin
    // keys from a tiny space force heavy collisions; ts from a small range
    // forces duplicate and NEGATIVE timestamps (bucket ids from `div`
    // truncate toward zero — monotone, which is all the bucketing needs)
    def side(n: Int) = Seq.fill(n)(
      (rnd.nextInt(4).toLong, (rnd.nextInt(41) - 20).toLong, rnd.nextInt(1000).toLong))
    for (trial <- 1 to 3) {
      val lrows = side(60)
      val rrows0 = side(40)
      // unique (key, ts) on the right pins a single deterministic winner
      val rrows = rrows0.groupBy(r => (r._1, r._2)).values.map(_.maxBy(_._3)).toSeq
      val l = lrows.toDF("k", "lts", "lid")
      val r = rrows.toDF("k", "rts", "rv")
      val got = AsOfJoin.asOf(l, r, Seq("k"), "lts", "rts", valueCols = Seq("rv"))
        .select("k", "lts", "lid", "rv")
      val gotBucketed = AsOfJoin.asOfBucketed(l, r, Seq("k"), "lts", "rts",
        valueCols = Seq("rv"), bucketWidth = 7L)
        .select("k", "lts", "lid", "rv")
      val brute = lrows.map { case (k, lts, lid) =>
        val best = rrows.filter(rr => rr._1 == k && rr._2 <= lts)
          .sortBy(rr => (rr._2, rr._3)).lastOption
        (k, lts, lid, best.map(_._3))
      }.toDF("k", "lts", "lid", "rv")
      assertSameRows(got, brute)
      assertSameRows(gotBucketed, brute)
    }
  }

  test("intervalJoin matches brute containment on random data (negative ts)") {
    import spark.implicits._
    import graft.operators.IntervalJoin
    val pts = Seq.fill(50)(
      (rnd.nextInt(3).toLong, (rnd.nextInt(61) - 30).toLong, rnd.nextInt(1000).toLong))
    val ivs = Seq.fill(20) {
      val lo = (rnd.nextInt(61) - 30).toLong
      (rnd.nextInt(3).toLong, lo, lo + rnd.nextInt(15).toLong, rnd.nextInt(1000).toLong)
    }
    val got = IntervalJoin.joinPointsToIntervals(
      pts.toDF("k", "ts", "pid"), ivs.toDF("k", "lo", "hi", "vid"),
      Seq("k"), "ts", "lo", "hi", binWidth = 9L, valueCols = Seq("vid"))
    val brute = (for {
      (pk, pts_, pid) <- pts
      (ik, lo, hi, vid) <- ivs
      if pk == ik && pts_ >= lo && pts_ <= hi
    } yield (pk, pts_, pid, vid)).toDF("k", "ts", "pid", "vid")
    assertSameRows(got, brute)
  }

  test("bloom filter has no false negatives over 500 random values") {
    import spark.implicits._
    val values = Seq.fill(500)(rnd.alphanumeric.take(1 + rnd.nextInt(20)).mkString)
    val bytesRow = values.toDF("v")
      .agg(Blooms.bloomAgg(col("v"), 10000, 0.01).as("b")).first()
    val bf = Blooms.deserialize(bytesRow.getAs[Array[Byte]](0))
    values.foreach(x => assert(bf.mightContainString(x), s"false negative: $x"))
  }

  private def randomText(): String =
    Seq.fill(1 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))).mkString(" ")

  test("MinHashSignature expression == explode+agg formulation (per component)") {
    import spark.implicits._
    val docs = (1L to 50L).map(i => (i, randomText())).toDF("id", "text")
    val viaExpr = Dedup.minhashSignatures(docs, "id", "text", 32)
    val viaAgg = Dedup.minhashSignaturesAgg(docs, "id", "text", 32)
    assertSameRows(viaExpr, viaAgg)
  }

  test("SimHash64 expression == explode+64-sum aggregate formulation") {
    import spark.implicits._
    val docs = (1L to 100L).map(i => (i, randomText())).toDF("id", "text")
    val viaExpr = Dedup.simhash(docs, "id", "text")
    val viaAgg = Dedup.simhashAgg(docs, "id", "text")
    assertSameRows(viaExpr, viaAgg)
  }

  test("HashStringArraySorted == array_sort(transform(_, hash))") {
    import spark.implicits._
    val cases = Seq.fill(200)(randomSet())
    val df = cases.toDF("a").select(
      Dedup.hashedSet(col("a")).as("expr"),
      Dedup.hashedSetHof(col("a")).as("hof"))
    assert(df.where(col("expr") =!= col("hof")).count() == 0)
  }

  test("HashedNgramSet == hashed distinct substr trigram set") {
    import spark.implicits._
    val texts = Seq.fill(200)(randomText()) :+ "ab" :+ "a" :+ "abc"
    val df = texts.toDF("t").select(
      VectorOps.hashedNgramSet(col("t"), 3).as("expr"),
      array_sort(array_distinct(transform(
        Dedup.ngramSet(col("t"), 3), g => hash(g)))).as("hof"))
    assert(df.where(col("expr") =!= col("hof")).count() == 0)
  }

  test("segmented table: 40 random write ops always equal the in-memory model") {
    import spark.implicits._
    import graft.store.SnapshotTable
    val rnd = new Random(4242)
    val t = new SnapshotTable(spark, tmpDir("graft_segprop_") + "/tbl")
    // model: key -> live values (multi-row per key, like overflow tables)
    val model = scala.collection.mutable.Map.empty[String, Seq[Long]]
    val keys = (0 until 8).map(i => s"k$i")
    def someRows(): Map[String, Seq[Long]] =
      rnd.shuffle(keys).take(1 + rnd.nextInt(3))
        .map(k => k -> Seq.fill(1 + rnd.nextInt(4))(rnd.nextLong() & 0xffffL))
        .toMap
    def toDf(m: Map[String, Seq[Long]]) =
      m.toSeq.flatMap { case (k, vs) => vs.map(k -> _) }.toDF("filename", "value")
    spark.conf.set("spark.graft.maxOverflowSegments", (2 + rnd.nextInt(5)).toString)
    try {
      (0 until 40).foreach { i =>
        rnd.nextInt(10) match {
          case 0 =>
            val m = someRows()
            t.overwrite(toDf(m)); model.clear(); model ++= m
          case 1 | 2 =>
            val del = rnd.shuffle(keys).take(1 + rnd.nextInt(2))
            t.deleteLiteralKeys("filename", del); del.foreach(model.remove)
          case 3 => t.compact()
          case _ =>
            val m = someRows()
            // manifest may claim MORE keys than the delta has rows for
            val claimed = (m.keys ++ rnd.shuffle(keys).take(rnd.nextInt(2))).toSeq.distinct
            t.appendReplacing(toDf(m), "filename", claimed)
            claimed.foreach(model.remove); model ++= m
        }
        val got = t.read().get.collect()
          .map(r => (r.getString(0), r.getLong(1)))
          .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
        val want = model.toMap.view.mapValues(_.sorted).toMap
        assert(got == want, s"divergence after op $i: got=$got want=$want")
      }
    } finally spark.conf.unset("spark.graft.maxOverflowSegments")
  }

  test("FirstEqualIndex finds the first agreeing band") {
    import spark.implicits._
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(9L, 2L, 3L), 1),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L), 0),
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L), -1)
    ).toDF("a", "b", "want")
    assert(df.where(
      VectorOps.firstEqualIndex(col("a"), col("b")) =!= col("want")).count() == 0)
  }

  test("asOf on timestamps == asOf on micros over random data (prop)") {
    import spark.implicits._
    import graft.operators.AsOfJoin
    def ts(us: Long) = java.time.LocalDateTime
      .ofEpochSecond(us / 1000000, (us % 1000000).toInt * 1000,
        java.time.ZoneOffset.UTC)
    for (_ <- 1 to 3) {
      val lrows = Seq.fill(50)(
        (rnd.nextInt(4).toLong, rnd.nextInt(1000).toLong * 250000L,
          rnd.nextInt(1000).toLong))
      val rrows = Seq.fill(30)(
        (rnd.nextInt(4).toLong, rnd.nextInt(1000).toLong * 250000L,
          rnd.nextInt(1000).toLong))
        .groupBy(r => (r._1, r._2)).values.map(_.maxBy(_._3)).toSeq
      val lT = lrows.map { case (k, u, id) => (k, ts(u), id) }.toDF("k", "lts", "lid")
      val rT = rrows.map { case (k, u, v) => (k, ts(u), v) }.toDF("k", "rts", "rv")
      val lN = lrows.toDF("k", "lts", "lid")
      val rN = rrows.toDF("k", "rts", "rv")
      for (dir <- Seq("backward", "forward")) {
        val gotT = AsOfJoin.asOfBucketed(lT, rT, Seq("k"), "lts", "rts",
          valueCols = Seq("rv"), bucketWidth = 1000000L, direction = dir)
          .select($"k", expr("unix_micros(cast(lts as timestamp))").as("lts"),
            $"lid", $"rv")
        val gotN = AsOfJoin.asOfBucketed(lN, rN, Seq("k"), "lts", "rts",
          valueCols = Seq("rv"), bucketWidth = 1000000L, direction = dir)
          .select("k", "lts", "lid", "rv")
        assertSameRows(gotT, gotN)
      }
    }
  }

  test("int8 quantization roundtrip error <= scale/2 per element (prop)") {
    import spark.implicits._
    import graft.operators.Similarity
    val cases = Seq.fill(200)(
      (rnd.nextLong(), Seq.fill(8)(rnd.nextFloat() * 20 - 10)))
    val bad = Similarity.quantizeInt8(cases.toDF("id", "embedding"), "embedding")
      .select(size(filter(
        zip_with(col("embedding"), col("qvec"),
          (x, q) => abs(x.cast("double") - q.cast("double") * col("scale"))),
        e => e > col("scale") * 0.5 + 1e-12)).as("n_bad"))
      .agg(sum("n_bad")).first().getLong(0)
    assert(bad == 0, s"$bad elements exceeded the rounding bound")
  }

  test("FloatVectorDot == left-fold double dot over 200 random vectors") {
    import spark.implicits._
    val cases = Seq.fill(200)((
      Seq.fill(8)(rnd.nextFloat() * 20 - 10),
      Seq.fill(8)(rnd.nextFloat() * 20 - 10)))
    val got = cases.toDF("a", "b")
      .select(VectorOps.dotF(col("a"), col("b")).as("d")).collect().map(_.getDouble(0))
    val want = cases.map { case (a, b) =>
      a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1.toDouble * p._2.toDouble)
    }
    got.zip(want).foreach { case (g, w) => assert(g == w) }
  }

  test("span-cut family == driver-side token walk on random corpora (prop)") {
    import spark.implicits._
    // tiny token alphabet + short docs: heavy overlap by construction, so
    // duplicated windows / cross hits / merges all fire frequently
    def randomDoc(): String =
      Seq.fill(3 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val w = 3
    // driver reference: remove every token covered by a bad window start
    def cutRef(text: String, starts: Seq[Int]): (String, Long) = {
      val toks = text.split(" ", -1)
      val covered = starts.flatMap(p => p until math.min(p + w, toks.length)).toSet
      (toks.indices.filterNot(covered).map(toks).mkString(" "), covered.size.toLong)
    }
    def windows(text: String): Seq[(Int, Seq[String])] = {
      val toks = text.toLowerCase.split(" ", -1).toSeq
      if (toks.length < w) Nil
      else (0 to toks.length - w).map(p => p -> toks.slice(p, p + w))
    }
    for (round <- 1 to 10) {
      val corpus = (1L to 30L).map(i => (i, randomDoc()))
      val probe = (1L to 8L).map(i => (i, randomDoc()))
      // (a) removeDuplicateSpans: bad = windows in >= 2 distinct docs
      val byWin = corpus.flatMap { case (id, t) =>
        windows(t).map { case (_, win) => (win, id) } }
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
      val dupRef = corpus.map { case (id, t) =>
        val starts = windows(t).collect {
          case (p, win) if byWin(win) >= 2 => p }
        val (clean, n) = cutRef(t, starts); (id, clean, n)
      }.toDF("doc_id", "text_clean", "n_removed")
      val dupGot = Dedup.removeDuplicateSpans(
        corpus.toDF("doc_id", "text"), "doc_id", "text", windowTokens = w)
        .select("doc_id", "text_clean", "n_removed")
      assertSameRows(dupGot, dupRef)
      // (b) removeContaminatedSpans: bad = any window of the probe corpus
      val probeWins = probe.flatMap { case (_, t) => windows(t).map(_._2) }.toSet
      val conRef = corpus.map { case (id, t) =>
        val starts = windows(t).collect {
          case (p, win) if probeWins(win) => p }
        val (clean, n) = cutRef(t, starts); (id, clean, n)
      }.toDF("doc_id", "text_clean", "n_removed")
      val conGot = Dedup.removeContaminatedSpans(corpus.toDF("doc_id", "text"),
        probe.toDF("doc_id", "text"), "doc_id", "text", windowTokens = w)
        .select("doc_id", "text_clean", "n_removed")
      assertSameRows(conGot, conRef)
    }
  }

  test("artifact round trips survive 50 random models (r7 wire formats)") {
    import graft.store.Artifacts
    val dir = tmpDir("graft_art_prop_")
    def randToken(): String = {
      // exercise the full hazard surface: unicode, separators-adjacent
      // control chars, spaces, quotes, backslashes, empties
      val alphabet = "ab cé\"\\&#;\nz"
      Seq.fill(rnd.nextInt(6))(alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    for (i <- 1 to 50) {
      val vocab = new graft.functions.BpeVocab(
        Array.fill(rnd.nextInt(8))(randToken()).distinct)
      Artifacts.saveBpeVocab(spark, s"$dir/v$i.json", vocab)
      val lv = Artifacts.loadBpeVocab(spark, s"$dir/v$i.json",
        Some(Artifacts.fingerprintOf(vocab)))
      assert(lv.tokens.toSeq == vocab.tokens.toSeq, s"case $i")

      val grams = Array.fill(rnd.nextInt(6))(randToken()).distinct
      val lm = new graft.functions.UnigramLm(grams,
        Array.fill(grams.length)(rnd.nextInt(1000).toLong + 1),
        rnd.nextDouble() + 1e-6)
      Artifacts.saveUnigramLm(spark, s"$dir/lm$i.json", lm)
      val llm = Artifacts.loadUnigramLm(spark, s"$dir/lm$i.json",
        Some(Artifacts.fingerprintOf(lm)))
      assert(llm.grams.toSeq == lm.grams.toSeq &&
        llm.counts.toSeq == lm.counts.toSeq &&
        llm.unkLogProb == lm.unkLogProb, s"case $i")

      val m = rnd.nextInt(5)
      val tm = new graft.functions.LinearTextModel(
        Array.tabulate(m)(j => randToken() + j),  // unique grams
        Array.fill(m)(rnd.nextGaussian()),
        rnd.nextGaussian(), rnd.nextBoolean())
      Artifacts.saveTextModel(spark, s"$dir/tm$i.json", tm)
      val ltm = Artifacts.loadTextModel(spark, s"$dir/tm$i.json",
        Some(Artifacts.fingerprintOf(tm)))
      assert(ltm.weights.toSeq == tm.weights.toSeq &&
        ltm.bias == tm.bias, s"case $i")
    }
  }

  test("corpusShuffle is growth-stable and seed-independent (prop)") {
    import spark.implicits._
    import graft.operators.Sampling
    // random base corpus + random appended batch with disjoint ids
    val baseIds = rnd.shuffle((0L until 400L).toVector).take(250)
    val extraIds = (1000L until 1000L + rnd.nextInt(200) + 50L).toVector
    val seed = rnd.nextLong()

    def perm(ids: Seq[Long], sd: Long): Map[Long, (Long, Long)] =
      Sampling.corpusShuffle(ids.toDF("id"), "id", nShards = 4, seed = sd)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    val before = perm(baseIds, seed)
    val after = perm(baseIds ++ extraIds, seed)
    // growth-stable: no existing row changes shard...
    for (id <- baseIds)
      assert(after(id)._1 == before(id)._1, s"id $id moved shard on append")
    // ...and no two existing rows swap relative order within a shard
    for (shard <- 0L until 4L) {
      val orderBefore = baseIds.filter(before(_)._1 == shard)
        .sortBy(before(_)._2)
      val orderAfter = baseIds.filter(after(_)._1 == shard)
        .sortBy(after(_)._2)
      assert(orderBefore == orderAfter, s"shard $shard reordered on append")
    }
    // positions stay dense 1..n per shard
    for (shard <- 0L until 4L) {
      val pos = after.collect { case (_, (s, p)) if s == shard => p }.toSeq.sorted
      assert(pos == (1L to pos.length).toSeq, s"shard $shard not dense")
    }
    // run-stable: identical recompute
    assert(perm(baseIds, seed) == before)
    // seed-independent: a different seed yields a different permutation
    val otherSeed = seed + 1
    val reshuffled = perm(baseIds, otherSeed)
    assert(baseIds.exists(id => reshuffled(id) != before(id)),
      "different seeds produced the identical permutation")
  }

  test("capPerGroup: exact caps, repartition/salt invariance on random skewed data (prop)") {
    import spark.implicits._
    import graft.operators.Sampling
    // heavy skew: one mega group, several mid groups, many singletons
    val rows = (1L to 5000L).map { id =>
      val g = if (id <= 3000) "mega"
        else if (id <= 4500) s"mid${id % 7}"
        else s"solo$id"
      (id, g)
    }
    val df = rows.toDF("id", "g")
    for (maxN <- Seq(1, 17, 400)) {
      val capped = Sampling.capPerGroup(df, Seq("g"), maxN, "id")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      // exact per-group sizes
      val sizes = capped.groupBy(_._2).view.mapValues(_.length).toMap
      val orig = rows.groupBy(_._2).view.mapValues(_.length).toMap
      for ((g, n) <- orig)
        assert(sizes.getOrElse(g, 0) == math.min(n, maxN), s"$g at maxN=$maxN")
      // salted + repartitioned run picks the SAME rows
      val salted = Sampling.capPerGroup(df.repartition(11), Seq("g"), maxN,
        "id", saltBuckets = 16)
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(capped.toSet == salted.toSet, s"maxN=$maxN salted mismatch")
    }
  }

  test("mixCorpora: rates honor the derivation on random weights (prop)") {
    import spark.implicits._
    import graft.operators.Sampling
    val r2 = new Random(7)
    val rows = (1L to 4000L).map { id =>
      (id, s"src${id % 5}", 1L + r2.nextInt(100).toLong)
    }
    val df = rows.toDF("id", "src", "tok")
    for (_ <- 1 to 5) {
      val srcs = (0 until 5).map(i => s"src$i").filter(_ => r2.nextBoolean())
      if (srcs.size >= 2) {
        val weights = srcs.map(s => s -> (0.05 + r2.nextDouble())).toMap
        val mixed = Sampling.mixCorpora(df, "src", "id", col("tok"), weights)
          .collect().map(r => (r.getLong(0), r.getString(1)))
        // only weighted sources; deterministic rerun identical
        assert(mixed.forall { case (_, s) => weights.contains(s) })
        val again = Sampling.mixCorpora(df.repartition(13), "src", "id",
          col("tok"), weights)
          .collect().map(r => (r.getLong(0), r.getString(1)))
        assert(mixed.toSet == again.toSet)
        // the limiting source keeps everything; every source keeps >0 at
        // these sizes and rates >= 0.05/1.05 of its docs in expectation —
        // assert the DERIVED thresholds directly instead of statistics
        val totals = rows.filter(t => weights.contains(t._2))
          .groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
        val total = weights.map { case (s, w) => totals(s).toDouble / w }.min
        def thr(s: String): String = {
          val rate = math.min(weights(s) * total / totals(s).toDouble, 1.0)
          f"${math.min((rate * 4294967296.0).toLong, 4294967295L)}%08x"
        }
        val md = java.security.MessageDigest.getInstance("MD5")
        def key(id: Long): String = {
          md.reset()
          md.digest(id.toString.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.substring(0, 8)
        }
        val want = rows.filter(t => weights.contains(t._2))
          .filter(t => key(t._1) < thr(t._2)).map(t => (t._1, t._2)).toSet
        assert(mixed.toSet == want)
      }
    }
  }

  test("tokenEntropy == driver-side reference on random docs incl. " +
      "multi-space and unicode (prop)") {
    import spark.implicits._
    val r = new Random(87)
    val words = Vector("a", "bb", "ccc", "Ωmega", "混合", "x")
    val docs = (0 until 120).map { i =>
      val n = 1 + r.nextInt(30)
      val sep = if (r.nextBoolean()) " " else "  " // forces empty tokens
      (i.toLong, Seq.fill(n)(words(r.nextInt(words.size))).mkString(sep))
    }
    def ref(t: String): Double = {
      val toks = t.toLowerCase.split(" ", -1)
      val m = toks.length.toDouble
      toks.groupBy(identity).values
        .map(g => { val f = g.length / m; -f * math.log(f) }).sum
    }
    val got = docs.toDF("id", "t")
      .select(col("id"), graft.operators.TextAnalysis
        .tokenEntropy(col("t")).as("h"))
      .as[(Long, Double)].collect().toMap
    docs.foreach { case (id, t) =>
      assert(math.abs(got(id) - ref(t)) < 1e-12, s"doc $id: '$t'")
    }
  }

  test("repetitionSignals == driver-side reference on random docs (prop)") {
    import spark.implicits._
    val r = new Random(88)
    val words = Vector("a", "bb", "c", "dd")
    val docs = (0 until 100).map { i =>
      val n = 1 + r.nextInt(20)
      (i.toLong, Seq.fill(n)(words(r.nextInt(words.size))).mkString(" "))
    }
    def refTop(t: String, n: Int): Double = {
      val toks = t.toLowerCase.split(" ", -1)
      val tot = toks.map(_.length).sum.toDouble
      if (toks.length < n) 0.0
      else {
        val grams = toks.sliding(n).map(_.mkString(" ")).toSeq
        val byCnt = grams.groupBy(identity).map { case (g, o) => (g, o.size) }
        val bestCnt = byCnt.values.max
        val bestGram = byCnt.filter(_._2 == bestCnt).keys.min
        bestCnt * (bestGram.length - (n - 1)) / tot
      }
    }
    def refDup(t: String, n: Int): Double = {
      val toks = t.toLowerCase.split(" ", -1)
      val tot = toks.map(_.length).sum.toDouble
      if (toks.length < n) 0.0
      else {
        val grams = toks.sliding(n).map(_.mkString(" ")).toVector
        val cnt = grams.groupBy(identity).map { case (g, o) => (g, o.size) }
        val covered = Array.fill(toks.length)(false)
        grams.zipWithIndex.foreach { case (g, i) =>
          if (cnt(g) >= 2) (i until i + n).foreach(covered(_) = true)
        }
        toks.zipWithIndex.collect {
          case (w, i) if covered(i) => w.length
        }.sum / tot
      }
    }
    val got = graft.operators.TextAnalysis.repetitionSignals(
        docs.toDF("id", "t"), "id", "t", topNs = Seq(2, 3), dupNs = Seq(2, 4))
      .collect().map(row => row.getLong(0) -> row).toMap
    docs.foreach { case (id, t) =>
      val row = got(id)
      assert(math.abs(row.getDouble(1) - refTop(t, 2)) < 1e-12, s"top2 '$t'")
      assert(math.abs(row.getDouble(2) - refTop(t, 3)) < 1e-12, s"top3 '$t'")
      assert(math.abs(row.getDouble(3) - refDup(t, 2)) < 1e-12, s"dup2 '$t'")
      assert(math.abs(row.getDouble(4) - refDup(t, 4)) < 1e-12, s"dup4 '$t'")
    }
  }

  test("CutUpperBound == size(filter(cuts, _ <= v)) over random cuts " +
      "with ties, +-infinities, and boundary values") {
    import spark.implicits._
    val r = new Random(7)
    val cuts = Seq.fill(97)(math.floor(r.nextDouble() * 50)) // heavy ties
      .sorted.toArray
    val vals = Seq.fill(400)(r.nextDouble() * 60 - 5) ++
      cuts.take(10).toSeq ++ // exact boundary hits
      Seq(Double.NegativeInfinity, Double.PositiveInfinity, -1e300, 1e300)
    val df = vals.toDF("v")
    val got = df.select(
      org.apache.spark.sql.GraftSqlBridge.column(
        graft.functions.CutUpperBound(
          org.apache.spark.sql.GraftSqlBridge.expression(col("v")),
          cuts)).as("fast"),
      size(filter(lit(cuts), c => c <= col("v"))).as("slow"))
    assert(got.where(col("fast") =!= col("slow")).count() == 0)
    // null in, null out
    val n = Seq[Option[Double]](None).toDF("v").select(
      org.apache.spark.sql.GraftSqlBridge.column(
        graft.functions.CutUpperBound(
          org.apache.spark.sql.GraftSqlBridge.expression(col("v")),
          cuts))).collect().head
    assert(n.isNullAt(0))
  }

  test("snapshotDiff hash path == column path over random snapshots " +
      "with nulls, empty strings, and near-miss payloads") {
    import spark.implicits._
    import graft.operators.Diff
    // payload pool engineered for digest edge cases: null vs empty vs
    // whitespace vs the same text with a trailing separator-ish char
    val pool: Seq[Option[String]] = Seq(None, Some(""), Some(" "),
      Some("a"), Some("a "), Some("ab"), Some("a\tb"), Some("b"))
    def snapshot(seed: Int): Seq[(Long, Option[String], Option[String])] = {
      val r = new Random(seed)
      (0L until 300L).flatMap { id =>
        if (r.nextDouble() < 0.15) None // absent from this snapshot
        else Some((id, pool(r.nextInt(pool.size)), pool(r.nextInt(pool.size))))
      }
    }
    val o = snapshot(1).toDF("id", "t1", "t2")
    val n = snapshot(2).toDF("id", "t1", "t2")
    val byCols = Diff.snapshotDiff(o, n, "id", Seq("t1", "t2"),
        includeUnchanged = true)
      .select("id", "change")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val byHash = Diff.snapshotDiff(o, n, "id", Seq("t1", "t2"),
        includeUnchanged = true, hashCompare = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byCols == byHash,
      (byCols.toSet diff byHash.toSet).take(5).toString)
  }
}
