package graft.harness

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Index
import graft.store.Fs

/** Deterministic multi-file "lake" derived from one driver testdata dir
  * (`/root/testdata/sf*`): each table is split into key-banded files so that
  * file pruning is actually observable, then graft indexes are built over the
  * split files. Built once per (JVM, sfDir); all SparkEntry queries share it.
  *
  * The split is value-banded on the PROBED key (band = key * N / (max+1)),
  * mirroring how a real lake clusters files by ingest key or time — this is
  * what makes a selective probe touch 1-2 of N files instead of all of them.
  */
final class Lake private (val spark: SparkSession, val sfDir: String, val work: String) {
  import Lake.splitByBand

  private def table(name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // The band split shuffles rows; anything downstream must not depend on
    // row order, only content.
    df
  }

  // Memoization note: these used to be `lazy val`s, but Scala lazy-val
  // initializers run while holding the instance monitor — concurrent
  // first-touch of DIFFERENT members would serialize, defeating prebuild()'s
  // parallel index builds. Two separate maps (splits vs indexes) because an
  // index initializer forces a split entry: ConcurrentHashMap forbids
  // recursive computeIfAbsent on the SAME map, and cross-map nesting is fine.
  private val splitMemo = new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()
  private val idxMemo = new java.util.concurrent.ConcurrentHashMap[String, Index]()
  private def memoSplit(key: String)(body: => Seq[String]): Seq[String] =
    splitMemo.computeIfAbsent(key, _ => body)
  private def memoIdx(key: String)(body: => Index): Index =
    idxMemo.computeIfAbsent(key, _ => body)

  // ---- split files ---------------------------------------------------------

  // `spark.graft.lakeBandScale` multiplies every table's band count (default
  // 1): the correctness suites keep the small deterministic splits, while
  // the scale bench can model a production lake where a table is thousands
  // of files and a full scan pays for every one of them.
  private def bandScale: Int =
    scala.util.Try(spark.conf.get("spark.graft.lakeBandScale", "1").toInt)
      .toOption.filter(_ > 0).getOrElse(1)

  // band scale is part of the memo key: a conf change after first touch
  // must re-split, not silently return the old layout
  def ordersFiles: Seq[String] = memoSplit(s"orders@x$bandScale") {
    splitByBand(table("orders"), s"$work/orders", "o_custkey", 8 * bandScale)
  }

  def lineitemFiles: Seq[String] = memoSplit(s"lineitem@x$bandScale") {
    splitByBand(table("lineitem"), s"$work/lineitem", "l_partkey", 8 * bandScale)
  }

  def eventsFiles: Seq[String] = memoSplit(s"events@x$bandScale") {
    splitByBand(table("events"), s"$work/events", "event_id", 6 * bandScale)
  }

  def documentsFiles: Seq[String] = memoSplit(s"documents@x$bandScale") {
    splitByBand(table("documents"), s"$work/documents", "doc_id", 4 * bandScale)
  }

  /** CSV/JSON copies carry a timestamp-free column subset so the round trip
    * is value-exact for the oracle compare. */
  val OrdersTextCols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")

  def ordersCsvFiles: Seq[String] = memoSplit("orders_csv") {
    val dir = s"$work/orders_csv"
    val src = table("orders").select(OrdersTextCols.map(col): _*)
    Lake.splitWrite(src, dir, "o_custkey", 4, (d, p) =>
      d.write.partitionBy("band").mode("overwrite").option("header", "true").csv(p),
      ".csv")
  }

  def ordersJsonFiles: Seq[String] = memoSplit("orders_json") {
    val dir = s"$work/orders_json"
    val src = table("orders").select(OrdersTextCols.map(col): _*)
    Lake.splitWrite(src, dir, "o_custkey", 4, (d, p) =>
      d.write.partitionBy("band").mode("overwrite").json(p), ".json")
  }

  def ordersOrcFiles: Seq[String] = memoSplit("orders_orc") {
    val dir = s"$work/orders_orc"
    val src = table("orders").select(OrdersTextCols.map(col): _*)
    Lake.splitWrite(src, dir, "o_custkey", 4, (d, p) =>
      d.write.partitionBy("band").mode("overwrite").orc(p), ".orc")
  }

  // ---- indexes -------------------------------------------------------------

  /** orders: regular(o_custkey) + range(o_orderkey) + computed month. */
  def ordersIdx: Index = memoIdx("orders_idx") {
    val idx = Index(spark, "orders_idx", table("orders").schema, "parquet")
    idx.addIndex("o_custkey")
    idx.addRangeIndex("o_orderkey")
    idx.addComputedIndex("o_month", "cast(month(o_orderdate) as bigint)")
    idx.addFile(ordersFiles: _*)
    idx.update()
    idx
  }

  /** lineitem: bloom(l_partkey) + regular(l_suppkey). */
  def lineitemIdx: Index = memoIdx("lineitem_idx") {
    val idx = Index(spark, "lineitem_idx", table("lineitem").schema, "parquet")
    idx.addBloomIndex("l_partkey")
    idx.addIndex("l_suppkey")
    idx.addFile(lineitemFiles: _*)
    idx.update()
    idx
  }

  /** events: temporal(user_id by ts) + range(ts) — ts read as epoch-ns
    * long; the range index drives interval-join file pruning. */
  def eventsIdx: Index = memoIdx("events_idx") {
    val idx = Index(spark, "events_idx", table("events").schema, "parquet")
    idx.addTemporalIndex("user_id", "ts")
    idx.addRangeIndex("ts")
    idx.addFile(eventsFiles: _*)
    idx.update()
    idx
  }

  /** events with TWO temporal configs (user_id and event_type, both by ts):
    * the gate for multi-config latest-row dedup (a row must win under EVERY
    * config) and for the containment fallback that multi-column probes use
    * instead of latest-file pruning. */
  def eventsMultiIdx: Index = memoIdx("events_multi_idx") {
    val idx = Index(spark, "events_multi_idx", table("events").schema, "parquet")
    idx.addTemporalIndex("user_id", "ts")
    idx.addTemporalIndex("event_type", "ts")
    idx.addFile(eventsFiles: _*)
    idx.update()
    idx
  }

  /** documents: exploded token index + regular(lang). */
  def docsIdx: Index = memoIdx("docs_idx") {
    val idx = Index(spark, "docs_idx", table("documents").schema, "parquet")
    idx.addExplodedIndex("tok", "split(text, ' ')")
    idx.addIndex("lang")
    idx.addFile(documentsFiles: _*)
    idx.update()
    idx
  }

  /** Content-hash index over the document lake: the incremental-dedup
    * serving path ("does this new batch duplicate anything already
    * ingested?") — a computed md5 index prunes the lake read to files
    * that could hold a colliding hash. */
  def docsHashIdx: Index = memoIdx("docs_hash_idx") {
    val idx = Index(spark, "docs_hash_idx", table("documents").schema, "parquet")
    idx.addComputedIndex("content_md5", "md5(text)")
    idx.addFile(documentsFiles: _*)
    idx.update()
    idx
  }

  /** Window-hash index over the document lake: decontamination at the
    * index layer — per-file distinct 10-token window hashes, so checking a
    * NEW eval release for verbatim overlap reads only lake files that can
    * contain a colliding window (the docsHashIdx pattern applied to
    * window-grain contamination). */
  def docsWindowIdx: Index = memoIdx("docs_window_idx") {
    val idx = Index(spark, "docs_window_idx", table("documents").schema, "parquet")
    idx.addExplodedIndex("win_hash",
      graft.operators.Dedup.windowHashSqlExpr("text", windowTokens = 10))
    idx.addFile(documentsFiles: _*)
    idx.update()
    idx
  }

  /** Bloom-mode twin of [[docsWindowIdx]] (r7 verdict finding #3): the
    * per-file state is a fixed-size bloom over the same window hashes
    * instead of an exploded value array, so the build never routes through
    * the large-index overflow path (window hashes are ~rows × windows
    * distinct values per file — the exploded form's eviction-dominated
    * worst case). Probes answer the same "which files can hold this
    * window" question with fpr-bounded extra reads. */
  def docsWindowBloomIdx: Index = memoIdx("docs_window_bloom_idx") {
    val idx = Index(spark, "docs_window_bloom_idx",
      table("documents").schema, "parquet")
    idx.addExplodedBloomIndex("win_hash",
      graft.operators.Dedup.windowHashSqlExpr("text", windowTokens = 10),
      fpr = 0.01, expectedItems = 2000000L)
    idx.addFile(documentsFiles: _*)
    idx.update()
    idx
  }

  def ordersCsvIdx: Index = memoIdx("orders_csv_idx") {
    val schema = table("orders").select(OrdersTextCols.map(col): _*).schema
    val idx = Index(spark, "orders_csv_idx", schema, "csv",
      readOptions = Map("header" -> "true"))
    idx.addIndex("o_custkey")
    idx.addFile(ordersCsvFiles: _*)
    idx.update()
    idx
  }

  /** orders with a tiny largeIndexLimit: every per-file o_orderkey array is
    * evicted to the large-index overflow table with an auto-bloom — the
    * oracle gate for the large-index + auto-bloom probe path. NOT part of
    * prebuild(): it mutates session conf, which must not race concurrent
    * builds. */
  def ordersLargeIdx: Index = memoIdx("orders_large_idx") {
    spark.conf.set("spark.graft.largeIndexLimit", "50")
    try {
      val idx = Index(spark, "orders_large_idx", table("orders").schema, "parquet")
      idx.addIndex("o_orderkey")
      idx.addFile(ordersFiles: _*)
      idx.update()
      idx
    } finally spark.conf.unset("spark.graft.largeIndexLimit")
  }

  def ordersJsonIdx: Index = memoIdx("orders_json_idx") {
    val schema = table("orders").select(OrdersTextCols.map(col): _*).schema
    val idx = Index(spark, "orders_json_idx", schema, "json")
    idx.addIndex("o_custkey")
    idx.addFile(ordersJsonFiles: _*)
    idx.update()
    idx
  }

  def ordersOrcIdx: Index = memoIdx("orders_orc_idx") {
    val schema = table("orders").select(OrdersTextCols.map(col): _*).schema
    val idx = Index(spark, "orders_orc_idx", schema, "orc")
    idx.addIndex("o_custkey")
    idx.addFile(ordersOrcFiles: _*)
    idx.update()
    idx
  }

  /** Heterogeneous edge lake table for the graph-serving queries:
    * customer→order edges (src = o_custkey, dst = o_orderkey + 10M) plus
    * order→supplier edges (src = l_orderkey + 10M, dst = l_suppkey +
    * 20M), namespaces disjoint so BFS node identity is unambiguous.
    * Files are banded by src WITHIN each edge type (4 customer-src
    * bands, then 4 order-src bands), mirroring a lake that clusters
    * edges by source entity — that's what makes the per-hop endpoint
    * probes of [[graft.operators.Graph.neighborhood]] actually prune. */
  def edgesFiles: Seq[String] = memoSplit(s"edges@x$bandScale") {
    val n = 4 * bandScale
    // `w` = edge weight: 1.0 on customer→order, the lineitem count on
    // order→supplier (how many line items the supplier fills on the
    // order) — the weighted fan-out sampler's importance signal
    val cust = table("orders").select(col("o_custkey").as("src"),
      (col("o_orderkey") + lit(10000000L)).as("dst"),
      lit(1.0).as("w"), lit("c2o").as("etype"))
    val sup = table("lineitem")
      .groupBy((col("l_orderkey") + lit(10000000L)).as("src"),
        (col("l_suppkey") + lit(20000000L)).as("dst"))
      .agg(count(lit(1)).cast("double").as("w"))
      .withColumn("etype", lit("o2s"))
    val maxCust = cust.agg(max("src")).first().getLong(0)
    val maxOrd = sup.agg(max("src")).first().getLong(0) - 10000000L
    val cw = maxCust / n + 1
    val ow = maxOrd / n + 1
    val banded = cust
      .withColumn("band", col("src").divide(cw).cast("long").cast("int"))
      .unionAll(sup.withColumn("band",
        (lit(n) + (col("src") - lit(10000000L)).divide(ow).cast("long"))
          .cast("int")))
    Lake.splitPrebanded(banded, s"$work/edges", 2 * n)
  }

  /** edges: regular(src) + regular(dst) — both endpoints probe-able, the
    * neighborhood/egonet substrate. */
  def edgesIdx: Index = memoIdx("edges_idx") {
    val files = edgesFiles
    val idx = Index(spark, "edges_idx",
      spark.read.parquet(files.head).schema, "parquet")
    idx.addIndex("src")
    idx.addIndex("dst")
    idx.addFile(files: _*)
    idx.update()
    idx
  }

  /** edges, SERVING index shape: range(src) + bloom(dst) — O(files)
    * index rows (one min/max struct + one bloom per file) instead of the
    * regular index's per-file distinct-key arrays, whose locate explodes
    * EVERY stored key and was measured dominating the egonet wall at
    * ×300 (26.5 s probe vs 2.7 s full scan over 2.1 GB — the index held
    * ~260M values). Range prunes exactly on the src banding; the bloom
    * prunes the scattered dst endpoint. The build is one streaming pass
    * (min/max + bloom aggregates), no large-index overflow. */
  def edgesServeIdx: Index = memoIdx("edges_serve_idx") {
    // the serve-shape recipe as library API (range(src) + bloom(dst),
    // O(files) index rows) — the invariance test and ScaleBench both
    // exercise the documented helper, not a hand-rolled copy
    graft.operators.Graph.buildServeIndex(spark, "edges_serve_idx",
      edgesFiles, "src", "dst")
  }

  /** Build every index the query set touches, CONCURRENTLY — the builds are
    * independent (per-index store dirs + locks), and Spark schedules jobs
    * from multiple threads fine. On a real cluster you'd parallelize
    * per-table index builds exactly like this. */
  def prebuild(): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext = Lake.buildEc
    val tasks: Seq[() => Any] = Seq(
      () => ordersIdx, () => lineitemIdx, () => eventsIdx,
      () => docsIdx, () => ordersCsvIdx, () => ordersJsonIdx,
      () => ordersOrcIdx, () => eventsMultiIdx, () => edgesIdx)
    Await.result(Future.sequence(tasks.map(t => Future(t()))), 30.minutes)
    ()
  }

  def customers: DataFrame = table("customer")
  def part: DataFrame = table("part")
  def orders: DataFrame = table("orders")
  def lineitem: DataFrame = table("lineitem")
  def events: DataFrame = table("events")
  def documents: DataFrame = table("documents")
  def embeddings: DataFrame = spark.read.parquet(s"$sfDir/embeddings.parquet")
}

object Lake {
  private val built = TrieMap.empty[String, Lake]

  /** Fixed pool for prebuild(): one thread per independent index build —
    * sized to the prebuild() task count (9) so no build waits for a pool
    * slot while executor cores idle in another build's stage tail
    * (guide §2.6: overlap independent jobs to fill the tail; the old
    * 6-thread pool serialized builds 7-9 behind the first six). */
  private lazy val buildEc: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(9, r => {
        val t = new Thread(r, "graft-lake-prebuild")
        t.setDaemon(true)
        t
      }))

  /** Memoized per (JVM, sfDir). Sets `spark.graft.storagePath` to a
    * lake-local store so repeated runs start clean. */
  def get(spark: SparkSession, sfDir: String): Lake =
    built.getOrElseUpdate(sfDir, {
      val work = "/tmp/graft_lake_" + sfDir.replaceAll("[^a-zA-Z0-9]", "_")
      Fs.delete(spark, work)
      spark.conf.set("spark.graft.storagePath", s"$work/store")
      new Lake(spark, sfDir, work)
    })

  /** Split `df` into `n` single-file parquet bands on `key` value ranges.
    * Returns the file paths in band order. */
  def splitByBand(df: DataFrame, dir: String, key: String, n: Int): Seq[String] =
    splitWrite(df, dir, key, n,
      (d, p) => d.write.partitionBy("band").mode("overwrite").parquet(p), ".parquet")

  /** splitByBand with a CALLER-computed `band` column (for tables whose
    * banding spans heterogeneous key namespaces). Every band in
    * [0, nBands) must be non-empty. */
  def splitPrebanded(df: DataFrame, dir: String, nBands: Int): Seq[String] = {
    val banded = df.repartition(nBands, col("band"))
    banded.write.partitionBy("band").mode("overwrite").parquet(dir)
    (0 until nBands).map(b => singleBandFile(dir, b, ".parquet"))
  }

  /** The one part file of `dir/band=b` — asserting the banding invariant
    * loudly: every band must be NON-EMPTY (an empty band means the
    * caller's band column skipped a value — previously an opaque NPE) and
    * hold EXACTLY one part file (more would silently vanish from the
    * returned lake fixture, dropping rows from file-list-based oracles). */
  private def singleBandFile(dir: String, b: Int, ext: String): String = {
    val path = s"$dir/band=$b"
    val f = new java.io.File(path.stripPrefix("file:"))
    require(f.isDirectory,
      s"lake banding: band dir $path does not exist - the band column " +
        s"produced no rows for band $b (every band in [0, nBands) must " +
        "be non-empty)")
    val parts = f.listFiles()
      .filter(x => x.getName.startsWith("part-") && x.getName.endsWith(ext))
      .map(_.getAbsolutePath).sorted
    require(parts.length == 1,
      s"lake banding: band dir $path holds ${parts.length} part files, " +
        "expected exactly 1 - a multi-file band would silently drop rows " +
        "from the single-file-per-band lake fixture")
    parts.head
  }

  def splitWrite(
      df: DataFrame,
      dir: String,
      key: String,
      n: Int,
      write: (DataFrame, String) => Unit,
      ext: String): Seq[String] = {
    val maxKey = df.agg(max(col(key))).first().get(0).toString.toLong
    val width = maxKey / n + 1
    // one shuffle + one write job for ALL bands (repartition by band so each
    // task writes exactly one band dir), not n separate filter+write jobs
    val banded = df
      .withColumn("band", col(key).cast("long").divide(width).cast("long").cast("int"))
      .repartition(n, col("band"))
    write(banded, dir)
    (0 until n).map(b => singleBandFile(dir, b, ext))
  }
}
