package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, lit, not}

import graft.GraftConf

/** A versioned parquet table with atomic snapshot swap — the non-Delta
  * persistence layer for all index state.
  *
  * Layout: `{root}/v{N}/part-*.parquet` plus a `{root}/_current` pointer
  * file. A write materializes new data directories and then atomically
  * renames the pointer — readers resolve the pointer once and read immutable
  * directories, so concurrent reads never observe a partial write (the
  * capability Delta provided in the reference; behavior parity per
  * reference: IndexBuildOperations.scala:1334-1360, re-expressed without the
  * Delta dependency because only plain Spark 4 jars ship here).
  *
  * Two write shapes:
  *  - FULL REWRITE (`overwrite`/`upsert`/`mergeColumns`): pointer names one
  *    directory. Right for the main index table and filelist — one row per
  *    data file, small even for a 100 TB lake.
  *  - SEGMENTED APPEND (`appendReplacing`/`deleteLiteralKeys`): pointer
  *    names an ordered directory list; each append writes ONLY its delta
  *    rows plus a `_keys` manifest naming the keys it (re)wrote. A row is
  *    live iff no LATER segment's manifest claims its key — LSM-style
  *    last-writer-wins without rewriting earlier segments. This is the
  *    write path for large-index OVERFLOW tables (exploded values, multi-GB
  *    at scale): per-batch eviction costs O(delta) I/O instead of O(table)
  *    (the r1 scale finding). Segment count is bounded: reaching
  *    `spark.graft.maxOverflowSegments` folds the table into one directory.
  */
final class SnapshotTable(spark: SparkSession, root: String,
    cacheable: Boolean = true) {
  private val pointerPath = s"$root/_current"

  def exists: Boolean = Fs.exists(spark, pointerPath)

  /** Pointer lines: `version`, `nonce`, optional `segs:v1,v4,...` (absent ⇒
    * the single directory `v{version}`). The nonce is minted fresh per
    * write, so a table dropped and RECREATED by another process (version
    * numbering restarts) can never alias a previous incarnation's cache
    * entries — (root, version, nonce) identifies one immutable pointer state
    * (single-line pointers from older layouts read as nonce ""). */
  private def readPointer(): Option[(Long, String, Seq[String])] =
    if (!exists) None
    else scala.util.Try {
      val lines = Fs.readString(spark, pointerPath).split('\n')
      val v = lines(0).trim.toLong
      val nonce = if (lines.length > 1) lines(1).trim else ""
      val segs = lines.find(_.startsWith("segs:")) match {
        case Some(l) => l.drop(5).split(',').map(_.trim).filter(_.nonEmpty).toSeq
        case None    => Seq(s"v$v")
      }
      (v, nonce, segs)
    }.toOption

  def currentVersion: Option[Long] = readPointer().map(_._1)

  /** Live segment directory names (diagnostics / tests). */
  def segments: Seq[String] = readPointer().map(_._3).getOrElse(Seq.empty)

  private def versionDir(v: Long): String = s"$root/v$v"
  private def segDir(name: String): String = s"$root/$name"
  private def manifestPath(dir: String): String = s"$dir/_keys"

  /** Manifest: first line is the key column, then one replaced/deleted key
    * per line. Small by construction (≤ buildBatchMaxFiles filenames). */
  private def writeManifest(dir: String, key: String, keys: Seq[String]): Unit =
    Fs.writeStringAtomic(spark, manifestPath(dir), (key +: keys).mkString("\n"))

  private def readManifest(dir: String): Option[(String, Seq[String])] =
    if (!Fs.exists(spark, manifestPath(dir))) None
    else {
      val lines = Fs.readString(spark, manifestPath(dir)).split('\n').toSeq
      Some((lines.head, lines.tail.filter(_.nonEmpty)))
    }

  /** Current snapshot as a DataFrame, if the table has ever been written.
    *
    * Two caches, both keyed by (root, version, nonce) — a pointer state is
    * immutable, so the first read is authoritative:
    *  - the SCHEMA is always cached (without it every read ran a parquet
    *    footer-merge Spark job; an index build issues dozens of reads);
    *  - the DATA is Spark-cached (MEMORY_AND_DISK, LRU-evictable) when
    *    `spark.graft.cacheIndexTables` is on (default): every probe scans
    *    the index table, and at one row per data file even a 100 TB lake's
    *    index is a few GB — memory-resident probes cut the per-query
    *    overhead that dominates small probes. A superseded version is
    *    unpersisted on the next read. */
  def read(): Option[DataFrame] =
    readPointer().map { case (v, nonce, segs) =>
      val key = (root, v, nonce)
      def assemble: DataFrame = {
        val schema = SnapshotTable.schemaCache.get(key).getOrElse {
          // manifest-only segments hold no parquet — exclude from inference
          val dataDirs = segs.map(segDir).filter(Fs.hasDataFiles(spark, _))
          val s =
            if (dataDirs.isEmpty) new org.apache.spark.sql.types.StructType()
            else spark.read.parquet(dataDirs: _*).schema
          SnapshotTable.cachePut(key, s)
          s
        }
        if (segs.size == 1) spark.read.schema(schema).parquet(segDir(segs.head))
        else assembleSegments(segs, schema)
      }
      // optional repartition of the assembled index table (reference:
      // spark.ariadne.indexRepartitionCount, AriadneContext.scala:121-141 —
      // dodges FetchFailed on very large index tables). Applied BEFORE the
      // cache so the cost is paid once per version, not per probe.
      def shaped: DataFrame = {
        val n = GraftConf.indexRepartitionCount(spark)
        if (n > 0) assemble.repartition(n) else assemble
      }
      if (!cacheable || !GraftConf.cacheIndexTables(spark)) shaped
      else SnapshotTable.dfCache.getOrElseUpdate(key, {
        SnapshotTable.dfCache.keys
          .filter(k => k._1 == root && k != key)
          .foreach(k => SnapshotTable.dfCache.remove(k)
            .foreach(_.unpersist(false)))
        shaped.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      })
    }

  /** Union the segment scans (each with the assembled schema, so no per-dir
    * inference) and apply last-writer-wins: a row survives iff no LATER
    * segment's manifest claims its key. The key→latest-segment map is built
    * driver-side from the manifests (bounded: filenames only, same order as
    * the registered-file ledger) and broadcast — one hash join, no shuffle
    * of the segment rows. */
  private def assembleSegments(
      segs: Seq[String],
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val parts = segs.zipWithIndex.map { case (d, i) =>
      spark.read.schema(schema).parquet(segDir(d)).withColumn("__seg", lit(i))
    }
    val all = parts.reduce(_.unionByName(_))
    val manifests = segs.zipWithIndex.flatMap { case (d, i) =>
      readManifest(segDir(d)).map { case (k, ks) => (i, k, ks) }
    }
    manifests.headOption match {
      case None => all.drop("__seg")
      case Some((_, keyCol, _)) =>
        val latest: Seq[(String, Int)] = manifests
          .flatMap { case (i, _, ks) => ks.map(_ -> i) }
          .groupMapReduce(_._1)(_._2)(math.max)
          .toSeq
        import spark.implicits._
        val ords = latest.toDF(keyCol, "__latest_seg")
        all.join(broadcast(ords), Seq(keyCol), "left_outer")
          .where(col("__latest_seg").isNull || col("__seg") >= col("__latest_seg"))
          .drop("__seg", "__latest_seg")
    }
  }

  /** Replace the table content atomically with a single directory (folds any
    * segments). The written schema is cached so the next read() never runs a
    * schema-inference job. */
  def overwrite(df: DataFrame): Long = {
    val prev = readPointer()
    val next = prev.map(_._1).getOrElse(0L) + 1L
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    df.write.mode("overwrite").parquet(versionDir(next))
    SnapshotTable.cachePut((root, next, nonce), df.schema)
    Fs.writeStringAtomic(spark, pointerPath, s"$next\n$nonce")
    // Durably record WHEN the outgoing directories stopped being referenced:
    // time-based vacuum dates retention from these markers, never from FS
    // mtimes (object stores report unreliable/zero mtimes for directories).
    markSuperseded(prev.map(_._3).getOrElse(Seq.empty).filterNot(_ == s"v$next"))
    // The superseded pointer's segments stay readable for one more write
    // (the retention guarantee readers in flight rely on); the write after
    // this one reaps them.
    cleanup(next, prev.map(_._3.toSet).getOrElse(Set.empty) + s"v$next")
    next
  }

  /** Upsert by key: rows in `df` replace existing rows with the same key;
    * schema evolution via unionByName(allowMissingColumns) so adding an
    * index column later backfills nulls (reference behavior:
    * IndexBuildOperations.scala:1339-1347 withSchemaEvolution). Full
    * rewrite — use [[appendReplacing]] for tables too big to rewrite. */
  def upsert(df: DataFrame, key: String): Long = {
    val merged = read() match {
      case Some(old) =>
        old.join(df.select(key).distinct(), Seq(key), "left_anti")
          .unionByName(df, allowMissingColumns = true)
      case None => df
    }
    overwrite(merged)
  }

  /** Upsert where the replaced key set is KNOWN to the caller (e.g. an index
    * build's batch file list): avoids re-evaluating `df`'s plan a second time
    * just to derive its keys — `df` may be an expensive unmaterialized
    * aggregation. Key count is caller-bounded (≤ buildBatchMaxFiles). */
  def upsertLiteralKeys(df: DataFrame, key: String, keys: Seq[String]): Long = {
    val merged = read() match {
      case Some(old) =>
        old.where(not(col(key).isin(keys: _*)))
          .unionByName(df, allowMissingColumns = true)
      case None => df
    }
    overwrite(merged)
  }

  /** Segmented upsert: write ONLY `df` (the delta) as a new segment whose
    * manifest claims `keys` — earlier segments' rows for those keys stop
    * being visible, at O(delta) write cost. Atomic via the pointer swap.
    * When the segment count reaches `spark.graft.maxOverflowSegments`, the
    * table folds into one directory instead (amortized O(table /
    * maxSegments) per append). */
  def appendReplacing(df: DataFrame, key: String, keys: Seq[String]): Long =
    readPointer() match {
      case None => overwrite(df)
      case Some((v, _, segs)) if segs.size >= GraftConf.maxOverflowSegments(spark) =>
        val keep = read().get.where(
          if (keys.isEmpty) lit(true) else not(col(key).isin(keys: _*)))
        overwrite(keep.unionByName(df, allowMissingColumns = true))
      case Some((v, _, segs)) =>
        val next = v + 1
        val dir = versionDir(next)
        df.write.mode("overwrite").parquet(dir)
        writeManifest(dir, key, keys)
        val nonce = java.util.UUID.randomUUID().toString.take(8)
        Fs.writeStringAtomic(spark, pointerPath,
          s"$next\n$nonce\nsegs:${(segs :+ s"v$next").mkString(",")}")
        next
    }

  /** Segmented delete: a manifest-only segment tombstones the keys — no data
    * read or rewrite at all. */
  def deleteLiteralKeys(key: String, keys: Seq[String]): Unit =
    readPointer().foreach { case (v, _, segs) =>
      if (keys.isEmpty) return
      if (segs.size >= GraftConf.maxOverflowSegments(spark)) {
        read().foreach(old => overwrite(old.where(not(col(key).isin(keys: _*)))))
      } else {
        val next = v + 1
        val dir = versionDir(next)
        Fs.mkdirs(spark, dir)
        writeManifest(dir, key, keys)
        val nonce = java.util.UUID.randomUUID().toString.take(8)
        Fs.writeStringAtomic(spark, pointerPath,
          s"$next\n$nonce\nsegs:${(segs :+ s"v$next").mkString(",")}")
      }
    }

  /** Delete rows matching the key set; no-op if table absent. Full rewrite —
    * use [[deleteLiteralKeys]] on segmented overflow tables. */
  def deleteKeys(keys: DataFrame, key: String): Unit =
    read().foreach { old =>
      overwrite(old.join(keys.select(key).distinct(), Seq(key), "left_anti"))
    }

  /** Column-level merge: attach/overwrite the non-key columns of `df` on
    * matching keys, keeping all other columns — the backfill write shape
    * (reference: Delta merge withSchemaEvolution,
    * IndexBuildOperations.scala:1339-1347). */
  def mergeColumns(df: DataFrame, key: String): Long = {
    val newCols = df.columns.filterNot(_ == key)
    val merged = read() match {
      case Some(old) =>
        old.drop(newCols.filter(old.columns.contains): _*)
          .join(df, Seq(key), "left_outer")
      case None => df
    }
    overwrite(merged)
  }

  /** Rewrite the current snapshot into `numFiles` files (small-file
    * compaction — the OPTIMIZE analogue; also folds segments). */
  def compact(numFiles: Int = 1): Unit =
    read().foreach(df => overwrite(df.coalesce(math.max(numFiles, 1))))

  /** Drop snapshot versions older than the retention window NOW (the
    * VACUUM analogue; normal writes already trim lazily). Directories still
    * referenced by the current pointer are never touched. */
  def vacuum(keep: Int = 1): Unit =
    readPointer().foreach { case (cur, _, segs) =>
      deadDirs(cur, math.max(keep, 1), segs.toSet)
        .foreach(d => Fs.delete(spark, segDir(d)))
    }

  /** TIME-based retention: drop non-live version dirs SUPERSEDED before
    * the wall-clock horizon. A reader that resolved the pointer up to
    * `retentionHours` ago can still finish — the guarantee concurrent
    * readers actually reason in (hours of query runtime), where the
    * count-based [[vacuum]] depends on how often writers commit.
    *
    * Supersession time comes from the durable `_superseded_at` marker the
    * pointer swap wrote into the outgoing directory — NOT from filesystem
    * mtimes, which object stores commonly report as 0/unreliable for
    * directory paths (an mtime-based reaper would then see every superseded
    * snapshot as infinitely old and break the in-flight-reader guarantee).
    * A dir with no readable marker (pre-marker layout, or a writer that
    * died between swap and mark) is stamped NOW and left alone — it becomes
    * deletable only after a further full retention window, the safe
    * direction. Directories named by the current pointer are never touched
    * regardless of age. */
  def vacuumOlderThan(retentionHours: Int): Unit =
    readPointer().foreach { case (cur, _, segs) =>
      val now = System.currentTimeMillis()
      val horizon = now - retentionHours.toLong * 3600L * 1000L
      val live = segs.toSet
      Fs.listDirs(spark, root)
        .filter(_.startsWith("v"))
        .flatMap(d => scala.util.Try(d.drop(1).toLong).toOption.map(_ -> d))
        .filter { case (v, d) => v < cur && !live.contains(d) }
        .foreach { case (_, d) =>
          supersededAt(d) match {
            case Some(t) if t <= horizon => Fs.delete(spark, segDir(d))
            case Some(_) => () // inside the horizon — keep
            case None => // no durable record (missing or unreadable marker):
              // (re)stamp NOW so the dir becomes deletable one window later
              Fs.writeStringAtomic(spark, supersededMarker(segDir(d)),
                now.toString)
          }
        }
    }

  private def supersededMarker(dir: String): String = s"$dir/_superseded_at"

  /** Wall-clock millis at which `dirName` stopped being pointer-referenced,
    * if durably recorded. Unreadable/zero values count as unknown. */
  private def supersededAt(dirName: String): Option[Long] = {
    val p = supersededMarker(segDir(dirName))
    if (!Fs.exists(spark, p)) None
    else scala.util.Try(Fs.readString(spark, p).trim.toLong)
      .toOption.filter(_ > 0L)
  }

  /** Stamp `_superseded_at` (current wall clock) into each directory, if not
    * already stamped — first mark wins, so re-stamping a dir that already
    * carries its true supersession time is a no-op. Underscore-prefixed, so
    * parquet scans of the dir ignore it. */
  private def markSuperseded(dirs: Iterable[String]): Unit = {
    val now = System.currentTimeMillis()
    dirs.foreach { d =>
      val p = supersededMarker(segDir(d))
      if (Fs.exists(spark, segDir(d)) && !Fs.exists(spark, p))
        Fs.writeStringAtomic(spark, p, now.toString)
    }
  }

  private def cleanup(current: Long, live: Set[String]): Unit =
    deadDirs(current, GraftConf.retainedSnapshots(spark).max(1), live)
      .foreach(d => Fs.delete(spark, segDir(d)))

  /** Version dirs older than the retention window and not live segments. */
  private def deadDirs(current: Long, keep: Int, live: Set[String]): Seq[String] =
    Fs.listDirs(spark, root)
      .filter(d => d.startsWith("v") && !live.contains(d))
      .filter(d => scala.util.Try(d.drop(1).toLong).toOption
        .exists(v => v <= current - keep))

  def drop(): Unit = {
    SnapshotTable.invalidate(root)
    Fs.delete(spark, root)
  }
}

object SnapshotTable {
  /** (root, version, nonce) -> schema; bounded by LRU-ish trim at 4096. */
  private val schemaCache =
    scala.collection.concurrent.TrieMap.empty[(String, Long, String), org.apache.spark.sql.types.StructType]
  /** (root, version, nonce) -> Spark-cached snapshot DataFrame. */
  private val dfCache =
    scala.collection.concurrent.TrieMap.empty[(String, Long, String), DataFrame]
  private[store] def cachePut(
      k: (String, Long, String), v: org.apache.spark.sql.types.StructType): Unit = {
    if (schemaCache.size > 4096) schemaCache.clear()
    schemaCache.put(k, v)
  }
  /** Drop every cache entry for a table root (called on drop()). */
  private[store] def invalidate(root: String): Unit = {
    schemaCache.keys.filter(_._1 == root).foreach(schemaCache.remove)
    dfCache.keys.filter(_._1 == root)
      .foreach(k => dfCache.remove(k).foreach(_.unpersist(false)))
  }
}
