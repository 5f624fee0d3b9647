package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.GraftConf

/** A versioned parquet table with atomic snapshot swap — the non-Delta
  * persistence layer for all index state.
  *
  * Layout: `{root}/v{N}/part-*.parquet` plus a `{root}/_current` pointer
  * file holding `N`. A write materializes a brand-new snapshot directory and
  * then atomically renames the pointer — readers resolve the pointer once
  * and read an immutable directory, so concurrent reads never observe a
  * partial write (the capability Delta provided in the reference; behavior
  * parity per reference: IndexBuildOperations.scala:1334-1360, re-expressed
  * without the Delta dependency because only plain Spark 4 jars ship here).
  *
  * Scale note: index tables hold ONE ROW PER DATA FILE (plus per-column
  * large-index overflow), so even a 100 TB lake with ~10^6 files stays a
  * small table; full-snapshot rewrite on update is deliberately chosen over
  * log-structured segments for its simplicity and atomicity.
  */
final class SnapshotTable(spark: SparkSession, root: String) {
  private val pointerPath = s"$root/_current"

  def exists: Boolean = Fs.exists(spark, pointerPath)

  /** Pointer = `version` line + optional `nonce` line. The nonce is minted
    * fresh per write, so a table dropped and RECREATED by another process
    * (version numbering restarts) can never alias a previous incarnation's
    * cache entries — (root, version, nonce) identifies one immutable write
    * (single-line pointers from older layouts read as nonce ""). */
  private def readPointer(): Option[(Long, String)] =
    if (!exists) None
    else scala.util.Try {
      val lines = Fs.readString(spark, pointerPath).split('\n')
      (lines(0).trim.toLong, if (lines.length > 1) lines(1).trim else "")
    }.toOption

  def currentVersion: Option[Long] = readPointer().map(_._1)

  private def versionDir(v: Long): String = s"$root/v$v"

  /** Current snapshot as a DataFrame, if the table has ever been written.
    *
    * Two caches, both keyed by (root, version, nonce) — a version directory
    * is immutable, so the first read is authoritative:
    *  - the SCHEMA is always cached (without it every read ran a parquet
    *    footer-merge Spark job; an index build issues dozens of reads);
    *  - the DATA is Spark-cached (MEMORY_AND_DISK, LRU-evictable) when
    *    `spark.graft.cacheIndexTables` is on (default): every probe scans
    *    the index table, and at one row per data file even a 100 TB lake's
    *    index is a few GB — memory-resident probes cut the per-query
    *    overhead that dominates small probes. A superseded version is
    *    unpersisted on the next read. */
  def read(): Option[DataFrame] =
    readPointer().map { case (v, nonce) =>
      val key = (root, v, nonce)
      def plain: DataFrame = SnapshotTable.schemaCache.get(key) match {
        case Some(schema) => spark.read.schema(schema).parquet(versionDir(v))
        case None =>
          val df = spark.read.parquet(versionDir(v))
          SnapshotTable.cachePut(key, df.schema)
          df
      }
      if (!GraftConf.cacheIndexTables(spark)) plain
      else SnapshotTable.dfCache.getOrElseUpdate(key, {
        SnapshotTable.dfCache.keys
          .filter(k => k._1 == root && k != key)
          .foreach(k => SnapshotTable.dfCache.remove(k)
            .foreach(_.unpersist(false)))
        plain.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      })
    }

  /** Replace the table content atomically. The written schema is cached so
    * the next read() never runs a schema-inference job. */
  def overwrite(df: DataFrame): Long = {
    val next = currentVersion.getOrElse(0L) + 1L
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    df.write.mode("overwrite").parquet(versionDir(next))
    SnapshotTable.cachePut((root, next, nonce), df.schema)
    Fs.writeStringAtomic(spark, pointerPath, s"$next\n$nonce")
    cleanup(next)
    next
  }

  /** Upsert by key: rows in `df` replace existing rows with the same key;
    * schema evolution via unionByName(allowMissingColumns) so adding an
    * index column later backfills nulls (reference behavior:
    * IndexBuildOperations.scala:1339-1347 withSchemaEvolution). */
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
    import org.apache.spark.sql.functions.{col, not}
    val merged = read() match {
      case Some(old) =>
        old.where(not(col(key).isin(keys: _*)))
          .unionByName(df, allowMissingColumns = true)
      case None => df
    }
    overwrite(merged)
  }

  /** Delete rows matching the key set; no-op if table absent. */
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
    * compaction — the OPTIMIZE analogue). */
  def compact(numFiles: Int = 1): Unit =
    read().foreach(df => overwrite(df.coalesce(math.max(numFiles, 1))))

  /** Drop snapshot versions older than the retention window NOW (the
    * VACUUM analogue; normal writes already trim lazily). */
  def vacuum(keep: Int = 1): Unit =
    currentVersion.foreach { cur =>
      Fs.listDirs(spark, root)
        .filter(_.startsWith("v"))
        .flatMap(d => scala.util.Try(d.drop(1).toLong).toOption)
        .filter(v => v <= cur - math.max(keep, 1))
        .foreach(v => Fs.delete(spark, versionDir(v)))
    }

  private def cleanup(current: Long): Unit = {
    val keep = GraftConf.retainedSnapshots(spark).max(1)
    Fs.listDirs(spark, root)
      .filter(_.startsWith("v"))
      .flatMap(d => scala.util.Try(d.drop(1).toLong).toOption)
      .filter(v => v <= current - keep)
      .foreach(v => Fs.delete(spark, versionDir(v)))
  }

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
