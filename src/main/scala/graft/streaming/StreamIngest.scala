package graft.streaming

import org.apache.hadoop.fs.{Options, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.Row

import graft.Index
import graft.store.Fs

/** Structured Streaming ingestion into a graft index: each micro-batch is
  * written as immutable parquet files, registered, and indexed — the
  * `foreachBatch`-driven incremental pattern (the reference is batch-only;
  * this is the Spark-native extension SURVEY §2.9 anticipates).
  *
  * {{{
  * val q = StreamIngest.start(stream, index, "/data/events")
  * // ... q.awaitTermination()
  * }}}
  *
  * Exactly-once file registration across micro-batch REPLAYS (failure
  * recovery re-runs the last uncommitted batchId):
  *  1. the batch is written to a scratch dir, then its part files are
  *     renamed to DETERMINISTIC names `data-<batchId>-<i>.parquet` under
  *     `dataDir/batch=<id>/` — a replay produces the exact same paths, so
  *     the filename ledger can actually deduplicate them (random part-UUID
  *     names would leak a dangling registration per replay);
  *  2. any files previously registered under that batch dir are
  *     `deleteFiles`d first, so a replay whose content differs (allowed for
  *     non-deterministic sources) fully replaces the old rows instead of
  *     leaving a stale index entry pointing at a deleted file.
  */
object StreamIngest {

  /** Land one micro-batch: write → deterministic rename → retract prior
    * registration for this batchId → register + index. Idempotent under
    * replay of the same batchId (exposed for direct testing). */
  def ingestBatch(index: Index, dataDir: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = index.spark
    val dir = s"$dataDir/batch=$batchId"
    val scratch = s"$dataDir/.batch-$batchId.tmp"
    batch.coalesce(1).write.mode("overwrite").parquet(scratch)

    // replay: retract anything registered for this batch before replacing
    val prior = index.files.filter(_.startsWith(
      Fs.fs(spark, dir).makeQualified(new Path(dir)).toString + "/"))
    if (prior.nonEmpty) index.deleteFiles(prior: _*)
    Fs.delete(spark, dir)
    Fs.mkdirs(spark, dir)

    val fsys = Fs.fs(spark, dir)
    val parts = fsys.listStatus(new Path(scratch))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      new Path(dir).toUri, Fs.hadoopConf(spark))
    val files = parts.zipWithIndex.map { case (s, i) =>
      val target = new Path(dir, s"data-$batchId-$i.parquet")
      fc.rename(s.getPath, target, Options.Rename.OVERWRITE)
      fsys.makeQualified(target).toString
    }
    Fs.delete(spark, scratch)
    // a replay rewrote files at pre-existing paths: invalidate any cached
    // plans / file listings that referenced the old contents
    if (prior.nonEmpty) spark.catalog.refreshByPath(dir)

    if (files.nonEmpty) {
      index.addFile(files.toIndexedSeq: _*)
      index.update()
    }
  }

  /** Configure `foreachBatch` on a stream so every micro-batch lands in
    * `dataDir/batch=<id>/` and is immediately registered + indexed. */
  def writer(stream: DataFrame, index: Index, dataDir: String): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch(ingestBatch(index, dataDir) _)

  def start(stream: DataFrame, index: Index, dataDir: String): StreamingQuery =
    writer(stream, index, dataDir).start()
}
