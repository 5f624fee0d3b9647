package graft.streaming

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
  * Exactly-once file registration: batch output directories are keyed by
  * batchId, so a replayed micro-batch overwrites the same directory and
  * `addFile` (upsert by filename) stays idempotent.
  */
object StreamIngest {

  /** Configure `foreachBatch` on a stream so every micro-batch lands in
    * `dataDir/batch=<id>/` and is immediately registered + indexed. */
  def writer(stream: DataFrame, index: Index, dataDir: String): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val dir = s"$dataDir/batch=$batchId"
      batch.coalesce(1).write.mode("overwrite").parquet(dir)
      val spark = index.spark
      val files = Fs.fs(spark, dir).listStatus(new org.apache.hadoop.fs.Path(dir))
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.toString)
      if (files.nonEmpty) {
        index.addFile(files.toIndexedSeq: _*)
        index.update()
      }
      ()
    }

  def start(stream: DataFrame, index: Index, dataDir: String): StreamingQuery =
    writer(stream, index, dataDir).start()
}
