package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Append-only staging area for batched index builds: each batch writes an
  * immutable parquet segment directory plus a `_COMMIT` marker; readers see
  * only committed segments, so a crash mid-write leaves no visible state
  * (the SnapshotTable-world analogue of the reference's staging Delta table,
  * reference: IndexBuildOperations.scala:209,973-1003).
  *
  * Appending a segment is O(batch) — it never rewrites earlier segments —
  * which is what makes a 10^4-batch build over 100 TB feasible; the main
  * index table is only rewritten at consolidation points.
  */
final class StagingArea(spark: SparkSession, root: String) {

  private def commitMarker(seg: String): String = s"$root/$seg/_COMMIT"

  def committedSegments: Seq[String] =
    Fs.listDirs(spark, root).filter(s => Fs.exists(spark, commitMarker(s)))

  def isEmpty: Boolean = committedSegments.isEmpty

  /** Write one batch as a new committed segment. */
  def append(df: DataFrame): Unit = {
    val seg = s"seg-${System.currentTimeMillis()}-${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.mode("overwrite").parquet(s"$root/$seg/data")
    Fs.writeStringAtomic(spark, commitMarker(seg), "ok")
  }

  /** Union of all committed segments (schemas merged by name — later
    * segments may carry backfilled columns). */
  def read(): Option[DataFrame] = {
    val segs = committedSegments
    if (segs.isEmpty) None
    else Some(segs.map(s => spark.read.parquet(s"$root/$s/data"))
      .reduce(_.unionByName(_, allowMissingColumns = true)))
  }

  def clear(): Unit = Fs.delete(spark, root)
}
