package graft.store

import org.apache.spark.internal.Logging
import org.apache.spark.sql.functions._

import graft.model.IndexMetadata

/** Ordered, idempotent storage migrations, run under the update lock on
  * reconnect (reference: StorageFormat.scala:10-15,
  * IndexBuildOperations.scala:260-326,382-465,516-599).
  *
  * Each migration transforms on-disk state from version N to N+1 and is
  * safe to re-run (a crash mid-migration leaves either the old or the new
  * snapshot thanks to SnapshotTable's atomic pointer swap; metadata version
  * is bumped only after the data move commits).
  */
object StorageMigrations extends Logging {

  /** Current writer version. History:
    *  1 — initial layout (round 1)
    *  2 — index rows carry a non-null `file_size` column (backfilled from
    *      the filesystem for rows written before the column existed)
    */
  val CurrentVersion = 2

  final case class Migration(from: Int, description: String,
      run: (IndexStore, IndexMetadata) => Unit)

  private val migrations: Seq[Migration] = Seq(
    Migration(1, "backfill file_size into index rows", { (store, _) =>
      store.indexTable.read().foreach { idx =>
        if (!idx.columns.contains("file_size")) {
          val spark = store.spark
          // distributed stat: resolve sizes on executors, not the driver
          // (reference migration does the same, IndexBuildOperations.scala:410-431)
          val conf = new org.apache.spark.util.SerializableConfiguration(
            spark.sparkContext.hadoopConfiguration)
          val withSize = idx.withColumn("file_size", lit(null).cast("long"))
          import spark.implicits._
          val names = idx.select("filename").as[String].rdd.mapPartitions { it =>
            it.map { f =>
              val p = new org.apache.hadoop.fs.Path(f)
              val len = try p.getFileSystem(conf.value).getFileStatus(p).getLen
                        catch { case _: Exception => -1L }
              (f, len)
            }
          }.toDF("filename", "__fs")
          val merged = withSize.join(names, Seq("filename"), "left_outer")
            .withColumn("file_size", coalesce(col("__fs"), col("file_size")))
            .drop("__fs")
          store.indexTable.overwrite(merged)
        } else if (idx.schema("file_size").dataType !=
            org.apache.spark.sql.types.LongType) {
          store.indexTable.overwrite(
            idx.withColumn("file_size", col("file_size").cast("long")))
        }
      }
    })
  )

  /** Bring `store` to CurrentVersion. Caller must hold the update lock. */
  def ensureCurrent(store: IndexStore, meta: IndexMetadata): IndexMetadata = {
    var m = meta
    while (m.storageVersion < CurrentVersion) {
      val mig = migrations.find(_.from == m.storageVersion).getOrElse(
        throw new graft.StorageMigrationException(
          s"no migration from storage version ${m.storageVersion}"))
      logInfo(s"index ${m.name}: storage migration v${mig.from} -> " +
        s"v${mig.from + 1} (${mig.description})")
      mig.run(store, m)
      m = m.copy(storageVersion = mig.from + 1)
      store.writeMetadata(m)
    }
    m
  }
}
