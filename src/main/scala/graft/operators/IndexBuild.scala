package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftConf
import graft.functions.Blooms
import graft.model.{IndexDef, IndexMetadata}
import graft.sources.FileReader
import graft.store.IndexStore

/** Index-build aggregations: one pass over the new files producing one index
  * row per file, then large-value eviction + auto-bloom.
  *
  * Shapes (reference parity, SURVEY §1.3):
  *  - regular/computed/exploded → `array<valueType>` via `collect_set` per file
  *    (reference: IndexBuildOperations.scala:829-866)
  *  - bloom → `bloom_{c}: binary` via streaming Aggregator (no set
  *    materialization — 100 TB posture)
  *  - range → `range_{c}: struct<min,max>` (reference: :937-944)
  *  - temporal → `array<struct<value,max_ts>>` via two-level agg
  *    (reference: :891-913)
  *  - file_size → native `_metadata.file_size` (replaces reference's driver
  *    UDF, Index.scala:861-908)
  *
  * All aggregation is `groupBy(filename)` — Spark plans partial (map-side)
  * + final hash aggregation, so the build scales out with executor count;
  * no driver-side work besides the final tiny upsert bookkeeping.
  */
object IndexBuild {
  private val F = FileReader.FilenameCol

  def update(store: IndexStore, meta: IndexMetadata, files: Seq[String]): Unit = {
    if (files.isEmpty) return
    val spark = store.spark
    val limit = GraftConf.largeIndexLimit(spark)

    val tagged = FileReader.readTagged(spark, meta, files)
    val base = FileReader.applyComputed(tagged, meta)

    val scalarDefs = meta.indexes.filter(ix =>
      ix.indexType == "regular" || ix.indexType == "computed" ||
        ix.indexType == "bloom" || ix.indexType == "range")

    val aggCols: Seq[Column] =
      first(col(FileReader.FileSizeCol)).as("file_size") +:
        scalarDefs.map {
          case ix if ix.indexType == "bloom" =>
            Blooms.bloomAgg(col(ix.column).cast("string"), limit.min(1000000L), ix.fpr.getOrElse(0.01))
              .as(ix.storageColumn)
          case ix if ix.indexType == "range" =>
            struct(min(col(ix.column)).as("min"), max(col(ix.column)).as("max"))
              .as(ix.storageColumn)
          case ix =>
            collect_set(col(ix.column)).as(ix.storageColumn)
        }

    var rows = base.groupBy(col(F).as("filename")).agg(aggCols.head, aggCols.tail: _*)

    // Exploded-array indexes change row multiplicity → separate aggregation,
    // merged by filename (reference: IndexBuildOperations.scala:852-867).
    meta.indexes.filter(_.indexType == "exploded").foreach { ix =>
      val e = tagged
        .select(col(F).as("filename"), explode(expr(ix.expr.get)).as(ix.column))
        .groupBy("filename").agg(collect_set(col(ix.column)).as(ix.column))
      rows = rows.join(e, Seq("filename"), "left_outer")
    }

    // Temporal: per-(file, value) max timestamp, then per-file set of
    // (value, max_ts) structs (reference: IndexBuildOperations.scala:891-913).
    meta.indexes.filter(_.indexType == "temporal").foreach { ix =>
      val t = base
        .select(col(F).as("filename"), col(ix.column).as("__v"),
          col(ix.tsColumn.get).as("__ts"))
        .groupBy("filename", "__v").agg(max("__ts").as("__mts"))
        .groupBy("filename")
        .agg(collect_set(struct(col("__v").as("value"), col("__mts").as("max_ts")))
          .as(ix.column))
      rows = rows.join(t, Seq("filename"), "left_outer")
    }

    // A registered file with zero rows must still get an index row, or it
    // would be re-processed as "unindexed" on every update.
    val filesDf = spark.createDataFrame(
      spark.sparkContext.parallelize(files.map(p =>
        org.apache.spark.sql.Row(FileReader.qualify(spark, p))), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("filename",
          org.apache.spark.sql.types.StringType, nullable = false))))
    rows = filesDf.join(rows, Seq("filename"), "left_outer")

    // Large-index eviction: arrays with >= limit distinct values move to the
    // per-column overflow table; the main row keeps an auto-bloom instead
    // (reference: IndexBuildOperations.scala:977-988,1022-1074,1131-1189).
    val arrayDefs = meta.indexes.filter(_.isArrayShaped)
    var cached: Option[DataFrame] = None
    if (arrayDefs.nonEmpty) {
      rows = rows.cache()
      cached = Some(rows)
      val sizeAggs = arrayDefs.map(ix => max(size(col(ix.column))).as(ix.column))
      val maxSizes = rows.agg(sizeAggs.head, sizeAggs.tail: _*).first()
      arrayDefs.foreach { ix =>
        val maxSize = Option(maxSizes.getAs[Any](ix.column)).map(_.toString.toLong).getOrElse(-1L)
        if (maxSize >= limit) {
          val isLarge = size(col(ix.column)) >= limit
          val largeRows = rows.where(isLarge)
            .select(col("filename"), explode(col(ix.column)).as("value"))
          store.largeTable(ix.column).upsert(largeRows, "filename")
          rows = rows
            .withColumn(s"auto_bloom_${ix.column}",
              when(isLarge, Blooms.bloomFromArray(GraftConf.autoBloomFpr(spark))(col(ix.column)))
                .otherwise(lit(null).cast("binary")))
            .withColumn(ix.column, when(isLarge, lit(null)).otherwise(col(ix.column)))
        }
      }
    }

    store.indexTable.upsert(rows, "filename")
    cached.foreach(_.unpersist())
  }
}
