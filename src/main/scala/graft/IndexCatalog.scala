package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.IndexMetadata
import graft.store.IndexStore

/** Directory over every index in the store: list / exists / describe /
  * findIndexes / summary DataFrame (reference: IndexCatalog.scala:97-470). */
object IndexCatalog {

  def list(spark: SparkSession): Seq[String] = IndexStore.list(spark).sorted

  def exists(spark: SparkSession, name: String): Boolean =
    Index.exists(spark, name)

  def get(spark: SparkSession, name: String): Index = Index.connect(spark, name)

  def remove(spark: SparkSession, name: String): Unit = Index.remove(spark, name)

  private def meta(spark: SparkSession, name: String): Option[IndexMetadata] =
    new IndexStore(spark, name).readMetadata()

  /** One row per index column config of one index. */
  def describe(spark: SparkSession, name: String): DataFrame = {
    import spark.implicits._
    val m = meta(spark, name).getOrElse(
      throw new IllegalArgumentException(s"Index '$name' does not exist"))
    m.indexes.map(d => (m.name, d.column, d.indexType,
        d.expr.getOrElse(""), d.tsColumn.getOrElse(""), d.fpr.getOrElse(0.0)))
      .toDF("index", "column", "index_type", "expr", "ts_column", "fpr")
  }

  /** describe() unioned over every index. */
  def describeAll(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = list(spark).flatMap(n => meta(spark, n)).flatMap { m =>
      m.indexes.map(d => (m.name, d.column, d.indexType,
        d.expr.getOrElse(""), d.tsColumn.getOrElse(""), d.fpr.getOrElse(0.0)))
    }
    rows.toDF("index", "column", "index_type", "expr", "ts_column", "fpr")
  }

  /** Which indexes cover a given column (by index column name)? */
  def findIndexes(spark: SparkSession, column: String): Seq[String] =
    list(spark).filter(n =>
      meta(spark, n).exists(_.indexes.exists(_.column == column)))

  /** Summary frame: one row per index with file/column counts and config. */
  def toDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = list(spark).flatMap(n => meta(spark, n)).map { m =>
      val store = new IndexStore(spark, m.name)
      val nFiles = store.fileList.read().map(_.count()).getOrElse(0L)
      val nIndexed = store.indexTable.read().map(_.count()).getOrElse(0L)
      (m.name, m.format, m.schema.fields.length, m.indexes.length,
        m.indexes.map(_.column).mkString(","), nFiles, nIndexed,
        m.metadataVersion, m.storageVersion)
    }
    rows.toDF("index", "format", "schema_columns", "index_columns",
      "indexed_columns", "registered_files", "indexed_files",
      "metadata_version", "storage_version")
  }
}
