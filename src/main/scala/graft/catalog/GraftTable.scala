package graft.catalog

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{BaseRelation, EqualTo, Filter, In, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.model.IndexMetadata
import graft.operators.{IndexJoin, IndexProbe}
import graft.sources.FileReader
import graft.store.IndexStore

/** One graft index as a read-only SQL table with file-pruning filter
  * pushdown (reference: catalog/AriadneTable.scala:64-79,
  * catalog/AriadneScan.scala:32-299).
  *
  * The scan is a V1Scan that delegates the actual reading to the normal
  * graft read path (`spark.read` + computed columns + temporal dedup), so
  * Spark's own parquet reader, codegen and AQE all apply — we only decide
  * WHICH files to read (same delegation the reference documents at
  * AriadneScan.scala:99-104).
  */
class GraftTable(val meta: IndexMetadata) extends Table with SupportsRead {

  override def name(): String = meta.name

  override def schema(): StructType = meta.schema

  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(meta)
}

/** Pushdown contract: EqualTo/In on indexed columns are used for file
  * pruning; ALL filters are returned as residuals so Spark re-applies them
  * row-level after the scan (pruning must stay invisible —
  * reference: catalog/AriadneScan.scala:50-60,90-95). */
class GraftScanBuilder(meta: IndexMetadata)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pruningFilters: Array[Filter] = Array.empty
  private var requiredSchema: StructType = meta.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pruningFilters = filters.filter {
      case EqualTo(attr, _) => meta.indexFor(attr).isDefined
      case In(attr, _)      => meta.indexFor(attr).isDefined
      case _                => false
    }
    filters // all residual: Spark applies every filter after the scan
  }

  override def pushedFilters(): Array[Filter] = pruningFilters

  override def pruneColumns(requiredSchema: StructType): Unit =
    this.requiredSchema = requiredSchema

  override def build(): Scan = new GraftScan(meta, pruningFilters, requiredSchema)
}

class GraftScan(
    val meta: IndexMetadata,
    pruningFilters: Array[Filter],
    requiredSchema: StructType) extends V1Scan {

  override def readSchema(): StructType = requiredSchema

  override def description(): String =
    s"GraftScan(${meta.name}, pruning=[${pruningFilters.mkString(", ")}])"

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T =
    new GraftBaseRelation(context.sparkSession, meta, pruningFilters, requiredSchema)
      .asInstanceOf[T]
}

/** Locates files from the pushed filters, reads only those through the
  * normal read path, applies latest-version semantics for every temporal
  * index (the catalog read semantic, reference: AriadneScan.scala:279-283),
  * projects required columns. Residual row filters are applied by Spark. */
class GraftBaseRelation(
    spark: SparkSession,
    meta: IndexMetadata,
    pruningFilters: Array[Filter],
    requiredSchema: StructType) extends BaseRelation with TableScan {

  override def sqlContext: SQLContext = spark.sqlContext

  override def schema: StructType = requiredSchema

  override def buildScan(): RDD[Row] = {
    val store = new IndexStore(spark, meta.name)
    val values: Map[String, Seq[Any]] = pruningFilters.collect {
      case EqualTo(attr, v) => attr -> Seq(v)
      case In(attr, vs)     => attr -> vs.toSeq
    }.groupBy(_._1).map { case (k, kvs) => k -> kvs.flatMap(_._2).toSeq }

    val files: Seq[String] =
      if (values.isEmpty) {
        store.fileList.read()
          .map(_.select("filename").collect().map(_.getString(0)).toSeq)
          .getOrElse(Seq.empty)
      } else {
        IndexProbe.collectFiles(IndexProbe.candidateFiles(store, meta,
          values.map { case (c, vs) => c -> IndexProbe.Values(vs) }))
      }

    var df = FileReader.readFiles(spark, meta, files)
    df = IndexJoin.applyTemporalDedup(df, meta,
      meta.indexes.filter(_.indexType == "temporal").map(_.column).toSet)
    df.select(requiredSchema.fieldNames.map(col).toIndexedSeq: _*).rdd
  }
}
