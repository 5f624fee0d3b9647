package graft.catalog

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.store.IndexStore

/** Read-only DataSource V2 catalog exposing every graft index as a SQL
  * table (reference: catalog/AriadneCatalog.scala:45-279):
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
  * spark.sql("SELECT * FROM graft.orders_idx WHERE o_custkey IN (1, 2)")
  * }}}
  *
  * Tables resolve in the default (empty or `default`) namespace. All DDL
  * throws `UnsupportedOperationException` — indexes are managed through the
  * programmatic API.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = "graft"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active

  private def isDefaultNs(ns: Array[String]): Boolean =
    ns.isEmpty || (ns.length == 1 && ns(0) == "default")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!isDefaultNs(namespace))
      throw new IllegalArgumentException(s"Unknown namespace ${namespace.mkString(".")}")
    IndexStore.list(spark).map(n => Identifier.of(Array.empty, n)).toArray
  }

  override def loadTable(ident: Identifier): Table = {
    if (!isDefaultNs(ident.namespace()))
      throw noSuchTable(ident)
    val store = new IndexStore(spark, ident.name())
    store.readMetadata() match {
      case Some(meta) => new GraftTable(meta)
      case None       => throw noSuchTable(ident)
    }
  }

  private def noSuchTable(ident: Identifier): Throwable =
    new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
      ident.namespace().toSeq :+ ident.name())

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft catalog is read-only; create indexes via the graft.Index API")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "graft catalog is read-only; use graft.Index.remove")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only")

  // ---- namespaces ----------------------------------------------------------

  override def listNamespaces(): Array[Array[String]] =
    Array(Array("default"))

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (isDefaultNs(namespace)) Array.empty
    else throw new IllegalArgumentException(s"Unknown namespace ${namespace.mkString(".")}")

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    if (isDefaultNs(namespace)) Map.empty[String, String].asJava
    else throw new IllegalArgumentException(s"Unknown namespace ${namespace.mkString(".")}")

  override def createNamespace(
      namespace: Array[String], metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("graft catalog is read-only")
}
