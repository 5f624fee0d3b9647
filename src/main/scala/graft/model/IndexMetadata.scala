package graft.model

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

import graft.store.Fs

/** One index definition over a single (storage) column.
  *
  * `indexType` ∈ regular | computed | exploded | exploded_bloom | bloom |
  * range | temporal | hll.
  * Exactly one index type per column is allowed (reference exclusivity rule:
  * IndexBuildOperations.scala:124-159).
  *
  *  - regular:  distinct-value array per file over a physical column
  *  - computed: like regular, but over an arbitrary Spark SQL scalar
  *              expression `expr` materialized as `column` at read time
  *              (reference: IndexFileOperations.scala:207-212)
  *  - exploded: like regular, but over elements of an array-typed Spark SQL
  *              expression `expr` (generalizes the reference's
  *              array.field exploded indexes, IndexBuildOperations.scala:852-867)
  *  - exploded_bloom: per-file bloom filter over the ELEMENTS of an
  *              array-typed expression `expr` — exploded read/join
  *              semantics with fixed-size bloom storage (capacity
  *              `expectedItems`), for element universes so large that an
  *              exploded value array would route every file through the
  *              large-index overflow path (e.g. sliding-window hashes:
  *              ~rows × windows distinct values per file)
  *  - bloom:    per-file bloom filter of `toString` values (stored as
  *              `bloom_{column}`, BinaryType)
  *  - range:    per-file `struct(min, max)` (stored as `range_{column}`)
  *  - temporal: per-file `array<struct<value, max_ts>>` giving
  *              latest-version semantics; `tsColumn` may be a nested path
  *  - hll:      per-file Datasketches HyperLogLog sketch (stored as
  *              `hll_{column}`, BinaryType; `lgConfigK` sizes it) —
  *              STATISTICS-ONLY: sketches union across any file subset
  *              for a distinct-count estimate (`Index.distinctEstimate`)
  *              without scanning data, but cannot answer membership
  *              probes. Deleting files just drops their rows — the union
  *              re-derives from the survivors, no rebuild.
  */
case class IndexDef(
    column: String,
    indexType: String,
    expr: Option[String] = None,
    tsColumn: Option[String] = None,
    fpr: Option[Double] = None,
    expectedItems: Option[Long] = None,
    lgConfigK: Option[Int] = None) {

  /** Column name under which this index is persisted in the index table. */
  def storageColumn: String = indexType match {
    case "bloom" | "exploded_bloom" => s"bloom_$column"
    case "range"                    => s"range_$column"
    case "hll"                      => s"hll_$column"
    case _                          => column
  }

  /** Column holding the probe-able VALUE at data-read time. */
  def valueColumn: String = column

  /** Can this index answer membership probes (and therefore prune files
    * for equality/range predicates and joins)? Statistics-only kinds
    * (hll) hold no membership information — every pruning/rewrite site
    * must treat their columns as unindexed, not route them into the
    * probe path. */
  def canProbe: Boolean = indexType != "hll"

  def isArrayShaped: Boolean =
    indexType == "regular" || indexType == "computed" || indexType == "exploded"

  /** Kinds that materialize `expr`'s ELEMENTS as `column` at data-read
    * time (row multiplicity changes — see FileReader.applyExploded). */
  def isExplodedShaped: Boolean =
    indexType == "exploded" || indexType == "exploded_bloom"
}

/** Persisted per-index configuration, JSON at
  * `{store}/indexes/{name}/metadata.json` (reference: IndexMetadata.scala:109-123).
  * Additive versioning: absent fields default on read. */
case class IndexMetadata(
    name: String,
    format: String,
    schemaJson: String,
    readOptions: Map[String, String] = Map.empty,
    indexes: List[IndexDef] = Nil,
    metadataVersion: Int = 1,
    storageVersion: Int = 1,
    consolidationsSinceCompact: Int = 0) {

  def schema: StructType = DataType.fromJson(schemaJson).asInstanceOf[StructType]

  def indexFor(column: String): Option[IndexDef] = indexes.find(_.column == column)

  def withIndex(d: IndexDef): IndexMetadata = {
    indexFor(d.column) match {
      case Some(existing) if existing == d => this
      case Some(existing) =>
        throw new IllegalArgumentException(
          s"Column '${d.column}' already has a ${existing.indexType} index; " +
            "one index type per column (graft exclusivity rule)")
      case None => copy(indexes = indexes :+ d)
    }
  }
}

object IndexMetadata {
  implicit val formats: Formats = DefaultFormats

  def toJson(m: IndexMetadata): String = Serialization.writePretty(m)

  def fromJson(s: String): IndexMetadata = Serialization.read[IndexMetadata](s)

  def write(spark: SparkSession, path: String, m: IndexMetadata): Unit =
    Fs.writeStringAtomic(spark, path, toJson(m))

  def read(spark: SparkSession, path: String): Option[IndexMetadata] =
    if (!Fs.exists(spark, path)) None
    else Some(fromJson(Fs.readString(spark, path)))
}
