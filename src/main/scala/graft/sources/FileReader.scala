package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.IndexMetadata

/** Multi-format file reading with the stored schema — never inference
  * (reference: IndexFileOperations.scala:146-167). Supported formats:
  * parquet, csv, json (reference parity) + orc (ours — built into
  * spark-sql, same columnar scan machinery as parquet); anything else
  * throws.
  *
  * Every read is tagged with the source file via Spark's native
  * `_metadata.file_path` / `_metadata.file_size` hidden columns (Spark
  * 3.2+), replacing the reference's `input_file_name()` + driver-side
  * `getFileStatus` UDF (reference: Index.scala:861-908) — strictly better:
  * no driver work, codegen-friendly, exact per-row attribution.
  */
object FileReader {
  val FilenameCol = "__graft_filename"
  val FileSizeCol = "__graft_file_size"

  val SupportedFormats: Set[String] = Set("parquet", "csv", "json", "orc")

  def requireSupported(format: String): Unit =
    if (!SupportedFormats.contains(format))
      throw new graft.UnsupportedFormatException(
        s"Unsupported format '$format' (supported: ${SupportedFormats.mkString(", ")})")

  /** Canonical filename form used in the index, filelist, and probes:
    * `scheme:/path` (authority included only when present, e.g. s3 buckets).
    * `_metadata.file_path` yields `file:///x` while users register `/x` —
    * both must land on the SAME string or the filelist↔index anti-join
    * would see every file as forever-unindexed. */
  def canonical(p: org.apache.hadoop.fs.Path): String = {
    val u = p.toUri
    val scheme = u.getScheme
    val auth = Option(u.getAuthority).getOrElse("")
    if (scheme == null) u.getPath
    else if (auth.isEmpty) s"$scheme:${u.getPath}"
    else s"$scheme://$auth${u.getPath}"
  }

  /** Normalize an already-qualified path string (safe on executors). */
  def normalizePath(p: String): String = canonical(new org.apache.hadoop.fs.Path(p))

  /** Driver-side: qualify a possibly scheme-less user path against its
    * filesystem, then canonicalize. */
  def qualify(spark: SparkSession, p: String): String = {
    val path = new org.apache.hadoop.fs.Path(p)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    canonical(fs.makeQualified(path))
  }

  /** Read a concrete set of files with stored schema + read options, tagged
    * with normalized filename and file size. Empty file set goes through a
    * schema-equivalent empty branch so downstream plans see the exact same
    * schema as the populated branch (reference empty-result parity:
    * IndexJoinOperations.scala:146-154, EmptyResultSchemaTests). */
  def readTagged(spark: SparkSession, meta: IndexMetadata, files: Seq[String]): DataFrame = {
    requireSupported(meta.format)
    if (files.isEmpty) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], meta.schema)
        .withColumn(FilenameCol, lit(null).cast("string"))
        .withColumn(FileSizeCol, lit(null).cast("long"))
    } else {
      // `_metadata.file_path` already emits the canonical `scheme:/path`
      // form `canonical()` produces (verified empirically: local files come
      // back as `file:/x`), so registered paths and per-row attribution
      // agree with NO per-row UDF — the column stays codegen-friendly and
      // never blocks pushdown around the scan.
      spark.read
        .format(meta.format)
        .schema(meta.schema)
        .options(meta.readOptions)
        .load(files: _*)
        .withColumn(FilenameCol, col("_metadata.file_path"))
        .withColumn(FileSizeCol, col("_metadata.file_size"))
    }
  }

  /** Materialize computed-index expressions as columns (reference:
    * IndexFileOperations.scala:207-212 — arbitrary Spark SQL scalar exprs). */
  def applyComputed(df: DataFrame, meta: IndexMetadata): DataFrame =
    meta.indexes.filter(_.indexType == "computed").foldLeft(df) { (d, ix) =>
      d.withColumn(ix.column, expr(ix.expr.get))
    }

  /** Materialize requested exploded-index aliases. Explodes multiply row
    * count, so they are applied only when the alias is actually needed
    * (join column or selection). `explode_outer` keeps rows with empty /
    * null arrays; join conditions on the alias drop the nulls naturally. */
  def applyExploded(df: DataFrame, meta: IndexMetadata, aliases: Set[String]): DataFrame =
    meta.indexes
      .filter(ix => ix.isExplodedShaped && aliases.contains(ix.column))
      .foldLeft(df) { (d, ix) => d.withColumn(ix.column, explode_outer(expr(ix.expr.get))) }

  /** Plain data read — no `_metadata` attribution. Query paths use this:
    * tagging pulls the whole `_metadata` struct (incl. per-row row-index
    * generation) into every scan, and queries never need it (plan audit
    * showed 7 extra scan columns on every probe before this split). */
  def readPlain(spark: SparkSession, meta: IndexMetadata, files: Seq[String]): DataFrame = {
    requireSupported(meta.format)
    if (files.isEmpty) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], meta.schema)
    } else {
      spark.read
        .format(meta.format)
        .schema(meta.schema)
        .options(meta.readOptions)
        .load(files: _*)
    }
  }

  /** Full user-facing read path: base read → computed → exploded → column
    * selection (reference: IndexFileOperations.scala:84-106). */
  def readFiles(
      spark: SparkSession,
      meta: IndexMetadata,
      files: Seq[String],
      neededAliases: Set[String] = Set.empty,
      selection: Option[Seq[String]] = None): DataFrame = {
    val base = applyExploded(
      applyComputed(readPlain(spark, meta, files), meta), meta, neededAliases)
    selection match {
      case Some(cols) => base.select(cols.distinct.map(col): _*)
      case None       => base
    }
  }
}
