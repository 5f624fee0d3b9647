package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata.
  *
  * The design treats media as (bytes, metadata-struct) pairs flowing through
  * ordinary Spark columns — partitioning, pruning and shuffles all work on
  * the metadata while the bytes ride along untouched until a decode stage.
  *
  * The DECODE itself is stubbed (no image/audio codecs ship in this
  * environment): [[decodeImageStub]] derives deterministic fake dimensions
  * from the payload hash. Everything around it — schema, batch iteration via
  * `mapPartitions`, column plumbing — is real and tested, so swapping a real
  * codec in changes one function.
  */
object Multimodal {

  /** Metadata schema attached to every decoded media column. */
  val ImageMetaType: StructType = StructType(Seq(
    StructField("byte_len", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("content_hash", StringType, nullable = false)))

  /** Column-expression metadata extraction (no UDF): byte length + hash are
    * real; width/height are the deterministic stub decode (length-derived
    * mixing, ANSI-safe and replicable in any SQL engine), marking where a
    * codec plugs in. */
  def imageMeta(binCol: Column): Column = {
    val len = octet_length(binCol).cast("long")
    struct(
      len.as("byte_len"),
      (pmod(len * lit(2654435761L), lit(512L)).cast("int") + 128).as("width"),
      (pmod(len * lit(40503L), lit(512L)).cast("int") + 128).as("height"),
      lit(3).as("channels"),
      md5(binCol).as("content_hash"))
  }

  /** Deterministic stub decode for the `mapPartitions` path: a real
    * implementation would parse the container header / invoke a codec. */
  def decodeImageStub(bytes: Array[Byte]): (Long, Int, Int, Int) = {
    val h = bytes.foldLeft(1125899906842597L)((acc, b) => acc * 31 + b)
    (bytes.length.toLong,
      128 + math.floorMod(h, 512L).toInt,
      128 + math.floorMod(h >> 9, 512L).toInt,
      3)
  }

  /** Batch decode via `mapPartitions`: the executor-side iteration shape a
    * real codec needs (per-partition batching, no per-row driver calls).
    * Appends a metadata struct column derived from `binCol`. */
  def decodeBatch(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("decoded", StructType(Seq(
        StructField("byte_len", LongType),
        StructField("width", IntegerType),
        StructField("height", IntegerType),
        StructField("channels", IntegerType)))))
    val binIdx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val (len, w, h, c) =
          if (bytes == null) (0L, 0, 0, 0) else decodeImageStub(bytes)
        Row.fromSeq(r.toSeq :+ Row(len, w, h, c))
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Deterministic frame sampling stub: slice `n` evenly-spaced windows out
    * of the payload (what a video frame-sampler's output shape looks like:
    * one row per (media, frame_no) with a bytes window). Pure column ops. */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String, n: Int): DataFrame = {
    val len = octet_length(col(binCol))
    df.select(col(idCol), col(binCol),
      posexplode(sequence(lit(0), lit(n - 1))).as(Seq("frame_no", "__i")))
      .withColumn("offset", (col("__i") * greatest(len / n, lit(1))) + 1)
      .select(
        col(idCol), col("frame_no"),
        col(binCol).substr(col("offset"), greatest(len / n, lit(1))).as("frame_bytes"))
  }
}
