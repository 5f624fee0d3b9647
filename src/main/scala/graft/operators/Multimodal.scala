package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{ImageHeaderPacked, ImageHeaders}

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata.
  *
  * The design treats media as (bytes, metadata-struct) pairs flowing through
  * ordinary Spark columns — partitioning, pruning and shuffles all work on
  * the metadata while the bytes ride along untouched until a decode stage.
  *
  * Dimensions/channels/format are parsed from REAL container headers (PNG
  * IHDR, JPEG SOFn marker walk, GIF logical screen descriptor) by the
  * codegen'd [[graft.functions.ImageHeaderPacked]] expression — pure byte
  * logic, no codec library. Only payloads in an unrecognized container fall
  * back to the deterministic length-derived stub (format `unknown`), which
  * marks where a full pixel codec would plug in; the codec itself doesn't
  * ship in this environment.
  */
object Multimodal {

  /** Metadata schema attached to every decoded media column. */
  val ImageMetaType: StructType = StructType(Seq(
    StructField("byte_len", LongType, nullable = false),
    StructField("fmt", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("content_hash", StringType, nullable = false)))

  /** Column-expression metadata extraction (no UDF): one codegen'd header
    * scan per row packs (format, channels, width, height) into a long;
    * bitwise column arithmetic unpacks it. Unknown containers keep the
    * stub's length-derived dimensions (ANSI-safe, replicable in any SQL
    * engine) so the struct stays non-null for arbitrary payloads. */
  def imageMeta(binCol: Column): Column = {
    val len = octet_length(binCol).cast("long")
    val packed = GraftSqlBridge.column(
      ImageHeaderPacked(GraftSqlBridge.expression(binCol)))
    val fmtCode = shiftright(packed, 56).bitwiseAND(lit(0x3FL))
    val known = fmtCode > 0
    val width = when(known, shiftright(packed, 24).bitwiseAND(lit(0xFFFFFFL)))
      .otherwise(pmod(len * lit(2654435761L), lit(512L)) + 128)
    val height = when(known, packed.bitwiseAND(lit(0xFFFFFFL)))
      .otherwise(pmod(len * lit(40503L), lit(512L)) + 128)
    val channels = when(known, shiftright(packed, 48).bitwiseAND(lit(0xFFL)))
      .otherwise(lit(3L))
    val fmt = when(fmtCode === ImageHeaders.FmtPng, "png")
      .when(fmtCode === ImageHeaders.FmtJpeg, "jpeg")
      .when(fmtCode === ImageHeaders.FmtGif, "gif")
      .otherwise("unknown")
    struct(
      len.as("byte_len"),
      fmt.as("fmt"),
      width.cast("int").as("width"),
      height.cast("int").as("height"),
      channels.cast("int").as("channels"),
      md5(binCol).as("content_hash"))
  }

  /** WAV (RIFF/PCM) metadata over an opaque audio `binary` column — same
    * codegen'd packed-long shape as [[imageMeta]], via
    * [[graft.functions.AudioHeaders.packedWavMeta]]. Non-WAV payloads
    * yield fmt "unknown" with zeroed audio fields (the struct stays
    * non-null for arbitrary blobs). `duration_ms` is integer floor of
    * n_samples / sample_rate. */
  def audioMeta(binCol: Column): Column = {
    val packed = GraftSqlBridge.column(
      graft.functions.WavHeaderPacked(GraftSqlBridge.expression(binCol)))
    val known = shiftright(packed, 60).bitwiseAND(lit(0xFL)) > 0
    val channels = shiftright(packed, 56).bitwiseAND(lit(0xFL))
    val bits = shiftright(packed, 48).bitwiseAND(lit(0xFFL))
    val rate = shiftright(packed, 28).bitwiseAND(lit(0xFFFFFL))
    val nSamples = packed.bitwiseAND(lit(0xFFFFFFFL))
    struct(
      octet_length(binCol).cast("long").as("byte_len"),
      when(known, "wav").otherwise("unknown").as("fmt"),
      channels.cast("int").as("channels"),
      bits.cast("int").as("bits"),
      rate.cast("int").as("sample_rate"),
      nSamples.as("n_samples"),
      when(known && rate > 0, floor(nSamples * lit(1000L) / rate).cast("long"))
        .otherwise(lit(0L)).as("duration_ms"),
      md5(binCol).as("content_hash"))
  }

  /** REAL pixel statistics over an opaque image `binary` column via the
    * JDK's own `javax.imageio` codecs (PNG/GIF/JPEG ship in every
    * standard JRE — no new dependency): one codegen'd decode per row
    * emitting `struct<width, height, n_pixels, mean_r, mean_g, mean_b,
    * luma_entropy, dominant_hex>`; null for payloads the JDK cannot
    * decode or that claim more than [[graft.functions.ImagePixels.MaxPixels]]
    * pixels (dimension bombs are refused from the HEADER, before any
    * allocation). Closes the r3 pixel-decode stub ([[decodeImageStub]]
    * remains only for unknown containers on the METADATA path). */
  def pixelStats(binCol: Column): Column = GraftSqlBridge.column(
    graft.functions.ImagePixelStats(GraftSqlBridge.expression(binCol)))

  /** 64-bit perceptual difference-hash of an image payload
    * ([[graft.functions.ImagePixels.phash]]): codegen'd binary → bigint,
    * null for undecodable bytes or images smaller than the 9×8 grid.
    * Near-identical images (re-encode, mild crop/brightness shift)
    * differ in few bits — Hamming distance is the image near-dup
    * metric, and the deterministic box-filter grid makes the same bytes
    * hash identically on every executor and JDK. */
  def perceptualHash(binCol: Column): Column = GraftSqlBridge.column(
    graft.functions.ImagePerceptualHash(GraftSqlBridge.expression(binCol)))

  /** Image near-duplicate pairs by perceptual hash: one row per pair
    * with Hamming distance ≤ `maxHamming` — `a_id | b_id | hamming`.
    * The visual analog of [[Dedup.simhashNearPairs]], riding the SAME
    * banded-LSH candidate generation ([[Dedup.hamming64NearPairs]]):
    * `maxHamming + 1` bands, pigeonhole recall 1, each pair emitted
    * once from its first equal band, exact `bit_count(xor)` verify.
    * Undecodable / sub-grid images hash null and never pair.
    *
    * 100 TB shape: one decode pass (the codegen'd expression next to
    * the scan — image BYTES never shuffle, only (id, 64-bit hash)
    * leaves the scan), one band-keyed exchange of 8-byte hashes,
    * bucket-local joins. Never all-pairs. */
  def imageNearDupPairs(
      df: DataFrame,
      idCol: String,
      binCol: String,
      maxHamming: Int = 3): DataFrame =
    Dedup.hamming64NearPairs(
      df.select(col(idCol).as("__id"),
        perceptualHash(col(binCol)).as("__h")),
      maxHamming)

  /** Deterministic synthetic PNG per row (harness/oracle utility):
    * `kind = 0` solid `rgb1`, `kind = 1` vertical split `rgb1 | rgb2`
    * at `w / 2`. Exists so the encode → decode → stats round trip is
    * plan-exercisable and DuckDB-checkable
    * ([[graft.functions.ImagePixels.synth]]). */
  def syntheticImage(kind: Column, w: Column, h: Column,
      rgb1: Column, rgb2: Column): Column = GraftSqlBridge.column(
    graft.functions.SyntheticImageBytes(
      Seq(kind, w, h, rgb1, rgb2).map(GraftSqlBridge.expression)))

  /** Header decode for the `mapPartitions` path: real container parse via
    * [[ImageHeaders.packedMeta]], stub fallback for unknown containers. */
  def decodeImage(bytes: Array[Byte]): (Long, String, Int, Int, Int) = {
    val packed = ImageHeaders.packedMeta(bytes)
    val fmtCode = ((packed >> 56) & 0x3F).toInt
    if (fmtCode != ImageHeaders.FmtUnknown) {
      val fmt = fmtCode match {
        case ImageHeaders.FmtPng  => "png"
        case ImageHeaders.FmtJpeg => "jpeg"
        case _                    => "gif"
      }
      (bytes.length.toLong, fmt,
        ((packed >> 24) & 0xFFFFFF).toInt, (packed & 0xFFFFFF).toInt,
        ((packed >> 48) & 0xFF).toInt)
    } else {
      val (len, w, h, c) = decodeImageStub(bytes)
      (len, "unknown", w, h, c)
    }
  }

  /** Deterministic stub for unrecognized containers only: a full pixel
    * decode would need a codec library; dimensions derive from the payload
    * hash so downstream plumbing still sees plausible, stable values. */
  def decodeImageStub(bytes: Array[Byte]): (Long, Int, Int, Int) = {
    val h = bytes.foldLeft(1125899906842597L)((acc, b) => acc * 31 + b)
    (bytes.length.toLong,
      128 + math.floorMod(h, 512L).toInt,
      128 + math.floorMod(h >> 9, 512L).toInt,
      3)
  }

  /** Batch decode via `mapPartitions`: the executor-side iteration shape a
    * full codec needs (per-partition batching, no per-row driver calls).
    * Appends a metadata struct column derived from `binCol`. */
  def decodeBatch(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("decoded", StructType(Seq(
        StructField("byte_len", LongType),
        StructField("fmt", StringType),
        StructField("width", IntegerType),
        StructField("height", IntegerType),
        StructField("channels", IntegerType)))))
    val binIdx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](binIdx)
        val (len, fmt, w, h, c) =
          if (bytes == null) (0L, "unknown", 0, 0, 0) else decodeImage(bytes)
        Row.fromSeq(r.toSeq :+ Row(len, fmt, w, h, c))
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
