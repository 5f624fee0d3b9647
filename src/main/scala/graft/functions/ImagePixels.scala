package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real pixel decode for image payloads riding in `binary` columns, using
  * the JDK's OWN codecs (`javax.imageio` ships PNG/GIF/JPEG readers in
  * every standard JRE) — closes the r3 "pixel decode needs a codec
  * dependency" stub without adding one (r9 verdict item #5; header-only
  * metadata stays [[ImageHeaders]]).
  *
  * Safety at scale: dimensions are read from the CONTAINER HEADER first
  * (`ImageReader.getWidth/getHeight` — no pixel allocation), and any
  * payload claiming more than [[ImagePixels.MaxPixels]] pixels is refused
  * as undecodable (null) BEFORE the decoder allocates — a decompression
  * bomb cannot OOM an executor. Per-row memory during stats is one
  * image-row buffer + fixed histograms; never a per-color map.
  *
  * Determinism: all stats are integer arithmetic over the decoded sRGB
  * bytes followed by IEEE double division, so DuckDB replays them exactly
  * on synthesized images (the q_multimodal_meta oracle pattern, now for
  * pixels):
  *  - `mean_r/g/b` = channel sum / pixel count (UNROUNDED — both engines
  *    compute the same exact-integer sum and the same IEEE division);
  *  - `luma_entropy` = Shannon entropy (bits, rounded 6) of the 256-bin
  *    integer-luma histogram, `luma = (299·r + 587·g + 114·b) / 1000`
  *    integer division;
  *  - `dominant_hex` = the most populous 4-bit-per-channel quantized
  *    color bucket as 3 uppercase hex digits (smallest bucket wins ties)
  *    — quantized so the tracker is a fixed 4096-int array, not an
  *    unbounded per-color map.
  */
object ImagePixels {

  /** Decode refusal threshold: 16.7M pixels ≈ a 64 MB ARGB buffer — far
    * above any training-corpus thumbnail, far below an executor OOM. */
  final val MaxPixels: Long = 1L << 24

  val StatsType: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_pixels", LongType, nullable = false),
    StructField("mean_r", DoubleType, nullable = false),
    StructField("mean_g", DoubleType, nullable = false),
    StructField("mean_b", DoubleType, nullable = false),
    StructField("luma_entropy", DoubleType, nullable = false),
    StructField("dominant_hex", StringType, nullable = false)))

  /** Full decode + one-pass stats. Null for anything the JDK cannot
    * decode (corrupt/unknown container) or refuses ([[MaxPixels]]). */
  def compute(bytes: Array[Byte]): InternalRow = {
    if (bytes == null) return null
    val in = new java.io.ByteArrayInputStream(bytes)
    var stream: javax.imageio.stream.ImageInputStream = null
    try {
      stream = javax.imageio.ImageIO.createImageInputStream(in)
      val readers = javax.imageio.ImageIO.getImageReaders(stream)
      if (!readers.hasNext) return null
      val reader = readers.next()
      try {
        reader.setInput(stream, true, true)
        // header-first dimension check: refuse bombs before allocating
        val w = reader.getWidth(0)
        val h = reader.getHeight(0)
        if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return null
        val img = reader.read(0)
        stats(img)
      } finally reader.dispose()
    } catch {
      case _: Exception => null
    } finally {
      if (stream != null) try stream.close() catch { case _: Exception => () }
    }
  }

  private def stats(img: java.awt.image.BufferedImage): InternalRow = {
    val w = img.getWidth
    val h = img.getHeight
    val n = w.toLong * h
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    val lumaHist = new Array[Long](256)
    val quantHist = new Array[Long](4096)
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val rgb = row(x)
        val r = (rgb >> 16) & 0xFF
        val g = (rgb >> 8) & 0xFF
        val b = rgb & 0xFF
        sumR += r; sumG += g; sumB += b
        lumaHist((299 * r + 587 * g + 114 * b) / 1000) += 1
        quantHist(((r >> 4) << 8) | ((g >> 4) << 4) | (b >> 4)) += 1
        x += 1
      }
      y += 1
    }
    var entropy = 0.0
    var i = 0
    while (i < 256) {
      val c = lumaHist(i)
      if (c > 0) {
        val p = c.toDouble / n
        entropy -= p * (math.log(p) / math.log(2.0))
      }
      i += 1
    }
    var dom = 0; var domCnt = -1L
    i = 0
    while (i < 4096) {
      if (quantHist(i) > domCnt) { dom = i; domCnt = quantHist(i) }
      i += 1
    }
    val hex = {
      val s = Integer.toHexString(dom).toUpperCase(java.util.Locale.ROOT)
      "0" * (3 - s.length) + s
    }
    val r6 = BigDecimal(entropy)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](w, h, n, sumR.toDouble / n, sumG.toDouble / n,
        sumB.toDouble / n, r6, UTF8String.fromString(hex)))
  }

  /** 64-bit perceptual difference-hash (dHash): decode behind the same
    * guard path as [[compute]] (header-first dims, [[MaxPixels]]
    * refusal), box-average integer luma onto a 9×8 grid with
    * integer-boundary cells (pixel x lands in cell `⌊x·9/w⌋`) — fully
    * deterministic arithmetic, deliberately NOT Graphics2D resampling
    * (whose interpolation is platform/JDK-dependent and would make the
    * hash irreproducible across environments) — then bit `8·cy + cx`
    * is set iff cell (cx+1, cy) is strictly brighter than cell
    * (cx, cy), compared exactly by cross-multiplied sums (no float).
    * Null for undecodable payloads and for images smaller than the
    * grid (w < 9 or h < 8 — a sub-thumbnail has no 9×8 structure to
    * hash). Near-identical images differ in few bits; Hamming distance
    * is the near-dup metric ([[graft.operators.Multimodal
    * .imageNearDupPairs]]). */
  def phash(bytes: Array[Byte]): Any = {
    if (bytes == null) return null
    val in = new java.io.ByteArrayInputStream(bytes)
    var stream: javax.imageio.stream.ImageInputStream = null
    try {
      stream = javax.imageio.ImageIO.createImageInputStream(in)
      val readers = javax.imageio.ImageIO.getImageReaders(stream)
      if (!readers.hasNext) return null
      val reader = readers.next()
      try {
        reader.setInput(stream, true, true)
        val w = reader.getWidth(0)
        val h = reader.getHeight(0)
        if (w < 9 || h < 8 || w.toLong * h > MaxPixels) return null
        val img = reader.read(0)
        dhashGrid(img)
      } finally reader.dispose()
    } catch {
      case _: Exception => null
    } finally {
      if (stream != null) try stream.close() catch { case _: Exception => () }
    }
  }

  private def dhashGrid(img: java.awt.image.BufferedImage): Any = {
    val w = img.getWidth
    val h = img.getHeight
    // per-cell luma sums and pixel counts over the 9x8 grid
    val sums = Array.ofDim[Long](8, 9)
    val cnts = Array.ofDim[Long](8, 9)
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      val cy = (y.toLong * 8 / h).toInt
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val cx = (x.toLong * 9 / w).toInt
        val rgb = row(x)
        val luma = (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF)
          + 114 * (rgb & 0xFF)) / 1000
        sums(cy)(cx) += luma
        cnts(cy)(cx) += 1
        x += 1
      }
      y += 1
    }
    var bits = 0L
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        // right cell strictly brighter, exactly: s1/n1 > s0/n0
        if (sums(cy)(cx + 1) * cnts(cy)(cx) >
            sums(cy)(cx) * cnts(cy)(cx + 1))
          bits |= 1L << (8 * cy + cx)
        cx += 1
      }
      cy += 1
    }
    bits
  }

  /** Deterministic PNG synthesis for oracles/specs: `kind = 0` solid
    * `rgb1`; `kind = 1` vertical split — the first `w / 2` pixel columns
    * `rgb1`, the rest `rgb2`. Stats of the result are pure arithmetic in
    * (w, h, rgb1, rgb2), which is what makes the decode path
    * DuckDB-checkable end-to-end (encode → decode → stats). */
  def synth(kind: Int, w: Int, h: Int, rgb1: Int, rgb2: Int): Array[Byte] = {
    require(kind == 0 || kind == 1, s"unknown synthetic image kind $kind")
    require(w > 0 && h > 0 && w.toLong * h <= MaxPixels,
      s"refusing to synthesize a ${w}x$h image")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val split = if (kind == 0) w else w / 2
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, if (x < split) rgb1 else rgb2)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }
}

/** Codegen'd `binary → struct` pixel statistics (see [[ImagePixels]]).
  * Null when the payload cannot (or must not) be decoded. */
case class ImagePixelStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ImagePixelStats expects binary input, got ${t.simpleString}")
  }

  override def dataType: DataType = ImagePixels.StatsType
  override def nullable: Boolean = true

  override def nullSafeEval(bytes: Any): Any =
    ImagePixels.compute(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
       |${ev.value} = graft.functions.ImagePixels.compute($b);
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ImagePixelStats =
    copy(child = newChild)
}

/** Codegen'd `binary → bigint` perceptual difference-hash (see
  * [[ImagePixels.phash]]). Null when the payload cannot be decoded or
  * is smaller than the 9×8 hash grid. */
case class ImagePerceptualHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ImagePerceptualHash expects binary input, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(bytes: Any): Any =
    ImagePixels.phash(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"""
       |Object ${ev.value}Obj = graft.functions.ImagePixels.phash($b);
       |${ev.isNull} = (${ev.value}Obj == null);
       |${ev.value} = ${ev.isNull} ? -1L
       |  : ((java.lang.Long) ${ev.value}Obj).longValue();
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): ImagePerceptualHash =
    copy(child = newChild)
}

/** Codegen'd synthetic-PNG generator (see [[ImagePixels.synth]]):
  * `(kind, w, h, rgb1, rgb2) → binary`. Harness-facing — it exists so the
  * encode → decode → stats round trip is exercised per-row inside a plan
  * (the oracle query), not so pipelines generate images. NULL in ⇒ NULL
  * out. */
case class SyntheticImageBytes(children: Seq[Expression]) extends Expression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size != 5)
      TypeCheckResult.TypeCheckFailure(
        s"SyntheticImageBytes needs (kind, w, h, rgb1, rgb2), got ${children.size} args")
    else children.zipWithIndex.collectFirst {
      case (c, i) if c.dataType != IntegerType =>
        TypeCheckResult.TypeCheckFailure(
          s"SyntheticImageBytes input $i must be int, got ${c.dataType.simpleString}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = children.exists(_.nullable)

  override def eval(input: InternalRow): Any = {
    val vs = new Array[Int](5)
    var j = 0
    while (j < 5) {
      val v = children(j).eval(input)
      if (v == null) return null
      vs(j) = v.asInstanceOf[Int]
      j += 1
    }
    ImagePixels.synth(vs(0), vs(1), vs(2), vs(3), vs(4))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val args = ctx.freshName("synthArgs")
    val anyNull = ctx.freshName("synthAnyNull")
    val evals = children.zipWithIndex.map { case (c, j) =>
      val e = c.genCode(ctx)
      s"""
         |if (!$anyNull) {
         |  ${e.code}
         |  if (${e.isNull}) { $anyNull = true; }
         |  else { $args[$j] = ${e.value}; }
         |}
       """.stripMargin
    }
    val body =
      s"""
         |int[] $args = new int[5];
         |boolean $anyNull = false;
         |${evals.mkString("\n")}
       """.stripMargin
    if (nullable) {
      ev.copy(code = code"""$body
        |boolean ${ev.isNull} = $anyNull;
        |byte[] ${ev.value} = $anyNull ? null :
        |  graft.functions.ImagePixels.synth($args[0], $args[1], $args[2], $args[3], $args[4]);""".stripMargin)
    } else {
      ev.copy(code = code"""$body
        |byte[] ${ev.value} =
        |  graft.functions.ImagePixels.synth($args[0], $args[1], $args[2], $args[3], $args[4]);""".stripMargin,
        isNull = FalseLiteral)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SyntheticImageBytes =
    copy(children = newChildren)
}
