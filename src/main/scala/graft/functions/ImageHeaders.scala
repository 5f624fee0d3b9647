package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Container-header parsing for image payloads riding in `binary` columns —
  * pure byte logic over the leading bytes, no codec library. Supports the
  * three containers whose dimensions live in fixed/scannable header fields:
  *
  *  - PNG:  8-byte signature, then the IHDR chunk at a FIXED offset —
  *          width/height big-endian at bytes 16/20, bit depth at 24, color
  *          type at 25 (channels = 1/3/1/2/4 for color types 0/2/3/4/6).
  *  - JPEG: `FF D8` then a marker walk (each segment `FF mk len16 …`) to the
  *          first SOFn frame header (C0–CF minus C4/C8/CC): sample precision
  *          byte, then height/width big-endian, then component count.
  *  - GIF:  "GIF87a"/"GIF89a", width/height LITTLE-endian at bytes 6/8,
  *          channels reported as 3 (palette RGB).
  *
  * The reference treats media payloads as opaque bytes end-to-end
  * (reference: no counterpart — its pipelines carry media as unparsed
  * blobs); parsing the header here is what makes the multimodal metadata
  * REAL rather than the r3 stub, while an actual pixel decode still needs a
  * codec and stays out of scope. */
object ImageHeaders {

  final val FmtUnknown = 0
  final val FmtPng = 1
  final val FmtJpeg = 2
  final val FmtGif = 3

  private final val MaxDim = (1 << 24) - 1

  /** One scan of the header bytes, packed into a long so the codegen'd
    * expression stays a primitive: fmt bits [56,62), channels [48,56),
    * width [24,48), height [0,24). Unknown/corrupt containers → 0L. */
  def packedMeta(b: Array[Byte]): Long = {
    if (b == null) return 0L
    val png = pngMeta(b)
    if (png != 0L) return png
    val jpg = jpegMeta(b)
    if (jpg != 0L) return jpg
    gifMeta(b)
  }

  private def pack(fmt: Int, channels: Int, w: Int, h: Int): Long = {
    val cw = math.min(math.max(w, 0), MaxDim).toLong
    val ch = math.min(math.max(h, 0), MaxDim).toLong
    (fmt.toLong << 56) | (channels.toLong << 48) | (cw << 24) | ch
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF

  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)

  private def pngMeta(b: Array[Byte]): Long = {
    if (b.length < 26) return 0L
    if (u8(b, 0) != 0x89 || u8(b, 1) != 0x50 || u8(b, 2) != 0x4E || u8(b, 3) != 0x47 ||
        u8(b, 4) != 0x0D || u8(b, 5) != 0x0A || u8(b, 6) != 0x1A || u8(b, 7) != 0x0A) return 0L
    // first chunk must be IHDR ("IHDR" at bytes 12..15)
    if (u8(b, 12) != 'I' || u8(b, 13) != 'H' || u8(b, 14) != 'D' || u8(b, 15) != 'R') return 0L
    val w = be32(b, 16)
    val h = be32(b, 20)
    if (w <= 0 || h <= 0) return 0L
    val channels = u8(b, 25) match {
      case 0 => 1 // grayscale
      case 2 => 3 // truecolor
      case 3 => 1 // palette
      case 4 => 2 // gray + alpha
      case 6 => 4 // truecolor + alpha
      case _ => return 0L
    }
    pack(FmtPng, channels, math.min(w, MaxDim.toLong).toInt, math.min(h, MaxDim.toLong).toInt)
  }

  private def jpegMeta(b: Array[Byte]): Long = {
    if (b.length < 4 || u8(b, 0) != 0xFF || u8(b, 1) != 0xD8) return 0L
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xFF) return 0L // lost marker alignment
      val marker = u8(b, i + 1)
      if (marker == 0xFF) { // fill byte
        i += 1
      } else if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) { // standalone
        i += 2
      } else if (marker == 0xD9 || marker == 0xDA) { // EOI / start-of-scan before any SOF
        return 0L
      } else {
        val segLen = be16(b, i + 2)
        if (segLen < 2) return 0L
        val isSof = marker >= 0xC0 && marker <= 0xCF &&
          marker != 0xC4 && marker != 0xC8 && marker != 0xCC
        if (isSof) {
          if (i + 9 >= b.length) return 0L
          val h = be16(b, i + 5)
          val w = be16(b, i + 7)
          val channels = u8(b, i + 9)
          if (w <= 0 || h <= 0 || channels <= 0) return 0L
          return pack(FmtJpeg, channels, w, h)
        }
        i += 2 + segLen
      }
    }
    0L
  }

  private def gifMeta(b: Array[Byte]): Long = {
    if (b.length < 10) return 0L
    if (u8(b, 0) != 'G' || u8(b, 1) != 'I' || u8(b, 2) != 'F' || u8(b, 3) != '8' ||
        (u8(b, 4) != '7' && u8(b, 4) != '9') || u8(b, 5) != 'a') return 0L
    val w = u8(b, 6) | (u8(b, 7) << 8) // little-endian
    val h = u8(b, 8) | (u8(b, 9) << 8)
    if (w <= 0 || h <= 0) return 0L
    pack(FmtGif, 3, w, h)
  }
}

/** Codegen'd wrapper: `binary → long` (packed header metadata, see
  * [[ImageHeaders.packedMeta]]). A single header scan per row inside
  * whole-stage codegen; the struct fields are then unpacked with ordinary
  * bitwise column arithmetic, so no UDF and no boxing anywhere. */
case class ImageHeaderPacked(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ImageHeaderPacked expects binary input, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(bytes: Any): Any =
    ImageHeaders.packedMeta(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.functions.ImageHeaders.packedMeta($b);")

  override protected def withNewChildInternal(newChild: Expression): ImageHeaderPacked =
    copy(child = newChild)
}
