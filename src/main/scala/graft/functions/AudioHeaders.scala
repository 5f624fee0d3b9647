package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Real RIFF/WAVE header parsing over an opaque `binary` audio column — the
  * audio member of the multimodal metadata family (images:
  * [[ImageHeaders]]). One forward chunk walk reads the `fmt ` chunk
  * (format/channels/rate/bits) and the `data` chunk's declared size;
  * no sample decode, no codec. Truncated payloads are fine as long as the
  * chunk HEADERS are present — the declared data size is reported even when
  * the sample bytes themselves are absent (metadata extraction over blob
  * stores commonly reads only the first KB of each object).
  *
  * The reference treats media as unparsed blobs end-to-end (no
  * counterpart); like the image parsers this makes the metadata real while
  * actual decode stays out of scope. */
object AudioHeaders {

  final val FmtUnknown = 0
  final val FmtWavPcm = 1

  private final val MaxRate = (1 << 20) - 1     // 20 bits
  private final val MaxSamples = (1 << 28) - 1  // 28 bits

  /** Packed layout: fmt [60,64), channels [56,60), bits [48,56),
    * sample_rate [28,48), n_samples [0,28); values clamp to their field
    * width (documented metadata bound, not a parse failure).
    * Unknown/corrupt containers → 0L. */
  def packedWavMeta(b: Array[Byte]): Long = {
    if (b == null || b.length < 36) return 0L
    if (b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return 0L
    var audioFormat = -1
    var channels = 0
    var rate = 0L
    var bits = 0
    var blockAlign = 0
    var dataSize = -1L
    var i = 12
    // chunk walk: id(4) + size(le32) + payload; stop once both chunks seen
    // or the next chunk HEADER would run past the buffer
    while (i + 8 <= b.length && (audioFormat < 0 || dataSize < 0)) {
      val isFmt = b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' '
      val isData = b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' && b(i + 3) == 'a'
      val size = le32(b, i + 4)
      if (size < 0) return 0L
      if (isFmt) {
        if (size < 16 || i + 8 + 16 > b.length) return 0L
        audioFormat = le16(b, i + 8)
        channels = le16(b, i + 10)
        rate = le32(b, i + 12)
        blockAlign = le16(b, i + 20)
        bits = le16(b, i + 22)
      } else if (isData) {
        dataSize = size
      }
      // payload may be truncated (metadata-only reads); advancing past the
      // end simply terminates the walk. Long arithmetic: a 4 GB declared
      // size must not wrap Int and re-enter the buffer.
      val next = i.toLong + 8L + size + (size & 1L) // RIFF pads odd chunks
      i = if (next > b.length.toLong) b.length else next.toInt
    }
    if (audioFormat != 1 || channels <= 0 || rate <= 0 || bits <= 0) return 0L
    val nSamples =
      if (dataSize >= 0 && blockAlign > 0) dataSize / blockAlign else 0L
    (FmtWavPcm.toLong << 60) |
      (math.min(channels, 15).toLong << 56) |
      (math.min(bits, 255).toLong << 48) |
      (math.min(rate, MaxRate.toLong) << 28) |
      math.min(nSamples, MaxSamples.toLong)
  }

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)
}

/** Codegen'd wrapper: `binary → long` (packed WAV metadata, see
  * [[AudioHeaders.packedWavMeta]]) — same single-scan shape as
  * [[ImageHeaderPacked]]. */
case class WavHeaderPacked(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"WavHeaderPacked expects binary input, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(bytes: Any): Any =
    AudioHeaders.packedWavMeta(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.functions.AudioHeaders.packedWavMeta($b);")

  override protected def withNewChildInternal(newChild: Expression): WavHeaderPacked =
    copy(child = newChild)
}
