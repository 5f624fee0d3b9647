package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** All `b` Poisson-bootstrap replicate sums in ONE imperative aggregate:
  * the buffer is `Array[Double](2b)` of interleaved `(Σw·x, Σw)` pairs,
  * updated row-by-row at Java speed. Weights replay the engine-wide
  * formula exactly — replicate `b` reads the 8-hex slice `(b−1)%4` of
  * `md5(seed # id # (b−1)/4)` (here sliced from the digest BYTES, which
  * is the same 32-bit value the hex substring parses) through the
  * pinned Poisson(1) inverse-CDF thresholds — so the DuckDB oracle and
  * the spec replay stay valid verbatim.
  *
  * Why an Aggregator and not 2b relational aggregate columns: 128
  * expression trees each containing an md5/conv/9-way-CASE blow the
  * whole-stage-codegen method budget, and HashAggregate silently falls
  * back to interpreted evaluation — measured 156 s for 18M×64 at ×30
  * where this buffer runs the identical arithmetic in ~8 s. (The
  * explode(1..b) formulation is worse still: ~295 s of generator-row
  * allocation.) The buffer map-side combines, so the exchange carries
  * `2b doubles × partitions` — nothing row-grain ever moves. */
final class PoissonBootstrapAggregator(seed: Long, b: Int)
    extends Aggregator[(String, Double), Array[Double], Seq[Double]] {
  require(b >= 1, "need at least one replicate")

  /** Cumulative Poisson(1) pmf — MUST stay equal to ModelEval's pinned
    * thresholds (spec-checked). */
  private val cum: Array[Double] = Array(
    0.3678794411714423, 0.7357588823428846, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119, 0.9999897508033253, 0.9999988747974512)

  @transient private lazy val md5 =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  override def zero: Array[Double] = new Array[Double](2 * b)

  override def reduce(buf: Array[Double], row: (String, Double)): Array[Double] = {
    val (id, x) = row
    val digest = md5.get()
    val nChunks = (b + 3) / 4
    var chunk = 0
    while (chunk < nChunks) {
      digest.reset()
      // concat_ws semantics: a null id is SKIPPED, not rendered
      val key =
        if (id == null) s"$seed#$chunk" else s"$seed#$id#$chunk"
      val d = digest.digest(key.getBytes("UTF-8"))
      var slot = 0
      while (slot < 4) {
        val bb = chunk * 4 + slot
        if (bb < b) {
          val o = slot * 4
          val v = ((d(o) & 0xffL) << 24) | ((d(o + 1) & 0xffL) << 16) |
            ((d(o + 2) & 0xffL) << 8) | (d(o + 3) & 0xffL)
          val u = (v + 1L).toDouble / 4294967297.0
          var k = 0
          while (k < cum.length && u > cum(k)) k += 1
          val w = k.toDouble // k == cum.length -> truncated tail weight 9
          buf(2 * bb) += w * x
          buf(2 * bb + 1) += w
        }
        slot += 1
      }
      chunk += 1
    }
    buf
  }

  override def merge(a: Array[Double], c: Array[Double]): Array[Double] = {
    var i = 0
    while (i < a.length) { a(i) += c(i); i += 1 }
    a
  }

  override def finish(buf: Array[Double]): Seq[Double] = buf.toSeq
  override def bufferEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}

object PoissonBootstrap {
  /** `(Σw·x, Σw)` pairs for all `b` replicates, interleaved: index
    * `2(b−1)+1` (1-based) is replicate b's Σw·x, `2b` its Σw. */
  def replicateSums(seed: Long, b: Int)(id: Column, x: Column): Column =
    udaf(new PoissonBootstrapAggregator(seed, b),
      Encoders.tuple(Encoders.STRING, Encoders.scalaDouble))
      .apply(id, x)
}
