package graft

import org.apache.spark.sql.functions._

import graft.functions.ImagePixels
import graft.operators.Multimodal

/** Real pixel decode via the JDK's own ImageIO codecs (r9 verdict item
  * #5): the encode → decode → stats round trip on synthesized images with
  * arithmetically-known statistics, the codegen'd column path against the
  * JVM-side computation, palette (GIF) exactness, and the header-first
  * dimension-bomb refusal. */
class MultimodalPixelsSpec extends GraftSuite {
  import spark.implicits._

  private def rgb(r: Int, g: Int, b: Int): Int = (r << 16) | (g << 8) | b

  private def quantHex(r: Int, g: Int, b: Int): String =
    "%03X".format(((r >> 4) << 8) | ((g >> 4) << 4) | (b >> 4))

  private def luma(r: Int, g: Int, b: Int): Int = (299 * r + 587 * g + 114 * b) / 1000

  test("solid PNG round trip: exact means, zero entropy, dominant bucket") {
    val bytes = ImagePixels.synth(0, 10, 7, rgb(200, 30, 90), 0)
    val row = ImagePixels.compute(bytes)
    assert(row != null)
    assert(row.getInt(0) == 10 && row.getInt(1) == 7 && row.getLong(2) == 70L)
    assert(row.getDouble(3) == 200.0 && row.getDouble(4) == 30.0 &&
      row.getDouble(5) == 90.0)
    assert(row.getDouble(6) == 0.0)
    assert(row.getUTF8String(7).toString == quantHex(200, 30, 90))
  }

  test("vertical-split PNG: weighted means, two-point luma entropy, " +
      "majority dominant (odd width => right side wins)") {
    val (c1, c2) = ((10, 250, 60), (240, 20, 200))
    val (w, h) = (9, 5)
    val bytes = ImagePixels.synth(1, w, h,
      rgb(c1._1, c1._2, c1._3), rgb(c2._1, c2._2, c2._3))
    val row = ImagePixels.compute(bytes)
    val nL = (w / 2).toLong * h // 20
    val nR = w.toLong * h - nL  // 25
    val n = (w * h).toDouble
    assert(row.getDouble(3) == (nL * c1._1 + nR * c2._1) / n)
    assert(row.getDouble(4) == (nL * c1._2 + nR * c2._2) / n)
    assert(row.getDouble(5) == (nL * c1._3 + nR * c2._3) / n)
    val (l1, l2) = (luma(c1._1, c1._2, c1._3), luma(c2._1, c2._2, c2._3))
    assert(l1 != l2, "test colors must land in distinct luma bins")
    val p = nL / n
    val wantEnt = BigDecimal(
      -(p * math.log(p) + (1 - p) * math.log(1 - p)) / math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getDouble(6) == wantEnt)
    assert(row.getUTF8String(7).toString == quantHex(c2._1, c2._2, c2._3))
  }

  test("256-level gray gradient has exactly 8 bits of luma entropy") {
    val img = new java.awt.image.BufferedImage(
      256, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 256).foreach(i => img.setRGB(i, 0, rgb(i, i, i)))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val row = ImagePixels.compute(out.toByteArray)
    // luma(i,i,i) = (299i + 587i + 114i)/1000 = i: all 256 bins equal
    assert(row.getDouble(6) == 8.0)
    assert(row.getDouble(3) == 127.5 && row.getDouble(4) == 127.5)
  }

  test("GIF palette round trip is exact for a two-color image") {
    // 16x16, not smaller: the JDK's own GIF LZW encoder corrupts the
    // last row of very small multi-color images (probed: an 8x4
    // two-color GIF round-trips with its bottom row wrong THROUGH
    // ImageIO alone) — the stats faithfully report what the JDK decodes
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 16).foreach(x => (0 until 16).foreach(y =>
      img.setRGB(x, y, if (x < 8) rgb(255, 0, 0) else rgb(0, 0, 255))))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", out)
    val row = ImagePixels.compute(out.toByteArray)
    assert(row != null)
    assert(row.getInt(0) == 16 && row.getInt(1) == 16)
    assert(row.getDouble(3) == 127.5 && row.getDouble(5) == 127.5)
  }

  /** Seeded pseudo-random RGB image via an LCG — every pixel differs, so
    * the 9×8 cell averages carry real structure (unlike solid synths). */
  private def noiseImage(w: Int, h: Int, seed: Long,
      perturb: Option[(Int, Int, Int, Int)] = None): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var s = seed
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        s = s * 6364136223846793005L + 1442695040888963407L
        img.setRGB(x, y, ((s >>> 24) & 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    perturb.foreach { case (px, py, pw, ph) =>
      (py until math.min(py + ph, h)).foreach { yy =>
        (px until math.min(px + pw, w)).foreach { xx =>
          img.setRGB(xx, yy, 0x000000) // black out one block
        }
      }
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("perceptual hash: identical bytes hash equal; a blacked-out block " +
      "moves few bits; an unrelated image moves many; sub-grid is null") {
    def ph(b: Array[Byte]): Long =
      ImagePixels.phash(b).asInstanceOf[Long]
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val base = noiseImage(90, 64, seed = 42)
    val again = noiseImage(90, 64, seed = 42)
    assert(ph(base) == ph(again))
    // black out one full grid row (y 24-31 = cell row 3): every
    // horizontal comparison in that row goes flat-false, nothing else
    // moves - so the distance is that row's original bit count, >= 1
    // unless the seed already zeroed all 8 (checked: it doesn't)
    val nearDup = noiseImage(90, 64, seed = 42,
      perturb = Some((0, 24, 90, 8)))
    val dNear = hamming(ph(base), ph(nearDup))
    assert(dNear >= 1 && dNear <= 8, s"near-dup moved $dNear bits")
    // a different seed is visually unrelated
    val other = noiseImage(90, 64, seed = 777)
    val dOther = hamming(ph(base), ph(other))
    assert(dOther > 12, s"unrelated image moved only $dOther bits")
    // smaller than the 9x8 grid: nothing to hash
    assert(ImagePixels.phash(ImagePixels.synth(0, 8, 7, 0x123456, 0)) == null)
    assert(ImagePixels.phash(Array[Byte](1, 2, 3)) == null)
  }

  test("imageNearDupPairs: finds exactly the perturbed pair (banded " +
      "candidates == brute force), null hashes never pair") {
    val rows = Seq(
      (1L, noiseImage(90, 64, 42)),
      (2L, noiseImage(90, 64, 42, Some((0, 24, 90, 8)))),  // near-dup of 1
      (3L, noiseImage(90, 64, 777)),                       // unrelated
      (4L, noiseImage(90, 64, 31337)),                     // unrelated
      (5L, Array[Byte](9, 9, 9))                           // undecodable
    ).toDF("img_id", "bytes")
    val got = Multimodal.imageNearDupPairs(rows, "img_id", "bytes",
      maxHamming = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L)))
    assert(got.head._3 >= 1 && got.head._3 <= 8)
    // brute force over the decoded hashes agrees (recall-1 certificate)
    val hs = rows.select(col("img_id"),
      Multimodal.perceptualHash(col("bytes")).as("h"))
      .collect().flatMap(r =>
        if (r.isNullAt(1)) None else Some(r.getLong(0) -> r.getLong(1)))
    val brute = for {
      (ia, ha) <- hs; (ib, hb) <- hs
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 8
    } yield (ia, ib)
    assert(brute.toSeq == got.map(p => (p._1, p._2)).toSeq)
  }

  test("undecodable payloads are null: corrupt bytes, and a PNG header " +
      "claiming more than MaxPixels is refused from the header") {
    assert(ImagePixels.compute("just some text".getBytes("UTF-8")) == null)
    assert(ImagePixels.compute(null) == null)
    def hexBytes(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // valid signature + IHDR claiming 20000x20000 (4e8 pixels > 2^24):
    // the reader resolves dimensions from the header; the guard refuses
    // before any pixel allocation
    val bomb = hexBytes("89504E470D0A1A0A0000000D49484452" +
      "00004E20" + "00004E20" + "0802000000DEADBEEF" + "00")
    assert(ImagePixels.compute(bomb) == null)
  }

  test("codegen'd column path == JVM computation, nulls for corrupt rows") {
    val df = Seq(
      (1L, 0, 12, 9, rgb(17, 34, 51), 0),
      (2L, 1, 7, 7, rgb(1, 2, 3), rgb(250, 250, 250)),
      (3L, -1, 0, 0, 0, 0)) // corrupt marker
      .toDF("id", "kind", "w", "h", "c1", "c2")
    val payload = when(col("kind") >= 0,
      Multimodal.syntheticImage(col("kind"), col("w"), col("h"),
        col("c1"), col("c2")))
      .otherwise(encode(lit("not an image"), "UTF-8"))
    val got = df.select(col("id"), col("kind"), col("w"), col("h"),
        col("c1"), col("c2"), Multimodal.pixelStats(payload).as("s"))
      .orderBy("id").collect()
    got.foreach { r =>
      if (r.getInt(1) < 0) assert(r.isNullAt(6))
      else {
        val want = ImagePixels.compute(ImagePixels.synth(
          r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5)))
        val s = r.getStruct(6)
        assert(s.getInt(0) == want.getInt(0) && s.getLong(2) == want.getLong(2))
        assert(s.getDouble(3) == want.getDouble(3))
        assert(s.getDouble(6) == want.getDouble(6))
        assert(s.getString(7) == want.getUTF8String(7).toString)
      }
    }
  }
}
