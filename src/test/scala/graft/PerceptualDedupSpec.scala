package graft

import graft.ops.Multimodal
import java.awt.image.BufferedImage
import org.apache.spark.sql.Row

/** [[graft.ops.Multimodal.dHash]] / [[Multimodal.perceptualDedupPairs]] —
  * perceptual image dedup: re-encoded / lightly-perturbed images must
  * pair, unrelated images must not, undecodable payloads must not
  * participate.
  */
class PerceptualDedupSpec extends SparkSpec {

  /** Deterministic 64×48 gradient-with-a-box test image. */
  private def baseImage(boxShade: Int): BufferedImage = {
    val img = new BufferedImage(64, 48, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 48; x <- 0 until 64) {
      val g = (x * 255) / 63
      val inBox = x >= 16 && x < 40 && y >= 12 && y < 36
      val v = if (inBox) boxShade else g
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, buf)
    buf.toByteArray
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("dHash is stable under re-encode and small perturbation, far for distinct content") {
    val base = baseImage(30)
    val h0 = Multimodal.dHash(base)
    // PNG → JPEG re-encode: lossy, but gradients survive
    val jpegBytes = encode(base, "jpg")
    val h1 = Multimodal.dHash(Multimodal.decodeImage(jpegBytes).get)
    assert(hamming(h0, h1) <= 3, s"re-encode moved ${hamming(h0, h1)} bits")
    // small perturbation: nudge the box shade
    val h2 = Multimodal.dHash(baseImage(34))
    assert(hamming(h0, h2) <= 3, s"perturbation moved ${hamming(h0, h2)} bits")
    // different content: inverted gradient
    val inv = new BufferedImage(64, 48, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 48; x <- 0 until 64) {
      val v = 255 - (x * 255) / 63
      inv.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    assert(hamming(h0, Multimodal.dHash(inv)) > 16)
  }

  test("dHash survives an area-average-consistent downscale") {
    val big = baseImage(30)
    val small = new BufferedImage(32, 24, BufferedImage.TYPE_INT_RGB)
    val g = small.createGraphics()
    try { g.drawImage(big, 0, 0, 32, 24, null); () } finally g.dispose()
    assert(hamming(Multimodal.dHash(big), Multimodal.dHash(small)) <= 6)
  }

  test("perceptualDedupPairs finds re-encodes/perturbations, skips undecodable and distinct") {
    val inv = new BufferedImage(64, 48, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 48; x <- 0 until 64) {
      val v = 255 - (x * 255) / 63
      inv.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val rows = java.util.Arrays.asList(
      Row(1L, "image", encode(baseImage(30), "png"), null, null, null, null),
      Row(2L, "image", encode(baseImage(30), "jpg"), null, null, null, null),
      Row(3L, "image", encode(baseImage(34), "png"), null, null, null, null),
      Row(4L, "image", encode(inv, "png"), null, null, null, null),
      Row(5L, "image", "not an image".getBytes("UTF-8"), null, null, null, null))
    val media = spark.createDataFrame(rows, Multimodal.mediaSchema)
    val pairs = Multimodal.perceptualDedupPairs(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "re-encoded twin must pair")
    assert(pairs.contains((1L, 3L)), "perturbed twin must pair")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), "distinct content must not pair")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L), "undecodable must not participate")
  }

  test("imageHashes block slices reassemble the full hash") {
    val media = spark.createDataFrame(java.util.Arrays.asList(
      Row(7L, "image", encode(baseImage(30), "png"), null, null, null, null)),
      Multimodal.mediaSchema)
    val r = Multimodal.imageHashes(media).collect().head
    val sig = r.getAs[Long]("simhash")
    val rebuilt = (0 until 4).map(k =>
      (r.getAs[Long](s"s$k") & 0xffffL) << (16 * k)).reduce(_ | _)
    assert(rebuilt == sig)
  }
}
