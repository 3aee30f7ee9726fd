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

  /** Deterministic 65-slice amplitude envelope whose ADJACENT slices
    * always differ by ≥ 0.05 — every hash gradient bit is a real
    * envelope feature, not quantization noise.
    */
  private val testEnv: Seq[Double] = (0 until 65).map { s =>
    if (s % 2 == 0) 0.15 + 0.3 * ((s * 31) % 17) / 17.0
    else 0.60 + 0.35 * ((s * 29) % 19) / 19.0
  }

  /** 16-bit (or 8-bit) mono PCM WAV with one amplitude segment per hash
    * slice (`samplesPer` samples each → 65·samplesPer total, aligned
    * with [[Multimodal.audioEnvelopeHash]]'s 65 slices).
    */
  private def wav(amps: Seq[Double], rate: Int = 8000,
                  samplesPer: Int = 64, bits: Int = 16): Array[Byte] = {
    val n = amps.length * samplesPer
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, bits, 1, bits == 16, false)
    val bytesPer = bits / 8
    val raw = new Array[Byte](n * bytesPer)
    for (i <- 0 until n) {
      val a = amps(i / samplesPer)
      val v = (math.sin(i * 0.3) * a * (if (bits == 16) 30000 else 120)).toInt
      if (bits == 16) {
        raw(2 * i) = (v & 0xff).toByte
        raw(2 * i + 1) = ((v >> 8) & 0xff).toByte
      } else raw(i) = (v + 128).toByte // 8-bit PCM is unsigned
    }
    val buf = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
    buf.toByteArray
  }

  test("audio envelope hash: volume/bit-depth invariant, far for different envelopes") {
    val env = testEnv
    val a0 = Multimodal.decodeAudio(wav(env)).get
    val h0 = Multimodal.audioEnvelopeHash(a0)
    // uniform volume scaling preserves every gradient sign
    val hQuiet = Multimodal.audioEnvelopeHash(
      Multimodal.decodeAudio(wav(env.map(_ * 0.4))).get)
    assert(hamming(h0, hQuiet) <= 3, s"volume moved ${hamming(h0, hQuiet)} bits")
    // 8-bit re-encode of the same envelope
    val h8 = Multimodal.audioEnvelopeHash(
      Multimodal.decodeAudio(wav(env, bits = 8)).get)
    assert(hamming(h0, h8) <= 6, s"8-bit re-encode moved ${hamming(h0, h8)} bits")
    // different content: a monotone ramp (every gradient up) vs the
    // alternating test envelope (half the gradients down)
    val ramp = (0 until 65).map(i => 0.1 + 0.8 * i / 64.0)
    val hRamp = Multimodal.audioEnvelopeHash(
      Multimodal.decodeAudio(wav(ramp)).get)
    assert(hamming(h0, hRamp) > 16)
  }

  test("audioDedupPairs pairs the re-leveled twin, not the different clip") {
    val env = testEnv
    val rows = java.util.Arrays.asList(
      Row(1L, "audio", wav(env), null, null, null, null),
      Row(2L, "audio", wav(env.map(_ * 0.5)), null, null, null, null),
      Row(3L, "audio", wav((0 until 65).map(i => 0.1 + 0.8 * i / 64.0)), null, null, null, null),
      Row(4L, "audio", "not audio".getBytes("UTF-8"), null, null, null, null))
    val media = spark.createDataFrame(rows, Multimodal.mediaSchema)
    val pairs = Multimodal.audioDedupPairs(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "re-leveled twin must pair")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
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
