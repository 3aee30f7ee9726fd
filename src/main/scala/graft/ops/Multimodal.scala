package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, processed batch-wise per partition.
  *
  * IMAGE decode is REAL: [[decodeImage]] uses JDK-builtin `javax.imageio`
  * (PNG/JPEG/BMP/GIF/WBMP — the readers every JDK registers), and
  * [[extractFeatures]] / [[enrichMeta]] / [[resizeImages]] run actual
  * pixel math (luma histograms, dimension probing, bilinear resampling +
  * PNG re-encode) through the partition-batched pipeline. AUDIO decode is
  * REAL for the JDK's `javax.sound.sampled` surface ([[decodeAudio]]:
  * WAV/AIFF/AU containers, 8/16-bit PCM → amplitude histograms, frame
  * counts, duration). VIDEO is REAL for Motion-JPEG AVI ([[decodeVideo]]:
  * a RIFF container walk + per-frame `javax.imageio` JPEG decode —
  * pooled luma histograms, frame dimensions, header-rate duration);
  * compressed codecs (H.264 etc.) have no JDK decoder, so those payloads
  * — and anything no reader accepts — fall back to [[fakeDecode]], a
  * deterministic byte-histogram stand-in: an honest stub, loudly
  * documented, never silently wrong.
  *
  * Scale notes: payloads stay OFF the shuffle path — decode and feature
  * extraction are map-side only (`mapPartitions` over row iterators, the
  * Scala analog of a Pandas-UDF `mapInPandas` batch loop); repartitioning
  * (when needed) goes by id range, sized so a partition's payload bytes
  * fit executor memory (`spark.sql.files.maxPartitionBytes` governs the
  * scan side). `ImageIO`'s disk cache is disabled per-JVM so decode never
  * touches executor-local temp files.
  */
object Multimodal {

  // never spill decode scratch to executor-local disk
  javax.imageio.ImageIO.setUseCache(false)

  /** Canonical media-table schema: id + opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),     // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),    // images/video
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)  // audio/video
  ))

  /** Feature-extraction output schema. `decoded` records whether the row
    * went through a real codec path (image via `javax.imageio`, audio via
    * `javax.sound.sampled`, MJPEG-AVI video via the RIFF walk) or the
    * deterministic stub (compressed codecs / payloads no reader accepts).
    */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType), nullable = true),
    StructField("decoded", BooleanType, nullable = false)))

  /** Synthesize a media table from the documents corpus (text bytes stand
    * in for payload bytes) — deterministic test input.
    */
  def synthesize(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      lit("application/octet-stream").as("mime"),
      lit(null).cast(IntegerType).as("width"),
      lit(null).cast(IntegerType).as("height"),
      lit(null).cast(LongType).as("duration_ms"))

  /** Real image decode via JDK-builtin `javax.imageio`. Returns None when
    * no registered reader accepts the payload (not an image, truncated,
    * or an unregistered codec) — callers fall back to [[fakeDecode]] for
    * such rows, flagged `decoded = false`.
    */
  def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (payload == null || payload.length == 0) None
    else
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      catch { case _: Exception => None } // a corrupt stream is data, not a crash

  /** Container sniff by magic bytes — cheap, no decode. */
  def sniffMime(payload: Array[Byte]): Option[String] = {
    def at(i: Int): Int = payload(i) & 0xff
    def ascii(i: Int, s: String): Boolean =
      payload.length >= i + s.length && s.indices.forall(j => at(i + j) == s(j))
    if (payload == null || payload.length < 4) None
    else if (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G')
      Some("image/png")
    else if (at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff) Some("image/jpeg")
    else if (at(0) == 'B' && at(1) == 'M') Some("image/bmp")
    else if (at(0) == 'G' && at(1) == 'I' && at(2) == 'F' && at(3) == '8')
      Some("image/gif")
    else if (ascii(0, "RIFF") && ascii(8, "WAVE")) Some("audio/wav")
    else if (ascii(0, "RIFF") && ascii(8, "AVI ")) Some("video/x-msvideo")
    else if (ascii(0, "FORM") && ascii(8, "AIFF")) Some("audio/aiff")
    else None
  }

  /** A parsed MJPEG AVI: the collected JPEG frame payloads (capped at the
    * decoder's `maxFrames`), the header's microseconds-per-frame and
    * total frame count (0 when the `avih` header is absent). Duration
    * comes from the HEADER's frame count — not `frames.length`, which the
    * cap may truncate — falling back to the collected count for
    * header-less containers.
    */
  final case class MjpegVideo(frames: Seq[Array[Byte]], microSecPerFrame: Long,
                              totalFrames: Long) {
    def durationMs: Long = {
      // both fields are u32s from the wire: the product can exceed a Long
      // on adversarial headers, and malformed input must degrade, never
      // wrap negative — saturate instead
      val n = BigInt(if (totalFrames > 0) totalFrames else frames.length.toLong)
      (n * microSecPerFrame / 1000).min(Long.MaxValue).toLong
    }
  }

  /** Real video FRAME decode for Motion-JPEG AVI — the one video format a
    * bare JVM can fully handle, because the container is a plain RIFF walk
    * (public spec) and each frame is a JPEG that [[decodeImage]] reads.
    * Compressed codecs (H.264 etc.) have no JDK decoder and stay on the
    * [[fakeDecode]] stub path. Returns None when the payload is not a
    * RIFF/AVI or contains no JPEG frame chunks.
    *
    * The walk: RIFF/LIST chunks are `fourcc + u32le size + body` (bodies
    * pad to even); frame chunks are `##dc`/`##db` inside the `movi` list,
    * kept only when they carry the JPEG magic; `avih` carries
    * dwMicroSecPerFrame (offset 0) and dwTotalFrames (offset 16), read
    * for [[MjpegVideo.durationMs]] so the `maxFrames` collection cap
    * never distorts duration. Malformed sizes stop the walk — truncated
    * input yields the frames seen so far, never a crash.
    *
    * `maxFrames` bounds the frame payloads held in memory at once
    * (row-sized work in a partition); callers that need the full frame
    * set of long clips must raise it explicitly.
    */
  def decodeVideo(payload: Array[Byte], maxFrames: Int = 64): Option[MjpegVideo] = {
    if (payload == null || payload.length < 12) return None
    def cc(o: Int): String = new String(payload, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def u32(o: Int): Long =
      (payload(o) & 0xffL) | ((payload(o + 1) & 0xffL) << 8) |
        ((payload(o + 2) & 0xffL) << 16) | ((payload(o + 3) & 0xffL) << 24)
    if (cc(0) != "RIFF" || cc(8) != "AVI ") return None
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var micros = 0L
    var total = 0L
    var avihSeen = false
    // early exit: once the frame cap is reached AND the header has been
    // read (avih precedes movi in any well-formed AVI), nothing further
    // in a long clip can change the result — don't scan gigabytes of
    // remaining frame chunks
    def done: Boolean = frames.length >= maxFrames && avihSeen
    def walk(start: Int, end: Int): Unit = {
      var o = start
      while (o + 8 <= end && !done) {
        val id = cc(o)
        val size = u32(o + 4)
        if (size < 0 || o + 8 + size > end) return // malformed: stop
        val body = o + 8
        val len = size.toInt
        if (id == "RIFF" || id == "LIST") walk(body + 4, body + len)
        else if (id.length == 4 && id(0).isDigit && id(1).isDigit &&
          (id.substring(2) == "dc" || id.substring(2) == "db") && len >= 3 &&
          (payload(body) & 0xff) == 0xff && (payload(body + 1) & 0xff) == 0xd8) {
          if (frames.length < maxFrames)
            frames += java.util.Arrays.copyOfRange(payload, body, body + len)
        } else if (id == "avih" && len >= 4) {
          avihSeen = true
          micros = u32(body)
          // truncated headers (< 20 bytes) still yield the frame rate;
          // dwTotalFrames needs the full prefix
          if (len >= 20) total = u32(body + 16)
        }
        o = body + len + (len & 1) // bodies pad to even
      }
    }
    walk(12, payload.length)
    if (frames.isEmpty) None else Some(MjpegVideo(frames.toSeq, micros, total))
  }

  /** A decoded PCM audio clip: format metadata plus the signed sample
    * values (channel-interleaved), parsed from the JDK-builtin
    * `javax.sound.sampled` readers (WAV/AIFF/AU containers, PCM payload).
    */
  final case class PcmAudio(sampleRate: Float, channels: Int, bits: Int,
                            frames: Long, samples: Array[Int]) {
    def durationMs: Long = (frames * 1000.0 / sampleRate).toLong
  }

  /** Real audio decode via JDK-builtin `javax.sound.sampled`: WAV/AIFF/AU
    * containers with 8- or 16-bit integer PCM. Returns None for anything
    * a JDK reader rejects (not audio, truncated, or a compressed codec —
    * MP3/AAC/Vorbis have no JDK decoder and stay on the [[fakeDecode]]
    * stub path).
    */
  def decodeAudio(payload: Array[Byte]): Option[PcmAudio] =
    if (payload == null || payload.length == 0) None
    else try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val f = in.getFormat
        val enc = f.getEncoding
        val ok = (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
          enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED) &&
          (f.getSampleSizeInBits == 8 || f.getSampleSizeInBits == 16)
        if (!ok) None
        else {
          val raw = in.readAllBytes()
          val bytesPer = f.getSampleSizeInBits / 8
          val n = raw.length / bytesPer
          val out = new Array[Int](n)
          var i = 0
          while (i < n) {
            out(i) =
              if (bytesPer == 1) {
                if (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED)
                  (raw(i) & 0xff) - 128
                else raw(i).toInt
              } else {
                val b0 = raw(i * 2) & 0xff
                val b1 = raw(i * 2 + 1) & 0xff
                val v = if (f.isBigEndian) (b0 << 8) | b1 else (b1 << 8) | b0
                val s = v.toShort.toInt
                if (enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED)
                  v - 32768
                else s
              }
            i += 1
          }
          Some(PcmAudio(f.getSampleRate, f.getChannels, f.getSampleSizeInBits,
            in.getFrameLength, out))
        }
      } finally in.close()
    } catch { case _: Exception => None } // corrupt/unsupported is data, not a crash

  /** Amplitude histogram of a PCM clip: `dims` equal-width bins over the
    * normalized magnitude range [0, 1], fractions of total samples.
    * Integer math until the final division — deterministic.
    */
  def audioFeatures(a: PcmAudio, dims: Int): Array[Float] = {
    val counts = new Array[Long](dims)
    val full = if (a.bits == 8) 128 else 32768 // |min sample|
    var i = 0
    while (i < a.samples.length) {
      val mag = math.min(math.abs(a.samples(i)), full - 1)
      counts(mag * dims / full) += 1
      i += 1
    }
    val out = new Array[Float](dims)
    val n = math.max(a.samples.length, 1)
    var d = 0
    while (d < dims) { out(d) = counts(d).toFloat / n; d += 1 }
    out
  }

  /** Luma histogram of a decoded image: `dims` equal-width bins over the
    * 0..255 Rec.601 luma range, normalized to pixel-count fractions.
    * Integer pixel math until the final division — deterministic across
    * runs and partitionings.
    */
  def imageFeatures(img: java.awt.image.BufferedImage, dims: Int): Array[Float] = {
    val counts = lumaCounts(img, dims)
    val n = img.getWidth.toLong * img.getHeight
    val out = new Array[Float](dims)
    var i = 0
    while (i < dims) { out(i) = counts(i).toFloat / n; i += 1 }
    out
  }

  private def lumaCounts(img: java.awt.image.BufferedImage, dims: Int): Array[Long] = {
    val counts = new Array[Long](dims)
    val w = img.getWidth
    val h = img.getHeight
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val luma = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        counts(luma * dims / 256) += 1
        x += 1
      }
      y += 1
    }
    counts
  }

  /** Luma histogram pooled over the clip's COLLECTED frames — i.e. the
    * first `maxFrames` passed to [[decodeVideo]] (counts accumulate
    * across frames, normalized by total pixels). None when no frame
    * decodes.
    */
  def videoFeatures(v: MjpegVideo, dims: Int): Option[Array[Float]] = {
    val counts = new Array[Long](dims)
    var pixels = 0L
    v.frames.foreach { f =>
      decodeImage(f).foreach { img =>
        val c = lumaCounts(img, dims)
        var i = 0
        while (i < dims) { counts(i) += c(i); i += 1 }
        pixels += img.getWidth.toLong * img.getHeight
      }
    }
    if (pixels == 0) None
    else Some(counts.map(c => (c.toDouble / pixels).toFloat))
  }

  /** Perceptual difference hash (dHash) of a decoded image: the image is
    * area-averaged (exact integer math — no `Graphics` resampling, so the
    * value is identical on every JVM) onto a 9×8 luma grid, and bit
    * (r, c) is set when cell (r, c) is darker than its right neighbor —
    * 64 horizontal-gradient bits. Near-identical pixels (re-encode,
    * resize, mild crop/brightness) move few gradient signs, so
    * near-duplicate images land within a small hamming distance — the
    * image analog of text SimHash, pairable by the same Manku
    * permute-and-block machinery ([[graft.ops.Dedup.simhashCandidates]]).
    */
  def dHash(img: java.awt.image.BufferedImage): Long = {
    val gw = 9; val gh = 8
    val w = img.getWidth; val h = img.getHeight
    val cell = Array.ofDim[Long](gh, gw)
    var gy = 0
    while (gy < gh) {
      var gx = 0
      while (gx < gw) {
        // source rectangle of this cell; never empty (floor grid + min-1)
        val x0 = gx * w / gw; val x1 = math.min(math.max((gx + 1) * w / gw, x0 + 1), w)
        val y0 = gy * h / gh; val y1 = math.min(math.max((gy + 1) * h / gh, y0 + 1), h)
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sum += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
            x += 1
          }
          y += 1
        }
        cell(gy)(gx) = sum / ((x1 - x0).toLong * (y1 - y0))
        gx += 1
      }
      gy += 1
    }
    var bits = 0L
    var i = 0
    gy = 0
    while (gy < gh) {
      var gx = 0
      while (gx < 8) {
        if (cell(gy)(gx) < cell(gy)(gx + 1)) bits |= 1L << i
        i += 1
        gx += 1
      }
      gy += 1
    }
    bits
  }

  /** Per-image perceptual signatures, shaped for
    * [[graft.ops.Dedup.simhashCandidates]]: `(media_id, simhash, s0..s3)`
    * with the dHash split into four 16-bit Manku blocks. Decode + hash are
    * map-side (`mapPartitions`, payload never shuffles); rows no image
    * reader accepts produce NO signature (undecodable bytes have no
    * perceptual content — pairing them would manufacture false dups).
    */
  def imageHashes(media: DataFrame, idCol: String = "media_id"): DataFrame = {
    val hashSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("simhash", LongType, nullable = false)))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(hashSchema))
    val sigs = media.select(col(idCol), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          decodeImage(payload).map(img => Row(r.getLong(0), dHash(img)))
        }
      }(enc)
    val mask = (1L << 16) - 1
    sigs.select(col(idCol) +: col("simhash") +:
      (0 until 4).map(k =>
        shiftrightunsigned(col("simhash"), 16 * k).bitwiseAND(lit(mask))
          .as(s"s$k")): _*)
  }

  /** Near-duplicate IMAGE pairs by perceptual hash: [[imageHashes]] +
    * Manku block-local pairing — exact recall for dHash hamming ≤
    * `maxHamming` (< 4) over all decodable images, never an all-pairs
    * pixel comparison. Returns `(id_a, id_b, hamming)`.
    */
  def perceptualDedupPairs(media: DataFrame, maxHamming: Int = 3,
                           idCol: String = "media_id"): DataFrame =
    Dedup.simhashCandidates(imageHashes(media, idCol), numBlocks = 4,
      maxHamming = maxHamming, idCol = idCol)

  /** Perceptual envelope hash of a decoded PCM clip: mean absolute
    * amplitude over 65 equal time slices (exact integer math), one bit
    * per adjacent-slice gradient sign — the audio analog of [[dHash]].
    * Gradient signs are invariant to uniform volume scaling and to the
    * 8-bit/16-bit amplitude domain, and coarse slices survive mild
    * resampling, so re-encoded / re-leveled clips land within a small
    * hamming distance. Empty clips hash to 0.
    */
  def audioEnvelopeHash(a: PcmAudio): Long = {
    val slices = 65
    val n = a.samples.length
    if (n == 0) return 0L
    val env = new Array[Long](slices)
    var s = 0
    while (s < slices) {
      val i0 = s.toLong * n / slices
      val i1 = math.max((s + 1).toLong * n / slices, i0 + 1).min(n.toLong)
      var sum = 0L
      var i = i0.toInt
      while (i < i1) { sum += math.abs(a.samples(i).toLong); i += 1 }
      env(s) = sum / (i1 - i0)
      s += 1
    }
    var bits = 0L
    var b = 0
    while (b < 64) {
      if (env(b) < env(b + 1)) bits |= 1L << b
      b += 1
    }
    bits
  }

  /** Per-clip perceptual signatures (PCM audio), shaped for
    * [[graft.ops.Dedup.simhashCandidates]] like [[imageHashes]]; rows no
    * JDK audio reader accepts produce no signature.
    */
  def audioHashes(media: DataFrame, idCol: String = "media_id"): DataFrame = {
    val hashSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("simhash", LongType, nullable = false)))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(hashSchema))
    val sigs = media.select(col(idCol), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          decodeAudio(payload).map(a => Row(r.getLong(0), audioEnvelopeHash(a)))
        }
      }(enc)
    val mask = (1L << 16) - 1
    sigs.select(col(idCol) +: col("simhash") +:
      (0 until 4).map(k =>
        shiftrightunsigned(col("simhash"), 16 * k).bitwiseAND(lit(mask))
          .as(s"s$k")): _*)
  }

  /** Near-duplicate AUDIO pairs by envelope hash — same Manku
    * block-local pairing as [[perceptualDedupPairs]], exact recall at
    * hamming ≤ `maxHamming` (< 4) over all decodable clips.
    */
  def audioDedupPairs(media: DataFrame, maxHamming: Int = 3,
                      idCol: String = "media_id"): DataFrame =
    Dedup.simhashCandidates(audioHashes(media, idCol), numBlocks = 4,
      maxHamming = maxHamming, idCol = idCol)

  /** STUB decode for payloads with no JDK codec (compressed audio like
    * MP3/AAC, compressed video like H.264 — the real paths above cover
    * PCM audio and MJPEG AVI): a deterministic byte-histogram projection
    * so the batch shape, schema, and partitioning are exercised end to
    * end. Swap in a real codec here when the deployment ships one.
    */
  def fakeDecode(payload: Array[Byte], dims: Int): Array[Float] = {
    val out = new Array[Float](dims)
    if (payload != null) {
      var i = 0
      while (i < payload.length) {
        out(i % dims) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
    }
    out
  }

  /** Partition-batched feature extraction: the Scala analog of a
    * `mapInPandas` loop — one iterator pass per partition, no per-row
    * driver involvement, payload never shuffled. Every kind runs its REAL
    * decode where a JDK codec exists — [[decodeImage]] luma histograms,
    * [[decodeAudio]] amplitude histograms, [[decodeVideo]] pooled frame
    * luma — and payloads no reader accepts (compressed codecs, corrupt
    * bytes) fall back to the deterministic [[fakeDecode]] stub, flagged
    * in `decoded`.
    */
  def extractFeatures(media: DataFrame, dims: Int = 8): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(featureSchema))
    media
      .select("media_id", "kind", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val kind = r.getString(1)
          val payload = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
          val real = kind match {
            case "image" => decodeImage(payload).map(imageFeatures(_, dims))
            case "audio" => decodeAudio(payload).map(audioFeatures(_, dims))
            case "video" => decodeVideo(payload).flatMap(videoFeatures(_, dims))
            case _       => None
          }
          Row(r.getLong(0), kind,
            if (payload == null) 0 else payload.length,
            real.getOrElse(fakeDecode(payload, dims)),
            real.isDefined)
        }
      }(enc)
  }

  /** Probe real metadata map-side: image payloads a reader accepts get
    * `width`/`height` from the decoded dimensions, audio payloads get
    * `duration_ms` from the PCM frame count, and both get `mime` from the
    * container magic; every other row passes through untouched. Same
    * schema in and out ([[mediaSchema]]), payload never shuffled.
    */
  def enrichMeta(media: DataFrame): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(mediaSchema))
    media.select(mediaSchema.fieldNames.map(col).toIndexedSeq: _*)
      .mapPartitions { rows =>
        rows.map { r =>
          val kind = r.getString(1)
          val payload = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
          val mime = () => sniffMime(payload).getOrElse(r.getString(3))
          kind match {
            case "image" => decodeImage(payload) match {
              case Some(i) =>
                Row(r.getLong(0), kind, payload, mime(), i.getWidth, i.getHeight,
                  if (r.isNullAt(6)) null else r.getLong(6))
              case None => r
            }
            case "audio" => decodeAudio(payload) match {
              case Some(a) =>
                Row(r.getLong(0), kind, payload, mime(),
                  if (r.isNullAt(4)) null else r.getInt(4),
                  if (r.isNullAt(5)) null else r.getInt(5),
                  a.durationMs)
              case None => r
            }
            case "video" => decodeVideo(payload) match {
              case Some(v) =>
                val dims = v.frames.view.flatMap(decodeImage).headOption
                Row(r.getLong(0), kind, payload, mime(),
                  dims.map(i => Integer.valueOf(i.getWidth)).orNull,
                  dims.map(i => Integer.valueOf(i.getHeight)).orNull,
                  if (v.microSecPerFrame > 0) java.lang.Long.valueOf(v.durationMs)
                  else if (r.isNullAt(6)) null else r.getLong(6))
              case None => r
            }
            case _ => r
          }
        }
      }(enc)
  }

  /** Real image resize: decode, bilinear-resample to `w`×`h`, re-encode
    * as PNG, with metadata rewritten — map-side only, one pass per
    * partition. Image payloads no reader accepts keep the deterministic
    * truncation stub (the [[resize]] expression path) so the output stays
    * total; audio/video rows pass through untouched.
    */
  def resizeImages(media: DataFrame, w: Int, h: Int): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(mediaSchema))
    media.select(mediaSchema.fieldNames.map(col).toIndexedSeq: _*)
      .mapPartitions { rows =>
        rows.map { r =>
          val kind = r.getString(1)
          if (kind != "image") r
          else {
            val payload = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
            val resized = decodeImage(payload).map { img =>
              val out = new java.awt.image.BufferedImage(
                w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              try {
                g.setRenderingHint(
                  java.awt.RenderingHints.KEY_INTERPOLATION,
                  java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                g.drawImage(img, 0, 0, w, h, null); ()
              } finally g.dispose()
              val buf = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", buf)
              buf.toByteArray
            }
            val bytes = resized.getOrElse(
              if (payload == null) null else payload.take(w * h))
            Row(r.getLong(0), kind, bytes,
              if (resized.isDefined) "image/png" else r.getString(3),
              w, h, if (r.isNullAt(6)) null else r.getLong(6))
          }
        }
      }(enc)
  }

  /** Resize stub for image-ish payloads: emits the payload truncated to
    * `w*h` bytes (a real impl decodes, resamples, re-encodes here) with
    * the width/height metadata updated — the metadata/schema plumbing and
    * the map-side-only execution shape are the real, tested parts.
    */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame =
    media.select(
      col("media_id"), col("kind"),
      // non-image rows pass through untouched — only images are resized
      when(col("kind") === "image",
        substring(col("payload"), lit(1), lit(w * h)))
        .otherwise(col("payload")).as("payload"),
      col("mime"),
      when(col("kind") === "image", lit(w)).otherwise(col("width")).as("width"),
      when(col("kind") === "image", lit(h)).otherwise(col("height")).as("height"),
      col("duration_ms"))

  /** Schema of [[sampleVideoFrames]]: one row per sampled decoded frame. */
  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_no", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("luma", ArrayType(FloatType), nullable = true)))

  /** REAL frame sampling for MJPEG-AVI payloads: every `every`-th of the
    * clip's first `maxFrames` frames decodes ([[decodeVideo]] +
    * [[decodeImage]]) to `(media_id, frame_no, width, height, luma
    * histogram)` — raise `maxFrames` explicitly for long clips; the
    * default bounds per-row memory. Rows whose payload is not a decodable
    * MJPEG AVI produce no output — the byte-window [[sampleFrames]] stub
    * remains the total fallback for opaque codecs. Map-side only;
    * payloads never shuffle.
    */
  def sampleVideoFrames(media: DataFrame, every: Int = 1, dims: Int = 4,
                        maxFrames: Int = 64): DataFrame = {
    require(every > 0, "every must be positive")
    val enc = ExpressionEncoder(RowEncoder.encoderFor(frameSchema))
    media.select("media_id", "kind", "payload")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val payload = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
          val frames =
            if (r.getString(1) == "video")
              decodeVideo(payload, maxFrames).map(_.frames).getOrElse(Seq.empty)
            else Seq.empty
          frames.iterator.zipWithIndex
            .filter { case (_, i) => i % every == 0 }
            .flatMap { case (f, i) =>
              decodeImage(f).map(img =>
                Row(r.getLong(0), i, img.getWidth, img.getHeight,
                  imageFeatures(img, dims)))
            }
        }
      }(enc)
  }

  /** Frame sampling stub for video-ish payloads: the `frame`-byte window
    * at every `stride`-th offset stands in for a frame grab (base64'd for
    * display); a real impl swaps the window slice for a codec frame
    * decode. Pure expression tree — stays in codegen; `substring` slices
    * the binary payload directly.
    */
  def sampleFrames(media: DataFrame, stride: Int = 64, frame: Int = 16): DataFrame =
    media.select(
      col("media_id"),
      posexplode(transform(
        sequence(lit(0),
          greatest(floor((octet_length(col("payload")) - frame) / stride).cast("int"), lit(0))),
        i => base64(substring(col("payload"), i * stride + lit(1), lit(frame))))))
      .withColumnRenamed("pos", "frame_no")
      .withColumnRenamed("col", "frame_stub")
}
