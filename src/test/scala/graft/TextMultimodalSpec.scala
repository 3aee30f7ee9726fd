package graft

import graft.functions.TextAnalysis
import graft.ops.Multimodal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class TextMultimodalSpec extends SparkSpec {
  import spark.implicits._

  val texts = Seq(
    (1L, "the cat and the dog of the house"),
    (2L, "der hund und die katze und der vogel"),
    (3L, "le chat et la maison et le chien"),
    (4L, "xyzzy plugh qwerty"),
    (5L, "a b  c   d")
  ).toDF("doc_id", "text")

  test("langId votes on stopword profiles") {
    val got = texts.select($"doc_id", TextAnalysis.langId($"text").as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en")
    assert(got(2L) == "de")
    assert(got(3L) == "fr")
    assert(got(4L) == "unknown")
  }

  test("tokenCount collapses whitespace runs") {
    val got = texts.select($"doc_id", TextAnalysis.tokenCount($"text").as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got(5L) == 4)
    assert(got(1L) == 8)
  }

  test("bpe-ish token count splits words, digits, symbols") {
    val df = Seq((1L, "hello world42! x-1")).toDF("doc_id", "text")
    // pieces: hello, world, 4, 2, !, x, -, 1
    assert(df.select(TextAnalysis.bpeTokenCount($"text")).collect()(0).getInt(0) == 8)
  }

  test("fingerprint is whitespace/case-insensitive, content-sensitive") {
    val df = Seq(
      (1L, "Hello  World"), (2L, "hello world"), (3L, "hello worlds")
    ).toDF("doc_id", "text")
    val fp = df.select($"doc_id", TextAnalysis.fingerprint($"text").as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("quality score favors long clean text over short/noisy") {
    val df = Seq(
      (1L, "clean readable prose " * 30),
      (2L, "x!@#$%^&*()!!!"),
      (3L, "ok")
    ).toDF("doc_id", "text")
    val q = df.select($"doc_id", TextAnalysis.qualityScore($"text").as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(q(1L) > 0.9)
    assert(q(2L) < 0.1)
    assert(q(3L) < 0.1)
  }

  test("multimodal: synthesize → extractFeatures keeps schema and batch shape") {
    val docs = Seq((1L, "abcdef", "en", "s", 6L), (2L, "ghijkl", "de", "s", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.synthesize(docs)
    assert(media.schema.fieldNames.toSeq ==
      Multimodal.mediaSchema.fieldNames.toSeq)
    val feats = Multimodal.extractFeatures(media, dims = 4)
    assert(feats.schema == Multimodal.featureSchema)
    val rows = feats.orderBy("media_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getInt(2) == 6) // n_bytes
    val f = rows(0).getSeq[Float](3)
    assert(f.length == 4 && f.sum > 0)
  }

  test("real image decode: a planted PNG flows through features, meta, resize") {
    import java.awt.image.BufferedImage
    // 4×4 PNG, left half black / right half white — known luma histogram
    val img = new BufferedImage(4, 4, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4)
      img.setRGB(x, y, if (x < 2) 0x000000 else 0xffffff)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val png = buf.toByteArray

    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, "image", png, null, null, null, null),
      // same bytes under kind=audio: no JDK codec → deterministic stub
      org.apache.spark.sql.Row(2L, "audio", png, null, null, null, null),
      // an image-kind payload no reader accepts → stub fallback
      org.apache.spark.sql.Row(3L, "image", "not an image".getBytes("UTF-8"),
        null, null, null, null))
    val media = spark.createDataFrame(rows, Multimodal.mediaSchema)

    val feats = Multimodal.extractFeatures(media, dims = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(feats(1L).getBoolean(4), "planted PNG must take the real decode path")
    assert(feats(1L).getSeq[Float](3) == Seq(0.5f, 0.5f)) // 8 black + 8 white px
    assert(!feats(2L).getBoolean(4) && !feats(3L).getBoolean(4))

    val meta = Multimodal.enrichMeta(media).collect().map(r => r.getLong(0) -> r).toMap
    assert(meta(1L).getInt(4) == 4 && meta(1L).getInt(5) == 4)
    assert(meta(1L).getString(3) == "image/png")
    assert(meta(3L).isNullAt(4), "undecodable payloads keep their null metadata")

    val resized = Multimodal.resizeImages(media, 2, 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    val out = Multimodal.decodeImage(resized(1L).getAs[Array[Byte]](2))
    assert(out.exists(i => i.getWidth == 2 && i.getHeight == 2),
      "resized payload must re-decode at the target dimensions")
    assert(resized(1L).getString(3) == "image/png")
    assert(resized(3L).getAs[Array[Byte]](2).length == 4) // stub: w*h truncation
    assert(resized(2L).getAs[Array[Byte]](2).sameElements(png)) // audio untouched
  }

  test("real audio decode: a planted PCM WAV yields duration, histogram, mime") {
    import javax.sound.sampled._
    // 1 second of 8 kHz mono 16-bit PCM: alternating loud/quiet halves —
    // half the samples at |24576| (bin 1 of 2), half at |8192| (bin 0)
    val rate = 8000
    val raw = new Array[Byte](rate * 2)
    for (i <- 0 until rate) {
      val v: Short = if (i < rate / 2) 8192 else -24576
      raw(2 * i) = (v & 0xff).toByte            // little-endian lo
      raw(2 * i + 1) = ((v >> 8) & 0xff).toByte // hi
    }
    val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
    val buf = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(raw), fmt, rate.toLong),
      AudioFileFormat.Type.WAVE, buf)
    val wav = buf.toByteArray

    assert(Multimodal.sniffMime(wav).contains("audio/wav"))
    val a = Multimodal.decodeAudio(wav).get
    assert(a.sampleRate == 8000f && a.channels == 1 && a.bits == 16)
    assert(a.durationMs == 1000L)
    assert(Multimodal.audioFeatures(a, 2).toSeq == Seq(0.5f, 0.5f))
    assert(Multimodal.decodeAudio("not audio".getBytes("UTF-8")).isEmpty)

    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(7L, "audio", wav, null, null, null, null))
    val media = spark.createDataFrame(rows, Multimodal.mediaSchema)
    val f = Multimodal.extractFeatures(media, dims = 2).collect()(0)
    assert(f.getBoolean(4), "planted WAV must take the real decode path")
    assert(f.getSeq[Float](3) == Seq(0.5f, 0.5f))
    val m = Multimodal.enrichMeta(media).collect()(0)
    assert(m.getLong(6) == 1000L && m.getString(3) == "audio/wav")
  }

  test("real video decode: a planted MJPEG AVI yields frames, pooled luma, duration") {
    import java.awt.image.BufferedImage
    def jpeg(rgb: Int): Array[Byte] = {
      val img = new BufferedImage(4, 4, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 4; x <- 0 until 4) img.setRGB(x, y, rgb)
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", buf)
      buf.toByteArray
    }
    // minimal RIFF writer (test-only): chunk = fourcc + u32le + body (+pad)
    def u32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ u32(body.length) ++ body ++
        (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def list(form: String, body: Array[Byte]): Array[Byte] =
      "LIST".getBytes("US-ASCII") ++ u32(4 + body.length) ++ form.getBytes("US-ASCII") ++ body
    // avih: dwMicroSecPerFrame @0 (25 fps), dwTotalFrames @16
    val hdrl = list("hdrl", chunk("avih",
      u32(40000L) ++ new Array[Byte](12) ++ u32(2L) ++ new Array[Byte](36)))
    val movi = list("movi",
      chunk("00dc", jpeg(0x000000)) ++ chunk("00dc", jpeg(0xffffff)))
    val body = hdrl ++ movi
    val avi = "RIFF".getBytes("US-ASCII") ++ u32(4 + body.length) ++
      "AVI ".getBytes("US-ASCII") ++ body

    assert(Multimodal.sniffMime(avi).contains("video/x-msvideo"))
    val v = Multimodal.decodeVideo(avi).get
    assert(v.frames.length == 2 && v.totalFrames == 2L && v.durationMs == 80L)
    // the frame-collection cap must not distort header-based duration
    val capped = Multimodal.decodeVideo(avi, maxFrames = 1).get
    assert(capped.frames.length == 1 && capped.durationMs == 80L,
      "duration comes from dwTotalFrames, not the capped collection")
    assert(Multimodal.videoFeatures(v, 2).get.toSeq == Seq(0.5f, 0.5f),
      "one black + one white 4x4 frame pool to an even luma split")
    assert(Multimodal.decodeVideo("RIFFnope".getBytes("US-ASCII")).isEmpty)

    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(9L, "video", avi, null, null, null, null))
    val media = spark.createDataFrame(rows, Multimodal.mediaSchema)
    val f = Multimodal.extractFeatures(media, dims = 2).collect()(0)
    assert(f.getBoolean(4), "planted AVI must take the real decode path")
    val m = Multimodal.enrichMeta(media).collect()(0)
    assert(m.getInt(4) == 4 && m.getInt(5) == 4 && m.getLong(6) == 80L)
    assert(m.getString(3) == "video/x-msvideo")

    val sampled = Multimodal.sampleVideoFrames(media, every = 1, dims = 2)
      .collect().sortBy(_.getInt(1))
    assert(sampled.length == 2)
    assert(sampled(0).getSeq[Float](4).head > 0.9f, "frame 0 is black → low-luma bin")
    assert(sampled(1).getSeq[Float](4).last > 0.9f, "frame 1 is white → high-luma bin")
    assert(Multimodal.sampleVideoFrames(media, every = 2).count() == 1)
  }

  test("decode + mime sniff cover the JDK codec set: PNG, JPEG, BMP, GIF") {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(5, 3, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 3; x <- 0 until 5) img.setRGB(x, y, 0x808080)
    def encode(fmt: String): Array[Byte] = {
      val buf = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, buf), s"JDK must encode $fmt")
      buf.toByteArray
    }
    for ((fmt, mime) <- Seq("png" -> "image/png", "jpg" -> "image/jpeg",
                            "bmp" -> "image/bmp", "gif" -> "image/gif")) {
      val bytes = encode(fmt)
      assert(Multimodal.sniffMime(bytes).contains(mime), s"sniff $fmt")
      val decoded = Multimodal.decodeImage(bytes)
      assert(decoded.exists(i => i.getWidth == 5 && i.getHeight == 3), s"decode $fmt")
    }
    assert(Multimodal.sniffMime("plain text".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeImage(null).isEmpty)
    assert(Multimodal.decodeImage(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("fakeDecode is deterministic") {
    val p = "payload-bytes".getBytes("UTF-8")
    assert(Multimodal.fakeDecode(p, 8).toSeq == Multimodal.fakeDecode(p, 8).toSeq)
    assert(Multimodal.fakeDecode(null, 8).toSeq == Seq.fill(8)(0f))
  }

  test("sampleFrames emits one stub row per stride window") {
    val docs = Seq((1L, "a" * 200, "en", "s", 200L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val frames = Multimodal.sampleFrames(Multimodal.synthesize(docs), stride = 64, frame = 16)
    assert(frames.columns.toSeq == Seq("media_id", "frame_no", "frame_stub"))
    assert(frames.count() == 3) // floor((200-16)/64)+1
  }

  test("resize truncates payload and rewrites image dimensions only") {
    // doc_ids 3 and 4 synthesize to kind=image and kind=audio respectively
    val docs = Seq((3L, "x" * 100, "en", "s", 100L), (4L, "y" * 100, "en", "s", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val resized = Multimodal.resize(Multimodal.synthesize(docs), w = 4, h = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Array[Byte]](2).length, r.get(4), r.get(5)))).toMap
    assert(resized(3L) == ((32, 4, 8)))          // image: truncated + w/h set
    assert(resized(4L) == ((100, null, null)))   // audio: fully untouched
  }

  test("htmlToText strips markup, keeps prose, decodes core entities") {
    val docs = Seq(
      (1L, """<!DOCTYPE html><html><head><title>T</title>
             |<style>body { color: red; }</style>
             |<script type="text/javascript">var x = "<p>not prose</p>";</script>
             |</head><body>
             |<!-- nav boilerplate -->
             |<h1 class="big">Hello &amp; welcome</h1>
             |<p>First&nbsp;para.</p><p>Second one.</p>
             |<a href="/x?a=1&amp;b=2">5 &lt; 7 &gt; 3</a>
             |</body></html>""".stripMargin),
      (2L, "plain text, no markup at all"),
      (3L, "a &amp;lt; b") // decodes to the literal text "&lt;", never "<"
    ).toDF("doc_id", "html")
    val got = docs.select($"doc_id", TextAnalysis.htmlToText($"html").as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) ==
      "T Hello & welcome First para. Second one. 5 < 7 > 3")
    assert(got(2L) == "plain text, no markup at all")
    assert(got(3L) == "a &lt; b")
  }

  test("htmlToText output feeds the text pipeline (tokens, quality domain)") {
    val html = Seq((1L, "<p>the quick brown fox</p>")).toDF("doc_id", "html")
    val toks = html
      .select(TextAnalysis.tokenCount(TextAnalysis.htmlToText($"html")).as("n"))
      .collect()(0).getInt(0)
    assert(toks == 4)
  }

  test("PII scrub: redaction tags + per-type counts, precedence-safe") {
    val docs = Seq(
      (1L, "mail me at jo.doe+x@example.co.uk or jo@ex.org today"),
      (2L, "card 4111 1111 1111 1111 expires soon"),
      (3L, "call +1 (555) 123-4567 from 10.0.0.1"),
      (4L, "clean text, digits 42 and version 1.2.3 stay"),
      (5L, "host 192.168.200.100 responded")
    ).toDF("id", "text")
    val out = docs.select($"id",
        TextAnalysis.redactPii($"text").as("red"),
        TextAnalysis.piiCounts($"text").as("c"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getStruct(2).toSeq))).toMap

    assert(out(1L)._1 == "mail me at <EMAIL> or <EMAIL> today")
    assert(out(1L)._2 == Seq(2L, 0L, 0L, 0L))
    // the 16-digit run must be CARD, not four PHONEs
    assert(out(2L)._1 == "card <CARD> expires soon")
    assert(out(2L)._2 == Seq(0L, 1L, 0L, 0L))
    assert(out(3L)._1 == "call <PHONE> from <IP>")
    assert(out(3L)._2 == Seq(0L, 0L, 1L, 1L))
    // no false positives on small digits / dotted versions
    assert(out(4L)._1 == "clean text, digits 42 and version 1.2.3 stay")
    assert(out(4L)._2 == Seq(0L, 0L, 0L, 0L))
    // a wide-octet IPv4 also matches the phone alternation — IP must win
    assert(out(5L)._1 == "host <IP> responded")
    assert(out(5L)._2 == Seq(0L, 0L, 0L, 1L))
  }
}
