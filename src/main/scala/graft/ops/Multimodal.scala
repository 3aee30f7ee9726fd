package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, processed batch-wise per partition.
  *
  * The decode/feature-extract kernels are STUBS (this container has no
  * image/audio codecs): [[fakeDecode]] derives deterministic pseudo-features
  * from the payload bytes. Everything around the stub is real and tested —
  * the media schema, the partition-batched execution shape
  * (`mapPartitions` over row iterators, the Scala analog of a Pandas-UDF
  * `mapInPandas` batch loop), metadata projection, and size-based
  * repartitioning.
  *
  * Scale notes: payloads stay OFF the shuffle path — feature extraction is
  * map-side only; repartitioning (when needed) goes by id range, sized so a
  * partition's payload bytes fit executor memory
  * (`spark.sql.files.maxPartitionBytes` governs the scan side).
  */
object Multimodal {

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

  /** Feature-extraction output schema. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType), nullable = true)))

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

  /** STUB decode: a real implementation would decode the codec here
    * (JPEG/PNG → pixels, PCM frames, video frame samples). The fake is a
    * deterministic byte-histogram projection so the batch shape, schema,
    * and partitioning are exercised end-to-end.
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
    * driver involvement, payload never shuffled.
    */
  def extractFeatures(media: DataFrame, dims: Int = 8): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(featureSchema))
    media
      .select("media_id", "kind", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
          Row(r.getLong(0), r.getString(1),
            if (payload == null) 0 else payload.length,
            fakeDecode(payload, dims))
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
