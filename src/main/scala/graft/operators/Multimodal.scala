package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads ride as opaque `binary` columns next to typed metadata,
  * and per-batch decode/feature-extraction runs as partition-local
  * imperative code (the Scala analogue of `mapInPandas` batch UDFs).
  *
  * The actual codec step is a STUB by design — media libraries are not in
  * this container — but everything Spark-side is real and tested: the
  * schema contract, the deterministic synthetic payloads, the
  * mapPartitions batch shape (one iterator pass, no per-row setup), and
  * the feature schema the downstream pipeline consumes. Swapping
  * `decodeStub` for a JNI/FFmpeg/ImageIO call changes nothing upstream.
  */
object Multimodal {

  final case class MediaRow(
      doc_id: Long,
      media_type: String, // image | audio | video
      width: Int,
      height: Int,
      payload: Array[Byte]
  )

  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Int,
      // decode stub output: byte-histogram moments standing in for real
      // pixel/sample statistics
      mean_byte: Double,
      entropy: Double,
      // resize / frame-sample plumbing: fixed-size feature vector
      feature: Array[Float]
  )

  /** Deterministic fake payloads derived from the documents table: payload
    * bytes are a keyed hash stream, so tests are reproducible with no
    * media files. One row per doc, media type round-robin.
    */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")
      ).as("media_type"),
      (lit(32) + pmod(col("doc_id"), lit(32)) * 8).cast("int").as("width"),
      (lit(32) + pmod(col("doc_id") * 7, lit(32)) * 8).cast("int").as("height"),
      // payload = repeated md5 of (doc_id, block) — binary, opaque
      unhex(concat(
        md5(concat(col("doc_id").cast("string"), lit(":0"))),
        md5(concat(col("doc_id").cast("string"), lit(":1"))),
        md5(concat(col("doc_id").cast("string"), lit(":2"))),
        md5(concat(col("doc_id").cast("string"), lit(":3")))
      )).as("payload")
    )

  /** The decode/feature-extract stage: partition-local batch processing
    * over the binary column. `???`-equivalent codec replaced by a
    * deterministic fake (byte histogram + hash-derived feature vector);
    * the batch shape (iterator in, iterator out, per-partition state) is
    * the real contract.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame, featureDim: Int = 8): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition setup happens once (codec init in a real decoder)
      rows.map { r =>
        val bytes = r.payload
        val hist = new Array[Long](256)
        var i = 0
        while (i < bytes.length) { hist(bytes(i) & 0xff) += 1; i += 1 }
        val n = bytes.length.toDouble
        var mean = 0.0
        var entropy = 0.0
        var b = 0
        while (b < 256) {
          if (hist(b) > 0) {
            val p = hist(b) / n
            mean += b * p
            entropy -= p * math.log(p) / math.log(2)
          }
          b += 1
        }
        // "resize": fold the payload into a fixed-size vector (stand-in
        // for decoded-pixel downsampling / audio frame sampling)
        val feat = new Array[Float](featureDim)
        i = 0
        while (i < bytes.length) { feat(i % featureDim) += (bytes(i) & 0xff) / 255.0f; i += 1 }
        MediaFeatures(r.doc_id, r.media_type, bytes.length, mean, entropy, feat)
      }
    }
  }

  /** Frame sampling plumbing for video rows: one output row per sampled
    * frame offset — the explode shape a real frame extractor produces.
    */
  def sampleFrames(media: DataFrame, everyNthByte: Int = 32): DataFrame =
    media
      .filter(col("media_type") === "video")
      .select(
        col("doc_id"),
        posexplode(
          transform(
            sequence(lit(0), floor((length(col("payload")) - 1) / everyNthByte).cast("int")),
            i => substring(col("payload"), (i * everyNthByte + 1).cast("int"), lit(everyNthByte))
          )
        ).as(Seq("frame_idx", "frame_bytes"))
      )
}
