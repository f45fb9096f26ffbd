package graft.ext

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (BASELINE.json north-star): image/audio/
  * video as opaque `binary` columns with typed metadata. The Spark-side
  * plumbing — schema, partition-friendly batch iteration, frame
  * sampling — is real; the codec itself is STUBBED (this container has
  * no image/audio libraries): [[StubCodec.decode]] produces a
  * deterministic fake feature vector from the bytes, with the exact
  * signature a real decoder (libjpeg/ffmpeg behind JNI or a Python
  * worker) would plug into.
  */
object Multimodal {

  /** Media metadata carried next to the payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("checksum", StringType)))

  /** Wrap a string column as a media payload: (bytes, meta). This is the
    * ingestion shape for any binary modality. */
  def asMedia(df: DataFrame, id: String, payload: String,
      mediaType: String): DataFrame =
    df.select(col(id),
      col(payload).cast("binary").as("bytes"),
      struct(
        lit(mediaType).as("media_type"),
        length(col(payload).cast("binary")).cast("long").as("n_bytes"),
        md5(col(payload).cast("binary")).as("checksum")).as("meta"))

  /** Fixed-size frame sampling: split the payload into `frameBytes`
    * chunks and keep every `stride`-th — the video-keyframe access
    * pattern, as pure column ops (no data movement). */
  def sampleFrames(bytes: org.apache.spark.sql.Column, frameBytes: Int,
      stride: Int): org.apache.spark.sql.Column = {
    val nFrames = ceil(length(bytes).cast("double") / frameBytes).cast("int")
    filter(
      transform(sequence(lit(0), nFrames - 1),
        i => struct(i.as("frame_no"),
          bytes.substr(i * frameBytes + 1, lit(frameBytes)).as("frame"))),
      f => pmod(f.getField("frame_no"), lit(stride)) === 0)
  }

  /** STUB decoder — deterministic fake features standing in for a real
    * codec. Signature and batching are production-shaped: one call per
    * partition iterator (so a real implementation can amortize codec
    * init per task), rows streamed, never materialized. */
  object StubCodec {
    /** ??? in spirit: a real build would JNI into a codec here. The fake
      * "embedding" is the first `dim` bytes scaled to [0,1) — enough to
      * drive downstream similarity plumbing in tests. */
    def decode(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        out(i) = if (i < bytes.length) (bytes(i) & 0xff) / 256.0f else 0.0f
        i += 1
      }
      out
    }
  }

  /** Decode media rows to feature vectors via the stub codec:
    * mapPartitions keeps the codec-per-task shape of a real pipeline. */
  def decodeFeatures(media: DataFrame, id: String, dim: Int): DataFrame = {
    val idIdx = media.schema.fieldIndex(id)
    val bytesIdx = media.schema.fieldIndex("bytes")
    val outSchema = StructType(Seq(
      media.schema(id),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    media.mapPartitions { rows =>
      // real impl: init codec once per partition here
      rows.map { r =>
        Row(r.get(idIdx),
          StubCodec.decode(r.getAs[Array[Byte]](bytesIdx), dim).toSeq)
      }
    }(Encoders.row(outSchema))
  }
}
