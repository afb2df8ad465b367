package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, processed by a partition-mapped decode kernel.
  *
  * The Spark-side architecture is the real thing — binary column + typed
  * metadata schema, `Dataset[MediaRow].mapPartitions` batch shape (one
  * decoder init per partition, streamed rows), deterministic output
  * schema. The decode KERNEL is a clearly-marked STUB (this container has
  * no image/audio codecs): it derives features from the raw bytes
  * arithmetically instead of actually decoding pixels. Swapping in a real
  * decoder changes only [[decodeStub]].
  */
object Multimodal {

  /** An opaque media payload + typed metadata. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte], width: Int, height: Int)

  /** Fixed-shape features a decoder would emit per payload. */
  final case class MediaFeatures(doc_id: Long, width: Int, height: Int,
      payload_len: Int, byte_sum: Long, first_byte: Int)

  /** Synthesize a deterministic media table from the documents corpus:
    * payload = md5 digest bytes of the text (a stand-in for image bytes),
    * metadata from the doc row. Real pipelines read this from Parquet. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      unhex(md5(col("text"))).as("payload"),
      (col("n_chars") % 32 + 1).cast("int").as("width"),
      (col("doc_id") % 24 + 1).cast("int").as("height"))

  /** STUB decoder — stands in for image/audio decode. Deterministic
    * byte arithmetic; replace the body with a real codec call. */
  private def decodeStub(m: MediaRow): MediaFeatures = {
    val bytes = m.payload.map(_ & 0xff)
    MediaFeatures(m.doc_id, m.width, m.height,
      payload_len = m.payload.length,
      byte_sum = bytes.foldLeft(0L)(_ + _),
      first_byte = bytes.head)
  }

  /** The decode pass: typed `mapPartitions` so a real decoder initializes
    * once per partition and streams the batch — the shape that matters at
    * 100 TB (no per-row codec setup, no driver collect). */
  def decodeFeatures(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // real pipeline: val decoder = Codec.acquire() here, once per partition
      rows.map(decodeStub)
    }
  }
}
