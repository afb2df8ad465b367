package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, processed by partition-mapped codec kernels.
  *
  * The decode is REAL: [[mediaTable]] synthesizes deterministic grayscale
  * images (pixel (x,y) = byte (y·w+x) mod 16 of the doc's md5 digest) and
  * encodes them to actual PNG bytes with `javax.imageio` (pure JVM, no
  * native deps); [[decodeFeatures]] decodes those bytes back to pixels and
  * emits stats from the DECODED raster. PNG is lossless, so the DuckDB
  * oracle — which derives the same stats arithmetically from the md5
  * generation formula without ever seeing a PNG — must agree bit-for-bit;
  * a codec round-trip bug would surface as an oracle mismatch.
  *
  * Both kernels are typed `mapPartitions` passes: codec setup happens once
  * per partition and rows stream through — the shape that matters at
  * 100 TB (no per-row codec init, no driver collect, payloads never leave
  * the executor).
  */
object Multimodal {

  /** An opaque media payload + typed metadata. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte], width: Int, height: Int)

  /** Features emitted per decoded payload — width/height come from the
    * DECODED image, not the metadata, so a decode failure cannot hide. */
  final case class MediaFeatures(doc_id: Long, width: Int, height: Int,
      n_px: Int, px_sum: Long, first_px: Int)

  private def encodePng(digest: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var idx = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, digest(idx % 16) & 0xff)
        idx += 1; x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Synthesize a real PNG media table from the documents corpus: payload
    * = PNG-encoded grayscale image whose pixels cycle through the md5
    * digest bytes of the text; metadata from the doc row. Real pipelines
    * read this column from Parquet. */
  def mediaTable(docs: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), unhex(md5(col("text"))).as("digest"),
        (col("n_chars") % 32 + 1).cast("int").as("width"),
        (col("doc_id") % 24 + 1).cast("int").as("height"))
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { rows =>
        ImageIO.setUseCache(false) // once per partition: no temp-file cache
        rows.map { case (id, digest, w, h) => MediaRow(id, encodePng(digest, w, h), w, h) }
      }
      .toDF()
  }

  private def decodePng(m: MediaRow): MediaFeatures = {
    val img = ImageIO.read(new ByteArrayInputStream(m.payload))
    val raster = img.getRaster
    val w = img.getWidth
    val h = img.getHeight
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    MediaFeatures(m.doc_id, w, h, w * h, sum, raster.getSample(0, 0, 0))
  }

  /** The decode pass: typed `mapPartitions` so the codec initializes once
    * per partition and streams the batch. */
  def decodeFeatures(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      ImageIO.setUseCache(false)
      rows.map(decodePng)
    }
  }
}
