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

  /** Features of the RESIZED image: dims, pixel sum, corner pixel. */
  final case class ResizedFeatures(doc_id: Long, rw: Int, rh: Int,
      px_sum: Long, first_px: Int)

  /** Image RESIZE kernel: decode → nearest-neighbor downsample by
    * `factor` (out(x,y) = in(x·f, y·f) — the deterministic resampling,
    * so the oracle can replay it arithmetically; bilinear would be
    * engine-float territory) → RE-ENCODE as PNG → decode again →
    * features. The double round trip is the point: the features gate
    * the resized ENCODED image, so a bug in either codec direction or
    * in the kernel mismatches. Once-per-partition codec init, payloads
    * never leave the executor — same contract as the other kernels. */
  def resizeFeatures(media: DataFrame, factor: Int = 2)(
      implicit spark: SparkSession): Dataset[ResizedFeatures] = {
    import spark.implicits._
    require(factor >= 1, s"factor must be >= 1, got $factor")
    media.as[MediaRow].mapPartitions { rows =>
      ImageIO.setUseCache(false)
      rows.map { m =>
        val img = ImageIO.read(new ByteArrayInputStream(m.payload))
        val in = img.getRaster
        val rw = math.max(1, img.getWidth / factor)
        val rh = math.max(1, img.getHeight / factor)
        val out = new BufferedImage(rw, rh, BufferedImage.TYPE_BYTE_GRAY)
        val or = out.getRaster
        var y = 0
        while (y < rh) {
          var x = 0
          while (x < rw) {
            or.setSample(x, y, 0, in.getSample(x * factor, y * factor, 0))
            x += 1
          }
          y += 1
        }
        val bos = new ByteArrayOutputStream()
        ImageIO.write(out, "png", bos)
        val img2 = ImageIO.read(new ByteArrayInputStream(bos.toByteArray))
        val r2 = img2.getRaster
        var sum = 0L
        var yy = 0
        while (yy < rh) {
          var xx = 0
          while (xx < rw) { sum += r2.getSample(xx, yy, 0); xx += 1 }
          yy += 1
        }
        ResizedFeatures(m.doc_id, rw, rh, sum, r2.getSample(0, 0, 0))
      }
    }
  }

  /** [[mediaTable]] plus perturbed near-copies — the image analog of
    * [[Dedup.withNearDuplicates]]: every 10th doc also lands as
    * doc_id + 1000000 with ONE digest byte bumped (byte 0, mod 256),
    * i.e. a sparse pixel change that a gradient hash should survive.
    * Same encode kernel; the bump happens pre-encode so the copies are
    * real PNGs, not patched buffers. */
  def mediaTableWithNearDups(docs: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val base = docs.select(col("doc_id"), unhex(md5(col("text"))).as("digest"),
      (col("n_chars") % 32 + 1).cast("int").as("width"),
      (col("doc_id") % 24 + 1).cast("int").as("height"))
    base.withColumn("bump", lit(0))
      .unionAll(base.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("digest"),
          col("width"), col("height"), lit(1).as("bump")))
      .as[(Long, Array[Byte], Int, Int, Int)]
      .mapPartitions { rows =>
        ImageIO.setUseCache(false)
        rows.map { case (id, digest, w, h, bump) =>
          val d = if (bump == 1) {
            val c = digest.clone(); c(0) = ((c(0) + 1) & 0xff).toByte; c
          } else digest
          MediaRow(id, encodePng(d, w, h), w, h)
        }
      }
      .toDF()
  }

  /** 56-bit difference hash of a decoded image. */
  final case class DHashRow(doc_id: Long, dhash: Long)

  /** Perceptual DIFFERENCE HASH (dHash) over decoded pixels: sample an
    * 8×8 grid by nearest neighbor (px = ⌊gx·w/8⌋, py = ⌊gy·h/8⌋ — all
    * integer, so the oracle replays it arithmetically from the digest
    * formula), emit bit gy·7+gx = [sample(gx+1,gy) > sample(gx,gy)] for
    * the 7 horizontal gradients of each row — 56 bits, deliberately
    * below bit 63 (DuckDB's checked shift refuses it, same constraint
    * the Bloom words carry). Gradient hashes are stable under uniform
    * brightness/contrast shifts — the standard cheap image near-dup
    * signature. Same once-per-partition decode contract as the other
    * kernels. */
  def dHash(media: DataFrame)(implicit spark: SparkSession): Dataset[DHashRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      ImageIO.setUseCache(false)
      rows.map { m =>
        val img = ImageIO.read(new ByteArrayInputStream(m.payload))
        val raster = img.getRaster
        val w = img.getWidth
        val h = img.getHeight
        def sample(gx: Int, gy: Int): Int =
          raster.getSample(gx * w / 8, gy * h / 8, 0)
        var hash = 0L
        var gy = 0
        while (gy < 8) {
          var gx = 0
          while (gx < 7) {
            if (sample(gx + 1, gy) > sample(gx, gy))
              hash |= 1L << (gy * 7 + gx)
            gx += 1
          }
          gy += 1
        }
        DHashRow(m.doc_id, hash)
      }
    }
  }

  /** Image near-duplicates: dHash pairs within Hamming distance
    * `maxHamming`, via the SAME exact pigeonhole banding the text
    * SimHash family uses ([[Dedup.bandedHammingPairs]] — candidates
    * from a (band, bits) equi-join, one `bit_count(xor)` verify,
    * output identical to all-pairs). Unblocked: 56-bit gradient
    * hashes are near-uniform on distinct images, so band collisions —
    * not a block key — bound the join. */
  def imageNearDupPairs(media: DataFrame, maxHamming: Int = 6)(
      implicit spark: SparkSession): DataFrame =
    Dedup.bandedHammingPairs(dHash(media).toDF(), "dhash",
      bits = 56, maxHamming = maxHamming, blockCols = Seq.empty)

  // ---- audio (PCM WAV) -----------------------------------------------------

  /** An opaque audio payload + typed metadata. */
  final case class AudioRow(doc_id: Long, payload: Array[Byte],
      sample_rate: Int, n_samples: Int)

  /** Features from the DECODED stream: rate from the parsed RIFF header,
    * counts/sums from the parsed PCM frames — a header or endianness bug
    * cannot hide behind the metadata columns. */
  final case class AudioFeatures(doc_id: Long, sample_rate: Int, n_samples: Int,
      amp_sum: Long, first_amp: Int, n_nonneg: Long)

  /** 16-bit mono PCM sample i = (digest(i mod 16) − 128) · 200. */
  private def sampleAt(digest: Array[Byte], i: Int): Int =
    ((digest(i % 16) & 0xff) - 128) * 200

  private def encodeWav(digest: Array[Byte], n: Int, rate: Int): Array[Byte] = {
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) { bb.putShort(sampleAt(digest, i).toShort); i += 1 }
    bb.array()
  }

  /** Synthesize a real WAV audio table: payload = RIFF/PCM-encoded 16-bit
    * mono whose samples cycle through the md5 digest of the text
    * (amplitude (b−128)·200 at 8 kHz); length keyed off n_chars. */
  def audioTable(docs: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), unhex(md5(col("text"))).as("digest"),
        (col("n_chars") % 64 + 16).cast("int").as("n"))
      .as[(Long, Array[Byte], Int)]
      .mapPartitions(_.map { case (id, digest, n) =>
        AudioRow(id, encodeWav(digest, n, 8000), 8000, n)
      })
      .toDF()
  }

  private def decodeWav(a: AudioRow): AudioFeatures = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(a.payload))
    val fmt = ais.getFormat
    require(fmt.getChannels == 1 && fmt.getSampleSizeInBits == 16,
      s"unexpected decoded format: $fmt")
    val bytes = ais.readAllBytes()
    val n = bytes.length / 2
    var sum = 0L
    var nonneg = 0L
    var first = 0
    var i = 0
    while (i < n) {
      val s = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt
      if (i == 0) first = s
      sum += s
      if (s >= 0) nonneg += 1
      i += 1
    }
    AudioFeatures(a.doc_id, fmt.getSampleRate.toInt, n, sum, first, nonneg)
  }

  /** Audio decode pass: `javax.sound.sampled` parses the RIFF header and
    * streams PCM frames; same once-per-partition kernel shape. */
  def decodeAudioFeatures(audio: DataFrame)(implicit spark: SparkSession): Dataset[AudioFeatures] = {
    import spark.implicits._
    audio.as[AudioRow].mapPartitions(_.map(decodeWav))
  }

  /** 56-bit sign-of-delta audio fingerprint. */
  final case class AudioFpRow(doc_id: Long, afp: Long)

  /** Acoustic fingerprint over the DECODED PCM stream — the audio
    * member of the shared hamming near-dup machinery (text SimHash,
    * image dHash, this): sample a fixed 57-point grid s_j = ⌊j·n/57⌋
    * over the n frames, bit j = [sample(s_{j+1}) > sample(s_j)] — the
    * sign-of-delta signature (Shazam-family fingerprints threshold
    * spectral deltas the same way; time-domain deltas keep the oracle
    * in exact integer arithmetic). 56 bits, below the checked bit-63
    * shift; amplitude-scale invariant like the image gradients. Feed
    * [[Dedup.bandedHammingPairs]] (bits = 56) for near-dup pairs. */
  def audioFingerprint(audio: DataFrame)(implicit spark: SparkSession): Dataset[AudioFpRow] = {
    import spark.implicits._
    audio.as[AudioRow].mapPartitions(_.map { a =>
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(a.payload))
      val bytes = ais.readAllBytes()
      val n = bytes.length / 2
      def sample(i: Int): Int =
        ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt
      var hash = 0L
      var j = 0
      while (j < 56) {
        if (sample((j + 1) * n / 57) > sample(j * n / 57)) hash |= 1L << j
        j += 1
      }
      AudioFpRow(a.doc_id, hash)
    })
  }

  /** One fixed-width analysis window of the decoded PCM stream. */
  final case class AudioWindow(doc_id: Long, win: Int, energy: Long)

  /** Voice-activity segmentation over the DECODED PCM stream: windowed
    * L1 energy (Σ|sample| per `winSize` frames, the classic
    * energy-gate VAD front end), then gaps-and-islands over the active
    * windows — consecutive active windows merge into segments. The
    * codec runs in the once-per-partition kernel and emits only the
    * per-window energies (payloads never shuffle); the island algebra
    * (win − row_number) is declarative per-doc window work. Output:
    * (doc_id, n_windows, n_active, n_segments, max_run). */
  def vadSegments(audio: DataFrame, winSize: Int = 8,
      threshold: Long = 100000L)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val wins = audio.as[AudioRow].mapPartitions(_.flatMap { a =>
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(a.payload))
      val bytes = ais.readAllBytes()
      val n = bytes.length / 2
      def sample(i: Int): Int =
        ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt
      (0 until (n + winSize - 1) / winSize).map { w =>
        var e = 0L
        var i = w * winSize
        val end = math.min((w + 1) * winSize, n)
        while (i < end) { e += math.abs(sample(i)); i += 1 }
        AudioWindow(a.doc_id, w, e)
      }
    }).toDF()
    val active = wins.filter(col("energy") >= threshold)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("win"))))
      .withColumn("island", col("win") - col("rn"))
    val seg = active.groupBy(col("doc_id"), col("island"))
      .agg(count(lit(1)).as("run"))
    val perDoc = seg.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_segments"), max(col("run")).as("max_run"),
      sum(col("run")).as("n_active"))
    wins.groupBy(col("doc_id")).agg(count(lit(1)).as("n_windows"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_windows"),
        coalesce(col("n_active"), lit(0L)).as("n_active"),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("max_run"), lit(0L)).as("max_run"))
  }

  // ---- video (framed PNG container) ----------------------------------------

  /** An opaque video payload + typed metadata. */
  final case class VideoRow(doc_id: Long, payload: Array[Byte],
      n_frames: Int, width: Int, height: Int)

  /** Per-SAMPLED-frame features from the decoded rasters. */
  final case class FrameFeatures(doc_id: Long, frame_idx: Int, width: Int,
      height: Int, px_sum: Long)

  private val VideoMagic = "GVID".getBytes("US-ASCII")

  /** Container: magic, frame count, then length-prefixed PNG frames.
    * Frame f's pixels cycle the md5 digest of `text#f` — per-frame
    * content, so sampling the wrong frame mismatches the oracle. */
  private def encodeVideo(frameDigests: Seq[Array[Byte]], w: Int, h: Int): Array[Byte] = {
    val frames = frameDigests.map(encodePng(_, w, h))
    val bb = java.nio.ByteBuffer
      .allocate(8 + frames.map(_.length + 4).sum)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.put(VideoMagic).putInt(frames.size)
    frames.foreach(f => bb.putInt(f.length).put(f))
    bb.array()
  }

  /** Synthesize the video table: doc_id % 6 + 2 frames per doc, each a
    * real PNG; frame digests computed relationally (md5 is the engine's
    * codegen'd expression), the container packed in the kernel. */
  def videoTable(docs: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val nf = (col("doc_id") % 6 + 2).cast("int")
    docs.select(col("doc_id"), nf.as("n_frames"),
        (col("n_chars") % 16 + 1).cast("int").as("width"),
        (col("doc_id") % 12 + 1).cast("int").as("height"),
        transform(sequence(lit(0), nf - 1),
          f => unhex(md5(concat(col("text"), lit("#"), f.cast("string"))))).as("digests"))
      .as[(Long, Int, Int, Int, Seq[Array[Byte]])]
      .mapPartitions { rows =>
        ImageIO.setUseCache(false)
        rows.map { case (id, n, w, h, digests) =>
          VideoRow(id, encodeVideo(digests, w, h), n, w, h)
        }
      }
      .toDF()
  }

  /** Frame sampling: parse the container, decode every `step`-th frame
    * with the real PNG codec, emit per-frame pixel stats from the DECODED
    * raster. The un-sampled frames are skipped WITHOUT decoding (length
    * prefix hop) — the point of frame sampling at scale. */
  def sampleFrames(video: DataFrame, step: Int)(implicit spark: SparkSession): Dataset[FrameFeatures] = {
    import spark.implicits._
    video.as[VideoRow].mapPartitions { rows =>
      ImageIO.setUseCache(false)
      rows.flatMap { v =>
        val bb = java.nio.ByteBuffer.wrap(v.payload).order(java.nio.ByteOrder.BIG_ENDIAN)
        val magic = new Array[Byte](4)
        bb.get(magic)
        require(java.util.Arrays.equals(magic, VideoMagic), s"bad container for doc ${v.doc_id}")
        val n = bb.getInt
        (0 until n).flatMap { f =>
          val len = bb.getInt
          if (f % step != 0) { bb.position(bb.position() + len); None }
          else {
            val png = new Array[Byte](len)
            bb.get(png)
            val img = ImageIO.read(new ByteArrayInputStream(png))
            val raster = img.getRaster
            var sum = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) { sum += raster.getSample(x, y, 0); x += 1 }
              y += 1
            }
            Some(FrameFeatures(v.doc_id, f, img.getWidth, img.getHeight, sum))
          }
        }
      }
    }
  }

  /** Scene-cut detection: decode every frame ([[sampleFrames]] step 1 —
    * the full-decode path the length-prefix hop exists to avoid when
    * sampling suffices), then flag frame i as a cut when the mean
    * absolute luminance jump from frame i−1 crosses `thresholdPct`
    * (percent of full scale, 2 decimals): 100·|Δpx_sum| ≥ T·n_px — all
    * BIGINT, no float threshold. The lag window partitions by doc, so
    * state never crosses a video boundary and the shuffle key is the
    * natural one; per-partition work is bounded by frames-per-video,
    * not corpus size. Output: (doc_id, frame_idx, px_sum, prev_sum,
    * is_cut) for every frame with a predecessor. */
  def sceneCuts(video: DataFrame, thresholdPct: Int)(
      implicit spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    sampleFrames(video, 1).toDF()
      .withColumn("prev_sum", lag(col("px_sum"), 1).over(w))
      .filter(col("prev_sum").isNotNull)
      .select(col("doc_id"), col("frame_idx"), col("px_sum"), col("prev_sum"),
        (abs(col("px_sum") - col("prev_sum")) * 100 >=
          lit(thresholdPct.toLong) * (col("width") * col("height")).cast("long"))
          .as("is_cut"))
  }
}
