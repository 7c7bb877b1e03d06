package graft.ops

import java.awt.image.BufferedImage

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column operators: media payloads ride as opaque `binary`
 * columns; metadata, features, resizes, and frame samples come from a
 * REAL image decode (JDK `javax.imageio` — PNG and BMP codecs ship
 * with the JDK, no external libraries) running at a per-partition
 * decoder instantiation point.
 *
 * Fixture protocol (what makes a real decoder oracle-checkable): the
 * bounded fixture corpus (one image per document with doc_id < 60,
 * the q75 contract) is GENERATED from a closed-form pixel function of
 * doc_id ([[ImagePixels]]) and written as genuine PNG/BMP files. The
 * engine path then reads the files with Spark's distributed
 * `binaryFile` source, sniffs the container format from MAGIC BYTES
 * (not the extension), and decodes real pixels with a per-partition
 * `ImageReader`. The DuckDB oracle never sees the image bytes — it
 * recomputes the same statistics independently from the closed form,
 * so a decoder that misreads width, stride, channel order, or
 * bottom-up BMP row order goes hash-red.
 *
 * Scale shape: `binaryFile` scans partition per file; decode is
 * embarrassingly parallel with one codec handle per partition (the
 * JNI/codec-instantiation point a production decoder needs); the
 * emitted metadata columns are tiny and prunable. The driver-side
 * fixture WRITE is bounded by construction (60 files) — a real corpus
 * arrives as files, it is not exported through the driver.
 */
object Multimodal {
  import Tables._

  // ---------------------------------------------------------------
  // Deterministic fixture images
  // ---------------------------------------------------------------

  /** Closed-form test-pattern: dimensions and every channel value are
   *  pure functions of (doc_id, x, y), so the DuckDB oracle can
   *  recompute any pixel statistic without decoding anything. The
   *  three channels use distinct affine lattices mod 256 — a decoder
   *  that swaps channels (BGR/RGB), transposes axes, or flips BMP's
   *  bottom-up row order produces different sums. */
  private[ops] object ImagePixels {
    def width(id: Long): Int = 16 + (id % 17).toInt
    def height(id: Long): Int = 16 + ((id * 7) % 13).toInt
    def r(id: Long, x: Int, y: Int): Int = ((x * 31 + y * 17 + id) % 256).toInt
    def g(id: Long, x: Int, y: Int): Int = ((x * 13 + y * 29 + id * 3) % 256).toInt
    def b(id: Long, x: Int, y: Int): Int = ((x * 7 + y * 11 + id * 5) % 256).toInt

    def render(id: Long): BufferedImage = {
      val (w, h) = (width(id), height(id))
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, (r(id, x, y) << 16) | (g(id, x, y) << 8) | b(id, x, y))
          x += 1
        }
        y += 1
      }
      img
    }
  }

  /** Even ids encode as PNG, odd as BMP — two genuinely different
   *  containers (deflate-compressed chunks vs raw bottom-up rows)
   *  through one decode path. */
  private[ops] def fixtureFormat(id: Long): String =
    if (id % 2 == 0) "png" else "bmp"

  /** Write the bounded image fixture corpus (doc_id < 60, one real
   *  PNG/BMP file per document) if not already present; returns the
   *  directory. Idempotent so repeated queries in one suite run pay
   *  the encode once. */
  private[ops] def ensureImageFixtures(s: SparkSession, d: String): String = {
    val dir = java.nio.file.Paths.get(InferOps.tmpPath("imgmedia", d))
    val ids = documents(s, d).filter(col("doc_id") < 60)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    val expected = ids.map(id => s"img_$id.${fixtureFormat(id)}").toSet
    val have: Set[String] =
      if (java.nio.file.Files.isDirectory(dir)) {
        val st = java.nio.file.Files.list(dir)
        try st.iterator().asScala.map(_.getFileName.toString).toSet
        finally st.close()
      } else Set.empty
    if (have != expected) {
      java.nio.file.Files.createDirectories(dir)
      have.diff(expected).foreach(n => java.nio.file.Files.delete(dir.resolve(n)))
      ids.foreach { id =>
        val fmt = fixtureFormat(id)
        javax.imageio.ImageIO.write(ImagePixels.render(id), fmt,
          dir.resolve(s"img_$id.$fmt").toFile)
      }
    }
    dir.toString
  }

  // ---------------------------------------------------------------
  // The per-partition decoder
  // ---------------------------------------------------------------

  /** One decoder instance per PARTITION: the `ImageReader`s (the
   *  codec handles) are created once and re-targeted per payload —
   *  exactly where a JNI decoder or GPU codec context would live.
   *  Dispatch is on CONTENT (magic bytes), never the filename. */
  private[ops] final class ImageDecoder {
    private val png = javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
    private val bmp = javax.imageio.ImageIO.getImageReadersByFormatName("bmp").next()

    def sniff(bytes: Array[Byte]): String =
      if (bytes.length >= 4 && (bytes(0) & 0xFF) == 0x89 &&
        bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') "png"
      else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') "bmp"
      else "unknown"

    def decode(bytes: Array[Byte]): (String, BufferedImage) = {
      val fmt = sniff(bytes)
      val reader = fmt match {
        case "png" => png
        case "bmp" => bmp
        case other => throw new IllegalArgumentException(
          s"unsupported image payload (magic sniffed as '$other')")
      }
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        reader.setInput(iis)
        (fmt, reader.read(0))
      } finally iis.close()
    }
  }

  /** Exact per-channel pixel sums — integer, order-free, and
   *  oracle-recomputable; the basic "feature vector" downstream
   *  dedup/quality filters consume. */
  private[ops] def channelSums(img: BufferedImage): (Long, Long, Long) = {
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y)
        sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
        x += 1
      }
      y += 1
    }
    (sr, sg, sb)
  }

  /** Shared scan front end: distributed binaryFile scan over the
   *  fixture dir, doc_id from the path, raw payload bytes out. Each
   *  media query decodes inside its own single mapPartitions (one
   *  decoder per partition, decoded rasters never cross an encoder
   *  boundary — an AWT image is not serializable and never needs to
   *  be). */
  private def imagePayloads(s: SparkSession, d: String): org.apache.spark.sql.Dataset[(Long, Array[Byte])] = {
    import s.implicits._
    val dir = ensureImageFixtures(s, d)
    s.read.format("binaryFile").load(dir)
      .select(regexp_extract(col("path"), "img_(\\d+)\\.", 1).cast("long").as("doc_id"),
        col("content"))
      .as[(Long, Array[Byte])]
  }

  // ---------------------------------------------------------------
  // q31: decode → typed metadata
  // ---------------------------------------------------------------

  final case class ImageMeta(doc_id: Long, fmt: String, width: Long,
      height: Long, channels: Long, sum_r: Long, sum_g: Long, sum_b: Long)

  /** q31: real image decode — format from magic bytes, dimensions and
   *  band count from the decoded raster, per-channel sums from actual
   *  pixel data. */
  def q31MultimodalMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    imagePayloads(s, d)
      .mapPartitions { it =>
        val dec = new ImageDecoder
        it.map { case (id, bytes) =>
          val (fmt, img) = dec.decode(bytes)
          val (sr, sg, sb) = channelSums(img)
          ImageMeta(id, fmt, img.getWidth.toLong, img.getHeight.toLong,
            img.getRaster.getNumBands.toLong, sr, sg, sb)
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Oracle: recompute the pixel statistics from the closed form —
   *  independent of the image bytes, so any decode defect (stride,
   *  channel order, BMP bottom-up rows) diverges. */
  val q31Sql: String =
    """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 60),
      |dim AS (
      |  SELECT doc_id,
      |   CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS fmt,
      |   16 + doc_id % 17 AS w, 16 + (doc_id * 7) % 13 AS h
      |  FROM ids),
      |cells AS (
      |  SELECT doc_id, fmt, w, h, x, y
      |  FROM dim,
      |   LATERAL (SELECT unnest(generate_series(0, w - 1)) AS x) gx,
      |   LATERAL (SELECT unnest(generate_series(0, h - 1)) AS y) gy)
      |SELECT doc_id, fmt,
      | CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      | CAST(3 AS BIGINT) AS channels,
      | CAST(sum((x * 31 + y * 17 + doc_id) % 256) AS BIGINT) AS sum_r,
      | CAST(sum((x * 13 + y * 29 + doc_id * 3) % 256) AS BIGINT) AS sum_g,
      | CAST(sum((x * 7 + y * 11 + doc_id * 5) % 256) AS BIGINT) AS sum_b
      |FROM cells GROUP BY doc_id, fmt, w, h ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // q45: decode → resize (nearest-neighbor) → features
  // ---------------------------------------------------------------

  final case class ResizedImage(doc_id: Long, width: Long, height: Long,
      new_width: Long, new_height: Long,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** Resize target box (thumbnails): integer fit-within arithmetic so
   *  the output dimensions are deterministic in any engine. */
  private[ops] val FitBox = 64L

  /** q45: real resize — fit the DECODED dimensions into a 64×64 box
   *  (aspect-preserving, round-half-up, floor 1) and resample with
   *  nearest-neighbor (`src = (dst * srcDim) / dstDim`, the classic
   *  integer mapping — deterministic, unlike any interpolating
   *  filter), then feature-extract the RESIZED pixels. */
  def q45ResizeFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    imagePayloads(s, d)
      .mapPartitions { it =>
        val dec = new ImageDecoder
        it.map { case (id, bytes) => resizeOne(dec, id, bytes) }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Decode + nearest-neighbor resample of one payload — split out so
   *  the spec can pin the resize math on a checked-in fixture. */
  private[ops] def resizeOne(dec: ImageDecoder, id: Long,
      bytes: Array[Byte]): ResizedImage = {
    val img = dec.decode(bytes)._2
    val w = img.getWidth.toLong
    val h = img.getHeight.toLong
    val (nw, nh) =
      if (w >= h) (FitBox, math.max(1L, (h * FitBox + w / 2) / w))
      else (math.max(1L, (w * FitBox + h / 2) / h), FitBox)
    var sr = 0L; var sg = 0L; var sb = 0L
    var y2 = 0
    while (y2 < nh) {
      val sy = ((y2 * h) / nh).toInt
      var x2 = 0
      while (x2 < nw) {
        val sx = ((x2 * w) / nw).toInt
        val p = img.getRGB(sx, sy)
        sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
        x2 += 1
      }
      y2 += 1
    }
    ResizedImage(id, w, h, nw, nh, sr, sg, sb)
  }

  val q45Sql: String =
    """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 60),
      |dim AS (
      |  SELECT doc_id, 16 + doc_id % 17 AS w, 16 + (doc_id * 7) % 13 AS h
      |  FROM ids),
      |d2 AS (
      |  SELECT doc_id, w, h,
      |   CASE WHEN w >= h THEN 64 ELSE greatest(1, (w * 64 + h // 2) // h) END AS nw,
      |   CASE WHEN w >= h THEN greatest(1, (h * 64 + w // 2) // w) ELSE 64 END AS nh
      |  FROM dim),
      |cells AS (
      |  SELECT doc_id, w, h, nw, nh, (x * w) // nw AS sx, (y * h) // nh AS sy
      |  FROM d2,
      |   LATERAL (SELECT unnest(generate_series(0, nw - 1)) AS x) gx,
      |   LATERAL (SELECT unnest(generate_series(0, nh - 1)) AS y) gy)
      |SELECT doc_id,
      | CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      | CAST(nw AS BIGINT) AS new_width, CAST(nh AS BIGINT) AS new_height,
      | CAST(sum((sx * 31 + sy * 17 + doc_id) % 256) AS BIGINT) AS sum_r,
      | CAST(sum((sx * 13 + sy * 29 + doc_id * 3) % 256) AS BIGINT) AS sum_g,
      | CAST(sum((sx * 7 + sy * 11 + doc_id * 5) % 256) AS BIGINT) AS sum_b
      |FROM cells GROUP BY doc_id, w, h, nw, nh ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // q42: decode → frame sampling
  // ---------------------------------------------------------------

  final case class FrameRow(doc_id: Long, frame_idx: Long, frame_ts_ms: Long,
      strip_sum: Long)

  /** Rows per sampled frame (a 4-row horizontal strip of the decoded
   *  image stands in for one video frame at 4 fps). */
  private[ops] val FrameRows = 4

  /** q42: frame sampling over real decoded pixels — one payload row
   *  fans out to N frame rows (the per-partition flatMap shape a
   *  video pipeline needs), each frame summarized by an exact pixel
   *  sum of its strip. */
  def q42FrameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    imagePayloads(s, d)
      .mapPartitions { it =>
        val dec = new ImageDecoder
        it.flatMap { case (id, bytes) =>
          val img = dec.decode(bytes)._2
          val h = img.getHeight
          val nFrames = (h + FrameRows - 1) / FrameRows
          (0 until nFrames).iterator.map { i =>
            var sum = 0L
            var y = i * FrameRows
            val yEnd = math.min(y + FrameRows, h)
            while (y < yEnd) {
              var x = 0
              while (x < img.getWidth) {
                val p = img.getRGB(x, y)
                sum += ((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)
                x += 1
              }
              y += 1
            }
            FrameRow(id, i.toLong, i * 250L, sum)
          }
        }
      }
      .toDF()
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  val q42Sql: String =
    """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 60),
      |dim AS (
      |  SELECT doc_id, 16 + doc_id % 17 AS w, 16 + (doc_id * 7) % 13 AS h
      |  FROM ids),
      |fr AS (
      |  SELECT doc_id, w, h, i
      |  FROM dim,
      |   LATERAL (SELECT unnest(generate_series(0, (h + 3) // 4 - 1)) AS i) gi),
      |cells AS (
      |  SELECT doc_id, i, x, y
      |  FROM fr,
      |   LATERAL (SELECT unnest(generate_series(0, w - 1)) AS x) gx,
      |   LATERAL (SELECT unnest(generate_series(i * 4, least(i * 4 + 3, h - 1))) AS y) gy)
      |SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
      | CAST(i * 250 AS BIGINT) AS frame_ts_ms,
      | CAST(sum((x * 31 + y * 17 + doc_id) % 256
      |        + (x * 13 + y * 29 + doc_id * 3) % 256
      |        + (x * 7 + y * 11 + doc_id * 5) % 256) AS BIGINT) AS strip_sum
      |FROM cells GROUP BY doc_id, i ORDER BY doc_id, frame_idx""".stripMargin

  // ---------------------------------------------------------------
  // q75: binary-file ingestion with content-based dispatch
  // ---------------------------------------------------------------

  /** Magic headers for the q75 fixture. Real container formats with
   *  ASCII magics (GIF, RIFF/WAVE, RIFF/AVI) so the DuckDB oracle —
   *  whose md5() only accepts VARCHAR — can rebuild the identical
   *  payload; the sniffing logic is the genuine article: a GIF is
   *  identified by its 6-byte signature, the two RIFF formats are
   *  disambiguated by the subtype tag at offset 8. */
  private val MagicGif = "GIF89a"
  private val MagicWav = "RIFF0000WAVE"
  private val MagicAvi = "RIFF0000AVI "

  /** q75: binary-file ingestion — the front door of a multimodal
   *  pipeline. A bounded fixture (docs with doc_id < 60; payload =
   *  format magic + text bytes, format cycling gif/wav/avi by
   *  doc_id) is written to scratch as one file per document, then
   *  ingested with Spark's distributed `binaryFile` source and
   *  dispatched on CONTENT (magic bytes), not file extension:
   *  doc_id from the path, modality from the sniffed magic,
   *  size + md5 from the payload.
   *
   *  Scale shape: binaryFile reads are partitioned per file (and
   *  `pathGlobFilter`/`maxBytesPerPartition` control admission), the
   *  sniff touches a 12-byte prefix, and everything downstream of
   *  the scan is a codegen'd projection. The driver-side fixture
   *  WRITE is bounded by construction (60 files) — a real corpus
   *  arrives as files, it is not exported through the driver. */
  def q75BinaryIngest(s: SparkSession, d: String): DataFrame = {
    val dir = java.nio.file.Paths.get(InferOps.tmpPath("binmedia", d))
    java.nio.file.Files.createDirectories(dir)
    documents(s, d).filter(col("doc_id") < 60)
      .select(col("doc_id"), col("text"))
      .collect().foreach { r =>
        val id = r.getLong(0)
        val magic = (id % 3) match {
          case 0 => MagicGif
          case 1 => MagicWav
          case _ => MagicAvi
        }
        java.nio.file.Files.write(dir.resolve(s"doc_$id.bin"),
          (magic + r.getString(1)).getBytes("UTF-8"))
      }
    val prefix = substring(col("content"), 1, 6).cast("string")
    val riffTag = substring(col("content"), 9, 4).cast("string")
    val kind = when(prefix === MagicGif, "gif")
      .when(prefix.startsWith("RIFF") && riffTag === "WAVE", "wav")
      .when(prefix.startsWith("RIFF") && riffTag === "AVI ", "avi")
      .otherwise("unknown")
    val modality = when(col("kind") === "gif", "image")
      .when(col("kind") === "wav", "audio")
      .when(col("kind") === "avi", "video")
      .otherwise("unknown")
    s.read.format("binaryFile").load(dir.toString + "/*.bin")
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1).cast("long").as("doc_id"),
        kind.as("kind"),
        col("length").cast("long").as("n_bytes"),
        md5(col("content")).as("content_md5"))
      .withColumn("modality", modality)
      .orderBy(col("doc_id"))
  }

  val q75Sql: String =
    """WITH f AS (
      |  SELECT doc_id,
      |   CASE doc_id % 3 WHEN 0 THEN 'GIF89a' WHEN 1 THEN 'RIFF0000WAVE'
      |        ELSE 'RIFF0000AVI ' END ||  text AS content,
      |   CASE doc_id % 3 WHEN 0 THEN 'gif' WHEN 1 THEN 'wav' ELSE 'avi' END AS kind
      |  FROM documents WHERE doc_id < 60)
      |SELECT doc_id, kind,
      | CAST(octet_length(encode(content)) AS BIGINT) AS n_bytes,
      | md5(content) AS content_md5,
      | CASE kind WHEN 'gif' THEN 'image' WHEN 'wav' THEN 'audio'
      |      ELSE 'video' END AS modality
      |FROM f ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // q147: audio decode — real RIFF/WAVE PCM through javax.sound
  // ---------------------------------------------------------------

  /** Closed-form PCM fixture (the [[ImagePixels]] protocol for audio):
   *  every parameter and every 16-bit sample is a pure function of
   *  (audio id, channel, sample index), so the DuckDB oracle can
   *  recompute any waveform statistic without touching the bytes. A
   *  decoder that misreads byte order, interleaving, or the fmt-chunk
   *  channel count produces different sums and goes hash-red. */
  private[ops] object AudioPcm {
    def channels(id: Long): Int = 1 + (id % 2).toInt
    def rate(id: Long): Int = 8000 << (id % 3).toInt
    def nSamples(id: Long): Int = 400 + ((id * 37) % 229).toInt
    /** Signed 16-bit sample, |s| <= 2000 by construction. */
    def sample(id: Long, ch: Int, i: Int): Int =
      ((i.toLong * 73 + ch.toLong * 9973 + id * 131) % 4001).toInt - 2000

    /** Canonical 44-byte PCM16 WAV container + interleaved LE frames. */
    def render(id: Long): Array[Byte] = {
      val nc = channels(id); val sr = rate(id); val n = nSamples(id)
      val dataLen = n * nc * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(nc.toShort).putInt(sr)
        .putInt(sr * nc * 2).putShort((nc * 2).toShort).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      var i = 0
      while (i < n) {
        var ch = 0
        while (ch < nc) { bb.putShort(sample(id, ch, i).toShort); ch += 1 }
        i += 1
      }
      bb.array()
    }
  }

  /** The audio fixture id range: docs [60, 100) — disjoint from the
   *  image fixture ids (< 60), so one corpus carries both modalities. */
  private[ops] def audioIds(s: SparkSession, d: String): Array[Long] =
    documents(s, d).filter(col("doc_id") >= 60 && col("doc_id") < 100)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted

  /** Write the bounded WAV fixture corpus (one real RIFF/WAVE file per
   *  doc in [60,100)) if absent; idempotent like the image twin. */
  private[ops] def ensureAudioFixtures(s: SparkSession, d: String): String = {
    val dir = java.nio.file.Paths.get(InferOps.tmpPath("audmedia", d))
    val ids = audioIds(s, d)
    val expected = ids.map(id => s"aud_$id.wav").toSet
    val have: Set[String] =
      if (java.nio.file.Files.isDirectory(dir)) {
        val st = java.nio.file.Files.list(dir)
        try st.iterator().asScala.map(_.getFileName.toString).toSet
        finally st.close()
      } else Set.empty
    if (have != expected) {
      java.nio.file.Files.createDirectories(dir)
      have.diff(expected).foreach(n => java.nio.file.Files.delete(dir.resolve(n)))
      ids.foreach { id =>
        java.nio.file.Files.write(dir.resolve(s"aud_$id.wav"), AudioPcm.render(id))
      }
    }
    dir.toString
  }

  /** Per-partition audio decoder — the [[ImageDecoder]] pattern for
   *  sound: dispatch on RIFF/WAVE magic bytes, decode through the
   *  JDK's real WAV codec (`javax.sound.sampled.AudioSystem`), then
   *  walk the decoded PCM frames honoring the container's declared
   *  byte order and interleaving. */
  private[ops] final class AudioDecoder {
    def sniff(bytes: Array[Byte]): String =
      if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == 'F' && bytes(8) == 'W' &&
        bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E') "wav"
      else "unknown"

    /** (sampleRate, channels, nFrames, perChannelSums, peakAbs). */
    def decode(bytes: Array[Byte]): (Int, Int, Long, Array[Long], Long) = {
      require(sniff(bytes) == "wav",
        s"unsupported audio payload (magic sniffed as '${sniff(bytes)}')")
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        require(fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getSampleSizeInBits == 16,
          s"expected PCM_SIGNED 16-bit, got $fmt")
        val nc = fmt.getChannels
        val pcm = in.readAllBytes()
        val bb = java.nio.ByteBuffer.wrap(pcm).order(
          if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN)
        val nFrames = pcm.length / (nc * 2)
        val sums = new Array[Long](nc)
        var peak = 0L
        var i = 0
        while (i < nFrames) {
          var ch = 0
          while (ch < nc) {
            val v = bb.getShort((i * nc + ch) * 2).toLong
            sums(ch) += v
            if (math.abs(v) > peak) peak = math.abs(v)
            ch += 1
          }
          i += 1
        }
        (fmt.getSampleRate.toInt, nc, nFrames.toLong, sums, peak)
      } finally in.close()
    }
  }

  final case class AudioMeta(audio_id: Long, fmt: String, sample_rate: Long,
      channels: Long, n_samples: Long, dur_micros: Long,
      sum_ch0: Long, sum_ch1: Long, peak: Long)

  /** q147: real audio decode — the multimodal audio pillar. The WAV
   *  fixture corpus rides Spark's distributed `binaryFile` source;
   *  each partition instantiates one decoder, sniffs the RIFF/WAVE
   *  magic, decodes genuine PCM through the JDK codec, and emits
   *  typed waveform metadata (rate / channels / duration) plus exact
   *  integer per-channel sums and the peak amplitude — the features
   *  an audio-quality filter (clipping, silence, channel imbalance)
   *  consumes. Mono files report sum_ch1 = 0. */
  def q147AudioMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dir = ensureAudioFixtures(s, d)
    s.read.format("binaryFile").load(dir)
      .select(regexp_extract(col("path"), "aud_(\\d+)\\.", 1).cast("long").as("audio_id"),
        col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val dec = new AudioDecoder
        it.map { case (id, bytes) =>
          val (rate, nc, n, sums, peak) = dec.decode(bytes)
          AudioMeta(id, "wav", rate.toLong, nc.toLong, n,
            n * 1000000L / rate, sums(0), if (nc > 1) sums(1) else 0L, peak)
        }
      }
      .toDF()
      .orderBy(col("audio_id"))
  }

  /** Oracle: recompute every waveform statistic from the closed form —
   *  independent of the WAV bytes (the q31 protocol). */
  val q147Sql: String =
    """WITH ids AS (SELECT doc_id AS id FROM documents
      |             WHERE doc_id >= 60 AND doc_id < 100),
      |dim AS (
      |  SELECT id, 1 + id % 2 AS nc, 8000 * (1 << (id % 3)) AS sr,
      |         400 + (id * 37) % 229 AS n
      |  FROM ids),
      |samp AS (
      |  SELECT id, nc, sr, n, ch, (i * 73 + ch * 9973 + id * 131) % 4001 - 2000 AS v
      |  FROM dim,
      |   LATERAL (SELECT unnest(generate_series(0, nc - 1)) AS ch) gc,
      |   LATERAL (SELECT unnest(generate_series(0, n - 1)) AS i) gi)
      |SELECT id AS audio_id, 'wav' AS fmt,
      | CAST(sr AS BIGINT) AS sample_rate, CAST(nc AS BIGINT) AS channels,
      | CAST(n AS BIGINT) AS n_samples,
      | CAST(n * 1000000 // sr AS BIGINT) AS dur_micros,
      | CAST(sum(CASE WHEN ch = 0 THEN v ELSE 0 END) AS BIGINT) AS sum_ch0,
      | CAST(sum(CASE WHEN ch = 1 THEN v ELSE 0 END) AS BIGINT) AS sum_ch1,
      | CAST(max(abs(v)) AS BIGINT) AS peak
      |FROM samp GROUP BY id, nc, sr, n ORDER BY audio_id""".stripMargin

  // ---------------------------------------------------------------
  // q172: perceptual-hash image dedup (block dHash + Hamming bands)
  // ---------------------------------------------------------------

  /** 56-bit block-difference perceptual hash of a decoded image — the
   *  dHash family (block-mean variant): partition the raster into an
   *  8×8 grid by EXACT integer bucketing (bx = x·8 div w), take
   *  integer gray block sums (gray = (r+g+b) div 3), and set bit
   *  k = by·7 + bx when the mean of block (bx+1, by) exceeds the mean
   *  of (bx, by) — compared via cross-multiplication
   *  (sum·n vs sum·n), so no division and no float ever exists. 56
   *  bits (8 rows × 7 adjacent-column comparisons) rather than the
   *  classic 64 keeps the hash and every oracle-side power of two
   *  inside int64. Brightness-shift invariant by construction: a
   *  uniform +k on every pixel cancels in the cross-multiplied
   *  comparison, which is exactly the robustness property a
   *  perceptual dedup needs. */
  private[ops] def phash56(img: BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val sums = Array.ofDim[Long](8, 8)
    val cnts = Array.ofDim[Long](8, 8)
    var y = 0
    while (y < h) {
      val by = y * 8 / h
      var x = 0
      while (x < w) {
        val bx = x * 8 / w
        val p = img.getRGB(x, y)
        sums(by)(bx) += (((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)) / 3
        cnts(by)(bx) += 1
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var byi = 0
    while (byi < 8) {
      var bxi = 0
      while (bxi < 7) {
        if (sums(byi)(bxi + 1) * cnts(byi)(bxi) >
            sums(byi)(bxi) * cnts(byi)(bxi + 1))
          hash |= 1L << (byi * 7 + bxi)
        bxi += 1
      }
      byi += 1
    }
    hash
  }

  /** Near-duplicate variant of a fixture image: every channel of
   *  every EVEN row bumped by +1 (clipped at 255) — a deterministic
   *  stand-in for the re-encode/brightness drift that makes real
   *  image corpora full of perceptual (not byte-level) duplicates.
   *  Half-row bumps shift block means by ~+0.5, flipping only the
   *  comparisons that were nearly tied, so base/variant Hamming
   *  distances land small but nonzero — exactly the regime a banded
   *  near-dup join has to resolve. */
  private[ops] def renderVariant(baseId: Long): BufferedImage = {
    val img = ImagePixels.render(baseId)
    var y = 0
    while (y < img.getHeight) {
      if (y % 2 == 0) {
        var x = 0
        while (x < img.getWidth) {
          val p = img.getRGB(x, y)
          val r = math.min(255, ((p >> 16) & 0xFF) + 1)
          val g = math.min(255, ((p >> 8) & 0xFF) + 1)
          val b = math.min(255, (p & 0xFF) + 1)
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          x += 1
        }
      }
      y += 1
    }
    img
  }

  /** Variant ids live at base+100 — same PNG/BMP parity as their
   *  base, so both family members exercise the same codec. */
  private[ops] val VariantOff = 100L

  /** Write the dedup fixture corpus: each base image (doc_id < 60)
   *  plus its near-duplicate variant at doc_id+100. Idempotent. */
  private[ops] def ensureDedupFixtures(s: SparkSession, d: String): String = {
    val dir = java.nio.file.Paths.get(InferOps.tmpPath("imgdedup", d))
    val ids = documents(s, d).filter(col("doc_id") < 60)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    val expected = ids.flatMap { id =>
      Seq(s"img_$id.${fixtureFormat(id)}",
        s"img_${id + VariantOff}.${fixtureFormat(id + VariantOff)}")
    }.toSet
    val have: Set[String] =
      if (java.nio.file.Files.isDirectory(dir)) {
        val st = java.nio.file.Files.list(dir)
        try st.iterator().asScala.map(_.getFileName.toString).toSet
        finally st.close()
      } else Set.empty
    if (have != expected) {
      java.nio.file.Files.createDirectories(dir)
      have.diff(expected).foreach(n => java.nio.file.Files.delete(dir.resolve(n)))
      ids.foreach { id =>
        javax.imageio.ImageIO.write(ImagePixels.render(id), fixtureFormat(id),
          dir.resolve(s"img_$id.${fixtureFormat(id)}").toFile)
        val vid = id + VariantOff
        javax.imageio.ImageIO.write(renderVariant(id), fixtureFormat(vid),
          dir.resolve(s"img_$vid.${fixtureFormat(vid)}").toFile)
      }
    }
    dir.toString
  }

  final case class PhashRow(doc_id: Long, phash: Long)

  private[ops] val PhashBands = 4
  private[ops] val PhashBandBits = 14
  private[ops] val PhashHammingMax = 3

  /** q172: perceptual near-duplicate image pairs — real decode →
   *  [[phash56]] per payload → Manku banding (4 bands × 14 bits:
   *  Hamming ≤ 3 differing bits leave ≥ 1 band untouched by
   *  pigeonhole, so the band self-join finds EVERY qualifying pair —
   *  the q24 SimHash guarantee transplanted to images) → exact
   *  `bit_count(xor)` distance on the banded candidates only.
   *
   *  Scale shape: decode + hash are embarrassingly parallel over the
   *  binaryFile scan (one codec handle per partition); the join runs
   *  on (band_idx, band_val) — candidates ∝ real near-duplicates,
   *  never corpus² — and the final distance filter touches only
   *  candidate pairs. The DuckDB oracle recomputes every hash from
   *  the closed-form pixel functions (it never sees image bytes) and
   *  brute-forces all pairs, so it cross-checks the decoder, the
   *  hash, AND the banding's no-miss guarantee at once. */
  def q172PhashDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dir = ensureDedupFixtures(s, d)
    val hashes = s.read.format("binaryFile").load(dir)
      .select(regexp_extract(col("path"), "img_(\\d+)\\.", 1).cast("long")
        .as("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val dec = new ImageDecoder
        it.map { case (id, bytes) => PhashRow(id, phash56(dec.decode(bytes)._2)) }
      }
      .toDF()
    bandPairs(hashes).orderBy(col("doc_a"), col("doc_b"))
  }

  /** Banded near-dup join over a (doc_id, phash) frame — exposed for
   *  the plan gate (the band self-join must stay an equi-join on
   *  (band_idx, band_val), never all-pairs). */
  private[ops] def bandPairs(hashes: DataFrame): DataFrame = {
    val banded = hashes
      .withColumn("band_idx",
        explode(array((0 until PhashBands).map(i => lit(i)): _*)))
      .withColumn("band_val",
        expr(s"shiftright(phash, band_idx * $PhashBandBits) & ${(1 << PhashBandBits) - 1}"))
    val cand = banded.select(col("band_idx"), col("band_val"),
        col("doc_id").as("doc_a"), col("phash").as("phash_a"))
      .join(banded.select(col("band_idx"), col("band_val"),
        col("doc_id").as("doc_b"), col("phash").as("phash_b")),
        Seq("band_idx", "band_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("phash_a"), col("doc_b"), col("phash_b"))
      .distinct()
    cand
      .withColumn("hamming",
        expr("cast(bit_count(phash_a ^ phash_b) as bigint)"))
      .filter(col("hamming") <= PhashHammingMax)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Oracle: hashes from the closed form, brute-force all pairs. */
  val q172Sql: String =
    """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 60),
      |imgs AS (
      |  SELECT doc_id AS img, doc_id AS base, 0 AS bump FROM ids
      |  UNION ALL
      |  SELECT doc_id + 100 AS img, doc_id AS base, 1 AS bump FROM ids),
      |dim AS (
      |  SELECT img, base, bump, 16 + base % 17 AS w, 16 + (base * 7) % 13 AS h
      |  FROM imgs),
      |px AS (
      |  SELECT img, (x * 8) // w AS bx, (y * 8) // h AS by,
      |   (CASE WHEN bump = 1 AND y % 2 = 0
      |         THEN least(255, (x * 31 + y * 17 + base) % 256 + 1)
      |         ELSE (x * 31 + y * 17 + base) % 256 END
      |    + CASE WHEN bump = 1 AND y % 2 = 0
      |           THEN least(255, (x * 13 + y * 29 + base * 3) % 256 + 1)
      |           ELSE (x * 13 + y * 29 + base * 3) % 256 END
      |    + CASE WHEN bump = 1 AND y % 2 = 0
      |           THEN least(255, (x * 7 + y * 11 + base * 5) % 256 + 1)
      |           ELSE (x * 7 + y * 11 + base * 5) % 256 END) // 3 AS gray
      |  FROM dim,
      |   LATERAL (SELECT unnest(generate_series(0, w - 1)) AS x) gx,
      |   LATERAL (SELECT unnest(generate_series(0, h - 1)) AS y) gy),
      |blk AS (
      |  SELECT img, bx, by, CAST(sum(gray) AS BIGINT) AS s,
      |   CAST(count(*) AS BIGINT) AS n
      |  FROM px GROUP BY img, bx, by),
      |bits AS (
      |  SELECT a.img, a.by * 7 + a.bx AS k,
      |   CASE WHEN b.s * a.n > a.s * b.n THEN 1 ELSE 0 END AS bit
      |  FROM blk a JOIN blk b ON a.img = b.img AND a.by = b.by
      |   AND b.bx = a.bx + 1),
      |hs AS (
      |  SELECT img, CAST(sum(bit * (CAST(1 AS BIGINT) << k)) AS BIGINT) AS phash
      |  FROM bits GROUP BY img),
      |pairs AS (
      |  SELECT h1.img AS doc_a, h2.img AS doc_b,
      |   CAST(bit_count(xor(h1.phash, h2.phash)) AS BIGINT) AS hamming
      |  FROM hs h1 JOIN hs h2 ON h1.img < h2.img)
      |SELECT doc_a, doc_b, hamming FROM pairs
      |WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin
}
