package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: media payloads ride as opaque `binary`
 * columns with typed metadata extracted by a per-partition decode
 * pass (SURVEY.md north-star surface).
 *
 * The decode step is a clearly-marked deterministic STUB (no image
 * codecs ship in this container): "decoding" derives width/height/
 * channels from the byte length and an md5 content hash. The
 * Spark-side plumbing is real: typed Dataset, mapPartitions batch
 * shape (one decoder instantiation per partition — exactly where a
 * JNI/codec handle would live), and a schema that downstream
 * operators consume.
 *
 * Scale notes: binary payloads stay columnar (parquet binary);
 * decode is embarrassingly parallel per partition; metadata columns
 * are tiny and prunable.
 */
object Multimodal {
  import Tables._

  final case class MediaRow(doc_id: Long, payload: Array[Byte])
  final case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long,
      height: Long, channels: Long, content_hash: String)

  /** STUB decoder — deterministic fake of an image header parse. A
   *  real deployment swaps only this function for a codec call; the
   *  digest/codec handle is instantiated once per PARTITION and
   *  passed in. */
  /** Stub header dimensions — pure functions of payload length,
   *  shared by the full decode (q31) and the resize path (q45) so the
   *  two can't drift. */
  private[ops] def stubWidth(n: Long): Long = 64 + n % 512
  private[ops] def stubHeight(n: Long): Long = 64 + (n * 7) % 512

  def decodeStub(md: java.security.MessageDigest, r: MediaRow): MediaMeta = {
    val n = r.payload.length.toLong
    md.reset()
    val hex = md.digest(r.payload).map("%02x".format(_)).mkString
    MediaMeta(r.doc_id, n, stubWidth(n), stubHeight(n), 3L, hex)
  }

  /** Treat each document's text bytes as a fake media payload and run
   *  the decode pipeline. */
  def q31MultimodalMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
      .mapPartitions { it =>
        // per-partition decoder instantiation point (codec/JNI handle)
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map(r => decodeStub(md, r))
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  val q31Sql: String =
    """SELECT doc_id,
      | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      | 64 + CAST(octet_length(encode(text)) AS BIGINT) % 512 AS width,
      | 64 + (CAST(octet_length(encode(text)) AS BIGINT) * 7) % 512 AS height,
      | CAST(3 AS BIGINT) AS channels,
      | md5(text) AS content_hash
      |FROM documents ORDER BY doc_id""".stripMargin

  final case class ResizedMeta(doc_id: Long, width: Long, height: Long,
      new_width: Long, new_height: Long,
      f_alpha: Long, f_digit: Long, f_space: Long, f_other: Long)

  /** Resize + feature-extract over decoded media metadata: fit into
   *  224×224 preserving aspect ratio (integer arithmetic →
   *  deterministic), plus a STUB feature vector (char-class
   *  histogram standing in for a pixel histogram — same shape, same
   *  batch semantics). */
  def q45ResizeFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select(col("doc_id"), col("text"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, text, payload) =>
          // width/height are pure functions of the payload LENGTH
          // (decodeStub's header-parse stub) — resizing needs no
          // content hash, so skip the per-row MD5 the full decode
          // pipeline (q31) pays for its content_hash column
          val n = payload.length.toLong
          val m = MediaMeta(id, n, stubWidth(n), stubHeight(n), 3L, "")
          // fit into 224×224, round-half-up, floor at 1
          val scaleNum = 224L
          val (nw, nh) =
            if (m.width >= m.height)
              (scaleNum, math.max(1L, (m.height * scaleNum + m.width / 2) / m.width))
            else
              (math.max(1L, (m.width * scaleNum + m.height / 2) / m.height), scaleNum)
          // ASCII classes; iterate CODE POINTS (the oracle's regex
          // counts codepoints — counting UTF-16 chars would double
          // count surrogate pairs into f_other)
          def alpha(cp: Int) = (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z')
          def digit(cp: Int) = cp >= '0' && cp <= '9'
          var fa = 0L; var fd = 0L; var fs = 0L; var fo = 0L
          var ci = 0
          while (ci < text.length) {
            val cp = text.codePointAt(ci)
            if (alpha(cp)) fa += 1
            else if (digit(cp)) fd += 1
            else if (cp == ' ') fs += 1
            else fo += 1
            ci += Character.charCount(cp)
          }
          ResizedMeta(id, m.width, m.height, nw, nh, fa, fd, fs, fo)
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  val q45Sql: String =
    """WITH m AS (
      |  SELECT doc_id, text,
      |   64 + CAST(octet_length(encode(text)) AS BIGINT) % 512 AS width,
      |   64 + (CAST(octet_length(encode(text)) AS BIGINT) * 7) % 512 AS height
      |  FROM documents)
      |SELECT doc_id, width, height,
      | CASE WHEN width >= height THEN 224
      |      ELSE greatest(1, (width * 224 + height // 2) // height) END AS new_width,
      | CASE WHEN width >= height THEN greatest(1, (height * 224 + width // 2) // width)
      |      ELSE 224 END AS new_height,
      | CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS f_alpha,
      | CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS f_digit,
      | CAST(len(regexp_extract_all(text, ' ')) AS BIGINT) AS f_space,
      | CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS BIGINT) AS f_other
      |FROM m ORDER BY doc_id""".stripMargin

  final case class Frame(doc_id: Long, frame_idx: Long, frame_ts_ms: Long,
      frame_hash: String)

  /** Frame sampling from a fake video payload: the decode/sample step
   *  is a per-partition flatMap (1 payload row → N frame rows — the
   *  real batch shape for video pipelines); the per-frame "decode" is
   *  a deterministic STUB (md5 of payload + frame index @ 4 fps). */
  def q42FrameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { r =>
          val nFrames = r.payload.length % 7 + 1
          (0 until nFrames).iterator.map { i =>
            md.reset()
            md.update(r.payload)
            md.update(s"#$i".getBytes("UTF-8"))
            Frame(r.doc_id, i.toLong, i * 250L,
              md.digest().map("%02x".format(_)).mkString)
          }
        }
      }
      .toDF()
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  val q42Sql: String =
    """SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
      | CAST(i * 250 AS BIGINT) AS frame_ts_ms,
      | md5(text || '#' || i) AS frame_hash
      |FROM documents,
      | LATERAL (SELECT unnest(generate_series(0, octet_length(encode(text)) % 7)) AS i) g
      |ORDER BY doc_id, frame_idx""".stripMargin

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
}
