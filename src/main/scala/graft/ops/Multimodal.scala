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
   *  real deployment swaps only this function for a codec call. */
  def decodeStub(r: MediaRow): MediaMeta = {
    val n = r.payload.length.toLong
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(r.payload).map("%02x".format(_)).mkString
    MediaMeta(r.doc_id, n, 64 + n % 512, 64 + (n * 7) % 512, 3L, hex)
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
        it.map(decodeStub)
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
}
