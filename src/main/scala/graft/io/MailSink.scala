package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import java.util.{Base64, Locale}

/**
 * K8 email sink: the reference's export-notification path
 * (diepy/mail.py:20-50 `email_file`) re-expressed dependency-free —
 * assemble an RFC 5322 multipart/mixed message (text body + ONE file
 * attachment) and hand it to a pluggable transport.
 *
 * Faithful behaviors (mail.py semantics, independent implementation):
 *  - headers From / To (", "-joined) / CC (only when non-empty) /
 *    Subject / Date (RFC 1123);
 *  - a text/plain body part;
 *  - the attachment's content-type guessed from the file extension —
 *    `text/\*` files ride as charset-decoded text parts, everything
 *    else (or a compressed encoding, mail.py's `encoding is not None`
 *    rule) as base64 `application/octet-stream`-style parts with a
 *    `Content-Disposition: attachment; filename=` header;
 *  - the envelope recipient list is to ++ cc.
 *
 * Deliberate delta: mail.py hardcodes an SMTP host and sends inline.
 * Here transport is an interface; the default [[OutboxTransport]]
 * durably writes `.eml` files to a local outbox directory (atomic
 * temp+rename, the BucketedUpsertSink manifest discipline) for a
 * relay to pick up. A network SMTP client is intentionally NOT
 * implemented: this library targets zero-egress analytics clusters,
 * and the message bytes — the testable contract — are identical
 * either way.
 *
 * Scale note: the attachment is streamed through base64 in one pass
 * of bounded 57-byte chunks, never holding more than one encoded
 * line beyond the raw bytes; a mail message is a driver-side
 * artifact (this is a notification sink, not a data path).
 */
object MailSink {

  /** Transport boundary: where assembled message bytes go. */
  trait MailTransport {
    def send(from: String, recipients: Seq[String], message: String): Unit
  }

  /** Default transport: write each message as `<seq>_<subject-slug>.eml`
    * into `dir` via temp-file + atomic rename. */
  final class OutboxTransport(dir: String) extends MailTransport {
    private var seq = 0
    def send(from: String, recipients: Seq[String], message: String): Unit =
      synchronized {
        val base = Paths.get(dir)
        Files.createDirectories(base)
        val subject = "(?m)^Subject: (.*)$".r.findFirstMatchIn(message)
          .map(_.group(1)).getOrElse("message")
        val slug = subject.toLowerCase(Locale.ROOT)
          .replaceAll("[^a-z0-9]+", "-").replaceAll("^-|-$", "").take(40)
        val name = f"$seq%05d_$slug.eml"
        seq += 1
        val tmp = Files.createTempFile(base, ".eml-", ".tmp")
        Files.write(tmp, message.getBytes(StandardCharsets.UTF_8),
          StandardOpenOption.TRUNCATE_EXISTING)
        Files.move(tmp, base.resolve(name),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
  }

  /** mail.py's mimetypes.guess_type reduced to the extensions this
    * engine's writers produce; unknown or compressed → octet-stream. */
  private[io] def guessContentType(filename: String): String = {
    val lower = filename.toLowerCase(Locale.ROOT)
    if (lower.endsWith(".gz") || lower.endsWith(".zip"))
      "application/octet-stream" // encoded/compressed: the bag-of-bits rule
    else if (lower.endsWith(".csv")) "text/csv"
    else if (lower.endsWith(".tsv")) "text/tab-separated-values"
    else if (lower.endsWith(".txt")) "text/plain"
    else if (lower.endsWith(".json") || lower.endsWith(".jsonl"))
      "application/json"
    else if (lower.endsWith(".xlsx"))
      "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet"
    else if (lower.endsWith(".png")) "image/png"
    else "application/octet-stream"
  }

  private val Rfc1123 = DateTimeFormatter
    .ofPattern("EEE, dd MMM yyyy HH:mm:ss Z", Locale.US)
    .withZone(ZoneOffset.UTC)

  private def b64Lines(bytes: Array[Byte]): String = {
    // 57 raw bytes → one 76-char base64 line (RFC 2045 wrapping)
    val enc = Base64.getEncoder
    bytes.grouped(57).map(g => enc.encodeToString(g)).mkString("\r\n")
  }

  /** Assemble the full RFC 5322 message string. `date` is injected so
    * message bytes are a deterministic function of the arguments. */
  def composeMessage(from: String, to: Seq[String], cc: Seq[String],
      subject: String, body: String, attachment: Path,
      date: Instant): String = {
    require(to.nonEmpty, "at least one To recipient")
    val boundary = {
      // content-derived boundary: deterministic, and a digest makes a
      // collision with the payload text practically impossible
      val md = java.security.MessageDigest.getInstance("SHA-256")
      md.update(body.getBytes(StandardCharsets.UTF_8))
      md.update(Files.readAllBytes(attachment))
      "=_graft_" + md.digest().take(12).map("%02x".format(_)).mkString
    }
    val filename = attachment.getFileName.toString
    val ctype = guessContentType(filename)
    val crlf = "\r\n"
    // plain concatenation, not stripMargin: payload lines may start
    // with any character, including the margin char
    val attachmentPart =
      if (ctype.startsWith("text/")) {
        val text = new String(Files.readAllBytes(attachment),
          StandardCharsets.UTF_8)
        s"Content-Type: $ctype; charset=utf-8" + crlf +
          s"""Content-Disposition: attachment; filename="$filename"""" + crlf +
          crlf + text
      } else {
        s"Content-Type: $ctype" + crlf +
          "Content-Transfer-Encoding: base64" + crlf +
          s"""Content-Disposition: attachment; filename="$filename"""" + crlf +
          crlf + b64Lines(Files.readAllBytes(attachment))
      }
    val ccHeader =
      if (cc.nonEmpty) s"CC: ${cc.mkString(", ")}" + crlf else ""
    s"From: $from" + crlf +
      s"To: ${to.mkString(", ")}" + crlf +
      ccHeader +
      s"Subject: $subject" + crlf +
      s"Date: ${Rfc1123.format(date)}" + crlf +
      "MIME-Version: 1.0" + crlf +
      s"""Content-Type: multipart/mixed; boundary="$boundary"""" + crlf +
      crlf +
      s"--$boundary" + crlf +
      "Content-Type: text/plain; charset=utf-8" + crlf +
      crlf +
      body + crlf +
      s"--$boundary" + crlf +
      attachmentPart + crlf +
      s"--$boundary--" + crlf
  }

  /** mail.py `email_file`: compose and hand off; envelope recipients
    * are to ++ cc, exactly the reference's sendmail call. */
  def emailFile(transport: MailTransport, from: String, to: Seq[String],
      cc: Seq[String], subject: String, body: String, filepath: String,
      date: Instant = Instant.now()): Unit = {
    val msg = composeMessage(from, to, cc, subject, body,
      Paths.get(filepath), date)
    transport.send(from, to ++ cc, msg)
  }
}
