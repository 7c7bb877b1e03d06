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
 * Scale note: the attachment is read once and held in memory along
 * with its encoded form while the message assembles — a mail message
 * is a driver-side notification artifact (this is not a data path),
 * so attachment size is expected to be export-report scale, not
 * corpus scale.
 */
object MailSink {

  /** Transport boundary: where assembled message bytes go. */
  trait MailTransport {
    def send(from: String, recipients: Seq[String], message: String): Unit
  }

  /** Default transport: write each message as `<seq>_<subject-slug>.eml`
    * into `dir` via temp-file + atomic rename. The sequence resumes
    * from the directory's highest existing message, so a restarted
    * process appends instead of silently replacing earlier mail. */
  final class OutboxTransport(dir: String) extends MailTransport {
    private var seq = {
      val existing = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
        .flatMap(f => "^(\\d{5})_.*\\.eml$".r.findFirstMatchIn(f.getName)
          .map(_.group(1).toInt))
      if (existing.isEmpty) 0 else existing.max + 1
    }
    def send(from: String, recipients: Seq[String], message: String): Unit =
      synchronized {
        val base = Paths.get(dir)
        Files.createDirectories(base)
        val subject = "(?m)^Subject: (.*)$".r.findFirstMatchIn(message)
          .map(_.group(1)).getOrElse("message")
        val slug = subject.toLowerCase(Locale.ROOT)
          .replaceAll("[^a-z0-9]+", "-").replaceAll("^-|-$", "").take(40)
        // rename(2) replaces an existing target silently — advance past
        // any name already present so queued mail is never destroyed
        while (Files.exists(base.resolve(f"$seq%05d_$slug.eml"))) seq += 1
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

  /** Header values must not smuggle line breaks: a subject or address
    * derived from user data (a table name, a file name) could
    * otherwise inject arbitrary headers (e.g. a forged Bcc) into the
    * message a relay will send. */
  private def hdr(v: String): String = v.replaceAll("[\r\n]+", " ")

  /** Assemble the full RFC 5322 message string. `date` is injected so
    * message bytes are a deterministic function of the arguments. */
  def composeMessage(from: String, to: Seq[String], cc: Seq[String],
      subject: String, body: String, attachment: Path,
      date: Instant): String = {
    require(to.nonEmpty, "at least one To recipient")
    val bytes = Files.readAllBytes(attachment) // read ONCE: digest and
    // part body must describe the same bytes even if the file changes
    val boundary = {
      // content-derived boundary: deterministic, and a digest makes a
      // collision with the payload text practically impossible
      val md = java.security.MessageDigest.getInstance("SHA-256")
      md.update(body.getBytes(StandardCharsets.UTF_8))
      md.update(bytes)
      "=_graft_" + md.digest().take(12).map("%02x".format(_)).mkString
    }
    // the filename is user-derived data inside a quoted header value:
    // strip line breaks (hdr) AND double quotes, or it can close the
    // quote and inject headers the same way a CRLF subject could
    val filename = hdr(attachment.getFileName.toString).replace("\"", "")
    val ctype = guessContentType(filename)
    val crlf = "\r\n"
    // plain concatenation, not stripMargin: payload lines may start
    // with any character, including the margin char
    val text = if (ctype.startsWith("text/"))
      Some(new String(bytes, StandardCharsets.UTF_8)) else None
    val attachmentPart = text match {
      // inline text rides with RFC-required CRLF line endings; a line
      // past the RFC 5322 length limit falls back to base64 (a relay
      // would otherwise reject or fold-corrupt the attachment), and so
      // does any text with lone-\r endings, which CRLF normalization
      // could not round-trip. A trailing newline is preserved (the
      // linesIterator reassembly would otherwise silently drop it).
      case Some(t) if !t.replace("\r\n", "\n").contains('\r') &&
          t.linesIterator.forall(_.length <= 900) =>
        s"Content-Type: $ctype; charset=utf-8" + crlf +
          s"""Content-Disposition: attachment; filename="$filename"""" + crlf +
          crlf + t.linesIterator.mkString(crlf) +
          (if (t.endsWith("\n")) crlf else "")
      case _ =>
        s"Content-Type: $ctype" + crlf +
          "Content-Transfer-Encoding: base64" + crlf +
          s"""Content-Disposition: attachment; filename="$filename"""" + crlf +
          crlf + b64Lines(bytes)
    }
    val ccHeader =
      if (cc.nonEmpty) s"CC: ${hdr(cc.mkString(", "))}" + crlf else ""
    s"From: ${hdr(from)}" + crlf +
      s"To: ${hdr(to.mkString(", "))}" + crlf +
      ccHeader +
      s"Subject: ${hdr(subject)}" + crlf +
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
