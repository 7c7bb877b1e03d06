package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.time.Instant
import java.util.Base64

import org.scalatest.funsuite.AnyFunSuite

class MailSinkSpec extends AnyFunSuite {

  private val date = Instant.parse("2026-08-14T12:00:00Z")

  private def tmpFile(name: String, bytes: Array[Byte]) = {
    val dir = Files.createTempDirectory("mailsink")
    val p = dir.resolve(name)
    Files.write(p, bytes)
    p
  }

  test("text attachment rides inline with content-type from the extension") {
    val att = tmpFile("export.csv", "a,b\n1,2\n".getBytes(StandardCharsets.UTF_8))
    val msg = MailSink.composeMessage("from@x", Seq("to@x"), Nil,
      "subject here", "body text", att, date)
    assert(msg.contains("From: from@x\r\n"))
    assert(msg.contains("To: to@x\r\n"))
    assert(!msg.contains("CC:"), "empty cc must omit the header (mail.py rule)")
    assert(msg.contains("Subject: subject here\r\n"))
    assert(msg.contains("Date: Fri, 14 Aug 2026 12:00:00 +0000\r\n"))
    assert(msg.contains("Content-Type: text/csv; charset=utf-8"))
    assert(msg.contains("Content-Disposition: attachment; filename=\"export.csv\""))
    assert(msg.contains("a,b\r\n1,2"),
      "text files attach as decoded text with CRLF-normalized line endings")
    // multipart framing: two parts, one closing boundary
    val boundary = "(?m)boundary=\"([^\"]+)\"".r.findFirstMatchIn(msg).get.group(1)
    assert(("--" + boundary + "\r\n").r.findAllIn(msg).size == 2)
    assert(msg.endsWith("--" + boundary + "--\r\n"))
  }

  test("binary / compressed attachments go base64 with 76-char lines") {
    val raw = Array.tabulate[Byte](200)(i => (i * 7 % 251).toByte)
    val att = tmpFile("export.csv.gz", raw)
    val msg = MailSink.composeMessage("f@x", Seq("t@x"), Seq("c@x"),
      "s", "b", att, date)
    assert(msg.contains("CC: c@x\r\n"))
    assert(msg.contains("Content-Type: application/octet-stream"),
      "compressed files take the bag-of-bits type even though .csv is text")
    assert(msg.contains("Content-Transfer-Encoding: base64"))
    val b64 = msg.split("Content-Disposition[^\\r]*\\r\\n\\r\\n")(1)
      .split("\r\n--")(0)
    assert(b64.linesIterator.forall(_.length <= 76))
    assert(Base64.getMimeDecoder.decode(b64).sameElements(raw),
      "attachment bytes must round-trip")
  }

  test("emailFile delivers to to ++ cc through the transport; outbox writes .eml") {
    val outbox = Files.createTempDirectory("outbox").toString
    var envelope: Seq[String] = Nil
    val spy = new MailSink.MailTransport {
      val inner = new MailSink.OutboxTransport(outbox)
      def send(from: String, recipients: Seq[String], message: String): Unit = {
        envelope = recipients; inner.send(from, recipients, message)
      }
    }
    val att = tmpFile("r.txt", "hi".getBytes(StandardCharsets.UTF_8))
    MailSink.emailFile(spy, "f@x", Seq("a@x", "b@x"), Seq("c@x"),
      "Weekly Export!", "done", att.toString, date)
    assert(envelope == Seq("a@x", "b@x", "c@x"))
    val files = new java.io.File(outbox).listFiles().map(_.getName).sorted
    assert(files.length == 1 && files(0) == "00000_weekly-export.eml", files.mkString)
    val written = new String(Files.readAllBytes(
      Paths.get(outbox, files(0))), StandardCharsets.UTF_8)
    assert(written.contains("Subject: Weekly Export!"))
  }

  test("a restarted outbox appends after the existing messages, never replaces") {
    val outbox = Files.createTempDirectory("outbox2").toString
    val att = tmpFile("a.txt", "x".getBytes(StandardCharsets.UTF_8))
    new MailSink.OutboxTransport(outbox).send("f@x", Seq("t@x"),
      MailSink.composeMessage("f@x", Seq("t@x"), Nil, "first", "b", att, date))
    // fresh instance over the same directory (process restart)
    new MailSink.OutboxTransport(outbox).send("f@x", Seq("t@x"),
      MailSink.composeMessage("f@x", Seq("t@x"), Nil, "second", "b", att, date))
    val names = new java.io.File(outbox).listFiles().map(_.getName).sorted
    assert(names.toSeq == Seq("00000_first.eml", "00001_second.eml"), names.mkString(","))
  }

  test("header values cannot inject lines; over-long text lines fall back to base64") {
    val att = tmpFile("a.txt", "x".getBytes(StandardCharsets.UTF_8))
    val msg = MailSink.composeMessage("f@x", Seq("t@x"), Nil,
      "done\r\nBcc: attacker@evil", "b", att, date)
    assert(!msg.linesIterator.exists(_.startsWith("Bcc:")),
      "CRLF in a subject must not become a header")
    assert(msg.contains("Subject: done Bcc: attacker@evil\r\n"))
    val wide = tmpFile("w.txt", ("y" * 1200 + "\n").getBytes(StandardCharsets.UTF_8))
    val m2 = MailSink.composeMessage("f@x", Seq("t@x"), Nil, "s", "b", wide, date)
    assert(m2.contains("Content-Transfer-Encoding: base64"),
      "a text line past the RFC length limit must ride base64")
  }

  test("attachment filename cannot break or inject headers") {
    val att = tmpFile("a\".txt\r\nBcc: attacker@evil",
      "x".getBytes(StandardCharsets.UTF_8))
    val msg = MailSink.composeMessage("f@x", Seq("t@x"), Nil, "s", "b", att, date)
    assert(!msg.linesIterator.exists(_.startsWith("Bcc:")),
      "CRLF in a filename must not become a header")
    assert(!msg.contains("filename=\"a\""),
      "a double quote in a filename must not close the quoted value")
  }

  test("text attachments round-trip trailing newlines; lone-\\r text rides base64") {
    val att = tmpFile("t.txt", "a\nb\n\n".getBytes(StandardCharsets.UTF_8))
    val msg = MailSink.composeMessage("f@x", Seq("t@x"), Nil, "s", "b", att, date)
    val part = msg.split("filename=\"t.txt\"\r\n\r\n")(1).split("\r\n--")(0)
    assert(part == "a\r\nb\r\n\r\n",
      s"trailing terminator must survive CRLF normalization, got ${part.length} chars")
    val mac = tmpFile("m.txt", "a\rb\n".getBytes(StandardCharsets.UTF_8))
    val m2 = MailSink.composeMessage("f@x", Seq("t@x"), Nil, "s", "b", mac, date)
    assert(m2.contains("Content-Transfer-Encoding: base64"),
      "lone-\\r line endings cannot round-trip as inline text")
  }

  test("deterministic: same inputs, byte-identical message") {
    val att = tmpFile("a.txt", "x".getBytes(StandardCharsets.UTF_8))
    val m1 = MailSink.composeMessage("f@x", Seq("t@x"), Nil, "s", "b", att, date)
    val m2 = MailSink.composeMessage("f@x", Seq("t@x"), Nil, "s", "b", att, date)
    assert(m1 == m2)
  }
}
