package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Pins the REAL image decode path on checked-in fixture files: a PNG
  * (img_8.png) and a BMP (img_7.bmp) committed under test resources,
  * generated once from [[Multimodal.ImagePixels]]'s closed form. The
  * decoder under test is the exact class the q31/q42/q45 partitions
  * instantiate — if javax.imageio, the magic sniffing, or the pixel
  * walk regresses (channel order, BMP bottom-up rows, stride), these
  * byte-level fixtures catch it without a Spark session. */
class MultimodalDecodeSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/$name")
    assert(in != null, s"missing checked-in fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private def expectedSums(id: Long): (Long, Long, Long) = {
    val (w, h) = (Multimodal.ImagePixels.width(id), Multimodal.ImagePixels.height(id))
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until h; x <- 0 until w) {
      sr += Multimodal.ImagePixels.r(id, x, y)
      sg += Multimodal.ImagePixels.g(id, x, y)
      sb += Multimodal.ImagePixels.b(id, x, y)
    }
    (sr, sg, sb)
  }

  test("checked-in PNG decodes to the defining pixel lattice") {
    val dec = new Multimodal.ImageDecoder
    val (fmt, img) = dec.decode(fixture("img_8.png"))
    assert(fmt == "png", "PNG magic must be sniffed from content")
    assert(img.getWidth == 24 && img.getHeight == 20)
    // every single pixel, not just aggregates
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val p = img.getRGB(x, y)
      assert(((p >> 16) & 0xFF) == Multimodal.ImagePixels.r(8, x, y), s"r($x,$y)")
      assert(((p >> 8) & 0xFF) == Multimodal.ImagePixels.g(8, x, y), s"g($x,$y)")
      assert((p & 0xFF) == Multimodal.ImagePixels.b(8, x, y), s"b($x,$y)")
    }
  }

  test("checked-in BMP decodes with correct (top-down) row order and channels") {
    val dec = new Multimodal.ImageDecoder
    val (fmt, img) = dec.decode(fixture("img_7.bmp"))
    assert(fmt == "bmp", "BMP magic must be sniffed from content")
    assert(img.getWidth == 23 && img.getHeight == 26)
    val (esr, esg, esb) = expectedSums(7L)
    val (sr, sg, sb) = Multimodal.channelSums(img)
    assert((sr, sg, sb) == (esr, esg, esb),
      "channel sums must match the closed form — a BGR swap or a bottom-up row flip diverges")
    // row order: pixel (0, 0) differs from (0, h-1) in this lattice
    val p0 = img.getRGB(0, 0)
    assert(((p0 >> 16) & 0xFF) == Multimodal.ImagePixels.r(7, 0, 0),
      "BMP stores rows bottom-up; the decoder must hand them back top-down")
  }

  test("resizeOne: nearest-neighbor fit-in-64 on the checked-in PNG") {
    val dec = new Multimodal.ImageDecoder
    val out = Multimodal.resizeOne(dec, 8L, fixture("img_8.png"))
    assert(out.width == 24 && out.height == 20)
    // w >= h: lock width to 64, scale height round-half-up: (20*64+12)/24 = 53
    assert(out.new_width == 64 && out.new_height == 53)
    // recompute the resampled sums from the closed form
    var sr = 0L
    for (y2 <- 0 until 53; x2 <- 0 until 64) {
      val sx = (x2 * 24) / 64
      val sy = (y2 * 20) / 53
      sr += Multimodal.ImagePixels.r(8, sx, sy)
    }
    assert(out.sum_r == sr)
  }

  test("unknown payloads are rejected by sniff, not misdecoded") {
    val dec = new Multimodal.ImageDecoder
    assert(dec.sniff("plain text".getBytes("UTF-8")) == "unknown")
    intercept[IllegalArgumentException] {
      dec.decode("GIF89a-not-supported-here".getBytes("UTF-8"))
    }
  }

  test("encode → decode round-trips the lattice for both formats at many ids") {
    val dec = new Multimodal.ImageDecoder
    for (id <- 0L until 20L) {
      val img0 = Multimodal.ImagePixels.render(id)
      val fmt = Multimodal.fixtureFormat(id)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img0, fmt, bos)
      val (sniffed, img) = dec.decode(bos.toByteArray)
      assert(sniffed == fmt)
      assert(img.getWidth == Multimodal.ImagePixels.width(id))
      assert(img.getHeight == Multimodal.ImagePixels.height(id))
      assert(Multimodal.channelSums(img) == expectedSums(id), s"id=$id fmt=$fmt")
    }
  }
}
