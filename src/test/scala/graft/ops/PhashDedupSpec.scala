package graft.ops

import java.awt.image.BufferedImage

import org.scalatest.funsuite.AnyFunSuite

/** Pins q172's perceptual-hash primitives without Spark: the hash
  * math, its brightness invariance, the PNG/BMP encode→decode round
  * trip, and the Manku pigeonhole guarantee (every Hamming≤3 pair of
  * the full 120-image fixture family shares at least one of the 4
  * bands) that makes the banded join lossless. */
class PhashDedupSpec extends AnyFunSuite {

  private def encodeDecode(img: BufferedImage, fmt: String): BufferedImage = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    new Multimodal.ImageDecoder().decode(bos.toByteArray)._2
  }

  test("phash56 uses only the low 56 bits") {
    (0L until 60L).foreach { id =>
      val h = Multimodal.phash56(Multimodal.ImagePixels.render(id))
      assert((h >>> 56) == 0L, s"id $id")
    }
  }

  test("phash56 is invariant under a uniform brightness shift") {
    // a uniform +k on every pixel (no clipping) shifts every block's
    // gray sum by exactly k·n — (r+k + g+k + b+k) div 3 =
    // (r+g+b) div 3 + k — which cancels in the cross-multiplied
    // block-mean comparison: (s_a + k·n_a)·n_b > (s_b + k·n_b)·n_a
    // ⟺ s_a·n_b > s_b·n_a. Build the clip-free case by pre-capping
    // channels at 255-k before shifting.
    val id = 7L
    val k = 40
    val img = Multimodal.ImagePixels.render(id)
    val capped = new BufferedImage(img.getWidth, img.getHeight,
      BufferedImage.TYPE_INT_RGB)
    val plus = new BufferedImage(img.getWidth, img.getHeight,
      BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val p = img.getRGB(x, y)
      val r = math.min(255 - k, (p >> 16) & 0xFF)
      val g = math.min(255 - k, (p >> 8) & 0xFF)
      val b = math.min(255 - k, p & 0xFF)
      capped.setRGB(x, y, (r << 16) | (g << 8) | b)
      plus.setRGB(x, y, ((r + k) << 16) | ((g + k) << 8) | (b + k))
    }
    assert(Multimodal.phash56(capped) == Multimodal.phash56(plus))
  }

  test("PNG and BMP round-trips preserve the hash exactly") {
    Seq(2L, 7L).foreach { id =>
      val img = Multimodal.ImagePixels.render(id)
      val h0 = Multimodal.phash56(img)
      assert(Multimodal.phash56(encodeDecode(img, "png")) == h0)
      assert(Multimodal.phash56(encodeDecode(img, "bmp")) == h0)
    }
  }

  test("variant images stay perceptually near their base") {
    // the q172 fixture contract: the even-row +1 bump is a NEAR
    // duplicate — hash distance small for every base id
    val ds = (0L until 60L).map { id =>
      java.lang.Long.bitCount(
        Multimodal.phash56(Multimodal.ImagePixels.render(id)) ^
          Multimodal.phash56(Multimodal.renderVariant(id)))
    }
    assert(ds.max <= 8, s"max base/variant distance ${ds.max}")
    assert(ds.count(_ <= Multimodal.PhashHammingMax) > 0,
      "no base/variant pair within the dedup threshold — q172 would be empty")
  }

  test("Manku pigeonhole: every Hamming<=3 pair shares a band") {
    val hashes = (0L until 60L).flatMap { id =>
      Seq(Multimodal.phash56(Multimodal.ImagePixels.render(id)),
        Multimodal.phash56(Multimodal.renderVariant(id)))
    }
    def bands(h: Long): Set[(Int, Long)] =
      (0 until Multimodal.PhashBands)
        .map(i => i -> ((h >> (i * Multimodal.PhashBandBits)) & 0x3FFFL))
        .toSet
    for (i <- hashes.indices; j <- (i + 1) until hashes.length) {
      val d = java.lang.Long.bitCount(hashes(i) ^ hashes(j))
      if (d <= Multimodal.PhashHammingMax)
        assert(bands(hashes(i)).intersect(bands(hashes(j))).nonEmpty,
          s"pair ($i,$j) at distance $d shares no band")
    }
  }
}
