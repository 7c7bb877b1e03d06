package graft.ops

import graft.SparkSuite
import org.scalatest.funsuite.AnyFunSuite

/** Pins the pair-block banding's STRUCTURAL recall guarantee on
  * synthetic signatures, independent of any corpus: Hamming ≤ 6
  * pairs MUST collide in at least one of the C(8,2)=28 block-pair
  * tables (≤6 flipped bits leave ≥2 of the 8 blocks clean), and
  * Hamming > 12 pairs MUST be rejected by the verify filter. The
  * corpus-level q61 gate can only ever sample this property; here it
  * is exercised on adversarially random fingerprints. */
class SimhashBandingSpec extends AnyFunSuite with SparkSuite {

  // k blocks per key ⇒ structural guarantee Hamming ≤ 8−k
  for (k <- Seq(2, 3)) {
    val guarantee = 8 - k
    test(s"block-$k banding surfaces EVERY Hamming<=$guarantee pair and no Hamming>12 pair") {
      import spark.implicits._
      val rnd = new scala.util.Random(99L + k)
      def flip(sig: Long, nBits: Int): Long = {
        // n distinct random bit positions
        val pos = rnd.shuffle((0 until 64).toList).take(nBits)
        pos.foldLeft(sig)((s, b) => s ^ (1L << b))
      }
      // 200 in-guarantee pairs (h = 0..guarantee) and 100 out-of-
      // acceptance pairs (h = 13..20), all in one frame; ids encode
      // the pair so required/forbidden pairs are checkable in one run
      val inPairs = (0 until 200).map { i =>
        val base = rnd.nextLong()
        val h = i % (guarantee + 1)
        (2L * i, base, 2L * i + 1, flip(base, h))
      }
      val outPairs = (0 until 100).map { i =>
        val base = rnd.nextLong()
        val h = 13 + i % 8
        (10000L + 2 * i, base, 10000L + 2 * i + 1, flip(base, h))
      }
      val sigs = (inPairs ++ outPairs)
        .flatMap { case (ida, a, idb, b) => Seq((ida, a), (idb, b)) }
        .toDF("doc_id", "simhash")
      val found = Dedup.simhashPairsFromSigs(sigs, blocksPerKey = k)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val missedGuaranteed = inPairs
        .map { case (a, _, b, _) => (a, b) }.filterNot(found.contains)
      assert(missedGuaranteed.isEmpty,
        s"Hamming<=$guarantee pairs missed (guarantee violated): $missedGuaranteed")
      val leakedBeyondAcceptance = outPairs
        .map { case (a, _, b, _) => (a, b) }.filter(found.contains)
      assert(leakedBeyondAcceptance.isEmpty,
        s"Hamming>12 pairs surfaced past the verify filter: $leakedBeyondAcceptance")
    }
  }
}
