package graft.ops

import graft.SparkSuite
import org.scalatest.funsuite.AnyFunSuite

class SparseSimSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("weights: trigram multiset tf, integer quantization of tf*ln(N/df)") {
    val docs = Seq(
      (1L, "a b c a b c"), // trigrams: "a b c"x2, "b c a", "c a b"
      (2L, "a b c x"),     // "a b c", "b c x"
      (3L, "z z z")        // "z z z"
    ).toDF("doc_id", "text")
    val w = SparseSim.weights(docs).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    def q(tf: Long, df: Long): Long = math.round(tf * math.log(3.0 / df) * 1000)
    assert(w((1L, "a b c")) == q(2, 2)) // multiset: tf 2, df 2
    assert(w((2L, "a b c")) == q(1, 2))
    assert(w((1L, "b c a")) == q(1, 1))
    assert(w((3L, "z z z")) == q(1, 1))
    // docs shorter than one trigram contribute nothing
    assert(SparseSim.weights(Seq((9L, "one two")).toDF("doc_id", "text")).count() == 0)
  }

  /** Brute-force cosine pairs >= 0.9 from the same quantized weights,
    * computed in driver memory — the ground truth the prefix-filtered
    * join must reproduce EXACTLY (same quantization, same rounding). */
  private def brute(docs: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] = {
    val w = SparseSim.weights(docs).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.map(r => r.getString(1) -> r.getLong(2)).toMap }
    val ids = w.keys.toSeq.sorted
    (for {
      i <- ids; j <- ids if i < j
      na = w(i).values.map(v => v * v).sum if na > 0
      nb = w(j).values.map(v => v * v).sum if nb > 0
      dot = w(i).keySet.intersect(w(j).keySet).toSeq
        .map(t => w(i)(t) * w(j)(t)).sum
      cos = dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
      if cos >= 0.9
      // BigDecimal HALF_UP, matching Spark's round(_, 6) — math.rint
      // is half-even and would diverge on an exact 7th-decimal tie
    } yield (i, j, BigDecimal(cos)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
  }

  private val fixture = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),  // identical to 1
    (3L, "the quick brown fox jumps over the sleepy dog"), // near 1/2
    (4L, "pack my box with five dozen liquor jugs"),       // unrelated cluster
    (5L, "pack my box with five dozen liquor jugs today"),
    (6L, "the quick brown cat naps beside five dozen boxes"), // weak overlap
    (7L, "fox jumps over the lazy dog the quick brown"),   // rotated variant
    (8L, "lorem ipsum dolor"),                             // single trigram
    (9L, "lorem ipsum dolor lorem ipsum dolor")            // repeats 8's content
  ).toDF("doc_id", "text")

  test("cosineJoin reproduces the brute-force pair set exactly (prefix filter is lossless)") {
    val got = SparseSim.cosineJoin(fixture).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = brute(fixture)
    assert(got == want, s"got=$got want=$want")
    // the fixture must exercise the threshold from both sides
    assert(want.exists(_._3 == 1.0) && want.nonEmpty)
    assert(want.size < 9 * 8 / 2)
  }

  test("prefix filter generates strictly fewer candidates than corpus x corpus") {
    val n = fixture.count()
    val cand = SparseSim.candidateCount(fixture)
    assert(cand < n * (n - 1) / 2, s"candidates $cand not pruned")
    // and the prune never cuts below the qualifying pairs themselves
    assert(cand >= brute(fixture).size)
  }

  test("chunked dot-product (the 100x scratch path) is row-identical to the single pass") {
    // a 1-row expansion budget forces the candidate-space chunk loop
    // (pmod(xxhash64(doc_a, doc_b), C), round 15); the chunk union
    // must equal the single pass exactly because the pair classes are
    // disjoint and each pair's whole integer dot product completes
    // inside its own chunk — the q114 parity contract applied to q135
    val single = SparseSim.cosineJoin(fixture).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val chunked = SparseSim.cosineJoin(fixture, maxExpansionRows = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(single.nonEmpty)
    assert(chunked == single, s"chunked=$chunked single=$single")
  }

  test("all-idf-zero documents are excluded, not NaN") {
    // the single trigram appears in every doc -> weight 0, norm 0
    val degenerate = Seq((1L, "x y z"), (2L, "x y z"), (3L, "x y z"))
      .toDF("doc_id", "text")
    assert(SparseSim.cosineJoin(degenerate).count() == 0)
  }
}
