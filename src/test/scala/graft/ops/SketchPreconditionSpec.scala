package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The sketch-precondition audit (round-11 verdict ask 5, generalizing
 * the q53 find): every capacity- or parameter-bounded structure in the
 * engine, its data-dependent precondition, and the guard that holds
 * when data defeats it. The registry test is the enumerable contract;
 * the remaining tests EXERCISE each runtime guard — a precondition
 * without a failing test is exactly how the round-11 q53 sketch went
 * silently garbage at 1000×.
 *
 * | structure                     | parameter            | precondition                                   | guard                                                               |
 * |-------------------------------|----------------------|------------------------------------------------|---------------------------------------------------------------------|
 * | HeavyHitters (space-saving)   | capacity             | vocabulary ≤ capacity for EXACT counts         | HLL-sized capacity (q53) + sketch-level `evicted` flag asserted at  |
 * |                               |                      |                                                | runtime + `require` ceiling 2²⁴ + q187 documented-approximate mode  |
 * | approx_count_distinct (HLL)   | rsd = 0.01           | estimate within 1.5× headroom of the truth     | backstop: the `evicted` assert above fires if the sizing is defeated|
 * | TopK heap aggregate           | k                    | none — top-k by (v desc, payload) is exact     | buffer prune keeps ALL candidates above the k-th; boundary-tested   |
 * | BloomFilterAgg                | numBits, numHashes   | n ≲ design load for the target FPP; FPP decay  | NO false negatives at ANY load (tested at 20× design); parameter    |
 * |                               |                      | only weakens the downstream exact filter       | `require`s reject malformed sizes                                   |
 * | MinHash LSH (q22)             | k=20, 5×4 bands      | recall is probabilistic at the 0.5 threshold   | q61 recall floor (oracle-hashed); saturated-bucket star pairing     |
 * | SimHash banding (q24)         | 8 blocks, ≤4/key     | pigeonhole: ≤ (blocks−perKey) flipped bits;    | `require(2 ≤ blocksPerKey ≤ 4)`; q61/SimhashBandingSpec floors;     |
 * |                               |                      | 16-bit keys saturate past ~1M docs (the 1000×  | blocksPerKey sized to the corpus (SimhashTripleBlockDocs) — the     |
 * |                               |                      | scratch death: hash-collision candidates)      | round-12 ladder find, tested below                                  |
 * | pHash banding (q172)          | 4 bands × 16 bit     | pigeonhole: pairs within Hamming 3 collide     | deterministic — tested below on constructed hashes                  |
 * | equi-depth histogram (q112)   | 4 buckets            | none — ONE exact percentile pass; degenerate   | ≤-boundary CASE is total (all-equal input collapses to bucket 1)    |
 * |                               |                      | value sets collapse buckets, never crash       |                                                                     |
 * | weightedPageRank (q165)       | int64 mass scale     | max edge strength ≤ ~1.08·10⁵                  | runtime `require` with pre-scale-by-GCD hint — tested below         |
 * | PQ codebooks (q89)            | PqM subspaces        | dim % PqM = 0                                  | `require` (Similarity.scala) + q61-gated recall                     |
 * | IVF codebook (q37/q144)       | driver-sized sample  | append ids above the sample prefix             | q144/q186 equivalence audits (appended ≡ rebuilt)                   |
 * | ColumnDef int lattice         | int64 saturation     | Python int() is unbounded; we saturate         | ColumnDefSpec pins the saturating parse                             |
 */
class SketchPreconditionSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("registry: every bounded structure names a precondition and a guard") {
    // (structure, guard-site) — compile-time-checked references would
    // be ideal; this pins the enumeration so a new sketch without a
    // registry row is a reviewable diff, and the scaladoc table above
    // carries the full contract
    val registry = Seq(
      "HeavyHitters" -> "evicted flag + HLL sizing + require ceiling + q187 approx mode",
      "approx_count_distinct" -> "evicted-flag backstop in q53",
      "TopK" -> "exact by construction; boundary prune tested",
      "BloomFilterAgg" -> "no false negatives; size requires",
      "MinHashLSH" -> "q61 recall floor; bucket cap",
      "SimHashBanding" -> "blocksPerKey require; q61 floor; corpus-adaptive key width",
      "PhashBanding" -> "pigeonhole, deterministic",
      "EquidepthHistogram" -> "exact percentile; total CASE",
      "WeightedPageRank" -> "MaxSafeEdgeStrength require",
      "PqCodebook" -> "dim % PqM require; recall gate",
      "IvfCodebook" -> "append-equivalence audits",
      "ColumnDefLattice" -> "saturating parse")
    assert(registry.size >= 12 && registry.forall(_._2.nonEmpty))
  }

  test("heavy_hitters: the exact-mode assert fires loudly when capacity is defeated") {
    graft.functions.HeavyHitters.register(spark)
    val toks = (1 to 300).map(i => s"tok$i").toDF("tok")
    // q53's guard shape with a deliberately-defeated capacity: the
    // sketch saturates, `evicted` goes true, and the assert raises
    // instead of returning inherited-bucket garbage
    val guarded = toks
      .agg(graft.functions.HeavyHitters.heavy_hitters(col("tok"), 10, 16).as("r"))
      .filter(assert_true(!col("r.evicted"), lit("sketch saturated")).isNull)
    val ex = intercept[Exception] { guarded.collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("sketch saturated")), ex.toString)
  }

  test("TopK: the bounded buffer loses nothing at the k boundary") {
    graft.functions.TopK.register(spark)
    val df = (1L to 100L).map(v => (v, 1000L - v)).toDF("v", "p").repartition(7)
    val top = df.agg(graft.functions.TopK.topk(col("v"), col("p"), 10).as("t"))
      .select(explode(col("t")).as("e")).select(col("e.v")).collect()
      .map(_.getLong(0))
    assert(top.toSeq == (91L to 100L).reverse)
  }

  test("BloomFilterAgg: zero false negatives at 20x the comfortable load") {
    graft.functions.BloomFilter.register(spark)
    // 1024 bits comfortably hold ~100 keys at 3 hashes; insert 2000 —
    // FPP degrades (the documented failure mode: the downstream EXACT
    // join just prunes less) but membership of every inserted key must
    // survive saturation
    val keys = (1L to 2000L).toDF("k").repartition(8)
    // the contains expression wants a FOLDABLE bloom (the build-side
    // aggregate is collected and re-broadcast as a literal — the
    // BloomJoin usage shape)
    val bytes = keys.agg(
        graft.functions.BloomFilter.bloom_agg(col("k"), 1024, 3).as("b"))
      .head().getAs[Array[Byte]](0)
    val misses = keys
      .filter(!graft.functions.BloomFilter.bloom_contains(lit(bytes), col("k")))
      .count()
    assert(misses == 0L, s"$misses inserted keys reported absent — bloom broke exactness")
    // malformed parameters fail at construction, not mid-query
    intercept[Exception] {
      keys.agg(graft.functions.BloomFilter.bloom_agg(col("k"), 100, 3)).collect()
    }
  }

  test("simhash banding: blocksPerKey outside the Manku pigeonhole window is rejected") {
    val sigs = Seq((1L, 0L)).toDF("doc_id", "simhash")
    intercept[IllegalArgumentException] {
      Dedup.simhashPairsFromSigs(sigs, blocksPerKey = 5)
    }
  }

  test("simhash banding: the corpus-adaptive key width keeps recall (triple-block finds the Hamming-6 pair)") {
    // the 1000x fix must not cost the structural guarantee it rides
    // on: with 56 triple-block tables (24-bit keys) a Hamming-6 pair
    // leaves >= 2 clean blocks... but triple keys need 3 clean blocks
    // — guarantee narrows to Hamming <= 5 by pigeonhole (8 blocks, 5
    // dirty can touch at most 5). Construct a 4-bit-apart pair spread
    // over 4 different blocks: 4 clean blocks remain -> some clean
    // triple exists -> must collide and verify (Hamming 4 <= 12)
    val base = 0x0F0F0F0F0F0F0F0FL
    val flipped = base ^ (1L << 1) ^ (1L << 9) ^ (1L << 17) ^ (1L << 25)
    val sigs = Seq((1L, base), (2L, flipped)).toDF("doc_id", "simhash")
    val pairs = Dedup.simhashPairsFromSigs(sigs, blocksPerKey = 3)
      .select(col("doc_a"), col("doc_b")).distinct().count()
    assert(pairs == 1L, "triple-block banding missed a 4-bit pair with 4 clean blocks")
  }

  test("pHash banding: any pair within Hamming distance 3 collides on >= 1 of the 4 bands") {
    // exhaustive over band-structure: flip 3 bits in WORST positions
    // (spread across 3 different bands) — the 4th band must still match
    val base = 0x123456789ABCDEFL
    val flipped = base ^ (1L << 0) ^ (1L << 16) ^ (1L << 32) // bands 0,1,2 differ
    val hs = Seq((1L, base), (2L, flipped)).toDF("doc_id", "phash")
    val pairs = Multimodal.bandPairs(hs).select(col("doc_a"), col("doc_b")).distinct()
    assert(pairs.count() >= 1L, "pigeonhole violated: 3-bit pair missed all 4 bands")
  }

  test("weightedPageRank: an edge strength past the int64-safe bound fails loudly with the hint") {
    val e = Seq((1L, 2L, 200000L), (2L, 1L, 200000L)).toDF("src", "dst", "c")
    val ex = intercept[IllegalArgumentException] {
      Graph.weightedPageRank(e).collect()
    }
    assert(ex.getMessage.contains("pre-scale c by its GCD"), ex.getMessage)
  }
}
