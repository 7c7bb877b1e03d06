package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.BloomFilter

/**
 * Runtime semi-join reduction with the native Bloom primitives
 * (`graft.functions.BloomFilter`): build the filter over the dim
 * side's join keys, probe it on the fact side BEFORE the fact
 * shuffle. This is the pattern for the regime AQE/DPP doesn't cover —
 * a dim side too big to broadcast joined on a non-partition column,
 * where the plain plan sort-merges both full inputs. At 100 TB the
 * fact shuffle is the bill; a bits-per-key-sized filter shipped as a
 * literal cuts it to ≈ the join selectivity (+ the fp rate).
 *
 * False positives survive the probe but are removed by the real join
 * that follows, so the rewrite is exact — q77's oracle is the PLAIN
 * join, and the driver's hash-compare proves transparency.
 */
object BloomJoin {

  /** Default sizing: ~10 bits/key, k=5 → ≈0.9% false-positive rate. */
  def sizeBits(expectedKeys: Long, bitsPerKey: Int = 10): Int = {
    val raw = expectedKeys * bitsPerKey
    val clamped = math.min(math.max(raw, 1L << 10), 1L << 28) // 128 B .. 32 MB
    ((clamped + 63) & ~63L).toInt
  }

  /** Inner equi-join `fact ⋈ dim` on `factKey = dimKey` where the fact
    * side is pre-filtered through a Bloom filter built from `dim`.
    * The dim aggregate is collected once (one job over the dim side —
    * the distributed build uses word-wise-OR partial merges, so the
    * driver sees only the final `numBits/8` bytes). `numBits <= 0`
    * (the default) sizes the filter from the dim cardinality via
    * [[sizeBits]] — one extra count job over the dim side, which is
    * what keeps the filter from saturating when the dim grows 100×.
    * Join strategy is left to Catalyst/AQE; pass `smjHint = true` to
    * pin a sort-merge join in the shuffle-reduction regime. */
  def bloomFilteredJoin(spark: SparkSession, fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String, numBits: Int = 0, numHashes: Int = 5,
      smjHint: Boolean = false): DataFrame = {
    BloomFilter.register(spark)
    val bits = if (numBits > 0) numBits else sizeBits(dim.count())
    val bytes = dim.agg(BloomFilter.bloom_agg(col(dimKey), bits, numHashes))
      .head.getAs[Array[Byte]](0)
    val pruned = fact.filter(BloomFilter.bloom_contains(lit(bytes), col(factKey)))
    val dimSide = if (smjHint) dim.hint("merge") else dim
    // qualify through the parent frames: with factKey == dimKey (the
    // common case for a generic fact/dim API) an unqualified
    // col(factKey) === col(dimKey) is AMBIGUOUS_REFERENCE
    pruned.join(dimSide, pruned(factKey) === dimSide(dimKey))
  }

  /** q77: revenue per order priority for one customer segment, with
    * the orders side Bloom-pruned by the segment's custkeys before a
    * pinned sort-merge join (the no-broadcast regime under test).
    * Oracle = the plain join; PlanQualitySpec asserts the probe sits
    * below the fact-side Exchange. */
  def q77BloomJoin(s: SparkSession, d: String): DataFrame = {
    val dim = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val fact = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderpriority"), col("o_totalprice"))
    bloomFilteredJoin(s, fact, dim, "o_custkey", "c_custkey", smjHint = true)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        (sum(Tables.cents(col("o_totalprice"))).cast("long") / 100.0).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  val q77Sql: String =
    """SELECT o_orderpriority, count(*) AS n_orders,
      | CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)/100.0 AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
}
