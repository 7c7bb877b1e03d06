package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Salted equi-join for skewed keys. When a handful of hot keys
 * dominate a shuffle join, AQE's skew-join splitting
 * (`spark.sql.adaptive.skewJoin.enabled`, on in our sessions) is the
 * first line of defense; explicit salting is the deterministic
 * fallback when one side can be replicated.
 *
 * The big side gets a uniform salt derived from a per-row hash (NOT
 * random — reruns and retries must route rows identically); the
 * small side is replicated `buckets` times so every (key, salt)
 * bucket finds its match. Join key cardinality per task shrinks by
 * `buckets`×, trading a `buckets`× blow-up of the SMALL side — the
 * classic skew trade.
 */
object SkewJoin {

  /** Inner equi-join `big ⋈ small` on `key`, salted `buckets` ways.
    * `saltSource` must be a deterministic per-row expression on `big`
    * (e.g. a row id column) — it only needs uniformity, not secrecy. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltSource: Column, buckets: Int = 8): DataFrame = {
    require(buckets > 0)
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "inputs already carry a __salt column")
    val saltedBig = big.withColumn("__salt", pmod(xxhash64(saltSource), lit(buckets)))
    val replicatedSmall = small.withColumn("__salt",
      explode(array((0 until buckets).map(lit(_)): _*)))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Driver-gated exercise of the salted join: lineitem ⋈ supplier on
    * suppkey through the salted path, aggregated per nation — the
    * oracle is the PLAIN join, so any row lost or duplicated by the
    * salting/replication machinery flips the hash. */
  def q69SkewJoin(s: org.apache.spark.sql.SparkSession, d: String): DataFrame = {
    val big = Tables.lineitem(s, d)
      .select(col("l_suppkey").as("k"), col("l_quantity"),
        col("l_orderkey"), col("l_linenumber"))
    val small = Tables.supplier(s, d)
      .select(col("s_suppkey").as("k"), col("s_nationkey"))
    saltedJoin(big, small, "k",
        saltSource = col("l_orderkey") * 10 + col("l_linenumber"))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n"),
        sum(Tables.cents(col("l_quantity"))).as("qty_cents"))
      .orderBy(col("s_nationkey"))
  }

  val q69Sql: String =
    """SELECT s_nationkey, count(*) AS n,
      | CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS qty_cents
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin
}
