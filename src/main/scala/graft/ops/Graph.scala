package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Distributed graph analytics over relational edge lists. The first
 * resident: PageRank (Brin & Page '98) over the co-purchase part
 * graph — two parts are linked when some order contains both, the
 * classic "customers who bought X also bought Y" graph, and the
 * centrality signal a catalog/curation pipeline reads off it.
 *
 * This is the DISTRIBUTED power-iteration shape — deliberately the
 * other half of q125's design space: q125 collapses its event-type
 * matrix to T² rows and iterates on a driver-sized artifact; here the
 * vertex set is data-sized (parts ~ corpus keys), so ranks stay a
 * distributed frame and every iteration is one ranks⋈edges equi-join
 * on src plus one hash aggregate on dst — exactly the shuffle pair a
 * 1000-executor PageRank runs, with the edge frame checkpoint-
 * materialized ONCE and reused by all iterations. At 100 TB both
 * sides pre-partition on the join key (bucketing the edge table by
 * src makes each iteration's join shuffle-free on the big side).
 *
 * Determinism (cross-engine, iteration-proof): all mass arithmetic is
 * exact integer — total mass M = 10¹² units, damping 85/100, every
 * per-edge contribution is floor((r·85) / (100·deg)), every new rank
 * an order-free long sum plus the floor'd teleport share. No doubles
 * exist anywhere in the loop, so 10 iterations stay bit-identical to
 * the oracle's recursive-CTE replay (the q125 discipline, without the
 * driver-sized matrix). Overflow-safe: r ≤ M, so r·85 ≤ 8.5·10¹³.
 *
 * Every vertex of the symmetrized co-purchase graph has deg ≥ 1 (an
 * edge certifies both endpoints), so there are no dangling vertices
 * by construction and the iteration preserves the vertex row set;
 * parts never co-purchased simply aren't graph vertices.
 */
object Graph {
  import Tables._

  /** Total mass in integer units. */
  private val M = 1000000000000L
  private val Damp = 85L // /100
  private[ops] val Iterations = 10

  /** Integer PageRank over a directed edge list (src, dst) — callers
   *  pass a symmetrized frame for undirected graphs. Returns
   *  (node, deg, rank_units, share). */
  def pageRank(edges: DataFrame, iterations: Int = Iterations): DataFrame = {
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // materialize the (src, dst, deg) frame once; every iteration —
    // and the final deg join — re-reads this, never the base scan.
    // DISK_ONLY: the edge frame is DATA-sized (hundreds of millions
    // of rows at the 100× octave) — memory-resident blocks pinned
    // storage while the per-iteration hash aggregate wanted execution
    // memory and OOM'd a 16g heap at 100×; serialized-on-disk blocks
    // cost one read per iteration and leave the unified pool to the
    // aggregate. The vertex-sized ranks below stay memory-resident.
    val e = edges.join(deg, "src")
      .localCheckpoint(eager = true, StorageLevel.DISK_ONLY)
    val n = e.select(col("src")).distinct().count()
    if (n == 0)
      return e.select(col("src").as("node"), lit(0L).as("deg"),
        lit(0L).as("rank_units"), lit(0.0).as("share"))
    val tele = (M * (100L - Damp)) / (100L * n)
    var ranks = e.select(col("src")).distinct()
      .select(col("src").as("node"), lit(M / n).as("r"))
    var i = 0
    while (i < iterations) {
      ranks = e.join(ranks, col("src") === col("node"))
        .select(col("dst"), expr(s"r * $Damp div (100 * deg)").as("c"))
        .groupBy(col("dst"))
        .agg((sum(col("c")) + lit(tele)).as("r"))
        .select(col("dst").as("node"), col("r"))
        // cut lineage each round: the plan stays one join+agg deep
        // instead of compounding 10 shuffle stages into one DAG
        .localCheckpoint()
      i += 1
    }
    // vertex degrees re-read the checkpointed edge frame, not the
    // base edge build
    ranks.join(e.select(col("src"), col("deg")).distinct(),
        col("node") === col("src"))
      .select(col("node"), col("deg"), col("r").as("rank_units"),
        // raw division of exact longs by a constant — bit-identical
        (col("r") / (M * 1.0)).as("share"))
      .orderBy(col("node"))
  }

  /** q148: PageRank over the co-purchase part graph (10 integer
   *  iterations, damping 0.85). Edge build: distinct (order, part)
   *  pairs self-joined on the order key — Σ_o C(items_o, 2) pairs,
   *  bounded by the order-size distribution, never parts². */
  def q148PageRank(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d).select(col("l_orderkey").as("ok"),
      col("l_partkey").as("pk")).distinct()
    val edges = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
      .select(col("a.pk").as("src"), col("b.pk").as("dst"))
      .distinct()
    pageRank(edges)
      .select(col("node").as("part_id"), col("deg"), col("rank_units"), col("share"))
  }

  /** Oracle: the identical integer iteration replayed as a recursive
   *  CTE (one self-reference, grouped recursive arm — the q125
   *  technique at vertex scale). */
  val q148Sql: String =
    """WITH RECURSIVE
      |li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |e0 AS (
      |  SELECT DISTINCT a.pk AS src, b.pk AS dst
      |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk),
      |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e0 GROUP BY src),
      |e AS (SELECT e0.src, e0.dst, d.deg FROM e0 JOIN deg d USING (src)),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
      |it(k, node, r) AS (
      |  SELECT 0, src, CAST(1000000000000 // n.n AS BIGINT) FROM deg, n
      |  UNION ALL
      |  SELECT it.k + 1, e.dst,
      |   CAST(1000000000000 * 15 // (100 * min(n.n))
      |        + sum(it.r * 85 // (100 * e.deg)) AS BIGINT)
      |  FROM it JOIN e ON it.node = e.src CROSS JOIN n
      |  WHERE it.k < 10
      |  GROUP BY it.k + 1, e.dst)
      |SELECT it.node AS part_id, d.deg, it.r AS rank_units,
      | it.r * 1.0 / 1000000000000 AS share
      |FROM it JOIN deg d ON it.node = d.src
      |WHERE it.k = 10 ORDER BY part_id""".stripMargin
}
