package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Hand-sized fixtures for the round-11 additions: q183's distributed
  * integer Lloyd, q184's personalized PageRank and q185's 2-hop
  * neighbor sampling (the sf0.01 + 10× gates hash-compare all three
  * against DuckDB; these pin the primitives on inputs small enough to
  * verify by hand). */
class ClusterPprSageSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def sym(es: Seq[(Long, Long)]): Seq[(Long, Long)] =
    es.flatMap { case (a, b) => Seq((a, b), (b, a)) }

  test("kmeansAssign: two separated blobs resolve to their own clusters") {
    // blob A around (1,1), blob B around (101,101); seeds = two
    // smallest vec_ids, one planted in each blob
    val pts = Seq(
      (1L, Seq(0L, 0L)), (2L, Seq(100L, 100L)),
      (3L, Seq(2L, 0L)), (4L, Seq(102L, 100L)),
      (5L, Seq(0L, 2L)), (6L, Seq(100L, 102L)),
      (7L, Seq(2L, 2L)), (8L, Seq(102L, 102L)),
      (9L, Seq(1L, 1L)), (10L, Seq(101L, 101L)))
    val out = Cluster.kmeansAssign(pts.toDF("vec_id", "cv"), k = 2,
        rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byId = out.map(t => t._1 -> t._2).toMap
    assert(Seq(1L, 3L, 5L, 7L, 9L).forall(byId(_) == 0L))
    assert(Seq(2L, 4L, 6L, 8L, 10L).forall(byId(_) == 1L))
    // converged centroid A = floored mean (1,1): dist²((0,0)) = 2
    val d1 = out.find(_._1 == 1L).get._3
    assert(d1 == 2L)
    val d9 = out.find(_._1 == 9L).get._3
    assert(d9 == 0L)
  }

  test("kmeansAssign: centroid update floors toward -inf on negative sums") {
    // one cluster over (-3,0) and (-4,0): mean -3.5 must floor to -4
    // (Math.floorDiv ≡ the oracle's sign-safe (s-((s%n)+n)%n)/n), so
    // dist²((-3,0)) = 1 — a truncating divide would give centroid -3
    // and dist 0
    val pts = Seq((1L, Seq(-3L, 0L)), (2L, Seq(-4L, 0L)))
    val out = Cluster.kmeansAssign(pts.toDF("vec_id", "cv"), k = 1,
        rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 1L, 2L -> 0L))
  }

  test("personalizedPageRank: one hand-replayed round on the 4-cycle") {
    // 1-2-3-4-1, seed {1}, 1 iteration. r0 = (M,0,0,0); each push is
    // floor(M·85/(100·2)) = 425e9 to both neighbors; teleport
    // M·15/100 = 150e9 lands ONLY on the seed.
    val e = sym(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
      .toDF("src", "dst")
    val out = Graph.personalizedPageRank(e, Seq(1L).toDF("pk"),
        iterations = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4)))
    val ranks = out.map(t => t._1 -> t._2).toMap
    assert(ranks == Map(1L -> 150000000000L, 2L -> 425000000000L,
      3L -> 0L, 4L -> 425000000000L))
    val seeds = out.map(t => t._1 -> t._3).toMap
    assert(seeds == Map(1L -> 1L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
  }

  test("personalizedPageRank: mass stays near the seed, global rank does not") {
    // path 1-2-3-4-5-6 seeded at {1}: PPR must rank node 1 first;
    // global PageRank ranks the path's middle above its ends
    val e = sym((1L to 5L).map(i => (i, i + 1))).toDF("src", "dst")
    val ppr = Graph.personalizedPageRank(e, Seq(1L).toDF("pk"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(ppr(1L) == ppr.values.max)
    assert(ppr(2L) > ppr(4L) && ppr(4L) > ppr(6L))
  }

  test("neighborSample2Hop: fan bounds, hash-rank order, edge validity") {
    // star around 1 (leaves 2..6) + leaf-leaf edge 2-3
    val edges = sym(Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L),
      (2L, 3L)))
    val e = edges.toDF("src", "dst")
    val out = Graph.neighborSample2Hop(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // ranks within fan bounds
    assert(out.forall(t => t._2 >= 1 && t._2 <= Graph.SageFan1))
    assert(out.forall(t => t._4 >= 1 && t._4 <= Graph.SageFan2))
    // ≤ S1·S2 rows per root
    val perRoot = out.groupBy(_._1).view.mapValues(_.length)
    assert(perRoot.values.forall(_ <= Graph.SageFan1 * Graph.SageFan2))
    // every sampled hop is a real edge
    val eset = edges.toSet
    assert(out.forall(t => eset.contains((t._1, t._3))))
    assert(out.forall(t => eset.contains((t._3, t._5))))
    // node 1's hop-1 sample = its 3 neighbors of smallest (h, dst) —
    // recompute the keyed hash here and compare
    def h(a: Long, b: Long): Long =
      ((a % Graph.SageMod) * 1000003L + (b % Graph.SageMod) * 7919L) %
        Graph.SageMod
    val expected = Seq(2L, 3L, 4L, 5L, 6L)
      .sortBy(n => (h(1L, n), n)).take(Graph.SageFan1).toSet
    val sampled1 = out.filter(_._1 == 1L).map(_._3).toSet
    assert(sampled1 == expected)
  }

  test("neighborSample2Hop is deterministic across partitionings") {
    val g = sym(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)))
    val a = Graph.neighborSample2Hop(g.toDF("src", "dst").repartition(1))
      .collect().toSeq
    val b = Graph.neighborSample2Hop(g.toDF("src", "dst").repartition(7))
      .collect().toSeq
    assert(a == b)
  }
}
