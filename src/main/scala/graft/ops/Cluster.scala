package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Distributed clustering over the embedding corpus — the full-data
 * complement of `Similarity.fitCodebook`: that fit runs Lloyd on a
 * bounded driver sample (the IVF codebook discipline); here every
 * round's ASSIGNMENT and UPDATE are distributed over the whole corpus,
 * the shape a curation pipeline needs when cluster populations — not
 * just centroid positions — drive downstream decisions (cluster-
 * balanced sampling, SemDeDup-style per-cluster pruning, topic
 * shards). This is exactly Spark MLlib's KMeans execution shape: per
 * round one corpus scan computes argmin against k broadcast centroids
 * (k·d literal ints folded into whole-stage codegen — no join, no
 * shuffle on the big side) and one map-side-combined hash aggregate
 * over k groups re-derives the centroids; the only driver traffic is
 * the k×(d+1) aggregate result (the bounded-collect codebook
 * discipline, k·d = 512 longs here).
 *
 * Determinism (cross-engine, iteration-proof): embeddings snap to an
 * integer grid (floor(x·10⁶) — float→double widening and the double
 * multiply are IEEE-identical in both engines, the q155 lesson), the
 * k seeds are the k smallest vec_ids' code vectors, assignment is
 * argmin of the exact integer squared distance with ties to the
 * smallest centroid id (max/least-struct ≡ row_number, the q181
 * device), and the centroid update is the FLOORED integer mean
 * computed as (s − ((s mod n) + n) mod n) / n — truncated `%` has the
 * same semantics in Spark and DuckDB, so the expression is floor-
 * division in both even for negative sums (Math.floorDiv on the
 * driver). An emptied cluster keeps its previous centroid (the
 * `lloyd` rule). No doubles exist anywhere in the loop, so
 * `KmRounds` rounds replay bit-identically in the oracle's unrolled
 * MATERIALIZED CTE chain (the q168/q181 discipline).
 *
 * Overflow: |x| ≤ 0.58 in this corpus so |code| < 10⁶, per-dim
 * (x−c)² < 4·10¹² and the 64-dim sum < 2.6·10¹⁴; the update sum is
 * bounded by 10⁶·|corpus| ≈ 5·10¹¹ at the 100× octave — all inside
 * int64 with ≥400× headroom (ScaleGen copies shift vec_ids; values
 * stay within ±3% of copy 0 — the per-copy perturbation — so
 * |code| < 1.03·10⁶ and every bound above still holds).
 *
 * Reference: diepy has no clustering; this extends the training-data
 * curation surface (SemDeDup §3 clusters before intra-cell dedup).
 */
object Cluster {
  import Tables._

  /** Cluster count (codebook-sized: k·d collect stays bounded). */
  private[ops] val KmK = 8
  /** Lloyd update rounds (each = one assignment pass + one update). */
  private[ops] val KmRounds = 4
  /** Float → integer grid scale (q155's exact-widening discipline). */
  private[ops] val KmScale = 1000000.0

  /** Integer code vectors: (vec_id, cv: array<long>). */
  private[ops] def kmCodes(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast("double") * lit(KmScale))).as("cv"))

  /** Exact integer argmin over the k driver-held centroids: a
   *  least-of-structs over k codegen'd fold expressions — ties break
   *  to the smallest centroid id (struct compare ≡ the oracle's
   *  row_number(d2, cid)). */
  private[ops] def bestOf(cents: Array[Array[Long]]): Column =
    cents.zipWithIndex.map { case (c, cid) =>
      val d2 = aggregate(
        zip_with(col("cv"), typedLit(c.toSeq), (x, v) => (x - v) * (x - v)),
        lit(0L), (acc, t) => acc + t)
      struct(d2.as("d2"), lit(cid.toLong).as("cid"))
    }.reduce(least(_, _))

  /** q183: distributed integer k-means over the embedding corpus —
   *  `KmRounds` Lloyd rounds from the k-smallest-vec_id seeds, then
   *  the final assignment: (vec_id, cluster, dist_sq), all exact
   *  integers. Per round: one corpus scan (assignment folded into
   *  codegen against literal centroids) + one k-group hash aggregate
   *  of d per-dimension sums (map-side combined — the shuffle carries
   *  k·(d+2) longs per task, nothing data-sized). */
  def q183KmeansAssign(s: SparkSession, d: String): DataFrame =
    kmeansAssign(kmCodes(s, d), KmK, KmRounds)

  /** The distributed Lloyd core over a (vec_id, cv: array<long>)
   *  frame — exposed for fixture specs. */
  private[ops] def kmeansAssign(codeFrame: DataFrame, k: Int,
      rounds: Int): DataFrame = {
    val codes = codeFrame.persist(StorageLevel.DISK_ONLY)
    val seeds = codes.orderBy(col("vec_id")).limit(k).collect()
    if (seeds.isEmpty) {
      // nothing to iterate — release the cache before returning (the
      // lazy result recomputes from lineage if ever evaluated)
      codes.unpersist(false)
      return codes.select(col("vec_id"), lit(0L).as("cluster"),
        lit(0L).as("dist_sq"))
    }
    var cents: Array[Array[Long]] =
      seeds.map(_.getSeq[Long](1).toArray)
    val dim = cents.head.length
    val sumCols = (0 until dim).map(i =>
      sum(element_at(col("cv"), i + 1)).as(s"s$i"))
    var r = 0
    while (r < rounds) {
      val assigned = codes.select(col("cv"),
        bestOf(cents).getField("cid").as("cluster"))
      // k rows × (d+1) cols — the bounded codebook collect
      val upd = assigned.groupBy(col("cluster"))
        .agg(count(lit(1)).as("n"), sumCols: _*)
        .collect()
        .map(row => row.getLong(0).toInt ->
          Array.tabulate(dim)(i => Math.floorDiv(row.getLong(i + 2),
            row.getLong(1))))
        .toMap
      // an emptied cluster keeps its centroid (the lloyd rule)
      cents = Array.tabulate(cents.length)(cid =>
        upd.getOrElse(cid, cents(cid)))
      r += 1
    }
    // the cache served its purpose (seed collect + `rounds` scans +
    // `rounds` updates); release it NOW rather than letting a
    // corpus-sized DISK_ONLY block sit in scratch for the rest of a
    // 185-query session — the one remaining consumer (the final
    // assignment scan below) recomputes the map-only projection from
    // the parquet source at essentially the same cost as the disk read
    codes.unpersist(false)
    val best = bestOf(cents)
    codes.select(col("vec_id"), best.getField("cid").as("cluster"),
        best.getField("d2").as("dist_sq"))
      .orderBy(col("vec_id"))
  }

  /** Oracle: the identical integer Lloyd replayed as an unrolled
   *  MATERIALIZED CTE chain over the long-format (vec_id, dim, x)
   *  frame — assignment = row_number(d2, cid), update = the same
   *  sign-safe floored integer mean, emptied clusters coalesce to
   *  the previous round's centroid. */
  val q183Sql: String = {
    val scale = KmScale.toLong
    val rounds = (1 to KmRounds).map { r =>
      s"""a$r AS MATERIALIZED (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |     row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
         |    FROM (SELECT lf.vec_id, c.cid,
         |           sum((lf.x - c.v) * (lf.x - c.v)) AS d2
         |          FROM lf JOIN c${r - 1} c USING (dim) GROUP BY 1, 2))
         |  WHERE rn = 1),
         |m$r AS MATERIALIZED (
         |  SELECT a.cid, lf.dim,
         |   CAST((sum(lf.x) - ((sum(lf.x) % count(*)) + count(*)) % count(*))
         |        // count(*) AS BIGINT) AS v
         |  FROM a$r a JOIN lf USING (vec_id) GROUP BY 1, 2),
         |c$r AS MATERIALIZED (
         |  SELECT p.cid, p.dim, coalesce(m.v, p.v) AS v
         |  FROM c${r - 1} p LEFT JOIN m$r m ON m.cid = p.cid AND m.dim = p.dim)""".stripMargin
    }.mkString(",\n")
    s"""WITH emb AS MATERIALIZED (
       |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
       |          x -> CAST(floor(x * $scale.0) AS BIGINT)) AS cv
       |  FROM embeddings),
       |dims AS (SELECT unnest(range(1,
       |  (SELECT CAST(max(len(cv)) AS BIGINT) FROM emb) + 1)) AS dim),
       |lf AS MATERIALIZED (
       |  SELECT vec_id, dim, cv[dim] AS x FROM emb CROSS JOIN dims),
       |seed AS (
       |  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid
       |  FROM (SELECT vec_id FROM emb ORDER BY vec_id LIMIT $KmK)),
       |c0 AS MATERIALIZED (
       |  SELECT s.cid, lf.dim, lf.x AS v FROM seed s JOIN lf USING (vec_id)),
       |$rounds
       |SELECT vec_id, cid AS cluster, CAST(d2 AS BIGINT) AS dist_sq FROM (
       |  SELECT vec_id, cid, d2,
       |   row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
       |  FROM (SELECT lf.vec_id, c.cid, sum((lf.x - c.v) * (lf.x - c.v)) AS d2
       |        FROM lf JOIN c$KmRounds c USING (dim) GROUP BY 1, 2))
       |WHERE rn = 1 ORDER BY vec_id""".stripMargin
  }
}
