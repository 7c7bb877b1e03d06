package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Oracle-gated recall bounds for the approximate operators whose raw
 * outputs are engine-specific (rows-only checked): q22 banded
 * MinHash, q24 SimHash, q27 LSH kNN, q37 IVF kNN.
 *
 * Their hashing can't be reproduced in ANSI SQL, but their QUALITY
 * can be gated: each component row states whether the approximate
 * result clears a fixed recall floor against the exact baseline
 * computed in the same engine run. The oracle is the all-true VALUES
 * list — if recall ever regresses below a floor, the Spark side emits
 * `false` and the driver's hash compare goes red. Floors match the
 * OpsInvariantsSpec assertions (ANN: ≥0.4 LSH / ≥0.2 IVF top-5
 * overlap; dedup: zero missed exact pairs ≥ threshold).
 *
 * All comparisons are lazy joins over tiny result sets (tens of
 * rows) — the dominant cost is the underlying operators themselves.
 */
object RecallGates {

  def q61ApproxRecall(s: SparkSession, d: String): DataFrame = {
    val brute = Similarity.q26KnnBrute(s, d).select(col("qid"), col("nid"))

    // |approx ∩ exact| / |exact| over all (query, top-5 neighbor) rows
    def annOk(name: String, approx: DataFrame, minRecall: Double): DataFrame = {
      val hits = brute
        .join(approx.select(col("qid"), col("nid")), Seq("qid", "nid"), "left_semi")
        .agg(count(lit(1)).as("hits"))
      val tot = brute.agg(count(lit(1)).as("tot"))
      hits.crossJoin(tot).select(lit(name).as("component"),
        (col("tot") > 0 && col("hits") >= col("tot") * minRecall).as("ok"))
    }

    // every exact near-dup pair (above the stated floor) must appear
    // among the approximate pairs — banding is allowed extra
    // candidates (verification prunes them) but never a miss
    val exact = Dedup.q23NgramJaccard(s, d)
    def dedupOk(name: String, exactPairs: DataFrame, approx: DataFrame): DataFrame = {
      val missed = exactPairs
        .join(approx.select(col("doc_a"), col("doc_b")), Seq("doc_a", "doc_b"), "left_anti")
        .agg(count(lit(1)).as("missed"))
      val tot = exactPairs.agg(count(lit(1)).as("tot"))
      missed.crossJoin(tot).select(lit(name).as("component"),
        (col("tot") > 0 && col("missed") === 0).as("ok"))
    }

    annOk("ivf_knn", Similarity.q37KnnIvf(s, d), 0.2)
      .union(annOk("lsh_knn", Similarity.q27KnnLsh(s, d), 0.4))
      .union(dedupOk("minhash_lsh",
        exact.select(col("doc_a"), col("doc_b")),
        Dedup.q22MinHashLsh(s, d)))
      .union(dedupOk("simhash",
        // SimHash approximates term-set cosine, not Jaccard: only the
        // near-exact (≥0.9) pairs are guaranteed under the Hamming cut
        exact.filter(col("jaccard") >= 0.9).select(col("doc_a"), col("doc_b")),
        Dedup.q24SimHash(s, d)))
      .orderBy(col("component"))
  }

  val q61Sql: String =
    """SELECT * FROM (VALUES
      | ('ivf_knn', true), ('lsh_knn', true),
      | ('minhash_lsh', true), ('simhash', true)
      |) t(component, ok) ORDER BY component""".stripMargin
}
