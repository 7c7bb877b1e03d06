package graft.tools

import graft.ops.{SparseSim, Tables}

/** Prune diagnostics for the q135 cosine join: candidate pairs under
  * the prefix filter vs the corpus×corpus pair count, plus timings.
  * Usage: runMain graft.tools.SparseProbe [sfDir] */
object SparseProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val docs = Tables.documents(spark, d)
    val n = docs.count()
    var t0 = System.nanoTime()
    val cand = SparseSim.candidateCount(docs)
    println(f"[sparseprobe] n=$n pairs=${n * (n - 1) / 2} candidates=$cand " +
      f"(${cand * 2.0 / (n * (n - 1)) * 100}%.1f%% of brute) " +
      f"candgen=${(System.nanoTime() - t0) / 1e9}%.1f s")
    t0 = System.nanoTime()
    val out = SparseSim.q135CosineJoin(spark, d).count()
    println(f"[sparseprobe] result_pairs=$out full=${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
