package graft.ops

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Measures the q114 candidate stage in isolation: the executed plan
 *  of the matched→distinct exchange (is the map-side partial
 *  aggregate present, and how much does it dedup?) plus the
 *  per-exchange row counts the round-13 verdict asked to cut.
 *  Usage: runMain graft.tools.PrefixJoinProbe [sfDir] */
object PrefixJoinProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val docs = Tables.documents(spark, d)
    val sh = Dedup.shingleRows(docs)
      .select(col("doc_id"),
        xxhash64(col("s")).as("k1"), xxhash64(col("s"), lit(1)).as("k2"))
      .localCheckpoint()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val cand = Dedup.prefixCandidatePairs(sh, sizes, 0.6, positional = true)
    cand.write.format("noop").mode("overwrite").save()
    println("=== candidate-stage executed plan (post-AQE) ===")
    println(cand.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
