package graft.ops

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Prints the executed plan of ONE broadcast-ranks rescan round — the
 *  1000× tier died twice on edge-volume per-round shuffles, so this
 *  pins whether the vertex-frame broadcast hint actually survives to
 *  a BroadcastHashJoin (and what the dst aggregate exchanges).
 *  Usage: runMain graft.ops.GraphTierProbe [sfDir] */
object GraphTierProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val edges = Graph.coPurchaseStrength(spark, d).select(col("src"), col("dst"))
    println(s"=== chunked build: ${Graph.chunkedBuild(d)} ===")
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val n = deg.count()
    val ranks = deg.select(col("src").as("node"), lit(1000000L).as("r"))
      .localCheckpoint()
    val rw = broadcast(ranks.join(deg, col("node") === col("src"))
      .select(col("node"), col("r"), col("deg")))
    val round = edges.join(rw, col("src") === col("node"))
      .select(col("dst"), expr("r * 85 div (100 * deg)").as("c"))
      .groupBy(col("dst"))
      .agg(sum(col("c")).as("r"))
    round.write.format("noop").mode("overwrite").save()
    println(s"=== one rescan round (n=$n) executed plan ===")
    println(round.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
