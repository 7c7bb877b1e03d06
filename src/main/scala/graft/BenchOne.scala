package graft

/** Times one registered query N times — the focused companion to
 *  [[Bench]] for iterating on a single operator without paying the
 *  full-suite wall clock. Prints one line per run (no min-taking:
 *  per-run visibility is the point; warm-cache effects show up as
 *  run1 vs run2 deltas). Usage: runMain graft.BenchOne <name> [sfDir] [runs]. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: runMain graft.BenchOne <queryName> [sfDir] [runs]"))
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[benchone] $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    graft.ops.InferOps.cleanupScratch()
    spark.stop()
  }
}
