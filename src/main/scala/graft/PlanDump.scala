package graft

/** Dumps `.explain("formatted")` output for named queries to files —
 *  the round-15 optimization evidence tool (plans/r15/<q>_before.txt /
 *  _after.txt). Building a query's DataFrame may itself run jobs
 *  (iterative operators materialize per-round checkpoints eagerly);
 *  the dumped plan is the returned frame's physical plan, the same
 *  frame the bench noop-writes. Usage:
 *    runMain graft.PlanDump <outDir> <suffix> <name1,name2,...> [sfDir]
 */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[plandump] $name -> $outDir/${name}_$suffix.txt")
    }
    graft.ops.InferOps.cleanupScratch()
    spark.stop()
  }
}
