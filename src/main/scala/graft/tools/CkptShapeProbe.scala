package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** One-question probe: does a localCheckpoint'd frame RETAIN its
 *  hash partitioning and sort order, so an iterated equi-join against
 *  it skips the per-round Exchange+Sort on the big side? Decides the
 *  q148/q165 edge-frame layout (pre-partition+sort once vs pay a
 *  full SMJ sort of ~10⁸ rows every iteration). */
object CkptShapeProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("8")
    // force the 100×-octave shape: ranks are ~10⁷ rows there, far past
    // any broadcast threshold, so the per-round join is SMJ/SHJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val e = spark.range(100000).select((col("id") % 1000).as("src"),
      (col("id") % 777).as("dst"), lit(3L).as("c"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("wdeg"))
    val base = e.join(deg, "src")
    val ca = base.localCheckpoint(eager = true, StorageLevel.DISK_ONLY)
    val cb = base.repartition(col("src")).sortWithinPartitions(col("src"))
      .localCheckpoint(eager = true, StorageLevel.DISK_ONLY)
    val ranks = e.select(col("src").as("node")).distinct()
      .select(col("node"), lit(100L).as("r"))
    def round(edge: DataFrame): DataFrame =
      edge.join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("r * 85 * c div (100 * wdeg)").as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("r2"))
    def shape(df: DataFrame, tag: String): Unit = {
      val p = df.queryExecution.executedPlan.toString
      println(s"[probe] $tag exchanges=${"Exchange".r.findAllIn(p).size} " +
        s"sorts=${"Sort ".r.findAllIn(p).size}")
      println(p.linesIterator.map("[probe]   " + _).take(25).mkString("\n"))
    }
    shape(round(ca), "plain-ckpt")
    shape(round(cb), "partitioned-sorted-ckpt")
    val cc = base.repartition(col("src")).sortWithinPartitions(col("src"))
      .persist(StorageLevel.DISK_ONLY)
    cc.count() // materialize
    shape(round(cc), "persisted-partitioned-sorted")
    round(cc).collect()
    println("[probe] done")
    spark.stop()
  }
}
