package graft.ops

import java.nio.file.Files

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = pre-paid shuffle: tables bucketed on the join key
  * co-locate matching rows, so repeated fact⋈fact joins run with NO
  * Exchange — the 100 TB pattern for hot join keys (SURVEY.md §2.6,
  * "repartition/bucketing for co-located joins"). */
class BucketingSpec extends AnyFunSuite with SparkSuite {

  test("bucketed fact tables join without a shuffle and match the plain join") {
    val d = "/root/testdata/sf0.001"
    val loc = Files.createTempDirectory("graftbuckets")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_bkt LOCATION '$loc'")
    try {
      val li = spark.read.parquet(s"$d/lineitem.parquet")
      val o = spark.read.parquet(s"$d/orders.parquet")
      li.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("graft_bkt.lineitem_b")
      o.write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("graft_bkt.orders_b")

      val joined = spark.table("graft_bkt.lineitem_b")
        .join(spark.table("graft_bkt.orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))

      // disable broadcast so the join strategy is the bucketed SMJ
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val plan = joined.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), plan.take(300))
        // the ONLY exchange is the final aggregation, not the join
        val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
        assert(!joinPart.contains("Exchange hashpartitioning"),
          "bucketed join still shuffles:\n" + joinPart.take(600))

        val expected = li.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
        assert(joined.exceptAll(expected).count() == 0)
        assert(expected.exceptAll(joined).count() == 0)
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
    } finally {
      spark.sql("DROP DATABASE IF EXISTS graft_bkt CASCADE")
    }
  }
}
