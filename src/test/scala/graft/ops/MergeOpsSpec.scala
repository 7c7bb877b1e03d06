package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MergeOpsSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("mergeUpsert: batch wins collisions, survivors pass, inserts append") {
    val cur = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val batch = Seq((2L, "B"), (9L, "Z")).toDF("k", "v")
    val out = MergeOps.mergeUpsert(cur, batch, "k")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a", 2L -> "B", 3L -> "c", 9L -> "Z"))
  }

  test("latestPerKey collapses a multi-version CDC feed to the greatest ord per key") {
    val feed = Seq((1L, 1L, "old"), (1L, 3L, "new"), (1L, 2L, "mid"), (2L, 1L, "only"))
      .toDF("k", "seq", "v")
    val out = MergeOps.latestPerKey(feed, "k", "seq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(out == Set((1L, 3L, "new"), (2L, 1L, "only")))
  }

  test("scd2Merge: duplicate batch keys collapse instead of fanning out history") {
    val d0 = java.sql.Date.valueOf("2024-01-01")
    val hist = Seq((1L, "a", d0, null.asInstanceOf[java.sql.Date]))
      .toDF("k", "v", "valid_from", "valid_to")
    // a multi-version CDC feed: three rows for key 1 — must produce
    // exactly one close + one reopen (max value wins), not 3x each leg
    val batch = Seq((1L, "b"), (1L, "d"), (1L, "c")).toDF("k", "v")
    val out = MergeOps.scd2Merge(hist, batch, "k", "v", to_date(lit("2025-06-01")))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), String.valueOf(r.getDate(3)))).toSet
    assert(out == Set((1L, "a", "2025-06-01"), (1L, "d", "null")))
    // and duplicate NEW keys also land once, not once per feed row
    val ins = MergeOps.scd2Merge(hist, Seq((9L, "p"), (9L, "q")).toDF("k", "v"),
      "k", "v", to_date(lit("2025-06-01")))
      .filter(col("k") === 9L).collect()
    assert(ins.length == 1 && ins.head.getString(1) == "q")
  }

  test("scd2Merge: NULL tracked attribute takes the change path, not silent row loss") {
    val d0 = java.sql.Date.valueOf("2024-01-01")
    val hist = Seq((5L, null.asInstanceOf[String], d0, null.asInstanceOf[java.sql.Date]),
      (6L, "x", d0, null.asInstanceOf[java.sql.Date]))
      .toDF("k", "v", "valid_from", "valid_to")
    // batch sets 5 (NULL -> 'x': change) and 6 ('x' -> NULL: change)
    val batch = Seq((5L, "x"), (6L, null.asInstanceOf[String])).toDF("k", "v")
    val out = MergeOps.scd2Merge(hist, batch, "k", "v", to_date(lit("2025-06-01")))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), String.valueOf(r.getDate(3)))).toSet
    assert(out == Set(
      (5L, null, "2025-06-01"), (5L, "x", "null"),
      (6L, "x", "2025-06-01"), (6L, null, "null")))
  }

  test("scd2Merge: change closes+reopens, same-value passes, new key inserts, closed history immutable") {
    val d0 = java.sql.Date.valueOf("2024-01-01")
    val dPre = java.sql.Date.valueOf("2023-01-01")
    val hist = Seq(
      (1L, "x", d0, null.asInstanceOf[java.sql.Date]), // will change
      (2L, "y", d0, null.asInstanceOf[java.sql.Date]), // same value in batch
      (3L, "z", d0, null.asInstanceOf[java.sql.Date]), // not in batch
      (1L, "w", dPre, d0)                              // already-closed version
    ).toDF("k", "v", "valid_from", "valid_to")
    val batch = Seq((1L, "X"), (2L, "y"), (7L, "n")).toDF("k", "v")
    val eff = to_date(lit("2025-06-01"))
    val out = MergeOps.scd2Merge(hist, batch, "k", "v", eff)
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        String.valueOf(r.getDate(2)), String.valueOf(r.getDate(3))))
      .toSet
    assert(out == Set(
      (1L, "w", "2023-01-01", "2024-01-01"), // closed history untouched
      (1L, "x", "2024-01-01", "2025-06-01"), // closed at effective date
      (1L, "X", "2025-06-01", "null"),       // reopened new version
      (2L, "y", "2024-01-01", "null"),       // same value: untouched
      (3L, "z", "2024-01-01", "null"),       // absent from batch: untouched
      (7L, "n", "2025-06-01", "null")))      // brand-new key
  }

  test("aggMerge over a bucketed snapshot: no exchange on the base side, equals full recompute") {
    import java.nio.file.Files
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val d = "/root/testdata/sf0.001"
    val loc = Files.createTempDirectory("graftaggsnap")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_agg LOCATION '$loc'")
    try {
      val orders = spark.read.parquet(s"$d/orders.parquet")
      val split = lit("2000-01-01").cast("timestamp")
      MergeOps.writeAggSnapshot(
        MergeOps.orderAggPartial(orders.filter(col("o_orderdate") < split)),
        "graft_agg.order_rollup")
      val deltaAgg = MergeOps.orderAggPartial(orders.filter(col("o_orderdate") >= split))

      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val merged = MergeOps.aggMerge(spark.table("graft_agg.order_rollup"), deltaAgg)
        val smjs = merged.queryExecution.executedPlan
          .collect { case j: SortMergeJoinExec => j }
        assert(smjs.nonEmpty, merged.queryExecution.executedPlan.toString.take(800))
        // base side = the side whose scan is the bucketed table; it
        // must carry no Exchange (its bucketing IS its partitioning)
        val baseSide = Seq(smjs.head.left, smjs.head.right).find(side =>
          side.collect { case sc: FileSourceScanExec => sc }
            .exists(_.relation.bucketSpec.isDefined))
        assert(baseSide.isDefined, "no bucketed scan under the merge join")
        assert(baseSide.get.collect { case e: ShuffleExchangeExec => e }.isEmpty,
          "base side shuffles:\n" + baseSide.get.toString.take(600))

        val got = merged.orderBy(col("o_custkey")).collect().toSeq
        val expected = MergeOps.orderAggPartial(orders)
          .orderBy(col("o_custkey")).collect().toSeq
        assert(got == expected && got.nonEmpty)
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
    } finally {
      spark.sql("DROP DATABASE IF EXISTS graft_agg CASCADE")
    }
  }

  test("aggMerge handles base-only, delta-only, and overlapping keys") {
    val base = Seq((1L, 2L, 100L), (2L, 1L, 50L)).toDF("o_custkey", "n_orders", "sum_cents")
    val delta = Seq((2L, 3L, 25L), (9L, 1L, 10L)).toDF("o_custkey", "n_orders", "sum_cents")
    val out = MergeOps.aggMerge(base, delta).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 2L, 100L), (2L, 4L, 75L), (9L, 1L, 10L)))
  }
  // ----- point-in-time join (q129) ---------------------------------

  test("q129 PIT join is leakage-free and conserves every order exactly once") {
    val d = "/root/testdata/sf0.001"
    val out = MergeOps.q129PitJoin(spark, d).collect()
    val nOrders = Tables.orders(spark, d).count()
    // conservation: every order matched exactly one dimension version
    assert(out.map(_.getAs[Long]("n_orders")).sum == nOrders)
    // temporal correctness: relabeled (#R) versions are effective from
    // 1998 — their order counts must equal the post-1998 fact count,
    // original segments the pre-1998 count
    val post98 = Tables.orders(spark, d)
      .filter(to_date(col("o_orderdate")) >= to_date(lit("1998-01-01"))).count()
    val (v2, v1) = out.partition(_.getAs[String]("segment").endsWith("#R"))
    assert(v2.map(_.getAs[Long]("n_orders")).sum == post98)
    assert(v1.map(_.getAs[Long]("n_orders")).sum == nOrders - post98)
  }
}
