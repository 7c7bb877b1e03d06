package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite with SparkSuite {

  private val d = "/root/testdata/sf0.01"

  /** Per-file (minA, minB) envelope corners for a parquet layout. */
  private def fileEnvelopes(df: DataFrame): Seq[(Long, Long)] =
    df.groupBy(input_file_name().as("f"))
      .agg(min(col("l_partkey")).as("pmin"), min(col("l_suppkey")).as("smin"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq

  test("z-order layout prunes the 2-D box to few file envelopes; random layout cannot") {
    val li = Tables.lineitem(spark, d)
    val (pMax, sMax) = {
      val r = li.agg(max(col("l_partkey")), max(col("l_suppkey"))).head
      (r.getLong(0), r.getLong(1))
    }
    // box = lowest 1/8 of partkeys × lowest 1/4 of suppkeys; a file
    // can contain matches only if BOTH its minima fall inside
    val (pB, sB) = (pMax / 8, sMax / 4)

    val zDir = InferOps.tmpPath("zspec_z", d)
    ZOrder.writeZOrdered(li, "l_partkey", "l_suppkey", zDir, 16)
    val zEnv = fileEnvelopes(spark.read.parquet(zDir))
    val zHits = zEnv.count { case (p, s) => p <= pB && s <= sB }

    val rDir = InferOps.tmpPath("zspec_r", d)
    li.repartition(16).write.mode("overwrite").parquet(rDir)
    val rEnv = fileEnvelopes(spark.read.parquet(rDir))
    val rHits = rEnv.count { case (p, s) => p <= pB && s <= sB }

    // the z-curve concentrates the box into a corner of the file
    // order; a random layout spreads it over every file
    assert(zEnv.size == 16 && rEnv.size == 16, s"${zEnv.size}/${rEnv.size} files")
    assert(zHits <= 5, s"z-order: $zHits of 16 file envelopes intersect the box")
    assert(rHits >= 12, s"random: only $rHits of 16 files intersect — baseline invalid")
    // and the layout is lossless
    assert(spark.read.parquet(zDir).count() == li.count())
  }

  test("q82 from the z-ordered copy equals the same box query on the source") {
    val fromLayout = ZOrder.q82ZorderLayout(spark, d).collect().toSeq
    val fromSource = Tables.lineitem(spark, d)
      .filter(col("l_partkey") <= 400 && col("l_suppkey") <= 25)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(Tables.cents(col("l_quantity"))).as("qty_cents"))
      .orderBy(col("l_returnflag")).collect().toSeq
    assert(fromLayout == fromSource && fromLayout.nonEmpty)
  }

  test("rank16 survives epoch-micros-wide domains under ANSI (no int64 overflow)") {
    import spark.implicits._
    // a domain wider than 2^47: (c-lo)*65535 would overflow int64 and
    // abort under ANSI if the scaling were done in long arithmetic
    val lo = 0L
    val hi = 1_750_000_000_000_000L // ~2025 in epoch micros
    val ranks = Seq(lo, hi / 2, hi).toDF("t")
      .select(ZOrder.rank16(col("t"), lo, hi).as("r")).as[Long].collect()
    assert(ranks(0) == 0L && ranks(2) == 65535L)
    assert(math.abs(ranks(1) - 32767L) <= 1, s"midpoint rank ${ranks(1)}")
  }

  test("morton spread interleaves bits correctly") {
    import spark.implicits._
    val rows = Seq(0L, 1L, 2L, 3L, 0xFFFFL).toDF("x")
      .select(ZOrder.spread16(col("x")).as("s")).as[Long].collect()
    assert(rows(0) == 0L && rows(1) == 1L && rows(2) == 4L && rows(3) == 5L)
    assert(rows(4) == 0x55555555L) // all 16 bits spread to even positions
  }

  test("autoNumFiles scales with input bytes: floor 16 on small inputs, grows past it") {
    // the provisioned sf0.01 lineitem is far under one 32 MB target -> floor
    assert(ZOrder.autoNumFiles(Tables.lineitem(spark, d)) == 16)
    assert(ZOrder.filesForBytes(0L) == 16)
    assert(ZOrder.filesForBytes(3L * (32L << 20) + 1) == 16) // still under floor
    assert(ZOrder.filesForBytes(40L * (32L << 20)) == 41)    // ~32 MB per file
    assert(ZOrder.filesForBytes(Long.MaxValue / 4) == (1 << 14)) // capped
  }
}
