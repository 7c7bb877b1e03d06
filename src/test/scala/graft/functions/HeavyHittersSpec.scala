package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HeavyHittersSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("exact when capacity exceeds cardinality; works via SQL too") {
    HeavyHitters.register(spark)
    val df = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c") ++ Seq.fill(5)("d")
    val out = df.toDF("t").repartition(4)
      .agg(HeavyHitters.heavy_hitters(col("t"), 3, 100).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.item"), col("e.cnt")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("a", 50L), ("b", 30L), ("c", 20L)))

    df.toDF("t").createOrReplaceTempView("hh_toks")
    val viaSql = spark.sql(
      "SELECT graft_heavy_hitters(t, 2, 100) FROM hh_toks").head.getSeq[Any](0)
    assert(viaSql.size == 2)
  }

  test("space-saving under eviction: counts over-estimate, never under, and the true heavy hitter survives") {
    HeavyHitters.register(spark)
    // heavy item + long tail wider than capacity
    val data = Seq.fill(500)("HOT") ++ (1 to 200).flatMap(i => Seq.fill(2)(s"tail$i"))
    val out = data.toDF("t").repartition(8)
      .agg(HeavyHitters.heavy_hitters(col("t"), 5, 64).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.item"), col("e.cnt")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.head._1 == "HOT")
    assert(out.head._2 >= 500L) // space-saving never under-counts
  }

  test("serialize/deserialize round-trips the buffer") {
    val agg = HeavyHitters(org.apache.spark.sql.catalyst.expressions.Literal("x"), 3, 10)
    val buf = agg.createAggregationBuffer()
    buf.update("alpha", 5L); buf.update("β", 2L)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back == buf)
  }
}
