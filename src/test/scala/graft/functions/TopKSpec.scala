package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("partial merges across partitions keep the exact global top-k") {
    TopK.register(spark)
    val rnd = new scala.util.Random(7)
    val data = (1L to 10000L).map(p => (rnd.nextLong(1000000L), p))
    val expected = data.sortBy { case (v, p) => (-v, p) }.take(5)
    val got = data.toDF("v", "p").repartition(16)
      .agg(TopK.topk(col("v"), col("p"), 5).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.v"), col("e.payload")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("ties break on smaller payload; nulls are skipped; SQL surface works") {
    TopK.register(spark)
    val got = Seq((10L, 3L), (10L, 1L), (10L, 2L), (5L, 9L))
      .toDF("v", "p").repartition(3)
      .agg(TopK.topk(col("v"), col("p"), 2).as("top"))
      .select(explode(col("top")).as("e"))
      .select(col("e.payload")).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 2L))
    Seq((1L, Option.empty[Long]), (2L, Some(7L))).toDF("v", "p")
      .createOrReplaceTempView("tk_in")
    val viaSql = spark.sql("SELECT graft_topk(v, p, 3) FROM tk_in").head.getSeq[Any](0)
    assert(viaSql.size == 1) // null payload row skipped
  }

  test("serialize round-trips and prunes to capacity") {
    val agg = TopK(
      org.apache.spark.sql.catalyst.expressions.Literal(1L),
      org.apache.spark.sql.catalyst.expressions.Literal(2L), 3)
    val buf = agg.createAggregationBuffer()
    (1L to 10L).foreach(i => buf += ((i, i)))
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.size == 3 && back.map(_._1).toSet == Set(10L, 9L, 8L))
  }
}
