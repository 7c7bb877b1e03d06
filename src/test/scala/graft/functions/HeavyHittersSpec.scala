package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HeavyHittersSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("exact when capacity exceeds cardinality: evicted=false, all err=0; works via SQL too") {
    HeavyHitters.register(spark)
    val df = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c") ++ Seq.fill(5)("d")
    val row = df.toDF("t").repartition(4)
      .agg(HeavyHitters.heavy_hitters(col("t"), 3, 100).as("r"))
      .select(col("r.evicted").as("evicted"), explode(col("r.top")).as("e"))
      .select(col("evicted"), col("e.item"), col("e.cnt"), col("e.err"))
      .collect()
    assert(row.forall(!_.getBoolean(0)), "no eviction can fire under capacity")
    assert(row.forall(_.getLong(3) == 0L), "eviction-free counters carry zero error")
    assert(row.map(r => (r.getString(1), r.getLong(2))).toSeq ==
      Seq(("a", 50L), ("b", 30L), ("c", 20L)))

    df.toDF("t").createOrReplaceTempView("hh_toks")
    val viaSql = spark.sql(
      "SELECT graft_heavy_hitters(t, 2, 100).top FROM hh_toks").head.getSeq[Any](0)
    assert(viaSql.size == 2)
  }

  test("space-saving under eviction: evicted=true, counts bracket the truth, the true heavy hitter survives") {
    HeavyHitters.register(spark)
    // heavy item + long tail wider than capacity
    val data = Seq.fill(500)("HOT") ++ (1 to 200).flatMap(i => Seq.fill(2)(s"tail$i"))
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rows = data.toDF("t").repartition(8)
      .agg(HeavyHitters.heavy_hitters(col("t"), 5, 64).as("r"))
      .select(col("r.evicted").as("evicted"), explode(col("r.top")).as("e"))
      .select(col("evicted"), col("e.item"), col("e.cnt"), col("e.err"))
      .collect()
      .map(r => (r.getBoolean(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.forall(_._1), "capacity 64 over 201 distinct items must saturate")
    assert(rows.head._2 == "HOT")
    rows.foreach { case (_, item, cnt, err) =>
      val t = truth.getOrElse(item, 0L)
      assert(cnt >= t, s"$item: estimate $cnt under-counts true $t")
      assert(cnt - err <= t, s"$item: floor ${cnt - err} exceeds true $t")
    }
  }

  test("q187 contract on the documents table: bracket + saturation flag + true-top-1 containment") {
    // sf0.01, not sf0.001: the approximate contract must be EXERCISED,
    // and saturation needs a vocabulary wider than HhApproxCapacity's
    // counters
    val d = "/root/testdata/sf0.01"
    val approx = graft.ops.TextAnalysis.q187ApproxHeavyHitters(spark, d).collect()
    assert(approx.nonEmpty)
    // exact truth from the two-shuffle groupBy over the same tokens
    val truth = graft.ops.Tables.documents(spark, d)
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // read the REAL constant: a capacity change must move this test's
    // N/capacity containment math with it, not silently desynchronize
    val cap = graft.ops.TextAnalysis.HhApproxCapacity
    assert(truth.size > cap,
      s"fixture assumption: sf0.01 vocabulary ${truth.size} must exceed capacity $cap")
    assert(approx.forall(_.getBoolean(5)),
      s"capacity $cap under a ${truth.size}-token vocabulary must saturate — " +
        "the approximate path must be EXERCISED")
    approx.foreach { r =>
      val (tok, est, err) = (r.getString(0), r.getLong(1), r.getLong(2))
      val t = truth.getOrElse(tok, 0L)
      assert(est >= t, s"$tok: estimate $est under-counts true $t")
      assert(est - err <= t, s"$tok: floor ${est - err} exceeds true $t")
    }
    // space-saving guarantees any item with true freq > N/capacity is
    // tracked — asserted in its real (conditional) form: on this
    // near-uniform 31-token pool no item clears N/16, so the clause is
    // vacuous at sf0.01 but ARMS on any skewed corpus (and the bracket
    // above is what bounds every estimate regardless)
    val n = truth.values.sum
    val guaranteed = truth.filter { case (_, c) => c > n / cap }.keySet
    val emitted = approx.map(_.getString(0)).toSet
    guaranteed.foreach { g =>
      assert(emitted.contains(g) || guaranteed.size > approx.length,
        s"guaranteed hitter $g (true ${truth(g)} > N/$cap = ${n / cap}) missing")
    }
  }

  test("serialize/deserialize round-trips the buffer including the eviction flag") {
    val agg = HeavyHitters(org.apache.spark.sql.catalyst.expressions.Literal("x"), 3, 10)
    val buf = agg.createAggregationBuffer()
    buf.m.update("alpha", (5L, 0L)); buf.m.update("β", (2L, 1L))
    buf.evicted = true
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.m == buf.m && back.evicted == buf.evicted)
  }
}
