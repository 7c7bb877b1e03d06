package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture coverage for q125-q127 (the oracle gate covers the
  * provisioned tables; these pin the algebra on hand-computable
  * inputs). */
class VocabStatsSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def eventsDf(path: Seq[String]) =
    path.zipWithIndex.map { case (et, i) => (1L, i.toLong, et) }
      .toDF("user_id", "event_id", "et")
      .select(col("user_id"), col("event_id"),
        to_timestamp(lit("2024-01-01 00:00:00")) + expr("make_interval(0,0,0,0,0,0,event_id)"),
        col("et"))
      .toDF("user_id", "event_id", "ts", "event_type")

  test("stationaryDist: a deterministic 2-cycle settles at the uniform distribution") {
    // path A B A B A → transitions AB:2 BA:2 → p(A→B)=p(B→A)=1
    val out = EventOps.stationaryDist(eventsDf(Seq("A", "B", "A", "B", "A")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet == Set("A", "B"))
    assert(out("A")._1 == 1000000000L && out("B")._1 == 1000000000L)
    assert(out("A")._2 == 0.5 && out("B")._2 == 0.5)
  }

  test("stationaryDist: an absorbing state collects all the mass") {
    // A→B once, then B→B forever: stationary mass concentrates on B
    val out = EventOps.stationaryDist(eventsDf(Seq("A") ++ Seq.fill(9)("B")))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("B") > 0.99)
  }

  test("stationaryDist: a drained chain keeps its reachable state at mass 0, share 0 (not NaN)") {
    // single transition A→B: B is reachable but its only predecessor A
    // is a pure source, so B's mass drains to 0 by iteration 2. The
    // row must survive with mass 0 and share 0.0 — the guarded
    // division — matching the oracle's reachable-set left join.
    val out = EventOps.stationaryDist(eventsDf(Seq("A", "B")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq(("B", 0L, 0.0)))
  }

  test("zipfFit matches an independently computed OLS on the same vocabulary") {
    // freq(w_r) = 2^(7-r) for ranks 1..6 — deterministic vocabulary
    // (words must be pure lowercase-alpha to pass the vocab filter)
    val text = (1 to 6)
      .flatMap(r => Seq.fill(1 << (7 - r))("w" + ("abcdef" (r - 1)).toString))
      .mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val row = VocabStats.zipfFit(docs).collect().head
    assert(row.getAs[Long]("n_terms") == 6L)
    // reference fit computed the same way the operator defines it
    val pts = (1 to 6).map { r =>
      (math.round(math.log(r.toDouble) * 1e6).toDouble,
        math.round(math.log((1 << (7 - r)).toDouble) * 1e6).toDouble)
    }
    val n = pts.length
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(row.getAs[Double]("slope") - slope) < 1e-9)
    assert(row.getAs[Double]("slope") < 0.0) // decreasing law
  }

  test("q130 association statistics match a hand-computed 2-session basket") {
    // user 1: session {A,B} then (31 min later) session {A}
    val ev = Seq((1L, 0L, 0L, "A"), (1L, 1L, 60L, "B"), (1L, 2L, 60L + 1860L, "A"))
      .toDF("user_id", "event_id", "off", "et")
      .select(col("user_id"), col("event_id"),
        (to_timestamp(lit("2024-01-01 00:00:00")) + expr("make_interval(0,0,0,0,0,0,off)")).as("ts"),
        col("et").as("event_type"))
    // drive the public query path by writing a scratch events table
    val out = {
      val dir = java.nio.file.Files.createTempDirectory("assoc").toString
      ev.withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      EventOps.q130AssociationRules(spark, dir).collect()
    }
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "A" && r.getString(1) == "B")
    assert(r.getAs[Long]("n_ab") == 1L && r.getAs[Long]("n_a") == 2L
      && r.getAs[Long]("n_b") == 1L && r.getAs[Long]("n_sessions") == 2L)
    assert(r.getAs[Double]("support") == 0.5)
    assert(r.getAs[Double]("confidence") == 0.5)
    assert(r.getAs[Double]("lift") == 1.0)
  }

  test("q133 burstiness: metronome scores -1, bursty gaps match the closed form") {
    val ev = Seq(
      // user 1: perfectly regular (gaps 10,10,10) → B = -1
      (1L, 0L, 0L), (1L, 1L, 10L), (1L, 2L, 20L), (1L, 3L, 30L),
      // user 2: bursty (gaps 1,1,98)
      (2L, 4L, 0L), (2L, 5L, 1L), (2L, 6L, 2L), (2L, 7L, 100L))
      .toDF("user_id", "event_id", "off")
      .select(col("user_id"), col("event_id"),
        (to_timestamp(lit("2024-01-01 00:00:00")) + expr("make_interval(0,0,0,0,0,0,off)")).as("ts"))
      .withColumn("event_type", lit("view"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("burst").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventOps.q133Burstiness(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("burstiness")).toMap
    assert(out(1L) == -1.0)
    val gaps = Seq(1L, 1L, 98L)
    val n = gaps.length
    val mu = gaps.sum.toDouble / n
    val sigma = math.sqrt((gaps.map(g => g * g).sum - gaps.sum.toDouble * gaps.sum / n) / n)
    assert(math.abs(out(2L) - (sigma - mu) / (sigma + mu)) < 1e-12)
    assert(out(2L) > 0.0)
  }

  test("tokenCoverage: a 3-term vocabulary is fully covered at any k >= 3") {
    val docs = Seq((1L, ("aa " * 5 + "bb " * 3 + "cc " * 2).trim))
      .toDF("doc_id", "text")
    val rows = VocabStats.tokenCoverage(docs, Seq(2, 10)).collect()
      .map(r => r.getAs[Long]("k") ->
        (r.getAs[Long]("n_terms"), r.getAs[Long]("top_tokens"),
          r.getAs[Long]("total_tokens"), r.getAs[Double]("coverage"))).toMap
    assert(rows(2L) == ((2L, 8L, 10L, 0.8)))  // top-2: aa(5)+bb(3)
    assert(rows(10L) == ((3L, 10L, 10L, 1.0)))
  }
}
