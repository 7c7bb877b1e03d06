package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q104–q107: Markov transitions, OLS trend, PSI drift, MAD outliers. */
class AnalyzeStatsSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // ----- trendRegression (q105) ------------------------------------

  test("trendRegression recovers an exact linear fit") {
    val df = Seq(("g", 1L, 2L), ("g", 2L, 4L), ("g", 3L, 6L)).toDF("k", "x", "y")
    val r = Analyze.trendRegression(df, col("k"), col("x"), col("y"))
      .select("slope", "intercept").head()
    assert(r.getDouble(0) == 2.0 && r.getDouble(1) == 0.0)
  }

  test("trendRegression matches the closed form on a non-exact fit") {
    // (0,1),(1,1),(2,3): slope = (3·7 − 3·5)/(3·5 − 9) = 1, intercept = (5 − 3)/3
    val df = Seq(("g", 0L, 1L), ("g", 1L, 1L), ("g", 2L, 3L)).toDF("k", "x", "y")
    val r = Analyze.trendRegression(df, col("k"), col("x"), col("y"))
      .select("slope", "intercept").head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 2.0 / 3.0) // exact: both compute (5−1·3)/3 in doubles
  }

  test("q105 agrees with the built-in regr_slope/regr_intercept per return flag") {
    val rows = Analyze.q105TrendRegression(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("A", "N", "R"))
    // the float-moment built-in is order-dependent (hence unusable for
    // the oracle hash) but must agree with the exact-sums closed form
    // to ~1e-9 relative on this data
    val builtin = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(expr("regr_slope(round(l_extendedprice*100), round(l_quantity))").as("s"),
        expr("regr_intercept(round(l_extendedprice*100), round(l_quantity))").as("i"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      val (s, i) = builtin(r.getString(0))
      assert(math.abs(r.getDouble(2) - s) <= 1e-9 * math.max(1.0, math.abs(s)))
      assert(math.abs(r.getDouble(3) - i) <= 1e-9 * math.max(1.0, math.abs(i)))
    }
  }

  // ----- drift PSI (q106) ------------------------------------------

  test("q106 total row aggregates the per-bucket micro-nat terms") {
    val rows = Analyze.q106DriftPsi(spark, sf).collect()
    val (total, perBucket) = rows.partition(_.getLong(0) == -1L)
    assert(total.length == 1 && perBucket.nonEmpty)
    assert(total.head.getLong(5) == perBucket.map(_.getLong(5)).sum)
    assert(total.head.getLong(1) == perBucket.map(_.getLong(1)).sum)
    assert(total.head.getLong(2) == perBucket.map(_.getLong(2)).sum)
    // Laplace-smoothed shares are proper probabilities summing to 1
    val sa = perBucket.map(_.getDouble(3)).sum
    val sb = perBucket.map(_.getDouble(4)).sum
    assert(math.abs(sa - 1.0) < 1e-9 && math.abs(sb - 1.0) < 1e-9)
  }

  test("PSI is zero for identical slices and positive under drift") {
    def psiOf(rows: Array[org.apache.spark.sql.Row]): Long =
      rows.find(_.getLong(0) == -1L).get.getLong(5)
    // identical halves: doc 2k goes to A, doc 2k+1 to B with the SAME
    // length — every per-bucket term cancels exactly
    val same = Seq.tabulate(40)(i => (i.toLong, s"src${i % 2}", 100L + 100 * ((i / 2) % 4)))
      .toDF("doc_id", "source", "n_chars")
    // drifted: group A short docs, group B long docs
    val drifted = (Seq.tabulate(20)(i => (i.toLong, "src2", 100L)) ++
        Seq.tabulate(20)(i => (i + 100L, "src3", 400L)))
      .toDF("doc_id", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("psi").toString
    same.write.mode("overwrite").parquet(s"$dir/same/documents.parquet")
    drifted.write.mode("overwrite").parquet(s"$dir/drift/documents.parquet")
    assert(psiOf(Analyze.q106DriftPsi(spark, s"$dir/same").collect()) == 0L)
    assert(psiOf(Analyze.q106DriftPsi(spark, s"$dir/drift").collect()) > 1000000L)
  }

  // ----- robust outliers (q107) ------------------------------------

  test("q107 reports per-type medians, MADs, and bounded outlier counts") {
    val rows = Analyze.q107OutlierMad(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("click", "error", "purchase", "signup", "view"))
    rows.foreach { r =>
      val (n, med, mad, nOut) = (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))
      assert(n > 0 && med > 0.0 && mad > 0.0)
      assert(nOut >= 0 && nOut < n / 2) // a majority can never be outliers of its own median
      // cents quantization: medians are dyadic (integer or half-integer)
      assert(med * 2 == math.rint(med * 2))
      assert(mad * 2 == math.rint(mad * 2))
    }
  }

  // ----- path anomaly (q111) ---------------------------------------

  test("q111 path NLL matches an in-memory recomputation exactly") {
    val ev = Tables.events(spark, sf)
      .filter(col("event_type").isNotNull)
      .select(col("user_id"), expr("unix_micros(ts)"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val steps = ev.groupBy(_._1).toSeq.flatMap { case (uid, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3)).map(_._4)
      sorted.zip(sorted.tail).map { case (a, b) => (uid, a, b) }
    }
    val pairN = steps.groupBy(s => (s._2, s._3)).map { case (k, v) => k -> v.size.toLong }
    val prevN = steps.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    def nllMicro(a: String, b: String): Long =
      math.rint(-math.log(pairN((a, b)).toDouble / prevN(a)) * 1e6).toLong
    val expected = steps.groupBy(_._1).map { case (uid, ss) =>
      uid -> (ss.size.toLong, ss.map(s => nllMicro(s._2, s._3)).sum)
    }
    val got = EventOps.q111PathAnomaly(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
  }

  // ----- equi-depth histogram (q112) -------------------------------

  test("q112 buckets are equi-depth, ordered, and non-overlapping") {
    val rows = Analyze.q112HistogramEquidepth(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables.lineitem(spark, sf).count())
    rows.foreach { r => // ~25% each; ties can skew a little
      assert(r.getLong(1) > total * 0.15 && r.getLong(1) < total * 0.35)
      assert(r.getLong(2) <= r.getLong(3)) // lo <= hi within a bucket
    }
    rows.sliding(2).foreach { case Array(a, b) => // strictly separated ranges
      assert(a.getLong(3) < b.getLong(2))
    }
  }

  // ----- temperature mix (q110) ------------------------------------

  test("q110 temperature weights flatten the source distribution") {
    val rows = Curation.q110TemperatureMix(spark, sf).collect()
    assert(rows.length > 1)
    val tot = rows.map(_.getLong(1)).sum.toDouble
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-9)
    assert(math.abs(rows.map(_.getDouble(4)).sum - 10000.0) < 1e-5)
    // α = 0.5 moves every share TOWARD uniform: sources below the
    // proportional share gain, sources above it lose
    val smallest = rows.minBy(_.getLong(1))
    val largest = rows.maxBy(_.getLong(1))
    if (smallest.getLong(1) != largest.getLong(1)) {
      assert(smallest.getDouble(3) > smallest.getLong(1) / tot)
      assert(largest.getDouble(3) < largest.getLong(1) / tot)
    }
  }

  // ----- event transitions (q104) ----------------------------------

  test("q104 transition rows normalize to 1 per source state") {
    val rows = EventOps.q104EventTransitions(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      assert(math.abs(g.map(_.getDouble(3)).sum - 1.0) < 1e-9)
      g.foreach(r => assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0))
    }
    // counts are consistent with fracs: frac == n / Σn within the group
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      val tot = g.map(_.getLong(2)).sum.toDouble
      g.foreach(r => assert(r.getDouble(3) == r.getLong(2) / tot))
    }
  }
  // ----- sketch rollup (q128) --------------------------------------

  test("HLL sketch union over daily partitions equals the whole-set sketch") {
    // register-wise max is associative: union(sketch(A), sketch(B))
    // must carry the same registers as sketch(A ∪ B)
    val ev = (1 to 400).map(u => (u % 7, u.toLong)).toDF("day", "u")
    val perDay = ev.groupBy(col("day")).agg(hll_sketch_agg(col("u")).as("sk"))
    val merged = perDay.agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("e"))
      .head().getLong(0)
    val whole = ev.agg(hll_sketch_estimate(hll_sketch_agg(col("u"))).as("e"))
      .head().getLong(0)
    assert(merged == whole)
  }

  test("q128 gate holds and exact counts agree with a direct distinct") {
    val out = Analyze.q128SketchRollup(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Boolean]("ok")))
    val direct = Tables.events(spark, sf)
      .select(to_date(date_trunc("week", col("ts"))).as("week"), col("user_id"))
      .groupBy("week").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getAs[java.sql.Date]("week").toString -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(direct(r.getAs[java.sql.Date]("week").toString) == r.getAs[Long]("exact_users"))
    }
  }

  test("q140 KS: closed-form distances on hand-built distributions") {
    import spark.implicits._
    // A = {1,2,3,4}, B = {3,4,5,6}: sup at v=2 → |2/4 − 0| = 0.5
    // C = {1,2,3,4} (≡ A): D(A,C) = 0;  E = {10,11}: D(A,E) = 1 (disjoint)
    val df = (Seq(1, 2, 3, 4).map(("a", _)) ++ Seq(3, 4, 5, 6).map(("b", _)) ++
      Seq(1, 2, 3, 4).map(("c", _)) ++ Seq(10, 11).map(("e", _)))
      .toDF("src", "x")
    val got = Analyze.ksAllPairs(df, col("src"), col("x")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got(("a", "b")) == 0.5)
    assert(got(("a", "c")) == 0.0)
    assert(got(("a", "e")) == 1.0)
    assert(got(("b", "c")) == 0.5)
    assert(got.size == 6)
  }

  test("q142 Spearman: closed-form rho on hand-built rankings") {
    import spark.implicits._
    // g1: y = x (perfect agreement), g2: y = -x (perfect inversion),
    // g3: one adjacent swap among 4 -> d² sum 2, rho = 1 - 12/60 = 0.8
    val df = (Seq((1, 1), (2, 2), (3, 3)).map { case (x, y) => ("g1", x, y) } ++
      Seq((1, 9), (2, 8), (3, 7)).map { case (x, y) => ("g2", x, y) } ++
      Seq((1, 1), (2, 3), (3, 2), (4, 4)).map { case (x, y) => ("g3", x, y) })
      .zipWithIndex.map { case ((g, x, y), i) => (g, x, y, i.toLong) }
      .toDF("g", "x", "y", "id")
    val got = Analyze.spearman(df, col("g"), col("x"), col("y"), col("id"))
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got("g1") == ((0L, 1.0)))
    assert(got("g2") == ((8L, -1.0))) // d = (1-3, 0, 3-1): sum_d2 = 8
    assert(got("g3")._2 == 0.8)
  }

  test("q142 over the snapshot: one row per source, rho in [-1,1]") {
    val rows = Analyze.q142SignalAgreement(spark, sf).collect()
    assert(rows.length == 20)
    assert(rows.forall { r =>
      val rho = r.getDouble(3); rho >= -1.0 && rho <= 1.0 && r.getLong(1) > 1
    })
  }

  test("q140 over the snapshot: one row per unordered source pair, D in [0,1]") {
    val rows = Analyze.q140KsDrift(spark, sf).collect()
    assert(rows.length == 190) // C(20,2) sources
    assert(rows.forall { r =>
      val d = r.getDouble(2); d >= 0.0 && d <= 1.0 &&
        r.getString(0) < r.getString(1)
    })
  }
}
