package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q113–q119: vocab overlap, prefix-filter similarity join, char
  * entropy, calendar gap-fill, skyline, CUSUM, PMI collocations. */
class FrontierResampleSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // ----- skyline2d (q117) ------------------------------------------

  private def bruteSkyline(pts: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    pts.filter { p =>
      !pts.exists(q => q._2 >= p._2 && q._3 >= p._3 &&
        (q._2 > p._2 || q._3 > p._3))
    }.toSet

  test("skyline2d matches strict-dominance brute force, duplicates kept") {
    val pts: Seq[(Long, Long, Long)] = Seq(
      (1L, 10L, 1L), (2L, 9L, 5L), (3L, 9L, 5L), // duplicate (x,y): both stay
      (4L, 9L, 4L),  // dominated inside its equal-x group
      (5L, 10L, 0L), // dominated strictly in y by id 1
      (6L, 1L, 9L), (7L, 0L, 10L), (8L, 1L, 8L))
    val got = Analyze.skyline2d(pts.toDF("id", "x", "y"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == bruteSkyline(pts))
    assert(got.contains((2L, 9L, 5L)) && got.contains((3L, 9L, 5L)))
  }

  test("skyline2d is partitioning-independent on random anti-correlated data") {
    val rnd = new scala.util.Random(7)
    val pts = (1L to 400L).map { id =>
      val x = rnd.nextInt(100).toLong
      (id, x, 100L - x + rnd.nextInt(20)) // anti-correlated: wide frontier
    }
    val expected = bruteSkyline(pts)
    Seq(1, 3, 8).foreach { p =>
      val got = Analyze.skyline2d(pts.toDF("id", "x", "y").repartition(p))
        .as[(Long, Long, Long)].collect().toSet
      assert(got == expected, s"partitions=$p")
    }
  }

  test("skyline2d survives the adversarial case: every point on the frontier, no single-task stage") {
    // perfectly anti-correlated: x strictly increasing, y strictly
    // decreasing — NOTHING is dominated, so every local frontier is
    // the whole partition and the phase-2 input is the full dataset.
    // The old repartition(1) sweep made that one task; the range-
    // partitioned cross-cut must keep it distributed.
    val pts = (1L to 2000L).map(id => (id, id, 3000L - id))
    val df = pts.toDF("id", "x", "y").repartition(16)
    val result = Analyze.skyline2d(df)
    val plan = result.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"adversarial skyline must not funnel the frontier union into one task:\n$plan")
    assert(result.count() == 2000L, "anti-correlated data: all points survive")
    // and dominated points are still cut across range boundaries
    val withDupsAndDominated = (pts ++ Seq((9001L, 1L, 1L), (9002L, 2000L, 999L)))
      .toDF("id", "x", "y").repartition(16)
    val ids = Analyze.skyline2d(withDupsAndDominated)
      .select("id").as[Long].collect().toSet
    assert(!ids.contains(9001L) && !ids.contains(9002L))
    assert(ids.size == 2000)
  }

  test("q117 frontier rows are mutually non-dominating and dominate the rest") {
    val rows = Analyze.q117Skyline(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    for (p <- rows; q <- rows if p != q)
      assert(!(q._2 >= p._2 && q._3 >= p._3 && (q._2 > p._2 || q._3 > p._3)))
  }

  // ----- prefixJaccardPairs (q114) ---------------------------------

  private def bruteJaccard(docs: Seq[(Long, String)], t: Double) = {
    val sets = docs.map { case (id, text) =>
      id -> text.trim.split("\\s+").toSeq.sliding(3).map(_.mkString(" ")).toSet
    }.toMap
    (for {
      a <- sets.keys; b <- sets.keys if a < b
      co = (sets(a) & sets(b)).size
      jac = co.toDouble / (sets(a).size + sets(b).size - co)
      if jac >= t
    } yield (a, b)).toSet
  }

  test("prefixJaccardPairs matches brute force — zero false negatives") {
    val base = "a b c d e f g h i j k l m n o p"
    val docs: Seq[(Long, String)] = Seq(
      1L -> base,
      2L -> base,                         // identical: jac 1.0
      3L -> (base + " q r"),              // high overlap
      4L -> "z y x w v u t s r q p o",    // mostly disjoint
      5L -> "a b c z z1 z2 z3 z4 z5 z6 z7 z8", // low overlap
      6L -> (base.split(" ").drop(2).mkString(" ") + " aa bb")) // medium
    val df = docs.map { case (id, t) => (id, "en", t) }.toDF("doc_id", "lang", "text")
    for (t <- Seq(0.4, 0.6, 0.9)) {
      val got = Dedup.prefixJaccardPairs(df, t)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(got == bruteJaccard(docs, t), s"threshold=$t")
    }
  }

  test("chunked verification (the 1000x scratch path) is row-identical to the single pass") {
    // a 1-row expansion budget forces the candidate-space chunk loop
    // (pmod(xxhash64(doc_a, doc_b), C), round 15) — the sequential
    // plan q114 runs when the expansion join would exceed local
    // scratch; the chunk union must equal the single pass exactly
    // because the pair classes are disjoint and each pair's whole
    // count completes inside its own chunk
    val base = "a b c d e f g h i j k l m n o p"
    val docs: Seq[(Long, String)] = Seq(
      1L -> base, 2L -> base, 3L -> (base + " q r"),
      4L -> "z y x w v u t s r q p o",
      5L -> "a b c z z1 z2 z3 z4 z5 z6 z7 z8",
      6L -> (base.split(" ").drop(2).mkString(" ") + " aa bb"))
    val df = docs.map { case (id, t) => (id, "en", t) }.toDF("doc_id", "lang", "text")
    for (t <- Seq(0.4, 0.6)) {
      val single = Dedup.prefixJaccardPairs(df, t).collect().map(_.toSeq).toSet
      val chunked = Dedup.prefixJaccardPairs(df, t, maxExpansionRows = 1L)
        .collect().map(_.toSeq).toSet
      assert(chunked == single, s"threshold=$t: chunked != single-pass")
      assert(single.map(r => (r.head, r(1))) == bruteJaccard(docs, t).map(p => (p._1, p._2)),
        s"threshold=$t: single-pass drifted from brute force")
    }
  }

  test("PPJoin positional filter strictly prunes candidates and loses no qualifying pair") {
    // near-dup-dense family: 8 docs identical except token 10 — each
    // pair shares 7 of its 10 shingles (jac 7/13 ≈ 0.54 < 0.6), so the
    // true answer excludes all 28 pairs, yet every pair passes the
    // plain prefix filter: the 3 unique shingles fill prefix positions
    // 1-3 and two SHARED shingles land at positions 4-5 of both docs.
    // The positional bound 1 + min(10-p, 10-p) = 11-p < α = 7.5 then
    // rejects every such match. The genuinely identical pair
    // (100, 101) matches at position 1 (bound 10 ≥ 7.5) and survives.
    val t12 = (1 to 12).map(i => s"t$i")
    val family = (1 to 8).map(i => (i.toLong, t12.updated(9, s"x$i").mkString(" ")))
    val dupText = (1 to 12).map(i => s"d$i").mkString(" ")
    val all = family ++ Seq((100L, dupText), (101L, dupText))
    val df = all.map { case (id, tx) => (id, "en", tx) }.toDF("doc_id", "lang", "text")
    val sh = Dedup.shingleRows(df)
      .select(col("doc_id"),
        xxhash64(col("s")).as("k1"), xxhash64(col("s"), lit(1)).as("k2"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val plain = Dedup.prefixCandidatePairs(sh, sizes, 0.6, positional = false).count()
    val posCand = Dedup.prefixCandidatePairs(sh, sizes, 0.6, positional = true)
      .as[(Long, Long)].collect().toSet
    assert(plain == 29L, s"fixture drift: expected 28 family pairs + 1 dup pair, got $plain")
    assert(posCand.size < plain, "positional filter must strictly prune")
    assert(posCand == Set((100L, 101L)), s"unexpected candidates: $posCand")
    // end-to-end: the filtered path still matches brute force exactly
    val got = Dedup.prefixJaccardPairs(df, 0.6)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got == bruteJaccard(all, 0.6))
    assert(got == Set((100L, 101L)))
  }

  test("positional filter prunes a size-skewed pair whose matches sit deep in both prefixes") {
    // synthetic shingle frame with hand-placed rarity positions:
    // doc 1 (n=10): unique element 100 (pos 1), SHARED 200/201
    // (freq 2 → pos 2-3), fillers 300..306 (freq 3 → pos 4-10).
    // doc 2 (n=16): uniques 110..114 (pos 1-5), SHARED 200/201
    // (pos 6-7, inside the probe prefix ≤7), fillers 400..408
    // (pos 8-16). Both matches reach the join; the positional bound
    // 1 + min(10−pos_a, 16−pos_b) = 9 and 8 both fall short of
    // α = 0.375·26 = 9.75, so the pair is pruned — correctly: overlap
    // 2 of union 24 is nowhere near jac 0.6. The freq-3 fillers live
    // in docs 90/91 so rarity order puts shared elements AHEAD of
    // them. (This fixture also guarded the index-prefix experiment —
    // see the adjudicated-non-change note on prefixCandidatePairs.)
    val rows =
      (Seq(100L, 200L, 201L) ++ (300L to 306L)).map(e => (1L, e)) ++
      ((110L to 114L) ++ Seq(200L, 201L) ++ (400L to 408L)).map(e => (2L, e)) ++
      ((300L to 306L) ++ (400L to 408L)).flatMap(e => Seq((90L, e), (91L, e)))
    val sh = rows.toDF("doc_id", "e")
      .select(col("doc_id"), col("e").as("k1"), col("e").as("k2"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val plain = Dedup.prefixCandidatePairs(sh, sizes, 0.6, positional = false)
      .as[(Long, Long)].collect().toSet
    val pos = Dedup.prefixCandidatePairs(sh, sizes, 0.6, positional = true)
      .as[(Long, Long)].collect().toSet
    assert(plain.contains((1L, 2L)),
      s"fixture drift: (1,2) must survive the prefix join, got $plain")
    assert(!pos.contains((1L, 2L)), "positional bound must prune (1,2)")
    assert(pos.subsetOf(plain), "positional filter may only remove candidates")
    assert(pos.contains((90L, 91L)), "the identical filler pair must survive")
  }

  test("prefixJaccardPairs agrees with lang-blocked q23 on single-lang corpus") {
    // one lang ⇒ blocking is a no-op ⇒ the two EXACT paths must agree
    val docs = Tables.documents(spark, sf).withColumn("lang", lit("xx"))
    val viaPrefix = Dedup.prefixJaccardPairs(docs, 0.6)
      .select("doc_a", "doc_b", "co").as[(Long, Long, Long)].collect().toSet
    val viaBlocked = Dedup.jaccardPairs(docs, 0.6)
      .select("doc_a", "doc_b", "co").as[(Long, Long, Long)].collect().toSet
    assert(viaPrefix == viaBlocked)
  }

  // ----- q115 char entropy -----------------------------------------

  test("q115 entropy: zero for constant text, ln(k) for uniform, bounded") {
    val rows = TextAnalysis.q115CharEntropy(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1)
      val e = r.getDouble(3)
      assert(e >= 0.0 && e <= math.log(n.toDouble) + 1e-9)
    }
    // closed forms of the micro-nat quantization: constant text → 0,
    // a 4-char uniform doc → 4·round(ln 4·10⁶)
    assert(math.round(4 * math.log(4.0 / 4) * 1e6) == 0L)
    assert(4L * math.round(math.log(4.0) * 1e6) == 4L * 1386294L)
  }

  // ----- q116 gap-fill + LOCF --------------------------------------

  test("q116 calendar is dense per user; gaps carry the last value forward") {
    val rows = EventOps.q116GapFill(spark, sf)
      .select(col("user_id"), col("day").cast("string"), col("n_events"),
        col("cents_locf"))
      .as[(Long, String, Long, Long)].collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_._1)
    byUser.foreach { case (_, rs) =>
      val days = rs.map(r => java.time.LocalDate.parse(r._2)).sorted
      // dense: span length == row count
      val span = java.time.temporal.ChronoUnit.DAYS.between(days.head, days.last) + 1
      assert(span == days.length.toLong)
      // LOCF: a zero-event day repeats the previous day's carried value
      val sorted = rs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(prev, cur) if cur._3 == 0L => assert(cur._4 == prev._4)
        case _ =>
      }
    }
    // gap rows exist at this SF and total events are preserved
    assert(rows.exists(_._3 == 0L))
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_._3).sum == total)
  }

  // ----- q118 CUSUM ------------------------------------------------

  test("q118 cusum ends at zero and flags exactly one earliest peak") {
    val rows = Analyze.q118Cusum(spark, sf)
      .select(col("day").cast("string"), col("n"), col("cusum_d"),
        col("is_changepoint"))
      .as[(String, Long, Long, Int)].collect().sortBy(_._1)
    assert(rows.last._3 == 0L) // S_D = D·T − D·T
    assert(rows.map(_._4).sum == 1)
    val peak = rows.map(r => math.abs(r._3)).max
    val cp = rows.find(_._4 == 1).get
    assert(math.abs(cp._3) == peak)
    assert(rows.filter(r => math.abs(r._3) == peak).head._1 == cp._1) // earliest
    // recompute the scaled cusum directly
    val d = rows.length.toLong
    val t = rows.map(_._2).sum
    var prefix = 0L
    rows.zipWithIndex.foreach { case (r, i) =>
      prefix += r._2
      assert(r._3 == prefix * d - (i + 1) * t)
    }
  }

  // ----- q113 vocab overlap ----------------------------------------

  test("q113 emits every source pair once with a valid jaccard") {
    val rows = TextAnalysis.q113VocabOverlap(spark, sf)
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, co, na, nb, jac) =>
      assert(a < b)
      assert(co <= math.min(na, nb))
      assert(jac == co.toDouble / (na + nb - co))
    }
    assert(rows.map(r => (r._1, r._2)).distinct.length == rows.length)
  }

  // ----- q119 PMI --------------------------------------------------

  test("q119 ranks by exact micro-PMI with full support filter") {
    val rows = TextAnalysis.q119PmiCollocations(spark, sf)
      .as[(String, String, Long, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.forall(_._3 >= 5))
    // sorted by (pmi desc, w, w2)
    rows.sliding(2).foreach {
      case Array(p, c) =>
        assert(p._4 > c._4 ||
          (p._4 == c._4 && (p._1 < c._1 || (p._1 == c._1 && p._2 <= c._2))))
      case _ =>
    }
  }
}
