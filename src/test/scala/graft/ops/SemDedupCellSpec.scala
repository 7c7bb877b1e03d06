package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q137's structural claims: the prefix-closure argument that lets
  * the gate bound BOTH quadratic legs, the subset soundness of any
  * blocking, and the gate end-to-end over a real durable layout. */
class SemDedupCellSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._
  graft.functions.GraftFunctions.register(spark)

  /** Synthetic (vec_id, cell, v) frame with in-cell near-dups, a
    * cross-cell near-dup pair (2001/3 - blocked policy must miss it),
    * and ids above/below the cap boundary. */
  private def fixture = Seq(
    (1L, 0, Seq(1.0f, 0.0f, 0.0f)),
    (2L, 0, Seq(0.99f, 0.14f, 0.0f)),  // near-dup of 1, same cell
    (3L, 1, Seq(0.0f, 1.0f, 0.0f)),
    (4L, 1, Seq(0.0f, 0.99f, 0.14f)),  // near-dup of 3, same cell
    (5L, 0, Seq(0.0f, 0.0f, 1.0f)),    // no near-dup
    (2001L, 1, Seq(1.0f, 0.01f, 0.0f)), // near-dup of 1 but OTHER cell
    (2002L, 0, Seq(0.98f, 0.2f, 0.0f))  // above-cap near-dup of 1/2
  ).toDF("vec_id", "cell", "v")

  private def drops(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.filter(col("dropped") === 1).select(col("vec_id"), col("keeper_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("prefix restriction is exact: capped policy == full policy restricted to the cap") {
    val cap = Dedup.SemDedupTruthCap
    val full = drops(Dedup.semDedupCappedPolicy(fixture, 0.9))
      .filter { case (v, _) => v < cap }
    val capped = drops(Dedup.semDedupCappedPolicy(
      fixture.filter(col("vec_id") < cap), 0.9))
    // every earlier same-cell vector of a sub-cap member is itself
    // sub-cap, so the restriction loses nothing and adds nothing —
    // keepers included
    assert(capped == full, s"capped=$capped full=$full")
    assert(capped.nonEmpty)
  }

  test("cell-blocked drops are a subset of unblocked drops; cross-cell pairs are the misses") {
    val blocked = drops(Dedup.semDedupCappedPolicy(fixture, 0.9))
    val unblocked = drops(Dedup.semDedupCappedPolicy(
      fixture.withColumn("cell", lit(0)), 0.9))
    assert(blocked.keySet.subsetOf(unblocked.keySet))
    // 2001 is a true near-dup of 1 but sits in cell 1: the blocking
    // misses exactly it (and nothing else on this fixture)
    assert(unblocked.keySet -- blocked.keySet == Set(2001L))
    // in-cell pairs are found with min-id keepers
    assert(blocked(2L) == 1L && blocked(4L) == 3L && blocked(2002L) == 1L)
  }

  test("scaledCellCount: floor at the fixed codebook, ~500/cell, uncapped above") {
    assert(Similarity.scaledCellCount(500) == 16)   // small corpus: floor
    assert(Similarity.scaledCellCount(8000) == 16)  // 16 × 500 boundary
    assert(Similarity.scaledCellCount(20000) == 40) // grows with corpus
    assert(Similarity.scaledCellCount(200000) == 400)
    // past the driver-fit ceiling the count keeps scaling (the
    // two-level tier serves it — round-9's 2048 cap is gone)
    assert(Similarity.scaledCellCount(5000000) == 10000)
    assert(Similarity.scaledCellCount(1000000000L) == 2000000)
  }

  test("two-level cells: complete, in-range, deterministic across partition counts") {
    val d = "/root/testdata/sf0.001"
    val e = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").as("v"))
    val n = e.count()
    // force the two-level tier (k > KMeansSample) on the small corpus
    val k = 3000
    val a = Similarity.twoLevelWithCell(spark, e, k)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a.size == n, "every vector assigned exactly once")
    assert(a.values.forall(c => c >= 0 && c < k + Similarity.KMeansSample),
      "cells within the k1*k2 range")
    // determinism must not depend on the physical partitioning: the
    // per-cell fit sample is pinned by the (ccell, vec_id) sort
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = Similarity.twoLevelWithCell(spark, e.repartition(3), k)
        .select(col("vec_id"), col("cell")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(a == b, "two-level layout must be partitioning-independent")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("two-level policy drops stay a subset of the unblocked truth") {
    val d = "/root/testdata/sf0.001"
    val e = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").as("v"))
    val layout = Similarity.twoLevelWithCell(spark, e, 3000)
      .select(col("vec_id"), col("cell"), col("v"))
    val blocked = drops(Dedup.semDedupCappedPolicy(layout, 0.45))
    val unblocked = drops(Dedup.semDedupCappedPolicy(
      layout.withColumn("cell", lit(0)), 0.45))
    assert(blocked.keySet.subsetOf(unblocked.keySet))
    blocked.foreach { case (v, kpr) => assert(kpr < v) }
  }

  test("semDedupScaled: one policy row per vector, drops keep earlier keepers (sf0.001)") {
    val dir = java.nio.file.Files.createTempDirectory("sds").toString
    val out = Dedup.semDedupScaled(spark, "/root/testdata/sf0.001", dir, 0.45)
      .collect()
    val n = Tables.embeddings(spark, "/root/testdata/sf0.001").count()
    assert(out.length == n)
    out.filter(_.getInt(2) == 1).foreach { r =>
      assert(r.getLong(3) < r.getLong(0), "keeper must be an earlier vector")
    }
  }

  test("q137 gate is all-true end-to-end over the real durable layout (sf0.001)") {
    val rows = Dedup.q137SemDedupCell(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getBoolean(1))
    assert(rows.map(_._1).toSeq == Seq("cell_assign_durable",
      "cell_drops_sound", "cell_layout_complete", "cell_recall"))
    // recall may legitimately be n/a-false only when truth is empty;
    // the structural components must hold unconditionally
    val m = rows.toMap
    assert(m("cell_assign_durable") && m("cell_drops_sound")
      && m("cell_layout_complete"))
  }

  test("q190 gate is all-true end-to-end over the scaled artifact layout (sf0.001)") {
    val rows = Dedup.q190SemDedupScaledCells(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getBoolean(1))
    assert(rows.map(_._1).toSeq == Seq("scaled_assign_durable",
      "scaled_drops_sound", "scaled_layout_complete", "scaled_recall"))
    // structural components unconditional; recall is the tripwire leg
    val m = rows.toMap
    assert(m("scaled_assign_durable") && m("scaled_drops_sound")
      && m("scaled_layout_complete"))
  }

  test("two-level artifact: parquet round-trip exact, assignment == fused, WITH non-empty fine") {
    // k past the flat ceiling on a tiny corpus forces k2 > 1, so the
    // fine sub-codebooks are NON-EMPTY nested arrays — the exact shape
    // whose parquet round-trip broke at the 1000× octave only
    // (mutable.ArraySeq elements vs an immutable.Seq cast)
    val d = "/root/testdata/sf0.001"
    val e = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").as("v"))
    val k = Similarity.KMeansSample + 100
    val (k1, k2, coarse, fine) = Similarity.twoLevelCodebooks(spark, e, k)
    assert(k2 > 1, "fixture must exercise the two-level tier")
    assert(fine.exists(_.nonEmpty), "at least one non-empty fine codebook")
    val dir = java.nio.file.Files.createTempDirectory("graft-art").toString
    Similarity.writeArtifact(spark, dir, k1, k2, coarse, fine)
    val (rk1, rk2, rc, rf) = Similarity.readArtifact(spark, dir)
    assert(rk1 == k1 && rk2 == k2)
    assert(rc.map(_.toSeq).toSeq == coarse.map(_.toSeq).toSeq,
      "coarse centroids must round-trip bit-exactly")
    assert(rf.map(_.map(_.toSeq).toSeq).toSeq ==
      fine.map(_.map(_.toSeq).toSeq).toSeq,
      "fine codebooks must round-trip bit-exactly")
    // artifact-based assignment ≡ the fused in-flight path
    val art = Similarity.assignWithArtifact(spark, e, rk1, rk2, rc, rf)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val fused = Similarity.twoLevelWithCell(spark, e, k)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(art == fused, "frozen-artifact assignment must equal the fused fit")
  }
}
