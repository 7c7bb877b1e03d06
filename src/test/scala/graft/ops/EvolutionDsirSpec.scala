package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture coverage for q149 (DSIR importance weights) and q150
  * (schema-evolution ingest) — the oracle gates cover the provisioned
  * corpus; these pin the algebra / merge semantics on hand-built
  * inputs. */
class EvolutionDsirSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  /** The rolling-hash polynomial (seed 7, base 31, mod 2^31−1) —
    * independent in-spec recompute of graft_rolling_hash. */
  private def rh(term: String): Long =
    term.foldLeft(7L)((acc, c) => (acc * 31 + c.toLong) % 2147483647L)

  test("importance weights match an independent replay; keep = above truncated mean") {
    // target slice (src1) is all 'x'; the rest of the corpus is 'y'-heavy
    val df = Seq(
      (1L, "src1", "x x x x"), (2L, "src1", "x x x"),
      (3L, "src2", "y y y y"), (4L, "src2", "y y y x"),
      (5L, "src3", "")).toDF("doc_id", "source", "text")
    assert(rh("x") % 512 != rh("y") % 512,
      "fixture tokens must land in distinct buckets")
    // independent replay: x appears 8x corpus-wide / 7x in target;
    // y 7x corpus-wide / 0 in target; T_src=15, T_tgt=7, 512 buckets
    def lr(nTgt: Long, nSrc: Long): Long =
      math.round((math.log((nTgt + 1).toDouble / (7 + 512)) -
        math.log((nSrc + 1).toDouble / (15 + 512))) * 1000000)
    val a = lr(7, 8) // the x bucket (target-favored)
    val b = lr(0, 7) // the y bucket
    assert(a > b, "target-favored bucket must outscore the anti-target one")
    val w = Map(1L -> 4 * a, 2L -> 3 * a, 3L -> 4 * b, 4L -> (3 * b + a), 5L -> 0L)
    val thr = w.values.sum / 5 // truncated mean, both engines' div
    val expected = Seq(
      (1L, 4L), (2L, 3L), (3L, 4L), (4L, 4L), (5L, 0L)).map { case (id, n) =>
      (id, n, w(id), if (w(id) > thr) 1L else 0L)
    }
    val out = Curation.q149ImportanceWeights(spark, writeDocs(df))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == expected)
    // the relative rule must actually split the corpus
    assert(expected.map(_._4).sum > 0 && expected.map(_._4).sum < 5)
  }

  /** q149/q150 read from a table directory — stage the fixture docs
    * as a documents.parquet in a scratch dir. */
  private def writeDocs(df: org.apache.spark.sql.DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-dsir").toString
    df.withColumn("lang", lit("en")).withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("schema evolution: v1 rows surface NULL for the late column, totals conserved") {
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve").toString
    val o = Seq(
      (2L, 10L, "F", 100.0), (4L, 11L, "O", 50.0),
      (1L, 10L, "F", 25.0), (3L, 12L, "P", 75.0))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    o.withColumn("o_orderdate", current_timestamp())
      .withColumn("o_orderpriority", lit("1-URGENT"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = InferOps.q150SchemaEvolution(spark, dir)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
    // even keys (2, 4) lose their status to the v1 schema -> NULL group
    assert(out.toSet == Set(
      (None, 2L, 15000L),          // keys 2+4: 100+50 -> cents
      (Some("F"), 1L, 2500L),      // key 1
      (Some("P"), 1L, 7500L)))     // key 3
  }

  test("widenType: lossless promotions only; everything else is a rewrite") {
    import org.apache.spark.sql.types._
    assert(InferOps.widenType(IntegerType, LongType) == LongType)
    assert(InferOps.widenType(LongType, IntegerType) == LongType)
    assert(InferOps.widenType(ByteType, ShortType) == ShortType)
    assert(InferOps.widenType(FloatType, DoubleType) == DoubleType)
    assert(InferOps.widenType(DoubleType, FloatType) == DoubleType)
    assert(InferOps.widenType(StringType, StringType) == StringType)
    // BIGINT→DOUBLE drops low bits past 2^53 — must refuse
    intercept[IllegalArgumentException](InferOps.widenType(LongType, DoubleType))
    intercept[IllegalArgumentException](InferOps.widenType(IntegerType, FloatType))
    intercept[IllegalArgumentException](InferOps.widenType(StringType, IntegerType))
  }

  test("widenUnion: widening + additive axes compose, values conserved exactly") {
    import org.apache.spark.sql.types._
    val v1 = Seq((1, 1.5f), (2, 2.5f)).toDF("k", "p") // INT, FLOAT
    val v2 = Seq((3L, 3.25, "x")).toDF("k", "p", "tag") // BIGINT, DOUBLE, +tag
    val u = InferOps.widenUnion(Seq(v1, v2))
    assert(u.schema.map(f => (f.name, f.dataType)) ==
      Seq(("k", LongType), ("p", DoubleType), ("tag", StringType)))
    val rows = u.collect().map(r =>
      (r.getLong(0), r.getDouble(1), Option(r.getString(2)))).toSet
    // float32 1.5/2.5 are dyadic — exact through the double cast;
    // v1 rows surface NULL for the late column
    assert(rows == Set((1L, 1.5, None), (2L, 2.5, None),
      (3L, 3.25, Some("x"))))
    // an irreconcilable pair fails loudly at plan time
    val bad = Seq((1L, 1.0)).toDF("k", "p")
      .select(col("k").cast("double").as("k"), col("p"))
    intercept[IllegalArgumentException](InferOps.widenUnion(Seq(v1, bad)))
  }

  test("q188: two-generation widening read conserves totals incl. an INT-overflow key") {
    val dir = java.nio.file.Files.createTempDirectory("graft-widen").toString
    val big = Int.MaxValue.toLong + 5L // lands in the BIGINT generation
    val o = Seq(
      (1L, 10L, "F", 10.0), (2L, 11L, "O", 20.0),
      (big, 12L, "F", 0.1)) // 0.1 is NOT float-exact: v2 must keep full double
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    o.withColumn("o_orderdate", current_timestamp())
      .withColumn("o_orderpriority", lit("1-URGENT"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = InferOps.q188TypeWidening(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // v2's 0.1 never visits float32: round(0.1*100)=10 cents exactly;
    // max_key proves the BIGINT generation survived the union
    assert(out.toSeq == Seq(
      ("F", 2L, big, 1010L, 2L),
      ("O", 1L, 2L, 2000L, 1L)))
  }
}
