package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture coverage for q145 (Naive Bayes) and q146's RRF fusion —
  * the oracle gates cover the provisioned corpus; these pin the
  * algebra on hand-computable inputs. */
class ClassifyFusionSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "source", "text")

  /** Independent in-spec NB recompute (same micro-nat quantization). */
  private def nbScore(tokens: Seq[String], cls: String,
      tc: Map[(String, String), Long], nC: Map[String, Long],
      v: Long, dC: Map[String, Long], nDocs: Long): Long = {
    val prior = math.round(math.log(dC(cls).toDouble / nDocs) * 1000000)
    prior + tokens.map { w =>
      math.round(math.log((tc.getOrElse((w, cls), 0L) + 1).toDouble /
        (nC(cls) + v)) * 1000000)
    }.sum
  }

  test("naiveBayes matches a hand-built model on a tiny corpus") {
    // class a: tokens {x:3, y:1}; class b: {z:2, y:1}; vocab {x,y,z}
    val df = docs(
      (1L, "a", "x x y"), (2L, "a", "x"),
      (3L, "b", "z z y"), (4L, "b", ""))
    val out = Classify.naiveBayes(df, "source")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val tc = Map(("x", "a") -> 3L, ("y", "a") -> 1L, ("z", "b") -> 2L, ("y", "b") -> 1L)
    val nC = Map("a" -> 4L, "b" -> 3L)
    val dC = Map("a" -> 2L, "b" -> 2L)
    def score(toks: Seq[String], c: String) = nbScore(toks, c, tc, nC, 3L, dC, 4L)
    def best(toks: Seq[String]): (String, Long) =
      Seq("a", "b").map(c => (c, score(toks, c)))
        .minBy { case (c, s) => (-s, c) }
    val exp = Seq(
      (1L, "a", Seq("x", "x", "y")), (2L, "a", Seq("x")),
      (3L, "b", Seq("z", "z", "y")), (4L, "b", Seq.empty[String]))
      .map { case (id, actual, toks) =>
        val (pred, s) = best(toks)
        (id, actual, pred, s)
      }
    assert(out.toSeq == exp)
  }

  test("a token-free doc classifies to the max-prior class, not vanishes") {
    val df = docs((1L, "big", "w w"), (2L, "big", "w"), (3L, "small", ""))
    val out = Classify.naiveBayes(df, "source").collect()
    assert(out.length == 3, "every doc must be classified")
    val empty = out.find(_.getLong(0) == 3L).get
    // doc 3 has no tokens: score = prior only; 'big' has the larger prior
    assert(empty.getString(2) == "big")
  }

  test("rrfFuse sums integer credit across systems and tie-breaks on doc_id") {
    val leg1 = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("query_id", "doc_id", "rnk")
    val leg2 = Seq((1L, 11L, 1L), (1L, 12L, 2L)).toDF("query_id", "doc_id", "rnk")
    val out = Retrieval.rrfFuse(Seq(leg1, leg2), 10)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val c1 = 1000000000L / 61L // rank 1
    val c2 = 1000000000L / 62L // rank 2
    // doc 11 appears in both legs (ranks 2 and 1) and must win
    assert(out.toSeq == Seq((1L, 11L, c1 + c2), (2L, 10L, c1), (3L, 12L, c2)))
  }

  test("rrfFuse equal-credit ties order by doc_id") {
    val leg1 = Seq((1L, 20L, 1L)).toDF("query_id", "doc_id", "rnk")
    val leg2 = Seq((1L, 7L, 1L)).toDF("query_id", "doc_id", "rnk")
    val out = Retrieval.rrfFuse(Seq(leg1, leg2), 10)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 7L), (2L, 20L)))
  }
}
