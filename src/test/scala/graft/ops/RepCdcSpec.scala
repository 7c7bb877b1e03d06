package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture coverage for q151 (intra-doc repetition filters), q152
  * (hard-negative mining) and q153 (CDC snapshot diff) — the oracle
  * gates cover the provisioned corpus; these pin the algebra on
  * hand-built inputs where every expected value is derivable by eye. */
class RepCdcSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def stage(tag: String)(write: String => Unit): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-$tag").toString
    write(dir); dir
  }

  test("repetition filter: word share, dup-bigram share, flag reasons") {
    val dir = stage("rep") { d =>
      Seq(
        // "a a a a b": top word 4/5 = 0.8 > .12; bigrams a-a a-a a-a a-b
        // -> dup 3/4 > .10 -> flagged on both ratio rules
        (1L, "a a a a b"),
        // all-distinct 10 words, no repeated bigram: top 1/10 < .12,
        // dup 0, distinct 1.0 -> clean
        (2L, "q r s t u v w x y z"),
        // empty doc -> zeros, not flagged
        (3L, ""),
        // single word: no bigrams; top 1/1 = 1.0 > .12 -> flagged
        (4L, "solo"))
        .toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
    }
    val out = TextAnalysis.q151RepetitionFilter(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7), r.getLong(8)))
    assert(out.toSeq == Seq(
      (1L, 5L, 2L, 4L, 4L, 3L, 0.8, 0.75, 1L),
      (2L, 10L, 10L, 1L, 9L, 0L, 0.1, 0.0, 0L),
      (3L, 0L, 0L, 0L, 0L, 0L, 0.0, 0.0, 0L),
      (4L, 1L, 1L, 1L, 0L, 0L, 1.0, 0.0, 1L)))
  }

  test("hard negatives: only cross-label candidates rank, self excluded by label") {
    val dir = stage("hardneg") { d =>
      // qid 0 (label 0): cross-label candidates are 10 (close) and 11
      // (orthogonal); 12 shares label 0 and must never appear.
      Seq(
        (0L, Array(1.0f, 0.0f), 0),
        (10L, Array(0.9f, 0.1f), 1),
        (11L, Array(0.0f, 1.0f), 1),
        (12L, Array(1.0f, 0.01f), 0))
        .toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    }
    val out = Similarity.q152HardNegatives(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // q0 sees exactly 10 then 11; neither same-label vec ranks
    assert(out.toSeq == Seq((0L, 1L, 10L, 0L, 1L), (0L, 2L, 11L, 0L, 1L)))
  }

  test("phrase search: hottest bigram wins ties by name, overlaps count, positions 1-based") {
    val dir = stage("phrase") { d =>
      // bigram counts: "a a" x3 (doc 1 overlapping) + 0 elsewhere;
      // "b c" x2 (docs 2, 3). Hottest = "a a".
      Seq(
        (1L, "a a a a"),     // positions 1..4 -> pairs at 1,2,3
        (2L, "b c x"),
        (3L, "y b c"),
        (4L, "a  a"))        // double space: DENSE positions 1,2 -> a hit
        .toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
    }
    val out = Retrieval.q154PhraseSearch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, "a a", 3L, 1L), (4L, "a a", 1L, 1L)))
  }

  test("int8 quantization: codes, exact integer sums, certified error bound") {
    val dir = stage("int8") { d =>
      Seq(
        (1L, Array(2.0f, -1.0f, 0.5f), 0),
        (2L, Array(0.0f, 0.0f), 0), // zero vector: zero codes, err 0, ok
        (3L, Array(-3.0f), 1))      // single dim: code -127 exactly
        .toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    }
    val out = Similarity.q155Int8Quant(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getLong(6)))
    // replay the same double arithmetic independently
    def quant(xs: Array[Float]): (Double, Array[Long], Double) = {
      val absmax = xs.map(x => math.abs(x.toDouble)).max
      if (absmax == 0.0) (0.0, xs.map(_ => 0L), 0.0)
      else {
        val scale = absmax / 127.0
        val codes = xs.map(x => math.floor(x.toDouble / scale + 0.5).toLong)
        val err = xs.zip(codes).map { case (x, c) =>
          math.abs(x.toDouble - c.toDouble * scale) }.max
        (absmax, codes, err)
      }
    }
    val exp = Seq(
      (1L, Array(2.0f, -1.0f, 0.5f)), (2L, Array(0.0f, 0.0f)), (3L, Array(-3.0f)))
      .map { case (id, xs) =>
        val (am, cs, er) = quant(xs)
        (id, xs.length.toLong, am, cs.sum, cs.map(math.abs).sum, er, 1L)
      }
    assert(out.toSeq == exp)
    // the -3.0 single-dim vector must hit the clamp boundary exactly
    assert(out(2)._4 == -127L && out(2)._5 == 127L)
  }

  test("curriculum order: exact global positions without a global window") {
    val dir = stage("curr") { d =>
      // enough docs to spread across several range partitions, with
      // deliberate quality ties (identical texts) so tie-breaking by
      // doc_id is exercised across partition boundaries
      val docs = (1L to 500L).map { i =>
        val text = if (i % 7 == 0) "the quick brown fox of the" // tie group
        else ("word " * (i % 13 + 1).toInt).trim + (if (i % 2 == 0) " the of and." else "")
        (i, text)
      }
      docs.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("src0"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
    }
    val out = Curation.q156CurriculumOrder(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // independent replay: sort collected (score, id) pairs in-memory
    val expected = out.map(t => (t._1, t._2)).sortBy { case (id, q) => (-q, id) }
      .zipWithIndex.map { case ((id, q), i) => (id, q, i.toLong, i.toLong % 16) }
    assert(out.length == 500)
    assert(out.toSeq == expected.toSeq)
  }

  test("int8 knn: exact integer code-dot ranking, self excluded") {
    val dir = stage("i8knn") { d =>
      // q0 = [1, 0]: codes q=[127,0] scale=1/127. candidates:
      //  10: [2,0]   codes [127,0]  dot 16129, score 16129/127/127*2 = 2.0
      //  11: [1,1]   codes [127,127] dot 16129, score ~1.0
      //  12: [0,3]   codes [0,127]  dot 0
      Seq(
        (0L, Array(1.0f, 0.0f), 0),
        (10L, Array(2.0f, 0.0f), 1),
        (11L, Array(1.0f, 1.0f), 1),
        (12L, Array(0.0f, 3.0f), 1))
        .toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    }
    val out = Similarity.q157KnnInt8(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (0L, 1L, 10L, 16129L), (0L, 2L, 11L, 16129L), (0L, 3L, 12L, 0L)))
    // 10 and 11 share the integer dot; the SCALE factor separates them
    val scores = Similarity.q157KnnInt8(spark, dir).collect().map(_.getDouble(4))
    assert(scores(0) > scores(1) && scores(1) > scores(2))
  }

  test("snapshot diff classifies insert/update/delete and drops unchanged") {
    val dir = stage("cdc") { d =>
      // keys: 3 -> delete (absent from v2), 7 -> insert (absent from
      // v1), 5 & 10 -> update (+500 cents), 1 -> unchanged (dropped)
      Seq((1L, 10.0), (3L, 30.0), (5L, 50.0), (7L, 70.0), (10L, 100.0))
        .toDF("o_orderkey", "o_totalprice")
        .withColumn("o_custkey", lit(1L))
        .withColumn("o_orderstatus", lit("O"))
        .write.mode("overwrite").parquet(s"$d/orders.parquet")
    }
    val out = MergeOps.q153SnapshotDiff(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
    assert(out.toSeq == Seq(
      (3L, "delete", Some(3000L), None),
      (5L, "update", Some(5000L), Some(5500L)),
      (7L, "insert", None, Some(7000L)),
      (10L, "update", Some(10000L), Some(10500L))))
  }
}
