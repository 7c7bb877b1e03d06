package graft.ops

import scala.jdk.CollectionConverters._

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the round-6 audit/preparation operators on
  * hand-computable fixtures (the oracle gate covers the provisioned
  * corpus; these pin the algebra itself). */
class AuditSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("chunkDocs covers the text exactly: stride-prefixes + last chunk reassemble it") {
    val text = ('a' to 'z').mkString * 20 // 520 chars
    val docs = Seq((1L, text), (2L, "short"), (3L, "x" * 200)).toDF("doc_id", "text")
    val out = Audit.chunkDocs(docs, size = 200, stride = 150)
      .collect().groupBy(_.getLong(0))
    docs.collect().foreach { r =>
      val (id, t) = (r.getLong(0), r.getString(1))
      val chunks = out(id).sortBy(_.getLong(1))
      // starts are 1, 151, 301, ... and idx is dense from 0
      chunks.zipWithIndex.foreach { case (c, k) =>
        assert(c.getLong(1) == k && c.getLong(2) == 1L + 150L * k)
      }
      // every char position is covered; reassembly from stride-sized
      // prefixes of all-but-last chunk plus the whole last chunk
      val re = chunks.init.map(_.getString(3).take(150)).mkString + chunks.last.getString(3)
      assert(re == t, s"doc $id reassembly")
      assert(chunks.forall(c => c.getLong(4) <= 200 && c.getLong(4) == c.getString(3).length))
    }
  }

  test("embeddingCovariance matches a hand-computed 2-d fixture and is partition-invariant") {
    val vecs = Seq(
      Array(1.0f, 2.0f), Array(3.0f, 0.0f), Array(5.0f, 4.0f), Array(7.0f, 2.0f))
    // exact covariance of x=(1,3,5,7): mean 4, cov 5; y=(2,0,4,2): mean 2, cov 2
    // cov(x,y) = E[xy]-E[x]E[y] = (2+0+20+14)/4 - 8 = 1
    val expected = Map((0L, 0L) -> 5.0, (0L, 1L) -> 1.0, (1L, 1L) -> 2.0)
    Seq(1, 3).foreach { parts =>
      val df = spark.createDataset(vecs).repartition(parts).toDF("embedding")
      val got = Audit.embeddingCovariance(df).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
      assert(got.keySet == expected.keySet)
      got.foreach { case (k, (n, cov)) =>
        assert(n == 4L)
        assert(math.abs(cov - expected(k)) < 1e-9, s"pair $k at $parts partitions")
      }
    }
  }

  test("q122's PassJoin-filtered path equals the blocked cross-join brute force") {
    val d = "/root/testdata/sf0.001"
    val got = Audit.q122EntityResolution(spark, d).collect()
      .map(r => (r.getAs[Int]("nationkey"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_customers"), r.getAs[Long]("min_dist")))
    val c = Tables.customer(spark, d).selectExpr(
      "c_nationkey AS nationkey", "substring(c_name, 10, 9) AS ckey")
    val s2 = Tables.supplier(spark, d).selectExpr(
      "s_nationkey AS nationkey", "substring(s_name, 10, 9) AS skey")
    val brute = c.join(s2, Seq("nationkey"))
      .withColumn("dist", levenshtein(col("ckey"), col("skey")))
      .filter(col("dist") <= 2)
      .groupBy(col("nationkey"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("ckey")).as("n_customers"),
        min(col("dist")).cast("long").as("min_dist"))
      .orderBy(col("nationkey")).collect()
      .map(r => (r.getAs[Int]("nationkey"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_customers"), r.getAs[Long]("min_dist")))
    assert(got.sameElements(brute))
    assert(got.nonEmpty)
  }

  test("q122 segment filter survives insertions, deletions, and duplicate names") {
    // hand-built registries: substitution (dist 2), deletion+insertion
    // (shifted segments), exact duplicate rows (weight collapse), and
    // a far key that must NOT pair
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    def reg(prefix: String, rows: Seq[(Int, String)]) = spark.createDataFrame(
      new java.util.ArrayList[Row](rows.map { case (n, k) =>
        Row(n, s"$prefix#$k"): Row
      }.asJava),
      StructType(Seq(StructField(s"${prefix.head.toLower}_nationkey", IntegerType),
        StructField(s"${prefix.head.toLower}_name", StringType))))
    val cRows = Seq(
      (1, "000000111"), (1, "000000111"), // duplicate name: weight 2
      (1, "123456789"),
      (2, "000000111")) // other block
    val sRows = Seq(
      (1, "000099111"), // dist 2 from 000000111 (two subs)
      (1, "012345678"), // one del + one ins from 123456789 (shifted)
      (1, "999999999"), // far from everything
      (2, "000000111")) // exact in block 2
    val cDf = reg("Customer", cRows)
    val sDf = reg("Supplier", sRows)
    // route through the real operator by writing a tiny scratch dir
    val dir = java.nio.file.Files.createTempDirectory("q122fix").toString
    cDf.write.mode("overwrite").parquet(s"$dir/customer.parquet")
    sDf.write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    val out = Audit.q122EntityResolution(spark, dir).collect()
      .map(r => r.getAs[Int]("nationkey") ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Long]("n_customers"), r.getAs[Long]("min_dist"))))
      .toMap
    // block 1: 000000111(w2)↔000099111 → 2 pairs dist 2;
    //          123456789↔012345678 → 1 pair dist 2 → 3 pairs, 2 customers
    assert(out(1) == ((3L, 2L, 2L)), s"block 1: ${out(1)}")
    // block 2: exact match, dist 0
    assert(out(2) == ((1L, 1L, 0L)), s"block 2: ${out(2)}")
  }

  test("q180 entity rollup: thresholding, chaining, multiplicities, keep-best canonical") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    def reg(prefix: String, rows: Seq[(Int, String, Double)]) = spark.createDataFrame(
      new java.util.ArrayList[Row](rows.map { case (n, k, bal) =>
        Row(n, s"$prefix#$k", bal): Row
      }.asJava),
      StructType(Seq(
        StructField(s"${prefix.head.toLower}_nationkey", IntegerType),
        StructField(s"${prefix.head.toLower}_name", StringType),
        StructField(s"${prefix.head.toLower}_acctbal", DoubleType))))
    val cDf = reg("Customer", Seq(
      (1, "000000100", 50.0), (1, "000000100", 50.0), // duplicate: weight 2
      (1, "000000200", -10.0), // its near pairs all balance-disagree → dropped
      (2, "000000300", -5.0))) // exact-name despite balance disagreement
    val sDf = reg("Supplier", Seq(
      (1, "000000100", 20.0),  // exact → links regardless of balance
      (1, "000000101", 70.0),  // dist 1, balance agrees → links; best balance
      (1, "000000201", 5.0),   // dist 2 from cust 100, agrees → CHAINS in;
                               // dist 1 from cust 200 but disagrees → no link
      (2, "000000300", 10.0)))
    val dir = java.nio.file.Files.createTempDirectory("q180fix").toString
    cDf.write.mode("overwrite").parquet(s"$dir/customer.parquet")
    sDf.write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    val out = Audit.q180EntityRollup(spark, dir).collect()
      .map(r => r.getAs[Long]("entity_id") ->
        ((r.getAs[Long]("n_records"), r.getAs[Long]("n_customers"),
          r.getAs[Long]("n_suppliers"), r.getAs[String]("canon_registry"),
          r.getAs[String]("canon_key"), r.getAs[Double]("canon_acctbal"))))
      .toMap
    // entity 200 = cust 100 (vid 200, w2) + supp 100/101/201 (vids
    // 201, 203, 403 — 201 chained through the customer): canonical is
    // supp 101 (highest balance 70)
    assert(out(200L) == ((5L, 2L, 3L, "supplier", "000000101", 70.0)),
      s"entity 200: ${out.get(200L)}")
    // entity 600 = the block-2 exact pair; customer 200 and its
    // sub-threshold neighbors appear nowhere
    assert(out(600L) == ((2L, 1L, 1L, "supplier", "000000300", 10.0)),
      s"entity 600: ${out.get(600L)}")
    assert(out.size == 2, s"entities: ${out.keySet}")
  }

  test("embeddingCovariance fails fast on ragged embeddings with a clear message") {
    val vecs = Seq(Array(1.0f, 2.0f), Array(3.0f)) // second vector short
    val df = spark.createDataset(vecs).repartition(1).toDF("embedding")
    val e = intercept[Exception] { Audit.embeddingCovariance(df).collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("ragged embedding")))
  }

  test("sourceBalance drops zero-token sources instead of corrupting the entropy sum") {
    // one whitespace-only source: ln(total/0) would be +Inf and
    // round(Inf).cast(long) = Long.MaxValue without the filter
    val docs = ((0 until 4).map(i => (s"s$i", "a b c d e")) :+ ("empty", " \t\n"))
      .toDF("source", "text")
    val r = Audit.sourceBalance(docs).collect().head
    assert(r.getAs[Long]("n_sources") == 4L)
    assert(r.getAs[Long]("total_tokens") == 20L)
    assert(math.abs(r.getAs[Double]("entropy_nats") - math.log(4.0)) < 1e-5)
  }

  test("sourceBalance: uniform distribution scores Gini 0, HHI 1/n, entropy ln n") {
    val docs = (0 until 4).map(i => (s"s$i", "a b c d e")).toDF("source", "text")
    val r = Audit.sourceBalance(docs).collect().head
    assert(r.getAs[Long]("n_sources") == 4L)
    assert(r.getAs[Long]("total_tokens") == 20L)
    assert(math.abs(r.getAs[Double]("gini")) < 1e-6)
    assert(math.abs(r.getAs[Double]("hhi") - 0.25) < 1e-9)
    assert(math.abs(r.getAs[Double]("entropy_nats") - math.log(4.0)) < 1e-5)
  }

  test("sourceBalance: full concentration scores Gini (n-1)/n, HHI ~1, entropy ~0") {
    // one source holds all but epsilon of the tokens
    val docs = Seq(("big", ("w " * 9999).trim), ("a", "x"), ("b", "x"), ("c", "x"))
      .toDF("source", "text")
    val r = Audit.sourceBalance(docs).collect().head
    assert(r.getAs[Double]("gini") > 0.74) // → 3/4 as epsilon → 0
    assert(r.getAs[Double]("hhi") > 0.99)
    assert(r.getAs[Double]("entropy_nats") < 0.01)
  }

  test("ngramNovelty: first doc is fully novel, exact copy is fully derivative") {
    val base = (1 to 12).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (10L, base),                      // first sighting of every gram
      (20L, base),                      // exact copy → nothing novel
      (30L, base + " fresh tail of new words here")) // mixed
      .toDF("doc_id", "text")
    val out = Audit.ngramNovelty(docs, n = 8).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(10L)._3 == 1.0)
    assert(out(20L)._3 == 0.0)
    assert(out(30L)._1 > out(10L)._1) // longer doc, more grams
    assert(out(30L)._3 > 0.0 && out(30L)._3 < 1.0)
    // novelty counts are consistent: novel grams across docs = distinct grams
    val totalNovel = out.values.map(_._2).sum
    val distinctGrams = Curation.ngramRows(docs, 8).select("g").distinct().count()
    assert(totalNovel == distinctGrams)
  }

  test("q131 calibration: z-scores are mean-0/var-1 per source; degenerate source -> 0") {
    val out = Audit.q131ScoreCalibration(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Double]("z")))
    val bySrc = out.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    bySrc.values.filter(_.length > 1).foreach { zs =>
      val mean = zs.sum / zs.length
      val v = zs.map(z => (z - mean) * (z - mean)).sum / zs.length
      assert(math.abs(mean) < 1e-9)
      assert(v == 0.0 || math.abs(v - 1.0) < 1e-9) // all-equal source → all z=0
    }
  }

  test("entity resolution: levenshtein blocking agrees with a brute-force check") {
    // brute force the same predicate on the sf0.001 tables
    val d = "/root/testdata/sf0.001"
    val out = Audit.q122EntityResolution(spark, d).collect()
      .map(r => r.getAs[Number]("nationkey").longValue -> r.getAs[Long]("n_pairs")).toMap
    val c = Tables.customer(spark, d)
      .select(col("c_nationkey").as("nk"), expr("substring(c_name, 10, 9)").as("a"))
    val s2 = Tables.supplier(spark, d)
      .select(col("s_nationkey").as("nk2"), expr("substring(s_name, 10, 9)").as("b"))
    val brute = c.crossJoin(s2)
      .filter(col("nk") === col("nk2") && levenshtein(col("a"), col("b")) <= 2)
      .groupBy(col("nk")).count()
      .collect().map(r => r.getAs[Number](0).longValue -> r.getLong(1)).toMap
    assert(out == brute)
  }
}
