package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Smoke-checks the derived-scale generator: counts, key shifts,
  * referential consistency, the per-copy document/embedding
  * perturbations, and the micros-timestamp events carrier. */
class ScaleGenSpec extends AnyFunSuite with SparkSuite {

  test("ScaleGen.run amplifies, shifts keys consistently, and perturbs non-zero copies") {
    val out = java.nio.file.Files.createTempDirectory("graftscalegen").toString
    ScaleGen.run(spark, "/root/testdata/sf0.001", out, copies = 2)
    def tbl(n: String) = spark.read.parquet(s"$out/$n.parquet")

    // dimensions stay 1×, facts amplify exactly copies×
    assert(tbl("region").count() == 5 && tbl("nation").count() == 25)
    val li0 = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").count()
    assert(tbl("lineitem").count() == 2 * li0 + ScaleGen.SeedLineitemRows)

    // referential consistency: every copy-1 lineitem joins a copy-1
    // order under the shifted keys — join selectivity is unchanged
    // (the graph-seed rows carry their own matching orders)
    val joined = tbl("lineitem").join(tbl("orders"), col("l_orderkey") === col("o_orderkey"))
    assert(joined.count() == tbl("lineitem").count())

    // the graph seed pack populates the octave gates: a 3-core with
    // at least the 6-part clique, and the {11,197} wedge pair
    val core = graft.ops.Graph.q168KCore(spark, out)
    assert(core.filter(col("part_id").between(1, 6)).count() == 6,
      "seeded clique missing from the 3-core")
    val lp = graft.ops.Graph.q170LinkPredict(spark, out)
    assert(lp.filter(col("u") === 11 && col("v") === 197).count() == 1,
      "seeded wedge pair missing from link prediction")

    // copy-0 documents byte-identical to source; copy-1 token-suffixed
    // (no shingle collisions across copies) with recomputed n_chars
    val src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val d = tbl("documents")
    assert(d.filter(col("doc_id") < ScaleGen.Off).count() == src.count())
    val c1 = d.filter(col("doc_id") >= ScaleGen.Off)
    // EVERY token must carry the copy suffix — a single-token check
    // would pass even if cross-copy shingle collisions returned
    assert(c1.filter(exists(split(col("text"), "\\s+"),
      t => !t.rlike("_c1$"))).count() == 0)
    assert(c1.filter(col("n_chars") =!= length(col("text"))).count() == 0)

    // copy-0 embeddings exact, copy-1 perturbed but near (cosine > 0.99)
    graft.functions.GraftFunctions.register(spark)
    val e = tbl("embeddings")
    val pair = e.filter(col("vec_id") === 0).select(col("embedding").as("a"))
      .crossJoin(e.filter(col("vec_id") === ScaleGen.Off).select(col("embedding").as("b")))
      .select(graft.functions.GraftFunctions.cosine_sim(col("a"), col("b")).as("sim"))
      .head.getDouble(0)
    assert(pair > 0.99 && pair < 1.0, s"copy-1 vector should be a near-clone, sim=$pair")

    // blocking-key cardinality scales with the corpus: per-copy label
    // shift keeps q25's block size invariant (the 50× gate measured
    // the fixed-label alternative at 2500× the block-local work)
    val srcLabels = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("label")).distinct().count()
    assert(e.select(col("label")).distinct().count() == 2 * srcLabels)
    assert(e.filter(col("vec_id") >= ScaleGen.Off)
      .filter(col("label") < 1000).count() == 0, "copy-1 labels unshifted")

    // events carry micros timestamps (oracle- and Tables-compatible)
    assert(tbl("events").schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(graft.ops.Tables.events(spark, out).count() == 2 *
      graft.ops.Tables.events(spark, "/root/testdata/sf0.001").count())
  }
}
