package graft.tools

import java.nio.file.Files

import graft.ops.{Similarity, Tables}
import org.apache.spark.sql.functions._

/** Scale probe for the two-level (coarse×fine) IVF tier: runs the
 *  corpus-scaled blocking layout at an octave where the cell count
 *  EXCEEDS the 2048-cell driver-fit ceiling (the round-9 verdict's
 *  one design-scale flag — past ~1M vectors the flat tier's per-cell
 *  population resumed linear growth), and reports the population
 *  spread that proves the quadratic stays bounded:
 *
 *   - k (the scaled cell count actually demanded — must be > 2048
 *     for the probe to mean anything; asserted),
 *   - realized cells, max/avg cell population, Σ C(pop, 2) pair work
 *     (the within-cell quadratic the blocking bounds),
 *   - wall time of the full layout write (coarse driver fit + one
 *     corpus pass fusing the distributed fine fits with assignment).
 *
 *  Numbers land in BASELINE.md. The input dir needs only
 *  embeddings.parquet — derive it with
 *  `runMain graft.ScaleGen <src> <out> <copies> embeddings`.
 *  Usage: runMain graft.tools.TwoLevelIvfProbe [sfDir] */
object TwoLevelIvfProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_emb600x")
    val spark = graft.GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val n = Tables.embeddings(spark, d).count()
    val k = Similarity.scaledCellCount(n)
    println(s"[twolevel] corpus=$d vectors=$n scaled_k=$k " +
      s"(flat ceiling ${Similarity.KMeansSample})")
    assert(k > Similarity.KMeansSample,
      s"probe octave too small: k=$k does not exceed the flat ceiling — " +
        "derive a bigger embeddings dir")
    val out = Files.createTempDirectory("twolevel_ivf").toString
    val t0 = System.nanoTime()
    val kUsed = Similarity.ivfWriteScaled(spark, d, out)
    val wall = (System.nanoTime() - t0) / 1e9
    val st = spark.read.parquet(out).groupBy(col("cell"))
      .agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("cells"), max(col("n")).as("max_pop"),
        avg(col("n")).as("avg_pop"),
        sum(col("n") * (col("n") - 1) / 2).as("pair_work"),
        sum(col("n")).as("assigned"))
      .head()
    println(f"[twolevel] k=$kUsed%d cells=${st.getLong(0)}%d " +
      f"max_pop=${st.getLong(1)}%d avg_pop=${st.getDouble(2)}%.0f " +
      f"pair_work=${st.getDouble(3)}%.0f wall=$wall%.1f s")
    assert(st.getLong(4) == n, "layout lost or duplicated vectors")
    // the claim under test: the within-cell quadratic stays bounded —
    // no cell holds more than a small multiple of the ~500 design
    // population (the flat tier at this octave would have been forced
    // to pack n/2048 ≈ wider cells)
    val flatForcedPop = n / Similarity.KMeansSample
    println(s"[twolevel] flat tier would have forced avg pop ≈ $flatForcedPop; " +
      s"two-level max pop = ${st.getLong(1)}")
    spark.stop()
  }
}
