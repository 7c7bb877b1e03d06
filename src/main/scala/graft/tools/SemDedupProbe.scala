package graft.tools

import java.nio.file.Files

import graft.ops.{Dedup, Similarity, Tables}
import org.apache.spark.sql.functions._

/** Recall diagnostic for the two SemDeDup blockings: how many of the
 *  UNBLOCKED near-dup drops (cosine ≥ τ to any earlier vector — the
 *  quadratic ground truth) does each cheap blocking recover?
 *
 *   - label-blocked (q92's oracle-checkable stand-in key)
 *   - IVF-cell-blocked (the durable production layout,
 *     [[graft.ops.Dedup.semDedupByCell]])
 *
 *  A blocked policy can only MISS drops (blocks partition the pair
 *  space), so recovered/true is a recall in [0, 1]. Numbers land in
 *  BASELINE.md. Usage: runMain graft.tools.SemDedupProbe [sfDir] */
object SemDedupProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val taus: Seq[Double] =
      if (args.length > 1) args.drop(1).map(_.toDouble).toSeq
      else Seq(0.45, 0.6, 0.8, 0.9, 0.95)
    val spark = graft.GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    graft.functions.GraftFunctions.register(spark)

    val layout = Files.createTempDirectory("semdedup_ivf").toString
    Similarity.ivfWritePartitioned(spark, d, layout)

    // the q137 gate's truth subsample: quadratics bounded by the cap
    // (prefix-closed, so the restriction is exact — Dedup scaladoc)
    val cap = Dedup.SemDedupTruthCap
    val e = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
      .filter(col("vec_id") < cap)
    // unblocked ground truth per τ: a vector is a true drop iff ANY
    // earlier vector is within τ — the O(n²) scan the blockings
    // exist to avoid; one quadratic pass serves every τ
    val pairSims = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("sim", round(graft.functions.GraftFunctions
        .cosine_sim(col("a.embedding"), col("b.embedding")), 6))
      .filter(col("sim") >= taus.min)
      .select(col("b.vec_id").as("vec_id"), col("sim"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))

    def drops(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.filter(col("dropped") === 1).select(col("vec_id"))
        .collect().map(_.getLong(0)).toSet

    val cappedLayout = spark.read.parquet(layout)
      .select(col("vec_id"), col("cell"), col("v"))
      .filter(col("vec_id") < cap)
    taus.foreach { tau =>
      val truth = pairSims.collect { case (v, s) if s >= tau => v }.toSet
      val byLabel = drops(Dedup.q92SemanticDedup(spark, d))
        .intersect(truth) // q92 runs at its own fixed τ; report overlap
      val byCell = drops(Dedup.semDedupCappedPolicy(cappedLayout, tau))
      val byMulti = drops(Dedup.semDedupMultiProbeCapped(spark, d, tau))
      def pct(hit: Set[Long]): String =
        if (truth.isEmpty) "n/a"
        else f"${hit.intersect(truth).size}%d/${truth.size}%d = ${hit.intersect(truth).size * 100.0 / truth.size}%.1f%%"
      println(s"[semdedup] corpus=$d cap=$cap tau=$tau true_drops=${truth.size}")
      println(s"[semdedup]   label-blocked(q92@0.45) overlap: ${pct(byLabel)}")
      println(s"[semdedup]   ivf-cell-blocked recall: ${pct(byCell)}")
      println(s"[semdedup]   ivf-cell multi-probe(2) recall: ${pct(byMulti)}")
      // blocked drops are a subset of true drops by construction; any
      // excess would mean the blocking manufactured a pair — impossible
      assert(byCell.subsetOf(truth))
      // the primary cell is always probed, so multi-probe can only add
      assert(byCell.subsetOf(byMulti) && byMulti.subsetOf(truth))
    }

    // the corpus-scaled blocking (semDedupScaled): cell population
    // stays ~ScaledCellPop at every octave, so full-corpus pair work
    // (Σ_cell C(pop,2)) grows LINEARLY with the corpus — report the
    // measured population spread and pair-work total, plus recall on
    // the same capped subsample at the q137 τ
    val scaledDir = Files.createTempDirectory("semdedup_scaled").toString
    val k = Similarity.ivfWriteScaled(spark, d, scaledDir)
    val st = spark.read.parquet(scaledDir).groupBy(col("cell"))
      .agg(count(org.apache.spark.sql.functions.lit(1)).as("n"))
      .agg(count(org.apache.spark.sql.functions.lit(1)).as("cells"),
        max(col("n")).as("max_pop"), avg(col("n")).as("avg_pop"),
        sum(col("n") * (col("n") - 1) / 2).as("pair_work")).head()
    println(f"[semdedup] scaled blocking: k=$k cells=${st.getLong(0)} " +
      f"avg_pop=${st.getDouble(2)}%.0f max_pop=${st.getLong(1)} pair_work=${st.getDouble(3)}%.0f")
    val truth045 = pairSims.collect { case (v, s) if s >= 0.45 => v }.toSet
    val byScaled = drops(Dedup.semDedupCappedPolicy(
      spark.read.parquet(scaledDir).select(col("vec_id"), col("cell"), col("v"))
        .filter(col("vec_id") < cap), 0.45))
    if (truth045.nonEmpty)
      println(f"[semdedup] scaled recall@0.45 (capped): " +
        f"${byScaled.intersect(truth045).size}%d/${truth045.size}%d")
    assert(byScaled.subsetOf(truth045))

    // time the FULL-CORPUS deployment path once per octave: layout
    // write + within-cell policy over every vector (the quadratic the
    // per-round bench deliberately does not pay — q137 scaladoc);
    // numbers land in BASELINE's wall-vs-octave table
    val t0 = System.nanoTime()
    val timedDir = Files.createTempDirectory("semdedup_scaled_full").toString
    val full = Dedup.semDedupScaled(spark, d, timedDir, 0.45)
    val nDrops = full.filter(col("dropped") === 1).count()
    val nAll = full.count()
    println(f"[semdedup] scaled FULL-corpus policy: " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s wall (layout write + policy), " +
      f"drops=$nDrops%d of $nAll%d vectors")
    spark.stop()
  }
}
