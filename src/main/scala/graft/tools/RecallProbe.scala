package graft.tools

import graft.ops.{Dedup, Tables}
import org.apache.spark.sql.functions._

/** Recall diagnostics for the approximate dedup/ANN operators at an
 *  arbitrary scale factor — prints, for every exact-Jaccard pair at
 *  or above the q61 floors, whether each sketch surfaced it and (for
 *  SimHash) the pair's actual Hamming distance, separating "banding
 *  guarantee violated" (Hamming ≤ 6 missed — a BUG: the pair-block
 *  banding structurally guarantees those) from the documented
 *  probabilistic window (7..12) and pairs outside the operator's own
 *  ≤12 Hamming acceptance. Usage: runMain graft.tools.RecallProbe [sfDir] */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val sh = Dedup.shingleRows(Tables.documents(spark, d)).localCheckpoint(true)
    val exact = Dedup.jaccardPairsFromShingles(sh, 0.6)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    val mh = Dedup.minhashEstPairs(sh)
      .select(col("doc_a"), col("doc_b"), lit(1).as("mh"))
    val sigs = Dedup.simhashSignatures(sh)
    val sp = Dedup.simhashPairsFromSigs(sigs)
      .select(col("doc_a"), col("doc_b"), lit(1).as("sh"))
    val joined = exact
      .join(mh, Seq("doc_a", "doc_b"), "left")
      .join(sp, Seq("doc_a", "doc_b"), "left")
      .join(sigs.select(col("doc_id").as("doc_a"), col("simhash").as("ha")), Seq("doc_a"))
      .join(sigs.select(col("doc_id").as("doc_b"), col("simhash").as("hb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("jaccard"),
        col("mh").isNotNull.as("minhash_hit"), col("sh").isNotNull.as("simhash_hit"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
      .localCheckpoint(true)
    val tot = joined.count()
    val mhMiss = joined.filter(!col("minhash_hit")).count()
    val hi = joined.filter(col("jaccard") >= 0.9)
    val hiTot = hi.count()
    // three disjoint miss classes: ≤6 violates the pair-block banding
    // guarantee (a BUG); 7..12 is the documented probabilistic window;
    // >12 is outside the operator's own Hamming acceptance (simhash
    // model error for that pair, unreachable by any banding)
    val shMissGuaranteed = hi.filter(!col("simhash_hit") && col("hamming") <= 6).count()
    val shMissWindow = hi.filter(!col("simhash_hit") &&
      col("hamming") >= 7 && col("hamming") <= 12).count()
    val shMissModel = hi.filter(!col("simhash_hit") && col("hamming") > 12).count()
    println(s"[recallprobe] sf=$d exact_pairs>=0.6=$tot minhash_missed=$mhMiss")
    println(s"[recallprobe] pairs>=0.9=$hiTot simhash_missed_hamming<=6=$shMissGuaranteed (GUARANTEE VIOLATION) " +
      s"missed_7..12=$shMissWindow (probabilistic window) missed_>12=$shMissModel (outside operator acceptance)")
    hi.filter(!col("simhash_hit")).orderBy(col("doc_a"))
      .collect().take(20).foreach(r => println(s"[recallprobe] missed ${r.mkString(" ")}"))
    spark.stop()
  }
}
