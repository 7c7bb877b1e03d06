package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized (seeded) equivalence proofs for the single-pass text
  * scoring rewrites: the combined formulations must count exactly
  * what the per-pattern formulations counted, over texts crafted to
  * hit the adversarial shapes (markers adjacent to each other,
  * markers embedded in longer words, overlapping n-grams). */
class TextScoringPropertySpec extends AnyFunSuite with SparkSuite {

  private val rnd = new scala.util.Random(20260812L)

  // vocabulary stresses the boundary cases: marker words, words that
  // CONTAIN marker words (theory/sand/oft), punctuation islands
  private val vocab = Seq("the", "a", "of", "and", "to", "in",
    "theory", "sand", "oft", "into", "band", "other",
    "x", "yz", "...", "a,the", "the.", "(a)", "--")

  private def randomText(): String =
    (0 until rnd.nextInt(60)).map(_ => vocab(rnd.nextInt(vocab.size)))
      .mkString(" ")

  test("alternation markerScore == summed per-word regexp_count (500 random texts)") {
    import spark.implicits._
    val words = TextAnalysis.StopWords
    val texts = (0 until 500).map(_ => randomText()).toDF("text")
    def summed = words
      .map(w => regexp_count(col("text"), lit("\\b" + w + "\\b")).cast("long"))
      .reduce(_ + _)
    val diffs = texts.select(
      TextAnalysis.markerScore(col("text"), words).as("one_pass"),
      summed.as("per_word"))
      .filter(col("one_pass") =!= col("per_word"))
      .count()
    assert(diffs == 0)
  }

  test("replace-length-delta n-gram count == quoted-regex count (500 random texts)") {
    import spark.implicits._
    // grams overlap each other ("th"/"he") and themselves ("aa")
    val grams = Seq("th", "he", "aa", "and", "a", " ", "..")
    val texts = (0 until 500).map(_ => randomText() + " aaaa ..th ..he").toDF("text")
    grams.foreach { g =>
      val diffs = texts.select(
        ((length(col("text")) - length(replace(col("text"), lit(g), lit("")))) / lit(g.length))
          .cast("long").as("delta"),
        regexp_count(col("text"), lit(java.util.regex.Pattern.quote(g))).cast("long").as("rx"))
        .filter(col("delta") =!= col("rx"))
        .count()
      assert(diffs == 0, s"gram '$g' disagrees")
    }
  }
}
