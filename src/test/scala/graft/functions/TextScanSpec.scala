package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** The native single-pass counters (TextScan.scala) claim EXACT
  * equivalence with the regex formulations the DuckDB oracle runs.
  * This suite pins that claim: every counter is compared against
  * Spark's own `regexp_count` on adversarial fixtures and on
  * property-generated strings over an alphabet chosen to hit the
  * boundary cases (underscore = word char but punct; unicode and
  * supplementary-plane chars = punct, non-word, non-ws; all five
  * ASCII whitespace variants; digit/letter run transitions). */
class TextScanSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private val markers = Seq("the", "a", "of", "and", "to", "in")

  /** `compareMarkers = false` skips the word_hits-vs-Java-regex leg:
    * Java's `\b` is UNICODE-aware even without UNICODE_CHARACTER_CLASS
    * (Pattern.Bound.isWord = `_ || Character.isLetterOrDigit`), while
    * DuckDB's RE2 `\b` is ASCII `[0-9A-Za-z_]`. WordHits implements
    * the RE2/DuckDB semantics — the ORACLE's — so on text where a
    * marker abuts a non-ASCII letter ("ßof") the native scanner and
    * the oracle agree (hit) and Java regexp_count disagrees (no hit).
    * The old regex implementation had this latent oracle divergence;
    * the scanner fixes it (pinned in the dedicated test below). */
  private def compareAll(texts: Seq[String], compareMarkers: Boolean = true): Unit = {
    val df = (texts.zipWithIndex.map { case (t, i) => (i.toLong, t) } :+
      (texts.size.toLong, null.asInstanceOf[String]))
      .toDF("id", "text")
    val alt = markers.mkString("\\b(", "|", ")\\b")
    val rows = df.select(
      graft.ops.TextAnalysis.tokenCount(col("text")).as("w_new"),
      regexp_count(col("text"), lit("\\S+")).cast("long").as("w_re"),
      graft.ops.TextAnalysis.punctCount(col("text")).as("p_new"),
      regexp_count(col("text"), lit("[^A-Za-z0-9\\s]")).cast("long").as("p_re"),
      graft.ops.TextAnalysis.bpeTokenCount(col("text")).as("b_new"),
      regexp_count(col("text"), lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")).cast("long").as("b_re"),
      graft.ops.TextAnalysis.markerScore(lower(col("text")), markers).as("m_new"),
      regexp_count(lower(col("text")), lit(alt)).cast("long").as("m_re"),
      col("text")).collect()
    rows.foreach { r =>
      assert(r.get(0) == r.get(1), s"n_words mismatch on ${r.get(8)}")
      assert(r.get(2) == r.get(3), s"n_punct mismatch on ${r.get(8)}")
      assert(r.get(4) == r.get(5), s"bpe_tokens mismatch on ${r.get(8)}")
      if (compareMarkers)
        assert(r.get(6) == r.get(7), s"marker mismatch on ${r.get(8)}")
    }
  }

  test("fixtures: boundary cases match the regex contract (incl. NULL)") {
    compareAll(Seq(
      "", " ", "\t\n\u000B\f\r", "_", "a_b the", "the", " the ", "a",
      "aa", "a a", "the_", "_the", "x.the,of;a", "héllo wörld the",
      "𝄞a𝄞", "a1 11 b2c 2a2", "abc123_def", "a\u000Bb the\u000Bof",
      "THE The tHe", "don't stop the", "1_2", "of!of?of", "to" * 50,
      "  leading the  trailing  ", "a\u000Bb\fc", "ünïcödé_mix the9"))
  }

  test("property: generated strings over the adversarial alphabet match") {
    val piece = Gen.frequency(
      6 -> Gen.oneOf(markers),
      4 -> Gen.oneOf("a", "z", "Q", "the", "then", "ofa", "andto"),
      3 -> Gen.oneOf("0", "7", "42", "a1b"),
      3 -> Gen.oneOf("_", ".", ",", "!", "'", "\"", "-", "(", ")"),
      2 -> Gen.oneOf("é", "ß", "中", "𝄞"),
      5 -> Gen.oneOf(" ", "\t", "\n", "\u000B", "\f", "\r", "  "))
    val textGen = Gen.listOf(piece).map(_.mkString)
    val samples = Gen.listOfN(400, textGen).sample.get
    // unicode-letter-adjacent markers are exactly where Java \b and
    // the RE2/DuckDB \b disagree — markers compared ASCII-only below
    compareAll(samples, compareMarkers = false)
  }

  test("property: ASCII-only strings — markers match Java regex too") {
    val piece = Gen.frequency(
      6 -> Gen.oneOf(markers),
      4 -> Gen.oneOf("a", "z", "Q", "the", "then", "ofa", "andto"),
      3 -> Gen.oneOf("0", "7", "42", "a1b"),
      3 -> Gen.oneOf("_", ".", ",", "!", "'", "\"", "-", "(", ")"),
      5 -> Gen.oneOf(" ", "\t", "\n", "", "\f", "\r", "  "))
    val textGen = Gen.listOf(piece).map(_.mkString)
    val samples = Gen.listOfN(400, textGen).sample.get
    compareAll(samples)
  }

  test("word_hits keeps the ORACLE's ASCII \\b where Java regex diverges") {
    val set = WordHits.compile("of")
    // RE2/DuckDB: ß is not a word char -> boundary before 'o' -> hit.
    // Java \b is unicode-aware (Bound.isWord) -> "ßof" is one word,
    // no hit. The oracle gate runs DuckDB, so the scanner is right.
    assert(WordHits.hits("ßof", set) == 1L)
    assert(WordHits.hits("ß of ß", set) == 1L)
    assert(WordHits.hits("_of", set) == 0L) // _ IS a word char both ways
    assert(!java.util.regex.Pattern.compile("\\b(of)\\b")
      .matcher("ßof").find(), "Java \\b went ASCII: fold the marker " +
      "property tests back into one unicode alphabet")
  }

  test("word_hits rejects non-word-char markers at construction") {
    intercept[IllegalArgumentException] {
      WordHits.compile("ok,not ok")
    }
    intercept[IllegalArgumentException] {
      WordHits.compile("a,,b")
    }
  }
}
