package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators over `documents` — the training-data
 * pipeline surface: language ID (marker-word heuristic), quality
 * scoring, token counting (whitespace + BPE-ish regex), and document
 * fingerprinting (md5 of the normalized text).
 *
 * Every operator is a narrow per-row projection (no shuffle except
 * the final presentation sort), built entirely from codegen'd
 * built-ins — at 100 TB these run at scan speed with full
 * column pruning.
 */
object TextAnalysis {
  import Tables._

  // every count is cast to BIGINT: Spark's regexp_count/length return
  // INT while DuckDB returns BIGINT — outputs must agree for the
  // driver's schema check
  def tokenCount(c: Column): Column =
    regexp_count(c, lit("\\S+")).cast("long")

  /** Total whole-word hits for ANY of `words` in ONE text scan: a
   *  single alternation regex replaces the per-word regexp_count pass
   *  (16+ scans/row across q28/q29/q54 before). Counts are identical
   *  to summed per-word counts — every word occurrence matches exactly
   *  one alternative and consumes the whole word, so alternatives
   *  can't overlap. */
  def markerScore(c: Column, words: Seq[String]): Column =
    regexp_count(c, lit(words.mkString("\\b(", "|", ")\\b"))).cast("long")

  /** Quality-score building blocks, shared with CorpusPipeline. */
  val StopWords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")
  def punctCount(c: Column): Column =
    regexp_count(c, lit("[^A-Za-z0-9\\s]")).cast("long")
  /** The ONE quality formula, over precomputed signal columns —
    * qualityScore (q54) and q29 both route through it so the two
    * surfaces cannot drift. */
  def qualityFormula(words: Column, stop: Column, punct: Column): Column =
    least(words, lit(100)) + lit(2) * stop - punct
  def qualityScore(c: Column): Column =
    qualityFormula(tokenCount(c), markerScore(lower(c), StopWords), punctCount(c))

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "das", "und"),
    "es" -> Seq("el", "la", "los", "y"),
    "fr" -> Seq("le", "les", "des", "et"))

  /** Language ID: argmax of per-language marker-word hit counts;
   *  ties resolve in fixed language order (first CASE match wins),
   *  'und' when no marker matches at all. */
  def q28LangId(s: SparkSession, d: String): DataFrame = {
    val text = lower(col("text"))
    val scored = documents(s, d).select(
      col("doc_id") +: langMarkers.map { case (l, ws) => markerScore(text, ws).as(s"score_$l") }: _*)
    val langs = langMarkers.map(_._1)
    val mx = greatest(langs.map(l => col(s"score_$l")): _*)
    val best = langs.foldRight(lit("und"): Column) { (l, rest) =>
      when(col(s"score_$l") === mx, lit(l)).otherwise(rest)
    }
    scored
      .withColumn("predicted", when(mx <= 0, lit("und")).otherwise(best))
      .orderBy(col("doc_id"))
  }

  val q28Sql: String = {
    def sc(l: String): String = langMarkers.toMap.apply(l)
      .map(w => s"len(regexp_extract_all(lower(text), '\\b$w\\b'))").mkString(" + ")
    val langs = langMarkers.map(_._1)
    val mx = s"greatest(${langs.map(l => s"score_$l").mkString(", ")})"
    val cases = langs.map(l => s"WHEN score_$l = $mx THEN '$l'").mkString(" ")
    s"""SELECT doc_id, ${langs.map(l => s"score_$l").mkString(", ")},
       | CASE WHEN $mx <= 0 THEN 'und' $cases END AS predicted
       |FROM (SELECT doc_id, ${langs.map(l => s"${sc(l)} AS score_$l").mkString(", ")}
       |      FROM documents) t
       |ORDER BY doc_id""".stripMargin
  }

  /** Character n-gram profiles per language: counts of distinctive
   *  char bigrams/trigrams (no word boundaries — robust to
   *  agglutinative scripts where marker WORDS fail). */
  private val charNgramProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("th", "he", "ing", "er"),
    "de" -> Seq("sch", "ch", "ei", "ung"),
    "es" -> Seq("ll", "ción", "que", "os "),
    "fr" -> Seq("eau", "oux", "les", "ée"))

  /** Language ID via char-n-gram profile scoring — same argmax
   *  contract as q28 but over substring counts. */
  def q60LangIdNgram(s: SparkSession, d: String): DataFrame = {
    val text = lower(col("text"))
    // overlapping grams ("th"/"he" in "the") forbid one alternation
    // regex here — but substring counts don't need regex at all: the
    // length-delta-of-replace trick is a plain memchr-style scan per
    // gram (the DuckDB oracle uses the identical formulation)
    def score(grams: Seq[String]): Column =
      grams.map(g =>
        ((length(text) - length(replace(text, lit(g), lit("")))) / lit(g.length)).cast("long"))
        .reduce(_ + _)
    val scored = documents(s, d).select(
      col("doc_id") +: charNgramProfiles.map { case (l, gs) => score(gs).as(s"ng_$l") }: _*)
    val langs = charNgramProfiles.map(_._1)
    val mx = greatest(langs.map(l => col(s"ng_$l")): _*)
    val best = langs.foldRight(lit("und"): Column) { (l, rest) =>
      when(col(s"ng_$l") === mx, lit(l)).otherwise(rest)
    }
    scored
      .withColumn("predicted", when(mx <= 0, lit("und")).otherwise(best))
      .orderBy(col("doc_id"))
  }

  val q60Sql: String = {
    val langs = charNgramProfiles.map(_._1)
    def sc(l: String): String = charNgramProfiles.toMap.apply(l)
      // literal (non-regex) substring counts: how many times does g occur
      .map(g => s"CAST((length(lower(text)) - length(replace(lower(text), '$g', ''))) / length('$g') AS BIGINT)")
      .mkString(" + ")
    val mx = s"greatest(${langs.map(l => s"ng_$l").mkString(", ")})"
    val cases = langs.map(l => s"WHEN ng_$l = $mx THEN '$l'").mkString(" ")
    s"""SELECT doc_id, ${langs.map(l => s"ng_$l").mkString(", ")},
       | CASE WHEN $mx <= 0 THEN 'und' $cases END AS predicted
       |FROM (SELECT doc_id, ${langs.map(l => s"${sc(l)} AS ng_$l").mkString(", ")}
       |      FROM documents) t
       |ORDER BY doc_id""".stripMargin
  }

  /** Quality scoring: integer-arithmetic signals (word count, char
   *  count, punct count, stopword hits) → deterministic score. */
  def q29TextQuality(s: SparkSession, d: String): DataFrame = {
    val text = col("text")
    documents(s, d).select(
      col("doc_id"),
      length(text).cast("long").as("n_chars"),
      tokenCount(text).as("n_words"),
      punctCount(text).as("n_punct"),
      markerScore(lower(text), StopWords).as("n_stop"))
      .withColumn("quality_score",
        qualityFormula(col("n_words"), col("n_stop"), col("n_punct")))
      .withColumn("quality_bucket",
        when(col("quality_score") >= 30, "high")
          .when(col("quality_score") >= 15, "medium").otherwise("low"))
      .orderBy(col("doc_id"))
  }

  val q29Sql: String = {
    val stop = StopWords
      .map(w => s"len(regexp_extract_all(lower(text), '\\b$w\\b'))").mkString(" + ")
    s"""SELECT doc_id, n_chars, n_words, n_punct, n_stop,
       | least(n_words, 100) + 2*n_stop - n_punct AS quality_score,
       | CASE WHEN least(n_words, 100) + 2*n_stop - n_punct >= 30 THEN 'high'
       |      WHEN least(n_words, 100) + 2*n_stop - n_punct >= 15 THEN 'medium'
       |      ELSE 'low' END AS quality_bucket
       |FROM (SELECT doc_id, length(text) AS n_chars,
       |       len(regexp_extract_all(text, '[^ \\t\\n\\v\\f\\r]+')) AS n_words,
       |       len(regexp_extract_all(text, '[^A-Za-z0-9 \\t\\n\\v\\f\\r]')) AS n_punct,
       |       $stop AS n_stop
       |      FROM documents) t
       |ORDER BY doc_id""".stripMargin
  }

  /** Token counting: whitespace tokens + a BPE-ish regex tokenizer
   *  (letter runs / single digits / single punctuation marks). */
  def q30TokenCount(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"),
      tokenCount(col("text")).as("ws_tokens"),
      regexp_count(col("text"), lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")).cast("long").as("bpe_tokens"),
      length(col("text")).cast("long").as("len"))
      .withColumn("tokens_per_100chars",
        round(col("bpe_tokens") * lit(100.0) / greatest(col("len"), lit(1)), 4))
      .drop("len")
      .orderBy(col("doc_id"))

  val q30Sql: String =
    """SELECT doc_id,
      | len(regexp_extract_all(text, '[^ \t\n\v\f\r]+')) AS ws_tokens,
      | len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\n\v\f\r]')) AS bpe_tokens,
      | round(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\n\v\f\r]')) * 100.0
      |       / greatest(length(text), 1), 4) AS tokens_per_100chars
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Whitespace-collapsed lowercase text — the shared dedup key
   *  normalization (fingerprints, exact dedup, pipeline). */
  def normalizeText(c: Column): Column =
    regexp_replace(trim(lower(c)), "\\s+", " ")

  /** Document fingerprint: md5 over the normalized text — the
   *  canonical near-exact-dedup key. */
  def fingerprint(c: Column): Column =
    md5(normalizeText(c).cast("binary"))

  def q21Fingerprint(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("fp", fingerprint(col("text")))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_dups"))
      .orderBy(col("keeper"))

  val q21Sql: String =
    """SELECT md5(regexp_replace(trim(lower(text)), '[ \t\n\v\f\r]+', ' ', 'g')) AS fp,
      | min(doc_id) AS keeper, count(*) AS n_dups
      |FROM documents
      |GROUP BY 1 ORDER BY keeper""".stripMargin

  /** Rolling-hash document fingerprint (native graft_rolling_hash
   *  expression over the normalized text) — the oracle reproduces the
   *  identical polynomial fold via list_reduce over code points. */
  def q41RollingFingerprint(s: SparkSession, d: String): DataFrame = {
    graft.functions.RollingHash.register(s)
    documents(s, d).select(
      col("doc_id"),
      graft.functions.RollingHash.rolling_hash(normalizeText(col("text"))).as("rh"))
      .orderBy(col("doc_id"))
  }

  /** Corpus-wide heavy hitters via the custom space-saving
   *  TypedImperativeAggregate (graft.functions.HeavyHitters) —
   *  capacity 4096 exceeds this corpus's vocabulary, so the sketch is
   *  exact and oracle-checkable against a plain count. */
  def q53HeavyHitters(s: SparkSession, d: String): DataFrame = {
    graft.functions.HeavyHitters.register(s)
    // HeavyHitters.eval returns its array already sorted by
    // (cnt desc, item asc) — posexplode derives the rank directly, a
    // pure per-row expression over the single aggregate output: no
    // global Window.orderBy (single-partition exchange) and no
    // re-sort duplicating the sketch's own tie-break
    documents(s, d)
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
      .agg(graft.functions.HeavyHitters.heavy_hitters(col("tok"), 10, 4096).as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("e.item").as("token"), col("e.cnt").as("cnt"),
        (col("pos") + 1).cast("long").as("rnk"))
      .orderBy(col("rnk"))
  }

  val q53Sql: String =
    """SELECT token, cnt, rnk FROM (
      | SELECT token, cnt, row_number() OVER (ORDER BY cnt DESC, token) AS rnk
      | FROM (
      |  SELECT tok AS token, count(*) AS cnt FROM (
      |   SELECT unnest(string_split_regex(trim(text), '[ \t\n\v\f\r]+')) AS tok FROM documents) u
      |  GROUP BY 1) c ) r
      |WHERE rnk <= 10 ORDER BY rnk""".stripMargin

  val q41Sql: String =
    """SELECT doc_id,
      | list_reduce(
      |   list_prepend(7::BIGINT,
      |     list_transform(
      |       list_filter(
      |         string_split_regex(regexp_replace(trim(lower(text)), '[ \t\n\v\f\r]+', ' ', 'g'), ''),
      |         x -> x <> ''),
      |       x -> unicode(x)::BIGINT)),
      |   (acc, c) -> (acc * 31 + c) % 2147483647) AS rh
      |FROM documents ORDER BY doc_id""".stripMargin
}
