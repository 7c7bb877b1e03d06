package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  // the hot text counters are ONE fused native scan (TextScan.scala)
  // instead of a regex pass per signal — the regex formulations remain
  // the SEMANTIC CONTRACT (the DuckDB oracle runs them; TextScanSpec
  // pins the equivalence property-wise). All outputs are BIGINT to
  // match DuckDB's widths.
  private def regScan(): Unit =
    org.apache.spark.sql.SparkSession.getActiveSession.foreach { s =>
      graft.functions.TextCounts.register(s)
      graft.functions.WordHits.register(s)
    }

  /** ≡ `regexp_count(c, "\\S+")`: maximal non-whitespace runs. */
  def tokenCount(c: Column): Column = {
    regScan()
    graft.functions.TextCounts.text_counts(c).getField("n_words")
  }

  /** Total whole-word hits for ANY of `words` in ONE text scan —
   *  ≡ `regexp_count(c, "\\b(w1|w2|…)\\b")` for word-char-only
   *  markers: every occurrence is a maximal word-char run equal to
   *  one marker, so alternatives can't overlap and the set-membership
   *  scan counts exactly what the alternation regex counts. */
  def markerScore(c: Column, words: Seq[String]): Column = {
    regScan()
    graft.functions.WordHits.word_hits(c, words)
  }

  /** Quality-score building blocks, shared with CorpusPipeline. */
  val StopWords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** ≡ `regexp_count(c, "[^A-Za-z0-9\\s]")`. */
  def punctCount(c: Column): Column = {
    regScan()
    graft.functions.TextCounts.text_counts(c).getField("n_punct")
  }

  /** ≡ `regexp_count(c, "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")` — the
   *  BPE-ish tokenizer: greedy letter runs + single digits + punct. */
  def bpeTokenCount(c: Column): Column = {
    regScan()
    graft.functions.TextCounts.text_counts(c).getField("bpe_tokens")
  }
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
       | CASE WHEN $mx <= 0 THEN 'und' $cases ELSE 'und' END AS predicted
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
       | CASE WHEN $mx <= 0 THEN 'und' $cases ELSE 'und' END AS predicted
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
      bpeTokenCount(col("text")).as("bpe_tokens"),
      length(col("text")).cast("long").as("len"))
      .withColumn("tokens_per_100chars",
        col("bpe_tokens") * lit(100.0) / greatest(col("len"), lit(1)))
      .drop("len")
      .orderBy(col("doc_id"))

  val q30Sql: String =
    """SELECT doc_id,
      | len(regexp_extract_all(text, '[^ \t\n\v\f\r]+')) AS ws_tokens,
      | len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\n\v\f\r]')) AS bpe_tokens,
      | len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\n\v\f\r]')) * 100.0
      |       / greatest(length(text), 1) AS tokens_per_100chars
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

  /** Base sketch capacity — exact whenever the vocabulary fits. */
  private[ops] val HhBaseCapacity = 4096
  /** Loud ceiling on the vocabulary-adaptive capacity: past this the
   *  sketch would go genuinely approximate and the hash oracle would
   *  report garbage as a mismatch — fail with the contract instead
   *  (the q165 MaxSafeEdgeStrength discipline). */
  private[ops] val HhMaxExactCapacity = 1 << 24

  /** Corpus-wide heavy hitters via the custom space-saving
   *  TypedImperativeAggregate (graft.functions.HeavyHitters). The
   *  sketch is EXACT only while the vocabulary fits its capacity —
   *  a data-dependent precondition the first cut pinned at a 4096
   *  literal and silently broke at the 1000× octave (ScaleGen's
   *  per-copy token suffix grows the vocabulary linearly in copies:
   *  ~400 k distinct tokens vs 4096 counters → every count inflated
   *  by inherited-bucket error, top-10 unrecognizable — found by the
   *  1000× selfcheck, the q176 class of bug). Capacity is now sized
   *  to the corpus: one cheap HLL pass (approx_count_distinct ±1%)
   *  estimates the vocabulary and the sketch gets 1.5× that (floor
   *  `HhBaseCapacity`, loud ceiling `HhMaxExactCapacity`) — per-
   *  partition memory stays min(partition vocab, capacity) counters,
   *  and the merge still ships capacity-bounded maps, never the
   *  token stream. A corpus past the ceiling fails loudly: at that
   *  point the user wants the documented-approximate sketch or the
   *  exact two-shuffle groupBy, not silently wrong counts. */
  def q53HeavyHitters(s: SparkSession, d: String): DataFrame = {
    graft.functions.HeavyHitters.register(s)
    val toks = hhTokens(s, d)
    val vocabEst = toks.agg(approx_count_distinct(col("tok"), 0.01))
      .head().getLong(0)
    val want = (vocabEst * 3L) / 2L
    require(want <= HhMaxExactCapacity,
      s"q53: estimated vocabulary $vocabEst needs capacity $want > " +
        s"$HhMaxExactCapacity; the space-saving sketch would go " +
        "approximate — use q187's documented-approximate mode " +
        "(fixed capacity, per-item error bounds) or the exact " +
        "two-shuffle groupBy path for this corpus")
    val capacity = math.max(HhBaseCapacity.toLong, want).toInt
    // HeavyHitters.eval returns its array already sorted by
    // (cnt desc, item asc) — posexplode derives the rank directly, a
    // pure per-row expression over the single aggregate output: no
    // global Window.orderBy (single-partition exchange) and no
    // re-sort duplicating the sketch's own tie-break. The filter is
    // the sketch's own exactness certificate (advice round-11): the
    // HLL sizing makes eviction unreachable, and if a pathological
    // >33% cardinality underestimate ever defeated the headroom the
    // `evicted` flag raises HERE instead of hash-mismatching
    // downstream — assert_true evaluates to NULL when the sketch
    // stayed eviction-free, so the filter passes the one aggregate
    // row through untouched.
    toks
      .agg(graft.functions.HeavyHitters.heavy_hitters(col("tok"), 10, capacity).as("r"))
      .filter(assert_true(!col("r.evicted"),
        lit("q53: space-saving sketch saturated (eviction fired) — " +
          "the HLL-sized capacity was defeated; counts would be " +
          "approximate")).isNull)
      .select(posexplode(col("r.top")).as(Seq("pos", "e")))
      .select(col("e.item").as("token"), col("e.cnt").as("cnt"),
        (col("pos") + 1).cast("long").as("rnk"))
      .orderBy(col("rnk"))
  }

  /** The shared q53/q187 token stream. SQL trim() strips only spaces,
   *  so a tab/newline-edged doc yields a phantom '' token the oracle
   *  (regexp-trimmed + empty-filtered) never counts — drop empties on
   *  BOTH sides. */
  private def hhTokens(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")

  /** q187 sketch capacity — deliberately SMALLER than the corpus
   *  vocabulary (31 base tokens in this testdata) so the approximate
   *  contract is exercised (evictions fire) at every octave, not just
   *  past q53's 2²⁴ ceiling. */
  private[graft] val HhApproxCapacity = 16

  /** q187: the documented-APPROXIMATE heavy-hitters mode — the path
   *  q53 refuses past its exact-capacity ceiling (a 10⁹-token
   *  vocabulary at 100 TB). Fixed `HhApproxCapacity` counters
   *  regardless of corpus vocabulary; per Metwally et al.'s
   *  space-saving guarantees every emitted count brackets the truth
   *  as cnt − err ≤ true ≤ cnt with err ≤ N/capacity (N = token
   *  count), and any item with true frequency > N/capacity is
   *  guaranteed present in the sketch (vacuous on a near-uniform
   *  corpus like this testdata's 31-token pool — the spec asserts it
   *  conditionally, which IS the guarantee's real form). The output
   *  carries the whole contract per row: the estimate, its error
   *  bound, the certified floor (cnt − err), and the sketch's own
   *  `saturated` flag. Under saturation the emitted ITEMS are
   *  merge-order-dependent (true of any distributed space-saving
   *  sketch); the guarantees above are order-free, so the gate is the
   *  contract spec (HeavyHittersSpec) + the rows-only verify leg (the
   *  q22/q24 convention: ANSI SQL cannot reproduce sketch
   *  internals). */
  def q187ApproxHeavyHitters(s: SparkSession, d: String): DataFrame = {
    graft.functions.HeavyHitters.register(s)
    hhTokens(s, d)
      .agg(graft.functions.HeavyHitters
        .heavy_hitters(col("tok"), 10, HhApproxCapacity).as("r"))
      .select(col("r.evicted").as("saturated"),
        posexplode(col("r.top")).as(Seq("pos", "e")))
      .select(col("e.item").as("token"), col("e.cnt").as("cnt_est"),
        col("e.err").as("err"),
        (col("e.cnt") - col("e.err")).as("cnt_floor"),
        (col("pos") + 1).cast("long").as("rnk"),
        col("saturated"))
      .orderBy(col("rnk"))
  }

  val q53Sql: String =
    """SELECT token, cnt, rnk FROM (
      | SELECT token, cnt, row_number() OVER (ORDER BY cnt DESC, token) AS rnk
      | FROM (
      |  SELECT tok AS token, count(*) AS cnt FROM (
      |   SELECT unnest(list_filter(string_split_regex(regexp_replace(text, '^[ \t\n\v\f\r]+|[ \t\n\v\f\r]+$', '', 'g'), '[ \t\n\v\f\r]+'), x -> x <> '')) AS tok FROM documents) u
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

  final case class DupNgramStats(doc_id: Long, n2: Long, dup2: Long,
      dup2_frac: Double, top2: Long, top2_frac: Double,
      n3: Long, dup3: Long, dup3_frac: Double)

  /** Repetition signals per document (the Gopher-report quality
   *  heuristics: Rae et al. 2021, arXiv:2112.11446 §A1.1 — "duplicate
   *  n-gram fraction" and "top n-gram fraction"): for word 2-grams and
   *  3-grams, how many occurrences are repeats of an earlier n-gram in
   *  the same document, and what share of the document the single most
   *  frequent 2-gram accounts for. High values flag degenerate /
   *  boilerplate text for the curation filter.
   *
   *  One typed map per row — a per-document hash count in JVM code.
   *  The array-expression formulation (zip_with over slices of
   *  split()) re-evaluates the split per element once Catalyst inlines
   *  the projection (see shingleRows), so the loop is deliberately
   *  imperative and scan-local: no shuffle except the presentation
   *  sort; at 100 TB this runs at scan speed. Fractions are plain
   *  IEEE double divisions (no rounding) so the oracle's `::DOUBLE /`
   *  reproduces them bit-exactly. */
  def q70DupNgrams(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d).select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text0) =>
        val toks = Option(text0).getOrElse("").trim
          .split("\\s+").filterNot(_.isEmpty)
        // (total, distinct, max multiplicity) over word n-grams
        def stats(n: Int): (Long, Long, Long) =
          if (toks.length < n) (0L, 0L, 0L)
          else {
            val counts = scala.collection.mutable.HashMap.empty[String, Long]
            var i = 0
            while (i + n <= toks.length) {
              val g = toks.slice(i, i + n).mkString(" ")
              counts.update(g, counts.getOrElse(g, 0L) + 1L)
              i += 1
            }
            ((toks.length - n + 1).toLong, counts.size.toLong,
              counts.valuesIterator.max)
          }
        val (n2, d2, m2) = stats(2)
        val (n3, d3, _) = stats(3)
        def frac(a: Long, b: Long): Double = if (b == 0L) 0.0 else a.toDouble / b
        DupNgramStats(id, n2, n2 - d2, frac(n2 - d2, n2), m2, frac(m2, n2),
          n3, n3 - d3, frac(n3 - d3, n3))
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  val q70Sql: String =
    """WITH w AS (
      |  SELECT doc_id,
      |   list_filter(string_split_regex(trim(text), '[ \t\n\v\f\r]+'), x -> x <> '') AS t
      |  FROM documents),
      |b2 AS (SELECT doc_id,
      |        unnest(list_transform(generate_series(1, len(t)-1), i -> t[i] || ' ' || t[i+1])) AS g
      |       FROM w),
      |c2 AS (SELECT doc_id, g, count(*) AS c FROM b2 GROUP BY 1, 2),
      |s2 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n2, count(*) AS d2, max(c) AS m2
      |       FROM c2 GROUP BY 1),
      |b3 AS (SELECT doc_id,
      |        unnest(list_transform(generate_series(1, len(t)-2),
      |                              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
      |       FROM w),
      |c3 AS (SELECT doc_id, g, count(*) AS c FROM b3 GROUP BY 1, 2),
      |s3 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n3, count(*) AS d3
      |       FROM c3 GROUP BY 1)
      |SELECT d.doc_id,
      | COALESCE(n2, 0) AS n2, COALESCE(n2 - d2, 0) AS dup2,
      | CASE WHEN COALESCE(n2, 0) = 0 THEN CAST(0 AS DOUBLE)
      |      ELSE (n2 - d2)::DOUBLE / n2 END AS dup2_frac,
      | COALESCE(m2, 0) AS top2,
      | CASE WHEN COALESCE(n2, 0) = 0 THEN CAST(0 AS DOUBLE)
      |      ELSE m2::DOUBLE / n2 END AS top2_frac,
      | COALESCE(n3, 0) AS n3, COALESCE(n3 - d3, 0) AS dup3,
      | CASE WHEN COALESCE(n3, 0) = 0 THEN CAST(0 AS DOUBLE)
      |      ELSE (n3 - d3)::DOUBLE / n3 END AS dup3_frac
      |FROM documents d LEFT JOIN s2 USING (doc_id) LEFT JOIN s3 USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  // PII patterns — explicit character classes, not \d/\s/\w: Java and
  // DuckDB's RE2 disagree on the Unicode breadth of the shorthands
  private[ops] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[ops] val PhoneRe = "\\+1-555-[0-9]{4}"
  private[ops] val IpRe = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** Redact `pii` in email → phone → IP order (fixed order: the
   *  placeholders must not feed later patterns). Shared by q73 and
   *  any pipeline caller. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      IpRe, "<IP>")

  /** PII detection + redaction. The provisioned corpus contains no
   *  PII, so each row is first augmented with a deterministic
   *  doc_id-derived email / phone / IPv4 (the oracle builds the SAME
   *  augmented text), then counted and redacted — the operator is
   *  exercised end-to-end with a hash-compared md5 of the redacted
   *  output. Pure per-row regex projection: scan-speed at 100 TB,
   *  fully codegen'd, no UDFs. */
  def q73PiiRedact(s: SparkSession, d: String): DataFrame = {
    val aug = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@example.com tel +1-555-"),
      lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
      lit(" ip 10."), pmod(col("doc_id"), lit(256)).cast("string"), lit(".0.1"))
    documents(s, d)
      .withColumn("aug", aug)
      .withColumn("red", redactPii(col("aug")))
      .select(col("doc_id"),
        regexp_count(col("aug"), lit(EmailRe)).cast("long").as("n_email"),
        regexp_count(col("aug"), lit(PhoneRe)).cast("long").as("n_phone"),
        regexp_count(col("aug"), lit(IpRe)).cast("long").as("n_ip"),
        md5(col("red").cast("binary")).as("redacted_md5"),
        length(col("red")).cast("long").as("redacted_len"))
      .orderBy(col("doc_id"))
  }

  val q73Sql: String =
    """WITH a AS (
      |  SELECT doc_id,
      |   text || ' contact user' || doc_id::VARCHAR || '@example.com tel +1-555-' ||
      |   lpad((doc_id % 10000)::VARCHAR, 4, '0') ||
      |   ' ip 10.' || (doc_id % 256)::VARCHAR || '.0.1' AS aug
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, aug,
      |   regexp_replace(
      |     regexp_replace(
      |       regexp_replace(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |       '\+1-555-[0-9]{4}', '<PHONE>', 'g'),
      |     '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g') AS red
      |  FROM a)
      |SELECT doc_id,
      | CAST(len(regexp_extract_all(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
      | CAST(len(regexp_extract_all(aug, '\+1-555-[0-9]{4}')) AS BIGINT) AS n_phone,
      | CAST(len(regexp_extract_all(aug, '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS BIGINT) AS n_ip,
      | md5(red) AS redacted_md5,
      | CAST(length(red) AS BIGINT) AS redacted_len
      |FROM r ORDER BY doc_id""".stripMargin

  /** q78: TF-IDF keyword extraction — top-3 scoring terms per doc,
   *  score = tf · ln(N/df). Three scale-honest stages: (1) one
   *  shuffle to (doc_id, term) counts — the only corpus-sized
   *  exchange; (2) the document-frequency table is vocab-sized in
   *  practice (Heaps' law) but UNBOUNDED in principle — a 100 TB web
   *  corpus's distinct-term table (typos, URLs, code) can be multi-GB
   *  — so it carries NO mandatory broadcast hint: AQE broadcasts when
   *  the materialized size is actually small and falls back to a
   *  shuffle join when it isn't (the tf frame re-shuffles on `term`
   *  either way). Only the 1-row N keeps its hint. (3) the top-3
   *  window partitions BY DOC, so no global sort.
   *  Scores are rounded to 6 dp BEFORE ranking so Spark and the
   *  oracle rank identical doubles (ties break on the term). */
  def q78TfidfTerms(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"), col("text"))
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(countDistinct(col("doc_id")).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(df, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk"), col("term"), col("score"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  val q78Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
      |       WHERE length(term) > 0 GROUP BY doc_id, term),
      |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.term,
      |   round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df), 6) AS score
      |  FROM tf JOIN dfreq USING (term) CROSS JOIN n)
      |SELECT doc_id, rnk, term, score FROM (
      |  SELECT doc_id, term, score,
      |   row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
      |  FROM scored) ranked
      |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin

  /** q79: bigram language-model scoring — per-doc mean negative
   *  log-likelihood under an MLE bigram model TRAINED ON THE CORPUS
   *  ITSELF (the CCNet/Gopher quality-signal shape: score each doc
   *  against corpus statistics; a doc of formulaic bigrams scores
   *  low surprise, an incoherent one high). Because every scored
   *  bigram is by construction in the training counts, the MLE
   *  probability is never zero and no smoothing is needed — which
   *  also makes the score exactly reproducible in SQL.
   *
   *  Shapes: bigrams come from a per-doc window (lead over pos —
   *  partitioned by doc, no global sort); the bigram-count model
   *  joins back on (w, w2) — at 100 TB that model is vocab²-bounded
   *  but still ≪ corpus, and the join key is the shuffle key the
   *  counts were just built on; the unigram table is vocab-sized —
   *  unbounded in principle, so like q78/q88 it carries no mandatory
   *  broadcast hint (AQE decides from its materialized size).
   *  Per-bigram NLL is quantized to integral micro-nats so the
   *  per-doc SUM is exact long arithmetic — no FP addition-order
   *  dependence between Spark's partial aggregates and DuckDB. */
  def q79BigramNll(s: SparkSession, d: String): DataFrame = {
    val toks = documents(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
    val big = toks
      .withColumn("w2",
        lead(col("w"), 1).over(Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
      .filter(col("w2").isNotNull)
      .select(col("doc_id"), col("w"), col("w2"))
    val c2 = big.groupBy(col("w"), col("w2")).agg(count(lit(1)).as("c2"))
    val c1 = big.groupBy(col("w")).agg(count(lit(1)).as("c1"))
    big.join(c2, Seq("w", "w2"))
      .join(c1, Seq("w"))
      .withColumn("nll_micro",
        round(log(col("c1").cast("double") / col("c2")) * 10000).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("nll_micro")).as("sum_micro"))
      // NO final rounding: the division of identical exact longs is
      // bit-identical across engines, while round(x, 6) is NOT — a
      // sum_micro/(10⁴n) landing exactly on a half-boundary (seen at
      // 10×: 1361137/400000 = 3.4028425) splits Spark's
      // BigDecimal-HALF_UP from DuckDB's multiply-round
      .select(col("doc_id"), col("n_bigrams"),
        (col("sum_micro") / 10000.0 / col("n_bigrams")).as("avg_nll"))
      .orderBy(col("doc_id"))
  }

  val q79Sql: String =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
      |big AS (
      |  SELECT doc_id, arr[i] AS w, arr[i+1] AS w2
      |  FROM d, LATERAL (SELECT unnest(range(1, len(arr))) AS i) ix),
      |c2 AS (SELECT w, w2, count(*) AS c2 FROM big GROUP BY w, w2),
      |c1 AS (SELECT w, count(*) AS c1 FROM big GROUP BY w),
      |scored AS (
      |  SELECT b.doc_id,
      |   CAST(round(ln(CAST(c1.c1 AS DOUBLE) / c2.c2) * 10000) AS BIGINT) AS nll_micro
      |  FROM big b JOIN c2 ON b.w = c2.w AND b.w2 = c2.w2
      |             JOIN c1 ON b.w = c1.w)
      |SELECT doc_id, count(*) AS n_bigrams,
      | sum(nll_micro) / 10000.0 / count(*) AS avg_nll
      |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q88: vocabulary coverage — build the corpus vocab (tokens with
   *  count ≥ 10, the min-frequency cutoff every tokenizer-training
   *  pipeline applies) and score each document's out-of-vocabulary
   *  token fraction against it. High OOV flags encoding noise /
   *  wrong-language / garbage docs that a fixed vocab would shred
   *  into bytes. Shapes: one corpus shuffle for token counts; the
   *  vocab is small in practice (Heaps' law) but unbounded in
   *  principle at web scale, so the membership join carries no
   *  mandatory broadcast hint — AQE broadcasts it only when its
   *  materialized size actually permits; per-doc agg rides the same
   *  (doc_id, term) keys.
   *  oov_frac ships as a RAW division (rational-rounding rule). */
  def q88VocabCoverage(s: SparkSession, d: String): DataFrame = {
    val toks = documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val vocab = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 10)
      .select(col("term"), lit(1).as("in_vocab"))
    toks.join(vocab, Seq("term"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("in_vocab").isNull, 1)).as("n_oov"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        (col("n_oov") * lit(1.0) / col("n_tokens")).as("oov_frac"))
      .orderBy(col("doc_id"))
  }

  val q88Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |t AS (SELECT doc_id, term FROM toks WHERE length(term) > 0),
      |vocab AS (SELECT term FROM t GROUP BY term HAVING count(*) >= 10)
      |SELECT doc_id, count(*) AS n_tokens,
      | count(CASE WHEN v.term IS NULL THEN 1 END) AS n_oov,
      | count(CASE WHEN v.term IS NULL THEN 1 END) * 1.0 / count(*) AS oov_frac
      |FROM t LEFT JOIN vocab v USING (term)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // q113: pairwise source-vocabulary overlap (Jaccard matrix)
  // ---------------------------------------------------------------

  /** q113: Jaccard overlap between the distinct-term vocabularies of
   *  every source pair — the diagnostic a mixing policy (q74/q110)
   *  consults before blending sources: near-identical vocabularies
   *  mean the sources are redundant, disjoint ones mean a blend
   *  shifts the token distribution.
   *
   *  Scale: one distinct-aggregate on (source, term), then a
   *  self-join on `term` — each term contributes C(s_t, 2) pairs
   *  where s_t ≤ #sources, so the join output is ≤ C(S,2) rows per
   *  term: linear in the vocabulary, never quadratic in the corpus.
   *  The S×S result is tiny by construction. */
  def q113VocabOverlap(s: SparkSession, d: String): DataFrame = {
    val terms = documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .select(col("source"), col("term")).distinct()
    val sizes = terms.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val a = terms.toDF("source_a", "term")
    val b = terms.toDF("source_b", "term")
    a.join(b, Seq("term")).filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b")).agg(count(lit(1)).as("co"))
      .join(sizes.toDF("source_a", "n_a"), Seq("source_a"))
      .join(sizes.toDF("source_b", "n_b"), Seq("source_b"))
      // raw division (BASELINE.md rounding rule): identical exact
      // longs make the double bit-identical across engines
      .select(col("source_a"), col("source_b"), col("co"),
        col("n_a"), col("n_b"),
        (col("co") * lit(1.0) / (col("n_a") + col("n_b") - col("co"))).as("jac"))
      .orderBy(col("source_a"), col("source_b"))
  }

  val q113Sql: String =
    """WITH t AS (
      |  SELECT DISTINCT source, term FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS term
      |    FROM documents) u WHERE length(term) > 0),
      |sz AS (SELECT source, count(*) AS n FROM t GROUP BY source),
      |co AS (
      |  SELECT a.source AS source_a, b.source AS source_b, count(*) AS co
      |  FROM t a JOIN t b ON a.term = b.term AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT source_a, source_b, co, sa.n AS n_a, sb.n AS n_b,
      | co * 1.0 / (sa.n + sb.n - co) AS jac
      |FROM co JOIN sz sa ON co.source_a = sa.source
      |        JOIN sz sb ON co.source_b = sb.source
      |ORDER BY source_a, source_b""".stripMargin

  // ---------------------------------------------------------------
  // q115: per-document character-entropy quality signal
  // ---------------------------------------------------------------

  /** q115: Shannon entropy of the character distribution per
   *  document — a cheap, language-agnostic quality/gibberish signal
   *  (near-zero for repeated-char junk, high for random noise;
   *  natural text sits in a narrow band). Computed in ONE typed map
   *  per document (the shingleRows lesson: per-char column-level
   *  explode would shuffle corpus×chars rows for a per-row answer).
   *
   *  Cross-engine determinism: each character's contribution
   *  cnt·ln(n/cnt) is quantized to integral micro-nats BEFORE
   *  summing (order-free, the q79 pattern), and the final entropy
   *  ships as the raw division of exact longs. */
  def q115CharEntropy(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text0) =>
        val text = Option(text0).getOrElse("")
        val n = text.length.toLong
        var sumMicro = 0L
        if (n > 0) {
          val counts = new java.util.HashMap[Char, Long]()
          text.foreach(c => counts.merge(c, 1L, _ + _))
          counts.forEach { (_, cnt) =>
            sumMicro += math.round(cnt * math.log(n.toDouble / cnt) * 1e6)
          }
        }
        (id, n, sumMicro)
      }
      .toDF("doc_id", "n_chars", "sum_micro")
      .withColumn("entropy_nats",
        when(col("n_chars") > 0, col("sum_micro") / 1e6 / col("n_chars"))
          .otherwise(lit(0.0)))
      .orderBy(col("doc_id"))
  }

  // anchored on documents with a LEFT JOIN (the q70Sql fix), not on
  // the chars CTE: string_split('', '') yields [''] and
  // string_split(NULL, '') yields NULL, so a chars-anchored oracle
  // would give empty-text docs n_chars=1 and drop NULL-text docs
  // entirely, while the Spark map emits (id, 0, 0, 0.0) for both
  val q115Sql: String =
    """WITH chars AS (
      |  SELECT doc_id, unnest(string_split(text, '')) AS ch
      |  FROM documents WHERE text IS NOT NULL AND text <> ''),
      |cc AS (SELECT doc_id, ch, count(*) AS cnt FROM chars GROUP BY 1, 2),
      |n AS (SELECT d.doc_id, CAST(coalesce(sum(cnt), 0) AS BIGINT) AS n_chars
      |      FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id
      |      GROUP BY d.doc_id),
      |terms AS (
      |  SELECT cc.doc_id,
      |   CAST(round(cnt * ln(CAST(n_chars AS DOUBLE) / cnt) * 1e6) AS BIGINT) AS m
      |  FROM cc JOIN n USING (doc_id))
      |SELECT n.doc_id, n.n_chars,
      | CAST(coalesce(sum(m), 0) AS BIGINT) AS sum_micro,
      | CASE WHEN n.n_chars > 0
      |      THEN coalesce(sum(m), 0) / 1e6 / n.n_chars ELSE 0.0 END AS entropy_nats
      |FROM n LEFT JOIN terms USING (doc_id)
      |GROUP BY n.doc_id, n.n_chars
      |ORDER BY n.doc_id""".stripMargin

  // ---------------------------------------------------------------
  // q119: top-k PMI collocations (corpus bigram statistics)
  // ---------------------------------------------------------------

  /** q119: the corpus' strongest collocations — adjacent token pairs
   *  ranked by pointwise mutual information. PMI compares the
   *  bigram's observed rate against independence:
   *  ln(p(a,b) / (p(a)·p(b))) with p(a,b) over bigram positions and
   *  p(·) over token positions. Low-support pairs (c_ab < 5) are
   *  noise and excluded, as every published collocation pipeline
   *  does.
   *
   *  Determinism: the PMI double is computed with ONE canonical
   *  left-associated expression on exact longs — both engines follow
   *  IEEE round-to-nearest per op, so identical inputs + identical
   *  association give the identical double — then quantized to
   *  micro-nats (ln is irrational: round() is boundary-safe). The
   *  top-20 ranks on the exact (pmi_micro, w, w2) triple.
   *
   *  Scale: two hash aggregates (bigrams, unigrams) + a join of the
   *  bigram table against two 1-row-per-term tables; the heavy frame
   *  shuffles once on the bigram key. Top-k is a TakeOrdered, not a
   *  global sort. */
  def q119PmiCollocations(s: SparkSession, d: String): DataFrame = {
    val toks = documents(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
    val big = toks
      .withColumn("w2",
        lead(col("w"), 1).over(Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
      .filter(col("w2").isNotNull)
      .select(col("w"), col("w2"))
    val nTok = toks.select(count(lit(1)).as("n_tok"))
    val nBig = big.select(count(lit(1)).as("n_big"))
    val c2 = big.groupBy(col("w"), col("w2")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= 5)
    val c1 = toks.groupBy(col("w")).agg(count(lit(1)).as("c_w"))
    c2.join(c1.toDF("w", "c_a"), Seq("w"))
      .join(c1.toDF("w2", "c_b"), Seq("w2"))
      .crossJoin(nTok).crossJoin(nBig)
      // one canonical left-to-right association, mirrored in the SQL
      .withColumn("pmi_micro",
        round(log(col("c_ab").cast("double") * col("n_tok") / col("c_a")
          * col("n_tok") / col("c_b") / col("n_big")) * 1e6).cast("long"))
      .select(col("w"), col("w2"), col("c_ab"), col("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("w"), col("w2"))
      .limit(20)
  }

  val q119Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, i AS pos, t[i] AS w
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) s,
      |   LATERAL (SELECT unnest(generate_series(1, len(t))) AS i) g),
      |big AS (
      |  SELECT w, lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      |  FROM toks QUALIFY w2 IS NOT NULL),
      |n1 AS (SELECT count(*) AS n_tok FROM toks),
      |n2 AS (SELECT count(*) AS n_big FROM big),
      |c2 AS (SELECT w, w2, count(*) AS c_ab FROM big GROUP BY 1, 2
      |       HAVING count(*) >= 5),
      |c1 AS (SELECT w, count(*) AS c_w FROM toks GROUP BY 1)
      |SELECT c2.w, c2.w2, c_ab,
      | CAST(round(ln(CAST(c_ab AS DOUBLE) * n_tok / ca.c_w
      |   * n_tok / cb.c_w / n_big) * 1e6) AS BIGINT) AS pmi_micro
      |FROM c2 JOIN c1 ca ON c2.w = ca.w JOIN c1 cb ON c2.w2 = cb.w,
      |     n1, n2
      |ORDER BY pmi_micro DESC, c2.w, c2.w2 LIMIT 20""".stripMargin

  // ---------------------------------------------------------------
  // q151: intra-document repetition filters (Gopher-style)
  // ---------------------------------------------------------------

  /** (doc_id, pos, term) rows — single-space tokens with DENSE
   *  1-based positions among the NON-EMPTY tokens, produced by one
   *  typed flatMap per the shingleRows rule. The posexplode +
   *  per-doc-window formulation this replaces paid a full sort
   *  shuffle of every token (~10⁸ rows at the 100× octave) just to
   *  compute adjacency; here adjacency is free at tokenize time and
   *  dense positions make a `pos + 1` join ≡ consecutive-token
   *  adjacency regardless of repeated separators (the raw-subscript
   *  variant silently disagreed with a lead()-based oracle on
   *  double-space text). */
  private[ops] def spaceToks(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text0) =>
        Option(text0).getOrElse("").split(" ", -1).iterator
          .filter(_.nonEmpty).zipWithIndex
          .map { case (t, i) => (id, (i + 1).toLong, t) }
      }.toDF("doc_id", "pos", "term")
  }

  /** (doc_id, pos, w1, w2) consecutive-token bigrams, pos = dense
   *  position of w1 — the same one-pass flatMap tokenization. */
  private[ops] def spaceBigrams(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text0) =>
        val toks = Option(text0).getOrElse("").split(" ", -1).filter(_.nonEmpty)
        if (toks.length < 2) Iterator.empty
        else (0 until toks.length - 1).iterator
          .map(i => (id, (i + 1).toLong, toks(i), toks(i + 1)))
      }.toDF("doc_id", "pos", "w1", "w2")
  }

  /** q151: the Rae et al. (Gopher) repetition family at word
   *  granularity — per document: most-frequent-word share, the
   *  fraction of bigram occurrences belonging to a repeated bigram,
   *  and the distinct-word ratio, plus the composite rep_flag a
   *  curation pass drops on. Complements q29 (aggregate signal
   *  quality) and q70 (CROSS-doc duplicate n-grams): this one is
   *  strictly WITHIN-doc repetition.
   *
   *  Scale: two hash aggregations keyed by (doc_id, term) /
   *  (doc_id, bigram) over one-pass flatMap tokenization — all work
   *  is proportional to token count, map-side partial aggregation
   *  shrinks both shuffles to the distinct-key counts, nothing is
   *  corpus² and nothing sorts the token stream. Fractions ship as
   *  RAW divisions of exact longs (the determinism rule: identical
   *  integer inputs → bit-identical doubles in both engines; no
   *  rounding of rationals). Token-free docs surface zeros/flag-false
   *  via the doc-seeded left join. Thresholds (0.12 / 0.10 / 0.35)
   *  sit at the corpus p75-p90 so the flag genuinely splits the
   *  provisioned distribution. */
  def q151RepetitionFilter(s: SparkSession, d: String): DataFrame = {
    val base = documents(s, d).select(col("doc_id"), col("text"))
    val wc = spaceToks(base).groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("c"))
    val perDoc = wc.groupBy(col("doc_id")).agg(
      sum(col("c")).as("n_words"),
      max(col("c")).as("max_word_count"),
      count(lit(1)).as("n_distinct"))
    val bc = spaceBigrams(base)
      .groupBy(col("doc_id"), concat_ws(" ", col("w1"), col("w2")).as("bg"))
      .agg(count(lit(1)).as("c"))
    val bd = bc.groupBy(col("doc_id")).agg(
      sum(col("c")).as("n_bigrams"),
      sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("dup_bigrams"))
    base.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .join(bd, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        coalesce(col("max_word_count"), lit(0L)).as("max_word_count"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("dup_bigrams"), lit(0L)).as("dup_bigrams"))
      .withColumn("top_word_frac",
        col("max_word_count") / greatest(col("n_words"), lit(1L)))
      .withColumn("dup_bigram_frac",
        col("dup_bigrams") / greatest(col("n_bigrams"), lit(1L)))
      .withColumn("rep_flag",
        (col("n_words") > 0 &&
          (col("top_word_frac") > 0.12 || col("dup_bigram_frac") > 0.10 ||
            col("n_distinct") / col("n_words").cast("double") < 0.35))
          .cast("int").cast("long"))
      .orderBy(col("doc_id"))
  }

  val q151Sql: String =
    """WITH base AS (SELECT doc_id, text FROM documents),
      |toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
      |   generate_subscripts(string_split(text, ' '), 1) AS pos
      |  FROM base),
      |t2 AS (SELECT * FROM toks WHERE term <> ''),
      |wc AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c
      |       FROM t2 GROUP BY 1, 2),
      |perdoc AS (
      |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
      |   CAST(max(c) AS BIGINT) AS max_word_count,
      |   CAST(count(*) AS BIGINT) AS n_distinct
      |  FROM wc GROUP BY 1),
      |big AS (
      |  SELECT doc_id, term || ' ' || lead(term) OVER
      |    (PARTITION BY doc_id ORDER BY pos) AS bg
      |  FROM t2
      |  QUALIFY lead(term) OVER (PARTITION BY doc_id ORDER BY pos) IS NOT NULL),
      |bc AS (SELECT doc_id, bg, CAST(count(*) AS BIGINT) AS c
      |       FROM big GROUP BY 1, 2),
      |bd AS (
      |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
      |   CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS dup_bigrams
      |  FROM bc GROUP BY 1)
      |SELECT b.doc_id,
      | coalesce(p.n_words, 0) AS n_words,
      | coalesce(p.n_distinct, 0) AS n_distinct,
      | coalesce(p.max_word_count, 0) AS max_word_count,
      | coalesce(d.n_bigrams, 0) AS n_bigrams,
      | coalesce(d.dup_bigrams, 0) AS dup_bigrams,
      | coalesce(p.max_word_count, 0) * 1.0
      |   / greatest(coalesce(p.n_words, 0), 1) AS top_word_frac,
      | coalesce(d.dup_bigrams, 0) * 1.0
      |   / greatest(coalesce(d.n_bigrams, 0), 1) AS dup_bigram_frac,
      | CAST(CASE WHEN coalesce(p.n_words, 0) > 0 AND (
      |    coalesce(p.max_word_count, 0) * 1.0 / greatest(coalesce(p.n_words, 0), 1) > 0.12
      |    OR coalesce(d.dup_bigrams, 0) * 1.0 / greatest(coalesce(d.n_bigrams, 0), 1) > 0.10
      |    OR coalesce(p.n_distinct, 0) * 1.0 / p.n_words < 0.35)
      |   THEN 1 ELSE 0 END AS BIGINT) AS rep_flag
      |FROM (SELECT doc_id FROM base) b
      |LEFT JOIN perdoc p USING (doc_id)
      |LEFT JOIN bd d USING (doc_id)
      |ORDER BY b.doc_id""".stripMargin
}
