package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * BPE tokenizer training over the corpus (Sennrich et al. 2016,
 * "Neural Machine Translation of Rare Words with Subword Units"):
 * count symbol-pair frequencies weighted by word frequency, merge
 * the most frequent pair, repeat.
 *
 * Scale shape: everything after the first token count runs on the
 * VOCABULARY (distinct words + frequencies), not the corpus — the
 * classic BPE trick. At 100 TB the corpus scan is one shuffle to
 * (word, freq); the merge loop then iterates over vocab-sized data
 * (Heaps' law: ~10⁷–10⁸ rows at web scale — cluster-trivial). Each
 * iteration is one flatMap + one hash aggregate + a 1-row argmax
 * collect; lineage is cut per iteration (localCheckpoint) exactly as
 * in the q76 connected-components loop.
 */
object Bpe {
  import Tables._

  /** Corpus vocabulary: lowercase-alphabetic whitespace tokens with
   *  corpus frequencies — one scan, one shuffle. */
  def vocabulary(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** Adjacent symbol-pair counts over a symbolized vocabulary
   *  ((w, freq, syms) rows), weighted by word frequency. Typed
   *  flatMap, not a transform(sequence, …) column expression — the
   *  shingleRows finding: per-element column slicing re-splits the
   *  array once Catalyst inlines the projection (~15× slower). */
  def pairCounts(sym: DataFrame): DataFrame = {
    import sym.sparkSession.implicits._
    sym.select(col("freq"), col("syms"))
      .as[(Long, Seq[String])]
      .flatMap { case (freq, syms) =>
        if (syms.length < 2) Iterator.empty
        else syms.iterator.zip(syms.iterator.drop(1)).map { case (a, b) => (a, b, freq) }
      }
      .toDF("a", "b", "freq")
      .groupBy(col("a"), col("b")).agg(sum(col("freq")).as("cnt"))
  }

  /** Initial symbolization: one symbol per Unicode CODE POINT — the
   *  same split the distributed path's `split(w, "(?<=.)(?=.)")`
   *  performs (Java regex `.` matches a full code point), so both
   *  bpeTrain paths and the encoder see identical initial sequences
   *  for any vocabulary, supplementary-plane characters included.
   *  A per-UTF-16-char split would cleave surrogate pairs. */
  private[ops] def codePointSymbols(w: String): Array[String] = {
    val out = new Array[String](w.codePointCount(0, w.length))
    var i = 0; var k = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val n = Character.charCount(cp)
      out(k) = w.substring(i, i + n)
      i += n; k += 1
    }
    out
  }

  /** Merge one (a, b) pair left-to-right within a symbol sequence —
   *  the standard BPE application rule ("aaa" + (a,a) → ["aa","a"]). */
  private[ops] def applyMerge(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** Vocabulary sizes up to this collect to the driver for the merge
   *  loop; larger vocabularies keep the distributed iteration. 1M
   *  (w, freq) rows is ~10² MB — comfortable against the driver heap,
   *  and covers every natural-language vocabulary short of raw web
   *  tails. */
  private[ops] val DriverVocabCap = 1000000L

  /** Train `numMerges` BPE merge rules over a (w, freq) vocabulary.
   *  Ties break on (a, b) lexicographically — deterministic across
   *  runs and partitionings.
   *
   *  Two identical-result paths, picked by vocabulary size: below
   *  [[DriverVocabCap]] the vocab collects once and the 50-iteration
   *  merge loop runs in driver memory (the reference practice —
   *  Sennrich's trainer iterates a word-frequency dict; paying a
   *  distributed shuffle + lineage checkpoint per merge on
   *  vocab-sized data is per-job overhead, not parallelism — measured
   *  8–19 s vs <1 s at sf0.1). Above the cap the loop stays fully
   *  distributed: one flatMap + hash aggregate + 1-row argmax collect
   *  per merge, lineage cut per iteration. BpeSpec pins both paths to
   *  identical rules. */
  def bpeTrain(vocab: DataFrame, numMerges: Int): Seq[(String, String)] =
    bpeTrain(vocab, numMerges, DriverVocabCap)

  private[ops] def bpeTrain(vocab: DataFrame, numMerges: Int,
      driverCap: Long): Seq[(String, String)] = {
    import vocab.sparkSession.implicits._
    val words = vocab.select(col("w"), col("freq")).as[(String, Long)]
      .limit((driverCap + 1).min(Int.MaxValue.toLong).toInt).collect()
    if (words.length <= driverCap) bpeTrainLocal(words, numMerges)
    else bpeTrainDistributed(vocab, numMerges)
  }

  /** Driver-memory merge loop over a collected (word, freq) vocabulary
   *  — same argmax and tie-break as the distributed path. */
  private def bpeTrainLocal(words: Array[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    var sym: Array[(Array[String], Long)] =
      words.map { case (w, f) => (codePointSymbols(w), f) }
    val rules = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val counts = new java.util.HashMap[(String, String), Long]()
      sym.foreach { case (ss, f) =>
        var k = 0
        while (k + 1 < ss.length) {
          counts.merge((ss(k), ss(k + 1)), f, _ + _)
          k += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        var best: (String, String) = null
        var bestCnt = -1L
        counts.forEach { (p, c) =>
          if (c > bestCnt || (c == bestCnt &&
              (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2))))
            { best = p; bestCnt = c }
        }
        rules += best
        sym = sym.map { case (ss, f) =>
          (applyMerge(ss.toSeq, best._1, best._2).toArray, f)
        }
        i += 1
      }
    }
    rules.toSeq
  }

  private def bpeTrainDistributed(vocab: DataFrame,
      numMerges: Int): Seq[(String, String)] = {
    import vocab.sparkSession.implicits._
    var sym = vocab.select(col("w"), col("freq"),
        split(col("w"), "(?<=.)(?=.)").as("syms"))
      .localCheckpoint()
    val rules = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val top = pairCounts(sym)
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect() // 1-row argmax — bounded driver traffic
      if (top.isEmpty) done = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        rules += ((a, b))
        val old = sym
        sym = sym.select(col("w"), col("freq"), col("syms"))
          .as[(String, Long, Seq[String])]
          .map { case (w, f, ss) => (w, f, applyMerge(ss, a, b)) }
          .toDF("w", "freq", "syms")
          .localCheckpoint() // cut lineage: iterations must not stack plans
        old.unpersist()
        i += 1
      }
    }
    sym.unpersist()
    rules.toSeq
  }

  /** q99: the first BPE iteration as an oracle-gated query —
   *  character-pair frequencies over the corpus vocabulary, every
   *  pair, most frequent first. (The multi-merge loop is engine-side
   *  iteration DuckDB can't express; BpeSpec pins it against the
   *  hand-computed Sennrich example.) */
  def q99BpePairs(s: SparkSession, d: String): DataFrame = {
    val sym = vocabulary(documents(s, d))
      .select(col("w"), col("freq"), split(col("w"), "(?<=.)(?=.)").as("syms"))
    pairCounts(sym)
      .select(col("a"), col("b"), col("cnt"))
      .orderBy(col("cnt").desc, col("a"), col("b"))
  }

  val q99Sql: String =
    """WITH toks AS (SELECT unnest(string_split(text,' ')) AS w FROM documents),
      |words AS (SELECT w, count(*) AS freq FROM toks
      |          WHERE regexp_matches(w, '^[a-z]+$') GROUP BY w),
      |pairs AS (
      |  SELECT substring(w, i, 1) AS a, substring(w, i + 1, 1) AS b, freq
      |  FROM words, LATERAL (SELECT unnest(range(1, length(w))) AS i) ix)
      |SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt
      |FROM pairs GROUP BY a, b ORDER BY cnt DESC, a, b""".stripMargin

  /** Encode one word with a trained merge-rule list: repeatedly apply
    * the LOWEST-RANK (earliest-trained) merge present in the current
    * symbol sequence — the standard BPE inference rule, which
    * reproduces exactly the segmentation training would have produced
    * for that word. O(|word|) rank lookups per pass, ≤ |word| passes. */
  def bpeEncode(word: String, rank: Map[(String, String), Int]): Seq[String] = {
    var syms: Seq[String] = codePointSymbols(word).toSeq
    var more = syms.length >= 2
    while (more) {
      var best: ((String, String), Int) = (null, Int.MaxValue)
      var i = 0
      while (i + 1 < syms.length) {
        val p = (syms(i), syms(i + 1))
        rank.get(p) match {
          case Some(r) if r < best._2 => best = (p, r)
          case _ =>
        }
        i += 1
      }
      if (best._1 == null) more = false
      else {
        syms = applyMerge(syms, best._1._1, best._1._2)
        more = syms.length >= 2
      }
    }
    syms
  }

  /** q108: tokenize the corpus with a trained BPE model — train
    * `numMerges` rules on the corpus vocabulary, then encode every
    * document and report its token count and chars-per-token
    * compression (the data-loader planning numbers: sequence lengths,
    * packing budgets, token-hour estimates).
    *
    * Scale: training iterates over VOCAB-sized data (the q99/bpeTrain
    * path); the learned rule table (numMerges entries) ships to
    * executors in the task closure — constant-size, the same shape as
    * a broadcast tokenizer model. Encoding is then one scan-local
    * typed map per document (the tokenize-once rule: one split, one
    * in-memory encode; no column-expression re-evaluation). NOT
    * SQL-expressible (iterative greedy merges), so the driver records
    * a rows-only check; BpeSpec pins the encoder against the
    * hand-computed Sennrich example, the round-trip identity, and the
    * zero-merge degenerate case. */
  /** Independent reference encoder for the q134 parity gate:
    * repeatedly merges the SINGLE LEFTMOST occurrence of the
    * lowest-rank adjacent pair, where [[bpeEncode]] merges every
    * occurrence of that pair in one left-to-right pass. The two are
    * provably equivalent — a merge only creates pairs involving the
    * NEW token, and any rule consuming a token is learned after the
    * rule that built it (strictly higher rank), so the current
    * minimum rank stays minimal until its occurrences are exhausted —
    * which makes this a genuinely independent implementation of the
    * same contract rather than a transcription of the main path. */
  private[ops] def bpeEncodeReference(word: String,
      rank: Map[(String, String), Int]): Seq[String] = {
    var syms = codePointSymbols(word).toVector
    var more = true
    while (more && syms.length >= 2) {
      val ranked = syms.zip(syms.tail).zipWithIndex
        .flatMap { case (p, i) => rank.get(p).map(r => (r, i)) }
      if (ranked.isEmpty) more = false
      else {
        val (_, i) = ranked.min
        syms = (syms.take(i) :+ (syms(i) + syms(i + 1))) ++ syms.drop(i + 2)
      }
    }
    syms
  }

  /** q134: hard quality gate for the BPE tokenizer — the q61 pattern
    * applied to the one rows-only operator that had no floor: q108's
    * segmentation is engine-specific (iterative greedy merges DuckDB
    * can't express), but its CONTRACT is boolean and oracle-hashable.
    * Four components over the trained 50-rule model, each an all-rows
    * invariant on the corpus vocabulary:
    *
    *  - `bpe_round_trip`: decode(encode(w)) — symbol concatenation —
    *    reproduces every vocabulary word exactly;
    *  - `bpe_fixpoint`: no adjacent pair of any final segmentation is
    *    still mergeable (inference stopped exactly when it should);
    *  - `bpe_token_validity`: every multi-code-point token is the
    *    product of a learned rule (a+b for some (a, b));
    *  - `bpe_reference_parity`: on a deterministic ~1/8 vocabulary
    *    sample, [[bpeEncode]] matches [[bpeEncodeReference]], an
    *    independently-implemented encoder of the same spec.
    *
    * Scale: one map over the VOCABULARY (not the corpus) with the
    * constant-size rule table in the task closure, then a single
    * boolean aggregate — the gate costs one vocab pass beyond
    * training. */
  def q134BpeGate(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val vocab = vocabulary(documents(s, d))
    val rules = bpeTrain(vocab, 50)
    val rank = rules.zipWithIndex.toMap
    val mergedToks: Set[String] = rules.map { case (a, b) => a + b }.toSet
    vocab.select(col("w")).as[String]
      .map { w =>
        val syms = bpeEncode(w, rank)
        val rtBad = if (syms.mkString == w) 0L else 1L
        val fxBad = if (syms.length < 2 ||
          syms.iterator.zip(syms.iterator.drop(1)).forall(p => !rank.contains(p))) 0L else 1L
        val tvBad = if (syms.forall(t =>
          t.codePointCount(0, t.length) == 1 || mergedToks.contains(t))) 0L else 1L
        // deterministic sample: String.hashCode is part of the JLS,
        // stable across JVMs and partitionings
        val sampled = if ((w.hashCode & 7) == 0) 1L else 0L
        val paBad = if (sampled == 0L || syms == bpeEncodeReference(w, rank)) 0L else 1L
        (rtBad, fxBad, tvBad, sampled, paBad)
      }
      .toDF("rt_bad", "fx_bad", "tv_bad", "sampled", "pa_bad")
      .agg(count(lit(1)).as("n"),
        sum(col("rt_bad")).as("rt"), sum(col("fx_bad")).as("fx"),
        sum(col("tv_bad")).as("tv"), sum(col("sampled")).as("ns"),
        sum(col("pa_bad")).as("pa"))
      .select(explode(array(
        struct(lit("bpe_fixpoint").as("component"),
          (col("n") > 0 && col("fx") === 0).as("ok")),
        struct(lit("bpe_reference_parity").as("component"),
          (col("ns") > 0 && col("pa") === 0).as("ok")),
        struct(lit("bpe_round_trip").as("component"),
          (col("n") > 0 && col("rt") === 0).as("ok")),
        struct(lit("bpe_token_validity").as("component"),
          (col("n") > 0 && col("tv") === 0).as("ok")))).as("r"))
      .select(col("r.component"), col("r.ok"))
      .orderBy(col("component"))
  }

  val q134Sql: String =
    """SELECT * FROM (VALUES
      | ('bpe_fixpoint', true), ('bpe_reference_parity', true),
      | ('bpe_round_trip', true), ('bpe_token_validity', true)
      |) t(component, ok) ORDER BY component""".stripMargin

  def q108BpeEncode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = documents(s, d)
    val rules = bpeTrain(vocabulary(docs), 50)
    val rank = rules.zipWithIndex.toMap
    docs.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val words = text.split(" ").iterator.filter(_.nonEmpty)
        var nWords = 0L; var nToks = 0L; var nChars = 0L
        words.foreach { w =>
          nWords += 1; nChars += w.length
          nToks += (if (w.forall(c => c >= 'a' && c <= 'z')) bpeEncode(w, rank).length else 1)
        }
        (id, nWords, nToks, nChars)
      }
      .toDF("doc_id", "n_words", "n_tokens", "n_chars_tok")
      .withColumn("chars_per_token", col("n_chars_tok") / col("n_tokens"))
      .orderBy(col("doc_id"))
  }
}
