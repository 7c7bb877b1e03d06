package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Vocabulary-level corpus statistics: the Zipf power-law fit and the
 * token coverage curve — the two numbers a tokenizer/vocab designer
 * reads before fixing a vocabulary size. Both run off one corpus
 * token-count aggregate (the q99 `Bpe.vocabulary` frame).
 *
 * Determinism follows the established rules: ranks and counts are
 * exact integers; every ln() contribution is micro-quantized BEFORE
 * any cross-row sum (the q79/q115 rule); closed-form OLS ships the
 * q105 left-associated double expression on exact integer moments.
 */
object VocabStats {
  import Tables._

  /** q126: Zipf exponent of the term-frequency distribution — OLS of
   *  ln(freq) on ln(rank) over the top-100 terms (rank by freq desc,
   *  term asc). Natural text sits near slope −1; a far-off slope
   *  flags synthetic/boilerplate corpora. Returns one row with the
   *  moment sums' closed-form slope/intercept/r².
   *
   *  Scale: the corpus-sized work is the one vocabulary hash
   *  aggregate; the top-100 selection is a TakeOrdered (O(n log k)
   *  per partition + k-merge, no global sort), and the regression
   *  runs on 100 rows. ln(rank)/ln(freq) are micro-quantized per
   *  term, so the moment sums are exact longs in both engines. */
  def q126ZipfFit(s: SparkSession, d: String): DataFrame =
    zipfFit(documents(s, d))

  /** Core of q126 over any (text) frame. */
  def zipfFit(docs: DataFrame): DataFrame = {
    val top = Bpe.vocabulary(docs)
      .orderBy(col("freq").desc, col("w"))
      .limit(100)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("freq").desc, col("w"))).cast("long"))
      .select(
        round(log(col("rank").cast("double")) * 1e6).cast("long").as("xq"),
        round(log(col("freq").cast("double")) * 1e6).cast("long").as("yq"))
    top.agg(
        count(lit(1)).as("n"),
        sum(col("xq")).as("s_x"),
        sum(col("yq")).as("s_y"),
        sum(col("xq") * col("yq")).as("s_xy"),
        sum(col("xq") * col("xq")).as("s_xx"))
      .select(
        col("n").as("n_terms"),
        ((col("n").cast("double") * col("s_xy") - col("s_x").cast("double") * col("s_y"))
          / (col("n").cast("double") * col("s_xx") - col("s_x").cast("double") * col("s_x")))
          .as("slope"),
        ((col("s_y").cast("double") / col("n") / 1e6)
          - ((col("n").cast("double") * col("s_xy") - col("s_x").cast("double") * col("s_y"))
            / (col("n").cast("double") * col("s_xx") - col("s_x").cast("double") * col("s_x")))
            * (col("s_x").cast("double") / col("n") / 1e6)).as("intercept"))
  }

  val q126Sql: String =
    """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      |words AS (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM toks
      |          WHERE regexp_matches(w, '^[a-z]+$') GROUP BY w),
      |top AS (SELECT w, freq FROM words ORDER BY freq DESC, w LIMIT 100),
      |q AS (
      |  SELECT
      |   CAST(round(ln(CAST(row_number() OVER (ORDER BY freq DESC, w) AS DOUBLE)) * 1e6) AS BIGINT) AS xq,
      |   CAST(round(ln(CAST(freq AS DOUBLE)) * 1e6) AS BIGINT) AS yq
      |  FROM top),
      |m AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |   CAST(sum(xq) AS BIGINT) AS s_x, CAST(sum(yq) AS BIGINT) AS s_y,
      |   CAST(sum(xq * yq) AS BIGINT) AS s_xy, CAST(sum(xq * xq) AS BIGINT) AS s_xx
      |  FROM q)
      |SELECT n AS n_terms,
      | (CAST(n AS DOUBLE) * s_xy - CAST(s_x AS DOUBLE) * s_y)
      |   / (CAST(n AS DOUBLE) * s_xx - CAST(s_x AS DOUBLE) * s_x) AS slope,
      | (CAST(s_y AS DOUBLE) / n / 1e6)
      |   - ((CAST(n AS DOUBLE) * s_xy - CAST(s_x AS DOUBLE) * s_y)
      |      / (CAST(n AS DOUBLE) * s_xx - CAST(s_x AS DOUBLE) * s_x))
      |     * (CAST(s_x AS DOUBLE) / n / 1e6) AS intercept
      |FROM m""".stripMargin

  /** q127: token coverage curve — what fraction of all corpus token
   *  occurrences the top-k most frequent terms cover, for k ∈ {10,
   *  100, 1000}. The curve's knee is how vocabulary sizes get chosen
   *  (and why BPE exists: word-level coverage saturates slowly).
   *
   *  Scale: one vocabulary hash aggregate, then one TakeOrdered per k
   *  (bounded top-k merge, no global sort, no vocab-wide
   *  single-partition window) plus a 1-row total aggregate; the three
   *  k-legs union into a 3-row result. Coverage ships as a raw
   *  long/long division. */
  def q127TokenCoverage(s: SparkSession, d: String): DataFrame =
    tokenCoverage(documents(s, d), Seq(10, 100, 1000))

  /** Core of q127 over any (text) frame and k-list. */
  def tokenCoverage(docs: DataFrame, ks: Seq[Int]): DataFrame = {
    // eager localCheckpoint (NOT cache+unpersist: the unpersist would
    // run before the lazily-returned plan ever executes) — the vocab
    // aggregate feeds one TakeOrdered per k plus the total
    val vocab = Bpe.vocabulary(docs).localCheckpoint()
    val total = vocab.agg(sum(col("freq")).as("total"))
    val legs = ks.map { k =>
      vocab.orderBy(col("freq").desc, col("w")).limit(k)
        .agg(count(lit(1)).as("n_terms"), sum(col("freq")).as("top_tokens"))
        .select(lit(k.toLong).as("k"), col("n_terms"), col("top_tokens"))
    }
    legs.reduce(_.unionAll(_))
      .crossJoin(total) // |ks|×1 rows
      .select(col("k"), col("n_terms"), col("top_tokens"), col("total").as("total_tokens"),
        (col("top_tokens") * lit(1.0) / col("total")).as("coverage"))
      .orderBy(col("k"))
  }

  val q127Sql: String =
    """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      |words AS (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM toks
      |          WHERE regexp_matches(w, '^[a-z]+$') GROUP BY w),
      |ranked AS (
      |  SELECT freq, CAST(row_number() OVER (ORDER BY freq DESC, w) AS BIGINT) AS r
      |  FROM words),
      |tot AS (SELECT CAST(sum(freq) AS BIGINT) AS total FROM words),
      |ks AS (SELECT unnest(CAST([10, 100, 1000] AS BIGINT[])) AS k)
      |SELECT k,
      | CAST(count(CASE WHEN r <= k THEN 1 END) AS BIGINT) AS n_terms,
      | CAST(sum(CASE WHEN r <= k THEN freq ELSE 0 END) AS BIGINT) AS top_tokens,
      | (SELECT total FROM tot) AS total_tokens,
      | CAST(sum(CASE WHEN r <= k THEN freq ELSE 0 END) AS BIGINT) * 1.0
      |   / (SELECT total FROM tot) AS coverage
      |FROM ks, ranked
      |GROUP BY k ORDER BY k""".stripMargin
}
