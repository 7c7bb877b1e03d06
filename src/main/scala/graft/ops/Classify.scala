package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Model-based document classification — the fastText-shaped quality /
 * domain classifier every curation pipeline trains over its own
 * corpus (CCNet's lang/quality filters, GPT-3's WebText-vs-CommonCrawl
 * logistic filter, FineWeb's edu classifier). The engine ships the
 * fully-SQL-expressible member of that family: a multinomial Naive
 * Bayes classifier with Laplace smoothing, trained AND applied in one
 * job, so the whole train→score→argmax loop is oracle-checkable
 * end-to-end (no gradient descent, no float accumulation ordering).
 *
 * Scale design:
 *  - Training is ONE corpus shuffle: token counts keyed by
 *    (term, class) — the same (vocab × classes)-bounded model shape
 *    as q79's bigram table, ≪ corpus at any scale.
 *  - The smoothed log-likelihood table is densified vocab × classes
 *    (Laplace needs the zero cells); classes are a bounded dimension
 *    (sources / languages / quality buckets — the q104 T² argument),
 *    so the densification is a small multiple of the vocabulary.
 *  - Scoring joins the per-doc (term, tf) frame to the model on
 *    term — the join key is the shuffle key the tf frame was just
 *    built on; no mandatory broadcast hint (AQE decides; at web scale
 *    a capped vocabulary keeps the model broadcastable anyway).
 *  - The per-(doc, class) sum rides the doc_id keys; argmax is a
 *    bounded row_number window over |classes| rows per doc, and the
 *    prior-only base (docs × classes) guarantees token-free docs
 *    still classify (to the max-prior class) instead of vanishing.
 *
 * Determinism (the q79 micro-nat discipline): every ln() is quantized
 * to integral micro-nats FIRST; per-(doc, class) scores are exact
 * long sums, so addition order — Spark partial aggregates vs DuckDB —
 * cannot flip an argmax. Ties break on the class name.
 */
object Classify {
  import Tables._

  /** Multinomial NB over whitespace tokens: train on `labelCol`,
   *  score every doc, return (doc_id, actual, predicted, score_micro,
   *  is_correct). Resubstitution scoring — the corpus-audit shape
   *  (a production filter would persist the model table and score
   *  incoming batches with the identical join). */
  def naiveBayes(docs: DataFrame, labelCol: String): DataFrame = {
    val base = docs.select(col("doc_id"), col(labelCol).as("actual"), col("text"))
    val toks = base
      .select(col("doc_id"), col("actual"), explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)

    // ---- train: all counts from one corpus shuffle ----
    val tc = toks.groupBy(col("actual").as("cls"), col("term"))
      .agg(count(lit(1)).as("n_wc"))
    val classTotals = tc.groupBy(col("cls")).agg(sum(col("n_wc")).as("n_c"))
    val vocab = tc.select(col("term")).distinct()
    val vocabSize = vocab.agg(count(lit(1)).as("v"))
    val docsPerClass = base.groupBy(col("actual").as("cls"))
      .agg(count(lit(1)).as("d_c"))
    val nDocs = base.agg(count(lit(1)).as("n_docs"))

    // densified smoothed log-likelihood: ln((n_wc + 1) / (n_c + V)),
    // micro-nat-quantized (irrational ln keeps round() off halves)
    val model = vocab.crossJoin(classTotals).crossJoin(broadcast(vocabSize))
      .join(tc, Seq("term", "cls"), "left")
      .withColumn("ll_micro",
        round(log((coalesce(col("n_wc"), lit(0L)) + lit(1)).cast("double") /
          (col("n_c") + col("v"))) * 1000000).cast("long"))
      .select(col("term"), col("cls"), col("ll_micro"))

    val priors = docsPerClass.crossJoin(broadcast(nDocs))
      .withColumn("prior_micro",
        round(log(col("d_c").cast("double") / col("n_docs")) * 1000000).cast("long"))
      .select(col("cls"), col("prior_micro"))

    // ---- apply: tf ⋈ model, prior-seeded base, exact long sums ----
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val tokenScore = tf.join(model, Seq("term"))
      .groupBy(col("doc_id"), col("cls"))
      .agg(sum(col("tf") * col("ll_micro")).as("tok_micro"))
    val scored = base.select(col("doc_id"), col("actual"))
      .crossJoin(broadcast(priors))
      .join(tokenScore, Seq("doc_id", "cls"), "left")
      .withColumn("score_micro",
        col("prior_micro") + coalesce(col("tok_micro"), lit(0L)))

    val best = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_micro").desc, col("cls"))
    scored
      .withColumn("rn", row_number().over(best))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("actual"), col("cls").as("predicted"),
        col("score_micro"),
        // coalesce: a NULL label must compare as not-correct (0) the
        // way the oracle's CASE does, not propagate NULL
        coalesce((col("cls") === col("actual")).cast("int"), lit(0))
          .cast("long").as("is_correct"))
      .orderBy(col("doc_id"))
  }

  /** q145: NB source classifier over the documents corpus. */
  def q145NaiveBayes(s: SparkSession, d: String): DataFrame =
    naiveBayes(documents(s, d), "source")

  // ------------------------------------------------------------------
  // q162: weak-supervision label model (majority vote → accuracy-
  // weighted revote)
  // ------------------------------------------------------------------

  /** q162: programmatic labeling à la Snorkel (Ratner et al.,
   *  VLDB'17): five deterministic labeling functions vote
   *  {-1, 0 = abstain, +1} per document; a majority vote bootstraps a
   *  proxy label; each LF earns an integer reliability weight (its
   *  agreement count with the majority over its non-abstain votes —
   *  the one-step, closed-form stand-in for the label model's learned
   *  accuracies); the final label is the sign of the weight-weighted
   *  revote. Everything is exact integer arithmetic — votes, weights,
   *  weighted scores — so there is no float ordering anywhere and the
   *  frame is bit-identical cross-engine.
   *
   *  Scale: one corpus scan computes all five votes as a projection;
   *  the weights are a 1-row conditional aggregate (broadcast back,
   *  maxRows = 1); the revote is a second projection. No data-sized
   *  join, no window. At 100 TB this is two scans of the corpus and
   *  one 1-row exchange. */
  def q162WeakLabels(s: SparkSession, d: String): DataFrame = {
    val sgn = (c: org.apache.spark.sql.Column) =>
      when(c > 0, 1L).when(c < 0, -1L).otherwise(0L)
    val votes = documents(s, d).select(
        col("doc_id"),
        when(col("text").contains("spark"), 1L).otherwise(0L).as("v1"),
        when(col("text").contains("stream"), 1L)
          .when(col("text").contains("batch"), -1L).otherwise(0L).as("v2"),
        when(col("n_chars") >= 300, 1L).otherwise(-1L).as("v3"),
        when(col("text").contains("slow"), -1L).otherwise(0L).as("v4"),
        when(col("text").contains("window") && col("text").contains("agg"), 1L)
          .otherwise(0L).as("v5"))
      .withColumn("majority", sgn(col("v1") + col("v2") + col("v3") + col("v4") + col("v5")))
      .withColumn("n_votes",
        (col("v1") =!= 0).cast("long") + (col("v2") =!= 0).cast("long")
          + (col("v3") =!= 0).cast("long") + (col("v4") =!= 0).cast("long")
          + (col("v5") =!= 0).cast("long"))
    def agree(v: String) =
      sum(when(col(v) =!= 0 && col(v) === col("majority"), 1L).otherwise(0L))
    val weights = votes.agg(
      agree("v1").as("w1"), agree("v2").as("w2"), agree("v3").as("w3"),
      agree("v4").as("w4"), agree("v5").as("w5"))
    votes.crossJoin(broadcast(weights))
      .withColumn("score",
        col("v1") * col("w1") + col("v2") * col("w2") + col("v3") * col("w3")
          + col("v4") * col("w4") + col("v5") * col("w5"))
      .withColumn("label", sgn(col("score")))
      .select(col("doc_id"), col("n_votes"), col("majority"),
        col("score"), col("label"))
      .orderBy(col("doc_id"))
  }

  val q162Sql: String =
    """WITH v AS (
      |  SELECT doc_id,
      |   CASE WHEN contains(text, 'spark') THEN 1 ELSE 0 END AS v1,
      |   CASE WHEN contains(text, 'stream') THEN 1
      |        WHEN contains(text, 'batch') THEN -1 ELSE 0 END AS v2,
      |   CASE WHEN n_chars >= 300 THEN 1 ELSE -1 END AS v3,
      |   CASE WHEN contains(text, 'slow') THEN -1 ELSE 0 END AS v4,
      |   CASE WHEN contains(text, 'window') AND contains(text, 'agg')
      |        THEN 1 ELSE 0 END AS v5
      |  FROM documents),
      |m AS (
      |  SELECT *,
      |   CASE WHEN v1+v2+v3+v4+v5 > 0 THEN 1
      |        WHEN v1+v2+v3+v4+v5 < 0 THEN -1 ELSE 0 END AS majority
      |  FROM v),
      |w AS (
      |  SELECT
      |   sum(CASE WHEN v1 <> 0 AND v1 = majority THEN 1 ELSE 0 END) AS w1,
      |   sum(CASE WHEN v2 <> 0 AND v2 = majority THEN 1 ELSE 0 END) AS w2,
      |   sum(CASE WHEN v3 <> 0 AND v3 = majority THEN 1 ELSE 0 END) AS w3,
      |   sum(CASE WHEN v4 <> 0 AND v4 = majority THEN 1 ELSE 0 END) AS w4,
      |   sum(CASE WHEN v5 <> 0 AND v5 = majority THEN 1 ELSE 0 END) AS w5
      |  FROM m)
      |SELECT m.doc_id,
      | CAST((CASE WHEN v1 <> 0 THEN 1 ELSE 0 END) + (CASE WHEN v2 <> 0 THEN 1 ELSE 0 END)
      |  + (CASE WHEN v3 <> 0 THEN 1 ELSE 0 END) + (CASE WHEN v4 <> 0 THEN 1 ELSE 0 END)
      |  + (CASE WHEN v5 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_votes,
      | CAST(m.majority AS BIGINT) AS majority,
      | CAST(v1*w.w1 + v2*w.w2 + v3*w.w3 + v4*w.w4 + v5*w.w5 AS BIGINT) AS score,
      | CAST(CASE WHEN v1*w.w1 + v2*w.w2 + v3*w.w3 + v4*w.w4 + v5*w.w5 > 0 THEN 1
      |      WHEN v1*w.w1 + v2*w.w2 + v3*w.w3 + v4*w.w4 + v5*w.w5 < 0 THEN -1
      |      ELSE 0 END AS BIGINT) AS label
      |FROM m, w ORDER BY doc_id""".stripMargin

  val q145Sql: String =
    """WITH base AS (SELECT doc_id, source AS actual, text FROM documents),
      |toks AS (
      |  SELECT doc_id, actual, t.term
      |  FROM base, LATERAL (SELECT unnest(string_split(text, ' ')) AS term) t
      |  WHERE length(t.term) > 0),
      |tc AS (SELECT actual AS cls, term, CAST(count(*) AS BIGINT) AS n_wc
      |       FROM toks GROUP BY 1, 2),
      |ct AS (SELECT cls, CAST(sum(n_wc) AS BIGINT) AS n_c FROM tc GROUP BY 1),
      |vocab AS (SELECT DISTINCT term FROM tc),
      |vs AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vocab),
      |dpc AS (SELECT actual AS cls, CAST(count(*) AS BIGINT) AS d_c
      |        FROM base GROUP BY 1),
      |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM base),
      |model AS (
      |  SELECT vocab.term, ct.cls,
      |   CAST(round(ln(CAST(coalesce(tc.n_wc, 0) + 1 AS DOUBLE) / (ct.n_c + vs.v))
      |        * 1000000) AS BIGINT) AS ll_micro
      |  FROM vocab CROSS JOIN ct CROSS JOIN vs
      |  LEFT JOIN tc ON tc.term = vocab.term AND tc.cls = ct.cls),
      |priors AS (
      |  SELECT cls,
      |   CAST(round(ln(CAST(d_c AS DOUBLE) / n_docs) * 1000000) AS BIGINT) AS prior_micro
      |  FROM dpc CROSS JOIN nd),
      |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      |       FROM toks GROUP BY 1, 2),
      |ts AS (
      |  SELECT tf.doc_id, m.cls, CAST(sum(tf.tf * m.ll_micro) AS BIGINT) AS tok_micro
      |  FROM tf JOIN model m USING (term) GROUP BY 1, 2),
      |scored AS (
      |  SELECT b.doc_id, b.actual, p.cls,
      |   p.prior_micro + coalesce(ts.tok_micro, 0) AS score_micro
      |  FROM (SELECT doc_id, actual FROM base) b
      |  CROSS JOIN priors p
      |  LEFT JOIN ts ON ts.doc_id = b.doc_id AND ts.cls = p.cls)
      |SELECT doc_id, actual, cls AS predicted, score_micro,
      | CAST(CASE WHEN cls = actual THEN 1 ELSE 0 END AS BIGINT) AS is_correct
      |FROM (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id
      |           ORDER BY score_micro DESC, cls) AS rn
      |  FROM scored) r
      |WHERE rn = 1 ORDER BY doc_id""".stripMargin
}
