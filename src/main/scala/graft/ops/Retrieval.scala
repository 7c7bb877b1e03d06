package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.cosine_sim
import graft.functions.TopK

/**
 * Full-text retrieval over the corpus: BM25 scoring against a small
 * query set — the retrieval shape a training-data pipeline runs for
 * RAG indexing, decontamination lookups, and eval-set mining.
 * (Okapi BM25 with the Lucene idf variant, Robertson et al.;
 * k1 = 1.2, b = 0.75.)
 *
 * Scale design (the inverted-index probe, not an index build):
 *  - The query term set is tiny BY CONSTRUCTION (human-written
 *    queries), so it broadcasts and — crucially — filters the token
 *    stream BEFORE any shuffle: the only corpus-sized work is the
 *    scan itself; the (doc, term) aggregate that follows holds only
 *    docs containing at least one query term.
 *  - Per-doc length dl is a scan-local projection computed on the
 *    SAME pass that explodes tokens (carried through the explode),
 *    so no corpus-wide doc_id join is needed; the corpus-wide stats
 *    (N, avgdl) reduce to one broadcast row.
 *  - Document frequencies come from the already-restricted tf frame
 *    (query terms only), so the df table is |query terms| rows.
 *  - Top-k per query uses the bounded TopK aggregate, not a window:
 *    a window would sort every candidate per query; the heap ships
 *    k rows per partition.
 *
 * Determinism (oracle-exact across engines): each (term, doc)
 * contribution is quantized to integer micro-units FIRST and summed
 * as longs (order-free), the q79 micro-nat discipline. The double
 * chain before quantization uses only exact-integer-derived values,
 * and its irrational ln() factor keeps round() away from exact-half
 * boundaries.
 */
object Retrieval {
  import Tables._

  /** The fixed demo query set (terms drawn from the corpus vocab;
   *  query 2's `dup` is the rare high-idf term). */
  val Queries: Seq[(Long, String)] = Seq(
    1L -> "spark", 1L -> "join",
    2L -> "dup", 2L -> "merge",
    3L -> "stream", 3L -> "window", 3L -> "batch",
    4L -> "fast", 4L -> "sort",
    5L -> "customer", 5L -> "order", 5L -> "query")

  private val K1 = 2.2 // k1 + 1 pre-folded into the numerator
  // k1 * (1 - b) and k1 * b with k1 = 1.2, b = 0.75
  private val KOneMinusB = 1.2 * 0.25
  private val KB = 1.2 * 0.75

  /** BM25 top-k: queries is (query_id, term) rows — a HUMAN-scale
   *  query set by contract (it is collected to build the executor-side
   *  term filter, the same bound every search head places on a query).
   *  Returns (query_id, rnk, doc_id, score) for the k best docs per
   *  query. */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    TopK.register(s)
    val termSet = queries.select(col("term")).distinct()
      .collect().map(_.getString(0)).toSet

    // ONE corpus pass, ONE tokenize per document (typed flatMap — the
    // shingleRows finding: column-expression formulations re-split the
    // text once per use after Catalyst inlines the projection, and the
    // higher-order filter lambda runs outside codegen). Emits per-doc
    // stats carriers (dl) and only QUERY-term hits, so the shuffle
    // that follows holds candidate docs only, never the corpus.
    val typed = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text0) =>
          val toks = Option(text0).getOrElse("").split(' ').filter(_.nonEmpty)
          (id, toks.length.toLong, toks.filter(termSet))
        }
      }
      .toDF("doc_id", "dl", "hits")

    val tf = typed
      .select(col("doc_id"), col("dl"), explode(col("hits")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))

    // corpus stats reduce on the same pass's projection: 1 broadcast row
    val stats = typed
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("dl")) * lit(1.0) / count(lit(1))).as("avgdl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))

    // per-(term, doc) contribution, micro-quantized for order-free sums;
    // expression shape mirrors the oracle SQL token for token
    val idf = log(lit(1) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val denom = col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))
    val contrib = tf
      .join(broadcast(dfreq), "term")
      .join(broadcast(queries), "term")
      .crossJoin(broadcast(stats))
      .withColumn("c",
        round(idf * (col("tf") * lit(K1)) / denom * lit(1000000)).cast("long"))
    val scored = contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c")).as("score_micro"))

    // bounded top-k per query; TopK ties break on the smaller payload,
    // matching the oracle's ORDER BY score DESC, doc_id. The micro
    // long IS the sort key — no double round-trip before ranking.
    scored
      .groupBy(col("query_id"))
      .agg(TopK.topk(col("score_micro"), col("doc_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rnk"),
        col("col.payload").as("doc_id"), (col("col.v") / lit(1000000.0)).as("score"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** q97: BM25 retrieval, top-10 per demo query. */
  def q97Bm25(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val queries = Queries.toDF("query_id", "term")
    bm25TopK(documents(s, d).select(col("doc_id"), col("text")), queries, 10)
  }

  val q97Sql: String =
    """WITH q(query_id, term) AS (VALUES
      |  (1,'spark'),(1,'join'),(2,'dup'),(2,'merge'),
      |  (3,'stream'),(3,'window'),(3,'batch'),(4,'fast'),(4,'sort'),
      |  (5,'customer'),(5,'order'),(5,'query')),
      |d AS (SELECT doc_id, len(list_filter(string_split(text,' '), x -> len(x)>0)) AS dl
      |      FROM documents),
      |stats AS (SELECT count(*) AS n_docs, sum(dl) * 1.0 / count(*) AS avgdl FROM d),
      |toks AS (SELECT doc_id, unnest(string_split(text,' ')) AS term FROM documents),
      |tf AS (SELECT t.doc_id, t.term, count(*) AS tf
      |       FROM toks t JOIN (SELECT DISTINCT term FROM q) qt USING (term)
      |       GROUP BY t.doc_id, t.term),
      |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      |contrib AS (
      |  SELECT q.query_id, tf.doc_id,
      |   CAST(round(ln(1 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
      |     * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))
      |     * 1000000) AS BIGINT) AS c
      |  FROM tf JOIN dfreq f USING (term) JOIN q USING (term)
      |          JOIN d ON tf.doc_id = d.doc_id CROSS JOIN stats s),
      |scored AS (SELECT query_id, doc_id, sum(c) / 1000000.0 AS score
      |           FROM contrib GROUP BY query_id, doc_id)
      |SELECT query_id, rnk, doc_id, score FROM (
      |  SELECT query_id, doc_id, score,
      |   row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk
      |  FROM scored) r
      |WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin

  // ---------------------------------------------------------------
  // q146: hybrid retrieval — BM25 ∪ dense cosine, RRF fusion
  // ---------------------------------------------------------------

  /** q146: hybrid retrieval with reciprocal-rank fusion (Cormack et
   *  al. '09, the standard k=60 variant) — the two-tower shape every
   *  production RAG stack runs: a sparse lexical leg (BM25, q97's
   *  scorer at k=20) and a dense semantic leg (exact cosine over the
   *  query docs' own embeddings, q26's contract at k=20), fused by
   *  summing 1/(60+rank) credit per system and re-ranking.
   *
   *  Scale: each leg is an already-audited retrieval shape (BM25's
   *  pre-shuffle query-term filter; cosine against a broadcast
   *  query-vector set); the fusion itself touches only the two
   *  top-k frames — queries × 40 rows, corpus-independent.
   *
   *  Determinism: RRF credit is the INTEGER quotient
   *  1000000000 div (60 + rank) — no doubles anywhere in the fusion,
   *  so fused scores are exact long sums; ties break on doc_id. */
  def q146HybridRrf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val queries = Queries.toDF("query_id", "term")
    val sparse = bm25TopK(documents(s, d).select(col("doc_id"), col("text")),
        queries, 20)
      .select(col("query_id"), col("doc_id"), col("rnk"))
    // dense leg: the query docs' embeddings probe the corpus — ids
    // 1..5 are exactly the BM25 query_id domain, so both systems
    // rank the same id space (doc_id ≡ vec_id in the testdata)
    val e = embeddings(s, d).select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id").between(1, 5))
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val dense = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("sim", round(cosine_sim(col("embedding"), col("qe")), 6))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("sim").desc, col("vec_id"))).cast("long"))
      .filter(col("rnk") <= 20)
      .select(col("query_id"), col("vec_id").as("doc_id"), col("rnk"))
    rrfFuse(Seq(sparse, dense), 10)
  }

  /** Reciprocal-rank fusion of N (query_id, doc_id, rnk) ranking
   *  frames: integer credit 10⁹ div (60 + rnk) per system, exact
   *  long sums, top-k re-rank with doc_id tie-break. */
  def rrfFuse(legs: Seq[DataFrame], k: Int): DataFrame = {
    val fused = legs.reduce(_ unionByName _)
      .select(col("query_id"), col("doc_id"),
        expr("1000000000 div (60 + rnk)").as("c"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c")).as("rrf_units"))
    fused
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("rrf_units").desc, col("doc_id"))).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("doc_id"), col("rrf_units"))
      .orderBy(col("query_id"), col("rnk"))
  }

  val q146Sql: String =
    """WITH q(query_id, term) AS (VALUES
      |  (1,'spark'),(1,'join'),(2,'dup'),(2,'merge'),
      |  (3,'stream'),(3,'window'),(3,'batch'),(4,'fast'),(4,'sort'),
      |  (5,'customer'),(5,'order'),(5,'query')),
      |d AS (SELECT doc_id, len(list_filter(string_split(text,' '), x -> len(x)>0)) AS dl
      |      FROM documents),
      |stats AS (SELECT count(*) AS n_docs, sum(dl) * 1.0 / count(*) AS avgdl FROM d),
      |toks AS (SELECT doc_id, unnest(string_split(text,' ')) AS term FROM documents),
      |tf AS (SELECT t.doc_id, t.term, count(*) AS tf
      |       FROM toks t JOIN (SELECT DISTINCT term FROM q) qt USING (term)
      |       GROUP BY t.doc_id, t.term),
      |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      |contrib AS (
      |  SELECT q.query_id, tf.doc_id,
      |   CAST(round(ln(1 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
      |     * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))
      |     * 1000000) AS BIGINT) AS c
      |  FROM tf JOIN dfreq f USING (term) JOIN q USING (term)
      |          JOIN d ON tf.doc_id = d.doc_id CROSS JOIN stats s),
      |sparse AS (
      |  SELECT query_id, doc_id, rnk FROM (
      |    SELECT query_id, doc_id,
      |     row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk
      |    FROM (SELECT query_id, doc_id, sum(c) AS score
      |          FROM contrib GROUP BY query_id, doc_id) s0) s1
      |  WHERE rnk <= 20),
      |dense AS (
      |  SELECT query_id, nid AS doc_id, rnk FROM (
      |    SELECT q2.vec_id AS query_id, c2.vec_id AS nid,
      |     row_number() OVER (PARTITION BY q2.vec_id ORDER BY
      |      round(list_dot_product(CAST(q2.embedding AS DOUBLE[]), CAST(c2.embedding AS DOUBLE[]))
      |        / (sqrt(list_dot_product(CAST(q2.embedding AS DOUBLE[]), CAST(q2.embedding AS DOUBLE[])))
      |           * sqrt(list_dot_product(CAST(c2.embedding AS DOUBLE[]), CAST(c2.embedding AS DOUBLE[])))), 6)
      |      DESC, c2.vec_id) AS rnk
      |    FROM embeddings q2 JOIN embeddings c2
      |      ON q2.vec_id BETWEEN 1 AND 5 AND c2.vec_id <> q2.vec_id) t
      |  WHERE rnk <= 20),
      |u AS (
      |  SELECT query_id, doc_id, CAST(1000000000 // (60 + rnk) AS BIGINT) AS c FROM sparse
      |  UNION ALL
      |  SELECT query_id, doc_id, CAST(1000000000 // (60 + rnk) AS BIGINT) FROM dense),
      |f AS (SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS rrf_units
      |      FROM u GROUP BY query_id, doc_id)
      |SELECT query_id, rnk, doc_id, rrf_units FROM (
      |  SELECT query_id, doc_id, rrf_units,
      |   row_number() OVER (PARTITION BY query_id ORDER BY rrf_units DESC, doc_id) AS rnk
      |  FROM f) r
      |WHERE rnk <= 10 ORDER BY query_id, rnk""".stripMargin

  // ---------------------------------------------------------------
  // q154: phrase search over a positional inverted index
  // ---------------------------------------------------------------

  /** q154: exact-phrase search the inverted-index way — the corpus's
   *  hottest bigram (count desc, phrase asc — deterministic) becomes
   *  the query phrase; matches come from POSITIONAL POSTINGS
   *  (term, doc_id, pos) self-joined on (doc_id, pos+1), never from
   *  re-scanning text. Positions are DENSE 1-based indices among the
   *  non-empty tokens (TextAnalysis.spaceToks — one flatMap pass, no
   *  posexplode + window sort of the token stream), so `pos + 1` IS
   *  consecutive-token adjacency on both engines even across repeated
   *  separators.
   *
   *  Scale: at 100 TB the postings frame is the durable inverted
   *  index bucketed BY TERM — a phrase query reads |phrase| term
   *  shards and joins them co-partitioned on doc_id, touching
   *  posting-list bytes, not corpus bytes. Here the phrase-selection
   *  stage is corpus-wide by design (it picks the demo query); the
   *  1-row winner broadcasts back, so the search leg's plan is the
   *  production one. Overlapping occurrences count individually
   *  (position pairs), matching the window-replay oracle exactly. */
  def q154PhraseSearch(s: SparkSession, d: String): DataFrame = {
    val base = documents(s, d).select(col("doc_id"), col("text"))
    val toks = TextAnalysis.spaceToks(base)
    val hot = TextAnalysis.spaceBigrams(base)
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w1"), col("w2"))
      .limit(1)
    val p1 = toks.join(broadcast(hot), col("term") === col("w1"))
      .select(col("doc_id"), col("pos"), col("w1"), col("w2"))
    val p2 = toks.select(col("doc_id").as("d2"), col("pos").as("q"), col("term").as("t2"))
    p1.join(p2, col("doc_id") === col("d2") && col("q") === col("pos") + 1 &&
        col("t2") === col("w2"))
      .groupBy(col("doc_id"), concat_ws(" ", col("w1"), col("w2")).as("phrase"))
      .agg(count(lit(1)).as("n_hits"), min(col("pos")).as("first_pos"))
      .orderBy(col("doc_id"))
  }

  val q154Sql: String =
    """WITH toks0 AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
      |   CAST(generate_subscripts(string_split(text, ' '), 1) AS BIGINT) AS raw_pos
      |  FROM documents),
      |t2 AS (
      |  SELECT doc_id, term,
      |   row_number() OVER (PARTITION BY doc_id ORDER BY raw_pos) AS pos
      |  FROM toks0 WHERE term <> ''),
      |adj AS (
      |  SELECT doc_id, term, pos,
      |   lead(term) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
      |  FROM t2
      |  QUALIFY lead(term) OVER (PARTITION BY doc_id ORDER BY pos) IS NOT NULL),
      |hot AS (
      |  SELECT term AS w1, nxt AS w2, count(*) AS c FROM adj
      |  GROUP BY 1, 2 ORDER BY c DESC, w1, w2 LIMIT 1)
      |SELECT a.doc_id, h.w1 || ' ' || h.w2 AS phrase,
      | CAST(count(*) AS BIGINT) AS n_hits,
      | CAST(min(a.pos) AS BIGINT) AS first_pos
      |FROM adj a JOIN hot h ON a.term = h.w1 AND a.nxt = h.w2
      |GROUP BY 1, 2 ORDER BY a.doc_id""".stripMargin
}
