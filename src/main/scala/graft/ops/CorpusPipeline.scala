package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Fluent corpus-preparation pipeline — the user-facing composition of
 * the engine's text/dedup operators into the standard training-data
 * flow: annotate → filter → dedup → materialize.
 *
 * Every stage is a lazy DataFrame transformation; nothing executes
 * until the result is consumed, so Catalyst optimizes ACROSS stages
 * (e.g. a later language filter pushes below an earlier annotation
 * projection and into the scan). Stages only add columns or filter
 * rows — the pipeline never collects to the driver.
 *
 * {{{
 * CorpusPipeline(docs)
 *   .annotateQuality()
 *   .filterLangs(Set("en", "de"))
 *   .filterQuality(min = 15)
 *   .dedupExact()
 *   .dedupFuzzyJaccard(threshold = 0.6)
 *   .result
 * }}}
 */
final case class CorpusPipeline(df: DataFrame, textCol: String = "text",
    idCol: String = "doc_id", langCol: String = "lang",
    private val scopedCaches: Seq[DataFrame] = Nil) {

  private def text: Column = col(textCol)

  /** Adds n_words / n_punct / quality_score — the SAME shared
    * helpers TextAnalysis.q29 uses, so the two can't drift. */
  def annotateQuality(): CorpusPipeline =
    copy(df = df
      .withColumn("n_words", TextAnalysis.tokenCount(text))
      .withColumn("n_punct", TextAnalysis.punctCount(text))
      .withColumn("quality_score", TextAnalysis.qualityScore(text)))

  def filterQuality(min: Long): CorpusPipeline =
    copy(df = df.filter(col("quality_score") >= min))

  def filterLangs(langs: Set[String]): CorpusPipeline =
    copy(df = df.filter(col(langCol).isin(langs.toSeq: _*)))

  /** Exact dedup, keep-smallest-id per identical normalized text
    * (same normalization as TextAnalysis.fingerprint). */
  def dedupExact(): CorpusPipeline = {
    val norm = TextAnalysis.normalizeText(text)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(norm).orderBy(col(idCol))
    copy(df = df
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn"))
  }

  /** Fuzzy dedup: drop the larger id of every Jaccard-near-dup pair.
    *
    * Default (`exact = false`) is the SCALE path: banded-MinHash
    * candidate generation (Dedup.minhashCandidates — whole-band
    * collisions, hot-bucket guarded) followed by exact-Jaccard
    * verification of only those candidates. Work is linear-ish in
    * corpus size instead of quadratic in the hottest shingle.
    *
    * `exact = true` keeps the all-shingle self-join (q23/q40
    * machinery) — the oracle-faithful variant whose recall is exact
    * by construction; use it to audit the banded path's recall.
    *
    * The shingle frame (which embeds the annotated/filtered/
    * exact-deduped upstream plus the shingling flatMap) is built ONCE
    * and `persist`ed here, so the candidate leg, both verify-join
    * legs, and the size aggregate all read the cache instead of
    * re-running the upstream per leg. The cache entry is
    * MEMORY_AND_DISK (spills, LRU-evictable), deduplicated by Spark's
    * CacheManager across repeated pipeline builds, and SCOPED to this
    * pipeline: [[run]] (or an explicit [[close]] after materializing
    * [[result]]) releases it deterministically. */
  def dedupFuzzyJaccard(threshold: Double, exact: Boolean = false): CorpusPipeline = {
    val canonical = df.select(col(idCol).as("doc_id"), col(langCol).as("lang"),
      text.as("text"))
    val sh = Dedup.shingleRows(canonical)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs =
      if (exact) Dedup.jaccardPairsFromShingles(sh, threshold)
      else Dedup.jaccardVerifyFromShingles(sh,
        Dedup.minhashCandidatesFromShingles(sh), threshold)
    val dupIds = pairs.select(col("doc_b")).distinct()
    copy(df = df.join(dupIds, col(idCol) === col("doc_b"), "left_anti"),
      scopedCaches = scopedCaches :+ sh)
  }

  /** Rewrites the text column with every cross-document duplicated
    * k-gram span removed (q91 semantics — any span of ≥ k tokens
    * shared with another document is deleted, survivors re-joined in
    * order). Note the Lee-et-al caveat: removal can juxtapose
    * previously-separated tokens into NEW grams, so fully-dup-free
    * output needs iteration; one pass removes all pre-existing
    * duplicated spans, which is the standard curation step. */
  def removeDuplicatedSubstrings(k: Int = Dedup.SubstrK): CorpusPipeline = {
    val cleaned = Dedup
      .substrRemove(df.select(col(idCol).as("doc_id"), text.as("text")), k)
      .select(col("doc_id").as("__clean_id"), col("cleaned_text"))
    copy(df = df.join(cleaned, col(idCol) === col("__clean_id"))
      .drop(textCol).drop("__clean_id")
      .withColumnRenamed("cleaned_text", textCol))
  }

  /** Near-dup removal with the keep-BEST policy (q94 semantics):
    * forms Jaccard-threshold clusters and keeps each cluster's
    * highest-quality member (ties to the smaller id) instead of
    * dedupFuzzyJaccard's keep-smaller-id. */
  def keepBestPerCluster(threshold: Double = 0.6): CorpusPipeline = {
    val reps = Curation.clusterKeepBest(
        df.select(col(idCol).as("doc_id"), col(langCol).as("lang"), text.as("text")),
        threshold)
      .filter(col("is_rep") === 1)
      .select(col("doc_id").as("__rep_id"))
    copy(df = df.join(reps, col(idCol) === col("__rep_id"), "left_semi"))
  }

  /** Adds a leakage-safe `split` column (q95 semantics): the
    * train/holdout decision is made once per near-dup cluster via
    * the engine-stable LCG on the cluster's keep-best rep, so no
    * near-dup pair straddles the boundary. `holdoutBuckets` of the
    * 10000 LCG buckets go to holdout (default 1000 = 10%). */
  def assignSplit(holdoutBuckets: Long = 1000,
      threshold: Double = 0.6): CorpusPipeline = {
    val splits = Curation.clusterKeepBest(
        df.select(col(idCol).as("doc_id"), col(langCol).as("lang"), text.as("text")),
        threshold)
      .withColumn("bucket", Curation.sampleBucket(col("rep_id")))
      .select(col("doc_id").as("__split_id"),
        when(col("bucket") < lit(10000L) - holdoutBuckets, "train")
          .otherwise("holdout").as("split"))
    copy(df = df.join(splits, col(idCol) === col("__split_id")).drop("__split_id"))
  }

  /** Adds `bin` / `bin_fill` columns (q93 semantics): greedy
    * first-fit-sequential packing into `cap`-token bins, sequenced
    * by id within each `groupCol` shard. */
  def packSequences(cap: Long = Curation.PackCap,
      groupCol: String = "source"): CorpusPipeline = {
    val packed = Curation.packGreedy(
        df.select(col(idCol).as("doc_id"), col(groupCol).as("source"),
          TextAnalysis.tokenCount(text).as("n_tokens")),
        cap)
      .select(col("doc_id").as("__pack_id"), col("bin"), col("bin_fill"))
    copy(df = df.join(packed, col(idCol) === col("__pack_id")).drop("__pack_id"))
  }

  /** Adds `shard` / `pos` columns (q100 semantics): deterministic
    * training-shard assignment + dense pseudo-random position, the
    * last stage before writing data-loader shards. Runs AFTER the
    * filtering/dedup stages so positions are dense over the surviving
    * corpus. */
  def assignShards(numShards: Int): CorpusPipeline = {
    val shards = Curation.shardAssign(df.select(col(idCol).as("doc_id")), numShards)
      .select(col("doc_id").as("__shard_id"), col("shard"), col("pos"))
    copy(df = df.join(shards, col(idCol) === col("__shard_id")).drop("__shard_id"))
  }

  /** The lazy end-to-end frame — plan-inspectable and composable.
    * After materializing it, call [[close]] to release the pipeline's
    * scoped cache entries (or use [[run]], which does both). */
  def result: DataFrame = df

  /** Releases the scoped cache entries persisted by
    * [[dedupFuzzyJaccard]]. Idempotent; non-blocking unpersist, so
    * in-flight jobs reading the cache are unaffected. */
  def close(): Unit = scopedCaches.foreach(_.unpersist(false))

  /** Materializes the pipeline eagerly (localCheckpoint — one pass
    * over the corpus) and releases the scoped caches: nothing from
    * the pipeline outlives the returned frame's lineage. For corpora
    * that exceed executor storage, write [[result]] to a durable sink
    * instead and then [[close]] — same lifecycle, durable carrier. */
  def run(): DataFrame = {
    val out = df.localCheckpoint(true)
    close()
    out
  }

  /** The durable-sink twin of [[run]] for corpora that exceed
    * executor storage: writes the result to parquet (the one
    * materializing pass), releases the scoped caches, and returns a
    * reader over the written data — downstream stages scan the
    * compacted layout instead of re-deriving the pipeline. */
  def writeResult(path: String): DataFrame = {
    val s = df.sparkSession
    df.write.mode("overwrite").parquet(path)
    close()
    s.read.parquet(path)
  }
}

object CorpusPipeline {

  /** Driver-gated end-to-end pipeline run: annotate → lang filter →
    * quality filter → exact dedup → fuzzy dedup → per-lang stats.
    * `exact = true` so the oracle-compared query equals the SQL
    * oracle BY CONSTRUCTION on any corpus (the banded default is
    * probabilistically equivalent — ≈1.2% per-pair miss at J=0.6 —
    * and stays pinned to the exact path by OpsInvariantsSpec). */
  def q54Pipeline(s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    // run() (not .result): the deduped corpus materializes once and
    // the scoped shingle cache is released before the stats aggregate
    // even plans — the driver loop holds no cache entries between
    // queries
    CorpusPipeline(Tables.documents(s, d))
      .annotateQuality()
      .filterLangs(Set("en", "de", "fr"))
      .filterQuality(min = 15)
      .dedupExact()
      .dedupFuzzyJaccard(threshold = 0.6, exact = true)
      .run()
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("quality_score")).as("sum_quality"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"))

  val q54Sql: String =
    """WITH q AS (
      |  SELECT doc_id, lang, text, n_chars,
      |   least(len(regexp_extract_all(text, '[^ \t\n\v\f\r]+')), 100)
      |   + 2*(len(regexp_extract_all(lower(text), '\bthe\b'))
      |       + len(regexp_extract_all(lower(text), '\ba\b'))
      |       + len(regexp_extract_all(lower(text), '\bof\b'))
      |       + len(regexp_extract_all(lower(text), '\band\b'))
      |       + len(regexp_extract_all(lower(text), '\bto\b'))
      |       + len(regexp_extract_all(lower(text), '\bin\b')))
      |   - len(regexp_extract_all(text, '[^A-Za-z0-9 \t\n\v\f\r]')) AS quality_score
      |  FROM documents WHERE lang IN ('en', 'de', 'fr')),
      |qf AS (SELECT * FROM q WHERE quality_score >= 15),
      |ex AS (
      |  SELECT * FROM (
      |   SELECT *, row_number() OVER (
      |     PARTITION BY regexp_replace(trim(lower(text)), '[ \t\n\v\f\r]+', ' ', 'g')
      |     ORDER BY doc_id) AS rn
      |   FROM qf) t WHERE rn = 1),
      |toks AS (SELECT doc_id, lang, string_split_regex(regexp_replace(text, '^[ \t\n\v\f\r]+|[ \t\n\v\f\r]+$', '', 'g'), '[ \t\n\v\f\r]+') AS t FROM ex),
      |sh AS (
      |  SELECT DISTINCT doc_id, lang, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
      |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t)-2)) AS i) g),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |co AS (
      |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS co
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.lang = b.lang AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |dups AS (
      |  SELECT DISTINCT db FROM co
      |  JOIN sizes x ON x.doc_id = da JOIN sizes y ON y.doc_id = db
      |  WHERE co*1.0/(x.n + y.n - co) >= 0.6)
      |SELECT lang, count(*) AS n_docs,
      | CAST(sum(quality_score) AS BIGINT) AS sum_quality,
      | CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM ex WHERE doc_id NOT IN (SELECT db FROM dups)
      |GROUP BY lang ORDER BY lang""".stripMargin
}
