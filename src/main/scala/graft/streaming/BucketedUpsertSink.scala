package graft.streaming

import graft.ops.MergeOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Bucket-pruned streaming CDC-upsert sink — the MERGE shape that
 * stays affordable at a 100 TB snapshot: the snapshot is
 * hash-bucketed by `pmod(xxhash64(key), numBuckets)` and each
 * micro-batch rewrites ONLY the buckets its keys touch. Untouched
 * buckets carry forward BY REFERENCE — their files are never read,
 * never rewritten, and stay byte-identical across versions
 * (BucketedUpsertSinkSpec pins this) — so per-batch I/O is
 * O(touched buckets × bucket size), not O(snapshot), the exact cost
 * separation Delta/Iceberg MERGE achieves by rewriting only matched
 * files. Versions are append-only (`base/v<id>/__bucket=<b>/`): a
 * version is never mutated after its write, so a reader resolving
 * the manifest sees a consistent snapshot even mid-merge.
 *
 * The manifest (bucket → directory of its current data) lives on the
 * driver, mirroring how foreachBatch sinks track state; a durable
 * deployment would persist it next to the version dirs (an Iceberg
 * manifest-list in miniature). Its size is `numBuckets` entries —
 * bounded by construction, like the per-batch `touched` collect
 * (≤ numBuckets longs from a distinct over the batch's bucket ids).
 *
 * The bucket id is DERIVED from the key (recomputed on read, never
 * stored in the files), so bucket routing can't drift from the data
 * and the snapshot schema stays exactly the payload schema.
 */
final class BucketedUpsertSink(s: SparkSession, base: String, key: String,
    ord: String, numBuckets: Int) {

  @volatile private var manifest = Map.empty[Long, String]

  private def bucketOf(df: DataFrame) =
    df.withColumn("__bucket", pmod(xxhash64(col(key)), lit(numBuckets.toLong)))

  /** Current bucket → directory mapping (exposed for the byte-identity
    * spec; production readers would go through [[snapshot]]). */
  def bucketDirs: Map[Long, String] = manifest

  /** Merge one micro-batch: latest-wins per key (greatest `ord`, ties
    * broken by the remaining columns — [[MergeOps.latestPerKey]])
    * against ONLY the buckets the batch touches. */
  def merge(batch: DataFrame, version: Long): Unit = {
    val b = bucketOf(batch)
    // bounded driver collect: ≤ numBuckets distinct bucket ids
    val touched = b.select(col("__bucket")).distinct()
      .collect().map(_.getLong(0)).toSeq
    if (touched.isEmpty) return
    val priorDirs = touched.flatMap(manifest.get)
    val all =
      if (priorDirs.isEmpty) b
      else bucketOf(s.read.parquet(priorDirs: _*)).unionByName(b)
    val next = s"$base/v$version"
    // __bucket rides through latestPerKey as a payload column (it is
    // constant per key, so it can't affect the max-struct winner) and
    // partitionBy consumes it — the files hold only payload columns
    MergeOps.latestPerKey(all, key, ord)
      .write.partitionBy("__bucket").mode("overwrite").parquet(next)
    manifest ++= touched.map(bk => bk -> s"$next/__bucket=$bk")
  }

  /** The assembled current snapshot: one read over each bucket's
    * latest directory. Empty (schema-less use is an error) before the
    * first merge. */
  def snapshot(): DataFrame = {
    require(manifest.nonEmpty, "no batch has been merged yet")
    s.read.parquet(manifest.values.toSeq: _*)
  }
}
