package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

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
 * Durability (an Iceberg manifest-list in miniature): after every
 * merge the FULL bucket → directory mapping is persisted as
 * `base/v<id>/_manifest.tsv` (temp-file + atomic rename, written
 * AFTER the version's parquet), so the newest version with a manifest
 * is always a complete, consistent snapshot. [[BucketedUpsertSink.reopen]]
 * restores a sink from the latest persisted manifest — a crash
 * between parquet write and manifest rename simply falls back to the
 * previous version (the orphan dir is unreferenced and vacuumable).
 * The manifest is `numBuckets` lines — bounded by construction, like
 * the per-batch `touched` collect (≤ numBuckets longs from a distinct
 * over the batch's bucket ids).
 *
 * Retention: superseded bucket directories accumulate by design
 * (append-only versions); [[vacuum]] deletes, below a
 * keep-the-last-N-versions horizon, every bucket dir no retained
 * manifest still references — carried-forward (still-live) dirs are
 * untouched however old their version.
 *
 * The bucket id is DERIVED from the key (recomputed on read, never
 * stored in the files), so bucket routing can't drift from the data
 * and the snapshot schema stays exactly the payload schema.
 */
final class BucketedUpsertSink(s: SparkSession, base: String, key: String,
    ord: String, numBuckets: Int) {
  import BucketedUpsertSink._

  @volatile private var manifest = Map.empty[Long, String]
  @volatile private var lastVersion = -1L

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
    lastVersion = math.max(lastVersion, version)
    persistManifest(version)
  }

  /** The assembled current snapshot: one read over each bucket's
    * latest directory. Empty (schema-less use is an error) before the
    * first merge. */
  def snapshot(): DataFrame = {
    require(manifest.nonEmpty, "no batch has been merged yet")
    s.read.parquet(manifest.values.toSeq: _*)
  }

  /** Delete superseded bucket directories below the retention horizon
    * (the `retainVersions` most recent versions stay fully intact for
    * readers pinned at a recent snapshot). A bucket dir under an old
    * version survives iff the live manifest or any retained version's
    * manifest still references it — a bucket carried forward by
    * reference is live at ANY age and is never touched. A version dir
    * left holding no bucket dirs (all superseded, or an orphan from a
    * crash mid-write) is removed whole. Returns the deleted paths.
    *
    * READER CONTRACT (single-process, embedded use — stated, not
    * enforced): retention is the only lease. A reader that resolved a
    * manifest OLDER than the `retainVersions` horizon can lose files
    * mid-read when vacuum runs concurrently — exactly Delta/Iceberg's
    * `VACUUM` vs time-travel hazard, resolved there by retention
    * windows too. Operate with `retainVersions` ≥ the oldest snapshot
    * any live reader may hold (readers pinned within the horizon are
    * always safe); a multi-process deployment would gate deletion on
    * reader leases instead. */
  def vacuum(retainVersions: Int): Seq[String] = {
    require(retainVersions >= 1, "must retain at least the current version")
    val horizon = lastVersion - retainVersions + 1
    val versions = listVersions(base).sorted
    val referenced: Set[String] =
      manifest.values.toSet ++
        versions.filter(_ >= horizon)
          .flatMap(v => readManifest(Paths.get(s"$base/v$v/$ManifestFile")))
          .flatMap(_.buckets.values)
    val deleted = Seq.newBuilder[String]
    versions.filter(_ < horizon).foreach { v =>
      val vDir = new java.io.File(s"$base/v$v")
      vDir.listFiles().toSeq
        .filter(f => f.isDirectory && f.getName.startsWith("__bucket="))
        .foreach { f =>
          val canonical = s"$base/v$v/${f.getName}"
          if (!referenced.contains(canonical)) {
            deleteRecursively(f.toPath)
            deleted += canonical
          }
        }
      val survivors = vDir.listFiles()
        .count(f => f.isDirectory && f.getName.startsWith("__bucket="))
      if (survivors == 0) { // fully superseded (or crash orphan)
        deleteRecursively(vDir.toPath)
        deleted += vDir.getPath
      }
    }
    deleted.result()
  }

  /** Restore in-memory state from a persisted manifest ([[reopen]]). */
  private[streaming] def restore(version: Long, m: Map[Long, String]): Unit = {
    manifest = m
    lastVersion = version
  }

  /** Persist the full live manifest into the version dir: temp file +
    * atomic rename, so a reader (or recovery) never sees a torn
    * manifest. Written AFTER the version's parquet — a crash in
    * between leaves recovery on the previous complete version. The
    * header line records the sink's ROUTING CONTRACT (numBuckets,
    * key, ord): bucket ids are derived from the key by
    * pmod(xxhash64(key), numBuckets), so a reopen under different
    * parameters would route future merges by a different bucketing
    * than the one the persisted dirs were written under — silently
    * duplicating or dropping keys on carry-forward. [[reopen]] fails
    * fast on any mismatch instead. */
  private def persistManifest(version: Long): Unit = {
    val dir = Paths.get(s"$base/v$version")
    Files.createDirectories(dir)
    val body =
      s"#numBuckets=$numBuckets\tkey=$key\tord=$ord\n" +
        manifest.toSeq.sortBy(_._1)
          .map { case (bk, d) => s"$bk\t$d" }.mkString("", "\n", "\n")
    val tmp = dir.resolve(s"$ManifestFile.tmp")
    Files.write(tmp, body.getBytes("UTF-8"))
    Files.move(tmp, dir.resolve(ManifestFile),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }
}

object BucketedUpsertSink {

  private[streaming] val ManifestFile = "_manifest.tsv"

  /** Recovery constructor: reopen a sink over `base` from the LATEST
    * persisted manifest (versions without one — crash orphans — are
    * skipped). A fresh/empty base yields a sink in the pre-first-merge
    * state. The reopened snapshot is byte-identical to the one the
    * dead sink served: the manifest points at the same immutable
    * version dirs (BucketedUpsertSinkSpec pins this).
    *
    * FAILS FAST (IllegalArgumentException) when the caller's
    * (numBuckets, key, ord) disagree with the manifest header the
    * data was written under: bucket routing is derived from
    * numBuckets and key, so a mismatched reopen would merge future
    * batches under a different bucketing than the carried-forward
    * dirs — silent key duplication/loss. The caller cannot "migrate"
    * a sink by reopening with new parameters; rewrite the snapshot
    * through a fresh sink instead. */
  def reopen(s: SparkSession, base: String, key: String, ord: String,
      numBuckets: Int): BucketedUpsertSink = {
    val sink = new BucketedUpsertSink(s, base, key, ord, numBuckets)
    listVersions(base).sorted.reverse
      .iterator
      .map(v => v -> readManifest(Paths.get(s"$base/v$v/$ManifestFile")))
      .collectFirst { case (v, Some(m)) => (v, m) }
      .foreach { case (v, m) =>
        m.header.foreach { h =>
          require(h == ((numBuckets, key, ord)),
            s"reopen($base) mismatches the persisted sink contract: " +
              s"written as (numBuckets=${h._1}, key=${h._2}, ord=${h._3}), " +
              s"reopened as (numBuckets=$numBuckets, key=$key, ord=$ord) — " +
              "bucket routing would diverge from the carried-forward data")
        }
        sink.restore(v, m.buckets)
      }
    sink
  }

  /** Version ids present under `base` (dirs named `v<digits>`). */
  private[streaming] def listVersions(base: String): Seq[Long] = {
    val d = new java.io.File(base)
    if (!d.isDirectory) Seq.empty
    else d.listFiles().toSeq.filter(_.isDirectory).map(_.getName)
      .collect { case n if n.length > 1 && n.head == 'v'
        && n.tail.forall(_.isDigit) => n.tail.toLong }
  }

  /** Parsed manifest: the optional routing-contract header (absent
    * only in pre-header manifests, which are trusted as before) and
    * the bucket → directory map. */
  private[streaming] final case class Manifest(
      header: Option[(Int, String, String)], buckets: Map[Long, String])

  private def readManifest(p: Path): Option[Manifest] =
    if (!Files.exists(p)) None
    else {
      val lines = Files.readAllLines(p).asScala.filter(_.nonEmpty).toSeq
      val header = lines.headOption.filter(_.startsWith("#")).map { h =>
        val kv = h.drop(1).split('\t')
          .map { f => val eq = f.indexOf('='); f.take(eq) -> f.drop(eq + 1) }
          .toMap
        (kv("numBuckets").toInt, kv("key"), kv("ord"))
      }
      Some(Manifest(header, lines.filterNot(_.startsWith("#"))
        .map { line =>
          val tab = line.indexOf('\t')
          line.take(tab).toLong -> line.drop(tab + 1)
        }.toMap))
    }

  private def deleteRecursively(root: Path): Unit =
    scala.util.Using.resource(Files.walk(root)) {
      _.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    }
}
