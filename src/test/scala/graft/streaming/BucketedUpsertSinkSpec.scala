package graft.streaming

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketedUpsertSinkSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  /** (path, size, bytes-hash) of every parquet file under a dir — the
    * identity evidence for carry-forward-by-reference. */
  private def fileStates(dir: String): Map[String, (Long, Int)] = {
    val root = Paths.get(dir)
    if (!Files.exists(root)) Map.empty
    else Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .map(p => p.toString ->
        (Files.size(p), java.util.Arrays.hashCode(Files.readAllBytes(p))))
      .toMap
  }

  test("merge rewrites only touched buckets; untouched bucket files stay byte-identical") {
    val base = Files.createTempDirectory("bsink").toString
    val n = 8
    val sink = new BucketedUpsertSink(spark, base, "k", "seq", numBuckets = n)

    // batch 0: keys spread over every bucket (64 keys ≫ 8 buckets)
    val b0 = (1L to 64L).map(k => (k, 1L, s"v$k")).toDF("k", "seq", "v")
    sink.merge(b0, 0)
    val dirsV0 = sink.bucketDirs
    assert(dirsV0.size == n, s"expected all $n buckets touched, got ${dirsV0.size}")
    assert(dirsV0.values.forall(_.contains("/v0/")))
    val before = dirsV0.map { case (b, dir) => b -> fileStates(dir) }

    // batch 1: ONE key — touches exactly one bucket
    val oneKey = 17L
    val b1 = Seq((oneKey, 2L, "updated")).toDF("k", "seq", "v")
    sink.merge(b1, 1)
    val touched = spark.range(1).select(
      pmod(xxhash64(lit(oneKey)), lit(n.toLong))).head.getLong(0)

    val dirsV1 = sink.bucketDirs
    // the touched bucket moved to v1; the other n-1 still point at v0
    assert(dirsV1(touched).contains("/v1/"))
    assert(dirsV1.count { case (_, d) => d.contains("/v0/") } == n - 1)
    // and the v0 files of every untouched bucket are BYTE-IDENTICAL —
    // never re-read, never rewritten, carried forward by reference
    dirsV1.filter(_._1 != touched).foreach { case (b, dir) =>
      assert(dir == dirsV0(b), s"untouched bucket $b changed directory")
      assert(fileStates(dir) == before(b), s"untouched bucket $b files changed")
    }

    // correctness across the chain: latest-wins per key
    val snap = sink.snapshot().collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(snap.size == 64)
    assert(snap(oneKey) == (2L, "updated"))
    assert(snap(18L) == (1L, "v18"))
  }

  test("reopen restores a byte-identical snapshot from the persisted manifest") {
    val base = Files.createTempDirectory("bsink_reopen").toString
    val n = 4
    val sink = new BucketedUpsertSink(spark, base, "k", "seq", numBuckets = n)
    sink.merge((1L to 32L).map(k => (k, 1L, s"v$k")).toDF("k", "seq", "v"), 0)
    sink.merge(Seq((5L, 2L, "upd5"), (33L, 1L, "new33")).toDF("k", "seq", "v"), 1)
    val dirs = sink.bucketDirs
    val files = dirs.map { case (b, d) => b -> fileStates(d) }
    val rows = sink.snapshot().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    // the sink object "dies" (goes out of scope); recovery reopens
    // from the latest on-disk manifest alone
    val re = BucketedUpsertSink.reopen(spark, base, "k", "seq", numBuckets = n)
    assert(re.bucketDirs == dirs, "recovered manifest differs")
    re.bucketDirs.foreach { case (b, d) =>
      assert(fileStates(d) == files(b), s"bucket $b files changed across reopen")
    }
    val reRows = re.snapshot().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(reRows.sameElements(rows))
    // and the chain continues from the recovered state
    re.merge(Seq((5L, 3L, "upd5b")).toDF("k", "seq", "v"), 2)
    val snap = re.snapshot().collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(snap(5L) == "upd5b" && snap(33L) == "new33" && snap.size == 33)
  }

  test("reopen fails fast when (numBuckets, key, ord) mismatch the persisted contract") {
    val base = Files.createTempDirectory("bsink_contract").toString
    val sink = new BucketedUpsertSink(spark, base, "k", "seq", numBuckets = 4)
    sink.merge((1L to 16L).map(k => (k, 1L, s"v$k")).toDF("k", "seq", "v"), 0)
    // a different bucket count would route future merges by a
    // different pmod than the carried-forward dirs were written under
    val eB = intercept[IllegalArgumentException] {
      BucketedUpsertSink.reopen(spark, base, "k", "seq", numBuckets = 8)
    }
    assert(eB.getMessage.contains("numBuckets=4") && eB.getMessage.contains("numBuckets=8"))
    intercept[IllegalArgumentException] {
      BucketedUpsertSink.reopen(spark, base, "v", "seq", numBuckets = 4)
    }
    intercept[IllegalArgumentException] {
      BucketedUpsertSink.reopen(spark, base, "k", "v", numBuckets = 4)
    }
    // the matching contract still reopens cleanly after the refusals
    val re = BucketedUpsertSink.reopen(spark, base, "k", "seq", numBuckets = 4)
    assert(re.snapshot().count() == 16)
  }

  test("reopen on a crash orphan (version dir without manifest) falls back to the prior version") {
    val base = Files.createTempDirectory("bsink_orphan").toString
    val sink = new BucketedUpsertSink(spark, base, "k", "seq", numBuckets = 2)
    sink.merge(Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("k", "seq", "v"), 0)
    val goodDirs = sink.bucketDirs
    // simulate a crash between the v1 parquet write and the manifest
    // rename: a v1 dir with data but no _manifest.tsv
    val orphan = Paths.get(s"$base/v1/__bucket=0")
    Files.createDirectories(orphan)
    Files.write(orphan.resolve("part-orphan.parquet"), Array[Byte](1, 2, 3))
    val re = BucketedUpsertSink.reopen(spark, base, "k", "seq", numBuckets = 2)
    assert(re.bucketDirs == goodDirs, "recovery must skip the manifest-less orphan")
    assert(re.snapshot().count() == 2)
  }

  test("vacuum removes superseded bucket dirs past retention, never live or retained ones") {
    val base = Files.createTempDirectory("bsink_vac").toString
    val n = 8
    val sink = new BucketedUpsertSink(spark, base, "k", "seq", numBuckets = n)
    // v0 fills all buckets; v1 and v2 each rewrite one key's bucket
    sink.merge((1L to 64L).map(k => (k, 1L, s"v$k")).toDF("k", "seq", "v"), 0)
    sink.merge(Seq((17L, 2L, "u17")).toDF("k", "seq", "v"), 1)
    sink.merge(Seq((17L, 3L, "u17b")).toDF("k", "seq", "v"), 2)
    val live = sink.bucketDirs
    val liveFiles = live.map { case (b, d) => b -> fileStates(d) }
    val b17 = spark.range(1).select(
      pmod(xxhash64(lit(17L)), lit(n.toLong))).head.getLong(0)
    // retain last 2 versions (v1, v2): v0's copy of bucket b17 is
    // superseded and past horizon → deletable; v1's copy is superseded
    // but RETAINED; every other v0 bucket is still live (carried
    // forward by reference) and must survive at any age
    val deleted = sink.vacuum(retainVersions = 2)
    assert(deleted.contains(s"$base/v0/__bucket=$b17"), s"expected v0 bucket $b17 deleted: $deleted")
    assert(Files.exists(Paths.get(s"$base/v1/__bucket=$b17")), "retained version dir deleted")
    live.foreach { case (b, d) =>
      assert(Files.exists(Paths.get(d)), s"live bucket $b dir deleted")
      assert(fileStates(d) == liveFiles(b), s"live bucket $b files changed")
    }
    // snapshot unchanged after vacuum
    val snap = sink.snapshot().collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(snap.size == 64 && snap(17L) == "u17b")
    // a second vacuum with retention 1 clears v1's superseded copy and
    // the now-empty v1 dir stays (v1 still holds nothing else? no —
    // v1's only bucket was b17, so the whole v1 dir goes)
    val deleted2 = sink.vacuum(retainVersions = 1)
    assert(deleted2.contains(s"$base/v1/__bucket=$b17"))
    assert(!Files.exists(Paths.get(s"$base/v1")), "fully superseded version dir should be removed")
    assert(sink.snapshot().count() == 64)
  }

  test("multi-version chain with duplicate keys inside a batch stays latest-wins") {
    val base = Files.createTempDirectory("bsink2").toString
    val sink = new BucketedUpsertSink(spark, base, "k", "seq", numBuckets = 4)
    sink.merge(Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("k", "seq", "v"), 0)
    // batch carries two versions of key 1 — latestPerKey collapses them
    sink.merge(Seq((1L, 3L, "c"), (1L, 2L, "x"), (3L, 1L, "d"))
      .toDF("k", "seq", "v"), 1)
    val snap = sink.snapshot().collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(snap == Map(1L -> (3L, "c"), 2L -> (1L, "b"), 3L -> (1L, "d")))
  }
}
