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
