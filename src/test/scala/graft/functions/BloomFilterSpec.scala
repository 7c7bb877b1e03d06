package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BloomFilterSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def buildFilter(keys: Seq[Long], numBits: Int = 1 << 14,
      numHashes: Int = 5, parts: Int = 1): Array[Byte] = {
    BloomFilter.register(spark)
    keys.toDF("k").repartition(parts)
      .agg(BloomFilter.bloom_agg($"k", numBits, numHashes))
      .head.getAs[Array[Byte]](0)
  }

  test("no false negatives; false-positive rate within sizing bound") {
    val keys = (0L until 1000L).map(_ * 7919L)
    val bytes = buildFilter(keys)
    val (k, words) = BloomFilter.deserialize(bytes)
    assert(k == 5 && words.length == (1 << 14) / 64)
    keys.foreach(key => assert(BloomFilter.contains(words, k, key)))
    // 1000 keys in 16384 bits ≈ 16 bits/key → theoretical fpr ≈ 0.1%;
    // assert an order of magnitude of slack
    val probes = (1L to 20000L).map(_ * 104729L + 3L).filterNot(keys.contains)
    val fp = probes.count(BloomFilter.contains(words, k, _))
    assert(fp.toDouble / probes.size < 0.01, s"fp rate too high: $fp/${probes.size}")
  }

  test("distributed build: word-wise OR merge equals single-partition build") {
    val keys = (0L until 500L).map(BloomFilter.mix64)
    assert(buildFilter(keys, parts = 1).toSeq == buildFilter(keys, parts = 13).toSeq)
  }

  test("agg skips nulls; int keys accepted") {
    BloomFilter.register(spark)
    val bytes = Seq[(java.lang.Long, java.lang.Integer)]((1L, 1), (null, null), (2L, 2))
      .toDF("l", "i")
      .agg(BloomFilter.bloom_agg($"l", 1 << 10, 3).as("bl"),
        BloomFilter.bloom_agg($"i", 1 << 10, 3).as("bi"))
      .head
    val (k, wl) = BloomFilter.deserialize(bytes.getAs[Array[Byte]](0))
    val (_, wi) = BloomFilter.deserialize(bytes.getAs[Array[Byte]](1))
    assert(wl.toSeq == wi.toSeq) // same keys → same filter regardless of width
    assert(BloomFilter.contains(wl, k, 1L) && BloomFilter.contains(wl, k, 2L))
  }

  test("might_contain: codegen agrees with interpreted eval, null key -> null") {
    BloomFilter.register(spark)
    val bytes = buildFilter((0L until 100L).toSeq, numBits = 1 << 12)
    val df = (0L until 200L).map(java.lang.Long.valueOf).:+(null.asInstanceOf[java.lang.Long])
      .toDF("k")
    val gen = df.select($"k", BloomFilter.bloom_contains(lit(bytes), $"k").as("hit"))
      .collect()
    val (k, words) = BloomFilter.deserialize(bytes)
    gen.foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(1))
      else {
        assert(!r.isNullAt(1))
        assert(r.getBoolean(1) == BloomFilter.contains(words, k, r.getLong(0)))
        if (r.getLong(0) < 100L) assert(r.getBoolean(1)) // no false negatives
      }
    }
  }

  test("sizeBits scales with expected keys, clamps, and stays word-aligned") {
    import graft.ops.BloomJoin.sizeBits
    assert(sizeBits(0) == 1 << 10)                 // floor clamp
    assert(sizeBits(1000) == ((10000 + 63) & ~63)) // ~10 bits/key, 64-aligned
    assert(sizeBits(1L << 40) == 1 << 28)          // ceiling clamp (32 MB)
    Seq(1L, 77L, 12345L, 1000000L).foreach(n => assert(sizeBits(n) % 64 == 0))
  }

  test("bloomFilteredJoin resolves when both sides name the key identically") {
    val fact = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "fv")
    val dim = Seq((2L, "X"), (3L, "Y")).toDF("k", "dv")
    val out = graft.ops.BloomJoin
      .bloomFilteredJoin(spark, fact, dim, "k", "k")
      .select(fact("k"), $"fv", $"dv")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(out == Set((2L, "b", "X"), (3L, "c", "Y")))
  }

  test("non-foldable bloom argument is rejected at analysis") {
    BloomFilter.register(spark)
    val df = Seq((Array[Byte](0, 0, 0, 3, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0), 1L))
      .toDF("b", "k")
    val e = intercept[Exception] {
      df.select(BloomFilter.bloom_contains($"b", $"k")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("foldable"))
  }
}
