package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("salted join equals plain join on a synthetically skewed key") {
    // 50k rows, 90% on one hot key
    val big = spark.range(50000)
      .withColumn("k", when(col("id") % 10 < 9, 1L).otherwise(col("id") % 100))
      .withColumn("v", col("id") * 2)
    val small = (0L until 100L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = big.join(small, "k")
    val salted = SkewJoin.saltedJoin(big, small, "k", saltSource = col("id"), buckets = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain.select(salted.columns.map(col).toIndexedSeq: _*)).count() == 0)
    // the salt really spreads the hot key across buckets
    val spread = big.withColumn("salt", pmod(xxhash64(col("id")), lit(8)))
      .filter(col("k") === 1).groupBy("salt").count().collect()
    assert(spread.length == 8)
  }
}
