package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MergeOpsSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("mergeUpsert: batch wins collisions, survivors pass, inserts append") {
    val cur = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val batch = Seq((2L, "B"), (9L, "Z")).toDF("k", "v")
    val out = MergeOps.mergeUpsert(cur, batch, "k")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a", 2L -> "B", 3L -> "c", 9L -> "Z"))
  }

  test("scd2Merge: change closes+reopens, same-value passes, new key inserts, closed history immutable") {
    val d0 = java.sql.Date.valueOf("2024-01-01")
    val dPre = java.sql.Date.valueOf("2023-01-01")
    val hist = Seq(
      (1L, "x", d0, null.asInstanceOf[java.sql.Date]), // will change
      (2L, "y", d0, null.asInstanceOf[java.sql.Date]), // same value in batch
      (3L, "z", d0, null.asInstanceOf[java.sql.Date]), // not in batch
      (1L, "w", dPre, d0)                              // already-closed version
    ).toDF("k", "v", "valid_from", "valid_to")
    val batch = Seq((1L, "X"), (2L, "y"), (7L, "n")).toDF("k", "v")
    val eff = to_date(lit("2025-06-01"))
    val out = MergeOps.scd2Merge(hist, batch, "k", "v", eff)
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        String.valueOf(r.getDate(2)), String.valueOf(r.getDate(3))))
      .toSet
    assert(out == Set(
      (1L, "w", "2023-01-01", "2024-01-01"), // closed history untouched
      (1L, "x", "2024-01-01", "2025-06-01"), // closed at effective date
      (1L, "X", "2025-06-01", "null"),       // reopened new version
      (2L, "y", "2024-01-01", "null"),       // same value: untouched
      (3L, "z", "2024-01-01", "null"),       // absent from batch: untouched
      (7L, "n", "2025-06-01", "null")))      // brand-new key
  }
}
