package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Tables.normalizeTs]] over every `ts` physical type the
  * driver-provisioned events.parquet has actually shipped with across
  * rounds: TIMESTAMP(NANOS) read as int64 (nanosAsLong),
  * TIMESTAMP(MICROS, isAdjustedToUTC=false) read as TimestampNTZType
  * (the round-5 re-provision that silently crashed 15 queries), and
  * plain TimestampType. All three must yield the SAME instant under
  * the UTC session. */
class TablesSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  // 2021-03-04T05:06:07.123456Z as epoch micros
  private val micros = 1614833167123456L

  test("normalizeTs passes native TimestampType through unchanged") {
    val df = Seq(micros).toDF("us")
      .select(timestamp_micros($"us").as("ts"))
    val out = Tables.normalizeTs(df)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros($"ts")).as[Long].head() == micros)
  }

  test("normalizeTs converts int64 nanos (nanosAsLong) to the same instant") {
    val df = Seq(micros * 1000L).toDF("ts")
    val out = Tables.normalizeTs(df)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros($"ts")).as[Long].head() == micros)
  }

  test("normalizeTs converts TimestampNTZType to the same UTC instant") {
    val df = Seq(micros).toDF("us")
      .select(timestamp_micros($"us").cast(TimestampNTZType).as("ts"))
    assert(df.schema("ts").dataType == TimestampNTZType)
    val out = Tables.normalizeTs(df)
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.select(unix_micros($"ts")).as[Long].head() == micros)
  }

  test("normalizeTs fails fast on an unhandled ts type") {
    val df = Seq("2021-03-04").toDF("ts")
    val e = intercept[IllegalStateException](Tables.normalizeTs(df))
    assert(e.getMessage.contains("unexpected ts type"))
  }
}
