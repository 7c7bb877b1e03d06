package graft.core

import java.nio.file.Files

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Spark 4.1.2 TimeType capability matrix that justifies
  * ColumnDef's string carrier for inferred `time` columns
  * (ColumnDef.scala `toStructField`): TIME(6) works as a cast /
  * in-plan type, but the CSV datasource rejects it on write — so a
  * CSV-ingest pipeline (this engine's S1 surface) cannot round-trip
  * TimeType and the VARCHAR carrier is the only representation that
  * survives import → export. If a future Spark release lifts the
  * datasource restriction, the write-rejection case here fails and
  * the carrier decision should be revisited. */
class TimeTypeProbeSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  /** Run `body` with the TIME feature flag on (its default-off state
    * is itself part of the capability matrix — see the gate test). */
  private def withTimeEnabled[A](body: => A): A = {
    spark.conf.set("spark.sql.timeType.enabled", "true")
    try body finally spark.conf.set("spark.sql.timeType.enabled", "false")
  }

  test("TIME is feature-flagged OFF by default (UNSUPPORTED_TIME_TYPE)") {
    val ex = intercept[Exception] {
      Seq("13:45:30").toDF("t").select(col("t").cast("time")).schema
    }
    assert(ex.getMessage.contains("UNSUPPORTED_TIME_TYPE"), ex.getMessage.take(200))
  }

  test("cast to TIME works in-plan under the flag (the type exists and evaluates)") {
    withTimeEnabled {
      val r = Seq("13:45:30").toDF("t")
        .select(col("t").cast("time").as("tt"))
      assert(r.schema.head.dataType.typeName.startsWith("time"), r.schema.head.dataType)
      assert(r.select(col("tt").cast("string")).head.getString(0) == "13:45:30")
    }
  }

  test("CSV datasource rejects TIME on write even under the flag — the string-carrier rationale") {
    withTimeEnabled {
      val dir = Files.createTempDirectory("timeprobe").toString
      val df = Seq("13:45:30").toDF("t").select(col("t").cast("time").as("tt"))
      val ex = intercept[Exception] {
        df.write.mode("overwrite").csv(s"$dir/out")
      }
      val msg = ex.getMessage
      assert(msg.contains("UNSUPPORTED_DATA_TYPE_FOR_DATASOURCE") ||
        msg.toLowerCase.contains("time"), msg.take(300))
    }
  }

  test("parquet DOES round-trip TIME under the flag — the restriction is CSV-specific") {
    withTimeEnabled {
      val dir = Files.createTempDirectory("timeprobe_pq").toString
      val df = Seq("13:45:30", "00:00:01").toDF("t")
        .select(col("t").cast("time").as("tt"))
      df.write.mode("overwrite").parquet(s"$dir/out")
      val back = spark.read.parquet(s"$dir/out")
      assert(back.schema.head.dataType.typeName.startsWith("time"))
      assert(back.select(col("tt").cast("string")).collect().map(_.getString(0)).sorted
        .sameElements(Array("00:00:01", "13:45:30")))
    }
  }
}
