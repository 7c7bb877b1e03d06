package graft.streaming

import graft.SparkSuite
import graft.ops.{EventOps, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming surface demos that aren't oracle-gated: session windows
  * with watermarked append output, and stream/batch agreement. */
class StreamingSpec extends AnyFunSuite with SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("batch session_window agrees with the lag-based sessionizer (q15)") {
    // two independent sessionization implementations must agree on
    // the number of sessions per user
    val viaWindow = Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .count()
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_sessions"))
    val viaLag = EventOps.q15Sessionize(spark, dir)
      .groupBy(col("user_id")).agg(max(col("sess_idx")).as("n_sessions"))
    assert(viaWindow.join(viaLag, Seq("user_id"))
      .filter(viaWindow("n_sessions") =!= viaLag("n_sessions")).count() == 0)
    assert(viaWindow.count() > 0)
  }

  test("streaming session windows with watermark produce closed sessions (append mode)") {
    val stream = Tables.eventsStream(spark, dir)
    val q = stream
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_sessions").trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    val out = spark.table("graft_sessions")
    // append mode emits only watermark-closed sessions; all but the
    // tail of the month of data is closed after the single batch
    assert(out.count() > 0)
    assert(out.columns.toSet == Set("session_window", "user_id", "n"))
    spark.catalog.dropTempView("graft_sessions")
  }

  test("checkpointed stream resumes without reprocessing (exactly-once file source)") {
    import java.nio.file.{Files, Paths}
    val work = Files.createTempDirectory("graftckpt")
    val srcDir = work.resolve("src").toString
    val ckpt = work.resolve("ckpt").toString
    Files.createDirectories(Paths.get(srcDir))
    val e = Tables.events(spark, dir).limit(400).cache()
    e.filter(col("event_id") < 200).write.mode("overwrite").parquet(s"$srcDir/batch1")

    def runOnce(): Long = {
      val stream = spark.readStream
        .schema(e.schema).option("maxFilesPerTrigger", "100")
        .parquet(s"$srcDir/*")
      val q = stream.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .writeStream.outputMode("complete").format("memory")
        .queryName("graft_ckpt").option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
      spark.table("graft_ckpt").agg(sum(col("n"))).head.getLong(0)
    }

    assert(runOnce() == e.filter(col("event_id") < 200).count())
    // second batch of files arrives; the restarted query (same
    // checkpoint) picks up ONLY the new files and the complete-mode
    // state covers everything exactly once
    e.filter(col("event_id") >= 200).write.mode("overwrite").parquet(s"$srcDir/batch2")
    assert(runOnce() == e.count())
  }

  test("q34 streaming result equals its batch equivalent") {
    val streamed = StreamingOps.q34StreamTumbling(spark, dir)
    val batch = Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("day_bucket"),
        col("event_type"), col("n"), col("sum_value"))
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }
}
