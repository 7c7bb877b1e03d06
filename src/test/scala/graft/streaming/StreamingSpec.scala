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

  /** Stages `e` as three single-file batches under `src` (event_id
    * ranges <100 / 100..199 / >=200) — with maxFilesPerTrigger=1 each
    * file becomes one micro-batch. Shared by the kill/resume tests. */
  private def writeThreeBatches(src: String,
      e: org.apache.spark.sql.DataFrame): Unit = {
    e.filter(col("event_id") < 100).coalesce(1).write.parquet(s"$src/b0")
    e.filter(col("event_id") >= 100 && col("event_id") < 200).coalesce(1)
      .write.parquet(s"$src/b1")
    e.filter(col("event_id") >= 200).coalesce(1).write.parquet(s"$src/b2")
  }

  test("query killed mid-stream resumes from its checkpoint: uncommitted batch replays, committed one doesn't") {
    import java.nio.file.Files
    val work = Files.createTempDirectory("graftmidkill")
    val src = work.resolve("src").toString
    val ckpt = work.resolve("ckpt").toString
    val e = Tables.events(spark, dir).limit(300).cache()
    writeThreeBatches(src, e)

    // idempotent driver-side sink keyed by batchId (the foreachBatch
    // contract: replays reuse the SAME id, so last-write-wins dedups)
    val store = scala.collection.concurrent.TrieMap.empty[Long, Array[Long]]
    val attempts = scala.collection.mutable.ArrayBuffer.empty[Long]
    def run(failAtBatch: Option[Long]): Unit = {
      val q = spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$src/*")
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, bid: Long) =>
          attempts.synchronized(attempts += bid)
          // the injected crash happens BEFORE the sink write — batch
          // `bid` dies uncommitted, exactly like an executor/driver
          // loss mid-batch
          if (failAtBatch.contains(bid))
            throw new RuntimeException("injected mid-stream failure")
          store(bid) = df.select(col("event_id")).collect().map(_.getLong(0))
        }
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination()
      catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
      finally q.stop()
    }

    run(failAtBatch = Some(1L)) // commits batch 0, dies inside batch 1
    assert(store.keySet == Set(0L), s"committed batches after crash: ${store.keySet}")
    val attemptsBeforeRestart = attempts.toList
    run(failAtBatch = None) // same checkpoint: resume, don't reprocess
    // the restart replayed ONLY the failed batch and the remainder —
    // batch 0 was never re-delivered
    assert(attempts.toList.drop(attemptsBeforeRestart.size) == List(1L, 2L),
      s"unexpected replay sequence: $attempts")
    assert(store.keySet == Set(0L, 1L, 2L))
    // exactly-once across the kill/resume: every source row delivered
    // once — union of the per-batch sinks is the full input, no dups
    val delivered = store.values.flatten.toSeq
    assert(delivered.length == e.count(), "duplicate or lost rows across restart")
    assert(delivered.sorted == e.select(col("event_id")).collect()
      .map(_.getLong(0)).toSeq.sorted)
  }

  test("stateful aggregation recovers its state store across a mid-stream kill") {
    import java.nio.file.Files
    val work = Files.createTempDirectory("graftstatekill")
    val src = work.resolve("src").toString
    val ckpt = work.resolve("ckpt").toString
    val e = Tables.events(spark, dir).limit(300).cache()
    writeThreeBatches(src, e)
    // update-mode sink: keep the LATEST cumulative count per key; if
    // the state store did not recover batch 0's contribution after the
    // kill, the final counts would cover only batches 1-2
    val lastSeen = scala.collection.concurrent.TrieMap.empty[String, Long]
    def run(failAtBatch: Option[Long]): Unit = {
      val q = spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$src/*")
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, bid: Long) =>
          if (failAtBatch.contains(bid))
            throw new RuntimeException("injected mid-stream failure")
          df.collect().foreach(r => lastSeen(r.getString(0)) = r.getLong(1))
        }
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination()
      catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
      finally q.stop()
    }
    run(failAtBatch = Some(1L)) // state holds batch 0; dies inside batch 1
    run(failAtBatch = None)     // recovery: replay batch 1, process batch 2
    val oracle = e.groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(lastSeen.toMap == oracle,
      s"state not recovered exactly once: got $lastSeen want $oracle")
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

  test("q141 streaming drift monitor equals the batch PSI over the same buckets") {
    val streamed = StreamingOps.q141StreamDriftPsi(spark, dir)
    val batchCounts = Tables.events(spark, dir)
      .withColumn("bucket",
        floor(Tables.cents(col("value")) / lit(2000L)).cast("long"))
      .groupBy(window(col("ts"), "1 day"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("day_bucket"),
        col("bucket"), col("n"))
    val batch = StreamingOps.perDayPsi(batchCounts)
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
    // drift scores are nonnegative by Gibbs' inequality (up to the
    // micro-nat quantization of each term)
    val mn = streamed.agg(min(col("psi_micro"))).head().getLong(0)
    assert(mn >= -50, s"per-day PSI must be ~nonnegative, got $mn")
  }

  test("q109 stream-static join equals its batch equivalent") {
    val streamed = StreamingOps.q109StreamStaticJoin(spark, dir)
    val dim = Tables.customer(spark, dir).select(col("c_custkey"), col("c_mktsegment"))
    val batch = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .join(dim, col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_value"))
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
    // every purchase row joined: users are a subset of the dim keys
    assert(streamed.agg(sum(col("n"))).head.getLong(0) ==
      Tables.events(spark, dir).filter(col("event_type") === "purchase").count())
  }
  test("q132 streaming top-k equals the batch leaderboard") {
    val d = "/root/testdata/sf0.001"
    val stream = StreamingOps.q132StreamTopk(spark, d).collect().toSeq
    val batch = graft.ops.Tables.events(spark, d)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(graft.ops.Tables.cents(col("value"))).as("sum_cents"))
      .orderBy(col("n_events").desc, col("user_id")).limit(10)
      .collect().toSeq
    assert(stream == batch)
  }
}
