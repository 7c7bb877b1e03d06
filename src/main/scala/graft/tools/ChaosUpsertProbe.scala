package graft.tools

import java.nio.file.Files

import graft.ops.{MergeOps, Tables}
import graft.streaming.BucketedUpsertSink
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Chaos probe for the q87 streaming-upsert chain at a derived
 *  octave: injects a crash AFTER a mid-chain micro-batch's merge but
 *  BEFORE its stream commit — the worst-case failure point (the work
 *  is durable, the offset is not, so recovery MUST replay the batch
 *  against a state that already contains it) — then recovers through
 *  [[BucketedUpsertSink.reopen]] (manifest-based, exactly how a
 *  restarted driver would) and asserts the final snapshot is
 *  EXACTLY-ONCE: equal, row for row, to the batch argmax oracle over
 *  the full input. StreamingSpec pins this protocol at fixture
 *  scale; this probe runs it at a real octave so the recovery story
 *  is a measured fact (round-9 verdict item 8). Numbers land in
 *  BASELINE.md. Usage: runMain graft.tools.ChaosUpsertProbe [sfDir] */
object ChaosUpsertProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_r10_10x")
    val spark = graft.GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val t0 = System.nanoTime()

    val ev = Tables.events(spark, d).select(col("user_id"),
      unix_micros(col("ts")).as("last_micros"),
      col("event_id").as("last_event_id"), col("event_type").as("last_type"))
    val stage = Files.createTempDirectory("chaos_upsert_src").toString
    ev.repartition(3).write.mode("overwrite").parquet(stage)
    val snapBase = Files.createTempDirectory("chaos_upsert_snap").toString
    val ckpt = Files.createTempDirectory("chaos_upsert_ckpt").toString

    def run(sink: BucketedUpsertSink, failAt: Option[Long]): Unit = {
      val q = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(stage)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, id: Long) =>
          sink.merge(batch, id)
          // the injected crash: merge durable, commit lost
          if (failAt.contains(id))
            throw new RuntimeException("injected mid-batch crash")
          ()
        }.trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination()
      catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
      finally q.stop()
    }

    val first = new BucketedUpsertSink(spark, snapBase, "user_id",
      "last_micros", numBuckets = 8)
    run(first, failAt = Some(1L)) // commits batch 0; dies inside batch 1
    // the process "dies" here: recovery reopens from the persisted
    // manifest chain, never from the in-memory sink object
    val recovered = BucketedUpsertSink.reopen(spark, snapBase, "user_id",
      "last_micros", numBuckets = 8)
    run(recovered, failAt = None) // replays batch 1, processes batch 2

    val snap = recovered.snapshot()
      .select(col("user_id"), col("last_micros"), col("last_event_id"),
        col("last_type"))
    val oracle = MergeOps.latestPerKey(ev, "user_id", "last_micros")
    val extra = snap.exceptAll(oracle).count()
    val missing = oracle.exceptAll(snap).count()
    val n = snap.count()
    val nUsers = ev.select(col("user_id")).distinct().count()
    println(f"[chaos] corpus=$d events=${ev.count()}%d users=$nUsers%d " +
      f"snapshot_rows=$n%d extra=$extra%d missing=$missing%d " +
      f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    assert(extra == 0 && missing == 0 && n == nUsers,
      "snapshot after crash+recovery is not exactly-once")
    println("[chaos] exactly-once union after mid-batch crash: VERIFIED")
    spark.stop()
  }
}
