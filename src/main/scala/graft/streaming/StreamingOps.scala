package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/**
 * Structured Streaming surface: the same event analytics as the batch
 * operators, driven through `readStream` → windowed aggregation →
 * `writeStream`, proving the engine's stream/batch parity.
 *
 * q34 runs a real streaming query over the events parquet (file
 * source, one-shot drain via processAllAvailable) with a tumbling
 * 1-day window; complete output mode into a memory sink so the final
 * answer equals the batch/oracle result regardless of the
 * micro-batch cut points. Watermarking + append-mode variants are
 * exercised in the test suite (SessionWindowSpec) — their outputs
 * depend on watermark progress, so they are demo, not oracle-gated.
 *
 * Scale notes: the file source is replaced by Kafka/queue sources in
 * production; the aggregation state is keyed by (window, type) —
 * bounded and shuffle-partitioned, no driver state.
 */
object StreamingOps {

  private val runSeq = new AtomicInteger(0)

  def q34StreamTumbling(s: SparkSession, d: String): DataFrame = {
    // a batch read resolves the physical schema (incl. the
    // nanos-as-long escape hatch — see Tables.events); the stream
    // uses the RAW schema and applies the same ts conversion
    val path = s"$d/events.parquet"
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(path)
    val name = s"graft_q34_${runSeq.incrementAndGet()}"
    // FileStreamSource wants a directory or glob, not a bare file —
    // the trailing '*' makes the exact-file path a glob
    val stream0 = s.readStream.schema(raw.schema).parquet(path + "*")
    val stream = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        stream0.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => stream0
    }
    val agg = stream
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("day_bucket"),
        col("event_type"), col("n"), col("sum_value"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    s.table(name).orderBy(col("day_bucket"), col("event_type"))
  }

  final case class UserAgg(user_id: Long, n: Long, sum_cents: Long)

  /** Custom stateful streaming: per-user running aggregates via
   *  flatMapGroupsWithState — explicit GroupState instead of a
   *  built-in aggregation (the pattern for custom session/state
   *  machines). Drained with AvailableNow, so the emitted state
   *  equals the batch aggregate and is oracle-checkable. */
  def q43StreamStateful(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val path = s"$d/events.parquet"
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(path)
    val name = s"graft_q43_${runSeq.incrementAndGet()}"
    val stream = s.readStream.schema(raw.schema).parquet(path + "*")
      .select(col("user_id"), round(col("value") * 100).cast("long").as("cents"))
      .as[(Long, Long)]
    def update(user: Long, rows: Iterator[(Long, Long)],
        state: GroupState[UserAgg]): Iterator[UserAgg] = {
      val prev = state.getOption.getOrElse(UserAgg(user, 0L, 0L))
      var n = prev.n; var c = prev.sum_cents
      rows.foreach { r => n += 1; c += r._2 }
      val next = UserAgg(user, n, c)
      state.update(next)
      Iterator.single(next)
    }
    val q = stream.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
      .toDF()
      .writeStream.outputMode("append").format("memory")
      .queryName(name).trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    s.table(name)
      .select(col("user_id"), col("n"), (col("sum_cents") / 100.0).as("sum_value"))
      .orderBy(col("user_id"))
  }

  val q43Sql: String =
    """SELECT user_id, count(*) AS n,
      | CAST(sum(CAST(round("value"*100) AS BIGINT)) AS BIGINT)/100.0 AS sum_value
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Stream-stream interval join: the error stream joined to the
   *  purchase stream on user + a 1-hour event-time range, both sides
   *  watermarked (bounding the join state buffers). With an
   *  AvailableNow drain the inner join emits every match, so the
   *  result equals the batch interval join (q18's inner form). */
  def q58StreamStreamJoin(s: SparkSession, d: String): DataFrame = {
    val path = s"$d/events.parquet"
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(path)
    def src() = {
      val st = s.readStream.schema(raw.schema).parquet(path + "*")
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        st.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else st
    }
    // scope to a user subset: per-row state-store traffic dominates
    // the demo's cost and scales linearly with the input slice
    val errs = src().filter(col("event_type") === "error" && col("user_id") < 30)
      .select(col("event_id").as("err_id"), col("user_id").as("err_user"),
        col("ts").as("err_ts"))
      .withWatermark("err_ts", "2 hours")
    val purchases = src().filter(col("event_type") === "purchase" && col("user_id") < 30)
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    val joined = errs.join(purchases,
      col("err_user") === col("p_user") &&
        col("p_ts") >= col("err_ts") &&
        col("p_ts") < col("err_ts") + expr("INTERVAL 1 HOUR"))
    val name = s"graft_q58_${runSeq.incrementAndGet()}"
    // stream-state checkpoint I/O scales with shuffle partitions
    // (4 store instances per side per partition per batch): a narrow
    // stateful query wants FEW partitions
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val q = joined.writeStream.outputMode("append").format("memory")
        .queryName(name).trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    } finally s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    s.table(name)
      .groupBy(col("err_id"))
      .agg(count(lit(1)).as("n_purchases_1h"))
      .orderBy(col("err_id"))
  }

  val q58Sql: String =
    """SELECT e.event_id AS err_id, count(*) AS n_purchases_1h
      |FROM events e JOIN events p
      |  ON p.user_id = e.user_id AND p.event_type = 'purchase'
      | AND p.ts >= e.ts AND p.ts < e.ts + INTERVAL 1 HOUR
      |WHERE e.event_type = 'error' AND e.user_id < 30 AND p.user_id < 30
      |GROUP BY e.event_id ORDER BY err_id""".stripMargin

  val q34Sql: String =
    """SELECT CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS day_bucket,
      | event_type, count(*) AS n,
      | CAST(sum(CAST(round("value"*100) AS BIGINT)) AS BIGINT)/100.0 AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY day_bucket, event_type""".stripMargin
}
