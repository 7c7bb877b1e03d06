package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-stream operators over the `events` table: semi-structured
 * JSON extraction, tumbling-window aggregation, as-of (most recent
 * prior event) join, and gap-based sessionization.
 *
 * All timestamps are emitted as epoch seconds (BIGINT) rather than
 * raw timestamps so oracle comparison is precision/timezone-proof
 * (the source column is nanosecond parquet; Spark truncates to
 * micros — see Tables.events).
 *
 * Scale notes: sessionization and as-of are window functions over
 * (user_id) partitions — one shuffle on the session key, no
 * driver-side state; this is the same shape Structured Streaming
 * uses for `session_window`, so the batch and stream paths agree.
 */
object EventOps {
  import Tables._

  /** JSON extraction (`from_json`) + aggregation per event type. */
  def q12JsonExtract(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("k",
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")).getField("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  val q12Sql: String =
    """SELECT event_type, count(*) AS n,
      | CAST(sum(TRY_CAST(nullif(regexp_extract(props, '"k":\s*(-?\d+)', 1), '') AS BIGINT)) AS BIGINT) AS sum_k,
      | max(TRY_CAST(nullif(regexp_extract(props, '"k":\s*(-?\d+)', 1), '') AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Map-typed functions (§2.6 array/map/json row): per-user map of
   *  event_type → count built with map_from_entries, then consumed
   *  through element_at lookups, map_values aggregation, and a
   *  map_filter lambda — outputs are scalars so the DuckDB oracle
   *  (which has no Spark-map parquet bridge) compares the SEMANTICS
   *  via plain conditional aggregation. */
  def q66MapFns(s: SparkSession, d: String): DataFrame =
    events(s, d)
      // a NULL event_type would crash map_from_entries (MAP_KEY_NULL)
      // while the oracle's conditional aggregation tolerates it —
      // fail closed by excluding NULL keys on BOTH sides
      .filter(col("event_type").isNotNull)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(sort_array(collect_list(struct(col("event_type"), col("n")))))
        .as("m"))
      .select(col("user_id"),
        size(col("m")).cast("long").as("n_types"),
        coalesce(element_at(col("m"), "purchase"), lit(0L)).as("n_purchase"),
        coalesce(element_at(col("m"), "error"), lit(0L)).as("n_error"),
        aggregate(map_values(col("m")), lit(0L), (a, x) => a + x).as("n_total"),
        size(map_filter(col("m"), (_, v) => v > 5)).cast("long").as("n_frequent"))
      .orderBy(col("user_id"))

  val q66Sql: String =
    """SELECT user_id, count(*) AS n_types,
      | CAST(coalesce(sum(CASE WHEN event_type = 'purchase' THEN n END), 0) AS BIGINT) AS n_purchase,
      | CAST(coalesce(sum(CASE WHEN event_type = 'error' THEN n END), 0) AS BIGINT) AS n_error,
      | CAST(sum(n) AS BIGINT) AS n_total,
      | CAST(count(CASE WHEN n > 5 THEN 1 END) AS BIGINT) AS n_frequent
      |FROM (SELECT user_id, event_type, count(*) AS n
      |      FROM events WHERE event_type IS NOT NULL GROUP BY 1, 2) t
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Tumbling 1-hour windows via `window()` — counts, revenue cents,
   *  distinct users per (window × type). */
  def q13HourlyTumbling(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(cents(col("value"))) / 100.0).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .select(unix_timestamp(col("window.start")).as("bucket"),
        col("event_type"), col("n"), col("sum_value"), col("n_users"))
      .orderBy(col("bucket"), col("event_type"))

  val q13Sql: String =
    """SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS bucket,
      | event_type, count(*) AS n,
      | CAST(sum(CAST(round("value"*100) AS BIGINT)) AS BIGINT)/100.0 AS sum_value,
      | count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1, 2 ORDER BY bucket, event_type""".stripMargin

  /** As-of join: for each purchase, the most recent prior (or equal)
   *  signup timestamp of the same user — expressed as an
   *  ignore-nulls last_value window, which needs only ONE shuffle on
   *  user_id (vs. a range join). */
  def q14AsofLastSignup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .withColumn("last_signup",
        last(when(col("event_type") === "signup", col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("ts_sec"),
        unix_timestamp(col("last_signup")).as("signup_sec"))
      .orderBy(col("event_id"))
  }

  val q14Sql: String =
    """SELECT event_id, user_id,
      | CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
      | CAST(floor(epoch(last_signup)) AS BIGINT) AS signup_sec
      |FROM (
      | SELECT event_id, user_id, ts, event_type,
      |  last_value(CASE WHEN event_type = 'signup' THEN ts END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup
      | FROM events) t
      |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin

  /** Appends the gap-based session index `sess_idx` (30-minute
   *  inactivity gap) to an events frame: classic lag → gap flag →
   *  running-sum. Single shuffle on user_id. Boundary is
   *  `gap >= 1800`, the strict-merge rule session_window uses — so
   *  q15, q130 and the streaming q62 sessionize identically at the
   *  exact boundary. Shared by every session-shaped operator (the
   *  SQL-side twin is the shared sessionized CTE fragment). */
  private[graft] def sessionized(ev: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) >= 1800, 1)
          .otherwise(0))
      .withColumn("sess_idx", sum(col("new_sess")).over(run))
  }

  /** q15: gap-based sessionization + per-session rollup over
   *  [[sessionized]]'s one user_id shuffle. */
  def q15Sessionize(s: SparkSession, d: String): DataFrame =
    sessionized(events(s, d))
      .groupBy(col("user_id"), col("sess_idx"))
      .agg(unix_timestamp(min(col("ts"))).as("sess_start"),
        count(lit(1)).as("n_events"),
        (sum(cents(col("value"))) / 100.0).as("sum_value"))
      .orderBy(col("user_id"), col("sess_idx"))

  val q15Sql: String =
    """SELECT user_id, sess_idx,
      | CAST(floor(epoch(min(ts))) AS BIGINT) AS sess_start,
      | count(*) AS n_events,
      | CAST(sum(CAST(round("value"*100) AS BIGINT)) AS BIGINT)/100.0 AS sum_value
      |FROM (
      | SELECT user_id, ts, "value",
      |  CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_idx
      | FROM (
      |  SELECT user_id, event_id, ts, "value",
      |   CASE WHEN prev_ts IS NULL
      |        OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(prev_ts)) AS BIGINT) >= 1800
      |        THEN 1 ELSE 0 END AS new_sess
      |  FROM (
      |   SELECT user_id, event_id, ts, "value",
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |   FROM events) a) b) c
      |GROUP BY user_id, sess_idx ORDER BY user_id, sess_idx""".stripMargin

  /** q102: windowed conversion funnel (view → click → purchase, each
   *  step within 24 h of the previous step's first qualifying event)
   *  — the product-analytics shape, and the eval-pipeline shape for
   *  "did stage N+1 happen after stage N" audits. Each step is one
   *  hash aggregate on user_id joined to the previous step's
   *  per-user anchor time: THREE aggs + two joins, all on the same
   *  shuffle key, so the whole funnel rides one partitioning; after
   *  step 1 every frame is cohort-sized (≪ events), and AQE
   *  broadcasts the anchor side when the cohort is small. No window
   *  functions, no per-user sort. */
  def q102Funnel(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("user_id"), col("event_type"), col("ts"))
    def step(prev: DataFrame, prevT: String, etype: String, outT: String): DataFrame =
      ev.filter(col("event_type") === etype)
        .join(prev.select(col("user_id"), col(prevT)), "user_id")
        .filter(col("ts") >= col(prevT) &&
          col("ts") < col(prevT) + expr("INTERVAL 24 HOURS"))
        .groupBy(col("user_id")).agg(min(col("ts")).as(outT))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val c = step(v, "t1", "click", "t2")
    val p = step(c, "t2", "purchase", "t3")
    def cnt(df: DataFrame, stepNo: Long, etype: String): DataFrame =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(stepNo).as("step"), lit(etype).as("event_type"), col("n_users"))
    cnt(v, 1L, "view").unionByName(cnt(c, 2L, "click"))
      .unionByName(cnt(p, 3L, "purchase"))
      .orderBy(col("step"))
  }

  val q102Sql: String =
    """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
      |           WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, min(e.ts) AS t2
      |      FROM events e JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type = 'click' AND e.ts >= v.t1
      |        AND e.ts < v.t1 + INTERVAL 24 HOUR GROUP BY e.user_id),
      |p AS (SELECT e.user_id, min(e.ts) AS t3
      |      FROM events e JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase' AND e.ts >= c.t2
      |        AND e.ts < c.t2 + INTERVAL 24 HOUR GROUP BY e.user_id)
      |SELECT CAST(step AS BIGINT) AS step, event_type, n_users FROM (
      |  SELECT 1 AS step, 'view' AS event_type, count(*) AS n_users FROM v
      |  UNION ALL SELECT 2, 'click', count(*) FROM c
      |  UNION ALL SELECT 3, 'purchase', count(*) FROM p) t
      |ORDER BY step""".stripMargin

  /** q103: weekly retention cohorts — users grouped by signup week,
   *  counted as retained in every later week they produced any
   *  event. The classic cohort matrix (cohort_week × week_offset →
   *  n_users). One agg builds the per-user cohort anchor, one join
   *  on user_id attaches it to the event stream, one distinct-count
   *  per (cohort, offset) — the cohort side is user-count-sized, so
   *  AQE broadcasts it against the 100 TB event scan and the only
   *  corpus shuffle is the final (small-keyspace) aggregate. */
  def q103Retention(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val su = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(date_trunc("week", min(col("ts"))).as("cohort"))
    ev.select(col("user_id"), col("ts"))
      .join(su, "user_id")
      .filter(col("ts") >= col("cohort"))
      .withColumn("week_offset",
        floor(datediff(date_trunc("week", col("ts")), col("cohort")) / 7).cast("long"))
      .groupBy(col("cohort").cast("date").as("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  val q103Sql: String =
    """WITH su AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort
      |            FROM events WHERE event_type = 'signup' GROUP BY user_id)
      |SELECT CAST(su.cohort AS DATE) AS cohort_week,
      | CAST(floor(date_diff('day', su.cohort, date_trunc('week', e.ts)) / 7) AS BIGINT)
      |   AS week_offset,
      | count(DISTINCT e.user_id) AS n_users
      |FROM events e JOIN su ON e.user_id = su.user_id
      |WHERE e.ts >= su.cohort
      |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin

  /** q104: first-order Markov transition matrix over per-user event
   *  sequences — (prev_type → next_type) counts and row-normalized
   *  transition probabilities. The behavioral-model shape (next-action
   *  prediction, anomaly scoring of improbable paths).
   *
   *  Scale: the lag() is one window over the user_id partitioning —
   *  the SAME single shuffle sessionization (q15) and as-of (q14)
   *  ride; the transition aggregate then collapses to |types|² rows,
   *  and the row-normalizing window runs on that tiny frame. `frac`
   *  ships as a RAW division of exact counts (bit-identical doubles
   *  across engines). NULL event types are excluded on both sides
   *  (the q66 MAP_KEY_NULL rule: a null state is a data bug, not a
   *  transition). */
  /** (user_id, prev_type, next_type) consecutive-event steps — THE
    * shared transition source for q104/q111/q125, so the NULL-state
    * rule and the (ts, event_id) ordering have exactly one
    * definition. */
  private def transitionSteps(ev: DataFrame): DataFrame = {
    val perUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev.filter(col("event_type").isNotNull)
      .withColumn("prev_type", lag(col("event_type"), 1).over(perUser))
      .filter(col("prev_type").isNotNull)
      .select(col("user_id"), col("prev_type"), col("event_type").as("next_type"))
  }

  /** (prev_type, next_type, n) counts over [[transitionSteps]]. */
  private def transitionCounts(steps: DataFrame): DataFrame =
    steps.groupBy(col("prev_type"), col("next_type")).agg(count(lit(1)).as("n"))

  def q104EventTransitions(s: SparkSession, d: String): DataFrame = {
    val matrix = Window.partitionBy(col("prev_type"))
    transitionCounts(transitionSteps(events(s, d)))
      .withColumn("frac", col("n") / sum(col("n")).over(matrix))
      .orderBy(col("prev_type"), col("next_type"))
  }

  val q104Sql: String =
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |   lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      |  FROM events WHERE event_type IS NOT NULL),
      |tr AS (
      |  SELECT prev_type, event_type AS next_type, count(*) AS n
      |  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
      |SELECT prev_type, next_type, n,
      | n / CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS frac
      |FROM tr ORDER BY prev_type, next_type""".stripMargin

  /** q111: behavioral anomaly scoring — each user's event path scored
   *  by its negative log-likelihood under the corpus-wide first-order
   *  Markov model (q104's transition matrix). High avg-NLL users take
   *  improbable action sequences; this is model-based anomaly
   *  detection with the model TRAINED on the same engine pass.
   *
   *  Determinism: transition fracs are raw divisions of exact counts;
   *  each step's −ln(frac) is micro-nat-quantized BEFORE the per-user
   *  sum (order-free; the q79 ln() rule), and avg ships as a raw
   *  long/long division.
   *
   *  Scale: one lag() window on the user_id partitioning, the T²-row
   *  matrix re-joined by broadcast (never a shuffle of the event
   *  stream on the pair key), one per-user hash aggregate riding the
   *  same user_id partitioning as the window. */
  def q111PathAnomaly(s: SparkSession, d: String): DataFrame = {
    val matrix = Window.partitionBy(col("prev_type"))
    val steps = transitionSteps(events(s, d))
    val trans = transitionCounts(steps)
      .withColumn("frac", col("n") / sum(col("n")).over(matrix))
      .select(col("prev_type"), col("next_type"),
        round(-log(col("frac")) * 1e6).cast("long").as("nll_micro"))
    steps.join(broadcast(trans), Seq("prev_type", "next_type"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_steps"), sum(col("nll_micro")).as("path_nll_micro"))
      .withColumn("avg_nll_micro", col("path_nll_micro") / col("n_steps"))
      .orderBy(col("user_id"))
  }

  val q111Sql: String =
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |   lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      |  FROM events WHERE event_type IS NOT NULL),
      |steps AS (
      |  SELECT user_id, prev_type, event_type AS next_type
      |  FROM seq WHERE prev_type IS NOT NULL),
      |trans AS (
      |  SELECT prev_type, next_type,
      |   CAST(round(-ln(count(*) / CAST(sum(count(*)) OVER (PARTITION BY prev_type) AS DOUBLE)) * 1e6) AS BIGINT) AS nll_micro
      |  FROM steps GROUP BY prev_type, next_type)
      |SELECT s.user_id, count(*) AS n_steps,
      | CAST(sum(t.nll_micro) AS BIGINT) AS path_nll_micro,
      | sum(t.nll_micro) / CAST(count(*) AS DOUBLE) AS avg_nll_micro
      |FROM steps s JOIN trans t USING (prev_type, next_type)
      |GROUP BY s.user_id ORDER BY s.user_id""".stripMargin

  // ---------------------------------------------------------------
  // q116: calendar gap-fill + last-observation-carried-forward
  // ---------------------------------------------------------------

  /** q116: regularize each user's event history onto a dense daily
   *  calendar — missing days appear with n_events = 0 and the value
   *  column carried forward from the last observed day (LOCF), the
   *  canonical resample step before any time-series model or
   *  day-over-day comparison.
   *
   *  Value sums are cents-quantized longs (Tables.cents) so both the
   *  daily aggregate and the carried value are exact integers —
   *  LOCF then moves an exact value, not a float.
   *
   *  Scale: one hash aggregate to (user, day); the calendar explode
   *  generates only span-length rows per user (output-sized, not
   *  corpus-sized); the LOCF window partitions BY USER — thousands
   *  of independent partitions, never a global sort. */
  def q116GapFill(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, d).withColumn("day", to_date(col("ts")))
    val daily = ev.groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n"), sum(Tables.cents(col("value"))).as("c"))
    val days = ev.groupBy(col("user_id"))
      .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      .select(col("user_id"),
        explode(expr("sequence(mn, mx, interval 1 day)")).as("day"))
    days.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        last(col("c"), ignoreNulls = true).over(
          Window.partitionBy(col("user_id")).orderBy(col("day"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("cents_locf"))
      .orderBy(col("user_id"), col("day"))
  }

  val q116Sql: String =
    """WITH daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n,
      |   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2),
      |span AS (
      |  SELECT user_id, min(day) AS mn, max(day) AS mx FROM daily GROUP BY 1),
      |cal AS (
      |  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 DAY))::DATE AS day
      |  FROM span)
      |SELECT cal.user_id, cal.day, coalesce(n, 0) AS n_events,
      | last_value(c IGNORE NULLS) OVER (
      |   PARTITION BY cal.user_id ORDER BY cal.day
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cents_locf
      |FROM cal LEFT JOIN daily USING (user_id, day)
      |ORDER BY user_id, day""".stripMargin

  /** q125: the stationary event-type distribution of the corpus
   *  Markov chain (q104's transition matrix) — PageRank-style power
   *  iteration, answering "where does user behavior settle?". 30
   *  iterations of v′(j) = Σᵢ ⌊v(i)·p̂(i,j)⌋ over micro-quantized
   *  transition probabilities p̂ = ⌊n·10⁶/rowtotal⌋ — ALL-INTEGER
   *  arithmetic, so every iterate is exact and order-free in both
   *  engines (the oracle replays the identical recursion as a
   *  recursive CTE; a float power iteration would diverge in the
   *  last bits after 30 rounds of reordered sums).
   *
   *  Scale: the corpus-sized work is q104's one lag() window + one
   *  hash aggregate; the iteration then runs on the T×T matrix — a
   *  bounded MODEL artifact (T = event-type vocabulary), collected
   *  once like the IVF codebook / BPE rule table, never the event
   *  stream. States are exactly those with an incoming transition
   *  (matching the recursion's reachable set). */
  def q125StationaryDist(s: SparkSession, d: String): DataFrame =
    stationaryDist(events(s, d))

  /** Core of q125 over any events-shaped frame (user_id, ts,
    * event_id, event_type). */
  def stationaryDist(ev: DataFrame): DataFrame = {
    import ev.sparkSession.implicits._
    val tr = transitionCounts(transitionSteps(ev))
    val tot = tr.groupBy(col("prev_type")).agg(sum(col("n")).as("tot"))
    val p = tr.join(tot, "prev_type")
      .select(col("prev_type"), col("next_type"),
        expr("n * 1000000 div tot").as("pm"))
      .as[(String, String, Long)]
      .collect() // T² rows — the bounded model artifact
    val states = (p.map(_._1) ++ p.map(_._2)).distinct.sorted
    val reachable = states.filter(et => p.exists(_._2 == et)) // reachable set
    var v: Map[String, Long] = states.map(_ -> 1000000000L).toMap
    (1 to 30).foreach { _ =>
      val next = reachable.map { j =>
        j -> p.iterator.filter(_._2 == j)
          .map { case (i, _, pm) => v.getOrElse(i, 0L) * pm / 1000000L }
          .sum
      }.toMap
      v = next
    }
    val total = v.values.sum
    // total can be 0 (e.g. every reachable state's mass floored away);
    // guard the division so share is 0.0, never NaN, on both engines.
    reachable.map { et =>
      val share = if (total == 0L) 0.0 else v(et) * 1.0 / total
      (et, v(et), share)
    }
      .toSeq.toDF("event_type", "mass_micro", "share")
      .orderBy(col("event_type"))
  }

  val q125Sql: String =
    """WITH RECURSIVE
      |seq AS (
      |  SELECT user_id, event_type,
      |   lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      |  FROM events WHERE event_type IS NOT NULL),
      |tr AS (
      |  SELECT prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS n
      |  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS tot FROM tr GROUP BY 1),
      |p AS (
      |  SELECT tr.prev_type, tr.next_type, tr.n * 1000000 // t.tot AS pm
      |  FROM tr JOIN tot t USING (prev_type)),
      |states AS (
      |  -- no top-level UNION here: inside WITH RECURSIVE, DuckDB
      |  -- treats `x AS (a UNION b)` as an iterative CTE and runs the
      |  -- second arm an extra time (doubled the k=0 mass)
      |  SELECT DISTINCT et FROM (
      |    SELECT prev_type AS et FROM tr
      |    UNION ALL SELECT next_type FROM tr)),
      |it(k, et, v) AS (
      |  SELECT 0, et, CAST(1000000000 AS BIGINT) FROM states
      |  UNION ALL
      |  SELECT it.k + 1, p.next_type, CAST(sum(it.v * p.pm // 1000000) AS BIGINT)
      |  FROM it JOIN p ON it.et = p.prev_type
      |  WHERE it.k < 30
      |  GROUP BY it.k + 1, p.next_type),
      |-- The recursion emits a state at step k only while some
      |-- predecessor survived step k-1: a state fed solely by
      |-- pure-source states vanishes from `it` even though its
      |-- stationary mass is legitimately 0. Left-join the reachable
      |-- set (every state with an in-edge) so the row set matches the
      |-- engine's: one row per reachable state, mass coalesced to 0.
      |reach AS (SELECT DISTINCT next_type AS et FROM tr),
      |fin AS (SELECT et, v FROM it WHERE k = 30),
      |tot30 AS (SELECT coalesce(sum(v), 0) AS s FROM fin)
      |SELECT r.et AS event_type, CAST(coalesce(f.v, 0) AS BIGINT) AS mass_micro,
      | CASE WHEN t.s = 0 THEN 0.0 ELSE coalesce(f.v, 0) * 1.0 / t.s END AS share
      |FROM reach r LEFT JOIN fin f ON r.et = f.et CROSS JOIN tot30 t
      |ORDER BY r.et""".stripMargin

  /** q130: association rules over behavioral sessions — for every
   *  pair of event types co-occurring in a session (q15's 30-minute
   *  gap semantics), the market-basket statistics: support,
   *  confidence, and lift from EXACT session counts. Lift > 1 flags
   *  behaviors that travel together (view→purchase), the signal
   *  recommendation/abuse pipelines read off event streams.
   *
   *  Scale: sessionization is q15's one user_id window; the pair
   *  frame self-joins the DISTINCT (session, type) rows on the
   *  session key — bounded by sessions × type-vocabulary, never raw
   *  events; every ratio is a raw division of exact longs. */
  def q130AssociationRules(s: SparkSession, d: String): DataFrame = {
    val st = sessionized(events(s, d).filter(col("event_type").isNotNull))
      .select(col("user_id"), col("sess_idx"), col("event_type")).distinct()
    val nSess = st.select(col("user_id"), col("sess_idx")).distinct()
      .agg(count(lit(1)).as("n_sessions"))
    val perType = st.groupBy(col("event_type")).agg(count(lit(1)).as("n_t"))
    val pairs = st.select(col("user_id"), col("sess_idx"), col("event_type").as("a"))
      .join(st.select(col("user_id"), col("sess_idx"), col("event_type").as("b")),
        Seq("user_id", "sess_idx"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
    pairs
      .join(perType.select(col("event_type").as("a"), col("n_t").as("n_a")), "a")
      .join(perType.select(col("event_type").as("b"), col("n_t").as("n_b")), "b")
      .crossJoin(nSess) // 1-row scalar
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        col("n_sessions"),
        (col("n_ab") * lit(1.0) / col("n_sessions")).as("support"),
        (col("n_ab") * lit(1.0) / col("n_a")).as("confidence"),
        (col("n_ab") * lit(1.0) * col("n_sessions") / (col("n_a") * col("n_b")))
          .as("lift"))
      .orderBy(col("a"), col("b"))
  }

  val q130Sql: String =
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |   CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_idx
      |  FROM (
      |   SELECT user_id, event_id, ts, event_type,
      |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
      |          OR CAST(floor(epoch(ts)) AS BIGINT)
      |             - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) >= 1800
      |         THEN 1 ELSE 0 END AS new_sess
      |   FROM events WHERE event_type IS NOT NULL) t),
      |st AS (SELECT DISTINCT user_id, sess_idx, event_type FROM seq),
      |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_sessions
      |       FROM (SELECT DISTINCT user_id, sess_idx FROM st)),
      |pt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_t FROM st GROUP BY 1),
      |pr AS (
      |  SELECT x.event_type AS a, y.event_type AS b, CAST(count(*) AS BIGINT) AS n_ab
      |  FROM st x JOIN st y
      |    ON x.user_id = y.user_id AND x.sess_idx = y.sess_idx
      |   AND x.event_type < y.event_type
      |  GROUP BY 1, 2)
      |SELECT a, b, n_ab, pa.n_t AS n_a, pb.n_t AS n_b, n_sessions,
      | n_ab * 1.0 / n_sessions AS support,
      | n_ab * 1.0 / pa.n_t AS confidence,
      | n_ab * 1.0 * n_sessions / (pa.n_t * pb.n_t) AS lift
      |FROM pr JOIN pt pa ON pr.a = pa.event_type
      |        JOIN pt pb ON pr.b = pb.event_type, ns
      |ORDER BY a, b""".stripMargin

  /** q133: per-user temporal burstiness — Goh–Barabási B = (σ−μ)/
   *  (σ+μ) over the inter-event gap distribution. B → −1 for
   *  metronome-regular activity (bots, schedulers), ≈ 0 for Poisson
   *  arrivals, → +1 for heavy-tailed human bursts — a standard
   *  automation/abuse signal read straight off the event stream.
   *
   *  Determinism: gaps are exact integer seconds from the q15
   *  ordering; per-user (n, Σg, Σg²) are exact longs (Σg² stays
   *  integral — gap² ≤ 10¹⁴ is Long-safe; Σg·Σg is computed in
   *  DOUBLE, the q131 rule, since its integer form can overflow);
   *  σ, μ, and B are the same IEEE expression in both engines, with
   *  a mirrored zero-denominator guard.
   *
   *  Scale: one lag window + one hash aggregate, both on the
   *  user_id partitioning q15 already established — no extra
   *  shuffle shape. */
  def q133Burstiness(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val g = events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .filter(col("prev_ts").isNotNull)
      .select(col("user_id"),
        (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))).as("gap"))
    g.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"), sum(col("gap")).as("sg"),
        sum(col("gap") * col("gap")).as("sg2"))
      .withColumn("mu", col("sg").cast("double") / col("n_gaps"))
      .withColumn("sigma",
        // clamp the radicand at 0: FP cancellation on a near-metronome
        // user whose sg**2 exceeds 2**53 can compute a tiny negative for
        // a true variance >= 0 — Spark sqrt would yield NaN and DuckDB
        // sqrt() HARD-ERRORS on negatives, aborting the whole oracle
        sqrt(greatest(lit(0.0),
          (col("sg2") - col("sg").cast("double") * col("sg") / col("n_gaps"))
            / col("n_gaps"))))
      .select(col("user_id"), col("n_gaps"), col("mu").as("mean_gap"),
        when(col("sigma") + col("mu") > 0,
          (col("sigma") - col("mu")) / (col("sigma") + col("mu")))
          .otherwise(lit(0.0)).as("burstiness"))
      .orderBy(col("user_id"))
  }

  val q133Sql: String =
    """WITH g AS (
      |  SELECT user_id,
      |   CAST(floor(epoch(ts)) AS BIGINT)
      |    - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) AS gap
      |  FROM events),
      |a AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
      |   CAST(sum(gap) AS BIGINT) AS sg, CAST(sum(gap * gap) AS BIGINT) AS sg2
      |  FROM g WHERE gap IS NOT NULL GROUP BY 1),
      |m AS (
      |  SELECT user_id, n_gaps, CAST(sg AS DOUBLE) / n_gaps AS mu,
      |   sqrt(greatest(0.0, (sg2 - CAST(sg AS DOUBLE) * sg / n_gaps) / n_gaps)) AS sigma
      |  FROM a)
      |SELECT user_id, n_gaps, mu AS mean_gap,
      | CASE WHEN sigma + mu > 0 THEN (sigma - mu) / (sigma + mu) ELSE 0.0 END
      |   AS burstiness
      |FROM m ORDER BY user_id""".stripMargin

  /** q136: last-touch revenue attribution — each purchase credits its
   *  value to the nearest PRECEDING non-purchase event by the same
   *  user within a 1-hour lookback ('direct' when none qualifies):
   *  the marketing-attribution shape every event pipeline reports.
   *
   *  Determinism: the touch is selected by the q15 total order
   *  (ts, event_id), amounts aggregate as exact cents, and the
   *  lookback compares timestamps — no floating point anywhere in
   *  the attribution decision.
   *
   *  Scale: one IGNORE-NULLS running window on the user_id
   *  partitioning q15/q133 already establish, then a hash aggregate
   *  on the tiny event-type dimension — no new shuffle shape, no
   *  self-join (the naive form is purchases × events). */
  def q136Attribution(s: SparkSession, d: String): DataFrame =
    attributeLastTouch(events(s, d))

  /** Core of q136 over any (user_id, event_id, ts, event_type, value)
    * frame — split out so specs can pin the boundary semantics on
    * synthetic rows. */
  private[ops] def attributeLastTouch(ev: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type") =!= "purchase",
      struct(col("ts").as("t"), col("event_type").as("tp")))
    ev
      .withColumn("last_touch", last(touch, ignoreNulls = true).over(byUser))
      .filter(col("event_type") === "purchase")
      .select(
        when(col("last_touch").isNotNull &&
            col("last_touch.t") >= col("ts") - expr("INTERVAL 1 HOUR"),
          col("last_touch.tp")).otherwise(lit("direct")).as("touch_type"),
        Tables.cents(col("value")).as("cents"))
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_purchases"), sum(col("cents")).as("sum_cents"))
      .orderBy(col("touch_type"))
  }

  /** q138: first-touch and linear multi-touch attribution — the two
   *  remaining models of the standard triple (q136 is last-touch).
   *  Both share ONE window pass: the same user_id partitioning as
   *  q136, but with an explicit 1-hour RANGE frame, so the frame
   *  itself enforces the lookback (no post-hoc timestamp check) and
   *  one more aggregate in the same pass serves both models — no new
   *  shuffle, no purchases×events self-join.
   *
   *  Model semantics (deliberately self-contained; the lookback
   *  window is [purchase_ts − 1 h, purchase_ts], peers at the
   *  purchase's own timestamp included — RANGE/CURRENT ROW semantics,
   *  identical in both engines):
   *   - first_touch: full credit to the EARLIEST touch in the window
   *     (ties broken by event_id, then event_type — realized by
   *     min() over a zero-padded sortable string key, portable where
   *     struct-min is not); 'direct' when the window has no touch;
   *   - linear: credit split across every touch in the window. Each
   *     per-touch share is quantized ONCE to integer micro-cents
   *     (round(cents·10⁶/n) — identical IEEE division + half-up
   *     round in both engines, the q110 w_micro treatment), then
   *     only integers are summed, so aggregation order can't perturb
   *     the result.
   *
   *  Scale: the RANGE frame holds at most one user-hour of events in
   *  state; the collect_list per purchase is bounded by the same
   *  user-hour (the q62 session contract), and everything after the
   *  window is a hash aggregate on the tiny (model, event_type)
   *  dimension. */
  def q138AttributionModels(s: SparkSession, d: String): DataFrame =
    attributeMultiTouch(events(s, d))

  /** Core of q138 over any (user_id, event_id, ts, event_type, value)
    * frame — split out so specs can pin boundary semantics.
    *
    * Plan shape: both models' credit rows are built as ONE per-
    * purchase array (a 1-element first-touch entry concatenated with
    * the transform() of the touch list) and exploded once, so the
    * window pass runs exactly once — a union of per-model branches
    * would re-read the windowed frame per branch (ReusedExchange
    * shares only the shuffle, not the sort+window compute). */
  private[ops] def attributeMultiTouch(ev: DataFrame): DataFrame = {
    val frame = "PARTITION BY user_id ORDER BY ts " +
      "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW"
    val touchKey = "CASE WHEN event_type <> 'purchase' THEN " +
      // 20-digit fields for BOTH components: a 12-digit event_id field
      // silently overflows for ids >= 10^12 (the ScaleGen id-shift
      // hazard class), shifting the fixed substring offset below and
      // gluing id digits onto the extracted touch_type. Both values
      // are biased by +2^62 before formatting: a bare '%020d' keeps
      // the width for negatives but the leading '-' inverts lexical
      // order among them, so pre-1970 timestamps or negative ids
      // would pick the wrong 'earliest' touch
      "concat(format_string('%020d', unix_micros(ts) + 4611686018427387904L), " +
      "format_string('%020d', event_id + 4611686018427387904L), event_type) END"
    val touchType = "CASE WHEN event_type <> 'purchase' THEN event_type END"
    // both window expressions in ONE select: sequential withColumns
    // leave a Project between the two Window nodes, which blocks
    // CollapseWindow from fusing the identical specs into one operator
    val p = ev
      .select(col("*"),
        expr(s"min($touchKey) OVER ($frame)").as("first_key"),
        // collect_list drops the purchase-row NULLs, so the list holds
        // exactly the window's touches (order irrelevant — counts only)
        expr(s"collect_list($touchType) OVER ($frame)").as("touches"))
      .filter(col("event_type") === "purchase")
      .select(col("first_key"), col("touches"),
        size(col("touches")).cast("long").as("n_touches"),
        Tables.cents(col("value")).as("cents"))
    val fullCredit = (col("cents") * 1000000L).as("credit_micro")
    val credits = concat(
      array(struct(lit("first_touch").as("model"),
        when(col("n_touches") > 0, expr("substring(first_key, 41)"))
          .otherwise(lit("direct")).as("touch_type"),
        fullCredit)),
      when(col("n_touches") === 0,
        array(struct(lit("linear").as("model"),
          lit("direct").as("touch_type"), fullCredit)))
        .otherwise(transform(col("touches"), t =>
          struct(lit("linear").as("model"), t.as("touch_type"),
            round(col("cents").cast("double") * 1e6 / col("n_touches"))
              .cast("long").as("credit_micro")))))
    p.select(explode(credits).as("c"))
      .groupBy(col("c.model").as("model"), col("c.touch_type").as("touch_type"))
      .agg(count(lit(1)).as("n_credits"), sum(col("c.credit_micro")).as("micro_cents"))
      .orderBy(col("model"), col("touch_type"))
  }

  val q138Sql: String =
    """WITH t AS (
      |  SELECT event_type, "value",
      |   min(CASE WHEN event_type <> 'purchase' THEN
      |        printf('%020d', epoch_us(ts) + 4611686018427387904) || printf('%020d', event_id + 4611686018427387904) || event_type END)
      |     OVER w AS first_key,
      |   count(CASE WHEN event_type <> 'purchase' THEN 1 END) OVER w AS n_touches,
      |   list(CASE WHEN event_type <> 'purchase' THEN event_type END) OVER w AS touches
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts
      |               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)),
      |p AS (
      |  SELECT first_key, touches, n_touches,
      |   CAST(round("value" * 100) AS BIGINT) AS cents
      |  FROM t WHERE event_type = 'purchase'),
      |firstm AS (
      |  SELECT 'first_touch' AS model,
      |   CASE WHEN n_touches > 0 THEN substr(first_key, 41) ELSE 'direct' END AS touch_type,
      |   cents * 1000000 AS credit_micro
      |  FROM p),
      |lin AS (
      |  SELECT 'linear' AS model, u.tt AS touch_type,
      |   CAST(round(CAST(cents AS DOUBLE) * 1e6 / n_touches) AS BIGINT) AS credit_micro
      |  FROM p, LATERAL (SELECT unnest(touches) AS tt) u
      |  WHERE u.tt IS NOT NULL),
      |lind AS (
      |  SELECT 'linear' AS model, 'direct' AS touch_type,
      |   cents * 1000000 AS credit_micro
      |  FROM p WHERE n_touches = 0),
      |allm AS (
      |  SELECT * FROM firstm UNION ALL SELECT * FROM lin UNION ALL SELECT * FROM lind)
      |SELECT model, touch_type, count(*) AS n_credits,
      | CAST(sum(credit_micro) AS BIGINT) AS micro_cents
      |FROM allm GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val q136Sql: String =
    """WITH t AS (
      |  SELECT event_type, ts, "value",
      |   last_value(CASE WHEN event_type <> 'purchase' THEN ts END IGNORE NULLS)
      |     OVER (PARTITION BY user_id ORDER BY ts, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_ts,
      |   last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      |     OVER (PARTITION BY user_id ORDER BY ts, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_tp
      |  FROM events)
      |SELECT
      | CASE WHEN touch_ts IS NOT NULL AND touch_ts >= ts - INTERVAL 1 HOUR
      |      THEN touch_tp ELSE 'direct' END AS touch_type,
      | count(*) AS n_purchases,
      | CAST(sum(CAST(round("value" * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM t WHERE event_type = 'purchase'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------
  // q161: CUPED variance-reduced experiment readout
  // ------------------------------------------------------------------

  /** q161: CUPED-adjusted A/B metric (Deng, Xu, Kohavi & Walker,
   *  WSDM'13) over events — per-variant mean purchase revenue in the
   *  experiment period, variance-reduced by each user's PRE-period
   *  revenue: adj = ȳ_v − θ·(x̄_v − x̄), θ = cov(X,Y)/var(X). The
   *  standard trick for shrinking experiment confidence intervals
   *  without touching the treatment effect (E[adj] = E[y] because θ
   *  is global and E[x̄_v − x̄] = 0 under randomization).
   *
   *  Determinism (the q105 discipline): per-user X/Y are EXACT cent
   *  sums; the θ moments are decimal(38,0) sums of int64 products
   *  (x, y ≤ ~10⁸ cents per user → products ≤ 10¹⁶, sums exact past
   *  any octave), so every double is derived from exact integers
   *  through the identical closed form — bit-identical cross-engine.
   *
   *  Scale: one events scan → per-user hash aggregate (map-side
   *  partials), then a 1-row moment aggregate and a variant-count
   *  aggregate over the user frame; the 1-row θ frame broadcasts
   *  (maxRows = 1, inside the mandatory-hint policy). No window, no
   *  data-sized join. Variant = user_id % 2 — the deterministic
   *  stand-in for the assignment column a real experiment logs. */
  def q161Cuped(s: SparkSession, d: String): DataFrame = {
    val cut = to_timestamp(lit("2024-01-16 00:00:00"))
    val isP = col("event_type") === "purchase"
    val perUser = events(s, d)
      .select(col("user_id"),
        when(isP && col("ts") < cut, cents(col("value"))).otherwise(0L).as("xc"),
        when(isP && col("ts") >= cut, cents(col("value"))).otherwise(0L).as("yc"))
      .groupBy(col("user_id"))
      .agg(sum(col("xc")).as("x"), sum(col("yc")).as("y"))
    val dec = "decimal(38,0)"
    val g = perUser.agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum((col("x") * col("x")).cast(dec)).as("sxx"),
        sum((col("x") * col("y")).cast(dec)).as("sxy"))
      // var(X)=0 guard: with no pre-period variation the ratio is 0/0
      // (NaN) and engines may diverge on IEEE division semantics —
      // define theta = 0 (no adjustment) identically in both engines.
      // The denominator double is derived from exact integers the same
      // way on both sides, so the branch triggers identically.
      .withColumn("thden",
        col("n").cast("double") * col("sxx").cast("double")
          - col("sx").cast("double") * col("sx").cast("double"))
      .withColumn("theta",
        when(col("thden") === 0.0, lit(0.0)).otherwise(
          (col("n").cast("double") * col("sxy").cast("double")
            - col("sx").cast("double") * col("sy").cast("double"))
          / col("thden")))
      .withColumn("xbar", col("sx").cast("double") / col("n").cast("double"))
      .select(col("theta"), col("xbar"))
    perUser
      .withColumn("variant", (col("user_id") % 2).cast("long"))
      .groupBy(col("variant"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("x")).as("vx"), sum(col("y")).as("vy"))
      .crossJoin(broadcast(g))
      .withColumn("mean_y_cents",
        col("vy").cast("double") / col("n_users").cast("double"))
      .withColumn("mean_adj_cents",
        col("vy").cast("double") / col("n_users").cast("double")
          - col("theta") * (col("vx").cast("double") / col("n_users").cast("double")
            - col("xbar")))
      .select(col("variant"), col("n_users"), col("mean_y_cents"),
        col("mean_adj_cents"), col("theta"))
      .orderBy(col("variant"))
  }

  val q161Sql: String =
    """WITH pu AS (
      |  SELECT user_id,
      |   CAST(sum(CASE WHEN event_type = 'purchase'
      |                  AND ts < TIMESTAMP '2024-01-16 00:00:00'
      |            THEN CAST(round("value" * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
      |   CAST(sum(CASE WHEN event_type = 'purchase'
      |                  AND ts >= TIMESTAMP '2024-01-16 00:00:00'
      |            THEN CAST(round("value" * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
      |  FROM events GROUP BY user_id),
      |g AS (
      |  SELECT count(*) AS n,
      |   CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |   CAST(sum(x * x) AS DECIMAL(38,0)) AS sxx,
      |   CAST(sum(x * y) AS DECIMAL(38,0)) AS sxy
      |  FROM pu),
      |th AS (
      |  SELECT
      |   CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) = 0.0 THEN 0.0
      |   ELSE
      |   (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |   / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |   END AS theta,
      |   CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xbar
      |  FROM g)
      |SELECT CAST(user_id % 2 AS BIGINT) AS variant,
      | count(*) AS n_users,
      | CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_y_cents,
      | CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE)
      |   - th.theta * (CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE) - th.xbar)
      |   AS mean_adj_cents,
      | th.theta
      |FROM pu, th
      |GROUP BY 1, th.theta, th.xbar
      |ORDER BY variant""".stripMargin

  // ------------------------------------------------------------------
  // q163: two-proportion conversion test (chi-squared)
  // ------------------------------------------------------------------

  /** q163: the A/B readout next to q161 — per-variant conversion rate
   *  (user made at least one HIGH-VALUE purchase, value ≥ 120, in the
   *  experiment period — the plain any-purchase event saturates at
   *  100% on the provisioned density, degenerating the pooled
   *  variance) and the pooled two-proportion chi-squared statistic
   *  z² = (p₀−p₁)² / (p̂(1−p̂)(1/n₀+1/n₁)). All counts are exact longs
   *  from one scan + one per-user aggregate + one 4-cell conditional
   *  aggregate; the statistic is a single closed form over the one
   *  aggregated row (the q105/q161 discipline — doubles only at the
   *  very end, derived identically in both engines). */
  def q163ConversionTest(s: SparkSession, d: String): DataFrame = {
    val cut = to_timestamp(lit("2024-01-16 00:00:00"))
    val perUser = events(s, d)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" && col("ts") >= cut
          && col("value") >= 120.0, 1L)
        .otherwise(0L)).as("converted"))
      .withColumn("variant", (col("user_id") % 2).cast("long"))
    val cell = perUser.agg(
      sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n0"),
      sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(col("variant") === 0, col("converted")).otherwise(0L)).as("c0"),
      sum(when(col("variant") === 1, col("converted")).otherwise(0L)).as("c1"))
    val dbl = (n: String) => col(n).cast("double")
    cell
      .withColumn("rate0", dbl("c0") / dbl("n0"))
      .withColumn("rate1", dbl("c1") / dbl("n1"))
      .withColumn("pooled", (dbl("c0") + dbl("c1")) / (dbl("n0") + dbl("n1")))
      // degenerate pooled rate (all-convert or none-convert): the
      // variance term is exactly 0 and the ratio 0/0 — define chi2 = 0
      // (no evidence of a difference) identically in both engines
      // instead of relying on the data keeping pooled inside (0,1).
      .withColumn("chi2",
        when(col("pooled") === 0.0 || col("pooled") === 1.0, lit(0.0))
          .otherwise(
            (col("rate0") - col("rate1")) * (col("rate0") - col("rate1"))
              / (col("pooled") * (lit(1.0) - col("pooled"))
                * (lit(1.0) / dbl("n0") + lit(1.0) / dbl("n1")))))
      .select(col("n0"), col("c0"), col("n1"), col("c1"),
        col("rate0"), col("rate1"), col("chi2"))
  }

  val q163Sql: String =
    """WITH pu AS (
      |  SELECT user_id, CAST(user_id % 2 AS BIGINT) AS variant,
      |   max(CASE WHEN event_type = 'purchase'
      |             AND ts >= TIMESTAMP '2024-01-16 00:00:00'
      |             AND "value" >= 120.0
      |       THEN 1 ELSE 0 END) AS converted
      |  FROM events GROUP BY user_id),
      |cell AS (
      |  SELECT
      |   CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
      |   CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |   CAST(sum(CASE WHEN variant = 0 THEN converted ELSE 0 END) AS BIGINT) AS c0,
      |   CAST(sum(CASE WHEN variant = 1 THEN converted ELSE 0 END) AS BIGINT) AS c1
      |  FROM pu),
      |r AS (
      |  SELECT *,
      |   CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS rate0,
      |   CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS rate1,
      |   (CAST(c0 AS DOUBLE) + CAST(c1 AS DOUBLE))
      |     / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)) AS pooled
      |  FROM cell)
      |SELECT n0, c0, n1, c1, rate0, rate1,
      | CASE WHEN pooled = 0.0 OR pooled = 1.0 THEN 0.0 ELSE
      | (rate0 - rate1) * (rate0 - rate1)
      |   / (pooled * (1.0 - pooled)
      |     * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE)))
      | END AS chi2
      |FROM r""".stripMargin

  // ------------------------------------------------------------------
  // q164: Mann-Whitney U (rank-sum) test on per-user revenue
  // ------------------------------------------------------------------

  /** q164: nonparametric variant comparison — the Mann-Whitney U test
   *  on per-user experiment-period revenue, with midrank tie handling
   *  and the tie-corrected normal approximation.
   *
   *  Exactness: midranks are rationals with denominator 2, so the
   *  pipeline carries 2·R₁ = Σ_y n1_y·(2·cum_before + n_y + 1) as an
   *  exact long (for tie group y starting at min-rank s, the midrank
   *  a satisfies 2a = 2s + n_y − 1); 2·U₁ = 2R₁ − n₁(n₁+1) exact. The
   *  tie-corrected variance and z-score are one closed form over
   *  exact sums (Σ(t³−t) as decimal(38,0)).
   *
   *  Scale: ranking is NOT a corpus-wide row window — per-user cent
   *  totals aggregate to per-VALUE counts first (cent values have
   *  bounded cardinality, the q44/q112 argument), and the cumulative
   *  count runs over that bounded value-ordered frame. One corpus
   *  scan, one per-user aggregate, one per-value aggregate, one
   *  bounded window, one 1-row closed form. */
  def q164MannWhitney(s: SparkSession, d: String): DataFrame = {
    val cut = to_timestamp(lit("2024-01-16 00:00:00"))
    val perUser = events(s, d)
      .select(col("user_id"),
        when(col("event_type") === "purchase" && col("ts") >= cut,
          cents(col("value"))).otherwise(0L).as("yc"))
      .groupBy(col("user_id")).agg(sum(col("yc")).as("y"))
      .withColumn("variant", (col("user_id") % 2).cast("long"))
    val byValue = perUser.groupBy(col("y")).agg(
      count(lit(1)).as("t"),
      sum(when(col("variant") === 1, 1L).otherwise(0L)).as("t1"))
    // cumBefore (exclusive running count in value order) WITHOUT an
    // unpartitioned window: per-user revenue SUMS are not a bounded
    // domain like q44/q112's raw cent values, so `orderBy(y)` with no
    // partition would sort the whole value frame in one task at large
    // user counts. The q156 shape instead: range-exchange on y, an
    // O(P) driver prefix-sum of per-partition t totals, and a narrow
    // per-partition running sum — same result, no single-task sort.
    import s.implicits._
    val parted = byValue
      .repartitionByRange(col("y")).sortWithinPartitions(col("y"))
      .localCheckpoint(eager = true)
    val partTotals = parted.select(spark_partition_id().as("pid"), col("t"))
      .groupBy(col("pid")).agg(sum(col("t")).as("pt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nParts = parted.rdd.getNumPartitions
    val offsets = new Array[Long](nParts + 1)
    (0 until nParts).foreach { p =>
      offsets(p + 1) = offsets(p) + partTotals.getOrElse(p, 0L) }
    val bOff = s.sparkContext.broadcast(offsets)
    val ranked = parted.as[(Long, Long, Long)].mapPartitions { it =>
      var cum = bOff.value(org.apache.spark.TaskContext.getPartitionId())
      it.map { case (y, t, t1) =>
        val before = cum; cum += t; (y, t, t1, before) }
    }.toDF("y", "t", "t1", "cumBefore")
    val dec = "decimal(38,0)"
    val g = ranked.agg(
        sum(col("t")).as("n"),
        sum(col("t1")).as("n1"),
        // summand to decimal BEFORE summing (oracle sums in HUGEINT):
        // at extreme user counts the int64 partial sum could silently
        // wrap while the oracle stays exact; cast down after, matching
        // the oracle's post-sum BIGINT cast
        sum((col("t1") * (lit(2L) * col("cumBefore") + col("t") + lit(1L)))
          .cast(dec)).cast("long").as("twoR1"),
        // cast BEFORE cubing: tie groups (the zero-revenue group is
        // corpus-sized) overflow int64 past t ~ 2e6 — the round-5
        // reduce-before-multiply lesson
        sum(col("t").cast(dec) * col("t") * col("t") - col("t")).as("tieSum"))
      .withColumn("n0", col("n") - col("n1"))
      .withColumn("twoU1", col("twoR1") - col("n1") * (col("n1") + lit(1L)))
    val dbl = (c: org.apache.spark.sql.Column) => c.cast("double")
    g.withColumn("u1", dbl(col("twoU1")) / lit(2.0))
      .withColumn("mu", dbl(col("n0")) * dbl(col("n1")) / lit(2.0))
      .withColumn("varU",
        dbl(col("n0")) * dbl(col("n1")) / lit(12.0)
          * (dbl(col("n")) + lit(1.0)
            - dbl(col("tieSum")) / (dbl(col("n")) * (dbl(col("n")) - lit(1.0)))))
      .withColumn("z", (col("u1") - col("mu")) / sqrt(col("varU")))
      .select(col("n0"), col("n1"), col("twoU1"), col("u1"), col("z"))
  }

  val q164Sql: String =
    """WITH pu AS (
      |  SELECT user_id, CAST(user_id % 2 AS BIGINT) AS variant,
      |   CAST(sum(CASE WHEN event_type = 'purchase'
      |                  AND ts >= TIMESTAMP '2024-01-16 00:00:00'
      |            THEN CAST(round("value" * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
      |  FROM events GROUP BY user_id),
      |bv AS (
      |  SELECT y, count(*) AS t,
      |   CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS t1
      |  FROM pu GROUP BY y),
      |rk AS (
      |  SELECT *,
      |   coalesce(sum(t) OVER (ORDER BY y
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumBefore
      |  FROM bv),
      |g AS (
      |  SELECT CAST(sum(t) AS BIGINT) AS n, CAST(sum(t1) AS BIGINT) AS n1,
      |   CAST(sum(t1 * (2 * cumBefore + t + 1)) AS BIGINT) AS twoR1,
      |   CAST(sum(CAST(t AS HUGEINT)*t*t - t) AS DECIMAL(38,0)) AS tieSum
      |  FROM rk),
      |h AS (
      |  SELECT n - n1 AS n0, n1, twoR1 - n1 * (n1 + 1) AS twoU1, n, tieSum
      |  FROM g)
      |SELECT n0, n1, twoU1,
      | CAST(twoU1 AS DOUBLE) / 2.0 AS u1,
      | (CAST(twoU1 AS DOUBLE) / 2.0
      |    - CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE) / 2.0)
      |  / sqrt(CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE) / 12.0
      |     * (CAST(n AS DOUBLE) + 1.0
      |        - CAST(tieSum AS DOUBLE)
      |          / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))) AS z
      |FROM h""".stripMargin

  // ------------------------------------------------------------------
  // q167: Welch's t-test on per-user revenue (unequal variances)
  // ------------------------------------------------------------------

  /** q167: the parametric partner of q164 — Welch's unequal-variance
   *  t-test on per-user experiment-period revenue, with the
   *  Welch–Satterthwaite degrees of freedom. Completes the A/B
   *  readout family: q161 (variance reduction), q163 (proportions),
   *  q164 (rank-sum), q167 (means under unequal variances — the
   *  default test real experimentation platforms report).
   *
   *  Determinism (the q105/q161 discipline): per-variant moments are
   *  exact — n as long, Σy as long, Σy² as decimal(38,0) sums of
   *  int64 squares (y ≤ ~10⁸ cents → y² ≤ 10¹⁶, exact past any
   *  octave) — and every double (mean, variance, t, df) is ONE
   *  closed form over those integers, evaluated identically in both
   *  engines. Guards, identical both sides: pooled standard error
   *  exactly 0 (both variances zero) → t = 0, df = 0 — no 0/0
   *  divergence on a degenerate corpus.
   *
   *  Scale: one events scan → per-user cents aggregate (map-side
   *  partials) → one 2-row conditional moment aggregate → a 1-row
   *  closed form. No window, no join, nothing data-sized past the
   *  first aggregate. */
  def q167WelchTTest(s: SparkSession, d: String): DataFrame = {
    val cut = to_timestamp(lit("2024-01-16 00:00:00"))
    val perUser = events(s, d)
      .select(col("user_id"),
        when(col("event_type") === "purchase" && col("ts") >= cut,
          cents(col("value"))).otherwise(0L).as("yc"))
      .groupBy(col("user_id")).agg(sum(col("yc")).as("y"))
      .withColumn("variant", (col("user_id") % 2).cast("long"))
    val dec = "decimal(38,0)"
    val m = perUser.agg(
      sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n0"),
      sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(col("variant") === 0, col("y")).otherwise(0L)).as("sy0"),
      sum(when(col("variant") === 1, col("y")).otherwise(0L)).as("sy1"),
      sum(when(col("variant") === 0, (col("y") * col("y")).cast(dec))
        .otherwise(lit(0).cast(dec))).as("syy0"),
      sum(when(col("variant") === 1, (col("y") * col("y")).cast(dec))
        .otherwise(lit(0).cast(dec))).as("syy1"))
    val dbl = (c: org.apache.spark.sql.Column) => c.cast("double")
    m.withColumn("mean0", dbl(col("sy0")) / dbl(col("n0")))
      .withColumn("mean1", dbl(col("sy1")) / dbl(col("n1")))
      .withColumn("var0",
        (dbl(col("n0")) * dbl(col("syy0")) - dbl(col("sy0")) * dbl(col("sy0")))
          / (dbl(col("n0")) * (dbl(col("n0")) - lit(1.0))))
      .withColumn("var1",
        (dbl(col("n1")) * dbl(col("syy1")) - dbl(col("sy1")) * dbl(col("sy1")))
          / (dbl(col("n1")) * (dbl(col("n1")) - lit(1.0))))
      .withColumn("se0", col("var0") / dbl(col("n0")))
      .withColumn("se1", col("var1") / dbl(col("n1")))
      .withColumn("se2", col("se0") + col("se1"))
      .withColumn("t",
        when(col("se2") === 0.0, lit(0.0))
          .otherwise((col("mean1") - col("mean0")) / sqrt(col("se2"))))
      .withColumn("df",
        when(col("se2") === 0.0, lit(0.0))
          .otherwise(col("se2") * col("se2")
            / (col("se0") * col("se0") / (dbl(col("n0")) - lit(1.0))
              + col("se1") * col("se1") / (dbl(col("n1")) - lit(1.0)))))
      .select(col("n0"), col("n1"), col("mean0"), col("mean1"),
        col("var0"), col("var1"), col("t"), col("df"))
  }

  val q167Sql: String =
    """WITH pu AS (
      |  SELECT user_id, CAST(user_id % 2 AS BIGINT) AS variant,
      |   CAST(sum(CASE WHEN event_type = 'purchase'
      |                  AND ts >= TIMESTAMP '2024-01-16 00:00:00'
      |            THEN CAST(round("value" * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
      |  FROM events GROUP BY user_id),
      |m AS (
      |  SELECT
      |   CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
      |   CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |   CAST(sum(CASE WHEN variant = 0 THEN y ELSE 0 END) AS BIGINT) AS sy0,
      |   CAST(sum(CASE WHEN variant = 1 THEN y ELSE 0 END) AS BIGINT) AS sy1,
      |   CAST(sum(CASE WHEN variant = 0 THEN CAST(y AS HUGEINT) * y ELSE 0 END)
      |        AS DECIMAL(38,0)) AS syy0,
      |   CAST(sum(CASE WHEN variant = 1 THEN CAST(y AS HUGEINT) * y ELSE 0 END)
      |        AS DECIMAL(38,0)) AS syy1
      |  FROM pu),
      |v AS (
      |  SELECT *,
      |   CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS mean0,
      |   CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS mean1,
      |   (CAST(n0 AS DOUBLE) * CAST(syy0 AS DOUBLE)
      |      - CAST(sy0 AS DOUBLE) * CAST(sy0 AS DOUBLE))
      |     / (CAST(n0 AS DOUBLE) * (CAST(n0 AS DOUBLE) - 1.0)) AS var0,
      |   (CAST(n1 AS DOUBLE) * CAST(syy1 AS DOUBLE)
      |      - CAST(sy1 AS DOUBLE) * CAST(sy1 AS DOUBLE))
      |     / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)) AS var1
      |  FROM m),
      |w AS (
      |  SELECT *,
      |   var0 / CAST(n0 AS DOUBLE) AS se0,
      |   var1 / CAST(n1 AS DOUBLE) AS se1,
      |   var0 / CAST(n0 AS DOUBLE) + var1 / CAST(n1 AS DOUBLE) AS se2
      |  FROM v)
      |SELECT n0, n1, mean0, mean1, var0, var1,
      | CASE WHEN se2 = 0.0 THEN 0.0
      |      ELSE (mean1 - mean0) / sqrt(se2) END AS t,
      | CASE WHEN se2 = 0.0 THEN 0.0
      |      ELSE se2 * se2 / (se0 * se0 / (CAST(n0 AS DOUBLE) - 1.0)
      |                       + se1 * se1 / (CAST(n1 AS DOUBLE) - 1.0)) END AS df
      |FROM w""".stripMargin

  // ------------------------------------------------------------------
  // q173: Kaplan-Meier survival (time to first error, right-censored)
  // ------------------------------------------------------------------

  /** q173: the Kaplan-Meier product-limit estimator over the events
   *  table — survival = "how long until a user first hits an `error`
   *  event", right-censored at the user's last observed event when no
   *  error occurred. The standard reliability readout (Kaplan & Meier
   *  1958) an experimentation or SRE pipeline reports.
   *
   *  Determinism: durations floor to whole HOURS (exact integer div
   *  of micros), so the life table is a ≤721-row bounded-domain frame
   *  (the events corpus spans 30 days at every octave — ScaleGen
   *  replicates users, not time); d/c/n_risk are exact long counts.
   *  The cumulative product S(t) = Π (1−dᵢ/nᵢ) is carried as
   *  exp(Σ ln((nᵢ−dᵢ)/nᵢ)) over a window ORDERED BY t — both engines
   *  sum the SAME doubles in the SAME sequential order, so the sum
   *  (and its exp) is reproducible; each ln argument is ONE division
   *  of exact integers. n=d can only happen at the final row (later
   *  rows would contribute to n otherwise); guarded to survival=0
   *  identically in both engines rather than relying on ln(0)/exp
   *  semantics agreeing.
   *
   *  Scale: one events scan → per-user (first ts, first error, last
   *  ts) aggregate → hour-bucket aggregate; the windows run on the
   *  bounded life table, never on data-sized frames. */
  def q173KaplanMeier(s: SparkSession, d: String): DataFrame = {
    val perUser = events(s, d)
      .groupBy(col("user_id"))
      .agg(
        min(unix_micros(col("ts"))).as("t_first"),
        min(when(col("event_type") === "error", unix_micros(col("ts"))))
          .as("t_err"),
        max(unix_micros(col("ts"))).as("t_last"))
      .select(
        expr("(coalesce(t_err, t_last) - t_first) div 3600000000L")
          .as("t_hours"),
        when(col("t_err").isNotNull, 1L).otherwise(0L).as("ev"))
    kmLifeTable(perUser).orderBy(col("t_hours"))
  }

  /** The product-limit life table over a (t_hours, ev) duration frame
   *  — exposed so the spec can pin the estimator on textbook
   *  fixtures. Returns (t_hours, n_risk, n_events, n_censored,
   *  hazard, survival), one row per distinct duration. */
  def kmLifeTable(durations: DataFrame): DataFrame = {
    val g = durations.groupBy(col("t_hours"))
      .agg(sum(col("ev")).as("d_events"),
        sum(lit(1L) - col("ev")).as("c_events"))
    val ord = Window.orderBy(col("t_hours"))
    val upToPrev = ord.rowsBetween(Window.unboundedPreceding, -1)
    val upToCur = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val dbl = (c: org.apache.spark.sql.Column) => c.cast("double")
    g.withColumn("n_risk",
        sum(col("d_events") + col("c_events")).over(all)
          - coalesce(sum(col("d_events") + col("c_events")).over(upToPrev),
            lit(0L)))
      .withColumn("lnf",
        when(col("n_risk") > col("d_events"),
          log(dbl(col("n_risk") - col("d_events")) / dbl(col("n_risk"))))
          .otherwise(lit(0.0)))
      .select(col("t_hours"),
        col("n_risk"),
        col("d_events").as("n_events"),
        col("c_events").as("n_censored"),
        (dbl(col("d_events")) / dbl(col("n_risk"))).as("hazard"),
        when(col("n_risk") === col("d_events"), lit(0.0))
          .otherwise(exp(sum(col("lnf")).over(upToCur))).as("survival"))
  }

  val q173Sql: String =
    """WITH pu AS (
      |  SELECT user_id,
      |   min(epoch_us(ts)) AS t_first,
      |   min(CASE WHEN event_type = 'error' THEN epoch_us(ts) END) AS t_err,
      |   max(epoch_us(ts)) AS t_last
      |  FROM events GROUP BY user_id),
      |du AS (
      |  SELECT CAST((coalesce(t_err, t_last) - t_first) // 3600000000 AS BIGINT)
      |    AS t_hours,
      |   CASE WHEN t_err IS NOT NULL THEN 1 ELSE 0 END AS ev
      |  FROM pu),
      |g AS (
      |  SELECT t_hours, CAST(sum(ev) AS BIGINT) AS d_events,
      |   CAST(sum(1 - ev) AS BIGINT) AS c_events
      |  FROM du GROUP BY t_hours),
      |r AS (
      |  SELECT t_hours, d_events, c_events,
      |   CAST(sum(d_events + c_events) OVER ()
      |     - coalesce(sum(d_events + c_events) OVER (
      |         ORDER BY t_hours ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |       0) AS BIGINT) AS n_risk
      |  FROM g),
      |k AS (
      |  SELECT *,
      |   CASE WHEN n_risk > d_events
      |        THEN ln(CAST(n_risk - d_events AS DOUBLE) / CAST(n_risk AS DOUBLE))
      |        ELSE 0.0 END AS lnf
      |  FROM r)
      |SELECT t_hours, n_risk, d_events AS n_events, c_events AS n_censored,
      | CAST(d_events AS DOUBLE) / CAST(n_risk AS DOUBLE) AS hazard,
      | CASE WHEN n_risk = d_events THEN 0.0
      |      ELSE exp(sum(lnf) OVER (
      |        ORDER BY t_hours ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      | END AS survival
      |FROM k ORDER BY t_hours""".stripMargin

  // ------------------------------------------------------------------
  // q174: Benjamini-Hochberg FDR over per-segment conversion tests
  // ------------------------------------------------------------------

  /** q174: the multiple-comparisons layer real experimentation
   *  platforms put on top of per-metric tests — the q163
   *  two-proportion chi-squared run independently in 16 user
   *  segments, p-values from the chi²(1) tail, then Benjamini &
   *  Hochberg (1995) step-up FDR control at α = 0.10: rank the
   *  p-values, find the largest rank with p ≤ α·rank/m, flag
   *  everything at or below it, and report the monotone adjusted
   *  p-value min_{j≥i}(p⁽ʲ⁾·m/j).
   *
   *  Determinism: per-segment cells are exact longs (one scan → one
   *  per-user agg → one 16-row conditional agg); chi² is the q163
   *  closed form with the same pooled∈{0,1} guard. The chi²(1) upper
   *  tail is 2·Q(√chi²) with Q the Abramowitz-Stegun 26.2.17
   *  polynomial — evaluated with the IDENTICAL Horner association in
   *  both engines, so the only cross-engine exposure is last-ulp
   *  exp/sqrt variance (orders below the 1e-9 hash granularity; the
   *  suite's ln/sqrt precedent). Ranks order by (p, segment) so ties
   *  can never leave ordering to the engine. All windows run over
   *  exactly 16 rows — segment count is fixed by the operator, not
   *  the corpus. */
  def q174BhFdr(s: SparkSession, d: String): DataFrame = {
    val cut = to_timestamp(lit("2024-01-16 00:00:00"))
    val alpha = 0.10
    val perUser = events(s, d)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" && col("ts") >= cut
          && col("value") >= 120.0, 1L)
        .otherwise(0L)).as("converted"))
      .withColumn("segment", (col("user_id") % 16).cast("long"))
      .withColumn("variant", expr("(user_id div 16) % 2").cast("long"))
    val cell = perUser.groupBy(col("segment")).agg(
      sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n0"),
      sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(col("variant") === 0, col("converted")).otherwise(0L)).as("c0"),
      sum(when(col("variant") === 1, col("converted")).otherwise(0L)).as("c1"))
    val dbl = (n: String) => col(n).cast("double")
    // empty-cohort guard (found at the sf0.001 smoke octave, round 13):
    // a sparse segment can hold only one variant — user_id div 16 % 2
    // needs ≥32 users per segment to populate both arms — and an
    // unguarded rate divides by zero under ANSI. No evidence → chi2 0,
    // p ≈ 1, never a discovery; the oracle applies the identical CASE.
    val withChi = cell
      .withColumn("rate0",
        when(col("n0") === 0L, lit(0.0)).otherwise(dbl("c0") / dbl("n0")))
      .withColumn("rate1",
        when(col("n1") === 0L, lit(0.0)).otherwise(dbl("c1") / dbl("n1")))
      .withColumn("pooled", (dbl("c0") + dbl("c1")) / (dbl("n0") + dbl("n1")))
      .withColumn("chi2",
        when(col("n0") === 0L || col("n1") === 0L ||
            col("pooled") === 0.0 || col("pooled") === 1.0, lit(0.0))
          .otherwise(
            (col("rate0") - col("rate1")) * (col("rate0") - col("rate1"))
              / (col("pooled") * (lit(1.0) - col("pooled"))
                * (lit(1.0) / dbl("n0") + lit(1.0) / dbl("n1")))))
      .withColumn("zv", sqrt(col("chi2")))
      // A&S 26.2.17 normal upper tail, Horner form — keep this
      // association IDENTICAL to the SQL text below
      .withColumn("tv", lit(1.0) / (lit(1.0) + lit(0.2316419) * col("zv")))
      .withColumn("p", least(lit(1.0),
        lit(2.0) * (lit(0.3989422804014327)
          * exp(lit(-0.5) * col("zv") * col("zv")))
          * (col("tv") * (lit(0.319381530) + col("tv") * (lit(-0.356563782)
            + col("tv") * (lit(1.781477937) + col("tv") * (lit(-1.821255978)
              + col("tv") * lit(1.330274429))))))))
    bhStepUp(withChi, alpha)
      .select(col("segment"), col("n0"), col("c0"), col("n1"), col("c1"),
        col("chi2"), col("p"), col("rank"), col("p_adj"),
        col("is_discovery"))
      .orderBy(col("segment"))
  }

  /** Benjamini-Hochberg step-up over a (segment, p, ...) frame —
   *  exposed so the spec can pin the rank/threshold/adjustment logic
   *  on hand-built p-vectors. Adds (rank, p_adj, is_discovery);
   *  ranks tie-break on segment so ordering never depends on the
   *  engine. All windows run over the test frame, whose row count is
   *  the number of TESTS (fixed by the operator), not the corpus. */
  def bhStepUp(tests: DataFrame, alpha: Double): DataFrame = {
    val dbl = (n: String) => col(n).cast("double")
    val ord = Window.orderBy(col("p"), col("segment"))
    val all = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = tests
      .withColumn("rank", row_number().over(ord).cast("long"))
      .withColumn("m", count(lit(1)).over(all))
    val tail = Window.orderBy(col("rank"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    ranked
      .withColumn("p_adj", least(lit(1.0),
        min(col("p") * dbl("m") / dbl("rank")).over(tail)))
      .withColumn("disc_rank",
        max(when(col("p") <= lit(alpha) * dbl("rank") / dbl("m"), col("rank"))
          .otherwise(0L)).over(all))
      .withColumn("is_discovery", col("rank") <= col("disc_rank"))
      .drop("m", "disc_rank")
  }

  val q174Sql: String =
    """WITH pu AS (
      |  SELECT user_id, CAST(user_id % 16 AS BIGINT) AS segment,
      |   CAST((user_id // 16) % 2 AS BIGINT) AS variant,
      |   max(CASE WHEN event_type = 'purchase'
      |             AND ts >= TIMESTAMP '2024-01-16 00:00:00'
      |             AND "value" >= 120.0
      |       THEN 1 ELSE 0 END) AS converted
      |  FROM events GROUP BY user_id),
      |cell AS (
      |  SELECT segment,
      |   CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
      |   CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |   CAST(sum(CASE WHEN variant = 0 THEN converted ELSE 0 END) AS BIGINT) AS c0,
      |   CAST(sum(CASE WHEN variant = 1 THEN converted ELSE 0 END) AS BIGINT) AS c1
      |  FROM pu GROUP BY segment),
      |x AS (
      |  SELECT *,
      |   CASE WHEN n0 = 0 THEN 0.0
      |        ELSE CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) END AS rate0,
      |   CASE WHEN n1 = 0 THEN 0.0
      |        ELSE CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) END AS rate1,
      |   (CAST(c0 AS DOUBLE) + CAST(c1 AS DOUBLE))
      |     / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)) AS pooled
      |  FROM cell),
      |ch AS (
      |  SELECT *,
      |   CASE WHEN n0 = 0 OR n1 = 0 OR pooled = 0.0 OR pooled = 1.0 THEN 0.0
      |        ELSE (rate0 - rate1) * (rate0 - rate1)
      |          / (pooled * (1.0 - pooled)
      |            * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE)))
      |   END AS chi2
      |  FROM x),
      |zz AS (SELECT *, sqrt(chi2) AS zv FROM ch),
      |tt AS (SELECT *, 1.0 / (1.0 + 0.2316419 * zv) AS tv FROM zz),
      |pp AS (
      |  SELECT *, least(1.0,
      |   2.0 * (0.3989422804014327 * exp(-0.5 * zv * zv))
      |   * (tv * (0.319381530 + tv * (-0.356563782
      |     + tv * (1.781477937 + tv * (-1.821255978
      |       + tv * 1.330274429)))))) AS p
      |  FROM tt),
      |rk AS (
      |  SELECT *, CAST(row_number() OVER (ORDER BY p, segment) AS BIGINT) AS rank,
      |   CAST(count(*) OVER () AS BIGINT) AS m
      |  FROM pp),
      |adj AS (
      |  SELECT *,
      |   least(1.0, min(p * CAST(m AS DOUBLE) / CAST(rank AS DOUBLE)) OVER (
      |     ORDER BY rank ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |     AS p_adj,
      |   max(CASE WHEN p <= 0.10 * CAST(rank AS DOUBLE) / CAST(m AS DOUBLE)
      |            THEN rank ELSE 0 END) OVER () AS disc_rank
      |  FROM rk)
      |SELECT segment, n0, c0, n1, c1, chi2, p, rank, p_adj,
      | rank <= disc_rank AS is_discovery
      |FROM adj ORDER BY segment""".stripMargin

  // ------------------------------------------------------------------
  // q175: SPRT conversion monitor (Wald sequential test by hour)
  // ------------------------------------------------------------------

  /** q175: Wald's sequential probability ratio test as an hourly
   *  monitoring curve — the "peek as the data arrives without
   *  inflating error rates" readout real experimentation platforms
   *  run instead of a fixed-horizon test. H₀: conversion p₀ = 0.05
   *  vs H₁: p₁ = 0.07, α = β = 0.05; each treatment-arm user enters
   *  at the hour of their first post-cutover event, and after each
   *  hour the curve reports the cumulative log-likelihood ratio and
   *  the Wald decision (accept_h1 / accept_h0 / continue).
   *
   *  Determinism at ANY scale: because the hypotheses are fixed, the
   *  per-observation LLR increments are CONSTANTS — so the cumulative
   *  LLR is just convs·k₁ + (obs−convs)·k₀ with k₁ = ln(p₁/p₀) and
   *  k₀ = ln((1−p₁)/(1−p₀)) EMBEDDED AS EXACT DOUBLE LITERALS
   *  (identical bits in the Scala source and the SQL text — no ln is
   *  ever evaluated at runtime, so there is no cross-engine libm
   *  exposure and no float accumulation: two products and one sum of
   *  identical doubles per row, bit-identical at any octave). Counts
   *  are exact longs; the decision is a comparison of those
   *  bit-identical doubles against literal thresholds ±ln(19).
   *
   *  Scale: one events scan → per-user (entry hour, converted)
   *  aggregate → hour-bucket aggregate; the cumulative window runs on
   *  the ≤721-row bounded life table of hours (the corpus spans 30
   *  days at every octave), never on a data-sized frame. */
  def q175SprtMonitor(s: SparkSession, d: String): DataFrame = {
    val cut = to_timestamp(lit("2024-01-16 00:00:00"))
    val cutMicros = 1705363200000000L // 2024-01-16T00:00:00Z in micros
    val k1 = 0.336472236621213        // ln(0.07/0.05)
    val k0 = -0.02127739844728485     // ln(0.93/0.95)
    val waldA = 2.9444389791664403    // ln(0.95/0.05)
    val perUser = events(s, d)
      .filter(col("ts") >= cut && col("user_id") % 2 === 1)
      .groupBy(col("user_id"))
      .agg(
        min(unix_micros(col("ts"))).as("t_entry"),
        max(when(col("event_type") === "purchase"
          && col("value") >= 120.0, 1L).otherwise(0L)).as("converted"))
      .select(expr(s"(t_entry - ${cutMicros}L) div 3600000000L").as("h"),
        col("converted"))
    sprtCurve(perUser, k1, k0, waldA).orderBy(col("h"))
  }

  /** The hourly SPRT accumulation over an (h, converted) entry frame
   *  — exposed so the spec can pin the curve on hand-built cohorts.
   *  Returns (h, n_obs, n_conv, llr, decision). */
  def sprtCurve(entries: DataFrame, k1: Double, k0: Double,
      waldA: Double): DataFrame = {
    val byHour = entries.groupBy(col("h"))
      .agg(count(lit(1)).as("adds"), sum(col("converted")).as("convs"))
    val upToCur = Window.orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dbl = (c: org.apache.spark.sql.Column) => c.cast("double")
    byHour
      .withColumn("n_obs", sum(col("adds")).over(upToCur))
      .withColumn("n_conv", sum(col("convs")).over(upToCur))
      .withColumn("llr",
        dbl(col("n_conv")) * lit(k1)
          + dbl(col("n_obs") - col("n_conv")) * lit(k0))
      .select(col("h"), col("n_obs"), col("n_conv"), col("llr"),
        when(col("llr") >= lit(waldA), lit("accept_h1"))
          .when(col("llr") <= lit(-waldA), lit("accept_h0"))
          .otherwise(lit("continue")).as("decision"))
  }

  val q175Sql: String =
    """WITH pu AS (
      |  SELECT user_id,
      |   min(epoch_us(ts)) AS t_entry,
      |   max(CASE WHEN event_type = 'purchase' AND "value" >= 120.0
      |       THEN 1 ELSE 0 END) AS converted
      |  FROM events
      |  WHERE ts >= TIMESTAMP '2024-01-16 00:00:00' AND user_id % 2 = 1
      |  GROUP BY user_id),
      |hh AS (
      |  SELECT CAST((t_entry - 1705363200000000) // 3600000000 AS BIGINT) AS h,
      |   converted
      |  FROM pu),
      |g AS (
      |  SELECT h, CAST(count(*) AS BIGINT) AS adds,
      |   CAST(sum(converted) AS BIGINT) AS convs
      |  FROM hh GROUP BY h),
      |c AS (
      |  SELECT h,
      |   CAST(sum(adds) OVER (ORDER BY h
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_obs,
      |   CAST(sum(convs) OVER (ORDER BY h
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_conv
      |  FROM g),
      |l AS (
      |  SELECT *,
      |   CAST(n_conv AS DOUBLE) * 0.336472236621213
      |     + CAST(n_obs - n_conv AS DOUBLE) * -0.02127739844728485 AS llr
      |  FROM c)
      |SELECT h, n_obs, n_conv, llr,
      | CASE WHEN llr >= 2.9444389791664403 THEN 'accept_h1'
      |      WHEN llr <= -2.9444389791664403 THEN 'accept_h0'
      |      ELSE 'continue' END AS decision
      |FROM l ORDER BY h""".stripMargin
}
