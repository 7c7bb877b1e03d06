package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * ANALYZE-style table statistics: per-column row/null/distinct counts
 * in ONE scan — the stats a cost-based optimizer (and a data-quality
 * gate) wants per ingest. Works on any DataFrame, any schema.
 *
 * Scale: all per-column aggregates run in a single pass; the exact
 * multi-column distincts compile to Catalyst's Expand (one scan,
 * rows ×(N+1) into a partial-aggregated shuffle). That is the right
 * trade for routine tables; for a 100 TB fact table swap the exact
 * distinct for approx_count_distinct (the q38 HLL path) — same
 * single-scan shape, constant-size state per column. The final
 * unpivot (stack) runs on the ONE aggregated row, driver-free.
 */
object Analyze {

  /** (col_name, n_rows, n_null, n_distinct) per column of `df`.
    * n_distinct excludes nulls (SQL count(DISTINCT) semantics). */
  def tableStats(df: DataFrame): DataFrame = {
    val cols = df.columns.toSeq
    val aggs = count(lit(1)).as("__rows") +: cols.flatMap(c => Seq(
      count(col(c)).as(s"__nn_$c"),
      countDistinct(col(c)).as(s"__nd_$c")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', __rows - `__nn_$c`, `__nd_$c`")
      .mkString(", ")
    one.selectExpr("__rows AS n_rows",
        s"stack(${cols.length}, $stackArgs) AS (col_name, n_null, n_distinct)")
      .select(col("col_name"), col("n_rows"), col("n_null"), col("n_distinct"))
      .orderBy(col("col_name"))
  }

  /** q101: exact column statistics for the customer table. */
  def q101TableStats(s: SparkSession, d: String): DataFrame =
    tableStats(Tables.customer(s, d))

  val q101Sql: String =
    """SELECT * FROM (
      |  SELECT 'c_custkey' AS col_name, count(*) AS n_rows,
      |   count(*) - count(c_custkey) AS n_null,
      |   count(DISTINCT c_custkey) AS n_distinct FROM customer
      |  UNION ALL
      |  SELECT 'c_name', count(*), count(*) - count(c_name),
      |   count(DISTINCT c_name) FROM customer
      |  UNION ALL
      |  SELECT 'c_nationkey', count(*), count(*) - count(c_nationkey),
      |   count(DISTINCT c_nationkey) FROM customer
      |  UNION ALL
      |  SELECT 'c_acctbal', count(*), count(*) - count(c_acctbal),
      |   count(DISTINCT c_acctbal) FROM customer
      |  UNION ALL
      |  SELECT 'c_mktsegment', count(*), count(*) - count(c_mktsegment),
      |   count(DISTINCT c_mktsegment) FROM customer) t
      |ORDER BY col_name""".stripMargin

  // ------------------------------------------------------------------
  // q105: per-group OLS trend (slope/intercept from exact integer sums)
  // ------------------------------------------------------------------

  /** Per-group simple linear regression y = slope·x + intercept via the
    * closed form, computed from EXACT integer moment sums rather than
    * `regr_slope` — floating-point moment accumulation is
    * order-dependent, so the built-in would hash-differ across engines
    * and partitionings; integer sums are associative and exact.
    *
    * Scale: ONE scan + one hash aggregate per group (map-side partial
    * combine); the five moments are constant-size state. Per-row
    * products are int64 (x ≤ ~10⁵ · y ≤ ~10⁹ headroom); the SUMS are
    * decimal(38,0), overflow-free past 10²⁰ — safe for 100 TB row
    * counts where an int64 Σxy would overflow. The closed form runs on
    * the one aggregated row per group. The division ships RAW (exact
    * decimal sums → bit-identical doubles → IEEE-identical quotient
    * across engines; rounding a rational is the known hazard). */
  def trendRegression(df: DataFrame, key: Column, x: Column, y: Column): DataFrame = {
    val dec = "decimal(38,0)"
    df.select(key.as("k"), x.cast("long").as("x"), y.cast("long").as("y"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum((col("x") * col("x")).cast(dec)).as("sxx"),
        sum((col("x") * col("y")).cast(dec)).as("sxy"))
      .withColumn("slope",
        (col("n").cast("double") * col("sxy").cast("double")
          - col("sx").cast("double") * col("sy").cast("double"))
        / (col("n").cast("double") * col("sxx").cast("double")
          - col("sx").cast("double") * col("sx").cast("double")))
      .withColumn("intercept",
        (col("sy").cast("double") - col("slope") * col("sx").cast("double"))
          / col("n").cast("double"))
  }

  /** q105: price-vs-quantity trend per return flag — slope/intercept of
    * extendedprice (cents) against quantity over lineitem. */
  def q105TrendRegression(s: SparkSession, d: String): DataFrame =
    trendRegression(Tables.lineitem(s, d),
        col("l_returnflag"), round(col("l_quantity")), Tables.cents(col("l_extendedprice")))
      .select(col("k").as("l_returnflag"), col("n"), col("slope"), col("intercept"))
      .orderBy(col("l_returnflag"))

  val q105Sql: String =
    """WITH m AS (
      |  SELECT l_returnflag, count(*) AS n,
      |   CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |   CAST(sum(x*x) AS DECIMAL(38,0)) AS sxx,
      |   CAST(sum(x*y) AS DECIMAL(38,0)) AS sxy
      |  FROM (SELECT l_returnflag,
      |         CAST(round(l_quantity) AS BIGINT) AS x,
      |         CAST(round(l_extendedprice*100) AS BIGINT) AS y
      |        FROM lineitem) t
      |  GROUP BY l_returnflag),
      |sl AS (
      |  SELECT *,
      |   (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |   / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope
      |  FROM m)
      |SELECT l_returnflag, n, slope,
      | (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept
      |FROM sl ORDER BY l_returnflag""".stripMargin

  // ------------------------------------------------------------------
  // q106: distribution-drift score (PSI) between two corpus slices
  // ------------------------------------------------------------------

  /** The ONE Laplace-smoothed share rule shared by every PSI consumer
    * (q106, q141): (n+1)/(tot+k). Centralized so the smoothing can
    * never silently diverge from the oracle SQL's spelling. */
  private[graft] def laplaceShare(n: Column, tot: Column, k: Column): Column =
    (n + lit(1)) / (tot.cast("double") + k)

  /** One PSI term quantized to integer micro-nats BEFORE summing (the
    * q79 rule: ln() output is irrational, so round() is boundary-safe
    * and the integer sum is order-free across partitionings). */
  private[graft] def psiMicro(p: Column, q: Column): Column =
    round((p - q) * log(p / q) * 1e6).cast("long")

  /** Complete the (a, b) count grid: every distinct a × every distinct
    * b, `cnt` filled 0 where absent — the shape q140's CDF grid and
    * q141's smoothed shares both need (a missing cell still carries a
    * smoothed probability / CDF step). */
  private[graft] def completeGrid(df: DataFrame, a: String, b: String,
      cnt: String): DataFrame =
    df.select(col(a)).distinct()
      .crossJoin(df.select(col(b)).distinct())
      .join(df, Seq(a, b), "left").na.fill(0L, Seq(cnt))

  /** q106: population stability index between two halves of the corpus
    * (even- vs odd-numbered sources) over document-length buckets — the
    * standard drift monitor between a reference and a candidate data
    * slice before a training run.
    *
    * Determinism: bucket shares are Laplace-smoothed RAW divisions of
    * exact counts (bit-identical doubles across engines); each bucket's
    * PSI term is quantized to integer micro-nats BEFORE the total sum
    * (the q79 rule: ln() output is irrational, so round() is
    * boundary-safe, and the integer sum is order-free).
    *
    * Scale: one corpus scan into a bucket-count hash aggregate (bucket
    * cardinality is fixed by the width, not the data); everything after
    * runs on bucket-count rows. The two totals come from window sums
    * over that tiny frame, not a second scan. */
  def q106DriftPsi(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all = Window.partitionBy(lit(1))
    val buckets = Tables.documents(s, d)
      .select(floor(col("n_chars") / 100).cast("long").as("bucket"),
        (substring(col("source"), 4, 10).cast("int") % 2 === 0).as("is_a"))
      .groupBy(col("bucket"))
      .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("is_a"), 1L).otherwise(0L)).as("n_b"))
      .withColumn("tot_a", sum(col("n_a")).over(all))
      .withColumn("tot_b", sum(col("n_b")).over(all))
      .withColumn("n_buckets", count(lit(1)).over(all))
      .withColumn("p_a", laplaceShare(col("n_a"), col("tot_a"), col("n_buckets")))
      .withColumn("p_b", laplaceShare(col("n_b"), col("tot_b"), col("n_buckets")))
      .withColumn("psi_micro", psiMicro(col("p_a"), col("p_b")))
    buckets
      .select(col("bucket"), col("n_a"), col("n_b"), col("p_a"), col("p_b"), col("psi_micro"))
      .union(buckets.groupBy()
        .agg(sum(col("n_a")).as("n_a"), sum(col("n_b")).as("n_b"),
          sum(col("psi_micro")).as("psi_micro"))
        .select(lit(-1L).as("bucket"), col("n_a"), col("n_b"),
          lit(1.0).as("p_a"), lit(1.0).as("p_b"), col("psi_micro")))
      .orderBy(col("bucket"))
  }

  val q106Sql: String =
    """WITH b AS (
      |  SELECT CAST(floor(n_chars / 100) AS BIGINT) AS bucket,
      |   CAST(count(CASE WHEN CAST(substring(source, 4) AS INT) % 2 = 0 THEN 1 END) AS BIGINT) AS n_a,
      |   CAST(count(CASE WHEN CAST(substring(source, 4) AS INT) % 2 <> 0 THEN 1 END) AS BIGINT) AS n_b
      |  FROM documents GROUP BY 1),
      |p AS (
      |  SELECT bucket, n_a, n_b,
      |   (n_a + 1) / (CAST(sum(n_a) OVER () AS DOUBLE) + count(*) OVER ()) AS p_a,
      |   (n_b + 1) / (CAST(sum(n_b) OVER () AS DOUBLE) + count(*) OVER ()) AS p_b
      |  FROM b),
      |t AS (
      |  SELECT bucket, n_a, n_b, p_a, p_b,
      |   CAST(round((p_a - p_b) * ln(p_a / p_b) * 1e6) AS BIGINT) AS psi_micro
      |  FROM p)
      |SELECT * FROM t
      |UNION ALL
      |SELECT -1, CAST(sum(n_a) AS BIGINT), CAST(sum(n_b) AS BIGINT), 1.0, 1.0,
      | CAST(sum(psi_micro) AS BIGINT) FROM t
      |ORDER BY bucket""".stripMargin

  // ------------------------------------------------------------------
  // q107: robust outlier detection (median / MAD)
  // ------------------------------------------------------------------

  /** q107: per-event-type robust outlier counts — median and MAD
    * (median absolute deviation) with the 1.4826 consistency constant,
    * flagging |x − med| > 3σ̂. Robust stats are the right screen for
    * heavy-tailed telemetry where mean/stddev are dragged by the very
    * outliers being hunted.
    *
    * Determinism: values are quantized to integer cents first, so the
    * exact interpolated medians land on dyadic rationals ((a+b)/2 of
    * exact ints) that both engines represent bit-identically; the
    * threshold compare then runs on identical doubles.
    *
    * Scale: exact `percentile` materializes each group's values on the
    * reducer — acceptable while group cardinality is bounded (5 event
    * types here); a 100 TB deployment swaps in approx_percentile (the
    * q44 sketch path) with this same two-join shape. The per-group
    * medians are joined BACK as a broadcast (tiny agg side), keeping
    * both corpus passes scan-parallel — deliberately NOT a window over
    * the low-cardinality key, which would funnel the table through ≤5
    * reducer partitions. */
  def q107OutlierMad(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .filter(col("value").isNotNull && col("event_type").isNotNull)
      .select(col("event_type"), Tables.cents(col("value")).cast("double").as("v"))
    val med = ev.groupBy(col("event_type"))
      .agg(expr("percentile(v, 0.5)").as("med"))
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("v") - col("med")))
    val mad = dev.groupBy(col("event_type"))
      .agg(max(col("med")).as("med"), expr("percentile(dev, 0.5)").as("mad"))
    dev.drop("med").join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), max(col("med")).as("med"), max(col("mad")).as("mad"),
        sum(when(col("dev") > lit(3.0) * lit(1.4826) * col("mad"), 1L).otherwise(0L)).as("n_out"))
      .orderBy(col("event_type"))
  }

  val q107Sql: String =
    """WITH ev AS (
      |  SELECT event_type, CAST(CAST(round("value"*100) AS BIGINT) AS DOUBLE) AS v
      |  FROM events WHERE "value" IS NOT NULL AND event_type IS NOT NULL),
      |med AS (SELECT event_type, quantile_cont(v, 0.5) AS med FROM ev GROUP BY 1),
      |dev AS (SELECT ev.event_type, v, med, abs(v - med) AS dev
      |        FROM ev JOIN med USING (event_type)),
      |mad AS (SELECT event_type, max(med) AS med, quantile_cont(dev, 0.5) AS mad
      |        FROM dev GROUP BY 1)
      |SELECT d.event_type, count(*) AS n, max(m.med) AS med, max(m.mad) AS mad,
      | CAST(count(CASE WHEN d.dev > 3.0 * 1.4826 * m.mad THEN 1 END) AS BIGINT) AS n_out
      |FROM dev d JOIN mad m USING (event_type)
      |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin

  // ------------------------------------------------------------------
  // q112: equi-depth histogram (CBO / data-skipping statistics)
  // ------------------------------------------------------------------

  /** q112: equi-depth (quartile) histogram of extendedprice — the
    * statistic a cost-based optimizer keeps per column for selectivity
    * estimation, and the boundary set a data-skipping layout (q82's
    * z-order, file min/max envelopes) clusters against. Equi-DEPTH,
    * not equi-width: each bucket holds ~25 % of rows regardless of
    * value skew.
    *
    * Determinism: values are integer cents, so the exact interpolated
    * quartiles are dyadic rationals both engines represent
    * bit-identically (the q107 rule), and the ≤-boundary bucket
    * assignment runs on identical doubles.
    *
    * Scale: ONE pass computes the boundaries (exact `percentile` here
    * for oracle parity; approx_percentile — the q44 sketch — at 100 TB,
    * constant state either way), the 1-row boundary frame broadcasts
    * into a second scan-parallel pass for assignment + per-bucket
    * aggregation. No global sort, no single-partition window — the
    * trap an ntile() formulation would hit. */
  def q112HistogramEquidepth(s: SparkSession, d: String): DataFrame = {
    val v = Tables.lineitem(s, d)
      .select(Tables.cents(col("l_extendedprice")).cast("double").as("v"))
    // ONE percentile aggregate for all three cuts: three scalar
    // percentile() calls each buffer + merge + sort the full value
    // set independently (3× the aggregation cost, measured ~2× the
    // query wall at sf0.1); the array form shares one buffer
    val bounds = v.agg(expr("percentile(v, array(0.25, 0.5, 0.75))").as("qs"))
      .select(element_at(col("qs"), 1).as("q1"),
        element_at(col("qs"), 2).as("q2"),
        element_at(col("qs"), 3).as("q3"))
    v.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        when(col("v") <= col("q1"), 1L).when(col("v") <= col("q2"), 2L)
          .when(col("v") <= col("q3"), 3L).otherwise(4L))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("v")).cast("long").as("lo"), max(col("v")).cast("long").as("hi"))
      .orderBy(col("bucket"))
  }

  val q112Sql: String =
    """WITH v AS (
      |  SELECT CAST(CAST(round(l_extendedprice*100) AS BIGINT) AS DOUBLE) AS v
      |  FROM lineitem),
      |b AS (SELECT quantile_cont(v, 0.25) AS q1, quantile_cont(v, 0.5) AS q2,
      |       quantile_cont(v, 0.75) AS q3 FROM v)
      |SELECT CAST(CASE WHEN v <= q1 THEN 1 WHEN v <= q2 THEN 2
      |            WHEN v <= q3 THEN 3 ELSE 4 END AS BIGINT) AS bucket,
      | count(*) AS n, CAST(min(v) AS BIGINT) AS lo, CAST(max(v) AS BIGINT) AS hi
      |FROM v, b GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  // q117: 2D skyline (Pareto frontier)
  // ---------------------------------------------------------------

  /** 2D skyline of (id, x, y) rows, both dimensions maximized: a row
   *  survives iff no other row is ≥ in both dimensions and > in at
   *  least one. Exact-duplicate (x, y) rows are mutually
   *  non-dominating and all survive (strict-dominance semantics —
   *  the NOT EXISTS definition).
   *
   *  Distributed shape: the skyline of a union is contained in the
   *  union of per-part skylines, so each partition prunes locally
   *  with an O(p log p) sort-sweep (sort by x desc, y desc; an
   *  equal-x group survives iff its max y beats the running max y of
   *  all strictly-greater x). The survivors are then RANGE-
   *  partitioned on x (equal x co-located) and swept within each
   *  range; the only cross-range fact a point needs is the max y of
   *  every strictly-higher-x range — ranges are disjoint in x, so a
   *  higher range's point dominates iff its y ≥ mine. That suffix
   *  max is ONE value per range partition: a bounded driver
   *  reduction (O(#partitions), never O(frontier)), broadcast back
   *  as the final cut. No all-pairs join, no corpus-wide
   *  single-partition stage — even on fully anti-correlated data
   *  (every local frontier O(partition)) the largest single task is
   *  one range's share of the frontier union. */
  def skyline2d(pts: DataFrame): DataFrame = {
    val sess = pts.sparkSession
    import sess.implicits._
    def sweep(it: Iterator[(Long, Long, Long)]): Iterator[(Long, Long, Long)] = {
      val rows = it.toArray.sortBy { case (id, x, y) => (-x, -y, id) }
      val out = Array.newBuilder[(Long, Long, Long)]
      var best = Long.MinValue
      var i = 0
      while (i < rows.length) {
        val x = rows(i)._2
        val groupMaxY = rows(i)._3 // first of the equal-x group (y desc)
        var j = i
        while (j < rows.length && rows(j)._2 == x) {
          if (rows(j)._3 == groupMaxY && groupMaxY > best) out += rows(j)
          j += 1
        }
        if (groupMaxY > best) best = groupMaxY
        i = j
      }
      out.result().iterator
    }
    val typed = pts.as[(Long, Long, Long)]
    val local = typed.mapPartitions(sweep)
    // phase 2: disjoint x ranges (ascending pid = ascending x), local
    // sweep per range, tagged with the range id for the cross-cut
    val swept = local.repartitionByRange(local.col("_2"))
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        sweep(it).map { case (id, x, y) => (pid, id, x, y) }
      }
      .toDF("pid" +: pts.columns: _*)
      // two actions read this frame (the pid-max reduction and the
      // final cut); checkpoint so the scan+sweeps+shuffle run once —
      // the blocks stay DISTRIBUTED (executor-resident), only the
      // per-partition maxima ever reach the driver
      .localCheckpoint(true)
    // bounded driver reduction: one (pid, max y) per range partition →
    // suffix max over strictly-higher ranges, broadcast back
    val maxYByPid = swept.groupBy(col("pid"))
      .agg(max(col(pts.columns(2))).as("m"))
      .as[(Int, Long)].collect()
    var run = Option.empty[Long]
    val above: Seq[(Int, Option[Long])] =
      maxYByPid.sortBy(-_._1).map { case (pid, m) =>
        val r = pid -> run
        run = Some(run.fold(m)(math.max(_, m)))
        r
      }.toSeq
    val aboveDf = above.toDF("pid", "y_above")
    swept.join(broadcast(aboveDf), Seq("pid"), "left")
      .filter(col("y_above").isNull || col(pts.columns(2)) > col("y_above"))
      .drop("pid", "y_above")
      .orderBy(col(pts.columns(1)).desc, col(pts.columns(2)).desc,
        col(pts.columns(0)))
  }

  /** q117: the customer Pareto frontier on (total spend, order
   *  count) — "no other customer both spends more and orders more".
   *  Spend is exact cents; the frontier is a set, so the result is
   *  partitioning-independent. */
  def q117Skyline(s: SparkSession, d: String): DataFrame = {
    val agg = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sum(Tables.cents(col("o_totalprice"))).as("spend_cents"),
        count(lit(1)).as("n_orders"))
      .select(col("o_custkey"), col("spend_cents"), col("n_orders"))
    skyline2d(agg)
  }

  /** Oracle: the window formulation — an equal-spend group survives
   *  iff its max order-count beats every strictly-higher-spend row's
   *  count (integer RANGE frame = strict dominance). Equivalent to
   *  NOT EXISTS but linearithmic, so the selfcheck stays feasible at
   *  the derived 10×/100× octaves. */
  val q117Sql: String =
    """WITH agg AS (
      |  SELECT o_custkey,
      |   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend_cents,
      |   count(*) AS n_orders
      |  FROM orders GROUP BY 1),
      |w AS (
      |  SELECT o_custkey, spend_cents, n_orders,
      |   max(n_orders) OVER (ORDER BY spend_cents
      |     RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS best_above,
      |   max(n_orders) OVER (PARTITION BY spend_cents) AS group_max
      |  FROM agg)
      |SELECT o_custkey, spend_cents, n_orders
      |FROM w
      |WHERE n_orders = group_max
      |  AND (best_above IS NULL OR group_max > best_above)
      |ORDER BY spend_cents DESC, n_orders DESC, o_custkey""".stripMargin

  // ---------------------------------------------------------------
  // q118: CUSUM change-point statistic
  // ---------------------------------------------------------------

  /** q118: CUSUM over the daily event-count series — the classic
   *  level-shift detector: S_k = Σ_{i≤k}(x_i − mean). To keep every
   *  engine exact, the deviations are scaled by the day count D:
   *  D·S_k = D·prefix_k − k·T (T = total events) — pure int64
   *  arithmetic, no rational mean. The |S| argmax row is flagged as
   *  the change point (ties → earliest day).
   *
   *  Scale: the corpus-sized work is ONE hash aggregate to (day, n);
   *  the window then runs over the day-count-sized series (≤ a few
   *  thousand rows for years of data) — a deliberately tiny
   *  single-partition tail, not a corpus-wide one. */
  def q118Cusum(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val tot = daily.agg(sum(col("n")).as("t"), count(lit(1)).as("d"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val series = daily.crossJoin(broadcast(tot))
      .withColumn("k", count(lit(1)).over(
        Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cusum_d", sum(col("n")).over(w) * col("d") - col("k") * col("t"))
    val peak = series.agg(max(abs(col("cusum_d"))).as("peak"))
    val firstHit = series.crossJoin(broadcast(peak))
      .filter(abs(col("cusum_d")) === col("peak"))
      .agg(min(col("day")).as("cp"))
    series.crossJoin(broadcast(firstHit))
      .select(col("day"), col("n"), col("cusum_d"),
        (col("day") === col("cp")).cast("int").as("is_changepoint"))
      .orderBy(col("day"))
  }

  val q118Sql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, count(*) AS n FROM events GROUP BY 1),
      |tot AS (SELECT sum(n) AS t, count(*) AS d FROM daily),
      |series AS (
      |  SELECT day, n,
      |   CAST(sum(n) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * d
      |     - row_number() OVER (ORDER BY day) * t AS BIGINT) AS cusum_d
      |  FROM daily, tot),
      |peak AS (SELECT max(abs(cusum_d)) AS p FROM series),
      |first_hit AS (SELECT min(day) AS cp FROM series, peak WHERE abs(cusum_d) = p)
      |SELECT day, n, cusum_d,
      | CAST(CASE WHEN day = cp THEN 1 ELSE 0 END AS INT) AS is_changepoint
      |FROM series, first_hit
      |ORDER BY day""".stripMargin

  // ---------------------------------------------------------------
  // q128: materialized HLL sketch table + mergeable rollup
  // ---------------------------------------------------------------

  /** q128: the mergeable-sketch serving pattern — per-DAY HLL
   *  sketches of distinct users are materialized ONCE as a durable
   *  parquet table (a binary sketch column), then the weekly
   *  distinct-user question is answered by UNIONING the daily
   *  sketches (register-wise max — associative, commutative, and
   *  order-free) WITHOUT rescanning the event stream. The q65-style
   *  gate bounds the estimate within 5% of the exact count per week.
   *
   *  Scale: this is THE pattern for serving distinct counts over a
   *  100 TB event store — the raw scan happens once at ingest
   *  (append-only daily partitions), every range query afterwards
   *  touches only days×|sketch| bytes (4 KB per day at lgK=12
   *  regardless of cardinality). The exact side here exists only to
   *  power the gate, exactly as in q65. */
  def q128SketchRollup(s: SparkSession, d: String): DataFrame = {
    val dir = InferOps.tmpPath("hll_daily", d)
    val ev = Tables.events(s, d)
      .select(to_date(col("ts")).as("day"),
        to_date(date_trunc("week", col("ts"))).as("week"), col("user_id"))
    ev.groupBy(col("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .write.mode("overwrite").parquet(dir)
    val est = s.read.parquet(dir)
      .withColumn("week", to_date(date_trunc("week", col("day"))))
      .groupBy(col("week"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val exact = ev.groupBy(col("week"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    est.join(exact, "week")
      .select(col("week"), col("exact_users"),
        (abs(col("est") - col("exact_users")) <= col("exact_users") * 0.05).as("ok"))
      .orderBy(col("week"))
  }

  val q128Sql: String =
    """SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
      | count(DISTINCT user_id) AS exact_users, true AS ok
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------
  // q140: exact two-sample Kolmogorov–Smirnov drift, all source pairs
  // ------------------------------------------------------------------

  /** Exact two-sample KS distance D = max over v of |F_a(v) − F_b(v)|
    * for EVERY unordered pair of groups, over an integer-valued
    * measurement. The nonparametric companion to q106's binned PSI: no
    * bucket-width tuning, and D is the statistic behind the classical
    * distribution-equality test — the per-source-pair drift screen a
    * curation pipeline runs when deciding whether two crawls can share
    * one mixing weight.
    *
    * Scale design: one scan → (group, value) count aggregate (map-side
    * partials); the empirical CDFs materialize on the groups×values
    * GRID (broadcast of the tiny group dim against the distinct-value
    * frame — every group needs a step at every observed value or the
    * pairwise diff under-samples the sup). The CDF window runs per
    * group — parallelism bounded by |groups|, rows per group bounded
    * by the VALUE DOMAIN, not the corpus (n_chars here; an unbounded
    * domain should be bucketed first, q106's trade, or the grid itself
    * explodes). The pairwise sup is an equi-join on value + a max
    * aggregate: |pairs|·|values| rows, never corpus².
    *
    * Determinism: CDFs are raw divisions of exact long counts
    * (bit-identical IEEE doubles across engines — the q105 rule);
    * max(abs(diff)) over identical double sets is order-free. */
  def ksAllPairs(df: DataFrame, groupCol: Column, valueCol: Column): DataFrame = {
    // a NULL value carries no position on the real line: admitting it
    // would inflate every cumulative count (Spark sorts nulls first)
    // while the SQL twin (nulls last) would not — drop both null
    // groups and null values so the empirical CDFs are well-defined
    val counts = df.select(groupCol.as("g"), valueCol.cast("long").as("v"))
      .filter(col("g").isNotNull && col("v").isNotNull)
      .groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
    val groups = counts.select(col("g")).distinct()
    val values = counts.select(col("v")).distinct()
    val totals = counts.groupBy(col("g")).agg(sum(col("c")).as("n"))
    val byV = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v"))
    val cdf = values.crossJoin(broadcast(groups))
      .join(counts, Seq("g", "v"), "left").na.fill(0L, Seq("c"))
      .join(broadcast(totals), Seq("g"))
      .withColumn("cdf",
        sum(col("c")).over(byV).cast("double") / col("n").cast("double"))
      .select(col("g"), col("v"), col("cdf"))
    cdf.as("a")
      .join(cdf.as("b"),
        col("a.v") === col("b.v") && col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("source_a"), col("b.g").as("source_b"))
      .agg(max(abs(col("a.cdf") - col("b.cdf"))).as("ks_d"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** q140: KS drift between every pair of document sources over the
    * document-length distribution. */
  def q140KsDrift(s: SparkSession, d: String): DataFrame =
    ksAllPairs(Tables.documents(s, d), col("source"), col("n_chars"))

  val q140Sql: String =
    """WITH counts AS (
      |  SELECT source AS g, CAST(n_chars AS BIGINT) AS v, count(*) AS c
      |  FROM documents GROUP BY 1, 2),
      |grid AS (
      |  SELECT gs.g, vs.v FROM (SELECT DISTINCT g FROM counts) gs,
      |   (SELECT DISTINCT v FROM counts) vs),
      |filled AS (
      |  SELECT grid.g, grid.v, COALESCE(counts.c, 0) AS c
      |  FROM grid LEFT JOIN counts ON grid.g = counts.g AND grid.v = counts.v),
      |cdf AS (
      |  SELECT g, v,
      |   CAST(sum(c) OVER (PARTITION BY g ORDER BY v) AS DOUBLE)
      |     / CAST(sum(c) OVER (PARTITION BY g) AS DOUBLE) AS cdf
      |  FROM filled)
      |SELECT a.g AS source_a, b.g AS source_b, max(abs(a.cdf - b.cdf)) AS ks_d
      |FROM cdf a JOIN cdf b ON a.v = b.v AND a.g < b.g
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------------
  // q142: Spearman rank agreement between quality signals, per group
  // ------------------------------------------------------------------

  /** Spearman rank correlation ρ = 1 − 6·Σd²/(n(n²−1)) between two
    * signals within each group — the signal-agreement audit a curation
    * pipeline runs before trusting a cheap proxy signal in place of an
    * expensive one (if length rank-orders documents like the quality
    * score does, the cheap signal can gate first at 100 TB).
    *
    * Ranks are row_number over (signal, tiebreak) — a deterministic
    * PERMUTATION rank, so ρ is an exact function of the data with no
    * average-rank tie rationals; the tie-break choice is part of the
    * operator's contract and mirrored in the oracle. Σd² is an exact
    * long sum (map-side partials after the two rank windows, which
    * share one partition-by-group sort exchange); the final ρ division
    * ships RAW (exact integers → bit-identical IEEE doubles across
    * engines — the q105 rule).
    *
    * Scale: two window passes over one group-partitioned exchange +
    * one hash aggregate; parallelism is bounded by |groups| in the
    * window stage (the q140 caveat) but rows stream through — nothing
    * is quadratic and no state exceeds the group's row count. */
  def spearman(df: DataFrame, g: Column, x: Column, y: Column,
      tie: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = df.select(g.as("g"), x.as("x"), y.as("y"), tie.as("t"))
    val rx = row_number().over(
      Window.partitionBy(col("g")).orderBy(col("x"), col("t")))
    val ry = row_number().over(
      Window.partitionBy(col("g")).orderBy(col("y"), col("t")))
    keyed
      .withColumn("d", rx.cast("long") - ry.cast("long"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_docs"), sum(col("d") * col("d")).as("sum_d2"))
      .withColumn("rho",
        when(col("n_docs") > 1,
          lit(1.0) - lit(6.0) * col("sum_d2") /
            (col("n_docs") * (col("n_docs") * col("n_docs") - lit(1.0)))))
      .orderBy(col("g"))
  }

  /** q142: does document LENGTH rank-order a source's documents the
    * way the q29 quality score does? One row per source. */
  def q142SignalAgreement(s: SparkSession, d: String): DataFrame =
    spearman(
      Tables.documents(s, d).withColumn("q",
        TextAnalysis.qualityScore(col("text"))),
      col("source"), col("n_chars"), col("q"), col("doc_id"))
      .withColumnRenamed("g", "source")

  val q142Sql: String = {
    val stop = TextAnalysis.StopWords
      .map(w => s"len(regexp_extract_all(lower(text), '\\b$w\\b'))").mkString(" + ")
    s"""WITH s AS (
       |  SELECT source, doc_id, n_chars,
       |   least(len(regexp_extract_all(text, '[^ \\t\\n\\v\\f\\r]+')), 100)
       |    + 2*($stop)
       |    - len(regexp_extract_all(text, '[^A-Za-z0-9 \\t\\n\\v\\f\\r]')) AS q
       |  FROM documents),
       |r AS (
       |  SELECT source,
       |   row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rx,
       |   row_number() OVER (PARTITION BY source ORDER BY q, doc_id) AS ry
       |  FROM s)
       |SELECT source, count(*) AS n_docs,
       | CAST(sum((rx - ry) * (rx - ry)) AS BIGINT) AS sum_d2,
       | CASE WHEN count(*) > 1 THEN
       |  1.0 - 6.0 * sum((rx - ry) * (rx - ry))
       |   / (count(*) * (count(*) * count(*) - 1.0)) END AS rho
       |FROM r GROUP BY source ORDER BY source""".stripMargin
  }
}
