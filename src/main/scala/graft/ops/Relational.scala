package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Relational operator suite over the TPC-H-ish testdata — the query
 * surface the reference lacks entirely (SURVEY.md §2.6): projections,
 * filters, joins (broadcast/shuffle, semi/anti), aggregations
 * (hash, distinct, rollup), windows, sorts/limits, set ops.
 *
 * Scale notes (100 TB design): every query is fully declarative so
 * Catalyst pushes filters/pruning into the parquet scan; dimension
 * joins broadcast explicitly; revenue sums use integral cents
 * (Tables.cents) so results are order-independent → partial (map-side)
 * aggregation stays exact at any parallelism.
 */
object Relational {
  import Tables._

  /** TPC-H Q1-style pricing summary: hash aggregate with map-side
   *  partials; filter pushed to parquet scan. */
  def q01PricingSummary(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(to_date(col("l_shipdate")) <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        (sum(cents(col("l_extendedprice"))) / 100.0).as("sum_base_price"),
        (sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))) / 100.0).as("sum_disc_price"),
        // raw: the sum is exact in double (integer-valued quantities),
        // so S/n is the identical double in both engines; round(…,6)
        // on the rational risks a 7th-decimal half-boundary split
        avg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      | sum(l_quantity) AS sum_qty,
      | CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)/100.0 AS sum_base_price,
      | CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT)/100.0 AS sum_disc_price,
      | avg(l_quantity) AS avg_qty,
      | count(*) AS count_order
      |FROM lineitem
      |WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q6-style forecast revenue: selective scan → scalar agg.
   *  The three predicates all push down to the parquet reader. */
  def q02ScanRevenue(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(to_date(col("l_shipdate")) >= lit("1996-01-01") &&
        to_date(col("l_shipdate")) < lit("1997-01-01") &&
        col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
      .agg(
        (sum(cents(col("l_extendedprice") * col("l_discount"))) / 100.0).as("revenue"),
        count(lit(1)).as("n_rows"))

  val q02Sql: String =
    """SELECT
      | CAST(sum(CAST(round(l_extendedprice*l_discount*100) AS BIGINT)) AS BIGINT)/100.0 AS revenue,
      | count(*) AS n_rows
      |FROM lineitem
      |WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      |  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
      |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24""".stripMargin

  /** Star join: fact ⋈ orders ⋈ customer (customer broadcast), revenue
   *  by market segment × order status. */
  def q03SegmentRevenue(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderstatus"))
      .agg(
        (sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))) / 100.0).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("c_mktsegment"), col("o_orderstatus"))

  val q03Sql: String =
    """SELECT c_mktsegment, o_orderstatus,
      | CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT)/100.0 AS revenue,
      | count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment, o_orderstatus
      |ORDER BY c_mktsegment, o_orderstatus""".stripMargin

  /** Snowflake dimension joins, all broadcast: part, supplier →
   *  nation → region. One shuffle total (the final aggregate). */
  def q04RegionBrand(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("p_brand"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        (sum(cents(col("l_extendedprice"))) / 100.0).as("gross"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("p_brand"))

  val q04Sql: String =
    """SELECT r_name, p_brand,
      | sum(l_quantity) AS sum_qty,
      | CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)/100.0 AS gross,
      | count(*) AS n_items
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, p_brand
      |ORDER BY r_name, p_brand""".stripMargin

  /** Top-3 orders per priority: rank inside window, ties broken by
   *  key for determinism. */
  def q05TopKPerGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("o_orderpriority"), col("rnk"), col("o_orderkey"),
        (cents(col("o_totalprice")) / 100.0).as("totalprice"))
      .orderBy(col("o_orderpriority"), col("rnk"))
  }

  val q05Sql: String =
    """SELECT o_orderpriority, rnk, o_orderkey, totalprice FROM (
      | SELECT o_orderpriority, o_orderkey,
      |  CAST(round(o_totalprice*100) AS BIGINT)/100.0 AS totalprice,
      |  row_number() OVER (PARTITION BY o_orderpriority
      |    ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      | FROM orders) t
      |WHERE rnk <= 3
      |ORDER BY o_orderpriority, rnk""".stripMargin

  /** Running (cumulative) sum per supplier — frame-based window. */
  def q06RunningWindow(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lineitem(s, d)
      .filter(col("l_suppkey") <= 5)
      .withColumn("running_qty", sum(col("l_quantity")).over(w))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("running_qty"))
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
  }

  val q06Sql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
      | sum(l_quantity) OVER (PARTITION BY l_suppkey
      |   ORDER BY l_shipdate, l_orderkey, l_linenumber
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
      |FROM lineitem WHERE l_suppkey <= 5
      |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin

  /** Set operations: INTERSECT / EXCEPT with SQL bag-to-set semantics. */
  def q07SetOps(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).select(col("c_nationkey").as("k"))
    val sup = supplier(s, d).select(col("s_nationkey").as("k"))
    val inter = c.intersect(sup).withColumn("op", lit("intersect"))
    val minus = c.except(sup).withColumn("op", lit("except"))
    inter.unionByName(minus).select(col("op"), col("k")).orderBy(col("op"), col("k"))
  }

  val q07Sql: String =
    """SELECT 'intersect' AS op, k FROM
      | (SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier) a
      |UNION ALL
      |SELECT 'except' AS op, k FROM
      | (SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey FROM supplier) b
      |ORDER BY op, k""".stripMargin

  /** Global sort + limit (TakeOrderedAndProject — no full sort). */
  def q08SortLimit(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"),
        (cents(col("o_totalprice")) / 100.0).as("totalprice"))
      .limit(20)

  val q08Sql: String =
    """SELECT o_orderkey, o_custkey,
      | CAST(round(o_totalprice*100) AS BIGINT)/100.0 AS totalprice
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  /** ROLLUP hierarchy aggregate (grouping sets). */
  def q09Rollup(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        (sum(cents(col("o_totalprice"))) / 100.0).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        col("n"), col("total"))
      .orderBy(col("status"), col("priority"))

  val q09Sql: String =
    """SELECT coalesce(o_orderstatus, '(all)') AS status,
      | coalesce(o_orderpriority, '(all)') AS priority,
      | count(*) AS n,
      | CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)/100.0 AS total
      |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  /** Exact distinct aggregation (expand + two-phase hash agg). */
  def q10DistinctAgg(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_orders"),
        (sum(cents(col("o_totalprice"))) / 100.0).as("total"))
      .orderBy(col("o_orderpriority"))

  val q10Sql: String =
    """SELECT o_orderpriority,
      | count(DISTINCT o_custkey) AS n_cust,
      | count(*) AS n_orders,
      | CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)/100.0 AS total
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** HLL sketch vs exact distinct: approx_count_distinct is
   *  merge-order-independent (register max), so the ±rsd bound is a
   *  deterministic, oracle-checkable property even though the sketch
   *  value itself is engine-specific. At 100 TB the sketch is the
   *  only affordable distinct — one pass, fixed memory. */
  def q38ApproxDistinct(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("exact_cust"),
        approx_count_distinct(col("o_custkey"), 0.05).as("approx_cust"))
      .select(col("o_orderpriority"), col("exact_cust"),
        (abs(col("approx_cust") - col("exact_cust")) <=
          col("exact_cust") * 0.15).as("approx_within_15pct"))
      .orderBy(col("o_orderpriority"))

  val q38Sql: String =
    """SELECT o_orderpriority, count(DISTINCT o_custkey) AS exact_cust,
      | TRUE AS approx_within_15pct
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Top-3 orders per priority via the bounded-heap TopK aggregate
   *  (graft.functions.TopK) — same answer as the window formulation
   *  (q05) but with map-side partial merges: a huge group costs
   *  O(n log k) and ships k rows per partition, where the window
   *  must sort the whole group. */
  def q59GroupedTopK(s: SparkSession, d: String): DataFrame = {
    graft.functions.TopK.register(s)
    orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(graft.functions.TopK.topk(
        cents(col("o_totalprice")), col("o_orderkey"), 3).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")))
      .select(col("o_orderpriority"), (col("pos") + 1).cast("long").as("rnk"),
        col("col.payload").as("o_orderkey"),
        (col("col.v") / 100.0).as("totalprice"))
      .orderBy(col("o_orderpriority"), col("rnk"))
  }

  val q59Sql: String =
    """SELECT o_orderpriority, rnk, o_orderkey, totalprice FROM (
      | SELECT o_orderpriority, o_orderkey,
      |  CAST(round(o_totalprice*100) AS BIGINT)/100.0 AS totalprice,
      |  row_number() OVER (PARTITION BY o_orderpriority
      |    ORDER BY CAST(round(o_totalprice*100) AS BIGINT) DESC, o_orderkey) AS rnk
      | FROM orders) t
      |WHERE rnk <= 3
      |ORDER BY o_orderpriority, rnk""".stripMargin

  /** Exact percentiles (linear interpolation over integral cents →
   *  engine-independent doubles) per order priority. */
  def q44Percentiles(s: SparkSession, d: String): DataFrame = {
    def pct(q: Double) = round(
      expr(s"percentile(CAST(round(o_totalprice*100) AS BIGINT), $q)") / 100.0, 4)
    orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(pct(0.25).as("p25"), pct(0.5).as("p50"), pct(0.9).as("p90"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))
  }

  val q44Sql: String =
    """SELECT o_orderpriority,
      | round(quantile_cont(CAST(round(o_totalprice*100) AS BIGINT), 0.25)/100.0, 4) AS p25,
      | round(quantile_cont(CAST(round(o_totalprice*100) AS BIGINT), 0.50)/100.0, 4) AS p50,
      | round(quantile_cont(CAST(round(o_totalprice*100) AS BIGINT), 0.90)/100.0, 4) AS p90,
      | count(*) AS n
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** CUBE aggregate — all grouping-set combinations. */
  def q16Cube(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        (sum(cents(col("o_totalprice"))) / 100.0).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        col("n"), col("total"))
      .orderBy(col("status"), col("priority"))

  val q16Sql: String =
    """SELECT coalesce(o_orderstatus, '(all)') AS status,
      | coalesce(o_orderpriority, '(all)') AS priority,
      | count(*) AS n,
      | CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)/100.0 AS total
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  /** Explicit GROUPING SETS — an arbitrary set list ((status),
   *  (priority)) that neither ROLLUP (q09) nor CUBE (q16) can
   *  express: per-status and per-priority marginals with no pair and
   *  no grand total. `grouping()` disambiguates a NULL that came
   *  from the data from a NULL the grouping-set expansion produced —
   *  the distinction coalesce alone cannot make. Same Expand-based
   *  physical shape as rollup/cube: one scan, one hash aggregate
   *  over the expanded rows. */
  def q17GroupingSets(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        (sum(cents(col("o_totalprice"))) / 100.0).as("total"),
        // grouping() is only resolvable inside the grouping-sets
        // Aggregate itself — materialize the bit here, label below
        grouping(col("o_orderstatus")).as("g_status"))
      .select(
        when(col("g_status") === 0, lit("status"))
          .otherwise(lit("priority")).as("dim"),
        coalesce(col("o_orderstatus"), col("o_orderpriority")).as("grp_key"),
        col("n"), col("total"))
      .orderBy(col("dim"), col("grp_key"))

  val q17Sql: String =
    """SELECT CASE WHEN GROUPING(o_orderstatus) = 0 THEN 'status'
      |      ELSE 'priority' END AS dim,
      | coalesce(o_orderstatus, o_orderpriority) AS grp_key,
      | count(*) AS n,
      | CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)/100.0 AS total
      |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
      |ORDER BY dim, grp_key""".stripMargin

  /** Interval (range) join: for every error event, count the same
   *  user's purchases within the following hour — equi key (user)
   *  plus a range predicate. At scale the equi key carries the
   *  shuffle; the range stays a post-join filter, so no cross
   *  product materializes. */
  def q18IntervalJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val errs = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id"),
        col("ts").as("err_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"))
    errs.join(purchases,
        errs("user_id") === purchases("user_id") &&
          col("p_ts") >= col("err_ts") &&
          col("p_ts") < col("err_ts") + expr("INTERVAL 1 HOUR"), "left")
      .groupBy(col("err_id"))
      .agg(count(col("p_ts")).as("n_purchases_1h"))
      .orderBy(col("err_id"))
  }

  val q18Sql: String =
    """SELECT e.event_id AS err_id, count(p.ts) AS n_purchases_1h
      |FROM events e LEFT JOIN events p
      |  ON p.user_id = e.user_id AND p.event_type = 'purchase'
      | AND p.ts >= e.ts AND p.ts < e.ts + INTERVAL 1 HOUR
      |WHERE e.event_type = 'error'
      |GROUP BY e.event_id ORDER BY err_id""".stripMargin

  /** PIVOT: event counts per user as one column per event type
   *  (explicit value list keeps the schema deterministic). */
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  def q19Pivot(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, EventTypes)
      .orderBy(col("user_id"))

  val q19Sql: String = {
    val cols = EventTypes.map(t =>
      s"count(*) FILTER (WHERE event_type = '$t') AS $t").mkString(",\n ")
    s"""SELECT user_id,
       | $cols
       |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  /** Window-function variety: lead/lag/ntile/percent_rank/first over
   *  one partition spec (single shuffle serves all five). */
  def q46WindowSuite(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    orders(s, d)
      .filter(col("o_custkey") <= 100)
      .select(col("o_orderpriority"), col("o_orderkey"),
        (cents(col("o_totalprice")) / 100.0).as("price"),
        lag(col("o_orderkey"), 1).over(w).as("prev_key"),
        lead(col("o_orderkey"), 1).over(w).as("next_key"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"), // raw (rank-1)/(n-1): identical doubles both engines
        first(col("o_orderkey")).over(w).as("cheapest_key"))
      .orderBy(col("o_orderpriority"), col("price"), col("o_orderkey"))
  }

  val q46Sql: String =
    """SELECT o_orderpriority, o_orderkey,
      | CAST(round(o_totalprice*100) AS BIGINT)/100.0 AS price,
      | lag(o_orderkey, 1) OVER w AS prev_key,
      | lead(o_orderkey, 1) OVER w AS next_key,
      | CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      | percent_rank() OVER w AS pct_rank,
      | first_value(o_orderkey) OVER w AS cheapest_key
      |FROM orders WHERE o_custkey <= 100
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderpriority, price, o_orderkey""".stripMargin

  /** String-function registry coverage: substr/replace/concat/pad/
   *  levenshtein — all codegen'd builtins. */
  def q47StringFns(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .filter(col("c_custkey") <= 200)
      .select(col("c_custkey"),
        upper(col("c_name")).as("uname"),
        substring(col("c_name"), 1, 8).as("prefix"),
        regexp_replace(col("c_name"), "[0-9]", "#").as("masked"),
        length(col("c_name")).cast("long").as("name_len"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
        levenshtein(col("c_name"), col("c_mktsegment")).cast("long").as("lev"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("joined"))
      .orderBy(col("c_custkey"))

  val q47Sql: String =
    """SELECT c_custkey,
      | upper(c_name) AS uname,
      | substring(c_name, 1, 8) AS prefix,
      | regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
      | CAST(length(c_name) AS BIGINT) AS name_len,
      | lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
      | CAST(levenshtein(c_name, c_mktsegment) AS BIGINT) AS lev,
      | concat_ws('|', c_mktsegment, c_name) AS joined
      |FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey""".stripMargin

  /** Date/time-function registry coverage over order dates. */
  def q48DateFns(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .filter(col("o_orderkey") <= 2000)
      .select(col("o_orderkey"),
        to_date(col("o_orderdate")).as("od"),
        year(col("o_orderdate")).cast("long").as("y"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"),
        date_add(to_date(col("o_orderdate")), 90).as("due"),
        last_day(col("o_orderdate")).as("month_end"),
        datediff(lit("1999-01-01").cast("date"), to_date(col("o_orderdate")))
          .cast("long").as("days_to_99"))
      .orderBy(col("o_orderkey"))

  val q48Sql: String =
    """SELECT o_orderkey,
      | CAST(o_orderdate AS DATE) AS od,
      | CAST(year(o_orderdate) AS BIGINT) AS y,
      | CAST(quarter(o_orderdate) AS BIGINT) AS q,
      | CAST(month(o_orderdate) AS BIGINT) AS m,
      | CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
      | CAST(o_orderdate AS DATE) + 90 AS due,
      | last_day(CAST(o_orderdate AS DATE)) AS month_end,
      | CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS BIGINT) AS days_to_99
      |FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""".stripMargin

  /** Math-function registry coverage (libm last-ulp differences are
   *  absorbed by round-6). */
  def q49MathFns(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .select(col("p_partkey"),
        round(sqrt(col("p_retailprice")), 6).as("sqrt_price"),
        round(log(col("p_retailprice")), 6).as("ln_price"),
        round(pow(col("p_size"), 2).cast("double"), 6).as("size_sq"),
        ceil(col("p_retailprice")).cast("long").as("ceil_p"),
        floor(col("p_retailprice")).cast("long").as("floor_p"),
        abs(col("p_size") - 25).cast("long").as("dist25"),
        pmod(col("p_partkey"), lit(7)).cast("long").as("mod7"),
        signum(col("p_size") - 25).cast("long").as("sign25"))
      .orderBy(col("p_partkey"))

  val q49Sql: String =
    """SELECT p_partkey,
      | round(sqrt(p_retailprice), 6) AS sqrt_price,
      | round(ln(p_retailprice), 6) AS ln_price,
      | round(CAST(pow(p_size, 2) AS DOUBLE), 6) AS size_sq,
      | CAST(ceil(p_retailprice) AS BIGINT) AS ceil_p,
      | CAST(floor(p_retailprice) AS BIGINT) AS floor_p,
      | CAST(abs(p_size - 25) AS BIGINT) AS dist25,
      | CAST(p_partkey % 7 AS BIGINT) AS mod7,
      | CAST(sign(p_size - 25) AS BIGINT) AS sign25
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Bag-semantics set ops (INTERSECT ALL / EXCEPT ALL) — duplicates
   *  preserved by multiplicity. */
  def q50BagSetOps(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).select(col("c_nationkey").as("k"))
    val sup = supplier(s, d).select(col("s_nationkey").as("k"))
    val ia = c.intersectAll(sup).groupBy(col("k")).agg(count(lit(1)).as("n"))
      .withColumn("op", lit("intersect_all"))
    val ea = c.exceptAll(sup).groupBy(col("k")).agg(count(lit(1)).as("n"))
      .withColumn("op", lit("except_all"))
    ia.unionByName(ea).select(col("op"), col("k"), col("n"))
      .orderBy(col("op"), col("k"))
  }

  val q50Sql: String =
    """SELECT 'intersect_all' AS op, k, count(*) AS n FROM
      | (SELECT c_nationkey AS k FROM customer
      |  INTERSECT ALL SELECT s_nationkey FROM supplier) a GROUP BY k
      |UNION ALL
      |SELECT 'except_all' AS op, k, count(*) AS n FROM
      | (SELECT c_nationkey AS k FROM customer
      |  EXCEPT ALL SELECT s_nationkey FROM supplier) b GROUP BY k
      |ORDER BY op, k""".stripMargin

  /** Trailing time-RANGE window: 7-day moving quantity per supplier
   *  (RANGE frame over epoch-days — value-based, not row-based). */
  def q55MovingWindow(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("epoch_day"))
      .rangeBetween(-6, 0)
    lineitem(s, d)
      .filter(col("l_suppkey") <= 3)
      // floor, not cast-truncation: they differ on negative (pre-1970)
      // epochs, and the oracle floors
      .withColumn("epoch_day", floor(unix_timestamp(col("l_shipdate")) / 86400L).cast("long"))
      .groupBy(col("l_suppkey"), col("epoch_day"))
      .agg(sum(col("l_quantity")).as("day_qty"))
      .withColumn("qty_7d", sum(col("day_qty")).over(w))
      .orderBy(col("l_suppkey"), col("epoch_day"))
  }

  val q55Sql: String =
    """SELECT l_suppkey, epoch_day, day_qty,
      | sum(day_qty) OVER (PARTITION BY l_suppkey ORDER BY epoch_day
      |   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS qty_7d
      |FROM (
      | SELECT l_suppkey,
      |  CAST(floor(epoch(l_shipdate)/86400) AS BIGINT) AS epoch_day,
      |  sum(l_quantity) AS day_qty
      | FROM lineitem WHERE l_suppkey <= 3 GROUP BY 1, 2) t
      |ORDER BY l_suppkey, epoch_day""".stripMargin

  /** Correlated scalar subquery through the SQL surface — customers'
   *  orders priced ≥1.5× their own average (avg over integral cents
   *  → engine-independent). */
  def q56CorrelatedSubquery(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("orders_v")
    // analysis binds the view at sql() time, so dropping it right
    // after keeps the catalog of the shared long-lived session clean
    // (the returned plan stays valid)
    try s.sql(
      """SELECT o.o_orderkey, o.o_custkey,
        | CAST(round(o.o_totalprice*100) AS BIGINT) AS price_cents
        |FROM orders_v o
        |WHERE CAST(round(o.o_totalprice*100) AS BIGINT) >=
        |  (SELECT 1.5 * avg(CAST(round(i.o_totalprice*100) AS BIGINT))
        |   FROM orders_v i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
    finally s.catalog.dropTempView("orders_v")
  }

  val q56Sql: String =
    """SELECT o.o_orderkey, o.o_custkey,
      | CAST(round(o.o_totalprice*100) AS BIGINT) AS price_cents
      |FROM orders o
      |WHERE CAST(round(o.o_totalprice*100) AS BIGINT) >=
      |  (SELECT 1.5 * avg(CAST(round(i.o_totalprice*100) AS BIGINT))
      |   FROM orders i WHERE i.o_custkey = o.o_custkey)
      |ORDER BY o_orderkey""".stripMargin

  /** Left-semi / left-anti joins (EXISTS / NOT EXISTS). Customers with
   *  an open order vs customers with no orders at all. */
  def q11SemiAnti(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val o = orders(s, d)
    val withOpen = c.join(o.filter(col("o_orderstatus") === "O"),
      col("c_custkey") === col("o_custkey"), "left_semi")
    val noOrders = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
    withOpen.select(lit("has_open").as("tag"), col("c_custkey"))
      .unionByName(noOrders.select(lit("no_orders").as("tag"), col("c_custkey")))
      .orderBy(col("tag"), col("c_custkey"))
  }

  val q11Sql: String =
    """SELECT 'has_open' AS tag, c_custkey FROM customer
      | WHERE EXISTS (SELECT 1 FROM orders
      |   WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
      |UNION ALL
      |SELECT 'no_orders' AS tag, c_custkey FROM customer
      | WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY tag, c_custkey""".stripMargin
}
