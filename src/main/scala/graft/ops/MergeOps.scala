package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Batch merge (upsert) — the table-maintenance operator behind every
 * "apply CDC feed to snapshot" pipeline: rows in the batch REPLACE
 * same-key rows of the current snapshot (SCD1), unseen keys insert.
 * Expressed as one left-anti join + union: at 100 TB, with snapshot
 * and feed bucketed by the merge key, the anti-join is co-located
 * (shuffle-free) and the rewrite is bounded by the snapshot scan —
 * the same shape Delta/Iceberg MERGE compiles to when every matched
 * row updates.
 */
object MergeOps {

  /** `batch` wins on key collisions; `current` survivors pass through.
    * PRECONDITION: `batch` is key-unique — a CDC feed carrying several
    * versions of one key must be collapsed first (see [[latestPerKey]]),
    * exactly as Delta/Iceberg MERGE demands; a duplicate-key batch
    * would otherwise land duplicate keys in the snapshot. */
  def mergeUpsert(current: DataFrame, batch: DataFrame, key: String): DataFrame =
    current.join(batch.select(col(key)), Seq(key), "left_anti")
      .unionByName(batch)

  /** Collapse a multi-version CDC feed to its latest row per key
    * (greatest `ord`, ties broken arbitrarily-but-deterministically by
    * the row's remaining columns via the struct ordering). One hash
    * aggregate — no per-key window sort. */
  def latestPerKey(batch: DataFrame, key: String, ord: String): DataFrame = {
    val rest = batch.columns.filter(c => c != key && c != ord).toSeq
    val payload = struct((ord +: rest).map(col): _*)
    batch.groupBy(col(key)).agg(max(payload).as("__p"))
      .select(col(key) +: (ord +: rest).map(c => col(s"__p.$c").as(c)): _*)
  }

  /** q84: apply a deterministic CDC batch to customer — every 7th
    * account re-priced into segment MERGED, 50 synthetic new accounts
    * with negative keys — write the merged snapshot durably, read it
    * back, and hash-compare every column against the oracle's
    * NOT EXISTS + UNION ALL formulation. */
  def q84MergeUpsert(s: SparkSession, d: String): DataFrame = {
    val cur = Tables.customer(s, d)
    val updates = cur.filter(pmod(col("c_custkey"), lit(7)) === 0)
      .withColumn("c_acctbal", col("c_acctbal") + 100.0)
      .withColumn("c_mktsegment", lit("MERGED"))
    val inserts = s.range(1, 51).select(
      (-col("id")).as("c_custkey"),
      concat(lit("New Account "), col("id")).as("c_name"),
      pmod(col("id"), lit(25)).cast("int").as("c_nationkey"),
      lit(0.0).as("c_acctbal"),
      lit("NEW").as("c_mktsegment"))
    val merged = mergeUpsert(cur, updates.unionByName(inserts), "c_custkey")
    val dir = InferOps.tmpPath("merge_cust", d)
    merged.write.mode("overwrite").parquet(dir)
    s.read.parquet(dir).orderBy(col("c_custkey"))
  }

  val q84Sql: String =
    """WITH upd AS (
      |  SELECT c_custkey, c_name, c_nationkey,
      |   c_acctbal + 100.0 AS c_acctbal, 'MERGED' AS c_mktsegment
      |  FROM customer WHERE c_custkey % 7 = 0),
      |ins AS (
      |  SELECT -i AS c_custkey, 'New Account ' || i::VARCHAR AS c_name,
      |   CAST(i % 25 AS INTEGER) AS c_nationkey, 0.0 AS c_acctbal,
      |   'NEW' AS c_mktsegment
      |  FROM (SELECT unnest(range(1, 51)) AS i) r),
      |batch AS (SELECT * FROM upd UNION ALL SELECT * FROM ins)
      |SELECT * FROM (
      |  SELECT c.* FROM customer c
      |  WHERE NOT EXISTS (SELECT 1 FROM batch b WHERE b.c_custkey = c.c_custkey)
      |  UNION ALL SELECT * FROM batch) m
      |ORDER BY c_custkey""".stripMargin

  /** SCD2 (effective-dated history) merge: open versions whose
    * tracked attribute CHANGES in the batch are closed at the
    * effective date and re-inserted as new open versions; matches
    * with an identical attribute pass through untouched; unseen keys
    * insert as new open versions; already-closed history is
    * immutable. One outer join drives all four dispositions — at
    * 100 TB the history is bucketed by key and the four legs are
    * projections of the SAME join (persist the join output to scan
    * it once; here the legs stay lazy for the oracle's sake). */
  def scd2Merge(hist: DataFrame, batch: DataFrame, key: String,
      attr: String, effective: org.apache.spark.sql.Column): DataFrame = {
    val open = hist.filter(col("valid_to").isNull)
    val closedHist = hist.filter(col("valid_to").isNotNull)
    // Collapse duplicate batch keys BEFORE the join: a multi-version
    // CDC feed would otherwise fan each open version out once per
    // batch row, duplicating history across the legs. max() is a
    // deterministic last-wins reduction (identity on the key-unique
    // batches MERGE demands); feeds with a real ordering column should
    // pre-collapse via [[latestPerKey]] instead. One hash aggregate.
    // __hit marks a batch match independently of the attr VALUE —
    // comparisons below are null-safe (<=>), so a NULL tracked
    // attribute (either side) still takes the right disposition
    // instead of failing every filter and silently dropping the row
    val b = batch.groupBy(col(key)).agg(max(col(attr)).as("__new"))
      .withColumn("__hit", lit(1))
    val j = open.join(b, Seq(key), "left")
    val changedPred = col("__hit").isNotNull && !(col("__new") <=> col(attr))
    val unchanged = j
      .filter(col("__hit").isNull || (col("__new") <=> col(attr)))
      .drop("__new", "__hit")
    val closed = j
      .filter(changedPred)
      .withColumn("valid_to", effective.cast("date"))
      .drop("__new", "__hit")
    val reopened = j
      .filter(changedPred)
      .withColumn(attr, col("__new")).drop("__new", "__hit")
      .withColumn("valid_from", effective.cast("date"))
      .withColumn("valid_to", lit(null).cast("date"))
    val inserts = b.join(open.select(col(key)), Seq(key), "left_anti")
      .select(col(key), col("__new").as(attr))
      .withColumn("valid_from", effective.cast("date"))
      .withColumn("valid_to", lit(null).cast("date"))
    closedHist.unionByName(unchanged).unionByName(closed)
      .unionByName(reopened).unionByName(inserts, allowMissingColumns = false)
  }

  /** q85: customer segments as an SCD2 dimension — every 5th account
    * arrives in the batch (those ≡0 mod 10 with their CURRENT segment
    * → untouched; the rest re-segmented to LOYALTY → close + reopen),
    * plus 30 brand-new negative keys. Exercises all four dispositions
    * in one oracle-hashed result. */
  def q85Scd2(s: SparkSession, d: String): DataFrame = {
    val eff = to_date(lit("2025-06-01"))
    val hist = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"))
      .withColumn("valid_from", to_date(lit("2024-01-01")))
      .withColumn("valid_to", lit(null).cast("date"))
    val updates = Tables.customer(s, d)
      .filter(pmod(col("c_custkey"), lit(5)) === 0)
      .select(col("c_custkey"),
        when(pmod(col("c_custkey"), lit(10)) === 0, col("c_mktsegment"))
          .otherwise(lit("LOYALTY")).as("c_mktsegment"))
    val inserts = s.range(1, 31).select(
      (-col("id")).as("c_custkey"), lit("LOYALTY").as("c_mktsegment"))
    scd2Merge(hist, updates.unionByName(inserts), "c_custkey", "c_mktsegment", eff)
      .orderBy(col("c_custkey"), col("valid_from"))
  }

  val q85Sql: String =
    """WITH open_v AS (
      |  SELECT c_custkey, c_mktsegment, DATE '2024-01-01' AS valid_from,
      |   CAST(NULL AS DATE) AS valid_to
      |  FROM customer),
      |b AS (
      |  SELECT c_custkey,
      |   CASE WHEN c_custkey % 10 = 0 THEN c_mktsegment ELSE 'LOYALTY' END AS new_seg,
      |   1 AS hit
      |  FROM customer WHERE c_custkey % 5 = 0
      |  UNION ALL
      |  SELECT -i, 'LOYALTY', 1 FROM (SELECT unnest(range(1, 31)) AS i) r),
      |j AS (
      |  SELECT o.c_custkey, o.c_mktsegment, o.valid_from, o.valid_to, b.new_seg, b.hit
      |  FROM open_v o LEFT JOIN b USING (c_custkey))
      |SELECT * FROM (
      |  SELECT c_custkey, c_mktsegment, valid_from, valid_to FROM j
      |  WHERE hit IS NULL OR new_seg IS NOT DISTINCT FROM c_mktsegment
      |  UNION ALL
      |  SELECT c_custkey, c_mktsegment, valid_from, DATE '2025-06-01' FROM j
      |  WHERE hit IS NOT NULL AND new_seg IS DISTINCT FROM c_mktsegment
      |  UNION ALL
      |  SELECT c_custkey, new_seg, DATE '2025-06-01', CAST(NULL AS DATE) FROM j
      |  WHERE hit IS NOT NULL AND new_seg IS DISTINCT FROM c_mktsegment
      |  UNION ALL
      |  SELECT b.c_custkey, b.new_seg, DATE '2025-06-01', CAST(NULL AS DATE)
      |  FROM b WHERE NOT EXISTS
      |    (SELECT 1 FROM open_v o WHERE o.c_custkey = b.c_custkey)) t
      |ORDER BY c_custkey, valid_from""".stripMargin

  // ----- incremental aggregate maintenance (materialized view) -----

  /** Aggregate a raw order feed into the mergeable per-customer
    * partial form: (o_custkey, n_orders, sum_cents). Cents-integral
    * sums (Tables.cents) keep every partial AND every merge exact
    * and order-free — the property that lets partials from different
    * epochs combine in any order without drift. */
  def orderAggPartial(orders: DataFrame): DataFrame =
    orders.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(Tables.cents(col("o_totalprice"))).as("sum_cents"))

  /** Merge a delta's aggregate partials into a materialized base
    * aggregate WITHOUT rescanning the base's raw feed — the
    * incremental-view-maintenance shape: a nightly 100 TB fact table
    * keeps its per-key rollup current by aggregating ONLY the new
    * partition and merging. Expressed as a full-outer join (not
    * union+re-agg) so a base persisted BUCKETED by the key needs no
    * exchange: the delta — the only data that shuffles — is batch-
    * sized. Both inputs must be key-unique partials (the output of
    * [[orderAggPartial]]); counts/sums coalesce through unmatched
    * keys on either side. */
  def aggMerge(base: DataFrame, deltaAgg: DataFrame): DataFrame = {
    val b = base.select(col("o_custkey"), col("n_orders").as("__bn"),
      col("sum_cents").as("__bc"))
    val dl = deltaAgg.select(col("o_custkey"), col("n_orders").as("__dn"),
      col("sum_cents").as("__dc"))
    b.join(dl, Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        (coalesce(col("__bn"), lit(0L)) + coalesce(col("__dn"), lit(0L))).as("n_orders"),
        (coalesce(col("__bc"), lit(0L)) + coalesce(col("__dc"), lit(0L))).as("sum_cents"))
  }

  /** Persist a base aggregate snapshot BUCKETED by the merge key —
    * the pre-paid shuffle that makes every subsequent [[aggMerge]]
    * exchange-free on the base side (same discipline as
    * Dedup.writeFpIndex; BucketingSpec pins the plan). */
  def writeAggSnapshot(baseAgg: DataFrame, table: String, buckets: Int = 8): Unit =
    baseAgg.write.mode("overwrite").bucketBy(buckets, "o_custkey")
      .sortBy("o_custkey").format("parquet").saveAsTable(table)

  /** q98: orders before 2000-01-01 play the materialized base rollup,
    * the rest arrive as the delta; the merged view must equal a full
    * recompute (the oracle). Recomputes the base inline for the
    * oracle's sake — the durable path is [[writeAggSnapshot]] +
    * [[aggMerge]], plan-pinned in MergeOpsSpec. */
  def q98IncrementalAgg(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val split = lit("2000-01-01").cast("timestamp")
    val base = orderAggPartial(orders.filter(col("o_orderdate") < split))
    val delta = orderAggPartial(orders.filter(col("o_orderdate") >= split))
    aggMerge(base, delta)
      .select(col("o_custkey"), col("n_orders"),
        (col("sum_cents") / 100.0).as("total"))
      .orderBy(col("o_custkey"))
  }

  val q98Sql: String =
    """SELECT o_custkey, count(*) AS n_orders,
      | CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  // ---------------------------------------------------------------
  // q129: point-in-time (as-of) join against an SCD2 dimension
  // ---------------------------------------------------------------

  /** q129: the feature-store temporal join — facts matched to the
   *  dimension version that was effective AT event time (never a
   *  later one: the leakage ML pipelines guard against). The
   *  effective-dated dimension is a deterministic two-version history
   *  derived from `customer` (v1 carries the original segment through
   *  1997, v2 a relabeled segment from 1998 — the q85 SCD2 shape
   *  without its staged-CDC scratch dependency); each order joins the
   *  single version whose [eff_from, eff_to) interval covers its
   *  order date.
   *
   *  Scale: versions-per-key is bounded (SCD2 histories grow by
   *  updates, not by facts), so this is an equi-join on the key with
   *  a residual interval predicate — NOT a range join: the shuffle
   *  is the fact table's key shuffle, each probe scans its own few
   *  versions. At 100 TB bucket both sides by the key and the join is
   *  exchange-free (the q84/q98 layout discipline). */
  def q129PitJoin(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    // The first version is open-ended at the low side: any fact date —
    // however early — matches exactly one version, so the PIT join is
    // total and conservation holds for any provisioned date range.
    val dim = c.select(col("c_custkey"), col("c_mktsegment").as("segment"),
        to_date(lit("0001-01-01")).as("eff_from"),
        to_date(lit("1998-01-01")).as("eff_to"))
      .unionAll(c.select(col("c_custkey"),
        concat(col("c_mktsegment"), lit("#R")).as("segment"),
        to_date(lit("1998-01-01")).as("eff_from"),
        to_date(lit("9999-12-31")).as("eff_to")))
    Tables.orders(s, d)
      .join(dim, col("o_custkey") === col("c_custkey")
        && to_date(col("o_orderdate")) >= col("eff_from")
        && to_date(col("o_orderdate")) < col("eff_to"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(Tables.cents(col("o_totalprice"))).as("sum_cents"))
      .orderBy(col("segment"))
  }

  val q129Sql: String =
    """WITH dim AS (
      |  SELECT c_custkey, c_mktsegment AS segment,
      |   DATE '0001-01-01' AS eff_from, DATE '1998-01-01' AS eff_to
      |  FROM customer
      |  UNION ALL
      |  SELECT c_custkey, c_mktsegment || '#R',
      |   DATE '1998-01-01', DATE '9999-12-31'
      |  FROM customer)
      |SELECT segment, CAST(count(*) AS BIGINT) AS n_orders,
      | CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents
      |FROM orders o JOIN dim dm ON o.o_custkey = dm.c_custkey
      | AND CAST(o.o_orderdate AS DATE) >= dm.eff_from
      | AND CAST(o.o_orderdate AS DATE) < dm.eff_to
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  // q153: CDC extract — diff two snapshots into a change set
  // ---------------------------------------------------------------

  /** q153: change-data-capture EXTRACT — the inverse direction of
   *  q84 (which APPLIES a change set): given two keyed snapshots of
   *  the orders table, emit the minimal insert/update/delete set that
   *  turns v1 into v2. Snapshots derive deterministically from the
   *  source table (v1 omits the %10==7 residue, v2 omits %10==3 and
   *  bumps every %5==0 price by 500 cents) so the oracle replays the
   *  identical derivation — no scratch-path dependency.
   *
   *  Scale: ONE full-outer join co-partitioned on the key plus a
   *  row-local classification — at 100 TB both snapshots are bucketed
   *  by key and the join is shuffle-free; unchanged rows (the vast
   *  majority in real CDC) are filtered before the presentation sort.
   *  All prices compare as exact integer cents (the q01 rule), so
   *  "changed" is never a floating-point judgement. */
  def q153SnapshotDiff(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(col("o_orderkey"),
      Tables.cents(col("o_totalprice")).as("cents"))
    val v1 = o.filter(pmod(col("o_orderkey"), lit(10)) =!= 7)
      .select(col("o_orderkey").as("k1"), col("cents").as("old_cents"))
    val v2 = o.filter(pmod(col("o_orderkey"), lit(10)) =!= 3)
      .select(col("o_orderkey").as("k2"),
        (col("cents") + when(pmod(col("o_orderkey"), lit(5)) === 0, 500L)
          .otherwise(0L)).as("new_cents"))
    v1.join(v2, col("k1") === col("k2"), "full_outer")
      .withColumn("change",
        when(col("k1").isNull, "insert")
          .when(col("k2").isNull, "delete")
          .when(col("old_cents") =!= col("new_cents"), "update"))
      .filter(col("change").isNotNull)
      .select(coalesce(col("k1"), col("k2")).as("o_orderkey"),
        col("change"), col("old_cents"), col("new_cents"))
      .orderBy(col("o_orderkey"))
  }

  val q153Sql: String =
    """WITH o AS (SELECT o_orderkey,
      |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
      |v1 AS (SELECT o_orderkey AS k1, cents AS old_cents FROM o
      |       WHERE o_orderkey % 10 <> 7),
      |v2 AS (SELECT o_orderkey AS k2,
      |  cents + CASE WHEN o_orderkey % 5 = 0 THEN 500 ELSE 0 END AS new_cents
      |  FROM o WHERE o_orderkey % 10 <> 3)
      |SELECT coalesce(k1, k2) AS o_orderkey,
      | CASE WHEN k1 IS NULL THEN 'insert'
      |      WHEN k2 IS NULL THEN 'delete'
      |      WHEN old_cents <> new_cents THEN 'update' END AS change,
      | old_cents, new_cents
      |FROM v1 FULL OUTER JOIN v2 ON k1 = k2
      |WHERE (k1 IS NULL OR k2 IS NULL OR old_cents <> new_cents)
      |ORDER BY o_orderkey""".stripMargin
}
