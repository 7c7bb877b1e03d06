package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Referential-integrity / constraint audit (q139): the pre-ingest
 * gate a warehouse runs before trusting a snapshot — key uniqueness,
 * foreign-key containment, NOT-NULL, and domain (range) checks, each
 * reported as one `(check_id, violations, ok)` row. The reference's
 * import path trusts its inputs implicitly (diepy/core.py casts but
 * never validates keys); this operator is the audit that makes that
 * trust checkable at warehouse scale, in the spirit of declarative
 * data-quality suites (Schelter et al., "Automating Large-Scale Data
 * Quality Verification", VLDB 2018).
 *
 * Scale design:
 *  - All scalar constraints on a table (uniqueness, null, domain)
 *    evaluate in ONE scan — a single hash aggregate whose state is a
 *    handful of counters, unpivoted with stack() on the one result
 *    row (the q101 tableStats shape). Adding a constraint adds a
 *    counter, not a scan.
 *  - Each FK edge is ONE left-anti join counting orphans. Dimension
 *    parents (region/nation and kin) broadcast; fact-to-fact edges
 *    (lineitem→orders) shuffle both sides on the key — the exact
 *    count genuinely requires that join, and AQE picks the strategy
 *    per actual size. At 100 TB the q77 Bloom pre-filter composes in
 *    front of a fact-fact edge to cut shuffle volume (an orphan
 *    check is a containment question, so a Bloom false-positive only
 *    sends a row INTO the join, never drops a violation).
 *  - The per-constraint 1-row aggregates union into one tiny frame;
 *    nothing driver-side, no collect.
 *
 * Violation counts are exact integers, so the output is hash-stable
 * across engines and partitionings. On the synthetic corpus every
 * constraint holds EXCEPT lineitem's composite primary key —
 * (l_orderkey, l_linenumber) carries real duplicates — so the audit
 * demonstrably fires on real input rather than rubber-stamping it.
 */
object Integrity {

  /** One row `(check_id, violations)` per aggregate-expression
    * check, all evaluated in a single scan of `df`. Each check's
    * Column must be an aggregate expression counting violating rows. */
  private[ops] def scalarAudit(df: DataFrame,
      checks: Seq[(String, Column)]): DataFrame = {
    val one = df.agg(checks.head._2.as(checks.head._1),
      checks.tail.map { case (n, c) => c.as(n) }: _*)
    val stackArgs = checks
      .map { case (n, _) => s"'$n', CAST(`$n` AS BIGINT)" }.mkString(", ")
    one.selectExpr(
      s"stack(${checks.length}, $stackArgs) AS (check_id, violations)")
  }

  /** Violation count for `key IS NOT NULL` rows of `child` with no
    * match in `parent` — a null FK is absent, not an orphan (SQL
    * containment semantics). */
  private[ops] def fkOrphans(name: String, child: DataFrame, fk: String,
      parent: DataFrame, pk: String): DataFrame =
    child.select(col(fk).as("__k")).filter(col("__k").isNotNull)
      .join(parent.select(col(pk).as("__k")), Seq("__k"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(name).as("check_id"), col("violations"))

  /** count(*) − count(distinct keys): >0 iff the key set has dupes.
    * Rows with any null key column count as violations (they cannot
    * be a primary key): countDistinct skips them, and the oracle's
    * CASE-to-NULL guard makes DuckDB's tuple distinct skip them too. */
  private def dupCount(keys: Column*): Column =
    count(lit(1)) - countDistinct(keys.head, keys.tail: _*)

  private def nullCount(c: Column): Column = count(when(c.isNull, 1))

  /** Rows failing a domain predicate; null fails (NOT NULL is part of
    * the stated domain for these columns). */
  private def domainCount(pred: Column): Column =
    count(when(!coalesce(pred, lit(false)), 1))

  /** q139: the full constraint suite over the warehouse snapshot. */
  def q139IntegrityAudit(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d); val or = Tables.orders(s, d)
    val cu = Tables.customer(s, d); val su = Tables.supplier(s, d)
    val pa = Tables.part(s, d); val na = Tables.nation(s, d)
    val re = Tables.region(s, d)
    val scalar = Seq(
      scalarAudit(li, Seq(
        "pk_lineitem_orderkey_linenumber" ->
          dupCount(col("l_orderkey"), col("l_linenumber")),
        "nn_lineitem_orderkey" -> nullCount(col("l_orderkey")),
        "dom_lineitem_quantity_pos" -> domainCount(col("l_quantity") > 0),
        "dom_lineitem_discount_unit" ->
          domainCount(col("l_discount").between(0, 1)),
        "dom_lineitem_tax_nonneg" -> domainCount(col("l_tax") >= 0))),
      scalarAudit(or, Seq(
        "pk_orders_orderkey" -> dupCount(col("o_orderkey")),
        "nn_orders_custkey" -> nullCount(col("o_custkey")),
        "dom_orders_totalprice_nonneg" ->
          domainCount(col("o_totalprice") >= 0))),
      scalarAudit(cu, Seq(
        "pk_customer_custkey" -> dupCount(col("c_custkey")),
        "nn_customer_nationkey" -> nullCount(col("c_nationkey")))),
      scalarAudit(su, Seq(
        "pk_supplier_suppkey" -> dupCount(col("s_suppkey")))),
      scalarAudit(pa, Seq(
        "pk_part_partkey" -> dupCount(col("p_partkey")),
        "dom_part_size_pos" -> domainCount(col("p_size") > 0))),
      scalarAudit(na, Seq(
        "pk_nation_nationkey" -> dupCount(col("n_nationkey")))),
      scalarAudit(re, Seq(
        "pk_region_regionkey" -> dupCount(col("r_regionkey")))))
    val fks = Seq(
      fkOrphans("fk_lineitem_orders", li, "l_orderkey", or, "o_orderkey"),
      fkOrphans("fk_lineitem_part", li, "l_partkey", pa, "p_partkey"),
      fkOrphans("fk_lineitem_supplier", li, "l_suppkey", su, "s_suppkey"),
      fkOrphans("fk_orders_customer", or, "o_custkey", cu, "c_custkey"),
      fkOrphans("fk_customer_nation", cu, "c_nationkey", na, "n_nationkey"),
      fkOrphans("fk_supplier_nation", su, "s_nationkey", na, "n_nationkey"),
      fkOrphans("fk_nation_region", na, "n_regionkey", re, "r_regionkey"))
    (scalar ++ fks).reduce(_ unionByName _)
      .withColumn("ok", col("violations") === 0)
      .orderBy(col("check_id"))
  }

  val q139Sql: String =
    """SELECT check_id, violations, violations = 0 AS ok FROM (
      |  SELECT 'pk_lineitem_orderkey_linenumber' AS check_id,
      |   count(*) - count(DISTINCT CASE WHEN l_orderkey IS NULL OR l_linenumber IS NULL
      |    THEN NULL ELSE (l_orderkey, l_linenumber) END) AS violations
      |  FROM lineitem
      |  UNION ALL SELECT 'nn_lineitem_orderkey',
      |   count(*) FILTER (WHERE l_orderkey IS NULL) FROM lineitem
      |  UNION ALL SELECT 'dom_lineitem_quantity_pos',
      |   count(*) FILTER (WHERE NOT COALESCE(l_quantity > 0, FALSE)) FROM lineitem
      |  UNION ALL SELECT 'dom_lineitem_discount_unit',
      |   count(*) FILTER (WHERE NOT COALESCE(l_discount BETWEEN 0 AND 1, FALSE))
      |  FROM lineitem
      |  UNION ALL SELECT 'dom_lineitem_tax_nonneg',
      |   count(*) FILTER (WHERE NOT COALESCE(l_tax >= 0, FALSE)) FROM lineitem
      |  UNION ALL SELECT 'pk_orders_orderkey',
      |   count(*) - count(DISTINCT o_orderkey) FROM orders
      |  UNION ALL SELECT 'nn_orders_custkey',
      |   count(*) FILTER (WHERE o_custkey IS NULL) FROM orders
      |  UNION ALL SELECT 'dom_orders_totalprice_nonneg',
      |   count(*) FILTER (WHERE NOT COALESCE(o_totalprice >= 0, FALSE)) FROM orders
      |  UNION ALL SELECT 'pk_customer_custkey',
      |   count(*) - count(DISTINCT c_custkey) FROM customer
      |  UNION ALL SELECT 'nn_customer_nationkey',
      |   count(*) FILTER (WHERE c_nationkey IS NULL) FROM customer
      |  UNION ALL SELECT 'pk_supplier_suppkey',
      |   count(*) - count(DISTINCT s_suppkey) FROM supplier
      |  UNION ALL SELECT 'pk_part_partkey',
      |   count(*) - count(DISTINCT p_partkey) FROM part
      |  UNION ALL SELECT 'dom_part_size_pos',
      |   count(*) FILTER (WHERE NOT COALESCE(p_size > 0, FALSE)) FROM part
      |  UNION ALL SELECT 'pk_nation_nationkey',
      |   count(*) - count(DISTINCT n_nationkey) FROM nation
      |  UNION ALL SELECT 'pk_region_regionkey',
      |   count(*) - count(DISTINCT r_regionkey) FROM region
      |  UNION ALL SELECT 'fk_lineitem_orders', count(*) FROM lineitem l
      |   LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      |   WHERE l.l_orderkey IS NOT NULL AND o.o_orderkey IS NULL
      |  UNION ALL SELECT 'fk_lineitem_part', count(*) FROM lineitem l
      |   LEFT JOIN part p ON l.l_partkey = p.p_partkey
      |   WHERE l.l_partkey IS NOT NULL AND p.p_partkey IS NULL
      |  UNION ALL SELECT 'fk_lineitem_supplier', count(*) FROM lineitem l
      |   LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |   WHERE l.l_suppkey IS NOT NULL AND s.s_suppkey IS NULL
      |  UNION ALL SELECT 'fk_orders_customer', count(*) FROM orders o
      |   LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      |   WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL
      |  UNION ALL SELECT 'fk_customer_nation', count(*) FROM customer c
      |   LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      |   WHERE c.c_nationkey IS NOT NULL AND n.n_nationkey IS NULL
      |  UNION ALL SELECT 'fk_supplier_nation', count(*) FROM supplier s
      |   LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
      |   WHERE s.s_nationkey IS NOT NULL AND n.n_nationkey IS NULL
      |  UNION ALL SELECT 'fk_nation_region', count(*) FROM nation na
      |   LEFT JOIN region r ON na.n_regionkey = r.r_regionkey
      |   WHERE na.n_regionkey IS NOT NULL AND r.r_regionkey IS NULL) t
      |ORDER BY check_id""".stripMargin
}
