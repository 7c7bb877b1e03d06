package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
