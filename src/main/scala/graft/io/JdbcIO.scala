package graft.io

import java.sql.DriverManager
import java.util.Properties

import graft.core.{ColumnDef, SchemaInfer}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * JDBC import/export (reference: diepy/core.py:115-151, 188-213,
 * 287-297) on Spark's JDBC source. Exercised against embedded Derby
 * (the only non-Hive JDBC driver available offline).
 *
 * Parity points:
 *  - create-if-absent with the inferred DDL types incl. VARCHAR width
 *    tiers (`createTableColumnTypes`, K2);
 *  - truncate-vs-append load (K3: the reference issues DELETE, not
 *    TRUNCATE — Spark's `truncate` option maps to TRUNCATE TABLE;
 *    same observable state);
 *  - 1,000-row insert batching (core.py:245, 274);
 *  - export is a plain jdbc read (S9); `partitionColumn` turns the
 *    reference's single cursor into N parallel range scans — the
 *    scale path.
 */
object JdbcIO {

  val BatchSize = 1000 // reference parity, core.py:245

  /** Spark's built-in Derby dialect maps StringType → CLOB, which
   *  makes `setNull(CLOB)` fail against the VARCHAR width-tier
   *  columns we create (and CLOB columns can't be compared/grouped in
   *  Derby anyway). Map strings to Derby's max VARCHAR instead;
   *  everything else falls through to the default mappings. */
  private object DerbyVarcharDialect extends org.apache.spark.sql.jdbc.JdbcDialect {
    override def canHandle(url: String): Boolean = url.startsWith("jdbc:derby")
    override def getJDBCType(dt: org.apache.spark.sql.types.DataType) = dt match {
      case org.apache.spark.sql.types.StringType =>
        Some(org.apache.spark.sql.jdbc.JdbcType("VARCHAR(32672)", java.sql.Types.VARCHAR))
      case org.apache.spark.sql.types.BooleanType =>
        Some(org.apache.spark.sql.jdbc.JdbcType("BOOLEAN", java.sql.Types.BOOLEAN))
      case org.apache.spark.sql.types.ShortType =>
        Some(org.apache.spark.sql.jdbc.JdbcType("SMALLINT", java.sql.Types.SMALLINT))
      case org.apache.spark.sql.types.FloatType =>
        Some(org.apache.spark.sql.jdbc.JdbcType("REAL", java.sql.Types.FLOAT))
      case org.apache.spark.sql.types.DoubleType =>
        Some(org.apache.spark.sql.jdbc.JdbcType("DOUBLE", java.sql.Types.DOUBLE))
      case _ => None
    }
  }
  org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(DerbyVarcharDialect)

  /** Existence probe; accepts `table` or `schema.table`. Checks the
    * exact name plus the connection's identifier-folding convention
    * (Derby/Oracle fold to upper, Postgres to lower). */
  def tableExists(url: String, table: String): Boolean = {
    val cn = DriverManager.getConnection(url)
    try {
      val (schemaPat0, tablePat) = table.lastIndexOf('.') match {
        case -1 => (null: String, table)
        case i  => (table.substring(0, i), table.substring(i + 1))
      }
      // unqualified names must scope to the CONNECTION's current
      // schema — a null pattern would match a same-named table in ANY
      // schema and misreport existence
      val schemaPat =
        if (schemaPat0 != null) schemaPat0
        else try cn.getSchema catch { case _: Exception => null }
      val md = cn.getMetaData
      val candidates =
        Seq(tablePat) ++
          (if (md.storesUpperCaseIdentifiers) Seq(tablePat.toUpperCase) else Nil) ++
          (if (md.storesLowerCaseIdentifiers) Seq(tablePat.toLowerCase) else Nil)
      def schemaCand(t: String): String =
        if (schemaPat == null) null
        else if (md.storesUpperCaseIdentifiers && t == tablePat.toUpperCase) schemaPat.toUpperCase
        else if (md.storesLowerCaseIdentifiers && t == tablePat.toLowerCase) schemaPat.toLowerCase
        else schemaPat
      // getTables treats its arguments as SQL LIKE patterns: escape
      // '_'/'%' (ubiquitous in real table names) or MY_TABLE would
      // match MYXTABLE and misreport existence
      val esc = try md.getSearchStringEscape catch { case _: Exception => "\\" }
      def escapePat(x: String): String =
        if (x == null) null
        else x.replace(esc, esc + esc).replace("_", esc + "_").replace("%", esc + "%")
      candidates.distinct.exists { t =>
        val rs = md.getTables(null, escapePat(schemaCand(t)), escapePat(t), null)
        try rs.next() finally rs.close()
      }
    } finally cn.close()
  }

  /** Append `df` into `table`, creating it with inferred DDL when
    * absent; `truncate=true` clears existing rows first. */
  def writeTable(df: DataFrame, url: String, table: String,
      cols: Option[Seq[ColumnDef]] = None, truncate: Boolean = false): Unit = {
    val exists = tableExists(url, table)
    val props = new Properties()
    props.setProperty("batchsize", BatchSize.toString)
    if (!exists) {
      val writer = df.write.mode("append").option("batchsize", BatchSize)
      cols.map(c => SchemaInfer.createTableColumnTypes(c))
        .filter(_.nonEmpty)
        .map(t => writer.option("createTableColumnTypes", t))
        .getOrElse(writer)
        .jdbc(url, table, props)
    } else {
      if (truncate) {
        val cn = DriverManager.getConnection(url)
        // DELETE (not TRUNCATE) matches the reference, core.py:141-142
        try cn.createStatement().executeUpdate(s"DELETE FROM $table")
        finally cn.close()
      }
      df.write.mode("append").option("batchsize", BatchSize).jdbc(url, table, props)
    }
  }

  /** writeTable + imported row count WITHOUT a second read of the
    * source: an Observation on the written plan collects the count
    * during the write pass itself (the reference counted rows as it
    * inserted, core.py:239-254). */
  def writeTableCounted(df: DataFrame, url: String, table: String,
      cols: Option[Seq[graft.core.ColumnDef]] = None, truncate: Boolean = false): Long = {
    val obs = org.apache.spark.sql.Observation()
    val observed = df.observe(obs, org.apache.spark.sql.functions.count(
      org.apache.spark.sql.functions.lit(1)).as("rows"))
    writeTable(observed, url, table, cols, truncate)
    obs.get("rows").asInstanceOf[Long]
  }

  /** Full-table scan; `partitionOn` enables parallel range reads. */
  def readTable(spark: SparkSession, url: String, table: String,
      partitionOn: Option[(String, Long, Long, Int)] = None): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
    partitionOn match {
      case Some((col, lo, hi, n)) =>
        base.option("partitionColumn", col)
          .option("lowerBound", lo).option("upperBound", hi)
          .option("numPartitions", n).load()
      case None => base.load()
    }
  }
}
