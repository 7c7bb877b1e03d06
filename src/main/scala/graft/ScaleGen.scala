package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derives a larger benchmark dataset from a provisioned scale factor
 *  by replicating each table `copies`× inside one Spark plan (a
 *  crossJoin against `range(copies)` — one scan, no driver loop) with
 *  every entity key shifted by a per-copy offset, so referential
 *  joins (orders↔lineitem, customer↔orders, events↔customer) stay
 *  exactly as selective as the source.
 *
 *  Deliberate choices for honest scaling behavior:
 *  - dimension tables (region, nation) are NOT replicated — at any
 *    scale they stay broadcast-sized, like real dimensions;
 *  - document text gets a per-copy token suffix (copy 0 untouched),
 *    so the planted near-dup structure replicates LINEARLY and no
 *    cross-copy shingle collisions manufacture quadratic pair work
 *    the source corpus doesn't have;
 *  - embeddings get a deterministic per-copy, per-dimension
 *    perturbation (±3%): byte-identical clones would share every LSH
 *    bucket and IVF cell BY CONSTRUCTION, making the q61 ANN recall
 *    gates vacuous at derived scale — perturbed near-clones force the
 *    approximate indexes to actually find near-neighbors. The fixed
 *    query set (vec_id < 10) lives in copy 0 and is NOT perturbed, so
 *    kNN probes a 10× corpus with the same number of queries — the
 *    actual scale-up shape;
 *  - the embedding `label` BLOCKING key is shifted per copy (+1000·c):
 *    q25's contract is that blocks stay bounded because a real
 *    blocking key's cardinality (IVF cells, LSH buckets) scales with
 *    the corpus. Holding the 10-label space fixed while growing the
 *    data made every block `copies`× bigger and the block-local
 *    quadratic cost `copies`²× — the round-5 50× gate measured q25 at
 *    350.8 s (≈2500× work from 50× data) before this fix. Shifting
 *    the key keeps block size invariant, which is exactly how the
 *    operator meets its own scaladoc at scale.
 *
 *  Usage: runMain graft.ScaleGen [srcDir] [outDir] [copies]
 */
object ScaleGen {

  /** Per-copy key offset — far above any key in the provisioned data.
   *  Exposed so specs reference the same constant they partition by. */
  private[graft] val Off = 10_000_000_000L

  /** Graph seed pack (round 11): sf0.1's natural c≥2 co-purchase
   *  graph has an EMPTY 3-core and no surviving cn≥2 wedge pair, so
   *  the q168/q170 octave gates were exactly-empty at 10×/100× —
   *  agreement-on-empty is not evidence the operators are right at
   *  scale. Every derivation therefore appends a tiny deterministic
   *  structure (6 orders / 24 lineitem rows, invariant in `copies`)
   *  in a reserved order-key space above every shifted copy:
   *   - a 6-part clique: two identical orders over parts 1–6 → all
   *     15 pairs at c=2, in-clique degree 5 → a non-empty 3-core at
   *     any octave;
   *   - two duplicated wedges ({11,23,31}×2 and {197,23,31}×2):
   *     parts 11 and 197 share common neighbors {23,31} without ever
   *     co-occurring (verified: no natural c≥2 edge among these
   *     parts at sf0.01 or sf0.1) → a non-empty link-prediction
   *     candidate at any octave.
   *  Matching orders rows (custkey 1) keep referential integrity.
   *  Both engines read the same seeded parquet and every oracle
   *  recomputes over it, so the gates become POPULATED, not biased. */
  private[graft] val SeedLineitemRows = 24L
  private[graft] val SeedOrderRows = 6L
  private[graft] def seedOrders(copies: Int): Seq[(Long, Seq[Long])] = {
    val okBase = copies.toLong * Off
    Seq(
      (okBase + 1) -> Seq(1L, 2L, 3L, 4L, 5L, 6L),
      (okBase + 2) -> Seq(1L, 2L, 3L, 4L, 5L, 6L),
      (okBase + 3) -> Seq(11L, 23L, 31L),
      (okBase + 4) -> Seq(11L, 23L, 31L),
      (okBase + 5) -> Seq(197L, 23L, 31L),
      (okBase + 6) -> Seq(197L, 23L, 31L))
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    // optional 4th arg: comma-separated table subset — lets a probe
    // derive ONE table at an extreme octave (e.g. embeddings at
    // 1000× for the two-level IVF tier) without replicating 600M
    // lineitem rows it will never read
    val tables: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").map(_.trim).toSet) else None
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    try run(spark, src, out, copies, tables) finally spark.stop()
  }

  /** Body with a caller-owned session (testable). */
  def run(spark: SparkSession, src: String, out: String, copies: Int,
      tables: Option[Set[String]] = None): Unit = {
    def wanted(name: String): Boolean = tables.forall(_.contains(name))

    def replicate(name: String, keys: Seq[String],
        extra: DataFrame => DataFrame = identity): Unit = {
      if (!wanted(name)) return
      val base = spark.read.parquet(s"$src/$name.parquet")
      // repartition the SMALL source BEFORE the crossJoin: the range
      // side broadcasts, so the amplification inherits the source's
      // partitioning — a 2-file source would amplify (and write) on 2
      // threads, which at 1000× left one task carrying 600 M rows for
      // ~30 min (measured; jstack showed a single straggler writer).
      // 32 even source slices amplify on all 32 threads and land as 32
      // even output files directly — no post-amplification shuffle of
      // the data-sized frame at all (the old tail repartition(32)
      // re-exchanged the full derived table: 29 GiB of blockmgr at
      // 1000× for zero layout benefit).
      val amplified = base.repartition(32)
        .crossJoin(spark.range(copies).select(col("id").as("__copy")))
      val shifted = keys.foldLeft(amplified) { (df, k) =>
        df.withColumn(k, col(k) + col("__copy") * Off)
      }
      extra(shifted).select(base.columns.map(col).toIndexedSeq: _*)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scalegen] $name x$copies -> $out/$name.parquet")
    }

    def copyAsIs(name: String): Unit = {
      if (!wanted(name)) return
      spark.read.parquet(s"$src/$name.parquet")
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scalegen] $name (dimension, 1x) -> $out/$name.parquet")
    }

    copyAsIs("region")
    copyAsIs("nation")
    replicate("customer", Seq("c_custkey"))
    replicate("supplier", Seq("s_suppkey"))
    replicate("part", Seq("p_partkey"))
    replicate("orders", Seq("o_orderkey", "o_custkey"))
    replicate("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    // events.parquet is TIMESTAMP(NANOS): read as long (nanosAsLong)
    // and write MICROS timestamps — Tables.events passes TimestampType
    // through, and the DuckDB oracle binds ts as TIMESTAMP (raw int64
    // nanos would break every ts-typed oracle on the derived dir).
    // Re-scaling an already-derived dir reads micros directly — only
    // convert when ts actually loaded as raw nanos. The flag is
    // restored afterwards: run() may execute on a caller-owned
    // session whose other reads must not inherit it.
    val prevNanos = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try replicate("events", Seq("event_id", "user_id"), graft.ops.Tables.normalizeTs)
    finally prevNanos match {
      case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
      case None    => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    }
    appendGraphSeed(spark, out, copies, wanted)
    replicate("documents", Seq("doc_id"), df => df
      .withColumn("text", when(col("__copy") === 0, col("text"))
        .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
          concat(lit("$1_c"), col("__copy")))))
      .withColumn("n_chars", length(col("text")).cast("long")))
    // copy 0 exact; copies 1+ scaled per (copy, dim) by 1 ± 3%,
    // derived from xxhash64(copy, dim) — non-periodic in the copy
    // index (a simple linear-mod mix repeated factors every 13
    // copies, silently recreating byte-identical clones at ≥15×)
    replicate("embeddings", Seq("vec_id"), df => df
      .withColumn("embedding", when(col("__copy") === 0, col("embedding"))
        .otherwise(transform(col("embedding"), (x, i) =>
          (x * (lit(1.0) +
            (pmod(xxhash64(col("__copy"), i), lit(13)) - 6) * lit(0.005)))
            .cast("float"))))
      // blocking-key cardinality scales with the corpus (see header):
      // int-safe for any label < 1000 and any copies < 2^21
      .withColumn("label",
        (col("label") + col("__copy") * lit(1000)).cast("int")))
  }

  /** Append the [[seedOrders]] graph pack to the derived lineitem and
   *  orders dirs (column order and types matched to the provisioned
   *  parquet exactly — DuckDB's multi-file reader requires it). */
  private def appendGraphSeed(spark: SparkSession, out: String, copies: Int,
      wanted: String => Boolean): Unit = {
    import spark.implicits._
    val pack = seedOrders(copies)
    if (wanted("lineitem")) {
      val rows = for { (ok, parts) <- pack; (pk, i) <- parts.zipWithIndex }
        yield (ok, pk, 1L, i + 1, 1.0, 100.0, 0.0, 0.0, "N", "O")
      rows.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
          "l_quantity", "l_extendedprice", "l_discount", "l_tax",
          "l_returnflag", "l_linestatus")
        .withColumn("l_shipdate", lit("1996-06-01 00:00:00").cast("timestamp"))
        .coalesce(1)
        .write.mode("append").parquet(s"$out/lineitem.parquet")
      println(s"[scalegen] lineitem += ${SeedLineitemRows} graph-seed rows")
    }
    if (wanted("orders")) {
      pack.map { case (ok, parts) => (ok, 1L, "O", 100.0 * parts.length, "3-MEDIUM") }
        .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderpriority")
        .withColumn("o_orderdate", lit("1996-06-01 00:00:00").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate"), col("o_orderpriority"))
        .coalesce(1)
        .write.mode("append").parquet(s"$out/orders.parquet")
      println(s"[scalegen] orders += ${SeedOrderRows} graph-seed rows")
    }
  }
}
