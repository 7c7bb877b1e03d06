package graft

import org.apache.spark.sql.SparkSession

/** Shared session factory for the driver-contract mains — Verify and
  * Bench MUST run under identical settings or bench timings would not
  * describe the correctness run. */
object GraftSession {
  def local(cpus: String): SparkSession = {
    // pid-keyed warehouse: managed tables (the durable index
    // generations of q80/q96/q166) must not land in the repo cwd
    // nor collide when two graft JVMs overlap on one machine; the
    // dir is registered for exit-time deletion so long bench
    // campaigns don't accumulate orphaned corpus-sized warehouses
    val warehouse = s"${sys.props("java.io.tmpdir")}/graft_warehouse_" +
      s"${ProcessHandle.current().pid()}"
    graft.ops.InferOps.registerScratch(warehouse)
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      // default: one shuffle partition per executor thread (right for
      // the sf0.01–100× ladder); SPARK_GRAFT_SHUFFLE_PARTITIONS lifts
      // it at the larger octaves so per-partition sort/agg state keeps
      // fitting the per-thread heap share — the "size
      // spark.sql.shuffle.partitions to the SF" rule as a knob
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // allow subset-key co-partitioning (default true REQUIRES all
      // join keys as partition keys): the q114-class verification
      // joins probe a frame parked hash-partitioned by doc_id into a
      // (doc_id, k1, k2) equi-join — with the default, Spark re-
      // exchanged the corpus-sized parked side once per chunk pass
      // (the round-14 stage-dump's 16× redundancy); with subset
      // co-partitioning the parked frame never moves and only the
      // probe side exchanges, re-keyed to the matching subset. The
      // skew the default guards against (all of a join key's rows in
      // one partition) is bounded here by clone-cluster width — the
      // same bound the candidate fold already documents.
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.ui.enabled", "false")
      // lz4 for persisted/localCheckpoint blocks (default is OFF,
      // unlike shuffle compression): the q114-class operators park a
      // corpus-sized frame in the block manager while 3–4 data-sized
      // exchanges run beside it — at the 1000× octave the uncompressed
      // checkpoint alone was ~¼ of the scratch that killed the probe.
      // The heaviest reader is the iterative-graph family: its
      // DISK_ONLY edge frame is re-read 11× per query (10 PageRank
      // rounds + the deg join), paying lz4 decompression every round.
      // Measured (round-13 adjudication, quiet box, sf0.1): the trade
      // is a wash — q148 warm 6.4 s compressed vs 6.5-7.1 s raw — so
      // compression stays default-on at every octave;
      // SPARK_GRAFT_RDD_COMPRESS=false remains as the documented
      // opt-out should a future workload tip the balance.
      .config("spark.rdd.compress",
        sys.env.getOrElse("SPARK_GRAFT_RDD_COMPRESS", "true"))
      .config("spark.sql.warehouse.dir", warehouse)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
