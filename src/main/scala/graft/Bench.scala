package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus)
    // warmup: file index + parquet footers + codegen + shuffle
    // machinery for EVERY table, so one-time JVM/IO costs don't land
    // on whichever query touches a table first — per-query times then
    // measure the operator, not initialization order (best-effort: a
    // missing table must not kill the whole bench)
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    catch { case _: Throwable => () }
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    // events needs the nanos normalization — warm it through the loader
    try graft.ops.Tables.events(spark, sfDir).count()
    catch { case _: Throwable => () }
    // SPARK_GRAFT_RUNS (default 2) — min-of-N timed runs per query.
    // Recorded artifact runs use 3 (BASELINE.md: ±10-15% cross-run
    // container variance; a third sample damps it enough that
    // round-over-round comparison stops needing a noise disclaimer,
    // for ~+80 s per suite); iteration runs keep 2.
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt)
    var failed = List.empty[String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      // min of N timed runs: one noisy-neighbor stall (container
      // contention skewed a recorded round ~1.6×) can't fake a
      // regression; min — not mean — because contention only ever
      // ADDS time to a deterministic workload. Any failure voids the
      // query entirely (0.0 + `failed`, later runs short-circuited) —
      // a failed query must never carry a plausible-looking time.
      var ok = true
      var best = Double.MaxValue
      var run = 0
      while (ok && run < runs) {
        run += 1
        val t0 = System.nanoTime()
        // noop sink materializes EVERY output column — a bare count()
        // would let Catalyst prune the projections being benchmarked
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        } catch { case _: Throwable => ok = false; failed ::= name }
      }
      // storage hygiene between queries: graph/dedup operators
      // localCheckpoint intermediate frames and then drop the
      // references — reclamation is ContextCleaner-async and
      // GC-driven, so without a nudge orphaned blocks pile up across
      // the 164-query suite and later queries run under storage
      // pressure the operator itself never created (the streaming
      // cluster runs lexicographically AFTER the graph family).
      // Deliberately pinned per-JVM artifacts (keepBestCache,
      // zorderedLineitem, shingleCache) stay reachable and survive.
      System.gc()
      // per-query progress on stderr (stdout stays the single JSON
      // line): when a long suite run dies mid-flight — the r10 100×
      // OOM killed the JVM with zero attribution — the last line
      // names the query that was running, and the free-heap figure
      // shows whether pressure was accumulating across the suite
      val rt = Runtime.getRuntime
      val headroom = rt.maxMemory() - rt.totalMemory() + rt.freeMemory()
      System.err.println(f"[bench] $name%s ${if (ok) best else -1.0}%.3f s " +
        f"heap_headroom=${headroom / (1 << 20)}%d MiB")
      name -> (if (ok) best else 0.0)
    }
    failed = failed.distinct
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString
    }
    // ms precision: full Double digits made the one-line JSON long
    // enough that a prior round's stdout-tail capture truncated its
    // HEAD and the recorder parsed null — sub-ms digits are container
    // noise anyway. Double.toString (not %f) is locale-independent:
    // a comma decimal point would not be JSON.
    def sec(v: Double): String = (math.round(v * 1000) / 1000.0).toString
    // per-query entries in DESCENDING time order: if a log capture
    // truncates the line's tail, what survives is the headline totals
    // plus the most expensive queries — the entries a reader actually
    // needs; the cheap tail is what gets lost
    val qs = results.toSeq.sortBy { case (k, v) => (-v, k) }
      .map { case (k, v) => "\"" + esc(k) + "\":" + sec(v) }
      .mkString("{", ",", "}")
    val failedJson = failed.sorted.map(n => "\"" + esc(n) + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // provenance stamp (round-13 ask 5): min-of-N vs min-of-3 artifacts
    // and a loaded-vs-quiet box must be distinguishable from the JSON
    // alone — the r12 sf0.1 artifact shipped a 3.3x q148 "regression"
    // that took an isolated re-measurement to adjudicate as ambient
    // contention; load1m at exit is the cheap tell the 100x recorder
    // already carries in spirit (its runner script logs heap/quiet)
    val heapGib = Runtime.getRuntime.maxMemory() / (1L << 30)
    val load1m = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val prov = s""""runs":$runs,"heap_gib":$heapGib,"load1m":${sec(load1m)},"shuffle_partitions":"${esc(spark.conf.get("spark.sql.shuffle.partitions"))}""""
    val json = s"""{"metric":"total","value":${sec(total)},"unit":"sec",$prov,"queries":$qs,"failed":$failedJson,"sf":"${esc(sfDir)}"}"""
    println(json)
    // also land the JSON in a file so the recorded artifact never
    // depends on stdout-tail capture (a prior round's artifact lost
    // the JSON head to log truncation)
    try {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
      java.nio.file.Files.write(java.nio.file.Paths.get("target/bench.json"),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case _: Exception => () }
    graft.ops.InferOps.cleanupScratch()
    spark.stop()
    // FINAL stdout line: a size-bounded copy of the headline. The
    // recorder keeps only the last ~2,000 chars of stdout, and the
    // full per-query map (135 queries) alone exceeds that — so the
    // last line carries the same totals/failed/sf with the queries
    // map truncated to the most expensive entries that fit a 1,600-
    // char budget (complete, parseable JSON either way; the FULL map
    // is in target/bench.json and in the first println above).
    val budget = 1600 - (json.length - qs.length + 2 /* "{}" */)
    val entries = results.toSeq.sortBy { case (k, v) => (-v, k) }
      .map { case (k, v) => "\"" + esc(k) + "\":" + sec(v) }
    val fit = new StringBuilder
    entries.takeWhile { e =>
      val grew = fit.length + e.length + 1 <= budget
      if (grew) { if (fit.nonEmpty) fit.append(','); fit.append(e) }
      grew
    }
    println(s"""{"metric":"total","value":${sec(total)},"unit":"sec",$prov,"queries":{$fit},"failed":$failedJson,"sf":"${esc(sfDir)}"}""")
    if (failed.nonEmpty) sys.exit(1)
  }
}
