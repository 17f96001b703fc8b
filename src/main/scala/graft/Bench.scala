package graft

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query seconds. Failed
  * queries are reported as -1.0 so a broken query can never masquerade as a
  * fast one, and the failure list is printed to stderr.
  *
  * Measurement discipline (r4 finding: one shared session accumulated
  * enough debris — uncollected broadcasts, shuffle files, GC pressure —
  * to inflate late-alphabet queries up to 8× over their standalone times):
  *
  *   - each query runs `runs` times (default 3) and reports the MEDIAN, so
  *     one GC pause or a cold code-cache can't define a query's number;
  *   - `clearCache()` after every run drops persist()ed intermediates;
  *   - `System.gc()` between queries lets Spark's ContextCleaner reap
  *     dereferenced broadcasts/shuffles before the next query is timed.
  *
  * The reported total is the sum of medians — i.e. the cost of one clean
  * pass over the suite, which is the number BASELINE.md is compared to.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val runs  = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = GraftSession.get(s"local[$cpus]", shufflePartitions = cpus)

    def timeOnce(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok =
        // toRdd.count(), NOT count(): count() wraps the query in a new
        // Aggregate and re-optimizes, letting Catalyst ELIMINATE work the
        // real query does — left outer joins with unique right keys drop
        // out entirely (measured: text_span_dup 0.5 s under count() vs
        // 12 s real) and unused output columns are pruned to a bare scan.
        // toRdd executes the query's own physical plan, producing every
        // output row — what a consumer writing the result would pay.
        try { fn(spark, sfDir).queryExecution.toRdd.count(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // drop per-query persist()ed intermediates
      if (ok) sec else -1.0
    }

    // Locale.ROOT formatting for every number that lands in the JSON —
    // a comma decimal separator under a non-ROOT default locale would
    // corrupt the artifact (the tools/Steady lesson)
    def num(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    def loadAvg: Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

    val loadStart = loadAvg
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val loadBefore = loadAvg
      val times = (1 to runs).iterator
        .map(_ => timeOnce(name, fn))
        .takeWhile(_ >= 0) // a failed run fails the query; don't re-run
        .toSeq
      val loadAfter = loadAvg
      System.gc() // let ContextCleaner reap broadcasts/shuffles off-clock
      val value =
        if (times.length < runs) -1.0
        else {
          val s = times.sorted
          // true median: middle element odd, mean of the two middles even
          // (picking s(runs/2) for even runs would report the WORST run
          // at runs=2)
          if (runs % 2 == 1) s(runs / 2) else (s(runs / 2 - 1) + s(runs / 2)) / 2.0
        }
      (name, value, times, loadBefore, loadAfter)
    }
    val qs = results.map { case (k, v, _, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // Per-run evidence travels IN the artifact (r15 adjudication gap: a
    // 30 s MEDIAN of 3 cannot be told apart from "one 80 s GC run + two
    // 2 s runs" from the median alone). `runs_detail` is each query's
    // raw run array in execution order; `load_detail` the host 1-minute
    // load sampled immediately before and after that query's runs — the
    // tools/Steady canary discipline, so an over-band number can be
    // adjudicated as contention (load ramped) vs regression (quiet box,
    // every run slow) without a re-run.
    val runsDetail = results
      .map { case (k, _, ts, _, _) =>
        "\"" + k + "\":" + ts.map(num).mkString("[", ",", "]")
      }.mkString("{", ",", "}")
    val loadDetail = results
      .map { case (k, _, _, lb, la) => s""""$k":[${num(lb)},${num(la)}]""" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, _, _, _) if v >= 0 => v }.sum
    // Host 1-minute load average at end of run: CPU contention from
    // neighboring JVMs inflates multi-stage shuffle queries superlinearly
    // (measured: 2× oversubscription ⇒ 2.5× on the shingle-dedup queries,
    // 1× on map-only queries), so the number contextualizes the timings.
    val load = loadAvg
    // n_failed/n_queries travel IN the artifact: the process exits 0 even
    // with failed queries (the -1.0 convention), so a consumer checking the
    // exit code alone must still see partial-suite failure in the JSON.
    val nFailed = results.count(_._2 < 0)
    // provenance stamp: the r14 driver artifact overwrote the working
    // tree's bench_last.json and readers mistook whose run it was — the
    // producer travels IN the JSON (driver leaves the env unset)
    val producer = sys.env.getOrElse("SPARK_GRAFT_PRODUCER", "driver")
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$runs,"n_queries":${results.length},"n_failed":$nFailed,"load_avg":$load,"load_avg_start":${num(loadStart)},"producer":"$producer","runs_detail":$runsDetail,"load_detail":$loadDetail}"""
    println(json)
    // The stdout line travels through sbt's [info] prefix and the driver's
    // tail capture, which has truncated it two rounds running — the file
    // is the artifact that can't be mangled in transit.
    java.nio.file.Files.write(java.nio.file.Paths.get("bench_last.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
