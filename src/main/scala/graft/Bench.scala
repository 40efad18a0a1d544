package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Queries that materialize a localCheckpoint (Dedup, G3) discard the
    // checkpoint's internal plan right after it is computed; its SQLMetric
    // accumulators are weakly referenced, so when a straggler task-end
    // event races a GC the DAGScheduler logs "Failed to update accumulator"
    // with a stack trace. The update loss affects UI metrics only — never
    // results — but it pollutes the bench stderr, so the bench harness
    // (and only it) raises those two loggers above ERROR.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.scheduler.DAGScheduler",
      org.apache.logging.log4j.Level.FATAL)
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.util.AccumulatorContext",
      org.apache.logging.log4j.Level.ERROR)
    // Warm the JVM + codegen + parquet footers once so the first measured
    // query doesn't absorb session startup (~7 s of pure warmup otherwise —
    // whichever query happens to iterate first would be charged for it).
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      SparkEntry.queries.get("q00_tpch_q1").foreach(_(spark, sfDir)
        .queryExecution.toRdd.count())
    } catch { case _: Throwable => }
    // Each query runs TWICE back-to-back: the first run pays whatever the
    // suite context costs (Janino's 100-entry codegen-class cache holds a
    // few hundred generated classes per ~90-query pass, so a query's
    // classes are always evicted by the time a second FULL pass reaches it
    // — the r8-diagnosed wobble); the immediate repeat hits the codegen
    // cache and measures the PLAN. The warm vector is the headline
    // (round-over-round comparable); the cold vector stays in the artifact
    // as the suite-context number.
    val names = SparkEntry.queries.keys.toSeq.sorted
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      // toRdd.count() forces full materialization of every output row
      // (a bare DataFrame.count() lets Catalyst prune the projections,
      // under-measuring compute-heavy queries).
      // a failing query must still leave a trace (the DAGScheduler logger is
      // raised above ERROR for the accumulator-GC noise, so this line is the
      // only diagnostic) — and its timing would otherwise read as a speedup
      try { SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count() }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      // free this query's checkpoint blocks so the next query's time
      // measures ITS plan, not the eviction of accumulated storage debt
      // (observed: a stable ~3.7 s CC query reading 19.8 s under prior
      // queries' retained checkpoints)
      graft.core.Pinned.release()
      // ContextCleaner reclaims dead broadcast/shuffle/accumulator state
      // only when a GC collects their weak references; ~180 query-runs in
      // one JVM accumulate enough un-collected debris that the heaviest
      // multi-round queries (CC fixpoints) read 5-7x slow late in the
      // suite even on an immediate repeat. A GC at the query boundary
      // makes reclamation deterministic instead of landing mid-measurement.
      System.gc()
      sec
    }
    val timed = names.map(n => (n, once(n), once(n))) // (name, cold, warm)
    def jmap(f: ((String, Double, Double)) => Double) =
      timed.map(t => s"\"" + t._1 + "\":" + f(t)).mkString("{", ",", "}")
    val qs = jmap(_._3)        // headline: warm (plan cost, codegen cached)
    val qsCold = jmap(_._2)    // suite-context cost (cache-eviction noise in)
    val total = timed.map(_._3).sum
    val totalCold = timed.map(_._2).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"cold_total":$totalCold,"queries_cold":$qsCold,"sf":"$sfDir","passes":2,"headline":"warm"}"""
    println(json)
    // the stdout line gets tail-truncated by log captures once the suite
    // passes ~90 queries, losing the alphabetically-early per-query times;
    // the file is the complete, committable artifact
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_local.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
