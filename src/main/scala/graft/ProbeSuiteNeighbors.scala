package graft

import org.apache.spark.sql.SparkSession

/** Scratch (VERDICT r18 item 4): attribute the 32-core in-suite inflation of
  * the dedup family (q21/q54/q65 read 12.8/5.5/14.7 s in the r18 driver's
  * warm pass vs 5.0/3.4/3.0 isolated, insuite_over_isolated up to 4.95).
  *
  * Three cells per dedup query, same JVM, N reps each:
  *   - iso:        the query alone, full bench boundary hygiene between reps
  *                 (Pinned.release(blocking) + System.gc + settle);
  *   - ctx+boundary: the 12 bench-order PREDECESSOR queries first (the
  *                 suite context the warm pass actually runs under — for
  *                 q21 that includes the streaming replays q112/q113), each
  *                 with the bench's boundary hygiene, then the dedup query;
  *   - ctx-no-release: same predecessors but NO Pinned release / GC at any
  *                 boundary — the accumulated-checkpoint-debt hypothesis
  *                 (the WARN-spam suspect from the r18 VERDICT).
  *
  * ctx≈iso on a quiet box + ctx-no-release ≫ iso would confirm checkpoint
  * debt; all three ≈ equal says the r18 gap was ambient (weather
  * amplification of the trio's many sequential barriers), pointing at
  * barrier-count reduction, not release policy.
  * Usage: runMain graft.ProbeSuiteNeighbors [sfDir] [reps]
  */
object ProbeSuiteNeighbors {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.toSeq.sorted
    val family = Seq("q21_dedup_jaccard", "q54_dup_clusters", "q65_dedup_keep_one")

    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def runOne(n: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    def boundary(): Unit = {
      graft.core.Pinned.release(blocking = true)
      System.gc()
      Thread.sleep(120)
    }

    // JIT/codegen warm like the bench
    spark.range(1000000).selectExpr("sum(id)").collect()
    runOne("q00_tpch_q1"); boundary()
    family.foreach { q => runOne(q); boundary() } // codegen-warm the trio

    for (q <- family) {
      val preds = names.takeWhile(_ != q).takeRight(12)
      def cell(label: String, withBoundary: Boolean, withCtx: Boolean): Unit = {
        val vals = (1 to reps).map { _ =>
          if (withCtx) preds.foreach { p =>
            try runOne(p) catch { case _: Throwable => () }
            if (withBoundary) boundary()
          }
          val gc0 = gcMs()
          val s = runOne(q)
          val gcIn = gcMs() - gc0
          boundary() // always clean AFTER the measured cell
          (s, gcIn)
        }
        val mn = vals.map(_._1).min
        println(f"PROBENEIGHBORS $q $label%-16s min=$mn%6.2f s " +
          f"all=${vals.map(v => f"${v._1}%.2f").mkString(",")} " +
          f"gc_ms=${vals.map(_._2).mkString(",")}")
      }
      cell("iso", withBoundary = true, withCtx = false)
      cell("ctx+boundary", withBoundary = true, withCtx = true)
      cell("ctx-no-release", withBoundary = false, withCtx = true)
      boundary()
    }
    spark.stop()
  }
}
