package graft

import org.apache.spark.sql.SparkSession
import graft.scale.Dedup

/** Scratch: attribute the 100x warm>cold inversions (BENCH_100x v4: 8
  * queries, +177.5 s, worst q76 +80.6 s; GC and codegen ruled out by the
  * artifact's own diag vectors).
  *
  * Hypothesis: run N's shuffle/spill footprint (~15 GB for the q76 pair
  * sort) survives the measurement boundary — the ShuffleDependency objects
  * are only reclaimed when a GC collects their weak refs and the
  * ContextCleaner's async RPCs then delete the files — so the kernel's
  * writeback of run N's not-yet-deleted dirty pages lands inside run N+1's
  * timed region.
  *
  * Two modes, one fresh JVM each:
  *   - `plain`:   boundary = Pinned.release only (what the first probe did)
  *   - `drained`: boundary = Pinned.release + System.gc() + poll the
  *     session-private spark.local.dir until its size stops shrinking
  *     (bounded), i.e. deterministic shuffle-file deletion BEFORE the next
  *     timed region.
  * Each pass prints wall, GC delta, local-dir bytes before/after boundary,
  * and /proc/meminfo Dirty+Writeback — if `drained` flattens the
  * pass-over-pass curve while `plain` degrades, the attribution is proven
  * and the fix is a drain-aware boundary in Bench.
  */
object ProbeQ76 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/scale100"
    val mode = if (args.length > 1) args(1) else "plain"
    val passes = if (args.length > 2) args(2).toInt else 3
    // pid-scoped (two concurrent probes must not share a scratch dir, and
    // a crashed probe's leftovers must not skew the next run's duBytes
    // baseline); name shape matches Sink.sweepDead so dead probes' dirs
    // are reaped on the next start
    val localDir = s"/tmp/probeq76-localp${ProcessHandle.current.pid}_$mode"
    graft.scale.Sink.sweepDead("/tmp", "probeq76-local")
    graft.scale.Sink.deleteOnExit(localDir)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", localDir)
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    }
    // deletion-tolerant: the drain loop polls while the ContextCleaner is
    // removing files (graft.core.Scratch scaladoc)
    def duBytes(): Long = graft.core.Scratch.duBytes(localDir)
    def dirtyKb(): (Long, Long) = {
      val lines = scala.io.Source.fromFile("/proc/meminfo").getLines().toSeq
      def grab(k: String) = lines.find(_.startsWith(k))
        .map(_.split("\\s+")(1).toLong).getOrElse(-1L)
      (grab("Dirty:"), grab("Writeback:"))
    }
    /** gc + poll the local dir until its size is stable-or-small; returns
      * (drain wall ms, bytes before, bytes after). */
    def drain(maxMs: Long): (Long, Long, Long) = {
      val before = duBytes()
      val t0 = System.nanoTime()
      System.gc()
      var last = before
      var stable = 0
      while (stable < 3 && (System.nanoTime() - t0) / 1e6 < maxMs) {
        Thread.sleep(200)
        val now = duBytes()
        if (now >= last - (16 << 20)) stable += 1 else stable = 0
        last = now
      }
      (((System.nanoTime() - t0) / 1e6).toLong, before, last)
    }

    def pass(name: String)(f: => Long): Unit = {
      val (d0, w0) = dirtyKb()
      val g0 = gcMs(); val t0 = System.nanoTime()
      val n = f
      val secs = (System.nanoTime() - t0) / 1e9
      val (d1, w1) = dirtyKb()
      println(f"PROBEQ76 $mode%-8s $name%-12s $secs%8.2f s  gc=${gcMs() - g0}%6d ms  rows=$n  dirtyKb=$d0->$d1 wbKb=$w0->$w1  localDir=${duBytes() >> 20} MB")
      graft.core.Pinned.release(blocking = true)
      if (mode == "drained") {
        val (ms, b, a) = drain(60000)
        println(f"PROBEQ76 $mode%-8s $name%-12s boundary drain ${ms}ms ${b >> 20}MB -> ${a >> 20}MB")
      }
    }

    pass("warmup")(docs.count())
    (1 to passes).foreach { i =>
      pass(s"sorted_run$i")(
        Dedup.simhashPairs(docs, "doc_id", "text", 3, 4)
          .orderBy("id_a", "id_b").queryExecution.toRdd.count())
    }
    spark.stop()
    // scratch local dir is session-private; remove it so repeated probes
    // start clean (deleteOnExit also covers it; this frees space promptly)
    graft.core.Scratch.rmTree(new java.io.File(localDir))
  }
}
