package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: run the PlanAudit.PinnedPlans set against a
  * materialized scaled corpus (ScaleData output) with the NARROW-AMPLIFIER
  * rule live at its at-scale thresholds — the 100× counterpart of
  * NarrowAmplifierSpec's sf0.1 gate. Flags BOTH rule variants: the
  * absolute one (few tasks writing >256 MB, the ScaleSmoke rule) and the
  * record-amplification one the spec uses (PlanAudit.narrowAmplifier).
  * Exits non-zero if any query FLAGGED or FAILED — a run where a plan
  * threw must not read as a clean zero-flag certification.
  *
  * Usage: runMain graft.ProbeAmplifier <dataDir> [threads=32]
  */
object ProbeAmplifier {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val threads = if (args.length > 1) args(1) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cores = spark.sparkContext.defaultParallelism
    val flags = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val m = i.taskMetrics
        if (m == null) return
        seen.incrementAndGet()
        val inRec = m.inputMetrics.recordsRead
        val shRec = m.shuffleReadMetrics.recordsRead
        val write = m.shuffleWriteMetrics.bytesWritten
        val wRec = m.shuffleWriteMetrics.recordsWritten
        val absolute = PlanAudit.absoluteNarrow(i.numTasks, cores, write)
        val amplify = PlanAudit.narrowAmplifier(
          i.numTasks, cores, inRec, shRec, write, wRec)
        if (absolute || amplify)
          flags.add(s"tasks=${i.numTasks} write=$write wRec=$wRec " +
            s"read=${inRec + shRec} rule=${if (absolute) "ABS" else "AMP"} " +
            s"stage=${i.stageId}")
      }
    })
    var totalFlags = 0
    var failed = 0
    for (name <- PlanAudit.PinnedPlans) {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
      catch { case e: Throwable =>
        failed += 1
        println(s"AMPPROBE $name FAILED ${e.getClass.getSimpleName}") }
      val secs = (System.nanoTime() - t0) / 1e9
      // a timed-out drain = flags possibly read before trailing events
      // landed — count it as a failure so the summary (and the probe's
      // non-zero exit) can't read as clean on an undrained bus
      if (!PlanAudit.drainListenerBus(spark, () => seen.get)) {
        failed += 1
        println(s"AMPPROBE $name DRAIN-TIMEOUT (bus not proven empty)")
      }
      import scala.jdk.CollectionConverters._
      val f = flags.asScala.toSeq; flags.clear()
      totalFlags += f.size
      println(f"AMPPROBE $name%-26s ${secs}%7.1f s  flags=${f.size}")
      f.foreach(x => println(s"  FLAG $x"))
      graft.core.Pinned.release(blocking = true)
      System.gc()
    }
    println(s"AMPPROBE SUMMARY flags=$totalFlags failed=$failed " +
      s"of ${PlanAudit.PinnedPlans.size}")
    spark.stop()
    if (totalFlags > 0 || failed > 0) sys.exit(1)
  }
}
