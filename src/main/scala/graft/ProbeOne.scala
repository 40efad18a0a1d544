package graft

import org.apache.spark.sql.SparkSession

/** Scratch: time a single SparkEntry query in a fresh JVM after a warmup. */
object ProbeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // r17: per-run executor-CPU alongside wall — CPU is wall-independent
    // (neighbor contention inflates wall, not CPU), so an A/B differential
    // on a noisy box reads the cpu= cells, not the s cells
    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) cpuNs.addAndGet(e.taskMetrics.executorCpuTime)
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.queries("q00_tpch_q1")(spark, dir).queryExecution.toRdd.count()
    graft.core.Pinned.release(blocking = true) // warmup blocks are not run1's problem
    val passes = if (args.length > 2) args(2).toInt else 2
    (1 to passes).foreach { i =>
      val gc0 = gcMs()
      Thread.sleep(300) // let the async listener bus drain the prior run
      cpuNs.set(0)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"PROBEONE $name run$i $secs%.2f s gc=${gcMs() - gc0} ms " +
        f"cpu=${cpuNs.get / 1e9}%.1f s")
      // like every other harness: a run must not pay (or hide) its
      // predecessor's retained checkpoint debt
      graft.core.Pinned.release(blocking = true)
    }
    spark.stop()
  }

  private def gcMs(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum
  }
}
