package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch (r19): interleaved same-JVM A/B of lyapE's fused radius window
  * vs the replaced rad-join shape (`fusedRadius` param), q106's exact input.
  * Both variants sample every weather window; min cells decide.
  * Usage: runMain graft.ProbeLyapAB [sfDir] [rounds]
  */
object ProbeLyapAB {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/scale100"
    val rounds = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) cpuNs.addAndGet(e.taskMetrics.executorCpuTime)
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    def q106(fused: Boolean): Long = {
      val ev = graft.core.TsCompat.readEvents(spark, s"$dir/events.parquet")
      graft.scale.GroupedStats.lyapE(
        ev.where(col("user_id") % 10 === 0)
          .select(col("user_id"), col("ts"), col("value")),
        "user_id", "ts", "value", minTsep = 5, minNb = 6, fusedRadius = fused)
        .select(col("user_id").cast("long").as("user_id"),
          round(col("lyap_e_1"), 6).as("lyap_e_1"),
          round(col("lyap_e_2"), 6).as("lyap_e_2"))
        .orderBy("user_id")
        .queryExecution.toRdd.count()
    }
    // codegen/JIT-warm both variants
    Seq(false, true).foreach { f => q106(f); graft.core.Pinned.release(blocking = true) }
    val best = scala.collection.mutable.Map.empty[Boolean, (Double, Double)]
    for (r <- 1 to rounds; f <- Seq(false, true)) {
      Thread.sleep(200); cpuNs.set(0)
      val t0 = System.nanoTime()
      q106(f)
      val s = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val c = cpuNs.get / 1e9
      graft.core.Pinned.release(blocking = true)
      System.gc(); Thread.sleep(120)
      val (bs, bc) = best.getOrElse(f, (Double.MaxValue, Double.MaxValue))
      best(f) = (math.min(bs, s), math.min(bc, c))
      println(f"PROBELYAP r$r fused=$f $s%6.2f s cpu=$c%6.1f s")
    }
    val (so, co) = best(false); val (sn, cn) = best(true)
    println(f"PROBELYAP MIN old=$so%.2f/$co%.1f fused=$sn%.2f/$cn%.1f " +
      f"wall_speedup=${so / sn}%.2f cpu_speedup=${co / cn}%.2f")
    spark.stop()
  }
}
