package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{FeatureFuncs, Win}

/** Scratch: interleaved same-JVM A/B of the r19 decomposable-aggregate cell
  * rollup in KeyedFeatures.calculateWideMulti (the q72 shape) — both
  * variants in every weather window, wall + executor-CPU per run, noop-sink
  * timing. Usage: runMain graft.ProbeQ72AB [dataDir] [passes]
  */
object ProbeQ72AB {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/scale100"
    val passes = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) cpuNs.addAndGet(e.taskMetrics.executorCpuTime)
    })
    val ev = graft.core.TsCompat.readEvents(spark, s"$dir/events.parquet")
      .select(col("user_id"), col("ts"), col("value"))
    def q72(rollup: Boolean) =
      api.KeyedFeatures.calculateWideMulti(ev, "user_id", "ts",
        Seq((Win.time("6h"): Win) -> Seq(Win.time("6h"): Win),
            (Win.time("1D"): Win) -> Seq(Win.time("6h"): Win)),
        unary = Seq("value" -> FeatureFuncs.len, "value" -> FeatureFuncs.mean),
        fusedAggregate = rollup)
    spark.range(1000000).selectExpr("sum(id)").collect()
    def run(label: String, rollup: Boolean): Unit = {
      Thread.sleep(300)
      cpuNs.set(0)
      val t0 = System.nanoTime()
      q72(rollup).write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"PROBEQ72AB $label%-12s $secs%7.2f s cpu=${cpuNs.get / 1e9}%7.1f s")
      graft.core.Pinned.release(blocking = true)
    }
    (1 to passes).foreach { i =>
      run(s"r$i row-path", rollup = false)
      run(s"r$i rollup  ", rollup = true)
    }
    spark.stop()
  }
}
