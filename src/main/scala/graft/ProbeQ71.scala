package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.{FeatureCollection, FeatureDescriptor}
import graft.core.FeatureFuncs._
import graft.core.Win

/** Scratch: per-feature ablation of q71's fused aggregate at scale —
  * attributes the window-CPU between the assignment/collect floor, the two
  * exact-Percentile aggregates behind `iqr`, the sorted-collect kernel
  * family and the binned-entropy collect. Interleaved pass-major (every
  * variant in every weather window), min-CPU cells are the decision values
  * (SCALE.md noisy-box discipline).
  *
  * Usage: runMain graft.ProbeQ71 [sfDir] [passes]
  */
object ProbeQ71 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/scale100")
    val passes = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) cpuNs.addAndGet(e.taskMetrics.executorCpuTime)
    })

    def series = graft.core.Series("value",
      graft.core.TsCompat.readEvents(spark, s"$dir/events.parquet"),
      "ts", "value")
    def run(fns: Seq[graft.core.FeatureFunc]): Long = {
      val fc = FeatureCollection.of(fns.map(f => FeatureDescriptor(f, "value",
        Some(Win.time("1D")), Some(Seq(Win.time("6h"))))))
      fc.calculate(Seq(series)).queryExecution.toRdd.count()
    }
    val variants: Seq[(String, Seq[graft.core.FeatureFunc])] = Seq(
      "all6" -> Seq(absEnergy, iqr, crossings(40.0).as("nc"),
        meanCrossings, autocorr(1), binnedEntropy(5)),
      "absEnergy" -> Seq(absEnergy),
      "iqr" -> Seq(iqr),
      "sortfam" -> Seq(crossings(40.0).as("nc"), meanCrossings, autocorr(1)),
      "binned" -> Seq(binnedEntropy(5)))

    // warmup
    run(Seq(graft.core.FeatureFuncs.len))
    graft.core.Pinned.release(blocking = true)
    (1 to passes).foreach { p =>
      variants.foreach { case (name, fns) =>
        Thread.sleep(200); cpuNs.set(0)
        val t0 = System.nanoTime()
        run(fns)
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200)
        println(f"PROBEQ71 pass$p $name%-10s $secs%7.2f s cpu=${cpuNs.get / 1e9}%7.1f s")
        graft.core.Pinned.release(blocking = true)
      }
    }
    spark.stop()
  }
}
