package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.api.{FeatureCollection, NaryFeatureDescriptor}
import graft.core.{NaryFuncs, Series, Win}

/** Scratch (r19): interleaved same-JVM A/B of the same-source tuple fusion
  * (`fuseSameSourceTuples`) on q38/q51's exact inputs. Min cells decide.
  * Usage: runMain graft.ProbeNaryAB [sfDir] [rounds]
  */
object ProbeNaryAB {
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
    def q38(fuse: Boolean): Long = {
      val ev = graft.core.TsCompat.readEvents(spark, s"$dir/events.parquet")
        .withColumn("vsq", col("value") * col("value"))
      val win = Some(Win.time("1D")); val st = Some(Seq(Win.time("6h")))
      FeatureCollection(
        NaryFeatureDescriptor(NaryFuncs.corr2, Seq("v", "vsq"), win, st),
        NaryFeatureDescriptor(NaryFuncs.covar, Seq("v", "vsq"), win, st))
        .calculate(Seq(Series("v", ev, "ts", "value"),
          Series("vsq", ev, "ts", "vsq")), fuseSameSourceTuples = fuse)
        .queryExecution.toRdd.count()
    }
    def q51(fuse: Boolean): Long = {
      val ev = graft.core.TsCompat.readEvents(spark, s"$dir/events.parquet")
        .select(col("ts"), col("value").as("a"),
          col("user_id").cast("double").as("b"),
          (col("event_id") % 7 + 1).cast("double").as("w"))
      FeatureCollection(NaryFeatureDescriptor(NaryFuncs.wcorr,
          Seq("a", "b", "w"), Some(Win.time("1D")), Some(Seq(Win.time("6h")))))
        .calculate(Seq(Series("a", ev, "ts", "a"), Series("b", ev, "ts", "b"),
          Series("w", ev, "ts", "w")), fuseSameSourceTuples = fuse)
        .queryExecution.toRdd.count()
    }
    val qs: Seq[(String, Boolean => Long)] = Seq("q38" -> q38, "q51" -> q51)
    for ((n, f) <- qs; v <- Seq(false, true)) { f(v); graft.core.Pinned.release(blocking = true) }
    val best = scala.collection.mutable.Map.empty[(String, Boolean), (Double, Double)]
    for (r <- 1 to rounds; v <- Seq(false, true); (n, f) <- qs) {
      Thread.sleep(200); cpuNs.set(0)
      val t0 = System.nanoTime()
      f(v)
      val s = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val c = cpuNs.get / 1e9
      graft.core.Pinned.release(blocking = true)
      System.gc(); Thread.sleep(120)
      val k = (n, v)
      val (bs, bc) = best.getOrElse(k, (Double.MaxValue, Double.MaxValue))
      best(k) = (math.min(bs, s), math.min(bc, c))
      println(f"PROBENARY r$r $n fuse=$v $s%6.2f s cpu=$c%6.1f s")
    }
    for ((n, _) <- qs) {
      val (so, co) = best((n, false)); val (sn, cn) = best((n, true))
      println(f"PROBENARY MIN $n join=$so%.2f/$co%.1f fused=$sn%.2f/$cn%.1f " +
        f"wall_speedup=${so / sn}%.2f cpu_speedup=${co / cn}%.2f")
    }
    spark.stop()
  }
}
