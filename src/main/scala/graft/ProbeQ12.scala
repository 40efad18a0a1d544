package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch (r19, VERDICT item 6): component ablation of
  * q12_group_by_consecutive at the 100× corpus — which of the G3 pipeline's
  * passes (lag-flag scan, run table, forward-fill assignment, feature
  * aggregate, output join) owns the executor CPU. Mirrors
  * FeatureCollection.calculateGroupByConsecutive stage by stage through the
  * public Scan API. Usage: runMain graft.ProbeQ12 [sfDir] [passes]
  */
object ProbeQ12 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/scale100"
    val passes = if (args.length > 1) args(1).toInt else 2
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

    def cell(name: String)(f: => Long): Unit = {
      Thread.sleep(200); cpuNs.set(0)
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"PROBEQ12 $name%-22s $s%7.2f s cpu=${cpuNs.get / 1e9}%7.1f s rows=$n")
      graft.core.Pinned.release(blocking = true)
      System.gc(); Thread.sleep(120)
    }

    val ev = graft.core.TsCompat.readEvents(spark, s"$dir/events.parquet")
    def grpInternal = graft.core.Series("uid", ev, "ts", "user_id")
      .internal.where(col("__v").isNotNull)
    def valInternal = graft.core.Series("value", ev, "ts", "value").internal

    (1 to passes).foreach { p =>
      println(s"PROBEQ12 == pass $p ==")
      cell("scan_grp")(grpInternal.queryExecution.toRdd.count())
      cell("lagflag")(graft.core.Scan.lagFlagScan(
        grpInternal, "__idx", "__v",
        (pr, cu) => pr.isNull || pr =!= cu, "__run")
        .queryExecution.toRdd.count())
      val runsDf = {
        val base = graft.core.Scan.lagFlagScan(
          grpInternal, "__idx", "__v",
          (pr, cu) => pr.isNull || pr =!= cu, "__run")
        base.groupBy("__run").agg(
          min(col("__idx")).as("__start"), max(col("__idx")).as("__end"),
          first(col("__v")).as("__grp"))
      }
      cell("runs_agg")(runsDf.queryExecution.toRdd.count())
      // the assignment pass: starts ∪ term ∪ rows → fillForward → filter
      val runsCp = graft.core.Pinned.checkpoint(runsDf)
      val starts = runsCp.select(col("__start").as("__idx"), lit(0).as("__tag"),
        col("__run").as("__runid"), lit(null).cast("double").as("__v"))
      val term = runsCp.agg((max(col("__end")) + lit(86400e6)).as("__idx"))
        .select(col("__idx"), lit(0).as("__tag"), lit(-1L).as("__runid"),
          lit(null).cast("double").as("__v"))
      val rowsT = valInternal.select(col("__idx"), lit(1).as("__tag"),
        lit(null).cast("long").as("__runid"), col("__v"))
      val assigned = graft.core.Scan.fillForward(
        starts.unionByName(term).unionByName(rowsT),
        Seq("__idx", "__tag"), "__runid", "__seg_id")
        .where(col("__tag") === 1 && col("__seg_id").isNotNull &&
          col("__seg_id") =!= -1L)
      cell("fillforward")(assigned.queryExecution.toRdd.count())
      // NOTE: each cell's boundary releases checkpoint blocks, so a frame
      // captured across cells (runsCp's blocks feeding `assigned`) cannot
      // be re-counted in a later cell — rebuild the chain per cell instead
      // (localCheckpoints cannot recompute released blocks).
      cell("full_q12")(SparkEntry.queries("q12_group_by_consecutive")(spark, dir)
        .queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
