package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch: interleaved same-JVM A/B for the r18 sorted-collect kernels.
  *
  * Reconstructs the q92-shaped aggregation (events value series, 1D window,
  * 6h stride → 4 segments per row) and times OLD
  * (`transform(array_sort(collect_list(struct)))` + HOF variance folds)
  * against NEW ([[graft.expr.CollectSortedVals]] + fold kernels) pass-major
  * — both variants in every weather window, min-CPU the decision cells
  * (the noisy-box discipline from SCALE.md r17/r18).
  *
  * Modes: `hjorth` (one descriptor) and `battery` (three TemporalFoldK
  * descriptors sharing the window feed — the aggregate-dedup claim: OLD
  * re-collects and re-sorts per descriptor because lambda chains get no
  * CSE; NEW shares one buffer + one sort).
  */
object ProbeSortAB {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("hjorth")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 3
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

    val DAY = 86400e6
    val STRIDE = 21600e6
    // 4 overlapping (1D, 6h) segments per row, q92's W5 arithmetic shape
    val seg = spark.read.parquet(s"$dir/events.parquet")
      .select(unix_micros(col("ts").cast("timestamp")).cast("double").as("i"),
        col("value").as("v"))
      .withColumn("k", explode(sequence(
        (floor((col("i") - DAY) / STRIDE) + 1).cast("long"),
        floor(col("i") / STRIDE).cast("long"))))

    def oldSorted(i: Column, v: Column): Column =
      transform(
        array_sort(collect_list(when(v.isNotNull, struct(i.as("i"), v.as("v"))))),
        p => p.getField("v"))
    def arrDiffs(a: Column, m: Column): Column =
      zip_with(slice(a, lit(2), m), slice(a, lit(1), m), (b, c) => b - c)
    def arrVarPop(arr: Column): Column =
      aggregate(arr,
        struct(lit(0L).as("n"), lit(0.0).as("s"), lit(0.0).as("s2")),
        (acc, x) => struct((acc.getField("n") + 1L).as("n"),
          (acc.getField("s") + x).as("s"),
          (acc.getField("s2") + x * x).as("s2")),
        acc => {
          val n = acc.getField("n").cast("double")
          when(acc.getField("n") > 0,
            (acc.getField("s2") - acc.getField("s") * acc.getField("s") / n) / n)
        })

    val m1 = greatest(count(col("v")) - 1L, lit(0L)).cast("int")
    val m2 = greatest(count(col("v")) - 2L, lit(0L)).cast("int")

    val variants: Seq[(String, Seq[Column])] = mode match {
      case "battery" =>
        import graft.expr.TemporalFoldK
        def three(feed: => Column): Seq[Column] = Seq(
          TemporalFoldK(feed, TemporalFoldK.DISTANCE).as("c1"),
          TemporalFoldK(feed, TemporalFoldK.ABS_DIFF_SUM).as("c2"),
          TemporalFoldK(feed, TemporalFoldK.MEAN_ABS_DIFF).as("c3"))
        Seq(
          ("old", three(oldSorted(col("i"), col("v")))),
          ("new", three(graft.expr.CollectSortedVals(col("i"), col("v")))))
      case _ =>
        val dxO = arrDiffs(oldSorted(col("i"), col("v")), m1)
        val ddxO = arrDiffs(dxO, m2)
        val hj = graft.expr.HjorthFoldK(
          graft.expr.CollectSortedVals(col("i"), col("v")))
        Seq(
          ("old", Seq(arrVarPop(dxO).as("c1"), arrVarPop(ddxO).as("c2"))),
          ("new", Seq(hj.getField("vdx").as("c1"), hj.getField("vddx").as("c2"))))
    }

    (1 to passes).foreach { p =>
      variants.foreach { case (name, cols) =>
        cpuNs.set(0)
        val t0 = System.nanoTime()
        val n = seg.groupBy("k").agg(cols.head, cols.tail: _*)
          .queryExecution.toRdd.count()
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        println(f"PROBESORT $mode $name pass$p $secs%7.2f s cpu=${cpuNs.get / 1e9}%8.1f s rows=$n")
      }
    }
    spark.stop()
  }
}
