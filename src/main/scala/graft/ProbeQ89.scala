package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Attribute q89's 100× cost (VERDICT r17 item 4): the multi-metric exact
  * grouped quantile rides ONE composite-key range exchange over n·k
  * unpivoted rows, then partition-local rank windows + summary stitch
  * joins, then the bracket filter + wide pivot. This probe times four
  * nested prefixes of that pipeline so the deltas isolate each stage:
  *
  *   unpivot   — explode + null filter only (map-only scan floor)
  *   exchange  — + the (key, metricIdx, value) range repartition
  *   ranked    — + local rank windows + offset/total stitch joins
  *   full      — the whole declared q89 (bracket filter, pivot, key
  *               re-attach, output sort)
  *
  * Each stage runs `passes` times with per-run wall + executor-CPU; read
  * the CPU deltas on a noisy box (the ProbeOne convention).
  */
object ProbeQ89 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
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
    spark.range(1000000).selectExpr("sum(id)").collect()

    val keyCol = "l_suppkey"
    val valCols = Seq("l_quantity", "l_extendedprice")
    def base = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col(keyCol), col(valCols.head), col(valCols(1)))
    def long0 = {
      val pairs = array(valCols.zipWithIndex.map { case (c, i) =>
        struct(lit(i).as("__gs_c"), col(c).cast("double").as("__gs_v")) }: _*)
      base.select(col(keyCol), explode(pairs).as("__gs_p"))
        .select(col(keyCol), col("__gs_p.__gs_c").as("__gs_c"),
          col("__gs_p.__gs_v").as("__gs_v"))
        .where(col("__gs_v").isNotNull)
    }

    // the r17-era q89 pipeline (full ranking through keyedRankMulti),
    // reconstructed for the A/B against the r18 bracket-targeted path —
    // the body of exactQuantilesMulti with the one line swapped
    def fullOld: Long = {
      val quantiles = Seq("med" -> 0.5, "p95" -> 0.95)
      val ranked = graft.core.Scan.keyedRankMulti(
        long0, Seq(keyCol, "__gs_c"), "__gs_v", "__rk", "__n")
      val v = col("__gs_v"); val metric = col("__gs_c")
      val aggs = for { (c, i) <- valCols.zipWithIndex; (label, q) <- quantiles }
      yield {
        val pos = lit(1.0) + (col("__n") - 1.0) * lit(q)
        val lo = floor(pos); val hi = ceil(pos); val frac = pos - lo
        val isC = metric === lit(i)
        val vLo = max(when(isC && col("__rk") === lo, v))
        val vHi = max(when(isC && col("__rk") === hi, v))
        (vLo * (lit(1.0) - max(when(isC && col("__rk") === lo, frac))) +
          vHi * max(when(isC && col("__rk") === hi, frac))).as(s"q_${c}_$label")
      }
      val needed = quantiles.map { case (_, q) =>
        val pos = lit(1.0) + (col("__n") - 1.0) * lit(q)
        col("__rk") === floor(pos) || col("__rk") === ceil(pos)
      }.reduce(_ || _)
      val quantsByKey = ranked.where(needed)
        .groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
      val keys = base.select(col(keyCol)).distinct()
      keys.join(quantsByKey.withColumnRenamed(keyCol, "__gs_rk"),
          col(keyCol) <=> col("__gs_rk"), "left")
        .drop("__gs_rk").queryExecution.toRdd.count()
    }

    val stages: Seq[(String, () => Long)] = Seq(
      "full_old" -> (() => fullOld),
      "full_new" -> (() => SparkEntry.queries("q89_multi_quantiles")(spark, dir)
        .queryExecution.toRdd.count()),
      "unpivot" -> (() => long0.queryExecution.toRdd.count()),
      "exchange" -> (() => long0
        .repartitionByRange(col(keyCol), col("__gs_c"), col("__gs_v"))
        .queryExecution.toRdd.count()))

    // PASS-MAJOR interleave: on a box whose ambient CPU inflation swings
    // 10x between minutes (this round's measurements), stage-major order
    // confounds variant with time — interleaving puts both variants in
    // every weather window and min-CPU compares like with like
    for (i <- 1 to passes; (name, run) <- stages) {
      graft.core.Pinned.release(blocking = true)
      System.gc(); Thread.sleep(300)
      cpuNs.set(0)
      val t0 = System.nanoTime()
      val n = run()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"PROBEQ89 $name run$i $secs%.2f s cpu=${cpuNs.get / 1e9}%.1f s rows=$n")
    }
    spark.stop()
  }
}
