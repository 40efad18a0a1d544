package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B: histogram/span quantile path vs the replaced raw-row
  * rank path, on the q84 shape (per-user quantiles — the degrade regime)
  * and the q89 shape (per-supplier multi-metric). Throwaway attribution
  * probe, same discipline as ProbeQ89.
  */
object ProbeQ84 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ev = graft.core.TsCompat.readEvents(spark, s"$sfDir/events.parquet")
      .select(col("user_id"), col("value"))

    def newPath(): Long = graft.scale.GroupedStats.exactQuantiles(
      ev, "user_id", "value", Seq("median" -> 0.5, "p90" -> 0.9)).count()

    def oldPath(): Long = {
      val ranked = graft.core.Scan.keyedRankBrackets(
        ev.where(col("value").isNotNull), Seq("user_id"), "value",
        "__rk", "__n", Seq(0.5, 0.9))
      val aggs = Seq("median" -> 0.5, "p90" -> 0.9).flatMap { case (label, q) =>
        val pos = lit(1.0) + (col("__n") - 1.0) * lit(q)
        val lo = floor(pos); val hi = ceil(pos); val frac = pos - lo
        val vLo = max(when(col("__rk") === lo, col("value").cast("double")))
        val vHi = max(when(col("__rk") === hi, col("value").cast("double")))
        Seq((vLo * (lit(1.0) - max(when(col("__rk") === lo, frac))) +
          vHi * max(when(col("__rk") === hi, frac))).as(s"q_$label"))
      }
      val needed = Seq(0.5, 0.9).map { q =>
        val pos = lit(1.0) + (col("__n") - 1.0) * lit(q)
        col("__rk") === floor(pos) || col("__rk") === ceil(pos)
      }.reduce(_ || _)
      ranked.where(needed).groupBy(col("user_id"))
        .agg(aggs.head, aggs.tail: _*).count()
    }

    def time(f: () => Long): Double = {
      val t0 = System.nanoTime(); val n = f(); val s = (System.nanoTime() - t0) / 1e9
      graft.core.Pinned.releaseAll()
      println(f"    rows=$n%d  ${s}%.3f s")
      s
    }

    println("== q84 shape: per-user quantiles, events sf0.1 ==")
    var bestOld = Double.MaxValue; var bestNew = Double.MaxValue
    for (i <- 1 to 3) {
      println(s"  pass $i old:"); bestOld = math.min(bestOld, time(oldPath))
      println(s"  pass $i new:"); bestNew = math.min(bestNew, time(newPath))
    }
    println(f"q84-shape min: old $bestOld%.3f  new $bestNew%.3f")
    spark.stop()
  }
}
