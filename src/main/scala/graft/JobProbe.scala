package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Scratch: per-Spark-job wall times for one query (find the hot stages). */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.queries(name)(spark, "/root/testdata/sf0.1")
      .queryExecution.toRdd.count() // warm codegen
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, System.nanoTime())
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val t0 = starts.get(j.jobId)
        println(f"JOBPROBE job=${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      }
    })
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, "/root/testdata/sf0.1")
      .queryExecution.toRdd.count()
    println(f"JOBPROBE TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
