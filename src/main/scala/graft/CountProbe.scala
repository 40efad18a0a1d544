package graft

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: OUTPUT ROW COUNT of named queries at a given sf dir
  * (attribution evidence for scale-probe growth factors — is a slow 100x
  * cell output-dominated or compute-dominated?). */
object CountProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- args.drop(1)) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"COUNTPROBE $name rows=$n%d ${(System.nanoTime() - t0) / 1e9}%.1f s")
      graft.core.Pinned.release(blocking = true)
    }
    spark.stop()
  }
}
