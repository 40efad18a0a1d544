package graft

import org.apache.spark.sql.SparkSession

/** Scratch: print the ADAPTIVE final plan of one SparkEntry query. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.toRdd.count()
    val p = df.queryExecution.executedPlan.toString
    println("PLANPROBE " + name)
    p.linesIterator.filter(l => l.contains("Join") || l.contains("Exchange") ||
      l.contains("Window") || l.contains("Checkpoint")).foreach(l =>
      println("PLANPROBE " + l.trim.take(150)))
    spark.stop()
  }
}
