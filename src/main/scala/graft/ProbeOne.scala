package graft

import org.apache.spark.sql.SparkSession

/** Scratch: time a single SparkEntry query in a fresh JVM after a warmup. */
object ProbeOne {
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
    spark.range(1000000).selectExpr("sum(id)").collect()
    SparkEntry.queries("q00_tpch_q1")(spark, dir).queryExecution.toRdd.count()
    graft.core.Pinned.release(blocking = true) // warmup blocks are not run1's problem
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
      println(f"PROBEONE $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // like every other harness: a run must not pay (or hide) its
      // predecessor's retained checkpoint debt
      graft.core.Pinned.release(blocking = true)
    }
    spark.stop()
  }
}
