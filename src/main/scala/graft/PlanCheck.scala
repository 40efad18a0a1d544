package graft

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: formatted plans for representative queries, to check
  * PushedFilters / ReadSchema (pruning) / WholeStageCodegen spans.
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    // queries with an eager materialization side effect (q111's corpus
    // write) shrink their subject when only the plan is being inspected
    System.setProperty("graft.plan.only", "1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (name <- args) {
      println(s"==== $name ====")
      val df = SparkEntry.queries(name)(spark, dir)
      println(s"SHAPE ${PlanAudit.render(PlanAudit.shape(df))}")
      val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.SimpleMode)
      // print only scan lines + codegen markers
      plan.split("\n").foreach { l =>
        if (l.contains("Scan parquet") || l.contains("PushedFilters") ||
          l.contains("ReadSchema") || l.contains("WholeStageCodegen"))
          println(l)
      }
    }
    spark.stop()
  }
}
