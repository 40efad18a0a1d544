package graft

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic: counts "No Partition Defined" WindowExec warnings per
  * query by running each in isolation and scraping log4j output.
  */
object WarnScan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val ctx = org.apache.logging.log4j.core.LoggerContext.getContext(false)
    val appender = new org.apache.logging.log4j.core.appender.AbstractAppender(
      "warnscan", null, null, true, Array.empty) {
      override def append(e: org.apache.logging.log4j.core.LogEvent): Unit =
        if (e.getMessage.getFormattedMessage.contains("No Partition Defined"))
          counter.incrementAndGet()
    }
    appender.start()
    ctx.getConfiguration.getRootLogger.addAppender(appender, null, null)
    ctx.updateLoggers()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      counter.set(0)
      try fn(spark, "/root/testdata/sf0.001").queryExecution.toRdd.count()
      catch { case e: Throwable => println(s"WARNSCAN $name ERROR") }
      if (counter.get() > 0) println(s"WARNSCAN $name warns=${counter.get()}")
    }
    spark.stop()
  }
}
