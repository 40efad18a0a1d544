package graft.core

import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}
import org.apache.spark.scheduler.{JobSucceeded, SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One row per finished Spark job under a RunLog label. */
private[core] case class RunLogRow(label: String, jobId: Int,
                                   startMs: Long, endMs: Long, succeeded: Boolean)

/** A8 analog — programmatic execution-time analytics (reference:
  * tsflex/features/logger.py:104-195 `get_feature_logs` /
  * `get_function_stats`).
  *
  * The reference logs each feature-function task's wall time to a file and
  * parses it back into DataFrames. In this engine every feature of a bucket
  * fuses into ONE Spark plan, so the natural logging unit is a labeled
  * action: wrap each query/calculate in `time(label) { ... }` and every
  * Spark job it triggers is attributed to that label via the job group — a
  * driver-side SparkListener records job wall times (no executor overhead,
  * zero cost on the data path).
  *
  * {{{
  * val rl = new RunLog(spark)
  * rl.time("q01") { fc.calculate(data).count() }
  * rl.time("q02") { other.count() }
  * rl.summary.show() // label, jobs, duration, duration_pct, mean, std
  * rl.close()
  * }}}
  */
final class RunLog(spark: SparkSession) extends AutoCloseable {
  private val starts = new ConcurrentHashMap[Int, (String, Long)]()
  private val rows = new ConcurrentLinkedQueue[RunLogRow]()

  private val listener = new SparkListener {
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      val label = Option(j.properties)
        .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
        .getOrElse("<unlabeled>")
      starts.put(j.jobId, (label, j.time))
    }
    override def onJobEnd(j: SparkListenerJobEnd): Unit =
      Option(starts.remove(j.jobId)).foreach { case (label, t0) =>
        rows.add(RunLogRow(label, j.jobId, t0, j.time,
          j.jobResult == JobSucceeded))
      }
  }
  spark.sparkContext.addSparkListener(listener)

  /** Run `body` attributing every Spark job it triggers to `label`. */
  def time[T](label: String)(body: => T): T = {
    spark.sparkContext.setJobGroup(label, label, interruptOnCancel = false)
    try body finally spark.sparkContext.clearJobGroup()
  }

  /** Wait for the async listener bus to deliver outstanding job-end events:
    * polls until the captured row count is stable. Called by the accessors;
    * bounded by `timeoutMs`.
    */
  def awaitQuiesce(timeoutMs: Long = 2000L): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var last = -1
    while (System.currentTimeMillis() < deadline && rows.size() != last) {
      last = rows.size()
      Thread.sleep(50)
    }
  }

  /** Raw per-job log: label, job_id, duration (seconds), succeeded —
    * the analog of the reference's parsed log lines.
    */
  def logs: DataFrame = {
    awaitQuiesce()
    val data = {
      val it = rows.iterator(); val b = Seq.newBuilder[RunLogRow]
      while (it.hasNext) b += it.next()
      b.result()
    }
    spark.createDataFrame(data)
      .select(col("label"), col("jobId").as("job_id"),
        ((col("endMs") - col("startMs")) / 1e3).as("duration"),
        col("succeeded"))
  }

  /** Per-label stats — sum/mean/std/count of job durations plus percentage
    * of total, the `get_function_stats` analog (logger.py:125-165).
    */
  def summary: DataFrame = {
    val l = logs
    val agged = l.groupBy("label").agg(
      count(lit(1)).as("jobs"),
      sum(col("duration")).as("duration"),
      avg(col("duration")).as("duration_mean"),
      coalesce(stddev_samp(col("duration")), lit(0.0)).as("duration_std"))
    // total over at most #labels rows — a broadcast scalar, not a shuffle
    agged.crossJoin(broadcast(agged.agg(sum(col("duration")).as("__tot"))))
      .withColumn("duration_pct", round(col("duration") / col("__tot") * 100, 2))
      .drop("__tot")
      .orderBy(desc("duration"))
  }

  override def close(): Unit = spark.sparkContext.removeSparkListener(listener)
}
