package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** A8 analog spec: per-label job timing frames for a two-query run
  * (reference: tsflex/features/logger.py:104-195).
  */
class RunLogSpec extends SparkSpec {

  test("logs and summary attribute jobs to their labels for a 2-query run") {
    val rl = new RunLog(spark)
    try {
      rl.time("qa") { spark.range(100000).agg(sum(col("id"))).collect() }
      rl.time("qb") {
        spark.range(10000).withColumn("g", col("id") % 7)
          .groupBy("g").count().collect()
      }
      val logs = rl.logs
      assert(logs.columns.toSeq == Seq("label", "job_id", "duration", "succeeded"))
      val byLabel = logs.groupBy("label").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byLabel.getOrElse("qa", 0L) >= 1L)
      assert(byLabel.getOrElse("qb", 0L) >= 1L)
      assert(logs.where(col("duration") < 0).count() == 0)
      assert(logs.where(!col("succeeded")).count() == 0)

      val s = rl.summary
      assert(s.columns.toSeq == Seq("label", "jobs", "duration",
        "duration_mean", "duration_std", "duration_pct"))
      val rows = s.collect().map(r => r.getString(0) -> r).toMap
      assert(rows.contains("qa") && rows.contains("qb"))
      // percentages over the captured labels sum to ~100
      val pctSum = s.agg(sum(col("duration_pct"))).head.getDouble(0)
      assert(math.abs(pctSum - 100.0) < 1.0)
    } finally rl.close()
  }

  test("jobs outside a time() block fall under <unlabeled>") {
    val rl = new RunLog(spark)
    try {
      spark.range(1000).count()
      val labels = rl.logs.select("label").distinct().collect().map(_.getString(0))
      assert(labels.contains("<unlabeled>"))
    } finally rl.close()
  }
}
