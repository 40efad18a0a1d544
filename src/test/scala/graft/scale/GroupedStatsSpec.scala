package graft.scale

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Exact grouped quantiles: keyedRank layout, percentile-exact results. */
class GroupedStatsSpec extends SparkSpec {

  test("matches groupBy(percentile) exactly on random data") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    val df = (0 until 5000).map(_ =>
      (s"k${rng.nextInt(7)}", rng.nextDouble() * 100)).toDF("k", "v")
      .repartition(11)
    val got = GroupedStats.exactQuantiles(df, "k", "v",
        Seq("med" -> 0.5, "p90" -> 0.9, "min" -> 0.0, "max" -> 1.0))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val exp = df.groupBy("k").agg(
        percentile(col("v"), lit(0.5)), percentile(col("v"), lit(0.9)),
        percentile(col("v"), lit(0.0)), percentile(col("v"), lit(1.0)))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.keySet == exp.keySet)
    for (k <- got.keySet; (g, e) <- Seq(got(k)._1 -> exp(k)._1,
        got(k)._2 -> exp(k)._2, got(k)._3 -> exp(k)._3, got(k)._4 -> exp(k)._4))
      assert(math.abs(g - e) < 1e-9, s"key $k: $g vs $e")
  }

  test("edges: single-row key, even count, ties, null exclusion") {
    import spark.implicits._
    val df = Seq(
      ("one", Some(7.0)),
      ("even", Some(1.0)), ("even", Some(3.0)),
      ("tie", Some(5.0)), ("tie", Some(5.0)), ("tie", Some(9.0)),
      ("null", Some(2.0)), ("null", None)).toDF("k", "v")
    val out = GroupedStats.exactMedian(df, "k", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("one" -> 7.0, "even" -> 2.0, "tie" -> 5.0, "null" -> 2.0))
  }

  test("a key whose values are ALL null surfaces with null quantiles") {
    import spark.implicits._
    val df = Seq(
      ("live", Some(1.0)), ("live", Some(3.0)),
      ("dead", None), ("dead", None)).toDF("k", "v")
    val rows = GroupedStats.exactMedian(df, "k", "v")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    // SQL GROUP BY convention: the all-null key keeps its row, quantile null
    assert(rows == Map("live" -> Some(2.0), "dead" -> None))
  }

  test("plan: rank windows are partitioned (no per-key sort task)") {
    import spark.implicits._
    val df = (0 until 1000).map(i => ("hot", i.toDouble)).toDF("k", "v")
    val out = GroupedStats.exactMedian(df, "k", "v")
    val windows = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      val parts = w.partitionSpec.map(_.sql).mkString(",")
      assert(parts.contains("__pid"),
        s"quantile window partitioned only by [$parts]")
    }
  }
}
