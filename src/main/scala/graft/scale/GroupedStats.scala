package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT grouped order statistics at scale.
  *
  * The naive encodings of "median per key" are `percentile` inside a
  * `groupBy` (collects each group's values into one aggregation buffer —
  * a billion-row key OOMs one task) or `row_number() OVER (PARTITION BY
  * key ORDER BY v)` (one window task per key — a hot key serializes).
  * `Scan.keyedRank` already solves the layout problem: range-partition on
  * (key, value) so one key spans many tasks, rank with partition-local
  * windows, stitch with a summary-sized offset join. On top of those
  * ranks, an exact linear-interpolation quantile is two filtered rows per
  * (key, quantile) and one final hash aggregate.
  */
object GroupedStats {

  /** Exact per-key quantiles with linear interpolation (numpy /
    * `quantile_cont` semantics): for each key and q, the value at fractional
    * rank `1 + (n-1)q`. Returns one row per key: (keyCol, q_<label>...).
    * Null values are excluded (SQL aggregate convention).
    *
    * Scale shape: one `keyedRank` pass (range exchange + local windows +
    * summary stitch — no per-key task), then a map-side filter keeping the
    * two bracketing ranks per quantile and one groupBy(key) aggregate over
    * ≤ 2·|quantiles| rows per key. Keys whose values are ALL null still
    * surface (with null quantiles, the SQL GROUP BY convention) via a
    * left join from the distinct-key set — a map-side-combining hash
    * aggregate, not a sort.
    */
  def exactQuantiles(df: DataFrame, keyCol: String, valCol: String,
                     quantiles: Seq[(String, Double)]): DataFrame = {
    require(quantiles.nonEmpty, "need at least one quantile")
    require(quantiles.map(_._1).distinct.length == quantiles.length,
      "quantile labels must be unique (they become output column names)")
    quantiles.foreach { case (_, q) =>
      require(q >= 0.0 && q <= 1.0, s"quantile $q outside [0, 1]") }
    val ranked = graft.core.Scan.keyedRank(
      df.select(col(keyCol), col(valCol)).where(col(valCol).isNotNull),
      keyCol, valCol, "__rk", "__n")
    val v = col(valCol).cast("double")
    val aggs = quantiles.flatMap { case (label, q) =>
      val pos = lit(1.0) + (col("__n") - 1.0) * lit(q) // fractional rank
      val lo = floor(pos); val hi = ceil(pos); val frac = pos - lo
      val vLo = max(when(col("__rk") === lo, v))
      val vHi = max(when(col("__rk") === hi, v))
      // frac is a pure function of n (constant within the key); fold it
      // into both terms so the whole quantile is one expression
      Seq((vLo * (lit(1.0) - max(when(col("__rk") === lo, frac))) +
           vHi * max(when(col("__rk") === hi, frac)))
        .as(s"q_$label"))
    }
    // keep only rows that bracket SOME requested quantile — the aggregate
    // then touches ≤ 2·|quantiles| rows per key, not the whole key
    val needed = quantiles.map { case (_, q) =>
      val pos = lit(1.0) + (col("__n") - 1.0) * lit(q)
      col("__rk") === floor(pos) || col("__rk") === ceil(pos)
    }.reduce(_ || _)
    val quantsByKey =
      ranked.where(needed).groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
    // re-attach keys that had only null values (dropped by the isNotNull
    // gate above) so the result shape matches a SQL GROUP BY
    df.select(col(keyCol)).distinct().join(quantsByKey, Seq(keyCol), "left")
  }

  /** Exact per-key median (linear interpolation on even counts). */
  def exactMedian(df: DataFrame, keyCol: String, valCol: String): DataFrame =
    exactQuantiles(df, keyCol, valCol, Seq("median" -> 0.5))
      .withColumnRenamed("q_median", "median")
}
