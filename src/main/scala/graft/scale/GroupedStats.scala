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
    // gate above) so the result shape matches a SQL GROUP BY. The join must
    // be null-safe (<=>), not a using-join: a using-join resolves to
    // EqualTo, so a NULL key would never match its own aggregated row and
    // a NULL key holding non-null values would lose its quantiles.
    require(keyCol != "__gs_rk", "__gs_rk is reserved by exactQuantiles")
    val keys = df.select(col(keyCol)).distinct()
    keys.join(quantsByKey.withColumnRenamed(keyCol, "__gs_rk"),
        col(keyCol) <=> col("__gs_rk"), "left")
      .drop("__gs_rk")
  }

  /** Exact per-key quantiles over SEVERAL value columns in one pass:
    * p50/p95 of k metrics per key as ONE output row per key
    * (`q_<col>_<label>` columns), instead of k separate `exactQuantiles`
    * calls the caller must join back together.
    *
    * Scale shape: the metrics are unpivoted to long form (one scan of the
    * input, k rows per input row) and ranked under the composite key
    * (key, metric) in a SINGLE `keyedRank` pass — one range exchange over
    * n·k rows, not k exchanges of n rows, and the hot-key property is
    * preserved (a billion-row key still spans many tasks per metric). The
    * final pivot back to wide is a map-side-combining hash aggregate over
    * ≤ 2·k·|quantiles| rows per key. Keys where a metric is all-null get
    * NULL for that metric's quantiles; keys all-null everywhere still
    * surface via the null-safe distinct-key re-attach.
    */
  def exactQuantilesMulti(df: DataFrame, keyCol: String, valCols: Seq[String],
                          quantiles: Seq[(String, Double)]): DataFrame = {
    require(valCols.nonEmpty, "need at least one value column")
    require(valCols.distinct.length == valCols.length,
      "value columns must be unique")
    require(quantiles.nonEmpty, "need at least one quantile")
    require(quantiles.map(_._1).distinct.length == quantiles.length,
      "quantile labels must be unique (they become output column names)")
    quantiles.foreach { case (_, q) =>
      require(q >= 0.0 && q <= 1.0, s"quantile $q outside [0, 1]") }
    require(keyCol != "__gs_rk", "__gs_rk is reserved by exactQuantilesMulti")
    // unpivot: (key, metric-name, value) — one row per non-null metric value
    val pairs = array(valCols.map(c =>
      struct(lit(c).as("__gs_c"), col(c).cast("double").as("__gs_v"))): _*)
    val long0 = df.select(col(keyCol), explode(pairs).as("__gs_p"))
      .select(col(keyCol), col("__gs_p.__gs_c").as("__gs_c"),
        col("__gs_p.__gs_v").as("__gs_v"))
      .where(col("__gs_v").isNotNull)
      // composite key: struct equality is value-based, so a NULL keyCol
      // field still groups/joins with itself inside keyedRank's stitch
      .withColumn("__gs_k", struct(col(keyCol), col("__gs_c")))
      .select("__gs_k", "__gs_v")
    val ranked = graft.core.Scan.keyedRank(long0, "__gs_k", "__gs_v", "__rk", "__n")
    val v = col("__gs_v")
    val metric = col("__gs_k").getField("__gs_c")
    val aggs = for { c <- valCols; (label, q) <- quantiles } yield {
      val pos = lit(1.0) + (col("__n") - 1.0) * lit(q)
      val lo = floor(pos); val hi = ceil(pos); val frac = pos - lo
      val isC = metric === lit(c)
      val vLo = max(when(isC && col("__rk") === lo, v))
      val vHi = max(when(isC && col("__rk") === hi, v))
      (vLo * (lit(1.0) - max(when(isC && col("__rk") === lo, frac))) +
       vHi * max(when(isC && col("__rk") === hi, frac)))
        .as(s"q_${c}_$label")
    }
    val needed = quantiles.map { case (_, q) =>
      val pos = lit(1.0) + (col("__n") - 1.0) * lit(q)
      col("__rk") === floor(pos) || col("__rk") === ceil(pos)
    }.reduce(_ || _)
    val quantsByKey = ranked.where(needed)
      .groupBy(col("__gs_k").getField(keyCol).as(keyCol))
      .agg(aggs.head, aggs.tail: _*)
    val keys = df.select(col(keyCol)).distinct()
    keys.join(quantsByKey.withColumnRenamed(keyCol, "__gs_rk"),
        col(keyCol) <=> col("__gs_rk"), "left")
      .drop("__gs_rk")
  }

  /** Exact per-key median (linear interpolation on even counts). */
  def exactMedian(df: DataFrame, keyCol: String, valCol: String): DataFrame =
    exactQuantiles(df, keyCol, valCol, Seq("median" -> 0.5))
      .withColumnRenamed("q_median", "median")
}
