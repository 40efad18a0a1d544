package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core._
import graft.segment.Segmenter

/** A3 many-to-one features: `f(series_a, series_b)` per strided window
  * (reference: tsflex/features/feature.py:121-168 — a FeatureDescriptor
  * whose series_name is a TUPLE; naming W10 joins the names with `|`,
  * reference: strided_rolling.py:502-507).
  *
  * Each series is windowed INDEPENDENTLY (same segment table, per-series
  * arithmetic assignment — the multi-rate contract of §1.1); pairwise
  * aggregates (corr, covariance, dot) consume the inner join of the two
  * assigned frames on (segment, index) — the relational form of "both
  * window views, paired by position" for co-sampled series. The join keys
  * are (seg, idx), so it shuffles once per side and scales like any
  * co-partitioned equi-join.
  */
object PairedFeatures {

  /** A named two-series aggregate: (valueA, valueB) => aggregate Column. */
  final case class PairFunc(name: String, agg: (Column, Column) => Column)

  val corr2: PairFunc = PairFunc("corr",
    (a, b) => corr(a, b))
  val covar: PairFunc = PairFunc("covar", (a, b) => covar_pop(a, b))
  val dot: PairFunc = PairFunc("dot",
    (a, b) => sum(a * b))

  def calculate(a: Series, b: Series, window: Win, strides: Seq[Win],
                funcs: Seq[PairFunc], windowIdx: String = "end",
                includeFinalWindow: Boolean = false,
                boundMethod: String = "inner"): DataFrame = {
    val spark = a.df.sparkSession
    val bounds = Segmenter.bounds(Seq(a, b), boundMethod)
    val plan = Segmenter.regular(spark, bounds, window.amount,
      strides.map(_.amount), includeFinalWindow, window.render)
    val aa = Segmenter.assign(a.internal, plan)
      .select(col("__seg_id"), col("__idx"), col("__v").as("__va"))
    val bb = Segmenter.assign(b.internal, plan)
      .select(col("__seg_id"), col("__idx"), col("__v").as("__vb"))
    val paired = aa.join(bb, Seq("__seg_id", "__idx"))
    val names = funcs.map(f =>
      Win.outputName(Seq(a.name, b.name), f.name, window.render))
    val aggs = funcs.zip(names).map { case (f, n) =>
      f.agg(col("__va"), col("__vb")).as(n)
    }
    val agged = paired.groupBy("__seg_id").agg(aggs.head, aggs.tail: _*)
    // W7: empty windows survive via the left join from the segment table
    val joined = plan.segments.join(agged, Seq("__seg_id"), "left")
    val anchor = a.restoreIdx(Segmenter.anchor(windowIdx))
    joined.select(anchor.as(a.idxCol) +: names.map(n => col(s"`$n`")): _*)
  }
}
