package graft.segment

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._

/** Bounds of the data range to segment (P2/P3). */
final case class Bounds(start: Double, end: Double)

/** The strided-rolling segmenter — tsflex's core table-valued operator
  * (reference: tsflex/features/segmenter/strided_rolling.py), re-expressed
  * Spark-first.
  *
  * Segment semantics (golden-tested against
  * reference tests/test_strided_rolling.py:139-211):
  *   starts = start + k*stride, k ∈ [0, nb),
  *   nb = max((end - start - window) // stride + 1, 0)
  *        (+1 when includeFinalWindow && start + stride*nb <= end)
  *   ends = starts + window;  row ∈ segment iff start <= idx < end
  *   (half-open, searchsorted-'left' on both sides — W5).
  *
  * Scale design: for regular strides, window→row assignment is ARITHMETIC —
  * each row computes its own overlapping segment-start set via
  * `sequence(kmin, kmax)` + `explode` (pure whole-stage-codegen math, no
  * join, no shuffle before the final partial-aggregated `groupBy`). The
  * segment table itself is built lazily with `spark.range` (never
  * driver-materialized) and only joined — broadcast — to restore
  * empty-window rows (W7). Irregular/manual segments fall back to a
  * broadcast range join.
  */
object Segmenter {

  /** One regular stride's generation parameters. */
  final case class StrideSpec(stride: Double, nb: Long)

  /** A planned segmentation: lazily-built segment table + (for regular
    * strides) the arithmetic-assignment spec.
    */
  final case class SegmentPlan(
      segments: DataFrame, // __seg_id, __seg_start, __seg_end (Double)
      regular: Option[(Double, Double, Seq[StrideSpec])], // (start0, window, strides)
      winRender: String)

  /** P3 bound methods (reference: tsflex/features/utils.py:77-99):
    * inner = (max of starts, min of ends); inner-outer = (max, max);
    * outer = (min, max).
    */
  def bounds(series: Seq[Series], method: String = "inner"): Bounds = {
    // r19: series wrapping the SAME frame and index column have identical
    // index bounds — one driver agg per distinct source, not per series.
    // These aggs run EAGERLY at plan-build time, so an n-tuple feature
    // over one frame paid n full input scans before the query even
    // started (q51's three-series wcorr: 3 scans → 1).
    def sameSrc(a: Series, b: Series): Boolean =
      a.idxCol == b.idxCol && a.tz == b.tz &&
        ((a.df eq b.df) || a.df.queryExecution.analyzed
          .sameResult(b.df.queryExecution.analyzed))
    val reps = scala.collection.mutable.ArrayBuffer.empty[(Series, (Double, Double))]
    val mm = series.map { s =>
      reps.find { case (rep, _) => sameSrc(rep, s) } match {
        case Some((_, v)) => v
        case None =>
          val r = s.internal.agg(min(col("__idx")), max(col("__idx"))).head()
          // an all-null (or empty) series aggregates to null min/max; name
          // the series instead of letting Row.getDouble NPE deep inside
          // calculate
          require(!r.isNullAt(0),
            s"series '${s.name}' has no non-null indexed rows — cannot " +
              "derive segmentation bounds")
          val v = (r.getDouble(0), r.getDouble(1))
          reps += ((s, v))
          v
      }
    }
    method match {
      case "inner"       => Bounds(mm.map(_._1).max, mm.map(_._2).min)
      case "inner-outer" => Bounds(mm.map(_._1).max, mm.map(_._2).max)
      case "outer"       => Bounds(mm.map(_._1).min, mm.map(_._2).max)
      case m => throw new IllegalArgumentException(s"invalid bound method $m")
    }
  }

  /** W1: number of segments for one stride. */
  def nbSegments(b: Bounds, window: Double, stride: Double,
                 includeFinalWindow: Boolean): Long = {
    var nb = math.max(math.floor((b.end - b.start - window) / stride).toLong + 1, 0L)
    if (includeFinalWindow && b.start + stride * nb <= b.end) nb += 1
    nb
  }

  /** W1–W3: regular segment plan for one window and one-or-more strides.
    * Multi-stride = set union of per-stride starts, deduped and sorted (W2,
    * reference: strided_rolling.py:264-274).
    */
  def regular(spark: SparkSession, b: Bounds, window: Double,
              strides: Seq[Double], includeFinalWindow: Boolean,
              winRender: String): SegmentPlan = {
    require(strides.nonEmpty, "at least one stride required")
    val specs = strides.distinct.sorted.map(s =>
      StrideSpec(s, nbSegments(b, window, s, includeFinalWindow)))
    val perStride = specs.map { sp =>
      spark.range(sp.nb)
        .select((lit(b.start) + col("id").cast("double") * lit(sp.stride)).as("__seg_start"))
    }
    var segs = perStride.reduce(_.unionAll(_))
    if (specs.length > 1) segs = segs.distinct()
    val segments = segs
      .select(col("__seg_start"), (col("__seg_start") + lit(window)).as("__seg_end"))
      .withColumn("__seg_id", col("__seg_start"))
    SegmentPlan(segments, Some((b.start, window, specs)), winRender)
  }

  /** W4: manual segments from user-supplied start and/or end arrays
    * (reference: strided_rolling.py:198-211; variable-length windows
    * allowed). Order and duplicates are preserved via an explicit id.
    */
  def manual(spark: SparkSession, starts: Option[Seq[Double]],
             ends: Option[Seq[Double]], window: Option[Double],
             winRender: String = "manual"): SegmentPlan = {
    val (s, e) = (starts, ends) match {
      case (Some(s0), Some(e0)) =>
        require(s0.length == e0.length, "segment start/end length mismatch")
        (s0, e0)
      case (Some(s0), None) => (s0, s0.map(_ + window.get))
      case (None, Some(e0)) => (e0.map(_ - window.get), e0)
      case _ => throw new IllegalArgumentException("need starts and/or ends")
    }
    require(s.zip(e).forall { case (a, b) => a <= b }, "segment start > end")
    import spark.implicits._
    val segments = s.zip(e).zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("__seg_id", "__seg_start", "__seg_end")
    SegmentPlan(segments, None, winRender)
  }

  /** W5: assign rows to segments. Returns the input frame with one output
    * row per (row, containing segment) pair, tagged `__seg_id`.
    *
    * Regular path: arithmetic explode — for stride st, row t overlaps
    * starts with k ∈ [floor((t-s0-w)/st)+1, floor((t-s0)/st)] ∩ [0, nb).
    * Multi-stride: per-row union of the per-stride start sets
    * (`array_distinct`), mirroring the reference's global `np.unique`.
    *
    * Manual path: broadcast range join (segment tables are small relative
    * to data; for huge manual tables swap in a range-join strategy).
    */
  def assign(rows: DataFrame, plan: SegmentPlan): DataFrame = plan.regular match {
    case Some((s0, w, specs)) =>
      val t = col("__idx")
      val arrays: Seq[Column] = specs.map { sp =>
        val kmin = greatest(lit(0L),
          (floor((t - lit(s0) - lit(w)) / lit(sp.stride)) + lit(1)).cast("long"))
        val kmax = least(lit(sp.nb - 1),
          floor((t - lit(s0)) / lit(sp.stride)).cast("long"))
        when(kmax >= kmin,
          transform(sequence(kmin, kmax),
            k => lit(s0) + k.cast("double") * lit(sp.stride)))
          .otherwise(array().cast("array<double>"))
      }
      val all = if (arrays.length == 1) arrays.head
                else array_distinct(concat(arrays: _*))
      rows.select(col("*"), explode(all).as("__seg_id"))
    case None =>
      val segs = plan.segments
      rows.join(broadcast(segs),
        col("__idx") >= col("__seg_start") && col("__idx") < col("__seg_end"),
        "inner")
        .select(rows.columns.toIndexedSeq.map(col) :+ col("__seg_id"): _*)
  }

  /** W8 sparsity check (reference: strided_rolling.py:230-239): per series,
    * the per-segment sample counts' peak-to-peak (max - min, empty segments
    * counting 0). A nonzero ptp means the series is sparse w.r.t. this
    * segmentation — the reference warns unless `approve_sparsity`.
    * Returns one row per series: (series, min_n, max_n, ptp).
    */
  def sparsity(series: Seq[Series], b: Bounds, window: Double,
               strides: Seq[Double], includeFinalWindow: Boolean = false): DataFrame = {
    val frames = series.map { s =>
      val plan = regular(s.df.sparkSession, b, window, strides,
        includeFinalWindow, "w")
      val counts = assign(s.internal, plan)
        .groupBy("__seg_id").agg(count(col("__v")).as("__n"))
      plan.segments.join(counts, Seq("__seg_id"), "left")
        .select(coalesce(col("__n"), lit(0L)).as("__n"))
        .agg(min(col("__n")).as("min_n"), max(col("__n")).as("max_n"))
        .select(lit(s.name).as("series"), col("min_n"), col("max_n"),
          (col("max_n") - col("min_n")).as("ptp"))
    }
    frames.reduce(_.unionByName(_))
  }

  /** W6: output anchor column for a segment (reference:
    * strided_rolling.py:276-293): end (default) / middle / begin.
    */
  def anchor(windowIdx: String): Column = windowIdx match {
    case "end"    => col("__seg_end")
    case "middle" => col("__seg_start") + (col("__seg_end") - col("__seg_start")) / 2
    case "begin"  => col("__seg_start")
    case w => throw new IllegalArgumentException(
      s"window index $w must be either of: ['end', 'middle', 'begin']")
  }
}
