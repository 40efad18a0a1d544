package graft.chunk

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core._

/** Gap-aware chunking (reference: tsflex/chunking/chunking.py:15-204) as
  * Spark sessionization.
  *
  * C1: a chunk boundary falls wherever the index gap exceeds
  * `gapFactor * (1/fs)` (default 1.5× the sample period); when `fs` is not
  * given it is inferred as `1 / max(Δidx)` — i.e. the threshold becomes
  * `gapFactor * max(Δidx)` (reference: chunking.py:44-52).
  * C2: chunks shorter than `minDur` are dropped; chunks longer than
  * `maxDur` are split into sub-chunks with `± subChunkOverlap/2` margins
  * (reference: chunking.py:150-188).
  * C3: chunks of different series whose spans agree within `margin` are
  * grouped (reference: chunking.py:88-114).
  *
  * All units are INTERNAL index units (micros for TIME series, raw for
  * SEQUENCE). Everything is lag/groupBy/sequence-explode — distributed,
  * no driver-side loops (the lone global ordering is inherent to
  * sessionization; at cluster scale partition by entity first).
  *
  * Note: durations are `end - start` spans; the reference approximates
  * duration as `len(chunk)/fs` — a pandas-ism, not semantic intent.
  */
object Chunker {

  /** Rows of `s` tagged with a `__chunk` id (0-based, in index order).
    *
    * Gap detection + chunk numbering run as DISTRIBUTED scans (Scan.withLagged
    * / Scan.runningSum — range-partitioned two-phase prefix scans), not a
    * single-partition global window, so chunking an arbitrarily long series
    * parallelizes across executors.
    */
  def withChunkIds(s: Series, fs: Option[Double] = None,
                   gapFactor: Double = 1.5): DataFrame = {
    val unitPerSec = s.domain match {
      case Domain.Time     => 1e6
      case Domain.Sequence => 1.0
    }
    fs match {
      case Some(hz) =>
        // declared sample rate → literal threshold → the whole gap-detect +
        // chunk-numbering pipeline is ONE fused scan
        val thr = lit(gapFactor / hz * unitPerSec)
        Scan.lagFlagScan(s.internal, "__idx", "__idx",
          (prev, cur) => prev.isNull || cur - prev > thr, "__chunk0")
          .withColumn("__chunk", col("__chunk0") - 1)
          .drop("__chunk0")
      case None =>
        // inferred rate: the threshold is a data-derived scalar column, so
        // the flag needs the two-scan shape — pre-pin the series ONCE so
        // the lag pipeline, maxGap, and the running sum all read the same
        // materialized range exchange (Scan.pinned __pid-reuse convention)
        val pinned = Scan.pinned(s.internal, Seq("__idx"))
        val withDiff = Scan.withLagged(pinned, "__idx", Seq("__idx"))
          .withColumn("__diff", col("__idx") - col("__lag___idx"))
        val mx = Scan.maxGap(pinned, "__idx")
        val flagged = withDiff.crossJoin(broadcast(mx))
          .withColumn("__thr", lit(gapFactor) * col("__maxgap"))
          .withColumn("__new", when(col("__diff").isNull ||
            col("__diff") > col("__thr"), 1L).otherwise(0L))
        Scan.runningSum(flagged, "__idx", "__new", "__chunk0")
          .withColumn("__chunk", col("__chunk0") - 1)
          .drop("__diff", "__thr", "__new", "__maxgap", "__lag___idx",
            "__chunk0", "__pid")
    }
  }

  /** Chunk spans: `(__chunk, __sub, __start, __end, __n)` after the C2
    * duration rules — the same schema whether or not `maxDur` splits
    * sub-chunks; `__n` counts the span's NON-NULL VALUES (the q14 oracle's
    * `count(value)` semantics) on both the whole-chunk and the sub-chunk
    * recount paths.
    */
  def chunkSpans(s: Series, fs: Option[Double] = None,
                 gapFactor: Double = 1.5,
                 minDur: Option[Double] = None,
                 maxDur: Option[Double] = None,
                 subChunkOverlap: Double = 0.0): DataFrame = {
    val rows = withChunkIds(s, fs, gapFactor)
    var spans = rows
      .groupBy("__chunk")
      .agg(min(col("__idx")).as("__start"), max(col("__idx")).as("__end"),
        count(col("__v")).as("__n"))
    minDur.foreach(d => spans = spans.where(col("__end") - col("__start") >= lit(d)))
    maxDur match {
      case None =>
        spans.select(col("__chunk"), lit(0L).as("__sub"),
          col("__start"), col("__end"), col("__n"))
      case Some(md) =>
        val nSub = ceil((col("__end") - col("__start")) / lit(md)).cast("long")
        val subs = spans
          .withColumn("__sub", explode(sequence(lit(0L), greatest(nSub, lit(1L)) - 1)))
          .withColumn("__sub_start", greatest(col("__start"),
            col("__start") + col("__sub") * lit(md) - lit(subChunkOverlap / 2)))
          .withColumn("__sub_end", least(col("__end"),
            col("__start") + (col("__sub") + 1) * lit(md) + lit(subChunkOverlap / 2)))
          .select(col("__chunk"), col("__sub"),
            col("__sub_start").as("__start"), col("__sub_end").as("__end"))
        // Recount per sub-chunk span (inclusive ends — spans are min/max
        // stamps): chunk-equi join + range predicate. count(__v), not
        // count(__idx): the whole-chunk path above counts non-null VALUES,
        // and the two paths previously disagreed on null-valued rows.
        val r = rows.select(col("__chunk").as("__rchunk"), col("__idx"),
          col("__v"))
        subs.join(r,
            col("__chunk") === col("__rchunk") &&
              col("__idx") >= col("__start") && col("__idx") <= col("__end"),
            "left")
          .groupBy("__chunk", "__sub", "__start", "__end")
          .agg(count(col("__v")).as("__n"))
    }
  }

  /** Keyed gap chunking: one chunk stream per entity (user/device), with
    * ids, spans and counts per key — `lag`/`sum` windows PARTITIONED BY THE
    * KEY are already parallel (state splits across executors), so no
    * distributed-scan machinery is needed. The batch twin of
    * `StreamingFeatures.chunkSessions`.
    * Returns (key, __chunk, __start, __end, __n).
    */
  def keyedChunkSpans(df: DataFrame, keyCol: String, idxCol: String,
                      valueCol: String, fs: Double, gapFactor: Double = 1.5,
                      unitPerSec: Double = 1e6): DataFrame = {
    val thr = gapFactor / fs * unitPerSec
    val w = Window.partitionBy(keyCol).orderBy(idxCol)
    df.select(col(keyCol), col(idxCol), col(valueCol))
      .withColumn("__diff", col(idxCol).cast("double") -
        lag(col(idxCol).cast("double"), 1).over(w))
      .withColumn("__new", when(col("__diff").isNull ||
        col("__diff") > lit(thr), 1L).otherwise(0L))
      .withColumn("__chunk",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
      .groupBy(col(keyCol), col("__chunk"))
      .agg(min(col(idxCol)).as("__start"), max(col(idxCol)).as("__end"),
        count(col(valueCol)).as("__n"))
  }

  /** The reference's `chunk_data` entry point (C1+C2+C3 composed): chunk
    * every series with its own sampling rate (`fs(name)`, else inferred),
    * apply the duration rules, and — when `margin` is given — group chunks
    * of different series whose spans agree within it (`matchRanges`).
    * Without a margin, returns the union of per-series spans tagged by
    * `__series` (reference: chunking.py:213-349 chunk_data).
    */
  def chunkData(series: Seq[Series], fs: Map[String, Double] = Map.empty,
                gapFactor: Double = 1.5, minDur: Option[Double] = None,
                maxDur: Option[Double] = None, subChunkOverlap: Double = 0.0,
                margin: Option[Double] = None): DataFrame = {
    require(series.nonEmpty, "chunkData needs at least one series")
    val spans = series.map(sr => sr.name ->
      chunkSpans(sr, fs.get(sr.name), gapFactor, minDur, maxDur, subChunkOverlap))
    margin match {
      case Some(m) => matchRanges(spans, m)
      case None => spans.map { case (n, df) =>
        df.select(lit(n).as("__series"), col("__chunk"), col("__sub"),
          col("__start"), col("__end"), col("__n"))
      }.reduce(_.unionAll(_))
    }
  }

  /** C3: group chunk spans of multiple series whose [start, end] agree
    * within `margin`. Returns matched pairs `(name_a, name_b, …spans…)`
    * via an interval tolerance self-join.
    */
  def matchRanges(spans: Seq[(String, DataFrame)], margin: Double): DataFrame = {
    // span tables are chunk-sized (tiny); pin the union so the tolerance
    // self-join's two sides read ONE materialization instead of re-running
    // every upstream chunkSpans scan pipeline twice
    val tagged = spans.map { case (n, df) =>
      df.select(lit(n).as("__series"), col("__chunk"),
        col("__start"), col("__end"))
    }.reduce(_.unionAll(_))
    val pinned = graft.core.Pinned.checkpoint(tagged)
    val a = pinned.as("a")
    val b = pinned.as("b")
    a.join(b,
      abs(col("a.__start") - col("b.__start")) <= lit(margin) &&
        abs(col("a.__end") - col("b.__end")) <= lit(margin) &&
        col("a.__series") < col("b.__series"))
      .select(col("a.__series").as("series_a"), col("b.__series").as("series_b"),
        col("a.__chunk").as("chunk_a"), col("b.__chunk").as("chunk_b"),
        col("a.__start").as("start_a"), col("a.__end").as("end_a"),
        col("b.__start").as("start_b"), col("b.__end").as("end_b"))
  }
}
