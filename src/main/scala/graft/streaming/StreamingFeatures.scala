package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core._

/** Structured Streaming extension — NOT part of the reference surface
  * (tsflex has no streaming engine; its docs describe "streaming inference"
  * as chunking + serialized pipelines, reference:
  * docs/pdoc_include/root_documentation.md:4). This module maps the two
  * streamable graft operations onto Spark's native streaming operators so
  * the same feature definitions run on an unbounded source:
  *
  *  - single-stride TIME rolling features → `window(ts, win, slide)`
  *    grouped aggregation (watermark + append mode for incremental output);
  *  - gap chunking (C1) → `session_window(ts, gap)`.
  *
  * Semantics note vs the batch engine: streaming `window()` aligns segment
  * starts to the epoch grid, while the batch segmenter anchors at the data's
  * min index (W1). On a stream the data min is unknowable, so grid alignment
  * is the streaming-native behavior — pass `offset` to reproduce a known
  * anchor.
  */
object StreamingFeatures {

  /** Rolling features on a (possibly streaming) frame. Output: one row per
    * window with the W6 `end` anchor in `tsCol` and one W10-named column per
    * function. All functions must be algebraic aggregates (the built-in
    * registry qualifies) so partial aggregation keeps state bounded.
    *
    * @param watermark e.g. "10 minutes"; required for append-mode streaming
    * @param offset    window-grid offset (e.g. the batch data's start), as a
    *                  duration string; empty = epoch-aligned
    */
  def rolling(df: DataFrame, tsCol: String, valueCol: String,
              seriesName: String, win: TimeWin, slide: TimeWin,
              funcs: Seq[FeatureFunc], watermark: Option[String] = None,
              offset: Option[String] = None,
              keyCols: Seq[String] = Nil): DataFrame = {
    val base = watermark.map(w => df.withWatermark(tsCol, w)).getOrElse(df)
    val idx = unix_micros(col(tsCol)).cast("double")
    val names = funcs.map(f => Win.outputName(Seq(seriesName), f.name, win.render))
    val aggs = funcs.zip(names).map { case (f, n) =>
      f.agg(idx, col(valueCol)).as(n)
    }
    val winCol = offset match {
      case Some(off) => window(col(tsCol), s"${win.micros} microseconds",
        s"${slide.micros} microseconds", off)
      case None => window(col(tsCol), s"${win.micros} microseconds",
        s"${slide.micros} microseconds")
    }
    // keyCols = per-entity streams (the KeyedFeatures analog): state and
    // shuffle partition on the key, so adding entities scales out
    base.groupBy(winCol +: keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(keyCols.map(col) ++ (col("window.end").as(tsCol) +:
        names.map(n => col(s"`$n`"))): _*)
  }

  /** Streaming exact dedup: drops rows whose normalized content key was
    * already seen within the watermark horizon — the streaming analog of
    * `Dedup.exactNormalized` (state is the key set, bounded by the
    * watermark; `dropDuplicatesWithinWatermark` evicts keys once they age
    * out). `keyExpr` defaults to the md5 of the normalized word bag, the
    * same key the batch operator groups on.
    */
  def dedupExact(df: DataFrame, tsCol: String, textCol: String,
                 watermark: String, keyExpr: Option[Column] = None): DataFrame = {
    val key = keyExpr.getOrElse(
      md5(concat_ws(" ", array_sort(array_distinct(
        split(trim(col(textCol)), "\\s+"))))))
    df.withColumn("__key", key)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__key")
      .drop("__key")
  }

  /** Wall-clock (TimestampNTZ) stream → instant (TimestampType) stream in
    * `zone`, via the same strict-DST native expression as the batch engine
    * (`graft.expr.WallInstantMicros` — gap/overlap wall times RAISE rather
    * than silently landing in the wrong window). A pure per-row projection,
    * so it composes with any streaming source before `rolling` /
    * `chunkSessions`.
    */
  def fromWallClock(df: DataFrame, tsCol: String, zone: String): DataFrame =
    df.withColumn(tsCol, timestamp_micros(
      graft.expr.WallInstantMicros(col(tsCol), zone, tsCol)))

  /** Streaming gap chunking: rows separated by more than `gap` start a new
    * session — the streaming analog of Chunker C1 (the batch engine's
    * lag-diff threshold becomes the session window's inactivity gap).
    * Output: (keys..., __start, __end, __n) per chunk.
    *
    * `keyCols` identifies the entity each session belongs to (a series or
    * device id). Streaming session windows REQUIRE at least one key (Spark
    * rejects global session aggregation), and keyed sessions are also the
    * shape that scales: state is partitioned by key across executors.
    */
  def chunkSessions(df: DataFrame, tsCol: String, valueCol: String,
                    gap: TimeWin, keyCols: Seq[String],
                    watermark: Option[String] = None): DataFrame = {
    require(keyCols.nonEmpty,
      "streaming session chunking needs at least one key column")
    val base = watermark.map(w => df.withWatermark(tsCol, w)).getOrElse(df)
    base.groupBy(session_window(col(tsCol), s"${gap.micros} microseconds") +:
        keyCols.map(col): _*)
      .agg(min(col(tsCol)).as("__start"), max(col(tsCol)).as("__end"),
        count(col(valueCol)).as("__n"))
      .select(keyCols.map(col) ++
        Seq(col("__start"), col("__end"), col("__n")): _*)
  }
}
