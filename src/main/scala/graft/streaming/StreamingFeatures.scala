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

  /** Per-row input to the consecutive-run state machine (key/group widened
    * to string so one encoder serves any column type; `ts` carries the
    * event time for the watermark, `tsUs` its exact micros).
    */
  case class RunIn(key: String, ts: java.sql.Timestamp, tsUs: Long,
                           group: String, v: Double)

  /** Open-run state kept per key between micro-batches. */
  case class RunState(group: String, startUs: Long, endUs: Long,
                              n: Long, sum: Double, mn: Double, mx: Double)

  case class RunOut(key: String, group: String, startUs: Long,
                            endUs: Long, n: Long, sum: Double, mn: Double,
                            mx: Double, mean: Double)

  /** Streaming `group_by_consecutive` (the G3 analog): consecutive rows of
    * one `keyCol` entity sharing the same `groupCol` value form a RUN; each
    * closed run emits one row with the run's bounds and value aggregates
    * (n/sum/min/max/mean — the algebraic core; the batch G3 path remains
    * the place for arbitrary feature stocks).
    *
    * This is the one graft operator whose streaming form genuinely needs
    * CUSTOM KEYED STATE, so it is built on
    * `KeyValueGroupedDataset.flatMapGroupsWithState` (append mode,
    * event-time timeout): state per key is the single open run (bounded —
    * independent of run length, since only the accumulators are kept), a
    * run closes when a later row arrives with a different group value,
    * when a SAME-group row arrives more than `closeAfter` past the run
    * end (the in-batch twin of the timeout rule), or when event time
    * passes `run end + closeAfter` (the timeout — so tail runs DO emit
    * without requiring a sentinel row). A grossly-late straggler (more
    * than `closeAfter` BEFORE the open run's start — it cannot be
    * consecutive with any known row of the run) emits as its own closed
    * run and leaves the open run untouched, confining the damage of
    * stray rows to themselves (mutually-consecutive same-group stragglers
    * arriving in one micro-batch fold into ONE such closed run, matching
    * what a batch replay makes of that island). Rows inside a
    * micro-batch are sorted by event time before folding; cross-batch
    * disorder is bounded by the `watermark` horizon, the same contract as
    * every Structured Streaming stateful operator. For IN-ORDER input the
    * output is independent of micro-batch boundaries; for late data the
    * append-mode emissions are a best effort — a closed run stays closed,
    * so a full batch replay of the same rows can merge what the stream
    * split. State is shuffled by
    * `keyCol`, so entity count is the scale-out axis — the 100 TB shape.
    *
    * Output columns: key, group, run_start, run_end, n, sum, min, max,
    * mean (event-time bounds as TimestampType).
    */
  def consecutiveRuns(df: DataFrame, tsCol: String, keyCol: String,
                      groupCol: String, valueCol: String, watermark: String,
                      closeAfter: TimeWin): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.{Encoder, Encoders}
    implicit val inEnc: Encoder[RunIn] = Encoders.product[RunIn]
    implicit val stEnc: Encoder[RunState] = Encoders.product[RunState]
    implicit val outEnc: Encoder[RunOut] = Encoders.product[RunOut]
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    val closeMs = closeAfter.micros / 1000L
    val in = df.withWatermark(tsCol, watermark)
      .select(col(keyCol).cast("string").as("key"), col(tsCol).as("ts"),
        unix_micros(col(tsCol)).as("tsUs"),
        col(groupCol).cast("string").as("group"),
        col(valueCol).cast("double").as("v"))
      .as[RunIn]

    def finish(st: RunState, key: String): RunOut =
      RunOut(key, st.group, st.startUs, st.endUs, st.n, st.sum, st.mn,
        st.mx, st.sum / st.n)

    val runs = in.groupByKey(_.key)
      .flatMapGroupsWithState[RunState, RunOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[RunIn], state: GroupState[RunState]) =>
          if (!rows.hasNext && state.hasTimedOut) {
            // no row can extend this run anymore (watermark passed
            // end + closeAfter): close it
            val out = state.getOption.map(finish(_, key))
            state.remove()
            out.iterator
          } else {
            // (tsUs, group) — the group tiebreaker makes run splitting
            // deterministic for equal-ts rows: the iterator order of a
            // shuffled micro-batch is arbitrary, so sorting by tsUs alone
            // would split equal-ts different-group islands differently
            // run-to-run (and against any batch oracle)
            val sorted = rows.toIndexedSeq.sortBy(r => (r.tsUs, r.group))
            val closed = scala.collection.mutable.ArrayBuffer.empty[RunOut]
            var cur = state.getOption
            val closeUs = closeMs * 1000L
            // Grossly-late stragglers are a PREFIX of the sorted batch (the
            // start-closeAfter threshold only moves down while the carried
            // run extends, and once it is replaced every later row is >=
            // the replacement's start), so mutually-consecutive stragglers
            // can fold into one pending run, flushed closed at batch end.
            var pendStrag: Option[RunState] = None
            sorted.foreach { r =>
              cur match {
                // a grossly-late straggler — more than closeAfter BEFORE
                // the open run's start, any group — is > the gap bound
                // away from every known row of the run: it can neither
                // extend the run nor precede-extend it. Fold it into the
                // pending straggler run (same group, gap within closeAfter)
                // or close that and start a fresh one; either way LEAVE THE
                // OPEN RUN'S STATE INTACT (closing the healthy run here
                // would fragment it into three emissions off one stray row).
                case Some(st) if r.tsUs < st.startUs - closeUs =>
                  pendStrag match {
                    case Some(ps) if ps.group == r.group &&
                        r.tsUs - ps.endUs <= closeUs =>
                      pendStrag = Some(ps.copy(endUs = r.tsUs, n = ps.n + 1,
                        sum = ps.sum + r.v, mn = math.min(ps.mn, r.v),
                        mx = math.max(ps.mx, r.v)))
                    case other =>
                      other.foreach(ps => closed += finish(ps, key))
                      pendStrag = Some(
                        RunState(r.group, r.tsUs, r.tsUs, 1L, r.v, r.v, r.v))
                  }
                // extend only while the event-time gap stays within
                // closeAfter — the SAME rule the timeout applies across
                // batches (a same-group row after a larger gap starts a new
                // run in both paths). Late rows within closeAfter of the
                // run's known span extend it and may pull run_start back.
                // Output is micro-batch-independent for in-order data; for
                // late data the already-emitted Append decisions can differ
                // from a full batch replay (see scaladoc).
                case Some(st) if st.group == r.group &&
                    r.tsUs - st.endUs <= closeUs =>
                  cur = Some(st.copy(startUs = math.min(st.startUs, r.tsUs),
                    endUs = math.max(st.endUs, r.tsUs),
                    n = st.n + 1, sum = st.sum + r.v,
                    mn = math.min(st.mn, r.v), mx = math.max(st.mx, r.v)))
                case other =>
                  other.foreach(st => closed += finish(st, key))
                  cur = Some(RunState(r.group, r.tsUs, r.tsUs, 1L, r.v, r.v, r.v))
              }
            }
            pendStrag.foreach(ps => closed += finish(ps, key))
            cur.foreach { st =>
              state.update(st)
              // timeout must sit above the current watermark; if the run is
              // already older than the horizon it closes on the next batch
              state.setTimeoutTimestamp(math.max(st.endUs / 1000L + closeMs,
                state.getCurrentWatermarkMs() + 1L))
            }
            closed.iterator
          }
      }
    runs.select(col("key"), col("group"),
      timestamp_micros(col("startUs")).as("run_start"),
      timestamp_micros(col("endUs")).as("run_end"),
      col("n"), col("sum"), col("mn").as("min"), col("mx").as("max"),
      col("mean"))
  }

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

  /** Keyed MULTI-window streaming rolling — the streaming analog of
    * `KeyedFeatures.calculateWideMulti` (the q72 shape: several window
    * lengths per entity in one query). Output is LONG form: one row per
    * (keys..., anchor, win) with one column per function (plain function
    * names — the window length lives in the `win` column, since a single
    * union output cannot carry per-branch W10 names).
    *
    * Physical shape: one windowed aggregation per (window, slide) pair,
    * unioned — Spark runs them as parallel stateful operators over the
    * same scan, each branch's state bounded by the watermark exactly as a
    * single `rolling` is; state and shuffle partition on the key columns,
    * so entity count remains the scale-out axis. (A wide pivot of the
    * branches would need a stream-stream join on (key, anchor) — more
    * state for no more information; consumers pivot downstream if needed.)
    */
  def rollingMulti(df: DataFrame, tsCol: String, valueCol: String,
                   seriesName: String, wins: Seq[(TimeWin, TimeWin)],
                   funcs: Seq[FeatureFunc], watermark: Option[String] = None,
                   offset: Option[String] = None,
                   keyCols: Seq[String] = Nil): DataFrame = {
    require(wins.nonEmpty, "need at least one (window, slide) pair")
    require(wins.map(_._1.render).distinct.length == wins.length,
      "duplicate window lengths: the win label column would be ambiguous")
    wins.map { case (w, sl) =>
      val branch = rolling(df, tsCol, valueCol, seriesName, w, sl, funcs,
        watermark, offset, keyCols)
      val renames = funcs.map { f =>
        col(s"`${Win.outputName(Seq(seriesName), f.name, w.render)}`")
          .as(f.name)
      }
      branch.select(keyCols.map(col) ++ Seq(col(tsCol),
        lit(w.render).as("win")) ++ renames: _*)
    }.reduce(_.unionByName(_))
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
    * (`graft.expr.WallInstantMicros` — by default gap/overlap wall times
    * RAISE rather than silently landing in the wrong window; `ambiguous` /
    * `nonexistent` opt into the pandas-parity policies, which an unbounded
    * stream needs — it will cross every DST transition it runs through).
    * A pure per-row projection, so it composes with any streaming source
    * before `rolling` / `chunkSessions`.
    */
  def fromWallClock(df: DataFrame, tsCol: String, zone: String,
                    ambiguous: String = "raise",
                    nonexistent: String = "raise"): DataFrame =
    df.withColumn(tsCol, timestamp_micros(
      graft.expr.WallInstantMicros(col(tsCol), zone, tsCol,
        ambiguous, nonexistent)))

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
