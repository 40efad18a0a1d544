package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core._
import graft.segment.{Bounds, Segmenter}

/** Common surface of unary and tuple-series feature descriptors — the
  * reference's `series_name: Union[str, Tuple[str, ...]]`
  * (tsflex/features/feature.py:121-168). Output naming joins the tuple with
  * `|` (W10, reference: strided_rolling.py:502-507).
  */
sealed trait AnyFeatureDescriptor {
  def seriesNames: Seq[String]
  def window: Option[Win]
  def strides: Option[Seq[Win]]
  def funcName: String
  def funcOutputNames: Option[Seq[String]]
  def emptyValue: Option[Column]

  /** Build the aggregate over the per-window rows: `idx` is the internal
    * index, `vs` one value column per series in `seriesNames` order.
    */
  def aggOver(idx: Column, vs: Seq[Column]): Column

  final def winRender: String = window.map(_.render).getOrElse("manual")
  final def outputName: String = Win.outputName(seriesNames, funcName, winRender)

  /** All output column names — one per entry of the function's
    * `outputNames` (multi-output FuncWrapper, A3), else the single name.
    */
  final def outputNamesAll: Seq[String] = funcOutputNames match {
    case Some(os) => os.map(o => Win.outputName(seriesNames, o, winRender))
    case None     => Seq(outputName)
  }
}

/** One feature: a function applied to strided windows of one series
  * (reference: tsflex/features/feature.py:121-168).
  *
  * @param function   the aggregation (FeatureFuncs registry or custom)
  * @param seriesName input series name
  * @param window     window size (None only valid with manual segments)
  * @param strides    stride(s); duplicates deduped & sorted (M5,
  *                   reference: feature.py:130)
  */
final case class FeatureDescriptor(
    function: FeatureFunc,
    seriesName: String,
    window: Option[Win] = None,
    strides: Option[Seq[Win]] = None) extends AnyFeatureDescriptor {
  require(window.forall(w => strides.forall(_.forall(_.domain == w.domain))),
    "window and strides must share the same domain (reference: feature.py:142-151)")

  def seriesNames: Seq[String] = Seq(seriesName)
  def funcName: String = function.name
  def funcOutputNames: Option[Seq[String]] = function.outputNames
  def emptyValue: Option[Column] = function.emptyValue
  def aggOver(idx: Column, vs: Seq[Column]): Column = function.agg(idx, vs.head)
}

/** A feature over a TUPLE of series (arity >= 2): each series is windowed
  * independently by the shared segment table, the per-window views are
  * paired by (segment, index), and `function` aggregates the paired columns
  * (reference: feature.py:121-168 tuple series_name; tests
  * test_features_feature_collection.py:1752-1838).
  */
final case class NaryFeatureDescriptor(
    function: NaryFunc,
    override val seriesNames: Seq[String],
    window: Option[Win] = None,
    strides: Option[Seq[Win]] = None) extends AnyFeatureDescriptor {
  require(seriesNames.lengthCompare(2) >= 0,
    "an n-ary feature needs at least two series (use FeatureDescriptor for one)")
  require(seriesNames.lengthCompare(function.arity) == 0,
    s"${function.name} consumes ${function.arity} series, got " +
      s"${seriesNames.length}: ${seriesNames.mkString("|")}")
  require(window.forall(w => strides.forall(_.forall(_.domain == w.domain))),
    "window and strides must share the same domain (reference: feature.py:142-151)")

  def funcName: String = function.name
  def funcOutputNames: Option[Seq[String]] = function.outputNames
  def emptyValue: Option[Column] = function.emptyValue
  def aggOver(idx: Column, vs: Seq[Column]): Column = function.agg(idx, vs)
}

/** M2: cross product functions × series × windows, strides shared
  * (reference: tsflex/features/feature.py:203-283).
  */
object MultipleFeatureDescriptors {
  def apply(functions: Seq[FeatureFunc], seriesNames: Seq[String],
            windows: Seq[Win], strides: Option[Seq[Win]] = None): Seq[FeatureDescriptor] =
    for {
      s <- seriesNames
      w <- windows
      f <- functions
    } yield FeatureDescriptor(f, s, Some(w), strides)
}

/** The feature-extraction plan + orchestrator — Spark-first analog of the
  * reference's `FeatureCollection` (tsflex/features/feature_collection.py).
  *
  * Physical plan per (series, window, strides) bucket: one lazy segment
  * table (W1-W4) → arithmetic window assignment (W5, zero-shuffle codegen)
  * → ONE fused `groupBy(__seg_id).agg(f1, f2, …)` over every feature in the
  * bucket (the reference runs each function as a separate task over the same
  * segmentation — fusing them is strictly better) → left join from the
  * segment table so empty windows survive (W7) → W10 naming → full-outer
  * merge of buckets on the anchor (S4). All aggregates are algebraic native
  * functions, so Spark's partial aggregation (map-side combine) keeps the
  * single shuffle tiny at scale.
  */
class FeatureCollection(val descriptors: Seq[AnyFeatureDescriptor]) {
  // col() with backtick quoting: feature names may contain dots
  // (e.g. quantile_0.25), which bare col() would parse as field access.
  private def qc(name: String): Column = col(s"`$name`")

  /** The group-by paths (G1/G3) operate on plain single-series features —
    * tuple features have no per-group pairing semantics in the reference.
    */
  private def groupedUnary: Seq[(String, Seq[AnyFeatureDescriptor])] = {
    require(descriptors.forall(_.seriesNames.lengthCompare(1) == 0),
      "group-by calculations support single-series features only")
    requireDistinctManualNames()
    descriptors.groupBy(_.seriesNames.head).toSeq
  }

  /** G1/G3 join per-series instants directly, so mixed timezones would
    * silently misalign rather than error — enforce the same-tz contract
    * calculate() applies (reference: strided_rolling.py:572-580).
    */
  private def requireSameTz(all: Seq[Series]): Unit = {
    val tzs = all.filter(_.domain == Domain.Time).map(_.tz).distinct
    require(tzs.lengthCompare(1) <= 0,
      s"all series must share the same timezone, got: " +
        tzs.map(_.getOrElse("<none>")).mkString(", "))
  }

  /** Manual renames (`w=manual`) collapse the window out of the output name,
    * so descriptors that pass the constructor's duplicate check (distinct
    * windows) can still collide. Re-validate the EFFECTIVE names wherever the
    * manual rename applies, turning a late ambiguous-column failure into the
    * clear duplicate-names error.
    */
  private def requireDistinctManualNames(): Unit = {
    val eff = descriptors.flatMap(d => d.funcOutputNames match {
      case Some(os) => os.map(o => Win.outputName(d.seriesNames, o, "manual"))
      case None     => Seq(Win.outputName(d.seriesNames, d.funcName, "manual"))
    })
    require(eff.distinct.length == eff.length,
      s"duplicate output names under manual segments: " +
        eff.diff(eff.distinct).distinct.mkString(", "))
  }

  {
    val names = descriptors.flatMap(_.outputNamesAll)
    require(names.distinct.length == names.length,
      s"duplicate output names: ${names.diff(names.distinct).mkString(", ")}")
  }

  /** M1: register additional descriptors. */
  def add(more: Seq[AnyFeatureDescriptor]): FeatureCollection =
    new FeatureCollection(descriptors ++ more)

  /** P1: only these series need to be read (column pruning). */
  def requiredSeries: Seq[String] = descriptors.flatMap(_.seriesNames).distinct

  /** M3: rebuild the minimal collection producing `outputNames`
    * (reference: feature_collection.py:1282-1353).
    */
  def reduce(outputNames: Seq[String]): FeatureCollection = {
    val keep = outputNames.toSet
    val kept = descriptors.filter(d => d.outputNamesAll.exists(keep))
    val missing = keep -- kept.flatMap(_.outputNamesAll).toSet
    require(missing.isEmpty, s"unknown output names: ${missing.mkString(", ")}")
    new FeatureCollection(kept)
  }

  /** Main entry point (reference: feature_collection.py:840-1262).
    *
    * @param data              the series (each with its own independent index)
    * @param strideOverride    calculate-level stride, wins over descriptor
    *                          strides (M4)
    * @param segmentStartIdxs  manual segment starts in INTERNAL index units
    *                          (epoch micros for TIME, raw for SEQUENCE) — W4
    * @param segmentEndIdxs    manual segment ends, same units
    * @param windowIdx         output anchor: "begin" | "middle" | "end" (W6)
    * @param includeFinalWindow W1 final-window rule
    * @param boundMethod       "inner" | "inner-outer" | "outer" (P3)
    * @param windowKeep        window-level sampling gate: given
    *                          (sampleCount, anchor) builds a predicate;
    *                          windows failing it are PRUNED BEFORE the
    *                          feature aggregation and emit no output row.
    *                          For super-linear per-window members
    *                          (O(n²) pair scans, CWT convolutions) this is
    *                          the engine-side mirror of an oracle's early
    *                          keep-CTE: a cheap count-only pass per segment,
    *                          a distributed filter over the SEGMENTS frame
    *                          (never a driver collect), and a left-semi
    *                          prune of the assigned rows — broadcast while
    *                          the kept-segment COUNT stays at or under
    *                          `windowKeepBroadcastLimit`, a shuffled semi
    *                          join above it (the count is free: the kept
    *                          frame is checkpointed for its two consumers
    *                          anyway) — so unkept windows never pay the
    *                          collect buffers or the kernel, and a
    *                          keep-almost-everything predicate degrades to
    *                          a shuffle instead of an executor OOM.
    *                          Restricted to single-bucket collections (one
    *                          (series, window, strides) group): there the
    *                          output is identical — rows, values, names —
    *                          to calculating everything and filtering
    *                          afterwards. (Across SEVERAL buckets the
    *                          full-outer anchor merge would null out the
    *                          dropped bucket's columns instead of dropping
    *                          rows — a shape no post-filter produces — so
    *                          that composition is rejected loudly.)
    * @param windowKeepBroadcastLimit max kept-segment count that still
    *                          broadcasts the semi-join side (id column
    *                          only, 8 B/row)
    */
  def calculate(
      data: Seq[Series],
      strideOverride: Option[Seq[Win]] = None,
      segmentStartIdxs: Option[Seq[Double]] = None,
      segmentEndIdxs: Option[Seq[Double]] = None,
      windowIdx: String = "end",
      includeFinalWindow: Boolean = false,
      boundMethod: String = "inner",
      windowKeep: Option[(Column, Column) => Column] = None,
      windowKeepBroadcastLimit: Long = 4000000L,
      // false forces the per-series assign + (segment, index) join plan
      // for same-source tuples — the differential twin (NaryFusedSpec)
      fuseSameSourceTuples: Boolean = true): DataFrame = {
    require(windowKeep.isEmpty || (segmentStartIdxs.isEmpty &&
      segmentEndIdxs.isEmpty),
      "windowKeep is not supported with manual segments")
    require(segmentStartIdxs.isEmpty && segmentEndIdxs.isEmpty || strideOverride.isEmpty,
      "cannot pass both segment indexes and a stride (M4)")
    val byName = data.map(s => s.name -> s).toMap
    val used = requiredSeries.map(n => byName.getOrElse(n,
      throw new IllegalArgumentException(s"series $n not in data")))
    // all TIME series in one calculate must share a timezone (reference:
    // strided_rolling.py:572-580 "strided rolling input data must all have
    // same timezone")
    val tzs = used.filter(_.domain == Domain.Time).map(_.tz).distinct
    require(tzs.lengthCompare(1) <= 0,
      s"strided rolling input data must all have the same timezone, got: " +
        tzs.map(_.getOrElse("<none>")).mkString(", "))
    val manualSegs = segmentStartIdxs.isDefined || segmentEndIdxs.isDefined

    // One bucket per (series tuple, window, effective strides): shared
    // segmentation, fused aggregation (reference buckets at
    // feature_collection.py:88-96).
    val buckets = descriptors.groupBy { d =>
      (d.seriesNames, d.window, if (manualSegs) None else strideOverride.orElse(d.strides))
    }
    // windowKeep's "identical to filter-afterwards" contract holds only
    // within one bucket — across buckets the full-outer anchor merge would
    // turn a window dropped in one bucket but kept in another into a row
    // with nulls for the dropped bucket's features (no single post-filter
    // produces that shape), so reject the composition loudly (ADVICE r17)
    require(windowKeep.isEmpty || buckets.size == 1,
      s"windowKeep requires a single (series, window, strides) bucket, " +
        s"got ${buckets.size}: split the calculate() call per bucket")

    // Both segment arrays given → window ignored → names use w=manual
    // (reference: strided_rolling.py:198-211, _create_feat_col_name).
    val bothManual = segmentStartIdxs.isDefined && segmentEndIdxs.isDefined
    if (bothManual) requireDistinctManualNames()
    def nameOf(d: AnyFeatureDescriptor): String =
      if (bothManual) Win.outputName(d.seriesNames, d.funcName, "manual")
      else d.outputName

    // lazy: bounds cost one eager min/max SCAN PER SERIES — manual-segment
    // and pure sample-window plans never read them, and at scale a wasted
    // full scan per series is real money
    lazy val b: Bounds = Segmenter.bounds(used, boundMethod)

    val bucketFrames = buckets.toSeq.map { case ((sNames, win, strides), ds) =>
      val seriesSeq = sNames.map(byName)
      require(seriesSeq.map(_.domain).distinct.lengthCompare(1) == 0,
        s"all series of a tuple feature must share a domain: ${sNames.mkString("|")}")
      val series = seriesSeq.head
      val spark = series.df.sparkSession
      val isSample = win.exists(_.isInstanceOf[SampleWin])
      require(!isSample || seriesSeq.lengthCompare(1) == 0,
        "sample-count windows support single-series features only")
      // manual segment arrays are in INDEX units; a sample-count window
      // segments in positional space — mixing them would silently assign
      // the wrong rows (reference raises NotImplementedError,
      // strided_rolling.py sample-based + segment idxs)
      require(!(isSample && manualSegs),
        "segment start/end idxs are not supported for sample-count windows")

      // W9: sample-count windows over a TIME index — segment in positional
      // space, stitch the time index back on via the position (reference:
      // strided_rolling.py:627-698).
      val (rows, bounds, posToIdx) =
        if (isSample) {
          require(series.domain == Domain.Time,
            "sample-count windows require a TIME-indexed series")
          // distributed positional index (no single-partition row_number);
          // pinned once — the count below, the assignment branch AND the
          // anchor-stitch idxMap join all read it (three scans otherwise)
          val pos = Pinned.checkpoint(
            Scan.position(series.internal, "__idx", "__posl")
              .withColumn("__pos", col("__posl").cast("double")).drop("__posl"))
          val n = pos.count()
          (pos.select(col("__pos").as("__idx"), col("__v"), col("__pos"),
            col("__idx").as("__orig_idx")),
            Bounds(0.0, (n - 1).toDouble), true)
        } else (series.internal, b, false)

      val plan =
        if (manualSegs)
          Segmenter.manual(spark, segmentStartIdxs, segmentEndIdxs,
            win.map(_.amount))
        else {
          val w = win.getOrElse(throw new IllegalArgumentException(
            "cannot calculate features without a window or segment indexes"))
          val st = strides.getOrElse(throw new IllegalArgumentException(
            "cannot calculate features without a stride or segment indexes"))
          if (!isSample) require(
            w.domain == series.domain && st.forall(_.domain == series.domain),
            s"window/stride domain must match series domain for ${sNames.mkString("|")}")
          Segmenter.regular(spark, bounds, w.amount, st.map(_.amount),
            includeFinalWindow, w.render)
        }

      // Unary: one assigned frame, values in __v. Tuple: each series is
      // assigned independently by the SAME plan, then the per-window views
      // pair by (segment, index) — one co-partitioned equi-join per extra
      // series, each side shuffled on the same key (reference passes one
      // windowed view per series, strided_rolling.py:455-470).
      // r19 same-source tuple fusion (guide §2.4): when every tuple series
      // wraps the SAME frame and index column (sameResult gate, like the
      // G3 fusion), the per-series assignment + (segment, index) equi-join
      // chain is the identity — ONE wide assignment off one scan carries
      // every value column, deleting n−1 scans, n−1 assignment exchanges
      // and n−1 joins (q38's corr/covar pair and q51's 3-series wcorr were
      // 2–3 full scans + self-joins of the same 10M-row frame). Rows with
      // a DUPLICATED index are a semantic edge: the join path
      // cross-multiplies them per series while the wide path keeps them
      // row-aligned — the fused form matches the reference (one windowed
      // view per column of one frame) and the DuckDB twins; the join path
      // keeps serving genuinely different sources, where duplicates keep
      // their documented KNOWN-LIMITATION behavior (see the anchor-join
      // note below).
      val sameSourceTuple = fuseSameSourceTuples &&
        seriesSeq.lengthCompare(1) > 0 && !isSample &&
        seriesSeq.tail.forall(s2 =>
          s2.idxCol == series.idxCol && s2.tz == series.tz &&
            ((s2.df eq series.df) || s2.df.queryExecution.analyzed
              .sameResult(series.df.queryExecution.analyzed)))
      val (assigned, valueCols) =
        if (seriesSeq.lengthCompare(1) == 0)
          (Segmenter.assign(rows, plan), Seq(col("__v")))
        else if (sameSourceTuple) {
          val wide = series.internalPlus(seriesSeq.tail.zipWithIndex.map {
            case (s2, i) => s2.valueCol -> s"__v${i + 1}" }: _*)
            .withColumnRenamed("__v", "__v0")
          (Segmenter.assign(wide, plan),
            seriesSeq.indices.map(i => col(s"__v$i")))
        } else {
          val parts = seriesSeq.zipWithIndex.map { case (s2, i) =>
            Segmenter.assign(s2.internal, plan)
              .select(col("__seg_id"), col("__idx"), col("__v").as(s"__v$i"))
          }
          (parts.reduce((a, c) => a.join(c, Seq("__seg_id", "__idx"))),
            seriesSeq.indices.map(i => col(s"__v$i")))
        }
      // Window-level sampling gate: count rows per segment (cheap map-side
      // partial agg), filter the SEGMENTS frame on (count, anchor) — fully
      // distributed, window-count-linear, no driver collect — then prune
      // the assigned rows with a left-semi join so unkept windows reach
      // neither the collect_list buffers nor the per-window kernels.
      // The kept-segments frame is pinned: it feeds both the semi-join and
      // the W7 left join, and re-deriving it would re-run the count pass;
      // the same pin makes the COUNTED broadcast degrade free — the ids
      // broadcast only while their count is at or under the limit, else
      // the semi join shuffles both sides (a keep-almost-everything
      // predicate costs a shuffle, never an executor OOM; ADVICE r17).
      val (assignedG, segsG) = windowKeep match {
        case Some(keep) =>
          require(seriesSeq.lengthCompare(1) == 0 && !posToIdx,
            "windowKeep supports single-series time/sequence windows only")
          val cnt = assigned.groupBy("__seg_id")
            .agg(count(valueCols.head).as("__wn"))
          val anchorC = series.restoreIdx(Segmenter.anchor(windowIdx))
          val kept = Pinned.checkpoint(
            plan.segments.join(cnt, Seq("__seg_id"), "left")
              .where(keep(coalesce(col("__wn"), lit(0L)), anchorC))
              .drop("__wn"))
          val keptIds = kept.select("__seg_id")
          val hinted =
            if (kept.count() <= windowKeepBroadcastLimit) broadcast(keptIds)
            else keptIds
          (assigned.join(hinted, Seq("__seg_id"), "left_semi"), kept)
        case None => (assigned, plan.segments)
      }
      val aggCols = ds.map(d =>
        d.aggOver(col("__idx"), valueCols).as(nameOf(d)))
      val agged = assignedG.groupBy("__seg_id").agg(aggCols.head, aggCols.tail: _*)

      // W7: segments with zero rows still emit a row (left join, never inner).
      var joined = segsG.join(agged, Seq("__seg_id"), "left")
      ds.foreach { d =>
        d.emptyValue.foreach { ev =>
          joined = joined.withColumn(nameOf(d), coalesce(qc(nameOf(d)), ev))
        }
      }
      val anchorRaw = Segmenter.anchor(windowIdx)
      val anchorCol =
        if (posToIdx) {
          // Stitch the original time index back by position. The anchor may
          // be fractional (windowIdx="middle" → k + 0.5) or one past the last
          // sample (includeFinalWindow end == n), so floor and clamp to the
          // positional bounds [0, n-1] — every anchor maps to an existing
          // sample, mirroring the reference's positional index lookup
          // (reference: strided_rolling.py:627-698).
          val anchorPos = least(greatest(floor(anchorRaw).cast("double"),
            lit(bounds.start)), lit(bounds.end))
          val idxMap = rows.select(col("__pos"), col("__orig_idx"))
          joined = joined.join(idxMap, anchorPos === col("__pos"), "left")
          series.restoreIdx(col("__orig_idx"))
        } else series.restoreIdx(anchorRaw)
      // multi-output functions (A3 one-to-many) return a struct — expand
      // each declared output into its own W10-named column
      def expand(d: AnyFeatureDescriptor): Seq[Column] = d.funcOutputNames match {
        case Some(os) =>
          val winR = if (bothManual) "manual" else d.winRender
          os.map(o => qc(nameOf(d)).getField(o)
            .as(Win.outputName(d.seriesNames, o, winR)))
        case None => Seq(qc(nameOf(d)))
      }
      // anchor column carries the input zone as metadata (tz retention for
      // instant-typed indexes; NTZ indexes round-trip via restoreIdx).
      // Manual plans keep __seg_id: user-supplied segment arrays may contain
      // DUPLICATE anchors (reference preserves them, one output row per
      // input entry), so the cross-bucket merge must pair rows by segment
      // POSITION — joining duplicated anchors would cross-multiply.
      val keyCols =
        if (manualSegs) Seq(col("__seg_id"))
        else Nil
      joined.select(keyCols ++ (anchorCol.as(series.idxCol, series.idxMetadata) +:
        ds.flatMap(expand)): _*)
    }

    // one calculate() merges every bucket on ONE anchor column — series
    // with differently-named index columns would fail the join below with
    // an opaque USING-column error, so reject them up front
    require(used.map(_.idxCol).distinct.lengthCompare(1) == 0,
      s"all series in one calculate() must share the index column name; " +
        s"got ${used.map(_.idxCol).distinct.mkString(", ")}")
    val idxName = used.head.idxCol
    val merged =
      if (manualSegs)
        // pair by segment POSITION and anchor: identical anchors (both
        // arrays manual, or anchor=begin) join 1:1 even when duplicated;
        // starts-only with per-bucket window-derived END anchors produces
        // one row PER DISTINCT ANCHOR (the reference's index-aligned
        // merge) instead of silently keeping an arbitrary bucket's anchor
        // for all buckets' features
        bucketFrames.reduceLeft((a, c) =>
          a.join(c, Seq("__seg_id", idxName), "full_outer"))
          .drop("__seg_id")
      else
        // KNOWN LIMITATION: this join compares double anchors computed
        // independently per bucket. TIME-domain anchors are integer micros
        // (exact in doubles up to 2^53) so they always align; SEQUENCE
        // anchors with FRACTIONAL strides can differ by 1 ulp between
        // buckets and split a logical row — use integer-valued sequence
        // strides, or KeyedFeatures.calculateWideMulti, whose pivot groups
        // on exact integer offsets k*stride.
        bucketFrames.reduce((a, c) => a.join(c, Seq(idxName), "full_outer"))
    val featCols = merged.columns.filterNot(_ == idxName).sorted
    // ordering is the caller's concern (every sink re-sorts anyway) — not
    // baked into the plan, saving a global sort stage per calculate()
    merged.select(col(idxName) +: featCols.toIndexedSeq.map(qc): _*)
  }

  /** G1 `group_by_all` — pseudo-SQL `SELECT f(x) FROM data GROUP BY g`
    * (reference: feature_collection.py:484-566). Series rows are matched to
    * group values by index equality; NaN/null group rows ignored (P5);
    * output names use `w=manual`.
    */
  def calculateGroupByAll(data: Seq[Series], group: Series): DataFrame = {
    requireSameTz(data :+ group)
    val byName = data.map(s => s.name -> s).toMap
    val g = group.internal
      .where(col("__v").isNotNull && (group.df.schema(group.valueCol).dataType match {
        case org.apache.spark.sql.types.DoubleType | org.apache.spark.sql.types.FloatType => !isnan(col("__v"))
        case _ => lit(true)
      }))
      .select(col("__idx"), col("__v").as("__grp"))
    val frames = groupedUnary.map { case (sName, ds) =>
      val series = byName(sName)
      val joined = series.internal.join(g, Seq("__idx"), "inner")
      val aggCols = ds.map { d =>
        val n = Win.outputName(d.seriesNames, d.funcName, "manual")
        d.aggOver(col("__idx"), Seq(col("__v"))).as(n)
      }
      joined.groupBy(col("__grp").as(group.name)).agg(aggCols.head, aggCols.tail: _*)
    }
    val merged = frames.reduce((a, c) => a.join(c, Seq(group.name), "full_outer"))
    val featCols = merged.columns.filterNot(_ == group.name).sorted
    merged.select(col(group.name) +: featCols.toIndexedSeq.map(qc): _*)
  }

  /** G2: pre-grouped wide-frame convenience — `df` holds the index, the
    * grouping column, and every required series as columns (the analog of
    * passing a `DataFrameGroupBy`, reference:
    * feature_collection.py:876-879). Thin sugar over `calculateGroupByAll`.
    */
  def calculateGrouped(df: DataFrame, idxCol: String, groupCol: String): DataFrame =
    calculateGroupByAll(
      requiredSeries.map(n => Series(n, df, idxCol, n)),
      Series(groupCol, df, idxCol, groupCol))

  /** G3 `group_by_consecutive` — gaps-and-islands sessionization: maximal
    * runs of equal group values form segments `[run_start, next_run_start)`
    * (last run closed by end + 1 unit/day), features per run, output gets
    * the group value plus `__start`/`__end` run boundaries (reference:
    * feature_collection.py:568-724). Implemented as lag→change-flag→running
    * sum → run table → broadcast range join.
    */
  def calculateGroupByConsecutive(data: Seq[Series], group: Series): DataFrame =
    calculateGroupByConsecutive(data, group, fuseSameSource = true)

  /** `fuseSameSource = false` forces the generic union-scan plan — kept as
    * the differential twin (G3FusedSpec pins row identity between the two).
    */
  def calculateGroupByConsecutive(data: Seq[Series], group: Series,
                                  fuseSameSource: Boolean): DataFrame = {
    requireSameTz(data :+ group)
    // SAME-SOURCE FUSION (r19, guide §2.4 "remove shuffles/passes"): when
    // every value series reads the group series' OWN frame and index column
    // (q12's shape — group=user_id, value=value, both over one events read),
    // run assignment needs no second scan, no start-marker union, no
    // forward-fill pass and no segments-to-features join: ONE ranged scan
    // (Scan.groupRunScan) tags every row with its run id, and ONE aggregate
    // computes the run boundaries AND every feature. The generic path's
    // 100× ablation (ProbeQ12): full query ~330-370 s CPU, of which the
    // second scan + 2×rows union exchange/pin + fill-forward + the
    // runs⋈feats join — everything this branch removes — own the majority.
    // same-source = the same analyzed plan (two `spark.read.parquet(path)`
    // calls of one file compare equal under sameResult), same index column
    // and same tz interpretation — everything that makes `internalPlus`
    // over the group frame see exactly each series' `internal` rows
    val fusible = fuseSameSource && data.forall(s =>
      s.idxCol == group.idxCol && s.tz == group.tz &&
        ((s.df eq group.df) || s.df.queryExecution.analyzed
          .sameResult(group.df.queryExecution.analyzed)))
    if (fusible) return fusedGroupByConsecutive(data, group)
    genericGroupByConsecutive(data, group)
  }

  /** The fused same-source G3 plan — see the gate above. Row-identical to
    * [[genericGroupByConsecutive]] on same-source inputs (G3FusedSpec):
    * every frame row is a value row of every series, so each run owns at
    * least its own group row and the generic path's empty-segment NULL
    * (a seg with no rows of some series) cannot arise; null-group rows
    * carry the last run exactly like the forward-filled start markers; the
    * `max(group idx) + 1 unit/day` terminator becomes a bound filter fed by
    * the same per-partition summary the scan already aggregates.
    */
  private def fusedGroupByConsecutive(data: Seq[Series],
                                      group: Series): DataFrame = {
    val valueCols = data.map(s => s.name -> s.valueCol)
    val wide = group.internalPlus(
        valueCols.map { case (n, c) => c -> s"__val_$n" }: _*)
      .withColumnRenamed("__v", "__grp")
      // tie order: a run's first (group) row sorts before null-group rows
      // at the same index — the union-scan path's tag-0-before-tag-1
      // ordering for start markers
      .withColumn("__gn", when(col("__grp").isNotNull, 0).otherwise(1))
    val scanned = Scan.groupRunScan(wide, Seq("__idx", "__gn"), "__grp",
      "__idx", "__run", "__gmax")
    val lastExt = group.domain match {
      case Domain.Time     => 86400e6 // +1 day (reference: :682-688)
      case Domain.Sequence => 1.0
    }
    // rows before the first run (run 0) and at/after the last segment's
    // close are outside every segment — the generic path's null/-1 drops
    val kept = scanned.where(col("__run") > 0 &&
      col("__idx") < col("__gmax") + lit(lastExt))
    val grpNN = col("__grp").isNotNull
    val featAggs = groupedUnary.toSeq.flatMap { case (sName, ds) =>
      ds.map { d =>
        val n = Win.outputName(d.seriesNames, d.funcName, "manual")
        d.aggOver(col("__idx"), Seq(col(s"__val_$sName"))).as(n)
      }
    }
    val aggCols =
      Seq(max(when(grpNN, col("__idx"))).as("__end"),
        first(col("__grp"), ignoreNulls = true).as("__grp")) ++ featAggs
    val out = kept.groupBy("__run").agg(
      min(when(grpNN, col("__idx"))).as("__start"), aggCols: _*)
    val featCols = out.columns
      .filterNot(Set("__run", "__start", "__end", "__grp"))
      .sorted
    out.select(
      (col("__grp").as(group.name) +:
        featCols.toIndexedSeq.map(qc)) :+
        group.restoreIdx(col("__start")).as("__start") :+
        group.restoreIdx(col("__end")).as("__end"): _*)
  }

  private def genericGroupByConsecutive(data: Seq[Series],
                                        group: Series): DataFrame = {
    val byName = data.map(s => s.name -> s).toMap
    // change-flag + run numbering as ONE fused distributed prefix scan
    // (Scan.lagFlagScan) — the reference's `(v != v.shift()).cumsum()`
    // without a single-partition global window, and without the second
    // window pass a chained withLagged + runningSum would cost.
    val runsBase = Scan.lagFlagScan(
      group.internal.where(col("__v").isNotNull), "__idx", "__v",
      (prev, cur) => prev.isNull || prev =!= cur, "__run")
    // The run table feeds several plan branches (start markers per series
    // frame, the next-run self-join, the final output join); a lazy
    // localCheckpoint materializes the two-scan pipeline above ONCE and lets
    // every branch read the cached result. It is bounded by the number of
    // RUNS (not rows), and blocks are dropped when the frame is GC'd.
    val runs = Pinned.checkpoint(runsBase.groupBy("__run").agg(
      min(col("__idx")).as("__start"),
      max(col("__idx")).as("__end"),
      first(col("__v")).as("__grp")))
    val lastExt = group.domain match {
      case Domain.Time     => 86400e6 // +1 day (reference: :682-688)
      case Domain.Sequence => 1.0
    }
    // run ids are CONSECUTIVE integers (inclusive running sum of change
    // flags), so "next run's start" is a plain equi-join on run+1 — a hash
    // join over the checkpointed run table, no ordered scan needed
    val runsLead = runs.join(
      runs.select((col("__run") - 1).as("__run"),
        col("__start").as("__next_start")),
      Seq("__run"), "left")
    val segs = runsLead.withColumn("__seg_end",
      coalesce(col("__next_start"), col("__end") + lit(lastExt)))
      .select(col("__run").as("__seg_id"), col("__start").as("__seg_start"),
        col("__seg_end"), col("__start"), col("__end"), col("__grp"))

    // Runs tile the index axis contiguously, so window→row assignment needs
    // no join at all: union run-start markers with the data rows, sort, and
    // propagate the last seen run id (an as-of assignment). Linear, vs the
    // O(rows × runs) a nested-loop range join would cost.
    val frames = groupedUnary.map { case (sName, ds) =>
      val series = byName(sName)
      val rows = series.internal
      val vType = rows.schema("__v").dataType
      // start markers come straight off the checkpointed run table (seg_start
      // IS the run's min idx — no next-run join needed on this branch)
      val starts = runs.select(col("__start").as("__idx"), lit(0).as("__tag"),
        col("__run").as("__runid"), lit(null).cast(vType).as("__v"))
      // the terminator closes the LAST run at max(__seg_end) = the group
      // series' max index + lastExt. r19: read it off the CHECKPOINTED run
      // table (global max(__end) = global max(__idx) over the non-null
      // group rows — every row belongs to exactly one run and __end is the
      // run's max index), replacing a second full scan of the group input
      // with a tiny agg over the run rows (guide §2.4: remove passes; at
      // scale the saved pass is a full input read)
      val term = runs
        .agg((max(col("__end")) + lit(lastExt)).as("__idx"))
        .select(col("__idx"), lit(0).as("__tag"), lit(-1L).as("__runid"),
          lit(null).cast(vType).as("__v"))
      val rowsT = rows.select(col("__idx"), lit(1).as("__tag"),
        lit(null).cast("long").as("__runid"), col("__v"))
      // as-of carry of the last seen run id — distributed forward fill
      val assigned = Scan.fillForward(
        starts.unionByName(term).unionByName(rowsT),
        Seq("__idx", "__tag"), "__runid", "__seg_id")
        .where(col("__tag") === 1 && col("__seg_id").isNotNull &&
          col("__seg_id") =!= -1L)
      val aggCols = ds.map { d =>
        val n = Win.outputName(d.seriesNames, d.funcName, "manual")
        d.aggOver(col("__idx"), Seq(col("__v"))).as(n)
      }
      assigned.groupBy("__seg_id").agg(aggCols.head, aggCols.tail: _*)
    }
    val feats = frames.reduce((a, c) => a.join(c, Seq("__seg_id"), "full_outer"))
    val out = segs.join(feats, Seq("__seg_id"), "left")
    val featCols = out.columns
      .filterNot(Set("__seg_id", "__seg_start", "__seg_end", "__start", "__end", "__grp"))
      .sorted
    out.select(
      (col("__grp").as(group.name) +:
        featCols.toIndexedSeq.map(qc)) :+
        group.restoreIdx(col("__start")).as("__start") :+
        group.restoreIdx(col("__end")).as("__end"): _*)
  }

  /** Validation report — the reference's warning surface, as data. The
    * reference WARNS AND PROCEEDS on several degenerate-but-legal inputs;
    * this engine's behavior is semantically identical (rows survive the
    * left join, NaN group rows are filtered) but a Spark job has no warning
    * channel that reaches the caller, so the findings are returned as a
    * DataFrame instead: one row per would-be warning,
    * `(check, subject, detail)` — empty report = nothing to warn about.
    *
    * Checks (each cites the reference warning it mirrors):
    *  - `mixed_window_stride_dtypes` — descriptors whose window/stride
    *    datatypes disagree across the collection
    *    (feature_collection.py:161-196 `_check_feature_descriptors`)
    *  - `segments_outside_data_bounds` — manual segment indexes outside the
    *    data's bound range (strided_rolling.py:548-551,604-614
    *    OUTSIDE_DATA_BOUNDS_WARNING)
    *  - `nan_group_rows` — null/NaN values in the grouping series, whose
    *    rows grouped calculations ignore (feature_collection.py:509-519)
    *  - `sparsity` — series whose per-segment sample counts vary (nonzero
    *    peak-to-peak), i.e. the data is sparse w.r.t. the segmentation
    *    (strided_rolling.py:230-239; suppress with approveSparsity, the
    *    reference's `approve_sparsity` analog)
    */
  def validate(data: Seq[Series],
               group: Option[Series] = None,
               segmentStartIdxs: Option[Seq[Double]] = None,
               segmentEndIdxs: Option[Seq[Double]] = None,
               includeFinalWindow: Boolean = false,
               boundMethod: String = "inner",
               approveSparsity: Boolean = false): DataFrame = {
    val spark = data.headOption.map(_.df.sparkSession).getOrElse(
      throw new IllegalArgumentException("validate needs at least one series"))
    import spark.implicits._
    val empty = Seq.empty[(String, String, String)].toDF("check", "subject", "detail")
    def rows(rs: Seq[(String, String, String)]): Option[DataFrame] =
      if (rs.isEmpty) None else Some(rs.toDF("check", "subject", "detail"))
    val byName = data.map(s => s.name -> s).toMap
    val used = requiredSeries.flatMap(byName.get)

    // mixed window/stride dtypes — driver-side descriptor metadata
    def dtypeName(w: Win): String = w match {
      case _: TimeWin   => "time"
      case _: SeqWin    => "sequence"
      case _: SampleWin => "samples"
    }
    val dtypes = descriptors.flatMap(d =>
      (d.window.toSeq ++ d.strides.getOrElse(Nil)).map(dtypeName)).distinct.sorted
    val mixed = rows(
      if (dtypes.lengthCompare(1) > 0)
        Seq(("mixed_window_stride_dtypes",
          descriptors.map(_.outputName).mkString(","),
          s"multiple window/stride datatypes present: ${dtypes.mkString(", ")}"))
      else Nil)

    // manual segments vs data bounds — the arrays are driver-side already
    val manualOob = rows(
      if ((segmentStartIdxs.isDefined || segmentEndIdxs.isDefined) && used.nonEmpty) {
        val b = Segmenter.bounds(used, boundMethod)
        val oob = (segmentStartIdxs.getOrElse(Nil) ++ segmentEndIdxs.getOrElse(Nil))
          .filter(x => x < b.start || x > b.end)
        if (oob.nonEmpty)
          Seq(("segments_outside_data_bounds", used.map(_.name).mkString(","),
            s"${oob.length} segment idx(s) outside [${b.start}, ${b.end}], " +
              s"e.g. ${oob.head} — their windows will hold no/partial data"))
        else Nil
      } else Nil)

    // null/NaN group rows — distributed count, lazily folded into the report
    val nanGroup = group.map { g =>
      val isFloating = g.df.schema(g.valueCol).dataType match {
        case org.apache.spark.sql.types.DoubleType |
             org.apache.spark.sql.types.FloatType => true
        case _ => false
      }
      val badGroup = col(g.valueCol).isNull ||
        (if (isFloating) isnan(col(g.valueCol)) else lit(false))
      g.df.where(badGroup).agg(count(lit(1)).as("__n")).where(col("__n") > 0)
        .select(lit("nan_group_rows").as("check"), lit(g.name).as("subject"),
          format_string("%d rows with null/NaN values in grouping series " +
            "'%s' will be ignored", col("__n"), lit(g.name)).as("detail"))
    }

    // input-layout monotonicity — the reference auto-sorts a non-monotonic
    // series index and warns (feature_collection.py:455-466). The relational
    // scans here sort internally, so results are unaffected; the finding is
    // informational: rows out of index order WITHIN a storage partition mean
    // the files aren't index-sorted (per-partition order is the only
    // deterministic order a distributed frame has).
    val nonMono = used.map { s =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("__p")).orderBy(col("__m"))
      s.internal.select(col("__idx"),
          spark_partition_id().as("__p"), monotonically_increasing_id().as("__m"))
        .withColumn("__prev", lag(col("__idx"), 1).over(w))
        .where(col("__prev") > col("__idx"))
        .agg(count(lit(1)).as("__n")).where(col("__n") > 0)
        .select(lit("non_monotonic_input").as("check"), lit(s.name).as("subject"),
          format_string("%d rows out of index order in the input layout; " +
            "scans sort internally (the reference auto-sorts and warns)",
            col("__n")).as("detail"))
    }

    // sparsity per (window, strides) bucket — distributed ptp counts
    val sparsityReports =
      if (approveSparsity || used.isEmpty) Nil
      else descriptors
        .filter(d => d.window.exists(!_.isInstanceOf[SampleWin]) && d.strides.isDefined)
        .groupBy(d => (d.window.get, d.strides.get)).keys.toSeq
        .map { case (win, strides) =>
          val series = used.filter(_.domain == win.domain)
          if (series.isEmpty) empty
          else Segmenter.sparsity(series, Segmenter.bounds(series, boundMethod),
            win.amount, strides.map(_.amount), includeFinalWindow)
            .where(col("ptp") > 0)
            .select(lit("sparsity").as("check"), col("series").as("subject"),
              format_string("per-segment sample counts vary for w=%s: " +
                "min=%d max=%d (sparse w.r.t. this segmentation)",
                lit(win.render), col("min_n"), col("max_n")).as("detail"))
        }

    (Seq(empty) ++ mixed ++ manualOob ++ nanGroup ++ nonMono ++ sparsityReports)
      .reduce(_.unionByName(_))
  }
}

object FeatureCollection {
  def apply(ds: AnyFeatureDescriptor*): FeatureCollection = new FeatureCollection(ds)
  def of(ds: Seq[AnyFeatureDescriptor]): FeatureCollection = new FeatureCollection(ds)
}
