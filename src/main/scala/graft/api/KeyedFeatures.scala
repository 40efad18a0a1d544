package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core._

/** Per-key strided-rolling feature extraction — the shape a 100 TB workload
  * actually has: millions of INDEPENDENT series (one per user / device /
  * session), each segmented relative to ITS OWN bounds, extracted in one
  * shot. The reference covers this only by looping `calculate` over series;
  * here the key is a first-class partitioning column:
  *
  *   1. per-key bounds: one partial-aggregated `groupBy(key)` pass;
  *   2. per-key segment table: `sequence`+`explode` OVER THE BOUNDS ROWS
  *      (nb segments derived per key; one tiny round-robin exchange
  *      re-widens the bounds first — see [[spreadBounds]]);
  *   3. window→row assignment: the same arithmetic k-range explode as the
  *      single-series engine, with the key's own start offset joined in;
  *   4. ONE fused `groupBy(key, segment).agg(...)`, left-joined back onto
  *      the per-key segment table so empty windows survive (W7).
  *
  * Everything shuffles ON THE KEY — adding keys scales out instead of up,
  * and no stage ever sees a single global ordering.
  */
object KeyedFeatures {

  /** Re-spread the per-key bounds table at pinned width before the segment
    * explode. The bounds aggregate OUTPUT is tiny (two doubles per key), so
    * AQE coalesces its exchange to a couple of partitions — and then the
    * `sequence`+`explode` segment generation amplifies each key row into
    * its full window list INSIDE those few tasks (measured on the 100×
    * corpus: q72's two bounds-consumer stages ran 2-way parallel, 80 s of
    * the query's 154 s; the smoke listener missed it because its trigger
    * is single-task stages with big INPUT, not few-task stages with big
    * OUTPUT). ROUND-ROBIN with explicit numPartitions is the one spread
    * the optimizer keeps: `repartition(n, $"__key")` is ELIMINATED as
    * redundant (the agg exchange already hash-partitions by key — and then
    * AQE coalesces that exchange anyway), while REPARTITION_BY_NUM
    * round-robin is neither removable nor AQE-coalescible. Downstream
    * consumers (the segments distinct / the assignment join) re-shuffle on
    * their own keys regardless, so bounds partitioning carries no reuse
    * value — only its WIDTH matters. The exchange moves only the tiny
    * bounds rows.
    */
  private def spreadBounds(b: DataFrame): DataFrame =
    // toIntOption: sessions may set a non-numeric value here (e.g. "auto"
    // on AQE-managed platforms); fall back to the cluster default then
    b.repartition(b.sparkSession.conf.get("spark.sql.shuffle.partitions")
      .toIntOption.getOrElse(b.sparkSession.sparkContext.defaultParallelism))

  // ---- packed (spec, k) decode — the segment/assignment fan-outs are
  // native kernels emitting `specIdx << 56 | k` longs (AssignKernels.scala:
  // one primitive array per row instead of per-spec boxed struct arrays +
  // array_distinct, and no segment-table distinct() shuffle); the spec's
  // static (w, st) come back via a literal when-chain, so the decoded
  // (w, koff, seg_start) doubles are computed by the exact same IEEE ops
  // as the replaced Column forms ------------------------------------------

  private def unpackIdx(p: Column): Column =
    shiftrightunsigned(p, graft.expr.AssignKernelUtil.KBits).cast("int")
  private def unpackK(p: Column): Column =
    p.bitwiseAND(lit(graft.expr.AssignKernelUtil.KMask)).cast("double")
  /** vals(i) as a literal when-chain (≤255 static specs — no array lookup,
    * stays in whole-stage codegen as comparisons + constants). */
  private def pick(i: Column, vals: Seq[Double]): Column =
    if (vals.distinct.lengthCompare(1) == 0) lit(vals.head)
    else vals.zipWithIndex.tail.foldLeft(when(i === 0, lit(vals.head))) {
      case (acc, (v, j)) => acc.when(i === j, lit(v))
    }

  // ---- fused decomposable aggregate (r19) ---------------------------------
  //
  // The multi-window plan's generic shape is four exchange-bearing stages:
  // the per-(key, w, seg_start) fused aggregate, the segments⋈aggregate
  // LEFT JOIN restoring empty windows (two full exchanges + sort-merge
  // sorts of the widest intermediates in the query — q72 at 100×: 985 MB
  // read, the top stage of the r18 profile), and the (key, anchor) pivot.
  // When every feature is MASKABLE — its aggregate skips null inputs, so
  // `f.agg(when(__w === W, v))` over the combined explode equals `f.agg(v)`
  // over just window W's rows — all four stages fuse into ONE aggregate
  // keyed directly on (key, anchor) (guide §2.4 "remove shuffles
  // outright"):
  //
  //   - each exploded row carries (w, koff); its anchor offset is the same
  //     `anchorOff` expression the pivot grouped on, so the group set IS
  //     the pivot's row set;
  //   - each output column `f__w=W` is `f.agg(when(__w === W, v))` — the
  //     per-(w, seg) aggregate and the pivot's max(when(...)) selection
  //     collapse into the one conditional aggregate;
  //   - empty/absent windows: the per-key segment grid (the same
  //     SegmentsPacked kernel) unions in as null-valued filler rows. A
  //     filler never changes a populated window (null inputs skipped); it
  //     marks EXISTENCE via max(when(__w === W, 1)) so a window absent
  //     from the grid at this anchor stays NULL (the pivot's semantics)
  //     while a present-but-empty window takes its W7 emptyValue.
  //
  // The five registry funcs len/mean/sum/min/max are maskable (count/avg/
  // sum/min/max all skip nulls and ignore the index argument); anything
  // else — index-aware kernels, collect-based stocks, robust wrappers —
  // falls back to the generic aggregate+join+pivot path. Float caveat:
  // sum/mean accumulate the same row multiset in a different order than
  // the per-window aggregate did (Spark's partial aggregation is already
  // order-nondeterministic); Q72RollupSpec pins the differential within
  // double rounding and exactly after the declared round(6).
  private def maskable(f: FeatureFunc): Boolean =
    (f eq FeatureFuncs.len) || (f eq FeatureFuncs.mean) ||
      (f eq FeatureFuncs.sum) || (f eq FeatureFuncs.min) ||
      (f eq FeatureFuncs.max)

  /** Single-series sugar over [[calculateWide]].
    *
    * @param funcs   features to fuse into the single per-segment aggregate
    * @param windowIdx "begin" | "middle" | "end" output anchor (W6)
    */
  def calculate(df: DataFrame, keyCol: String, idxCol: String, valueCol: String,
                window: Win, strides: Seq[Win], funcs: Seq[FeatureFunc],
                seriesName: String, windowIdx: String = "end",
                includeFinalWindow: Boolean = false,
                windowKeep: Option[(Column, Column) => Column] = None): DataFrame =
    calculateWide(
      df.select(col(keyCol), col(idxCol), col(valueCol).as(seriesName)),
      keyCol, idxCol, window, strides,
      funcs.map(f => seriesName -> f), Nil, windowIdx, includeFinalWindow,
      windowKeep)

  /** Keyed feature extraction over a WIDE frame: one row per (key, idx) with
    * one column per series. Because the tuple series share index rows in
    * this shape, n-ary features need NO per-series pairing join (unlike the
    * long-format main path, which equi-joins per-window views on
    * (segment, idx)) — every value column rides the single assignment
    * explode, and unary and n-ary functions all fuse into ONE per-segment
    * aggregate.
    *
    * Null semantics for n-ary inputs: a row where any consumed series is
    * null contributes null products, which the underlying sum/corr
    * aggregates skip — exactly the index-intersection semantics of the
    * long-format path for the built-in NaryFuncs.
    *
    * @param unary (seriesColumn, func) features; output `col__f__w=...`
    * @param nary  (seriesColumns, func) tuple features; output
    *              `a|b|c__f__w=...` (W10 naming, same as the main path)
    * @param windowKeep keyed twin of the single-series windowKeep gate
    *              (r18): given (sampleCount of the FIRST value column,
    *              anchor) builds a predicate; (key, window)s failing it are
    *              pruned BEFORE the fused aggregate and emit no output row
    *              — identical rows/values/names to calculating everything
    *              and post-filtering, but keyed super-linear members never
    *              pay for unkept windows. Count pass, distributed segment
    *              filter, left-semi prune; broadcast while the kept count
    *              stays at or under `windowKeepBroadcastLimit`, a shuffled
    *              semi join above it.
    */
  def calculateWide(df: DataFrame, keyCol: String, idxCol: String,
                    window: Win, strides: Seq[Win],
                    unary: Seq[(String, FeatureFunc)],
                    nary: Seq[(Seq[String], NaryFunc)] = Nil,
                    windowIdx: String = "end",
                    includeFinalWindow: Boolean = false,
                    windowKeep: Option[(Column, Column) => Column] = None,
                    windowKeepBroadcastLimit: Long = 4000000L): DataFrame = {
    require(unary.nonEmpty || nary.nonEmpty, "no features given")
    nary.foreach { case (cols, f) =>
      require(cols.lengthCompare(f.arity) == 0,
        s"${f.name} consumes ${f.arity} series, got ${cols.length}: " +
          cols.mkString("|"))
    }
    val valueCols = (unary.map(_._1) ++ nary.flatMap(_._1)).distinct
    val firstVal = valueCols.head
    val series = Series(firstVal, df, idxCol, firstVal)
    val internal = df.select(col(keyCol).as("__key") +:
      (series.domain match {
        case Domain.Time     => unix_micros(col(idxCol).cast("timestamp")).cast("double")
        case Domain.Sequence => col(idxCol).cast("double")
      }).as("__idx") +: valueCols.map(col): _*)
      .where(col("__idx").isNotNull)
      // null keys: dropped up front (the pandas-groupby convention the
      // reference inherits). Keeping them half-way was worse: the segment
      // groupBy emitted a null-key window table but every equi-join below
      // dropped the null-key DATA rows, reporting phantom empty windows.
      .where(col("__key").isNotNull)

    val w = window.amount
    val sts = strides.map(_.amount).distinct.sorted

    // 1. per-key bounds
    val bounds = internal.groupBy("__key")
      .agg(min(col("__idx")).as("__s0"), max(col("__idx")).as("__e0"))
    // spread ONLY the explode consumer — the withStart equi-join below has
    // no amplification, so it keeps the un-widened bounds (fewer static
    // exchanges; see spreadBounds)
    val boundsWide = spreadBounds(bounds)

    // 2. per-key segment table (never driver-materialized) — one packed
    // kernel explode; in-kernel dedup replaces the multi-stride distinct()
    val wsFlat = Seq.fill(sts.length)(w)
    val segments = boundsWide.select(col("__key"), col("__s0"),
        explode(graft.expr.SegmentsPacked(col("__s0"), col("__e0"),
          wsFlat, sts, includeFinalWindow, dedupOnKoff = false)).as("__p"))
      .select(col("__key"),
        (col("__s0") + unpackK(col("__p")) * pick(unpackIdx(col("__p")), sts))
          .as("__seg_start"))
      .select(col("__key"), col("__seg_start"),
        (col("__seg_start") + lit(w)).as("__seg_end"))

    // 3. arithmetic assignment with the key's own bounds — the same packed
    // kernel shape (k ranges [kmin, min(kmax, nb-1)] instead of [0, nb)).
    // The in-kernel grid clamp (e0 rides along) replaces the
    // join-with-segments filter the plan used to carry: starts past the
    // key's own grid are never emitted, so the fused aggregate below runs
    // DIRECTLY on the explode — map-side partial aggregation collapses the
    // fan-out before its one exchange, where the join shape shuffled and
    // sorted every (row × window) pair at full width first.
    val withStart = internal.join(bounds, Seq("__key"))
    val assigned = withStart.select(
      col("__key") +: col("__idx") +: col("__s0") +: valueCols.map(col) :+
        explode(graft.expr.AssignPacked(col("__idx"), col("__s0"),
          col("__e0"), wsFlat, sts, includeFinalWindow)).as("__p"): _*)
      .select(col("__key") +:
        (col("__s0") + unpackK(col("__p")) * pick(unpackIdx(col("__p")), sts))
          .as("__seg_start") +:
        col("__idx") +: valueCols.map(col): _*)

    val anchorRaw = windowIdx match {
      case "end"    => col("__seg_end")
      case "middle" => col("__seg_start") + (col("__seg_end") - col("__seg_start")) / 2
      case "begin"  => col("__seg_start")
      case x => throw new IllegalArgumentException(s"bad windowIdx $x")
    }

    // Keyed window-level sampling gate — the single-series windowKeep's
    // twin: count rows per (key, window start) off the assignment explode
    // (map-side partial agg), filter the per-key SEGMENT table on
    // (count, anchor) — fully distributed — and prune the explode with a
    // left-semi join BEFORE the fused aggregate, so keyed super-linear
    // members never see unkept windows. The kept frame is pinned (it
    // feeds the semi join and the W7 left join), which makes the counted
    // broadcast degrade free: ids broadcast only while their count is at
    // or under the limit, else the semi join shuffles on the key.
    val (assignedG, segmentsG) = windowKeep match {
      case Some(keep) =>
        val cnt = assigned.groupBy("__key", "__seg_start")
          .agg(count(col(firstVal)).as("__wn"))
        val kept = Pinned.checkpoint(
          segments.join(cnt, Seq("__key", "__seg_start"), "left")
            .where(keep(coalesce(col("__wn"), lit(0L)),
              series.restoreIdx(anchorRaw)))
            .drop("__wn"))
        val ids = kept.select("__key", "__seg_start")
        val hinted =
          if (kept.count() <= windowKeepBroadcastLimit) broadcast(ids)
          else ids
        (assigned.join(hinted, Seq("__key", "__seg_start"), "left_semi"),
          kept)
      case None => (assigned, segments)
    }

    // 4. one fused aggregate; empty windows restored by the left join
    val winR = window.render
    case class Feat(name: String, empty: Option[Column],
                    outputNames: Option[Seq[String]], seriesNames: Seq[String],
                    agg: Column)
    val feats =
      unary.map { case (c, f) =>
        Feat(Win.outputName(Seq(c), f.name, winR), f.emptyValue, f.outputNames,
          Seq(c), f.agg(col("__idx"), col(c)))
      } ++ nary.map { case (cs, f) =>
        Feat(Win.outputName(cs, f.name, winR), f.emptyValue, f.outputNames,
          cs, f.agg(col("__idx"), cs.map(col)))
      }
    require(feats.map(_.name).distinct.length == feats.length,
      "duplicate output names: " +
        feats.map(_.name).diff(feats.map(_.name).distinct).mkString(", "))
    val aggs = feats.map(f => f.agg.as(f.name))
    val agged = assignedG.groupBy("__key", "__seg_start").agg(aggs.head, aggs.tail: _*)
    var joined = segmentsG.join(agged, Seq("__key", "__seg_start"), "left")
    feats.foreach { f =>
      f.empty.foreach { ev =>
        joined = joined.withColumn(f.name, coalesce(col(s"`${f.name}`"), ev))
      }
    }
    // multi-output functions return a struct — expand each declared output
    // into its own W10-named column (same rule as the main path)
    def expand(f: Feat): Seq[Column] = f.outputNames match {
      case Some(os) => os.map(o => col(s"`${f.name}`").getField(o)
        .as(Win.outputName(f.seriesNames, o, winR)))
      case None => Seq(col(s"`${f.name}`"))
    }
    joined.select(col("__key").as(keyCol) +:
      series.restoreIdx(anchorRaw).as(idxCol) +:
      feats.flatMap(expand): _*)
  }

  /** MULTI-WINDOW keyed extraction: several (window, strides) buckets over
    * the same wide frame in ONE pass — the keyed analog of the single-series
    * path's M1 bucketing ({1h, 6h, 1d} per entity is the standard
    * per-entity feature shape; looping [[calculateWide]] would re-shuffle
    * and re-scan the input once per window).
    *
    * Plan shape: the per-key bounds pass is shared; each (window, stride)
    * contributes its segment rows TAGGED with the window length, every value
    * column rides a single assignment explode producing (window, seg_start)
    * pairs, and ONE `groupBy(key, window, seg_start)` computes every
    * feature for every window. Windows then pivot into per-window feature
    * columns grouped on (key, anchor) — the keyed analog of S4's full-outer
    * anchor merge: anchors shared by several windows land on one row, W7
    * empty-window rows survive per window, and a window with no segment at
    * an anchor is null there. Two shuffles total (aggregate + pivot),
    * independent of the window count.
    *
    * Output naming: `series__func__w=<window.render>` per window (W10).
    *
    * windowKeep semantics HERE (differs from the single-window row rule,
    * necessarily): the gate keeps/drops (key, window, anchor) CELLS. A
    * window dropped at an anchor where another window is kept nulls out
    * its columns on the shared pivot row; an anchor where EVERY window is
    * dropped emits no row. (A post-filter cannot express the cell shape —
    * the single-bucket row-identity claim is scoped to [[calculateWide]].)
    */
  def calculateWideMulti(df: DataFrame, keyCol: String, idxCol: String,
                         windows: Seq[(Win, Seq[Win])],
                         unary: Seq[(String, FeatureFunc)],
                         nary: Seq[(Seq[String], NaryFunc)] = Nil,
                         windowIdx: String = "end",
                         includeFinalWindow: Boolean = false,
                         windowKeep: Option[(Column, Column) => Column] = None,
                         windowKeepBroadcastLimit: Long = 4000000L,
                         fusedAggregate: Boolean = true): DataFrame = {
    require(windows.nonEmpty, "no windows given")
    require(windows.map(_._1.amount).distinct.length == windows.length,
      "duplicate windows")
    if (windows.lengthCompare(1) == 0)
      return calculateWide(df, keyCol, idxCol, windows.head._1,
        windows.head._2, unary, nary, windowIdx, includeFinalWindow,
        windowKeep, windowKeepBroadcastLimit)
    require(unary.nonEmpty || nary.nonEmpty, "no features given")
    nary.foreach { case (cols, f) =>
      require(cols.lengthCompare(f.arity) == 0,
        s"${f.name} consumes ${f.arity} series, got ${cols.length}: " +
          cols.mkString("|"))
    }
    val valueCols = (unary.map(_._1) ++ nary.flatMap(_._1)).distinct
    val series = Series(valueCols.head, df, idxCol, valueCols.head)
    val internal = df.select(col(keyCol).as("__key") +:
      (series.domain match {
        case Domain.Time     => unix_micros(col(idxCol).cast("timestamp")).cast("double")
        case Domain.Sequence => col(idxCol).cast("double")
      }).as("__idx") +: valueCols.map(col): _*)
      .where(col("__idx").isNotNull)
      // null keys: dropped up front (the pandas-groupby convention the
      // reference inherits). Keeping them half-way was worse: the segment
      // groupBy emitted a null-key window table but every equi-join below
      // dropped the null-key DATA rows, reporting phantom empty windows.
      .where(col("__key").isNotNull)
    val specs = windows.map { case (win, sts) =>
      (win, sts.map(_.amount).distinct.sorted)
    }

    // 1. per-key bounds — ONE pass shared by every window
    val bounds = internal.groupBy("__key")
      .agg(min(col("__idx")).as("__s0"), max(col("__idx")).as("__e0"))
    // spread ONLY the explode consumer (see the single-window path)
    val boundsWide = spreadBounds(bounds)

    // 2. per-key segment grid across every (window, stride) spec — one
    // packed kernel explode tagged with the window length; in-kernel
    // (w, koff) dedup replaces the per-spec union + full-table distinct()
    // shuffle of the previous formulation
    val specW = specs.flatMap { case (win, ss) => ss.map(_ => win.amount) }
    val specSt = specs.flatMap { case (_, ss) => ss }
    val segments = {
      val si = unpackIdx(col("__p"))
      val koff = unpackK(col("__p")) * pick(si, specSt)
      boundsWide.select(col("__key"), col("__s0"),
          explode(graft.expr.SegmentsPacked(col("__s0"), col("__e0"),
            specW, specSt, includeFinalWindow, dedupOnKoff = true)).as("__p"))
        .select(col("__key"), pick(si, specW).as("__w"), col("__s0"),
          koff.as("__koff"), (col("__s0") + koff).as("__seg_start"))
    }

    // 3. one assignment explode over packed (window, seg_start) pairs —
    // grid-clamped in-kernel (e0 rides along), so the out-of-grid starts
    // the plan used to discard with a join against the segment table are
    // never emitted and the fused aggregate below runs directly on the
    // explode with map-side partial aggregation (see calculateWide's
    // step-3 note).
    val fuseOk = fusedAggregate && nary.isEmpty && windowKeep.isEmpty &&
      unary.nonEmpty && unary.forall { case (_, f) => maskable(f) }
    val withStart = internal.join(bounds, Seq("__key"))
    lazy val assigned = {
      val si = unpackIdx(col("__p"))
      withStart.select(
        col("__key") +: col("__idx") +: col("__s0") +: valueCols.map(col) :+
          explode(graft.expr.AssignPacked(col("__idx"), col("__s0"),
            col("__e0"), specW, specSt, includeFinalWindow)).as("__p"): _*)
        .select(col("__key") +: pick(si, specW).as("__w") +:
          (col("__s0") + unpackK(col("__p")) * pick(si, specSt))
            .as("__seg_start") +:
          col("__idx") +: valueCols.map(col): _*)
    }

    // anchors from DIFFERENT windows must land on one row when they are
    // mathematically equal, so the pivot groups on the key-relative offset
    // k·st (+ w) — exact integer-valued double arithmetic, no float-summed
    // `s0 + …` whose 1-ulp wobble would split the row. `s0` is added back
    // once, after the merge.
    val anchorOff = windowIdx match {
      case "end"    => col("__koff") + col("__w")
      case "middle" => col("__koff") + col("__w") / 2
      case "begin"  => col("__koff")
      case x => throw new IllegalArgumentException(s"bad windowIdx $x")
    }

    // FUSED maskable-aggregate path (r19, the `maskable` scaladoc): the
    // per-(w, seg) aggregate, the segments⋈aggregate empty-window join and
    // the (key, anchor) pivot collapse into ONE aggregate keyed directly
    // on (key, anchorOff), with the segment grid union'd in as null-valued
    // existence fillers. Same group set, same anchorOff doubles, same
    // output names/order; plan shape 4 exchange-bearing stages → 1.
    if (fuseOk) {
      val si = unpackIdx(col("__p"))
      val exploded = withStart.select(
          col("__key") +: col("__s0") +:
          explode(graft.expr.AssignPacked(col("__idx"), col("__s0"),
            col("__e0"), specW, specSt, includeFinalWindow)).as("__p") +:
          valueCols.map(col): _*)
        .select(col("__key") +: pick(si, specW).as("__w") +:
          (unpackK(col("__p")) * pick(si, specSt)).as("__koff") +:
          col("__s0") +: valueCols.map(col): _*)
      val filler = segments.select(
        col("__key") +: col("__w") +: col("__koff") +: col("__s0") +:
          valueCols.map(c => lit(null).cast(df.schema(c).dataType).as(c)): _*)
      val outPairs = for {
        (win, _) <- specs
        (c, f) <- unary
      } yield {
        val isW = col("__w") === lit(win.amount)
        // registry funcs ignore the index argument (maskable contract)
        val masked = f.agg(lit(null), when(isW, col(c)))
        val existsW = max(when(isW, lit(1)))
        val guarded = f.emptyValue match {
          case Some(ev) => when(existsW === 1, coalesce(masked, ev))
          case None     => when(existsW === 1, masked)
        }
        val n = Win.outputName(Seq(c), f.name, win.render)
        (guarded.as(n), n)
      }
      val outCols = outPairs.map(_._1)
      val fusedNames = outPairs.map(_._2)
      require(fusedNames.distinct.length == fusedNames.length,
        "duplicate output names: " +
          fusedNames.diff(fusedNames.distinct).mkString(", "))
      return exploded.unionByName(filler)
        .withColumn("__aoff", anchorOff)
        .groupBy("__key", "__s0", "__aoff")
        .agg(outCols.head, outCols.tail: _*)
        .select(col("__key").as(keyCol) +:
          series.restoreIdx(col("__s0") + col("__aoff")).as(idxCol) +:
          fusedNames.map(n => col(s"`$n`")): _*)
    }

    // keyed windowKeep gate per (key, window, start) — see calculateWide;
    // here the anchor handed to the predicate is s0 + anchorOff, the exact
    // value the pivot output restores
    val (assignedG, segmentsG) = windowKeep match {
      case Some(keep) =>
        val cnt = assigned.groupBy("__key", "__w", "__seg_start")
          .agg(count(col(valueCols.head)).as("__wn"))
        val kept = Pinned.checkpoint(
          segments.join(cnt, Seq("__key", "__w", "__seg_start"), "left")
            .where(keep(coalesce(col("__wn"), lit(0L)),
              series.restoreIdx(col("__s0") + anchorOff)))
            .drop("__wn"))
        val ids = kept.select("__key", "__w", "__seg_start")
        val hinted =
          if (kept.count() <= windowKeepBroadcastLimit) broadcast(ids)
          else ids
        (assigned.join(hinted, Seq("__key", "__w", "__seg_start"),
          "left_semi"), kept)
      case None => (assigned, segments)
    }

    // 4. ONE fused aggregate across all windows, empties restored per window
    case class Feat(base: String, fname: String, empty: Option[Column],
                    outputNames: Option[Seq[String]], seriesNames: Seq[String],
                    agg: Column)
    val feats =
      unary.zipWithIndex.map { case ((c, f), i) =>
        Feat(s"__f$i", f.name, f.emptyValue, f.outputNames, Seq(c),
          f.agg(col("__idx"), col(c)))
      } ++ nary.zipWithIndex.map { case ((cs, f), i) =>
        Feat(s"__n$i", f.name, f.emptyValue, f.outputNames, cs,
          f.agg(col("__idx"), cs.map(col)))
      }
    val aggs = feats.map(f => f.agg.as(f.base))
    var agged = segmentsG.join(
      assignedG.groupBy("__key", "__w", "__seg_start")
        .agg(aggs.head, aggs.tail: _*),
      Seq("__key", "__w", "__seg_start"), "left")
    feats.foreach { f =>
      f.empty.foreach { ev =>
        agged = agged.withColumn(f.base, coalesce(col(f.base), ev))
      }
    }

    // 5. pivot windows into columns on the shared (key, anchor) row —
    // exactly one aggregated row per (key, window, anchor), so max() just
    // selects it
    def funcNames(f: Feat, winR: String): Seq[(Column, String)] = f.outputNames match {
      case Some(os) => os.map(o => (col(f.base).getField(o),
        Win.outputName(f.seriesNames, o, winR)))
      case None => Seq((col(f.base), Win.outputName(f.seriesNames, f.fname, winR)))
    }
    val pivotAggs = for {
      (win, _) <- specs
      f <- feats
      (src, outName) <- funcNames(f, win.render)
    } yield max(when(col("__w") === lit(win.amount), src)).as(outName)
    val outNames = for {
      (win, _) <- specs; f <- feats; (_, n) <- funcNames(f, win.render)
    } yield n
    require(outNames.distinct.length == outNames.length,
      "duplicate output names: " +
        outNames.diff(outNames.distinct).mkString(", "))
    agged.withColumn("__aoff", anchorOff)
      .groupBy("__key", "__aoff")
      .agg((min(col("__s0")).as("__s0") +: pivotAggs).head,
        ((min(col("__s0")).as("__s0") +: pivotAggs).tail): _*)
      .select(col("__key").as(keyCol) +:
        series.restoreIdx(col("__s0") + col("__aoff")).as(idxCol) +:
        outNames.map(n => col(s"`$n`")): _*)
  }

  /** G3 per key — `group_by_consecutive` (reference:
    * feature_collection.py:568-724) applied WITHIN each entity: maximal runs
    * of equal `groupCol` values in index order, per key, one feature row per
    * run with `__start`/`__end` boundaries. The reference covers this shape
    * only by looping the single-series engine over entities; here every
    * window is `partitionBy(key)` — per-key state never crosses executors
    * and no stage sees a global ordering, so keys scale out.
    *
    * Wide-frame input: one row per (key, idx) carrying the grouping column
    * and every value series. Null/NaN group rows are NOT run boundaries
    * (P5): they inherit the enclosing run — run segments span
    * `[start, next_start)`, closed at `last_end + 1 day/unit`, exactly the
    * single-series G3 semantics (feature_collection.py:682-688) — while run
    * boundaries and the group value come from the non-null rows only. Rows
    * before the first run start are dropped.
    */
  def calculateGroupByConsecutive(df: DataFrame, keyCol: String, idxCol: String,
      groupCol: String, unary: Seq[(String, FeatureFunc)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    require(unary.nonEmpty, "no features given")
    val valueCols = unary.map(_._1).distinct
    val series = Series(valueCols.head, df, idxCol, valueCols.head)
    val gOk = df.schema(groupCol).dataType match {
      case DoubleType | FloatType =>
        col(groupCol).isNotNull && !isnan(col(groupCol))
      case _ => col(groupCol).isNotNull
    }
    val internal = df.select(
      col(keyCol).as("__key") +:
        (series.domain match {
          case Domain.Time     => unix_micros(col(idxCol).cast("timestamp")).cast("double")
          case Domain.Sequence => col(idxCol).cast("double")
        }).as("__idx") +:
        when(gOk, col(groupCol)).as("__grp") +: valueCols.map(col): _*)
      .where(col("__idx").isNotNull)
      // null keys: dropped up front (the pandas-groupby convention the
      // reference inherits). Keeping them half-way was worse: the segment
      // groupBy emitted a null-key window table but every equi-join below
      // dropped the null-key DATA rows, reporting phantom empty windows.
      .where(col("__key").isNotNull)
    // change-flag against the last NON-NULL group value, so null-group rows
    // neither start runs nor break them; inclusive running sum = run id
    val wOrd = Window.partitionBy("__key").orderBy("__idx")
    val prevNN = last(col("__grp"), ignoreNulls = true)
      .over(wOrd.rowsBetween(Window.unboundedPreceding, -1))
    val rows = internal
      .withColumn("__flag", when(col("__grp").isNotNull &&
        (prevNN.isNull || prevNN =!= col("__grp")), 1L).otherwise(0L))
      .withColumn("__run", sum(col("__flag"))
        .over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .where(col("__run") > 0)
    val ext = series.domain match {
      case Domain.Time     => 86400e6 // reference: :682-688 (+1 day)
      case Domain.Sequence => 1.0
    }
    // boundaries + group value from the GROUP rows only
    val runs = rows.where(col("__grp").isNotNull)
      .groupBy("__key", "__run").agg(
        min(col("__idx")).as("__start"), max(col("__idx")).as("__end"),
        first(col("__grp")).as("__g"))
    // the last run's segment closes at end + ext: trailing null-group rows
    // beyond that are outside every segment (single-series G3 terminator)
    val keyEnd = runs.groupBy("__key").agg(max(col("__end")).as("__kend"))
    val names = unary.map { case (c, f) => Win.outputName(Seq(c), f.name, "manual") }
    require(names.distinct.length == names.length,
      "duplicate output names: " + names.diff(names.distinct).mkString(", "))
    val aggs = unary.zip(names).map { case ((c, f), n) =>
      f.agg(col("__idx"), col(c)).as(n) }
    // plain equi-join on the key (NOT broadcast: one row per key is still
    // millions of rows at scale; AQE may still choose broadcast when small)
    val feats = rows.join(keyEnd, Seq("__key"))
      .where(col("__idx") < col("__kend") + lit(ext))
      .groupBy("__key", "__run").agg(aggs.head, aggs.tail: _*)
    runs.join(feats, Seq("__key", "__run"), "left")
      .select(col("__key").as(keyCol) +: col("__g").as(groupCol) +:
        names.sorted.map(n => col(s"`$n`")) :+
        series.restoreIdx(col("__start")).as("__start") :+
        series.restoreIdx(col("__end")).as("__end"): _*)
  }
}
