package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** catch22 kernel: fifteen members of the catch22 canonical feature
  * battery (Lubba et al. 2019, "catch22: CAnonical Time-series
  * CHaracteristics") — tranche 1 (r11, eleven members) + tranche 2 (r11,
  * four more; the seven exclusions and their reasons are annotated on
  * [[names]]) — computed in ONE pass over an index-ordered window
  * array. The reference integrates the battery via
  * `catch22_wrapper(catch22_all)` — a single 22-output FuncWrapper
  * (reference: tsflex/features/integrations.py:282-337, exercised by
  * tests/test_features_integration.py:326-343); this is the same shape — a
  * single multi-output aggregate evaluated once per window — with the
  * members re-derived from the published C definitions.
  *
  * Documented conventions (mirrored exactly by the DuckDB oracle twins):
  *  - members are computed on the RAW window values (pycatch22's
  *    `catch22_all` passes the raw series to the C kernels; callers who
  *    want the z-scored variant can z-score with a SeriesProcessor first);
  *  - ACF is the standard biased estimator
  *    ac(τ) = Σ_{t<n−τ} (x_t−μ)(x_{t+τ}−μ) / (n·σ²_pop), ac(0)=1;
  *  - SP_Summaries_welch_rect_centroid uses the rect-window periodogram at
  *    the window's native length n (no next-pow-2 zero padding; the Welch
  *    scale factors cancel inside the cumulative-power comparison).
  *
  * Cost shape: every member is O(n) except the ACF members (lazy, O(n·k)
  * where k is the stopping lag — worst case O(n²/2) on pathological
  * monotone windows) and the spectral centroid (O(n²/2) DFT with the
  * [[SpectralEntropyUtil]] trig-table trick). Like the DFT kernel, this is
  * a deliberate per-WINDOW cost bounded by window length — the 100 TB axis
  * is window count, which parallelizes embarrassingly.
  */
object Catch22Util {

  val names: Seq[String] = Seq(
    "DN_HistogramMode_5",
    "DN_HistogramMode_10",
    "SB_BinaryStats_mean_longstretch1",
    "SB_BinaryStats_diff_longstretch0",
    "CO_f1ecac",
    "CO_FirstMin_ac",
    "CO_trev_1_num",
    "MD_hrv_classic_pnn40",
    "FC_LocalSimple_mean3_stderr",
    "FC_LocalSimple_mean1_tauresrat",
    "SP_Summaries_welch_rect_centroid",
    // tranche 2 (r11): the four further members whose semantics survive the
    // raw-input convention AND admit an exact DuckDB twin. Excluded, with
    // reasons: DN_OutlierInclude_{p,n}_001_mdrmd (the 0.01 threshold grid
    // only makes sense on z-scored input), PD_PeriodicityWang_th0_01
    // (spline detrend), CO_Embed2_Dist_tau_d_expfit_meandiff (exponential
    // fit), SC_FluctAnal_2_{dfa,rsrangefit}_50_1_* (two-regime split fits —
    // the keyed DFA/Hurst operators in scale/GroupedStats.scala cover the
    // fluctuation-analysis need).
    "CO_HistogramAMI_even_2_5",
    "IN_AutoMutualInfoStats_40_gaussian_fmmi",
    "SP_Summaries_welch_rect_area_5_1",
    "SB_MotifThree_quantile_hh")

  val dataType: StructType =
    StructType(names.map(n => StructField(n, DoubleType, nullable = true)))

  /** Lazily-extended ACF: values are computed on first demand per lag and
    * memoized, so crossing searches pay O(n·k) for stopping lag k instead
    * of the full O(n²/2). `null`-equivalent: NaN when σ² = 0.
    */
  private final class Acf(x: Array[Double]) {
    private val n = x.length
    private val mu = { var s = 0.0; var i = 0; while (i < n) { s += x(i); i += 1 }; if (n > 0) s / n else 0.0 }
    private val c = { val a = new Array[Double](n); var i = 0; while (i < n) { a(i) = x(i) - mu; i += 1 }; a }
    private val denom = { var s = 0.0; var i = 0; while (i < n) { s += c(i) * c(i); i += 1 }; s }
    val defined: Boolean = denom > 0.0
    private val memo = new Array[Double](n)
    private val have = new Array[Boolean](n)
    /** ac(τ) for 0 ≤ τ < n; NaN outside or when undefined. */
    def apply(tau: Int): Double = {
      if (!defined || tau < 0 || tau >= n) return Double.NaN
      if (tau == 0) return 1.0
      if (!have(tau)) {
        var s = 0.0; var t = 0
        while (t < n - tau) { s += c(t) * c(t + tau); t += 1 }
        memo(tau) = s / denom; have(tau) = true
      }
      memo(tau)
    }
    /** co_firstzero: first τ with ac(τ) ≤ 0, capped at maxtau (the C helper
      * iterates `while(ac[ind] > 0 && ind < maxtau)`). */
    def firstZero(maxtau: Int): Int = {
      var i = 0
      while (i < maxtau && apply(i) > 0) i += 1
      i
    }
  }

  private def histMode(x: Array[Double], nb: Int): Any = {
    val n = x.length
    if (n == 0) return null
    var mn = x(0); var mx = x(0); var i = 1
    while (i < n) { if (x(i) < mn) mn = x(i); if (x(i) > mx) mx = x(i); i += 1 }
    if (mx <= mn) return java.lang.Double.valueOf(mn) // constant window: the value
    val step = (mx - mn) / nb
    val counts = new Array[Int](nb)
    i = 0
    while (i < n) {
      var b = ((x(i) - mn) / step).toInt
      if (b >= nb) b = nb - 1 // the max lands in the last bin (C clamp)
      counts(b) += 1
      i += 1
    }
    var maxC = 0; i = 0
    while (i < nb) { if (counts(i) > maxC) maxC = counts(i); i += 1 }
    var s = 0.0; var k = 0; i = 0
    while (i < nb) {
      if (counts(i) == maxC) { s += mn + (i + 0.5) * step; k += 1 }
      i += 1
    }
    java.lang.Double.valueOf(s / k)
  }

  /** Longest run of `true` under `pred` over t = lo..hi−1. */
  private def longestRun(lo: Int, hi: Int, pred: Int => Boolean): Long = {
    var best = 0L; var cur = 0L; var t = lo
    while (t < hi) {
      if (pred(t)) { cur += 1; if (cur > best) best = cur } else cur = 0
      t += 1
    }
    best
  }

  /** Debug-only: print per-member wall times from [[compute]]. */
  @volatile var timings: Boolean = false
  private def timed[A](name: String)(f: => A): A = {
    if (!timings) f
    else {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $name%-36s ${(System.nanoTime() - t0) / 1e6}%.2f ms")
      r
    }
  }

  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val x = new Array[Double](n)
    var i = 0
    while (i < n) { x(i) = arr.getDouble(i); i += 1 }
    var mu = 0.0; i = 0
    while (i < n) { mu += x(i); i += 1 }
    if (n > 0) mu /= n
    val out = new Array[Any](names.length)

    out(0) = timed("mode5")(histMode(x, 5))
    out(1) = timed("mode10")(histMode(x, 10))

    // SB_BinaryStats_mean_longstretch1: binarize by the mean (1 = strictly
    // above), longest run of 1s. Empty window → null; no value above → 0.
    out(2) = timed("longstretch1")(if (n == 0) null
      else java.lang.Double.valueOf(longestRun(0, n, t => x(t) > mu).toDouble))

    // SB_BinaryStats_diff_longstretch0: binarize successive diffs (0 =
    // strict decrease), longest run of 0s = longest run of decreases.
    out(3) = timed("diffstretch0")(if (n < 2) null
      else java.lang.Double.valueOf(
        longestRun(0, n - 1, t => x(t + 1) - x(t) < 0).toDouble))

    val acf = new Acf(x)

    // CO_f1ecac: first 1/e crossing of the ACF, linearly interpolated
    // between the straddling lags (C: out = i + (thresh − ac_i)/(ac_{i+1} −
    // ac_i) at the first i with ac_{i+1} < 1/e); n if no crossing.
    out(4) = timed("f1ecac")(if (n < 3 || !acf.defined) null else {
      val thresh = 1.0 / math.E
      var res = n.toDouble
      var j = 0
      var done = false
      while (!done && j < n - 2) {
        val a0 = acf(j); val a1 = acf(j + 1)
        if (a1 < thresh) { res = j + (thresh - a0) / (a1 - a0); done = true }
        j += 1
      }
      java.lang.Double.valueOf(res)
    })

    // CO_FirstMin_ac: lag of the first local ACF minimum (ac(i) below both
    // neighbors, 1 ≤ i ≤ n−2); n if none.
    out(5) = timed("firstmin")(if (n < 3 || !acf.defined) null else {
      var res = n.toDouble
      var j = 1
      var done = false
      while (!done && j < n - 1) {
        if (acf(j) < acf(j - 1) && acf(j) < acf(j + 1)) { res = j.toDouble; done = true }
        j += 1
      }
      java.lang.Double.valueOf(res)
    })

    // CO_trev_1_num: mean cubed successive difference.
    out(6) = timed("trev")(if (n < 2) null else {
      var s = 0.0; var t = 0
      while (t < n - 1) { val d = x(t + 1) - x(t); s += d * d * d; t += 1 }
      java.lang.Double.valueOf(s / (n - 1))
    })

    // MD_hrv_classic_pnn40: fraction of successive diffs with |Δ| > 0.04
    // (the C kernel scales |Δ|·1000 against the 40 ms HRV threshold).
    out(7) = timed("pnn40")(if (n < 2) null else {
      var k = 0; var t = 0
      while (t < n - 1) { if (math.abs(x(t + 1) - x(t)) > 0.04) k += 1; t += 1 }
      java.lang.Double.valueOf(k.toDouble / (n - 1))
    })

    // FC_LocalSimple_mean3_stderr: sample std (ddof=1) of the residuals of
    // a trailing-mean-3 forecast: r_i = x_{i+3} − mean(x_i, x_{i+1}, x_{i+2}).
    out(8) = timed("ls3stderr")(if (n < 5) null else {
      val m = n - 3
      var s = 0.0; var ss = 0.0; var t = 0
      while (t < m) {
        val r = x(t + 3) - (x(t) + x(t + 1) + x(t + 2)) / 3.0
        s += r; ss += r * r; t += 1
      }
      java.lang.Double.valueOf(math.sqrt((ss - s * s / m) / (m - 1)))
    })

    // FC_LocalSimple_mean1_tauresrat: first-zero ACF lag of the mean-1
    // forecast residuals (= successive diffs) over that of the window.
    out(9) = timed("tauresrat")(if (n < 3) null else {
      val res = new Array[Double](n - 1)
      var t = 0
      while (t < n - 1) { res(t) = x(t + 1) - x(t); t += 1 }
      val acfR = new Acf(res)
      if (!acf.defined || !acfR.defined) null
      else java.lang.Double.valueOf(
        acfR.firstZero(n - 1).toDouble / acf.firstZero(n).toDouble)
    })

    // Shared rect-window periodogram of the de-meaned window, bins
    // k = 1..⌊n/2⌋ (DC bin is zero by construction); FFT/DFT split via
    // [[Fft.halfPsd]]. Consumed by the centroid and area_5_1 members.
    // `specOk` is the relative zero-energy guard, same convention as
    // SpectralEntropyUtil.
    val nb = n / 2
    val (spec, specTotal, specOk) =
      if (n < 4) (new Array[Double](0), 0.0, false)
      else timed("psd") {
        val d = new Array[Double](n)
        var sxx = 0.0
        var t0 = 0
        while (t0 < n) { d(t0) = x(t0) - mu; sxx += d(t0) * d(t0); t0 += 1 }
        val s = Fft.halfPsd(d)
        var total = 0.0
        var si = 0
        while (si < nb) { total += s(si); si += 1 }
        (s, total, total > 1e-9 * sxx * n)
      }

    // SP_Summaries_welch_rect_centroid: first w_k = 2πk/n whose cumulative
    // power strictly exceeds half the total.
    out(10) = timed("centroid")(if (!specOk) null else {
      val half = specTotal / 2.0
      var cs = 0.0
      var kk = 0
      var res = Double.NaN
      var done = false
      while (!done && kk < nb) {
        cs += spec(kk)
        if (cs > half) { res = 2.0 * math.Pi * (kk + 1) / n; done = true }
        kk += 1
      }
      java.lang.Double.valueOf(res)
    })

    // CO_HistogramAMI_even_2_5: auto mutual information at lag 2 over a
    // 5×5 joint histogram of (x_t, x_{t+2}); bin edges are the 5 even bins
    // over the WHOLE window's [min, max] (the DN_HistogramMode grid);
    // AMI = Σ p_ij ln(p_ij / (p_i·p_j)) in nats, marginals taken over the
    // paired samples. Null for n < 3 or a constant window.
    out(11) = timed("ami25")(if (n < 3) null else {
      var mn = x(0); var mx = x(0); var i2 = 1
      while (i2 < n) { if (x(i2) < mn) mn = x(i2); if (x(i2) > mx) mx = x(i2); i2 += 1 }
      if (mx <= mn) null else {
        val step = (mx - mn) / 5
        def bin(v: Double): Int = {
          var b = ((v - mn) / step).toInt
          if (b >= 5) b = 4
          b
        }
        val joint = new Array[Long](25)
        val bigN = (n - 2).toDouble
        var t = 0
        while (t < n - 2) { joint(5 * bin(x(t)) + bin(x(t + 2))) += 1; t += 1 }
        val r = new Array[Long](5); val cc = new Array[Long](5)
        var ij = 0
        while (ij < 25) { r(ij / 5) += joint(ij); cc(ij % 5) += joint(ij); ij += 1 }
        var ami = 0.0
        ij = 0
        while (ij < 25) {
          val c = joint(ij)
          if (c > 0) ami += (c / bigN) *
            math.log(c * bigN / (r(ij / 5).toDouble * cc(ij % 5)))
          ij += 1
        }
        java.lang.Double.valueOf(ami)
      }
    })

    // IN_AutoMutualInfoStats_40_gaussian_fmmi: Gaussian auto-MI curve
    // A(τ) = −½·ln(1 − ac(τ)²) over τ = 1..min(40, n−1); the feature is
    // the first local minimum's lag (A below both neighbors, 2 ≤ τ ≤ L−1),
    // L if none — the ACF-based estimator over the biased global-mean ACF,
    // like the other CO members.
    out(12) = timed("fmmi")(if (n < 3 || !acf.defined) null else {
      val L = math.min(40, n - 1)
      def ami(tau: Int): Double = {
        val r = acf(tau)
        -0.5 * math.log(math.max(1.0 - r * r, 1e-300))
      }
      var res = L.toDouble
      var j = 2
      var done = false
      while (!done && j <= L - 1) {
        if (ami(j) < ami(j - 1) && ami(j) < ami(j + 1)) { res = j.toDouble; done = true }
        j += 1
      }
      java.lang.Double.valueOf(res)
    })

    // SP_Summaries_welch_rect_area_5_1: power in the lowest fifth of the
    // spectrum as a FRACTION of total power (the raw C member is the same
    // sum under Welch scale factors, which cancel under normalization —
    // documented deviation, mirrored by the oracle). Bin count max(1, nb/5).
    out(13) = timed("area51")(if (!specOk) null else {
      val kc = math.max(1, nb / 5)
      var s5 = 0.0
      var kk = 0
      while (kk < kc) { s5 += spec(kk); kk += 1 }
      java.lang.Double.valueOf(s5 / specTotal)
    })

    // SB_MotifThree_quantile_hh: tertile alphabet by continuous quantiles
    // (position (n−1)·q, linear interpolation — the numpy/DuckDB
    // quantile_cont convention; letter = 0 for v ≤ q⅓, 1 for v ≤ q⅔,
    // else 2), then the Shannon entropy (nats) of the 2-letter motif
    // distribution over the n−1 index-consecutive pairs.
    out(14) = timed("motif_hh")(if (n < 2) null else {
      val sorted = java.util.Arrays.copyOf(x, n)
      java.util.Arrays.sort(sorted)
      def q(p: Double): Double = {
        val pos = (n - 1) * p
        val lo = pos.toInt
        val frac = pos - lo
        if (lo + 1 < n) sorted(lo) + (sorted(lo + 1) - sorted(lo)) * frac
        else sorted(lo)
      }
      val q1 = q(1.0 / 3); val q2 = q(2.0 / 3)
      def letter(v: Double): Int = if (v <= q1) 0 else if (v <= q2) 1 else 2
      val counts = new Array[Long](9)
      var t = 0
      while (t < n - 1) { counts(3 * letter(x(t)) + letter(x(t + 1))) += 1; t += 1 }
      val bigN = (n - 1).toDouble
      var h = 0.0
      var ij = 0
      while (ij < 9) {
        if (counts(ij) > 0) {
          val p = counts(ij) / bigN
          h -= p * math.log(p)
        }
        ij += 1
      }
      java.lang.Double.valueOf(h)
    })

    new GenericInternalRow(out)
  }
}

/** Native multi-output catch22 tranche over an array<double> window (see
  * [[Catch22Util]]). CodegenFallback: one heavy call per WINDOW
  * (post-aggregation), not per row — codegen would buy nothing.
  */
case class Catch22Slice(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"catch22 requires array<double>, got ${t.sql}")
  }
  override def dataType: DataType = Catch22Util.dataType
  override def nullable: Boolean = true
  override def prettyName: String = "catch22_tranche1"

  override def nullSafeEval(a: Any): Any =
    Catch22Util.compute(a.asInstanceOf[ArrayData])

  override protected def withNewChildInternal(
      newChild: Expression): Catch22Slice = copy(child = newChild)
}

object Catch22Slice {
  def apply(arr: Column): Column =
    ColumnBridge.column(Catch22Slice(ColumnBridge.expression(arr)))
}
