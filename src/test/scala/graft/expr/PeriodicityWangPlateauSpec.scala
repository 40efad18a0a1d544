package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PD_PeriodicityWang lag-decision differential vs the DIRECT per-lag ACF
  * loop the r17 FFT rewrite replaced (ADVICE r17): the kernel's
  * autocorrelation moved to prefix sums + one zero-padded FFT (~1e-13
  * relative), and periodicityWang's output is an integer lag chosen by
  * strict slope-sign comparisons and a >= 0.01 peak-over-trough threshold
  * — so a PLATEAUED ACF with a near-tie margin is where an ulp-scale shift
  * could flip the selected lag. This spec reimplements the replaced form
  * (same spline detrend, one truncated-Pearson pass per lag in the
  * original left-to-right accumulation order, same trough/peak scan) and
  * pins the kernel's lag against it on exactly that window class:
  * flat-top square waves (exact ACF plateaus → exact zero slopes), two-
  * tone beats (broad rounded peaks), near-threshold margins, constants,
  * ramps, steps, plus a seeded random battery.
  */
class PeriodicityWangPlateauSpec extends SparkSpec {
  import graft.core.FeatureFuncs.catch22Tranche1

  /** The REPLACED r16 form: spline detrend (identical code path to the
    * kernel, so ySub matches bitwise) + one O(n−τ) truncated-Pearson pass
    * per lag + the C pairing scan. Returns the selected lag, or None for
    * n < 7 (the kernel's null).
    */
  private def directWang(x: Array[Double]): Option[Double] = {
    val n = x.length
    if (n < 7) return None
    val th = 0.01
    val basis = Array.ofDim[Double](5, n)
    var t = 0
    while (t < n) {
      val u = t.toDouble / (n - 1)
      basis(0)(t) = 1.0
      basis(1)(t) = u
      basis(2)(t) = u * u
      basis(3)(t) = u * u * u
      val up = u - 0.5
      basis(4)(t) = if (up > 0) up * up * up else 0.0
      t += 1
    }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < n) { s += a(i) * b(i); i += 1 }
      s
    }
    val u = Array.ofDim[Double](5, n)
    var k = 0
    while (k < 5) {
      System.arraycopy(basis(k), 0, u(k), 0, n)
      var j = 0
      while (j < k) {
        val nrm = dot(u(j), u(j))
        val c = if (nrm > 0) dot(basis(k), u(j)) / nrm else 0.0
        var i = 0
        while (i < n) { u(k)(i) -= c * u(j)(i); i += 1 }
        j += 1
      }
      k += 1
    }
    val ySub = java.util.Arrays.copyOf(x, n)
    k = 0
    while (k < 5) {
      val nrm = dot(u(k), u(k))
      val c = if (nrm > 0) dot(x, u(k)) / nrm else 0.0
      var i = 0
      while (i < n) { ySub(i) -= c * u(k)(i); i += 1 }
      k += 1
    }
    val acmax = math.ceil(n / 3.0).toInt
    val ac = new Array[Double](acmax + 2)
    var tau = 1
    while (tau <= acmax) {
      val m = n - tau
      var sa = 0.0; var sb = 0.0; var saa = 0.0; var sbb = 0.0; var sab = 0.0
      var i = 0
      while (i < m) {
        val a = ySub(i); val b = ySub(i + tau)
        sa += a; saa += a * a
        sb += b; sbb += b * b
        sab += a * b
        i += 1
      }
      val cov = sab - sa * sb / m
      val va = saa - sa * sa / m
      val vb = sbb - sb * sb / m
      ac(tau) = cov / math.sqrt(va * vb)
      tau += 1
    }
    val kind = new Array[Int](acmax + 1)
    var lag = 2
    while (lag <= acmax - 1) {
      val slopeIn = ac(lag) - ac(lag - 1)
      val slopeOut = ac(lag + 1) - ac(lag)
      if (slopeIn < 0 && slopeOut > 0) kind(lag) = 1
      else if (slopeIn > 0 && slopeOut < 0) kind(lag) = 2
      lag += 1
    }
    var out = 1.0
    var lastTrough = -1
    var done = false
    lag = 2
    while (!done && lag <= acmax - 1) {
      if (kind(lag) == 1) lastTrough = lag
      else if (kind(lag) == 2 && lastTrough >= 0 &&
        ac(lag) >= 0 && ac(lag) - ac(lastTrough) >= th) {
        out = lag.toDouble; done = true
      }
      lag += 1
    }
    Some(out)
  }

  private def kernelWang(vals: Seq[Double]): Option[Double] = {
    import spark.implicits._
    val df = scala.util.Random.shuffle(
      vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toList)
      .toDF("idx", "v").repartition(3)
    val r = df.agg(catch22Tranche1.agg(col("idx"), col("v"))
      .getField("PD_PeriodicityWang_th0_01").cast("double")).head
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  private def check(name: String, vals: Seq[Double]): Unit = {
    val direct = directWang(vals.toArray)
    val kernel = kernelWang(vals)
    assert(kernel == direct,
      s"$name (n=${vals.length}): kernel=$kernel direct=$direct")
  }

  test("exact ACF plateaus: square waves (zero slopes, strict sign scan)") {
    // flat-top ACF with runs of EQUAL values — the strict < / > scan sees
    // exact zero slopes in the direct form; the FFT side must make the
    // same non-peak/non-trough call
    for (period <- Seq(4, 6, 8, 12); n <- Seq(48, 96)) {
      val sq = (0 until n).map(i => if ((i / (period / 2)) % 2 == 0) 1.0 else -1.0)
      check(s"square p=$period", sq)
    }
  }

  test("two-tone beats: broad rounded near-tie peaks") {
    for ((f1, f2) <- Seq((0.31, 0.33), (0.2, 0.21), (0.11, 0.13)); n <- Seq(90, 150)) {
      val v = (0 until n).map(i => math.sin(i * f1) + math.sin(i * f2))
      check(s"beat $f1/$f2", v)
    }
  }

  test("near-threshold margins: peak-over-trough engineered around 0.01") {
    // damped oscillation on a slow drift — ACF peaks decay toward the
    // 0.01 threshold so SOME peak sits near the accept/reject boundary
    for (damp <- Seq(0.90, 0.95, 0.97, 0.99); n <- Seq(120)) {
      val v = (0 until n).map(i =>
        math.pow(damp, i) * math.sin(i * 0.6) + 0.02 * i)
      check(s"damped $damp", v)
    }
  }

  test("degenerate windows: constant, ramp, step, single spike") {
    check("constant", Seq.fill(30)(5.0))
    check("ramp", (0 until 30).map(_.toDouble))
    check("step", Seq.fill(15)(0.0) ++ Seq.fill(15)(1.0))
    check("spike", Seq.fill(14)(0.0) ++ Seq(10.0) ++ Seq.fill(15)(0.0))
  }

  test("seeded random battery across lengths") {
    val rng = new scala.util.Random(1234)
    for (n <- Seq(7, 13, 33, 64, 127, 256); rep <- 0 until 5) {
      val v = Seq.fill(n)(rng.nextGaussian())
      check(s"gauss n=$n rep=$rep", v)
      val walk = v.scanLeft(0.0)(_ + _).tail
      check(s"walk n=$n rep=$rep", walk)
    }
  }
}
