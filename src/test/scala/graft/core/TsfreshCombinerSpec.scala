package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** tsfresh combiner members + tsfel spectral battery (r11 tranche 4),
  * hand-oracled: index mass quantiles on a flat window, exact-line OLS
  * trends, sinusoid spectral concentration, Welch peak placement.
  */
class TsfreshCombinerSpec extends SparkSpec {
  import FeatureFuncs._

  private def frame(pairs: Seq[(Double, Double)]) = {
    import spark.implicits._
    scala.util.Random.shuffle(pairs.toList).toDF("idx", "v").repartition(3)
  }

  private def evalP(fn: FeatureFunc, pairs: Seq[(Double, Double)]): Seq[Option[Double]] = {
    val df = frame(pairs)
    fn.outputNames match {
      case Some(outs) =>
        val r = df.agg(fn.agg(col("idx"), col("v")).as("s"))
          .select(outs.map(o => col(s"s.$o").cast("double")): _*).head
        outs.indices.map(i => if (r.isNullAt(i)) None else Some(r.getDouble(i)))
      case None =>
        val r = df.agg(fn.agg(col("idx"), col("v")).cast("double")).head
        Seq(if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    }
  }

  private def series(vals: Double*): Seq[(Double, Double)] =
    vals.zipWithIndex.map { case (v, i) => (i.toDouble, v) }

  test("index_mass_quantile on a flat window") {
    assert(evalP(indexMassQuantile(0.15), series(1, 1, 1, 1)).head.contains(0.25))
    assert(evalP(indexMassQuantile(0.5), series(1, 1, 1, 1)).head.contains(0.5))
    assert(evalP(indexMassQuantile(0.75), series(1, 1, 1, 1)).head.contains(0.75))
    // all-zero mass -> null (tsfresh 0/0)
    assert(evalP(indexMassQuantile(0.5), series(0, 0, 0)).head.isEmpty)
    // mass concentrated up front
    assert(evalP(indexMassQuantile(0.5), series(10, 0, 0, 0)).head.contains(0.25))
  }

  test("linear_trend recovers an exact line with zero stderr") {
    val r = evalP(linearTrend, series((0 to 9).map(t => 3.0 * t + 7): _*))
    assert(math.abs(r(0).get - 3.0) < 1e-9)
    assert(math.abs(r(1).get - 7.0) < 1e-9)
    assert(math.abs(r(2).get) < 1e-6)
    // constant window: slope 0, intercept = value
    val c = evalP(linearTrend, series(5, 5, 5))
    assert(math.abs(c(0).get) < 1e-12 && math.abs(c(1).get - 5.0) < 1e-9)
    // n=1: no trend
    assert(evalP(linearTrend, series(4)).forall(_.isEmpty))
  }

  test("linear_trend_timewise regresses against wall-clock hours") {
    // idx in epoch micros: i hours apart; v = 2*i + 5
    val pairs = (0 to 7).map(i => (i * 3600000000.0, 2.0 * i + 5))
    val r = evalP(linearTrendTimewise, pairs)
    assert(math.abs(r(0).get - 2.0) < 1e-9)
    assert(math.abs(r(1).get - 5.0) < 1e-9)
    // irregular sampling: hours 0, 1, 3 with v = 10*h -> still exact
    val irr = Seq(0.0, 1.0, 3.0).map(h => (h * 3600000000.0, 10.0 * h))
    val r2 = evalP(linearTrendTimewise, irr)
    assert(math.abs(r2(0).get - 10.0) < 1e-9)
    assert(math.abs(r2(1).get) < 1e-9)
  }

  test("spectral_shape concentrates on a pure sinusoid bin") {
    val n = 64
    val xs = (0 until n).map(t => math.sin(2 * math.Pi * 4 * t / n))
    val r = evalP(spectralShape(n.toDouble), series(xs: _*))
    val names = graft.expr.SpectralShapeUtil.names
    val m = names.zip(r).toMap
    // f_k = k*fs/n = k at fs = n; all energy at k = 4
    assert(math.abs(m("spec_centroid").get - 4.0) < 1e-6)
    assert(m("spec_spread").get < 1e-3)
    assert(m("max_power_rel").get > 0.999)
    assert(m("fund_freq").contains(4.0))
    assert(m("spec_rolloff").contains(4.0))
    assert(m("median_freq").contains(4.0))
    // k=4 of K=32 bins -> band 0
    assert(m("fft_mc_1").get > 0.999)
    assert(m("fft_mc_4").get < 1e-3)
  }

  test("spectral_shape nulls: too short and zero energy") {
    assert(evalP(spectralShape(1.0), series(1, 2, 3)).forall(_.isEmpty))
    assert(evalP(spectralShape(1.0), series(2, 2, 2, 2, 2)).forall(_.isEmpty))
  }

  test("welch relative density peaks at the driving coefficient") {
    // n = 256 = nperseg: one segment; x = sin(2*pi*2t/256) -> k = 2
    val xs = (0 until 256).map(t => math.sin(2 * math.Pi * 2 * t / 256))
    val r = evalP(welchDensityRel(5), series(xs: _*))
    val m = graft.expr.WelchRelUtil.names(5).zip(r).toMap
    // the periodic-Hann main lobe spreads a pure tone to k±1 with power
    // ratio 1:4:1 -> center 2/3, shoulders 1/6 each
    assert(math.abs(m("welch_rel_2").get - 2.0 / 3) < 1e-3)
    assert(math.abs(m("welch_rel_1").get - 1.0 / 6) < 1e-3)
    assert(math.abs(m("welch_rel_3").get - 1.0 / 6) < 1e-3)
    assert(m("welch_rel_0").get < 0.01)
    assert(m("welch_rel_4").get < 0.01)
    // short window -> null
    assert(evalP(welchDensityRel(5), series(1, 2, 3)).forall(_.isEmpty))
  }
}
