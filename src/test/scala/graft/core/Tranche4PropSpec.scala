package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariant properties of the r11 tranche-4/5 members over random
  * windows: entropy bounds, distribution sums, spectral orderings.
  */
class Tranche4PropSpec extends SparkSpec {
  import FeatureFuncs._

  private def windows(seed: Int, n: Int): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq(
      Seq.fill(n)(rnd.nextGaussian() * 30),            // gaussian
      Seq.fill(n)(rnd.nextDouble() * 100),             // uniform
      (0 until n).map(i => math.sin(i / 5.0) * 10 + rnd.nextGaussian()), // tone+noise
      (0 until n).map(i => i * 0.7 + rnd.nextDouble()) // trend
    )
  }

  private def evalAll(fn: FeatureFunc, vals: Seq[Double]): Map[String, Option[Double]] = {
    import spark.implicits._
    val df = scala.util.Random.shuffle(
      vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toList)
      .toDF("idx", "v").repartition(3)
    fn.outputNames match {
      case Some(outs) =>
        val r = df.agg(fn.agg(col("idx"), col("v")).as("s"))
          .select(outs.map(o => col(s"s.$o").cast("double")): _*).head
        outs.zipWithIndex.map { case (o, i) =>
          o -> (if (r.isNullAt(i)) None else Some(r.getDouble(i)))
        }.toMap
      case None =>
        val r = df.agg(fn.agg(col("idx"), col("v")).cast("double")).head
        Map(fn.name -> (if (r.isNullAt(0)) None else Some(r.getDouble(0))))
    }
  }

  test("entropy members stay inside their information bounds") {
    for ((xs, i) <- windows(101, 120).zipWithIndex) {
      val n = xs.length
      val sh = evalAll(shannonEntropy, xs)("shannon_entropy").get
      assert(sh >= 0 && sh <= math.log(n.toDouble) / math.log(2.0) + 1e-9, s"w$i shannon")
      val wpe = evalAll(weightedPermutationEntropy(3, normalize = true), xs)("wpe_3_norm").get
      assert(wpe >= 0 && wpe <= 1 + 1e-9, s"w$i wpe")
      val mspe = evalAll(multiscalePermEntropy(3, 3), xs)
      for (s <- 1 to 3; h <- mspe(s"mspe_$s"))
        assert(h >= 0 && h <= math.log(6.0) / math.log(2.0) + 1e-9, s"w$i mspe_$s")
      val lz = evalAll(lzivComplexity(), xs)("lziv").get
      assert(lz >= 1 && lz <= n, s"w$i lziv")
      val svdN = evalAll(svdEntropy(3, normalize = true), xs)("svd_entropy_3_norm").get
      assert(svdN >= 0 && svdN <= 1 + 1e-9, s"w$i svd")
    }
  }

  test("distribution-valued members sum correctly") {
    for ((xs, i) <- windows(202, 150).zipWithIndex) {
      val h = evalAll(histCounts(6), xs)
      assert((1 to 6).map(b => h(s"hist$b").get).sum == xs.length, s"w$i hist sum")
      val w = evalAll(welchDensityRel(5), xs)
      val ws = (0 until 5).flatMap(k => w(s"welch_rel_$k"))
      assert(ws.forall(v => v >= -1e-12 && v <= 1 + 1e-9), s"w$i welch range")
      assert(math.abs(ws.sum - 1.0) < 1e-9, s"w$i welch sum")
      val sp = evalAll(spectralShape(1.0), xs)
      val mc = (1 to 4).flatMap(b => sp(s"fft_mc_$b"))
      assert(math.abs(mc.sum - 1.0) < 1e-9, s"w$i fft_mc sum")
      assert(sp("max_power_rel").get > 0 && sp("max_power_rel").get <= 1 + 1e-12, s"w$i maxrel")
    }
  }

  test("spectral orderings and positivity") {
    for ((xs, i) <- windows(303, 200).zipWithIndex) {
      val sp = evalAll(spectralShape(1.0), xs)
      assert(sp("spec_rolloff").get >= sp("median_freq").get - 1e-12, s"w$i rolloff>=median")
      assert(sp("spec_spread").get >= 0, s"w$i spread")
      for (k <- sp("spec_kurt")) assert(k > 0, s"w$i kurt")
      val bandAll = evalAll(spectralBand(1.0, 0.0, 1.0), xs)("band_energy").get
      assert(math.abs(bandAll - 1.0) < 1e-12, s"w$i full-band energy")
    }
  }

  test("index mass quantile is monotone in q and within (0, 1]") {
    for ((xs, i) <- windows(404, 90).zipWithIndex) {
      val q15 = evalAll(indexMassQuantile(0.15), xs)("index_mass_q0.15").get
      val q50 = evalAll(indexMassQuantile(0.5), xs)("index_mass_q0.5").get
      val q85 = evalAll(indexMassQuantile(0.85), xs)("index_mass_q0.85").get
      assert(q15 <= q50 && q50 <= q85, s"w$i monotone")
      assert(q15 > 0 && q85 <= 1.0, s"w$i range")
    }
  }
}
