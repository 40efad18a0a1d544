package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The public feature-function stock (the integrations analog — reference:
  * tsflex/features/integrations.py:15-337 wraps seglearn/tsfresh/tsfel
  * members; exercised by tests/test_features_integration.py:28-471).
  * Hand-computed oracles on a fixed window; the order-dependent functions
  * are checked against a SHUFFLED input frame so the index-sort inside the
  * aggregate is load-bearing.
  */
class IntegrationsSpec extends SparkSpec {
  import FeatureFuncs._

  // idx 0..4 → values (1, 2, 1, 3, 0); handed to Spark in scrambled order
  private def df = {
    import spark.implicits._
    Seq((3L, 3.0), (0L, 1.0), (4L, 0.0), (1L, 2.0), (2L, 1.0))
      .toDF("idx", "v").repartition(3)
  }

  private def eval(fn: FeatureFunc): Option[Double] = {
    val r = df.agg(fn.agg(col("idx"), col("v")).cast("double")).head
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("hjorth mobility/complexity match hand-computed variances") {
    // x = (1,2,1,3,0): var_pop = 5.2/5; dx = (1,-1,2,-3): var_pop = 14.75/4
    // ddx = (-2,3,-5): var_pop = 38/3 - (4/3)^2 = 98/9
    val r = df.agg(hjorthParams.agg(col("idx"), col("v"))).head.getStruct(0)
    val (vx, vdx, vddx) = (5.2 / 5, 14.75 / 4, 98.0 / 9)
    val mob = math.sqrt(vdx / vx)
    val comp = math.sqrt(vddx / vdx) / mob
    assert(math.abs(r.getDouble(0) - mob) < 1e-12)
    assert(math.abs(r.getDouble(1) - comp) < 1e-12)
  }

  test("hjorth guards: constant and short windows degrade to null/zero") {
    import spark.implicits._
    val const = Seq((0L, 5.0), (1L, 5.0), (2L, 5.0)).toDF("idx", "v")
    val rc = const.agg(hjorthParams.agg(col("idx"), col("v"))).head.getStruct(0)
    assert(rc.isNullAt(0) && rc.isNullAt(1)) // var(x) = 0
    val two = Seq((0L, 1.0), (1L, 4.0)).toDF("idx", "v")
    val r2 = two.agg(hjorthParams.agg(col("idx"), col("v"))).head.getStruct(0)
    // a single dx has var 0 -> mobility 0, complexity null (no ddx)
    assert(r2.getDouble(0) == 0.0 && r2.isNullAt(1))
  }

  test("petrosian_fd matches the closed form; constant window = 1") {
    // x = (1,2,1,3,0): dx = (1,-1,2,-3) → signs (1,-1,1,-1) → 3 changes
    val n = 5.0; val nd = 3.0
    val expect = math.log10(n) /
      (math.log10(n) + math.log10(n / (n + 0.4 * nd)))
    assert(math.abs(eval(petrosianFd).get - expect) < 1e-12)
    import spark.implicits._
    val const = Seq((0L, 5.0), (1L, 5.0), (2L, 5.0)).toDF("idx", "v")
    val rc = const.agg(petrosianFd.agg(col("idx"), col("v")).cast("double")).head
    assert(rc.getDouble(0) == 1.0) // no sign changes → log10(n/n) = 0
    val one = Seq((0L, 5.0)).toDF("idx", "v")
    assert(one.agg(petrosianFd.agg(col("idx"), col("v"))).head.isNullAt(0))
  }

  test("katz_fd matches the closed form; degenerate windows null") {
    // x = (1,2,1,3,0): L = 1+1+2+3 = 7; x1 = 1; d = max(3-1, 1-0) = 2; n = 4
    val expect = math.log10(4.0) /
      (math.log10(4.0) + math.log10(2.0 / 7.0))
    assert(math.abs(eval(katzFd).get - expect) < 1e-12)
    import spark.implicits._
    val const = Seq((0L, 5.0), (1L, 5.0)).toDF("idx", "v")
    assert(const.agg(katzFd.agg(col("idx"), col("v"))).head.isNullAt(0))
  }

  test("abs_energy = sum of squares") {
    assert(eval(absEnergy).contains(15.0)) // 1+4+1+9+0
  }

  test("iqr matches np.quantile linear interpolation") {
    // sorted (0,1,1,2,3): q75 = 2, q25 = 1
    assert(eval(iqr).contains(1.0))
  }

  test("crossings(m) counts index-consecutive strict straddles of m") {
    // (1,2,1,3,0) vs 1.5 → above = (0,1,0,1,0) → 4 changes
    assert(eval(crossings(1.5)).contains(4.0))
    // touching m exactly is NOT a crossing (np.diff(x > m) semantics):
    // vs 1.0 → above = (0,1,0,1,0) → still 4
    assert(eval(crossings(1.0)).contains(4.0))
    // zero_crossings: (1,2,1,3,0) > 0 → (1,1,1,1,0) → one change (the final
    // 0 is not > 0; touching zero flips the strict > side)
    assert(eval(zeroCrossings).contains(1.0))
  }

  test("mean_crossings uses the window's own mean") {
    // mean = 1.4 → above = (0,1,0,1,0) → 4
    assert(eval(meanCrossings).contains(4.0))
  }

  test("autocorrelation at lag 1 matches the tsfresh formula") {
    // mu=1.4, varp=1.04, pairs (1,2),(2,1),(1,3),(3,0):
    // sum = -3.36, /4 /1.04 = -0.80769230...
    val got = eval(autocorr(1)).get
    assert(math.abs(got - (-3.36 / 4 / 1.04)) < 1e-12)
  }

  test("autocorrelation guards: short window and zero variance give null") {
    import spark.implicits._
    val short = Seq((0L, 5.0)).toDF("idx", "v")
    assert(short.agg(autocorr(1).agg(col("idx"), col("v"))).head.isNullAt(0))
    val const = Seq((0L, 5.0), (1L, 5.0), (2L, 5.0)).toDF("idx", "v")
    assert(const.agg(autocorr(1).agg(col("idx"), col("v"))).head.isNullAt(0))
  }

  test("binned_entropy: histogram Shannon entropy in nats, constant window = 0") {
    // bins=2 over [0,3]: (1,2,1,3,0) → bins (0,1,0,1,0) → counts (3,2)
    val expect = -(3.0 / 5 * math.log(3.0 / 5) + 2.0 / 5 * math.log(2.0 / 5))
    assert(math.abs(eval(binnedEntropy(2)).get - expect) < 1e-12)
    import spark.implicits._
    val const = Seq((0L, 5.0), (1L, 5.0)).toDF("idx", "v")
    assert(const.agg(binnedEntropy(4).agg(col("idx"), col("v")))
      .head.getDouble(0) == 0.0)
  }

  test("cid_ce = sqrt of squared consecutive diffs, index-ordered") {
    // diffs (1, -1, 2, -3) → squares 1+1+4+9 = 15
    assert(math.abs(eval(cidCe).get - math.sqrt(15.0)) < 1e-12)
    import spark.implicits._
    val short = Seq((0L, 5.0)).toDF("idx", "v")
    assert(short.agg(cidCe.agg(col("idx"), col("v"))).head.isNullAt(0))
  }

  test("number_peaks_1 counts strict interior local maxima") {
    // (1,2,1,3,0): peaks at idx1 (2>1,2>1) and idx3 (3>1,3>0) → 2
    assert(eval(numberPeaks1).contains(2.0))
    import spark.implicits._
    // plateau is not a strict peak
    val flat = Seq((0L, 1.0), (1L, 2.0), (2L, 2.0), (3L, 1.0)).toDF("idx", "v")
    assert(flat.agg(numberPeaks1.agg(col("idx"), col("v"))).head.getLong(0) == 0L)
    val short = Seq((0L, 1.0), (1L, 9.0)).toDF("idx", "v")
    assert(short.agg(numberPeaks1.agg(col("idx"), col("v"))).head.getLong(0) == 0L)
  }

  test("longest_strike_above_mean measures the longest consecutive run") {
    // mean 1.4 → above = (F,T,F,T,F) → longest run 1
    assert(eval(longestStrikeAboveMean).contains(1.0))
    import spark.implicits._
    // (0,5,6,7,0): mean 3.6 → above run (5,6,7) → 3
    val runs = Seq((0L, 0.0), (1L, 5.0), (2L, 6.0), (3L, 7.0), (4L, 0.0))
      .toDF("idx", "v")
    assert(runs.agg(longestStrikeAboveMean.agg(col("idx"), col("v")))
      .head.getLong(0) == 3L)
  }

  test("ratio_beyond_r_sigma: fraction outside mu +- r*sigma_pop") {
    // mu=1.4, sigma_pop=sqrt(1.04)≈1.0198: |x-mu| = (.4,.6,.4,1.6,1.4)
    // beyond 1 sigma: 3.0 (1.6) and 0.0 (1.4) → 2/5
    assert(eval(ratioBeyondRSigma(1)).contains(0.4))
  }

  test("the stock registers in byName (serde-reachable)") {
    assert(Seq("abs_energy", "iqr", "zero_crossings", "mean_crossings",
      "cid_ce", "number_peaks_1", "longest_strike_above_mean")
      .forall(byName.contains))
  }
}
