package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** tsfel temporal/statistical stock completion (r11 tranche 4 — the
  * remaining basic members of the reference's tsfel integration surface:
  * tsflex/features/integrations.py:102-173, exercised at
  * tests/test_features_integration.py:158-216). Hand-oracled, shuffled
  * input so the index sort inside each aggregate is load-bearing.
  */
class TsfelSpec extends SparkSpec {
  import FeatureFuncs._

  private def frame(vals: Double*) = {
    import spark.implicits._
    scala.util.Random.shuffle(
      vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toList)
      .toDF("idx", "v").repartition(3)
  }

  private def eval(fn: FeatureFunc, vals: Double*): Option[Double] = {
    val r = frame(vals: _*).agg(fn.agg(col("idx"), col("v")).cast("double")).head
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  private def evalMulti(fn: FeatureFunc, vals: Double*): Seq[Option[Double]] = {
    val outs = fn.outputNames.get
    val r = frame(vals: _*).agg(fn.agg(col("idx"), col("v")).as("s"))
      .select(outs.map(o => col(s"s.$o").cast("double")): _*).head
    outs.indices.map(i => if (r.isNullAt(i)) None else Some(r.getDouble(i)))
  }

  test("mean_abs_diff / mean_diff on a hand case") {
    // diffs of (3, 1, 4, 1, 5): -2, 3, -3, 4
    assert(math.abs(eval(meanAbsDiff, 3, 1, 4, 1, 5).get - 3.0) < 1e-12)
    assert(math.abs(eval(meanDiff, 3, 1, 4, 1, 5).get - 0.5) < 1e-12)
    // singleton: np.mean of an empty diff → null
    assert(eval(meanAbsDiff, 7).isEmpty)
    assert(eval(meanDiff, 7).isEmpty)
  }

  test("median_abs_diff / median_diff: even and odd diff counts") {
    // diffs -2, 3, -3, 4 → |d| sorted 2,3,3,4 → median 3; d sorted
    // -3,-2,3,4 → median 0.5
    assert(math.abs(eval(medianAbsDiff, 3, 1, 4, 1, 5).get - 3.0) < 1e-12)
    assert(math.abs(eval(medianDiff, 3, 1, 4, 1, 5).get - 0.5) < 1e-12)
    // diffs of (0, 1, 3): 1, 2 → medians 1.5
    assert(math.abs(eval(medianAbsDiff, 0, 1, 3).get - 1.5) < 1e-12)
    assert(eval(medianDiff, 9).isEmpty)
  }

  test("distance: curve length sums sqrt(1 + d^2)") {
    // diffs of (0, 3, 3): 3, 0 → sqrt(10) + 1
    val expect = math.sqrt(10.0) + 1.0
    assert(math.abs(eval(curveDistance, 0, 3, 3).get - expect) < 1e-12)
    assert(eval(curveDistance, 5).contains(0.0)) // np.sum([]) == 0
  }

  test("pk_pk_distance is max - min") {
    assert(math.abs(eval(pkPkDistance, -2, 7, 3).get - 9.0) < 1e-12)
  }

  test("auc: trapezoid of |x_i + x_{i+1}| / (2 fs)") {
    // fs=2: 0.25 * (|1 + -3| + |-3 + 5|) = 0.25 * 4/... = 0.25*(2+2)=1.0
    assert(math.abs(eval(aucFs(2.0), 1, -3, 5).get - 1.0) < 1e-12)
    assert(eval(aucFs(2.0), 4).contains(0.0))
  }

  test("calc_centroid: energy-weighted time centroid, zero-energy guard") {
    // fs=1, x=(0,2,2): t=(0,1,2), e=(0,4,4) → (0+4+8)/8 = 1.5
    assert(math.abs(eval(calcCentroid(1.0), 0, 2, 2).get - 1.5) < 1e-12)
    assert(eval(calcCentroid(1.0), 0, 0, 0).contains(0.0))
  }

  test("neighbourhood_peaks: strict greater than all 2n neighbours") {
    // n=1: (1,5,2,6,3): 5 > 1,2 and 6 > 2,3 → 2 peaks (ends excluded)
    assert(eval(neighbourhoodPeaks(1), 1, 5, 2, 6, 3).contains(2.0))
    // n=2: only 6 has a full +-2 neighbourhood: 6 > 5,2,3,1 → wait the
    // window is (1,5,2,6,3,1): position 3 (6) neighbours 5,2 | 3,1 → peak
    assert(eval(neighbourhoodPeaks(2), 1, 5, 2, 6, 3, 1).contains(1.0))
    // plateau: equal neighbour breaks strictness
    assert(eval(neighbourhoodPeaks(1), 1, 5, 5, 1).contains(0.0))
    // too short for any full neighbourhood → 0
    assert(eval(neighbourhoodPeaks(2), 1, 9, 1).contains(0.0))
  }

  test("ecdf_percentile_count: samples at or below the interpolated percentile") {
    // (1..10): p20 = 2.8 -> 2 samples; p80 = 8.2 -> 8 samples
    assert(eval(ecdfPercCount(0.2), (1 to 10).map(_.toDouble): _*).contains(2.0))
    assert(eval(ecdfPercCount(0.8), (1 to 10).map(_.toDouble): _*).contains(8.0))
    // percentile landing exactly on a sample includes it: (1..5), q=0.5 -> 3
    assert(eval(ecdfPercCount(0.5), 1, 2, 3, 4, 5).contains(3.0))
  }

  test("hist: equal-width counts, right-inclusive last bin") {
    // (0..8) over 4 bins of width 2: [0,2) [2,4) [4,6) [6,8] →
    // counts 2,2,2,3 (8 clamps into the last bin)
    val h = evalMulti(histCounts(4), 0, 1, 2, 3, 4, 5, 6, 7, 8)
    assert(h == Seq(Some(2.0), Some(2.0), Some(2.0), Some(3.0)))
    // max lands in the LAST bin (np.histogram right-inclusive edge)
    val h2 = evalMulti(histCounts(2), 0.0, 1.0)
    assert(h2 == Seq(Some(1.0), Some(1.0)))
    // constant window: all in bin 1 (documented deviation)
    val h3 = evalMulti(histCounts(3), 4, 4, 4)
    assert(h3 == Seq(Some(3.0), Some(0.0), Some(0.0)))
  }
}
