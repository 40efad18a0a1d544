package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.api.{FeatureCollection, FeatureDescriptor}

/** `make_robust` semantics (reference: tsflex/features/utils.py:153-256):
  * mask-then-guard order, passthrough default, raw-length guard under
  * passthrough, UDF escape-hatch composition, multi-output error tuples.
  */
class RobustSpec extends SparkSpec {
  import FeatureFuncs._

  // 8 samples, window [0,4) holds values (1, NaN, NaN, 4)
  private def nanSeries = {
    val vals = Seq(1.0, Double.NaN, Double.NaN, 4.0, 5.0, 6.0, 7.0, 8.0)
    val rows = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    Series("x", spark.createDataFrame(rows).toDF("i", "x"), "i", "x")
  }
  private val win = Some(Win.seq(4L))
  private val st = Some(Seq(Win.seq(4L)))

  private def calc(f: FeatureFunc): org.apache.spark.sql.Row =
    FeatureCollection(FeatureDescriptor(f, "x", win, st))
      .calculate(Seq(nanSeries)).orderBy("i").collect().head

  test("passthrough (default): guard counts RAW length, function sees NaNs") {
    // 4 raw samples >= 3, so the function RUNS even though only 2 non-NaN
    // remain (reference: passthrough filter is skipped, utils.py:189-196)
    val r = calc(mean.robust(3, -7.0))
    assert(r.getDouble(1).isNaN) // mean over raw window containing NaN
  }

  test("masked: NaN filter runs FIRST, guard counts survivors") {
    val r = calc(mean.robust(3, -7.0, passThroughNans = false))
    assert(r.getDouble(1) == -7.0) // only 2 non-NaN samples < 3
    val ok = calc(mean.robust(2, -7.0, passThroughNans = false))
    assert(ok.getDouble(1) == 2.5) // mean(1, 4)
  }

  test("robust composes with the fromArray UDF escape hatch") {
    val p2p = fromArray("p2p", a => a.max - a.min)
    // masked: the UDF's array must exclude the NaN rows entirely
    val r = calc(p2p.robust(2, -1.0, passThroughNans = false))
    assert(r.getDouble(1) == 3.0) // max(1,4) - min(1,4)
    val guarded = calc(p2p.robust(3, -1.0, passThroughNans = false))
    assert(guarded.getDouble(1) == -1.0)
  }

  test("robust composes with the fromPairs index-aware escape hatch") {
    val span = fromPairs("span", ps => ps.last._1 - ps.head._1)
    val r = calc(span.robust(2, -1.0, passThroughNans = false))
    assert(r.getDouble(1) == 3.0) // indices 0 and 3 survive the mask
  }

  test("multi-output robust: every output gets errorVal") {
    val r = FeatureCollection(FeatureDescriptor(
      minMax.robust(5, -9.0, passThroughNans = false), "x", win, st))
      .calculate(Seq(nanSeries)).orderBy("i").collect().head
    assert(r.getAs[Double]("x__mm_min__w=4") == -9.0)
    assert(r.getAs[Double]("x__mm_max__w=4") == -9.0)
  }
}
