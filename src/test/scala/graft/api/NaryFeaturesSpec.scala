package graft.api

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core._

/** Tuple-series (arity >= 2) features folded into the main calculate path
  * (reference: feature.py:121-168 tuple series_name; naming
  * strided_rolling.py:502-507; tests
  * test_features_feature_collection.py:1752-1838).
  */
class NaryFeaturesSpec extends SparkSpec {

  private def seqSeries(name: String, vals: Seq[Double]) = {
    val rows = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    Series(name, spark.createDataFrame(rows).toDF("i", name), "i", name)
  }

  private val win = Some(Win.seq(4L))
  private val st = Some(Seq(Win.seq(4L)))

  test("3-ary wcorr: perfectly correlated series give 1, anti-correlated -1") {
    val a = seqSeries("a", (0 until 8).map(_.toDouble))
    val b = seqSeries("b", (0 until 8).map(i => 2.0 * i + 3))
    val c = seqSeries("c", (0 until 8).map(i => -1.0 * i))
    val w = seqSeries("w", Seq(1, 2, 3, 1, 2, 3, 1, 2).map(_.toDouble))
    val out = FeatureCollection(
      NaryFeatureDescriptor(NaryFuncs.wcorr, Seq("a", "b", "w"), win, st),
      NaryFeatureDescriptor(NaryFuncs.wcorr, Seq("a", "c", "w"), win, st))
      .calculate(Seq(a, b, c, w)).orderBy("i").collect()
    assert(out.length == 1) // [0,4): one full window under the W1 rule
    val r = out.head
    assert(math.abs(r.getAs[Double]("a|b|w__wcorr__w=4") - 1.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("a|c|w__wcorr__w=4") + 1.0) < 1e-12)
  }

  test("2-ary corr matches Spark's whole-window corr") {
    val vals = Seq(1.0, 4.0, 2.0, 8.0, 3.0, 6.0, 5.0, 7.0)
    val bvals = Seq(2.0, 3.0, 7.0, 5.0, 9.0, 1.0, 4.0, 8.0)
    val a = seqSeries("a", vals)
    val b = seqSeries("b", bvals)
    val out = FeatureCollection(
      NaryFeatureDescriptor(NaryFuncs.corr2, Seq("a", "b"), win, st))
      .calculate(Seq(a, b)).orderBy("i").collect()
    // window [0,4): first four samples of each series
    val expected = spark.createDataFrame(vals.take(4).zip(bvals.take(4)))
      .toDF("x", "y").agg(corr(col("x"), col("y"))).head.getDouble(0)
    assert(math.abs(out.head.getAs[Double]("a|b__corr__w=4") - expected) < 1e-12)
  }

  test("tuple views pair on the index intersection") {
    // b is missing index 2 — the pair (a2, b2) must not exist, so the dot
    // product only sums the co-indexed samples of window [0,4)
    val a = seqSeries("a", Seq(1.0, 1.0, 100.0, 1.0, 1.0, 1.0, 1.0, 1.0))
    val bdf = spark.createDataFrame(
      Seq((0L, 2.0), (1L, 3.0), (3L, 4.0), (7L, 5.0))).toDF("i", "b")
    val b = Series("b", bdf, "i", "b")
    val out = FeatureCollection(
      NaryFeatureDescriptor(NaryFuncs.dot, Seq("a", "b"), win, st))
      .calculate(Seq(a, b)).orderBy("i").collect()
    assert(out.head.getAs[Double]("a|b__dot__w=4") == 2.0 + 3.0 + 4.0)
  }

  test("wcorr jointly null-masks (a, b, w): partial-null rows enter NO sum") {
    // w is missing indices 2 and 3 — wcorr over [0,8) must equal wcorr over
    // only the jointly-present rows. Before the joint mask, sum(w) skipped
    // those rows (w null) while nothing masked a/b, but with a or b null the
    // reverse held: sum(w) counted rows the cross-moments dropped.
    val a = seqSeries("a", Seq(1.0, 4.0, 2.0, 8.0, 3.0, 6.0, 5.0, 7.0))
    val bdf = spark.createDataFrame(
      Seq((0L, 2.0), (1L, 3.0), (2L, 7.0), (3L, 5.0), (4L, 9.0), (6L, 4.0), (7L, 8.0)))
      .toDF("i", "b") // b missing index 5
    val b = Series("b", bdf, "i", "b")
    val wdf = spark.createDataFrame(
      Seq((0L, 1.0), (1L, 2.0), (4L, 3.0), (5L, 1.0), (6L, 2.0), (7L, 3.0)))
      .toDF("i", "w") // w missing indices 2, 3
    val w = Series("w", wdf, "i", "w")
    val win7 = Some(Win.seq(7L))
    val st7 = Some(Seq(Win.seq(7L)))
    val out = FeatureCollection(
      NaryFeatureDescriptor(NaryFuncs.wcorr, Seq("a", "b", "w"), win7, st7))
      .calculate(Seq(a, b, w)).collect()
    // window [0,7): joint rows are 0, 1, 4, 6
    val rows = Seq((1.0, 2.0, 1.0), (4.0, 3.0, 2.0), (3.0, 9.0, 3.0),
      (5.0, 4.0, 2.0))
    val sw = rows.map(_._3).sum
    val swa = rows.map(r => r._3 * r._1).sum
    val swb = rows.map(r => r._3 * r._2).sum
    val swab = rows.map(r => r._3 * r._1 * r._2).sum
    val swaa = rows.map(r => r._3 * r._1 * r._1).sum
    val swbb = rows.map(r => r._3 * r._2 * r._2).sum
    val expected = (sw * swab - swa * swb) /
      math.sqrt((sw * swaa - swa * swa) * (sw * swbb - swb * swb))
    assert(out.length == 1)
    assert(math.abs(out.head.getAs[Double]("a|b|w__wcorr__w=7") - expected) < 1e-12)
  }

  test("serde round-trips n-ary descriptors") {
    val fc = FeatureCollection(
      FeatureDescriptor(FeatureFuncs.mean, "a", win, st),
      NaryFeatureDescriptor(NaryFuncs.wcorr, Seq("a", "b", "w"), win, st))
    val json = FeatureCollectionSerde.toJson(fc)
    val back = FeatureCollectionSerde.fromJson(json)
    assert(back.descriptors.map(_.outputNamesAll) == fc.descriptors.map(_.outputNamesAll))
    assert(back.requiredSeries == fc.requiredSeries)
  }

  test("group-by paths reject tuple features") {
    val a = seqSeries("a", Seq(1.0, 2.0))
    val g = seqSeries("g", Seq(0.0, 0.0))
    val fc = FeatureCollection(
      NaryFeatureDescriptor(NaryFuncs.corr2, Seq("a", "g"), win, st))
    val e = intercept[IllegalArgumentException](fc.calculateGroupByAll(Seq(a, g), g))
    assert(e.getMessage.contains("single-series"))
  }

  test("arity-1 NaryFeatureDescriptor is rejected") {
    intercept[IllegalArgumentException](
      NaryFeatureDescriptor(NaryFuncs.corr2, Seq("a"), win, st))
  }

  test("function/series arity mismatch fails at construction") {
    // too few: wcorr consumes 3 — would be a MatchError at plan build
    val few = intercept[IllegalArgumentException](
      NaryFeatureDescriptor(NaryFuncs.wcorr, Seq("a", "b"), win, st))
    assert(few.getMessage.contains("consumes 3"))
    // too many: corr consumes 2 — the extra series would silently shrink
    // the index intersection without entering the statistic
    val many = intercept[IllegalArgumentException](
      NaryFeatureDescriptor(NaryFuncs.corr2, Seq("a", "b", "c"), win, st))
    assert(many.getMessage.contains("consumes 2"))
  }
}
