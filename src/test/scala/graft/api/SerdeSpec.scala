package graft.api

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** S5 round-trip: JSON spec persistence with registry-resolved functions. */
class SerdeSpec extends AnyFunSuite {
  import FeatureFuncs._

  test("save/load round-trips descriptors, windows, and strides") {
    val fc = FeatureCollection(
      FeatureDescriptor(mean, "eda", Some(Win.time("30s")), Some(Seq(Win.time("10s")))),
      FeatureDescriptor(len, "eda", Some(Win.seq(3L)), Some(Seq(Win.seq(1L), Win.seq(2L)))),
      FeatureDescriptor(max, "tmp", Some(SampleWin(500)), Some(Seq(SampleWin(250)))),
      FeatureDescriptor(sum, "tmp", None, None))
    val json = FeatureCollectionSerde.toJson(fc)
    val back = FeatureCollectionSerde.fromJson(json)
    assert(back.descriptors.length == fc.descriptors.length)
    assert(back.descriptors.map(_.outputName) == fc.descriptors.map(_.outputName))
    assert(back.descriptors.map(_.window) == fc.descriptors.map(_.window))
    assert(back.descriptors.map(_.strides) == fc.descriptors.map(_.strides))
    // loaded functions are the registry instances (same aggregation)
    assert(back.descriptors.head.funcName == "mean")
  }

  test("r11 tranche-4/5 parameterless stock round-trips by name") {
    val fns = Seq(shannonEntropy, meanAbsDiff, meanDiff, medianAbsDiff,
      medianDiff, curveDistance, pkPkDistance, linearTrend,
      linearTrendTimewise)
    val fc = FeatureCollection.of(fns.map(f =>
      FeatureDescriptor(f, "v", Some(Win.time("1h")), Some(Seq(Win.time("30m"))))))
    val back = FeatureCollectionSerde.fromJson(FeatureCollectionSerde.toJson(fc))
    assert(back.descriptors.map(_.funcName) == fns.map(_.name))
    // multi-output members keep their output names through the registry
    assert(back.descriptors.map(_.funcOutputNames) == fns.map(_.outputNames))
  }

  test("unregistered function fails at SAVE time with the function name") {
    val custom = FeatureFunc("mystery", (_, v) => org.apache.spark.sql.functions.max(v))
    val fc = FeatureCollection(FeatureDescriptor(custom, "x", Some(Win.seq(2L)),
      Some(Seq(Win.seq(1L)))))
    // emitting a spec that can never reload is the silent-failure mode the
    // hard error closes — toJson with the default registry must throw
    val e = intercept[IllegalArgumentException](FeatureCollectionSerde.toJson(fc))
    assert(e.getMessage.contains("mystery"))
    // round-trips once the SAME registry is passed to both sides
    val reg = FeatureFuncs.byName + ("mystery" -> custom)
    val json = FeatureCollectionSerde.toJson(fc, reg)
    assert(intercept[IllegalArgumentException](
      FeatureCollectionSerde.fromJson(json)).getMessage.contains("mystery"))
    val back = FeatureCollectionSerde.fromJson(json, reg)
    assert(back.descriptors.head.funcName == "mystery")
  }

  test("non-spec JSON rejected") {
    intercept[IllegalArgumentException](
      FeatureCollectionSerde.fromJson("""{"format":"other"}"""))
  }
}
