package graft.api

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core._

/** Per-key rolling: each key segments relative to its OWN bounds; empty
  * windows survive per key.
  */
class KeyedFeaturesSpec extends SparkSpec {
  import FeatureFuncs._

  test("keys get independent bounds and keep empty windows") {
    import spark.implicits._
    // key a: idx 0..6 (gap at 3-5) → windows [0,3),[3,6) + no [6,9) (6 is end)
    // key b: idx 10..13 dense — bounds independent of a
    val df = (Seq(0.0, 1.0, 2.0, 6.0).map(("a", _)) ++
      Seq(10.0, 11.0, 12.0, 13.0).map(("b", _)))
      .toDF("k", "idx").withColumn("v", col("idx") * 10)
    val out = KeyedFeatures.calculate(df, "k", "idx", "v",
      Win.seq(3L), Seq(Win.seq(3L)), Seq(len, mean), "v")
      .orderBy("k", "idx")
    val rows = out.collect().map(r => (r.getString(0), r.getDouble(1),
      r.getLong(2))).toSeq
    // a: bounds [0,6] → nb = floor((6-3)/3)+1 = 2 → windows end at 3, 6;
    //    second window [3,6) is EMPTY but still emits len=0
    // b: bounds [10,13] → nb = 1 → window [10,13) ends at 13
    assert(rows == Seq(("a", 3.0, 3L), ("a", 6.0, 0L), ("b", 13.0, 3L)))
    val meanCol = out.columns.indexOf("v__mean__w=3")
    assert(out.collect()(1).isNullAt(meanCol)) // empty window → null mean
  }
}
