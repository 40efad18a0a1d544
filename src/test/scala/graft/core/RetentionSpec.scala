package graft.core

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.api.{FeatureCollection, FeatureDescriptor}

/** Datatype- and timezone-retention guarantees (SURVEY §1.3, §7.4 risks
  * 5/6): value dtype flows through min/max untouched; time anchors are
  * absolute instants, independent of the session display timezone.
  */
class RetentionSpec extends SparkSpec {
  import FeatureFuncs._

  test("float32 values stay float32 through min/max (datatype retention)") {
    import spark.implicits._
    val df = Seq((0L, 1.5f), (1L, 2.5f), (2L, 3.5f)).toDF("idx", "v")
    assert(df.schema("v").dataType == FloatType)
    val fc = FeatureCollection(
      FeatureDescriptor(max, "v", Some(Win.seq(3L)), Some(Seq(Win.seq(1L)))))
    val out = fc.calculate(Seq(Series("v", df, "idx", "v")))
    assert(out.schema("v__max__w=3").dataType == FloatType)
  }

  test("time anchors are session-timezone-independent instants") {
    import spark.implicits._
    def anchors(tz: String): Seq[Long] = {
      spark.conf.set("spark.sql.session.timeZone", tz)
      try {
        val df = Seq(0L, 3600000000L, 7200000000L, 10800000000L)
          .toDF("us").select(timestamp_micros(col("us")).as("ts"),
            lit(1.0).as("v"))
        val fc = FeatureCollection(FeatureDescriptor(len, "v",
          Some(Win.time("2h")), Some(Seq(Win.time("1h")))))
        fc.calculate(Seq(Series("v", df, "ts", "v")))
          .select(unix_micros(col("ts")))
          .collect().map(_.getLong(0)).sorted.toSeq
      } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
    }
    assert(anchors("UTC") == anchors("Europe/Brussels"))
  }
}
