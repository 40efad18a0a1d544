package graft.proc

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Series

/** T1/T3/P7 semantics: upsert, output shaping, error on missing input. */
class SeriesPipelineSpec extends SparkSpec {

  private def data = {
    import spark.implicits._
    Seq((0L, 1.0), (1L, 2.0), (2L, 3.0)).toDF("idx", "a")
  }

  test("T3 upsert: same-name output replaces, new name adds") {
    val pipe = new SeriesPipeline(Seq(
      SeriesProcessor.mapSeries("double", Seq("a"))(v => v * 2),
      SeriesProcessor.mapSeriesAs("sq", Seq("a"), _ => "asq")(v => v * v)))
    val out = pipe.process(Seq(Series("a", data, "idx", "a")))
    assert(out.map(_.name) == Seq("a", "asq"))
    // step 2 sees step 1's replacement: asq = (2a)^2
    val asq = out.find(_.name == "asq").get
    assert(asq.df.select(sum(col("asq"))).head.getDouble(0) == 4.0 + 16.0 + 36.0)
  }

  test("P7 drop_keys and return_all shaping") {
    val pipe = new SeriesPipeline(Seq(
      SeriesProcessor.mapSeriesAs("sq", Seq("a"), _ => "asq")(v => v * v)))
    val extra = Series("b", data.withColumnRenamed("a", "b"), "idx", "b")
    val all = pipe.process(Seq(Series("a", data, "idx", "a"), extra))
    assert(all.map(_.name).toSet == Set("a", "b", "asq"))
    val onlyUsed = pipe.process(Seq(Series("a", data, "idx", "a"), extra),
      returnAll = false)
    assert(onlyUsed.map(_.name).toSet == Set("a", "asq"))
    val dropped = pipe.process(Seq(Series("a", data, "idx", "a"), extra),
      dropKeys = Seq("a"))
    assert(!dropped.map(_.name).contains("a"))
  }

  test("missing input series fails with the processor name") {
    val pipe = new SeriesPipeline(Seq(
      SeriesProcessor.mapSeries("clip", Seq("nope"))(identity)))
    val e = intercept[IllegalArgumentException](
      pipe.process(Seq(Series("a", data, "idx", "a"))))
    assert(e.getMessage.contains("clip"))
  }

  test("T1 multi-output: one step emits several named series, all upserted") {
    val pipe = new SeriesPipeline(Seq(
      SeriesProcessor.mapSeriesMulti("lohi", Seq("a"), Seq(
        ((n: String) => s"${n}lo", (v: org.apache.spark.sql.Column) => v - 1),
        ((n: String) => s"${n}hi", (v: org.apache.spark.sql.Column) => v + 1)))))
    val out = pipe.process(Seq(Series("a", data, "idx", "a")))
    assert(out.map(_.name) == Seq("a", "alo", "ahi"))
    val lo = out.find(_.name == "alo").get
    assert(lo.df.select(sum(col("alo"))).head.getDouble(0) == 0.0 + 1.0 + 2.0)
  }

  test("T1 flatMapSeries can replace AND add in the same call (upsert mix)") {
    val proc = SeriesProcessor.flatMapSeries("demean", Seq("a")) { sr =>
      Seq(sr.copy(df = sr.df.withColumn(sr.valueCol, col(sr.valueCol) * 10)),
        Series("amean", sr.df.withColumn("amean", lit(2.0)), sr.idxCol, "amean"))
    }
    val out = new SeriesPipeline(Seq(proc)).process(Seq(Series("a", data, "idx", "a")))
    assert(out.map(_.name) == Seq("a", "amean"))
    assert(out.head.df.select(sum(col("a"))).head.getDouble(0) == 60.0)
  }

  test("duplicate output names within one step fail with the processor name") {
    // the reference's duplicate-output-key assert
    // (series_processor.py:215-218): two outputs named 'dup' in ONE step
    val proc = SeriesProcessor.flatMapSeries("collide", Seq("a")) { sr =>
      Seq(Series("dup", sr.df.withColumn("dup", col(sr.valueCol)), sr.idxCol, "dup"),
        Series("dup", sr.df.withColumn("dup", -col(sr.valueCol)), sr.idxCol, "dup"))
    }
    val e = intercept[IllegalArgumentException](
      new SeriesPipeline(Seq(proc)).process(Seq(Series("a", data, "idx", "a"))))
    assert(e.getMessage.contains("collide") && e.getMessage.contains("dup"))
  }
}
