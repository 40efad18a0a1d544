package graft.chunk

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Series

/** C1/C2 chunking semantics on tiny golden data (reference:
  * tsflex/chunking/chunking.py:15-191).
  */
class ChunkerSpec extends SparkSpec {

  // Two dense runs [0..4] and [100..104] separated by a gap; fs = 1 Hz
  // (sequence domain, unit = 1), gap threshold 1.5.
  private def gappy = {
    import spark.implicits._
    val idx = (0 to 4).map(_.toDouble) ++ (100 to 104).map(_.toDouble)
    idx.map(i => (i, i * 10)).toDF("idx", "v")
  }
  private def series = Series("v", gappy, "idx", "v")

  test("C1: gap splits into chunks; ids 0-based in index order") {
    val ids = Chunker.withChunkIds(series, fs = Some(1.0))
      .select("__idx", "__chunk").orderBy("__idx")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(ids.take(5).forall(_._2 == 0L))
    assert(ids.drop(5).forall(_._2 == 1L))
  }

  test("C1: fs inference (None) thresholds on maxGap, single scan pipeline") {
    // threshold = 1.5 * max(diff) = 1.5 * 95 — nothing exceeds it, ONE chunk
    val one = Chunker.withChunkIds(series, fs = None)
      .select("__chunk").distinct().collect().map(_.getLong(0)).toSeq
    assert(one == Seq(0L))
    // and with a tighter gapFactor the gap splits again
    val ids = Chunker.withChunkIds(series, fs = None, gapFactor = 0.5)
      .select("__idx", "__chunk").orderBy("__idx")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    assert(ids.take(5).forall(_._2 == 0L) && ids.drop(5).forall(_._2 == 1L))
    // plan hygiene: the inference pass is a summary-sized maxGap branch —
    // its range exchange is reused within the plan (AQE finalizes reuse only
    // after execution, so run the query first)
    val df = Chunker.withChunkIds(series, fs = None)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("ReusedExchange"),
      "fs-inference plan should reuse a range exchange")
  }

  test("C2: minDur filter drops short chunks") {
    import spark.implicits._
    val df = (Seq(0.0, 1.0, 2.0, 3.0) ++ Seq(50.0)).map(i => (i, i)).toDF("idx", "v")
    val spans = Chunker.chunkSpans(Series("v", df, "idx", "v"),
      fs = Some(1.0), minDur = Some(2.0))
    val rows = spans.collect()
    assert(rows.length == 1) // the singleton chunk at 50 has duration 0
    assert(rows.head.getAs[Double]("__start") == 0.0)
  }

  test("C2: maxDur branch keeps the same schema incl. a true __n recount") {
    val plain = Chunker.chunkSpans(series, fs = Some(1.0))
    val split = Chunker.chunkSpans(series, fs = Some(1.0), maxDur = Some(2.0))
    assert(plain.columns.toSeq == split.columns.toSeq)
    val rows = split.orderBy("__chunk", "__sub").collect()
    // each 5-sample chunk (span 4.0) splits into ceil(4/2)=2 sub-chunks
    assert(rows.length == 4)
    // sub-chunk [0,2] has samples {0,1,2} → n=3; (2,4] → {3,4} counted via
    // inclusive span [2,4] → n=3 (boundary sample shared without overlap)
    assert(rows.forall(_.getAs[Long]("__n") > 0))
    val n0 = rows.head
    assert(n0.getAs[Long]("__n") == 3L) // samples 0,1,2 in [0,2]
  }

  test("keyed chunking sessionizes per entity in parallel") {
    import spark.implicits._
    val df = (Seq(0.0, 1.0, 2.0, 50.0, 51.0).map(("a", _)) ++
      Seq(100.0, 101.0).map(("b", _)))
      .toDF("k", "idx").withColumn("v", col("idx"))
    val spans = Chunker.keyedChunkSpans(df, "k", "idx", "v",
      fs = 1.0, unitPerSec = 1.0)
      .orderBy("k", "__chunk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4))).toSeq
    assert(spans == Seq(
      ("a", 0L, 0.0, 2.0, 3L), ("a", 1L, 50.0, 51.0, 2L),
      ("b", 0L, 100.0, 101.0, 2L)))
  }

  test("chunkData composes per-series fs chunking with range grouping") {
    import spark.implicits._
    // a: gap at 5 (fs 1 -> threshold 1.5) => two chunks; b: one chunk
    val a = Seq(0.0, 1.0, 2.0, 5.0, 6.0).toDF("idx").withColumn("v", col("idx"))
    val b = Seq(0.2, 1.2, 2.1).toDF("idx").withColumn("v", col("idx"))
    val series = Seq(Series("a", a, "idx", "v"), Series("b", b, "idx", "v"))
    val union = Chunker.chunkData(series, fs = Map("a" -> 1.0, "b" -> 1.0))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    assert(union == Seq(("a", 0L), ("a", 1L), ("b", 0L)))
    val matched = Chunker.chunkData(series,
      fs = Map("a" -> 1.0, "b" -> 1.0), margin = Some(0.5))
    // only a's first chunk [0,2] agrees with b's [0.2,2.1] within 0.5
    assert(matched.count() == 1)
  }

  test("C3: tolerance range matching pairs series with agreeing spans") {
    import spark.implicits._
    val a = Seq((0.0, 1.0), (10.0, 1.0)).toDF("idx", "v")
    val b = Seq((0.5, 1.0), (10.2, 1.0)).toDF("idx", "v")
    val sa = Chunker.chunkSpans(Series("a", a, "idx", "v"), fs = Some(1.0),
      gapFactor = 100.0)
    val sb = Chunker.chunkSpans(Series("b", b, "idx", "v"), fs = Some(1.0),
      gapFactor = 100.0)
    val m = Chunker.matchRanges(Seq("a" -> sa, "b" -> sb), margin = 1.0)
    assert(m.count() == 1)
    assert(m.collect().head.getAs[String]("series_a") == "a")
  }
}
