package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec
import graft.core._

/** Streaming extension: rolling features and session chunking over a
  * MemoryStream, checked against hand-computed window values.
  */
class StreamingFeaturesSpec extends SparkSpec {
  import FeatureFuncs._

  test("rolling mean over a stream matches the batch windows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(Long, Double)]
    // minutes 0..9 at value = minute index, epoch-aligned
    ms.addData((0 until 10).map(i => (i * 60000000L, i.toDouble)))
    val sdf = ms.toDF().select(timestamp_micros(col("_1")).as("ts"),
      col("_2").as("v"))
    val out = StreamingFeatures.rolling(sdf, "ts", "v", "v",
      Win.time("5m").asInstanceOf[TimeWin], Win.time("5m").asInstanceOf[TimeWin],
      Seq(mean, len))
    val q = out.writeStream.format("memory").queryName("roll")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("roll")
      .select(unix_micros(col("ts")), col("`v__mean__w=5m`"), col("`v__len__w=5m`"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    // two tumbling 5m windows: [0,5m) mean 2, [5m,10m) mean 7
    assert(rows == Seq((300000000L, 2.0, 5L), (600000000L, 7.0, 5L)))
  }

  test("grid offset reproduces the batch engine's data-anchored windows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // data starts at t=100s; batch anchors windows at the data min, the
    // stream grid at the epoch — offset (s0 mod window) aligns them
    val tsUs = (0 until 10).map(i => 100000000L + i * 30000000L) // 100s + k*30s
    val batch = {
      val df = tsUs.toDF("us").select(timestamp_micros(col("us")).as("ts"),
        (col("us") / 1e6).as("v"))
      val fc = graft.api.FeatureCollection(graft.api.FeatureDescriptor(
        mean, "v", Some(Win.time("1m")), Some(Seq(Win.time("1m")))))
      fc.calculate(Seq(graft.core.Series("v", df, "ts", "v")))
        .select(unix_micros(col("ts")), col("`v__mean__w=1m`"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    }
    val ms = MemoryStream[(Long, Double)]
    ms.addData(tsUs.map(t => (t, t / 1e6)))
    val sdf = ms.toDF().select(timestamp_micros(col("_1")).as("ts"),
      col("_2").as("v"))
    val out = StreamingFeatures.rolling(sdf, "ts", "v", "v",
      Win.time("1m").asInstanceOf[TimeWin], Win.time("1m").asInstanceOf[TimeWin],
      Seq(mean), offset = Some("40 seconds")) // 100s mod 60s
    val q = out.writeStream.format("memory").queryName("gridroll")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("gridroll")
      .select(unix_micros(col("ts")), col("`v__mean__w=1m`"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    // batch generates nb = floor((end-start-w)/s)+1 windows; the stream emits
    // every grid window touched by data (incl. the final partial one) — the
    // common prefix must agree exactly
    assert(streamed.take(batch.length) == batch)
  }

  test("session chunking splits on inactivity gaps") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(String, Long, Double)]
    // series "a": two bursts separated by 1 hour; series "b": one burst
    // overlapping a's gap; gap threshold 10 minutes
    ms.addData(
      Seq(0L, 60000000L, 120000000L, 3720000000L, 3780000000L).map(t => ("a", t, 1.0)) ++
        Seq(1000000000L, 1060000000L).map(t => ("b", t, 1.0)))
    val sdf = ms.toDF().select(col("_1").as("series"),
      timestamp_micros(col("_2")).as("ts"), col("_3").as("v"))
    val out = StreamingFeatures.chunkSessions(sdf, "ts", "v",
      Win.time("10m").asInstanceOf[TimeWin], Seq("series"))
    val q = out.writeStream.format("memory").queryName("chunks")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("chunks")
      .select(col("series"), unix_micros(col("__start")),
        unix_micros(col("__end")), col("__n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(rows == Seq(
      ("a", 0L, 120000000L, 3L), ("a", 3720000000L, 3780000000L, 2L),
      ("b", 1000000000L, 1060000000L, 2L)))
  }

  test("keyed rolling partitions state per entity") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(String, Long, Double)]
    // key a: minutes 0..4 value 1; key b: minutes 0..4 value 3
    ms.addData((0 until 5).flatMap(i =>
      Seq(("a", i * 60000000L, 1.0), ("b", i * 60000000L, 3.0))))
    val sdf = ms.toDF().select(col("_1").as("k"),
      timestamp_micros(col("_2")).as("ts"), col("_3").as("v"))
    val out = StreamingFeatures.rolling(sdf, "ts", "v", "v",
      Win.time("5m").asInstanceOf[TimeWin], Win.time("5m").asInstanceOf[TimeWin],
      Seq(mean), keyCols = Seq("k"))
    val q = out.writeStream.format("memory").queryName("keyedroll")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("keyedroll")
      .select(col("k"), unix_micros(col("ts")), col("`v__mean__w=5m`"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(rows == Seq(("a", 300000000L, 1.0), ("b", 300000000L, 3.0)))
  }

  test("streaming exact dedup drops re-seen content within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(Long, String)]
    // "b a" normalizes to the same word bag as "a b" -> dropped as a dup
    ms.addData(Seq(
      (0L, "a b"), (60000000L, "b a"), (120000000L, "c d"), (180000000L, "a b")))
    val sdf = ms.toDF().select(timestamp_micros(col("_1")).as("ts"),
      col("_2").as("text"))
    val out = StreamingFeatures.dedupExact(sdf, "ts", "text", "10 minutes")
    val q = out.writeStream.format("memory").queryName("dedupstream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    // which of the equivalent duplicates survives is batch-order-dependent;
    // the CONTRACT is one row per normalized word bag
    val got = spark.table("dedupstream").select("text")
      .collect().map(_.getString(0).split("\\s+").sorted.mkString(" "))
      .sorted.toSeq
    assert(got == Seq("a b", "c d"))
  }

  test("consecutive runs close on group change across batches and on timeout") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(String, Long, String, Double)]
    val sdf = ms.toDF().select(col("_1").as("k"),
      timestamp_micros(col("_2")).as("ts"), col("_3").as("g"),
      col("_4").as("v"))
    val out = StreamingFeatures.consecutiveRuns(sdf, "ts", "k", "g", "v",
      watermark = "10 minutes", closeAfter = Win.time("1m").asInstanceOf[TimeWin])
    val q = out.writeStream.format("memory").queryName("runs")
      .outputMode("append").start()
    // day-1 base: a ts equal to the INITIAL watermark (epoch 0) would be
    // dropped as late before reaching the state machine
    // batch 1: run x closes in-batch when y arrives; run y stays open
    ms.addData(Seq(("a", sec(0), "x", 0.0), ("a", sec(60), "x", 60.0),
      ("a", sec(120), "y", 120.0)))
    q.processAllAvailable()
    // batch 2: y extends ACROSS the batch boundary, then z closes it; the
    // "wm" key only exists to advance the event-time watermark later
    ms.addData(Seq(("a", sec(180), "y", 180.0), ("a", sec(240), "z", 240.0),
      ("wm", sec(300), "w", 0.0)))
    q.processAllAvailable()
    // batches 3+4: no more "a" rows — z must close by TIMEOUT once the
    // watermark (max event time - 10 min) passes its end + closeAfter
    ms.addData(Seq(("wm", sec(3600), "w", 0.0)))
    q.processAllAvailable()
    ms.addData(Seq(("wm", sec(7200), "w", 0.0)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("runs").where(col("key") === "a")
      .select(col("group"), unix_micros(col("run_start")),
        unix_micros(col("run_end")), col("n"), col("sum"), col("min"),
        col("max"), col("mean"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7)))
      .sortBy(_._2).toSeq
    assert(rows == Seq(
      ("x", sec(0), sec(60), 2L, 60.0, 0.0, 60.0, 30.0),
      ("y", sec(120), sec(180), 2L, 300.0, 120.0, 180.0, 150.0),
      ("z", sec(240), sec(240), 1L, 240.0, 240.0, 240.0, 240.0)))
  }

  test("consecutive runs split on in-batch gaps and absorb late rows into bounds") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(String, Long, String, Double)]
    val sdf = ms.toDF().select(col("_1").as("k"),
      timestamp_micros(col("_2")).as("ts"), col("_3").as("g"),
      col("_4").as("v"))
    val out = StreamingFeatures.consecutiveRuns(sdf, "ts", "k", "g", "v",
      watermark = "30 minutes", closeAfter = Win.time("1m").asInstanceOf[TimeWin])
    val q = out.writeStream.format("memory").queryName("runs2")
      .outputMode("append").start()
    // ONE batch: same group, but a 2h gap > closeAfter — the in-batch fold
    // must split it exactly like the cross-batch timeout would (output must
    // not depend on how rows happen to be micro-batched)
    ms.addData(Seq(("a", sec(0), "x", 1.0), ("a", sec(30), "x", 2.0),
      ("a", sec(7200), "x", 3.0), ("a", sec(7230), "y", 4.0)))
    q.processAllAvailable()
    // batch 2: a LATE same-group row (t=7210s, before the open y-run's
    // start but within the 30m watermark)... different group, so y closes;
    // and a late x-extension cannot happen (x already closed in-batch) —
    // instead check late-row bound absorption on a fresh key
    ms.addData(Seq(("b", sec(7300), "w", 9.0)))
    q.processAllAvailable()
    ms.addData(Seq(("b", sec(7250), "w", 1.0))) // late, pulls run_start back
    q.processAllAvailable()
    ms.addData(Seq(("b", sec(20000), "z", 0.0))) // closes b's w-run by group change
    q.processAllAvailable()
    q.stop()
    val a = spark.table("runs2").where(col("key") === "a")
      .select(col("group"), unix_micros(col("run_start")),
        unix_micros(col("run_end")), col("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._2).toSeq
    // the tail y-run also closes, by timeout, once later batches push the
    // watermark past its end + closeAfter
    assert(a == Seq(("x", sec(0), sec(30), 2L), ("x", sec(7200), sec(7200), 1L),
      ("y", sec(7230), sec(7230), 1L)))
    val b = spark.table("runs2").where(col("key") === "b" && col("group") === "w")
      .select(unix_micros(col("run_start")), unix_micros(col("run_end")),
        col("n"), col("sum"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    // the late 7250s row must be INSIDE the run's bounds and aggregates
    assert(b == Seq((sec(7250), sec(7300), 2L, 10.0)))
  }

  test("grossly-late stragglers fold into one closed run, open run intact") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(String, Long, String, Double)]
    val sdf = ms.toDF().select(col("_1").as("k"),
      timestamp_micros(col("_2")).as("ts"), col("_3").as("g"),
      col("_4").as("v"))
    val out = StreamingFeatures.consecutiveRuns(sdf, "ts", "k", "g", "v",
      watermark = "60 minutes", closeAfter = Win.time("1m").asInstanceOf[TimeWin])
    val q = out.writeStream.format("memory").queryName("runs3")
      .outputMode("append").start()
    ms.addData(Seq(("c", sec(7000), "x", 1.0), ("c", sec(7030), "x", 2.0)))
    q.processAllAvailable()
    // > closeAfter before the open run's start, within the watermark: must
    // NOT close the run, must NOT pull its start back. The two stragglers
    // are within closeAfter of EACH OTHER, so they fold into one closed
    // run (what a batch replay makes of that island), not two singletons.
    ms.addData(Seq(("c", sec(5000), "x", 7.0), ("c", sec(5030), "x", 5.0)))
    q.processAllAvailable()
    // still extends the ORIGINAL run (gap exactly closeAfter from 7030)
    ms.addData(Seq(("c", sec(7090), "x", 3.0)))
    q.processAllAvailable()
    ms.addData(Seq(("c", sec(20000), "y", 0.0))) // closes the x-run
    q.processAllAvailable()
    q.stop()
    val got = spark.table("runs3").where(col("key") === "c" && col("group") === "x")
      .select(unix_micros(col("run_start")), unix_micros(col("run_end")),
        col("n"), col("sum"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    assert(got == Seq((sec(5000), sec(5030), 2L, 12.0),
      (sec(7000), sec(7090), 3L, 6.0)))
  }

  test("fromWallClock converts an NTZ stream to instants (strict DST)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[String]
    // Brussels wall 12:00 = 11:00 UTC (CET, winter)
    ms.addData("2024-01-15 12:00:00")
    val sdf = ms.toDF().select(col("value")
      .cast(org.apache.spark.sql.types.TimestampNTZType).as("ts"))
    val out = StreamingFeatures.fromWallClock(sdf, "ts", "Europe/Brussels")
    val q = out.writeStream.format("memory").queryName("wallstream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("wallstream")
      .select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1705316400000000L)) // 2024-01-15T11:00:00Z
  }

  // ---- batch ≡ stream differentials over REAL replayed events ------------
  // The tests below replay /root/testdata/sf0.001/events.parquet (1000
  // rows, 15 users, 30 days) through a MemoryStream in three chronological
  // micro-batches and compare the streaming operators' output against the
  // BATCH engine (KeyedFeatures) on the same input — not hand-computed
  // values, the actual q12/q44/q72-class plans.

  /** sf0.001 events as (tsUs, user, group, value), chronologically sorted. */
  private def realEvents: Seq[(Long, Long, String, Double)] = {
    val df = graft.core.TsCompat.readEvents(spark,
      "/root/testdata/sf0.001/events.parquet")
    df.select(unix_micros(col("ts")), col("user_id"), col("event_type"),
        col("value"))
      .where(col("ts").isNotNull && col("user_id").isNotNull &&
        col("event_type").isNotNull && col("value").isNotNull)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
  }

  /** Replay `rows` in three chronological micro-batches through `build`,
    * collecting the append-mode output of query `name`. */
  private def replay[T <: Product : org.apache.spark.sql.Encoder](
      rows: Seq[T], name: String)(
      build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[T]
    val out = build(ms.toDF())
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    val third = (rows.length + 2) / 3
    try rows.grouped(third).foreach { chunk =>
      ms.addData(chunk); q.processAllAvailable()
    } finally q.stop()
    spark.table(name)
  }

  test("consecutiveRuns ≡ batch group_by_consecutive on replayed sf0.001 events") {
    import FeatureFuncs.{len, sum => fsum, min => fmin, max => fmax, mean => fmean}
    import spark.implicits._
    val rows = realEvents
    val globalSpanOk = "43200 days" // > the 30-day span: no gap splits,
                                    // no timeouts — runs close on group
                                    // change only, exactly the batch rule
    val streamed = replay(rows, "g3diff") { sdf =>
      val df = sdf.select(timestamp_micros(col("_1")).as("ts"),
        col("_2").as("user_id"), col("_3").as("event_type"),
        col("_4").as("value"))
      StreamingFeatures.consecutiveRuns(df, "ts", "user_id", "event_type",
        "value", watermark = "0 seconds",
        closeAfter = Win.time(globalSpanOk).asInstanceOf[TimeWin])
    }.select(col("key"), col("group"), unix_micros(col("run_start")),
        unix_micros(col("run_end")), col("n"), round(col("sum"), 6),
        col("min"), col("max"), round(col("mean"), 6))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7), r.getDouble(8))).toSeq

    // batch side: the real G3 operator on the same input
    val bdf = rows.toDF("us", "user_id", "event_type", "value")
      .select(timestamp_micros(col("us")).as("ts"), col("user_id"),
        col("event_type"), col("value"))
    val batch = graft.api.KeyedFeatures.calculateGroupByConsecutive(
      bdf, "user_id", "ts", "event_type",
      Seq("value" -> len, "value" -> fsum, "value" -> fmin,
        "value" -> fmax, "value" -> fmean))
      .select(col("user_id").cast("string"), col("event_type"),
        unix_micros(col("__start")), unix_micros(col("__end")),
        col("`value__len__w=manual`").cast("long"),
        round(col("`value__sum__w=manual`"), 6),
        col("`value__min__w=manual`"), col("`value__max__w=manual`"),
        round(col("`value__mean__w=manual`"), 6))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7), r.getDouble(8))).toSeq

    // the stream can never close each key's LAST run (nothing follows it
    // and the timeout sits beyond the final watermark) — every other run
    // must match the batch operator exactly
    val lastEndPerKey = batch.groupBy(_._1).view.mapValues(_.map(_._4).max).toMap
    val expectable = batch.filterNot(b => b._4 == lastEndPerKey(b._1))
    assert(expectable.size >= 50,
      s"differential vacuous: only ${expectable.size} closable batch runs")
    // SORTED-SEQ compare, not sets: a regression that double-emits a run
    // (e.g. finish without state.remove) must not be hidden by dedup
    val sGot = streamed.sorted
    val sWant = expectable.sorted
    assert(sGot == sWant,
      s"stream-only: ${sGot.diff(sWant).take(3)}\n" +
        s"batch-only: ${sWant.diff(sGot).take(3)}")
  }

  test("rollingMulti ≡ batch calculateWideMulti on replayed sf0.001 events") {
    import FeatureFuncs.{len, mean => fmean}
    import spark.implicits._
    val H6 = 6L * 3600 * 1000000
    // align each user's data anchor to the stream's epoch grid: batch
    // windows anchor at the key's min ts, the stream grid at the epoch —
    // shifting every row of a user by (min ts mod slide) makes the two
    // window vocabularies coincide WITHOUT changing any window's content
    val raw = realEvents
    val phase = raw.groupBy(_._2).view.mapValues(_.map(_._1).min % H6).toMap
    val rows = raw.map(t => (t._1 - phase(t._2), t._2, t._4)).sortBy(_._1)

    val streamed = replay(rows, "multidiff") { sdf =>
      val df = sdf.select(timestamp_micros(col("_1")).as("ts"),
        col("_2").as("user_id"), col("_3").as("value"))
      StreamingFeatures.rollingMulti(df, "ts", "value", "value",
        Seq((Win.time("6h").asInstanceOf[TimeWin],
             Win.time("6h").asInstanceOf[TimeWin]),
            (Win.time("1D").asInstanceOf[TimeWin],
             Win.time("6h").asInstanceOf[TimeWin])),
        Seq(len, fmean), watermark = Some("0 seconds"),
        keyCols = Seq("user_id"))
    }.select(col("user_id"), unix_micros(col("ts")), col("win"),
        col("len"), round(col("mean"), 6))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)) ->
        (r.getLong(3), r.getDouble(4))).toSeq

    // batch side: the real q72 operator (wide) on the same shifted input,
    // reshaped long over the two windows
    val bdf = rows.toDF("us", "user_id", "value")
      .select(timestamp_micros(col("us")).as("ts"), col("user_id"),
        col("value"))
    val wide = graft.api.KeyedFeatures.calculateWideMulti(
      bdf, "user_id", "ts",
      Seq((Win.time("6h"): Win) -> Seq(Win.time("6h"): Win),
          (Win.time("1D"): Win) -> Seq(Win.time("6h"): Win)),
      unary = Seq("value" -> len, "value" -> fmean))
    val batch = Seq("6h", "1D").flatMap { w =>
      wide.select(col("user_id"), unix_micros(col("ts")), lit(w),
          col(s"`value__len__w=$w`").cast("long"),
          round(col(s"`value__mean__w=$w`"), 6))
        .where(col(s"`value__len__w=$w`") > 0) // the stream emits no
          // empty-window rows (W7 is a batch-only contract)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)) ->
          (r.getLong(3), r.getDouble(4)))
    }
    assert(batch.size >= 300, s"differential vacuous: ${batch.size} windows")
    // duplicate emissions must fail loudly, not be collapsed by the map
    assert(streamed.map(_._1).distinct.size == streamed.size,
      "stream emitted duplicate (key, anchor, win) rows")
    val streamedMap = streamed.toMap
    // every batch window must be present in the stream with equal values
    // (the stream additionally emits leading/trailing PARTIAL grid windows
    // the batch vocabulary excludes — those are its documented contract)
    val missing = batch.filter { case (k, v) => !streamedMap.get(k).contains(v) }
    assert(missing.isEmpty,
      s"${missing.size} batch windows missing/unequal in stream; first 3: " +
        missing.take(3).map { case (k, v) =>
          s"$k batch=$v stream=${streamedMap.get(k)}" }.mkString("; "))
  }

  // ---- late-data contract (rows arriving BEYOND the watermark) ----------
  // The in-watermark disorder contracts are pinned above (bound absorption,
  // grossly-late singleton islands). These three tests pin the other side:
  // once the watermark has passed an event time, a row bearing it is
  // DROPPED by the stateful operator — finalized windows/runs never change
  // retroactively, and no new output row appears for the stale region.
  // Delivery is deliberately spread across micro-batches (and one test
  // mixes the late row into a batch with fresh rows) so the contract is
  // exercised under shuffled batch boundaries, not just a clean tail.

  private def sec(s: Long) = (86400L + s) * 1000000L

  test("rolling drops rows beyond the watermark; finalized windows stand") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(Long, Double)]
    val sdf = ms.toDF().select(timestamp_micros(col("_1")).as("ts"),
      col("_2").as("v"))
    val out = StreamingFeatures.rolling(sdf, "ts", "v", "v",
      Win.time("5m").asInstanceOf[TimeWin], Win.time("5m").asInstanceOf[TimeWin],
      Seq(FeatureFuncs.mean, FeatureFuncs.len), watermark = Some("10 minutes"))
    val q = out.writeStream.format("memory").queryName("lateroll")
      .outputMode("append").start()
    // window [0,5m): two rows
    ms.addData(Seq((sec(0), 10.0), (sec(60), 20.0)))
    q.processAllAvailable()
    // advance the watermark to 4000-600 = 3400s — [0,5m) finalizes + emits
    ms.addData(Seq((sec(4000), 1.0)))
    q.processAllAvailable()
    // a row for the finalized window, now BEYOND the watermark, mixed into
    // a batch with a fresh row: must be dropped, not re-open the window
    ms.addData(Seq((sec(30), 999.0), (sec(4060), 2.0)))
    q.processAllAvailable()
    // flush the tail windows too
    ms.addData(Seq((sec(9000), 0.0)))
    q.processAllAvailable()
    q.stop()
    val w0 = spark.table("lateroll")
      .where(unix_micros(col("ts")) === sec(300))
      .select(col("`v__mean__w=5m`"), col("`v__len__w=5m`"))
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    // exactly ONE emission for [0,5m), and without the late 999.0 row
    assert(w0 == Seq((15.0, 2L)),
      s"finalized window changed after a beyond-watermark row: $w0")
  }

  test("rollingMulti drops beyond-watermark rows in every branch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(Long, Double)]
    val sdf = ms.toDF().select(timestamp_micros(col("_1")).as("ts"),
      col("_2").as("v"))
    val out = StreamingFeatures.rollingMulti(sdf, "ts", "v", "v",
      Seq((Win.time("5m").asInstanceOf[TimeWin],
           Win.time("5m").asInstanceOf[TimeWin]),
          (Win.time("10m").asInstanceOf[TimeWin],
           Win.time("5m").asInstanceOf[TimeWin])),
      Seq(FeatureFuncs.len), watermark = Some("10 minutes"))
    val q = out.writeStream.format("memory").queryName("latemulti")
      .outputMode("append").start()
    ms.addData(Seq((sec(0), 10.0), (sec(60), 20.0)))
    q.processAllAvailable()
    ms.addData(Seq((sec(4000), 1.0))) // watermark → 3400s, early wins final
    q.processAllAvailable()
    ms.addData(Seq((sec(30), 999.0))) // beyond-watermark, alone in a batch
    q.processAllAvailable()
    ms.addData(Seq((sec(9000), 0.0)))
    q.processAllAvailable()
    q.stop()
    // the 5m branch's [0,5m) window and the 10m sliding branch's windows
    // ending at 5m and 10m all cover sec(0)/sec(60): each counts exactly 2
    val rows = spark.table("latemulti")
      .where(unix_micros(col("ts")).isin(sec(300), sec(600)))
      .select(col("win"), unix_micros(col("ts")), col("len"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(rows == Seq(("10m", sec(300), 2L), ("10m", sec(600), 2L),
      ("5m", sec(300), 2L)),
      s"beyond-watermark row leaked into a branch: $rows")
  }

  test("consecutiveRuns drops beyond-watermark rows; closed runs stand") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ms = MemoryStream[(String, Long, String, Double)]
    val sdf = ms.toDF().select(col("_1").as("k"),
      timestamp_micros(col("_2")).as("ts"), col("_3").as("g"),
      col("_4").as("v"))
    val out = StreamingFeatures.consecutiveRuns(sdf, "ts", "k", "g", "v",
      watermark = "10 minutes", closeAfter = Win.time("1m").asInstanceOf[TimeWin])
    val q = out.writeStream.format("memory").queryName("lateruns")
      .outputMode("append").start()
    // run x over [0,30s], closed in-batch by the group change to y
    ms.addData(Seq(("a", sec(0), "x", 1.0), ("a", sec(30), "x", 2.0),
      ("a", sec(120), "y", 5.0)))
    q.processAllAvailable()
    // push the watermark far past x (and y): 7200-600 = 6600s
    ms.addData(Seq(("wm", sec(7200), "w", 0.0)))
    q.processAllAvailable()
    // a beyond-watermark x-extension: the operator's input filter drops it
    // BEFORE the state machine — it must neither re-open x, nor emit a
    // grossly-late singleton (that contract is for IN-watermark islands),
    // nor perturb any aggregate
    ms.addData(Seq(("a", sec(60), "x", 100.0)))
    q.processAllAvailable()
    ms.addData(Seq(("wm", sec(20000), "w", 0.0))) // flush tails by timeout
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("lateruns").where(col("key") === "a")
      .select(col("group"), unix_micros(col("run_start")),
        unix_micros(col("run_end")), col("n"), col("sum"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
      .sortBy(_._2).toSeq
    assert(rows == Seq(("x", sec(0), sec(30), 2L, 3.0),
      ("y", sec(120), sec(120), 1L, 5.0)),
      s"beyond-watermark row changed closed-run output: $rows")
  }
}
