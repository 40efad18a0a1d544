package graft.proc

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Keyed as-of join: merge_asof semantics on a distributed carry. */
class AsofJoinSpec extends SparkSpec {

  private def l(rows: (String, Double)*) = {
    import spark.implicits._
    rows.toSeq.toDF("k", "t")
  }
  private def r(rows: (String, Double, Double)*) = {
    import spark.implicits._
    rows.toSeq.toDF("k", "rt", "v")
  }

  private def run(left: org.apache.spark.sql.DataFrame,
                  right: org.apache.spark.sql.DataFrame,
                  direction: String = "backward",
                  tolerance: Option[Double] = None) =
    AsofJoin.asofJoin(left, right, Seq("k"), "t", "rt",
        direction, tolerance)
      .select(col("k"), col("t"), col("v"))
      .collect().map(x => (x.getString(0), x.getDouble(1),
        if (x.isNullAt(2)) None else Some(x.getDouble(2)))).toSet

  test("backward: last at-or-before per key; unmatched stays null") {
    val out = run(
      l(("a", 1.0), ("a", 5.0), ("a", 9.0), ("b", 4.0)),
      r(("a", 2.0, 20.0), ("a", 5.0, 50.0), ("b", 9.0, 90.0)))
    assert(out == Set(
      ("a", 1.0, None),         // nothing at-or-before 1
      ("a", 5.0, Some(50.0)),   // exact instant matches
      ("a", 9.0, Some(50.0)),
      ("b", 4.0, None)))        // b's only right row is later
  }

  test("forward: first at-or-after per key") {
    val out = run(
      l(("a", 1.0), ("a", 5.0), ("a", 9.0)),
      r(("a", 2.0, 20.0), ("a", 5.0, 50.0)),
      direction = "forward")
    assert(out == Set(
      ("a", 1.0, Some(20.0)),
      ("a", 5.0, Some(50.0)),   // exact instant matches forward too
      ("a", 9.0, None)))
  }

  test("tolerance drops stale matches") {
    val out = run(
      l(("a", 10.0), ("a", 11.0)),
      r(("a", 2.0, 20.0)),
      tolerance = Some(8.0))
    assert(out == Set(("a", 10.0, Some(20.0)), ("a", 11.0, None)))
  }

  test("a carry never leaks across key boundaries") {
    // key "a" has right rows, key "b" (sorted after) has none: with a
    // naive global fill, b's left rows would inherit a's last value
    val out = run(
      l(("b", 100.0), ("b", 200.0)),
      r(("a", 1.0, 10.0), ("a", 150.0, 15.0)))
    assert(out == Set(("b", 100.0, None), ("b", 200.0, None)))
  }

  test("hot key: one key spanning many partitions matches a driver oracle") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val lefts = (0 until 4000).map(_ => ("hot", rng.nextDouble() * 1000))
    val rights = (0 until 1000).map(_ =>
      ("hot", rng.nextDouble() * 1000, rng.nextDouble()))
    val got = run(lefts.toDF("k", "t").repartition(13),
      rights.toDF("k", "rt", "v").repartition(7))
    val sorted = rights.sortBy(_._2)
    val expect = lefts.map { case (k, t) =>
      val m = sorted.takeWhile(_._2 <= t).lastOption.map(_._3)
      (k, t, m)
    }.toSet
    assert(got == expect)
  }

  test("nearest: min |Δt| wins, tie goes backward, one-sided keys work") {
    val out = run(
      l(("a", 5.0), ("a", 6.9), ("a", 1.0), ("b", 4.0), ("c", 9.0)),
      r(("a", 4.0, 40.0), ("a", 8.0, 80.0), ("b", 9.0, 90.0)),
      direction = "nearest")
    assert(out == Set(
      ("a", 5.0, Some(40.0)),  // |5-4|=1 < |8-5|=3
      ("a", 6.9, Some(80.0)),  // |6.9-8|=1.1 < |6.9-4|=2.9
      ("a", 1.0, Some(40.0)),  // only forward exists
      ("b", 4.0, Some(90.0)),  // only forward exists
      ("c", 9.0, None)))       // no right rows for c
  }

  test("nearest: exact tie at equal distance picks the backward row") {
    val out = run(
      l(("a", 5.0)),
      r(("a", 3.0, 30.0), ("a", 7.0, 70.0)),
      direction = "nearest")
    assert(out == Set(("a", 5.0, Some(30.0))))
  }

  test("nearest honors tolerance on both sides") {
    val out = run(
      l(("a", 10.0)),
      r(("a", 4.0, 40.0), ("a", 17.0, 70.0)),
      direction = "nearest", tolerance = Some(5.0))
    // backward Δ=6 and forward Δ=7 both exceed 5 → no match
    assert(out == Set(("a", 10.0, None)))
  }

  test("allowExactMatches=false: backward skips the same-instant row") {
    import spark.implicits._
    def runStrict(direction: String) =
      AsofJoin.asofJoin(
        l(("a", 5.0), ("a", 7.0)), r(("a", 5.0, 50.0), ("a", 2.0, 20.0)),
        Seq("k"), "t", "rt", direction, allowExactMatches = false)
        .select(col("k"), col("t"), col("v"))
        .collect().map(x => (x.getString(0), x.getDouble(1),
          if (x.isNullAt(2)) None else Some(x.getDouble(2)))).toSet
    // backward: t=5 must NOT see rt=5 (strictly before → 20); t=7 sees 50
    assert(runStrict("backward") ==
      Set(("a", 5.0, Some(20.0)), ("a", 7.0, Some(50.0))))
    // forward: t=5 must NOT see rt=5 and nothing is after → None
    assert(runStrict("forward") ==
      Set(("a", 5.0, None), ("a", 7.0, None)))
    // nearest: t=5 → strictly-before 20 (Δ3) vs nothing forward
    assert(runStrict("nearest") ==
      Set(("a", 5.0, Some(20.0)), ("a", 7.0, Some(50.0))))
  }

  test("duplicate right timestamps: the carried payload is deterministic") {
    // three right rows share (k, rt) — the max payload struct must win on
    // EVERY run and partitioning (the r9 arbitrary-tie gap); here that is
    // the row with v = 9.0 (struct ordering reaches the value columns)
    val right = r(("a", 2.0, 3.0), ("a", 2.0, 9.0), ("a", 2.0, 7.0))
    for (parts <- Seq(1, 7, 13)) {
      val out = run(l(("a", 5.0)), right.repartition(parts))
      assert(out == Set(("a", 5.0, Some(9.0))), s"parts=$parts: $out")
    }
  }

  test("nearest differential: hot key over many partitions vs driver oracle") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val lefts = (0 until 3000).map(_ => ("hot", rng.nextDouble() * 1000))
    val rights = (0 until 800).map(_ =>
      ("hot", rng.nextDouble() * 1000, rng.nextDouble()))
    val got = run(lefts.toDF("k", "t").repartition(13),
      rights.toDF("k", "rt", "v").repartition(7), direction = "nearest")
    val sorted = rights.sortBy(_._2)
    val expect = lefts.map { case (k, t) =>
      val back = sorted.takeWhile(_._2 <= t).lastOption
      val fwd = sorted.find(_._2 >= t)
      val m = (back, fwd) match {
        case (Some(b), Some(f)) =>
          if (t - b._2 <= f._2 - t) Some(b._3) else Some(f._3)
        case (b, f) => b.orElse(f).map(_._3)
      }
      (k, t, m)
    }.toSet
    assert(got == expect)
  }

  test("plan: the carry window is partitioned (no single-task as-of)") {
    val big = {
      import spark.implicits._
      (0 until 1000).map(i => ("k", i.toDouble)).toDF("k", "t")
    }
    val out = AsofJoin.asofJoin(big, r(("k", 1.0, 1.0)), Seq("k"), "t", "rt")
    val windows = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      val parts = w.partitionSpec.map(_.sql).mkString(",")
      assert(parts.contains("__pid"),
        s"as-of window partitioned only by [$parts]")
    }
  }

  test("reserved internal column names are rejected with a clear message") {
    import spark.implicits._
    val l = Seq((1L, 1.0)).toDF("k", "t")
    // right VALUE columns live only inside the carry struct, so they clash
    // solely with its __k/__t0 sibling fields
    for (bad <- Seq("__k", "__t0")) {
      val r = Seq((1L, 1.0, "x")).toDF("k", "t", bad)
      val e = intercept[IllegalArgumentException](
        AsofJoin.asofJoin(l, r, Seq("k"), "t", "t"))
      assert(e.getMessage.contains("reserved"), s"$bad: ${e.getMessage}")
    }
    // a reserved KEY column is caught against the full top-level set
    for (bad <- Seq("__t", "__side", "__lp", "__rp", "__fv", "__k", "__t0")) {
      val l2 = l.withColumnRenamed("k", bad)
      val r2 = Seq((1L, 1.0, 2.0)).toDF(bad, "t", "v")
      val e2 = intercept[IllegalArgumentException](
        AsofJoin.asofJoin(l2, r2, Seq(bad), "t", "t"))
      assert(e2.getMessage.contains("reserved"), s"key $bad: ${e2.getMessage}")
    }
  }

  test("a right VALUE column named like a top-level helper is legal") {
    import spark.implicits._
    // regression: the r8 guard over-rejected these — they never surface
    // top-level (only as carry-struct fields), so the join must accept them
    val l = Seq((1L, 1.0)).toDF("k", "t")
    for (ok <- Seq("__t", "__side", "__lp", "__rp", "__fv")) {
      val r = Seq((1L, 0.5, 42.0)).toDF("k", "t", ok)
      val out = AsofJoin.asofJoin(l, r, Seq("k"), "t", "t")
      assert(out.collect().map(_.getAs[Double](ok)).toSeq == Seq(42.0), ok)
    }
  }
}
