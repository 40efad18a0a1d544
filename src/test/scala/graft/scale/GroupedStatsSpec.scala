package graft.scale

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Exact grouped quantiles: keyedRank layout, percentile-exact results. */
class GroupedStatsSpec extends SparkSpec {

  test("matches groupBy(percentile) exactly on random data") {
    import spark.implicits._
    val rng = new scala.util.Random(23)
    val df = (0 until 5000).map(_ =>
      (s"k${rng.nextInt(7)}", rng.nextDouble() * 100)).toDF("k", "v")
      .repartition(11)
    val got = GroupedStats.exactQuantiles(df, "k", "v",
        Seq("med" -> 0.5, "p90" -> 0.9, "min" -> 0.0, "max" -> 1.0))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val exp = df.groupBy("k").agg(
        percentile(col("v"), lit(0.5)), percentile(col("v"), lit(0.9)),
        percentile(col("v"), lit(0.0)), percentile(col("v"), lit(1.0)))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.keySet == exp.keySet)
    for (k <- got.keySet; (g, e) <- Seq(got(k)._1 -> exp(k)._1,
        got(k)._2 -> exp(k)._2, got(k)._3 -> exp(k)._3, got(k)._4 -> exp(k)._4))
      assert(math.abs(g - e) < 1e-9, s"key $k: $g vs $e")
  }

  test("edges: single-row key, even count, ties, null exclusion") {
    import spark.implicits._
    val df = Seq(
      ("one", Some(7.0)),
      ("even", Some(1.0)), ("even", Some(3.0)),
      ("tie", Some(5.0)), ("tie", Some(5.0)), ("tie", Some(9.0)),
      ("null", Some(2.0)), ("null", None)).toDF("k", "v")
    val out = GroupedStats.exactMedian(df, "k", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("one" -> 7.0, "even" -> 2.0, "tie" -> 5.0, "null" -> 2.0))
  }

  test("a key whose values are ALL null surfaces with null quantiles") {
    import spark.implicits._
    val df = Seq(
      ("live", Some(1.0)), ("live", Some(3.0)),
      ("dead", None), ("dead", None)).toDF("k", "v")
    val rows = GroupedStats.exactMedian(df, "k", "v")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    // SQL GROUP BY convention: the all-null key keeps its row, quantile null
    assert(rows == Map("live" -> Some(2.0), "dead" -> None))
  }

  test("an actual NULL key with non-null values keeps its quantiles") {
    import spark.implicits._
    // regression: the all-null-key re-attach join must be null-safe (<=>) —
    // a plain using-join would drop the NULL key's own aggregated row
    val df = Seq(
      (Option("live"), Some(1.0)), (Option("live"), Some(3.0)),
      (Option.empty[String], Some(10.0)), (Option.empty[String], Some(20.0)),
      (Option.empty[String], None)).toDF("k", "v")
    val rows = GroupedStats.exactMedian(df, "k", "v")
      .collect().map(r => Option(r.getString(0)) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(rows == Map(Some("live") -> Some(2.0), None -> Some(15.0)))
  }

  test("multi-column: one row per key, per-metric quantiles, null metrics") {
    import spark.implicits._
    val df = Seq(
      (Option("a"), Some(1.0), Some(10.0)),
      (Option("a"), Some(3.0), Some(30.0)),
      (Option("a"), Some(5.0), None),
      (Option("b"), Some(2.0), Option.empty[Double]), // y all-null for b
      (Option.empty[String], Some(4.0), Some(8.0)),   // NULL key
      (Option("dead"), Option.empty[Double], Option.empty[Double]))
      .toDF("k", "x", "y")
    val out = GroupedStats.exactQuantilesMulti(df, "k", Seq("x", "y"),
      Seq("med" -> 0.5, "max" -> 1.0))
    assert(out.columns.toSeq ==
      Seq("k", "q_x_med", "q_x_max", "q_y_med", "q_y_max"))
    val rows = out.collect().map { r =>
      Option(r.getString(0)) -> (1 to 4).map(i =>
        if (r.isNullAt(i)) None else Some(r.getDouble(i)))
    }.toMap
    assert(rows(Some("a")) == Seq(Some(3.0), Some(5.0), Some(20.0), Some(30.0)))
    assert(rows(Some("b")) == Seq(Some(2.0), Some(2.0), None, None))
    assert(rows(None) == Seq(Some(4.0), Some(4.0), Some(8.0), Some(8.0)))
    assert(rows(Some("dead")) == Seq(None, None, None, None))
  }

  test("multi-column matches per-column exactQuantiles on random data") {
    import spark.implicits._
    val rng = new scala.util.Random(31)
    val df = (0 until 3000).map(_ => (s"k${rng.nextInt(5)}",
        rng.nextDouble() * 100, rng.nextGaussian())).toDF("k", "x", "y")
      .repartition(7)
    val qs = Seq("p25" -> 0.25, "med" -> 0.5, "p95" -> 0.95)
    val multi = GroupedStats.exactQuantilesMulti(df, "k", Seq("x", "y"), qs)
      .collect().map(r => r.getString(0) ->
        (1 to 6).map(r.getDouble).toVector).toMap
    val sx = GroupedStats.exactQuantiles(df, "k", "x", qs).collect()
      .map(r => r.getString(0) -> (1 to 3).map(r.getDouble).toVector).toMap
    val sy = GroupedStats.exactQuantiles(df, "k", "y", qs).collect()
      .map(r => r.getString(0) -> (1 to 3).map(r.getDouble).toVector).toMap
    assert(multi.keySet == sx.keySet)
    for (k <- multi.keySet; (g, e) <- multi(k).zip(sx(k) ++ sy(k)))
      assert(math.abs(g - e) < 1e-9, s"key $k: $g vs $e")
  }

  test("higuchiFd matches a driver brute-force of the antropy formula") {
    import spark.implicits._
    def brute(x: Vector[Double], kMax: Int): Option[Double] = {
      val nN = x.length
      val pts = (1 to kMax).flatMap { k =>
        val lmks = (0 until k).flatMap { m =>
          val cnt = (nN - 1 - m) / k
          if (cnt < 1) None
          else {
            val s = (1 to cnt).map(i => math.abs(x(m + i * k) - x(m + (i - 1) * k))).sum
            Some(s * (nN - 1) / (cnt.toDouble * k) / k)
          }
        }
        if (lmks.isEmpty) None
        else {
          val lk = lmks.sum / lmks.size
          if (lk > 0) Some((math.log(1.0 / k), math.log(lk))) else None
        }
      }
      if (pts.size < 2) None
      else {
        val n = pts.size.toDouble
        val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
        val sxy = pts.map(p => p._1 * p._2).sum
        val sxx = pts.map(p => p._1 * p._1).sum
        val den = n * sxx - sx * sx
        if (den > 0) Some((n * sxy - sx * sy) / den) else None
      }
    }
    val rng = new scala.util.Random(41)
    val series = Map(
      "walk" -> Vector.iterate(0.0, 120)(v => v + rng.nextGaussian()),
      "noise" -> Vector.fill(90)(rng.nextDouble() * 10),
      "line" -> (0 until 60).map(_.toDouble).toVector,
      "short" -> Vector(1.0, 5.0),
      "flat" -> Vector.fill(40)(3.14))
    val df = series.toSeq.flatMap { case (k, xs) =>
      xs.zipWithIndex.map { case (v, i) => (k, i.toLong, v) }
    }.toDF("k", "idx", "v").repartition(7)
    val got = GroupedStats.higuchiFd(df, "k", "idx", "v", 10)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    for ((name, xs) <- series) {
      val exp = brute(xs, 10)
      (got(name), exp) match {
        case (Some(g), Some(e)) => assert(math.abs(g - e) < 1e-9, s"$name: $g vs $e")
        case (g, e) => assert(g == e, s"$name: $g vs $e")
      }
    }
    // sanity: a diffusive walk is rougher than a straight line
    assert(got("line").get < got("walk").get)
  }

  test("dfa matches a driver brute-force; noise ~0.5, walk ~1.5") {
    import spark.implicits._
    def brute(x: Vector[Double], ns: Seq[Int]): Option[Double] = {
      val mu = x.sum / x.length
      val y = x.scanLeft(0.0)((a, v) => a + (v - mu)).tail
      val pts = ns.flatMap { bn =>
        val nb = x.length / bn
        if (nb < 1) None
        else {
          val vs = (0 until nb).map { b =>
            val idx = (b * bn until (b + 1) * bn).map(_.toDouble)
            val yy = (b * bn until (b + 1) * bn).map(y)
            val c = bn.toDouble
            val (sp, spp) = (idx.sum, idx.map(t => t * t).sum)
            val (sy, syy) = (yy.sum, yy.map(t => t * t).sum)
            val spy = idx.zip(yy).map(p => p._1 * p._2).sum
            val sxx = spp - sp * sp / c
            val rss = math.max(
              (syy - sy * sy / c) - math.pow(spy - sp * sy / c, 2) / sxx, 0.0)
            rss / c
          }
          val f = math.sqrt(vs.sum / vs.size)
          if (f > 0) Some((math.log(bn.toDouble), math.log(f))) else None
        }
      }
      if (pts.size < 2) None
      else {
        val c = pts.size.toDouble
        val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
        val sxy = pts.map(p => p._1 * p._2).sum
        val sxx = pts.map(p => p._1 * p._1).sum
        val den = c * sxx - sx * sx
        if (den > 0) Some((c * sxy - sx * sy) / den) else None
      }
    }
    val rng = new scala.util.Random(47)
    val noise = Vector.fill(256)(rng.nextGaussian())
    val walk = noise.scanLeft(0.0)(_ + _).tail
    val series = Map("noise" -> noise, "walk" -> walk,
      "flat" -> Vector.fill(64)(2.0), "short" -> Vector(1.0, 2.0, 3.0))
    val ns = Seq(4, 8, 16, 32)
    val df = series.toSeq.flatMap { case (k, xs) =>
      xs.zipWithIndex.map { case (v, i) => (k, i.toLong, v) }
    }.toDF("k", "idx", "v").repartition(5)
    val got = GroupedStats.dfa(df, "k", "idx", "v", ns)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    for ((name, xs) <- series) {
      val exp = brute(xs, ns)
      (got(name), exp) match {
        case (Some(g), Some(e)) => assert(math.abs(g - e) < 1e-9, s"$name: $g vs $e")
        case (g, e) => assert(g == e, s"$name: $g vs $e")
      }
    }
    // the classic DFA signatures
    assert(got("noise").get > 0.3 && got("noise").get < 0.7)
    assert(got("walk").get > 1.2 && got("walk").get < 1.8)
  }

  test("hurstRs matches a driver brute-force; noise ~0.5, walk ~1") {
    import spark.implicits._
    def brute(x: Vector[Double], ns: Seq[Int]): Option[Double] = {
      val pts = ns.flatMap { bn =>
        val nb = x.length / bn
        val rss = (0 until nb).flatMap { b =>
          val xs = x.slice(b * bn, (b + 1) * bn)
          val mu = xs.sum / bn
          val z = xs.scanLeft(0.0)((a, v) => a + (v - mu)).tail
          val s = math.sqrt(xs.map(v => (v - mu) * (v - mu)).sum / bn)
          if (s > 0) Some((z.max - z.min) / s) else None
        }
        if (rss.isEmpty) None
        else {
          val rs = rss.sum / rss.size
          if (rs > 0) Some((math.log(bn.toDouble), math.log(rs))) else None
        }
      }
      if (pts.size < 2) None
      else {
        val c = pts.size.toDouble
        val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
        val sxy = pts.map(p => p._1 * p._2).sum
        val sxx = pts.map(p => p._1 * p._1).sum
        val den = c * sxx - sx * sx
        if (den > 0) Some((c * sxy - sx * sy) / den) else None
      }
    }
    val rng = new scala.util.Random(53)
    val noise = Vector.fill(512)(rng.nextGaussian())
    val walk = noise.scanLeft(0.0)(_ + _).tail
    val series = Map("noise" -> noise, "walk" -> walk,
      "flat" -> Vector.fill(64)(7.0), "short" -> Vector(1.0, 2.0))
    val ns = Seq(8, 16, 32, 64)
    val df = series.toSeq.flatMap { case (k, xs) =>
      xs.zipWithIndex.map { case (v, i) => (k, i.toLong, v) }
    }.toDF("k", "idx", "v").repartition(5)
    val got = GroupedStats.hurstRs(df, "k", "idx", "v", ns)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    for ((name, xs) <- series) {
      val exp = brute(xs, ns)
      (got(name), exp) match {
        case (Some(g), Some(e)) => assert(math.abs(g - e) < 1e-9, s"$name: $g vs $e")
        case (g, e) => assert(g == e, s"$name: $g vs $e")
      }
    }
    assert(got("noise").get > 0.3 && got("noise").get < 0.75)
    assert(got("walk").get > 0.8 && got("walk").get < 1.2)
  }

  test("plan: rank windows are partitioned (no per-key sort task)") {
    import spark.implicits._
    val df = (0 until 1000).map(i => ("hot", i.toDouble)).toDF("k", "v")
    val out = GroupedStats.exactMedian(df, "k", "v")
    val windows = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      val parts = w.partitionSpec.map(_.sql).mkString(",")
      assert(parts.contains("__pid"),
        s"quantile window partitioned only by [$parts]")
    }
  }

  test("reserved __gs_* names fail fast with the contract message") {
    import spark.implicits._
    val df = Seq(("a", 1.0)).toDF("__gs_v", "v")
    val e = intercept[IllegalArgumentException] {
      GroupedStats.exactQuantilesMulti(df, "__gs_v", Seq("v"), Seq("m" -> 0.5))
    }
    assert(e.getMessage.contains("reserved"))
    val df2 = Seq(("a", 1.0)).toDF("k", "__gs_p")
    val e2 = intercept[IllegalArgumentException] {
      GroupedStats.exactQuantilesMulti(df2, "k", Seq("__gs_p"), Seq("m" -> 0.5))
    }
    assert(e2.getMessage.contains("reserved"))
  }
}
