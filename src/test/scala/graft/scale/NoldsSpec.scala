package graft.scale

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** corr_dim + multiscale entropy (the nolds/pyentrp members of the
  * reference integration surface, tests/test_features_integration.py:412,
  * 440-462): driver brute-force differentials on multi-partition keys, plus
  * degenerate-key contracts.
  */
class NoldsSpec extends SparkSpec {

  private def keyedSeries(keys: Int, n: Int, seed: Int) = {
    import spark.implicits._
    val rng = new scala.util.Random(seed)
    (0 until keys).flatMap { k =>
      var x = 50.0
      (0 until n).map { i =>
        x += rng.nextDouble() * 10 - 5 + math.sin(i / 3.0) * 2
        (k.toLong, i.toLong, x)
      }
    }.toDF("k", "i", "v").repartition(13)
  }

  /** Brute-force Grassberger–Procaccia on a plain Scala array — the same
    * two-radius definition the operator documents. */
  private def bruteCorrDim(xs: Array[Double], m: Int): Option[Double] = {
    val n = xs.length
    val mu = xs.sum / n
    val sd = math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / n)
    if (sd <= 0 || n < m + 1) return None
    val vecs = (0 to n - m).map(i => xs.slice(i, i + m))
    var c1 = 0L; var c2 = 0L
    for (i <- vecs.indices; j <- i + 1 until vecs.size) {
      val d2 = (0 until m).map(t =>
        (vecs(i)(t) - vecs(j)(t)) * (vecs(i)(t) - vecs(j)(t))).sum
      if (d2 < (0.5 * sd) * (0.5 * sd)) c1 += 1
      if (d2 < sd * sd) c2 += 1
    }
    if (c1 > 0) Some((math.log(c2.toDouble) - math.log(c1.toDouble)) / math.log(2.0))
    else None
  }

  /** Brute-force binned-sampen MSE at one scale with absolute width r. */
  private def bruteMse(xs: Array[Double], s: Int, m: Int, r: Double): Option[Double] = {
    val boxes = xs.length / s
    val y = (0 until boxes).map(b =>
      (0 until s).map(j => xs(b * s + j)).sum / s).toArray
    val bins = y.map(v => math.floor(v / r).toLong)
    def pairs(mm: Int): Long = {
      val ts = (0 to bins.length - mm).map(i => bins.slice(i, i + mm).toSeq)
      ts.groupBy(identity).values.map(g => g.size.toLong * (g.size - 1) / 2).sum
    }
    val b = pairs(m); val a = pairs(m + 1)
    if (a > 0 && b > 0) Some(math.log(b.toDouble) - math.log(a.toDouble)) else None
  }

  test("corr_dim matches the driver brute force on multi-partition keys") {
    val df = keyedSeries(keys = 5, n = 80, seed = 41)
    val got = GroupedStats.corrDim(df, "k", "i", "v", embDim = 2)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val arrs = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).map { case (k, rows) =>
        k -> rows.sortBy(_._2).map(_._3) }
    assert(got.keySet == arrs.keySet)
    for ((k, xs) <- arrs) {
      val exp = bruteCorrDim(xs, 2)
      (got(k), exp) match {
        case (Some(g), Some(e)) => assert(math.abs(g - e) < 1e-9, s"key $k: $g vs $e")
        case (g, e) => assert(g == e, s"key $k: $g vs $e")
      }
    }
  }

  test("corr_dim degenerate keys: constant and too-short series are null") {
    import spark.implicits._
    val df = Seq(
      (1L, 0L, 5.0), (1L, 1L, 5.0), (1L, 2L, 5.0), (1L, 3L, 5.0),
      (2L, 0L, 1.0)).toDF("k", "i", "v")
    val out = GroupedStats.corrDim(df, "k", "i", "v")
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out == Map(1L -> true, 2L -> true))
  }

  test("multiscale entropy (abs r) matches the driver brute force") {
    val df = keyedSeries(keys = 4, n = 90, seed = 7)
    val got = GroupedStats.multiscaleEntropy(df, "k", "i", "v",
      scales = Seq(1, 2, 3), m = 2, r = 10.0)
      .collect().map(r => r.getLong(0) -> (1 to 3).map(c =>
        if (r.isNullAt(c)) None else Some(r.getDouble(c)))).toMap
    val arrs = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).map { case (k, rows) => k -> rows.sortBy(_._2).map(_._3) }
    for ((k, xs) <- arrs; (s, ci) <- Seq(1, 2, 3).zipWithIndex) {
      val exp = bruteMse(xs, s, 2, 10.0)
      (got(k)(ci), exp) match {
        case (Some(g), Some(e)) => assert(math.abs(g - e) < 1e-9, s"key $k s$s: $g vs $e")
        case (g, e) => assert(g == e, s"key $k s$s: $g vs $e")
      }
    }
  }

  /** Brute-force Rosenstein lyap_r matching the operator's documented
    * definition (Theiler-window NN, min-d² then min-j tie-break, divergence
    * means, least-squares slope). */
  private def bruteLyap(xs: Array[Double], m: Int, tsep: Int, T: Int): Option[Double] = {
    val vecs = (0 to xs.length - m).map(i => xs.slice(i, i + m))
    val N = vecs.size
    def d2(i: Int, j: Int) = (0 until m).map(t =>
      (vecs(i)(t) - vecs(j)(t)) * (vecs(i)(t) - vecs(j)(t))).sum
    val nn = (0 until N).flatMap { i =>
      val cands = (0 until N).filter(j => math.abs(j - i) > tsep)
      if (cands.isEmpty) None
      else Some(i -> cands.minBy(j => (d2(i, j), j)))
    }
    val ys = (0 to T).flatMap { t =>
      val lds = nn.flatMap { case (i, j) =>
        if (i + t < N && j + t < N) {
          val d = d2(i + t, j + t)
          if (d > 0) Some(math.log(math.sqrt(d))) else None
        } else None
      }
      if (lds.nonEmpty) Some(t.toDouble -> lds.sum / lds.size) else None
    }
    val k = ys.size.toDouble
    val sx = ys.map(_._1).sum; val sy = ys.map(_._2).sum
    val sxy = ys.map(p => p._1 * p._2).sum; val sxx = ys.map(p => p._1 * p._1).sum
    if (k * sxx - sx * sx > 0) Some((k * sxy - sx * sy) / (k * sxx - sx * sx))
    else None
  }

  test("lyap_r matches the driver brute force on multi-partition keys") {
    val df = keyedSeries(keys = 4, n = 60, seed = 13)
    val got = GroupedStats.lyapR(df, "k", "i", "v",
      embDim = 3, minTsep = 5, trajLen = 6)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val arrs = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).map { case (k, rows) => k -> rows.sortBy(_._2).map(_._3) }
    assert(got.keySet == arrs.keySet)
    for ((k, xs) <- arrs) {
      val exp = bruteLyap(xs, 3, 5, 6)
      (got(k), exp) match {
        case (Some(g), Some(e)) => assert(math.abs(g - e) < 1e-6, s"key $k: $g vs $e")
        case (g, e) => assert(g == e, s"key $k: $g vs $e")
      }
    }
  }

  test("lyap_r degenerate keys surface null") {
    import spark.implicits._
    // too short for any Theiler-window pair
    val df = (0 until 6).map(i => (1L, i.toLong, i.toDouble)).toDF("k", "i", "v")
    val out = GroupedStats.lyapR(df, "k", "i", "v").collect()
    assert(out.length == 1 && out.head.isNullAt(1))
  }

  test("multiscale entropy sigma-scaled width runs and respects nulls") {
    import spark.implicits._
    // constant key: sigma = 0 -> width 0 -> null at every scale; the live
    // key is periodic so bin-tuples repeat (A > 0) under the 0.2-sigma width
    val const = (0 until 30).map(i => (9L, i.toLong, 4.2))
    val periodic = (0 until 60).map(i => (0L, i.toLong, (i % 5).toDouble * 3))
    val df = (periodic ++ const).toDF("k", "i", "v").repartition(7)
    val out = GroupedStats.multiscaleEntropy(df, "k", "i", "v",
      scales = Seq(1, 2), m = 2) // r = 0 -> 0.2 sigma convention
      .collect().map(r => r.getLong(0) -> (1 to 2).map(r.isNullAt)).toMap
    assert(out(9L) == Seq(true, true))
    assert(out(0L) == Seq(false, false))
  }

  /** Brute-force Eckmann lyap_e (matrix_dim 2) matching the operator's
    * documented definition: Chebyshev kNN radius (minNb-th smallest,
    * ties by value), interceptless companion fits, QR chain averages.
    */
  private def bruteLyapE(xs: Array[Double], tsep: Int, minNb: Int):
      (Option[Double], Option[Double]) = {
    val last = xs.length - 3 // usable i: 0..last (needs x(i+2))
    if (last < 0) return (None, None)
    def dist(i: Int, j: Int) = math.max(
      math.abs(xs(i) - xs(j)), math.abs(xs(i + 1) - xs(j + 1)))
    val steps = (0 to last).flatMap { i =>
      val cand = (0 to last).filter(j => math.abs(j - i) > tsep)
      if (cand.isEmpty) None
      else {
        val ds = cand.map(j => dist(i, j)).sorted
        val radius = ds(math.min(minNb, ds.size) - 1)
        val nb = cand.filter(j => dist(i, j) <= radius)
        var s11 = 0.0; var s12 = 0.0; var s22 = 0.0; var t1 = 0.0; var t2 = 0.0
        for (j <- nb) {
          val u0 = xs(j) - xs(i); val u1 = xs(j + 1) - xs(i + 1)
          val w = xs(j + 2) - xs(i + 2)
          s11 += u0 * u0; s12 += u0 * u1; s22 += u1 * u1
          t1 += u0 * w; t2 += u1 * w
        }
        val det = s11 * s22 - s12 * s12
        if (det > 0)
          Some((i, (t1 * s22 - t2 * s12) / det, (s11 * t2 - s12 * t1) / det))
        else None
      }
    }
    var q11 = 1.0; var q12 = 0.0; var q21 = 0.0; var q22 = 1.0
    var l1 = 0.0; var l2 = 0.0; var c1 = 0L; var c2 = 0L
    for ((_, a1, a2) <- steps) {
      val b11 = q21; val b12 = q22
      val b21 = a1 * q11 + a2 * q21; val b22 = a1 * q12 + a2 * q22
      val r11 = math.sqrt(b11 * b11 + b21 * b21)
      if (r11 > 0) {
        val r22 = (b11 * b22 - b21 * b12) / r11
        val c = b11 / r11; val s = b21 / r11
        q11 = c; q12 = -s; q21 = s; q22 = c
        l1 += math.log(r11); c1 += 1
        if (math.abs(r22) > 0) { l2 += math.log(math.abs(r22)); c2 += 1 }
      }
    }
    (if (c1 > 0) Some(l1 / c1) else None, if (c2 > 0) Some(l2 / c2) else None)
  }

  test("lyap_e matches the driver brute force on multi-partition keys") {
    val df = keyedSeries(keys = 4, n = 50, seed = 29)
    val got = GroupedStats.lyapE(df, "k", "i", "v", minTsep = 5, minNb = 6)
      .collect().map(r => r.getLong(0) -> (
        (if (r.isNullAt(1)) None else Some(r.getDouble(1))),
        (if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    val arrs = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).map { case (k, rows) => k -> rows.sortBy(_._2).map(_._3) }
    assert(got.keySet == arrs.keySet)
    for ((k, xs) <- arrs) {
      val (e1, e2) = bruteLyapE(xs, 5, 6)
      (got(k)._1, e1) match {
        case (Some(g), Some(e)) => assert(math.abs(g - e) < 1e-9, s"key $k l1: $g vs $e")
        case (g, e) => assert(g == e, s"key $k l1: $g vs $e")
      }
      (got(k)._2, e2) match {
        case (Some(g), Some(e)) => assert(math.abs(g - e) < 1e-9, s"key $k l2: $g vs $e")
        case (g, e) => assert(g == e, s"key $k l2: $g vs $e")
      }
      // the spectrum is ordered: the leading exponent dominates
      for (g1 <- got(k)._1; g2 <- got(k)._2) assert(g1 >= g2)
    }
  }

  test("lyap_e fused radius window ≡ the replaced rad-join shape (r19)") {
    // same pair set, same radius (dist at rank min(minNb, cnt)), same fit
    // filter — only the aggregation ORDER differs, so equality is pinned
    // at 1e-12 (the spec above separately pins both against the driver
    // brute force at 1e-9)
    val df = keyedSeries(keys = 5, n = 60, seed = 31)
    def toMap(out: Array[org.apache.spark.sql.Row]) =
      out.map(r => r.getLong(0) -> (
        (if (r.isNullAt(1)) None else Some(r.getDouble(1))),
        (if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    val fused = toMap(GroupedStats.lyapE(df, "k", "i", "v", 5, 6).collect())
    val old = toMap(GroupedStats.lyapE(df, "k", "i", "v", 5, 6,
      fusedRadius = false).collect())
    assert(fused.keySet == old.keySet)
    for (k <- fused.keySet; ((f, o), slot) <- fused(k).productIterator
           .zip(old(k).productIterator).zipWithIndex) {
      (f, o) match {
        case (Some(a: Double), Some(b: Double)) =>
          assert(math.abs(a - b) < 1e-12, s"key $k slot $slot: $a vs $b")
        case (a, b) => assert(a == b, s"key $k slot $slot: $a vs $b")
      }
    }
  }

  test("lyap_e degenerate keys surface null") {
    import spark.implicits._
    val df = (0 until 7).map(i => (1L, i.toLong, i.toDouble)).toDF("k", "i", "v")
    val out = GroupedStats.lyapE(df, "k", "i", "v").collect()
    assert(out.length == 1 && out.head.isNullAt(1) && out.head.isNullAt(2))
  }
}
