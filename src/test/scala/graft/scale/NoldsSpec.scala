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
}
