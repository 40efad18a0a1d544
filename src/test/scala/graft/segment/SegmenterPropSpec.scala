package graft.segment

import graft.SparkSpec

/** Property tests for segment-generation invariants (SURVEY §5): the W1
  * count formula, W2 union semantics, and W5 half-open assignment hold for
  * arbitrary bounds/window/stride combinations.
  */
class SegmenterPropSpec extends SparkSpec {
  // seeded random sampling (the scalatest-scalacheck bridge is not in the
  // offline artifact cache; 30 deterministic samples per property)
  private def samples(n: Int): Seq[(Int, Int, Int, Int)] = {
    val rnd = new scala.util.Random(42)
    (1 to n).map(_ => (rnd.nextInt(51), 1 + rnd.nextInt(200),
      1 + rnd.nextInt(60), 1 + rnd.nextInt(30)))
  }

  test("W1: nb = max(floor((end-start-window)/stride)+1, 0); starts arithmetic") {
    samples(30).foreach { case (s0, span, w, st) =>
      val b = Bounds(s0, s0 + span)
      val starts = Segmenter.regular(spark, b, w.toDouble, Seq(st.toDouble), false, "t")
        .segments.collect().map(_.getAs[Double]("__seg_start")).sorted.toSeq
      val nb = math.max(math.floor((span - w).toDouble / st).toLong + 1, 0L)
      assert(starts.length == nb)
      assert(starts == (0L until nb).map(k => s0 + k.toDouble * st))
    }
  }

  test("W2: multi-stride start set is the sorted union of per-stride sets") {
    samples(30).zipWithIndex.foreach { case ((s0, span, w, st1), i) =>
      val st2 = 1 + (i * 7) % 30
      val b = Bounds(s0, s0 + span)
      def starts(sts: Seq[Double]): Seq[Double] =
        Segmenter.regular(spark, b, w.toDouble, sts, false, "t")
          .segments.collect().map(_.getAs[Double]("__seg_start")).sorted.toSeq
      val union = (starts(Seq(st1)) ++ starts(Seq(st2))).distinct.sorted
      assert(starts(Seq(st1.toDouble, st2.toDouble)) == union)
    }
  }

  test("W5: arithmetic assignment equals the half-open interval definition") {
    import spark.implicits._
    samples(20).zipWithIndex.foreach { case ((s0, span, w, st), i) =>
      val n = 5 + (i * 3) % 36
      val b = Bounds(s0, s0 + span)
      val idxs = (0 until n).map(i => s0 + i.toDouble * span / n)
      val rows = idxs.toDF("__idx")
      val plan = Segmenter.regular(spark, b, w.toDouble, Seq(st.toDouble), false, "t")
      val got = Segmenter.assign(rows, plan)
        .select("__idx", "__seg_id").collect()
        .map(r => (r.getDouble(0), r.getDouble(1))).toSet
      val segs = plan.segments.collect()
        .map(r => (r.getAs[Double]("__seg_id"), r.getAs[Double]("__seg_start"),
          r.getAs[Double]("__seg_end")))
      val exp = (for {
        t <- idxs
        (id, ws, we) <- segs if t >= ws && t < we
      } yield (t, id)).toSet
      assert(got == exp)
    }
  }
}
