package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Differential spec for the r18 sorted-window kernels.
  *
  * [[CollectSortedVals]] must reproduce the REPLACED chain
  * `transform(array_sort(collect_list(when(v.isNotNull, struct(i, v)))), _.v)`
  * bit-for-bit through a real grouped aggregation — duplicate and null
  * indexes, −0.0/0.0 ties, NaN carriers and all. [[HjorthFoldK]] and
  * [[PetrosianNdK]] must reproduce their replaced slice+zip_with+aggregate
  * chains (kept here verbatim) on the KernelDegenerateSpec battery, and the
  * katz path's ABS_DIFF_SUM swap is pinned against the replaced
  * transform+fold form.
  */
class SortedCollectSpec extends SparkSpec {

  // ---- the replaced Column forms, verbatim --------------------------------

  private def oldSortedVals(i: Column, v: Column): Column =
    transform(
      array_sort(collect_list(when(v.isNotNull, struct(i.as("i"), v.as("v"))))),
      p => p.getField("v"))

  private def arrDiffs(a: Column, m: Column): Column =
    zip_with(slice(a, lit(2), m), slice(a, lit(1), m), (b, c) => b - c)

  private def arrVarPop(arr: Column): Column =
    aggregate(arr,
      struct(lit(0L).as("n"), lit(0.0).as("s"), lit(0.0).as("s2")),
      (acc, x) => struct((acc.getField("n") + 1L).as("n"),
        (acc.getField("s") + x).as("s"),
        (acc.getField("s2") + x * x).as("s2")),
      acc => {
        val n = acc.getField("n").cast("double")
        when(acc.getField("n") > 0,
          (acc.getField("s2") - acc.getField("s") * acc.getField("s") / n) / n)
      })

  private def bits(d: java.lang.Double): Long =
    if (d == null) Long.MinValue
    else java.lang.Double.doubleToLongBits(d.doubleValue())

  test("CollectSortedVals ≡ transform(array_sort(collect_list)) through aggregation") {
    import spark.implicits._
    val r = new scala.util.Random(41)
    val rows = scala.collection.mutable.ArrayBuffer[(Int, java.lang.Double, java.lang.Double)]()
    // dense random groups (with duplicate indexes so the v tie-break runs)
    for (g <- 0 until 6; _ <- 0 until 200) {
      val i = (r.nextInt(40) * 100).toDouble + (if (r.nextBoolean()) 0.5 else 0.0)
      rows += ((g, i, r.nextDouble() * 20 - 10))
    }
    // one large group: the merge sort's deep-recursion path
    for (_ <- 0 until 10000)
      rows += ((6, r.nextDouble() * 1e6, r.nextDouble() * 1e6 - 5e5))
    // handcrafted carriers
    rows += ((7, 1.0, 3.0)); rows += ((7, 1.0, 3.0)) // dup (i, v)
    rows += ((7, -0.0, 9.0)); rows += ((7, 0.0, -9.0)) // −0.0 == 0.0 tie → v order
    rows += ((7, 2.0, Double.NaN)); rows += ((7, 2.0, 5.0)) // NaN v after real on tie
    rows += ((7, Double.NaN, 1.0)); rows += ((7, Double.NaN, -1.0)) // NaN i last, tie by v
    rows += ((7, Double.NegativeInfinity, 7.0))
    rows += ((7, Double.PositiveInfinity, 8.0))
    rows += ((7, 3.0, null)) // null v: dropped
    rows += ((7, null, 4.0)); rows += ((7, null, -4.0)) // null i: first, tie by v
    rows += ((8, 1.0, null)); rows += ((8, 2.0, null)) // all-null group → empty array
    val df = rows.toSeq.toDF("g", "i", "v")
    val out = df.groupBy("g").agg(
      CollectSortedVals(col("i"), col("v")).as("k"),
      oldSortedVals(col("i"), col("v")).as("o")).collect()
    assert(out.nonEmpty)
    out.foreach { row =>
      val k = row.getSeq[Double](1)
      val o = row.getSeq[Double](2)
      assert(k.length == o.length, s"g=${row.getInt(0)} length ${k.length} vs ${o.length}")
      k.indices.foreach { j =>
        assert(java.lang.Double.doubleToLongBits(k(j)) ==
          java.lang.Double.doubleToLongBits(o(j)),
          s"g=${row.getInt(0)} pos $j: kernel=${k(j)} old=${o(j)}")
      }
    }
    // the all-null group must yield an EMPTY array on both sides
    val g8 = out.find(_.getInt(0) == 8).get
    assert(g8.getSeq[Double](1).isEmpty && g8.getSeq[Double](2).isEmpty)
  }

  // windows for the scalar kernels: random + the degenerate battery
  private def windows: Seq[Seq[Double]] = {
    val r = new scala.util.Random(59)
    val rand = Seq.fill(40)(Seq.fill(2 + r.nextInt(60))(r.nextDouble() * 20 - 10))
    rand ++ Seq(
      Seq.empty[Double], Seq(5.0), Seq(1.0, 2.0), Seq(1.0, 2.0, 4.0),
      Seq(-2.5, -2.5, -2.5, -2.5), // constant: zero diffs throughout
      Seq(0.0, -0.0, 0.0, -0.0), // ±0 diffs: signum −0.0 ≡ 0.0 under =!=
      Seq(1.0, 3.0, 3.0, 3.0, 1.0), // plateau: zero-signum run
      Seq(1.0, Double.NaN, 2.0, 5.0, 3.0), // NaN diffs: NaN =!= NaN is false
      Seq(Double.PositiveInfinity, 1.0, Double.NegativeInfinity, 2.0),
      Seq(1e300, -1e300, 1e300, -1e300),
      Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0))
  }

  test("HjorthFoldK ≡ the replaced arrVarPop(arrDiffs) chains, bit-for-bit") {
    import spark.implicits._
    val df = windows.toDF("w").withColumn("n", size(col("w")).cast("long"))
    val m1 = greatest(col("n") - 1L, lit(0L)).cast("int")
    val m2 = greatest(col("n") - 2L, lit(0L)).cast("int")
    val dx = arrDiffs(col("w"), m1)
    val ddx = arrDiffs(dx, m2)
    val hj = HjorthFoldK(col("w"))
    val rows = df.select(col("w"),
      hj.getField("vdx").as("k1"), arrVarPop(dx).as("o1"),
      hj.getField("vddx").as("k2"), arrVarPop(ddx).as("o2")).collect()
    rows.foreach { r =>
      def d(idx: Int): java.lang.Double =
        if (r.isNullAt(idx)) null else java.lang.Double.valueOf(r.getDouble(idx))
      assert(bits(d(1)) == bits(d(2)),
        s"vdx diverged on ${r.getSeq[Double](0)}: kernel=${d(1)} old=${d(2)}")
      assert(bits(d(3)) == bits(d(4)),
        s"vddx diverged on ${r.getSeq[Double](0)}: kernel=${d(3)} old=${d(4)}")
    }
  }

  test("PetrosianNdK ≡ the replaced signum zip_with fold, bit-for-bit") {
    import spark.implicits._
    val df = windows.toDF("w").withColumn("n", size(col("w")).cast("long"))
    val m1 = greatest(col("n") - 1L, lit(0L)).cast("int")
    val m2 = greatest(col("n") - 2L, lit(0L)).cast("int")
    val sg = transform(arrDiffs(col("w"), m1), x => signum(x))
    val old = aggregate(
      zip_with(slice(sg, lit(2), m2), slice(sg, lit(1), m2),
        (a, b) => when(a =!= b, 1.0).otherwise(0.0)),
      lit(0.0), (acc, x) => acc + x)
    val rows = df.select(col("w"), PetrosianNdK(col("w")).as("k"), old.as("o"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"nd diverged on ${r.getSeq[Double](0)}: kernel=${r.getDouble(1)} old=${r.getDouble(2)}")
    }
  }

  test("katz L: ABS_DIFF_SUM fold ≡ the replaced transform+aggregate form") {
    import spark.implicits._
    val df = windows.toDF("w").withColumn("n", size(col("w")).cast("long"))
    val m1 = greatest(col("n") - 1L, lit(0L)).cast("int")
    val old = aggregate(transform(arrDiffs(col("w"), m1), x => abs(x)),
      lit(0.0), (acc, x) => acc + x)
    val rows = df.select(col("w"),
      TemporalFoldK(col("w"), TemporalFoldK.ABS_DIFF_SUM).as("k"), old.as("o"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"L diverged on ${r.getSeq[Double](0)}: kernel=${r.getDouble(1)} old=${r.getDouble(2)}")
    }
  }

  test("degenerate windows: hjorth null thresholds, petrosian base") {
    import spark.implicits._
    val df = Seq(
      Seq.empty[Double], Seq(5.0), Seq(1.0, 3.0), Seq(1.0, 2.0, 4.0))
      .toDF("w")
    val hj = HjorthFoldK(col("w"))
    val got = df.select(hj.getField("vdx"), hj.getField("vddx"),
      PetrosianNdK(col("w"))).collect()
    // n=0, n=1: no diffs at all
    assert(got(0).isNullAt(0) && got(0).isNullAt(1) && got(0).getDouble(2) == 0.0)
    assert(got(1).isNullAt(0) && got(1).isNullAt(1) && got(1).getDouble(2) == 0.0)
    // n=2: one dx (variance 0), no ddx, no signum pair
    assert(got(2).getDouble(0) == 0.0 && got(2).isNullAt(1) &&
      got(2).getDouble(2) == 0.0)
    // n=3: two dx (1.0, 2.0) → var_pop 0.25; one ddx → 0.0; signums equal
    assert(got(3).getDouble(0) == 0.25 && got(3).getDouble(1) == 0.0 &&
      got(3).getDouble(2) == 0.0)
  }
}
