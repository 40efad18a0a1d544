package graft

import org.apache.spark.sql.functions._
import graft.api._
import graft.core._
import graft.scale.Dedup

/** Differential tests: independent formulations of the same semantics must
  * agree exactly — the engine's own cross-checks, beyond the DuckDB oracle.
  */
class DifferentialSpec extends SparkSpec {
  import FeatureFuncs._

  test("KeyedFeatures on a single key equals the single-series engine") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    var t = 0L
    val rows = (1 to 500).map { _ =>
      t += 1 + rnd.nextInt(20); (t.toDouble, rnd.nextDouble() * 100)
    }
    val df = rows.toDF("idx", "v")
    val single = {
      val fc = FeatureCollection(
        FeatureDescriptor(len, "v", Some(Win.seq(100L)), Some(Seq(Win.seq(40L)))),
        FeatureDescriptor(mean, "v", Some(Win.seq(100L)), Some(Seq(Win.seq(40L)))))
      fc.calculate(Seq(Series("v", df, "idx", "v")))
        .select(col("idx"), col("`v__len__w=100`"), col("`v__mean__w=100`"))
        .collect().map(r => (r.getDouble(0), r.getLong(1), Option(r.get(2))))
        .sortBy(_._1).toSeq
    }
    val keyed = KeyedFeatures.calculate(df.withColumn("k", lit("only")),
      "k", "idx", "v", Win.seq(100L), Seq(Win.seq(40L)), Seq(len, mean), "v")
      .select(col("idx"), col("`v__len__w=100`"), col("`v__mean__w=100`"))
      .collect().map(r => (r.getDouble(0), r.getLong(1), Option(r.get(2))))
      .sortBy(_._1).toSeq
    assert(keyed == single)
  }

  test("keyed multi-stride on a single key equals the single-series engine") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    var t = 0L
    val rows = (1 to 400).map { _ =>
      t += 1 + rnd.nextInt(15); (t.toDouble, rnd.nextDouble() * 50)
    }
    val df = rows.toDF("idx", "v")
    val strides = Seq(Win.seq(30L), Win.seq(70L)) // union + dedup (W2)
    // partition-summation order differs between the two engines, so means
    // disagree in the last ULP — compare at 9 decimals (same spirit as the
    // DuckDB oracle's rounding)
    def collect9(d: org.apache.spark.sql.DataFrame) = d
      .select(col("idx"), round(col("`v__mean__w=100`"), 9))
      .collect().map(r => (r.getDouble(0), Option(r.get(1))))
      .sortBy(_._1).toSeq
    val single = collect9 {
      val fc = FeatureCollection(
        FeatureDescriptor(mean, "v", Some(Win.seq(100L)), Some(strides)))
      fc.calculate(Seq(Series("v", df, "idx", "v")))
    }
    val keyed = collect9(KeyedFeatures.calculate(df.withColumn("k", lit("only")),
      "k", "idx", "v", Win.seq(100L), strides, Seq(mean), "v"))
    assert(keyed == single)
  }

  test("keyed wide n-ary on a single key equals the main-path tuple features") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    var t = 0L
    val rows = (1 to 500).map { _ =>
      t += 1 + rnd.nextInt(20)
      (t.toDouble, rnd.nextDouble() * 100, rnd.nextDouble() * 10)
    }
    val df = rows.toDF("idx", "x", "y")
    val main = {
      val fc = FeatureCollection(NaryFeatureDescriptor(NaryFuncs.corr2,
        Seq("x", "y"), Some(Win.seq(100L)), Some(Seq(Win.seq(40L)))))
      fc.calculate(Seq(Series("x", df, "idx", "x"), Series("y", df, "idx", "y")))
        .select(col("idx"), col("`x|y__corr__w=100`"))
        .collect().map(r => (r.getDouble(0), Option(r.get(1))))
        .sortBy(_._1).toSeq
    }
    val keyed = KeyedFeatures.calculateWide(df.withColumn("k", lit("only")),
      "k", "idx", Win.seq(100L), Seq(Win.seq(40L)),
      unary = Nil, nary = Seq(Seq("x", "y") -> NaryFuncs.corr2))
      .select(col("idx"), col("`x|y__corr__w=100`"))
      .collect().map(r => (r.getDouble(0), Option(r.get(1))))
      .sortBy(_._1).toSeq
    assert(keyed == main)
  }

  test("a JSON-reloaded collection computes identical features") {
    import spark.implicits._
    val df = (0 until 200).map(i => (i.toDouble, math.sin(i / 7.0) * 50))
      .toDF("idx", "v")
    val series = Series("v", df, "idx", "v")
    val fc = FeatureCollection(
      FeatureDescriptor(mean, "v", Some(Win.seq(20L)), Some(Seq(Win.seq(5L)))),
      FeatureDescriptor(std, "v", Some(Win.seq(20L)), Some(Seq(Win.seq(5L)))))
    def run(c: FeatureCollection) =
      c.calculate(Seq(series)).collect()
        .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
    val reloaded = FeatureCollectionSerde.fromJson(FeatureCollectionSerde.toJson(fc))
    assert(run(reloaded) == run(fc))
  }

  test("prefix-filtered Jaccard equals the naive exact self-join") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = ('a' to 'z').map(_.toString)
    // skewed vocabulary: low indices drawn far more often (stop-words)
    def word(): String = vocab((rnd.nextInt(6) * rnd.nextInt(6)) % 26)
    val docs = (1 to 120).map(i => (i.toLong,
      (1 to 12 + rnd.nextInt(20)).map(_ => word()).mkString(" "))).toDF("id", "text")
    val fast = Dedup.jaccardPairs(docs, "id", "text", 2, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e9))).toSet
    // naive reference: full shingle self-join, no filtering
    val sh = Dedup.shingles(docs, "id", "text", 2)
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val naive = sh.select(col("id").as("id_a"), col("__shingle"))
      .join(sh.select(col("id").as("id_b"), col("__shingle")), Seq("__shingle"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("i"))
      .join(sizes.select(col("id").as("id_a"), col("n").as("na")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n").as("nb")), Seq("id_b"))
      .withColumn("j", col("i").cast("double") / (col("na") + col("nb") - col("i")))
      .where(col("j") >= 0.4)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        math.round(r.getAs[Double]("j") * 1e9))).toSet
    assert(naive.nonEmpty) // the corpus actually produces near-dups
    assert(fast == naive)
  }

  private def aggOne(fn: FeatureFunc, vals: Seq[Double],
                     field: Option[String] = None): Option[Double] = {
    import spark.implicits._
    val df = scala.util.Random.shuffle(
      vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toList)
      .toDF("idx", "v").repartition(5)
    val c = fn.agg(col("idx"), col("v"))
    val r = field match {
      case Some(f) => df.agg(c.as("s")).select(col(s"s.$f").cast("double")).head
      case None => df.agg(c.cast("double")).head
    }
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  /** Independent Bandt–Pompe PE reference for the differential below:
    * stable argsort via Scala sortBy (value, index) — a different
    * formulation from the kernel's pairwise rank counting, so a tie-rule
    * or code-packing bug in EntropyKernelUtil.permEntropy cannot cancel
    * out (permutationEntropy and multiscalePermEntropy both route to that
    * ONE primitive since r15, so kernel-vs-kernel would be vacuous). */
  private def refPermEntropy(xs: Seq[Double], order: Int): Double = {
    val codes = xs.sliding(order).map { w =>
      val perm = w.zipWithIndex.sortBy { case (v, i) => (v, i) }.map(_._2)
      val rank = new Array[Int](order)
      perm.zipWithIndex.foreach { case (idx, pos) => rank(idx) = pos }
      rank.mkString(",")
    }.toSeq
    val n = codes.length.toDouble
    codes.groupBy(identity).values
      .map(g => { val p = g.size / n; -p * math.log(p) / math.log(2.0) }).sum
  }

  test("kernel permutation entropy matches an independent argsort reference") {
    val rnd = new scala.util.Random(23)
    val xs = Seq.fill(300)(rnd.nextGaussian() * 20)
    assert(math.abs(aggOne(permutationEntropy(3), xs).get -
      refPermEntropy(xs, 3)) < 1e-9)
    // tie-heavy case (quantized values): exercises the stable tie rule,
    // which a no-tie gaussian stream never touches
    val ys = Seq.fill(300)(rnd.nextInt(4).toDouble)
    assert(math.abs(aggOne(permutationEntropy(3), ys).get -
      refPermEntropy(ys, 3)) < 1e-9)
    // MSPE at scale 1 must agree with the same reference (shared kernel)
    assert(math.abs(aggOne(multiscalePermEntropy(3, 2), ys, Some("mspe_1")).get -
      refPermEntropy(ys, 3)) < 1e-9)
  }

  test("lziv on an alternating window matches the hand LZ76 count") {
    // values 0/10 alternate; median 5 binarizes to 0101...: phrases 0|1|01...
    val xs = (0 until 10).map(i => if (i % 2 == 0) 0.0 else 10.0)
    assert(aggOne(lzivComplexity(), xs).contains(3.0))
  }

  test("welch relative density is invariant to a constant offset") {
    // per-segment constant detrend removes any DC shift exactly
    val rnd = new scala.util.Random(31)
    val xs = Seq.fill(300)(math.sin(rnd.nextDouble() * 6) * 10)
    val a = graft.expr.WelchRelUtil.names(5).map(n =>
      aggOne(welchDensityRel(5), xs, Some(n)))
    val b = graft.expr.WelchRelUtil.names(5).map(n =>
      aggOne(welchDensityRel(5), xs.map(_ + 1e6), Some(n)))
    a.zip(b).foreach { case (x, y) =>
      (x, y) match {
        case (Some(u), Some(v)) => assert(math.abs(u - v) < 1e-6)
        case (u, v) => assert(u == v)
      }
    }
  }
}
