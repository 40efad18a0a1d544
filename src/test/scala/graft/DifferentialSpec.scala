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
}
