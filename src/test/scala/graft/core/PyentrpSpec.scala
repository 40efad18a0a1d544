package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** pyentrp completion members (r11 tranche 4): value-frequency Shannon
  * entropy and weighted permutation entropy, hand-oracled with shuffled
  * input.
  */
class PyentrpSpec extends SparkSpec {
  import FeatureFuncs._

  private def frame(vals: Double*) = {
    import spark.implicits._
    scala.util.Random.shuffle(
      vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toList)
      .toDF("idx", "v").repartition(3)
  }

  private def eval(fn: FeatureFunc, vals: Double*): Option[Double] = {
    val r = frame(vals: _*).agg(fn.agg(col("idx"), col("v")).cast("double")).head
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  private def h2(p: Double): Double = // binary entropy in bits
    -(p * math.log(p) + (1 - p) * math.log(1 - p)) / math.log(2.0)

  test("shannon_entropy: value-frequency entropy in bits") {
    assert(math.abs(eval(shannonEntropy, 1, 1, 2, 2).get - 1.0) < 1e-12)
    // p = (1/2, 1/4, 1/4) -> 1.5 bits
    assert(math.abs(eval(shannonEntropy, 1, 1, 2, 3).get - 1.5) < 1e-12)
    assert(eval(shannonEntropy, 4, 4, 4).contains(0.0))
    assert(eval(shannonEntropy, 9).contains(0.0))
  }

  test("wpe: variance-weighted pattern entropy, hand case") {
    // (0,2,1): pair (0,2) code=up weight 1.0; (2,1) code=down weight 0.25
    // -> p = (0.8, 0.2) -> H = h2(0.8)
    assert(math.abs(eval(weightedPermutationEntropy(2), 0, 2, 1).get
      - h2(0.8)) < 1e-12)
  }

  test("wpe: constant window carries zero weight -> null") {
    assert(eval(weightedPermutationEntropy(2), 5, 5, 5, 5).isEmpty)
    assert(eval(weightedPermutationEntropy(2), 5).isEmpty) // too short
  }

  test("wpe: equal weights reduce to plain pattern entropy") {
    // (0,2,0,2,0): pairs up,down,up,down all weight 1 -> H = 1 bit
    assert(math.abs(eval(weightedPermutationEntropy(2), 0, 2, 0, 2, 0).get
      - 1.0) < 1e-12)
    // normalize: order 2 divides by log2(2!) = 1 -> unchanged
    assert(math.abs(
      eval(weightedPermutationEntropy(2, normalize = true), 0, 2, 0, 2, 0).get
        - 1.0) < 1e-12)
  }

  test("wpe order 3 normalized stays in [0, 1]") {
    val rnd = new scala.util.Random(11)
    val xs = Seq.fill(60)(rnd.nextGaussian() * 5)
    val h = eval(weightedPermutationEntropy(3, normalize = true), xs: _*).get
    assert(h > 0.0 && h <= 1.0)
  }
}
