package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Entropy tranche (the reference integration surface's antropy/nolds
  * wrappers — reference: tsflex/features/integrations.py:15-337, exercised
  * by tests/test_features_integration.py:360-430): permutation entropy and
  * the binned sample-entropy approximation, hand-oracled, with shuffled
  * input so the index sort inside the aggregate is load-bearing.
  */
class EntropySpec extends SparkSpec {
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

  test("perm_entropy: all-distinct patterns give log2(N) bits") {
    // tuples of (1,2,3,2,1,2): (1,2,3),(2,3,2),(3,2,1),(2,1,2) — four
    // distinct Bandt–Pompe patterns (argsort [0,1,2],[0,2,1],[2,1,0],
    // [1,0,2]) → H = log2(4) = 2
    assert(math.abs(eval(permutationEntropy(3), 1, 2, 3, 2, 1, 2).get - 2.0) < 1e-12)
  }

  test("perm_entropy: monotone and constant windows give 0") {
    assert(eval(permutationEntropy(3), 1, 2, 3, 4, 5).contains(0.0))
    // ties: numpy stable argsort maps every (5,5,5) to the SAME pattern
    assert(eval(permutationEntropy(3), 5, 5, 5, 5).contains(0.0))
  }

  test("perm_entropy: mixed distribution matches the hand-computed H") {
    // (1,2,1,2,1): tuples (1,2,1),(2,1,2),(1,2,1) → counts (2,1) over 3
    // → H = -(2/3 log2 2/3 + 1/3 log2 1/3)
    val expect = -(2.0 / 3 * math.log(2.0 / 3) + 1.0 / 3 * math.log(1.0 / 3)) / math.log(2.0)
    assert(math.abs(eval(permutationEntropy(3), 1, 2, 1, 2, 1).get - expect) < 1e-12)
  }

  test("perm_entropy: normalize divides by log2(order!)") {
    val h = eval(permutationEntropy(3), 1, 2, 3, 2, 1, 2).get
    val hn = eval(permutationEntropy(3, normalize = true), 1, 2, 3, 2, 1, 2).get
    assert(math.abs(hn - h / (math.log(6.0) / math.log(2.0))) < 1e-12)
  }

  test("perm_entropy: shorter than order → null; exactly order → 0") {
    assert(eval(permutationEntropy(3), 1, 2).isEmpty)
    assert(eval(permutationEntropy(3), 2, 1, 3).contains(0.0))
  }

  test("perm_entropy order 2 on alternating series") {
    // (1,2,1,2): pairs (1,2),(2,1),(1,2) → up,down,up → counts (2,1)
    val expect = -(2.0 / 3 * math.log(2.0 / 3) + 1.0 / 3 * math.log(1.0 / 3)) / math.log(2.0)
    assert(math.abs(eval(permutationEntropy(2), 1, 2, 1, 2).get - expect) < 1e-12)
  }

  test("sampen_abs: hand-computed -ln(A/B) on a tight cluster") {
    // r=2 → bins floor(x/2) of (0,1,0.5,1.5) = (0,0,0,0):
    // m=2 templates: 3 equal pairs-of-bins → B = C(3,2) = 3
    // m=3 templates: 2 equal → A = C(2,2) = 1 → -ln(1/3) = ln 3
    val got = eval(sampleEntropyApproxAbs(2, 2.0), 0, 1, 0.5, 1.5).get
    assert(math.abs(got - math.log(3.0)) < 1e-12)
  }

  test("sampen_abs: no (m+1)-matches → null (A = 0)") {
    // bins of (0,1,10,11,0.5,10.5) with r=2 = (0,0,5,5,0,5): B=1, A=0
    assert(eval(sampleEntropyApproxAbs(2, 2.0), 0, 1, 10, 11, 0.5, 10.5).isEmpty)
  }

  test("sampen_abs: order sensitivity — the index sort is load-bearing") {
    // same multiset as the tight cluster but bins (0,5,0,5,0,5) r=2:
    // m=2 templates (0,5),(5,0),(0,5),(5,0),(0,5) → B = C(3,2)+C(2,2) = 4
    // m=3: (0,5,0),(5,0,5),(0,5,0),(5,0,5) → A = 1+1 = 2 → -ln(2/4) = ln 2
    val got = eval(sampleEntropyApproxAbs(2, 2.0), 0, 10, 0, 10, 0, 10).get
    assert(math.abs(got - math.log(2.0)) < 1e-12)
  }

  test("sampen std-factor variant: constant window (width 0) → null") {
    assert(eval(sampleEntropyApprox(2), 5, 5, 5, 5, 5).isEmpty)
  }

  test("sampen std-factor variant agrees with abs variant at the same r") {
    // (0,2,0,2,0,2): σ_pop = 1 → rFactor 0.5 ⇒ width 0.5, same as abs 0.5
    val a = eval(sampleEntropyApprox(2, 0.5), 0, 2, 0, 2, 0, 2)
    val b = eval(sampleEntropyApproxAbs(2, 0.5), 0, 2, 0, 2, 0, 2)
    assert(a.isDefined && a == b)
  }

  test("apen_abs: hand-computed phi(m) - phi(m+1) on an alternating series") {
    // (0,10,0,10,0,10), r=2 → bins (0,5,0,5,0,5)
    // m=2 codes: (0,5)x3, (5,0)x2 → N=5, phi2 = (3ln3 + 2ln2)/5 − ln5
    // m=3 codes: (0,5,0)x2, (5,0,5)x2 → N=4, phi3 = (4ln2)/4 − ln4 = −ln2
    val phi2 = (3 * math.log(3) + 2 * math.log(2)) / 5 - math.log(5)
    val expect = phi2 - (-math.log(2))
    val got = eval(approxEntropyAbs(2, 2.0), 0, 10, 0, 10, 0, 10).get
    assert(math.abs(got - expect) < 1e-12)
  }

  test("apen: constant window gives 0 under abs tolerance, null under sigma") {
    assert(eval(approxEntropyAbs(2, 2.0), 5, 5, 5, 5).contains(0.0))
    assert(eval(approxEntropy(2), 5, 5, 5, 5).isEmpty) // σ = 0 → width 0
  }

  test("apen: window shorter than m+1 → null") {
    assert(eval(approxEntropyAbs(2, 2.0), 1, 2).isEmpty)
  }

  test("spectral entropy: pure tone → 0, two equal tones → ln 2") {
    // n = 8, x_t = cos(2π·2t/8): all periodogram energy at bin 2 → H = 0
    val tone = (0 until 8).map(t => math.cos(2 * math.Pi * 2 * t / 8))
    assert(math.abs(eval(spectralEntropy(), tone: _*).get) < 1e-9)
    // equal tones at bins 1 and 2 → p = (1/2, 1/2) → H = ln 2; the
    // normalized variant divides by ln(#bins) = ln 4
    val two = (0 until 8).map(t =>
      math.cos(2 * math.Pi * t / 8) + math.cos(2 * math.Pi * 2 * t / 8))
    assert(math.abs(eval(spectralEntropy(), two: _*).get - math.log(2)) < 1e-9)
    assert(math.abs(eval(spectralEntropy(normalize = true), two: _*).get -
      math.log(2) / math.log(4)) < 1e-9)
  }

  test("spectral entropy guards: constant or short windows → null") {
    assert(eval(spectralEntropy(), 5, 5, 5, 5, 5).isEmpty) // DC only
    assert(eval(spectralEntropy(), 1, 2, 3).isEmpty)       // n < 4
  }

  test("spectral entropy matches a driver DFT on random data") {
    val rng = new scala.util.Random(59)
    val x = Vector.fill(37)(rng.nextDouble() * 10)
    val nb = x.length / 2
    val psd = (1 to nb).map { k =>
      val w = 2 * math.Pi * k / x.length
      val re = x.zipWithIndex.map { case (v, t) => v * math.cos(w * t) }.sum
      val im = x.zipWithIndex.map { case (v, t) => v * math.sin(w * t) }.sum
      re * re + im * im
    }
    val tot = psd.sum
    val expect = -psd.map(_ / tot).filter(_ > 0).map(p => p * math.log(p)).sum
    assert(math.abs(eval(spectralEntropy(), x: _*).get - expect) < 1e-9)
  }

  test("both survive the robust wrapper's NaN mask") {
    val fn = permutationEntropy(3).robust(3, passThroughNans = false)
    val got = eval(fn, 1, 2, 3, 2, 1, 2)
    assert(math.abs(got.get - 2.0) < 1e-12)
    val short = eval(fn, 1, 2) // < minNbSamples → errorVal NaN
    assert(short.exists(_.isNaN))
  }
}
