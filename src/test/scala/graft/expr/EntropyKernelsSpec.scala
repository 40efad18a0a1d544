package graft.expr

import org.scalatest.funsuite.AnyFunSuite

/** r11 tranche-4 kernels: LZ76, SVD entropy (closed-form vs Jacobi),
  * exact SampEn vs a spec-local naive reimplementation, MSPE vs the
  * hand-computed Bandt–Pompe entropy.
  */
class EntropyKernelsSpec extends AnyFunSuite {
  import EntropyKernelUtil._

  private def bits(s: String): Array[Byte] =
    s.map(c => (c - '0').toByte).toArray

  test("lz76 on the canonical examples") {
    // antropy's documentation example: lziv_complexity('1001111011000010')
    // == 6 (phrases 1|0|011110|1100|0010)
    assert(lz76(bits("1001111011000010")) == 6)
    // periodic: 0|1|010101...
    assert(lz76(bits("0101010101")) == 3)
    // constant: 0|000
    assert(lz76(bits("0000")) == 2)
    assert(lz76(bits("01")) == 2)
    assert(lz76(bits("0")) == 1)
    assert(lz76(Array.empty[Byte]) == 0)
  }

  test("eigen3 closed form matches Jacobi on random symmetric matrices") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val m = Array.fill(3, 3)(0.0)
      for (i <- 0 until 3; j <- i until 3) {
        val v = rnd.nextGaussian() * 100
        m(i)(j) = v; m(j)(i) = v
      }
      val norm = m.flatten.map(math.abs).max.max(1.0)
      val cf = eigen3(m(0)(0), m(0)(1), m(0)(2), m(1)(1), m(1)(2), m(2)(2))
        .sorted
      val jc = jacobiEigen(m.map(_.clone()), 3).sorted
      for (k <- 0 until 3)
        assert(math.abs(cf(k) - jc(k)) < 1e-9 * norm,
          s"eig mismatch: ${cf.toList} vs ${jc.toList}")
    }
  }

  test("sampEnExact matches a naive reimplementation") {
    def naive(x: Array[Double], m: Int, r: Double): Double = {
      val n = x.length
      def count(mm: Int): Long = {
        var c = 0L
        for (i <- 0 until n - m; j <- i + 1 until n - m)
          if ((0 until mm).forall(k => math.abs(x(i + k) - x(j + k)) <= r))
            c += 1
        c
      }
      val b = count(m); val a = count(m + 1)
      if (a == 0 || b == 0) Double.NaN else -math.log(a.toDouble / b)
    }
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 20) {
      val x = Array.fill(40)(rnd.nextDouble() * 10)
      val got = sampEnExact(x, x.length, 2, 2.5)
      val exp = naive(x, 2, 2.5)
      assert((got.isNaN && exp.isNaN) || math.abs(got - exp) < 1e-12)
    }
  }

  test("svd entropy: degenerate windows give 0 or null") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    def arr(xs: Double*) = ArrayData.toArrayData(xs.toArray)
    // constant window: rank-1 embedding, single nonzero singular value
    assert(svdEntropy(arr(1, 1, 1, 1, 1), 3, 1, false) == 0.0)
    // alternating +-1: rank-1 again
    assert(svdEntropy(arr(1, -1, 1, -1, 1, -1), 3, 1, false) == 0.0)
    // all-zero: no spectrum
    assert(svdEntropy(arr(0, 0, 0, 0), 3, 1, false) == null)
    // too short for the embedding
    assert(svdEntropy(arr(1, 2), 3, 1, false) == null)
    // normalized entropy of an order-3 spectrum is in [0, 1]
    val rnd = new scala.util.Random(3)
    val x = Array.fill(50)(rnd.nextGaussian())
    val h = svdEntropy(ArrayData.toArrayData(x), 3, 1, true)
      .asInstanceOf[Double]
    assert(h > 0.0 && h <= 1.0)
  }

  test("mspe scale 1 equals plain permutation entropy; known hand case") {
    // (1,2,3,2,1,2): four distinct patterns over four tuples -> 2 bits
    val h = permEntropy(Array(1, 2, 3, 2, 1, 2.0), 6, 3)
    assert(math.abs(h - 2.0) < 1e-12)
    // coarse-grain at scale 2 of (1,3, 5,1, 2,2, 4,0) -> (2,3,2,2):
    // tuples (2,3,2),(3,2,2): patterns argsort -> distinct -> H = 1 bit
    import org.apache.spark.sql.catalyst.util.ArrayData
    val row = mspe(ArrayData.toArrayData(
      Array(1, 3, 5, 1, 2, 2, 4, 0.0)), 3, 2)
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-12)
  }
}
