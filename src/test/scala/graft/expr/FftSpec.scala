package graft.expr

import org.scalatest.funsuite.AnyFunSuite

/** Bluestein FFT vs direct DFT differential: identical X_k mathematics, FP
  * agreement far inside the engine's 6-decimal oracle rounding.
  */
class FftSpec extends AnyFunSuite {

  private def directDft(x: Array[Double]): (Array[Double], Array[Double]) = {
    val n = x.length
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    for (k <- 0 until n; t <- 0 until n) {
      val a = -2.0 * math.Pi * k * t / n
      re(k) += x(t) * math.cos(a)
      im(k) += x(t) * math.sin(a)
    }
    (re, im)
  }

  private def series(n: Int, seed: Int): Array[Double] = {
    val rng = new scala.util.Random(seed)
    var x = 50.0
    Array.fill(n) { x += rng.nextDouble() * 10 - 5; x }
  }

  test("dftReal matches the direct DFT at awkward and power-of-two lengths") {
    for (n <- Seq(1, 2, 3, 5, 16, 100, 257, 345, 1024, 3450)) {
      val x = series(n, n)
      val (fr, fi) = Fft.dftReal(x)
      val (dr, di) = directDft(x)
      val scale = math.max(1.0, x.map(math.abs).sum)
      for (k <- 0 until n) {
        assert(math.abs(fr(k) - dr(k)) / scale < 1e-10, s"n=$n k=$k re")
        assert(math.abs(fi(k) - di(k)) / scale < 1e-10, s"n=$n k=$k im")
      }
    }
  }

  test("halfPsd agrees across the direct/Bluestein threshold") {
    // same series evaluated by both paths: force each by length choice
    // around directThreshold = 256, and cross-check against the direct DFT
    for (n <- Seq(255, 256, 257, 512)) {
      val x = series(n, 7 * n)
      val psd = Fft.halfPsd(x)
      val (dr, di) = directDft(x)
      val tot = psd.sum
      for (k <- 1 to n / 2) {
        val exp = dr(k) * dr(k) + di(k) * di(k)
        assert(math.abs(psd(k - 1) - exp) <= 1e-9 * math.max(tot, 1.0),
          s"n=$n k=$k")
      }
    }
  }

  test("pure tone lands all power in its bin either path") {
    for (n <- Seq(64, 1000)) {
      val f = 5
      val x = Array.tabulate(n)(t => math.cos(2.0 * math.Pi * f * t / n))
      val psd = Fft.halfPsd(x)
      val hot = psd(f - 1)
      assert(math.abs(hot - n.toDouble * n / 4) < 1e-6 * n * n)
      assert(psd.zipWithIndex.filter(_._2 != f - 1).map(_._1).max < 1e-12 * n * n)
    }
  }
}
