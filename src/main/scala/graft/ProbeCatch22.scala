package graft

import org.apache.spark.sql.catalyst.util.ArrayData

/** Scratch: per-member wall profile of the catch22/24 battery on a
  * synthetic window of the q109 shape (~3.3k samples of the events value
  * distribution), plus whole-battery throughput — attributes q109's 100×
  * CPU before any kernel surgery.
  */
object ProbeCatch22 {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 3333
    val reps = if (args.length > 1) args(1).toInt else 20
    val rnd = new scala.util.Random(42)
    // events value shape: smooth daily component + noise (what q109's 1D
    // windows actually carry; distribution matters for histogram/embed
    // members)
    val x = Array.tabulate(n)(i =>
      math.sin(i * 2 * math.Pi / n) * 3 + rnd.nextGaussian())
    val arr = ArrayData.toArrayData(x)
    // warm up the whole battery
    (1 to 5).foreach(_ => graft.expr.Catch22Util.compute(arr, catch24 = true))
    val t0 = System.nanoTime()
    (1 to reps).foreach(_ => graft.expr.Catch22Util.compute(arr, catch24 = true))
    val per = (System.nanoTime() - t0) / 1e6 / reps
    println(f"PROBEC22 battery n=$n ${per}%.2f ms/window")
    graft.expr.Catch22Util.timings = true
    graft.expr.Catch22Util.compute(arr, catch24 = true)
    graft.expr.Catch22Util.timings = false
  }
}
