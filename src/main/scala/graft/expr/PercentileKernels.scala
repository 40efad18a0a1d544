package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native exact percentiles over a collected window: ONE primitive
  * double-array sort serves every requested quantile, replacing N
  * independent `percentile(v, q)` aggregates (each an OpenHashMap buffer
  * per window plus its own boxed sort at eval — the q71 100× ablation
  * measured the two `iqr` Percentile aggregates at ~80% of the fused
  * aggregate's executor CPU).
  *
  * Arithmetic is bit-pinned to Spark's `PercentileBase.getPercentile`
  * (verified against the 4.1.2 bytecode): position `(n − 1) · q`,
  * `lower = floor`, `higher = ceil`, result
  * `(higher − position) · v[lower] + (position − lower) · v[higher]`
  * with the equal-index/equal-value short-circuit returning `v[lower]`.
  * `java.util.Arrays.sort(double[])` orders exactly like the Percentile
  * aggregate's `PhysicalDataType.ordering` for doubles (NaN greatest,
  * −0.0 < 0.0); empty windows yield null, matching the aggregate's
  * empty-buffer null. Nulls never reach the array: the `collect_list`
  * feed skips them like Percentile's update does.
  */
object PercentileKernelUtil {

  /** Sorts a copy of `arr` and interpolates every `qs` entry. Null
    * elements are skipped exactly like the replaced `Percentile`
    * aggregate's update does (the `collect_list` feeds never contain
    * them, but `ArrayDoubleKernel` accepts `containsNull=true` inputs —
    * without the guard a foreign caller would read them as 0.0).
    * Returns null when no non-null element remains.
    */
  def percentiles(arr: ArrayData, qs: Array[Double]): Array[Double] = {
    val n = arr.numElements()
    var v = new Array[Double](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { v(m) = arr.getDouble(i); m += 1 }
      i += 1
    }
    if (m == 0) return null
    if (m != n) v = java.util.Arrays.copyOf(v, m)
    java.util.Arrays.sort(v)
    val out = new Array[Double](qs.length)
    var j = 0
    while (j < qs.length) {
      out(j) = interp(v, qs(j))
      j += 1
    }
    out
  }

  private def interp(sorted: Array[Double], q: Double): Double = {
    val pos = (sorted.length - 1).toDouble * q
    val lo = math.floor(pos)
    val hi = math.ceil(pos)
    val lv = sorted(lo.toInt)
    if (hi == lo) lv
    else {
      val hv = sorted(hi.toInt)
      // value-equality short-circuit mirrors PercentileBase (distinct map
      // keys there; adjacent EQUAL doubles here are the same case)
      if (lv == hv) lv
      else (hi - pos) * lv + (pos - lo) * hv
    }
  }
}

/** `array<double>` of the exact `qs` percentiles of the window (null for
  * an empty window) — see [[PercentileKernelUtil]].
  */
case class PercentilesK(child: Expression, qs: Seq[Double])
  extends ArrayDoubleKernel {
  require(qs.nonEmpty, "need at least one percentile")
  qs.foreach(q => require(q >= 0.0 && q <= 1.0, s"percentile $q outside [0, 1]"))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "percentiles_sorted"
  private lazy val qArr = qs.toArray
  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) null
    else {
      val p = PercentileKernelUtil.percentiles(arr, qArr)
      if (p == null) null else new GenericArrayData(p)
    }
  }
  override protected def withNewChildInternal(
      newChild: Expression): PercentilesK = copy(child = newChild)
}
object PercentilesK {
  def apply(arr: Column, qs: Seq[Double]): Column =
    ColumnBridge.column(PercentilesK(ColumnBridge.expression(arr), qs))
}

/** `pctl(qHi) − pctl(qLo)` in one sort (the IQR shape); null for an empty
  * window — see [[PercentileKernelUtil]].
  */
case class PercentileSpanK(child: Expression, qLo: Double, qHi: Double)
  extends ArrayDoubleKernel {
  Seq(qLo, qHi).foreach(q =>
    require(q >= 0.0 && q <= 1.0, s"percentile $q outside [0, 1]"))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "percentile_span"
  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) null
    else {
      val p = PercentileKernelUtil.percentiles(arr, Array(qLo, qHi))
      if (p == null) null else java.lang.Double.valueOf(p(1) - p(0))
    }
  }
  override protected def withNewChildInternal(
      newChild: Expression): PercentileSpanK = copy(child = newChild)
}
object PercentileSpanK {
  def apply(arr: Column, qLo: Double, qHi: Double): Column =
    ColumnBridge.column(
      PercentileSpanK(ColumnBridge.expression(arr), qLo, qHi))
}
