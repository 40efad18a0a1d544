package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native kernels for the two tsfel temporal members whose Catalyst
  * formulations were per-element-allocating (the q100 100× profile):
  * `neighbourhood_peaks` built a (2n+1)-element tuple ARRAY per position
  * (11 slices + zip_with concat for n = 5), and `hist` rebuilt the
  * per-bin counter array once per element inside its fold. Both are one
  * primitive pass here; semantics match the replaced Column versions
  * exactly (same tie/boundary/empty conventions, documented per kernel).
  * NaN inputs follow Java comparison semantics — see the EntropyKernels
  * module note; NaN windows are outside the oracle contract.
  */
object TemporalKernelUtil {

  /** tsfel `neighbourhood_peaks(n)`: count of samples strictly greater
    * than ALL 2n neighbours within ±n positions; boundary samples (no
    * full neighbourhood) never count; windows shorter than 2n+1 give 0.
    */
  def neighbourhoodPeaks(arr: ArrayData, nn: Int): Long = {
    val n = arr.numElements()
    if (n < 2 * nn + 1) return 0L
    val x = new Array[Double](n)
    var i = 0
    while (i < n) { x(i) = arr.getDouble(i); i += 1 }
    var cnt = 0L
    i = nn
    while (i < n - nn) {
      var ok = true
      var j = i - nn
      while (ok && j <= i + nn) {
        if (j != i && !(x(i) > x(j))) ok = false
        j += 1
      }
      if (ok) cnt += 1
      i += 1
    }
    cnt
  }

  /** tsfel `hist(bins)`: per-bin counts over equal-width bins spanning
    * [min, max], right-inclusive last bin (np.histogram); a constant
    * window (min == max) puts all samples in bin 1 (the documented
    * deviation of the Column version); an empty window is all zeros.
    * NaN samples are SKIPPED — they matched no bin in the replaced
    * Column form (floor(NaN) → null), and they already never moved
    * min/max here (NaN comparisons are false); an all-NaN window is
    * therefore all zeros, like an empty one.
    */
  def histCounts(arr: ArrayData, bins: Int): InternalRowLike = {
    val n = arr.numElements()
    val counts = new Array[Long](bins)
    if (n > 0) {
      val x = new Array[Double](n)
      var i = 0
      var mn = Double.PositiveInfinity
      var mx = Double.NegativeInfinity
      while (i < n) {
        x(i) = arr.getDouble(i)
        if (x(i) < mn) mn = x(i)
        if (x(i) > mx) mx = x(i)
        i += 1
      }
      i = 0
      while (i < n) {
        if (!java.lang.Double.isNaN(x(i))) {
          val b =
            if (mx > mn) {
              val raw = math.floor((x(i) - mn) / (mx - mn) * bins).toInt
              if (raw > bins - 1) bins - 1 else raw
            } else 0
          counts(b) += 1
        }
        i += 1
      }
    }
    val out = new Array[Any](bins)
    var b = 0
    while (b < bins) { out(b) = counts(b); b += 1 }
    new GenericInternalRow(out)
  }
  type InternalRowLike = org.apache.spark.sql.catalyst.InternalRow
}

/** Native neighbourhood-peak count (see
  * [[TemporalKernelUtil.neighbourhoodPeaks]]). Never null: short/empty
  * windows count 0, matching the Column fold over an empty tuple array.
  */
case class NeighbourhoodPeaksK(child: Expression, nn: Int)
  extends ArrayDoubleKernel {
  override def dataType: DataType = LongType
  override def prettyName: String = "neighbourhood_peaks"
  override def nullSafeEval(a: Any): Any =
    TemporalKernelUtil.neighbourhoodPeaks(a.asInstanceOf[ArrayData], nn)
  override protected def withNewChildInternal(
      newChild: Expression): NeighbourhoodPeaksK = copy(child = newChild)
}
object NeighbourhoodPeaksK {
  def apply(arr: Column, nn: Int): Column =
    ColumnBridge.column(NeighbourhoodPeaksK(ColumnBridge.expression(arr), nn))
}

/** Native histogram counts (see [[TemporalKernelUtil.histCounts]]) —
  * struct hist1..histB of longs; empty windows are all zeros.
  */
case class HistCountsK(child: Expression, bins: Int)
  extends ArrayDoubleKernel {
  override def dataType: DataType = StructType(
    (1 to bins).map(b => StructField(s"hist$b", LongType)))
  override def prettyName: String = "hist_counts"
  override def nullSafeEval(a: Any): Any =
    TemporalKernelUtil.histCounts(a.asInstanceOf[ArrayData], bins)
  override protected def withNewChildInternal(
      newChild: Expression): HistCountsK = copy(child = newChild)
}
object HistCountsK {
  def apply(arr: Column, bins: Int): Column =
    ColumnBridge.column(HistCountsK(ColumnBridge.expression(arr), bins))
}
