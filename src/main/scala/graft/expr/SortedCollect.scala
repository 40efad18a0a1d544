package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native sorted-window collection — the shared plumbing under every
  * order-dependent feature in the A7 stock (reference semantics: the
  * per-window `pd.Series` view the reference hands each feature function,
  * tsflex/features/segmenter/strided_rolling.py:326-332 — values arrive
  * index-sorted because the series itself is).
  *
  * Replaces `transform(array_sort(collect_list(struct(i, v))), _.v)`, which
  * paid three structural costs at scale, all per WINDOW per DESCRIPTOR:
  *
  *   1. `collect_list(struct)` buffers one boxed UnsafeRow per element
  *      (~56 B + GC pressure for an 8-byte payload);
  *   2. `array_sort` on struct elements runs an INTERPRETED field-by-field
  *      comparator per compare (n log n boxed ordinal calls);
  *   3. `array_sort`/`transform` carry lambda variables, which Catalyst's
  *      subexpression elimination refuses — so a battery of k descriptors
  *      over one series re-collected and re-sorted the SAME window k times
  *      (the LttFoldK scaladoc records the same lambda-CSE cliff).
  *
  * [[CollectSortedVals]] is a TypedImperativeAggregate over (idx, value):
  * the buffer is two growing PRIMITIVE arrays (sortable-long index keys +
  * raw values), partials concatenate, and the single final sort runs at
  * `eval` as an indirect merge sort on positions with primitive long-key
  * compares. Identical aggregate calls dedup in planning (PhysicalAggregation
  * canonicalizes away the result id), so k descriptors share ONE buffer and
  * ONE sort by construction — no reliance on projection CSE.
  *
  * Ordering contract (differential-pinned in SortedCollectSpec): exactly
  * Spark's `array_sort` default comparator on `struct<i: double, v: double>`
  * — compare i then v with SQL double ordering (−0.0 == 0.0, every NaN equal
  * to NaN and greater than +Inf, null field first), realized by a monotone
  * bits transform ([[SortKernelUtil.sortableBits]]) so the sort itself
  * compares longs. Null values are never collected (the replaced form's
  * `when(v.isNotNull, …)` made the struct null and collect_list dropped it);
  * null indexes collect with a sentinel key below every real key (the
  * replaced form kept the struct and array_sort put null-first). The output
  * is the values-only array — index order is the only thing the index
  * contributes, so no null can appear in the result.
  */
object SortKernelUtil {

  /** Monotone double → signed-long key under Spark SQL's total order for
    * doubles (`SQLOrderingUtil.compareDoubles`): −0.0 normalized to 0.0,
    * NaNs canonicalized (doubleToLongBits) and mapped above +Inf.
    * `Long.MinValue` is reserved for the null-field sentinel: the smallest
    * real key (−Inf) maps strictly above it.
    */
  def sortableBits(d: Double): Long = {
    val l = java.lang.Double.doubleToLongBits(if (d == 0.0) 0.0 else d)
    if (l >= 0L) l else java.lang.Long.MIN_VALUE - l
  }

  /** Stable indirect merge sort of positions [0, n) by primary long key,
    * ties broken by the value's own sortable bits (computed lazily — real
    * index keys are near-unique, so the tie path is cold). Stability makes
    * the (key, value)-equal case order-independent, matching array_sort.
    */
  def sortPerm(ki: Array[Long], vs: Array[Double], n: Int): Array[Int] = {
    var perm = new Array[Int](n)
    var i = 0
    while (i < n) { perm(i) = i; i += 1 }
    if (n < 2) return perm
    var aux = new Array[Int](n)
    var width = 1
    while (width < n) {
      var lo = 0
      while (lo < n) {
        val mid = math.min(lo + width, n)
        val hi = math.min(lo + 2 * width, n)
        var a = lo
        var b = mid
        var o = lo
        while (a < mid && b < hi) {
          val pa = perm(a)
          val pb = perm(b)
          var c = java.lang.Long.compare(ki(pa), ki(pb))
          if (c == 0) c = java.lang.Long.compare(sortableBits(vs(pa)), sortableBits(vs(pb)))
          if (c <= 0) { aux(o) = pa; a += 1 } else { aux(o) = pb; b += 1 }
          o += 1
        }
        while (a < mid) { aux(o) = perm(a); a += 1; o += 1 }
        while (b < hi) { aux(o) = perm(b); b += 1; o += 1 }
        lo = hi
      }
      val t = perm; perm = aux; aux = t
      width <<= 1
    }
    perm
  }
}

/** Mutable primitive buffer for [[CollectSortedVals]]: parallel growing
  * arrays of sortable index keys and raw values. Partial merge is a raw
  * concatenation; the sort happens once, at final eval.
  */
final class SortedValsBuffer(initial: Int = 16) {
  var n: Int = 0
  var ki: Array[Long] = new Array[Long](initial)
  var vs: Array[Double] = new Array[Double](initial)

  def add(k: Long, v: Double): Unit = {
    if (n == ki.length) grow(n << 1)
    ki(n) = k
    vs(n) = v
    n += 1
  }

  def appendAll(o: SortedValsBuffer): Unit = {
    val want = n + o.n
    if (want > ki.length) {
      var c = ki.length
      while (c < want) c <<= 1
      grow(c)
    }
    System.arraycopy(o.ki, 0, ki, n, o.n)
    System.arraycopy(o.vs, 0, vs, n, o.n)
    n = want
  }

  private def grow(c: Int): Unit = {
    ki = java.util.Arrays.copyOf(ki, c)
    vs = java.util.Arrays.copyOf(vs, c)
  }
}

/** See the module note. `dataType` is the index-sorted values array;
  * non-nullable like the collect_list chain it replaces (zero rows give an
  * empty array, and null values are never collected).
  */
case class CollectSortedVals(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SortedValsBuffer] with BinaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType | LongType | IntegerType, DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double|bigint|int, double), got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "collect_sorted_vals"

  override def createAggregationBuffer(): SortedValsBuffer = new SortedValsBuffer()

  // Integral indexes key as their own value (signed long order IS numeric
  // order, exact at any magnitude — no double round-trip). The null
  // sentinel collides only with a literal Long.MinValue index, where the
  // v tie-break still yields a deterministic order.
  @transient private lazy val keyOf: Any => Long = left.dataType match {
    case DoubleType => i => SortKernelUtil.sortableBits(i.asInstanceOf[Double])
    case LongType => i => i.asInstanceOf[Long]
    case IntegerType => i => i.asInstanceOf[Int].toLong
  }

  override def update(buf: SortedValsBuffer, input: InternalRow): SortedValsBuffer = {
    val v = right.eval(input)
    if (v != null) {
      val i = left.eval(input)
      val k = if (i == null) java.lang.Long.MIN_VALUE else keyOf(i)
      buf.add(k, v.asInstanceOf[Double])
    }
    buf
  }

  override def merge(buf: SortedValsBuffer, other: SortedValsBuffer): SortedValsBuffer = {
    buf.appendAll(other)
    buf
  }

  override def eval(buf: SortedValsBuffer): Any = {
    val n = buf.n
    val perm = SortKernelUtil.sortPerm(buf.ki, buf.vs, n)
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = buf.vs(perm(i)); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def serialize(buf: SortedValsBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.n * 16)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.ki(i)); i += 1 }
    i = 0
    while (i < buf.n) { bb.putDouble(buf.vs(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SortedValsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new SortedValsBuffer(math.max(n, 1))
    var i = 0
    while (i < n) { buf.ki(i) = bb.getLong(); i += 1 }
    i = 0
    while (i < n) { buf.vs(i) = bb.getDouble(); i += 1 }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectSortedVals =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectSortedVals =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CollectSortedVals =
    copy(left = newLeft, right = newRight)
}

object CollectSortedVals {
  def apply(idx: Column, v: Column): Column =
    ColumnBridge.column(CollectSortedVals(
      ColumnBridge.expression(idx), ColumnBridge.expression(v))
      .toAggregateExpression())
}

/** One-pass Hjorth variance pair over the index-sorted window (reference:
  * the antropy `hjorth_params` member of the integration surface,
  * tests/test_features_integration.py:375-380): var_pop of the first and
  * second differences in ONE primitive pass — the replaced Column form
  * materialized the dx and ddx arrays (slice + zip_with, one boxed element
  * per step) and folded each through an `aggregate` lambda. Accumulation
  * order and the (n, Σ, Σ²) finish are the replaced chains' exactly
  * (differential-pinned in SortedCollectSpec): dx_j = x[j+1] − x[j] summed
  * left-to-right into (s, s²) interleaved per element; ddx likewise over
  * the dx values; finish (Σd² − (Σd)²/n)/n. `vdx` is null for windows
  * shorter than 2, `vddx` shorter than 3 — the empty-array aggregate's
  * null finish. var_pop(x) itself stays the caller's native order-free
  * aggregate, as before.
  */
case class HjorthFoldK(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.sql}")
  }
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("vdx", DoubleType), StructField("vddx", DoubleType)))
  override def prettyName: String = "hjorth_fold"
  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var n1 = 0L; var s1 = 0.0; var q1 = 0.0
    var n2 = 0L; var s2 = 0.0; var q2 = 0.0
    var prev = 0.0
    var prevDx = 0.0
    var i = 0
    while (i < n) {
      val x = arr.getDouble(i)
      if (i >= 1) {
        val dx = x - prev
        n1 += 1; s1 += dx; q1 += dx * dx
        if (i >= 2) {
          val dd = dx - prevDx
          n2 += 1; s2 += dd; q2 += dd * dd
        }
        prevDx = dx
      }
      prev = x
      i += 1
    }
    val vdx: Any = if (n1 > 0) {
      val d = n1.toDouble
      java.lang.Double.valueOf((q1 - s1 * s1 / d) / d)
    } else null
    val vddx: Any = if (n2 > 0) {
      val d = n2.toDouble
      java.lang.Double.valueOf((q2 - s2 * s2 / d) / d)
    } else null
    new GenericInternalRow(Array[Any](vdx, vddx))
  }
  override protected def withNewChildInternal(newChild: Expression): HjorthFoldK =
    copy(child = newChild)
}

object HjorthFoldK {
  def apply(sorted: Column): Column =
    ColumnBridge.column(HjorthFoldK(ColumnBridge.expression(sorted)))
}

/** Sign-change count of the first differences over the index-sorted window
  * (reference: the antropy `petrosian_fd` N_Δ term of the integration
  * surface's fractal sweep). Replaces the signum-transform array plus the
  * zip_with/aggregate fold: one pass tracking the previous difference's
  * signum, counting pairs whose signums differ under Spark SQL `=!=`
  * semantics (−0.0 equals 0.0; NaN equals NaN — so a NaN-signum pair
  * contributes 0, exactly as `when(a =!= b, 1.0)` evaluated). The count
  * accumulates as the same left-to-right double sum of 1.0s; windows with
  * fewer than two differences return 0.0 (the empty fold's base).
  */
case class PetrosianNdK(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.sql}")
  }
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "petrosian_nd"
  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 3) return 0.0
    var nd = 0.0
    var prev = arr.getDouble(0)
    var prevSg = 0.0
    var i = 1
    while (i < n) {
      val x = arr.getDouble(i)
      val sg = math.signum(x - prev)
      if (i >= 2 && !(sg == prevSg || (sg != sg && prevSg != prevSg))) nd += 1.0
      prevSg = sg
      prev = x
      i += 1
    }
    nd
  }
  override protected def withNewChildInternal(newChild: Expression): PetrosianNdK =
    copy(child = newChild)
}

object PetrosianNdK {
  def apply(sorted: Column): Column =
    ColumnBridge.column(PetrosianNdK(ColumnBridge.expression(sorted)))
}
