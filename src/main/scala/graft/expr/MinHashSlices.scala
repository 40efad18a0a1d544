package graft.expr

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel for one-pass MinHash signatures over a shingle array.
  * Hash family: md5 hex of `shingle + "#" + g` sliced into four 8-hex
  * windows (lexicographic min on fixed-width lowercase hex == numeric min),
  * EXACTLY the Column formulation it replaces — and what the DuckDB oracle
  * twin computes — so signatures are bit-identical. One digest per
  * (element, group); mins tracked in-place, no intermediate arrays.
  */
object MinHashUtil {
  private val tl = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))
  private val hex = "0123456789abcdef".toCharArray

  /** numHashes per-slice minima as 8-hex strings; null entries when the
    * array is empty (matching `array_min` over an empty transform).
    */
  def slices(arr: ArrayData, numHashes: Int): ArrayData = {
    val groups = (numHashes + 3) / 4
    val md = tl.get()
    val mins = new Array[Array[Char]](numHashes)
    val n = arr.numElements()
    var e = 0
    while (e < n) {
      // null elements contribute nothing to the set's minima (a producer
      // like split()/collect_list can emit them; getBytes would NPE)
      val u8 = if (arr.isNullAt(e)) null else arr.getUTF8String(e)
      if (u8 == null) { e += 1 }
      else {
      val shingle = u8.getBytes
      var g = 0
      while (g < groups) {
        md.reset()
        md.update(shingle)
        md.update('#'.toByte)
        val gs = Integer.toString(g)
        var k = 0
        while (k < gs.length) { md.update(gs.charAt(k).toByte); k += 1 }
        val digest = md.digest()
        val hx = new Array[Char](32)
        var b = 0
        while (b < 16) {
          hx(b * 2) = hex((digest(b) >> 4) & 0xf)
          hx(b * 2 + 1) = hex(digest(b) & 0xf)
          b += 1
        }
        var s = 0
        while (s < 4) {
          val i = g * 4 + s
          if (i < numHashes) {
            val off = s * 8
            val cur = mins(i)
            if (cur == null || lessThan(hx, off, cur)) {
              val cp = new Array[Char](8)
              System.arraycopy(hx, off, cp, 0, 8)
              mins(i) = cp
            }
          }
          s += 1
        }
        g += 1
      }
      e += 1
      }
    }
    val out = new Array[Any](numHashes)
    var i = 0
    while (i < numHashes) {
      if (mins(i) != null) out(i) = UTF8String.fromString(new String(mins(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  private def lessThan(hx: Array[Char], off: Int, cur: Array[Char]): Boolean = {
    var k = 0
    while (k < 8) {
      val c = hx(off + k)
      if (c != cur(k)) return c < cur(k)
      k += 1
    }
    false
  }
}

/** Native MinHash signature expression: all `numHashes` slice-minima of a
  * shingle array in ONE pass — replaces `numHashes/4` interpreted
  * md5-transform lambdas plus `numHashes` substring-transform + array_min
  * lambdas per row. Map-side only; composes with `WordShingles`.
  */
case class MinHashSlices(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes >= 1, "numHashes must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_slices requires array<string>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_slices"

  override def nullSafeEval(a: Any): Any =
    MinHashUtil.slices(a.asInstanceOf[ArrayData], numHashes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.MinHashUtil.slices($c, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSlices =
    copy(child = newChild)
}

object MinHashSlices {
  def apply(arr: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSlices(ColumnBridge.expression(arr), numHashes))
}
