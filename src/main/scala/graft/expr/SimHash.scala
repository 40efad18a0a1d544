package graft.expr

import java.security.MessageDigest
import java.util.regex.Pattern
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime kernel for one-pass SimHash-32 over word unigrams. Semantics are
  * EXACTLY the Column formulation it replaces (explode words → md5 hex →
  * per-bit ±1 by hex-digit parity → sign of the sum), which is also what
  * the DuckDB oracle computes: bit j of the fingerprint is set iff the
  * count of tokens whose md5 hex digit j is odd is >= half the token count
  * (signed sum >= 0). One MessageDigest per call, zero shuffle.
  */
object SimHashUtil {
  private val ws = Pattern.compile("\\s+")
  private val tl = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  def simhash32(text: UTF8String): Long = {
    val words = ws.split(text.trim.toString, -1)
    val md = tl.get()
    val counts = new Array[Int](32)
    var w = 0
    while (w < words.length) {
      md.reset()
      val digest = md.digest(words(w).getBytes("UTF-8"))
      // hex digit j = high/low nibble of byte j/2; parity = lowest bit
      var j = 0
      while (j < 32) {
        val nibble =
          if ((j & 1) == 0) (digest(j >> 1) >> 4) & 0xf
          else digest(j >> 1) & 0xf
        counts(j) += (if ((nibble & 1) == 1) 1 else -1)
        j += 1
      }
      w += 1
    }
    var fp = 0L
    var j = 0
    while (j < 32) {
      if (counts(j) >= 0) fp |= 1L << j
      j += 1
    }
    fp
  }

  /** SimHash-64: bit b of the fingerprint draws its ±1 from BIT (b mod 4)
    * of md5 hex digit (b div 4) — four signature bits per hex digit over
    * the first 16 hex digits, so the DuckDB oracle can extract the same
    * parity with nibble shifts. The wider signature is what keeps banded
    * Hamming retrieval sub-quadratic past ~10^7 documents: 4 bands of 16
    * bits give 65k buckets per band vs SimHash-32's 256.
    */
  def simhash64(text: UTF8String): Long = {
    val words = ws.split(text.trim.toString, -1)
    val md = tl.get()
    val counts = new Array[Int](64)
    var w = 0
    while (w < words.length) {
      md.reset()
      val digest = md.digest(words(w).getBytes("UTF-8"))
      var b = 0
      while (b < 64) {
        val d = b >> 2 // hex digit index 0..15
        val nibble =
          if ((d & 1) == 0) (digest(d >> 1) >> 4) & 0xf
          else digest(d >> 1) & 0xf
        counts(b) += (if (((nibble >> (b & 3)) & 1) == 1) 1 else -1)
        b += 1
      }
      w += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) >= 0) fp |= 1L << b
      b += 1
    }
    fp
  }
}

/** Native one-pass SimHash-32 of a string column — replaces an explode +
  * md5-per-token + 32-aggregate groupBy pipeline with a map-side projection
  * (no shuffle at all). Differential-tested bit-identical to the Column
  * formulation (SimHashSpec).
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash32 requires a string argument, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override def nullSafeEval(t: Any): Any =
    SimHashUtil.simhash32(t.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.SimHashUtil.simhash32($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object SimHash32 {
  def apply(text: Column): Column =
    ColumnBridge.column(SimHash32(ColumnBridge.expression(text)))
}

/** Native one-pass SimHash-64 — same kernel shape as [[SimHash32]] with a
  * bit-level (rather than digit-level) parity source; see
  * [[SimHashUtil.simhash64]] for the layout the DuckDB oracle mirrors.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires a string argument, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(t: Any): Any =
    SimHashUtil.simhash64(t.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.SimHashUtil.simhash64($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def apply(text: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(text)))
}
