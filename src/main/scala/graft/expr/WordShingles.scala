package graft.expr

import java.util.regex.Pattern
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass runtime kernel for word k-gram shingling. Kept as a static
  * method so generated code calls it directly (the StaticInvoke pattern) —
  * the expression stays inside whole-stage codegen with no Expression.eval
  * virtual dispatch.
  */
object ShingleUtil {
  private val ws = Pattern.compile("\\s+")

  /** Distinct word k-grams of `text`, first-occurrence order. EXACTLY
    * mirrors the Column formulation
    * `array_distinct(slice(zip_with-fold(split(trim(text), "\\s+"))))`:
    * UTF8String.trim (0x20 only, like Spark's `trim`), regex split with
    * limit -1 (like Spark's `split`), words joined by single spaces, docs
    * with fewer than k words collapse to one all-words shingle.
    */
  def shingles(text: UTF8String, k: Int): ArrayData = {
    val words = ws.split(text.trim.toString, -1)
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (words.length < k) {
      out.add(UTF8String.fromString(words.mkString(" ")))
    } else {
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i + k <= words.length) {
        sb.setLength(0)
        var j = 0
        while (j < k) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        out.add(UTF8String.fromString(sb.toString))
        i += 1
      }
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  /** ALL word k-grams with multiplicity, occurrence order — the repetition
    * statistics need frequencies, so no dedup. Standard n-gram semantics:
    * a doc with fewer than k words has NO k-grams (unlike `shingles`, whose
    * dedup semantics collapse short docs to one all-words shingle).
    */
  def ngrams(text: UTF8String, k: Int): ArrayData = {
    val words = ws.split(text.trim.toString, -1)
    if (words.length < k) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](words.length - k + 1)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i + k <= words.length) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native distinct word k-gram shingles of a string column — one fused pass
  * per document instead of the k-1 chained `zip_with` concats + `slice` +
  * `array_distinct` Column formulation (which allocates k intermediate
  * arrays per row). Bit-identical output (same strings, same first-occurrence
  * order; differential-tested in WordShinglesSpec).
  */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "shingle size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires a string argument, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(t: Any): Any =
    ShingleUtil.shingles(t.asInstanceOf[UTF8String], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.ShingleUtil.shingles($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def apply(text: Column, k: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), k))
}

/** Native word k-grams WITH multiplicity (occurrence order, no dedup) — the
  * frequency-preserving sibling of [[WordShingles]], for repetition
  * statistics (Gopher-style duplicate/top n-gram fractions).
  */
case class WordNgrams(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "n-gram size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires a string argument, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(t: Any): Any =
    ShingleUtil.ngrams(t.asInstanceOf[UTF8String], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.ShingleUtil.ngrams($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {
  def apply(text: Column, k: Int): Column =
    ColumnBridge.column(WordNgrams(ColumnBridge.expression(text), k))
}
