package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** The sequential half of the Eckmann `lyap_e` spectrum (m = 2): fold the
  * per-step companion matrices T_i = [[0, 1], [a1ᵢ, a2ᵢ]] through the QR
  * re-orthogonalization chain
  *
  *   B = T_i · Q,  B = Q' R,  λ_k += ln |R_kk|,
  *
  * carrying the 2×2 orthogonal Q in closed form (Givens: c = b11/r11,
  * s = b21/r11, r22 = det(B)/r11). The input is the per-key array of
  * (step, a1, a2) FIT RESULTS — produced by the distributed relational
  * stages of [[graft.scale.GroupedStats.lyapE]] (neighbor search and
  * least-squares are the O(n²) work and stay relational; only this
  * O(n)-per-key fold is sequential, bounded by the documented per-key
  * series-length contract, same as higuchi/DFA). Exponents are the
  * per-step averages λ_k = Σ ln |R_kk| / steps (unit sample time);
  * degenerate steps (r11 = 0, or r22 = 0 for λ₂) are skipped without
  * advancing Q. Returns (lyap_e_1, lyap_e_2), null when no step
  * contributed.
  *
  * Reference surface: nolds `lyap_e` in the FuncWrapper battery at
  * tests/test_features_integration.py:470-498 (matrix_dim 2 variant; our
  * documented conventions — Chebyshev neighborhoods of the minNb-th
  * smallest radius, companion-form Jacobians, no intercept — are
  * mirrored exactly by the DuckDB oracle's recursive-CTE twin).
  */
object LyapEFoldUtil {
  val dataType: StructType = StructType(Seq(
    StructField("lyap_e_1", DoubleType), StructField("lyap_e_2", DoubleType)))

  def compute(arr: ArrayData): Any = {
    val n = arr.numElements()
    var q11 = 1.0; var q12 = 0.0; var q21 = 0.0; var q22 = 1.0
    var l1 = 0.0; var l2 = 0.0
    var c1 = 0L; var c2 = 0L
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 3)
      val a1 = row.getDouble(1)
      val a2 = row.getDouble(2)
      val b11 = q21; val b12 = q22
      val b21 = a1 * q11 + a2 * q21
      val b22 = a1 * q12 + a2 * q22
      val r11 = math.sqrt(b11 * b11 + b21 * b21)
      if (r11 > 0) {
        val r22 = (b11 * b22 - b21 * b12) / r11
        val c = b11 / r11
        val s = b21 / r11
        q11 = c; q12 = -s; q21 = s; q22 = c
        l1 += math.log(r11); c1 += 1
        if (math.abs(r22) > 0) { l2 += math.log(math.abs(r22)); c2 += 1 }
      }
      i += 1
    }
    val out = new Array[Any](2)
    out(0) = if (c1 > 0) java.lang.Double.valueOf(l1 / c1) else null
    out(1) = if (c2 > 0) java.lang.Double.valueOf(l2 / c2) else null
    new GenericInternalRow(out)
  }
}

/** Native QR-chain fold for the Eckmann spectrum (see [[LyapEFoldUtil]]). */
case class LyapEFold(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(fs), _)
      if fs.length == 3 && fs(1).dataType == DoubleType &&
        fs(2).dataType == DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lyap_e_fold requires array<struct<_, double, double>>, got ${t.sql}")
  }
  override def dataType: DataType = LyapEFoldUtil.dataType
  override def nullable: Boolean = true
  override def prettyName: String = "lyap_e_fold"

  override def nullSafeEval(a: Any): Any =
    LyapEFoldUtil.compute(a.asInstanceOf[ArrayData])

  override protected def withNewChildInternal(
      newChild: Expression): LyapEFold = copy(child = newChild)
}

object LyapEFold {
  def apply(arr: Column): Column =
    ColumnBridge.column(LyapEFold(ColumnBridge.expression(arr)))
}
