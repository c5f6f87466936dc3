// Lives inside the org.apache.spark.sql namespace on purpose: a native
// Catalyst expression needs `private[sql]` surface (AbstractDataType for
// ExpectsInputTypes, ExpressionUtils for the Expression→Column bridge).
// This is the established pattern for libraries shipping codegen
// expressions on Spark 4; the public entry point is re-exported as
// graft.functions.cosineSim.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Fused cosine similarity over two `ARRAY<FLOAT>` columns — a native
  * Catalyst expression with whole-stage codegen.
  *
  * Why an Expression and not `aggregate(zip_with(...))`: the higher-order
  * form allocates an intermediate array per row and evaluates a lambda per
  * element; this kernel is one tight primitive loop inside the generated
  * code (no allocation, no virtual calls), which is the difference between
  * "fine on 500 vectors" and "fine on 10^9 vectors". Accumulation is a
  * single sequential double loop in index order, so results are
  * bit-identical to a sequential fold — the property the DuckDB oracle
  * parity relies on.
  *
  * Semantics: dot(a,b) / (||a||·||b||) over the common prefix length;
  * null if either side is null (null-intolerant).
  */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimExpr {
  /** Column API: `CosineSimExpr(colA, colB)` → DOUBLE cosine. */
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(
      CosineSimExpr(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
