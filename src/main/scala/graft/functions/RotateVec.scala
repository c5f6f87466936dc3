// Same private[sql] surface rationale as CosineSim.scala; re-exported as
// graft.functions.RotateVec.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, FloatType}

/** Dense matrix × vector kernel shared by the eval and codegen paths —
  * the OPQ rotation applied per row (Ge et al., CVPR'13: an orthogonal
  * R learned offline; `R·v` re-expresses the vector in the basis PQ
  * subspaces are carved from). The matrix rides along as a codegen
  * reference object (`float[][]`, row-major), so the per-row work is a
  * tight primitive double-accumulation loop — no allocation beyond the
  * output array, no lambda dispatch. Inputs shorter than a row
  * contribute zeros (ragged inputs degrade instead of throw).
  */
object RotateCodecs {

  def rotate(a: ArrayData, r: Array[Array[Float]]): ArrayData = {
    val rows = r.length
    val dim = a.numElements()
    val out = new Array[Float](rows)
    var i = 0
    while (i < rows) {
      val row = r(i)
      val lim = math.min(row.length, dim)
      var d = 0.0
      var j = 0
      while (j < lim) { d += row(j).toDouble * a.getFloat(j); j += 1 }
      out(i) = d.toFloat
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** `ARRAY<FLOAT>` vector → `ARRAY<FLOAT>` rotated vector (`R·v`). */
case class RotateVecExpr(child: Expression, rot: Array[Array[Float]])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rotate_vec"

  override def nullSafeEval(input: Any): Any =
    RotateCodecs.rotate(input.asInstanceOf[ArrayData], rot)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("rotMatrix", rot, "float[][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.RotateCodecs.rotate($a, $r);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RotateVecExpr {
  def apply(c: Column, rot: Array[Array[Float]]): Column =
    ExpressionUtils.column(RotateVecExpr(ExpressionUtils.expression(c), rot))
}
