// Same private[sql] surface rationale as CosineSim.scala; re-exported as
// graft.functions.{SqEncode, SqDecode}.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BinaryType, DataType, FloatType}

/** Scalar-quantization (SQ8) kernels — the uniform per-dimension 8-bit
  * codec (Faiss `SQ8` [U]): each dimension of the L2-NORMALIZED vector
  * maps to `floor((x - min_d) / scale_d)` clamped to [0, 255], with
  * midpoint reconstruction `min_d + (code + 0.5) * scale_d`. One byte
  * per dimension — a 4× list-payload reduction against float32 with
  * far higher fidelity than PQ's m-byte codes (SQ8 keeps per-dimension
  * resolution; PQ shares codewords across dimensions). The standard
  * middle rung of the ANN memory ladder: flat → SQ8 → PQ. Model rides
  * along as codegen reference arrays; per-row work is a tight
  * primitive loop.
  */
object SqCodecs {

  /** Per-dim quantization model over NORMALIZED vectors: `scales(d)` is
    * (max_d - min_d) / 256. */
  def encode(a: ArrayData, mins: Array[Float],
      scales: Array[Float]): Array[Byte] = {
    val dim = mins.length
    val n = a.numElements()
    var nrm = 0.0
    var i = 0
    while (i < n) { val x = a.getFloat(i).toDouble; nrm += x * x; i += 1 }
    val inv = if (nrm == 0.0) 0.0f else (1.0 / math.sqrt(nrm)).toFloat
    val out = new Array[Byte](dim)
    var d = 0
    while (d < dim) {
      val x = if (d < n) a.getFloat(d) * inv else 0.0f
      val s = scales(d)
      // FLOOR binning pairs with midpoint decode: x in cell q ⇒
      // |decode - x| <= s/2 (round-binning would double the bound)
      val q = if (s <= 0.0f) 0
        else math.floor((x - mins(d)) / s).toInt
      out(d) = math.max(0, math.min(255, q)).toByte
      d += 1
    }
    out
  }

  /** Midpoint reconstruction in the normalized space. Codes shorter than
    * the model contribute the per-dim minimum — corrupt input degrades
    * instead of throwing. */
  def decode(codes: Array[Byte], mins: Array[Float],
      scales: Array[Float]): ArrayData = {
    val dim = mins.length
    val out = new Array[Float](dim)
    var d = 0
    while (d < dim) {
      val q = if (d < codes.length)
        java.lang.Byte.toUnsignedInt(codes(d)) else 0
      out(d) = mins(d) + (q + 0.5f) * scales(d)
      d += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** `ARRAY<FLOAT>` embedding → dim-byte SQ8 code (BINARY). */
case class SqEncodeExpr(child: Expression, mins: Array[Float],
    scales: Array[Float])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq_encode"

  override def nullSafeEval(input: Any): Any =
    SqCodecs.encode(input.asInstanceOf[ArrayData], mins, scales)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mn = ctx.addReferenceObj("sqMins", mins, "float[]")
    val sc = ctx.addReferenceObj("sqScales", scales, "float[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.SqCodecs.encode($a, $mn, $sc);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SqEncodeExpr {
  def apply(c: Column, mins: Array[Float], scales: Array[Float]): Column =
    ExpressionUtils.column(
      SqEncodeExpr(ExpressionUtils.expression(c), mins, scales))
}

/** dim-byte SQ8 code (BINARY) → reconstructed `ARRAY<FLOAT>` — feed to
  * [[CosineSimExpr]] for asymmetric-distance scoring. */
case class SqDecodeExpr(child: Expression, mins: Array[Float],
    scales: Array[Float])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq_decode"

  override def nullSafeEval(input: Any): Any =
    SqCodecs.decode(input.asInstanceOf[Array[Byte]], mins, scales)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mn = ctx.addReferenceObj("sqMins", mins, "float[]")
    val sc = ctx.addReferenceObj("sqScales", scales, "float[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.SqCodecs.decode($a, $mn, $sc);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SqDecodeExpr {
  def apply(c: Column, mins: Array[Float], scales: Array[Float]): Column =
    ExpressionUtils.column(
      SqDecodeExpr(ExpressionUtils.expression(c), mins, scales))
}
