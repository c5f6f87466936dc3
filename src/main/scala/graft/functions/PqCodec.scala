// Same private[sql] surface rationale as CosineSim.scala; re-exported as
// graft.functions.{PqEncode, PqDecode}.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BinaryType, DataType, FloatType}

/** Product-quantization kernels (Jégou et al., TPAMI'11) shared by the
  * eval and codegen paths. The codebook rides along as a codegen
  * reference object (`float[][][]`: subspace → code → codeword), so the
  * per-row work is tight primitive loops — no per-row allocation beyond
  * the m-byte output, no lambda dispatch. Vectors are L2-normalized
  * inside the encoder (PQ over normalized vectors + L2 codebooks is the
  * standard angular-distance setup), so cosine against a reconstruction
  * approximates cosine against the original.
  */
object PqCodecs {

  /** Encode one vector: per subspace, the code of the L2-nearest codeword
    * of the NORMALIZED input. Out-of-range reads (input shorter than
    * m×dsub) contribute zeros, so ragged inputs degrade instead of throw. */
  def encode(a: ArrayData, cb: Array[Array[Array[Float]]]): Array[Byte] = {
    val m = cb.length
    val dsub = cb(0)(0).length
    val dim = a.numElements()
    var nrm = 0.0
    var i = 0
    while (i < dim) { val x = a.getFloat(i).toDouble; nrm += x * x; i += 1 }
    val inv = if (nrm == 0.0) 0.0f else (1.0 / math.sqrt(nrm)).toFloat
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      val book = cb(s)
      var best = 0
      var bestd = Float.MaxValue
      var c = 0
      while (c < book.length) {
        val cw = book(c)
        var d = 0.0f
        var j = 0
        while (j < dsub) {
          val idx = s * dsub + j
          val x = (if (idx < dim) a.getFloat(idx) * inv else 0.0f) - cw(j)
          d += x * x
          j += 1
        }
        if (d < bestd) { bestd = d; best = c }
        c += 1
      }
      out(s) = best.toByte
      s += 1
    }
    out
  }

  /** Reconstruct the (normalized-space) vector a code array stands for:
    * the concatenation of its codewords. Codes past the codebook length
    * wrap via modulo — corrupt codes degrade instead of throw. */
  def decode(codes: Array[Byte], cb: Array[Array[Array[Float]]]): ArrayData = {
    val dsub = cb(0)(0).length
    val out = new Array[Float](cb.length * dsub)
    val m = math.min(codes.length, cb.length)
    var s = 0
    while (s < m) {
      val book = cb(s)
      val cw = book(java.lang.Byte.toUnsignedInt(codes(s)) % book.length)
      System.arraycopy(cw, 0, out, s * dsub, dsub)
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** `ARRAY<FLOAT>` embedding → m-byte PQ code (BINARY). */
case class PqEncodeExpr(child: Expression,
    codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any =
    PqCodecs.encode(input.asInstanceOf[ArrayData], codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "float[][][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.PqCodecs.encode($a, $cb);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncodeExpr {
  def apply(c: Column, cb: Array[Array[Array[Float]]]): Column =
    ExpressionUtils.column(PqEncodeExpr(ExpressionUtils.expression(c), cb))
}

/** m-byte PQ code (BINARY) → reconstructed `ARRAY<FLOAT>` — feed the
  * result to [[CosineSimExpr]] for asymmetric-distance scoring. */
case class PqDecodeExpr(child: Expression,
    codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_decode"

  override def nullSafeEval(input: Any): Any =
    PqCodecs.decode(input.asInstanceOf[Array[Byte]], codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "float[][][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.sql.graft.PqCodecs.decode($a, $cb);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqDecodeExpr {
  def apply(c: Column, cb: Array[Array[Array[Float]]]): Column =
    ExpressionUtils.column(PqDecodeExpr(ExpressionUtils.expression(c), cb))
}
