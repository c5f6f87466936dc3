// Lives inside the org.apache.spark.sql namespace on purpose — same
// private[sql] surface rationale as CosineSim.scala; re-exported as
// graft.functions.GramSums.
package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Quantized GRAM/MOMENT aggregate for the PCA family — the scale fix
  * the r14 sf1 soak demanded: the exploded self-join form of the
  * scatter-matrix feed materializes N·d² joined rows (204 M at sf1 —
  * 26-52 s), while this kernel does the same 200 M multiply-adds as
  * primitive-array arithmetic in ONE pass with map-side combine: the
  * shuffle carries one (d²+d+1)-long buffer per partition, independent
  * of N. Per row: qᵢ = floor(10⁴·xᵢ) (exactly the plan-side
  * quantization text), buf[i·d+j] += qᵢ·qⱼ, the d per-coordinate sums
  * and the row count ride the same buffer. Every cell is an EXACT
  * Long (overflow at ~9·10¹⁰ rows per cell with unit-norm floats —
  * widen to a paired-longs cell past that; addExact guards the
  * merge). Emits [gram(d²) | sums(d) | count] as ARRAY<LONG> —
  * identical integers to the join form by construction, so the PCA
  * oracles are untouched. */
case class GramAggExpr(child: Expression, d: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with ExpectsInputTypes with UnaryLike[Expression] {

  require(d > 0 && d <= 4096, s"gram_sums dimension out of range: $d")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType))
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "gram_sums"

  private val size = d * d + d + 1

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](size)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == d,
        s"gram_sums: width ${arr.numElements()} != $d")
      val q = new Array[Long](d)
      var i = 0
      while (i < d) {
        q(i) = math.floor(arr.getFloat(i).toDouble * 10000.0).toLong
        i += 1
      }
      i = 0
      while (i < d) {
        val qi = q(i)
        val row = i * d
        var j = 0
        while (j < d) {
          buf(row + j) += qi * q(j)
          j += 1
        }
        buf(d * d + i) += qi
        i += 1
      }
      buf(d * d + d) += 1L
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < size) {
      a(i) = Math.addExact(a(i), b(i))
      i += 1
    }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < size) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](size)
    var i = 0
    while (i < size) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): GramAggExpr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramAggExpr =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): GramAggExpr =
    copy(child = c)
}

object GramAggExpr {
  /** Column API: ARRAY<FLOAT> column → [gram(d²) | sums(d) | n]. */
  def apply(c: Column, d: Int): Column =
    ExpressionUtils.column(
      GramAggExpr(ExpressionUtils.expression(c), d)
        .toAggregateExpression())
}
