// Lives inside the org.apache.spark.sql namespace on purpose — same
// private[sql] surface rationale as CosineSim.scala; re-exported as
// graft.functions.SimHashAgg.
package org.apache.spark.sql.graft

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** SimHash 64-bit signature as ONE native aggregate (Charikar STOC'02):
  * per-bit majority vote over input hashes, held in a single 64-counter
  * buffer per group.
  *
  * Why a TypedImperativeAggregate and not 64 × `sum(when(bit,1,-1))`
  * columns: the column form carries 64 separate long accumulators through
  * the hash aggregate (wide rows, 64 conditional expressions evaluated
  * per input), while this kernel is one tight loop updating an int[64] —
  * the per-token cost drops from 64 expression evaluations to 64 adds.
  * Partial aggregation (map-side combine) still applies: `merge` adds
  * counter vectors, so the shuffle carries one 256-byte buffer per
  * (group × partition), not tokens.
  *
  * Semantics: bit b of the result is 1 iff strictly more input hashes had
  * bit b set than unset (ties → 0) — identical to the column formula it
  * replaces (asserted in LlmSpec). Null inputs are ignored; an empty
  * group yields signature 0L.
  */
case class SimHashAggExpr(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]]
    with ExpectsInputTypes with UnaryLike[Expression] {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash_agg"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < 64) {
        buf(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (buf(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(o: Int): SimHashAggExpr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashAggExpr =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): SimHashAggExpr =
    copy(child = c)
}

object SimHashAggExpr {
  /** Column API: aggregate a LONG hash column into the 64-bit simhash. */
  def apply(h: Column): Column =
    ExpressionUtils.column(
      SimHashAggExpr(ExpressionUtils.expression(h)).toAggregateExpression())
}
