// Same private[sql] surface rationale as CosineSim.scala; re-exported as
// graft.functions.{CmSketch, CmQuery}.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

import graft.functions.CountMin

/** Count–min sketch as ONE native mergeable aggregate — the point-lookup
  * frequency sibling of [[HeavyHittersAggExpr]] (kernel + guarantees:
  * [[graft.functions.CountMin]]). Output is the self-describing
  * serialized sketch (BINARY); probe it with [[CmQueryExpr]] /
  * SQL `cm_query(sketch, item)`. The shuffle carries one fixed
  * depth×width grid per (group × partition) — vocabulary-independent,
  * and the pointwise-sum merge is EXACT, so partial aggregation is
  * byte-identical to a sequential pass (spec-asserted). */
case class CountMinAggExpr(child: Expression, depth: Int, width: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with ExpectsInputTypes with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 16 && width >= 1 && width <= (1 << 22),
    s"cm_sketch needs 1 <= depth <= 16 and 1 <= width <= 2^22, " +
      s"got depth=$depth width=$width")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "cm_sketch"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) CountMin.observe(buf, depth, width, v.toString)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    CountMin.combine(a, b)

  override def eval(buf: Array[Long]): Any =
    CountMin.serialize(buf, depth, width)

  override def serialize(buf: Array[Long]): Array[Byte] =
    CountMin.serialize(buf, depth, width)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    CountMin.deserialize(bytes)._3

  override def withNewMutableAggBufferOffset(o: Int): CountMinAggExpr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinAggExpr =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(
      c: Expression): CountMinAggExpr = copy(child = c)
}

object CountMinAggExpr {
  /** Column API: STRING column → serialized depth×width sketch (BINARY). */
  def apply(c: Column, depth: Int, width: Int): Column =
    ExpressionUtils.column(
      CountMinAggExpr(ExpressionUtils.expression(c), depth, width)
        .toAggregateExpression())
}

/** Point lookup against a serialized count–min sketch: `cm_query(sketch,
  * item)` → the min-over-rows estimate (never undercounts). Codegen reads
  * cells straight off the BINARY at their offsets — no grid
  * materialization per probe. */
case class CmQueryExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(BinaryType, StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cm_query"

  override def nullSafeEval(sketch: Any, item: Any): Any =
    CountMin.query(sketch.asInstanceOf[Array[Byte]], item.toString)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, i) =>
      s"${ev.value} = graft.functions.CountMin.query($s, $i.toString());")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object CmQueryExpr {
  def apply(sketch: Column, item: Column): Column =
    ExpressionUtils.column(CmQueryExpr(
      ExpressionUtils.expression(sketch), ExpressionUtils.expression(item)))
}
