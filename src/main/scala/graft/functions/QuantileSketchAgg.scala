// Lives inside the org.apache.spark.sql namespace on purpose — same
// private[sql] surface rationale as CosineSim.scala; re-exported as
// graft.functions.QuantileEdges.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

import graft.functions.QuantileSketch

/** Mergeable quantile-edge aggregate — [[graft.functions.QuantileSketch]]
  * as ONE native TypedImperativeAggregate (the HeavyHitters/CountMin
  * discipline): a DOUBLE column reduces to B−1 equiprobable edges
  * without an exact percentile sort; the shuffle carries one
  * ≤ k·log(n/k)-entry summary per (group × partition), independent of
  * corpus size. Output carries the sketch's SELF-CERTIFIED worst-case
  * rank error (`err_bound`, in item counts — exact bookkeeping of
  * every compaction, 0 when no compaction fired) plus n, so callers
  * can assert calibration quality instead of trusting it. */
case class QuantileEdgesAggExpr(child: Expression, k: Int, bins: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileSketch.Buf]
    with ExpectsInputTypes with UnaryLike[Expression] {

  require(k >= 2 && bins >= 2,
    s"quantile_edges needs k >= 2 and bins >= 2, got k=$k bins=$bins")

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = StructType(Seq(
    StructField("edges", ArrayType(DoubleType, containsNull = false),
      nullable = false),
    StructField("err_bound", LongType, nullable = false),
    StructField("n", LongType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "quantile_edges"

  override def createAggregationBuffer(): QuantileSketch.Buf =
    new QuantileSketch.Buf(k)

  override def update(buf: QuantileSketch.Buf,
      input: InternalRow): QuantileSketch.Buf = {
    val v = child.eval(input)
    if (v != null) QuantileSketch.observe(buf, v.asInstanceOf[Double])
    buf
  }

  override def merge(a: QuantileSketch.Buf,
      b: QuantileSketch.Buf): QuantileSketch.Buf =
    QuantileSketch.combine(a, b)

  override def eval(buf: QuantileSketch.Buf): Any =
    InternalRow(
      new GenericArrayData(
        QuantileSketch.edges(buf, bins).map(Double.box).toArray[Any]),
      buf.errBound, buf.n)

  override def serialize(buf: QuantileSketch.Buf): Array[Byte] =
    QuantileSketch.serialize(buf)

  override def deserialize(bytes: Array[Byte]): QuantileSketch.Buf =
    QuantileSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): QuantileEdgesAggExpr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantileEdgesAggExpr =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(
      c: Expression): QuantileEdgesAggExpr = copy(child = c)
}

object QuantileEdgesAggExpr {
  /** Column API: DOUBLE column → struct<edges array<double>,
    * err_bound long, n long>. */
  def apply(c: Column, k: Int, bins: Int): Column =
    ExpressionUtils.column(
      QuantileEdgesAggExpr(ExpressionUtils.expression(c), k, bins)
        .toAggregateExpression())
}
