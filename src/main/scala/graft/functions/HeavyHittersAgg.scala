// Lives inside the org.apache.spark.sql namespace on purpose — same
// private[sql] surface rationale as CosineSim.scala; re-exported as
// graft.functions.HeavyHitters.
package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items (heavy hitters) as ONE native mergeable aggregate —
  * Misra–Gries (1982) with the Agarwal et al. "Mergeable Summaries"
  * (PODS'12) combine step. THE sketch for "top tokens / domains / keys
  * at 100 TB": exact `groupBy(item).count` shuffles the full item
  * domain (the vocabulary), while this kernel's shuffle carries one
  * ≤ `capacity`-entry summary per (group × partition), independent of
  * both corpus and vocabulary size.
  *
  * Update: known item +1; room left → insert at 1; full → decrement
  * ALL by 1 and drop zeros (amortized O(1) per token: each overflow
  * event burns `capacity`+1 total count, so at most n/(capacity+1)
  * events happen). Merge: pointwise sum, then subtract the
  * (capacity+1)-th largest count and keep positives — the PODS'12 rule
  * that preserves the error bound under arbitrary merge trees.
  *
  * Guarantees (spec-asserted): estimates never overcount; undercount
  * ≤ n/(capacity+1); every item with true count > n/(capacity+1)
  * survives. When the group's distinct-item count never exceeds
  * `capacity`, no decrement ever fires and the summary is EXACT.
  *
  * Output: top `k` entries as array<struct<item,est>>, ordered by
  * (est DESC, item ASC) — the deterministic legend tiebreak.
  */
case class HeavyHittersAggExpr(child: Expression, capacity: Int, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
    with ExpectsInputTypes with UnaryLike[Expression] {

  require(capacity > 0 && k > 0 && k <= capacity,
    s"heavy_hitters needs 0 < k <= capacity, got k=$k capacity=$capacity")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "heavy_hitters"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) graft.functions.MisraGries.observe(buf, v.toString, capacity)
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] =
    graft.functions.MisraGries.combine(a, b, capacity)

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val top = graft.functions.MisraGries.topK(buf, k)
    new GenericArrayData(top.map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) =>
      val bytes = key.getBytes("UTF-8")
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val kb = new Array[Byte](len)
      in.readFully(kb)
      buf(new String(kb, "UTF-8")) = in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): HeavyHittersAggExpr =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHittersAggExpr =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(
      c: Expression): HeavyHittersAggExpr = copy(child = c)
}

object HeavyHittersAggExpr {
  /** Column API: STRING column → top-k array<struct<item,est>>. */
  def apply(c: Column, capacity: Int, k: Int): Column =
    ExpressionUtils.column(
      HeavyHittersAggExpr(ExpressionUtils.expression(c), capacity, k)
        .toAggregateExpression())
}
