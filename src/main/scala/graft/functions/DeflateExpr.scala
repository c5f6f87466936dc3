// Same private[sql] surface rationale as CosineSim.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes,
  Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed byte length of a string as a native scalar —
  * SQL `deflate_len(text)` → LONG. The kernel pins the Deflater to
  * level 6 / default strategy / zlib wrapper, so the length is a
  * deterministic function of the bytes on a given JVM (the
  * compression-ratio quality signal is spec-gated no-oracle: DuckDB
  * has no DEFLATE). Codegen calls the byte-level kernel directly —
  * whole-stage-friendly, no UDF. */
case class DeflateLenExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "deflate_len"

  override def nullSafeEval(s: Any): Any =
    graft.llm.TextZ.deflatedLen(s.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"graft.llm.TextZ.deflatedLen(($p).getBytes())")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object DeflateLenExpr {
  def apply(text: Column): Column =
    ExpressionUtils.column(DeflateLenExpr(
      ExpressionUtils.expression(text)))
}
