// Same private[sql] surface rationale as CosineSim.scala.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes,
  Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Perceptual average-hash of a BMP image payload as a native scalar —
  * SQL `image_ahash(payload)` → LONG. Codegen calls the byte-level
  * kernel ([[graft.mm.MediaHash]]) directly, so a SQL user dedups an
  * image column with `bit_count(image_ahash(a) # image_ahash(b))`
  * exactly as the declared q_mm_image_dedup does. Malformed payloads
  * fail with MediaCodec's clean IllegalArgumentException. */
case class ImageAhashExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "image_ahash"

  override def nullSafeEval(payload: Any): Any =
    graft.mm.MediaHash.imageAhash(payload.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"graft.mm.MediaHash.imageAhash($p)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object ImageAhashExpr {
  def apply(payload: Column): Column =
    ExpressionUtils.column(ImageAhashExpr(
      ExpressionUtils.expression(payload)))
}

/** Energy-envelope hash of a WAV audio payload — SQL
  * `audio_ahash(payload)` → LONG ([[graft.mm.MediaHash.audioAhash]]). */
case class AudioAhashExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "audio_ahash"

  override def nullSafeEval(payload: Any): Any =
    graft.mm.MediaHash.audioAhash(payload.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, p => s"graft.mm.MediaHash.audioAhash($p)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object AudioAhashExpr {
  def apply(payload: Column): Column =
    ExpressionUtils.column(AudioAhashExpr(
      ExpressionUtils.expression(payload)))
}
