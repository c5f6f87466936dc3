// Lives inside the org.apache.spark.sql namespace on purpose: a native
// Catalyst expression needs `private[sql]` surface (AbstractDataType for
// ExpectsInputTypes, ExpressionUtils for the Expression→Column bridge).
// Same pattern as CosineSimExpr.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, FloatType, LongType}

/** Sign-LSH band signatures over an `ARRAY<FLOAT>` embedding — a native
  * Catalyst expression with whole-stage codegen (r18).
  *
  * Replaces the `posexplode(embedding) ⋈ broadcast(planes) → groupBy
  * (vec, plane) dot-sum → groupBy (vec, band) byte-sum` pipeline: that
  * shape is linear but pays an N·d row explode, an N·d·P joined-row
  * stream and TWO aggregation exchanges per signature build. This
  * kernel is one tight primitive loop per row (no explode, no join, no
  * shuffle) producing the per-band bucket hashes directly.
  *
  * BIT-EXACT with the replaced pipeline: each plane's dot accumulates
  * in ascending element order as `((double) x_i) * w_j_i` — exactly the
  * partial-aggregate order of the explode form (explode emits elements
  * in order within the parent row's partition, so every (vec, plane)
  * group summed map-side in pos order); null elements contribute
  * nothing (SQL sum semantics); elements past the plane dimension drop
  * (the pos equi-join behavior); an EMPTY embedding returns an empty
  * array so the vector vanishes under posexplode exactly as it vanished
  * from the joined relation. Band j's bit is set iff dot > 0 (strict,
  * as the `when(dot > 0, shiftleft(...))` it replaces).
  *
  * The hyperplane matrix regenerates from (seed, nPlanes, dim) with the
  * same `new Random(seed)` gaussian fill as the DataFrame it replaces —
  * primitive constructor args keep the case-class equality/
  * canonicalization clean (an Array field would defeat plan matching).
  */
case class SignLshBandsExpr(child: Expression, seed: Int, nPlanes: Int,
    dim: Int, bandBits: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sign_lsh_bands"

  // plane-major, identical to Array.fill(nPlanes, dim)(rnd.nextGaussian())
  @transient private lazy val planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  private def nBands: Int = nPlanes / bandBits

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val len = math.min(x.numElements(), dim)
    if (x.numElements() == 0) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](nBands)
    var j = 0
    while (j < nPlanes) {
      val w = planes(j)
      var s = 0.0
      var i = 0
      while (i < len) {
        if (!x.isNullAt(i)) s += x.getFloat(i).toDouble * w(i)
        i += 1
      }
      if (s > 0) out(j / bandBits) |= 1L << (j % bandBits)
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val pl = ctx.addReferenceObj("planes", planes, "double[][]")
      val len = ctx.freshName("len")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val w = ctx.freshName("w")
      s"""
         |int $len = java.lang.Math.min($a.numElements(), $dim);
         |if ($a.numElements() == 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[0]);
         |} else {
         |  long[] $out = new long[$nBands];
         |  for (int $j = 0; $j < $nPlanes; $j++) {
         |    double[] $w = $pl[$j];
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $len; $i++) {
         |      if (!$a.isNullAt($i)) $s += ((double) $a.getFloat($i)) * $w[$i];
         |    }
         |    if ($s > 0) $out[$j / $bandBits] |= 1L << ($j % $bandBits);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignLshBandsExpr {
  /** Column API: per-band sign-LSH bucket hashes (ARRAY<LONG>, one
    * element per band, band index = array position). */
  def apply(embedding: Column, seed: Int, nPlanes: Int, dim: Int,
      bandBits: Int): Column =
    ExpressionUtils.column(SignLshBandsExpr(
      ExpressionUtils.expression(embedding), seed, nPlanes, dim, bandBits))
}
