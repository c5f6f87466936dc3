// Shim-package half of function registration: FunctionRegistry and
// sessionState are private[sql] surface. Public entry points are
// graft.functions.registerAll and graft.GraftExtensions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Column-API bridge for Spark's internal bloom expressions (private
  * [sql] surface — same shim rationale as CosineSim.scala). */
object BloomBridge {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
  import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
  import org.apache.spark.sql.classic.ExpressionUtils

  def agg(c: Column, estItems: Long, numBits: Long): Column =
    ExpressionUtils.column(new BloomFilterAggregate(
      ExpressionUtils.expression(c), Literal(estItems), Literal(numBits))
      .toAggregateExpression())

  def might(bloom: Column, key: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      ExpressionUtils.expression(bloom), ExpressionUtils.expression(key)))
}

/** graft's native expressions as SQL functions, so `spark.sql` users get
  * the same codegen kernels as the Column API (`cosine_sim(a, b)`,
  * `simhash_agg(h)`). */
object GraftFunctionRegistry {

  val all: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimExpr].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "cosine_sim(arrayA, arrayB)")
        CosineSimExpr(exprs.head, exprs(1))
      }),
    (FunctionIdentifier("simhash_agg"),
      new ExpressionInfo(classOf[SimHashAggExpr].getName, "simhash_agg"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "simhash_agg(hash)")
        SimHashAggExpr(exprs.head)
      }),
    (FunctionIdentifier("heavy_hitters"),
      new ExpressionInfo(classOf[HeavyHittersAggExpr].getName,
        "heavy_hitters"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3,
          "heavy_hitters(item, capacityLit, kLit)")
        def intLit(e: Expression, what: String): Int = {
          require(e.foldable, s"heavy_hitters: $what must be a literal")
          e.eval().asInstanceOf[Number].intValue
        }
        HeavyHittersAggExpr(exprs.head, intLit(exprs(1), "capacity"),
          intLit(exprs(2), "k"))
      }),
    (FunctionIdentifier("cm_sketch"),
      new ExpressionInfo(classOf[CountMinAggExpr].getName, "cm_sketch"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3, "cm_sketch(item, depthLit, widthLit)")
        def intLit(e: Expression, what: String): Int = {
          require(e.foldable, s"cm_sketch: $what must be a literal")
          e.eval().asInstanceOf[Number].intValue
        }
        CountMinAggExpr(exprs.head, intLit(exprs(1), "depth"),
          intLit(exprs(2), "width"))
      }),
    (FunctionIdentifier("cm_query"),
      new ExpressionInfo(classOf[CmQueryExpr].getName, "cm_query"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "cm_query(sketch, item)")
        CmQueryExpr(exprs.head, exprs(1))
      }),
    // Spark ships codegen'd bloom expressions for its own runtime join
    // filtering but does not register them as SQL functions; surfacing
    // them completes the sketch triad (MG = who is frequent, CMS = how
    // often, bloom = membership) with zero new kernel code.
    (FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate].getName, "bloom_filter_agg"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3,
          "bloom_filter_agg(longCol, estItemsLit, numBitsLit)")
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(exprs.head, exprs(1), exprs(2))
      }),
    (FunctionIdentifier("image_ahash"),
      new ExpressionInfo(classOf[ImageAhashExpr].getName, "image_ahash"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "image_ahash(payload)")
        ImageAhashExpr(exprs.head)
      }),
    (FunctionIdentifier("audio_ahash"),
      new ExpressionInfo(classOf[AudioAhashExpr].getName, "audio_ahash"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "audio_ahash(payload)")
        AudioAhashExpr(exprs.head)
      }),
    (FunctionIdentifier("might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain].getName, "might_contain"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "might_contain(bloom, longValue)")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs.head, exprs(1))
      }))

  /** Register into a LIVE session (notebooks, tests). */
  def register(spark: SparkSession): Unit = all.foreach {
    case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }

  /** Inject at session build — wired by [[graft.GraftExtensions]] via
    * `spark.sql.extensions=graft.GraftExtensions`. */
  def inject(ext: SparkSessionExtensions): Unit =
    all.foreach(ext.injectFunction)
}
