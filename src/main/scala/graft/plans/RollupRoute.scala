package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.DoubleType

/** Plan-level rollup routing — the one piece of Kenshin's read path that
  * Catalyst cannot learn on its own (SURVEY §4.1): that `rollup_1h` is
  * derivable from the raw points table, so an hourly aggregate over raw
  * should READ THE ROLLUP instead of scanning points.
  *
  * [[RollupCatalog.register]] declares "this raw parquet path has an
  * hourly materialized rollup (metric, bucket, sum_v, n, min_v, max_v)";
  * [[RollupRouteRule]] then rewrites any matching
  * `Aggregate(metric, date_trunc('hour', ts), <avg|sum|min|max|count>)`
  * over that scan into a Project over the rollup — at 100 TB that turns
  * a 10^8-row-per-metric scan into a 10^5-row one, the reference's
  * headline read economy.
  *
  * The rule is deliberately conservative: it fires only on the exact
  * supported shape (no residual filters, supported aggregates over the
  * value column, hourly truncation of the scan's own ts column) and
  * leaves every other plan untouched. Enable per session with
  * `spark.experimental.extraOptimizations ++= Seq(RollupRouteRule)` (or
  * graft.GraftExtensions at session build).
  */
object RollupCatalog {
  final case class Entry(rawPath: String, rollup: LogicalPlan)
  @volatile private var entries: List[Entry] = Nil

  /** Declare `rollupDf` (schema: metric, bucket, sum_v DECIMAL, n, min_v,
    * max_v) as the hourly rollup of the parquet table at `rawPath`.
    *
    * CONTRACT: the raw table's `value` column must contain no nulls (true
    * of everything the ingest path writes — parseLines/parseFrames drop
    * null values). With nulls, `avg(value)` (null-skipping) and the
    * rewrite's `sum_v / n` (n = all rows) would diverge. */
  def register(rawPath: String, rollupDf: DataFrame): Unit =
    entries = Entry(normalize(rawPath),
      rollupDf.queryExecution.analyzed) :: entries

  def clear(): Unit = entries = Nil

  private[plans] def lookup(paths: Seq[String]): Option[Entry] =
    entries.find(e => paths.map(normalize).contains(e.rawPath))

  private def normalize(p: String): String =
    p.stripPrefix("file:").replaceAll("/+$", "")
}

object RollupRouteRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(groupings, aggExprs, child, _) =>
      rewrite(agg, groupings, aggExprs, child).getOrElse(agg)
  }

  /** Walk transparent Projects down to the scan, accumulating alias
    * definitions (the optimizer's PullOutGroupingExpressions hoists
    * `date_trunc` into a `_groupingexpression` alias below the
    * Aggregate) plus filters whose predicates reference ONLY the metric
    * column — those are metric selection, which the rollup preserves
    * exactly, so they push through. Any other filter aborts the match
    * (a value/ts predicate changes what the rollup pre-aggregated). */
  private def scanPaths(plan: LogicalPlan,
      aliases: Map[ExprId, Expression] = Map.empty,
      metricFilters: Seq[Expression] = Nil)
      : Option[(Seq[String], Map[ExprId, Expression], Seq[Expression])] =
    plan match {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        Some((fs.location.rootPaths.map(_.toString), aliases, metricFilters))
      case Project(list, child) =>
        val newAliases = list.collect {
          case a @ Alias(e, _) => a.exprId -> e
        }.toMap
        scanPaths(child, aliases ++ newAliases, metricFilters)
      case Filter(cond, child)
          if splitConjunctivePredicates(cond).forall(metricOnly) =>
        scanPaths(child, aliases,
          metricFilters ++ splitConjunctivePredicates(cond))
      case _ => None
    }

  private def splitConjunctivePredicates(c: Expression): Seq[Expression] =
    c match {
      case And(l, r) =>
        splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
      case other => Seq(other)
    }

  private def metricOnly(e: Expression): Boolean = {
    val refs = e.references.toSeq
    refs.nonEmpty && refs.forall(_.name == "metric")
  }

  private def rewrite(agg: Aggregate, groupings: Seq[Expression],
      aggExprs: Seq[NamedExpression], child: LogicalPlan): Option[LogicalPlan] = {
    for {
      (paths, aliases, metricFilters) <- scanPaths(child)
      entry <- RollupCatalog.lookup(paths)
      out <- buildProject(agg, groupings, aggExprs, entry.rollup, aliases,
        metricFilters)
    } yield out
  }

  /** Match groupings = {metric, date_trunc('hour', ts)} and aggregates
    * over `value`; emit a Project over the rollup with the ORIGINAL
    * output exprIds so the surrounding plan stays resolved. */
  private def buildProject(agg: Aggregate, groupings: Seq[Expression],
      aggExprs: Seq[NamedExpression], rollup: LogicalPlan,
      aliases: Map[ExprId, Expression],
      metricFilters: Seq[Expression]): Option[LogicalPlan] = {
    def rollupCol(name: String): Option[Attribute] =
      rollup.output.find(_.name == name)

    // resolve attribute refs through the hoisted-alias map
    def deref(e: Expression): Expression = e match {
      case a: AttributeReference => aliases.getOrElse(a.exprId, a)
      case other => other
    }
    // grains the hourly rollup can serve: its own, plus any calendar
    // grain no hour boundary straddles (re-aggregated below)
    val coarser = Set("day", "week", "month", "quarter", "year")
    def truncOf(e: Expression): Option[TruncTimestamp] = deref(e) match {
      case t @ TruncTimestamp(Literal(fmt, _), tsAttr: AttributeReference, _)
          if tsAttr.name == "ts" && // the rollup bucketed THIS column
            (String.valueOf(fmt).equalsIgnoreCase("hour") ||
              coarser(String.valueOf(fmt).toLowerCase)) => Some(t)
      case Alias(c, _) => truncOf(c)
      case _ => None
    }
    def isMetric(e: Expression): Boolean = deref(e) match {
      case a: AttributeReference => a.name == "metric"
      case Alias(c, _) => isMetric(c)
      case _ => false
    }
    val trunc = groupings.flatMap(truncOf).headOption
    val groupable = groupings.length == 2 &&
      groupings.exists(isMetric) && trunc.isDefined
    if (!groupable) return None
    val grain = String.valueOf(
      trunc.get.format.asInstanceOf[Literal].value).toLowerCase
    def isHourTrunc(e: Expression): Boolean = truncOf(e).isDefined

    val (metricOut, bucketOut, sumOut, nOut, minOut, maxOut) =
      (rollupCol("metric"), rollupCol("bucket"), rollupCol("sum_v"),
        rollupCol("n"), rollupCol("min_v"), rollupCol("max_v"))
    if (Seq(metricOut, bucketOut, sumOut, nOut, minOut, maxOut)
        .exists(_.isEmpty)) return None

    def overValue(e: Expression): Boolean = e match {
      case a: AttributeReference => a.name == "value"
      case Cast(c, _, _, _) => overValue(c)
      case _ => false
    }

    // re-anchor pushed metric predicates onto the rollup's metric col
    val base =
      if (metricFilters.isEmpty) rollup
      else {
        val cond = metricFilters.map(_.transform {
          case a: AttributeReference if a.name == "metric" => metricOut.get
        }).reduce(And)
        Filter(cond, rollup)
      }

    if (grain == "hour") {
      // same grain: pure column remapping over the stored archive
      val projected: Seq[Option[NamedExpression]] = aggExprs.map {
        case ne if isMetric(ne) =>
          Some(Alias(metricOut.get, ne.name)(exprId = ne.exprId))
        case ne if isHourTrunc(ne) =>
          Some(Alias(bucketOut.get, ne.name)(exprId = ne.exprId))
        case ne @ Alias(AggregateExpression(fn, _, false, None, _), name) =>
          val repl: Option[Expression] = fn match {
            case Average(v, _) if overValue(v) =>
              Some(Divide(Cast(sumOut.get, DoubleType),
                Cast(nOut.get, DoubleType)))
            case Sum(v, _) if overValue(v) =>
              Some(Cast(sumOut.get, DoubleType))
            case Min(v) if overValue(v) => Some(minOut.get)
            case Max(v) if overValue(v) => Some(maxOut.get)
            case Count(Seq(Literal(_, _))) => Some(nOut.get)
            case _ => None
          }
          repl.map(e => Alias(e, name)(exprId = ne.exprId))
        case _ => None
      }
      if (projected.exists(_.isEmpty)) None
      else Some(Project(projected.flatten, base))
    } else {
      // coarser grain: re-aggregate the archive — exact, because the
      // rollup stores decimal partial sums and counts (avg-of-raw ==
      // sum(sum_v)/sum(n), never avg-of-avgs)
      val coarseBucket = trunc.get.copy(timestamp = bucketOut.get)
      def aggOf(fn: AggregateFunction): Expression =
        fn.toAggregateExpression()
      val results: Seq[Option[NamedExpression]] = aggExprs.map {
        case ne if isMetric(ne) =>
          Some(Alias(metricOut.get, ne.name)(exprId = ne.exprId))
        case ne if isHourTrunc(ne) =>
          Some(Alias(coarseBucket, ne.name)(exprId = ne.exprId))
        case ne @ Alias(AggregateExpression(fn, _, false, None, _), name) =>
          val repl: Option[Expression] = fn match {
            case Average(v, _) if overValue(v) =>
              Some(Divide(Cast(aggOf(Sum(sumOut.get)), DoubleType),
                Cast(aggOf(Sum(nOut.get)), DoubleType)))
            case Sum(v, _) if overValue(v) =>
              Some(Cast(aggOf(Sum(sumOut.get)), DoubleType))
            case Min(v) if overValue(v) => Some(aggOf(Min(minOut.get)))
            case Max(v) if overValue(v) => Some(aggOf(Max(maxOut.get)))
            case Count(Seq(Literal(_, _))) =>
              Some(Cast(aggOf(Sum(nOut.get)),
                org.apache.spark.sql.types.LongType))
            case _ => None
          }
          repl.map(e => Alias(e, name)(exprId = ne.exprId))
        case _ => None
      }
      if (results.exists(_.isEmpty)) None
      else Some(Aggregate(Seq(metricOut.get, coarseBucket),
        results.flatten, base, None))
    }
  }
}
