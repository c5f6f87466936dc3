package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DoubleType, TimestampType}

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
  * supported shape (metric-only and hour-aligned ts-range filters,
  * supported aggregates over the value column, hourly truncation of the
  * scan's own ts column) and leaves every other plan untouched. Every
  * matched metric/ts/value reference is resolved through the collected
  * Project aliases down to an attribute OF THE SCAN ITSELF, so a Project
  * that redefines a column under the same name (`withColumn("value",
  * col("value") * 2)`) aborts the rewrite instead of silently routing to
  * pre-aggregates of the original values. Enable per session with
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

  /** A scan is routable only when it reads EXACTLY the registered path:
    * a multi-path read (`spark.read.parquet(raw, other)`) unions other
    * rows the rollup never saw, so it must keep the raw scan. */
  private[plans] def lookup(paths: Seq[String]): Option[Entry] =
    entries.find(e => paths.map(normalize) == Seq(e.rawPath))

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
    * Aggregate) and every filter conjunct on the way. Classification of
    * the conjuncts (metric selection / aligned ts range / anything else
    * → abort) happens in [[buildProject]], once the full alias map and
    * the scan's own output are known. */
  private def scanDown(plan: LogicalPlan,
      aliases: Map[ExprId, Expression] = Map.empty,
      filters: Seq[Expression] = Nil)
      : Option[(LogicalRelation, Map[ExprId, Expression], Seq[Expression])] =
    plan match {
      case lr @ LogicalRelation(_: HadoopFsRelation, _, _, _, _) =>
        Some((lr, aliases, filters))
      case Project(list, child) =>
        val newAliases = list.collect {
          case a @ Alias(e, _) => a.exprId -> e
        }.toMap
        scanDown(child, aliases ++ newAliases, filters)
      case Filter(cond, child) =>
        scanDown(child, aliases, filters ++ splitConjunctivePredicates(cond))
      case _ => None
    }

  private def splitConjunctivePredicates(c: Expression): Seq[Expression] =
    c match {
      case And(l, r) =>
        splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
      case other => Seq(other)
    }

  private def rewrite(agg: Aggregate, groupings: Seq[Expression],
      aggExprs: Seq[NamedExpression], child: LogicalPlan): Option[LogicalPlan] = {
    for {
      (relation, aliases, filters) <- scanDown(child)
      paths = relation.relation.asInstanceOf[HadoopFsRelation]
        .location.rootPaths.map(_.toString)
      entry <- RollupCatalog.lookup(paths)
      out <- buildProject(agg, groupings, aggExprs, entry.rollup, relation,
        aliases, filters)
    } yield out
  }

  /** Match groupings = {metric, date_trunc('hour'+, ts)} and aggregates
    * over `value`; emit a Project (or re-aggregation for coarser grains)
    * over the rollup with the ORIGINAL output exprIds so the surrounding
    * plan stays resolved. */
  private def buildProject(agg: Aggregate, groupings: Seq[Expression],
      aggExprs: Seq[NamedExpression], rollup: LogicalPlan,
      relation: LogicalRelation,
      aliases: Map[ExprId, Expression],
      filters: Seq[Expression]): Option[LogicalPlan] = {
    val scanIds = relation.output.map(_.exprId).toSet
    def rollupCol(name: String): Option[Attribute] =
      rollup.output.find(_.name == name)

    // Resolve an expression through the alias chain until it is no longer
    // a reference to a Project-defined alias — chains strictly descend
    // the plan, so this terminates.
    @annotation.tailrec
    def resolve(e: Expression): Expression = e match {
      case a: AttributeReference if aliases.contains(a.exprId) =>
        resolve(aliases(a.exprId))
      case Alias(c, _) => resolve(c)
      case other => other
    }
    // The load-bearing check: a matched column must resolve to an
    // attribute OF THE SCAN with the expected name — never name-only
    // (a shadowing Project alias resolves to its defining expression
    // instead and the rewrite aborts).
    def scanAttr(e: Expression, name: String): Boolean = resolve(e) match {
      case a: AttributeReference => a.name == name && scanIds(a.exprId)
      case _ => false
    }

    // grains the hourly rollup can serve: its own, plus any calendar
    // grain no hour boundary straddles (re-aggregated below)
    val coarser = Set("day", "week", "month", "quarter", "year")
    def truncOf(e: Expression): Option[TruncTimestamp] = resolve(e) match {
      case t @ TruncTimestamp(Literal(fmt, _), tsExpr, _)
          if scanAttr(tsExpr, "ts") && // the rollup bucketed THIS column
            (String.valueOf(fmt).equalsIgnoreCase("hour") ||
              coarser(String.valueOf(fmt).toLowerCase)) => Some(t)
      case _ => None
    }
    def isMetric(e: Expression): Boolean = scanAttr(e, "metric")
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

    // Only a cast to DOUBLE is transparent (the raw value column is
    // DOUBLE, so it is a no-op): a NARROWING cast — sum(CAST(value AS
    // INT)), avg(value.cast("decimal(10,2)")) — changes per-row values
    // before aggregation and must keep the raw scan.
    def overValue(e: Expression): Boolean = resolve(e) match {
      case Cast(c, DoubleType, _, _) => overValue(c)
      case other => scanAttr(other, "value")
    }

    // ---- filter classification -----------------------------------------
    // metric-only predicates push through unchanged (the rollup preserves
    // metric exactly); ts-range predicates whose bound lands on an hour
    // boundary are EXACTLY representable against the rollup's bucket
    // column, because bucket B covers the raw half-open range [B, B+1h):
    //   ts >= L (L aligned)  ⟺  bucket >= L   (bucket-complete)
    //   ts <  U (U aligned)  ⟺  bucket <  U   (bucket-complete)
    // while `ts > L` / `ts <= U` split a bucket and abort, as does any
    // non-aligned bound (a raw-scan fringe union would be needed).
    // This holds for coarser grains too: the filter selects raw rows, the
    // rewrite selects exactly the hour buckets covering them, and the
    // coarse re-aggregation groups the same rows either way.
    // Alignment is checked by evaluating the SAME hour truncation the
    // rollup uses (session timezone and all): L is usable iff it is a
    // fixed point of date_trunc('hour', ·). A raw micros % 3600e6 test
    // would wrongly accept UTC-aligned bounds that sit mid-bucket in a
    // fractional-offset session timezone (+05:30).
    def alignedTs(l: Literal): Boolean =
      l.dataType == TimestampType && l.value != null && {
        val asTrunc = TruncTimestamp(
          Literal(org.apache.spark.unsafe.types.UTF8String.fromString("hour")),
          l, trunc.get.timeZoneId)
        asTrunc.eval(null) == l.value
      }
    def tsRange(e: Expression): Option[Expression] = e match {
      case GreaterThanOrEqual(t, l: Literal)
          if scanAttr(t, "ts") && alignedTs(l) =>
        Some(GreaterThanOrEqual(bucketOut.get, l))
      case LessThanOrEqual(l: Literal, t)
          if scanAttr(t, "ts") && alignedTs(l) =>
        Some(GreaterThanOrEqual(bucketOut.get, l))
      case LessThan(t, l: Literal) if scanAttr(t, "ts") && alignedTs(l) =>
        Some(LessThan(bucketOut.get, l))
      case GreaterThan(l: Literal, t) if scanAttr(t, "ts") && alignedTs(l) =>
        Some(LessThan(bucketOut.get, l))
      // null ts rows land in the rollup's null bucket (date_trunc(null)),
      // so the optimizer-injected null guard maps exactly
      case IsNotNull(t) if scanAttr(t, "ts") =>
        Some(IsNotNull(bucketOut.get))
      case _ => None
    }
    def metricOnly(e: Expression): Boolean = {
      val refs = e.references.toSeq
      refs.nonEmpty && refs.forall(a => scanAttr(a, "metric"))
    }
    val classified: Seq[Option[Expression]] = filters.map { f =>
      if (metricOnly(f))
        // re-anchor onto the rollup's metric column
        Some(f.transform {
          case a: AttributeReference if scanAttr(a, "metric") => metricOut.get
        })
      else tsRange(f)
    }
    if (classified.exists(_.isEmpty)) return None // unsupported predicate

    val base =
      if (classified.isEmpty) rollup
      else Filter(classified.flatten.reduce(And), rollup)

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
