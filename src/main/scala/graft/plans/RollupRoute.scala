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
    // metric exactly). ts-range predicates decompose against the bucket
    // grid: bucket B covers the raw half-open range [B, B+1h), so for
    // bounds `ts >= L` / `ts < U` the region splits into
    //   INTERIOR — complete buckets [ceil(L), floor(U)), served by the
    //   rollup exactly, and
    //   FRINGE — the partial-bucket slivers [L, ceil(L)) ∪ [floor(U), U),
    //   which only the raw scan can serve.
    // Aligned bounds have empty fringes and keep the pure-rollup rewrite;
    // non-aligned bounds (every "last 24h from now" dashboard query)
    // rewrite to a UNION of rollup partials and singleton raw partials,
    // re-aggregated — see below. Strict bounds normalize EXACTLY to the
    // half-open form at the type's resolution (TimestampType IS Long
    // micros): `ts > L` ≡ `ts >= L+1µs`, `ts <= U` ≡ `ts < U+1µs` — no
    // value exists between adjacent micros, so the admitted row sets are
    // identical and the fringe machinery applies unchanged. floor/ceil use
    // the SAME hour truncation the rollup uses (session timezone and
    // all, by evaluating TruncTimestamp — a raw micros % 3600e6 test
    // would mis-bucket fractional-offset timezones like +05:30).
    val HourMicros = 3600L * 1000000L
    def hourFloor(micros: Long): Option[Long] = {
      val t = TruncTimestamp(
        Literal(org.apache.spark.unsafe.types.UTF8String.fromString("hour")),
        Literal(micros, TimestampType), trunc.get.timeZoneId)
      Option(t.eval(null)).map(_.asInstanceOf[Long])
    }
    def metricOnly(e: Expression): Boolean = {
      val refs = e.references.toSeq
      refs.nonEmpty && refs.forall(a => scanAttr(a, "metric"))
    }
    def tsLit(l: Literal): Option[Long] =
      if (l.dataType == TimestampType && l.value != null)
        Some(l.value.asInstanceOf[Long])
      else None
    // strict → half-open at µs resolution; MaxValue cannot advance (no
    // representable successor), so that degenerate literal keeps the raw
    // scan instead of wrapping
    def succ(m: Long): Option[Long] =
      if (m == Long.MaxValue) None else Some(m + 1L)

    val metricFs = Seq.newBuilder[Expression]
    var lowers = List.empty[Long] // ts >= L, micros
    var uppers = List.empty[Long] // ts < U, micros
    var nullGuard = false
    var unsupported = false
    filters.foreach { f =>
      if (metricOnly(f)) metricFs += f
      else f match {
        case GreaterThanOrEqual(t, l: Literal)
            if scanAttr(t, "ts") && tsLit(l).isDefined =>
          lowers ::= tsLit(l).get
        case LessThanOrEqual(l: Literal, t)
            if scanAttr(t, "ts") && tsLit(l).isDefined =>
          lowers ::= tsLit(l).get
        case LessThan(t, l: Literal)
            if scanAttr(t, "ts") && tsLit(l).isDefined =>
          uppers ::= tsLit(l).get
        case GreaterThan(l: Literal, t)
            if scanAttr(t, "ts") && tsLit(l).isDefined =>
          uppers ::= tsLit(l).get
        // strict forms: ts > L ≡ ts >= L+1µs (lower), ts <= U ≡
        // ts < U+1µs (upper) — exact, TimestampType is integral micros
        case GreaterThan(t, l: Literal)
            if scanAttr(t, "ts") && tsLit(l).flatMap(succ).isDefined =>
          lowers ::= tsLit(l).flatMap(succ).get
        case LessThan(l: Literal, t)
            if scanAttr(t, "ts") && tsLit(l).flatMap(succ).isDefined =>
          lowers ::= tsLit(l).flatMap(succ).get
        case LessThanOrEqual(t, l: Literal)
            if scanAttr(t, "ts") && tsLit(l).flatMap(succ).isDefined =>
          uppers ::= tsLit(l).flatMap(succ).get
        case GreaterThanOrEqual(l: Literal, t)
            if scanAttr(t, "ts") && tsLit(l).flatMap(succ).isDefined =>
          uppers ::= tsLit(l).flatMap(succ).get
        // null ts rows land in the rollup's null bucket
        // (date_trunc(null)), so the optimizer-injected guard maps
        case IsNotNull(t) if scanAttr(t, "ts") => nullGuard = true
        case _ => unsupported = true
      }
    }
    if (unsupported) return None
    // conjunction ⇒ the binding bounds are the max lower / min upper
    val lo: Option[Long] = if (lowers.isEmpty) None else Some(lowers.max)
    val up: Option[Long] = if (uppers.isEmpty) None else Some(uppers.min)
    val loFloor = lo.map(hourFloor); val upFloor = up.map(hourFloor)
    if (loFloor.exists(_.isEmpty) || upFloor.exists(_.isEmpty)) return None
    // first complete bucket at/after L; abort if the +1h step does not
    // land on a bucket start (sub-hour DST shifts)
    val loCeil: Option[Long] = (lo, loFloor.flatten) match {
      case (Some(l), Some(fl)) if l == fl => Some(l)
      case (Some(_), Some(fl)) =>
        val c = fl + HourMicros
        if (hourFloor(c).contains(c)) Some(c) else return None
      case _ => None
    }
    val fringeLo = (lo, loCeil) match {
      case (Some(l), Some(c)) if l != c => Some((l, c)) // [L, ceil(L))
      case _ => None
    }
    val fringeUp = (up, upFloor.flatten) match {
      case (Some(u), Some(fu)) if u != fu => Some((fu, u)) // [floor(U), U)
      case _ => None
    }

    def anchorMetric(target: Attribute): Seq[Expression] =
      metricFs.result().map(_.transform {
        case a: AttributeReference if scanAttr(a, "metric") => target
      })
    def mkTs(m: Long): Literal = Literal(m, TimestampType)

    // interior rollup slice: complete buckets only
    val interiorPreds: Seq[Expression] = anchorMetric(metricOut.get) ++
      loCeil.map(c => GreaterThanOrEqual(bucketOut.get, mkTs(c))) ++
      upFloor.flatten.map(f => LessThan(bucketOut.get, mkTs(f))) ++
      (if (nullGuard) Seq(IsNotNull(bucketOut.get)) else Nil)
    val base =
      if (interiorPreds.isEmpty) rollup
      else Filter(interiorPreds.reduce(And), rollup)

    def aggOf(fn: AggregateFunction): Expression = fn.toAggregateExpression()

    if (fringeLo.isDefined || fringeUp.isDefined) {
      // ---- interior ∪ fringe rewrite ---------------------------------
      // Both sides emit the same decomposable-partial shape
      // (metric, bucket, sum_c, n_c, min_c, max_c): the rollup row IS a
      // bucket partial; each fringe raw row becomes a singleton partial
      // (value, 1, value, value) under its hour bucket. One final
      // aggregate recombines them — exact for min/max/count, and
      // sum/avg recombine as EXACT DECIMAL (the registered-rollup
      // contract: values are ≤4-decimal, sum_v accumulates
      // DECIMAL(18,4) per-row casts), so the routed result is
      // partition-order independent like the aligned paths.
      // At 100 TB the fringe is ≤ 2 bucket-widths of raw rows (with the
      // ts bounds pushed into the scan) while the interior stays a
      // rollup read — the dominant cost collapses exactly as in the
      // aligned case.
      val rawMetric = relation.output.find(_.name == "metric")
      val rawTs = relation.output.find(_.name == "ts")
      val rawValue = relation.output.find(_.name == "value")
      if (Seq(rawMetric, rawTs, rawValue).exists(_.isEmpty)) return None
      val (rm, rt, rv) = (rawMetric.get, rawTs.get, rawValue.get)
      val windows: Seq[Expression] =
        fringeLo.toSeq.map { case (l, c) =>
          And(GreaterThanOrEqual(rt, mkTs(l)), LessThan(rt, mkTs(c)))
        } ++
        fringeUp.toSeq.map { case (f, u) =>
          And(GreaterThanOrEqual(rt, mkTs(f)), LessThan(rt, mkTs(u)))
        }
      // The original ts bounds must stay conjoined: when both bounds
      // fall inside ONE bucket (ceil(L) > floor(U)) or the region is
      // empty (L >= U), the windows extend beyond the query region and
      // window membership alone would ADMIT rows the raw plan excludes.
      val bounds: Seq[Expression] =
        lo.map(l => GreaterThanOrEqual(rt, mkTs(l))).toSeq ++
          up.map(u => LessThan(rt, mkTs(u)))
      val fringePred =
        (anchorMetric(rm) ++ bounds :+ windows.reduce(Or)).reduce(And)
      val hourOfTs = TruncTimestamp(
        Literal(org.apache.spark.unsafe.types.UTF8String.fromString("hour")),
        rt, trunc.get.timeZoneId)
      val sumDec = org.apache.spark.sql.types.DecimalType(28, 4)
      val interiorProj = Project(Seq(
        Alias(metricOut.get, "metric")(),
        Alias(bucketOut.get, "bucket")(),
        Alias(Cast(sumOut.get, sumDec), "sum_c")(),
        Alias(Cast(nOut.get, org.apache.spark.sql.types.LongType), "n_c")(),
        Alias(Cast(minOut.get, DoubleType), "min_c")(),
        Alias(Cast(maxOut.get, DoubleType), "max_c")()), base)
      val fringeProj = Project(Seq(
        Alias(rm, "metric")(),
        Alias(hourOfTs, "bucket")(),
        Alias(Cast(rv, sumDec), "sum_c")(),
        Alias(Literal(1L), "n_c")(),
        Alias(Cast(rv, DoubleType), "min_c")(),
        Alias(Cast(rv, DoubleType), "max_c")()),
        Filter(fringePred, relation))
      val union = Union(Seq(interiorProj, fringeProj))
      val Seq(mU, bU, sU, nU, mnU, mxU) = union.output
      val bucketGroup: Expression =
        if (grain == "hour") bU else trunc.get.copy(timestamp = bU)
      val results: Seq[Option[NamedExpression]] = aggExprs.map {
        case ne if isMetric(ne) =>
          Some(Alias(mU, ne.name)(exprId = ne.exprId))
        case ne if isHourTrunc(ne) =>
          Some(Alias(bucketGroup, ne.name)(exprId = ne.exprId))
        case ne @ Alias(AggregateExpression(fn, _, false, None, _), name) =>
          val repl: Option[Expression] = fn match {
            case Average(v, _) if overValue(v) =>
              Some(Divide(Cast(aggOf(Sum(sU)), DoubleType),
                Cast(aggOf(Sum(nU)), DoubleType)))
            case Sum(v, _) if overValue(v) =>
              Some(Cast(aggOf(Sum(sU)), DoubleType))
            case Min(v) if overValue(v) => Some(aggOf(Min(mnU)))
            case Max(v) if overValue(v) => Some(aggOf(Max(mxU)))
            case Count(Seq(Literal(_, _))) =>
              Some(Cast(aggOf(Sum(nU)),
                org.apache.spark.sql.types.LongType))
            case _ => None
          }
          repl.map(e => Alias(e, name)(exprId = ne.exprId))
        case _ => None
      }
      return if (results.exists(_.isEmpty)) None
      else Some(Aggregate(Seq(mU, bucketGroup), results.flatten, union, None))
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
