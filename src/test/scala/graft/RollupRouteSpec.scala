package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{RollupCatalog, RollupRouteRule}

class RollupRouteSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  test("hourly agg over registered raw points is routed to the rollup") {
    val sp = spark
    val dir = Files.createTempDirectory("graft_route").toString
    val rawPath = s"$dir/points"
    val rollupPath = s"$dir/rollup_1h"
    // materialize raw points (metric, ts, value) and their hourly rollup
    graft.io.Tables.events(sp, TestSpark.sf)
      .select(col("event_type").as("metric"), col("ts"), col("value"))
      .write.parquet(rawPath)
    sp.read.parquet(rawPath)
      .groupBy(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
      .agg(sum(col("value").cast("decimal(18,4)")).as("sum_v"),
        count(lit(1)).as("n"), min(col("value")).as("min_v"),
        max(col("value")).as("max_v"))
      .write.parquet(rollupPath)

    sp.experimental.extraOptimizations =
      sp.experimental.extraOptimizations :+ RollupRouteRule

    // run `q` routed (catalog registered) and raw (cleared); both results
    // are collected under the plan that the assertion inspected — the
    // routed collect happens BEFORE clear() so the rewrite really fires
    def routedVsRaw(q: () => DataFrame, sortCols: Seq[String])
        : (Array[org.apache.spark.sql.Row], Array[org.apache.spark.sql.Row]) = {
      RollupCatalog.register(rawPath, sp.read.parquet(rollupPath))
      val routed = q().orderBy(sortCols.map(col): _*)
      val rPlan = routed.queryExecution.executedPlan.toString
      assert(rPlan.contains("rollup_1h") && !rPlan.contains("/points"),
        s"expected the rollup scan, not raw points:\n$rPlan")
      val got = routed.collect()
      RollupCatalog.clear()
      val raw = q().orderBy(sortCols.map(col): _*)
      assert(raw.queryExecution.executedPlan.toString.contains("/points"),
        "reference side must scan raw after catalog clear")
      val expect = raw.collect()
      assert(got.length == expect.length && got.nonEmpty)
      (got, expect)
    }

    try {
      // same-grain routing: pure column remap over the archive
      val (got, expect) = routedVsRaw(() => sp.read.parquet(rawPath)
        .groupBy(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(avg(col("value")).as("avg_v"), sum(col("value")).as("sum_v"),
          min(col("value")).as("min_v"), max(col("value")).as("max_v"),
          count(lit(1)).as("n")), Seq("metric", "bucket"))
      got.zip(expect).foreach { case (g, e) =>
        assert(g.getString(0) == e.getString(0) &&
          g.getTimestamp(1) == e.getTimestamp(1))
        assert(math.abs(g.getDouble(2) - e.getDouble(2)) < 1e-9) // avg
        assert(math.abs(g.getDouble(3) - e.getDouble(3)) < 1e-6) // sum
        assert(g.getDouble(4) == e.getDouble(4) &&
          g.getDouble(5) == e.getDouble(5) && g.getLong(6) == e.getLong(6))
      }

      // DAILY grain routes too: re-aggregation of decimal partial sums
      val (dGot, dExpect) = routedVsRaw(() => sp.read.parquet(rawPath)
        .groupBy(col("metric"), date_trunc("day", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_v"),
          max(col("value")).as("max_v")), Seq("metric", "bucket"))
      dGot.zip(dExpect).foreach { case (g, e) =>
        assert(g.getString(0) == e.getString(0) &&
          g.getTimestamp(1) == e.getTimestamp(1) &&
          g.getLong(2) == e.getLong(2) && g.getDouble(4) == e.getDouble(4))
        assert(math.abs(g.getDouble(3) - e.getDouble(3)) < 1e-9)
      }

      // METRIC-only filter pushes through to the rollup
      val (mfGot, mfExpect) = routedVsRaw(() => sp.read.parquet(rawPath)
        .where(col("metric") === "click")
        .groupBy(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_v")),
        Seq("bucket"))
      mfGot.zip(mfExpect).foreach { case (g, e) =>
        assert(g.getString(0) == "click" && g.getLong(2) == e.getLong(2))
        assert(math.abs(g.getDouble(3) - e.getDouble(3)) < 1e-9)
      }

      // HOUR-ALIGNED ts-range predicates route WITH the filter applied
      // (every real dashboard query is `WHERE ts >= X` + hourly agg)
      val lo = "2024-01-08 00:00:00"
      val hi = "2024-01-20 00:00:00"
      val (tGot, tExpect) = routedVsRaw(() => sp.read.parquet(rawPath)
        .where(col("ts") >= expr(s"TIMESTAMP '$lo'") &&
          col("ts") < expr(s"TIMESTAMP '$hi'"))
        .groupBy(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_v")),
        Seq("metric", "bucket"))
      tGot.zip(tExpect).foreach { case (g, e) =>
        assert(g.getString(0) == e.getString(0) &&
          g.getTimestamp(1) == e.getTimestamp(1) &&
          g.getLong(2) == e.getLong(2))
        assert(math.abs(g.getDouble(3) - e.getDouble(3)) < 1e-9)
      }
      // the routed result really is windowed (fewer buckets than the full
      // history) — guards against a rewrite that drops the filter
      RollupCatalog.register(rawPath, sp.read.parquet(rollupPath))
      val full = sp.read.parquet(rawPath)
        .groupBy(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n")).count()
      assert(tGot.length < full, "ts-range must restrict the bucket set")

      // ts-range + DAILY grain routes too (filter applies to hour buckets
      // before the coarse re-aggregation — same raw rows either way)
      RollupCatalog.clear()
      val (tdGot, tdExpect) = routedVsRaw(() => sp.read.parquet(rawPath)
        .where(col("ts") >= expr(s"TIMESTAMP '$lo'"))
        .groupBy(col("metric"), date_trunc("day", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_v")),
        Seq("metric", "bucket"))
      tdGot.zip(tdExpect).foreach { case (g, e) =>
        assert(g.getString(0) == e.getString(0) &&
          g.getTimestamp(1) == e.getTimestamp(1) &&
          g.getLong(2) == e.getLong(2))
        assert(math.abs(g.getDouble(3) - e.getDouble(3)) < 1e-9)
      }

      // NON-ALIGNED bounds (every "last 24h from now" dashboard) route
      // via interior-rollup ∪ raw-fringe: complete buckets read the
      // rollup, only the partial-bucket slivers scan raw
      def unionCase(qf: () => DataFrame, desc: String): Unit = {
        RollupCatalog.register(rawPath, sp.read.parquet(rollupPath))
        val routed = qf().orderBy("metric", "bucket")
        val rPlan = routed.queryExecution.executedPlan.toString
        assert(rPlan.contains("rollup_1h") && rPlan.contains("/points") &&
          rPlan.contains("Union"),
          s"$desc should plan interior ∪ fringe:\n$rPlan")
        val got = routed.collect()
        RollupCatalog.clear()
        val expect = qf().orderBy("metric", "bucket").collect()
        assert(got.length == expect.length && got.nonEmpty, desc)
        got.zip(expect).foreach { case (g, e) =>
          assert(g.getString(0) == e.getString(0) &&
            g.getTimestamp(1) == e.getTimestamp(1), desc)
          assert(g.getLong(2) == e.getLong(2), s"$desc count")
          assert(math.abs(g.getDouble(3) - e.getDouble(3)) < 1e-9,
            s"$desc avg")
          assert(g.getDouble(4) == e.getDouble(4) &&
            g.getDouble(5) == e.getDouble(5), s"$desc min/max")
        }
      }
      def hourlyStats(df: DataFrame) = df
        .groupBy(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_v"),
          min(col("value")).as("min_v"), max(col("value")).as("max_v"))
      unionCase(() => hourlyStats(sp.read.parquet(rawPath)
        .where(col("ts") >= expr("TIMESTAMP '2024-01-08 00:30:00'"))),
        "non-aligned lower")
      unionCase(() => hourlyStats(sp.read.parquet(rawPath)
        .where(col("ts") >= expr("TIMESTAMP '2024-01-08 00:30:00'") &&
          col("ts") < expr("TIMESTAMP '2024-01-20 17:45:00'"))),
        "both bounds non-aligned")
      unionCase(() => hourlyStats(sp.read.parquet(rawPath)
        .where(col("metric") === "click" &&
          col("ts") >= expr("TIMESTAMP '2024-01-08 00:30:00'"))),
        "non-aligned + metric filter")
      // DEGENERATE windows: both bounds inside ONE bucket — the fringe
      // must honor the original bounds, not just window membership
      RollupCatalog.register(rawPath, sp.read.parquet(rollupPath))
      val sameBucket = hourlyStats(sp.read.parquet(rawPath)
        .where(col("ts") >= expr("TIMESTAMP '2024-01-10 05:10:00'") &&
          col("ts") < expr("TIMESTAMP '2024-01-10 05:40:00'")))
        .orderBy("metric", "bucket")
      val sbGot = sameBucket.collect()
      RollupCatalog.clear()
      val sbExpect = hourlyStats(sp.read.parquet(rawPath)
        .where(col("ts") >= expr("TIMESTAMP '2024-01-10 05:10:00'") &&
          col("ts") < expr("TIMESTAMP '2024-01-10 05:40:00'")))
        .orderBy("metric", "bucket").collect()
      assert(sbGot.length == sbExpect.length,
        s"same-bucket window: ${sbGot.length} vs ${sbExpect.length}")
      sbGot.zip(sbExpect).foreach { case (g, e) =>
        assert(g.getString(0) == e.getString(0) &&
          g.getLong(2) == e.getLong(2), "same-bucket counts")
      }
      // EMPTY region (L >= U) must yield zero rows, not fringe garbage
      RollupCatalog.register(rawPath, sp.read.parquet(rollupPath))
      val empty = hourlyStats(sp.read.parquet(rawPath)
        .where(col("ts") >= expr("TIMESTAMP '2024-01-12 10:30:00'") &&
          col("ts") < expr("TIMESTAMP '2024-01-12 09:15:00'")))
      assert(empty.collect().isEmpty, "empty window must return no rows")
      RollupCatalog.clear()
      // DAILY grain over a non-aligned window re-aggregates the union
      RollupCatalog.register(rawPath, sp.read.parquet(rollupPath))
      val dailyNA = sp.read.parquet(rawPath)
        .where(col("ts") >= expr("TIMESTAMP '2024-01-08 06:30:00'"))
        .groupBy(col("metric"), date_trunc("day", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"))
      val dnaPlan = dailyNA.queryExecution.executedPlan.toString
      assert(dnaPlan.contains("rollup_1h"),
        s"daily non-aligned should use the rollup interior:\n$dnaPlan")
      val dnaGot = dailyNA.orderBy("metric", "bucket").collect()
      RollupCatalog.clear()
      val dnaExpect = sp.read.parquet(rawPath)
        .where(col("ts") >= expr("TIMESTAMP '2024-01-08 06:30:00'"))
        .groupBy(col("metric"), date_trunc("day", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy("metric", "bucket").collect()
      assert(dnaGot.map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
        .toSeq == dnaExpect.map(r =>
          (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSeq)
      // STRICT bounds normalize to the half-open form at µs resolution
      // and route like any non-aligned window: `ts <= aligned` admits
      // exactly the boundary instant beyond the interior (a 1µs fringe),
      // `ts > aligned` drops exactly the boundary instant of its bucket
      unionCase(() => hourlyStats(sp.read.parquet(rawPath)
        .where(col("ts") >= expr(s"TIMESTAMP '$lo'") &&
          col("ts") <= expr(s"TIMESTAMP '$hi'"))),
        "closed upper bound (ts <= aligned)")
      unionCase(() => hourlyStats(sp.read.parquet(rawPath)
        .where(col("ts") > expr("TIMESTAMP '2024-01-08 00:30:00'"))),
        "strict lower bound (ts > non-aligned)")
      // negative cases below assert NO routing — the catalog must be
      // registered for that to mean anything (unionCase cleared it)
      RollupCatalog.register(rawPath, sp.read.parquet(rollupPath))
      // a NARROWING cast changes per-row values before aggregation —
      // sum(CAST(value AS INT)) must keep the raw scan (only a no-op
      // cast to DOUBLE is transparent)
      val narrowed = sp.read.parquet(rawPath)
        .groupBy(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(sum(col("value").cast("int")).as("sum_i"))
      assert(narrowed.queryExecution.executedPlan.toString
        .contains("/points"))
      // a Project REDEFINING value under the same name must NOT route —
      // the rollup pre-aggregated the ORIGINAL values
      val shadowed = sp.read.parquet(rawPath)
        .withColumn("value", col("value") * 2)
        .groupBy(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(sum(col("value")).as("sum_v"))
      assert(shadowed.queryExecution.executedPlan.toString
        .contains("/points"))
      // same for a shadowed ts (shifting ts changes every bucket)
      val shadowedTs = sp.read.parquet(rawPath)
        .withColumn("ts", col("ts") + expr("INTERVAL 1 HOUR"))
        .groupBy(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"))
      assert(shadowedTs.queryExecution.executedPlan.toString
        .contains("/points"))
      // a MULTI-PATH read must NOT route: the second path's rows are not
      // in the rollup
      val otherPath = s"$dir/other_points"
      sp.read.parquet(rawPath).limit(10).write.parquet(otherPath)
      val multi = sp.read.parquet(rawPath, otherPath)
        .groupBy(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"))
      assert(multi.queryExecution.executedPlan.toString.contains("/points"))
      // a FINER grain than the archive must NOT route
      val minute = sp.read.parquet(rawPath)
        .groupBy(col("metric"), date_trunc("minute", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"))
      assert(minute.queryExecution.executedPlan.toString.contains("/points"))
      // a VALUE filter keeps the raw scan (rule is conservative)
      val filtered = sp.read.parquet(rawPath)
        .where(col("value") > 50)
        .groupBy(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"))
      assert(filtered.queryExecution.executedPlan.toString.contains("/points"))
      // truncating a DIFFERENT timestamp column must not route either
      val otherTs = sp.read.parquet(rawPath)
        .withColumn("ingest_ts", col("ts") + expr("INTERVAL 1 HOUR"))
        .groupBy(col("metric"),
          date_trunc("hour", col("ingest_ts")).as("bucket"))
        .agg(count(lit(1)).as("n"))
      assert(otherTs.queryExecution.executedPlan.toString.contains("/points"))
      // HAVING above the rewritten aggregate composes transparently:
      // the Aggregate routes, the post-aggregate filter stays on top
      val having = sp.read.parquet(rawPath)
        .groupBy(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"))
        .where(col("n") >= 5)
      val hPlan = having.queryExecution.executedPlan.toString
      assert(hPlan.contains("rollup_1h") && !hPlan.contains("/points"),
        s"HAVING should route through the rewrite:\n$hPlan")
      RollupCatalog.clear()
      val hRaw = sp.read.parquet(rawPath)
        .groupBy(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"))
        .where(col("n") >= 5)
      assert(having.collect().length == hRaw.collect().length)
    } finally {
      RollupCatalog.clear()
      sp.experimental.extraOptimizations =
        sp.experimental.extraOptimizations.filterNot(_ == RollupRouteRule)
    }
  }

  test("ROLLUP/CUBE grouping sets over (metric, bucket) route to the rollup") {
    val sp = spark
    val dir = Files.createTempDirectory("graft_gs_route").toString
    val rawPath = s"$dir/points"
    val rollupPath = s"$dir/rollup_1h"
    graft.io.Tables.events(sp, TestSpark.sf)
      .select(col("event_type").as("metric"), col("ts"), col("value"))
      .write.parquet(rawPath)
    sp.read.parquet(rawPath)
      .groupBy(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
      .agg(sum(col("value").cast("decimal(18,4)")).as("sum_v"),
        count(lit(1)).as("n"), min(col("value")).as("min_v"),
        max(col("value")).as("max_v"))
      .write.parquet(rollupPath)
    sp.experimental.extraOptimizations =
      sp.experimental.extraOptimizations :+ RollupRouteRule

    // run routed (registered) vs raw (cleared); every grouping set —
    // incl. the nulled subtotal and grand-total rows — must agree
    def routedVsRaw(q: () => DataFrame, expectFringe: Boolean, desc: String)
        : Unit = {
      RollupCatalog.register(rawPath, sp.read.parquet(rollupPath))
      val order = Seq(asc_nulls_first("metric"), asc_nulls_first("bucket"))
      val routed = q().orderBy(order: _*)
      val rPlan = routed.queryExecution.executedPlan.toString
      assert(rPlan.contains("rollup_1h"), s"$desc should read the rollup:\n$rPlan")
      if (expectFringe)
        assert(rPlan.contains("/points") && rPlan.contains("Union"),
          s"$desc should plan interior ∪ fringe:\n$rPlan")
      else
        assert(!rPlan.contains("/points"),
          s"$desc should not touch raw points:\n$rPlan")
      val got = routed.collect()
      RollupCatalog.clear()
      val expect = q().orderBy(order: _*).collect()
      assert(got.length == expect.length && got.nonEmpty, desc)
      got.zip(expect).foreach { case (g, e) =>
        (0 until g.length).foreach { i =>
          (g.get(i), e.get(i)) match {
            case (a: Double, b: Double) =>
              assert(math.abs(a - b) < 1e-6, s"$desc col $i: $a vs $b")
            case (a, b) => assert(a == b, s"$desc col $i: $a vs $b")
          }
        }
      }
    }

    try {
      routedVsRaw(() => sp.read.parquet(rawPath)
        .rollup(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_v"),
          sum(col("value")).as("sum_v"), min(col("value")).as("min_v"),
          max(col("value")).as("max_v")),
        expectFringe = false, "ROLLUP hourly")
      routedVsRaw(() => sp.read.parquet(rawPath)
        .where(col("metric") =!= "view" &&
          col("ts") >= expr("TIMESTAMP '2024-01-08 00:00:00'"))
        .cube(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_v")),
        expectFringe = false, "CUBE + metric filter + aligned ts")
      routedVsRaw(() => sp.read.parquet(rawPath)
        .rollup(col("metric"), date_trunc("day", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"), max(col("value")).as("max_v"),
          grouping_id().as("gid")),
        expectFringe = false, "ROLLUP daily + grouping_id")
      // non-aligned window: sets recombine over interior ∪ fringe partials
      routedVsRaw(() => sp.read.parquet(rawPath)
        .where(col("ts") >= expr("TIMESTAMP '2024-01-08 00:30:00'") &&
          col("ts") < expr("TIMESTAMP '2024-01-20 17:45:00'"))
        .rollup(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"),
          min(col("value")).as("min_v")),
        expectFringe = true, "ROLLUP non-aligned window")
      // HAVING above the grouping-set aggregate: the Filter references
      // the aggregate's output attributes, whose exprIds the rewrite
      // preserves — routing must fire below it unchanged
      routedVsRaw(() => sp.read.parquet(rawPath)
        .rollup(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_v"))
        .where(col("n") > 5),
        expectFringe = false, "ROLLUP + HAVING")
      // a THIRD grouping dimension is not in the rollup: keep raw
      RollupCatalog.register(rawPath, sp.read.parquet(rollupPath))
      val threeDim = sp.read.parquet(rawPath)
        .rollup(col("metric"), date_trunc("hour", col("ts")).as("bucket"),
          col("value"))
        .agg(count(lit(1)).as("n"))
      assert(threeDim.queryExecution.executedPlan.toString
        .contains("/points"), "3-dim grouping sets must keep the raw scan")
    } finally {
      RollupCatalog.clear()
      sp.experimental.extraOptimizations =
        sp.experimental.extraOptimizations.filterNot(_ == RollupRouteRule)
    }
  }

  test("freshness frontier: incomplete tail reads raw, results stay exact") {
    val sp = spark
    val dir = Files.createTempDirectory("graft_frontier").toString
    val rawPath = s"$dir/points"
    val rollupPath = s"$dir/rollup_1h"
    graft.io.Tables.events(sp, TestSpark.sf)
      .select(col("event_type").as("metric"), col("ts"), col("value"))
      .write.parquet(rawPath)
    // the writer's state: every point with ts < frontier is folded; the
    // rollup has NOTHING beyond it (the current day is still filling)
    val frontierMicros = java.time.Instant
      .parse("2024-01-15T10:30:00Z").toEpochMilli * 1000L
    sp.read.parquet(rawPath)
      .where(col("ts") < expr("TIMESTAMP '2024-01-15 10:30:00'"))
      .groupBy(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
      .agg(sum(col("value").cast("decimal(18,4)")).as("sum_v"),
        count(lit(1)).as("n"), min(col("value")).as("min_v"),
        max(col("value")).as("max_v"))
      .write.parquet(rollupPath)
    sp.experimental.extraOptimizations =
      sp.experimental.extraOptimizations :+ RollupRouteRule
    def hourly(df: DataFrame) = df
      .groupBy(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
      .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_v"),
        min(col("value")).as("min_v"))
      .orderBy("metric", "bucket")
    def check(q: () => DataFrame, wantRaw: Boolean, desc: String): Unit = {
      RollupCatalog.register(rawPath, sp.read.parquet(rollupPath),
        Some(frontierMicros))
      val routed = q()
      val plan = routed.queryExecution.executedPlan.toString
      assert(plan.contains("rollup_1h"), s"$desc should read the rollup:\n$plan")
      if (wantRaw)
        assert(plan.contains("/points") && plan.contains("Union"),
          s"$desc should union a raw tail:\n$plan")
      else
        assert(!plan.contains("/points"),
          s"$desc is complete — no raw read:\n$plan")
      val got = routed.collect()
      RollupCatalog.clear()
      val expect = q().collect()
      assert(got.length == expect.length && got.nonEmpty, desc)
      got.zip(expect).foreach { case (g, e) =>
        assert(g.getString(0) == e.getString(0) &&
          g.getTimestamp(1) == e.getTimestamp(1) &&
          g.getLong(2) == e.getLong(2), s"$desc: $g vs $e")
        assert(math.abs(g.getDouble(3) - e.getDouble(3)) < 1e-9, desc)
      }
    }
    try {
      // unbounded read spanning the frontier: trusted interior ∪ raw tail
      check(() => hourly(sp.read.parquet(rawPath)),
        wantRaw = true, "unbounded over live rollup")
      // bounded entirely below the frontier: routes pure, frontier moot
      check(() => hourly(sp.read.parquet(rawPath)
          .where(col("ts") < expr("TIMESTAMP '2024-01-10 00:00:00'"))),
        wantRaw = false, "bounded below frontier")
      // non-aligned window STRADDLING the frontier: lo-fringe + tail
      check(() => hourly(sp.read.parquet(rawPath)
          .where(col("ts") >= expr("TIMESTAMP '2024-01-08 00:30:00'") &&
            col("ts") < expr("TIMESTAMP '2024-01-16 17:45:00'"))),
        wantRaw = true, "straddling window")
      // ROLLUP grouping sets respect the frontier too
      RollupCatalog.register(rawPath, sp.read.parquet(rollupPath),
        Some(frontierMicros))
      val gs = sp.read.parquet(rawPath)
        .rollup(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_v"))
        .orderBy(asc_nulls_first("metric"), asc_nulls_first("bucket"))
      val gsPlan = gs.queryExecution.executedPlan.toString
      assert(gsPlan.contains("rollup_1h") && gsPlan.contains("/points") &&
        gsPlan.contains("Union"), s"grouping sets + frontier:\n$gsPlan")
      val gsGot = gs.collect()
      RollupCatalog.clear()
      val gsExpect = sp.read.parquet(rawPath)
        .rollup(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_v"))
        .orderBy(asc_nulls_first("metric"), asc_nulls_first("bucket"))
        .collect()
      assert(gsGot.length == gsExpect.length && gsGot.nonEmpty)
      gsGot.zip(gsExpect).foreach { case (g, e) =>
        assert(g.get(0) == e.get(0) && g.get(1) == e.get(1) &&
          g.getLong(2) == e.getLong(2), s"gs: $g vs $e")
        assert(math.abs(g.getDouble(3) - e.getDouble(3)) < 1e-6)
      }
    } finally {
      RollupCatalog.clear()
      sp.experimental.extraOptimizations =
        sp.experimental.extraOptimizations.filterNot(_ == RollupRouteRule)
    }
  }

  test("versioned catalog: commits advance, latest wins, claims skip races") {
    val sp = spark
    val dir = Files.createTempDirectory("graft_vcat").toString
    val rawPath = s"$dir/points"
    val rollupPath = s"$dir/rollup_1h"
    graft.io.Tables.events(sp, TestSpark.sf)
      .select(col("event_type").as("metric"), col("ts"), col("value"))
      .limit(100).write.parquet(rawPath)
    sp.read.parquet(rawPath)
      .groupBy(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
      .agg(sum(col("value").cast("decimal(18,4)")).as("sum_v"),
        count(lit(1)).as("n"), min(col("value")).as("min_v"),
        max(col("value")).as("max_v"))
      .write.parquet(rollupPath)
    val cat = s"$dir/cat"
    try {
      assert(RollupCatalog.loadLatest(sp, cat).isEmpty,
        "an uncommitted directory must load as None")
      RollupCatalog.registerTable(sp, rawPath, rollupPath, None)
      assert(RollupCatalog.saveVersioned(sp, cat) == 1L)
      RollupCatalog.registerTable(sp, rawPath, rollupPath, Some(123L))
      assert(RollupCatalog.saveVersioned(sp, cat) == 2L)
      // a racing writer holds the v3 claim -> this commit lands at v4
      val fs = new org.apache.hadoop.fs.Path(cat)
        .getFileSystem(sp.sparkContext.hadoopConfiguration)
      fs.create(new org.apache.hadoop.fs.Path(cat, "catalog_v000003.lock"),
        false).close()
      RollupCatalog.registerTable(sp, rawPath, rollupPath, Some(456L))
      assert(RollupCatalog.saveVersioned(sp, cat) == 4L)
      RollupCatalog.clear()
      val loaded = RollupCatalog.loadLatest(sp, cat)
      assert(loaded.contains((4L, 1)), s"latest load got $loaded")
      // the surviving registration carries the LATEST frontier
      val rt = s"$dir/roundtrip.tsv"
      RollupCatalog.save(sp, rt)
      val text = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(rt)), "UTF-8")
      assert(text.contains("\t456\t"), s"latest frontier lost: $text")
    } finally RollupCatalog.clear()
  }

  test("catalog save/load: registrations survive into another session") {
    val sp = spark
    val dir = Files.createTempDirectory("graft_cat").toString
    val rawPath = s"$dir/points"
    val rollupPath = s"$dir/rollup_1h"
    graft.io.Tables.events(sp, TestSpark.sf)
      .select(col("event_type").as("metric"), col("ts"), col("value"))
      .write.parquet(rawPath)
    sp.read.parquet(rawPath)
      .groupBy(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
      .agg(sum(col("value").cast("decimal(18,4)")).as("sum_v"),
        count(lit(1)).as("n"), min(col("value")).as("min_v"),
        max(col("value")).as("max_v"))
      .write.parquet(rollupPath)
    sp.experimental.extraOptimizations =
      sp.experimental.extraOptimizations :+ RollupRouteRule
    try {
      val frontier = java.time.Instant
        .parse("2024-01-15T00:00:00Z").toEpochMilli * 1000L
      RollupCatalog.registerTable(sp, rawPath, rollupPath, Some(frontier))
      RollupCatalog.save(sp, s"$dir/catalog.tsv")
      RollupCatalog.clear() // a fresh session starts empty
      assert(RollupCatalog.load(sp, s"$dir/catalog.tsv") == 1)
      def q() = sp.read.parquet(rawPath)
        .groupBy(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_v"))
        .orderBy("metric", "bucket")
      val routed = q()
      val plan = routed.queryExecution.executedPlan.toString
      // loaded registration routes AND keeps its freshness frontier
      // (raw tail for the incomplete region)
      assert(plan.contains("rollup_1h") && plan.contains("/points") &&
        plan.contains("Union"), s"loaded catalog did not route:\n$plan")
      val got = routed.collect()
      RollupCatalog.clear()
      val expect = q().collect()
      assert(got.length == expect.length && got.nonEmpty)
      got.zip(expect).foreach { case (g, e) =>
        assert(g.getString(0) == e.getString(0) &&
          g.getTimestamp(1) == e.getTimestamp(1) &&
          g.getLong(2) == e.getLong(2))
        assert(math.abs(g.getDouble(3) - e.getDouble(3)) < 1e-9)
      }
    } finally {
      RollupCatalog.clear()
      sp.experimental.extraOptimizations =
        sp.experimental.extraOptimizations.filterNot(_ == RollupRouteRule)
    }
  }

  test("append-mode rollup (multi-partial buckets) re-aggregates exactly") {
    val sp = spark
    val dir = Files.createTempDirectory("graft_append").toString
    val rawPath = s"$dir/points"
    val rollupPath = s"$dir/rollup_1h"
    val all = graft.io.Tables.events(sp, TestSpark.sf)
      .select(col("event_type").as("metric"), col("ts"), col("value"))
    all.write.parquet(rawPath)
    // the live writer's shape: every bucket written TWICE, as the
    // partials of two disjoint halves (split by event id parity)
    val src = sp.read.parquet(rawPath)
      .withColumn("half", pmod(expr("unix_micros(ts)"), lit(2)))
    Seq(0, 1).foreach { h =>
      src.where(col("half") === h)
        .groupBy(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(sum(col("value").cast("decimal(18,4)")).as("sum_v"),
          count(lit(1)).as("n"), min(col("value")).as("min_v"),
          max(col("value")).as("max_v"))
        .write.mode("append").parquet(rollupPath)
    }
    sp.experimental.extraOptimizations =
      sp.experimental.extraOptimizations :+ RollupRouteRule
    try {
      RollupCatalog.register(rawPath, sp.read.parquet(rollupPath),
        appendRollup = true)
      def q() = sp.read.parquet(rawPath)
        .groupBy(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_v"),
          min(col("value")).as("min_v"), max(col("value")).as("max_v"))
        .orderBy("metric", "bucket")
      val routed = q()
      val plan = routed.queryExecution.executedPlan.toString
      assert(plan.contains("rollup_1h") && !plan.contains("/points"),
        s"append-mode should still route:\n$plan")
      val got = routed.collect()
      RollupCatalog.clear()
      val expect = q().collect()
      // without the re-aggregation fork, every bucket would come back
      // twice (one row per partial)
      assert(got.length == expect.length && got.nonEmpty)
      got.zip(expect).foreach { case (g, e) =>
        assert(g.getString(0) == e.getString(0) &&
          g.getTimestamp(1) == e.getTimestamp(1) &&
          g.getLong(2) == e.getLong(2), s"$g vs $e")
        assert(math.abs(g.getDouble(3) - e.getDouble(3)) < 1e-9)
        assert(g.getDouble(4) == e.getDouble(4) &&
          g.getDouble(5) == e.getDouble(5))
      }
      // maintenance closes the lifecycle: fold the partials to one row
      // per bucket, re-register WITHOUT append mode, and the pure
      // projection path serves the identical result
      val (rowsBefore, rowsAfter) =
        graft.io.Layout.compactRollup(sp, rollupPath)
      assert(rowsAfter < rowsBefore, "fold must shrink the partials")
      val perBucket = sp.read.parquet(rollupPath)
        .groupBy(col("metric"), col("bucket")).count()
        .agg(max(col("count"))).head.getLong(0)
      assert(perBucket == 1L, "one row per bucket after the fold")
      RollupCatalog.register(rawPath, sp.read.parquet(rollupPath))
      val pure = q()
      val purePlan = pure.queryExecution.executedPlan.toString
      assert(purePlan.contains("rollup_1h") && !purePlan.contains("/points")
        && !purePlan.contains("Union"),
        s"compacted rollup should take the pure path:\n$purePlan")
      val pureGot = pure.collect()
      RollupCatalog.clear()
      assert(pureGot.length == expect.length)
      pureGot.zip(expect).foreach { case (g, e) =>
        assert(g.getString(0) == e.getString(0) &&
          g.getTimestamp(1) == e.getTimestamp(1) &&
          g.getLong(2) == e.getLong(2), s"post-fold: $g vs $e")
        assert(math.abs(g.getDouble(3) - e.getDouble(3)) < 1e-9)
      }
    } finally {
      RollupCatalog.clear()
      sp.experimental.extraOptimizations =
        sp.experimental.extraOptimizations.filterNot(_ == RollupRouteRule)
    }
  }

  test("union of two registered tiers routes each leg to its own rollup") {
    val sp = spark
    val dir = Files.createTempDirectory("graft_tier").toString
    val (coldPath, hotPath) = (s"$dir/cold", s"$dir/hot")
    val mid = "TIMESTAMP '2024-01-15 00:00:00'"
    val all = graft.io.Tables.events(sp, TestSpark.sf)
      .select(col("event_type").as("metric"), col("ts"), col("value"))
    all.where(col("ts") < expr(mid)).write.parquet(coldPath)
    all.where(col("ts") >= expr(mid)).write.parquet(hotPath)
    def mkRollup(raw: String, path: String): Unit =
      sp.read.parquet(raw)
        .groupBy(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(sum(col("value").cast("decimal(18,4)")).as("sum_v"),
          count(lit(1)).as("n"), min(col("value")).as("min_v"),
          max(col("value")).as("max_v"))
        .write.parquet(path)
    mkRollup(coldPath, s"$dir/rollup_cold")
    mkRollup(hotPath, s"$dir/rollup_hot")
    sp.experimental.extraOptimizations =
      sp.experimental.extraOptimizations :+ RollupRouteRule
    def tiered() = sp.read.parquet(coldPath)
      .unionAll(sp.read.parquet(hotPath))
    def hourly(df: DataFrame) = df
      .groupBy(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
      .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_v"),
        max(col("value")).as("max_v"))
      .orderBy("metric", "bucket")
    def registerBoth(): Unit = {
      RollupCatalog.register(coldPath, sp.read.parquet(s"$dir/rollup_cold"))
      RollupCatalog.register(hotPath, sp.read.parquet(s"$dir/rollup_hot"))
    }
    def check(q: () => DataFrame, desc: String,
        wantRaw: Boolean = false): Unit = {
      registerBoth()
      val routed = q()
      val plan = routed.queryExecution.executedPlan.toString
      assert(plan.contains("rollup_cold") && plan.contains("rollup_hot"),
        s"$desc should read both tier rollups:\n$plan")
      if (!wantRaw)
        assert(!plan.contains("/cold") && !plan.contains("/hot"),
          s"$desc should not touch raw tiers:\n$plan")
      val got = routed.collect()
      RollupCatalog.clear()
      val expect = q().collect()
      assert(got.length == expect.length && got.nonEmpty, desc)
      got.zip(expect).foreach { case (g, e) =>
        assert(g.getString(0) == e.getString(0) &&
          g.getTimestamp(1) == e.getTimestamp(1) &&
          g.getLong(2) == e.getLong(2), s"$desc: $g vs $e")
        assert(math.abs(g.getDouble(3) - e.getDouble(3)) < 1e-9, desc)
        assert(g.getDouble(4) == e.getDouble(4), desc)
      }
    }
    try {
      // the plain tiered read: both legs pure rollup
      check(() => hourly(tiered()), "tiered hourly")
      // shared non-aligned window above the union: per-leg fringes
      check(() => hourly(tiered()
          .where(col("ts") >= expr("TIMESTAMP '2024-01-08 00:30:00'"))),
        "tiered non-aligned", wantRaw = true)
      // metric filter above the union pushes into both legs
      check(() => hourly(tiered().where(col("metric") =!= "view")),
        "tiered metric filter")
      // one leg unregistered: the whole aggregate keeps the raw scans
      RollupCatalog.register(coldPath, sp.read.parquet(s"$dir/rollup_cold"))
      val un = hourly(tiered())
      val unPlan = un.queryExecution.executedPlan.toString
      assert(unPlan.contains("/cold") && unPlan.contains("/hot") &&
        !unPlan.contains("rollup_cold"),
        s"half-registered union must stay raw:\n$unPlan")
      RollupCatalog.clear()
    } finally {
      RollupCatalog.clear()
      sp.experimental.extraOptimizations =
        sp.experimental.extraOptimizations.filterNot(_ == RollupRouteRule)
    }
  }

  test("hourly agg over a DataSourceV2 parquet read routes to the rollup") {
    val dir = Files.createTempDirectory("graft_v2_route").toString
    val rawPath = s"$dir/points"
    val rollupPath = s"$dir/rollup_1h"
    val base = TestSpark.spark
    graft.io.Tables.events(base, TestSpark.sf)
      .select(col("event_type").as("metric"), col("ts"), col("value"))
      .write.parquet(rawPath)
    base.read.parquet(rawPath)
      .groupBy(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
      .agg(sum(col("value").cast("decimal(18,4)")).as("sum_v"),
        count(lit(1)).as("n"), min(col("value")).as("min_v"),
        max(col("value")).as("max_v"))
      .write.parquet(rollupPath)
    // an empty useV1SourceList plans parquet reads as DataSourceV2Relation
    // — the shape any v2 file catalog (the 100 TB deployment path) plans
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val sp = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-v2-route-spec")
      .withExtensions(new graft.GraftExtensions())
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.useV1SourceList", "")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
      val scan = sp.read.parquet(rawPath)
      assert(scan.queryExecution.analyzed.collectFirst {
        case r: DataSourceV2Relation => r
      }.isDefined, "precondition: useV1SourceList='' must yield a v2 read")
      def hourly(df: DataFrame) = df
        .groupBy(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_v"))
      RollupCatalog.register(rawPath, sp.read.parquet(rollupPath))
      val q = hourly(sp.read.parquet(rawPath)).orderBy("metric", "bucket")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("rollup_1h") && !plan.contains("/points"),
        s"v2 scan did not route:\n$plan")
      val got = q.collect()
      RollupCatalog.clear()
      val expect = hourly(sp.read.parquet(rawPath))
        .orderBy("metric", "bucket").collect()
      assert(got.length == expect.length && got.nonEmpty)
      got.zip(expect).foreach { case (g, e) =>
        assert(g.getString(0) == e.getString(0) &&
          g.getTimestamp(1) == e.getTimestamp(1) &&
          g.getLong(2) == e.getLong(2))
        assert(math.abs(g.getDouble(3) - e.getDouble(3)) < 1e-9)
      }
      // non-aligned window: the fringe filters the v2 scan, interior
      // reads the rollup — same union rewrite as v1
      RollupCatalog.register(rawPath, sp.read.parquet(rollupPath))
      val na = hourly(sp.read.parquet(rawPath)
        .where(col("ts") >= expr("TIMESTAMP '2024-01-08 00:30:00'")))
        .orderBy("metric", "bucket")
      val naPlan = na.queryExecution.executedPlan.toString
      assert(naPlan.contains("rollup_1h") && naPlan.contains("/points") &&
        naPlan.contains("Union"),
        s"v2 non-aligned should plan interior ∪ fringe:\n$naPlan")
      val naGot = na.collect()
      RollupCatalog.clear()
      val naExpect = hourly(sp.read.parquet(rawPath)
        .where(col("ts") >= expr("TIMESTAMP '2024-01-08 00:30:00'")))
        .orderBy("metric", "bucket").collect()
      assert(naGot.length == naExpect.length && naGot.nonEmpty)
      naGot.zip(naExpect).foreach { case (g, e) =>
        assert(g.getString(0) == e.getString(0) &&
          g.getTimestamp(1) == e.getTimestamp(1) &&
          g.getLong(2) == e.getLong(2))
        assert(math.abs(g.getDouble(3) - e.getDouble(3)) < 1e-9)
      }
      // grouping sets compose with the v2 extractor in ONE plan (the
      // two features were spec'd separately before): ROLLUP over the
      // v2 read routes and agrees on every set incl. the grand total
      RollupCatalog.register(rawPath, sp.read.parquet(rollupPath))
      def gsQuery() = sp.read.parquet(rawPath)
        .rollup(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_v"))
        .orderBy(asc_nulls_first("metric"), asc_nulls_first("bucket"))
      val gs = gsQuery()
      val gsPlan = gs.queryExecution.executedPlan.toString
      assert(gsPlan.contains("rollup_1h") && !gsPlan.contains("/points"),
        s"v2 grouping sets did not route:\n$gsPlan")
      val gsGot = gs.collect()
      RollupCatalog.clear()
      val gsExpect = gsQuery().collect()
      assert(gsGot.length == gsExpect.length && gsGot.nonEmpty)
      gsGot.zip(gsExpect).foreach { case (g, e) =>
        assert(g.get(0) == e.get(0) && g.get(1) == e.get(1) &&
          g.getLong(2) == e.getLong(2))
        assert(math.abs(g.getDouble(3) - e.getDouble(3)) < 1e-6)
      }
    } finally {
      RollupCatalog.clear()
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }

  test("multi-path table: two-root read routes, subset read stays raw") {
    val sp = spark
    val dir = Files.createTempDirectory("graft_mp_route").toString
    val pathA = s"$dir/points_a"
    val pathB = s"$dir/points_b"
    val rollupPath = s"$dir/rollup_1h"
    // ONE logical table physically split over two roots (the lakehouse
    // shard/migration layout): even event_ids in A, odd in B
    val ev = graft.io.Tables.events(sp, TestSpark.sf)
      .select(col("event_id"), col("event_type").as("metric"), col("ts"),
        col("value"))
    ev.where(col("event_id") % 2 === 0).drop("event_id").write.parquet(pathA)
    ev.where(col("event_id") % 2 === 1).drop("event_id").write.parquet(pathB)
    // the rollup folds the UNION of both roots
    sp.read.parquet(pathA, pathB)
      .groupBy(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
      .agg(sum(col("value").cast("decimal(18,4)")).as("sum_v"),
        count(lit(1)).as("n"), min(col("value")).as("min_v"),
        max(col("value")).as("max_v"))
      .write.parquet(rollupPath)
    sp.experimental.extraOptimizations =
      sp.experimental.extraOptimizations :+ RollupRouteRule
    try {
      // register with roots in the OPPOSITE order of the read: matching
      // is on the path SET
      RollupCatalog.registerPaths(Seq(pathB, pathA),
        sp.read.parquet(rollupPath))
      def q(paths: String*) = sp.read.parquet(paths: _*)
        .groupBy(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(avg(col("value")).as("avg_v"), count(lit(1)).as("n"))
        .orderBy("metric", "bucket")
      val routed = q(pathA, pathB)
      val rPlan = routed.queryExecution.executedPlan.toString
      assert(rPlan.contains("rollup_1h") && !rPlan.contains("points_"),
        s"two-root read must route to the rollup:\n$rPlan")
      val got = routed.collect()
      // SOUNDNESS: a read of only one root is a strict subset of what
      // the rollup folded — it must keep the raw scan
      val subset = q(pathA)
      assert(!subset.queryExecution.executedPlan.toString
        .contains("rollup_1h"), "subset read must NOT route")
      RollupCatalog.clear()
      val expect = q(pathA, pathB).collect()
      assert(got.length == expect.length && got.nonEmpty)
      got.zip(expect).foreach { case (g, e) =>
        assert(g.getString(0) == e.getString(0) &&
          g.getTimestamp(1) == e.getTimestamp(1) &&
          g.getLong(3) == e.getLong(3))
        assert(math.abs(g.getDouble(2) - e.getDouble(2)) < 1e-9)
      }
      // persistable form survives a save/load roundtrip with both roots
      RollupCatalog.registerTablePaths(sp, Seq(pathA, pathB), rollupPath)
      val cat = s"$dir/catalog.tsv"
      RollupCatalog.save(sp, cat)
      RollupCatalog.clear()
      assert(RollupCatalog.load(sp, cat) == 1)
      val rePlan = q(pathB, pathA).queryExecution.executedPlan.toString
      assert(rePlan.contains("rollup_1h") && !rePlan.contains("points_"),
        s"loaded multi-path registration must route:\n$rePlan")
    } finally RollupCatalog.clear()
  }

  test("date-partitioned subset read routes to the day-filtered rollup") {
    val sp = spark
    val dir = Files.createTempDirectory("graft_dp_route").toString
    val rawPath = s"$dir/points"
    val rollupPath = s"$dir/rollup_1h"
    // hive layout <root>/date=YYYY-MM-DD where date IS the UTC date of ts
    graft.io.Tables.events(sp, TestSpark.sf)
      .select(col("event_type").as("metric"), col("ts"), col("value"),
        to_date(col("ts")).cast("string").as("date"))
      .write.partitionBy("date").parquet(rawPath)
    sp.read.parquet(rawPath)
      .groupBy(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
      .agg(sum(col("value").cast("decimal(18,4)")).as("sum_v"),
        count(lit(1)).as("n"), min(col("value")).as("min_v"),
        max(col("value")).as("max_v"))
      .write.parquet(rollupPath)
    val days = new java.io.File(rawPath).listFiles()
      .map(_.getName).filter(_.startsWith("date=")).sorted.take(2)
    assert(days.length == 2, s"need two partition days, got ${days.toSeq}")
    sp.experimental.extraOptimizations =
      sp.experimental.extraOptimizations :+ RollupRouteRule
    def q(paths: String*) = sp.read.parquet(paths: _*)
      .groupBy(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
      .agg(avg(col("value")).as("avg_v"), sum(col("value")).as("sum_v"),
        count(lit(1)).as("n"))
      .orderBy("metric", "bucket")
    val sub = days.map(d => s"$rawPath/$d").toSeq
    try {
      // NOT declared date-partitioned: the subset read must stay raw
      RollupCatalog.register(rawPath, sp.read.parquet(rollupPath))
      assert(!q(sub: _*).queryExecution.executedPlan.toString
        .contains("rollup_1h"),
        "undeclared partition layout must never route a subset")
      RollupCatalog.clear()
      // declared: the two-day read routes to the day-filtered rollup
      RollupCatalog.register(rawPath, sp.read.parquet(rollupPath),
        datePartitioned = true)
      val routed = q(sub: _*)
      val rPlan = routed.queryExecution.executedPlan.toString
      assert(rPlan.contains("rollup_1h") && !rPlan.contains("/points"),
        s"declared subset read must route:\n$rPlan")
      val got = routed.collect()
      // whole-table read still routes via the exact-match entry
      assert(q(rawPath).queryExecution.executedPlan.toString
        .contains("rollup_1h"))
      // a single-day read routes too, to just that day's buckets
      val oneDay = q(s"$rawPath/${days.head}")
      assert(oneDay.queryExecution.executedPlan.toString
        .contains("rollup_1h"), "single-day read must route")
      val oneGot = oneDay.collect()
      RollupCatalog.clear()
      val oneExpect = q(s"$rawPath/${days.head}").collect()
      assert(oneGot.length == oneExpect.length && oneGot.nonEmpty)
      val expect = q(sub: _*).collect()
      assert(got.length == expect.length && got.nonEmpty,
        s"routed=${got.length} raw=${expect.length}")
      got.zip(expect).foreach { case (g, e) =>
        assert(g.getString(0) == e.getString(0) &&
          g.getTimestamp(1) == e.getTimestamp(1) &&
          g.getLong(4) == e.getLong(4))
        assert(math.abs(g.getDouble(2) - e.getDouble(2)) < 1e-9)
        assert(math.abs(g.getDouble(3) - e.getDouble(3)) < 1e-6)
      }
    } finally RollupCatalog.clear()
  }

  test("routing fires through the shipped GraftExtensions injection path") {
    // the deploy story is `spark.sql.extensions=graft.GraftExtensions`;
    // prove the injected optimizer rule (not experimental opts) routes
    val dir = Files.createTempDirectory("graft_ext_route").toString
    val rawPath = s"$dir/points"
    val rollupPath = s"$dir/rollup_1h"
    val base = TestSpark.spark
    graft.io.Tables.events(base, TestSpark.sf)
      .select(col("event_type").as("metric"), col("ts"), col("value"))
      .write.parquet(rawPath)
    base.read.parquet(rawPath)
      .groupBy(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
      .agg(sum(col("value").cast("decimal(18,4)")).as("sum_v"),
        count(lit(1)).as("n"), min(col("value")).as("min_v"),
        max(col("value")).as("max_v"))
      .write.parquet(rollupPath)
    // getOrCreate would hand back the active TestSpark session (and skip
    // extension injection) — clear it so a NEW session is built on the
    // same SparkContext. `spark.sql.extensions` is a STATIC conf (only
    // honored when the first session boots), so in-JVM the extension
    // object goes through builder.withExtensions — the same
    // GraftExtensions.apply a `--conf` deployment runs.
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val sp = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-spec")
      .withExtensions(new graft.GraftExtensions())
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      assert(sp ne TestSpark.spark, "must be a fresh session")
      assert(sp.sessionState.optimizer.extendedOperatorOptimizationRules
        .contains(RollupRouteRule), "extension must inject the rule")
      RollupCatalog.register(rawPath, sp.read.parquet(rollupPath))
      val q = sp.read.parquet(rawPath)
        .groupBy(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(avg(col("value")).as("avg_v"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("rollup_1h") && !plan.contains("/points"),
        s"GraftExtensions-injected rule did not route:\n$plan")
      assert(q.collect().nonEmpty)
      // and the injected SQL functions ride along in the same session
      assert(sp.sql("SELECT cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F))")
        .head.getDouble(0) == 1.0)
      // SQL views and CTEs expand at analysis, so routing sees the same
      // Aggregate-over-scan — the BI-tool-authored read routes too
      sp.read.parquet(rawPath).createOrReplaceTempView("graft_points_v")
      val sqlQ = sp.sql(
        """WITH recent AS (
          |  SELECT * FROM graft_points_v
          |  WHERE ts >= TIMESTAMP '2024-01-10 00:00:00')
          |SELECT metric, date_trunc('hour', ts) AS bucket,
          |       avg(value) AS avg_v
          |FROM recent GROUP BY 1, 2""".stripMargin)
      val sqlPlan = sqlQ.queryExecution.executedPlan.toString
      assert(sqlPlan.contains("rollup_1h") && !sqlPlan.contains("/points"),
        s"view+CTE SQL read did not route:\n$sqlPlan")
      assert(sqlQ.collect().nonEmpty)
    } finally {
      RollupCatalog.clear()
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }
}
