package graft

import java.nio.file.Files
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
    try {
      RollupCatalog.register(rawPath, sp.read.parquet(rollupPath))
      def query() = sp.read.parquet(rawPath)
        .groupBy(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(avg(col("value")).as("avg_v"), sum(col("value")).as("sum_v"),
          min(col("value")).as("min_v"), max(col("value")).as("max_v"),
          count(lit(1)).as("n"))
      val routed = query()
      val plan = routed.queryExecution.executedPlan.toString
      assert(plan.contains("rollup_1h") && !plan.contains("/points"),
        s"expected the rollup scan, not raw points:\n$plan")
      // equivalence: routed reads merged archive values; n/min/max exact,
      // avg/sum within float-accumulation error of the raw computation
      RollupCatalog.clear() // so the reference query scans raw
      val expect = query().orderBy("metric", "bucket").collect()
      val got = routed.orderBy("metric", "bucket").collect()
      assert(got.length == expect.length && got.nonEmpty)
      got.zip(expect).foreach { case (g, e) =>
        assert(g.getString(0) == e.getString(0) &&
          g.getTimestamp(1) == e.getTimestamp(1))
        assert(math.abs(g.getDouble(2) - e.getDouble(2)) < 1e-9) // avg
        assert(math.abs(g.getDouble(3) - e.getDouble(3)) < 1e-6) // sum
        assert(g.getDouble(4) == e.getDouble(4) &&
          g.getDouble(5) == e.getDouble(5) && g.getLong(6) == e.getLong(6))
      }
      // DAILY grain routes too: the rule re-aggregates the hourly archive
      // (sum of partial sums — exact, never avg-of-avgs)
      RollupCatalog.register(rawPath, sp.read.parquet(rollupPath))
      def dailyQ() = sp.read.parquet(rawPath)
        .groupBy(col("metric"), date_trunc("day", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_v"),
          max(col("value")).as("max_v"))
      val daily = dailyQ()
      val dPlan = daily.queryExecution.executedPlan.toString
      assert(dPlan.contains("rollup_1h") && !dPlan.contains("/points"),
        s"daily grain should re-aggregate the rollup:\n$dPlan")
      RollupCatalog.clear()
      val dExpect = dailyQ().orderBy("metric", "bucket").collect()
      val dGot = daily.orderBy("metric", "bucket").collect()
      assert(dGot.length == dExpect.length && dGot.nonEmpty)
      dGot.zip(dExpect).foreach { case (g, e) =>
        assert(g.getString(0) == e.getString(0) &&
          g.getTimestamp(1) == e.getTimestamp(1) &&
          g.getLong(2) == e.getLong(2) && g.getDouble(4) == e.getDouble(4))
        assert(math.abs(g.getDouble(3) - e.getDouble(3)) < 1e-9)
      }
      RollupCatalog.register(rawPath, sp.read.parquet(rollupPath))
      // a FINER grain than the archive must NOT route
      val minute = sp.read.parquet(rawPath)
        .groupBy(col("metric"), date_trunc("minute", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"))
      assert(minute.queryExecution.executedPlan.toString.contains("/points"))
      // a VALUE filter keeps the raw scan (rule is conservative) ...
      val filtered = sp.read.parquet(rawPath)
        .where(col("value") > 50)
        .groupBy(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"))
      assert(filtered.queryExecution.executedPlan.toString.contains("/points"))
      // ... but a METRIC-only filter pushes through to the rollup
      val metricFiltered = sp.read.parquet(rawPath)
        .where(col("metric") === "click")
        .groupBy(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_v"))
      val mfPlan = metricFiltered.queryExecution.executedPlan.toString
      assert(mfPlan.contains("rollup_1h") && !mfPlan.contains("/points"),
        s"metric filter should route to the rollup:\n$mfPlan")
      RollupCatalog.clear()
      val mfExpect = sp.read.parquet(rawPath)
        .where(col("metric") === "click")
        .groupBy(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_v"))
        .orderBy("bucket").collect()
      val mfGot = metricFiltered.orderBy("bucket").collect()
      assert(mfGot.length == mfExpect.length && mfGot.nonEmpty)
      mfGot.zip(mfExpect).foreach { case (g, e) =>
        assert(g.getString(0) == "click" && g.getLong(2) == e.getLong(2))
        assert(math.abs(g.getDouble(3) - e.getDouble(3)) < 1e-9)
      }
    } finally {
      RollupCatalog.clear()
      sp.experimental.extraOptimizations =
        sp.experimental.extraOptimizations.filterNot(_ == RollupRouteRule)
    }
  }
}
