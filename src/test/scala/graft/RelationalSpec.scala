package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RelationalSpec extends AnyFunSuite {
  import graft.rel.RelationalOps
  private def spark = TestSpark.spark
  private def sf = TestSpark.sf

  test("scan_project prunes columns and limits") {
    val df = RelationalOps.scanProject(spark, sf)
    assert(df.columns.length == 5 && df.count() == 100)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"), "projection should reach the scan")
  }

  test("filter_pred pushes predicates into the parquet scan") {
    val plan = RelationalOps.filterPred(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("o_totalprice"), s"filters not pushed:\n$plan")
  }

  test("join_broadcast picks a BroadcastHashJoin") {
    val plan = RelationalOps.joinBroadcast(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast:\n$plan")
  }

  test("join_left preserves all customers") {
    val n = RelationalOps.joinLeft(spark, sf).count()
    val c = graft.io.Tables.customer(spark, sf).count()
    assert(n == c)
  }

  test("semi + anti partition parts/customers consistently") {
    val semi = RelationalOps.joinSemi(spark, sf).count()
    val parts = graft.io.Tables.part(spark, sf).count()
    assert(semi <= parts && semi > 0)
    val anti = RelationalOps.joinAnti(spark, sf).count()
    val cust = graft.io.Tables.customer(spark, sf).count()
    assert(anti < cust) // most customers have an urgent order
  }

  test("asof: signup_ts is never after the purchase ts") {
    val bad = RelationalOps.joinAsof(spark, sf)
      .where(col("signup_ts") > col("p_ts")).count()
    assert(bad == 0)
  }

  test("rollup emits per-pair, per-flag and grand-total rows") {
    val rows = RelationalOps.aggRollupSets(spark, sf).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    val lineCount = graft.io.Tables.lineitem(spark, sf).count()
    assert(grand.head.getLong(2) == lineCount)
  }

  test("agg_hll approximates exact distinct within 5%") {
    val approx = RelationalOps.aggHll(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = RelationalOps.aggDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      assert(math.abs(approx(k) - ex).toDouble / ex < 0.05,
        s"$k: approx=${approx(k)} exact=$ex")
    }
  }

  test("window_running: run equals prefix sum of rev") {
    val rows = RelationalOps.windowRunning(spark, sf).collect()
    var acc = BigDecimal(0)
    rows.foreach { r =>
      acc += BigDecimal(r.getDouble(1).toString)
      assert(math.abs(acc.toDouble - r.getDouble(2)) < 1e-6)
    }
  }

  test("topk_group: exactly 3 rows per priority, descending price") {
    val rows = RelationalOps.topkGroup(spark, sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      assert(g.length == 3)
      val prices = g.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
    }
  }

  test("set ops: intersect ⊆ union; except disjoint from part>10") {
    val u = RelationalOps.setUnion(spark, sf).collect().map(_.getInt(0)).toSet
    val i = RelationalOps.setIntersect(spark, sf).collect().map(_.getInt(0)).toSet
    assert(i.subsetOf(u))
  }

  test("explode_tokens: 20 rows, counts non-increasing") {
    val n = RelationalOps.explodeTokens(spark, sf).collect().map(_.getLong(1))
    assert(n.length == 20 && n.zip(n.tail).forall { case (a, b) => a >= b })
  }
}
