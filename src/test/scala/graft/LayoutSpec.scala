package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.{Layout, Tables}

class LayoutSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private def sf = TestSpark.sf

  test("date-partitioned layout: roundtrip + partition pruning in the plan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_layout").toString
    val pts = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    Layout.writeDatePartitioned(pts, dir)
    val back = Layout.readDatePartitioned(spark, dir)
    assert(back.count() == pts.count())
    // a date predicate must prune partitions, not filter rows post-scan
    val pruned = back.where(col("date") === "2024-01-05")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(date"),
      s"expected partition pruning:\n$plan")
    val expected = pts.where(date_format(col("ts"), "yyyy-MM-dd") === "2024-01-05").count()
    assert(pruned.count() == expected)
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    val sp = spark
    import org.apache.spark.sql.functions._
    sp.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(sp, sf).write.bucketBy(4, "o_orderkey")
        .sortBy("o_orderkey").mode("overwrite").saveAsTable("orders_b")
      Tables.lineitem(sp, sf).select("l_orderkey", "l_quantity")
        .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("lineitem_b")
      val j = sp.table("orders_b")
        .join(sp.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      val plan = j.queryExecution.executedPlan.toString
      val joinKeyExchanges =
        "Exchange hashpartitioning\\((o_orderkey|l_orderkey)".r
          .findAllIn(plan).size
      assert(joinKeyExchanges == 0,
        s"bucketed join must not shuffle on the join key:\n$plan")
      assert(j.collect().map(_.getLong(1)).sum ==
        Tables.lineitem(sp, sf).count())
    } finally {
      sp.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      sp.sql("DROP TABLE IF EXISTS orders_b")
      sp.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("salted aggregation equals direct aggregation") {
    val e = Tables.events(spark, sf)
    val direct = e.groupBy(col("event_type").as("k"))
      .agg(sum(col("value").cast("decimal(18,4)")).as("v"))
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    val salted = Layout.saltedAgg(e, col("event_type"), salts = 8,
        partial = c => sum(c.cast("decimal(18,4)")),
        merge = c => sum(c), valueCol = col("value"))
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    assert(salted == direct)
  }
}
