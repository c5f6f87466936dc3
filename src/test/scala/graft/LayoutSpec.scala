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

  test("compaction: fragmented table collapses, data and schema survive") {
    val sp = TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("graft_compact")
      .resolve("events").toString
    val src = graft.io.Tables.events(sp, TestSpark.sf)
      .select("event_id", "event_type", "value")
    src.repartition(64).write.parquet(dir) // simulate micro-batch spray
    val checksum = src.agg(
      org.apache.spark.sql.functions.sum("event_id"),
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1))).head
    val (before, after) = graft.io.Layout.compact(sp, dir)
    assert(before == 64 && after < 8,
      s"expected 64 fragments to collapse, got $before -> $after")
    val back = sp.read.parquet(dir)
    val backSum = back.agg(
      org.apache.spark.sql.functions.sum("event_id"),
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1))).head
    assert(backSum == checksum && back.columns.toSeq ==
      Seq("event_id", "event_type", "value"))
    // idempotent: compacting a compacted table is a no-op-sized rewrite
    val (b2, a2) = graft.io.Layout.compact(sp, dir)
    assert(b2 == after && a2 <= after)
    // a partitioned ROOT must be rejected (rewriting it would flatten
    // the date directories) — compact leaves only
    val partDir = java.nio.file.Files.createTempDirectory("graft_part")
      .resolve("pts").toString
    graft.io.Layout.writeDatePartitioned(
      graft.io.Tables.events(sp, TestSpark.sf)
        .select(col("event_type").as("metric"), col("ts"), col("value")),
      partDir)
    intercept[IllegalArgumentException] {
      graft.io.Layout.compact(sp, partDir)
    }
    // crash recovery: a compaction that died between the two renames
    // (data stranded at <path>_precompact) heals on the next call
    val stranded = new java.io.File(dir)
    val precompact = new java.io.File(dir + "_precompact")
    assert(stranded.renameTo(precompact)) // simulate the crash window
    val (b3, a3) = graft.io.Layout.compact(sp, dir)
    assert(b3 == after && a3 <= after, "recovery then compact must work")
    assert(sp.read.parquet(dir).count() == checksum.getLong(1))
  }

  test("scaleup: K=2 replica preserves FK integrity and scales counts") {
    val sp = TestSpark.spark
    import org.apache.spark.sql.functions._
    val dst = java.nio.file.Files.createTempDirectory("graft_scaleup")
      .toString
    graft.tools.ScaleUp.run(sp, "/root/testdata/sf0.001", dst, 2)
    def t(n: String) = sp.read.parquet(s"$dst/$n.parquet")
    def src(n: String) =
      sp.read.parquet(s"/root/testdata/sf0.001/$n.parquet")
    // counts double for replicated tables, dims stay
    assert(t("lineitem").count() == 2 * src("lineitem").count())
    assert(t("orders").count() == 2 * src("orders").count())
    assert(t("region").count() == src("region").count())
    // FK integrity survives the key shift: no orphans either direction
    assert(t("orders").join(t("customer"),
      col("o_custkey") === col("c_custkey"), "left_anti").count() == 0)
    assert(t("lineitem").join(t("orders"),
      col("l_orderkey") === col("o_orderkey"), "left_anti").count() == 0)
    assert(t("lineitem").join(t("part"),
      col("l_partkey") === col("p_partkey"), "left_anti").count() == 0)
    // replicas do not collide: key spaces stay unique per key column
    assert(t("orders").select("o_orderkey").distinct().count() ==
      t("orders").count())
  }

  test("table health flags fragmentation; compaction clears it") {
    val sp = TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("graft_health")
      .resolve("t").toString
    graft.io.Tables.events(sp, TestSpark.sf)
      .select("event_id", "value").repartition(32).write.parquet(dir)
    val (n1, bytes1, mean1, frac1) = graft.io.Layout.tableHealth(sp, dir)
    assert(n1 == 32 && bytes1 > 0 && mean1 == bytes1 / 32)
    assert(frac1 == 1.0, s"32 KB-scale fragments must all read small: $frac1")
    graft.io.Layout.compact(sp, dir)
    val (n2, bytes2, _, _) = graft.io.Layout.tableHealth(sp, dir)
    assert(n2 < 8, s"compaction should collapse the fragments: $n2")
    // bytes shift with encoding, rows must not (compact() verifies);
    // health sees the same order of magnitude
    assert(bytes2 > 0 && math.abs(bytes2 - bytes1) < bytes1)
  }

  test("rollup fold conserves every partial under a racing live appender") {
    // the concurrent-writer proof: a background thread keeps appending
    // partial batches (liveRollupWriter's output shape) while
    // compactRollup runs its staged swap repeatedly; afterwards every
    // appended batch must be accounted for — folded or rescued, never
    // lost, never double-counted
    val sp = TestSpark.spark
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_race")
      .resolve("rollup").toString
    val RowsPerBatch = 20
    def mkBatch(i: Int) = {
      import sp.implicits._
      (0 until RowsPerBatch).map { j =>
        val v = (i * RowsPerBatch + j).toLong
        (s"m${j % 5}", java.sql.Timestamp.valueOf(f"2024-01-01 ${j % 8}%02d:00:00"),
          java.math.BigDecimal.valueOf(v * 10000L, 4), 1L,
          v.toDouble, v.toDouble)
      }.toDF("metric", "bucket", "sum_v", "n", "min_v", "max_v")
        .select(col("metric"), col("bucket"),
          col("sum_v").cast("decimal(18,4)").as("sum_v"), col("n"),
          col("min_v"), col("max_v"))
    }
    mkBatch(0).write.parquet(dir) // base batch 0
    val written = new java.util.concurrent.atomic.AtomicInteger(1)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val appenderErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val appender = new Thread(() => {
      // commit discipline: write each batch to a scratch dir, then ONE
      // atomic file move into the table (recreating the dir if the
      // swap has it staged away — deliberately exercising the
      // recreated-dir race the publish path handles). Atomic move ⇒
      // a batch is either fully committed (counted) or absent.
      var i = 1
      try while (!stop.get() && i < 60) {
        val scratch = java.nio.file.Files
          .createTempDirectory(s"graft_race_b$i").resolve("out")
        mkBatch(i).coalesce(1).write.parquet(scratch.toString)
        val part = {
          val s = java.nio.file.Files.list(scratch)
          try s.filter(_.getFileName.toString.endsWith(".parquet"))
            .findFirst().get()
          finally s.close()
        }
        // the table dir vanishes briefly mid-swap: recreate and retry
        var committed = false
        var tries = 0
        while (!committed && tries < 200 && !stop.get()) {
          tries += 1
          try {
            java.nio.file.Files.createDirectories(
              java.nio.file.Paths.get(dir))
            java.nio.file.Files.move(part,
              java.nio.file.Paths.get(dir, s"race-batch-$i.parquet"),
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            committed = true
          } catch {
            case _: java.nio.file.NoSuchFileException => Thread.sleep(2)
          }
        }
        if (committed) written.incrementAndGet() // count only commits
        i += 1
      } catch { case t: Throwable => appenderErr.set(t) }
    })
    appender.start()
    // three folds racing the appender: each must either publish with
    // conservation intact or fail CLEANLY with the data still complete
    (1 to 3).foreach { _ =>
      Thread.sleep(30)
      try graft.io.Layout.compactRollup(sp, dir)
      catch { case _: IllegalStateException => () }
    }
    stop.set(true)
    appender.join(60000)
    assert(!appender.isAlive, "appender must terminate")
    assert(appenderErr.get() == null,
      s"appender must survive the swaps: ${appenderErr.get()}")
    // quiesced final fold, then audit the decomposable totals against
    // every batch the appender actually committed
    graft.io.Layout.compactRollup(sp, dir)
    val n = written.get()
    val totalRows = (n * RowsPerBatch).toLong
    val expectSum = java.math.BigDecimal.valueOf(
      totalRows * (totalRows - 1) / 2 * 10000L, 4)
    val back = sp.read.parquet(dir)
    val audit = back.agg(
      sum(col("sum_v").cast("decimal(28,4)")).as("s"),
      sum(col("n")).as("c"), count(lit(1)).as("r")).head
    assert(audit.getLong(1) == totalRows,
      s"lost/duplicated observations: n=${audit.getLong(1)} expected $totalRows ($n batches)")
    assert(audit.getDecimal(0).compareTo(expectSum) == 0,
      s"sum drift: ${audit.getDecimal(0)} vs $expectSum")
    // post-quiesce fold leaves exactly one row per (metric, bucket)
    val grain = back.select("metric", "bucket").distinct().count()
    assert(audit.getLong(2) == grain,
      s"fold must land at bucket grain: ${audit.getLong(2)} rows vs $grain buckets")
    assert(n > 3, s"appender should have raced at least a few batches, got $n")
  }

  test("z-order write narrows per-file envelopes on BOTH dimensions") {
    val sp = TestSpark.spark
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft_zorder")
    val zDir = root.resolve("z").toString
    val sDir = root.resolve("s").toString
    val src = graft.io.Tables.lineitem(sp, TestSpark.sf)
      .select("l_partkey", "l_suppkey", "l_quantity")
    graft.io.Layout.writeZOrdered(src, "l_partkey", "l_suppkey", zDir)
    // the single-column clustered baseline (perfect on partkey, blind
    // on suppkey)
    src.repartitionByRange(8, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(sDir)
    // per-FILE normalized (max-min) spread of each dimension — the
    // min/max envelope a reader's skipping logic sees
    def spreads(dir: String): Seq[(Double, Double)] = {
      val g = sp.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg((max("l_partkey") - min("l_partkey")).as("sp"),
          (max("l_suppkey") - min("l_suppkey")).as("ss"))
        .collect()
      val gp = src.agg(max("l_partkey") - min("l_partkey"),
        max("l_suppkey") - min("l_suppkey")).head
      g.map(r => (r.getLong(1).toDouble / gp.getLong(0),
        r.getLong(2).toDouble / gp.getLong(1))).toSeq
    }
    val zs = spreads(zDir)
    val ss = spreads(sDir)
    def avg(xs: Seq[Double]) = xs.sum / xs.size
    // the worst dimension is what 2-D pruning pays for: z-order must
    // beat the single-sort layout decisively there (single sort leaves
    // suppkey at ~full spread per file; z-order halves both dims per
    // 4 files by construction)
    val zWorst = avg(zs.map { case (a, b) => math.max(a, b) })
    val sWorst = avg(ss.map { case (a, b) => math.max(a, b) })
    assert(zWorst < 0.75 * sWorst,
      s"z-order worst-dim spread $zWorst vs single-sort $sWorst")
    // and data survives intact
    assert(sp.read.parquet(zDir).count() == src.count())
  }

  test("bucketed tables join without a shuffle (co-located join)") {
    val sp = spark
    import org.apache.spark.sql.functions._
    sp.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Layout.writeBucketed(Tables.orders(sp, sf), "orders_b", 4,
        "o_orderkey", Seq("o_orderkey"))
      Layout.writeBucketed(
        Tables.lineitem(sp, sf).select("l_orderkey", "l_quantity"),
        "lineitem_b", 4, "l_orderkey", Seq("l_orderkey"))
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

  test("AQE splits a skewed join partition (skew=true in the final plan)") {
    val sp = spark
    import sp.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> sp.conf.getOption(k) }
    confs.foreach { case (k, v) => sp.conf.set(k, v) }
    try {
      // one hot key carrying ~97% of the left side
      val left = sp.range(0, 200000)
        .select(when(col("id") % 32 === 0, col("id") % 97).otherwise(lit(7L))
          .as("k"), col("id").as("payload"))
      val right = sp.range(0, 97).select(col("id").as("k"),
        concat(lit("dim_"), col("id")).as("name"))
      val j = left.join(right, "k")
      // execute THIS dataset's own QueryExecution (count() would plan a
      // separate aggregated query and leave j's adaptive plan unexecuted)
      val n = j.collect().length
      assert(n == 200000, s"join lost rows: $n")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE skew-join split in final plan:\n$plan")
    } finally {
      saved.foreach {
        case (k, Some(v)) => sp.conf.set(k, v)
        case (k, None) => sp.conf.unset(k)
      }
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
