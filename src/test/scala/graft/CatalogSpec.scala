package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog._

class CatalogSpec extends AnyFunSuite {

  private val cat = SchemaCatalog.example

  test("first regex match wins; default catches the rest") {
    assert(cat.policyFor("cpu.load.p95").name == "high_freq")
    assert(cat.policyFor("requests.count").name == "counters")
    assert(cat.policyFor("weird.metric").name == "default")
    // 'cpu.*' matches high_freq BEFORE the counters suffix rule
    assert(cat.policyFor("cpu.req.count").name == "high_freq")
  }

  test("archive selection: smallest step covering the range; clamps") {
    val p = cat.policyFor("cpu.load")
    assert(RollupRouter.selectArchive(p, 3600).secondsPerPoint == 10)
    assert(RollupRouter.selectArchive(p, 5 * 86400).secondsPerPoint == 60)
    assert(RollupRouter.selectArchive(p, 200 * 86400).secondsPerPoint == 600)
    // beyond max retention → coarsest archive (ring clamp)
    assert(RollupRouter.selectArchive(p, 10L * 365 * 86400).secondsPerPoint == 600)
  }

  test("property: selected archive is minimal among covering archives") {
    val p = cat.policyFor("cpu.load")
    val rnd = new scala.util.Random(7) // seeded property sampling
    (1 to 500).foreach { _ =>
      val ago = 1L + math.abs(rnd.nextLong()) % (20L * 365 * 86400)
      val sel = RollupRouter.selectArchive(p, ago)
      val covering = p.archives.filter(_.retentionSeconds >= ago)
      if (covering.nonEmpty)
        assert(sel.secondsPerPoint == covering.map(_.secondsPerPoint).min)
      else assert(sel == p.archives.last)
    }
  }

  test("policy invariants rejected: unordered or non-multiple steps") {
    intercept[IllegalArgumentException] {
      RetentionPolicy("bad", ".*".r, Seq(Archive(60, 10), Archive(10, 10)))
    }
    intercept[IllegalArgumentException] {
      RetentionPolicy("bad2", ".*".r, Seq(Archive(60, 10), Archive(90, 10)))
    }
  }

  test("routed fetch aggregates at the selected step (events table)") {
    val spark = TestSpark.spark
    val pts = graft.io.Tables.events(spark, TestSpark.sf)
      .select(col("event_type").as("metric"), col("ts"), col("value"))
    val p = RetentionPolicy("t", "^click$".r, Seq(Archive(600, 1000000)))
    val out = RollupRouter.fetch(pts, p, col("metric") === "click",
        100L * 86400).collect()
    assert(out.nonEmpty)
    // buckets step-aligned to 600s
    out.foreach(r =>
      assert(r.getTimestamp(0).getTime % (600 * 1000) == 0))
    // conservation: bucket counts sum to the filtered row count
    val total = pts.where(col("metric") === "click").count()
    assert(out.map(_.getLong(2)).sum == total)
  }

  test("fetch clamps to the [from, until] window (table-max anchored)") {
    val spark = TestSpark.spark
    val pts = graft.io.Tables.events(spark, TestSpark.sf)
      .select(col("event_type").as("metric"), col("ts"), col("value"))
    val p = RetentionPolicy("t", ".*".r, Seq(Archive(3600, 1000000)))
    val out = RollupRouter.fetch(pts, p, col("metric") === "click",
      fromSecondsAgo = 10L * 86400, untilSecondsAgo = 2L * 86400).collect()
    assert(out.nonEmpty)
    val mx = pts.agg(max("ts")).head.getTimestamp(0).getTime
    val (lo, hi) = (mx - 10L * 86400 * 1000, mx - 2L * 86400 * 1000)
    // every bucket inside the window (bucket start may floor below lo by
    // less than one step; its POINTS are in-window, checked by count)
    out.foreach { r =>
      val b = r.getTimestamp(0).getTime
      assert(b >= lo - 3600 * 1000 && b <= hi + 1000,
        s"bucket $b outside window")
    }
    // conservation: exactly the in-window click points were aggregated
    // (same µs-exact window arithmetic as the clamp itself)
    val expected = pts
      .crossJoin(broadcast(pts.agg(max("ts").as("mxts"))))
      .where(col("metric") === "click" &&
        col("ts") >= col("mxts") - expr("INTERVAL 10 DAYS") &&
        col("ts") <= col("mxts") - expr("INTERVAL 2 DAYS"))
      .count()
    assert(out.map(_.getLong(2)).sum == expected && expected > 0)
    // and the window is a strict subset of the full history
    val full = RollupRouter.fetch(pts, p, col("metric") === "click",
      100L * 86400).collect()
    assert(out.length < full.length)
    // degenerate windows rejected
    intercept[IllegalArgumentException] {
      RollupRouter.fetch(pts, p, col("metric") === "click", 3600, 7200)
    }
  }

  test("resample: coarser archive conserves counts; avg-of-avgs semantics") {
    val spark = TestSpark.spark
    val pts = graft.io.Tables.events(spark, TestSpark.sf)
      .select(col("event_type").as("metric"), col("ts"), col("value"))
    val p = RetentionPolicy("t", ".*".r, Seq(Archive(3600, 1000000)))
    val h1 = RollupRouter.fetch(pts, p, col("metric") === "click",
        100L * 86400)
      .withColumn("metric", lit("click"))
    val h6 = RollupRouter.resample(h1, 6 * 3600, AggMethod.Average).collect()
    assert(h6.nonEmpty)
    // counts conserve through migration
    val n1 = h1.agg(sum("n")).head.getLong(0)
    assert(h6.map(_.getLong(3)).sum == n1)
    // buckets aligned to the new step
    h6.foreach(r => assert(r.getTimestamp(1).getTime % (6 * 3600 * 1000L) == 0))
  }

  test("incremental rollup maintenance equals full recompute") {
    val spark = TestSpark.spark
    import graft.ts.RollupMaintain
    val pts = graft.io.Tables.events(spark, TestSpark.sf)
      .select(col("event_type").as("metric"), col("ts"), col("value"))
    val split = "2024-01-20 00:00:00"
    // state as of the split: rollup of everything seen so far (the last
    // bucket is partial — exactly the frontier case)
    val existing = RollupMaintain.full(
      pts.where(col("ts") < lit(split).cast("timestamp")), 3600L)
    val merged = RollupMaintain.incremental(pts, existing, 3600L)
      .orderBy("metric", "bucket").collect()
    val reference = RollupMaintain.full(pts, 3600L)
      .orderBy("metric", "bucket").collect()
    assert(merged.length == reference.length)
    merged.zip(reference).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0) &&
        a.getTimestamp(1) == b.getTimestamp(1) && a.getLong(3) == b.getLong(3))
      assert(math.abs(a.getDouble(2) - b.getDouble(2)) < 1e-9)
    }
    // bootstrap: empty existing state must yield the full recompute
    val boot = RollupMaintain.incremental(pts, existing.limit(0), 3600L)
    assert(boot.count() == reference.length)
  }

  test("metric glob translation: node-local wildcards, braces, classes") {
    def m(glob: String, s: String) = s.matches(MetricGlob.toRegex(glob))
    assert(m("stats.web.*.p95", "stats.web.host1.p95"))
    assert(!m("stats.web.*.p95", "stats.web.host1.extra.p95")) // * stays in-node
    assert(m("stats.web.?.p95", "stats.web.a.p95"))
    assert(!m("stats.web.?.p95", "stats.web.ab.p95"))
    assert(m("{click,view}.count", "click.count"))
    assert(m("{click,view}.count", "view.count"))
    assert(!m("{click,view}.count", "error.count"))
    assert(m("host[12].cpu", "host1.cpu"))
    assert(!m("host[12].cpu", "host3.cpu"))
    assert(!m("a.b", "aXb")) // dot is literal, not regex any-char
    assert(m("*u*", "purchase") && m("*u*", "signup") && !m("*u*", "click"))
    // unbalanced braces are literals, never a broken regex group
    assert(m("host}1", "host}1") && !m("host}1", "host1"))
    assert(m("a{b.c", "a{b.c"))
    // class contents pass through VERBATIM: '*' inside [...] is the
    // literal class member, not a wildcard
    assert(m("host[*].cpu", "host*.cpu"))
    assert(!m("host[*].cpu", "hostX.cpu"))
    assert(m("up[._]time", "up.time") && m("up[._]time", "up_time"))
    // nested alternation: depth counter, not a boolean — the first '}'
    // closes only its own group
    assert(m("{a,{b,c}}", "a") && m("{a,{b,c}}", "b") && m("{a,{b,c}}", "c"))
    assert(!m("{a,{b,c}}", "d") && !m("{a,{b,c}}", "b,c"))
    assert(m("x.{p,{q,r}s}.y", "x.rs.y") && !m("x.{p,{q,r}s}.y", "x.q.y"))
    // unclosed class is a literal '[' (fnmatch behavior), still compilable
    assert(m("host[0.cpu", "host[0.cpu") && !m("host[0.cpu", "host0.cpu"))
    // fnmatch negation: [!...] excludes the class members
    assert(m("host[!0].cpu", "host1.cpu") && !m("host[!0].cpu", "host0.cpu"))
    // []] is a class holding a literal ']' (the first ']' is content)
    assert(m("x[]]y", "x]y") && !m("x[]]y", "xay"))
    assert(m("x[!]]y", "xay") && !m("x[!]]y", "x]y"))
    // regex-hostile class contents still compile and match literally
    assert(m("a[\\\\]b", "a\\b"))
    assert(m("a[&]b", "a&b"))
    // a NON-leading '[' inside the class must not open a nested class
    assert(m("[a[b]", "a") && m("[a[b]", "[") && m("[a[b]", "b") &&
      !m("[a[b]", "c"))
    assert(m("x[!a[]y", "xzy") && !m("x[!a[]y", "xay") && !m("x[!a[]y", "x[y"))
  }

  test("findNodes: one-level glob expansion with leaf/branch flags") {
    val spark = TestSpark.spark
    import spark.implicits._
    val ms = Seq("a.b", "a.b.c", "a.b.d", "a.e", "x.y").toDF("metric")
    val out = MetricGlob.findNodes(ms, "a.*").collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2)))
    // a.b is BOTH a leaf (exact metric) and a branch (a.b.c/a.b.d below)
    assert(out.toSeq == Seq(("a.b", true, true), ("a.e", true, false)))
    // deeper glob lists the leaves under the branch
    val deep = MetricGlob.findNodes(ms, "a.b.*").collect()
      .map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2)))
    assert(deep.toSeq == Seq(("a.b.c", true, false), ("a.b.d", true, false)))
  }

  test("aliasByNode picks the n-th dot node, null when out of range") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq("stats.web.host1.p95", "cpu").toDF("metric")
      .select(col("metric"),
        MetricGlob.aliasByNode(col("metric"), 2).as("n2"),
        MetricGlob.aliasByNode(col("metric"), -1).as("last"),
        MetricGlob.aliasByNode(col("metric"), 7).as("oob"))
      .orderBy("metric").collect()
    assert(df(1).getString(1) == "host1" && df(1).getString(2) == "p95" &&
      df(1).isNullAt(3))
    assert(df(0).getString(2) == "cpu" && df(0).isNullAt(1))
  }

  test("prefixed glob pushes StartsWith into the parquet scan") {
    val spark = TestSpark.spark
    val pts = graft.io.Tables.events(spark, TestSpark.sf)
      .select(col("event_type").as("metric"), col("ts"), col("value"))
    // 'p*' and 'click' both carry literal prefixes -> pushable conjunct
    val plan = pts.where(MetricGlob.predicate(col("metric"), "p*"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("StartsWith(event_type,p)"),
      s"expected pushed StartsWith filter:\n$plan")
    // and semantics are unchanged by the redundant conjunct
    val got = pts.where(MetricGlob.predicate(col("metric"), "p*"))
      .select("metric").distinct().collect().map(_.getString(0)).toSet
    assert(got == Set("purchase"))
  }

  test("fetchSeries: glob filters series, routes to the 1h archive") {
    val spark = TestSpark.spark
    val pts = graft.io.Tables.events(spark, TestSpark.sf)
      .select(col("event_type").as("metric"), col("ts"), col("value"))
    // hourly-only policy with retention >> the window, so the 100-day
    // window both SELECTS the 1h archive and covers all data (Default's
    // 1h archive retains only 30 days — a 100-day window would route to
    // its daily archive instead)
    val p = RetentionPolicy("t", ".*".r, Seq(Archive(3600, 1000000)))
    val out = RollupRouter.fetchSeries(pts, p, "*u*",
      100L * 86400).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getString(0)).toSet == Set("purchase", "signup"))
    out.foreach(r => assert(r.getTimestamp(1).getTime % (3600 * 1000) == 0))
    // hourly resolution really used: some bucket is off the day boundary
    assert(out.exists(_.getTimestamp(1).getTime % 86400000L != 0))
    val total = pts.where(col("metric").isin("purchase", "signup")).count()
    assert(out.map(_.getLong(3)).sum == total)
  }

  test("summarize via resample equals a direct 4h sum rollup") {
    val spark = TestSpark.spark
    val viaResample = graft.ts.TimeSeriesOps.summarize(spark, TestSpark.sf)
      .orderBy("metric", "bucket").collect()
    val direct = graft.io.Tables.events(spark, TestSpark.sf)
      .groupBy(col("event_type").as("metric"),
        timestamp_seconds((col("ts").cast("long") / (4 * 3600)).cast("long")
          * lit(4 * 3600)).as("bucket"))
      .agg(graft.util.Det.sum4(col("value")).as("v"),
        count(lit(1)).as("n"))
      .orderBy("metric", "bucket").collect()
    assert(viaResample.length == direct.length)
    viaResample.zip(direct).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0) &&
        a.getTimestamp(1) == b.getTimestamp(1) &&
        a.getDouble(2) == b.getDouble(2) && a.getLong(3) == b.getLong(3))
    }
  }

  test("describe renders the policy header") {
    val d = RollupRouter.describe(cat.policyFor("cpu.load"))
    assert(d.contains("high_freq") && d.contains("rollup_10s") &&
      d.contains("xFilesFactor"))
  }

  test("property: gapfill density — rows == types × buckets (scalacheck'd on steps)") {
    val spark = TestSpark.spark
    // fixed corpus, varying conceptual step: reuse the 6h gapfill query
    val rows = graft.ts.TimeSeriesOps.gapfill(spark, TestSpark.sf).collect()
    val types = rows.map(_.getString(0)).distinct.length
    val buckets = rows.map(_.getTimestamp(1)).distinct.length
    assert(rows.length == types * buckets)
  }
}
