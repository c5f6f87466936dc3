package graft.ts

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.util.Det

/** Kenshin TSDB semantics re-expressed as Spark declarative plans.
  *
  * Reference semantics (zzl0/Kenshin-backup, [U] anchors per SURVEY §2.1):
  *  - rollup/propagation: `kenshin/storage.py — propagate`, `kenshin/agg.py`
  *  - fetch with dense gap-filled output: `kenshin/storage.py — Storage.fetch`
  *  - xFilesFactor thresholding: `kenshin/storage.py — propagate`
  *  - retention ring-expiry: `kenshin/storage.py — fetch` clamp
  *  - cache/disk read-merge: `rurouni/protocols.py — CacheManagementHandler`
  *
  * Scale posture (100 TB): every query is a single declarative plan — scans
  * prune columns, aggregations are partial (map-side combine) before the
  * shuffle on (event_type, bucket), and the only joins are against tiny
  * (grid / distinct-type / scalar-max) relations that Spark broadcasts.
  * Nothing collects to the driver. At production scale the raw table is
  * date-partitioned and old partitions are replaced by their rollups
  * (Kenshin's retention economics, SURVEY §4).
  */
object TimeSeriesOps {

  private val HourUs = 3600L * 1000000L
  private val SixHourUs = 6L * HourUs

  /** Epoch-aligned bucket (Kenshin R8: `ts - ts % step`), as µs TIMESTAMP. */
  private def alignUs(stepUs: Long) =
    timestamp_micros(expr(s"(unix_micros(ts) div ${stepUs}L) * ${stepUs}L"))

  /** The highest-resolution archive grouping: per-series hourly buckets —
    * shared by every rollup/fetch read in this module. */
  private def hourly(spark: SparkSession, sfDir: String) =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket"))

  /** The MATERIALIZED hourly-average archive — Kenshin's architecture
    * applied to this module's own read path (R4/R6: fetch routes to
    * precomputed rollup archives, never to raw points): the
    * (event_type, bucket, exact-avg) relation is the identical common
    * prefix of ~60 ts queries, so it memoizes per (session, corpus) as
    * a lazily-checkpointed relation — the coPurchasePairs /
    * tokenize-once discipline (r17). Computed from the parquet inputs
    * at first use within a run; never persisted across runs. The
    * archive is series×calendar-sized (types × hours — thousands of
    * rows at any corpus SF, since scale grows traffic density, not the
    * calendar), so the frozen AQE-coalesced layout is the layout every
    * consumer already saw behind its own per-query checkpoint. */
  private val hourlyAvgCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** appIds that already registered an end-of-application eviction hook
    * (r17 advice: without cleanup a long-lived multi-context JVM pins
    * every dead app's checkpointed archive RDDs forever). */
  private val hourlyAvgCleanupRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def registerHourlyAvgCleanup(spark: SparkSession): Unit = {
    val appId = spark.sparkContext.applicationId
    if (hourlyAvgCleanupRegistered.add(appId))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              e: org.apache.spark.scheduler.SparkListenerApplicationEnd)
              : Unit = {
            hourlyAvgCache.keySet.removeIf(_.startsWith(appId + "|"))
            hourlyAvgCleanupRegistered.remove(appId)
          }
        })
  }

  /** The archive's PRE-CHECKPOINT relation — what actually executes to
    * build it. PlanSpec inspects this (the standing rule: localCheckpoint
    * hides upstream operators from consumer plans). */
  private[graft] def hourlyAvgRelation(spark: SparkSession,
      sfDir: String): DataFrame =
    hourly(spark, sfDir).agg(Det.avg4(col("value")).as("v"))

  private def hourlyAvg(spark: SparkSession, sfDir: String): DataFrame = {
    registerHourlyAvgCleanup(spark)
    hourlyAvgCache.computeIfAbsent(
      s"${spark.sparkContext.applicationId}|" +
        s"${Integer.toHexString(System.identityHashCode(spark))}|$sfDir",
      _ => hourlyAvgRelation(spark, sfDir).localCheckpoint(eager = false))
  }

  /** 1h tumbling average per series — the flagship rollup (R5/R6 `average`). */
  def rollupAvg(spark: SparkSession, sfDir: String): DataFrame =
    hourlyAvg(spark, sfDir)
      .orderBy(col("event_type"), col("bucket"))

  def rollupSum(spark: SparkSession, sfDir: String): DataFrame =
    hourly(spark, sfDir)
      .agg(Det.sum4(col("value")).as("v"))
      .orderBy(col("event_type"), col("bucket"))

  /** min+max in one aggregation pass (single shuffle, two measures). */
  def rollupMinMax(spark: SparkSession, sfDir: String): DataFrame =
    hourly(spark, sfDir)
      .agg(round(min("value"), 4).as("mn"), round(max("value"), 4).as("mx"))
      .orderBy(col("event_type"), col("bucket"))

  /** Kenshin `last` agg (kenshin/agg.py [U]): value carrying the max ts.
    * `max_by` keeps this a single-pass hash aggregate; raw nanos break
    * sub-µs ties identically to the µs oracle (no µs ties in data), and
    * the value itself is the explicit final tiebreak so the result is
    * well-defined even under exact-timestamp duplicates. */
  def rollupLast(spark: SparkSession, sfDir: String): DataFrame =
    hourly(spark, sfDir)
      .agg(round(max_by(col("value"), struct(col("ts_ns"), col("value"))), 4)
        .as("v"))
      .orderBy(col("event_type"), col("bucket"))

  /** R8 step alignment: pure epoch arithmetic (NOT calendar truncation) —
    * 600 s buckets emitted as BIGINT epoch-seconds, immune to
    * timestamp-type dialect drift. */
  def align10m(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"),
        expr("(unix_micros(ts) div 600000000L) * 600").as("bucket_s"))
      .agg(count(lit(1)).as("n"), Det.avg4(col("value")).as("v"))
      .orderBy(col("event_type"), col("bucket_s"))

  /** R4 `fetch`: dense step-aligned grid with explicit NULL gaps.
    * grid = sequence(min_bucket, max_bucket, 6h) × distinct(event_type);
    * both inputs are tiny aggregates, so the outer join broadcasts —
    * at 100 TB the expensive side (the rollup) never re-shuffles. */
  def gapfill(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    val rollup = e
      .groupBy(col("event_type"), alignUs(SixHourUs).as("bucket"))
      .agg(Det.avg4(col("value")).as("v"))
    val grid = rollup
      .agg(min("bucket").as("lo"), max("bucket").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("INTERVAL 6 HOURS"))).as("bucket"))
    val types = e.select(col("event_type")).distinct()
    grid.crossJoin(types)
      .join(rollup, Seq("event_type", "bucket"), "left")
      .select(col("event_type"), col("bucket"), col("v"))
      .orderBy(col("event_type"), col("bucket"))
  }

  /** R5 xFilesFactor: a rollup bucket only materializes when enough
    * higher-resolution points back it (here: count >= 10 per 1h bucket). */
  def xff(spark: SparkSession, sfDir: String): DataFrame =
    hourly(spark, sfDir)
      .agg(Det.avg4(col("value")).as("v"), count(lit(1)).as("n"))
      .where(col("n") >= 10)
      .orderBy(col("event_type"), col("bucket"))

  /** R5 propagation, faithful avg-of-avgs: the 6h archive aggregates the
    * stored (rounded) 1h archive values, not the raw points. */
  def propagate(spark: SparkSession, sfDir: String): DataFrame = {
    val h1 = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("b1"))
      .agg(Det.avg4(col("value")).as("v1"))
    h1.groupBy(col("event_type"),
        timestamp_micros(expr(s"(unix_micros(b1) div ${SixHourUs}L) * ${SixHourUs}L")).as("bucket"))
      .agg(Det.avg4(col("v1"), 4).as("v"))
      .orderBy(col("event_type"), col("bucket"))
  }

  /** R9 retention: only points within 7 days of the table max — the
    * ring-buffer expiry window. The scalar max is a 1-row broadcast;
    * at scale this becomes partition pruning on date partitions. */
  def retention(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    val mx = e.agg(max("ts").as("mx"))
    e.crossJoin(mx)
      .where(col("ts") >= col("mx") - expr("INTERVAL 7 DAYS"))
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .orderBy(col("event_id"))
  }

  /** R15 cache/disk read-merge: rollup of flushed ("disk", ts < split)
    * unioned with rollup of unflushed ("cache", ts >= split). */
  def cacheMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    val split = expr("TIMESTAMP '2024-01-25 00:00:00'")
    def side(df: DataFrame, tag: String) = df
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
      .agg(Det.avg4(col("value")).as("v"))
      .select(lit(tag).as("src"), col("event_type"), col("bucket"), col("v"))
    side(e.where(col("ts") < split), "disk")
      .unionByName(side(e.where(col("ts") >= split), "cache"))
      .orderBy(col("src"), col("event_type"), col("bucket"))
  }

  /** Graphite-layer topK (sits above Kenshin in the reference stack):
    * top-10 series by total value, rank on the rounded measure so the
    * limit boundary is engine-independent. */
  def topkSeries(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(Det.sum4(col("value")).as("s"))
      .orderBy(desc("s"), col("user_id"))
      .limit(10)

  /** Graphite-layer `derivative`: per-series delta between consecutive
    * rollup buckets (the rate-of-change read on counters). Window over
    * the already-aggregated hourly rollup — tiny relative to raw. */
  def derivative(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h1 = hourlyAvg(spark, sfDir)
    val w = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    h1.withColumn("dv", Det.r4(col("v") - lag(col("v"), 1).over(w)))
      .orderBy("event_type", "bucket")
  }

  /** Graphite `nonNegativeDerivative`: the counter-safe rate read — the
    * per-series bucket delta, with negative deltas (a counter wrap or
    * process restart) nulled out instead of emitting garbage spikes.
    * This is the single most-used counter transform in any Graphite
    * deployment (graphite-web functions layer [U, SURVEY §2.1]). */
  def nonnegDerivative(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h1 = hourlyAvg(spark, sfDir)
    val w = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    h1.withColumn("d", col("v") - lag(col("v"), 1).over(w))
      .select(col("event_type"), col("bucket"), col("v"),
        when(col("d") < 0, lit(null)).otherwise(Det.r4(col("d"))).as("dv"))
      .orderBy("event_type", "bucket")
  }

  /** Graphite `perSecond`: nonNegativeDerivative normalized by the bucket
    * step — the canonical requests-per-second read on counters. */
  def perSecond(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h1 = hourlyAvg(spark, sfDir)
    val w = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    h1.withColumn("d", col("v") - lag(col("v"), 1).over(w))
      .select(col("event_type"), col("bucket"), col("v"),
        when(col("d") < 0, lit(null))
          .otherwise(Det.r4(col("d") / lit(3600.0))).as("rate"))
      .orderBy("event_type", "bucket")
  }

  /** Graphite `summarize(series, "4h", "sum")`, surfaced through the
    * archive-migration primitive [[graft.catalog.RollupRouter.resample]]:
    * the stored hourly SUM archive re-aggregated to a 4h step (sum-of-sums
    * is exact, so this equals a direct 4h rollup — asserted in
    * CatalogSpec). */
  def summarize(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.catalog.{AggMethod, RollupRouter}
    val h1 = Tables.events(spark, sfDir)
      .groupBy(col("event_type").as("metric"),
        date_trunc("hour", col("ts")).as("bucket"))
      .agg(Det.sum4(col("value")).as("v"), count(lit(1)).as("n"))
    RollupRouter.resample(h1, 4 * 3600, AggMethod.Sum)
  }

  /** Graphite series arithmetic (`divideSeries(sumSeries(errors),
    * sumSeries(views))`): the error-rate read — computed as two
    * conditional exact sums in ONE aggregation pass (no self-join, one
    * shuffle on the bucket key). */
  def seriesRatio(spark: SparkSession, sfDir: String): DataFrame = {
    def condSum(t: String) =
      sum(when(col("event_type") === t, col("value"))
        .cast("decimal(18,4)")).cast("double")
    Tables.events(spark, sfDir)
      .groupBy(date_trunc("hour", col("ts")).as("bucket"))
      .agg(condSum("error").as("err"), condSum("view").as("req"))
      .select(col("bucket"), col("err"), col("req"),
        when(col("req") > 0, Det.r4(col("err") / col("req"))).as("ratio"))
      .orderBy("bucket")
  }

  /** The routed single-series fetch (R4) as a declared query: the
    * catalog's default policy routes a 20-day window to its 1h archive
    * and aggregates one metric — `fetch("click", -20d, now)`. */
  def fetchRouted(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.catalog.{RollupRouter, SchemaCatalog}
    val pts = Tables.events(spark, sfDir)
      .select(col("event_type").as("metric"), col("ts"), col("value"))
    RollupRouter.fetch(pts, SchemaCatalog.Default, col("metric") === "click",
      fromSecondsAgo = 20L * 86400)
  }

  /** The BOUNDED routed fetch (R4): `fetch("click", -10d, -2d)` — both
    * window edges clamp the data read, Kenshin's `Storage.fetch`
    * semantics ([U]). Proves the router's [from, until] clamp against a
    * `WHERE ts BETWEEN` oracle. */
  def fetchBounded(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.catalog.{RollupRouter, SchemaCatalog}
    val pts = Tables.events(spark, sfDir)
      .select(col("event_type").as("metric"), col("ts"), col("value"))
    RollupRouter.fetch(pts, SchemaCatalog.Default, col("metric") === "click",
      fromSecondsAgo = 10L * 86400, untilSecondsAgo = 2L * 86400)
  }

  /** [[fetchRouted]] through the SQL SURFACE: the points table as a temp
    * view, the router supplying the archive step, and the fetch itself as
    * `spark.sql` text (exact [[Det]] accumulation in Spark-SQL dialect) —
    * what a BI tool driving the routed read path would run. Same oracle
    * as q_ts_fetch_routed, mirroring the q_sql_cosine_topk pattern. */
  def sqlFetchRouted(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.catalog.{RollupRouter, SchemaCatalog}
    Tables.events(spark, sfDir)
      .select(col("event_type").as("metric"), col("ts"), col("value"))
      .createOrReplaceTempView("graft_points")
    val a = RollupRouter.selectArchive(SchemaCatalog.Default, 20L * 86400)
    val step = a.secondsPerPoint
    spark.sql(
      s"""WITH mx AS (SELECT max(ts) AS now_ts FROM graft_points)
        |SELECT timestamp_seconds((CAST(p.ts AS LONG) div ${step}L) * ${step}L) AS bucket,
        |       ${graft.util.Det.avg4SparkSql("p.value")} AS v, count(*) AS n
        |FROM graft_points p CROSS JOIN mx
        |WHERE p.metric = 'click'
        |  AND p.ts >= mx.now_ts - INTERVAL 20 DAYS AND p.ts <= mx.now_ts
        |GROUP BY 1
        |ORDER BY bucket""".stripMargin)
  }

  /** Graphite `movingMedian("7h")` over the hourly rollup, restricted to
    * FULL 7-bucket frames: an odd-width ROWS frame makes the median pure
    * element selection (no interpolation arithmetic), so it is exact and
    * engine-independent. */
  def movingMedian(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h1 = hourlyAvg(spark, sfDir)
    val wSeq = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    val wFrame = wSeq.rowsBetween(-6, 0)
    h1.withColumn("rn", row_number().over(wSeq))
      .withColumn("med", expr("percentile(v, 0.5)").over(wFrame))
      .where(col("rn") >= 7) // full frames only: 7 values, exact middle
      .select(col("event_type"), col("bucket"), col("v"), col("med"))
      .orderBy("event_type", "bucket")
  }

  /** Graphite `highestCurrent(3)`: the 3 series whose LATEST rollup
    * value is largest — one max_by pass per series, then a global top-3
    * (TakeOrderedAndProject; never a full sort). */
  def highestCurrent(spark: SparkSession, sfDir: String): DataFrame =
    hourlyAvg(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(max_by(struct(col("bucket"), col("v")), col("bucket")).as("m"))
      .select(col("event_type"), col("m.bucket").as("last_bucket"),
        col("m.v").as("current"))
      .orderBy(col("current").desc, col("event_type"))
      .limit(3)

  /** Glob-resolved multi-series fetch (KenshinFinder → routed read): the
    * glob `*u*` resolves the metric set (purchase, signup), the router
    * picks the 1h archive for a 20-day window, and one shuffle aggregates
    * every matched series (R4 + SURVEY §3.2 stage 1). */
  def globFetch(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.catalog.{RollupRouter, SchemaCatalog}
    val pts = Tables.events(spark, sfDir)
      .select(col("event_type").as("metric"), col("ts"), col("value"))
    RollupRouter.fetchSeries(pts, SchemaCatalog.Default, "*u*",
      fromSecondsAgo = 20L * 86400)
  }

  /** Graphite `keepLastValue` / LOCF: the gap-filled fetch with forward
    * fill — nulls carry the last observed rollup value within a series.
    * One window over the dense grid; the grid itself broadcasts (R4). */
  def locf(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gapfill(spark, sfDir)
      .withColumn("v_filled", last(col("v"), ignoreNulls = true).over(w))
      .orderBy("event_type", "bucket")
  }

  /** Graphite `interpolate(series)`: linear interpolation across
    * interior gaps of the dense 6h grid (leading/trailing gaps stay
    * NULL, exactly as graphite-web). Neighbors come from two
    * ignore-nulls window passes over the [[gapfill]] grid (LOCF for
    * the left anchor, first-following for the right); the blend runs
    * on the integer grid index, so the fraction is an exact small-int
    * ratio and the whole formula is the same IEEE double op sequence
    * in both engines (anchors are exact 4-decimal doubles — no libm).
    * Two window passes over one partition key = one shuffle. */
  def interpolate(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wb = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val i = expr(s"unix_micros(bucket) div ${SixHourUs}L")
    val idxOrNull = when(col("v").isNotNull, col("i"))
    val frac = (col("i") - col("ip")).cast("double") /
      (col("inx") - col("ip")).cast("double")
    gapfill(spark, sfDir)
      .withColumn("i", i)
      .withColumn("vp", last(col("v"), ignoreNulls = true).over(wb))
      .withColumn("ip", last(idxOrNull, ignoreNulls = true).over(wb))
      .withColumn("vn", first(col("v"), ignoreNulls = true).over(wf))
      .withColumn("inx", first(idxOrNull, ignoreNulls = true).over(wf))
      .select(col("event_type"), col("bucket"), col("v"),
        when(col("v").isNotNull, col("v"))
          .otherwise(Det.r4(col("vp") +
            (col("vn") - col("vp")) * frac)).as("v_interp"))
      .orderBy("event_type", "bucket")
  }

  /** Z-score anomaly flagging over the hourly rollup: per-series mean/σ
    * from exact decimal Σv, Σv² (the [[Det]] discipline), buckets beyond
    * 2σ flagged. The Graphite alerting-read analog. */
  def anomaly(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h1 = hourlyAvg(spark, sfDir)
    val w = Window.partitionBy(col("event_type"))
    val nd = count(lit(1)).over(w).cast("double")
    val s1 = sum(col("v").cast("decimal(18,8)")).over(w).cast("double")
    val s2 = sum((col("v") * col("v")).cast("decimal(18,8)")).over(w)
      .cast("double")
    val mean = s1 / nd
    val sd = sqrt((s2 - (s1 * s1) / nd) / (nd - lit(1.0)))
    h1.withColumn("z", Det.r4((col("v") - mean) / sd))
      .where(abs(col("z")) > 2.0)
      .select(col("event_type"), col("bucket"), col("v"), col("z"))
      .orderBy("event_type", "bucket")
  }

  /** Seasonality profile: mean value per (series, hour-of-day) — the
    * timeShift/seasonal baseline read. */
  def hourOfDay(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"), hour(col("ts")).cast("long").as("hod"))
      .agg(count(lit(1)).as("n"), Det.avg4(col("value")).as("v"))
      .orderBy("event_type", "hod")

  /** Graphite `integral`: cumulative sum per series over the hourly
    * rollup — exact DECIMAL accumulation inside the window frame. */
  def integral(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h1 = hourly(spark, sfDir)
      .agg(sum(col("value").cast("decimal(18,4)")).as("sv"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    h1.select(col("event_type"), col("bucket"),
        col("sv").cast("double").as("v"),
        sum(col("sv")).over(w).cast("double").as("cum"))
      .orderBy("event_type", "bucket")
  }

  /** Additive seasonal decomposition over the hourly rollup (STL-lite):
    * trend = trailing-24h moving average (exact DECIMAL window sum),
    * seasonal = per-(series, hour-of-day) mean of the 4dp-rounded
    * detrended values, residual = what remains. One rollup shuffle, one
    * window pass, one 24-row-per-series seasonal aggregate that joins
    * back by (series, hod) — at scale the seasonal table is tiny and
    * broadcasts. All accumulation is exact; every float op is the same
    * written IEEE sequence in both engines. */
  def seasonalDecompose(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h1 = hourlyAvg(spark, sfDir)
    val wSeq = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    val wf = wSeq.rowsBetween(-23, 0)
    val t = h1.withColumn("rn", row_number().over(wSeq))
      .withColumn("trend", Det.r4(
        sum(col("v").cast("decimal(18,4)")).over(wf).cast("double") /
          lit(24.0)))
      .where(col("rn") >= 24)
      .withColumn("hod", hour(col("bucket")).cast("long"))
      .withColumn("detr", Det.r4(col("v") - col("trend")))
    val seas = t.groupBy(col("event_type").as("e2"), col("hod").as("h2"))
      .agg(Det.r4(Det.dsum4(col("detr")) / count(lit(1))).as("seasonal"))
    t.join(broadcast(seas),
        col("event_type") === col("e2") && col("hod") === col("h2"))
      .select(col("event_type"), col("bucket"), col("v"), col("trend"),
        col("seasonal"), Det.r4(col("detr") - col("seasonal")).as("residual"))
      .orderBy("event_type", "bucket")
  }

  /** Graphite `integralByInterval(series, '1d')`: cumulative sum per
    * series that RESETS at each day boundary — the "usage so far today"
    * dashboard read. Same exact-DECIMAL frame accumulation as
    * [[integral]], with the day added to the window partition key (the
    * reset is free: it is just a finer partitioning, no extra shuffle
    * beyond the window's own). */
  def integralByInterval(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h1 = hourly(spark, sfDir)
      .agg(sum(col("value").cast("decimal(18,4)")).as("sv"))
    val w = Window
      .partitionBy(col("event_type"), date_trunc("day", col("bucket")))
      .orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    h1.select(col("event_type"), col("bucket"),
        col("sv").cast("double").as("v"),
        sum(col("sv")).over(w).cast("double").as("cum_day"))
      .orderBy("event_type", "bucket")
  }

  /** Graphite `nPercentile(series, 95)`: the per-series 95th-percentile
    * constant line. Percentile INDEX in exact integer arithmetic —
    * rank = ceil(0.95·n) = (19n+19) div 20 over the value-ordered hourly
    * series — so both engines select the same element (engine-native
    * percentile() interpolation differs; an indexed element never does).
    * Value-first ordering makes the selected VALUE unique even when
    * buckets tie on v. */
  /** Per-series VALUE HISTOGRAM over the hourly rollup — the heatmap
    * render primitive (Grafana histogram panels): fixed-width bins on
    * the EXACT scaled-integer value (`(v·10⁴) div (width·10⁴)` — all
    * integer arithmetic, so bin edges cannot drift between engines the
    * way float division at a boundary could). One aggregation; bin
    * bounds reported as exact integer-derived doubles. */
  def valueHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    val binW = 5L // value units per bin
    val bin = expr(s"CAST(CAST(v AS DECIMAL(18,4)) * 10000 AS BIGINT)" +
      s" div ${binW * 10000L}L")
    hourlyAvg(spark, sfDir)
      .groupBy(col("event_type"), bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        min(col("v")).as("v_min"), max(col("v")).as("v_max"))
      .withColumn("bin_lo", (col("bin") * lit(binW)).cast("double"))
      .orderBy("event_type", "bin")
  }

  /** Cross-series Pearson CORRELATION matrix over the hourly rollup —
    * "which metrics move together", the dashboard read behind
    * capacity-planning and root-cause grouping. Upper-triangle pairs
    * from a self-join on bucket (the rollup is #series × #buckets —
    * small at any corpus scale); all five moment sums accumulate as
    * exact DECIMAL(18,8) (products of 4-decimal values have ≤8
    * decimals), then [[graft.util.Det]]'s shared IEEE corr formula.
    * Same discipline as the relational q_agg_corr. */
  def seriesCorr(spark: SparkSession, sfDir: String): DataFrame = {
    val h1 = hourlyAvg(spark, sfDir)
    val a = h1.select(col("event_type").as("ma"), col("bucket"),
      col("v").as("va"))
    val b = h1.select(col("event_type").as("mb"), col("bucket"),
      col("v").as("vb"))
    def s(e: org.apache.spark.sql.Column) =
      sum(e.cast("decimal(18,8)")).cast("double")
    val nd = count(lit(1)).cast("double")
    val sx = s(col("va")); val sy = s(col("vb"))
    val sxy = s(col("va") * col("vb"))
    val sxx = s(col("va") * col("va")); val syy = s(col("vb") * col("vb"))
    a.join(b, "bucket").where(col("ma") < col("mb"))
      .groupBy(col("ma"), col("mb"))
      .agg(count(lit(1)).as("n"),
        Det.r4((nd * sxy - sx * sy) /
          (sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy)))
          .as("corr"))
      .orderBy("ma", "mb")
  }

  /** SPEARMAN RANK correlation matrix — [[seriesCorr]]'s robust
    * sibling: Pearson on RANKS, so one outlier hour (a deploy spike)
    * cannot fabricate or destroy a relationship the way it drags a
    * raw-value covariance. Oracle-exact despite ties: tied values take
    * the conventional AVERAGE rank, carried as the always-integer
    * 2·avg_rank = 2·min_rank + (tie_count − 1) (min rank and tie count
    * are two windows over the pair's value partition; the underlying
    * row_number breaks ties (v, bucket) identically in both engines),
    * all five moment sums then accumulate as exact DECIMAL(19,0)
    * products in DECIMAL(38,0) (the [[acf]] discipline: Σ ra2·rb2 ≤
    * 4·buckets³ overflows BIGINT past ~1.3e6 aligned buckets — a
    * 10-year minutely series is 5.3e6 — while 38 digits hold to
    * ~2.9e12 buckets, beyond any calendar) and ONE shared IEEE
    * correlation formula finishes. Windows partition on the pair key —
    * rank-statistic cost is per-pair series length (the calendar, not
    * the corpus), scale-free in the fact table. Spec'd bit-equal to a
    * driver-side BigInt reference below the old bound AND exact at a
    * synthetic series past it. */
  def spearmanCorr(spark: SparkSession, sfDir: String): DataFrame = {
    val h1 = hourlyAvg(spark, sfDir)
    val a = h1.select(col("event_type").as("ma"), col("bucket"),
      col("v").as("va"))
    val b = h1.select(col("event_type").as("mb"), col("bucket"),
      col("v").as("vb"))
    spearmanFromPairs(a.join(b, "bucket").where(col("ma") < col("mb")))
  }

  /** The rank + moment half of [[spearmanCorr]] over an aligned pair
    * relation (ma, mb, bucket, va, vb) — factored so the overflow spec
    * can drive it with a synthetic series longer than the old BIGINT
    * bound. */
  private[graft] def spearmanFromPairs(pairs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wA = Window.partitionBy(col("ma"), col("mb"))
      .orderBy(col("va"), col("bucket"))
    val wB = Window.partitionBy(col("ma"), col("mb"))
      .orderBy(col("vb"), col("bucket"))
    val tA = Window.partitionBy(col("ma"), col("mb"), col("va"))
    val tB = Window.partitionBy(col("ma"), col("mb"), col("vb"))
    val ranked = pairs
      .select(col("ma"), col("mb"), col("bucket"), col("va"), col("vb"),
        row_number().over(wA).as("rna"), row_number().over(wB).as("rnb"))
      .select(col("ma"), col("mb"),
        (lit(2L) * min(col("rna")).over(tA) +
          count(lit(1)).over(tA) - lit(1L)).as("ra2"),
        (lit(2L) * min(col("rnb")).over(tB) +
          count(lit(1)).over(tB) - lit(1L)).as("rb2"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    def dc(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
    val nd = count(lit(1)).cast("double")
    val sx = d(sum(dc(col("ra2")))); val sy = d(sum(dc(col("rb2"))))
    val sxy = d(sum(dc(col("ra2")) * dc(col("rb2"))))
    val sxx = d(sum(dc(col("ra2")) * dc(col("ra2"))))
    val syy = d(sum(dc(col("rb2")) * dc(col("rb2"))))
    ranked.groupBy(col("ma"), col("mb"))
      .agg(count(lit(1)).as("n"),
        Det.r4((nd * sxy - sx * sy) /
          (sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy)))
          .as("rho"))
      .orderBy("ma", "mb")
  }

  /** ROBUST STL-LITE DECOMPOSITION — trend / seasonal / residual for
    * every series, the capacity-planning and anomaly-baseline read
    * (Cleveland's STL by shape, with medians instead of loess so every
    * step stays a deterministic ELEMENT SELECTION): trend is the
    * 25-hour centered moving MEDIAN (odd full frames only — an exact
    * middle element, no interpolation dialect), the seasonal component
    * is the per-(series, hour-of-day) lower median of the detrended
    * values by exact integer rank with a (value, bucket) tiebreak, and
    * the residual closes the identity v = trend + seasonal + resid.
    * No rounding anywhere downstream of the rollup: both engines pick
    * identical elements, subtract identically. Windows partition on
    * the series key; the whole read is calendar-sized. Residuals feed
    * [[madOutliers]]-style alerting with the seasonality removed —
    * a spike at 3am stops hiding behind the daily cycle. */
  def stlDecompose(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h1 = hourlyAvg(spark, sfDir)
    val wSeq = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    val wAll = Window.partitionBy(col("event_type"))
    val wFrame = wSeq.rowsBetween(-12, 12)
    val t = h1
      .withColumn("rn", row_number().over(wSeq))
      .withColumn("cnt", count(lit(1)).over(wAll))
      .withColumn("trend", expr("percentile(v, 0.5D)").over(wFrame))
      .where(col("rn") >= 13 && col("rn") <= col("cnt") - 12)
      .withColumn("detr", col("v") - col("trend"))
      .withColumn("hod", hour(col("bucket")))
    val wHod = Window.partitionBy(col("event_type"), col("hod"))
    val wHodOrd = wHod.orderBy(col("detr"), col("bucket"))
    t.withColumn("rs", row_number().over(wHodOrd))
      .withColumn("ns", count(lit(1)).over(wHod))
      .withColumn("seasonal",
        max(when(col("rs") === expr("(ns + 1) div 2"), col("detr")))
          .over(wHod))
      .select(col("event_type"), col("bucket"), col("v"), col("trend"),
        col("seasonal"), (col("detr") - col("seasonal")).as("resid"))
      .orderBy("event_type", "bucket")
  }

  /** HODGES–LEHMANN LOCATION ESTIMATOR per series — the robust
    * "typical level" read (median of all Walsh averages (xᵢ+xⱼ)/2,
    * i ≤ j): 29% breakdown with far better efficiency than the plain
    * median. Values ride as 1e4-scaled ints so each doubled Walsh
    * average is an exact BIGINT sum; the median is an integer-rank
    * selection under the (w, bucket, bucket₂) total order — no float
    * compares anywhere until the single final /20000 display divide.
    * The pair join is per-series O(n²) at rollup grain (≤720 h) —
    * honest calibration cost, the kendall family's documented bound. */
  def hodgesLehmann(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h1 = hourlyAvg(spark, sfDir)
      .select(col("event_type"), col("bucket"),
        expr("CAST(floor(v * 10000.0D + 0.5) AS BIGINT)").as("q"))
      .localCheckpoint(eager = false) // both sides of the pair join
    val b = h1.select(col("event_type"), col("bucket").as("bucket2"),
      col("q").as("q2"))
    val pairs = h1.join(b, Seq("event_type"))
      .where(col("bucket") <= col("bucket2"))
      .select(col("event_type"), col("bucket"), col("bucket2"),
        (col("q") + col("q2")).as("w"))
    val wRank = Window.partitionBy(col("event_type"))
      .orderBy(col("w"), col("bucket"), col("bucket2"))
    // same (partition, order) spec as wRank — one fused WindowExec over
    // the O(n²) Walsh-pair relation instead of two passes (r17); the
    // full-partition count is order-independent, so np is unchanged
    val wAll = Window.partitionBy(col("event_type"))
      .orderBy(col("w"), col("bucket"), col("bucket2"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    pairs
      .withColumn("rn", row_number().over(wRank))
      .withColumn("np", count(lit(1)).over(wAll))
      .where(col("rn") === expr("(np + 1) div 2"))
      .select(col("event_type"), col("np").as("n_pairs"),
        (col("w").cast("double") / lit(20000.0)).as("hl"))
      .orderBy("event_type")
  }

  /** SEASONAL / TREND STRENGTH (Wang–Hyndman feature pair over
    * [[stlDecompose]]): F_seasonal = max(0, 1 − Var(resid)/Var(detr))
    * and F_trend = max(0, 1 − Var(resid)/Var(v − seasonal)) — the
    * dashboard's "is this series worth seasonal modeling" triage.
    * Component values quantize at their own 1e-4 display precision
    * (floor(x·10⁴+0.5) — floor has no rounding-mode dialect), every
    * moment then accumulates as exact BIGINTs (n ≤ calendar hours, so
    * n·Σq² stays far inside 2⁶³), and each variance ratio is ONE IEEE
    * divide of BIGINT-cast factors (long→double rounds to nearest in
    * both engines — the decimal→double one-shot cast is the dialect
    * trap, not this). */
  def seasonalStrength(spark: SparkSession, sfDir: String): DataFrame = {
    def q(c: org.apache.spark.sql.Column) =
      floor(c * lit(10000.0) + lit(0.5)).cast("long")
    val comp = stlDecompose(spark, sfDir)
      .select(col("event_type"),
        q(col("resid")).as("qr"),
        q(col("v") - col("trend")).as("qd"),
        q(col("v") - col("seasonal")).as("qt"))
    def varNum(p: String) =
      (count(lit(1)) * sum(col(p) * col(p)) - sum(col(p)) * sum(col(p)))
    comp.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        varNum("qr").as("vr"), varNum("qd").as("vd"),
        varNum("qt").as("vt"))
      .select(col("event_type"), col("n"),
        Det.r4(greatest(lit(0.0), lit(1.0) -
          when(col("vd") > 0L, col("vr").cast("double") /
            col("vd").cast("double")).otherwise(lit(1.0))))
          .as("f_seasonal"),
        Det.r4(greatest(lit(0.0), lit(1.0) -
          when(col("vt") > 0L, col("vr").cast("double") /
            col("vt").cast("double")).otherwise(lit(1.0))))
          .as("f_trend"))
      .orderBy("event_type")
  }

  /** DESEASONALIZED ANOMALY SCORING — [[madOutliers]] applied to
    * [[stlDecompose]]'s residual instead of the raw series: with trend
    * and the daily cycle removed, a 3am spike scores against the
    * series' residual noise floor, not against the daily swing that
    * used to hide it. Both medians (residual center, MAD) are exact
    * integer-rank selections with (value, bucket) tiebreaks; the score
    * is the same IEEE |r−med|/(mad·1.4826) text as the raw-series
    * read. One extra window pass over the calendar-sized STL output. */
  def stlAnomaly(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = stlDecompose(spark, sfDir)
      .select(col("event_type"), col("bucket"), col("v"), col("resid"))
    val wAll = Window.partitionBy(col("event_type"))
    val wOrd = wAll.orderBy(col("resid"), col("bucket"))
    val withMed = base
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("med",
        max(when(col("rn") === expr("(n + 1) div 2"), col("resid")))
          .over(wAll))
      .withColumn("dev", abs(col("resid") - col("med")))
    val wDev = wAll.orderBy(col("dev"), col("bucket"))
    withMed
      .withColumn("rn2", row_number().over(wDev))
      .withColumn("mad",
        max(when(col("rn2") === expr("(n + 1) div 2"), col("dev")))
          .over(wAll))
      .select(col("event_type"), col("bucket"), col("v"), col("resid"),
        Det.r4(col("dev") / (col("mad") * lit(1.4826))).as("score"))
      .where(col("score") > lit(3.0))
      .orderBy("event_type", "bucket")
  }

  /** LAGGED CROSS-CORRELATION — "which metric LEADS which": Pearson
    * between series A at hour t and series B at hour t+k, for every
    * lag k in ±3 h. The incident-analysis read behind "errors follow
    * deploys by two hours"; the argmax-over-lag row is the lead time.
    * Same exact-DECIMAL moment accumulation + shared IEEE formula as
    * [[seriesCorr]]; alignment joins on integer epoch-seconds plus
    * k·3600 (identical arithmetic both engines — no interval dialect),
    * with the 7-row lag grid broadcast. Boundary hours shrink n per
    * lag; n is reported so the reader can weigh the tails. Cost is the
    * rollup self-join × 7 — calendar-sized, corpus-free. */
  def crossCorrLagged(spark: SparkSession, sfDir: String): DataFrame = {
    val h1 = hourlyAvg(spark, sfDir)
      .select(col("event_type"),
        expr("unix_micros(bucket) div 1000000").as("bs"), col("v"))
      .localCheckpoint(eager = false) // both sides of the lag join
    val lags = spark.range(-3, 4).select(col("id").as("lag"))
    val a = h1.select(col("event_type").as("ma"), col("bs"),
      col("v").as("va"))
    val b = h1.select(col("event_type").as("mb"), col("bs").as("bs2"),
      col("v").as("vb"))
    def s(e: org.apache.spark.sql.Column) =
      sum(e.cast("decimal(18,8)")).cast("double")
    val nd = count(lit(1)).cast("double")
    val sx = s(col("va")); val sy = s(col("vb"))
    val sxy = s(col("va") * col("vb"))
    val sxx = s(col("va") * col("va")); val syy = s(col("vb") * col("vb"))
    a.crossJoin(broadcast(lags))
      .join(b, col("ma") < col("mb") &&
        col("bs") + col("lag") * lit(3600L) === col("bs2"))
      .groupBy(col("ma"), col("mb"), col("lag"))
      .agg(count(lit(1)).as("n"),
        Det.r4((nd * sxy - sx * sy) /
          (sqrt(nd * sxx - sx * sx) * sqrt(nd * syy - sy * sy)))
          .as("xcorr"))
      .orderBy("ma", "mb", "lag")
  }

  /** WILCOXON SIGNED-RANK test on the PAIRED hourly series click vs
    * view — "did the same hours move together or apart": nonzero
    * per-bucket differences rank by |d| (ties as the integer
    * 2·average-rank, computed at distinct-|d| grain with a running
    * total — the [[graft.rel.RelationalOps.aggMannWhitney]]
    * discipline), W⁺ sums the positive diffs' ranks, and the normal z
    * is one shared IEEE formula over exact BIGINTs (2W⁺ and
    * n(n+1)/2 stay integers; σ² = n(n+1)(2n+1)/24). The whole
    * computation is calendar-bounded: ≤ one row per hour bucket before
    * ranking, so the ordered window runs on ≤720 rows at ANY corpus
    * size. */
  def wilcoxonSignedRank(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h1 = hourlyAvg(spark, sfDir)
    val a = h1.where(col("event_type") === "click")
      .select(col("bucket"), col("v").as("va"))
    val b = h1.where(col("event_type") === "view")
      .select(col("bucket"), col("v").as("vb"))
    val diffs = a.join(b, "bucket")
      .select((col("va") - col("vb")).as("dv"))
      .where(col("dv") =!= lit(0.0))
    val byAbs = diffs.groupBy(abs(col("dv")).as("ad"))
      .agg(sum(when(col("dv") > 0, 1L).otherwise(0L)).as("cp"),
        sum(when(col("dv") < 0, 1L).otherwise(0L)).as("cn"))
    val wCum = Window.orderBy(col("ad"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = byAbs
      .withColumn("cum", coalesce(sum(col("cp") + col("cn")).over(wCum),
        lit(0L)))
      .withColumn("r2",
        lit(2L) * (col("cum") + lit(1L)) + col("cp") + col("cn") - lit(1L))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    ranked.agg((sum(col("cp")) + sum(col("cn"))).as("n_pairs"),
        sum(col("cp") * col("r2")).as("w_plus_x2"))
      .select(col("n_pairs"), col("w_plus_x2"),
        Det.r4(d(col("w_plus_x2") -
            expr("n_pairs * (n_pairs + 1L) div 2L")) /
          sqrt(d(col("n_pairs")) * d(col("n_pairs") + lit(1L)) *
            d(lit(2L) * col("n_pairs") + lit(1L)) / lit(6.0))).as("z"))
  }

  /** KENDALL τ-b rank correlation — the third agreement read beside
    * [[seriesCorr]] (linear co-movement) and [[spearmanCorr]] (monotone
    * co-movement): the probability-scaled excess of CONCORDANT hour
    * pairs over discordant ones, with the τ-b tie normalization.
    * Everything before the final formula is INTEGER pair counting —
    * concordant/discordant/tied flags over all C(n,2) aligned bucket
    * pairs — so the oracle twin is exact by construction (no rank
    * arithmetic at all, just counts + one shared IEEE sqrt formula).
    * Cost is O(pairs × buckets²): quadratic in SERIES LENGTH (the
    * calendar — 720 hourly buckets regardless of corpus size), linear
    * in nothing else; the join key is the series pair, so the
    * bucket-pair explosion shuffles once and never touches the fact
    * table. */
  /** Shared concordance counts per series pair — the aggregation both
    * [[kendallTau]] and [[somersD]] project from. */
  private def kendallCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val h1 = hourlyAvg(spark, sfDir)
    val a = h1.select(col("event_type").as("ma"), col("bucket"),
      col("v").as("va"))
    val b = h1.select(col("event_type").as("mb"), col("bucket"),
      col("v").as("vb"))
    val p = a.join(b, "bucket").where(col("ma") < col("mb"))
      .localCheckpoint(eager = false) // self-joined below; build once
    val q = p.select(col("ma"), col("mb"), col("bucket").as("bucket2"),
      col("va").as("va2"), col("vb").as("vb2"))
    val joined = p.join(q, Seq("ma", "mb"))
      .where(col("bucket") < col("bucket2"))
    joined.groupBy(col("ma"), col("mb"))
      .agg(count(lit(1)).as("n0"),
        sum(when((col("va") - col("va2")) * (col("vb") - col("vb2")) >
          lit(0.0), 1L).otherwise(0L)).as("nc"),
        sum(when((col("va") - col("va2")) * (col("vb") - col("vb2")) <
          lit(0.0), 1L).otherwise(0L)).as("nd"),
        sum(when(col("va") === col("va2"), 1L).otherwise(0L)).as("tx"),
        sum(when(col("vb") === col("vb2"), 1L).otherwise(0L)).as("ty"))
  }

  def kendallTau(spark: SparkSession, sfDir: String): DataFrame = {
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    kendallCounts(spark, sfDir)
      .select(col("ma"), col("mb"), col("n0"), col("nc"), col("nd"),
        Det.r4(d(col("nc") - col("nd")) /
          sqrt(d(col("n0") - col("tx")) * d(col("n0") - col("ty"))))
          .as("tau"))
      .orderBy("ma", "mb")
  }

  /** SOMERS' D (asymmetric ordinal association) from the SAME
    * concordance counts as [[kendallTau]]: D_y|x = (nc − nd)/(n0 − tx)
    * treats the FIRST series as independent (pairs tied on x are
    * excluded from the denominator) — the directional effect size
    * ordinal dashboards quote next to the symmetric tau. Pure
    * projection over the shared exact counts; one IEEE divide. */
  def somersD(spark: SparkSession, sfDir: String): DataFrame = {
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    kendallCounts(spark, sfDir)
      .select(col("ma"), col("mb"), col("n0"), col("nc"), col("nd"),
        col("tx"), col("ty"),
        Det.r4(d(col("nc") - col("nd")) / d(col("n0") - col("tx")))
          .as("d_yx"),
        Det.r4(d(col("nc") - col("nd")) / d(col("n0") - col("ty")))
          .as("d_xy"))
      .orderBy("ma", "mb")
  }

  /** MANN–KENDALL TREND TEST (Mann 1945, Kendall 1975) per series —
    * the standard nonparametric "is this metric trending" monitor:
    * S = Σ_{i<j} sign(vⱼ − vᵢ) over the hourly rollup, variance with
    * the tie correction 18·Var(S) = n(n−1)(2n+5) − Σₜ t(t−1)(2t+5),
    * z continuity-corrected. S and the ×18 variance stay exact
    * BIGINTs (bounded ~2n³ — widen to DECIMAL(38,0) past ~10⁶ buckets
    * per series); z is then one IEEE (s∓1)/√(var18/18) in identical
    * text. The pair join is bucket<bucket2 WITHIN a series — honest
    * O(buckets²) at rollup grain (≤720 hours), the kendallTau twin
    * ([[kendallTauFast]]'s inversion count is the production path for
    * long series). */
  def mannKendall(spark: SparkSession, sfDir: String): DataFrame = {
    val h1 = hourlyAvg(spark, sfDir)
      .localCheckpoint(eager = false) // pair join + tie grouping reuse it
    val b = h1.select(col("event_type"), col("bucket").as("bucket2"),
      col("v").as("v2"))
    val pairs = h1.join(b, Seq("event_type"))
      .where(col("bucket") < col("bucket2"))
      .groupBy(col("event_type"))
      .agg(sum(when(col("v2") > col("v"), 1L).otherwise(0L)).as("np"),
        sum(when(col("v2") < col("v"), 1L).otherwise(0L)).as("nm"))
    val n1 = h1.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val t1 = h1.groupBy(col("event_type"), col("v"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("event_type"))
      .agg(sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5))
        .as("tcorr"))
    pairs.join(n1, "event_type").join(t1, "event_type")
      .select(col("event_type"), col("n"),
        (col("np") - col("nm")).as("s_stat"),
        (col("n") * (col("n") - 1) * (col("n") * 2 + 5) - col("tcorr"))
          .as("var18"))
      .select(col("event_type"), col("n"), col("s_stat"), col("var18"),
        Det.r4(when(col("s_stat") > 0,
          (col("s_stat").cast("double") - lit(1.0)) /
            sqrt(col("var18").cast("double") / lit(18.0)))
          .when(col("s_stat") < 0,
            (col("s_stat").cast("double") + lit(1.0)) /
              sqrt(col("var18").cast("double") / lit(18.0)))
          .otherwise(lit(0.0))).as("z"))
      .orderBy("event_type")
  }

  /** SEASONAL MANN–KENDALL (Hirsch–Slack 1984) per series — the
    * seasonality-robust trend monitor: the plain [[mannKendall]]
    * confounds a diurnal cycle with trend, so pairs are compared only
    * WITHIN the same hour-of-day season and the exact per-season S
    * and 18·Var sums ADD across seasons (independence assumption of
    * the published test). Mechanically it is [[mannKendall]] with
    * `hod` added to every key: the pair join is O(Σ seasons
    * (buckets/24)²) — 24× cheaper than the unstratified join — and S,
    * var18 stay exact BIGINTs; z is the identical continuity-
    * corrected IEEE text over the summed integers. */
  def seasonalMannKendall(spark: SparkSession, sfDir: String)
      : DataFrame = {
    val h1 = hourlyAvg(spark, sfDir)
      .withColumn("hod", hour(col("bucket")))
      .localCheckpoint(eager = false) // pair join + n + tie grouping
    val b = h1.select(col("event_type"), col("hod"),
      col("bucket").as("bucket2"), col("v").as("v2"))
    val pairs = h1.join(b, Seq("event_type", "hod"))
      .where(col("bucket") < col("bucket2"))
      .groupBy(col("event_type"))
      .agg(sum(when(col("v2") > col("v"), 1L).otherwise(0L)).as("np"),
        sum(when(col("v2") < col("v"), 1L).otherwise(0L)).as("nm"))
    val nG = h1.groupBy(col("event_type"), col("hod"))
      .agg(count(lit(1)).as("n_g"))
    val tG = h1.groupBy(col("event_type"), col("hod"), col("v"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("event_type"), col("hod"))
      .agg(sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5))
        .as("tcorr_g"))
    val varS = nG.join(tG, Seq("event_type", "hod"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_seasons"), sum(col("n_g")).as("n"),
        sum(col("n_g") * (col("n_g") - 1) * (col("n_g") * 2 + 5) -
          col("tcorr_g")).as("var18"))
    pairs.join(varS, "event_type")
      .select(col("event_type"), col("n_seasons"), col("n"),
        (col("np") - col("nm")).as("s_stat"), col("var18"))
      .select(col("event_type"), col("n_seasons"), col("n"),
        col("s_stat"), col("var18"),
        Det.r4(when(col("s_stat") > 0,
          (col("s_stat").cast("double") - lit(1.0)) /
            sqrt(col("var18").cast("double") / lit(18.0)))
          .when(col("s_stat") < 0,
            (col("s_stat").cast("double") + lit(1.0)) /
              sqrt(col("var18").cast("double") / lit(18.0)))
          .otherwise(lit(0.0))).as("z"))
      .orderBy("event_type")
  }

  /** SEASONAL KENDALL τ BETWEEN SOURCES (Hirsch–Slack stratification
    * of [[graft.llm.TextOps.kendallSources]]'s two-sample τ-b): for
    * every event-type pair, "is type b's value stochastically larger
    * than type a's, CONTROLLING for the diurnal cycle" — the plain
    * between-sources comparison confounds a type that merely fires at
    * high-value hours with one that is genuinely larger. Pairs are
    * compared only WITHIN the same hour-of-day stratum: per (pair,
    * hod) the exact grid counting yields nc/nd/tie terms (all
    * DECIMAL(38,0), never a row-level pair join), the S statistics
    * ADD exactly across strata (S = Σₕ (ncₕ − ndₕ)), and the pooled
    * denominator Σₕ √(n1ₕ·n2ₕ·nyt2ₕ/2) is made order-free by
    * quantizing each stratum's IEEE sqrt with ×4096 (a POWER OF TWO —
    * exponent shift only, so no mantissa loss and no rounding-dialect
    * hazard) and BIGINT-summing; τ_sk is then one IEEE division.
    * Strata where either type is absent drop symmetrically in both
    * engines (the n1g/n2g presence filter). Grid cost: 24 × value-grain
    * × types. Total order (s1, s2). */
  def seasonalKendallSources(spark: SparkSession, sfDir: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byV = graft.io.Tables.events(spark, sfDir)
      .groupBy(hour(col("ts")).as("hod"), col("event_type").as("source"),
        col("value").as("x"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = false) // grid fan-out + per-source ties
    def dec(e: org.apache.spark.sql.Column) = e.cast("decimal(38,0)")
    def d(e: org.apache.spark.sql.Column) = e.cast("double")
    val grid = byV.select(col("hod"), col("x")).distinct()
      .crossJoin(broadcast(byV.select(col("source")).distinct()))
      .join(byV, Seq("hod", "source", "x"), "left")
      .na.fill(0L, Seq("c"))
    val wCum = Window.partitionBy(col("hod"), col("source"))
      .orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // same (partition, order) spec as wCum — one fused WindowExec (r17)
    val wG = Window.partitionBy(col("hod"), col("source")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cums = grid
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n_g", sum(col("c")).over(wG))
      .localCheckpoint(eager = false) // both sides of the pair join
    val a = cums.select(col("hod"), col("x"), col("source").as("s1"),
      col("c").as("c1"), col("n_g").as("n1g"))
    val b = cums.select(col("hod"), col("x"), col("source").as("s2"),
      col("c").as("c2"), (col("cum") - col("c")).as("below2"),
      col("cum").as("upto2"), col("n_g").as("n2g"))
    // per-(stratum, source) self-tie terms INLINE (r17): the grid is
    // complete over x within every hod, so Σ_x c·(c−1) inside the pair
    // group IS the per-source stratum constant — no separate per-source
    // aggregate and no per-stratum joins to attach it. The former pers
    // INNER JOINS also implemented the symmetric stratum drop (a
    // stratum where either type is absent has no pers row); the
    // explicit n1g/n2g presence filter below is that exact rule (same
    // device as the spearman sibling).
    val pairH = a.join(b, Seq("hod", "x")).where(col("s1") < col("s2"))
      .groupBy(col("s1"), col("s2"), col("hod"), col("n1g"), col("n2g"))
      .agg(sum(dec(col("c1")) * (col("n2g") - col("upto2"))).as("nc"),
        sum(dec(col("c1")) * col("below2")).as("nd"),
        sum(dec(col("c1")) * col("c2")).as("crossT"),
        sum(dec(col("c1")) * (col("c1") - 1)).as("ty1"),
        sum(dec(col("c2")) * (col("c2") - 1)).as("ty2"))
      .where(col("n1g") > 0 && col("n2g") > 0)
    val n02 = dec(col("n1g") + col("n2g")) * (col("n1g") + col("n2g") - 1)
    val nyt2 = n02 - (col("ty1") + col("ty2") + col("crossT") * 2)
    val strat = pairH
      .select(col("s1"), col("s2"), col("n1g"), col("n2g"),
        (col("nc") - col("nd")).as("sh"),
        floor(sqrt(d(col("n1g")) * d(col("n2g")) * (d(nyt2) / lit(2.0))) *
          lit(4096.0)).cast("long").as("dq"))
    strat.groupBy(col("s1"), col("s2"))
      .agg(sum(col("n1g")).as("n1"), sum(col("n2g")).as("n2"),
        count(lit(1)).as("n_strata"),
        sum(col("sh")).cast("long").as("s_total"),
        sum(col("dq")).as("dqs"))
      .select(col("s1"), col("s2"), col("n1"), col("n2"),
        col("n_strata"), col("s_total"),
        when(col("dqs") > 0L,
          Det.r4(d(col("s_total")) / (d(col("dqs")) / lit(4096.0))))
          .otherwise(lit(null)).as("tau_sk"))
      .orderBy("s1", "s2")
  }

  /** SEASONAL SPEARMAN ρ BETWEEN SOURCES — the midrank sibling of
    * [[seasonalKendallSources]], composing [[graft.llm.TextOps
    * .spearmanSources]]'s closed form with the Hirsch–Slack stratum
    * discipline: per (event-type pair, hour-of-day) the exact doubled-
    * midrank components D2ₕ, Aₕ = D2ₕ − n₂ₕ(Nₕ+1) and the tie term
    * Bₕ = Nₕ³ − Nₕ − Σ(t³−t) come off the within-stratum value grid;
    * the numerators Nₕ·Aₕ ADD exactly (DECIMAL(38,0)) and the
    * denominators √(n1ₕ·n2ₕ·Nₕ·(Bₕ/3)) quantize with ×4096 (power of
    * two — exponent-shift exact) and BIGINT-sum, so
    * ρ_sk = ΣNₕAₕ / (Σq/4096) is ONE IEEE division. Strata where
    * either type is absent drop symmetrically in both engines (the
    * n1g>0 AND n2g>0 filter — same rule as the Kendall sibling's pers
    * inner joins), so n_strata/n1/n2 count only co-present strata.
    * Reads "is type b stochastically larger than type a, diurnal cycle
    * controlled" through midranks instead of pair counts — more weight
    * to the middle of the distribution where τ weights all pairs
    * equally. */
  def seasonalSpearmanSources(spark: SparkSession, sfDir: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byV = graft.io.Tables.events(spark, sfDir)
      .groupBy(hour(col("ts")).as("hod"), col("event_type").as("source"),
        col("value").as("x"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = false) // grid fan-out below
    def dec(e: org.apache.spark.sql.Column) = e.cast("decimal(38,0)")
    def d(e: org.apache.spark.sql.Column) = e.cast("double")
    val grid = byV.select(col("hod"), col("x")).distinct()
      .crossJoin(broadcast(byV.select(col("source")).distinct()))
      .join(byV, Seq("hod", "source", "x"), "left")
      .na.fill(0L, Seq("c"))
    val wCum = Window.partitionBy(col("hod"), col("source"))
      .orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // same (partition, order) spec as wCum — one fused WindowExec (r17)
    val wG = Window.partitionBy(col("hod"), col("source")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cums = grid
      .withColumn("below", sum(col("c")).over(wCum) - col("c"))
      .withColumn("n_g", sum(col("c")).over(wG))
      .localCheckpoint(eager = false) // both sides of the pair join
    val a = cums.select(col("hod"), col("x"), col("source").as("s1"),
      col("c").as("c1"), col("below").as("below1"), col("n_g").as("n1g"))
    val b = cums.select(col("hod"), col("x"), col("source").as("s2"),
      col("c").as("c2"), col("below").as("below2"), col("n_g").as("n2g"))
    val t = col("c1") + col("c2")
    val pairH = a.join(b, Seq("hod", "x")).where(col("s1") < col("s2"))
      .groupBy(col("s1"), col("s2"), col("hod"), col("n1g"), col("n2g"))
      .agg(sum(dec(col("c2")) *
          ((col("below1") + col("below2")) * 2 + t + 1)).as("d2"),
        sum(dec(t) * t * t - t).as("tsum"))
      // strata where either type is absent drop SYMMETRICALLY, matching
      // the Kendall sibling's pers-inner-join semantics: without this,
      // n_strata counts empty strata and n1/n2 include counts from
      // strata where the other source is absent (rho_sk itself is
      // unaffected — n1g*n2g zeroes both numh's A-term weight path and
      // dq — but the reported counts diverge from the documented rule)
      .where(col("n1g") > 0 && col("n2g") > 0)
    val nn = col("n1g") + col("n2g")
    val aTerm = col("d2") - dec(col("n2g")) * (nn + 1)
    val bTerm = dec(nn) * nn * nn - nn - col("tsum")
    val strat = pairH.select(col("s1"), col("s2"), col("n1g"),
      col("n2g"), (dec(nn) * aTerm).as("numh"),
      when(bTerm > lit(0),
        floor(sqrt(d(col("n1g")) * d(col("n2g")) * d(nn) *
          (d(bTerm) / lit(3.0))) * lit(4096.0)).cast("long"))
        .otherwise(lit(0L)).as("dq"))
    strat.groupBy(col("s1"), col("s2"))
      .agg(sum(col("n1g")).as("n1"), sum(col("n2g")).as("n2"),
        count(lit(1)).as("n_strata"),
        sum(col("numh")).as("snum"), sum(col("dq")).as("dqs"))
      .select(col("s1"), col("s2"), col("n1"), col("n2"),
        col("n_strata"),
        when(col("dqs") > 0L,
          Det.r4(d(col("snum")) / (d(col("dqs")) / lit(4096.0))))
          .otherwise(lit(null)).as("rho_sk"))
      .orderBy("s1", "s2")
  }

  /** Strict inversions in `a` (pairs i<j with a(i) > a(j)) by counting
    * mergesort — O(n log n), mutates its input. */
  private[graft] def countInversions(a: Array[Double]): Long = {
    val buf = new Array[Double](a.length)
    def go(lo: Int, hi: Int): Long =
      if (hi - lo <= 1) 0L
      else {
        val mid = (lo + hi) >>> 1
        var inv = go(lo, mid) + go(mid, hi)
        var i = lo; var j = mid; var k = lo
        while (i < mid && j < hi) {
          if (a(i) <= a(j)) { buf(k) = a(i); i += 1 }
          else { buf(k) = a(j); inv += (mid - i); j += 1 }
          k += 1
        }
        while (i < mid) { buf(k) = a(i); i += 1; k += 1 }
        while (j < hi) { buf(k) = a(j); j += 1; k += 1 }
        System.arraycopy(buf, lo, a, lo, hi - lo)
        inv
      }
    go(0, a.length)
  }

  /** The PRODUCTION Kendall — [[kendallTau]]'s O(buckets²) pair join is
    * honest at rollup grain (720 hours) but not at a 10-year minutely
    * series; this twin is Knight's 1966 O(n log n) form: per pair, sort
    * the aligned points by (x, y) and count strict y-inversions with a
    * counting mergesort (= exactly the discordant pairs — x-tied runs
    * are y-sorted and contribute none), recover concordant from the
    * identity nc = n0 − nd − tx − ty + txy (both-tied pairs sit in tx
    * AND ty), then the SAME IEEE τ-b text. One typed mapGroups per
    * series pair — each group is one series' calendar, the multiset a
    * real per-key statistic holds in an executor. Unlike the spearman
    * moment sums (whose BIGINT bound needed the decimal widening),
    * Kendall's accumulators are PAIR COUNTS: n0 = n(n−1)/2 stays
    * inside a Long to n ≈ 4.3e9 buckets — three orders past a 10-year
    * minutely calendar, so no widening is needed on this axis. Spec'd
    * row-identical to the oracle query, τ bit-equal. */
  def kendallTauFast(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val h1 = hourlyAvg(spark, sfDir)
    val a = h1.select(col("event_type").as("ma"), col("bucket"),
      col("v").as("va"))
    val b = h1.select(col("event_type").as("mb"), col("bucket"),
      col("v").as("vb"))
    a.join(b, "bucket").where(col("ma") < col("mb"))
      .select(col("ma"), col("mb"), col("va"), col("vb"))
      .as[(String, String, Double, Double)]
      .groupByKey(r => (r._1, r._2))
      .mapGroups { (key: (String, String),
          it: Iterator[(String, String, Double, Double)]) =>
        val (ma, mb) = key
        val xs = it.map(r => (r._3, r._4)).toArray
        val n = xs.length.toLong
        val n0 = n * (n - 1) / 2
        def tiePairs[K](ks: Array[K]): Long =
          ks.groupBy(identity).valuesIterator
            .map { g => val c = g.length.toLong; c * (c - 1) / 2 }.sum
        val tx = tiePairs(xs.map(_._1))
        val ty = tiePairs(xs.map(_._2))
        val txy = tiePairs(xs)
        val sorted = xs.sortBy(t => (t._1, t._2))
        val nd = countInversions(sorted.map(_._2))
        val nc = n0 - nd - tx - ty + txy
        val tau = math.floor((nc - nd).toDouble /
          math.sqrt((n0 - tx).toDouble * (n0 - ty).toDouble)
          * 10000.0 + 0.5) / 10000.0
        (ma, mb, n0, nc, nd, tau)
      }
      .toDF("ma", "mb", "n0", "nc", "nd", "tau")
      .orderBy("ma", "mb")
  }

  /** Robust outlier detection by MEDIAN ABSOLUTE DEVIATION — the
    * spiky-series alternative to [[anomaly]]'s z-score (one spike
    * inflates a stddev and masks later spikes; it barely moves the
    * MAD). Both medians are exact integer-rank selections (lower
    * median, rank (n+1) div 2, deterministic (value, bucket)
    * tiebreak — the [[nPercentile]] discipline), so both engines pick
    * the identical elements and score with the same IEEE ops (abs,
    * multiply, divide — no libm). 1.4826 is the Gaussian consistency
    * constant; points beyond 3 scaled MADs flag. One shuffle on
    * event_type serves all four window passes. */
  def madOutliers(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h1 = hourlyAvg(spark, sfDir)
    val wOrd = Window.partitionBy(col("event_type"))
      .orderBy(col("v"), col("bucket"))
    val wAll = Window.partitionBy(col("event_type"))
    val medRank = expr("(n + 1) div 2")
    val withMed = h1.select(col("event_type"), col("bucket"), col("v"),
        row_number().over(wOrd).as("rn"),
        count(lit(1)).over(wAll).as("n"))
      .withColumn("med",
        max(when(col("rn") === medRank, col("v"))).over(wAll))
      .withColumn("dev", abs(col("v") - col("med")))
    val wDev = Window.partitionBy(col("event_type"))
      .orderBy(col("dev"), col("bucket"))
    withMed
      .withColumn("rn2", row_number().over(wDev))
      .withColumn("mad",
        max(when(col("rn2") === medRank, col("dev"))).over(wAll))
      .where(col("mad") > 0.0 &&
        col("dev") > col("mad") * lit(1.4826) * lit(3.0))
      .select(col("event_type"), col("bucket"), col("v"), col("med"),
        col("mad"),
        Det.r4(col("dev") / (col("mad") * lit(1.4826))).as("score"))
      .orderBy("event_type", "bucket")
  }

  def nPercentile(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h1 = hourlyAvg(spark, sfDir)
    val wOrd = Window.partitionBy(col("event_type"))
      .orderBy(col("v"), col("bucket"))
    val wAll = Window.partitionBy(col("event_type"))
    h1.select(col("event_type"), col("v"),
        row_number().over(wOrd).as("rn"),
        count(lit(1)).over(wAll).as("n"))
      .where(col("rn") === expr("(19 * n + 19) div 20"))
      .select(col("event_type"), col("v").as("p95"))
      .orderBy("event_type")
  }

  /** Graphite `removeAbovePercentile(series, 95)`: per-series values
    * ABOVE the series' 95th percentile become null (graphite-web nulls
    * the point, it does not drop the bucket). The percentile is the
    * same exact integer-rank element as [[nPercentile]] — rank
    * (19n+19) div 20 in value order — surfaced as a window max over the
    * one matching rank, so both engines null exactly the same buckets
    * (comparisons run on already-rounded doubles). Two windows, one
    * shuffle on event_type. */
  def removeAbovePercentile(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h1 = hourlyAvg(spark, sfDir)
    val wOrd = Window.partitionBy(col("event_type"))
      .orderBy(col("v"), col("bucket"))
    val wAll = Window.partitionBy(col("event_type"))
    h1.select(col("event_type"), col("bucket"), col("v"),
        row_number().over(wOrd).as("rn"),
        count(lit(1)).over(wAll).as("n"))
      .withColumn("p95",
        max(when(col("rn") === expr("(19 * n + 19) div 20"), col("v")))
          .over(wAll))
      .select(col("event_type"), col("bucket"),
        when(col("v") > col("p95"), lit(null)).otherwise(col("v")).as("v"))
      .orderBy("event_type", "bucket")
  }

  /** Graphite `removeBelowValue(series, 20)`: rollup values below the
    * threshold become null (the bucket stays — graphite-web semantics,
    * `render/functions.py — removeBelowValue` [U]). Pure map-side
    * projection over the hourly rollup. */
  def removeBelowValue(spark: SparkSession, sfDir: String): DataFrame =
    hourlyAvg(spark, sfDir)
      .select(col("event_type"), col("bucket"),
        when(col("v") < 20.0, lit(null)).otherwise(col("v")).as("v"))
      .orderBy("event_type", "bucket")

  /** The seriesList COMBINATOR family (`sumSeries` / `countSeries` /
    * `rangeOfSeries`, `render/functions.py` [U]) in one fan-in read:
    * per bucket across every series of the hourly rollup — total, how
    * many series reported, and max-min spread. One window-free
    * aggregation over the tiny rollup (5 series per bucket); the rollup
    * itself is the only raw-data shuffle. */
  def sumSeries(spark: SparkSession, sfDir: String): DataFrame =
    hourlyAvg(spark, sfDir)
      .groupBy(col("bucket"))
      .agg(Det.sum4(col("v")).as("sum_v"),
        count(lit(1)).as("n_series"),
        Det.r4(max(col("v")) - min(col("v"))).as("rng"))
      .orderBy("bucket")

  /** Graphite `transformNull(series, 0)`: the dense gap-filled fetch
    * with gaps replaced by a CONSTANT (vs [[locf]]'s carry-forward) —
    * the "treat missing as zero" dashboard read. Pure projection over
    * the gapfill grid. */
  def transformNull(spark: SparkSession, sfDir: String): DataFrame =
    gapfill(spark, sfDir)
      .select(col("event_type"), col("bucket"),
        coalesce(col("v"), lit(0.0)).as("v"))
      .orderBy("event_type", "bucket")

  /** Graphite `linearRegression(series)`: per-series least-squares fit
    * over the hourly rollup (`render/functions.py — linearRegression`
    * [U]). Determinism: x is the hour index relative to the series' own
    * first bucket (small exact BIGINT), y accumulates as value·10⁴
    * BIGINT (the [[Det]] scaling), so slope numerator/denominator are
    * EXACT integers (< 2⁵³ at every SF: n ≤ retention buckets, not data
    * size) and the only float steps are the same IEEE divisions in both
    * engines. One window + one agg shuffle on event_type; n stays
    * bounded by RETENTION at any data scale. */
  def linearRegression(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
    val s = hourlyAvg(spark, sfDir)
      .withColumn("hb", expr("unix_micros(bucket) div 3600000000L"))
      .withColumn("h", col("hb") - min(col("hb")).over(w))
      .withColumn("ys",
        (col("v").cast("decimal(18,4)") * lit(10000)).cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("h")).as("sh"),
        sum(col("h") * col("h")).as("shh"), sum(col("ys")).as("sy"),
        sum(col("h") * col("ys")).as("shy"), max(col("h")).as("hmax"))
    val slopeRaw = (col("n") * col("shy") - col("sh") * col("sy"))
      .cast("double") /
      ((col("n") * col("shh") - col("sh") * col("sh")) * lit(10000L))
        .cast("double")
    val interceptRaw = (col("sy").cast("double") / lit(10000.0) -
      slopeRaw * col("sh").cast("double")) / col("n").cast("double")
    // graphite draws the fitted line across the render window; the +24h
    // projection is the capacity-planning read of the same fit (exact
    // integer sums → one shared IEEE double formula, both engines)
    s.select(col("event_type"), col("n"),
        Det.r4(slopeRaw).as("slope"), Det.r4(interceptRaw).as("intercept"),
        Det.r4(slopeRaw * (col("hmax") + lit(24L)).cast("double") +
          interceptRaw).as("forecast_24h"))
      .orderBy("event_type")
  }

  /** Theil–Sen robust slope per series — [[linearRegression]]'s
    * outlier-proof sibling (median of all pairwise slopes has a 29%
    * breakdown point; least squares has 0%): the trend read an
    * anomaly-laden series needs. Determinism: pair slopes are one IEEE
    * division of EXACT integers ((ysⱼ−ysᵢ) / ((hⱼ−hᵢ)·10⁴), the
    * [[graft.util.Det]] scaling), the median picks by integer rank
    * over a (slope, hᵢ, hⱼ) total order — identical doubles sort
    * identically — and an even pair count averages two doubles with
    * one IEEE add/halve.
    *
    * Scale posture: quadratic in WINDOW LENGTH, never in data — the
    * estimator reads the trailing 7-day window (168 hourly buckets ⇒
    * ≤ 14k pairs per series, the Graphite render-window discipline),
    * so the pair join's per-key fanout is a constant; the corpus-sized
    * work remains the one hourly rollup shuffle. */
  private val TheilSenWindowHours = 168L

  def theilSen(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
    val s = hourlyAvg(spark, sfDir)
      .withColumn("hb", expr("unix_micros(bucket) div 3600000000L"))
      .withColumn("h", col("hb") - min(col("hb")).over(w))
      .withColumn("hmax", max(col("h")).over(w))
      .where(col("h") > col("hmax") - TheilSenWindowHours)
      .withColumn("ys",
        (col("v").cast("decimal(18,4)") * lit(10000)).cast("long"))
      .select(col("event_type"), col("h"), col("ys"))
    val pairs = s.as("a")
      .join(s.withColumnRenamed("event_type", "et_b")
          .withColumnRenamed("h", "h_b").withColumnRenamed("ys", "ys_b"),
        col("event_type") === col("et_b") && col("h") < col("h_b"))
      .select(col("event_type"),
        ((col("ys_b") - col("ys")).cast("double") /
          ((col("h_b") - col("h")) * lit(10000L)).cast("double")).as("slope"),
        col("h").as("hi"), col("h_b").as("hj"))
    val wp = Window.partitionBy(col("event_type"))
      .orderBy(col("slope"), col("hi"), col("hj"))
    pairs
      .withColumn("rn", row_number().over(wp))
      .withColumn("np", count(lit(1)).over(w))
      .where(col("rn") === expr("(np + 1) div 2") ||
        col("rn") === expr("np div 2 + 1"))
      .groupBy(col("event_type"))
      .agg(max(col("np")).as("n_pairs"),
        Det.r4(sum(col("slope")) / count(lit(1))).as("median_slope"))
      .orderBy("event_type")
  }

  /** CUSUM changepoint detection per series (Page 1954): the running
    * one-sided cumulative sum of deviations from the series mean,
    * Sₜ = max(0, Sₜ₋₁ + (xₜ − x̄)), detects a sustained upward level
    * shift long before any single point looks anomalous — the drift
    * read beside [[anomaly]]'s pointwise z-score. Multiplying through
    * by n removes the one rational in the recursion: the state is
    * Sₜ·n·10⁴ = max(0, prev + n·ysₜ − Σys), EXACT BIGINTs end to end
    * (|state| ≤ n·Σ|ys| < 2⁶³ at retention scale), so the Spark sorted
    * aggregate() fold and the DuckDB recursive CTE are bit-identical
    * (the proven Holt-family technique); the only float is the final
    * peak rescale, one shared IEEE division. Alarms fire when the
    * scaled state exceeds 10 value-units (10·n·10⁴).
    *
    * Scale posture: one hourly-rollup shuffle, then a linear fold over
    * the retention-bounded sorted array per series — constant state,
    * no joins, no window re-shuffle. */
  def cusum(spark: SparkSession, sfDir: String): DataFrame = {
    val h1 = hourlyAvg(spark, sfDir)
    val step = "greatest(0L, acc.s + n * p.ys - sy)"
    h1.groupBy(col("event_type"))
      .agg(array_sort(collect_list(struct(col("bucket"),
        (col("v").cast("decimal(18,4)") * lit(10000)).cast("long").as("ys"))))
        .as("pts"))
      .select(col("event_type"), size(col("pts")).cast("long").as("n"),
        expr("aggregate(pts, 0L, (a, p) -> a + p.ys)").as("sy"),
        col("pts"))
      .select(col("event_type"), col("n"),
        expr(
          s"""aggregate(pts,
            |  named_struct('s', 0L, 'smax', 0L, 'tp', 0L,
            |    'i', 0L, 'al', 0L),
            |  (acc, p) -> named_struct(
            |    's', $step,
            |    'smax', greatest(acc.smax, $step),
            |    'tp', IF($step > acc.smax, acc.i + 1L, acc.tp),
            |    'i', acc.i + 1L,
            |    'al', acc.al + IF($step > 10L * n * 10000L, 1L, 0L)))
            |""".stripMargin).as("st"))
      .select(col("event_type"), col("n"),
        Det.r4(col("st.smax").cast("double") /
          (col("n") * lit(10000L)).cast("double")).as("cusum_peak"),
        col("st.tp").as("peak_idx"), col("st.al").as("n_alarm"))
      .orderBy("event_type")
  }

  /** PETTITT changepoint test per series — [[cusum]]'s nonparametric
    * sibling (Pettitt 1979): detects a single level shift without
    * assuming normality by comparing every pre/post split on RANKS,
    * U_t = Σ_{i≤t} Σ_{j>t} sgn(x_j − x_i), K = max_t |U_t|; the
    * hour at the argmax is the changepoint candidate and
    * λ = 6K²/(n³+n²) is the Pettitt significance statistic
    * (K significant at α when λ ≥ −ln(α/2)).
    *
    * Oracle-exactness: the O(n²) double sum collapses to the midrank
    * identity U_t = t(n+1) − 2W_t with W_t the running sum of midranks
    * — carried as the always-integer 2·midrank (the [[spearmanCorr]]
    * tie discipline), so U_t = t(n+1) − Σ_{i≤t} r2ᵢ is exact BIGINT
    * under ties. The argmax takes the FIRST t among equal |U_t| via a
    * rank window with an explicit (|U| DESC, t ASC) order — identical
    * in both engines. λ's K² and n²(n+1) form as DECIMAL(38,0)
    * products (BIGINT K² overflows past |U| ≈ 3e9, i.e. n ≈ 1e5
    * buckets; 38 digits hold to n ≈ 3e12), then one IEEE division and
    * the shared rounding. Windows partition on the series key — cost
    * is per-series calendar length via one sort, not O(n²), and
    * scale-free in the fact table. */
  def pettitt(spark: SparkSession, sfDir: String): DataFrame = {
    val h1 = hourlyAvg(spark, sfDir)
    pettittFromSeries(h1.select(col("event_type"), col("bucket"), col("v")))
  }

  /** The rank + argmax half of [[pettitt]] over a (event_type, bucket,
    * v) series relation — factored so the spec can drive it with a
    * crafted tied/shifted series against a brute-force U_t. */
  private[graft] def pettittFromSeries(series: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wV = Window.partitionBy(col("event_type"))
      .orderBy(col("v"), col("bucket"))
    val tV = Window.partitionBy(col("event_type"), col("v"))
    val wT = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    val wP = Window.partitionBy(col("event_type"))
    val ranked = series
      .select(col("event_type"), col("bucket"), col("v"),
        row_number().over(wV).as("rn"))
      .select(col("event_type"), col("bucket"),
        (lit(2L) * min(col("rn")).over(tV) +
          count(lit(1)).over(tV) - lit(1L)).as("r2"))
    val u = ranked
      .select(col("event_type"), col("bucket"),
        row_number().over(wT).cast("long").as("t"),
        sum(col("r2")).over(wT.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).as("w2"),
        count(lit(1)).over(wP).as("n"))
      .where(col("t") < col("n"))
      .select(col("event_type"), col("bucket"), col("t"), col("n"),
        (col("t") * (col("n") + lit(1L)) - col("w2")).as("u"))
    val wK = Window.partitionBy(col("event_type"))
      .orderBy(abs(col("u")).desc, col("t"))
    def dc(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
    u.select(col("event_type"), col("bucket"), col("n"), col("u"),
      abs(col("u")).as("k_stat"), row_number().over(wK).as("pk"))
      .where(col("pk") === 1)
      .select(col("event_type"), col("n"), col("k_stat"),
        col("bucket").as("cp_bucket"),
        signum(col("u")).cast("bigint").as("shift_dir"),
        Det.r4((lit(6) * dc(col("k_stat")) * dc(col("k_stat")))
          .cast("double") /
          (dc(col("n")) * dc(col("n")) * dc(col("n") + lit(1L)))
            .cast("double")).as("lambda"))
      .orderBy("event_type")
  }

  /** SAX symbolization per series (Lin et al. 2003 — Symbolic Aggregate
    * approXimation): z-normalize the hourly sequence, average 24-hour
    * PAA frames, bin each frame mean against the standard-normal
    * quartile breakpoints {−0.6745, 0, +0.6745} into letters a–d, and
    * emit the per-series SAX word. The scale story: SAX words are the
    * front-end of iSAX-style indexed similarity search — a 100 TB
    * metric corpus compares 30-char words (map-side, groupable) instead
    * of raw 720-point sequences.
    *
    * Oracle-exactness: no per-row float z-scores. Every comparison is
    * cross-multiplied into exact integers first — frame deviation
    * e_f = n·Σ_f q − c_f·S (exact BIGINT of 1e4-scaled values) against
    * β·c_f·sqrt(m2) with m2 = n·ΣQ² − S² formed as DECIMAL(9,0) ×
    * DECIMAL(28,0) → DECIMAL(38,0) exactly (headroom: n ≤ 1e9 buckets,
    * ΣQ² ≤ 1e28 — beyond any calendar); the only float steps are the
    * correctly-rounded casts, one sqrt, one multiply and the compare —
    * identical IEEE text in both engines. Frame id is integer DIV (no
    * float floor). Cost: one rank window + two aggregations per
    * series; scale-free in the fact table. */
  def sax(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h1 = hourlyAvg(spark, sfDir)
    val wT = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    val q = h1.select(col("event_type"),
      (row_number().over(wT).cast("long") - lit(1L)).as("idx"),
      (col("v").cast("decimal(18,4)") * lit(10000)).cast("long").as("q"))
    def dc(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
    val st = q.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"), sum(col("q")).as("s"),
      sum(dc(col("q")) * dc(col("q"))).as("ss"))
    val fr = q.groupBy(col("event_type"), expr("idx DIV 24").as("f"))
      .agg(sum(col("q")).as("sq"), count(lit(1)).as("c"))
    val m2 = (col("n").cast("decimal(9,0)") * col("ss").cast("decimal(28,0)")
      - dc(col("s")) * dc(col("s"))).cast("double")
    val e = (col("n") * col("sq") - col("c") * col("s")).cast("double")
    val thr = col("c").cast("double") * sqrt(m2)
    val beta = lit(0.6745)
    val sym = when(e < -beta * thr, "a").when(e < lit(0.0), "b")
      .when(e < beta * thr, "c").otherwise("d")
    fr.join(broadcast(st), "event_type")
      .select(col("event_type"), col("f"), col("n"), col("s"),
        col("ss"), sym.as("sym"))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"), count(lit(1)).as("n_frames"),
        concat_ws("", expr(
          "transform(array_sort(collect_list(struct(f, sym))), p -> p.sym)"))
          .as("sax_word"),
        Det.r4(max(col("s")).cast("double") / max(col("n")).cast("double")
          / lit(10000.0)).as("mean_v"),
        Det.r4(sqrt((max(col("n")).cast("decimal(9,0)") *
          max(col("ss")).cast("decimal(28,0)") -
          dc(max(col("s"))) * dc(max(col("s")))).cast("double")) /
          max(col("n")).cast("double") / lit(10000.0)).as("sd_v"))
      .orderBy("event_type")
  }

  /** Band-limited DYNAMIC TIME WARPING distance between every series
    * pair (Sakoe–Chiba 1978, band w=24h): the elastic similarity
    * measure behind "which metrics move alike but phase-shifted" —
    * where [[crossCorrLagged]] tests a single global lag, DTW aligns
    * locally varying leads/lags. The band is the scale story: cost is
    * O(L·w) per pair, not O(L²), and L is calendar-bounded (hourly
    * buckets), so the pair matrix — not the fact table — is the only
    * thing that grows.
    *
    * Oracle-exactness: the whole DP runs on exact integers — values
    * as 1e4-scaled BIGINT, |a−b| cell costs, min/plus transitions,
    * an INF sentinel (9e17, clamped so INF+cost cannot overflow) —
    * so the recursion is bit-portable. The matrix is walked by ANTI-
    * DIAGONALS: diagonal d depends elementwise on diagonals d−1/d−2
    * (no within-step dependency), which a Spark aggregate() fold over
    * a (p1, p2) pair of 25-slot arrays and a DuckDB recursive CTE
    * carrying two LISTs both express exactly (the holtwinters list-
    * carry pattern). Slot m ↔ cell i is i = (2m + d%2 + d − w)/2 —
    * the numerator is provably even, so floor-vs-truncate division
    * semantics cannot diverge between engines. */
  def dtw(spark: SparkSession, sfDir: String): DataFrame = {
    val h1 = hourlyAvg(spark, sfDir)
    val arr = h1
      .select(col("event_type"), col("bucket"),
        (col("v").cast("decimal(18,4)") * lit(10000)).cast("long").as("q"))
      .groupBy(col("event_type"))
      .agg(array_sort(collect_list(struct(col("bucket"), col("q"))))
        .as("ps"))
      .select(col("event_type"), expr("transform(ps, p -> p.q)").as("qs"),
        size(col("ps")).cast("long").as("n"))
    val pairs = arr
      .select(col("event_type").as("ma"), col("qs").as("qsa"),
        col("n").as("na"))
      .join(arr.select(col("event_type").as("mb"), col("qs").as("qsb"),
        col("n").as("nb")), col("ma") < col("mb"))
      .select(col("ma"), col("mb"), least(col("na"), col("nb")).as("l"),
        expr("slice(qsa, 1, CAST(least(na, nb) AS INT))").as("qa"),
        expr("slice(qsb, 1, CAST(least(na, nb) AS INT))").as("qb"))
    dtwFromPairs(pairs)
  }

  /** The banded DP over a (ma, mb, l, qa, qb) pair relation — factored
    * so the spec can drive it with crafted sequences against a driver-
    * side reference DP. */
  private[graft] def dtwFromPairs(pairs: DataFrame): DataFrame = {
    val W = 24
    val inf = "900000000000000000L"
    val iE = s"((2 * m + (dd % 2) + dd - $W) DIV 2)"
    val par = "(dd % 2)"
    val cost = s"abs(try_element_at(qa, CAST($iE + 1 AS INT)) - " +
      s"try_element_at(qb, CAST(dd - $iE + 1 AS INT)))"
    val pred1 =
      s"IF(m - 1 + $par >= 0 AND m - 1 + $par <= $W, " +
        s"element_at(acc.p1, CAST(m + $par AS INT)), $inf)"
    val pred2 =
      s"IF(m + $par <= $W, " +
        s"element_at(acc.p1, CAST(m + $par + 1 AS INT)), $inf)"
    val pred3 = "element_at(acc.p2, CAST(m + 1 AS INT))"
    val valid = s"$iE >= 0 AND $iE < l AND dd - $iE >= 0 AND " +
      s"dd - $iE < l AND abs(2 * $iE - dd) <= $W"
    val newv = s"IF(NOT ($valid), $inf, least($inf, " +
      s"$cost + least($pred1, $pred2, $pred3)))"
    val base = s"named_struct(" +
      s"'p1', transform(sequence(0L, ${W}L), m -> " +
      s"IF(m = ${W / 2}L, abs(element_at(qa, 1) - element_at(qb, 1)), " +
      s"$inf)), " +
      s"'p2', transform(sequence(0L, ${W}L), m -> $inf))"
    val fold = s"aggregate(sequence(1L, 2L * l - 2L), $base, " +
      s"(acc, dd) -> named_struct(" +
      s"'p1', transform(sequence(0L, ${W}L), m -> $newv), " +
      s"'p2', acc.p1), " +
      s"acc -> element_at(acc.p1, ${W / 2 + 1}))"
    pairs
      .select(col("ma"), col("mb"), col("l"),
        expr(s"IF(l < 2, abs(element_at(qa, 1) - element_at(qb, 1)), " +
          s"$fold)").as("dtwq"))
      .select(col("ma"), col("mb"), col("l"),
        Det.r4(col("dtwq").cast("double") / lit(10000.0)).as("dtw_dist"),
        Det.r4(col("dtwq").cast("double") / lit(10000.0) /
          col("l").cast("double")).as("dtw_norm"))
      .orderBy("ma", "mb")
  }

  /** Autocorrelation function at lags 1–3 per series (Box–Jenkins) —
    * the "is this metric periodic / mean-reverting / trending"
    * diagnostic behind seasonality detection and forecast-model choice.
    * Over the hourly consolidated sequence:
    * acf(k) = Σₜ₌ₖ(vₜ−v̄)(vₜ₋ₖ−v̄) / Σₜ(vₜ−v̄)².
    *
    * Oracle-exactness: subtracting a float mean per term would smear
    * ulps through every product, so the centering is multiplied
    * through by n — dₜ = n·qₜ − S with qₜ the exact 1e4-scaled BIGINT
    * value and S = Σq — making every term an exact integer; the shared
    * n²·10⁸ scale cancels in the ratio. Products accumulate as
    * DECIMAL(19,0)×DECIMAL(19,0) → DECIMAL(38,0) (|d| ≤ n·|q| ≈ 7e9,
    * d² ≈ 5e19, Σ ≈ 4e22 — comfortably inside 38 digits at sf0.1; at
    * 100 TB the same identity runs per-shard with a two-level decimal
    * agg). Only the FINAL num/den division is float: both operands
    * cast correctly-rounded to double, one IEEE division, one shared
    * rounding. One window pass + one agg shuffle per series. */
  def acf(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wp = Window.partitionBy("event_type")
    val wo = wp.orderBy("bucket")
    val c = hourlyAvg(spark, sfDir)
      .select(col("event_type"), col("bucket"),
        (col("v").cast("decimal(18,4)") * lit(10000L)).cast("long").as("q"))
      .withColumn("d", (count(lit(1)).over(wp) * col("q") -
        sum(col("q")).over(wp)).cast("decimal(19,0)"))
      .withColumn("d1", lag(col("d"), 1).over(wo))
      .withColumn("d2", lag(col("d"), 2).over(wo))
      .withColumn("d3", lag(col("d"), 3).over(wo))
    def ratio(num: org.apache.spark.sql.Column) =
      Det.r4(num.cast("double") / col("den").cast("double"))
    c.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("d") * col("d")).as("den"),
        sum(col("d") * col("d1")).as("s1"),
        sum(col("d") * col("d2")).as("s2"),
        sum(col("d") * col("d3")).as("s3"))
      .select(col("event_type"), col("n"), ratio(col("s1")).as("acf1"),
        ratio(col("s2")).as("acf2"), ratio(col("s3")).as("acf3"))
      .orderBy("event_type")
  }

  /** Partial autocorrelation at lags 1–2 per series (Durbin–Levinson):
    * φ₁₁ = r₁, φ₂₂ = (r₂ − r₁²)/(1 − r₁²) — the AR-order picker beside
    * [[acf]]'s MA diagnostic. Exact-sum scaffolding shared with
    * [[acf]]; rₖ enter the Levinson step as UNROUNDED doubles (each a
    * single correctly-rounded decimal→double cast + one IEEE division)
    * and the step itself is three IEEE ops written identically in both
    * engines — no libm, no engine round() dialect. Squaring r in
    * decimal would need den² ≈ 10⁴⁵ and overflow DECIMAL(38), which is
    * exactly why the final algebra runs in float. */
  def pacf(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wp = Window.partitionBy("event_type")
    val wo = wp.orderBy("bucket")
    val c = hourlyAvg(spark, sfDir)
      .select(col("event_type"), col("bucket"),
        (col("v").cast("decimal(18,4)") * lit(10000L)).cast("long").as("q"))
      .withColumn("d", (count(lit(1)).over(wp) * col("q") -
        sum(col("q")).over(wp)).cast("decimal(19,0)"))
      .withColumn("d1", lag(col("d"), 1).over(wo))
      .withColumn("d2", lag(col("d"), 2).over(wo))
    c.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("d") * col("d")).as("den"),
        sum(col("d") * col("d1")).as("s1"),
        sum(col("d") * col("d2")).as("s2"))
      .select(col("event_type"), col("n"),
        (col("s1").cast("double") / col("den").cast("double")).as("r1"),
        (col("s2").cast("double") / col("den").cast("double")).as("r2"))
      .select(col("event_type"), col("n"), Det.r4(col("r1")).as("pacf1"),
        Det.r4((col("r2") - col("r1") * col("r1")) /
          (lit(1.0) - col("r1") * col("r1"))).as("pacf2"))
      .orderBy("event_type")
  }

  /** Shared daily series for the day-grain diagnostics ([[tsTheilSen]],
    * [[tsDurbinWatson]], [[tsNeweyWest]], [[tsPartialCorr]]): exact-rounded daily means keyed by epoch day
    * (integer — the pair join's slope denominator stays exact). */
  private def dailySeries(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"),
        expr("unix_timestamp(date_trunc('DAY', ts)) div 86400")
          .cast("long").as("t"))
      .agg(Det.avg4(col("value")).as("v"))

  /** THEIL–SEN ROBUST SLOPE per series — the median-of-pairwise-slopes
    * trend estimator beside [[linearRegression]]'s least squares (up
    * to ~29% contamination moves it not at all — the robust
    * regression read every monitoring stack wants when spikes poison
    * OLS; [[mannKendall]] is its classical significance companion). Grain discipline: slopes form over the DAY-grain rollup
    * (b(b−1)/2 pairs for b daily buckets — bounded by the calendar,
    * never row grain), each slope ONE IEEE expression over
    * exact-rounded daily means and integer day gaps, and the median
    * is the integer-rank selection (rank ⌈n/2⌉ = (n+1) div 2, the
    * lower median — interpolation-free, so the reported slope is an
    * actual pairwise slope, bit-identical cross-engine). */
  def tsTheilSen(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = dailySeries(spark, sfDir)
      .localCheckpoint(eager = false) // both sides of the pair join
    val b = daily.select(col("event_type"), col("t").as("t2"),
      col("v").as("v2"))
    val pairs = daily.join(b, Seq("event_type"))
      .where(col("t2") > col("t"))
      .select(col("event_type"),
        ((col("v2") - col("v")) / (col("t2") - col("t")).cast("double"))
          .as("slope"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("slope"))
    val np = Window.partitionBy(col("event_type"))
    pairs
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n_pairs", count(lit(1)).over(np))
      .where(col("rn") === expr("(n_pairs + 1) div 2"))
      .select(col("event_type"), col("n_pairs"),
        Det.r4(col("slope")).as("slope"))
      .orderBy("event_type")
  }

  /** PARTIAL CORRELATION r_xy·z — does click activity correlate with
    * purchases AFTER controlling for overall traffic (the 'view'
    * series)? The confounder-removal read that completes the
    * correlation family (raw Pearson answers "do they move together";
    * this answers "beyond what traffic explains"). All three daily
    * series align on epoch day; the nine moments accumulate as exact
    * DECIMAL(38,0) over 10⁴-scaled means (the assortativity Pearson
    * discipline), each pairwise r is the shared Pearson text, and
    * r_xy·z = (r_xy − r_xz·r_zy)/√((1−r_xz²)(1−r_zy²)) is one more
    * fixed IEEE expression. NULL when any variance or the partial
    * denominator degenerates. */
  def tsPartialCorr(spark: SparkSession, sfDir: String): DataFrame = {
    def dc(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val daily = dailySeries(spark, sfDir)
      .select(col("event_type"), col("t"),
        (col("v").cast("decimal(18,4)") * lit(10000L)).cast("long")
          .as("q"))
      .localCheckpoint(eager = false) // three aligned selections
    def series(tname: String, alias: String) =
      daily.where(col("event_type") === tname)
        .select(col("t"), col("q").as(alias))
    val j = series("click", "x")
      .join(series("purchase", "y"), "t")
      .join(series("view", "z"), "t")
    val m = j.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("z")).as("sz"),
      sum(dc(col("x")) * col("x")).as("sxx"),
      sum(dc(col("y")) * col("y")).as("syy"),
      sum(dc(col("z")) * col("z")).as("szz"),
      sum(dc(col("x")) * col("y")).as("sxy"),
      sum(dc(col("x")) * col("z")).as("sxz"),
      sum(dc(col("y")) * col("z")).as("syz"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    def num(sab: org.apache.spark.sql.Column,
        sa: org.apache.spark.sql.Column,
        sb: org.apache.spark.sql.Column) =
      d(dc(col("n")) * sab - dc(sa) * sb)
    def vv(saa: org.apache.spark.sql.Column,
        sa: org.apache.spark.sql.Column) =
      d(dc(col("n")) * saa - dc(sa) * sa)
    val vx = vv(col("sxx"), col("sx"))
    val vy = vv(col("syy"), col("sy"))
    val vz = vv(col("szz"), col("sz"))
    val rxy = num(col("sxy"), col("sx"), col("sy")) / sqrt(vx * vy)
    val rxz = num(col("sxz"), col("sx"), col("sz")) / sqrt(vx * vz)
    val ryz = num(col("syz"), col("sy"), col("sz")) / sqrt(vy * vz)
    val den = (lit(1.0) - rxz * rxz) * (lit(1.0) - ryz * ryz)
    val ok = col("n") > 2L && vx > lit(0.0) && vy > lit(0.0) &&
      vz > lit(0.0)
    m.select(col("n").as("n_days"),
      when(ok, Det.r4(rxy)).otherwise(lit(null)).as("r_xy"),
      when(ok, Det.r4(rxz)).otherwise(lit(null)).as("r_xz"),
      when(ok, Det.r4(ryz)).otherwise(lit(null)).as("r_yz"),
      when(ok && den > lit(0.0),
        Det.r4((rxy - rxz * ryz) / sqrt(den)))
        .otherwise(lit(null)).as("r_xy_z"))
  }

  /** NEWEY–WEST LONG-RUN VARIANCE RATIO per series — the
    * HAC-correction read beside [[tsDurbinWatson]] (DW detects lag-1
    * autocorrelation; this quantifies how much it INFLATES the naive
    * variance of the mean): Bartlett weights at lags 1–3, every
    * autocovariance Σ EₜEₜ₋ₗ over the exact n-scaled residuals
    * Eₜ = n·qₜ − S (the DW discipline — the mean never becomes a
    * float), weights 3/4, 1/2, 1/4 exact in binary, so var₀ and the
    * ratio LRV/γ₀ are fixed IEEE expressions over exact
    * DECIMAL(38,0)s. ratio > 1 ⇒ positive serial correlation ⇒ naive
    * CIs too tight. NULL on γ₀ = 0. */
  def tsNeweyWest(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wT = Window.partitionBy(col("event_type")).orderBy(col("t"))
    val wN = Window.partitionBy(col("event_type"))
    def dc(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val q = dailySeries(spark, sfDir)
      .select(col("event_type"), col("t"),
        (col("v").cast("decimal(18,4)") * lit(10000L)).cast("long")
          .as("q"))
      .withColumn("n", count(lit(1)).over(wN))
      .withColumn("s", sum(col("q")).over(wN))
      .withColumn("e", col("n") * col("q") - col("s"))
      .withColumn("e1", lag(col("e"), 1).over(wT))
      .withColumn("e2", lag(col("e"), 2).over(wT))
      .withColumn("e3", lag(col("e"), 3).over(wT))
    def gl(c: org.apache.spark.sql.Column) =
      sum(when(c.isNotNull, dc(col("e")) * c)
        .otherwise(lit(0L).cast("decimal(38,0)")))
    val g = q.groupBy(col("event_type"), col("n"))
      .agg(sum(dc(col("e")) * col("e")).as("g0"),
        gl(col("e1")).as("g1"), gl(col("e2")).as("g2"),
        gl(col("e3")).as("g3"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val lrv = d(col("g0")) + lit(2.0) * (lit(0.75) * d(col("g1")) +
      lit(0.5) * d(col("g2")) + lit(0.25) * d(col("g3")))
    g.select(col("event_type"), col("n").as("n_days"),
        Det.r4(d(col("g0")) /
          (d(col("n")) * d(col("n")) * d(col("n")) * lit(1.0e8)))
          .as("var0"),
        when(col("g0") > lit(0L), Det.r4(lrv / d(col("g0"))))
          .otherwise(lit(null)).as("lrv_ratio"))
      .orderBy("event_type")
  }

  /** DURBIN–WATSON STATISTIC per series — the lag-1 residual
    * autocorrelation diagnostic in its classical ratio form
    * (DW ≈ 2(1−ρ̂₁); [[tsLjungBox]] is the k-lag portmanteau, DW the
    * single-number regression-output staple): residuals are
    * deviations from the series mean, and the MEAN CANCELS in the
    * numerator — Σ(eₜ−eₜ₋₁)² = Σ(qₜ−qₜ₋₁)²/10⁸ over the exact
    * 10⁴-scaled daily means — so DW = n²·Σd²/Σ(n·qₜ−S)² is one IEEE
    * division of two exact DECIMAL(38,0) sums. NULL on n < 2 or a
    * constant series. */
  def tsDurbinWatson(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wT = Window.partitionBy(col("event_type")).orderBy(col("t"))
    val wN = Window.partitionBy(col("event_type"))
    def dc(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val q = dailySeries(spark, sfDir)
      .select(col("event_type"), col("t"),
        (col("v").cast("decimal(18,4)") * lit(10000L)).cast("long")
          .as("q"))
      .withColumn("qp", lag(col("q"), 1).over(wT))
      .withColumn("n", count(lit(1)).over(wN))
      .withColumn("s", sum(col("q")).over(wN))
    val agg = q.groupBy(col("event_type"), col("n"))
      .agg(sum(when(col("qp").isNotNull,
        dc(col("q") - col("qp")) * (col("q") - col("qp")))
        .otherwise(lit(0L).cast("decimal(38,0)"))).as("sd2"),
        sum(dc(col("n") * col("q") - col("s")) *
          (col("n") * col("q") - col("s"))).as("se2"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    agg.select(col("event_type"), col("n").as("n_days"),
        when(col("n") > 1L && col("se2") > lit(0L),
          Det.r4(d(col("n")) * d(col("n")) * d(col("sd2")) /
            d(col("se2")))).otherwise(lit(null)).as("dw"))
      .orderBy("event_type")
  }

  /** LJUNG–BOX PORTMANTEAU TEST at lags 1–3 per series (with the
    * Box–Pierce companion) — the "is there ANY autocorrelation left"
    * residual-whiteness read that closes the Box–Jenkins family
    * ([[acf]] measures, [[pacf]] orders, this one tests):
    * Q_bp = n·Σr_k², Q_lb = n(n+2)·Σ r_k²/(n−k). Exact-sum
    * scaffolding shared with [[acf]] (n-multiplied centering, exact
    * DECIMAL(38,0) products); each r_k is one correctly-rounded cast
    * + one IEEE division, and both statistics are FIXED left-assoc
    * three-term expressions written identically in both engines — no
    * order-dependent float Σ because the lag set is a literal. NULL
    * on degenerate series (n ≤ 3 or zero variance) in both engines. */
  def tsLjungBox(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wp = Window.partitionBy("event_type")
    val wo = wp.orderBy("bucket")
    val c = hourlyAvg(spark, sfDir)
      .select(col("event_type"), col("bucket"),
        (col("v").cast("decimal(18,4)") * lit(10000L)).cast("long").as("q"))
      .withColumn("d", (count(lit(1)).over(wp) * col("q") -
        sum(col("q")).over(wp)).cast("decimal(19,0)"))
      .withColumn("d1", lag(col("d"), 1).over(wo))
      .withColumn("d2", lag(col("d"), 2).over(wo))
      .withColumn("d3", lag(col("d"), 3).over(wo))
    val g = c.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("d") * col("d")).as("den"),
        sum(col("d") * col("d1")).as("s1"),
        sum(col("d") * col("d2")).as("s2"),
        sum(col("d") * col("d3")).as("s3"))
    def dd(cc: org.apache.spark.sql.Column) = cc.cast("double")
    def r(s: org.apache.spark.sql.Column) = dd(s) / dd(col("den"))
    val r1 = r(col("s1")); val r2 = r(col("s2")); val r3 = r(col("s3"))
    val n = dd(col("n"))
    val bp = n * (r1 * r1 + r2 * r2 + r3 * r3)
    val lb = n * (n + lit(2.0)) *
      (r1 * r1 / (n - lit(1.0)) + r2 * r2 / (n - lit(2.0)) +
        r3 * r3 / (n - lit(3.0)))
    val ok = col("n") > lit(3L) && col("den") > lit(0)
    g.select(col("event_type"), col("n"),
        when(ok, Det.r4(bp)).otherwise(lit(null)).as("q_bp"),
        when(ok, Det.r4(lb)).otherwise(lit(null)).as("q_lb"))
      .orderBy("event_type")
  }

  /** Shared engine-neutral formula texts for [[tsGranger]] — pure
    * CAST/arithmetic with NO float literals (a bare `2.0` parses as
    * DECIMAL in Spark SQL text — the standing dialect hazard — so the
    * doubling is written as an explicit repeated subtraction and the
    * dof as CAST(n − 3 AS DOUBLE)), making one string valid and
    * bit-identical in BOTH engines. Centered moments are the
    * n-multiplied form S_ab = n·Σab − Σa·Σb over exact integer sums;
    * the common n and 10⁸ scales cancel in every F ratio. */
  private def grangerTexts: (String, String, String, String) = {
    def cen(sab: String, sa: String, sb: String) =
      s"(CAST(n AS DOUBLE) * CAST($sab AS DOUBLE) - " +
        s"CAST($sa AS DOUBLE) * CAST($sb AS DOUBLE))"
    val s11 = cen("sylyl", "syl", "syl") // S_{yl,yl}
    val s22 = cen("sxlxl", "sxl", "sxl") // S_{xl,xl}
    val s12 = cen("sylxl", "syl", "sxl") // S_{yl,xl}
    // x -> y: response y_t on (yl, xl)
    val syyC = cen("syy", "sy", "sy")
    val b1 = cen("syyl", "syl", "sy")
    val b2 = cen("syxl", "sxl", "sy")
    val detXY = s"($s11 * $s22 - $s12 * $s12)"
    val explXY = s"($b1 * $b1 * $s22 - $b1 * $b2 * $s12 - " +
      s"$b1 * $b2 * $s12 + $b2 * $b2 * $s11)"
    val rssUXY = s"($syyC - $explXY / $detXY)"
    val rssRXY = s"($syyC - $b1 * $b1 / $s11)"
    val fXY = s"(($rssRXY - $rssUXY) / ($rssUXY / CAST(n - 3 AS DOUBLE)))"
    val gXY = s"(n > 3 AND $s11 > 0 AND $detXY > 0 AND $rssUXY > 0)"
    // y -> x: response x_t on (xl, yl)
    val sxxC = cen("sxx", "sx", "sx")
    val c1 = cen("sxxl", "sxl", "sx")
    val c2 = cen("sxyl", "syl", "sx")
    val detYX = s"($s22 * $s11 - $s12 * $s12)"
    val explYX = s"($c1 * $c1 * $s11 - $c1 * $c2 * $s12 - " +
      s"$c1 * $c2 * $s12 + $c2 * $c2 * $s22)"
    val rssUYX = s"($sxxC - $explYX / $detYX)"
    val rssRYX = s"($sxxC - $c1 * $c1 / $s22)"
    val fYX = s"(($rssRYX - $rssUYX) / ($rssUYX / CAST(n - 3 AS DOUBLE)))"
    val gYX = s"(n > 3 AND $s22 > 0 AND $detYX > 0 AND $rssUYX > 0)"
    (fXY, gXY, fYX, gYX)
  }

  /** GRANGER CAUSALITY (bivariate, lag 1) between the click and
    * purchase hourly series — "does click activity help predict NEXT
    * hour's purchases beyond purchases' own history" (and the
    * reverse): F = (RSS_restricted − RSS_full)/(RSS_full/(n−3)) with
    * both residual sums in CLOSED FORM from the 2×2 normal equations
    * — no iterative fit, so the whole statistic is one fixed IEEE
    * expression over exact moments. Determinism: the joined lagged
    * grid carries exact 1e4-scaled BIGINTs, all 13 raw moments
    * accumulate as DECIMAL(38,0)/HUGEINT sums of BIGINT products, and
    * the ONE shared formula text (see [[grangerTexts]] — no float
    * literals, valid in both dialects verbatim) runs on exact-rounded
    * doubles; n/10⁸ scale factors cancel in each F. NULL on
    * degenerate designs (n ≤ 3, zero lag variance, singular normal
    * matrix, perfect fit) in both engines. The single ordered lag
    * window is series-grain (the acf precedent; the two-pass
    * distributed rank is the family's documented scale path). */
  def tsGranger(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = hourlyAvg(spark, sfDir)
      .where(col("event_type").isin("click", "purchase"))
      .select(col("event_type"), col("bucket"),
        (col("v").cast("decimal(18,4)") * lit(10000L)).cast("long").as("q"))
      .localCheckpoint(eager = false) // both series selections
    val y = h.where(col("event_type") === "purchase")
      .select(col("bucket"), col("q").as("y"))
    val x = h.where(col("event_type") === "click")
      .select(col("bucket"), col("q").as("x"))
    val wo = Window.orderBy(col("bucket"))
    val lagged = y.join(x, "bucket")
      .withColumn("yl", lag(col("y"), 1).over(wo))
      .withColumn("xl", lag(col("x"), 1).over(wo))
      .where(col("yl").isNotNull)
    def sd(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(38,0)"))
    val agg = lagged.agg(count(lit(1)).as("n"),
      sd(col("y")).as("sy"), sd(col("x")).as("sx"),
      sd(col("yl")).as("syl"), sd(col("xl")).as("sxl"),
      sd(col("y") * col("y")).as("syy"),
      sd(col("x") * col("x")).as("sxx"),
      sd(col("yl") * col("yl")).as("sylyl"),
      sd(col("xl") * col("xl")).as("sxlxl"),
      sd(col("y") * col("yl")).as("syyl"),
      sd(col("y") * col("xl")).as("syxl"),
      sd(col("x") * col("xl")).as("sxxl"),
      sd(col("x") * col("yl")).as("sxyl"),
      sd(col("yl") * col("xl")).as("sylxl"))
    val (fXY, gXY, fYX, gYX) = grangerTexts
    agg.select(col("n"),
      when(expr(gXY), Det.r4(expr(fXY))).otherwise(lit(null)).as("f_xy"),
      when(expr(gYX), Det.r4(expr(fYX))).otherwise(lit(null)).as("f_yx"))
  }

  /** 10%-trimmed mean per series — the robust-center member beside the
    * median/MAD/Theil–Sen family: drop the bottom and top ⌊n/10⌋
    * values by INTEGER rank over the (v, bucket) total order (an
    * interpolating trim would re-open the cross-engine percentile
    * dialect problem; an indexed cut cannot), then the exact-decimal
    * mean of the kept values. One window pass + one agg per series. */
  def trimmedMean(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("v", "bucket")
    hourlyAvg(spark, sfDir)
      .withColumn("r", row_number().over(w))
      .withColumn("n",
        count(lit(1)).over(Window.partitionBy("event_type")))
      .where(col("r") > expr("n DIV 10") &&
        col("r") <= col("n") - expr("n DIV 10"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_kept"),
        Det.davg4(col("v")).as("trimmed_mean"))
      .orderBy("event_type")
  }

  /** Graphite `multiplySeries` — the last missing member of the fan-in
    * family (sum/count/range/diff/max/min/avg are done): per-bucket
    * product across the five series. IEEE multiplication is commutative
    * but NOT associative under rounding, so both engines multiply in
    * the SAME fixed alphabetical series order; an absent series
    * contributes an exact ×1.0 (the identity is exact in IEEE, so
    * skip-vs-multiply-by-one cannot diverge). */
  def multiplySeries(spark: SparkSession, sfDir: String): DataFrame = {
    val h1 = hourlyAvg(spark, sfDir)
    def f(t: String): org.apache.spark.sql.Column =
      coalesce(max(when(col("event_type") === t, col("v"))), lit(1.0))
    h1.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_series"),
        (f("click") * f("error") * f("purchase") * f("signup") * f("view"))
          .as("product"))
      .orderBy("bucket")
  }

  /** Graphite `exponentialMovingAverage` (graphite-web
    * render/functions.py — exponentialMovingAverage [U]) — single
    * exponential smoothing s_t = α·v_t + (1−α)·s_{t−1}, seeded with the
    * first point (graphite seeds with the window average; seeding with
    * v₁ keeps the recursion purely IEEE with no mean in the seed).
    * Same proven fold ↔ recursive-CTE pairing as [[holtForecast]]:
    * every state advance is the identical mul/add text both engines. */
  def ewma(spark: SparkSession, sfDir: String): DataFrame = {
    val h1 = hourlyAvg(spark, sfDir)
    h1.groupBy(col("event_type"))
      .agg(array_sort(collect_list(struct(col("bucket"), col("v"))))
        .as("pts"))
      .select(col("event_type"), size(col("pts")).as("n"),
        expr(
          """aggregate(
            |  slice(pts, 2, size(pts) - 1),
            |  named_struct('s', pts[0].v),
            |  (acc, p) -> named_struct('s', 0.2D * p.v + 0.8D * acc.s),
            |  acc -> acc.s)""".stripMargin).as("ewma"))
      .orderBy("event_type")
  }

  /** Graphite `holtWintersForecast` (simplified to Holt's LINEAR double
    * exponential smoothing — level + trend, the core of the aberration
    * alert; `render/functions.py — holtWintersForecast` [U] seasons it
    * daily on top of exactly this recursion). The per-series recursion
    * is inherently sequential, so it folds over the SORTED hourly-rollup
    * array with `aggregate` — one codegen'd expression, no UDF, and the
    * array is retention-bounded (≤ archive points per series, NOT data-
    * sized), so collect_list here survives any corpus scale. Output is
    * the one-step-ahead forecast (level + trend) per series.
    * ORACLE-CHECKED via the bit-exact recursive-CTE twin (the technique
    * this function pioneered), and additionally spec'd against a
    * driver-side reference fold. */
  def holtForecast(spark: SparkSession, sfDir: String): DataFrame = {
    val h1 = hourlyAvg(spark, sfDir)
    h1.groupBy(col("event_type"))
      .agg(array_sort(collect_list(struct(col("bucket"), col("v"))))
        .as("pts"))
      // the seed reads pts[1] (ANSI throws on a 1-point series) and the
      // oracle's recursion seed joins rn=2 (dropping n<2 series) — the
      // same guard keeps both engines' row sets identical
      .where(size(col("pts")) >= 2)
      .select(col("event_type"), size(col("pts")).as("n"),
        expr(
          """aggregate(
            |  slice(pts, 3, greatest(size(pts) - 2, 0)),
            |  named_struct(
            |    'lvl', pts[0].v,
            |    'trd', CAST(pts[1].v - pts[0].v AS DOUBLE)),
            |  (acc, p) -> named_struct(
            |    'lvl', 0.1D * p.v + 0.9D * (acc.lvl + acc.trd),
            |    'trd', 0.01D * (0.1D * p.v + 0.9D * (acc.lvl + acc.trd)
            |             - acc.lvl) + 0.99D * acc.trd),
            |  acc -> acc.lvl + acc.trd)""".stripMargin).as("forecast"))
      .orderBy("event_type")
  }

  /** EWMA CONTROL CHART (Roberts 1959; the SPC chart beside
    * [[bollinger]]'s fixed-window bands): z_t = λx_t + (1−λ)z_{t−1}
    * seeded at the series mean, alarmed when |z_t − μ| exceeds
    * L·σ·√(λ/(2−λ)·(1−(1−λ)^{2t})) — the time-varying limit that
    * makes EWMA charts catch small early shifts. λ = 0.2, L = 3.
    * Determinism: μ and σ come from EXACT 1e4-scaled BIGINT moment
    * sums (BIGINT→double casts round identically — never a
    * decimal→double past 2⁵³), the (1−λ)^{2t} power is CARRIED
    * multiplicatively in the fold state (no libm pow), and the z/limit
    * update text is duplicated verbatim at each use site in both
    * engines (the page_hinkley rule), so breach decisions are
    * bit-equal. */
  /** The calibration half of [[ewmaChart]]: per-series exact-moment μ
    * and σ as a TABLE — what the live monitor joins against
    * (stream-static), the ksReferenceEdges posture. */
  def ewmaCalibration(spark: SparkSession, sfDir: String): DataFrame =
    ewmaMoments(spark, sfDir)._2
      .select(col("event_type").as("metric"), col("mu"), col("sd"))

  /** Shared by the chart and its calibration: the 1e4-scaled hourly
    * relation and the per-series exact moment row with μ/σ doubles. */
  private def ewmaMoments(spark: SparkSession, sfDir: String)
      : (DataFrame, DataFrame) = {
    val h1 = hourlyAvg(spark, sfDir)
      .withColumn("q",
        (col("v").cast("decimal(18,4)") * lit(10000)).cast("long"))
      .localCheckpoint(eager = false) // moments + the fold's pts
    val muS = "CAST(s1 AS DOUBLE) / 10000.0D / CAST(n AS DOUBLE)"
    val sdS = "sqrt((CAST(s2 AS DOUBLE) / 100000000.0D - " +
      "(CAST(s1 AS DOUBLE) / 10000.0D) * (CAST(s1 AS DOUBLE) / 10000.0D)" +
      " / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0D))"
    val mom = h1.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("s1"),
        sum(col("q") * col("q")).as("s2"))
      .where(col("n") >= 2)
      .withColumn("mu", expr(muS))
      .withColumn("sd", expr(sdS))
    (h1, mom)
  }

  def ewmaChart(spark: SparkSession, sfDir: String): DataFrame = {
    val (h1, mom) = ewmaMoments(spark, sfDir)
    val zS = "0.2D * p.v + 0.8D * acc.z"
    val pS = "acc.p * 0.64D"
    val limS = s"3.0D * sd * sqrt(0.2D / 1.8D * (1.0D - $pS))"
    val brS = s"abs($zS - mu) > $limS"
    val pts = h1.groupBy(col("event_type"))
      .agg(array_sort(collect_list(struct(col("bucket"), col("v"))))
        .as("pts"))
    pts.join(mom, "event_type")
      .select(col("event_type"), col("n"), col("mu"), col("sd"),
        col("pts"))
      .select(col("event_type"), col("n"), col("mu"), col("sd"),
        expr(
          s"""aggregate(
            |  pts,
            |  named_struct('t', 0L, 'z', mu,
            |    'p', CAST(1.0D AS DOUBLE), 'br', 0L, 'fi', 0L),
            |  (acc, p) -> named_struct(
            |    't', acc.t + 1L,
            |    'z', $zS,
            |    'p', $pS,
            |    'br', acc.br + IF($brS, 1L, 0L),
            |    'fi', IF(acc.fi > 0L, acc.fi,
            |      IF($brS, acc.t + 1L, 0L))))""".stripMargin).as("st"))
      .select(col("event_type"), col("n"),
        col("st.br").as("breaches"), col("st.fi").as("first_breach"),
        Det.r4(col("st.z")).as("ewma"),
        Det.r4(lit(3.0) * col("sd") *
          sqrt(lit(0.2) / lit(1.8) * (lit(1.0) - col("st.p"))))
          .as("limit"))
      .orderBy("event_type")
  }

  /** PAGE–HINKLEY DRIFT DETECTOR (Page 1954; the online concept-drift
    * test streaming-ML monitors run): per series, the cumulative
    * deviation from the running mean m_t = Σ(xᵢ − x̄ᵢ − δ) alarms when
    * it rises more than λ above its running minimum. Sequential by
    * definition ⇒ the proven sorted-fold ↔ recursive-CTE pair (the
    * holt family discipline): every state field advances from the
    * PRE-update state, the m-update text is duplicated verbatim at
    * each use site (lambdas don't CSE; the CTE mirrors the same
    * duplication), and both engines execute the identical IEEE op
    * sequence, so alarm decisions are bit-equal. δ = 0.005, λ = 50 —
    * fixture-tuned magnitude constants (production tunes per metric).
    * Output: alarm count, first-alarm index (0 = never), final
    * m − min(m) headroom. */
  def pageHinkley(spark: SparkSession, sfDir: String): DataFrame = {
    val h1 = hourlyAvg(spark, sfDir)
    val mS = "acc.m + (p.v - (acc.sum + p.v) / " +
      "CAST(acc.t + 1L AS DOUBLE) - 0.005D)"
    val mmS = s"least(acc.mm, $mS)"
    val alarmS = s"$mS - $mmS > 50.0D"
    h1.groupBy(col("event_type"))
      .agg(array_sort(collect_list(struct(col("bucket"), col("v"))))
        .as("pts"))
      .select(col("event_type"), size(col("pts")).as("n"),
        expr(
          s"""aggregate(
            |  pts,
            |  named_struct('t', 0L, 'sum', CAST(0.0D AS DOUBLE),
            |    'm', CAST(0.0D AS DOUBLE), 'mm', CAST(0.0D AS DOUBLE),
            |    'al', 0L, 'fi', 0L),
            |  (acc, p) -> named_struct(
            |    't', acc.t + 1L,
            |    'sum', acc.sum + p.v,
            |    'm', $mS,
            |    'mm', $mmS,
            |    'al', acc.al + IF($alarmS, 1L, 0L),
            |    'fi', IF(acc.fi > 0L, acc.fi,
            |      IF($alarmS, acc.t + 1L, 0L))))""".stripMargin)
          .as("st"))
      .select(col("event_type"), col("n"),
        col("st.al").as("alarms"), col("st.fi").as("first_alarm"),
        Det.r4(col("st.m") - col("st.mm")).as("ph"))
      .orderBy("event_type")
  }

  /** DAMPED-trend Holt (Gardner–McKenzie 1985) — the forecasting
    * standard the plain linear trend lacks: the trend decays by φ=0.98
    * each step, so long-horizon forecasts flatten instead of running
    * off linearly (the M-competitions' default winner). Same proven
    * fold ↔ recursive-CTE pairing as [[holtForecast]]; every damping
    * multiply is written φ·trd FIRST then scaled, identically in both
    * engines, keeping the IEEE op sequence bit-equal. */
  def holtDamped(spark: SparkSession, sfDir: String): DataFrame = {
    val h1 = hourlyAvg(spark, sfDir)
    h1.groupBy(col("event_type"))
      .agg(array_sort(collect_list(struct(col("bucket"), col("v"))))
        .as("pts"))
      .where(size(col("pts")) >= 2)
      .select(col("event_type"), size(col("pts")).as("n"),
        expr(
          """aggregate(
            |  slice(pts, 3, greatest(size(pts) - 2, 0)),
            |  named_struct(
            |    'lvl', pts[0].v,
            |    'trd', CAST(pts[1].v - pts[0].v AS DOUBLE)),
            |  (acc, p) -> named_struct(
            |    'lvl', 0.1D * p.v + 0.9D * (acc.lvl + 0.98D * acc.trd),
            |    'trd', 0.01D * (0.1D * p.v
            |             + 0.9D * (acc.lvl + 0.98D * acc.trd) - acc.lvl)
            |           + 0.99D * (0.98D * acc.trd)),
            |  acc -> acc.lvl + 0.98D * acc.trd)""".stripMargin)
          .as("forecast"))
      .orderBy("event_type")
  }

  /** Graphite `holtWintersForecast` with DAILY seasonality — the full
    * triple (level + trend + 24-slot additive season) smoothing behind
    * graphite-web's aberration alerting (`render/functions.py —
    * holtWintersAnalysis` [U]; slot = position mod 24 over the ordered
    * series, α=0.1, β=0.01, γ=0.1). Seed: the first 24 points define
    * the season (y−mean, mean from the EXACT scaled-integer sum), level
    * = that mean, trend = 0; the fold consumes the rest, updating one
    * season slot per step via an index-matched transform. The state
    * array is 24 doubles — constant per series — and the whole
    * recursion is one codegen'd aggregate over the retention-bounded
    * sorted rollup array, no UDF. Output: the next-step forecast
    * lvl + trd + season[next slot]. Series need ≥ 25 points. */
  def holtWinters(spark: SparkSession, sfDir: String): DataFrame = {
    val h1 = hourlyAvg(spark, sfDir)
    val mean24 =
      """(CAST(aggregate(slice(pts, 1, 24), CAST(0 AS BIGINT),
        |  (a, p) -> a + CAST(CAST(p.v AS DECIMAL(18,4)) * 10000 AS BIGINT))
        |  AS DOUBLE) / 240000.0D)""".stripMargin
    val l2 =
      """(0.1D * (p.v - element_at(acc.season, acc.pos % 24 + 1))
        |  + 0.9D * (acc.lvl + acc.trd))""".stripMargin
    h1.groupBy(col("event_type"))
      .agg(array_sort(collect_list(struct(col("bucket"), col("v"))))
        .as("pts"))
      .where(size(col("pts")) >= 25)
      .select(col("event_type"),
        expr(
          s"""aggregate(
            |  slice(pts, 25, size(pts) - 24),
            |  named_struct(
            |    'lvl', $mean24,
            |    'trd', CAST(0.0 AS DOUBLE),
            |    'pos', 24,
            |    'season', transform(slice(pts, 1, 24), p -> p.v - $mean24)),
            |  (acc, p) -> named_struct(
            |    'lvl', $l2,
            |    'trd', 0.01D * ($l2 - acc.lvl) + 0.99D * acc.trd,
            |    'pos', acc.pos + 1,
            |    'season', transform(acc.season, (s, j) ->
            |      IF(j = acc.pos % 24,
            |         0.1D * (p.v - $l2) + 0.9D * s,
            |         s))),
            |  acc -> named_struct(
            |    'n', acc.pos,
            |    'fc', acc.lvl + acc.trd
            |            + element_at(acc.season, acc.pos % 24 + 1)))"""
            .stripMargin).as("s"))
      .select(col("event_type"), col("s.n").as("n"),
        col("s.fc").as("hw_forecast"))
      .orderBy("event_type")
  }

  /** LTTB DOWNSAMPLING (Largest-Triangle-Three-Buckets, Steinarsson
    * 2013) — the renderer's downsampler behind Graphite/Grafana-style
    * charts: keep the first and last point, and from each middle
    * 24-hour bucket the point forming the largest triangle with the
    * PREVIOUSLY SELECTED point and the NEXT bucket's average. The
    * selection is sequential per series (each pick feeds the next
    * bucket's triangle), so it runs as the proven sorted-fold /
    * recursive-CTE pair (the holt bit-equality class) — and every
    * triangle compare is EXACT: x in epoch minutes, y as the 1e4-
    * scaled rollup value, and the next-average fraction (Sy/c)
    * multiplied through by c, so 2·Area·c = |(pₓ·c − Sx)(qy − pᵧ) −
    * (pₓ − x)(Sy − c·pᵧ)| is pure BIGINT; argmax ties resolve to the
    * earliest point via first-position. One series-key shuffle; the
    * fold state is the selected list (≤ one point per bucket). */
  def lttb(spark: SparkSession, sfDir: String): DataFrame = {
    val h1 = hourlyAvg(spark, sfDir)
    val h2 = h1.select(col("event_type"),
      expr("unix_micros(bucket) div 60000000").as("x"),
      expr("CAST(floor(v * 10000.0D + 0.5) AS BIGINT)").as("qy"),
      expr("unix_micros(date_trunc('day', bucket)) div 86400000000")
        .as("di"))
    lttbSelect(h2)
  }

  /** [[lttb]] at COUNT-based buckets — the render-side form when the
    * target is a fixed output width (threshold ≈ points/24) rather
    * than calendar days: bucket index = (rank − 1) div 24 within each
    * series (rank over the unique x, so the grid is deterministic).
    * The selection fold is [[lttbSelect]] verbatim — only the bucket
    * key differs, exactly the downsample-contract split Steinarsson's
    * thesis describes (equal-COUNT buckets are the canonical form;
    * calendar buckets are the dashboard convenience). */
  def lttbCount(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h1 = hourlyAvg(spark, sfDir)
    val wR = Window.partitionBy(col("event_type")).orderBy(col("x"))
    val h2 = h1.select(col("event_type"),
      expr("unix_micros(bucket) div 60000000").as("x"),
      expr("CAST(floor(v * 10000.0D + 0.5) AS BIGINT)").as("qy"))
      .withColumn("rn", row_number().over(wR))
      .withColumn("di", expr("CAST((rn - 1) div 24 AS BIGINT)"))
      .drop("rn")
    lttbSelect(h2)
  }

  /** DuckDB oracle text for the LTTB family: PER-STEP EMIT form (r12)
    * — the recursion carries only the LAST selected point `lp` (the
    * only state the LTTB step reads) and each recursion ROW is an
    * emitted selection; the r11 form list_appended the whole selection
    * through the chain, O(B²) list copying per series as buckets B
    * grow past a calendar. Callers supply the h2 CTE (the bucket key
    * is the only difference between the calendar and count forms). */
  private def lttbOracleSql(h2Sql: String): String = {
    // the doubled-area-times-c list per candidate point of the
    // current middle bucket (identical text at every use site)
    val areas =
      """list_transform((a.days[r.k + 1]).pts, p -> abs(
        |      ((r.lp).x * (a.days[r.k + 2]).c
        |         - (a.days[r.k + 2]).sx)
        |        * (p.qy - (r.lp).qy)
        |      - ((r.lp).x - p.x)
        |        * ((a.days[r.k + 2]).sy
        |           - (a.days[r.k + 2]).c * (r.lp).qy)))"""
        .stripMargin
    val selPt = s"(a.days[r.k + 1]).pts[list_position($areas,\n" +
      s"      list_aggregate($areas, 'max'))]"
    s"""WITH RECURSIVE h1 AS (
      |  SELECT event_type, date_trunc('hour', ts) AS bucket,
      |         ${Det.avg4Sql("value")} AS v
      |  FROM events GROUP BY 1, 2),
      |$h2Sql
      |d0 AS (
      |  SELECT event_type, di,
      |         list(struct_pack(x := x, qy := qy)
      |           ORDER BY x NULLS FIRST) AS pts,
      |         CAST(sum(x) AS BIGINT) AS sx,
      |         CAST(sum(qy) AS BIGINT) AS sy,
      |         CAST(count(*) AS BIGINT) AS c
      |  FROM h2 GROUP BY 1, 2),
      |arr AS MATERIALIZED (
      |  SELECT event_type,
      |         list(struct_pack(di := di, pts := pts, sx := sx,
      |           sy := sy, c := c) ORDER BY di NULLS FIRST) AS days
      |  FROM d0 GROUP BY 1 HAVING count(*) >= 3),
      |rec AS (
      |  SELECT event_type, CAST(1 AS BIGINT) AS k,
      |         (days[1]).pts[1] AS lp
      |  FROM arr
      |  UNION ALL
      |  SELECT r.event_type, r.k + 1, $selPt AS lp
      |  FROM rec r JOIN arr a ON a.event_type = r.event_type
      |  WHERE r.k + 1 <= len(a.days) - 1),
      |fin AS (
      |  SELECT event_type, lp FROM rec
      |  UNION ALL
      |  SELECT r.event_type, (a.days[len(a.days)])
      |           .pts[len((a.days[len(a.days)]).pts)] AS lp
      |  FROM rec r JOIN arr a ON a.event_type = r.event_type
      |  WHERE r.k = len(a.days) - 1)
      |SELECT event_type, (lp).x AS x, CAST((lp).qy AS DOUBLE) / 10000.0 AS y
      |FROM fin
      |ORDER BY event_type NULLS FIRST, x NULLS FIRST""".stripMargin
  }

  /** The shared LTTB selection fold over a bucketed series
    * (event_type, x, qy, di): largest-triangle-three-buckets with the
    * next bucket's exact centroid as the third vertex, all areas in
    * exact BIGINT (doubled, times the next bucket's count to clear the
    * mean's division). */
  private def lttbSelect(h2: DataFrame): DataFrame = {
    val days = h2.groupBy(col("event_type"), col("di"))
      .agg(array_sort(collect_list(struct(col("x"), col("qy"))))
        .as("pts"),
        sum(col("x")).as("sx"), sum(col("qy")).as("sy"),
        count(lit(1)).as("c"))
      .groupBy(col("event_type"))
      .agg(array_sort(collect_list(struct(col("di"), col("pts"),
        col("sx"), col("sy"), col("c")))).as("days"))
      .where(size(col("days")) >= 3)
    // the exact doubled-area-times-c per candidate point p
    val areas =
      """transform(e.pts, p -> abs(
        |  (element_at(acc.sel, size(acc.sel)).x * e.nc - e.nsx)
        |    * (p.qy - element_at(acc.sel, size(acc.sel)).qy)
        |  - (element_at(acc.sel, size(acc.sel)).x - p.x)
        |    * (e.nsy - e.nc * element_at(acc.sel, size(acc.sel)).qy)))"""
        .stripMargin
    days.select(col("event_type"),
      expr(
        s"""aggregate(
          |  transform(sequence(2L, CAST(size(days) AS BIGINT) - 1L),
          |    k -> named_struct(
          |      'pts', element_at(days, CAST(k AS INT)).pts,
          |      'nsx', element_at(days, CAST(k AS INT) + 1).sx,
          |      'nsy', element_at(days, CAST(k AS INT) + 1).sy,
          |      'nc',  element_at(days, CAST(k AS INT) + 1).c)),
          |  named_struct('sel',
          |    array(element_at(element_at(days, 1).pts, 1))),
          |  (acc, e) -> named_struct('sel', concat(acc.sel, array(
          |    element_at(e.pts,
          |      CAST(array_position($areas, array_max($areas)) AS INT))))),
          |  acc -> concat(acc.sel, array(
          |    element_at(element_at(days, size(days)).pts,
          |      size(element_at(days, size(days)).pts)))))"""
          .stripMargin).as("sel"))
      .select(col("event_type"), explode(col("sel")).as("p"))
      .select(col("event_type"), col("p.x").as("x"),
        (col("p.qy").cast("double") / lit(10000.0)).as("y"))
      .orderBy("event_type", "x")
  }

  /** Graphite `aliasByNode(series, 1)` over the live-value read: every
    * series of the dotted namespace renamed to its service node, with
    * its LATEST value (the legend + current-value read behind every
    * dashboard's singlestat row). One per-series max_by pass; the alias
    * is a pure codegen projection ([[graft.catalog.MetricGlob
    * .aliasByNode]], previously helper-only). Last-write ties break on
    * the larger value exactly as [[rollupLast]]. */
  def aliasByNodeRead(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("metric", concat_ws(".", lit("app"), col("event_type"),
        concat(lit("host"), pmod(col("user_id"), lit(3)).cast("string"))))
      .groupBy(col("metric"))
      .agg(round(max_by(col("value"), struct(col("ts_ns"), col("value"))), 4)
        .as("current"))
      .select(graft.catalog.MetricGlob.aliasByNode(col("metric"), 1)
          .as("alias"),
        col("metric"), col("current"))
      .orderBy("alias", "metric")

  /** Graphite `weightedAverage(valueSeries, weightSeries, node)`: the
    * per-bucket Σ(v·w)/Σw read (`render/functions.py` [U]) — here value
    * weighted by the event's JSON `k` property (the weight series rides
    * the same rows, as when both series come from one dotted namespace).
    * The product accumulates as exact DECIMAL (value ≤4 decimals ×
    * integer weight), the weight sum as BIGINT, and the one division is
    * identical IEEE in both engines; a zero-weight bucket is null. One
    * aggregation pass, map-side partial. */
  def weightedAverage(spark: SparkSession, sfDir: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("long")
    Tables.events(spark, sfDir)
      .select(col("event_type"), date_trunc("hour", col("ts")).as("bucket"),
        col("value"), k.as("k"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(sum(col("k")).as("sum_w"),
        sum(col("value").cast("decimal(18,4)") * col("k")).as("swv"))
      .select(col("event_type"), col("bucket"), col("sum_w"),
        when(col("sum_w") > 0,
          Det.r4(col("swv").cast("double") / col("sum_w").cast("double")))
          .as("wavg"))
      .orderBy("event_type", "bucket")
  }

  /** Graphite `holtWintersConfidenceBands` / `Aberration` core
    * (`render/functions.py` [U]; daily seasonality omitted as in
    * [[holtForecast]]): the same level+trend fold extended with an EWMA
    * of absolute one-step residuals, emitting the next-step forecast
    * and ±3·dev confidence bands — the alerting read that flags a
    * series the moment it leaves its predicted envelope. All three
    * state fields advance from the PRE-update state, so the recursion
    * is expressible as the identical op sequence in the oracle's
    * recursive CTE. */
  def holtBands(spark: SparkSession, sfDir: String): DataFrame = {
    val h1 = hourlyAvg(spark, sfDir)
    h1.groupBy(col("event_type"))
      .agg(array_sort(collect_list(struct(col("bucket"), col("v"))))
        .as("pts"))
      // the seed reads pts[1] (ANSI throws on a 1-point series) and the
      // oracle's recursion seed joins rn=2 (dropping n<2 series) — the
      // same guard keeps both engines' row sets identical
      .where(size(col("pts")) >= 2)
      .select(col("event_type"), size(col("pts")).as("n"),
        expr(
          """aggregate(
            |  slice(pts, 3, greatest(size(pts) - 2, 0)),
            |  named_struct(
            |    'lvl', pts[0].v,
            |    'trd', CAST(pts[1].v - pts[0].v AS DOUBLE),
            |    'dev', CAST(0.0 AS DOUBLE)),
            |  (acc, p) -> named_struct(
            |    'lvl', 0.1D * p.v + 0.9D * (acc.lvl + acc.trd),
            |    'trd', 0.01D * (0.1D * p.v + 0.9D * (acc.lvl + acc.trd)
            |             - acc.lvl) + 0.99D * acc.trd,
            |    'dev', 0.1D * abs(p.v - (acc.lvl + acc.trd))
            |             + 0.9D * acc.dev),
            |  acc -> acc)""".stripMargin).as("s"))
      .select(col("event_type"), col("n"),
        (col("s.lvl") + col("s.trd")).as("forecast"),
        (col("s.lvl") + col("s.trd") - lit(3.0) * col("s.dev")).as("lo_band"),
        (col("s.lvl") + col("s.trd") + lit(3.0) * col("s.dev")).as("hi_band"))
      .orderBy("event_type")
  }

  /** Graphite `consolidateBy(series, 'max')`: the routed clamped fetch
    * (R4) with the read-time consolidation OVERRIDDEN to max — the
    * archive (and step) still follow the retention policy; only the
    * per-bucket aggregate changes
    * ([[graft.catalog.RollupRouter.fetch]] `consolidateBy`). */
  def consolidate(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.catalog.{AggMethod, RollupRouter, SchemaCatalog}
    val pts = Tables.events(spark, sfDir)
      .select(col("event_type").as("metric"), col("ts"), col("value"))
    RollupRouter.fetch(pts, SchemaCatalog.Default, col("metric") === "click",
      fromSecondsAgo = 20L * 86400, consolidateBy = Some(AggMethod.Max))
  }

  /** Graphite `exclude(app.*.*, 'host1')`: resolve the candidate set by
    * glob ([[graft.catalog.MetricGlob.predicate]] — the grep side), then
    * drop series matching the negative REGEX
    * ([[graft.catalog.MetricGlob.excludePredicate]]), and read the
    * survivors' hourly rollup. Both predicates are scan-side filters
    * (the glob's literal prefix pushes down); one shuffle on
    * (metric, bucket). */
  def excludeSeries(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.catalog.MetricGlob
    Tables.events(spark, sfDir)
      .withColumn("metric", concat_ws(".", lit("app"), col("event_type"),
        concat(lit("host"), pmod(col("user_id"), lit(3)).cast("string"))))
      .where(MetricGlob.predicate(col("metric"), "app.*.*") &&
        MetricGlob.excludePredicate(col("metric"), "host1"))
      .groupBy(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
      .agg(Det.avg4(col("value")).as("v"), count(lit(1)).as("n"))
      .orderBy("metric", "bucket")
  }

  /** Graphite `timeShift` comparison: each hourly bucket joined with the
    * same series' bucket 24h earlier (gap-safe: a JOIN on the shifted
    * key, not lag over a possibly-sparse sequence). */
  def timeshift(spark: SparkSession, sfDir: String): DataFrame = {
    val h1 = hourlyAvg(spark, sfDir)
    val prev = h1.select(col("event_type").as("e2"),
      (col("bucket") + expr("INTERVAL 24 HOURS")).as("b2"),
      col("v").as("v_prev"))
    h1.join(prev, col("event_type") === col("e2") &&
        col("bucket") === col("b2"), "left")
      .select(col("event_type"), col("bucket"), col("v"), col("v_prev"),
        Det.r4(col("v") - col("v_prev")).as("delta"))
      .orderBy("event_type", "bucket")
  }

  /** Graphite `asPercent(series, sumSeries(*))`: each series' share of
    * the per-bucket total, in percent — the composition read on every
    * capacity dashboard. The total is an exact DECIMAL window sum over
    * the already-rounded rollup values (5 series per bucket — a window
    * over the tiny rollup, never over raw). */
  def asPercent(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h1 = hourlyAvg(spark, sfDir)
    val w = Window.partitionBy(col("bucket"))
    h1.withColumn("total",
        sum(col("v").cast("decimal(18,4)")).over(w).cast("double"))
      .select(col("event_type"), col("bucket"), col("v"),
        Det.r4(col("v") * lit(100.0) / col("total")).as("pct"))
      .orderBy("event_type", "bucket")
  }

  /** Graphite `groupByNode(series, n, 'sum')`: aggregate series by one
    * dot-delimited node of the metric name (collapse per-host series to
    * per-service) — the fan-in read over a dotted namespace. The events
    * table has flat series names, so the dotted name is constructed
    * (`app.<type>.host<k>`) and then split/grouped exactly as
    * graphite-web does over real metric paths. */
  def groupByNode(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("metric", concat_ws(".", lit("app"), col("event_type"),
        concat(lit("host"), pmod(col("user_id"), lit(3)).cast("string"))))
      .groupBy(element_at(split(col("metric"), "\\."), 2).as("node"),
        date_trunc("hour", col("ts")).as("bucket"))
      .agg(Det.sum4(col("value")).as("v"), count(lit(1)).as("n"))
      .orderBy("node", "bucket")

  /** Graphite `currentAbove(series, 40)`: series whose LATEST rollup
    * value exceeds the threshold — the live-alert filter read. Same
    * per-series max_by pass as [[highestCurrent]], filtered instead of
    * top-k'd. */
  def currentAbove(spark: SparkSession, sfDir: String): DataFrame =
    hourlyAvg(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(max_by(struct(col("bucket"), col("v")), col("bucket")).as("m"))
      .select(col("event_type"), col("m.bucket").as("last_bucket"),
        col("m.v").as("current"))
      .where(col("current") > 40.0)
      .orderBy("event_type")

  /** Graphite `sortByMaxima`: series ordered by their peak rollup value
    * — "which series ever spiked highest". max over already-rounded
    * values is exact cross-engine. */
  def sortByMaxima(spark: SparkSession, sfDir: String): DataFrame =
    hourlyAvg(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(max(col("v")).as("peak"))
      .orderBy(col("peak").desc, col("event_type"))

  /** Graphite `stddevSeries(*)`: per-bucket stddev ACROSS series — the
    * fleet-spread read (is one host diverging?). Exact decimal Σv, Σv²
    * accumulation, then the same IEEE double formula both engines
    * (identical to [[anomaly]]'s discipline); buckets backed by a single
    * series are dropped (spread of one point is undefined). */
  def stddevSeries(spark: SparkSession, sfDir: String): DataFrame = {
    val h1 = hourlyAvg(spark, sfDir)
    val nd = col("n").cast("double")
    val s1 = col("s1d").cast("double")
    val s2 = col("s2d").cast("double")
    h1.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(18,8)")).as("s1d"),
        sum((col("v") * col("v")).cast("decimal(18,8)")).as("s2d"))
      .where(col("n") >= 2)
      .select(col("bucket"), col("n"),
        Det.r4(sqrt((s2 - (s1 * s1) / nd) / (nd - lit(1.0)))).as("sd"))
      .orderBy("bucket")
  }

  /** Graphite `movingAverage(series, "6h")` over the hourly rollup —
    * the single most-used smoothing read — restricted to FULL 6-bucket
    * frames; the frame sum is exact DECIMAL so the average is the same
    * IEEE division in any engine. */
  def movingAverage(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h1 = hourlyAvg(spark, sfDir)
    val wSeq = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    val wf = wSeq.rowsBetween(-5, 0)
    h1.withColumn("rn", row_number().over(wSeq))
      .withColumn("ma", Det.r4(
        sum(col("v").cast("decimal(18,4)")).over(wf).cast("double") /
          lit(6.0)))
      .where(col("rn") >= 6)
      .select(col("event_type"), col("bucket"), col("v"), col("ma"))
      .orderBy("event_type", "bucket")
  }

  /** Graphite `scale(series, k)` + `offset(series, k)`: the unit
    * conversion / baseline-shift transforms (bytes→MB, zero-centering) —
    * pure map-side expressions over the rollup. */
  def scaleOffset(spark: SparkSession, sfDir: String): DataFrame =
    hourlyAvg(spark, sfDir)
      .select(col("event_type"), col("bucket"), col("v"),
        Det.r4(col("v") * lit(0.125)).as("scaled"),
        Det.r4(col("v") + lit(100.0)).as("shifted"))
      .orderBy("event_type", "bucket")

  /** A composed RENDER PIPELINE — the graphite-web request
    * `asPercent(movingAverage(<glob>, "6h"))` end to end: routed
    * glob fetch (with the R4 window clamp) → per-series 6-bucket moving
    * average (full frames) → per-bucket percent-of-total. The whole
    * dashboard target is ONE Catalyst plan: one shuffle for the rollup,
    * two windows over the tiny aggregated series. */
  def dashboard(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.catalog.{RollupRouter, SchemaCatalog}
    import org.apache.spark.sql.expressions.Window
    val pts = Tables.events(spark, sfDir)
      .select(col("event_type").as("metric"), col("ts"), col("value"))
    val fetched = RollupRouter.fetchSeries(pts, SchemaCatalog.Default, "*",
      fromSecondsAgo = 20L * 86400)
    val wSeq = Window.partitionBy(col("metric")).orderBy(col("bucket"))
    val wf = wSeq.rowsBetween(-5, 0)
    val wb = Window.partitionBy(col("bucket"))
    fetched
      .withColumn("rn", row_number().over(wSeq))
      .withColumn("ma", Det.r4(
        sum(col("v").cast("decimal(18,4)")).over(wf).cast("double") /
          lit(6.0)))
      .where(col("rn") >= 6)
      .withColumn("total",
        sum(col("ma").cast("decimal(18,4)")).over(wb).cast("double"))
      .select(col("metric"), col("bucket"), col("ma"),
        Det.r4(col("ma") * lit(100.0) / col("total")).as("pct"))
      .orderBy("metric", "bucket")
  }

  /** BATCH sessionization (the batch twin of the streaming session
    * window, §2.3): per-user sessions split at >6h inactivity gaps via
    * lag + running sum — the standard gaps-and-islands form. One
    * shuffle on user_id serves both windows; total (ts, event_id)
    * order makes the session numbering engine-exact. */
  def sessionize(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, sfDir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("gap_us",
        expr("unix_micros(ts)") - expr("unix_micros(prev_ts)"))
      .withColumn("new_s",
        when(col("gap_us").isNull || col("gap_us") > 6L * 3600 * 1000000L,
          1L).otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(wRun))
      .groupBy(col("user_id"))
      .agg(max(col("sid")).as("n_sessions"), count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_sessions"), col("n_events"),
        Det.r4(col("n_events").cast("double") /
          col("n_sessions").cast("double")).as("events_per_session"))
      .orderBy("user_id")
  }

  /** SESSION CONVERSION — the outcome slice over [[sessionize]]'s gap
    * islands (same 6 h inactivity gap, same exact epoch-µs arithmetic):
    * each (user, session) reduces to event count, purchase flag and an
    * exact duration, then ONE summary row reports session conversion
    * rate, events per session and mean duration — every ratio an IEEE
    * division of exact integers under the shared rounding formula. The
    * window partitions on the user key; the summary aggregation sees
    * only session-grain rows. */
  def sessionConversion(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, sfDir)
      .withColumn("us", expr("unix_micros(ts)"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          col("us") - col("prev_us") > 6L * 3600 * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(wRun))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_ev"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"),
        expr("(max(us) - min(us)) div 1000000").as("dur_s"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("conv")).as("n_converted"),
        Det.r4(sum(col("conv")).cast("double") / count(lit(1)))
          .as("session_cvr"),
        Det.r4(sum(col("n_ev")).cast("double") / count(lit(1)))
          .as("events_per_session"),
        Det.r4(sum(col("dur_s")).cast("double") / count(lit(1)))
          .as("avg_dur_s"))
  }

  /** COHORT RETENTION — the third classic product-analytics read next
    * to [[sessionize]] and [[funnel]]: users cohort by first-seen day,
    * every later active day lands in (cohort, day_offset), the matrix
    * a retention curve is drawn from. Two aggregations sharing one
    * shuffle key (user_id): the cohort table is one row per user and
    * rides the active-days relation's partitioning; the final matrix
    * aggregate is partial before its (cohort, offset) exchange. */
  def cohortRetention(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // day-truncated TIMESTAMP (not DATE) keeps the output dtype
    // identical across engines; the offset is exact epoch-µs integer
    // arithmetic. The cohort comes from a window min over the deduped
    // active days — the distinct's user_id shuffle is REUSED by the
    // window (one exchange serves both), where a separate
    // first-day aggregate + join would scan and shuffle events twice.
    // After (user_id, d) dedup a user contributes one row per offset,
    // so the matrix count is count(*), not a distinct expand.
    val offset = expr("(unix_micros(d) - unix_micros(cohort)) div 86400000000L")
    Tables.events(spark, sfDir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("d"))
      .distinct()
      .withColumn("cohort",
        min(col("d")).over(Window.partitionBy(col("user_id"))))
      .where(offset <= 7L)
      .groupBy(col("cohort"), offset.as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort", "day_offset")
  }

  /** DAU/WAU STICKINESS — the standard engagement panel (daily actives
    * over trailing-7-day actives, the "how habitual is usage" ratio).
    * The trailing-window distinct is NOT a day×activity range join:
    * every active (user, day) row explodes map-side to the ≤7 panel
    * days it supports (`sequence` — bounded 7× fanout), then ONE
    * distinct-agg per panel day yields WAU beside DAU's per-day
    * distinct. The (user, day) grain checkpoints once and serves both
    * sides. Early panel days carry their honest truncated lookback.
    * At 100 TB: two distinct-agg shuffles keyed on day — never a
    * per-day 7-day self-join. */
  def dauStickiness(spark: SparkSession, sfDir: String): DataFrame = {
    val act = Tables.events(spark, sfDir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("d"))
      .distinct()
      .localCheckpoint(eager = false)
    val dau = act.groupBy(col("d"))
      .agg(countDistinct(col("user_id")).as("dau"))
    val wau = act
      .select(col("user_id"), explode(expr(
        "sequence(d, d + INTERVAL 6 DAYS, INTERVAL 1 DAY)")).as("panel_d"))
      .groupBy(col("panel_d"))
      .agg(countDistinct(col("user_id")).as("wau"))
    dau.join(wau, col("d") === col("panel_d"))
      .select(col("d"), col("dau"), col("wau"),
        Det.r4(col("dau").cast("double") / col("wau")).as("stickiness"))
      .orderBy("d")
  }

  /** NEW vs RETURNING actives — the growth split over the (user, day)
    * grain: each day's actives divide by whether that day is the user's
    * first-ever active day. One min-agg per user joined back on the
    * user key (two shuffles total at any scale, both on real keys);
    * the share is one shared-text IEEE division of exact counts. */
  def newVsReturning(spark: SparkSession, sfDir: String): DataFrame = {
    val act = Tables.events(spark, sfDir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("d"))
      .distinct()
      .localCheckpoint(eager = false)
    val first = act.groupBy(col("user_id")).agg(min(col("d")).as("first_d"))
    act.join(first, "user_id")
      .groupBy(col("d"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("d") === col("first_d"), 1L).otherwise(0L)).as("n_new"))
      .select(col("d"), col("n_active"), col("n_new"),
        (col("n_active") - col("n_new")).as("n_returning"),
        Det.r4(col("n_new").cast("double") / col("n_active")).as("new_share"))
      .orderBy("d")
  }

  /** POWER-USER CURVE — the engagement-shape histogram (how many users
    * were active exactly k distinct days): two exact count
    * aggregations, nothing else — the L28-style read beside
    * [[dauStickiness]]'s ratio panel. */
  def activityHistogram(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("d"))
      .distinct()
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_days"))
      .groupBy(col("n_days")).agg(count(lit(1)).as("n_users"))
      .orderBy("n_days")

  /** LAST-TOUCH ATTRIBUTION — the fourth product-analytics read next to
    * [[sessionize]]/[[funnel]]/[[cohortRetention]]: every purchase
    * attributes its value to the user's most recent PRIOR touch (click
    * or view); purchases with no prior touch land in the 'none' bucket.
    * One window over each user's ordered event stream does the whole
    * assignment (the LOCF ignoreNulls pattern with a strictly-before
    * frame — no self-join, no per-purchase subquery); the rollup is a
    * 3-row aggregate. At 100 TB the single user_id exchange is the
    * entire shuffle cost. */
  def attribution(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, sfDir)
      .where(col("event_type").isin("click", "view", "purchase"))
      .withColumn("touch",
        last(when(col("event_type").isin("click", "view"),
          col("event_type")), ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase")
      .select(coalesce(col("touch"), lit("none")).as("touch_type"),
        col("value"))
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_purchases"),
        Det.dsum4(col("value")).as("attributed_value"))
      .orderBy("touch_type")
  }

  /** SHAPLEY-VALUE ATTRIBUTION (Shapley 1953; the data-driven model
    * marketers run beside [[markovAttribution]]'s removal effect):
    * each channel's credit is its average marginal contribution over
    * all orderings of the channel set. EXACT end-to-end: with the
    * 4-channel alphabet the coalition lattice has 16 cells, the
    * coalition value v(S) = Σ_{T⊆S} conv(T) counts conversions of
    * users whose PRE-first-purchase touch SET is covered by S (the
    * markov journey cohort), and 24·φᵢ = Σ_{S∌i} |S|!·(3−|S|)! ·
    * (v(S∪i) − v(S)) is a BIGINT sum with integer weights {6,2,2,6} —
    * no factorial division ever happens in float. Distribution shape:
    * one user-key window pass + one mask aggregate (the corpus-sized
    * work), then every lattice step is a broadcast join over ≤ 16
    * rows (the ANN-codebook rule — the MODEL is small, the counting
    * is distributed). Only the reported share divides, as doubles of
    * exact BIGINTs with the shared rounding text. */
  def shapleyAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val marked = Tables.events(spark, sfDir)
      .withColumn("p_seen",
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
      .localCheckpoint(eager = false) // touch masks + converter set
    val touches = marked.where(col("p_seen") === 0L &&
        col("event_type").isin("click", "error", "signup", "view"))
      .select(col("user_id"),
        expr("CASE event_type WHEN 'click' THEN 1L WHEN 'error' THEN 2L " +
          "WHEN 'signup' THEN 4L ELSE 8L END").as("b"))
      .distinct()
      .groupBy(col("user_id")).agg(sum(col("b")).as("mask"))
    val conv = marked.where(col("event_type") === "purchase")
      .select(col("user_id")).distinct().withColumn("cvf", lit(1L))
    val grid = touches.join(conv, Seq("user_id"), "full")
      .na.fill(0L, Seq("mask", "cvf"))
      .groupBy(col("mask")).agg(sum(col("cvf")).as("conv_t"))
    val s16 = spark.range(16).select(col("id").as("smask"))
    val v = broadcast(s16)
      .join(grid, expr("(mask & smask) = mask"), "left")
      .groupBy(col("smask"))
      .agg(coalesce(sum(col("conv_t")), lit(0L)).as("v"))
      .localCheckpoint(eager = false) // both lattice sides below
    import spark.implicits._
    val chans = Seq(("click", 1L), ("error", 2L), ("signup", 4L),
      ("view", 8L)).toDF("channel", "cbit")
    val phi = broadcast(chans)
      .join(v, expr("(smask & cbit) = 0"))
      .join(v.select(col("smask").as("smask2"), col("v").as("v2")),
        expr("smask2 = smask + cbit"))
      .select(col("channel"),
        (expr("CASE bit_count(smask) WHEN 0 THEN 6L WHEN 1 THEN 2L " +
          "WHEN 2 THEN 2L ELSE 6L END") *
          (col("v2") - col("v"))).as("contrib"))
      .groupBy(col("channel")).agg(sum(col("contrib")).as("shap24"))
      .localCheckpoint(eager = false) // total + share read it twice
    phi.crossJoin(broadcast(phi.agg(sum(col("shap24")).as("tot"))))
      .select(col("channel"), col("shap24"),
        Det.r4(col("shap24").cast("double") / col("tot").cast("double"))
          .as("share"))
      .orderBy("channel")
  }

  /** STRATIFIED SHAPLEY ATTRIBUTION — [[shapleyAttribution]]'s exact
    * integer lattice PER CONVERSION WEEK (the ISO week of each
    * converter's FIRST purchase — both engines truncate weeks to
    * Monday): does a channel's credit drift across conversion
    * vintages — the windowed attribution read a growth team runs when
    * one week's mix shifts. Exactness of the stratification: v(S)
    * sums CONVERSIONS only (non-converters carry conv_t = 0 in the
    * global query too), so restricting each week's grid to that
    * week's converters loses nothing. Identical machinery with every
    * aggregate keyed by cohort: the corpus-sized work is still ONE
    * user-key window pass + one mask aggregate; the lattice is 16
    * cells × |weeks| (model-sized at any corpus scale, the
    * ANN-codebook rule), so every lattice join stays a broadcast. A
    * cohort whose total marginal mass is zero (all its converters had
    * empty pre-purchase touch sets) reports NULL shares in both
    * engines — the kruskal-wallis degenerate-input rule. */
  def shapleyByCohort(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val marked = Tables.events(spark, sfDir)
      .withColumn("p_seen",
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
      .localCheckpoint(eager = false) // masks + converters + cohorts
    val cohorts = marked.where(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cohort"))
    val touches = marked.where(col("p_seen") === 0L &&
        col("event_type").isin("click", "error", "signup", "view"))
      .select(col("user_id"),
        expr("CASE event_type WHEN 'click' THEN 1L WHEN 'error' THEN 2L " +
          "WHEN 'signup' THEN 4L ELSE 8L END").as("b"))
      .distinct()
      .groupBy(col("user_id")).agg(sum(col("b")).as("mask"))
    val conv = marked.where(col("event_type") === "purchase")
      .select(col("user_id")).distinct().withColumn("cvf", lit(1L))
    val grid = touches.join(conv, Seq("user_id"), "full")
      .na.fill(0L, Seq("mask", "cvf"))
      .join(cohorts, "user_id") // inner: keeps converters (conv_t > 0)
      .groupBy(col("cohort"), col("mask")).agg(sum(col("cvf")).as("conv_t"))
      .localCheckpoint(eager = false) // cohort list + the v aggregate
    val s16 = spark.range(16).select(col("id").as("smask"))
    val v = grid.select(col("cohort")).distinct()
      .crossJoin(broadcast(s16))
      .join(grid.select(col("cohort").as("g_cohort"), col("mask"),
        col("conv_t")),
        expr("g_cohort = cohort AND (mask & smask) = mask"), "left")
      .groupBy(col("cohort"), col("smask"))
      .agg(coalesce(sum(col("conv_t")), lit(0L)).as("v"))
      .localCheckpoint(eager = false) // both lattice sides below
    import spark.implicits._
    val chans = Seq(("click", 1L), ("error", 2L), ("signup", 4L),
      ("view", 8L)).toDF("channel", "cbit")
    val phi = v.join(broadcast(chans), expr("(smask & cbit) = 0"))
      .join(v.select(col("cohort").as("c2"), col("smask").as("smask2"),
        col("v").as("v2")),
        expr("c2 = cohort AND smask2 = smask + cbit"))
      .select(col("cohort"), col("channel"),
        (expr("CASE bit_count(smask) WHEN 0 THEN 6L WHEN 1 THEN 2L " +
          "WHEN 2 THEN 2L ELSE 6L END") *
          (col("v2") - col("v"))).as("contrib"))
      .groupBy(col("cohort"), col("channel"))
      .agg(sum(col("contrib")).as("shap24"))
      .localCheckpoint(eager = false) // total + share read it twice
    val tot = phi.groupBy(col("cohort")).agg(sum(col("shap24")).as("tot"))
    phi.join(broadcast(tot), "cohort")
      .select(col("cohort"), col("channel"), col("shap24"),
        when(col("tot") =!= 0L,
          Det.r4(col("shap24").cast("double") / col("tot").cast("double")))
          .otherwise(lit(null)).as("share"))
      .orderBy("cohort", "channel")
  }

  /** MARKOV-CHAIN ATTRIBUTION (removal effect — Anderl 2016's
    * data-driven model): build the first-order journey chain
    * start → touches → conv|null_end from each user's PRE-first-
    * purchase sequence, then score every channel by how much the
    * chain's start→conv reach probability drops when visits to that
    * channel are voided. The transition COUNTING is the distributed
    * part (one user-key window pass); the chain itself is MODEL-SIZED
    * (≤ 6×6 counts regardless of corpus — the ANN-codebook rule), so
    * the 24 power-iteration rounds run driver-side in exact Longs:
    * p′(s) = (Σₜ c(s,t)·p(t)) div r(s) at 10¹² scale — every round
    * floor-divides exactly like the DuckDB twin's unrolled CTEs
    * (the pagerank integer-rounds discipline; Σc·p bounded ~3·10¹⁸ at
    * 10⁵ users/transition — widen to BigInt past that). Shares are
    * one IEEE divide of the exact removal masses. */
  def markovAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scale = 1000000000000L
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val marked = Tables.events(spark, sfDir)
      .withColumn("p_seen",
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
      .localCheckpoint(eager = false) // touches + conversion sets
    val tch = marked.where(col("p_seen") === 0L)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("t"))
      .localCheckpoint(eager = false) // three consumers below
    val conv = marked
      .where(col("event_type") === "purchase" && col("p_seen") === 1L)
      .select(col("user_id")).distinct()
      .localCheckpoint(eager = false)
    val tr1 = tch
      .withColumn("s", coalesce(lag(col("t"), 1).over(w), lit("start")))
      .select(col("s"), col("t"))
    val lastT = tch.groupBy(col("user_id"))
      .agg(max_by(col("t"), struct(col("ts"), col("event_id"))).as("s"))
    val term = lastT.join(conv.withColumn("c", lit(1)),
        Seq("user_id"), "left")
      .select(col("s"),
        when(col("c").isNotNull, lit("conv")).otherwise(lit("null_end"))
          .as("t"))
    val ntc = conv.join(tch.select("user_id").distinct(),
        Seq("user_id"), "left_anti")
      .select(lit("start").as("s"), lit("conv").as("t"))
    val cnt = tr1.unionByName(term).unionByName(ntc)
      .groupBy(col("s"), col("t")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val rOut = cnt.groupBy(_._1).map { case (s, xs) =>
      s -> xs.map(_._3).sum }
    val states = (cnt.map(_._1) ++ cnt.map(_._2)).distinct.sorted
    val channels = Seq("click", "error", "signup", "view")
    val variants = "base" +: channels.map("no_" + _)
    def solve(masked: String): Long = {
      var p = states.map(s =>
        s -> (if (s == "conv") scale else 0L)).toMap
      for (_ <- 1 to 24) {
        p = states.map { s =>
          val v =
            if (s == "conv") scale
            else if (s == "null_end") 0L
            else if (s == masked) 0L
            else rOut.get(s).fold(0L) { r =>
              cnt.filter(_._1 == s).map { case (_, t, c) =>
                c * p(t) }.sum / r
            }
          s -> v
        }.toMap
      }
      p.getOrElse("start", 0L)
    }
    val pByV = variants.map { v =>
      v -> solve(if (v == "base") "" else v.stripPrefix("no_"))
    }
    val base = pByV.head._2
    val removals = pByV.map { case (v, p) =>
      (v, p, if (v == "base") 0L else math.max(base - p, 0L)) }
    val tot = removals.map(_._3).sum
    val rows = removals.map { case (v, p, rem) =>
      val share =
        if (v == "base" || tot == 0L) 0.0
        else math.floor(rem.toDouble / tot.toDouble * 10000.0 + 0.5) /
          10000.0
      (v, p, rem, share)
    }
    import spark.implicits._
    rows.toDF("variant", "p_conv12", "removal12", "share")
      .orderBy("variant")
  }

  /** MULTIWINDOW BURN-RATE alert — the SRE error-budget pattern: the
    * hourly error share vs the trailing-6h share (a RANGE frame over
    * epoch seconds, so missing hours genuinely widen the window instead
    * of silently stretching a row frame); a page fires when the short
    * window burns ≥1.5× the long one AND clears an absolute floor
    * (suppressing quiet-hour noise). All rates derive from exact integer
    * counts, divided once in IEEE with identical op text both engines. */
  def burnRate(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourly = Tables.events(spark, sfDir)
      .groupBy((expr("unix_micros(ts) div 3600000000L") * 3600L).as("hr_s"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("e"))
    val w6 = Window.orderBy(col("hr_s")).rangeBetween(-5L * 3600L, 0L)
    hourly
      .withColumn("n6", sum(col("n")).over(w6))
      .withColumn("e6", sum(col("e")).over(w6))
      .select(timestamp_seconds(col("hr_s")).as("bucket"),
        col("n"), col("e"),
        Det.r4(col("e").cast("double") / col("n")).as("rate_1h"),
        Det.r4(col("e6").cast("double") / col("n6")).as("rate_6h"),
        when(col("e6") > 0L, Det.r4((col("e").cast("double") / col("n")) /
          (col("e6").cast("double") / col("n6")))).as("burn"),
        when(col("e6") > 0L &&
            (col("e").cast("double") / col("n")) >
            lit(1.5) * (col("e6").cast("double") / col("n6")) &&
            (col("e").cast("double") / col("n")) >= lit(0.3), 1L)
          .otherwise(0L).as("page"))
      .orderBy("bucket")
  }

  /** Ordered conversion FUNNEL (view → click → purchase, each stage AT
    * OR AFTER the previous one's first hit — a same-timestamp event
    * converts): three conditional-min aggregations chained per user;
    * output is one summary row. */
  def funnel(spark: SparkSession, sfDir: String): DataFrame =
    funnelStages(spark, sfDir)._1

  /** Builds the funnel and ALSO returns the pre-checkpoint stage plans:
    * localCheckpoint cuts each stage's lineage so t1/t2 are not
    * recomputed by every consumer (six fact scans otherwise). eager =
    * false skips the checkpoint's own count job, but NOTE: under AQE,
    * toRdd at construction still materializes the stage shuffles — so
    * building this query runs (small) jobs; PlanSpec accepts that for
    * this one query. The checkpoint also hides the stage internals from
    * plan assertions (checkpoints truncate lineage), so specs inspect the
    * returned pre-checkpoint plans. */
  private[graft] def funnelStages(spark: SparkSession,
      sfDir: String): (DataFrame, Seq[DataFrame]) = {
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val t1Plan = e.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val t1 = t1Plan.localCheckpoint(eager = false)
    val t2Plan = e.join(t1, "user_id")
      .where(col("event_type") === "click" && col("ts") >= col("t_view"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
    val t2 = t2Plan.localCheckpoint(eager = false)
    val t3 = e.join(t2, "user_id")
      .where(col("event_type") === "purchase" && col("ts") >= col("t_click"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
    val out = t1.join(t2, Seq("user_id"), "left")
      .join(t3, Seq("user_id"), "left")
      .agg(count(col("t_view")).as("n_view"),
        count(col("t_click")).as("n_click_after"),
        count(col("t_purchase")).as("n_purchase_after"))
    (out, Seq(t1Plan, t2Plan, t3))
  }

  /** WINDOWED FUNNEL — [[funnel]] with per-stage conversion windows:
    * the click must land within 1 h of the first view and the
    * purchase within 24 h of that click (the product-analytics form
    * real funnels use — an unconstrained chain overcounts lazy
    * conversions). Same stage-checkpoint shape, purely timestamp
    * comparisons (exact in both engines, no interval arithmetic
    * dialect beyond the shared `+ INTERVAL`). */
  def funnelWindowed(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val t1 = e.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
      .localCheckpoint(eager = false)
    val t2 = e.join(t1, "user_id")
      .where(col("event_type") === "click" &&
        col("ts") >= col("t_view") &&
        col("ts") <= col("t_view") + expr("INTERVAL 1 HOUR"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
      .localCheckpoint(eager = false)
    val t3 = e.join(t2, "user_id")
      .where(col("event_type") === "purchase" &&
        col("ts") >= col("t_click") &&
        col("ts") <= col("t_click") + expr("INTERVAL 24 HOURS"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
    t1.join(t2, Seq("user_id"), "left")
      .join(t3, Seq("user_id"), "left")
      .agg(count(col("t_view")).as("n_view"),
        count(col("t_click")).as("n_click_1h"),
        count(col("t_purchase")).as("n_purchase_24h"))
  }

  /** `/metrics/find` over the dotted namespace (the KenshinFinder
    * browse/autocomplete read, [[graft.catalog.MetricGlob.findNodes]]):
    * glob `app.*` expands one node level against the distinct metric
    * names — leaf metrics under 2 nodes, branches above. The namespace
    * is constructed as in [[groupByNode]] (events metrics are flat). */
  def findMetrics(spark: SparkSession, sfDir: String): DataFrame = {
    val metrics = Tables.events(spark, sfDir)
      .select(concat_ws(".", lit("app"), col("event_type"),
        concat(lit("host"), pmod(col("user_id"), lit(3)).cast("string")))
        .as("metric"))
      .distinct()
    graft.catalog.MetricGlob.findNodes(metrics, "app.*")
  }

  /** Graphite `maxSeries` / `minSeries` / `averageSeries` fan-in
    * (`render/functions.py` [U]): per-bucket envelope across every
    * series of the hourly rollup — the capacity-dashboard companion to
    * [[sumSeries]]. max/min select already-rounded values (exact); the
    * cross-series average re-accumulates as exact DECIMAL then divides
    * once (the same IEEE division in both engines). */
  def maxMinAvgSeries(spark: SparkSession, sfDir: String): DataFrame =
    hourlyAvg(spark, sfDir)
      .groupBy(col("bucket"))
      .agg(max(col("v")).as("max_v"), min(col("v")).as("min_v"),
        Det.davg4(col("v")).as("avg_v"))
      .orderBy("bucket")

  /** Graphite `diffSeries(click, *)`: the designated series minus the
    * sum of every other series per bucket — the "everything else"
    * residual read. One SIGNED exact-DECIMAL accumulation (click
    * positive, the rest negated), so the difference is exact with no
    * float rounding step at all. */
  def diffSeries(spark: SparkSession, sfDir: String): DataFrame =
    hourlyAvg(spark, sfDir)
      .groupBy(col("bucket"))
      .agg(sum(when(col("event_type") === "click", col("v"))
          .otherwise(-col("v")).cast("decimal(18,4)"))
        .cast("double").as("diff_v"),
        count(lit(1)).as("n_series"))
      .orderBy("bucket")

  /** Graphite `aliasSub(seriesList, 'host(\d+)', 'srv$1')`: regex
    * rename of every matched metric — display-name surgery over the
    * namespace read (`render/functions.py — aliasSub` [U]). The rename
    * is a pure projection over the per-metric summary (one shuffle);
    * replacement-token dialects differ (Java `$1` vs RE2 `\1`) but the
    * pattern and the produced names are identical in both engines. */
  def aliasSub(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("metric", concat_ws(".", lit("app"), col("event_type"),
        concat(lit("host"), pmod(col("user_id"), lit(3)).cast("string"))))
      .groupBy(col("metric"))
      .agg(count(lit(1)).as("n"), Det.avg4(col("value")).as("v"))
      .select(regexp_replace(col("metric"), "host(\\d+)", "srv$1")
          .as("alias"),
        col("metric"), col("n"), col("v"))
      .orderBy("metric")

  /** Graphite `aliasByMetric(series)`: every series renamed to its
    * FINAL dotted node — the default short legend label
    * (`render/functions.py — aliasByMetric` [U]). One regex projection
    * over the per-metric summary; `[^.]+$` is the same token in both
    * engines' regex dialects. */
  def aliasByMetricRead(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("metric", concat_ws(".", lit("app"), col("event_type"),
        concat(lit("host"), pmod(col("user_id"), lit(3)).cast("string"))))
      .groupBy(col("metric"))
      .agg(count(lit(1)).as("n"), Det.avg4(col("value")).as("v"))
      .select(regexp_extract(col("metric"), "[^.]+$", 0).as("alias"),
        col("metric"), col("n"), col("v"))
      .orderBy("metric")

  /** Graphite `substr(seriesList, 1, 3)`: the legend trimmed to dotted
    * nodes [1, 3) — drop the shared namespace prefix so panels show
    * `login.host2`, not `app.login.host2`
    * (`render/functions.py — substr` [U]). Array slice + join — exact
    * string ops, one projection. */
  def substrNodes(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("metric", concat_ws(".", lit("app"), col("event_type"),
        concat(lit("host"), pmod(col("user_id"), lit(3)).cast("string"))))
      .groupBy(col("metric"))
      .agg(count(lit(1)).as("n"), Det.avg4(col("value")).as("v"))
      .select(concat_ws(".", slice(split(col("metric"), "\\."), 2, 2))
          .as("alias"),
        col("metric"), col("n"), col("v"))
      .orderBy("metric")

  /** Graphite `rangeOfSeries(*)`: per bucket, the spread between the
    * highest and lowest series on the hourly grid — the envelope-width
    * read behind capacity headroom panels. max/min over the
    * exactly-rounded per-series values, one IEEE subtraction. */
  def rangeOfSeries(spark: SparkSession, sfDir: String): DataFrame =
    hourlyAvg(spark, sfDir)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_series"),
        Det.r4(max(col("v")) - min(col("v"))).as("rng"))
      .orderBy("bucket")

  /** timeShift-COMPOSED dashboard: the week-over-week overlay panel —
    * per series and DAY, this week's average beside the value exactly 7
    * days earlier, with absolute and percent change (the composition of
    * [[dashboard]]'s panel read with [[timeshift]]'s gap-safe shifted
    * join; `render/functions.py — timeShift` [U]). The shift is a JOIN
    * on the shifted key (gap-safe, like [[timeshift]]); percent change
    * guards a zero baseline with nullif so both engines agree on NULL
    * rather than disagreeing on infinity formatting. */
  def dashboardShift(spark: SparkSession, sfDir: String): DataFrame = {
    val d1 = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("bucket"))
      .agg(Det.avg4(col("value")).as("v"))
    val prev = d1.select(col("event_type").as("e2"),
      (col("bucket") + expr("INTERVAL 7 DAYS")).as("b2"),
      col("v").as("v_prev"))
    d1.join(prev, col("event_type") === col("e2") &&
        col("bucket") === col("b2"), "left")
      .select(col("event_type"), col("bucket"), col("v"), col("v_prev"),
        Det.r4(col("v") - col("v_prev")).as("delta"),
        Det.r4(col("v") * lit(100.0) / nullif(col("v_prev"), lit(0.0)) -
          lit(100.0)).as("pct_change"))
      .orderBy("event_type", "bucket")
  }

  /** Graphite `applyByNode(series, 1, 'divideSeries(%.host0,
    * sumSeries(%.*))')`: for every node prefix, a DERIVED series
    * composed from the prefix's own members — here host0's share of
    * its node total, the "is one replica carrying the node" panel
    * (`render/functions.py — applyByNode` [U]). Distinct from
    * [[groupByNode]] (one aggregate per group): the template combines
    * MULTIPLE member series of the same prefix.
    *
    * Determinism: member values are exact 4-dp ([[Det.avg4]]), so both
    * the host0 pick and the node total accumulate as exact DECIMAL
    * before the single rounded IEEE division; an absent host0 or a
    * zero total yields NULL identically in both engines. Two partial
    * aggs, no window. */
  def applyByNode(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"), pmod(col("user_id"), lit(3)).as("host"),
        date_trunc("hour", col("ts")).as("bucket"))
      .agg(Det.avg4(col("value")).as("v"))
      .groupBy(concat(lit("app."), col("event_type")).as("node"),
        col("bucket"))
      .agg(sum(when(col("host") === 0, col("v").cast("decimal(18,4)")))
          .cast("double").as("host0_v"),
        Det.dsum4(col("v")).as("node_total"))
      .select(col("node"), col("bucket"), col("host0_v"), col("node_total"),
        Det.r4(col("host0_v") / nullif(col("node_total"), lit(0.0)))
          .as("host0_share"))
      .orderBy("node", "bucket")

  /** Graphite `constantLine(100)` beside the data: the flat reference
    * series rendered over the SAME x-range as the measured series —
    * the dashboard overlay behind every SLO line
    * (`render/functions.py — constantLine` [U]). One agg builds the
    * grid; both output series explode map-side from it (array+explode,
    * not a self-union — union children do not CSE, so the
    * union would execute the agg twice). */
  def constantLineRead(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(date_trunc("hour", col("ts")).as("bucket"))
      .agg(Det.avg4(col("value")).as("v"))
      .select(col("bucket"), explode(array(
        struct(lit("events.avg").as("series"), col("v").as("v")),
        struct(lit("constant(100)").as("series"),
          lit(100.0).as("v")))).as("s"))
      .select(col("s.series").as("series"), col("bucket"), col("s.v").as("v"))
      .orderBy("series", "bucket")

  /** Graphite `timeSlice(series, from, until)`: the gap-filled fetch
    * with values OUTSIDE the slice window blanked to null — distinct
    * from a WHERE, which would drop the rows; the series keeps its full
    * x-range for overlay rendering. Bounds derive from the grid's own
    * first bucket (+5d, +15d); the scalar min is a window over the tiny
    * dense grid, never over raw data. */
  def timeSlice(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    gapfill(spark, sfDir)
      .withColumn("lo", min(col("bucket")).over(Window.partitionBy()))
      .select(col("event_type"), col("bucket"),
        when(col("bucket") >= col("lo") + expr("INTERVAL 5 DAYS") &&
             col("bucket") < col("lo") + expr("INTERVAL 15 DAYS"),
          col("v")).as("v"))
      .orderBy("event_type", "bucket")
  }

  /** Graphite `hitcount(series, '1d')`: per-day total hits when the
    * series is a per-second rate — Σ (v · step) over the day's hourly
    * buckets. v·3600 is an exact DECIMAL product and the day total an
    * exact DECIMAL sum, so the output needs only the final cast. */
  def hitcount(spark: SparkSession, sfDir: String): DataFrame =
    hourlyAvg(spark, sfDir)
      .groupBy(col("event_type"), date_trunc("day", col("bucket")).as("day"))
      .agg(sum(col("v").cast("decimal(18,4)") * lit(3600))
        .cast("double").as("hits"),
        count(lit(1)).as("n_buckets"))
      .orderBy("event_type", "day")

  /** Graphite `offsetToZero(series)`: each series shifted so its own
    * minimum sits at zero — the shape-only comparison read. One window
    * min over the hourly rollup; the subtraction is a single IEEE op on
    * identical inputs, rounded with the shared formula. */
  def offsetToZero(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
    hourlyAvg(spark, sfDir)
      .withColumn("mn", min(col("v")).over(w))
      .select(col("event_type"), col("bucket"),
        Det.r4(col("v") - col("mn")).as("v"))
      .orderBy("event_type", "bucket")
  }

  /** Graphite `changed(series)`: 1 when a bucket's value differs from
    * the previous bucket's, else 0 — the deploy-marker read. The
    * comparison is between the engines' IDENTICAL rounded doubles, so
    * the flag is exact; the first bucket reports 0 (no predecessor). */
  def changedSeries(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    hourlyAvg(spark, sfDir)
      .withColumn("pv", lag(col("v"), 1).over(w))
      .select(col("event_type"), col("bucket"), col("v"),
        when(col("pv").isNotNull && col("v") =!= col("pv"), 1L)
          .otherwise(0L).as("chg"))
      .orderBy("event_type", "bucket")
  }

  /** Graphite `delay(series, 3)`: the series displaced 3 buckets
    * forward (lag over the rollup — the cheap alternative to
    * [[timeshift]]'s join when the bucket grid is dense enough). */
  def delaySeries(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    hourlyAvg(spark, sfDir)
      .select(col("event_type"), col("bucket"), col("v"),
        lag(col("v"), 3).over(w).as("v_delayed"))
      .orderBy("event_type", "bucket")
  }

  /** Graphite `mostDeviant(seriesList, 3)`: the 3 series with the
    * largest population variance — the "what moved" triage read. Exact
    * DECIMAL Σv, Σv² per series ([[stddevSeries]]'s discipline rotated
    * 90°: partitioned by series, not bucket), the identical IEEE
    * formula text in both engines, then a global top-3
    * (TakeOrderedAndProject — never a full sort; variance ties break on
    * the unique series name). */
  def mostDeviant(spark: SparkSession, sfDir: String): DataFrame = {
    val nd = col("n").cast("double")
    val s1 = col("s1d").cast("double")
    val s2 = col("s2d").cast("double")
    hourlyAvg(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(18,8)")).as("s1d"),
        sum((col("v") * col("v")).cast("decimal(18,8)")).as("s2d"))
      .where(col("n") >= 2)
      .select(col("event_type"), col("n"),
        Det.r4((s2 - (s1 * s1) / nd) / nd).as("variance"))
      .orderBy(col("variance").desc, col("event_type"))
      .limit(3)
  }

  /** Graphite `holtWintersAberration(series)`: per-bucket deviation
    * OUTSIDE the Holt confidence bands — the aberration alert itself
    * (`render/functions.py — holtWintersAberration` [U]). The
    * [[holtBands]] fold additionally materializes every intermediate
    * state (array_append — retention-bounded, never data-sized); each
    * consumed point scores against the one-step-ahead band of the
    * PRE-update state, and explode returns the per-bucket alert series.
    * Oracle: the recursive CTE already computes the same intermediate
    * rows — joining each state to the NEXT point with the identical
    * IEEE op text makes forecast/bands/aberration bit-exact (the
    * q_ts_holt_* technique). */
  def holtAberration(spark: SparkSession, sfDir: String): DataFrame = {
    val h1 = hourlyAvg(spark, sfDir)
    h1.groupBy(col("event_type"))
      .agg(array_sort(collect_list(struct(col("bucket"), col("v"))))
        .as("pts"))
      .where(size(col("pts")) >= 2)
      .select(col("event_type"),
        explode(expr(
          """aggregate(
            |  slice(pts, 3, greatest(size(pts) - 2, 0)),
            |  named_struct(
            |    'st', named_struct(
            |      'lvl', pts[0].v,
            |      'trd', CAST(pts[1].v - pts[0].v AS DOUBLE),
            |      'dev', CAST(0.0 AS DOUBLE)),
            |    'abr', CAST(array() AS ARRAY<STRUCT<bucket: TIMESTAMP,
            |      v: DOUBLE, fc: DOUBLE, lo_band: DOUBLE, hi_band: DOUBLE,
            |      aberration: DOUBLE>>)),
            |  (acc, p) -> named_struct(
            |    'st', named_struct(
            |      'lvl', 0.1D * p.v + 0.9D * (acc.st.lvl + acc.st.trd),
            |      'trd', 0.01D * (0.1D * p.v + 0.9D * (acc.st.lvl + acc.st.trd)
            |               - acc.st.lvl) + 0.99D * acc.st.trd,
            |      'dev', 0.1D * abs(p.v - (acc.st.lvl + acc.st.trd))
            |               + 0.9D * acc.st.dev),
            |    'abr', array_append(acc.abr, named_struct(
            |      'bucket', p.bucket,
            |      'v', p.v,
            |      'fc', acc.st.lvl + acc.st.trd,
            |      'lo_band', acc.st.lvl + acc.st.trd - 3.0D * acc.st.dev,
            |      'hi_band', acc.st.lvl + acc.st.trd + 3.0D * acc.st.dev,
            |      'aberration', CASE
            |        WHEN p.v > acc.st.lvl + acc.st.trd + 3.0D * acc.st.dev
            |        THEN p.v - (acc.st.lvl + acc.st.trd + 3.0D * acc.st.dev)
            |        WHEN p.v < acc.st.lvl + acc.st.trd - 3.0D * acc.st.dev
            |        THEN p.v - (acc.st.lvl + acc.st.trd - 3.0D * acc.st.dev)
            |        ELSE 0.0D END))),
            |  acc -> acc.abr)""".stripMargin)).as("p"))
      .select(col("event_type"), col("p.bucket").as("bucket"),
        col("p.v").as("v"), col("p.fc").as("fc"),
        col("p.lo_band").as("lo_band"), col("p.hi_band").as("hi_band"),
        col("p.aberration").as("aberration"))
      .orderBy("event_type", "bucket")
  }

  /** Holt forecast BACKTEST — the read that answers "can I trust this
    * alert rule": per-series mean absolute error, signed bias and
    * in-band coverage of the one-step-ahead Holt forecasts, aggregated
    * straight off [[holtAberration]]'s per-point surface. Every
    * per-point double is bit-identical cross-engine (the recursive-CTE
    * technique), so the error terms cast to exact DECIMAL(18,8)
    * identically and the aggregate stays oracle-checkable — the
    * sequential recursion composes into an exact aggregate. */
  def holtBacktest(spark: SparkSession, sfDir: String): DataFrame = {
    def s8(e: org.apache.spark.sql.Column) =
      sum(e.cast("decimal(18,8)")).cast("double")
    val nd = count(lit(1)).cast("double")
    holtAberration(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        Det.r4(s8(abs(col("v") - col("fc"))) / nd).as("mae"),
        Det.r4(s8(col("v") - col("fc")) / nd).as("bias"),
        sum(when(col("aberration") === 0.0, 1L).otherwise(0L))
          .as("n_in_band"))
      .orderBy("event_type")
  }

  /** MASE + sMAPE FORECAST-ACCURACY SCORES (Hyndman & Koehler 2006) —
    * the scale-free companions to [[holtBacktest]]'s MAE/bias: MASE
    * divides the forecast MAE by the one-step NAIVE forecast's MAE
    * (the M-competition standard; < 1 beats naive), sMAPE is the
    * symmetric percentage error. Determinism: |v−fc| and |v−v₋₁|
    * accumulate as exact DECIMAL(18,8) (the backtest discipline —
    * every per-point double is bit-identical by the holt CTE lemma,
    * so the decimal casts agree), and each per-point sMAPE RATIO is
    * floor-quantized at 1e8 and BIGINT-summed (the order-free-Σ rule
    * — a raw double Σ of ratios is addend-order-dependent). NULL on
    * degenerate series (constant ⇒ naive MAE 0). */
  def tsMase(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wo = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    val ab = holtAberration(spark, sfDir)
      .select(col("event_type"), col("bucket"), col("v"), col("fc"))
      .withColumn("vp", lag(col("v"), 1).over(wo))
      .where(col("vp").isNotNull)
    def s8(e: org.apache.spark.sql.Column) =
      sum(e.cast("decimal(18,8)")).cast("double")
    val smapeT = abs(col("v") - col("fc")) /
      ((abs(col("v")) + abs(col("fc"))) / lit(2.0))
    val g = ab.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        s8(abs(col("v") - col("fc"))).as("sae"),
        s8(abs(col("v") - col("vp"))).as("snaive"),
        sum(when(abs(col("v")) + abs(col("fc")) > lit(0.0),
          floor(smapeT * lit(100000000.0)).cast("long"))
          .otherwise(lit(0L))).as("smq"))
    g.select(col("event_type"), col("n"),
        when(col("snaive") > lit(0.0),
          Det.r4(col("sae") / col("snaive"))).otherwise(lit(null))
          .as("mase"),
        Det.r4(col("smq").cast("double") / lit(100000000.0) /
          col("n").cast("double")).as("smape"))
      .orderBy("event_type")
  }

  /** SPLIT-CONFORMAL PREDICTION INTERVALS (Vovk; Lei et al. 2018) on
    * the Holt one-step forecasts — the distribution-free calibration
    * read that answers "what band actually has 90 % coverage" where
    * [[holtAberration]]'s ±3·dev band is only heuristic: the first
    * ⌊0.7n⌋ buckets calibrate (q90 = the EXACT integer-rank
    * ⌈0.9·n_cal⌉-th |residual| under the (r, bucket) total order —
    * the nPercentile discipline, no interpolation), the rest test
    * (coverage = #{|resid| ≤ q90}/n_test). Every residual is a
    * bit-identical double (the holt recursive-CTE lemma), ranking
    * exact doubles is deterministic, and the counts are integers, so
    * the whole query stays oracle-checkable. Time-ordered split =
    * the honest forecasting protocol (no leakage). */
  def tsConformal(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ab = holtAberration(spark, sfDir)
      .select(col("event_type"), col("bucket"),
        abs(col("v") - col("fc")).as("r"))
    val wS = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    val wP = Window.partitionBy(col("event_type"))
    val tagged = ab
      .withColumn("rn", row_number().over(wS).cast("long"))
      .withColumn("n", count(lit(1)).over(wP))
      .withColumn("ncal", expr("(n * 7) div 10"))
      .localCheckpoint(eager = false) // calibration + test consumers
    val wR = Window.partitionBy(col("event_type"))
      .orderBy(col("r"), col("bucket"))
    val q = tagged.where(col("rn") <= col("ncal"))
      .withColumn("rrk", row_number().over(wR).cast("long"))
      .where(col("rrk") === expr("(9 * ncal + 9) div 10"))
      .select(col("event_type"), col("r").as("q90"))
    tagged.where(col("rn") > col("ncal"))
      .join(q, "event_type")
      .groupBy(col("event_type"), col("ncal"), col("q90"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("r") <= col("q90"), 1L).otherwise(0L))
          .as("n_covered"))
      .select(col("event_type"), col("ncal").as("n_cal"),
        col("n_test"), col("q90"), col("n_covered"),
        Det.r4(col("n_covered").cast("double") /
          col("n_test").cast("double")).as("coverage"))
      .orderBy("event_type")
  }

  /** ISOTONIC REGRESSION via POOL-ADJACENT-VIOLATORS — the calibration
    * curve beside [[tsConformal]]: the monotone-nondecreasing step
    * function of mean value vs hour-of-day per event type (the
    * classical reliability-calibration read; Robertson et al.'s PAV is
    * the exact L2 solution). NO ORACLE: the pooling DEPTH is
    * data-dependent (a recursion no fixed-round CTE unroll covers), so
    * it ships spec-gated against a driver PAV reference plus
    * monotonicity/pooled-mean properties — the ANN/sketch precedent.
    * Fully deterministic anyway: inputs are exact scaled-BIGINT sums
    * at the (type, hour) grain, block-mean comparisons cross-multiply
    * as BigInt (never a float), and fitted means use [[Det.avg4]]'s
    * half-up integer formula. Scale shape: the grid is bounded by the
    * clock (24 rows per type) — one aggregate shuffle, then a
    * per-group walk inside one task per type; never a row-grain sort.
    * Ties pool (prev mean ≥ next ⇒ merge) — fit values are identical
    * either way; the driver reference shares the rule. */
  def tsIsotonic(spark: SparkSession, sfDir: String): DataFrame = {
    val byX = Tables.events(spark, sfDir)
      .groupBy(col("event_type").as("g"),
        hour(col("ts")).cast("long").as("x"))
      .agg(count(lit(1)).as("w"),
        sum((col("value").cast("decimal(18,4)") * lit(10000L))
          .cast("long")).as("s"))
    pavFit(byX)
      .toDF("event_type", "x", "w", "y_mean", "y_fit")
      .orderBy("event_type", "x")
  }

  /** Shared PAV kernel behind [[tsIsotonic]] / [[tsConformalIso]]:
    * input (g, x, w, s) with s = Σ value·10⁴ as exact BIGINT at the
    * (g, x) grain; output one row per input point with its raw mean
    * and the monotone-nondecreasing L2 fit. Violator comparisons
    * cross-multiply as BigInt (never a float); fitted means use the
    * half-up integer formula. One aggregate shuffle upstream, then a
    * per-group stack walk inside one task per group. */
  private def pavFit(byX0: DataFrame): DataFrame = {
    val spark = byX0.sparkSession
    import spark.implicits._
    val byX = byX0.select(col("g"), col("x"), col("w"), col("s"))
      .as[(String, Long, Long, Long)]
      .repartition(col("g"))
      .sortWithinPartitions("g", "x")
    byX.mapPartitions { it =>
        val out = scala.collection.mutable
          .ArrayBuffer[(String, Long, Long, Double, Double)]()
        val buf = scala.collection.mutable
          .ArrayBuffer[(Long, Long, Long)]() // (x, w, s) of current group
        var cur: String = null
        def mean4(s: Long, w: Long): Double =
          Math.floorDiv(2L * s + w, 2L * w).toDouble / 10000.0
        def flush(): Unit = {
          if (cur != null && buf.nonEmpty) {
            val blocks = scala.collection.mutable
              .ArrayBuffer[(Long, Long, Int)]() // (w, s, span)
            buf.foreach { case (_, w, s) =>
              var bw = w; var bs = s; var bc = 1
              while (blocks.nonEmpty && {
                  val (pw, ps, _) = blocks.last
                  BigInt(ps) * bw >= BigInt(bs) * pw // violator → pool
                }) {
                val (pw, ps, pc) = blocks.remove(blocks.length - 1)
                bw += pw; bs += ps; bc += pc
              }
              blocks += ((bw, bs, bc))
            }
            var i = 0
            blocks.foreach { case (bw, bs, bc) =>
              val fit = mean4(bs, bw)
              (0 until bc).foreach { _ =>
                val (x, w, s) = buf(i)
                out += ((cur, x, w, mean4(s, w), fit))
                i += 1
              }
            }
            buf.clear()
          }
        }
        it.foreach { case (g, x, w, s) =>
          if (g != cur) { flush(); cur = g }
          buf += ((x, w, s))
        }
        flush()
        out.iterator
      }
      .toDF("g", "x", "w", "y_mean", "y_fit")
  }

  /** ENGLE–GRANGER COINTEGRATION test between paired hourly series —
    * the econometrics read the corr/granger pair can't answer: two
    * trending series can show high correlation with NO stable
    * relationship; cointegration asks whether a LINEAR COMBINATION
    * is stationary (Engle & Granger 1987). Step 1: OLS y ~ x from
    * exact quantized moments (ys = v·10⁴ BIGINTs, products in
    * DECIMAL(38,0)/HUGEINT). Step 2: residuals e_t through ONE shared
    * IEEE text. Step 3: the no-intercept Dickey–Fuller regression
    * Δe_t = ρ·e_{t−1}: every cross-product term (e₋₁·Δe, e₋₁², and
    * the ρ-dependent squared residual) is floor-quantized at 1e9 and
    * BIGINT-summed (order-free — raw double Σ over engine partitions
    * is addend-order-dependent), the quantization units cancelling in
    * ρ and the t-statistic. df_t ≲ −3 suggests cointegration. NULL
    * on degenerate spreads. */
  def tsCointegration(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h1 = hourlyAvg(spark, sfDir)
      .select(col("event_type"), col("bucket"),
        (col("v").cast("decimal(18,4)") * lit(10000L)).cast("long")
          .as("ys"))
      .localCheckpoint(eager = false) // both sides of the pair join
    val p = h1.select(col("event_type").as("ma"), col("bucket"),
        col("ys").as("xa"))
      .join(h1.select(col("event_type").as("mb"), col("bucket"),
        col("ys").as("yb")), "bucket")
      .where(col("ma") < col("mb"))
      .localCheckpoint(eager = false) // moments + residual passes
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val mo = p.groupBy(col("ma"), col("mb"))
      .agg(count(lit(1)).as("n"), sum(col("xa")).as("sx"),
        sum(col("yb")).as("sy"),
        sum(dec(col("xa")) * col("yb")).as("sxy"),
        sum(dec(col("xa")) * col("xa")).as("sxx"))
      .withColumn("bnum", dec(col("n")) * col("sxy") -
        dec(col("sx")) * col("sy"))
      .withColumn("bden", dec(col("n")) * col("sxx") -
        dec(col("sx")) * col("sx"))
    val beta = col("bnum").cast("double") / col("bden").cast("double")
    val alpha = (d(col("sy")) - beta * d(col("sx"))) / d(col("n"))
    // Degeneracy guard (ANSI): bden = 0 (constant x) would make beta
    // NaN and every downstream floor(...).cast("long") throw; route
    // such pairs through as exact zeros so the output guards below
    // produce the documented NULL row instead of a runtime error.
    val withE = p.join(broadcast(mo), Seq("ma", "mb"))
      .select(col("ma"), col("mb"), col("bucket"), col("bden"),
        when(col("bden") =!= lit(0),
          (d(col("yb")) - (alpha + beta * d(col("xa")))) / lit(10000.0))
          .otherwise(lit(0.0)).as("e"))
    val wL = Window.partitionBy(col("ma"), col("mb"))
      .orderBy(col("bucket"))
    val lagged = withE
      .withColumn("el", lag(col("e"), 1).over(wL))
      .where(col("el").isNotNull)
      .withColumn("de", col("e") - col("el"))
      .localCheckpoint(eager = false) // q1/q2 agg + rho-dependent q3
    val q12 = lagged.groupBy(col("ma"), col("mb"))
      .agg(count(lit(1)).as("t"),
        sum(floor(col("el") * col("de") * lit(1.0e9)).cast("long"))
          .as("q1s"),
        sum(floor(col("el") * col("el") * lit(1.0e9)).cast("long"))
          .as("q2s"))
    val rho = d(col("q1s")) / d(col("q2s"))
    val q3 = lagged.join(broadcast(q12), Seq("ma", "mb"))
      .withColumn("u", when(col("q2s") > 0L, col("de") -
        (d(col("q1s")) / d(col("q2s"))) * col("el"))
        .otherwise(lit(0.0))) // q2s = 0 ⇒ rho NaN ⇒ guard (NULL row)
      .groupBy(col("ma"), col("mb"), col("t"), col("bden"),
        col("q1s"), col("q2s"))
      .agg(sum(floor(col("u") * col("u") * lit(1.0e9)).cast("long"))
        .as("q3s"))
    q3.join(mo.select(col("ma"), col("mb"), col("bnum"),
        col("bden").as("bden2")), Seq("ma", "mb"))
      .select(col("ma"), col("mb"), col("t").as("n_diff"),
        when(col("bden2") > lit(0), Det.r4(
          col("bnum").cast("double") / col("bden2").cast("double")))
          .otherwise(lit(null)).as("beta"),
        when(col("q2s") > 0L, Det.r4(rho)).otherwise(lit(null))
          .as("rho"),
        when(col("q2s") > 0L && col("t") > 2L && col("q3s") > 0L,
          Det.r4(rho / sqrt((d(col("q3s")) / (d(col("t")) - lit(1.0))) /
            d(col("q2s")))))
          .otherwise(lit(null)).as("df_t"))
      .orderBy("ma", "mb")
  }

  /** LO–MACKINLAY VARIANCE-RATIO TEST per series (q = 6 hours) — the
    * random-walk diagnostic that reads the SIGN of the departure
    * where [[tsDickeyFuller]] only rejects: VR < 1 = mean-reverting
    * (6-hour variance grows slower than 6× hourly), VR > 1 =
    * trending/momentum. Fully integer: with Δ = y_T − y₀ the
    * mean-adjusted deviations multiply through by T to exact ints,
    * so VR = (Σ(T·dq − qΔ)²·T) / (nq·q·Σ(T·d₁ − Δ)²) is a pure
    * ratio of exact HUGEINT/DECIMAL(38,0) sums (overlapping q-diffs,
    * nq = T−q+1 windows), divided once with factors cast first;
    * z = (VR−1)/√(2(2q−1)(q−1)/(3qT)) under homoscedastic RW. */
  def tsVarianceRatio(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = 6
    val wL = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    val x = hourlyAvg(spark, sfDir)
      .select(col("event_type"), col("bucket"),
        (col("v").cast("decimal(18,4)") * lit(10000L)).cast("long")
          .as("ys"))
      .withColumn("d1", col("ys") - lag(col("ys"), 1).over(wL))
      .withColumn("dq", col("ys") - lag(col("ys"), q).over(wL))
      .localCheckpoint(eager = false) // extent + deviation passes
    val ext = x.groupBy(col("event_type"))
      .agg(sum(when(col("d1").isNotNull, 1L).otherwise(0L)).as("t"),
        sum(when(col("dq").isNotNull, 1L).otherwise(0L)).as("nq"),
        sum(col("d1")).as("delta")) // Σd1 telescopes to y_T − y_0
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val s = x.join(broadcast(ext), Seq("event_type"))
      .groupBy(col("event_type"), col("t"), col("nq"))
      .agg(
        sum(when(col("d1").isNotNull, {
          val e = col("t") * col("d1") - col("delta")
          dec(e) * e
        }).otherwise(lit(0).cast("decimal(38,0)"))).as("s1"),
        sum(when(col("dq").isNotNull, {
          val e = col("t") * col("dq") - lit(q.toLong) * col("delta")
          dec(e) * e
        }).otherwise(lit(0).cast("decimal(38,0)"))).as("sq"))
    val vr = (col("sq").cast("double") * d(col("t"))) /
      (d(col("nq")) * lit(q.toDouble) * col("s1").cast("double"))
    val z = (vr - lit(1.0)) /
      sqrt(lit(2.0 * (2 * q - 1) * (q - 1) / (3.0 * q)) / d(col("t")))
    s.select(col("event_type"), col("t"), col("nq"),
        when(col("s1") > lit(0), Det.r4(vr)).otherwise(lit(null))
          .as("vr"),
        when(col("s1") > lit(0) && col("t") > 0L, Det.r4(z))
          .otherwise(lit(null)).as("z"))
      .orderBy("event_type")
  }

  /** DICKEY–FULLER UNIT-ROOT TEST per series (with intercept) — is
    * each series mean-reverting or a random walk? The stationarity
    * read behind every forecasting-model choice, and
    * [[tsCointegration]]'s single-series companion (EG step 2 runs
    * this regression on RESIDUALS; here it runs on the series
    * itself). Regression Δy_t = a + ρ·y_{t−1}: BOTH regressor and
    * response are EXACT integers in ys = v·10⁴ units, so all four
    * moments are exact BIGINT/HUGEINT sums and ρ = (TΣxy − ΣxΣy) /
    * (TΣxx − Σx²) is a ratio of exact integers. Residuals ride the
    * shared IEEE text; Σu² floor-quantizes at unit grain (u² is in
    * ys² units — integer-part precision is 1e-12 relative) and
    * BIGINT-sums order-free; t = ρ/√(s²T/(TΣxx − Σx²)), units
    * cancelling. t ≲ −2.9 rejects the unit root at 5 %. */
  def tsDickeyFuller(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wL = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    val x = hourlyAvg(spark, sfDir)
      .select(col("event_type"), col("bucket"),
        (col("v").cast("decimal(18,4)") * lit(10000L)).cast("long")
          .as("ys"))
      .withColumn("yl", lag(col("ys"), 1).over(wL))
      .where(col("yl").isNotNull)
      .select(col("event_type"), col("bucket"), col("yl").as("xv"),
        (col("ys") - col("yl")).as("yv"))
      .localCheckpoint(eager = false) // moments + residual passes
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val mo = x.groupBy(col("event_type"))
      .agg(count(lit(1)).as("t"), sum(col("xv")).as("sx"),
        sum(col("yv")).as("sy"),
        sum(dec(col("xv")) * col("yv")).as("sxy"),
        sum(dec(col("xv")) * col("xv")).as("sxx"))
      .withColumn("rnum", dec(col("t")) * col("sxy") -
        dec(col("sx")) * col("sy"))
      .withColumn("rden", dec(col("t")) * col("sxx") -
        dec(col("sx")) * col("sx"))
    val rho = col("rnum").cast("double") / col("rden").cast("double")
    val aTxt = (d(col("sy")) - rho * d(col("sx"))) / d(col("t"))
    val su2 = x.join(broadcast(mo), Seq("event_type"))
      .withColumn("u", when(col("rden") =!= lit(0),
        d(col("yv")) - (aTxt + rho * d(col("xv"))))
        .otherwise(lit(0.0))) // rden = 0 ⇒ rho NaN ⇒ guard (NULL row)
      .groupBy(col("event_type"), col("t"), col("rnum"), col("rden"))
      .agg(sum(floor(col("u") * col("u")).cast("long")).as("su2"))
    su2.select(col("event_type"), col("t").as("n_diff"),
        when(col("rden") > lit(0), Det.r4(rho)).otherwise(lit(null))
          .as("rho"),
        when(col("rden") > lit(0) && col("t") > 2L && col("su2") > 0L,
          Det.r4(rho / sqrt((d(col("su2")) / (d(col("t")) - lit(2.0))) *
            d(col("t")) / col("rden").cast("double"))))
          .otherwise(lit(null)).as("df_t"))
      .orderBy("event_type")
  }

  /** AUGMENTED DICKEY–FULLER (one lagged difference, intercept) per
    * series — [[tsDickeyFuller]]'s published production form (Said &
    * Dickey 1984): serial correlation in Δy biases the plain DF test,
    * so the regression Δy_t = a + ρ·y_{t−1} + φ·Δy_{t−1} soaks up the
    * AR(1) structure before reading ρ. Exact by the established
    * discipline: regressors x = y_{t−1}, z = Δy_{t−1} and response
    * y = Δy_t are EXACT integers in ys = v·10⁴ units; the two-variable
    * OLS solves from n-scaled CENTERED moments S̃ab = n·Σab − Σa·Σb
    * (each an exact DECIMAL(38,0)/HUGEINT product of BIGINT sums,
    * bounded ≈ n²·ys² ≈ 8e16 at a 720-bucket calendar, their pairwise
    * products ≈ 7e33 — inside 38 digits with a 10⁴× margin):
    * ρ = (S̃zz·S̃xy − S̃xz·S̃zy)/D, φ = (S̃xx·S̃zy − S̃xz·S̃xy)/D with
    * D = S̃xx·S̃zz − S̃xz² ≥ 0 (Cauchy–Schwarz). Residuals ride ONE
    * shared IEEE text (each decimal→double cast is correctly rounded
    * in both engines), Σu² floor-quantizes at unit grain, and the
    * t-statistic is adf_t = ρ / √((Σu²/(n−3)) · n·S̃zz / D) — the
    * standard errors' centered-inverse form, Var(ρ̂) = σ²·szz/(sxx·szz
    * − sxz²) written in n-scaled sums. adf_t ≲ −2.9 rejects the unit
    * root at 5%. Degenerate series (D = 0, collinear or constant
    * regressors) route through exact zeros to NULL outputs — the
    * [[tsDickeyFuller]] ANSI guard discipline. One narrow shuffle to
    * series grain then window lags — the per-series recursion shape
    * that survives any corpus size (cost is calendar-bounded). */
  def tsAdf(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wL = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    val x = hourlyAvg(spark, sfDir)
      .select(col("event_type"), col("bucket"),
        (col("v").cast("decimal(18,4)") * lit(10000L)).cast("long")
          .as("ys"))
      .withColumn("l1", lag(col("ys"), 1).over(wL))
      .withColumn("l2", lag(col("ys"), 2).over(wL))
      .where(col("l2").isNotNull)
      .select(col("event_type"),
        col("l1").as("xv"),                      // y_{t-1}
        (col("l1") - col("l2")).as("zv"),        // lag Δy
        (col("ys") - col("l1")).as("yv"))        // Δy_t
      .localCheckpoint(eager = false) // moments + residual passes
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val mo = x.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("xv")).as("sx"),
        sum(col("zv")).as("sz"), sum(col("yv")).as("sy"),
        sum(dec(col("xv")) * col("xv")).as("sxx"),
        sum(dec(col("zv")) * col("zv")).as("szz"),
        sum(dec(col("xv")) * col("zv")).as("sxz"),
        sum(dec(col("xv")) * col("yv")).as("sxy"),
        sum(dec(col("zv")) * col("yv")).as("szy"))
      .withColumn("cxx", dec(col("n")) * col("sxx") -
        dec(col("sx")) * col("sx"))
      .withColumn("czz", dec(col("n")) * col("szz") -
        dec(col("sz")) * col("sz"))
      .withColumn("cxz", dec(col("n")) * col("sxz") -
        dec(col("sx")) * col("sz"))
      .withColumn("cxy", dec(col("n")) * col("sxy") -
        dec(col("sx")) * col("sy"))
      .withColumn("czy", dec(col("n")) * col("szy") -
        dec(col("sz")) * col("sy"))
      .withColumn("det", col("cxx") * col("czz") - col("cxz") * col("cxz"))
      .withColumn("rnum", col("czz") * col("cxy") - col("cxz") * col("czy"))
      .withColumn("pnum", col("cxx") * col("czy") - col("cxz") * col("cxy"))
    val rho = d(col("rnum")) / d(col("det"))
    val phi = d(col("pnum")) / d(col("det"))
    val aTxt = (d(col("sy")) - rho * d(col("sx")) - phi * d(col("sz"))) /
      d(col("n"))
    val su2 = x.join(broadcast(mo), Seq("event_type"))
      .withColumn("u", when(col("det") > lit(0),
        d(col("yv")) - (aTxt + rho * d(col("xv")) + phi * d(col("zv"))))
        .otherwise(lit(0.0))) // det = 0 ⇒ rho NaN ⇒ guard (NULL row)
      .groupBy(col("event_type"), col("n"), col("czz"), col("rnum"),
        col("pnum"), col("det"))
      .agg(sum(floor(col("u") * col("u")).cast("long")).as("su2"))
    su2.select(col("event_type"), col("n").as("n_eff"),
        when(col("det") > lit(0), Det.r4(rho)).otherwise(lit(null))
          .as("rho"),
        when(col("det") > lit(0), Det.r4(phi)).otherwise(lit(null))
          .as("phi"),
        when(col("det") > lit(0) && col("n") > 3L && col("su2") > 0L,
          Det.r4(rho / sqrt((d(col("su2")) / (d(col("n")) - lit(3.0))) *
            d(col("n")) * d(col("czz")) / d(col("det")))))
          .otherwise(lit(null)).as("adf_t"))
      .orderBy("event_type")
  }

  /** COX–STUART TREND TEST per series (Cox & Stuart 1955) — the sign
    * test's trend form, the quickest distribution-free "is it
    * trending" read beside [[mannKendall]] (which weighs ALL pairs;
    * this pairs each point with its half-series partner, trading power
    * for O(n) work and an exact binomial null). Pair y_i with
    * y_{i+⌈n/2⌉}, count S+ = #(later > earlier), S− = #(<), drop
    * ties; under H0 S+ ~ Bin(m, ½), and the continuity-corrected
    * normal z multiplies through to exact integers:
    * z = sign(2S+−m)·(|2S+−m|−1)/√m. Everything before the final √ is
    * integer; the pair join is a self-join at half-offset index —
    * series-grain windows, embarrassingly parallel. NULL when m = 0
    * or the correction crosses zero (|2S+−m| ≤ 1 → z = 0 region). */
  def tsCoxStuart(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val wSeq = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    val wAll = Window.partitionBy(col("event_type"))
    val x = hourlyAvg(spark, sfDir)
      .withColumn("i", row_number().over(wSeq).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("h", expr("(n + 1) div 2")) // ceil(n/2), integer div
      .localCheckpoint(eager = false) // both sides of the offset join
    val a = x.select(col("event_type"), col("i"), col("v"), col("h"))
    val b = x.select(col("event_type"), (col("i") - col("h")).as("i"),
      col("v").as("v2"))
    a.join(b, Seq("event_type", "i"))
      .groupBy(col("event_type"))
      .agg(sum(when(col("v2") > col("v"), 1L).otherwise(0L)).as("s_plus"),
        sum(when(col("v2") < col("v"), 1L).otherwise(0L)).as("s_minus"))
      .withColumn("m", col("s_plus") + col("s_minus"))
      .select(col("event_type"), col("m"), col("s_plus"), col("s_minus"),
        when(col("m") > 0L, Det.r4(
          when(col("s_plus") * 2L > col("m"),
            (d(col("s_plus") * 2L - col("m")) - lit(1.0)) /
              sqrt(d(col("m"))))
            .when(col("s_plus") * 2L < col("m"),
              (d(col("s_plus") * 2L - col("m")) + lit(1.0)) /
                sqrt(d(col("m"))))
            .otherwise(lit(0.0))))
          .otherwise(lit(null)).as("z"))
      .orderBy("event_type")
  }

  /** KPSS TREND-STATIONARITY TEST per series — [[tsKpss]]'s τ form:
    * the null is stationarity AROUND A LINEAR TREND, the right read
    * for metrics with genuine drift (the level form rejects any
    * trending series even when detrended noise is stationary).
    * Residuals come from the exact-moment OLS y ~ a + b·t (the
    * [[linearRegression]] machinery: B = nΣty − ΣtΣy, D = nΣt² −
    * (Σt)², both exact DECIMAL(38,0)); u_t rides ONE shared IEEE text
    * and then floor-quantizes at unit grain in ys units (the [[tsPhillipsPerron]]
    * residual discipline — n·D·u_t would be exact but its partial-sum
    * SQUARES overflow 38 digits at a 720-bucket calendar), so partial
    * sums and both variance terms are exact BIGINT/DECIMAL in U²
    * units, cancelling in η = Σ S_t² / (n·Σ U_t²) — and the Bartlett
    * l = 4 variant exactly as the level form. η_τ above ~0.146
    * rejects trend-stationarity at 5%. */
  def tsKpssTrend(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wSeq = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    val wCum = wSeq.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val y = hourlyAvg(spark, sfDir)
      .select(col("event_type"), col("bucket"),
        (col("v").cast("decimal(18,4)") * lit(10000L)).cast("long")
          .as("ys"))
      .withColumn("t", row_number().over(wSeq).cast("long"))
      .localCheckpoint(eager = false) // moments + residual passes
    val mo = y.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("t")).as("st"),
        sum(col("ys")).as("sy"),
        sum(dec(col("t")) * col("ys")).as("sty"),
        sum(dec(col("t")) * col("t")).as("stt"))
      .withColumn("bnum", dec(col("n")) * col("sty") -
        dec(col("st")) * col("sy"))
      .withColumn("bden", dec(col("n")) * col("stt") -
        dec(col("st")) * col("st"))
    val slope = d(col("bnum")) / d(col("bden"))
    val aTxt = (d(col("sy")) - slope * d(col("st"))) / d(col("n"))
    val uq = y.join(broadcast(mo), Seq("event_type"))
      .withColumn("u", when(col("bden") > lit(0),
        d(col("ys")) - (aTxt + slope * d(col("t"))))
        .otherwise(lit(0.0)))
      .withColumn("uq", floor(col("u")).cast("long"))
      .localCheckpoint(eager = false) // cumsum + autocovariance passes
    val lagged = uq
      .withColumn("ns", sum(col("uq")).over(wCum))
      .withColumn("e1", lag(col("uq"), 1).over(wSeq))
      .withColumn("e2", lag(col("uq"), 2).over(wSeq))
      .withColumn("e3", lag(col("uq"), 3).over(wSeq))
      .withColumn("e4", lag(col("uq"), 4).over(wSeq))
    def g(c: org.apache.spark.sql.Column) =
      sum(when(c.isNotNull, dec(col("uq")) * c).otherwise(lit(0)))
    val s = lagged.groupBy(col("event_type"), col("n"), col("bden"))
      .agg(sum(dec(col("ns")) * col("ns")).as("sns2"),
        sum(dec(col("uq")) * col("uq")).as("g0"),
        g(col("e1")).as("g1"), g(col("e2")).as("g2"),
        g(col("e3")).as("g3"), g(col("e4")).as("g4"))
      .withColumn("lrv5", col("g0") * 5 + (col("g1") * 4 + col("g2") * 3 +
        col("g3") * 2 + col("g4")) * 2)
    s.select(col("event_type"), col("n"),
        when(col("bden") > lit(0) && col("g0") > lit(0),
          Det.r4(d(col("sns2")) / (d(col("n")) * d(col("g0")))))
          .otherwise(lit(null)).as("eta_0"),
        when(col("bden") > lit(0) && col("lrv5") > lit(0),
          Det.r4(lit(5.0) * d(col("sns2")) /
            (d(col("n")) * d(col("lrv5")))))
          .otherwise(lit(null)).as("eta_4"))
      .orderBy("event_type")
  }

  /** PHILLIPS–PERRON UNIT-ROOT TEST per series (Phillips & Perron
    * 1988, with intercept, Bartlett l = 4) — the third member of the
    * unit-root protocol beside [[tsAdf]] (parametric lag augmentation)
    * and [[tsKpss]] (the reversed null): the SAME simple Dickey–Fuller
    * regression, but the t-statistic is corrected NONPARAMETRICALLY
    * for serial correlation through the long-run variance. Oracle-
    * exact throughout: the regression moments are [[tsDickeyFuller]]'s
    * exact integers; residual autocovariances quantize as
    * G_j = Σ floor(u_t·u_{t−j}) (floor has no rounding-mode dialect —
    * exact BIGINTs once u rides the shared IEEE text), the ×5n-scaled
    * long-run variance L5 = 5·G0 + 2·Σ_{j=1..4}(5−j)·G_j is a pure
    * integer, and Z_t = √(γ̂0/λ̂²)·t_ρ − (λ̂²−γ̂0)·n·se(ρ̂)/(2·√λ̂²·s²)
    * (Hamilton 17.6.12, case 2) is ONE shared IEEE expression over
    * exact-count doubles (only *, /, √ — no libm). Degenerate series
    * route through exact zeros to NULL (the ANSI guard discipline). */
  def tsPhillipsPerron(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wL = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    val x = hourlyAvg(spark, sfDir)
      .select(col("event_type"), col("bucket"),
        (col("v").cast("decimal(18,4)") * lit(10000L)).cast("long")
          .as("ys"))
      .withColumn("yl", lag(col("ys"), 1).over(wL))
      .where(col("yl").isNotNull)
      .select(col("event_type"), col("bucket"), col("yl").as("xv"),
        (col("ys") - col("yl")).as("yv"))
      .localCheckpoint(eager = false) // moments + residual passes
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val mo = x.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("xv")).as("sx"),
        sum(col("yv")).as("sy"),
        sum(dec(col("xv")) * col("yv")).as("sxy"),
        sum(dec(col("xv")) * col("xv")).as("sxx"))
      .withColumn("rnum", dec(col("n")) * col("sxy") -
        dec(col("sx")) * col("sy"))
      .withColumn("rden", dec(col("n")) * col("sxx") -
        dec(col("sx")) * col("sx"))
    val rho = d(col("rnum")) / d(col("rden"))
    val aTxt = (d(col("sy")) - rho * d(col("sx"))) / d(col("n"))
    val withU = x.join(broadcast(mo), Seq("event_type"))
      .withColumn("u", when(col("rden") =!= lit(0),
        d(col("yv")) - (aTxt + rho * d(col("xv"))))
        .otherwise(lit(0.0)))
      .withColumn("u1", lag(col("u"), 1).over(wL))
      .withColumn("u2", lag(col("u"), 2).over(wL))
      .withColumn("u3", lag(col("u"), 3).over(wL))
      .withColumn("u4", lag(col("u"), 4).over(wL))
    def gj(c: org.apache.spark.sql.Column) =
      sum(when(c.isNotNull, floor(col("u") * c).cast("long"))
        .otherwise(0L))
    val g = withU.groupBy(col("event_type"), col("n"), col("rnum"),
        col("rden"))
      .agg(sum(floor(col("u") * col("u")).cast("long")).as("g0"),
        gj(col("u1")).as("g1"), gj(col("u2")).as("g2"),
        gj(col("u3")).as("g3"), gj(col("u4")).as("g4"))
      .withColumn("l5", col("g0") * 5L +
        (col("g1") * 4L + col("g2") * 3L + col("g3") * 2L + col("g4")) *
          2L)
    val lam2 = d(col("l5")) / (lit(5.0) * d(col("n")))
    val gam0 = d(col("g0")) / d(col("n"))
    val s2 = d(col("g0")) / (d(col("n")) - lit(2.0))
    val se = sqrt(s2 * d(col("n")) / d(col("rden")))
    val tr = rho / se
    g.select(col("event_type"), col("n").as("n_diff"),
        when(col("rden") > lit(0), Det.r4(rho)).otherwise(lit(null))
          .as("rho"),
        when(col("rden") > lit(0) && col("n") > 2L && col("g0") > 0L &&
          col("l5") > 0L,
          Det.r4(sqrt(gam0 / lam2) * tr -
            (lam2 - gam0) * d(col("n")) * se /
              (lit(2.0) * sqrt(lam2) * s2)))
          .otherwise(lit(null)).as("z_t"))
      .orderBy("event_type")
  }

  /** KPSS STATIONARITY TEST per series (Kwiatkowski–Phillips–Schmidt–
    * Shin 1992, level form) — [[tsAdf]]'s complementary read: ADF's
    * null is a unit root, KPSS's null is stationarity, and quoting
    * both is the standard practice (agreeing tests settle the
    * question; disagreeing ones flag near-integration). Fully
    * integer-exact at every step: with E_t = n·y_t − Σy (the n-scaled
    * demeaned series — exact BIGINTs in ys units) and partial sums
    * NS_t = Σ_{i≤t} E_i, the statistic η = Σ S_t² / (n²·s²) becomes a
    * PURE INTEGER ratio for both variance estimators — the lag-0
    * (iid) variant η₀ = Σ NS_t² / (n·Σ E_t²) and the published
    * Bartlett long-run variant with l = 4 lags, multiplied through by
    * (l+1) = 5: η₄ = 5·Σ NS_t² / (n·(5·γ̃₀ + 2·Σ_{j=1..4}(5−j)·γ̃_j)),
    * γ̃_j = Σ_t E_t·E_{t−j} — every accumulator DECIMAL(38,0) (bound
    * ≈ 3e25 at a 720-bucket calendar), ONE IEEE division each. η
    * above ~0.463 rejects level-stationarity at 5%. Lag windows over
    * the per-series calendar — the bounded-window shape. NULL on a
    * degenerate (constant) series. */
  def tsKpss(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wL = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    val wCum = wL.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val y = hourlyAvg(spark, sfDir)
      .select(col("event_type"), col("bucket"),
        (col("v").cast("decimal(18,4)") * lit(10000L)).cast("long")
          .as("ys"))
    val tot = y.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("ys")).as("sy"))
    val e = y.join(broadcast(tot), "event_type")
      .select(col("event_type"), col("bucket"), col("n"),
        (col("n") * col("ys") - col("sy")).as("et"))
      .localCheckpoint(eager = false) // cumsum + autocovariance passes
    val lagged = e
      .withColumn("ns", sum(col("et")).over(wCum))
      .withColumn("e1", lag(col("et"), 1).over(wL))
      .withColumn("e2", lag(col("et"), 2).over(wL))
      .withColumn("e3", lag(col("et"), 3).over(wL))
      .withColumn("e4", lag(col("et"), 4).over(wL))
    def g(c: org.apache.spark.sql.Column) =
      sum(when(c.isNotNull, dec(col("et")) * c).otherwise(lit(0)))
    val s = lagged.groupBy(col("event_type"), col("n"))
      .agg(sum(dec(col("ns")) * col("ns")).as("sns2"),
        sum(dec(col("et")) * col("et")).as("g0"),
        g(col("e1")).as("g1"), g(col("e2")).as("g2"),
        g(col("e3")).as("g3"), g(col("e4")).as("g4"))
      .withColumn("lrv5", col("g0") * 5 + (col("g1") * 4 + col("g2") * 3 +
        col("g3") * 2 + col("g4")) * 2)
    s.select(col("event_type"), col("n"),
        when(col("g0") > lit(0),
          Det.r4(d(col("sns2")) / (d(col("n")) * d(col("g0")))))
          .otherwise(lit(null)).as("eta_0"),
        when(col("lrv5") > lit(0),
          Det.r4(lit(5.0) * d(col("sns2")) /
            (d(col("n")) * d(col("lrv5")))))
          .otherwise(lit(null)).as("eta_4"))
      .orderBy("event_type")
  }

  /** BARTELS' RANK VON NEUMANN RATIO test per series (Bartels 1982) —
    * the rank-based randomness test that completes the runs-test/
    * Ljung–Box pair: serial dependence in RANKS (robust to any
    * monotone marginal). With doubled midranks M_t = 2·rank_min +
    * ties − 1 (the kruskal discipline — exact integers under ties)
    * the ×4-scaled statistic is a pure integer ratio:
    * RVN = Σ_{t<n}(M_t − M_{t+1})² / Σ(M_t − (n+1))² — the doubled
    * mean M̄ = n+1 EXACTLY since ΣM = n(n+1). Under randomness
    * RVN ≈ 2; z = (RVN − 2)·√n / 2 (the published asymptotic). One
    * IEEE division + one sqrt. Sequential lag over the per-series
    * calendar; rank windows at series grain. */
  def tsBartelsRvn(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wSeq = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val y = hourlyAvg(spark, sfDir)
    val ranked = y
      .withColumn("rk", rank().over(Window.partitionBy(col("event_type"))
        .orderBy(col("v"))).cast("long"))
      .withColumn("ties", count(lit(1)).over(Window
        .partitionBy(col("event_type"), col("v"))))
      .withColumn("m", lit(2L) * col("rk") + col("ties") - lit(1L))
      .withColumn("n", count(lit(1)).over(Window
        .partitionBy(col("event_type"))))
      .withColumn("m1", lead(col("m"), 1).over(wSeq))
    val s = ranked.groupBy(col("event_type"), col("n"))
      .agg(sum(when(col("m1").isNotNull,
          dec(col("m") - col("m1")) * (col("m") - col("m1")))
          .otherwise(lit(0))).as("num"),
        sum(dec(col("m") - col("n") - lit(1L)) *
          (col("m") - col("n") - lit(1L))).as("den"))
    val rvn = d(col("num")) / d(col("den"))
    s.select(col("event_type"), col("n"),
        when(col("den") > lit(0), Det.r4(rvn)).otherwise(lit(null))
          .as("rvn"),
        when(col("den") > lit(0),
          Det.r4((rvn - lit(2.0)) * sqrt(d(col("n"))) / lit(2.0)))
          .otherwise(lit(null)).as("z"))
      .orderBy("event_type")
  }

  /** GRUBBS' MAX-STUDENTIZED-DEVIATE per series — the parametric
    * outlier read beside the MAD/Tukey robust pair: how many sample
    * standard deviations does the most extreme hourly value sit from
    * the mean (Grubbs 1950)? G > ~3 at these n flags a genuine
    * outlier under normality; comparing G_max vs G_min says WHICH
    * tail. Oracle-exact via the linreg quantization: ys = v·10⁴ is
    * an exact BIGINT (v lives on the avg4 1e-4 grid), all moments
    * are integer sums (n·Σys² in DECIMAL(38,0)/HUGEINT), and G is
    * one shared IEEE expression — (n·ymax − sy) stays integer, the
    * sample sd takes one exact sqrt. NULL on n < 3 or zero
    * variance. */
  def tsGrubbs(spark: SparkSession, sfDir: String): DataFrame = {
    val x = hourlyAvg(spark, sfDir)
      .select(col("event_type"),
        (col("v").cast("decimal(18,4)") * lit(10000L)).cast("long")
          .as("ys"))
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val s = x.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("ys")).as("sy"),
        sum(dec(col("ys")) * col("ys")).as("syy"),
        max(col("ys")).as("ymax"), min(col("ys")).as("ymin"))
    val vnum = dec(col("n")) * col("syy") - dec(col("sy")) * col("sy")
    val sd = sqrt(vnum.cast("double") /
      (d(col("n")) * (d(col("n")) - lit(1.0)))) / lit(10000.0)
    def g(num: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (d(num) / (d(col("n")) * lit(10000.0))) / sd
    s.select(col("event_type"), col("n"),
        Det.r4(d(col("ymax")) / lit(10000.0)).as("vmax"),
        Det.r4(d(col("ymin")) / lit(10000.0)).as("vmin"),
        when(col("n") >= 3L && vnum > lit(0),
          Det.r4(g(col("n") * col("ymax") - col("sy"))))
          .otherwise(lit(null)).as("g_max"),
        when(col("n") >= 3L && vnum > lit(0),
          Det.r4(g(col("sy") - col("n") * col("ymin"))))
          .otherwise(lit(null)).as("g_min"))
      .orderBy("event_type")
  }

  /** HOEFFDING'S D independence test between paired hourly series —
    * the nonparametric test that catches NON-MONOTONE dependence
    * (a U-shaped load/error relationship) where the whole
    * corr/spearman/kendall ladder reads ≈ 0 (Hoeffding 1948). Ranks
    * use the STRICT (value, bucket) total order (the engine's
    * established tie-break; ranks are then a permutation and the
    * classical no-ties formula is exact):
    * D = 30·((n−2)(n−3)D₁ + D₂ − 2(n−2)D₃) / (n…(n−4)) with
    * D₁ = ΣQᵢ(Qᵢ−1), D₂ = Σ(Rᵢ−1)(Rᵢ−2)(Sᵢ−1)(Sᵢ−2),
    * D₃ = Σ(Rᵢ−2)(Sᵢ−2)Qᵢ, Qᵢ = #{j : Rⱼ < Rᵢ ∧ Sⱼ < Sᵢ} — ALL
    * exact integers (DECIMAL(38,0)/HUGEINT accumulators), one double
    * division with denominator factors cast first. Qᵢ comes from a
    * per-pair self-join at BUCKET grain — bounded by the calendar
    * span squared, independent of row count, so the shape survives
    * 100× data. NULL below n = 5. */
  def tsHoeffding(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h1 = hourlyAvg(spark, sfDir)
      .localCheckpoint(eager = false) // both sides of the pair join
    val a = h1.select(col("event_type").as("ma"), col("bucket"),
      col("v").as("va"))
    val b = h1.select(col("event_type").as("mb"), col("bucket"),
      col("v").as("vb"))
    val wx = Window.partitionBy(col("ma"), col("mb"))
      .orderBy(col("va"), col("bucket"))
    val wy = Window.partitionBy(col("ma"), col("mb"))
      .orderBy(col("vb"), col("bucket"))
    val ranked = a.join(b, "bucket").where(col("ma") < col("mb"))
      .withColumn("r", row_number().over(wx).cast("long"))
      .withColumn("s", row_number().over(wy).cast("long"))
      .select(col("ma"), col("mb"), col("r"), col("s"))
      .localCheckpoint(eager = false) // both sides of the Q join
    val j = ranked.select(col("ma"), col("mb"), col("r").as("rj"),
      col("s").as("sj"))
    val q = ranked.as("i")
      .join(j.as("jj"),
        col("i.ma") === col("jj.ma") && col("i.mb") === col("jj.mb") &&
          col("jj.rj") < col("i.r") && col("jj.sj") < col("i.s"),
        "left")
      .groupBy(col("i.ma").as("ma"), col("i.mb").as("mb"),
        col("i.r").as("r"), col("i.s").as("s"))
      .agg(count(col("jj.rj")).as("qn"))
    def dec(e: org.apache.spark.sql.Column) = e.cast("decimal(38,0)")
    val st = q.groupBy(col("ma"), col("mb"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("qn")) * (col("qn") - lit(1L))).as("d1"),
        sum(dec((col("r") - lit(1L)) * (col("r") - lit(2L))) *
          ((col("s") - lit(1L)) * (col("s") - lit(2L)))).as("d2"),
        sum(dec(col("r") - lit(2L)) * (col("s") - lit(2L)) *
          col("qn")).as("d3"))
    def d(e: org.apache.spark.sql.Column) = e.cast("double")
    val num = dec((col("n") - lit(2L)) * (col("n") - lit(3L))) *
      col("d1") + col("d2") -
      lit(2) * dec(col("n") - lit(2L)) * col("d3")
    val den = d(col("n")) * (d(col("n")) - lit(1.0)) *
      (d(col("n")) - lit(2.0)) * (d(col("n")) - lit(3.0)) *
      (d(col("n")) - lit(4.0))
    st.select(col("ma"), col("mb"), col("n"),
        when(col("n") >= 5L,
          Det.r4(lit(30.0) * num.cast("double") / den))
          .otherwise(lit(null)).as("d"))
      .orderBy("ma", "mb")
  }

  /** FANO DISPERSION INDEX + BURSTINESS of event arrivals — the
    * point-process read the anomaly family lacked: is each type's
    * hourly arrival process Poisson-like (VMR ≈ 1), regular (< 1) or
    * bursty (> 1)? Counts come from the COMPLETE hourly spine
    * (empty hours count as 0 — dispersion over a gappy grid lies),
    * VMR = s²/x̄ reduces to the exact-integer ratio
    * (n·Σc² − (Σc)²) / ((n−1)·Σc) (DECIMAL(38,0)/HUGEINT products,
    * one double division), and burstiness B = (σ−μ)/(σ+μ)
    * (Goh & Barabási 2008) rides one IEEE sqrt of the same exact
    * integers — fully ORACLE-CHECKABLE. One count aggregate + a
    * types × spine grid, all bounded by calendar span. */
  def tsFano(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val c = ev.groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("bucket"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = false) // types + grid join
    val ext = ev.agg(date_trunc("hour", min(col("ts"))).as("lo"),
      date_trunc("hour", max(col("ts"))).as("hi"))
    val spine = ext.select(explode(
      expr("sequence(lo, hi, interval 1 hour)")).as("bucket"))
    val grid = c.select(col("event_type")).distinct()
      .crossJoin(spine)
      .join(c, Seq("event_type", "bucket"), "left")
      .na.fill(0L, Seq("c"))
    val s = grid.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"),
        sum(col("c") * col("c")).as("sc2"))
    def dd(x: org.apache.spark.sql.Column) = x.cast("double")
    def dec(x: org.apache.spark.sql.Column) = x.cast("decimal(38,0)")
    val num = dec(col("n")) * col("sc2") - dec(col("sc")) * col("sc")
    val den = dec(col("n") - lit(1L)) * col("sc")
    val mean = dd(col("sc")) / dd(col("n"))
    val sigma = sqrt(num.cast("double") /
      (dd(col("n")) * (dd(col("n")) - lit(1.0))))
    s.select(col("event_type"), col("n").as("n_buckets"),
        col("sc").as("n_events"),
        Det.r4(mean).as("mean_rate"),
        when(den > lit(0),
          Det.r4(num.cast("double") / den.cast("double")))
          .otherwise(lit(null)).as("vmr"),
        when(col("sc") > 0L && col("n") > 1L,
          Det.r4((sigma - mean) / (sigma + mean)))
          .otherwise(lit(null)).as("burstiness"))
      .orderBy("event_type")
  }

  /** LOCALLY-ADAPTIVE (Mondrian-style) SPLIT CONFORMAL — the
    * [[tsConformal]] ∘ [[tsIsotonic]] compose: instead of one fixed
    * q90 band per series, the band width varies with hour-of-day
    * through σ(h) = the PAV-isotonic fit of mean |residual| vs hour
    * on the CALIBRATION split (monotone difficulty — the classical
    * normalized-nonconformity construction, Papadopoulos et al.
    * 2002/Lei et al. 2018 §5.2). Calibration rows score
    * sₙ = r/σ(h); q90ₙ is the EXACT integer-rank ⌈0.9·m⌉-th sₙ
    * under the (sₙ, bucket) total order; a test row is covered iff
    * r ≤ q90ₙ·σ(h), with unseen test hours falling back to the
    * per-type max σ (conservative). Spec-gated NO-ORACLE — the PAV
    * pooling depth is data-dependent (the q_ts_isotonic precedent) —
    * against a full independent driver reference. Deterministic:
    * residuals are bit-identical doubles (holt CTE lemma), σ comes
    * from exact-integer PAV, and the rank selection is exact. Scale:
    * everything is per-type windows + a 24-row-per-type broadcast
    * join; no global sort, no driver collect. */
  def tsConformalIso(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ab = holtAberration(spark, sfDir)
      .select(col("event_type"), col("bucket"),
        abs(col("v") - col("fc")).as("r"))
    val wS = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    val wP = Window.partitionBy(col("event_type"))
    val tagged = ab
      .withColumn("rn", row_number().over(wS).cast("long"))
      .withColumn("n", count(lit(1)).over(wP))
      .withColumn("ncal", expr("(n * 7) div 10"))
      .withColumn("hx", hour(col("bucket")).cast("long"))
      .localCheckpoint(eager = false) // calibration + test consumers
    val cal = tagged.where(col("rn") <= col("ncal"))
    val byX = cal.groupBy(col("event_type").as("g"), col("hx").as("x"))
      .agg(count(lit(1)).as("w"),
        sum((col("r").cast("decimal(18,4)") * lit(10000L))
          .cast("long")).as("s"))
    val sigma = pavFit(byX)
      .select(col("g").as("event_type"), col("x").as("hx"),
        col("y_fit").as("sigma"))
      .localCheckpoint(eager = false) // cal-join, test-join, smax
    val smax = sigma.groupBy(col("event_type"))
      .agg(max(col("sigma")).as("smax"))
    val calN = cal.join(broadcast(sigma), Seq("event_type", "hx"))
      .where(col("sigma") > 0.0)
      .withColumn("sn", col("r") / col("sigma"))
    val wR = Window.partitionBy(col("event_type"))
      .orderBy(col("sn"), col("bucket"))
    val q = calN
      .withColumn("rrk", row_number().over(wR).cast("long"))
      .withColumn("m", count(lit(1)).over(wP))
      .where(col("rrk") === expr("(9 * m + 9) div 10"))
      .select(col("event_type"), col("m").as("n_cal_used"),
        col("sn").as("q90n"))
    tagged.where(col("rn") > col("ncal"))
      .join(broadcast(sigma), Seq("event_type", "hx"), "left")
      .join(broadcast(smax), Seq("event_type"))
      .withColumn("sg", when(col("sigma") > 0.0, col("sigma"))
        .otherwise(col("smax"))) // sigma NULL (unseen hour) OR <= 0
        // (zero-width band) both take the conservative smax fallback
      .join(broadcast(q), Seq("event_type"))
      .groupBy(col("event_type"), col("ncal"), col("n_cal_used"),
        col("q90n"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("r") <= col("q90n") * col("sg"), 1L)
          .otherwise(0L)).as("n_covered"))
      .select(col("event_type"), col("ncal").as("n_cal"),
        col("n_cal_used"), col("n_test"),
        Det.r4(col("q90n")).as("q90n"), col("n_covered"),
        Det.r4(col("n_covered").cast("double") /
          col("n_test").cast("double")).as("coverage"))
      .orderBy("event_type")
  }

  /** Graphite `movingSum` / `movingMin` / `movingMax` over the hourly
    * rollup, full 6-bucket frames only (the [[movingAverage]]
    * discipline): the frame sum accumulates as exact DECIMAL; min/max
    * SELECT already-rounded values, so all three are engine-exact. */
  def movingWindow(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h1 = hourlyAvg(spark, sfDir)
    val wSeq = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    val wf = wSeq.rowsBetween(-5, 0)
    h1.withColumn("rn", row_number().over(wSeq))
      .withColumn("msum",
        sum(col("v").cast("decimal(18,4)")).over(wf).cast("double"))
      .withColumn("mmin", min(col("v")).over(wf))
      .withColumn("mmax", max(col("v")).over(wf))
      .where(col("rn") >= 6)
      .select(col("event_type"), col("bucket"), col("v"),
        col("msum"), col("mmin"), col("mmax"))
      .orderBy("event_type", "bucket")
  }

  /** Graphite `stdev(series, 6)`: moving POPULATION stddev over the
    * trailing 6 buckets — the local-volatility read behind dynamic
    * alert thresholds. Σv and Σv² accumulate as exact DECIMAL window
    * sums inside the frame ([[anomaly]]'s discipline, framed); the
    * variance/sqrt math is then the same IEEE op text in both engines
    * (sqrt is correctly rounded per IEEE-754 — unlike libm
    * transcendentals it IS cross-engine stable). Full frames only
    * (rn >= 6), population n fixed by the frame width. */
  def movingStddev(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h1 = hourlyAvg(spark, sfDir)
    val wSeq = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    val wf = wSeq.rowsBetween(-5, 0)
    val nd = lit(6.0)
    val s1 = sum(col("v").cast("decimal(18,8)")).over(wf).cast("double")
    val s2 = sum((col("v") * col("v")).cast("decimal(18,8)")).over(wf)
      .cast("double")
    h1.withColumn("rn", row_number().over(wSeq))
      .withColumn("sd", Det.r4(sqrt((s2 - (s1 * s1) / nd) / nd)))
      .where(col("rn") >= 6)
      .select(col("event_type"), col("bucket"), col("v"), col("sd"))
      .orderBy("event_type", "bucket")
  }

  /** WALD–WOLFOWITZ RUNS TEST per hourly series — "is this series
    * random noise or structured?": dichotomize each bucket against the
    * series' exact rank median (the mad_outliers median discipline:
    * the (n+1) div 2-th value under the (v, bucket) total order, ties
    * at the median count as NOT-above — deterministic), count runs of
    * equal signs in time order (one lag over the series window), and
    * report z = (R − μ)/σ where μ = a/n + 1 and σ² = a(a−n)/(n²(n−1))
    * with a = 2·n₁·n₂ — every factor an exact BIGINT (bounded by the
    * calendar grain), one IEEE division each, shared text. A
    * degenerate series (all values equal ⇒ n₁ = 0 ⇒ σ = 0) reports
    * NULL z in both engines. */
  def runsTest(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h1 = hourlyAvg(spark, sfDir)
    val wRank = Window.partitionBy(col("event_type"))
      .orderBy(col("v"), col("bucket"))
    val wAll = Window.partitionBy(col("event_type"))
    val wSeq = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    val signed = h1
      .withColumn("rn", row_number().over(wRank))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("med",
        max(when(col("rn") === expr("(n + 1) div 2"), col("v")))
          .over(wAll))
      .withColumn("s", when(col("v") > col("med"), 1L).otherwise(0L))
      .withColumn("flip",
        when(lag(col("s"), 1).over(wSeq).isNull, 0L)
          .when(lag(col("s"), 1).over(wSeq) =!= col("s"), 1L)
          .otherwise(0L))
    val agg = signed.groupBy(col("event_type"))
      .agg(max(col("n")).as("n"), sum(col("s")).as("n1"),
        (max(col("n")) - sum(col("s"))).as("n2"),
        (sum(col("flip")) + lit(1L)).as("runs"))
      .withColumn("a", lit(2L) * col("n1") * col("n2"))
    val mu = col("a").cast("double") / col("n").cast("double") + lit(1.0)
    val sig2 = (col("a") * (col("a") - col("n"))).cast("double") /
      (col("n") * col("n") * (col("n") - lit(1L))).cast("double")
    agg.select(col("event_type"), col("n"), col("n1"), col("n2"),
        col("runs"),
        when(col("a") * (col("a") - col("n")) > 0L,
          Det.r4((col("runs").cast("double") - mu) / sqrt(sig2)))
          .otherwise(lit(null)).as("z"))
      .orderBy("event_type")
  }

  /** BOLLINGER BANDS over each hourly series — the control-chart read
    * beside [[movingStddev]]: 6-bucket moving mean ± 2σ, plus the
    * breach flag operators alert on. Exact DECIMAL window sums (order-
    * independent) feed IDENTICAL IEEE band formulas in both engines,
    * so even the band COMPARISON (v vs μ±2σ) is bit-stable — both
    * operands are the same double text. Breach is a BIGINT 0/1/−1
    * (above/in/below). One series-key window pass. */
  def bollinger(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h1 = hourlyAvg(spark, sfDir)
    val wSeq = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    val wf = wSeq.rowsBetween(-5, 0)
    val nd = lit(6.0)
    val s1 = sum(col("v").cast("decimal(18,8)")).over(wf).cast("double")
    // square in EXACT decimal (v is a 4-decimal value), not double —
    // the double product's re-round to decimal is the one dialect- and
    // path-sensitive step, and squaring exactly lets the streaming
    // twin reproduce every band from scaled-integer state
    val s2 = sum(col("v").cast("decimal(18,4)") *
        col("v").cast("decimal(18,4)")).over(wf)
      .cast("double")
    h1.withColumn("rn", row_number().over(wSeq))
      .withColumn("ma", s1 / nd)
      .withColumn("sd", sqrt((s2 - (s1 * s1) / nd) / nd))
      .where(col("rn") >= 6)
      .select(col("event_type"), col("bucket"), col("v"),
        Det.r4(col("ma")).as("ma"),
        Det.r4(col("ma") + lit(2.0) * col("sd")).as("upper"),
        Det.r4(col("ma") - lit(2.0) * col("sd")).as("lower"),
        when(col("v").cast("double") > col("ma") + lit(2.0) * col("sd"),
            lit(1L))
          .when(col("v").cast("double") < col("ma") - lit(2.0) * col("sd"),
            lit(-1L))
          .otherwise(lit(0L)).as("breach"))
      .orderBy("event_type", "bucket")
  }

  /** Graphite `groupByNodes(seriesList, 'sum', 0, 2)`: fan-in keyed by
    * MULTIPLE dot-delimited nodes at once (here app and host — the
    * per-host totals across services), the n-ary generalization of
    * [[groupByNode]]. The multi-node key is rebuilt with the original
    * separator, exactly as graphite-web joins the selected nodes. */
  def groupByNodes(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("metric", concat_ws(".", lit("app"), col("event_type"),
        concat(lit("host"), pmod(col("user_id"), lit(3)).cast("string"))))
      .withColumn("parts", split(col("metric"), "\\."))
      .groupBy(concat_ws(".", element_at(col("parts"), 1),
          element_at(col("parts"), 3)).as("key"),
        date_trunc("hour", col("ts")).as("bucket"))
      .agg(Det.sum4(col("value")).as("v"), count(lit(1)).as("n"))
      .orderBy("key", "bucket")

  /** Graphite `sortByTotal(seriesList)`: series ranked by their exact
    * DECIMAL total over the window — the "which series carries the
    * volume" legend ordering. One agg shuffle; the sort runs over
    * #series rows. */
  def sortByTotal(spark: SparkSession, sfDir: String): DataFrame =
    hourlyAvg(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(Det.dsum4(col("v")).as("total"), count(lit(1)).as("n"))
      .orderBy(col("total").desc, col("event_type"))

  /** Graphite `percentileOfSeries(seriesList, 75)`: per-bucket p75
    * ACROSS series — [[nPercentile]]'s exact integer-rank selection
    * rotated 90° (partitioned by bucket, ordered by value with the
    * series name as unique tiebreak), rank = ceil(0.75·n) = (3n+3)÷4,
    * so both engines select the identical element; interpolating
    * percentile dialects never agree, an indexed element always does. */
  def percentileOfSeries(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h1 = hourlyAvg(spark, sfDir)
    val wOrd = Window.partitionBy(col("bucket"))
      .orderBy(col("v"), col("event_type"))
    val wAll = Window.partitionBy(col("bucket"))
    h1.select(col("bucket"), col("v"),
        row_number().over(wOrd).as("rn"),
        count(lit(1)).over(wAll).as("n"))
      .where(col("rn") === expr("(3 * n + 3) div 4"))
      .select(col("bucket"), col("v").as("p75"))
      .orderBy("bucket")
  }

  /** Graphite `absolute` / `squareRoot` / `pow(2)` / `invert` in one
    * projection over the hourly rollup — the per-point math transforms.
    * Every op here is IEEE-EXACT in both engines (abs, correctly-
    * rounded sqrt, one multiply, one divide) — `log`/`exp` are
    * deliberately absent: libm implementations differ by ulps across
    * engines, which the shared rounding formula cannot mask reliably. */
  def seriesMath(spark: SparkSession, sfDir: String): DataFrame =
    hourlyAvg(spark, sfDir)
      .select(col("event_type"), col("bucket"), col("v"),
        Det.r4(abs(col("v") - lit(25.0))).as("abs_dev"),
        Det.r4(sqrt(col("v"))).as("sqrt_v"),
        Det.r4(col("v") * col("v")).as("pow2"),
        when(col("v") =!= 0.0, Det.r4(lit(1.0) / col("v"))).as("inv_v"))
      .orderBy("event_type", "bucket")

  /** Graphite `timeStack(series, '1d', 0, 3)`: the series overlaid with
    * its own 24h and 48h history — the day-over-day comparison read.
    * The rollup expands across a 3-row shift dimension (broadcast) and
    * each (bucket, shift) row joins the SAME rollup at bucket − shift·24h
    * — one raw scan total, gap-safe (a missing source bucket yields
    * null, exactly graphite's None). */
  def timeStack(spark: SparkSession, sfDir: String): DataFrame = {
    val h1 = hourlyAvg(spark, sfDir)
    val shifts = spark.range(0, 3).select(col("id").cast("int").as("shift_d"))
    val src = h1.select(col("event_type").as("e2"), col("bucket").as("b2"),
      col("v").as("v_shifted"))
    h1.crossJoin(broadcast(shifts))
      .withColumn("src_bucket",
        timestamp_micros(expr("unix_micros(bucket) - shift_d * 86400000000L")))
      .join(src, col("event_type") === col("e2") &&
        col("src_bucket") === col("b2"), "left")
      .select(col("event_type"), col("bucket"), col("shift_d"),
        col("v"), col("v_shifted"))
      .orderBy("event_type", "bucket", "shift_d")
  }

  /** Graphite `smartSummarize(series, '6h')`: 6h buckets aligned to each
    * SERIES' OWN first point (not the epoch) — the "relative to deploy
    * time" rollup. The per-series origin is a tiny aggregate joined
    * back (broadcast); bucket arithmetic runs in exact integer µs, so
    * boundaries are engine-identical. */
  def smartSummarize(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    val origin = e.groupBy(col("event_type"))
      .agg(min(expr("unix_micros(ts)")).as("t0"))
    e.join(broadcast(origin), "event_type")
      .groupBy(col("event_type"),
        expr(s"t0 + ((unix_micros(ts) - t0) div ${SixHourUs}L) * ${SixHourUs}L")
          .as("b_us"))
      .agg(Det.avg4(col("value")).as("v"), count(lit(1)).as("n"))
      .select(col("event_type"), timestamp_micros(col("b_us")).as("bucket"),
        col("v"), col("n"))
      .orderBy("event_type", "bucket")
  }

  /** Graphite `averageAbove(seriesList, 25)`: series whose exact
    * whole-window average clears the threshold — the noise-floor filter
    * before rendering. The average accumulates as exact DECIMAL over
    * the rounded rollup values ([[Det.davg4]]), so the comparison is on
    * engine-identical doubles. */
  def averageAbove(spark: SparkSession, sfDir: String): DataFrame =
    hourlyAvg(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(Det.davg4(col("v")).as("avg_v"), count(lit(1)).as("n"))
      .where(col("avg_v") > 25.0)
      .orderBy("event_type")

  /** Graphite `averageOutsidePercentile(seriesList, 90)`: keep series
    * whose whole-window average sits in the TAILS of the cross-series
    * average distribution — symmetric exact-rank tails (ceil(0.1·n)
    * from each end), so both engines keep the identical series set.
    * The ranking runs over #series rows (a tiny single-partition
    * window over an aggregate, never over raw data). */
  def avgOutsidePercentile(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = hourlyAvg(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(Det.davg4(col("v")).as("avg_v"))
    val wOrd = Window.orderBy(col("avg_v"), col("event_type"))
    val wAll = Window.partitionBy()
    s.select(col("event_type"), col("avg_v"),
        row_number().over(wOrd).as("rn"),
        count(lit(1)).over(wAll).as("n"))
      .where(col("rn") <= expr("(10 * n + 99) div 100") ||
        col("rn") >= col("n") + 1 - expr("(10 * n + 99) div 100"))
      .select(col("event_type"), col("avg_v"), col("rn").cast("bigint").as("rn"))
      .orderBy("event_type")
  }

  /** Graphite `removeBetweenPercentile(seriesList, 70)`: keep series
    * with AT LEAST ONE point outside the per-bucket [p30, p70] band of
    * the cross-series distribution — the "only show things that ever
    * diverge" filter. Band edges are exact integer-rank ELEMENTS per
    * bucket (ceil(0.3·n) / ceil(0.7·n) in (value, series) order), so
    * the outside-flags are engine-identical; two windows over the tiny
    * rollup, one agg shuffle. */
  def removeBetweenPercentile(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h1 = hourlyAvg(spark, sfDir)
    val wOrd = Window.partitionBy(col("bucket"))
      .orderBy(col("v"), col("event_type"))
    val wAll = Window.partitionBy(col("bucket"))
    h1.select(col("event_type"), col("bucket"), col("v"),
        row_number().over(wOrd).as("rn"),
        count(lit(1)).over(wAll).as("n"))
      .withColumn("lo",
        max(when(col("rn") === expr("(3 * n + 9) div 10"), col("v")))
          .over(wAll))
      .withColumn("hi",
        max(when(col("rn") === expr("(7 * n + 9) div 10"), col("v")))
          .over(wAll))
      .groupBy(col("event_type"))
      .agg(sum(when(col("v") < col("lo") || col("v") > col("hi"), 1L)
        .otherwise(0L)).as("n_outside"))
      .where(col("n_outside") > 0)
      .orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ts_avg_outside_pctl" -> avgOutsidePercentile _,
    "q_ts_remove_between_pctl" -> removeBetweenPercentile _,
    "q_ts_timestack" -> timeStack _,
    "q_ts_smart_summarize" -> smartSummarize _,
    "q_ts_avg_above" -> averageAbove _,
    "q_ts_pctl_of_series" -> percentileOfSeries _,
    "q_ts_series_math" -> seriesMath _,
    "q_ts_holt_aberration" -> holtAberration _,
    "q_ts_holt_backtest" -> holtBacktest _,
    "q_ts_conformal" -> tsConformal _,
    "q_ts_isotonic" -> tsIsotonic _,
    "q_ts_conformal_iso" -> tsConformalIso _,
    "q_ts_fano" -> tsFano _,
    "q_ts_hoeffding" -> tsHoeffding _,
    "q_ts_grubbs" -> tsGrubbs _,
    "q_ts_coint" -> tsCointegration _,
    "q_ts_dickey_fuller" -> tsDickeyFuller _,
    "q_ts_adf" -> tsAdf _,
    "q_ts_kpss" -> tsKpss _,
    "q_ts_kpss_trend" -> tsKpssTrend _,
    "q_ts_cox_stuart" -> tsCoxStuart _,
    "q_ts_pp" -> tsPhillipsPerron _,
    "q_ts_bartels" -> tsBartelsRvn _,
    "q_ts_variance_ratio" -> tsVarianceRatio _,
    "q_ts_mase" -> tsMase _,
    "q_ts_moving_window" -> movingWindow _,
    "q_ts_moving_stddev" -> movingStddev _,
    "q_ts_bollinger" -> bollinger _,
    "q_ts_runs_test" -> runsTest _,
    "q_ts_group_by_nodes" -> groupByNodes _,
    "q_ts_sort_by_total" -> sortByTotal _,
    "q_ts_max_series" -> maxMinAvgSeries _,
    "q_ts_diff_series" -> diffSeries _,
    "q_ts_alias_sub" -> aliasSub _,
    "q_ts_alias_bymetric" -> aliasByMetricRead _,
    "q_ts_substr" -> substrNodes _,
    "q_ts_dashboard_shift" -> dashboardShift _,
    "q_ts_apply_bynode" -> applyByNode _,
    "q_ts_constant_line" -> constantLineRead _,
    "q_ts_acf" -> acf _,
    "q_ts_ljung_box" -> tsLjungBox _,
    "q_ts_granger" -> tsGranger _,
    "q_ts_theil_sen" -> tsTheilSen _,
    "q_ts_durbin_watson" -> tsDurbinWatson _,
    "q_ts_partial_corr" -> tsPartialCorr _,
    "q_ts_newey_west" -> tsNeweyWest _,
    "q_ts_pacf" -> pacf _,
    "q_ts_trimmed_mean" -> trimmedMean _,
    "q_ts_holt_damped" -> holtDamped _,
    "q_ts_range_of_series" -> rangeOfSeries _,
    "q_ts_timeslice" -> timeSlice _,
    "q_ts_hitcount" -> hitcount _,
    "q_ts_offset_zero" -> offsetToZero _,
    "q_ts_changed" -> changedSeries _,
    "q_ts_delay" -> delaySeries _,
    "q_ts_most_deviant" -> mostDeviant _,
    "q_ts_find_metrics" -> findMetrics _,
    "q_sessionize" -> sessionize _,
    "q_session_conversion" -> sessionConversion _,
    "q_funnel" -> funnel _,
    "q_cohort_retention" -> cohortRetention _,
    "q_dau_stickiness" -> dauStickiness _,
    "q_new_vs_returning" -> newVsReturning _,
    "q_activity_histogram" -> activityHistogram _,
    "q_attribution" -> attribution _,
    "q_attr_markov" -> markovAttribution _,
    "q_attr_shapley" -> shapleyAttribution _,
    "q_attr_shapley_cohort" -> shapleyByCohort _,
    "q_ts_seasonal_strength" -> seasonalStrength _,
    "q_ts_hodges_lehmann" -> hodgesLehmann _,
    "q_ts_burn_rate" -> burnRate _,
    "q_ts_dashboard" -> dashboard _,
    "q_ts_moving_avg" -> movingAverage _,
    "q_ts_scale_offset" -> scaleOffset _,
    "q_ts_fetch_bounded" -> fetchBounded _,
    "q_sql_fetch_routed" -> sqlFetchRouted _,
    "q_ts_aspercent" -> asPercent _,
    "q_ts_groupbynode" -> groupByNode _,
    "q_ts_current_above" -> currentAbove _,
    "q_ts_sort_maxima" -> sortByMaxima _,
    "q_ts_stddev_series" -> stddevSeries _,
    "q_ts_derivative" -> derivative _,
    "q_ts_locf" -> locf _,
    "q_ts_interpolate" -> interpolate _,
    "q_ts_anomaly" -> anomaly _,
    "q_ts_hourofday" -> hourOfDay _,
    "q_ts_seasonal" -> seasonalDecompose _,
    "q_ts_integral" -> integral _,
    "q_ts_integral_by_day" -> integralByInterval _,
    "q_ts_npercentile" -> nPercentile _,
    "q_ts_mad_outliers" -> madOutliers _,
    "q_ts_series_corr" -> seriesCorr _,
    "q_ts_spearman" -> spearmanCorr _,
    "q_ts_kendall" -> kendallTau _,
    "q_ts_kendall_fast" -> kendallTauFast _,
    "q_ts_mannkendall" -> mannKendall _,
    "q_ts_seasonal_mk" -> seasonalMannKendall _,
    "q_ts_seasonal_kendall_src" -> seasonalKendallSources _,
    "q_ts_seasonal_spearman_src" -> seasonalSpearmanSources _,
    "q_ts_lttb" -> lttb _,
    "q_ts_lttb_count" -> lttbCount _,
    "q_ts_somers_d" -> somersD _,
    "q_funnel_windowed" -> funnelWindowed _,
    "q_ts_xcorr" -> crossCorrLagged _,
    "q_ts_wilcoxon" -> wilcoxonSignedRank _,
    "q_ts_stl" -> stlDecompose _,
    "q_ts_stl_anomaly" -> stlAnomaly _,
    "q_ts_value_histogram" -> valueHistogram _,
    "q_ts_remove_above_pct" -> removeAbovePercentile _,
    "q_ts_remove_below" -> removeBelowValue _,
    "q_ts_consolidate" -> consolidate _,
    "q_ts_exclude" -> excludeSeries _,
    "q_ts_linreg" -> linearRegression _,
    "q_ts_theilsen" -> theilSen _,
    "q_ts_cusum" -> cusum _,
    "q_ts_pettitt" -> pettitt _,
    "q_ts_sax" -> sax _,
    "q_ts_dtw" -> dtw _,
    "q_ts_ewma" -> ewma _,
    "q_ts_multiply_series" -> multiplySeries _,
    "q_ts_holt_forecast" -> holtForecast _,
    "q_ts_page_hinkley" -> pageHinkley _,
    "q_ts_ewma_chart" -> ewmaChart _,
    "q_ts_sum_series" -> sumSeries _,
    "q_ts_transform_null" -> transformNull _,
    "q_ts_holt_bands" -> holtBands _,
    "q_ts_weighted_avg" -> weightedAverage _,
    "q_ts_holtwinters" -> holtWinters _,
    "q_ts_alias_bynode" -> aliasByNodeRead _,
    "q_ts_timeshift" -> timeshift _,
    "q_ts_rollup_avg" -> rollupAvg _,
    "q_ts_rollup_sum" -> rollupSum _,
    "q_ts_rollup_minmax" -> rollupMinMax _,
    "q_ts_rollup_last" -> rollupLast _,
    "q_ts_align_10m" -> align10m _,
    "q_ts_gapfill" -> gapfill _,
    "q_ts_xff" -> xff _,
    "q_ts_propagate" -> propagate _,
    "q_ts_retention" -> retention _,
    "q_ts_cache_merge" -> cacheMerge _,
    "q_ts_topk_series" -> topkSeries _,
    "q_ts_nonneg_derivative" -> nonnegDerivative _,
    "q_ts_persecond" -> perSecond _,
    "q_ts_summarize" -> summarize _,
    "q_ts_series_ratio" -> seriesRatio _,
    "q_ts_glob_fetch" -> globFetch _,
    "q_ts_moving_median" -> movingMedian _,
    "q_ts_highest_current" -> highestCurrent _,
    "q_ts_fetch_routed" -> fetchRouted _
  )

  /** Shared by q_ts_fetch_routed and its SQL-surface twin
    * q_sql_fetch_routed — the clamped (R4) routed read. */
  private val fetchRoutedOracle: String =
    s"""SELECT TIMESTAMP '1970-01-01' + ((epoch_us(ts) // 3600000000) * 3600) * INTERVAL '1 second' AS bucket,
      |       ${Det.avg4Sql("value")} AS v, count(*) AS n
      |FROM events
      |WHERE event_type = 'click'
      |  AND ts >= (SELECT max(ts) FROM events) - INTERVAL '20 days'
      |  AND ts <= (SELECT max(ts) FROM events)
      |GROUP BY 1
      |ORDER BY bucket NULLS FIRST""".stripMargin

  /** DuckDB-dialect oracles (driver t2). Conventions (SURVEY §7.4): UTC,
    * round(x,4) DOUBLE, explicit NULLS FIRST on ASC / NULLS LAST on DESC,
    * identical column names, total ORDER BY. */
  /** The aberration read's recursive-CTE oracle — shared verbatim by
    * q_ts_holt_aberration and the backtest aggregate stacked on it
    * (identical text ⇒ identical per-point doubles to aggregate). */
  private val holtAberrationOracle: String =
    s"""WITH RECURSIVE h1 AS (
      |  SELECT event_type, date_trunc('hour', ts) AS bucket,
      |         ${Det.avg4Sql("value")} AS v
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT event_type, bucket, v,
      |         row_number() OVER (PARTITION BY event_type
      |           ORDER BY bucket) AS rn
      |  FROM h1),
      |rec AS (
      |  SELECT r1.event_type, 2 AS rn, r1.v AS lvl, r2.v - r1.v AS trd,
      |         CAST(0.0 AS DOUBLE) AS dev
      |  FROM r r1 JOIN r r2 ON r2.event_type = r1.event_type AND r2.rn = 2
      |  WHERE r1.rn = 1
      |  UNION ALL
      |  SELECT rec.event_type, rec.rn + 1,
      |         CAST(0.1 AS DOUBLE) * r.v
      |           + CAST(0.9 AS DOUBLE) * (rec.lvl + rec.trd),
      |         CAST(0.01 AS DOUBLE) * (CAST(0.1 AS DOUBLE) * r.v
      |             + CAST(0.9 AS DOUBLE) * (rec.lvl + rec.trd) - rec.lvl)
      |           + CAST(0.99 AS DOUBLE) * rec.trd,
      |         CAST(0.1 AS DOUBLE) * abs(r.v - (rec.lvl + rec.trd))
      |           + CAST(0.9 AS DOUBLE) * rec.dev
      |  FROM rec JOIN r ON r.event_type = rec.event_type
      |    AND r.rn = rec.rn + 1)
      |SELECT rec.event_type, r.bucket, r.v AS v,
      |       rec.lvl + rec.trd AS fc,
      |       rec.lvl + rec.trd - CAST(3.0 AS DOUBLE) * rec.dev AS lo_band,
      |       rec.lvl + rec.trd + CAST(3.0 AS DOUBLE) * rec.dev AS hi_band,
      |       CASE
      |         WHEN r.v > rec.lvl + rec.trd + CAST(3.0 AS DOUBLE) * rec.dev
      |         THEN r.v - (rec.lvl + rec.trd + CAST(3.0 AS DOUBLE) * rec.dev)
      |         WHEN r.v < rec.lvl + rec.trd - CAST(3.0 AS DOUBLE) * rec.dev
      |         THEN r.v - (rec.lvl + rec.trd - CAST(3.0 AS DOUBLE) * rec.dev)
      |         ELSE CAST(0.0 AS DOUBLE) END AS aberration
      |FROM rec JOIN r ON r.event_type = rec.event_type
      |  AND r.rn = rec.rn + 1
      |ORDER BY rec.event_type NULLS FIRST, r.bucket NULLS FIRST""".stripMargin

  /** Shared STL chain (trend → detrend → per-hour-of-day seasonal) —
    * embedded by both q_ts_stl and q_ts_stl_anomaly so the anomaly
    * read cannot drift from the decomposition it scores. */
  private def stlSqlCtes: String =
    s"""h1 AS (
      |  SELECT event_type, date_trunc('hour', ts) AS bucket,
      |         ${Det.avg4Sql("value")} AS v
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type, bucket, v,
      |         row_number() OVER w AS rn,
      |         count(*) OVER (PARTITION BY event_type) AS cnt,
      |         quantile_cont(v, 0.5) OVER (PARTITION BY event_type
      |           ORDER BY bucket
      |           ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS trend
      |  FROM h1
      |  WINDOW w AS (PARTITION BY event_type ORDER BY bucket)),
      |t AS (
      |  SELECT event_type, bucket, v, trend, v - trend AS detr,
      |         hour(bucket) AS hod
      |  FROM m WHERE rn >= 13 AND rn <= cnt - 12),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY event_type, hod
      |           ORDER BY detr, bucket) AS rs,
      |         count(*) OVER (PARTITION BY event_type, hod) AS ns
      |  FROM t),
      |s AS (
      |  SELECT *, max(CASE WHEN rs = (ns + 1) // 2 THEN detr END)
      |           OVER (PARTITION BY event_type, hod) AS seasonal
      |  FROM r)""".stripMargin

  private val oracleSqlBase: Map[String, String] = Map(
    "q_ts_avg_outside_pctl" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT event_type, ${Det.davg4Sql("v")} AS avg_v
        |  FROM h1 GROUP BY 1),
        |r AS (
        |  SELECT event_type, avg_v,
        |         row_number() OVER (ORDER BY avg_v, event_type) AS rn,
        |         count(*) OVER () AS n
        |  FROM s)
        |SELECT event_type, avg_v, CAST(rn AS BIGINT) AS rn
        |FROM r
        |WHERE rn <= (10 * n + 99) // 100
        |   OR rn >= n + 1 - ((10 * n + 99) // 100)
        |ORDER BY event_type NULLS FIRST""".stripMargin,
    "q_ts_remove_between_pctl" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, bucket, v,
        |         row_number() OVER (PARTITION BY bucket
        |           ORDER BY v, event_type) AS rn,
        |         count(*) OVER (PARTITION BY bucket) AS n
        |  FROM h1),
        |b AS (
        |  SELECT event_type, bucket, v,
        |         max(CASE WHEN rn = (3 * n + 9) // 10 THEN v END)
        |           OVER (PARTITION BY bucket) AS lo,
        |         max(CASE WHEN rn = (7 * n + 9) // 10 THEN v END)
        |           OVER (PARTITION BY bucket) AS hi
        |  FROM r)
        |SELECT event_type,
        |       CAST(sum(CASE WHEN v < lo OR v > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_outside
        |FROM b GROUP BY 1
        |HAVING sum(CASE WHEN v < lo OR v > hi THEN 1 ELSE 0 END) > 0
        |ORDER BY event_type NULLS FIRST""".stripMargin,
    "q_ts_timestack" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT unnest([0, 1, 2]) AS shift_d)
        |SELECT h1.event_type, h1.bucket, CAST(s.shift_d AS INT) AS shift_d,
        |       h1.v, src.v AS v_shifted
        |FROM h1 CROSS JOIN s
        |LEFT JOIN h1 src ON src.event_type = h1.event_type
        |  AND src.bucket = make_timestamp(epoch_us(h1.bucket) - s.shift_d * 86400000000)
        |ORDER BY h1.event_type NULLS FIRST, h1.bucket NULLS FIRST,
        |         shift_d NULLS FIRST""".stripMargin,
    "q_ts_smart_summarize" ->
      s"""WITH o AS (
        |  SELECT event_type, min(epoch_us(ts)) AS t0
        |  FROM events GROUP BY 1)
        |SELECT e.event_type,
        |       make_timestamp(o.t0 + ((epoch_us(e.ts) - o.t0) // 21600000000) * 21600000000) AS bucket,
        |       ${Det.avg4Sql("e.value")} AS v, count(*) AS n
        |FROM events e JOIN o ON o.event_type = e.event_type
        |GROUP BY 1, 2
        |ORDER BY e.event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin,
    "q_ts_avg_above" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, ${Det.davg4Sql("v")} AS avg_v,
        |       count(*) AS n
        |FROM h1 GROUP BY 1
        |HAVING ${Det.davg4Sql("v")} > 25.0
        |ORDER BY event_type NULLS FIRST""".stripMargin,
    "q_ts_pctl_of_series" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT bucket, v,
        |         row_number() OVER (PARTITION BY bucket
        |           ORDER BY v, event_type) AS rn,
        |         count(*) OVER (PARTITION BY bucket) AS n
        |  FROM h1)
        |SELECT bucket, v AS p75
        |FROM r
        |WHERE rn = (3 * n + 3) // 4
        |ORDER BY bucket NULLS FIRST""".stripMargin,
    "q_ts_series_math" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, bucket, v,
        |       ${Det.r4Sql("abs(v - 25.0)")} AS abs_dev,
        |       ${Det.r4Sql("sqrt(v)")} AS sqrt_v,
        |       ${Det.r4Sql("v * v")} AS pow2,
        |       CASE WHEN v <> 0.0 THEN ${Det.r4Sql("1.0 / v")} END AS inv_v
        |FROM h1
        |ORDER BY event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin,
    // Same recursion as q_ts_holt_bands; each state row joins the NEXT
    // point, so every band/aberration op sequence is textually identical
    // to the fold's — bit-exact doubles, no rounding step needed.
    "q_ts_holt_aberration" -> holtAberrationOracle,
    "q_ts_holt_backtest" -> {
      val mae = "CAST(sum(CAST(abs(v - fc) AS DECIMAL(18,8))) AS DOUBLE) / CAST(count(*) AS DOUBLE)"
      val bias = "CAST(sum(CAST(v - fc AS DECIMAL(18,8))) AS DOUBLE) / CAST(count(*) AS DOUBLE)"
      s"""WITH ab AS (
        |$holtAberrationOracle
        |)
        |SELECT event_type, count(*) AS n,
        |       ${Det.r4Sql(mae)} AS mae,
        |       ${Det.r4Sql(bias)} AS bias,
        |       CAST(sum(CASE WHEN aberration = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_in_band
        |FROM ab GROUP BY 1
        |ORDER BY event_type NULLS FIRST""".stripMargin
    },
    "q_ts_mase" -> {
      val smapeT = "(abs(v - fc) / ((abs(v) + abs(fc)) / 2.0))"
      s"""WITH ab0 AS (
        |$holtAberrationOracle
        |),
        |lg AS (
        |  SELECT event_type, v, fc,
        |         lag(v, 1) OVER (PARTITION BY event_type
        |           ORDER BY bucket NULLS FIRST) AS vp
        |  FROM ab0),
        |g AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CAST(abs(v - fc) AS DECIMAL(18,8)))
        |           AS DOUBLE) AS sae,
        |         CAST(sum(CAST(abs(v - vp) AS DECIMAL(18,8)))
        |           AS DOUBLE) AS snaive,
        |         CAST(sum(CASE WHEN abs(v) + abs(fc) > 0.0
        |           THEN CAST(floor($smapeT * 100000000.0) AS BIGINT)
        |           ELSE 0 END) AS BIGINT) AS smq
        |  FROM lg WHERE vp IS NOT NULL GROUP BY 1)
        |SELECT event_type, n,
        |       CASE WHEN snaive > 0.0
        |       THEN ${Det.r4Sql("sae / snaive")} ELSE NULL END AS mase,
        |       ${Det.r4Sql("CAST(smq AS DOUBLE) / 100000000.0 / CAST(n AS DOUBLE)")} AS smape
        |FROM g ORDER BY event_type NULLS FIRST""".stripMargin
    },
    "q_ts_conformal" -> {
      s"""WITH ab0 AS (
        |$holtAberrationOracle
        |),
        |rr AS (SELECT event_type, bucket, abs(v - fc) AS r FROM ab0),
        |tg AS (
        |  SELECT event_type, bucket, r,
        |         CAST(row_number() OVER (PARTITION BY event_type
        |           ORDER BY bucket NULLS FIRST) AS BIGINT) AS rn,
        |         CAST(count(*) OVER (PARTITION BY event_type)
        |           AS BIGINT) AS n
        |  FROM rr),
        |tg2 AS MATERIALIZED (
        |  SELECT event_type, bucket, r, rn, (n * 7) // 10 AS ncal
        |  FROM tg),
        |q AS (
        |  SELECT event_type, r AS q90, ncal FROM (
        |    SELECT event_type, r, ncal,
        |           CAST(row_number() OVER (PARTITION BY event_type
        |             ORDER BY r NULLS FIRST, bucket NULLS FIRST)
        |             AS BIGINT) AS rrk
        |    FROM tg2 WHERE rn <= ncal) x
        |  WHERE rrk = (9 * ncal + 9) // 10)
        |SELECT t.event_type, q.ncal AS n_cal,
        |       CAST(count(*) AS BIGINT) AS n_test, q.q90,
        |       CAST(sum(CASE WHEN t.r <= q.q90 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_covered,
        |       ${Det.r4Sql("CAST(sum(CASE WHEN t.r <= q.q90 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)")} AS coverage
        |FROM tg2 t JOIN q ON q.event_type = t.event_type
        |WHERE t.rn > t.ncal
        |GROUP BY 1, 2, 4
        |ORDER BY t.event_type NULLS FIRST""".stripMargin
    },
    "q_ts_moving_window" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, bucket, v, row_number() OVER w AS rn,
        |         CAST(sum(CAST(v AS DECIMAL(18,4))) OVER f AS DOUBLE) AS msum,
        |         min(v) OVER f AS mmin,
        |         max(v) OVER f AS mmax
        |  FROM h1
        |  WINDOW w AS (PARTITION BY event_type ORDER BY bucket),
        |         f AS (PARTITION BY event_type ORDER BY bucket
        |           ROWS BETWEEN 5 PRECEDING AND CURRENT ROW))
        |SELECT event_type, bucket, v, msum, mmin, mmax
        |FROM m WHERE rn >= 6
        |ORDER BY event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin,
    "q_ts_moving_stddev" -> {
      val s1 = "CAST(sum(CAST(v AS DECIMAL(18,8))) OVER f AS DOUBLE)"
      val s2 = "CAST(sum(CAST(v * v AS DECIMAL(18,8))) OVER f AS DOUBLE)"
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, bucket, v, row_number() OVER w AS rn,
        |         ${Det.r4Sql(s"sqrt(($s2 - ($s1 * $s1) / 6.0) / 6.0)")} AS sd
        |  FROM h1
        |  WINDOW w AS (PARTITION BY event_type ORDER BY bucket),
        |         f AS (PARTITION BY event_type ORDER BY bucket
        |           ROWS BETWEEN 5 PRECEDING AND CURRENT ROW))
        |SELECT event_type, bucket, v, sd
        |FROM m WHERE rn >= 6
        |ORDER BY event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin
    },
    "q_ts_bollinger" -> {
      val s1 = "CAST(sum(CAST(v AS DECIMAL(18,8))) OVER f AS DOUBLE)"
      val s2 = "CAST(sum(CAST(v AS DECIMAL(18,4)) * CAST(v AS DECIMAL(18,4))) OVER f AS DOUBLE)"
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, bucket, v, row_number() OVER w AS rn,
        |         ($s1 / 6.0) AS mar,
        |         sqrt(($s2 - ($s1 * $s1) / 6.0) / 6.0) AS sdr
        |  FROM h1
        |  WINDOW w AS (PARTITION BY event_type ORDER BY bucket),
        |         f AS (PARTITION BY event_type ORDER BY bucket
        |           ROWS BETWEEN 5 PRECEDING AND CURRENT ROW))
        |SELECT event_type, bucket, v,
        |       ${Det.r4Sql("mar")} AS ma,
        |       ${Det.r4Sql("mar + 2.0 * sdr")} AS upper,
        |       ${Det.r4Sql("mar - 2.0 * sdr")} AS lower,
        |       CAST(CASE WHEN CAST(v AS DOUBLE) > mar + 2.0 * sdr THEN 1
        |            WHEN CAST(v AS DOUBLE) < mar - 2.0 * sdr THEN -1
        |            ELSE 0 END AS BIGINT) AS breach
        |FROM m WHERE rn >= 6
        |ORDER BY event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin
    },
    "q_ts_runs_test" -> {
      val mu = "(CAST(a AS DOUBLE) / CAST(n AS DOUBLE) + 1.0)"
      val sig2 = "(CAST(a * (a - n) AS DOUBLE) / " +
        "CAST(n * n * (n - 1) AS DOUBLE))"
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |r1 AS (
        |  SELECT event_type, bucket, v,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY v NULLS FIRST, bucket NULLS FIRST) AS rn,
        |         CAST(count(*) OVER (PARTITION BY event_type)
        |           AS BIGINT) AS n
        |  FROM h1),
        |m1 AS (
        |  SELECT *, max(CASE WHEN rn = (n + 1) // 2 THEN v END)
        |              OVER (PARTITION BY event_type) AS med
        |  FROM r1),
        |s1 AS (SELECT event_type, bucket, n,
        |         CASE WHEN v > med THEN 1 ELSE 0 END AS s
        |       FROM m1),
        |f1 AS (
        |  SELECT event_type, n, s,
        |         CASE WHEN lag(s, 1) OVER q IS NULL THEN 0
        |              WHEN lag(s, 1) OVER q <> s THEN 1 ELSE 0 END AS flip
        |  FROM s1
        |  WINDOW q AS (PARTITION BY event_type
        |    ORDER BY bucket NULLS FIRST)),
        |ag AS (
        |  SELECT event_type, max(n) AS n, CAST(sum(s) AS BIGINT) AS n1,
        |         max(n) - CAST(sum(s) AS BIGINT) AS n2,
        |         CAST(sum(flip) AS BIGINT) + 1 AS runs
        |  FROM f1 GROUP BY 1),
        |ag2 AS (SELECT *, 2 * n1 * n2 AS a FROM ag)
        |SELECT event_type, n, n1, n2, runs,
        |       CASE WHEN a * (a - n) > 0 THEN
        |         ${Det.r4Sql(s"(CAST(runs AS DOUBLE) - $mu) / sqrt($sig2)")}
        |       ELSE NULL END AS z
        |FROM ag2
        |ORDER BY event_type NULLS FIRST""".stripMargin
    },
    "q_ts_group_by_nodes" ->
      s"""WITH m AS (
        |  SELECT 'app.' || event_type || '.host' || CAST(user_id % 3 AS VARCHAR) AS metric,
        |         ts, value
        |  FROM events)
        |SELECT split_part(metric, '.', 1) || '.' || split_part(metric, '.', 3) AS key,
        |       date_trunc('hour', ts) AS bucket,
        |       ${Det.sum4Sql("value")} AS v, count(*) AS n
        |FROM m GROUP BY 1, 2
        |ORDER BY key NULLS FIRST, bucket NULLS FIRST""".stripMargin,
    "q_ts_sort_by_total" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, ${Det.dsum4Sql("v")} AS total,
        |       count(*) AS n
        |FROM h1 GROUP BY 1
        |ORDER BY total DESC NULLS LAST, event_type NULLS FIRST""".stripMargin,
    "q_ts_max_series" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2)
        |SELECT bucket, max(v) AS max_v, min(v) AS min_v,
        |       ${Det.davg4Sql("v")} AS avg_v
        |FROM h1 GROUP BY 1
        |ORDER BY bucket NULLS FIRST""".stripMargin,
    "q_ts_diff_series" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2)
        |SELECT bucket,
        |       CAST(sum(CAST(CASE WHEN event_type = 'click' THEN v
        |                          ELSE -v END AS DECIMAL(18,4))) AS DOUBLE) AS diff_v,
        |       count(*) AS n_series
        |FROM h1 GROUP BY 1
        |ORDER BY bucket NULLS FIRST""".stripMargin,
    // RE2 replacement dialect (`\1`) vs Spark's Java dialect (`$1`) —
    // same pattern, same produced names
    "q_ts_alias_sub" ->
      s"""WITH m AS (
        |  SELECT 'app.' || event_type || '.host' || CAST(user_id % 3 AS VARCHAR) AS metric,
        |         value
        |  FROM events)
        |SELECT regexp_replace(metric, 'host(\\d+)', 'srv\\1') AS alias,
        |       metric, count(*) AS n, ${Det.avg4Sql("value")} AS v
        |FROM m GROUP BY metric
        |ORDER BY metric NULLS FIRST""".stripMargin,
    "q_ts_alias_bymetric" ->
      s"""WITH m AS (
        |  SELECT 'app.' || event_type || '.host' || CAST(user_id % 3 AS VARCHAR) AS metric,
        |         value
        |  FROM events)
        |SELECT regexp_extract(metric, '[^.]+${"$"}') AS alias,
        |       metric, count(*) AS n, ${Det.avg4Sql("value")} AS v
        |FROM m GROUP BY metric
        |ORDER BY metric NULLS FIRST""".stripMargin,
    "q_ts_substr" ->
      s"""WITH m AS (
        |  SELECT 'app.' || event_type || '.host' || CAST(user_id % 3 AS VARCHAR) AS metric,
        |         value
        |  FROM events)
        |SELECT array_to_string(string_split(metric, '.')[2:3], '.') AS alias,
        |       metric, count(*) AS n, ${Det.avg4Sql("value")} AS v
        |FROM m GROUP BY metric
        |ORDER BY metric NULLS FIRST""".stripMargin,
    "q_ts_apply_bynode" ->
      s"""WITH h1 AS (
        |  SELECT event_type, user_id % 3 AS host,
        |         date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2, 3)
        |SELECT 'app.' || event_type AS node, bucket,
        |       CAST(sum(CASE WHEN host = 0 THEN CAST(v AS DECIMAL(18,4)) END) AS DOUBLE) AS host0_v,
        |       ${Det.dsum4Sql("v")} AS node_total,
        |       ${Det.r4Sql(
             "CAST(sum(CASE WHEN host = 0 THEN CAST(v AS DECIMAL(18,4)) END) AS DOUBLE)" +
             " / nullif(" + Det.dsum4Sql("v") + ", 0.0)")} AS host0_share
        |FROM h1 GROUP BY 1, 2
        |ORDER BY node NULLS FIRST, bucket NULLS FIRST""".stripMargin,
    "q_ts_acf" -> {
      def lagk(k: Int) =
        s"lag(d, $k) OVER (PARTITION BY event_type ORDER BY bucket)"
      def ratio(s: String) =
        Det.r4Sql(s"CAST(sum(d * $s) AS DOUBLE) / CAST(sum(d * d) AS DOUBLE)")
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |c AS (
        |  SELECT event_type, bucket,
        |         CAST(CAST(v AS DECIMAL(18,4)) * 10000 AS BIGINT) AS q
        |  FROM h1),
        |cw AS (
        |  SELECT event_type, bucket,
        |         CAST(count(*) OVER (PARTITION BY event_type) * q -
        |              sum(q) OVER (PARTITION BY event_type)
        |           AS DECIMAL(19,0)) AS d
        |  FROM c),
        |cl AS (
        |  SELECT event_type, d, ${lagk(1)} AS d1, ${lagk(2)} AS d2,
        |         ${lagk(3)} AS d3
        |  FROM cw)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       ${ratio("d1")} AS acf1,
        |       ${ratio("d2")} AS acf2,
        |       ${ratio("d3")} AS acf3
        |FROM cl GROUP BY 1
        |ORDER BY event_type NULLS FIRST""".stripMargin
    },
    "q_ts_theil_sen" -> {
      s"""WITH m AS MATERIALIZED (
        |  SELECT event_type AS g,
        |         CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400
        |           AS t,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |p AS (
        |  SELECT a.g, (b.v - a.v) / CAST(b.t - a.t AS DOUBLE) AS slope
        |  FROM m a JOIN m b ON a.g = b.g AND b.t > a.t),
        |r AS (
        |  SELECT g, slope,
        |         CAST(row_number() OVER (PARTITION BY g
        |           ORDER BY slope NULLS FIRST) AS BIGINT) AS rn,
        |         CAST(count(*) OVER (PARTITION BY g) AS BIGINT)
        |           AS n_pairs
        |  FROM p)
        |SELECT g AS event_type, n_pairs, ${Det.r4Sql("slope")} AS slope
        |FROM r WHERE rn = (n_pairs + 1) // 2
        |ORDER BY event_type NULLS FIRST""".stripMargin
    },
    "q_ts_partial_corr" -> {
      def num(ab: String, a: String, b: String) =
        s"CAST(CAST(n AS HUGEINT) * $ab - CAST($a AS HUGEINT) * $b" +
          s" AS DOUBLE)"
      def vv(aa: String, a: String) =
        s"CAST(CAST(n AS HUGEINT) * $aa - CAST($a AS HUGEINT) * $a" +
          s" AS DOUBLE)"
      val vx = vv("sxx", "sx"); val vy = vv("syy", "sy")
      val vz = vv("szz", "sz")
      val rxy = s"(${num("sxy", "sx", "sy")} / sqrt($vx * $vy))"
      val rxz = s"(${num("sxz", "sx", "sz")} / sqrt($vx * $vz))"
      val ryz = s"(${num("syz", "sy", "sz")} / sqrt($vy * $vz))"
      val den = s"((1.0 - $rxz * $rxz) * (1.0 - $ryz * $ryz))"
      val ok = s"n > 2 AND $vx > 0.0 AND $vy > 0.0 AND $vz > 0.0"
      s"""WITH m AS MATERIALIZED (
        |  SELECT event_type AS g,
        |         CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400
        |           AS t,
        |         CAST(CAST(${Det.avg4Sql("value")} AS DECIMAL(18,4))
        |           * 10000 AS BIGINT) AS q
        |  FROM events GROUP BY 1, 2),
        |j AS (
        |  SELECT a.q AS x, b.q AS y, c.q AS z
        |  FROM (SELECT t, q FROM m WHERE g = 'click') a
        |  JOIN (SELECT t, q FROM m WHERE g = 'purchase') b ON a.t = b.t
        |  JOIN (SELECT t, q FROM m WHERE g = 'view') c ON a.t = c.t),
        |mm AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(x) AS BIGINT) AS sx,
        |         CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(z) AS BIGINT) AS sz,
        |         sum(CAST(x AS HUGEINT) * x) AS sxx,
        |         sum(CAST(y AS HUGEINT) * y) AS syy,
        |         sum(CAST(z AS HUGEINT) * z) AS szz,
        |         sum(CAST(x AS HUGEINT) * y) AS sxy,
        |         sum(CAST(x AS HUGEINT) * z) AS sxz,
        |         sum(CAST(y AS HUGEINT) * z) AS syz
        |  FROM j)
        |SELECT n AS n_days,
        |       CASE WHEN $ok THEN ${Det.r4Sql(rxy)} END AS r_xy,
        |       CASE WHEN $ok THEN ${Det.r4Sql(rxz)} END AS r_xz,
        |       CASE WHEN $ok THEN ${Det.r4Sql(ryz)} END AS r_yz,
        |       CASE WHEN ($ok) AND $den > 0.0 THEN
        |         ${Det.r4Sql(s"($rxy - $rxz * $ryz) / sqrt($den)")}
        |       END AS r_xy_z
        |FROM mm""".stripMargin
    },
    "q_ts_newey_west" -> {
      val lrv = "CAST(g0 AS DOUBLE) + 2.0 * (0.75 * CAST(g1 AS DOUBLE)" +
        " + 0.5 * CAST(g2 AS DOUBLE) + 0.25 * CAST(g3 AS DOUBLE))"
      val v0 = "CAST(g0 AS DOUBLE) / (CAST(n AS DOUBLE) * " +
        "CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 100000000.0)"
      s"""WITH m AS MATERIALIZED (
        |  SELECT event_type AS g,
        |         CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400
        |           AS t,
        |         CAST(CAST(${Det.avg4Sql("value")} AS DECIMAL(18,4))
        |           * 10000 AS BIGINT) AS q
        |  FROM events GROUP BY 1, 2),
        |e AS (
        |  SELECT g, t,
        |         CAST(count(*) OVER (PARTITION BY g) AS BIGINT) * q -
        |           CAST(sum(q) OVER (PARTITION BY g) AS BIGINT) AS e,
        |         CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS n
        |  FROM m),
        |l AS (
        |  SELECT g, n, e,
        |         lag(e, 1) OVER w AS e1,
        |         lag(e, 2) OVER w AS e2,
        |         lag(e, 3) OVER w AS e3
        |  FROM e WINDOW w AS (PARTITION BY g ORDER BY t NULLS FIRST)),
        |a AS (
        |  SELECT g, n,
        |         sum(CAST(e AS HUGEINT) * e) AS g0,
        |         sum(CASE WHEN e1 IS NOT NULL THEN
        |           CAST(e AS HUGEINT) * e1 ELSE 0 END) AS g1,
        |         sum(CASE WHEN e2 IS NOT NULL THEN
        |           CAST(e AS HUGEINT) * e2 ELSE 0 END) AS g2,
        |         sum(CASE WHEN e3 IS NOT NULL THEN
        |           CAST(e AS HUGEINT) * e3 ELSE 0 END) AS g3
        |  FROM l GROUP BY 1, 2)
        |SELECT g AS event_type, n AS n_days,
        |       ${Det.r4Sql(v0)} AS var0,
        |       CASE WHEN g0 > 0 THEN ${Det.r4Sql(s"($lrv) / CAST(g0 AS DOUBLE)")} END
        |         AS lrv_ratio
        |FROM a
        |ORDER BY event_type NULLS FIRST""".stripMargin
    },
    "q_ts_durbin_watson" -> {
      val dw = "CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * " +
        "CAST(sd2 AS DOUBLE) / CAST(se2 AS DOUBLE)"
      s"""WITH m AS MATERIALIZED (
        |  SELECT event_type AS g,
        |         CAST(epoch(date_trunc('day', ts)) AS BIGINT) // 86400
        |           AS t,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |mq AS (
        |  SELECT g, t,
        |         CAST(CAST(v AS DECIMAL(18,4)) * 10000 AS BIGINT) AS q
        |  FROM m),
        |d AS (
        |  SELECT g, t, q,
        |         lag(q) OVER (PARTITION BY g ORDER BY t NULLS FIRST)
        |           AS qp,
        |         CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS n,
        |         CAST(sum(q) OVER (PARTITION BY g) AS BIGINT) AS s
        |  FROM mq),
        |a AS (
        |  SELECT g, n,
        |         sum(CASE WHEN qp IS NOT NULL THEN
        |           CAST(q - qp AS HUGEINT) * (q - qp) ELSE 0 END) AS sd2,
        |         sum(CAST(n * q - s AS HUGEINT) * (n * q - s)) AS se2
        |  FROM d GROUP BY 1, 2)
        |SELECT g AS event_type, n AS n_days,
        |       CASE WHEN n > 1 AND se2 > 0 THEN ${Det.r4Sql(dw)} END
        |         AS dw
        |FROM a
        |ORDER BY event_type NULLS FIRST""".stripMargin
    },
    "q_ts_granger" -> {
      val (fXY, gXY, fYX, gYX) = grangerTexts
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY 1, 2),
        |c AS (
        |  SELECT event_type, bucket,
        |         CAST(CAST(v AS DECIMAL(18,4)) * 10000 AS BIGINT) AS q
        |  FROM h1),
        |j AS (
        |  SELECT y.bucket AS bucket, y.q AS y, x.q AS x
        |  FROM (SELECT bucket, q FROM c WHERE event_type = 'purchase') y
        |  JOIN (SELECT bucket, q FROM c WHERE event_type = 'click') x
        |    ON y.bucket = x.bucket),
        |lg AS (
        |  SELECT y, x,
        |         lag(y, 1) OVER (ORDER BY bucket NULLS FIRST) AS yl,
        |         lag(x, 1) OVER (ORDER BY bucket NULLS FIRST) AS xl
        |  FROM j),
        |ag AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         sum(CAST(y AS HUGEINT)) AS sy,
        |         sum(CAST(x AS HUGEINT)) AS sx,
        |         sum(CAST(yl AS HUGEINT)) AS syl,
        |         sum(CAST(xl AS HUGEINT)) AS sxl,
        |         sum(CAST(y AS HUGEINT) * y) AS syy,
        |         sum(CAST(x AS HUGEINT) * x) AS sxx,
        |         sum(CAST(yl AS HUGEINT) * yl) AS sylyl,
        |         sum(CAST(xl AS HUGEINT) * xl) AS sxlxl,
        |         sum(CAST(y AS HUGEINT) * yl) AS syyl,
        |         sum(CAST(y AS HUGEINT) * xl) AS syxl,
        |         sum(CAST(x AS HUGEINT) * xl) AS sxxl,
        |         sum(CAST(x AS HUGEINT) * yl) AS sxyl,
        |         sum(CAST(yl AS HUGEINT) * xl) AS sylxl
        |  FROM lg WHERE yl IS NOT NULL)
        |SELECT n,
        |       CASE WHEN $gXY THEN ${Det.r4Sql(fXY)} ELSE NULL END
        |         AS f_xy,
        |       CASE WHEN $gYX THEN ${Det.r4Sql(fYX)} ELSE NULL END
        |         AS f_yx
        |FROM ag""".stripMargin
    },
    "q_ts_ljung_box" -> {
      def lagk(k: Int) =
        s"lag(d, $k) OVER (PARTITION BY event_type ORDER BY bucket)"
      def rk(s: String) =
        s"(CAST(sum(d * $s) AS DOUBLE) / CAST(sum(d * d) AS DOUBLE))"
      val (r1, r2, r3) = (rk("d1"), rk("d2"), rk("d3"))
      val nD = "CAST(count(*) AS DOUBLE)"
      val bp = s"$nD * ($r1 * $r1 + $r2 * $r2 + $r3 * $r3)"
      val lb = s"$nD * ($nD + 2.0) * " +
        s"($r1 * $r1 / ($nD - 1.0) + $r2 * $r2 / ($nD - 2.0) + " +
        s"$r3 * $r3 / ($nD - 3.0))"
      val ok = "count(*) > 3 AND sum(d * d) > 0"
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |c AS (
        |  SELECT event_type, bucket,
        |         CAST(CAST(v AS DECIMAL(18,4)) * 10000 AS BIGINT) AS q
        |  FROM h1),
        |cw AS (
        |  SELECT event_type, bucket,
        |         CAST(count(*) OVER (PARTITION BY event_type) * q -
        |              sum(q) OVER (PARTITION BY event_type)
        |           AS DECIMAL(19,0)) AS d
        |  FROM c),
        |cl AS (
        |  SELECT event_type, d, ${lagk(1)} AS d1, ${lagk(2)} AS d2,
        |         ${lagk(3)} AS d3
        |  FROM cw)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       CASE WHEN $ok THEN ${Det.r4Sql(bp)} ELSE NULL END AS q_bp,
        |       CASE WHEN $ok THEN ${Det.r4Sql(lb)} ELSE NULL END AS q_lb
        |FROM cl GROUP BY 1
        |ORDER BY event_type NULLS FIRST""".stripMargin
    },
    "q_ts_pacf" -> {
      def lagk(k: Int) =
        s"lag(d, $k) OVER (PARTITION BY event_type ORDER BY bucket)"
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |c AS (
        |  SELECT event_type, bucket,
        |         CAST(CAST(v AS DECIMAL(18,4)) * 10000 AS BIGINT) AS q
        |  FROM h1),
        |cw AS (
        |  SELECT event_type, bucket,
        |         CAST(count(*) OVER (PARTITION BY event_type) * q -
        |              sum(q) OVER (PARTITION BY event_type)
        |           AS DECIMAL(19,0)) AS d
        |  FROM c),
        |cl AS (
        |  SELECT event_type, d, ${lagk(1)} AS d1, ${lagk(2)} AS d2
        |  FROM cw),
        |r AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(d * d1) AS DOUBLE) / CAST(sum(d * d) AS DOUBLE) AS r1,
        |         CAST(sum(d * d2) AS DOUBLE) / CAST(sum(d * d) AS DOUBLE) AS r2
        |  FROM cl GROUP BY 1)
        |SELECT event_type, n, ${Det.r4Sql("r1")} AS pacf1,
        |       ${Det.r4Sql("(r2 - r1 * r1) / (1.0 - r1 * r1)")} AS pacf2
        |FROM r
        |ORDER BY event_type NULLS FIRST""".stripMargin
    },
    "q_ts_trimmed_mean" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |rk AS (
        |  SELECT event_type, v,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY v, bucket) AS r,
        |         count(*) OVER (PARTITION BY event_type) AS n
        |  FROM h1)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept,
        |       ${Det.davg4Sql("v")} AS trimmed_mean
        |FROM rk WHERE r > n // 10 AND r <= n - n // 10
        |GROUP BY 1
        |ORDER BY event_type NULLS FIRST""".stripMargin,
    "q_ts_constant_line" ->
      s"""WITH g AS (
        |  SELECT date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1)
        |SELECT CASE WHEN k = 0 THEN 'events.avg' ELSE 'constant(100)' END AS series,
        |       bucket,
        |       CASE WHEN k = 0 THEN v ELSE CAST(100.0 AS DOUBLE) END AS v
        |FROM g CROSS JOIN (SELECT unnest([0, 1]) AS k)
        |ORDER BY series NULLS FIRST, bucket NULLS FIRST""".stripMargin,
    "q_ts_range_of_series" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n_series,
        |       ${Det.r4Sql("max(v) - min(v)")} AS rng
        |FROM h1 GROUP BY 1
        |ORDER BY bucket NULLS FIRST""".stripMargin,
    "q_ts_dashboard_shift" ->
      s"""WITH d1 AS (
        |  SELECT event_type, date_trunc('day', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2)
        |SELECT a.event_type, a.bucket, a.v, b.v AS v_prev,
        |       ${Det.r4Sql("a.v - b.v")} AS delta,
        |       ${Det.r4Sql("a.v * 100.0 / nullif(b.v, 0.0) - 100.0")} AS pct_change
        |FROM d1 a LEFT JOIN d1 b
        |  ON b.event_type = a.event_type
        | AND b.bucket + INTERVAL '7 days' = a.bucket
        |ORDER BY a.event_type NULLS FIRST, a.bucket NULLS FIRST""".stripMargin,
    "q_ts_variance_ratio" -> {
      val vr = "((CAST(sq AS DOUBLE) * CAST(t AS DOUBLE)) / " +
        "(CAST(nq AS DOUBLE) * 6.0 * CAST(s1 AS DOUBLE)))"
      val z = s"(($vr - 1.0) / sqrt((2.0 * (2 * 6 - 1) * (6 - 1) / " +
        "(3.0 * 6)) / CAST(t AS DOUBLE)))"
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |y AS (
        |  SELECT event_type, bucket,
        |         CAST(CAST(v AS DECIMAL(18,4)) * 10000 AS BIGINT) AS ys
        |  FROM h1),
        |x AS MATERIALIZED (
        |  SELECT event_type,
        |         ys - lag(ys, 1) OVER w AS d1,
        |         ys - lag(ys, 6) OVER w AS dq
        |  FROM y
        |  WINDOW w AS (PARTITION BY event_type
        |    ORDER BY bucket NULLS FIRST)),
        |ext AS MATERIALIZED (
        |  SELECT event_type,
        |         CAST(sum(CASE WHEN d1 IS NOT NULL THEN 1 ELSE 0 END)
        |           AS BIGINT) AS t,
        |         CAST(sum(CASE WHEN dq IS NOT NULL THEN 1 ELSE 0 END)
        |           AS BIGINT) AS nq,
        |         CAST(sum(d1) AS BIGINT) AS delta
        |  FROM x GROUP BY 1),
        |s AS (
        |  SELECT x.event_type, t, nq,
        |         sum(CASE WHEN d1 IS NOT NULL THEN
        |             CAST(t * d1 - delta AS HUGEINT) * (t * d1 - delta)
        |           ELSE CAST(0 AS HUGEINT) END) AS s1,
        |         sum(CASE WHEN dq IS NOT NULL THEN
        |             CAST(t * dq - 6 * delta AS HUGEINT) *
        |               (t * dq - 6 * delta)
        |           ELSE CAST(0 AS HUGEINT) END) AS sq
        |  FROM x JOIN ext ON ext.event_type = x.event_type
        |  GROUP BY 1, 2, 3)
        |SELECT event_type, t, nq,
        |       CASE WHEN s1 > 0 THEN ${Det.r4Sql(vr)} END AS vr,
        |       CASE WHEN s1 > 0 AND t > 0 THEN ${Det.r4Sql(z)} END AS z
        |FROM s ORDER BY event_type NULLS FIRST""".stripMargin
    },
    "q_ts_dickey_fuller" -> {
      val rho = "(CAST(rnum AS DOUBLE) / CAST(rden AS DOUBLE))"
      val a = s"((CAST(sy AS DOUBLE) - $rho * CAST(sx AS DOUBLE))" +
        " / CAST(t AS DOUBLE))"
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |y AS (
        |  SELECT event_type, bucket,
        |         CAST(CAST(v AS DECIMAL(18,4)) * 10000 AS BIGINT) AS ys
        |  FROM h1),
        |x AS MATERIALIZED (
        |  SELECT event_type, bucket, xv, yv FROM (
        |    SELECT event_type, bucket,
        |           lag(ys, 1) OVER (PARTITION BY event_type
        |             ORDER BY bucket NULLS FIRST) AS xv,
        |           ys - lag(ys, 1) OVER (PARTITION BY event_type
        |             ORDER BY bucket NULLS FIRST) AS yv
        |    FROM y)
        |  WHERE xv IS NOT NULL),
        |mo AS MATERIALIZED (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS t,
        |         CAST(sum(xv) AS BIGINT) AS sx,
        |         CAST(sum(yv) AS BIGINT) AS sy,
        |         sum(CAST(xv AS HUGEINT) * yv) AS sxy,
        |         sum(CAST(xv AS HUGEINT) * xv) AS sxx
        |  FROM x GROUP BY 1),
        |mo2 AS MATERIALIZED (
        |  SELECT *, CAST(t AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
        |           AS rnum,
        |         CAST(t AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
        |           AS rden
        |  FROM mo),
        |uq AS (
        |  SELECT x.event_type,
        |         CAST(yv AS DOUBLE) - ($a + $rho * CAST(xv AS DOUBLE))
        |           AS u
        |  FROM x JOIN mo2 ON mo2.event_type = x.event_type),
        |s2 AS (
        |  SELECT event_type,
        |         CAST(sum(CAST(floor(u * u) AS BIGINT)) AS BIGINT)
        |           AS su2
        |  FROM uq GROUP BY 1)
        |SELECT mo2.event_type, t AS n_diff,
        |       CASE WHEN rden > 0 THEN ${Det.r4Sql(rho)} END AS rho,
        |       CASE WHEN rden > 0 AND t > 2 AND su2 > 0 THEN
        |         ${Det.r4Sql(s"$rho / sqrt((CAST(su2 AS DOUBLE) / " +
                   "(CAST(t AS DOUBLE) - 2.0)) * CAST(t AS DOUBLE) / " +
                   "CAST(rden AS DOUBLE))")}
        |       END AS df_t
        |FROM mo2 JOIN s2 ON s2.event_type = mo2.event_type
        |ORDER BY mo2.event_type NULLS FIRST""".stripMargin
    },
    "q_ts_cox_stuart" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |x AS MATERIALIZED (
        |  SELECT event_type, v,
        |         CAST(row_number() OVER (PARTITION BY event_type
        |           ORDER BY bucket NULLS FIRST) AS BIGINT) AS i,
        |         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
        |           AS n
        |  FROM h1),
        |p AS (
        |  SELECT a.event_type,
        |         CAST(sum(CASE WHEN b.v > a.v THEN 1 ELSE 0 END)
        |           AS BIGINT) AS s_plus,
        |         CAST(sum(CASE WHEN b.v < a.v THEN 1 ELSE 0 END)
        |           AS BIGINT) AS s_minus
        |  FROM x a JOIN x b ON b.event_type = a.event_type
        |    AND b.i = a.i + (a.n + 1) // 2
        |  GROUP BY 1)
        |SELECT event_type, s_plus + s_minus AS m, s_plus, s_minus,
        |       CASE WHEN s_plus + s_minus > 0 THEN
        |         ${Det.r4Sql("CASE WHEN s_plus * 2 > s_plus + s_minus " +
                   "THEN (CAST(s_plus * 2 - (s_plus + s_minus) AS DOUBLE)" +
                   " - 1.0) / sqrt(CAST(s_plus + s_minus AS DOUBLE)) " +
                   "WHEN s_plus * 2 < s_plus + s_minus " +
                   "THEN (CAST(s_plus * 2 - (s_plus + s_minus) AS DOUBLE)" +
                   " + 1.0) / sqrt(CAST(s_plus + s_minus AS DOUBLE)) " +
                   "ELSE 0.0 END")}
        |       END AS z
        |FROM p ORDER BY event_type NULLS FIRST""".stripMargin,
    "q_ts_kpss_trend" -> {
      val slope = "(CAST(bnum AS DOUBLE) / CAST(bden AS DOUBLE))"
      val a = s"((CAST(sy AS DOUBLE) - $slope * CAST(st AS DOUBLE))" +
        " / CAST(n AS DOUBLE))"
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |y AS MATERIALIZED (
        |  SELECT event_type, bucket,
        |         CAST(CAST(v AS DECIMAL(18,4)) * 10000 AS BIGINT) AS ys,
        |         CAST(row_number() OVER (PARTITION BY event_type
        |           ORDER BY bucket NULLS FIRST) AS BIGINT) AS t
        |  FROM h1),
        |mo AS MATERIALIZED (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(t) AS BIGINT) AS st,
        |         CAST(sum(ys) AS BIGINT) AS sy,
        |         sum(CAST(t AS HUGEINT) * ys) AS sty,
        |         sum(CAST(t AS HUGEINT) * t) AS stt
        |  FROM y GROUP BY 1),
        |mo2 AS MATERIALIZED (
        |  SELECT *, CAST(n AS HUGEINT) * sty - CAST(st AS HUGEINT) * sy
        |           AS bnum,
        |         CAST(n AS HUGEINT) * stt - CAST(st AS HUGEINT) * st
        |           AS bden
        |  FROM mo),
        |uq AS (
        |  SELECT y.event_type, y.bucket, mo2.n, mo2.bden,
        |         CAST(floor(CASE WHEN bden > 0 THEN
        |           CAST(ys AS DOUBLE) - ($a + $slope * CAST(t AS DOUBLE))
        |         ELSE 0.0 END) AS BIGINT) AS uq
        |  FROM y JOIN mo2 ON mo2.event_type = y.event_type),
        |lagged AS (
        |  SELECT event_type, n, bden, uq,
        |         sum(uq) OVER (PARTITION BY event_type
        |           ORDER BY bucket NULLS FIRST
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS ns,
        |         lag(uq, 1) OVER (PARTITION BY event_type
        |           ORDER BY bucket NULLS FIRST) AS e1,
        |         lag(uq, 2) OVER (PARTITION BY event_type
        |           ORDER BY bucket NULLS FIRST) AS e2,
        |         lag(uq, 3) OVER (PARTITION BY event_type
        |           ORDER BY bucket NULLS FIRST) AS e3,
        |         lag(uq, 4) OVER (PARTITION BY event_type
        |           ORDER BY bucket NULLS FIRST) AS e4
        |  FROM uq),
        |s AS (
        |  SELECT event_type, n, bden,
        |         sum(CAST(ns AS HUGEINT) * ns) AS sns2,
        |         sum(CAST(uq AS HUGEINT) * uq) AS g0,
        |         sum(CASE WHEN e1 IS NOT NULL
        |           THEN CAST(uq AS HUGEINT) * e1 ELSE 0 END) AS g1,
        |         sum(CASE WHEN e2 IS NOT NULL
        |           THEN CAST(uq AS HUGEINT) * e2 ELSE 0 END) AS g2,
        |         sum(CASE WHEN e3 IS NOT NULL
        |           THEN CAST(uq AS HUGEINT) * e3 ELSE 0 END) AS g3,
        |         sum(CASE WHEN e4 IS NOT NULL
        |           THEN CAST(uq AS HUGEINT) * e4 ELSE 0 END) AS g4
        |  FROM lagged GROUP BY 1, 2, 3)
        |SELECT event_type, n,
        |       CASE WHEN bden > 0 AND g0 > 0 THEN
        |         ${Det.r4Sql("CAST(sns2 AS DOUBLE) / " +
                   "(CAST(n AS DOUBLE) * CAST(g0 AS DOUBLE))")}
        |       END AS eta_0,
        |       CASE WHEN bden > 0 AND g0 * 5 + (g1 * 4 + g2 * 3 +
        |           g3 * 2 + g4) * 2 > 0 THEN
        |         ${Det.r4Sql("5.0 * CAST(sns2 AS DOUBLE) / " +
                   "(CAST(n AS DOUBLE) * CAST(g0 * 5 + (g1 * 4 + g2 * 3" +
                   " + g3 * 2 + g4) * 2 AS DOUBLE))")}
        |       END AS eta_4
        |FROM s ORDER BY event_type NULLS FIRST""".stripMargin
    },
    "q_ts_pp" -> {
      val rho = "(CAST(rnum AS DOUBLE) / CAST(rden AS DOUBLE))"
      val a = s"((CAST(sy AS DOUBLE) - $rho * CAST(sx AS DOUBLE))" +
        " / CAST(n AS DOUBLE))"
      val lam2 = "(CAST(l5 AS DOUBLE) / (5.0 * CAST(n AS DOUBLE)))"
      val gam0 = "(CAST(g0 AS DOUBLE) / CAST(n AS DOUBLE))"
      val s2 = "(CAST(g0 AS DOUBLE) / (CAST(n AS DOUBLE) - 2.0))"
      val se = s"sqrt($s2 * CAST(n AS DOUBLE) / CAST(rden AS DOUBLE))"
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |y AS (
        |  SELECT event_type, bucket,
        |         CAST(CAST(v AS DECIMAL(18,4)) * 10000 AS BIGINT) AS ys
        |  FROM h1),
        |x AS MATERIALIZED (
        |  SELECT event_type, bucket, xv, yv FROM (
        |    SELECT event_type, bucket,
        |           lag(ys, 1) OVER (PARTITION BY event_type
        |             ORDER BY bucket NULLS FIRST) AS xv,
        |           ys - lag(ys, 1) OVER (PARTITION BY event_type
        |             ORDER BY bucket NULLS FIRST) AS yv
        |    FROM y)
        |  WHERE xv IS NOT NULL),
        |mo AS MATERIALIZED (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(xv) AS BIGINT) AS sx,
        |         CAST(sum(yv) AS BIGINT) AS sy,
        |         sum(CAST(xv AS HUGEINT) * yv) AS sxy,
        |         sum(CAST(xv AS HUGEINT) * xv) AS sxx
        |  FROM x GROUP BY 1),
        |mo2 AS MATERIALIZED (
        |  SELECT *, CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
        |           AS rnum,
        |         CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
        |           AS rden
        |  FROM mo),
        |uq AS (
        |  SELECT x.event_type, x.bucket,
        |         CASE WHEN rden <> 0 THEN
        |           CAST(yv AS DOUBLE) - ($a + $rho * CAST(xv AS DOUBLE))
        |         ELSE 0.0 END AS u
        |  FROM x JOIN mo2 ON mo2.event_type = x.event_type),
        |ul AS (
        |  SELECT event_type, u,
        |         lag(u, 1) OVER (PARTITION BY event_type
        |           ORDER BY bucket NULLS FIRST) AS u1,
        |         lag(u, 2) OVER (PARTITION BY event_type
        |           ORDER BY bucket NULLS FIRST) AS u2,
        |         lag(u, 3) OVER (PARTITION BY event_type
        |           ORDER BY bucket NULLS FIRST) AS u3,
        |         lag(u, 4) OVER (PARTITION BY event_type
        |           ORDER BY bucket NULLS FIRST) AS u4
        |  FROM uq),
        |g AS (
        |  SELECT event_type,
        |         CAST(sum(CAST(floor(u * u) AS BIGINT)) AS BIGINT)
        |           AS g0,
        |         CAST(sum(CASE WHEN u1 IS NOT NULL
        |           THEN CAST(floor(u * u1) AS BIGINT) ELSE 0 END)
        |           AS BIGINT) AS g1,
        |         CAST(sum(CASE WHEN u2 IS NOT NULL
        |           THEN CAST(floor(u * u2) AS BIGINT) ELSE 0 END)
        |           AS BIGINT) AS g2,
        |         CAST(sum(CASE WHEN u3 IS NOT NULL
        |           THEN CAST(floor(u * u3) AS BIGINT) ELSE 0 END)
        |           AS BIGINT) AS g3,
        |         CAST(sum(CASE WHEN u4 IS NOT NULL
        |           THEN CAST(floor(u * u4) AS BIGINT) ELSE 0 END)
        |           AS BIGINT) AS g4
        |  FROM ul GROUP BY 1),
        |g2t AS (
        |  SELECT *, g0 * 5 + (g1 * 4 + g2 * 3 + g3 * 2 + g4) * 2 AS l5
        |  FROM g)
        |SELECT mo2.event_type, n AS n_diff,
        |       CASE WHEN rden > 0 THEN ${Det.r4Sql(rho)} END AS rho,
        |       CASE WHEN rden > 0 AND n > 2 AND g0 > 0 AND l5 > 0 THEN
        |         ${Det.r4Sql(s"sqrt($gam0 / $lam2) * ($rho / $se) - " +
                   s"($lam2 - $gam0) * CAST(n AS DOUBLE) * $se / " +
                   s"(2.0 * sqrt($lam2) * $s2)")}
        |       END AS z_t
        |FROM mo2 JOIN g2t ON g2t.event_type = mo2.event_type
        |ORDER BY mo2.event_type NULLS FIRST""".stripMargin
    },
    "q_ts_kpss" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |y AS (
        |  SELECT event_type, bucket,
        |         CAST(CAST(v AS DECIMAL(18,4)) * 10000 AS BIGINT) AS ys
        |  FROM h1),
        |tot AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(ys) AS BIGINT) AS sy
        |  FROM y GROUP BY 1),
        |e AS MATERIALIZED (
        |  SELECT y.event_type, y.bucket, tot.n,
        |         tot.n * y.ys - tot.sy AS et
        |  FROM y JOIN tot ON tot.event_type = y.event_type),
        |lagged AS (
        |  SELECT event_type, n, et,
        |         sum(et) OVER (PARTITION BY event_type
        |           ORDER BY bucket NULLS FIRST
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS ns,
        |         lag(et, 1) OVER (PARTITION BY event_type
        |           ORDER BY bucket NULLS FIRST) AS e1,
        |         lag(et, 2) OVER (PARTITION BY event_type
        |           ORDER BY bucket NULLS FIRST) AS e2,
        |         lag(et, 3) OVER (PARTITION BY event_type
        |           ORDER BY bucket NULLS FIRST) AS e3,
        |         lag(et, 4) OVER (PARTITION BY event_type
        |           ORDER BY bucket NULLS FIRST) AS e4
        |  FROM e),
        |s AS (
        |  SELECT event_type, n,
        |         sum(CAST(ns AS HUGEINT) * ns) AS sns2,
        |         sum(CAST(et AS HUGEINT) * et) AS g0,
        |         sum(CASE WHEN e1 IS NOT NULL
        |           THEN CAST(et AS HUGEINT) * e1 ELSE 0 END) AS g1,
        |         sum(CASE WHEN e2 IS NOT NULL
        |           THEN CAST(et AS HUGEINT) * e2 ELSE 0 END) AS g2,
        |         sum(CASE WHEN e3 IS NOT NULL
        |           THEN CAST(et AS HUGEINT) * e3 ELSE 0 END) AS g3,
        |         sum(CASE WHEN e4 IS NOT NULL
        |           THEN CAST(et AS HUGEINT) * e4 ELSE 0 END) AS g4
        |  FROM lagged GROUP BY 1, 2)
        |SELECT event_type, n,
        |       CASE WHEN g0 > 0 THEN
        |         ${Det.r4Sql("CAST(sns2 AS DOUBLE) / " +
                   "(CAST(n AS DOUBLE) * CAST(g0 AS DOUBLE))")}
        |       END AS eta_0,
        |       CASE WHEN g0 * 5 + (g1 * 4 + g2 * 3 + g3 * 2 + g4) * 2
        |           > 0 THEN
        |         ${Det.r4Sql("5.0 * CAST(sns2 AS DOUBLE) / " +
                   "(CAST(n AS DOUBLE) * CAST(g0 * 5 + (g1 * 4 + g2 * 3" +
                   " + g3 * 2 + g4) * 2 AS DOUBLE))")}
        |       END AS eta_4
        |FROM s ORDER BY event_type NULLS FIRST""".stripMargin,
    "q_ts_bartels" -> {
      val rvn = "(CAST(num AS DOUBLE) / CAST(den AS DOUBLE))"
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |ranked AS (
        |  SELECT event_type, bucket,
        |         2 * CAST(rank() OVER (PARTITION BY event_type
        |           ORDER BY v NULLS FIRST) AS BIGINT) +
        |           CAST(count(*) OVER (PARTITION BY event_type, v)
        |             AS BIGINT) - 1 AS m,
        |         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
        |           AS n
        |  FROM h1),
        |seqd AS (
        |  SELECT event_type, n, m,
        |         lead(m, 1) OVER (PARTITION BY event_type
        |           ORDER BY bucket NULLS FIRST) AS m1
        |  FROM ranked),
        |s AS (
        |  SELECT event_type, n,
        |         sum(CASE WHEN m1 IS NOT NULL
        |           THEN CAST(m - m1 AS HUGEINT) * (m - m1)
        |           ELSE 0 END) AS num,
        |         sum(CAST(m - n - 1 AS HUGEINT) * (m - n - 1)) AS den
        |  FROM seqd GROUP BY 1, 2)
        |SELECT event_type, n,
        |       CASE WHEN den > 0 THEN ${Det.r4Sql(rvn)} END AS rvn,
        |       CASE WHEN den > 0 THEN
        |         ${Det.r4Sql(s"($rvn - 2.0) * sqrt(CAST(n AS DOUBLE))" +
                   " / 2.0")}
        |       END AS z
        |FROM s ORDER BY event_type NULLS FIRST""".stripMargin
    },
    "q_ts_adf" -> {
      val rho = "(CAST(rnum AS DOUBLE) / CAST(det AS DOUBLE))"
      val phi = "(CAST(pnum AS DOUBLE) / CAST(det AS DOUBLE))"
      val a = s"((CAST(sy AS DOUBLE) - $rho * CAST(sx AS DOUBLE)" +
        s" - $phi * CAST(sz AS DOUBLE)) / CAST(n AS DOUBLE))"
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |y AS (
        |  SELECT event_type, bucket,
        |         CAST(CAST(v AS DECIMAL(18,4)) * 10000 AS BIGINT) AS ys
        |  FROM h1),
        |x AS MATERIALIZED (
        |  SELECT event_type, l1 AS xv, l1 - l2 AS zv, ys - l1 AS yv
        |  FROM (
        |    SELECT event_type, ys,
        |           lag(ys, 1) OVER (PARTITION BY event_type
        |             ORDER BY bucket NULLS FIRST) AS l1,
        |           lag(ys, 2) OVER (PARTITION BY event_type
        |             ORDER BY bucket NULLS FIRST) AS l2
        |    FROM y)
        |  WHERE l2 IS NOT NULL),
        |mo AS MATERIALIZED (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(xv) AS BIGINT) AS sx,
        |         CAST(sum(zv) AS BIGINT) AS sz,
        |         CAST(sum(yv) AS BIGINT) AS sy,
        |         sum(CAST(xv AS HUGEINT) * xv) AS sxx,
        |         sum(CAST(zv AS HUGEINT) * zv) AS szz,
        |         sum(CAST(xv AS HUGEINT) * zv) AS sxz,
        |         sum(CAST(xv AS HUGEINT) * yv) AS sxy,
        |         sum(CAST(zv AS HUGEINT) * yv) AS szy
        |  FROM x GROUP BY 1),
        |mo2 AS MATERIALIZED (
        |  SELECT *, czz * cxy - cxz * czy AS rnum,
        |         cxx * czy - cxz * cxy AS pnum,
        |         cxx * czz - cxz * cxz AS det
        |  FROM (
        |    SELECT *,
        |           CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
        |             AS cxx,
        |           CAST(n AS HUGEINT) * szz - CAST(sz AS HUGEINT) * sz
        |             AS czz,
        |           CAST(n AS HUGEINT) * sxz - CAST(sx AS HUGEINT) * sz
        |             AS cxz,
        |           CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
        |             AS cxy,
        |           CAST(n AS HUGEINT) * szy - CAST(sz AS HUGEINT) * sy
        |             AS czy
        |    FROM mo)),
        |uq AS (
        |  SELECT x.event_type,
        |         CASE WHEN det > 0 THEN
        |           CAST(yv AS DOUBLE) - ($a + $rho * CAST(xv AS DOUBLE)
        |             + $phi * CAST(zv AS DOUBLE))
        |         ELSE 0.0 END AS u
        |  FROM x JOIN mo2 ON mo2.event_type = x.event_type),
        |s2 AS (
        |  SELECT event_type,
        |         CAST(sum(CAST(floor(u * u) AS BIGINT)) AS BIGINT)
        |           AS su2
        |  FROM uq GROUP BY 1)
        |SELECT mo2.event_type, n AS n_eff,
        |       CASE WHEN det > 0 THEN ${Det.r4Sql(rho)} END AS rho,
        |       CASE WHEN det > 0 THEN ${Det.r4Sql(phi)} END AS phi,
        |       CASE WHEN det > 0 AND n > 3 AND su2 > 0 THEN
        |         ${Det.r4Sql(s"$rho / sqrt((CAST(su2 AS DOUBLE) / " +
                   "(CAST(n AS DOUBLE) - 3.0)) * CAST(n AS DOUBLE) * " +
                   "CAST(czz AS DOUBLE) / CAST(det AS DOUBLE))")}
        |       END AS adf_t
        |FROM mo2 JOIN s2 ON s2.event_type = mo2.event_type
        |ORDER BY mo2.event_type NULLS FIRST""".stripMargin
    },
    "q_ts_coint" -> {
      val beta = "(CAST(bnum AS DOUBLE) / CAST(bden AS DOUBLE))"
      val alpha = s"((CAST(sy AS DOUBLE) - $beta * CAST(sx AS DOUBLE))" +
        " / CAST(n AS DOUBLE))"
      val rho = "(CAST(q1s AS DOUBLE) / CAST(q2s AS DOUBLE))"
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |x AS MATERIALIZED (
        |  SELECT event_type, bucket,
        |         CAST(CAST(v AS DECIMAL(18,4)) * 10000 AS BIGINT) AS ys
        |  FROM h1),
        |p AS MATERIALIZED (
        |  SELECT a.event_type AS ma, b.event_type AS mb, a.bucket,
        |         a.ys AS xa, b.ys AS yb
        |  FROM x a JOIN x b ON a.bucket = b.bucket
        |  WHERE a.event_type < b.event_type),
        |mo AS MATERIALIZED (
        |  SELECT ma, mb, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(xa) AS BIGINT) AS sx,
        |         CAST(sum(yb) AS BIGINT) AS sy,
        |         sum(CAST(xa AS HUGEINT) * yb) AS sxy,
        |         sum(CAST(xa AS HUGEINT) * xa) AS sxx
        |  FROM p GROUP BY 1, 2),
        |mo2 AS MATERIALIZED (
        |  SELECT *, CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
        |           AS bnum,
        |         CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
        |           AS bden
        |  FROM mo),
        |we AS MATERIALIZED (
        |  SELECT p.ma, p.mb, p.bucket,
        |         CASE WHEN bden <> 0 THEN
        |           (CAST(yb AS DOUBLE) - ($alpha + $beta *
        |             CAST(xa AS DOUBLE))) / 10000.0
        |         ELSE 0.0 END AS e
        |  FROM p JOIN mo2 ON mo2.ma = p.ma AND mo2.mb = p.mb),
        |lg AS MATERIALIZED (
        |  SELECT ma, mb, e,
        |         lag(e, 1) OVER (PARTITION BY ma, mb
        |           ORDER BY bucket NULLS FIRST) AS el
        |  FROM we),
        |ld AS MATERIALIZED (
        |  SELECT ma, mb, el, e - el AS de FROM lg
        |  WHERE el IS NOT NULL),
        |q12 AS MATERIALIZED (
        |  SELECT ma, mb, CAST(count(*) AS BIGINT) AS t,
        |         CAST(sum(CAST(floor(el * de * 1000000000.0) AS BIGINT))
        |           AS BIGINT) AS q1s,
        |         CAST(sum(CAST(floor(el * el * 1000000000.0) AS BIGINT))
        |           AS BIGINT) AS q2s
        |  FROM ld GROUP BY 1, 2),
        |uq AS (
        |  SELECT ld.ma, ld.mb,
        |         CASE WHEN q2s > 0 THEN ld.de - $rho * ld.el
        |         ELSE 0.0 END AS u
        |  FROM ld JOIN q12 ON q12.ma = ld.ma AND q12.mb = ld.mb),
        |q3 AS (
        |  SELECT ma, mb,
        |         CAST(sum(CAST(floor(u * u * 1000000000.0) AS BIGINT))
        |           AS BIGINT) AS q3s
        |  FROM uq GROUP BY 1, 2)
        |SELECT q12.ma, q12.mb, q12.t AS n_diff,
        |       CASE WHEN bden > 0 THEN ${Det.r4Sql(beta)} END AS beta,
        |       CASE WHEN q2s > 0 THEN ${Det.r4Sql(rho)} END AS rho,
        |       CASE WHEN q2s > 0 AND t > 2 AND q3s > 0 THEN
        |         ${Det.r4Sql(s"$rho / sqrt((CAST(q3s AS DOUBLE) / " +
                   "(CAST(t AS DOUBLE) - 1.0)) / CAST(q2s AS DOUBLE))")}
        |       END AS df_t
        |FROM q12
        |JOIN q3 ON q3.ma = q12.ma AND q3.mb = q12.mb
        |JOIN mo2 ON mo2.ma = q12.ma AND mo2.mb = q12.mb
        |ORDER BY q12.ma NULLS FIRST, q12.mb NULLS FIRST""".stripMargin
    },
    "q_ts_grubbs" -> {
      val vnum = "(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy)"
      val sd = s"sqrt(CAST($vnum AS DOUBLE) / " +
        "(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) / 10000.0"
      def g(num: String) =
        s"(CAST($num AS DOUBLE) / (CAST(n AS DOUBLE) * 10000.0)) / ($sd)"
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |x AS (
        |  SELECT event_type,
        |         CAST(CAST(v AS DECIMAL(18,4)) * 10000 AS BIGINT) AS ys
        |  FROM h1),
        |s AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(ys) AS BIGINT) AS sy,
        |         sum(CAST(ys AS HUGEINT) * ys) AS syy,
        |         CAST(max(ys) AS BIGINT) AS ymax,
        |         CAST(min(ys) AS BIGINT) AS ymin
        |  FROM x GROUP BY 1)
        |SELECT event_type, n,
        |       ${Det.r4Sql("CAST(ymax AS DOUBLE) / 10000.0")} AS vmax,
        |       ${Det.r4Sql("CAST(ymin AS DOUBLE) / 10000.0")} AS vmin,
        |       CASE WHEN n >= 3 AND $vnum > 0 THEN
        |         ${Det.r4Sql(g("n * ymax - sy"))} END AS g_max,
        |       CASE WHEN n >= 3 AND $vnum > 0 THEN
        |         ${Det.r4Sql(g("sy - n * ymin"))} END AS g_min
        |FROM s ORDER BY event_type NULLS FIRST""".stripMargin
    },
    "q_ts_hoeffding" -> {
      val num = "(CAST((n - 2) * (n - 3) AS HUGEINT) * d1 + d2 - " +
        "2 * CAST(n - 2 AS HUGEINT) * d3)"
      val den = "(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) * " +
        "(CAST(n AS DOUBLE) - 2.0) * (CAST(n AS DOUBLE) - 3.0) * " +
        "(CAST(n AS DOUBLE) - 4.0))"
      s"""WITH h1 AS MATERIALIZED (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |p AS MATERIALIZED (
        |  SELECT a.event_type AS ma, b.event_type AS mb, a.bucket,
        |         a.v AS va, b.v AS vb
        |  FROM h1 a JOIN h1 b ON a.bucket = b.bucket
        |  WHERE a.event_type < b.event_type),
        |ranked AS MATERIALIZED (
        |  SELECT ma, mb,
        |         CAST(row_number() OVER (PARTITION BY ma, mb
        |           ORDER BY va NULLS FIRST, bucket NULLS FIRST)
        |           AS BIGINT) AS r,
        |         CAST(row_number() OVER (PARTITION BY ma, mb
        |           ORDER BY vb NULLS FIRST, bucket NULLS FIRST)
        |           AS BIGINT) AS s
        |  FROM p),
        |q AS MATERIALIZED (
        |  SELECT i.ma, i.mb, i.r, i.s, CAST(count(j.r) AS BIGINT) AS qn
        |  FROM ranked i LEFT JOIN ranked j
        |    ON j.ma = i.ma AND j.mb = i.mb AND j.r < i.r AND j.s < i.s
        |  GROUP BY 1, 2, 3, 4),
        |st AS (
        |  SELECT ma, mb, CAST(count(*) AS BIGINT) AS n,
        |         sum(CAST(qn AS HUGEINT) * (qn - 1)) AS d1,
        |         sum(CAST((r - 1) * (r - 2) AS HUGEINT) *
        |             ((s - 1) * (s - 2))) AS d2,
        |         sum(CAST(r - 2 AS HUGEINT) * (s - 2) * qn) AS d3
        |  FROM q GROUP BY 1, 2)
        |SELECT ma, mb, n,
        |       CASE WHEN n >= 5 THEN
        |         ${Det.r4Sql(s"30.0 * CAST($num AS DOUBLE) / $den")}
        |       END AS d
        |FROM st ORDER BY ma NULLS FIRST, mb NULLS FIRST""".stripMargin
    },
    "q_ts_fano" -> {
      val num = "(CAST(n AS HUGEINT) * sc2 - CAST(sc AS HUGEINT) * sc)"
      val den = "(CAST(n - 1 AS HUGEINT) * sc)"
      val mean = "(CAST(sc AS DOUBLE) / CAST(n AS DOUBLE))"
      val sigma = s"sqrt(CAST($num AS DOUBLE) / " +
        "(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))"
      s"""WITH c0 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT unnest(generate_series(
        |        (SELECT date_trunc('hour', min(ts)) FROM events),
        |        (SELECT date_trunc('hour', max(ts)) FROM events),
        |        INTERVAL '1 hour')) AS bucket),
        |t AS (SELECT DISTINCT event_type FROM c0),
        |grid AS (
        |  SELECT t.event_type, g.bucket, COALESCE(c.c, 0) AS c
        |  FROM t CROSS JOIN g
        |  LEFT JOIN c0 c ON c.event_type = t.event_type
        |    AND c.bucket = g.bucket),
        |s AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(c) AS BIGINT) AS sc,
        |         CAST(sum(c * c) AS BIGINT) AS sc2
        |  FROM grid GROUP BY 1)
        |SELECT event_type, n AS n_buckets, sc AS n_events,
        |       ${Det.r4Sql(mean)} AS mean_rate,
        |       CASE WHEN $den > 0 THEN
        |         ${Det.r4Sql(s"CAST($num AS DOUBLE) / CAST($den AS DOUBLE)")}
        |       END AS vmr,
        |       CASE WHEN sc > 0 AND n > 1 THEN
        |         ${Det.r4Sql(s"($sigma - $mean) / ($sigma + $mean)")}
        |       END AS burstiness
        |FROM s ORDER BY event_type NULLS FIRST""".stripMargin
    },
    "q_ts_timeslice" ->
      s"""WITH r AS (
        |  SELECT event_type,
        |         TIMESTAMP '1970-01-01' + ((epoch_us(ts) // 21600000000) * 21600) * INTERVAL '1 second' AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT unnest(generate_series((SELECT min(bucket) FROM r),
        |                                    (SELECT max(bucket) FROM r),
        |                                    INTERVAL '6 hour')) AS bucket),
        |t AS (SELECT DISTINCT event_type FROM events),
        |lo AS (SELECT min(bucket) AS lo FROM g)
        |SELECT t.event_type, g.bucket,
        |       CASE WHEN g.bucket >= lo.lo + INTERVAL '5 day'
        |             AND g.bucket <  lo.lo + INTERVAL '15 day'
        |            THEN r.v END AS v
        |FROM g CROSS JOIN t CROSS JOIN lo
        |LEFT JOIN r ON r.event_type = t.event_type AND r.bucket = g.bucket
        |ORDER BY t.event_type NULLS FIRST, g.bucket NULLS FIRST""".stripMargin,
    "q_ts_hitcount" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, date_trunc('day', bucket) AS day,
        |       CAST(sum(CAST(v AS DECIMAL(18,4)) * 3600) AS DOUBLE) AS hits,
        |       count(*) AS n_buckets
        |FROM h1 GROUP BY 1, 2
        |ORDER BY event_type NULLS FIRST, day NULLS FIRST""".stripMargin,
    "q_ts_offset_zero" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, bucket,
        |       ${Det.r4Sql("v - min(v) OVER (PARTITION BY event_type)")} AS v
        |FROM h1
        |ORDER BY event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin,
    "q_ts_changed" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, bucket, v,
        |       CAST(CASE WHEN lag(v) OVER w IS NOT NULL
        |                  AND v <> lag(v) OVER w THEN 1 ELSE 0 END AS BIGINT) AS chg
        |FROM h1
        |WINDOW w AS (PARTITION BY event_type ORDER BY bucket)
        |ORDER BY event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin,
    "q_ts_delay" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, bucket, v,
        |       lag(v, 3) OVER (PARTITION BY event_type ORDER BY bucket) AS v_delayed
        |FROM h1
        |ORDER BY event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin,
    "q_ts_most_deviant" -> {
      val n = "CAST(n AS DOUBLE)"
      val s1 = "CAST(s1d AS DOUBLE)"
      val s2 = "CAST(s2d AS DOUBLE)"
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |g AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |         sum(CAST(v AS DECIMAL(18,8))) AS s1d,
        |         sum(CAST(v * v AS DECIMAL(18,8))) AS s2d
        |  FROM h1 GROUP BY 1 HAVING count(*) >= 2)
        |SELECT event_type, n,
        |       ${Det.r4Sql(s"($s2 - ($s1 * $s1) / $n) / $n")} AS variance
        |FROM g
        |ORDER BY variance DESC NULLS LAST, event_type NULLS FIRST
        |LIMIT 3""".stripMargin
    },
    "q_ts_derivative" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, bucket, v,
        |       ${Det.r4Sql("v - lag(v, 1) OVER (PARTITION BY event_type ORDER BY bucket)")} AS dv
        |FROM h1
        |ORDER BY event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin,
    "q_ts_rollup_avg" ->
      s"""SELECT event_type, date_trunc('hour', ts) AS bucket, ${Det.avg4Sql("value")} AS v
        |FROM events GROUP BY 1, 2
        |ORDER BY event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin,
    "q_ts_rollup_sum" ->
      s"""SELECT event_type, date_trunc('hour', ts) AS bucket, ${Det.sum4Sql("value")} AS v
        |FROM events GROUP BY 1, 2
        |ORDER BY event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin,
    "q_ts_rollup_minmax" ->
      s"""SELECT event_type, date_trunc('hour', ts) AS bucket,
        |       round(min(value), 4) AS mn, round(max(value), 4) AS mx
        |FROM events GROUP BY 1, 2
        |ORDER BY event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin,
    "q_ts_rollup_last" ->
      s"""SELECT event_type, date_trunc('hour', ts) AS bucket,
        |       round(arg_max(value, ts), 4) AS v
        |FROM events GROUP BY 1, 2
        |ORDER BY event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin,
    "q_ts_align_10m" ->
      s"""SELECT event_type, (epoch_us(ts) // 600000000) * 600 AS bucket_s,
        |       count(*) AS n, ${Det.avg4Sql("value")} AS v
        |FROM events GROUP BY 1, 2
        |ORDER BY event_type NULLS FIRST, bucket_s NULLS FIRST""".stripMargin,
    "q_ts_gapfill" ->
      s"""WITH r AS (
        |  SELECT event_type,
        |         TIMESTAMP '1970-01-01' + ((epoch_us(ts) // 21600000000) * 21600) * INTERVAL '1 second' AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT unnest(generate_series((SELECT min(bucket) FROM r),
        |                                    (SELECT max(bucket) FROM r),
        |                                    INTERVAL '6 hour')) AS bucket),
        |t AS (SELECT DISTINCT event_type FROM events)
        |SELECT t.event_type, g.bucket, r.v
        |FROM g CROSS JOIN t
        |LEFT JOIN r ON r.event_type = t.event_type AND r.bucket = g.bucket
        |ORDER BY t.event_type NULLS FIRST, g.bucket NULLS FIRST""".stripMargin,
    "q_ts_integral" ->
      """WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         sum(CAST(value AS DECIMAL(18,4))) AS sv
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, bucket, CAST(sv AS DOUBLE) AS v,
        |       CAST(sum(sv) OVER (PARTITION BY event_type ORDER BY bucket
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum
        |FROM h1
        |ORDER BY event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin,
    "q_ts_integral_by_day" ->
      """WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         sum(CAST(value AS DECIMAL(18,4))) AS sv
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, bucket, CAST(sv AS DOUBLE) AS v,
        |       CAST(sum(sv) OVER (
        |         PARTITION BY event_type, date_trunc('day', bucket)
        |         ORDER BY bucket
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_day
        |FROM h1
        |ORDER BY event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin,
    "q_ts_value_histogram" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |b AS (
        |  SELECT event_type, v,
        |         CAST(CAST(v AS DECIMAL(18,4)) * 10000 AS BIGINT) // 50000 AS bin
        |  FROM h1)
        |SELECT event_type, bin, count(*) AS n,
        |       min(v) AS v_min, max(v) AS v_max,
        |       CAST(bin * 5 AS DOUBLE) AS bin_lo
        |FROM b GROUP BY 1, 2
        |ORDER BY event_type NULLS FIRST, bin NULLS FIRST""".stripMargin,
    "q_ts_series_corr" -> {
      val sx = "CAST(sum(CAST(va AS DECIMAL(18,8))) AS DOUBLE)"
      val sy = "CAST(sum(CAST(vb AS DECIMAL(18,8))) AS DOUBLE)"
      val sxy = "CAST(sum(CAST(va * vb AS DECIMAL(18,8))) AS DOUBLE)"
      val sxx = "CAST(sum(CAST(va * va AS DECIMAL(18,8))) AS DOUBLE)"
      val syy = "CAST(sum(CAST(vb * vb AS DECIMAL(18,8))) AS DOUBLE)"
      val nd = "CAST(count(*) AS DOUBLE)"
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |p AS (
        |  SELECT a.event_type AS ma, b.event_type AS mb,
        |         a.v AS va, b.v AS vb
        |  FROM h1 a JOIN h1 b ON a.bucket = b.bucket
        |  WHERE a.event_type < b.event_type)
        |SELECT ma, mb, count(*) AS n,
        |       ${Det.r4Sql(s"($nd * $sxy - $sx * $sy) / (sqrt($nd * $sxx - $sx * $sx) * sqrt($nd * $syy - $sy * $sy))")} AS corr
        |FROM p GROUP BY 1, 2
        |ORDER BY ma NULLS FIRST, mb NULLS FIRST""".stripMargin
    },
    "q_ts_spearman" -> {
      // DECIMAL(19,0) products summed in DECIMAL(38,0) — the q_ts_acf
      // discipline, mirroring the Spark side's overflow-proof sums
      val nd = "CAST(count(*) AS DOUBLE)"
      val sx = "CAST(sum(CAST(ra2 AS DECIMAL(19,0))) AS DOUBLE)"
      val sy = "CAST(sum(CAST(rb2 AS DECIMAL(19,0))) AS DOUBLE)"
      val sxy = "CAST(sum(CAST(ra2 AS DECIMAL(19,0)) * CAST(rb2 AS DECIMAL(19,0))) AS DOUBLE)"
      val sxx = "CAST(sum(CAST(ra2 AS DECIMAL(19,0)) * CAST(ra2 AS DECIMAL(19,0))) AS DOUBLE)"
      val syy = "CAST(sum(CAST(rb2 AS DECIMAL(19,0)) * CAST(rb2 AS DECIMAL(19,0))) AS DOUBLE)"
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |p AS (
        |  SELECT a.event_type AS ma, b.event_type AS mb, a.bucket AS bucket,
        |         a.v AS va, b.v AS vb
        |  FROM h1 a JOIN h1 b ON a.bucket = b.bucket
        |  WHERE a.event_type < b.event_type),
        |r AS (
        |  SELECT ma, mb, va, vb,
        |         row_number() OVER (PARTITION BY ma, mb
        |           ORDER BY va, bucket) AS rna,
        |         row_number() OVER (PARTITION BY ma, mb
        |           ORDER BY vb, bucket) AS rnb
        |  FROM p),
        |r2 AS (
        |  SELECT ma, mb,
        |         CAST(2 * min(rna) OVER (PARTITION BY ma, mb, va)
        |           + count(*) OVER (PARTITION BY ma, mb, va) - 1
        |           AS BIGINT) AS ra2,
        |         CAST(2 * min(rnb) OVER (PARTITION BY ma, mb, vb)
        |           + count(*) OVER (PARTITION BY ma, mb, vb) - 1
        |           AS BIGINT) AS rb2
        |  FROM r)
        |SELECT ma, mb, CAST(count(*) AS BIGINT) AS n,
        |       ${Det.r4Sql(s"($nd * $sxy - $sx * $sy) / (sqrt($nd * $sxx - $sx * $sx) * sqrt($nd * $syy - $sy * $sy))")} AS rho
        |FROM r2 GROUP BY 1, 2
        |ORDER BY ma NULLS FIRST, mb NULLS FIRST""".stripMargin
    },
    "q_ts_xcorr" -> {
      val sx = "CAST(sum(CAST(va AS DECIMAL(18,8))) AS DOUBLE)"
      val sy = "CAST(sum(CAST(vb AS DECIMAL(18,8))) AS DOUBLE)"
      val sxy = "CAST(sum(CAST(va * vb AS DECIMAL(18,8))) AS DOUBLE)"
      val sxx = "CAST(sum(CAST(va * va AS DECIMAL(18,8))) AS DOUBLE)"
      val syy = "CAST(sum(CAST(vb * vb AS DECIMAL(18,8))) AS DOUBLE)"
      val nd = "CAST(count(*) AS DOUBLE)"
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |h2 AS (SELECT event_type, epoch_us(bucket) // 1000000 AS bs, v
        |       FROM h1),
        |l AS (SELECT unnest(generate_series(-3, 3)) AS lag),
        |p AS (
        |  SELECT a.event_type AS ma, b.event_type AS mb,
        |         CAST(l.lag AS BIGINT) AS lag, a.v AS va, b.v AS vb
        |  FROM h2 a CROSS JOIN l
        |  JOIN h2 b ON a.event_type < b.event_type
        |    AND a.bs + l.lag * 3600 = b.bs)
        |SELECT ma, mb, lag, count(*) AS n,
        |       ${Det.r4Sql(s"($nd * $sxy - $sx * $sy) / (sqrt($nd * $sxx - $sx * $sx) * sqrt($nd * $syy - $sy * $sy))")} AS xcorr
        |FROM p GROUP BY 1, 2, 3
        |ORDER BY ma NULLS FIRST, mb NULLS FIRST, lag NULLS FIRST""".stripMargin
    },
    "q_ts_stl" ->
      s"""WITH $stlSqlCtes
        |SELECT event_type, bucket, v, trend, seasonal,
        |       detr - seasonal AS resid
        |FROM s
        |ORDER BY event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin,
    "q_ts_hodges_lehmann" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |q1 AS (
        |  SELECT event_type, bucket,
        |         CAST(floor(v * 10000.0 + 0.5) AS BIGINT) AS q
        |  FROM h1),
        |p AS (
        |  SELECT a.event_type, a.bucket, b.bucket AS bucket2,
        |         a.q + b.q AS w
        |  FROM q1 a JOIN q1 b ON a.event_type = b.event_type
        |    AND a.bucket <= b.bucket),
        |r AS (
        |  SELECT event_type, w,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY w NULLS FIRST, bucket NULLS FIRST,
        |             bucket2 NULLS FIRST) AS rn,
        |         count(*) OVER (PARTITION BY event_type) AS np
        |  FROM p)
        |SELECT event_type, CAST(np AS BIGINT) AS n_pairs,
        |       CAST(w AS DOUBLE) / 20000.0 AS hl
        |FROM r WHERE rn = (np + 1) // 2
        |ORDER BY event_type NULLS FIRST""".stripMargin,
    "q_ts_seasonal_strength" -> {
      val fs = "GREATEST(0.0, 1.0 - CASE WHEN vd > 0 THEN " +
        "CAST(vr AS DOUBLE) / CAST(vd AS DOUBLE) ELSE 1.0 END)"
      val ft = "GREATEST(0.0, 1.0 - CASE WHEN vt > 0 THEN " +
        "CAST(vr AS DOUBLE) / CAST(vt AS DOUBLE) ELSE 1.0 END)"
      s"""WITH $stlSqlCtes,
        |c AS (
        |  SELECT event_type,
        |    CAST(floor((detr - seasonal) * 10000.0 + 0.5) AS BIGINT)
        |      AS qr,
        |    CAST(floor(detr * 10000.0 + 0.5) AS BIGINT) AS qd,
        |    CAST(floor((v - seasonal) * 10000.0 + 0.5) AS BIGINT) AS qt
        |  FROM s),
        |g AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(*) * sum(qr * qr) - sum(qr) * sum(qr) AS BIGINT)
        |      AS vr,
        |    CAST(count(*) * sum(qd * qd) - sum(qd) * sum(qd) AS BIGINT)
        |      AS vd,
        |    CAST(count(*) * sum(qt * qt) - sum(qt) * sum(qt) AS BIGINT)
        |      AS vt
        |  FROM c GROUP BY 1)
        |SELECT event_type, n,
        |       ${Det.r4Sql(fs)} AS f_seasonal,
        |       ${Det.r4Sql(ft)} AS f_trend
        |FROM g
        |ORDER BY event_type NULLS FIRST""".stripMargin
    },
    "q_ts_stl_anomaly" ->
      s"""WITH $stlSqlCtes,
        |base AS (
        |  SELECT event_type, bucket, v, detr - seasonal AS resid FROM s),
        |r1 AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |           ORDER BY resid, bucket) AS rn,
        |         count(*) OVER (PARTITION BY event_type) AS n
        |  FROM base),
        |m1 AS (
        |  SELECT *, max(CASE WHEN rn = (n + 1) // 2 THEN resid END)
        |           OVER (PARTITION BY event_type) AS med
        |  FROM r1),
        |d1 AS (SELECT event_type, bucket, v, resid, n,
        |         abs(resid - med) AS dev
        |       FROM m1),
        |r2 AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |           ORDER BY dev, bucket) AS rn2
        |  FROM d1),
        |m2 AS (
        |  SELECT *, max(CASE WHEN rn2 = (n + 1) // 2 THEN dev END)
        |           OVER (PARTITION BY event_type) AS mad
        |  FROM r2),
        |f AS (
        |  SELECT event_type, bucket, v, resid,
        |         ${Det.r4Sql("dev / (mad * 1.4826)")} AS score
        |  FROM m2)
        |SELECT event_type, bucket, v, resid, score
        |FROM f WHERE score > 3.0
        |ORDER BY event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin,
    "q_ts_wilcoxon" -> {
      val z = "CAST(w_plus_x2 - n_pairs * (n_pairs + 1) // 2 AS DOUBLE) / " +
        "sqrt(CAST(n_pairs AS DOUBLE) * CAST(n_pairs + 1 AS DOUBLE) * " +
        "CAST(2 * n_pairs + 1 AS DOUBLE) / 6.0)"
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |d AS (
        |  SELECT a.v - b.v AS dv
        |  FROM h1 a JOIN h1 b ON a.bucket = b.bucket
        |  WHERE a.event_type = 'click' AND b.event_type = 'view'
        |    AND a.v - b.v <> 0.0),
        |ba AS (
        |  SELECT abs(dv) AS ad,
        |         CAST(sum(CASE WHEN dv > 0 THEN 1 ELSE 0 END)
        |           AS BIGINT) AS cp,
        |         CAST(sum(CASE WHEN dv < 0 THEN 1 ELSE 0 END)
        |           AS BIGINT) AS cn
        |  FROM d GROUP BY 1),
        |rk AS (
        |  SELECT cp, cn,
        |         COALESCE(CAST(sum(cp + cn) OVER (ORDER BY ad
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           AS BIGINT), 0) AS cum
        |  FROM ba),
        |r2t AS (SELECT cp, cn, 2 * (cum + 1) + cp + cn - 1 AS r2 FROM rk),
        |agg AS (
        |  SELECT CAST(sum(cp) + sum(cn) AS BIGINT) AS n_pairs,
        |         CAST(sum(cp * r2) AS BIGINT) AS w_plus_x2
        |  FROM r2t)
        |SELECT n_pairs, w_plus_x2,
        |       ${Det.r4Sql(z)} AS z
        |FROM agg""".stripMargin
    },
    "q_ts_kendall" -> {
      val tau = "CAST(nc - nd AS DOUBLE) / " +
        "sqrt(CAST(n0 - tx AS DOUBLE) * CAST(n0 - ty AS DOUBLE))"
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |p AS (
        |  SELECT a.event_type AS ma, b.event_type AS mb, a.bucket AS bucket,
        |         a.v AS va, b.v AS vb
        |  FROM h1 a JOIN h1 b ON a.bucket = b.bucket
        |  WHERE a.event_type < b.event_type),
        |j AS (
        |  SELECT x.ma, x.mb,
        |         x.va AS va, x.vb AS vb, y.va AS va2, y.vb AS vb2
        |  FROM p x JOIN p y ON x.ma = y.ma AND x.mb = y.mb
        |    AND x.bucket < y.bucket),
        |c AS (
        |  SELECT ma, mb, CAST(count(*) AS BIGINT) AS n0,
        |         CAST(sum(CASE WHEN (va - va2) * (vb - vb2) > 0.0
        |           THEN 1 ELSE 0 END) AS BIGINT) AS nc,
        |         CAST(sum(CASE WHEN (va - va2) * (vb - vb2) < 0.0
        |           THEN 1 ELSE 0 END) AS BIGINT) AS nd,
        |         CAST(sum(CASE WHEN va = va2 THEN 1 ELSE 0 END)
        |           AS BIGINT) AS tx,
        |         CAST(sum(CASE WHEN vb = vb2 THEN 1 ELSE 0 END)
        |           AS BIGINT) AS ty
        |  FROM j GROUP BY 1, 2)
        |SELECT ma, mb, n0, nc, nd,
        |       ${Det.r4Sql(tau)} AS tau
        |FROM c
        |ORDER BY ma NULLS FIRST, mb NULLS FIRST""".stripMargin
    },
    "q_ts_lttb" -> lttbOracleSql(
      """h2 AS (
        |  SELECT event_type, epoch_us(bucket) // 60000000 AS x,
        |         CAST(floor(v * 10000.0 + 0.5) AS BIGINT) AS qy,
        |         epoch_us(date_trunc('day', bucket)) // 86400000000
        |           AS di
        |  FROM h1),""".stripMargin),
    "q_ts_lttb_count" -> lttbOracleSql(
      """h2 AS (
        |  SELECT event_type, x, qy,
        |         (row_number() OVER (PARTITION BY event_type
        |            ORDER BY x NULLS FIRST) - 1) // 24 AS di
        |  FROM (SELECT event_type, epoch_us(bucket) // 60000000 AS x,
        |               CAST(floor(v * 10000.0 + 0.5) AS BIGINT) AS qy
        |        FROM h1) t),""".stripMargin),
    "q_ts_mannkendall" -> {
      val z = "CASE WHEN s_stat > 0 THEN " +
        "(CAST(s_stat AS DOUBLE) - 1.0) / sqrt(CAST(var18 AS DOUBLE) / 18.0) " +
        "WHEN s_stat < 0 THEN " +
        "(CAST(s_stat AS DOUBLE) + 1.0) / sqrt(CAST(var18 AS DOUBLE) / 18.0) " +
        "ELSE 0.0 END"
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |p AS (
        |  SELECT a.event_type,
        |         CAST(sum(CASE WHEN b.v > a.v THEN 1 ELSE 0 END)
        |           AS BIGINT) AS np,
        |         CAST(sum(CASE WHEN b.v < a.v THEN 1 ELSE 0 END)
        |           AS BIGINT) AS nm
        |  FROM h1 a JOIN h1 b ON a.event_type = b.event_type
        |    AND a.bucket < b.bucket
        |  GROUP BY 1),
        |n1 AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
        |       FROM h1 GROUP BY 1),
        |t1 AS (SELECT event_type,
        |         CAST(sum(t * (t - 1) * (t * 2 + 5)) AS BIGINT) AS tcorr
        |       FROM (SELECT event_type, v, CAST(count(*) AS BIGINT) AS t
        |             FROM h1 GROUP BY 1, 2) GROUP BY 1),
        |f AS (
        |  SELECT p.event_type, n, np - nm AS s_stat,
        |         n * (n - 1) * (n * 2 + 5) - tcorr AS var18
        |  FROM p JOIN n1 ON p.event_type = n1.event_type
        |  JOIN t1 ON p.event_type = t1.event_type)
        |SELECT event_type, n, s_stat, var18,
        |       ${Det.r4Sql(z)} AS z
        |FROM f
        |ORDER BY event_type NULLS FIRST""".stripMargin
    },
    "q_ts_seasonal_mk" -> {
      val z = "CASE WHEN s_stat > 0 THEN " +
        "(CAST(s_stat AS DOUBLE) - 1.0) / sqrt(CAST(var18 AS DOUBLE) / 18.0) " +
        "WHEN s_stat < 0 THEN " +
        "(CAST(s_stat AS DOUBLE) + 1.0) / sqrt(CAST(var18 AS DOUBLE) / 18.0) " +
        "ELSE 0.0 END"
      s"""WITH h1 AS MATERIALIZED (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         hour(date_trunc('hour', ts)) AS hod,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2, 3),
        |p AS (
        |  SELECT a.event_type,
        |         CAST(sum(CASE WHEN b.v > a.v THEN 1 ELSE 0 END)
        |           AS BIGINT) AS np,
        |         CAST(sum(CASE WHEN b.v < a.v THEN 1 ELSE 0 END)
        |           AS BIGINT) AS nm
        |  FROM h1 a JOIN h1 b ON a.event_type = b.event_type
        |    AND a.hod = b.hod AND a.bucket < b.bucket
        |  GROUP BY 1),
        |ng AS (SELECT event_type, hod, CAST(count(*) AS BIGINT) AS n_g
        |       FROM h1 GROUP BY 1, 2),
        |tg AS (SELECT event_type, hod,
        |         CAST(sum(t * (t - 1) * (t * 2 + 5)) AS BIGINT)
        |           AS tcorr_g
        |       FROM (SELECT event_type, hod, v,
        |               CAST(count(*) AS BIGINT) AS t
        |             FROM h1 GROUP BY 1, 2, 3) GROUP BY 1, 2),
        |vs AS (
        |  SELECT ng.event_type, CAST(count(*) AS BIGINT) AS n_seasons,
        |         CAST(sum(n_g) AS BIGINT) AS n,
        |         CAST(sum(n_g * (n_g - 1) * (n_g * 2 + 5) - tcorr_g)
        |           AS BIGINT) AS var18
        |  FROM ng JOIN tg ON tg.event_type = ng.event_type
        |    AND tg.hod = ng.hod
        |  GROUP BY 1),
        |f AS (
        |  SELECT p.event_type, n_seasons, n, np - nm AS s_stat, var18
        |  FROM p JOIN vs ON p.event_type = vs.event_type)
        |SELECT event_type, n_seasons, n, s_stat, var18,
        |       ${Det.r4Sql(z)} AS z
        |FROM f
        |ORDER BY event_type NULLS FIRST""".stripMargin
    },
    "q_ts_seasonal_kendall_src" -> {
      val tau = "CAST(CAST(sum(sh) AS BIGINT) AS DOUBLE) / " +
        "(CAST(sum(dq) AS DOUBLE) / 4096.0)"
      s"""WITH byv AS MATERIALIZED (
        |  SELECT hour(ts) AS hod, event_type AS source, value AS x,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2, 3),
        |pers AS (
        |  SELECT hod, source, sum(CAST(c AS HUGEINT) * (c - 1)) AS tself2
        |  FROM byv GROUP BY 1, 2),
        |grid AS (
        |  SELECT g.hod, g.x, s.source, COALESCE(byv.c, 0) AS c
        |  FROM (SELECT DISTINCT hod, x FROM byv) g
        |  CROSS JOIN (SELECT DISTINCT source FROM byv) s
        |  LEFT JOIN byv ON byv.hod = g.hod AND byv.source = s.source
        |    AND byv.x = g.x),
        |cums AS MATERIALIZED (
        |  SELECT hod, source, x, c,
        |         sum(c) OVER (PARTITION BY hod, source
        |           ORDER BY x NULLS FIRST
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS cum,
        |         sum(c) OVER (PARTITION BY hod, source) AS n_g
        |  FROM grid),
        |pairh AS MATERIALIZED (
        |  SELECT a.source AS s1, b.source AS s2, a.hod,
        |         CAST(a.n_g AS BIGINT) AS n1g,
        |         CAST(b.n_g AS BIGINT) AS n2g,
        |         sum(CAST(a.c AS HUGEINT) * (b.n_g - b.cum)) AS nc,
        |         sum(CAST(a.c AS HUGEINT) * (b.cum - b.c)) AS nd,
        |         sum(CAST(a.c AS HUGEINT) * b.c) AS crosst
        |  FROM cums a JOIN cums b ON a.hod = b.hod AND a.x = b.x
        |    AND a.source < b.source
        |  GROUP BY 1, 2, 3, 4, 5),
        |strat AS (
        |  SELECT s1, s2, n1g, n2g, nc - nd AS sh,
        |         CAST(floor(sqrt(CAST(n1g AS DOUBLE) *
        |           CAST(n2g AS DOUBLE) * (CAST(nyt2 AS DOUBLE) / 2.0)) *
        |           4096.0) AS BIGINT) AS dq
        |  FROM (
        |    SELECT pairh.*,
        |           CAST(n1g + n2g AS HUGEINT) * (n1g + n2g - 1) -
        |             (t1.tself2 + t2.tself2 + crosst * 2) AS nyt2
        |    FROM pairh
        |    JOIN pers t1 ON t1.hod = pairh.hod AND t1.source = pairh.s1
        |    JOIN pers t2 ON t2.hod = pairh.hod AND t2.source = pairh.s2))
        |SELECT s1, s2, CAST(sum(n1g) AS BIGINT) AS n1,
        |       CAST(sum(n2g) AS BIGINT) AS n2,
        |       CAST(count(*) AS BIGINT) AS n_strata,
        |       CAST(sum(sh) AS BIGINT) AS s_total,
        |       CASE WHEN sum(dq) > 0 THEN
        |         ${Det.r4Sql(tau)}
        |       END AS tau_sk
        |FROM strat GROUP BY 1, 2
        |ORDER BY s1 NULLS FIRST, s2 NULLS FIRST""".stripMargin
    },
    "q_ts_seasonal_spearman_src" -> {
      val rho = "CAST(sum(numh) AS DOUBLE) / " +
        "(CAST(sum(dq) AS DOUBLE) / 4096.0)"
      s"""WITH byv AS MATERIALIZED (
        |  SELECT hour(ts) AS hod, event_type AS source, value AS x,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2, 3),
        |grid AS (
        |  SELECT g.hod, g.x, s.source, COALESCE(byv.c, 0) AS c
        |  FROM (SELECT DISTINCT hod, x FROM byv) g
        |  CROSS JOIN (SELECT DISTINCT source FROM byv) s
        |  LEFT JOIN byv ON byv.hod = g.hod AND byv.source = s.source
        |    AND byv.x = g.x),
        |cums AS MATERIALIZED (
        |  SELECT hod, source, x, c,
        |         sum(c) OVER (PARTITION BY hod, source
        |           ORDER BY x NULLS FIRST
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c
        |           AS below,
        |         sum(c) OVER (PARTITION BY hod, source) AS n_g
        |  FROM grid),
        |pairh AS MATERIALIZED (
        |  SELECT a.source AS s1, b.source AS s2, a.hod,
        |         CAST(a.n_g AS BIGINT) AS n1g,
        |         CAST(b.n_g AS BIGINT) AS n2g,
        |         sum(CAST(b.c AS HUGEINT) *
        |           ((a.below + b.below) * 2 + a.c + b.c + 1)) AS d2,
        |         sum(CAST(a.c + b.c AS HUGEINT) * (a.c + b.c) *
        |           (a.c + b.c) - (a.c + b.c)) AS tsum
        |  FROM cums a JOIN cums b ON a.hod = b.hod AND a.x = b.x
        |    AND a.source < b.source
        |  GROUP BY 1, 2, 3, 4, 5
        |  HAVING n1g > 0 AND n2g > 0),
        |strat AS (
        |  SELECT s1, s2, n1g, n2g,
        |         CAST(n1g + n2g AS HUGEINT) * aterm AS numh,
        |         CASE WHEN bterm > 0 THEN
        |           CAST(floor(sqrt(CAST(n1g AS DOUBLE) *
        |             CAST(n2g AS DOUBLE) * CAST(n1g + n2g AS DOUBLE) *
        |             (CAST(bterm AS DOUBLE) / 3.0)) * 4096.0) AS BIGINT)
        |         ELSE 0 END AS dq
        |  FROM (
        |    SELECT pairh.*,
        |           d2 - CAST(n2g AS HUGEINT) * (n1g + n2g + 1) AS aterm,
        |           CAST(n1g + n2g AS HUGEINT) * (n1g + n2g) *
        |             (n1g + n2g) - (n1g + n2g) - tsum AS bterm
        |    FROM pairh))
        |SELECT s1, s2, CAST(sum(n1g) AS BIGINT) AS n1,
        |       CAST(sum(n2g) AS BIGINT) AS n2,
        |       CAST(count(*) AS BIGINT) AS n_strata,
        |       CASE WHEN sum(dq) > 0 THEN
        |         ${Det.r4Sql(rho)}
        |       END AS rho_sk
        |FROM strat GROUP BY 1, 2
        |ORDER BY s1 NULLS FIRST, s2 NULLS FIRST""".stripMargin
    },
    "q_ts_mad_outliers" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |r1 AS (
        |  SELECT event_type, bucket, v,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY v, bucket) AS rn,
        |         count(*) OVER (PARTITION BY event_type) AS n
        |  FROM h1),
        |m1 AS (
        |  SELECT *, max(CASE WHEN rn = (n + 1) // 2 THEN v END)
        |              OVER (PARTITION BY event_type) AS med
        |  FROM r1),
        |d AS (SELECT event_type, bucket, v, n, med, abs(v - med) AS dev
        |      FROM m1),
        |r2 AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |              ORDER BY dev, bucket) AS rn2
        |  FROM d),
        |m2 AS (
        |  SELECT *, max(CASE WHEN rn2 = (n + 1) // 2 THEN dev END)
        |              OVER (PARTITION BY event_type) AS mad
        |  FROM r2)
        |SELECT event_type, bucket, v, med, mad,
        |       ${Det.r4Sql("dev / (mad * 1.4826)")} AS score
        |FROM m2
        |WHERE mad > 0.0 AND dev > mad * 1.4826 * 3.0
        |ORDER BY event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin,
    "q_ts_npercentile" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, v,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY v, bucket) AS rn,
        |         count(*) OVER (PARTITION BY event_type) AS n
        |  FROM h1)
        |SELECT event_type, v AS p95
        |FROM r
        |WHERE rn = (19 * n + 19) // 20
        |ORDER BY event_type NULLS FIRST""".stripMargin,
    "q_ts_remove_above_pct" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, bucket, v,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY v, bucket) AS rn,
        |         count(*) OVER (PARTITION BY event_type) AS n
        |  FROM h1),
        |p AS (
        |  SELECT event_type, bucket, v,
        |         max(CASE WHEN rn = (19 * n + 19) // 20 THEN v END)
        |           OVER (PARTITION BY event_type) AS p95
        |  FROM r)
        |SELECT event_type, bucket,
        |       CASE WHEN v > p95 THEN NULL ELSE v END AS v
        |FROM p
        |ORDER BY event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin,
    "q_ts_remove_below" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, bucket,
        |       CASE WHEN v < 20.0 THEN NULL ELSE v END AS v
        |FROM h1
        |ORDER BY event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin,
    "q_ts_consolidate" ->
      s"""SELECT TIMESTAMP '1970-01-01' + ((epoch_us(ts) // 3600000000) * 3600) * INTERVAL '1 second' AS bucket,
        |       round(max(value), 4) AS v, count(*) AS n
        |FROM events
        |WHERE event_type = 'click'
        |  AND ts >= (SELECT max(ts) FROM events) - INTERVAL '20 days'
        |  AND ts <= (SELECT max(ts) FROM events)
        |GROUP BY 1
        |ORDER BY bucket NULLS FIRST""".stripMargin,
    "q_ts_exclude" ->
      s"""WITH m AS (
        |  SELECT 'app.' || event_type || '.host' || CAST(user_id % 3 AS VARCHAR) AS metric,
        |         ts, value
        |  FROM events)
        |SELECT metric, date_trunc('hour', ts) AS bucket,
        |       ${Det.avg4Sql("value")} AS v, count(*) AS n
        |FROM m
        |WHERE regexp_full_match(metric, 'app[.][^.]*[.][^.]*')
        |  AND NOT regexp_matches(metric, 'host1')
        |GROUP BY 1, 2
        |ORDER BY metric NULLS FIRST, bucket NULLS FIRST""".stripMargin,
    "q_ts_sum_series" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2)
        |SELECT bucket, ${Det.sum4Sql("v")} AS sum_v,
        |       count(*) AS n_series,
        |       ${Det.r4Sql("max(v) - min(v)")} AS rng
        |FROM h1 GROUP BY 1
        |ORDER BY bucket NULLS FIRST""".stripMargin,
    "q_ts_transform_null" ->
      s"""WITH r AS (
        |  SELECT event_type,
        |         TIMESTAMP '1970-01-01' + ((epoch_us(ts) // 21600000000) * 21600) * INTERVAL '1 second' AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT unnest(generate_series((SELECT min(bucket) FROM r),
        |                                    (SELECT max(bucket) FROM r),
        |                                    INTERVAL '6 hour')) AS bucket),
        |t AS (SELECT DISTINCT event_type FROM events)
        |SELECT t.event_type, g.bucket, coalesce(r.v, 0.0) AS v
        |FROM g CROSS JOIN t
        |LEFT JOIN r ON r.event_type = t.event_type AND r.bucket = g.bucket
        |ORDER BY t.event_type NULLS FIRST, g.bucket NULLS FIRST""".stripMargin,
    // last-write selection via an explicit (ts DESC, value DESC) window
    // — the same tiebreak as Spark's max_by(value, struct(ts, value)),
    // where arg_max(value, ts) would leave exact-ts ties unspecified
    "q_ts_alias_bynode" ->
      s"""WITH m AS (
        |  SELECT 'app.' || event_type || '.host' || CAST(user_id % 3 AS VARCHAR) AS metric,
        |         ts, value
        |  FROM events),
        |r AS (
        |  SELECT metric, value,
        |         row_number() OVER (PARTITION BY metric
        |           ORDER BY ts DESC, value DESC) AS rn
        |  FROM m)
        |SELECT split_part(metric, '.', 2) AS alias, metric,
        |       round(value, 4) AS current
        |FROM r WHERE rn = 1
        |ORDER BY alias NULLS FIRST, metric NULLS FIRST""".stripMargin,
    "q_ts_weighted_avg" ->
      s"""SELECT event_type, date_trunc('hour', ts) AS bucket,
        |       CAST(sum(CAST(json_extract(props, '$$.k') AS BIGINT)) AS BIGINT) AS sum_w,
        |       CASE WHEN CAST(sum(CAST(json_extract(props, '$$.k') AS BIGINT)) AS BIGINT) > 0
        |            THEN ${Det.r4Sql("CAST(sum(CAST(value AS DECIMAL(18,4)) * CAST(json_extract(props, '$.k') AS BIGINT)) AS DOUBLE) / CAST(CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS DOUBLE)")}
        |            END AS wavg
        |FROM events GROUP BY 1, 2
        |ORDER BY event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin,
    // Daily-seasonal Holt-Winters: the seasonal LIST advances through
    // the recursion by slicing around the one updated slot (pure element
    // copies — the only float math is the s2 formula, textually
    // identical to the fold's), so the triple smoothing reproduces
    // bit-exactly like the simpler Holt pair above.
    "q_ts_holtwinters" ->
      s"""WITH RECURSIVE h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, v,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY bucket) AS rn
        |  FROM h1),
        |cnt AS (SELECT event_type, count(*) AS n FROM r GROUP BY 1),
        |f24 AS (
        |  SELECT event_type, list(v ORDER BY rn) AS ys,
        |         CAST(CAST(sum(CAST(v AS DECIMAL(18,4)) * 10000) AS BIGINT) AS DOUBLE)
        |           / CAST(240000 AS DOUBLE) AS m
        |  FROM r WHERE rn <= 24 GROUP BY 1),
        |rec AS (
        |  SELECT f24.event_type, 24 AS pos, m AS lvl,
        |         CAST(0.0 AS DOUBLE) AS trd,
        |         list_transform(ys, y -> y - m) AS season
        |  FROM f24 JOIN cnt ON cnt.event_type = f24.event_type
        |    AND cnt.n >= 25
        |  UNION ALL
        |  SELECT rec.event_type, rec.pos + 1,
        |         CAST(0.1 AS DOUBLE) * (r.v - rec.season[rec.pos % 24 + 1])
        |           + CAST(0.9 AS DOUBLE) * (rec.lvl + rec.trd),
        |         CAST(0.01 AS DOUBLE) * ((CAST(0.1 AS DOUBLE) * (r.v - rec.season[rec.pos % 24 + 1])
        |             + CAST(0.9 AS DOUBLE) * (rec.lvl + rec.trd)) - rec.lvl)
        |           + CAST(0.99 AS DOUBLE) * rec.trd,
        |         rec.season[1:rec.pos % 24]
        |           || [CAST(0.1 AS DOUBLE) * (r.v - (CAST(0.1 AS DOUBLE) * (r.v - rec.season[rec.pos % 24 + 1])
        |                 + CAST(0.9 AS DOUBLE) * (rec.lvl + rec.trd)))
        |               + CAST(0.9 AS DOUBLE) * rec.season[rec.pos % 24 + 1]]
        |           || rec.season[rec.pos % 24 + 2:24]
        |  FROM rec JOIN r ON r.event_type = rec.event_type
        |    AND r.rn = rec.pos + 1)
        |SELECT rec.event_type, CAST(cnt.n AS INT) AS n,
        |       rec.lvl + rec.trd + rec.season[rec.pos % 24 + 1] AS hw_forecast
        |FROM rec JOIN cnt ON cnt.event_type = rec.event_type
        |WHERE rec.pos = cnt.n
        |ORDER BY rec.event_type NULLS FIRST""".stripMargin,
    // The bands recursion mirrors q_ts_holt_forecast's CTE with the dev
    // EWMA as a third recursion column — every field advances from the
    // pre-update row, exactly as the lambda reads only `acc`.
    "q_ts_holt_bands" ->
      s"""WITH RECURSIVE h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, v,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY bucket) AS rn
        |  FROM h1),
        |cnt AS (SELECT event_type, count(*) AS n FROM r GROUP BY 1),
        |rec AS (
        |  SELECT r1.event_type, 2 AS rn, r1.v AS lvl, r2.v - r1.v AS trd,
        |         CAST(0.0 AS DOUBLE) AS dev
        |  FROM r r1 JOIN r r2 ON r2.event_type = r1.event_type AND r2.rn = 2
        |  WHERE r1.rn = 1
        |  UNION ALL
        |  SELECT rec.event_type, rec.rn + 1,
        |         CAST(0.1 AS DOUBLE) * r.v
        |           + CAST(0.9 AS DOUBLE) * (rec.lvl + rec.trd),
        |         CAST(0.01 AS DOUBLE) * (CAST(0.1 AS DOUBLE) * r.v
        |             + CAST(0.9 AS DOUBLE) * (rec.lvl + rec.trd) - rec.lvl)
        |           + CAST(0.99 AS DOUBLE) * rec.trd,
        |         CAST(0.1 AS DOUBLE) * abs(r.v - (rec.lvl + rec.trd))
        |           + CAST(0.9 AS DOUBLE) * rec.dev
        |  FROM rec JOIN r ON r.event_type = rec.event_type
        |    AND r.rn = rec.rn + 1)
        |SELECT rec.event_type, CAST(cnt.n AS INT) AS n,
        |       rec.lvl + rec.trd AS forecast,
        |       rec.lvl + rec.trd - CAST(3.0 AS DOUBLE) * rec.dev AS lo_band,
        |       rec.lvl + rec.trd + CAST(3.0 AS DOUBLE) * rec.dev AS hi_band
        |FROM rec JOIN cnt ON cnt.event_type = rec.event_type
        |WHERE rec.rn = cnt.n
        |ORDER BY rec.event_type NULLS FIRST""".stripMargin,
    // The sequential Holt fold IS DuckDB-expressible: a recursive CTE
    // advances (lvl, trd) one rn per iteration with the IDENTICAL
    // double-op sequence as the aggregate() lambda (the lvl' expression
    // is repeated inside trd' exactly as the non-CSE'd lambda computes
    // it), so the forecasts agree bit-exactly.
    "q_ts_multiply_series" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n_series,
        |       COALESCE(max(CASE WHEN event_type = 'click' THEN v END), 1.0)
        |       * COALESCE(max(CASE WHEN event_type = 'error' THEN v END), 1.0)
        |       * COALESCE(max(CASE WHEN event_type = 'purchase' THEN v END), 1.0)
        |       * COALESCE(max(CASE WHEN event_type = 'signup' THEN v END), 1.0)
        |       * COALESCE(max(CASE WHEN event_type = 'view' THEN v END), 1.0)
        |         AS product
        |FROM h1 GROUP BY 1
        |ORDER BY bucket NULLS FIRST""".stripMargin,
    "q_ts_ewma" ->
      s"""WITH RECURSIVE h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, v,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY bucket) AS rn
        |  FROM h1),
        |cnt AS (SELECT event_type, count(*) AS n FROM r GROUP BY 1),
        |rec AS (
        |  SELECT event_type, 1 AS rn, v AS s FROM r WHERE rn = 1
        |  UNION ALL
        |  SELECT rec.event_type, rec.rn + 1,
        |         CAST(0.2 AS DOUBLE) * r.v + CAST(0.8 AS DOUBLE) * rec.s
        |  FROM rec JOIN r ON r.event_type = rec.event_type
        |    AND r.rn = rec.rn + 1)
        |SELECT rec.event_type, CAST(cnt.n AS INT) AS n, rec.s AS ewma
        |FROM rec JOIN cnt ON cnt.event_type = rec.event_type
        |WHERE rec.rn = cnt.n
        |ORDER BY rec.event_type NULLS FIRST""".stripMargin,
    "q_ts_ewma_chart" -> {
      val mu = "CAST(s1 AS DOUBLE) / 10000.0 / CAST(n AS DOUBLE)"
      val sd = "sqrt((CAST(s2 AS DOUBLE) / 100000000.0 - " +
        "(CAST(s1 AS DOUBLE) / 10000.0) * (CAST(s1 AS DOUBLE) / 10000.0)" +
        " / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0))"
      val z = "CAST(0.2 AS DOUBLE) * r.v + CAST(0.8 AS DOUBLE) * rec.z"
      val pw = "rec.pw * CAST(0.64 AS DOUBLE)"
      val lim = s"CAST(3.0 AS DOUBLE) * rec.sd * " +
        s"sqrt(CAST(0.2 AS DOUBLE) / CAST(1.8 AS DOUBLE) * " +
        s"(CAST(1.0 AS DOUBLE) - $pw))"
      val br = s"abs($z - rec.mu) > $lim"
      val finLim = "CAST(3.0 AS DOUBLE) * rec.sd * " +
        "sqrt(CAST(0.2 AS DOUBLE) / CAST(1.8 AS DOUBLE) * " +
        "(CAST(1.0 AS DOUBLE) - rec.pw))"
      s"""WITH RECURSIVE h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |h2 AS (
        |  SELECT event_type, bucket, v,
        |         CAST(CAST(v AS DECIMAL(18,4)) * 10000 AS BIGINT) AS q
        |  FROM h1),
        |r AS (
        |  SELECT event_type, v,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY bucket) AS rn
        |  FROM h2),
        |mom AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(q) AS BIGINT) AS s1,
        |         CAST(sum(q * q) AS BIGINT) AS s2
        |  FROM h2 GROUP BY 1 HAVING count(*) >= 2),
        |rec AS (
        |  SELECT event_type, n, 0 AS rn, ($mu) AS mu, ($sd) AS sd,
        |         ($mu) AS z, CAST(1.0 AS DOUBLE) AS pw,
        |         CAST(0 AS BIGINT) AS br, CAST(0 AS BIGINT) AS fi
        |  FROM mom
        |  UNION ALL
        |  SELECT rec.event_type, rec.n, rec.rn + 1, rec.mu, rec.sd,
        |         $z,
        |         $pw,
        |         rec.br + CASE WHEN $br THEN 1 ELSE 0 END,
        |         CASE WHEN rec.fi > 0 THEN rec.fi
        |              WHEN $br THEN rec.rn + 1 ELSE 0 END
        |  FROM rec JOIN r ON r.event_type = rec.event_type
        |    AND r.rn = rec.rn + 1)
        |SELECT event_type, n, br AS breaches, fi AS first_breach,
        |       ${Det.r4Sql("rec.z")} AS ewma,
        |       ${Det.r4Sql(finLim)} AS "limit"
        |FROM rec
        |WHERE rec.rn = rec.n
        |ORDER BY event_type NULLS FIRST""".stripMargin
    },
    "q_ts_page_hinkley" -> {
      val m = "rec.m + (r.v - (rec.sm + r.v) / " +
        "CAST(rec.rn + 1 AS DOUBLE) - CAST(0.005 AS DOUBLE))"
      val mm = s"least(rec.mm, $m)"
      val alarm = s"$m - $mm > CAST(50.0 AS DOUBLE)"
      s"""WITH RECURSIVE h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, v,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY bucket) AS rn
        |  FROM h1),
        |cnt AS (SELECT event_type, count(*) AS n FROM r GROUP BY 1),
        |rec AS (
        |  SELECT event_type, 0 AS rn, CAST(0.0 AS DOUBLE) AS sm,
        |         CAST(0.0 AS DOUBLE) AS m, CAST(0.0 AS DOUBLE) AS mm,
        |         CAST(0 AS BIGINT) AS al, CAST(0 AS BIGINT) AS fi
        |  FROM cnt
        |  UNION ALL
        |  SELECT rec.event_type, rec.rn + 1, rec.sm + r.v,
        |         $m,
        |         $mm,
        |         rec.al + CASE WHEN $alarm THEN 1 ELSE 0 END,
        |         CASE WHEN rec.fi > 0 THEN rec.fi
        |              WHEN $alarm THEN rec.rn + 1 ELSE 0 END
        |  FROM rec JOIN r ON r.event_type = rec.event_type
        |    AND r.rn = rec.rn + 1)
        |SELECT rec.event_type, CAST(cnt.n AS INT) AS n,
        |       CAST(rec.al AS BIGINT) AS alarms,
        |       CAST(rec.fi AS BIGINT) AS first_alarm,
        |       ${Det.r4Sql("rec.m - rec.mm")} AS ph
        |FROM rec JOIN cnt ON cnt.event_type = rec.event_type
        |WHERE rec.rn = cnt.n
        |ORDER BY rec.event_type NULLS FIRST""".stripMargin
    },
    "q_ts_holt_forecast" ->
      s"""WITH RECURSIVE h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, v,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY bucket) AS rn
        |  FROM h1),
        |cnt AS (SELECT event_type, count(*) AS n FROM r GROUP BY 1),
        |rec AS (
        |  SELECT r1.event_type, 2 AS rn, r1.v AS lvl, r2.v - r1.v AS trd
        |  FROM r r1 JOIN r r2 ON r2.event_type = r1.event_type AND r2.rn = 2
        |  WHERE r1.rn = 1
        |  UNION ALL
        |  SELECT rec.event_type, rec.rn + 1,
        |         CAST(0.1 AS DOUBLE) * r.v
        |           + CAST(0.9 AS DOUBLE) * (rec.lvl + rec.trd),
        |         CAST(0.01 AS DOUBLE) * (CAST(0.1 AS DOUBLE) * r.v
        |             + CAST(0.9 AS DOUBLE) * (rec.lvl + rec.trd) - rec.lvl)
        |           + CAST(0.99 AS DOUBLE) * rec.trd
        |  FROM rec JOIN r ON r.event_type = rec.event_type
        |    AND r.rn = rec.rn + 1)
        |SELECT rec.event_type, CAST(cnt.n AS INT) AS n,
        |       rec.lvl + rec.trd AS forecast
        |FROM rec JOIN cnt ON cnt.event_type = rec.event_type
        |WHERE rec.rn = cnt.n
        |ORDER BY rec.event_type NULLS FIRST""".stripMargin,
    "q_ts_holt_damped" ->
      s"""WITH RECURSIVE h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, v,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY bucket) AS rn
        |  FROM h1),
        |cnt AS (SELECT event_type, count(*) AS n FROM r GROUP BY 1),
        |rec AS (
        |  SELECT r1.event_type, 2 AS rn, r1.v AS lvl, r2.v - r1.v AS trd
        |  FROM r r1 JOIN r r2 ON r2.event_type = r1.event_type AND r2.rn = 2
        |  WHERE r1.rn = 1
        |  UNION ALL
        |  SELECT rec.event_type, rec.rn + 1,
        |         CAST(0.1 AS DOUBLE) * r.v
        |           + CAST(0.9 AS DOUBLE)
        |             * (rec.lvl + CAST(0.98 AS DOUBLE) * rec.trd),
        |         CAST(0.01 AS DOUBLE) * (CAST(0.1 AS DOUBLE) * r.v
        |             + CAST(0.9 AS DOUBLE)
        |               * (rec.lvl + CAST(0.98 AS DOUBLE) * rec.trd)
        |             - rec.lvl)
        |           + CAST(0.99 AS DOUBLE)
        |             * (CAST(0.98 AS DOUBLE) * rec.trd)
        |  FROM rec JOIN r ON r.event_type = rec.event_type
        |    AND r.rn = rec.rn + 1)
        |SELECT rec.event_type, CAST(cnt.n AS INT) AS n,
        |       rec.lvl + CAST(0.98 AS DOUBLE) * rec.trd AS forecast
        |FROM rec JOIN cnt ON cnt.event_type = rec.event_type
        |WHERE rec.rn = cnt.n
        |ORDER BY rec.event_type NULLS FIRST""".stripMargin,
    "q_ts_linreg" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |x AS (
        |  SELECT event_type,
        |         (epoch_us(bucket) // 3600000000)
        |           - min(epoch_us(bucket) // 3600000000)
        |             OVER (PARTITION BY event_type) AS h,
        |         CAST(CAST(v AS DECIMAL(18,4)) * 10000 AS BIGINT) AS ys
        |  FROM h1),
        |s AS (
        |  SELECT event_type, count(*) AS n,
        |         CAST(sum(h) AS BIGINT) AS sh,
        |         CAST(sum(h * h) AS BIGINT) AS shh,
        |         CAST(sum(ys) AS BIGINT) AS sy,
        |         CAST(sum(h * ys) AS BIGINT) AS shy,
        |         CAST(max(h) AS BIGINT) AS hmax
        |  FROM x GROUP BY 1)
        |SELECT event_type, n,
        |       ${Det.r4Sql("CAST(n * shy - sh * sy AS DOUBLE) / CAST((n * shh - sh * sh) * 10000 AS DOUBLE)")} AS slope,
        |       ${Det.r4Sql("(CAST(sy AS DOUBLE) / 10000.0 - (CAST(n * shy - sh * sy AS DOUBLE) / CAST((n * shh - sh * sh) * 10000 AS DOUBLE)) * CAST(sh AS DOUBLE)) / CAST(n AS DOUBLE)")} AS intercept,
        |       ${Det.r4Sql("(CAST(n * shy - sh * sy AS DOUBLE) / CAST((n * shh - sh * sh) * 10000 AS DOUBLE)) * CAST(hmax + 24 AS DOUBLE) + ((CAST(sy AS DOUBLE) / 10000.0 - (CAST(n * shy - sh * sy AS DOUBLE) / CAST((n * shh - sh * sh) * 10000 AS DOUBLE)) * CAST(sh AS DOUBLE)) / CAST(n AS DOUBLE))")} AS forecast_24h
        |FROM s
        |ORDER BY event_type NULLS FIRST""".stripMargin,
    "q_ts_cusum" -> {
      val step = "greatest(0, r.s + m.n * x.ys - m.sy)"
      s"""WITH RECURSIVE h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |x AS (
        |  SELECT event_type,
        |         CAST(row_number() OVER (PARTITION BY event_type
        |           ORDER BY bucket NULLS FIRST) AS BIGINT) AS i,
        |         CAST(CAST(v AS DECIMAL(18,4)) * 10000 AS BIGINT) AS ys
        |  FROM h1),
        |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(ys) AS BIGINT) AS sy
        |      FROM x GROUP BY 1),
        |r AS (
        |  SELECT event_type, CAST(0 AS BIGINT) AS i,
        |         CAST(0 AS BIGINT) AS s, CAST(0 AS BIGINT) AS smax,
        |         CAST(0 AS BIGINT) AS tp, CAST(0 AS BIGINT) AS al
        |  FROM m
        |  UNION ALL
        |  SELECT r.event_type, r.i + 1,
        |         $step,
        |         greatest(r.smax, $step),
        |         CASE WHEN $step > r.smax THEN r.i + 1 ELSE r.tp END,
        |         r.al + CASE WHEN $step > 10 * m.n * 10000
        |           THEN 1 ELSE 0 END
        |  FROM r JOIN m USING (event_type)
        |  JOIN x ON x.event_type = r.event_type AND x.i = r.i + 1)
        |SELECT r.event_type, m.n,
        |  ${Det.r4Sql("CAST(r.smax AS DOUBLE) / CAST(m.n * 10000 AS DOUBLE)")} AS cusum_peak,
        |  r.tp AS peak_idx, r.al AS n_alarm
        |FROM r JOIN m USING (event_type)
        |WHERE r.i = m.n
        |ORDER BY r.event_type NULLS FIRST""".stripMargin
    },
    "q_ts_pettitt" -> {
      // midrank identity U_t = t(n+1) − Σ_{i≤t} r2_i with the always-
      // integer r2 = 2·midrank (the q_ts_spearman tie discipline);
      // λ products in DECIMAL(38,0) mirroring the Spark side
      val lam = "CAST(6 * CAST(k_stat AS DECIMAL(19,0)) * " +
        "CAST(k_stat AS DECIMAL(19,0)) AS DOUBLE) / " +
        "CAST(CAST(n AS DECIMAL(19,0)) * CAST(n AS DECIMAL(19,0)) * " +
        "CAST(n + 1 AS DECIMAL(19,0)) AS DOUBLE)"
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, bucket, v,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY v NULLS FIRST, bucket NULLS FIRST) AS rn
        |  FROM h1),
        |r2 AS (
        |  SELECT event_type, bucket,
        |         CAST(2 * min(rn) OVER (PARTITION BY event_type, v)
        |           + count(*) OVER (PARTITION BY event_type, v) - 1
        |           AS BIGINT) AS r2
        |  FROM r),
        |u AS (
        |  SELECT event_type, bucket,
        |         CAST(row_number() OVER w AS BIGINT) AS t,
        |         CAST(sum(r2) OVER (PARTITION BY event_type
        |           ORDER BY bucket NULLS FIRST
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS w2,
        |         CAST(count(*) OVER (PARTITION BY event_type)
        |           AS BIGINT) AS n
        |  FROM r2
        |  WINDOW w AS (PARTITION BY event_type ORDER BY bucket NULLS FIRST)),
        |s AS (
        |  SELECT event_type, bucket, t, n,
        |         t * (n + 1) - w2 AS u, abs(t * (n + 1) - w2) AS k_stat
        |  FROM u WHERE t < n),
        |p AS (
        |  SELECT event_type, bucket, n, u, k_stat,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY k_stat DESC NULLS LAST, t NULLS FIRST) AS pk
        |  FROM s)
        |SELECT event_type, n, k_stat, bucket AS cp_bucket,
        |       CAST(sign(u) AS BIGINT) AS shift_dir,
        |       ${Det.r4Sql(lam)} AS lambda
        |FROM p WHERE pk = 1
        |ORDER BY event_type NULLS FIRST""".stripMargin
    },
    "q_ts_sax" -> {
      // cross-multiplied z-threshold compare on exact integers; m2 as
      // DECIMAL(9,0) × DECIMAL(28,0) → DECIMAL(38,0), mirroring Spark
      val m2 = "CAST(CAST(n AS DECIMAL(9,0)) * CAST(ss AS DECIMAL(28,0))" +
        " - CAST(s AS DECIMAL(19,0)) * CAST(s AS DECIMAL(19,0)) AS DOUBLE)"
      val e = "CAST(n * sq - c * s AS DOUBLE)"
      val thr = s"CAST(c AS DOUBLE) * sqrt($m2)"
      val b = "CAST(0.6745 AS DOUBLE)"
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |x AS (
        |  SELECT event_type,
        |         CAST(row_number() OVER (PARTITION BY event_type
        |           ORDER BY bucket NULLS FIRST) AS BIGINT) - 1 AS idx,
        |         CAST(CAST(v AS DECIMAL(18,4)) * 10000 AS BIGINT) AS q
        |  FROM h1),
        |st AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(q) AS BIGINT) AS s,
        |         sum(CAST(q AS DECIMAL(19,0)) * CAST(q AS DECIMAL(19,0)))
        |           AS ss
        |  FROM x GROUP BY 1),
        |fr AS (
        |  SELECT event_type, idx // 24 AS f,
        |         CAST(sum(q) AS BIGINT) AS sq,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM x GROUP BY 1, 2),
        |sy AS (
        |  SELECT fr.event_type, fr.f, st.n, st.s, st.ss,
        |         CASE WHEN $e < -$b * $thr THEN 'a'
        |              WHEN $e < 0.0 THEN 'b'
        |              WHEN $e < $b * $thr THEN 'c'
        |              ELSE 'd' END AS sym
        |  FROM fr JOIN st USING (event_type))
        |SELECT event_type, max(n) AS n,
        |       CAST(count(*) AS BIGINT) AS n_frames,
        |       string_agg(sym, '' ORDER BY f NULLS FIRST) AS sax_word,
        |       ${Det.r4Sql("CAST(max(s) AS DOUBLE) / CAST(max(n) AS DOUBLE) / 10000.0")} AS mean_v,
        |       ${Det.r4Sql("sqrt(CAST(CAST(max(n) AS DECIMAL(9,0)) * CAST(max(ss) AS DECIMAL(28,0)) - CAST(max(s) AS DECIMAL(19,0)) * CAST(max(s) AS DECIMAL(19,0)) AS DOUBLE)) / CAST(max(n) AS DOUBLE) / 10000.0")} AS sd_v
        |FROM sy GROUP BY 1
        |ORDER BY event_type NULLS FIRST""".stripMargin
    },
    "q_ts_dtw" -> {
      // anti-diagonal DP on exact integers, two 25-slot LISTs carried
      // through the recursion (the holtwinters list pattern); slot→cell
      // numerator is provably even so // vs DIV cannot diverge
      val inf = "900000000000000000"
      val iE = "((2 * m + ((dd + 1) % 2) + (dd + 1) - 24) // 2)"
      val par = "((dd + 1) % 2)"
      val cost = s"abs(qa[$iE + 1] - qb[(dd + 1) - $iE + 1])"
      val pred1 = s"CASE WHEN m - 1 + $par >= 0 AND m - 1 + $par <= 24" +
        s" THEN p1[m + $par] ELSE $inf END"
      val pred2 = s"CASE WHEN m + $par <= 24" +
        s" THEN p1[m + $par + 1] ELSE $inf END"
      val pred3 = "p2[m + 1]"
      val valid = s"$iE >= 0 AND $iE < l AND (dd + 1) - $iE >= 0 AND " +
        s"(dd + 1) - $iE < l AND abs(2 * $iE - (dd + 1)) <= 24"
      val newv = s"CASE WHEN NOT ($valid) THEN $inf ELSE least($inf, " +
        s"$cost + least($pred1, $pred2, $pred3)) END"
      s"""WITH RECURSIVE h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |x AS (
        |  SELECT event_type, bucket,
        |         CAST(CAST(v AS DECIMAL(18,4)) * 10000 AS BIGINT) AS q
        |  FROM h1),
        |arr AS (
        |  SELECT event_type, list(q ORDER BY bucket NULLS FIRST) AS qs,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM x GROUP BY 1),
        |p AS (
        |  SELECT a.event_type AS ma, b.event_type AS mb,
        |         least(a.n, b.n) AS l,
        |         list_slice(a.qs, 1, CAST(least(a.n, b.n) AS INT)) AS qa,
        |         list_slice(b.qs, 1, CAST(least(a.n, b.n) AS INT)) AS qb
        |  FROM arr a JOIN arr b ON a.event_type < b.event_type),
        |rec AS (
        |  SELECT ma, mb, l, qa, qb, CAST(0 AS BIGINT) AS dd,
        |         list_transform(generate_series(CAST(0 AS BIGINT),
        |           CAST(24 AS BIGINT)), m -> CASE WHEN m = 12
        |             THEN abs(qa[1] - qb[1])
        |             ELSE $inf END) AS p1,
        |         list_transform(generate_series(CAST(0 AS BIGINT),
        |           CAST(24 AS BIGINT)), m -> $inf) AS p2
        |  FROM p
        |  UNION ALL
        |  SELECT ma, mb, l, qa, qb, dd + 1,
        |         list_transform(generate_series(CAST(0 AS BIGINT),
        |           CAST(24 AS BIGINT)), m -> $newv),
        |         p1
        |  FROM rec WHERE dd < 2 * l - 2)
        |SELECT ma, mb, l,
        |       ${Det.r4Sql("CAST(p1[13] AS DOUBLE) / 10000.0")} AS dtw_dist,
        |       ${Det.r4Sql("CAST(p1[13] AS DOUBLE) / 10000.0 / CAST(l AS DOUBLE)")} AS dtw_norm
        |FROM rec WHERE dd = 2 * l - 2
        |ORDER BY ma NULLS FIRST, mb NULLS FIRST""".stripMargin
    },
    "q_ts_theilsen" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |x1 AS (
        |  SELECT event_type,
        |         (epoch_us(bucket) // 3600000000)
        |           - min(epoch_us(bucket) // 3600000000)
        |             OVER (PARTITION BY event_type) AS h,
        |         CAST(CAST(v AS DECIMAL(18,4)) * 10000 AS BIGINT) AS ys
        |  FROM h1),
        |x2 AS (
        |  SELECT event_type, h, ys,
        |         max(h) OVER (PARTITION BY event_type) AS hmax
        |  FROM x1),
        |x AS (SELECT event_type, h, ys FROM x2 WHERE h > hmax - 168),
        |p AS (
        |  SELECT a.event_type,
        |         CAST(b.ys - a.ys AS DOUBLE)
        |           / CAST((b.h - a.h) * 10000 AS DOUBLE) AS slope,
        |         a.h AS hi, b.h AS hj
        |  FROM x a JOIN x b
        |    ON b.event_type = a.event_type AND a.h < b.h),
        |r AS (
        |  SELECT event_type, slope,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY slope NULLS FIRST, hi NULLS FIRST,
        |             hj NULLS FIRST) AS rn,
        |         count(*) OVER (PARTITION BY event_type) AS np
        |  FROM p)
        |SELECT event_type, CAST(max(np) AS BIGINT) AS n_pairs,
        |       ${Det.r4Sql("sum(slope) / count(*)")} AS median_slope
        |FROM r WHERE rn = (np + 1) // 2 OR rn = np // 2 + 1
        |GROUP BY 1
        |ORDER BY event_type NULLS FIRST""".stripMargin,
    "q_ts_timeshift" -> {
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2)
        |SELECT a.event_type, a.bucket, a.v, b.v AS v_prev,
        |       ${Det.r4Sql("a.v - b.v")} AS delta
        |FROM h1 a LEFT JOIN h1 b
        |  ON b.event_type = a.event_type
        | AND b.bucket + INTERVAL '24 hours' = a.bucket
        |ORDER BY a.event_type NULLS FIRST, a.bucket NULLS FIRST""".stripMargin
    },
    "q_ts_anomaly" -> {
      val n = "CAST(count(*) OVER w AS DOUBLE)"
      val s1 = "CAST(sum(CAST(v AS DECIMAL(18,8))) OVER w AS DOUBLE)"
      val s2 = "CAST(sum(CAST(v * v AS DECIMAL(18,8))) OVER w AS DOUBLE)"
      val z = Det.r4Sql(
        s"(v - $s1 / $n) / sqrt(($s2 - ($s1 * $s1) / $n) / ($n - 1.0))")
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |zs AS (
        |  SELECT event_type, bucket, v, $z AS z
        |  FROM h1
        |  WINDOW w AS (PARTITION BY event_type))
        |SELECT event_type, bucket, v, z FROM zs WHERE abs(z) > 2.0
        |ORDER BY event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin
    },
    "q_ts_hourofday" ->
      s"""SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
        |       count(*) AS n, ${Det.avg4Sql("value")} AS v
        |FROM events GROUP BY 1, 2
        |ORDER BY event_type NULLS FIRST, hod NULLS FIRST""".stripMargin,
    "q_ts_seasonal" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |t AS (
        |  SELECT event_type, bucket, v, row_number() OVER w AS rn,
        |         ${Det.r4Sql("CAST(sum(CAST(v AS DECIMAL(18,4))) OVER (PARTITION BY event_type ORDER BY bucket ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS DOUBLE) / 24.0")} AS trend
        |  FROM h1
        |  WINDOW w AS (PARTITION BY event_type ORDER BY bucket)),
        |t2 AS (
        |  SELECT event_type, bucket, v, trend,
        |         CAST(hour(bucket) AS BIGINT) AS hod,
        |         ${Det.r4Sql("v - trend")} AS detr
        |  FROM t WHERE rn >= 24),
        |seas AS (
        |  SELECT event_type, hod,
        |         ${Det.r4Sql(Det.dsum4Sql("detr") + " / count(*)")} AS seasonal
        |  FROM t2 GROUP BY 1, 2)
        |SELECT t2.event_type, bucket, v, trend, seasonal,
        |       ${Det.r4Sql("detr - seasonal")} AS residual
        |FROM t2 JOIN seas ON t2.event_type = seas.event_type
        |                 AND t2.hod = seas.hod
        |ORDER BY t2.event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin,
    "q_ts_locf" ->
      s"""WITH r AS (
        |  SELECT event_type,
        |         TIMESTAMP '1970-01-01' + ((epoch_us(ts) // 21600000000) * 21600) * INTERVAL '1 second' AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT unnest(generate_series((SELECT min(bucket) FROM r),
        |                                    (SELECT max(bucket) FROM r),
        |                                    INTERVAL '6 hour')) AS bucket),
        |t AS (SELECT DISTINCT event_type FROM events),
        |dense AS (
        |  SELECT t.event_type, g.bucket, r.v
        |  FROM g CROSS JOIN t
        |  LEFT JOIN r ON r.event_type = t.event_type AND r.bucket = g.bucket)
        |SELECT event_type, bucket, v,
        |       last_value(v IGNORE NULLS) OVER (PARTITION BY event_type
        |         ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
        |FROM dense
        |ORDER BY event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin,
    "q_ts_interpolate" -> {
      val idx = "epoch_us(bucket) // 21600000000"
      val frac = "(CAST(i - ip AS DOUBLE) / CAST(inx - ip AS DOUBLE))"
      s"""WITH r AS (
        |  SELECT event_type,
        |         TIMESTAMP '1970-01-01' + ((epoch_us(ts) // 21600000000) * 21600) * INTERVAL '1 second' AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT unnest(generate_series((SELECT min(bucket) FROM r),
        |                                    (SELECT max(bucket) FROM r),
        |                                    INTERVAL '6 hour')) AS bucket),
        |t AS (SELECT DISTINCT event_type FROM events),
        |dense AS (
        |  SELECT t.event_type, g.bucket, r.v
        |  FROM g CROSS JOIN t
        |  LEFT JOIN r ON r.event_type = t.event_type AND r.bucket = g.bucket),
        |w AS (
        |  SELECT event_type, bucket, v, $idx AS i,
        |         last_value(v IGNORE NULLS) OVER wb AS vp,
        |         last_value(CASE WHEN v IS NOT NULL THEN $idx END IGNORE NULLS) OVER wb AS ip,
        |         first_value(v IGNORE NULLS) OVER wf AS vn,
        |         first_value(CASE WHEN v IS NOT NULL THEN $idx END IGNORE NULLS) OVER wf AS inx
        |  FROM dense
        |  WINDOW wb AS (PARTITION BY event_type ORDER BY bucket
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wf AS (PARTITION BY event_type ORDER BY bucket
        |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT event_type, bucket, v,
        |       CASE WHEN v IS NOT NULL THEN v
        |            ELSE ${Det.r4Sql(s"vp + (vn - vp) * $frac")} END AS v_interp
        |FROM w
        |ORDER BY event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin
    },
    "q_ts_xff" ->
      s"""SELECT event_type, date_trunc('hour', ts) AS bucket,
        |       ${Det.avg4Sql("value")} AS v, count(*) AS n
        |FROM events GROUP BY 1, 2 HAVING count(*) >= 10
        |ORDER BY event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin,
    "q_ts_propagate" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS b1, ${Det.avg4Sql("value")} AS v1
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type,
        |       TIMESTAMP '1970-01-01' + ((epoch_us(b1) // 21600000000) * 21600) * INTERVAL '1 second' AS bucket,
        |       ${Det.avg4Sql("v1", 4)} AS v
        |FROM h1 GROUP BY 1, 2
        |ORDER BY event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin,
    "q_ts_retention" ->
      s"""SELECT event_id, ts, user_id, event_type, value
        |FROM events
        |WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL '7 days'
        |ORDER BY event_id NULLS FIRST""".stripMargin,
    "q_ts_cache_merge" ->
      s"""SELECT 'disk' AS src, event_type, date_trunc('hour', ts) AS bucket,
        |       ${Det.avg4Sql("value")} AS v
        |FROM events WHERE ts < TIMESTAMP '2024-01-25 00:00:00' GROUP BY 1, 2, 3
        |UNION ALL
        |SELECT 'cache' AS src, event_type, date_trunc('hour', ts) AS bucket,
        |       ${Det.avg4Sql("value")} AS v
        |FROM events WHERE ts >= TIMESTAMP '2024-01-25 00:00:00' GROUP BY 1, 2, 3
        |ORDER BY src NULLS FIRST, event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin,
    "q_ts_topk_series" ->
      s"""SELECT user_id, ${Det.sum4Sql("value")} AS s
        |FROM events GROUP BY 1
        |ORDER BY s DESC NULLS LAST, user_id NULLS FIRST LIMIT 10""".stripMargin,
    "q_ts_nonneg_derivative" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |d AS (
        |  SELECT event_type, bucket, v,
        |         v - lag(v, 1) OVER (PARTITION BY event_type ORDER BY bucket) AS d
        |  FROM h1)
        |SELECT event_type, bucket, v,
        |       CASE WHEN d < 0 THEN NULL ELSE ${Det.r4Sql("d")} END AS dv
        |FROM d
        |ORDER BY event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin,
    "q_ts_persecond" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |d AS (
        |  SELECT event_type, bucket, v,
        |         v - lag(v, 1) OVER (PARTITION BY event_type ORDER BY bucket) AS d
        |  FROM h1)
        |SELECT event_type, bucket, v,
        |       CASE WHEN d < 0 THEN NULL ELSE ${Det.r4Sql("d / 3600.0")} END AS rate
        |FROM d
        |ORDER BY event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin,
    "q_ts_summarize" ->
      s"""WITH h1 AS (
        |  SELECT event_type AS metric, date_trunc('hour', ts) AS bucket,
        |         ${Det.sum4Sql("value")} AS v, count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT metric,
        |       TIMESTAMP '1970-01-01' + ((epoch_us(bucket) // 14400000000) * 14400) * INTERVAL '1 second' AS bucket,
        |       ${Det.sum4Sql("v")} AS v, CAST(sum(n) AS BIGINT) AS n
        |FROM h1 GROUP BY 1, 2
        |ORDER BY metric NULLS FIRST, bucket NULLS FIRST""".stripMargin,
    "q_ts_series_ratio" -> {
      def condSum(t: String) =
        s"CAST(sum(CAST(CASE WHEN event_type = '$t' THEN value END AS DECIMAL(18,4))) AS DOUBLE)"
      s"""WITH h AS (
        |  SELECT date_trunc('hour', ts) AS bucket,
        |         ${condSum("error")} AS err, ${condSum("view")} AS req
        |  FROM events GROUP BY 1)
        |SELECT bucket, err, req,
        |       CASE WHEN req > 0 THEN ${Det.r4Sql("err / req")} END AS ratio
        |FROM h
        |ORDER BY bucket NULLS FIRST""".stripMargin
    },
    "q_ts_find_metrics" ->
      """WITH m AS (
        |  SELECT DISTINCT 'app.' || event_type || '.host' || CAST(user_id % 3 AS VARCHAR) AS metric
        |  FROM events),
        |s AS (
        |  SELECT metric, string_split(metric, '.') AS parts FROM m),
        |f AS (
        |  SELECT parts[1] || '.' || parts[2] AS node,
        |         CASE WHEN len(parts) = 2 THEN 1 ELSE 0 END AS leaf_i,
        |         CASE WHEN len(parts) > 2 THEN 1 ELSE 0 END AS branch_i
        |  FROM s
        |  WHERE len(parts) >= 2
        |    AND regexp_full_match(parts[1], 'app')
        |    AND regexp_full_match(parts[2], '[^.]*'))
        |SELECT node, max(leaf_i) = 1 AS is_leaf,
        |       max(branch_i) = 1 AS is_branch
        |FROM f GROUP BY 1
        |ORDER BY node NULLS FIRST""".stripMargin,
    "q_sessionize" -> {
      s"""WITH g AS (
        |  SELECT user_id, ts, event_id,
        |         epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) AS gap_us
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id,
        |         sum(CASE WHEN gap_us IS NULL OR gap_us > 21600000000
        |                  THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g)
        |SELECT user_id, CAST(max(sid) AS BIGINT) AS n_sessions,
        |       count(*) AS n_events,
        |       ${Det.r4Sql("CAST(count(*) AS DOUBLE) / CAST(max(sid) AS DOUBLE)")} AS events_per_session
        |FROM s GROUP BY 1
        |ORDER BY user_id NULLS FIRST""".stripMargin
    },
    "q_funnel_windowed" ->
      """WITH t1 AS (
        |  SELECT user_id, min(ts) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |t2 AS (
        |  SELECT e.user_id, min(e.ts) AS t_click
        |  FROM events e JOIN t1 ON e.user_id = t1.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= t1.t_view
        |    AND e.ts <= t1.t_view + INTERVAL 1 HOUR
        |  GROUP BY 1),
        |t3 AS (
        |  SELECT e.user_id, min(e.ts) AS t_purchase
        |  FROM events e JOIN t2 ON e.user_id = t2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= t2.t_click
        |    AND e.ts <= t2.t_click + INTERVAL 24 HOUR
        |  GROUP BY 1)
        |SELECT count(t1.t_view) AS n_view,
        |       count(t2.t_click) AS n_click_1h,
        |       count(t3.t_purchase) AS n_purchase_24h
        |FROM t1
        |LEFT JOIN t2 ON t1.user_id = t2.user_id
        |LEFT JOIN t3 ON t1.user_id = t3.user_id""".stripMargin,
    "q_ts_somers_d" -> {
      val dyx = "CAST(nc - nd AS DOUBLE) / CAST(n0 - tx AS DOUBLE)"
      val dxy = "CAST(nc - nd AS DOUBLE) / CAST(n0 - ty AS DOUBLE)"
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |p AS (
        |  SELECT a.event_type AS ma, b.event_type AS mb, a.bucket AS bucket,
        |         a.v AS va, b.v AS vb
        |  FROM h1 a JOIN h1 b ON a.bucket = b.bucket
        |  WHERE a.event_type < b.event_type),
        |j AS (
        |  SELECT x.ma, x.mb,
        |         x.va AS va, x.vb AS vb, y.va AS va2, y.vb AS vb2
        |  FROM p x JOIN p y ON x.ma = y.ma AND x.mb = y.mb
        |    AND x.bucket < y.bucket),
        |c AS (
        |  SELECT ma, mb, CAST(count(*) AS BIGINT) AS n0,
        |         CAST(sum(CASE WHEN (va - va2) * (vb - vb2) > 0.0
        |           THEN 1 ELSE 0 END) AS BIGINT) AS nc,
        |         CAST(sum(CASE WHEN (va - va2) * (vb - vb2) < 0.0
        |           THEN 1 ELSE 0 END) AS BIGINT) AS nd,
        |         CAST(sum(CASE WHEN va = va2 THEN 1 ELSE 0 END)
        |           AS BIGINT) AS tx,
        |         CAST(sum(CASE WHEN vb = vb2 THEN 1 ELSE 0 END)
        |           AS BIGINT) AS ty
        |  FROM j GROUP BY 1, 2)
        |SELECT ma, mb, n0, nc, nd, tx, ty,
        |       ${Det.r4Sql(dyx)} AS d_yx,
        |       ${Det.r4Sql(dxy)} AS d_xy
        |FROM c
        |ORDER BY ma NULLS FIRST, mb NULLS FIRST""".stripMargin
    },
    "q_funnel" ->
      """WITH t1 AS (
        |  SELECT user_id, min(ts) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |t2 AS (
        |  SELECT e.user_id, min(e.ts) AS t_click
        |  FROM events e JOIN t1 ON e.user_id = t1.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= t1.t_view
        |  GROUP BY 1),
        |t3 AS (
        |  SELECT e.user_id, min(e.ts) AS t_purchase
        |  FROM events e JOIN t2 ON e.user_id = t2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= t2.t_click
        |  GROUP BY 1)
        |SELECT count(t1.t_view) AS n_view,
        |       count(t2.t_click) AS n_click_after,
        |       count(t3.t_purchase) AS n_purchase_after
        |FROM t1
        |LEFT JOIN t2 ON t1.user_id = t2.user_id
        |LEFT JOIN t3 ON t1.user_id = t3.user_id""".stripMargin,
    "q_cohort_retention" ->
      """WITH a AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events),
        |c AS (
        |  SELECT user_id, d,
        |         min(d) OVER (PARTITION BY user_id) AS cohort
        |  FROM a)
        |SELECT cohort,
        |       CAST((epoch_us(d) - epoch_us(cohort)) // 86400000000 AS BIGINT) AS day_offset,
        |       count(*) AS n_users
        |FROM c
        |WHERE (epoch_us(d) - epoch_us(cohort)) // 86400000000 <= 7
        |GROUP BY 1, 2
        |ORDER BY cohort NULLS FIRST, day_offset NULLS FIRST""".stripMargin,
    "q_dau_stickiness" ->
      s"""WITH act AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events),
        |dau AS (
        |  SELECT d, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        |  FROM act GROUP BY 1),
        |wau AS (
        |  SELECT t.p AS panel_d,
        |         CAST(count(DISTINCT user_id) AS BIGINT) AS wau
        |  FROM act,
        |       unnest(generate_series(d, d + INTERVAL 6 DAY,
        |                              INTERVAL 1 DAY)) AS t(p)
        |  GROUP BY 1)
        |SELECT d, dau, wau,
        |       ${Det.r4Sql("CAST(dau AS DOUBLE) / wau")} AS stickiness
        |FROM dau JOIN wau ON panel_d = d
        |ORDER BY d NULLS FIRST""".stripMargin,
    "q_session_conversion" ->
      s"""WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
        |         lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |           ORDER BY ts NULLS FIRST, event_id NULLS FIRST) AS prev_us
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_type, us,
        |         CASE WHEN prev_us IS NULL OR us - prev_us > 21600000000
        |              THEN 1 ELSE 0 END AS new_s,
        |         event_id
        |  FROM e),
        |g AS (
        |  SELECT user_id, event_type, us,
        |         CAST(sum(new_s) OVER (PARTITION BY user_id
        |           ORDER BY us NULLS FIRST, event_id NULLS FIRST
        |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
        |  FROM f),
        |s AS (
        |  SELECT user_id, sid, CAST(count(*) AS BIGINT) AS n_ev,
        |         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |           AS BIGINT) AS conv,
        |         (max(us) - min(us)) // 1000000 AS dur_s
        |  FROM g GROUP BY 1, 2)
        |SELECT CAST(count(*) AS BIGINT) AS n_sessions,
        |       CAST(sum(conv) AS BIGINT) AS n_converted,
        |       ${Det.r4Sql("CAST(CAST(sum(conv) AS BIGINT) AS DOUBLE) / count(*)")} AS session_cvr,
        |       ${Det.r4Sql("CAST(CAST(sum(n_ev) AS BIGINT) AS DOUBLE) / count(*)")} AS events_per_session,
        |       ${Det.r4Sql("CAST(CAST(sum(dur_s) AS BIGINT) AS DOUBLE) / count(*)")} AS avg_dur_s
        |FROM s""".stripMargin,
    "q_new_vs_returning" ->
      s"""WITH act AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events),
        |f AS (SELECT user_id, min(d) AS first_d FROM act GROUP BY 1)
        |SELECT d, CAST(count(*) AS BIGINT) AS n_active,
        |       CAST(sum(CASE WHEN d = first_d THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |       CAST(count(*) - sum(CASE WHEN d = first_d THEN 1 ELSE 0 END) AS BIGINT) AS n_returning,
        |       ${Det.r4Sql(
                  "CAST(sum(CASE WHEN d = first_d THEN 1 ELSE 0 END) AS DOUBLE) / count(*)")} AS new_share
        |FROM act JOIN f USING (user_id)
        |GROUP BY 1 ORDER BY d NULLS FIRST""".stripMargin,
    "q_activity_histogram" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events),
        |u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_days
        |      FROM act GROUP BY 1)
        |SELECT n_days, CAST(count(*) AS BIGINT) AS n_users
        |FROM u GROUP BY 1 ORDER BY n_days NULLS FIRST""".stripMargin,
    "q_attr_shapley" -> {
      val share =
        Det.r4Sql("CAST(shap24 AS DOUBLE) / CAST(tot AS DOUBLE)")
      s"""WITH w0 AS (
        |  SELECT user_id, event_id, ts, event_type,
        |         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id
        |             ORDER BY ts NULLS FIRST, event_id NULLS FIRST
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS p_seen
        |  FROM events),
        |tch AS (
        |  SELECT DISTINCT user_id,
        |         CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
        |           WHEN 'signup' THEN 4 ELSE 8 END AS b
        |  FROM w0 WHERE p_seen = 0
        |    AND event_type IN ('click', 'error', 'signup', 'view')),
        |um AS (SELECT user_id, CAST(sum(b) AS BIGINT) AS mask
        |       FROM tch GROUP BY 1),
        |cv AS (SELECT DISTINCT user_id FROM events
        |       WHERE event_type = 'purchase'),
        |grid AS MATERIALIZED (
        |  SELECT COALESCE(um.mask, CAST(0 AS BIGINT)) AS mask,
        |         CAST(sum(CASE WHEN cv.user_id IS NULL THEN 0 ELSE 1 END)
        |           AS BIGINT) AS conv_t
        |  FROM um FULL JOIN cv ON um.user_id = cv.user_id
        |  GROUP BY 1),
        |s16 AS (SELECT CAST(range AS BIGINT) AS smask FROM range(0, 16)),
        |v AS MATERIALIZED (
        |  SELECT s16.smask,
        |         CAST(COALESCE(sum(g.conv_t), 0) AS BIGINT) AS v
        |  FROM s16 LEFT JOIN grid g ON (g.mask & s16.smask) = g.mask
        |  GROUP BY 1),
        |ch AS (SELECT * FROM (VALUES ('click', CAST(1 AS BIGINT)),
        |         ('error', CAST(2 AS BIGINT)), ('signup', CAST(4 AS BIGINT)),
        |         ('view', CAST(8 AS BIGINT))) AS t(channel, cbit)),
        |phi AS MATERIALIZED (
        |  SELECT ch.channel,
        |         CAST(sum((CASE bit_count(vs.smask) WHEN 0 THEN 6
        |             WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END)
        |           * (v2.v - vs.v)) AS BIGINT) AS shap24
        |  FROM ch JOIN v vs ON (vs.smask & ch.cbit) = 0
        |  JOIN v v2 ON v2.smask = vs.smask + ch.cbit
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(shap24) AS BIGINT) AS tot FROM phi)
        |SELECT channel, shap24, $share AS share
        |FROM phi CROSS JOIN tot
        |ORDER BY channel NULLS FIRST""".stripMargin
    },
    "q_attr_shapley_cohort" -> {
      val share =
        Det.r4Sql("CAST(shap24 AS DOUBLE) / CAST(tot AS DOUBLE)")
      s"""WITH w0 AS (
        |  SELECT user_id, event_id, ts, event_type,
        |         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id
        |             ORDER BY ts NULLS FIRST, event_id NULLS FIRST
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS p_seen
        |  FROM events),
        |coh AS MATERIALIZED (
        |  SELECT user_id, date_trunc('week', min(ts)) AS cohort
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |tch AS (
        |  SELECT DISTINCT user_id,
        |         CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
        |           WHEN 'signup' THEN 4 ELSE 8 END AS b
        |  FROM w0 WHERE p_seen = 0
        |    AND event_type IN ('click', 'error', 'signup', 'view')),
        |um AS (SELECT user_id, CAST(sum(b) AS BIGINT) AS mask
        |       FROM tch GROUP BY 1),
        |cv AS (SELECT DISTINCT user_id FROM events
        |       WHERE event_type = 'purchase'),
        |grid AS MATERIALIZED (
        |  SELECT c.cohort, COALESCE(um.mask, CAST(0 AS BIGINT)) AS mask,
        |         CAST(sum(CASE WHEN cv.user_id IS NULL THEN 0 ELSE 1 END)
        |           AS BIGINT) AS conv_t
        |  FROM um FULL JOIN cv ON um.user_id = cv.user_id
        |  JOIN coh c ON c.user_id = COALESCE(um.user_id, cv.user_id)
        |  GROUP BY 1, 2),
        |s16 AS (SELECT CAST(range AS BIGINT) AS smask FROM range(0, 16)),
        |v AS MATERIALIZED (
        |  SELECT cl.cohort, s16.smask,
        |         CAST(COALESCE(sum(g.conv_t), 0) AS BIGINT) AS v
        |  FROM (SELECT DISTINCT cohort FROM grid) cl
        |  CROSS JOIN s16
        |  LEFT JOIN grid g ON g.cohort = cl.cohort
        |    AND (g.mask & s16.smask) = g.mask
        |  GROUP BY 1, 2),
        |ch AS (SELECT * FROM (VALUES ('click', CAST(1 AS BIGINT)),
        |         ('error', CAST(2 AS BIGINT)), ('signup', CAST(4 AS BIGINT)),
        |         ('view', CAST(8 AS BIGINT))) AS t(channel, cbit)),
        |phi AS MATERIALIZED (
        |  SELECT vs.cohort, ch.channel,
        |         CAST(sum((CASE bit_count(vs.smask) WHEN 0 THEN 6
        |             WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END)
        |           * (v2.v - vs.v)) AS BIGINT) AS shap24
        |  FROM ch JOIN v vs ON (vs.smask & ch.cbit) = 0
        |  JOIN v v2 ON v2.cohort = vs.cohort
        |    AND v2.smask = vs.smask + ch.cbit
        |  GROUP BY 1, 2),
        |tot AS (SELECT cohort, CAST(sum(shap24) AS BIGINT) AS tot
        |        FROM phi GROUP BY 1)
        |SELECT phi.cohort, channel, shap24,
        |       CASE WHEN tot <> 0 THEN $share ELSE NULL END AS share
        |FROM phi JOIN tot ON tot.cohort = phi.cohort
        |ORDER BY phi.cohort NULLS FIRST, channel NULLS FIRST""".stripMargin
    },
    "q_attr_markov" -> {
      // 24 unrolled power-iteration rounds over the (variant × state)
      // grid; every round floor-divides the exact BIGINT Σ c·p by the
      // source's outgoing total — identical to the driver loop's Longs
      val rounds = (1 to 24).map { i =>
        s"""g$i AS MATERIALIZED (
          |  SELECT v.variant, st.s,
          |    CAST(CASE WHEN st.s = 'conv' THEN 1000000000000
          |         WHEN st.s = 'null_end' THEN 0
          |         WHEN v.variant = 'no_' || st.s THEN 0
          |         ELSE COALESCE(q.acc // r.r, 0) END AS BIGINT) AS p
          |  FROM v CROSS JOIN states st
          |  LEFT JOIN (SELECT p.variant AS qv, cnt.s AS qs,
          |               CAST(sum(cnt.c * p.p) AS BIGINT) AS acc
          |             FROM cnt JOIN g${i - 1} p ON cnt.t = p.s
          |             GROUP BY 1, 2) q
          |    ON q.qv = v.variant AND q.qs = st.s
          |  LEFT JOIN r ON r.s = st.s)""".stripMargin
      }.mkString(",\n")
      s"""WITH m AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |           END) OVER (PARTITION BY user_id
        |             ORDER BY ts NULLS FIRST, event_id NULLS FIRST
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS p_seen
        |  FROM events),
        |tch AS (SELECT user_id, ts, event_id, event_type AS t
        |        FROM m WHERE p_seen = 0),
        |conv AS (SELECT DISTINCT user_id FROM m
        |         WHERE event_type = 'purchase' AND p_seen = 1),
        |tr1 AS (
        |  SELECT COALESCE(lag(t, 1) OVER (PARTITION BY user_id
        |           ORDER BY ts NULLS FIRST, event_id NULLS FIRST),
        |           'start') AS s, t
        |  FROM tch),
        |lastt AS (
        |  SELECT user_id, t AS s FROM (
        |    SELECT user_id, t,
        |           row_number() OVER (PARTITION BY user_id
        |             ORDER BY ts DESC NULLS LAST,
        |               event_id DESC NULLS LAST) AS rn
        |    FROM tch) WHERE rn = 1),
        |term AS (
        |  SELECT l.s,
        |         CASE WHEN c.user_id IS NOT NULL THEN 'conv'
        |              ELSE 'null_end' END AS t
        |  FROM lastt l LEFT JOIN conv c ON l.user_id = c.user_id),
        |ntc AS (
        |  SELECT 'start' AS s, 'conv' AS t FROM conv
        |  WHERE user_id NOT IN (SELECT user_id FROM tch)),
        |cnt AS MATERIALIZED (
        |  SELECT s, t, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT s, t FROM tr1 UNION ALL SELECT s, t FROM term
        |        UNION ALL SELECT s, t FROM ntc)
        |  GROUP BY 1, 2),
        |r AS MATERIALIZED (
        |  SELECT s, CAST(sum(c) AS BIGINT) AS r FROM cnt GROUP BY 1),
        |states AS MATERIALIZED (SELECT DISTINCT s FROM
        |  (SELECT s FROM cnt UNION ALL SELECT t AS s FROM cnt)),
        |v AS MATERIALIZED (SELECT UNNEST(['base', 'no_click', 'no_error',
        |  'no_signup', 'no_view']) AS variant),
        |g0 AS MATERIALIZED (
        |  SELECT v.variant, st.s,
        |         CAST(CASE WHEN st.s = 'conv' THEN 1000000000000
        |           ELSE 0 END AS BIGINT) AS p
        |  FROM v CROSS JOIN states st),
        |$rounds,
        |fin AS (SELECT variant, p FROM g24 WHERE s = 'start'),
        |b AS (SELECT p AS bp FROM fin WHERE variant = 'base'),
        |rem AS (
        |  SELECT variant, p,
        |         CAST(CASE WHEN variant = 'base' THEN 0
        |           ELSE GREATEST(bp - p, 0) END AS BIGINT) AS removal
        |  FROM fin CROSS JOIN b),
        |tot AS (SELECT CAST(sum(removal) AS BIGINT) AS tot FROM rem)
        |SELECT variant, p AS p_conv12, removal AS removal12,
        |       CASE WHEN variant = 'base' OR tot = 0 THEN 0.0
        |         ELSE floor(CAST(removal AS DOUBLE) / CAST(tot AS DOUBLE)
        |           * 10000.0 + 0.5) / 10000.0 END AS share
        |FROM rem CROSS JOIN tot
        |ORDER BY variant NULLS FIRST""".stripMargin
    },
    "q_attribution" ->
      """WITH s AS (
        |  SELECT event_type, value,
        |         last_value(CASE WHEN event_type IN ('click', 'view')
        |                         THEN event_type END IGNORE NULLS)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |  FROM events
        |  WHERE event_type IN ('click', 'view', 'purchase'))
        |SELECT COALESCE(touch, 'none') AS touch_type,
        |       CAST(count(*) AS BIGINT) AS n_purchases,
        |       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS attributed_value
        |FROM s
        |WHERE event_type = 'purchase'
        |GROUP BY 1
        |ORDER BY touch_type NULLS FIRST""".stripMargin,
    "q_ts_burn_rate" ->
      s"""WITH h AS (
        |  SELECT (epoch_us(ts) // 3600000000) * 3600 AS hr_s,
        |         CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS e
        |  FROM events GROUP BY 1),
        |r AS (
        |  SELECT hr_s, n, e,
        |         sum(n) OVER w6 AS n6, sum(e) OVER w6 AS e6
        |  FROM h
        |  WINDOW w6 AS (ORDER BY hr_s RANGE BETWEEN 18000 PRECEDING AND CURRENT ROW))
        |SELECT make_timestamp(hr_s * 1000000) AS bucket, n, e,
        |       ${Det.r4Sql("CAST(e AS DOUBLE) / n")} AS rate_1h,
        |       ${Det.r4Sql("CAST(e6 AS DOUBLE) / n6")} AS rate_6h,
        |       CASE WHEN e6 > 0 THEN ${Det.r4Sql("(CAST(e AS DOUBLE) / n) / (CAST(e6 AS DOUBLE) / n6)")} END AS burn,
        |       CAST(CASE WHEN e6 > 0
        |                  AND (CAST(e AS DOUBLE) / n) > 1.5 * (CAST(e6 AS DOUBLE) / n6)
        |                  AND (CAST(e AS DOUBLE) / n) >= 0.3
        |            THEN 1 ELSE 0 END AS BIGINT) AS page
        |FROM r
        |ORDER BY bucket NULLS FIRST""".stripMargin,
    "q_ts_dashboard" ->
      s"""WITH f AS (
        |  SELECT event_type AS metric,
        |         TIMESTAMP '1970-01-01' + ((epoch_us(ts) // 3600000000) * 3600) * INTERVAL '1 second' AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events
        |  WHERE regexp_full_match(event_type, '[^.]*')
        |    AND ts >= (SELECT max(ts) FROM events) - INTERVAL '20 days'
        |    AND ts <= (SELECT max(ts) FROM events)
        |  GROUP BY 1, 2),
        |m AS (
        |  SELECT metric, bucket, row_number() OVER w AS rn,
        |         CAST(sum(CAST(v AS DECIMAL(18,4))) OVER (PARTITION BY metric
        |           ORDER BY bucket ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS DOUBLE) / 6.0 AS sma
        |  FROM f
        |  WINDOW w AS (PARTITION BY metric ORDER BY bucket)),
        |p AS (SELECT metric, bucket, ${Det.r4Sql("sma")} AS ma
        |      FROM m WHERE rn >= 6)
        |SELECT metric, bucket, ma,
        |       ${Det.r4Sql("ma * 100.0 / CAST(sum(CAST(ma AS DECIMAL(18,4))) OVER (PARTITION BY bucket) AS DOUBLE)")} AS pct
        |FROM p
        |ORDER BY metric NULLS FIRST, bucket NULLS FIRST""".stripMargin,
    "q_ts_moving_avg" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, bucket, v, row_number() OVER w AS rn,
        |         CAST(sum(CAST(v AS DECIMAL(18,4))) OVER (PARTITION BY event_type
        |           ORDER BY bucket ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS DOUBLE) / 6.0 AS sma
        |  FROM h1
        |  WINDOW w AS (PARTITION BY event_type ORDER BY bucket))
        |SELECT event_type, bucket, v, ${Det.r4Sql("sma")} AS ma
        |FROM m WHERE rn >= 6
        |ORDER BY event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin,
    "q_ts_scale_offset" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, bucket, v,
        |       ${Det.r4Sql("v * 0.125")} AS scaled,
        |       ${Det.r4Sql("v + 100.0")} AS shifted
        |FROM h1
        |ORDER BY event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin,
    "q_ts_fetch_routed" -> fetchRoutedOracle,
    "q_sql_fetch_routed" -> fetchRoutedOracle,
    "q_ts_fetch_bounded" ->
      s"""SELECT TIMESTAMP '1970-01-01' + ((epoch_us(ts) // 3600000000) * 3600) * INTERVAL '1 second' AS bucket,
        |       ${Det.avg4Sql("value")} AS v, count(*) AS n
        |FROM events
        |WHERE event_type = 'click'
        |  AND ts >= (SELECT max(ts) FROM events) - INTERVAL '10 days'
        |  AND ts <= (SELECT max(ts) FROM events) - INTERVAL '2 days'
        |GROUP BY 1
        |ORDER BY bucket NULLS FIRST""".stripMargin,
    "q_ts_aspercent" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, bucket, v,
        |       ${Det.r4Sql("v * 100.0 / CAST(sum(CAST(v AS DECIMAL(18,4))) OVER (PARTITION BY bucket) AS DOUBLE)")} AS pct
        |FROM h1
        |ORDER BY event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin,
    "q_ts_groupbynode" ->
      s"""WITH m AS (
        |  SELECT 'app.' || event_type || '.host' || CAST(user_id % 3 AS VARCHAR) AS metric,
        |         ts, value
        |  FROM events)
        |SELECT split_part(metric, '.', 2) AS node,
        |       date_trunc('hour', ts) AS bucket,
        |       ${Det.sum4Sql("value")} AS v, count(*) AS n
        |FROM m GROUP BY 1, 2
        |ORDER BY node NULLS FIRST, bucket NULLS FIRST""".stripMargin,
    "q_ts_current_above" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |cur AS (
        |  SELECT event_type, arg_max(bucket, bucket) AS last_bucket,
        |         arg_max(v, bucket) AS current
        |  FROM h1 GROUP BY 1)
        |SELECT event_type, last_bucket, current FROM cur
        |WHERE current > 40.0
        |ORDER BY event_type NULLS FIRST""".stripMargin,
    "q_ts_sort_maxima" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, max(v) AS peak FROM h1 GROUP BY 1
        |ORDER BY peak DESC NULLS LAST, event_type NULLS FIRST""".stripMargin,
    "q_ts_stddev_series" -> {
      val n = "CAST(n AS DOUBLE)"
      val s1 = "CAST(s1d AS DOUBLE)"
      val s2 = "CAST(s2d AS DOUBLE)"
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |g AS (
        |  SELECT bucket, CAST(count(*) AS BIGINT) AS n,
        |         sum(CAST(v AS DECIMAL(18,8))) AS s1d,
        |         sum(CAST(v * v AS DECIMAL(18,8))) AS s2d
        |  FROM h1 GROUP BY 1 HAVING count(*) >= 2)
        |SELECT bucket, n,
        |       ${Det.r4Sql(s"sqrt(($s2 - ($s1 * $s1) / $n) / ($n - 1.0))")} AS sd
        |FROM g
        |ORDER BY bucket NULLS FIRST""".stripMargin
    },
    "q_ts_moving_median" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, bucket, v,
        |         row_number() OVER w AS rn,
        |         quantile_cont(v, 0.5) OVER (PARTITION BY event_type
        |           ORDER BY bucket ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med
        |  FROM h1
        |  WINDOW w AS (PARTITION BY event_type ORDER BY bucket))
        |SELECT event_type, bucket, v, med FROM m WHERE rn >= 7
        |ORDER BY event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin,
    "q_ts_highest_current" ->
      s"""WITH h1 AS (
        |  SELECT event_type, date_trunc('hour', ts) AS bucket,
        |         ${Det.avg4Sql("value")} AS v
        |  FROM events GROUP BY 1, 2),
        |cur AS (
        |  SELECT event_type, arg_max(bucket, bucket) AS last_bucket,
        |         arg_max(v, bucket) AS current
        |  FROM h1 GROUP BY 1)
        |SELECT event_type, last_bucket, current FROM cur
        |ORDER BY current DESC NULLS LAST, event_type NULLS FIRST
        |LIMIT 3""".stripMargin,
    "q_ts_glob_fetch" ->
      s"""SELECT event_type AS metric,
        |       TIMESTAMP '1970-01-01' + ((epoch_us(ts) // 3600000000) * 3600) * INTERVAL '1 second' AS bucket,
        |       ${Det.avg4Sql("value")} AS v, count(*) AS n
        |FROM events
        |WHERE regexp_full_match(event_type, '[^.]*u[^.]*')
        |  AND ts >= (SELECT max(ts) FROM events) - INTERVAL '20 days'
        |  AND ts <= (SELECT max(ts) FROM events)
        |GROUP BY 1, 2
        |ORDER BY metric NULLS FIRST, bucket NULLS FIRST""".stripMargin
  )

  /** The Knight O(n log n) production kendall shares its pair-join
    * oracle SQL verbatim — row-identical by construction (spec'd). */
  val oracleSql: Map[String, String] = oracleSqlBase ++ Map(
    "q_ts_kendall_fast" -> oracleSqlBase("q_ts_kendall"))
}
