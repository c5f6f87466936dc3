package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables.
  *
  * Design notes for 100 TB scale: every loader returns a plain parquet scan
  * so Catalyst can push filters/projections into the file source (verify
  * with `PushedFilters`/`ReadSchema` in `.explain("formatted")`). At
  * production scale these tables would be date-partitioned
  * (`.../date=YYYY-MM-DD/`) and the same loaders pick up partition pruning
  * for free; nothing here materializes or collects.
  */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Scoped shared-scan: inside `sharedEventsScan { ... }`, every
    * [[events]] call for the same dir returns ONE lazily-checkpointed
    * relation, so a composed read (the KPI dashboard reuses four
    * events-derived member plans) scans and decodes the fact table
    * once instead of once per member. Thread-local and scope-bounded —
    * plans built outside the scope are untouched, so single-member
    * queries keep their verbatim parquet-scan plans (and their
    * PlanSpec postures). At 100 TB this is exactly the "materialize
    * the shared input once" call a composed dashboard makes. */
  private val eventsScanScope =
    new scala.util.DynamicVariable[
      scala.collection.mutable.Map[String, DataFrame]](null)

  def sharedEventsScan[T](body: => T): T =
    eventsScanScope.withValue(
      scala.collection.mutable.Map.empty[String, DataFrame])(body)

  /** The time-series point table (Kenshin's write-path payload: metric-ish
    * `event_type`, tag-ish `user_id`, a timestamp and a double value;
    * reference semantics: kenshin/storage.py — update/fetch [U, SURVEY §1.1]).
    *
    * The driver has shipped `ts` in two physical encodings across rounds:
    * INT64 TIMESTAMP(NANOS) (which Spark 4's reader rejects outright,
    * [PARQUET_TYPE_ILLEGAL], so we read it as raw LONG via `nanosAsLong`
    * and derive a µs TIMESTAMP — matching what DuckDB sees natively) and
    * plain TIMESTAMP(MICROS) (readable directly). We sniff the decoded
    * dtype and normalize both to the same surface: µs-precision `ts` plus
    * a LONG `ts_ns` preserved for sub-µs ordering/tiebreaks (for µs files
    * it is exactly `unix_micros(ts) * 1000`, so tiebreak order is stable
    * across encodings).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val scope = eventsScanScope.value
    if (scope != null)
      scope.getOrElseUpdate(sfDir,
        eventsUncached(spark, sfDir).localCheckpoint(eager = false))
    else eventsUncached(spark, sfDir)
  }

  private def eventsUncached(spark: SparkSession, sfDir: String): DataFrame = {
    // prefer setting this once at session build (Verify/Bench/TestSpark
    // do); the guarded set here keeps user-built sessions working without
    // mutating session state on every call
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
        .contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the NTZ→Timestamp cast below is value-preserving ONLY under a UTC
    // session zone; guard it the same way as nanosAsLong so a user-built
    // session with a local zone can't silently shift instants
    if (!spark.conf.getOption("spark.sql.session.timeZone").contains("UTC"))
      spark.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val normalized = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // legacy ns-as-long file
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ => // native µs timestamp file (NTZ in the parquet footer; the
        // wall times are UTC instants and every session here runs with
        // spark.sql.session.timeZone=UTC, so the cast is value-preserving
        // and matches DuckDB's native read of the same file)
        val ts = col("ts").cast(org.apache.spark.sql.types.TimestampType)
        raw.withColumn("ts", ts)
          .withColumn("ts_ns", unix_micros(ts) * lit(1000L))
    }
    normalized.select(col("event_id"), col("ts"), col("ts_ns"),
      col("user_id"), col("event_type"), col("value"), col("props"))
  }
}
