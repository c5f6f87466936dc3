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

  /** The time-series point table (Kenshin's write-path payload: metric-ish
    * `event_type`, tag-ish `user_id`, a timestamp and a double value;
    * reference semantics: kenshin/storage.py — update/fetch [U, SURVEY §1.1]).
    *
    * `events.parquet` stores `ts` as parquet INT64 TIMESTAMP(NANOS), which
    * Spark 4's reader rejects outright ([PARQUET_TYPE_ILLEGAL]). We read it
    * as a raw LONG via `nanosAsLong` and derive a µs-precision TIMESTAMP —
    * exactly what DuckDB sees natively (it truncates ns→µs; verified).
    * The raw nanos survive as `ts_ns` for sub-µs ordering/tiebreaks.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // prefer setting this once at session build (Verify/Bench/TestSpark
    // do); the guarded set here keeps user-built sessions working without
    // mutating session state on every call
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
        .contains("true"))
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      .select(col("event_id"), col("ts"), col("ts_ns"),
        col("user_id"), col("event_type"), col("value"), col("props"))
  }
}
