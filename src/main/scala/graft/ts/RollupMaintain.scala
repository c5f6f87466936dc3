package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental rollup maintenance — the batch form of the writer loop's
  * economics (R11): on each run, only the buckets that can still change
  * are recomputed; closed history is carried over untouched.
  *
  * Correctness frontier: the newest existing bucket may be PARTIAL (its
  * raw window wasn't over when the last run aggregated it), so the
  * recompute window starts at that bucket's start, not after it. Late
  * raw rows older than the frontier are ignored by design — that is the
  * same contract a watermark gives the streaming writer; widen the
  * frontier by the allowed lateness if raw arrives late.
  *
  * At 100 TB: `existing` is a date-partitioned table, the `>= frontier`
  * predicates prune both scans to the last partition(s), and the
  * recompute aggregates only the tail — cost is O(new data), not
  * O(history).
  */
object RollupMaintain {

  /** Merge `raw` points (metric, ts, value) into `existing` rollup rows
    * (metric, bucket, v, n) at `stepSeconds`, recomputing only buckets
    * at or after the frontier. Returns the full up-to-date rollup. */
  def incremental(raw: DataFrame, existing: DataFrame,
      stepSeconds: Long): DataFrame = {
    val step = lit(stepSeconds)
    val bucketOf = timestamp_seconds(
      (col("ts").cast("long") / step).cast("long") * step)
    // empty/bootstrap existing ⇒ frontier at epoch ⇒ full recompute
    val frontier = existing.agg(
      coalesce(max("bucket"), lit("1970-01-01 00:00:00").cast("timestamp"))
        .as("frontier"))
    val kept = existing.join(broadcast(frontier),
        col("bucket") < col("frontier"), "left_semi")
    val recomputed = raw
      .join(broadcast(frontier), bucketOf >= col("frontier"), "left_semi")
      .groupBy(col("metric"), bucketOf.as("bucket"))
      .agg(avg(col("value")).as("v"), count(lit(1)).as("n"))
    kept.unionByName(recomputed)
  }

  /** Full recompute — the reference answer `incremental` must match. */
  def full(raw: DataFrame, stepSeconds: Long): DataFrame =
    raw.groupBy(col("metric"),
        timestamp_seconds((col("ts").cast("long") / stepSeconds).cast("long")
          * stepSeconds).as("bucket"))
      .agg(avg(col("value")).as("v"), count(lit(1)).as("n"))
}
