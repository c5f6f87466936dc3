package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query inventory is assembled from per-domain modules:
  *  - [[graft.ts.TimeSeriesOps]]   — Kenshin TSDB semantics (rollup/fetch/
  *    xff/propagate/retention/cache-merge) on `events`
  *  - [[graft.rel.RelationalOps]]  — joins/aggs/windows/sets/scalar fns
  *  - [[graft.llm.TextOps]] / [[graft.llm.VectorOps]] — LLM-pipeline ops
  *    (dedup, similarity search, text analysis) on `documents`/`embeddings`
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ts.TimeSeriesOps.rollupAvg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ts.TimeSeriesOps.queries ++ rel.RelationalOps.queries ++
      rel.Dashboards.queries ++
      llm.TextOps.queries ++ llm.BpeOps.queries ++ llm.VectorOps.queries ++
      llm.Pipeline.queries ++ mm.MultimodalOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ts.TimeSeriesOps.oracleSql ++ rel.RelationalOps.oracleSql ++
      rel.Dashboards.oracleSql ++
      llm.TextOps.oracleSql ++ llm.BpeOps.oracleSql ++
      llm.VectorOps.oracleSql
}
