package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Composed reads over the verified per-domain summaries — the
  * [[graft.ts.TimeSeriesOps]] dashboard idea applied to the product
  * side: one (kpi, value) panel reassembled from the 1-row summary
  * queries. Composition REUSES the member plans verbatim, and the
  * oracle embeds the members' own DuckDB texts as CTEs, so the panel
  * cannot drift from the reads it summarizes. */
object Dashboards {

  /** EXEC KPI PANEL — signup conversion (forward as-of), session
    * economics (gap islands), revenue concentration (Gini) and the
    * ordered funnel, unpivoted to 11 labelled rows. Every value is a
    * deterministic member output cast to DOUBLE (exact for these
    * magnitudes in both engines).
    *
    * Execution shape: the four member plans are INDEPENDENT 1-row
    * reductions, so the panel materializes them CONCURRENTLY (one
    * eager checkpoint per member, submitted from four driver threads —
    * the standard multi-job dashboard fan-out; Spark's scheduler
    * interleaves the stages across the executor cores) and unions the
    * four tiny results. The panel pays max(member), not sum(member).
    * Each member additionally runs under [[graft.io.Tables
    * .sharedEventsScan]], so its own stage jobs (funnel's three) read
    * one materialized events relation. Member logic is reused
    * verbatim — values cannot drift from the verified reads. */
  def kpiDashboard(spark: SparkSession, sfDir: String): DataFrame = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    def rows(df: DataFrame, pairs: (String, String)*): DataFrame =
      df.selectExpr(s"stack(${pairs.length}, " +
        pairs.map { case (k, e) => s"'$k', CAST($e AS DOUBLE)" }
          .mkString(", ") + ") AS (kpi, value)")
    val members: Seq[() => DataFrame] = Seq(
      () => rows(RelationalOps.timeToConvert(spark, sfDir),
        "signup_cvr" -> "cvr",
        "p50_secs_to_convert" -> "p50_secs",
        "n_signups" -> "n_signups"),
      () => rows(graft.ts.TimeSeriesOps.sessionConversion(spark, sfDir),
        "n_sessions" -> "n_sessions",
        "session_cvr" -> "session_cvr",
        "events_per_session" -> "events_per_session"),
      () => rows(RelationalOps.revenueGini(spark, sfDir),
        "revenue_gini" -> "gini",
        "total_revenue" -> "total_rev"),
      () => rows(graft.ts.TimeSeriesOps.funnel(spark, sfDir),
        "funnel_views" -> "n_view",
        "funnel_clicks" -> "n_click_after",
        "funnel_purchases" -> "n_purchase_after"))
    val futs = members.map { m =>
      Future(graft.io.Tables.sharedEventsScan {
        m().localCheckpoint(eager = true)
      })
    }
    futs.map(Await.result(_, Duration.Inf))
      .reduce(_.unionByName(_))
      .orderBy("kpi")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q_kpi_dashboard" -> kpiDashboard _)

  /** The members' oracle texts embedded verbatim as CTEs (nested WITH
    * inside a CTE body is legal DuckDB), then the same unpivot. */
  def oracleSql: Map[String, String] = {
    val ttc = RelationalOps.oracleSql("q_time_to_convert")
    val sc = graft.ts.TimeSeriesOps.oracleSql("q_session_conversion")
    val g = RelationalOps.oracleSql("q_revenue_gini")
    val f = graft.ts.TimeSeriesOps.oracleSql("q_funnel")
    def kv(src: String, pairs: (String, String)*): String =
      pairs.map { case (k, e) =>
        s"SELECT '$k' AS kpi, CAST($e AS DOUBLE) AS value FROM $src"
      }.mkString("\nUNION ALL ")
    Map("q_kpi_dashboard" ->
      (s"WITH ttc AS (\n$ttc\n), sc AS (\n$sc\n), g AS (\n$g\n), f AS (\n$f\n)\n" +
        "SELECT kpi, value FROM (\n" +
        kv("ttc", "signup_cvr" -> "cvr",
          "p50_secs_to_convert" -> "p50_secs", "n_signups" -> "n_signups") +
        "\nUNION ALL " +
        kv("sc", "n_sessions" -> "n_sessions", "session_cvr" -> "session_cvr",
          "events_per_session" -> "events_per_session") +
        "\nUNION ALL " +
        kv("g", "revenue_gini" -> "gini", "total_revenue" -> "total_rev") +
        "\nUNION ALL " +
        kv("f", "funnel_views" -> "n_view",
          "funnel_clicks" -> "n_click_after",
          "funnel_purchases" -> "n_purchase_after") +
        "\n) ORDER BY kpi NULLS FIRST"))
  }
}
