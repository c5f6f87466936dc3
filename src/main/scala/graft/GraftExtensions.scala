package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extension entry point — deploy with
  * `--conf spark.sql.extensions=graft.GraftExtensions` to get graft's
  * native SQL functions (`cosine_sim`, `simhash_agg`) and the rollup
  * routing rule in every session of the application;
  * [[graft.functions.registerAll]] is the live-session equivalent.
  *
  * NOTE: `spark.sql.extensions` is a STATIC conf — it must be set before
  * the first session boots. To attach to a NEW session on an already-
  * running SparkContext (tests, notebooks), pass the object directly:
  * `SparkSession.builder().withExtensions(new GraftExtensions())...` —
  * same apply path, proven in RollupRouteSpec. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    org.apache.spark.sql.graft.GraftFunctionRegistry.inject(ext)
    ext.injectOptimizerRule(_ => graft.plans.RollupRouteRule)
  }
}
