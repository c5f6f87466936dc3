package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extension entry point — deploy with
  * `--conf spark.sql.extensions=graft.GraftExtensions` to get graft's
  * native SQL functions (`cosine_sim`, `simhash_agg`) in every session
  * of the application; [[graft.functions.registerAll]] is the live-
  * session equivalent. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    org.apache.spark.sql.graft.GraftFunctionRegistry.inject(ext)
    ext.injectOptimizerRule(_ => graft.plans.RollupRouteRule)
  }
}
