package graft.util

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.LongAdder
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Engine self-metrics (rurouni's instrumentation counters, R20 [U
  * `rurouni/state/instrumentation.py`]): points/updates/errors per
  * component, fed by Spark's QueryExecutionListener instead of a
  * hand-rolled counter thread. Driver-side only and O(1) per query —
  * safe at any scale. */
object Instrument {

  private val counters = new ConcurrentHashMap[String, LongAdder]()

  def inc(name: String, delta: Long = 1L): Unit =
    counters.computeIfAbsent(name, _ => new LongAdder).add(delta)

  def get(name: String): Long =
    Option(counters.get(name)).map(_.sum).getOrElse(0L)

  def snapshot(): Map[String, Long] = {
    val b = Map.newBuilder[String, Long]
    counters.forEach((k, v) => b += (k -> v.sum))
    b.result()
  }

  def reset(): Unit = counters.clear()

  /** The listener: queries completed/failed, rows produced, execution
    * nanoseconds — the analog of rurouni's metricsReceived/updateOperations
    * counters. Idempotent per session. */
  private val listener = new QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit = {
      inc("queries.success")
      inc("queries.nanos", durationNs)
      // AQE roots carry no row metric — take the topmost node that does.
      // Best-effort gauge: count() fast-paths bypass it (contribute 0).
      val rows = qe.executedPlan.collectFirst {
        case p if p.metrics.contains("numOutputRows") =>
          p.metrics("numOutputRows").value
      }.getOrElse(0L)
      inc("rows.out", rows)
    }
    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit = inc("queries.failed")
  }

  private val installed = ConcurrentHashMap.newKeySet[Int]()

  /** Install the listener once per session. */
  def install(spark: SparkSession): Unit =
    if (installed.add(System.identityHashCode(spark))) {
      spark.listenerManager.register(listener)
    }
}
