package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.util.Instrument

class InstrumentSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  test("listener counts completed actions and output rows") {
    Instrument.install(spark)
    Instrument.install(spark) // idempotent
    Instrument.reset()
    val n = graft.io.Tables.nation(spark, TestSpark.sf).collect().length
    // listener delivery is asynchronous — poll until it lands
    val deadline = System.nanoTime() + 30L * 1000000000L
    while (Instrument.get("queries.success") < 1 &&
      System.nanoTime() < deadline) Thread.sleep(50)
    assert(Instrument.get("queries.success") == 1,
      s"snapshot=${Instrument.snapshot()}")
    assert(Instrument.get("rows.out") == n)
    assert(Instrument.get("queries.nanos") > 0)
    // manual counters (the rurouni metricsReceived analog)
    Instrument.inc("points.received", 42)
    assert(Instrument.snapshot()("points.received") == 42)
  }
}
