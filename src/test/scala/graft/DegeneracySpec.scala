package graft

import org.scalatest.funsuite.AnyFunSuite

/** FIXTURE-DEGENERACY GATE (the r14 lesson, generalized): a passing
  * cross-engine hash proves the engines AGREE, not that the math ever
  * ran — the survival family was oracle-green for two rounds with zero
  * deaths, and q_mm_image_dedup was "green" on an empty result. This
  * spec asserts the NONTRIVIAL branch executes for every no-oracle
  * query and for the planted-fixture paths, so emptiness can never
  * masquerade as correctness again. */
class DegeneracySpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private def sf = TestSpark.sf

  test("every no-oracle query returns rows at the spec SF") {
    val noOracle =
      (SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet).toSeq.sorted
    val empty = noOracle.filter { k =>
      SparkEntry.queries(k)(spark, sf).limit(1).count() == 0L
    }
    assert(empty.isEmpty,
      s"no-oracle queries degenerate (0 rows) at $sf: $empty")
  }

  test("media dedup exercises the near-match branch: planted pairs found") {
    import graft.mm.MultimodalOps
    val off = MultimodalOps.CloneIdOffset
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // narrow probe (d <= 3) and wide probe (d <= 2) must BOTH surface
    // the planted clone of doc 0 (image) / doc 1 (audio)
    assert(pairs(MultimodalOps.imageDedup(spark, sf)).contains((0L, off)),
      "planted image near-dup pair not found by the multi-index probe")
    assert(pairs(MultimodalOps.imageDedupWide(spark, sf)).contains((0L, off)),
      "planted image near-dup pair not found by the wide-key probe")
    assert(pairs(MultimodalOps.audioDedup(spark, sf)).contains((1L, off + 1L)),
      "planted audio near-dup pair not found by the multi-index probe")
    assert(pairs(MultimodalOps.audioDedupWide(spark, sf))
        .contains((1L, off + 1L)),
      "planted audio near-dup pair not found by the wide-key probe")
  }

  test("survival family is non-vacuous: deaths reach both engines") {
    // the exact r14 defect class: an all-censored fixture keeps the
    // log-rank/KM math formally green while nothing is ever at risk
    val km = SparkEntry.queries("q_surv_km")(spark, sf)
    val deaths = km.selectExpr("sum(n_event)").collect()(0).getLong(0)
    assert(deaths > 0L, "survival fixture is all-censored (vacuous) again")
  }
}
