package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{AnnIndex, AnnServing, VectorOps}

/** The serving facade: budget chooser arithmetic, tier dispatch equality
  * with the direct probes, and the report's spec'd invariants. */
class AnnServingSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private def sf = TestSpark.sf

  private val dim = 64

  test("choose picks the highest-fidelity tier that fits the budget") {
    val n = 1000L // entries (vectors x replicas)
    // flat = 256 B/entry, sq8 = 64, pq = 8
    assert(AnnServing.choose(n, dim, 256L * n) == AnnServing.Flat)
    assert(AnnServing.choose(n, dim, 256L * n - 1) == AnnServing.Sq8)
    assert(AnnServing.choose(n, dim, 64L * n) == AnnServing.Sq8)
    assert(AnnServing.choose(n, dim, 64L * n - 1) == AnnServing.Pq)
    assert(AnnServing.choose(n, dim, 8L * n) == AnnServing.Pq)
    // unservable budget still floors at PQ rather than failing
    assert(AnnServing.choose(n, dim, 0L) == AnnServing.Pq)
  }

  test("ladder is fidelity-ordered and byte ratios are the documented 4x/32x") {
    assert(AnnServing.ladder.map(_.name) == Seq("flat", "sq8", "pq"))
    assert(AnnServing.Flat.bytesPerEntry(dim) ==
      4 * AnnServing.Sq8.bytesPerEntry(dim))
    assert(AnnServing.Flat.bytesPerEntry(dim) ==
      32 * AnnServing.Pq.bytesPerEntry(dim))
  }

  test("topk through each tier equals that tier's direct probe") {
    val e = graft.io.Tables.embeddings(spark, sf)
    val q = e.where(col("vec_id") === 0).select(col("embedding").as("qe"))
    val k = VectorOps.KCells; val r = VectorOps.IndexReplicas
    def ids(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
      df.select(col("vec_id"), col("sim")).collect()
        .map(x => (x.getLong(0), x.getDouble(1))).toSeq

    val flatDirect = AnnIndex.probe(AnnIndex.buildOrGet(spark, sf, k, r),
      q, VectorOps.NProbe, 5, Some(0L)).select(col("vec_id"), col("sim"))
    assert(ids(AnnServing.topk(spark, sf, q, AnnServing.Flat,
      excludeVecId = Some(0L))) == ids(flatDirect))

    val sqDirect = AnnIndex.sqProbe(AnnIndex.buildSqOrGet(spark, sf, k, r),
      e, q, VectorOps.NProbe, 5, VectorOps.PqRerank, Some(0L))
    assert(ids(AnnServing.topk(spark, sf, q, AnnServing.Sq8,
      excludeVecId = Some(0L))) == ids(sqDirect))

    val pqDirect = AnnIndex.pqProbe(AnnIndex.buildPqOrGet(spark, sf, k, r),
      e, q, VectorOps.NProbe, 5, VectorOps.PqRerank, Some(0L))
    assert(ids(AnnServing.topk(spark, sf, q, AnnServing.Pq,
      excludeVecId = Some(0L))) == ids(pqDirect))
  }

  test("report: ladder rows, exact byte accounting, one chosen, recall bounds") {
    val rows = AnnServing.report(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("flat", "sq8", "pq"))
    val byName = rows.map(r => r.getString(0) -> r).toMap
    // byte accounting: per-entry sizes exact; totals = bpe * entries
    assert(byName("flat").getLong(1) == 256L)
    assert(byName("sq8").getLong(1) == 64L)
    assert(byName("pq").getLong(1) == 8L)
    val entries = AnnIndex.buildOrGet(spark, sf, VectorOps.KCells,
      VectorOps.IndexReplicas).lists.count()
    rows.foreach(r => assert(r.getLong(2) == r.getLong(1) * entries))
    // the 30%-of-flat reference budget: sq8 and pq fit, flat does not
    assert(!byName("flat").getBoolean(3))
    assert(byName("sq8").getBoolean(3) && byName("pq").getBoolean(3))
    // exactly one chosen, and it is what choose() elects at that budget
    val chosen = rows.filter(_.getBoolean(4)).map(_.getString(0)).toSeq
    val budget = (4L * dim * entries * 30L) / 100L
    assert(chosen == Seq(AnnServing.choose(entries, dim, budget).name))
    // recall@5 well-defined; the flat rung probes the same cells the
    // exact scan lives in, so it must find most of the true top-5
    rows.foreach { r =>
      val rec = r.getDouble(5)
      assert(rec >= 0.0 && rec <= 1.0, s"recall $rec")
    }
    assert(byName("flat").getDouble(5) >= 0.6,
      s"flat recall ${byName("flat").getDouble(5)}")
  }
}
