package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables

/** One serving facade over the three ANN ladder rungs (SURVEY §8 item:
  * unify flat / SQ8 / PQ-OPQ behind a memory-budget chooser).
  *
  * The three indexes ([[AnnIndex.Index]], [[AnnIndex.SqIndex]],
  * [[AnnIndex.PqIndex]]) share the coarse quantizer and probe shape but
  * differ in what the inverted lists CARRY — and therefore in what a
  * 10^9-vector deployment pays to hold them hot:
  *
  *   tier   list payload/entry (dim=64)   fidelity
  *   flat   4·dim = 256 B                 exact ADC (the list IS the vector)
  *   sq8    1·dim =  64 B                 per-dim midpoint reconstruction
  *   pq     m     =   8 B                 shared codewords (+ exact re-rank)
  *
  * [[choose]] picks the highest-fidelity tier whose total list payload
  * fits the caller's memory budget — the decision an operator otherwise
  * makes by hand, made once and testable. [[topk]] then serves the probe
  * through the chosen rung, reusing the session-shared bounded registries
  * (every rung is built at most once per session regardless of how many
  * probes or which facade entry hit it).
  */
object AnnServing {

  /** A ladder rung, ordered by fidelity. `bytesPerEntry` is the
    * inverted-list payload per indexed entry (the component that scales
    * with corpus size; cells/codebooks are model-sized). */
  sealed abstract class Tier(val name: String, val rank: Int) {
    def bytesPerEntry(dim: Int): Long
  }
  /** Full float32 vectors in the lists — exact scoring, largest lists. */
  case object Flat extends Tier("flat", 0) {
    def bytesPerEntry(dim: Int): Long = 4L * dim
  }
  /** 1 byte/dim scalar codes — 4× smaller lists, per-dim resolution. */
  case object Sq8 extends Tier("sq8", 1) {
    def bytesPerEntry(dim: Int): Long = dim.toLong
  }
  /** m-byte product codes (m = [[AnnIndex]]'s 8) — 32× smaller lists;
    * candidates are exactly re-ranked against the source table. */
  case object Pq extends Tier("pq", 2) {
    def bytesPerEntry(dim: Int): Long = 8L
  }

  /** Fidelity order: prefer the fattest representation that fits. */
  val ladder: Seq[Tier] = Seq(Flat, Sq8, Pq)

  /** Highest-fidelity tier whose total list payload (`nEntries ×
    * bytesPerEntry` — nEntries = vectors × replicas) fits
    * `budgetBytes`. PQ is the floor: if even m-byte codes exceed the
    * budget the caller's budget is unservable and PQ is still the best
    * answer this ladder has. */
  def choose(nEntries: Long, dim: Int, budgetBytes: Long): Tier =
    ladder.find(t => nEntries * t.bytesPerEntry(dim) <= budgetBytes)
      .getOrElse(Pq)

  /** Serve a top-`limit` probe through `tier`, building (or fetching
    * from the session registry) that tier's index. The query contract is
    * identical across rungs: a 1-row `query(qe)` DataFrame in, ranked
    * `(vec_id, sim)` out — callers switch tiers without rewriting the
    * probe. */
  def topk(spark: SparkSession, sfDir: String, query: DataFrame,
      tier: Tier, nprobe: Int = VectorOps.NProbe, limit: Int = 5,
      excludeVecId: Option[Long] = None): DataFrame = {
    val k = VectorOps.KCells; val r = VectorOps.IndexReplicas
    tier match {
      case Flat =>
        AnnIndex.probe(AnnIndex.buildOrGet(spark, sfDir, k, r), query,
            nprobe, limit, excludeVecId)
          .select(col("vec_id"), col("sim"))
      case Sq8 =>
        AnnIndex.sqProbe(AnnIndex.buildSqOrGet(spark, sfDir, k, r),
          Tables.embeddings(spark, sfDir), query, nprobe, limit,
          VectorOps.PqRerank, excludeVecId)
      case Pq =>
        AnnIndex.pqProbe(AnnIndex.buildPqOrGet(spark, sfDir, k, r),
          Tables.embeddings(spark, sfDir), query, nprobe, limit,
          VectorOps.PqRerank, excludeVecId)
    }
  }

  /** The serving report — the fidelity-vs-memory tradeoff surfaced as a
    * query (one row per rung, ladder order): list bytes per entry and in
    * total at this corpus, whether the rung fits the reference budget
    * (30% of flat — sits between sq8's 25% and flat's 100%, so the
    * chooser's work is visible in the output), which rung [[choose]]
    * elects, and measured recall@5 of each rung's probe against the
    * brute-force top-5 for the same query vector. No oracle: recall is
    * centroid/codebook-dependent (kmeans); invariants are spec'd in
    * AnnServingSpec (byte ratios exact, exactly one chosen, recall
    * bounds, chosen == choose()).
    *
    * Cost posture: every index comes from the shared registries (built
    * once per session across ALL ann queries); the probes and the
    * recall join run over ≤ rerank-row short lists. */
  def report(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val e = Tables.embeddings(spark, sfDir)
    val q = e.where(col("vec_id") === 0).select(col("embedding").as("qe"))
    val dim = 64
    // entry count is representation-independent (vectors × replicas);
    // read it off the flat lists, which every rung shares structurally
    val idx = AnnIndex.buildOrGet(spark, sfDir, VectorOps.KCells,
      VectorOps.IndexReplicas)
    val entries = idx.lists.agg(count(lit(1)).as("n_entries"))
    val brute = VectorOps.cosineTopk(spark, sfDir).select(col("vec_id"))
    val tiers = ladder.map(t => (t.rank, t.name, t.bytesPerEntry(dim)))
      .toDF("tier_rank", "tier", "bytes_per_entry")
    val probes = ladder.map { t =>
      topk(spark, sfDir, q, t, excludeVecId = Some(0L))
        .select(lit(t.rank).as("tier_rank"), col("vec_id"))
    }.reduce(_ unionAll _)
    val hits = probes.join(brute, "vec_id")
      .groupBy(col("tier_rank")).agg(count(lit(1)).as("hits"))
    tiers
      .join(hits, Seq("tier_rank"), "left")
      .crossJoin(broadcast(entries))
      .select(col("tier_rank"), col("tier"), col("bytes_per_entry"),
        (col("bytes_per_entry") * col("n_entries")).as("list_bytes"),
        // reference budget: 30% of the flat payload at this corpus
        (col("bytes_per_entry") * lit(100L) <=
          lit(4L * dim) * lit(30L)).as("fits_budget"),
        (coalesce(col("hits"), lit(0L)).cast("double") / lit(5.0))
          .as("recall_at_5"))
      .withColumn("chosen",
        col("fits_budget") &&
          col("tier_rank") === min(when(col("fits_budget"),
            col("tier_rank"))).over(
              org.apache.spark.sql.expressions.Window.partitionBy(lit(1))))
      .select(col("tier"), col("bytes_per_entry"), col("list_bytes"),
        col("fits_budget"), col("chosen"), col("recall_at_5"))
      .orderBy(col("bytes_per_entry").desc)
  }
}
