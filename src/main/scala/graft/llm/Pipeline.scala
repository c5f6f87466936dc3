package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.util.Det

/** The composed training-data preparation pipeline — the reason the LLM
  * operators exist as one library: quality gate → exact dedup →
  * near-dup removal → token accounting, each stage a pure DataFrame
  * transformation of the previous one.
  *
  * Stage order matters at scale: the cheap per-row quality gate runs
  * first (map-only, prunes before any shuffle), exact dedup second (one
  * 16-byte-key shuffle), MinHash/LSH near-dup last (runs on the already
  * thinned corpus). Token accounting is a single aggregation over the
  * survivors.
  */
object Pipeline {

  /** Per-doc survival report: every document with its gate outcomes —
    * the audit trail a curation run keeps. */
  def prepare(spark: SparkSession, sfDir: String,
      minTokens: Long = 20, minScore: Double = 0.55): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
    val toks = split(col("text"), " ")
    val nTok = size(toks).cast("long")
    val nUniq = size(array_distinct(toks)).cast("long")
    val nStop = size(filter(toks, t => t === "the" || t === "a")).cast("long")
    val score = (nUniq.cast("double") / nTok) * lit(0.5) +
      (lit(1.0) - nStop.cast("double") / nTok) * lit(0.5)

    // stage 1: map-side quality gate
    val gated = docs.select(col("doc_id"), col("lang"), col("text"),
      nTok.as("n_tok"), Det.r4(score).as("q_score"),
      (nTok >= minTokens && score >= minScore).as("pass_quality"))

    // stage 2: exact dedup — keep the smallest doc_id per normalized key.
    // checkpoint: `keyed` feeds BOTH the keeper aggregate and the
    // join-back below, and join children don't CSE — without it the
    // map-side gate + the md5 normalization run twice inside
    // afterExact's own materialization (r18, guide §1.2/§5)
    val keyed = gated.withColumn("exact_key",
      md5(concat_ws(" ", array_sort(array_distinct(split(lower(col("text")), " "))))))
      .localCheckpoint(eager = false)
    val keeper = keyed.where(col("pass_quality"))
      .groupBy(col("exact_key")).agg(min(col("doc_id")).as("keep_id"))
    // The CC resolution below is eager (bounded collect), so it runs the
    // gate→dedup chain once; checkpointing the stage-2 result lets the
    // final report re-read those materialized partitions instead of
    // re-running the gate + 16-byte-key dedup a second time. (Plan
    // assertions must inspect the pre-checkpoint plan.)
    val afterExact = keyed.join(keeper, Seq("exact_key"), "left")
      .withColumn("pass_exact",
        col("pass_quality") && col("doc_id") === col("keep_id"))
      .localCheckpoint(eager = false)

    // stage 3: near-dup removal — LSH candidates computed over the
    // SURVIVORS of stages 1–2 only (the corpus is already thinned, so
    // shingling/minhashing never touches dropped docs); the verified
    // pairs resolve into connected components ([[DupCluster]]) and each
    // cluster keeps exactly its minimum doc_id (a greedy per-pair drop
    // would over-delete on chains a~b~c). The resolution is the one
    // eager step: its bounded collect runs the gate→dedup→LSH chain
    // once, and the drop list comes back as a LocalRelation, so the
    // final report is a broadcast join plus one cheap recompute of the
    // map-side gate + 16-byte-key dedup.
    val survivors = afterExact.where(col("pass_exact"))
      .select(col("doc_id"), col("lang"), col("text"))
    val nearPairs = TextOps.minhashPairsOver(survivors)
      .select(col("a_id"), col("b_id"))
    val nearDropIds = DupCluster.resolve(nearPairs)
      .where(col("id") =!= col("label"))
      .select(col("id").as("doc_id"))
      .withColumn("near_dup", lit(true))
    afterExact.join(nearDropIds, Seq("doc_id"), "left")
      .withColumn("kept", col("pass_exact") &&
        coalesce(!col("near_dup"), lit(true)))
      .select(col("doc_id"), col("lang"), col("n_tok"), col("q_score"),
        col("pass_quality"), col("pass_exact"), col("kept"))
      .orderBy("doc_id")
  }

  /** Corpus-level outcome: per lang, docs and tokens in vs out, PLUS
    * the per-stage attribution (tokens lost to the quality gate, to
    * exact dedup, to near-dup removal) — the drop accounting a real
    * curation report needs to explain WHERE the corpus went, not just
    * how much is left. Stage buckets are disjoint by construction
    * (each doc fails at exactly one first gate), so they sum to
    * tokens_in - tokens_kept. */
  def corpusStats(spark: SparkSession, sfDir: String): DataFrame =
    prepare(spark, sfDir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_in"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(col("n_tok")).as("tokens_in"),
        sum(when(col("kept"), col("n_tok")).otherwise(0L)).as("tokens_kept"),
        sum(when(!col("pass_quality"), col("n_tok")).otherwise(0L))
          .as("tokens_drop_quality"),
        sum(when(col("pass_quality") && !col("pass_exact"), col("n_tok"))
          .otherwise(0L)).as("tokens_drop_exact"),
        sum(when(col("pass_exact") && !col("kept"), col("n_tok"))
          .otherwise(0L)).as("tokens_drop_near"))
      .orderBy("lang")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_llm_corpus_prep" -> corpusStats _
  )
}
