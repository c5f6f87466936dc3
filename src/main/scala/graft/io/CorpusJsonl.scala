package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL corpus ingest — the format LLM training dumps actually arrive
  * in (one JSON document per line, frequently with a malformed tail
  * from truncated uploads). Same dead-letter discipline as the line
  * protocol's `parseLinesQuarantine`: nothing is silently dropped,
  * every rejected line survives with its raw text and a reason tag so
  * the feed owner can be paged with evidence.
  *
  * Scale posture: `spark.read.json` with an EXPLICIT schema — schema
  * inference would scan 100 TB twice; the declared schema makes the
  * read single-pass and lets Catalyst prune columns line-parse-side.
  * PERMISSIVE mode routes unparseable lines into the corrupt-record
  * column instead of failing the job (FAILFAST) or silently nulling
  * rows (DROPMALFORMED).
  */
object CorpusJsonl {

  /** The corpus document contract (documents.parquet's shape) plus the
    * corrupt-record capture column. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("lang", StringType),
    StructField("text", StringType),
    StructField("_raw_bad", StringType)))

  /** Read a JSONL path into (accepted, quarantined).
    *
    * Accepted rows carry the typed document columns; quarantined rows
    * carry the raw line and a reason: `unparseable` (not JSON / wrong
    * types — Spark put the line in the corrupt column) or
    * `missing_field` (valid JSON missing a required field — doc_id and
    * text are load-bearing downstream; source/lang default instead:
    * an unlabeled document is usable, an id-less or text-less one is
    * not). The split is one predicate over a single parse pass — the
    * input is never read twice. */
  /** The accept/quarantine fork — ONE set of predicates shared by the
    * batch and streaming readers so the two doors cannot drift. */
  private def split(parsed: DataFrame): (DataFrame, DataFrame) = {
    val bad = parsed.where(col("_raw_bad").isNotNull ||
        col("doc_id").isNull || col("text").isNull)
      .select(
        coalesce(col("_raw_bad"),
          to_json(struct(col("doc_id"), col("source"), col("lang"),
            col("text")))).as("raw"),
        when(col("_raw_bad").isNotNull, "unparseable")
          .otherwise("missing_field").as("reason"))
    val good = parsed.where(col("_raw_bad").isNull &&
        col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"),
        coalesce(col("source"), lit("unknown")).as("source"),
        coalesce(col("lang"), lit("und")).as("lang"),
        col("text"))
    (good, bad)
  }

  def readQuarantine(spark: SparkSession, path: String)
      : (DataFrame, DataFrame) =
    split(spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_raw_bad")
      .json(path)
      // Spark refuses plans that project ONLY the corrupt column off a
      // lazy json relation; materializing the parse once also keeps the
      // two forks from re-reading the input
      .localCheckpoint())

  /** Streaming twin: watch a directory for arriving JSONL dumps and
    * apply the SAME accept/quarantine split — the front door of the
    * streaming corpus pipeline (→ gopherGate → dedupCorpusStream →
    * budget admit). One streaming source, forked by the same
    * predicates; `maxFilesPerTrigger` bounds a micro-batch so one
    * giant dump cannot stall the trigger cadence. The corrupt-column
    * limitation that forces the batch reader's checkpoint does not
    * arise: both forks project typed columns alongside `_raw_bad`.
    * Returns (accepted, quarantined) streaming DataFrames; each fork
    * started as its own query lists the directory independently —
    * callers that must parse each dump exactly once wrap ONE fork in
    * `foreachBatch` and apply the batch split per micro-batch. */
  /** JSONL EXPORT — the other end of the pipeline: write a curated
    * corpus as train-ready JSONL shards in a DETERMINISTIC layout.
    * A row's shard GROUP is a pure function of row content — the first
    * 32 bits of md5(text) mod nShards — and the physical file a group
    * lands in is a further fixed re-hash of that id
    * (`repartition(n, col)` murmur-hashes the shard id), so output
    * files need not map 1:1 to shard ids (a part file can carry two
    * groups, another may be empty) but the whole layout is still a
    * deterministic pure function of corpus content. What the layout is
    * NEVER built from is a sampled range boundary: a
    * RangePartitioner's boundaries come from a reservoir sample, which
    * is only reproducible while the sample covers every row, so at
    * production corpus sizes two exports of the same corpus from
    * different upstream partitionings could place rows in different
    * shards. Rows inside a shard sort in (md5(text), doc_id) order —
    * the same canonical order packing uses — so a re-export of the
    * same corpus is byte-stable regardless of upstream partitioning at
    * ANY scale. One hash shuffle + local sort; Spark's json writer
    * handles escaping, so [[readQuarantine]] round-trips every
    * document including exotic text (spec'd). */
  def writeShards(docs: DataFrame, dir: String, nShards: Int = 8): Unit =
    docs.select(col("doc_id"), col("source"), col("lang"), col("text"),
        md5(col("text")).as("__h"))
      .withColumn("__shard",
        pmod(conv(substring(col("__h"), 1, 8), 16, 10).cast("long"),
          lit(nShards.toLong)))
      .repartition(nShards, col("__shard"))
      .sortWithinPartitions("__h", "doc_id")
      .drop("__h", "__shard")
      .write.mode("overwrite").json(dir)

  def readStreamQuarantine(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 16): (DataFrame, DataFrame) =
    split(spark.readStream
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_raw_bad")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir))
}
