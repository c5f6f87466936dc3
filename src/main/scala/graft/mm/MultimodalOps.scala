package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.util.Det

/** A media item: opaque binary payload + typed metadata. At production the
  * payload is the raw image/audio/video bytes (or an object-store pointer
  * for large blobs) and `meta` carries container-level facts extracted at
  * ingest. */
case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte],
    width: Int, height: Int, sample_rate: Int)

/** One decoded feature record per media item. */
case class MediaFeatures(doc_id: Long, kind: String, features: Array[Float])

/** One sampled frame (fixed-size binary chunk) of a media payload. */
case class MediaFrame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

/** Multimodal-column plumbing: image/audio/video as opaque `BINARY`
  * columns with typed metadata, processed by per-partition batch
  * operators — the Spark-side shape of a decode/feature-extract stage.
  *
  * The DECODE ITSELF IS A STUB — this container has no image/audio codec
  * libraries, so [[decodeStub]] is a deterministic fake (byte histogram →
  * unit-norm float vector). Everything around it is real and load-bearing:
  * the schema, the typed Dataset boundary, per-partition batching (one
  * codec init per partition, not per row), frame sampling, and the
  * downstream aggregation. Swap [[decodeStub]] for a JNI/codec call and
  * the pipeline is production-shaped.
  *
  * Scale posture: payloads stay columnar-binary end to end (never
  * stringified), decode is mapPartitions (amortized setup, no shuffle),
  * frame sampling explodes map-side, and only fixed-width features flow
  * into shuffles.
  */
object MultimodalOps {

  private val FeatureDim = 16
  private val FrameBytes = 64

  /** Deterministic synthetic media over `documents`: payload = utf-8 bytes
    * of the text (a stand-in blob), kind/meta derived from doc_id. */
  def media(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes("UTF-8")
        val kind = if (id % 2 == 0) "image" else "audio"
        MediaRow(id, kind, payload,
          width = 16 + (id % 16).toInt, height = 16 + (id % 9).toInt,
          sample_rate = if (kind == "audio") 16000 else 0)
      }
  }

  /** STUB decoder: byte-value histogram folded into [[FeatureDim]] bins,
    * L2-normalized. Deterministic; replace with a real codec at prod. */
  private def decodeStub(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](FeatureDim)
    payload.foreach(b => hist((b & 0xff) % FeatureDim) += 1f)
    val norm = math.sqrt(hist.map(x => x.toDouble * x).sum)
    if (norm > 0) hist.map(x => (x / norm).toFloat) else hist
  }

  /** Batch feature extraction: one pass per partition (codec init once
    * per partition in the real version, not once per row). */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real version: val codec = Codec.open() — amortized here
      rows.map(m => MediaFeatures(m.doc_id, m.kind, decodeStub(m.payload)))
    }
  }

  /** Frame sampling: fixed-size binary chunks with frame index — the
    * video/audio windowing primitive (map-side explode, no shuffle). */
  def frameSample(media: Dataset[MediaRow]): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      m.payload.grouped(FrameBytes).zipWithIndex.map {
        case (chunk, i) => MediaFrame(m.doc_id, i, chunk)
      }
    }
  }

  /** Declared query: per-kind feature statistics — proves the whole
    * binary → decode → features → aggregate path end to end. No oracle
    * (binary plumbing is not SQL-expressible portably); spec-tested. */
  def features(spark: SparkSession, sfDir: String): DataFrame =
    decodeFeatures(media(spark, sfDir)).toDF()
      .select(col("doc_id"), col("kind"),
        element_at(col("features"), 1).cast("double").as("f0"),
        aggregate(col("features"), lit(0.0d),
          (acc, x) => acc + x.cast("double") * x.cast("double")).as("sq"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        Det.r4(avg(col("f0"))).as("avg_f0"),
        Det.r4(min(col("sq"))).as("min_sq"),
        Det.r4(max(col("sq"))).as("max_sq"))
      .orderBy("kind")

  /** Declared query: frames per kind — exercises the frame sampler. */
  def frames(spark: SparkSession, sfDir: String): DataFrame = {
    val m = media(spark, sfDir)
    frameSample(m).toDF()
      .join(m.toDF().select(col("doc_id"), col("kind")), "doc_id")
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_frames"),
        countDistinct(col("doc_id")).as("n_docs"),
        max(col("frame_idx")).as("max_frame_idx"))
      .orderBy("kind")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mm_features" -> features _,
    "q_mm_frames" -> frames _
  )

  /** No oracles: the binary decode path is engine-side by design. */
  val oracleSql: Map[String, String] = Map.empty
}
