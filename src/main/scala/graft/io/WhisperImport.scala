package graft.io

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.{AggMethod, Archive, RetentionPolicy}

/** A parsed Whisper archive descriptor: byte offset of the point ring,
  * step, and slot count (`whisper.py — archiveInfoFormat` [U: public
  * graphite-project/whisper format, same family as Kenshin's packed
  * files per SURVEY §2.1 R19]). */
final case class WhisperArchiveInfo(offset: Int, secondsPerPoint: Long,
    points: Long)

/** Parsed Whisper file header (`whisper.py — metadataFormat`). */
final case class WhisperHeader(agg: AggMethod, maxRetention: Long,
    xFilesFactor: Float, archives: Seq[WhisperArchiveInfo])

/** Whisper (.wsp) file import — the file-level half of R19 migration
  * (`kenshin-import`/`rurouni` migrate Whisper rings into Kenshin packed
  * files; we migrate them into the lake layout instead).
  *
  * Format (public, graphite-project/whisper, all BIG-endian):
  *   metadata  = aggregationType:u32, maxRetention:u32, xFilesFactor:f32,
  *               archiveCount:u32
  *   archive×N = offset:u32, secondsPerPoint:u32, points:u32
  *   ring data = (timestamp:u32, value:f64) per slot; timestamp 0 marks
  *               an empty slot.
  *
  * Scale posture: files load via Spark's `binaryFile` source (each .wsp
  * is one row, parsed map-side into points — a ~100 KB–10 MB blob each,
  * embarrassingly parallel over millions of metrics), then the points
  * flow into the same RollupRouter/date-partitioned layout as live
  * ingest. Nothing collects to the driver.
  */
object WhisperImport {

  private val AggByCode: Map[Int, AggMethod] =
    Map(1 -> AggMethod.Average, 2 -> AggMethod.Sum, 3 -> AggMethod.Last,
      4 -> AggMethod.Max, 5 -> AggMethod.Min)
  private val CodeByAgg = AggByCode.map(_.swap)

  private val MetaLen = 16
  private val ArchiveInfoLen = 12
  private val PointLen = 12

  def parseHeader(bytes: Array[Byte]): WhisperHeader = {
    require(bytes.length >= MetaLen, s"truncated whisper file: ${bytes.length}")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val aggCode = buf.getInt
    val agg = AggByCode.getOrElse(aggCode,
      throw new IllegalArgumentException(s"bad aggregationType $aggCode"))
    val maxRetention = Integer.toUnsignedLong(buf.getInt)
    val xff = buf.getFloat
    val n = buf.getInt
    require(n > 0 && n < 1024, s"implausible archiveCount $n")
    require(bytes.length >= MetaLen + n * ArchiveInfoLen,
      "truncated archive table")
    val archives = (0 until n).map { _ =>
      WhisperArchiveInfo(buf.getInt, Integer.toUnsignedLong(buf.getInt),
        Integer.toUnsignedLong(buf.getInt))
    }
    archives.foreach(a => require(
      a.offset >= 0 && a.offset + a.points * PointLen <= bytes.length,
      s"archive ring out of bounds: $a"))
    WhisperHeader(agg, maxRetention, xff, archives)
  }

  /** All stored points of every archive: (archiveIdx, epochSeconds,
    * value); empty slots (timestamp 0) are skipped. Slot order is ring
    * order — consumers aggregate, so order is irrelevant. */
  def parsePoints(bytes: Array[Byte],
      header: WhisperHeader): Iterator[(Int, Long, Double)] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    header.archives.iterator.zipWithIndex.flatMap { case (a, idx) =>
      (0L until a.points).iterator.flatMap { slot =>
        buf.position(a.offset + (slot * PointLen).toInt)
        val ts = Integer.toUnsignedLong(buf.getInt)
        val v = buf.getDouble
        if (ts == 0L) None else Some((idx, ts, v))
      }
    }
  }

  /** Encode a Whisper file — the write half used by the spec roundtrip
    * and by exports back to a Graphite deployment. `archives` pairs each
    * (step, slots) with its stored points (epochSeconds → value). */
  def encode(agg: AggMethod, xff: Float,
      archives: Seq[(Archive, Map[Long, Double])]): Array[Byte] = {
    val headerLen = MetaLen + archives.length * ArchiveInfoLen
    val total = headerLen + archives.map(_._1.points * PointLen).sum.toInt
    val buf = ByteBuffer.allocate(total).order(ByteOrder.BIG_ENDIAN)
    buf.putInt(CodeByAgg(agg))
      .putInt(archives.map(_._1.retentionSeconds).max.toInt)
      .putFloat(xff)
      .putInt(archives.length)
    var offset = headerLen
    archives.foreach { case (a, _) =>
      buf.putInt(offset).putInt(a.secondsPerPoint.toInt)
        .putInt(a.points.toInt)
      offset += (a.points * PointLen).toInt
    }
    archives.foreach { case (a, pts) =>
      // whisper ring placement is BASE-RELATIVE: the archive's first
      // point sits at slot 0 and defines the base timestamp; every other
      // point lands at ((ts - base) / step) mod points. whisper.py's
      // fetch anchors on slot 0's timestamp, so an absolute (ts/step)
      // placement would read as an EMPTY archive in a real Graphite
      // stack. Insert in ts order so slot collisions deterministically
      // keep the NEWEST point (the ring-overwrite semantic).
      val slots = new Array[(Long, Double)](a.points.toInt)
      val base = if (pts.isEmpty) 0L
        else pts.keys.min / a.secondsPerPoint * a.secondsPerPoint
      pts.toSeq.sortBy(_._1).foreach { case (ts, v) =>
        slots((((ts - base) / a.secondsPerPoint) % a.points).toInt) = (ts, v)
      }
      slots.foreach {
        case null => buf.putInt(0).putDouble(0.0)
        case (ts, v) => buf.putInt(ts.toInt).putDouble(v)
      }
    }
    buf.array()
  }

  /** Read a whisper storage root (recursively) as a points DataFrame
    * `(metric, archive, step_s, ts, value)`, parsed map-side via the
    * `binaryFile` source. Real Graphite storage nests files — metric
    * `stats.web.host1.p95` lives at `stats/web/host1/p95.wsp` — so the
    * metric is the path RELATIVE TO THE ROOT with '/' mapped to '.'
    * (whisper's directory-to-metric convention); a flat layout with dots
    * in the file name reads identically. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val rootAbs = {
      val hp = new org.apache.hadoop.fs.Path(path)
      hp.getFileSystem(spark.sessionState.newHadoopConf())
        .makeQualified(hp).toUri.getPath
    }
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.wsp")
      .option("recursiveFileLookup", "true")
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        // the binaryFile `path` column is a Hadoop Path string, not an
        // RFC-compliant URI (spaces etc. would throw in java.net.URI) —
        // derive the filesystem path the same way rootAbs is derived
        val abs = new org.apache.hadoop.fs.Path(p).toUri.getPath
        val rel =
          if (abs.startsWith(rootAbs)) abs.stripPrefix(rootAbs).stripPrefix("/")
          else abs.split('/').last // unexpected mount-point drift: leaf name
        // rel is empty when `path` addressed this single FILE directly —
        // the metric is then the leaf name, as before the nested layout
        val metric = (if (rel.isEmpty) abs.split('/').last else rel)
          .stripSuffix(".wsp").replace('/', '.')
        val header = parseHeader(bytes)
        parsePoints(bytes, header).map { case (idx, ts, v) =>
          (metric, idx, header.archives(idx).secondsPerPoint, ts, v)
        }
      }
      .toDF("metric", "archive", "step_s", "ts_s", "value")
      .withColumn("ts", timestamp_seconds(col("ts_s")))
      .select(col("metric"), col("archive"), col("step_s"), col("ts"),
        col("value"))
  }

  /** Stream a key-sorted iterator as (key, group) chunks — at most ONE
    * key's rows are ever buffered (a single metric's history), never the
    * whole partition: the executor-heap-safe replacement for
    * `rows.toSeq.groupBy`. */
  private[graft] def groupConsecutive[K, V](
      it: Iterator[(K, V)]): Iterator[(K, Seq[V])] =
    new Iterator[(K, Seq[V])] {
      private val b = it.buffered
      def hasNext: Boolean = b.hasNext
      def next(): (K, Seq[V]) = {
        val k = b.head._1
        val buf = scala.collection.mutable.ArrayBuffer.empty[V]
        while (b.hasNext && b.head._1 == k) buf += b.next()._2
        (k, buf.toSeq)
      }
    }

  /** Write one metric's .wsp under whisper's nested directory-to-metric
    * convention (`a.b.c` → `a/b/c.wsp`); dot-free metrics stay flat. */
  private def writeWsp(dir: String, metric: String,
      bytes: Array[Byte]): Unit = {
    val p = java.nio.file.Paths.get(dir, metric.replace('.', '/') + ".wsp")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, bytes)
  }

  /** Export a points DataFrame back to per-metric .wsp files — the
    * outbound half of the migration roundtrip (lake → Graphite), e.g.
    * serving a rollup table to a legacy whisper-reading stack. Points
    * must already be aligned to `archive.secondsPerPoint`; one file per
    * metric, written by the executor holding that metric's partition
    * (`dir` is shared storage at production; points beyond the ring's
    * retention overwrite older slots, newest-wins). */
  def export(points: DataFrame, dir: String, archive: Archive,
      agg: AggMethod = AggMethod.Average, xff: Float = 0.5f): Unit = {
    points
      .select(col("metric"), col("ts").cast("long").as("ts_s"),
        col("value").cast("double"))
      .repartition(col("metric"))
      .sortWithinPartitions("metric")
      // sorted partition + streaming group-by-consecutive-key: the
      // executor buffers ONE metric's history at a time, not the whole
      // partition (which holds ~|metrics|/P full histories — an OOM at
      // real retention)
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        groupConsecutive(rows.map(r =>
            r.getString(0) -> (r.getLong(1), r.getDouble(2))))
          .foreach { case (metric, pts) =>
            writeWsp(dir, metric, encode(agg, xff, Seq(archive -> pts.toMap)))
          }
      }
  }

  /** Full-policy export: archive 0 is aggregated from the raw points;
    * each coarser archive PROPAGATES from the previous one (aggregate
    * the stored archive values, materialize a bucket only when the
    * fraction of backing higher-res points reaches xFilesFactor) —
    * Kenshin's propagate semantics (R5), not independent re-rollups of
    * raw. Each metric gets ONE .wsp carrying the complete archive set.
    * One shuffle per archive grain + one on metric for file assembly. */
  def exportPolicy(points: DataFrame, dir: String,
      policy: RetentionPolicy): Unit = {
    import graft.catalog.RollupRouter
    def align(ts: Column, step: Long): Column =
      ((ts.cast("long") / step).cast("long") * lit(step))
    val a0 = policy.archives.head
    var prev = points
      .groupBy(col("metric"), align(col("ts"), a0.secondsPerPoint).as("ts_s"))
      .agg(RollupRouter.detAgg(policy.agg, col("value"), col("ts")).as("v"))
      .select(col("metric"), col("ts_s"), col("v"))
    val perArchive = Seq.newBuilder[DataFrame]
    perArchive += prev.select(col("metric"), lit(0).as("archive"),
      col("ts_s"), col("v"))
    policy.archives.zipWithIndex.tail.foreach { case (a, i) =>
      val ratio = a.secondsPerPoint / policy.archives(i - 1).secondsPerPoint
      val cur = prev
        .groupBy(col("metric"), align(col("ts_s"), a.secondsPerPoint)
          .as("ts_c"))
        .agg(RollupRouter.detAgg(policy.agg, col("v"),
          timestamp_seconds(col("ts_s"))).as("v"),
          count(lit(1)).as("np"))
        .where(col("np").cast("double") / lit(ratio.toDouble) >=
          lit(policy.xFilesFactor)) // the xff gate (R5)
        .select(col("metric"), col("ts_c").as("ts_s"), col("v"))
      perArchive += cur.select(col("metric"), lit(i).as("archive"),
        col("ts_s"), col("v"))
      prev = cur
    }
    val archives = policy.archives
    val agg = policy.agg
    val xff = policy.xFilesFactor.toFloat
    perArchive.result().reduce(_ unionByName _)
      .repartition(col("metric"))
      .sortWithinPartitions("metric")
      // same streaming per-metric grouping as [[export]]: one metric's
      // archive set in memory at a time, never the partition
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        groupConsecutive(rows.map(r =>
            r.getString(0) -> (r.getInt(1), r.getLong(2), r.getDouble(3))))
          .foreach { case (metric, rs) =>
            val byArchive = rs.groupBy(_._1)
            val payload = archives.zipWithIndex.map { case (a, i) =>
              a -> byArchive.getOrElse(i, Seq.empty)
                .map(t => t._2 -> t._3).toMap
            }
            writeWsp(dir, metric, encode(agg, xff, payload))
          }
      }
  }

  /** Bridge an imported header to the catalog: the file's archive set as
    * a [[RetentionPolicy]] matching exactly its metric name. */
  def toPolicy(metric: String, header: WhisperHeader): RetentionPolicy =
    RetentionPolicy(metric,
      ("^" + java.util.regex.Pattern.quote(metric) + "$").r,
      header.archives.map(a => Archive(a.secondsPerPoint, a.points)),
      header.agg, header.xFilesFactor)
}
