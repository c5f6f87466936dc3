package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical layout at production scale — the part of the 100 TB story
  * that is data placement, not query shape.
  *
  * Kenshin's packed ring files achieve (a) O(1) expiry by overwrite and
  * (b) batched sequential IO. In a lake layout the same economics come
  * from: date partitioning (expiry = partition drop, pruning = free
  * range predicates), metric-hash bucketing inside each date (bounded
  * file counts + co-located series reads), and rollup tables replacing
  * raw beyond each archive's retention (RollupRouter).
  */
object Layout {

  /** Write points date-partitioned: `.../date=YYYY-MM-DD/part-*.parquet`.
    * Range predicates on `ts` prune partitions at read (PartitionFilters);
    * retention expiry is `rm` of whole directories — Kenshin's ring
    * overwrite, lake-style. */
  def writeDatePartitioned(points: DataFrame, path: String,
      tsCol: String = "ts"): Unit =
    points
      .withColumn("date", date_format(col(tsCol), "yyyy-MM-dd"))
      .repartition(col("date")) // one shuffle → one writer set per day
      .write.partitionBy("date").mode("overwrite").parquet(path)

  /** Read back with pruning intact (`date` stays a partition column). */
  def readDatePartitioned(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.parquet(path)

  /** Bucketed managed table: hash-bucket (and optionally sort) rows by
    * the join key at WRITE time, so equi-joins between tables bucketed
    * the same way read co-located buckets and skip the shuffle entirely
    * (SortMergeJoin with zero Exchange — asserted in LayoutSpec). This
    * is the lake answer to Kenshin's consistent-hash sharding (R16) for
    * the JOIN path: pay the partitioning once at ingest, reuse it for
    * every subsequent join/agg on that key. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      key: String, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*)
     else w).saveAsTable(table)
  }

  /** Two-phase (salted) aggregation for skewed keys: partial-aggregate on
    * (key, salt) to spread a hot key over `salts` reducers, then combine.
    * `merge` must be the algebraic combine of `partial` (sum/sum, etc.).
    * Results are identical to a direct groupBy — this only reshapes the
    * shuffle. Use when one key holds ≫ 1/partitions of the data. */
  def saltedAgg(df: DataFrame, key: Column, salts: Int,
      partial: Column => Column, merge: Column => Column,
      valueCol: Column): DataFrame =
    df.groupBy(key.as("k"),
        pmod(spark_partition_id(), lit(salts)).as("salt"))
      .agg(partial(valueCol).as("pv"))
      .groupBy(col("k"))
      .agg(merge(col("pv")).as("v"))
  // salt = input partition id, NOT a hash of the value: a hot key whose
  // values are constant (the common skew case — one counter hammered with
  // the same reading) still spreads over min(salts, input partitions)
  // reducers, and the salt needs no extra column or RNG.

  /** Small-file COMPACTION — the table-maintenance half of the 100 TB
    * story: streaming ingest (one writer set per micro-batch) fragments
    * a table into thousands of KB-sized files whose per-file open/footer
    * cost eventually dominates reads. Rewrite the table into
    * ceil(bytes / targetFileBytes) files and swap via a staging
    * directory (write → verify row count → two renames). The swap is a
    * SINGLE-WRITER maintenance op: a crash between the renames leaves
    * the data at `<path>_precompact` and the NEXT compact() call
    * auto-recovers it; a concurrent reader can hit the brief not-found
    * window between renames. Returns (filesBefore, filesAfter). Run per
    * date-partition at production so compaction itself stays bounded.
    * Tables whose columns need a normalizing read (the ns-timestamp
    * events parquet — see [[Tables.events]]) must be rewritten through
    * that path first; this op preserves standard-typed tables only. */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    val hp = new Path(path)
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    val backup = new Path(hp.getParent, hp.getName + "_precompact")
    // auto-recover a compaction that died between the two renames: the
    // data survives intact at the backup path
    if (!fs.exists(hp) && fs.exists(backup)) {
      require(fs.rename(backup, hp),
        s"recovery of interrupted compaction failed for $path")
    }
    def dataFiles(p: Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val before = dataFiles(hp)
    // a partitioned ROOT has no top-level data files; rewriting it here
    // would silently flatten the partition directories — compact the
    // leaf partition directories instead (as the doc prescribes)
    require(before.nonEmpty,
      s"$path has no top-level parquet files — compact leaf partitions")
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1L,
      (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    val staging = new Path(hp.getParent, hp.getName + "_compacting")
    val src = spark.read.parquet(path)
    val nRows = src.count()
    src.repartition(nOut).write.mode("overwrite").parquet(staging.toString)
    require(spark.read.parquet(staging.toString).count() == nRows,
      "compaction must conserve rows") // verify BEFORE the swap
    fs.delete(backup, true)
    require(fs.rename(hp, backup), s"could not stage away $path")
    if (!fs.rename(staging, hp)) {
      // a failed (not crashed) publish must leave the table readable NOW,
      // not at the next compact()'s auto-recovery: put the original back
      val restored = fs.rename(backup, hp)
      throw new IllegalStateException(
        s"could not publish compacted $path" +
          (if (restored) " (original restored)"
           else s" AND rollback failed — data is at $backup"))
    }
    fs.delete(backup, true)
    (before.length, dataFiles(hp).length)
  }

  /** Fold an APPEND-MODE rollup (one partial row per micro-batch per
    * bucket — [[graft.streaming.Ingest.liveRollupWriter]]'s shape) back
    * to ONE row per (metric, bucket): partials recombine exactly
    * (decimal sums for sum_v and n, min/max of min/max — all
    * decomposable). Conservation is verified BEFORE the swap on the
    * decomposable totals: Σsum_v and Σn are invariant under the fold,
    * and the folded row count must equal the distinct (metric, bucket)
    * count. After compaction the table can re-register with
    * `appendRollup = false`, restoring the pure one-row-per-bucket
    * projection path — but ONLY when the live writer is quiesced: a
    * batch appended DURING the fold is rescued (see below), so the
    * table stays append-mode until a fold runs with the writer paused.
    * Same staged-swap + auto-recovery discipline as [[compact]].
    * Returns (rowsBefore, rowsAfter — folded rows, excluding rescued
    * stray partials). */
  def compactRollup(spark: org.apache.spark.sql.SparkSession,
      path: String): (Long, Long) = {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.functions._
    val hp = new Path(path)
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    val backup = new Path(hp.getParent, hp.getName + "_prefold")
    if (!fs.exists(hp) && fs.exists(backup)) {
      require(fs.rename(backup, hp),
        s"recovery of interrupted rollup fold failed for $path")
    }
    // snapshot the EXACT file set the fold reads (the DataFrame's own
    // resolved file index, not a separate listing — a separate listing
    // opens a window where a file lands between list and read and gets
    // BOTH folded and rescued, i.e. double-counted): any file appended
    // by a live writer after this resolution must be RESCUED into the
    // published dir (partial rows are self-contained, so re-appending
    // them keeps append-mode semantics exact) — deleting the backup
    // wholesale would silently lose those batches
    val src = spark.read.parquet(path)
    val snapshot = src.inputFiles
      .map(f => new Path(f).getName).toSet
    val (srcSum, srcN, srcRows) = {
      val t = src.agg(
        sum(col("sum_v").cast("decimal(28,4)")).as("s"),
        sum(col("n")).as("c"), count(lit(1)).as("r")).head
      (t.getDecimal(0), t.getLong(1), t.getLong(2))
    }
    val nBuckets = src.select(col("metric"), col("bucket")).distinct().count()
    val staging = new Path(hp.getParent, hp.getName + "_folding")
    src.groupBy(col("metric"), col("bucket"))
      .agg(sum(col("sum_v")).cast("decimal(18,4)").as("sum_v"),
        sum(col("n")).cast("long").as("n"),
        min(col("min_v")).as("min_v"), max(col("max_v")).as("max_v"))
      .write.mode("overwrite").parquet(staging.toString)
    val st = spark.read.parquet(staging.toString)
    val check = st.agg(
      sum(col("sum_v").cast("decimal(28,4)")).as("s"),
      sum(col("n")).as("c"), count(lit(1)).as("r")).head
    require(check.getDecimal(0).compareTo(srcSum) == 0 &&
      check.getLong(1) == srcN && check.getLong(2) == nBuckets,
      "rollup fold must conserve decomposable totals")
    fs.delete(backup, true)
    require(fs.rename(hp, backup), s"could not stage away $path")
    // publish. A live writer can RECREATE the table dir between the two
    // renames (parquet append mkdirs a missing target); depending on
    // the filesystem the publish rename then FAILS outright or lands
    // staging INSIDE the recreated dir (HDFS rename-into-dir
    // semantics). Handle both: rescue recreated-dir partials into
    // staging (write-job file names are UUID-unique — no collision)
    // and retry, or unnest the staged files afterwards. The in-flight
    // partials are good data either way; nothing is dropped.
    // freeze-then-rescue: a recreated dir is first renamed ASIDE (one
    // atomic op — after it a live appender can only recreate hp fresh,
    // never land a file in the frozen copy), then its parquet files are
    // rescued from the frozen dir at leisure. The earlier shape — list
    // hp, rescue the listing, recursively delete hp — had a window
    // between the listing and the delete where a newly committed file
    // was silently destroyed; with the freeze there is no such window.
    // What remains in the frozen dir after rescue is writer scaffolding
    // only (_temporary, .crc, _SUCCESS) whose job either already
    // committed (file was rescued) or will recommit into the fresh hp.
    def freezeAndRescue(into: Path, tag: String): Unit = {
      val frozen = new Path(hp.getParent, hp.getName + tag)
      fs.delete(frozen, true) // stale leftover from a crashed fold
      if (fs.rename(hp, frozen)) {
        fs.listStatus(frozen).filter(_.isFile)
          .filter(_.getPath.getName.endsWith(".parquet"))
          .foreach { f =>
            require(fs.rename(f.getPath,
              new Path(into, f.getPath.getName)),
              s"could not rescue recreated-dir partial ${f.getPath}")
          }
        fs.delete(frozen, true)
      } // rename lost a race with another maintenance op: loop retries
    }
    var published = false
    var attempts = 0
    while (!published && attempts < 8) {
      attempts += 1
      if (fs.exists(hp)) freezeAndRescue(staging, s"_recreated$attempts")
      published = fs.rename(staging, hp)
      if (published) {
        val nested = new Path(hp, staging.getName)
        if (fs.exists(nested) && fs.getFileStatus(nested).isDirectory) {
          fs.listStatus(nested).filter(_.isFile)
            .filter(_.getPath.getName.endsWith(".parquet"))
            .foreach { f =>
              require(fs.rename(f.getPath, new Path(hp, f.getPath.getName)),
                s"could not unnest staged file ${f.getPath}")
            }
          fs.delete(nested, true)
        }
      }
    }
    if (!published) {
      // rollback — the dir may have been recreated yet again; freeze it
      // and fold its partials into the backup so the restore conserves
      // them (same no-delete-window discipline as the publish path)
      if (fs.exists(hp)) freezeAndRescue(backup, "_rollback")
      val restored = fs.rename(backup, hp)
      throw new IllegalStateException(
        s"could not publish folded rollup $path" +
          (if (restored) " (original restored)"
           else s" AND rollback failed — data is at $backup"))
    }
    // rescue partial files a live writer appended between the snapshot
    // and the swap: move them from the staged-away dir into the
    // published one before discarding the backup
    fs.listStatus(backup).filter(_.isFile)
      .filterNot(s => snapshot.contains(s.getPath.getName))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .foreach { stray =>
        require(fs.rename(stray.getPath,
          new Path(hp, stray.getPath.getName)),
          s"could not rescue in-flight partial ${stray.getPath}")
      }
    fs.delete(backup, true)
    (srcRows, nBuckets)
  }

  /** TABLE HEALTH — the read that decides when [[compact]] runs: file
    * count, bytes, mean file size and the small-file fraction (files
    * under the threshold) for a parquet dir. Pure filesystem metadata
    * (no data scan); at production this runs per date-partition from
    * the maintenance scheduler and a rising small-file fraction pages
    * the compactor before per-file open/footer cost dominates reads. */
  def tableHealth(spark: org.apache.spark.sql.SparkSession, path: String,
      smallFileBytes: Long = 16L * 1024 * 1024)
      : (Int, Long, Long, Double) = {
    import org.apache.hadoop.fs.Path
    val hp = new Path(path)
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    val files = fs.listStatus(hp).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val n = files.length
    val bytes = files.map(_.getLen).sum
    val meanBytes = if (n == 0) 0L else bytes / n
    val smallFrac =
      if (n == 0) 0.0
      else files.count(_.getLen < smallFileBytes).toDouble / n
    (n, bytes, meanBytes, smallFrac)
  }

  /** Morton/Z-VALUE of two numeric keys: each key min-max-normalizes to
    * 16 bits, then the bits interleave — points close in BOTH
    * dimensions get close z-values, so a z-sorted layout gives every
    * file a narrow min/max envelope on BOTH columns at once. (Min-max
    * scaling is the exact-arithmetic baseline; rank-normalizing via
    * range-partition boundaries is the production refinement for
    * heavily skewed keys.) */
  private def zValue(a: Column, b: Column, minA: Long, maxA: Long,
      minB: Long, maxB: Long): Column = {
    def norm(c: Column, lo: Long, hi: Long): Column =
      ((c - lit(lo)).cast("long") * lit(65535L) /
        lit(math.max(1L, hi - lo))).cast("long")
    val qa = norm(a, minA, maxA)
    val qb = norm(b, minB, maxB)
    (0 until 16).map { k =>
      (shiftright(qa, k).bitwiseAND(lit(1L)) * lit(1L << (2 * k))) +
        (shiftright(qb, k).bitwiseAND(lit(1L)) * lit(1L << (2 * k + 1)))
    }.reduce(_ + _)
  }

  /** Z-ORDER write — multi-dimensional data skipping: sort the table by
    * the interleaved z-value of TWO predicate columns before writing,
    * so per-file min/max envelopes stay narrow on BOTH dimensions and a
    * 2-D predicate (`partkey BETWEEN … AND suppkey BETWEEN …`) prunes
    * files/row-groups that a single-column sort can only prune on its
    * leading key. One range shuffle + local sort — the same cost as any
    * clustered write; file count = `nFiles`. LayoutSpec measures the
    * envelope narrowing against a single-column clustered write. */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
      path: String, nFiles: Int = 8): Unit = {
    val mm = df.agg(min(col(colA)), max(col(colA)),
      min(col(colB)), max(col(colB))).head
    val z = zValue(col(colA), col(colB), mm.getLong(0), mm.getLong(1),
      mm.getLong(2), mm.getLong(3))
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
