package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog._
import graft.io.{WhisperImport, WhisperArchiveInfo}

class WhisperSpec extends AnyFunSuite {

  private val arch1 = Archive(60, 100)    // 60s × 100 slots
  private val arch2 = Archive(3600, 48)   // 1h × 48 slots
  private val base = 1706140800L          // 2024-01-25 00:00:00 UTC

  private def sampleFile(): Array[Byte] = {
    val pts1 = (0 until 50).map(i => (base + i * 60L) -> (i * 1.5)).toMap
    val pts2 = (0 until 10).map(i => (base + i * 3600L) -> (i * 10.0)).toMap
    WhisperImport.encode(AggMethod.Average, 0.5f,
      Seq(arch1 -> pts1, arch2 -> pts2))
  }

  test("header + points roundtrip, empty slots skipped") {
    val bytes = sampleFile()
    val h = WhisperImport.parseHeader(bytes)
    assert(h.agg == AggMethod.Average && h.xFilesFactor == 0.5f)
    assert(h.maxRetention == arch2.retentionSeconds)
    assert(h.archives == Seq(
      WhisperArchiveInfo(16 + 24, 60, 100),
      WhisperArchiveInfo(16 + 24 + 100 * 12, 3600, 48)))
    val pts = WhisperImport.parsePoints(bytes, h).toSeq
    assert(pts.count(_._1 == 0) == 50 && pts.count(_._1 == 1) == 10)
    val a0 = pts.filter(_._1 == 0).map(p => p._2 -> p._3).toMap
    assert(a0(base) == 0.0 && a0(base + 49 * 60) == 49 * 1.5)
  }

  test("malformed whisper rejected") {
    intercept[IllegalArgumentException](
      WhisperImport.parseHeader(Array[Byte](1, 2, 3)))
    val bad = sampleFile(); bad(3) = 99 // aggregationType 99
    intercept[IllegalArgumentException](WhisperImport.parseHeader(bad))
  }

  test("export roundtrip: rollup -> .wsp files -> re-import matches") {
    val spark = TestSpark.spark
    val outDir = Files.createTempDirectory("wsp_out").toFile
    outDir.deleteOnExit()
    // hourly rollup of two event types as the export source
    val rollup = graft.io.Tables.events(spark, TestSpark.sf)
      .where(col("event_type").isin("click", "error"))
      .groupBy(col("event_type").as("metric"),
        date_trunc("hour", col("ts")).as("ts"))
      .agg(round(avg("value"), 4).as("value"))
    WhisperImport.export(rollup, outDir.getAbsolutePath,
      Archive(3600, 100000), AggMethod.Average)
    val back = WhisperImport.read(spark, outDir.getAbsolutePath)
      .select(col("metric"), col("ts"), col("value"))
      .orderBy("metric", "ts").collect()
    val src = rollup.orderBy("metric", "ts").collect()
    assert(back.length == src.length && back.length > 0)
    back.zip(src).foreach { case (b, s) =>
      assert(b.getString(0) == s.getString(0) &&
        b.getTimestamp(1) == s.getTimestamp(1) &&
        b.getDouble(2) == s.getDouble(2))
    }
  }

  test("policy export: every archive populated, roundtrips through read") {
    val spark = TestSpark.spark
    val outDir = Files.createTempDirectory("wsp_policy").toFile
    outDir.deleteOnExit()
    val policy = RetentionPolicy("exp", ".*".r,
      Seq(Archive(3600, 100000), Archive(6 * 3600, 100000)),
      AggMethod.Average, 0.5)
    val pts = graft.io.Tables.events(spark, TestSpark.sf)
      .where(col("event_type").isin("click", "view"))
      .select(col("event_type").as("metric"), col("ts"), col("value"))
    WhisperImport.exportPolicy(pts, outDir.getAbsolutePath, policy)
    val back = WhisperImport.read(spark, outDir.getAbsolutePath)
    // both archives present at their declared steps, for both metrics
    val steps = back.select("metric", "archive", "step_s").distinct()
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(steps == Set(("click", 0, 3600L), ("click", 1, 21600L),
      ("view", 0, 3600L), ("view", 1, 21600L)))
    // the header carries the full policy (agg, xff, archive geometry)
    val bytes = Files.readAllBytes(
      new java.io.File(outDir, "click.wsp").toPath)
    val h = WhisperImport.parseHeader(bytes)
    assert(h.agg == AggMethod.Average && h.xFilesFactor == 0.5f)
    assert(h.archives.map(a => (a.secondsPerPoint, a.points)) ==
      Seq((3600L, 100000L), (21600L, 100000L)))
    // base-point invariant: slot 0 of archive 0 holds the EARLIEST point
    // (whisper fetch anchors on it; an empty slot 0 reads as no data)
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.position(h.archives.head.offset)
    val baseTs = Integer.toUnsignedLong(bb.getInt)
    val clickTs = back.where(col("metric") === "click" && col("archive") === 0)
      .agg(org.apache.spark.sql.functions.min(col("ts").cast("long")))
      .head.getLong(0)
    assert(baseTs == clickTs, s"slot 0 must be the base point, got $baseTs")
    // archive 0 values equal a direct hourly Det rollup of the raw points
    val expect = pts.where(col("metric") === "click")
      .groupBy(((col("ts").cast("long") / 3600).cast("long") * 3600)
        .as("ts_s"))
      .agg(graft.util.Det.avg4(col("value")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = back.where(col("metric") === "click" && col("archive") === 0)
      .select(col("ts").cast("long"), col("value"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == expect)
    // archive 1 PROPAGATES archive 0 (avg of stored values) and applies
    // the xff gate: a 6h bucket needs >= 0.5 * 6 = 3 hourly points
    val a0 = got.toSeq.groupBy { case (ts, _) => ts / 21600 * 21600 }
    val expect1 = a0.collect { case (b, vs) if vs.size * 2 >= 6 =>
      val scaled = vs.map { case (_, v) => math.round(v * 10000.0) }.sum
      b -> (math.floorDiv(2 * scaled + vs.size, 2L * vs.size) / 10000.0)
    }.toMap
    val got1 = back.where(col("metric") === "click" && col("archive") === 1)
      .select(col("ts").cast("long"), col("value"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got1.keySet == expect1.keySet,
      s"xff gate mismatch: got=${got1.keySet.size} expect=${expect1.keySet.size}")
    got1.foreach { case (b, v) =>
      assert(math.abs(v - expect1(b)) < 1e-9, s"bucket $b: $v vs ${expect1(b)}")
    }
  }

  test("groupConsecutive streams one group at a time (no partition buffer)") {
    var consumed = 0
    val src = Iterator.tabulate(100) { i => consumed += 1; (i / 10, i) }
    val g = WhisperImport.groupConsecutive(src)
    val (k0, v0) = g.next()
    assert(k0 == 0 && v0 == (0 until 10))
    // one group + single-element lookahead — NOT the whole iterator
    assert(consumed <= 11,
      s"groupConsecutive materialized the partition: consumed=$consumed")
    val rest = g.toSeq
    assert(rest.map(_._1) == (1 until 10) &&
      rest.forall(_._2.length == 10) && consumed == 100)
    assert(WhisperImport.groupConsecutive(Iterator.empty[(Int, Int)]).isEmpty)
  }

  test("property: groupConsecutive reassembles any key-sorted sequence") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.forAll
    val runsGen = Gen.listOf(for {
      k <- Gen.choose(0, 8)
      n <- Gen.choose(1, 5)
      vs <- Gen.listOfN(n, Gen.choose(-1000, 1000))
    } yield (k, vs))
    val prop = forAll(runsGen) { runs =>
      // adjacent duplicate keys merge — compare against that normal form
      val flat = runs.flatMap { case (k, vs) => vs.map(k -> _) }
      val grouped = WhisperImport.groupConsecutive(flat.iterator).toList
      val expected = flat.foldLeft(List.empty[(Int, List[Int])]) {
        case ((k0, vs0) :: rest, (k, v)) if k0 == k =>
          (k0, vs0 :+ v) :: rest
        case (acc, (k, v)) => (k, List(v)) :: acc
      }.reverse.map { case (k, vs) => (k, vs: Seq[Int]) }
      grouped == expected
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200),
      prop)
    assert(res.passed, s"groupConsecutive property failed: ${res.status}")
  }

  test("nested layout: dotted metrics nest on disk, leaf names stay distinct") {
    val spark = TestSpark.spark
    val outDir = Files.createTempDirectory("wsp_nested").toFile
    outDir.deleteOnExit()
    val pts = {
      import spark.implicits._
      // two metrics sharing the LEAF name p95 — the collision case a
      // basename-derived metric would merge
      Seq(("stats.web.p95", base, 1.5), ("stats.web.p95", base + 3600, 2.5),
        ("stats.db.p95", base, 7.5))
        .toDF("metric", "ts_s", "value")
        .select(col("metric"), timestamp_seconds(col("ts_s")).as("ts"),
          col("value"))
    }
    WhisperImport.export(pts, outDir.getAbsolutePath,
      Archive(3600, 1000), AggMethod.Average)
    // whisper directory-to-metric convention on disk
    assert(new java.io.File(outDir, "stats/web/p95.wsp").isFile)
    assert(new java.io.File(outDir, "stats/db/p95.wsp").isFile)
    val back = WhisperImport.read(spark, outDir.getAbsolutePath)
      .select(col("metric"), col("ts").cast("long"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(back == Set(("stats.web.p95", base, 1.5),
      ("stats.web.p95", base + 3600, 2.5), ("stats.db.p95", base, 7.5)))
    // a SINGLE-FILE path keeps the leaf-name metric (pre-nesting API)
    val one = WhisperImport.read(spark,
      new java.io.File(outDir, "stats/db/p95.wsp").getAbsolutePath)
      .select("metric").distinct().collect().map(_.getString(0)).toSeq
    assert(one == Seq("p95"), s"single-file metric: $one")
  }

  test("spark read: .wsp directory to points, and into the router") {
    val spark = TestSpark.spark
    val dir = Files.createTempDirectory("wsp").toFile
    dir.deleteOnExit()
    Files.write(new java.io.File(dir, "cpu.load.wsp").toPath, sampleFile())
    Files.write(new java.io.File(dir, "mem.used.wsp").toPath, sampleFile())
    val df = WhisperImport.read(spark, dir.getAbsolutePath)
    val rows = df.collect()
    assert(rows.length == 120) // 2 files × (50 + 10) points
    assert(df.select("metric").distinct().collect().map(_.getString(0))
      .toSet == Set("cpu.load", "mem.used"))
    // imported header drives the catalog: policy routes a 90-min window
    // to the 60s archive, a 40h window clamps to the 1h archive
    val h = WhisperImport.parseHeader(sampleFile())
    val p = WhisperImport.toPolicy("cpu.load", h)
    assert(p.matches("cpu.load") && !p.matches("cpu.loadX"))
    assert(RollupRouter.selectArchive(p, 5400).secondsPerPoint == 60)
    assert(RollupRouter.selectArchive(p, 40 * 3600).secondsPerPoint == 3600)
    // and the points feed the routed fetch (archive 0 = high-res ring)
    val fetched = RollupRouter.fetch(
      df.where(col("archive") === 0), p, col("metric") === "cpu.load", 5400)
      .collect()
    assert(fetched.map(_.getLong(2)).sum == 50)
  }
}
