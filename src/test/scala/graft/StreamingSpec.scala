package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{AdmittedDoc, AttribEvent, FunnelEvent, Ingest, MixDoc, Point, RawDoc, ResidualObs, RollupBucket, Scd2Event, SourceDoc, StreamDoc}

/** Streaming semantics on MemoryStream: the Kenshin write path (SURVEY
  * §2.3). Each test runs a real StreamingQuery against the in-memory
  * source/sink and asserts on observable results. */
class StreamingSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
      mode: OutputMode = OutputMode.Update()) = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    q
  }

  test("s_ingest_parse: line protocol parses, malformed lines dropped") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val in = MemoryStream[String]
    in.addData("cpu.load 0.75 1700000000", "mem.used 1234 1700000060",
      "garbage", "cpu.load NaNope 1700000120", "a b c d")
    val q = runToMemory(Ingest.parseLines(in.toDF()), "parsed",
      OutputMode.Append())
    q.processAllAvailable(); q.stop()
    val rows = sp.sql("SELECT * FROM parsed ORDER BY metric").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getString(0)).sameElements(Array("cpu.load", "mem.used")))
    assert(rows(0).getDouble(2) == 0.75)
  }

  test("s_quarantine: malformed lines land in the dead-letter fork, tagged") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val in = MemoryStream[String]
    val inputs = Seq("cpu.load 0.75 1700000000", "mem.used 1234 1700000060",
      "garbage", "cpu.load NaNope 1700000120", "cpu.load 0.5 not_epoch",
      "a b c d", " 0.5 1700000000",
      // carbon tokenizes with strip().split(): surplus whitespace parses
      "disk.io 2.5 1700000060 ", "net.rx  9.5\t1700000060",
      "cpu.load 1.0 9223372036854775807") // LONG-parseable, absurd epoch
    in.addData(inputs)
    val tagged = Ingest.parseLinesQuarantine(in.toDF())
    val qOk = runToMemory(tagged.where(col("reason") === "ok")
      .select("metric", "ts", "value"), "quar_ok", OutputMode.Append())
    val qBad = runToMemory(tagged.where(col("reason") =!= "ok")
      .select("raw", "reason"), "quar_bad", OutputMode.Append())
    qOk.processAllAvailable(); qBad.processAllAvailable()
    qOk.stop(); qBad.stop()
    val ok = sp.table("quar_ok").collect()
    assert(ok.length == 4 && ok.map(_.getString(0)).toSet ==
      Set("cpu.load", "mem.used", "disk.io", "net.rx"))
    val bad = sp.table("quar_bad").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(bad == Map(
      "garbage" -> "bad_arity",
      "cpu.load NaNope 1700000120" -> "bad_value",
      "cpu.load 0.5 not_epoch" -> "bad_epoch",
      "a b c d" -> "bad_arity",
      // stripped to two tokens — arity, not an empty-metric artifact
      " 0.5 1700000000" -> "bad_arity",
      // an in-LONG-range but absurd epoch must QUARANTINE, not throw
      // (timestamp_seconds overflows Long micros with multiplyExact)
      "cpu.load 1.0 9223372036854775807" -> "bad_epoch"))
    // conservation: ok-fork rows == the tolerant parseLines rows (content,
    // not just count)
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getTimestamp(1), r.getDouble(2))
    val direct = Ingest.parseLines(inputs.toDF("value")).collect().map(key)
    assert(direct.toSet == ok.map(key).toSet && direct.length == ok.length)
  }

  test("s_tumbling_agg + s_watermark_late: rollup updates, late row dropped") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val in = MemoryStream[Point]
    val q = runToMemory(Ingest.tumblingRollup(in.toDF(), "1 minute",
      "10 minutes"), "rollup")
    in.addData(Point("cpu", ts("2024-01-01 10:00:10"), 1.0),
      Point("cpu", ts("2024-01-01 10:00:40"), 3.0))
    q.processAllAvailable()
    val v1 = sp.sql("SELECT n, avg_v FROM rollup WHERE metric='cpu'").collect()
    assert(v1.head.getLong(0) == 2 && v1.head.getDouble(1) == 2.0)
    // advance watermark far beyond 10:00 + 10m
    in.addData(Point("cpu", ts("2024-01-01 11:00:00"), 5.0))
    q.processAllAvailable()
    // this point's window (10:00) is now < watermark → must be dropped
    in.addData(Point("cpu", ts("2024-01-01 10:00:50"), 100.0))
    q.processAllAvailable(); q.stop()
    val v2 = sp.sql(
      "SELECT n FROM rollup WHERE metric='cpu' AND bucket=timestamp'2024-01-01 10:00:00' ORDER BY n DESC").collect()
    assert(v2.head.getLong(0) == 2, "late row must not update the old bucket")
  }

  test("s_sliding_agg: point lands in length/slide windows") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val in = MemoryStream[Point]
    val q = runToMemory(Ingest.slidingRollup(in.toDF(), "10 minutes",
      "5 minutes"), "sliding")
    in.addData(Point("cpu", ts("2024-01-01 10:07:00"), 4.0))
    q.processAllAvailable(); q.stop()
    val rows = sp.sql("SELECT w_start FROM sliding").collect()
    assert(rows.length == 2) // 10:00 and 10:05 windows
  }

  test("s_session_window: gap > 30s starts a new session") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val in = MemoryStream[Point]
    val q = runToMemory(Ingest.sessionAgg(in.toDF(), "30 seconds"), "sessions",
      OutputMode.Complete())
    in.addData(Point("cpu", ts("2024-01-01 10:00:00"), 1.0),
      Point("cpu", ts("2024-01-01 10:00:20"), 1.0), // same session
      Point("cpu", ts("2024-01-01 10:05:00"), 1.0)) // new session
    q.processAllAvailable(); q.stop()
    val rows = sp.sql("SELECT n FROM sessions ORDER BY s_start").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getLong(0)).sameElements(Array(2L, 1L)))
  }

  test("s_dedup_ids: replayed (metric, ts) dropped within watermark") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val in = MemoryStream[Point]
    val q = runToMemory(Ingest.dedupIngest(in.toDF()), "deduped",
      OutputMode.Append())
    in.addData(Point("cpu", ts("2024-01-01 10:00:00"), 1.0),
      Point("cpu", ts("2024-01-01 10:00:00"), 1.0))
    q.processAllAvailable()
    in.addData(Point("cpu", ts("2024-01-01 10:00:00"), 99.0)) // replay again
    q.processAllAvailable(); q.stop()
    assert(sp.sql("SELECT * FROM deduped").count() == 1)
  }

  test("s_corpus_dedup: later-batch duplicate text drops before split assign") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val in = MemoryStream[(Long, String, Timestamp)]
    val q = runToMemory(
      Ingest.dedupCorpusStream(in.toDF().toDF("doc_id", "text", "ts")),
      "corpus_dedup", OutputMode.Append())
    in.addData((1L, "the quick brown fox", ts("2024-01-01 10:00:00")),
      (2L, "lorem ipsum dolor", ts("2024-01-01 10:00:01")))
    q.processAllAvailable()
    // a later micro-batch re-ingests doc 1's TEXT under a fresh id —
    // the content key drops it; a genuinely new text passes
    in.addData((3L, "the quick brown fox", ts("2024-01-01 10:00:30")),
      (4L, "something new entirely", ts("2024-01-01 10:00:31")))
    q.processAllAvailable(); q.stop()
    val rows = sp.sql("SELECT doc_id, content_key, bucket, split FROM corpus_dedup")
      .collect()
    assert(rows.map(_.getLong(0)).toSet == Set(1L, 2L, 4L),
      s"expected dup doc 3 dropped: ${rows.mkString(",")}")
    // split assignment must agree with the BATCH content-hash formula
    // (trainValSplit): same md5 prefix bucketing, same thresholds
    val expect = sp.createDataset(Seq("the quick brown fox",
        "lorem ipsum dolor", "something new entirely")).toDF("text")
      .select(col("text"),
        (conv(substring(md5(col("text")), 1, 8), 16, 10).cast("bigint") % 10)
          .as("bucket"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val gotBuckets = sp.sql(
      "SELECT content_key, bucket, split FROM corpus_dedup").collect()
    rows.foreach { r =>
      val b = r.getLong(2)
      val s = r.getString(3)
      assert(s == (if (b < 8) "train" else if (b == 8) "val" else "test"),
        s"split/bucket mismatch: $r")
    }
    assert(rows.map(_.getLong(2)).toSet.subsetOf(expect.values.toSet),
      s"streamed buckets must come from the batch formula: ${gotBuckets.mkString}")
  }

  test("s_gopher_gate: stream admission equals the batch rule gate") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    // real corpus docs so the rules actually split the set
    val docs = graft.io.Tables.documents(sp, TestSpark.sf)
      .select(col("doc_id"), col("lang"), col("text"))
      .orderBy("doc_id").limit(40).collect()
      .map(r => RawDoc(r.getLong(0), r.getString(1), r.getString(2)))
    val in = MemoryStream[RawDoc]
    val q = runToMemory(Ingest.gopherGate(in.toDF()), "gopher_gate",
      OutputMode.Append())
    in.addData(docs.take(20).toIndexedSeq: _*)
    q.processAllAvailable()
    in.addData(docs.drop(20).toIndexedSeq: _*)
    q.processAllAvailable(); q.stop()
    val got = sp.sql("SELECT doc_id FROM gopher_gate").collect()
      .map(_.getLong(0)).toSet
    val batch = graft.llm.TextOps.gopherRules(sp, TestSpark.sf)
      .where(col("doc_id").isin(docs.map(_.doc_id).toIndexedSeq: _*))
      .select(col("doc_id"), col("keep")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = batch.filter(_._2 == 1L).keySet
    assert(got == expect,
      s"stream gate admitted $got, batch gate keeps $expect")
    // the gate must actually discriminate on this sample, or the
    // equality above proves nothing
    assert(expect.nonEmpty && expect.size < docs.length,
      s"degenerate sample: ${expect.size} of ${docs.length} kept")
  }

  test("s_cardinality: live HLL distinct tracks exact within sketch error") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val in = MemoryStream[(String, String)]
    val q = runToMemory(
      Ingest.cardinalityMonitor(
        in.toDF().toDF("source", "content_key")),
      "cardinality", OutputMode.Complete())
    // batch 1: web has 100 distinct keys + 100 repeats of one key
    in.addData((0 until 100).map(i => ("web", f"k$i%03d")) ++
      Seq.fill(100)(("web", "k000")): _*)
    q.processAllAvailable()
    val b1 = sp.table("cardinality").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(b1("web")._1 == 200L)
    // default HLL++ rsd is 5%; allow 3 sigma
    assert(math.abs(b1("web")._2 - 100L) <= 15,
      s"distinct estimate off: ${b1("web")}")
    // batch 2: 50 NEW keys for web (state accumulates), a new source
    in.addData((100 until 150).map(i => ("web", f"k$i%03d")) ++
      (0 until 20).map(i => ("api", f"a$i%02d")): _*)
    q.processAllAvailable(); q.stop()
    val b2 = sp.table("cardinality").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(b2("web")._1 == 250L && math.abs(b2("web")._2 - 150L) <= 20,
      s"web after batch2: ${b2("web")}")
    assert(b2("api")._1 == 20L && math.abs(b2("api")._2 - 20L) <= 3,
      s"api: ${b2("api")}")
  }

  test("s_heavy_hitters: live legend exact under capacity, state persists") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val in = MemoryStream[graft.streaming.LangToken]
    val q = runToMemory(
      Ingest.heavyHittersStream(in.toDS(), capacity = 16, k = 3).toDF(),
      "hot_tokens", OutputMode.Update())
    def toks(ts: (String, Int)*) = ts.flatMap { case (t, n) =>
      Seq.fill(n)(graft.streaming.LangToken("en", t)) }
    in.addData(toks("alpha" -> 5, "beta" -> 3, "gamma" -> 1): _*)
    q.processAllAvailable()
    val b1 = sp.sql(
      "SELECT rank, token, est FROM hot_tokens ORDER BY rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(b1.toSeq == Seq((1L, "alpha", 5L), (2L, "beta", 3L),
      (3L, "gamma", 1L)), s"batch1 legend: ${b1.mkString(",")}")
    // batch 2: counts accumulate on top of batch-1 state; gamma
    // overtakes beta, delta enters below the k=3 cut
    in.addData(toks("gamma" -> 6, "beta" -> 1, "delta" -> 2): _*)
    q.processAllAvailable(); q.stop()
    // Update-mode memory sink appends each emission; the latest legend
    // is the last 3 rows written
    val all = sp.sql("SELECT rank, token, est FROM hot_tokens").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val b2 = all.drop(3)
    assert(b2.toSeq == Seq((1L, "gamma", 7L), (2L, "alpha", 5L),
      (3L, "beta", 4L)), s"batch2 legend: ${b2.mkString(",")}")
  }

  test("s_cm_sketch: live grid byte-equals the batch aggregate, probes bound") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val in = MemoryStream[graft.streaming.LangToken]
    val q = runToMemory(
      Ingest.cmSketchStream(in.toDS(), depth = 4, width = 128).toDF(),
      "cm_live", OutputMode.Update())
    def toks(ts: (String, Int)*) = ts.flatMap { case (t, n) =>
      Seq.fill(n)(graft.streaming.LangToken("en", t)) }
    val b1 = toks("alpha" -> 5, "beta" -> 3, "gamma" -> 1)
    val b2 = toks("gamma" -> 6, "beta" -> 1, "delta" -> 2)
    in.addData(b1: _*)
    q.processAllAvailable()
    in.addData(b2: _*)
    q.processAllAvailable(); q.stop()
    // Update-mode sink appends one row per (batch, lang); the live grid
    // is the LAST row — and must byte-equal the BATCH aggregate over
    // the union (CMS folds are commutative counter additions)
    val live = sp.table("cm_live").collect().last.getAs[Array[Byte]]("sketch")
    val batch = sp.createDataset(b1 ++ b2).toDF()
      .agg(graft.functions.CmSketch(col("token"), 4, 128).as("sk"))
      .head.getAs[Array[Byte]](0)
    assert(live.sameElements(batch),
      "live sketch must byte-equal the batch aggregate over the same rows")
    // the probe surface holds its one-sided bound on the live grid
    Seq("alpha" -> 5L, "beta" -> 4L, "gamma" -> 7L, "delta" -> 2L).foreach {
      case (t, exact) =>
        assert(graft.functions.CountMin.query(live, t) >= exact)
    }
  }

  test("s_contamination_gate: stream suspects equal the batch pre-gate") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val sf = "/root/testdata/sf0.001"
    val grams = graft.io.Tables.documents(sp, sf)
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .where(size(col("tk")) >= 5)
      .select(col("doc_id"),
        explode(expr("transform(sequence(0, size(tk) - 5), " +
          "i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2], tk[i+3], tk[i+4]))"))
          .as("g5"))
    val bloom = grams.where(col("doc_id") < 20).select(col("g5")).distinct()
      .agg(graft.functions.BloomAgg(xxhash64(col("g5")), 20000L, 200000L)
        .as("bf")).head.getAs[Array[Byte]]("bf")
    val batchSuspects = grams.where(col("doc_id") >= 20)
      .where(graft.functions.MightContain(lit(bloom), xxhash64(col("g5"))))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(batchSuspects.nonEmpty, "degenerate: no contaminated grams")
    val docs = graft.io.Tables.documents(sp, sf)
      .where(col("doc_id") >= 20)
      .select(col("doc_id"), col("lang"), col("text"))
      .as[graft.streaming.RawDoc].collect()
    val in = MemoryStream[graft.streaming.RawDoc]
    val q = runToMemory(Ingest.contaminationGate(in.toDS(), bloom), "cgate",
      OutputMode.Append())
    // two arrival waves — the gate is stateless, so split choice is free
    val (d1, d2) = docs.splitAt(docs.length / 2)
    in.addData(d1.toSeq); q.processAllAvailable()
    in.addData(d2.toSeq); q.processAllAvailable(); q.stop()
    val streamed = sp.table("cgate").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed == batchSuspects,
      s"stream gate diverged: ${streamed.size} vs ${batchSuspects.size}")
  }

  test("s_embed_drift: silent calibration, exact state, per-label shards") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    import graft.streaming.LabeledVec
    def q(v: Float): Long = math.floor(v.toDouble * 1000000.0).toLong
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val ab = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val aa = a.map(x => x.toDouble * x.toDouble).sum
      val bb = b.map(x => x.toDouble * x.toDouble).sum
      ab / (math.sqrt(aa) * math.sqrt(bb))
    }
    val in = MemoryStream[LabeledVec]
    val qr = runToMemory(Ingest.embedDriftStream(in.toDS()).toDF(), "edrift",
      OutputMode.Update())
    // batch 1 calibrates both labels — must be silent
    in.addData(LabeledVec(0, Array(0.2f, 0.1f)),
      LabeledVec(0, Array(0.4f, 0.2f)), LabeledVec(1, Array(0.3f, 0.0f)))
    qr.processAllAvailable()
    assert(sp.table("edrift").count() == 0, "calibration batch must be silent")
    // batch 2: label 0 drifts nowhere (same direction); label 1 rotates 90°
    in.addData(LabeledVec(0, Array(0.2f, 0.1f)),
      LabeledVec(1, Array(0.0f, 0.25f)))
    qr.processAllAvailable()
    val b2 = sp.sql("SELECT label, n_ref, n_cur, cosine FROM edrift " +
      "ORDER BY label").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val ref0 = Array(q(0.2f) + q(0.4f), q(0.1f) + q(0.2f))
    val exp0 = cos(ref0, Array(q(0.2f), q(0.1f)))
    assert(b2.toSeq == Seq((0, 2L, 1L, exp0), (1, 1L, 1L, 0.0)),
      s"batch-2 drift rows wrong: ${b2.mkString(",")}")
    // batch 3: label 1's cohort accumulates on the SAME frozen reference
    in.addData(LabeledVec(1, Array(0.25f, 0.0f)))
    qr.processAllAvailable(); qr.stop()
    val last = sp.sql("SELECT n_cur, cosine FROM edrift WHERE label = 1 " +
      "ORDER BY n_cur").collect().map(r => (r.getLong(0), r.getDouble(1))).last
    val exp1 = cos(Array(q(0.3f), 0L), Array(q(0.25f), q(0.0f) + q(0.25f)))
    assert(last == ((2L, exp1)), s"accumulated drift wrong: $last vs $exp1")
  }

  test("s_cusum_alert: exact-integer changepoint stat across batches") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val in = MemoryStream[Point]
    val q = runToMemory(
      Ingest.cusumAlertStream(in.toDS(), warmup = 4, thresholdUnits = 10L)
        .toDF(), "cusum_alert", OutputMode.Append())
    def pt(i: Int, v: Double) = Point("m", ts(f"2024-01-01 10:00:${i}%02d"), v)
    // batch 1: 4 warmup points at 10.0 (silent) + 2 shifted points
    in.addData((0 to 3).map(pt(_, 10.0)) ++ Seq(pt(4, 13.0), pt(5, 13.0)): _*)
    q.processAllAvailable()
    val mid = sp.sql("SELECT stat, fired FROM cusum_alert ORDER BY ts")
      .collect().map(r => (r.getDouble(0), r.getBoolean(1)))
    assert(mid.toSeq == Seq((3.0, false), (6.0, false)),
      s"warmup leak or wrong drift: ${mid.mkString(",")}")
    // batch 2: state persists — stat keeps climbing 3 units per point,
    // crosses the 10-unit threshold at the 4th post-warmup point
    in.addData(pt(6, 13.0), pt(7, 13.0), pt(8, 13.0))
    q.processAllAvailable(); q.stop()
    val rows = sp.sql("SELECT stat, fired FROM cusum_alert ORDER BY ts")
      .collect().map(r => (r.getDouble(0), r.getBoolean(1)))
    assert(rows.toSeq == Seq((3.0, false), (6.0, false), (9.0, false),
      (12.0, true), (15.0, true)), s"cusum path: ${rows.mkString(",")}")
  }

  test("s_domain_mix: live cube rolls up field-equal to the batch scorecard") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val prep = graft.llm.TextOps.domainMixPrep(
        graft.io.Tables.documents(sp, TestSpark.sf))
      .orderBy("doc_id").limit(40).localCheckpoint()
    val docs = prep.select("doc_id", "source", "lang", "ntok").collect()
      .map(r => MixDoc(r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    val in = MemoryStream[MixDoc]
    val q = runToMemory(Ingest.domainMixStream(in.toDF()), "domain_mix_cube",
      OutputMode.Complete())
    in.addData(docs.take(20).toIndexedSeq: _*)
    q.processAllAvailable()
    // mid-stream: the cube is the partial mix of exactly batch 1
    val mid = sp.table("domain_mix_cube").agg(sum(col("nl"))).collect()
    assert(mid.head.getLong(0) == 20L, s"partial cube off: ${mid.mkString}")
    in.addData(docs.drop(20).toIndexedSeq: _*)
    q.processAllAvailable(); q.stop()
    val cols = Seq("source", "n_docs", "ws_tokens", "doc_share", "tok_share",
      "top_lang", "top_lang_docs")
    val got = Ingest.mixScorecard(sp.table("domain_mix_cube"))
      .select(cols.map(col): _*).collect().toSet
    val expect = graft.llm.TextOps.domainMixOf(prep)
      .select(cols.map(col): _*).collect().toSet
    assert(got == expect, s"live scorecard $got != batch $expect")
    assert(expect.size > 1, s"degenerate sample: one source only")
  }

  test("s_budget_admit: per-lang token budget fills across micro-batches") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val in = MemoryStream[StreamDoc]
    val q = runToMemory(Ingest.budgetAdmit(in.toDS(), budget = 10L).toDF(),
      "budget_admit", OutputMode.Append())
    // batch 1: en fills 4+5=9 of 10; doc 3 (3 tok) would overflow -> drop;
    // de admits its first doc
    in.addData(StreamDoc(1L, "en", 4L), StreamDoc(2L, "en", 5L),
      StreamDoc(3L, "en", 3L), StreamDoc(10L, "de", 9L))
    q.processAllAvailable()
    // batch 2: state persists — en has 1 token left: doc 4 (1 tok) fits
    // exactly, doc 5 drops; de is at 9: doc 11 (2 tok) drops
    in.addData(StreamDoc(4L, "en", 1L), StreamDoc(5L, "en", 2L),
      StreamDoc(11L, "de", 2L))
    q.processAllAvailable(); q.stop()
    val rows = sp.sql(
      "SELECT doc_id, lang, n_tok, cum FROM budget_admit ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(rows.toSeq == Seq((1L, "en", 4L), (2L, "en", 9L),
      (4L, "en", 10L), (10L, "de", 9L)), rows.mkString(","))
  }

  test("s_bpe_budget_admit: map-side subword billing drives the gate") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    // offline-trained model (train-once registry), broadcast as literals
    val model = graft.llm.BpeOps.model(sp, TestSpark.sf)
    // the stream bills in subwords computed from RAW TEXT — take real
    // corpus docs so the counts exercise the learned merges, and get the
    // expected per-doc counts from the batch join path
    val docs = graft.io.Tables.documents(sp, TestSpark.sf)
      .select(col("doc_id"), col("lang"), col("text"))
      .orderBy("doc_id").limit(4).collect()
      .map(r => RawDoc(r.getLong(0), r.getString(1), r.getString(2)))
    val counts = graft.llm.BpeOps.bpeEncode(sp, TestSpark.sf)
      .select(col("doc_id"), col("n_tok")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // budget admits the first doc per lang (corpus docs are hundreds of
    // subwords) and rejects a same-lang successor
    val budget = docs.map(d => counts(d.doc_id)).max + 10L
    val in = MemoryStream[RawDoc]
    val q = runToMemory(
      Ingest.bpeBudgetAdmit(in.toDS(), model, budget).toDF(),
      "bpe_admit", OutputMode.Append())
    in.addData(docs.toIndexedSeq: _*)
    q.processAllAvailable(); q.stop()
    val rows = sp.sql(
      "SELECT doc_id, lang, n_tok, cum FROM bpe_admit ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // every admitted doc is billed EXACTLY its batch subword count
    rows.foreach { case (id, _, n) =>
      assert(n == counts(id), s"doc $id billed $n != batch ${counts(id)}")
    }
    // and the admission set is the per-lang arrival-order greedy
    val expect = docs.groupBy(_.lang).values.flatMap { ds =>
      var cum = 0L
      ds.sortBy(_.doc_id).flatMap { d =>
        val n = counts(d.doc_id)
        if (cum + n <= budget) { cum += n; Some(d.doc_id) } else None
      }
    }.toSet
    assert(rows.map(_._1).toSet == expect,
      s"admitted ${rows.map(_._1).toSet} != greedy $expect")
  }

  test("s_bpe_admit_prod: rank-replay billing == replace-fold billing") {
    // the production-vocab admission path (broadcast model + JVM
    // tokenizer) must admit and bill IDENTICALLY to the literal
    // replace-fold operator on the same docs/model/budget — the
    // streaming face of the BpeSpec mechanism-equality proof
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val model = graft.llm.BpeOps.model(sp, TestSpark.sf)
    val docs = graft.io.Tables.documents(sp, TestSpark.sf)
      .select(col("doc_id"), col("lang"), col("text"))
      .orderBy("doc_id").limit(6).collect()
      .map(r => RawDoc(r.getLong(0), r.getString(1), r.getString(2)))
    val budget = 600L
    def run(tag: String,
        f: (org.apache.spark.sql.Dataset[RawDoc], Seq[(String, String)],
          Long) => org.apache.spark.sql.Dataset[AdmittedDoc]) = {
      val in = MemoryStream[RawDoc]
      val q = runToMemory(f(in.toDS(), model, budget).toDF(), tag,
        OutputMode.Append())
      in.addData(docs.toIndexedSeq: _*)
      q.processAllAvailable(); q.stop()
      sp.sql(s"SELECT doc_id, lang, n_tok, cum FROM $tag ORDER BY doc_id")
        .collect().map(_.toSeq).toSeq
    }
    val fold = run("admit_fold", Ingest.bpeBudgetAdmit)
    val prod = run("admit_prod", Ingest.bpeBudgetAdmitProd)
    assert(fold.nonEmpty && prod == fold,
      s"prod admission diverged:\nfold=$fold\nprod=$prod")
  }

  test("s_ks_monitor: final live scores equal a driver KS; order-free") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val evs = graft.io.Tables.events(sp, TestSpark.sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts"), col("value"))
      .as[AttribEvent].collect().toSeq
    // driver truth: binned KS per channel over ALL rows, the same
    // calibrated quantile-edge alphabet the monitor runs on
    val edges = Ingest.ksReferenceEdges(sp, TestSpark.sf).sorted
    def bucket(v: Double) = {
      val i = java.util.Arrays.binarySearch(edges, v)
      (if (i >= 0) i + 1 else -i - 1).toLong
    }
    val ref = evs.filter(_.event_type == "view").map(e => bucket(e.value))
      .groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    def truth(c: String): (Long, Long, Long) = {
      val test = evs.filter(_.event_type == c).map(e => bucket(e.value))
        .groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
      val n = test.values.sum; val m = ref.values.sum
      var i = 0L; var j = 0L; var best = BigInt(0)
      (test.keySet ++ ref.keySet).toSeq.sorted.foreach { k =>
        i += test.getOrElse(k, 0L); j += ref.getOrElse(k, 0L)
        val d = (BigInt(i) * m - BigInt(j) * n).abs
        if (d > best) best = d
      }
      (n, m, best.toLong)
    }
    def lastScores(feed: Seq[Seq[AttribEvent]], name: String)
        : Map[String, (Long, Long, Long)] = {
      val in = MemoryStream[AttribEvent]
      val q = runToMemory(Ingest.ksMonitor(in.toDS(), edges).toDF(), name)
      feed.foreach { b => in.addData(b); q.processAllAvailable() }
      q.stop()
      // Update mode: the LAST emission per channel is the live truth
      sp.sql(s"SELECT t, n, m, d_num FROM $name").collect()
        .groupBy(_.getString(0)).map { case (t, rows) =>
          val r = rows.last
          t -> ((r.getLong(1), r.getLong(2), r.getLong(3)))
        }
    }
    val (a, b) = evs.splitAt(evs.length / 3)
    val got = lastScores(Seq(a, b), "ks_live")
    for (c <- Seq("click", "error", "purchase", "signup"))
      assert(got(c) == truth(c), s"$c: ${got(c)} != ${truth(c)}")
    // a different batching must land on identical final scores
    val (x, y) = evs.reverse.splitAt(evs.length / 5)
    val got2 = lastScores(Seq(x, y), "ks_live2")
    assert(got2 == got, s"batching changed the final scores")
  }

  test("s_cvm_monitor: final live scores equal a driver CvM; " +
      "order-free") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val evs = graft.io.Tables.events(sp, TestSpark.sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts"), col("value"))
      .as[AttribEvent].collect().toSeq
    val edges = Ingest.ksReferenceEdges(sp, TestSpark.sf).sorted
    def bucket(v: Double) = {
      val i = java.util.Arrays.binarySearch(edges, v)
      (if (i >= 0) i + 1 else -i - 1).toLong
    }
    val ref = evs.filter(_.event_type == "view").map(e => bucket(e.value))
      .groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    def truth(c: String): (Long, Long, Long) = {
      val test = evs.filter(_.event_type == c).map(e => bucket(e.value))
        .groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
      val n = test.values.sum; val m = ref.values.sum
      var i = 0L; var j = 0L; var u = BigInt(0)
      (test.keySet ++ ref.keySet).toSeq.sorted.foreach { k =>
        val c1 = test.getOrElse(k, 0L); val c2 = ref.getOrElse(k, 0L)
        i += c1; j += c2
        val gap = BigInt(i) * m - BigInt(j) * n
        u += gap * gap * (c1 + c2)
      }
      (n, m, (u / 1000000L).toLong)
    }
    def lastScores(feed: Seq[Seq[AttribEvent]], name: String)
        : Map[String, (Long, Long, Long)] = {
      val in = MemoryStream[AttribEvent]
      val q = runToMemory(Ingest.cvmMonitor(in.toDS(), edges).toDF(), name)
      feed.foreach { b => in.addData(b); q.processAllAvailable() }
      q.stop()
      sp.sql(s"SELECT t, n, m, d_num FROM $name").collect()
        .groupBy(_.getString(0)).map { case (t, rows) =>
          val r = rows.last
          t -> ((r.getLong(1), r.getLong(2), r.getLong(3)))
        }
    }
    val (a, b) = evs.splitAt(evs.length / 3)
    val got = lastScores(Seq(a, b), "cvm_live")
    for (c <- Seq("click", "error", "purchase", "signup"))
      assert(got(c) == truth(c), s"$c: ${got(c)} != ${truth(c)}")
    val (x, y) = evs.reverse.splitAt(evs.length / 5)
    val got2 = lastScores(Seq(x, y), "cvm_live2")
    assert(got2 == got, s"batching changed the final scores")
  }

  test("s_ks_by_source: value-grain live scores equal the batch " +
      "query; order-free") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val sf = TestSpark.sf
    val batch = graft.rel.RelationalOps.ksBySource(sp, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val docs = graft.io.Tables.documents(sp, sf)
      .select(col("source"), col("n_chars").cast("long").as("n_chars"))
      .as[SourceDoc].collect().toSeq
    val sources = docs.map(_.source).distinct.sorted
    // value-grain calibration: edges at every distinct n_chars, so the
    // binned live KS is the batch's exact-value KS
    val edges = docs.map(_.n_chars.toDouble).distinct.sorted.toArray
    def lastScores(feed: Seq[Seq[SourceDoc]], name: String)
        : Map[String, (Long, Long, Long)] = {
      val in = MemoryStream[SourceDoc]
      val q = runToMemory(
        Ingest.ksBySourceMonitor(in.toDS(), edges, sources).toDF(), name)
      feed.foreach { b => in.addData(b); q.processAllAvailable() }
      q.stop()
      sp.sql(s"SELECT t, n, m, d_num, buckets FROM $name").collect()
        .groupBy(_.getString(0)).map { case (t, rows) =>
          val r = rows.last
          assert(r.getLong(4) <= edges.length + 1L,
            s"state alphabet exceeded the bin bound for $t")
          t -> ((r.getLong(1), r.getLong(2), r.getLong(3)))
        }
    }
    val (a, b) = docs.splitAt(docs.length / 3)
    val got = lastScores(Seq(a, b), "ks_src_live")
    assert(got == batch,
      s"live (n, m, d_num) diverge from batch: " +
        s"${(got.toSet -- batch.toSet).take(3)}")
    // a different batching must land on identical final scores
    val (x, y) = docs.reverse.splitAt(docs.length / 5)
    assert(lastScores(Seq(x, y), "ks_src_live2") == batch,
      "batching changed the final per-source scores")
  }

  test("s_conformal_coverage: live counts equal the batch test-split " +
      "coverage; order-free") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val sf = TestSpark.sf
    val batch = graft.ts.TimeSeriesOps.tsConformal(sp, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))))
      .toMap
    val q90 = batch.map { case (t, (_, _, q, _)) => t -> q }
    // rebuild the batch query's own test split (rn > ncal per type)
    val ab = graft.ts.TimeSeriesOps.holtAberration(sp, sf)
      .select(col("event_type"), col("bucket"),
        abs(col("v") - col("fc")).as("r")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime,
        r.getDouble(2)))
    val testObs = ab.groupBy(_._1).toSeq.flatMap { case (t, rows) =>
      val sorted = rows.sortBy(_._2)
      val ncal = (sorted.length.toLong * 7L) / 10L
      sorted.drop(ncal.toInt).map(x => ResidualObs(t, x._3))
    }
    def lastScores(feed: Seq[Seq[ResidualObs]], name: String)
        : Map[String, (Long, Long)] = {
      val in = MemoryStream[ResidualObs]
      val q = runToMemory(
        Ingest.conformalCoverageMonitor(in.toDS(), q90).toDF(), name)
      feed.foreach { b => in.addData(b); q.processAllAvailable() }
      q.stop()
      sp.sql(s"SELECT t, n, covered FROM $name").collect()
        .groupBy(_.getString(0)).map { case (t, rows) =>
          val r = rows.last
          t -> ((r.getLong(1), r.getLong(2)))
        }
    }
    val wantCounts = batch.map { case (t, (_, nt, _, cov)) =>
      t -> ((nt, cov)) }
    val (a, b) = testObs.splitAt(testObs.length / 3)
    val got = lastScores(Seq(a, b), "cov_live")
    assert(got == wantCounts,
      s"live coverage diverges: ${(got.toSet -- wantCounts.toSet).take(3)}")
    val (x, y) = testObs.reverse.splitAt(testObs.length / 5)
    assert(lastScores(Seq(x, y), "cov_live2") == wantCounts,
      "batching changed the final coverage counts")
  }

  test("s_psi_by_source: live scores equal the batch query at the " +
      "calibrated extent; order-free") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val sf = TestSpark.sf
    def r4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    val batch = graft.llm.TextOps.psiLength(sp, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    val docs = graft.io.Tables.documents(sp, sf)
      .select(col("source"), col("n_chars").cast("long").as("n_chars"))
      .as[SourceDoc].collect().toSeq
    val sources = docs.map(_.source).distinct.sorted
    val lo = docs.map(_.n_chars).min
    val hi = docs.map(_.n_chars).max
    def lastScores(feed: Seq[Seq[SourceDoc]], name: String)
        : Map[String, (Long, Double)] = {
      val in = MemoryStream[SourceDoc]
      val q = runToMemory(
        Ingest.psiBySourceMonitor(in.toDS(), lo, hi, sources).toDF(),
        name)
      feed.foreach { b => in.addData(b); q.processAllAvailable() }
      q.stop()
      sp.sql(s"SELECT t, n, m, psq, buckets FROM $name").collect()
        .groupBy(_.getString(0)).map { case (t, rows) =>
          val r = rows.last
          assert(r.getLong(4) <= 10L, s"$t: bin alphabet exceeded 10")
          assert(r.getLong(2) == docs.length.toLong,
            s"$t: corpus reference incomplete: ${r.getLong(2)}")
          t -> ((r.getLong(1), r4(r.getLong(3).toDouble / 1.0e12)))
        }
    }
    val (a, b) = docs.splitAt(docs.length / 3)
    val got = lastScores(Seq(a, b), "psi_live")
    assert(got == batch,
      s"live PSI diverges from batch: ${(got.toSet -- batch.toSet).take(3)}")
    val (x, y) = docs.reverse.splitAt(docs.length / 5)
    assert(lastScores(Seq(x, y), "psi_live2") == batch,
      "batching changed the final PSI scores")
  }

  test("s_tv_monitor: value-grain live scores equal the batch query; " +
      "order-free") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val sf = TestSpark.sf
    val batch = graft.rel.RelationalOps.tvDrift(sp, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val evs = graft.io.Tables.events(sp, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts"), col("value"))
      .as[AttribEvent].collect().toSeq
    // value-grain calibration over ALL types' values: the binned TV is
    // the batch's exact-value TV
    val edges = evs.map(_.value).distinct.sorted.toArray
    def lastScores(feed: Seq[Seq[AttribEvent]], name: String)
        : Map[String, (Long, Long, Long)] = {
      val in = MemoryStream[AttribEvent]
      val q = runToMemory(Ingest.tvMonitor(in.toDS(), edges).toDF(), name)
      feed.foreach { b => in.addData(b); q.processAllAvailable() }
      q.stop()
      sp.sql(s"SELECT t, n, m, d_num FROM $name").collect()
        .groupBy(_.getString(0)).map { case (t, rows) =>
          val r = rows.last
          t -> ((r.getLong(1), r.getLong(2), r.getLong(3)))
        }
    }
    val (a, b) = evs.splitAt(evs.length / 3)
    val got = lastScores(Seq(a, b), "tv_live")
    assert(got == batch,
      s"live (n, m, tv_num) diverge: ${(got.toSet -- batch.toSet).take(3)}")
    val (x, y) = evs.reverse.splitAt(evs.length / 5)
    assert(lastScores(Seq(x, y), "tv_live2") == batch,
      "batching changed the final TV scores")
  }

  test("s_kruskal_wallis: value-grain live score equals the batch " +
      "query; coarse alphabet stays bounded") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val sf = TestSpark.sf
    val br = graft.rel.RelationalOps.kruskalWallis(sp, sf).collect().head
    val truth = (br.getLong(0), br.getLong(1), br.getDouble(2),
      if (br.isNullAt(3)) None else Some(br.getDouble(3)))
    val grps = Set("click", "purchase", "signup", "error")
    val evs = graft.io.Tables.events(sp, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts"), col("value"))
      .as[AttribEvent].collect().toSeq.filter(e => grps(e.event_type))
    val edges = evs.map(_.value).distinct.sorted.toArray
    def lastScore(feed: Seq[Seq[AttribEvent]], name: String,
        es: Array[Double]): (Long, Long, Double, Option[Double], Long) = {
      val in = MemoryStream[AttribEvent]
      val q = runToMemory(Ingest.kwMonitor(in.toDS(), es).toDF(), name)
      feed.foreach { b => in.addData(b); q.processAllAvailable() }
      q.stop()
      val r = sp.sql(
        s"SELECT n_groups, n, h, h_tie, buckets FROM $name").collect().last
      (r.getLong(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getLong(4))
    }
    val (a, b) = evs.splitAt(evs.length / 3)
    val got = lastScore(Seq(a, b), "kw_live", edges)
    assert((got._1, got._2, got._3, got._4) == truth,
      s"live KW diverges from batch: $got != $truth")
    assert(got._5 <= edges.length + 1L)
    val (x, y) = evs.reverse.splitAt(evs.length / 5)
    val got2 = lastScore(Seq(x, y), "kw_live2", edges)
    assert((got2._1, got2._2, got2._3, got2._4) == truth,
      "batching changed the final KW score")
    // coarse 16-bin alphabet: state bound holds and the score is
    // batching-invariant (binned KW is the documented defined metric)
    val refVals = evs.map(_.value).sorted
    val bins = 16
    val coarse = (1 until bins)
      .map(k => refVals((k * refVals.length / bins) - 1))
      .distinct.toArray
    val c1 = lastScore(Seq(a, b), "kw_coarse", coarse)
    val c2 = lastScore(Seq(x, y), "kw_coarse2", coarse)
    assert(c1 == c2, "coarse-alphabet KW not batching-invariant")
    assert(c1._5 <= bins.toLong,
      s"coarse state alphabet ${c1._5} exceeded $bins")
  }

  test("s_anova_monitor: live moment-state score equals the batch " +
      "query bit-for-bit under two batchings") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val sf = TestSpark.sf
    val br = graft.rel.RelationalOps.aggAnova(sp, sf).collect().head
    val truth = (br.getLong(0), br.getLong(1), br.getDouble(2),
      br.getDouble(3),
      if (br.isNullAt(4)) None else Some(br.getDouble(4)))
    // lineitem rows as a stream: group = return flag, value = quantity
    val evs = graft.io.Tables.lineitem(sp, sf)
      .select(col("l_orderkey").as("user_id"),
        col("l_linenumber").cast("long").as("event_id"),
        col("l_returnflag").as("event_type"),
        col("l_shipdate").as("ts"), col("l_quantity").as("value"))
      .as[AttribEvent].collect().toSeq
    def lastScore(feed: Seq[Seq[AttribEvent]], name: String)
        : (Long, Long, Double, Double, Option[Double]) = {
      val in = MemoryStream[AttribEvent]
      val q = runToMemory(Ingest.anovaMonitor(in.toDS()).toDF(), name)
      feed.foreach { b => in.addData(b); q.processAllAvailable() }
      q.stop()
      val r = sp.sql(
        s"SELECT n_groups, n, ssb, ssw, f FROM $name").collect().last
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))
    }
    val (a, b) = evs.splitAt(evs.length / 3)
    val got = lastScore(Seq(a, b), "anova_live")
    assert(got == truth, s"live ANOVA diverges from batch: $got != $truth")
    val (x, y) = evs.reverse.splitAt(evs.length / 5)
    assert(lastScore(Seq(x, y), "anova_live2") == truth,
      "batching changed the final ANOVA score")
  }

  test("s_cochran_armitage: live clock-state trend score equals the " +
      "batch query bit-for-bit under two batchings") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val sf = TestSpark.sf
    val br = graft.rel.RelationalOps.aggCochranArmitage(sp, sf)
      .collect().head
    val truth = (br.getLong(0), br.getLong(1), br.getDouble(2),
      if (br.isNullAt(3)) None else Some(br.getDouble(3)))
    val evs = graft.io.Tables.events(sp, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts"), col("value"))
      .as[AttribEvent].collect().toSeq
    def lastScore(feed: Seq[Seq[AttribEvent]], name: String)
        : (Long, Long, Double, Option[Double]) = {
      val in = MemoryStream[AttribEvent]
      val q = runToMemory(
        Ingest.cochranArmitageMonitor(in.toDS()).toDF(), name)
      feed.foreach { b => in.addData(b); q.processAllAvailable() }
      q.stop()
      val r = sp.sql(s"SELECT n, r, t, z FROM $name").collect().last
      (r.getLong(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    }
    val (a, b) = evs.splitAt(evs.length / 3)
    val got = lastScore(Seq(a, b), "ca_live")
    assert(got == truth, s"live CA diverges from batch: $got != $truth")
    val (x, y) = evs.reverse.splitAt(evs.length / 5)
    assert(lastScore(Seq(x, y), "ca_live2") == truth,
      "batching changed the final CA score")
  }

  test("s_ks_monitor: state stays bounded on values that defeat any grid") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    // a stream spanning 21 decades: a fixed-width value grid (the r11
    // 0.1-wide bucket scheme) would mint a fresh bucket per distinct
    // magnitude and the per-channel state map would grow with the
    // stream; the calibrated quantile-edge alphabet cannot
    val vals = (0 until 400).map { k =>
      math.pow(10.0, (k % 21) - 9) * (1.0 + 0.37 * (k % 7))
    }
    val evs = vals.zipWithIndex.map { case (v, i) =>
      AttribEvent(i.toLong, i.toLong,
        if (i % 2 == 0) "view" else "click",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), v)
    }
    val bins = 16
    // calibration: equiprobable edges of the reference half
    val refVals = evs.filter(_.event_type == "view").map(_.value).sorted
    val edges = (1 until bins)
      .map(k => refVals((k * refVals.length / bins) - 1)).toArray.sorted
    val in = MemoryStream[AttribEvent]
    val q = runToMemory(
      Ingest.ksMonitor(in.toDS(), edges, channels = Seq("click")).toDF(),
      "ks_bounded")
    evs.grouped(100).foreach { b => in.addData(b); q.processAllAvailable() }
    q.stop()
    val rows = sp.sql("SELECT t, n, m, d_num, buckets FROM ks_bounded")
      .collect()
    assert(rows.nonEmpty)
    // the STATE BOUND: merged test+ref alphabet never exceeds bins,
    // no matter the stream's dynamic range
    rows.foreach(r => assert(r.getLong(4) <= bins.toLong,
      s"state alphabet ${r.getLong(4)} exceeded the $bins-bin bound"))
    // and the final score equals a driver KS over the same binning
    def bucket(v: Double) = {
      val i = java.util.Arrays.binarySearch(edges, v)
      (if (i >= 0) i + 1 else -i - 1).toLong
    }
    val ref = evs.filter(_.event_type == "view").map(e => bucket(e.value))
      .groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val test = evs.filter(_.event_type == "click").map(e => bucket(e.value))
      .groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val n = test.values.sum; val m = ref.values.sum
    var i = 0L; var j = 0L; var best = BigInt(0)
    (test.keySet ++ ref.keySet).toSeq.sorted.foreach { k =>
      i += test.getOrElse(k, 0L); j += ref.getOrElse(k, 0L)
      val d = (BigInt(i) * m - BigInt(j) * n).abs
      if (d > best) best = d
    }
    val last = rows.last
    assert((last.getLong(1), last.getLong(2), last.getLong(3)) ==
      ((n, m, best.toLong)),
      s"final live score diverged from the driver KS")
  }

  test("s_ks_monitor: sketch-recalibrated edges — certificate holds, " +
      "monitor decisions unchanged on the 21-decade fixture") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    // the same 21-decade stream as the bounded test
    val vals = (0 until 400).map { k =>
      math.pow(10.0, (k % 21) - 9) * (1.0 + 0.37 * (k % 7))
    }
    val evs = vals.zipWithIndex.map { case (v, i) =>
      AttribEvent(i.toLong, i.toLong,
        if (i % 2 == 0) "view" else "click",
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), v)
    }
    val bins = 16
    val refVals = evs.filter(_.event_type == "view").map(_.value).sorted
    // exact calibration (the r12 path): equiprobable edges of the ref
    val exact = (1 until bins)
      .map(k => refVals((k * refVals.length / bins) - 1)).toArray.sorted
    // sketch calibration through the FULL aggregate path (partial
    // buffers + merges across 7 partitions), k small enough that
    // compactions actually fire
    val srow = refVals.toDF("v").repartition(7)
      .agg(graft.functions.QuantileEdges(col("v"), 32, bins).as("s"))
      .select(col("s.edges"), col("s.err_bound"), col("s.n")).head
    val sketch = srow.getSeq[Double](0).toArray.sorted
    val (eb, n) = (srow.getLong(1), srow.getLong(2))
    assert(n == refVals.length.toLong)
    assert(eb > 0L, "fixture should force compactions (else trivial)")
    // the self-certified rank bound: every sketch edge's true rank is
    // within err_bound of its equiprobable target
    for (i <- 1 until bins) {
      val t = (i.toLong * n + bins - 1) / bins
      val e = sketch(i - 1)
      val lo = refVals.count(_ < e).toLong
      val hi = refVals.count(_ <= e).toLong
      assert(t <= hi + eb && t > lo - eb,
        s"edge $i rank certificate violated: t=$t lo=$lo hi=$hi eb=$eb")
    }
    // monitor decisions: run the SAME stream under both calibrations;
    // state bound holds and every thresholded drift decision matches
    def monitor(es: Array[Double], name: String): (Long, Long, Double) = {
      val in = MemoryStream[AttribEvent]
      val q = runToMemory(
        Ingest.ksMonitor(in.toDS(), es, channels = Seq("click")).toDF(),
        name)
      evs.grouped(100).foreach { b => in.addData(b); q.processAllAvailable() }
      q.stop()
      val rows = sp.sql(s"SELECT t, n, m, d_num, d, buckets FROM $name")
        .collect()
      rows.foreach(r => assert(r.getLong(5) <= bins.toLong,
        s"$name state alphabet exceeded $bins"))
      val last = rows.last
      (last.getLong(1), last.getLong(2), last.getDouble(4))
    }
    val (nE, mE, dE) = monitor(exact, "ks_cal_exact")
    val (nS, mS, dS) = monitor(sketch, "ks_cal_sketch")
    assert((nS, mS) == ((nE, mE)))
    for (theta <- Seq(0.05, 0.1, 0.15, 0.2, 0.3, 0.4, 0.5))
      assert((dS > theta) == (dE > theta),
        s"drift decision flipped at theta=$theta: sketch d=$dS exact d=$dE")
  }

  test("ksReferenceEdgesSketch: fixture edges carry a valid certificate") {
    val sp = spark
    val (es, eb, n) = Ingest.ksReferenceEdgesSketch(sp, TestSpark.sf)
    val bins = 32
    assert(es.length == bins - 1 && es.sorted.sameElements(es))
    val views = graft.io.Tables.events(sp, TestSpark.sf)
      .where(col("event_type") === "view")
      .select(col("value").cast("double")).collect().map(_.getDouble(0))
    assert(n == views.length.toLong)
    for (i <- 1 until bins) {
      val t = (i.toLong * n + bins - 1) / bins
      val e = es(i - 1)
      val lo = views.count(_ < e).toLong
      val hi = views.count(_ <= e).toLong
      assert(t <= hi + eb && t > lo - eb,
        s"edge $i certificate violated: t=$t lo=$lo hi=$hi eb=$eb")
    }
  }

  test("s_bollinger_monitor: live bands and breaches equal the batch query") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val sf = TestSpark.sf
    val batch = graft.ts.TimeSeriesOps.bollinger(sp, sf)
      .select(col("event_type"), col("bucket"), col("ma"), col("upper"),
        col("lower"), col("breach"))
      .collect().map(_.toSeq).toSet
    // feed the SAME closed rollup buckets (exact 1e4-scaled), in
    // time order per series, split across two micro-batches
    // scale through DECIMAL, not a double multiply: v * 10000 in
    // double lands a hair under the integer for values like 49.855
    // and the long cast would truncate
    val feed = graft.ts.TimeSeriesOps.rollupAvg(sp, sf)
      .select(col("event_type").as("metric"), col("bucket"),
        (col("v").cast("decimal(18,4)") * lit(10000)).cast("long")
          .as("v4"))
      .as[RollupBucket].collect().toSeq
      .sortBy(r => (r.metric, r.bucket.getTime))
    val in = MemoryStream[RollupBucket]
    val q = runToMemory(Ingest.bollingerMonitor(in.toDS()).toDF(),
      "boll_live", OutputMode.Append())
    val (b1, b2) = feed.splitAt(feed.length / 2)
    in.addData(b1); q.processAllAvailable()
    in.addData(b2); q.processAllAvailable(); q.stop()
    val got = sp.sql(
      "SELECT metric, bucket, ma, upper, lower, breach FROM boll_live")
      .collect().map(_.toSeq).toSet
    assert(got == batch,
      s"live bands diverge: extra=${(got -- batch).take(3)} " +
        s"missing=${(batch -- got).take(3)}")
  }

  test("s_page_hinkley: final live scores equal the batch fold") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val sf = TestSpark.sf
    val batch = graft.ts.TimeSeriesOps.pageHinkley(sp, sf)
      .select(col("event_type"), col("n"), col("alarms"),
        col("first_alarm"), col("ph"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getInt(1).toLong, r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    val feed = graft.ts.TimeSeriesOps.rollupAvg(sp, sf)
      .select(col("event_type").as("metric"), col("bucket"),
        (col("v").cast("decimal(18,4)") * lit(10000)).cast("long")
          .as("v4"))
      .as[RollupBucket].collect().toSeq
      .sortBy(r => (r.metric, r.bucket.getTime))
    val in = MemoryStream[RollupBucket]
    val q = runToMemory(Ingest.pageHinkleyMonitor(in.toDS()).toDF(),
      "ph_live", OutputMode.Append())
    val (b1, b2) = feed.splitAt(feed.length / 2)
    in.addData(b1); q.processAllAvailable()
    in.addData(b2); q.processAllAvailable(); q.stop()
    // the LAST emission per series is the full-prefix state
    val got = sp.sql(
      "SELECT metric, t, alarms, first_alarm, ph FROM ph_live")
      .collect().groupBy(_.getString(0)).map { case (m, rows) =>
        val r = rows.maxBy(_.getLong(1))
        m -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      }
    assert(got == batch,
      s"live Page-Hinkley diverged: got=$got batch=$batch")
  }

  test("s_ewma_chart: final live bands equal the batch chart") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val sf = TestSpark.sf
    val batch = graft.ts.TimeSeriesOps.ewmaChart(sp, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    val calib = graft.ts.TimeSeriesOps.ewmaCalibration(sp, sf)
      .localCheckpoint() // the static side, reused per micro-batch
    val feed = graft.ts.TimeSeriesOps.rollupAvg(sp, sf)
      .select(col("event_type").as("metric"), col("bucket"),
        (col("v").cast("decimal(18,4)") * lit(10000)).cast("long")
          .as("v4"))
      .as[RollupBucket].collect().toSeq
      .sortBy(r => (r.metric, r.bucket.getTime))
    val in = MemoryStream[RollupBucket]
    val q = runToMemory(
      Ingest.ewmaChartMonitor(in.toDS(), calib).toDF(),
      "ewma_live", OutputMode.Append())
    val (b1, b2) = feed.splitAt(feed.length / 2)
    in.addData(b1); q.processAllAvailable()
    in.addData(b2); q.processAllAvailable(); q.stop()
    val got = sp.sql(
      "SELECT metric, t, breaches, first_breach, ewma, `limit` " +
        "FROM ewma_live")
      .collect().groupBy(_.getString(0)).map { case (m, rows) =>
        val r = rows.maxBy(_.getLong(1))
        m -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5)))
      }
    assert(got == batch,
      s"live EWMA chart diverged: got=$got batch=$batch")
  }

  test("s_scd2_maintain: closed versions equal the batch build") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val sf = TestSpark.sf
    // batch truth: the oracle-checked SCD2 build's CLOSED versions
    val batch = graft.rel.RelationalOps.scd2Build(sp, sf)
      .where(col("is_current") === 0L)
      .select("user_id", "version", "state", "eff_from", "eff_to")
      .collect().map(_.toSeq).toSet
    // the same sliced events, fed in event-time order across 2 batches
    val evs = graft.io.Tables.events(sp, sf)
      .where(col("user_id") % 10 === 0)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("state"))
      .orderBy("ts", "event_id")
      .as[Scd2Event].collect().toSeq
    val in = MemoryStream[Scd2Event]
    val q = runToMemory(Ingest.scd2Maintain(in.toDS()).toDF(),
      "scd2_live", OutputMode.Append())
    val (b1, b2) = evs.splitAt(evs.length / 2)
    in.addData(b1); q.processAllAvailable()
    in.addData(b2); q.processAllAvailable(); q.stop()
    val got = sp.sql(
      "SELECT user_id, version, state, eff_from, eff_to FROM scd2_live")
      .collect().map(_.toSeq).toSet
    assert(got == batch,
      s"live closed versions diverge: extra=${(got -- batch).take(3)} " +
        s"missing=${(batch -- got).take(3)}")
  }

  test("s_semdedup_gate: streamed decisions equal the batch pass") {
    import graft.llm.VectorOps
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val sf = TestSpark.sf
    // batch truth: pruned_id -> kept_id from the oracle-checked pass
    val batch = VectorOps.semDedup(sp, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the reference is a distributed TABLE (bucket-keyed), never a
    // driver-collected array — the scale contract this spec pins
    val kept = VectorOps.semKeptBuckets(sp, sf)
      .localCheckpoint() // static side, reused across micro-batches
    assert(kept.count() > 0)
    val rows: Seq[VectorOps.VecRow] = graft.io.Tables.embeddings(sp, sf)
      .as[VectorOps.VecRow].collect().toSeq
    val in = MemoryStream[VectorOps.VecRow]
    val q = runToMemory(VectorOps.semDedupGate(in.toDS(), kept),
      "semdedup_gate", OutputMode.Append())
    // two batches: decisions must not depend on arrival batching
    val (b1, b2) = rows.splitAt(rows.length / 2)
    // width contract: a malformed (truncated) embedding that still
    // lands in a populated bucket must surface width_mismatch = true,
    // never a silent pass through a null-padded dot
    val malformedId = rows.map(_.vec_id).max + 1000L
    val malformed = rows.head.copy(vec_id = malformedId,
      embedding = rows.head.embedding.take(rows.head.embedding.length / 2))
    in.addData(b1); q.processAllAvailable()
    in.addData(b2 :+ malformed); q.processAllAvailable(); q.stop()
    val got = sp.sql(
      "SELECT vec_id, pruned, kept_id, width_mismatch FROM semdedup_gate")
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2),
        r.getBoolean(3)))
    assert(got.length == rows.length + 1)
    for ((id, pruned, keptId, wmis) <- got if id != malformedId) {
      assert(!wmis, s"width_mismatch raised on well-formed vector $id")
      assert(pruned == batch.contains(id),
        s"gate decision for $id diverged from batch (pruned=$pruned)")
      if (pruned) assert(keptId == batch(id),
        s"gate kept_id for $id: $keptId != batch ${batch(id)}")
    }
    val Some((_, mPruned, _, mWmis)) =
      got.find(_._1 == malformedId): @unchecked
    assert(mWmis, "malformed-width vector not flagged")
    assert(!mPruned, "malformed-width vector must not be pruned")
    assert(got.count(_._2) == batch.size)
  }

  test("s_image_gate: blocklisted and near-dup images flag, clean pass") {
    import graft.mm.{MediaCodec, MediaRow, MultimodalOps}
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    def img(id: Long, seed: Int, tweak: Int = 0): MediaRow = {
      val w = 16; val h = 16
      val gray = Array.tabulate(w * h)(i =>
        (((i * 31 + seed * 97) % 251) ^ (if (i < tweak) 1 else 0)).toByte)
      MediaRow(id, "image", MediaCodec.encodeBmp(w, h, gray), w, h, 0)
    }
    def wav(id: Long): MediaRow =
      MediaRow(id, "audio", MediaCodec.encodeWav(16000,
        Array.fill(256)(100.toShort)), 0, 0, 16000)
    val banned = img(0L, seed = 5)
    val blocked = Array(MultimodalOps.imageAhash(banned))
    val in = MemoryStream[MediaRow]
    val q = runToMemory(
      MultimodalOps.imageGate(in.toDS(), blocked), "image_gate",
      OutputMode.Append())
    in.addData(img(1L, seed = 5), img(2L, seed = 9)) // exact dup + clean
    q.processAllAvailable()
    in.addData(img(3L, seed = 5, tweak = 3), wav(4L)) // near-dup + audio
    q.processAllAvailable(); q.stop()
    val rows = sp.sql(
      "SELECT doc_id, blocked, min_hamming FROM image_gate ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
    assert(rows.length == 4)
    assert(rows(0) == ((1L, true, 0L)), s"exact dup must flag: ${rows(0)}")
    assert(!rows(1)._2 && rows(1)._3 > 3,
      s"clean image must pass with a far hash: ${rows(1)}")
    assert(rows(2)._2 && rows(2)._3 <= 3,
      s"near-dup must flag within threshold: ${rows(2)}")
    assert(rows(3) == ((4L, false, -1L)), "audio passes through unflagged")
  }

  test("s_live_rollup: mid-stream reads route with a moving frontier") {
    import graft.plans.{RollupCatalog, RollupRouteRule}
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_live").toString
    val rawPath = s"$dir/points"
    val rollupDir = s"$dir/rollup_live"
    def pt(m: String, t: String, v: Double) = Point(m, ts(t), v)
    val batch1 = Seq(
      pt("m", "2024-01-01 10:00:05", 1.0), pt("m", "2024-01-01 10:20:00", 3.0),
      pt("m", "2024-01-01 11:10:00", 5.0), pt("k", "2024-01-01 10:30:00", 2.0))
    val batch2 = Seq(
      pt("m", "2024-01-01 11:40:00", 7.0), pt("k", "2024-01-01 11:45:00", 4.0),
      pt("m", "2024-01-01 12:05:00", 9.0))
    // the raw table a concurrent reader sees (at production: the same
    // append sink the raw writer maintains)
    sp.createDataset(batch1 ++ batch2).toDF().write.parquet(rawPath)
    sp.experimental.extraOptimizations =
      sp.experimental.extraOptimizations :+ RollupRouteRule
    val in = MemoryStream[Point]
    val q = in.toDF().writeStream
      .foreachBatch(Ingest.liveRollupWriter(sp, rawPath, rollupDir))
      .outputMode("append").start()
    def read() = sp.read.parquet(rawPath)
      .groupBy(col("metric"), date_trunc("hour", col("ts")).as("bucket"))
      .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_v"))
      .orderBy("metric", "bucket")
    def assertExact(desc: String): Unit = {
      val routed = read()
      val plan = routed.queryExecution.executedPlan.toString
      assert(plan.contains("rollup_live") && plan.contains("/points") &&
        plan.contains("Union"),
        s"$desc should route interior + raw tail:\n$plan")
      val got = routed.collect()
      // the next writer batch re-registers, so clearing here only
      // affects the unrouted control read
      RollupCatalog.clear()
      val expect = read().collect()
      assert(got.length == expect.length && got.nonEmpty, desc)
      got.zip(expect).foreach { case (g, e) =>
        assert(g.getString(0) == e.getString(0) &&
          g.getTimestamp(1) == e.getTimestamp(1) &&
          g.getLong(2) == e.getLong(2), s"$desc: $g vs $e")
        assert(math.abs(g.getDouble(3) - e.getDouble(3)) < 1e-9, desc)
      }
    }
    try {
      in.addData(batch1: _*)
      q.processAllAvailable()
      // frontier = 11:10:00.000001 → floor 11:00: bucket 10:00 routes
      // from the rollup, 11:00 (incomplete) reads raw
      assertExact("after batch 1")
      in.addData(batch2: _*)
      q.processAllAvailable()
      // frontier floor 12:00: 10:00 + 11:00 (two partial rows, folded
      // across batches) route; 12:00 reads raw
      assertExact("after batch 2")
    } finally {
      q.stop()
      RollupCatalog.clear()
      sp.experimental.extraOptimizations =
        sp.experimental.extraOptimizations.filterNot(_ == RollupRouteRule)
    }
  }

  test("s_stateful_last: state tracks max-ts value and update count") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val in = MemoryStream[Point]
    val q = runToMemory(Ingest.statefulLast(in.toDS()).toDF(), "lastv")
    in.addData(Point("cpu", ts("2024-01-01 10:00:00"), 1.0),
      Point("cpu", ts("2024-01-01 10:02:00"), 7.0),
      Point("cpu", ts("2024-01-01 10:01:00"), 3.0)) // out of order
    q.processAllAvailable()
    in.addData(Point("cpu", ts("2024-01-01 10:03:00"), 9.0))
    q.processAllAvailable(); q.stop()
    val rows = sp.sql(
      "SELECT value, n_updates FROM lastv WHERE metric='cpu' ORDER BY n_updates DESC").collect()
    assert(rows.head.getDouble(0) == 9.0, "last = value at max ts")
    assert(rows.head.getLong(1) == 4, "state must count all updates")
  }

  test("s_sessionize: gap closes in-batch; watermark timeout closes idle") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val in = MemoryStream[Point]
    val q = runToMemory(Ingest.sessionize(in.toDS(), 30).toDF(), "szn",
      OutputMode.Append())
    // burst 1 then, same batch, a point past the gap → burst 1 closes inline
    in.addData(Point("cpu", ts("2024-01-01 10:00:00"), 1.0),
      Point("cpu", ts("2024-01-01 10:00:20"), 2.0),
      Point("cpu", ts("2024-01-01 10:05:00"), 5.0))
    q.processAllAvailable()
    val inline = sp.sql("SELECT n, sum_v FROM szn").collect()
    assert(inline.length == 1 && inline.head.getLong(0) == 2 &&
      inline.head.getDouble(1) == 3.0)
    // advance the GLOBAL watermark via another metric far in the future →
    // cpu's idle session (ended 10:05) times out and is emitted
    in.addData(Point("mem", ts("2024-01-01 11:00:00"), 0.0))
    q.processAllAvailable()
    in.addData(Point("mem", ts("2024-01-01 12:00:00"), 0.0))
    q.processAllAvailable(); q.stop()
    val all = sp.sql("SELECT metric, n FROM szn ORDER BY metric, n").collect()
    assert(all.exists(r => r.getString(0) == "cpu" && r.getLong(1) == 1),
      s"timeout session missing: ${all.mkString(",")}")
  }

  test("s_live_topk: the complete-mode board tracks latest values") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val in = MemoryStream[Point]
    val q = runToMemory(Ingest.liveTopK(in.toDS(), 3), "topk",
      OutputMode.Complete())
    in.addData(Point("a", ts("2024-01-01 10:00:00"), 5.0),
      Point("b", ts("2024-01-01 10:00:00"), 3.0),
      Point("c", ts("2024-01-01 10:00:00"), 1.0),
      Point("d", ts("2024-01-01 10:00:00"), 0.5))
    q.processAllAvailable()
    val board1 = sp.sql("SELECT metric, current FROM topk ORDER BY current DESC")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(board1 == Seq(("a", 5.0), ("b", 3.0), ("c", 1.0)),
      s"initial board wrong: $board1")
    // a surges later; a's newer value drops it off the board
    in.addData(Point("d", ts("2024-01-01 10:01:00"), 10.0),
      Point("a", ts("2024-01-01 10:01:00"), 0.2))
    q.processAllAvailable(); q.stop()
    val board2 = sp.sql("SELECT metric, current FROM topk ORDER BY current DESC")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(board2 == Seq(("d", 10.0), ("b", 3.0), ("c", 1.0)),
      s"updated board wrong: $board2")
  }

  test("s_holt_alert: live alerts equal the reference fold; stale points drop") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val in = MemoryStream[Point]
    val q = runToMemory(Ingest.holtAlertStream(in.toDS()).toDF(), "halert",
      OutputMode.Append())
    val vals = Seq(10.0, 12.0, 11.0, 30.0, 12.5, 12.0, 50.0, 11.8)
    val pts = vals.zipWithIndex.map { case (v, i) =>
      Point("cpu", ts(f"2024-01-01 10:$i%02d:00"), v)
    }
    in.addData(pts.take(3): _*)
    q.processAllAvailable()
    // a point at-or-before the last consumed event-time must not touch
    // state (replay/duplicate safety of the live recursion)
    in.addData(Point("cpu", ts("2024-01-01 10:01:00"), 999.0))
    q.processAllAvailable()
    in.addData(pts.drop(3): _*)
    q.processAllAvailable(); q.stop()
    val got = sp.sql(
      "SELECT value, fc, lo_band, hi_band, aberration FROM halert ORDER BY ts")
      .collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    // driver reference: the batch aberration fold's exact op sequence
    var lvl = vals(0); var trd = vals(1) - vals(0); var dev = 0.0
    val want = vals.drop(2).map { v =>
      val fc = lvl + trd
      val hi = lvl + trd + 3.0 * dev
      val lo = lvl + trd - 3.0 * dev
      val ab = if (v > hi) v - hi else if (v < lo) v - lo else 0.0
      val lvlN = 0.1 * v + 0.9 * (lvl + trd)
      val trdN = 0.01 * (0.1 * v + 0.9 * (lvl + trd) - lvl) + 0.99 * trd
      val devN = 0.1 * math.abs(v - (lvl + trd)) + 0.9 * dev
      lvl = lvlN; trd = trdN; dev = devN
      (v, fc, lo, hi, ab)
    }
    assert(got == want, s"live fold diverged:\n$got\nvs\n$want")
    assert(got.exists(_._5 > 0.0), "the spike must aberrate above the band")
    assert(!got.exists(_._1 == 999.0), "stale point must be dropped")
  }

  test("s_holt_alert_dedup: at-least-once redelivery yields the same alerts") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val in = MemoryStream[Point]
    val q = runToMemory(Ingest.holtAlertDeduped(in.toDS()).toDF(), "hdedup",
      OutputMode.Append())
    val vals = Seq(10.0, 12.0, 11.0, 30.0, 12.5)
    val pts = vals.zipWithIndex.map { case (v, i) =>
      Point("cpu", ts(f"2024-01-01 10:0$i:00"), v)
    }
    in.addData(pts.take(3): _*)
    q.processAllAvailable()
    // at-least-once: the source re-delivers an already-consumed point
    // (same metric+ts) within the watermark horizon, then continues
    in.addData(pts(2))
    q.processAllAvailable()
    in.addData(pts(3), pts(3), pts(4))
    q.processAllAvailable(); q.stop()
    val got = sp.sql("SELECT value, aberration FROM hdedup ORDER BY ts")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    // reference fold over the ONCE-delivered series
    var lvl = vals(0); var trd = vals(1) - vals(0); var dev = 0.0
    val want = vals.drop(2).map { v =>
      val hi = lvl + trd + 3.0 * dev
      val lo = lvl + trd - 3.0 * dev
      val ab = if (v > hi) v - hi else if (v < lo) v - lo else 0.0
      val lvlN = 0.1 * v + 0.9 * (lvl + trd)
      val trdN = 0.01 * (0.1 * v + 0.9 * (lvl + trd) - lvl) + 0.99 * trd
      val devN = 0.1 * math.abs(v - (lvl + trd)) + 0.9 * dev
      lvl = lvlN; trd = trdN; dev = devN
      (v, ab)
    }
    assert(got == want,
      s"deduped live fold must equal the once-delivered fold:\n$got\nvs\n$want")
    assert(got.length == want.length, "no alert may be emitted twice")
  }

  test("s_restart_recovery: Holt state survives a checkpointed restart") {
    val sp = spark
    import sp.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_restart")
    val srcDir = root.resolve("src"); java.nio.file.Files.createDirectory(srcDir)
    val ckpt = root.resolve("ckpt").toString
    def writeBatch(name: String, pts: Seq[(Int, Double)]): Unit = {
      val lines = pts.map { case (minute, v) =>
        f"cpu,2024-01-01 10:$minute%02d:00,$v%.1f"
      }
      java.nio.file.Files.write(srcDir.resolve(name),
        String.join("\n", lines: _*).getBytes("UTF-8"))
    }
    val outDir = root.resolve("out").toString
    // a FILE sink (unlike memory) supports checkpoint recovery — the
    // same sink+checkpoint pair a production alert pipeline restarts on
    def start() = {
      val pts = sp.readStream
        .schema("metric STRING, ts TIMESTAMP, value DOUBLE")
        .csv(srcDir.toString).as[Point]
      Ingest.holtAlertStream(pts).toDF().writeStream.format("parquet")
        .option("path", outDir).outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt).start()
    }
    val vals = Seq(10.0, 12.0, 11.0, 30.0, 12.5, 12.0, 50.0, 11.8)
    writeBatch("b1.csv", (0 until 4).map(i => i -> vals(i)))
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    // second PROCESS: a fresh query restarts from the checkpoint; its
    // per-metric Holt state must resume, not re-seed
    writeBatch("b2.csv", (4 until 8).map(i => i -> vals(i)))
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    val got = sp.read.parquet(outDir)
      .sort("ts").select("value", "aberration")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    var lvl = vals(0); var trd = vals(1) - vals(0); var dev = 0.0
    val all = vals.drop(2).map { v =>
      val hi = lvl + trd + 3.0 * dev
      val lo = lvl + trd - 3.0 * dev
      val ab = if (v > hi) v - hi else if (v < lo) v - lo else 0.0
      val lvlN = 0.1 * v + 0.9 * (lvl + trd)
      val trdN = 0.01 * (0.1 * v + 0.9 * (lvl + trd) - lvl) + 0.99 * trd
      val devN = 0.1 * math.abs(v - (lvl + trd)) + 0.9 * dev
      lvl = lvlN; trd = trdN; dev = devN
      (v, ab)
    }
    // the file sink accumulates BOTH runs; equality with the full-series
    // reference fold proves the restart resumed (a re-seeded fold would
    // emit different post-restart forecasts)
    assert(got == all,
      s"restarted fold must continue from recovered state:\n$got\nvs\n$all")
  }

  test("s_frame_protocol: binary batched frames decode; garbage dropped") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val in = MemoryStream[Array[Byte]]
    val q = runToMemory(Ingest.parseFrames(in.toDS()).toDF(), "frames",
      OutputMode.Append())
    in.addData(
      Ingest.encodeFrame(Seq(("cpu.load", 1700000000L, 0.5),
        ("mem.used", 1700000060L, 42.0))),
      Array[Byte](1, 2, 3), // garbage frame
      Ingest.encodeFrame(Seq(("cpu.load", 1700000120L, 0.7))))
    q.processAllAvailable(); q.stop()
    val rows = sp.sql("SELECT metric, value FROM frames ORDER BY metric, value")
      .collect()
    assert(rows.length == 3)
    assert(rows.map(_.getString(0)).sameElements(
      Array("cpu.load", "cpu.load", "mem.used")))
    assert(rows.map(_.getDouble(1)).sameElements(Array(0.5, 0.7, 42.0)))
  }

  test("s_stream_stream_join: bounded interval join across two streams") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val purchases = MemoryStream[Point]
    val signups = MemoryStream[Point]
    val joined = Ingest.streamStreamAsof(purchases.toDF(), signups.toDF(),
      "1 hour")
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode(OutputMode.Append()).start()
    signups.addData(Point("u1", ts("2024-01-01 09:30:00"), 0.0), // in window
      Point("u1", ts("2024-01-01 07:00:00"), 0.0)) // too old
    purchases.addData(Point("u1", ts("2024-01-01 10:00:00"), 9.99),
      Point("u2", ts("2024-01-01 10:00:00"), 1.0)) // no signup
    q.processAllAvailable(); q.stop()
    val rows = sp.sql("SELECT p_metric, s_ts FROM ssj").collect()
    assert(rows.length == 1, s"expected 1 join row, got ${rows.mkString(",")}")
    assert(rows.head.getString(0) == "u1" &&
      rows.head.getTimestamp(1) == ts("2024-01-01 09:30:00"))
  }

  test("s_stream_stream_outer: unmatched left rows emit nulls after watermark") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val purchases = MemoryStream[Point]
    val signups = MemoryStream[Point]
    val joined = Ingest.streamStreamAsofOuter(purchases.toDF(), signups.toDF(),
      "1 hour", "10 minutes")
    val q = joined.writeStream.format("memory").queryName("ssjo")
      .outputMode(OutputMode.Append()).start()
    signups.addData(Point("u1", ts("2024-01-01 09:30:00"), 0.0))
    purchases.addData(Point("u1", ts("2024-01-01 10:00:00"), 9.99),
      Point("u2", ts("2024-01-01 10:00:00"), 1.0)) // no signup ever
    q.processAllAvailable()
    // advance both watermarks far beyond u2's join window so the engine
    // can prove no matching signup can arrive and emits the null row
    purchases.addData(Point("wm", ts("2024-01-01 14:00:00"), 0.0))
    signups.addData(Point("wm", ts("2024-01-01 14:00:00"), 0.0))
    q.processAllAvailable()
    purchases.addData(Point("wm2", ts("2024-01-01 18:00:00"), 0.0))
    signups.addData(Point("wm2", ts("2024-01-01 18:00:00"), 0.0))
    q.processAllAvailable(); q.stop()
    val rows = sp.sql("SELECT p_metric, s_ts FROM ssjo WHERE p_metric = 'u2'")
      .collect()
    assert(rows.length == 1, s"expected u2 null-emitted once: ${rows.mkString(",")}")
    assert(rows.head.isNullAt(1), "u2 should carry a null signup ts")
    val matched = sp.sql("SELECT s_ts FROM ssjo WHERE p_metric = 'u1'").collect()
    assert(matched.length == 1 &&
      matched.head.getTimestamp(0) == ts("2024-01-01 09:30:00"))
  }

  test("s_stream_stream_full: both sides' unmatched rows emit after watermark") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val purchases = MemoryStream[Point]
    val signups = MemoryStream[Point]
    val joined = Ingest.streamStreamAsofFull(purchases.toDF(), signups.toDF(),
      "1 hour", "10 minutes")
    val q = joined.writeStream.format("memory").queryName("ssjf")
      .outputMode(OutputMode.Append()).start()
    signups.addData(Point("u1", ts("2024-01-01 09:30:00"), 0.0),
      Point("u3", ts("2024-01-01 09:45:00"), 0.0)) // signup, never purchases
    purchases.addData(Point("u1", ts("2024-01-01 10:00:00"), 9.99),
      Point("u2", ts("2024-01-01 10:00:00"), 1.0)) // purchase, never signed up
    q.processAllAvailable()
    for (h <- Seq("14", "18")) { // push both watermarks past all windows
      purchases.addData(Point("wm", ts(s"2024-01-01 $h:00:00"), 0.0))
      signups.addData(Point("wm", ts(s"2024-01-01 $h:00:00"), 0.0))
      q.processAllAvailable()
    }
    q.stop()
    val u2 = sp.sql("SELECT s_ts FROM ssjf WHERE p_metric = 'u2'").collect()
    assert(u2.length == 1 && u2.head.isNullAt(0), "unmatched purchase emits")
    val u3 = sp.sql("SELECT p_ts FROM ssjf WHERE s_metric = 'u3'").collect()
    assert(u3.length == 1 && u3.head.isNullAt(0), "unmatched signup emits")
    val m = sp.sql("SELECT s_ts FROM ssjf WHERE p_metric = 'u1'").collect()
    assert(m.length == 1 && m.head.getTimestamp(0) == ts("2024-01-01 09:30:00"))
  }

  test("s_interval_join: symmetric range matches both directions") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val left = MemoryStream[Point]
    val right = MemoryStream[Point]
    val joined = Ingest.streamStreamInterval(left.toDF(), right.toDF(),
      "30 minutes", "30 minutes")
    val q = joined.writeStream.format("memory").queryName("sij")
      .outputMode(OutputMode.Append()).start()
    right.addData(
      Point("u1", ts("2024-01-01 09:45:00"), 1.0), // 15 min BEFORE l1: in
      Point("u1", ts("2024-01-01 10:20:00"), 2.0), // 20 min AFTER l1: in
      Point("u1", ts("2024-01-01 08:00:00"), 3.0), // 2 h before: out
      Point("u2", ts("2024-01-01 10:00:00"), 4.0)) // other key: out
    left.addData(Point("u1", ts("2024-01-01 10:00:00"), 9.99))
    q.processAllAvailable(); q.stop()
    val rows = sp.sql("SELECT r_value FROM sij ORDER BY r_value").collect()
    assert(rows.map(_.getDouble(0)).sameElements(Array(1.0, 2.0)),
      s"symmetric window should match both sides: ${rows.mkString(",")}")
  }

  test("s_interval_join_eviction: expired state dropped at the watermark") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val left = MemoryStream[Point]
    val right = MemoryStream[Point]
    val joined = Ingest.streamStreamInterval(left.toDF(), right.toDF(),
      "30 minutes", "30 minutes", "10 minutes")
    val q = joined.writeStream.format("memory").queryName("sije")
      .outputMode(OutputMode.Append()).start()
    right.addData(Point("u1", ts("2024-01-01 09:45:00"), 1.0))
    left.addData(Point("u1", ts("2024-01-01 10:00:00"), 9.99))
    q.processAllAvailable()
    assert(sp.sql("SELECT * FROM sije").count() == 1) // sanity: r1 matched
    // drive both watermarks hours past every open range so the join state
    // for u1 becomes provably useless and the store evicts it
    for (h <- Seq("14", "18")) {
      left.addData(Point("wm", ts(s"2024-01-01 $h:00:00"), 0.0))
      right.addData(Point("wm", ts(s"2024-01-01 $h:00:00"), 0.0))
      q.processAllAvailable()
    }
    val removed = q.recentProgress
      .flatMap(_.stateOperators).map(_.numRowsRemoved).sum
    assert(removed >= 2,
      s"watermark advance should evict expired join state, removed=$removed")
    // a late left row whose whole range sits beyond the watermark: its
    // match (r1) is already evicted and the row itself is late — it must
    // produce NO output, proving the engine really dropped the state
    // rather than keeping it around indefinitely
    left.addData(Point("u1", ts("2024-01-01 10:05:00"), 5.55))
    q.processAllAvailable(); q.stop()
    val u1Rows = sp.sql("SELECT * FROM sije WHERE l_metric = 'u1'").count()
    assert(u1Rows == 1,
      s"late-beyond-watermark left row must not join: $u1Rows rows")
  }

  test("s_interval_join_outer: unmatched left emits nulls at watermark, " +
      "custom columns") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    // non-default schema proves the key/ts/payload parameterization:
    // (sensor, at, reading, unit)
    import StreamingSpec.Reading
    val left = MemoryStream[Reading]
    val right = MemoryStream[Reading]
    val joined = Ingest.streamStreamInterval(left.toDF(), right.toDF(),
      "30 minutes", "30 minutes", "10 minutes", "left_outer",
      keyCol = "sensor", tsCol = "at", payloadCols = Seq("reading", "unit"))
    assert(joined.columns.toSeq == Seq("l_sensor", "l_at", "l_reading",
      "l_unit", "r_sensor", "r_at", "r_reading", "r_unit"))
    val q = joined.writeStream.format("memory").queryName("sijo")
      .outputMode(OutputMode.Append()).start()
    right.addData(Reading("s1", ts("2024-01-01 09:45:00"), 1.0, "C"))
    left.addData(
      Reading("s1", ts("2024-01-01 10:00:00"), 9.99, "C"), // matches r1
      Reading("s2", ts("2024-01-01 10:00:00"), 7.77, "F")) // no partner
    q.processAllAvailable()
    // matched row emits immediately; the unmatched left row must NOT
    // emit yet — the engine cannot prove its window is closed
    assert(sp.sql("SELECT * FROM sijo WHERE l_sensor = 's1'").count() == 1)
    assert(sp.sql("SELECT * FROM sijo WHERE l_sensor = 's2'").count() == 0,
      "outer row must wait for the watermark to close its window")
    // drive both watermarks past s2's window: the null-padded row emits
    // and the expired state is evicted
    for (h <- Seq("14", "18")) {
      left.addData(Reading("wm", ts(s"2024-01-01 $h:00:00"), 0.0, "C"))
      right.addData(Reading("wm", ts(s"2024-01-01 $h:00:00"), 0.0, "C"))
      q.processAllAvailable()
    }
    val s2 = sp.sql(
      "SELECT r_sensor, r_reading FROM sijo WHERE l_sensor = 's2'").collect()
    assert(s2.length == 1 && s2.head.isNullAt(0) && s2.head.isNullAt(1),
      s"unmatched left row must emit null right side: ${s2.mkString(",")}")
    val removed = q.recentProgress
      .flatMap(_.stateOperators).map(_.numRowsRemoved).sum
    q.stop()
    assert(removed >= 2,
      s"outer join state must still evict at the watermark, removed=$removed")
  }

  test("s_interval_join_full: both sides' unmatched rows reconcile") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val left = MemoryStream[Point]
    val right = MemoryStream[Point]
    val joined = Ingest.streamStreamInterval(left.toDF(), right.toDF(),
      "30 minutes", "30 minutes", "10 minutes", "full_outer")
    val q = joined.writeStream.format("memory").queryName("sijf")
      .outputMode(OutputMode.Append()).start()
    right.addData(
      Point("m1", ts("2024-01-01 09:45:00"), 1.0), // matches l1
      Point("m3", ts("2024-01-01 10:00:00"), 3.0)) // right-only
    left.addData(
      Point("m1", ts("2024-01-01 10:00:00"), 9.99),
      Point("m2", ts("2024-01-01 10:00:00"), 7.77)) // left-only
    q.processAllAvailable()
    for (h <- Seq("14", "18")) {
      left.addData(Point("wm", ts(s"2024-01-01 $h:00:00"), 0.0))
      right.addData(Point("wm", ts(s"2024-01-01 $h:00:00"), 0.0))
      q.processAllAvailable()
    }
    q.stop()
    // every row from EITHER side accounted for exactly once
    val m1 = sp.sql("SELECT r_value FROM sijf WHERE l_metric = 'm1'").collect()
    assert(m1.length == 1 && m1.head.getDouble(0) == 1.0)
    val m2 = sp.sql("SELECT r_metric FROM sijf WHERE l_metric = 'm2'").collect()
    assert(m2.length == 1 && m2.head.isNullAt(0),
      "left-only row must emit null right side once")
    val m3 = sp.sql("SELECT l_metric FROM sijf WHERE r_metric = 'm3'").collect()
    assert(m3.length == 1 && m3.head.isNullAt(0),
      "right-only row must emit null left side once")
  }

  test("stateful rollup runs on the RocksDB state store (prod backend)") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = sp.conf.getOption(key)
    sp.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Point]
      val q = runToMemory(Ingest.tumblingRollup(in.toDF(), "1 minute",
        "10 minutes"), "rocks_rollup")
      in.addData(Point("cpu", ts("2024-01-01 10:00:10"), 1.0),
        Point("cpu", ts("2024-01-01 10:00:40"), 3.0))
      q.processAllAvailable()
      in.addData(Point("cpu", ts("2024-01-01 10:00:50"), 5.0))
      q.processAllAvailable()
      // state must merge across micro-batches through RocksDB
      val n = sp.sql("SELECT max(n) FROM rocks_rollup WHERE metric='cpu'")
        .head.getLong(0)
      assert(n == 3, s"RocksDB-backed state lost rows: n=$n")
      assert(q.lastProgress.stateOperators.nonEmpty)
      q.stop()
    } finally {
      prev match {
        case Some(v) => sp.conf.set(key, v)
        case None => sp.conf.unset(key)
      }
    }
  }

  test("s_foreachbatch_rollup + s_cache_merge: batch writes + live union") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_rollup").toString
    val in = MemoryStream[Point]
    val q = in.toDF().writeStream
      .foreachBatch(Ingest.rollupBatchWriter(dir, 60L))
      .outputMode(OutputMode.Append()).start()
    in.addData(Point("cpu", ts("2024-01-01 10:00:10"), 2.0),
      Point("cpu", ts("2024-01-01 10:00:30"), 4.0))
    q.processAllAvailable()
    in.addData(Point("cpu", ts("2024-01-01 10:01:10"), 6.0))
    q.processAllAvailable(); q.stop()
    val disk = sp.read.parquet(dir)
    assert(disk.count() == 2, "one rollup row per (batch, bucket)")
    assert(disk.where(col("bucket") === ts("2024-01-01 10:00:00"))
      .head.getLong(2) == 2)
    // cache-merge: disk rollups union a live "cache" relation
    val live = Seq((ts("2024-01-01 10:02:00"), "cpu", 1L))
      .toDF("bucket", "metric", "n")
    val merged = Ingest.cacheMerge(disk, live).collect()
    assert(merged.length == 3)
    assert(merged.count(_.getString(3) == "cache") == 1)
  }

  test("s_live_funnel: staged anchoring, same-instant converts, idle closes") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val in = MemoryStream[FunnelEvent]
    val q = runToMemory(
      Ingest.liveFunnel(in.toDS(), idleSeconds = 600L).toDF(), "lfun",
      OutputMode.Append())
    in.addData(
      // u1: a click BEFORE any view is not an anchor; the same-instant
      // click at the view's timestamp converts (batch `>=`); a purchase
      // timestamped before the click anchor is ignored; a later one lands
      FunnelEvent(1L, "click", ts("2024-01-01 09:59:00")),
      FunnelEvent(1L, "view", ts("2024-01-01 10:01:00")),
      FunnelEvent(1L, "click", ts("2024-01-01 10:01:00")),
      FunnelEvent(1L, "purchase", ts("2024-01-01 10:00:30")),
      FunnelEvent(1L, "purchase", ts("2024-01-01 10:03:00")),
      // u2: view only — will close by idle timeout at depth 1
      FunnelEvent(2L, "view", ts("2024-01-01 10:02:00")))
    q.processAllAvailable()
    val u1 = sp.sql(
      "SELECT stage, stage_name FROM lfun WHERE user_id = 1 ORDER BY stage")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(u1 == Seq((1L, "view"), (2L, "click"), (3L, "purchase")),
      s"u1 progression wrong: $u1")
    // advance the global watermark far past u2's activity + idle horizon →
    // its journey closes at depth 1 and the state row is evicted
    for (h <- Seq("12", "14")) {
      in.addData(FunnelEvent(99L, "view", ts(s"2024-01-01 $h:00:00")))
      q.processAllAvailable()
    }
    val closed = sp.sql(
      "SELECT stage FROM lfun WHERE user_id = 2 AND closed").collect()
    assert(closed.length == 1 && closed.head.getLong(0) == 1L,
      "u2 must close at depth 1 via the idle timeout")
    val removed = q.recentProgress
      .flatMap(_.stateOperators).map(_.numRowsRemoved).sum
    assert(removed >= 1, s"timeout must evict funnel state, removed=$removed")
    q.stop()
  }

  test("s_attribution_buffered: exact under cross-batch reordering") {
    // the case the eager operator's replay guard documents away: a
    // late-but-inside-watermark touch arrives in a LATER micro-batch
    // than the purchase. Buffered folding must credit it; the eager
    // twin demonstrably does not.
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    def ev(u: Long, id: Long, et: String, t: String, v: Double) =
      AttribEvent(u, id, et, ts(t), v)
    def run(tag: String,
        f: org.apache.spark.sql.Dataset[AttribEvent] =>
          org.apache.spark.sql.Dataset[graft.streaming.AttributedPurchase]) = {
      val in = MemoryStream[AttribEvent]
      val q = runToMemory(f(in.toDS()).toDF(), tag, OutputMode.Append())
      // batch 1: view then purchase (wm after: 09:55)
      in.addData(ev(1L, 1L, "view", "2024-01-01 10:00:00", 0.0),
        ev(1L, 3L, "purchase", "2024-01-01 10:05:00", 9.0))
      q.processAllAvailable()
      // batch 2: the LATE click (10:04 < purchase's 10:05, well inside
      // the 10-minute watermark)
      in.addData(ev(1L, 2L, "click", "2024-01-01 10:04:00", 0.0))
      q.processAllAvailable()
      // two watermark-advancing batches from another user: wm passes
      // 10:05, releasing (and timing out) user 1's buffer
      in.addData(ev(2L, 50L, "view", "2024-01-01 10:20:00", 0.0))
      q.processAllAvailable()
      in.addData(ev(2L, 51L, "view", "2024-01-01 10:30:00", 0.0))
      q.processAllAvailable()
      q.stop()
      sp.sql(s"SELECT event_id, touch_type, value FROM $tag")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .toSeq
    }
    val buffered = run("attr_buf", Ingest.liveAttributionBuffered(_))
    assert(buffered == Seq((3L, "click", 9.0)),
      s"buffered must credit the late touch: $buffered")
    // the eager twin on the SAME feed folds the purchase before the
    // click exists and drops the regressive arrival — view-attributed
    val eager = run("attr_eager", Ingest.liveAttribution(_))
    assert(eager == Seq((3L, "view", 9.0)),
      s"eager baseline should expose the ordering gap: $eager")
  }

  test("s_funnel_buffered: a late view anchors the journey it missed") {
    // the eager funnel cannot anchor a view that arrives after its
    // click was consumed; the buffered fold can
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    def fe(u: Long, et: String, t: String) = FunnelEvent(u, et, ts(t))
    def run(tag: String,
        f: org.apache.spark.sql.Dataset[FunnelEvent] =>
          org.apache.spark.sql.Dataset[graft.streaming.FunnelHit]) = {
      val in = MemoryStream[FunnelEvent]
      val q = runToMemory(f(in.toDS()).toDF(), tag, OutputMode.Append())
      // batch 1: click and purchase (no view yet)
      in.addData(fe(1L, "click", "2024-01-01 10:02:00"),
        fe(1L, "purchase", "2024-01-01 10:05:00"))
      q.processAllAvailable()
      // batch 2: the view arrives late (ts BEFORE the click, inside
      // the watermark)
      in.addData(fe(1L, "view", "2024-01-01 10:00:00"))
      q.processAllAvailable()
      // advance the watermark past 10:05 to release the buffer
      in.addData(fe(2L, "view", "2024-01-01 10:20:00"))
      q.processAllAvailable()
      in.addData(fe(2L, "view", "2024-01-01 10:30:00"))
      q.processAllAvailable()
      q.stop()
      sp.sql(s"SELECT user_id, stage, stage_name FROM $tag " +
        "WHERE user_id = 1 AND NOT closed ORDER BY stage")
        .collect().map(r => (r.getLong(1), r.getString(2))).toSeq
    }
    val buffered = run("fun_buf", Ingest.liveFunnelBuffered(_))
    assert(buffered == Seq((1L, "view"), (2L, "click"), (3L, "purchase")),
      s"buffered must anchor the full journey: $buffered")
    val eager = run("fun_eager", Ingest.liveFunnel(_))
    assert(eager.isEmpty || eager.map(_._1).max < 3L,
      s"eager baseline should fail to complete the journey: $eager")
  }

  test("s_state_rocksdb_recovery: the KS and KW histogram monitors " +
      "resume bit-equal under the RocksDB provider after a restart") {
    // the r13 verdict's posture gap: the bounded-histogram monitors had
    // no spec under the production state-store provider + checkpoint
    // recovery. Contract: with RocksDB backing the state, a query
    // stopped after half the stream and restarted on its checkpoint
    // must land on EXACTLY the scores of one uninterrupted pass — a
    // re-seeded histogram would drop run 1's counts; a provider that
    // round-trips state differently would shift the BigInt sup/H.
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val evs = graft.io.Tables.events(sp, TestSpark.sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts"), col("value"))
      .as[AttribEvent].collect().toSeq
    val edges = Ingest.ksReferenceEdges(sp, TestSpark.sf).sorted
    // no-restart reference: the same monitors over one MemoryStream
    // feed on the default (HDFS) provider — already spec'd against the
    // batch queries; here it is the uninterrupted-pass truth
    val inK = MemoryStream[AttribEvent]
    val qK = runToMemory(Ingest.ksMonitor(inK.toDS(), edges).toDF(),
      "rocks_ks_ref")
    inK.addData(evs); qK.processAllAvailable(); qK.stop()
    val ksRef = sp.sql("SELECT t, n, m, d_num, d FROM rocks_ks_ref")
      .collect().groupBy(_.getString(0)).map { case (t, rs) =>
        t -> rs.last.toSeq.drop(1)
      }
    val inW = MemoryStream[AttribEvent]
    val qW = runToMemory(Ingest.kwMonitor(inW.toDS(), edges).toDF(),
      "rocks_kw_ref")
    inW.addData(evs); qW.processAllAvailable(); qW.stop()
    val kwRef = sp.sql(
      "SELECT n_groups, n, h, h_tie, buckets FROM rocks_kw_ref")
      .collect().last.toSeq
    // restarted RocksDB run: CSV source in two halves, foreachBatch
    // parquet sink (checkpoint-recoverable + Update-mode capable)
    val root = java.nio.file.Files.createTempDirectory("graft_rocksdb")
    val srcDir = root.resolve("src")
    java.nio.file.Files.createDirectory(srcDir)
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss.SSS")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    def writeBatch(name: String, rows: Seq[AttribEvent]): Unit =
      java.nio.file.Files.write(srcDir.resolve(name),
        String.join("\n", rows.map(e =>
          s"${e.user_id},${e.event_id},${e.event_type}," +
            s"${fmt.format(e.ts)},${e.value}"): _*).getBytes("UTF-8"))
    def start(mk: org.apache.spark.sql.Dataset[AttribEvent] => org.apache.spark.sql.DataFrame, ckpt: String,
        outDir: String) = {
      val pts = sp.readStream.schema(
        "user_id LONG, event_id LONG, event_type STRING, " +
          "ts TIMESTAMP, value DOUBLE")
        .csv(srcDir.toString).as[AttribEvent]
      mk(pts).writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          df.withColumn("batch_id", lit(id))
            .write.mode("append").parquet(outDir)
        }
        .outputMode(OutputMode.Update())
        .option("checkpointLocation", ckpt).start()
    }
    val prev = sp.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    sp.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      val (b1, b2) = evs.splitAt(evs.length / 2)
      writeBatch("b1.csv", b1)
      val ksCk = root.resolve("ks_ck").toString
      val ksOut = root.resolve("ks_out").toString
      val kwCk = root.resolve("kw_ck").toString
      val kwOut = root.resolve("kw_out").toString
      def mkKs(d: org.apache.spark.sql.Dataset[AttribEvent]) = Ingest.ksMonitor(d, edges).toDF()
      def mkKw(d: org.apache.spark.sql.Dataset[AttribEvent]) = Ingest.kwMonitor(d, edges).toDF()
      val k1 = start(mkKs, ksCk, ksOut)
      k1.processAllAvailable(); k1.stop()
      val w1 = start(mkKw, kwCk, kwOut)
      w1.processAllAvailable(); w1.stop()
      writeBatch("b2.csv", b2)
      // fresh queries resume from the checkpoints — recovery, not rerun
      val k2 = start(mkKs, ksCk, ksOut)
      k2.processAllAvailable(); k2.stop()
      val w2 = start(mkKw, kwCk, kwOut)
      w2.processAllAvailable(); w2.stop()
      val ksGot = sp.read.parquet(ksOut)
        .orderBy(col("batch_id")).collect()
        .groupBy(_.getString(0)).map { case (t, rs) =>
          t -> rs.last.toSeq.slice(1, 5)
        }
      assert(ksGot == ksRef,
        s"recovered KS scores diverged:\n$ksGot\nvs\n$ksRef")
      val kwGot = sp.read.parquet(kwOut)
        .orderBy(col("batch_id")).collect().last.toSeq.take(5)
      assert(kwGot == kwRef,
        s"recovered KW score diverged:\n$kwGot\nvs\n$kwRef")
    } finally {
      prev match {
        case Some(p) => sp.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => sp.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("s_cm_sketch_recovery: the count-min grid survives a restart") {
    // the sketch state's restart contract: the recovered grid must
    // BYTE-EQUAL one sequential pass over everything consumed across
    // both processes — a re-seeded grid would undercount run 1's tokens
    val sp = spark
    import sp.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_cms_restart")
    val srcDir = root.resolve("src")
    java.nio.file.Files.createDirectory(srcDir)
    val ckpt = root.resolve("ckpt").toString
    def writeBatch(name: String, rows: Seq[(String, String)]): Unit =
      java.nio.file.Files.write(srcDir.resolve(name),
        String.join("\n",
          rows.map { case (l, t) => s"$l,$t" }: _*).getBytes("UTF-8"))
    val outDir = root.resolve("out").toString
    def start() = {
      val toks = sp.readStream.schema("lang STRING, token STRING")
        .csv(srcDir.toString).as[graft.streaming.LangToken]
      // foreachBatch sink: supports checkpoint recovery (memory does
      // not) and Update-mode stateful output; batch id rides along so
      // the audit reads the LAST republished sketch
      Ingest.cmSketchStream(toks).toDF().writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          df.withColumn("batch_id", lit(id))
            .write.mode("append").parquet(outDir)
        }
        .outputMode(OutputMode.Update())
        .option("checkpointLocation", ckpt).start()
    }
    val run1 = Seq(("en", "the"), ("en", "cat"), ("en", "the"))
    val run2 = Seq(("en", "dog"), ("en", "the"))
    writeBatch("b1.csv", run1)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    writeBatch("b2.csv", run2)
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    val live = sp.read.parquet(outDir)
      .orderBy(col("batch_id").desc).collect()
      .head.getAs[Array[Byte]]("sketch")
    val seq1 = new Array[Long](4 * 256)
    (run1 ++ run2).foreach { case (_, t) =>
      graft.functions.CountMin.observe(seq1, 4, 256, t) }
    assert(java.util.Arrays.equals(live,
        graft.functions.CountMin.serialize(seq1, 4, 256)),
      "recovered grid must byte-equal a sequential pass over both runs")
    assert(graft.functions.CountMin.query(live, "the") >= 3L)
  }

  test("s_budget_admit_recovery: spent budget survives a restart") {
    // the billing gate's restart contract: a recovered query must keep
    // the per-lang cumulative spend — a re-seeded store would re-admit
    // past the budget (double-spend)
    val sp = spark
    import sp.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_admit_restart")
    val srcDir = root.resolve("src")
    java.nio.file.Files.createDirectory(srcDir)
    val ckpt = root.resolve("ckpt").toString
    val outDir = root.resolve("out").toString
    def writeBatch(name: String, rows: Seq[(Long, String, Long)]): Unit =
      java.nio.file.Files.write(srcDir.resolve(name),
        String.join("\n",
          rows.map { case (d, l, n) => s"$d,$l,$n" }: _*).getBytes("UTF-8"))
    def start() = {
      val docs = sp.readStream
        .schema("doc_id LONG, lang STRING, n_tok LONG")
        .csv(srcDir.toString).as[StreamDoc]
      Ingest.budgetAdmit(docs, budget = 10L).toDF()
        .writeStream.format("parquet")
        .option("path", outDir).outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt).start()
    }
    // run 1: en spends 7 of 10
    writeBatch("b1.csv", Seq((1L, "en", 4L), (2L, "en", 3L)))
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    // run 2 after restart: a 4-token doc must be REJECTED (7+4 > 10);
    // a 3-token doc fits exactly — both outcomes need the recovered 7
    writeBatch("b2.csv", Seq((3L, "en", 4L), (4L, "en", 3L)))
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    val rows = sp.read.parquet(outDir)
      .select("doc_id", "cum").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows == Set((1L, 4L), (2L, 7L), (4L, 10L)),
      s"restart must recover spent budget (no double-spend): $rows")
  }

  test("s_live_funnel_recovery: funnel state survives a checkpointed restart") {
    val sp = spark
    import sp.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_funnel_restart")
    val srcDir = root.resolve("src")
    java.nio.file.Files.createDirectory(srcDir)
    val ckpt = root.resolve("ckpt").toString
    val outDir = root.resolve("out").toString
    def writeBatch(name: String, rows: Seq[(Long, String, String)]): Unit = {
      val lines = rows.map { case (u, et, t) => s"$u,$et,$t" }
      java.nio.file.Files.write(srcDir.resolve(name),
        String.join("\n", lines: _*).getBytes("UTF-8"))
    }
    def start() = {
      val evts = sp.readStream
        .schema("user_id LONG, event_type STRING, ts TIMESTAMP")
        .csv(srcDir.toString).as[FunnelEvent]
      Ingest.liveFunnel(evts).toDF().writeStream.format("parquet")
        .option("path", outDir).outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt).start()
    }
    writeBatch("b1.csv", Seq(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:01:00"),
      (2L, "view", "2024-01-01 10:02:00")))
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    writeBatch("b2.csv", Seq(
      (1L, "purchase", "2024-01-01 10:05:00"),
      (2L, "click", "2024-01-01 10:06:00")))
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    val got = sp.read.parquet(outDir).where(!col("closed"))
      .select("user_id", "stage").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the post-restart anchors REQUIRE recovered state: a re-seeded
    // store would reject u1's purchase (no click on file) and misread
    // u2's click as stage-less (no view) — both stage rows below only
    // exist if the restart resumed the per-user progressions
    assert(got == Set((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L)),
      s"restarted funnel must resume per-user state: $got")
  }

  test("s_live_attribution_recovery: touch state survives a restart") {
    val sp = spark
    import sp.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_attr_restart")
    val srcDir = root.resolve("src")
    java.nio.file.Files.createDirectory(srcDir)
    val ckpt = root.resolve("ckpt").toString
    val outDir = root.resolve("out").toString
    def writeBatch(name: String, rows: Seq[String]): Unit =
      java.nio.file.Files.write(srcDir.resolve(name),
        String.join("\n", rows: _*).getBytes("UTF-8"))
    def start() = {
      val evts = sp.readStream
        .schema("user_id LONG, event_id LONG, event_type STRING, " +
          "ts TIMESTAMP, value DOUBLE")
        .csv(srcDir.toString).as[AttribEvent]
      Ingest.liveAttribution(evts).toDF().writeStream.format("parquet")
        .option("path", outDir).outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt).start()
    }
    // run 1: only touches — the last one (click@10:02) is the state
    writeBatch("b1.csv", Seq(
      "1,10,view,2024-01-01 10:00:00,0.0",
      "1,11,click,2024-01-01 10:02:00,0.0"))
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    // run 2: the purchase arrives after a restart — it can only be
    // attributed to 'click' if the recovered state kept the last touch
    writeBatch("b2.csv", Seq("1,12,purchase,2024-01-01 10:05:00,9.0"))
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    val rows = sp.read.parquet(outDir)
      .select("event_id", "touch_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(rows.toSeq == Seq((12L, "click", 9.0)),
      s"restart must recover the last touch: ${rows.mkString(",")}")
  }

  test("s_live_attribution: same-instant id tiebreak, replay guard, evict") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val in = MemoryStream[AttribEvent]
    val q = runToMemory(
      Ingest.liveAttribution(in.toDS(), idleSeconds = 600L).toDF(), "lattr",
      OutputMode.Append())
    in.addData(
      // u1: view, then a purchase SHARING its timestamp with a click —
      // the click's smaller event_id sorts before, so it wins the touch
      AttribEvent(1L, 10L, "view", ts("2024-01-01 10:00:00"), 0.0),
      AttribEvent(1L, 20L, "click", ts("2024-01-01 10:01:00"), 0.0),
      AttribEvent(1L, 21L, "purchase", ts("2024-01-01 10:01:00"), 5.0),
      // u2: purchase with no prior touch → 'none'; a same-instant view
      // with a LARGER id must NOT attribute it
      AttribEvent(2L, 31L, "purchase", ts("2024-01-01 10:02:00"), 7.0),
      AttribEvent(2L, 32L, "view", ts("2024-01-01 10:02:00"), 0.0))
    q.processAllAvailable()
    val got = sp.sql(
      "SELECT event_id, touch_type, value FROM lattr ORDER BY event_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == Seq((21L, "click", 5.0), (31L, "none", 7.0)),
      s"attribution rows wrong: ${got.mkString(",")}")
    // replay of an already-consumed event must not emit a second row
    in.addData(AttribEvent(1L, 21L, "purchase", ts("2024-01-01 10:01:00"), 5.0))
    q.processAllAvailable()
    assert(sp.sql("SELECT * FROM lattr").count() == 2, "replay must be inert")
    // watermark far ahead → idle users evict
    for (h <- Seq("12", "14")) {
      in.addData(AttribEvent(99L, 90L, "view", ts(s"2024-01-01 $h:00:00"), 0.0))
      q.processAllAvailable()
    }
    val removed = q.recentProgress
      .flatMap(_.stateOperators).map(_.numRowsRemoved).sum
    assert(removed >= 2, s"idle attribution state must evict, removed=$removed")
    q.stop()
  }

  test("s_live_attribution twin: rollup equals the batch window read") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val sf = "/root/testdata/sf0.001"
    val evts = graft.io.Tables.events(sp, sf)
      .where(col("event_type").isin("click", "view", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"),
        col("value"))
      .as[AttribEvent].collect()
    val in = MemoryStream[AttribEvent]
    val q = runToMemory(Ingest.liveAttribution(in.toDS()).toDF(), "lattr_twin",
      OutputMode.Append())
    in.addData(evts.toSeq)
    q.processAllAvailable(); q.stop()
    val live = sp.sql(
      """SELECT touch_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v
        |FROM lattr_twin GROUP BY 1 ORDER BY touch_type""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val batch = graft.ts.TimeSeriesOps.attribution(sp, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(live.toSeq == batch.toSeq,
      s"live ${live.mkString(",")} != batch ${batch.mkString(",")}")
  }

  test("s_live_funnel twin: depths equal the batch funnel on events") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val sf = "/root/testdata/sf0.001"
    val evts = graft.io.Tables.events(sp, sf)
      .where(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_type"), col("ts"))
      .as[FunnelEvent].collect()
    val in = MemoryStream[FunnelEvent]
    val q = runToMemory(Ingest.liveFunnel(in.toDS()).toDF(), "lfun_twin",
      OutputMode.Append())
    in.addData(evts.toSeq) // one batch; the op sorts (ts, stage) within it
    q.processAllAvailable(); q.stop()
    val depths = sp.sql(
      """SELECT max(stage) AS d FROM lfun_twin WHERE NOT closed
        |GROUP BY user_id""".stripMargin)
      .collect().map(_.getLong(0))
    val live = (depths.count(_ >= 1L), depths.count(_ >= 2L),
      depths.count(_ >= 3L))
    val b = graft.ts.TimeSeriesOps.funnel(sp, sf).head
    val batch = (b.getLong(0).toInt, b.getLong(1).toInt, b.getLong(2).toInt)
    assert(live == batch,
      s"live funnel depths $live must equal the batch funnel $batch")
  }
  test("s_mattr_gate: stream scores equal the batch MATTR bit-for-bit") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val sf = "/root/testdata/sf0.001"
    val batch = graft.llm.TextOps.mattr(sp, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val docs = graft.io.Tables.documents(sp, sf)
      .select(col("doc_id"), col("lang"), col("text"))
      .as[graft.streaming.RawDoc].collect()
    val in = MemoryStream[graft.streaming.RawDoc]
    val q = runToMemory(Ingest.mattrGate(in.toDS()), "mgate",
      OutputMode.Append())
    val (d1, d2) = docs.splitAt(docs.length / 3)
    in.addData(d1.toSeq); q.processAllAvailable()
    in.addData(d2.toSeq); q.processAllAvailable(); q.stop()
    val streamed = sp.table("mgate").collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3)))
    assert(streamed.length == docs.length)
    streamed.foreach { case (id, m, low) =>
      assert(batch(id) == m, s"doc $id: stream mattr $m != batch ${batch(id)}")
      assert(low == (m < 0.6), s"doc $id: flag wrong")
    }
    // the gate must actually fire on this fixture (non-vacuity)
    assert(streamed.exists(_._3) && streamed.exists(!_._3),
      "mattr gate degenerate: all docs on one side of the threshold")
  }
  test("s_selfrep_gate: stream LRS scores equal the batch query " +
      "bit-for-bit under two batchings") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    val sf = "/root/testdata/sf0.001"
    val batch = graft.llm.TextOps.selfRepetition(sp, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4))).toMap
    val docs = graft.io.Tables.documents(sp, sf)
      .select(col("doc_id"), col("lang"), col("text"))
      .as[graft.streaming.RawDoc].collect()
    val in = MemoryStream[graft.streaming.RawDoc]
    val q = runToMemory(Ingest.selfRepetitionGate(in.toDS()), "srgate",
      OutputMode.Append())
    val (d1, d2) = docs.splitAt(docs.length / 3)
    in.addData(d1.toSeq); q.processAllAvailable()
    in.addData(d2.toSeq); q.processAllAvailable(); q.stop()
    val streamed = sp.table("srgate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(streamed.length == docs.length)
    streamed.foreach { case (id, n, lrs, ratio, rep) =>
      assert(batch(id) == ((n, lrs, ratio, rep)),
        s"doc $id: stream ($n,$lrs,$ratio,$rep) != batch ${batch(id)}")
    }
    // non-vacuity: some doc repeats something
    assert(streamed.exists(_._3 > 0L), "no repeated substring anywhere")
  }

  test("s_mattr_gate honors a non-default window (w=10 equals brute " +
      "force; r15 ADVICE: no hardcoded 20 in the score)") {
    val sp = spark
    import sp.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = sp.sqlContext
    def r4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    val sf = "/root/testdata/sf0.001"
    val w = 10
    val docs = graft.io.Tables.documents(sp, sf)
      .select(col("doc_id"), col("lang"), col("text"))
      .as[graft.streaming.RawDoc].collect()
    val want = docs.map { d =>
      val ws = d.text.split(" ")
      val n = ws.length
      val m = if (n >= w)
        r4((0 to n - w).map(s =>
          ws.slice(s, s + w).distinct.length.toLong).sum.toDouble /
          (w.toDouble * (n - (w - 1)).toDouble))
      else r4(ws.distinct.length.toDouble / n.toDouble)
      d.doc_id -> m
    }.toMap
    val in = MemoryStream[graft.streaming.RawDoc]
    val q = runToMemory(Ingest.mattrGate(in.toDS(), w = w), "mgate10",
      OutputMode.Append())
    in.addData(docs.toSeq); q.processAllAvailable(); q.stop()
    val streamed = sp.table("mgate10").collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(streamed.length == docs.length)
    streamed.foreach { case (id, m) =>
      assert(want(id) == m, s"doc $id: w=10 stream mattr $m != ${want(id)}")
    }
  }
}

object StreamingSpec {
  /** Non-default stream schema for the interval-join parameterization
    * spec (encoders need a stable top-level case class). */
  case class Reading(sensor: String, at: java.sql.Timestamp,
    reading: Double, unit: String)
}
