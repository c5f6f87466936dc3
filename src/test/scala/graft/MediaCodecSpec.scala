package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.mm.MediaCodec
import graft.mm.MultimodalOps

class MediaCodecSpec extends AnyFunSuite {

  test("WAV roundtrip: encode then decode is identity") {
    val samples = Array.tabulate(1000)(i => ((i * 37 % 65536) - 32768).toShort)
    val bytes = MediaCodec.encodeWav(16000, samples)
    assert(bytes.length == 44 + 2000)
    assert(new String(bytes.take(4), "US-ASCII") == "RIFF")
    val (rate, out) = MediaCodec.decodeWav(bytes)
    assert(rate == 16000 && out.sameElements(samples))
  }

  test("WAV decode walks past unknown chunks") {
    val samples = Array[Short](1, -2, 3)
    val base = MediaCodec.encodeWav(8000, samples)
    // splice a LIST chunk between fmt and data (after byte 36)
    val extra = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0, 9, 9, 9, 9)
    val spliced = base.take(36) ++ extra ++ base.drop(36)
    val (rate, out) = MediaCodec.decodeWav(spliced)
    assert(rate == 8000 && out.sameElements(samples))
  }

  test("WAV malformed inputs rejected") {
    intercept[IllegalArgumentException](MediaCodec.decodeWav(Array[Byte](1, 2)))
    val good = MediaCodec.encodeWav(8000, Array[Short](1, 2, 3))
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    intercept[IllegalArgumentException](MediaCodec.decodeWav(badMagic))
  }

  test("BMP roundtrip: encode then decode preserves geometry and gray ramp") {
    val (w, h) = (19, 7) // odd width forces row padding
    val gray = Array.tabulate(w * h)(i => (i % 256).toByte)
    val bytes = MediaCodec.encodeBmp(w, h, gray)
    assert(bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte)
    val (dw, dh, out) = MediaCodec.decodeBmp(bytes)
    assert(dw == w && dh == h)
    // gray in == gray out up to the luminance formula on (g,g,g):
    // (77g + 150g + 29g) >> 8 == g exactly
    assert(out.sameElements(gray))
  }

  test("media QC stats match a driver-side decode of the same payloads") {
    import graft.mm.{MultimodalOps, MediaCodec}
    val sp = TestSpark.spark
    val rows = MultimodalOps.media(sp, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.take(6).foreach { m =>
      val qc = MultimodalOps.mediaQc(m)
      assert(qc.doc_id == m.doc_id && qc.kind == m.kind)
      assert(qc.peak >= 0.0 && qc.peak <= 1.0)
      assert(qc.clip_frac >= 0.0 && qc.clip_frac <= 1.0)
      m.kind match {
        case "image" =>
          val (w, h, gray) = MediaCodec.decodeImage(m.payload)
          assert(qc.n_units == w.toLong * h)
          assert(qc.zcr == 0.0)
          val mean = gray.map(g => (g & 0xff) / 255.0).sum / (w * h)
          assert(math.abs(qc.mean_level - mean) < 1e-12)
        case "audio" =>
          val (_, s) = MediaCodec.decodeWav(m.payload)
          assert(qc.n_units == s.length.toLong)
          val zc = (1 until s.length)
            .count(i => (s(i) >= 0) != (s(i - 1) >= 0))
          assert(math.abs(qc.zcr - zc.toDouble / (s.length - 1)) < 1e-12)
      }
    }
    // the declared query aggregates both kinds and keeps counts whole
    val agg = MultimodalOps.qcStats(sp, TestSpark.sf).collect()
    assert(agg.map(_.getString(0)).sorted.sameElements(
      Array("audio", "image")))
    agg.foreach(r => assert(r.getLong(2) <= r.getLong(1),
      "n_pass must not exceed n"))
  }

  test("audio spectral: pure tones land in their Goertzel band") {
    val sr = 16000
    def tone(hz: Double, n: Int, amp: Double = 8000.0): Array[Short] =
      Array.tabulate(n)(i =>
        (amp * math.sin(2.0 * math.Pi * hz * i / sr)).toShort)
    for (hz <- Seq(500, 1000, 2000, 4000)) {
      val row = mm.MediaRow(1L, "audio",
        MediaCodec.encodeWav(sr, tone(hz, 2048)), 0, 0, sr)
      val sp = MultimodalOps.audioSpectral(row)
      assert(sp.dom_hz == hz, s"tone $hz Hz classified as ${sp.dom_hz}")
      assert(sp.n_frames == (2048 - 256) / 128 + 1)
      // sine physics: RMS = amp/√2 (scaled), ZCR = 2f/sr
      assert(math.abs(sp.mean_rms - 8000.0 / 32768.0 / math.sqrt(2.0))
        < 0.01, s"rms ${sp.mean_rms}")
      assert(math.abs(sp.mean_zcr - 2.0 * hz / sr) < 0.01,
        s"zcr ${sp.mean_zcr} at $hz")
    }
    // silence: no dominant energy claim beyond zero power
    val quiet = mm.MediaRow(2L, "audio",
      MediaCodec.encodeWav(sr, new Array[Short](512)), 0, 0, sr)
    assert(MultimodalOps.audioSpectral(quiet).dom_power == 0.0)
  }

  test("q_mm_audio_spectral: deterministic rollup over the corpus") {
    val sp = TestSpark.spark
    val a = MultimodalOps.audioSpectralStats(sp, TestSpark.sf).collect()
    val b = MultimodalOps.audioSpectralStats(sp, TestSpark.sf).collect()
    assert(a.nonEmpty, "no audio clips profiled")
    assert(a.map(_.toString).sameElements(b.map(_.toString)),
      "spectral rollup not deterministic")
    val nClips = a.map(_.getLong(1)).sum
    val nAudio = MultimodalOps.mediaOrGet(sp, TestSpark.sf)
      .filter(_.kind == "audio").count()
    assert(nClips == nAudio, s"$nClips profiled of $nAudio audio clips")
  }

  test("BMP malformed inputs rejected") {
    intercept[IllegalArgumentException](MediaCodec.decodeBmp(Array[Byte](1)))
    val good = MediaCodec.encodeBmp(4, 4, new Array[Byte](16))
    val truncated = good.take(good.length - 8)
    intercept[IllegalArgumentException](MediaCodec.decodeBmp(truncated))
  }

  test("q_mm_image_dedup: multi-probe pairs == brute-force hamming <= 3") {
    val sp = TestSpark.spark
    // corpus pairs from the declared query
    val got = MultimodalOps.imageDedup(sp, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force over the collected signatures (a few hundred images)
    val sigs = MultimodalOps.mediaOrGet(sp, TestSpark.sf)
      .filter(_.kind == "image").collect()
      .map(m => m.doc_id -> MultimodalOps.imageAhash(m))
    val brute = (for {
      (a, ha) <- sigs; (b, hb) <- sigs if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(got == brute,
      s"probe pairs diverge: extra=${got -- brute} missing=${brute -- got}")

    // a planted near-identical image (3 pixels nudged) must pair with
    // its original under the ahash — the recall half the corpus can't
    // guarantee on its own
    val orig = MultimodalOps.mediaOrGet(sp, TestSpark.sf)
      .filter(_.kind == "image").head()
    val (w, h, gray) = MediaCodec.decodeBmp(orig.payload)
    val tweaked = gray.clone()
    (0 until 3).foreach { i =>
      val p = (i * 37) % tweaked.length
      tweaked(p) = (tweaked(p) ^ 0x01).toByte // sub-threshold nudge
    }
    val h0 = MultimodalOps.imageAhash(orig)
    val h1 = MultimodalOps.imageAhash(
      orig.copy(payload = MediaCodec.encodeBmp(w, h, tweaked)))
    assert(java.lang.Long.bitCount(h0 ^ h1) <= 3,
      "near-identical image drifted past the dedup threshold")
  }

  test("wide-key media probes == brute-force hamming <= 2 (image + audio)") {
    val sp = TestSpark.spark
    def brute(kind: String): Set[(Long, Long, Long)] = {
      val sigs = MultimodalOps.mediaOrGet(sp, TestSpark.sf)
        .filter(_.kind == kind).collect()
        .map(m => m.doc_id -> (if (kind == "image")
          MultimodalOps.imageAhash(m) else MultimodalOps.audioAhash(m)))
      (for {
        (a, ha) <- sigs; (b, hb) <- sigs if a < b
        d = java.lang.Long.bitCount(ha ^ hb) if d <= 2
      } yield (a, b, d.toLong)).toSet
    }
    val gotImg = MultimodalOps.imageDedupWide(sp, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotImg == brute("image"),
      s"image wide probe diverges: extra=${gotImg -- brute("image")} " +
        s"missing=${brute("image") -- gotImg}")
    val gotAud = MultimodalOps.audioDedupWide(sp, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotAud == brute("audio"),
      s"audio wide probe diverges: extra=${gotAud -- brute("audio")} " +
        s"missing=${brute("audio") -- gotAud}")
    // the wide pairs are exactly the d<=2 subset of the d<=3 probe
    val narrow = MultimodalOps.imageDedup(sp, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(_._3 <= 2).toSet
    assert(gotImg == narrow, "wide probe != narrow probe's d<=2 subset")
  }

  test("SQL image_ahash/audio_ahash equal the JVM kernels (codegen path)") {
    val sp = TestSpark.spark
    graft.functions.registerAll(sp)
    val media = MultimodalOps.mediaOrGet(sp, TestSpark.sf)
    media.toDF().createOrReplaceTempView("media_hash_in")
    val viaSql = sp.sql(
      """SELECT doc_id,
        |  CASE WHEN kind = 'image' THEN image_ahash(payload)
        |       ELSE audio_ahash(payload) END AS h
        |FROM media_hash_in""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaKernel = media.collect().map { m =>
      m.doc_id -> (if (m.kind == "image") graft.mm.MediaHash.imageAhash(m.payload)
        else graft.mm.MediaHash.audioAhash(m.payload))
    }.toMap
    assert(viaSql.nonEmpty && viaSql == viaKernel)
    // malformed payloads fail cleanly through the SQL surface too
    import sp.implicits._
    val bad = Seq((1L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload")
    bad.createOrReplaceTempView("media_hash_bad")
    val ex = intercept[Exception](
      sp.sql("SELECT image_ahash(payload) FROM media_hash_bad").collect())
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(_.isInstanceOf[IllegalArgumentException]))
  }

  test("q_mm_audio_dedup: probe pairs == brute force; re-gain stays close") {
    val sp = TestSpark.spark
    val got = MultimodalOps.audioDedup(sp, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sigs = MultimodalOps.mediaOrGet(sp, TestSpark.sf)
      .filter(_.kind == "audio").collect()
      .map(m => m.doc_id -> MultimodalOps.audioAhash(m))
    val brute = (for {
      (a, ha) <- sigs; (b, hb) <- sigs if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(got == brute,
      s"probe pairs diverge: extra=${got -- brute} missing=${brute -- got}")
    // a re-gained copy (all samples halved — the energy envelope keeps
    // its shape) must stay within the dedup threshold
    val orig = MultimodalOps.mediaOrGet(sp, TestSpark.sf)
      .filter(_.kind == "audio").head()
    val (rate, samples) = MediaCodec.decodeWav(orig.payload)
    val gained = samples.map(s => (s / 2).toShort)
    val h0 = MultimodalOps.audioAhash(orig)
    val h1 = MultimodalOps.audioAhash(
      orig.copy(payload = MediaCodec.encodeWav(rate, gained)))
    assert(java.lang.Long.bitCount(h0 ^ h1) <= 3,
      "re-gained clip drifted past the dedup threshold")
  }

  test("PNG round-trips gray bit-exactly; cross-container hash equality") {
    val w = 24; val h = 17
    val gray = Array.tabulate(w * h)(i => ((i * 7) % 251).toByte)
    val png = MediaCodec.encodePng(w, h, gray)
    assert(MediaCodec.imageFormat(png) == "png")
    val (dw, dh, out) = MediaCodec.decodeImage(png)
    assert(dw == w && dh == h)
    assert(out.sameElements(gray), "PNG gray roundtrip drifted")
    // the same pixels hash identically whatever container carried them
    val viaBmp = graft.mm.MediaHash.imageAhash(MediaCodec.encodeBmp(w, h, gray))
    val viaPng = graft.mm.MediaHash.imageAhash(png)
    assert(viaBmp == viaPng, "container changed the perceptual hash")
  }

  test("JPEG near-dup pair stays within the dedup threshold") {
    // bimodal image (dark left / bright right): every sampled pixel sits
    // far from the mean threshold, so JPEG's lossy reconstruction error
    // (a few gray levels) cannot flip ahash bits
    val w = 64; val h = 64
    val gray = Array.tabulate(w * h) { i =>
      if (i % w < w / 2) 40.toByte else 215.toByte
    }
    val jpg = MediaCodec.encodeJpeg(w, h, gray)
    assert(MediaCodec.imageFormat(jpg) == "jpeg")
    val (dw, dh, dec) = MediaCodec.decodeImage(jpg)
    assert(dw == w && dh == h)
    // re-encode the decoded pixels with a 3-pixel nudge: the classic
    // save-again-with-small-edit near-dup
    val tweaked = dec.clone()
    (0 until 3).foreach { i =>
      val p = (i * 37) % tweaked.length
      tweaked(p) = (tweaked(p) ^ 0x01).toByte
    }
    val h0 = graft.mm.MediaHash.imageAhash(jpg)
    val h1 = graft.mm.MediaHash.imageAhash(MediaCodec.encodeJpeg(w, h, tweaked))
    assert(java.lang.Long.bitCount(h0 ^ h1) <= 3,
      "re-encoded JPEG drifted past the dedup threshold")
    // and the JPEG hashes close to its losslessly-carried twin
    val hRef = graft.mm.MediaHash.imageAhash(MediaCodec.encodeBmp(w, h, gray))
    assert(java.lang.Long.bitCount(h0 ^ hRef) <= 3,
      "JPEG loss moved the hash past the dedup threshold")
  }

  test("unknown image formats are rejected through decodeImage") {
    intercept[IllegalArgumentException](
      MediaCodec.decodeImage(Array[Byte](0x47, 0x49, 0x46, 0x38))) // GIF87a
    intercept[IllegalArgumentException](
      MediaCodec.decodeImage(Array[Byte]()))
    // a PNG magic with garbage body fails cleanly, not with a decode crash
    val junk = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 1, 2)
    intercept[IllegalArgumentException](MediaCodec.decodeImage(junk))
  }

  test("planted image clone rides a PNG container through the probe") {
    val sp = TestSpark.spark
    val clone = MultimodalOps.mediaOrGet(sp, TestSpark.sf)
      .filter(_.doc_id == MultimodalOps.CloneIdOffset).head()
    assert(MediaCodec.imageFormat(clone.payload) == "png",
      "expected the planted image near-dup to be PNG-encoded")
  }
}
