package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.PickleCodec

class PickleSpec extends AnyFunSuite {

  private val payload = Seq(("cpu.load", 1700000000L, 0.75),
    ("mem.used", 1700000060L, 1234.0))

  /** `pickle.dumps(payload, protocol=2)` from CPython 3 — the
    * cross-implementation fixture our encoder must match byte-for-byte
    * and our decoder must parse. */
  private val cpythonProto2: Array[Byte] = Array[Int](
    -128, 2, 93, 113, 0, 40, 88, 8, 0, 0, 0, 99, 112, 117, 46, 108, 111,
    97, 100, 113, 1, 74, 0, -15, 83, 101, 71, 63, -24, 0, 0, 0, 0, 0, 0,
    -122, 113, 2, -122, 113, 3, 88, 8, 0, 0, 0, 109, 101, 109, 46, 117,
    115, 101, 100, 113, 4, 74, 60, -15, 83, 101, 71, 64, -109, 72, 0, 0,
    0, 0, 0, -122, 113, 5, -122, 113, 6, 101, 46).map(_.toByte)

  /** Same payload at protocol 4 (FRAME/SHORT_BINUNICODE/MEMOIZE). */
  private val cpythonProto4: Array[Byte] = Array[Int](
    -128, 4, -107, 63, 0, 0, 0, 0, 0, 0, 0, 93, -108, 40, -116, 8, 99,
    112, 117, 46, 108, 111, 97, 100, -108, 74, 0, -15, 83, 101, 71, 63,
    -24, 0, 0, 0, 0, 0, 0, -122, -108, -122, -108, -116, 8, 109, 101,
    109, 46, 117, 115, 101, 100, -108, 74, 60, -15, 83, 101, 71, 64,
    -109, 72, 0, 0, 0, 0, 0, -122, -108, -122, -108, 101, 46).map(_.toByte)

  test("encode matches CPython pickle.dumps(protocol=2) byte-for-byte") {
    assert(PickleCodec.encode(payload).sameElements(cpythonProto2))
  }

  test("decode parses CPython protocol-2 and protocol-4 pickles") {
    assert(PickleCodec.decode(cpythonProto2) == payload)
    assert(PickleCodec.decode(cpythonProto4) == payload)
  }

  test("float timestamps (time.time() clients) decode with second truncation") {
    // pickle.dumps([('cpu.load', (1700000000.25, 0.75))], protocol=2)
    // (single-element list: CPython emits APPEND, exercising that opcode)
    val floatTs: Array[Byte] = Array[Int](
      -128, 2, 93, 113, 0, 88, 8, 0, 0, 0, 99, 112, 117, 46, 108, 111, 97,
      100, 113, 1, 71, 65, -39, 84, -4, 64, 16, 0, 0, 71, 63, -24, 0, 0,
      0, 0, 0, 0, -122, 113, 2, -122, 113, 3, 97, 46).map(_.toByte)
    assert(PickleCodec.decode(floatTs) == Seq(("cpu.load", 1700000000L, 0.75)))
  }

  test("post-2038 epochs: LONG1 encode matches CPython; oversized rejects") {
    // pickle.dumps([('sys.cpu', (2**32, 1.5)), ('sys.mem', (-2**32, 2.0))],
    //              protocol=2) — both epochs exceed BININT, CPython emits
    // LONG1 with minimal little-endian two's complement
    val wide = Seq(("sys.cpu", 4294967296L, 1.5), ("sys.mem", -4294967296L, 2.0))
    val cpython: Array[Byte] = Array[Int](
      128, 2, 93, 113, 0, 40, 88, 7, 0, 0, 0, 115, 121, 115, 46, 99, 112,
      117, 113, 1, 138, 5, 0, 0, 0, 0, 1, 71, 63, 248, 0, 0, 0, 0, 0, 0,
      134, 113, 2, 134, 113, 3, 88, 7, 0, 0, 0, 115, 121, 115, 46, 109,
      101, 109, 113, 4, 138, 5, 0, 0, 0, 0, 255, 71, 64, 0, 0, 0, 0, 0,
      0, 0, 134, 113, 5, 134, 113, 6, 101, 46).map(_.toByte)
    assert(PickleCodec.encode(wide).sameElements(cpython))
    assert(PickleCodec.decode(cpython) == wide)
    assert(PickleCodec.decode(PickleCodec.encode(wide)) == wide)
    // Long extremes roundtrip (8-byte LONG1, no sign-extension step)
    val extremes = Seq(("a", Long.MaxValue, 1.0), ("b", Long.MinValue, 2.0))
    assert(PickleCodec.decode(PickleCodec.encode(extremes)) == extremes)
    // a LONG1 wider than 64 bits must reject the batch (empty), not wrap
    // the shift count into garbage: [('m', (2**80, 1.0))] at protocol 2
    val over: Array[Byte] = Array[Int](
      128, 2, 93, 113, 0, 88, 1, 0, 0, 0, 109, 113, 1, 138, 11, 0, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 1, 71, 63, 240, 0, 0, 0, 0, 0, 0, 134, 113, 2,
      134, 113, 3, 97, 46).map(_.toByte)
    assert(PickleCodec.decode(over) == Seq.empty)
  }

  test("roundtrip: encode then decode, including empty and unicode") {
    assert(PickleCodec.decode(PickleCodec.encode(payload)) == payload)
    assert(PickleCodec.decode(PickleCodec.encode(Seq.empty)) == Seq.empty)
    val uni = Seq(("métrique.中", 1700000123L, -2.5))
    assert(PickleCodec.decode(PickleCodec.encode(uni)) == uni)
  }

  test("property: decode(encode(batch)) is identity for arbitrary batches") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.forAll
    val metricGen = Gen.oneOf(
      Gen.alphaNumStr.suchThat(_.nonEmpty),
      Gen.oneOf("cpu.load", "mém.usé", "日本語.メトリック", "a.b.c.d.e"))
    val pointGen = for {
      m <- metricGen
      ts <- Gen.oneOf(Gen.choose(-100L, 2200000000L),
        Gen.choose(Long.MinValue, Long.MaxValue)) // force LONG1 paths too
      v <- Gen.oneOf(Gen.choose(-1e18, 1e18),
        Gen.oneOf(0.0, -0.0, Double.MaxValue, Double.MinPositiveValue))
    } yield (m, ts, v)
    val prop = forAll(Gen.listOfN(20, pointGen)) { pts =>
      PickleCodec.decode(PickleCodec.encode(pts)) == pts
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200),
      prop)
    assert(res.passed, s"roundtrip property failed: ${res.status}")
  }

  test("malformed or unsupported pickles decode to empty (tolerant)") {
    assert(PickleCodec.decode(Array[Byte](1, 2, 3)) == Seq.empty)
    assert(PickleCodec.decode(Array.empty[Byte]) == Seq.empty)
    // a pickled dict (unsupported shape) must not throw
    val dict = Array[Int](-128, 2, 125, 113, 0, 46).map(_.toByte) // {}
    assert(PickleCodec.decode(dict) == Seq.empty)
  }

  test("streaming parse: pickle frames explode into typed points") {
    val sp = TestSpark.spark
    import sp.implicits._
    val ds = sp.createDataset(Seq(PickleCodec.encode(payload),
      Array[Byte](9, 9, 9)))
    val pts = graft.streaming.Ingest.parsePickleFrames(ds).collect()
    assert(pts.length == 2)
    assert(pts.map(_.metric).toSet == Set("cpu.load", "mem.used"))
    assert(pts.find(_.metric == "cpu.load").get.value == 0.75)
  }
}
