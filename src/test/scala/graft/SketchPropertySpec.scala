package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Property-based guarantees for the frequency-sketch KERNELS (pure
  * JVM, no Spark) — the same invariants the aggregate specs assert on
  * fixed corpora, here over 200 random streams with random merge
  * splits each: the laws that make the sketches safe to partial-
  * aggregate over arbitrary Spark merge trees. */
class SketchPropertySpec extends AnyFunSuite {
  import org.scalacheck.{Gen, Test => SCTest}
  import org.scalacheck.Prop.forAll

  // a zipf-ish vocabulary of 41 tokens; lists up to scalacheck's default
  private val streamGen =
    Gen.listOf(Gen.chooseNum(0, 40).map(i => s"t${i * i / 13}"))

  test("property: CMS split-merge == sequential; never undercounts; conserves") {
    val depth = 3; val width = 32
    val prop = forAll(streamGen, Gen.chooseNum(0, 100)) { (items, cutPct) =>
      val (l, r) = items.splitAt(items.length * cutPct / 100)
      val seq = new Array[Long](depth * width)
      items.foreach(graft.functions.CountMin.observe(seq, depth, width, _))
      val a = new Array[Long](depth * width)
      val b = new Array[Long](depth * width)
      l.foreach(graft.functions.CountMin.observe(a, depth, width, _))
      r.foreach(graft.functions.CountMin.observe(b, depth, width, _))
      val merged = graft.functions.CountMin.combine(a, b)
      val bytes = graft.functions.CountMin.serialize(seq, depth, width)
      val exact = items.groupBy(identity).map { case (t, xs) =>
        t -> xs.size.toLong }
      // merge is EXACT at any split point; estimates one-sided; every
      // row of the grid independently conserves the stream length
      merged.sameElements(seq) &&
        exact.forall { case (t, c) =>
          graft.functions.CountMin.query(bytes, t) >= c } &&
        (0 until depth).forall { rr =>
          (0 until width).map(c => seq(rr * width + c)).sum ==
            items.length.toLong }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("CMS rejects malformed sketch bytes with a clean error") {
    import graft.functions.CountMin
    val depth = 3; val width = 32
    val grid = new Array[Long](depth * width)
    CountMin.observe(grid, depth, width, "x")
    val good = CountMin.serialize(grid, depth, width)
    assert(CountMin.query(good, "x") >= 1L) // sanity: valid bytes pass
    def badHeader(d: Int, w: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(good.length)
      bb.putInt(d).putInt(w).put(good, 8, good.length - 8)
      bb.array()
    }
    // a foreign/corrupt BINARY must fail as IllegalArgumentException
    // naming cm_query — never overflow/NegativeArraySize/OOB
    val bads = Seq(
      Array.emptyByteArray,                    // no header at all
      Array[Byte](1, 2, 3),                    // truncated header
      badHeader(0, width),                     // depth out of range
      badHeader(17, width),                    // depth too deep
      badHeader(depth, 0),                     // width out of range
      badHeader(depth, 1 << 23),               // width too wide
      badHeader(1 << 30, 1 << 30),             // depth*width overflows Int
      badHeader(-4, -8),                       // negative sizes
      badHeader(depth, width + 1),             // length != 8 + d*w*8
      good.dropRight(8))                       // truncated payload
    bads.foreach { b =>
      val ex = intercept[IllegalArgumentException](CountMin.query(b, "x"))
      assert(ex.getMessage.contains("cm_query"))
      intercept[IllegalArgumentException](CountMin.deserialize(b))
    }
  }

  test("property: counting mergesort == O(n^2) strict inversions") {
    // the kernel under kendallTauFast's discordant count — heavy ties
    // included (values drawn from a 6-symbol domain)
    val prop = forAll(Gen.listOf(Gen.chooseNum(0, 5).map(_.toDouble))) {
      xs =>
        val a = xs.toArray
        val brute = (for {
          i <- a.indices; j <- i + 1 until a.length if a(i) > a(j)
        } yield 1).size.toLong
        graft.ts.TimeSeriesOps.countInversions(a.clone()) == brute
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: quantile sketch edges within the SELF-CERTIFIED " +
      "rank bound at any split; exact when no compaction fires") {
    val k = 16; val bins = 8
    val valGen = Gen.listOf(Gen.chooseNum(-1000000, 1000000)
      .map(_ / 128.0))
    val prop = forAll(valGen, Gen.chooseNum(0, 100)) { (xs, cutPct) =>
      xs.isEmpty || {
        val (l, r) = xs.splitAt(xs.length * cutPct / 100)
        def sk(vals: Seq[Double]) = {
          val b = new graft.functions.QuantileSketch.Buf(k)
          vals.foreach(graft.functions.QuantileSketch.observe(b, _))
          b
        }
        val merged = graft.functions.QuantileSketch.combine(sk(l), sk(r))
        val es = graft.functions.QuantileSketch.edges(merged, bins)
        val n = xs.length.toLong
        val eb = merged.errBound
        val okBound = (1 until bins).forall { i =>
          val t = (i.toLong * n + bins - 1) / bins
          val e = es(i - 1)
          val lo = xs.count(_ < e).toLong
          val hi = xs.count(_ <= e).toLong
          // the chosen edge's true rank interval covers the target
          // within the certificate: t <= hi + eb and t > lo - eb
          t <= hi + eb && t > lo - eb
        }
        // weight conservation + the no-compaction exactness claim
        val wTot = merged.levels.indices.map(lv =>
          merged.levels(lv).length.toLong << lv).sum
        val okExact = xs.length >= k || {
          val sorted = xs.sorted
          eb == 0L && (1 until bins).forall { i =>
            val t = ((i.toLong * n + bins - 1) / bins).toInt
            es(i - 1) == sorted(t - 1)
          }
        }
        okBound && wTot == n && okExact
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: MG never overcounts, undercount bounded, heavy survive") {
    val cap = 8
    val prop = forAll(streamGen, Gen.chooseNum(0, 100)) { (items, cutPct) =>
      val (l, r) = items.splitAt(items.length * cutPct / 100)
      def mg(xs: Seq[String]) = {
        val m = mutable.HashMap.empty[String, Long]
        xs.foreach(graft.functions.MisraGries.observe(m, _, cap))
        m
      }
      val merged = graft.functions.MisraGries.combine(mg(l), mg(r), cap)
      val exact = items.groupBy(identity).map { case (t, xs) =>
        t -> xs.size.toLong }
      val bound = items.length.toLong / (cap + 1)
      // the PODS'12 merge preserves all three MG guarantees at any
      // split point: one-sided estimates, the n/(cap+1) undercount
      // bound, and survival of every guaranteed-heavy item
      merged.forall { case (t, e) => e <= exact(t) } &&
        merged.forall { case (t, e) => exact(t) - e <= bound } &&
        exact.collect { case (t, c) if c > bound => t }
          .forall(merged.contains)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}
