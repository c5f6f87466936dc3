package graft.functions

import scala.collection.mutable

/** Deterministic mergeable quantile sketch — the MRL/KLL compactor
  * hierarchy (Manku–Rajagopalan–Lindsay 1998; Karnin–Lang–Liberty 2016
  * with the deterministic fixed-offset compactor): level l holds items
  * of weight 2^l; a full level sorts and promotes its odd-index
  * elements (an odd straggler keeps the max at the current level, so
  * total weight is conserved exactly). Each compaction of a weight-w
  * level shifts any rank by at most w, and the sketch BOOKKEEPS that
  * worst case in `errBound` — a SELF-CERTIFYING bound the specs assert
  * measured error against, instead of trusting a re-derived theorem.
  * Merge = level-wise concatenation + recompaction (error bounds add),
  * so the kernel is safe under arbitrary Spark partial-aggregate merge
  * trees — the [[MisraGries]] mergeable-summaries discipline applied
  * to ranks. Purpose: re-deriving
  * [[graft.streaming.Ingest.ksReferenceEdges]]-style calibration
  * without an exact percentile pass (one bounded summary per
  * partition instead of a full sort). */
object QuantileSketch {

  /** Compactor-hierarchy buffer: level l holds items of weight 2^l.
    * `errBound` is the exact worst-case rank error accumulated by the
    * compactions that built this buffer (in item-count units). */
  final class Buf(val k: Int) {
    require(k >= 2, s"quantile sketch needs k >= 2, got $k")
    val levels: mutable.ArrayBuffer[mutable.ArrayBuffer[Double]] =
      mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Double])
    var n: Long = 0L
    var errBound: Long = 0L
  }

  def observe(b: Buf, v: Double): Unit = {
    b.levels(0) += v
    b.n += 1L
    if (b.levels(0).length >= b.k) compactFrom(b, 0)
  }

  /** Sort-and-halve every overfull level from `start` upward. A
    * compaction of level l (weight w = 2^l) promotes the odd-index
    * half at weight 2w; for any threshold the below-weight moves by
    * ≤ w, booked into errBound. */
  private def compactFrom(b: Buf, start: Int): Unit = {
    var l = start
    while (l < b.levels.length && b.levels(l).length >= b.k) {
      val arr = b.levels(l).toArray
      java.util.Arrays.sort(arr)
      if (l + 1 == b.levels.length)
        b.levels += mutable.ArrayBuffer.empty[Double]
      val up = b.levels(l + 1)
      var i = 1
      while (i < arr.length) { up += arr(i); i += 2 }
      b.levels(l).clear()
      // odd count: the unpaired max stays at this level — weight is
      // conserved exactly (m·w = ⌊m/2⌋·2w + (m mod 2)·w)
      if (arr.length % 2 == 1) b.levels(l) += arr(arr.length - 1)
      b.errBound += 1L << l
      l += 1
    }
  }

  /** Level-wise concatenate + recompact; n and errBound add. Mutates
    * and returns `a`. */
  def combine(a: Buf, b: Buf): Buf = {
    require(a.k == b.k, "cannot merge sketches with different k")
    while (a.levels.length < b.levels.length)
      a.levels += mutable.ArrayBuffer.empty[Double]
    var l = 0
    while (l < b.levels.length) { a.levels(l) ++= b.levels(l); l += 1 }
    a.n += b.n
    a.errBound += b.errBound
    l = 0
    while (l < a.levels.length) {
      if (a.levels(l).length >= a.k) compactFrom(a, l)
      l += 1
    }
    a
  }

  /** The B−1 interior quantile edges: for each i, the smallest held
    * value whose cumulative weight reaches ⌈i·n/B⌉ — the sketch analog
    * of equiprobable reference bin edges. Empty sketch → empty. */
  def edges(b: Buf, bins: Int): Array[Double] = {
    if (b.n == 0L) return Array.empty[Double]
    val items = mutable.ArrayBuffer.empty[(Double, Long)]
    var l = 0
    while (l < b.levels.length) {
      b.levels(l).foreach(v => items += ((v, 1L << l)))
      l += 1
    }
    val sorted = items.sortBy(_._1)
    val out = new Array[Double](bins - 1)
    var idx = 0; var cum = 0L
    var i = 1
    while (i < bins) {
      val t = (i.toLong * b.n + bins - 1) / bins // ceil(i·n/B)
      while (cum < t && idx < sorted.length) {
        cum += sorted(idx)._2; idx += 1
      }
      out(i - 1) = sorted(math.min(idx, sorted.length) - 1)._1
      i += 1
    }
    out
  }

  def serialize(b: Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(b.k)
    out.writeLong(b.n)
    out.writeLong(b.errBound)
    out.writeInt(b.levels.length)
    b.levels.foreach { lv =>
      out.writeInt(lv.length)
      lv.foreach(out.writeDouble)
    }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val b = new Buf(in.readInt())
    b.n = in.readLong()
    b.errBound = in.readLong()
    val nl = in.readInt()
    while (b.levels.length < nl)
      b.levels += mutable.ArrayBuffer.empty[Double]
    var l = 0
    while (l < nl) {
      val sz = in.readInt()
      var i = 0
      while (i < sz) { b.levels(l) += in.readDouble(); i += 1 }
      l += 1
    }
    b
  }
}
