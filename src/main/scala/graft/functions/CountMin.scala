package graft.functions

import scala.util.hashing.MurmurHash3

/** Count–min sketch kernel (Cormode & Muthukrishnan, J.Alg 2005) — the
  * point-lookup sibling of [[MisraGries]]: MG answers "WHO is frequent"
  * (a ≤capacity legend), CMS answers "HOW OFTEN is x" for ANY key,
  * including ones that never made a legend. depth×width counters; each
  * observation increments one cell per row (seeded murmur3 per row);
  * a lookup is the min over rows.
  *
  * Guarantees (spec-asserted): estimates NEVER undercount; overcount of
  * any single lookup exceeds 2N/width with probability ≤ 2^-depth.
  * Merging is EXACT (pointwise counter addition — fully commutative, so
  * arbitrary partial-aggregation merge trees are byte-identical to a
  * single sequential pass), and every row independently conserves the
  * observation total N.
  *
  * 100 TB posture: like MG, the shuffle carries one fixed
  * depth×width summary per (group × partition) — independent of both
  * corpus and vocabulary size; unlike MG the summary answers arbitrary
  * point lookups, so a serving layer can probe keys chosen AFTER the
  * scan (blocklist hits, per-tenant quotas) without a second pass.
  */
object CountMin {

  /** Fixed per-row seeds → the sketch is a pure function of its input
    * multiset (cross-run determinism; merge-order independence). */
  private def cell(item: String, row: Int, width: Int): Int =
    math.floorMod(MurmurHash3.stringHash(item, 0x9e3779b9 + row), width)

  def observe(buf: Array[Long], depth: Int, width: Int,
      item: String): Unit = {
    var r = 0
    while (r < depth) {
      buf(r * width + cell(item, r, width)) += 1L
      r += 1
    }
  }

  /** Pointwise sum — CMS merge is exact. Mutates and returns `a`. */
  def combine(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  /** Self-describing wire/output format: int depth, int width, then
    * depth*width big-endian longs (the row-major counter grid). */
  def serialize(buf: Array[Long], depth: Int, width: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + buf.length * 8)
    bb.putInt(depth).putInt(width)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  /** Header bounds enforced on every read of a foreign BINARY: depth
    * in [1,16], width in [1,2^22] (so depth*width*8 stays far inside
    * Int), and the payload length exactly 8 + depth*width*8. A
    * malformed sketch fails as a clean IllegalArgumentException naming
    * cm_query instead of an overflow / NegativeArraySize / OOB crash. */
  private def checkHeader(bytes: Array[Byte], depth: Int,
      width: Int): Unit = {
    if (bytes.length < 8 ||
        depth < 1 || depth > 16 || width < 1 || width > (1 << 22) ||
        bytes.length.toLong != 8L + depth.toLong * width * 8)
      throw new IllegalArgumentException(
        s"cm_query: malformed count-min sketch (depth=$depth, " +
          s"width=$width, bytes=${bytes.length}); expected depth in " +
          "[1,16], width in [1,4194304], length 8 + depth*width*8")
  }

  def deserialize(bytes: Array[Byte]): (Int, Int, Array[Long]) = {
    if (bytes.length < 8) checkHeader(bytes, 0, 0)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val depth = bb.getInt(); val width = bb.getInt()
    checkHeader(bytes, depth, width)
    val buf = new Array[Long](depth * width)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong(); i += 1 }
    (depth, width, buf)
  }

  /** Point lookup against the SERIALIZED sketch: min over rows, read
    * directly at cell offsets (no grid materialization per call). */
  def query(bytes: Array[Byte], item: String): Long = {
    if (bytes.length < 8) checkHeader(bytes, 0, 0)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val depth = bb.getInt(0); val width = bb.getInt(4)
    checkHeader(bytes, depth, width)
    var est = Long.MaxValue
    var r = 0
    while (r < depth) {
      // depth <= 16, width <= 2^22 ⇒ the byte offset stays well inside Int
      val c = bb.getLong(8 + (r * width + cell(item, r, width)) * 8)
      if (c < est) est = c
      r += 1
    }
    if (est == Long.MaxValue) 0L else est
  }
}
