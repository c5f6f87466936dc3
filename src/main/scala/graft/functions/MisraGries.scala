package graft.functions

import scala.collection.mutable

/** The Misra–Gries frequent-items kernel shared by the batch aggregate
  * ([[org.apache.spark.sql.graft.HeavyHittersAggExpr]]) and the live
  * stream ([[graft.streaming.Ingest.heavyHittersStream]]) — ONE
  * implementation so the two surfaces cannot drift (the gopherGate
  * discipline applied to a sketch).
  *
  * All three ops preserve the MG invariant: estimates never overcount
  * and undercount by at most n/(capacity+1) total weight removed.
  */
object MisraGries {

  /** One observation. Known item +1; room left → insert at 1; full →
    * decrement ALL by 1 and drop zeros (the incoming singleton and one
    * unit of every resident annihilate: capacity+1 count burned, so at
    * most n/(capacity+1) such events occur). */
  def observe(buf: mutable.HashMap[String, Long], item: String,
      capacity: Int): Unit =
    buf.get(item) match {
      case Some(c) => buf(item) = c + 1L
      case None if buf.size < capacity => buf(item) = 1L
      case None =>
        val keys = buf.keysIterator.toArray
        var i = 0
        while (i < keys.length) {
          val c = buf(keys(i)) - 1L
          if (c == 0L) buf.remove(keys(i)) else buf(keys(i)) = c
          i += 1
        }
    }

  /** Agarwal et al. (PODS'12) mergeable-summaries combine: pointwise
    * sum, then subtract the (capacity+1)-th largest count and keep
    * positives — preserves the error bound under arbitrary merge
    * trees. Mutates and returns `a`. */
  def combine(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long],
      capacity: Int): mutable.HashMap[String, Long] = {
    b.foreach { case (key, c) => a(key) = a.getOrElse(key, 0L) + c }
    if (a.size > capacity) {
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - capacity - 1)
      val keys = a.keysIterator.toArray
      var i = 0
      while (i < keys.length) {
        val c = a(keys(i)) - cut
        if (c <= 0L) a.remove(keys(i)) else a(keys(i)) = c
        i += 1
      }
    }
    a
  }

  /** Top-k by (est DESC, item ASC) — the deterministic legend order. */
  def topK(buf: mutable.HashMap[String, Long],
      k: Int): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (item, c) => (-c, item) }.take(k)
}
