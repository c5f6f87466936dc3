package graft.streaming

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/** Python-pickle batch protocol for metric points — the REAL R14 surface
  * (carbon/rurouni's pickle receiver takes `[(metric, (ts, value)), ...]`
  * on its batch port; `rurouni/protocols.py — MetricPickleReceiver` [U]).
  * The pickle wire format is public (PEP 307 / CPython pickletools).
  *
  * [[encode]] emits protocol-2 pickles byte-compatible with
  * `pickle.dumps(payload, protocol=2)` (verified against CPython output
  * in PickleSpec). [[decode]] is a small stack machine covering the
  * opcodes CPython emits for this payload shape across protocols 2–4
  * (BINUNICODE/SHORT_BINUNICODE/SHORT_BINSTRING strings, BININT{,1,2}/
  * LONG1 ints, BINFLOAT, TUPLE{1,2,3}/TUPLE-from-MARK, lists with
  * APPEND/APPENDS, FRAME/MEMOIZE/BINPUT bookkeeping) — malformed or
  * unsupported input decodes to an empty batch, matching the daemon's
  * tolerant receiver. General pickle (classes, dicts, reduce) is out of
  * scope by design: this is a wire codec, not an object store.
  */
object PickleCodec {

  /** Protocol-2 pickle of `[(metric, (ts, value)), ...]`. */
  def encode(points: Seq[(String, Long, Double)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def put(bs: Int*): Unit = bs.foreach(b => out.write(b & 0xff))
    var memo = 0
    def binput(): Unit = { // CPython memoizes every constructed object
      if (memo < 256) put('q', memo) else {
        put('r'); putIntLE(memo)
      }
      memo += 1
    }
    def putIntLE(v: Int): Unit =
      put(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, (v >> 24) & 0xff)
    put(0x80, 2) // PROTO 2
    put(']'); binput() // EMPTY_LIST
    if (points.nonEmpty) {
      put('(') // MARK
      points.foreach { case (metric, ts, value) =>
        val mb = metric.getBytes("UTF-8")
        put('X'); putIntLE(mb.length); mb.foreach(b => out.write(b)) // BINUNICODE
        binput()
        if (ts >= Int.MinValue && ts <= Int.MaxValue) {
          put('J'); putIntLE(ts.toInt) // BININT
        } else {
          // post-2038 (or deep-negative) epochs: LONG1 with minimal
          // little-endian two's complement, exactly CPython's encode_long
          val b = scala.collection.mutable.ArrayBuffer.empty[Int]
          var v = ts
          var more = true
          while (more) {
            b += (v & 0xff).toInt
            v >>= 8
            more = !((v == 0L && (b.last & 0x80) == 0) ||
              (v == -1L && (b.last & 0x80) != 0))
          }
          put(0x8a, b.length); b.foreach(put(_)) // LONG1
        }
        val bits = java.lang.Double.doubleToLongBits(value)
        put('G'); (7 to 0 by -1).foreach(i => put(((bits >>> (i * 8)) & 0xff).toInt)) // BINFLOAT (BE)
        put(0x86); binput() // TUPLE2 (ts, value)
        put(0x86); binput() // TUPLE2 (metric, inner)
      }
      put('e') // APPENDS
    }
    put('.') // STOP
    out.toByteArray
  }

  /** Decode a pickled point batch; anything unsupported → empty. */
  def decode(bytes: Array[Byte]): Seq[(String, Long, Double)] = {
    try {
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val stack = ArrayBuffer.empty[Any]
      val marks = ArrayBuffer.empty[Int]
      def popTuple(n: Int): Unit = {
        val t = stack.takeRight(n).toVector
        stack.remove(stack.length - n, n)
        stack += t
      }
      var done = false
      while (!done && buf.hasRemaining) {
        (buf.get() & 0xff) match {
          case 0x80 => buf.get() // PROTO n
          case 0x95 => buf.position(buf.position() + 8) // FRAME len
          case ']' => stack += ArrayBuffer.empty[Any] // EMPTY_LIST
          case '(' => marks += stack.length // MARK
          case 'X' => // BINUNICODE
            val n = buf.getInt; val b = new Array[Byte](n); buf.get(b)
            stack += new String(b, "UTF-8")
          case 0x8c | 'U' => // SHORT_BINUNICODE / SHORT_BINSTRING
            val n = buf.get() & 0xff; val b = new Array[Byte](n); buf.get(b)
            stack += new String(b, "UTF-8")
          case 'J' => stack += buf.getInt.toLong // BININT
          case 'K' => stack += (buf.get() & 0xff).toLong // BININT1
          case 'M' => stack += (buf.getShort & 0xffff).toLong // BININT2
          case 0x8a => // LONG1
            val n = buf.get() & 0xff
            // an int beyond 64 bits must REJECT the batch (tolerant empty
            // path), not wrap the JVM shift count into a garbage value
            require(n <= 8, s"LONG1 length $n exceeds 64-bit range")
            var v = 0L
            (0 until n).foreach(i => v |= (buf.get() & 0xffL) << (8 * i))
            if (n > 0 && n < 8 && (bytes(buf.position() - 1) & 0x80) != 0)
              v -= 1L << (8 * n) // sign-extend
            stack += v
          case 'G' => // BINFLOAT (big-endian)
            var bits = 0L
            (0 until 8).foreach(_ => bits = (bits << 8) | (buf.get() & 0xffL))
            stack += java.lang.Double.longBitsToDouble(bits)
          case 0x85 => popTuple(1) // TUPLE1
          case 0x86 => popTuple(2) // TUPLE2
          case 0x87 => popTuple(3) // TUPLE3
          case 't' => // TUPLE from mark
            val m = marks.remove(marks.length - 1)
            popTuple(stack.length - m)
          case 'a' => // APPEND
            val v = stack.remove(stack.length - 1)
            stack.last.asInstanceOf[ArrayBuffer[Any]] += v
          case 'e' => // APPENDS
            val m = marks.remove(marks.length - 1)
            val items = stack.takeRight(stack.length - m).toVector
            stack.remove(m, items.length)
            stack.last.asInstanceOf[ArrayBuffer[Any]] ++= items
          case 'q' => buf.get() // BINPUT
          case 'r' => buf.getInt // LONG_BINPUT
          case 0x94 => // MEMOIZE
          case 'N' => stack += null // NONE
          case 0x88 => stack += true // NEWTRUE
          case 0x89 => stack += false // NEWFALSE
          case '.' => done = true // STOP
          case op => throw new IllegalArgumentException(s"opcode $op")
        }
      }
      require(done && stack.length == 1, "bad pickle shape")
      // carbon clients commonly send time.time() FLOATS as timestamps —
      // accept any int/float combination and truncate ts to seconds
      def toTs(x: Any): Long = x match {
        case l: Long => l
        case d: Double => d.toLong
      }
      def toV(x: Any): Double = x match {
        case d: Double => d
        case l: Long => l.toDouble
      }
      stack.head.asInstanceOf[ArrayBuffer[Any]].toSeq.map {
        case Vector(m: String, Vector(ts, v)) => (m, toTs(ts), toV(v))
      }
    } catch { case _: Exception => Seq.empty } // tolerant receiver
  }
}
