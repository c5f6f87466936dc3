package graft.llm

/** Byte-level DEFLATE kernel behind the `deflate_len` expression:
  * level 6, default strategy, zlib wrapper — fixed so the output
  * length is a pure function of the input bytes on a given JVM. */
object TextZ {
  def deflatedLen(bytes: Array[Byte]): Long = {
    val d = new java.util.zip.Deflater(6, false)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}
