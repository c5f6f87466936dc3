package graft.llm

/** Byte-level DEFLATE kernel behind the `deflate_len` expression:
  * level 6, default strategy, zlib wrapper — fixed so the output
  * length is a pure function of the input bytes on a given JVM. */
object TextZ {
  // One native Deflater per executor thread, reset() between rows:
  // output is unchanged for a fixed (level, strategy) and this removes
  // the per-row native init/teardown that dominated q_llm_compress_ratio.
  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, false)
  }

  def deflatedLen(bytes: Array[Byte]): Long = {
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}
