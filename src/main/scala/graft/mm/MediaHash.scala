package graft.mm

/** Byte-level perceptual-hash kernels — PUBLIC (static-forwarder)
  * surface so the codegen'd SQL expressions (`image_ahash`,
  * `audio_ahash` in [[graft.functions]]) can call them directly from
  * generated Java, exactly like `CountMin.query`. The MediaRow-typed
  * wrappers in [[MultimodalOps]] delegate here. */
object MediaHash {

  /** 8×8 average-hash of an image payload (BMP/PNG/JPEG, dispatched on
    * magic bytes): nearest-neighbor sample, bit i set iff
    * pixel_i·64 > Σpixels (exact integer mean threshold). One shared
    * luminance formula across containers, so a pixel-identical image
    * hashes the same whatever format it arrived in. */
  def imageAhash(payload: Array[Byte]): Long = {
    val (w, h, gray) = MediaCodec.decodeImage(payload)
    val px = Array.tabulate(64) { i =>
      val x = (i % 8) * w / 8
      val y = (i / 8) * h / 8
      gray(y * w + x) & 0xFF
    }
    var sum = 0L
    px.foreach(sum += _)
    var hsh = 0L
    var i = 0
    while (i < 64) {
      if (px(i) * 64L > sum) hsh |= (1L << i)
      i += 1
    }
    hsh
  }

  /** 64-frame energy-envelope hash of a WAV payload: per-frame mean
    * |PCM| energy, bit i set iff energy_i·64 > Σenergies. */
  def audioAhash(payload: Array[Byte]): Long = {
    val (_, samples) = MediaCodec.decodeWav(payload)
    val n = samples.length
    val energies = new Array[Long](64)
    var i = 0
    while (i < n) {
      // frame index in Long: i * 64 overflows Int past 2^25 samples
      // (~35 min @ 16 kHz), which would negative-index the array
      energies((i.toLong * 64 / n).toInt) += math.abs(samples(i).toLong)
      i += 1
    }
    var sum = 0L
    energies.foreach(sum += _)
    var hsh = 0L
    i = 0
    while (i < 64) {
      if (energies(i) * 64L > sum) hsh |= (1L << i)
      i += 1
    }
    hsh
  }
}
