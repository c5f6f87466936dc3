package graft.mm

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM codecs for two real container formats — enough to make the
  * multimodal decode stage a TRUE decode with zero native dependencies:
  *
  *  - WAV: RIFF/WAVE with a PCM `fmt ` chunk and 16-bit mono `data`
  *    chunk (canonical 44-byte header; format is public: Microsoft
  *    RIFF/WAVE spec).
  *  - BMP: BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER, uncompressed
  *    24-bpp bottom-up pixel rows padded to 4 bytes (public: Windows
  *    BMP spec).
  *
  * Both decoders parse the actual container structure (magic, chunk
  * walk, header fields, payload geometry) and reject malformed input —
  * swap-in point for richer codecs, but no longer a fake.
  */
object MediaCodec {

  // ---------------------------------------------------------------- WAV

  /** Encode 16-bit mono PCM samples as a canonical RIFF/WAVE file. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Decode a RIFF/WAVE container: walk chunks, require PCM 16-bit mono,
    * return (sampleRate, samples). Throws on malformed input. */
  def decodeWav(bytes: Array[Byte]): (Int, Array[Short]) = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(bytes.length >= 44, s"truncated WAV: ${bytes.length} bytes")
    require(tag() == "RIFF", "not a RIFF container")
    buf.getInt // riff size (trust actual length instead)
    require(tag() == "WAVE", "not a WAVE form")
    var sampleRate = -1
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && (sampleRate < 0 || samples == null)) {
      val id = tag(); val len = buf.getInt
      require(len >= 0 && len <= buf.remaining(), s"bad chunk $id len=$len")
      id match {
        case "fmt " =>
          val fmt = buf.getShort; val ch = buf.getShort
          sampleRate = buf.getInt
          buf.getInt; buf.getShort // byte rate, block align
          val bits = buf.getShort
          require(fmt == 1 && ch == 1 && bits == 16,
            s"unsupported WAV encoding fmt=$fmt ch=$ch bits=$bits")
          if (len > 16) buf.position(buf.position() + (len - 16))
        case "data" =>
          require(len % 2 == 0, s"odd PCM data length $len")
          samples = new Array[Short](len / 2)
          (0 until samples.length).foreach(i => samples(i) = buf.getShort)
        case _ => // skip unknown chunk (word-aligned)
          buf.position(buf.position() + len + (len & 1))
      }
    }
    require(sampleRate > 0, "missing fmt chunk")
    require(samples != null, "missing data chunk")
    (sampleRate, samples)
  }

  // ---------------------------------------------------------------- BMP

  private val BmpHeaderLen = 14 + 40

  private def rowStride(width: Int): Int = ((width * 3) + 3) & ~3

  /** Encode a grayscale image (row-major, top-down, one byte per pixel)
    * as an uncompressed 24-bpp bottom-up BMP. */
  def encodeBmp(width: Int, height: Int, gray: Array[Byte]): Array[Byte] = {
    require(gray.length == width * height,
      s"pixel buffer ${gray.length} != ${width}x$height")
    val stride = rowStride(width)
    val imgLen = stride * height
    val buf = ByteBuffer.allocate(BmpHeaderLen + imgLen)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
      .putInt(BmpHeaderLen + imgLen).putInt(0).putInt(BmpHeaderLen)
    buf.putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24).putInt(0).putInt(imgLen)
      .putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 DPI, no palette
    var y = height - 1
    while (y >= 0) { // bottom-up rows
      var x = 0
      while (x < width) {
        val g = gray(y * width + x)
        buf.put(g).put(g).put(g) // B G R
        x += 1
      }
      var pad = stride - width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }

  /** Decode an uncompressed 24-bpp BMP to (width, height, grayscale
    * top-down pixels) via the integer luminance approximation
    * (77R + 150G + 29B) >> 8. Throws on malformed input. */
  def decodeBmp(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(bytes.length >= BmpHeaderLen, s"truncated BMP: ${bytes.length}")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.get() == 'B'.toByte && buf.get() == 'M'.toByte, "not a BMP")
    buf.getInt; buf.getInt
    val dataOffset = buf.getInt
    val dibLen = buf.getInt
    require(dibLen >= 40, s"unsupported DIB header length $dibLen")
    val width = buf.getInt; val height = buf.getInt
    val planes = buf.getShort; val bpp = buf.getShort
    val compression = buf.getInt
    require(width > 0 && height > 0, s"bad geometry ${width}x$height")
    require(planes == 1 && bpp == 24 && compression == 0,
      s"unsupported BMP planes=$planes bpp=$bpp compression=$compression")
    val stride = rowStride(width)
    require(bytes.length >= dataOffset + stride * height,
      s"pixel data truncated: need ${dataOffset + stride * height}")
    val gray = new Array[Byte](width * height)
    var y = 0
    while (y < height) {
      val rowOff = dataOffset + (height - 1 - y) * stride // bottom-up
      var x = 0
      while (x < width) {
        val b = bytes(rowOff + x * 3) & 0xff
        val g = bytes(rowOff + x * 3 + 1) & 0xff
        val r = bytes(rowOff + x * 3 + 2) & 0xff
        gray(y * width + x) = ((77 * r + 150 * g + 29 * b) >> 8).toByte
        x += 1
      }
      y += 1
    }
    (width, height, gray)
  }

  // ------------------------------------------------ JPEG / PNG (pure JDK)

  /** Magic-byte container sniff for image payloads (public signatures:
    * BMP "BM", PNG \x89PNG, JPEG FF D8 FF). */
  def imageFormat(bytes: Array[Byte]): String =
    if (bytes.length >= 2 && bytes(0) == 'B'.toByte &&
      bytes(1) == 'M'.toByte) "bmp"
    else if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 &&
      bytes(1) == 'P'.toByte && bytes(2) == 'N'.toByte &&
      bytes(3) == 'G'.toByte) "png"
    else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff) "jpeg"
    else "unknown"

  /** Format-dispatched image decode to (width, height, top-down
    * grayscale): BMP through the hand-rolled container parser above;
    * PNG/JPEG through the JDK's `javax.imageio` (offline, no native
    * deps — the real-corpus formats the dedup path must accept). All
    * three routes share ONE luminance formula (77R + 150G + 29B) >> 8,
    * so a pixel-identical image hashes identically whatever container
    * it arrived in (and a TYPE_BYTE_GRAY PNG round-trips gray values
    * bit-exactly: r = g = b ⇒ the formula collapses to (256·g) >> 8 =
    * g). Throws IllegalArgumentException on malformed/unknown input —
    * the established MediaCodec contract. */
  def decodeImage(bytes: Array[Byte]): (Int, Int, Array[Byte]) =
    imageFormat(bytes) match {
      case "bmp" => decodeBmp(bytes)
      case "png" | "jpeg" =>
        val img = try {
          javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        } catch {
          case e: java.io.IOException =>
            throw new IllegalArgumentException(
              s"undecodable image payload: ${e.getMessage}")
        }
        require(img != null, "undecodable image payload")
        val w = img.getWidth; val h = img.getHeight
        val gray = new Array[Byte](w * h)
        val raster = img.getRaster
        val singleBand = raster.getNumBands == 1
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            gray(y * w + x) = if (singleBand) {
              // grayscale container: the raw sample IS the gray value
              // (getRGB would route it through a gamma-correcting
              // gray→sRGB transform and break bit-exact roundtrips)
              raster.getSample(x, y, 0).toByte
            } else {
              val rgb = img.getRGB(x, y)
              val r = (rgb >> 16) & 0xff
              val g = (rgb >> 8) & 0xff
              val b = rgb & 0xff
              ((77 * r + 150 * g + 29 * b) >> 8).toByte
            }
            x += 1
          }
          y += 1
        }
        (w, h, gray)
      case f => throw new IllegalArgumentException(
        s"unsupported image format: $f")
    }

  /** Encode top-down grayscale pixels as PNG (lossless) or JPEG (lossy,
    * writer-default quality) via the JDK writers — fixture/export
    * helpers for the real-format dedup path. */
  def encodePng(width: Int, height: Int, gray: Array[Byte]): Array[Byte] =
    encodeViaImageIo(width, height, gray, "png")

  def encodeJpeg(width: Int, height: Int, gray: Array[Byte]): Array[Byte] =
    encodeViaImageIo(width, height, gray, "jpg")

  private def encodeViaImageIo(width: Int, height: Int, gray: Array[Byte],
      fmt: String): Array[Byte] = {
    require(gray.length == width * height,
      s"pixel buffer ${gray.length} != ${width}x$height")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, width, height, gray)
    val out = new java.io.ByteArrayOutputStream()
    val ok = javax.imageio.ImageIO.write(img, fmt, out)
    require(ok, s"no JDK image writer for $fmt")
    out.toByteArray
  }
}
