package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Dependency-free decoders/encoders for the two classic public media
  * byte layouts that need no native library:
  *
  *  - BMP (Windows bitmap, BITMAPINFOHEADER + 24-bit uncompressed
  *    BI_RGB): 14-byte file header (`BM`, file size, pixel-data
  *    offset), 40-byte DIB header (width, height, planes=1, bpp,
  *    compression), then bottom-up rows of BGR triplets padded to
  *    4-byte boundaries. Negative DIB height means top-down.
  *  - WAV (RIFF/WAVE, PCM integer 16-bit): `RIFF <size> WAVE` then a
  *    chunk walk — `fmt ` (format tag 1 = PCM, channels, sample rate,
  *    bits per sample) and `data` (interleaved little-endian i16
  *    samples); odd-sized chunks carry one pad byte per the RIFF spec.
  *
  * Same philosophy as [[NetcdfClassic]]: a real parser of a public
  * spec, byte-for-byte, so the multimodal pipeline decodes actual
  * pixels/samples instead of stubbing — formats that genuinely need
  * codecs (JPEG/PNG/MP4/Opus) stay behind the absent-library boundary.
  * Everything is little-endian ([[ByteOrder.LITTLE_ENDIAN]]).
  */
object MediaCodec {

  /** Decoded bitmap: row-major TOP-DOWN pixels packed 0xRRGGBB. */
  final case class Bmp(width: Int, height: Int, pixels: Array[Int])

  /** Decoded PCM audio: interleaved 16-bit samples. */
  final case class Wav(sampleRate: Int, channels: Int, samples: Array[Short])

  def isBmp(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M'

  def isWav(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'

  /** Parse a 24-bit uncompressed BMP (both bottom-up and top-down). */
  def decodeBmp(bytes: Array[Byte]): Bmp = {
    require(bytes.length >= 54, s"BMP truncated: ${bytes.length} bytes")
    require(isBmp(bytes), "not a BMP (missing 'BM' magic)")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOffset = buf.getInt(10)
    // a negative offset would pass the truncation check below (it
    // shrinks the right-hand side) and then index out of bounds
    require(dataOffset >= 54 && dataOffset <= bytes.length,
      s"bad pixel-data offset $dataOffset")
    val dibSize = buf.getInt(14)
    require(dibSize >= 40, s"unsupported DIB header size $dibSize (need BITMAPINFOHEADER+)")
    val width = buf.getInt(18)
    val rawHeight = buf.getInt(22)
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    require(width > 0 && height > 0, s"bad dimensions ${width}x$rawHeight")
    val planes = buf.getShort(26)
    val bpp = buf.getShort(28)
    val compression = buf.getInt(30)
    require(planes == 1, s"planes must be 1, got $planes")
    require(bpp == 24 && compression == 0,
      s"only 24-bit uncompressed BI_RGB is supported, got bpp=$bpp compression=$compression")
    // Long arithmetic throughout: width near 2^31/3 overflows `width*3`
    // to a NEGATIVE Int, which would flip the truncation require into a
    // vacuous check and then blow up (NegativeArraySizeException or a
    // multi-GB allocation) on a crafted header. Once this bound holds,
    // rowSizeL*height ≤ bytes.length ≤ Int.MaxValue and rowSizeL ≥
    // 3*width, so width*height ≤ bytes.length/3 — the pixel allocation
    // below is safe without a separate dimension cap.
    val rowSizeL = ((width.toLong * 3 + 3) / 4) * 4 // rows pad to 4-byte boundary
    require(bytes.length.toLong >= dataOffset.toLong + rowSizeL * height,
      s"pixel array truncated: need ${dataOffset.toLong + rowSizeL * height}, have ${bytes.length}")
    val rowSize = rowSizeL.toInt
    val px = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y
      var base = dataOffset + srcRow * rowSize
      var x = 0
      while (x < width) {
        val b = bytes(base) & 0xff
        val g = bytes(base + 1) & 0xff
        val r = bytes(base + 2) & 0xff
        px(y * width + x) = (r << 16) | (g << 8) | b
        base += 3
        x += 1
      }
      y += 1
    }
    Bmp(width, height, px)
  }

  /** Write a 24-bit BI_RGB BMP (bottom-up) from top-down 0xRRGGBB pixels. */
  def encodeBmp(width: Int, height: Int, pixels: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(pixels.length == width * height,
      s"need ${width * height} pixels, got ${pixels.length}")
    val rowSize = ((width * 3 + 3) / 4) * 4
    val dataSize = rowSize * height
    val buf = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + dataSize) // file size
    buf.putInt(0)             // reserved
    buf.putInt(54)            // pixel-data offset
    buf.putInt(40)            // BITMAPINFOHEADER
    buf.putInt(width)
    buf.putInt(height)        // positive → bottom-up
    buf.putShort(1)           // planes
    buf.putShort(24)          // bpp
    buf.putInt(0)             // BI_RGB
    buf.putInt(dataSize)
    buf.putInt(2835).putInt(2835) // 72 dpi in px/metre
    buf.putInt(0).putInt(0)   // palette size / important colors
    var y = height - 1
    while (y >= 0) { // bottom-up
      var x = 0
      while (x < width) {
        val p = pixels(y * width + x)
        buf.put((p & 0xff).toByte)         // B
        buf.put(((p >> 8) & 0xff).toByte)  // G
        buf.put(((p >> 16) & 0xff).toByte) // R
        x += 1
      }
      var pad = rowSize - width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }

  /** Parse a RIFF/WAVE container with integer PCM-16 samples. */
  def decodeWav(bytes: Array[Byte]): Wav = {
    require(isWav(bytes), "not a WAV (missing RIFF/WAVE magic)")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var off = 12
    var sampleRate = -1
    var channels = -1
    var samples: Array[Short] = null
    while (off + 8 <= bytes.length && (sampleRate < 0 || samples == null)) {
      val id = new String(bytes, off, 4, "US-ASCII")
      val size = buf.getInt(off + 4)
      require(size >= 0 && off + 8 + size.toLong <= bytes.length,
        s"chunk '$id' overruns container: size=$size at offset $off")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too small: $size")
          val tag = buf.getShort(off + 8)
          require(tag == 1, s"only PCM (format tag 1) supported, got $tag")
          channels = buf.getShort(off + 10)
          sampleRate = buf.getInt(off + 12)
          val bits = buf.getShort(off + 22)
          require(bits == 16, s"only 16-bit PCM supported, got $bits")
          require(channels > 0 && sampleRate > 0,
            s"bad fmt: channels=$channels rate=$sampleRate")
        case "data" =>
          require(sampleRate > 0, "data chunk before fmt chunk")
          val n = size / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) { out(i) = buf.getShort(off + 8 + 2 * i); i += 1 }
          samples = out
        case _ => () // skip LIST/fact/cue/...
      }
      off += 8 + size + (size & 1) // RIFF pads odd chunks by one byte
    }
    require(samples != null, "no data chunk found")
    Wav(sampleRate, channels, samples)
  }

  /** Write a minimal PCM-16 RIFF/WAVE container. */
  def encodeWav(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0, s"bad fmt: $channels ch @ $sampleRate Hz")
    val dataSize = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
    buf.putInt(36 + dataSize)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII"))
    buf.putInt(16)                 // PCM fmt chunk size
    buf.putShort(1)                // format tag: integer PCM
    buf.putShort(channels.toShort)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * channels * 2) // byte rate
    buf.putShort((channels * 2).toShort)  // block align
    buf.putShort(16)               // bits per sample
    buf.put("data".getBytes("US-ASCII"))
    buf.putInt(dataSize)
    samples.foreach(buf.putShort)
    buf.array()
  }
}
