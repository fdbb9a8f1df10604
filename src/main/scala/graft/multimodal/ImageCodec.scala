package graft.multimodal

/** Pure-JVM image codec: a complete header+pixel parse for three raster
  * formats that need no codec library — the offline container constraint
  * bars external jars, and a JDK-only parse is fully deterministic and
  * auditable (javax.imageio would work here too, but its output can vary
  * by JDK build for some formats; a hand parse cannot).
  *
  *  - PPM P6 (binary RGB, maxval 255 — the netpbm spec: "P6", then
  *    whitespace-separated width/height/maxval with '#' comments allowed,
  *    then ONE whitespace byte, then raw row-major RGB triples)
  *  - BMP 24bpp uncompressed (BITMAPINFOHEADER or larger, BI_RGB,
  *    bottom-up or top-down rows, 4-byte row padding, BGR byte order)
  *  - PNG 8-bit RGB/RGBA non-interlaced (the dominant web-export profile;
  *    zlib via JDK `Inflater`, per-row filters 0–4, chunk CRCs verified)
  *
  * `decode` dispatches on the payload's magic bytes and returns None for
  * anything it cannot parse COMPLETELY — a truncated pixel array or an
  * unsupported bpp/compression falls back to the caller's non-image path
  * rather than producing garbage features.
  *
  * All functions are pure and driver/executor-safe; the multimodal
  * pipeline calls them inside `mapPartitions` so payload batches decode
  * partition-parallel with zero per-row task overhead.
  */
object ImageCodec {

  /** Decoded raster: row-major RGB, 3 bytes per pixel, top-down. */
  final case class Image(width: Int, height: Int, rgb: Array[Byte])

  private val PngSig: Array[Int] = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  /** Magic-byte sniff; None = not a format this codec handles. */
  def detect(payload: Array[Byte]): Option[String] =
    if (payload.length >= 2 && payload(0) == 'P' && payload(1) == '6') Some("ppm")
    else if (payload.length >= 2 && payload(0) == 'B' && payload(1) == 'M') Some("bmp")
    else if (payload.length >= 8 &&
      (0 until 8).forall(k => (payload(k) & 0xff) == PngSig(k))) Some("png")
    else None

  def decode(payload: Array[Byte]): Option[Image] = detect(payload) match {
    case Some("ppm") => decodePpm(payload)
    case Some("bmp") => decodeBmp(payload)
    case Some("png") => decodePng(payload)
    case _ => None
  }

  /** PPM P6 parse. Accepts '#' comments and arbitrary whitespace between
    * header tokens (the netpbm grammar); requires maxval 255 (the 2-byte-
    * per-sample >255 variant is out of scope) and a complete pixel array.
    */
  def decodePpm(b: Array[Byte]): Option[Image] = {
    var i = 2
    def skipWsAndComments(): Unit = {
      var done = false
      while (!done && i < b.length) {
        val c = (b(i) & 0xff).toChar
        if (c == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else if (c.isWhitespace) i += 1
        else done = true
      }
    }
    def readInt(): Int = { // -1 = parse failure
      skipWsAndComments()
      val start = i
      var v = 0L
      while (i < b.length && b(i) >= '0' && b(i) <= '9' && v <= Int.MaxValue) {
        v = v * 10 + (b(i) - '0'); i += 1
      }
      if (i == start || v > Int.MaxValue) -1 else v.toInt
    }
    val w = readInt()
    val h = readInt()
    val maxv = readInt()
    if (w <= 0 || h <= 0 || maxv != 255) return None
    // exactly one whitespace byte separates maxval from the pixel bytes
    if (i >= b.length || !(b(i) & 0xff).toChar.isWhitespace) return None
    i += 1
    // pixel count FIRST, then ×3: `3L * w * h` overflows Long when w and h
    // are both near Int.MaxValue (product ~1.4e19 > Long.MaxValue), and the
    // wrapped negative value passes both guards below — w.toLong * h is
    // bounded by ~4.6e18 and cannot wrap
    val pix = w.toLong * h
    if (pix > (Int.MaxValue - i) / 3 || b.length - i < 3 * pix) return None
    val need = (3 * pix).toInt
    Some(Image(w, h, java.util.Arrays.copyOfRange(b, i, i + need)))
  }

  /** BMP 24bpp BI_RGB parse: little-endian header fields, BGR pixel order,
    * rows padded to 4 bytes, bottom-up unless height is negative.
    */
  def decodeBmp(b: Array[Byte]): Option[Image] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    def u16(off: Int): Int = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    def i32(off: Int): Int = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    val dataOff = i32(10)
    val hdrSize = i32(14)
    val w = i32(18)
    val hRaw = i32(22)
    val planes = u16(26)
    val bpp = u16(28)
    val compression = i32(30)
    // hRaw == Int.MinValue would make math.abs return a NEGATIVE height
    // and every guard below silently pass — decode() runs on arbitrary
    // magic-sniffed corpus bytes, so a hostile/corrupt header must fall
    // back (None), never crash the task
    if (hdrSize < 40 || w <= 0 || hRaw == 0 || hRaw == Int.MinValue ||
      planes != 1 || bpp != 24 || compression != 0) return None
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    // row size in LONG: w near Int.MaxValue/3 overflows w*3+3 in int,
    // producing a negative rowSize that bypasses the length check and
    // then a ~2 GB allocation + out-of-bounds read
    val rowSizeL = ((w.toLong * 3 + 3) / 4) * 4
    if (dataOff < 54 || dataOff.toLong + rowSizeL * h > b.length ||
      3L * w * h > Int.MaxValue) return None
    val rowSize = rowSizeL.toInt
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      val base = dataOff + srcRow * rowSize
      var x = 0
      while (x < w) {
        val d = (y * w + x) * 3
        rgb(d) = b(base + x * 3 + 2)     // R (stored BGR)
        rgb(d + 1) = b(base + x * 3 + 1) // G
        rgb(d + 2) = b(base + x * 3)     // B
        x += 1
      }
      y += 1
    }
    Some(Image(w, h, rgb))
  }

  /** PNG parse — the first COMPRESSED format, still pure JVM: the zlib
    * stream decodes via JDK-bundled `java.util.zip.Inflater`. Scope is the
    * dominant web-export profile: 8-bit, color type 2 (RGB) or 6 (RGBA,
    * alpha dropped — features are RGB channel stats), non-interlaced,
    * filter method 0 with per-row filter types 0–4 (None/Sub/Up/Average/
    * Paeth, reconstructed per the PNG spec §4.5.2/RFC 2083). Every chunk
    * CRC is verified (`java.util.zip.CRC32` over type+data) and the
    * inflated byte count must equal the scanline total EXACTLY — a
    * truncated or over-long stream, a bad CRC, palette/16-bit/interlaced
    * images, and hostile dimensions all return None per the codec
    * contract (parse completely or fall back, never crash).
    */
  def decodePng(b: Array[Byte]): Option[Image] = {
    if (b.length < 8 + 12 + 13 ||
      (0 until 8).exists(k => (b(k) & 0xff) != PngSig(k))) return None
    def i32(off: Int): Int = ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
    var i = 8
    var w = 0; var h = 0; var channels = 0
    var seenIhdr = false; var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!seenIend) {
      if (i + 8 > b.length) return None
      val len = i32(i)
      if (len < 0 || i + 12L + len > b.length) return None
      val crc = new java.util.zip.CRC32()
      crc.update(b, i + 4, 4 + len)
      if (crc.getValue.toInt != i32(i + 8 + len)) return None
      val typ = new String(b, i + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      typ match {
        case "IHDR" =>
          if (seenIhdr || len != 13) return None
          seenIhdr = true
          w = i32(i + 8); h = i32(i + 12)
          val bitDepth = b(i + 16) & 0xff
          val colorType = b(i + 17) & 0xff
          val comp = b(i + 18) & 0xff
          val filterMethod = b(i + 19) & 0xff
          val interlace = b(i + 20) & 0xff
          if (w <= 0 || h <= 0 || bitDepth != 8 || comp != 0 ||
            filterMethod != 0 || interlace != 0) return None
          channels = colorType match {
            case 2 => 3
            case 6 => 4
            case _ => return None // palette/gray out of scope
          }
          // both the raw scanline buffer ((w*ch+1)*h) and the packed RGB
          // output (3*w*h) must fit an int-indexed array; pixel count
          // first so the product cannot wrap (w,h ≤ 2^31-1 each)
          val pix = w.toLong * h
          if (pix > Int.MaxValue / 4 ||
            (w.toLong * channels + 1) * h > Int.MaxValue) return None
        case "IDAT" =>
          if (!seenIhdr) return None
          idat.write(b, i + 8, len)
        case "IEND" =>
          if (len != 0) return None
          seenIend = true
        case _ => () // ancillary chunks (tEXt, pHYs, …) skipped, CRC still checked
      }
      i += 12 + len
    }
    if (!seenIhdr || idat.size == 0) return None
    val bpp = channels
    val rowBytes = w * channels
    val rawLen = (rowBytes + 1) * h
    val raw = new Array[Byte](rawLen)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    try {
      var off = 0
      while (off < rawLen && !inf.finished()) {
        val n = inf.inflate(raw, off, rawLen - off)
        if (n == 0 && inf.needsInput()) return None // truncated zlib stream
        off += n
      }
      if (off != rawLen) return None
      // strict: the stream must END at the scanline total — extra
      // decompressed bytes mean the header lied about the dimensions
      if (!inf.finished()) {
        val spill = new Array[Byte](1)
        if (inf.inflate(spill, 0, 1) > 0 || !inf.finished()) return None
      }
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    // un-filter in place, row by row (each row: 1 filter-type byte + pixels)
    var y = 0
    while (y < h) {
      val rowOff = y * (rowBytes + 1)
      val cur = rowOff + 1
      val prev = cur - (rowBytes + 1)
      (raw(rowOff) & 0xff) match {
        case 0 => // None
        case 1 => // Sub
          var x = bpp
          while (x < rowBytes) { raw(cur + x) = (raw(cur + x) + raw(cur + x - bpp)).toByte; x += 1 }
        case 2 => // Up
          if (y > 0) {
            var x = 0
            while (x < rowBytes) { raw(cur + x) = (raw(cur + x) + raw(prev + x)).toByte; x += 1 }
          }
        case 3 => // Average
          var x = 0
          while (x < rowBytes) {
            val a = if (x >= bpp) raw(cur + x - bpp) & 0xff else 0
            val u = if (y > 0) raw(prev + x) & 0xff else 0
            raw(cur + x) = (raw(cur + x) + ((a + u) >> 1)).toByte; x += 1
          }
        case 4 => // Paeth
          var x = 0
          while (x < rowBytes) {
            val a = if (x >= bpp) raw(cur + x - bpp) & 0xff else 0
            val u = if (y > 0) raw(prev + x) & 0xff else 0
            val c = if (x >= bpp && y > 0) raw(prev + x - bpp) & 0xff else 0
            val p = a + u - c
            val pa = math.abs(p - a); val pb = math.abs(p - u); val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) u else c
            raw(cur + x) = (raw(cur + x) + pred).toByte; x += 1
          }
        case _ => return None // filter types 5+ are not in the spec
      }
      y += 1
    }
    // pack scanlines to row-major RGB (RGBA drops alpha)
    val rgb = new Array[Byte](w * h * 3)
    y = 0
    while (y < h) {
      val src = y * (rowBytes + 1) + 1
      var x = 0
      while (x < w) {
        val s = src + x * channels
        val d = (y * w + x) * 3
        rgb(d) = raw(s); rgb(d + 1) = raw(s + 1); rgb(d + 2) = raw(s + 2)
        x += 1
      }
      y += 1
    }
    Some(Image(w, h, rgb))
  }

  /** Minimal P6 re-encode (header + raw RGB) — resize's output format. */
  def encodePpm(img: Image): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + img.rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.rgb, 0, out, header.length, img.rgb.length)
    out
  }

  /** Nearest-neighbor rescale — the deterministic sampling resize (source
    * pixel = floor(dst * src/dst), the standard NN mapping).
    */
  def resizeNearest(img: Image, targetW: Int, targetH: Int): Image = {
    require(targetW > 0 && targetH > 0, "target dims must be positive")
    val out = new Array[Byte](targetW * targetH * 3)
    var y = 0
    while (y < targetH) {
      val sy = (y.toLong * img.height / targetH).toInt
      var x = 0
      while (x < targetW) {
        val sx = (x.toLong * img.width / targetW).toInt
        val s = (sy * img.width + sx) * 3
        val d = (y * targetW + x) * 3
        out(d) = img.rgb(s); out(d + 1) = img.rgb(s + 1); out(d + 2) = img.rgb(s + 2)
        x += 1
      }
      y += 1
    }
    Image(targetW, targetH, out)
  }

  /** Per-channel mean ×1000, floored — integer-exact channel stats (the
    * oracle-able form: no float compare can drift).
    */
  def channelMeansMilli(img: Image): (Long, Long, Long) = {
    val n = img.width.toLong * img.height
    if (n == 0) return (0L, 0L, 0L)
    var r = 0L; var g = 0L; var b = 0L
    var i = 0
    while (i < img.rgb.length) {
      r += img.rgb(i) & 0xff; g += img.rgb(i + 1) & 0xff; b += img.rgb(i + 2) & 0xff
      i += 3
    }
    (r * 1000L / n, g * 1000L / n, b * 1000L / n)
  }

  /** The multimodal suite's rolling checksum (sum = sum*31 + byte). */
  def checksum(bytes: Array[Byte]): Long = {
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum = sum * 31 + (bytes(i) & 0xff); i += 1 }
    sum
  }
}
