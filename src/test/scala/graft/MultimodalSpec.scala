package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("media table has binary payload + typed metadata struct") {
    val media = Multimodal.asMediaTable(Tables.documents(spark, TestSpark.sf0001))
    val sch = media.schema
    assert(sch("payload").dataType.typeName == "binary")
    assert(sch("meta").dataType.typeName == "struct")
    val row = media.orderBy("doc_id").limit(1).collect()(0)
    val meta = row.getStruct(row.fieldIndex("meta"))
    assert(meta.getString(0) == "text/plain")
    assert(meta.getLong(1) > 0)
  }

  test("extractFeatures is deterministic and consistent with the fallback decoder on text payloads") {
    val media = Multimodal.asMediaTable(Tables.documents(spark, TestSpark.sf0001))
    val f1 = Multimodal.extractFeatures(spark, media).collect().sortBy(_.doc_id)
    val f2 = Multimodal.extractFeatures(spark, media).collect().sortBy(_.doc_id)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.forall(f => f.width >= 16 && f.width < 80))
    assert(f1.forall(!_.decoded), "text payloads must take the fallback path")
    // spot-check checksum against a driver-side recompute
    val doc0 = Tables.documents(spark, TestSpark.sf0001)
      .where("doc_id = 0").collect()(0).getAs[String]("text")
    val (w, h, sum) = Multimodal.FallbackDecoder.decode(doc0.getBytes("UTF-8"))
    val feat0 = f1.find(_.doc_id == 0L).get
    assert((feat0.width, feat0.height, feat0.checksum) == ((w, h, sum)))
  }

  test("resize is deterministic, one row per doc, dims pinned to target") {
    val media = Multimodal.asMediaTable(Tables.documents(spark, TestSpark.sf0001))
    val r1 = Multimodal.resize(spark, media, 32, 32).collect().sortBy(_.doc_id)
    val r2 = Multimodal.resize(spark, media, 32, 32).collect().sortBy(_.doc_id)
    assert(r1.toSeq == r2.toSeq)
    assert(r1.length == media.count())
    assert(r1.forall(r => r.target_w == 32 && r.target_h == 32 && r.out_bytes >= 0))
  }

  // ---- real codec fixtures: every expected value computed independently ----
  import graft.multimodal.ImageCodec

  /** 4x2 P6 fixture with a comment in the header; pixel bytes follow the
    * tabulated (i*7+3)%256 pattern so expectations are arithmetic, not
    * copied from the codec.
    */
  private lazy val ppmPix = Array.tabulate(4 * 2 * 3)(i => ((i * 7 + 3) % 256).toByte)
  private lazy val ppmBytes =
    "P6\n# fixture comment\n4 2\n255\n".getBytes("US-ASCII") ++ ppmPix

  /** Hand-assembled 24bpp BMP (3x2 → 3 padding bytes per row, exercising
    * both the row-padding math and the bottom-up flip + BGR swap).
    */
  private def bmp24(width: Int, height: Int, rgbTopDown: Array[Byte],
                    topDown: Boolean): Array[Byte] = {
    val rowSize = ((width * 3 + 3) / 4) * 4
    val fileSize = 54 + rowSize * height
    val b = new Array[Byte](fileSize)
    def p16(off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
    }
    def p32(off: Int, v: Int): Unit = { p16(off, v & 0xffff); p16(off + 2, (v >> 16) & 0xffff) }
    b(0) = 'B'; b(1) = 'M'
    p32(2, fileSize); p32(10, 54); p32(14, 40)
    p32(18, width); p32(22, if (topDown) -height else height)
    p16(26, 1); p16(28, 24); p32(30, 0); p32(34, rowSize * height)
    for (f <- 0 until height; x <- 0 until width) {
      val iy = if (topDown) f else height - 1 - f
      val s = (iy * width + x) * 3
      val d = 54 + f * rowSize + x * 3
      b(d) = rgbTopDown(s + 2); b(d + 1) = rgbTopDown(s + 1); b(d + 2) = rgbTopDown(s)
    }
    b
  }
  private lazy val bmpPix = Array.tabulate(3 * 2 * 3)(i => ((i * 11 + 5) % 256).toByte)
  private lazy val bmpBytes = bmp24(3, 2, bmpPix, topDown = false)

  test("ImageCodec.decodePpm: header with comment parses, pixels byte-exact") {
    val img = ImageCodec.decodePpm(ppmBytes).get
    assert(img.width == 4 && img.height == 2)
    assert(img.rgb.toSeq == ppmPix.toSeq)
    // channel means against a plain-collections recompute
    val trips = ppmPix.map(_ & 0xff).grouped(3).toSeq
    val expect = (0 to 2).map(c => trips.map(_(c).toLong).sum * 1000L / trips.size)
    val (mr, mg, mb) = ImageCodec.channelMeansMilli(img)
    assert(Seq(mr, mg, mb) == expect)
    // truncated pixel data and wrong maxval must fail, not garble
    assert(ImageCodec.decodePpm(ppmBytes.dropRight(1)).isEmpty)
    assert(ImageCodec.decodePpm(
      "P6\n4 2\n65535\n".getBytes("US-ASCII") ++ ppmPix ++ ppmPix).isEmpty)
  }

  test("ImageCodec.decodeBmp: bottom-up + top-down + padding all recover the same RGB") {
    val up = ImageCodec.decodeBmp(bmpBytes).get
    assert(up.width == 3 && up.height == 2)
    assert(up.rgb.toSeq == bmpPix.toSeq,
      "bottom-up row flip or BGR swap broke pixel recovery")
    val down = ImageCodec.decodeBmp(bmp24(3, 2, bmpPix, topDown = true)).get
    assert(down.rgb.toSeq == bmpPix.toSeq)
    // non-24bpp and truncated files are rejected
    val bad = bmpBytes.clone(); bad(28) = 8 // bpp=8
    assert(ImageCodec.decodeBmp(bad).isEmpty)
    assert(ImageCodec.decodeBmp(bmpBytes.dropRight(4)).isEmpty)
    // hostile headers must fall back, never crash: decode runs on
    // arbitrary magic-sniffed corpus bytes (code-review r17 finding)
    def patched(off: Int, v: Int): Array[Byte] = {
      val p = bmpBytes.clone()
      p(off) = (v & 0xff).toByte; p(off + 1) = ((v >> 8) & 0xff).toByte
      p(off + 2) = ((v >> 16) & 0xff).toByte; p(off + 3) = ((v >> 24) & 0xff).toByte
      p
    }
    // width near Int.MaxValue/3: w*3+3 overflows int rowSize — guard in long
    assert(ImageCodec.decodeBmp(patched(18, 715827882)).isEmpty)
    // height = Int.MinValue: math.abs stays negative — explicit reject
    assert(ImageCodec.decodeBmp(patched(22, Int.MinValue)).isEmpty)
    // 3*w*h over Int.MaxValue
    assert(ImageCodec.decodeBmp(patched(18, 40000) match {
      case p0 => val p = p0.clone()
        p(22) = (40000 & 0xff).toByte; p(23) = ((40000 >> 8) & 0xff).toByte
        p(24) = 0; p(25) = 0
        p
    }).isEmpty)
  }

  // ---- PNG fixtures: the test encoder applies the FORWARD filters and
  // deflates with JDK Deflater — independent of decodePng's inverse-filter
  // path, so byte-exact recovery is a genuine cross-check ----

  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Int): Unit = {
      out.write(v >>> 24); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    val tb = typ.getBytes("US-ASCII")
    w32(data.length); out.write(tb); out.write(data)
    val crc = new java.util.zip.CRC32()
    crc.update(tb); crc.update(data)
    w32(crc.getValue.toInt)
    out.toByteArray
  }

  /** Build a valid PNG: forward-filter each row by `filterOfRow(y)`, zlib
    * the scanlines, wrap in signature + IHDR + (optionally split) IDAT +
    * a skippable tEXt + IEND, all with correct CRCs.
    */
  private def pngBytes(w: Int, h: Int, channels: Int, pix: Array[Byte],
                       filterOfRow: Int => Int, splitIdat: Boolean = false): Array[Byte] = {
    val rowBytes = w * channels
    val raw = new Array[Byte]((rowBytes + 1) * h)
    for (y <- 0 until h) {
      val ft = filterOfRow(y)
      raw(y * (rowBytes + 1)) = ft.toByte
      for (x <- 0 until rowBytes) {
        val cur = pix(y * rowBytes + x) & 0xff
        val a = if (x >= channels) pix(y * rowBytes + x - channels) & 0xff else 0
        val u = if (y > 0) pix((y - 1) * rowBytes + x) & 0xff else 0
        val c = if (x >= channels && y > 0) pix((y - 1) * rowBytes + x - channels) & 0xff else 0
        val f = ft match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - u
          case 3 => cur - ((a + u) >> 1)
          case 4 =>
            val p = a + u - c
            val pa = math.abs(p - a); val pb = math.abs(p - u); val pc = math.abs(p - c)
            cur - (if (pa <= pb && pa <= pc) a else if (pb <= pc) u else c)
        }
        raw(y * (rowBytes + 1) + 1 + x) = f.toByte
      }
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val zOut = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](512)
    while (!defl.finished()) zOut.write(buf, 0, defl.deflate(buf))
    defl.end()
    val z = zOut.toByteArray
    val ihdr = new Array[Byte](13)
    def p32(off: Int, v: Int): Unit = {
      ihdr(off) = (v >>> 24).toByte; ihdr(off + 1) = ((v >>> 16) & 0xff).toByte
      ihdr(off + 2) = ((v >>> 8) & 0xff).toByte; ihdr(off + 3) = (v & 0xff).toByte
    }
    p32(0, w); p32(4, h)
    ihdr(8) = 8; ihdr(9) = (if (channels == 4) 6 else 2).toByte
    val idatChunks =
      if (splitIdat && z.length >= 2)
        pngChunk("IDAT", z.take(z.length / 2)) ++ pngChunk("IDAT", z.drop(z.length / 2))
      else pngChunk("IDAT", z)
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      pngChunk("IHDR", ihdr) ++
      pngChunk("tEXt", "k v".getBytes("US-ASCII")) ++
      idatChunks ++ pngChunk("IEND", Array.emptyByteArray)
  }

  /** Patch IHDR data byte(s) in an assembled PNG and re-sign the chunk CRC —
    * for hostile-header cases that must get PAST the CRC gate.
    */
  private def patchIhdr(png: Array[Byte])(edit: Array[Byte] => Unit): Array[Byte] = {
    val p = png.clone()
    val data = java.util.Arrays.copyOfRange(p, 16, 29) // IHDR data: 8+4len+4type .. +13
    edit(data)
    System.arraycopy(data, 0, p, 16, 13)
    val crc = new java.util.zip.CRC32()
    crc.update(p, 12, 4 + 13)
    val v = crc.getValue.toInt
    p(29) = (v >>> 24).toByte; p(30) = ((v >>> 16) & 0xff).toByte
    p(31) = ((v >>> 8) & 0xff).toByte; p(32) = (v & 0xff).toByte
    p
  }

  private lazy val pngPix = Array.tabulate(4 * 5 * 3)(i => ((i * 13 + 7) % 256).toByte)
  private lazy val pngRgb = pngBytes(4, 5, 3, pngPix, y => y % 5) // one row per filter type 0–4

  test("ImageCodec.decodePng: all five filter types recover pixels byte-exact") {
    assert(ImageCodec.detect(pngRgb).contains("png"))
    val img = ImageCodec.decode(pngRgb).get
    assert(img.width == 4 && img.height == 5)
    assert(img.rgb.toSeq == pngPix.toSeq,
      "inverse filters (None/Sub/Up/Average/Paeth) must undo the test's forward filters")
    // multi-chunk IDAT concatenates into one zlib stream
    val split = ImageCodec.decodePng(pngBytes(4, 5, 3, pngPix, y => y % 5, splitIdat = true)).get
    assert(split.rgb.toSeq == pngPix.toSeq)
  }

  test("ImageCodec.decodePng: RGBA drops alpha, keeps RGB byte-exact") {
    val rgba = Array.tabulate(3 * 3 * 4)(i => ((i * 17 + 9) % 256).toByte)
    val img = ImageCodec.decodePng(pngBytes(3, 3, 4, rgba, y => (y + 2) % 5)).get
    assert(img.width == 3 && img.height == 3)
    val expectRgb = rgba.grouped(4).flatMap(_.take(3)).toSeq
    assert(img.rgb.toSeq == expectRgb)
  }

  test("ImageCodec.decodePng: corrupt/hostile inputs fall back, never crash") {
    // flipped IDAT byte without re-signing -> CRC gate rejects
    val badCrc = pngRgb.clone()
    val idatOff = { // find IDAT data start
      var i = 8; var at = -1
      while (at < 0) {
        val len = ((badCrc(i) & 0xff) << 24) | ((badCrc(i + 1) & 0xff) << 16) |
          ((badCrc(i + 2) & 0xff) << 8) | (badCrc(i + 3) & 0xff)
        if (new String(badCrc, i + 4, 4, "US-ASCII") == "IDAT") at = i + 8 else i += 12 + len
      }
      at
    }
    badCrc(idatOff) = (badCrc(idatOff) ^ 0x5a).toByte
    assert(ImageCodec.decodePng(badCrc).isEmpty)
    // truncated file
    assert(ImageCodec.decodePng(pngRgb.dropRight(7)).isEmpty)
    // interlaced, palette, and 16-bit profiles are out of scope (CRC re-signed)
    assert(ImageCodec.decodePng(patchIhdr(pngRgb)(d => d(12) = 1)).isEmpty)
    assert(ImageCodec.decodePng(patchIhdr(pngRgb)(d => d(9) = 3)).isEmpty)
    assert(ImageCodec.decodePng(patchIhdr(pngRgb)(d => d(8) = 16)).isEmpty)
    // hostile dimensions: w=h=Int.MaxValue with a VALID crc — the long-math
    // guards must reject before any allocation
    assert(ImageCodec.decodePng(patchIhdr(pngRgb) { d =>
      d(0) = 0x7f; d(1) = 0xff.toByte; d(2) = 0xff.toByte; d(3) = 0xff.toByte
      d(4) = 0x7f; d(5) = 0xff.toByte; d(6) = 0xff.toByte; d(7) = 0xff.toByte
    }).isEmpty)
    // header lies small: h=4 but the stream inflates to 5 rows -> over-long
    // stream must be rejected, not silently truncated
    assert(ImageCodec.decodePng(patchIhdr(pngRgb)(d => d(7) = 4)).isEmpty)
  }

  test("ImageCodec.decodePpm: huge-dimensions header falls back, never overflows") {
    // w=h=Int.MaxValue: 3L*w*h wraps Long past the old guards (ADVICE r17) —
    // the pixel-count-first guard must return None without allocating
    val hostile = "P6\n2147483647 2147483647\n255\n".getBytes("US-ASCII") ++
      Array.fill[Byte](64)(1)
    assert(ImageCodec.decodePpm(hostile).isEmpty)
    assert(ImageCodec.decode(hostile).isEmpty)
  }

  test("ImageCodec.resizeNearest: 4x4 quadrants -> 2x2 picks each quadrant's origin pixel") {
    val colors = Map(
      (0, 0) -> Seq(255, 0, 0), (0, 1) -> Seq(0, 255, 0),
      (1, 0) -> Seq(0, 0, 255), (1, 1) -> Seq(255, 255, 0))
    val rgb = new Array[Byte](4 * 4 * 3)
    for (y <- 0 until 4; x <- 0 until 4) {
      val c = colors((y / 2, x / 2))
      val d = (y * 4 + x) * 3
      rgb(d) = c(0).toByte; rgb(d + 1) = c(1).toByte; rgb(d + 2) = c(2).toByte
    }
    val out = ImageCodec.resizeNearest(ImageCodec.Image(4, 4, rgb), 2, 2)
    // NN mapping floor(dst*4/2): dst (0,0)->(0,0), (0,1)->(0,2), (1,0)->(2,0),
    // (1,1)->(2,2) — each quadrant's top-left pixel, i.e. its color
    val expect = Seq((0, 0), (0, 1), (1, 0), (1, 1)).flatMap(colors(_)).map(_.toByte)
    assert(out.rgb.toSeq == expect)
    // round-trip: encode then decode is identity
    val back = ImageCodec.decodePpm(ImageCodec.encodePpm(out)).get
    assert(back.width == 2 && back.height == 2 && back.rgb.toSeq == out.rgb.toSeq)
  }

  test("extractFeatures + resize run the REAL codec for image payloads through the Spark pipeline") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val s = spark
    import s.implicits._
    val media = Seq(
      (1L, ppmBytes, "image/x-portable-pixmap"),
      (2L, bmpBytes, "image/bmp"),
      (3L, "just some plain text payload".getBytes("UTF-8"), "text/plain"),
      (4L, pngRgb, "image/png"))
      .toDF("doc_id", "payload", "mime")
      .select(col("doc_id"), col("payload"),
        struct(col("mime").as("mime"),
          octet_length(col("payload")).cast(LongType).as("n_bytes")).as("meta"))
    val feats = Multimodal.extractFeatures(spark, media).collect()
      .map(f => f.doc_id -> f).toMap
    assert(feats(1L).decoded && feats(1L).width == 4 && feats(1L).height == 2)
    assert(feats(1L).checksum == ImageCodec.checksum(ppmPix))
    assert(feats(2L).decoded && feats(2L).width == 3 && feats(2L).height == 2)
    assert(feats(2L).checksum == ImageCodec.checksum(bmpPix))
    assert(!feats(3L).decoded, "text payload must fall back")
    assert(feats(4L).decoded && feats(4L).width == 4 && feats(4L).height == 5)
    assert(feats(4L).checksum == ImageCodec.checksum(pngPix))
    // resize: real re-encoded output size (11-byte P6 header + 2x2x3 pixels)
    val resized = Multimodal.resize(spark, media, 2, 2).collect()
      .map(r => r.doc_id -> r).toMap
    assert(resized(1L).out_bytes == 11 + 12,
      s"real PPM re-encode size expected 23, got ${resized(1L).out_bytes}")
    val expectOut = ImageCodec.encodePpm(ImageCodec.resizeNearest(
      ImageCodec.decodePpm(ppmBytes).get, 2, 2))
    assert(resized(1L).sample_checksum == ImageCodec.checksum(expectOut))
    assert(resized(2L).out_bytes == 11 + 12)
  }

  test("sampleFrames keeps every stride-th frame with correct content") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val frames = Multimodal.sampleFrames(docs, frameChars = 64, stride = 4)
      .collect().groupBy(_.getLong(0))
    val texts = docs.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    frames.foreach { case (id, rows) =>
      val text = texts(id)
      val nFrames = math.max(math.ceil(text.length / 64.0).toInt, 1)
      val expectIdx = (0 until nFrames).filter(_ % 4 == 0).map(_.toLong)
      assert(rows.map(_.getLong(1)).sorted.toSeq == expectIdx)
      rows.foreach { r =>
        val i = r.getLong(1).toInt
        val expected = text.slice(i * 64, i * 64 + 64)
        assert(r.getString(2) == expected)
      }
    }
  }
}
