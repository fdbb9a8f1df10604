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
      (3L, "just some plain text payload".getBytes("UTF-8"), "text/plain"))
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
