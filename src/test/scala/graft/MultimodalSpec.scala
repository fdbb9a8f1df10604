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

  test("extractFeatures is deterministic and consistent with the stub decoder") {
    val media = Multimodal.asMediaTable(Tables.documents(spark, TestSpark.sf0001))
    val f1 = Multimodal.extractFeatures(spark, media).collect().sortBy(_.doc_id)
    val f2 = Multimodal.extractFeatures(spark, media).collect().sortBy(_.doc_id)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.forall(f => f.width >= 16 && f.width < 80))
    // spot-check checksum against a driver-side recompute
    val doc0 = Tables.documents(spark, TestSpark.sf0001)
      .where("doc_id = 0").collect()(0).getAs[String]("text")
    val (w, h, sum) = Multimodal.StubDecoder.decode(doc0.getBytes("UTF-8"))
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
