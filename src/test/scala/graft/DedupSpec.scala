package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.{MinHash, SimHash}

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bend"), // near-dup of 0
    (2L, "completely different words about spark query engines and shuffles"),
    (3L, "the quick brown fox jumps over the lazy dog near the river bank"), // exact dup of 0
    (4L, "another unrelated document that talks about parquet column pruning")
  ).toDF("doc_id", "text")

  test("MinHash LSH finds exact and near duplicates, skips unrelated") {
    val pairs = MinHash.nearDuplicates(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L))) // exact dup: jaccard 1.0
    assert(pairs.contains((0L, 1L)) || pairs.contains((1L, 3L))) // near dup
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("MinHash signature is deterministic and has NumHashes entries") {
    val texts = docs.orderBy("doc_id").collect().map(_.getString(1))
    val sigs = texts.map(t => MinHash.signatureOf(MinHash.shinglesOf(t.split(" "), 3)))
    assert(sigs.forall(_.length == MinHash.NumHashes))
    assert(sigs(0).toSeq == sigs(3).toSeq) // identical text → identical signature
    assert(sigs(0).toSeq != sigs(2).toSeq)
    // signatures() Dataset path agrees with the local computation
    val ds = MinHash.signatures(docs, "doc_id", "text", 3)
      .collect().sortBy(_.doc_id)
    assert(ds(0).bands.toSeq == MinHash.bandsOf(sigs(0)).toSeq)
  }

  test("SimHash: identical docs equal; near-dups closer than unrelated docs") {
    val sh = docs.select(col("doc_id"),
      SimHash.simhash64(split(col("text"), " ")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) == sh(3L))
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(0L), sh(1L)) < ham(sh(0L), sh(2L)))
    assert(ham(sh(0L), sh(1L)) < ham(sh(0L), sh(4L)))
  }

  test("SimHash.hamming column matches bitCount of xor") {
    val out = Seq((3L, 1L)).toDF("a", "b")
      .select(SimHash.hamming(col("a"), col("b"))).collect()(0).getInt(0)
    assert(out == java.lang.Long.bitCount(3L ^ 1L))
  }

  test("SignatureUnion: merged signatures == signature of the shingle-set union") {
    // the MinHash mergeability property, end to end through the Aggregator
    val texts = docs.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val sigDf = MinHash.signatures(docs, "doc_id", "text", 3)
      .map(ds => (ds.doc_id, MinHash.signatureOf(ds.shingles).toSeq))
      .toDF("doc_id", "sig")
    val merged = org.apache.spark.sql.functions.udaf(MinHash.SignatureUnion)
    val got = sigDf.agg(merged(col("sig"))).collect()(0).getSeq[Long](0)
    val unionShingles = texts.values.toArray
      .flatMap(t => MinHash.shinglesOf(t.split(" "), 3)).distinct
    assert(got == MinHash.signatureOf(unionShingles).toSeq)
  }

  test("dd_cluster_lsh refines dd_cluster: same-LSH-cluster implies same-exact-cluster") {
    val d = TestSpark.sf0001
    val exact = graft.queries.QueryCatalog.byName("dd_cluster")
      .build(spark, d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lsh = graft.queries.QueryCatalog.byName("dd_cluster_lsh")
      .build(spark, d).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lsh.keySet == exact.keySet)
    // LSH can only MISS edges (finer clustering), never invent them: docs
    // the LSH path clusters together must share an exact cluster
    lsh.groupBy(_._2).values.foreach { members =>
      val exactComps = members.map { case (doc, _) => exact(doc) }.toSet
      assert(exactComps.size == 1,
        s"LSH cluster spans exact clusters: $members -> $exactComps")
    }
    // and it must do real work: some non-singleton clusters exist
    assert(lsh.groupBy(_._2).values.exists(_.size > 1))
  }

  test("SignatureUnion is partitioning-independent (associative merge)") {
    val sigDf = MinHash.signatures(docs, "doc_id", "text", 3)
      .map(ds => (ds.doc_id, MinHash.signatureOf(ds.shingles).toSeq))
      .toDF("doc_id", "sig")
    val merged = org.apache.spark.sql.functions.udaf(MinHash.SignatureUnion)
    val one = sigDf.repartition(1).agg(merged(col("sig"))).collect()(0).getSeq[Long](0)
    val many = sigDf.repartition(7).agg(merged(col("sig"))).collect()(0).getSeq[Long](0)
    assert(one == many)
  }
}
