package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SimHash document fingerprinting with built-in expressions only (no UDF):
  * per-token 64-bit hash (xxhash64), per-bit signed vote, sign → bit.
  *
  * The per-document computation is a pure map — at 100 TB it rides inside
  * whole-stage codegen with zero shuffles; near-dup candidates are then found
  * by joining on signature bands (MinHash LSH is the primary near-dup path,
  * SimHash the cheap 8-byte fingerprint).
  *
  * The functions API only exposes literal shift amounts, so variable 2^j is
  * looked up from a 64-entry power table instead of shiftleft(1, j).
  */
object SimHash {

  private val pow2: Column = array((0 until 64).map(j => lit(1L << j)): _*)

  /** 64-bit simhash of a token array, as a Long. */
  def simhash64(tokens: Column): Column = {
    val hashes = transform(tokens, t => xxhash64(t))
    // votes(j) = sum over tokens of +-1 depending on bit j of the token hash
    val votes = transform(sequence(lit(0), lit(63)), j =>
      aggregate(hashes, lit(0L), (acc, h) =>
        acc + when(h.bitwiseAND(element_at(pow2, j + 1)) =!= 0, 1L).otherwise(-1L)))
    // fold bits: sum of 2^j where votes(j) > 0
    aggregate(sequence(lit(0), lit(63)), lit(0L), (acc, j) =>
      acc + when(element_at(votes, j + 1) > 0, element_at(pow2, j + 1)).otherwise(0L))
  }

  /** Hamming distance between two simhash Longs via bit-count of XOR. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** 64-bit FNV-1a over UTF-8 bytes — local token hash for the typed path. */
  def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes("UTF-8")
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Local simhash of a token array (typed path). */
  def simhashLocal(tokens: Array[String]): Long = {
    val votes = new Array[Int](64)
    var t = 0
    while (t < tokens.length) {
      val h = fnv64(tokens(t))
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) != 0L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      t += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  /** (doc_id, simhash) table via one typed mapPartitions pass.
    *
    * The expression form (`simhash64`) exists for composition in small
    * per-row contexts, but as a table-wide stage it is interpreted (HOFs
    * never enter codegen) and CollapseProject inlines the tokenize+hash
    * pipeline into all 64 vote lambdas — measured 23.7s for 5000 docs. The
    * typed pass is a pure narrow map (zero shuffles at any scale): ~0.3s.
    */
  def simhashTable(docs: org.apache.spark.sql.DataFrame,
                   idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast(org.apache.spark.sql.types.LongType), col(textCol))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        (id, simhashLocal(if (text == null) Array.empty[String] else text.split(" ")))
      })
      .toDF("doc_id", "simhash")
  }
}
