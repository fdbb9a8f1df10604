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

  /** (doc_id, simhash) table with a deliberate exchange between token
    * hashing and the bit-vote fold: HOFs run interpreted, and CollapseProject
    * would otherwise inline the split+xxhash64 pipeline into all 64 vote
    * lambdas, re-tokenizing the document 64×. The repartition materializes
    * the per-token hash array once; the vote fold then reads plain data.
    */
  def simhashTable(docs: org.apache.spark.sql.DataFrame,
                   idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val hashed = docs.select(
      col(idCol).as("doc_id"),
      transform(split(col(textCol), " "), t => xxhash64(t)).as("token_hashes"))
      .repartition(32, col("doc_id"))
    val h = col("token_hashes")
    val votes = transform(sequence(lit(0), lit(63)), j =>
      aggregate(h, lit(0L), (acc, th) =>
        acc + when(th.bitwiseAND(element_at(pow2, j + 1)) =!= 0, 1L).otherwise(-1L)))
    hashed.select(col("doc_id"),
      aggregate(sequence(lit(0), lit(63)), lit(0L), (acc, j) =>
        acc + when(element_at(votes, j + 1) > 0, element_at(pow2, j + 1)).otherwise(0L))
        .as("simhash"))
  }
}
