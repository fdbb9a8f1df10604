package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting — the manual fallback when AQE's runtime
  * skew-join splitting isn't available (e.g. the skewed side feeds a
  * non-AQE-eligible operator, or the skew is known ahead of time).
  *
  * The skewed (large) side gets a random-but-deterministic salt in
  * [0, salts); the small side is replicated `salts` times. The join key
  * becomes (key, salt), so a hot key's rows spread over `salts` reducers
  * instead of hammering one. Replication cost is |small| × salts — use for
  * large⋈small joins where the small side is modest but above the broadcast
  * threshold.
  *
  * Salt is derived from stable row content (xxhash64 of the key columns plus
  * a per-row uniquifier expression), not rand(), so retries/speculative
  * tasks produce identical output.
  */
object SaltedJoin {

  def saltedEquiJoin(large: DataFrame, largeKey: Column,
                     small: DataFrame, smallKey: Column,
                     salts: Int, uniquifier: Column): DataFrame = {
    val salted = large
      .withColumn("_salt", pmod(xxhash64(largeKey, uniquifier), lit(salts)).cast("int"))
    val replicated = small
      .withColumn("_salt", explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated,
      salted("_salt") === replicated("_salt") && largeKey === smallKey)
      .drop("_salt")
  }
}
