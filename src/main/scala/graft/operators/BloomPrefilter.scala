package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{BinaryType, LongType}

/** Semi-join reduction with a Bloom filter — the explicit form of the
  * runtime-filter pattern.
  *
  * Build a Bloom filter over the build side's join keys (one pass,
  * mergeable, fixed size), broadcast it, and pre-filter the probe side
  * BEFORE the join's exchange. Bloom filters have no false negatives, so
  * the subsequent real join keeps the result exact; false positives only
  * cost shuffled rows that the join then drops.
  *
  * Why it matters at 100 TB: when the build side is selective (say 1% of
  * orders are "big"), the probe side's non-matching rows — the other ~99%
  * — die at the scan, ahead of the shuffle, for the price of a broadcast
  * measured in megabytes. Spark's own runtime bloom filter
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`, on by default)
  * injects the same shape automatically when size thresholds and a
  * selective build-side filter line up; this operator is the explicit
  * version with control over expectedN/fpp, usable regardless of
  * optimizer thresholds. The per-row probe is Spark's own codegen'd
  * `BloomFilterMightContain` expression (the one behind the runtime
  * filter), fed the serialized filter as a binary literal — the probe
  * stays inside WholeStageCodegen, no UDF boundary on the hot path.
  */
object BloomPrefilter {

  /** Probe-side rows whose `probeKey` (long) might match `buildKey`;
    * followed by a real left-semi join for exactness. The build key is
    * aliased to a reserved name so the join condition stays unambiguous
    * even when probeKey == buildKey (the common call shape).
    */
  def semiJoin(probe: DataFrame, probeKey: String,
               build: DataFrame, buildKey: String,
               expectedN: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val prefiltered =
      prefilterOnly(probe, probeKey, build, buildKey, expectedN, fpp)
    val buildKeys = build.select(col(buildKey).as("__bloom_build_key")).distinct()
    prefiltered.join(buildKeys,
      prefiltered(probeKey) === buildKeys("__bloom_build_key"), "left_semi")
  }

  /** Just the prefilter stage (no verifying join) — for measuring the
    * reduction factor; may contain false positives at ~fpp rate.
    */
  def prefilterOnly(probe: DataFrame, probeKey: String,
                    build: DataFrame, buildKey: String,
                    expectedN: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val bf = build.stat.bloomFilter(buildKey, expectedN, fpp)
    // Same wire format both ways: stat.bloomFilter and BloomFilterMightContain
    // share org.apache.spark.util.sketch.BloomFilter (putLong/mightContainLong
    // on the Murmur3 long hash), so the serialized bytes round-trip exactly.
    val bytes = { val bos = new ByteArrayOutputStream(); bf.writeTo(bos); bos.toByteArray }
    val mightContain = GraftBridge.column(BloomFilterMightContain(
      Literal.create(bytes, BinaryType),
      GraftBridge.expression(col(probeKey).cast(LongType))))
    probe.where(col(probeKey).isNotNull && mightContain)
  }
}
