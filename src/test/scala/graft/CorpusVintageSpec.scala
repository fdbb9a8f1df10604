package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-vintage canary (VERDICT r9 item 3).
  *
  * The driver's testdata has shipped `events.ts` in two physical parquet
  * encodings — TIMESTAMP(NANOS, isAdjustedToUTC=0) through round 8, then
  * TIMESTAMP(MICROS, isAdjustedToUTC=0) after the 2026-08-13 regeneration.
  * Round 9 lost 19 queries because the loader assumed the NANOS vintage.
  * `Tables.events` now branches on the dtype it actually read; this spec
  * pins the contract so the NEXT silent regeneration fails here, loudly and
  * specifically, instead of as 79 downstream analysis errors.
  *
  * Contract: whatever the physical encoding, `Tables.events` exposes
  * `ts: TIMESTAMP_NTZ` (micro precision) and `ts_ns: BIGINT` (epoch nanos,
  * = micros×1000 exactly when the source had no sub-micro digits; truncated
  * from the source nanos on the legacy vintage).
  *
  * The live corpus exercises whichever encoding the driver currently writes;
  * `src/test/resources/vintage_nanos/` is a checked-in 8-row NANOS-encoded
  * fixture so the legacy branch stays covered either way.
  */
class CorpusVintageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val nanosFixtureDir =
    getClass.getResource("/vintage_nanos").getPath

  private def assertContract(dir: String, vintage: String): Unit = {
    val df = Tables.events(spark, dir)
    val byName = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(byName("ts") == TimestampNTZType,
      s"[$vintage] events.ts must normalize to TIMESTAMP_NTZ, got ${byName("ts")}")
    assert(byName("ts_ns") == LongType,
      s"[$vintage] events.ts_ns must be BIGINT epoch-nanos, got ${byName("ts_ns")}")
    // ts and ts_ns must agree: ts is exactly ts_ns truncated to micros.
    // timestampdiff against the NTZ epoch literal is session-TZ-independent
    // (a wall-clock difference), so this check holds in any session TZ.
    val bad = df.where(expr(
      "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)" +
        " != ts_ns div 1000")).count()
    assert(bad == 0, s"[$vintage] $bad rows where ts != trunc_micros(ts_ns)")
    assert(df.count() > 0, s"[$vintage] fixture read zero rows")
  }

  test("live corpus: Tables.events normalizes ts/ts_ns regardless of parquet encoding") {
    assertContract(TestSpark.sf0001, "live")
  }

  test("legacy NANOS vintage (checked-in fixture) still reads via nanosAsLong") {
    // the fixture must really be NANOS→Long at the raw reader, or this test
    // would silently stop covering the legacy branch
    val raw = spark.read.parquet(s"$nanosFixtureDir/events.parquet")
    assert(raw.schema("ts").dataType == LongType,
      s"fixture no longer reads as nanos-Long: ${raw.schema("ts").dataType}")
    assertContract(nanosFixtureDir, "nanos-fixture")
    // The semantic unique to the legacy branch: the RAW nanos (with real
    // sub-microsecond digits — the fixture is written with …789-ns tails)
    // survive in ts_ns, while ts truncates them. A regression that derives
    // ts_ns from the truncated micros (losing the tail) fails here.
    val df = Tables.events(spark, nanosFixtureDir)
    val subMicro = df.where(expr("ts_ns % 1000 != 0")).count()
    assert(subMicro == df.count(),
      s"only $subMicro rows kept sub-micro nanos in ts_ns — legacy branch " +
        "truncated before preserving the raw value, or the fixture was " +
        "regenerated at µs boundaries (it must not be)")
  }

  test("current live vintage is MICROS (update FIXTURES.md if this moves)") {
    val raw = spark.read.parquet(s"${TestSpark.sf0001}/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType,
      s"live events.ts raw dtype moved to ${raw.schema("ts").dataType} — " +
        "new corpus vintage: extend Tables.events + FIXTURES.md §B")
  }
}
