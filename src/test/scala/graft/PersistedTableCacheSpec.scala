package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.util.PersistedTableCache

class PersistedTableCacheSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("returns same DataFrame instance on hit, persists on miss") {
    val cache = new PersistedTableCache(maxEntries = 4)
    var builds = 0
    def build = { builds += 1; spark.range(10).toDF() }
    val a = cache.getOrElseUpdate(spark, "k1")(build)
    val b = cache.getOrElseUpdate(spark, "k1")(build)
    assert(builds == 1)
    assert(a eq b)
    assert(a.storageLevel == StorageLevel.MEMORY_AND_DISK)
    cache.clear()
  }

  test("evicts least-recently-used entry beyond maxEntries and unpersists it") {
    val cache = new PersistedTableCache(maxEntries = 2)
    val a = cache.getOrElseUpdate(spark, "a")(spark.range(1).toDF())
    cache.getOrElseUpdate(spark, "b")(spark.range(2).toDF())
    // touch a so b becomes LRU
    cache.getOrElseUpdate(spark, "a")(fail("should be cached"))
    cache.getOrElseUpdate(spark, "c")(spark.range(3).toDF())
    assert(cache.size == 2)
    // a survived the eviction (b was LRU)
    assert(cache.getOrElseUpdate(spark, "a")(fail("a was evicted")) eq a)
    cache.clear()
    assert(cache.size == 0)
  }

  test("keys are session-scoped") {
    val cache = new PersistedTableCache(maxEntries = 4)
    val other = spark.newSession()
    val a = cache.getOrElseUpdate(spark, "k")(spark.range(1).toDF())
    val b = cache.getOrElseUpdate(other, "k")(other.range(2).toDF())
    assert(!(a eq b))
    assert(cache.size == 2)
    cache.clear()
  }
}
