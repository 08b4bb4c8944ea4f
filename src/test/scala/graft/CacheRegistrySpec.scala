package graft

import org.apache.spark.storage.StorageLevel

/** Pins the CacheRegistry ownership contract (r10 verdict task 4 /
  * ADVICE low 3): helper-persisted shared intermediates get ONE owner,
  * releaseAll drops every tracked block, and the session CacheManager
  * is verifiably empty afterwards — the "zero lingering non-session
  * blocks after a full pass" assertion Bench now carries in its line
  * (caches_released / cache_empty_after_release). */
class CacheRegistrySpec extends SparkSuite {
  private val sf = "/root/testdata/sf0.001"

  test("a dedup-family query registers its helper persists; releaseAll drops them and empties the CacheManager") {
    spark.sharedState.cacheManager.clearCache()
    CacheRegistry.releaseAll()
    assert(CacheRegistry.trackedCount == 0)

    // q52 persists its per-doc verdict table (shared with q58) through
    // the registry; executing the query materializes the cache entry
    val out = graft.queries.TextOps.q52RepetitionFilter(spark, sf)
    assert(out.count() > 0)
    assert(CacheRegistry.trackedCount > 0,
      "helper persist was not routed through the registry")
    assert(CacheRegistry.lingeringCount > 0,
      "tracked frame holds no storage level — persist was dropped")

    val released = CacheRegistry.releaseAll(blocking = true)
    assert(released > 0)
    assert(CacheRegistry.trackedCount == 0)
    assert(spark.sharedState.cacheManager.isEmpty,
      "CacheManager still holds entries after releaseAll")
    assert(out.storageLevel == StorageLevel.NONE)
  }

  test("double release and release-with-nothing-tracked are no-ops") {
    CacheRegistry.releaseAll()
    assert(CacheRegistry.releaseAll() == 0)
    val df = graft.queries.TextOps.q52RepetitionFilter(spark, sf)
    df.count()
    // an eager owner (the q62 loop pattern) may unpersist first; the
    // registry's later release must not double-count or throw
    df.unpersist(blocking = true)
    assert(CacheRegistry.releaseAll(blocking = true) == 0)
  }
}
