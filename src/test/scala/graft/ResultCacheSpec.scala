package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Weather, WeatherApi}

/** TTL semantics of the dashboard result cache (app.py:231-256
  * analogue): snapshot within TTL, recompute after, LRU bound,
  * manual invalidation. The clock is injected so expiry is driven
  * deterministically, not by sleeping. */
class ResultCacheSpec extends AnyFunSuite {
  import TestSpark._

  test("within TTL: one compute, identical snapshot; after TTL: recompute") {
    var now = 1000L
    val cache = new ResultCache(ttlMs = 300000, clock = () => now)
    var computes = 0
    def load = {
      computes += 1
      WeatherApi.metrics(Weather.bronze(spark, sf),
        Weather.silverClean(spark, sf), "click")
    }
    val first = cache(spark, "metrics:click")(load).collect()
    now += 299999 // 1 ms before expiry
    val second = cache(spark, "metrics:click")(load).collect()
    assert(computes === 1, "second call within TTL must serve the snapshot")
    assert(first.toSeq === second.toSeq)
    now += 2 // past expiry
    cache(spark, "metrics:click")(load).collect()
    assert(computes === 2, "expired entry must recompute")
    assert(cache.stats === ((1L, 2L)))
  }

  test("snapshot is independent of later source churn (stale <= ttl contract)") {
    var now = 0L
    val cache = new ResultCache(ttlMs = 1000000, clock = () => now)
    import spark.implicits._
    var rows = Seq(1, 2, 3)
    def load = rows.toDF("v")
    assert(cache(spark, "k")(load).count() === 3)
    rows = Seq(1, 2, 3, 4, 5) // the "table" changed
    assert(cache(spark, "k")(load).count() === 3,
      "within TTL the panel serves the snapshot, not the new data")
    now += 1000001
    assert(cache(spark, "k")(load).count() === 5)
  }

  test("LRU eviction beyond maxEntries; invalidate clears everything") {
    var now = 0L
    val cache = new ResultCache(ttlMs = 1000000, maxEntries = 2,
      clock = () => now)
    import spark.implicits._
    def load(n: Int) = Seq(n).toDF("v")
    cache(spark, "a")(load(1)); cache(spark, "b")(load(2))
    cache(spark, "a")(load(1)) // touch a → b is now eldest
    cache(spark, "c")(load(3)) // evicts b
    assert(cache.size === 2)
    val (h0, m0) = cache.stats
    cache(spark, "a")(load(1)) // still cached
    assert(cache.stats === ((h0 + 1, m0)))
    cache(spark, "b")(load(2)) // was evicted → miss
    assert(cache.stats === ((h0 + 1, m0 + 1)))
    cache.invalidate()
    assert(cache.size === 0)
  }

  test("an oversized result is served but never stored (working set survives)") {
    var now = 0L
    val cache = new ResultCache(ttlMs = 1000000, maxEntries = 2,
      maxRowsPerEntry = 10, clock = () => now)
    import spark.implicits._
    def small(n: Int) = Seq(n).toDF("v")
    cache(spark, "a")(small(1)); cache(spark, "b")(small(2))
    // the careless big get: correct data back, but NOT cached — and
    // the small working set is untouched (pre-cap behavior: caching
    // it would have evicted one of a/b)
    val big = cache(spark, "big")((1 to 11).toDF("v"))
    assert(big.count() === 11)
    assert(cache.size === 2 && cache.oversized === 1)
    val (h0, _) = cache.stats
    cache(spark, "a")(small(1)); cache(spark, "b")(small(2))
    assert(cache.stats._1 === h0 + 2, "a and b must still be cached")
    // a re-get of the big key recomputes every time (never stored)
    assert(cache(spark, "big")((1 to 11).toDF("v")).count() === 11)
    assert(cache.oversized === 2)
  }
}
