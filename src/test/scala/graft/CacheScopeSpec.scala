package graft

import org.apache.spark.sql.functions._
import graft.core.CacheScope
import graft.similarity.Similarity

/** Persist lifetime management: operators cache through CacheScope, so
  * scoped callers release executor storage deterministically. */
class CacheScopeSpec extends SparkSpec {
  import spark.implicits._

  private def cachedRdds: Int =
    spark.sparkContext.getPersistentRDDs.size

  private def urm = (for { u <- 0 until 30; i <- 0 until 10
                           if (u * 7 + i * 3) % 4 != 0 }
    yield (u.toLong, i.toLong, 1.0)).toDF("u", "i", "v")

  test("scoped: operator persists are released on exit") {
    CacheScope.global.release()
    spark.catalog.clearCache()
    val before = cachedRdds
    var inside = -1
    val rows = CacheScope.scoped {
      val sim = Similarity.itemSimilarity(urm, Similarity.Cosine)
      val n = sim.count()
      inside = cachedRdds
      n
    }
    assert(rows > 0)
    assert(inside > before, "the similarity URM subtree must be cached " +
      "while the scope is live")
    assert(cachedRdds == before, "scope exit must unpersist everything " +
      "the operator cached")
  }

  test("scoped: released even when the body throws") {
    spark.catalog.clearCache()
    val before = cachedRdds
    intercept[RuntimeException] {
      CacheScope.scoped {
        Similarity.pairDots(urm).count()
        throw new RuntimeException("boom")
      }
    }
    assert(cachedRdds == before)
  }

  test("global scope accumulates and releases in bulk") {
    spark.catalog.clearCache()
    val before = cachedRdds
    val sizeBefore = CacheScope.global.size
    Similarity.pairDots(urm).count()
    assert(CacheScope.global.size == sizeBefore + 1)
    assert(cachedRdds > before)
    CacheScope.global.release()
    assert(CacheScope.global.size == 0)
    assert(cachedRdds == before)
  }

  test("trackBroadcast tracks inside a scope, passes through in " +
       "global (no strong-ref pinning against ContextCleaner)") {
    // global scope: must NOT hold a reference — the global tracked
    // list lives until an explicit release(), so tracking there would
    // pin every operator-internal broadcast forever
    val sizeBefore = CacheScope.global.size
    val bc = CacheScope.trackBroadcast(
      spark.sparkContext.broadcast(Array(1, 2, 3)))
    assert(bc.value.sameElements(Array(1, 2, 3)))
    assert(CacheScope.global.size == sizeBefore,
           "global trackBroadcast must not accumulate entries")
    // scoped: tracked and released with the scope (unpersist, not
    // destroy — the driver value survives)
    var scopedBc: org.apache.spark.broadcast.Broadcast[Array[Int]] = null
    CacheScope.scoped {
      scopedBc = CacheScope.trackBroadcast(
        spark.sparkContext.broadcast(Array(4, 5)))
      assert(scopedBc.value.sameElements(Array(4, 5)))
    }
    assert(scopedBc.value.sameElements(Array(4, 5)),
           "scope exit unpersists executor blocks but keeps the " +
             "driver copy readable")
  }

  test("results are identical with and without a scope") {
    val loose = Similarity.pairDots(urm)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    CacheScope.global.release()
    val scoped = CacheScope.scoped {
      Similarity.pairDots(urm)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    assert(scoped == loose)
  }
}
