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
