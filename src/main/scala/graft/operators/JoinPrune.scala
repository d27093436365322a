package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter join pruning (SURVEY.md §2.3 addendum; beyond-reference
  * scale operator).
  *
  * The 100 TB problem: a semi/inner join whose probe side is the whole
  * corpus shuffles every probe row to the join — even though only a
  * small fraction of them match the build side. Spark's own runtime
  * row-level filtering (`spark.sql.optimizer.runtime.bloomFilter.*`)
  * injects such a filter automatically, but only inside a single plan,
  * under size thresholds, and never across queries. This operator makes
  * the pattern explicit and reusable: the build-side Bloom filter is a
  * value, so one build can prune MANY probe scans (the "filter once,
  * join everywhere" shape of iterative corpus curation).
  *
  * Mechanics: one aggregate pass over the build side constructs an
  * `org.apache.spark.util.sketch.BloomFilter` (`df.stat.bloomFilter`,
  * mergeable per-partition sketches — no driver-side row collection);
  * the filter is torrent-broadcast to executors, applied at the probe
  * scan (a narrow per-row map BEFORE any exchange), and the survivors —
  * matches plus an fpp-sized trickle of false positives — flow into the
  * exact semi-join that removes the false positives. Result is therefore
  * EXACTLY the plain semi-join (Bloom filters admit no false negatives);
  * the shuffle volume is `|matches| + fpp·|probe|` rows instead of
  * `|probe|`. At fpp=0.01 a 1%-selective semi-join moves ~2% of the
  * corpus through the exchange — a 50× shuffle reduction.
  */
object JoinPrune {

  /** Exact semi-join of `probe` against `build`, Bloom-pruned before the
    * shuffle. `probeKey`/`buildKey` must be integral or string columns
    * (the sketch hashes longs and UTF-8 strings).
    *
    * `expectedItems` sizes the filter for the build side's distinct-key
    * count; overshooting costs bits (1.2 bytes/item at fpp 0.01),
    * undershooting degrades fpp — never correctness. */
  def bloomSemiJoin(probe: DataFrame, build: DataFrame,
                    probeKey: String, buildKey: String,
                    expectedItems: Long, fpp: Double = 0.01)
      : DataFrame = {
    val spark = probe.sparkSession
    // one distributed aggregate: per-partition BloomFilters OR-merged
    // into one — the build side never leaves the executors as rows
    val bloom: BloomFilter =
      build.stat.bloomFilter(buildKey, expectedItems, fpp)
    val bc = spark.sparkContext.broadcast(bloom)
    val isString =
      probe.schema(probeKey).dataType ==
        org.apache.spark.sql.types.StringType
    // Scala closure, not a codegen'd expression: mightContain is one
    // hash + bitset probe per row, and it runs at the SCAN (pre-
    // exchange), so the non-codegen boundary costs a row iterator, not
    // a shuffle. The exact confirm join below keeps semantics.
    val keep =
      if (isString) udf((k: String) => k != null && bc.value.mightContainString(k))
      else udf((k: Long) => bc.value.mightContainLong(k))
    probe
      .filter(keep(col(probeKey).cast(if (isString) "string" else "long")))
      .join(build.select(col(buildKey).as(probeKey)).distinct(),
            Seq(probeKey), "left_semi")
  }

  /** The un-pruned twin, for differential tests. */
  def plainSemiJoin(probe: DataFrame, build: DataFrame,
                    probeKey: String, buildKey: String): DataFrame =
    probe.join(build.select(col(buildKey).as(probeKey)).distinct(),
               Seq(probeKey), "left_semi")
}
