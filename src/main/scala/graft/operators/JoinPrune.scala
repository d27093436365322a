package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

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
  * Mechanics: one aggregate pass over the build side constructs the
  * filter with the native `bloom_filter_agg` expression (mergeable
  * per-partition sketches — no driver-side row collection; only the
  * serialized bitset reaches the driver); the probe applies the native
  * `BloomFilterMightContain` predicate at the scan (a narrow per-row
  * map BEFORE any exchange, INSIDE whole-stage codegen — the same
  * expression pair Spark's automatic runtime filter injects), and the
  * survivors — matches plus an fpp-sized trickle of false positives —
  * flow into the exact semi-join that removes the false positives.
  * Result is therefore EXACTLY the plain semi-join (Bloom filters admit
  * no false negatives); the shuffle volume is `|matches| + fpp·|probe|`
  * rows instead of `|probe|`. At fpp=0.01 a 1%-selective semi-join
  * moves ~2% of the corpus through the exchange — a 50× shuffle
  * reduction.
  */
object JoinPrune {

  /** Exact semi-join of `probe` against `build`, Bloom-pruned before
    * the shuffle. Keys of any orderable type: both sides are first
    * NORMALIZED to one representation — string keys to string,
    * numeric keys to bigint — and then hashed with `xxhash64`
    * (codegen'd, engine-side only), so the sketch always feeds on
    * longs. The normalization is load-bearing: `xxhash64` is
    * physical-type-sensitive (an INT and a BIGINT holding the same
    * value hash differently), so hashing un-normalized mixed-width
    * keys would produce false NEGATIVES the confirm join cannot
    * repair. After normalization a 64-bit hash collision can only ADD
    * a false positive, which the exact confirm join removes like any
    * other.
    *
    * `expectedItems` sizes the filter for the build side's distinct-key
    * count; overshooting costs bits (1.2 bytes/item at fpp 0.01),
    * undershooting degrades fpp — never correctness. Pass `0` to
    * auto-size from `build.count()` — one cheap extra job (a count
    * scan, no shuffle) against a filter that is never mis-sized.
    * `BloomFilterAggregate` silently clamps its size to the session's
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems/maxNumBits`
    * (defaults 4M items / 67M bits — a silent fpp→1 degradation for a
    * corpus-scale build side), so the confs are raised to the
    * requested size around the build and restored after. */
  def bloomSemiJoin(probe: DataFrame, build: DataFrame,
                    probeKey: String, buildKey: String,
                    expectedItems: Long, fpp: Double = 0.01)
      : DataFrame = {
    val spark = probe.sparkSession
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1): $fpp")
    val items =
      if (expectedItems > 0) expectedItems else math.max(1L, build.count())
    // the standard optimal-bits formula: m = -n ln p / (ln 2)^2
    val numBits = math.max(64L,
      math.ceil(-items * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    graft.functions.BloomFunctions.register(spark)
    // normalize both key sides to ONE physical type before hashing
    val isString =
      probe.schema(probeKey).dataType == StringType ||
      build.schema(buildKey).dataType == StringType
    def keyed(c: Column): Column =
      xxhash64(c.cast(if (isString) "string" else "bigint"))
    // one distributed aggregate: per-partition bitsets OR-merged into
    // one — the build side never leaves the executors as rows. The
    // aggregate clamps to the runtime-filter confs, so lift them to
    // the requested size for the build and restore afterwards.
    val itemsConf = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsConf = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val oldItems = spark.conf.getOption(itemsConf)
    val oldBits = spark.conf.getOption(bitsConf)
    val bytes =
      try {
        spark.conf.set(itemsConf,
          math.max(items, spark.conf.get(itemsConf, "4000000").toLong))
        spark.conf.set(bitsConf,
          math.max(numBits, spark.conf.get(bitsConf, "67108864").toLong))
        build
          .select(call_function("graft_bloom_filter_agg",
                                keyed(col(buildKey)),
                                lit(items), lit(numBits)).as("bf"))
          .head.getAs[Array[Byte]](0)
      } finally {
        def restore(k: String, v: Option[String]): Unit =
          v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
        restore(itemsConf, oldItems)
        restore(bitsConf, oldBits)
      }
    val confirm = build.select(col(buildKey).as(probeKey)).distinct()
    // empty build side: the aggregate yields a null filter; the result
    // is the (empty) exact semi-join, no probe needed
    if (bytes == null)
      return probe.join(confirm, Seq(probeKey), "left_semi")
    // native might_contain: the serialized filter is a foldable binary
    // literal (what checkInputDataTypes requires), the probe key the
    // same normalized xxhash64 — the whole predicate stays in codegen,
    // no ScalaUDF row-iterator boundary at the scan
    probe
      .filter(call_function("graft_might_contain",
                            lit(bytes), keyed(col(probeKey))))
      .join(confirm, Seq(probeKey), "left_semi")
  }

  /** The un-pruned twin, for differential tests. */
  def plainSemiJoin(probe: DataFrame, build: DataFrame,
                    probeKey: String, buildKey: String): DataFrame =
    probe.join(build.select(col(buildKey).as(probeKey)).distinct(),
               Seq(probeKey), "left_semi")
}
