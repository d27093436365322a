package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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

  /** Serializes the conf-raise → build → conf-restore critical section:
    * the runtime bloom clamp confs are SESSION-global, so two
    * concurrent builds could otherwise restore the clamp mid-flight
    * under each other (driver-thread concurrency is an established
    * pattern here — see q135). Serializing the builds is the honest
    * cost; the probe stages still run fully concurrent. */
  private val confLock = new Object

  /** The hashed key both bloom sides feed on, or None when no safe
    * common representation exists. `xxhash64` is PHYSICAL-type
    * sensitive (an INT and a BIGINT holding the same value hash
    * differently), so the two sides must reach one physical type
    * first:
    *  - identical non-floating types hash natively (covers string/
    *    date/binary/decimal/struct keys with zero cast risk);
    *  - integral mixes widen to bigint;
    *  - float/double keys — same-type or numeric mixes — widen to
    *    double and add `+0.0` before hashing (Spark's own equi-join
    *    coercion; hashing the double keeps fractional keys distinct,
    *    where a bigint cast would collapse every key sharing an
    *    integer part onto one hash). The `+0.0` is load-bearing:
    *    join equality normalizes -0.0 == 0.0 (NormalizeFloatingNumbers)
    *    but xxhash64 hashes the raw sign bit, so a -0.0 probe against
    *    a 0.0 build would miss the filter — a FALSE NEGATIVE breaking
    *    the exactly-the-semi-join contract. IEEE -0.0 + 0.0 = +0.0
    *    canonicalizes the sign; NaN payloads are already canonical in
    *    the hash (xxhash64 goes through doubleToLongBits, which maps
    *    every NaN to one bit pattern — matching join-equality's
    *    all-NaNs-equal);
    *  - anything else (string vs numeric, date vs string, …) has
    *    engine-specific join coercion this operator does not
    *    replicate → None, and the caller falls back to the exact
    *    un-pruned join rather than risk a false negative. */
  private def commonHash(probeType: DataType, buildType: DataType)
      : Option[Column => Column] = {
    def integral(t: DataType) = t match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    def floating(t: DataType) = t == FloatType || t == DoubleType
    def numeric(t: DataType) = t.isInstanceOf[NumericType]
    if (probeType == buildType && !floating(probeType))
      Some(c => xxhash64(c))
    else if (integral(probeType) && integral(buildType))
      Some(c => xxhash64(c.cast("bigint")))
    else if (numeric(probeType) && numeric(buildType))
      // the mix here necessarily involves a float/double side (the
      // all-integral case matched above), so signed zero is in play
      Some(c => xxhash64(c.cast("double") + lit(0.0)))
    else None
  }

  /** Build the serialized filter over `hashed(buildKey)` — one
    * distributed aggregate; only the bitset reaches the driver. The
    * session's runtime-bloom clamp confs are raised to the requested
    * size for the build and restored after (`BloomFilterAggregate`
    * silently clamps to 4M items / 67M bits otherwise — an fpp→1
    * degradation for a corpus-scale build side). Exposed package-
    * private so the un-clamped size is testable. */
  private[graft] def buildFilter(build: DataFrame, key: Column,
                                 items: Long, numBits: Long)
      : Array[Byte] = {
    val spark = build.sparkSession
    graft.functions.BloomFunctions.register(spark)
    val itemsConf = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsConf = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    confLock.synchronized {
      val oldItems = spark.conf.getOption(itemsConf)
      val oldBits = spark.conf.getOption(bitsConf)
      try {
        spark.conf.set(itemsConf,
          math.max(items, spark.conf.get(itemsConf, "4000000").toLong))
        spark.conf.set(bitsConf,
          math.max(numBits, spark.conf.get(bitsConf, "67108864").toLong))
        build
          .select(call_function("graft_bloom_filter_agg", key,
                                lit(items), lit(numBits)).as("bf"))
          .head.getAs[Array[Byte]](0)
      } finally {
        def restore(k: String, v: Option[String]): Unit =
          v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
        restore(itemsConf, oldItems)
        restore(bitsConf, oldBits)
      }
    }
  }

  /** Exact semi-join of `probe` against `build`, Bloom-pruned before
    * the shuffle. Key pairs with a safe common hash representation
    * (same type, integral mixes, numeric mixes — see [[commonHash]])
    * are pruned; pairs whose equi-join coercion this operator cannot
    * replicate (e.g. string vs numeric) fall back to the exact
    * un-pruned semi-join — never a wrong result, only a lost
    * optimization. After normalization a 64-bit hash collision can
    * only ADD a false positive, which the exact confirm join removes
    * like any other.
    *
    * `expectedItems` sizes the filter for the build side's distinct-key
    * count; overshooting costs bits (1.2 bytes/item at fpp 0.01),
    * undershooting degrades fpp — never correctness. Pass `0` to
    * auto-size from `build.count()` — one cheap extra job (a count
    * scan, no shuffle) against a filter that is never mis-sized. */
  def bloomSemiJoin(probe: DataFrame, build: DataFrame,
                    probeKey: String, buildKey: String,
                    expectedItems: Long, fpp: Double = 0.01)
      : DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1): $fpp")
    val hash = commonHash(probe.schema(probeKey).dataType,
                          build.schema(buildKey).dataType)
    val confirm = build.select(col(buildKey).as(probeKey)).distinct()
    if (hash.isEmpty)
      return probe.join(confirm, Seq(probeKey), "left_semi")
    val keyed = hash.get
    val items =
      if (expectedItems > 0) expectedItems else math.max(1L, build.count())
    // the standard optimal-bits formula: m = -n ln p / (ln 2)^2
    val numBits = math.max(64L,
      math.ceil(-items * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val bytes = buildFilter(build, keyed(col(buildKey)), items, numBits)
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
