package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

/** Mergeable-sketch operators beyond [[Stats.distinctSketch]]'s HLL
  * (SURVEY.md §2.4 addendum; beyond-reference scale operators).
  *
  * Both follow the same 100 TB shape: each input partition reduces to a
  * few-KB sketch, sketches merge associatively (one tiny driver or
  * reducer step), and nothing proportional to the data ever leaves the
  * executors. Apache DataSketches (bundled with Spark 4) supplies the
  * sketch math; the operators here supply the distributed harness.
  */
object Sketches {

  /** Sketch-guided EXACT heavy hitters: every distinct value of `key`
    * holding at least `minShare` of the rows, with its exact count.
    *
    * Exact heavy hitters naively need a full `groupBy(key)` — at corpus
    * scale that is a shuffle with one hash entry per DISTINCT token
    * (billions). Two passes beat it:
    *
    *  1. SKETCH pass: one Misra–Gries `ItemsSketch` (size `maxMapSize`)
    *     per partition, merged on the driver (#partitions × few KB).
    *     `getFrequentItems(NO_FALSE_NEGATIVES)` then yields a candidate
    *     set that PROVABLY contains every item with true count ≥
    *     maximumError ≤ streamLength/maxMapSize — false positives
    *     possible, false negatives impossible.
    *  2. EXACT pass: the corpus filtered to the (broadcast) candidate
    *     set, aggregated exactly. The groupBy now holds ≤ |candidates|
    *     hash entries instead of |vocabulary|, and the map-side combine
    *     collapses each partition to ≤ |candidates| rows before the
    *     shuffle.
    *
    * The result is bit-identical to the naive full groupBy + HAVING —
    * which is exactly what the DuckDB oracle runs. Two guards keep the
    * no-false-negative guarantee from being silently voided:
    * `maxMapSize > 1/minShare` statically (necessary even for a perfect
    * counter), and — because the ItemsSketch's real epsilon is
    * 3.5/maxMapSize, not 1/maxMapSize, and `getFrequentItems` clamps
    * the threshold up to `getMaximumError()` — a post-merge assertion
    * that the merged sketch's ACTUAL tracked error stayed below the
    * threshold. The dynamic check is the authoritative one: the
    * worst-case bound is pessimistic on skewed streams (a Zipf stream
    * tracks far tighter than 3.5N/maxMapSize), so a static
    * `maxMapSize > 3.5/minShare` would reject configurations that are
    * provably fine for the data at hand; conversely, a stream that
    * genuinely saturates the sketch now fails loudly instead of
    * dropping true heavy hitters.
    */
  def heavyHitters(df: DataFrame, key: Column, minShare: Double,
                   maxMapSize: Int = 1024): DataFrame = {
    require(maxMapSize > 1.0 / minShare,
      s"maxMapSize=$maxMapSize cannot guarantee recall at share=$minShare")
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.select(key.cast("string").as("k")).filter($"k".isNotNull)
    val serde = new ArrayOfStringsSerDe
    // pass 1: per-partition sketches -> driver merge (#partitions rows)
    val parts: Array[(Array[Byte], Long)] = keyed.rdd
      .mapPartitions { it =>
        val sk = new ItemsSketch[String](maxMapSize)
        var n = 0L
        it.foreach { r => sk.update(r.getString(0)); n += 1 }
        Iterator.single((sk.toByteArray(new ArrayOfStringsSerDe), n))
      }
      .collect()
    val merged = new ItemsSketch[String](maxMapSize)
    parts.foreach { case (bytes, _) =>
      merged.merge(ItemsSketch.getInstance(Memory.wrap(bytes), serde))
    }
    val total = parts.map(_._2).sum
    val threshold = math.ceil(minShare * total).toLong
    // The recall proof: NO_FALSE_NEGATIVES keeps every item whose
    // upper-bound estimate reaches the threshold, which covers every
    // true heavy hitter ONLY while the sketch's tracked error is below
    // the threshold (getFrequentItems silently clamps the threshold up
    // to getMaximumError()). Assert it, don't assume it.
    require(total == 0 || merged.getMaximumError < threshold,
      s"sketch error ${merged.getMaximumError} >= threshold $threshold " +
        s"(share=$minShare of $total rows): recall guarantee void — " +
        s"raise maxMapSize above ${math.ceil(3.5 / minShare).toInt}")
    val candidates = merged
      .getFrequentItems(threshold, ErrorType.NO_FALSE_NEGATIVES)
      .map(_.getItem).toSeq
    // pass 2: exact counts of the candidates only. An all-unique stream
    // can have zero candidates — that's an empty result, not an error.
    if (candidates.isEmpty)
      return keyed.groupBy("k").agg(count(lit(1)).as("n")).filter(lit(false))
    keyed
      .filter($"k".isInCollection(candidates))
      .groupBy("k")
      .agg(count(lit(1)).as("n"))
      .filter($"n" >= threshold)
  }

  /** Mergeable per-group quantile sketches (KLL, ~1.7% rank error at
    * k=200): one row per group with the requested quantile estimates,
    * plus a global row (`is_total`) obtained by MERGING the per-group
    * sketches — never by rescanning the data. The twin of the exact
    * [[Stats.quantileBounds]]/[[Stats.equidepthHistogram]]: exact
    * interpolated percentiles need a per-group sort (or Spark's
    * single-pass-exact `percentile`, which holds all values); the KLL
    * path holds ~3 KB per group at ANY row count, and its sketches
    * persist and merge across corpus increments.
    *
    * Plan shape: map-side per-partition-per-group sketches
    * (`reduceByKey` with map-side combine — merge is associative), one
    * shuffle of sketch bytes keyed by group, per-group quantiles
    * evaluated EXECUTOR-side over the merged sketches. Nothing
    * proportional to |groups| ever reaches the driver: a corpus-scale
    * group axis (per-domain over millions of domains) streams through
    * as rows, and the only driver materialization is the single merged
    * global sketch (one ~3 KB value per upstream partition during the
    * reduce). The global-row pass rereads the reduceByKey SHUFFLE
    * output, not the input data — same shuffle dependency, no rescan.
    */
  def kllQuantiles(df: DataFrame, group: Column, value: Column,
                   qs: Seq[Double], k: Int = 200): DataFrame =
    kllEval(df.sparkSession, kllBuild(df, group, value, k), qs)

  /** The serialization-order-free sketch merge shared by every KLL
    * path (build combine, increment union, global row). */
  private val kllMergeBytes = (a: Array[Byte], b: Array[Byte]) => {
    val sa = KllDoublesSketch.heapify(Memory.wrap(a))
    sa.merge(KllDoublesSketch.heapify(Memory.wrap(b)))
    sa.toByteArray
  }

  private def kllBuild(df: DataFrame, group: Column, value: Column,
                       k: Int)
      : org.apache.spark.rdd.RDD[(String, Array[Byte])] = {
    import df.sparkSession.implicits._
    df.select(group.cast("string").as("g"),
              value.cast("double").as("v"))
      .filter($"v".isNotNull)
      .rdd
      .mapPartitions { it =>
        val m = scala.collection.mutable.HashMap.empty[String, KllDoublesSketch]
        it.foreach { r =>
          m.getOrElseUpdate(r.getString(0), KllDoublesSketch.newHeapInstance(k))
            .update(r.getDouble(1))
        }
        m.iterator.map { case (g, sk) => (g, sk.toByteArray) }
      }
      .reduceByKey(kllMergeBytes)
  }

  /** Shared evaluation tail over merged (group → sketch bytes). */
  private def kllEval(spark: org.apache.spark.sql.SparkSession,
                      merged: org.apache.spark.rdd.RDD[(String, Array[Byte])],
                      qs: Seq[Double]): DataFrame = {
    import spark.implicits._
    val qsLocal = qs.toIndexedSeq
    def quantRow(sk: KllDoublesSketch): Seq[Double] =
      qsLocal.map(q => sk.getQuantile(q, QuantileSearchCriteria.INCLUSIVE))
    // DataSketches throws on quantiles of an EMPTY sketch — an empty
    // input yields an empty result frame, not an exception
    if (merged.isEmpty()) {
      val empty = Seq.empty[(String, Boolean, Seq[Double])]
        .toDF("g", "is_total", "qv")
      return qs.zipWithIndex.foldLeft(empty) { case (acc, (q, i)) =>
        acc.withColumn(s"q${(q * 100).round}", col("qv")(i))
      }.drop("qv")
    }
    // global row: executor-side partial merges, ONE sketch to the driver
    val globalQ = quantRow(KllDoublesSketch.heapify(
      Memory.wrap(merged.values.reduce(kllMergeBytes))))
    val groupRows = merged.map { case (g, bytes) =>
      (g, false, quantRow(KllDoublesSketch.heapify(Memory.wrap(bytes))))
    }
    val base = spark.createDataFrame(groupRows).toDF("g", "is_total", "qv")
      .unionByName(Seq((null: String, true, globalQ))
        .toDF("g", "is_total", "qv"))
    qs.zipWithIndex.foldLeft(base) { case (acc, (q, i)) =>
      acc.withColumn(s"q${(q * 100).round}", col("qv")(i))
    }.drop("qv")
  }

  /** The PERSISTABLE increment form of [[kllQuantiles]]: one row per
    * group with the serialized sketch as a binary column — parquet-
    * writable, so each corpus ingest stores its own sketch frame and
    * later evaluations never rescan earlier increments (the
    * mergeability that makes a 100 TB quantile axis incremental).
    * Feed the union of any number of these frames to
    * [[kllMergeQuantiles]]. */
  def kllSketchFrame(df: DataFrame, group: Column, value: Column,
                     k: Int = 200): DataFrame = {
    import df.sparkSession.implicits._
    kllBuild(df, group, value, k).toDF("g", "sketch")
  }

  /** Merge-evaluate a union of [[kllSketchFrame]]s: per-group sketches
    * merge across increments (associative, order-free), then the same
    * evaluation tail as [[kllQuantiles]] — identical output schema, so
    * the incremental path is a drop-in for the rescan path. In the
    * exact regime (combined per-group weight ≤ k) the merged quantiles
    * are order statistics of the union of ALL increments, which is
    * what the q163 gate checks. */
  def kllMergeQuantiles(sketches: DataFrame, qs: Seq[Double])
      : DataFrame = {
    val merged = sketches
      .select(col("g").cast("string"), col("sketch"))
      .rdd
      .map(r => (r.getString(0), r.getAs[Array[Byte]](1)))
      .reduceByKey(kllMergeBytes)
    kllEval(sketches.sparkSession, merged, qs)
  }

  /** Corpus-overlap estimation via Theta sketches (the set-OPERATION
    * sketch next to HLL's pure distinct count): one row with estimated
    * |A|, |B|, |A∩B|, |A∪B| and Jaccard — the contamination /
    * cross-corpus-overlap question ("how much of the benchmark is in
    * the training set?") answered WITHOUT the exact distinct join,
    * from two single scans. Each partition reduces to a compact
    * sketch, sketches union associatively executor-side (treeReduce),
    * and only the two final compact sketches (k·8 bytes each) reach
    * the driver, where intersection runs on values.
    *
    * Accuracy: exact below k entries per side (an update sketch stores
    * every hash until k — the gate regime); ~1/√k relative error above
    * (k = 4096 default → ~1.6%), with intersection error governed by
    * the smaller set (Dasgupta et al., the published theta-sketch
    * framework). */
  def thetaOverlap(a: DataFrame, b: DataFrame, keyA: Column,
                   keyB: Column): DataFrame = {
    import org.apache.datasketches.theta.{SetOperation, Sketch,
      UpdateSketch}
    def compact(df: DataFrame, key: Column): Sketch = {
      val parts = df.select(key.cast("string").as("k"))
        .filter(col("k").isNotNull).rdd
        .mapPartitions { it =>
          val sk = UpdateSketch.builder().build()
          it.foreach(r => sk.update(r.getString(0)))
          Iterator.single(sk.compact().toByteArray)
        }
      // a 0-partition frame is the only way parts can be empty
      // (mapPartitions emits one sketch per partition, empty or not);
      // checking getNumPartitions is driver-side — RDD.isEmpty would
      // launch a job that sketches partition 0 and discards it
      if (parts.getNumPartitions == 0)
        UpdateSketch.builder().build().compact()
      else
        org.apache.datasketches.theta.Sketches.wrapSketch(Memory.wrap(
          parts.treeReduce { (x, y) =>
            val u = SetOperation.builder().buildUnion()
            u.union(Memory.wrap(x))
            u.union(Memory.wrap(y))
            u.getResult.toByteArray
          }))
    }
    val sa = compact(a, keyA)
    val sb = compact(b, keyB)
    val inter = SetOperation.builder().buildIntersection()
      .intersect(sa, sb)
    val uni = SetOperation.builder().buildUnion().union(sa, sb)
    // A∖B completes the set-op family: "how much of the new crawl is
    // actually NEW" — the delta-ingest sizing question
    val diff = SetOperation.builder().buildANotB().aNotB(sa, sb)
    val spark = a.sparkSession
    import spark.implicits._
    Seq((sa.getEstimate, sb.getEstimate, inter.getEstimate,
         uni.getEstimate, diff.getEstimate,
         BigDecimal(if (uni.getEstimate == 0.0) 0.0
                    else inter.getEstimate / uni.getEstimate)
           .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toDF("n_a", "n_b", "n_intersection", "n_union", "n_a_not_b",
            "jaccard")
  }

  /** Morton/Z-order interleaving of two non-negative integer keys
    * (bits of `x` on even positions, `y` on odd): rows sorted by the
    * z-value cluster BOTH dimensions, so parquet row-group min/max
    * pruning skips data for predicates on either column — the
    * data-skipping layout step of a 100 TB table bucketed by two
    * access paths (Delta/Iceberg's OPTIMIZE ZORDER, as plain Spark).
    * Pure bit arithmetic in codegen (a fold over the bit positions,
    * no UDF); keys must fit `bits` bits (≤ 31 each, z fits a long). */
  def zValue(x: Column, y: Column, bits: Int = 20): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { b =>
      (shiftleft(shiftright(x.cast("long"), b).bitwiseAND(lit(1L)),
                 2 * b) +
       shiftleft(shiftright(y.cast("long"), b).bitwiseAND(lit(1L)),
                 2 * b + 1))
    }.reduce(_ + _)
  }

  /** Z-order layout: range-partition + sort the frame by
    * [[zValue]](x, y) — the write-side pass before a parquet dump whose
    * row groups should prune on either key. */
  def zOrderLayout(df: DataFrame, x: Column, y: Column,
                   partitions: Int, bits: Int = 20): DataFrame = {
    val z = df.withColumn("_z", zValue(x, y, bits))
    z.repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions("_z")
  }
}
