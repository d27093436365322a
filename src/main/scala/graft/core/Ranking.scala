package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed replacements for unpartitioned ranking windows.
  *
  * `row_number().over(Window.orderBy(...))` funnels every row through a
  * single reducer — defensible when the input is a bounded catalog
  * aggregate, a bottleneck when the ranked axis grows with the corpus
  * (documents, users). This computes the same global rank / running sum
  * with the classic two-pass shape:
  *
  *   1. range-partition on the sort key and sort within partitions —
  *      global order across partitions, local order within;
  *   2. one local pass per partition for (row count, value total) —
  *      #partitions rows to the driver, prefix-summed into offsets;
  *   3. a second local pass emits rank and running sum, seeded with the
  *      partition's offsets.
  *
  * The local passes are `mapPartitionsWithIndex` — per-partition
  * sequential accumulation, the one case where imperative RDD code
  * beats the declarative form: a `Window.partitionBy(pid)` local pass
  * would re-shuffle rows that the range exchange already co-located
  * (Spark does not recognize range partitioning as satisfying a hash
  * clustering), doubling the job's shuffle volume. Measured on the
  * sequence-packing plan: two full-data exchanges → one.
  *
  * `orderCols` must be a TOTAL order (include a unique tie-break key)
  * for the rank to be deterministic. Integral `value` accumulates in
  * exact Long arithmetic (cum column is LongType); anything else
  * accumulates in Double (per-partition sequential order, so the sum
  * is deterministic for a fixed partitioning).
  */
object Ranking {

  /** Adds `rankName` (long, 1-based row_number over the global
    * `orderCols` order — long, not int: the whole point of this helper
    * is corpus-sized axes, where 2³¹ rows is reachable) and `cumName`
    * (running sum of `value` up to and including the current row in
    * that order). */
  def withGlobalRankAndCumSum(df: DataFrame, orderCols: Seq[Column],
                              value: Column, rankName: String,
                              cumName: String): DataFrame = {
    val spark = df.sparkSession
    require(!df.columns.contains("_v"),
      "input must not carry a column named _v (internal scratch name)")
    val integral = df.withColumn("_v", value).schema("_v").dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val normalized = df.withColumn("_v",
      if (integral) value.cast("long") else value.cast("double"))
    // the range-shuffled frame feeds both local passes — persist once
    // so pass 2 sees the exact partitions pass 1 measured
    val ranged = CacheScope.persist(
      normalized.repartitionByRange(orderCols: _*)
        .sortWithinPartitions(orderCols: _*))
    val vIdx = ranged.schema.fieldIndex("_v")
    val totals = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var n = 0L; var sl = 0L; var sd = 0.0
      it.foreach { r =>
        n += 1
        if (!r.isNullAt(vIdx)) {
          if (integral) sl += r.getLong(vIdx) else sd += r.getDouble(vIdx)
        }
      }
      Iterator((pid, n, sl, sd))
    }.collect().map(t => t._1 -> t).toMap
    val nParts = ranged.rdd.getNumPartitions
    val offN = new Array[Long](nParts)
    val offL = new Array[Long](nParts)
    val offD = new Array[Double](nParts)
    var an = 0L; var al = 0L; var ad = 0.0
    for (p <- 0 until nParts) {
      offN(p) = an; offL(p) = al; offD(p) = ad
      totals.get(p).foreach { case (_, n, sl, sd) =>
        an += n; al += sl; ad += sd
      }
    }
    val keepIdx = ranged.schema.fields.zipWithIndex
      .filterNot(_._1.name == "_v").map(_._2)
    val outSchema = StructType(
      keepIdx.map(ranged.schema.fields(_)) :+
      StructField(rankName, LongType, nullable = false) :+
      StructField(cumName, if (integral) LongType else DoubleType,
                  nullable = false))
    val rows = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      var rn = offN(pid); var cl = offL(pid); var cd = offD(pid)
      it.map { r =>
        rn += 1
        if (!r.isNullAt(vIdx)) {
          if (integral) cl += r.getLong(vIdx) else cd += r.getDouble(vIdx)
        }
        val cum: Any = if (integral) cl else cd
        Row.fromSeq(keepIdx.map(r.get).toSeq :+ rn :+ cum)
      }
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** Rank-only variant. */
  def withGlobalRank(df: DataFrame, orderCols: Seq[Column],
                     rankName: String): DataFrame =
    withGlobalRankAndCumSum(df, orderCols, lit(0L), rankName, "_cum_unused")
      .drop("_cum_unused")
}
