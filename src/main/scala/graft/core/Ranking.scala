package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distributed replacements for unpartitioned ranking windows.
  *
  * `row_number().over(Window.orderBy(...))` funnels every row through a
  * single reducer — defensible when the input is a bounded catalog
  * aggregate, a bottleneck when the ranked axis grows with the corpus
  * (documents, users). This computes the same global rank / running sum
  * with the classic two-pass shape:
  *
  *   1. range-partition on the sort key (global order across
  *      partitions, local order within);
  *   2. rank and prefix-sum locally per partition — parallel windows;
  *   3. add per-partition offsets, aggregated from partition totals via
  *      a #partitions-sized self-join (no single-partition exchange
  *      anywhere; the only tiny structure is the offsets table, which
  *      broadcasts).
  *
  * `orderCols` must be a TOTAL order (include a unique tie-break key)
  * for the rank to be deterministic.
  */
object Ranking {

  /** Adds `rankName` (int, 1-based row_number over the global
    * `orderCols` order) and `cumName` (running sum of `value` up to and
    * including the current row in that order). */
  def withGlobalRankAndCumSum(df: DataFrame, orderCols: Seq[Column],
                              value: Column, rankName: String,
                              cumName: String): DataFrame = {
    // the range-shuffled frame feeds both the local window and the
    // partition-totals aggregate — persist once (it is already an
    // aggregate/catalog-sized frame at every call site)
    val ranged = CacheScope.persist(
      df.repartitionByRange(orderCols: _*)
        .withColumn("_pid", spark_partition_id()))
    val wLocal = Window.partitionBy("_pid").orderBy(orderCols: _*)
    val local = ranged
      .withColumn("_lrn", row_number().over(wLocal))
      .withColumn("_lcum", sum(value).over(
        wLocal.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val parts = ranged.groupBy("_pid")
      .agg(count(lit(1)).as("_np"), sum(value).as("_sp"))
    val partsB = parts.select(col("_pid").as("_pid_b"),
                              col("_np").as("_np_b"),
                              col("_sp").as("_sp_b"))
    val offsets = parts.join(partsB, col("_pid_b") < col("_pid"), "left")
      .groupBy("_pid")
      .agg(coalesce(sum("_np_b"), lit(0L)).as("_offn"),
           coalesce(sum("_sp_b"), lit(0L)).as("_offs"))
    local.join(broadcast(offsets), "_pid")
      .withColumn(rankName, (col("_lrn") + col("_offn")).cast("int"))
      .withColumn(cumName, col("_lcum") + col("_offs"))
      .drop("_pid", "_lrn", "_lcum", "_offn", "_offs")
  }

  /** Rank-only variant. */
  def withGlobalRank(df: DataFrame, orderCols: Seq[Column],
                     rankName: String): DataFrame =
    withGlobalRankAndCumSum(df, orderCols, lit(0L), rankName, "_cum_unused")
      .drop("_cum_unused")
}
