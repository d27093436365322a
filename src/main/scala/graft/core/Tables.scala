package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated star schema (TESTDATA.md).
  *
  * Mirrors the reference's Parquet ingestion surface
  * (reference: Utils/dataset.py:210-237) — `spark.read.parquet` hands
  * Catalyst a columnar scan with pushdown/pruning for free.
  */
final case class Tables(spark: SparkSession, dir: String) {
  // engine-native SQL functions + optimizer rules ride along with the
  // table catalog (function registry + HOF-dot-product rewrite)
  graft.plans.GraftExtensions.install(spark)

  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** events.parquet's `ts` column has shipped in two physical layouts
    * across driver testdata generations: TIMESTAMP(NANOS), which Spark
    * has no native type for (PARQUET_TYPE_ILLEGAL — read the raw int64
    * nanos and truncate to a µs timestamp, matching Spark's own ns
    * handling), and native TIMESTAMP(MICROS), which needs no
    * conversion. Dispatch on the loaded schema so both layouts present
    * the same µs-timestamp `ts`. */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        // native layout infers as TIMESTAMP_NTZ; cast to the session-UTC
        // TimestampType every downstream operator was written against
        // (identity on values under the UTC session zone)
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
