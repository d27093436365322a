package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.TableIO

/** End-to-end split-generation pipeline — the engine's analog of the
  * reference's `run_generate_splits.py` entry point (SURVEY.md §3.1):
  * interactions → dedup → seeded 70/10/20 split → URM triples persisted
  * as split-partitioned parquet + metadata JSON.
  */
object Pipeline {

  final case class SplitResult(train: DataFrame, validation: DataFrame,
                               test: DataFrame,
                               metadata: Map[String, Long])

  /** Dedup (A7) → randomSplit(.7/.1/.2, seed) (X1) → binary URM triples
    * (L1), with the implicit-data and disjointness assertions the
    * reference runs before every experiment
    * (Utils/assertions_on_data_for_experiments.py:12-54). */
  def generateSplits(interactions: DataFrame, seed: Long): SplitResult = {
    val urm = interactions.select("u", "i").distinct()
      .withColumn("v", lit(1))
    val Array(tr, va, te) =
      Urm.randomSplit(urm, Array(0.7, 0.1, 0.2), seed)
    val all = tr.withColumn("split", lit("train"))
      .unionByName(va.withColumn("split", lit("validation")))
      .unionByName(te.withColumn("split", lit("test")))
    require(Urm.overlapCells(all).head().getLong(0) == 0,
            "splits must be pairwise disjoint")
    val meta = Map(
      "num_users" -> urm.select("u").distinct().count(),
      "num_items" -> urm.select("i").distinct().count(),
      "num_interactions" -> urm.count())
    SplitResult(tr, va, te, meta)
  }

  /** Persist splits as one split-partitioned parquet dataset plus a
    * metadata JSON (the reference's npz-per-split + metadata.json,
    * Utils/dataset.py:285-306, 219-226). */
  def save(result: SplitResult, path: String): Unit = {
    val all = result.train.withColumn("split", lit("train"))
      .unionByName(result.validation.withColumn("split", lit("validation")))
      .unionByName(result.test.withColumn("split", lit("test")))
    TableIO.writeParquet(all, s"$path/urm", partitionBy = Seq("split"))
    TableIO.writeMetadata(s"$path/metadata.json", result.metadata)
  }

  /** Load one split back (partition-pruned scan). */
  def loadSplit(spark: SparkSession, path: String, split: String)
      : DataFrame =
    spark.read.parquet(s"$path/urm").filter(col("split") === split)
      .drop("split")

  /** Bucketed URM persistence — the co-located-join scale path: the
    * table is hash-bucketed (and sorted) on the join key ONCE at write
    * time, so every later join keyed on it — the similarity engine's
    * user-key self-join above all — reads co-located, pre-sorted
    * buckets and plans a SortMergeJoin with NO exchange on the bucketed
    * sides. At 100 TB this converts the per-query shuffle of the whole
    * URM into a one-time write cost amortized across the workload.
    * Registered through the session catalog (`saveAsTable` — bucket
    * metadata lives in the catalog; a plain parquet path cannot carry
    * it). */
  def saveBucketed(urm: DataFrame, table: String, buckets: Int,
                   key: String = "u"): Unit =
    urm.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Read a bucketed URM back; joins on the bucket key are
    * exchange-free (PlanSpec pins this). */
  def loadBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
