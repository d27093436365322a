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
}
