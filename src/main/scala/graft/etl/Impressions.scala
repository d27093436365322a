package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's impression-ETL surface (SURVEY.md §2.11 X9;
  * reference: Utils/dataset.py:401-599 _generate_urm_impressions):
  * recommendation lists are array columns that explode into
  * (recommendation, series) rows, map through the item↔series
  * dimension, and join back to users.
  *
  * The reference had to process this sequentially per partition to stay
  * under 120 GB (Utils/dataset.py:487-491); here it is one declarative
  * plan — explode, broadcast dimension join, user join, dedup — whose
  * shuffles partition by key and spill to disk, so the same logic runs
  * unchanged at any scale.
  */
object Impressions {

  /** Explode direct-link impressions and resolve series → items:
    * (recommendation_id, series_id) → all items of the series
    * (reference: Utils/dataset.py:404-417). `itemSeries` is the
    * (item_id, series_id) functional-dependency dimension (J5/J1). */
  def explodeDirectLink(impressions: DataFrame,
                        itemSeries: DataFrame): DataFrame =
    impressions
      .select(col("recommendation_id"),
              explode(col("recommended_series_list")).as("series_id"))
      .join(broadcast(itemSeries), "series_id")

  /** X9 — URM from direct-link impressions: join the exploded lists to
    * the users who saw each recommendation
    * (reference: Utils/dataset.py:419-451). */
  def urmFromDirectLink(interactions: DataFrame, impressions: DataFrame,
                        itemSeries: DataFrame): DataFrame = {
    val userRec = interactions
      .filter(col("recommendation_id") >= 0)
      .select("user_id", "recommendation_id").distinct()
    userRec
      .join(explodeDirectLink(impressions, itemSeries),
            "recommendation_id")
      .select(col("user_id").as("u"), col("item_id").as("i"))
      .distinct()
      .withColumn("v", lit(1))
  }

  /** X9 — URM from non-direct-link impressions (indexed by user
    * directly; reference: Utils/dataset.py:453-506). */
  def urmFromNonDirectLink(impressions: DataFrame,
                           itemSeries: DataFrame): DataFrame =
    impressions
      .select(col("user_id"),
              explode(col("recommended_series_list")).as("series_id"))
      .join(broadcast(itemSeries), "series_id")
      .select(col("user_id").as("u"), col("item_id").as("i"))
      .distinct()
      .withColumn("v", lit(1))

  /** The item↔series dimension from the interaction log (J5;
    * reference: Utils/dataset.py:539-541). */
  def itemSeriesDim(interactions: DataFrame): DataFrame =
    interactions.select("item_id", "series_id").distinct()

  /** Referential-integrity audits from the reference's consistency
    * suite (test_dataset_consistency.py:412-434): every interacted
    * series linked to a recommendation must appear in that
    * recommendation's impression list. Returns violating rows. */
  def auditInteractedSeriesInList(interactions: DataFrame,
                                  impressions: DataFrame): DataFrame =
    interactions
      .filter(col("recommendation_id") >= 0)
      .join(impressions, "recommendation_id")
      .filter(!array_contains(col("recommended_series_list"),
                              col("series_id")))

  /** Schema/domain audit (test_dataset_consistency.py:319-332):
    * declared list length must equal the actual array size. */
  def auditListLength(impressions: DataFrame): DataFrame =
    impressions.filter(
      size(col("recommended_series_list")) =!=
        col("recommendation_list_length"))
}
