package graft.similarity

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Content-based and hybrid feature matrices (SURVEY.md §2.8 L13–L14).
  *
  * The reference's ICM/UCM are item×feature sparse matrices
  * (Data_manager/DataReader.py:46-50); here they are (f, i, w) triple
  * frames sharing the similarity pair-engine with the URM — the "f"
  * dimension plays the role the user dimension plays for CF.
  */
object ContentSimilarity {

  /** Item content matrix from the part dimension: brand, type, and a
    * size bucket as categorical features (weight 1). */
  def icmFromPart(t: Tables): DataFrame = {
    val p = t.part
    val brand = p.select(concat(lit("brand:"), col("p_brand")).as("f"),
                         col("p_partkey").as("i"))
    val ptype = p.select(concat(lit("type:"), col("p_type")).as("f"),
                         col("p_partkey").as("i"))
    val size = p.select(
      concat(lit("size:"), floor(col("p_size") / 10)).as("f"),
      col("p_partkey").as("i"))
    brand.unionByName(ptype).unionByName(size)
      .withColumn("w", lit(1.0))
  }

  /** L14 — CF+CBF hybrid: stack the weighted ICM on top of the
    * user-interaction features (reference:
    * KNN/ItemKNN_CFCBF_Hybrid_Recommender.py:15-29 hstacks
    * [ICM·w, URMᵀ]). Feature ids are namespaced strings, so the offset
    * trick of the reference is just string prefixes. */
  def hybridFeatures(icm: DataFrame, urm: DataFrame, icmWeight: Double)
      : DataFrame = {
    val weighted = icm.select(col("f"), col("i"),
                              (col("w") * icmWeight).as("w"))
    val cf = urm.select(concat(lit("u:"), col("u")).as("f"), col("i"),
                        lit(1.0).as("w"))
    weighted.unionByName(cf)
  }

  /** Weighted cosine item-item similarity over (f, i, w) triples:
    * dot(i,j) = Σ_f w_f(i)·w_f(j), norm(i) = Σ_f w_f(i)². With weights
    * that are exact binary fractions the aggregation stays exact. */
  def weightedItemSimilarity(features0: DataFrame): DataFrame = {
    val features = graft.core.CacheScope.persist(features0)
    val a = features.select(col("f"), col("i").as("i1"), col("w").as("w1"))
    val b = features.select(col("f"), col("i").as("i2"), col("w").as("w2"))
    // upper triangle + mirror (the pairDots trick): the dot is
    // symmetric, so generate/aggregate half the pair fan-out and
    // explode each aggregated row into both orientations
    val dots = graft.similarity.Similarity.mirrorPairs(
      a.join(b, "f")
        .filter(col("i1") < col("i2"))
        .groupBy(col("i1").as("i"), col("i2").as("j"))
        .agg(sum(col("w1") * col("w2")).as("dot")),
      "dot")
    val norms = features.groupBy("i").agg(sum(col("w") * col("w")).as("nn"))
    dots
      .join(broadcast(norms.select(col("i"), col("nn").as("ni"))), "i")
      .join(broadcast(norms.select(col("i").as("j"), col("nn").as("nj"))),
            "j")
      .select(col("i"), col("j"),
              (col("dot") / (sqrt(col("ni")) * sqrt(col("nj")))).as("w"))
  }
}
