package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Item-item similarity pair-aggregation engine (SURVEY.md §2.8 L2/L3,
  * L28; reference: Base/Similarity/Compute_Similarity_Python.py:20-390).
  *
  * The reference runs a blocked AᵀA with NumPy (block_size=100 columns);
  * here the same math is one shuffle: a self-join of the URM on the user
  * key aggregated to pair dot-products, then per-column norm joins and a
  * top-K ranking window. Catalyst plans the self-join as a shuffled hash
  * join partitioned by user; AQE handles heavy-hitter users (skew-join
  * split) — the analog of the reference's memory-bounded blocking.
  *
  * For binary URMs every dot-product and norm is an exact integer, so
  * cosine/Jaccard/Dice/Tversky weights are bit-deterministic (IEEE sqrt
  * and division) — which is what makes these oracle-checkable.
  */
object Similarity {

  sealed trait Measure
  case object Cosine extends Measure
  /** Asymmetric cosine: dot / (nᵢᵃ · nⱼ^(1−a))
    * (reference: Compute_Similarity_Python.py:318-325). */
  final case class AsymmetricCosine(alpha: Double) extends Measure
  case object Jaccard extends Measure
  case object Dice extends Measure
  /** reference: Compute_Similarity_Python.py:330-340. */
  final case class Tversky(alpha: Double, beta: Double) extends Measure
  /** ‖a‖² + ‖b‖² − 2a·b with lin/log/exp transform
    * (reference: Compute_Similarity_Euclidean.py:196-205). */
  final case class Euclidean(transform: String) extends Measure

  /** Pairwise co-occurrence counts (dot products of binary item columns):
    * both orientations (i,j) and (j,i) emitted, diagonal excluded —
    * mirrors the reference's zeroed self-similarity
    * (Compute_similarity_test.py:37-56). */
  def pairDots(urm0: DataFrame): DataFrame = {
    // the URM subtree feeds both self-join sides (and the caller's norm
    // aggregation): persist once — the physical plan shows no exchange
    // reuse across the aliased sides otherwise (idempotent if the
    // caller already persisted the same frame)
    val urm = urm0.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = urm.select(col("u"), col("i").as("i1"))
    val b = urm.select(col("u"), col("i").as("i2"))
    a.join(b, "u")
      .filter(col("i1") =!= col("i2"))
      .groupBy(col("i1").as("i"), col("i2").as("j"))
      .agg(count(lit(1)).as("dot"))
  }

  /** Per-item interaction counts (squared L2 norms of binary columns). */
  def itemNorms(urm: DataFrame): DataFrame =
    urm.groupBy(col("i")).agg(count(lit(1)).as("n"))

  /** Full similarity matrix as (i, j, w) triples for a binary URM. */
  def itemSimilarity(urm0: DataFrame, measure: Measure,
                     shrink: Double = 0.0): DataFrame = {
    val urm = urm0.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dots = pairDots(urm)
    val norms = itemNorms(urm)
    val ni = norms.select(col("i").as("i"), col("n").as("ni"))
    val nj = norms.select(col("i").as("j"), col("n").as("nj"))
    val joined = dots.join(broadcast(ni), "i").join(broadcast(nj), "j")
    val d = col("dot").cast("double")
    val w: Column = measure match {
      case Cosine =>
        d / (sqrt(col("ni")) * sqrt(col("nj")) + lit(shrink))
      case AsymmetricCosine(a) =>
        d / (pow(col("ni"), a) * pow(col("nj"), 1.0 - a) + lit(shrink))
      case Jaccard =>
        d / (col("ni") + col("nj") - col("dot") + lit(shrink))
      case Dice =>
        d * 2 / (col("ni") + col("nj") + lit(shrink))
      case Tversky(a, b) =>
        d / (d + (col("ni") - col("dot")) * a +
             (col("nj") - col("dot")) * b + lit(shrink))
      case Euclidean(transform) =>
        val sq = col("ni") + col("nj") - lit(2) * col("dot")
        val dist = sqrt(sq.cast("double"))
        transform match {
          case "lin" => lit(1.0) / (dist + lit(shrink) + lit(1e-9))
          case "log" => lit(1.0) / (log(dist + lit(1.0)) + lit(shrink) + lit(1e-9))
          case "exp" => lit(1.0) / (exp(dist) + lit(shrink) + lit(1e-9))
        }
    }
    joined.select(col("i"), col("j"), w.as("w"))
  }

  /** L28/T4 — column-wise top-K sparsification
    * (reference: Base/Recommender_utils.py:55-122): keep the K strongest
    * neighbors per column, deterministic tie-break on neighbor id. */
  def topK(sim: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("i").orderBy(desc("w"), asc("j"))
    sim.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
