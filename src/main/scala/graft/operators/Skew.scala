package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives for heavy-hitter keys (SURVEY.md §7.4:
  * popular-user skew in the similarity self-join).
  *
  * AQE's skew-join splitting handles sort-merge joins at runtime; these
  * utilities cover the cases AQE does not: aggregations on skewed keys
  * (two-phase salted aggregation) and explicit replicated joins where
  * one side must fan out.
  */
object Skew {

  /** Two-phase salted aggregation: count rows per skewed key without a
    * single hot reducer. Phase 1 groups on (key, salt) — spreading a
    * hot key over `salts` reducers — phase 2 merges the partials.
    * Identical result to a direct groupBy(key).count(). */
  def saltedCount(df: DataFrame, key: Column, salts: Int): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id()
                                + monotonically_increasing_id(), lit(salts)))
      .groupBy(key.as("k"), col("_salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy("k").agg(sum("partial").as("cnt"))

  /** Salted equi-join: salt the skewed (big) side randomly, replicate
    * the small side across all salt values, join on (key, salt).
    * Result rows identical to a plain inner join on `key`. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val saltedBig = big.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
           lit(salts)))
    val replicatedSmall = small.withColumn("_salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    saltedBig.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }

  /** Zipf-degree rekey INSTRUMENT for skew soaks: reassign every
    * interaction of a (u, i) frame to a user drawn Zipf(s = 1) over
    * ranks 1..nUsers — per-user degree ∝ 1/rank, the power-law shape
    * of real interaction logs (the CW10M log the reference processes
    * is Zipf-like in per-user events, Utils/dataset.py:63-66) that
    * ScaleSynth's constant-degree copies deliberately avoid. With
    * interactions T growing with sf and rank-1's share T/H(nUsers),
    * the max degree GROWS with sf — exactly the regime where the pair
    * engine's per-user quadratic fan-out goes super-linear and a
    * degree cap ([[graft.similarity.Similarity.capUserDegree]]) must
    * hold the line.
    *
    * Mechanics: x = md5-uniform of (seed, u, i) ∈ (0, 1); rank =
    * ⌊e^(x·ln nUsers)⌋ clamped to [1, nUsers] — the inverse CDF of
    * the s = 1 Zipf CDF P(rank ≤ r) ≈ ln r / ln N. Partition-
    * invariant (pure key function), one narrow projection plus the
    * defensive distinct that restores set semantics after collisions
    * (two source interactions of one item can land on one user).
    *
    * A measurement instrument (Soak/ScaleSynth tier), not a
    * production operator: it DESTROYS the real user axis. */
  def zipfRekeyUsers(urm: DataFrame, nUsers: Long,
                     seed: Int = 0): DataFrame = {
    require(nUsers >= 1, s"nUsers $nUsers must be >= 1")
    val x = graft.stats.Stats.md5Uniform(lit(seed), col("u"), col("i"))
    val rank = least(greatest(
        floor(exp(x * math.log(nUsers.toDouble))).cast("long"),
        lit(1L)), lit(nUsers))
    urm.select(rank.as("u"), col("i")).distinct()
  }
}
