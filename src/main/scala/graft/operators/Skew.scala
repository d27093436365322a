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
}
