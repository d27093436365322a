package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature-weighting transforms applied to the URM before similarity
  * (SURVEY.md §2.8 L4/L5; reference: Base/IR_feature_weighting.py).
  *
  * MLlib's IDF uses a different formula, so both are implemented
  * directly as column expressions (one document-frequency aggregation
  * joined back — a broadcastable aggregate, never a second scan-sized
  * shuffle).
  */
object Weighting {

  /** TF-IDF: w(u,i) = sqrt(tf) · ln(N / (1 + df_i))
    * (reference: Base/IR_feature_weighting.py:55-78; tf is 1 for binary
    * URMs so the row factor degenerates to the idf). */
  def tfidf(urm: DataFrame): DataFrame = {
    val nUsers = urm.select("u").distinct().count()
    val df = urm.groupBy("i").agg(count(lit(1)).as("df"))
    urm.join(broadcast(df), "i")
      .withColumn("w",
        sqrt(col("v").cast("double")) * log(lit(nUsers.toDouble) / (col("df") + 1)))
      .select("u", "i", "w")
  }

  /** Okapi BM25 with K1=1.2, B=0.75
    * (reference: Base/IR_feature_weighting.py:13-50):
    * w(u,i) = idf_i · tf·(K1+1) / (tf + K1·(1 − B + B·len_u/avg_len)),
    * idf_i = ln((N − df_i + 0.5) / (df_i + 0.5)). */
  def bm25(urm: DataFrame, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val nUsers = urm.select("u").distinct().count()
    val nnz = urm.count()
    val avgLen = nnz.toDouble / nUsers
    val df = urm.groupBy("i").agg(count(lit(1)).as("df"))
    val rowLen = urm.groupBy("u").agg(count(lit(1)).as("len"))
    val tf = col("v").cast("double")
    urm.join(broadcast(df), "i").join(broadcast(rowLen), "u")
      .withColumn("idf",
        log((lit(nUsers.toDouble) - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("w",
        col("idf") * tf * (k1 + 1) /
          (tf + lit(k1) * (lit(1 - b) + lit(b) * col("len") / avgLen)))
      .select("u", "i", "w")
  }
}
