package graft.tuning

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.similarity.Similarity
import graft.recommend.Recommenders
import graft.eval.Evaluation

/** Hyperparameter search (SURVEY.md §3.2 / §7.1 module 8): the driver-
  * side loop around distributed fit + evaluate, mirroring the
  * reference's tuning lifecycle (run_hyperparameter_tuning.py →
  * SearchBayesianSkopt) with deterministic grid/random strategies —
  * each trial is a Spark job pipeline; the search state lives on the
  * driver like the reference's skopt loop.
  */
object Search {

  final case class Trial(params: Map[String, Double], metric: Double)
  final case class SearchResult(best: Trial, history: Seq[Trial])

  /** Evaluate one ItemKNN-cosine configuration: similarity(shrink) →
    * topK prune → score → recommend@cutoff → MAP (the reference's
    * optimization target, run_hyperparameter_tuning.py:110-113). */
  def evaluateItemKnn(train: DataFrame, validation: DataFrame,
                      topK: Int, shrink: Double, cutoff: Int): Double = {
    val sim = Similarity.topK(
      Similarity.itemSimilarity(train, Similarity.Cosine, shrink), topK)
      .select(col("i"), col("j"), col("w"))
    val scores = Recommenders.scoreBySimilarity(train, sim)
    val recs = Recommenders.recommend(scores, train, cutoff)
      .select("u", "item", "rank")
    val m = Evaluation.accuracyMetrics(
      Evaluation.hitTable(recs, validation), cutoff)
    val row = m.select("map").collect()
    if (row.isEmpty) 0.0 else row.head.getDouble(0)
  }

  /** Deterministic grid search: evaluates every combination, returns
    * the best by metric (ties → first in grid order). */
  def grid(paramGrid: Seq[Map[String, Double]])
          (evaluate: Map[String, Double] => Double): SearchResult = {
    val history = paramGrid.map(p => Trial(p, evaluate(p)))
    SearchResult(history.maxBy(_.metric), history)
  }

  /** Seeded random search over ranges: `n` draws from uniform ranges
    * (the reference's 15 random starts, run_parameter_search.py). */
  def random(ranges: Map[String, (Double, Double)], n: Int, seed: Long)
            (evaluate: Map[String, Double] => Double): SearchResult = {
    val rng = new scala.util.Random(seed)
    val history = (0 until n).map { _ =>
      val p = ranges.map { case (k, (lo, hi)) =>
        k -> (lo + rng.nextDouble() * (hi - lo))
      }
      Trial(p, evaluate(p))
    }
    SearchResult(history.maxBy(_.metric), history)
  }
}
