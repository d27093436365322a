package graft.tuning

import org.apache.spark.sql.DataFrame

import graft.eval.Evaluation

/** The reference's COMPLETE tuning lifecycle (§3.2 close-out): search
  * over (train, validation), then retrain the best configuration on
  * train+validation and evaluate it ONCE on the held-out test split at
  * cutoffs 5/10/20 — the step every real user of the reference runs at
  * the end of every search:
  *
  *  - run_hyperparameter_tuning.py:62 passes
  *    `URM_train_last_test = URM_train + URM_validation` alongside the
  *    search's URM_train;
  *  - SearchAbstractClass.py:310-364 (_evaluate_on_test_with_data_last)
  *    refits the recommender on that matrix with
  *    `hyperparameters_best` and calls the test evaluator
  *    (cutoff_list=[5, 10, 20], run_hyperparameter_tuning.py:47-58),
  *    recording `result_on_last`.
  *
  * The fit is supplied as a function of the TRAINING set
  * ([[Spaces.recommender]] provides it per algorithm), so the model
  * retrained on train+validation is byte-for-byte the same code path
  * the search explored — only the data changes. `test` is BY-NAME and
  * forced exactly once, after the search and the retrain: the test
  * split cannot leak into any earlier step through this API, and the
  * LifecycleSpec fixture pins that ordering.
  */
object Lifecycle {

  /** Outcome of one full search-then-final-test run: the decoded best
    * configuration, its validation metric, the trial count, and the
    * test-split metric table (one row per cutoff, the reference's
    * result_on_last). */
  final case class FinalTestResult(
      algorithm: String,
      best: Map[String, Spaces.PValue],
      bestValidationMetric: Double,
      nTrials: Int,
      testMetrics: DataFrame)

  /** Search `space` on (train, validation) with the surrogate strategy
    * (one evaluation for a parameterless space — the reference's
    * SearchSingleCase), retrain the winner on train ∪ validation, and
    * evaluate once on `test` at `testCutoffs`.
    *
    * The splits are disjoint by construction (they come from one split
    * operator), so URM_train + URM_validation is a plain union — the
    * CSR addition of run_hyperparameter_tuning.py:62 on implicit
    * all-ones data. */
  def searchThenFinalTest(
      algorithm: String, space: Spaces.ParamSpace,
      train: DataFrame, validation: DataFrame, test: => DataFrame,
      recsFor: (DataFrame, Map[String, Spaces.PValue], Int) => DataFrame,
      validationCutoff: Int = 10,
      testCutoffs: Seq[Int] = Seq(5, 10, 20),
      nInit: Int = 1, nTotal: Int = 2, seed: Long = 31)
      : FinalTestResult = {
    require(testCutoffs.nonEmpty)
    val searchResult =
      if (space.dims.isEmpty) {
        // SearchSingleCase: no dimensions, one fit+evaluate
        val m = Spaces.mapAt(
          recsFor(train, Map.empty, validationCutoff),
          validation, validationCutoff)
        Search.SearchResult(Search.Trial(Map.empty, m),
                            Seq(Search.Trial(Map.empty, m)))
      } else Search.surrogate(
        Spaces.unitRanges(space), nInit = nInit, nTotal = nTotal,
        candidatePool = 16, kappa = 1.0, seed = seed) { u =>
          Spaces.mapAt(
            recsFor(train, space.decode(u), validationCutoff),
            validation, validationCutoff)
        }
    val bestDecoded: Map[String, Spaces.PValue] =
      if (space.dims.isEmpty) Map.empty
      else space.decode(searchResult.best.params)
    // URM_train_last_test = URM_train + URM_validation — built AFTER
    // the search completes, from the same two frames the search saw
    val lastTrain = train.unionByName(validation)
    val recs = recsFor(lastTrain, bestDecoded, testCutoffs.max)
    // `test` is forced here, and only here
    val metrics = Evaluation.accuracyMetricsAtCutoffs(
      Evaluation.hitTable(recs, test), testCutoffs)
    FinalTestResult(algorithm, bestDecoded, searchResult.best.metric,
                    searchResult.history.size, metrics)
  }
}
