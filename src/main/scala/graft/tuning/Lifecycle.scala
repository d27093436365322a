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

  /** The failed-trial sentinel: the reference penalizes a crashed
    * configuration with np.finfo(np.float16).max = 65504 on its
    * minimized cost (SearchAbstractClass.py:118, :477); this engine
    * maximizes the metric, so the sentinel is its negation. Large but
    * FINITE — it steers the surrogate away without breaking the ridge
    * solve the way −∞/NaN would. */
  val InvalidConfigValue: Double = -65504.0

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
      : FinalTestResult =
    searchThenFinalTestAdjusted(
      algorithm, space, train, validation, test,
      trial = (tr, p, c) =>
        (Spaces.mapAt(recsFor(tr, p, c), validation, c), p),
      finalFit = recsFor,
      validationCutoff = validationCutoff, testCutoffs = testCutoffs,
      nInit = nInit, nTotal = nTotal, seed = seed)

  /** The general lifecycle, with the reference's early-stopping epoch
    * capture (SearchAbstractClass.py:366-390 _objective_function: when
    * a trial trains with early stopping, the SELECTED epoch count
    * overwrites the epoch hyperparameter in that trial's recorded
    * configuration, so `hyperparameters_best` carries it and the final
    * retrain — which has no validation set left to monitor — fits for
    * exactly that many epochs).
    *
    * `trial` fits one configuration on a training set and returns
    * (validation metric, ADJUSTED configuration) — for most algorithms
    * the adjustment is the identity; an early-stopped trial returns
    * the config with `epochs` replaced by the selected epoch.
    * `finalFit` refits an (adjusted) configuration on a training set
    * and returns top-`cutoff` recommendations. */
  def searchThenFinalTestAdjusted(
      algorithm: String, space: Spaces.ParamSpace,
      train: DataFrame, validation: DataFrame, test: => DataFrame,
      trial: (DataFrame, Map[String, Spaces.PValue], Int)
               => (Double, Map[String, Spaces.PValue]),
      finalFit: (DataFrame, Map[String, Spaces.PValue], Int) => DataFrame,
      validationCutoff: Int = 10,
      testCutoffs: Seq[Int] = Seq(5, 10, 20),
      nInit: Int = 1, nTotal: Int = 2, seed: Long = 31,
      trialState: Option[java.nio.file.Path] = None)
      : FinalTestResult = {
    require(testCutoffs.nonEmpty)
    // adjusted configurations recorded per unit-cube point, keyed the
    // same way Search.resumable keys trials. With `trialState`, each
    // completed trial appends a JSON record carrying BOTH the metric
    // and the adjusted configuration — the reference metadata dict
    // stores the adjusted config per model_counter exactly so a
    // resumed search can replay it (SearchBayesianSkopt.py:94-135
    // re-projects saved configs, intercepting values early stopping
    // wrote outside the declared space); a resumed lifecycle here
    // replays metric AND adjustment without re-fitting.
    import TrialState.{jsonNumber, jstr, key}
    val adjusted =
      scala.collection.mutable.Map[String, Map[String, Spaces.PValue]]()
    val savedMetrics = scala.collection.mutable.Map[String, Double]()
    trialState.foreach { path =>
      import scala.jdk.CollectionConverters._
      TrialState.readRecords(path,
          Seq("params", "metric", "adjusted")).foreach { node =>
        val pn = node.get("params")
        val u = pn.fieldNames.asScala
          .map(k => k -> pn.get(k).asDouble()).toMap
        val an = node.get("adjusted")
        val adj = an.fieldNames.asScala.map { k =>
          val v = an.get(k)
          val pv: Spaces.PValue =
            if (v.isNumber) Spaces.PNum(v.asDouble())
            else Spaces.PStr(v.asText())
          k -> pv
        }.toMap
        // replayed metrics pass through the same non-finite coercion
        // as fresh ones (a pre-sanitization state file may carry NaN)
        val replayed = node.get("metric").asDouble()
        savedMetrics(key(u)) =
          if (java.lang.Double.isFinite(replayed)) replayed
          else Lifecycle.InvalidConfigValue
        adjusted(key(u)) = adj
      }
    }
    def persistTrial(u: Map[String, Double], m: Double,
                     adj: Map[String, Spaces.PValue]): Unit =
      trialState.foreach { path =>
        val pJson = u.toSeq.sortBy(_._1)
          .map { case (k, v) => s"${jstr(k)}: ${jsonNumber(v)}" }
          .mkString("{", ", ", "}")
        val aJson = adj.toSeq.sortBy(_._1).map {
          case (k, Spaces.PNum(v)) => s"${jstr(k)}: ${jsonNumber(v)}"
          case (k, Spaces.PStr(v)) => s"${jstr(k)}: ${jstr(v)}"
        }.mkString("{", ", ", "}")
        TrialState.appendLine(path,
          s"""{"params": $pJson, "metric": ${jsonNumber(m)}, """ +
            s""""adjusted": $aJson}""")
      }
    def runTrial(u: Map[String, Double],
                 decoded: Map[String, Spaces.PValue]): Double =
      savedMetrics.getOrElse(key(u), {
        // a failing configuration records the invalid sentinel and the
        // search CONTINUES — the reference's exception_list behavior
        // (SearchAbstractClass.py:465-477: traceback recorded, cost =
        // +INVALID_CONFIG_VALUE); the sentinel region looks maximally
        // bad to the surrogate, steering the acquisition away from it
        val (m0, adj) =
          try trial(train, decoded, validationCutoff)
          catch {
            case scala.util.control.NonFatal(e) =>
              (Lifecycle.InvalidConfigValue,
               decoded + ("_exception" ->
                 (Spaces.PStr(e.toString.take(200)): Spaces.PValue)))
          }
        // a trial that RETURNS a non-finite metric is as failed as one
        // that throws: NaN must not reach maxBy (Scala's total
        // ordering ranks it above every real metric) and ±Infinity
        // would collapse the surrogate's target standardization
        val m =
          if (java.lang.Double.isFinite(m0)) m0
          else Lifecycle.InvalidConfigValue
        adjusted(key(u)) = adj
        savedMetrics(key(u)) = m
        persistTrial(u, m, adj)
        m
      })
    val searchResult =
      if (space.dims.isEmpty) {
        // SearchSingleCase: no dimensions, one fit+evaluate
        val m = runTrial(Map.empty, Map.empty)
        Search.SearchResult(Search.Trial(Map.empty, m),
                            Seq(Search.Trial(Map.empty, m)))
      } else Search.surrogate(
        Spaces.unitRanges(space), nInit = nInit, nTotal = nTotal,
        candidatePool = 16, kappa = 1.0, seed = seed) { u =>
          runTrial(u, space.decode(u))
        }
    // the reference asserts hyperparameters_best exists before the
    // last-test refit (SearchAbstractClass.py:335); with every trial
    // failed there is nothing valid to retrain
    require(searchResult.best.metric > InvalidConfigValue,
      s"$algorithm: every searched configuration failed; no valid " +
        "best to retrain")
    val bestAdjusted = adjusted(key(searchResult.best.params))
    // URM_train_last_test = URM_train + URM_validation — built AFTER
    // the search completes, from the same two frames the search saw
    val lastTrain = train.unionByName(validation)
    val recs = finalFit(lastTrain, bestAdjusted, testCutoffs.max)
    // `test` is forced here, and only here
    val metrics = Evaluation.accuracyMetricsAtCutoffs(
      Evaluation.hitTable(recs, test), testCutoffs)
    FinalTestResult(algorithm, bestAdjusted, searchResult.best.metric,
                    searchResult.history.size, metrics)
  }
}
