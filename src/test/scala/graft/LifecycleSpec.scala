package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.tuning.{Lifecycle, Spaces}

/** The final-test retrain lifecycle (reference:
  * SearchAbstractClass.py:310-364 _evaluate_on_test_with_data_last +
  * run_hyperparameter_tuning.py:62 URM_train_last_test): the search
  * fits on train only, the LAST fit refits on train+validation, and
  * the test split is untouched until that final evaluation.
  */
class LifecycleSpec extends SparkSpec {
  import spark.implicits._

  // 40 users × items 0..19: user u saw items u%7, u%7+1, u%7+2 (train
  // slice is deterministic here; the split frames are handcrafted so
  // their row counts are distinguishable: |train|=120, |valid|=40,
  // |test|=40)
  private def mkSplit(): (DataFrame, DataFrame, DataFrame) = {
    val train = (0 until 40).flatMap(u =>
      Seq((u, u % 7), (u, u % 7 + 1), (u, u % 7 + 2))).toDF("u", "i")
    val valid = (0 until 40).map(u => (u, u % 7 + 3)).toDF("u", "i")
    val test = (0 until 40).map(u => (u, u % 7 + 4)).toDF("u", "i")
    (train, valid, test)
  }

  test("retrain uses train+validation; test forced once, only at the end") {
    val (train, valid, test) = mkSplit()
    val nTrain = train.count()
    val nTrainVal = nTrain + valid.count()

    // recording harness: log the training-set row count of every fit,
    // and count forcings of the by-name test argument
    val fitLog = scala.collection.mutable.ArrayBuffer[Long]()
    var testForced = 0
    val inner = Spaces.recommender("top_pop", spark)
    val recording: (DataFrame, Map[String, Spaces.PValue], Int) => DataFrame =
      (tr, p, cutoff) => { fitLog += tr.count(); inner(tr, p, cutoff) }
    def testSplit: DataFrame = {
      testForced += 1
      // every fit must precede the first (and only) forcing of test
      assert(fitLog.nonEmpty && fitLog.last == nTrainVal,
             "test split was forced before the final retrain completed")
      test
    }

    val res = Lifecycle.searchThenFinalTest(
      "top_pop", Spaces.catalog.toMap.apply("top_pop"),
      train, valid, testSplit, recording)

    // search fit(s) saw train ONLY; the single final fit saw train+val
    assert(fitLog.init.forall(_ == nTrain),
           s"search-phase fits must train on train only, got $fitLog")
    assert(fitLog.last == nTrainVal,
           s"final fit must train on train+validation, got ${fitLog.last}")
    assert(testForced == 1, s"test forced $testForced times, expected 1")
    assert(res.nTrials == 1) // parameterless → SearchSingleCase
    // one metric row per cutoff, reference order 5/10/20
    val cutoffs = res.testMetrics.select("cutoff").as[Int].collect().sorted
    assert(cutoffs.toSeq == Seq(5, 10, 20))
  }

  test("early-stopped epochs flow into the final retrain config") {
    // the reference overwrites the epoch hyperparameter with the
    // early-stopping selection before recording the trial
    // (SearchAbstractClass.py:378-390); the retrain must receive it
    val (train, valid, test) = mkSplit()
    var finalEpochs = -1
    val topPop = Spaces.recommender("top_pop", spark)
    val res = Lifecycle.searchThenFinalTestAdjusted(
      "fake_early_stop", Spaces.catalog.toMap.apply("pure_svd"),
      train, valid, test,
      trial = (_, p, _) => (0.5, p + ("epochs" -> Spaces.PNum(2))),
      finalFit = (tr, p, cutoff) => {
        finalEpochs = p("epochs") match {
          case Spaces.PNum(v) => v.toInt
          case _ => -1
        }
        topPop(tr, Map.empty, cutoff)
      },
      nTotal = 2, seed = 7)
    assert(finalEpochs == 2,
           "final fit must receive the early-stopped epoch count")
    assert(res.best("epochs") == Spaces.PNum(2))
  }

  test("lifecycle trial state resumes metrics AND adjusted configs") {
    // the reference metadata dict stores the ADJUSTED config per trial
    // (it contains early-stopping epochs the declared space doesn't),
    // so a resumed search replays both facts without re-fitting
    // (SearchBayesianSkopt.py:94-135)
    val (train, valid, test) = mkSplit()
    val state = java.nio.file.Files.createTempFile("lifecycle", ".jsonl")
    java.nio.file.Files.delete(state)
    var fits = 0
    val topPop = Spaces.recommender("top_pop", spark)
    val trial: (DataFrame, Map[String, Spaces.PValue], Int)
        => (Double, Map[String, Spaces.PValue]) = (_, p, _) => {
      fits += 1
      val a = p("alpha") match { case Spaces.PNum(v) => v; case _ => 0.0 }
      (1.0 - math.abs(a - 0.5), p + ("epochs" -> Spaces.PNum(2)))
    }
    var lastFinalConfig: Map[String, Spaces.PValue] = Map.empty
    def run(): graft.tuning.Lifecycle.FinalTestResult =
      Lifecycle.searchThenFinalTestAdjusted(
        "rp3beta_fake", Spaces.catalog.toMap.apply("rp3beta"),
        train, valid, test, trial,
        finalFit = (tr, p, cutoff) => {
          lastFinalConfig = p; topPop(tr, Map.empty, cutoff)
        },
        nTotal = 3, seed = 13, trialState = Some(state))
    val first = run()
    assert(fits == 3)
    assert(first.best("epochs") == Spaces.PNum(2))
    // resume: zero re-fits, identical best (metric and adjustment),
    // the final fit again receives the replayed adjusted config
    val resumed = run()
    assert(fits == 3, s"resume must not re-fit (ran ${fits - 3} extra)")
    assert(resumed.best == first.best)
    assert(resumed.bestValidationMetric == first.bestValidationMetric)
    assert(lastFinalConfig("epochs") == Spaces.PNum(2))
  }

  test("a crashing trial records the invalid sentinel; search continues") {
    // reference: exception recorded, cost = INVALID_CONFIG_VALUE,
    // search proceeds (SearchAbstractClass.py:465-477)
    val (train, valid, test) = mkSplit()
    val topPop = Spaces.recommender("top_pop", spark)
    var calls = 0
    val res = Lifecycle.searchThenFinalTestAdjusted(
      "flaky", Spaces.catalog.toMap.apply("rp3beta"),
      train, valid, test,
      trial = (_, p, _) => {
        calls += 1
        val a = p("alpha") match { case Spaces.PNum(v) => v; case _ => 0.0 }
        if (calls == 1) sys.error("simulated trial crash")
        (1.0 - math.abs(a - 0.5), p)
      },
      finalFit = (tr, _, cutoff) => topPop(tr, Map.empty, cutoff),
      nTotal = 3, seed = 19)
    assert(calls == 3, "the crash must not abort the remaining trials")
    assert(res.bestValidationMetric > Lifecycle.InvalidConfigValue)
    assert(!res.best.contains("_exception"),
           "a failed trial must never be selected as best")
    // all-fail: nothing valid to retrain — reject like the reference's
    // hyperparameters_best assertion
    val ex = intercept[IllegalArgumentException] {
      Lifecycle.searchThenFinalTestAdjusted(
        "always_fails", Spaces.catalog.toMap.apply("rp3beta"),
        train, valid, test,
        trial = (_, _, _) => sys.error("boom"),
        finalFit = (tr, _, cutoff) => topPop(tr, Map.empty, cutoff),
        nTotal = 2, seed = 19)
    }
    assert(ex.getMessage.contains("no valid"))
  }

  test("trial-state resume tolerates hostile exception text and " +
       "foreign lines") {
    // a crashing trial's record replays on resume: the re-run must
    // not re-execute the failed fit — even when the exception text
    // carries control characters, and the state file holds lines from
    // other formats
    val hostile = "boom\nline2\t\"quoted\"\\back\r"
    val (train, valid, test) = mkSplit()
    val state = java.nio.file.Files.createTempFile("crash", ".jsonl")
    // foreign/corrupt lines a resume must tolerate: legacy TSV, a
    // Search.resumable-shaped record (missing "adjusted"), truncation
    java.nio.file.Files.write(state,
      ("alpha=0.5\t0.42\n" +
       """{"params": {"z": 0.1}, "metric": 0.3, "best_so_far": 0.3}""" +
       "\n" +
       """{"params": {"q": 0.2}, "metr""" + "\n").getBytes("UTF-8"))
    var crashes = 0
    val topPop = graft.tuning.Spaces.recommender("top_pop", spark)
    def run() = Lifecycle.searchThenFinalTestAdjusted(
      "crashy", graft.tuning.Spaces.catalog.toMap.apply("rp3beta"),
      train, valid, test,
      trial = (_, p, _) => {
        val a = p("alpha") match { case Spaces.PNum(v) => v; case _ => 0.0 }
        if (a > 1.0) { crashes += 1; sys.error(hostile) }
        (1.0 - math.abs(a - 0.5), p)
      },
      finalFit = (tr, _, c) => topPop(tr, Map.empty, c),
      nTotal = 4, seed = 3, trialState = Some(state))
    val first = run()
    val crashesFirst = crashes
    val resumed = run()
    assert(crashes == crashesFirst,
           "resume must replay failed trials from state, not re-crash")
    assert(resumed.best == first.best)
    assert(resumed.bestValidationMetric == first.bestValidationMetric)
  }

  test("searched space: best config is refit, metrics finite") {
    val (train, valid, test) = mkSplit()
    val fitParams =
      scala.collection.mutable.ArrayBuffer[Map[String, Spaces.PValue]]()
    val inner = Spaces.recommender("item_knn_cosine", spark)
    val recording: (DataFrame, Map[String, Spaces.PValue], Int) => DataFrame =
      (tr, p, cutoff) => { fitParams += p; inner(tr, p, cutoff) }

    val res = Lifecycle.searchThenFinalTest(
      "item_knn_cosine", Spaces.catalog.toMap.apply("item_knn_cosine"),
      train, valid, test, recording, nTotal = 2, seed = 5)

    assert(res.nTrials == 2)
    // the retrain (last fit) used exactly the decoded best config
    assert(fitParams.last == res.best,
           "final fit must use hyperparameters_best")
    assert(res.best.contains("topK") && res.best.contains("shrink"))
    val maps = res.testMetrics.select("map").as[Double].collect()
    assert(maps.length == 3 && maps.forall(m => m >= 0.0 && m <= 1.0))
    // validation metric belongs to [0, 1] too (MAP)
    assert(res.bestValidationMetric >= 0.0 &&
           res.bestValidationMetric <= 1.0)
  }
}
