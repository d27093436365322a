package graft

import org.apache.spark.sql.functions._

import graft.tuning.{Search, Spaces}
import graft.tuning.Spaces._
import graft.etl.Urm

/** The hyperparameter-space catalog (reference:
  * run_parameter_search.py:180-710) and the search strategies that
  * consume it: definition pinning, unit-cube decode semantics, the
  * kill-and-resume guarantee, and one end-to-end smoke evaluator.
  */
class SpacesSpec extends SparkSpec {
  import spark.implicits._

  test("catalog pins the reference spaces (run_parameter_search.py)") {
    val byAlg = Spaces.catalog.toMap
    assert(Spaces.catalog.map(_._1) ==
      Seq("random", "top_pop", "item_knn_cosine", "item_knn_jaccard",
          "item_knn_asymmetric", "item_knn_dice", "item_knn_tversky",
          "item_knn_euclidean",
          "rp3beta", "pure_svd", "ials", "nmf", "mf_bpr_impressions"))
    assert(byAlg("random").dims.isEmpty && byAlg("top_pop").dims.isEmpty)
    // ItemKNN base space: topK Integer(5,1000), shrink Integer(0,1000)
    val cos = byAlg("item_knn_cosine").dims.toMap
    assert(cos("topK") == IntDim(5, 1000) && cos("shrink") == IntDim(0, 1000))
    assert(cos("normalize") == CatDim(Seq("true", "false")))
    assert(cos("feature_weighting") ==
      CatDim(Seq("none", "BM25", "TF-IDF")))
    // asymmetric/tversky pin normalize=true and add their alphas
    val asym = byAlg("item_knn_asymmetric").dims.toMap
    assert(asym("normalize") == CatDim(Seq("true")))
    assert(asym("asymmetric_alpha") == RealDim(0, 2))
    val tv = byAlg("item_knn_tversky").dims.toMap
    assert(tv("tversky_alpha") == RealDim(0, 2) &&
           tv("tversky_beta") == RealDim(0, 2))
    // set similarities take no feature weighting
    assert(!byAlg("item_knn_jaccard").keys.contains("feature_weighting"))
    assert(!byAlg("item_knn_tversky").keys.contains("feature_weighting"))
    // euclidean branch (run_parameter_search.py:196-199): normalize
    // stays two-valued, gains avg-row + distance-mode dims, and keeps
    // feature weighting (not a set similarity)
    val euc = byAlg("item_knn_euclidean").dims.toMap
    assert(euc("normalize") == CatDim(Seq("true", "false")))
    assert(euc("normalize_avg_row") == CatDim(Seq("true", "false")))
    assert(euc("similarity_from_distance_mode") ==
      CatDim(Seq("lin", "log", "exp")))
    assert(euc("feature_weighting") == CatDim(Seq("none", "BM25", "TF-IDF")))
    assert(byAlg("item_knn_euclidean").keys ==
      Seq("topK", "shrink", "similarity", "normalize",
          "normalize_avg_row", "similarity_from_distance_mode",
          "feature_weighting"))
    // graph/MF spaces
    assert(byAlg("rp3beta").dims.toMap.apply("beta") == RealDim(0, 2))
    assert(byAlg("pure_svd").dims == Seq("num_factors" -> IntDim(1, 350)))
    // IALS (run_parameter_search.py:588-596): confidence_scaling is a
    // live categorical, alpha/epsilon/reg log-uniform
    assert(byAlg("ials").dims == Seq(
      "num_factors" -> IntDim(1, 200),
      "confidence_scaling" -> CatDim(Seq("linear", "log")),
      "alpha" -> RealDim(1e-3, 50.0, logUniform = true),
      "epsilon" -> RealDim(1e-3, 10.0, logUniform = true),
      "reg" -> RealDim(1e-5, 1e-2, logUniform = true)))
    // NMF (run_parameter_search.py:616-622): solver/init_type/
    // beta_loss categoricals; l1_ratio is declared on fit() but NOT
    // searched — it must not be a dimension
    assert(byAlg("nmf").dims == Seq(
      "num_factors" -> IntDim(1, 350),
      "solver" -> CatDim(Seq("coordinate_descent", "multiplicative_update")),
      "init_type" -> CatDim(Seq("random", "nndsvda")),
      "beta_loss" -> CatDim(Seq("frobenius", "kullback-leibler"))))
    assert(!byAlg("nmf").keys.contains("l1_ratio"))
    val bpr = byAlg("mf_bpr_impressions").dims.toMap
    assert(bpr("learning_rate") == RealDim(1e-4, 1e-1, logUniform = true))
    assert(bpr("positive_reg") == RealDim(1e-5, 1e-2, logUniform = true))
    assert(bpr("num_factors") == IntDim(1, 200))
    assert(bpr("impression_sampling_mode") ==
      CatDim(Seq("none", "inside", "outside")))
    assert(bpr("batch_size") == CatDim(Seq("1", "2", "4", "8", "16",
      "32", "64", "128", "256", "512", "1024")))
  }

  test("unit-cube decode matches skopt semantics at the boundaries") {
    // Integer: inclusive bounds, u=1 stays at hi
    assert(IntDim(5, 1000).decode(0.0) == PNum(5))
    assert(IntDim(5, 1000).decode(1.0) == PNum(1000))
    assert(IntDim(1, 2).decode(0.49) == PNum(1))
    assert(IntDim(1, 2).decode(0.51) == PNum(2))
    // Real log-uniform: endpoints exact, midpoint is the geometric mean
    val lr = RealDim(1e-4, 1e-1, logUniform = true)
    val PNum(lo) = lr.decode(0.0): @unchecked
    val PNum(mid) = lr.decode(0.5): @unchecked
    val PNum(hi) = lr.decode(1.0): @unchecked
    assert(math.abs(lo - 1e-4) < 1e-12 && math.abs(hi - 1e-1) < 1e-12)
    assert(math.abs(mid - math.sqrt(1e-4 * 1e-1)) < 1e-12)
    // Categorical: uniform thirds, u=1 clamps to the last value
    val cat = CatDim(Seq("none", "inside", "outside"))
    assert(cat.decode(0.0) == PStr("none"))
    assert(cat.decode(0.5) == PStr("inside"))
    assert(cat.decode(1.0) == PStr("outside"))
  }

  test("surrogate kill-and-resume reproduces the uninterrupted search " +
       "trial-for-trial") {
    val ranges = Spaces.unitRanges(Spaces.rp3beta)
    def metric(p: Map[String, Double]): Double = {
      val d = Spaces.rp3beta.decode(p)
      val a = d("alpha") match { case PNum(v) => v; case _ => 0.0 }
      val b = d("beta") match { case PNum(v) => v; case _ => 0.0 }
      -(a - 0.9) * (a - 0.9) - (b - 0.3) * (b - 0.3)
    }
    // the uninterrupted reference run
    val full = Search.surrogate(ranges, nInit = 3, nTotal = 8,
      candidatePool = 24, kappa = 1.0, seed = 99)(metric)
    // the same search killed mid-flight at trial 5...
    val state = java.nio.file.Files.createTempFile("resume", ".jsonl")
    java.nio.file.Files.delete(state)
    var calls = 0
    def budgeted(limit: Int): Map[String, Double] => Double =
      Search.resumable(state) { p =>
        calls += 1
        if (calls > limit) sys.error("killed")
        metric(p)
      }
    intercept[RuntimeException] {
      Search.surrogate(ranges, nInit = 3, nTotal = 8,
        candidatePool = 24, kappa = 1.0, seed = 99)(budgeted(5))
    }
    // ...then resumed: the 5 persisted trials replay from the state
    // file (the evaluator is NOT called for them — calls stays at the
    // resumed run's 3 fresh evaluations), and the trial sequence is
    // identical to the uninterrupted one
    calls = 0
    val resumed = Search.surrogate(ranges, nInit = 3, nTotal = 8,
      candidatePool = 24, kappa = 1.0, seed = 99)(budgeted(Int.MaxValue))
    assert(calls == 3, s"resume re-evaluated persisted trials ($calls)")
    assert(resumed.history.map(_.params) == full.history.map(_.params))
    assert(resumed.history.map(_.metric) == full.history.map(_.metric))
    assert(resumed.best == full.best)
    // the state file is the reference's metadata shape (JSON records
    // with params / metric / best-so-far, SearchBayesianSkopt.py:
    // 72-135): every line parses, best_so_far is the running max
    import scala.jdk.CollectionConverters._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val records = java.nio.file.Files.readAllLines(state).asScala
      .filter(_.nonEmpty).map(mapper.readTree)
    assert(records.size == 8, s"8 trials persisted, got ${records.size}")
    val metrics = records.map(_.get("metric").asDouble()).toSeq
    val bests = records.map(_.get("best_so_far").asDouble()).toSeq
    assert(metrics == full.history.map(_.metric))
    assert(bests == metrics.scanLeft(Double.NegativeInfinity)(math.max)
             .tail, "best_so_far must be the running maximum")
    assert(records.forall(r => r.get("params").fieldNames.asScala.toSet
             == Set("alpha", "beta", "topK", "normalize_similarity")))
  }

  test("smoke evaluators run end-to-end on a tiny URM") {
    val urm = (for { u <- 0 until 30; i <- 0 until 20
                     if (u * 7 + i * 3) % 4 != 0 } yield (u, i))
      .toDF("u", "i")
    val split = Urm.userWiseHoldout(urm, 0.8, seed = 5)
    val train = split.filter(col("split") === "train").select("u", "i")
    val valid = split.filter(col("split") === "test").select("u", "i")
    // top_pop: parameterless, one evaluation
    val mTop = Spaces.evaluator("top_pop", spark, train, valid, 5)(Map.empty)
    assert(mTop >= 0.0 && mTop <= 1.0)
    // item_knn_cosine at a decoded mid-cube point (exercises decode +
    // weighted-similarity wiring: u=0.9 on feature_weighting → TF-IDF)
    val space = Spaces.itemKnn("cosine")
    val p = space.decode(space.keys.map(_ -> 0.9).toMap)
    val mKnn = Spaces.evaluator("item_knn_cosine", spark, train, valid, 5)(p)
    assert(mKnn >= 0.0 && mKnn <= 1.0)
    // euclidean decode: u=0.6 → normalize=false, normalize_avg_row=
    // false, mode=log, feature_weighting=BM25 — exercises the
    // euclidean measure dispatch plus the weighted engine underneath
    val eucSpace = Spaces.itemKnn("euclidean")
    val pe = eucSpace.decode(eucSpace.keys.map(_ -> 0.6).toMap)
    assert(pe("similarity") == PStr("euclidean"))
    val mEuc =
      Spaces.evaluator("item_knn_euclidean", spark, train, valid, 5)(pe)
    assert(mEuc >= 0.0 && mEuc <= 1.0)
    // normalize=false cosine with TF-IDF weighting and nonzero shrink:
    // the searched weighting/shrink dims must reach the weights (the
    // r7 ADVICE inert-dims finding) — raw-dot form divided by shrink
    val pRaw = space.decode(Map("topK" -> 0.5, "shrink" -> 0.9,
      "similarity" -> 0.0, "normalize" -> 0.9,
      "feature_weighting" -> 0.99).withDefaultValue(0.5))
    assert(pRaw("normalize") == PStr("false"))
    assert(pRaw("feature_weighting") == PStr("TF-IDF"))
    val mRaw = Spaces.evaluator("item_knn_cosine", spark, train, valid, 5)(pRaw)
    assert(mRaw >= 0.0 && mRaw <= 1.0)
    // ials: u=0.9 decodes confidence_scaling=log, so the smoke trial
    // exercises the log-confidence pre-transform end to end
    val ialsSpace = Spaces.catalog.toMap.apply("ials")
    val pi = ialsSpace.decode(ialsSpace.keys.map(_ -> 0.9).toMap)
    assert(pi("confidence_scaling") == PStr("log"))
    val mIals = Spaces.evaluator("ials", spark, train, valid, 5)(pi)
    assert(mIals >= 0.0 && mIals <= 1.0)
    // nmf: u=0.9 decodes solver=multiplicative_update, init_type=
    // nndsvda, beta_loss=kullback-leibler — the full new surface in
    // one smoke trial
    val nmfSpace = Spaces.catalog.toMap.apply("nmf")
    val pn = nmfSpace.decode(nmfSpace.keys.map(_ -> 0.9).toMap)
    assert(pn("solver") == PStr("multiplicative_update"))
    assert(pn("init_type") == PStr("nndsvda"))
    assert(pn("beta_loss") == PStr("kullback-leibler"))
    val mNmf = Spaces.evaluator("nmf", spark, train, valid, 5)(pn)
    assert(mNmf >= 0.0 && mNmf <= 1.0)
    // the sklearn-invalid cd×KL cell raises from inside the fit —
    // the Lifecycle trial wrapper turns this into the invalid-config
    // sentinel, the reference's exception_list behavior
    val pBad = nmfSpace.decode(Map("num_factors" -> 0.5,
      "solver" -> 0.1, "init_type" -> 0.1, "beta_loss" -> 0.9))
    assert(pBad("solver") == PStr("coordinate_descent"))
    assert(pBad("beta_loss") == PStr("kullback-leibler"))
    intercept[IllegalArgumentException] {
      Spaces.evaluator("nmf", spark, train, valid, 5)(pBad)
    }
  }

  test("maxUserDegree knob reaches every KNN trial path: no-op when " +
       "no profile is over-cap, bites on a planted heavy user") {
    val urm = (for { u <- 0 until 30; i <- 0 until 20
                     if (u * 7 + i * 3) % 4 != 0 } yield (u, i))
      .toDF("u", "i")
    // planted heavy user: full catalog profile (degree 20)
    val heavy = (0 until 20).map(i => (999, i)).toDF("u", "i")
    val split = Urm.userWiseHoldout(urm.unionByName(heavy), 0.8, seed = 5)
    val train = split.filter(col("split") === "train").select("u", "i")
    val valid = split.filter(col("split") === "test").select("u", "i")
    val space = Spaces.itemKnn("cosine")
    val p = space.decode(space.keys.map(_ -> 0.9).toMap) // TF-IDF path
    def recs(cap: Int) =
      Spaces.recommender("item_knn_cosine", spark,
          maxUserDegree = cap)(train, p, 5)
        .collect().map(r => (r.get(0), r.get(1), r.get(2))).toSet
    // a cap above every profile is a bit-exact no-op
    assert(recs(1000) == recs(0))
    // a biting cap changes the similarity (weights differ per pair)
    // and still yields a full recommendation table
    val capped = recs(4)
    assert(capped.nonEmpty)
    assert(capped != recs(0),
      "cap 4 must bite on the degree-20 planted profile")
    // the raw-dots (normalize=false) weighted branch takes the cap too
    val pRaw = space.decode(Map("topK" -> 0.5, "shrink" -> 0.9,
      "similarity" -> 0.0, "normalize" -> 0.9,
      "feature_weighting" -> 0.99).withDefaultValue(0.5))
    assert(pRaw("normalize") == PStr("false"))
    def recsRaw(cap: Int) =
      Spaces.recommender("item_knn_cosine", spark,
          maxUserDegree = cap)(train, pRaw, 5)
        .collect().map(r => (r.get(0), r.get(1), r.get(2))).toSet
    assert(recsRaw(1000) == recsRaw(0))
    assert(recsRaw(4) != recsRaw(0))
  }

  test("ials log confidence scaling changes the fit; linear matches " +
       "the unscaled default (IALSRecommender.py:111-123)") {
    import graft.recommend.Models
    val urm = (for { u <- 0 until 25; i <- 0 until 15
                     if (u * 5 + i * 11) % 3 != 0 }
               yield (u, i, 1.0 + (u + i) % 4)).toDF("u", "i", "v")
    def itemNorms(scaling: String): Map[Int, Double] = {
      val (_, itf) = Models.ials(urm, rank = 4, reg = 0.05, alpha = 2.0,
        iters = 3, seed = 13, confidenceScaling = scaling, epsilon = 0.5)
      itf.select(col("id"),
          expr("aggregate(features, 0d, (a, x) -> a + cast(x*x as double))"))
        .as[(Int, Double)].collect().toMap
    }
    val lin = itemNorms("linear")
    val lg = itemNorms("log")
    assert(lin.keySet == lg.keySet)
    // the two scalings weight multi-count interactions differently →
    // different converged factors (c=1+αr vs c=1+α·log(1+r/ε))
    assert(lin.exists { case (i, n) => math.abs(n - lg(i)) > 1e-9 },
      "log scaling must change the confidence weights")
    // a second linear fit reproduces bit-identically (seeded ALS)
    val lin2 = itemNorms("linear")
    assert(lin == lin2, "seeded ml.ALS fit must be reproducible")
    intercept[IllegalArgumentException] {
      Models.ials(urm, 4, 0.05, 2.0, 1, 13, confidenceScaling = "bogus")
    }
  }
}
