package graft.tuning

import org.apache.spark.sql.functions._
import graft.Q
import graft.etl.Urm

/** Gated queries for the tuning module: the hyperparameter-space
  * catalog (oracle-checked against a hand-transcribed VALUES table)
  * and a smoke search driving one short surrogate search per algorithm
  * over its declared space (rows-only — the metric values are
  * model-tier).
  */
object TuningQueries {

  def queries: Seq[Q] = Seq(

    // The ORACLE-GATED early-stopping lifecycle (q144's strict
    // companion, the q145 convention): every stochastic ingredient of
    // q144 replaced by a deterministic twin so the ENTIRE
    // epoch-capture semantics — per-epoch validation monitoring, best-
    // epoch selection (ties → earliest, the patience convention),
    // the adjusted configuration carrying `epochs`, and the final
    // retrain on train∪validation honoring EXACTLY the selected epoch
    // before one test evaluation at cutoffs 5/10/20 — is hash-checked
    // end to end against a DuckDB replay. The "trainer" is
    // incremental popularity: the epoch-e model is TopPop over the
    // deterministic train stratum (u·7+i) mod 3 < e, so more epochs
    // see more data (a monotone, SQL-expressible training schedule).
    // A retrain that ignored the captured epoch (e.g. refit on the
    // full schedule), a selection off the wrong metric, or a
    // last-test split leak is a red row. Still flows through
    // Lifecycle.searchThenFinalTestAdjusted (SearchSingleCase on the
    // empty space), the same API q144 drives.
    Q("q168_early_stop_gated", { t =>
        import graft.recommend.Recommenders
        // proportional user stratum (u ≡ 0 mod 3): the gate pays 4 full
        // recommendation pipelines (3 validation epochs + final test),
        // so a deterministic 1/3 slice keeps the whole mechanism at a
        // third of the bench cost — and unlike a constant bound it
        // still scales with the data
        // persisted: the lifecycle issues ~a dozen Spark actions (3
        // epoch monitors × 2 actions each, final fit, 3-cutoff eval),
        // each of which would otherwise recompute the orders⋈lineitem
        // URM join from parquet
        val urm = graft.core.CacheScope.persist(
          Urm.fromOrders(t).select("u", "i")
            .filter(pmod(col("u"), lit(3)) === 0))
        val mark1 = pmod(col("u") * 31 + col("i"), lit(10)) < 8
        val mark2 = pmod(col("u") * 17 + col("i"), lit(10)) < 7
        val train = graft.core.CacheScope.persist(urm.filter(mark1 && mark2))
        val valid = graft.core.CacheScope.persist(urm.filter(mark1 && !mark2))
        val test = urm.filter(!mark1)
        def popRecs(tr: org.apache.spark.sql.DataFrame, e: Int,
                    cutoff: Int): org.apache.spark.sql.DataFrame =
          Recommenders.recommendGlobal(
            Recommenders.topPop(
                tr.filter(pmod(col("u") * 7 + col("i"), lit(3)) < e))
              .select(col("i").as("item"),
                      col("pop").cast("double").as("score")),
            tr, cutoff)
        def round6(x: Double): Double =
          BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble
        val res = Lifecycle.searchThenFinalTestAdjusted(
          "top_pop_incremental", Spaces.topPop, train, valid, test,
          trial = (tr, p, c) => {
            // per-epoch validation monitor; 6-decimal rounding BEFORE
            // the argmax so the selection compares the same numbers
            // the oracle does. The three epoch models are INDEPENDENT
            // (epoch e = popularity over its own deterministic train
            // stratum, not an incremental update), so the three
            // fit+evaluate pipelines run concurrently from driver
            // threads (guide §2.6 via core.Par) — same numbers, same
            // argmax, only wall-clock changes
            val byEpoch = graft.core.Par.run(t.spark.sparkContext,
                "graft-q168-epochs", 30, (1 to 3).toSeq)(e =>
              e -> round6(Spaces.mapAt(popRecs(tr, e, c), valid, c)))
            val (bestE, bestM) =
              byEpoch.maxBy { case (e, m) => (m, -e) }
            (bestM, p + ("epochs" -> Spaces.PNum(bestE)))
          },
          finalFit = (tr, p, c) => {
            val e = p("epochs") match {
              case Spaces.PNum(v) => v.toInt
              case _ => sys.error("missing captured epochs")
            }
            popRecs(tr, e, c)
          })
        val selE = res.best("epochs") match {
          case Spaces.PNum(v) => v.toInt
          case _ => -1
        }
        res.testMetrics
          .withColumn("selected_epochs", lit(selE))
          .withColumn("valid_map", lit(res.bestValidationMetric))
      },
      Some("""WITH urm AS (
        |  SELECT DISTINCT o_custkey AS u, l_partkey AS i
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_custkey % 3 = 0
        |),
        |train AS (SELECT u, i FROM urm
        |          WHERE (u*31 + i) % 10 < 8 AND (u*17 + i) % 10 < 7),
        |valid AS (SELECT u, i FROM urm
        |          WHERE (u*31 + i) % 10 < 8 AND (u*17 + i) % 10 >= 7),
        |lasttrain AS (SELECT u, i FROM urm WHERE (u*31 + i) % 10 < 8),
        |test AS (SELECT u, i FROM urm WHERE (u*31 + i) % 10 >= 8),
        |epochs AS (SELECT UNNEST([1, 2, 3]) AS e),
        |-- validation phase: epoch-e model = popularity over the
        |-- train stratum (u*7+i)%3 < e; recs for train users minus
        |-- train-seen; MAP@10 against the validation positives
        |vpop AS (
        |  SELECT e, i, COUNT(*) AS pop FROM train, epochs
        |  WHERE (u*7 + i) % 3 < e GROUP BY e, i
        |),
        |vusers AS (SELECT DISTINCT u FROM train),
        |vrecs AS (
        |  SELECT e, u, item, rank FROM (
        |    SELECT p.e, us.u, p.i AS item,
        |      ROW_NUMBER() OVER (PARTITION BY p.e, us.u
        |        ORDER BY p.pop DESC, p.i) AS rank
        |    FROM vusers us CROSS JOIN vpop p
        |    WHERE NOT EXISTS (SELECT 1 FROM train t2
        |                      WHERE t2.u = us.u AND t2.i = p.i)) r
        |  WHERE rank <= 10
        |),
        |vrelc AS (SELECT u, COUNT(*) AS n_rel FROM valid GROUP BY 1),
        |vhits AS (
        |  SELECT vrecs.e, vrecs.u, vrecs.rank,
        |    CASE WHEN valid.i IS NOT NULL THEN 1 ELSE 0 END AS hit,
        |    vrelc.n_rel
        |  FROM vrecs
        |  JOIN vrelc ON vrecs.u = vrelc.u
        |  LEFT JOIN valid ON vrecs.u = valid.u AND vrecs.item = valid.i
        |),
        |vcum AS (
        |  SELECT e, u, rank, hit, n_rel,
        |    SUM(hit) OVER (PARTITION BY e, u ORDER BY rank
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ch
        |  FROM vhits
        |),
        |vap AS (
        |  SELECT e, u,
        |    SUM(CASE WHEN hit = 1 THEN CAST(ch AS DOUBLE) / rank
        |        ELSE 0.0 END) / LEAST(ANY_VALUE(n_rel), 10) AS ap
        |  FROM vcum GROUP BY e, u
        |),
        |vmap AS (SELECT e, round(SUM(ap) / COUNT(*), 6) AS map10
        |         FROM vap GROUP BY e),
        |-- earliest epoch achieving the max validation MAP
        |beste AS (SELECT MIN(e) AS best_e FROM vmap
        |          WHERE map10 = (SELECT MAX(map10) FROM vmap)),
        |-- final phase: retrain on train+validation at the SELECTED
        |-- epoch's stratum, evaluate once on test (the q145 pipeline)
        |fpop AS (
        |  SELECT i, COUNT(*) AS pop FROM lasttrain, beste
        |  WHERE (u*7 + i) % 3 < best_e GROUP BY i
        |),
        |fusers AS (SELECT DISTINCT u FROM lasttrain),
        |frecs AS (
        |  SELECT u, item, rank FROM (
        |    SELECT us.u, p.i AS item,
        |      ROW_NUMBER() OVER (PARTITION BY us.u
        |        ORDER BY p.pop DESC, p.i) AS rank
        |    FROM fusers us CROSS JOIN fpop p
        |    WHERE NOT EXISTS (SELECT 1 FROM lasttrain t2
        |                      WHERE t2.u = us.u AND t2.i = p.i)) r
        |  WHERE rank <= 20
        |),
        |relc AS (SELECT u, COUNT(*) AS n_rel FROM test GROUP BY 1),
        |hits AS (
        |  SELECT frecs.u, frecs.rank,
        |    CASE WHEN test.i IS NOT NULL THEN 1 ELSE 0 END AS hit,
        |    relc.n_rel
        |  FROM frecs
        |  JOIN relc ON frecs.u = relc.u
        |  LEFT JOIN test ON frecs.u = test.u AND frecs.item = test.i
        |), cutoffs AS (SELECT UNNEST([5, 10, 20]) AS cutoff),
        |cum AS (
        |  SELECT c.cutoff, h.u, h.rank, h.hit, h.n_rel,
        |    SUM(h.hit) OVER (PARTITION BY c.cutoff, h.u ORDER BY h.rank
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_hits,
        |    SUM(h.hit) OVER (PARTITION BY c.cutoff, h.u) AS tot_hits
        |  FROM hits h JOIN cutoffs c ON h.rank <= c.cutoff
        |), per_user AS (
        |  SELECT cutoff, u,
        |    CAST(SUM(hit) AS BIGINT) AS n_hits,
        |    ANY_VALUE(n_rel) AS n_rel,
        |    SUM(CASE WHEN hit = 1
        |        THEN CAST(cum_hits AS DOUBLE) / rank ELSE 0.0 END) AS ap_num,
        |    MIN(CASE WHEN hit = 1 THEN rank END) AS first_hit,
        |    SUM(CASE WHEN hit = 1
        |        THEN 1.0 / log2(rank + 1) ELSE 0.0 END) AS dcg,
        |    SUM(CASE WHEN hit = 1 THEN 1.0 / rank ELSE 0.0 END) AS arhr_num,
        |    CAST(SUM(CASE WHEN hit = 1
        |        THEN (cutoff - rank) - (tot_hits - cum_hits)
        |        ELSE 0 END) AS BIGINT) AS auc_num
        |  FROM cum GROUP BY cutoff, u
        |), idcg_tab AS (
        |  SELECT m, SUM(1.0 / log2(x + 1)) AS idcg
        |  FROM generate_series(1, 20) ms(m), generate_series(1, 20) g(x)
        |  WHERE x <= m GROUP BY m
        |), scored AS (
        |  SELECT cutoff, u,
        |    CAST(n_hits AS DOUBLE) / cutoff AS prec,
        |    CAST(n_hits AS DOUBLE) / n_rel AS rec,
        |    CAST(n_hits AS DOUBLE) / LEAST(n_rel, cutoff) AS prec_min_den,
        |    ap_num / LEAST(n_rel, cutoff) AS ap,
        |    COALESCE(1.0 / first_hit, 0.0) AS rr,
        |    arhr_num,
        |    dcg / idcg AS ndcg,
        |    CASE WHEN n_hits = 0 OR n_hits = cutoff THEN 0.0
        |         ELSE CAST(auc_num AS DOUBLE) / (n_hits * (cutoff - n_hits))
        |    END AS auc,
        |    CASE WHEN n_hits > 0 THEN 1 ELSE 0 END AS is_hit
        |  FROM per_user
        |  JOIN idcg_tab ON idcg_tab.m = LEAST(n_rel, cutoff)
        |)
        |SELECT cutoff,
        |  round(SUM(prec) / COUNT(*), 6) AS precision,
        |  round(SUM(rec) / COUNT(*), 6) AS recall,
        |  round(SUM(prec_min_den) / COUNT(*), 6)
        |    AS precision_recall_min_den,
        |  round(SUM(ap) / COUNT(*), 6) AS map,
        |  round(SUM(rr) / COUNT(*), 6) AS mrr,
        |  round(SUM(arhr_num) / COUNT(*), 6) AS arhr,
        |  round(SUM(ndcg) / COUNT(*), 6) AS ndcg,
        |  round(SUM(auc) / COUNT(*), 6) AS roc_auc,
        |  round(CAST(SUM(is_hit) AS DOUBLE) / COUNT(*), 6) AS hit_rate,
        |  round(CASE WHEN SUM(prec) + SUM(rec) > 0
        |        THEN 2.0 * (SUM(prec) / COUNT(*)) * (SUM(rec) / COUNT(*))
        |             / (SUM(prec) / COUNT(*) + SUM(rec) / COUNT(*))
        |        ELSE 0.0 END, 6) AS f1,
        |  COUNT(*) AS n_users,
        |  (SELECT best_e FROM beste) AS selected_epochs,
        |  (SELECT MAX(map10) FROM vmap) AS valid_map
        |FROM scored GROUP BY cutoff""".stripMargin)),

    // The per-algorithm hyperparameter-space catalog, flattened to one
    // row per dimension. The oracle is transcribed BY HAND from the
    // same reference lines (run_parameter_search.py:180-710) the Scala
    // catalog mirrors, so a transcription slip on either side is a red
    // row — the catalog definition is pinned by the gate itself.
    Q("q134_hp_space_catalog", { t =>
        import t.spark.implicits._
        Spaces.catalogRows
          .toDF("algorithm", "param", "kind", "lo", "hi", "categories")
      },
      Some("""SELECT * FROM (VALUES
        |  ('random', '(none)', 'none', CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR)),
        |  ('top_pop', '(none)', 'none', NULL, NULL, NULL),
        |  ('item_knn_cosine', 'topK', 'int', 5, 1000, NULL),
        |  ('item_knn_cosine', 'shrink', 'int', 0, 1000, NULL),
        |  ('item_knn_cosine', 'similarity', 'cat', NULL, NULL, 'cosine'),
        |  ('item_knn_cosine', 'normalize', 'cat', NULL, NULL, 'true,false'),
        |  ('item_knn_cosine', 'feature_weighting', 'cat', NULL, NULL, 'none,BM25,TF-IDF'),
        |  ('item_knn_jaccard', 'topK', 'int', 5, 1000, NULL),
        |  ('item_knn_jaccard', 'shrink', 'int', 0, 1000, NULL),
        |  ('item_knn_jaccard', 'similarity', 'cat', NULL, NULL, 'jaccard'),
        |  ('item_knn_jaccard', 'normalize', 'cat', NULL, NULL, 'true,false'),
        |  ('item_knn_asymmetric', 'topK', 'int', 5, 1000, NULL),
        |  ('item_knn_asymmetric', 'shrink', 'int', 0, 1000, NULL),
        |  ('item_knn_asymmetric', 'similarity', 'cat', NULL, NULL, 'asymmetric'),
        |  ('item_knn_asymmetric', 'normalize', 'cat', NULL, NULL, 'true'),
        |  ('item_knn_asymmetric', 'asymmetric_alpha', 'real', 0, 2, NULL),
        |  ('item_knn_asymmetric', 'feature_weighting', 'cat', NULL, NULL, 'none,BM25,TF-IDF'),
        |  ('item_knn_dice', 'topK', 'int', 5, 1000, NULL),
        |  ('item_knn_dice', 'shrink', 'int', 0, 1000, NULL),
        |  ('item_knn_dice', 'similarity', 'cat', NULL, NULL, 'dice'),
        |  ('item_knn_dice', 'normalize', 'cat', NULL, NULL, 'true,false'),
        |  ('item_knn_tversky', 'topK', 'int', 5, 1000, NULL),
        |  ('item_knn_tversky', 'shrink', 'int', 0, 1000, NULL),
        |  ('item_knn_tversky', 'similarity', 'cat', NULL, NULL, 'tversky'),
        |  ('item_knn_tversky', 'normalize', 'cat', NULL, NULL, 'true'),
        |  ('item_knn_tversky', 'tversky_alpha', 'real', 0, 2, NULL),
        |  ('item_knn_tversky', 'tversky_beta', 'real', 0, 2, NULL),
        |  ('item_knn_euclidean', 'topK', 'int', 5, 1000, NULL),
        |  ('item_knn_euclidean', 'shrink', 'int', 0, 1000, NULL),
        |  ('item_knn_euclidean', 'similarity', 'cat', NULL, NULL, 'euclidean'),
        |  ('item_knn_euclidean', 'normalize', 'cat', NULL, NULL, 'true,false'),
        |  ('item_knn_euclidean', 'normalize_avg_row', 'cat', NULL, NULL, 'true,false'),
        |  ('item_knn_euclidean', 'similarity_from_distance_mode', 'cat', NULL, NULL, 'lin,log,exp'),
        |  ('item_knn_euclidean', 'feature_weighting', 'cat', NULL, NULL, 'none,BM25,TF-IDF'),
        |  ('rp3beta', 'topK', 'int', 5, 1000, NULL),
        |  ('rp3beta', 'alpha', 'real', 0, 2, NULL),
        |  ('rp3beta', 'beta', 'real', 0, 2, NULL),
        |  ('rp3beta', 'normalize_similarity', 'cat', NULL, NULL, 'true,false'),
        |  ('pure_svd', 'num_factors', 'int', 1, 350, NULL),
        |  ('ials', 'num_factors', 'int', 1, 200, NULL),
        |  ('ials', 'confidence_scaling', 'cat', NULL, NULL, 'linear,log'),
        |  ('ials', 'alpha', 'real_log', 0.001, 50.0, NULL),
        |  ('ials', 'epsilon', 'real_log', 0.001, 10.0, NULL),
        |  ('ials', 'reg', 'real_log', 0.00001, 0.01, NULL),
        |  ('nmf', 'num_factors', 'int', 1, 350, NULL),
        |  ('nmf', 'solver', 'cat', NULL, NULL, 'coordinate_descent,multiplicative_update'),
        |  ('nmf', 'init_type', 'cat', NULL, NULL, 'random,nndsvda'),
        |  ('nmf', 'beta_loss', 'cat', NULL, NULL, 'frobenius,kullback-leibler'),
        |  ('mf_bpr_impressions', 'sgd_mode', 'cat', NULL, NULL, 'sgd,adagrad,adam'),
        |  ('mf_bpr_impressions', 'epochs', 'cat', NULL, NULL, '1500'),
        |  ('mf_bpr_impressions', 'num_factors', 'int', 1, 200, NULL),
        |  ('mf_bpr_impressions', 'batch_size', 'cat', NULL, NULL, '1,2,4,8,16,32,64,128,256,512,1024'),
        |  ('mf_bpr_impressions', 'positive_reg', 'real_log', 0.00001, 0.01, NULL),
        |  ('mf_bpr_impressions', 'negative_reg', 'real_log', 0.00001, 0.01, NULL),
        |  ('mf_bpr_impressions', 'learning_rate', 'real_log', 0.0001, 0.1, NULL),
        |  ('mf_bpr_impressions', 'impression_sampling_mode', 'cat', NULL, NULL, 'none,inside,outside')
        |) t(algorithm, param, kind, lo, hi, categories)""".stripMargin)),

    // One short surrogate search per catalog algorithm, each trial a
    // full distributed fit+evaluate over a hash-subsampled URM (the
    // subsample and the rank/epoch caps bound smoke cost; the declared
    // spaces carry the reference's real ranges). Parameterless
    // algorithms run the reference's SearchSingleCase — one
    // evaluation. Rows-only: one row per algorithm with the trial
    // count and best MAP@10 (model-tier metric values).
    Q("q135_hp_smoke_search", { t =>
        import t.spark.implicits._
        // the smoke slice is deliberately small — ~3% of users and a
        // bounded item range — because the query's job is to prove the
        // catalog → decode → fit → evaluate → surrogate wiring end to
        // end, not to produce meaningful metrics: 13 catalog spaces ×
        // up to 2 trials is ~24 distributed fit+evaluate pipelines
        val urm = Urm.fromOrders(t)
          .filter(pmod(col("u"), lit(31)) === 0 && col("i") < 1500)
        val split = Urm.userWiseHoldout(urm, 0.8, seed = 11)
        val train = split.filter(col("split") === "train").select("u", "i")
        val valid = split.filter(col("split") === "test").select("u", "i")
        graft.core.CacheScope.persist(train)
        // a deterministic shown-but-unclicked impression table so
        // impression_sampling_mode is LIVE in the mf_bpr trials
        // (inside draws from it, outside avoids it): ~12% of the
        // bounded smoke user×item grid, minus seen pairs. The
        // crossJoin is the bounded smoke-slice device (≤200 users ×
        // ≤1500 items), not a scale path — a production search feeds
        // the real impression log (etl.Impressions).
        val shown = train.select("u").distinct()
          .crossJoin(train.select("i").distinct())
          .filter(pmod(xxhash64(col("u"), col("i"), lit(99)),
                       lit(17)) < 2)
          .join(train, Seq("u", "i"), "left_anti")
        graft.core.CacheScope.persist(shown)
        // The per-algorithm searches are independent, and each trial's
        // jobs are tiny (a subsampled fit+evaluate leaves most of the
        // cluster idle) — so the searches run CONCURRENTLY from driver
        // threads, overlapping scheduling gaps; Spark schedules
        // concurrent actions safely. Each search gets its own
        // CacheScope so its persisted subtrees release the moment that
        // algorithm finishes, not at query exit. Result order and all
        // seeds are fixed, so the output is unaffected.
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.{Duration, MINUTES}
        // one DAEMON thread per algorithm: every search starts
        // immediately, the wall-clock is the longest single search
        // chain, and a wedged thread can never keep the JVM alive
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          Spaces.catalog.size,
          (r: Runnable) => {
            val th = new Thread(r, "graft-hp-smoke")
            th.setDaemon(true)
            th
          })
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutorService(pool)
        val jobGroup = "graft-hp-smoke-search"
        val futures = Spaces.catalog.zipWithIndex.map {
          case ((alg, space), idx) => Future {
            // job group is thread-local: every Spark action this
            // search submits is tagged, so the timeout path below can
            // actually cancel in-flight work
            t.spark.sparkContext.setJobGroup(
              jobGroup, s"hp smoke search: $alg", true)
            graft.core.CacheScope.scoped {
              val eval = Spaces.evaluator(alg, t.spark, train, valid,
                                          cutoff = 10, maxEpochs = 1,
                                          impressions = Some(shown))
              val result =
                if (space.dims.isEmpty) {
                  // SearchSingleCase: no parameters, one evaluation
                  val m = eval(Map.empty)
                  Search.SearchResult(
                    Search.Trial(Map.empty, m),
                    Seq(Search.Trial(Map.empty, m)))
                } else Search.surrogate(
                  // 1 seeded random start + 1 surrogate-guided step:
                  // the acquisition path runs, at minimum trial cost
                  Spaces.unitRanges(space), nInit = 1, nTotal = 2,
                  candidatePool = 16, kappa = 1.0, seed = 31 + idx) { u =>
                    // a crashing configuration records the invalid
                    // sentinel and the search continues — the
                    // reference's exception_list behavior
                    // (SearchAbstractClass.py:465-477), the same
                    // wrapper Lifecycle.runTrial applies; live in this
                    // catalog via nmf's sklearn-invalid cd×KL cell
                    try eval(space.decode(u))
                    catch { case scala.util.control.NonFatal(_) =>
                      Lifecycle.InvalidConfigValue }
                  }
              (alg, result.history.size, result.best.metric)
            }
          }
        }
        // bounded wait: one hung Spark action fails THIS query with a
        // TimeoutException (caught by the harness) instead of wedging
        // the whole run forever — and the timeout path CANCELS the
        // tagged in-flight jobs and interrupts the workers, so the
        // wedged searches stop consuming the cluster under whatever
        // runs next (shutdown() alone would leave them running)
        val rows =
          try Await.result(Future.sequence(futures),
                           Duration(30, MINUTES))
          catch {
            case e: java.util.concurrent.TimeoutException =>
              t.spark.sparkContext.cancelJobGroup(jobGroup)
              pool.shutdownNow()
              throw e
          }
          finally pool.shutdown()
        rows.toDF("algorithm", "n_trials", "best_map")
          .filter(col("n_trials") > 0)
      }, None),

    // §3.2 lifecycle close-out (VERDICT r7 missing #1) — the
    // reference's final-test retrain: search on (train, validation),
    // refit the best configuration on train+validation
    // (URM_train_last_test, run_hyperparameter_tuning.py:62), evaluate
    // ONCE on the held-out test split at cutoffs 5/10/20
    // (SearchAbstractClass.py:310-364 _evaluate_on_test_with_data_last
    // + the evaluator_test construction at run_hyperparameter_tuning
    // .py:47-58). One parameterless algorithm (SearchSingleCase path)
    // and one real searched space. Rows-only: the metrics are
    // model-tier; LifecycleSpec pins the retrain-uses-train+val and
    // test-untouched-until-final-step ordering with a recording
    // harness.
    Q("q142_final_test_retrain", { t =>
        import t.spark.implicits._
        val urm = Urm.fromOrders(t)
          .filter(pmod(col("u"), lit(31)) === 0 && col("i") < 1500)
        // train/validation/test via two user-wise holdouts — the
        // reference's three-split layout (run_generate_splits.py)
        val s1 = Urm.userWiseHoldout(urm, 0.8, seed = 17)
        val trainVal = s1.filter(col("split") === "train").select("u", "i")
        val test = graft.core.CacheScope.persist(
          s1.filter(col("split") === "test").select("u", "i"))
        val s2 = Urm.userWiseHoldout(trainVal, 0.75, seed = 18)
        val train = graft.core.CacheScope.persist(
          s2.filter(col("split") === "train").select("u", "i"))
        val valid = graft.core.CacheScope.persist(
          s2.filter(col("split") === "test").select("u", "i"))
        val spaces = Spaces.catalog.toMap
        // the two algorithm lifecycles are independent and each is a
        // chain of SMALL sequential Spark actions (trial fits, metric
        // collects) that leaves most of the machine idle — run them
        // concurrently from driver threads (guide §2.6, the q135
        // pattern via core.Par): result order and all seeds are fixed,
        // so the output rows are unchanged; only wall-clock drops
        val rows = graft.core.Par.run(t.spark.sparkContext,
            "graft-q142-final-test", 30,
            Seq("top_pop", "item_knn_cosine")) { alg =>
          graft.core.CacheScope.scoped {
            val res = Lifecycle.searchThenFinalTest(
              alg, spaces(alg), train, valid, test,
              Spaces.recommender(alg, t.spark, maxEpochs = 1),
              nTotal = 2, seed = 47)
            val mapPerCutoff = res.testMetrics.select("cutoff", "map")
              .as[(Int, Double)].collect().toMap // three scalar rows
            val bestStr = res.best.toSeq.sortBy(_._1)
              .map { case (k, v) => s"$k=${v.render}" }.mkString(",")
            (alg, bestStr, res.nTrials, res.bestValidationMetric,
             mapPerCutoff(5), mapPerCutoff(10), mapPerCutoff(20))
          }
        }
        rows.toDF("algorithm", "best_params", "n_trials", "valid_map",
                  "test_map_5", "test_map_10", "test_map_20")
      }, None),

    // Early stopping composed with the SEARCH lifecycle (reference:
    // SearchAbstractClass.py:366-390 — a trial that trains with early
    // stopping overwrites the epoch hyperparameter in its recorded
    // config with the SELECTED epoch, so hyperparameters_best carries
    // it and the final retrain, which has no validation left to
    // monitor, fits exactly that many epochs). Each mf_bpr trial here
    // is the distributed early-stopped trainer (q94's operator)
    // monitored by validation MAP@10; the best config's selected epoch
    // is surfaced as its own column and honored by the final refit
    // (Spaces.recommender reads epochs from the configuration).
    // Rows-only: model-tier metrics; LifecycleSpec pins the
    // adjusted-config mechanism deterministically.
    Q("q144_early_stop_search_retrain", { t =>
        import t.spark.implicits._
        // smaller smoke slice than q135/q142 (~1.5% of users): each
        // early-stopped trial pays up to 3 epoch-train + 3 validation
        // pipelines, so the per-trial job count is triple a q142 trial
        val urm = Urm.fromOrders(t)
          .filter(pmod(col("u"), lit(61)) === 0 && col("i") < 1500)
        val s1 = Urm.userWiseHoldout(urm, 0.8, seed = 23)
        val trainVal = s1.filter(col("split") === "train").select("u", "i")
        val test = graft.core.CacheScope.persist(
          s1.filter(col("split") === "test").select("u", "i"))
        val s2 = Urm.userWiseHoldout(trainVal, 0.75, seed = 24)
        val train = graft.core.CacheScope.persist(
          s2.filter(col("split") === "train").select("u", "i"))
        val valid = graft.core.CacheScope.persist(
          s2.filter(col("split") === "test").select("u", "i"))
        // the early-stopped trainer runs ONE merge round per epoch
        // (no batching), so batch_size is inert in this query's
        // trials — the retrain pins batch_size=0 to fit on exactly
        // the schedule the early stopper selected its epoch on
        // (q135 exercises the batch_size dimension live instead)
        val rec = Spaces.recommender("mf_bpr_impressions", t.spark,
                                     maxEpochs = 3)
        val res = Lifecycle.searchThenFinalTestAdjusted(
          "mf_bpr_impressions",
          Spaces.catalog.toMap.apply("mf_bpr_impressions"),
          train, valid, test,
          trial = Spaces.earlyStoppedBprTrial(t.spark, valid,
                                              maxEpochs = 3),
          finalFit = (tr, p, c) =>
            rec(tr, p + ("batch_size" -> Spaces.PNum(0)), c),
          nTotal = 2, seed = 53)
        val mapPerCutoff = res.testMetrics.select("cutoff", "map")
          .as[(Int, Double)].collect().toMap
        val bestStr = res.best.toSeq.sortBy(_._1)
          .map { case (k, v) => s"$k=${v.render}" }.mkString(",")
        val selEpochs = res.best("epochs") match {
          case Spaces.PNum(v) => v.toInt
          case _ => -1
        }
        Seq((res.algorithm, bestStr, selEpochs, res.nTrials,
             res.bestValidationMetric, mapPerCutoff(5),
             mapPerCutoff(10), mapPerCutoff(20)))
          .toDF("algorithm", "best_params", "selected_epochs",
                "n_trials", "valid_map", "test_map_5", "test_map_10",
                "test_map_20")
      }, None),

    // The ORACLE-GATED final-test lifecycle: q142 proves the flow on a
    // searched space but is rows-only (userWiseHoldout draws rand());
    // here every stochastic ingredient is replaced by its
    // deterministic twin — two modular-hash splits DuckDB replicates
    // exactly, and the parameterless TopPop recommender — so the
    // ENTIRE final-test semantics (retrain popularity over
    // train∪validation, exclude train∪validation seen, rank with the
    // deterministic tie order, evaluate at cutoffs 5/10/20 with the
    // reference's metric formulas) is hash-checked end to end. A
    // retrain that buggily used train-only, leaked test rows, or
    // evaluated one cutoff wrong is a red row here. The query still
    // flows through Lifecycle.searchThenFinalTest (search phase
    // included: SearchSingleCase on the empty top_pop space).
    Q("q145_final_test_gated", { t =>
        val urm = Urm.fromOrders(t).select("u", "i")
        val mark1 = pmod(col("u") * 31 + col("i"), lit(10)) < 8
        val mark2 = pmod(col("u") * 17 + col("i"), lit(10)) < 7
        val train = urm.filter(mark1 && mark2)
        val valid = urm.filter(mark1 && !mark2)
        val test = urm.filter(!mark1)
        Lifecycle.searchThenFinalTest(
          "top_pop", Spaces.topPop, train, valid, test,
          Spaces.recommender("top_pop", t.spark)).testMetrics
      },
      Some("""WITH urm AS (
        |  SELECT DISTINCT o_custkey AS u, l_partkey AS i
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |),
        |-- URM_train_last_test = train + validation = the m1 stratum;
        |-- the m2 sub-split only routes the engine's search phase
        |lasttrain AS (SELECT u, i FROM urm WHERE (u*31 + i) % 10 < 8),
        |test AS (SELECT u, i FROM urm WHERE (u*31 + i) % 10 >= 8),
        |pop AS (SELECT i, COUNT(*) AS pop FROM lasttrain GROUP BY 1),
        |users AS (SELECT DISTINCT u FROM lasttrain),
        |scores AS (
        |  SELECT users.u AS u, pop.i AS item, CAST(pop AS DOUBLE) AS score
        |  FROM users CROSS JOIN pop
        |), recs AS (
        |  SELECT u, item, rank FROM (
        |    SELECT s.u, s.item,
        |      ROW_NUMBER() OVER (PARTITION BY s.u
        |        ORDER BY s.score DESC, s.item) AS rank
        |    FROM scores s
        |    WHERE NOT EXISTS (SELECT 1 FROM lasttrain t2
        |                      WHERE t2.u = s.u AND t2.i = s.item)) r
        |  WHERE rank <= 20
        |), relc AS (SELECT u, COUNT(*) AS n_rel FROM test GROUP BY 1),
        |hits AS (
        |  SELECT recs.u, recs.rank,
        |    CASE WHEN test.i IS NOT NULL THEN 1 ELSE 0 END AS hit,
        |    relc.n_rel
        |  FROM recs
        |  JOIN relc ON recs.u = relc.u
        |  LEFT JOIN test ON recs.u = test.u AND recs.item = test.i
        |), cutoffs AS (SELECT UNNEST([5, 10, 20]) AS cutoff),
        |cum AS (
        |  SELECT c.cutoff, h.u, h.rank, h.hit, h.n_rel,
        |    SUM(h.hit) OVER (PARTITION BY c.cutoff, h.u ORDER BY h.rank
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_hits,
        |    SUM(h.hit) OVER (PARTITION BY c.cutoff, h.u) AS tot_hits
        |  FROM hits h JOIN cutoffs c ON h.rank <= c.cutoff
        |), per_user AS (
        |  SELECT cutoff, u,
        |    CAST(SUM(hit) AS BIGINT) AS n_hits,
        |    ANY_VALUE(n_rel) AS n_rel,
        |    SUM(CASE WHEN hit = 1
        |        THEN CAST(cum_hits AS DOUBLE) / rank ELSE 0.0 END) AS ap_num,
        |    MIN(CASE WHEN hit = 1 THEN rank END) AS first_hit,
        |    SUM(CASE WHEN hit = 1
        |        THEN 1.0 / log2(rank + 1) ELSE 0.0 END) AS dcg,
        |    SUM(CASE WHEN hit = 1 THEN 1.0 / rank ELSE 0.0 END) AS arhr_num,
        |    CAST(SUM(CASE WHEN hit = 1
        |        THEN (cutoff - rank) - (tot_hits - cum_hits)
        |        ELSE 0 END) AS BIGINT) AS auc_num
        |  FROM cum GROUP BY cutoff, u
        |), idcg_tab AS (
        |  SELECT m, SUM(1.0 / log2(x + 1)) AS idcg
        |  FROM generate_series(1, 20) ms(m), generate_series(1, 20) g(x)
        |  WHERE x <= m GROUP BY m
        |), scored AS (
        |  SELECT cutoff, u,
        |    CAST(n_hits AS DOUBLE) / cutoff AS prec,
        |    CAST(n_hits AS DOUBLE) / n_rel AS rec,
        |    CAST(n_hits AS DOUBLE) / LEAST(n_rel, cutoff) AS prec_min_den,
        |    ap_num / LEAST(n_rel, cutoff) AS ap,
        |    COALESCE(1.0 / first_hit, 0.0) AS rr,
        |    arhr_num,
        |    dcg / idcg AS ndcg,
        |    CASE WHEN n_hits = 0 OR n_hits = cutoff THEN 0.0
        |         ELSE CAST(auc_num AS DOUBLE) / (n_hits * (cutoff - n_hits))
        |    END AS auc,
        |    CASE WHEN n_hits > 0 THEN 1 ELSE 0 END AS is_hit
        |  FROM per_user
        |  JOIN idcg_tab ON idcg_tab.m = LEAST(n_rel, cutoff)
        |)
        |SELECT cutoff,
        |  round(SUM(prec) / COUNT(*), 6) AS precision,
        |  round(SUM(rec) / COUNT(*), 6) AS recall,
        |  round(SUM(prec_min_den) / COUNT(*), 6)
        |    AS precision_recall_min_den,
        |  round(SUM(ap) / COUNT(*), 6) AS map,
        |  round(SUM(rr) / COUNT(*), 6) AS mrr,
        |  round(SUM(arhr_num) / COUNT(*), 6) AS arhr,
        |  round(SUM(ndcg) / COUNT(*), 6) AS ndcg,
        |  round(SUM(auc) / COUNT(*), 6) AS roc_auc,
        |  round(CAST(SUM(is_hit) AS DOUBLE) / COUNT(*), 6) AS hit_rate,
        |  round(CASE WHEN SUM(prec) + SUM(rec) > 0
        |        THEN 2.0 * (SUM(prec) / COUNT(*)) * (SUM(rec) / COUNT(*))
        |             / (SUM(prec) / COUNT(*) + SUM(rec) / COUNT(*))
        |        ELSE 0.0 END, 6) AS f1,
        |  COUNT(*) AS n_users
        |FROM scored GROUP BY cutoff""".stripMargin)),

    // §3.2 STRICT gate — the surrogate PROPOSER itself (VERDICT r9
    // optional #7): Search.surrogate is seeded-deterministic, so a
    // 1-D search over an ANALYTIC objective (−(x−0.3)², no Spark fits)
    // pins the full trial sequence — the seeded java.util.Random draw
    // stream, the target standardization, the ridge quadratic solve,
    // the kappa-weighted distance bonus, and each acquisition argmax.
    // Oracle VALUES derived INDEPENDENTLY: a python twin reimplements
    // the java LCG (0x5DEECE66D) in integer arithmetic and the
    // surrogate in numpy — acquisition argmax gaps ≥ 3.3·10⁻² vs
    // ~10⁻¹⁵ solver drift, emitted-value margins ≥ 2.8·10⁻⁸. The
    // sequence shows the machinery working: inits land at 0.73/0.68,
    // every guided trial lands within 0.09 of the optimum. A drifted
    // draw stream, a wrong standardization, or a flipped acquisition
    // is a red hash row — this gives q135's machinery (not its
    // stochastic fits) an oracle row.
    Q("q172_surrogate_sequence_gate", { t =>
        import t.spark.implicits._
        val res = Search.surrogate(Map("x" -> (0.0, 1.0)), nInit = 2,
          nTotal = 5, candidatePool = 8, kappa = 1.0, seed = 42) { p =>
            val x = p("x"); -(x - 0.3) * (x - 0.3)
          }
        res.history.zipWithIndex.map { case (tr, i) =>
          (i, tr.params("x"), tr.metric,
           tr.params == res.best.params && tr.metric == res.best.metric)
        }.toDF("trial", "x", "metric", "is_best")
          .select(col("trial"), round(col("x"), 6).as("x"),
                  round(col("metric"), 6).as("metric"), col("is_best"))
      },
      Some("""SELECT * FROM (VALUES
        |  (0, CAST(0.727564 AS DOUBLE), CAST(-0.182811 AS DOUBLE), false),
        |  (1, 0.683223, -0.14686, false),
        |  (2, 0.275748, -0.000588, true),
        |  (3, 0.386567, -0.007494, false),
        |  (4, 0.35792, -0.003355, false)
        |) t(trial, x, metric, is_best)""".stripMargin))
  )
}
