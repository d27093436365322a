package graft.operators

import org.apache.spark.sql.functions._
import graft.Q
import graft.etl.Urm
import graft.similarity.Similarity
import graft.recommend.{Models, Recommenders}
import graft.eval.Evaluation

/** Coverage queries for the remaining SURVEY §2 operators: euclidean
  * similarity (L3), cold-entity detection (L31), negative sampling
  * (X7), explicit-feedback MF (L22 via ALS), popularity/inter-list
  * diversity metrics.
  */
object ExtraQueries {

  private val urmCte =
    """WITH urm AS (
      |  SELECT DISTINCT o_custkey AS u, l_partkey AS i
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |)""".stripMargin

  /** Per-cutoff evaluation SQL block over the shared `cum` CTE (ranked
    * TopPop recs vs held-out split, rank ≤ 20). The AUC numerator uses
    * the aggregate identity Σ_{hit}((c−r)−(tot−cum)) =
    * Σ_{hit}(c−r+cum) − n_hits². */
  private def evalAtCutoffSql(c: Int): String =
    s"""SELECT $c AS cutoff,
       |  round(SUM(prec) / COUNT(*), 6) AS precision,
       |  round(SUM(rec) / COUNT(*), 6) AS recall,
       |  round(SUM(ap) / COUNT(*), 6) AS map,
       |  round(SUM(ndcg) / COUNT(*), 6) AS ndcg,
       |  round(SUM(auc) / COUNT(*), 6) AS roc_auc,
       |  COUNT(*) AS n_users
       |FROM (
       |  SELECT u,
       |    CAST(n_hits AS DOUBLE) / $c AS prec,
       |    CAST(n_hits AS DOUBLE) / n_rel AS rec,
       |    ap_num / LEAST(n_rel, $c) AS ap,
       |    dcg / (SELECT SUM(1.0 / log2(x + 1))
       |           FROM idcg_base WHERE x <= m) AS ndcg,
       |    CASE WHEN n_hits = 0 OR n_hits = $c THEN 0.0
       |         ELSE CAST(auc_num AS DOUBLE) / (n_hits * ($c - n_hits))
       |    END AS auc
       |  FROM (
       |    SELECT u,
       |      CAST(SUM(hit) AS BIGINT) AS n_hits,
       |      ANY_VALUE(n_rel) AS n_rel,
       |      LEAST(ANY_VALUE(n_rel), $c) AS m,
       |      SUM(CASE WHEN hit = 1
       |          THEN CAST(cum_hits AS DOUBLE) / rank ELSE 0.0 END)
       |        AS ap_num,
       |      SUM(CASE WHEN hit = 1
       |          THEN 1.0 / log2(rank + 1) ELSE 0.0 END) AS dcg,
       |      CAST(SUM(CASE WHEN hit = 1
       |          THEN ($c - rank) + cum_hits ELSE 0 END)
       |          - SUM(hit) * SUM(hit) AS BIGINT) AS auc_num
       |    FROM cum WHERE rank <= $c GROUP BY u
       |  ) pu
       |) sc""".stripMargin

  def queries: Seq[Q] = Seq(

    // L3 — euclidean similarity, linear transform 1/(d+ε), top-5
    // (reference: Base/Similarity/Compute_Similarity_Euclidean.py).
    Q("q62_euclidean_topk",
      t => Similarity.topK(
          Similarity.itemSimilarity(Urm.fromOrders(t),
                                    Similarity.Euclidean("lin")), 5)
        .select(col("i"), col("j"), round(col("w"), 6).as("w"), col("rank")),
      Some(urmCte + """,
        |dots AS (
        |  SELECT a.i AS i, b.i AS j, COUNT(*) AS dot
        |  FROM urm a JOIN urm b ON a.u = b.u AND a.i <> b.i
        |  GROUP BY 1, 2
        |), norms AS (SELECT i, COUNT(*) AS n FROM urm GROUP BY 1),
        |sim AS (
        |  SELECT d.i, d.j,
        |    1.0 / (sqrt(CAST(ni.n + nj.n - 2 * d.dot AS DOUBLE))
        |           + 0.0 + 1e-9) AS w
        |  FROM dots d
        |  JOIN norms ni ON d.i = ni.i
        |  JOIN norms nj ON d.j = nj.i
        |)
        |SELECT i, j, round(w, 6) AS w, rank FROM (
        |  SELECT i, j, w,
        |    ROW_NUMBER() OVER (PARTITION BY j ORDER BY w DESC, i) AS rank
        |  FROM sim) s
        |WHERE rank <= 5""".stripMargin)),

    // L31 — cold-entity detection: items never sold, via anti-join
    // (reference: Base/BaseRecommender.py:41-51 cold masks).
    Q("q71_cold_items",
      t => t.part.join(t.lineitem,
          col("p_partkey") === col("l_partkey"), "left_anti")
        .select("p_partkey", "p_brand"),
      Some("""SELECT p_partkey, p_brand FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_partkey = p_partkey)""".stripMargin)),

    // X7 — negative sampling. The md5-draw definition is engine-
    // independent (see Urm.negativeSample), so the sample itself is
    // hash-checked: the oracle ranks the dense anti-joined candidate
    // set while Spark runs the pruned two-pass scale path — their exact
    // equality IS the gate.
    Q("q72_negative_sampling", { t =>
        val urm = Urm.fromOrders(t).filter(col("u") < 2000)
        val items = urm.select("i").distinct().orderBy("i").limit(500)
        Urm.negativeSample(urm, items, nPerUser = 5, seed = 42)
      },
      Some(urmCte + """,
        |u2 AS (SELECT u, i FROM urm WHERE u < 2000),
        |its AS (SELECT DISTINCT i FROM u2 ORDER BY i LIMIT 500),
        |cand AS (
        |  SELECT us.u, its.i,
        |    ('0x' || substr(md5(42 || ':' || us.u || ':' || its.i), 1, 13))
        |      ::BIGINT AS ord
        |  FROM (SELECT DISTINCT u FROM u2) us CROSS JOIN its
        |  WHERE NOT EXISTS (SELECT 1 FROM u2
        |                    WHERE u2.u = us.u AND u2.i = its.i)
        |)
        |SELECT u, i FROM (
        |  SELECT u, i, ROW_NUMBER() OVER (PARTITION BY u
        |    ORDER BY ord, i) AS rk FROM cand) t
        |WHERE rk <= 5""".stripMargin)),

    // L10 — Random recommender scores: md5-uniform per (u, i) (see
    // Recommenders.randomScores), bit-reproducible → hash-gated.
    Q("q73_random_scores", { t =>
        val urm = Urm.fromOrders(t)
        Recommenders.randomScores(
          urm.select("u").distinct().orderBy("u").limit(50),
          urm.select("i").distinct().orderBy("i").limit(100), seed = 42)
      },
      Some(urmCte + """,
        |us AS (SELECT DISTINCT u FROM urm ORDER BY u LIMIT 50),
        |its AS (SELECT DISTINCT i FROM urm ORDER BY i LIMIT 100)
        |SELECT us.u, its.i,
        |  round((('0x' || substr(md5(42 || ':' || us.u || ':' || its.i),
        |          1, 13))::BIGINT + 0.5) / 4503599627370496.0, 6) AS score
        |FROM us CROSS JOIN its""".stripMargin)),

    // L22 — FunkSVD-analog: EXPLICIT-feedback ALS over mean quantities —
    // ratings are regression labels for the same squared-error objective
    // FunkSVD descends (ml.ALS with implicitPrefs=false per SURVEY §7.3;
    // round 2 ran implicit ALS here, a different objective); rows-only.
    Q("q74_funk_als", { t =>
        val ratings = Urm.ratingsFromOrders(t)
          .select(col("u"), col("i"), col("r").as("v"))
        val (_, itemF) = Models.alsExplicit(ratings, rank = 8, reg = 0.1,
          iters = 3, seed = 7)
        itemF.select(col("id"), size(col("features")).as("k"))
      }, None),

    // §2.10 cutoff-list evaluation (reference: test cutoffs [5,10,20],
    // run_hyperparameter_tuning.py:42-58): one top-20 ranking, metrics
    // stacked per cutoff.
    Q("q77_eval_cutoffs", { t =>
        val split = Urm.hashSplit(Urm.fromOrders(t), 8, 10)
        val train = split.filter(col("split") === "train").select("u", "i")
        val test = split.filter(col("split") === "test").select("u", "i")
        val pop = Recommenders.topPop(train)
          .select(col("i").as("item"), col("pop").cast("double").as("score"))
        val recs = Recommenders.recommendGlobal(pop, train, 20)
        Evaluation.accuracyMetricsAtCutoffs(
            Evaluation.hitTable(recs, test), Seq(5, 10, 20))
          .select("cutoff", "precision", "recall", "map", "ndcg",
                  "roc_auc", "n_users")
      },
      Some(urmCte + """,
        |train AS (SELECT u, i FROM urm WHERE (u*31 + i) % 10 < 8),
        |test AS (SELECT u, i FROM urm WHERE (u*31 + i) % 10 >= 8),
        |pop AS (SELECT i, COUNT(*) AS pop FROM train GROUP BY 1),
        |users AS (SELECT DISTINCT u FROM train),
        |recs AS (
        |  SELECT u, item, rank FROM (
        |    SELECT s.u, s.item,
        |      ROW_NUMBER() OVER (PARTITION BY s.u
        |        ORDER BY s.score DESC, s.item) AS rank
        |    FROM (SELECT users.u AS u, pop.i AS item,
        |                 CAST(pop AS DOUBLE) AS score
        |          FROM users CROSS JOIN pop) s
        |    WHERE NOT EXISTS (SELECT 1 FROM train t2
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
        |), cum AS (
        |  SELECT u, rank, hit, n_rel,
        |    SUM(hit) OVER (PARTITION BY u ORDER BY rank
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_hits
        |  FROM hits
        |), idcg_base AS (SELECT x FROM generate_series(1, 20) g(x))
        |""".stripMargin +
        Seq(5, 10, 20).map(evalAtCutoffSql).mkString("\nUNION ALL\n"))),

    // R2 — candidate-set restriction of scoring (negative-item ranking,
    // reference: Base/Evaluation/Evaluator.py:780-826): the candidate
    // set here is predicate-defined so the oracle states it as WHERE.
    Q("q78_candidate_restriction", { t =>
        val urm = Urm.fromOrders(t)
        // the top-K'ed similarity feeds both the target list and the
        // scoring join — persist the (item²-bounded) matrix once so the
        // pair-aggregation subtree underneath runs once
        val sim = graft.core.CacheScope.persist(Similarity.topK(
          Similarity.itemSimilarity(urm, Similarity.Cosine), 10)
          .select(col("i"), col("j"), col("w")))
        // predicate-defined candidate set built from the bounded
        // user × target id lists (not from a second scoring pass) and
        // pushed INSIDE the scoring aggregation — round 1 derived
        // candidates from `scores` and semi-joined after the groupBy,
        // computing the scoring subtree twice
        val users = urm.filter(col("u") < 100).select("u").distinct()
        val targets = sim.select(col("j").as("item")).distinct()
        val candidates = users.crossJoin(broadcast(targets))
          .filter((col("u") + col("item")) % 3 === 0)
        Recommenders.scoreBySimilarityRestricted(
            urm.filter(col("u") < 100), sim, candidates)
          .select(col("u"), col("item"), round(col("score"), 6).as("score"))
      },
      Some(urmCte + """,
        |dots AS (
        |  SELECT a.i AS i, b.i AS j, COUNT(*) AS dot
        |  FROM urm a JOIN urm b ON a.u = b.u AND a.i <> b.i
        |  GROUP BY 1, 2
        |), norms AS (SELECT i, COUNT(*) AS n FROM urm GROUP BY 1),
        |sim AS (
        |  SELECT i, j, w FROM (
        |    SELECT d.i, d.j,
        |      CAST(d.dot AS DOUBLE) / (sqrt(ni.n) * sqrt(nj.n)) AS w,
        |      ROW_NUMBER() OVER (PARTITION BY d.j
        |        ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(ni.n) * sqrt(nj.n))
        |          DESC, d.i) AS rank
        |    FROM dots d
        |    JOIN norms ni ON d.i = ni.i
        |    JOIN norms nj ON d.j = nj.i) s
        |  WHERE rank <= 10
        |)
        |SELECT u, item, score FROM (
        |  SELECT urm.u AS u, sim.j AS item,
        |    round(CAST(SUM(CAST(sim.w AS DECIMAL(28,12))) AS DOUBLE), 6)
        |      AS score
        |  FROM urm JOIN sim ON urm.i = sim.i
        |  WHERE urm.u < 100
        |  GROUP BY 1, 2) sc
        |WHERE (u + item) % 3 = 0""".stripMargin)),

    // §2.10 — intra-list diversity of TopPop@10 lists against the
    // cosine similarity matrix (reference: metrics.py:642-696).
    Q("q79_intra_list_diversity", { t =>
        val urm = Urm.fromOrders(t)
        val split = Urm.hashSplit(urm, 8, 10)
        val train = split.filter(col("split") === "train").select("u", "i")
        val pop = Recommenders.topPop(train)
          .select(col("i").as("item"), col("pop").cast("double").as("score"))
        val recs = Recommenders.recommendGlobal(pop, train, 10)
        val sim = Similarity.topK(
          Similarity.itemSimilarity(urm, Similarity.Cosine), 10)
          .select(col("i"), col("j"), col("w"))
        Evaluation.intraListDiversity(recs, sim)
      },
      Some(urmCte + """,
        |train AS (SELECT u, i FROM urm WHERE (u*31 + i) % 10 < 8),
        |pop AS (SELECT i, COUNT(*) AS pop FROM train GROUP BY 1),
        |users AS (SELECT DISTINCT u FROM train),
        |recs AS (
        |  SELECT u, item FROM (
        |    SELECT s.u, s.item,
        |      ROW_NUMBER() OVER (PARTITION BY s.u
        |        ORDER BY s.score DESC, s.item) AS rank
        |    FROM (SELECT users.u AS u, pop.i AS item,
        |                 CAST(pop AS DOUBLE) AS score
        |          FROM users CROSS JOIN pop) s
        |    WHERE NOT EXISTS (SELECT 1 FROM train t2
        |                      WHERE t2.u = s.u AND t2.i = s.item)) r
        |  WHERE rank <= 10
        |), dots AS (
        |  SELECT a.i AS i, b.i AS j, COUNT(*) AS dot
        |  FROM urm a JOIN urm b ON a.u = b.u AND a.i <> b.i
        |  GROUP BY 1, 2
        |), norms AS (SELECT i, COUNT(*) AS n FROM urm GROUP BY 1),
        |sim AS (
        |  SELECT i, j, w FROM (
        |    SELECT d.i, d.j,
        |      CAST(d.dot AS DOUBLE) / (sqrt(ni.n) * sqrt(nj.n)) AS w,
        |      ROW_NUMBER() OVER (PARTITION BY d.j
        |        ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(ni.n) * sqrt(nj.n))
        |          DESC, d.i) AS rank
        |    FROM dots d
        |    JOIN norms ni ON d.i = ni.i
        |    JOIN norms nj ON d.j = nj.i) s
        |  WHERE rank <= 10
        |), pairs AS (
        |  SELECT a.u, a.item AS ia, b.item AS ib
        |  FROM recs a JOIN recs b ON a.u = b.u AND a.item < b.item
        |), per_user AS (
        |  SELECT pairs.u,
        |    SUM(1.0 - COALESCE(sim.w, 0.0)) / COUNT(*) AS ild
        |  FROM pairs
        |  LEFT JOIN sim ON sim.i = pairs.ia AND sim.j = pairs.ib
        |  GROUP BY pairs.u
        |)
        |SELECT round(SUM(ild) / COUNT(*), 6) AS intra_list_diversity
        |FROM per_user""".stripMargin)),

    // A6 — set-per-group aggregation (reference:
    // Utils/dataset.py:985 groupby().unique()): sorted distinct arrays,
    // serialized to a comma-joined string so the result cells are
    // hashable scalars for the cross-engine comparator.
    Q("q76_collect_set",
      t => t.lineitem.groupBy("l_suppkey")
        .agg(concat_ws(",", sort_array(collect_set(col("l_partkey"))))
               .as("parts"),
             countDistinct(col("l_partkey")).as("n_parts")),
      Some("""SELECT l_suppkey,
        |array_to_string(list_sort(list(DISTINCT l_partkey)), ',') AS parts,
        |COUNT(DISTINCT l_partkey) AS n_parts
        |FROM lineitem GROUP BY 1""".stripMargin)),

    // §2.10 DIVERSITY_GINI over recommendation lists (reference:
    // metrics.py:401-442 Gini_Diversity): inverted-range gini of the
    // per-item recommendation counts of TopPop@10, over the full item
    // universe with zero-count items included.
    Q("q86_diversity_gini", { t =>
        val urm = Urm.fromOrders(t)
        val split = Urm.hashSplit(urm, 8, 10)
        val train = split.filter(col("split") === "train").select("u", "i")
        val pop = Recommenders.topPop(train)
          .select(col("i").as("item"), col("pop").cast("double").as("score"))
        val recs = Recommenders.recommendGlobal(pop, train, 10)
        Evaluation.diversityGini(recs, urm.select("i").distinct())
      },
      Some(urmCte + """,
        |train AS (SELECT u, i FROM urm WHERE (u*31 + i) % 10 < 8),
        |pop AS (SELECT i, COUNT(*) AS pop FROM train GROUP BY 1),
        |users AS (SELECT DISTINCT u FROM train),
        |recs AS (
        |  SELECT u, item FROM (
        |    SELECT s.u, s.item,
        |      ROW_NUMBER() OVER (PARTITION BY s.u
        |        ORDER BY s.score DESC, s.item) AS rank
        |    FROM (SELECT users.u AS u, pop.i AS item,
        |                 CAST(pop AS DOUBLE) AS score
        |          FROM users CROSS JOIN pop) s
        |    WHERE NOT EXISTS (SELECT 1 FROM train t2
        |                      WHERE t2.u = s.u AND t2.i = s.item)) r
        |  WHERE rank <= 10
        |), allitems AS (SELECT DISTINCT i AS item FROM urm),
        |cnt AS (
        |  SELECT a.item, COALESCE(rc.c, 0) AS c
        |  FROM allitems a
        |  LEFT JOIN (SELECT item, COUNT(*) AS c FROM recs GROUP BY 1) rc
        |    ON a.item = rc.item
        |), ranked AS (
        |  SELECT c, ROW_NUMBER() OVER (ORDER BY c, item) AS r FROM cnt
        |)
        |SELECT round(
        |  2.0 * CAST((COUNT(*) + 1) * SUM(c) - SUM(r * c) AS DOUBLE)
        |      / CAST((COUNT(*) + 1) * SUM(c) AS DOUBLE), 6)
        |  AS diversity_gini
        |FROM ranked""".stripMargin)),

    // Beyond-accuracy: normalized average popularity + closed-form mean
    // inter-list diversity of the TopPop recommendations
    // (reference: metrics.py:592-636, 702-810).
    Q("q75_avgpop_mil", { t =>
        val split = Urm.hashSplit(Urm.fromOrders(t), 8, 10)
        val train = split.filter(col("split") === "train").select("u", "i")
        val pop = Recommenders.topPop(train)
        val popScores = pop.select(col("i").as("item"),
                                   col("pop").cast("double").as("score"))
        // two metric branches share the rec-list subtree — persist once
        val recs = graft.core.CacheScope.persist(
          Recommenders.recommendGlobal(popScores, train, 10))
        Evaluation.averagePopularity(recs, pop)
          .crossJoin(Evaluation.meanInterListDiversity(recs, 10))
      },
      Some(urmCte + """,
        |train AS (SELECT u, i FROM urm WHERE (u*31 + i) % 10 < 8),
        |pop AS (SELECT i, COUNT(*) AS pop FROM train GROUP BY 1),
        |users AS (SELECT DISTINCT u FROM train),
        |recs AS (
        |  SELECT u, item, rank FROM (
        |    SELECT s.u, s.item,
        |      ROW_NUMBER() OVER (PARTITION BY s.u
        |        ORDER BY s.score DESC, s.item) AS rank
        |    FROM (SELECT users.u AS u, pop.i AS item,
        |                 CAST(pop AS DOUBLE) AS score
        |          FROM users CROSS JOIN pop) s
        |    WHERE NOT EXISTS (SELECT 1 FROM train t2
        |                      WHERE t2.u = s.u AND t2.i = s.item)) r
        |  WHERE rank <= 10
        |), reccnt AS (SELECT item, COUNT(*) AS c FROM recs GROUP BY 1)
        |SELECT
        |  (SELECT round((CAST(SUM(pop) AS DOUBLE) / COUNT(*))
        |                / (SELECT MAX(pop) FROM pop), 6)
        |   FROM recs JOIN pop ON recs.item = pop.i) AS avg_popularity,
        |  (SELECT round(1.0 - (CAST(SUM(c * (c - 1)) AS DOUBLE)
        |    / ((SELECT CAST(COUNT(DISTINCT u) AS DOUBLE) FROM recs)
        |       * ((SELECT COUNT(DISTINCT u) FROM recs) - 1) * 10)), 6)
        |   FROM reccnt) AS mean_inter_list_diversity""".stripMargin))
  )
}
