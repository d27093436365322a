package graft.recommend

import org.apache.spark.sql.functions._
import graft.{Q, Qh}
import graft.core.Tables
import graft.etl.Urm
import graft.similarity.{Similarity, Weighting}
import graft.eval.Evaluation

/** Oracle-checked queries for the URM / similarity / recommender /
  * evaluation surface (SURVEY.md §2.8–2.11). The star schema stands in
  * for the interaction log: user = o_custkey, item = l_partkey.
  */
object RecsysQueries {

  /** Shared oracle CTE: the implicit URM. */
  private val urmCte =
    """WITH urm AS (
      |  SELECT DISTINCT o_custkey AS u, l_partkey AS i
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |)""".stripMargin

  def queries: Seq[Q] = Seq(

    // L1 — URM construction: dedup to binary triples
    // (reference: Utils/dataset.py:327-359).
    Q("q30_urm_build",
      t => Urm.fromOrders(t),
      Some(urmCte + "\nSELECT u, i, 1 AS v FROM urm")),

    // X1 twin — deterministic modulo split; membership is a pure key
    // function so the oracle computes identical splits.
    Q("q31_hash_split",
      t => Urm.hashSplit(Urm.fromOrders(t), 8, 10)
        .groupBy("split").agg(count(lit(1)).as("n")),
      Some(urmCte + """
        |SELECT CASE WHEN (u*31 + i) % 10 < 8 THEN 'train' ELSE 'test' END
        |  AS split, COUNT(*) AS n
        |FROM urm GROUP BY 1""".stripMargin)),

    // X5 — cold-start user-wise split, deterministic md5-routed twin
    // (reference: split_train_validation.py:295-378): 40% of
    // enough-item users keep full profiles in train; cold users keep 2
    // interactions, rest held out.
    Q("q81_cold_user_split",
      t => Urm.coldUserSplitHash(Urm.fromOrders(t).select("u", "i"),
                                 fullTrainFrac = 0.4, coldItems = 2)
        .groupBy("split")
        .agg(count(lit(1)).as("n"),
             countDistinct(col("u")).as("n_users")),
      Some(urmCte + """,
        |base AS (
        |  SELECT u, i,
        |    COUNT(*) OVER (PARTITION BY u) AS n,
        |    (('0x' || substr(md5(CAST(u AS VARCHAR)), 1, 15))::BIGINT
        |       % 1000) / 1000.0 AS u_draw,
        |    ROW_NUMBER() OVER (PARTITION BY u
        |      ORDER BY md5(CAST(u AS VARCHAR) || ',' ||
        |                   CAST(i AS VARCHAR)), i) AS rn
        |  FROM urm
        |)
        |SELECT split, COUNT(*) AS n, COUNT(DISTINCT u) AS n_users FROM (
        |  SELECT u, CASE WHEN NOT (n > 2 AND u_draw >= 0.4) OR rn <= 2
        |                 THEN 'train' ELSE 'validation' END AS split
        |  FROM base) s
        |GROUP BY 1""".stripMargin)),

    // L2 kernel — pairwise co-occurrence dot products (AᵀA off-diagonal),
    // upper triangle, support ≥ 3.
    Q("q32_cooccurrence",
      t => Similarity.pairDots(Urm.fromOrders(t))
        .filter(col("i") < col("j") && col("dot") >= 3),
      Some(urmCte + """
        |SELECT a.i AS i, b.i AS j, COUNT(*) AS dot
        |FROM urm a JOIN urm b ON a.u = b.u AND a.i < b.i
        |GROUP BY 1, 2 HAVING COUNT(*) >= 3""".stripMargin)),

    // L2 + L28/T4 — cosine similarity with column-wise top-10 pruning.
    // Binary dots/norms are integers, so the weights are bit-identical
    // IEEE arithmetic in both engines and the ranking is deterministic.
    Q("q33_cosine_topk",
      t => Similarity.topK(
          Similarity.itemSimilarity(Urm.fromOrders(t), Similarity.Cosine), 10)
        .select(col("i"), col("j"), round(col("w"), 6).as("w"), col("rank")),
      Some(urmCte + """,
        |dots AS (
        |  SELECT a.i AS i, b.i AS j, COUNT(*) AS dot
        |  FROM urm a JOIN urm b ON a.u = b.u AND a.i <> b.i
        |  GROUP BY 1, 2
        |), norms AS (SELECT i, COUNT(*) AS n FROM urm GROUP BY 1),
        |sim AS (
        |  SELECT d.i, d.j,
        |    CAST(d.dot AS DOUBLE) / (sqrt(ni.n) * sqrt(nj.n)) AS w
        |  FROM dots d
        |  JOIN norms ni ON d.i = ni.i
        |  JOIN norms nj ON d.j = nj.i
        |)
        |SELECT i, j, round(w, 6) AS w, rank FROM (
        |  SELECT i, j, w,
        |    ROW_NUMBER() OVER (PARTITION BY j ORDER BY w DESC, i) AS rank
        |  FROM sim) s
        |WHERE rank <= 10""".stripMargin)),

    // L2 variant — Jaccard/Tanimoto similarity, top-10
    // (reference: Compute_Similarity_Python.py:193-208 binary variants).
    Q("q34_jaccard_topk",
      t => Similarity.topK(
          Similarity.itemSimilarity(Urm.fromOrders(t), Similarity.Jaccard), 10)
        .select(col("i"), col("j"), round(col("w"), 6).as("w"), col("rank")),
      Some(urmCte + """,
        |dots AS (
        |  SELECT a.i AS i, b.i AS j, COUNT(*) AS dot
        |  FROM urm a JOIN urm b ON a.u = b.u AND a.i <> b.i
        |  GROUP BY 1, 2
        |), norms AS (SELECT i, COUNT(*) AS n FROM urm GROUP BY 1),
        |sim AS (
        |  SELECT d.i, d.j,
        |    CAST(d.dot AS DOUBLE) / (ni.n + nj.n - d.dot) AS w
        |  FROM dots d
        |  JOIN norms ni ON d.i = ni.i
        |  JOIN norms nj ON d.j = nj.i
        |)
        |SELECT i, j, round(w, 6) AS w, rank FROM (
        |  SELECT i, j, w,
        |    ROW_NUMBER() OVER (PARTITION BY j ORDER BY w DESC, i) AS rank
        |  FROM sim) s
        |WHERE rank <= 10""".stripMargin)),

    // L4 — TF-IDF weighting of the URM
    // (reference: Base/IR_feature_weighting.py:55-78).
    Q("q35_tfidf",
      t => Weighting.tfidf(Urm.fromOrders(t).withColumn("v", lit(1)))
        .select(col("u"), col("i"), round(col("w"), 6).as("w")),
      Some(urmCte + """,
        |df AS (SELECT i, COUNT(*) AS df FROM urm GROUP BY 1),
        |nu AS (SELECT COUNT(DISTINCT u) AS n_users FROM urm)
        |SELECT u, urm.i AS i,
        |  round(sqrt(1.0) * ln(CAST(n_users AS DOUBLE) / (df + 1)), 6) AS w
        |FROM urm JOIN df ON urm.i = df.i CROSS JOIN nu""".stripMargin)),

    // L5 — Okapi BM25 weighting (K1=1.2, B=0.75)
    // (reference: Base/IR_feature_weighting.py:13-50).
    Q("q36_bm25",
      t => Weighting.bm25(Urm.fromOrders(t).withColumn("v", lit(1)))
        .select(col("u"), col("i"), round(col("w"), 6).as("w")),
      Some(urmCte + """,
        |df AS (SELECT i, COUNT(*) AS df FROM urm GROUP BY 1),
        |len AS (SELECT u, COUNT(*) AS len FROM urm GROUP BY 1),
        |g AS (SELECT COUNT(DISTINCT u) AS n_users, COUNT(*) AS nnz FROM urm)
        |SELECT urm.u AS u, urm.i AS i, round(
        |  ln((CAST(n_users AS DOUBLE) - df + 0.5) / (df + 0.5))
        |  * 1.0 * (1.2 + 1)
        |  / (1.0 + 1.2 * (1 - 0.75 + 0.75 * len
        |                  / (CAST(nnz AS DOUBLE) / n_users))), 6) AS w
        |FROM urm JOIN df ON urm.i = df.i JOIN len ON urm.u = len.u
        |CROSS JOIN g""".stripMargin)),

    // L2+L4 — FEATURE-WEIGHTED cosine similarity: TF-IDF weights
    // replace the binary entries before the pair engine (reference:
    // run_parameter_search.py feature_weighting='TF-IDF' feeding
    // Compute_Similarity_Python). Weights round to 9 decimals and
    // accumulate as exact decimals inside itemSimilarityWeighted, so
    // the weighted dots/norms — double sums in the naive form — are
    // bit-identical across engines. Bounded item range keeps the pair
    // fan-out moderate next to q33's full-URM run.
    Q("q141_weighted_cosine_topk", { t =>
        val urm = Urm.fromOrders(t).filter(col("i") < 2000)
        val sim = Similarity.itemSimilarityWeighted(
            Weighting.tfidf(urm.withColumn("v", lit(1))),
            Similarity.Cosine)
          // rank on the ROUNDED weight: dots/norms are exact decimals,
          // but the final double division differs by 1 ulp between
          // engines (measured), which would flip near-tie ranks;
          // rounding first makes ties exact and the id tie-break total
          .withColumn("w", round(col("w"), 6))
        Similarity.topK(sim, 5)
          .select(col("i"), col("j"), col("w"), col("rank"))
      },
      Some("""WITH urm AS (
        |  SELECT DISTINCT o_custkey AS u, l_partkey AS i
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_partkey < 2000
        |), df AS (SELECT i, COUNT(*) AS df FROM urm GROUP BY 1),
        |nu AS (SELECT COUNT(DISTINCT u) AS n_users FROM urm),
        |wts AS (
        |  SELECT u, urm.i AS i,
        |    CAST(round(sqrt(1.0) * ln(CAST(n_users AS DOUBLE) / (df + 1)), 9)
        |         AS DECIMAL(18,9)) AS w
        |  FROM urm JOIN df ON urm.i = df.i CROSS JOIN nu
        |), dots AS (
        |  SELECT a.i AS i, b.i AS j, SUM(a.w * b.w) AS dot
        |  FROM wts a JOIN wts b ON a.u = b.u AND a.i <> b.i
        |  GROUP BY 1, 2
        |), norms AS (SELECT i, SUM(w * w) AS n FROM wts GROUP BY 1),
        |sim AS (
        |  SELECT d.i, d.j,
        |    CAST(d.dot AS DOUBLE)
        |      / (sqrt(CAST(ni.n AS DOUBLE)) * sqrt(CAST(nj.n AS DOUBLE))
        |         + 1e-6)
        |      AS w
        |  FROM dots d
        |  JOIN norms ni ON d.i = ni.i
        |  JOIN norms nj ON d.j = nj.i
        |)
        |SELECT i, j, w, rank FROM (
        |  SELECT i, j, round(w, 6) AS w,
        |    ROW_NUMBER() OVER (PARTITION BY j
        |      ORDER BY round(w, 6) DESC, i) AS rank
        |  FROM sim) s
        |WHERE rank <= 5""".stripMargin)),

    // L8 — TopPop: the 20 most popular items
    // (reference: Base/NonPersonalizedRecommender.py:27-47).
    Q("q37_toppop",
      t => Recommenders.topPop(Urm.fromOrders(t))
        .orderBy(desc("pop"), asc("i")).limit(20),
      Some(urmCte + """
        |SELECT i, COUNT(*) AS pop FROM urm GROUP BY 1
        |ORDER BY pop DESC, i LIMIT 20""".stripMargin)),

    // L9 — GlobalEffects: shrunk item biases over mean quantities
    // (reference: Base/NonPersonalizedRecommender.py:75-136), λ_item=25.
    Q("q38_global_effects",
      t => Recommenders.globalEffects(Urm.ratingsFromOrders(t), 25.0, 10.0)
        .select(col("i"), round(col("item_bias"), 6).as("item_bias"))
        .distinct(),
      Some("""WITH rt AS (
        |  SELECT o_custkey AS u, l_partkey AS i,
        |    SUM(l_quantity) / COUNT(*) AS r
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2
        |), g AS (SELECT SUM(r) / COUNT(*) AS mu FROM rt)
        |SELECT i, round((SUM(r) - COUNT(*) * ANY_VALUE(mu))
        |                / (COUNT(*) + 25.0), 6) AS item_bias
        |FROM rt CROSS JOIN g GROUP BY i""".stripMargin)),

    // L6 — item-KNN scoring: URM[u]·W over the top-10 cosine model,
    // users < 100 (reference: BaseSimilarityMatrixRecommender.py:77-96).
    Q("q39_itemknn_scores", { t =>
        val urm = Urm.fromOrders(t)
        val sim = Similarity.topK(
          Similarity.itemSimilarity(urm, Similarity.Cosine), 10)
          .select(col("i"), col("j"), col("w"))
        Recommenders.scoreBySimilarity(urm.filter(col("u") < 100), sim)
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
        |SELECT urm.u AS u, sim.j AS item,
        |  round(CAST(SUM(CAST(sim.w AS DECIMAL(28,12))) AS DOUBLE), 6)
        |    AS score
        |FROM urm JOIN sim ON urm.i = sim.i
        |WHERE urm.u < 100
        |GROUP BY 1, 2""".stripMargin)),

    // L16 — P3alpha 2-hop random-walk similarity (α=1), top-10
    // (reference: GraphBased/P3alphaRecommender.py:33-141).
    Q("q41_p3alpha",
      t => Similarity.topK(
          Recommenders.p3alpha(Urm.fromOrders(t), 1.0), 10)
        .select(col("i"), col("j"), round(col("w"), 9).as("w"), col("rank")),
      Some(urmCte + """,
        |udeg AS (SELECT u, COUNT(*) AS nu FROM urm GROUP BY 1),
        |ideg AS (SELECT i, COUNT(*) AS ni FROM urm GROUP BY 1),
        |pairs AS (
        |  SELECT a.i AS i, b.i AS j,
        |    CAST(SUM(CAST(FLOOR(1e12 / nu) AS BIGINT)) AS DOUBLE) / 1e12
        |      AS usum
        |  FROM urm a
        |  JOIN urm b ON a.u = b.u AND a.i <> b.i
        |  JOIN udeg ON a.u = udeg.u
        |  GROUP BY 1, 2
        |), sim AS (
        |  SELECT p.i, p.j, (1.0 / ni) * usum AS w
        |  FROM pairs p JOIN ideg ON p.i = ideg.i
        |)
        |SELECT i, j, round(w, 9) AS w, rank FROM (
        |  SELECT i, j, w,
        |    ROW_NUMBER() OVER (PARTITION BY j ORDER BY w DESC, i) AS rank
        |  FROM sim) s
        |WHERE rank <= 10""".stripMargin)),

    // L17 — RP3beta: P3alpha with popularity penalty deg_j (β=1), top-10
    // (reference: GraphBased/RP3betaRecommender.py:32-153).
    Q("q42_rp3beta",
      t => Similarity.topK(
          Recommenders.rp3beta(Urm.fromOrders(t), 1.0, 1.0), 10)
        .select(col("i"), col("j"), round(col("w"), 9).as("w"), col("rank")),
      Some(urmCte + """,
        |udeg AS (SELECT u, COUNT(*) AS nu FROM urm GROUP BY 1),
        |ideg AS (SELECT i, COUNT(*) AS ni FROM urm GROUP BY 1),
        |pairs AS (
        |  SELECT a.i AS i, b.i AS j,
        |    CAST(SUM(CAST(FLOOR(1e12 / nu) AS BIGINT)) AS DOUBLE) / 1e12
        |      AS usum
        |  FROM urm a
        |  JOIN urm b ON a.u = b.u AND a.i <> b.i
        |  JOIN udeg ON a.u = udeg.u
        |  GROUP BY 1, 2
        |), sim AS (
        |  SELECT p.i, p.j,
        |    ((1.0 / idi.ni) * usum) / idj.ni AS w
        |  FROM pairs p
        |  JOIN ideg idi ON p.i = idi.i
        |  JOIN ideg idj ON p.j = idj.i
        |)
        |SELECT i, j, round(w, 9) AS w, rank FROM (
        |  SELECT i, j, w,
        |    ROW_NUMBER() OVER (PARTITION BY j ORDER BY w DESC, i) AS rank
        |  FROM sim) s
        |WHERE rank <= 10""".stripMargin)),

    // R1 — the full recommendation query: TopPop scores on the train
    // split, seen items removed by anti-join (the engine's -inf masking,
    // reference Base/BaseRecommender.py:104-213), per-user top-5.
    Q("q43_recommend_toppop", { t =>
        val split = Urm.hashSplit(Urm.fromOrders(t), 8, 10)
        val train = split.filter(col("split") === "train").select("u", "i")
        val pop = Recommenders.topPop(train)
          .select(col("i").as("item"), col("pop").cast("double").as("score"))
        Recommenders.recommendGlobal(pop, train, 5)
      },
      Some(urmCte + """,
        |train AS (SELECT u, i FROM urm WHERE (u*31 + i) % 10 < 8),
        |pop AS (SELECT i, COUNT(*) AS pop FROM train GROUP BY 1),
        |users AS (SELECT DISTINCT u FROM train),
        |scores AS (
        |  SELECT users.u AS u, pop.i AS item,
        |    CAST(pop AS DOUBLE) AS score
        |  FROM users CROSS JOIN pop
        |), unseen AS (
        |  SELECT s.u, s.item, s.score FROM scores s
        |  WHERE NOT EXISTS (SELECT 1 FROM train t2
        |                    WHERE t2.u = s.u AND t2.i = s.item)
        |)
        |SELECT u, item, rank FROM (
        |  SELECT u, item,
        |    ROW_NUMBER() OVER (PARTITION BY u
        |      ORDER BY score DESC, item) AS rank
        |  FROM unseen) r
        |WHERE rank <= 5""".stripMargin)),

    // §2.10 — ranked-evaluation metrics of TopPop@10 against the held-out
    // test split: precision/recall/MAP/MRR/NDCG/hit-rate
    // (reference: Base/Evaluation/Evaluator.py:223-344, metrics.py).
    Q("q44_eval_accuracy", { t =>
        val split = Urm.hashSplit(Urm.fromOrders(t), 8, 10)
        val train = split.filter(col("split") === "train").select("u", "i")
        val test = split.filter(col("split") === "test").select("u", "i")
        val pop = Recommenders.topPop(train)
          .select(col("i").as("item"), col("pop").cast("double").as("score"))
        val recs = Recommenders.recommendGlobal(pop, train, 10)
        Evaluation.accuracyMetrics(Evaluation.hitTable(recs, test), 10)
      },
      Some(urmCte + """,
        |train AS (SELECT u, i FROM urm WHERE (u*31 + i) % 10 < 8),
        |test AS (SELECT u, i FROM urm WHERE (u*31 + i) % 10 >= 8),
        |pop AS (SELECT i, COUNT(*) AS pop FROM train GROUP BY 1),
        |users AS (SELECT DISTINCT u FROM train),
        |scores AS (
        |  SELECT users.u AS u, pop.i AS item, CAST(pop AS DOUBLE) AS score
        |  FROM users CROSS JOIN pop
        |), recs AS (
        |  SELECT u, item, rank FROM (
        |    SELECT s.u, s.item,
        |      ROW_NUMBER() OVER (PARTITION BY s.u
        |        ORDER BY s.score DESC, s.item) AS rank
        |    FROM scores s
        |    WHERE NOT EXISTS (SELECT 1 FROM train t2
        |                      WHERE t2.u = s.u AND t2.i = s.item)) r
        |  WHERE rank <= 10
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
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_hits,
        |    SUM(hit) OVER (PARTITION BY u) AS tot_hits
        |  FROM hits
        |), per_user AS (
        |  SELECT u,
        |    CAST(SUM(hit) AS BIGINT) AS n_hits,
        |    ANY_VALUE(n_rel) AS n_rel,
        |    SUM(CASE WHEN hit = 1
        |        THEN CAST(cum_hits AS DOUBLE) / rank ELSE 0.0 END) AS ap_num,
        |    MIN(CASE WHEN hit = 1 THEN rank END) AS first_hit,
        |    SUM(CASE WHEN hit = 1
        |        THEN 1.0 / log2(rank + 1) ELSE 0.0 END) AS dcg,
        |    SUM(CASE WHEN hit = 1 THEN 1.0 / rank ELSE 0.0 END) AS arhr_num,
        |    CAST(SUM(CASE WHEN hit = 1
        |        THEN (10 - rank) - (tot_hits - cum_hits)
        |        ELSE 0 END) AS BIGINT) AS auc_num
        |  FROM cum GROUP BY u
        |), idcg_tab AS (
        |  SELECT m, SUM(1.0 / log2(x + 1)) AS idcg
        |  FROM generate_series(1, 10) ms(m), generate_series(1, 10) g(x)
        |  WHERE x <= m GROUP BY m
        |), scored AS (
        |  SELECT u,
        |    CAST(n_hits AS DOUBLE) / 10 AS prec,
        |    CAST(n_hits AS DOUBLE) / n_rel AS rec,
        |    CAST(n_hits AS DOUBLE) / LEAST(n_rel, 10) AS prec_min_den,
        |    ap_num / LEAST(n_rel, 10) AS ap,
        |    COALESCE(1.0 / first_hit, 0.0) AS rr,
        |    arhr_num,
        |    dcg / idcg AS ndcg,
        |    CASE WHEN n_hits = 0 OR n_hits = 10 THEN 0.0
        |         ELSE CAST(auc_num AS DOUBLE) / (n_hits * (10 - n_hits))
        |    END AS auc,
        |    CASE WHEN n_hits > 0 THEN 1 ELSE 0 END AS is_hit
        |  FROM per_user JOIN idcg_tab ON idcg_tab.m = LEAST(n_rel, 10)
        |)
        |SELECT
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
        |FROM scored""".stripMargin)),

    // §2.10 beyond-accuracy — coverage, novelty, entropy, Herfindahl of
    // the recommendation distribution (reference: metrics.py:310-636).
    Q("q45_eval_beyond_accuracy", { t =>
        val urm = Urm.fromOrders(t)
        val split = Urm.hashSplit(urm, 8, 10)
        val train = split.filter(col("split") === "train").select("u", "i")
        val pop = Recommenders.topPop(train)
        val popScores = pop
          .select(col("i").as("item"), col("pop").cast("double").as("score"))
        // five metric aggregation branches share the rec-list subtree —
        // persist it once instead of recomputing recommendGlobal 5×
        val recs = graft.core.CacheScope.persist(
          Recommenders.recommendGlobal(popScores, train, 10))
        val nItems = urm.select("i").distinct().count()
        val nUsers = urm.select("u").distinct().count()
        val nnz = train.count()
        Evaluation.itemCoverage(recs, nItems)
          .crossJoin(Evaluation.userCoverage(recs, nUsers))
          .crossJoin(Evaluation.novelty(recs, pop, nnz))
          .crossJoin(Evaluation.shannonEntropy(recs))
          .crossJoin(Evaluation.herfindahl(recs))
      },
      Some(urmCte + """,
        |train AS (SELECT u, i FROM urm WHERE (u*31 + i) % 10 < 8),
        |pop AS (SELECT i, COUNT(*) AS pop FROM train GROUP BY 1),
        |users AS (SELECT DISTINCT u FROM train),
        |scores AS (
        |  SELECT users.u AS u, pop.i AS item, CAST(pop AS DOUBLE) AS score
        |  FROM users CROSS JOIN pop
        |), recs AS (
        |  SELECT u, item, rank FROM (
        |    SELECT s.u, s.item,
        |      ROW_NUMBER() OVER (PARTITION BY s.u
        |        ORDER BY s.score DESC, s.item) AS rank
        |    FROM scores s
        |    WHERE NOT EXISTS (SELECT 1 FROM train t2
        |                      WHERE t2.u = s.u AND t2.i = s.item)) r
        |  WHERE rank <= 10
        |), reccnt AS (
        |  SELECT item, COUNT(*) AS cnt FROM recs GROUP BY 1
        |)
        |SELECT
        |  (SELECT round(CAST(COUNT(DISTINCT item) AS DOUBLE)
        |                / (SELECT COUNT(DISTINCT i) FROM urm), 6)
        |   FROM recs) AS coverage_item,
        |  (SELECT round(CAST(COUNT(DISTINCT u) AS DOUBLE)
        |                / (SELECT COUNT(DISTINCT u) FROM urm), 6)
        |   FROM recs) AS coverage_user,
        |  (SELECT round(SUM(-log2(CAST(pop AS DOUBLE)
        |                          / (SELECT COUNT(*) FROM train)))
        |                / COUNT(*), 6)
        |   FROM recs JOIN pop ON recs.item = pop.i) AS novelty,
        |  (SELECT round(-SUM((CAST(cnt AS DOUBLE)
        |                      / (SELECT SUM(cnt) FROM reccnt))
        |                     * log2(CAST(cnt AS DOUBLE)
        |                            / (SELECT SUM(cnt) FROM reccnt))), 6)
        |   FROM reccnt) AS shannon_entropy,
        |  (SELECT round(1.0 - SUM(pow(CAST(cnt AS DOUBLE)
        |                              / (SELECT SUM(cnt) FROM reccnt), 2)), 6)
        |   FROM reccnt) AS herfindahl""".stripMargin)),

    // §2.10 — relevance-weighted NDCG of TopPop@10 against explicit
    // test ratings (reference: metrics.py:182-211): DCG weights each
    // hit by (2^rating − 1)/log2(rank+1); IDCG from ALL of the user's
    // test ratings sorted descending (untruncated, matching the
    // reference's dcg(np.sort(relevance)[::-1])). Ratings are
    // built with the engine-deterministic form (exact decimal sum →
    // double → IEEE division) so both engines feed identical rel
    // values into pow().
    Q("q92_ndcg_rated", { t =>
        // the ratings aggregate feeds both split branches (train via
        // TopPop + seen, test via DCG + IDCG) — persist once
        val ratings = graft.core.CacheScope.persist(t.lineitem
          .join(t.orders, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey").as("u"), col("l_partkey").as("i"))
          .agg((sum(col("l_quantity").cast("decimal(18,2)")).cast("double") /
                count(lit(1))).as("r")))
        val split = Urm.hashSplit(ratings, 8, 10)
        val train = split.filter(col("split") === "train").select("u", "i")
        val test = graft.core.CacheScope.persist(
          split.filter(col("split") === "test").select("u", "i", "r"))
        val pop = Recommenders.topPop(train)
          .select(col("i").as("item"), col("pop").cast("double").as("score"))
        val recs = Recommenders.recommendGlobal(pop, train, 10)
        Evaluation.ndcgRated(Evaluation.hitTableRated(recs, test), test, 10)
      },
      Some("""WITH ratings AS (
        |  SELECT o_custkey AS u, l_partkey AS i,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |      / COUNT(*) AS r
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2
        |),
        |train AS (SELECT u, i FROM ratings WHERE (u*31 + i) % 10 < 8),
        |test AS (SELECT u, i, r FROM ratings WHERE (u*31 + i) % 10 >= 8),
        |pop AS (SELECT i, COUNT(*) AS pop FROM train GROUP BY 1),
        |users AS (SELECT DISTINCT u FROM train),
        |scores AS (
        |  SELECT users.u AS u, pop.i AS item, CAST(pop AS DOUBLE) AS score
        |  FROM users CROSS JOIN pop
        |), recs AS (
        |  SELECT u, item, rank FROM (
        |    SELECT s.u, s.item,
        |      ROW_NUMBER() OVER (PARTITION BY s.u
        |        ORDER BY s.score DESC, s.item) AS rank
        |    FROM scores s
        |    WHERE NOT EXISTS (SELECT 1 FROM train t2
        |                      WHERE t2.u = s.u AND t2.i = s.item)) r
        |  WHERE rank <= 10
        |), relc AS (SELECT u, COUNT(*) AS n_rel FROM test GROUP BY 1),
        |dcg AS (
        |  SELECT recs.u,
        |    SUM(CASE WHEN test.i IS NOT NULL
        |        THEN (pow(2.0, test.r) - 1) / log2(recs.rank + 1)
        |        ELSE 0.0 END) AS dcg
        |  FROM recs
        |  JOIN relc ON recs.u = relc.u
        |  LEFT JOIN test ON recs.u = test.u AND recs.item = test.i
        |  GROUP BY 1
        |), ranked_test AS (
        |  SELECT u, r,
        |    ROW_NUMBER() OVER (PARTITION BY u ORDER BY r DESC, i) AS rr
        |  FROM test
        |), idcg AS (
        |  SELECT u, SUM((pow(2.0, r) - 1) / log2(rr + 1)) AS idcg
        |  FROM ranked_test GROUP BY u
        |)
        |SELECT
        |  round(SUM(CASE WHEN idcg.idcg > 0 THEN dcg.dcg / idcg.idcg
        |            ELSE 0.0 END) / COUNT(*), 6) AS ndcg_rated,
        |  COUNT(*) AS n_users
        |FROM dcg JOIN idcg ON dcg.u = idcg.u""".stripMargin)),

    // §2.10 — RMSE of the per-item-mean rating predictor against the
    // held-out explicit ratings (reference: metrics.py:219-266 — the
    // reference defines RMSE but keeps it disabled in the evaluator
    // loop; registered here as the opt-in completeness metric).
    // Ratings/means use the engine-deterministic decimal-sum → double
    // → IEEE-division form; the final mean-of-squares follows the
    // q45-novelty precedent (plain double sums, round 6, inside the
    // gate's float tolerance).
    Q("q95_rmse", { t =>
        // ratings feed both split branches — persist once
        val ratings = graft.core.CacheScope.persist(t.lineitem
          .join(t.orders, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey").as("u"), col("l_partkey").as("i"))
          .agg((sum(col("l_quantity").cast("decimal(18,2)")).cast("double") /
                count(lit(1))).as("r")))
        val split = Urm.hashSplit(ratings, 8, 10)
        val train = split.filter(col("split") === "train")
        val test = split.filter(col("split") === "test").select("u", "i", "r")
        val itemMean = train.groupBy("i")
          .agg((sum(col("r").cast("decimal(28,6)")).cast("double") /
                count(lit(1))).as("score"))
        val preds = test.join(itemMean, "i")
          .select(col("u"), col("i").as("item"), col("score"))
        Evaluation.rmse(preds, test)
      },
      Some("""WITH ratings AS (
        |  SELECT o_custkey AS u, l_partkey AS i,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |      / COUNT(*) AS r
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2
        |),
        |train AS (SELECT u, i, r FROM ratings WHERE (u*31 + i) % 10 < 8),
        |test AS (SELECT u, i, r FROM ratings WHERE (u*31 + i) % 10 >= 8),
        |item_mean AS (
        |  SELECT i,
        |    CAST(SUM(CAST(r AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)
        |      AS score
        |  FROM train GROUP BY 1
        |)
        |SELECT round(sqrt(AVG(pow(m.score - t.r, 2))), 6) AS rmse
        |FROM test t JOIN item_mean m ON t.i = m.i""".stripMargin)),

    // Degree-capped similarity engine on a PLANTED heavy-hitter URM
    // (the q186 convention for the LSH bucket cap, applied to the pair
    // engine's user axis): a synthetic user with a 200-item profile —
    // 2.5x the 80-interaction cap, 39,800 mirrored pair rows uncapped —
    // joins the star-schema URM; the capped engine must keep exactly
    // the 80 md5-first interactions of EVERY over-cap profile (base
    // users too) and compute cosine + top-10 of the capped frame
    // bit-identically to the oracle's ROW_NUMBER tower. Light profiles
    // pass through untouched, so the planted user's surviving items
    // and every under-cap user's full ranking are both pinned.
    Q("q207_degree_capped_cosine", { t =>
        val s = t.lineitem.sparkSession
        val base = Urm.fromOrders(t)
          .select(col("u").cast("long").as("u"),
                  col("i").cast("long").as("i"))
        val heavy = s.range(1, 201)
          .select(lit(99999999L).as("u"), col("id").as("i"))
        Similarity.topK(
            Similarity.itemSimilarity(base.unionByName(heavy),
              Similarity.Cosine, maxUserDegree = 80), 10)
          .select(col("i"), col("j"), round(col("w"), 6).as("w"),
                  col("rank"))
      },
      Some("""WITH urm AS (
        |  SELECT DISTINCT o_custkey AS u, l_partkey AS i
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  UNION ALL
        |  SELECT 99999999 AS u, r AS i FROM generate_series(1, 200) g(r)
        |), capped AS (
        |  SELECT u, i FROM (
        |    SELECT u, i, ROW_NUMBER() OVER (PARTITION BY u
        |      ORDER BY md5(CAST(u AS VARCHAR) || ',' ||
        |                   CAST(i AS VARCHAR)), i) AS rk
        |    FROM urm) z
        |  WHERE rk <= 80
        |), dots AS (
        |  SELECT a.i AS i, b.i AS j, COUNT(*) AS dot
        |  FROM capped a JOIN capped b ON a.u = b.u AND a.i <> b.i
        |  GROUP BY 1, 2
        |), norms AS (SELECT i, COUNT(*) AS n FROM capped GROUP BY 1),
        |sim AS (
        |  SELECT d.i, d.j,
        |    CAST(d.dot AS DOUBLE) / (sqrt(ni.n) * sqrt(nj.n)) AS w
        |  FROM dots d
        |  JOIN norms ni ON d.i = ni.i
        |  JOIN norms nj ON d.j = nj.i
        |)
        |SELECT i, j, round(w, 6) AS w, rank FROM (
        |  SELECT i, j, w,
        |    ROW_NUMBER() OVER (PARTITION BY j ORDER BY w DESC, i) AS rank
        |  FROM sim) s
        |WHERE rank <= 10""".stripMargin)),

    // The degree cap's MEASURED recall trade (the q187 convention for
    // the bucket cap): top-10 cosine edges of the capped engine vs the
    // uncapped engine on the same planted heavy-hitter URM — one row
    // (n_uncapped_topk, n_capped_topk, n_common, topk_recall), recall
    // an exact integer ratio in double. The trade the 80-cap (≈ p99 of
    // the fixture's degree distribution) buys is a cross-engine-gated
    // number, not prose; q214 sweeps the cap for the full curve.
    Q("q208_degree_cap_recall_trade", { t =>
        val s = t.lineitem.sparkSession
        val base = Urm.fromOrders(t)
          .select(col("u").cast("long").as("u"),
                  col("i").cast("long").as("i"))
        val heavy = s.range(1, 201)
          .select(lit(99999999L).as("u"), col("id").as("i"))
        val urm = graft.core.CacheScope.persist(base.unionByName(heavy))
        val un = graft.core.CacheScope.persist(Similarity.topK(
            Similarity.itemSimilarity(urm, Similarity.Cosine), 10)
          .select(col("i"), col("j"), lit(1L).as("fu")))
        val cp = graft.core.CacheScope.persist(Similarity.topK(
            Similarity.itemSimilarity(urm, Similarity.Cosine,
                                      maxUserDegree = 80), 10)
          .select(col("i"), col("j"), lit(1L).as("fc")))
        // the two engines are independent chains over the shared URM:
        // force the URM cache once, then materialize both edge sets
        // CONCURRENTLY (guide §2.6 via core.Par) — persist+force
        // changes when each exact aggregation runs, never its value
        urm.count()
        graft.core.Par.run(t.spark.sparkContext, "graft-q208-sides",
                           30, Seq(un, cp))(_.count())
        un.join(cp, Seq("i", "j"), "full_outer")
          .agg(sum(coalesce(col("fu"), lit(0L))).as("n_uncapped_topk"),
               sum(coalesce(col("fc"), lit(0L))).as("n_capped_topk"),
               sum(coalesce(col("fu"), lit(0L)) *
                   coalesce(col("fc"), lit(0L))).as("n_common"),
               (sum(coalesce(col("fu"), lit(0L)) *
                    coalesce(col("fc"), lit(0L))).cast("double") /
                sum(coalesce(col("fu"), lit(0L))))
                 .as("topk_recall"))
      },
      Some("""WITH urm AS (
        |  SELECT DISTINCT o_custkey AS u, l_partkey AS i
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  UNION ALL
        |  SELECT 99999999 AS u, r AS i FROM generate_series(1, 200) g(r)
        |), capped AS (
        |  SELECT u, i FROM (
        |    SELECT u, i, ROW_NUMBER() OVER (PARTITION BY u
        |      ORDER BY md5(CAST(u AS VARCHAR) || ',' ||
        |                   CAST(i AS VARCHAR)), i) AS rk
        |    FROM urm) z
        |  WHERE rk <= 80
        |), un AS (
        |  SELECT i, j FROM (
        |    SELECT s.i, s.j,
        |      ROW_NUMBER() OVER (PARTITION BY s.j
        |        ORDER BY s.w DESC, s.i) AS rank
        |    FROM (
        |      SELECT d.i, d.j,
        |        CAST(d.dot AS DOUBLE) / (sqrt(ni.n) * sqrt(nj.n)) AS w
        |      FROM (
        |        SELECT a.i AS i, b.i AS j, COUNT(*) AS dot
        |        FROM urm a JOIN urm b ON a.u = b.u AND a.i <> b.i
        |        GROUP BY 1, 2) d
        |      JOIN (SELECT i, COUNT(*) AS n FROM urm GROUP BY 1) ni
        |        ON d.i = ni.i
        |      JOIN (SELECT i, COUNT(*) AS n FROM urm GROUP BY 1) nj
        |        ON d.j = nj.i) s) r
        |  WHERE rank <= 10
        |), cp AS (
        |  SELECT i, j FROM (
        |    SELECT s.i, s.j,
        |      ROW_NUMBER() OVER (PARTITION BY s.j
        |        ORDER BY s.w DESC, s.i) AS rank
        |    FROM (
        |      SELECT d.i, d.j,
        |        CAST(d.dot AS DOUBLE) / (sqrt(ni.n) * sqrt(nj.n)) AS w
        |      FROM (
        |        SELECT a.i AS i, b.i AS j, COUNT(*) AS dot
        |        FROM capped a JOIN capped b ON a.u = b.u AND a.i <> b.i
        |        GROUP BY 1, 2) d
        |      JOIN (SELECT i, COUNT(*) AS n FROM capped GROUP BY 1) ni
        |        ON d.i = ni.i
        |      JOIN (SELECT i, COUNT(*) AS n FROM capped GROUP BY 1) nj
        |        ON d.j = nj.i) s) r
        |  WHERE rank <= 10
        |)
        |SELECT
        |  (SELECT COUNT(*) FROM un) AS n_uncapped_topk,
        |  (SELECT COUNT(*) FROM cp) AS n_capped_topk,
        |  (SELECT COUNT(*) FROM un JOIN cp USING (i, j)) AS n_common,
        |  CAST((SELECT COUNT(*) FROM un JOIN cp USING (i, j)) AS DOUBLE)
        |    / (SELECT COUNT(*) FROM un) AS topk_recall""".stripMargin)),

    // Degree-capped WEIGHTED similarity engine (VERDICT r13 next #1 —
    // the one perf-weak item left after r13 capped the binary twin):
    // the q207 planted-heavy-hitter convention applied to the
    // TF-IDF-weighted engine the tuning spaces' feature_weighting
    // dimension ships. TF-IDF is computed over the FULL frame (df/idf
    // keep corpus semantics), THEN the cap keeps each over-cap
    // profile's 80 md5-first interactions — weights ride along
    // untouched — and dots AND norms see the capped weighted frame.
    // Weights quantize to DECIMAL(18,9) and accumulate exactly (the
    // q141 discipline), so capped weighted cosine + top-5 is
    // bit-checkable against the oracle's ROW_NUMBER tower. Item range
    // bounded (q141's bound) to keep the pair fan-out moderate.
    Q("q211_degree_capped_weighted_cosine", { t =>
        val s = t.lineitem.sparkSession
        val base = Urm.fromOrders(t).filter(col("i") < 2000)
          .select(col("u").cast("long").as("u"),
                  col("i").cast("long").as("i"))
        val heavy = s.range(1, 201)
          .select(lit(99999999L).as("u"), col("id").as("i"))
        val urm = base.unionByName(heavy)
        val sim = Similarity.itemSimilarityWeighted(
            Weighting.tfidf(urm.withColumn("v", lit(1))),
            Similarity.Cosine, maxUserDegree = 80)
          // rank on the ROUNDED weight (q141: the final double divide
          // differs by 1 ulp between engines and would flip near-ties)
          .withColumn("w", round(col("w"), 6))
        Similarity.topK(sim, 5)
          .select(col("i"), col("j"), col("w"), col("rank"))
      },
      Some("""WITH urm AS (
        |  SELECT DISTINCT o_custkey AS u, l_partkey AS i
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_partkey < 2000
        |  UNION ALL
        |  SELECT 99999999 AS u, r AS i FROM generate_series(1, 200) g(r)
        |), df AS (SELECT i, COUNT(*) AS df FROM urm GROUP BY 1),
        |nu AS (SELECT COUNT(DISTINCT u) AS n_users FROM urm),
        |wts AS (
        |  SELECT u, urm.i AS i,
        |    CAST(round(sqrt(1.0) * ln(CAST(n_users AS DOUBLE) / (df + 1)), 9)
        |         AS DECIMAL(18,9)) AS w
        |  FROM urm JOIN df ON urm.i = df.i CROSS JOIN nu
        |), capped AS (
        |  SELECT u, i, w FROM (
        |    SELECT u, i, w, ROW_NUMBER() OVER (PARTITION BY u
        |      ORDER BY md5(CAST(u AS VARCHAR) || ',' ||
        |                   CAST(i AS VARCHAR)), i) AS rk
        |    FROM wts) z
        |  WHERE rk <= 80
        |), dots AS (
        |  SELECT a.i AS i, b.i AS j, SUM(a.w * b.w) AS dot
        |  FROM capped a JOIN capped b ON a.u = b.u AND a.i <> b.i
        |  GROUP BY 1, 2
        |), norms AS (SELECT i, SUM(w * w) AS n FROM capped GROUP BY 1),
        |sim AS (
        |  SELECT d.i, d.j,
        |    CAST(d.dot AS DOUBLE)
        |      / (sqrt(CAST(ni.n AS DOUBLE)) * sqrt(CAST(nj.n AS DOUBLE))
        |         + 1e-6)
        |      AS w
        |  FROM dots d
        |  JOIN norms ni ON d.i = ni.i
        |  JOIN norms nj ON d.j = nj.i
        |)
        |SELECT i, j, w, rank FROM (
        |  SELECT i, j, round(w, 6) AS w,
        |    ROW_NUMBER() OVER (PARTITION BY j
        |      ORDER BY round(w, 6) DESC, i) AS rank
        |  FROM sim) s
        |WHERE rank <= 5""".stripMargin)),

    // The WEIGHTED cap's measured recall trade (q208 convention):
    // top-10 TF-IDF-weighted cosine edges, capped engine vs uncapped
    // engine on the same planted heavy-hitter frame — one gated row.
    // Both sides rank on the 6-decimal-rounded weight so the edge
    // sets are cross-engine exact.
    Q("q212_weighted_cap_recall_trade", { t =>
        val s = t.lineitem.sparkSession
        val base = Urm.fromOrders(t).filter(col("i") < 2000)
          .select(col("u").cast("long").as("u"),
                  col("i").cast("long").as("i"))
        val heavy = s.range(1, 201)
          .select(lit(99999999L).as("u"), col("id").as("i"))
        // ONE weighted pair aggregation + ONE ranking window for both
        // engine sides (r15, guide §2.4 via pairDotsMultiCap weighted):
        // quantize once (cap and quantization commute — the cap's md5
        // pick reads only (u, i), quantization is per-row), rank the
        // degree window once, and the capped side's dots/norms are
        // conditional EXACT-decimal sums over the same pair stream —
        // bit-identical to the independent capped engine
        // (SimilaritySpec pins it). Both sides stack into one
        // (cap, i, j, w) frame via a narrow explode, one window over
        // (cap, j) ranks them (row_number within a (cap, j) group is
        // the per-cap window's row_number verbatim), and one flag
        // aggregation replaces the full-outer join. The r14 form ran
        // the TF-IDF subtree + pair self-join + window once PER side.
        // Measured (3-rep medians): 6.9 -> 6.1 s at steal <= 0.1.
        // NOTE: this sharing pays off here because q212's item bound
        // (i < 2000) keeps the pair frame small; on the UNBOUNDED
        // fixtures (q208/q214) the same restructure measured flat to
        // negative (see OPTIMIZATION_r15.md) and was not applied.
        val q = Similarity.quantizeWeights(
          Weighting.tfidf(base.unionByName(heavy).withColumn("v", lit(1))))
        val ranked = graft.core.CacheScope.persist(
          Similarity.userDegreeRanked(q))
        val pd = Similarity.pairDotsMultiCap(ranked, Seq(80),
                                             weighted = true)
        val normsM = Similarity.itemNormsMultiCap(ranked, Seq(80),
                                                  weighted = true)
        val ni = normsM.select(col("i"), col("n").as("ni_n"),
                               col("n_80").as("ni_n_80"))
        val nj = normsM.select(col("i").as("j"), col("n").as("nj_n"),
                               col("n_80").as("nj_n_80"))
        val joined = pd.join(broadcast(ni), "i").join(broadcast(nj), "j")
        // weighted presence is dot IS NOT NULL (a present pair can sum
        // to exactly 0 under zero/negative TF-IDF weights); the rank
        // weight is the 6-decimal-rounded cosine, exactly the r14
        // form's round-then-topK
        def wLevel(cap: Int) = {
          val (d, n) = if (cap == 0) ("dot", "n")
                       else (s"dot_$cap", s"n_$cap")
          when(col(d).isNotNull,
               round(col(d).cast("double") /
                     (sqrt(col(s"ni_$n")) * sqrt(col(s"nj_$n")) +
                      lit(0.0) + lit(1e-6)), 6))
        }
        val stacked = joined.select(explode(array(Seq(0, 80).map(c =>
            struct(lit(c).as("cap"), col("i"), col("j"),
                   wLevel(c).as("w"))): _*)).as("_e"))
          .select(col("_e.cap").as("cap"), col("_e.i").as("i"),
                  col("_e.j").as("j"), col("_e.w").as("w"))
          .filter(col("w").isNotNull)
        val wnd = org.apache.spark.sql.expressions.Window
          .partitionBy("cap", "j").orderBy(desc("w"), asc("i"))
        val edges = stacked
          .withColumn("rank", row_number().over(wnd))
          .filter(col("rank") <= 10)
        edges.groupBy("i", "j")
          .agg(max(when(col("cap") === 0, 1L).otherwise(0L)).as("fu"),
               max(when(col("cap") === 80, 1L).otherwise(0L)).as("fc"))
          .agg(sum(col("fu")).as("n_uncapped_topk"),
               sum(col("fc")).as("n_capped_topk"),
               sum(col("fu") * col("fc")).as("n_common"),
               (sum(col("fu") * col("fc")).cast("double") /
                sum(col("fu"))).as("topk_recall"))
      },
      Some {
        val base = """WITH urm AS (
          |  SELECT DISTINCT o_custkey AS u, l_partkey AS i
          |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |  WHERE l_partkey < 2000
          |  UNION ALL
          |  SELECT 99999999 AS u, r AS i FROM generate_series(1, 200) g(r)
          |), df AS (SELECT i, COUNT(*) AS df FROM urm GROUP BY 1),
          |nu AS (SELECT COUNT(DISTINCT u) AS n_users FROM urm),
          |wts AS (
          |  SELECT u, urm.i AS i,
          |    CAST(round(sqrt(1.0) * ln(CAST(n_users AS DOUBLE) / (df + 1)), 9)
          |         AS DECIMAL(18,9)) AS w
          |  FROM urm JOIN df ON urm.i = df.i CROSS JOIN nu
          |)""".stripMargin
        // one weighted top-10 tower over the named source frame — the
        // oracle twin of edges(); SQL has no functions, so the tower
        // is stamped per side from this template
        def tower(src: String, out: String) = s"""$out AS (
          |  SELECT i, j FROM (
          |    SELECT s.i, s.j,
          |      ROW_NUMBER() OVER (PARTITION BY s.j
          |        ORDER BY round(s.w, 6) DESC, s.i) AS rank
          |    FROM (
          |      SELECT d.i, d.j,
          |        CAST(d.dot AS DOUBLE)
          |          / (sqrt(CAST(ni.n AS DOUBLE)) * sqrt(CAST(nj.n AS DOUBLE))
          |             + 1e-6) AS w
          |      FROM (
          |        SELECT a.i AS i, b.i AS j, SUM(a.w * b.w) AS dot
          |        FROM $src a JOIN $src b ON a.u = b.u AND a.i <> b.i
          |        GROUP BY 1, 2) d
          |      JOIN (SELECT i, SUM(w * w) AS n FROM $src GROUP BY 1) ni
          |        ON d.i = ni.i
          |      JOIN (SELECT i, SUM(w * w) AS n FROM $src GROUP BY 1) nj
          |        ON d.j = nj.i) s) r
          |  WHERE rank <= 10
          |)""".stripMargin
        val capped = """capped AS (
          |  SELECT u, i, w FROM (
          |    SELECT u, i, w, ROW_NUMBER() OVER (PARTITION BY u
          |      ORDER BY md5(CAST(u AS VARCHAR) || ',' ||
          |                   CAST(i AS VARCHAR)), i) AS rk
          |    FROM wts) z
          |  WHERE rk <= 80
          |)""".stripMargin
        base + ", " + capped + ", " + tower("wts", "un") + ", " +
          tower("capped", "cp") + """
          |SELECT
          |  (SELECT COUNT(*) FROM un) AS n_uncapped_topk,
          |  (SELECT COUNT(*) FROM cp) AS n_capped_topk,
          |  (SELECT COUNT(*) FROM un JOIN cp USING (i, j)) AS n_common,
          |  CAST((SELECT COUNT(*) FROM un JOIN cp USING (i, j)) AS DOUBLE)
          |    / (SELECT COUNT(*) FROM un) AS topk_recall""".stripMargin
      }),

    // Cap-SWEEP recall curve (VERDICT r13 next #6): q208's single
    // measured point widened to cap ∈ {25, 80, 160} ≈ {p50-ish, p99,
    // >max-base} of the fixture's degree distribution, one gated row
    // per cap — the cap-selection guidance in capUserDegree's
    // scaladoc as a measured curve. The uncapped top-10 edge set is
    // computed once (persisted) and diffed against each capped run.
    Q("q214_degree_cap_recall_curve", { t =>
        val s = t.lineitem.sparkSession
        val base = Urm.fromOrders(t)
          .select(col("u").cast("long").as("u"),
                  col("i").cast("long").as("i"))
        val heavy = s.range(1, 201)
          .select(lit(99999999L).as("u"), col("id").as("i"))
        val urm = graft.core.CacheScope.persist(base.unionByName(heavy))
        val un = graft.core.CacheScope.persist(
          Similarity.topK(
              Similarity.itemSimilarity(urm, Similarity.Cosine), 10)
            .select(col("i"), col("j"), lit(1L).as("fu")))
        // the md5-first degree rank is cap-independent: compute the
        // window ONCE and derive each cap level as a filter (guide
        // §2.4 — the three capUserDegree calls re-shuffled the same
        // frame on the same key); frames are bit-identical to
        // independent capUserDegree calls, so the oracle tower is
        // unchanged
        val ranked = graft.core.CacheScope.persist(
          Similarity.userDegreeRanked(urm))
        def capRow(cap: Int): org.apache.spark.sql.DataFrame = {
          val cp = Similarity.topK(
              Similarity.itemSimilarity(
                ranked.filter(col(Similarity.capRankCol) <= cap)
                  .drop(Similarity.capRankCol), Similarity.Cosine), 10)
            .select(col("i"), col("j"), lit(1L).as("fc"))
          un.join(cp, Seq("i", "j"), "full_outer")
            .agg(sum(coalesce(col("fu"), lit(0L))).as("n_uncapped_topk"),
                 sum(coalesce(col("fc"), lit(0L))).as("n_capped_topk"),
                 sum(coalesce(col("fu"), lit(0L)) *
                     coalesce(col("fc"), lit(0L))).as("n_common"),
                 (sum(coalesce(col("fu"), lit(0L)) *
                      coalesce(col("fc"), lit(0L))).cast("double") /
                  sum(coalesce(col("fu"), lit(0L))))
                   .as("topk_recall"))
            .select(lit(cap).as("cap"), col("n_uncapped_topk"),
                    col("n_capped_topk"), col("n_common"),
                    col("topk_recall"))
        }
        // force the SHARED caches once (uncapped edge set + rank
        // frame), then compute the three cap rows CONCURRENTLY from
        // driver threads (guide §2.6 via core.Par): each row is one
        // independent capped-engine chain over the already-cached
        // inputs — each an exact integer/decimal aggregation, so the
        // collected rows are bit-identical to the lazy union form.
        // Forcing first also keeps the concurrent branches from racing
        // to materialize the same cache (duplicate compute, not
        // wrong results).
        un.count(); ranked.count()
        val tmpl = capRow(25)
        val rows = graft.core.Par.run(t.spark.sparkContext,
            "graft-q214-caps", 30, Seq(25, 80, 160))(cap =>
          capRow(cap).head())
        t.spark.createDataFrame(
          java.util.Arrays.asList(rows: _*), tmpl.schema)
      },
      Some {
        val head = """WITH urm AS (
          |  SELECT DISTINCT o_custkey AS u, l_partkey AS i
          |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |  UNION ALL
          |  SELECT 99999999 AS u, r AS i FROM generate_series(1, 200) g(r)
          |)""".stripMargin
        def binTower(src: String, out: String) = s"""$out AS (
          |  SELECT i, j FROM (
          |    SELECT s.i, s.j,
          |      ROW_NUMBER() OVER (PARTITION BY s.j
          |        ORDER BY s.w DESC, s.i) AS rank
          |    FROM (
          |      SELECT d.i, d.j,
          |        CAST(d.dot AS DOUBLE) / (sqrt(ni.n) * sqrt(nj.n)) AS w
          |      FROM (
          |        SELECT a.i AS i, b.i AS j, COUNT(*) AS dot
          |        FROM $src a JOIN $src b ON a.u = b.u AND a.i <> b.i
          |        GROUP BY 1, 2) d
          |      JOIN (SELECT i, COUNT(*) AS n FROM $src GROUP BY 1) ni
          |        ON d.i = ni.i
          |      JOIN (SELECT i, COUNT(*) AS n FROM $src GROUP BY 1) nj
          |        ON d.j = nj.i) s) r
          |  WHERE rank <= 10
          |)""".stripMargin
        def cappedCte(cap: Int) = s"""capped$cap AS (
          |  SELECT u, i FROM (
          |    SELECT u, i, ROW_NUMBER() OVER (PARTITION BY u
          |      ORDER BY md5(CAST(u AS VARCHAR) || ',' ||
          |                   CAST(i AS VARCHAR)), i) AS rk
          |    FROM urm) z
          |  WHERE rk <= $cap
          |)""".stripMargin
        val caps = Seq(25, 80, 160)
        def capRow(cap: Int) = s"""SELECT $cap AS cap,
          |  (SELECT COUNT(*) FROM un) AS n_uncapped_topk,
          |  (SELECT COUNT(*) FROM cp$cap) AS n_capped_topk,
          |  (SELECT COUNT(*) FROM un JOIN cp$cap USING (i, j)) AS n_common,
          |  CAST((SELECT COUNT(*) FROM un JOIN cp$cap USING (i, j))
          |       AS DOUBLE)
          |    / (SELECT COUNT(*) FROM un) AS topk_recall""".stripMargin
        head + ", " +
          (caps.map(cappedCte) ++ Seq(binTower("urm", "un")) ++
           caps.map(c => binTower(s"capped$c", s"cp$c")))
            .mkString(", ") + "\n" +
          caps.map(capRow).mkString("\nUNION ALL\n")
      })
  )
}
