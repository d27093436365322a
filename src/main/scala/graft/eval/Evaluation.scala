package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Ranked-recommendation evaluation (SURVEY.md §2.10; reference:
  * Base/Evaluation/Evaluator.py + metrics.py).
  *
  * The reference's metric objects expose add / merge / get — exactly
  * Spark's partial-aggregation contract — so every metric here is a
  * grouped aggregation over a per-user (rank, hit) DataFrame: map-side
  * partials then one reduce, the same shape the reference hand-rolls
  * with dask delayed merges (Evaluator.py:607-679).
  *
  * Float policy: per-user terms are exact rationals or small
  * transcendental sums; global results are rounded to 6 decimals, which
  * absorbs both summation-order drift and last-ulp libm differences
  * when compared against an external oracle.
  */
object Evaluation {

  /** Join recommendations (u, item, rank) with relevance (u, item) →
    * per-user hit table carrying every rank, a hit flag, and the user's
    * relevant-item count. Users with fewer than `minRatingsPerUser`
    * relevant items are dropped — the reference's configurable pruning
    * threshold (Evaluator.py:184-211, min_ratings_per_user); the
    * default of 1 matches its default and drops only zero-relevant
    * users. */
  def hitTable(recs: DataFrame, relevant: DataFrame,
               minRatingsPerUser: Int = 1): DataFrame = {
    val rel = relevant.select(col("u"), col("i").as("item"))
      .withColumn("hit", lit(1))
    val relCounts = relevant.groupBy("u").agg(count(lit(1)).as("n_rel"))
      .filter(col("n_rel") >= minRatingsPerUser)
    recs.join(rel, Seq("u", "item"), "left")
      .withColumn("hit", coalesce(col("hit"), lit(0)))
      .join(relCounts, Seq("u"), "inner")
  }

  /** Relevance-weighted hit table: like [[hitTable]] but the relevant
    * set carries explicit ratings (u, i, r) and each recommended row
    * keeps its test rating as `rel` (0.0 on miss). Feeds [[ndcgRated]];
    * the binary [[hitTable]] path is unchanged. */
  def hitTableRated(recs: DataFrame, relevant: DataFrame,
                    minRatingsPerUser: Int = 1): DataFrame = {
    val rel = relevant.select(col("u"), col("i").as("item"),
                              col("r").cast("double").as("rel"))
      .withColumn("hit", lit(1))
    val relCounts = relevant.groupBy("u").agg(count(lit(1)).as("n_rel"))
      .filter(col("n_rel") >= minRatingsPerUser)
    recs.join(rel, Seq("u", "item"), "left")
      .withColumn("hit", coalesce(col("hit"), lit(0)))
      .withColumn("rel", coalesce(col("rel"), lit(0.0)))
      .join(relCounts, Seq("u"), "inner")
  }

  /** Relevance-weighted NDCG@cutoff (reference: metrics.py:182-211 —
    * dcg() over the user's URM_test ratings):
    *   DCG  = Σ_{hits} (2^rel − 1) / log2(rank + 1)
    *   IDCG = the same sum over ALL of the user's test ratings sorted
    *          descending — deliberately NOT truncated at the cutoff,
    *          matching the reference's `dcg(np.sort(relevance)[::-1])`
    *          which feeds the full test-relevance vector to dcg().
    * Coincides with the binary NDCG of [[accuracyMetrics]] on all-ones
    * URMs; diverges exactly where explicit feedback makes rank order
    * matter. IDCG comes from a per-user ranking window over the test
    * split — #test-rows work, no driver state, no arrays. */
  def ndcgRated(hits: DataFrame, relevant: DataFrame, cutoff: Int)
      : DataFrame = {
    val dcg = hits.filter(col("rank") <= cutoff)
      .groupBy("u")
      .agg(sum(when(col("hit") === 1,
                    (pow(lit(2.0), col("rel")) - lit(1.0)) /
                      log2(col("rank") + 1)).otherwise(0.0)).as("dcg"))
    val wRel = Window.partitionBy("u").orderBy(col("r").desc, col("i"))
    val idcg = relevant
      .withColumn("rr", row_number().over(wRel))
      .groupBy("u")
      .agg(sum((pow(lit(2.0), col("r").cast("double")) - lit(1.0)) /
               log2(col("rr") + 1)).as("idcg"))
    dcg.join(idcg, Seq("u"), "inner")
      .withColumn("ndcg", when(col("idcg") > 0, col("dcg") / col("idcg"))
                            .otherwise(0.0))
      .agg(round(sum("ndcg") / count(lit(1)), 6).as("ndcg_rated"),
           count(lit(1)).as("n_users"))
  }

  /** Accuracy metrics at one cutoff, averaged over evaluated users:
    * precision, recall, MAP, MRR, NDCG (binary relevance), hit rate
    * (reference: metrics.py:39-211, Evaluator.py:241-259). */
  def accuracyMetrics(hits: DataFrame, cutoff: Int): DataFrame = {
    val atK = hits.filter(col("rank") <= cutoff)
    val wu = Window.partitionBy("u").orderBy("rank")
    val perUser = atK
      .withColumn("cum_hits", sum("hit").over(
        wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot_hits", sum("hit").over(Window.partitionBy("u")))
      .groupBy("u")
      .agg(
        sum("hit").as("n_hits"),
        first("n_rel").as("n_rel"),
        // Σ_{hit at rank r} precision@r — numerator of average precision
        sum(when(col("hit") === 1,
                 col("cum_hits").cast("double") / col("rank"))
              .otherwise(0.0)).as("ap_num"),
        min(when(col("hit") === 1, col("rank"))).as("first_hit"),
        // binary-relevance DCG: Σ hit / log2(rank + 1)
        sum(when(col("hit") === 1, lit(1.0) / log2(col("rank") + 1))
              .otherwise(0.0)).as("dcg"),
        // ARHR numerator: Σ hit / rank (reference: metrics.py:124-135)
        sum(when(col("hit") === 1, lit(1.0) / col("rank"))
              .otherwise(0.0)).as("arhr_num"),
        // ROC-AUC numerator: for each hit at rank r, count of non-hits
        // ranked after it = (cutoff − r) − (hits after r)
        sum(when(col("hit") === 1,
                 (lit(cutoff) - col("rank")) -
                 (col("tot_hits") - col("cum_hits"))).otherwise(0))
          .as("auc_num"))
      .withColumn("idcg", expr(
        s"""aggregate(sequence(1, int(least(n_rel, $cutoff))),
           |cast(0.0 as double), (acc, r) -> acc + 1.0/log2(r + 1))"""
          .stripMargin))
      .withColumn("prec", col("n_hits").cast("double") / cutoff)
      .withColumn("rec", col("n_hits").cast("double") / col("n_rel"))
      .withColumn("prec_rec_min_den",
        col("n_hits").cast("double") / least(col("n_rel"), lit(cutoff)))
      .withColumn("ap", col("ap_num") / least(col("n_rel"), lit(cutoff)))
      .withColumn("rr", coalesce(lit(1.0) / col("first_hit"), lit(0.0)))
      .withColumn("ndcg", col("dcg") / col("idcg"))
      // ROC-AUC: fraction of (hit, non-hit) rank pairs ordered correctly
      // within the cutoff (reference: metrics.py:104-120); 0 when the
      // list is all hits or all misses.
      .withColumn("auc",
        when(col("n_hits") === 0 || col("n_hits") === cutoff, 0.0)
          .otherwise(col("auc_num").cast("double") /
                     (col("n_hits") * (lit(cutoff) - col("n_hits")))))
      .withColumn("is_hit", (col("n_hits") > 0).cast("int"))
    perUser.agg(
      round(sum("prec") / count(lit(1)), 6).as("precision"),
      round(sum("rec") / count(lit(1)), 6).as("recall"),
      round(sum("prec_rec_min_den") / count(lit(1)), 6)
        .as("precision_recall_min_den"),
      round(sum("ap") / count(lit(1)), 6).as("map"),
      round(sum("rr") / count(lit(1)), 6).as("mrr"),
      round(sum("arhr_num") / count(lit(1)), 6).as("arhr"),
      round(sum("ndcg") / count(lit(1)), 6).as("ndcg"),
      round(sum("auc") / count(lit(1)), 6).as("roc_auc"),
      round(sum("is_hit").cast("double") / count(lit(1)), 6).as("hit_rate"),
      // F1 of the aggregate precision/recall (reference:
      // Evaluator.py:253-259)
      round(when(sum("prec") + sum("rec") > 0,
                 lit(2.0) * (sum("prec") / count(lit(1))) *
                   (sum("rec") / count(lit(1))) /
                   (sum("prec") / count(lit(1)) +
                    sum("rec") / count(lit(1))))
              .otherwise(0.0), 6).as("f1"),
      count(lit(1)).as("n_users"))
  }

  /** Cutoff-list evaluation (reference: run_hyperparameter_tuning.py:
    * 42-58 — validation [10], test [5,10,20]): one hit table ranked to
    * max cutoff, metrics per cutoff stacked with a cutoff column. */
  def accuracyMetricsAtCutoffs(hits0: DataFrame, cutoffs: Seq[Int])
      : DataFrame = {
    // every cutoff is an independent aggregation branch over the same
    // hit table — persist it once instead of recomputing the ranking /
    // join subtree per cutoff
    val hits = graft.core.CacheScope.persist(hits0)
    cutoffs.map(c => accuracyMetrics(hits, c)
        .select(lit(c).as("cutoff"), col("*")))
      .reduce(_ unionByName _)
  }

  /** Catalog coverage: share of items ever recommended
    * (reference: metrics.py:310-323). */
  def itemCoverage(recs: DataFrame, nItems: Long): DataFrame =
    recs.agg(round(countDistinct(col("item")).cast("double") / nItems, 6)
               .as("coverage_item"))

  /** COVERAGE_USER: share of users who received at least one
    * recommendation (reference: metrics.py:348-370 Coverage_User). */
  def userCoverage(recs: DataFrame, nUsers: Long): DataFrame =
    recs.agg(round(countDistinct(col("u")).cast("double") / nUsers, 6)
               .as("coverage_user"))

  /** Novelty: mean self-information −log2(pop/nnz) of recommended items
    * w.r.t. training popularity (reference: metrics.py:538-586). */
  def novelty(recs: DataFrame, itemPop: DataFrame, nnz: Long): DataFrame =
    recs.join(itemPop, recs("item") === itemPop("i"))
      .agg(round(sum(-log2(col("pop").cast("double") / nnz)) /
                   count(lit(1)), 6).as("novelty"))

  /** Shannon entropy of the recommendation distribution over items
    * (reference: metrics.py:485-530): −Σ p·log2(p). */
  def shannonEntropy(recs: DataFrame): DataFrame = {
    // total mass as a pre-aggregated broadcast scalar, not an all-rows
    // empty-frame window (which serializes the item axis through one
    // reducer — fine for a catalog, not for corpus-sized axes)
    val counts = graft.core.CacheScope.persist(
      recs.groupBy("item").agg(count(lit(1)).as("cnt")))
    counts.crossJoin(broadcast(counts.agg(sum("cnt").as("tot"))))
      .agg(round(-sum((col("cnt").cast("double") / col("tot")) *
                      log2(col("cnt").cast("double") / col("tot"))), 6)
             .as("shannon_entropy"))
  }

  /** Normalized average popularity of recommended items
    * (reference: metrics.py:592-636): mean(pop_rec) / max(pop). */
  def averagePopularity(recs: DataFrame, itemPop: DataFrame): DataFrame = {
    val maxPop = itemPop.agg(max("pop")).head().getLong(0)
    recs.join(itemPop, recs("item") === itemPop("i"))
      .agg(round((sum("pop") / count(lit(1))) / maxPop, 6)
             .as("avg_popularity"))
  }

  /** Mean inter-list diversity from recommendation counts (closed form,
    * reference: metrics.py:702-810): 1 − E[|Lᵢ∩Lⱼ|]/cutoff over user
    * pairs, with E[|Lᵢ∩Lⱼ|] = Σ_item c(c−1) / (n·(n−1)). */
  def meanInterListDiversity(recs: DataFrame, cutoff: Int): DataFrame = {
    val nUsers = recs.select("u").distinct().count()
    recs.groupBy("item").agg(count(lit(1)).as("c"))
      .agg(round(lit(1.0) -
                 (sum(col("c") * (col("c") - 1)).cast("double") /
                  (nUsers.toDouble * (nUsers - 1) * cutoff)), 6)
             .as("mean_inter_list_diversity"))
  }

  /** Intra-list diversity against an item-similarity matrix
    * (reference: metrics.py:642-696): mean over users of the average
    * pairwise (1 − sim) inside the recommended list. */
  def intraListDiversity(recs0: DataFrame, sim: DataFrame): DataFrame = {
    // the rec-list subtree feeds both self-join sides — persist once
    val recs = graft.core.CacheScope.persist(recs0)
    val a = recs.select(col("u"), col("item").as("ia"))
    val b = recs.select(col("u"), col("item").as("ib"))
    val pairs = a.join(b, "u").filter(col("ia") < col("ib"))
    val withSim = pairs.join(
        sim.select(col("i").as("ia"), col("j").as("ib"),
                   col("w").as("sim_w")),
        Seq("ia", "ib"), "left")
      .withColumn("sim_w", coalesce(col("sim_w"), lit(0.0)))
    withSim.groupBy("u")
      .agg((sum(lit(1.0) - col("sim_w")) / count(lit(1))).as("ild"))
      .agg(round(sum("ild") / count(lit(1)), 6).as("intra_list_diversity"))
  }

  /** DIVERSITY_GINI (reference: metrics.py:401-442 Gini_Diversity): the
    * Gini index of the per-item recommendation-count distribution with
    * INVERTED range, so high values mean higher diversity:
    *   2·Σᵢ ((n+1−i)/(n+1)) · cᵢ/Σc   over counts sorted ascending,
    * computed over the FULL item universe (zero-count items included —
    * the reference's counter spans all n_items). Rewritten to exact
    * integer arithmetic until one final division:
    * Σ(n+1−i)·cᵢ = (n+1)·Σc − Σ i·cᵢ. The ranking window runs on
    * #items rows (the aggregate, never raw recommendations). */
  def diversityGini(recs: DataFrame, items: DataFrame): DataFrame = {
    val counts = items.select(col("i").as("item")).distinct()
      .join(recs.groupBy("item").agg(count(lit(1)).as("c")),
            Seq("item"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    // ascending rank via the two-pass range-partitioned rank — the item
    // axis never funnels through a single reducer (it is the corpus
    // axis in the LLM-pipeline framing, not just a bounded catalog)
    graft.core.Ranking
      .withGlobalRank(counts, Seq(col("c"), col("item")), "r")
      .agg(sum(col("r") * col("c")).as("rc"),
           count(lit(1)).as("n"), sum("c").as("tot"))
      .select(round(
        lit(2.0) * ((col("n") + 1) * col("tot") - col("rc")).cast("double") /
          ((col("n") + 1) * col("tot")).cast("double"), 6)
        .as("diversity_gini"))
  }

  /** RMSE of predicted scores against explicit test ratings on their
    * overlap (reference: metrics.py:219-266 — present but DISABLED in
    * the reference's evaluator loop; mirrored here as an opt-in metric
    * outside the standard accuracy set, for completeness). */
  def rmse(predictions: DataFrame, relevant: DataFrame): DataFrame =
    predictions.select(col("u"), col("item"), col("score"))
      .join(relevant.select(col("u"), col("i").as("item"),
                            col("r").cast("double").as("r")),
            Seq("u", "item"))
      .agg(round(sqrt(avg(pow(col("score") - col("r"), 2))), 6).as("rmse"))

  /** Herfindahl diversity 1 − Σp² (reference: metrics.py:447-479). */
  def herfindahl(recs: DataFrame): DataFrame = {
    val counts = graft.core.CacheScope.persist(
      recs.groupBy("item").agg(count(lit(1)).as("cnt")))
    counts.crossJoin(broadcast(counts.agg(sum("cnt").as("tot"))))
      .agg(round(lit(1.0) -
                 sum(pow(col("cnt").cast("double") / col("tot"), 2)), 6)
             .as("herfindahl"))
  }
}
