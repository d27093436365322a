package graft.recommend

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Non-personalized + graph recommenders and the shared scoring/
  * recommendation query (SURVEY.md §2.8 L6–L10, L16–L17; §2.9 R1–R3).
  *
  * All scorers produce `(u, item, score)` triples and all similarity
  * models are `(i, j, w)` triples, so scoring is one join-aggregate
  * (the SpMM of reference Base/BaseSimilarityMatrixRecommender.py:77-96)
  * and ranking is one per-user window — both shuffle-partitioned by
  * user, which is the scalable axis at 100 TB.
  */
object Recommenders {

  /** L8 — TopPop: item popularity counts
    * (reference: Base/NonPersonalizedRecommender.py:27-47). */
  def topPop(urm: DataFrame): DataFrame =
    urm.groupBy("i").agg(count(lit(1)).as("pop"))

  /** L9 — GlobalEffects: global mean + shrunk item and user biases
    * (reference: Base/NonPersonalizedRecommender.py:75-136).
    *
    * Σ(r−μ) is expanded to Σr − n·μ so only raw-rating sums accumulate
    * (order-independent when ratings are integer-valued).
    * Returns (u, i, r, mu, item_bias, user_bias).
    */
  def globalEffects(ratings: DataFrame, lambdaItem: Double,
                    lambdaUser: Double): DataFrame = {
    val glob = ratings.agg((sum("r") / count(lit(1))).as("mu"))
    val withMu = ratings.crossJoin(broadcast(glob))
    val itemBias = withMu.groupBy("i")
      .agg(((sum("r") - count(lit(1)) * first("mu")) /
            (count(lit(1)) + lambdaItem)).as("item_bias"),
           first("mu").as("mu"))
    val withItem = withMu.drop("mu")
      .join(broadcast(itemBias), "i")
    val userBias = withItem.groupBy("u")
      .agg(((sum("r") - count(lit(1)) * first("mu") - sum("item_bias")) /
            (count(lit(1)) + lambdaUser)).as("user_bias"))
    withItem.join(broadcast(userBias), "u")
      .select("u", "i", "r", "mu", "item_bias", "user_bias")
  }

  /** L10 — seeded random scorer
    * (reference: Base/NonPersonalizedRecommender.py:155-180).
    *
    * The uniform draw is md5("seed:user:item") — the engine's
    * deterministic-randomness convention
    * ([[graft.stats.Stats.md5Uniform]]) — rather than Spark's
    * `rand(seed)`, whose values depend on the partitioning of the
    * moment: at cluster scale a repartition or AQE re-plan would
    * silently change every score. Rounded to 6 decimals so any engine
    * reproduces the scores bit-for-bit.
    *
    * `users` and `items` are single-key frames; the key is each
    * frame's FIRST column (whatever its name), and the two names must
    * differ so the cross join keeps both. */
  def randomScores(users: DataFrame, items: DataFrame, seed: Long)
      : DataFrame = {
    require(users.columns.length == 1 && items.columns.length == 1,
      s"randomScores keys on single-column frames, got " +
        s"users=${users.columns.mkString(",")} items=${items.columns.mkString(",")}")
    val uKey = users.columns.head
    val iKey = items.columns.head
    require(uKey != iKey,
      s"user and item key columns must have distinct names, got '$uKey'")
    users.crossJoin(items).withColumn("score",
      round(graft.stats.Stats.md5Uniform(lit(seed), col(uKey), col(iKey)),
            6))
  }

  /** L16 — P3alpha random-walk similarity
    * (reference: GraphBased/P3alphaRecommender.py:33-141):
    * W[i,j] = Σ_u (1/deg_i)ᵅ · (1/deg_u)ᵅ over co-interacting users,
    * i.e. the 2-hop item→user→item transition probability product.
    * The (1/deg_i)ᵅ factor is constant per pair and factored out of the
    * user sum, which accumulates in exact decimal when alpha == 1.
    */
  def p3alpha(urm0: DataFrame, alpha: Double): DataFrame = {
    // four consumers of the URM subtree (two join sides, two degree
    // aggregations) — persist once
    val urm = graft.core.CacheScope.persist(urm0)
    val userDeg = urm.groupBy("u").agg(count(lit(1)).as("nu"))
    val itemDeg = urm.groupBy("i").agg(count(lit(1)).as("ni"))
    val a = urm.select(col("u"), col("i").as("i1"))
    val b = urm.select(col("u"), col("i").as("i2"))
    // The user sum Σ_u 1/nu is orientation-independent (the asymmetric
    // (1/ni)^alpha factor joins in AFTER the aggregation), so only the
    // upper triangle i1 < i2 is generated and aggregated — half the
    // pair fan-out and shuffle of the dominant stage, exactly the
    // [[graft.similarity.Similarity.pairDots]] mirror trick.
    val pairsByUser = a.join(b, "u").filter(col("i1") < col("i2"))
      .join(broadcast(userDeg), "u")
    // Single aggregation over pair rows. For alpha == 1 the per-row
    // term 1/nu accumulates in FIXED-POINT LONG space: floor(1e12/nu)
    // is the same long on every engine (floor has no tie semantics —
    // double→int casts round in some engines and truncate in others),
    // long addition is exact and associative (map-side combine safe),
    // and the single long→double conversion at the end is IEEE-
    // deterministic. This replaces the round-3 decimal(16,15) sum,
    // whose per-row BigDecimal accumulation was the gap between this
    // query and the integer-sum cosine engine (q33) on the identical
    // pair fan-out. Headroom: terms ≤ 1e12, so a pair group overflows
    // long at ~9.2e6 co-occurring users. Engines fail DIFFERENTLY past
    // that bound (Spark ANSI long sum raises, DuckDB promotes to
    // HUGEINT silently), so the bound is enforced up front: a pair
    // group's row count is ≤ its items' min degree, so
    // max(item degree) ≤ 9e6 proves no group can overflow; otherwise
    // the same floor terms accumulate in exact decimal(38,0) —
    // bit-identical result (identical terms, exact sum, one final
    // IEEE division), no overflow on any engine. The check is one
    // tiny aggregate over the already-persisted item-degree table.
    val summed =
      if (alpha == 1.0) {
        // coalesce: max over an EMPTY URM is null — degrade to the
        // fixed-point fast path (vacuously safe), don't NPE
        val maxDeg =
          itemDeg.agg(coalesce(max("ni"), lit(0L))).head().getLong(0)
        if (maxDeg <= 9000000L)
          pairsByUser
            .groupBy(col("i1").as("i"), col("i2").as("j"))
            .agg((sum(floor(lit(1e12) / col("nu"))).cast("double") /
                  lit(1e12)).as("usum"))
        else
          pairsByUser
            .groupBy(col("i1").as("i"), col("i2").as("j"))
            .agg((sum(floor(lit(1e12) / col("nu")).cast("decimal(38,0)"))
                    .cast("double") / lit(1e12)).as("usum"))
      } else
        pairsByUser
          .groupBy(col("i1").as("i"), col("i2").as("j"))
          .agg(sum(pow(lit(1.0) / col("nu"), alpha)).as("usum"))
    val mirrored = graft.similarity.Similarity.mirrorPairs(summed, "usum")
    mirrored
      .join(broadcast(itemDeg), "i")
      .select(col("i"), col("j"),
              (pow(lit(1.0) / col("ni"), alpha) * col("usum")).as("w"))
  }

  /** L17 — RP3beta: P3alpha divided by item-popularity penalty deg_jᵝ
    * (reference: GraphBased/RP3betaRecommender.py:32-153). */
  def rp3beta(urm: DataFrame, alpha: Double, beta: Double): DataFrame = {
    val itemDegJ = urm.groupBy(col("i").as("j"))
      .agg(count(lit(1)).as("nj"))
    p3alpha(urm, alpha)
      .join(broadcast(itemDegJ), "j")
      .select(col("i"), col("j"), (col("w") / pow(col("nj"), beta)).as("w"))
  }

  /** L6 — sparse·sparse scoring: scores = URM[u] · W
    * (reference: Base/BaseSimilarityMatrixRecommender.py:77-96). The
    * similarity weights accumulate in exact decimal for cross-engine
    * determinism. Returns (u, item, score). */
  def scoreBySimilarity(urm: DataFrame, sim: DataFrame): DataFrame =
    urm.select(col("u"), col("i"))
      .join(sim.select(col("i"), col("j"), col("w")), "i")
      .groupBy(col("u"), col("j").as("item"))
      .agg(sum(col("w").cast("decimal(28,12)")).cast("double").as("score"))

  /** R1 — the recommendation query: score, remove seen (anti-join — the
    * engine's replacement for the reference's -inf masking,
    * Base/BaseRecommender.py:104-121), rank per user, keep top-k with a
    * deterministic tie order (score desc, item asc). */
  def recommend(scores: DataFrame, seen: DataFrame, k: Int): DataFrame = {
    val unseen = scores.join(
      seen.select(col("u"), col("i").as("item")), Seq("u", "item"),
      "left_anti")
    val w = Window.partitionBy("u").orderBy(desc("score"), asc("item"))
    unseen.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** R1 for non-personalized (global) scorers, scale-safe: a user can
    * displace at most their own seen count from the global top list, so
    * only the top `m = k + max_u(seen_u)` candidates can ever be
    * recommended — and a user's top-k all sit within the first
    * `k + |seen_u ∩ candidates|` global positions. The plan works in
    * POSITION space: rank the m candidates once, collect each user's
    * blocked positions (seen ∩ candidates — the only corpus-sized
    * shuffle), and take the first k unblocked positions per user with
    * `array_except(sequence(…), seenPos)`. No users×m frame is ever
    * materialized: the previous dense-frame formulation shuffled
    * users×m rows twice (anti-join + window) and its data movement
    * jumped super-linearly in the r10 soak once the anti-join's build
    * side outgrew broadcast range at sf1. Shuffle here is
    * |seen ∩ candidates| + users×k output — linear in input at any
    * scale. The m-row candidate head is collected once and re-enters
    * the plan as a LocalRelation, so both position lookups broadcast it
    * without spending a distributed job — per-call job count matches
    * the dense formulation (which collected the same m rows inside its
    * broadcast build). Returns (u, item, rank). */
  def recommendGlobal(globalScores: DataFrame, seen0: DataFrame,
                      k: Int, maxHead: Int = 2000000): DataFrame = {
    // `seen` feeds the bound computation and the blocked-position
    // join — persist once instead of recomputing it
    val seen = graft.core.CacheScope.persist(seen0)
    val maxSeen = seen.groupBy("u").agg(count(lit(1)).as("n"))
      .agg(max("n")).head().getLong(0)
    val m = k + maxSeen.toInt
    // m = k + max_u(seen_u) is this operator's driver/broadcast
    // envelope: a single pathological power user linearly inflates the
    // collected candidate head and both broadcasts. Fail loudly at a
    // configurable bound (2M (pos, item) rows ≈ tens of MB broadcast)
    // rather than OOM the driver — callers with a genuinely huge seen
    // tail should cap it upstream or raise maxHead deliberately.
    require(m <= maxHead,
      s"recommendGlobal candidate head m=$m (k=$k + maxSeen=$maxSeen) " +
      s"exceeds maxHead=$maxHead — a pathological max-seen user would " +
      "inflate the driver collect/broadcast; cap seen upstream or " +
      "raise maxHead explicitly")
    // the m-row candidate head, positions assigned in driver order
    // (TakeOrderedAndProject returns rows already in (score desc,
    // item asc) order). m = k + maxSeen is the operator's documented
    // driver/broadcast envelope — the dense formulation shipped the
    // same rows through its broadcast, which collects them anyway.
    val spark = globalScores.sparkSession
    val head = globalScores
      .orderBy(desc("score"), asc("item")).limit(m)
      .select("item").collect()
    val rankedSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(
        "pos", org.apache.spark.sql.types.IntegerType, nullable = false),
      globalScores.schema("item")))
    val ranked = spark.createDataFrame(
      java.util.Arrays.asList(head.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row(i + 1, r.get(0)) }: _*), rankedSchema)
    // ONE aggregation yields every user plus their blocked positions:
    // the left join keeps users whose seen items all miss the candidate
    // head (collect_set skips the null pos), so no separate
    // users-distinct + re-join pass is needed
    val blocked = seen.select(col("u"), col("i").as("item"))
      .join(broadcast(ranked), Seq("item"), "left")
      .groupBy("u").agg(collect_set("pos").as("seenPos"))
    val picks = blocked
      // scan range k + |seenPos_u| is exact per user (the first k
      // unblocked positions all fall inside it), so the per-row array
      // stays k + a user's own blocked count, never m
      .withColumn("picks",
        slice(array_except(
                sequence(lit(1), lit(k) + size(col("seenPos"))),
                col("seenPos")),
              1, k))
      .select(col("u"), posexplode(col("picks")).as(Seq("idx", "pos")))
    picks.join(broadcast(ranked), Seq("pos"))
      .select(col("u"), col("item"), (col("idx") + 1).as("rank"))
  }

  /** R2 — restrict scoring to a candidate set (negative-item ranking,
    * reference: Base/Evaluation/Evaluator.py:780-826). */
  def restrictToCandidates(scores: DataFrame, candidates: DataFrame)
      : DataFrame =
    scores.join(candidates.select(col("u"), col("item")),
                Seq("u", "item"), "left_semi")

  /** R2 pushed into L6 — candidate restriction applied BEFORE the
    * scoring aggregation: the semi-join prunes (u, item) pairs on the
    * pre-aggregation join rows, so excluded candidates never enter the
    * aggregate. Same result as scoreBySimilarity → restrictToCandidates
    * when `candidates` covers the restriction set; at scale this skips
    * the aggregation work for every non-candidate pair. */
  def scoreBySimilarityRestricted(urm: DataFrame, sim: DataFrame,
                                  candidates: DataFrame): DataFrame =
    urm.select(col("u"), col("i"))
      .join(sim.select(col("i"), col("j"), col("w")), "i")
      .join(candidates.select(col("u"), col("item").as("j")),
            Seq("u", "j"), "left_semi")
      .groupBy(col("u"), col("j").as("item"))
      .agg(sum(col("w").cast("decimal(28,12)")).cast("double").as("score"))
}
