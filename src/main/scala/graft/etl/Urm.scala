package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** User-Rating-Matrix construction and split operators
  * (SURVEY.md §2.8 L1, §2.11 X1–X7).
  *
  * The reference materializes scipy CSR matrices
  * (reference: Utils/dataset.py:327-399); this engine keeps the URM
  * logical: a `(user, item, value)` triple DataFrame. All downstream
  * linear algebra is join-aggregation over triples, which partitions by
  * key and scales horizontally — no driver-side matrix ever materializes
  * except where the math demands it (EASE's inverse).
  */
object Urm {

  /** Implicit-feedback URM from the star schema: user = o_custkey,
    * item = l_partkey, value = 1 for any purchase
    * (reference: Utils/dataset.py:327-346 builds all-ones CSR the same
    * way after dedup). */
  def fromOrders(t: Tables): DataFrame =
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("u"), col("l_partkey").as("i"))
      // Key the dedup exchange by u ALONE: hashpartitioning(u)
      // satisfies the (u, i) ClusteredDistribution (subset rule), so
      // the distinct plans with NO second exchange — and the one
      // unavoidable URM shuffle now also co-partitions every
      // downstream user-keyed consumer: the similarity engine's
      // self-join on u and the degree-cap window both REUSE it
      // instead of re-exchanging the URM (guide §2.4 "two operations
      // keyed the same way can share one exchange"; measured on q33:
      // 5 exchanges → 3, the two eliminated ones being the two
      // URM-sized self-join shuffles). Trade: the dedup loses
      // map-side partial aggregation, pre-dedup rows cross the wire
      // (~1% duplicates in this schema) — bought against eliding two
      // URM-sized exchanges in every pair-engine query.
      // SKEW ASSUMPTION (ADVICE r14): keying by u alone routes a
      // user's entire PRE-dedup interaction set to one reducer, and
      // AQE cannot split a single key for aggregates — fine on this
      // schema's bounded per-user order counts, but on a power-law
      // log where one user holds millions of raw rows, dedup by
      // hash(u, i) first (restoring map-side combine) and accept the
      // extra pair-engine exchange, or cap/salt upstream the way the
      // similarity tier's capUserDegree does.
      .repartition(col("u"))
      .distinct()
      .withColumn("v", lit(1))

  /** Rating-valued URM (explicit feedback analog): mean quantity per
    * (user, item) in exact decimal space. */
  def ratingsFromOrders(t: Tables): DataFrame =
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("u"), col("l_partkey").as("i"))
      .agg((sum(col("l_quantity").cast("decimal(18,2)")) / count(lit(1)))
             .cast("double").as("r"))

  /** Dense-index ID remapping (reference:
    * Data_manager/IncrementalSparseMatrix.py:95-127 keeps dict mappers) —
    * distinct ids → contiguous [0, n) indices as a mapping DataFrame;
    * joins replace dict lookups. The id axis grows with the corpus
    * (users/items), so the rank goes through the two-pass range-
    * partitioned [[graft.core.Ranking]] instead of a single-reducer
    * window. */
  def denseIndex(df: DataFrame, id: Column): DataFrame =
    graft.core.Ranking.withGlobalRank(
        df.select(id.as("orig")).distinct(), Seq(col("orig")), "_rk")
      .withColumn("idx", col("_rk") - 1)
      .drop("_rk")

  /** X1 — seeded random split after dedup
    * (reference: Utils/dataset.py:322-325, frac .7/.1/.2 seed 42). */
  def randomSplit(urm: DataFrame, fracs: Array[Double], seed: Long)
      : Array[DataFrame] = urm.randomSplit(fracs, seed)

  /** Deterministic modulo split — the oracle-checkable twin of X1: the
    * split assignment is a pure function of the keys, so DuckDB computes
    * the identical membership. */
  def hashSplit(urm: DataFrame, nTrain: Int, nBuckets: Int): DataFrame =
    urm.withColumn("split",
      when((col("u") * 31 + col("i")) % nBuckets < nTrain, "train")
        .otherwise("test"))

  /** X2 — user-wise percentage holdout (reference:
    * Data_manager/split_functions/split_train_validation.py:17-78). */
  def userWiseHoldout(urm: DataFrame, trainFrac: Double, seed: Long)
      : DataFrame = {
    val w = Window.partitionBy("u").orderBy(rand(seed))
    urm.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("u")))
      .withColumn("split",
        when(col("rn") <= round(col("n") * trainFrac), "train")
          .otherwise("test"))
      .drop("rn", "n")
  }

  /** X4 — global random holdout: one seeded Bernoulli draw per
    * interaction, no per-user stratification (reference:
    * split_functions/split_train_validation.py:267-291
    * split_train_validation_percentage_random_holdout). */
  def globalRandomHoldout(urm: DataFrame, trainFrac: Double, seed: Long)
      : DataFrame =
    urm.withColumn("split",
      when(rand(seed) <= trainFrac, "train").otherwise("validation"))

  /** X5 — cold-start user-wise split (reference:
    * split_functions/split_train_validation.py:295-378
    * split_train_validation_cold_start_user_wise): users with more than
    * `coldItems` interactions are randomly partitioned — a
    * `fullTrainFrac` share keeps their whole profile in train, the rest
    * become COLD users retaining only `coldItems` random interactions
    * in train with everything else held out to validation. Users at or
    * below the threshold stay entirely in train (the reference's
    * users_no_enough_items branch). */
  def coldUserSplit(urm: DataFrame, fullTrainFrac: Double, coldItems: Int,
                    seed: Long): DataFrame = {
    // one seeded draw per user decides full-train membership — the
    // distributed analog of the reference's shuffled-prefix pick
    val userDraw = urm.select("u").distinct()
      .withColumn("u_draw", rand(seed))
    val perUser = Window.partitionBy("u")
    val wItems = perUser.orderBy(rand(seed + 1), col("i"))
    urm.join(userDraw, "u")
      .withColumn("n", count(lit(1)).over(perUser))
      .withColumn("is_cold",
        col("n") > coldItems && col("u_draw") >= fullTrainFrac)
      .withColumn("rn", row_number().over(wItems))
      .withColumn("split",
        when(!col("is_cold") || col("rn") <= coldItems, "train")
          .otherwise("validation"))
      .drop("n", "u_draw", "is_cold", "rn")
  }

  /** X5 deterministic twin — the oracle-checkable cold-user split: the
    * per-user draw and the per-user item order are pure md5 key
    * functions, so an external engine computes identical membership
    * (the same hash-routing used by the dedup sketches). Semantics
    * match [[coldUserSplit]] exactly. */
  def coldUserSplitHash(urm: DataFrame, fullTrainFrac: Double,
                        coldItems: Int): DataFrame = {
    val uDraw =
      (conv(substring(md5(col("u").cast("string")), 1, 15), 16, 10)
         .cast("long") % 1000L).cast("double") / 1000.0
    val itemKey = md5(concat_ws(",", col("u").cast("string"),
                                col("i").cast("string")))
    val perUser = Window.partitionBy("u")
    val wItems = perUser.orderBy(itemKey, col("i"))
    urm
      .withColumn("n", count(lit(1)).over(perUser))
      .withColumn("u_draw", uDraw)
      .withColumn("is_cold",
        col("n") > coldItems && col("u_draw") >= fullTrainFrac)
      .withColumn("rn", row_number().over(wItems))
      .withColumn("split",
        when(!col("is_cold") || col("rn") <= coldItems, "train")
          .otherwise("validation"))
      .drop("n", "u_draw", "is_cold", "rn")
  }

  /** X3 — leave-one-out per user (random, seeded). */
  def leaveOneOut(urm: DataFrame, seed: Long): DataFrame = {
    val w = Window.partitionBy("u").orderBy(rand(seed))
    urm.withColumn("split",
        when(row_number().over(w) === 1, "test").otherwise("train"))
  }

  /** X6 — timestamp split: latest interaction per user → test, second
    * latest → validation (reference:
    * split_functions/split_data_on_timestamp.py:16-92). */
  def timestampSplit(interactions: DataFrame, user: Column, ts: Column)
      : DataFrame = {
    val w = Window.partitionBy(user).orderBy(ts.desc)
    interactions.withColumn("split",
      when(row_number().over(w) === 1, "test")
        .when(row_number().over(w) === 2, "validation")
        .otherwise("train"))
  }

  /** X7 — negative item sampling: n unobserved items per user, seeded
    * (reference: split_functions/split_train_validation.py:141-260).
    *
    * Definition: per user, the n candidates with the smallest
    * md5("seed:u:i") draw (ties → smaller i) among items the user has
    * not interacted with — the engine's deterministic-randomness
    * convention ([[graft.stats.Stats.weightedSample]]), so the sample
    * is reproducible on any engine and independent of partitioning
    * (Spark's `rand(seed)` is neither).
    *
    * Scale path: the dense user×item candidate build is |U|·|I|-sized,
    * so candidates are pruned to draw < frac (~4n expected per user)
    * BEFORE the anti-join and ranking window; a second pass tops up the
    * rare users the prune left short from the draw ≥ frac remainder.
    * Because the prune and the ranking use the SAME draw, the two-pass
    * result is exactly the dense definition: a user with ≥ n candidates
    * below the cut has their n smallest draws all below it, and a short
    * user's top-n is everything below the cut plus the (n−got) smallest
    * above it. */
  def negativeSample(urm0: DataFrame, items0: DataFrame, nPerUser: Int,
                     seed: Long): DataFrame = {
    // both inputs are read 2–4 times (candidate build, anti-joins, the
    // nItems count) — persist once so an expensive upstream (a join, a
    // sorted limit) is not re-executed per consumer
    val urm = graft.core.CacheScope.persist(urm0.select("u", "i"))
    val items = broadcast(
      graft.core.CacheScope.persist(items0.select("i")))
    val users = urm.select("u").distinct()
    val nItems = items.distinct().count()
    val frac = math.min(1.0, 4.0 * nPerUser / math.max(1L, nItems))
    // first 52 bits of md5 as a long (the shared sampling-family
    // convention) — ordering on the raw integer is ordering on the
    // uniform (k + ½)/2⁵², no division needed
    def ord = graft.stats.Stats.md5Bits52(lit(seed), col("u"), col("i"))
    def topN(cands: DataFrame, n: Column): DataFrame = {
      val w = Window.partitionBy("u").orderBy(col("_ord"), col("i"))
      cands.withColumn("_ord", ord)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= n).drop("rn", "_ord")
    }
    val dense = users.join(items)
    if (frac >= 1.0) {
      topN(dense.join(urm, Seq("u", "i"), "left_anti"), lit(nPerUser))
    } else {
      val cut = (frac * 4503599627370496.0).toLong // floor(frac·2⁵²)
      val pruned = dense.filter(ord < cut)
        .join(urm, Seq("u", "i"), "left_anti")
      val first = graft.core.CacheScope.persist(
        topN(pruned, lit(nPerUser)))
      // exact top-up for users the prune left short — in the common case
      // nobody is short, so the top-up plan is gated on a cheap isEmpty
      // probe against the already-persisted first pass (round 2 ran the
      // top-up unconditionally and it cost ~half the operator's runtime)
      val got = first.groupBy("u").agg(count(lit(1)).as("got"))
      val short = graft.core.CacheScope.persist(
        users.join(got, Seq("u"), "left")
          .withColumn("got", coalesce(col("got"), lit(0)))
          .filter(col("got") < nPerUser))
      if (short.isEmpty) first.select("u", "i")
      else {
        // draw ≥ cut is disjoint from the first pass by construction,
        // so no dedup join is needed
        val rest = short.join(items).filter(ord >= cut)
          .join(urm, Seq("u", "i"), "left_anti")
        val extra = topN(rest, lit(nPerUser) - col("got"))
          .select("u", "i")
        first.select("u", "i").unionByName(extra)
      }
    }
  }

  /** U5 — disjointness audit over split triples (reference:
    * Utils/assertions_on_data_for_experiments.py:28-54): count of
    * (u, i) cells present in more than one split. Zero ⇔ disjoint. */
  def overlapCells(splits: DataFrame): DataFrame =
    splits.select("u", "i", "split").distinct()
      .groupBy("u", "i").agg(count(lit(1)).as("n_splits"))
      .filter(col("n_splits") > 1)
      .agg(count(lit(1)).as("n_overlapping"))
}
