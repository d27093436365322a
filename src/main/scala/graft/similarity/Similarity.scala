package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Item-item similarity pair-aggregation engine (SURVEY.md §2.8 L2/L3,
  * L28; reference: Base/Similarity/Compute_Similarity_Python.py:20-390).
  *
  * The reference runs a blocked AᵀA with NumPy (block_size=100 columns);
  * here the same math is one shuffle: a self-join of the URM on the user
  * key aggregated to pair dot-products, then per-column norm joins and a
  * top-K ranking window. Catalyst plans the self-join as a shuffled hash
  * join partitioned by user; AQE handles heavy-hitter users (skew-join
  * split) — the analog of the reference's memory-bounded blocking.
  *
  * For binary URMs every dot-product and norm is an exact integer, so
  * cosine/Jaccard/Dice/Tversky weights are bit-deterministic (IEEE sqrt
  * and division) — which is what makes these oracle-checkable.
  */
object Similarity {

  sealed trait Measure
  case object Cosine extends Measure
  /** Asymmetric cosine: dot / (nⱼᵃ · nᵢ^(1−a)) — the alpha exponent
    * attaches to the COLUMN item j (the scored axis), matching the
    * reference's `sumOfSquared_to_alpha[columnIndex]`
    * (Compute_Similarity_Python.py:316-321). */
  final case class AsymmetricCosine(alpha: Double) extends Measure
  case object Jaccard extends Measure
  case object Dice extends Measure
  /** reference: Compute_Similarity_Python.py:330-340. */
  final case class Tversky(alpha: Double, beta: Double) extends Measure
  /** ‖a‖² + ‖b‖² − 2a·b with lin/log/exp transform
    * (reference: Compute_Similarity_Euclidean.py:196-205).
    *
    * `normalize` divides the SQUARED distance by √nᵢ·√nⱼ and
    * `normalizeAvgRow` further divides it by the user count, both
    * BEFORE the sqrt — the reference's order of operations
    * (Compute_Similarity_Euclidean.py:188-196: `item_distance /=
    * sumOfSquared[col] * sumOfSquared`, then `/= self.n_rows`, then
    * `np.sqrt`). These are the euclidean KNN space's own dimensions
    * (run_parameter_search.py:196-199). */
  final case class Euclidean(transform: String,
                             normalize: Boolean = false,
                             normalizeAvgRow: Boolean = false)
      extends Measure

  /** The euclidean similarity column shared by the binary and weighted
    * engines: squared distance → optional normalize divides → sqrt →
    * lin/log/exp transform with the reference's shrink + 1e-9 floor
    * (Compute_Similarity_Euclidean.py:188-205). `nRows` is only
    * consulted when `normalizeAvgRow` is set. */
  private def euclideanWeight(e: Euclidean, ni: Column, nj: Column,
                              d: Column, shrink: Double,
                              nRows: Column): Column = {
    val sq0 = (ni + nj - lit(2) * d).cast("double")
    val sq1 = if (e.normalize) sq0 / (sqrt(ni) * sqrt(nj)) else sq0
    val sq2 = if (e.normalizeAvgRow) sq1 / nRows else sq1
    val dist = sqrt(sq2)
    e.transform match {
      case "lin" => lit(1.0) / (dist + lit(shrink) + lit(1e-9))
      case "log" =>
        lit(1.0) / (log(dist + lit(1.0)) + lit(shrink) + lit(1e-9))
      case "exp" => lit(1.0) / (exp(dist) + lit(shrink) + lit(1e-9))
      case other =>
        throw new IllegalArgumentException(
          s"similarity_from_distance_mode must be lin|log|exp: $other")
    }
  }

  /** Explode each upper-triangle pair row (i < j, value v) into both
    * orientations — a narrow per-row map, so the expensive aggregation
    * subtree underneath runs exactly once (a `union(mirror)` of the
    * same subtree plans TWO pair joins: exchange reuse does not fire
    * across the union branches, verified in PlanSpec). */
  private[graft] def mirrorPairs(upper: DataFrame, v: String): DataFrame =
    upper.select(explode(array(
        struct(col("i"), col("j"), col(v)),
        struct(col("j").as("i"), col("i").as("j"), col(v)))).as("_p"))
      .select(col("_p.i").as("i"), col("_p.j").as("j"),
              col(s"_p.$v").as(v))

  /** Pairwise co-occurrence counts (dot products of binary item columns):
    * both orientations (i,j) and (j,i) emitted, diagonal excluded —
    * mirrors the reference's zeroed self-similarity
    * (Compute_similarity_test.py:37-56).
    *
    * The dot product is symmetric, so only the upper triangle (i1 < i2)
    * is generated and aggregated — half the per-user pair fan-out, half
    * the hash-aggregation and shuffle volume of the engine's dominant
    * stage — and each aggregated row is then exploded into both
    * orientations ([[mirrorPairs]]). Asymmetric measures are
    * unaffected: their asymmetry enters through the norm joins applied
    * after the mirror, never through the dot itself. */
  def pairDots(urm0: DataFrame): DataFrame = {
    // the URM subtree feeds both self-join sides (and the caller's norm
    // aggregation): persist once — the physical plan shows no exchange
    // reuse across the aliased sides otherwise (idempotent if the
    // caller already persisted the same frame)
    val urm = graft.core.CacheScope.persist(urm0)
    val a = urm.select(col("u"), col("i").as("i1"))
    val b = urm.select(col("u"), col("i").as("i2"))
    mirrorPairs(
      a.join(b, "u")
        .filter(col("i1") < col("i2"))
        .groupBy(col("i1").as("i"), col("i2").as("j"))
        .agg(count(lit(1)).as("dot")),
      "dot")
  }

  /** Per-item interaction counts (squared L2 norms of binary columns). */
  def itemNorms(urm: DataFrame): DataFrame =
    urm.groupBy(col("i")).agg(count(lit(1)).as("n"))

  /** [[pairDots]] with a salted two-phase aggregation: hot (i, j) pairs
    * (two blockbuster items co-occurring across millions of users) are
    * spread over `salts` reducers before the merge — the aggregation
    * analog of AQE's skew-join split, which only rebalances joins.
    * Result identical to [[pairDots]]. */
  def pairDotsSalted(urm0: DataFrame, salts: Int): DataFrame = {
    val urm = graft.core.CacheScope.persist(urm0)
    val a = urm.select(col("u"), col("i").as("i1"))
    val b = urm.select(col("u"), col("i").as("i2"))
    // upper triangle only + post-aggregation mirror, as in [[pairDots]]
    mirrorPairs(
      a.join(b, "u")
        .filter(col("i1") < col("i2"))
        .withColumn("_salt",
          pmod(spark_partition_id() + monotonically_increasing_id(),
               lit(salts)))
        .groupBy(col("i1").as("i"), col("i2").as("j"), col("_salt"))
        .agg(count(lit(1)).as("partial"))
        .groupBy(col("i"), col("j"))
        .agg(sum("partial").as("dot")),
      "dot")
  }

  /** Heavy-hitter guard: true when any user's profile exceeds
    * `threshold` interactions — the profiles whose n² pair fan-out
    * skews the similarity self-join (SURVEY §7.4). One cheap count
    * aggregation; callers use it to route to the salted engine. */
  def hasHeavyUsers(urm: DataFrame, threshold: Long): Boolean =
    !urm.groupBy("u").agg(count(lit(1)).as("n"))
      .filter(col("n") > threshold).isEmpty

  /** Deterministic per-user profile cap — the pair engine's 100 TB
    * skew bound. The self-join's fan-out is QUADRATIC in per-user
    * degree (one 10⁵-interaction user emits 10¹⁰ pair rows), and no
    * runtime re-plan can shrink it: AQE's skew split and the salted
    * aggregation rebalance WHERE the pair rows are processed, never
    * HOW MANY there are, so on a power-law interaction log (every
    * real one) the uncapped engine is super-linear by construction —
    * measured: Zipf-degree soak, records exponent ≈ 2 at four scale
    * points vs ≤ ~1.1 capped (SURVEY §6.z″). Capping each profile to
    * its `maxDegree` md5-first interactions bounds total pair fan-out
    * by maxDegree · |URM| — linear in the corpus — at the price of a
    * similarity estimated from a bounded uniform subsample of the
    * heaviest profiles (the same trade the reference's blocked topK
    * processing prices implicitly, Compute_Similarity_Python.py:
    * 276-381, and DIMSUM-style samplers make explicit); the trade is
    * a MEASURED number (the q208 gate), not prose.
    *
    * The kept subset is a pure key function (md5 of "u,i", the
    * coldUserSplitHash convention — partition-invariant, oracle-
    * expressible, and unbiased w.r.t. item identity: an interaction's
    * survival is independent of its item's popularity). The
    * row_number window shuffles once on u — the SAME key the pair
    * self-join partitions by — and Spark 4's WindowGroupLimit rewrite
    * prunes rank > maxDegree map-side before the exchange.
    *
    * Light profiles (degree ≤ maxDegree) pass through bit-identically:
    * capped similarity differs from uncapped ONLY on pairs touching an
    * over-cap profile. */
  def capUserDegree(urm: DataFrame, maxDegree: Int): DataFrame = {
    require(maxDegree > 0, s"maxDegree $maxDegree must be positive")
    userDegreeRanked(urm)
      .filter(col(capRankCol) <= maxDegree)
      .drop(capRankCol)
  }

  /** The cap's rank column, exposed for cap SWEEPS ([[userDegreeRanked]]). */
  private[graft] val capRankCol = "_rk__graft_cap"

  /** The ranking half of [[capUserDegree]]: every interaction tagged
    * with its md5-first per-user rank, NOT yet filtered. A cap sweep
    * (q214's recall curve) computes this window ONCE, persists it, and
    * derives each cap level as a plain filter — the cap frames are
    * bit-identical to independent [[capUserDegree]] calls (rk ≤ cap of
    * the same deterministic ordering) at one window shuffle instead of
    * one per cap level. Single-cap callers keep [[capUserDegree]],
    * whose filter-over-window form Spark 4 rewrites to a map-side
    * WindowGroupLimit prune. */
  private[graft] def userDegreeRanked(urm: DataFrame): DataFrame = {
    require(!urm.columns.contains(capRankCol),
      s"input must not contain reserved column $capRankCol")
    val ord = md5(concat_ws(",", col("u").cast("string"),
                            col("i").cast("string")))
    val w = Window.partitionBy("u").orderBy(ord, col("i"))
    urm.withColumn(capRankCol, row_number().over(w))
  }

  /** MULTI-CAP pair dot-products over a [[userDegreeRanked]] frame —
    * ONE upper-triangle self-join/aggregation for every cap level of a
    * cap sweep (guide §2.4: the sweep's k capped chains re-ran the
    * same quadratic pair fan-out k+1 times; one cap-c pair exists iff
    * BOTH interactions rank ≤ c, so every cap's dot is a conditional
    * count over the SAME uncapped pair stream, keyed by
    * m = max(rank_a, rank_b)). Output: mirrored (i, j, dot,
    * dot_<cap>…) where `dot` is the uncapped count and each `dot_c` is
    * bit-identical to `pairDots(capUserDegree(urm, c))`'s count (same
    * integer — a count over the identical pair subset). Pair PRESENCE
    * in the cap-c engine: binary consumers filter `dot_c > 0` (a
    * present pair always counts ≥ 1); weighted consumers filter
    * `dot_c IS NOT NULL` (the conditional sum is NULL iff no
    * qualifying co-occurrence exists, while a present pair can
    * legitimately sum to 0 under zero/negative TF-IDF weights).
    * SimilaritySpec pins the bit-equality against independent
    * [[capUserDegree]] chains.
    *
    * `weighted`: when the ranked frame carries a decimal `w` column,
    * dots are Σ wₐ·w_b instead of counts — the conditional sum adds
    * the identical decimal terms the capped chain's sum adds (exact,
    * associative), so it too is bit-identical. */
  private[graft] def pairDotsMultiCap(ranked: DataFrame, caps: Seq[Int],
                                      weighted: Boolean = false)
      : DataFrame = {
    val rk = col(capRankCol)
    val a =
      if (weighted)
        ranked.select(col("u"), col("i").as("i1"), rk.as("r1"),
                      col("w").as("wa"))
      else ranked.select(col("u"), col("i").as("i1"), rk.as("r1"))
    val b =
      if (weighted)
        ranked.select(col("u"), col("i").as("i2"), rk.as("r2"),
                      col("w").as("wb"))
      else ranked.select(col("u"), col("i").as("i2"), rk.as("r2"))
    val m = greatest(col("r1"), col("r2"))
    val full =
      if (weighted) sum(col("wa") * col("wb")).as("dot")
      else count(lit(1)).as("dot")
    val perCap = caps.map { c =>
      if (weighted)
        sum(when(m <= c, col("wa") * col("wb"))).as(s"dot_$c")
      else count(when(m <= c, 1)).as(s"dot_$c")
    }
    val upper = a.join(b, "u")
      .filter(col("i1") < col("i2"))
      .groupBy(col("i1").as("i"), col("i2").as("j"))
      .agg(full, perCap: _*)
    // multi-column mirror (the [[mirrorPairs]] device, n value cols)
    val vs = "dot" +: caps.map(c => s"dot_$c")
    upper.select(explode(array(
        struct((col("i") +: col("j") +: vs.map(col)): _*),
        struct((col("j").as("i") +: col("i").as("j") +:
                vs.map(col)): _*))).as("_p"))
      .select((col("_p.i").as("i") +: col("_p.j").as("j") +:
               vs.map(v => col(s"_p.$v").as(v))): _*)
  }

  /** Per-item norms at every cap level of a sweep, one aggregation:
    * (i, n, n_<cap>…) with `n_c` bit-identical to
    * `itemNorms(capUserDegree(urm, c))` (conditional count / exact
    * decimal sum over the identical row subset). An item whose every
    * interaction ranks above c gets n_c = 0 — it cannot appear in any
    * cap-c pair either, so the join result downstream is unaffected. */
  private[graft] def itemNormsMultiCap(ranked: DataFrame, caps: Seq[Int],
                                       weighted: Boolean = false)
      : DataFrame = {
    val rk = col(capRankCol)
    val full =
      if (weighted) sum(col("w") * col("w")).as("n")
      else count(lit(1)).as("n")
    val perCap = caps.map { c =>
      if (weighted) sum(when(rk <= c, col("w") * col("w"))).as(s"n_$c")
      else count(when(rk <= c, 1)).as(s"n_$c")
    }
    ranked.groupBy(col("i")).agg(full, perCap: _*)
  }

  /** Quantize a weighted URM's entries to exact decimal(18,9) — the
    * determinism device shared by every weighted-engine path: input
    * weights round to 9 decimals (far below any weighting scheme's
    * signal) and accumulate as exact decimals, so weighted dots are
    * bit-reproducible cross-engine. Persisted: the frame feeds both
    * self-join sides plus the norm aggregation. */
  private[graft] def quantizeWeights(urm0: DataFrame): DataFrame =
    graft.core.CacheScope.persist(
      urm0.select(col("u"), col("i"),
                  round(col("w").cast("double"), 9)
                    .cast("decimal(18,9)").as("w")))

  /** Upper-triangle weighted pair dot-products over a
    * [[quantizeWeights]]-prepared URM, mirrored to both orientations —
    * the weighted twin of [[pairDots]]. decimal(18,9) × decimal(18,9)
    * → scale-18 decimal EXACT in both Spark (37,18) and DuckDB
    * (36,18) — 19,9 would push Spark past precision 38 and round the
    * 18th fractional digit; the sum stays decimal — associative,
    * map-side-combine safe, engine-identical. */
  private[graft] def pairDotsWeightedFrom(urm: DataFrame): DataFrame = {
    val a = urm.select(col("u"), col("i").as("i1"), col("w").as("wa"))
    val b = urm.select(col("u"), col("i").as("i2"), col("w").as("wb"))
    mirrorPairs(
      a.join(b, "u")
        .filter(col("i1") < col("i2"))
        .groupBy(col("i1").as("i"), col("i2").as("j"))
        .agg(sum(col("wa") * col("wb")).as("dot")),
      "dot")
  }

  /** [[pairDotsWeightedFrom]] with the salted two-phase aggregation of
    * [[pairDotsSalted]]: hot (i, j) reducers spread over `salts`
    * partial groups before the merge. The partials are EXACT decimals
    * (scale-18), so the two-phase sum is associative and the result is
    * bit-identical to the unsalted form — salting a double sum would
    * reorder an order-dependent accumulation. */
  private[graft] def pairDotsWeightedSaltedFrom(urm: DataFrame,
                                                salts: Int): DataFrame = {
    val a = urm.select(col("u"), col("i").as("i1"), col("w").as("wa"))
    val b = urm.select(col("u"), col("i").as("i2"), col("w").as("wb"))
    mirrorPairs(
      a.join(b, "u")
        .filter(col("i1") < col("i2"))
        .withColumn("_salt",
          pmod(spark_partition_id() + monotonically_increasing_id(),
               lit(salts)))
        .groupBy(col("i1").as("i"), col("i2").as("j"), col("_salt"))
        .agg(sum(col("wa") * col("wb")).as("partial"))
        .groupBy(col("i"), col("j"))
        .agg(sum("partial").as("dot")),
      "dot")
  }

  /** Cosine-family similarity over a WEIGHTED URM (u, i, w) — the
    * shape the reference's feature-weighted KNN runs (IR_feature_
    * weighting.py applied before Compute_Similarity_Python.py:
    * TF-IDF/BM25 weights replace the binary entries, dots become
    * Σ wₐ·w_b and norms Σ w²). Same upper-triangle pair engine and
    * broadcast-norm joins as [[itemSimilarity]]; only cosine-family
    * measures are meaningful on weighted entries (the set measures —
    * Jaccard/Dice/Tversky — are defined on binary supports, which is
    * exactly why the reference skips feature weighting for them).
    *
    * Determinism: input weights are rounded to 9 decimals and
    * accumulated as EXACT decimals (a double product sum is
    * order-dependent — the `scoreBySimilarity` convention), so the
    * whole similarity is bit-reproducible and oracle-checkable; the
    * 1e-9 quantization is far below any weighting scheme's signal.
    *
    * `maxUserDegree` / `saltWhenHeavy`: the SAME skew levers as
    * [[itemSimilarity]] — the weighted self-join has the identical
    * quadratic per-user pair fan-out (the weights change what each
    * pair row CARRIES, not how many there are), so on power-law
    * degree the uncapped weighted engine hits the measured records-
    * exponent-≈2 wall of the binary twin (SURVEY §6.z″). The cap
    * routes the weighted frame through [[capUserDegree]] BEFORE
    * quantization, dots AND norms — the capped similarity is the
    * exact similarity OF THE CAPPED WEIGHTED URM, oracle-checkable
    * like the binary one (q211). The cap's md5 pick reads only
    * (u, i); the weight column rides along untouched, so weighting
    * (computed by the caller on the FULL frame — df/idf statistics
    * keep corpus semantics) and capping compose cleanly. */
  def itemSimilarityWeighted(urm0: DataFrame, measure: Measure,
                             shrink: Double = 0.0,
                             saltWhenHeavy: Long = 0L,
                             maxUserDegree: Int = 0): DataFrame = {
    require(measure match {
      case Cosine | AsymmetricCosine(_) | Euclidean(_, _, _) => true
      case _ => false
    }, s"weighted similarity needs a dot-product measure, got $measure")
    val urm = quantizeWeights(
      if (maxUserDegree > 0) capUserDegree(urm0, maxUserDegree)
      else urm0)
    val dots =
      if (saltWhenHeavy > 0 && hasHeavyUsers(urm, saltWhenHeavy))
        pairDotsWeightedSaltedFrom(urm, salts = 16)
      else pairDotsWeightedFrom(urm)
    val norms = urm.groupBy(col("i")).agg(sum(col("w") * col("w")).as("n"))
    val ni = norms.select(col("i").as("i"), col("n").as("ni"))
    val nj = norms.select(col("i").as("j"), col("n").as("nj"))
    val joined = dots.join(broadcast(ni), "i").join(broadcast(nj), "j")
    val d = col("dot").cast("double")
    val w: Column = measure match {
      // the reference adds a 1e-6 stabilizer to every normalized
      // denominator (Compute_Similarity_Python.py:316-318) — on
      // WEIGHTED entries it is load-bearing: a TF-IDF weight can be
      // exactly 0 (df = n_users - 1 under the df+1 idf), making a
      // zero-norm item, and without the epsilon shrink=0 yields
      // 0/0 = NaN or x/0 = Inf where the reference returns finite
      // values. (The binary [[itemSimilarity]] keeps shrink-only
      // denominators: every URM item has n >= 1 interaction, so its
      // denominators are bounded away from 0 and its long-green
      // oracle gates pin that form.)
      case Cosine =>
        d / (sqrt(col("ni")) * sqrt(col("nj")) + lit(shrink) + lit(1e-6))
      case AsymmetricCosine(al) =>
        d / (pow(col("nj"), al) * pow(col("ni"), 1.0 - al)
             + lit(shrink) + lit(1e-6))
      case e: Euclidean =>
        euclideanWeight(e, col("ni"), col("nj"), d, shrink,
                        col("n_rows"))
      case other =>
        throw new IllegalArgumentException(other.toString)
    }
    val withRows = measure match {
      case Euclidean(_, _, true) =>
        joined.crossJoin(broadcast(
          urm.select(countDistinct(col("u")).as("n_rows"))))
      case _ => joined.withColumn("n_rows", lit(null).cast("long"))
    }
    withRows.select(col("i"), col("j"), w.as("w"))
  }

  /** Full similarity matrix as (i, j, w) triples for a binary URM.
    *
    * `saltWhenHeavy`: profile-size threshold above which the pair
    * aggregation routes through [[pairDotsSalted]] (0 disables the
    * probe). Heavy profiles fan out n² pair rows, concentrating hot
    * (i, j) keys; the salted two-phase aggregation spreads those
    * reducers while AQE's skew split rebalances the join side.
    *
    * `maxUserDegree`: per-user profile cap (0 disables) — routes the
    * input through [[capUserDegree]] BEFORE dots and norms, so the
    * engine computes the exact similarity OF THE CAPPED URM (both
    * numerator and denominators see the same frame — a capped dot
    * over uncapped norms would be a biased hybrid no one can verify).
    * Salting treats hot REDUCERS; the cap is the only lever that
    * shrinks the quadratic pair COUNT itself, which is what binds on
    * power-law degree at 100 TB (see [[capUserDegree]]). */
  def itemSimilarity(urm0: DataFrame, measure: Measure,
                     shrink: Double = 0.0,
                     saltWhenHeavy: Long = 0L,
                     maxUserDegree: Int = 0): DataFrame = {
    val urm = graft.core.CacheScope.persist(
      if (maxUserDegree > 0) capUserDegree(urm0, maxUserDegree)
      else urm0)
    val dots =
      if (saltWhenHeavy > 0 && hasHeavyUsers(urm, saltWhenHeavy))
        pairDotsSalted(urm, salts = 16)
      else pairDots(urm)
    val norms = itemNorms(urm)
    val ni = norms.select(col("i").as("i"), col("n").as("ni"))
    val nj = norms.select(col("i").as("j"), col("n").as("nj"))
    val joined = dots.join(broadcast(ni), "i").join(broadcast(nj), "j")
    val d = col("dot").cast("double")
    val w: Column = measure match {
      case Cosine =>
        d / (sqrt(col("ni")) * sqrt(col("nj")) + lit(shrink))
      case AsymmetricCosine(a) =>
        d / (pow(col("nj"), a) * pow(col("ni"), 1.0 - a) + lit(shrink))
      case Jaccard =>
        d / (col("ni") + col("nj") - col("dot") + lit(shrink))
      case Dice =>
        d * 2 / (col("ni") + col("nj") + lit(shrink))
      case Tversky(a, b) =>
        // alpha weighs the column item j's complement, beta the row's
        // (reference: Compute_Similarity_Python.py:330-335,
        //  sumOfSquared[columnIndex] carries tversky_alpha)
        d / (d + (col("nj") - col("dot")) * a +
             (col("ni") - col("dot")) * b + lit(shrink))
      case e: Euclidean =>
        euclideanWeight(e, col("ni"), col("nj"), d, shrink,
                        col("n_rows"))
    }
    // normalize_avg_row needs the user count — a broadcast scalar
    // cross-join keeps the plan lazy (no driver count action) and
    // costs one one-row exchange only when that dimension is on
    val withRows = measure match {
      case Euclidean(_, _, true) =>
        joined.crossJoin(broadcast(
          urm.select(countDistinct(col("u")).as("n_rows"))))
      case _ => joined.withColumn("n_rows", lit(null).cast("long"))
    }
    withRows.select(col("i"), col("j"), w.as("w"))
  }

  /** L28/T4 — column-wise top-K sparsification
    * (reference: Base/Recommender_utils.py:55-122): keep the K strongest
    * neighbor rows i per COLUMN j — j is the scored-item axis in
    * scoreBySimilarity, so each scored item retains its K strongest
    * incoming weights, exactly the reference's per-column argpartition
    * (Compute_Similarity_Python.py:352-365). Deterministic tie-break on
    * neighbor id. */
  def topK(sim: DataFrame, k: Int): DataFrame = {
    // ranking window, NOT the typed bounded-heap Aggregator: Spark's
    // WindowGroupLimit rewrite (4.x) already pushes the rank <= k
    // predicate below the exchange as a primitive-comparison group
    // limit, so the window form gets map-side top-k pruning inside
    // whole-stage codegen. An A/B at sf0.1 measured the
    // TopKAggregator-udaf form at 15-35 s vs 6 s for this plan — the
    // per-row boxed buffer update can't compete with codegen'd group
    // limits. (The heap Aggregator remains the right tool where the
    // engine needs top-k DURING an aggregation, not after one.)
    val w = Window.partitionBy("j").orderBy(desc("w"), asc("i"))
    sim.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Heap-aggregator form of [[topK]], kept as a differential yardstick
    * (SimilaritySpec pins bit-equality of the two forms). */
  private[graft] def topKHeap(sim: DataFrame, k: Int): DataFrame = {
    val agg = graft.functions.TopKAggregator.udafFor(k)
    sim
      .groupBy("j")
      .agg(agg(col("i").cast("long"), col("w").cast("double")).as("top"))
      .select(col("j"), posexplode(col("top")).as(Seq("pos", "p")))
      .select(col("p._1").as("i"), col("j"), col("p._2").as("w"),
              (col("pos") + 1).cast("int").as("rank"))
  }
}
