package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.CacheScope

/** Distribution analytics (SURVEY.md §2.4): Gini concentration,
  * cumulative-coverage percentiles, histograms, pivot heatmaps,
  * gap-based sessionization.
  *
  * All are expressed as declarative plans: one shuffle for the grouped
  * count, one (single-partition but tiny — #groups rows, never raw rows)
  * window for rank-dependent formulas. At 100 TB the grouped count is the
  * only scan-sized stage; everything after operates on the aggregate.
  */
object Stats {

  /** Gini coefficient of the `cnt` distribution per `key` group
    * (reference: Utils/gini.py:8-28): sum((2i-n-1)·x_i)/(n·Σx) over x
    * sorted ascending. Exact integer arithmetic until the final division.
    * The ascending rank comes from the two-pass range-partitioned rank
    * ([[graft.core.Ranking]]) — no unpartitioned window, so the ranked
    * axis may be corpus-sized (documents), not just a bounded catalog.
    */
  def giniOfCounts(df: DataFrame, key: Column): DataFrame = {
    val counts = df.groupBy(key.as("k")).agg(count(lit(1)).as("cnt"))
    // Σ(2i−n−1)·x == 2·Σi·x − (n+1)·Σx — avoids needing n inside the sum
    graft.core.Ranking
      .withGlobalRank(counts, Seq(col("cnt"), col("k")), "i")
      .agg(sum(col("i") * col("cnt")).as("ic"),
           count(lit(1)).as("n"), sum("cnt").as("tot"))
      .select(((lit(2) * col("ic") - (col("n") + 1) * col("tot"))
                 .cast("double") /
               (col("n") * col("tot")).cast("double")).as("gini"))
  }

  /** How many top-`key` entities cover each percentage of total mass
    * (reference: Utils/dataset.py:1201-1260). Returns one row per
    * threshold with the number of entities whose cumulative count first
    * reaches it.
    */
  def cumulativeCoverage(df: DataFrame, key: Column,
                         thresholds: Seq[Double]): DataFrame = {
    val counts = graft.core.CacheScope.persist(
      df.groupBy(key.as("k")).agg(count(lit(1)).as("cnt")))
    // running total via the two-pass range-partitioned prefix sum; the
    // grand total is a pre-aggregated broadcast scalar instead of an
    // all-rows empty-frame window — no single-reducer stage on the
    // entity axis
    val tot = counts.agg(sum("cnt").as("tot"))
    val cum = graft.core.Ranking
      .withGlobalRankAndCumSum(counts, Seq(desc("cnt"), asc("k")),
                               col("cnt"), "_rk", "cum")
      .drop("_rk")
      .crossJoin(broadcast(tot))
    val perThreshold = thresholds.map { th =>
      cum.filter(col("cum") - col("cnt") < lit(th) * col("tot"))
        .agg(count(lit(1)).as("n_entities"))
        .select(lit(th).as("threshold"), col("n_entities"))
    }
    perThreshold.reduce(_ unionByName _)
  }

  /** Fixed-width histogram of a numeric column
    * (reference: Utils/dataset.py:1277-1289). */
  def histogram(df: DataFrame, value: Column, binWidth: Double): DataFrame =
    df.groupBy(floor(value / binWidth).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"))

  /** Pivot heatmap as conditional aggregation
    * (reference: Utils/dataset.py:1933-1948). Explicit when/sum instead of
    * `.pivot()` so output column names are fixed, not data-derived. */
  def conditionalPivot(df: DataFrame, rowKey: Column, pivotCol: Column,
                       values: Seq[String]): DataFrame =
    df.groupBy(rowKey.as("k"))
      .agg(values.map(v =>
             sum(when(pivotCol === v, 1).otherwise(0)).as(s"n_$v")).head,
           values.map(v =>
             sum(when(pivotCol === v, 1).otherwise(0)).as(s"n_$v")).tail: _*)

  /** The reference's statistics-document scalars for a URM
    * (reference: Utils/dataset.py:601-1047 basic statistics): entity
    * counts, density, and interaction-concentration gini — one bundle
    * ready for TableIO.accumulateStatistics. */
  def basicStatistics(urm: DataFrame): Map[String, Double] = {
    val nU = urm.select("u").distinct().count()
    val nI = urm.select("i").distinct().count()
    val nnz = urm.count()
    val giniItems = giniOfCounts(urm, col("i")).head().getDouble(0)
    Map(
      "num_users" -> nU.toDouble,
      "num_items" -> nI.toDouble,
      "num_interactions" -> nnz.toDouble,
      "density" -> nnz.toDouble / (nU.toDouble * nI),
      "gini_item_popularity" -> giniItems)
  }

  /** Deterministic hash-stratified sampling: keep a row iff the first
    * 8 hex digits of md5(id) — a uniform 32-bit integer — fall below
    * the row's stratum rate threshold. The corpus down-sampling
    * primitive (per-language / per-source rates for training-mix
    * control): seedless-reproducible (the SAME rows survive any re-run
    * on any engine, the property incremental 100 TB processing needs —
    * `df.sample()` cannot promise that across partitionings), and one
    * codegen'd scan — no shuffle, no state.
    *
    * Thresholds are precomputed longs out of 2³², so the SQL twin
    * embeds identical integer constants. */
  def stratifiedSample(df: DataFrame, id: Column, stratum: Column,
                       rates: Map[String, Double],
                       defaultRate: Double): DataFrame = {
    val bucket = conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long")
    val threshold = rates.foldLeft(
      lit(rateThreshold(defaultRate))) { case (acc, (k, r)) =>
        when(stratum === k, lit(rateThreshold(r))).otherwise(acc)
      }
    df.filter(bucket < threshold)
  }

  /** A sampling rate as an exact 32-bit integer threshold. */
  def rateThreshold(rate: Double): Long = (rate * 4294967296.0).toLong

  /** The engine's deterministic-randomness convention, shared by the
    * whole sampling family ([[weightedSample]],
    * [[graft.recommend.Recommenders.randomScores]],
    * [[graft.etl.Urm.negativeSample]]): the first 52 bits of
    * md5(parts joined by ":") as a long. Ordering on it is ordering on
    * the uniform draw; [[md5Uniform]] is the scaled (0,1) form. Any
    * change here (substring width, separator) changes every consumer
    * at once instead of silently forking the convention.
    *
    * Parts must be NON-NULL: concat_ws silently drops null arguments,
    * so md5Bits52(seed, null, i) would alias md5Bits52(seed, i) and a
    * null sampling key would silently collapse draws. Each part is
    * null-guarded with raise_error so the bug surfaces instead of
    * biasing the sample; non-null draws are byte-identical to the
    * unguarded form, so every existing oracle twin still matches. */
  def md5Bits52(parts: Column*): Column = {
    val guarded = parts.map(p =>
      when(p.isNull, raise_error(lit("md5Bits52: null draw part")))
        .otherwise(p.cast("string")))
    conv(substring(md5(concat_ws(":", guarded: _*)), 1, 13), 16, 10)
      .cast("long")
  }

  /** (first 52 md5 bits + ½) / 2⁵² — a uniform draw in (0, 1), exactly
    * reproducible on any engine. */
  def md5Uniform(parts: Column*): Column =
    (md5Bits52(parts: _*).cast("double") + 0.5) / 4503599627370496.0

  /** Weighted sampling WITHOUT replacement, k per stratum — the
    * Efraimidis–Spirakis A-Res scheme: each row draws u ∈ (0,1) and the
    * k rows with the largest u^(1/w) win, which selects with
    * probability proportional to `weight` (token-budget-proportional
    * corpus sampling). One scan + one per-stratum top-k window — no
    * global state, no rejection loop.
    *
    * Randomness is md5(id) (seedless-reproducible, like
    * [[stratifiedSample]]): u = (first 52 hash bits + ½)/2⁵², ranked by
    * ln(u)/w (monotone in u^(1/w)), rounded to 6 with an id tie-break
    * so any engine ranks identically. */
  def weightedSample(df: DataFrame, id: Column, stratum: Column,
                     weight: Column, k: Int): DataFrame = {
    val u = md5Uniform(id) // md5(id) — single-part, no seed, as documented
    val key = round(log(u) / weight, 6)
    val w = Window.partitionBy(stratum).orderBy(col("_key").desc, id)
    df.withColumn("_key", key)
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
      .drop("_key", "_rk")
  }

  /** Per-group percentile band of `value`: exact linear-interpolation
    * percentiles (Spark's `percentile` — same definition as SQL
    * `quantile_cont`), one grouped aggregate, #groups output rows.
    * The quality-trimming pre-pass of corpus filtering (drop length /
    * score outliers per source before training). */
  def quantileBounds(df: DataFrame, group: Column, value: Column,
                     lo: Double, hi: Double): DataFrame =
    df.groupBy(group.as("g"))
      .agg(percentile(value, lit(lo)).as("p_lo"),
           percentile(value, lit(hi)).as("p_hi"))

  /** Target-mixture resampling (the DoReMi/data-mixing step of a
    * pretraining build): given target DOMAIN SHARES of a total token
    * budget, compute each domain's keep rate
    *   rate(d) = min(1, share(d)·budget / observedTokens(d))
    * and apply it with the deterministic md5-bucket rule of
    * [[stratifiedSample]] — the same rows survive on any engine and
    * any re-run, so the mixture is reproducible corpus-wide. Domains
    * whose corpus mass falls short of their target keep everything
    * (rate capped at 1 — upsampling is a repeat-factor concern, out of
    * scope here). The observed-token aggregate is #domains rows,
    * broadcast; the decision is a narrow scan.
    *
    * The threshold is floor(rate·2³²) compared against the first 8 md5
    * hex digits — floor, not a double→long cast, because engines
    * disagree on cast rounding (DuckDB rounds, the JVM truncates). */
  def mixtureSample(docs: DataFrame, id: Column, domain: Column,
                    weight: Column, targetShares: Map[String, Double],
                    budgetTokens: Long): DataFrame = {
    val observed = docs.groupBy(domain.as("g"))
      .agg(sum(weight.cast("long")).as("tok"))
    val share = targetShares.foldLeft(lit(0.0)) { case (acc, (d, s)) =>
      when(col("g") === d, lit(s)).otherwise(acc)
    }
    val rates = observed
      .withColumn("rate",
        least(lit(1.0), share * budgetTokens / col("tok")))
      .withColumn("thr",
        floor(col("rate") * lit(4294967296.0)).cast("long"))
    docs.join(broadcast(rates), domain === col("g"))
      .filter(conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
                .cast("long") < col("thr"))
      .drop("g", "rate", "tok")
  }

  /** Temperature-reweighted token-budget allocation with an epoch cap
    * — the water-filling mixture PLANNER that [[mixtureSample]]'s
    * simple rate rule approximates. Target weights follow the
    * multilingual-pretraining convention (Conneau & Lample 2019;
    * XLM-R): w_d ∝ avail_d^(1/τ), upweighting small domains. A domain
    * can be upsampled at most `maxEpochs` passes; budget a saturated
    * domain cannot absorb is re-spread over the unsaturated ones in
    * proportion to their weights. That fixed point is the classic
    * water-filling level λ* with allocation min(maxEpochs·avail_d,
    * w_d·λ*), found in closed form: sort domains by saturation level
    * cap_d/w_d ascending, take the largest prefix k whose own level is
    * ≤ λ(k) = (B − Σ_{i≤k} cap_i) / Σ_{i>k} w_i.
    *
    * The whole plan is declarative — one corpus-scan aggregate (the
    * only data-sized stage), then window cumulative sums over the
    * #domains-row frame and two broadcast scalars; nothing iterative,
    * nothing on the driver. Cross-engine determinism: the
    * transcendental pow is rounded to 6 decimals and every running sum
    * accumulates exact DECIMAL(28,6); divisions are then identical
    * IEEE ops on identical operands.
    *
    * Returns one row per domain: avail tokens, target weight, granted
    * tokens, epochs (= granted/avail ≤ maxEpochs), realized share. */
  def tokenBudgetPlan(docs: DataFrame, domain: Column, tokens: Column,
                      budgetTokens: Double, invTemperature: Double,
                      maxEpochs: Double): DataFrame = {
    // module validation convention (see leakageSafeSplit): reject the
    // degenerate parameterizations that would otherwise surface as
    // NULL/NaN rows downstream — budget ≤ 0 turns the λ(0) fallback
    // into negative allocations, and budget 0 makes totA = 0 so
    // realized_wt divides by zero
    require(budgetTokens > 0.0, s"budgetTokens $budgetTokens must be > 0")
    require(invTemperature >= 0.0,
            s"invTemperature $invTemperature must be >= 0")
    require(maxEpochs > 0.0, s"maxEpochs $maxEpochs must be > 0")
    val dom = docs.groupBy(domain.as("domain"))
      .agg(sum(tokens.cast("long")).as("avail"))
    val w = dom.withColumn("sw",
      round(pow(col("avail").cast("double"), lit(invTemperature)), 6)
        .cast("decimal(28,6)"))
    val tot = w.agg(sum("sw").as("bigW"))
    val r = CacheScope.persist(w.crossJoin(broadcast(tot))
      .withColumn("wt",
        col("sw").cast("double") / col("bigW").cast("double"))
      .withColumn("cap", lit(maxEpochs) * col("avail"))
      .withColumn("sat_level", col("cap") / col("wt")))
    val ord = Window.orderBy(col("sat_level"), col("domain"))
    val s = r
      .withColumn("rn", row_number().over(ord))
      .withColumn("cumcap", sum(col("cap").cast("decimal(28,6)")).over(ord))
      .withColumn("cumsw", sum(col("sw")).over(ord))
      .withColumn("lam",
        when((col("bigW") - col("cumsw")).cast("double") > 0.0,
          (lit(budgetTokens) - col("cumcap").cast("double")) *
            col("bigW").cast("double") /
            (col("bigW") - col("cumsw")).cast("double"))
          .otherwise(lit(-1.0)))
    // λ* = λ at the LARGEST consistent saturated prefix; empty set
    // (budget below every saturation level) falls back to λ(0) = B.
    val lev = s.filter(col("sat_level") <= col("lam"))
      .agg(max(struct(col("rn"), col("lam"))).as("m"))
      .select(coalesce(col("m.lam"), lit(budgetTokens)).as("lamstar"))
    val alloc = CacheScope.persist(r.crossJoin(broadcast(lev))
      .withColumn("a6",
        round(least(col("cap"), col("wt") * col("lamstar")), 6)
          .cast("decimal(28,6)")))
    val ta = alloc.agg(sum("a6").as("totA"))
    alloc.crossJoin(broadcast(ta))
      .select(col("domain"), col("avail"),
        round(col("wt"), 6).as("target_wt"),
        round(col("a6").cast("double"), 6).as("alloc_tokens"),
        round(col("a6").cast("double") / col("avail"), 6).as("epochs"),
        round(col("a6").cast("double") / col("totA").cast("double"), 6)
          .as("realized_wt"))
  }

  /** Epoch-aware mixture MATERIALIZATION — the repeat-factor
    * upsampling [[mixtureSample]] declares out of scope, applied from
    * a [[tokenBudgetPlan]] row set: a domain granted `epochs` passes
    * emits ⌊epochs⌋ full copies of every document plus one more with
    * probability frac(epochs), decided by the engine's deterministic
    * md5Uniform(seed, doc_id) draw — documents stay whole (the
    * fractional epoch drops documents, never truncates one), and the
    * expected materialized tokens per domain equal the plan's
    * alloc_tokens exactly (⌊e⌋·avail + frac(e)·avail = e·avail);
    * realized tokens differ only by the binomial noise of the
    * per-document draws.
    *
    * Scale shape: the plan frame is #domains rows and broadcasts; the
    * corpus side is one scan with a fan-out bounded by ⌈maxEpochs⌉ —
    * NO shuffle anywhere, so the materializer runs at scan speed on
    * any corpus (the explode is the row-repeat, not a join). Output
    * one row per (document, rep ∈ 1..n_rep) with the domain and token
    * count carried for downstream packing. Reproducible on any
    * engine and any partitioning, like every draw in the engine. */
  def materializeMixturePlan(docs: DataFrame, id: Column,
                             domain: Column, tokens: Column,
                             plan: DataFrame, seed: Long = 7L)
      : DataFrame = {
    val p = plan.select(col("domain"), col("epochs"))
    val joined = docs.select(id.as("doc_id"), domain.as("domain"),
                             tokens.cast("long").as("n_tokens"))
      .join(broadcast(p), Seq("domain"))
    val nFull = floor(col("epochs")).cast("long")
    val frac = col("epochs") - floor(col("epochs"))
    val extra = when(md5Uniform(lit(seed), col("doc_id")) < frac, 1L)
      .otherwise(0L)
    joined
      .withColumn("n_rep", nFull + extra)
      .filter(col("n_rep") >= 1L)
      .select(col("doc_id"), col("domain"), col("n_tokens"),
              col("n_rep"),
              explode(sequence(lit(1L), col("n_rep"))).as("rep"))
  }

  /** Deterministic two-level epoch shuffle (the shuffle-block scheme of
    * streaming training loaders, e.g. MosaicML StreamingDataset's
    * block shuffles): documents are grouped into consecutive
    * `blockSize`-document blocks IN SOURCE ORDER, then the block order
    * and the order within each block are both shuffled by seeded md5
    * keys. Every epoch position is a pure function of (seed, doc set) —
    * partition-count-invariant, resumable mid-epoch, and reproducible
    * across runs, which a `rand()` sort is not.
    *
    * Why two-level instead of one global sort by a random key: blocks
    * are contiguous runs of the source order, so a trainer streaming
    * positions [offset, offset+n) reads each source shard sequentially
    * (block-sized IO locality), while block-order shuffling still mixes
    * the corpus globally — the standard locality/randomness trade of
    * streaming loaders.
    *
    * Scale shape: the source rank comes from the two-pass
    * range-partitioned rank ([[graft.core.Ranking]] — no single-reducer
    * window); the intra-block row_number windows on the block key with
    * ≤ blockSize rows per group; block offsets are a prefix sum over
    * the #blocks frame (corpus/blockSize rows — reduced, but NOT
    * broadcast: at 10¹¹ docs it is still tens of millions of rows, so
    * it joins back co-partitioned on block instead).
    *
    * Returns (doc_id, block_id, block_ord, epoch_pos): epoch_pos is a
    * bijection onto 1..N and a block's documents occupy a contiguous
    * position run. */
  def epochBlockShuffle(docs: DataFrame, id: Column, blockSize: Int,
                        seed: Long): DataFrame = {
    require(blockSize >= 1, s"blockSize must be >= 1, got $blockSize")
    val ranked = graft.core.Ranking.withGlobalRank(
      docs.select(id.as("doc_id")), Seq(col("doc_id")), "src_rank")
    val blocked = CacheScope.persist(
      ranked.withColumn("block_id",
        ((col("src_rank") - 1) / blockSize).cast("long")))
    val intraW = Window.partitionBy("block_id")
      .orderBy(col("ikey"), col("doc_id"))
    val intra = blocked
      .withColumn("ikey",
        md5(concat_ws(":", lit(seed), lit("i"), col("doc_id"))))
      .withColumn("intra", row_number().over(intraW).cast("long"))
    val blocks = blocked.groupBy("block_id")
      .agg(count(lit(1)).as("n"))
      .withColumn("bkey",
        md5(concat_ws(":", lit(seed), lit("b"), col("block_id"))))
    val offsets = graft.core.Ranking
      .withGlobalRankAndCumSum(blocks, Seq(col("bkey"), col("block_id")),
                               col("n"), "block_ord", "cum")
      .select(col("block_id"), col("block_ord"),
              (col("cum") - col("n")).as("off"))
    intra.join(offsets, Seq("block_id"))
      .select(col("doc_id"), col("block_id"), col("block_ord"),
              (col("off") + col("intra")).as("epoch_pos"))
  }

  /** Exact distributed ROC-AUC via the Mann–Whitney U statistic with
    * midrank tie handling — THE evaluation primitive for
    * classifier-based corpus filtering (is the quality/langid model's
    * score actually separating the classes it gates on?). AUC equals
    * the probability a random positive out-scores a random negative,
    * computed as (Σ_pos avgrank − n_pos(n_pos+1)/2) / (n_pos·n_neg);
    * tied scores take the midrank of their run, the textbook
    * correction without which duplicate scores bias the estimate.
    *
    * Exactness: everything stays integer until one final division —
    * per-value 2·avgrank = 2·cumcount − (n−1) — so the result is
    * bit-identical across engines with zero rounding. Scale shape:
    * one groupBy(score) reduction (the distinct-score axis may remain
    * corpus-sized for continuous scores), then the two-pass
    * range-partitioned cumulative count ([[graft.core.Ranking]] — no
    * single-reducer ORDER BY window), then a scalar aggregate.
    * Degenerate inputs (a single class) yield auc = NULL, not a
    * division crash.
    *
    * Returns one row: (n_pos, n_neg, auc). */
  def aucRoc(df0: DataFrame, score: Column, label: Column): DataFrame = {
    val df = df0.select(score.cast("double").as("s"),
                        label.cast("boolean").cast("int").as("y"))
      .filter(col("s").isNotNull && col("y").isNotNull)
    val byScore = df.groupBy("s")
      .agg(count(lit(1)).as("n"), sum("y").as("np"))
    val ranked = graft.core.Ranking.withGlobalRankAndCumSum(
      byScore, Seq(col("s")), col("n"), "vrank", "cum")
    ranked
      .select(
        (col("np") * (lit(2) * col("cum") - (col("n") - 1))).as("pos2r"),
        col("np"), (col("n") - col("np")).as("nn"))
      .agg(sum("np").as("n_pos"), sum("nn").as("n_neg"),
           sum("pos2r").as("s2r"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          (col("s2r") - col("n_pos") * (col("n_pos") + 1))
            .cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg")))
          .as("auc"))
  }

  /** k-anonymity audit over a quasi-identifier combination: the group
    * sizes plus a violation flag for groups smaller than k — the
    * re-identification check of training-data governance (a
    * quasi-identifier combo shared by fewer than k rows singles
    * individuals out). One grouped count at any corpus size. */
  def kAnonymity(df: DataFrame, keys: Seq[String], k: Int): DataFrame = {
    require(k >= 2, s"k-anonymity needs k >= 2, got $k")
    require(keys.nonEmpty, "need at least one quasi-identifier column")
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("violates", (col("n") < k).cast("int"))
  }

  /** k-anonymity enforcement by suppression: drop every row whose
    * quasi-identifier combination has fewer than k members (the
    * standard small-group suppression that makes the released frame
    * k-anonymous on those keys). The group frame is the REDUCED
    * key-combination axis, joined back CO-PARTITIONED on the keys —
    * not broadcast, since a high-cardinality quasi-identifier
    * combination is itself corpus-sized. */
  def suppressBelowK(df: DataFrame, keys: Seq[String], k: Int)
      : DataFrame = {
    val keep = kAnonymity(df, keys, k)
      .filter(col("violates") === 0)
      .drop("n", "violates")
    df.join(keep, keys)
  }

  /** Robust per-group outlier detection via MAD (median absolute
    * deviation): med = exact median of `value`, mad = exact median of
    * |value − med|, outlier ⇔ |value − med| > k · 1.4826 · mad (the
    * normal-consistency constant; Hampel's rule at k = 3). Unlike
    * mean/stddev z-scores, both statistics have a 50% breakdown point
    * — the contamination this filter exists to find cannot corrupt its
    * own threshold. Two grouped percentile aggregates + one broadcast
    * join: three stages at any corpus size, #groups broadcast rows. */
  def madOutliers(df0: DataFrame, group: Column, value: Column,
                  k: Double = 3.0): DataFrame = {
    val df = CacheScope.persist(df0)
    val med = df.groupBy(group.as("g"))
      .agg(percentile(value, lit(0.5)).as("med"))
    val mad = df.join(broadcast(med), group === col("g")).drop("g")
      .groupBy(group.as("g"), col("med"))
      .agg(percentile(abs(value - col("med")), lit(0.5)).as("mad"))
    df.join(broadcast(mad), group === col("g")).drop("g")
      .withColumn("is_outlier",
        (abs(value - col("med")) > lit(k) * lit(1.4826) * col("mad"))
          .cast("int"))
  }

  /** Keep only rows inside their group's [lo, hi] percentile band of
    * `value`. Bounds are #groups rows — always broadcastable — so the
    * trim is scan + broadcast join at any corpus size. The input feeds
    * both the bounds aggregate and the filtered scan, so it is
    * persisted once (the repo's multi-consumer discipline). */
  def quantileTrim(df0: DataFrame, group: Column, value: Column,
                   lo: Double, hi: Double): DataFrame = {
    val df = CacheScope.persist(df0)
    df.join(broadcast(quantileBounds(df, group, value, lo, hi)),
            group === col("g"))
      .filter(value >= col("p_lo") && value <= col("p_hi"))
      .drop("g", "p_lo", "p_hi")
  }

  /** Equi-depth histogram (quantile binning): `nBins` bins bounded by
    * the exact (nBins−1) interior percentiles of `value`; a row's bin
    * is the number of edges strictly below its value. The feature-
    * bucketing twin of the equi-width [[histogram]]: one percentile
    * aggregate (a scalar row, broadcast) + one scan — two stages at
    * any size. */
  def equidepthHistogram(df0: DataFrame, value: Column, nBins: Int)
      : DataFrame = {
    require(nBins >= 2, "need at least two bins")
    // the input feeds the edge aggregate AND the binning scan
    val df = CacheScope.persist(df0)
    val edgeExprs = (1 until nBins).map(i =>
      percentile(value, lit(i.toDouble / nBins)).as(s"e$i"))
    val edges = df.agg(edgeExprs.head, edgeExprs.tail: _*)
    val bin = (1 until nBins)
      .map(i => (value > col(s"e$i")).cast("int"))
      .reduce(_ + _)
    df.crossJoin(broadcast(edges))
      .withColumn("bin", bin)
      .groupBy("bin")
      .agg(count(lit(1)).as("n"))
  }

  /** Mergeable distinct-count sketches: per-group HLL sketches plus
    * their union — THE cardinality primitive at corpus scale, where
    * exact `COUNT(DISTINCT)` costs a full shuffle of the key universe
    * per grouping. Sketches are bytes: they aggregate map-side,
    * persist (store per-partition/day sketches, merge at query time),
    * and union without rescanning — the property that turns "distinct
    * users per day → per month" into a byte-blob merge instead of a
    * 100 TB re-aggregation. Built on Spark's Apache DataSketches
    * functions; estimates are within ~1.6% (lgK 12) of exact. */
  def distinctSketch(df: DataFrame, group: Column, key: Column)
      : DataFrame =
    // ONE scan, ONE aggregate — no exact countDistinct anywhere: the
    // whole point of the sketch is to never pay the exact-distinct
    // shuffle (accuracy is pinned by the StatsSpec fixture, which
    // computes its own exact yardstick). The single-scan path IS the
    // one-increment case of the incremental path — one definition of
    // the evaluation tail, so the two cannot fork.
    distinctUnionEstimate(distinctSketchFrame(df, group, key))

  /** The PERSISTABLE increment form of [[distinctSketch]]: one row per
    * group with the serialized HLL sketch as a binary column — each
    * corpus ingest stores its own frame, and
    * [[distinctUnionEstimate]] evaluates the union of any number of
    * them without rescanning an increment (the [[graft.stats.Sketches
    * .kllSketchFrame]] convention for the distinct-count axis). */
  def distinctSketchFrame(df: DataFrame, group: Column, key: Column)
      : DataFrame =
    df.groupBy(group.as("g")).agg(hll_sketch_agg(key).as("sk"))

  /** Union-evaluate a union of [[distinctSketchFrame]]s: per-group
    * sketches union across increments (register-wise max —
    * associative, order-free, and duplicate-insensitive, so re-sending
    * an increment cannot overcount), then the same output shape as
    * [[distinctSketch]] including the merged global row. */
  def distinctUnionEstimate(frames: DataFrame): DataFrame = {
    val perGroup = CacheScope.persist(
      frames.groupBy("g").agg(hll_union_agg(col("sk")).as("sk")))
    // the global row comes from MERGING the per-group sketches — the
    // mergeability property itself, not a rescan of the raw data. It
    // is flagged by `is_total` (g = null), never by a sentinel value
    // that could collide with a real group.
    val total = perGroup
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .select(lit(null).cast(perGroup.schema("g").dataType).as("g"),
              lit(true).as("is_total"), col("est"))
    perGroup
      .select(col("g"), lit(false).as("is_total"),
              hll_sketch_estimate(col("sk")).as("est"))
      .unionByName(total)
  }

  /** Gap-based sessionization: a new session starts after `gapMs`
    * milliseconds of inactivity. Batch twin of the streaming
    * session-window operator. Exact integer epoch-ms arithmetic; `tie`
    * must make the per-user ordering total (e.g. an event id). */
  def sessionize(events: DataFrame, user: Column, ts: Column,
                 tie: Column, gapMs: Long): DataFrame = {
    // µs-epoch values (<2^53) are exact in double, so floor-div is exact
    val ms = floor(unix_micros(ts) / 1000).cast("long")
    val byUser = Window.partitionBy(user).orderBy(col("ms"), tie)
    events
      .withColumn("ms", ms)
      .withColumn("prev_ms", lag(col("ms"), 1).over(byUser))
      .withColumn("new_session",
        (col("prev_ms").isNull ||
         col("ms") - col("prev_ms") > gapMs).cast("int"))
      .withColumn("session_id", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** EXACT two-sample Kolmogorov–Smirnov distance between the `value`
    * distributions of two frames — the distribution-drift monitor of a
    * continuously rebuilt corpus (has the length/score/quality profile
    * of this snapshot moved against the last one?).
    *
    *   D = sup_x |F_a(x) − F_b(x)|
    *
    * evaluated after each DISTINCT value (the tie-correct form: the
    * ecdf step consumes every tied row before the comparison). Scale
    * shape: one groupBy collapses the inputs to their distinct values
    * with per-side counts, then ONE windowless two-pass global cumsum
    * ([[graft.core.Ranking]]) sweeps the merged value axis — both side
    * counts are packed into a single long (`ca·(n_b+1) + cb`, exact
    * because cum_b ≤ n_b) so one pass carries both running totals; no
    * single-reducer window, nothing value-axis-sized on the driver.
    * Returns one row (ks, n_a, n_b), ks rounded to 6 decimals; empty
    * when either side is empty (no distribution to compare). */
  def ksDrift(a: DataFrame, b: DataFrame, value: Column): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    def side(df: DataFrame, ca: Int, cb: Int): DataFrame =
      df.select(value.cast("double").as("v"))
        .filter($"v".isNotNull)
        .withColumn("ca", lit(ca.toLong)).withColumn("cb", lit(cb.toLong))
    val grouped = graft.core.CacheScope.persist(
      side(a, 1, 0).unionByName(side(b, 0, 1))
        .groupBy("v")
        .agg(sum("ca").as("ca"), sum("cb").as("cb")))
    val totals = grouped.agg(sum("ca"), sum("cb")).head()
    if (totals.isNullAt(0) || totals.isNullAt(1) ||
        totals.getLong(0) == 0L || totals.getLong(1) == 0L)
      return Seq.empty[(Double, Long, Long)].toDF("ks", "n_a", "n_b")
    val na = totals.getLong(0)
    val nb = totals.getLong(1)
    val big = nb + 1
    // the packed form needs na·(nb+1)+nb ≤ Long.Max; beyond that
    // (≈3e9 rows PER SIDE) fall back to two cumsum sweeps — twice the
    // range shuffles, exact at any scale, never a silent wraparound
    val fitsPacked = na <= (Long.MaxValue - nb) / big
    val withCums =
      if (fitsPacked)
        graft.core.Ranking.withGlobalRankAndCumSum(
            grouped.withColumn("packed", col("ca") * big + col("cb")),
            Seq(col("v")), col("packed"), "rk", "cum")
          .withColumn("cum_a", expr(s"cum div $big"))
          .withColumn("cum_b", col("cum") % big)
      else
        graft.core.Ranking.withGlobalRankAndCumSum(
          graft.core.Ranking.withGlobalRankAndCumSum(
            grouped, Seq(col("v")), col("ca"), "rk_a", "cum_a"),
          Seq(col("v")), col("cb"), "rk_b", "cum_b")
    withCums
      .select(max(abs(
        col("cum_a").cast("double") / na -
        col("cum_b").cast("double") / nb)).as("d"))
      .select(round(col("d"), 6).as("ks"),
              lit(na).as("n_a"), lit(nb).as("n_b"))
  }

  /** Population stability index between two snapshots over `bins`
    * equal-width bins of [lo, hi) — the industry-standard BINNED drift
    * score ([[ksDrift]] is its exact unbinned complement; PSI is what
    * production monitors threshold at 0.1/0.25):
    *
    *   PSI = Σ_b (p_b − q_b) · ln(p_b / q_b)
    *
    * with ε-smoothed shares (p = share_a + ε, q = share_b + ε) so a
    * bin populated on only one side stays finite. Out-of-range values
    * clamp into the edge bins (min/max capture); nulls drop. Scale
    * shape: both inputs collapse in ONE union-tagged groupBy to a
    * bins-sized frame (the ksDrift trick), so nothing value-axis-sized
    * exists anywhere and the final reduction is over `bins` rows. A
    * bin empty on BOTH sides contributes (ε−ε)·ln(1) = 0, so absent
    * bins need no densification. Returns one row (psi, n_a, n_b), psi
    * rounded to 6 decimals; empty when either side is empty. */
  def psiDrift(a: DataFrame, b: DataFrame, value: Column, bins: Int,
               lo: Double, hi: Double, eps: Double = 1e-6): DataFrame = {
    require(bins >= 2, s"need >= 2 bins, got $bins")
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    require(eps > 0, "eps must be positive")
    val spark = a.sparkSession
    import spark.implicits._
    val width = (hi - lo) / bins
    def side(df: DataFrame, ca: Int, cb: Int): DataFrame =
      df.select(value.cast("double").as("v"))
        .filter($"v".isNotNull)
        .select(least(lit(bins - 1), greatest(lit(0),
            floor((col("v") - lit(lo)) / lit(width)).cast("int")))
          .as("bin"))
        .withColumn("ca", lit(ca.toLong)).withColumn("cb", lit(cb.toLong))
    val grouped = graft.core.CacheScope.persist(
      side(a, 1, 0).unionByName(side(b, 0, 1))
        .groupBy("bin")
        .agg(sum("ca").as("ca"), sum("cb").as("cb")))
    val totals = grouped.agg(sum("ca"), sum("cb")).head()
    if (totals.isNullAt(0) || totals.isNullAt(1) ||
        totals.getLong(0) == 0L || totals.getLong(1) == 0L)
      return Seq.empty[(Double, Long, Long)].toDF("psi", "n_a", "n_b")
    val na = totals.getLong(0)
    val nb = totals.getLong(1)
    val p = col("ca").cast("double") / na + eps
    val q = col("cb").cast("double") / nb + eps
    grouped
      .select(((p - q) * log(p / q)).as("term"))
      .agg(round(sum("term"), 6).as("psi"))
      .select(col("psi"), lit(na).as("n_a"), lit(nb).as("n_b"))
  }
}
