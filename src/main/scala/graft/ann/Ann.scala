package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  * Two paths:
  *  - brute-force cosine top-k — the exact baseline; per-pair dot
  *    products as a codegen'd `aggregate(zip_with(...))` fold, queries
  *    broadcast against the corpus, so the corpus side never shuffles;
  *  - random-hyperplane LSH — signatures from md5-seeded ±1 planes
  *    (deterministic, engine-independent), bucket join bounds the
  *    verification join to same-bucket pairs: the 100 TB scale path.
  */
object Ann {

  /** Sequential-order double-accumulated dot product of two array
    * columns, via the codegen'd native expression
    * (graft.functions.DotProduct — registered by core.Tables /
    * SparkSpec). Bit-identical to [[dotHof]]. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dot_product(a, b)

  /** Higher-order-function reference implementation of [[dot]]
    * (aggregate over zip_with) — same summation order, kept as the
    * cross-check for the native expression. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
              lit(0.0), (acc, z) => acc + z)

  /** Squared L2 norm of an array column. */
  def norm2(a: Column): Column = dot(a, a)

  /** Brute-force cosine top-k: `queries` and `corpus` are
    * (id, embedding) frames; returns (qid, vid, cos, rank) with
    * cosine rounded to 6 decimals before ranking so ties resolve
    * deterministically by neighbor id. */
  def bruteForceCosineTopK(queries: DataFrame, corpus: DataFrame,
                           k: Int): DataFrame = {
    val q = queries.select(col("id").as("qid"), col("embedding").as("qv"))
    val c = corpus.select(col("id").as("vid"), col("embedding").as("cv"))
    val pairs = c.join(broadcast(q), col("qid") =!= col("vid"))
    val cos = round(
      dot(col("qv"), col("cv")) /
        (sqrt(norm2(col("qv"))) * sqrt(norm2(col("cv")))), 6)
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("vid"))
    pairs.withColumn("cos", cos)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "vid", "cos", "rank")
  }

  /** md5-derived ±1 hyperplane component table: (plane, dim, c). */
  def planeTable(spark: org.apache.spark.sql.SparkSession,
                 nPlanes: Int, dim: Int): DataFrame = {
    import spark.implicits._
    (0 until nPlanes).flatMap(p => (0 until dim).map(d => (p, d)))
      .toDF("p", "d")
      .withColumn("c",
        (conv(substring(md5(concat_ws(":", col("p"), col("d"))), 1, 15),
              16, 10).cast("long") % 2) * 2 - 1)
  }

  /** Random-hyperplane LSH bucket per vector: bit_p = sign(Σ c(p,d)·v_d),
    * bucket = Σ bit_p · 2^p. One explode + broadcast join + two groupBys:
    * linear in corpus size. */
  def lshBuckets(vectors: DataFrame, planes: DataFrame): DataFrame = {
    val exploded = vectors
      .select(col("id"), posexplode(col("embedding")).as(Seq("d", "v")))
      .withColumn("v", col("v").cast("double"))
    exploded.join(broadcast(planes), "d")
      .groupBy("id", "p")
      .agg(sum(col("c") * col("v")).as("proj"))
      .withColumn("bit", (col("proj") > 0).cast("long"))
      .groupBy("id")
      .agg(sum(expr("shiftleft(bit, p)")).as("bucket"))
  }

  /** LSH-bucketed ANN: same-bucket candidates, exact cosine on the
    * candidates only, per-query top-k. */
  def lshCosineTopK(queries: DataFrame, corpus: DataFrame,
                    planes: DataFrame, k: Int): DataFrame = {
    val buckets = lshBuckets(corpus, planes)
    val qb = buckets.join(queries.select(col("id")), Seq("id"), "left_semi")
      .select(col("id").as("qid"), col("bucket"))
    val cb = buckets.select(col("id").as("vid"), col("bucket"))
    val cand = qb.join(cb, "bucket").filter(col("qid") =!= col("vid"))
    val q = queries.select(col("id").as("qid"), col("embedding").as("qv"))
    val c = corpus.select(col("id").as("vid"), col("embedding").as("cv"))
    val scored = cand.join(broadcast(q), "qid").join(c, "vid")
      .withColumn("cos", round(
        dot(col("qv"), col("cv")) /
          (sqrt(norm2(col("qv"))) * sqrt(norm2(col("cv")))), 6))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("vid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "vid", "cos", "rank")
  }

  /** Multi-probe variant of [[lshCosineTopK]] (Lv et al.'s multi-probe
    * LSH, the hyperplane case): each query probes its own bucket PLUS
    * the `nPlanes` buckets at Hamming distance 1 (one sign bit
    * flipped) — a near neighbor separated from the query by exactly
    * one hyperplane lands in such a bucket, which the single-probe
    * join misses by construction. Probe volume is (nPlanes+1)× the
    * QUERY side only; the corpus index is built and keyed once,
    * untouched — at 100 TB the recall fix costs a wider (still tiny)
    * probe table, not a second corpus pass. */
  def lshCosineTopKMultiProbe(queries: DataFrame, corpus: DataFrame,
                              planes: DataFrame, nPlanes: Int,
                              k: Int): DataFrame = {
    val qb0 = lshBuckets(queries, planes)
      .select(col("id").as("qid"), col("bucket"))
    // bucket ^ 0 (self) plus each single-bit flip
    val flips = lit(0L) +: (0 until nPlanes).map(p => lit(1L << p))
    val qb = qb0
      .withColumn("flip", explode(array(flips: _*)))
      .select(col("qid"), expr("bucket ^ flip").as("bucket"))
    val cb = lshBuckets(corpus, planes)
      .select(col("id").as("vid"), col("bucket"))
    val cand = qb.join(cb, "bucket")
      .filter(col("qid") =!= col("vid"))
      .select("qid", "vid").distinct()
    val q = queries.select(col("id").as("qid"), col("embedding").as("qv"))
    val c = corpus.select(col("id").as("vid"), col("embedding").as("cv"))
    val scored = cand.join(broadcast(q), "qid").join(c, "vid")
      .withColumn("cos", round(
        dot(col("qv"), col("cv")) /
          (sqrt(norm2(col("qv"))) * sqrt(norm2(col("cv")))), 6))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("vid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "vid", "cos", "rank")
  }

  /** IVF coarse quantizer: `nCells` centroids drawn deterministically
    * from the corpus by md5(id) order — a hash-seeded sample instead of
    * Lloyd-trained means, which keeps the quantizer a pure function of
    * the data (engine-independent, oracle-checkable) while preserving
    * the IVF structure. At 100 TB the centroid table is nCells·dim —
    * always broadcastable. */
  def ivfCentroids(corpus: DataFrame, nCells: Int): DataFrame =
    corpus.select(col("id").as("cid"), col("embedding").as("centroid"),
                  md5(col("id").cast("string")).as("h"))
      .orderBy(col("h"), col("cid")).limit(nCells).drop("h")

  /** Lloyd refinement of [[ivfCentroids]]: `iters` distributed k-means
    * steps — assign each vector to its nearest centroid, replace each
    * centroid with its members' mean. Per iteration: one broadcast
    * assignment pass + one (cell, dim)-keyed aggregation; nothing
    * bigger than nCells·dim ever sits on one node, so the refinement is
    * as 100 TB-shaped as the assignment itself. Cells that lose all
    * members keep their previous centroid (k never shrinks). Mean
    * aggregation is float-summation-order dependent, so the refined
    * quantizer is for recall, not cross-engine oracles — q88 stays on
    * the hash-sampled quantizer, which IS oracle-checkable. */
  def ivfCentroidsLloyd(corpus: DataFrame, nCells: Int,
                        iters: Int): DataFrame = {
    var cents = ivfCentroids(corpus, nCells)
    for (_ <- 0 until iters) {
      val assign = ivfAssign(corpus, cents, 1)
        .select(col("id"), col("cell").as("cid"))
      val means = corpus.join(assign, "id")
        .select(col("cid"), posexplode(col("embedding")).as(Seq("d", "v")))
        .groupBy("cid", "d").agg(avg(col("v").cast("double")).as("m"))
        .groupBy("cid")
        .agg(transform(array_sort(collect_list(struct(col("d"), col("m")))),
                       s => s.getField("m")).as("refined"))
      cents = cents.join(means, Seq("cid"), "left")
        .select(col("cid"),
                coalesce(col("refined"), col("centroid")).as("centroid"))
    }
    cents
  }

  /** Cell assignment: nearest centroid by cosine (rounded to 6 decimals
    * so the argmax is stable across engines; ties break on centroid
    * id). One broadcast join + per-vector argmax window — the corpus
    * never shuffles except by its own cell key. */
  def ivfAssign(vectors: DataFrame, centroids: DataFrame,
                nProbe: Int): DataFrame = {
    val scored = vectors.crossJoin(broadcast(centroids))
      .withColumn("ccos", round(
        dot(col("embedding"), col("centroid")) /
          (sqrt(norm2(col("embedding"))) * sqrt(norm2(col("centroid")))), 6))
    val w = Window.partitionBy("id").orderBy(desc("ccos"), asc("cid"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= nProbe)
      .select(col("id"), col("cid").as("cell"))
  }

  /** IVF ANN: inverted-file search — corpus vectors index into their
    * nearest cell, each query probes its `nProbe` nearest cells, and
    * exact cosine runs only on the probed cells' members (candidate
    * fraction ≈ nProbe/nCells of the corpus). The candidate build is a
    * join co-partitioned on the cell key; scoring mirrors
    * [[bruteForceCosineTopK]]. The third ANN path next to brute force
    * (exact baseline) and LSH (bucket hashing). */
  def ivfCosineTopK(queries: DataFrame, corpus: DataFrame, nCells: Int,
                    nProbe: Int, k: Int): DataFrame =
    ivfCosineTopKWith(queries, corpus, ivfCentroids(corpus, nCells),
                      nProbe, k)

  /** The production IVF sizing default: nCells = max(minCells, ⌊√N⌋) —
    * the standard inverted-file rule (candidate work per query ≈
    * nProbe·N/nCells, so √N cells balances probe cost against cell
    * size; at √N the per-query scan is ~nProbe·√N instead of N). The
    * soak measured the ANN serving path at wall exponent 0.49 under
    * this rule vs super-linear growth at any CONSTANT cell count. One
    * cheap count() prices the rule. Explicit-nCells entry points stay
    * the escape hatch the oracle demos (q88/q162) need: a constant
    * cell count is reproducible across engines and scale factors,
    * while the auto count changes with the corpus. */
  def ivfAutoCells(corpus: DataFrame, minCells: Int = 16): Int =
    math.max(minCells, math.sqrt(corpus.count().toDouble).toInt)

  /** [[ivfCosineTopK]] with the √N auto-sized quantizer — the
    * production default for a corpus whose size the caller doesn't
    * want to reason about. */
  def ivfCosineTopKAuto(queries: DataFrame, corpus: DataFrame,
                        nProbe: Int, k: Int): DataFrame =
    ivfCosineTopK(queries, corpus, ivfAutoCells(corpus), nProbe, k)

  /** [[ivfCosineTopK]] against caller-supplied centroids (e.g. the
    * Lloyd-refined quantizer from [[ivfCentroidsLloyd]]). */
  def ivfCosineTopKWith(queries: DataFrame, corpus: DataFrame,
                        centroids: DataFrame, nProbe: Int,
                        k: Int): DataFrame = {
    val cells = ivfAssign(corpus, centroids, 1)
      .select(col("id").as("vid"), col("cell"))
    val probes = ivfAssign(queries, centroids, nProbe)
      .select(col("id").as("qid"), col("cell"))
    val cand = probes.join(cells, "cell")
      .filter(col("qid") =!= col("vid"))
      .select("qid", "vid").distinct()
    val q = queries.select(col("id").as("qid"), col("embedding").as("qv"))
    val c = corpus.select(col("id").as("vid"), col("embedding").as("cv"))
    val scored = cand.join(broadcast(q), "qid").join(c, "vid")
      .withColumn("cos", round(
        dot(col("qv"), col("cv")) /
          (sqrt(norm2(col("qv"))) * sqrt(norm2(col("cv")))), 6))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("vid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "vid", "cos", "rank")
  }

  /** Symmetric int8 quantization of an embedding column: per-vector
    * scale = max|x|/127, q = round(x/scale) — 4× smaller storage and
    * wire volume than float32, the standard compression step before an
    * ANN index is built over a corpus-scale embedding table. Pure
    * codegen'd array HOFs (aggregate + transform), scan speed, no
    * shuffle; dequantization is q·scale. Zero vectors quantize to
    * zeros (scale 0 sentinel). */
  def quantizeInt8(vectors: DataFrame, id: Column, emb: Column)
      : DataFrame =
    vectors
      .withColumn("_ma", aggregate(emb, lit(0.0d),
        (a, x) => greatest(a, abs(x.cast("double")))))
      .select(
        id.as("id"),
        (col("_ma") / 127.0).as("scale"),
        transform(emb, x =>
          when(col("_ma") === 0.0, lit(0))
            .otherwise(round(x.cast("double") / (col("_ma") / 127.0)))
            .cast("byte")).as("q"))

  /** Embedding-cosine near-duplicate pairs (all-pairs within LSH buckets,
    * cosine above threshold) — the embedding leg of the dedup suite. */
  def cosineNearDupPairs(vectors: DataFrame, planes: DataFrame,
                         threshold: Double): DataFrame = {
    val buckets = lshBuckets(vectors, planes)
    val a = buckets.select(col("id").as("a"), col("bucket"))
    val b = buckets.select(col("id").as("b"), col("bucket"))
    val cand = a.join(b, "bucket").filter(col("a") < col("b"))
    val va = vectors.select(col("id").as("a"), col("embedding").as("av"))
    val vb = vectors.select(col("id").as("b"), col("embedding").as("bv"))
    cand.join(va, "a").join(vb, "b")
      .withColumn("cos", round(
        dot(col("av"), col("bv")) /
          (sqrt(norm2(col("av"))) * sqrt(norm2(col("bv")))), 6))
      .filter(col("cos") >= threshold)
      .select("a", "b", "cos")
  }

  /** Johnson–Lindenstrauss random projection to `outDim` dimensions
    * with a deterministic ±1/√outDim matrix (Achlioptas, "Database-
    * friendly random projections", PODS '01): the sign of cell (d, k)
    * is the parity of md5("d_k"), so the matrix is a pure function of
    * the coordinates — reproducible on any engine, nothing stored, no
    * seed. The projection is a NARROW per-row map (nested array HOFs,
    * no shuffle, no UDF): at corpus scale this is the dimensionality
    * cut applied before an ANN index, at scan speed.
    *
    * Returns one row per (id, k) with the projected coordinate —
    * per-term round-to-6 + exact decimal accumulation, so the sum is
    * order-independent and oracle-checkable bit-for-bit. Empty
    * embeddings are dropped (no coordinates → no projection rows),
    * matching the UNNEST-based oracle, which also emits no rows for
    * them. */
  def randomProjection(vectors: DataFrame, id: Column, emb: Column,
                       outDim: Int): DataFrame = {
    def sign(d: Column, k: Column): Column =
      lit(1) - lit(2) * pmod(
        conv(substring(md5(concat(d.cast("string"), lit("_"),
                                  k.cast("string"))), 1, 1), 16, 10)
          .cast("int"), lit(2))
    // the 1/√outDim normalization folds into the PER-TERM rounding:
    // rounding the already-normalized sum would land on exact 5e-7
    // boundaries (six-decimal sum ÷ 4) where Java's HALF_UP and
    // DuckDB's float rounding disagree — measured 26/8000 off-by-1e-6
    // rows before the fold. Normalized terms round at the same 6
    // decimals, the decimal sum is exact, and no final rounding exists
    // to diverge.
    val proj = transform(sequence(lit(0), lit(outDim - 1)), k =>
      aggregate(
        zip_with(emb, sequence(lit(0), size(emb) - 1),
                 (x, d) => round(coalesce(x.cast("double"), lit(0.0)) *
                                   sign(d, k) /
                                   math.sqrt(outDim.toDouble), 6)
                   .cast("decimal(18,6)")),
        lit(java.math.BigDecimal.ZERO).cast("decimal(28,6)"),
        // re-narrow after the widening add: 64 six-decimal terms can
        // never overflow 28 digits, so the cast is lossless
        (acc, term) => (acc + term).cast("decimal(28,6)"))
        .cast("double"))
    vectors
      // an empty embedding has no projection (sequence(0, -1) would
      // DESCEND and null-poison the zip); the oracle's UNNEST likewise
      // emits no rows for it, so the two engines agree by construction
      .filter(size(emb) > 0)
      .select(id.as("id"), posexplode(proj).as(Seq("k", "pv")))
      .select(col("id"), col("k"), col("pv").as("v"))
  }

  /** ANN quality gate: per-query recall of an approximate top-k result
    * against the exact (brute-force) top-k — the acceptance metric
    * every index build runs before it replaces brute force.
    * `exact` defines the query universe, so a query whose candidates
    * the index lost entirely still appears (n_hits = 0) instead of
    * silently vanishing from the average. The denominator is each
    * query's ACTUAL exact-neighbor count, not a fixed k — a query with
    * only 4 true neighbors scored perfectly reports 1.0, not 4/k — and
    * both sides are de-duplicated first so a malformed input (repeated
    * (qid, vid) rows) cannot push recall past 1. One semi-join +
    * per-query counts; all frames are ≤ k·|queries|-sized regardless
    * of corpus size. */
  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame = {
    val ex = exact.select("qid", "vid").distinct()
    val hits = approx.select("qid", "vid").distinct()
      .join(ex, Seq("qid", "vid"), "left_semi")
      .groupBy("qid").agg(count(lit(1)).as("n_hits"))
    ex.groupBy("qid").agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("qid"), "left")
      .na.fill(0L, Seq("n_hits"))
      .withColumn("recall",
        col("n_hits").cast("double") / col("n_exact"))
      .select("qid", "n_hits", "n_exact", "recall")
  }

  /** Embedding-truncation sensitivity curve (the Matryoshka/serving-
    * dimension question: how much retrieval quality survives storing
    * only the first d dimensions?): for each d in `dims`, brute-force
    * cosine top-k over the TRUNCATED vectors is scored against the
    * full-dimension exact top-k with [[recallAtK]], micro-averaged —
    * integer hit/exact totals, so the per-dim recall is an exact
    * engine-stable division. One row per candidate dimension; the
    * full-dimension row scores 1.0 by construction (an in-data sanity
    * check). The full-dim baseline computes once and persists. */
  def truncationRecallCurve(queries: DataFrame, corpus: DataFrame,
                            dims: Seq[Int], k: Int): DataFrame = {
    val full = graft.core.CacheScope.persist(
      bruteForceCosineTopK(queries, corpus, k))
    dims.map { d =>
      val sc = corpus.select(col("id"),
                             slice(col("embedding"), 1, d).as("embedding"))
      val sq = queries.select(col("id"),
                              slice(col("embedding"), 1, d).as("embedding"))
      recallAtK(bruteForceCosineTopK(sq, sc, k), full)
        .agg(count(lit(1)).as("n_queries"),
             sum("n_hits").as("n_hits"),
             sum("n_exact").as("n_exact"))
        .select(lit(d).as("dim"), col("n_queries"), col("n_hits"),
                col("n_exact"),
                round(col("n_hits").cast("double") / col("n_exact"), 6)
                  .as("recall"))
    }.reduce(_ unionByName _)
  }

  /** Each vector split into `m` contiguous subvectors of `subDim` dims:
    * (id, s, sub) rows, one codegen'd slice fan-out, no shuffle. */
  def pqSubvectors(vectors: DataFrame, m: Int, subDim: Int): DataFrame =
    vectors.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(m - 1)),
          s => slice(col("embedding"), s * subDim + 1, lit(subDim))))
        .as(Seq("s", "sub")))

  /** The rounded subspace squared distance — ONE definition shared by
    * encode and the ADC lookup table so the quantizer and the scorer
    * cannot silently desynchronize (the md5Bits52 lesson). NULL when
    * the operand lengths differ (dot_product's contract), which the
    * argmin windows order LAST so a wrong-dimension row surfaces as a
    * visible null qerr instead of an arbitrary lowest-cid code. */
  private def subDist2(sub: Column, cent: Column): Column =
    round(norm2(sub) + norm2(cent) - lit(2.0) * dot(sub, cent), 6)

  /** Eager consistency check: the codebook frame must carry exactly
    * `m` subspaces of `subDim`-dim entries. One aggregate over the
    * m·nCodes-row frame — trivially cheap, and it catches a
    * books-vs-encode parameter mismatch loudly instead of producing
    * garbage codes (dot_product returns NULL on ragged lengths and a
    * naive argmin would then pick an arbitrary code). */
  private def validatePq(codebooks: DataFrame, m: Int,
                         subDim: Int): Unit = {
    require(m > 0 && subDim > 0, "m and subDim must be positive")
    val r = codebooks.agg(
      countDistinct(col("s")).as("ns"),
      min(size(col("cent"))).as("lo"),
      max(size(col("cent"))).as("hi")).head()
    require(r.getLong(0) == m,
      s"codebooks carry ${r.getLong(0)} subspaces, expected m=$m")
    require(r.getInt(1) == subDim && r.getInt(2) == subDim,
      s"codebook entries are ${r.getInt(1)}..${r.getInt(2)}-dim, " +
        s"expected subDim=$subDim")
  }

  /** Product-quantization codebooks (Jégou et al. 2011): per subspace
    * `s`, `nCodes` centroids — the subvectors of [[ivfCentroids]]'
    * hash-sampled rows (REUSED, not re-implemented, so the sampling
    * convention cannot fork; a Lloyd refinement per subspace would
    * mirror [[ivfCentroidsLloyd]] and, like it, trades the oracle for
    * recall). Output (s, cid, cent): m·nCodes rows — broadcastable at
    * any corpus size. Sampled rows must be m·subDim-dim (checked). */
  def pqCodebooks(corpus: DataFrame, m: Int, subDim: Int,
                  nCodes: Int): DataFrame = {
    val sampled = ivfCentroids(corpus, nCodes)
      .select(col("cid").as("id"), col("centroid").as("embedding"))
    val dims = sampled.agg(min(size(col("embedding"))).as("lo"),
                           max(size(col("embedding"))).as("hi")).head()
    require(!dims.isNullAt(0),
      "pqCodebooks: empty corpus — no embeddings to train codebooks on")
    require(dims.getInt(0) == m * subDim && dims.getInt(1) == m * subDim,
      s"embeddings are ${dims.getInt(0)}..${dims.getInt(1)}-dim, " +
        s"expected m*subDim = ${m * subDim}")
    pqSubvectors(sampled, m, subDim)
      .select(col("s"), col("id").as("cid"), col("sub").as("cent"))
  }

  /** Per-subspace Lloyd refinement of PQ codebooks — the standard
    * k-means codebook training (Jégou et al. 2011 §III trains each
    * subquantizer with k-means; sampling is only the init). Each
    * iteration: assign every corpus subvector to its nearest entry
    * (the [[pqEncode]] argmin), recompute entries as the per-(s, cid,
    * dim) means. Means follow the engine's determinism discipline —
    * components round to 6 decimals and accumulate as exact
    * DECIMAL(28,6), so the division is one IEEE op on identical
    * operands in any engine and the refined books are reproducible
    * bit-for-bit. A code that loses all members keeps its previous
    * entry (k-means' empty-cluster convention here: freeze, don't
    * respawn — deterministic).
    *
    * Scale shape per iteration: one broadcast join (books are
    * m·nCodes rows), one per-(id, s) argmin window partitioned on the
    * corpus axis, one grouped mean of m·nCodes·subDim cells. */
  def pqCodebooksLloyd(corpus: DataFrame, m: Int, subDim: Int,
                       nCodes: Int, iters: Int): DataFrame = {
    val subs = graft.core.CacheScope.persist(pqSubvectors(corpus, m, subDim))
    // entries as array<double> so the refined means coalesce with the
    // sampled init regardless of the corpus element type
    var books = pqCodebooks(corpus, m, subDim, nCodes)
      .withColumn("cent", transform(col("cent"), _.cast("double")))
    for (_ <- 0 until iters) {
      val scored = subs.join(broadcast(books), "s")
        .withColumn("d2", subDist2(col("sub"), col("cent")))
      val w = Window.partitionBy("id", "s")
        .orderBy(asc_nulls_last("d2"), asc("cid"))
      val best = scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("id"), col("s"), col("cid"), col("sub"))
      val means = best
        .select(col("s"), col("cid"),
                posexplode(col("sub")).as(Seq("dim", "x")))
        .groupBy("s", "cid", "dim")
        .agg((sum(round(col("x").cast("double"), 6)
                    .cast("decimal(28,6)")) /
              count(lit(1))).cast("double").as("mx"))
        .groupBy("s", "cid")
        .agg(transform(
          array_sort(collect_list(struct(col("dim"), col("mx")))),
          e => e.getField("mx")).as("cent"))
      // freeze empty codes at their previous entry
      books = graft.core.CacheScope.persist(
        books.select(col("s"), col("cid"), col("cent").as("prev"))
          .join(means.withColumnRenamed("cent", "next"),
                Seq("s", "cid"), "left")
          .select(col("s"), col("cid"),
                  coalesce(col("next"), col("prev")).as("cent")))
    }
    books
  }

  /** PQ encoding: each (vector, subspace) maps to its nearest-L2
    * codebook entry — codes are m small ints per vector, the 8-byte
    * stand-in for a 256-byte float32 embedding. d² is rounded to 6
    * before the argmin (cid tie-break) so the code assignment is
    * engine-stable; `qerr` keeps the per-subspace quantization error
    * the encode is accepted on (NULL there flags a wrong-dimension
    * corpus row). One broadcast join + per-(id, s) argmin window,
    * partitioned by the corpus axis. */
  def pqEncode(corpus: DataFrame, codebooks: DataFrame, m: Int,
               subDim: Int): DataFrame = {
    validatePq(codebooks, m, subDim)
    val subs = pqSubvectors(corpus, m, subDim)
    val scored = subs.join(broadcast(codebooks), "s")
      .withColumn("d2", subDist2(col("sub"), col("cent")))
    val w = Window.partitionBy("id", "s")
      .orderBy(asc_nulls_last("d2"), asc("cid"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id"), col("s"), col("cid").as("code"),
              col("d2").as("qerr"))
  }

  /** Asymmetric-distance top-k over PQ codes: the query stays float,
    * the corpus is its codes — per query a (s, cid) → d² lookup table
    * of m·nCodes entries is computed once, and every corpus vector's
    * approximate distance is the SUM of m table entries joined on its
    * codes (ADC, Jégou et al. 2011). Per-entry d² is rounded to 6,
    * the sum accumulates as exact decimals, AND the ranking happens on
    * the decimal (the double cast is output-only), so ranking is
    * engine-stable at any magnitude. With `broadcastLut` (default —
    * ADC's contract is a bounded query batch) the |queries|·m·nCodes
    * lookup table broadcasts and the corpus-sized codes frame is
    * scored with NO shuffle at all; only the per-(qid, vid)
    * aggregation shuffles scored pairs. Pass `broadcastLut = false`
    * for an unbounded query side to let join-strategy stats pick a
    * shuffle join instead of risking a driver-sized broadcast. At
    * 100 TB this scores a candidate set (IVF cells, LSH buckets) —
    * over the full corpus it is the brute-force shape with 32× less
    * data movement, which is PQ's point. */
  def pqAdcTopK(queries: DataFrame, codes: DataFrame,
                codebooks: DataFrame, m: Int, subDim: Int,
                k: Int, broadcastLut: Boolean = true): DataFrame = {
    validatePq(codebooks, m, subDim)
    val lut0 = adcLut(queries, codebooks, m, subDim)
    val lut = if (broadcastLut) broadcast(lut0) else lut0
    val cand = codes.select(col("id").as("vid"), col("s"),
                            col("code").as("cid"))
    val pairs = cand.join(lut, Seq("s", "cid"))
      .filter(col("qid") =!= col("vid"))
    adcAggregateAndRank(pairs, k)
  }

  /** The per-query ADC lookup table (qid, s, cid, d²): m·nCodes rows
    * per query, d² rounded to 6 and carried as exact decimal so any
    * later sum is order-free. */
  private def adcLut(queries: DataFrame, codebooks: DataFrame,
                     m: Int, subDim: Int): DataFrame =
    pqSubvectors(queries, m, subDim)
      .select(col("id").as("qid"), col("s"), col("sub"))
      .join(broadcast(codebooks), "s")
      .withColumn("d2",
        subDist2(col("sub"), col("cent")).cast("decimal(18,6)"))
      .select("qid", "s", "cid", "d2")

  /** Shared ADC scoring tail: exact-decimal per-pair sum, rank ON the
    * decimal (ties → vid), double cast only in the output projection —
    * exactly what the oracles do. */
  private def adcAggregateAndRank(pairs: DataFrame, k: Int): DataFrame = {
    val dists = pairs.groupBy("qid", "vid")
      .agg(sum(col("d2")).as("adist_dec"))
    val w = Window.partitionBy("qid")
      .orderBy(asc("adist_dec"), asc("vid"))
    dists.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vid"),
              col("adist_dec").cast("double").as("adist"), col("rank"))
  }

  /** Residual frame: every vector minus its assigned cell centroid,
    * in DOUBLE (float subtraction would round to 24 bits and
    * desynchronize from any double-arithmetic twin; double(a) −
    * double(b) on float inputs is one exact-operand IEEE op both
    * engines perform identically). Returns (id, cell,
    * embedding: array<double>). Centroids broadcast — the cell table
    * is √N-sized under the production auto-sizing. */
  def residuals(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val assign = ivfAssign(vectors, centroids, 1)
    vectors.join(assign, "id")
      .join(broadcast(centroids.select(col("cid").as("cell"),
                                       col("centroid"))), "cell")
      .select(col("id"), col("cell"),
        zip_with(col("embedding"), col("centroid"),
          (a, b) => a.cast("double") - b.cast("double")).as("embedding"))
  }

  /** IVF-PQ with RESIDUAL encoding — the IVFADC formulation actually
    * served at scale (Jégou et al. 2011 §V-A; FAISS `IndexIVFPQ`
    * defaults to it): codes quantize v − centroid(cell(v)) instead of
    * v. Residuals concentrate near the origin, so the same
    * m·log₂(nCodes) bits buy a finer quantizer than over the raw
    * spread-out vectors. The price is the lookup table: the query
    * must be re-expressed in EACH probed cell's residual frame, so
    * the LUT is per-(query, probed cell) — nProbe× the raw-PQ LUT,
    * still |queries|·nProbe·m·nCodes rows, broadcastable for the
    * bounded query batches ADC is for (`broadcastLut` contract and
    * fallback as in [[pqAdcTopK]]). Candidates join co-partitioned on
    * the cell key; nothing corpus-sized broadcasts.
    *
    * Trains codebooks and encodes internally (codes are only
    * meaningful against the residual frame they were trained in);
    * returns (qid, vid, adist, rank). */
  def ivfPqResidualTopK(queries: DataFrame, corpus: DataFrame,
                        centroids: DataFrame, nProbe: Int, m: Int,
                        subDim: Int, nCodes: Int, k: Int,
                        broadcastLut: Boolean = true,
                        lloydIters: Int = 0): DataFrame = {
    val res = graft.core.CacheScope.persist(residuals(corpus, centroids))
    // Codebooks must NOT sample the coarse-centroid rows: a centroid's
    // own residual is exactly the zero vector, and the md5 sample that
    // picks centroids would pick the same lowest ids again — with
    // nCodes ≤ nCells every sampled entry would be 0 and ADC distances
    // would carry no candidate information at all. Train on the
    // residuals of NON-centroid rows (anti-join on the bounded
    // centroid id set).
    val trainRes = res.join(
      broadcast(centroids.select(col("cid").as("id"))),
      Seq("id"), "left_anti")
    val books =
      if (lloydIters > 0)
        pqCodebooksLloyd(trainRes.select("id", "embedding"), m, subDim,
                         nCodes, lloydIters)
      else pqCodebooks(trainRes.select("id", "embedding"), m, subDim,
                       nCodes)
    val codes = pqEncode(res.select("id", "embedding"), books, m, subDim)
    val cells = res.select(col("id").as("vid"), col("cell"))
    val probes = ivfAssign(queries, centroids, nProbe)
      .select(col("id").as("qid"), col("cell"))
    // the query's residual in each probed cell's frame
    val qres = queries
      .select(col("id").as("qid"), col("embedding").as("qv"))
      .join(probes, "qid")
      .join(broadcast(centroids.select(col("cid").as("cell"),
                                       col("centroid"))), "cell")
      .select(col("qid"), col("cell"),
        zip_with(col("qv"), col("centroid"),
          (a, b) => a.cast("double") - b.cast("double")).as("qr"))
    val lut0 = qres
      .select(col("qid"), col("cell"),
        posexplode(transform(sequence(lit(0), lit(m - 1)),
            s => slice(col("qr"), s * subDim + 1, lit(subDim))))
          .as(Seq("s", "sub")))
      .join(broadcast(books), "s")
      .withColumn("d2",
        subDist2(col("sub"), col("cent")).cast("decimal(18,6)"))
      .select(col("qid"), col("cell"), col("s"), col("cid"), col("d2"))
    val lut = if (broadcastLut) broadcast(lut0) else lut0
    // a vector lives in exactly one cell (ivfAssign(…, 1)), so
    // (qid, vid) pairs are already unique across probed cells
    val cand = probes.join(cells, "cell")
      .filter(col("qid") =!= col("vid"))
      .select("qid", "cell", "vid")
    val candCodes = cand.join(
      codes.select(col("id").as("vid"), col("s"),
                   col("code").as("cid")), "vid")
    adcAggregateAndRank(
      candCodes.join(lut, Seq("qid", "cell", "s", "cid")), k)
  }

  /** IVF-PQ (the production composition, Jégou et al. 2011 §V): IVF
    * cells prune the corpus to the probed ~nProbe/nCells fraction,
    * then ADC prices ONLY those candidates from the per-query lookup
    * table — coarse quantizer for the search scope, product quantizer
    * for the distance, which is how a 100 TB embedding table is
    * actually served. The candidate join is co-partitioned on the cell
    * key; the lookup table broadcasts (`broadcastLut`, same contract
    * and fallback as [[pqAdcTopK]]); nothing corpus-sized is broadcast
    * or collected. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame,
                centroids: DataFrame, codes: DataFrame,
                codebooks: DataFrame, nProbe: Int, m: Int, subDim: Int,
                k: Int, broadcastLut: Boolean = true): DataFrame = {
    validatePq(codebooks, m, subDim)
    val cells = ivfAssign(corpus, centroids, 1)
      .select(col("id").as("vid"), col("cell"))
    val probes = ivfAssign(queries, centroids, nProbe)
      .select(col("id").as("qid"), col("cell"))
    val cand = probes.join(cells, "cell")
      .filter(col("qid") =!= col("vid"))
      .select("qid", "vid").distinct()
    val candCodes = cand.join(
      codes.select(col("id").as("vid"), col("s"),
                   col("code").as("cid")), "vid")
    val lut0 = adcLut(queries, codebooks, m, subDim)
    val lut = if (broadcastLut) broadcast(lut0) else lut0
    adcAggregateAndRank(candCodes.join(lut, Seq("qid", "s", "cid")), k)
  }

  /** Maximal-marginal-relevance diversification (Carbonell &
    * Goldstein, SIGIR 1998) — re-rank a retriever's per-query
    * candidate list so the top k trades relevance against redundancy:
    * at each step pick argmax λ·rel − (1−λ)·max_{s∈selected} cos(d,s)
    * (empty selected ⇒ the second term is 0, so step 1 is the pure
    * relevance argmax). The standard last stage of a RAG / retrieval
    * pipeline after [[graft.text.TextOps.rrfFuse]]: without it, a
    * near-dup-heavy corpus returns k copies of one document.
    *
    * `candidates` is a per-query list (qid, doc_id, rel, emb) — ≤
    * retriever-k rows per query, NEVER corpus-sized; that bound is
    * what makes the per-query candidate self-join (the pairwise
    * cosine frame, ≤ n² rows per query, co-partitioned on qid) safe
    * at any corpus scale. The greedy loop is k driver-side PLAN
    * iterations (k is a constant, not a data axis): each round one
    * anti-join drops the already-selected rows, one co-partitioned
    * join + max aggregate prices redundancy, and one per-query
    * row_number picks the winner — no per-group collect, no UDF, so
    * |Q| can be arbitrarily large.
    *
    * Determinism: pairwise cosine is rounded to 6 decimals (the
    * [[bruteForceCosineTopK]] convention); the MMR score itself is
    * then computed in EXACT decimal arithmetic — λ at 6-decimal
    * precision times the 6-decimal rel/sim values, scale-12 products,
    * one final double conversion (exact: scale-12 unscaled values of
    * unit-magnitude scores stay under 2⁵³). Rounding the score
    * instead would sit ON a half boundary whenever λ·(rel − maxsim)
    * has an odd final digit — λ = 0.5 makes that a coin flip per row,
    * and cross-engine round implementations disagree there (caught by
    * this operator's first strict-gate run). Ties → doc_id, so the
    * selection sequence is engine-independent given round-6 `rel`.
    *
    * Returns (qid, doc_id, mmr_rank ≤ k, mmr_score). */
  def mmrDiversify(candidates: DataFrame, lambda: Double, k: Int)
      : DataFrame = {
    require(lambda >= 0.0 && lambda <= 1.0,
      s"lambda $lambda outside [0, 1]")
    require(k > 0, s"k must be positive, got $k")
    val cand = graft.core.CacheScope.persist(
      candidates.select(col("qid"), col("doc_id"), col("rel"),
                        col("emb")))
    val a = cand.select(col("qid"), col("doc_id").as("a"),
                        col("emb").as("ea"))
    val b = cand.select(col("qid"), col("doc_id").as("b"),
                        col("emb").as("eb"))
    val sims = graft.core.CacheScope.persist(
      a.join(b, Seq("qid")).filter(col("a") =!= col("b"))
        .select(col("qid"), col("a"), col("b"),
          round(dot(col("ea"), col("eb")) /
            (sqrt(norm2(col("ea"))) * sqrt(norm2(col("eb")))), 6)
            .as("sim")))
    val w = Window.partitionBy("qid")
      .orderBy(desc("mmr_score"), asc("doc_id"))
    var selected = cand
      .select(col("qid"), col("doc_id"), lit(0).as("mmr_rank"),
              lit(0.0).as("mmr_score"))
      .limit(0)
    for (step <- 1 to k) {
      val remaining = cand.join(selected.select("qid", "doc_id"),
                                Seq("qid", "doc_id"), "left_anti")
      val maxSim = sims
        .join(selected.select(col("qid"), col("doc_id").as("b")),
              Seq("qid", "b"))
        .groupBy(col("qid"), col("a").as("doc_id"))
        .agg(max(col("sim")).as("msim"))
      val lamDec = new java.math.BigDecimal(lambda)
        .setScale(6, java.math.RoundingMode.HALF_UP)
      val omlDec = java.math.BigDecimal.ONE.subtract(lamDec)
      val pick = remaining
        .join(maxSim, Seq("qid", "doc_id"), "left")
        .withColumn("mmr_score",
          (lit(lamDec).cast("decimal(18,6)") *
             col("rel").cast("decimal(18,6)") -
           lit(omlDec).cast("decimal(18,6)") *
             coalesce(col("msim"), lit(0.0)).cast("decimal(18,6)"))
            .cast("double"))
        .withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1)
        .select(col("qid"), col("doc_id"),
                lit(step).as("mmr_rank"), col("mmr_score"))
      // lineage cut (the connectedComponents discipline): each round
      // references `selected` three times (anti-join, redundancy join,
      // union), so leaving it a logical plan grows analysis ~3^k — the
      // snapshot rebases the next round on a LogicalRDD leaf, keeping
      // per-round analysis constant. The RDD is scope-tracked like any
      // other persist.
      val u = selected.unionByName(pick)
      val snap = graft.core.CacheScope.current.persistRdd(
        u.rdd, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      selected = u.sparkSession.createDataFrame(snap, u.schema)
    }
    selected
  }
}
