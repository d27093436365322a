package graft.recommend

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.recommendation.ALS
import breeze.linalg.{eigSym, inv, DenseMatrix => BDM, DenseVector => BDV}

/** Factorization / regression model operators (SURVEY.md §2.8 L18–L25).
  *
  * Spark-first choices per SURVEY §7.3: PureSVD → mllib RowMatrix SVD;
  * IALS → ml.recommendation.ALS(implicitPrefs) (Hu-Koren-Volinsky, the
  * same objective as the reference's IALSRecommender.py:19-22); EASE^R →
  * distributed Gram aggregation + driver Breeze inverse (the one place
  * the math demands a local dense solve, guarded by a size check);
  * SLIM ElasticNet → covariance-form coordinate descent over the
  * distributed item×item Gram, embarrassingly parallel per target item
  * (reference SLIM_ElasticNet/SLIMElasticNetRecommender.py:41-150) —
  * the URM itself never leaves the cluster.
  */
object Models {

  /** L18 — PureSVD (reference: MatrixFactorization/PureSVDRecommender.py:
    * 33-45): truncated SVD of the user×item matrix; item factors are
    * (Σ·Vᵀ)ᵀ = V·Σ rows. Returns (i, factors ARRAY<double>). Item ids
    * must be dense indices (use etl.Urm.denseIndex first).
    *
    * Scale path: AᵀA = V·Σ²·Vᵀ, so the right singular vectors come from
    * the ITEM×ITEM Gram — computed distributedly as one pair-dot
    * aggregation over the (user-scaled) URM, then eigendecomposed
    * locally. The driver never touches user-sized data; the dense
    * materialization is item², the same bounded dimension the reference
    * itself assumes when it densifies V (PureSVDRecommender.py:40-44).
    * This replaces the round-1 RowMatrix/ARPACK path whose per-iteration
    * distributed matvecs dominated the bench. */
  def pureSvdItemFactors(spark: SparkSession, urm: DataFrame, k: Int,
                         nItems: Int, maxItems: Int = 2000): DataFrame = {
    // same driver dense-materialization guard as easeR: the eigensolve
    // needs the full item² Gram on the driver, which is fine for bounded
    // catalogs and an OOM at nItems=100k — fail loudly instead
    require(nItems <= maxItems,
      s"PureSVD dense eigensolve guarded at $maxItems items; got $nItems")
    val binary = urm.select(col("u").cast("int").as("u"),
                            col("i").cast("int").as("i"),
                            col("v").cast("double").as("v"))
    // Gram for general values: G[i,j] = Σ_u v_ui·v_uj (pairDots covers
    // the binary case; weighted URMs accumulate the product directly)
    val a = binary.select(col("u"), col("i").as("i1"), col("v").as("v1"))
    val b = binary.select(col("u"), col("i").as("i2"), col("v").as("v2"))
    val gram = a.join(b, "u")
      .groupBy(col("i1"), col("i2"))
      .agg(sum(col("v1") * col("v2")).as("g"))
      .collect()
    val gMat = BDM.zeros[Double](nItems, nItems)
    gram.foreach { r =>
      gMat(r.getInt(0), r.getInt(1)) = r.getDouble(2)
    }
    val es = eigSym(gMat) // eigenvalues ascending
    val order = (0 until nItems).sortBy(f => -es.eigenvalues(f)).take(k)
    val sigmas = order.map(f => math.sqrt(math.max(es.eigenvalues(f), 0.0)))
    import spark.implicits._
    (0 until nItems).map { i =>
      (i, order.indices.map(f =>
        es.eigenvectors(i, order(f)) * sigmas(f)).toArray)
    }.toDF("i", "factors")
  }

  /** L20 — IALS via ml.recommendation.ALS with implicit preferences
    * (reference: MatrixFactorization/IALSRecommender.py:40-201).
    * Confidence scaling follows the reference's two modes
    * (IALSRecommender.py:111-123):
    *   - "linear": c_ui = 1 + α·r_ui — ml.ALS's native form.
    *   - "log":    c_ui = 1 + α·log(1 + r_ui/ε) — expressed by
    *     pre-transforming ratings r → log(1 + r/ε) BEFORE the fit, so
    *     ml.ALS's 1 + α·r' equals the reference's kernel exactly. The
    *     implicit preference p_ui = [r' > 0] is unchanged (log(1+r/ε)
    *     > 0 whenever r > 0), so only the confidence weights move.
    * Returns the fitted model's user and item factor frames. */
  def ials(urm: DataFrame, rank: Int, reg: Double, alpha: Double,
           iters: Int, seed: Long,
           confidenceScaling: String = "linear",
           epsilon: Double = 1.0,
           numBlocks: Int = 10): (DataFrame, DataFrame) = {
    require(Set("linear", "log")(confidenceScaling),
      s"confidence_scaling must be linear|log, got $confidenceScaling")
    require(numBlocks >= 1, s"numBlocks $numBlocks must be >= 1")
    // 64-bit id spaces (the r12 sf3 finding): TRY the raw int path —
    // zero added cost for the overwhelmingly common in-range case
    // (an eager range aggregate per fit taxed the search tiers,
    // which run hundreds of tiny fits) — and only on the ANSI cast
    // overflow densify, refit, re-key. The overflow surfaces in the
    // fit's first job, so the discarded work is one early stage.
    try { ialsRaw(urm, rank, reg, alpha, iters, seed,
                  confidenceScaling, epsilon, numBlocks) }
    catch {
      case e: Throwable
          if isCastOverflow(e) && idsExceedIntRange(urm, "u", "i") =>
        val (uMap, iMap, urmD, _) = denseRemapUi(urm, None)
        val (uf, itf) = ialsRaw(urmD, rank, reg, alpha, iters, seed,
                                confidenceScaling, epsilon, numBlocks)
        (rekeyTo(uf, "id", uMap), rekeyTo(itf, "id", iMap))
    }
  }

  private def ialsRaw(urm: DataFrame, rank: Int, reg: Double,
                      alpha: Double, iters: Int, seed: Long,
                      confidenceScaling: String, epsilon: Double,
                      numBlocks: Int = 10)
      : (DataFrame, DataFrame) = {
    val v = col("v").cast("double")
    val scaled = confidenceScaling match {
      case "linear" => v
      case "log"    => log(lit(1.0) + v / lit(epsilon))
    }
    // ml.ALS truncates its per-iteration RDD lineage only when a
    // checkpoint dir exists (checkpointInterval=10 is silently skipped
    // otherwise) — without one, fits past ~20 iterations overflow the
    // task-serialization stack on the 25th-ish nested cogroup. Ensure
    // a dir so long fits are safe; leave any caller-set dir alone.
    ensureCheckpointDir(urm.sparkSession)
    // numBlocks partitions BOTH factor axes: each user block
    // replicates every item block it references per sweep (and vice
    // versa), so block count trades per-task solve size against
    // replication volume — exposed for the SURVEY §6.z′ saturation
    // sensitivity measurement and production tuning (ALS default 10)
    val als = new ALS()
      .setUserCol("u").setItemCol("i").setRatingCol("v")
      .setImplicitPrefs(true).setRank(rank).setRegParam(reg)
      .setAlpha(alpha).setMaxIter(iters).setSeed(seed)
      .setNumBlocks(numBlocks)
    val model = als.fit(urm.select(col("u").cast("int").as("u"),
                                   col("i").cast("int").as("i"),
                                   scaled.cast("float").as("v")))
    (model.userFactors, model.itemFactors)
  }

  /** True iff any id in columns `a`/`b` falls outside 32-bit range.
    * Skipped without a job when both columns are already int-typed;
    * otherwise one aggregate. Only ever evaluated on the EXCEPTIONAL
    * path (after a cast overflow surfaced) — an eager per-fit check
    * measurably taxed the search tiers, which run hundreds of tiny
    * fits (q135 read +60% in the r12 canonical bench before the
    * try-first restructure). */
  private def idsExceedIntRange(df: DataFrame, a: String, b: String)
      : Boolean = {
    import org.apache.spark.sql.types.IntegerType
    val dt = df.schema
    if (dt(a).dataType == IntegerType && dt(b).dataType == IntegerType)
      false
    else {
      val r = df.agg(max(greatest(abs(col(a).cast("long")),
                                  abs(col(b).cast("long"))))).head()
      !r.isNullAt(0) && r.getLong(0) > Int.MaxValue.toLong
    }
  }

  /** Does this failure chain contain the ANSI int-cast overflow the
    * 64-bit-id guard retries on? Job failures arrive wrapped in
    * SparkException layers; walk a bounded cause chain. */
  private def isCastOverflow(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(12)
      .exists { t =>
        t.getClass.getSimpleName == "SparkArithmeticException" ||
        Option(t.getMessage).exists(_.contains("CAST_OVERFLOW"))
      }

  /** Dense remap of the (u, i) axes for the int-addressed production
    * fits (ml.ALS's user/item columns are int — a Spark MLlib API
    * constraint; the distributed BPR state partitioner indexes by int
    * too). The r12 sf3 soak caught the raw cast overflowing at
    * 30-copy offset key spaces (ids ~2.2·10⁹): any 100 TB corpus with
    * a 64-bit id space hits the same wall, so ids beyond int range
    * engage the reference's own dict-mapper design
    * (Data_manager/IncrementalSparseMatrix.py:95-127, already exposed
    * as [[graft.etl.Urm.denseIndex]]): contiguous [0, n) indices in,
    * factor frames re-keyed to the ORIGINAL ids out. Below int range
    * the ids pass through UNTOUCHED — ALS factor initialization is
    * keyed by id blocks, so an unconditional remap would perturb the
    * value-pinned gates for no scale benefit.
    *
    * The optional `extra` frame (BPR impressions) shares the id
    * space, so both maps are built over the union. Indices must
    * themselves fit int — beyond 2³¹ DISTINCT entities the int-
    * addressed fit genuinely cannot run, and the require says so
    * instead of wrapping. */
  private def denseRemapUi(urm: DataFrame, extra: Option[DataFrame])
      : (DataFrame, DataFrame, DataFrame, Option[DataFrame]) = {
    import graft.etl.Urm
    def axis(c: String): DataFrame = extra match {
      case Some(e) => urm.select(c).unionByName(e.select(c))
      case None    => urm.select(c)
    }
    val uMap = graft.core.CacheScope.persist(
      Urm.denseIndex(axis("u"), col("u")))
    val iMap = graft.core.CacheScope.persist(
      Urm.denseIndex(axis("i"), col("i")))
    Seq("user" -> uMap, "item" -> iMap).foreach { case (ax, m) =>
      require(m.count() <= Int.MaxValue.toLong,
        s"$ax axis has more than 2^31 distinct ids - an int-addressed " +
        "fit cannot run at this cardinality")
    }
    def remap(df: DataFrame): DataFrame = df
      .join(uMap.select(col("orig").as("u"), col("idx").as("_du")), "u")
      .join(iMap.select(col("orig").as("i"), col("idx").as("_di")), "i")
      .drop("u", "i")
      .withColumnRenamed("_du", "u")
      .withColumnRenamed("_di", "i")
    (uMap, iMap, remap(urm), extra.map(remap))
  }

  /** Replace the dense index in `keyCol` with the original id from
    * `map`, preserving the column order. */
  private def rekeyTo(df: DataFrame, keyCol: String, map: DataFrame)
      : DataFrame = {
    val order = df.columns
    df.join(map.select(col("idx").as("_k"), col("orig")),
            col(keyCol) === col("_k"))
      .drop(keyCol, "_k")
      .withColumnRenamed("orig", keyCol)
      .select(order.map(col).toSeq: _*)
  }

  /** Set a session-local checkpoint dir (under java.io.tmpdir) iff the
    * caller hasn't set one — ml.ALS and other iterative fits need it
    * for lineage truncation; a caller-configured dir always wins.
    * LOCAL masters only (the bprCheckpoint convention): on a cluster a
    * driver-local tmp path is not shared storage, so executors could
    * not read the checkpoint back — there the caller must configure a
    * durable dir (HDFS/object store); without one ml.ALS skips its
    * checkpointInterval, which is Spark's own documented default. */
  private[graft] def ensureCheckpointDir(spark: SparkSession): Unit =
    // synchronized (ADVICE r14): concurrent fits (q170/q178 run two
    // ials fits from driver threads) raced the check-then-act and
    // could swap the dir mid-fit; one lock per process is plenty
    synchronized {
    if (spark.sparkContext.isLocal &&
        spark.sparkContext.getCheckpointDir.isEmpty) {
      val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
      // deleteOnExit cannot remove a non-empty directory, and ml.ALS
      // leaves its last checkpoint behind per fit (cleanCheckpoints
      // defaults false) — a JVM shutdown hook deletes the tree
      // recursively so repeated fits on a long-lived host don't
      // accumulate checkpoint data in /tmp
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          val kids = f.listFiles()
          if (kids != null) kids.foreach(rm)
          f.delete(); ()
        }
        rm(dir.toFile)
      }))
      spark.sparkContext.setCheckpointDir(dir.toString)
    } }

  /** The reference's EXACT IALS row update, distributed
    * (IALSRecommender.py:165-186 `_run_epoch` user half +
    * `_update_row`): for each user with interactions,
    *   x_u = (YᵀY + Yᵀ(Cᵤ−I)Y + λI)⁻¹ Yᵀ Cᵤ p(u),
    * with confidence c_ui = 1 + α·r (linear) or 1 + α·log(1 + r/ε)
    * (log — IALSRecommender.py:111-123). Y (the item factors) is
    * collected and BROADCAST — rank·nItems doubles, always
    * broadcastable at sane ranks; `maxItems` guards the driver
    * materialization — and YᵀY spans ALL item rows, cold items
    * included, exactly like the reference's
    * `ITEM_factors.T.dot(ITEM_factors)`. Each user's solve is then an
    * independent rank³ linear system inside mapGroups, so the step
    * scales with the user axis and never shuffles Y: the shape one
    * executor-side IALS half-epoch has at 100 TB. [[ials]] (ml.ALS)
    * stays the production fit; this step is the semantics pin the
    * q167 strict gate hash-checks, log scaling included. */
  def ialsUserStep(spark: SparkSession, urm: DataFrame,
                   itemFactors: DataFrame, alpha: Double, reg: Double,
                   confidenceScaling: String = "linear",
                   epsilon: Double = 1.0,
                   maxItems: Int = 100000,
                   regScaledByDegree: Boolean = false): DataFrame = {
    import spark.implicits._
    require(Set("linear", "log")(confidenceScaling),
      s"confidence_scaling must be linear|log, got $confidenceScaling")
    val y = itemFactors
      .select(col("i").cast("int").as("i"), col("factors"))
      .as[(Int, Array[Double])].collect()
    require(y.nonEmpty, "ialsUserStep: empty item-factor table")
    require(y.length <= maxItems,
      s"ialsUserStep broadcast guarded at $maxItems items; got ${y.length}")
    // duplicate ids would double-count YᵀY while y.toMap keeps only the
    // last row — a silently wrong solve; fail loudly instead
    require(y.map(_._1).distinct.length == y.length,
      "ialsUserStep: itemFactors contains duplicate item ids")
    val rank = y.head._2.length
    val yty = Array.ofDim[Double](rank * rank)
    y.foreach { case (_, f) =>
      var a = 0
      while (a < rank) {
        var b = 0
        while (b < rank) { yty(a * rank + b) += f(a) * f(b); b += 1 }
        a += 1
      }
    }
    // scope-tracked: executor copies are released when the enclosing
    // CacheScope closes (epochs in a long-lived session would otherwise
    // accumulate broadcast blocks until ContextCleaner GC)
    val bc = graft.core.CacheScope.trackBroadcast(
      spark.sparkContext.broadcast((y.toMap, yty)))
    val useLog = confidenceScaling == "log"
    urm.select(col("u").cast("int").as("u"),
               col("i").cast("int").as("i"),
               col("v").cast("double").as("v"))
      .as[(Int, Int, Double)]
      .groupByKey(_._1)
      .mapGroups { (u, rows) =>
        val (ym, g) = bc.value
        val bMat = new BDM[Double](rank, rank)
        var a = 0
        while (a < rank) {
          var b = 0
          while (b < rank) { bMat(a, b) = g(a * rank + b); b += 1 }
          a += 1
        }
        val rhs = BDV.zeros[Double](rank)
        var n = 0L
        rows.foreach { case (_, i, r) =>
          val f = ym.getOrElse(i, throw new IllegalArgumentException(
            s"ialsUserStep: item $i has no factor row"))
          val c = if (useLog) 1.0 + alpha * math.log1p(r / epsilon)
                  else 1.0 + alpha * r
          n += 1
          var a = 0
          while (a < rank) {
            var b = 0
            while (b < rank) { bMat(a, b) += (c - 1.0) * f(a) * f(b); b += 1 }
            rhs(a) += c * f(a)
            a += 1
          }
        }
        // regScaledByDegree selects ml.ALS's "ALS-WR" weighted-λ
        // (regParam scaled by the row's rating count — for implicit
        // fits, the count of POSITIVE ratings, which on the engine's
        // implicit-positive URMs is the row count); false keeps the
        // reference's plain +λ (IALSRecommender.py:165-186). On
        // skewed-degree data the two genuinely diverge per row — the
        // q178 strict gate pins both sides of that translation.
        val lam = if (regScaledByDegree) reg * n else reg
        a = 0
        while (a < rank) { bMat(a, a) += lam; a += 1 }
        (u, (bMat \ rhs).toArray)
      }
      .toDF("u", "factors")
  }

  /** The item half of the IALS epoch — identical math on the
    * transposed URM (IALSRecommender.py:176-186: `_update_row` is
    * shared by both halves), with Y = the user factors:
    * h_i = (WᵀW + Wᵀ(Cᵢ−I)W + λI)⁻¹ WᵀCᵢp(i). `userFactors` is
    * (u, factors). One documented divergence from the reference: its
    * WᵀW spans ALL n_users rows of USER_factors, but cold users' rows
    * are `np.empty` — UNINITIALIZED memory (IALSRecommender.py:71,
    * `_init_factors(..., assign_values=False)`) — so the reference's
    * cold-user Gram contribution is garbage; here WᵀW spans exactly
    * the rows `userFactors` carries (the solved warm users), the
    * mathematically determinate reading. */
  def ialsItemStep(spark: SparkSession, urm: DataFrame,
                   userFactors: DataFrame, alpha: Double, reg: Double,
                   confidenceScaling: String = "linear",
                   epsilon: Double = 1.0,
                   maxUsers: Int = 100000): DataFrame =
    ialsUserStep(spark,
      urm.select(col("i").as("u"), col("u").as("i"),
                 col("v")),
      userFactors.select(col("u").as("i"), col("factors")),
      alpha, reg, confidenceScaling, epsilon, maxUsers)
      .select(col("u").as("i"), col("factors"))

  /** One full IALS epoch, the reference's `_run_epoch` order
    * (IALSRecommender.py:165-186): solve every warm user against the
    * CURRENT item factors, then every warm item against the UPDATED
    * user factors. Returns (userFactors, itemFactors) — both solved
    * closed-form, so given (urm, itemFactors) the epoch is
    * deterministic and the q169 gate can hash it end to end. */
  def ialsEpoch(spark: SparkSession, urm: DataFrame,
                itemFactors: DataFrame, alpha: Double, reg: Double,
                confidenceScaling: String = "linear",
                epsilon: Double = 1.0): (DataFrame, DataFrame) = {
    val uf = graft.core.CacheScope.persist(
      ialsUserStep(spark, urm, itemFactors, alpha, reg,
                   confidenceScaling, epsilon))
    val itf = ialsItemStep(spark, urm, uf, alpha, reg,
                           confidenceScaling, epsilon)
    (uf, itf)
  }

  /** L22 cross-check — explicit-feedback ALS: minimizes Σ(r_ui − w_u·h_i)²
    * + reg·(…) over the OBSERVED ratings only, the same squared-error
    * objective FunkSVD descends (reference: MatrixFactorizationImpressions_
    * Cython_Epoch.pyx:330-448), solved by alternating least squares
    * instead of SGD. Distinct from [[ials]]: no implicit-preference
    * transform, ratings enter as regression labels, not confidence
    * weights. This is the factorization scale path for explicit feedback. */
  def alsExplicit(urm: DataFrame, rank: Int, reg: Double, iters: Int,
                  seed: Long): (DataFrame, DataFrame) = {
    // 64-bit id spaces: try raw, densify only on overflow (see ials)
    try { alsExplicitRaw(urm, rank, reg, iters, seed) }
    catch {
      case e: Throwable
          if isCastOverflow(e) && idsExceedIntRange(urm, "u", "i") =>
        val (uMap, iMap, urmD, _) = denseRemapUi(urm, None)
        val (uf, itf) = alsExplicitRaw(urmD, rank, reg, iters, seed)
        (rekeyTo(uf, "id", uMap), rekeyTo(itf, "id", iMap))
    }
  }

  private def alsExplicitRaw(urm: DataFrame, rank: Int, reg: Double,
                             iters: Int, seed: Long)
      : (DataFrame, DataFrame) = {
    val als = new ALS()
      .setUserCol("u").setItemCol("i").setRatingCol("v")
      .setImplicitPrefs(false).setRank(rank).setRegParam(reg)
      .setMaxIter(iters).setSeed(seed)
    val model = als.fit(urm.select(col("u").cast("int").as("u"),
                                   col("i").cast("int").as("i"),
                                   col("v").cast("float").as("v")))
    (model.userFactors, model.itemFactors)
  }

  /** L25 — EASE^R closed form (reference: EASE_R/EASE_R_Recommender.py:
    * 40-103): G = AᵀA + λI, P = G⁻¹, B = −P/diag(P), diag(B)=0.
    * The Gram matrix is computed distributedly (pair-dot aggregation);
    * only the n×n inverse runs on the driver — `maxItems` guards the
    * dense materialization exactly like the reference's memory check. */
  def easeR(spark: SparkSession, urm0: DataFrame, l2: Double,
            maxItems: Int): DataFrame = {
    import graft.similarity.Similarity
    val urm = urm0.select(col("u").cast("int").as("u"),
                          col("i").cast("int").as("i"))
    val items = urm.select("i").distinct().orderBy("i")
      .collect().map(_.getInt(0))
    require(items.length <= maxItems,
      s"EASE dense inverse guarded at $maxItems items; got ${items.length}")
    val idx = items.zipWithIndex.toMap
    val n = items.length
    val g = BDM.zeros[Double](n, n)
    Similarity.pairDots(urm).collect().foreach { r =>
      g(idx(r.getInt(0)), idx(r.getInt(1))) = r.getLong(2).toDouble
    }
    Similarity.itemNorms(urm).collect().foreach { r =>
      g(idx(r.getInt(0)), idx(r.getInt(0))) = r.getLong(1).toDouble + l2
    }
    val p = inv(g)
    import spark.implicits._
    val triples = for {
      ci <- 0 until n
      cj <- 0 until n if ci != cj
    } yield (items(cj), items(ci), -p(cj, ci) / p(ci, ci))
    triples.toDF("i", "j", "w")
  }

  /** L23 — SLIM ElasticNet in covariance form
    * (reference: SLIM_ElasticNet/SLIMElasticNetRecommender.py:41-150).
    *
    * Coordinate descent needs only inner products: ρ_j = xⱼᵀy −
    * Σ_{k≠j} w_k·xⱼᵀx_k — every term is an entry of the ITEM×ITEM Gram
    * AᵀA. The Gram is aggregated distributedly from the user-scaled URM
    * (one co-occurrence groupBy, the same kernel as the similarity
    * engine), and only that item²-bounded sparse structure is collected
    * and broadcast — never the URM itself. Targets then partition
    * across the cluster and each task runs its own CD sweeps over Gram
    * entries: O(active²) lookups per sweep instead of the round-1
    * per-step set intersections over user lists.
    *
    * The candidate set per target is its co-occurrence neighborhood:
    * with w ≥ 0 and all Gram entries ≥ 0, a coordinate with xⱼᵀy = 0
    * has ρ_j ≤ 0 and can never activate, so skipping it is exact.
    * Returns (i, j, w) with the top-K positive coefficients per target
    * item (column j = target, matching similarityMatrixTopK). */
  def slimElasticNet(spark: SparkSession, urm: DataFrame, l1Reg: Double,
                     l2Reg: Double, topK: Int, iters: Int): DataFrame = {
    import spark.implicits._
    import graft.similarity.Similarity
    val binary = urm.select(col("u").cast("int").as("u"),
                            col("i").cast("int").as("i"))
    // item²-bounded sparse Gram: off-diagonal co-occurrence counts plus
    // diagonal norms — the only driver-side materialization
    val offDiag = Similarity.pairDots(binary)
      .as[(Int, Int, Long)].collect()
    val diag = Similarity.itemNorms(binary)
      .as[(Int, Long)].collect()
    val gram: Map[Int, Map[Int, Double]] = offDiag
      .groupBy(_._1)
      .map { case (i, rs) =>
        (i, rs.map { case (_, j, d) => (j, d.toDouble) }.toMap)
      }
    val norms: Map[Int, Double] = diag.map { case (i, n) =>
      (i, n.toDouble)
    }.toMap
    val gramBc = spark.sparkContext.broadcast(gram)
    val normsBc = spark.sparkContext.broadcast(norms)
    val items = norms.keys.toSeq.sorted
    val result = spark.sparkContext
      .parallelize(items, math.min(items.size, 64))
      .flatMap { target =>
        val g = gramBc.value
        val n = normsBc.value
        // xⱼᵀy for the target column; candidates are its neighbors
        val yCol = g.getOrElse(target, Map.empty)
        val others = yCol.keys.toArray.sorted
        val w = scala.collection.mutable.Map[Int, Double]()
        var it = 0
        while (it < iters) {
          others.foreach { j =>
            val gj = g.getOrElse(j, Map.empty)
            // residual correlation excluding j, over Gram entries
            val cross = w.iterator.filter(_._1 != j).map { case (k, wk) =>
              wk * gj.getOrElse(k, 0.0)
            }.sum
            val rho = yCol(j) - cross
            val denom = n(j) + l2Reg
            val wj = math.max(0.0, (rho - l1Reg) / denom)
            if (wj > 0) w(j) = wj else w.remove(j)
          }
          it += 1
        }
        w.toSeq.sortBy { case (j, wj) => (-wj, j) }.take(topK)
          .map { case (j, wj) => (j, target, wj) }
      }
    result.toDF("i", "j", "w")
  }

  /** L21/X8 — MF-BPR with impression-aware negative sampling, the
    * paper's novel operator (reference: MatrixFactorizationImpressions_
    * Cython_Epoch.pyx:636-742 BPR epoch, 1010-1084 sampler).
    *
    * Sampling modes mirror the reference exactly
    * (impression_sampling_mode ∈ none | inside | outside):
    *  - none: negatives uniform over unseen items;
    *  - inside: negatives drawn from the user's shown-but-unclicked
    *    impressions (fall back to uniform when the user has none);
    *  - outside: uniform over items neither seen nor shown.
    *
    * The searched SGD surface is threaded through in full
    * (run_parameter_search.py:238-245): `sgdMode` selects the
    * reference's update rule (pyx:905-943 adaptive_gradient — sgd /
    * adagrad / rmsprop / adam with bias correction), `batchSize`
    * accumulates gradients over a mini-batch and applies them once
    * per batch divided by the configured size (pyx:627-718 batch loop,
    * :838-899 _apply_minibatch_updates_to_latent_factors), and
    * `negativeReg`/`userReg` split the regularization per role
    * (pyx:700-703; both default to `reg`, preserving the historical
    * single-knob behavior; the reference's search leaves user_reg 0),
    * and `dropoutQuota` renews a per-factor Bernoulli mask each epoch
    * (pyx:70-72, 107, 653-659): masked-out factors neither enter the
    * x_uij prediction nor receive any update that epoch.
    *
    * Spark-first split: triple sampling (u, i⁺) is a distributed seeded
    * query per epoch; the SGD update runs on the driver over the
    * collected epoch sample, mirroring the reference's in-process
    * Cython kernel. Returns (userFactors, itemFactors) keyed by id. */
  def mfBpr(spark: SparkSession, urm: DataFrame, rank: Int,
            epochs: Int, samplesPerEpoch: Int, lr: Double, reg: Double,
            seed: Long, impressions: Option[DataFrame] = None,
            samplingMode: String = "none", sgdMode: String = "sgd",
            negativeReg: Option[Double] = None,
            userReg: Option[Double] = None, batchSize: Int = 1,
            dropoutQuota: Option[Double] = None,
            tripleOrder: Option[Seq[(Int, Int, Int)]] = None,
            initVec: Option[(Int, Int) => Array[Double]] = None)
      : (Map[Int, Array[Double]], Map[Int, Array[Double]]) = {
    import spark.implicits._
    require(Seq("none", "inside", "outside").contains(samplingMode))
    require(Seq("sgd", "adagrad", "rmsprop", "adam").contains(sgdMode))
    require(batchSize >= 1, "batchSize must be >= 1")
    dropoutQuota.foreach(q => require(q > 0.0 && q < 1.0,
      s"dropout_quota must be in (0,1) or None, got $q"))
    val negReg = negativeReg.getOrElse(reg)
    val uReg = userReg.getOrElse(reg)
    val adapt = new AdaptiveGrad(sgdMode, rank)
    val items = urm.select(col("i").cast("int")).distinct()
      .as[Int].collect().sorted
    val rng = new scala.util.Random(seed)
    val uf = scala.collection.mutable.Map[Int, Array[Double]]()
    val itf = scala.collection.mutable.Map[Int, Array[Double]]()
    // initVec (q153 (id, salt) convention, salt 0=user 1=item) pins the
    // init for the q175 strict gate; default keeps the seeded stream
    def fac(m: scala.collection.mutable.Map[Int, Array[Double]], id: Int,
            salt: Int) =
      m.getOrElseUpdate(id, initVec match {
        case Some(f) => f(id, salt)
        case None => Array.fill(rank)((rng.nextDouble() - 0.5) * 0.1)
      })
    val seen = urm.select(col("u").cast("int"), col("i").cast("int"))
      .as[(Int, Int)].collect()
      .groupBy(_._1).map { case (u, rs) => (u, rs.map(_._2).toSet) }
    val shown: Map[Int, Array[Int]] = impressions match {
      case Some(imp) => imp
        .select(col("u").cast("int"), col("i").cast("int"))
        .as[(Int, Int)].collect()
        .groupBy(_._1).map { case (u, rs) => (u, rs.map(_._2).distinct) }
      case None => Map.empty
    }
    // negatives must come from outside `blocked`; rejection sampling
    // with a bounded guard, then an exact fallback over the explicit
    // complement — None when the user has interacted with every item
    // (the round-1 unbounded loop hung there, and the expired 'outside'
    // guard silently trained a seen item as a negative)
    def drawBlocked(blocked: Set[Int]): Option[Int] = {
      var guard = 0
      while (guard < 100) {
        val j = items(rng.nextInt(items.length))
        if (!blocked.contains(j)) return Some(j)
        guard += 1
      }
      val cand = items.filterNot(blocked.contains)
      if (cand.isEmpty) None else Some(cand(rng.nextInt(cand.length)))
    }
    def drawNegative(u: Int, s: Set[Int]): Option[Int] = samplingMode match {
      case "inside" =>
        val cand = shown.getOrElse(u, Array.empty).filterNot(s.contains)
        if (cand.nonEmpty) Some(cand(rng.nextInt(cand.length)))
        else drawBlocked(s)
      case "outside" =>
        drawBlocked(s ++ shown.getOrElse(u, Array.empty))
      case _ => drawBlocked(s)
    }
    // linear epoch sampling: sample(fraction) is a scan-local Bernoulli
    // draw — the round-1 orderBy(rand).limit was a full URM sort per
    // epoch, O(N log N) shuffle × `epochs` (the reference caps at 1,500
    // epochs, run_parameter_search.py:239)
    val total = seen.valuesIterator.map(_.size.toLong).sum
    (0 until epochs).foreach { ep =>
      // dropout mask renewed per EPOCH (pyx:653-659): each factor kept
      // with probability 1−quota; masked-out factors are invisible to
      // x_uij AND receive no update (incl. no adaptive-cache mutation,
      // pyx:869/894); rank-1 models always keep their only factor.
      // Documented divergence (the ialsItemStep convention): the
      // reference draws its mask as C `rand() > self.dropout_quota` —
      // an int in [0, RAND_MAX] compared against a double in (0,1), so
      // the comparison is true for every draw but rand()==0 and
      // reference dropout virtually never masks a factor. Graft
      // implements the INTENDED Bernoulli(1−quota) semantics the
      // parameter declares, not the scaling bug that defeats it.
      // Drawn from a SEPARATE (seed, epoch) rng — the same convention
      // as the distributed kernel — so turning dropout on does not
      // shift the init/sampling streams of the shared rng: with and
      // without dropout, the kernels differ ONLY through mask
      // application (what the ModelsSpec pin actually asserts).
      val mask: Array[Boolean] = dropoutQuota match {
        case Some(q) =>
          val mrng = new scala.util.Random(seed * 7919L + 104729L * ep)
          val m = Array.fill(rank)(mrng.nextDouble() > q)
          if (rank == 1) m(0) = true
          m
        case None => Array.fill(rank)(true)
      }
      // one mini-batch (pyx:662-718): gradients ACCUMULATE over the
      // batch against batch-start factor values, then apply once,
      // divided by the configured batch size (even for a ragged final
      // batch — pyx:846 divides by self.batch_size unconditionally).
      // Each batch element carries its negative as a THUNK so the
      // default path's rejection draws interleave with lazy factor
      // inits exactly as before (same rng stream), while the injected
      // path (tripleOrder — the q175 deterministic-sampler gate)
      // supplies the negative verbatim.
      def runBatch(batch: Seq[(Int, Int, () => Option[Int])]): Unit = {
        // LinkedHashMap: deterministic application order
        val acc = scala.collection.mutable
          .LinkedHashMap[(Int, Int), Array[Double]]() // (kind 0=u 1=i, id)
        def accFor(kind: Int, id: Int): Array[Double] =
          acc.getOrElseUpdate((kind, id), new Array[Double](rank))
        batch.foreach { case (u, ipos, drawJ) =>
          drawJ().foreach { jneg =>
            val wu = fac(uf, u, 0); val hi = fac(itf, ipos, 1)
            val hj = fac(itf, jneg, 1)
            var xuij = 0.0
            var f = 0
            while (f < rank) {
              if (mask(f)) xuij += wu(f) * (hi(f) - hj(f))
              f += 1
            }
            val sig = 1.0 / (1.0 + math.exp(xuij))
            val au = accFor(0, u); val ai = accFor(1, ipos)
            val aj = accFor(1, jneg)
            f = 0
            while (f < rank) {
              if (mask(f)) {
                ai(f) += sig * wu(f) - reg * hi(f)
                aj(f) += -sig * wu(f) - negReg * hj(f)
                au(f) += sig * (hi(f) - hj(f)) - uReg * wu(f)
              }
              f += 1
            }
          }
        }
        acc.foreach { case ((kind, id), g) =>
          val fvec = if (kind == 0) fac(uf, id, 0) else fac(itf, id, 1)
          var f = 0
          while (f < rank) {
            if (mask(f))
              fvec(f) += lr * adapt.update(kind, id, f, g(f) / batchSize)
            f += 1
          }
        }
        adapt.advance()
      }
      tripleOrder match {
        case Some(ts) =>
          ts.grouped(batchSize).foreach { b =>
            runBatch(b.map { case (u, ipos, jneg) =>
              (u, ipos, () => Some(jneg): Option[Int]) })
          }
        case None =>
          val frac =
            math.min(1.0, 1.25 * samplesPerEpoch / math.max(1L, total))
          val sample = urm.select(col("u").cast("int"), col("i").cast("int"))
            .sample(withReplacement = false, frac, seed + ep)
            .as[(Int, Int)].collect()
            .take(samplesPerEpoch)
          sample.grouped(batchSize).foreach { b =>
            runBatch(b.map { case (u, ipos) =>
              (u, ipos, () => drawNegative(u, seen(u))) })
          }
      }
    }
    (uf.toMap, itf.toMap)
  }

  /** The reference's adaptive_gradient kernel
    * (MatrixFactorizationImpressions_Cython_Epoch.pyx:905-943 +
    * _init_adaptive_gradient_cache :238-313): per entity-factor squared
    * cache for adagrad/rmsprop, first/second moments with bias
    * correction for adam; the β powers exponentiate once per
    * mini-batch (pyx:719-723). Constants are the reference's defaults
    * (gamma=0.995, beta_1=0.9, beta_2=0.999, eps=1e-8). */
  private final class AdaptiveGrad(sgdMode: String, rank: Int) {
    private val useAdaGrad = sgdMode == "adagrad"
    private val useRmsprop = sgdMode == "rmsprop"
    private val useAdam = sgdMode == "adam"
    private val gamma = 0.995
    private val beta1 = 0.9
    private val beta2 = 0.999
    private var b1p = beta1
    private var b2p = beta2
    private val cache =
      scala.collection.mutable.Map[(Int, Int), Array[Double]]()
    private val mom1 =
      scala.collection.mutable.Map[(Int, Int), Array[Double]]()
    private val mom2 =
      scala.collection.mutable.Map[(Int, Int), Array[Double]]()
    private def arr(m: scala.collection.mutable.Map[(Int, Int),
                                                    Array[Double]],
                    k: (Int, Int)): Array[Double] =
      m.getOrElseUpdate(k, new Array[Double](rank))
    def update(kind: Int, id: Int, f: Int, g: Double): Double =
      if (useAdaGrad) {
        val c = arr(cache, (kind, id))
        c(f) += g * g
        g / (math.sqrt(c(f)) + 1e-8)
      } else if (useRmsprop) {
        val c = arr(cache, (kind, id))
        c(f) = c(f) * gamma + (1 - gamma) * g * g
        g / (math.sqrt(c(f)) + 1e-8)
      } else if (useAdam) {
        val a = arr(mom1, (kind, id)); val b = arr(mom2, (kind, id))
        a(f) = a(f) * beta1 + (1 - beta1) * g
        b(f) = b(f) * beta2 + (1 - beta2) * g * g
        (a(f) / (1 - b1p)) / (math.sqrt(b(f) / (1 - b2p)) + 1e-8)
      } else g
    def advance(): Unit = if (useAdam) { b1p *= beta1; b2p *= beta2 }
  }

  /** Per-entity distributed trainer cell: the factor vector plus the
    * adaptive-gradient caches that sgd_mode needs (empty for plain
    * sgd; `c1` = squared-gradient cache for adagrad/rmsprop; `c1`/`c2`
    * = first/second moments for adam — the distributed analog of the
    * reference's sgd_cache arrays, pyx:238-313). Caches live WITH the
    * factors in the partitioned state so an update round stays one
    * narrow co-partitioned join at any |U|. */
  final case class BprFac(f: Array[Double], c1: Array[Double],
                          c2: Array[Double])

  /** Knobs of one distributed BPR update round — the searched SGD
    * surface (run_parameter_search.py:238-245) plus impression-aware
    * negative sampling (impression_sampling_mode, :233-237). `shown`
    * is the distinct (u, i) impression table, persisted by the caller
    * once per training run. */
  final case class BprOpts(
      samplingMode: String = "none", sgdMode: String = "sgd",
      negativeReg: Option[Double] = None, userReg: Option[Double] = None,
      shown: Option[DataFrame] = None,
      dropoutQuota: Option[Double] = None)

  /** L21 at scale — distributed MF-BPR trainer state: both factor
    * matrices live as keyed RDDs, never on the driver. Both carry the
    * same HashPartitioner so (a) per-epoch joins shuffle only the
    * sampled triples, never the factor matrices, and (b) merging the
    * averaged updates is a narrow co-partitioned join — the ml.ALS
    * co-location strategy. */
  final case class BprState(
      userFactors: org.apache.spark.rdd.RDD[(Int, BprFac)],
      itemFactors: org.apache.spark.rdd.RDD[(Int, BprFac)],
      partitioner: org.apache.spark.HashPartitioner)

  /** Hash-initialized partitioned trainer state; adaptive caches are
    * allocated only for the modes that read them. */
  private[recommend] def bprInitState(spark: SparkSession,
                                      triplesBase: DataFrame, rank: Int,
                                      sgdMode: String, seed: Long,
                                      part: org.apache.spark.HashPartitioner,
                                      extraItems: Option[DataFrame] = None)
      : BprState = {
    import spark.implicits._
    val needC1 = sgdMode != "sgd"
    val needC2 = sgdMode == "adam"
    // inside-mode negatives come from the impression log and may name
    // items the URM never saw — they need factor cells too, or the
    // epoch's factor join would silently drop those triples
    val itemIds = extraItems match {
      case Some(extra) =>
        triplesBase.select("i").union(extra.select("i")).distinct()
      case None => triplesBase.select("i").distinct()
    }
    BprState(
      graft.core.CacheScope.persistRdd(
        triplesBase.select("u").distinct().as[Int].rdd
          .map(u => (u, bprInitFac(rank, u, 1, seed, needC1, needC2)))
          .partitionBy(part)),
      graft.core.CacheScope.persistRdd(
        itemIds.as[Int].rdd
          .map(i => (i, bprInitFac(rank, i, 2, seed, needC1, needC2)))
          .partitionBy(part)),
      part)
  }

  /** Checkpoint both factor RDDs to truncate their lineage.
    *
    * RELIABLE checkpoint when a checkpoint dir is available — the
    * files survive unpersist, preserving CacheScope's unpersist-is-
    * always-safe recompute contract; a JVM-temp dir is auto-created
    * ONLY in local mode (on a cluster a driver-local temp path would
    * scatter partitions across executor-local disks and lose them on
    * any cross-executor read). On a cluster with no configured
    * checkpoint dir, fall back to localCheckpoint: lineage still
    * truncates, with the documented caveat that post-release lazy
    * recomputes need the returned frames consumed in-scope.
    *
    * Returns the newly checkpointed pair when reliable; the CALLER
    * deletes the previous generation's files after this one
    * materializes (the new checkpoint is the nearest reliable source
    * for every later state, so the old files are unreachable — left
    * in place they accumulate one full factor snapshot per truncation
    * for the life of a 1500-epoch job). */
  private[recommend] def bprCheckpoint(
      spark: SparkSession, state: BprState,
      prev: Option[(org.apache.spark.rdd.RDD[(Int, BprFac)],
                    org.apache.spark.rdd.RDD[(Int, BprFac)])])
      : Option[(org.apache.spark.rdd.RDD[(Int, BprFac)],
                org.apache.spark.rdd.RDD[(Int, BprFac)])] = {
    val sc = spark.sparkContext
    if (sc.getCheckpointDir.isEmpty && sc.isLocal)
      sc.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
    val reliable = sc.getCheckpointDir.isDefined
    if (reliable) {
      state.userFactors.checkpoint()
      state.itemFactors.checkpoint()
    } else {
      state.userFactors.localCheckpoint()
      state.itemFactors.localCheckpoint()
    }
    state.userFactors.count()
    state.itemFactors.count()
    if (reliable) {
      val conf = spark.sessionState.newHadoopConf()
      prev.foreach { case (u, i) =>
        Seq(u, i).foreach(_.getCheckpointFile.foreach { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          scala.util.Try(p.getFileSystem(conf).delete(p, true))
        })
      }
      Some((state.userFactors, state.itemFactors))
    } else None
  }

  /** One initialized trainer cell (static helper — a nested def here
    * would capture the enclosing object into the task closure). */
  private[recommend] def bprInitFac(rank: Int, id: Int, salt: Int,
                                    seed: Long, needC1: Boolean,
                                    needC2: Boolean): BprFac = BprFac(
    bprInitVec(rank, id, salt, seed),
    if (needC1) new Array[Double](rank) else Array.empty[Double],
    if (needC2) new Array[Double](rank) else Array.empty[Double])

  /** Executor-side mini-batch update: the reference's
    * adaptive_gradient (pyx:905-943) applied to one entity's mean
    * gradient. `b1p`/`b2p` are adam's β powers at the current global
    * batch step (exponentiated once per merge round, pyx:719-723).
    * Pure function on immutable inputs — safe under task retries. */
  private[recommend] def bprApplyUpdate(fac: BprFac, g: Array[Double],
                                        rank: Int, sgdMode: String,
                                        lr: Double, b1p: Double,
                                        b2p: Double,
                                        mask: Array[Boolean] = null)
      : BprFac = {
    // dropout: masked-out factors skip the whole update, adaptive-cache
    // mutation included (pyx:869/894 — the mask guards the apply loop)
    @inline def on(f: Int): Boolean = mask == null || mask(f)
    val f2 = fac.f.clone()
    var f = 0
    sgdMode match {
      case "adagrad" =>
        val c = fac.c1.clone()
        while (f < rank) {
          if (on(f)) {
            c(f) += g(f) * g(f)
            f2(f) += lr * (g(f) / (math.sqrt(c(f)) + 1e-8))
          }
          f += 1
        }
        BprFac(f2, c, fac.c2)
      case "rmsprop" =>
        val gamma = 0.995
        val c = fac.c1.clone()
        while (f < rank) {
          if (on(f)) {
            c(f) = c(f) * gamma + (1 - gamma) * g(f) * g(f)
            f2(f) += lr * (g(f) / (math.sqrt(c(f)) + 1e-8))
          }
          f += 1
        }
        BprFac(f2, c, fac.c2)
      case "adam" =>
        val beta1 = 0.9; val beta2 = 0.999
        val m1 = fac.c1.clone(); val m2 = fac.c2.clone()
        while (f < rank) {
          if (on(f)) {
            m1(f) = m1(f) * beta1 + (1 - beta1) * g(f)
            m2(f) = m2(f) * beta2 + (1 - beta2) * g(f) * g(f)
            f2(f) += lr * ((m1(f) / (1 - b1p)) /
                           (math.sqrt(m2(f) / (1 - b2p)) + 1e-8))
          }
          f += 1
        }
        BprFac(f2, m1, m2)
      case _ =>
        while (f < rank) { if (on(f)) f2(f) += lr * g(f); f += 1 }
        BprFac(f2, fac.c1, fac.c2)
    }
  }

  /** One distributed BPR merge round over keyed factor RDDs (the
    * ml.ALS shape — VERDICT r3 #4):
    *  1. a distributed seeded query samples (u, i⁺, j⁻) triples —
    *     positives from the URM, negatives per the sampling mode:
    *     `none` rand-pick + anti-join rejection, `inside` a
    *     deterministic-hash pick from the user's shown-but-unclicked
    *     impressions via one join + group-argmax (uniform fallback
    *     when a user has none), `outside` rand-pick anti-joined
    *     against seen AND shown (pyx:1010-1084 sampler, distributed);
    *     positive-draw / negative-pick / inside-pick seeds live in
    *     disjoint ranges so the rand streams never coincide;
    *  2. the triples JOIN the factor partitions (u, then i⁺, then j⁻)
    *     to assemble each triple's three factor vectors — shuffles on
    *     the factor keys, the same co-location ml.ALS uses;
    *  3. each triple computes its raw BPR gradients (regularization
    *     included, pyx:700-703) against the round-start snapshot; the
    *     gradients are MEAN-reduced per entity with reduceByKey
    *     (parameter averaging / mini-batch SGD — the standard
    *     distributed compromise; exact sequential semantics are
    *     impossible to distribute, SURVEY §7.4) and applied through
    *     the sgd_mode's adaptive rule in a narrow co-partitioned
    *     outer join ([[bprApplyUpdate]]). For plain sgd this is
    *     algebraically the previous stepped-vector averaging:
    *     mean(f₀ + lr·gₖ) = f₀ + lr·mean(gₖ).
    * NOTHING proportional to |U| ever reaches the driver: no collect,
    * no factor broadcast — only the item-ID array for negative
    * sampling (catalog axis, the bounded dimension the reference
    * itself keeps dense). `step` is the 1-based global batch counter
    * feeding adam's bias correction. */
  def bprEpoch(spark: SparkSession, triplesBase: DataFrame,
               state: BprState, items: Array[Int], total: Long,
               rank: Int, samplesPerEpoch: Int, lr: Double, reg: Double,
               seed: Long, ep: Int, opts: BprOpts = BprOpts(),
               step: Int = 1, maskEpoch: Int = Int.MinValue): BprState = {
    import spark.implicits._
    val nItems = items.length
    // dropout mask renewed per EPOCH like the reference (pyx:653-659
    // draws once per run_epoch, held across all its mini-batches):
    // `maskEpoch` carries the epoch index when the caller runs several
    // merge rounds per epoch (mfBprDistributed's batch loop) so every
    // round of an epoch shares one mask; single-round callers leave it
    // defaulted and the round index `ep` IS the epoch. Derived
    // DETERMINISTICALLY from (seed, epoch) on the driver and captured
    // in the task closures — partition-invariant, stable under
    // retries; null when dropout is off so the hot loops skip the
    // branch cheaply
    val dropMask: Array[Boolean] = opts.dropoutQuota match {
      case Some(q) =>
        require(q > 0.0 && q < 1.0,
          s"dropout_quota must be in (0,1) or None, got $q")
        val epochIdx = if (maskEpoch == Int.MinValue) ep else maskEpoch
        val mrng = new scala.util.Random(seed * 7919L + 104729L * epochIdx)
        val m = Array.fill(rank)(mrng.nextDouble() > q)
        if (rank == 1) m(0) = true
        m
      case None => null
    }
    // 1. linear Bernoulli sample (no per-epoch global sort), 25%
    //    oversampled to absorb anti-join rejections
    val frac = math.min(1.0, 1.25 * samplesPerEpoch / math.max(1L, total))
    val sample = triplesBase
      .sample(withReplacement = false, frac, seed + ep)
    val uniformPick =
      element_at(typedLit(items),
                 (floor(rand(seed + 1000003 + ep) * nItems) + 1)
                   .cast("int"))
    val withNeg = opts.samplingMode match {
      case "inside" if opts.shown.isDefined =>
        // candidates = shown(u) minus seen(u); one deterministic-hash
        // argmax per sampled (u, i⁺) row picks uniformly-by-hash among
        // them — no per-user arrays ever leave the executors
        val cand = sample
          .join(opts.shown.get.select(col("u"), col("i").as("cand")), "u")
          .join(triplesBase.select(col("u"), col("i").as("cand")),
                Seq("u", "cand"), "left_anti")
          // the hash includes the POSITIVE item i, so two triples of
          // the same user in one round draw independent negatives
          // (hashing only (u, cand) would give every triple of a user
          // the same argmax pick)
          .withColumn("r", xxhash64(col("u"), col("i"), col("cand"),
                                    lit(seed + 2000003 + ep)))
        val picked = cand.groupBy("u", "i")
          .agg(max_by(col("cand"), col("r")).as("jneg_in"))
        sample.join(picked, Seq("u", "i"), "left")
          .withColumn("jneg", coalesce(col("jneg_in"), uniformPick))
          .drop("jneg_in")
      case _ => sample.withColumn("jneg", uniformPick)
    }
    // rejection: a negative must be unseen (and, for `outside`, also
    // un-shown); inside-mode picks pass by construction, only their
    // uniform fallbacks can be rejected here
    val afterSeen = withNeg.join(
      triplesBase.select(col("u"), col("i").as("jneg")),
      Seq("u", "jneg"), "left_anti")
    val valid = opts.samplingMode match {
      case "outside" if opts.shown.isDefined =>
        afterSeen.join(
          opts.shown.get.select(col("u"), col("i").as("jneg")),
          Seq("u", "jneg"), "left_anti")
      case _ => afterSeen
    }
    // 2. assemble factor vectors by joining the factor partitions —
    //    the factor RDDs are pre-partitioned, so each join shuffles
    //    only the (sampled, bounded) triple side
    val part = state.partitioner
    val triples = valid.select("u", "i", "jneg").as[(Int, Int, Int)].rdd
    val joined = triples
      .map { case (u, i, j) => (u, (i, j)) }
      .join(state.userFactors, part)
      .map { case (u, ((i, j), wu)) => (i, (u, j, wu.f)) }
      .join(state.itemFactors, part)
      .map { case (i, ((u, j, wu), hi)) => (j, (u, i, wu, hi.f)) }
      .join(state.itemFactors, part)
    // 3. raw gradients per triple vs the snapshot; mean per entity
    val negReg = opts.negativeReg.getOrElse(reg)
    val uReg = opts.userReg.getOrElse(reg)
    val mask = dropMask // local val: don't capture `this` in the closure
    val grads = joined.flatMap { case (j, ((u, i, wu, hi), hjFac)) =>
      val hj = hjFac.f
      var x = 0.0
      var f = 0
      while (f < rank) {
        if (mask == null || mask(f)) x += wu(f) * (hi(f) - hj(f))
        f += 1
      }
      val sig = 1.0 / (1.0 + math.exp(x))
      val gu = new Array[Double](rank)
      val gi = new Array[Double](rank)
      val gj = new Array[Double](rank)
      f = 0
      while (f < rank) {
        if (mask == null || mask(f)) {
          gi(f) = sig * wu(f) - reg * hi(f)
          gj(f) = -sig * wu(f) - negReg * hj(f)
          gu(f) = sig * (hi(f) - hj(f)) - uReg * wu(f)
        }
        f += 1
      }
      Iterator((("u", u), gu), (("i", i), gi), (("i", j), gj))
    }
    // persisted: `meanGrad` feeds BOTH the user and item update
    // branches — without it each branch re-executes the whole round
    // lineage (sample, three joins, gradient flatMap, reduceByKey)
    val meanGrad = grads
      .mapValues(v => (v, 1))
      .reduceByKey((x: (Array[Double], Int), y: (Array[Double], Int)) => {
        val s = x._1.clone()
        var f = 0
        while (f < rank) { s(f) += y._1(f); f += 1 }
        (s, x._2 + y._2)
      })
      .mapValues(sn => sn._1.map(_ / sn._2))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val avgU = meanGrad.collect { case (("u", id), v) => (id, v) }
      .partitionBy(part)
    val avgI = meanGrad.collect { case (("i", id), v) => (id, v) }
      .partitionBy(part)
    // merge: touched ids step through the adaptive rule, others keep
    // their cell — co-partitioned, so the outer join is narrow (no
    // factor shuffle); adam's β powers are scalars computed here from
    // the global step, not state shipped around
    val sgdMode = opts.sgdMode
    val b1p = math.pow(0.9, step)
    val b2p = math.pow(0.999, step)
    val newU = graft.core.CacheScope.persistRdd(
      state.userFactors.leftOuterJoin(avgU, part)
        .mapValues { case (old, upd) =>
          upd.map(g => bprApplyUpdate(old, g, rank, sgdMode, lr, b1p,
                                      b2p, mask))
            .getOrElse(old)
        })
    val newI = graft.core.CacheScope.persistRdd(
      state.itemFactors.leftOuterJoin(avgI, part)
        .mapValues { case (old, upd) =>
          upd.map(g => bprApplyUpdate(old, g, rank, sgdMode, lr, b1p,
                                      b2p, mask))
            .getOrElse(old)
        })
    newU.count(); newI.count() // materialize before releasing parents
    meanGrad.unpersist(false)
    state.userFactors.unpersist(false)
    state.itemFactors.unpersist(false)
    BprState(newU, newI, part)
  }

  /** Factor partitioner sized by state volume, not a fixed core count:
    * ceil(bytes / 64 MB) keeps every partition spill-safe at any |U|,
    * and the min(defaultParallelism, entities/50k) term supplies
    * baseline parallelism once there is enough data to amortize a
    * task. At bench scale the whole factor state is under 1 MB — the
    * previous unconditional defaultParallelism partitioner scheduled
    * 32 near-empty tasks across ~10 stages per epoch, pure scheduler
    * tax; at 1B users × rank 8 the byte term takes over (~1000
    * partitions before the parallelism floor). */
  private[recommend] def bprPartitioner(spark: SparkSession,
                                        nEntities: Long, rank: Int,
                                        sgdMode: String = "sgd")
      : org.apache.spark.HashPartitioner = {
    // adaptive modes carry 1 (adagrad/rmsprop) or 2 (adam) cache
    // vectors per entity alongside the factors — size for the real
    // per-partition state, not just the factor bytes
    val vectorsPerEntity = sgdMode match {
      case "adam" => 3
      case "adagrad" | "rmsprop" => 2
      case _ => 1
    }
    val bytes = nEntities * rank * 8L * vectorsPerEntity
    val bySize = math.ceil(bytes / (64.0 * 1024 * 1024)).toInt
    val byParallelism = math.min(
      spark.sparkContext.defaultParallelism.toLong, nEntities / 50000L)
    new org.apache.spark.HashPartitioner(
      math.max(1, math.max(bySize, byParallelism.toInt)))
  }

  /** Deterministic hash-seeded factor init (same device as [[nmf]]) —
    * distributed init must not depend on a sequential driver RNG. */
  private[recommend] def bprInitVec(rank: Int, id: Int, salt: Int,
                                    seed: Long): Array[Double] =
    Array.tabulate(rank) { f =>
      val h = scala.util.hashing.MurmurHash3
        .productHash((id, f, salt, seed))
      (((h & 0x7fffffff) % 1000) / 1000.0 - 0.5) * 0.1
    }

  /** L21 at scale — distributed MF-BPR: [[bprEpoch]] iterated from
    * hash-initialized factor RDDs, with the full searched SGD surface
    * threaded through (run_parameter_search.py:238-245): sgd_mode,
    * split negative/user regularization, impression-aware sampling
    * modes, and batch_size. `batchSize` maps to UPDATE FREQUENCY at a
    * CONSTANT per-epoch sample budget: each epoch runs
    * ceil(samplesPerEpoch / batchSize) sequential merge rounds (one
    * round = one mini-batch, exactly the reference's batch loop shape,
    * pyx:662-727) with the epoch budget spread evenly across them;
    * `maxBatchesPerEpoch` caps the round count so a smoke-tier caller
    * can bound per-trial scheduling cost (the budget re-spreads over
    * the capped rounds — budget never varies with batch size);
    * `batchSize <= 0` keeps the historical one-round-per-epoch
    * behavior. Returns
    * (u, factors) and (i, factors) DataFrames — still distributed;
    * callers that need local maps (tests) collect explicitly. */
  def mfBprDistributed(spark: SparkSession, urm: DataFrame, rank: Int,
                       epochs: Int, samplesPerEpoch: Int, lr: Double,
                       reg: Double, seed: Long,
                       impressions: Option[DataFrame] = None,
                       samplingMode: String = "none",
                       sgdMode: String = "sgd",
                       negativeReg: Option[Double] = None,
                       userReg: Option[Double] = None,
                       batchSize: Int = 0,
                       maxBatchesPerEpoch: Int = Int.MaxValue,
                       dropoutQuota: Option[Double] = None)
      : (DataFrame, DataFrame) = {
    import spark.implicits._
    require(Seq("none", "inside", "outside").contains(samplingMode))
    require(Seq("sgd", "adagrad", "rmsprop", "adam").contains(sgdMode))
    // 64-bit id spaces (the r12 sf3 finding): try the raw int path
    // (zero overhead in range — the draws/init see the very same
    // integer ids as before, so the value-pinned gates hold) and on
    // the ANSI cast overflow densify over the union with the
    // impressions frame (it shares the id space), refit on [0, n)
    // indices, and re-key both factor frames to the original ids.
    // The overflow surfaces at the triples persist — the first
    // action — so the discarded work is one early stage.
    try {
    val triplesBase = graft.core.CacheScope.persist(
      urm.select(col("u").cast("int").as("u"),
                 col("i").cast("int").as("i")))
    val shown = impressions.map { imp =>
      graft.core.CacheScope.persist(
        imp.select(col("u").cast("int").as("u"),
                   col("i").cast("int").as("i")).distinct())
    }
    val items = triplesBase.select("i").distinct().as[Int].collect().sorted
    val total = triplesBase.count()
    val nUsers = triplesBase.select("u").distinct().count()
    val part = bprPartitioner(spark, nUsers + items.length, rank, sgdMode)
    var state = bprInitState(spark, triplesBase, rank, sgdMode, seed,
                             part, extraItems = shown)
    val opts = BprOpts(samplingMode, sgdMode, negativeReg, userReg, shown,
                       dropoutQuota)
    // batch_size sets UPDATE FREQUENCY at a CONSTANT per-epoch sample
    // budget (the reference trains n samples per epoch in n/batch
    // batches — budget never varies with batch size): rounds =
    // ceil(samples / batch), capped for smoke tiers, and the budget
    // re-spreads over the capped rounds. Tying perRound to batchSize
    // directly would turn the searched dimension into a sample-budget
    // knob (batch=1 → 2 samples/epoch under a cap of 2) and bias the
    // search toward large batches on budget alone.
    val (roundsPerEpoch, perRound) =
      if (batchSize <= 0 || batchSize >= samplesPerEpoch)
        (1, samplesPerEpoch)
      else {
        val r = math.min(maxBatchesPerEpoch,
                         math.ceil(samplesPerEpoch.toDouble / batchSize)
                           .toInt)
        (r, math.ceil(samplesPerEpoch.toDouble / r).toInt)
      }
    // `step` numbers merge rounds globally (adam bias correction); it
    // also serves as the per-round seed offset — sequential, so the
    // disjoint seed ranges inside bprEpoch stay disjoint, and for the
    // default one-round-per-epoch path it equals the historical `ep`
    var step = 0
    val totalRounds = epochs.toLong * roundsPerEpoch
    var lastCkpt: Option[(org.apache.spark.rdd.RDD[(Int, BprFac)],
                          org.apache.spark.rdd.RDD[(Int, BprFac)])] = None
    (0 until epochs).foreach { epIdx =>
      (0 until roundsPerEpoch).foreach { _ =>
        step += 1
        state = bprEpoch(spark, triplesBase, state, items, total, rank,
                         perRound, lr, reg, seed, step - 1, opts, step,
                         maskEpoch = epIdx)
        // lineage truncation every 16 merge rounds (the PageRank
        // device): each round's outer join references the previous
        // state once, so the DAG grows linearly — at the reference's
        // 1500-epoch budget the un-truncated chain would dominate
        // task-closure serialization and eventually overflow plan
        // analysis. See bprCheckpoint for the reliable-vs-local mode
        // choice and old-generation cleanup. Skipped for the final
        // state (no truncation needed after the last round).
        if (step % 16 == 0 && step < totalRounds)
          lastCkpt = bprCheckpoint(spark, state, lastCkpt)
      }
    }
    (state.userFactors.mapValues(_.f).toDF("u", "factors"),
     state.itemFactors.mapValues(_.f).toDF("i", "factors"))
    } catch {
      case e: Throwable if isCastOverflow(e) &&
          (idsExceedIntRange(urm, "u", "i") ||
           impressions.exists(idsExceedIntRange(_, "u", "i"))) =>
        val (uMap, iMap, urmD, impD) = denseRemapUi(urm, impressions)
        val (uf, itf) = mfBprDistributed(spark, urmD, rank, epochs,
          samplesPerEpoch, lr, reg, seed, impD, samplingMode, sgdMode,
          negativeReg, userReg, batchSize, maxBatchesPerEpoch,
          dropoutQuota)
        (rekeyTo(uf, "u", uMap), rekeyTo(itf, "i", iMap))
    }
  }

  /** L22 result: factor matrices, bias terms, and the per-epoch train
    * MSE trace (the reference prints cumulative_loss per epoch). */
  final case class FunkSvdModel(
      userFactors: Map[Int, Array[Double]],
      itemFactors: Map[Int, Array[Double]],
      globalBias: Double,
      userBias: Map[Int, Double],
      itemBias: Map[Int, Double],
      mseHistory: Seq[Double])

  /** L22 — FunkSVD SGD with biases and negative-interactions quota
    * (reference: MatrixFactorizationImpressions_Cython_Epoch.pyx:330-448
    * FUNK_SVD epoch, 945-1002 MSE sampler):
    *  - users drawn uniformly among those with 0 < |profile| < |items|;
    *  - each draw is a NEGATIVE (unseen item, rating 0) with probability
    *    `negativeQuota`, else a uniform positive interaction — the
    *    quota models unclicked impressions as weak negatives;
    *  - prediction = μ + b_u + b_i + w_u·h_i; MSE gradient step on all
    *    five parameter groups (pyx:370-400).
    * The in-process kernel mirrors the reference's Cython (sequential
    * SGD is not distributable without changing semantics); the
    * data-scale path for factorization remains ials/mfBprDistributed. */
  def funkSvdSgd(spark: SparkSession, urm: DataFrame, rank: Int,
                 epochs: Int, samplesPerEpoch: Int, lr: Double,
                 reg: Double, biasReg: Double, negativeQuota: Double,
                 seed: Long,
                 sampleOrder: Option[Seq[(Int, Int, Double)]] = None,
                 initVec: Option[(Int, Int) => Array[Double]] = None)
      : FunkSvdModel = {
    import spark.implicits._
    require(negativeQuota >= 0.0 && negativeQuota < 1.0)
    val items = urm.select(col("i").cast("int")).distinct()
      .as[Int].collect().sorted
    val ratings = urm.select(col("u").cast("int"), col("i").cast("int"),
                             col("v").cast("double"))
      .as[(Int, Int, Double)].collect()
      .groupBy(_._1).map { case (u, rs) =>
        (u, rs.map(r => (r._2, r._3)).toMap)
      }
    // eligible users: at least one positive and at least one negative
    val users = ratings.collect {
      case (u, prof) if prof.nonEmpty && prof.size < items.length => u
    }.toArray.sorted
    require(users.nonEmpty, "no trainable users")
    val rng = new scala.util.Random(seed)
    val uf = scala.collection.mutable.Map[Int, Array[Double]]()
    val itf = scala.collection.mutable.Map[Int, Array[Double]]()
    // initVec (the q153 (id, salt) convention, salt 0=user 1=item) makes
    // the init rational/deterministic for the q174 strict gate; the
    // default stays the seeded uniform init, stream untouched
    def fac(m: scala.collection.mutable.Map[Int, Array[Double]], id: Int,
            salt: Int) =
      m.getOrElseUpdate(id, initVec match {
        case Some(f) => f(id, salt)
        case None => Array.fill(rank)((rng.nextDouble() - 0.5) * 0.1)
      })
    var mu = 0.0
    val bu = scala.collection.mutable.Map[Int, Double]().withDefaultValue(0.0)
    val bi = scala.collection.mutable.Map[Int, Double]().withDefaultValue(0.0)
    val mseHistory = scala.collection.mutable.ArrayBuffer[Double]()
    // sampleOrder INJECTS the epoch's (u, item, rating) draws verbatim —
    // the deterministic-sampler convention the q174 gate needs: SGD is
    // deterministic given the sample order, so the update numerics
    // become oracle-checkable while the default path keeps the seeded
    // sampler (reference: sampleMSE_Cython, pyx:948-1005)
    val perEpoch = sampleOrder.map(_.size).getOrElse(samplesPerEpoch)
    (0 until epochs).foreach { _ =>
      var loss = 0.0
      var s = 0
      while (s < perEpoch) {
        val (u, item, rating) = sampleOrder match {
          case Some(so) => so(s)
          case None =>
            val u0 = users(rng.nextInt(users.length))
            val prof = ratings(u0)
            // negative draw with probability negativeQuota (the
            // reference's MSE_negative_interactions_quota; its rand()
            // comparison at pyx:968 reads inverted — the documented
            // intent, a share of rating-0 unseen samples, is what's
            // implemented here)
            if (negativeQuota > 0 && rng.nextDouble() < negativeQuota) {
              var j = items(rng.nextInt(items.length))
              while (prof.contains(j)) j = items(rng.nextInt(items.length))
              (u0, j, 0.0)
            } else {
              val keys = prof.keysIterator.toIndexedSeq
              val i = keys(rng.nextInt(keys.size))
              (u0, i, prof(i))
            }
        }
        val wu = fac(uf, u, 0); val hi = fac(itf, item, 1)
        var pred = mu + bu(u) + bi(item)
        var f = 0
        while (f < rank) { pred += wu(f) * hi(f); f += 1 }
        val err = rating - pred
        loss += err * err
        mu += lr * (err - biasReg * mu)
        bu(u) += lr * (err - biasReg * bu(u))
        bi(item) += lr * (err - biasReg * bi(item))
        f = 0
        while (f < rank) {
          val hOld = hi(f); val wOld = wu(f)
          hi(f) += lr * (err * wOld - reg * hOld)
          wu(f) += lr * (err * hOld - reg * wOld)
          f += 1
        }
        s += 1
      }
      mseHistory += loss / perEpoch
    }
    FunkSvdModel(uf.toMap, itf.toMap, mu, bu.toMap, bi.toMap,
                 mseHistory.toSeq)
  }

  /** L22 (AsySVD half) result: Y (the item-indexed "user factor" matrix
    * the reference trains in place of per-user factors), the item
    * factors H, biases, the per-epoch train MSE trace, and the
    * profile-estimated user factors W = URM·Y / √|profile|. */
  final case class AsySvdModel(
      itemFactorsY: Map[Int, Array[Double]],
      itemFactors: Map[Int, Array[Double]],
      globalBias: Double,
      userBias: Map[Int, Double],
      itemBias: Map[Int, Double],
      userFactors: Map[Int, Array[Double]],
      mseHistory: Seq[Double])

  /** L22 — AsySVD (asymmetric SVD): no per-user free parameters — a
    * user's factor vector is derived from the items in their profile,
    * w_u = (Σ_{l∈profile(u)} Y_l) / √|profile(u)|, and only the two
    * item-indexed matrices Y and H train
    * (reference: MatrixFactorizationImpressions_Cython_Epoch.pyx:449-630
    * ASY_SVD epoch; user-factor estimation
    * MatrixFactorizationImpressions_Cython.py:305-326).
    * Per MSE sample (same sampler as FunkSVD — uniform eligible user,
    * negativeQuota share of rating-0 unseen items):
    *   pred = μ + b_u + b_i + w_u·H_i,  err = rating − pred;
    *   biases step like FunkSVD; Y_l += lr·(err·H_i − reg·Y_l) for every
    *   profile item l (the reference omits the 1/√n factor from the
    *   gradient — mirrored here); H_i += lr·(err·w_u − reg·H_i) with the
    *   pre-update w_u.
    * In-process kernel mirroring the reference's Cython (sequential SGD,
    * same justification as funkSvdSgd); both trained matrices are
    * item²-bounded and the final user-factor estimation is a single
    * profile-sum — the distributable step. */
  def asySvdSgd(spark: SparkSession, urm: DataFrame, rank: Int,
                epochs: Int, samplesPerEpoch: Int, lr: Double,
                reg: Double, biasReg: Double, negativeQuota: Double,
                seed: Long,
                sampleOrder: Option[Seq[(Int, Int, Double)]] = None,
                initVec: Option[(Int, Int) => Array[Double]] = None)
      : AsySvdModel = {
    import spark.implicits._
    require(negativeQuota >= 0.0 && negativeQuota < 1.0)
    val items = urm.select(col("i").cast("int")).distinct()
      .as[Int].collect().sorted
    val ratings = urm.select(col("u").cast("int"), col("i").cast("int"),
                             col("v").cast("double"))
      .as[(Int, Int, Double)].collect()
      .groupBy(_._1).map { case (u, rs) =>
        (u, rs.map(r => (r._2, r._3)).toMap)
      }
    val profiles = ratings.map { case (u, prof) =>
      (u, prof.keys.toArray.sorted)
    }
    val users = ratings.collect {
      case (u, prof) if prof.nonEmpty && prof.size < items.length => u
    }.toArray.sorted
    require(users.nonEmpty, "no trainable users")
    val rng = new scala.util.Random(seed)
    val yf = scala.collection.mutable.Map[Int, Array[Double]]()
    val hf = scala.collection.mutable.Map[Int, Array[Double]]()
    // initVec: the q153 (id, salt) convention — salt 0 = Y (the
    // item-indexed user-side matrix), salt 1 = H — for the q176 gate
    def fac(m: scala.collection.mutable.Map[Int, Array[Double]], id: Int,
            salt: Int) =
      m.getOrElseUpdate(id, initVec match {
        case Some(f) => f(id, salt)
        case None => Array.fill(rank)((rng.nextDouble() - 0.5) * 0.1)
      })
    var mu = 0.0
    val bu = scala.collection.mutable.Map[Int, Double]().withDefaultValue(0.0)
    val bi = scala.collection.mutable.Map[Int, Double]().withDefaultValue(0.0)
    val mseHistory = scala.collection.mutable.ArrayBuffer[Double]()
    // sampleOrder injects the epoch's (u, item, rating) draws verbatim
    // (the funkSvdSgd convention — deterministic-sampler gate q176)
    val perEpoch = sampleOrder.map(_.size).getOrElse(samplesPerEpoch)
    (0 until epochs).foreach { _ =>
      var loss = 0.0
      var s = 0
      while (s < perEpoch) {
        val (u, item, rating) = sampleOrder match {
          case Some(so) => so(s)
          case None =>
            val u0 = users(rng.nextInt(users.length))
            val prof = ratings(u0)
            val profItems0 = profiles(u0)
            if (negativeQuota > 0 && rng.nextDouble() < negativeQuota) {
              var j = items(rng.nextInt(items.length))
              while (prof.contains(j)) j = items(rng.nextInt(items.length))
              (u0, j, 0.0)
            } else {
              val i = profItems0(rng.nextInt(profItems0.length))
              (u0, i, prof(i))
            }
        }
        val profItems = profiles(u)
        // w_u accumulated from profile-item Y factors, scaled 1/√n
        val denom = math.sqrt(profItems.length.toDouble)
        val acc = new Array[Double](rank)
        profItems.foreach { l =>
          val yl = fac(yf, l, 0)
          var f = 0
          while (f < rank) { acc(f) += yl(f); f += 1 }
        }
        var f = 0
        while (f < rank) { acc(f) /= denom; f += 1 }
        val hi = fac(hf, item, 1)
        var pred = mu + bu(u) + bi(item)
        f = 0
        while (f < rank) { pred += acc(f) * hi(f); f += 1 }
        val err = rating - pred
        loss += err * err
        mu += lr * (err - biasReg * mu)
        bu(u) += lr * (err - biasReg * bu(u))
        bi(item) += lr * (err - biasReg * bi(item))
        // Y update over profile items against the PRE-update H_i
        profItems.foreach { l =>
          val yl = yf(l)
          var g = 0
          while (g < rank) {
            yl(g) += lr * (err * hi(g) - reg * yl(g))
            g += 1
          }
        }
        // H update with the pre-update accumulated w_u
        f = 0
        while (f < rank) {
          hi(f) += lr * (err * acc(f) - reg * hi(f))
          f += 1
        }
        s += 1
      }
      mseHistory += loss / perEpoch
    }
    // user-factor estimation: W = URM·Y / √|profile| (reference
    // _estimate_user_factors) — in this in-process mirror a profile sum;
    // at scale the identical estimate is one join-aggregation
    val userFactors = profiles.map { case (u, profItems) =>
      val acc = new Array[Double](rank)
      profItems.foreach { l =>
        yf.get(l).foreach { yl =>
          var f = 0
          while (f < rank) { acc(f) += yl(f); f += 1 }
        }
      }
      val denom = math.sqrt(profItems.length.toDouble)
      if (denom > 0) {
        var f = 0
        while (f < rank) { acc(f) /= denom; f += 1 }
      }
      (u, acc)
    }
    AsySvdModel(yf.toMap, hf.toMap, mu, bu.toMap, bi.toMap,
                userFactors, mseHistory.toSeq)
  }

  /** L24 — SLIM BPR: item-item weight matrix trained with the BPR
    * objective (reference: SLIM_BPR/Cython/SLIM_BPR_Cython_Epoch.pyx:
    * 212-310): for each (u, i⁺, j⁻) triple,
    * x_uij = Σ_{l∈profile(u)} (S[i,l] − S[j,l]), gradient σ(−x_uij),
    * then S[i,l] += lr·(g − λᵢ·S[i,l]) and S[j,l] −= lr·(g − λⱼ·S[j,l])
    * for profile items l (diagonal pinned to zero). Returns (i, j, w)
    * triples in the engine's scoring convention (j = scored target,
    * i = profile neighbor), top-K per column j.
    * In-process kernel mirroring the reference's Cython (same
    * justification as funkSvdSgd); S is item²-bounded. */
  def slimBpr(spark: SparkSession, urm: DataFrame, epochs: Int,
              samplesPerEpoch: Int, lr: Double, liReg: Double,
              ljReg: Double, topK: Int, seed: Long,
              tripleOrder: Option[Seq[(Int, Int, Int)]] = None)
      : DataFrame = {
    import spark.implicits._
    val items = urm.select(col("i").cast("int")).distinct()
      .as[Int].collect().sorted
    val seen = urm.select(col("u").cast("int"), col("i").cast("int"))
      .as[(Int, Int)].collect()
      .groupBy(_._1).map { case (u, rs) => (u, rs.map(_._2).toArray) }
    val users = seen.collect {
      case (u, prof) if prof.nonEmpty && prof.length < items.length => u
    }.toArray.sorted
    require(users.nonEmpty, "no trainable users")
    val rng = new scala.util.Random(seed)
    val seenSets = seen.map { case (u, p) => (u, p.toSet) }
    // S[target][neighbor], rows created lazily — item²-bounded
    val sMat = scala.collection.mutable.Map[Int,
      scala.collection.mutable.Map[Int, Double]]()
    def sRow(t: Int) = sMat.getOrElseUpdate(t,
      scala.collection.mutable.Map[Int, Double]().withDefaultValue(0.0))
    // one BPR triple update (pyx:212-310 dense path); tripleOrder
    // injects the (u, i⁺, j⁻) draws verbatim — the deterministic-
    // sampler convention the q177 strict gate needs
    def processTriple(u: Int, ipos: Int, jneg: Int): Unit = {
      val prof = seen(u)
      val si = sRow(ipos); val sj = sRow(jneg)
      var x = 0.0
      prof.foreach { l => x += si(l) - sj(l) }
      val g = 1.0 / (1.0 + math.exp(x))
      prof.foreach { l =>
        if (l != ipos) si(l) += lr * (g - liReg * si(l))
        if (l != jneg) sj(l) -= lr * (g - ljReg * sj(l))
      }
    }
    (0 until epochs).foreach { _ =>
      tripleOrder match {
        case Some(ts) => ts.foreach { case (u, i, j) =>
          processTriple(u, i, j) }
        case None =>
          var s = 0
          while (s < samplesPerEpoch) {
            val u = users(rng.nextInt(users.length))
            val prof = seen(u)
            val ipos = prof(rng.nextInt(prof.length))
            val blocked = seenSets(u)
            var jneg = items(rng.nextInt(items.length))
            while (blocked.contains(jneg))
              jneg = items(rng.nextInt(items.length))
            processTriple(u, ipos, jneg)
            s += 1
          }
      }
    }
    val triples = sMat.iterator.flatMap { case (t, row) =>
      row.iterator.collect { case (l, w) if w != 0.0 => (l, t, w) }
    }.toSeq
    import graft.similarity.Similarity
    Similarity.topK(triples.toDF("i", "j", "w"), topK)
      .select("i", "j", "w")
  }

  /** L19 — NMF with the reference's full declared surface
    * (MatrixFactorization/NMFRecommender.py:36-73 delegates to
    * sklearn.decomposition.NMF):
    *   - `solver = multiplicative_update` (Lee-Seung 2001 MU):
    *       frobenius: W ← W ∘ (V·Hᵀ) / (W·HᵀH + λ₁ + λ₂W)
    *       kullback-leibler: W ← W ∘ ((V ⊘ WHᵀ)·H) / (1·H + λ₁ + λ₂W)
    *     (H symmetric with the UPDATED W — sklearn's update order).
    *   - `solver = coordinate_descent` (sklearn's cd = per-component
    *     HALS sweeps): w_f ← max(0, w_f − (−(VHᵀ)_f + (wG)_f + λ₁)
    *     / (G_ff + λ₂)), components swept in FIXED order 0..k−1.
    *     Documented divergence: the reference passes shuffle=True with
    *     random_state=None — a nondeterministic coordinate order no
    *     oracle can pin; the fixed order is the determinate reading
    *     (the np.empty / rand()-dropout convention). sklearn's cd
    *     supports frobenius only — KL+cd raises, exactly as sklearn.
    *   - `l1Ratio` splits `regStrength` into λ₁ = α·ratio (L1) and
    *     λ₂ = α·(1−ratio) (L2) per sklearn. The reference leaves
    *     sklearn's alpha at its 0.0 default, so ITS l1_ratio is inert
    *     — regStrength defaults to 0.0 to match; pass α > 0 for the
    *     semantics the parameter declares.
    * Spark shape: V stays a distributed triple set; V·Hᵀ, VᵀW and the
    * KL quotient aggregations are join-aggregations partitioned by
    * user/item; HᵀH / WᵀW / column sums are k×k (or k) partial-
    * aggregated scalars — nothing user-scaled ever reaches one node,
    * so every variant is 100 TB-shaped (H is broadcast per epoch,
    * k·|items| — the bounded catalog axis). Factors init deterministic
    * positive (hash-seeded), so results don't depend on partition
    * layout. Returns (userFactors, itemFactors) as (id, factors). */
  def nmf(spark: SparkSession, urm: DataFrame, rank: Int, iters: Int,
          seed: Long,
          solver: String = "multiplicative_update",
          betaLoss: String = "frobenius",
          l1Ratio: Double = 0.5,
          regStrength: Double = 0.0,
          initType: String = "random"): (DataFrame, DataFrame) = {
    require(Set("random", "nndsvda")(initType),
      s"init_type must be random|nndsvda, got $initType")
    if (initType == "nndsvda") {
      import spark.implicits._
      val nItems = urm.select(max(col("i").cast("int"))).first().getInt(0) + 1
      val (w0, h0) = nndsvdaInit(spark, urm, rank, nItems)
      nmfFromFrames(spark, urm, rank, iters, w0, h0, solver, betaLoss,
                    l1Ratio, regStrength)
    } else {
      def initVec(id: Int, salt: Int): Array[Double] =
        Array.tabulate(rank) { f =>
          val h = scala.util.hashing.MurmurHash3
            .productHash((id, f, salt, seed))
          0.1 + ((h & 0x7fffffff) % 1000) / 1000.0
        }
      nmfFrom(spark, urm, rank, iters, initVec, solver, betaLoss,
              l1Ratio, regStrength)
    }
  }

  /** NNDSVDa factor initialization (Boutsidis & Gallopoulos 2008; the
    * reference's init_type="nndsvda" delegates to sklearn
    * `_initialize_nmf`, NMFRecommender.py:26-28): truncated SVD of the
    * URM, each singular pair split into its positive/negative parts,
    * the heavier product kept and σ-scaled; the 'a' variant fills the
    * structural zeros with the matrix mean. DETERMINISTIC given the
    * URM (no random state) and sign-invariant: a global flip of a
    * singular pair swaps the positive/negative parts AND their norms,
    * so the max-product branch re-selects the same vectors.
    * Scale shape: right singular vectors come from the bounded item×
    * item Gram (driver eigensolve, [[pureSvdItemFactors]]'s guard);
    * left ones are the distributed map u_j = X·v_j/σ_j — one
    * join-aggregation per user, then a 2k-scalar norm aggregate; the
    * user axis never collects. Users absent from the URM get no row
    * (the determinate reading of sklearn's dense zero rows — an
    * all-avg row for a user with no data carries no information).
    * Returns (userInit (u, factors), itemInit (i, factors)). */
  def nndsvdaInit(spark: SparkSession, urm: DataFrame, rank: Int,
                  nItems: Int, maxItems: Int = 2000)
      : (DataFrame, DataFrame) = {
    require(nItems <= maxItems,
      s"NNDSVDa dense eigensolve guarded at $maxItems items; got $nItems")
    // the Gram eigensolve yields at most nItems components; a larger
    // rank would index past vMat below (sklearn's NNDSVD carries the
    // same n_components <= n_features precondition)
    require(rank <= nItems,
      s"NNDSVDa rank must be <= nItems; got rank=$rank, nItems=$nItems")
    import spark.implicits._
    val tri = graft.core.CacheScope.persistRdd(
      urm.select(col("u").cast("int"), col("i").cast("int"),
                 col("v").cast("double"))
        .as[(Int, Int, Double)].rdd)
    // item Gram → right singular vectors + σ (the pureSvd path)
    val a = urm.select(col("u").cast("int").as("u"),
                       col("i").cast("int").as("i1"),
                       col("v").cast("double").as("v1"))
    val b = urm.select(col("u").cast("int").as("u"),
                       col("i").cast("int").as("i2"),
                       col("v").cast("double").as("v2"))
    val gramRows = a.join(b, "u")
      .groupBy(col("i1"), col("i2"))
      .agg(sum(col("v1") * col("v2")).as("g"))
      .collect()
    val gMat = BDM.zeros[Double](nItems, nItems)
    gramRows.foreach(r => gMat(r.getInt(0), r.getInt(1)) = r.getDouble(2))
    val es = eigSym(gMat)
    val order = (0 until nItems).sortBy(f => -es.eigenvalues(f)).take(rank)
    val sig = order.map(f => math.sqrt(math.max(es.eigenvalues(f), 0.0)))
      .toArray
    val vMat: Array[Array[Double]] = // rank × nItems right vectors
      order.map(f => Array.tabulate(nItems)(i => es.eigenvectors(i, f)))
        .toArray
    val eps = 1e-12
    // left singular vectors, distributed: u_j(u) = Σ_i v_ui·v_j(i)/σ_j
    val bcV = graft.core.CacheScope.trackBroadcast(
      spark.sparkContext.broadcast((vMat, sig)))
    val uRows = graft.core.CacheScope.persistRdd(
      tri.map { case (u, i, v) =>
        val (vm, s) = bcV.value
        (u, Array.tabulate(rank)(j =>
          if (s(j) > eps) v * vm(j)(i) / s(j) else 0.0))
      }.reduceByKey((x, y) => Array.tabulate(rank)(f => x(f) + y(f))))
    // positive/negative part norms per component: 2k scalars
    val colNorms = uRows.aggregate(Array.fill(2 * rank)(0.0))(
      (acc, kv) => {
        var j = 0
        while (j < rank) {
          val x = kv._2(j)
          if (x > 0) acc(j) += x * x else acc(rank + j) += x * x
          j += 1
        }
        acc
      },
      (x, y) => { var j = 0
        while (j < 2 * rank) { x(j) += y(j); j += 1 }; x })
    val xpN = Array.tabulate(rank)(j => math.sqrt(colNorms(j)))
    val xnN = Array.tabulate(rank)(j => math.sqrt(colNorms(rank + j)))
    val ypN = vMat.map(r => math.sqrt(r.map(x => math.max(x, 0.0))
      .map(x => x * x).sum))
    val ynN = vMat.map(r => math.sqrt(r.map(x => math.min(x, 0.0))
      .map(x => x * x).sum))
    // per-component branch: (usePositive, user scale, item scale);
    // j = 0 is the Perron pair — abs() with scale √σ₀
    val plan: Array[(Boolean, Double, Double)] = Array.tabulate(rank) { j =>
      if (j == 0) (true, math.sqrt(sig(0)), math.sqrt(sig(0)))
      else {
        val mP = xpN(j) * ypN(j); val mN = xnN(j) * ynN(j)
        if (mP >= mN) {
          val lbd = math.sqrt(sig(j) * mP)
          (true,
           if (xpN(j) > eps) lbd / xpN(j) else 0.0,
           if (ypN(j) > eps) lbd / ypN(j) else 0.0)
        } else {
          val lbd = math.sqrt(sig(j) * mN)
          (false,
           if (xnN(j) > eps) lbd / xnN(j) else 0.0,
           if (ynN(j) > eps) lbd / ynN(j) else 0.0)
        }
      }
    }
    // the 'a' fill value: X.mean() over the full dense user×item
    // shape — the user axis uses the same maxId+1 convention as the
    // item axis (sklearn divides by the DENSE shape, so absent user
    // rows between 0 and max still count in the denominator)
    val (vSum, maxU) = (
      tri.map(_._3).sum(),
      tri.map(_._1).max())
    val avg = vSum / ((maxU + 1.0) * nItems)
    val bcPlan = graft.core.CacheScope.trackBroadcast(
      spark.sparkContext.broadcast(plan))
    val w0 = uRows.mapValues { xs =>
      val p = bcPlan.value
      Array.tabulate(xs.length) { j =>
        val (pos, su, _) = p(j)
        val x = if (j == 0) math.abs(xs(j))
                else if (pos) math.max(xs(j), 0.0)
                else math.max(-xs(j), 0.0)
        val w = x * su
        if (w == 0.0) avg else w
      }
    }.toDF("u", "factors")
    val h0 = (0 until nItems).map { i =>
      (i, Array.tabulate(rank) { j =>
        val (pos, _, si) = plan(j)
        val y = if (j == 0) math.abs(vMat(j)(i))
                else if (pos) math.max(vMat(j)(i), 0.0)
                else math.max(-vMat(j)(i), 0.0)
        val h = y * si
        if (h == 0.0) avg else h
      })
    }.toDF("i", "factors")
    (w0, h0)
  }

  /** [[nmf]] core with an injectable factor init `(id, salt) → vec`
    * (salt 1 = user rows, 2 = item rows). The q153/q171 values gates
    * run the exact update machinery from a rational init so the
    * converged values are hand-derivable; [[nmf]] passes the
    * hash-seeded init. */
  private[graft] def nmfFrom(spark: SparkSession, urm: DataFrame,
                             rank: Int, iters: Int,
                             initVec: (Int, Int) => Array[Double],
                             solver: String = "multiplicative_update",
                             betaLoss: String = "frobenius",
                             l1Ratio: Double = 0.5,
                             regStrength: Double = 0.0)
      : (DataFrame, DataFrame) = {
    import spark.implicits._
    val triples = graft.core.CacheScope.persistRdd(
      urm.select(col("u").cast("int"), col("i").cast("int"),
                 col("v").cast("double"))
        .as[(Int, Int, Double)].rdd)
    nmfLoop(spark, triples,
      triples.map(_._1).distinct().map(u => (u, initVec(u, 1))),
      triples.map(_._2).distinct().map(i => (i, initVec(i, 2))),
      rank, iters, solver, betaLoss, l1Ratio, regStrength)
  }

  /** [[nmfFrom]] with explicit initial factor FRAMES — the nndsvda
    * init path ([[nndsvdaInit]] produces DataFrames). */
  private[graft] def nmfFromFrames(spark: SparkSession, urm: DataFrame,
                                   rank: Int, iters: Int,
                                   w0: DataFrame, h0: DataFrame,
                                   solver: String, betaLoss: String,
                                   l1Ratio: Double, regStrength: Double)
      : (DataFrame, DataFrame) = {
    import spark.implicits._
    val triples = graft.core.CacheScope.persistRdd(
      urm.select(col("u").cast("int"), col("i").cast("int"),
                 col("v").cast("double"))
        .as[(Int, Int, Double)].rdd)
    def rdd(df: DataFrame, id: String) =
      df.select(col(id).cast("int"), col("factors"))
        .as[(Int, Array[Double])].rdd
    nmfLoop(spark, triples, rdd(w0, "u"), rdd(h0, "i"),
            rank, iters, solver, betaLoss, l1Ratio, regStrength)
  }

  private def nmfLoop(spark: SparkSession,
                      triples: org.apache.spark.rdd.RDD[(Int, Int, Double)],
                      w0: org.apache.spark.rdd.RDD[(Int, Array[Double])],
                      h0: org.apache.spark.rdd.RDD[(Int, Array[Double])],
                      rank: Int, iters: Int, solver: String,
                      betaLoss: String, l1Ratio: Double,
                      regStrength: Double): (DataFrame, DataFrame) = {
    import spark.implicits._
    require(Set("multiplicative_update", "coordinate_descent")(solver),
      s"solver must be multiplicative_update|coordinate_descent, got $solver")
    require(Set("frobenius", "kullback-leibler")(betaLoss),
      s"beta_loss must be frobenius|kullback-leibler, got $betaLoss")
    require(l1Ratio >= 0.0 && l1Ratio <= 1.0,
      s"l1_ratio must be between 0 and 1, got $l1Ratio")
    // sklearn's own constraint (NMFRecommender.py inherits it): the cd
    // solver minimizes the frobenius objective only
    require(solver != "coordinate_descent" || betaLoss == "frobenius",
      "coordinate_descent does not handle beta_loss=kullback-leibler")
    val l1 = regStrength * l1Ratio
    val l2 = regStrength * (1.0 - l1Ratio)
    val eps = 1e-9
    val kl = betaLoss == "kullback-leibler"
    var w = w0
    var h = h0
    def gram(m: org.apache.spark.rdd.RDD[(Int, Array[Double])])
        : Array[Array[Double]] =
      m.aggregate(Array.fill(rank, rank)(0.0))(
        (acc, kv) => {
          val v = kv._2
          var a = 0
          while (a < rank) {
            var b = 0
            while (b < rank) { acc(a)(b) += v(a) * v(b); b += 1 }
            a += 1
          }
          acc
        },
        (x, y) => {
          var a = 0
          while (a < rank) {
            var b = 0
            while (b < rank) { x(a)(b) += y(a)(b); b += 1 }
            a += 1
          }
          x
        })
    def colSum(m: org.apache.spark.rdd.RDD[(Int, Array[Double])])
        : Array[Double] =
      m.aggregate(Array.fill(rank)(0.0))(
        (acc, kv) => { var f = 0
          while (f < rank) { acc(f) += kv._2(f); f += 1 }; acc },
        (x, y) => { var f = 0
          while (f < rank) { x(f) += y(f); f += 1 }; x })
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var f = 0
      while (f < rank) { s += a(f) * b(f); f += 1 }; s
    }
    // frobenius MU: denom (curG)_f + λ₁ + λ₂·cur_f
    def muUpdate(cur: Array[Double], num: Array[Double],
                 g: Array[Array[Double]]): Array[Double] =
      Array.tabulate(rank) { f =>
        var denom = 0.0
        var a = 0
        while (a < rank) { denom += cur(a) * g(a)(f); a += 1 }
        denom += l1 + l2 * cur(f)
        cur(f) * num(f) / math.max(denom, eps)
      }
    // KL MU: denom = (column sum of the OTHER factor) + λ₁ + λ₂·cur_f
    def muUpdateKl(cur: Array[Double], num: Array[Double],
                   otherColSum: Array[Double]): Array[Double] =
      Array.tabulate(rank) { f =>
        val denom = otherColSum(f) + l1 + l2 * cur(f)
        cur(f) * num(f) / math.max(denom, eps)
      }
    // cd/HALS: sequential per-component sweep INSIDE the row — later
    // components see this sweep's earlier updates (that is the whole
    // point of coordinate descent)
    def cdUpdate(cur: Array[Double], num: Array[Double],
                 g: Array[Array[Double]]): Array[Double] = {
      val out = cur.clone()
      var f = 0
      while (f < rank) {
        var wg = 0.0
        var a = 0
        while (a < rank) { wg += out(a) * g(a)(f); a += 1 }
        val grad = -num(f) + wg + l1
        val hess = g(f)(f) + l2
        out(f) = math.max(0.0, out(f) - grad / math.max(hess, eps))
        f += 1
      }
      out
    }
    (0 until iters).foreach { _ =>
      // W step — numerators aggregate per user with H broadcast:
      // frobenius/cd need V·Hᵀ; KL needs (V ⊘ WHᵀ)·H, which also
      // reads the CURRENT W row, so the KL map joins w first
      val hMap = spark.sparkContext.broadcast(h.collectAsMap())
      val numW =
        if (kl)
          triples.map { case (u, i, v) => (u, (i, v)) }
            .join(w)
            .map { case (u, ((i, v), wf)) =>
              val hi = hMap.value(i)
              val q = v / math.max(dot(wf, hi), eps)
              (u, hi.map(_ * q))
            }
            .reduceByKey((x, y) => Array.tabulate(rank)(f => x(f) + y(f)))
        else
          triples.map { case (u, i, v) =>
            (u, hMap.value(i).map(_ * v))
          }.reduceByKey((x, y) => Array.tabulate(rank)(f => x(f) + y(f)))
      val hGram = if (kl) null else gram(h)
      val hCols = if (kl) colSum(h) else null
      // LEFT outer join keeps factor rows for ids with zero
      // interactions (possible at iters >= 1 under nndsvda init, whose
      // h0 spans all of 0..nItems-1): a missing numerator is the zero
      // vector, so such rows update exactly as sklearn's — MU rows
      // multiply to 0, cd rows decay by -(wG + λ₁)/(G_ff + λ₂) —
      // instead of silently vanishing from the returned factors
      val zeroNum = Array.fill(rank)(0.0)
      val wNew = graft.core.CacheScope.persistRdd(
        w.leftOuterJoin(numW)
          .mapValues { case (cur, numOpt) =>
            val num = numOpt.getOrElse(zeroNum)
            if (kl) muUpdateKl(cur, num, hCols)
            else if (solver == "coordinate_descent") cdUpdate(cur, num, hGram)
            else muUpdate(cur, num, hGram)
          })
      val wGram = if (kl) null else gram(wNew) // action — materializes wNew
      val wCols = if (kl) colSum(wNew) else null
      // H step: numerator VᵀW (or the KL quotient) joins the
      // distributed UPDATED W — user-scaled data never collects; the
      // KL quotient reads the CURRENT H via the still-live broadcast
      val numH =
        if (kl)
          triples.map { case (u, i, v) => (u, (i, v)) }
            .join(wNew)
            .map { case (_, ((i, v), wf)) =>
              val q = v / math.max(dot(wf, hMap.value(i)), eps)
              (i, wf.map(_ * q))
            }
            .reduceByKey((x, y) => Array.tabulate(rank)(f => x(f) + y(f)))
        else
          triples.map { case (u, i, v) => (u, (i, v)) }
            .join(wNew)
            .map { case (_, ((i, v), wf)) => (i, wf.map(_ * v)) }
            .reduceByKey((x, y) => Array.tabulate(rank)(f => x(f) + y(f)))
      val hNew = graft.core.CacheScope.persistRdd(
        h.leftOuterJoin(numH) // same zero-interaction retention as W
          .mapValues { case (cur, numOpt) =>
            val num = numOpt.getOrElse(zeroNum)
            if (kl) muUpdateKl(cur, num, wCols)
            else if (solver == "coordinate_descent") cdUpdate(cur, num, wGram)
            else muUpdate(cur, num, wGram)
          })
      hNew.count() // materialize before the old h/broadcast go away
      // executor blocks released deterministically per iteration (the
      // trackBroadcast rationale); unpersist-not-destroy so a lazily
      // re-executed lineage can re-ship the value
      hMap.unpersist(false)
      w.unpersist(false); h.unpersist(false)
      w = wNew; h = hNew
    }
    (w.toDF("u", "factors"), h.toDF("i", "factors"))
  }

  /** L27 — incremental training with early stopping (reference:
    * Base/Incremental_Training_Early_Stopping.py:91-262): run
    * `trainEpoch` up to `maxEpochs`, validate every `validateEvery`,
    * keep the best metric, stop after `patience` non-improving
    * validations. Returns (bestEpoch, bestMetric, history). */
  /** L27 composed with L21 — the reference's actual training lifecycle
    * (Base/Incremental_Training_Early_Stopping.py:91-262, driven by the
    * search's evaluator, ParameterTuning/SearchAbstractClass.py:366-489):
    * distributed BPR epochs validated every `validateEvery` epochs by
    * MAP@cutoff against the held-out half of `split`, stopping after
    * `patience` non-improving validations. Validation is itself a
    * distributed plan — factor frames cross-scored with the codegen'd
    * dot product, seen items anti-joined, MAP from the standard
    * evaluator; only the single metric scalar reaches the driver.
    * Returns the validation history (epoch, map) with the selected
    * best epoch/metric and the epoch budget as columns — the training
    * curve the reference logs. */
  def bprEarlyStopped(spark: SparkSession, split: DataFrame, rank: Int,
                      maxEpochs: Int, validateEvery: Int, patience: Int,
                      samplesPerEpoch: Int, lr: Double, reg: Double,
                      seed: Long, cutoff: Int,
                      opts: BprOpts = BprOpts()): DataFrame = {
    import spark.implicits._
    import graft.eval.Evaluation
    val train = graft.core.CacheScope.persist(
      split.filter(col("split") === "train")
        .select(col("u").cast("int").as("u"), col("i").cast("int").as("i")))
    val heldOut = graft.core.CacheScope.persist(
      split.filter(col("split") =!= "train")
        .select(col("u").cast("int").as("u"), col("i").cast("int").as("i")))
    val items = train.select("i").distinct().as[Int].collect().sorted
    val total = train.count()
    val nUsers = train.select("u").distinct().count()
    val part = bprPartitioner(spark, nUsers + items.length, rank,
                              opts.sgdMode)
    var state = bprInitState(spark, train, rank, opts.sgdMode, seed, part,
                             extraItems = opts.shown)
    def validate(): Double = {
      val scores = state.userFactors.mapValues(_.f).toDF("u", "ufac")
        .crossJoin(state.itemFactors.mapValues(_.f).toDF("item", "ifac"))
        .select(col("u"), col("item"),
                graft.functions.VectorFunctions
                  .dot_product(col("ufac"), col("ifac")).as("score"))
      val recs = Recommenders.recommend(scores, train, cutoff)
      Evaluation.accuracyMetrics(Evaluation.hitTable(recs, heldOut), cutoff)
        .select("map").head().getDouble(0)
    }
    var esCkpt: Option[(org.apache.spark.rdd.RDD[(Int, BprFac)],
                        org.apache.spark.rdd.RDD[(Int, BprFac)])] = None
    val (bestEpoch, bestMap, history) =
      trainWithEarlyStopping(maxEpochs, validateEvery, patience) { ep =>
        state = bprEpoch(spark, train, state, items, total, rank,
                         samplesPerEpoch, lr, reg, seed, ep, opts,
                         step = ep + 1)
        // same lineage truncation as mfBprDistributed
        if ((ep + 1) % 16 == 0)
          esCkpt = bprCheckpoint(spark, state, esCkpt)
      } { () => validate() }
    history.toDF("epoch", "map")
      .withColumn("best_epoch", lit(bestEpoch))
      .withColumn("best_map", lit(bestMap))
      .withColumn("max_epochs", lit(maxEpochs))
  }

  def trainWithEarlyStopping(maxEpochs: Int, validateEvery: Int,
                             patience: Int)(trainEpoch: Int => Unit)(
                             validate: () => Double)
      : (Int, Double, Seq[(Int, Double)]) = {
    var best = Double.NegativeInfinity
    var bestEpoch = 0
    var bad = 0
    val history = scala.collection.mutable.ArrayBuffer[(Int, Double)]()
    var ep = 0
    while (ep < maxEpochs && bad < patience) {
      trainEpoch(ep)
      ep += 1
      if (ep % validateEvery == 0) {
        val m = validate()
        history += ((ep, m))
        if (m > best) { best = m; bestEpoch = ep; bad = 0 }
        else bad += 1
      }
    }
    (bestEpoch, best, history.toSeq)
  }
}
