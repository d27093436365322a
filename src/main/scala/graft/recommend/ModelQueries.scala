package graft.recommend

import org.apache.spark.sql.functions._
import graft.Q
import graft.etl.Urm
import graft.similarity.{ContentSimilarity, Similarity}
import graft.ann.Ann

/** Queries for the content-based, hybrid, and model-fitting operators.
  * CBF/hybrid/user-KNN are oracle-checked. The model tier splits by
  * determinism: EASE^R, PureSVD, and converged SLIM are deterministic,
  * so each at-scale rows-only query (q66/q64/q67) has a STRICT
  * VALUES-oracle twin (q150/q151/q152) running the same code path on
  * an inline URM against an independently derived answer. The
  * stochastic tier's at-scale demos (ALS, BPR, FunkSVD, AsySVD, NMF,
  * SLIM-BPR) keep the driver's rows-only check, but every one of
  * their UPDATE RULES is now value-pinned too: an SQL oracle can't
  * run SGD, yet SGD is deterministic GIVEN the sample order, so the
  * q153 injection convention extends to an injected deterministic
  * sampler + rational init (q174–q177) and the closed-form IALS
  * kernels tie ml.ALS to the reference solve under both λ readings
  * (q167/q169/q170/q178).
  */
object ModelQueries {

  def queries: Seq[Q] = Seq(

    // L13 — content-based item-item cosine over part features, top-5.
    // Bounded to 2000 items: low-cardinality categorical features make
    // item-item similarity inherently dense (every same-type pair
    // co-occurs), so the pair join is quadratic in catalog size — the
    // bound keeps it constant across scale factors.
    Q("q60_cbf_cosine",
      t => Similarity.topK(
          ContentSimilarity.weightedItemSimilarity(
            ContentSimilarity.icmFromPart(t)
              .filter(col("i") < 2000)), 5)
        .select(col("i"), col("j"), round(col("w"), 6).as("w"), col("rank")),
      Some("""WITH icm AS (
        |  SELECT 'brand:' || p_brand AS f, p_partkey AS i, 1.0 AS w
        |  FROM part WHERE p_partkey < 2000
        |  UNION ALL
        |  SELECT 'type:' || p_type, p_partkey, 1.0 FROM part
        |  WHERE p_partkey < 2000
        |  UNION ALL
        |  SELECT 'size:' || CAST(FLOOR(p_size / 10) AS BIGINT), p_partkey,
        |         1.0 FROM part WHERE p_partkey < 2000
        |), dots AS (
        |  SELECT a.i AS i, b.i AS j, SUM(a.w * b.w) AS dot
        |  FROM icm a JOIN icm b ON a.f = b.f AND a.i <> b.i
        |  GROUP BY 1, 2
        |), norms AS (SELECT i, SUM(w * w) AS nn FROM icm GROUP BY 1)
        |SELECT i, j, round(w, 6) AS w, rank FROM (
        |  SELECT d.i, d.j,
        |    d.dot / (sqrt(ni.nn) * sqrt(nj.nn)) AS w,
        |    ROW_NUMBER() OVER (PARTITION BY d.j
        |      ORDER BY d.dot / (sqrt(ni.nn) * sqrt(nj.nn)) DESC, d.i)
        |      AS rank
        |  FROM dots d
        |  JOIN norms ni ON d.i = ni.i
        |  JOIN norms nj ON d.j = nj.i) s
        |WHERE rank <= 5""".stripMargin)),

    // L14 — hybrid CBF(0.5)+CF cosine, top-5, restricted to items < 500
    // to bound the oracle's pair join.
    Q("q61_hybrid_cosine", { t =>
        val urm = Urm.fromOrders(t).filter(col("i") < 500)
        val icm = ContentSimilarity.icmFromPart(t)
          .filter(col("i") < 500)
        val feats = ContentSimilarity.hybridFeatures(icm, urm, 0.5)
        Similarity.topK(
          ContentSimilarity.weightedItemSimilarity(feats), 5)
          .select(col("i"), col("j"), round(col("w"), 6).as("w"),
                  col("rank"))
      },
      Some("""WITH urm AS (
        |  SELECT DISTINCT o_custkey AS u, l_partkey AS i
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_partkey < 500
        |), feats AS (
        |  SELECT 'brand:' || p_brand AS f, p_partkey AS i, 0.5 AS w
        |  FROM part WHERE p_partkey < 500
        |  UNION ALL
        |  SELECT 'type:' || p_type, p_partkey, 0.5 FROM part
        |  WHERE p_partkey < 500
        |  UNION ALL
        |  SELECT 'size:' || CAST(FLOOR(p_size / 10) AS BIGINT), p_partkey,
        |         0.5 FROM part WHERE p_partkey < 500
        |  UNION ALL
        |  SELECT 'u:' || u, i, 1.0 FROM urm
        |), dots AS (
        |  SELECT a.i AS i, b.i AS j, SUM(a.w * b.w) AS dot
        |  FROM feats a JOIN feats b ON a.f = b.f AND a.i <> b.i
        |  GROUP BY 1, 2
        |), norms AS (SELECT i, SUM(w * w) AS nn FROM feats GROUP BY 1)
        |SELECT i, j, round(w, 6) AS w, rank FROM (
        |  SELECT d.i, d.j,
        |    d.dot / (sqrt(ni.nn) * sqrt(nj.nn)) AS w,
        |    ROW_NUMBER() OVER (PARTITION BY d.j
        |      ORDER BY d.dot / (sqrt(ni.nn) * sqrt(nj.nn)) DESC, d.i)
        |      AS rank
        |  FROM dots d
        |  JOIN norms ni ON d.i = ni.i
        |  JOIN norms nj ON d.j = nj.i) s
        |WHERE rank <= 5""".stripMargin)),

    // L12 — UserKNN: user-user cosine over the transposed URM, top-5
    // (reference: KNN/UserKNNCFRecommender.py:18-54).
    Q("q63_userknn_cosine", { t =>
        val urmT = Urm.fromOrders(t)
          .select(col("i").as("u"), col("u").as("i"))
        Similarity.topK(Similarity.itemSimilarity(urmT, Similarity.Cosine), 5)
          .select(col("i").as("u1"), col("j").as("u2"),
                  round(col("w"), 6).as("w"), col("rank"))
      },
      Some("""WITH urm AS (
        |  SELECT DISTINCT o_custkey AS u, l_partkey AS i
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |), dots AS (
        |  SELECT a.u AS u1, b.u AS u2, COUNT(*) AS dot
        |  FROM urm a JOIN urm b ON a.i = b.i AND a.u <> b.u
        |  GROUP BY 1, 2
        |), norms AS (SELECT u, COUNT(*) AS n FROM urm GROUP BY 1)
        |SELECT u1, u2, round(w, 6) AS w, rank FROM (
        |  SELECT d.u1, d.u2,
        |    CAST(d.dot AS DOUBLE) / (sqrt(na.n) * sqrt(nb.n)) AS w,
        |    ROW_NUMBER() OVER (PARTITION BY d.u2
        |      ORDER BY CAST(d.dot AS DOUBLE) / (sqrt(na.n) * sqrt(nb.n))
        |        DESC, d.u1) AS rank
        |  FROM dots d
        |  JOIN norms na ON d.u1 = na.u
        |  JOIN norms nb ON d.u2 = nb.u) s
        |WHERE rank <= 5""".stripMargin)),

    // L18 — PureSVD item factors (k=16); rows-only (SGD/SVD oracle-free).
    Q("q64_puresvd", { t =>
        // bounded: netlib falls back to pure-Java BLAS here, so the SVD
        // cost is kept constant across scale factors
        val urm = Urm.fromOrders(t).filter(col("i") < 1000)
        val nItems = 1000
        Models.pureSvdItemFactors(t.spark, urm, 8, nItems)
          .filter(size(col("factors")) > 0)
          .select(col("i"),
                  round(Ann.norm2(col("factors")), 4).as("factor_norm2"))
          .filter(col("factor_norm2") > 0)
      }, None),

    // L20 — IALS via ml.ALS implicit (rank 16); rows-only. Companion-
    // gated: q167/q169 oracle-pin the exact row-solve kernel and q170
    // ties THIS production fit to that kernel (one-step solve identity
    // at float precision + near-fixed-point residual, both scalings).
    Q("q65_ials", { t =>
        val (_, itemF) = Models.ials(Urm.fromOrders(t), rank = 16,
          reg = 0.1, alpha = 10.0, iters = 5, seed = 42)
        itemF.select(col("id"), size(col("features")).as("k"))
      }, None),

    // L25 — EASE^R item-item weights (λ=100), bounded to items < 800
    // (driver dense-inverse guard); rows-only.
    Q("q66_ease", { t =>
        val urm = Urm.fromOrders(t).filter(col("i") < 400)
        Models.easeR(t.spark, urm, l2 = 100.0, maxItems = 2000)
          .filter(col("w") > 0.01)
      }, None),

    // L23 — SLIM ElasticNet (bounded item set); rows-only.
    Q("q67_slim", { t =>
        val urm = Urm.fromOrders(t).filter(col("i") < 300)
        Models.slimElasticNet(t.spark, urm, l1Reg = 0.5, l2Reg = 1.0,
                              topK = 10, iters = 2)
      }, None),

    // L21 — MF-BPR routed through the DISTRIBUTED path (partitioned
    // Hogwild SGD, parameter averaging) so the default bench exercises
    // the scale plan; the in-process impression-aware harness
    // (Models.mfBpr, the reference's Cython mirror with inside/outside
    // sampling modes) remains covered by ModelsSpec fixtures.
    Q("q68_mfbpr", { t =>
        val urm = Urm.fromOrders(t).filter(col("u") < 200)
        val (_, itemF) = Models.mfBprDistributed(t.spark, urm, rank = 8,
          epochs = 3, samplesPerEpoch = 2000, lr = 0.05, reg = 0.01,
          seed = 42)
        itemF.select(col("i"),
          expr("aggregate(factors, 0d, (a, x) -> a + x*x)").as("norm2"))
      }, None),

    // L21 scale path — distributed MF-BPR (partitioned Hogwild SGD with
    // parameter averaging; triples sampled as a distributed query);
    // rows-only.
    Q("q80_mfbpr_distributed", { t =>
        val urm = Urm.fromOrders(t).filter(col("u") < 300)
        val (_, itf) = Models.mfBprDistributed(t.spark, urm, rank = 8,
          epochs = 2, samplesPerEpoch = 2000, lr = 0.05, reg = 0.01,
          seed = 42)
        itf.select(col("i"),
          expr("aggregate(factors, 0d, (a, x) -> a + x*x)").as("norm2"))
      }, None),

    // L27 composed — early-stopped distributed BPR driven by the
    // MAP@10 evaluator on a hash split (the reference's actual training
    // lifecycle: Incremental_Training_Early_Stopping.py:91-262 +
    // SearchAbstractClass.py:366-489); rows-only: the validation curve.
    // ModelsSpec asserts the stop fires before the epoch budget and
    // the selected metric dominates the first validation.
    Q("q94_bpr_early_stop", { t =>
        val urm = Urm.fromOrders(t)
          .filter(col("u") < 150 && col("i") < 400)
        val split = Urm.hashSplit(urm, 8, 10)
        Models.bprEarlyStopped(t.spark, split, rank = 8, maxEpochs = 15,
          validateEvery = 1, patience = 2, samplesPerEpoch = 1500,
          lr = 0.05, reg = 0.01, seed = 42, cutoff = 10)
      }, None),

    // L22 — true FunkSVD SGD with biases and negative-interactions
    // quota (reference: MatrixFactorizationImpressions_Cython_Epoch
    // .pyx:330-448); rows-only: item factor norms. q74 remains the
    // ml.ALS cross-check of the same explicit-feedback objective.
    Q("q82_funksvd", { t =>
        val spark = t.spark
        import spark.implicits._
        val ratings = Urm.ratingsFromOrders(t).filter(col("u") < 200)
          .select(col("u"), col("i"), col("r").as("v"))
        val m = Models.funkSvdSgd(spark, ratings, rank = 8, epochs = 3,
          samplesPerEpoch = 2000, lr = 0.002, reg = 0.01, biasReg = 0.01,
          negativeQuota = 0.2, seed = 42)
        m.itemFactors.toSeq.map { case (i, f) =>
          (i, f.map(x => x * x).sum)
        }.toDF("i", "norm2")
      }, None),

    // L22 (AsySVD half) — asymmetric SVD: only item-indexed matrices
    // train; user factors estimated as profile·Y/√n (reference:
    // MatrixFactorizationImpressions_Cython_Epoch.pyx:449-630,
    // MatrixFactorizationImpressions_Cython.py:305-326); rows-only:
    // estimated user-factor norms.
    Q("q85_asysvd", { t =>
        val spark = t.spark
        import spark.implicits._
        val ratings = Urm.ratingsFromOrders(t).filter(col("u") < 150)
          .select(col("u"), col("i"), col("r").as("v"))
        val m = Models.asySvdSgd(spark, ratings, rank = 8, epochs = 3,
          samplesPerEpoch = 1500, lr = 0.002, reg = 0.01, biasReg = 0.01,
          negativeQuota = 0.2, seed = 42)
        m.userFactors.toSeq.map { case (u, f) =>
          (u, f.map(x => x * x).sum)
        }.toDF("u", "norm2")
      }, None),

    // L24 — SLIM BPR item-item weights (reference:
    // SLIM_BPR/Cython/SLIM_BPR_Cython_Epoch.pyx:212-310); rows-only.
    Q("q83_slim_bpr", { t =>
        val urm = Urm.fromOrders(t)
          .filter(col("i") < 300 && col("u") < 500)
        Models.slimBpr(t.spark, urm, epochs = 2, samplesPerEpoch = 2000,
          lr = 0.05, liReg = 0.01, ljReg = 0.01, topK = 10, seed = 42)
      }, None),

    // L19 — NMF via distributed multiplicative updates (reference:
    // MatrixFactorization/NMFRecommender.py:36-73); rows-only.
    Q("q84_nmf", { t =>
        val urm = Urm.fromOrders(t).filter(col("u") < 500)
        val (_, itemF) = Models.nmf(t.spark, urm, rank = 8, iters = 3,
                                    seed = 42)
        itemF.select(col("i"),
                     round(Ann.norm2(col("factors")), 4).as("norm2"))
      }, None),

    // L26 — item-item similarity from latent factors (SVD factors fed
    // through the ANN brute-force scorer; reference:
    // BaseMatrixFactorizationRecommender.py:20-73); rows-only.
    Q("q69_factor_knn", { t =>
        val urm = Urm.fromOrders(t).filter(col("i") < 500)
        val nItems = 500
        val factors = Models.pureSvdItemFactors(t.spark, urm, 8, nItems)
          .filter(Ann.norm2(col("factors")) > 1e-12)
          .select(col("i").as("id"), col("factors").as("embedding"))
        Ann.bruteForceCosineTopK(factors.filter(col("id") % 10 === 0),
                                 factors, 5)
      }, None),

    // L25 STRICT gate — EASE^R is a CLOSED FORM (G = AᵀA + λI,
    // P = G⁻¹, B = −P/diag(P)), i.e. deterministic, so it does not
    // belong in the stochastic no_oracle tier: this runs the exact
    // q66 code path (distributed pair-dot Gram, driver Breeze inverse)
    // on an inline 4-user × 3-item URM whose answer was derived
    // INDEPENDENTLY with exact rational arithmetic — G+λI at λ=1/2 has
    // det 89/8 and the six off-diagonal weights are the rationals
    // 12/31, 20/31, 12/19, −2/19, 20/33, −2/33 (hand-checkable from
    // the adjugate), transcribed below at 6 decimals (every value
    // ≥ 4·10⁻⁷ away from its rounding boundary, so the float64
    // LAPACK/Breeze inverse cannot flip a digit). A wrong Gram mirror,
    // a dropped λ, or a transposed −P/diag(P) is a red hash row; q66
    // stays the at-scale demo.
    Q("q150_ease_values_gate", { t =>
        import t.spark.implicits._
        val urm = Seq((0, 0), (0, 1), (1, 0), (1, 1), (1, 2), (2, 0),
                      (2, 2), (3, 1))
          .toDF("u", "i")
        Models.easeR(t.spark, urm, l2 = 0.5, maxItems = 10)
          .select(col("i"), col("j"), round(col("w"), 6).as("w"))
      },
      Some("""SELECT * FROM (VALUES
        |  (1, 0, CAST(0.387097 AS DOUBLE)), (2, 0, 0.645161),
        |  (0, 1, 0.631579), (2, 1, -0.105263),
        |  (0, 2, 0.606061), (1, 2, -0.060606)
        |) t(i, j, w)""".stripMargin)),

    // L18/L26 STRICT gate — PureSVD's eigensolve has a per-eigenvector
    // SIGN ambiguity, but the factor Gram W = F·Fᵀ = V_k Σ² V_kᵀ is
    // sign-invariant and unique whenever the kept eigenvalues are
    // separated from the dropped ones: this runs the exact q64 code
    // path (distributed Gram, driver eigSym, σ-scaled factors) on an
    // inline 5-user × 4-item URM with eigenvalues {7.54, 2.62 | 1.46,
    // 0.38} (top-2 kept, gap ≈ 1.16), and hashes all 16 factor dot
    // products against a numpy-SVD-derived VALUES table at 6 decimals
    // (independent implementation; every value ≥ 5·10⁻² of a 6th-digit
    // unit away from its rounding boundary, so cross-LAPACK 1e-13
    // drift cannot flip a digit). A mis-ordered eigenvalue, a missing
    // σ scaling, or a broken Gram is a red hash row; q64/q69 stay the
    // at-scale demos.
    Q("q151_puresvd_values_gate", { t =>
        import t.spark.implicits._
        val urm = Seq((0, 0), (0, 1), (1, 0), (1, 1), (1, 2), (2, 2),
                      (2, 3), (3, 0), (3, 3), (4, 1), (4, 2), (4, 3))
          .toDF("u", "i").withColumn("v", lit(1.0))
        val f = Models.pureSvdItemFactors(t.spark, urm, 2, nItems = 4)
        val a = f.select(col("i"), col("factors").as("fa"))
        val b = f.select(col("i").as("j"), col("factors").as("fb"))
        a.crossJoin(b)
          .select(col("i"), col("j"),
                  round(expr("aggregate(zip_with(fa, fb, (x, y) -> x*y)," +
                             " 0d, (acc, x) -> acc + x)"), 6).as("w"))
      },
      Some("""SELECT * FROM (VALUES
        |  (0, 0, CAST(2.52261 AS DOUBLE)), (0, 1, 2.445103),
        |  (0, 2, 1.274283),
        |  (0, 3, 0.628183),  (1, 0, 2.445103), (1, 1, 2.557098),
        |  (1, 2, 1.833491),  (1, 3, 1.274283), (2, 0, 1.274283),
        |  (2, 1, 1.833491),  (2, 2, 2.557098), (2, 3, 2.445103),
        |  (3, 0, 0.628183),  (3, 1, 1.274283), (3, 2, 2.445103),
        |  (3, 3, 2.52261)
        |) t(i, j, w)""".stripMargin)),

    // L23 STRICT gate — SLIM ElasticNet's CONVERGED solution is unique
    // (the per-target objective ½‖y − Xw‖² + l1·Σwⱼ + ½l2·‖w‖², w ≥ 0,
    // is strictly convex at l2 > 0), so at convergence the solver's
    // sweep order and iteration count drop out and the optimum is
    // derivable INDEPENDENTLY of coordinate descent: KKT active-set
    // enumeration with exact rational arithmetic on the q151 inline
    // URM (G = [[3,2,1,1],[2,3,2,1],[1,2,3,2],[1,1,2,3]], l1 = l2 = ½)
    // gives the eight weights {19/45, 1/45, 1/3} below (the mirrored
    // target pairs 0↔3 and 1↔2 reflect G's persymmetry — a built-in
    // sanity check). 400 CD sweeps over a 3-variable problem converge
    // far past the 6-decimal transcription (geometric rate), and every
    // value is ≥ 0.16 of a 6th-digit unit from its rounding boundary.
    // A wrong soft-threshold, a mis-scaled denominator, or a dropped
    // positivity clamp is a red hash row; q67 stays the at-scale demo.
    Q("q152_slim_values_gate", { t =>
        import t.spark.implicits._
        val urm = Seq((0, 0), (0, 1), (1, 0), (1, 1), (1, 2), (2, 2),
                      (2, 3), (3, 0), (3, 3), (4, 1), (4, 2), (4, 3))
          .toDF("u", "i")
        Models.slimElasticNet(t.spark, urm, l1Reg = 0.5, l2Reg = 0.5,
                              topK = 10, iters = 400)
          .select(col("i"), col("j"), round(col("w"), 6).as("w"))
      },
      Some("""SELECT * FROM (VALUES
        |  (1, 0, CAST(0.422222 AS DOUBLE)), (3, 0, 0.022222),
        |  (0, 1, 0.333333), (2, 1, 0.333333),
        |  (1, 2, 0.333333), (3, 2, 0.333333),
        |  (0, 3, 0.022222), (2, 3, 0.422222)
        |) t(i, j, w)""".stripMargin)),

    // L19 STRICT gate — NMF's Lee–Seung multiplicative updates are a
    // DETERMINISTIC map given the init: this runs the exact q84 update
    // machinery (distributed V·Hᵀ / VᵀW join-aggregations, k×k Grams,
    // W-step against pre-update H's Gram, H-step against post-update
    // W's Gram) from an injected rational init vec(id,salt)[f] =
    // (1 + id + 2f + salt)/4 on an inline 3×3 URM, 2 iterations. The
    // 12 expected factor values were derived independently with exact
    // rational arithmetic (Python fractions replay of the MU rule) and
    // transcribed at 6 decimals — every value ≥ 6.8·10⁻⁸ from its
    // rounding boundary, so partition-order float summation (~1e-13)
    // cannot flip a digit. A transposed Gram, a swapped update order,
    // or an eps-clamped denominator is a red hash row; q84 (hash-seeded
    // init, sf-scale) stays the at-scale demo.
    Q("q153_nmf_values_gate", { t =>
        import t.spark.implicits._
        val urm = Seq((0, 0, 1), (0, 1, 2), (0, 2, 1), (1, 0, 3),
                      (1, 2, 1), (2, 0, 2), (2, 1, 1), (2, 2, 2))
          .toDF("u", "i", "v")
        def init(id: Int, salt: Int): Array[Double] =
          Array.tabulate(2)(f => (1.0 + id + 2 * f + salt) / 4.0)
        val (w, h) = Models.nmfFrom(t.spark, urm, rank = 2, iters = 2,
                                    initVec = init)
        val wr = w.select(lit("w").as("kind"), col("u").as("id"),
                          posexplode(col("factors")).as(Seq("f", "value")))
        val hr = h.select(lit("h").as("kind"), col("i").as("id"),
                          posexplode(col("factors")).as(Seq("f", "value")))
        wr.unionByName(hr)
          .select(col("kind"), col("id"), col("f"),
                  round(col("value"), 6).as("value"))
      },
      Some("""SELECT * FROM (VALUES
        |  ('w', 0, 0, CAST(0.273269 AS DOUBLE)), ('w', 0, 1, 0.549508),
        |  ('w', 1, 0, 0.398453), ('w', 1, 1, 0.720236),
        |  ('w', 2, 0, 0.485378), ('w', 2, 1, 0.725643),
        |  ('h', 0, 0, 1.375562), ('h', 0, 1, 2.280331),
        |  ('h', 1, 0, 0.600398), ('h', 1, 1, 0.988522),
        |  ('h', 2, 0, 1.061761), ('h', 2, 1, 1.413298)
        |) t(kind, id, f, value)""".stripMargin)),

    // L20 STRICT gate — the IALS row update is a CLOSED FORM given the
    // item factors (x_u = (YᵀY + Yᵀ(Cᵤ−I)Y + λI)⁻¹ YᵀCᵤp(u),
    // IALSRecommender.py:165-186), so unlike the full alternating fit
    // it is oracle-checkable: this runs Models.ialsUserStep — the
    // distributed exact kernel, broadcast Y, per-user Breeze solve —
    // on an inline 3-user × 3-item URM with injected factors
    // y₀=(½,0), y₁=(0,½), y₂=(½,½), α=½, λ=¼, under BOTH confidence
    // scalings (linear c=1+αr exact in rationals, e.g. u₀ =
    // (10/7, 2/7) and u₁ = (−2/5, 6/5); log c=1+α·ln(1+r/ε) at ε=½
    // derived with 50-digit decimal arithmetic). Expected values
    // transcribed at 6 decimals — every value ≥ 3.5·10⁻⁸ from its
    // rounding boundary vs ~10⁻¹⁵ float drift. A dropped λ, a YᵀY
    // missing cold rows, a (c−1) vs c slip on either side of the
    // solve, or a wrong ε routing is a red hash row; q65 (ml.ALS)
    // stays the production fit this kernel pins semantically.
    Q("q167_ials_step_gate", { t =>
        import t.spark.implicits._
        val urm = Seq((0, 0, 1.0), (0, 2, 2.0), (1, 1, 3.0),
                      (2, 0, 1.0), (2, 1, 1.0), (2, 2, 1.0))
          .toDF("u", "i", "v")
        val y = Seq((0, Array(0.5, 0.0)), (1, Array(0.0, 0.5)),
                    (2, Array(0.5, 0.5)))
          .toDF("i", "factors")
        Seq("linear", "log").map { scaling =>
          Models.ialsUserStep(t.spark, urm, y, alpha = 0.5, reg = 0.25,
                              confidenceScaling = scaling, epsilon = 0.5)
            .select(lit(scaling).as("scaling"), col("u"),
                    posexplode(col("factors")).as(Seq("f", "value")))
        }.reduce(_ unionByName _)
          .select(col("scaling"), col("u"), col("f"),
                  round(col("value"), 6).as("value"))
      },
      Some("""SELECT * FROM (VALUES
        |  ('linear', 0, 0, CAST(1.428571 AS DOUBLE)),
        |  ('linear', 0, 1, 0.285714),
        |  ('linear', 1, 0, -0.4), ('linear', 1, 1, 1.2),
        |  ('linear', 2, 0, 1.090909), ('linear', 2, 1, 1.090909),
        |  ('log', 0, 0, 1.428241), ('log', 0, 1, 0.271206),
        |  ('log', 1, 0, -0.361385), ('log', 1, 1, 1.084154),
        |  ('log', 2, 0, 1.097258), ('log', 2, 1, 1.097258)
        |) t(scaling, u, f, value)""".stripMargin)),

    // L20 STRICT gate, full epoch — the reference's `_run_epoch` order
    // (IALSRecommender.py:165-186): user half against the CURRENT item
    // factors, item half against the UPDATED user factors, both the
    // same closed-form `_update_row`. Runs Models.ialsEpoch on the
    // q167 fixture under both confidence scalings and hashes BOTH
    // halves: the item-half values compound two solves (the user
    // solutions feed the item Grams), so a half-order swap, a stale-W
    // item Gram, or a transposed axis is a red hash row. Expected
    // values derived like q167 (exact rationals for linear — e.g.
    // h₀ = (12144/19199, 4547/19199) ≈ (0.632592, 0.236833) — and
    // 50-digit decimals for log); every value ≥ 3.6·10⁻⁸ from its
    // 6-decimal rounding boundary vs ~10⁻¹⁴ compounded float drift.
    // One documented reference divergence, in ialsItemStep's scaladoc:
    // the reference's item-half Gram spans cold users' np.empty
    // (uninitialized) rows; this engine spans exactly the solved warm
    // rows — the only determinate reading.
    Q("q169_ials_epoch_gate", { t =>
        import t.spark.implicits._
        val urm = Seq((0, 0, 1.0), (0, 2, 2.0), (1, 1, 3.0),
                      (2, 0, 1.0), (2, 1, 1.0), (2, 2, 1.0))
          .toDF("u", "i", "v")
        val y = Seq((0, Array(0.5, 0.0)), (1, Array(0.0, 0.5)),
                    (2, Array(0.5, 0.5)))
          .toDF("i", "factors")
        Seq("linear", "log").map { scaling =>
          val (uf, itf) = Models.ialsEpoch(t.spark, urm, y, alpha = 0.5,
            reg = 0.25, confidenceScaling = scaling, epsilon = 0.5)
          val ur = uf.select(lit(scaling).as("scaling"), lit("u").as("kind"),
                             col("u").as("id"),
                             posexplode(col("factors")).as(Seq("f", "value")))
          val ir = itf.select(lit(scaling).as("scaling"), lit("i").as("kind"),
                              col("i").as("id"),
                              posexplode(col("factors")).as(Seq("f", "value")))
          ur.unionByName(ir)
        }.reduce(_ unionByName _)
          .select(col("scaling"), col("kind"), col("id"), col("f"),
                  round(col("value"), 6).as("value"))
      },
      Some("""SELECT * FROM (VALUES
        |  ('linear', 'u', 0, 0, CAST(1.428571 AS DOUBLE)),
        |  ('linear', 'u', 0, 1, 0.285714),
        |  ('linear', 'u', 1, 0, -0.4), ('linear', 'u', 1, 1, 1.2),
        |  ('linear', 'u', 2, 0, 1.090909), ('linear', 'u', 2, 1, 1.090909),
        |  ('linear', 'i', 0, 0, 0.632592), ('linear', 'i', 0, 1, 0.236833),
        |  ('linear', 'i', 1, 0, -0.039319), ('linear', 'i', 1, 1, 0.817845),
        |  ('linear', 'i', 2, 0, 0.636177), ('linear', 'i', 2, 1, 0.235867),
        |  ('log', 'u', 0, 0, 1.428241), ('log', 'u', 0, 1, 0.271206),
        |  ('log', 'u', 1, 0, -0.361385), ('log', 'u', 1, 1, 1.084154),
        |  ('log', 'u', 2, 0, 1.097258), ('log', 'u', 2, 1, 1.097258),
        |  ('log', 'i', 0, 0, 0.632693), ('log', 'i', 0, 1, 0.237375),
        |  ('log', 'i', 1, 0, -0.069547), ('log', 'i', 1, 1, 0.874445),
        |  ('log', 'i', 2, 0, 0.634949), ('log', 'i', 2, 1, 0.236591)
        |) t(scaling, kind, id, f, value)""".stripMargin)),

    // L20 STRICT gate — ties the PRODUCTION ml.ALS fit (q65) to the
    // oracle-pinned exact kernel (q167/q169). A converged-Gram
    // comparison is ill-posed on a non-convex objective (measured:
    // independent inits land in different local minima with score
    // deltas ~0.5), so the tie is the init- and convergence-
    // INDEPENDENT one-step identity: ml.ALS's last internal update is
    // the user ridge solve against its final item factors, so
    // ialsUserStep(urm, itemFactors_ml) must reproduce userFactors_ml
    // to float32 precision — measured 3·10⁻⁸ vs a 1e-5 gate, while a
    // wrong λ translation reads ~0.07. The λ translation is the one
    // semantic divergence between the two: ml.ALS scales regParam by
    // the per-row POSITIVE-rating count ("weighted-λ"), the reference
    // adds plain λ (IALSRecommender.py:165-186) — on this constant-
    // degree-2 fixture they coincide at reg_kernel = 2·regParam, which
    // is exactly what Models.ials callers get on real skewed data as a
    // documented per-row reg reweighting, not a different solve.
    // Second row per scaling: one full exact-kernel epoch from ml's
    // converged factors moves items < 0.1 (measured ~0.02) — ml's fit
    // sits at a near-fixed-point of the reference kernel, both
    // scalings. Booleans hash exactly, so seeded-float drift cannot
    // redden the row while a semantic slip (c vs c−1, YᵀY missing
    // rows, ε routing, λ slip) flips it.
    Q("q170_ials_mlfit_gate", { t =>
        import t.spark.implicits._
        // constant degree 2 on BOTH axes so ml's weighted-λ is uniform
        val urm = Seq((0, 0, 1.0), (0, 1, 2.0), (1, 1, 1.0), (1, 2, 3.0),
                      (2, 2, 2.0), (2, 3, 1.0), (3, 3, 2.0), (3, 0, 3.0))
          .toDF("u", "i", "v")
        val alpha = 2.0; val lam = 0.4; val eps = 0.5
        // the two scalings are independent 25-iteration ml.ALS fits on
        // an 8-row fixture — pure per-job scheduling overhead, so they
        // run concurrently from driver threads (guide §2.6 via
        // core.Par); each side's booleans are computed from its own
        // fit, so the output rows are unchanged
        graft.core.Par.run(t.spark.sparkContext, "graft-q170-scalings",
                           30, Seq("linear", "log")) { scaling =>
          // numBlocks = 1 (r15, guide §1.2 per-task work): the fixture
          // is 8 rows, so ALS's default 10x10 block partitioning is
          // pure scheduling overhead (100 cogroup blocks per sweep x
          // 25 iters x 2 scalings). The gate's booleans are
          // init-independent BY DESIGN (the one-step identity reads
          // ml's OWN final item factors; margins 1e-5 vs ~0.07), so
          // the block-seeded init change cannot flip them — oracle
          // hash stays green (driver-verified).
          val (ufMl0, itfMl0) = Models.ials(urm, rank = 2, reg = lam,
            alpha = alpha, iters = 25, seed = 7,
            confidenceScaling = scaling, epsilon = eps, numBlocks = 1)
          def toArr(df: org.apache.spark.sql.DataFrame) =
            df.select(col("id"), col("features"))
              .as[(Int, Array[Float])].collect()
              .map { case (i, f) => (i, f.map(_.toDouble)) }.sortBy(_._1)
          val ufMl = toArr(ufMl0); val itfMl = toArr(itfMl0)
          val itfDf = itfMl.toSeq.toDF("i", "factors")
          def maxMove(a: Array[(Int, Array[Double])],
                      b: Array[(Int, Array[Double])]): Double =
            a.zip(b).map { case ((_, x), (_, y)) =>
              x.zip(y).map { case (p, q) => math.abs(p - q) }.max }.max
          val oneStep = Models.ialsUserStep(t.spark, urm, itfDf, alpha,
              2 * lam, scaling, eps)
            .as[(Int, Array[Double])].collect().sortBy(_._1)
          val (_, iE) = Models.ialsEpoch(t.spark, urm, itfDf, alpha,
            2 * lam, scaling, eps)
          val iEA = iE.as[(Int, Array[Double])].collect().sortBy(_._1)
          (scaling, maxMove(oneStep, ufMl) < 1e-5,
           maxMove(iEA, itfMl) < 0.1)
        }.toDF("scaling", "solve_matches_kernel", "near_fixed_point")
      },
      Some("""SELECT * FROM (VALUES
        |  ('linear', true, true), ('log', true, true)
        |) t(scaling, solve_matches_kernel, near_fixed_point)""".stripMargin)),

    // L19 STRICT gate — the rest of NMF's declared surface
    // (NMFRecommender.py:36-73 → sklearn.decomposition.NMF): the
    // kullback-leibler MU variant, the coordinate_descent (HALS)
    // solver, and the l1_ratio/α regularization split, each run by
    // Models.nmfFrom — the exact distributed update machinery q84
    // demos — from the q153 rational init on the q153 inline URM for
    // 2 iterations, hashed against an independent numpy float64
    // reimplementation at 6 decimals (every value ≥ 7·10⁻¹⁰ from its
    // rounding boundary vs ~10⁻¹³ sum-order drift; the cd variant's
    // h₁₀ = 27.7495 deliberately exercises the near-zero-component
    // HALS regime where grad/hess amplifies — deterministically).
    // Variants: kl (α=0), cd (α=0, fixed sweep order — the reference's
    // shuffle=True with random_state=None is nondeterministic, see
    // nmfFrom scaladoc), kl_reg and fro_reg (α=½, l1_ratio=¼ — the
    // semantics l1_ratio declares; the reference leaves sklearn's
    // α at 0.0 so its own l1_ratio is inert). A wrong quotient side,
    // a stale-W H step, a λ split slip, or a shuffled sweep is a red
    // hash row; q84 stays the at-scale demo.
    Q("q171_nmf_variants_gate", { t =>
        import t.spark.implicits._
        val urm = Seq((0, 0, 1), (0, 1, 2), (0, 2, 1), (1, 0, 3),
                      (1, 2, 1), (2, 0, 2), (2, 1, 1), (2, 2, 2))
          .toDF("u", "i", "v")
        def init(id: Int, salt: Int): Array[Double] =
          Array.tabulate(2)(f => (1.0 + id + 2 * f + salt) / 4.0)
        val variants = Seq(
          ("kl", "multiplicative_update", "kullback-leibler", 0.5, 0.0),
          ("cd", "coordinate_descent", "frobenius", 0.5, 0.0),
          ("kl_reg", "multiplicative_update", "kullback-leibler", 0.25, 0.5),
          ("fro_reg", "multiplicative_update", "frobenius", 0.25, 0.5))
        // + the nndsvda INIT itself at iters=0 (deterministic truncated
        // SVD → positive/negative split → 'a' mean-fill; derived
        // independently via numpy.linalg.svd — σ = {4.568, 1.914 |
        // 0.686}, well-separated, and the mean-fill 13/9 lands at
        // margin 5.6·10⁻⁸)
        val runs = variants.map { case (tag, solver, beta, l1r, alpha) =>
          (tag, Models.nmfFrom(t.spark, urm, rank = 2, iters = 2,
            initVec = init, solver = solver, betaLoss = beta,
            l1Ratio = l1r, regStrength = alpha))
        } :+ ("nndsvda", Models.nmf(t.spark, urm, rank = 2, iters = 0,
               seed = 0, initType = "nndsvda"))
        runs.map { case (tag, (w, h)) =>
          val wr = w.select(lit(tag).as("variant"), lit("w").as("kind"),
            col("u").as("id"), posexplode(col("factors")).as(Seq("f", "value")))
          val hr = h.select(lit(tag).as("variant"), lit("h").as("kind"),
            col("i").as("id"), posexplode(col("factors")).as(Seq("f", "value")))
          wr.unionByName(hr)
        }.reduce(_ unionByName _)
          .select(col("variant"), col("kind"), col("id"), col("f"),
                  round(col("value"), 6).as("value"))
      },
      Some("""SELECT * FROM (VALUES
        |  ('kl', 'w', 0, 0, CAST(0.331106 AS DOUBLE)), ('kl', 'w', 0, 1, 0.667477),
        |  ('kl', 'w', 1, 0, 0.359189), ('kl', 'w', 1, 1, 0.649236),
        |  ('kl', 'w', 2, 0, 0.51422), ('kl', 'w', 2, 1, 0.769173),
        |  ('kl', 'h', 0, 0, 1.295824), ('kl', 'h', 0, 1, 2.128189),
        |  ('kl', 'h', 1, 0, 0.642871), ('kl', 'h', 1, 1, 1.067006),
        |  ('kl', 'h', 2, 0, 1.006301), ('kl', 'h', 2, 1, 1.336552),
        |  ('cd', 'w', 0, 0, 0.014367), ('cd', 'w', 0, 1, 0.729121),
        |  ('cd', 'w', 1, 0, 0.0), ('cd', 'w', 1, 1, 0.995169),
        |  ('cd', 'w', 2, 0, 0.017959), ('cd', 'w', 2, 1, 1.045642),
        |  ('cd', 'h', 0, 0, 0.0), ('cd', 'h', 0, 1, 2.21994),
        |  ('cd', 'h', 1, 0, 27.74954), ('cd', 'h', 1, 1, 0.646984),
        |  ('cd', 'h', 2, 0, 12.812539), ('cd', 'h', 2, 1, 1.3156),
        |  ('kl_reg', 'w', 0, 0, 0.36809), ('kl_reg', 'w', 0, 1, 0.744816),
        |  ('kl_reg', 'w', 1, 0, 0.398693), ('kl_reg', 'w', 1, 1, 0.727305),
        |  ('kl_reg', 'w', 2, 0, 0.554663), ('kl_reg', 'w', 2, 1, 0.860777),
        |  ('kl_reg', 'h', 0, 0, 0.807951), ('kl_reg', 'h', 0, 1, 1.435002),
        |  ('kl_reg', 'h', 1, 0, 0.444772), ('kl_reg', 'h', 1, 1, 0.815698),
        |  ('kl_reg', 'h', 2, 0, 0.651769), ('kl_reg', 'h', 2, 1, 1.00749),
        |  ('fro_reg', 'w', 0, 0, 0.310758), ('fro_reg', 'w', 0, 1, 0.628567),
        |  ('fro_reg', 'w', 1, 0, 0.44816), ('fro_reg', 'w', 1, 1, 0.819687),
        |  ('fro_reg', 'w', 2, 0, 0.550193), ('fro_reg', 'w', 2, 1, 0.840589),
        |  ('fro_reg', 'h', 0, 0, 0.964544), ('fro_reg', 'h', 0, 1, 1.693148),
        |  ('fro_reg', 'h', 1, 0, 0.403257), ('fro_reg', 'h', 1, 1, 0.723296),
        |  ('fro_reg', 'h', 2, 0, 0.711734), ('fro_reg', 'h', 2, 1, 1.058017),
        |  ('nndsvda', 'w', 0, 0, 0.919389), ('nndsvda', 'w', 0, 1, 1.103508),
        |  ('nndsvda', 'w', 1, 0, 1.35198), ('nndsvda', 'w', 1, 1, 1.444444),
        |  ('nndsvda', 'w', 2, 0, 1.376485), ('nndsvda', 'w', 2, 1, 0.219898),
        |  ('nndsvda', 'h', 0, 0, 1.691895), ('nndsvda', 'h', 0, 1, 1.444444),
        |  ('nndsvda', 'h', 1, 0, 0.703892), ('nndsvda', 'h', 1, 1, 1.095498),
        |  ('nndsvda', 'h', 2, 0, 1.099938), ('nndsvda', 'h', 2, 1, 0.256844)
        |) t(variant, kind, id, f, value)""".stripMargin)),

    // L22 STRICT gate — FunkSVD's update numerics, VALUE-pinned. SGD
    // is deterministic given the sample order, so the q153/q167
    // convention applies with one more injection: `sampleOrder` feeds
    // the epoch's (u, item, rating) draws verbatim (incl. one rating-0
    // negative-quota-shaped sample, (0, 2, 0.0)) and `initVec` is the
    // rational (id, salt) init over SEVENTHS — non-terminating decimal
    // expansions, so the transcendental-free funk arithmetic cannot
    // land exactly on a 6-decimal rounding boundary the way the dyadic
    // /4 init did (measured min margin 4.7·10⁻⁸ vs ~10⁻¹⁵ drift).
    // One epoch over 4 samples on a skewed 3-user × 4-item URM; the
    // oracle VALUES come from tools/sgd_twin.py — an independent
    // python float64 reimplementation of the reference epoch
    // (MatrixFactorizationImpressions_Cython_Epoch.pyx:330-448: pred =
    // μ + b_u + b_i + w·h, all five parameter groups stepped from
    // pre-update values) — not from running this code. A bias-order
    // slip, a reg-role swap, a post-update-factor read, or a wrong
    // MSE divisor is a red hash row; q82 (seeded, sf-scale) stays the
    // at-scale demo this gate companion-pins.
    Q("q174_funksvd_epoch_gate", { t =>
        import t.spark.implicits._
        val urm = Seq((0, 0, 1.0), (0, 1, 2.0), (1, 1, 3.0), (1, 2, 1.0),
                      (1, 3, 2.0), (2, 0, 2.0)).toDF("u", "i", "v")
        def init(id: Int, salt: Int): Array[Double] =
          Array.tabulate(2)(f => (1.0 + id + 2 * f + salt) / 7.0)
        val so = Seq((0, 0, 1.0), (1, 3, 2.0), (0, 2, 0.0), (2, 0, 2.0))
        val m = Models.funkSvdSgd(t.spark, urm, rank = 2, epochs = 1,
          samplesPerEpoch = so.size, lr = 0.14, reg = 0.05,
          biasReg = 0.02, negativeQuota = 0.25, seed = 0,
          sampleOrder = Some(so), initVec = Some(init))
        val rows: Seq[(String, Int, Int, Double)] =
          m.userFactors.toSeq.sortBy(_._1).flatMap { case (u, fs) =>
            fs.zipWithIndex.map { case (v, f) => ("w", u, f, v) } } ++
          m.itemFactors.toSeq.sortBy(_._1).flatMap { case (i, fs) =>
            fs.zipWithIndex.map { case (v, f) => ("h", i, f, v) } } ++
          m.userBias.toSeq.sortBy(_._1).map { case (u, b) =>
            ("bu", u, 0, b) } ++
          m.itemBias.toSeq.sortBy(_._1).map { case (i, b) =>
            ("bi", i, 0, b) } ++
          Seq(("mu", 0, 0, m.globalBias),
              ("mse", 0, 0, m.mseHistory.head))
        rows.toDF("kind", "id", "f", "value")
          .select(col("kind"), col("id"), col("f"),
                  round(col("value"), 6).as("value"))
      },
      Some("""SELECT * FROM (VALUES
        |  ('w', 0, 0, CAST(0.099772 AS DOUBLE)), ('w', 0, 1, 0.37514),
        |  ('w', 1, 0, 0.396163), ('w', 1, 1, 0.724857),
        |  ('w', 2, 0, 0.475698), ('w', 2, 1, 0.811942),
        |  ('h', 0, 0, 0.368004), ('h', 0, 1, 0.726164),
        |  ('h', 2, 0, 0.546711), ('h', 2, 1, 0.792464),
        |  ('h', 3, 0, 0.754265), ('h', 3, 1, 1.082959),
        |  ('bu', 0, 0, -0.021841), ('bu', 1, 0, 0.157429),
        |  ('bu', 2, 0, 0.16821),
        |  ('bi', 0, 0, 0.26793), ('bi', 2, 0, -0.121561),
        |  ('bi', 3, 0, 0.157429),
        |  ('mu', 0, 0, 0.3027), ('mse', 0, 0, 0.993053)
        |) t(kind, id, f, value)""".stripMargin)),

    // L21 STRICT gate — the MF-BPR triple update across the FULL
    // searched sgd_mode surface (sgd / adagrad / rmsprop / adam,
    // pyx:905-943 adaptive_gradient incl. the per-entity-factor
    // squared caches, adam's first/second moments with bias
    // correction, and the per-batch β-power exponentiation) AND the
    // mini-batch accumulate-then-apply path (batchSize = 2,
    // pyx:662-718 + :838-899): batch 1 = {(0,0,2), (1,1,0)} makes
    // item 0 accumulate as a POSITIVE of sample 1 and the NEGATIVE of
    // sample 2 before one divided-by-batch application. Per-role regs
    // split three ways (reg=0.05 / negativeReg=0.03 / userReg=0.02,
    // pyx:700-703). Injected tripleOrder + rational sevenths init, so
    // every cache mutation is value-determined; oracle VALUES from the
    // independent tools/sgd_twin.py. A cache shared across entities, a
    // β-power advanced per sample instead of per batch, a missing
    // bias correction, a reg-role swap, or a ragged-batch divisor slip
    // is a red hash row; q68/q80 stay the at-scale demos.
    Q("q175_bpr_update_gate", { t =>
        import t.spark.implicits._
        val urm = Seq((0, 0, 1.0), (0, 1, 2.0), (1, 1, 3.0), (1, 2, 1.0),
                      (1, 3, 2.0), (2, 0, 2.0)).toDF("u", "i", "v")
        def init(id: Int, salt: Int): Array[Double] =
          Array.tabulate(2)(f => (1.0 + id + 2 * f + salt) / 7.0)
        val triples = Seq((0, 0, 2), (1, 1, 0), (0, 1, 2), (1, 2, 0))
        Seq("sgd", "adagrad", "rmsprop", "adam").flatMap { mode =>
          val (uf, itf) = Models.mfBpr(t.spark, urm, rank = 2,
            epochs = 1, samplesPerEpoch = triples.size, lr = 0.14,
            reg = 0.05, seed = 0, sgdMode = mode,
            negativeReg = Some(0.03), userReg = Some(0.02),
            batchSize = 2, tripleOrder = Some(triples),
            initVec = Some(init))
          uf.toSeq.sortBy(_._1).flatMap { case (u, fs) =>
            fs.zipWithIndex.map { case (v, f) => (mode, "w", u, f, v) }
          } ++
          itf.toSeq.sortBy(_._1).flatMap { case (i, fs) =>
            fs.zipWithIndex.map { case (v, f) => (mode, "h", i, f, v) }
          }
        }.toDF("mode", "kind", "id", "f", "value")
          .select(col("mode"), col("kind"), col("id"), col("f"),
                  round(col("value"), 6).as("value"))
      },
      Some("""SELECT * FROM (VALUES
        |  ('sgd', 'w', 0, 0, CAST(0.127026 AS DOUBLE)),
        |  ('sgd', 'w', 0, 1, 0.412655),
        |  ('sgd', 'w', 1, 0, 0.298377), ('sgd', 'w', 1, 1, 0.582946),
        |  ('sgd', 'h', 0, 0, 0.270606), ('sgd', 'h', 0, 1, 0.546753),
        |  ('sgd', 'h', 1, 0, 0.43969), ('sgd', 'h', 1, 1, 0.74306),
        |  ('sgd', 'h', 2, 0, 0.565839), ('sgd', 'h', 2, 1, 0.8371),
        |  ('adagrad', 'w', 0, 0, 0.057804),
        |  ('adagrad', 'w', 0, 1, 0.337926),
        |  ('adagrad', 'w', 1, 0, 0.548333),
        |  ('adagrad', 'w', 1, 1, 0.835297),
        |  ('adagrad', 'h', 0, 0, 0.017373),
        |  ('adagrad', 'h', 0, 1, 0.296068),
        |  ('adagrad', 'h', 1, 0, 0.53592),
        |  ('adagrad', 'h', 1, 1, 0.908981),
        |  ('adagrad', 'h', 2, 0, 0.548187),
        |  ('adagrad', 'h', 2, 1, 0.767681),
        |  ('rmsprop', 'w', 0, 0, 0.14122),
        |  ('rmsprop', 'w', 0, 1, 0.426808),
        |  ('rmsprop', 'w', 1, 0, 2.655495),
        |  ('rmsprop', 'w', 1, 1, 2.784313),
        |  ('rmsprop', 'h', 0, 0, -3.637137),
        |  ('rmsprop', 'h', 0, 1, -3.359149),
        |  ('rmsprop', 'h', 1, 0, 0.431823),
        |  ('rmsprop', 'h', 1, 1, 0.732757),
        |  ('rmsprop', 'h', 2, 0, 0.569921),
        |  ('rmsprop', 'h', 2, 1, 0.843241),
        |  ('adam', 'w', 0, 0, -0.042512), ('adam', 'w', 0, 1, 0.237534),
        |  ('adam', 'w', 1, 0, 0.562223), ('adam', 'w', 1, 1, 0.847313),
        |  ('adam', 'h', 0, 0, 0.012741), ('adam', 'h', 0, 1, 0.306761),
        |  ('adam', 'h', 1, 0, 0.635481), ('adam', 'h', 1, 1, 0.98135),
        |  ('adam', 'h', 2, 0, 0.466583), ('adam', 'h', 2, 1, 0.66729)
        |) t(mode, kind, id, f, value)""".stripMargin)),

    // L22 STRICT gate — AsySVD's update numerics (pyx:449-630): w_u is
    // ACCUMULATED from profile-item Y rows scaled 1/√|profile| (the
    // per-user free parameters the algorithm deliberately lacks), Y
    // steps against the PRE-update H_i for every profile item, H
    // against the pre-update accumulated w_u, and the final user
    // factors re-estimate W = URM·Y/√n from the TRAINED Y
    // (MatrixFactorizationImpressions_Cython.py:305-326) — all three
    // exposed as hash rows ('y'/'h'/'west') plus biases and the MSE
    // trace. Sample 3 is the rating-0 negative-draw shape on an item
    // OUTSIDE u0's profile, so the Y loop and the scored item decouple.
    // Injected sampleOrder + sevenths init; oracle VALUES from the
    // independent tools/sgd_twin.py. A post-update H read in the Y
    // step, a missing √n, or a W estimate from stale Y is a red row;
    // q85 stays the at-scale demo.
    Q("q176_asysvd_epoch_gate", { t =>
        import t.spark.implicits._
        val urm = Seq((0, 0, 1.0), (0, 1, 2.0), (1, 1, 3.0), (1, 2, 1.0),
                      (1, 3, 2.0), (2, 0, 2.0)).toDF("u", "i", "v")
        def init(id: Int, salt: Int): Array[Double] =
          Array.tabulate(2)(f => (1.0 + id + 2 * f + salt) / 7.0)
        val so = Seq((0, 0, 1.0), (1, 2, 1.0), (0, 3, 0.0))
        val m = Models.asySvdSgd(t.spark, urm, rank = 2, epochs = 1,
          samplesPerEpoch = so.size, lr = 0.14, reg = 0.05,
          biasReg = 0.02, negativeQuota = 0.25, seed = 0,
          sampleOrder = Some(so), initVec = Some(init))
        val rows: Seq[(String, Int, Int, Double)] =
          m.itemFactorsY.toSeq.sortBy(_._1).flatMap { case (l, fs) =>
            fs.zipWithIndex.map { case (v, f) => ("y", l, f, v) } } ++
          m.itemFactors.toSeq.sortBy(_._1).flatMap { case (i, fs) =>
            fs.zipWithIndex.map { case (v, f) => ("h", i, f, v) } } ++
          m.userBias.toSeq.sortBy(_._1).map { case (u, b) =>
            ("bu", u, 0, b) } ++
          m.itemBias.toSeq.sortBy(_._1).map { case (i, b) =>
            ("bi", i, 0, b) } ++
          Seq(("mu", 0, 0, m.globalBias),
              ("mse", 0, 0, m.mseHistory.head)) ++
          m.userFactors.toSeq.sortBy(_._1).flatMap { case (u, fs) =>
            fs.zipWithIndex.map { case (v, f) => ("west", u, f, v) } }
        rows.toDF("kind", "id", "f", "value")
          .select(col("kind"), col("id"), col("f"),
                  round(col("value"), 6).as("value"))
      },
      Some("""SELECT * FROM (VALUES
        |  ('y', 0, 0, CAST(0.063121 AS DOUBLE)), ('y', 0, 1, 0.325891),
        |  ('y', 1, 0, 0.155782), ('y', 1, 1, 0.393394),
        |  ('y', 2, 0, 0.379158), ('y', 2, 1, 0.639665),
        |  ('y', 3, 0, 0.521015), ('y', 3, 1, 0.781522),
        |  ('h', 0, 0, 0.305324), ('h', 0, 1, 0.617852),
        |  ('h', 2, 0, 0.506274), ('h', 2, 1, 0.748931),
        |  ('h', 3, 0, 0.668765), ('h', 3, 1, 0.89595),
        |  ('bu', 0, 0, -0.066055), ('bu', 1, 0, -0.081224),
        |  ('bi', 0, 0, 0.07131), ('bi', 2, 0, -0.081224),
        |  ('bi', 3, 0, -0.137165),
        |  ('mu', 0, 0, -0.147251), ('mse', 0, 0, 0.51865),
        |  ('west', 0, 0, 0.154788), ('west', 0, 1, 0.508611),
        |  ('west', 1, 0, 0.609656), ('west', 1, 1, 1.047649),
        |  ('west', 2, 0, 0.063121), ('west', 2, 1, 0.325891)
        |) t(kind, id, f, value)""".stripMargin)),

    // L24 STRICT gate — the SLIM-BPR triple update
    // (SLIM_BPR_Cython_Epoch.pyx:212-310 dense path): x_uij sums
    // S[i⁺,l] − S[j⁻,l] over the user's profile, g = σ(−x), then
    // S[i⁺,l] += lr·(g − λᵢ·S[i⁺,l]) and S[j⁻,l] −= lr·(g − λⱼ·S[j⁻,l])
    // with the DIAGONAL pinned (l = i⁺ and l = j⁻ skipped per side).
    // Triple (2,0,1) exercises the all-diagonal profile (u2's only
    // profile item IS the positive — the i-side update must vanish
    // while the j-side still writes S[1,0]); triples 1 and 3 compound
    // onto the same S rows so second-visit reg terms read the mutated
    // values. Injected tripleOrder (S inits at zero — no init needed);
    // oracle VALUES from the independent tools/sgd_twin.py. A diagonal
    // write, a swapped λᵢ/λⱼ, or a sign slip on the j side is a red
    // hash row; q83 stays the at-scale demo.
    Q("q177_slimbpr_update_gate", { t =>
        import t.spark.implicits._
        val urm = Seq((0, 0, 1.0), (0, 1, 2.0), (1, 1, 3.0), (1, 2, 1.0),
                      (1, 3, 2.0), (2, 0, 2.0)).toDF("u", "i", "v")
        val triples = Seq((0, 0, 2), (1, 1, 0), (0, 1, 3), (2, 0, 1))
        Models.slimBpr(t.spark, urm, epochs = 1,
            samplesPerEpoch = triples.size, lr = 0.14, liReg = 0.05,
            ljReg = 0.03, topK = 10, seed = 0,
            tripleOrder = Some(triples))
          .select(col("i"), col("j"), round(col("w"), 6).as("w"))
      },
      Some("""SELECT * FROM (VALUES
        |  (1, 0, CAST(-0.002155 AS DOUBLE)), (2, 0, -0.072449),
        |  (3, 0, -0.072449),
        |  (0, 1, -0.002155), (2, 1, 0.072449), (3, 1, 0.072449),
        |  (0, 2, -0.07), (1, 2, -0.07),
        |  (0, 3, -0.07), (1, 3, -0.07)
        |) t(i, j, w)""".stripMargin)),

    // L20 STRICT gate — the weighted-λ translation on a SKEWED-degree
    // fixture, closing q170's one open flank: q170 pinned ml.ALS ↔
    // exact kernel only at constant degree, where ml's per-row
    // regParam·n_u collapses to a uniform 2λ. Here user degrees are
    // {1, 3, 2, 2}, so NO constant λ can reproduce ml's solve — the
    // one-step identity must hold with the PER-ROW reweighting
    // (ialsUserStep regScaledByDegree: diag += λ·n_u, ml.ALS's ALS-WR
    // rule) and must FAIL for both constant readings (λ and 2λ — the
    // teeth, asserted as oracle values, not prose). Same init- and
    // convergence-independent identity as q170: ml's last internal
    // update is the user ridge solve against its final item factors,
    // so ialsUserStep(urm, itemFactors_ml) must reproduce
    // userFactors_ml to float32 precision under both confidence
    // scalings. Reference divergence documented at ialsUserStep:
    // the reference adds plain λ (IALSRecommender.py:165-186); ml.ALS
    // scales by the positive-rating count — this gate proves the
    // engine speaks both, exactly.
    Q("q178_ials_weighted_reg_gate", { t =>
        import t.spark.implicits._
        // user degrees 1/3/2/2 — skewed; all ratings positive, so
        // ml.ALS's numExplicits equals the row count
        val urm = Seq((0, 0, 1.0), (1, 0, 2.0), (1, 1, 1.0), (1, 2, 3.0),
                      (2, 1, 2.0), (2, 3, 1.0), (3, 2, 2.0), (3, 3, 2.0))
          .toDF("u", "i", "v")
        val alpha = 1.5; val lam = 0.3; val eps = 0.5
        // concurrent independent fits per scaling — the q170 note
        graft.core.Par.run(t.spark.sparkContext, "graft-q178-scalings",
                           30, Seq("linear", "log")) { scaling =>
          // numBlocks = 1 — the q170 note: 8-row fixture, block
          // partitioning is pure overhead; booleans init-independent
          val (ufMl0, itfMl0) = Models.ials(urm, rank = 2, reg = lam,
            alpha = alpha, iters = 25, seed = 7,
            confidenceScaling = scaling, epsilon = eps, numBlocks = 1)
          def toArr(df: org.apache.spark.sql.DataFrame) =
            df.select(col("id"), col("features"))
              .as[(Int, Array[Float])].collect()
              .map { case (i, f) => (i, f.map(_.toDouble)) }.sortBy(_._1)
          val ufMl = toArr(ufMl0)
          val itfDf = toArr(itfMl0).toSeq.toDF("i", "factors")
          def maxMove(a: Array[(Int, Array[Double])],
                      b: Array[(Int, Array[Double])]): Double =
            a.zip(b).map { case ((_, x), (_, y)) =>
              x.zip(y).map { case (p, q) => math.abs(p - q) }.max }.max
          def oneStep(reg: Double, scaled: Boolean) =
            Models.ialsUserStep(t.spark, urm, itfDf, alpha, reg,
                scaling, eps, regScaledByDegree = scaled)
              .as[(Int, Array[Double])].collect().sortBy(_._1)
          (scaling,
           maxMove(oneStep(lam, scaled = true), ufMl) < 1e-5,
           maxMove(oneStep(lam, scaled = false), ufMl) > 1e-4,
           maxMove(oneStep(2 * lam, scaled = false), ufMl) > 1e-4)
        }.toDF("scaling", "weighted_matches", "plain_diverges",
               "doubled_diverges")
      },
      Some("""SELECT * FROM (VALUES
        |  ('linear', true, true, true), ('log', true, true, true)
        |) t(scaling, weighted_matches, plain_diverges, doubled_diverges)"""
        .stripMargin))
  )
}
