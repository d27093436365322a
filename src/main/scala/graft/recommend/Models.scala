package graft.recommend

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.mllib.linalg.{Vectors => OldVectors}
import org.apache.spark.mllib.linalg.distributed.RowMatrix
import org.apache.spark.ml.recommendation.ALS
import breeze.linalg.{inv, DenseMatrix => BDM}

/** Factorization / regression model operators (SURVEY.md §2.8 L18–L25).
  *
  * Spark-first choices per SURVEY §7.3: PureSVD → mllib RowMatrix SVD;
  * IALS → ml.recommendation.ALS(implicitPrefs) (Hu-Koren-Volinsky, the
  * same objective as the reference's IALSRecommender.py:19-22); EASE^R →
  * distributed Gram aggregation + driver Breeze inverse (the one place
  * the math demands a local dense solve, guarded by a size check);
  * SLIM ElasticNet → embarrassingly parallel per-item coordinate descent
  * over a broadcast URM (mapPartitions, reference
  * SLIM_ElasticNet/SLIMElasticNetRecommender.py:41-150).
  */
object Models {

  /** L18 — PureSVD (reference: MatrixFactorization/PureSVDRecommender.py:
    * 33-45): truncated SVD of the user×item matrix; item factors are
    * (Σ·Vᵀ)ᵀ rows. Returns (i, factors ARRAY<double>). Item ids must be
    * dense indices (use etl.Urm.denseIndex first). */
  def pureSvdItemFactors(spark: SparkSession, urm: DataFrame, k: Int,
                         nItems: Int): DataFrame = {
    val rows = urm.select(col("u").cast("int"), col("i").cast("int"),
                          col("v").cast("double"))
      .rdd.map(r => (r.getInt(0), (r.getInt(1), r.getDouble(2))))
      .groupByKey()
      .map { case (_, cols) =>
        OldVectors.sparse(nItems, cols.toSeq.sortBy(_._1))
      }
    val svd = new RowMatrix(rows).computeSVD(k, computeU = false)
    val v = svd.V // nItems × k
    val s = svd.s
    import spark.implicits._
    (0 until nItems).map { i =>
      (i, (0 until s.size).map(f => v(i, f) * s(f)).toArray)
    }.toDF("i", "factors")
  }

  /** L20 — IALS via ml.recommendation.ALS with implicit preferences
    * (reference: MatrixFactorization/IALSRecommender.py:40-201;
    * linear confidence 1+αr). Returns the fitted model's user and item
    * factor frames. */
  def ials(urm: DataFrame, rank: Int, reg: Double, alpha: Double,
           iters: Int, seed: Long): (DataFrame, DataFrame) = {
    val als = new ALS()
      .setUserCol("u").setItemCol("i").setRatingCol("v")
      .setImplicitPrefs(true).setRank(rank).setRegParam(reg)
      .setAlpha(alpha).setMaxIter(iters).setSeed(seed)
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

  /** L23 — SLIM ElasticNet: one positive-only coordinate-descent
    * regression per item against the broadcast URM
    * (reference: SLIM_ElasticNet/SLIMElasticNetRecommender.py:41-150).
    * Items partition across the cluster; each task solves its own
    * columns — the same parallelism the reference gets from
    * multiprocessing, expressed as mapPartitions. Returns (i, j, w)
    * with the top-K positive coefficients per target item. */
  def slimElasticNet(spark: SparkSession, urm: DataFrame, l1Reg: Double,
                     l2Reg: Double, topK: Int, iters: Int): DataFrame = {
    import spark.implicits._
    val triples = urm.select(col("u").cast("int"), col("i").cast("int"))
      .as[(Int, Int)].collect()
    val byItem = triples.groupBy(_._2).map { case (i, rs) =>
      (i, rs.map(_._1).toSet)
    }
    val bc = spark.sparkContext.broadcast(byItem)
    val items = byItem.keys.toSeq.sorted
    val result = spark.sparkContext.parallelize(items, 32)
      .flatMap { target =>
        val cols = bc.value
        val y = cols(target)
        // coordinate descent on w_j ≥ 0, j ≠ target:
        // minimize ½‖y − Σ w_j x_j‖² + λ1‖w‖1 + ½λ2‖w‖²
        val others = cols.keys.filter(_ != target).toArray.sorted
        val w = scala.collection.mutable.Map[Int, Double]()
        var it = 0
        while (it < iters) {
          others.foreach { j =>
            val xj = cols(j)
            val xjy = (xj & y).size.toDouble
            // residual correlation excluding j
            val cross = w.iterator.filter(_._1 != j).map { case (k, wk) =>
              wk * (xj & cols(k)).size
            }.sum
            val rho = xjy - cross
            val denom = xj.size + l2Reg
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
    * Spark-first split: triple sampling (u, i⁺) is a distributed seeded
    * query per epoch; the SGD update runs on the driver over the
    * collected epoch sample, mirroring the reference's in-process
    * Cython kernel. Returns (userFactors, itemFactors) keyed by id. */
  def mfBpr(spark: SparkSession, urm: DataFrame, rank: Int,
            epochs: Int, samplesPerEpoch: Int, lr: Double, reg: Double,
            seed: Long, impressions: Option[DataFrame] = None,
            samplingMode: String = "none")
      : (Map[Int, Array[Double]], Map[Int, Array[Double]]) = {
    import spark.implicits._
    require(Seq("none", "inside", "outside").contains(samplingMode))
    val items = urm.select(col("i").cast("int")).distinct()
      .as[Int].collect().sorted
    val rng = new scala.util.Random(seed)
    val uf = scala.collection.mutable.Map[Int, Array[Double]]()
    val itf = scala.collection.mutable.Map[Int, Array[Double]]()
    def fac(m: scala.collection.mutable.Map[Int, Array[Double]], id: Int) =
      m.getOrElseUpdate(id, Array.fill(rank)((rng.nextDouble() - 0.5) * 0.1))
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
    def drawNegative(u: Int, s: Set[Int]): Int = samplingMode match {
      case "inside" =>
        val cand = shown.getOrElse(u, Array.empty).filterNot(s.contains)
        if (cand.nonEmpty) cand(rng.nextInt(cand.length))
        else drawUniform(s)
      case "outside" =>
        val sh = shown.getOrElse(u, Array.empty).toSet
        var j = items(rng.nextInt(items.length))
        var guard = 0
        while ((s.contains(j) || sh.contains(j)) && guard < 1000) {
          j = items(rng.nextInt(items.length)); guard += 1
        }
        j
      case _ => drawUniform(s)
    }
    def drawUniform(s: Set[Int]): Int = {
      var j = items(rng.nextInt(items.length))
      while (s.contains(j)) j = items(rng.nextInt(items.length))
      j
    }
    (0 until epochs).foreach { ep =>
      val sample = urm.select(col("u").cast("int"), col("i").cast("int"))
        .orderBy(rand(seed + ep)).limit(samplesPerEpoch)
        .as[(Int, Int)].collect()
      sample.foreach { case (u, ipos) =>
        val s = seen(u)
        val jneg = drawNegative(u, s)
        val wu = fac(uf, u); val hi = fac(itf, ipos); val hj = fac(itf, jneg)
        var xuij = 0.0
        var f = 0
        while (f < rank) { xuij += wu(f) * (hi(f) - hj(f)); f += 1 }
        val sig = 1.0 / (1.0 + math.exp(xuij))
        f = 0
        while (f < rank) {
          val du = sig * (hi(f) - hj(f)) - reg * wu(f)
          val di = sig * wu(f) - reg * hi(f)
          val dj = -sig * wu(f) - reg * hj(f)
          wu(f) += lr * du; hi(f) += lr * di; hj(f) += lr * dj
          f += 1
        }
      }
    }
    (uf.toMap, itf.toMap)
  }

  /** L21 at scale — distributed MF-BPR: per-partition Hogwild SGD with
    * parameter averaging. Each epoch:
    *  1. a distributed seeded query samples (u, i⁺, j⁻) triples —
    *     positives from the URM, negatives by rand-pick + anti-join
    *     rejection (no driver-side sampling);
    *  2. every partition runs local BPR SGD over its triples against a
    *     broadcast snapshot of the factors;
    *  3. updated factor vectors are averaged per id across partitions
    *     (parameter averaging — the standard distributed-SGD
    *     compromise; exact sequential semantics are impossible to
    *     distribute, SURVEY §7.4).
    * The driver only holds the factor matrices (rank · (|U|+|I|)), not
    * the URM — the data-sized structures stay distributed. */
  def mfBprDistributed(spark: SparkSession, urm: DataFrame, rank: Int,
                       epochs: Int, samplesPerEpoch: Int, lr: Double,
                       reg: Double, seed: Long)
      : (Map[Int, Array[Double]], Map[Int, Array[Double]]) = {
    import spark.implicits._
    val triplesBase = urm.select(col("u").cast("int").as("u"),
                                 col("i").cast("int").as("i"))
    val items = triplesBase.select("i").distinct().as[Int].collect().sorted
    val nItems = items.length
    val initRng = new scala.util.Random(seed)
    var uf = triplesBase.select("u").distinct().as[Int].collect()
      .map(u => u -> Array.fill(rank)((initRng.nextDouble() - 0.5) * 0.1))
      .toMap
    var itf = items
      .map(i => i -> Array.fill(rank)((initRng.nextDouble() - 0.5) * 0.1))
      .toMap
    val itemsBc = spark.sparkContext.broadcast(items)
    (0 until epochs).foreach { ep =>
      // 1. distributed triple sampling: positive sample + candidate
      //    negative, rejected against the URM by anti-join
      val sample = triplesBase
        .orderBy(rand(seed + ep)).limit(samplesPerEpoch)
        .withColumn("jneg",
          element_at(typedLit(items),
                     (floor(rand(seed + 7 * ep) * nItems) + 1)
                       .cast("int")))
      val valid = sample.join(
        triplesBase.select(col("u"), col("i").as("jneg")),
        Seq("u", "jneg"), "left_anti")
      val ufBc = spark.sparkContext.broadcast(uf)
      val itfBc = spark.sparkContext.broadcast(itf)
      // 2. per-partition local SGD over broadcast factor snapshots
      val updated = valid.select("u", "i", "jneg")
        .as[(Int, Int, Int)].rdd
        .mapPartitions { part =>
          val lu = scala.collection.mutable.Map[Int, Array[Double]]()
          val li = scala.collection.mutable.Map[Int, Array[Double]]()
          def cu(id: Int) = lu.getOrElseUpdate(id, ufBc.value(id).clone())
          def ci(id: Int) = li.getOrElseUpdate(id, itfBc.value(id).clone())
          part.foreach { case (u, ipos, jneg) =>
            val wu = cu(u); val hi = ci(ipos); val hj = ci(jneg)
            var x = 0.0
            var f = 0
            while (f < rank) { x += wu(f) * (hi(f) - hj(f)); f += 1 }
            val sig = 1.0 / (1.0 + math.exp(x))
            f = 0
            while (f < rank) {
              val du = sig * (hi(f) - hj(f)) - reg * wu(f)
              val di = sig * wu(f) - reg * hi(f)
              val dj = -sig * wu(f) - reg * hj(f)
              wu(f) += lr * du; hi(f) += lr * di; hj(f) += lr * dj
              f += 1
            }
          }
          lu.iterator.map { case (id, v) => (("u", id), v) } ++
            li.iterator.map { case (id, v) => (("i", id), v) }
        }
      // 3. parameter averaging per id across partitions
      val averaged = updated
        .mapValues(v => (v, 1))
        .reduceByKey((x: (Array[Double], Int), y: (Array[Double], Int)) => {
          val s = x._1.clone()
          var f = 0
          while (f < rank) { s(f) += y._1(f); f += 1 }
          (s, x._2 + y._2)
        })
        .mapValues(sn => sn._1.map(_ / sn._2))
        .collect()
      averaged.foreach {
        case (("u", id), v) => uf = uf.updated(id, v)
        case (("i", id), v) => itf = itf.updated(id, v)
        case _ => ()
      }
      ufBc.destroy(); itfBc.destroy()
    }
    (uf, itf)
  }

  /** L27 — incremental training with early stopping (reference:
    * Base/Incremental_Training_Early_Stopping.py:91-262): run
    * `trainEpoch` up to `maxEpochs`, validate every `validateEvery`,
    * keep the best metric, stop after `patience` non-improving
    * validations. Returns (bestEpoch, bestMetric, history). */
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
