package graft

import org.apache.spark.sql.functions._
import graft.recommend.{Models, Recommenders}
import graft.etl.Urm

/** Model operators on hand-checkable fixtures (SURVEY §5: the oracle
  * can't run SGD — properties and closed forms instead). */
class ModelsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val urm = (for {
    u <- 0 until 30; i <- 0 until 20 if (u + i) % 3 != 0
  } yield (u, i, 1)).toDF("u", "i", "v").cache()

  test("EASE^R: zero diagonal and B ≈ identity-ish reconstruction") {
    val b = Models.easeR(spark, urm, l2 = 10.0, maxItems = 100)
    assert(b.filter(col("i") === col("j")).count() == 0)
    // weights finite
    assert(b.filter(col("w").isNull || isnan(col("w"))).count() == 0)
    assert(b.count() == 20L * 19L)
  }

  test("SLIM: non-negative weights, bounded per-item neighborhood") {
    val w = Models.slimElasticNet(spark, urm, l1Reg = 0.1, l2Reg = 1.0,
                                  topK = 5, iters = 3)
    assert(w.filter(col("w") < 0).count() == 0)
    val perItem = w.groupBy("j").count().collect()
    assert(perItem.forall(_.getLong(1) <= 5))
  }

  test("PureSVD factors reconstruct popularity ordering roughly") {
    val f = Models.pureSvdItemFactors(spark, urm, k = 5, nItems = 20)
    assert(f.count() == 20)
    val norms = f.select(col("i"),
      graft.ann.Ann.norm2(col("factors")).as("n")).collect()
    assert(norms.forall(r => !r.getDouble(1).isNaN))
  }

  test("IALS produces rank-sized factors") {
    val (uf, itf) = Models.ials(urm, rank = 4, reg = 0.1, alpha = 1.0,
                                iters = 3, seed = 1)
    assert(uf.head().getAs[scala.collection.Seq[Float]]("features").size == 4)
    assert(itf.count() == 20)
  }

  test("IALS numBlocks partitioning knob: any block count fits the " +
       "same shape; invalid counts rejected") {
    // the solve is per-row exact; block count changes only WHERE
    // partial products are computed (and low-order float sum order),
    // so every block count must yield complete rank-sized factors
    for (nb <- Seq(1, 4)) {
      val (uf, itf) = Models.ials(urm, rank = 3, reg = 0.1, alpha = 1.0,
                                  iters = 2, seed = 1, numBlocks = nb)
      assert(uf.count() == 30 && itf.count() == 20, s"numBlocks=$nb")
      assert(uf.head().getAs[scala.collection.Seq[Float]]("features")
               .size == 3)
    }
    intercept[IllegalArgumentException] {
      Models.ials(urm, rank = 2, reg = 0.1, alpha = 1.0, iters = 1,
                  seed = 1, numBlocks = 0)
    }
  }

  test("IALS deep fits survive (checkpoint-truncated lineage) — " +
       "25 iterations used to overflow the task-serialization stack") {
    val (uf, _) = Models.ials(urm, rank = 2, reg = 0.4, alpha = 1.0,
                              iters = 25, seed = 3)
    assert(uf.count() == 30)
  }

  test("ml.ALS solve == exact reference kernel under the weighted-λ " +
       "translation (and ONLY under it)") {
    // constant degree 2 on both axes so ml's weighted-λ (regParam
    // scaled by the per-row positive count) is the uniform 2·λ
    val tiny = Seq((0, 0, 1.0), (0, 1, 2.0), (1, 1, 1.0), (1, 2, 3.0),
                   (2, 2, 2.0), (2, 3, 1.0), (3, 3, 2.0), (3, 0, 3.0))
      .toDF("u", "i", "v")
    val alpha = 2.0; val lam = 0.4
    for (scaling <- Seq("linear", "log")) {
      val (ufMl0, itfMl0) = Models.ials(tiny, rank = 2, reg = lam,
        alpha = alpha, iters = 6, seed = 11,
        confidenceScaling = scaling, epsilon = 0.5)
      def toArr(df: org.apache.spark.sql.DataFrame) =
        df.select(col("id"), col("features"))
          .as[(Int, Array[Float])].collect()
          .map { case (i, f) => (i, f.map(_.toDouble)) }.sortBy(_._1)
      val ufMl = toArr(ufMl0)
      val itfDf = toArr(itfMl0).toSeq.toDF("i", "factors")
      def diffVs(reg: Double): Double = {
        val step = Models.ialsUserStep(spark, tiny, itfDf, alpha, reg,
            scaling, 0.5)
          .as[(Int, Array[Double])].collect().sortBy(_._1)
        step.zip(ufMl).map { case ((_, x), (_, y)) =>
          x.zip(y).map { case (p, q) => math.abs(p - q) }.max }.max
      }
      // ml's LAST internal update is the user solve vs final item
      // factors: the exact kernel reproduces it to float32 precision
      assert(diffVs(2 * lam) < 1e-5, s"$scaling: solve mismatch")
      // ...and the tie has teeth: the reference's PLAIN-λ reading of
      // the same regParam does NOT match — the translation is real
      assert(diffVs(lam) > 1e-3, s"$scaling: plain-λ unexpectedly matched")
    }
  }

  test("ialsUserStep guards its broadcast contract (duplicate / empty " +
       "item factors)") {
    import org.apache.spark.sql.functions.col
    val tiny = Seq((0, 0, 1.0), (0, 1, 2.0)).toDF("u", "i", "v")
    val y = Seq((0, Array(0.5, 0.0)), (1, Array(0.0, 0.5)))
      .toDF("i", "factors")
    // the happy path solves (sanity — q167 pins the values)
    assert(Models.ialsUserStep(spark, tiny, y, 0.5, 0.25).count() == 1)
    // duplicate item ids would double-count YtY vs the lookup map
    intercept[IllegalArgumentException] {
      Models.ialsUserStep(spark, tiny, y.unionByName(y), 0.5, 0.25)
        .count()
    }
    intercept[IllegalArgumentException] {
      Models.ialsUserStep(spark, tiny, y.filter(col("i") < -1), 0.5, 0.25)
    }
    // an interaction on an item with no factor row fails in the solve
    val urmUnknown = Seq((0, 7, 1.0)).toDF("u", "i", "v")
    intercept[org.apache.spark.SparkException] {
      Models.ialsUserStep(spark, urmUnknown, y, 0.5, 0.25).count()
    }
  }

  test("MF-BPR ranks positives above unseen negatives on average") {
    val (uf, itf) = Models.mfBpr(spark, urm, rank = 6, epochs = 8,
      samplesPerEpoch = 1500, lr = 0.1, reg = 0.01, seed = 42)
    val seen = urm.select("u", "i").as[(Int, Int)].collect()
      .groupBy(_._1).map { case (u, rs) => (u, rs.map(_._2).toSet) }
    def score(u: Int, i: Int): Double =
      (uf(u), itf.get(i)) match {
        case (wu, Some(hi)) => wu.zip(hi).map { case (a, b) => a * b }.sum
        case _ => 0.0
      }
    val margins = for {
      u <- 0 until 30 if uf.contains(u)
      pos <- seen(u).take(3)
      neg <- (0 until 20).find(j => !seen(u).contains(j))
    } yield score(u, pos) - score(u, neg)
    val meanMargin = margins.sum / margins.size
    assert(meanMargin > 0, s"mean BPR margin $meanMargin should be positive")
  }

  test("distributed MF-BPR (partitioned SGD + averaging) learns margins") {
    val (ufDf, itfDf) = Models.mfBprDistributed(spark, urm, rank = 6,
      epochs = 10, samplesPerEpoch = 2000, lr = 0.1, reg = 0.01, seed = 42)
    // the trainer returns distributed frames; the fixture collects them
    val uf = ufDf.as[(Int, Array[Double])].collect().toMap
    val itf = itfDf.as[(Int, Array[Double])].collect().toMap
    val seen = urm.select("u", "i").as[(Int, Int)].collect()
      .groupBy(_._1).map { case (u, rs) => (u, rs.map(_._2).toSet) }
    def score(u: Int, i: Int): Double =
      uf(u).zip(itf(i)).map { case (a, b) => a * b }.sum
    val margins = for {
      u <- 0 until 30
      pos <- seen(u).take(3)
      neg <- (0 until 20).find(j => !seen(u).contains(j))
    } yield score(u, pos) - score(u, neg)
    assert(margins.sum / margins.size > 0,
           "positives must outscore negatives after distributed training")
  }

  test("early-stopped distributed BPR stops before the budget and improves") {
    val split = Urm.hashSplit(urm, 8, 10)
    val hist = Models.bprEarlyStopped(spark, split, rank = 6,
      maxEpochs = 15, validateEvery = 1, patience = 2,
      samplesPerEpoch = 1000, lr = 0.1, reg = 0.01, seed = 42, cutoff = 5)
      .collect()
    assert(hist.nonEmpty)
    val epochs = hist.map(_.getInt(0))
    val maps = hist.sortBy(r => r.getInt(0)).map(_.getDouble(1))
    val bestEpoch = hist.head.getInt(2)
    val bestMap = hist.head.getDouble(3)
    // patience exhausted before the epoch budget
    assert(epochs.max < 15,
           s"expected early stop, trained all ${epochs.max} epochs")
    // the selected model is at least as good as the first validation
    assert(bestMap >= maps.head,
           s"best $bestMap must be >= first ${maps.head}")
    assert(epochs.contains(bestEpoch))
    // history metric at the best epoch equals the reported best
    assert(hist.find(_.getInt(0) == bestEpoch).get.getDouble(1) == bestMap)
  }

  test("MF-BPR impression sampling modes draw from the right pools") {
    // user 0 sees items 0..4; impressions show items 5..9
    val mini = (0 until 5).map(i => (0, i, 1)).toDF("u", "i", "v")
      .unionByName(Seq((1, 10, 1), (1, 11, 1)).toDF("u", "i", "v"))
    val imp = (5 until 10).map(i => (0, i)).toDF("u", "i")
    // inside mode: user 0 negatives must come from 5..9 — train a model
    // and verify no crash + factors exist for impression items only if
    // sampled; the pool property is checked via the sampler directly by
    // running many epochs and confirming impression items got factors
    val (_, itfIn) = Models.mfBpr(spark, mini, rank = 4, epochs = 4,
      samplesPerEpoch = 50, lr = 0.05, reg = 0.01, seed = 3,
      impressions = Some(imp), samplingMode = "inside")
    val negIn = itfIn.keySet.diff(Set(0, 1, 2, 3, 4, 10, 11))
    assert(negIn.nonEmpty && negIn.subsetOf((5 until 10).toSet),
           s"inside-mode negatives must be impression items, got $negIn")
    // outside mode: user 0 negatives must avoid both seen and shown
    val (_, itfOut) = Models.mfBpr(spark, mini, rank = 4, epochs = 4,
      samplesPerEpoch = 50, lr = 0.05, reg = 0.01, seed = 3,
      impressions = Some(imp), samplingMode = "outside")
    assert(itfOut.keySet.intersect((5 until 10).toSet).isEmpty,
           "outside-mode negatives must avoid impression items")
  }

  test("BPR sgd_mode selects distinct adaptive rules (driver + distributed)") {
    // driver kernel: same seed, different update rule → different
    // factors, all finite (pyx:905-943 adaptive_gradient)
    def driverRun(mode: String) =
      Models.mfBpr(spark, urm, rank = 4, epochs = 3,
        samplesPerEpoch = 500, lr = 0.05, reg = 0.01, seed = 9,
        sgdMode = mode)._2
    val dSgd = driverRun("sgd"); val dAda = driverRun("adagrad")
    val dAdam = driverRun("adam")
    for (m <- Seq(dSgd, dAda, dAdam); v <- m.values; x <- v)
      assert(!x.isNaN && !x.isInfinite)
    def flat(m: Map[Int, Array[Double]]): Seq[Double] =
      m.toSeq.sortBy(_._1).flatMap(_._2.toSeq)
    assert(flat(dSgd) != flat(dAda), "adagrad must differ from sgd")
    assert(flat(dAda) != flat(dAdam), "adam must differ from adagrad")
    // distributed path: same property through the partitioned state
    def distRun(mode: String): Seq[Double] =
      Models.mfBprDistributed(spark, urm, rank = 4, epochs = 2,
          samplesPerEpoch = 500, lr = 0.05, reg = 0.01, seed = 9,
          sgdMode = mode)._2
        .as[(Int, Array[Double])].collect().sortBy(_._1)
        .flatMap(_._2.toSeq).toSeq
    val sSgd = distRun("sgd"); val sAdam = distRun("adam")
    assert(sSgd.forall(x => !x.isNaN && !x.isInfinite))
    assert(sAdam.forall(x => !x.isNaN && !x.isInfinite))
    assert(sSgd != sAdam, "distributed adam must differ from sgd")
  }

  test("BPR batch_size changes update frequency, not stability") {
    // driver kernel: batched accumulation divides by the configured
    // batch size (pyx:846) — different trajectory, still finite
    val b1 = Models.mfBpr(spark, urm, rank = 4, epochs = 3,
      samplesPerEpoch = 500, lr = 0.05, reg = 0.01, seed = 9,
      batchSize = 1)._2
    val b64 = Models.mfBpr(spark, urm, rank = 4, epochs = 3,
      samplesPerEpoch = 500, lr = 0.05, reg = 0.01, seed = 9,
      batchSize = 64)._2
    def flat(m: Map[Int, Array[Double]]): Seq[Double] =
      m.toSeq.sortBy(_._1).flatMap(_._2.toSeq)
    assert(flat(b1) != flat(b64))
    assert(flat(b64).forall(x => !x.isNaN && !x.isInfinite))
    // distributed: batchSize=300 with 600 samples/epoch → two merge
    // rounds per epoch; the cap bounds it at one
    val (_, itf) = Models.mfBprDistributed(spark, urm, rank = 4,
      epochs = 2, samplesPerEpoch = 600, lr = 0.05, reg = 0.01,
      seed = 9, batchSize = 300)
    val vals = itf.as[(Int, Array[Double])].collect()
    assert(vals.nonEmpty &&
           vals.forall(_._2.forall(x => !x.isNaN && !x.isInfinite)))
  }

  test("BPR dropout_quota masks factors per epoch in both kernels " +
       "(pyx:70-72, 653-659)") {
    // driver kernel: same seed, dropout on vs off → different factors,
    // still finite; an out-of-range quota is rejected like the
    // reference's assert (pyx:185)
    def driverRun(q: Option[Double]) =
      Models.mfBpr(spark, urm, rank = 4, epochs = 3,
        samplesPerEpoch = 500, lr = 0.05, reg = 0.01, seed = 9,
        dropoutQuota = q)._2
    def flat(m: Map[Int, Array[Double]]): Seq[Double] =
      m.toSeq.sortBy(_._1).flatMap(_._2.toSeq)
    val dOff = driverRun(None); val dOn = driverRun(Some(0.5))
    assert(flat(dOff) != flat(dOn), "dropout must change the trajectory")
    assert(flat(dOn).forall(x => !x.isNaN && !x.isInfinite))
    intercept[IllegalArgumentException] { driverRun(Some(1.5)) }
    // distributed kernel: same property through the partitioned state,
    // and reproducibility (the mask derives from (seed, round), so the
    // same call gives the same factors)
    def distRun(q: Option[Double]): Seq[Double] =
      Models.mfBprDistributed(spark, urm, rank = 4, epochs = 2,
          samplesPerEpoch = 500, lr = 0.05, reg = 0.01, seed = 9,
          dropoutQuota = q)._2
        .as[(Int, Array[Double])].collect().sortBy(_._1)
        .flatMap(_._2.toSeq).toSeq
    val sOff = distRun(None); val sOn = distRun(Some(0.5))
    assert(sOff != sOn, "distributed dropout must change the trajectory")
    assert(sOn.forall(x => !x.isNaN && !x.isInfinite))
    assert(distRun(Some(0.5)) == sOn, "seeded mask must reproduce")
  }

  test("distributed MF-BPR survives the 16-round lineage checkpoint") {
    // 20 merge rounds cross the localCheckpoint boundary at 16; the
    // returned factors must still be consumable (finite, complete)
    val mini = (for { u <- 0 until 10; i <- 0 until 8 if (u + i) % 2 == 0 }
      yield (u, i)).toDF("u", "i")
    val (uf, itf) = Models.mfBprDistributed(spark, mini, rank = 2,
      epochs = 20, samplesPerEpoch = 50, lr = 0.05, reg = 0.01, seed = 5)
    val u = uf.as[(Int, Array[Double])].collect()
    val it = itf.as[(Int, Array[Double])].collect()
    assert(u.length == 10 && it.length == 8)
    assert((u ++ it).forall(_._2.forall(x => !x.isNaN && !x.isInfinite)))
  }

  test("distributed MF-BPR impression modes draw from the right pools") {
    // user 0 sees items 0..4; impressions show items 5..9 (never in
    // the URM); user 1 anchors extra URM items
    val mini = ((0 until 5).map(i => (0, i)) ++ Seq((1, 10), (1, 11)))
      .toDF("u", "i")
    val imp = (5 until 10).map(i => (0, i)).toDF("u", "i")
    // zero-epoch run = the hash-initialized state, via the public API
    val initFac = Models.mfBprDistributed(spark, mini, rank = 4,
      epochs = 0, samplesPerEpoch = 400, lr = 0.05, reg = 0.01,
      seed = 3, impressions = Some(imp), samplingMode = "inside")._2
      .as[(Int, Array[Double])].collect().toMap
    def initOf(i: Int): Seq[Double] = initFac(i).toSeq
    // inside: negatives for user 0 come FROM the impression pool —
    // those items' factor cells must move off their hash init
    val (_, itfIn) = Models.mfBprDistributed(spark, mini, rank = 4,
      epochs = 6, samplesPerEpoch = 400, lr = 0.05, reg = 0.01,
      seed = 3, impressions = Some(imp), samplingMode = "inside")
    val inFac = itfIn.as[(Int, Array[Double])].collect().toMap
    assert((5 until 10).exists(i =>
             inFac.contains(i) && inFac(i).toSeq != initOf(i)),
           "inside mode must train impression-item factors")
    // outside: negatives avoid seen AND shown — impression items'
    // cells never receive a gradient
    val (_, itfOut) = Models.mfBprDistributed(spark, mini, rank = 4,
      epochs = 6, samplesPerEpoch = 400, lr = 0.05, reg = 0.01,
      seed = 3, impressions = Some(imp), samplingMode = "outside")
    val outFac = itfOut.as[(Int, Array[Double])].collect().toMap
    assert((5 until 10).forall(i =>
             outFac.get(i).forall(_.toSeq == initOf(i))),
           "outside mode must never touch impression items")
  }

  test("FunkSVD SGD: train MSE decreases; biases move toward the mean") {
    val m = Models.funkSvdSgd(spark, urm, rank = 6, epochs = 6,
      samplesPerEpoch = 1500, lr = 0.05, reg = 0.01, biasReg = 0.01,
      negativeQuota = 0.3, seed = 42)
    assert(m.mseHistory.size == 6)
    assert(m.mseHistory.last < m.mseHistory.head,
           s"MSE should decrease: ${m.mseHistory}")
    // all-ones positives with 30% zero-negatives → global bias between
    assert(m.globalBias > 0.0 && m.globalBias < 1.0)
    assert(m.userFactors.nonEmpty && m.itemFactors.nonEmpty)
  }

  test("PureSVD dense-eigensolve guard fires above maxItems") {
    val e = intercept[IllegalArgumentException] {
      Models.pureSvdItemFactors(spark, urm, k = 5, nItems = 5000,
                                maxItems = 2000)
    }
    assert(e.getMessage.contains("guarded"))
  }

  test("explicit ALS beats the global-mean baseline on train RMSE") {
    // explicit ratings with real structure: r = 1 + (u+i) % 5
    val ratings = (for {
      u <- 0 until 30; i <- 0 until 20 if (u + i) % 3 != 0
    } yield (u, i, 1.0 + (u + i) % 5)).toDF("u", "i", "v").cache()
    val (uf, itf) = Models.alsExplicit(ratings, rank = 8, reg = 0.05,
                                       iters = 10, seed = 1)
    val ufm = uf.collect().map(r => (r.getInt(0),
      r.getAs[scala.collection.Seq[Float]](1).toArray)).toMap
    val itfm = itf.collect().map(r => (r.getInt(0),
      r.getAs[scala.collection.Seq[Float]](1).toArray)).toMap
    val obs = ratings.as[(Int, Int, Double)].collect()
    val mean = obs.map(_._3).sum / obs.length
    val (sseAls, sseMean) = obs.foldLeft((0.0, 0.0)) {
      case ((a, m), (u, i, v)) =>
        val p = ufm(u).zip(itfm(i)).map { case (x, y) => x * y }.sum
        (a + (v - p) * (v - p), m + (v - mean) * (v - mean))
    }
    assert(sseAls < sseMean,
      s"explicit-ALS train SSE $sseAls must beat global-mean $sseMean")
  }

  test("AsySVD: MSE decreases; user factors = profile·Y/√n") {
    val ratings = (for {
      u <- 0 until 30; i <- 0 until 20 if (u + i) % 3 != 0
    } yield (u, i, 1.0 + (u + i) % 5)).toDF("u", "i", "v")
    val m = Models.asySvdSgd(spark, ratings, rank = 6, epochs = 6,
      samplesPerEpoch = 1500, lr = 0.01, reg = 0.01, biasReg = 0.01,
      negativeQuota = 0.2, seed = 42)
    assert(m.mseHistory.size == 6)
    assert(m.mseHistory.last < m.mseHistory.head,
           s"MSE should decrease: ${m.mseHistory}")
    // user-factor estimation is exactly the profile sum over Y, scaled
    val prof = ratings.select("u", "i").as[(Int, Int)].collect()
      .groupBy(_._1).map { case (u, rs) => (u, rs.map(_._2).sorted) }
    prof.foreach { case (u, items) =>
      val expect = Array.fill(6)(0.0)
      items.foreach { l =>
        m.itemFactorsY.get(l).foreach { yl =>
          (0 until 6).foreach(f => expect(f) += yl(f))
        }
      }
      val denom = math.sqrt(items.length.toDouble)
      (0 until 6).foreach { f =>
        assert(math.abs(m.userFactors(u)(f) - expect(f) / denom) < 1e-9)
      }
    }
  }

  test("SLIM BPR: positive margin, bounded per-column neighborhood") {
    val s = Models.slimBpr(spark, urm, epochs = 6, samplesPerEpoch = 1500,
      lr = 0.05, liReg = 0.001, ljReg = 0.001, topK = 8, seed = 42)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2)))
    val sMap = s.toMap
    val perCol = s.groupBy(_._1._2)
    assert(perCol.forall(_._2.length <= 8), "topK per column")
    // score(u, t) = Σ_{l∈profile(u)} S[t,l]: positives should outscore
    // unseen items on average after training
    val seen = urm.select("u", "i").as[(Int, Int)].collect()
      .groupBy(_._1).map { case (u, rs) => (u, rs.map(_._2).toSet) }
    def score(u: Int, t: Int): Double =
      seen(u).iterator.map(l => sMap.getOrElse((l, t), 0.0)).sum
    val margins = for {
      u <- 0 until 30
      pos <- seen(u).take(2)
      neg <- (0 until 20).find(j => !seen(u).contains(j))
    } yield score(u, pos) - score(u, neg)
    assert(margins.sum / margins.size > 0,
           "positives must outscore negatives after SLIM BPR training")
  }

  test("NMF: nonnegative factors and decreasing reconstruction error") {
    def sse(iters: Int): Double = {
      val (w, h) = Models.nmf(spark, urm, rank = 4, iters = iters,
                              seed = 42)
      val wm = w.as[(Int, Array[Double])].collect().toMap
      val hm = h.as[(Int, Array[Double])].collect().toMap
      assert(wm.values.forall(_.forall(_ >= 0.0)), "W nonnegative")
      assert(hm.values.forall(_.forall(_ >= 0.0)), "H nonnegative")
      urm.select("u", "i", "v").as[(Int, Int, Int)].collect().map {
        case (u, i, v) =>
          val p = wm(u).zip(hm(i)).map { case (a, b) => a * b }.sum
          (v - p) * (v - p)
      }.sum
    }
    val e1 = sse(1); val e5 = sse(5)
    assert(e5 < e1, s"NMF SSE should decrease: $e1 -> $e5")
  }

  test("NMF variant combinations run end-to-end (nndsvda init + each " +
       "solver/loss; KL divergence decreases under KL-MU)") {
    // the searched path's actual combinations (q171 gates init and
    // updates separately; this drives them COMPOSED)
    def fit(solver: String, beta: String, iters: Int) =
      Models.nmf(spark, urm, rank = 3, iters = iters, seed = 1,
                 solver = solver, betaLoss = beta, initType = "nndsvda")
    def klDiv(wh: (org.apache.spark.sql.DataFrame,
                   org.apache.spark.sql.DataFrame)): Double = {
      val wm = wh._1.as[(Int, Array[Double])].collect().toMap
      val hm = wh._2.as[(Int, Array[Double])].collect().toMap
      urm.select("u", "i", "v").as[(Int, Int, Int)].collect().map {
        case (u, i, v) =>
          val p = math.max(
            wm(u).zip(hm(i)).map { case (a, b) => a * b }.sum, 1e-12)
          v * math.log(v / p) - v + p
      }.sum
    }
    val k1 = klDiv(fit("multiplicative_update", "kullback-leibler", 1))
    val k4 = klDiv(fit("multiplicative_update", "kullback-leibler", 4))
    assert(k4 < k1, s"KL divergence should decrease: $k1 -> $k4")
    // cd from nndsvda: nonnegative and finite after sweeps
    val (wc, hc) = fit("coordinate_descent", "frobenius", 3)
    assert(wc.as[(Int, Array[Double])].collect()
      .forall(_._2.forall(x => x >= 0.0 && !x.isNaN)))
    assert(hc.as[(Int, Array[Double])].collect()
      .forall(_._2.forall(x => x >= 0.0 && !x.isNaN)))
  }

  test("NNDSVDa init rejects rank > nItems (would index past the " +
       "Gram eigenbasis)") {
    val nItems = urm.agg(org.apache.spark.sql.functions.max("i"))
      .head.getInt(0) + 1
    val e = intercept[IllegalArgumentException] {
      Models.nndsvdaInit(spark, urm.withColumn(
        "v", org.apache.spark.sql.functions.col("v").cast("double")),
        rank = nItems + 1, nItems = nItems)
    }
    assert(e.getMessage.contains("rank"))
  }

  test("early stopping stops after patience non-improving validations") {
    val metrics = Seq(0.1, 0.2, 0.3, 0.25, 0.2, 0.15, 0.1)
    var calls = 0
    val (bestEpoch, best, history) =
      Models.trainWithEarlyStopping(maxEpochs = 100, validateEvery = 1,
                                    patience = 3) { _ => () } { () =>
        calls += 1; metrics(math.min(calls - 1, metrics.size - 1))
      }
    assert(best == 0.3 && bestEpoch == 3)
    assert(history.size == 6, s"3 improving + 3 patience, got $history")
  }

  test("GlobalEffects biases shrink toward zero with large lambda") {
    val ratings = Seq((0, 0, 5.0), (0, 1, 1.0), (1, 0, 4.0), (1, 1, 2.0))
      .toDF("u", "i", "r")
    val small = Recommenders.globalEffects(ratings, 0.0, 0.0)
      .select("i", "item_bias").distinct().collect()
      .map(r => (r.getInt(0), r.getDouble(1))).toMap
    val big = Recommenders.globalEffects(ratings, 100.0, 100.0)
      .select("i", "item_bias").distinct().collect()
      .map(r => (r.getInt(0), r.getDouble(1))).toMap
    // mu = 3; item 0 mean 4.5 → bias_0 = (9-2·3)/(2+λ)
    assert(math.abs(small(0) - 1.5) < 1e-9)
    assert(math.abs(big(0)) < math.abs(small(0)))
  }

  test("q175 gate fixture has teeth: reg roles, batch accumulation, " +
       "and the injected triple order are all live in the pinned path") {
    val tiny = Seq((0, 0, 1.0), (0, 1, 2.0), (1, 1, 3.0), (1, 2, 1.0),
                   (1, 3, 2.0), (2, 0, 2.0)).toDF("u", "i", "v")
    def init(id: Int, salt: Int): Array[Double] =
      Array.tabulate(2)(f => (1.0 + id + 2 * f + salt) / 7.0)
    val triples = Seq((0, 0, 2), (1, 1, 0), (0, 1, 2), (1, 2, 0))
    def fit(negReg: Double, batch: Int, order: Seq[(Int, Int, Int)]) =
      Models.mfBpr(spark, tiny, rank = 2, epochs = 1,
        samplesPerEpoch = 4, lr = 0.14, reg = 0.05, seed = 0,
        sgdMode = "adagrad", negativeReg = Some(negReg),
        userReg = Some(0.02), batchSize = batch,
        tripleOrder = Some(order), initVec = Some(init))
    val base = fit(0.03, 2, triples)
    // a reg-role swap must move the negative items' factors — the
    // per-role split the q175 VALUES pin
    val swapped = fit(0.05, 2, triples)
    assert(base._2(2).toSeq != swapped._2(2).toSeq,
      "negativeReg is inert in the gate's path")
    // batch grouping changes accumulate-then-apply (pyx:838-899)
    val b1 = fit(0.03, 1, triples)
    assert(base._2(0).toSeq != b1._2(0).toSeq,
      "batchSize is inert in the gate's path")
    // the injected order IS the sample stream
    val rev = fit(0.03, 2, triples.reverse)
    assert(base._1(0).toSeq != rev._1(0).toSeq,
      "tripleOrder is inert in the gate's path")
  }

  test("64-bit id spaces: ials and mfBprDistributed densify beyond " +
       "int range and re-key to the original ids (r12 sf3 finding)") {
    val Off = 3000000000L // > Int.MaxValue
    // contiguous small ids: the raw path's ALS input EQUALS the dense
    // indices of the offset twin (denseIndex ranks ascending), so the
    // two fits see bit-identical matrices and must return identical
    // factor values — the remap provably changes keys, not math
    val small = Seq((0L, 0L, 1.0), (0L, 1L, 2.0), (1L, 1L, 1.0),
                    (1L, 2L, 3.0), (2L, 2L, 2.0), (2L, 0L, 1.0))
      .toDF("u", "i", "v")
    val big = small.select((col("u") + Off).as("u"),
                           (col("i") + Off).as("i"), col("v"))
    val (ufS, itfS) = Models.ials(small, rank = 2, reg = 0.1,
                                  alpha = 1.0, iters = 3, seed = 5)
    val (ufB, itfB) = Models.ials(big, rank = 2, reg = 0.1,
                                  alpha = 1.0, iters = 3, seed = 5)
    def fmap(df: org.apache.spark.sql.DataFrame, off: Long = 0L) =
      df.collect().map(r => (r.getAs[Number]("id").longValue + off) ->
        r.getAs[scala.collection.Seq[Float]]("features").toSeq).toMap
    assert(fmap(ufS, Off) == fmap(ufB))
    assert(fmap(itfS, Off) == fmap(itfB))
    // distributed BPR: same twin discipline on its own path
    val (buS, biS) = Models.mfBprDistributed(spark, small.drop("v"),
      rank = 4, epochs = 1, samplesPerEpoch = 6, lr = 0.05,
      reg = 1e-4, seed = 7)
    val (buB, biB) = Models.mfBprDistributed(spark, big.drop("v"),
      rank = 4, epochs = 1, samplesPerEpoch = 6, lr = 0.05,
      reg = 1e-4, seed = 7)
    def amap(df: org.apache.spark.sql.DataFrame, key: String,
             off: Long = 0L) =
      df.collect().map(r => (r.getAs[Number](key).longValue + off) ->
        r.getAs[scala.collection.Seq[Double]]("factors").toSeq).toMap
    assert(amap(buS, "u", Off) == amap(buB, "u"))
    assert(amap(biS, "i", Off) == amap(biB, "i"))
  }
}
