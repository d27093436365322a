package graft

import org.apache.spark.sql.functions._
import scala.util.Random

import graft.operators.JoinPrune
import graft.stats.Sketches

/** Round-6 scale operators: Bloom-pruned semi-join, sketch-guided exact
  * heavy hitters, KLL quantiles — differential against naive
  * implementations on seeded skewed inputs.
  */
class SketchJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bloomSemiJoin is exactly the plain semi-join (long keys)") {
    val rnd = new Random(11)
    val probe = (0 until 5000).map(_ => rnd.nextInt(2000).toLong)
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }
      .toDF("row_id", "pk")
    // small build side: ~5% of the key space
    val build = (0 until 120).map(_ => rnd.nextInt(2000).toLong)
      .toDF("bk")
    val got = JoinPrune.bloomSemiJoin(probe, build, "pk", "bk",
                                      expectedItems = 1000)
      .select("row_id").as[Long].collect().sorted
    val want = JoinPrune.plainSemiJoin(probe, build, "pk", "bk")
      .select("row_id").as[Long].collect().sorted
    assert(got.nonEmpty && got.sameElements(want))
  }

  test("bloomSemiJoin is exactly the plain semi-join (string keys)") {
    val rnd = new Random(12)
    val probe = (0 until 3000)
      .map(i => (i.toLong, s"key_${rnd.nextInt(800)}"))
      .toDF("row_id", "pk")
    val build = (0 until 60).map(_ => s"key_${rnd.nextInt(800)}")
      .toDF("bk")
    val got = JoinPrune.bloomSemiJoin(probe, build, "pk", "bk",
                                      expectedItems = 1000)
      .select("row_id").as[Long].collect().sorted
    val want = JoinPrune.plainSemiJoin(probe, build, "pk", "bk")
      .select("row_id").as[Long].collect().sorted
    assert(got.nonEmpty && got.sameElements(want))
  }

  test("heavyHitters equals the naive groupBy+HAVING on a Zipf stream") {
    val rnd = new Random(13)
    // Zipf-ish: key k drawn with probability ~ 1/(k+1)
    val keys = (0 until 40000).map { _ =>
      val u = rnd.nextDouble()
      s"k${math.floor(math.pow(5000.0, u)).toLong}"
    }
    val df = keys.toDF("k")
    val share = 0.002
    // deliberately small sketch: forces candidate false positives,
    // which the exact confirm pass must then remove
    val got = Sketches.heavyHitters(df, col("k"), share, maxMapSize = 1024)
      .as[(String, Long)].collect().toMap
    val threshold = math.ceil(share * keys.size).toLong
    val want = keys.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= threshold).toMap
    assert(got.nonEmpty && got == want)
  }

  test("heavyHitters rejects a sketch too small for the share") {
    intercept[IllegalArgumentException] {
      Sketches.heavyHitters(Seq("a").toDF("k"), col("k"),
                            minShare = 0.0001, maxMapSize = 1024)
    }
  }

  test("kllQuantiles tracks exact quantiles within rank-error bounds") {
    val rnd = new Random(14)
    // lognormal-ish skew across 3 groups of very different sizes
    val rows = (0 until 30000).map { i =>
      val g = if (i % 100 == 0) "small" else if (i % 3 == 0) "mid" else "big"
      (g, math.exp(rnd.nextGaussian() * 1.5))
    }
    val df = rows.toDF("g", "v")
    val qs = Seq(0.25, 0.5, 0.75)
    val got = Sketches.kllQuantiles(df, col("g"), col("v"), qs)
      .collect()
      .map(r => (Option(r.getString(0)).getOrElse("__total__"),
                 (r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    // exact yardstick: value at the quantile rank, per group and global
    def exact(vs: Seq[Double], q: Double): Double = {
      val s = vs.sorted
      s(math.min(s.size - 1, (q * s.size).toInt))
    }
    val groups = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap +
      ("__total__" -> rows.map(_._2))
    // KLL k=200 rank error ~1.65%; allow 3% rank drift converted to
    // value space by comparing against the exact values at q +- 0.03
    for ((g, vs) <- groups; (q, i) <- qs.zipWithIndex) {
      val est = i match {
        case 0 => got(g)._1
        case 1 => got(g)._2
        case 2 => got(g)._3
      }
      val lo = exact(vs, math.max(0.0, q - 0.03))
      val hi = exact(vs, math.min(1.0, q + 0.03))
      assert(est >= lo && est <= hi,
        s"group $g q$q: est $est outside [$lo, $hi]")
    }
    // the global row must come from the merge, flagged is_total
    assert(got.contains("__total__"))
  }

  test("kllQuantiles is EXACT (order statistics) while n <= k, " +
       "including the merged global row") {
    // the q147 gate's premise: a k=200 KLL sketch retains every item
    // until the 201st update, and merging exact sketches whose
    // combined weight stays <= k performs no compaction — so
    // quantile(q, INCLUSIVE) over n items is the value at sorted
    // position ceil(q*n), bit-exactly. 3 groups x 60 values (global
    // 180 <= 200) mirrors the gate's subset shape.
    val rnd = new Random(16)
    val rows = for (g <- Seq("a", "b", "c"); _ <- 0 until 60)
      yield (g, (rnd.nextInt(100000) / 4.0))
    val qs = Seq(0.25, 0.5, 0.75)
    val got = Sketches.kllQuantiles(rows.toDF("g", "v"),
                                    col("g"), col("v"), qs)
      .collect()
      .map(r => (Option(r.getString(0)).getOrElse("__total__"),
                 Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    def orderStat(vs: Seq[Double], q: Double): Double = {
      val s = vs.sorted
      s(math.max(0, math.ceil(q * s.size).toInt - 1))
    }
    val groups = rows.groupBy(_._1).view
      .mapValues(_.map(_._2).toSeq).toMap +
      ("__total__" -> rows.map(_._2))
    for ((g, vs) <- groups; (q, i) <- qs.zipWithIndex)
      assert(got(g)(i) == orderStat(vs, q),
        s"group $g q$q: ${got(g)(i)} != exact ${orderStat(vs, q)}")
  }

  test("random projection roughly preserves pairwise distances (JL)") {
    val rnd = new Random(15)
    val vecs = (0L until 30L)
      .map(i => (i, Array.fill(64)(rnd.nextGaussian().toFloat)))
    val proj = graft.ann.Ann.randomProjection(
        vecs.toDF("id", "embedding"), col("id"), col("embedding"),
        outDim = 16)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(1)).map(_.getDouble(2))).toMap
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val pairs = for (i <- 0 until 30; j <- i + 1 until 30) yield (i, j)
    val ratios = pairs.map { case (i, j) =>
      val orig = d2(vecs(i)._2.map(_.toDouble).toSeq,
                    vecs(j)._2.map(_.toDouble).toSeq)
      d2(proj(i.toLong).toSeq, proj(j.toLong).toSeq) / orig
    }
    // ±1 JL matrix at outDim 16: distance ratios concentrate around 1
    assert(ratios.sum / ratios.size > 0.7 &&
           ratios.sum / ratios.size < 1.3)
    assert(ratios.forall(r => r > 0.15 && r < 3.0))
  }

  test("zValue interleaves bits and orders locality for both keys") {
    val got = Seq((3L, 0L), (0L, 3L), (5L, 3L), (0L, 0L),
                  ((1L << 19) + 1L, 1L << 19))
      .toDF("x", "y")
      .select(graft.stats.Sketches.zValue(col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    // x bits land on even positions, y bits on odd
    assert(got(0) == 5L)   // x=11b  -> 0101b
    assert(got(1) == 10L)  // y=11b  -> 1010b
    assert(got(2) == 27L)  // x=101b, y=011b -> 11011b
    assert(got(3) == 0L)
    assert(got(4) == (1L << 38) + (1L << 39) + 1L) // top bits interleave
    // the data-skipping property is quadrant containment: on the
    // complete 32x32 grid, z is a bijection onto 0..1023 and every
    // z-PREFIX range maps to one aligned square — a z-sorted file's
    // row group [0, 4^k) holds exactly the 2^k x 2^k corner, so a
    // predicate on either coordinate prunes whole groups
    val grid = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y))
      .toDF("x", "y")
    val zsorted = grid
      .select(col("x"), col("y"),
              graft.stats.Sketches.zValue(col("x"), col("y"), 5).as("z"))
      .orderBy("z").collect()
    assert(zsorted.map(_.getLong(2)).toSeq == (0L until 1024L))
    for (k <- Seq(1, 2, 3, 4)) {
      val quad = zsorted.take(1 << (2 * k))
      assert(quad.forall(r => r.getLong(0) < (1 << k) &&
                              r.getLong(1) < (1 << k)),
             s"z < 4^$k must be exactly the ${1 << k}-square")
    }
  }

  test("bloomSemiJoin tolerates null probe keys (dropped, like the join)") {
    val probe = Seq((1L, java.lang.Long.valueOf(5L)),
                    (2L, null.asInstanceOf[java.lang.Long]),
                    (3L, java.lang.Long.valueOf(99L)))
      .toDF("row_id", "pk")
    val build = Seq(5L, 7L).toDF("bk")
    val got = JoinPrune.bloomSemiJoin(probe, build, "pk", "bk",
                                      expectedItems = 100)
      .select("row_id").as[Long].collect().toSet
    assert(got == Set(1L)) // null never matches a semi-join key
  }

  test("bloomSemiJoin probe stays in codegen: no UDF node, no Python") {
    // a Range probe, not a local relation — ConvertToLocalRelation
    // would evaluate (and erase) the probe filter at optimization time
    val probe = spark.range(500)
      .select(col("id").as("row_id"), (col("id") % 50).as("pk"))
    val build = Seq(3L, 17L, 42L).toDF("bk")
    val plan = JoinPrune.bloomSemiJoin(probe, build, "pk", "bk",
                                       expectedItems = 100)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
           s"probe filter left codegen:\n$plan")
    assert(plan.contains("might_contain"),
           s"native bloom probe missing from the plan:\n$plan")
  }

  test("bloomSemiJoin auto-sizes from build.count when expectedItems=0") {
    val rnd = new Random(13)
    val probe = (0 until 2000).map(_ => rnd.nextInt(500).toLong)
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }
      .toDF("row_id", "pk")
    val build = (0 until 40).map(_ => rnd.nextInt(500).toLong).toDF("bk")
    val got = JoinPrune.bloomSemiJoin(probe, build, "pk", "bk",
                                      expectedItems = 0)
      .select("row_id").as[Long].collect().sorted
    val want = JoinPrune.plainSemiJoin(probe, build, "pk", "bk")
      .select("row_id").as[Long].collect().sorted
    assert(got.nonEmpty && got.sameElements(want))
  }

  test("bloomSemiJoin matches the plain join across mixed key widths") {
    // xxhash64 is physical-type-sensitive: an un-normalized INT probe
    // against a BIGINT build would hash the same values differently
    // and produce false NEGATIVES. The normalization must repair this.
    val probe = (0 until 500).map(i => (i, i % 40)).toDF("row_id", "pk")
    val build = Seq(3L, 17L, 25L).toDF("bk") // BIGINT vs probe's INT
    val got = JoinPrune.bloomSemiJoin(probe, build, "pk", "bk",
                                      expectedItems = 100)
      .select("row_id").as[Int].collect().sorted
    val want = JoinPrune.plainSemiJoin(probe, build, "pk", "bk")
      .select("row_id").as[Int].collect().sorted
    assert(got.nonEmpty && got.sameElements(want))
  }

  test("bloomSemiJoin lifts the runtime bloom clamp and restores it") {
    val itemsConf = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsConf = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val before = (spark.conf.getOption(itemsConf),
                  spark.conf.getOption(bitsConf))
    // request a filter LARGER than the 67,108,864-bit default clamp
    // and observe the ACTUAL un-clamped size: 100M bits ≈ 12.5 MB of
    // bitset — a clamped build would serialize ≤ ~8.4 MB. This is the
    // regression the conf lift exists to prevent; asserting only the
    // restore would let a silent clamp reappear undetected.
    val requestedBits = 100000000L
    val bytes = JoinPrune.buildFilter(
      Seq(5L, 6L, 7L).toDF("bk"), xxhash64(col("bk")),
      items = 8000000L, numBits = requestedBits)
    assert(bytes.length.toLong * 8 >= requestedBits,
           s"filter clamped: ${bytes.length} bytes for $requestedBits bits")
    assert((spark.conf.getOption(itemsConf),
            spark.conf.getOption(bitsConf)) == before,
           "confs must be restored after the build")
  }

  test("bloomSemiJoin type matrix: fractional keys keep selectivity, " +
       "same-type dates prune, string-vs-numeric falls back exactly") {
    // double keys in [0,1): a bigint normalization would collapse all
    // onto hash(0L) and pass EVERY probe row; hashing the double must
    // keep real selectivity (only matches + rare fps pass the filter)
    val rnd = new Random(17)
    val dprobe = (0 until 2000)
      .map(i => (i.toLong, rnd.nextInt(500) / 500.0))
      .toDF("row_id", "pk")
    val dbuild = Seq(3 / 500.0, 77 / 500.0).toDF("bk")
    val dgot = JoinPrune.bloomSemiJoin(dprobe, dbuild, "pk", "bk",
                                       expectedItems = 100)
    val dwant = JoinPrune.plainSemiJoin(dprobe, dbuild, "pk", "bk")
    assert(dgot.select("row_id").as[Long].collect().sorted
      .sameElements(dwant.select("row_id").as[Long].collect().sorted))
    // the probe filter must actually prune: count survivors of the
    // bloom stage alone via the filter bytes path (indirect check —
    // the final join equals the want set, which is ~0.4% of probe)
    assert(dwant.count() < 20)
    // DATE keys (same type on both sides): hash natively, no cast
    // crash, exact result
    val d0 = java.sql.Date.valueOf("2024-01-01")
    val d1 = java.sql.Date.valueOf("2024-03-05")
    val d2 = java.sql.Date.valueOf("2024-07-19")
    val dateProbe = Seq((1L, d0), (2L, d1), (3L, d2)).toDF("row_id", "pk")
    val dateBuild = Seq(d1).toDF("bk")
    assert(JoinPrune.bloomSemiJoin(dateProbe, dateBuild, "pk", "bk",
                                   expectedItems = 10)
      .select("row_id").as[Long].collect().toSeq == Seq(2L))
    // string probe vs numeric build: no safe common hash — must fall
    // back to the exact un-pruned join (Spark coerces "03" == 3.0),
    // never silently drop
    val sprobe = Seq((1L, "3"), (2L, "03"), (3L, "9")).toDF("row_id", "pk")
    val sbuild = Seq(3.0).toDF("bk")
    val sgot = JoinPrune.bloomSemiJoin(sprobe, sbuild, "pk", "bk",
                                       expectedItems = 10)
      .select("row_id").as[Long].collect().sorted
    val swant = JoinPrune.plainSemiJoin(sprobe, sbuild, "pk", "bk")
      .select("row_id").as[Long].collect().sorted
    assert(sgot.sameElements(swant))
  }

  test("bloomSemiJoin signed zero: -0.0 probe keys match 0.0 build " +
       "keys exactly like the join (r7 ADVICE false-negative)") {
    // join equality normalizes -0.0 == 0.0 (NormalizeFloatingNumbers);
    // the hash must agree or the bloom stage drops a true match. Cover
    // both directions and both float widths (same-type double,
    // same-type float, float-vs-double mix).
    val dprobe = Seq((1L, -0.0), (2L, 0.0), (3L, 1.5), (4L, -1.5))
      .toDF("row_id", "pk")
    val dbuild = Seq(0.0, 1.5).toDF("bk")
    assert(JoinPrune.bloomSemiJoin(dprobe, dbuild, "pk", "bk",
                                   expectedItems = 10)
      .select("row_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    val dbuildNeg = Seq(-0.0).toDF("bk")
    assert(JoinPrune.bloomSemiJoin(dprobe, dbuildNeg, "pk", "bk",
                                   expectedItems = 10)
      .select("row_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    val fprobe = Seq((1L, -0.0f), (2L, 0.0f), (3L, 2.5f))
      .toDF("row_id", "pk")
    val fbuild = Seq(0.0f).toDF("bk")
    assert(JoinPrune.bloomSemiJoin(fprobe, fbuild, "pk", "bk",
                                   expectedItems = 10)
      .select("row_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    val mixBuild = Seq(0.0).toDF("bk")
    assert(JoinPrune.bloomSemiJoin(fprobe, mixBuild, "pk", "bk",
                                   expectedItems = 10)
      .select("row_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("bloom expression pair is callable from plain SQL") {
    // one bloomSemiJoin call registers the pair with the session (the
    // same functions GraftExtensions injects for config-based setups);
    // after that the build-once-probe-everywhere pattern is plain SQL,
    // with the filter fed through a scalar subquery — the shape
    // BloomFilterMightContain accepts besides a foldable literal
    JoinPrune.bloomSemiJoin(
      Seq((1L, 2L)).toDF("row_id", "pk"),
      Seq(2L).toDF("bk"), "pk", "bk", expectedItems = 10)
      .count()
    spark.range(100).select((col("id") % 10).as("k"))
      .createOrReplaceTempView("bloom_probe_t")
    spark.sql("""SELECT graft_bloom_filter_agg(xxhash64(k),
                          CAST(10 AS BIGINT), CAST(800 AS BIGINT)) AS bf
                 FROM bloom_probe_t WHERE k < 3""")
      .createOrReplaceTempView("bloom_build_t")
    val survivors = spark.sql(
      """SELECT k FROM bloom_probe_t
         WHERE graft_might_contain((SELECT bf FROM bloom_build_t),
                                   xxhash64(k))""")
      .collect().map(_.getLong(0)).toSet
    // no false negatives: every true member survives; at 800 bits for
    // 3 keys false positives are unlikely but allowed, so assert
    // containment from below plus the exact-member presence
    assert(Set(0L, 1L, 2L).subsetOf(survivors))
  }

  test("bloomSemiJoin on an empty build side yields the empty join") {
    val probe = Seq((1L, 5L), (2L, 6L)).toDF("row_id", "pk")
    val build = Seq.empty[Long].toDF("bk")
    assert(JoinPrune.bloomSemiJoin(probe, build, "pk", "bk",
                                   expectedItems = 0).count() == 0)
  }

  test("repeatedSpans matches a brute-force window count on random text") {
    val rnd = new Random(31)
    val vocab = Array("a", "b", "c", "d")
    val docs = (0L until 25L).map { i =>
      (i, Array.fill(8 + rnd.nextInt(12))(vocab(rnd.nextInt(4)))
            .mkString(" "))
    }
    val got = graft.dedup.Dedup.repeatedSpans(
        docs.toDF("doc_id", "text"), col("doc_id"), col("text"),
        spanTokens = 4)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // brute force: every 4-token window of every doc
    val windows = docs.flatMap { case (id, text) =>
      val t = text.split("\\s+")
      t.sliding(4).filter(_.length == 4).map(w => (id, w.mkString(" ")))
    }
    val byDocs = windows.groupBy(_._2).view
      .mapValues(ws => (ws.map(_._1).distinct.size.toLong, ws.size.toLong))
      .filter(_._2._1 > 1).toMap
    import java.security.MessageDigest
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val want = byDocs.map { case (w, v) => md5hex(w) -> v }
    assert(got == want && got.nonEmpty)
  }

  test("repeatedSpans finds an embedded 10-gram, ignores short docs") {
    val shared = (1 to 10).map(i => s"x$i").mkString(" ")
    val docs = Seq(
      (0L, s"a1 a2 a3 $shared b1 b2"),        // span embedded mid-doc
      (1L, s"$shared c1 c2 c3 c4 c5"),        // span at the start
      (2L, "unrelated tokens that never repeat across documents here"),
      (3L, "too short")                        // < 10 tokens: no windows
    ).toDF("doc_id", "text")
    val spans = graft.dedup.Dedup.repeatedSpans(
        docs, col("doc_id"), col("text"), spanTokens = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // exactly one cross-document span: the planted x1..x10 window
    assert(spans.length == 1)
    assert(spans.head._2 == 2 && spans.head._3 == 2)
  }

  test("fixed-point PageRank concentrates rank on the hub") {
    // star: every leaf links to the hub and back (so no dangling mass)
    val edges = ((1L to 8L).map(l => (l, 0L)) ++
                 (1L to 8L).map(l => (0L, l))).toDF("src", "dst")
    val ranks = graft.graph.PageRank.fixedPoint(edges, iters = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hub = ranks(0L)
    val leaves = (1L to 8L).map(ranks)
    // symmetry: all leaves identical; hub dominates any leaf
    assert(leaves.distinct.size == 1)
    assert(hub > leaves.head * 4)
    // fixed-point floors only LEAK mass: total stays within 1e-6 of 1
    val total = ranks.values.sum
    assert(total <= graft.graph.PageRank.Unit12 &&
           total > graft.graph.PageRank.Unit12 - 1000000L)
  }

  test("redistributing PageRank conserves dangling mass; equals the " +
       "drop variant on dangling-free graphs") {
    // chain with a sink: 0 -> 1 -> 2 -> 3, node 3 dangling
    val chain = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val drop = graft.graph.PageRank.fixedPoint(chain, iters = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val redist = graft.graph.PageRank
      .fixedPointRedistribute(chain, iters = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the drop variant bleeds the sink's mass out of the system every
    // round; redistribution keeps the total within the floor leak of 1
    assert(drop.values.sum < graft.graph.PageRank.Unit12 * 60L / 100L)
    assert(redist.values.sum > graft.graph.PageRank.Unit12 - 1000000L &&
           redist.values.sum <= graft.graph.PageRank.Unit12)
    // downstream nodes still accumulate more rank than the source
    assert(redist(3L) > redist(0L))
    // a dangling-free graph: both variants bit-identical (D = 0)
    val star = ((1L to 6L).map(l => (l, 0L)) ++
                (1L to 6L).map(l => (0L, l))).toDF("src", "dst")
    val a = graft.graph.PageRank.fixedPoint(star, iters = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = graft.graph.PageRank.fixedPointRedistribute(star, iters = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.sameElements(b))
  }

  test("tfidf keywords rank rare terms above ubiquitous ones") {
    val docs = Seq(
      (0L, "shared shared shared unicorn"),
      (1L, "shared shared common words"),
      (2L, "shared common words too")).toDF("doc_id", "text")
    val kw = graft.text.TextOps.tfidfKeywords(docs, col("doc_id"),
                                              col("text"), k = 2)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(3)).map(_.getString(1)).toSeq)
      .toMap
    // "unicorn" (df=1) must outrank "shared" (df=3, idf=0) in doc 0
    assert(kw(0L).head == "unicorn")
    // "shared" scores 0 everywhere (ln(3/3)=0): never the top keyword
    assert(!kw.values.exists(_.head == "shared"))
  }

  test("KLL sketch frames survive a parquet round-trip and merge losslessly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("kllinc").toString
    // two increments partitioning 40 values per group (exact regime)
    val all = (for { g <- Seq("a", "b"); i <- 1 to 40 }
               yield (g, i, i.toDouble * (if (g == "a") 1 else 10)))
      .toDF("g0", "i", "v")
    val incA = Sketches.kllSketchFrame(all.filter($"i" % 2 === 0),
                                       col("g0"), col("v"))
    val incB = Sketches.kllSketchFrame(all.filter($"i" % 2 === 1),
                                       col("g0"), col("v"))
    // persist increment A, reload it — the binary column must survive
    incA.write.parquet(s"$dir/incA")
    val reloaded = spark.read.parquet(s"$dir/incA")
    val merged = Sketches.kllMergeQuantiles(
      reloaded.unionByName(incB), Seq(0.5))
      .collect().map(r => (Option(r.getString(0)), r.getDouble(2))).toMap
    // inclusive median of 1..40 = value at sorted position 20
    assert(merged(Some("a")) == 20.0)
    assert(merged(Some("b")) == 200.0)
    // global row: position ceil(0.5*80)=40 of the union of both groups
    val union = ((1 to 40).map(_.toDouble) ++
                 (1 to 40).map(_ * 10.0)).sorted
    assert(merged(None) == union(39))
  }

  test("theta overlap stays within published error above k") {
    import spark.implicits._
    // both sides far above k = 4096 -> estimating regime; truth:
    // |A| = 20000, |B| = 20000, |A n B| = 10000, |A u B| = 30000
    val a = (0 until 20000).toDF("id")
    val b = (10000 until 30000).toDF("id")
    val r = graft.stats.Sketches.thetaOverlap(a, b, col("id"), col("id"))
      .collect()(0)
    def within(est: Double, truth: Double, tol: Double) =
      math.abs(est - truth) <= tol * truth
    assert(within(r.getDouble(0), 20000, 0.05), s"n_a ${r.getDouble(0)}")
    assert(within(r.getDouble(1), 20000, 0.05), s"n_b ${r.getDouble(1)}")
    assert(within(r.getDouble(2), 10000, 0.10),
      s"n_intersection ${r.getDouble(2)}")
    assert(within(r.getDouble(3), 30000, 0.05),
      s"n_union ${r.getDouble(3)}")
    assert(within(r.getDouble(4), 10000, 0.10),
      s"n_a_not_b ${r.getDouble(4)}")
    assert(within(r.getDouble(5), 1.0 / 3, 0.10),
      s"jaccard ${r.getDouble(5)}")
  }
}
