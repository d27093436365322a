package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.etl.Pipeline

/** Physical-plan audits: the properties that make the queries scale —
  * predicate pushdown into the parquet scan, column pruning, broadcast
  * dimension joins, partition pruning — asserted on the actual executed
  * plans (the ".explain and iterate" loop, pinned as tests).
  */
class PlanSpec extends SparkSpec {
  import spark.implicits._

  private lazy val t = Tables(spark, "/root/testdata/sf0.001")

  test("filter pushes down to the parquet scan; columns prune") {
    val q = t.lineitem.filter(col("l_quantity") >= 25)
      .select("l_orderkey", "l_quantity")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") &&
           plan.contains("GreaterThanOrEqual(l_quantity,25"),
           s"filter must reach the scan:\n$plan")
    assert(plan.contains("ReadSchema") &&
           !plan.contains("l_extendedprice"),
           "projection must prune unread columns")
  }

  test("timestamp range filter reaches the scan (q02 shape)") {
    val q = t.lineitem
      .filter(col("l_shipdate") >= lit("1995-06-01").cast("timestamp"))
      .select("l_orderkey")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") &&
           plan.contains("GreaterThanOrEqual(l_shipdate"),
           s"timestamp filter must reach the scan:\n$plan")
  }

  test("dimension joins broadcast (q06 shape)") {
    val q = t.orders
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name").agg(count(lit(1)))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
           s"nation join must broadcast:\n$plan")
  }

  test("recommendGlobal's plan has no per-user window and no " +
       "sort-merge join (the users×m dense frame is gone)") {
    // the r10 soak measured the old dense formulation's double shuffle
    // turning super-linear at sf1; the position-space plan must keep
    // both offenders out: the only wide exchange is the blocked-
    // position groupBy, and both candidate lookups broadcast an m-row
    // LocalRelation
    val scores = (0 until 50).map(i => (i, (100 - i).toDouble))
      .toDF("item", "score")
    val seen = (for { u <- 0 until 20; i <- 0 until 8 } yield (u, i * 3))
      .toDF("u", "i")
    val q = graft.recommend.Recommenders.recommendGlobal(scores, seen, 5)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
           s"no per-user ranking window may remain:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
           s"no shuffled join may remain:\n$plan")
    assert(plan.contains("BroadcastHashJoin") &&
           plan.contains("LocalTableScan"),
           s"candidate lookups must broadcast the local head:\n$plan")
  }

  test("split-partitioned URM reload prunes partitions") {
    val inter = (for { u <- 0 until 20; i <- 0 until 10 } yield (u, i))
      .toDF("u", "i")
    val dir = Files.createTempDirectory("prune").toString
    Pipeline.save(Pipeline.generateSplits(inter, 42), dir)
    val q = Pipeline.loadSplit(spark, dir, "train")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("split"),
           s"split filter must prune partitions:\n$plan")
  }

  test("salted aggregation and join match their unsalted twins") {
    val skewed = (Seq.fill(500)(1) ++ (2 to 50)).toDF("k")
      .repartition(8)
    val direct = skewed.groupBy("k").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val salted = graft.operators.Skew
      .saltedCount(skewed, col("k"), salts = 8)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(salted == direct)

    val dim = (1 to 50).map(k => (k, s"name$k")).toDF("k", "name")
    val plainJoin = skewed.join(dim, "k").count()
    val saltedJoin = graft.operators.Skew
      .saltedJoin(skewed, dim, "k", salts = 8).count()
    assert(saltedJoin == plainJoin)
  }

  test("similarity engine routes through the salted aggregation on a " +
       "synthetic hot user") {
    import graft.similarity.Similarity
    // one heavy-hitter user (80 items) among light users
    val hot = (0 until 80).map(i => (999, i)) ++
      (for { u <- 0 until 10; i <- 0 until 5 } yield (u, i + u % 3))
    val urm = hot.toDF("u", "i")
    assert(Similarity.hasHeavyUsers(urm, threshold = 50))
    assert(!Similarity.hasHeavyUsers(urm, threshold = 100))
    // salted plan activates: grouping on _salt appears as an extra
    // aggregate level in the optimized plan
    val salted = Similarity.itemSimilarity(urm, Similarity.Cosine,
                                           saltWhenHeavy = 50)
    val plan = salted.queryExecution.optimizedPlan.toString
    assert(plan.contains("_salt"),
           s"salted path must activate on the hot key:\n$plan")
    // and result equals the unsalted engine exactly
    val plain = Similarity.itemSimilarity(urm, Similarity.Cosine)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2)))
      .toMap
    val saltedMap = salted
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2)))
      .toMap
    assert(saltedMap == plain)
  }

  test("gini rank runs on parallel partitions, not one reducer") {
    import org.apache.spark.sql.execution.window.WindowExec
    // two-pass rank: result identical to the single-window formula...
    val counts = (Seq.fill(40)(7) ++ (0 until 100)).zipWithIndex
      .map { case (c, k) => (k, c) }.toDF("k", "c")
    val byWindow = counts.withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("c", "k")))
      .select("k", "r").collect()
      .map(r => (r.getInt(0), r.getInt(1).toLong)).toMap
    val twoPass = graft.core.Ranking
      .withGlobalRank(counts, Seq(col("c"), col("k")), "r")
      .select("k", "r").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(twoPass == byWindow, "two-pass rank must equal the window rank")
    // ...and the gini plan carries NO window operator at all: the rank
    // is a per-partition sequential pass over the range-partitioned
    // data (a Window.partitionBy(pid) would re-shuffle rows the range
    // exchange already co-located). Only the final scalar aggregate
    // may reduce to one partition — it sees #partitions partial rows.
    val gini = graft.stats.Stats.giniOfCounts(
      (0 until 500).map(i => (i % 37, i)).toDF("g", "x"), col("g"))
    gini.collect() // materialize so AQE finalizes the plan
    // full traversal: AQE hides the final plan behind
    // AdaptiveSparkPlanExec (children = Nil) and stage boundaries
    // (QueryStageExec.plan), so plain collect() misses interior nodes
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    def allNodes(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case other => other.children
      }
      p +: kids.flatMap(allNodes)
    }
    val ws = allNodes(gini.queryExecution.executedPlan)
      .collect { case w: WindowExec => w }
    assert(ws.isEmpty,
      s"rank must be windowless (per-partition pass), found:\n${ws.mkString}")
  }

  test("bucketed URM self-join plans with no exchange on the bucketed sides") {
    val urm = (for { u <- 0 until 200; i <- 0 until 12 if (u + i) % 3 != 0 }
      yield (u, i)).toDF("u", "i")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force a real join strategy decision (no broadcast, no AQE
      // post-planning) so the bucket metadata is what removes exchanges
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      Pipeline.saveBucketed(urm, "urm_bucketed_spec", buckets = 4)
      val t = Pipeline.loadBucketed(spark, "urm_bucketed_spec")
      val a = t.select(col("u"), col("i").as("i1"))
      val b = t.select(col("u"), col("i").as("i2"))
      val joined = a.join(b, "u").filter(col("i1") =!= col("i2"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"),
             s"expected a sort-merge join over buckets:\n$plan")
      assert(!plan.contains("Exchange"),
             s"bucketed self-join must not shuffle:\n$plan")
      // the same join WITHOUT bucketing shuffles both sides
      val p = urm.select(col("u"), col("i").as("i1"))
        .join(urm.select(col("u"), col("i").as("i2")), "u")
        .queryExecution.executedPlan.toString
      assert(p.contains("Exchange"), "unbucketed twin should shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS urm_bucketed_spec")
    }
  }

  test("pairDots mirror: result has both orientations; the pair join " +
       "executes once (exchange reuse)") {
    import graft.similarity.Similarity
    val urm = (for { u <- 0 until 60; i <- 0 until 8 if (u + i) % 4 != 0 }
      yield (u, i)).toDF("u", "i")
    val dots = Similarity.pairDots(urm)
    val got = dots.collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    // oracle: the naive both-orientations aggregation
    val a = urm.select(col("u"), col("i").as("i1"))
    val b = urm.select(col("u"), col("i").as("i2"))
    val naive = a.join(b, "u").filter(col("i1") =!= col("i2"))
      .groupBy(col("i1"), col("i2")).agg(count(lit(1)).as("dot"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    assert(got == naive, "mirrored upper triangle must equal the full " +
           "both-orientations aggregation")
    // the expensive half — pair generation + partial agg + shuffle —
    // must run once: the mirror branch reuses the aggregation exchange
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.{
      SortMergeJoinExec, ShuffledHashJoinExec, BroadcastHashJoinExec}
    def allNodes(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case ad: AdaptiveSparkPlanExec => Seq(ad.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case other => other.children
      }
      p +: kids.flatMap(allNodes)
    }
    val nodes = allNodes(dots.queryExecution.executedPlan)
    val joins = nodes.count {
      case _: SortMergeJoinExec | _: ShuffledHashJoinExec |
           _: BroadcastHashJoinExec => true
      case _ => false
    }
    assert(joins == 1,
      s"the self-join must appear once, found $joins:\n" +
      dots.queryExecution.executedPlan)
  }

  test("grouped aggregation is partial before the shuffle (map-side combine)") {
    val q = t.lineitem.groupBy("l_returnflag").agg(sum("l_quantity"))
    val plan = q.queryExecution.executedPlan.toString
    // two HashAggregate stages around the exchange = partial + final
    assert("HashAggregate".r.findAllIn(plan).size >= 2 &&
           plan.contains("Exchange"),
           s"expected partial aggregation around the shuffle:\n$plan")
  }

  test("as-of join is one shuffle: a single exchange feeds the window") {
    val l = t.events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val r = t.events.filter(col("event_type") === "click")
      .select(col("event_id"), col("event_id").as("r_id"),
              col("user_id"), col("ts"), col("value").as("r_v"))
    val q = graft.operators.Relational.asofJoin(
      l, r, key = "user_id", ts = "ts", tie = "event_id",
      payload = Seq("r_id", "r_v"))
    val plan = q.queryExecution.executedPlan.toString
    // both tagged sides union BEFORE the shuffle, so exactly one
    // hash-partitioning exchange (the window's) appears — the claim
    // that as-of costs the same as a grouped cumsum
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected one shuffle, got $exchanges:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
           s"as-of must not plan a join operator:\n$plan")
  }

  test("range join plans an equi-join on the bucket, not a nested loop") {
    val pts = t.orders.select(col("o_orderkey"), col("o_totalprice"))
    val bands = spark.range(0, 40)
      .select(col("id").as("band_id"), (col("id") * 10000.0).as("lo"),
              (col("id") * 10000.0 + 14999.99).as("hi"))
    val q = graft.operators.Relational.rangeJoin(
      pts, bands, v = "o_totalprice", lo = "lo", hi = "hi",
      bucketWidth = 5000.0)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
           !plan.contains("CartesianProduct"),
           s"range join must not plan a theta join:\n$plan")
  }

  test("stratified sample is a pure scan: no exchange, no aggregate") {
    val q = graft.stats.Stats.stratifiedSample(
      t.documents.select("doc_id", "lang"),
      col("doc_id"), col("lang"), Map("en" -> 0.5), defaultRate = 0.25)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("HashAggregate"),
           s"hash-threshold sampling must not shuffle:\n$plan")
  }

  test("unigram LM joins vocabulary counts on the token key, not a " +
       "forced broadcast (vocabulary is unbounded at corpus scale)") {
    val q = graft.text.TextOps.unigramLogProb(
      t.documents, col("doc_id"), col("text"))
    // exactly ONE broadcast hint — the one-row total scalar. The
    // vocabulary-counts join must carry none: AQE may still pick
    // broadcast at runtime for a small vocabulary, which is exactly
    // the desired degradation (hint would force it at any size).
    val analyzed = q.queryExecution.analyzed.toString
    assert("ResolvedHint".r.findAllIn(analyzed).size == 1,
           s"only the total scalar may be broadcast-hinted:\n$analyzed")
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastNestedLoopJoin"),
           s"the total-count scalar should broadcast:\n$physical")
    graft.core.CacheScope.global.release()
  }

  test("HOF dot product rewrites to the native DotProduct expression") {
    graft.plans.GraftExtensions.install(spark)
    // parquet-backed input: a local relation would be constant-folded
    // away before the plan can be inspected
    val vecs = t.embeddings
      .select(col("vec_id").as("id"), col("embedding").as("a"),
              reverse(col("embedding")).as("b"))
    val hof = vecs.select(col("id"), graft.ann.Ann.dotHof(col("a"),
                                                          col("b")).as("d"))
    val optimized = hof.queryExecution.optimizedPlan
    val fired = optimized.expressions.exists(_.exists(
      _.isInstanceOf[graft.functions.DotProduct]))
    assert(fired, s"rule must rewrite the HOF form:\n$optimized")
    // bit-exact vs the native path (same summation order)
    val native = vecs.select(col("id"), graft.ann.Ann.dot(col("a"),
                                                          col("b")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    hof.collect().foreach(r => assert(r.getDouble(1) == native(r.getLong(0))))
    // a near-miss shape (zero = 1.0: a shifted sum, not a dot product)
    // must NOT be rewritten
    val miss = vecs.select(aggregate(
        zip_with(col("a"), col("b"),
                 (x, y) => x.cast("double") * y.cast("double")),
        lit(1.0), (acc, z) => acc + z).as("d"))
    val missFired = miss.queryExecution.optimizedPlan.expressions.exists(
      _.exists(_.isInstanceOf[graft.functions.DotProduct]))
    assert(!missFired, "rewrite must not fire on a non-dot aggregate")
  }

  test("removeRepeatedSpans plans with no cartesian, no window: " +
       "hash aggregates + hash joins only") {
    // the scale contract of the span cutter: window fingerprints flow
    // through key-partitioned aggregates and joins — an accidental
    // cartesian (the all-pairs shape) or a per-doc ranking window
    // would break the measured linear curve (SURVEY 6.y)
    val docs = (0 until 30).map(i =>
      (i.toLong, (0 until 20).map(j => s"t${(i * j) % 7}").mkString(" ")))
      .toDF("doc_id", "text")
    val q = graft.dedup.Dedup.removeRepeatedSpans(
      docs, col("doc_id"), col("text"), spanTokens = 10)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
           s"no all-pairs stage may exist:\n$plan")
    assert(!plan.contains("Window"), s"no ranking window:\n$plan")
    assert(plan.contains("HashAggregate"),
           s"fingerprint dedup must be a hash aggregate:\n$plan")
  }

  test("tokenBudgetPlan's corpus scan aggregates map-side before the " +
       "shuffle; no cartesian beyond broadcast scalars") {
    val docs = (0 until 100).map(i => (s"d${i % 5}", 10 + i % 7))
      .toDF("d", "ntok")
    val q = graft.stats.Stats.tokenBudgetPlan(
      docs, col("d"), col("ntok"), 500.0, 0.5, 2.0)
    val plan = q.queryExecution.executedPlan.toString
    // the only corpus-sized stage is the domain aggregate: partial
    // (map-side combine) before its exchange — anchor the assertion to
    // the domain-keyed aggregate's own line so an unrelated partial
    // elsewhere in the plan cannot satisfy it
    val domAgg = plan.linesIterator
      .filter(l => l.contains("HashAggregate(keys=[d") &&
                   l.contains("partial_sum"))
    assert(domAgg.nonEmpty,
           s"domain aggregate must be hash-keyed with a map-side " +
           s"partial_sum:\n$plan")
    // scalar joins (W, lambda*, total alloc) broadcast one-row sides;
    // BroadcastNestedLoopJoin on a one-row side is the intended shape,
    // CartesianProduct is not
    assert(!plan.contains("CartesianProduct"),
           s"scalar joins must broadcast:\n$plan")
  }

  test("cleanLinesC4 is a pure scan: no exchange, no generate") {
    // the line rules live inside a higher-order filter over the split
    // array — an explode (Generate) or any shuffle would break the
    // scan-speed contract
    val q = graft.text.TextOps.cleanLinesC4(
      t.documents, col("doc_id"), col("text"))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Generate"),
           s"line cleaning must not shuffle or explode:\n$plan")
  }

  test("paragraphDedup: no cartesian, no window, no broadcast hint — " +
       "the paragraph-type frame joins on its key") {
    val q = graft.dedup.Dedup.paragraphDedup(
      t.documents, col("doc_id"), col("text"), sep = " ")
    // zero hints: the first-occurrence frame is corpus-sized for web
    // boilerplate, so it must reach the join unhinted (AQE may still
    // broadcast a small one at runtime — the desired degradation)
    assert(!q.queryExecution.analyzed.toString.contains("ResolvedHint"),
           "no frame may be broadcast-hinted")
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("Window"),
           s"key-partitioned aggregates/joins only:\n$plan")
    assert(plan.contains("HashAggregate"),
           s"first-occurrence pick must be a hash aggregate:\n$plan")
  }

  test("knPerplexityFilter broadcasts only the type-total scalar; " +
       "count towers join on their natural keys") {
    val q = graft.text.TextOps.knPerplexityFilter(
      t.documents.filter(col("doc_id") % 2 === 0), col("doc_id"),
      col("text"), t.documents, col("doc_id"), col("text"))
    val analyzed = q.queryExecution.analyzed.toString
    assert("ResolvedHint".r.findAllIn(analyzed).size == 1,
           s"only the b_types scalar may be broadcast-hinted:\n$analyzed")
    assert(!q.queryExecution.executedPlan.toString
             .contains("CartesianProduct"))
    graft.core.CacheScope.global.release()
  }

  test("setSimJoin: token-keyed candidate join, no cartesian, no " +
       "broadcast hint") {
    val dt = graft.dedup.Dedup.docTokens(
      t.documents, col("doc_id"), col("text"))
    val q = graft.dedup.Dedup.setSimJoin(dt, 0.8)
    assert(!q.queryExecution.analyzed.toString.contains("ResolvedHint"),
           "no frame may be broadcast-hinted")
    assert(!q.queryExecution.executedPlan.toString
             .contains("CartesianProduct"),
           "the candidate join must be token-keyed, not all-pairs")
    graft.core.CacheScope.global.release()
  }

  test("quality classifier: weight frame joins on the bucket key " +
       "unhinted; only the scoring bias row broadcasts") {
    val lbl = (col("lang") === "en").cast("long")
    val model = graft.text.TextOps.fitQualityClassifier(
      t.documents, col("doc_id"), col("text"), lbl,
      nBuckets = 64, epochs = 1)
    // fit side: the weight frame is a tuning-knob-sized axis (millions
    // of buckets at web scale) — it must reach its joins unhinted
    assert(!model.queryExecution.analyzed.toString
             .contains("ResolvedHint"),
           "no fit-side frame may be broadcast-hinted")
    val scored = graft.text.TextOps.scoreQualityClassifier(
      t.documents, col("doc_id"), col("text"), model, nBuckets = 64)
    val analyzed = scored.queryExecution.analyzed.toString
    assert("ResolvedHint".r.findAllIn(analyzed).size == 1,
           s"only the one-row bias may be broadcast-hinted:\n$analyzed")
    assert(!scored.queryExecution.executedPlan.toString
             .contains("CartesianProduct"))
    graft.core.CacheScope.global.release()
  }

  test("degree-capped similarity: the cap's rank filter gets the " +
       "WindowGroupLimit map-side prune; no cartesian") {
    val urm = graft.etl.Urm.fromOrders(t).select("u", "i")
    val sim = graft.similarity.Similarity.itemSimilarity(
      urm, graft.similarity.Similarity.Cosine, maxUserDegree = 25)
    val plan = sim.queryExecution.executedPlan.toString
    // Spark 4 rewrites rank <= k over a window into WindowGroupLimit,
    // pruning each user's over-cap rows BEFORE the exchange — the cap
    // must stay in that shape (a plain post-window filter would ship
    // every heavy profile's full n rows through the shuffle first,
    // defeating the cap's purpose at exactly the profiles it exists
    // to bound)
    assert(plan.contains("WindowGroupLimit"),
           s"the cap must plan as a group limit:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    graft.core.CacheScope.global.release()
  }

  test("degree-capped WEIGHTED similarity: same WindowGroupLimit " +
       "map-side prune, no cartesian") {
    val urm = graft.etl.Urm.fromOrders(t).select("u", "i")
    val wts = graft.similarity.Weighting.tfidf(urm.withColumn("v", lit(1)))
    val sim = graft.similarity.Similarity.itemSimilarityWeighted(
      wts, graft.similarity.Similarity.Cosine, maxUserDegree = 25)
    val plan = sim.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
           s"the weighted cap must plan as a group limit:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    graft.core.CacheScope.global.release()
  }

  test("mmrDiversify: lineage cut to an RDD leaf; no cartesian") {
    val cand = (0 until 12).map(i =>
      (i % 3L, i.toLong, 0.5 + (i % 7) * 0.05,
       Array((i % 5).toFloat, 1.0f)))
      .toDF("qid", "doc_id", "rel", "emb")
    val q = graft.ann.Ann.mmrDiversify(cand, lambda = 0.5, k = 3)
    val plan = q.queryExecution.executedPlan.toString
    // each greedy round rebases `selected` on a LogicalRDD leaf — the
    // final frame must be an RDD scan, not a k-round logical tree
    // (3 references per round would grow analysis ~3^k otherwise)
    assert(plan.contains("Scan ExistingRDD"),
           s"selected must be lineage-cut per round:\n$plan")
    graft.core.CacheScope.global.release()
  }
}
