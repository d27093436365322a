package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: times every registered query at the given
  * scale factor and prints one JSON line. Queries run in declaration
  * order (stable across rounds, so per-query numbers are comparable);
  * each is materialized by count().
  *
  * Measurement convention, kept deliberately for cross-round
  * comparability: count() times the COUNT PLAN, which Catalyst may
  * prune below the full projection — a query whose output is a
  * per-row projection over its input (q180's cleaned text, q51's
  * per-doc features) times near the scan floor here. Operator-level
  * cost with every column materialized is the SOAK's job
  * ([[Soak]] aggregates over output columns; Verify writes full
  * parquet), not this suite's.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // spark.sql.optimizer.canChangeCachedPlanOutputPartitioning is
      // deliberately left at its DEFAULT (false): flipping it true was
      // measured (r14, 3-rep medians) to let AQE coalesce the small
      // cached URM exchange to ~1 partition and every consumer of the
      // cache inherited that starved parallelism — q63 5.9 → 11.5 s,
      // q41 6.3 → 7.6 s — a textbook case of a cache partition-count
      // tuned for bytes, not for the fan-out compute above it.
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tables = core.Tables(spark, sfDir)
    // Untimed warmup: one pair-aggregation over the URM JITs the join/
    // shuffle/codegen hot paths and warms the parquet page cache, so
    // the first timed heavy query measures steady-state execution
    // rather than JVM compilation (standard JVM benchmarking practice;
    // round 1's first similarity query read 3× its steady-state time).
    try {
      graft.similarity.Similarity
        .pairDots(graft.etl.Urm.fromOrders(tables))
        .filter(org.apache.spark.sql.functions.col("dot") >= 3).count()
      // also JIT the exact-decimal aggregation path (p3alpha shape) —
      // rep measurements showed q41's first runs pay ~8s of codegen
      // warm-up that the integer pairDots warm-up doesn't cover, while
      // q42 (same subtree, run later) starts at steady state
      graft.recommend.Recommenders
        .p3alpha(graft.etl.Urm.fromOrders(tables).filter(
          org.apache.spark.sql.functions.col("u") < 500), 1.0).count()
    } catch { case _: Throwable => () }
    // Cache hygiene: operators persist subtrees (MEMORY_AND_DISK) and the
    // bench runs ~80 queries back-to-back — without clearing, executor
    // storage accumulates dozens of stale cached frames and mid-run heavy
    // queries pay eviction/spill (round-2 q41 regressed 2.3× with zero
    // code change). Reset storage to empty before every timed query so
    // each measurement sees the same clean executor state.
    def clearState(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      // settle: wait until executor storage is actually empty so async
      // cleanup I/O doesn't bleed into the next timed query
      var tries = 0
      while (spark.sparkContext.getRDDStorageInfo.nonEmpty && tries < 20) {
        Thread.sleep(100); tries += 1
      }
      System.gc()
    }
    // Heavy shuffle queries run THREE times and report the median.
    // Three effects need separating: the cold-path tax (per-plan
    // codegen + JIT, always in run 1), random multi-second
    // environmental stalls (measured hitting ANY single run — rep
    // campaigns showed ~30s spikes on otherwise-13s queries), and this
    // box's measured 20-25% background-load drift (SURVEY §6). Best-of-N
    // converges to an optimistic floor as N grows; the median of three
    // absorbs one stalled run AND one cold run without flattering the
    // result, so it is the defensible headline. All raw timings are
    // emitted (queries_first/second/third_run) so BENCH_r{N}.json keeps
    // the full evidence, and /proc/loadavg is sampled around each heavy
    // query (load_before/load_after) so a drifted number can be
    // attributed to machine load mechanically, not by prose. Beyond the
    // static set, any query whose first run exceeds `heavyThresholdSec`
    // is re-run adaptively.
    // q55 earned its slot with rep evidence: cold 5.8s / steady 2.9s —
    // a per-plan codegen tax just under the adaptive threshold, so the
    // static set must carry it or the reported number is the cold run.
    val heavy = Set("q33_cosine_topk", "q41_p3alpha", "q55_lsh_jaccard",
                    "q62_euclidean_topk", "q72_negative_sampling",
                    "q74_funk_als", "q78_candidate_restriction")
    val heavyThresholdSec = 7.0
    // Diagnosis knobs (unset in driver runs): SPARK_GRAFT_BENCH_ONLY
    // comma-list filters queries; SPARK_GRAFT_BENCH_REPS repeats every
    // selected query N times reporting each rep under name#rep.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").toSet)
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS").map(_.toInt)
    val selected = SparkEntry.allQueries
      .filter(q => only.forall(_.contains(q.name)))
    val firstRun = scala.collection.mutable.LinkedHashMap[String, Double]()
    val secondRun = scala.collection.mutable.LinkedHashMap[String, Double]()
    val thirdRun = scala.collection.mutable.LinkedHashMap[String, Double]()
    // populated ONLY when the 2×-spread instability rule fires
    val fourthRun = scala.collection.mutable.LinkedHashMap[String, Double]()
    val fifthRun = scala.collection.mutable.LinkedHashMap[String, Double]()
    val medianRun = scala.collection.mutable.LinkedHashMap[String, Double]()
    val loadBefore = scala.collection.mutable.LinkedHashMap[String, Double]()
    val loadAfter = scala.collection.mutable.LinkedHashMap[String, Double]()
    // adaptive path only: the load sample taken after rep 3, BEFORE the
    // two extra reps — kept separately so both rep groups stay
    // load-bracketed in the artifact (loadBefore..loadAfterFirst3 for
    // t1-t3, loadAfterFirst3..loadAfter for t4-t5)
    val loadAfterFirst3 =
      scala.collection.mutable.LinkedHashMap[String, Double]()
    // 1-minute loadavg: the mechanical machine-vs-code discriminator
    def loadavg(): Double = core.BenchUtil.loadavg()
    // Near-idle gate (VERDICT r7 task #6 / r8 "what's wrong" #1): this
    // box drifts ~2× under background load, so a recording started at
    // loadavg 10 measures the machine, not the engine. Wait (bounded —
    // the driver must never hang on a busy box) for 1-min loadavg to
    // fall under 4 before the first timed query; both the initial and
    // the at-start load are reported so a contaminated run is
    // attributable mechanically.
    // Each gate gets its OWN bounded deadline (ADVICE r13: a shared
    // 300s deadline meant a busy start could be fully consumed by the
    // loadavg/ext-busy waits, degenerating the steal gate — the one
    // channel the other two are blind to — into a single hot probe).
    val loadInitial = loadavg()
    def deadlineIn(sec: Long) =
      System.nanoTime() + sec * 1000 * 1000 * 1000
    val loadDeadline = deadlineIn(300)
    while (loadavg() > 4.0 && System.nanoTime() < loadDeadline)
      Thread.sleep(10000)
    // loadavg alone is a proven-weak instrument on this box (it decays
    // from FINISHED JVMs — the r11 soak read 17-33 with nothing
    // running, and conversely can read < 4 while another process burns
    // CPU), so the gate additionally waits — same bounded deadline —
    // for the external-CPU fraction (/proc/stat jiffies minus this
    // JVM's own) to fall under 5%. This is the handshake that keeps
    // driver-harness re-runs from embedding load-contaminated numbers
    // next to the canonical ones (recurring since r9): the driver
    // cannot skip a bench, but the bench can refuse to START until the
    // box is demonstrably quiet (or the deadline passes, in which case
    // ext_busy_start records exactly how dirty the recording is).
    val extGate = sys.env.getOrElse("SPARK_GRAFT_BENCH_EXT_BUSY",
                                    "0.05").toDouble
    val extDeadline = deadlineIn(300)
    var ebProbe = core.BenchUtil.extBusyFrac(1000)
    while (ebProbe >= 0 && ebProbe > extGate &&
           System.nanoTime() < extDeadline) {
      Thread.sleep(5000)
      ebProbe = core.BenchUtil.extBusyFrac(1000)
    }
    // …and the instrument the r12 round proved BOTH in-VM gates are
    // blind to: hypervisor steal (/proc/stat field 9). The host can
    // withhold 30-50% of a core while loadavg AND ext-busy read idle —
    // every contaminated BENCH_r{9-12}.json traced to exactly this —
    // so the gate also waits (same bounded deadline) for steal to fall
    // under 10% of a core, and `steal_dirty` records mechanically
    // whether a recording started hot anyway (the driver cannot skip a
    // bench; the artifact must say what the host was doing).
    val stealGate = sys.env.getOrElse("SPARK_GRAFT_BENCH_STEAL",
                                      "0.10").toDouble
    val stealDeadline = deadlineIn(300)
    var stProbe = core.BenchUtil.stealCoreFrac(2000)
    while (stProbe >= 0 && stProbe > stealGate &&
           System.nanoTime() < stealDeadline) {
      Thread.sleep(5000)
      stProbe = core.BenchUtil.stealCoreFrac(2000)
    }
    val stealStart = stProbe
    val startedHot = stProbe >= 0 && stProbe > stealGate
    val stealJ0 = core.BenchUtil.stealJiffies()
    val wall0 = System.nanoTime()
    val loadStart = loadavg()
    // the soak's round-11 instrument, recorded alongside loadavg: the
    // fraction of box CPU spent by OTHER processes over a 1s window.
    // Unlike loadavg it cannot be poisoned by this JVM's own recent
    // work, so a driver-harness recording on a busy box is mechanically
    // attributable (VERDICT r10 what's-wrong #2 — the driver re-runs
    // the bench regardless of box state; these columns say what state
    // that was)
    val extBusyStart = core.BenchUtil.extBusyFrac(1000)
    // per-query steal attribution at ZERO wall cost: jiffy deltas
    // across each query's own block (all reps + clears), ÷ elapsed —
    // a drifted number is attributable to the host mechanically
    val stealDuring =
      scala.collection.mutable.LinkedHashMap[String, Double]()
    val results = selected.flatMap { q =>
      val qSteal0 = core.BenchUtil.stealJiffies()
      val qWall0 = System.nanoTime()
      def once(): Double = {
        val t0 = System.nanoTime()
        // scoped persists release at query exit (belt and braces with
        // clearState: scoping is the library-grade hygiene, clearState
        // additionally resets whatever escapes, e.g. ml.ALS internals)
        try graft.core.CacheScope.scoped { q.run(tables).count() }
        catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }
      val out = reps match {
        case Some(n) =>
          val runs = (0 until n).map { _ =>
            clearState()
            once()
          }
          // best-of-N converges to an optimistic floor as N grows; the
          // median is the honest steady-state estimator, so rep runs
          // (N ≥ 3) record it alongside the raw timings.
          if (n >= 3) medianRun(q.name) = core.BenchUtil.median(runs)
          runs.zipWithIndex.map { case (t, r) => s"${q.name}#$r" -> t }
        case None =>
          clearState()
          val la0 = loadavg()
          val t1 = once()
          val tq = if (heavy(q.name) || t1 > heavyThresholdSec) {
            firstRun(q.name) = t1
            loadBefore(q.name) = la0
            clearState()
            val t2 = once()
            secondRun(q.name) = t2
            clearState()
            val t3 = once()
            thirdRun(q.name) = t3
            loadAfter(q.name) = loadavg()
            // median of three absorbs ONE stalled rep; the round-11
            // canonical caught q135 with TWO (80.0/35.1/93.2 — median
            // 80 while a 4-rep idle probe medians 25.4). When the rep
            // spread exceeds 2×, the environment is demonstrably
            // unstable for this query — take two more reps and median
            // five, bounding the damage a stalled pair can do
            val first3 = Seq(t1, t2, t3)
            val spreadUnstable =
              first3.min > 0 && first3.max / first3.min > 2.0
            val all = if (spreadUnstable) {
              clearState(); val t4 = once()
              clearState(); val t5 = once()
              fourthRun(q.name) = t4; fifthRun(q.name) = t5
              // the post-t3 sample moves to load_after_first3 (NOT
              // discarded — instability attribution is the whole point
              // of the extra reps) and loadAfter re-samples so the
              // recorded after-load brackets EVERY rep that fed the
              // median
              loadAfterFirst3(q.name) = loadAfter(q.name)
              loadAfter(q.name) = loadavg()
              first3 ++ Seq(t4, t5)
            } else first3
            val med = all.sorted.apply(all.size / 2)
            // queries_median mirrors the medianized value for every
            // re-run query (rep mode OR the heavy/adaptive path) — the
            // field used to fill only in rep mode, so committed
            // artifacts carried an empty map while the medians lived
            // unlabeled in the top-level queries map
            medianRun(q.name) = med
            med
          } else t1
          Seq(q.name -> tq)
      }
      stealDuring(q.name) = core.BenchUtil.stealCoreFracOver(
        qSteal0, core.BenchUtil.stealJiffies(),
        (System.nanoTime() - qWall0) / 1e9)
      out
    }
    def jmap(m: scala.collection.Map[String, Double]): String =
      core.BenchUtil.jmap(m)
    val qs = jmap(scala.collection.mutable.LinkedHashMap(results: _*))
    val total = results.map(_._2).sum
    val loadEnd = loadavg()
    val extBusyEnd = core.BenchUtil.extBusyFrac(1000)
    val stealEnd = core.BenchUtil.stealCoreFrac(2000)
    // whole-run steal attribution: jiffies the host withheld across
    // the ENTIRE timed span ÷ elapsed — the single number that says
    // whether this recording is canonical-grade (≤ ~0.02 idle; the
    // r12 contaminated band read 0.27-0.51)
    val stealRun = core.BenchUtil.stealCoreFracOver(
      stealJ0, core.BenchUtil.stealJiffies(),
      (System.nanoTime() - wall0) / 1e9)
    // dirty = started hot OR the run itself exceeded the gate — the
    // start probe alone missed a mid-run steal storm (measured: a
    // recording with steal_run 1.297 started clean and would have
    // claimed dirty = false)
    val stealDirty = startedHot || (stealRun >= 0 && stealRun > stealGate)
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_first_run":${jmap(firstRun)},"queries_second_run":${jmap(secondRun)},"queries_third_run":${jmap(thirdRun)},"queries_fourth_run":${jmap(fourthRun)},"queries_fifth_run":${jmap(fifthRun)},"queries_median":${jmap(medianRun)},"load_before":${jmap(loadBefore)},"load_after":${jmap(loadAfter)},"load_after_first3":${jmap(loadAfterFirst3)},"queries_steal":${core.BenchUtil.jmapRounded(stealDuring)},"load_initial":$loadInitial,"load_start":$loadStart,"load_end":$loadEnd,"ext_busy_start":$extBusyStart,"ext_busy_end":$extBusyEnd,"steal_start":$stealStart,"steal_end":$stealEnd,"steal_run":$stealRun,"steal_gate":$stealGate,"steal_dirty":$stealDirty,"sf":"$sfDir"}"""
    // ONE canonical artifact per round (VERDICT r7 bookkeeping): the
    // full record — every raw rep, medians, load samples — goes ONLY
    // to bench_out.json; stdout carries exactly one final JSON record
    // (below), so BENCH_r{N}.json never embeds two totals again.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
                                    "bench_out.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes("UTF-8"))
    // The harness keeps only the last ~2000 chars of stdout, and the
    // full per-query map is ~2300 chars — every prior round's tail cut
    // the line mid-map and the structured parse failed. Emit a SINGLE
    // final line that is guaranteed to fit: total + the costliest
    // queries, greedily added (by descending time) under a 1800-char
    // budget, with the full map pointed at via "queries_full".
    val byCost = results.sortBy(-_._2)
    val budget = 1800
    // one value per QUERY: rep-mode queries emit one result entry per
    // rep (q#0, q#1, …), so a median over raw entries would weight the
    // suite median toward rep-mode queries — collapse each query's
    // entries to their median first
    val perQuery = results
      .groupBy { case (k, _) => k.takeWhile(_ != '#') }
      .map { case (_, vs) => core.BenchUtil.median(vs.map(_._2)) }
      .toSeq
    val medianSec =
      if (perQuery.isEmpty) 0.0 else core.BenchUtil.median(perQuery)
    val head = s"""{"metric":"total","value":${math.round(total * 100) / 100.0},"unit":"sec","n_queries":${results.size},"median_sec":${math.round(medianSec * 1000) / 1000.0},"load_initial":$loadInitial,"load_start":$loadStart,"load_end":$loadEnd,"steal_run":${math.round(stealRun * 1000) / 1000.0},"steal_dirty":$stealDirty,"queries_full":"$outFile","sf":"$sfDir","queries":{"""
    val tailStr = "}}"
    val entries = scala.collection.mutable.ArrayBuffer[String]()
    var len = head.length + tailStr.length
    byCost.foreach { case (k, v) =>
      val e = "\"" + k + "\":" + (math.round(v * 1000) / 1000.0)
      if (len + e.length + 1 <= budget) { entries += e; len += e.length + 1 }
    }
    println(head + entries.mkString(",") + tailStr)
    spark.stop()
  }
}
