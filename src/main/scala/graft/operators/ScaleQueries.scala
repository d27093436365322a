package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.stats.Sketches
import graft.text.TextOps

/** Oracle-checked queries for the round-6 scale operators: Bloom-pruned
  * semi-join, sketch-guided exact heavy hitters, mergeable KLL
  * quantiles.
  */
object ScaleQueries {

  def queries: Seq[Q] = Seq(

    // Bloom-pruned semi-join: lineitem rows belonging to URGENT orders.
    // The Bloom prefilter runs at the probe scan, so only ~20% of
    // lineitem (+1% false positives) reaches the exchange; the exact
    // confirm join makes the result identical to the plain semi-join
    // the oracle runs. At 100 TB the probe side is the corpus and this
    // is the difference between shuffling 100 TB and shuffling the
    // selectivity's worth.
    Q("q119_bloom_semijoin", { t =>
        val urgent = t.orders
          .filter(col("o_orderpriority") === "1-URGENT")
        JoinPrune.bloomSemiJoin(
            t.lineitem, urgent, "l_orderkey", "o_orderkey",
            expectedItems = 1 << 20, fpp = 0.01)
          .select("l_orderkey", "l_linenumber", "l_quantity")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem
        |WHERE l_orderkey IN (
        |  SELECT o_orderkey FROM orders
        |  WHERE o_orderpriority = '1-URGENT')""".stripMargin)),

    // SQL-surface gate for the injected bloom pair (VERDICT r7 polish
    // #7): the same graft_bloom_filter_agg / graft_might_contain
    // builders the bloomSemiJoin operator uses (BloomFunctions is the
    // single home), driven end-to-end FROM SQL TEXT — build the filter
    // over BUILDING customers in a one-row CTE, probe the orders scan
    // with might_contain (stays in whole-stage codegen; the CTE join
    // is a broadcast scalar), and confirm with an exact IN-subquery
    // semi-join so bloom false positives vanish. The oracle is the
    // plain DuckDB semi-join — identical rows required. Pins that a
    // pure-SQL session user gets the operator without the Scala API.
    // Int keys only in the projection: no cross-engine float compare.
    Q("q143_bloom_semijoin_sql", { t =>
        graft.functions.BloomFunctions.register(t.spark)
        t.orders.createOrReplaceTempView("graft_q143_orders")
        t.customer.createOrReplaceTempView("graft_q143_customer")
        t.spark.sql("""
          WITH bf AS (
            SELECT graft_bloom_filter_agg(xxhash64(c_custkey),
                     CAST(65536 AS BIGINT), CAST(524288 AS BIGINT)) AS f
            FROM graft_q143_customer
            WHERE c_mktsegment = 'BUILDING'
          )
          SELECT o.o_orderkey, o.o_custkey
          FROM graft_q143_orders o
          WHERE graft_might_contain((SELECT f FROM bf),
                                    xxhash64(o.o_custkey))
            AND o.o_custkey IN (
              SELECT c_custkey FROM graft_q143_customer
              WHERE c_mktsegment = 'BUILDING')""")
      },
      Some("""SELECT o_orderkey, o_custkey
        |FROM orders
        |WHERE o_custkey IN (
        |  SELECT c_custkey FROM customer
        |  WHERE c_mktsegment = 'BUILDING')""".stripMargin)),

    // Sketch-guided EXACT heavy hitters: every token bigram holding
    // >= 0.1% of the corpus' bigram mass, with its exact count. The
    // oracle runs the naive full GROUP BY + HAVING; the engine runs
    // the Misra-Gries candidate pass + exact confirm, and must produce
    // the identical rows (the sketch's no-false-negative guarantee,
    // made checkable).
    Q("q120_heavy_hitters", { t =>
        val toks = TextOps.tokens(col("text"))
        val bigrams = t.documents.select(
          explode(filter(
            zip_with(toks,
                     slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
                     (a, b) => concat_ws(" ", a, b)),
            p => p.rlike(" "))).as("bigram"))
        Sketches.heavyHitters(bigrams, col("bigram"),
                              minShare = 0.001, maxMapSize = 4096)
      },
      Some("""WITH toks AS (
        |  SELECT doc_id, i AS pos,
        |    list_extract(string_split_regex(lower(text), '\s+'),
        |                 CAST(i AS INT)) AS tok
        |  FROM documents,
        |    UNNEST(generate_series(1,
        |      len(string_split_regex(lower(text), '\s+')))) t(i)
        |), bg AS (
        |  SELECT tok || ' ' || t1 AS k FROM (
        |    SELECT tok, LEAD(tok, 1) OVER (PARTITION BY doc_id
        |                                   ORDER BY pos) AS t1
        |    FROM toks
        |  ) x WHERE t1 IS NOT NULL
        |)
        |SELECT k, COUNT(*) AS n FROM bg
        |GROUP BY k
        |HAVING COUNT(*) >= CEIL(0.001 * (SELECT COUNT(*) FROM bg))"""
        .stripMargin)),

    // Morton/Z-order interleaving of the two lineitem access paths
    // (part, supplier): the data-skipping layout key — rows sorted by
    // z cluster BOTH dimensions, so row-group min/max pruning works
    // for predicates on either. Pure bit arithmetic, bit-identical
    // across engines.
    Q("q127_zorder_key",
      t => t.lineitem.select(
        col("l_orderkey"), col("l_linenumber"),
        Sketches.zValue(col("l_partkey"), col("l_suppkey"), bits = 20)
          .as("z")),
      // per-row inline bit terms, no unnest+regroup: (l_orderkey,
      // l_linenumber) is not unique in the synthetic data
      Some("SELECT l_orderkey, l_linenumber, " +
        (0 until 20).map(b =>
          s"(((l_partkey >> $b) & 1) << ${2 * b}) + " +
          s"(((l_suppkey >> $b) & 1) << ${2 * b + 1})")
          .mkString("", " + ", " AS z") +
        " FROM lineitem")),

    // Fixed-point PageRank (5 iterations) over the item co-occurrence
    // graph — the link-graph quality prior of corpus curation, in
    // integer 1e-12 units so every rank is bit-identical to the
    // unrolled SQL twin (floating PageRank sums are order-dependent
    // and cannot be oracle-gated).
    Q("q128_pagerank", { t =>
        val urm = graft.etl.Urm.fromOrders(t).filter(col("i") < 500)
        val edges = graft.similarity.Similarity.pairDots(urm)
          .select(col("i").as("src"), col("j").as("dst"))
        graft.graph.PageRank.fixedPoint(edges, iters = 5)
      },
      Some {
        val iter = (k: Int) => s"""p$k AS (
          |  SELECT n2.node,
          |    CAST((150000000000 // nn.n)
          |      + (85 * COALESCE(c.inflow, 0)) // 100 AS BIGINT) AS p
          |  FROM nodes n2 CROSS JOIN nn
          |  LEFT JOIN (
          |    SELECT e.dst AS node, SUM(pp.p // deg.d) AS inflow
          |    FROM edges e
          |    JOIN p${k - 1} pp ON e.src = pp.node
          |    JOIN deg ON e.src = deg.src
          |    GROUP BY 1) c ON n2.node = c.node
          |)""".stripMargin
        s"""WITH urm AS (
          |  SELECT DISTINCT o_custkey AS u, l_partkey AS i
          |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          |  WHERE l_partkey < 500
          |), edges AS (
          |  SELECT a.i AS src, b.i AS dst
          |  FROM urm a JOIN urm b ON a.u = b.u AND a.i <> b.i
          |  GROUP BY 1, 2
          |), nodes AS (
          |  SELECT src AS node FROM edges
          |  UNION SELECT dst FROM edges
          |), deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY 1),
          |nn AS (SELECT COUNT(*) AS n FROM nodes),
          |p0 AS (
          |  SELECT node, CAST(1000000000000 // nn.n AS BIGINT) AS p
          |  FROM nodes CROSS JOIN nn
          |),
          |${(1 to 5).map(iter).mkString(",\n")}
          |SELECT node, p AS rank12 FROM p5""".stripMargin
      }),

    // Mergeable KLL quantile sketches: per-returnflag price quartiles
    // plus the sketch-merged global row. No DuckDB twin exists for the
    // sketch binary, so the gate is rows-only; the accuracy contract
    // (rank error vs exact quantile_cont) is pinned by the StatsSpec
    // fixture.
    Q("q123_kll_quantiles",
      t => Sketches.kllQuantiles(t.lineitem, col("l_returnflag"),
                                 col("l_extendedprice"),
                                 Seq(0.25, 0.5, 0.75)),
      None),

    // KLL exact-regime STRICT gate: the same sketch pipeline as q123
    // (per-group sketches, reduceByKey merge, merged global row) run in
    // the regime where KLL is provably exact — a KllDoublesSketch at
    // k=200 retains every item until the 201st update, and merging
    // exact sketches whose combined weight stays <= k performs no
    // compaction, so per-group (n=60) and merged-global (n=180)
    // quantiles are order statistics: with INCLUSIVE search criteria,
    // quantile(q) over n items = the value at sorted position
    // ceil(q*n). The oracle computes exactly those positions with
    // ROW_NUMBER, so a sketch code path that compacts, mis-merges, or
    // shifts rank semantics is a red hash row (q123 stays the
    // approximate at-scale demo; this pins its machinery bit-exactly).
    // The 60-row-per-group subset is deterministic: smallest prices
    // with (orderkey, linenumber) breaking price ties identically in
    // both engines.
    Q("q147_kll_exact_gate", { t =>
        val w = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("l_extendedprice"), col("l_orderkey"),
                   col("l_linenumber"))
        val sub = t.lineitem
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 60)
        Sketches.kllQuantiles(sub, col("l_returnflag"),
                              col("l_extendedprice"),
                              Seq(0.25, 0.5, 0.75))
      },
      Some("""WITH sub AS (
        |  SELECT l_returnflag AS g, l_extendedprice AS v,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem
        |), s AS (SELECT g, v FROM sub WHERE rn <= 60),
        |grp AS (
        |  SELECT g, FALSE AS is_total,
        |    MAX(CASE WHEN r = 15 THEN v END) AS q25,
        |    MAX(CASE WHEN r = 30 THEN v END) AS q50,
        |    MAX(CASE WHEN r = 45 THEN v END) AS q75
        |  FROM (SELECT g, v,
        |          ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) AS r
        |        FROM s) t
        |  GROUP BY g
        |), tot AS (
        |  SELECT CAST(NULL AS VARCHAR) AS g, TRUE AS is_total,
        |    MAX(CASE WHEN r = 45 THEN v END) AS q25,
        |    MAX(CASE WHEN r = 90 THEN v END) AS q50,
        |    MAX(CASE WHEN r = 135 THEN v END) AS q75
        |  FROM (SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS r
        |        FROM s) t
        |)
        |SELECT * FROM grp UNION ALL SELECT * FROM tot""".stripMargin)),

    // KLL INCREMENT-MERGE gate: the mergeability claim itself, pinned.
    // The q147 subset splits into two ingest increments (odd/even
    // orderkey); each is sketched SEPARATELY into a persistable
    // (g, sketch) frame, the frames union, and the merged quantiles
    // must equal the order statistics of the FULL subset — which only
    // holds if cross-increment merging is lossless in the exact regime
    // (the two increments partition the 60 rows/group, combined 60 ≤
    // k = 200, so no compaction ever fires). Same oracle as q147. A
    // merge that drops an increment, double-counts, or compacts is a
    // red hash row.
    Q("q163_kll_increment_merge", { t =>
        val w = Window.partitionBy(col("l_returnflag"))
          .orderBy(col("l_extendedprice"), col("l_orderkey"),
                   col("l_linenumber"))
        val sub = graft.core.CacheScope.persist(
          t.lineitem
            .withColumn("rn", row_number().over(w))
            .filter(col("rn") <= 60))
        val incA = Sketches.kllSketchFrame(
          sub.filter(col("l_orderkey") % 2 === 0),
          col("l_returnflag"), col("l_extendedprice"))
        val incB = Sketches.kllSketchFrame(
          sub.filter(col("l_orderkey") % 2 === 1),
          col("l_returnflag"), col("l_extendedprice"))
        Sketches.kllMergeQuantiles(incA.unionByName(incB),
                                   Seq(0.25, 0.5, 0.75))
      },
      Some("""WITH sub AS (
        |  SELECT l_returnflag AS g, l_extendedprice AS v,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem
        |), s AS (SELECT g, v FROM sub WHERE rn <= 60),
        |grp AS (
        |  SELECT g, FALSE AS is_total,
        |    MAX(CASE WHEN r = 15 THEN v END) AS q25,
        |    MAX(CASE WHEN r = 30 THEN v END) AS q50,
        |    MAX(CASE WHEN r = 45 THEN v END) AS q75
        |  FROM (SELECT g, v,
        |          ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) AS r
        |        FROM s) t
        |  GROUP BY g
        |), tot AS (
        |  SELECT CAST(NULL AS VARCHAR) AS g, TRUE AS is_total,
        |    MAX(CASE WHEN r = 45 THEN v END) AS q25,
        |    MAX(CASE WHEN r = 90 THEN v END) AS q50,
        |    MAX(CASE WHEN r = 135 THEN v END) AS q75
        |  FROM (SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS r
        |        FROM s) t
        |)
        |SELECT * FROM grp UNION ALL SELECT * FROM tot""".stripMargin)),

    // The STREAMING face of the q163 increment story, as a registered
    // oracle row (VERDICT r9 optional #7; previously fixture-only in
    // StreamingMultimodalSpec): a real writeStream drives two
    // micro-batches through foreachBatch, each batch reduces to a
    // persistable kllSketchFrame increment, and the merged quantiles
    // over ALL batch frames equal the order statistics of everything
    // the stream ever saw — no batch rescanned. Exact regime (40
    // values/group ≤ k = 200, no compaction), inclusive quantile =
    // value at rank ⌈q·n⌉, so the DuckDB twin is exact: per-group
    // ranks 10/20/30 of n = 40; the cross-group total ranks 20/40/60
    // of n = 80. A dropped batch, a double-counted frame, or a lossy
    // merge is a red hash row.
    Q("q173_streaming_kll_gate", { t =>
        import t.spark.implicits._
        implicit val sqlCtx: org.apache.spark.sql.SQLContext =
          t.spark.sqlContext
        val stream = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(String, Double)]
        val frames = scala.collection.mutable.ArrayBuffer
          .empty[org.apache.spark.sql.Row]
        val q = stream.toDF().toDF("g", "v").writeStream
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
                           _: Long) =>
            frames ++= Sketches.kllSketchFrame(batch, col("g"), col("v"))
              .collect()
            ()
          }
          .start()
        stream.addData((1 to 20).map(i => ("a", i.toDouble)) ++
                       (1 to 20).map(i => ("b", i * 10.0)): _*)
        q.processAllAvailable()
        stream.addData((21 to 40).map(i => ("a", i.toDouble)) ++
                       (21 to 40).map(i => ("b", i * 10.0)): _*)
        q.processAllAvailable()
        q.stop()
        val union = t.spark.createDataFrame(
          t.spark.sparkContext.parallelize(frames.toSeq),
          frames.head.schema)
        Sketches.kllMergeQuantiles(union, Seq(0.25, 0.5, 0.75))
      },
      Some("""WITH s AS (
        |  SELECT 'a' AS g, CAST(i AS DOUBLE) AS v
        |  FROM generate_series(1, 40) t(i)
        |  UNION ALL
        |  SELECT 'b' AS g, CAST(i * 10 AS DOUBLE) AS v
        |  FROM generate_series(1, 40) t(i)
        |), grp AS (
        |  SELECT g, FALSE AS is_total,
        |    MAX(CASE WHEN r = 10 THEN v END) AS q25,
        |    MAX(CASE WHEN r = 20 THEN v END) AS q50,
        |    MAX(CASE WHEN r = 30 THEN v END) AS q75
        |  FROM (SELECT g, v,
        |          ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) AS r
        |        FROM s) t
        |  GROUP BY g
        |), tot AS (
        |  SELECT CAST(NULL AS VARCHAR) AS g, TRUE AS is_total,
        |    MAX(CASE WHEN r = 20 THEN v END) AS q25,
        |    MAX(CASE WHEN r = 40 THEN v END) AS q50,
        |    MAX(CASE WHEN r = 60 THEN v END) AS q75
        |  FROM (SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS r
        |        FROM s) t
        |)
        |SELECT * FROM grp UNION ALL SELECT * FROM tot""".stripMargin)),

    // Dangling-mass-redistributing PageRank (3 iterations) over a
    // DIRECTED bipartite part->supplier graph, where every supplier
    // node is dangling (no out-edges) — the redistribution term does
    // real work on every iteration or the gate is vacuous. Same 1e-12
    // fixed-point arithmetic as q128, so the per-round dangling share
    // is bit-identical to the unrolled SQL twin.
    Q("q136_pagerank_dangling", { t =>
        val edges = t.lineitem.filter(col("l_partkey") < 300)
          .select(col("l_partkey").cast("long").as("src"),
                  (col("l_suppkey").cast("long") + 100000L).as("dst"))
          .distinct()
        graft.graph.PageRank.fixedPointRedistribute(edges, iters = 3)
      },
      Some {
        val iter = (k: Int) => s"""dang$k AS (
          |  SELECT COALESCE(SUM(p), 0) AS dm FROM p${k - 1}
          |  WHERE node NOT IN (SELECT src FROM edges)
          |), p$k AS (
          |  SELECT n2.node,
          |    CAST((150000000000 // nn.n)
          |      + (85 * (COALESCE(c.inflow, 0)
          |               + (SELECT dm FROM dang$k) // nn.n)) // 100
          |      AS BIGINT) AS p
          |  FROM nodes n2 CROSS JOIN nn
          |  LEFT JOIN (
          |    SELECT e.dst AS node, SUM(pp.p // deg.d) AS inflow
          |    FROM edges e
          |    JOIN p${k - 1} pp ON e.src = pp.node
          |    JOIN deg ON e.src = deg.src
          |    GROUP BY 1) c ON n2.node = c.node
          |)""".stripMargin
        s"""WITH edges AS (
          |  SELECT DISTINCT CAST(l_partkey AS BIGINT) AS src,
          |    CAST(l_suppkey AS BIGINT) + 100000 AS dst
          |  FROM lineitem WHERE l_partkey < 300
          |), nodes AS (
          |  SELECT src AS node FROM edges
          |  UNION SELECT dst FROM edges
          |), deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY 1),
          |nn AS (SELECT COUNT(*) AS n FROM nodes),
          |p0 AS (
          |  SELECT node, CAST(1000000000000 // nn.n AS BIGINT) AS p
          |  FROM nodes CROSS JOIN nn
          |),
          |${(1 to 3).map(iter).mkString(",\n")}
          |SELECT node, p AS rank12 FROM p3""".stripMargin
      })
  )
}
