package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, Qh}

/** Core relational operator surface (SURVEY.md §2.2–2.5): projections,
  * filters, equi-joins (inner/semi/anti, broadcast for dimensions),
  * single- and two-level aggregations, global and per-group top-k,
  * dedup-keep-last, running windows.
  *
  * Reference shapes: projections/filters Utils/dataset.py:539-541, 737,
  * 1423-1445, 1548-1550; joins Utils/dataset.py:412-433, 1916-1919;
  * aggregations Utils/dataset.py:643-732; top-k Utils/dataset.py:1186-1187;
  * dedup-keep-last Data_manager/DataReader_utils.py:138-144.
  *
  * Scale notes: every query here is a declarative plan — filters and column
  * pruning reach the parquet scan, dimension joins are broadcast, heavy
  * aggregations are partial (map-side combine) before the shuffle.
  */
object Relational {

  /** AS-OF join: for every left row, attach the single right row with
    * the greatest right.`ts` ≤ left.`ts` within the same `key` group —
    * the point-in-time lookup of event pipelines (latest click before
    * each purchase, latest price before each trade).
    *
    * Spark has no built-in as-of join; a naive range join explodes to
    * a per-row probe. The distributed form here is union-and-carry-
    * forward: tag both inputs, shuffle ONCE on the key, order each
    * group by (ts, side, tie) with right rows sorting before left rows
    * at equal ts (inclusive as-of), and carry the latest right payload
    * forward with `last(_, ignoreNulls)` over a running frame. Total
    * cost = one shuffle + one linear window pass — the same plan shape
    * as a grouped cumsum, at any corpus size. Groups are per-key
    * sequential (inherent to as-of semantics); a hot key is bounded by
    * its own event history, not the corpus.
    *
    * `tie` must be a unique id present in both inputs (total order ⇒
    * deterministic result). Right payload columns are returned as one
    * struct column `asof`, null when no right row precedes the left
    * row. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               ts: String, tie: String, payload: Seq[String])
      : DataFrame = {
    val lStruct = struct(left.columns.map(left(_)): _*)
    val rStruct = struct(payload.map(right(_)): _*)
    val lType = left.select(lStruct.as("_l")).schema("_l").dataType
    val rType = right.select(rStruct.as("_r")).schema("_r").dataType
    // mismatched tie types would be resolved by silent union coercion
    // (long + string → string, lexicographic tie order) — reject them
    val lTie = left.select(left(tie).as("_t")).schema("_t").dataType
    val rTie = right.select(right(tie).as("_t")).schema("_t").dataType
    require(lTie == rTie,
      s"tie column '$tie' must have the same type on both inputs " +
      s"(left: $lTie, right: $rTie) — union coercion would silently " +
      "change the tie order")
    // the tie column orders RAW (no numeric cast): a string/UUID id
    // must keep its values — casting would null them out and silently
    // break the deterministic-total-order contract
    val lTagged = left.select(
      left(key).as("_k"), left(ts).as("_ts"), lit(1).as("_side"),
      left(tie).as("_tie"), lStruct.as("_l"),
      lit(null).cast(rType).as("_r"))
    val rTagged = right.select(
      right(key).as("_k"), right(ts).as("_ts"), lit(0).as("_side"),
      right(tie).as("_tie"),
      lit(null).cast(lType).as("_l"), rStruct.as("_r"))
    val w = Window.partitionBy("_k")
      .orderBy(col("_ts"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col("_l.*"), col("_match").as("asof"))
  }

  /** RANGE join: left points against right intervals
    * (`lo` ≤ v ≤ `hi`) — the band/containment lookup (price bands,
    * IP ranges, time windows). A naive inequality join plans as a
    * broadcast-nested-loop theta join — O(points × intervals); this
    * uses the standard bucketing decomposition: every interval
    * replicates to the `bucketWidth`-sized buckets it overlaps
    * (fan-out = interval length / width, bounded by the caller),
    * points hash to their single bucket, candidates equi-join on the
    * bucket key and the exact predicate filters within. One
    * partitioned equi-join at any scale; pick `bucketWidth` near the
    * median interval length so fan-out and bucket occupancy stay
    * balanced. Returns point rows joined to every containing
    * interval. */
  def rangeJoin(points: DataFrame, intervals: DataFrame, v: String,
                lo: String, hi: String, bucketWidth: Double)
      : DataFrame = {
    require(bucketWidth > 0, "positive bucket width")
    val ivB = intervals.withColumn("_b", explode(sequence(
      floor(col(lo) / bucketWidth).cast("long"),
      floor(col(hi) / bucketWidth).cast("long"))))
    val ptB = points.withColumn("_b",
      floor(col(v) / bucketWidth).cast("long"))
    ptB.join(ivB, "_b")
      .filter(col(v) >= col(lo) && col(v) <= col(hi))
      .drop("_b")
  }

  def queries: Seq[Q] = Seq(

    // P1/P2/P3 — projection, rename, cast. Cast via floor() because DuckDB
    // rounds double→int while Spark truncates.
    Q("q01_scan_project",
      t => t.lineitem.select(
        col("l_orderkey").as("okey"),
        col("l_linenumber").as("lineno"),
        floor(col("l_quantity")).cast("int").as("qty_int"),
        col("l_returnflag").as("flag")),
      Some("""SELECT l_orderkey AS okey, l_linenumber AS lineno,
             |CAST(FLOOR(l_quantity) AS INT) AS qty_int,
             |l_returnflag AS flag FROM lineitem""".stripMargin)),

    // P4/P5/P7/P8 — conjunctive predicates incl. a time-range filter; all
    // pushed to the parquet scan by Catalyst.
    Q("q02_filter_conj",
      t => t.lineitem.filter(
          col("l_quantity") >= 25 && col("l_returnflag") === "R" &&
          col("l_shipdate") >= lit("1995-06-01").cast("timestamp") &&
          col("l_shipdate") <  lit("1997-01-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
             |FROM lineitem
             |WHERE l_quantity >= 25 AND l_returnflag = 'R'
             |AND l_shipdate >= TIMESTAMP '1995-06-01'
             |AND l_shipdate < TIMESTAMP '1997-01-01'""".stripMargin)),

    // A1/A14 — wide single-pass grouped aggregation (TPC-H Q1 shape).
    Q("q03_agg_basic",
      t => t.lineitem.groupBy("l_returnflag", "l_linestatus").agg(
        Qh.dsum(col("l_quantity")).as("sum_qty"),
        Qh.dsum(col("l_extendedprice")).as("sum_base_price"),
        // product computed in exact decimal space — a double product cast
        // to decimal rounds differently between engines at .005 boundaries
        sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(java.math.BigDecimal.ONE) -
             col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"),
        (Qh.dsum(col("l_quantity")) / count(lit(1))).as("avg_qty")),
      Some(s"""SELECT l_returnflag, l_linestatus,
              |${Qh.sqlDsum("l_quantity")} AS sum_qty,
              |${Qh.sqlDsum("l_extendedprice")} AS sum_base_price,
              |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
              |  (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
              |  AS sum_disc_price,
              |COUNT(*) AS count_order,
              |${Qh.sqlDsum("l_quantity")}/COUNT(*) AS avg_qty
              |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    // A2 — aggregate of grouped counts (mean/min/max orders per customer).
    Q("q04_two_level_agg",
      t => t.orders.groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
        .agg(min("cnt").as("min_orders"), max("cnt").as("max_orders"),
             (sum("cnt").cast("double") / count(lit(1))).as("avg_orders"),
             count(lit(1)).as("n_cust")),
      Some("""SELECT MIN(cnt) AS min_orders, MAX(cnt) AS max_orders,
             |CAST(CAST(SUM(cnt) AS BIGINT) AS DOUBLE)/COUNT(*) AS avg_orders,
             |COUNT(*) AS n_cust
             |FROM (SELECT o_custkey, COUNT(*) AS cnt FROM orders
             |      GROUP BY o_custkey) t""".stripMargin)),

    // A4/A5/A7 — global distinct counts.
    Q("q05_distinct_counts",
      t => t.lineitem.agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_partkey"), col("l_suppkey")).as("n_part_supp"),
        count(lit(1)).as("n_rows")),
      Some("""SELECT
             |(SELECT COUNT(DISTINCT l_partkey) FROM lineitem) AS n_parts,
             |(SELECT COUNT(*) FROM
             |   (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) d)
             |   AS n_part_supp,
             |(SELECT COUNT(*) FROM lineitem) AS n_rows""".stripMargin)),

    // J1/J3 + A1 — fact⋈fact join plus broadcast dimension joins.
    Q("q06_join_agg",
      t => t.orders
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(Qh.dsum(col("o_totalprice")).as("revenue"),
             count(lit(1)).as("n_orders")),
      Some(s"""SELECT r_name, n_name,
              |${Qh.sqlDsum("o_totalprice")} AS revenue,
              |COUNT(*) AS n_orders
              |FROM orders
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation ON c_nationkey = n_nationkey
              |JOIN region ON n_regionkey = r_regionkey
              |GROUP BY r_name, n_name""".stripMargin)),

    // J4 — left-semi join (EXISTS).
    Q("q07_join_semi",
      t => t.customer.join(t.orders, col("c_custkey") === col("o_custkey"),
                           "left_semi")
        .select("c_custkey", "c_name"),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |""".stripMargin)),

    // U4/J7 — left-anti join (NOT EXISTS); the engine's "remove seen" /
    // set-difference primitive.
    Q("q08_join_anti",
      t => t.customer.join(t.orders, col("c_custkey") === col("o_custkey"),
                           "left_anti")
        .select("c_custkey", "c_mktsegment"),
      Some("""SELECT c_custkey, c_mktsegment FROM customer
             |WHERE NOT EXISTS
             |(SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin)),

    // T1 — global top-k of grouped aggregates (TakeOrderedAndProject);
    // deterministic tie-break on key.
    Q("q09_topk_global",
      t => t.orders.groupBy("o_custkey")
        .agg(Qh.dsum(col("o_totalprice")).as("spend"),
             count(lit(1)).as("n_orders"))
        .orderBy(desc("spend"), asc("o_custkey"))
        .limit(20),
      Some(s"""SELECT o_custkey, ${Qh.sqlDsum("o_totalprice")} AS spend,
              |COUNT(*) AS n_orders
              |FROM orders GROUP BY o_custkey
              |ORDER BY spend DESC, o_custkey LIMIT 20""".stripMargin)),

    // T3/T4 — per-group top-k via ranking window.
    Q("q10_topk_pergroup", { t =>
        val w = Window.partitionBy("p_brand")
          .orderBy(desc("p_retailprice"), asc("p_partkey"))
        t.part.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("p_brand", "p_partkey", "p_retailprice", "rn")
      },
      Some("""SELECT p_brand, p_partkey, p_retailprice, rn FROM (
             |  SELECT p_brand, p_partkey, p_retailprice,
             |  ROW_NUMBER() OVER (PARTITION BY p_brand
             |    ORDER BY p_retailprice DESC, p_partkey) AS rn
             |  FROM part) t WHERE rn <= 3""".stripMargin)),

    // T5 — sort + dedup keep-last (latest event per user/type). Timestamps
    // truncated to ms on both sides: the raw column is ns-precision, which
    // Spark reads at µs and DuckDB at ns.
    Q("q11_dedup_keeplast", { t =>
        val w = Window.partitionBy("user_id", "event_type")
          .orderBy(desc("ts_ms"), desc("event_id"))
        t.events
          .withColumn("ts_ms", date_trunc("millisecond", col("ts")))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("user_id", "event_type", "event_id", "value")
      },
      Some("""SELECT user_id, event_type, event_id, value FROM (
             |  SELECT user_id, event_type, event_id, value,
             |  ROW_NUMBER() OVER (PARTITION BY user_id, event_type
             |    ORDER BY date_trunc('millisecond', ts) DESC, event_id DESC)
             |    AS rn
             |  FROM events) t WHERE rn = 1""".stripMargin)),

    // A11-adjacent — running cumulative sum per key with an explicit ROWS
    // frame (exact decimal accumulation in deterministic order).
    Q("q12_window_cumsum", { t =>
        val w = Window.partitionBy("o_custkey")
          .orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t.orders.withColumn(
            "run_spend",
            sum(col("o_totalprice").cast("decimal(18,2)")).over(w)
              .cast("double"))
          .select("o_custkey", "o_orderkey", "run_spend")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
             |  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |  AS DOUBLE) AS run_spend
             |FROM orders""".stripMargin)),

    // AS-OF join: each purchase matched to the user's most recent
    // click at-or-before it. The oracle uses DuckDB's native ASOF
    // LEFT JOIN, so the one-shuffle carry-forward plan is checked
    // against an independent reference implementation of the
    // semantics. Timestamps compare as epoch-µs longs (the generator
    // is µs-precision, so both engines see identical instants).
    Q("q108_asof_join", { t =>
        val ev = graft.core.CacheScope.persist(
          t.events.select(col("event_id"), col("user_id"), col("ts"),
                          col("event_type"), col("value")))
        val l = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"),
                  col("value"))
        val r = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("event_id").as("r_event_id"),
                  col("user_id"), col("ts"), col("value").as("r_value"))
        Relational.asofJoin(l, r, key = "user_id", ts = "ts",
                            tie = "event_id",
                            payload = Seq("r_event_id", "r_value"))
          .select(col("event_id"), col("user_id"),
                  unix_micros(col("ts")).as("ts_us"), col("value"),
                  col("asof.r_event_id").as("r_event_id"),
                  col("asof.r_value").as("r_value"))
      },
      Some("""WITH l AS (
        |  SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'purchase'
        |), r AS (
        |  SELECT event_id AS r_event_id, user_id, ts,
        |    value AS r_value
        |  FROM events WHERE event_type = 'click'
        |)
        |SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us, l.value,
        |  r.r_event_id, r.r_value
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin)),

    // RANGE join: orders bucketed into overlapping price bands
    // (width 15000, start step 10000 — a price can land in two bands,
    // so the multi-match path is genuinely exercised), aggregated per
    // band. The oracle uses a plain BETWEEN theta join — an
    // independent formulation of the same semantics.
    Q("q111_range_join", { t =>
        val bands = t.spark.range(0, 40)
          .select(col("id").as("band_id"),
                  (col("id") * 10000.0).as("lo"),
                  (col("id") * 10000.0 + 14999.99).as("hi"))
        val pts = t.orders.select(col("o_orderkey"), col("o_totalprice"))
        Relational.rangeJoin(pts, bands, v = "o_totalprice",
                             lo = "lo", hi = "hi", bucketWidth = 5000.0)
          .groupBy("band_id")
          .agg(count(lit(1)).as("n"),
               Qh.dsum(col("o_totalprice")).as("sum_price"))
      },
      Some(s"""WITH bands AS (
        |  SELECT i AS band_id, i * 10000.0 AS lo,
        |    i * 10000.0 + 14999.99 AS hi
        |  FROM UNNEST(generate_series(0, 39)) t(i)
        |)
        |SELECT band_id, COUNT(*) AS n,
        |  ${Qh.sqlDsum("o_totalprice")} AS sum_price
        |FROM orders JOIN bands
        |  ON o_totalprice >= lo AND o_totalprice <= hi
        |GROUP BY 1""".stripMargin)),

    // ROLLUP aggregation: subtotals per (status, priority), per status,
    // and the grand total in one pass — Catalyst expands the grouping
    // sets into a single shuffle, no per-level re-scan.
    Q("q112_rollup",
      t => t.orders
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
             Qh.dsum(col("o_totalprice")).as("sum_price")),
      Some(s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  ${Qh.sqlDsum("o_totalprice")} AS sum_price
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)"""
        .stripMargin)),

    // Window-function sampler over per-customer order histories: gap
    // to the previous order (lag), spend rank, percent_rank, and
    // quartile (ntile) — the analytic windows a reporting workload
    // leans on, all over ONE partitioned sort.
    Q("q113_window_funcs", { t =>
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val ws = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t.orders.select(
          col("o_custkey"), col("o_orderkey"),
          datediff(col("o_orderdate"),
                   lag(col("o_orderdate"), 1).over(w)).as("days_since_prev"),
          row_number().over(ws).as("spend_rank"),
          round(percent_rank().over(ws), 6).as("spend_pct"),
          ntile(4).over(ws).as("spend_quartile"))
      },
      Some("""SELECT o_custkey, o_orderkey,
        |  CAST(datediff('day', LAG(o_orderdate, 1) OVER w, o_orderdate)
        |       AS INT) AS days_since_prev,
        |  CAST(ROW_NUMBER() OVER ws AS INT) AS spend_rank,
        |  round(PERCENT_RANK() OVER ws, 6) AS spend_pct,
        |  CAST(NTILE(4) OVER ws AS INT) AS spend_quartile
        |FROM orders
        |WINDOW
        |  w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |  ws AS (PARTITION BY o_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey)"""
        .stripMargin))
  )
}
