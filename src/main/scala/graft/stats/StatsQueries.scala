package graft.stats

import org.apache.spark.sql.functions._
import graft.{Q, Qh}

/** Oracle-checked queries exercising the Stats module (SURVEY.md §2.4
  * A10–A13 + sessionization).
  */
object StatsQueries {

  def queries: Seq[Q] = Seq(

    // A12 — fixed-width histogram of event values.
    Q("q24_histogram",
      t => Stats.histogram(t.events, col("value"), 5.0),
      Some("""SELECT CAST(FLOOR(value / 5.0) AS BIGINT) AS bin, COUNT(*) AS n
             |FROM events GROUP BY 1""".stripMargin)),

    // A13 — pivot heatmap (nation × order status) as conditional agg.
    Q("q25_pivot", { t =>
        val joined = t.orders
          .join(t.customer, col("o_custkey") === col("c_custkey"))
          .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        Stats.conditionalPivot(joined, col("n_name"), col("o_orderstatus"),
                               Seq("O", "F", "P"))
      },
      Some("""SELECT n_name AS k,
             |CAST(SUM(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS n_O,
             |CAST(SUM(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS n_F,
             |CAST(SUM(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS BIGINT) AS n_P
             |FROM orders
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name""".stripMargin)),

    // A10 — Gini concentration of orders over customers
    // (reference: Utils/gini.py:8-28).
    Q("q26_gini",
      t => Stats.giniOfCounts(t.orders, col("o_custkey")),
      Some("""WITH counts AS (
             |  SELECT o_custkey AS k, COUNT(*) AS cnt FROM orders GROUP BY 1
             |), ranked AS (
             |  SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt, k) AS i
             |  FROM counts
             |)
             |SELECT CAST(2*CAST(SUM(i*cnt) AS BIGINT)
             |            - (COUNT(*)+1)*CAST(SUM(cnt) AS BIGINT) AS DOUBLE)
             |     / CAST(COUNT(*) * CAST(SUM(cnt) AS BIGINT) AS DOUBLE)
             |  AS gini
             |FROM ranked""".stripMargin)),

    // A11 — top-entity counts covering 25/50/75% of total order mass
    // (reference: Utils/dataset.py:1201-1260).
    Q("q27_cum_coverage",
      t => Stats.cumulativeCoverage(t.orders, col("o_custkey"),
                                    Seq(0.25, 0.5, 0.75)),
      Some("""WITH counts AS (
             |  SELECT o_custkey AS k, COUNT(*) AS cnt FROM orders GROUP BY 1
             |), cum AS (
             |  SELECT cnt,
             |    SUM(cnt) OVER (ORDER BY cnt DESC, k
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             |    SUM(cnt) OVER () AS tot
             |  FROM counts
             |)
             |SELECT CAST(th AS DOUBLE) AS threshold, (
             |  SELECT COUNT(*) FROM cum WHERE cum - cnt < th * tot
             |) AS n_entities
             |FROM (VALUES (0.25), (0.5), (0.75)) AS tv(th)""".stripMargin)),

    // Gap-based sessionization (30 min) — session counts and sizes per user.
    Q("q28_sessionize",
      t => Stats.sessionize(t.events, col("user_id"), col("ts"),
                            col("event_id"), 30 * 60 * 1000L)
        .groupBy("user_id")
        .agg(max("session_id").as("n_sessions"),
             count(lit(1)).as("n_events")),
      Some("""WITH e AS (
             |  SELECT user_id, event_id, epoch_ms(date_trunc('millisecond', ts)) AS ms
             |  FROM events
             |), flagged AS (
             |  SELECT user_id,
             |    CASE WHEN LAG(ms) OVER w IS NULL
             |           OR ms - LAG(ms) OVER w > 1800000
             |         THEN 1 ELSE 0 END AS new_session
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)
             |)
             |SELECT user_id,
             |  CAST(SUM(new_session) AS BIGINT) AS n_sessions,
             |  COUNT(*) AS n_events
             |FROM flagged GROUP BY user_id""".stripMargin)),

    // Per-session aggregates via the NATIVE session_window operator
    // (the declarative twin of q28's gap sessionize and the streaming
    // sessionRecords). Boundary semantics fixture-pinned: ADJACENT
    // windows merge, so a successor exactly `gap` later continues the
    // session (oracle breaks on strict >), and end = last event + gap;
    // ms truncation on both sides makes the gap decision
    // engine-identical.
    Q("q138_session_window",
      t => graft.streaming.EventStreams.sessionWindowAgg(
        t.events, "user_id", "ts", "value", "30 minutes"),
      Some(s"""WITH e AS (
        |  SELECT user_id, epoch_ms(date_trunc('millisecond', ts)) AS ms,
        |    value
        |  FROM events
        |), flagged AS (
        |  SELECT user_id, ms, value,
        |    CASE WHEN LAG(ms) OVER w IS NULL
        |           OR ms - LAG(ms) OVER w > 1800000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms)
        |), s AS (
        |  SELECT user_id, ms, value,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ms
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged
        |)
        |SELECT user_id, MIN(ms) AS start_ms,
        |  MAX(ms) + 1800000 AS end_ms,
        |  COUNT(*) AS n_events, ${Qh.sqlDsum("value")} AS sum_value
        |FROM s GROUP BY user_id, sid""".stripMargin)),

    // Exact two-sample KS distance between the doc-length
    // distributions of two source cohorts — the distribution-drift
    // monitor of a continuously rebuilt corpus. The engine sweeps the
    // merged value axis with the windowless two-pass cumsum; the
    // oracle uses plain SQL windows (tie-correct: ecdf evaluated per
    // DISTINCT value).
    Q("q140_ks_drift", { t =>
        val docs = t.documents
          .select(col("source"), length(col("text")).as("len"))
        Stats.ksDrift(
          docs.filter(length(col("source")) === 4),   // src0..src9
          docs.filter(length(col("source")) === 5),   // src10..src19
          col("len"))
      },
      Some("""WITH vals AS (
        |  SELECT CAST(length(text) AS DOUBLE) AS v,
        |    CASE WHEN length(source) = 4 THEN 1 ELSE 0 END AS ca,
        |    CASE WHEN length(source) = 5 THEN 1 ELSE 0 END AS cb
        |  FROM documents
        |), g AS (
        |  SELECT v, SUM(ca) AS ca, SUM(cb) AS cb FROM vals GROUP BY v
        |), n AS (
        |  SELECT SUM(ca) AS na, SUM(cb) AS nb FROM g
        |), e AS (
        |  SELECT
        |    SUM(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_a,
        |    SUM(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_b
        |  FROM g
        |)
        |SELECT round(MAX(abs(CAST(cum_a AS DOUBLE) / na
        |                     - CAST(cum_b AS DOUBLE) / nb)), 6) AS ks,
        |  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b
        |FROM e CROSS JOIN n GROUP BY na, nb""".stripMargin)),

    // PSI drift between the same two cohorts — the BINNED drift score
    // production monitors threshold (0.1 warn / 0.25 act), next to
    // q140's exact KS. ε-smoothed shares over 16 equal-width length
    // bins; both sides collapse in one union-tagged groupBy to a
    // 16-row frame, so the oracle is a bin-for-bin arithmetic twin.
    Q("q146_psi_drift", { t =>
        val docs = t.documents
          .select(col("source"), length(col("text")).as("len"))
        Stats.psiDrift(
          docs.filter(length(col("source")) === 4),
          docs.filter(length(col("source")) === 5),
          col("len"), bins = 16, lo = 0.0, hi = 4000.0)
      },
      Some("""WITH vals AS (
        |  SELECT LEAST(15, GREATEST(0, CAST(floor(
        |           CAST(length(text) AS DOUBLE) / 250.0) AS INT))) AS bin,
        |    CASE WHEN length(source) = 4 THEN 1 ELSE 0 END AS ca,
        |    CASE WHEN length(source) = 5 THEN 1 ELSE 0 END AS cb
        |  FROM documents
        |  WHERE length(source) IN (4, 5)
        |), g AS (
        |  SELECT bin, SUM(ca) AS ca, SUM(cb) AS cb FROM vals GROUP BY bin
        |), n AS (
        |  SELECT SUM(ca) AS na, SUM(cb) AS nb FROM g
        |)
        |SELECT round(SUM(((CAST(ca AS DOUBLE) / na + 1e-6)
        |                  - (CAST(cb AS DOUBLE) / nb + 1e-6))
        |                 * ln((CAST(ca AS DOUBLE) / na + 1e-6)
        |                      / (CAST(cb AS DOUBLE) / nb + 1e-6))), 6)
        |    AS psi,
        |  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b
        |FROM g CROSS JOIN n GROUP BY na, nb""".stripMargin)),

    // Tumbling 1-hour windowed aggregation — batch twin of the
    // Structured Streaming pipeline in graft.streaming.
    Q("q29_time_window",
      t => t.events
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH")
                   .as("hour"))
        .agg(count(lit(1)).as("n"), Qh.dsum(col("value")).as("sum_value")),
      Some(s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
              |COUNT(*) AS n, ${Qh.sqlDsum("value")} AS sum_value
              |FROM events GROUP BY 1""".stripMargin)),

    // Deterministic hash-stratified sampling of the document corpus:
    // per-language rates (training-mix control), md5-bucket keep
    // decision — the SAME rows survive on any engine, which is the
    // whole point of the gate (the sample itself is compared, not just
    // its size).
    Q("q101_stratified_sample", { t =>
        Stats.stratifiedSample(
          t.documents.select("doc_id", "lang", "source"),
          col("doc_id"), col("lang"),
          Map("en" -> 0.5, "zh" -> 0.1), defaultRate = 0.25)
      },
      Some(s"""SELECT doc_id, lang, source FROM documents
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |  < CASE lang
        |      WHEN 'zh' THEN ${Stats.rateThreshold(0.1)}
        |      WHEN 'en' THEN ${Stats.rateThreshold(0.5)}
        |      ELSE ${Stats.rateThreshold(0.25)}
        |    END""".stripMargin)),

    // Weighted sampling without replacement (A-Res): 20 docs per
    // language, selection probability ∝ document length. The sample
    // itself is compared across engines — deterministic md5 draws,
    // identical rounded sort keys, id tie-break.
    Q("q117_weighted_sample",
      t => Stats.weightedSample(
          t.documents.select("doc_id", "lang", "n_chars"),
          col("doc_id"), col("lang"), col("n_chars"), k = 20)
        .select("doc_id", "lang", "n_chars"),
      Some("""WITH keyed AS (
        |  SELECT doc_id, lang, n_chars,
        |    round(ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
        |              ::BIGINT + 0.5) / 4503599627370496.0)
        |          / n_chars, 6) AS key
        |  FROM documents
        |)
        |SELECT doc_id, lang, n_chars FROM (
        |  SELECT doc_id, lang, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY key DESC, doc_id) AS rk
        |  FROM keyed) t
        |WHERE rk <= 20""".stripMargin)),

    // Mergeable HLL distinct sketches: distinct users per event type
    // plus the sketch-UNION global row (is_total). No DuckDB twin
    // exists for the DataSketches binary format, so the gate is
    // rows-only; the accuracy contract (estimate within 5% of exact,
    // union bounded by its parts) is pinned by the StatsSpec fixture.
    Q("q114_hll_sketch",
      t => Stats.distinctSketch(t.events, col("event_type"),
                                col("user_id")),
      None),

    // HLL accuracy STRICT gate: the same sketch pipeline as q114 (per-
    // group HLL aggregation + the sketch-UNION global row) judged
    // against an exact-distinct yardstick computed alongside it. The
    // hashed output carries the exact counts plus a boolean derived
    // from the sketch estimate (|est − exact| ≤ 5%·exact — well above
    // the ~1.6% rel. std. error of the default lgK=12 sketch), so a
    // sketch path that drifts past its error budget, drops a group, or
    // mis-unions flips a row red. The exact countDistinct is the
    // gate's yardstick only — q114 remains the at-scale query and
    // never pays it.
    Q("q149_hll_error_gate", { t =>
        val sk = Stats.distinctSketch(t.events, col("event_type"),
                                      col("user_id"))
        val exact = t.events
          .groupBy(col("event_type").as("ge"))
          .agg(countDistinct(col("user_id")).as("n_exact"))
          .select(col("ge"), lit(false).as("te"), col("n_exact"))
          .unionByName(t.events
            .agg(countDistinct(col("user_id")).as("n_exact"))
            .select(lit(null).cast("string").as("ge"),
                    lit(true).as("te"), col("n_exact")))
        sk.join(exact, col("g") <=> col("ge") &&
                       col("is_total") === col("te"))
          .select(col("g"), col("is_total"), col("n_exact"),
                  (abs(col("est") - col("n_exact")) <=
                     lit(0.05) * col("n_exact")).as("within_5pct"))
      },
      Some("""SELECT event_type AS g, FALSE AS is_total,
        |  COUNT(DISTINCT user_id) AS n_exact, TRUE AS within_5pct
        |FROM events GROUP BY 1
        |UNION ALL
        |SELECT CAST(NULL AS VARCHAR), TRUE,
        |  COUNT(DISTINCT user_id), TRUE
        |FROM events""".stripMargin)),

    // HLL INCREMENT-UNION gate (the q163 convention for the distinct
    // axis): the event stream splits into two ingest increments by a
    // row hash, each is sketched SEPARATELY into a persistable
    // (g, sketch) frame, and the union-evaluated estimates must sit
    // within 5% of the exact distinct counts of the WHOLE stream —
    // a union that drops an increment undercounts far past 5% and
    // reddens the row; re-sent rows cannot overcount (register max is
    // duplicate-insensitive). Exact counts + the accuracy boolean are
    // the hashed output, per the q149 convention.
    Q("q164_hll_increment_union", { t =>
        val h = conv(substring(md5(concat_ws(":", col("user_id"),
                 col("event_type"), col("ts").cast("string"))), 1, 8),
               16, 10).cast("long")
        // one scan + one hash pass feeds both increments AND the exact
        // yardstick (q163's persist convention)
        val ev = graft.core.CacheScope.persist(
          t.events.withColumn("_inc", h % 2))
        val incA = Stats.distinctSketchFrame(
          ev.filter(col("_inc") === 0), col("event_type"),
          col("user_id"))
        val incB = Stats.distinctSketchFrame(
          ev.filter(col("_inc") === 1), col("event_type"),
          col("user_id"))
        val est = Stats.distinctUnionEstimate(incA.unionByName(incB))
        val exact = ev
          .groupBy(col("event_type").as("ge"))
          .agg(countDistinct(col("user_id")).as("n_exact"))
          .select(col("ge"), lit(false).as("te"), col("n_exact"))
          .unionByName(ev
            .agg(countDistinct(col("user_id")).as("n_exact"))
            .select(lit(null).cast("string").as("ge"),
                    lit(true).as("te"), col("n_exact")))
        est.join(exact, col("g") <=> col("ge") &&
                        col("is_total") === col("te"))
          .select(col("g"), col("is_total"), col("n_exact"),
                  (abs(col("est") - col("n_exact")) <=
                     lit(0.05) * col("n_exact")).as("within_5pct"))
      },
      Some("""SELECT event_type AS g, FALSE AS is_total,
        |  COUNT(DISTINCT user_id) AS n_exact, TRUE AS within_5pct
        |FROM events GROUP BY 1
        |UNION ALL
        |SELECT CAST(NULL AS VARCHAR), TRUE,
        |  COUNT(DISTINCT user_id), TRUE
        |FROM events""".stripMargin)),

    // Theta-sketch corpus overlap in its EXACT regime (both key sets
    // are below k = 4096, where an update sketch stores every hash —
    // the q147 convention for the set-operation axis): estimated
    // |A|/|B|/|A∩B|/|A∪B|/Jaccard between the customers-with-orders
    // set and the full customer roster must equal the exact values.
    // A lossy union, a wrong intersection, or hash disagreement
    // between the two sides' scans is a red row. Both sides are
    // bounded to custkey <= 3000 IN-QUERY so the exact-regime premise
    // (< k = 4096 distinct keys per side) is self-enforcing at any
    // scale factor, not an accident of the sf0.01 fixture.
    Q("q165_theta_overlap", { t =>
        Sketches.thetaOverlap(
          t.orders.filter(col("o_custkey") <= 3000),
          t.customer.filter(col("c_custkey") <= 3000),
          col("o_custkey"), col("c_custkey"))
      },
      Some("""WITH oa AS (SELECT o_custkey FROM orders WHERE o_custkey <= 3000),
        |     cb AS (SELECT c_custkey FROM customer WHERE c_custkey <= 3000)
        |SELECT
        |  (SELECT CAST(COUNT(DISTINCT o_custkey) AS DOUBLE)
        |   FROM oa) AS n_a,
        |  (SELECT CAST(COUNT(DISTINCT c_custkey) AS DOUBLE)
        |   FROM cb) AS n_b,
        |  (SELECT CAST(COUNT(*) AS DOUBLE) FROM (
        |     SELECT DISTINCT o_custkey FROM oa
        |     INTERSECT SELECT c_custkey FROM cb)) AS n_intersection,
        |  (SELECT CAST(COUNT(*) AS DOUBLE) FROM (
        |     SELECT DISTINCT o_custkey FROM oa
        |     UNION SELECT c_custkey FROM cb)) AS n_union,
        |  (SELECT CAST(COUNT(*) AS DOUBLE) FROM (
        |     SELECT DISTINCT o_custkey FROM oa
        |     EXCEPT SELECT c_custkey FROM cb)) AS n_a_not_b,
        |  round(
        |    (SELECT CAST(COUNT(*) AS DOUBLE) FROM (
        |       SELECT DISTINCT o_custkey FROM oa
        |       INTERSECT SELECT c_custkey FROM cb))
        |    / (SELECT COUNT(*) FROM (
        |       SELECT DISTINCT o_custkey FROM oa
        |       UNION SELECT c_custkey FROM cb)), 6) AS jaccard"""
        .stripMargin)),

    // Equi-depth histogram: document lengths quantile-binned into 4
    // equal-mass buckets (exact interpolated edges; bin = #edges below
    // the value, so edge ties resolve identically in both engines).
    Q("q109_equidepth_hist",
      t => Stats.equidepthHistogram(t.documents, col("n_chars"), 4),
      Some("""WITH e AS (
        |  SELECT quantile_cont(n_chars, 0.25) AS e1,
        |         quantile_cont(n_chars, 0.50) AS e2,
        |         quantile_cont(n_chars, 0.75) AS e3
        |  FROM documents
        |)
        |SELECT CAST(n_chars > e1 AS INT) + CAST(n_chars > e2 AS INT)
        |     + CAST(n_chars > e3 AS INT) AS bin,
        |  COUNT(*) AS n
        |FROM documents, e GROUP BY 1""".stripMargin)),

    // Percentile-band trimming: per-source 10th/90th percentile bounds
    // of document length plus how many documents survive the trim —
    // the outlier-removal pre-pass of corpus quality filtering. Exact
    // linear-interpolation percentiles on both engines.
    Q("q102_quantile_trim", { t =>
        val docs = graft.core.CacheScope.persist(
          t.documents.select(col("doc_id"), col("source"),
                             col("n_chars")))
        val bounds = Stats.quantileBounds(docs, col("source"),
                                          col("n_chars"), 0.1, 0.9)
        docs.join(broadcast(bounds), col("source") === col("g"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_total"),
               sum((col("n_chars") >= col("p_lo") &&
                    col("n_chars") <= col("p_hi")).cast("long"))
                 .as("n_kept"),
               round(first(col("p_lo")), 6).as("p_lo"),
               round(first(col("p_hi")), 6).as("p_hi"))
      },
      Some("""WITH b AS (
        |  SELECT source AS g,
        |    quantile_cont(n_chars, 0.1) AS p_lo,
        |    quantile_cont(n_chars, 0.9) AS p_hi
        |  FROM documents GROUP BY 1
        |)
        |SELECT source, COUNT(*) AS n_total,
        |  CAST(SUM(CASE WHEN n_chars >= p_lo AND n_chars <= p_hi
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  round(ANY_VALUE(p_lo), 6) AS p_lo,
        |  round(ANY_VALUE(p_hi), 6) AS p_hi
        |FROM documents JOIN b ON source = g
        |GROUP BY source""".stripMargin)),

    // Target-mixture resampling: resample the corpus toward a target
    // language mix of a 60k-token budget. Rates derive from observed
    // token mass in-query on both engines; en is downsampled hard,
    // zh/de keep everything (rate capped at 1), so the gate exercises
    // both regimes. The kept rows themselves are compared.
    Q("q133_mixture_sample", { t =>
        Stats.mixtureSample(
          t.documents.select(col("doc_id"), col("lang"), col("n_chars")),
          col("doc_id"), col("lang"), col("n_chars"),
          targetShares = Map("en" -> 0.2, "zh" -> 0.4, "de" -> 0.4),
          budgetTokens = 60000L)
          .select("doc_id", "lang", "n_chars", "thr")
      },
      Some("""WITH obs AS (
        |  SELECT lang AS g, CAST(SUM(n_chars) AS BIGINT) AS tok
        |  FROM documents GROUP BY 1
        |), rates AS (
        |  SELECT g,
        |    CAST(FLOOR(least(1.0,
        |      (CASE g WHEN 'en' THEN 0.2 WHEN 'zh' THEN 0.4
        |              WHEN 'de' THEN 0.4 ELSE 0.0 END) * 60000 / tok)
        |      * 4294967296.0) AS BIGINT) AS thr
        |  FROM obs
        |)
        |SELECT doc_id, lang, n_chars, thr
        |FROM documents JOIN rates ON lang = g
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |        ::BIGINT < thr""".stripMargin)),

    // Water-filling token-budget plan: temperature-reweighted target
    // weights (w ∝ avail^0.5), a 2-epoch upsampling cap, and residual
    // budget re-spread over unsaturated domains — the mixture PLANNER
    // behind q133's per-domain rates. 40k budget over the lang/source
    // grid leaves a healthy mix of saturated and water-filled domains.
    Q("q181_token_budget_plan", { t =>
        Stats.tokenBudgetPlan(
          t.documents.select(
            concat(col("lang"), lit("/"), col("source")).as("d"),
            size(split(col("text"), "\\s+")).as("ntok")),
          col("d"), col("ntok"),
          budgetTokens = 40000.0, invTemperature = 0.5, maxEpochs = 2.0)
      },
      Some("""WITH dom AS (
        |  SELECT lang || '/' || source AS domain,
        |    CAST(SUM(len(string_split_regex(text, '\s+'))) AS BIGINT)
        |      AS avail
        |  FROM documents GROUP BY 1
        |), w AS (
        |  SELECT domain, avail,
        |    CAST(round(power(CAST(avail AS DOUBLE), 0.5), 6)
        |         AS DECIMAL(28,6)) AS sw
        |  FROM dom
        |), tot AS (SELECT SUM(sw) AS W FROM w
        |), r AS (
        |  SELECT domain, avail, sw, W,
        |    CAST(sw AS DOUBLE) / CAST(W AS DOUBLE) AS wt,
        |    2.0 * avail AS cap,
        |    (2.0 * avail) / (CAST(sw AS DOUBLE) / CAST(W AS DOUBLE))
        |      AS sat_level
        |  FROM w, tot
        |), s AS (
        |  SELECT *,
        |    ROW_NUMBER() OVER (ORDER BY sat_level, domain) AS rn,
        |    SUM(CAST(cap AS DECIMAL(28,6)))
        |      OVER (ORDER BY sat_level, domain) AS cumcap,
        |    SUM(sw) OVER (ORDER BY sat_level, domain) AS cumsw
        |  FROM r
        |), lam AS (
        |  SELECT rn, sat_level,
        |    CASE WHEN CAST(W - cumsw AS DOUBLE) > 0.0
        |         THEN (40000.0 - CAST(cumcap AS DOUBLE))
        |              * CAST(W AS DOUBLE) / CAST(W - cumsw AS DOUBLE)
        |         ELSE -1.0 END AS lam
        |  FROM s
        |), lev AS (
        |  SELECT COALESCE((SELECT lam FROM lam WHERE sat_level <= lam
        |                   ORDER BY rn DESC LIMIT 1),
        |                  40000.0) AS lamstar
        |), alloc AS (
        |  SELECT domain, avail, wt, cap,
        |    CAST(round(least(cap, wt * lamstar), 6) AS DECIMAL(28,6))
        |      AS a6
        |  FROM r, lev
        |), ta AS (SELECT SUM(a6) AS tot_a FROM alloc)
        |SELECT domain, avail,
        |  round(wt, 6) AS target_wt,
        |  round(CAST(a6 AS DOUBLE), 6) AS alloc_tokens,
        |  round(CAST(a6 AS DOUBLE) / avail, 6) AS epochs,
        |  round(CAST(a6 AS DOUBLE) / CAST(tot_a AS DOUBLE), 6)
        |    AS realized_wt
        |FROM alloc, ta""".stripMargin)),

    // The water-filling plan APPLIED: epoch-aware mixture
    // materialization (q181's plan drives the repeat-factor upsampler
    // mixtureSample declares out of scope) — ⌊epochs⌋ full copies per
    // document plus a deterministic md5 fractional draw, documents
    // kept whole. Row-level gate: the exact survivor set, repeat
    // counts, and rep indices must match the oracle's replay of the
    // same plan and the same draws.
    Q("q189_mixture_materialize", { t =>
        val docs = t.documents.select(
          col("doc_id"),
          concat(col("lang"), lit("/"), col("source")).as("d"),
          size(split(col("text"), "\\s+")).as("ntok"))
        val plan = Stats.tokenBudgetPlan(
          docs, col("d"), col("ntok"),
          budgetTokens = 40000.0, invTemperature = 0.5,
          maxEpochs = 2.0)
        Stats.materializeMixturePlan(docs, col("doc_id"), col("d"),
                                     col("ntok"), plan, seed = 7L)
          .withColumnRenamed("domain", "d")
      },
      Some("""WITH dom AS (
        |  SELECT lang || '/' || source AS domain,
        |    CAST(SUM(len(string_split_regex(text, '\s+'))) AS BIGINT)
        |      AS avail
        |  FROM documents GROUP BY 1
        |), w AS (
        |  SELECT domain, avail,
        |    CAST(round(power(CAST(avail AS DOUBLE), 0.5), 6)
        |         AS DECIMAL(28,6)) AS sw
        |  FROM dom
        |), tot AS (SELECT SUM(sw) AS W FROM w
        |), r AS (
        |  SELECT domain, avail, sw, W,
        |    CAST(sw AS DOUBLE) / CAST(W AS DOUBLE) AS wt,
        |    2.0 * avail AS cap,
        |    (2.0 * avail) / (CAST(sw AS DOUBLE) / CAST(W AS DOUBLE))
        |      AS sat_level
        |  FROM w, tot
        |), s AS (
        |  SELECT *,
        |    ROW_NUMBER() OVER (ORDER BY sat_level, domain) AS rn,
        |    SUM(CAST(cap AS DECIMAL(28,6)))
        |      OVER (ORDER BY sat_level, domain) AS cumcap,
        |    SUM(sw) OVER (ORDER BY sat_level, domain) AS cumsw
        |  FROM r
        |), lam AS (
        |  SELECT rn, sat_level,
        |    CASE WHEN CAST(W - cumsw AS DOUBLE) > 0.0
        |         THEN (40000.0 - CAST(cumcap AS DOUBLE))
        |              * CAST(W AS DOUBLE) / CAST(W - cumsw AS DOUBLE)
        |         ELSE -1.0 END AS lam
        |  FROM s
        |), lev AS (
        |  SELECT COALESCE((SELECT lam FROM lam WHERE sat_level <= lam
        |                   ORDER BY rn DESC LIMIT 1),
        |                  40000.0) AS lamstar
        |), alloc AS (
        |  SELECT domain, avail,
        |    CAST(round(least(cap, wt * lamstar), 6) AS DECIMAL(28,6))
        |      AS a6
        |  FROM r, lev
        |), plan AS (
        |  SELECT domain,
        |    round(CAST(a6 AS DOUBLE) / avail, 6) AS epochs
        |  FROM alloc
        |), d2 AS (
        |  SELECT doc_id, lang || '/' || source AS domain,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents
        |), j AS (
        |  SELECT d2.doc_id, d2.domain, d2.n_tokens,
        |    CAST(FLOOR(epochs) AS BIGINT) +
        |    CASE WHEN (('0x' || substr(md5('7:' ||
        |                CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
        |               + 0.5) / 4503599627370496.0
        |              < epochs - FLOOR(epochs)
        |         THEN 1 ELSE 0 END AS n_rep
        |  FROM d2 JOIN plan USING (domain)
        |)
        |SELECT doc_id, domain AS d, n_tokens, n_rep,
        |  CAST(r AS BIGINT) AS rep
        |FROM j, UNNEST(generate_series(1, n_rep)) t(r)
        |WHERE n_rep >= 1""".stripMargin)),

    // Robust MAD outlier detection per source (Hampel's rule at k=3):
    // median and MAD are exact interpolated percentiles on both
    // engines, the comparison is pure IEEE arithmetic — per-source
    // outlier counts compare exactly.
    // The natural corpus has no length outliers at k=3 (uniform-ish
    // synthetic lengths), which would make the gate pass on 0 = 0 —
    // so 20x-length rows are PLANTED (doc_id < 20, one per source)
    // and must be flagged, while the robust median/MAD must barely
    // move (the 50% breakdown point in action).
    Q("q132_mad_outliers", { t =>
        val base = t.documents.select(col("doc_id"), col("source"),
                                      col("n_chars"))
        val planted = base.filter(col("doc_id") < 20)
          .select((col("doc_id") + 7000L).as("doc_id"), col("source"),
                  (col("n_chars") * 20).as("n_chars"))
        Stats.madOutliers(base.unionByName(planted),
                          col("source"), col("n_chars"), k = 3.0)
          .groupBy("source")
          .agg(count(lit(1)).as("n"),
               sum("is_outlier").as("n_outliers"),
               round(first("med"), 6).as("med"),
               round(first("mad"), 6).as("mad"))
      },
      Some("""WITH corpus AS (
        |  SELECT doc_id, source, n_chars FROM documents
        |  UNION ALL
        |  SELECT doc_id + 7000, source, n_chars * 20 FROM documents
        |  WHERE doc_id < 20
        |), med AS (
        |  SELECT source AS g, quantile_cont(n_chars, 0.5) AS med
        |  FROM corpus GROUP BY 1
        |), mad AS (
        |  SELECT source AS g, med,
        |    quantile_cont(abs(n_chars - med), 0.5) AS mad
        |  FROM corpus JOIN med ON source = med.g
        |  GROUP BY source, med
        |)
        |SELECT source, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN abs(n_chars - med) > 3 * 1.4826 * mad
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  round(ANY_VALUE(med), 6) AS med,
        |  round(ANY_VALUE(mad), 6) AS mad
        |FROM corpus JOIN mad ON source = mad.g
        |GROUP BY source""".stripMargin)),

    // Percentile-rank normalization of a corpus-sized score axis —
    // pct = (rank-1)/(N-1) over a TOTAL order (score, id) — through
    // the windowless two-pass global rank (core.Ranking): the
    // feature-normalization step that an unpartitioned PERCENT_RANK
    // window would funnel through one reducer. Exact integers divided
    // once: bit-identical across engines without rounding.
    Q("q129_percentile_rank", { t =>
        val docs = t.documents.select(col("doc_id"), col("n_chars"))
        val n = docs.agg(count(lit(1)).as("n_docs"))
        graft.core.Ranking.withGlobalRank(
            docs, Seq(col("n_chars"), col("doc_id")), "rn")
          .crossJoin(broadcast(n))
          .select(col("doc_id"), col("n_chars"),
                  ((col("rn") - 1).cast("double") / (col("n_docs") - 1))
                    .as("pct"))
      },
      Some("""SELECT doc_id, n_chars,
        |  CAST(ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) - 1
        |    AS DOUBLE) / (COUNT(*) OVER () - 1) AS pct
        |FROM documents""".stripMargin)),

    // Deterministic two-level epoch shuffle (streaming-loader block
    // shuffle): 64-doc source-order blocks, md5-seeded block order and
    // intra-block order, positions via the two-pass prefix sum over
    // the blocks frame. Pure integer + md5 arithmetic — bit-identical
    // across engines, no rounding anywhere.
    Q("q192_epoch_shuffle",
      t => Stats.epochBlockShuffle(t.documents, col("doc_id"),
                                   blockSize = 64, seed = 7L),
      Some("""WITH base AS (
        |  SELECT doc_id,
        |    ROW_NUMBER() OVER (ORDER BY doc_id) AS sr
        |  FROM documents
        |), b AS (
        |  SELECT doc_id,
        |    CAST(FLOOR((sr - 1) / 64) AS BIGINT) AS block_id
        |  FROM base
        |), ir AS (
        |  SELECT doc_id, block_id,
        |    ROW_NUMBER() OVER (PARTITION BY block_id
        |      ORDER BY md5('7:i:' || CAST(doc_id AS VARCHAR)), doc_id)
        |      AS intra
        |  FROM b
        |), bl AS (
        |  SELECT block_id, COUNT(*) AS n,
        |    md5('7:b:' || CAST(block_id AS VARCHAR)) AS bkey
        |  FROM b GROUP BY 1
        |), off AS (
        |  SELECT block_id,
        |    CAST(ROW_NUMBER() OVER (ORDER BY bkey, block_id) AS BIGINT)
        |      AS block_ord,
        |    SUM(n) OVER (ORDER BY bkey, block_id
        |                 ROWS UNBOUNDED PRECEDING) - n AS off
        |  FROM bl
        |)
        |SELECT doc_id, block_id, block_ord,
        |  CAST(off + intra AS BIGINT) AS epoch_pos
        |FROM ir JOIN off USING (block_id)""".stripMargin)),

    // k-anonymity enforcement by suppression: customers whose
    // (nationkey, mktsegment) quasi-identifier combination has fewer
    // than 8 members are dropped (at sf0.01 the group sizes span
    // 5..21, so the k = 8 cut genuinely splits the data); the gate
    // compares the surviving rows verbatim.
    Q("q195_k_anonymity",
      t => Stats.suppressBelowK(
          t.customer.select(col("c_custkey"), col("c_nationkey"),
                            col("c_mktsegment")),
          Seq("c_nationkey", "c_mktsegment"), k = 8)
        .select("c_custkey", "c_nationkey", "c_mktsegment"),
      Some("""WITH g AS (
        |  SELECT c_nationkey, c_mktsegment FROM customer
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 8
        |)
        |SELECT c_custkey, c_nationkey, c_mktsegment
        |FROM customer JOIN g USING (c_nationkey, c_mktsegment)"""
        .stripMargin))
  )
}
