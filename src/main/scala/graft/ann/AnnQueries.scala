package graft.ann

import org.apache.spark.sql.functions._
import graft.Q

/** Oracle-checked queries for similarity search over the embedding
  * column: brute-force cosine top-k and the LSH-bucketed scale path.
  */
object AnnQueries {

  /** Oracle CTEs: embeddings exploded to (vec_id, d, v) + norms. */
  private val evCte =
    """WITH ev AS (
      |  SELECT vec_id, CAST(i - 1 AS BIGINT) AS d,
      |    CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
      |  FROM embeddings,
      |    UNNEST(generate_series(1, len(embedding))) t(i)
      |), norms AS (
      |  SELECT vec_id, SUM(v * v) AS nn FROM ev GROUP BY 1
      |)""".stripMargin

  def queries: Seq[Q] = Seq(

    // Brute-force cosine top-5 for query vectors (vec_id % 20 == 0).
    Q("q58_ann_brute", { t =>
        val emb = t.embeddings.select(col("vec_id").as("id"),
                                      col("embedding"))
        Ann.bruteForceCosineTopK(
          emb.filter(col("id") % 20 === 0), emb, 5)
      },
      Some(evCte + """,
        |dots AS (
        |  SELECT a.vec_id AS qid, b.vec_id AS vid, SUM(a.v * b.v) AS dot
        |  FROM ev a JOIN ev b ON a.d = b.d
        |    AND a.vec_id % 20 = 0 AND a.vec_id <> b.vec_id
        |  GROUP BY 1, 2
        |), cos AS (
        |  SELECT qid, vid,
        |    round(dot / sqrt(na.nn * nb.nn), 6) AS cos
        |  FROM dots
        |  JOIN norms na ON qid = na.vec_id
        |  JOIN norms nb ON vid = nb.vec_id
        |)
        |SELECT qid, vid, cos, rank FROM (
        |  SELECT qid, vid, cos,
        |    ROW_NUMBER() OVER (PARTITION BY qid
        |      ORDER BY cos DESC, vid) AS rank
        |  FROM cos) r
        |WHERE rank <= 5""".stripMargin)),

    // LSH-bucketed ANN: md5-seeded ±1 hyperplane signatures (8 planes),
    // exact cosine within buckets, top-3 per query.
    Q("q59_ann_lsh", { t =>
        val emb = t.embeddings.select(col("vec_id").as("id"),
                                      col("embedding"))
        val planes = Ann.planeTable(t.spark, 8, 64)
        Ann.lshCosineTopK(emb.filter(col("id") % 20 === 0), emb, planes, 3)
      },
      Some(evCte + """,
        |pl AS (
        |  SELECT p, d,
        |    ((('0x' || substr(md5(p || ':' || d), 1, 15))::BIGINT % 2) * 2
        |     - 1) AS c
        |  FROM UNNEST(generate_series(0, 7)) pp(p),
        |       UNNEST(generate_series(0, 63)) dd(d)
        |), proj AS (
        |  SELECT vec_id, p, SUM(c * v) AS proj
        |  FROM ev JOIN pl USING (d) GROUP BY 1, 2
        |), bk AS (
        |  SELECT vec_id,
        |    CAST(SUM(CASE WHEN proj > 0
        |         THEN (CAST(1 AS BIGINT) << CAST(p AS INT))
        |         ELSE 0 END) AS BIGINT) AS bucket
        |  FROM proj GROUP BY 1
        |), cand AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS vid
        |  FROM bk q JOIN bk c ON q.bucket = c.bucket
        |    AND q.vec_id % 20 = 0 AND q.vec_id <> c.vec_id
        |), dots AS (
        |  SELECT qid, vid, SUM(a.v * b.v) AS dot
        |  FROM cand
        |  JOIN ev a ON a.vec_id = qid
        |  JOIN ev b ON b.vec_id = vid AND a.d = b.d
        |  GROUP BY 1, 2
        |), cos AS (
        |  SELECT qid, vid, round(dot / sqrt(na.nn * nb.nn), 6) AS cos
        |  FROM dots
        |  JOIN norms na ON qid = na.vec_id
        |  JOIN norms nb ON vid = nb.vec_id
        |)
        |SELECT qid, vid, cos, rank FROM (
        |  SELECT qid, vid, cos,
        |    ROW_NUMBER() OVER (PARTITION BY qid
        |      ORDER BY cos DESC, vid) AS rank
        |  FROM cos) r
        |WHERE rank <= 3""".stripMargin)),

    // Multi-probe LSH ANN: queries probe their own bucket plus the 8
    // single-bit-flip buckets (full recall across one hyperplane),
    // exact cosine on candidates, top-3 per query — q59's recall fix.
    Q("q98_ann_lsh_multiprobe", { t =>
        val emb = t.embeddings.select(col("vec_id").as("id"),
                                      col("embedding"))
        val planes = Ann.planeTable(t.spark, 8, 64)
        Ann.lshCosineTopKMultiProbe(emb.filter(col("id") % 20 === 0),
                                    emb, planes, nPlanes = 8, k = 3)
      },
      Some(evCte + """,
        |pl AS (
        |  SELECT p, d,
        |    ((('0x' || substr(md5(p || ':' || d), 1, 15))::BIGINT % 2) * 2
        |     - 1) AS c
        |  FROM UNNEST(generate_series(0, 7)) pp(p),
        |       UNNEST(generate_series(0, 63)) dd(d)
        |), proj AS (
        |  SELECT vec_id, p, SUM(c * v) AS proj
        |  FROM ev JOIN pl USING (d) GROUP BY 1, 2
        |), bk AS (
        |  SELECT vec_id,
        |    CAST(SUM(CASE WHEN proj > 0
        |         THEN (CAST(1 AS BIGINT) << CAST(p AS INT))
        |         ELSE 0 END) AS BIGINT) AS bucket
        |  FROM proj GROUP BY 1
        |), flips AS (
        |  SELECT 0::BIGINT AS flip
        |  UNION ALL
        |  SELECT CAST(1 AS BIGINT) << CAST(p AS INT)
        |  FROM UNNEST(generate_series(0, 7)) pp(p)
        |), qb AS (
        |  SELECT DISTINCT vec_id AS qid, xor(bucket, flip) AS bucket
        |  FROM bk CROSS JOIN flips WHERE vec_id % 20 = 0
        |), cand AS (
        |  SELECT DISTINCT qb.qid, c.vec_id AS vid
        |  FROM qb JOIN bk c ON qb.bucket = c.bucket
        |    AND qb.qid <> c.vec_id
        |), dots AS (
        |  SELECT qid, vid, SUM(a.v * b.v) AS dot
        |  FROM cand
        |  JOIN ev a ON a.vec_id = qid
        |  JOIN ev b ON b.vec_id = vid AND a.d = b.d
        |  GROUP BY 1, 2
        |), cos AS (
        |  SELECT qid, vid, round(dot / sqrt(na.nn * nb.nn), 6) AS cos
        |  FROM dots
        |  JOIN norms na ON qid = na.vec_id
        |  JOIN norms nb ON vid = nb.vec_id
        |)
        |SELECT qid, vid, cos, rank FROM (
        |  SELECT qid, vid, cos,
        |    ROW_NUMBER() OVER (PARTITION BY qid
        |      ORDER BY cos DESC, vid) AS rank
        |  FROM cos) r
        |WHERE rank <= 3""".stripMargin)),

    // Embedding-cosine near-duplicate pairs: all-pairs within LSH
    // buckets (8 md5-seeded planes), kept at cosine >= 0.3 — the
    // embedding leg of the dedup suite as a first-class query. The
    // synthetic embeddings are near-orthogonal (max pairwise cosine
    // ~0.49), so 0.3 is the "near-dup" regime of this corpus and the
    // gate checks real survivors rather than an empty set.
    Q("q90_embedding_neardup", { t =>
        val emb = t.embeddings.select(col("vec_id").as("id"),
                                      col("embedding"))
        val planes = Ann.planeTable(t.spark, 8, 64)
        Ann.cosineNearDupPairs(emb, planes, 0.3)
      },
      Some(evCte + """,
        |pl AS (
        |  SELECT p, d,
        |    ((('0x' || substr(md5(p || ':' || d), 1, 15))::BIGINT % 2) * 2
        |     - 1) AS c
        |  FROM UNNEST(generate_series(0, 7)) pp(p),
        |       UNNEST(generate_series(0, 63)) dd(d)
        |), proj AS (
        |  SELECT vec_id, p, SUM(c * v) AS proj
        |  FROM ev JOIN pl USING (d) GROUP BY 1, 2
        |), bk AS (
        |  SELECT vec_id,
        |    CAST(SUM(CASE WHEN proj > 0
        |         THEN (CAST(1 AS BIGINT) << CAST(p AS INT))
        |         ELSE 0 END) AS BIGINT) AS bucket
        |  FROM proj GROUP BY 1
        |), cand AS (
        |  SELECT x.vec_id AS a, y.vec_id AS b
        |  FROM bk x JOIN bk y ON x.bucket = y.bucket
        |    AND x.vec_id < y.vec_id
        |), dots AS (
        |  SELECT a, b, SUM(ea.v * eb.v) AS dot
        |  FROM cand
        |  JOIN ev ea ON ea.vec_id = a
        |  JOIN ev eb ON eb.vec_id = b AND ea.d = eb.d
        |  GROUP BY 1, 2
        |)
        |SELECT a, b, cos FROM (
        |  SELECT a, b, round(dot / sqrt(na.nn * nb.nn), 6) AS cos
        |  FROM dots
        |  JOIN norms na ON a = na.vec_id
        |  JOIN norms nb ON b = nb.vec_id) s
        |WHERE cos >= 0.3""".stripMargin)),

    // IVF ANN: 16 hash-sampled centroids, corpus indexed by nearest
    // cell, queries probe their 2 nearest cells, exact cosine on the
    // probed members only, top-3 per query.
    Q("q88_ann_ivf", { t =>
        val emb = t.embeddings.select(col("vec_id").as("id"),
                                      col("embedding"))
        Ann.ivfCosineTopK(emb.filter(col("id") % 20 === 0), emb,
                          nCells = 16, nProbe = 2, k = 3)
      },
      Some(evCte + """,
        |cent AS (
        |  SELECT vec_id AS cid FROM embeddings
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
        |), cdots AS (
        |  SELECT a.vec_id AS vid, c.cid, SUM(a.v * b.v) AS dot
        |  FROM ev a
        |  CROSS JOIN cent c
        |  JOIN ev b ON b.vec_id = c.cid AND a.d = b.d
        |  GROUP BY 1, 2
        |), ccos AS (
        |  SELECT vid, cid,
        |    round(dot / sqrt(na.nn * nb.nn), 6) AS ccos
        |  FROM cdots
        |  JOIN norms na ON vid = na.vec_id
        |  JOIN norms nb ON cid = nb.vec_id
        |), assign AS (
        |  SELECT vid, cell FROM (
        |    SELECT vid, cid AS cell,
        |      ROW_NUMBER() OVER (PARTITION BY vid
        |        ORDER BY ccos DESC, cid) AS rn
        |    FROM ccos) a
        |  WHERE rn = 1
        |), probe AS (
        |  SELECT qid, cell FROM (
        |    SELECT vid AS qid, cid AS cell,
        |      ROW_NUMBER() OVER (PARTITION BY vid
        |        ORDER BY ccos DESC, cid) AS rn
        |    FROM ccos WHERE vid % 20 = 0) p
        |  WHERE rn <= 2
        |), cand AS (
        |  SELECT DISTINCT probe.qid, assign.vid
        |  FROM probe JOIN assign USING (cell)
        |  WHERE assign.vid <> probe.qid
        |), dots AS (
        |  SELECT qid, cand.vid AS vid, SUM(a.v * b.v) AS dot
        |  FROM cand
        |  JOIN ev a ON a.vec_id = cand.qid
        |  JOIN ev b ON b.vec_id = cand.vid AND a.d = b.d
        |  GROUP BY 1, 2
        |), cos AS (
        |  SELECT qid, vid, round(dot / sqrt(na.nn * nb.nn), 6) AS cos
        |  FROM dots
        |  JOIN norms na ON qid = na.vec_id
        |  JOIN norms nb ON vid = nb.vec_id
        |)
        |SELECT qid, vid, cos, rank FROM (
        |  SELECT qid, vid, cos,
        |    ROW_NUMBER() OVER (PARTITION BY qid
        |      ORDER BY cos DESC, vid) AS rank
        |  FROM cos) r
        |WHERE rank <= 3""".stripMargin)),

    // Symmetric int8 quantization of the embedding table: per-vector
    // scale (max|x|/127, exact float→double arithmetic — no sums) and
    // the quantized bytes. round() is half-away-from-zero in both
    // engines, so every byte compares exactly. The registered result
    // explodes the byte array to (id, scale, d, qd) scalar rows — the
    // oracle comparator sorts rows with pandas and cannot hash array
    // cells (the round-trip fixture keeps the array form); same shape
    // convention as q125.
    Q("q116_embedding_quantize",
      t => Ann.quantizeInt8(t.embeddings, col("vec_id"),
                            col("embedding"))
        .select(col("id"), round(col("scale"), 9).as("scale"),
                posexplode(col("q")).as(Seq("d", "qd"))),
      Some("""WITH m AS (
        |  SELECT vec_id AS id, embedding,
        |    list_max(list_transform(embedding,
        |      x -> abs(CAST(x AS DOUBLE)))) AS ma
        |  FROM embeddings
        |)
        |SELECT id, round(ma / 127.0, 9) AS scale,
        |  CAST(i - 1 AS INT) AS d,
        |  CAST(CASE WHEN ma = 0 THEN 0
        |       ELSE round(CAST(embedding[CAST(i AS INT)] AS DOUBLE)
        |                  / (ma / 127.0))
        |       END AS TINYINT) AS qd
        |FROM m, UNNEST(generate_series(1, len(embedding))) t(i)""".stripMargin)),

    // Johnson-Lindenstrauss random projection 64 -> 16 dims with the
    // deterministic md5-parity ±1 matrix: the dimensionality cut
    // before ANN indexing, as a narrow per-row map. Per-term round-6 +
    // exact decimal accumulation makes the sums order-independent, so
    // every projected coordinate compares bit-for-bit.
    Q("q125_random_projection",
      t => Ann.randomProjection(
          t.embeddings.select(col("vec_id").as("id"), col("embedding")),
          col("id"), col("embedding"), outDim = 16),
      Some("""WITH ev AS (
        |  SELECT vec_id AS id, CAST(i - 1 AS BIGINT) AS d,
        |    CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
        |  FROM embeddings,
        |    UNNEST(generate_series(1, len(embedding))) t(i)
        |), terms AS (
        |  SELECT id, k,
        |    CAST(round(v * (1 - 2 * (('0x' || substr(md5(
        |      CAST(d AS VARCHAR) || '_' || CAST(k AS VARCHAR)), 1, 1))
        |      ::BIGINT % 2)) / sqrt(16.0), 6) AS DECIMAL(18,6)) AS term
        |  FROM ev, UNNEST(generate_series(0, 15)) s(k)
        |)
        |SELECT id, CAST(k AS INT) AS k,
        |  CAST(SUM(term) AS DOUBLE) AS v
        |FROM terms GROUP BY 1, 2""".stripMargin)),

    // One distributed k-means (Lloyd) centroid-update step over the
    // embedding corpus: assign every vector to its nearest of 16
    // hash-sampled centroids, then recompute each cell's per-dimension
    // mean. Oracle-gates the update numerics that previously only had
    // a fixture (Ann.ivfCentroidsLloyd) — cell sizes and means are
    // compared across engines (means rounded to 6, same discipline as
    // the q88 dot products).
    Q("q104_kmeans_update", { t =>
        val emb = t.embeddings.select(col("vec_id").as("id"),
                                      col("embedding"))
        val cents = Ann.ivfCentroids(emb, 16)
        val assign = Ann.ivfAssign(emb, cents, 1)
        assign.join(emb, "id")
          .select(col("cell"),
                  posexplode(col("embedding")).as(Seq("d", "v")))
          .groupBy(col("cell"), col("d").cast("long").as("d"))
          .agg(count(lit(1)).as("n"),
               round(avg(col("v").cast("double")), 6).as("mean_v"))
      },
      Some(evCte + """,
        |cent AS (
        |  SELECT vec_id AS cid FROM embeddings
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
        |), cdots AS (
        |  SELECT a.vec_id AS vid, c.cid, SUM(a.v * b.v) AS dot
        |  FROM ev a
        |  CROSS JOIN cent c
        |  JOIN ev b ON b.vec_id = c.cid AND a.d = b.d
        |  GROUP BY 1, 2
        |), ccos AS (
        |  SELECT vid, cid,
        |    round(dot / sqrt(na.nn * nb.nn), 6) AS ccos
        |  FROM cdots
        |  JOIN norms na ON vid = na.vec_id
        |  JOIN norms nb ON cid = nb.vec_id
        |), assign AS (
        |  SELECT vid, cell FROM (
        |    SELECT vid, cid AS cell,
        |      ROW_NUMBER() OVER (PARTITION BY vid
        |        ORDER BY ccos DESC, cid) AS rn
        |    FROM ccos) a
        |  WHERE rn = 1
        |)
        |SELECT assign.cell, ev.d, COUNT(*) AS n,
        |  round(AVG(v), 6) AS mean_v
        |FROM assign JOIN ev ON ev.vec_id = assign.vid
        |GROUP BY 1, 2""".stripMargin)),

    // ANN acceptance metric: per-query recall@3 of single-probe LSH
    // (q59's index) against the exact brute-force top-3. The exact
    // side defines the query universe, so queries the index lost
    // entirely appear with n_hits = 0 rather than vanishing. The
    // oracle recomputes BOTH retrievals and the overlap independently.
    Q("q158_ann_recall", { t =>
        val emb = t.embeddings.select(col("vec_id").as("id"),
                                      col("embedding"))
        val queries = emb.filter(col("id") % 20 === 0)
        val planes = Ann.planeTable(t.spark, 8, 64)
        val approx = Ann.lshCosineTopK(queries, emb, planes, 3)
        val exact = Ann.bruteForceCosineTopK(queries, emb, 3)
        Ann.recallAtK(approx, exact)
      },
      Some(evCte + """,
        |pl AS (
        |  SELECT p, d,
        |    ((('0x' || substr(md5(p || ':' || d), 1, 15))::BIGINT % 2) * 2
        |     - 1) AS c
        |  FROM UNNEST(generate_series(0, 7)) pp(p),
        |       UNNEST(generate_series(0, 63)) dd(d)
        |), proj AS (
        |  SELECT vec_id, p, SUM(c * v) AS proj
        |  FROM ev JOIN pl USING (d) GROUP BY 1, 2
        |), bk AS (
        |  SELECT vec_id,
        |    CAST(SUM(CASE WHEN proj > 0
        |         THEN (CAST(1 AS BIGINT) << CAST(p AS INT))
        |         ELSE 0 END) AS BIGINT) AS bucket
        |  FROM proj GROUP BY 1
        |), cand AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS vid
        |  FROM bk q JOIN bk c ON q.bucket = c.bucket
        |    AND q.vec_id % 20 = 0 AND q.vec_id <> c.vec_id
        |), ldots AS (
        |  SELECT qid, vid, SUM(a.v * b.v) AS dot
        |  FROM cand
        |  JOIN ev a ON a.vec_id = qid
        |  JOIN ev b ON b.vec_id = vid AND a.d = b.d
        |  GROUP BY 1, 2
        |), lcos AS (
        |  SELECT qid, vid, round(dot / sqrt(na.nn * nb.nn), 6) AS cos
        |  FROM ldots
        |  JOIN norms na ON qid = na.vec_id
        |  JOIN norms nb ON vid = nb.vec_id
        |), approx AS (
        |  SELECT qid, vid FROM (
        |    SELECT qid, vid,
        |      ROW_NUMBER() OVER (PARTITION BY qid
        |        ORDER BY cos DESC, vid) AS rank
        |    FROM lcos) r
        |  WHERE rank <= 3
        |), bdots AS (
        |  SELECT a.vec_id AS qid, b.vec_id AS vid, SUM(a.v * b.v) AS dot
        |  FROM ev a JOIN ev b ON a.d = b.d
        |    AND a.vec_id % 20 = 0 AND a.vec_id <> b.vec_id
        |  GROUP BY 1, 2
        |), bcos AS (
        |  SELECT qid, vid, round(dot / sqrt(na.nn * nb.nn), 6) AS cos
        |  FROM bdots
        |  JOIN norms na ON qid = na.vec_id
        |  JOIN norms nb ON vid = nb.vec_id
        |), exact AS (
        |  SELECT qid, vid FROM (
        |    SELECT qid, vid,
        |      ROW_NUMBER() OVER (PARTITION BY qid
        |        ORDER BY cos DESC, vid) AS rank
        |    FROM bcos) r
        |  WHERE rank <= 3
        |)
        |SELECT e.qid, COUNT(a.vid) AS n_hits,
        |  COUNT(x.vid) AS n_exact,
        |  CAST(COUNT(a.vid) AS DOUBLE) / COUNT(x.vid) AS recall
        |FROM (SELECT DISTINCT qid FROM exact) e
        |LEFT JOIN exact x ON x.qid = e.qid
        |LEFT JOIN approx a ON a.qid = x.qid AND a.vid = x.vid
        |GROUP BY e.qid""".stripMargin)),

    // Product quantization (Jégou et al. 2011): 64-dim embeddings →
    // 8 subspaces × 16 hash-sampled codes each; every (vector,
    // subspace) maps to its nearest-L2 code. Codes AND per-subspace
    // quantization error are gated strictly.
    Q("q160_pq_encode", { t =>
        val emb = t.embeddings.select(col("vec_id").as("id"),
                                      col("embedding"))
        val books = Ann.pqCodebooks(emb, m = 8, subDim = 8, nCodes = 16)
        Ann.pqEncode(emb, books, m = 8, subDim = 8)
      },
      Some(evCte + """,
        |sub AS (
        |  SELECT vec_id, CAST(d // 8 AS INT) AS s, d % 8 AS sd, v
        |  FROM ev
        |), ssq AS (
        |  SELECT vec_id, s, SUM(v * v) AS nn FROM sub GROUP BY 1, 2
        |), cent AS (
        |  SELECT vec_id AS cid FROM embeddings
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
        |), cdot AS (
        |  SELECT a.vec_id, a.s, c.cid, SUM(a.v * b.v) AS dot
        |  FROM sub a
        |  CROSS JOIN cent c
        |  JOIN sub b ON b.vec_id = c.cid AND b.s = a.s AND b.sd = a.sd
        |  GROUP BY 1, 2, 3
        |), dd AS (
        |  SELECT cdot.vec_id, cdot.s, cdot.cid,
        |    round(sa.nn + sc.nn - 2 * dot, 6) AS d2
        |  FROM cdot
        |  JOIN ssq sa ON sa.vec_id = cdot.vec_id AND sa.s = cdot.s
        |  JOIN ssq sc ON sc.vec_id = cdot.cid AND sc.s = cdot.s
        |)
        |SELECT vec_id AS id, s, cid AS code, d2 AS qerr FROM (
        |  SELECT vec_id, s, cid, d2,
        |    ROW_NUMBER() OVER (PARTITION BY vec_id, s
        |      ORDER BY d2, cid) AS rn
        |  FROM dd) t
        |WHERE rn = 1""".stripMargin)),

    // Asymmetric-distance (ADC) top-3 over the PQ codes: per query an
    // (s, code) → d² lookup table, approximate distance = sum of 8
    // table entries (exact-decimal accumulation). The full-corpus scan
    // here is deliberate — at 100 TB ADC scores IVF/LSH candidate
    // sets; the operator's win is 32× less data movement per scored
    // pair.
    Q("q161_pq_adc", { t =>
        val emb = t.embeddings.select(col("vec_id").as("id"),
                                      col("embedding"))
        val books = Ann.pqCodebooks(emb, m = 8, subDim = 8, nCodes = 16)
        val codes = Ann.pqEncode(emb, books, m = 8, subDim = 8)
        Ann.pqAdcTopK(emb.filter(col("id") % 20 === 0), codes, books,
                      m = 8, subDim = 8, k = 3)
      },
      Some(evCte + """,
        |sub AS (
        |  SELECT vec_id, CAST(d // 8 AS INT) AS s, d % 8 AS sd, v
        |  FROM ev
        |), ssq AS (
        |  SELECT vec_id, s, SUM(v * v) AS nn FROM sub GROUP BY 1, 2
        |), cent AS (
        |  SELECT vec_id AS cid FROM embeddings
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
        |), cdot AS (
        |  SELECT a.vec_id, a.s, c.cid, SUM(a.v * b.v) AS dot
        |  FROM sub a
        |  CROSS JOIN cent c
        |  JOIN sub b ON b.vec_id = c.cid AND b.s = a.s AND b.sd = a.sd
        |  GROUP BY 1, 2, 3
        |), dd AS (
        |  SELECT cdot.vec_id, cdot.s, cdot.cid,
        |    round(sa.nn + sc.nn - 2 * dot, 6) AS d2
        |  FROM cdot
        |  JOIN ssq sa ON sa.vec_id = cdot.vec_id AND sa.s = cdot.s
        |  JOIN ssq sc ON sc.vec_id = cdot.cid AND sc.s = cdot.s
        |), codes AS (
        |  SELECT vec_id, s, cid AS code FROM (
        |    SELECT vec_id, s, cid, d2,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id, s
        |        ORDER BY d2, cid) AS rn
        |    FROM dd) t
        |  WHERE rn = 1
        |), lut AS (
        |  SELECT vec_id AS qid, s, cid,
        |    CAST(d2 AS DECIMAL(18,6)) AS d2
        |  FROM dd WHERE vec_id % 20 = 0
        |), adc AS (
        |  SELECT l.qid, c.vec_id AS vid, SUM(l.d2) AS adist
        |  FROM lut l JOIN codes c ON c.s = l.s AND c.code = l.cid
        |  WHERE l.qid <> c.vec_id
        |  GROUP BY 1, 2
        |)
        |SELECT qid, vid, CAST(adist AS DOUBLE) AS adist, rank FROM (
        |  SELECT qid, vid, adist,
        |    ROW_NUMBER() OVER (PARTITION BY qid
        |      ORDER BY adist, vid) AS rank
        |  FROM adc) r
        |WHERE rank <= 3""".stripMargin)),

    // IVF-PQ, the production composition: IVF cells prune the corpus
    // to the 2/16 probed fraction, ADC prices only those candidates —
    // coarse quantizer for scope, product quantizer for distance. The
    // oracle composes the q88 cell CTEs with the q161 code/lut CTEs.
    Q("q162_ivf_pq", { t =>
        val emb = t.embeddings.select(col("vec_id").as("id"),
                                      col("embedding"))
        val queries = emb.filter(col("id") % 20 === 0)
        val cents = Ann.ivfCentroids(emb, 16)
        val books = Ann.pqCodebooks(emb, m = 8, subDim = 8, nCodes = 16)
        val codes = Ann.pqEncode(emb, books, m = 8, subDim = 8)
        Ann.ivfPqTopK(queries, emb, cents, codes, books, nProbe = 2,
                      m = 8, subDim = 8, k = 3)
      },
      Some(evCte + """,
        |cent AS (
        |  SELECT vec_id AS ccid FROM embeddings
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
        |), cdots AS (
        |  SELECT a.vec_id AS vid, c.ccid, SUM(a.v * b.v) AS dot
        |  FROM ev a
        |  CROSS JOIN cent c
        |  JOIN ev b ON b.vec_id = c.ccid AND a.d = b.d
        |  GROUP BY 1, 2
        |), ccos AS (
        |  SELECT vid, ccid,
        |    round(dot / sqrt(na.nn * nb.nn), 6) AS ccos
        |  FROM cdots
        |  JOIN norms na ON vid = na.vec_id
        |  JOIN norms nb ON ccid = nb.vec_id
        |), assign AS (
        |  SELECT vid, cell FROM (
        |    SELECT vid, ccid AS cell,
        |      ROW_NUMBER() OVER (PARTITION BY vid
        |        ORDER BY ccos DESC, ccid) AS rn
        |    FROM ccos) a
        |  WHERE rn = 1
        |), probe AS (
        |  SELECT qid, cell FROM (
        |    SELECT vid AS qid, ccid AS cell,
        |      ROW_NUMBER() OVER (PARTITION BY vid
        |        ORDER BY ccos DESC, ccid) AS rn
        |    FROM ccos WHERE vid % 20 = 0) p
        |  WHERE rn <= 2
        |), cand AS (
        |  SELECT DISTINCT probe.qid, assign.vid
        |  FROM probe JOIN assign USING (cell)
        |  WHERE assign.vid <> probe.qid
        |), sub AS (
        |  SELECT vec_id, CAST(d // 8 AS INT) AS s, d % 8 AS sd, v
        |  FROM ev
        |), ssq AS (
        |  SELECT vec_id, s, SUM(v * v) AS nn FROM sub GROUP BY 1, 2
        |), cdot AS (
        |  SELECT a.vec_id, a.s, c.ccid AS cid, SUM(a.v * b.v) AS dot
        |  FROM sub a
        |  CROSS JOIN cent c
        |  JOIN sub b ON b.vec_id = c.ccid AND b.s = a.s AND b.sd = a.sd
        |  GROUP BY 1, 2, 3
        |), dd AS (
        |  SELECT cdot.vec_id, cdot.s, cdot.cid,
        |    round(sa.nn + sc.nn - 2 * dot, 6) AS d2
        |  FROM cdot
        |  JOIN ssq sa ON sa.vec_id = cdot.vec_id AND sa.s = cdot.s
        |  JOIN ssq sc ON sc.vec_id = cdot.cid AND sc.s = cdot.s
        |), codes AS (
        |  SELECT vec_id, s, cid AS code FROM (
        |    SELECT vec_id, s, cid, d2,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id, s
        |        ORDER BY d2, cid) AS rn
        |    FROM dd) t
        |  WHERE rn = 1
        |), lut AS (
        |  SELECT vec_id AS qid, s, cid,
        |    CAST(d2 AS DECIMAL(18,6)) AS d2
        |  FROM dd WHERE vec_id % 20 = 0
        |), adc AS (
        |  SELECT cand.qid, cand.vid, SUM(l.d2) AS adist
        |  FROM cand
        |  JOIN codes c ON c.vec_id = cand.vid
        |  JOIN lut l ON l.qid = cand.qid AND l.s = c.s
        |    AND l.cid = c.code
        |  GROUP BY 1, 2
        |)
        |SELECT qid, vid, CAST(adist AS DOUBLE) AS adist, rank FROM (
        |  SELECT qid, vid, adist,
        |    ROW_NUMBER() OVER (PARTITION BY qid
        |      ORDER BY adist, vid) AS rank
        |  FROM adc) r
        |WHERE rank <= 3""".stripMargin)),

    // IVF-PQ with RESIDUAL encoding (IVFADC, q162's production
    // upgrade): codes quantize v − centroid(cell(v)), the query is
    // re-expressed in each probed cell's residual frame, so the LUT
    // carries a cell key. Residual arithmetic is double-exact on both
    // engines (float operands, one IEEE subtraction).
    Q("q184_ivf_pq_residual", { t =>
        val emb = t.embeddings.select(col("vec_id").as("id"),
                                      col("embedding"))
        val queries = emb.filter(col("id") % 20 === 0)
        val cents = Ann.ivfCentroids(emb, 16)
        Ann.ivfPqResidualTopK(queries, emb, cents, nProbe = 2, m = 8,
                              subDim = 8, nCodes = 16, k = 3)
      },
      Some(evCte + """,
        |cent AS (
        |  SELECT vec_id AS ccid FROM embeddings
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
        |), cdots AS (
        |  SELECT a.vec_id AS vid, c.ccid, SUM(a.v * b.v) AS dot
        |  FROM ev a
        |  CROSS JOIN cent c
        |  JOIN ev b ON b.vec_id = c.ccid AND a.d = b.d
        |  GROUP BY 1, 2
        |), ccos AS (
        |  SELECT vid, ccid,
        |    round(dot / sqrt(na.nn * nb.nn), 6) AS ccos
        |  FROM cdots
        |  JOIN norms na ON vid = na.vec_id
        |  JOIN norms nb ON ccid = nb.vec_id
        |), assign AS (
        |  SELECT vid, cell FROM (
        |    SELECT vid, ccid AS cell,
        |      ROW_NUMBER() OVER (PARTITION BY vid
        |        ORDER BY ccos DESC, ccid) AS rn
        |    FROM ccos) a
        |  WHERE rn = 1
        |), probe AS (
        |  SELECT qid, cell FROM (
        |    SELECT vid AS qid, ccid AS cell,
        |      ROW_NUMBER() OVER (PARTITION BY vid
        |        ORDER BY ccos DESC, ccid) AS rn
        |    FROM ccos WHERE vid % 20 = 0) p
        |  WHERE rn <= 2
        |), rres AS (
        |  SELECT a.vec_id, a.d, a.v - b.v AS v
        |  FROM ev a
        |  JOIN assign ON assign.vid = a.vec_id
        |  JOIN ev b ON b.vec_id = assign.cell AND b.d = a.d
        |), rbook AS (
        |  SELECT vec_id AS bid FROM embeddings
        |  WHERE vec_id NOT IN (SELECT ccid FROM cent)
        |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
        |), rsub AS (
        |  SELECT vec_id, CAST(d // 8 AS INT) AS s, d % 8 AS sd, v
        |  FROM rres
        |), bsub AS (
        |  SELECT r.bid, t.s, t.sd, t.v
        |  FROM rbook r JOIN rsub t ON t.vec_id = r.bid
        |), rssq AS (
        |  SELECT vec_id, s, SUM(v * v) AS nn FROM rsub GROUP BY 1, 2
        |), bssq AS (
        |  SELECT bid, s, SUM(v * v) AS nn FROM bsub GROUP BY 1, 2
        |), rdot AS (
        |  SELECT a.vec_id, a.s, b.bid AS cid, SUM(a.v * b.v) AS dot
        |  FROM rsub a JOIN bsub b ON b.s = a.s AND b.sd = a.sd
        |  GROUP BY 1, 2, 3
        |), rdd AS (
        |  SELECT rdot.vec_id, rdot.s, rdot.cid,
        |    round(sa.nn + sb.nn - 2 * dot, 6) AS d2
        |  FROM rdot
        |  JOIN rssq sa ON sa.vec_id = rdot.vec_id AND sa.s = rdot.s
        |  JOIN bssq sb ON sb.bid = rdot.cid AND sb.s = rdot.s
        |), rcodes AS (
        |  SELECT vec_id, s, cid AS code FROM (
        |    SELECT vec_id, s, cid, d2,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id, s
        |        ORDER BY d2, cid) AS rn
        |    FROM rdd) t
        |  WHERE rn = 1
        |), qres AS (
        |  SELECT p.qid, p.cell, a.d, a.v - b.v AS v
        |  FROM probe p
        |  JOIN ev a ON a.vec_id = p.qid
        |  JOIN ev b ON b.vec_id = p.cell AND b.d = a.d
        |), qsub AS (
        |  SELECT qid, cell, CAST(d // 8 AS INT) AS s, d % 8 AS sd, v
        |  FROM qres
        |), qssq AS (
        |  SELECT qid, cell, s, SUM(v * v) AS nn
        |  FROM qsub GROUP BY 1, 2, 3
        |), qdot AS (
        |  SELECT a.qid, a.cell, a.s, b.bid AS cid, SUM(a.v * b.v) AS dot
        |  FROM qsub a JOIN bsub b ON b.s = a.s AND b.sd = a.sd
        |  GROUP BY 1, 2, 3, 4
        |), qlut AS (
        |  SELECT qdot.qid, qdot.cell, qdot.s, qdot.cid,
        |    CAST(round(sa.nn + sb.nn - 2 * dot, 6) AS DECIMAL(18,6))
        |      AS d2
        |  FROM qdot
        |  JOIN qssq sa ON sa.qid = qdot.qid AND sa.cell = qdot.cell
        |    AND sa.s = qdot.s
        |  JOIN bssq sb ON sb.bid = qdot.cid AND sb.s = qdot.s
        |), cand AS (
        |  SELECT probe.qid, probe.cell, assign.vid
        |  FROM probe JOIN assign USING (cell)
        |  WHERE assign.vid <> probe.qid
        |), adc AS (
        |  SELECT cand.qid, cand.vid, SUM(l.d2) AS adist
        |  FROM cand
        |  JOIN rcodes c ON c.vec_id = cand.vid
        |  JOIN qlut l ON l.qid = cand.qid AND l.cell = cand.cell
        |    AND l.s = c.s AND l.cid = c.code
        |  GROUP BY 1, 2
        |)
        |SELECT qid, vid, CAST(adist AS DOUBLE) AS adist, rank FROM (
        |  SELECT qid, vid, adist,
        |    ROW_NUMBER() OVER (PARTITION BY qid
        |      ORDER BY adist, vid) AS rank
        |  FROM adc) r
        |WHERE rank <= 3""".stripMargin)),

    // Matryoshka truncation-recall curve: retrieval quality of the
    // first-16 / first-32 / full-64 dimension prefixes against the
    // full-dimension exact top-3 (micro-averaged over integer
    // hit/exact totals, so recall is an exact division). The dim=64
    // row must score 1.0 — an in-data sanity check the oracle shares.
    Q("q166_truncation_recall", { t =>
        val emb = t.embeddings.select(col("vec_id").as("id"),
                                      col("embedding"))
        Ann.truncationRecallCurve(emb.filter(col("id") % 20 === 0), emb,
                                  dims = Seq(16, 32, 64), k = 3)
      },
      Some(evCte + """,
        |fulltop AS (
        |  SELECT qid, vid FROM (
        |    SELECT qid, vid,
        |      ROW_NUMBER() OVER (PARTITION BY qid
        |        ORDER BY cos DESC, vid) AS rank
        |    FROM (
        |      SELECT dd.qid, dd.vid,
        |        round(dd.dot / sqrt(na.nn * nb.nn), 6) AS cos
        |      FROM (
        |        SELECT a.vec_id AS qid, b.vec_id AS vid,
        |          SUM(a.v * b.v) AS dot
        |        FROM ev a JOIN ev b ON a.d = b.d
        |          AND a.vec_id % 20 = 0 AND a.vec_id <> b.vec_id
        |        GROUP BY 1, 2) dd
        |      JOIN norms na ON dd.qid = na.vec_id
        |      JOIN norms nb ON dd.vid = nb.vec_id) c) r
        |  WHERE rank <= 3
        |)DIMCTES
        |DIMSELECTS""".stripMargin
        .replace("DIMCTES", Seq(16, 32, 64).map { d => s""",
        |ntr$d AS (
        |  SELECT vec_id, SUM(v * v) AS nn FROM ev WHERE d < $d
        |  GROUP BY 1
        |), top$d AS (
        |  SELECT qid, vid FROM (
        |    SELECT qid, vid,
        |      ROW_NUMBER() OVER (PARTITION BY qid
        |        ORDER BY cos DESC, vid) AS rank
        |    FROM (
        |      SELECT dd.qid, dd.vid,
        |        round(dd.dot / sqrt(na.nn * nb.nn), 6) AS cos
        |      FROM (
        |        SELECT a.vec_id AS qid, b.vec_id AS vid,
        |          SUM(a.v * b.v) AS dot
        |        FROM ev a JOIN ev b ON a.d = b.d AND a.d < $d
        |          AND a.vec_id % 20 = 0 AND a.vec_id <> b.vec_id
        |        GROUP BY 1, 2) dd
        |      JOIN ntr$d na ON dd.qid = na.vec_id
        |      JOIN ntr$d nb ON dd.vid = nb.vec_id) c) r
        |  WHERE rank <= 3
        |)""".stripMargin }.mkString)
        .replace("DIMSELECTS", Seq(16, 32, 64).map { d => s"""
        |SELECT $d AS dim,
        |  (SELECT COUNT(DISTINCT qid) FROM fulltop) AS n_queries,
        |  (SELECT COUNT(*) FROM top$d t
        |     JOIN fulltop f ON t.qid = f.qid AND t.vid = f.vid)
        |    AS n_hits,
        |  (SELECT COUNT(*) FROM fulltop) AS n_exact,
        |  round((SELECT CAST(COUNT(*) AS DOUBLE) FROM top$d t
        |           JOIN fulltop f ON t.qid = f.qid AND t.vid = f.vid)
        |        / (SELECT COUNT(*) FROM fulltop), 6) AS recall""".stripMargin }
        .mkString("\nUNION ALL")))),

    // MMR diversification (Carbonell & Goldstein 1998) over the brute
    // top-10 candidate lists of every 50th vector, lambda = 0.5,
    // k = 4. The oracle unrolls the greedy selection as four chained
    // CTE steps — each picks the per-query argmax of the EXACT-decimal
    // score 0.5*rel - 0.5*maxsim among not-yet-selected candidates
    // (ties -> doc id), exactly the engine's iteration. Rounding the
    // score instead sits ON a 7th-decimal half boundary whenever the
    // odd-digit case fires (caught strict on this gate's first run).
    Q("q201_mmr_diversify", { t =>
        val emb = t.embeddings.select(col("vec_id").as("id"),
                                      col("embedding"))
        val top = Ann.bruteForceCosineTopK(
          emb.filter(col("id") % 50 === 0), emb, 10)
        val cand = top.join(
            t.embeddings.select(col("vec_id").as("vid"),
                                col("embedding").as("emb")), "vid")
          .select(col("qid"), col("vid").as("doc_id"),
                  col("cos").as("rel"), col("emb"))
        Ann.mmrDiversify(cand, lambda = 0.5, k = 4)
      },
      Some(evCte + """,
        |dots AS (
        |  SELECT a.vec_id AS qid, b.vec_id AS vid, SUM(a.v * b.v) AS dot
        |  FROM ev a JOIN ev b ON a.d = b.d
        |    AND a.vec_id % 50 = 0 AND a.vec_id <> b.vec_id
        |  GROUP BY 1, 2
        |), cand AS (
        |  SELECT qid, vid, cos AS rel FROM (
        |    SELECT qid, vid, cos,
        |      ROW_NUMBER() OVER (PARTITION BY qid
        |        ORDER BY cos DESC, vid) AS rank
        |    FROM (
        |      SELECT qid, vid, round(dot / sqrt(na.nn * nb.nn), 6) AS cos
        |      FROM dots
        |      JOIN norms na ON qid = na.vec_id
        |      JOIN norms nb ON vid = nb.vec_id) c) r
        |  WHERE rank <= 10
        |), simdots AS (
        |  SELECT x.qid, x.vid AS a, y.vid AS b, SUM(ea.v * eb.v) AS dot
        |  FROM cand x JOIN cand y ON x.qid = y.qid AND x.vid <> y.vid
        |  JOIN ev ea ON ea.vec_id = x.vid
        |  JOIN ev eb ON eb.vec_id = y.vid AND eb.d = ea.d
        |  GROUP BY 1, 2, 3
        |), sims AS (
        |  SELECT sd.qid, sd.a, sd.b,
        |    round(sd.dot / sqrt(na.nn * nb.nn), 6) AS sim
        |  FROM simdots sd
        |  JOIN norms na ON sd.a = na.vec_id
        |  JOIN norms nb ON sd.b = nb.vec_id
        |), sel1 AS (
        |  SELECT qid, vid AS doc_id, 1 AS mmr_rank, score AS mmr_score
        |  FROM (
        |    SELECT qid, vid, score,
        |      ROW_NUMBER() OVER (PARTITION BY qid
        |        ORDER BY score DESC, vid) AS rn
        |    FROM (SELECT qid, vid,
        |            CAST(CAST(0.5 AS DECIMAL(18,6))
        |                 * CAST(rel AS DECIMAL(18,6)) AS DOUBLE)
        |              AS score
        |          FROM cand) y) z
        |  WHERE rn = 1
        |)""".stripMargin + (2 to 4).map { n => s"""
        |, pick$n AS (
        |  SELECT qid, vid AS doc_id, $n AS mmr_rank, score AS mmr_score
        |  FROM (
        |    SELECT qid, vid, score,
        |      ROW_NUMBER() OVER (PARTITION BY qid
        |        ORDER BY score DESC, vid) AS rn
        |    FROM (
        |      SELECT c.qid, c.vid,
        |        CAST(CAST(0.5 AS DECIMAL(18,6))
        |               * CAST(c.rel AS DECIMAL(18,6))
        |             - CAST(0.5 AS DECIMAL(18,6))
        |               * CAST(COALESCE(m.msim, 0.0) AS DECIMAL(18,6))
        |          AS DOUBLE) AS score
        |      FROM cand c
        |      LEFT JOIN (
        |        SELECT s.qid, s.a AS vid, MAX(s.sim) AS msim
        |        FROM sims s JOIN sel${n - 1} p
        |          ON p.qid = s.qid AND p.doc_id = s.b
        |        GROUP BY 1, 2) m ON m.qid = c.qid AND m.vid = c.vid
        |      WHERE NOT EXISTS (SELECT 1 FROM sel${n - 1} p
        |                        WHERE p.qid = c.qid AND p.doc_id = c.vid)
        |    ) y) z WHERE rn = 1
        |), sel$n AS (
        |  SELECT * FROM sel${n - 1} UNION ALL SELECT * FROM pick$n
        |)""".stripMargin }.mkString + """
        |SELECT qid, doc_id, mmr_rank, mmr_score FROM sel4"""
        .stripMargin))
  )
}
