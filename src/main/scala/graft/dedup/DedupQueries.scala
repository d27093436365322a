package graft.dedup

import org.apache.spark.sql.functions._
import graft.Q

/** Oracle-checked queries for the dedup suite: exact, MinHash+LSH,
  * n-gram Jaccard, SimHash.
  */
object DedupQueries {

  private val dtCte =
    """WITH dt AS (
      |  SELECT DISTINCT doc_id, tok FROM (
      |    SELECT doc_id,
      |      unnest(string_split_regex(lower(text), '\s+')) AS tok
      |    FROM documents) t
      |)""".stripMargin

  def queries: Seq[Q] = Seq(

    // SemDeDup-style semantic dedup over the embedding corpus: hash-
    // sampled quantizer cells, within-cell cosine, drop the higher id
    // at cos >= 0.95. Planted duplicates make the gate non-vacuous:
    // 60 verbatim copies (+10000) AND 60 2x-scaled copies (+20000 —
    // cosine exactly 1 only if the normalization is right, so the
    // scaled plant gates the cosine math, not just equality). Both
    // engines build the identical corpus; survivors are compared.
    Q("q122_semantic_dedup", { t =>
        val emb = t.embeddings.select(col("vec_id").as("id"),
                                      col("embedding"))
        val base = emb.filter(col("id") < 300)
          .unionByName(emb.filter(col("id") < 60)
            .select((col("id") + 10000L).as("id"), col("embedding")))
          .unionByName(emb.filter(col("id") >= 60 && col("id") < 120)
            .select((col("id") + 20000L).as("id"),
                    transform(col("embedding"), x => x * lit(2.0f))
                      .as("embedding")))
        Dedup.semanticDedup(base, nCells = 8, tau = 0.95)
      },
      Some("""WITH base AS (
        |  SELECT vec_id AS id, embedding FROM embeddings
        |  WHERE vec_id < 300
        |  UNION ALL
        |  SELECT vec_id + 10000, embedding FROM embeddings
        |  WHERE vec_id < 60
        |  UNION ALL
        |  SELECT vec_id + 20000, list_transform(embedding, x -> x * 2)
        |  FROM embeddings WHERE vec_id >= 60 AND vec_id < 120
        |), ev AS (
        |  SELECT id, CAST(i - 1 AS BIGINT) AS d,
        |    CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
        |  FROM base, UNNEST(generate_series(1, len(embedding))) t(i)
        |), norms AS (
        |  SELECT id, SUM(v * v) AS nn FROM ev GROUP BY 1
        |), cent AS (
        |  SELECT id AS cid FROM base
        |  ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT 8
        |), cdots AS (
        |  SELECT a.id AS vid, c.cid, SUM(a.v * b.v) AS dot
        |  FROM ev a CROSS JOIN cent c
        |  JOIN ev b ON b.id = c.cid AND a.d = b.d
        |  GROUP BY 1, 2
        |), ccos AS (
        |  SELECT vid, cid, round(dot / sqrt(na.nn * nb.nn), 6) AS ccos
        |  FROM cdots
        |  JOIN norms na ON vid = na.id
        |  JOIN norms nb ON cid = nb.id
        |), cells AS (
        |  SELECT vid AS id, cid AS cell FROM (
        |    SELECT vid, cid, ROW_NUMBER() OVER (PARTITION BY vid
        |      ORDER BY ccos DESC, cid) AS rn FROM ccos) x
        |  WHERE rn = 1
        |), pairs AS (
        |  SELECT ca.id AS i, cb.id AS j
        |  FROM cells ca JOIN cells cb
        |    ON ca.cell = cb.cell AND ca.id < cb.id
        |), pcos AS (
        |  SELECT p.i, p.j,
        |    round(SUM(a.v * b.v) / sqrt(na.nn * nb.nn), 6) AS cos
        |  FROM pairs p
        |  JOIN ev a ON a.id = p.i
        |  JOIN ev b ON b.id = p.j AND b.d = a.d
        |  JOIN norms na ON na.id = p.i
        |  JOIN norms nb ON nb.id = p.j
        |  GROUP BY p.i, p.j, na.nn, nb.nn
        |)
        |SELECT c.id, c.cell FROM cells c
        |WHERE c.id NOT IN (
        |  SELECT DISTINCT j FROM pcos WHERE cos >= 0.95)"""
        .stripMargin)),

    // Cross-document repeated 10-token spans — the exact-substring
    // dedup primitive (ACL 2022). The random-vocabulary corpus shares
    // no natural 10-gram across documents, so the gate plants them:
    // verbatim copies (+5000) of doc_id < 10 make every >= 10-token
    // window of those documents a cross-document repeat.
    Q("q131_repeated_spans", { t =>
        val base = t.documents.select(col("doc_id"), col("text"))
        val planted = base.filter(col("doc_id") < 10)
          .select((col("doc_id") + 5000L).as("doc_id"), col("text"))
        Dedup.repeatedSpans(base.unionByName(planted),
                            col("doc_id"), col("text"), spanTokens = 10)
      },
      Some("""WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 5000, text FROM documents WHERE doc_id < 10
        |), spans AS (
        |  SELECT doc_id,
        |    md5(array_to_string(list_slice(
        |      string_split_regex(lower(text), '\s+'),
        |      CAST(i AS INT), CAST(i + 9 AS INT)), ' ')) AS h
        |  FROM corpus,
        |    UNNEST(generate_series(1,
        |      len(string_split_regex(lower(text), '\s+')) - 9)) t(i)
        |  WHERE len(string_split_regex(lower(text), '\s+')) >= 10
        |)
        |SELECT h, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occ
        |FROM spans GROUP BY h
        |HAVING COUNT(DISTINCT doc_id) > 1""".stripMargin)),

    // Repeated-span REMOVAL — the cut half of exact-substring dedup
    // (Lee et al., ACL 2022): duplicated >= 10-token windows are cut
    // from every non-canonical document, overlaps merged. Plants two
    // shapes on top of q131's verbatim copies (+5000, fully cut to
    // empty): composites (+6000) of each short doc's first 15 tokens
    // plus 20 per-doc synthetic tokens, so exactly positions 1-15 are
    // removed — partial cuts exercising the interval-union path.
    Q("q180_remove_repeated_spans", { t =>
        val base = t.documents.select(col("doc_id"), col("text"))
        val full = base.filter(col("doc_id") < 10)
          .select((col("doc_id") + 5000L).as("doc_id"), col("text"))
        val arr = split(col("text"), "\\s+")
        // orig_id rename: a bare doc_id in the synthetic tokens would
        // lateral-resolve to the re-id'd alias (+6000), not the input
        val partial = base.filter(col("doc_id") < 10)
          .select(col("doc_id").as("orig_id"), col("text"))
          .select((col("orig_id") + 6000L).as("doc_id"),
            concat_ws(" ", concat(
              slice(arr, 1, 15),
              transform(sequence(lit(1), lit(20)), i =>
                concat(lit("zz"), col("orig_id").cast("string"),
                       lit("_"), i.cast("string"))))).as("text"))
        Dedup.removeRepeatedSpans(
          base.unionByName(full).unionByName(partial),
          col("doc_id"), col("text"), spanTokens = 10)
      },
      Some("""WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 5000, text FROM documents WHERE doc_id < 10
        |  UNION ALL
        |  SELECT doc_id + 6000,
        |    array_to_string(
        |      list_slice(string_split_regex(text, '\s+'), 1, 15) ||
        |      list_transform(range(1, 21),
        |        i -> 'zz' || CAST(doc_id AS VARCHAR) || '_'
        |             || CAST(i AS VARCHAR)),
        |      ' ') AS text
        |  FROM documents WHERE doc_id < 10
        |), toks AS (
        |  SELECT doc_id, text, string_split_regex(text, '\s+') AS tk,
        |         string_split_regex(lower(text), '\s+') AS lt
        |  FROM corpus
        |), occ AS (
        |  SELECT doc_id, i AS pos,
        |    md5(array_to_string(list_slice(
        |      lt, CAST(i AS INT), CAST(i + 9 AS INT)), ' ')) AS h
        |  FROM toks, UNNEST(generate_series(1, len(lt) - 9)) t(i)
        |  WHERE len(lt) >= 10
        |), dup AS (
        |  SELECT h, MIN(doc_id) AS keep_doc FROM occ GROUP BY h
        |  HAVING COUNT(DISTINCT doc_id) > 1
        |), cov AS (
        |  SELECT DISTINCT o.doc_id, o.pos + j.j AS tp
        |  FROM occ o JOIN dup d USING (h),
        |       UNNEST(generate_series(0, 9)) j(j)
        |  WHERE o.doc_id <> d.keep_doc
        |), kept AS (
        |  SELECT t.doc_id, u.i AS tp,
        |         list_extract(t.tk, CAST(u.i AS INT)) AS tok
        |  FROM toks t, UNNEST(generate_series(1, len(t.tk))) u(i)
        |  WHERE NOT EXISTS (SELECT 1 FROM cov c
        |                    WHERE c.doc_id = t.doc_id AND c.tp = u.i)
        |), agg AS (
        |  SELECT doc_id, string_agg(tok, ' ' ORDER BY tp) AS s
        |  FROM kept GROUP BY doc_id
        |), ncov AS (
        |  SELECT doc_id, COUNT(*) AS n_removed FROM cov GROUP BY doc_id
        |)
        |SELECT t.doc_id,
        |  CAST(len(t.tk) AS INT) AS n_tokens,
        |  CAST(COALESCE(n.n_removed, 0) AS INT) AS n_removed,
        |  CASE WHEN n.n_removed IS NULL THEN t.text
        |       ELSE COALESCE(a.s, '') END AS clean_text
        |FROM toks t
        |LEFT JOIN ncov n USING (doc_id)
        |LEFT JOIN agg a USING (doc_id)""".stripMargin)),

    // Exact dedup: normalized-md5 groups with more than one member.
    // The synthetic corpus contains no exact duplicates, so the gate
    // plants them: the corpus is documents UNION a verbatim re-id'd
    // copy of doc_id < 200 — both engines build the identical planted
    // corpus, so the duplicate groups (≥200) are genuinely compared
    // instead of both sides returning empty (reference dedup
    // semantics: Data_manager/DataReader_utils.py:138-144).
    Q("q50_dedup_exact", { t =>
        val base = t.documents.select(col("doc_id"), col("text"))
        val planted = base.filter(col("doc_id") < 200)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        Dedup.exactDupGroups(base.unionByName(planted),
                             col("doc_id"), col("text"))
      },
      Some("""WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 200
        |)
        |SELECT h, COUNT(*) AS n, MIN(doc_id) AS canonical FROM (
        |  SELECT doc_id,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS h
        |  FROM corpus) t
        |GROUP BY h HAVING COUNT(*) > 1""".stripMargin)),

    // MinHash signatures (6 md5-permutations over the token set).
    Q("q54_minhash",
      t => Dedup.minhashSignatures(
        Dedup.docTokens(t.documents, col("doc_id"), col("text")), 6),
      Some(dtCte + """
        |SELECT doc_id,
        |  MIN(md5('0:' || tok)) AS mh_0, MIN(md5('1:' || tok)) AS mh_1,
        |  MIN(md5('2:' || tok)) AS mh_2, MIN(md5('3:' || tok)) AS mh_3,
        |  MIN(md5('4:' || tok)) AS mh_4, MIN(md5('5:' || tok)) AS mh_5
        |FROM dt GROUP BY doc_id""".stripMargin)),

    // MinHash → LSH bands (3 bands × 2 rows) → candidate pairs →
    // exact token-set Jaccard ≥ 0.4.
    // Bounded to doc_id < 400 plus a planted verbatim copy of
    // doc_id < 100 (re-id'd +1000000) so the LSH pipeline provably
    // surfaces true duplicate pairs (jaccard = 1.0) — the corpus has a
    // ~31-token vocabulary, so token sets are near-identical, LSH
    // degenerates toward one bucket, and the bound keeps the
    // verification join quadratic-safe at sf0.1.
    Q("q55_lsh_jaccard", { t =>
        val base = t.documents.filter(col("doc_id") < 400)
          .select(col("doc_id"), col("text"))
        val corpus = base.unionByName(
          base.filter(col("doc_id") < 100)
            .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
        // token set feeds the signature build and both sides of the
        // exact-jaccard verification join — persist once
        val dt = graft.core.CacheScope.persist(Dedup.docTokens(
          corpus, col("doc_id"), col("text")))
        val sigs = Dedup.minhashSignatures(dt, 6)
        val cand = Dedup.lshCandidatePairs(sigs, 6, 2)
        Dedup.jaccardForPairs(cand, dt)
          .filter(col("jaccard") >= 0.4)
          .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
      },
      Some("""WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 400
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 100
        |), dt AS (
        |  SELECT DISTINCT doc_id, tok FROM (
        |    SELECT doc_id,
        |      unnest(string_split_regex(lower(text), '\s+')) AS tok
        |    FROM corpus) t
        |),
        |sigs AS (
        |  SELECT doc_id,
        |    MIN(md5('0:' || tok)) AS mh_0, MIN(md5('1:' || tok)) AS mh_1,
        |    MIN(md5('2:' || tok)) AS mh_2, MIN(md5('3:' || tok)) AS mh_3,
        |    MIN(md5('4:' || tok)) AS mh_4, MIN(md5('5:' || tok)) AS mh_5
        |  FROM dt GROUP BY doc_id
        |), buckets AS (
        |  SELECT doc_id, 0 AS band, md5(mh_0 || mh_1) AS bucket FROM sigs
        |  UNION ALL
        |  SELECT doc_id, 1, md5(mh_2 || mh_3) FROM sigs
        |  UNION ALL
        |  SELECT doc_id, 2, md5(mh_4 || mh_5) FROM sigs
        |), cand AS (
        |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        |  FROM buckets x JOIN buckets y
        |    ON x.band = y.band AND x.bucket = y.bucket
        |       AND x.doc_id < y.doc_id
        |), sizes AS (SELECT doc_id, COUNT(*) AS n FROM dt GROUP BY 1),
        |inter AS (
        |  SELECT cand.a, cand.b, COUNT(*) AS inter
        |  FROM cand
        |  JOIN dt ta ON ta.doc_id = cand.a
        |  JOIN dt tb ON tb.doc_id = cand.b AND tb.tok = ta.tok
        |  GROUP BY 1, 2
        |)
        |SELECT inter.a, inter.b,
        |  round(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 6) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = inter.a
        |JOIN sizes sb ON sb.doc_id = inter.b
        |WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.4
        |""".stripMargin)),

    // Word 3-gram Jaccard between documents (bounded candidate set).
    // The base docs share no shingles above threshold, so the gate
    // plants NEAR-duplicates: each doc_id < 100 gets a perturbed twin
    // (+1000, four extra tail tokens) — the planted pair's Jaccard is
    // high but < 1, so intersection/union arithmetic over unequal set
    // sizes is genuinely compared across engines.
    Q("q56_ngram_jaccard", { t =>
        val base = t.documents.filter(col("doc_id") < 100)
          .select(col("doc_id"), col("text"))
        val docs = base.unionByName(
          base.select((col("doc_id") + 1000L).as("doc_id"),
                      concat(col("text"),
                             lit(" planted near duplicate tail")).as("text")))
        val sh = Dedup.shingles(docs, col("doc_id"), col("text"), 3)
          .withColumnRenamed("shingle", "tok")
        val pairs = sh.select(col("doc_id").as("a"))
          .distinct()
          .crossJoin(sh.select(col("doc_id").as("b")).distinct())
          .filter(col("a") < col("b"))
        Dedup.jaccardForPairs(pairs, sh)
          .filter(col("jaccard") >= 0.05)
          .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
      },
      Some("""WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 100
        |  UNION ALL
        |  SELECT doc_id + 1000, text || ' planted near duplicate tail'
        |  FROM documents WHERE doc_id < 100
        |), toks AS (
        |  SELECT doc_id, i AS pos,
        |    list_extract(string_split_regex(lower(text), '\s+'),
        |                 CAST(i AS INT)) AS tok
        |  FROM corpus,
        |    UNNEST(generate_series(1,
        |      len(string_split_regex(lower(text), '\s+')))) t(i)
        |), sh AS (
        |  SELECT DISTINCT doc_id, tok || ' ' || t1 || ' ' || t2 AS shingle
        |  FROM (
        |    SELECT doc_id, tok,
        |      LEAD(tok, 1) OVER w AS t1, LEAD(tok, 2) OVER w AS t2
        |    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        |  ) x WHERE t2 IS NOT NULL
        |), sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle
        |    AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT inter.a, inter.b,
        |  round(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 6) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = inter.a
        |JOIN sizes sb ON sb.doc_id = inter.b
        |WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.05
        |""".stripMargin)),

    // Dedup cluster resolution: near-dup candidate pairs (the q56
    // shingle-Jaccard construction over the planted corpus) resolved
    // into connected components, cluster id = canonical (minimum) doc.
    // The oracle computes the same components via a recursive-CTE
    // transitive closure, so the multi-hop merging itself — not just
    // the pair list — is compared across engines.
    Q("q99_dedup_clusters", { t =>
        val base = t.documents.filter(col("doc_id") < 100)
          .select(col("doc_id"), col("text"))
        val docs = base.unionByName(
          base.select((col("doc_id") + 1000L).as("doc_id"),
                      concat(col("text"),
                             lit(" planted near duplicate tail")).as("text")))
        val sh = Dedup.shingles(docs, col("doc_id"), col("text"), 3)
          .withColumnRenamed("shingle", "tok")
        val pairs = sh.select(col("doc_id").as("a"))
          .distinct()
          .crossJoin(sh.select(col("doc_id").as("b")).distinct())
          .filter(col("a") < col("b"))
        val nearDup = Dedup.jaccardForPairs(pairs, sh)
          .filter(col("jaccard") >= 0.05)
        Dedup.connectedComponents(nearDup)
          .select(col("node").as("doc_id"), col("cluster"),
                  (col("node") === col("cluster")).cast("int").as("keep"))
      },
      Some("""WITH RECURSIVE corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 100
        |  UNION ALL
        |  SELECT doc_id + 1000, text || ' planted near duplicate tail'
        |  FROM documents WHERE doc_id < 100
        |), toks AS (
        |  SELECT doc_id, i AS pos,
        |    list_extract(string_split_regex(lower(text), '\s+'),
        |                 CAST(i AS INT)) AS tok
        |  FROM corpus,
        |    UNNEST(generate_series(1,
        |      len(string_split_regex(lower(text), '\s+')))) t(i)
        |), sh AS (
        |  SELECT DISTINCT doc_id, tok || ' ' || t1 || ' ' || t2 AS shingle
        |  FROM (
        |    SELECT doc_id, tok,
        |      LEAD(tok, 1) OVER w AS t1, LEAD(tok, 2) OVER w AS t2
        |    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        |  ) x WHERE t2 IS NOT NULL
        |), sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle
        |    AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT inter.a, inter.b
        |  FROM inter
        |  JOIN sizes sa ON sa.doc_id = inter.a
        |  JOIN sizes sb ON sb.doc_id = inter.b
        |  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.05
        |), edges AS (
        |  SELECT a AS src, b AS dst FROM pairs
        |  UNION
        |  SELECT b, a FROM pairs
        |), reach(node, lab) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
        |)
        |SELECT node AS doc_id, MIN(lab) AS cluster,
        |  CAST(node = MIN(lab) AS INT) AS keep
        |FROM reach GROUP BY node""".stripMargin)),

    // Canonical-survivor selection under the KEEP-LONGEST convention
    // on the q99 planted corpus: every planted copy carries a longer
    // tail than its original, so the canonical pick INVERTS the
    // keep-smallest-id result of q99 — the gate proves the length
    // argmax (desc len, asc id) does the choosing, not the id order.
    Q("q137_canonical_longest", { t =>
        val base = t.documents.filter(col("doc_id") < 100)
          .select(col("doc_id"), col("text"))
        val docs = base.unionByName(
          base.select((col("doc_id") + 1000L).as("doc_id"),
                      concat(col("text"),
                             lit(" planted near duplicate tail")).as("text")))
        val sh = Dedup.shingles(docs, col("doc_id"), col("text"), 3)
          .withColumnRenamed("shingle", "tok")
        val pairs = sh.select(col("doc_id").as("a"))
          .distinct()
          .crossJoin(sh.select(col("doc_id").as("b")).distinct())
          .filter(col("a") < col("b"))
        val nearDup = Dedup.jaccardForPairs(pairs, sh)
          .filter(col("jaccard") >= 0.05)
        Dedup.canonicalKeepLongest(docs, col("doc_id"), col("text"),
                                   nearDup.select("a", "b"))
      },
      Some("""WITH RECURSIVE corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 100
        |  UNION ALL
        |  SELECT doc_id + 1000, text || ' planted near duplicate tail'
        |  FROM documents WHERE doc_id < 100
        |), toks AS (
        |  SELECT doc_id, i AS pos,
        |    list_extract(string_split_regex(lower(text), '\s+'),
        |                 CAST(i AS INT)) AS tok
        |  FROM corpus,
        |    UNNEST(generate_series(1,
        |      len(string_split_regex(lower(text), '\s+')))) t(i)
        |), sh AS (
        |  SELECT DISTINCT doc_id, tok || ' ' || t1 || ' ' || t2 AS shingle
        |  FROM (
        |    SELECT doc_id, tok,
        |      LEAD(tok, 1) OVER w AS t1, LEAD(tok, 2) OVER w AS t2
        |    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        |  ) x WHERE t2 IS NOT NULL
        |), sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle
        |    AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT inter.a, inter.b
        |  FROM inter
        |  JOIN sizes sa ON sa.doc_id = inter.a
        |  JOIN sizes sb ON sb.doc_id = inter.b
        |  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.05
        |), edges AS (
        |  SELECT a AS src, b AS dst FROM pairs
        |  UNION
        |  SELECT b, a FROM pairs
        |), reach(node, lab) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
        |), cc AS (
        |  SELECT node AS doc_id, MIN(lab) AS cluster
        |  FROM reach GROUP BY node
        |)
        |SELECT cc.doc_id, cc.cluster,
        |  CAST(length(c2.text) AS INT) AS len,
        |  CAST(ROW_NUMBER() OVER (
        |    PARTITION BY cc.cluster
        |    ORDER BY length(c2.text) DESC, cc.doc_id ASC) = 1
        |    AS INT) AS keep
        |FROM cc JOIN corpus c2 USING (doc_id)""".stripMargin)),

    // Leakage-safe split on the q99 planted corpus: the fold is an md5
    // bucket of the CLUSTER id, so each planted near-dup (+1000) lands
    // in the same fold as its original by construction — the
    // contamination a doc-level random split cannot prevent. Singleton
    // docs (no near-dup edge) cluster as themselves.
    Q("q182_leakage_safe_split", { t =>
        val base = t.documents.filter(col("doc_id") < 100)
          .select(col("doc_id"), col("text"))
        val docs = base.unionByName(
          base.select((col("doc_id") + 1000L).as("doc_id"),
                      concat(col("text"),
                             lit(" planted near duplicate tail")).as("text")))
        val sh = Dedup.shingles(docs, col("doc_id"), col("text"), 3)
          .withColumnRenamed("shingle", "tok")
        val pairs = sh.select(col("doc_id").as("a"))
          .distinct()
          .crossJoin(sh.select(col("doc_id").as("b")).distinct())
          .filter(col("a") < col("b"))
        val nearDup = Dedup.jaccardForPairs(pairs, sh)
          .filter(col("jaccard") >= 0.05)
        Dedup.leakageSafeSplit(docs, col("doc_id"),
                               nearDup.select("a", "b"), trainFrac = 0.8)
      },
      Some("""WITH RECURSIVE corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 100
        |  UNION ALL
        |  SELECT doc_id + 1000, text || ' planted near duplicate tail'
        |  FROM documents WHERE doc_id < 100
        |), toks AS (
        |  SELECT doc_id, i AS pos,
        |    list_extract(string_split_regex(lower(text), '\s+'),
        |                 CAST(i AS INT)) AS tok
        |  FROM corpus,
        |    UNNEST(generate_series(1,
        |      len(string_split_regex(lower(text), '\s+')))) t(i)
        |), sh AS (
        |  SELECT DISTINCT doc_id, tok || ' ' || t1 || ' ' || t2 AS shingle
        |  FROM (
        |    SELECT doc_id, tok,
        |      LEAD(tok, 1) OVER w AS t1, LEAD(tok, 2) OVER w AS t2
        |    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        |  ) x WHERE t2 IS NOT NULL
        |), sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle
        |    AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT inter.a, inter.b
        |  FROM inter
        |  JOIN sizes sa ON sa.doc_id = inter.a
        |  JOIN sizes sb ON sb.doc_id = inter.b
        |  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.05
        |), edges AS (
        |  SELECT a AS src, b AS dst FROM pairs
        |  UNION
        |  SELECT b, a FROM pairs
        |), reach(node, lab) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
        |), cc AS (
        |  SELECT node AS doc_id, MIN(lab) AS cluster
        |  FROM reach GROUP BY node
        |)
        |SELECT c.doc_id,
        |  COALESCE(cc.cluster, c.doc_id) AS cluster,
        |  CASE WHEN ('0x' || substr(md5(CAST(
        |           COALESCE(cc.cluster, c.doc_id) AS VARCHAR)), 1, 8))
        |         ::BIGINT < 3435973836
        |       THEN 'train' ELSE 'test' END AS split
        |FROM corpus c LEFT JOIN cc USING (doc_id)""".stripMargin)),

    // The cut → pack chain (q130's convention for the round's new op):
    // exact-substring span removal runs BEFORE sequence packing in a
    // real data build — cut tokens must not occupy training-sequence
    // budget. Verbatim copies (+5000) are cut to zero tokens and must
    // vanish from the packed layout entirely; partially-cut docs pack
    // at their POST-cut token counts.
    Q("q183_cut_then_pack", { t =>
        val base = t.documents.select(col("doc_id"), col("text"))
        val planted = base.filter(col("doc_id") < 10)
          .select((col("doc_id") + 5000L).as("doc_id"), col("text"))
        val cleaned = graft.dedup.Dedup.removeRepeatedSpans(
          base.unionByName(planted), col("doc_id"), col("text"),
          spanTokens = 10)
        graft.text.TextOps.packSequences(
          cleaned.filter(col("n_removed") < col("n_tokens"))
            .select(col("doc_id"), col("clean_text")),
          col("doc_id"), col("clean_text"), budget = 256L)
      },
      Some("""WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 5000, text FROM documents WHERE doc_id < 10
        |), toks AS (
        |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS lt
        |  FROM corpus
        |), occ AS (
        |  SELECT doc_id, i AS pos,
        |    md5(array_to_string(list_slice(
        |      lt, CAST(i AS INT), CAST(i + 9 AS INT)), ' ')) AS h
        |  FROM toks, UNNEST(generate_series(1, len(lt) - 9)) t(i)
        |  WHERE len(lt) >= 10
        |), dup AS (
        |  SELECT h, MIN(doc_id) AS keep_doc FROM occ GROUP BY h
        |  HAVING COUNT(DISTINCT doc_id) > 1
        |), cov AS (
        |  SELECT DISTINCT o.doc_id, o.pos + j.j AS tp
        |  FROM occ o JOIN dup d USING (h),
        |       UNNEST(generate_series(0, 9)) j(j)
        |  WHERE o.doc_id <> d.keep_doc
        |), ncov AS (
        |  SELECT doc_id, COUNT(*) AS n_removed FROM cov GROUP BY doc_id
        |), cleaned AS (
        |  SELECT t.doc_id,
        |    CAST(len(t.lt) - COALESCE(n.n_removed, 0) AS INT)
        |      AS n_tokens
        |  FROM toks t LEFT JOIN ncov n USING (doc_id)
        |  WHERE len(t.lt) - COALESCE(n.n_removed, 0) > 0
        |), counted AS (
        |  SELECT doc_id, n_tokens, md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM cleaned
        |), ordered AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS pos,
        |    CAST(SUM(n_tokens) OVER w AS BIGINT) AS cum
        |  FROM counted WINDOW w AS (ORDER BY h, doc_id)
        |)
        |SELECT doc_id, n_tokens, pos,
        |  CAST(FLOOR((cum - n_tokens) / 256.0) AS BIGINT) AS seq_id,
        |  (cum - n_tokens)
        |    - CAST(FLOOR((cum - n_tokens) / 256.0) AS BIGINT) * 256
        |    AS offset
        |FROM ordered""".stripMargin)),

    // Shingle CONTAINMENT (|A∩B|/min sizes): planted SUBSET documents
    // — each twin keeps only the first half of its source's text — so
    // pairs where Jaccard stays low but containment approaches 1 are
    // genuinely produced and compared (the metric that catches a doc
    // embedded inside a larger one).
    Q("q118_containment", { t =>
        val base = t.documents.filter(col("doc_id") < 100)
          .select(col("doc_id"), col("text"))
        val docs = base.unionByName(
          base.select((col("doc_id") + 2000L).as("doc_id"),
                      substring(col("text"), 1, 120).as("text")))
        val sh = Dedup.shingles(docs, col("doc_id"), col("text"), 3)
          .withColumnRenamed("shingle", "tok")
        val pairs = sh.select(col("doc_id").as("a"))
          .distinct()
          .crossJoin(sh.select(col("doc_id").as("b")).distinct())
          .filter(col("a") < col("b"))
        Dedup.containmentForPairs(pairs, sh)
          .filter(col("containment") >= 0.5)
          .select(col("a"), col("b"),
                  round(col("containment"), 6).as("containment"))
      },
      Some("""WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 100
        |  UNION ALL
        |  SELECT doc_id + 2000, substr(text, 1, 120)
        |  FROM documents WHERE doc_id < 100
        |), toks AS (
        |  SELECT doc_id, i AS pos,
        |    list_extract(string_split_regex(lower(text), '\s+'),
        |                 CAST(i AS INT)) AS tok
        |  FROM corpus,
        |    UNNEST(generate_series(1,
        |      len(string_split_regex(lower(text), '\s+')))) t(i)
        |), sh AS (
        |  SELECT DISTINCT doc_id, tok || ' ' || t1 || ' ' || t2 AS shingle
        |  FROM (
        |    SELECT doc_id, tok,
        |      LEAD(tok, 1) OVER w AS t1, LEAD(tok, 2) OVER w AS t2
        |    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        |  ) x WHERE t2 IS NOT NULL
        |), sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle
        |    AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT inter.a, inter.b,
        |  round(CAST(inter AS DOUBLE) / least(sa.n, sb.n), 6)
        |    AS containment
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = inter.a
        |JOIN sizes sb ON sb.doc_id = inter.b
        |WHERE CAST(inter AS DOUBLE) / least(sa.n, sb.n) >= 0.5"""
        .stripMargin)),

    // Cross-corpus decontamination: the corpus (docs ≥ 250 plus
    // planted verbatim copies of reference docs) anti-joined on
    // normalized fingerprints against the reference set (docs < 250).
    // The planted copies (re-id'd +5000) MUST disappear; everything
    // else survives — both engines compare the surviving id set.
    Q("q115_cross_dedup", { t =>
        val reference = t.documents.filter(col("doc_id") < 250)
          .select(col("doc_id"), col("text"))
        val corpus = t.documents.filter(col("doc_id") >= 250)
          .select(col("doc_id"), col("text"))
          .unionByName(reference.filter(col("doc_id") < 50)
            .select((col("doc_id") + 5000L).as("doc_id"), col("text")))
        Dedup.crossDedup(corpus, reference,
                         col("doc_id"), col("text"))
          .select("doc_id", "h")
      },
      Some("""WITH reference AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 250
        |), corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id >= 250
        |  UNION ALL
        |  SELECT doc_id + 5000, text FROM documents WHERE doc_id < 50
        |), cfp AS (
        |  SELECT doc_id,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS h
        |  FROM corpus
        |), rfp AS (
        |  SELECT DISTINCT
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS h
        |  FROM reference
        |)
        |SELECT doc_id, h FROM cfp
        |WHERE h NOT IN (SELECT h FROM rfp)""".stripMargin)),

    // The END-TO-END fuzzy-dedup pipeline in one query: MinHash
    // signatures → LSH banding → exact-Jaccard verification →
    // connected components → keep-one-per-cluster, reported as the
    // per-source survivor counts a corpus curation run actually emits.
    // Every stage is the already-gated operator (q54/q55/q99); the
    // composition itself — and the final survivorship arithmetic — is
    // what this gate pins.
    Q("q110_dedup_e2e", { t =>
        val base = t.documents.filter(col("doc_id") < 400)
          .select(col("doc_id"), col("source"), col("text"))
        val corpus = graft.core.CacheScope.persist(base.unionByName(
          base.filter(col("doc_id") < 100)
            .select((col("doc_id") + 1000000L).as("doc_id"),
                    col("source"), col("text"))))
        val dt = graft.core.CacheScope.persist(
          Dedup.docTokens(corpus, col("doc_id"), col("text")))
        val sigs = Dedup.minhashSignatures(dt, 6)
        val cand = Dedup.lshCandidatePairs(sigs, 6, 2)
        val dup = Dedup.jaccardForPairs(cand, dt)
          .filter(col("jaccard") >= 0.97)
        val cc = Dedup.connectedComponents(dup.select("a", "b"))
          .withColumnRenamed("node", "doc_id")
        corpus.join(cc, Seq("doc_id"), "left")
          .withColumn("keep",
            (col("cluster").isNull ||
             col("cluster") === col("doc_id")).cast("long"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
               sum(col("cluster").isNotNull.cast("long"))
                 .as("n_dup_members"),
               sum(lit(1L) - col("keep")).as("n_dropped"),
               sum(col("keep")).as("n_kept"))
      },
      Some("""WITH RECURSIVE corpus AS (
        |  SELECT doc_id, source, text FROM documents WHERE doc_id < 400
        |  UNION ALL
        |  SELECT doc_id + 1000000, source, text FROM documents
        |  WHERE doc_id < 100
        |), dt AS (
        |  SELECT DISTINCT doc_id, tok FROM (
        |    SELECT doc_id,
        |      unnest(string_split_regex(lower(text), '\s+')) AS tok
        |    FROM corpus) t
        |), sigs AS (
        |  SELECT doc_id,
        |    MIN(md5('0:' || tok)) AS mh_0, MIN(md5('1:' || tok)) AS mh_1,
        |    MIN(md5('2:' || tok)) AS mh_2, MIN(md5('3:' || tok)) AS mh_3,
        |    MIN(md5('4:' || tok)) AS mh_4, MIN(md5('5:' || tok)) AS mh_5
        |  FROM dt GROUP BY doc_id
        |), buckets AS (
        |  SELECT doc_id, 0 AS band, md5(mh_0 || mh_1) AS bucket FROM sigs
        |  UNION ALL
        |  SELECT doc_id, 1, md5(mh_2 || mh_3) FROM sigs
        |  UNION ALL
        |  SELECT doc_id, 2, md5(mh_4 || mh_5) FROM sigs
        |), cand AS (
        |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        |  FROM buckets x JOIN buckets y
        |    ON x.band = y.band AND x.bucket = y.bucket
        |       AND x.doc_id < y.doc_id
        |), sizes AS (SELECT doc_id, COUNT(*) AS n FROM dt GROUP BY 1),
        |inter AS (
        |  SELECT cand.a, cand.b, COUNT(*) AS inter
        |  FROM cand
        |  JOIN dt ta ON ta.doc_id = cand.a
        |  JOIN dt tb ON tb.doc_id = cand.b AND tb.tok = ta.tok
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT inter.a, inter.b
        |  FROM inter
        |  JOIN sizes sa ON sa.doc_id = inter.a
        |  JOIN sizes sb ON sb.doc_id = inter.b
        |  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.97
        |), edges AS (
        |  SELECT a AS src, b AS dst FROM pairs
        |  UNION
        |  SELECT b, a FROM pairs
        |), reach(node, lab) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
        |), cc AS (
        |  SELECT node, MIN(lab) AS cluster FROM reach GROUP BY node
        |)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN cc.cluster IS NOT NULL THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_dup_members,
        |  CAST(SUM(CASE WHEN cc.cluster IS NOT NULL
        |                 AND cc.cluster <> corpus.doc_id
        |            THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        |  CAST(SUM(CASE WHEN cc.cluster IS NULL
        |                 OR cc.cluster = corpus.doc_id
        |            THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM corpus LEFT JOIN cc ON cc.node = corpus.doc_id
        |GROUP BY source""".stripMargin)),

    // Multi-probe SimHash near-dup pairs: (h+1) disjoint bit-segment
    // bucketings give FULL recall at Hamming ≤ 6 (pigeonhole), verified
    // by bit_count(xor). Bounded to doc_id < 300 to keep the
    // degenerate-vocabulary bucket fan-out quadratic-safe.
    Q("q93_simhash_multiprobe", { t =>
        val sigs = Dedup.simhash(Dedup.docTokens(
          t.documents.filter(col("doc_id") < 300),
          col("doc_id"), col("text")))
        Dedup.simhashPairsMultiProbe(sigs, bits = 60, maxHamming = 6)
      },
      Some {
        val segs = (0 until 7).map { s =>
          val lo = s * 8
          val mask = if (s == 6) (1L << 12) - 1 else 255L
          s"SELECT doc_id, sig, $s AS seg, (sig >> $lo) & $mask AS bucket FROM sigs"
        }.mkString("\n  UNION ALL\n  ")
        s"""WITH dt AS (
           |  SELECT DISTINCT doc_id, tok FROM (
           |    SELECT doc_id,
           |      unnest(string_split_regex(lower(text), '\\s+')) AS tok
           |    FROM documents WHERE doc_id < 300) t
           |), vh AS (
           |  SELECT tok, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
           |  FROM (SELECT DISTINCT tok FROM dt) v
           |), vb AS (
           |  SELECT tok, b, ((h >> CAST(b AS INT)) & 1) * 2 - 1 AS c
           |  FROM vh, UNNEST(generate_series(0, 59)) t(b)
           |), s AS (
           |  SELECT doc_id, b, SUM(c) AS s
           |  FROM dt JOIN vb USING (tok) GROUP BY 1, 2
           |), sigs AS (
           |  SELECT doc_id,
           |    CAST(SUM(CASE WHEN s > 0
           |         THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
           |         ELSE 0 END) AS BIGINT) AS sig
           |  FROM s GROUP BY doc_id
           |), buckets AS (
           |  $segs
           |)
           |SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
           |  CAST(bit_count(xor(x.sig, y.sig)) AS INT) AS hamming
           |FROM buckets x JOIN buckets y
           |  ON x.seg = y.seg AND x.bucket = y.bucket
           |     AND x.doc_id < y.doc_id
           |WHERE bit_count(xor(x.sig, y.sig)) <= 6""".stripMargin
      }),

    // SimHash 60-bit signatures via md5 token hashes + bitwise votes.
    Q("q57_simhash",
      t => Dedup.simhash(
        Dedup.docTokens(t.documents, col("doc_id"), col("text"))),
      Some(dtCte + """,
        |vh AS (
        |  SELECT tok, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
        |  FROM (SELECT DISTINCT tok FROM dt) v
        |), vb AS (
        |  SELECT tok, b, ((h >> CAST(b AS INT)) & 1) * 2 - 1 AS c
        |  FROM vh, UNNEST(generate_series(0, 59)) t(b)
        |), s AS (
        |  SELECT doc_id, b, SUM(c) AS s
        |  FROM dt JOIN vb USING (tok) GROUP BY 1, 2
        |)
        |SELECT doc_id,
        |  CAST(SUM(CASE WHEN s > 0
        |       THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
        |       ELSE 0 END) AS BIGINT) AS sig
        |FROM s GROUP BY doc_id""".stripMargin)),

    // MinHash-LSH banding calibration: the (b, r) S-curve optimizer
    // that picks q55's banding before the corpus-scale run. Bit-exact
    // cross-engine by construction (9-decimal terms accumulated as
    // exact decimals — see Dedup.lshCalibrate), so the full table
    // INCLUDING the argmin choice is hash-gated strict against an
    // independently-written DuckDB integration of the same rule.
    Q("q155_lsh_calibrate",
      t => Dedup.lshCalibrate(t.spark, numHashes = 128, threshold = 0.8),
      Some("""WITH params AS (
        |  SELECT b, 128 // b AS r FROM range(1, 129) t(b)
        |  WHERE 128 % b = 0
        |), terms AS (
        |  SELECT b, r, (2*k + 1) / 1000.0 AS s,
        |    1.0 - pow(1.0 - pow((2*k + 1) / 1000.0, r), b) AS p
        |  FROM params CROSS JOIN range(0, 500) g(k)
        |), agg AS (
        |  SELECT b, r,
        |    SUM(CASE WHEN s < 0.8 THEN round(p, 9)::DECIMAL(18,9)
        |             ELSE 0::DECIMAL(18,9) END) AS fp_sum,
        |    SUM(CASE WHEN s >= 0.8 THEN round(1.0 - p, 9)::DECIMAL(18,9)
        |             ELSE 0::DECIMAL(18,9) END) AS fn_sum
        |  FROM terms GROUP BY b, r
        |), sc AS (
        |  SELECT b, r, round(fp_sum::DOUBLE / 500, 6) AS fp,
        |    round(fn_sum::DOUBLE / 500, 6) AS fn
        |  FROM agg
        |), fin AS (
        |  SELECT b, r, fp, fn, round(0.5*fp + 0.5*fn, 7) AS err FROM sc
        |)
        |SELECT b, r, fp, fn, err,
        |  (ROW_NUMBER() OVER (ORDER BY err, b) = 1) AS chosen
        |FROM fin""".stripMargin)),

    // The PRODUCTION bounded fuzzy-dedup operator (fuzzyDedupBounded —
    // capped LSH + exact-dup routing + CC + survivorship), gated on a
    // corpus with a PLANTED MEGA-BUCKET: 30 verbatim copies of doc 0
    // form a 31-member exact-duplicate group whose every LSH band
    // bucket exceeds the cap (20), so the capped chain finds NONE of
    // their pairs via LSH — the exact-dup routing must recover them
    // (planted_exact: all 30 copies dropped, canonical doc 0 survives
    // in its own source). A second planted family (5 near-dups on a
    // private 60-token vocabulary, pairwise Jaccard 60/62 ≈ 0.968,
    // NOT exact dups, bucket size 5 < cap) proves the LSH path still
    // fires under the cap (planted_near: one survivor). The oracle
    // runs the SAME capped edge set — bucket-size filter, exact-dup
    // star edges — through DuckDB's recursive-CTE closure.
    Q("q186_fuzzy_dedup_bounded", { t =>
        val shared = (0 until 60).map(i => s"zn$i").mkString(" ")
        val base = t.documents.filter(col("doc_id") < 400)
          .select(col("doc_id"), col("source"), col("text"))
        val seed = t.documents.filter(col("doc_id") === 0)
          .select(col("text"))
        val copies = t.spark.range(0, 30).toDF("j")
          .crossJoin(broadcast(seed))
          .select((col("j") + 2000000L).as("doc_id"),
                  lit("planted_exact").as("source"), col("text"))
        val near = t.spark.range(0, 5).toDF("j")
          .select((col("j") + 3000000L).as("doc_id"),
                  lit("planted_near").as("source"),
                  concat(lit(shared + " zvar"),
                         col("j").cast("string")).as("text"))
        val corpus = base.unionByName(copies).unionByName(near)
        Dedup.fuzzyDedupBounded(corpus, col("doc_id"), col("text"),
            jaccardThreshold = 0.9, maxBucketSize = 20)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
               sum(col("cluster").isNotNull.cast("long"))
                 .as("n_dup_members"),
               sum(lit(1L) - col("keep")).as("n_dropped"),
               sum(col("keep")).as("n_kept"))
      },
      Some(s"""WITH RECURSIVE corpus AS (
        |  SELECT doc_id, source, text FROM documents WHERE doc_id < 400
        |  UNION ALL
        |  SELECT 2000000 + j, 'planted_exact',
        |    (SELECT text FROM documents WHERE doc_id = 0)
        |  FROM generate_series(0, 29) t(j)
        |  UNION ALL
        |  SELECT 3000000 + j, 'planted_near',
        |    '${(0 until 60).map(i => s"zn$i").mkString(" ")} zvar'
        |      || CAST(j AS VARCHAR)
        |  FROM generate_series(0, 4) t(j)
        |), dt AS (
        |  SELECT DISTINCT doc_id, tok FROM (
        |    SELECT doc_id,
        |      unnest(string_split_regex(lower(text), '\\s+')) AS tok
        |    FROM corpus) t
        |), sigs AS (
        |  SELECT doc_id,
        |    MIN(md5('0:' || tok)) AS mh_0, MIN(md5('1:' || tok)) AS mh_1,
        |    MIN(md5('2:' || tok)) AS mh_2, MIN(md5('3:' || tok)) AS mh_3,
        |    MIN(md5('4:' || tok)) AS mh_4, MIN(md5('5:' || tok)) AS mh_5
        |  FROM dt GROUP BY doc_id
        |), buckets AS (
        |  SELECT doc_id, 0 AS band, md5(mh_0 || mh_1) AS bucket FROM sigs
        |  UNION ALL
        |  SELECT doc_id, 1, md5(mh_2 || mh_3) FROM sigs
        |  UNION ALL
        |  SELECT doc_id, 2, md5(mh_4 || mh_5) FROM sigs
        |), bsz AS (
        |  SELECT band, bucket, COUNT(*) AS bn FROM buckets GROUP BY 1, 2
        |), capped AS (
        |  SELECT b.doc_id, b.band, b.bucket
        |  FROM buckets b JOIN bsz USING (band, bucket) WHERE bn <= 20
        |), cand AS (
        |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        |  FROM capped x JOIN capped y
        |    ON x.band = y.band AND x.bucket = y.bucket
        |       AND x.doc_id < y.doc_id
        |), sizes AS (SELECT doc_id, COUNT(*) AS n FROM dt GROUP BY 1),
        |inter AS (
        |  SELECT cand.a, cand.b, COUNT(*) AS inter
        |  FROM cand
        |  JOIN dt ta ON ta.doc_id = cand.a
        |  JOIN dt tb ON tb.doc_id = cand.b AND tb.tok = ta.tok
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT inter.a, inter.b
        |  FROM inter
        |  JOIN sizes sa ON sa.doc_id = inter.a
        |  JOIN sizes sb ON sb.doc_id = inter.b
        |  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.9
        |), exgroups AS (
        |  SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
        |      AS h,
        |    MIN(doc_id) AS canonical
        |  FROM corpus GROUP BY 1 HAVING COUNT(*) > 1
        |), exedges AS (
        |  SELECT g.canonical AS a, c.doc_id AS b
        |  FROM corpus c
        |  JOIN exgroups g
        |    ON md5(regexp_replace(lower(trim(c.text)), '\\s+', ' ', 'g'))
        |       = g.h
        |  WHERE c.doc_id <> g.canonical
        |), edges AS (
        |  SELECT a AS src, b AS dst FROM pairs
        |  UNION SELECT b, a FROM pairs
        |  UNION SELECT a, b FROM exedges
        |  UNION SELECT b, a FROM exedges
        |), reach(node, lab) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
        |), cc AS (
        |  SELECT node, MIN(lab) AS cluster FROM reach GROUP BY node
        |)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN cc.cluster IS NOT NULL THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_dup_members,
        |  CAST(SUM(CASE WHEN cc.cluster IS NOT NULL
        |                 AND cc.cluster <> corpus.doc_id
        |            THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        |  CAST(SUM(CASE WHEN cc.cluster IS NULL
        |                 OR cc.cluster = corpus.doc_id
        |            THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM corpus LEFT JOIN cc ON cc.node = corpus.doc_id
        |GROUP BY source""".stripMargin)),

    // The bounded posture's recall trade, MEASURED (VERDICT r11 next
    // #6): a planted 30-member near-dup family (private 60-token
    // vocabulary + one distinct token each, pairwise Jaccard
    // 60/62 ≈ 0.968 — near-dups, NOT exact dups) lands in band
    // buckets of ~30 members, over the cap of 20, so the capped chain
    // drops its pairs and exact-dup routing cannot recover them. The
    // query reports the uncapped chain's verified-pair count, the
    // capped chain's, and the dropped set's size — the documented
    // "bounded recall trade on degenerate groups" as a number both
    // engines must agree on.
    Q("q187_capped_recall_trade", { t =>
        val shared = (0 until 60).map(i => s"zq$i").mkString(" ")
        val base = t.documents.filter(col("doc_id") < 100)
          .select(col("doc_id"), col("text"))
        val fam = t.spark.range(0, 30).toDF("j")
          .select((col("j") + 3000000L).as("doc_id"),
                  concat(lit(shared + " zu"),
                         col("j").cast("string")).as("text"))
        val corpus = base.unionByName(fam)
        val dt = graft.core.CacheScope.persist(
          Dedup.docTokens(corpus, col("doc_id"), col("text")))
        val sigs = graft.core.CacheScope.persist(
          Dedup.minhashSignatures(dt, 6))
        def verified(cap: Long) =
          Dedup.jaccardForPairs(
              Dedup.lshCandidatePairs(sigs, 6, 2, maxBucketSize = cap), dt)
            .filter(col("jaccard") >= 0.9).select("a", "b")
        val u = graft.core.CacheScope.persist(verified(0))
        val c = graft.core.CacheScope.persist(verified(20))
        u.agg(count(lit(1)).as("n_pairs_uncapped"))
          .crossJoin(c.agg(count(lit(1)).as("n_pairs_capped")))
          .crossJoin(u.except(c)
            .agg(count(lit(1)).as("n_pairs_dropped")))
      },
      Some(s"""WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 100
        |  UNION ALL
        |  SELECT 3000000 + j,
        |    '${(0 until 60).map(i => s"zq$i").mkString(" ")} zu'
        |      || CAST(j AS VARCHAR)
        |  FROM generate_series(0, 29) t(j)
        |), dt AS (
        |  SELECT DISTINCT doc_id, tok FROM (
        |    SELECT doc_id,
        |      unnest(string_split_regex(lower(text), '\\s+')) AS tok
        |    FROM corpus) t
        |), sigs AS (
        |  SELECT doc_id,
        |    MIN(md5('0:' || tok)) AS mh_0, MIN(md5('1:' || tok)) AS mh_1,
        |    MIN(md5('2:' || tok)) AS mh_2, MIN(md5('3:' || tok)) AS mh_3,
        |    MIN(md5('4:' || tok)) AS mh_4, MIN(md5('5:' || tok)) AS mh_5
        |  FROM dt GROUP BY doc_id
        |), buckets AS (
        |  SELECT doc_id, 0 AS band, md5(mh_0 || mh_1) AS bucket FROM sigs
        |  UNION ALL
        |  SELECT doc_id, 1, md5(mh_2 || mh_3) FROM sigs
        |  UNION ALL
        |  SELECT doc_id, 2, md5(mh_4 || mh_5) FROM sigs
        |), bsz AS (
        |  SELECT band, bucket, COUNT(*) AS bn FROM buckets GROUP BY 1, 2
        |), candu AS (
        |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        |  FROM buckets x JOIN buckets y
        |    ON x.band = y.band AND x.bucket = y.bucket
        |       AND x.doc_id < y.doc_id
        |), candc AS (
        |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        |  FROM (SELECT b.* FROM buckets b JOIN bsz USING (band, bucket)
        |        WHERE bn <= 20) x
        |  JOIN (SELECT b.* FROM buckets b JOIN bsz USING (band, bucket)
        |        WHERE bn <= 20) y
        |    ON x.band = y.band AND x.bucket = y.bucket
        |       AND x.doc_id < y.doc_id
        |), sizes AS (SELECT doc_id, COUNT(*) AS n FROM dt GROUP BY 1),
        |pu AS (
        |  SELECT i.a, i.b FROM (
        |    SELECT candu.a, candu.b, COUNT(*) AS inter
        |    FROM candu
        |    JOIN dt ta ON ta.doc_id = candu.a
        |    JOIN dt tb ON tb.doc_id = candu.b AND tb.tok = ta.tok
        |    GROUP BY 1, 2) i
        |  JOIN sizes sa ON sa.doc_id = i.a
        |  JOIN sizes sb ON sb.doc_id = i.b
        |  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.9
        |), pc AS (
        |  SELECT i.a, i.b FROM (
        |    SELECT candc.a, candc.b, COUNT(*) AS inter
        |    FROM candc
        |    JOIN dt ta ON ta.doc_id = candc.a
        |    JOIN dt tb ON tb.doc_id = candc.b AND tb.tok = ta.tok
        |    GROUP BY 1, 2) i
        |  JOIN sizes sa ON sa.doc_id = i.a
        |  JOIN sizes sb ON sb.doc_id = i.b
        |  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.9
        |)
        |SELECT (SELECT COUNT(*) FROM pu) AS n_pairs_uncapped,
        |  (SELECT COUNT(*) FROM pc) AS n_pairs_capped,
        |  (SELECT COUNT(*) FROM
        |     (SELECT a, b FROM pu EXCEPT SELECT a, b FROM pc) d)
        |    AS n_pairs_dropped""".stripMargin)),

    // Content-hash snapshot diff between two corpus versions — the
    // refresh planted in-query so both engines diff identical
    // snapshots: every 7th doc removed, every surviving 10th changed
    // (" v2" appended), five fresh ids added.
    Q("q197_snapshot_diff", { t =>
        val old = t.documents.select(col("doc_id"), col("text"))
        val newer = old.filter(col("doc_id") % 7 =!= 0)
          .withColumn("text",
            when(col("doc_id") % 10 === 0,
                 concat(col("text"), lit(" v2")))
              .otherwise(col("text")))
          .unionByName(old.filter(col("doc_id") < 5)
            .select((col("doc_id") + 100000).as("doc_id"),
                    concat(lit("fresh "), col("text")).as("text")))
        Dedup.snapshotDiff(old, newer, col("doc_id"), col("text"))
      },
      Some("""WITH oldd AS (
        |  SELECT doc_id, md5(text) AS old_hash FROM documents
        |), newd AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 10 = 0 THEN text || ' v2'
        |        ELSE text END) AS new_hash
        |  FROM documents WHERE doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id + 100000, md5('fresh ' || text)
        |  FROM documents WHERE doc_id < 5
        |)
        |SELECT COALESCE(oldd.doc_id, newd.doc_id) AS doc_id,
        |  CASE WHEN oldd.doc_id IS NULL THEN 'added'
        |       WHEN newd.doc_id IS NULL THEN 'removed'
        |       WHEN old_hash = new_hash THEN 'unchanged'
        |       ELSE 'changed' END AS status,
        |  old_hash, new_hash
        |FROM oldd FULL OUTER JOIN newd ON oldd.doc_id = newd.doc_id"""
        .stripMargin)),

    // Paragraph-level exact dedup with reassembly (Dolma/RefinedWeb
    // granularity): paragraphs planted in-query — two 10-token slices
    // of each doc plus a global boilerplate paragraph (and every 7th
    // doc repeats its own first slice), so cross-doc boilerplate,
    // natural slice collisions, and intra-doc repeats all occur.
    Q("q198_paragraph_dedup", { t =>
        val toks = split(lower(col("text")), "\\s+")
        val p1 = array_join(slice(toks, 1, 10), " ")
        val p2 = array_join(slice(toks, 11, 10), " ")
        val planted = t.documents.select(col("doc_id"),
          concat_ws("\n\n", p1,
            lit("subscribe to our newsletter today"), p2,
            when(col("doc_id") % 7 === 0, p1)).as("text"))
        Dedup.paragraphDedup(planted, col("doc_id"), col("text"))
      },
      Some("""WITH planted AS (
        |  SELECT doc_id,
        |    concat_ws(chr(10) || chr(10),
        |      array_to_string(list_slice(
        |        string_split_regex(lower(text), '\s+'), 1, 10), ' '),
        |      'subscribe to our newsletter today',
        |      array_to_string(list_slice(
        |        string_split_regex(lower(text), '\s+'), 11, 20), ' '),
        |      CASE WHEN doc_id % 7 = 0 THEN array_to_string(list_slice(
        |        string_split_regex(lower(text), '\s+'), 1, 10), ' ')
        |      END) AS text
        |  FROM documents
        |), paras AS (
        |  SELECT doc_id, CAST(i - 1 AS INT) AS para_idx,
        |    list_extract(string_split(text, chr(10) || chr(10)),
        |                 CAST(i AS INT)) AS para
        |  FROM planted,
        |    UNNEST(generate_series(1,
        |      len(string_split(text, chr(10) || chr(10))))) t(i)
        |), hashed AS (
        |  SELECT doc_id, para_idx, para,
        |    ROW_NUMBER() OVER (
        |      PARTITION BY md5(regexp_replace(lower(trim(para)),
        |                                      '\s+', ' ', 'g'))
        |      ORDER BY doc_id, para_idx) AS rn
        |  FROM paras WHERE trim(para) <> ''
        |)
        |SELECT doc_id,
        |  COALESCE(string_agg(CASE WHEN rn = 1 THEN para END,
        |    chr(10) || chr(10) ORDER BY para_idx), '') AS text,
        |  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_paras_kept,
        |  CAST(SUM(CASE WHEN rn = 1 THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_paras_dropped
        |FROM hashed GROUP BY doc_id""".stripMargin)),

    // Incremental refresh dedup: q197's refresh planting extended with
    // three added exact copies of standing docs, one fresh unique doc,
    // an added intra-delta twin pair, and an added NULL-text twin pair
    // (the ADVICE r12 regression class: a raw-NULL hash key silently
    // dropped null-text delta docs from the report — the sentinel hash
    // must intra-delta dedup them instead) — dedup work runs on the
    // DELTA only, unchanged docs always keep.
    Q("q205_incremental_dedup", { t =>
        val old = t.documents.select(col("doc_id"), col("text"))
        val survivors = old.filter(col("doc_id") % 7 =!= 0)
          .withColumn("text",
            when(col("doc_id") % 10 === 0,
                 concat(col("text"), lit(" v2")))
              .otherwise(col("text")))
        val copies = old.filter(col("doc_id").isin(1, 2, 3))
          .select((col("doc_id") + 100000).as("doc_id"), col("text"))
        val fresh = old.filter(col("doc_id") === 0)
          .select(lit(100010L).as("doc_id"),
                  lit("completely fresh addition text").as("text"))
        val twins = old.filter(col("doc_id") < 2)
          .select((col("doc_id") + 100020).as("doc_id"),
                  lit("fresh twin text").as("text"))
        val nulls = old.filter(col("doc_id") < 2)
          .select((col("doc_id") + 100031).as("doc_id"),
                  lit(null).cast("string").as("text"))
        val newer = survivors.unionByName(copies)
          .unionByName(fresh).unionByName(twins).unionByName(nulls)
        Dedup.incrementalDedup(old, newer, col("doc_id"), col("text"))
      },
      Some("""WITH oldd AS (SELECT doc_id, text FROM documents
        |), newer AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 10 = 0 THEN text || ' v2'
        |         ELSE text END AS text
        |  FROM documents WHERE doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM documents
        |  WHERE doc_id IN (1, 2, 3)
        |  UNION ALL
        |  SELECT CAST(100010 AS BIGINT),
        |    'completely fresh addition text'
        |  FROM documents WHERE doc_id = 0
        |  UNION ALL
        |  SELECT doc_id + 100020, 'fresh twin text'
        |  FROM documents WHERE doc_id < 2
        |  UNION ALL
        |  SELECT doc_id + 100031, CAST(NULL AS VARCHAR)
        |  FROM documents WHERE doc_id < 2
        |), diff AS (
        |  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        |    CASE WHEN o.doc_id IS NULL THEN 'added'
        |         WHEN n.doc_id IS NULL THEN 'removed'
        |         WHEN md5(o.text) IS NOT DISTINCT FROM md5(n.text)
        |           THEN 'unchanged'
        |         ELSE 'changed' END AS status
        |  FROM oldd o FULL OUTER JOIN newer n ON o.doc_id = n.doc_id
        |), d AS (
        |  SELECT diff.doc_id, status,
        |    COALESCE(
        |      md5(regexp_replace(lower(trim(n.text)), '\s+', ' ', 'g')),
        |      '__graft_null_text__') AS nh
        |  FROM diff JOIN newer n ON n.doc_id = diff.doc_id
        |  WHERE status <> 'removed'
        |), standing AS (
        |  SELECT nh, MIN(doc_id) AS standing_dup FROM d
        |  WHERE status = 'unchanged' GROUP BY 1
        |), deltac AS (
        |  SELECT nh, MIN(doc_id) AS delta_canon FROM d
        |  WHERE status <> 'unchanged' GROUP BY 1
        |)
        |SELECT doc_id, status, CAST(NULL AS BIGINT) AS dup_of,
        |  CAST(1 AS BIGINT) AS keep
        |FROM d WHERE status = 'unchanged'
        |UNION ALL
        |SELECT d.doc_id, d.status,
        |  COALESCE(standing_dup,
        |    CASE WHEN delta_canon < d.doc_id THEN delta_canon END)
        |    AS dup_of,
        |  CAST(CASE WHEN COALESCE(standing_dup,
        |    CASE WHEN delta_canon < d.doc_id THEN delta_canon END)
        |    IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM d LEFT JOIN standing USING (nh) JOIN deltac USING (nh)
        |WHERE d.status <> 'unchanged'""".stripMargin)),

    // MEASURED LSH recall against exact ground truth: the MinHash/LSH
    // chain (6 hashes, 3 bands of 2) evaluated against setSimJoin's
    // EXACT pair set on the same 3-shingle corpus at tau = 0.8 — the
    // probabilistic chain's recall was previously only theoretical
    // (the q155 S-curve); setSimJoin makes it a measured number both
    // engines must agree on. LSH-verified pairs are a SUBSET of the
    // exact set by construction (same verification predicate over
    // true sets), so the single output row is (n_exact, n_lsh_found,
    // n_missed, recall) with recall an exact integer ratio in double.
    Q("q206_lsh_recall_vs_exact", { t =>
        val toks = split(lower(col("text")), "\\s+")
        val base = t.documents.select(col("doc_id"), col("text"))
        val planted = base.unionByName(
          t.documents.filter(col("doc_id") % 25 === 0)
            .select((col("doc_id") + 100000).as("doc_id"),
              array_join(
                slice(toks, lit(1), greatest(size(toks) - 3, lit(1))),
                " ").as("text")))
        val sh = graft.core.CacheScope.persist(
          Dedup.shingles(planted, col("doc_id"), col("text"), 3)
            .withColumnRenamed("shingle", "tok"))
        val exact = Dedup.setSimJoin(sh, 0.8, distinctInput = true)
          .select("a", "b")
        val sigs = Dedup.minhashSignatures(sh, 6)
        // maxBucketSize = 0: the EXPLICIT unbounded opt-in — the oracle
        // tower below is uncapped, so the engine side must match
        // STRUCTURALLY rather than rely on the fixture staying under
        // the default cap (ADVICE r12)
        val cand = Dedup.lshCandidatePairs(sigs, 6, 2, maxBucketSize = 0)
        val found = Dedup.jaccardForPairs(cand, sh)
          .filter(col("jaccard") >= 0.8)
          .select(col("a"), col("b"), lit(1L).as("f"))
        exact.join(found, Seq("a", "b"), "left")
          .agg(count(lit(1)).as("n_exact"),
               sum(coalesce(col("f"), lit(0L))).as("n_lsh_found"),
               (count(lit(1)) - sum(coalesce(col("f"), lit(0L))))
                 .as("n_missed"),
               (sum(coalesce(col("f"), lit(0L))).cast("double") /
                count(lit(1))).as("recall"))
      },
      Some("""WITH planted AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id,
        |    array_to_string(list_slice(
        |      string_split_regex(lower(text), '\s+'), 1,
        |      greatest(len(string_split_regex(lower(text), '\s+')) - 3,
        |               1)), ' ') AS text
        |  FROM documents WHERE doc_id % 25 = 0
        |), stoks AS (
        |  SELECT doc_id, i AS pos,
        |    list_extract(string_split_regex(lower(text), '\s+'),
        |                 CAST(i AS INT)) AS tok
        |  FROM planted, UNNEST(generate_series(1,
        |    len(string_split_regex(lower(text), '\s+')))) t(i)
        |), sh AS (
        |  SELECT DISTINCT doc_id, tok || ' ' || t1 || ' ' || t2 AS tok
        |  FROM (
        |    SELECT doc_id, tok,
        |      LEAD(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t1,
        |      LEAD(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
        |    FROM stoks) z
        |  WHERE t2 IS NOT NULL
        |), dfreq AS (SELECT tok, COUNT(*) AS df FROM sh GROUP BY 1
        |), sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1
        |), pref AS (
        |  SELECT doc_id, tok, n FROM (
        |    SELECT s.doc_id, s.tok, z.n,
        |      ROW_NUMBER() OVER (PARTITION BY s.doc_id
        |        ORDER BY d.df, s.tok) AS rnk
        |    FROM sh s JOIN dfreq d USING (tok)
        |    JOIN sizes z USING (doc_id)) y
        |  WHERE rnk <= n - ceil(n * CAST(0.80 AS DECIMAL(8,6))) + 1
        |), candE AS (
        |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
        |  FROM pref a JOIN pref b ON a.tok = b.tok
        |    AND a.doc_id < b.doc_id
        |    AND a.n * CAST(0.80 AS DECIMAL(8,6)) <= b.n
        |    AND b.n * CAST(0.80 AS DECIMAL(8,6)) <= a.n
        |), interE AS (
        |  SELECT c.a, c.b, COUNT(*) AS i
        |  FROM candE c
        |  JOIN sh ta ON ta.doc_id = c.a
        |  JOIN sh tb ON tb.doc_id = c.b AND tb.tok = ta.tok
        |  GROUP BY 1, 2
        |), exact AS (
        |  SELECT a, b FROM interE
        |  JOIN sizes sa ON interE.a = sa.doc_id
        |  JOIN sizes sb ON interE.b = sb.doc_id
        |  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
        |), sigs AS (
        |  SELECT doc_id,
        |    MIN(md5('0:' || tok)) AS mh_0, MIN(md5('1:' || tok)) AS mh_1,
        |    MIN(md5('2:' || tok)) AS mh_2, MIN(md5('3:' || tok)) AS mh_3,
        |    MIN(md5('4:' || tok)) AS mh_4, MIN(md5('5:' || tok)) AS mh_5
        |  FROM sh GROUP BY doc_id
        |), buckets AS (
        |  SELECT doc_id, 0 AS band, md5(mh_0 || mh_1) AS bucket FROM sigs
        |  UNION ALL
        |  SELECT doc_id, 1, md5(mh_2 || mh_3) FROM sigs
        |  UNION ALL
        |  SELECT doc_id, 2, md5(mh_4 || mh_5) FROM sigs
        |), candL AS (
        |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        |  FROM buckets x JOIN buckets y
        |    ON x.band = y.band AND x.bucket = y.bucket
        |       AND x.doc_id < y.doc_id
        |), interL AS (
        |  SELECT c.a, c.b, COUNT(*) AS i
        |  FROM candL c
        |  JOIN sh ta ON ta.doc_id = c.a
        |  JOIN sh tb ON tb.doc_id = c.b AND tb.tok = ta.tok
        |  GROUP BY 1, 2
        |), found AS (
        |  SELECT a, b, 1 AS f FROM interL
        |  JOIN sizes sa ON interL.a = sa.doc_id
        |  JOIN sizes sb ON interL.b = sb.doc_id
        |  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
        |)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_exact,
        |  CAST(SUM(COALESCE(f, 0)) AS BIGINT) AS n_lsh_found,
        |  CAST(COUNT(*) - SUM(COALESCE(f, 0)) AS BIGINT) AS n_missed,
        |  CAST(SUM(COALESCE(f, 0)) AS DOUBLE) / COUNT(*) AS recall
        |FROM exact LEFT JOIN found USING (a, b)""".stripMargin)),

    // EXACT set-similarity join (prefix filtering, ppjoin family) over
    // 3-shingle sets at Jaccard >= 0.8 — every 25th doc gains a planted
    // near-dup twin (last three tokens dropped), so true pairs exist at
    // a spread of Jaccard values around the threshold. The jaccard
    // column is an exact integer ratio in double — no rounding anywhere.
    Q("q204_set_sim_join", { t =>
        val toks = split(lower(col("text")), "\\s+")
        val base = t.documents.select(col("doc_id"), col("text"))
        val planted = base.unionByName(
          t.documents.filter(col("doc_id") % 25 === 0)
            .select((col("doc_id") + 100000).as("doc_id"),
              array_join(
                slice(toks, lit(1), greatest(size(toks) - 3, lit(1))),
                " ").as("text")))
        val sh = Dedup.shingles(planted, col("doc_id"), col("text"), 3)
          .withColumnRenamed("shingle", "tok")
        Dedup.setSimJoin(sh, 0.8, distinctInput = true)
      },
      Some("""WITH planted AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id,
        |    array_to_string(list_slice(
        |      string_split_regex(lower(text), '\s+'), 1,
        |      greatest(len(string_split_regex(lower(text), '\s+')) - 3,
        |               1)), ' ') AS text
        |  FROM documents WHERE doc_id % 25 = 0
        |), stoks AS (
        |  SELECT doc_id, i AS pos,
        |    list_extract(string_split_regex(lower(text), '\s+'),
        |                 CAST(i AS INT)) AS tok
        |  FROM planted, UNNEST(generate_series(1,
        |    len(string_split_regex(lower(text), '\s+')))) t(i)
        |), sh AS (
        |  SELECT DISTINCT doc_id, tok || ' ' || t1 || ' ' || t2 AS tok
        |  FROM (
        |    SELECT doc_id, tok,
        |      LEAD(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t1,
        |      LEAD(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t2
        |    FROM stoks) z
        |  WHERE t2 IS NOT NULL
        |), dfreq AS (SELECT tok, COUNT(*) AS df FROM sh GROUP BY 1
        |), sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1
        |), pref AS (
        |  SELECT doc_id, tok, n FROM (
        |    SELECT s.doc_id, s.tok, z.n,
        |      ROW_NUMBER() OVER (PARTITION BY s.doc_id
        |        ORDER BY d.df, s.tok) AS rnk
        |    FROM sh s JOIN dfreq d USING (tok)
        |    JOIN sizes z USING (doc_id)) y
        |  WHERE rnk <= n - ceil(n * CAST(0.80 AS DECIMAL(3,2))) + 1
        |), cand AS (
        |  SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
        |  FROM pref a JOIN pref b ON a.tok = b.tok
        |    AND a.doc_id < b.doc_id
        |    AND a.n * CAST(0.80 AS DECIMAL(3,2)) <= b.n
        |    AND b.n * CAST(0.80 AS DECIMAL(3,2)) <= a.n
        |), inter AS (
        |  SELECT c.a, c.b, COUNT(*) AS i
        |  FROM cand c
        |  JOIN sh ta ON ta.doc_id = c.a
        |  JOIN sh tb ON tb.doc_id = c.b AND tb.tok = ta.tok
        |  GROUP BY 1, 2
        |)
        |SELECT a, b,
        |  CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
        |FROM inter
        |JOIN sizes sa ON inter.a = sa.doc_id
        |JOIN sizes sb ON inter.b = sb.doc_id
        |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8"""
        .stripMargin)),

    // Incremental NEAR-dup refresh (VERDICT r12 Missing #3): q205's
    // refresh shape, with PARAPHRASES planted — an added doc carrying
    // a standing doc's text minus its last 3 tokens re-enters the
    // corpus under exact hashing but must be dropped by the LSH probe
    // of the standing buckets (near_dup_of = the standing id). Also
    // planted: one added exact copy (must route through the EXACT
    // tier: dup_of set, near_dup_of null), an intra-delta near pair
    // built from a REMOVED doc's text (keep-first within the delta),
    // and a fresh unique doc (keeps). Delta plantings are BOUNDED
    // to copy-0 ids (the q110 constant-bound convention) so the
    // oracle's LSH tower and the bench cost stay constant across SFs
    // -- the PROPORTIONAL-delta scale story is the soak op's job.
    // The oracle mirrors the whole
    // tower — exact tier, MinHash signatures, band buckets with BOTH
    // side caps, the standing/delta probe, exact-Jaccard verify at
    // tau = 0.8, and the (standing-first, then smallest-id) pick.
    Q("q210_incremental_neardup", { t =>
        val old = t.documents.select(col("doc_id"), col("text"))
        val toks = split(col("text"), "\\s+")
        def headToks(drop: Int) = array_join(
          slice(toks, lit(1), greatest(size(toks) - drop, lit(1))), " ")
        val survivors = old.filter(col("doc_id") % 7 =!= 0)
          .withColumn("text",
            when(col("doc_id") % 10 === 0 && col("doc_id") < 1000,
                 concat(col("text"), lit(" v2")))
              .otherwise(col("text")))
        val paraphrases = old
          .filter(col("doc_id") % 50 === 1 && col("doc_id") % 7 =!= 0 &&
                  col("doc_id") < 1000)
          .select((col("doc_id") + 100000).as("doc_id"),
                  headToks(3).as("text"))
        val exactCopy = old.filter(col("doc_id") === 2)
          .select(lit(100500L).as("doc_id"), col("text"))
        val intraA = old.filter(col("doc_id") === 7)
          .select(lit(100900L).as("doc_id"), col("text"))
        val intraB = old.filter(col("doc_id") === 7)
          .select(lit(100901L).as("doc_id"), headToks(2).as("text"))
        val fresh = old.filter(col("doc_id") === 0)
          .select(lit(100910L).as("doc_id"),
                  lit("totally novel fresh document text xyz").as("text"))
        val newer = survivors.unionByName(paraphrases)
          .unionByName(exactCopy).unionByName(intraA)
          .unionByName(intraB).unionByName(fresh)
        Dedup.incrementalDedupNear(old, newer, col("doc_id"),
          col("text"), numHashes = 6, rowsPerBand = 2,
          jaccardThreshold = 0.8)
      },
      Some("""WITH oldd AS (SELECT doc_id, text FROM documents
        |), newer AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 10 = 0 AND doc_id < 1000
        |         THEN text || ' v2'
        |         ELSE text END AS text
        |  FROM documents WHERE doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id + 100000,
        |    array_to_string(list_slice(string_split_regex(text, '\s+'),
        |      1, greatest(len(string_split_regex(text, '\s+')) - 3, 1)),
        |      ' ')
        |  FROM documents
        |  WHERE doc_id % 50 = 1 AND doc_id % 7 <> 0 AND doc_id < 1000
        |  UNION ALL
        |  SELECT CAST(100500 AS BIGINT), text FROM documents
        |  WHERE doc_id = 2
        |  UNION ALL
        |  SELECT CAST(100900 AS BIGINT), text FROM documents
        |  WHERE doc_id = 7
        |  UNION ALL
        |  SELECT CAST(100901 AS BIGINT),
        |    array_to_string(list_slice(string_split_regex(text, '\s+'),
        |      1, greatest(len(string_split_regex(text, '\s+')) - 2, 1)),
        |      ' ')
        |  FROM documents WHERE doc_id = 7
        |  UNION ALL
        |  SELECT CAST(100910 AS BIGINT),
        |    'totally novel fresh document text xyz'
        |  FROM documents WHERE doc_id = 0
        |), diff AS (
        |  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        |    CASE WHEN o.doc_id IS NULL THEN 'added'
        |         WHEN n.doc_id IS NULL THEN 'removed'
        |         WHEN md5(o.text) IS NOT DISTINCT FROM md5(n.text)
        |           THEN 'unchanged'
        |         ELSE 'changed' END AS status
        |  FROM oldd o FULL OUTER JOIN newer n ON o.doc_id = n.doc_id
        |), d AS (
        |  SELECT diff.doc_id, status,
        |    COALESCE(
        |      md5(regexp_replace(lower(trim(n.text)), '\s+', ' ', 'g')),
        |      '__graft_null_text__') AS nh
        |  FROM diff JOIN newer n ON n.doc_id = diff.doc_id
        |  WHERE status <> 'removed'
        |), standing AS (
        |  SELECT nh, MIN(doc_id) AS standing_dup FROM d
        |  WHERE status = 'unchanged' GROUP BY 1
        |), deltac AS (
        |  SELECT nh, MIN(doc_id) AS delta_canon FROM d
        |  WHERE status <> 'unchanged' GROUP BY 1
        |), exact_out AS (
        |  SELECT doc_id, status, CAST(NULL AS BIGINT) AS dup_of
        |  FROM d WHERE status = 'unchanged'
        |  UNION ALL
        |  SELECT d.doc_id, d.status,
        |    COALESCE(standing_dup,
        |      CASE WHEN delta_canon < d.doc_id THEN delta_canon END)
        |  FROM d LEFT JOIN standing USING (nh) JOIN deltac USING (nh)
        |  WHERE d.status <> 'unchanged'
        |), deltaids AS (
        |  SELECT doc_id FROM exact_out
        |  WHERE status <> 'unchanged' AND dup_of IS NULL
        |), unchids AS (
        |  SELECT doc_id FROM exact_out WHERE status = 'unchanged'
        |), toks AS (
        |  SELECT DISTINCT n.doc_id, tok
        |  FROM newer n, UNNEST(string_split_regex(lower(n.text), '\s+'))
        |    t(tok)
        |), sigsD AS (
        |  SELECT doc_id,
        |    MIN(md5('0:' || tok)) AS mh_0, MIN(md5('1:' || tok)) AS mh_1,
        |    MIN(md5('2:' || tok)) AS mh_2, MIN(md5('3:' || tok)) AS mh_3,
        |    MIN(md5('4:' || tok)) AS mh_4, MIN(md5('5:' || tok)) AS mh_5
        |  FROM toks WHERE doc_id IN (SELECT doc_id FROM deltaids)
        |  GROUP BY doc_id
        |), bD AS (
        |  SELECT * FROM (
        |    SELECT doc_id, 0 AS band, md5(mh_0 || mh_1) AS bucket
        |    FROM sigsD
        |    UNION ALL
        |    SELECT doc_id, 1, md5(mh_2 || mh_3) FROM sigsD
        |    UNION ALL
        |    SELECT doc_id, 2, md5(mh_4 || mh_5) FROM sigsD) z
        |  QUALIFY COUNT(*) OVER (PARTITION BY band, bucket) <= 1000
        |), sigsS AS (
        |  SELECT doc_id,
        |    MIN(md5('0:' || tok)) AS mh_0, MIN(md5('1:' || tok)) AS mh_1,
        |    MIN(md5('2:' || tok)) AS mh_2, MIN(md5('3:' || tok)) AS mh_3,
        |    MIN(md5('4:' || tok)) AS mh_4, MIN(md5('5:' || tok)) AS mh_5
        |  FROM toks WHERE doc_id IN (SELECT doc_id FROM unchids)
        |  GROUP BY doc_id
        |), bS AS (
        |  SELECT * FROM (
        |    SELECT doc_id, 0 AS band, md5(mh_0 || mh_1) AS bucket
        |    FROM sigsS
        |    UNION ALL
        |    SELECT doc_id, 1, md5(mh_2 || mh_3) FROM sigsS
        |    UNION ALL
        |    SELECT doc_id, 2, md5(mh_4 || mh_5) FROM sigsS) z
        |  QUALIFY COUNT(*) OVER (PARTITION BY band, bucket) <= 1000
        |), cand AS (
        |  SELECT DISTINCT dd.doc_id AS a, s.doc_id AS b
        |  FROM bD dd JOIN bS s USING (band, bucket)
        |  UNION
        |  SELECT DISTINCT dd.doc_id AS a, e.doc_id AS b
        |  FROM bD dd JOIN bD e USING (band, bucket)
        |  WHERE e.doc_id < dd.doc_id
        |), sizes AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY 1
        |), inter AS (
        |  SELECT c.a, c.b, COUNT(*) AS i
        |  FROM cand c
        |  JOIN toks ta ON ta.doc_id = c.a
        |  JOIN toks tb ON tb.doc_id = c.b AND tb.tok = ta.tok
        |  GROUP BY 1, 2
        |), ver AS (
        |  SELECT a, b FROM inter
        |  JOIN sizes sa ON inter.a = sa.doc_id
        |  JOIN sizes sb ON inter.b = sb.doc_id
        |  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
        |), near AS (
        |  SELECT doc_id, b AS near_dup_of FROM (
        |    SELECT v.a AS doc_id, v.b,
        |      ROW_NUMBER() OVER (PARTITION BY v.a ORDER BY
        |        CASE WHEN u.doc_id IS NOT NULL THEN 0 ELSE 1 END, v.b)
        |        AS rn
        |    FROM ver v LEFT JOIN unchids u ON v.b = u.doc_id) z
        |  WHERE rn = 1
        |)
        |SELECT e.doc_id, e.status, e.dup_of,
        |  CASE WHEN e.dup_of IS NULL THEN n.near_dup_of END
        |    AS near_dup_of,
        |  CAST(CASE WHEN e.dup_of IS NULL AND n.near_dup_of IS NULL
        |    THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM exact_out e LEFT JOIN near n USING (doc_id)"""
        .stripMargin)),

    // STANDING-BUCKET STATE ADVANCE across TWO refreshes (VERDICT r13
    // next #2 — closes the delta-sized refresh loop): refresh 1 adds
    // fresh doc A (kept) and B = a paraphrase of standing doc 5
    // (near-dropped); advanceStandingBuckets folds A's delta buckets
    // into the standing sketch; refresh 2 removes doc 9, changes doc
    // 10, and adds D = a paraphrase of A — catchable ONLY if the
    // advance folded A in (A/D share bands 0 and 2 under the md5
    // minhash, a fixed property of the constant texts) — plus G = a
    // paraphrase of ORIGINAL standing doc 21 (the carried half of the
    // state) and fresh F. The output is refresh 2's report computed
    // against the ADVANCED frame; the oracle recomputes refresh 2
    // from scratch, so green ⇔ advanced ≡ recomputed on this fixture
    // (the spec pins the same identity in-engine plus the cap
    // algebra). All plantings are fixed copy-0 ids (q110 convention);
    // B is excluded from snapshot 2 explicitly so the gate's verdict
    // never depends on refresh 1's probabilistic banding of
    // sf-varying text.
    Q("q213_standing_bucket_advance", { t =>
        val old = t.documents.select(col("doc_id"), col("text"))
        val toks = split(col("text"), "\\s+")
        def headToks(drop: Int) = array_join(
          slice(toks, lit(1), greatest(size(toks) - drop, lit(1))), " ")
        val aText = "refresh one introduces a genuinely fresh document" +
          " about warp drives and tachyon fields"
        val addA = old.filter(col("doc_id") === 0)
          .select(lit(200001L).as("doc_id"), lit(aText).as("text"))
        val addB = old.filter(col("doc_id") === 5)
          .select(lit(200002L).as("doc_id"), headToks(2).as("text"))
        val new1 = old.unionByName(addA).unionByName(addB)
        // NOT persisted — measured negative result (r15): the standing
        // sketch subtree is referenced three times (refresh 1's probe +
        // the advance's touched/untouched split), but those references
        // run as INDEPENDENT PARALLEL STAGES of the one report job, so
        // the recomputes are nearly free on idle cores, while
        // persist() serialized them behind one cache materialization
        // and regressed the query 10.2 → 13.7 s (3-rep medians, steal
        // ≤ 0.4 both sides; plans/r15/evidence/q213_ab.json)
        val standing0 = Dedup.lshBuckets(
          Dedup.minhashSignatures(
            Dedup.docTokens(old, col("doc_id"), col("text")), 6), 6, 2)
        val st1 = Dedup.incrementalDedupNearState(old, new1,
          col("doc_id"), col("text"), jaccardThreshold = 0.8,
          standingBuckets = Some(standing0))
        val rep1 = graft.core.CacheScope.persistCut(st1.report)
        val adv = Dedup.advanceStandingBuckets(standing0, rep1,
          st1.deltaBuckets)
        val k1 = graft.core.CacheScope.persistCut(
          new1.join(rep1.filter(col("keep") === 1).select("doc_id"),
                    "doc_id"))
        val survivors2 = k1.filter(col("doc_id") =!= 9 &&
                                   col("doc_id") =!= 200002L)
          .withColumn("text",
            when(col("doc_id") === 10, concat(col("text"), lit(" v2")))
              .otherwise(col("text")))
        val addD = k1.filter(col("doc_id") === 200001L)
          .select(lit(200010L).as("doc_id"), headToks(2).as("text"))
        val addG = k1.filter(col("doc_id") === 21)
          .select(lit(200011L).as("doc_id"), headToks(3).as("text"))
        val addF = k1.filter(col("doc_id") === 0)
          .select(lit(200012L).as("doc_id"),
                  lit("second refresh novel text about quasars and pulsars")
                    .as("text"))
        val new2 = survivors2.unionByName(addD).unionByName(addG)
          .unionByName(addF)
        Dedup.incrementalDedupNearState(k1, new2, col("doc_id"),
          col("text"), jaccardThreshold = 0.8,
          standingBuckets = Some(adv)).report
      },
      Some("""WITH k1 AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT CAST(200001 AS BIGINT),
        |    'refresh one introduces a genuinely fresh document about warp drives and tachyon fields'
        |  FROM documents WHERE doc_id = 0
        |), newer AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id = 10 THEN text || ' v2' ELSE text END AS text
        |  FROM k1 WHERE doc_id <> 9
        |  UNION ALL
        |  SELECT CAST(200010 AS BIGINT),
        |    array_to_string(list_slice(string_split_regex(text, '\s+'),
        |      1, greatest(len(string_split_regex(text, '\s+')) - 2, 1)),
        |      ' ')
        |  FROM k1 WHERE doc_id = 200001
        |  UNION ALL
        |  SELECT CAST(200011 AS BIGINT),
        |    array_to_string(list_slice(string_split_regex(text, '\s+'),
        |      1, greatest(len(string_split_regex(text, '\s+')) - 3, 1)),
        |      ' ')
        |  FROM k1 WHERE doc_id = 21
        |  UNION ALL
        |  SELECT CAST(200012 AS BIGINT),
        |    'second refresh novel text about quasars and pulsars'
        |  FROM k1 WHERE doc_id = 0
        |), diff AS (
        |  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        |    CASE WHEN o.doc_id IS NULL THEN 'added'
        |         WHEN n.doc_id IS NULL THEN 'removed'
        |         WHEN md5(o.text) IS NOT DISTINCT FROM md5(n.text)
        |           THEN 'unchanged'
        |         ELSE 'changed' END AS status
        |  FROM k1 o FULL OUTER JOIN newer n ON o.doc_id = n.doc_id
        |), d AS (
        |  SELECT diff.doc_id, status,
        |    COALESCE(
        |      md5(regexp_replace(lower(trim(n.text)), '\s+', ' ', 'g')),
        |      '__graft_null_text__') AS nh
        |  FROM diff JOIN newer n ON n.doc_id = diff.doc_id
        |  WHERE status <> 'removed'
        |), standing AS (
        |  SELECT nh, MIN(doc_id) AS standing_dup FROM d
        |  WHERE status = 'unchanged' GROUP BY 1
        |), deltac AS (
        |  SELECT nh, MIN(doc_id) AS delta_canon FROM d
        |  WHERE status <> 'unchanged' GROUP BY 1
        |), exact_out AS (
        |  SELECT doc_id, status, CAST(NULL AS BIGINT) AS dup_of
        |  FROM d WHERE status = 'unchanged'
        |  UNION ALL
        |  SELECT d.doc_id, d.status,
        |    COALESCE(standing_dup,
        |      CASE WHEN delta_canon < d.doc_id THEN delta_canon END)
        |  FROM d LEFT JOIN standing USING (nh) JOIN deltac USING (nh)
        |  WHERE d.status <> 'unchanged'
        |), deltaids AS (
        |  SELECT doc_id FROM exact_out
        |  WHERE status <> 'unchanged' AND dup_of IS NULL
        |), unchids AS (
        |  SELECT doc_id FROM exact_out WHERE status = 'unchanged'
        |), toks AS (
        |  SELECT DISTINCT n.doc_id, tok
        |  FROM newer n, UNNEST(string_split_regex(lower(n.text), '\s+'))
        |    t(tok)
        |), sigsD AS (
        |  SELECT doc_id,
        |    MIN(md5('0:' || tok)) AS mh_0, MIN(md5('1:' || tok)) AS mh_1,
        |    MIN(md5('2:' || tok)) AS mh_2, MIN(md5('3:' || tok)) AS mh_3,
        |    MIN(md5('4:' || tok)) AS mh_4, MIN(md5('5:' || tok)) AS mh_5
        |  FROM toks WHERE doc_id IN (SELECT doc_id FROM deltaids)
        |  GROUP BY doc_id
        |), bD AS (
        |  SELECT * FROM (
        |    SELECT doc_id, 0 AS band, md5(mh_0 || mh_1) AS bucket
        |    FROM sigsD
        |    UNION ALL
        |    SELECT doc_id, 1, md5(mh_2 || mh_3) FROM sigsD
        |    UNION ALL
        |    SELECT doc_id, 2, md5(mh_4 || mh_5) FROM sigsD) z
        |  QUALIFY COUNT(*) OVER (PARTITION BY band, bucket) <= 1000
        |), sigsS AS (
        |  SELECT doc_id,
        |    MIN(md5('0:' || tok)) AS mh_0, MIN(md5('1:' || tok)) AS mh_1,
        |    MIN(md5('2:' || tok)) AS mh_2, MIN(md5('3:' || tok)) AS mh_3,
        |    MIN(md5('4:' || tok)) AS mh_4, MIN(md5('5:' || tok)) AS mh_5
        |  FROM toks WHERE doc_id IN (SELECT doc_id FROM unchids)
        |  GROUP BY doc_id
        |), bS AS (
        |  SELECT * FROM (
        |    SELECT doc_id, 0 AS band, md5(mh_0 || mh_1) AS bucket
        |    FROM sigsS
        |    UNION ALL
        |    SELECT doc_id, 1, md5(mh_2 || mh_3) FROM sigsS
        |    UNION ALL
        |    SELECT doc_id, 2, md5(mh_4 || mh_5) FROM sigsS) z
        |  QUALIFY COUNT(*) OVER (PARTITION BY band, bucket) <= 1000
        |), cand AS (
        |  SELECT DISTINCT dd.doc_id AS a, s.doc_id AS b
        |  FROM bD dd JOIN bS s USING (band, bucket)
        |  UNION
        |  SELECT DISTINCT dd.doc_id AS a, e.doc_id AS b
        |  FROM bD dd JOIN bD e USING (band, bucket)
        |  WHERE e.doc_id < dd.doc_id
        |), sizes AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY 1
        |), inter AS (
        |  SELECT c.a, c.b, COUNT(*) AS i
        |  FROM cand c
        |  JOIN toks ta ON ta.doc_id = c.a
        |  JOIN toks tb ON tb.doc_id = c.b AND tb.tok = ta.tok
        |  GROUP BY 1, 2
        |), ver AS (
        |  SELECT a, b FROM inter
        |  JOIN sizes sa ON inter.a = sa.doc_id
        |  JOIN sizes sb ON inter.b = sb.doc_id
        |  WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
        |), near AS (
        |  SELECT doc_id, b AS near_dup_of FROM (
        |    SELECT v.a AS doc_id, v.b,
        |      ROW_NUMBER() OVER (PARTITION BY v.a ORDER BY
        |        CASE WHEN u.doc_id IS NOT NULL THEN 0 ELSE 1 END, v.b)
        |        AS rn
        |    FROM ver v LEFT JOIN unchids u ON v.b = u.doc_id) z
        |  WHERE rn = 1
        |)
        |SELECT e.doc_id, e.status, e.dup_of,
        |  CASE WHEN e.dup_of IS NULL THEN n.near_dup_of END
        |    AS near_dup_of,
        |  CAST(CASE WHEN e.dup_of IS NULL AND n.near_dup_of IS NULL
        |    THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM exact_out e LEFT JOIN near n USING (doc_id)"""
        .stripMargin))
  )
}
