package graft.text

import org.apache.spark.sql.functions._
import graft.Q

/** Oracle-checked queries for the text-analysis surface. */
object TextQueries {

  def queries: Seq[Q] = Seq(

    // Quality scoring: length/punct/stopword heuristics per document.
    Q("q51_text_quality",
      t => TextOps.qualityFeatures(t.documents, col("text"))
        .select("doc_id", "n_chars", "n_tokens", "punct_ratio",
                "stop_ratio", "quality"),
      Some("""WITH f AS (
        |  SELECT doc_id,
        |    length(text) AS n_chars,
        |    len(string_split_regex(lower(text), '\s+')) AS n_tokens,
        |    length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))
        |      AS n_alnum,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |        t -> t IN ('the','a','of','and','to','in','is'))) AS n_stop
        |  FROM documents
        |)
        |SELECT doc_id, CAST(n_chars AS INT) AS n_chars,
        |  CAST(n_tokens AS INT) AS n_tokens,
        |  CAST(n_chars - n_alnum AS DOUBLE) / n_chars AS punct_ratio,
        |  CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
        |  round(least(CAST(n_tokens AS DOUBLE) / 100, 1.0) * 0.4
        |        + (1.0 - CAST(n_chars - n_alnum AS DOUBLE) / n_chars) * 0.3
        |        + least(CAST(n_stop AS DOUBLE) / n_tokens * 5, 1.0) * 0.3,
        |        6) AS quality
        |FROM f""".stripMargin)),

    // Stopword-vote language identification.
    Q("q52_lang_id",
      t => TextOps.languageId(t.documents, col("text"))
        .select("doc_id", "lang", "hits_en", "hits_de", "hits_fr",
                "hits_es", "pred_lang"),
      Some("""WITH h AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |      t -> t IN ('the','a','of','and','to','in','is'))) AS hits_en,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |      t -> t IN ('der','die','das','und','ist','ein'))) AS hits_de,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |      t -> t IN ('le','la','les','et','est','un'))) AS hits_fr,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |      t -> t IN ('el','los','las','y','es','una'))) AS hits_es
        |  FROM documents
        |)
        |SELECT doc_id, lang,
        |  CAST(hits_en AS INT) AS hits_en, CAST(hits_de AS INT) AS hits_de,
        |  CAST(hits_fr AS INT) AS hits_fr, CAST(hits_es AS INT) AS hits_es,
        |  CASE
        |    WHEN hits_en + hits_de + hits_fr + hits_es = 0 THEN 'und'
        |    WHEN hits_en >= hits_de AND hits_en >= hits_fr
        |         AND hits_en >= hits_es THEN 'en'
        |    WHEN hits_de >= hits_fr AND hits_de >= hits_es THEN 'de'
        |    WHEN hits_fr >= hits_es THEN 'fr'
        |    ELSE 'es'
        |  END AS pred_lang
        |FROM h""".stripMargin)),

    // Token counting for training-data budgeting: whitespace tokens
    // (the corpus-stats measure) and BPE-ish pre-tokenization runs
    // (the LLM-token-load proxy) per document.
    Q("q89_token_count",
      t => t.documents
        .select(col("doc_id"),
                size(TextOps.tokens(col("text"))).as("n_ws_tokens"),
                size(TextOps.bpeishTokens(col("text")))
                  .as("n_bpe_tokens")),
      Some("""SELECT doc_id,
        |  CAST(len(string_split_regex(lower(text), '\s+')) AS INT)
        |    AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text,
        |    '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+')) AS INT) AS n_bpe_tokens
        |FROM documents""".stripMargin)),

    // F9 — Porter stemming (reference: TagPreprocessing.py:41-62),
    // ORACLE-GATED (r7 verdict task 4): stemming is deterministic
    // math, so the gate is the q134 convention — the engine stems a
    // fixed vocabulary covering every algorithm step (plurals, ed/ing,
    // y→i, the NLTK irregular pool, the step-2..5 suffix chains) and
    // the oracle is a hand-transcribed VALUES table of the expected
    // nltk-PorterStemmer outputs, traced through the published
    // algorithm + documented NLTK extensions. A transcription slip on
    // either side is a red row. Corpus-scale stemming stays exercised
    // by q130's prep pipeline and the DedupTextAnnSpec fixtures.
    Q("q87_porter_stem", { t =>
        import t.spark.implicits._
        Seq("caresses", "ponies", "ties", "dies", "caress", "cats",
            "studies", "feed", "agreed", "plastered", "bled", "motoring",
            "sing", "conflated", "troubled", "sized", "hopping", "tanned",
            "falling", "hissing", "fizzed", "failing", "filing", "died",
            "studied", "happy", "crying", "saying", "sky", "skies",
            "dying", "lying", "tying", "news", "innings", "proceed",
            "exceed", "succeed", "relational", "conditional", "rational",
            "valenci", "hesitanci", "digitizer", "differently",
            "analogously", "vietnamization", "predication", "operator",
            "feudalism", "decisiveness", "hopefulness", "callousness",
            "formaliti", "sensitiviti", "sensibiliti", "triplicate",
            "formative", "formalize", "electriciti", "hopeful",
            "goodness", "revival", "allowance", "inference", "airliner",
            "gyroscopic", "adjustable", "defensible", "irritant",
            "replacement", "adjustment", "dependent", "adoption",
            "communism", "activate", "angulariti", "homologous",
            "effective", "bowdlerize", "probate", "rate", "cease",
            "controll", "roll")
          .toDF("word")
          .select(col("word"),
                  element_at(TextOps.stemPorter(array(col("word"))), 1)
                    .as("stem"))
      },
      Some("""SELECT * FROM (VALUES
        |  ('caresses','caress'), ('ponies','poni'), ('ties','tie'),
        |  ('dies','die'), ('caress','caress'), ('cats','cat'),
        |  ('studies','studi'), ('feed','feed'), ('agreed','agre'),
        |  ('plastered','plaster'), ('bled','bled'), ('motoring','motor'),
        |  ('sing','sing'), ('conflated','conflat'), ('troubled','troubl'),
        |  ('sized','size'), ('hopping','hop'), ('tanned','tan'),
        |  ('falling','fall'), ('hissing','hiss'), ('fizzed','fizz'),
        |  ('failing','fail'), ('filing','file'), ('died','die'),
        |  ('studied','studi'), ('happy','happi'), ('crying','cri'),
        |  ('saying','say'), ('sky','sky'), ('skies','sky'),
        |  ('dying','die'), ('lying','lie'), ('tying','tie'),
        |  ('news','news'), ('innings','inning'), ('proceed','proceed'),
        |  ('exceed','exceed'), ('succeed','succeed'),
        |  ('relational','relat'), ('conditional','condit'),
        |  ('rational','ration'), ('valenci','valenc'),
        |  ('hesitanci','hesit'), ('digitizer','digit'),
        |  ('differently','differ'), ('analogously','analog'),
        |  ('vietnamization','vietnam'), ('predication','predic'),
        |  ('operator','oper'), ('feudalism','feudal'),
        |  ('decisiveness','decis'), ('hopefulness','hope'),
        |  ('callousness','callous'), ('formaliti','formal'),
        |  ('sensitiviti','sensit'), ('sensibiliti','sensibl'),
        |  ('triplicate','triplic'), ('formative','form'),
        |  ('formalize','formal'), ('electriciti','electr'),
        |  ('hopeful','hope'), ('goodness','good'),
        |  ('revival','reviv'), ('allowance','allow'),
        |  ('inference','infer'), ('airliner','airlin'),
        |  ('gyroscopic','gyroscop'), ('adjustable','adjust'),
        |  ('defensible','defens'), ('irritant','irrit'),
        |  ('replacement','replac'), ('adjustment','adjust'),
        |  ('dependent','depend'), ('adoption','adopt'),
        |  ('communism','commun'), ('activate','activ'),
        |  ('angulariti','angular'), ('homologous','homolog'),
        |  ('effective','effect'), ('bowdlerize','bowdler'),
        |  ('probate','probat'), ('rate','rate'), ('cease','ceas'),
        |  ('controll','control'), ('roll','roll')
        |) t(word, stem)""".stripMargin)),

    // Within-document repetition ratio (duplicate 3-gram share) — the
    // repetitive-text quality filter for LLM corpora. The corpus is
    // natural prose, so a planted looping doc (one sentence repeated
    // verbatim 5x, re-id'd +3000 from doc 0) pins the high end of the
    // scale in both engines.
    Q("q96_repetition_ratio", { t =>
        val base = t.documents.filter(col("doc_id") < 500)
          .select(col("doc_id"), col("text"))
        val looped = base.filter(col("doc_id") < 20)
          .select((col("doc_id") + 3000L).as("doc_id"),
                  concat_ws(" ", col("text"), col("text"), col("text"),
                            col("text"), col("text")).as("text"))
        TextOps.repetitionRatio(base.unionByName(looped),
                                col("doc_id"), col("text"))
      },
      Some("""WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 500
        |  UNION ALL
        |  SELECT doc_id + 3000,
        |    text || ' ' || text || ' ' || text || ' ' || text || ' ' || text
        |  FROM documents WHERE doc_id < 20
        |), toks AS (
        |  SELECT doc_id, i AS pos,
        |    list_extract(string_split_regex(lower(text), '\s+'),
        |                 CAST(i AS INT)) AS tok
        |  FROM corpus,
        |    UNNEST(generate_series(1,
        |      len(string_split_regex(lower(text), '\s+')))) t(i)
        |), sh AS (
        |  SELECT doc_id, tok || ' ' || t1 || ' ' || t2 AS shingle
        |  FROM (
        |    SELECT doc_id, tok,
        |      LEAD(tok, 1) OVER w AS t1, LEAD(tok, 2) OVER w AS t2
        |    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        |  ) x WHERE t2 IS NOT NULL
        |)
        |SELECT doc_id, COUNT(*) AS n_grams,
        |  COUNT(DISTINCT shingle) AS n_distinct,
        |  1.0 - CAST(COUNT(DISTINCT shingle) AS DOUBLE) / COUNT(*)
        |    AS rep_ratio
        |FROM sh GROUP BY doc_id""".stripMargin)),

    // Benchmark-contamination check: share of each corpus document's
    // distinct 3-grams that appear in a held-out benchmark set
    // (doc_id < 100) — the eval-leakage scan run before training.
    // 20 verbatim benchmark docs are planted into the corpus (+4000)
    // so full contamination (1.0) is provably detected.
    Q("q97_contamination", { t =>
        val bench = t.documents.filter(col("doc_id") < 100)
          .select(col("doc_id"), col("text"))
        val corpus = t.documents.filter(col("doc_id") >= 400)
          .select(col("doc_id"), col("text"))
          .unionByName(bench.filter(col("doc_id") < 20)
            .select((col("doc_id") + 4000L).as("doc_id"), col("text")))
        TextOps.contamination(corpus, bench, col("doc_id"), col("text"))
      },
      Some("""WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id >= 400
        |  UNION ALL
        |  SELECT doc_id + 4000, text FROM documents WHERE doc_id < 20
        |), bench_docs AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 100
        |), ctoks AS (
        |  SELECT doc_id, i AS pos,
        |    list_extract(string_split_regex(lower(text), '\s+'),
        |                 CAST(i AS INT)) AS tok
        |  FROM corpus,
        |    UNNEST(generate_series(1,
        |      len(string_split_regex(lower(text), '\s+')))) t(i)
        |), csh AS (
        |  SELECT DISTINCT doc_id, tok || ' ' || t1 || ' ' || t2 AS shingle
        |  FROM (
        |    SELECT doc_id, tok,
        |      LEAD(tok, 1) OVER w AS t1, LEAD(tok, 2) OVER w AS t2
        |    FROM ctoks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        |  ) x WHERE t2 IS NOT NULL
        |), btoks AS (
        |  SELECT doc_id, i AS pos,
        |    list_extract(string_split_regex(lower(text), '\s+'),
        |                 CAST(i AS INT)) AS tok
        |  FROM bench_docs,
        |    UNNEST(generate_series(1,
        |      len(string_split_regex(lower(text), '\s+')))) t(i)
        |), bsh AS (
        |  SELECT DISTINCT tok || ' ' || t1 || ' ' || t2 AS shingle
        |  FROM (
        |    SELECT doc_id, tok,
        |      LEAD(tok, 1) OVER w AS t1, LEAD(tok, 2) OVER w AS t2
        |    FROM btoks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        |  ) x WHERE t2 IS NOT NULL
        |), totals AS (
        |  SELECT doc_id, COUNT(*) AS n_grams FROM csh GROUP BY 1
        |), hits AS (
        |  SELECT doc_id, COUNT(*) AS n_hit FROM csh
        |  WHERE shingle IN (SELECT shingle FROM bsh) GROUP BY 1
        |)
        |SELECT totals.doc_id, totals.n_grams,
        |  COALESCE(hits.n_hit, 0) AS n_hit,
        |  CAST(COALESCE(hits.n_hit, 0) AS DOUBLE) / totals.n_grams
        |    AS contamination
        |FROM totals LEFT JOIN hits ON totals.doc_id = hits.doc_id"""
        .stripMargin)),

    // Corpus-unigram LM quality score: average log2 token probability
    // under the corpus's own unigram distribution (the cheap perplexity
    // proxy of corpus filtering), plus the pure-integer avg-probability
    // twin. Per-token log2 rounded to 6 before exact-decimal
    // accumulation — both engines add identical addends.
    Q("q100_unigram_lm",
      t => TextOps.unigramLogProb(t.documents, col("doc_id"),
                                  col("text")),
      Some("""WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(lower(text), '\s+')) AS tok
        |  FROM documents
        |), counts AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS n_corpus FROM toks)
        |SELECT doc_id, COUNT(*) AS n_tokens,
        |  round(CAST(SUM(CAST(round(log2(CAST(c AS DOUBLE) / n_corpus), 6)
        |                      AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
        |    AS avg_logp,
        |  CAST(SUM(CAST(c AS DECIMAL(28,0))) AS DOUBLE)
        |    / (COUNT(*) * ANY_VALUE(n_corpus)) AS avg_prob
        |FROM toks JOIN counts USING (tok) CROSS JOIN tot
        |GROUP BY doc_id""".stripMargin)),

    // PII pattern scan with planted PII: every 5th document gets a
    // deterministic email, every 6th two phone numbers — both engines
    // build the identical planted corpus, so non-zero match counts are
    // genuinely compared (the raw corpus contains none).
    Q("q103_pii_scan", { t =>
        val planted = t.documents.select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 5 === 0,
              concat(lit(" contact user"), col("doc_id").cast("string"),
                     lit("@example.com now"))).otherwise(lit("")),
            when(col("doc_id") % 6 === 0,
              lit(" call 555-867-5309 or 555-123-4567"))
              .otherwise(lit(""))).as("text"))
        TextOps.piiCounts(planted, col("doc_id"), col("text"))
      },
      Some("""SELECT doc_id,
        |  CAST(len(regexp_extract_all(lower(text2),
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INT) AS n_email,
        |  CAST(len(regexp_extract_all(text2,
        |    '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS INT) AS n_phone
        |FROM (
        |  SELECT doc_id, text
        |    || CASE WHEN doc_id % 5 = 0
        |       THEN ' contact user' || CAST(doc_id AS VARCHAR)
        |            || '@example.com now' ELSE '' END
        |    || CASE WHEN doc_id % 6 = 0
        |       THEN ' call 555-867-5309 or 555-123-4567' ELSE '' END
        |    AS text2
        |  FROM documents) t""".stripMargin)),

    // Composite C4/Gopher-style quality filter: length band, quality
    // score, repetition ratio, unigram-LM score — one flag column per
    // rule plus the final keep decision. Thresholds sit inside the
    // corpus's observed score ranges so every rule genuinely splits
    // the data in both engines.
    Q("q105_quality_filter",
      t => TextOps.qualityFilter(t.documents, col("doc_id"), col("text"),
        minTokens = 20, maxTokens = 80, minQuality = 0.6,
        maxRep = 0.03, minAvgLogp = -5.0),
      Some("""WITH f AS (
        |  SELECT doc_id,
        |    len(string_split_regex(lower(text), '\s+')) AS n_tokens,
        |    length(text) AS n_chars,
        |    length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))
        |      AS n_alnum,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |        t -> t IN ('the','a','of','and','to','in','is'))) AS n_stop
        |  FROM documents
        |), q AS (
        |  SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
        |    round(least(CAST(n_tokens AS DOUBLE) / 100, 1.0) * 0.4
        |      + (1.0 - CAST(n_chars - n_alnum AS DOUBLE) / n_chars) * 0.3
        |      + least(CAST(n_stop AS DOUBLE) / n_tokens * 5, 1.0) * 0.3,
        |      6) AS quality
        |  FROM f
        |), toks AS (
        |  SELECT doc_id, i AS pos,
        |    list_extract(string_split_regex(lower(text), '\s+'),
        |                 CAST(i AS INT)) AS tok
        |  FROM documents,
        |    UNNEST(generate_series(1,
        |      len(string_split_regex(lower(text), '\s+')))) t(i)
        |), sh AS (
        |  SELECT doc_id, tok || ' ' || t1 || ' ' || t2 AS shingle
        |  FROM (
        |    SELECT doc_id, tok,
        |      LEAD(tok, 1) OVER w AS t1, LEAD(tok, 2) OVER w AS t2
        |    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        |  ) x WHERE t2 IS NOT NULL
        |), rep AS (
        |  SELECT doc_id,
        |    round(1.0 - CAST(COUNT(DISTINCT shingle) AS DOUBLE)
        |                / COUNT(*), 6) AS rep_ratio
        |  FROM sh GROUP BY doc_id
        |), wtoks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(lower(text), '\s+')) AS tok
        |  FROM documents
        |), counts AS (SELECT tok, COUNT(*) AS c FROM wtoks GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS n_corpus FROM wtoks),
        |lm AS (
        |  SELECT doc_id,
        |    round(CAST(SUM(CAST(round(log2(CAST(c AS DOUBLE) / n_corpus),
        |                              6) AS DECIMAL(18,6))) AS DOUBLE)
        |          / COUNT(*), 6) AS avg_logp
        |  FROM wtoks JOIN counts USING (tok) CROSS JOIN tot
        |  GROUP BY doc_id
        |)
        |SELECT q.doc_id, q.n_tokens, q.quality,
        |  COALESCE(rep.rep_ratio, 0.0) AS rep_ratio, lm.avg_logp,
        |  CAST(q.n_tokens >= 20 AND q.n_tokens <= 80 AS INT) AS f_len,
        |  CAST(q.quality >= 0.6 AS INT) AS f_quality,
        |  CAST(COALESCE(rep.rep_ratio, 0.0) <= 0.03 AS INT) AS f_rep,
        |  CAST(lm.avg_logp >= -5.0 AS INT) AS f_lm,
        |  CAST(q.n_tokens >= 20 AND q.n_tokens <= 80
        |       AND q.quality >= 0.6
        |       AND COALESCE(rep.rep_ratio, 0.0) <= 0.03
        |       AND lm.avg_logp >= -5.0 AS INT) AS keep
        |FROM q
        |LEFT JOIN rep ON rep.doc_id = q.doc_id
        |LEFT JOIN lm ON lm.doc_id = q.doc_id""".stripMargin)),

    // Sequence packing: documents concatenated in deterministic md5
    // order, token stream cut into 512-token training sequences; each
    // doc's (seq_id, offset) compared across engines. The Spark side
    // computes the global cumsum with the two-pass range-partitioned
    // prefix sum — the oracle's single window checks it exactly.
    Q("q106_sequence_pack",
      t => TextOps.packSequences(t.documents, col("doc_id"),
                                 col("text"), budget = 512L),
      Some("""WITH counted AS (
        |  SELECT doc_id,
        |    len(string_split_regex(lower(text), '\s+')) AS n_tokens,
        |    md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents
        |), ordered AS (
        |  SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
        |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS pos,
        |    CAST(SUM(n_tokens) OVER w AS BIGINT) AS cum
        |  FROM counted WINDOW w AS (ORDER BY h, doc_id)
        |)
        |SELECT doc_id, n_tokens, pos,
        |  CAST(FLOOR((cum - n_tokens) / 512.0) AS BIGINT) AS seq_id,
        |  (cum - n_tokens)
        |    - CAST(FLOOR((cum - n_tokens) / 512.0) AS BIGINT) * 512
        |    AS offset
        |FROM ordered""".stripMargin)),

    // Token-window chunking: 32-token chunks every 16 tokens (50%
    // overlap), chunk text rematerialized — the RAG/context-window
    // preprocessing step. Chunk boundaries, sizes, and the exact chunk
    // strings are compared.
    Q("q107_chunk_docs",
      t => TextOps.chunkDocuments(t.documents, col("doc_id"),
                                  col("text"),
                                  chunkTokens = 32, stride = 16),
      Some("""WITH d AS (
        |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
        |  FROM documents
        |), e AS (
        |  SELECT doc_id, toks, len(toks) AS n, CAST(s AS INT) AS start
        |  FROM d, UNNEST(generate_series(0, len(toks) - 1, 16)) t(s)
        |  WHERE len(toks) > 0
        |)
        |SELECT doc_id, CAST(start // 16 AS INT) AS chunk_idx,
        |  CAST(len(list_slice(toks, start + 1, least(start + 32, n)))
        |       AS INT) AS n_chunk_tokens,
        |  array_to_string(list_slice(toks, start + 1,
        |                             least(start + 32, n)), ' ')
        |    AS chunk_text
        |FROM e""".stripMargin)),

    // md5 document fingerprinting (hex + 60-bit integer prefix).
    Q("q53_fingerprint",
      t => TextOps.fingerprint(t.documents, col("text"))
        .select("doc_id", "fp_md5", "fp_long"),
      Some("""SELECT doc_id,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp_md5,
        |  ('0x' || substr(md5(regexp_replace(lower(trim(text)), '\s+',
        |                                     ' ', 'g')), 1, 15))::BIGINT
        |    AS fp_long
        |FROM documents""".stripMargin)),

    // End-to-end LLM text-prep pipeline in ONE gated query: the
    // C4/Gopher-style quality filter (all four rules, scored over the
    // FULL corpus) selects survivors, and only the survivors flow into
    // deterministic-hash-ordered sequence packing — filter → layout,
    // the two stages a pretraining data build always chains. The
    // oracle chains the q105 and q106 CTEs over the same survivor set.
    Q("q130_prep_pipeline", { t =>
        val docs = graft.core.CacheScope.persist(
          t.documents.select(col("doc_id"), col("text")))
        val kept = TextOps.qualityFilter(docs, col("doc_id"),
            col("text"), minTokens = 20, maxTokens = 80,
            minQuality = 0.6, maxRep = 0.03, minAvgLogp = -5.0)
          .filter(col("keep") === 1).select("doc_id")
        TextOps.packSequences(docs.join(kept, "doc_id"),
                              col("doc_id"), col("text"), budget = 256L)
      },
      Some("""WITH f AS (
        |  SELECT doc_id,
        |    len(string_split_regex(lower(text), '\s+')) AS n_tokens,
        |    length(text) AS n_chars,
        |    length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))
        |      AS n_alnum,
        |    len(list_filter(string_split_regex(lower(text), '\s+'),
        |        t -> t IN ('the','a','of','and','to','in','is'))) AS n_stop
        |  FROM documents
        |), q AS (
        |  SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
        |    round(least(CAST(n_tokens AS DOUBLE) / 100, 1.0) * 0.4
        |      + (1.0 - CAST(n_chars - n_alnum AS DOUBLE) / n_chars) * 0.3
        |      + least(CAST(n_stop AS DOUBLE) / n_tokens * 5, 1.0) * 0.3,
        |      6) AS quality
        |  FROM f
        |), toks AS (
        |  SELECT doc_id, i AS pos,
        |    list_extract(string_split_regex(lower(text), '\s+'),
        |                 CAST(i AS INT)) AS tok
        |  FROM documents,
        |    UNNEST(generate_series(1,
        |      len(string_split_regex(lower(text), '\s+')))) t(i)
        |), sh AS (
        |  SELECT doc_id, tok || ' ' || t1 || ' ' || t2 AS shingle
        |  FROM (
        |    SELECT doc_id, tok,
        |      LEAD(tok, 1) OVER w AS t1, LEAD(tok, 2) OVER w AS t2
        |    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        |  ) x WHERE t2 IS NOT NULL
        |), rep AS (
        |  SELECT doc_id,
        |    round(1.0 - CAST(COUNT(DISTINCT shingle) AS DOUBLE)
        |                / COUNT(*), 6) AS rep_ratio
        |  FROM sh GROUP BY doc_id
        |), wtoks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(lower(text), '\s+')) AS tok
        |  FROM documents
        |), counts AS (SELECT tok, COUNT(*) AS c FROM wtoks GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS n_corpus FROM wtoks),
        |lm AS (
        |  SELECT doc_id,
        |    round(CAST(SUM(CAST(round(log2(CAST(c AS DOUBLE) / n_corpus),
        |                              6) AS DECIMAL(18,6))) AS DOUBLE)
        |          / COUNT(*), 6) AS avg_logp
        |  FROM wtoks JOIN counts USING (tok) CROSS JOIN tot
        |  GROUP BY doc_id
        |), kept AS (
        |  SELECT q.doc_id
        |  FROM q
        |  LEFT JOIN rep ON rep.doc_id = q.doc_id
        |  LEFT JOIN lm ON lm.doc_id = q.doc_id
        |  WHERE q.n_tokens >= 20 AND q.n_tokens <= 80
        |    AND q.quality >= 0.6
        |    AND COALESCE(rep.rep_ratio, 0.0) <= 0.03
        |    AND lm.avg_logp >= -5.0
        |), counted AS (
        |  SELECT doc_id,
        |    len(string_split_regex(lower(text), '\s+')) AS n_tokens,
        |    md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents JOIN kept USING (doc_id)
        |), ordered AS (
        |  SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
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

    // Corpus-bigram LM scoring with add-1 smoothing: avg log2
    // p(w2|w1) per document — the order-sensitive quality score next
    // to q100's unigram LM. Same determinism discipline as q100:
    // integer counts, one log2 rounded to 6, exact decimal sum.
    Q("q126_bigram_lm",
      t => TextOps.bigramLogProb(t.documents, col("doc_id"),
                                 col("text"))
        .select("doc_id", "n_bigrams", "sum_logp"),
      Some("""WITH toks AS (
        |  SELECT doc_id, i AS pos,
        |    list_extract(string_split_regex(lower(text), '\s+'),
        |                 CAST(i AS INT)) AS tok
        |  FROM documents,
        |    UNNEST(generate_series(1,
        |      len(string_split_regex(lower(text), '\s+')))) t(i)
        |), bg AS (
        |  SELECT doc_id, tok AS w1, t1 AS w2 FROM (
        |    SELECT doc_id, tok, LEAD(tok, 1) OVER (PARTITION BY doc_id
        |                                           ORDER BY pos) AS t1
        |    FROM toks
        |  ) x WHERE t1 IS NOT NULL
        |), c12 AS (
        |  SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2
        |), c1 AS (
        |  SELECT tok AS w1, COUNT(*) AS c1 FROM toks GROUP BY 1
        |), vv AS (SELECT COUNT(DISTINCT tok) AS v FROM toks)
        |SELECT doc_id, COUNT(*) AS n_bigrams,
        |  CAST(SUM(CAST(round(
        |      log2((c12 + 1.0) / (c1 + v)), 6) AS DECIMAL(18,6)))
        |    AS DOUBLE) AS sum_logp
        |FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN vv
        |GROUP BY doc_id""".stripMargin)),

    // TF-IDF keyword extraction: top-5 tokens per document by
    // tf·ln(N/df) — integer tf/df/N, one ln + multiply rounded to 6
    // decimals, token tie-break, so the per-doc ranking is identical
    // on both engines.
    Q("q124_tfidf_keywords",
      t => TextOps.tfidfKeywords(t.documents, col("doc_id"),
                                 col("text"), k = 5),
      Some("""WITH toks AS (
        |  SELECT doc_id, tok FROM (
        |    SELECT doc_id,
        |      unnest(string_split_regex(lower(text), '\s+')) AS tok
        |    FROM documents) t
        |  WHERE len(tok) > 0
        |), tf AS (
        |  SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2
        |), dft AS (
        |  SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1
        |), n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM toks)
        |SELECT doc_id, tok, tfidf, CAST(rk AS INT) AS rank FROM (
        |  SELECT doc_id, tok,
        |    round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6)
        |        DESC, tok) AS rk
        |  FROM tf JOIN dft USING (tok) CROSS JOIN n) x
        |WHERE rk <= 5""".stripMargin)),

    // BM25 text retrieval: top-5 corpus docs per query through the
    // inverted-index join — queries are the first-5-token prefixes of
    // every 25th document, so each query's own source document must
    // surface (exact-match terms, shortest competing lengths).
    Q("q185_bm25_search", { t =>
        val corpus = t.documents.select(col("doc_id"), col("text"))
        val queries = TextOps.prefixQueries(
          corpus.filter(col("doc_id") % 25 === 0),
          col("doc_id"), col("text"), nTokens = 5)
        TextOps.searchBm25(corpus, col("doc_id"), col("text"),
                           queries, col("qid"), col("qtext"), k = 5)
      },
      Some("""WITH dtoks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(lower(text), '\s+')) AS tok
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, tok, COUNT(*) AS tf FROM dtoks GROUP BY 1, 2
        |), dlen AS (
        |  SELECT doc_id, COUNT(*) AS len FROM dtoks GROUP BY 1
        |), stats AS (
        |  SELECT COUNT(*) AS nd,
        |    CAST(SUM(len) AS DOUBLE) / COUNT(*) AS avg_len
        |  FROM dlen
        |), dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1
        |), q AS (
        |  SELECT doc_id AS qid,
        |    array_to_string(list_slice(
        |      string_split_regex(lower(text), '\s+'), 1, 5), ' ')
        |      AS qtext
        |  FROM documents WHERE doc_id % 25 = 0
        |), qt AS (
        |  SELECT DISTINCT qid,
        |    unnest(string_split_regex(qtext, '\s+')) AS tok
        |  FROM q
        |), term AS (
        |  SELECT qt.qid, tf.doc_id,
        |    CAST(round(
        |      round(ln(1.0 + (nd - df + 0.5) / (df + 0.5)), 6)
        |        * tf * 2.2
        |        / (tf + 1.2 * (0.25 + 0.75 * len / avg_len)),
        |      6) AS DECIMAL(18,6)) AS contrib
        |  FROM qt
        |  JOIN tf USING (tok)
        |  JOIN dfq USING (tok)
        |  JOIN dlen ON dlen.doc_id = tf.doc_id
        |  CROSS JOIN stats
        |), scored AS (
        |  SELECT qid, doc_id, SUM(contrib) AS score
        |  FROM term GROUP BY 1, 2
        |)
        |SELECT qid, doc_id, CAST(score AS DOUBLE) AS score, rank FROM (
        |  SELECT qid, doc_id, score,
        |    ROW_NUMBER() OVER (PARTITION BY qid
        |      ORDER BY score DESC, doc_id) AS rank
        |  FROM scored) r
        |WHERE rank <= 5""".stripMargin)),

    // Per-document 3-gram novelty: the share of a doc's distinct
    // shingles with corpus df=1 — the unique-n-gram diversity signal
    // of corpus curation (low novelty = boilerplate/template text).
    Q("q139_ngram_novelty",
      t => TextOps.ngramNovelty(t.documents, col("doc_id"), col("text")),
      Some("""WITH toks AS (
        |  SELECT doc_id, i AS pos,
        |    list_extract(string_split_regex(lower(text), '\s+'),
        |                 CAST(i AS INT)) AS tok
        |  FROM documents,
        |    UNNEST(generate_series(1,
        |      len(string_split_regex(lower(text), '\s+')))) t(i)
        |), sh AS (
        |  SELECT DISTINCT doc_id, tok || ' ' || t1 || ' ' || t2 AS shingle
        |  FROM (
        |    SELECT doc_id, tok,
        |      LEAD(tok, 1) OVER w AS t1, LEAD(tok, 2) OVER w AS t2
        |    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        |  ) x WHERE t2 IS NOT NULL
        |), dfs AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY 1)
        |SELECT doc_id, COUNT(*) AS n_shingles,
        |  CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_unique,
        |  round(CAST(SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |        / COUNT(*), 6) AS novelty
        |FROM sh JOIN dfs USING (shingle)
        |GROUP BY doc_id""".stripMargin)),

    // BPE vocabulary learning: 15 merges from the corpus word-
    // frequency table. Iterative argmax (driver sees one row per
    // round) has no SQL twin, so the gate is rows-only; exact merge-
    // sequence parity against an independent in-memory reference BPE
    // is pinned by the DedupTextAnnSpec fixture.
    Q("q121_bpe_learn", { t =>
        val words = t.documents
          .select(explode(TextOps.tokens(col("text"))).as("w"))
          .filter(length(col("w")) > 0)
          .groupBy("w").agg(count(lit(1)).as("f"))
        Bpe.learnMerges(words, col("w"), col("f"), nMerges = 15)
      },
      None),

    // BPE STRICT gate: the same distributed learner (pair aggregation,
    // deterministic argmax, greedy HOF merge application) run on the
    // Sennrich et al. 2016 worked example — a corpus small enough that
    // the full merge sequence is hand-derivable. The learner's
    // tie-break is total (pair_freq desc, then left asc, right asc), so
    // the 5-merge table below is THE unique answer: round 1 ties
    // (e,s)/(s,t)/(t,</w>) at 9 and lexicographic order picks (e,s);
    // the oracle is the hand-transcribed VALUES table (the q87/q134
    // convention). q121 stays the corpus-scale demo; this pins the
    // merge machinery bit-exactly — a wrong pair count, a broken
    // tie-break, or a faulty greedy application is a red hash row.
    Q("q148_bpe_values_gate", { t =>
        import t.spark.implicits._
        val words = Seq(("low", 5L), ("lower", 2L),
                        ("newest", 6L), ("widest", 3L)).toDF("word", "f")
        Bpe.learnMerges(words, col("word"), col("f"), nMerges = 5)
      },
      Some("""SELECT * FROM (VALUES
        |  (0, 'e', 's', 'es', CAST(9 AS BIGINT)),
        |  (1, 'es', 't', 'est', 9),
        |  (2, 'est', '</w>', 'est</w>', 9),
        |  (3, 'l', 'o', 'lo', 7),
        |  (4, 'lo', 'w', 'low', 7)
        |) t(round, "left", "right", merged, pair_freq)""".stripMargin)),

    // Unicode NFC normalization at scan speed — the canonicalization
    // pre-pass of corpus dedup/fingerprinting (é as U+00E9 vs
    // e+U+0301 must hash identically). The corpus text is ASCII, so
    // the query manufactures decomposed input: every 'e' becomes
    // e+COMBINING ACUTE (U+0301), which NFC recomposes to the single
    // codepoint é — per-doc codepoint counts shrink back and the
    // normalized strings themselves hash-match DuckDB's independent
    // nfc_normalize. Both the counts and a text prefix are gated, so
    // a normalizer that returns its input unchanged (the ASCII fast
    // path misfiring on non-ASCII) or over-normalizes is a red row.
    // NFKC compatibility folding is pinned in StringExprSpec (DuckDB
    // has no NFKC twin).
    Q("q154_unicode_nfc", { t =>
        import graft.functions.StringFunctions.unicode_normalize
        val dec = regexp_replace(col("text"), "e", "e\u0301")
        t.documents.select(col("doc_id"), dec.as("d"))
          .select(col("doc_id"),
                  length(col("d")).as("n_decomposed"),
                  length(unicode_normalize(col("d"), "NFC")).as("n_nfc"),
                  substring(unicode_normalize(col("d"), "NFC"), 1, 80)
                    .as("prefix"))
      },
      Some("""SELECT doc_id,
        |  CAST(length(d) AS INT) AS n_decomposed,
        |  CAST(length(nfc_normalize(d)) AS INT) AS n_nfc,
        |  substr(nfc_normalize(d), 1, 80) AS prefix
        |FROM (SELECT doc_id, replace(text, 'e', 'e' || chr(769)) AS d
        |      FROM documents)""".stripMargin)),

    // CCNet-style perplexity bucketing: unigram LM trained on the even
    // half of the corpus scores the odd half (held-out, the production
    // shape), with a planted per-doc ' zzq<id>' token so the OOV add-1
    // path is provably exercised (those tokens cannot exist in the
    // reference half). head/middle/tail terciles gated too — a drifted
    // percentile or a flipped comparison is a red row.
    Q("q156_perplexity_buckets", { t =>
        val ref = t.documents.filter(col("doc_id") % 2 === 0)
        val target = t.documents.filter(col("doc_id") % 2 === 1)
          .select(col("doc_id"),
                  concat(col("text"), lit(" zzq"),
                         col("doc_id").cast("string")).as("text"))
        TextOps.perplexityBuckets(ref, target, col("doc_id"), col("text"))
      },
      Some("""WITH ref AS (
        |  SELECT unnest(string_split_regex(lower(text), '\s+')) AS tok
        |  FROM documents WHERE doc_id % 2 = 0
        |), counts AS (SELECT tok, COUNT(*) AS c FROM ref GROUP BY 1),
        |stats AS (SELECT COUNT(*) AS n_ref, COUNT(DISTINCT tok) AS v_ref
        |          FROM ref),
        |tt AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(lower(text || ' zzq' || doc_id),
        |                              '\s+')) AS tok
        |  FROM documents WHERE doc_id % 2 = 1
        |), sc AS (
        |  SELECT doc_id, COUNT(*) AS n_tokens,
        |    round(CAST(SUM(CAST(round(-log2((coalesce(c, 0) + 1)
        |            / CAST(n_ref + v_ref AS DOUBLE)), 6)
        |          AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS score
        |  FROM tt LEFT JOIN counts USING (tok) CROSS JOIN stats
        |  GROUP BY doc_id
        |), cuts AS (
        |  SELECT quantile_cont(score, 1.0/3) AS p33,
        |         quantile_cont(score, 2.0/3) AS p67 FROM sc
        |)
        |SELECT doc_id, n_tokens, score,
        |  CASE WHEN score <= p33 THEN 'head'
        |       WHEN score <= p67 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM sc CROSS JOIN cuts""".stripMargin)),

    // Quality classifier trained + applied in one plan: smoothed
    // log-odds with lang='en' as the positive class (the GPT-3 recipe
    // with naive-Bayes weights — the SQL-expressible classifier twin).
    Q("q157_quality_classifier",
      t => TextOps.logOddsQuality(t.documents, col("doc_id"),
                                  col("text"), col("lang") === "en"),
      Some("""WITH toks AS (
        |  SELECT doc_id, (lang = 'en') AS pos,
        |    unnest(string_split_regex(lower(text), '\s+')) AS tok
        |  FROM documents
        |), pt AS (
        |  SELECT tok,
        |    SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS cpos,
        |    SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS cneg
        |  FROM toks GROUP BY tok
        |), tot AS (
        |  SELECT SUM(cpos) AS npos, SUM(cneg) AS nneg, COUNT(*) AS v
        |  FROM pt
        |), w AS (
        |  SELECT tok,
        |    CAST(round(log2(((cpos + 0.5) / (npos + 0.5 * v))
        |                    / ((cneg + 0.5) / (nneg + 0.5 * v))), 6)
        |         AS DECIMAL(18,6)) AS w
        |  FROM pt CROSS JOIN tot
        |)
        |SELECT doc_id, COUNT(*) AS n_tokens,
        |  round(CAST(SUM(w) AS DOUBLE) / COUNT(*), 6) AS score,
        |  CASE WHEN round(CAST(SUM(w) AS DOUBLE) / COUNT(*), 6) > 0
        |       THEN 'positive' ELSE 'negative' END AS predicted
        |FROM toks JOIN w USING (tok)
        |GROUP BY doc_id""".stripMargin)),

    // Modern curation chain gated END-TO-END (the q110/q130
    // convention): NFC normalize → log-odds classifier keeps predicted-
    // positive docs → exact dedup keeps the first copy (duplicates
    // planted in-query: every 25th doc re-enters under id+10000, so the
    // dedup stage provably removes rows) → sequence packing of the
    // survivors. Classifier training sees the planted corpus too —
    // both engines train on identical data.
    Q("q159_curation_pipeline", { t =>
        import graft.functions.StringFunctions.unicode_normalize
        import graft.dedup.Dedup
        val base0 = t.documents.select(col("doc_id"), col("lang"),
                                       col("text"))
        val planted = base0.filter(col("doc_id") % 25 === 0)
          .withColumn("doc_id", col("doc_id") + 10000)
        val base = graft.core.CacheScope.persist(
          base0.unionByName(planted)
            .select(col("doc_id"), col("lang"),
                    unicode_normalize(col("text"), "NFC").as("text")))
        val kept = TextOps.logOddsQuality(base, col("doc_id"),
            col("text"), col("lang") === "en")
          .filter(col("predicted") === "positive").select("doc_id")
        val deduped = Dedup.keepFirstExact(
          base.join(kept, "doc_id"), col("doc_id"), col("text"))
        TextOps.packSequences(deduped, col("doc_id"), col("text"),
                              budget = 256L)
      },
      Some("""WITH base AS (
        |  SELECT doc_id, lang, nfc_normalize(text) AS text
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000, lang, nfc_normalize(text)
        |  FROM documents WHERE doc_id % 25 = 0
        |), toks AS (
        |  SELECT doc_id, (lang = 'en') AS pos,
        |    unnest(string_split_regex(lower(text), '\s+')) AS tok
        |  FROM base
        |), pt AS (
        |  SELECT tok,
        |    SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS cpos,
        |    SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS cneg
        |  FROM toks GROUP BY tok
        |), tot AS (
        |  SELECT SUM(cpos) AS npos, SUM(cneg) AS nneg, COUNT(*) AS v
        |  FROM pt
        |), w AS (
        |  SELECT tok,
        |    CAST(round(log2(((cpos + 0.5) / (npos + 0.5 * v))
        |                    / ((cneg + 0.5) / (nneg + 0.5 * v))), 6)
        |         AS DECIMAL(18,6)) AS w
        |  FROM pt CROSS JOIN tot
        |), sc AS (
        |  SELECT doc_id,
        |    round(CAST(SUM(w) AS DOUBLE) / COUNT(*), 6) AS score
        |  FROM toks JOIN w USING (tok) GROUP BY doc_id
        |), srv AS (
        |  SELECT b.doc_id, b.text FROM base b
        |  JOIN sc ON sc.doc_id = b.doc_id AND sc.score > 0
        |), firsts AS (
        |  SELECT md5(text) AS h, MIN(doc_id) AS keep_id
        |  FROM srv GROUP BY 1
        |), ded AS (
        |  SELECT s.doc_id, s.text FROM srv s
        |  JOIN firsts f ON md5(s.text) = f.h AND s.doc_id = f.keep_id
        |), counted AS (
        |  SELECT doc_id,
        |    len(string_split_regex(lower(text), '\s+')) AS n_tokens,
        |    md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM ded
        |), ordered AS (
        |  SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
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

    // DSIR importance resampling (Xie et al. 2023): select the 50 raw
    // documents (source ∉ {src1, src2}) whose hashed unigram+bigram
    // distribution best matches the curated target slice (src1∪src2),
    // via smoothed log-ratio weights + deterministic Gumbel top-k.
    // The oracle rebuilds the whole pipeline — featurize, fit, score,
    // Gumbel key — in DuckDB from the same md5 conventions.
    Q("q188_dsir_select", { t =>
        val raw = t.documents
          .filter(!col("source").isin("src1", "src2"))
        val target = t.documents
          .filter(col("source").isin("src1", "src2"))
        TextOps.dsirSelect(raw, col("doc_id"), col("text"),
                           target, col("doc_id"), col("text"),
                           k = 50, nBuckets = 2000, alpha = 0.5,
                           seed = 7L)
      },
      Some("""WITH rawd AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE source NOT IN ('src1', 'src2')
        |), tgtd AS (
        |  SELECT doc_id, text FROM documents
        |  WHERE source IN ('src1', 'src2')
        |), rtoks AS (
        |  SELECT doc_id, i AS pos,
        |    list_extract(string_split_regex(lower(text), '\s+'),
        |                 CAST(i AS INT)) AS tok
        |  FROM rawd, UNNEST(generate_series(1,
        |    len(string_split_regex(lower(text), '\s+')))) t(i)
        |  WHERE len(tok) > 0
        |), ttoks AS (
        |  SELECT doc_id, i AS pos,
        |    list_extract(string_split_regex(lower(text), '\s+'),
        |                 CAST(i AS INT)) AS tok
        |  FROM tgtd, UNNEST(generate_series(1,
        |    len(string_split_regex(lower(text), '\s+')))) t(i)
        |  WHERE len(tok) > 0
        |), rfeat AS (
        |  SELECT doc_id,
        |    (('0x' || substr(md5(ngram), 1, 8))::BIGINT) % 2000
        |      AS bucket
        |  FROM (
        |    SELECT doc_id, tok AS ngram FROM rtoks
        |    UNION ALL
        |    SELECT doc_id, tok || ' ' || t1 AS ngram FROM (
        |      SELECT doc_id, tok,
        |        LEAD(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos)
        |          AS t1
        |      FROM rtoks) x WHERE t1 IS NOT NULL)
        |), tfeat AS (
        |  SELECT doc_id,
        |    (('0x' || substr(md5(ngram), 1, 8))::BIGINT) % 2000
        |      AS bucket
        |  FROM (
        |    SELECT doc_id, tok AS ngram FROM ttoks
        |    UNION ALL
        |    SELECT doc_id, tok || ' ' || t1 AS ngram FROM (
        |      SELECT doc_id, tok,
        |        LEAD(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos)
        |          AS t1
        |      FROM ttoks) x WHERE t1 IS NOT NULL)
        |), rcnt AS (SELECT bucket, COUNT(*) AS cr FROM rfeat GROUP BY 1
        |), tcnt AS (SELECT bucket, COUNT(*) AS ct FROM tfeat GROUP BY 1
        |), rtot AS (SELECT COUNT(*) AS nr FROM rfeat
        |), ttot AS (SELECT COUNT(*) AS nt FROM tfeat
        |), wts AS (
        |  SELECT rcnt.bucket,
        |    CAST(round(ln(((COALESCE(ct, 0) + 0.5) / (nt + 1000.0)) /
        |                  ((cr + 0.5) / (nr + 1000.0))), 6)
        |      AS DECIMAL(18,6)) AS w
        |  FROM rcnt LEFT JOIN tcnt ON rcnt.bucket = tcnt.bucket
        |  CROSS JOIN rtot CROSS JOIN ttot
        |), scored AS (
        |  SELECT doc_id, COUNT(*) AS n_feats, SUM(w) AS logw_dec
        |  FROM rfeat JOIN wts USING (bucket) GROUP BY 1
        |), keyed AS (
        |  SELECT doc_id, n_feats, logw_dec,
        |    logw_dec + CAST(round(-ln(-ln(
        |      (('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)),
        |                       1, 13))::BIGINT + 0.5)
        |        / 4503599627370496.0)), 6) AS DECIMAL(18,6)) AS gkey
        |  FROM scored
        |)
        |SELECT doc_id, n_feats, CAST(logw_dec AS DOUBLE) AS logw, rank
        |FROM (
        |  SELECT doc_id, n_feats, logw_dec,
        |    ROW_NUMBER() OVER (ORDER BY gkey DESC, doc_id) AS rank
        |  FROM keyed) z
        |WHERE rank <= 50""".stripMargin)),

    // Interpolated Kneser-Ney bigram LM (the KenLM/CCNet smoothing
    // family): per-doc avg log2 p(w2|w1) with absolute discount 0.75
    // and continuation-count backoff. The oracle rebuilds the full
    // count tower (bigram types, history counts, distinct
    // continuations/histories, type total) in DuckDB.
    Q("q190_kneser_ney_lm",
      t => TextOps.kneserNeyBigram(t.documents, col("doc_id"),
                                   col("text")),
      Some("""WITH toks AS (
        |  SELECT doc_id, i AS pos,
        |    list_extract(string_split_regex(lower(text), '\s+'),
        |                 CAST(i AS INT)) AS tok
        |  FROM documents,
        |    UNNEST(generate_series(1,
        |      len(string_split_regex(lower(text), '\s+')))) t(i)
        |), bg AS (
        |  SELECT doc_id, tok AS w1, t1 AS w2 FROM (
        |    SELECT doc_id, tok,
        |      LEAD(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t1
        |    FROM toks) x
        |  WHERE t1 IS NOT NULL
        |), c12 AS (
        |  SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2
        |), hist AS (
        |  SELECT w1, SUM(c12) AS c1, COUNT(*) AS n1l FROM c12 GROUP BY 1
        |), cont AS (
        |  SELECT w2, COUNT(*) AS n1r FROM c12 GROUP BY 1
        |), tot AS (SELECT COUNT(*) AS b_types FROM c12)
        |SELECT doc_id, COUNT(*) AS n_bigrams,
        |  CAST(SUM(lp) AS DOUBLE) AS sum_logp,
        |  CAST(SUM(lp) AS DOUBLE) / COUNT(*) AS avg_logp
        |FROM (
        |  SELECT bg.doc_id,
        |    CAST(round(log2(
        |      (greatest(c12 - 0.75, 0.0) + 0.75 * n1l * n1r / b_types)
        |        / c1), 6) AS DECIMAL(18,6)) AS lp
        |  FROM bg
        |  JOIN c12 USING (w1, w2)
        |  JOIN hist USING (w1)
        |  JOIN cont USING (w2)
        |  CROSS JOIN tot) z
        |GROUP BY doc_id""".stripMargin)),

    // Hybrid retrieval: BM25 (first-5-token prefix queries, every 25th
    // doc, self kept) fused with brute-force embedding cosine (same
    // query ids, self excluded per Ann's contract) via reciprocal-rank
    // fusion, k_rrf = 60 — ranks only cross the fusion boundary, so
    // the gate inherits q185's and q58's proven rank parity.
    Q("q191_hybrid_rrf", { t =>
        val corpus = t.documents.select(col("doc_id"), col("text"))
        val queries = TextOps.prefixQueries(
          corpus.filter(col("doc_id") % 25 === 0),
          col("doc_id"), col("text"), nTokens = 5)
        val sparse = TextOps.searchBm25(
          corpus, col("doc_id"), col("text"),
          queries, col("qid"), col("qtext"), k = 20)
        val emb = t.embeddings.select(col("vec_id").as("id"),
                                      col("embedding"))
        val dense = graft.ann.Ann.bruteForceCosineTopK(
            emb.filter(col("id") % 25 === 0), emb, 20)
          .withColumnRenamed("vid", "doc_id")
        TextOps.rrfFuse(
          Seq(sparse.select("qid", "doc_id", "rank"),
              dense.select("qid", "doc_id", "rank")),
          topK = 10)
      },
      Some("""WITH dtoks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(lower(text), '\s+')) AS tok
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, tok, COUNT(*) AS tf FROM dtoks GROUP BY 1, 2
        |), dlen AS (
        |  SELECT doc_id, COUNT(*) AS len FROM dtoks GROUP BY 1
        |), stats AS (
        |  SELECT COUNT(*) AS nd,
        |    CAST(SUM(len) AS DOUBLE) / COUNT(*) AS avg_len
        |  FROM dlen
        |), dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1
        |), q AS (
        |  SELECT doc_id AS qid,
        |    array_to_string(list_slice(
        |      string_split_regex(lower(text), '\s+'), 1, 5), ' ')
        |      AS qtext
        |  FROM documents WHERE doc_id % 25 = 0
        |), qt AS (
        |  SELECT DISTINCT qid,
        |    unnest(string_split_regex(qtext, '\s+')) AS tok
        |  FROM q
        |), term AS (
        |  SELECT qt.qid, tf.doc_id,
        |    CAST(round(
        |      round(ln(1.0 + (nd - df + 0.5) / (df + 0.5)), 6)
        |        * tf * 2.2
        |        / (tf + 1.2 * (0.25 + 0.75 * len / avg_len)),
        |      6) AS DECIMAL(18,6)) AS contrib
        |  FROM qt
        |  JOIN tf USING (tok)
        |  JOIN dfq USING (tok)
        |  JOIN dlen ON dlen.doc_id = tf.doc_id
        |  CROSS JOIN stats
        |), sparse AS (
        |  SELECT qid, doc_id, rank FROM (
        |    SELECT qid, doc_id,
        |      ROW_NUMBER() OVER (PARTITION BY qid
        |        ORDER BY SUM(contrib) DESC, doc_id) AS rank
        |    FROM term GROUP BY qid, doc_id) r
        |  WHERE rank <= 20
        |), ev AS (
        |  SELECT vec_id, CAST(i - 1 AS BIGINT) AS d,
        |    CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS v
        |  FROM embeddings,
        |    UNNEST(generate_series(1, len(embedding))) t(i)
        |), norms AS (
        |  SELECT vec_id, SUM(v * v) AS nn FROM ev GROUP BY 1
        |), dots AS (
        |  SELECT a.vec_id AS qid, b.vec_id AS doc_id,
        |    SUM(a.v * b.v) AS dot
        |  FROM ev a JOIN ev b ON a.d = b.d
        |    AND a.vec_id % 25 = 0 AND a.vec_id <> b.vec_id
        |  GROUP BY 1, 2
        |), dense AS (
        |  SELECT qid, doc_id, rank FROM (
        |    SELECT dots.qid, dots.doc_id,
        |      ROW_NUMBER() OVER (PARTITION BY dots.qid
        |        ORDER BY round(dot / sqrt(na.nn * nb.nn), 6) DESC,
        |                 dots.doc_id) AS rank
        |    FROM dots
        |    JOIN norms na ON dots.qid = na.vec_id
        |    JOIN norms nb ON dots.doc_id = nb.vec_id) r
        |  WHERE rank <= 20
        |), fused AS (
        |  SELECT qid, doc_id,
        |    CAST(COUNT(*) AS INT) AS n_lists,
        |    SUM(CAST(round(1.0 / (60 + rank), 6)
        |             AS DECIMAL(18,6))) AS score_dec
        |  FROM (SELECT * FROM sparse UNION ALL SELECT * FROM dense) u
        |  GROUP BY 1, 2
        |)
        |SELECT qid, doc_id, n_lists,
        |  CAST(score_dec AS DOUBLE) AS score, rank
        |FROM (
        |  SELECT qid, doc_id, n_lists, score_dec,
        |    ROW_NUMBER() OVER (PARTITION BY qid
        |      ORDER BY score_dec DESC, doc_id) AS rank
        |  FROM fused) z
        |WHERE rank <= 10""".stripMargin)),

    // Exact ROC-AUC of the q157 log-odds quality classifier against
    // its own training labels (lang = 'en') — the Mann-Whitney U with
    // midrank ties, integer arithmetic until one final division, so
    // the gate is bit-exact with zero rounding. The filtering-model
    // evaluation primitive: a classifier-gated corpus keep/drop is
    // only as good as this number.
    Q("q193_classifier_auc", { t =>
        val scored = TextOps.logOddsQuality(
          t.documents, col("doc_id"), col("text"), col("lang") === "en")
        val labeled = scored.join(
          t.documents.select(col("doc_id"),
                             (col("lang") === "en").as("y")),
          "doc_id")
        graft.stats.Stats.aucRoc(labeled, col("score"), col("y"))
      },
      Some("""WITH toks AS (
        |  SELECT doc_id, (lang = 'en') AS pos,
        |    unnest(string_split_regex(lower(text), '\s+')) AS tok
        |  FROM documents
        |), pt AS (
        |  SELECT tok,
        |    SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS cpos,
        |    SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS cneg
        |  FROM toks GROUP BY tok
        |), tot AS (
        |  SELECT SUM(cpos) AS npos, SUM(cneg) AS nneg, COUNT(*) AS v
        |  FROM pt
        |), w AS (
        |  SELECT tok,
        |    CAST(round(log2(((cpos + 0.5) / (npos + 0.5 * v))
        |                    / ((cneg + 0.5) / (nneg + 0.5 * v))), 6)
        |         AS DECIMAL(18,6)) AS w
        |  FROM pt CROSS JOIN tot
        |), sc AS (
        |  SELECT doc_id,
        |    round(CAST(SUM(w) AS DOUBLE) / COUNT(*), 6) AS s
        |  FROM toks JOIN w USING (tok) GROUP BY doc_id
        |), lab AS (
        |  SELECT s, CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM sc JOIN documents d USING (doc_id)
        |), g AS (
        |  SELECT s, COUNT(*) AS n, SUM(y) AS np FROM lab GROUP BY 1
        |), r AS (
        |  SELECT np, n,
        |    SUM(n) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM g
        |)
        |SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
        |  CAST(SUM(n - np) AS BIGINT) AS n_neg,
        |  CAST(SUM(np * (2 * cum - (n - 1)))
        |       - SUM(np) * (SUM(np) + 1) AS DOUBLE)
        |    / (2 * SUM(np) * SUM(n - np)) AS auc
        |FROM r""".stripMargin)),

    // PII redaction with planted PII (the q103 planting, emails now
    // MIXED-CASE to exercise the case-insensitive matcher): masked
    // text plus per-row audit counts, compared verbatim.
    Q("q194_pii_redact", { t =>
        val planted = t.documents.select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 5 === 0,
              concat(lit(" contact User"), col("doc_id").cast("string"),
                     lit("@Example.COM now"))).otherwise(lit("")),
            when(col("doc_id") % 6 === 0,
              lit(" call 555-867-5309 or 555-123-4567"))
              .otherwise(lit(""))).as("text"))
        TextOps.redactPii(planted, col("doc_id"), col("text"))
      },
      Some("""WITH planted AS (
        |  SELECT doc_id, text
        |    || CASE WHEN doc_id % 5 = 0
        |       THEN ' contact User' || CAST(doc_id AS VARCHAR)
        |            || '@Example.COM now' ELSE '' END
        |    || CASE WHEN doc_id % 6 = 0
        |       THEN ' call 555-867-5309 or 555-123-4567' ELSE '' END
        |    AS text
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(text,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}',
        |    '<EMAIL>', 'g'),
        |    '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS text,
        |  CAST(len(regexp_extract_all(text,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS INT)
        |    AS n_email,
        |  CAST(len(regexp_extract_all(text,
        |    '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS INT) AS n_phone
        |FROM planted""".stripMargin)),

    // DPR-style hard-negative mining: BM25 top-10 per prefix query,
    // the query's own source doc is the gold positive, the 5
    // best-ranked non-gold survivors become training negatives with a
    // dense re-rank (Karpukhin et al. 2020 — BM25-mined negatives for
    // dense-retriever training).
    Q("q196_hard_negatives", { t =>
        val corpus = t.documents.select(col("doc_id"), col("text"))
        val queries = TextOps.prefixQueries(
          corpus.filter(col("doc_id") % 25 === 0),
          col("doc_id"), col("text"), nTokens = 5)
        val cand = TextOps.searchBm25(
          corpus, col("doc_id"), col("text"),
          queries, col("qid"), col("qtext"), k = 10)
        val gold = queries.select(col("qid"),
                                  col("qid").as("doc_id"))
        TextOps.mineHardNegatives(cand, gold, nNeg = 5)
      },
      Some("""WITH dtoks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(lower(text), '\s+')) AS tok
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, tok, COUNT(*) AS tf FROM dtoks GROUP BY 1, 2
        |), dlen AS (
        |  SELECT doc_id, COUNT(*) AS len FROM dtoks GROUP BY 1
        |), stats AS (
        |  SELECT COUNT(*) AS nd,
        |    CAST(SUM(len) AS DOUBLE) / COUNT(*) AS avg_len
        |  FROM dlen
        |), dfq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1
        |), q AS (
        |  SELECT doc_id AS qid,
        |    array_to_string(list_slice(
        |      string_split_regex(lower(text), '\s+'), 1, 5), ' ')
        |      AS qtext
        |  FROM documents WHERE doc_id % 25 = 0
        |), qt AS (
        |  SELECT DISTINCT qid,
        |    unnest(string_split_regex(qtext, '\s+')) AS tok
        |  FROM q
        |), term AS (
        |  SELECT qt.qid, tf.doc_id,
        |    CAST(round(
        |      round(ln(1.0 + (nd - df + 0.5) / (df + 0.5)), 6)
        |        * tf * 2.2
        |        / (tf + 1.2 * (0.25 + 0.75 * len / avg_len)),
        |      6) AS DECIMAL(18,6)) AS contrib
        |  FROM qt
        |  JOIN tf USING (tok)
        |  JOIN dfq USING (tok)
        |  JOIN dlen ON dlen.doc_id = tf.doc_id
        |  CROSS JOIN stats
        |), sparse AS (
        |  SELECT qid, doc_id, rank FROM (
        |    SELECT qid, doc_id,
        |      ROW_NUMBER() OVER (PARTITION BY qid
        |        ORDER BY SUM(contrib) DESC, doc_id) AS rank
        |    FROM term GROUP BY qid, doc_id) r
        |  WHERE rank <= 10
        |), neg AS (
        |  SELECT qid, doc_id, rank FROM sparse WHERE doc_id <> qid
        |)
        |SELECT qid, doc_id, rank, neg_rank FROM (
        |  SELECT qid, doc_id, rank,
        |    ROW_NUMBER() OVER (PARTITION BY qid
        |      ORDER BY rank, doc_id) AS neg_rank
        |  FROM neg) z
        |WHERE neg_rank <= 5""".stripMargin)),

    // C4 line+page cleaning rules over planted multi-line documents:
    // three token-slice sentences with terminal punctuation (kept), a
    // no-punctuation line and a short line (line-dropped), a
    // javascript line (line-dropped); every 11th doc gains a brace and
    // every 13th a lorem-ipsum line (page-dropped). Survivor text is
    // compared VERBATIM.
    Q("q199_c4_line_filter", { t =>
        val toks = split(lower(col("text")), "\\s+")
        val planted = t.documents.select(col("doc_id"),
          concat_ws("\n",
            concat(array_join(slice(toks, 1, 8), " "), lit(".")),
            array_join(slice(toks, 9, 6), " "),
            concat(array_join(slice(toks, 1, 3), " "), lit("!")),
            lit("please enable javascript to view this content."),
            concat(array_join(slice(toks, 15, 8), " "), lit("!")),
            when(col("doc_id") % 11 === 0, lit("code { risk }")),
            when(col("doc_id") % 13 === 0,
                 lit("standard lorem ipsum filler text.")),
            concat(array_join(slice(toks, 5, 9), " "), lit("?")))
            .as("text"))
        TextOps.cleanLinesC4(planted, col("doc_id"), col("text"))
      },
      Some("""WITH planted AS (
        |  SELECT doc_id, concat_ws(chr(10),
        |    array_to_string(list_slice(
        |      string_split_regex(lower(text), '\s+'), 1, 8), ' ') || '.',
        |    array_to_string(list_slice(
        |      string_split_regex(lower(text), '\s+'), 9, 14), ' '),
        |    array_to_string(list_slice(
        |      string_split_regex(lower(text), '\s+'), 1, 3), ' ') || '!',
        |    'please enable javascript to view this content.',
        |    array_to_string(list_slice(
        |      string_split_regex(lower(text), '\s+'), 15, 22), ' ') || '!',
        |    CASE WHEN doc_id % 11 = 0 THEN 'code { risk }' END,
        |    CASE WHEN doc_id % 13 = 0
        |         THEN 'standard lorem ipsum filler text.' END,
        |    array_to_string(list_slice(
        |      string_split_regex(lower(text), '\s+'), 5, 13), ' ') || '?'
        |    ) AS text
        |  FROM documents
        |), split_docs AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split(text, chr(10)), l ->
        |      trim(l) <> ''
        |      AND right(rtrim(l), 1) IN ('.', '!', '?', '"')
        |      AND len(string_split_regex(trim(l), '\s+')) >= 5
        |      AND NOT contains(lower(l), 'javascript')) AS kept,
        |    len(list_filter(string_split(text, chr(10)),
        |        l -> trim(l) <> '')) AS n_nonempty
        |  FROM planted
        |)
        |SELECT doc_id,
        |  array_to_string(kept, chr(10)) AS text,
        |  CAST(len(kept) AS BIGINT) AS n_lines_kept,
        |  CAST(n_nonempty - len(kept) AS BIGINT) AS n_lines_dropped
        |FROM split_docs
        |WHERE len(kept) >= 3
        |  AND NOT contains(lower(text), 'lorem ipsum')
        |  AND NOT contains(text, '{')""".stripMargin)),

    // Cross-corpus Kneser-Ney perplexity filter (the CCNet recipe):
    // LM trained on the even-id half of the corpus, every document
    // scored under it with the full backoff chain (seen pair /
    // OOV continuation / unseen history), so odd docs genuinely
    // exercise the backoff paths the self-scored q190 never hits.
    Q("q200_kn_perplexity_filter", { t =>
        val ref = t.documents.filter(col("doc_id") % 2 === 0)
        TextOps.knPerplexityFilter(
          ref, col("doc_id"), col("text"),
          t.documents, col("doc_id"), col("text"))
      },
      Some("""WITH toks AS (
        |  SELECT doc_id, i AS pos,
        |    list_extract(string_split_regex(lower(text), '\s+'),
        |                 CAST(i AS INT)) AS tok
        |  FROM documents,
        |    UNNEST(generate_series(1,
        |      len(string_split_regex(lower(text), '\s+')))) t(i)
        |), bg AS (
        |  SELECT doc_id, tok AS w1, t1 AS w2 FROM (
        |    SELECT doc_id, tok,
        |      LEAD(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t1
        |    FROM toks) x
        |  WHERE t1 IS NOT NULL
        |), rbg AS (SELECT * FROM bg WHERE doc_id % 2 = 0
        |), c12 AS (
        |  SELECT w1, w2, COUNT(*) AS c12 FROM rbg GROUP BY 1, 2
        |), hist AS (
        |  SELECT w1, SUM(c12) AS c1, COUNT(*) AS n1l FROM c12 GROUP BY 1
        |), cont AS (
        |  SELECT w2, COUNT(*) AS n1r FROM c12 GROUP BY 1
        |), tot AS (SELECT COUNT(*) AS b_types FROM c12)
        |SELECT doc_id, COUNT(*) AS n_bigrams,
        |  CAST(SUM(CASE WHEN c12 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_oov,
        |  CAST(SUM(lp) AS DOUBLE) AS sum_logp,
        |  round(-(CAST(SUM(lp) AS DOUBLE) / COUNT(*)), 6) AS ppl_log2
        |FROM (
        |  SELECT bg.doc_id, c12.c12,
        |    CAST(round(log2(CASE WHEN hist.c1 IS NOT NULL THEN
        |      (greatest(COALESCE(c12.c12, 0) - 0.75, 0.0)
        |        + 0.75 * hist.n1l
        |          * (COALESCE(cont.n1r, 1) / b_types)) / hist.c1
        |      ELSE COALESCE(cont.n1r, 1) / b_types END), 6)
        |      AS DECIMAL(18,6)) AS lp
        |  FROM bg
        |  LEFT JOIN c12 USING (w1, w2)
        |  LEFT JOIN hist USING (w1)
        |  LEFT JOIN cont USING (w2)
        |  CROSS JOIN tot) z
        |GROUP BY doc_id""".stripMargin)),

    // The standard web-corpus curation pipeline CHAINED end to end
    // (the q130/q183 whole-chain convention): C4 line+page cleaning
    // (q199's planting) -> line-granular paragraph dedup (Dolma's
    // paragraph = line) -> cross-corpus KN perplexity scoring with the
    // LM trained on the even-id half of the CURATED text. Docs whose
    // curated text drops below two tokens leave the report (no
    // bigrams to score) — the inner join is the contract.
    Q("q202_curation_chain", { t =>
        val toks = split(lower(col("text")), "\\s+")
        val planted = t.documents.select(col("doc_id"),
          concat_ws("\n",
            concat(array_join(slice(toks, 1, 8), " "), lit(".")),
            array_join(slice(toks, 9, 6), " "),
            concat(array_join(slice(toks, 1, 3), " "), lit("!")),
            lit("please enable javascript to view this content."),
            concat(array_join(slice(toks, 15, 8), " "), lit("!")),
            when(col("doc_id") % 11 === 0, lit("code { risk }")),
            when(col("doc_id") % 13 === 0,
                 lit("standard lorem ipsum filler text.")),
            concat(array_join(slice(toks, 5, 9), " "), lit("?")))
            .as("text"))
        val cleaned = TextOps.cleanLinesC4(planted, col("doc_id"),
                                           col("text"))
        val deduped = graft.dedup.Dedup.paragraphDedup(
          cleaned.select(col("doc_id"), col("text")),
          col("doc_id"), col("text"), sep = "\n")
        val scored = TextOps.knPerplexityFilter(
          deduped.filter(col("doc_id") % 2 === 0),
          col("doc_id"), col("text"),
          deduped, col("doc_id"), col("text"))
        deduped.join(scored, "doc_id")
          .select(col("doc_id"), col("text"), col("n_paras_kept"),
                  col("n_bigrams"), col("n_oov"), col("sum_logp"),
                  col("ppl_log2"))
      },
      Some("""WITH planted AS (
        |  SELECT doc_id, concat_ws(chr(10),
        |    array_to_string(list_slice(
        |      string_split_regex(lower(text), '\s+'), 1, 8), ' ') || '.',
        |    array_to_string(list_slice(
        |      string_split_regex(lower(text), '\s+'), 9, 14), ' '),
        |    array_to_string(list_slice(
        |      string_split_regex(lower(text), '\s+'), 1, 3), ' ') || '!',
        |    'please enable javascript to view this content.',
        |    array_to_string(list_slice(
        |      string_split_regex(lower(text), '\s+'), 15, 22), ' ') || '!',
        |    CASE WHEN doc_id % 11 = 0 THEN 'code { risk }' END,
        |    CASE WHEN doc_id % 13 = 0
        |         THEN 'standard lorem ipsum filler text.' END,
        |    array_to_string(list_slice(
        |      string_split_regex(lower(text), '\s+'), 5, 13), ' ') || '?'
        |    ) AS text
        |  FROM documents
        |), filt AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split(text, chr(10)), l ->
        |      trim(l) <> ''
        |      AND right(rtrim(l), 1) IN ('.', '!', '?', '"')
        |      AND len(string_split_regex(trim(l), '\s+')) >= 5
        |      AND NOT contains(lower(l), 'javascript')) AS kept
        |  FROM planted
        |), cleaned AS (
        |  SELECT doc_id, array_to_string(kept, chr(10)) AS text
        |  FROM filt
        |  WHERE len(kept) >= 3
        |    AND NOT contains(lower(text), 'lorem ipsum')
        |    AND NOT contains(text, '{')
        |), paras AS (
        |  SELECT doc_id, CAST(i - 1 AS INT) AS para_idx,
        |    list_extract(string_split(text, chr(10)),
        |                 CAST(i AS INT)) AS para
        |  FROM cleaned,
        |    UNNEST(generate_series(1,
        |      len(string_split(text, chr(10))))) t(i)
        |), hashed AS (
        |  SELECT doc_id, para_idx, para,
        |    ROW_NUMBER() OVER (
        |      PARTITION BY md5(regexp_replace(lower(trim(para)),
        |                                      '\s+', ' ', 'g'))
        |      ORDER BY doc_id, para_idx) AS rn
        |  FROM paras WHERE trim(para) <> ''
        |), dedup AS (
        |  SELECT doc_id,
        |    COALESCE(string_agg(CASE WHEN rn = 1 THEN para END,
        |      chr(10) ORDER BY para_idx), '') AS text,
        |    CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_paras_kept
        |  FROM hashed GROUP BY doc_id
        |), toks AS (
        |  SELECT doc_id, i AS pos,
        |    list_extract(string_split_regex(lower(text), '\s+'),
        |                 CAST(i AS INT)) AS tok
        |  FROM dedup,
        |    UNNEST(generate_series(1,
        |      len(string_split_regex(lower(text), '\s+')))) t(i)
        |), bg AS (
        |  SELECT doc_id, tok AS w1, t1 AS w2 FROM (
        |    SELECT doc_id, tok,
        |      LEAD(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t1
        |    FROM toks) x
        |  WHERE t1 IS NOT NULL
        |), rbg AS (SELECT * FROM bg WHERE doc_id % 2 = 0
        |), c12 AS (
        |  SELECT w1, w2, COUNT(*) AS c12 FROM rbg GROUP BY 1, 2
        |), hist AS (
        |  SELECT w1, SUM(c12) AS c1, COUNT(*) AS n1l FROM c12 GROUP BY 1
        |), cont AS (
        |  SELECT w2, COUNT(*) AS n1r FROM c12 GROUP BY 1
        |), tot AS (SELECT COUNT(*) AS b_types FROM c12
        |), scored AS (
        |  SELECT doc_id, COUNT(*) AS n_bigrams,
        |    CAST(SUM(CASE WHEN c12 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_oov,
        |    CAST(SUM(lp) AS DOUBLE) AS sum_logp,
        |    round(-(CAST(SUM(lp) AS DOUBLE) / COUNT(*)), 6) AS ppl_log2
        |  FROM (
        |    SELECT bg.doc_id, c12.c12,
        |      CAST(round(log2(CASE WHEN hist.c1 IS NOT NULL THEN
        |        (greatest(COALESCE(c12.c12, 0) - 0.75, 0.0)
        |          + 0.75 * hist.n1l
        |            * (COALESCE(cont.n1r, 1) / b_types)) / hist.c1
        |        ELSE COALESCE(cont.n1r, 1) / b_types END), 6)
        |        AS DECIMAL(18,6)) AS lp
        |    FROM bg
        |    LEFT JOIN c12 USING (w1, w2)
        |    LEFT JOIN hist USING (w1)
        |    LEFT JOIN cont USING (w2)
        |    CROSS JOIN tot) z
        |  GROUP BY doc_id
        |)
        |SELECT d.doc_id, d.text, d.n_paras_kept, s.n_bigrams,
        |  s.n_oov, s.sum_logp, s.ppl_log2
        |FROM dedup d JOIN scored s USING (doc_id)""".stripMargin)),

    // fastText-style quality classifier (the DCLM / FineWeb-Edu
    // recipe): full-batch logistic regression over hashed n-gram
    // counts, 2 GD epochs at lr 0.5, label = (lang = 'en'); every doc
    // then scored under the trained weights. The oracle unrolls both
    // epochs — epoch 1 starts from w = 0 (p = sigma(0) = 0.5 exactly),
    // epoch 2 rescales from epoch 1's weights; weights stay exact
    // DECIMAL(18,6) throughout, so only sigma and the eta*g/N step
    // round (both engines round the same IEEE double).
    Q("q203_logreg_quality", { t =>
        val model = TextOps.fitQualityClassifier(
          t.documents, col("doc_id"), col("text"),
          (col("lang") === "en").cast("long"),
          nBuckets = 500, epochs = 2, lr = 0.5)
        TextOps.scoreQualityClassifier(
          t.documents, col("doc_id"), col("text"), model,
          nBuckets = 500)
      },
      Some("""WITH toks AS (
        |  SELECT doc_id, i AS pos,
        |    list_extract(string_split_regex(lower(text), '\s+'),
        |                 CAST(i AS INT)) AS tok
        |  FROM documents, UNNEST(generate_series(1,
        |    len(string_split_regex(lower(text), '\s+')))) t(i)
        |  WHERE len(tok) > 0
        |), feats AS (
        |  SELECT doc_id,
        |    (('0x' || substr(md5(ngram), 1, 8))::BIGINT) % 500
        |      AS bucket
        |  FROM (
        |    SELECT doc_id, tok AS ngram FROM toks
        |    UNION ALL
        |    SELECT doc_id, tok || ' ' || t1 AS ngram FROM (
        |      SELECT doc_id, tok,
        |        LEAD(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos)
        |          AS t1
        |      FROM toks) z WHERE t1 IS NOT NULL)
        |), x AS (
        |  SELECT doc_id, bucket, COUNT(*) AS x
        |  FROM feats GROUP BY 1, 2
        |), lab AS (
        |  SELECT doc_id,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents
        |), nn AS (SELECT COUNT(*) AS n FROM lab
        |), r1 AS (
        |  SELECT doc_id, CAST(0.5 AS DECIMAL(18,6)) - y AS r FROM lab
        |), g1 AS (
        |  SELECT bucket, SUM(x * r) AS g
        |  FROM x JOIN r1 USING (doc_id) GROUP BY 1
        |), w1 AS (
        |  SELECT bucket,
        |    CAST(0 AS DECIMAL(18,6))
        |      - CAST(round(CAST(g AS DOUBLE) * 0.5 / n, 6)
        |             AS DECIMAL(18,6)) AS w
        |  FROM g1 CROSS JOIN nn
        |), b1 AS (
        |  SELECT CAST(0 AS DECIMAL(18,6))
        |    - CAST(round(CAST((SELECT SUM(r) FROM r1) AS DOUBLE)
        |                 * 0.5 / (SELECT n FROM nn), 6)
        |           AS DECIMAL(18,6)) AS b
        |), dot2 AS (
        |  SELECT x.doc_id,
        |    SUM(x * COALESCE(w1.w, CAST(0 AS DECIMAL(18,6)))) AS dot
        |  FROM x LEFT JOIN w1 USING (bucket) GROUP BY 1
        |), r2 AS (
        |  SELECT lab.doc_id,
        |    CAST(round(1.0 / (1.0 + exp(-CAST(
        |        COALESCE(dot, CAST(0 AS DECIMAL(18,6))) + b
        |      AS DOUBLE))), 6) AS DECIMAL(18,6)) - y AS r
        |  FROM lab LEFT JOIN dot2 USING (doc_id) CROSS JOIN b1
        |), g2 AS (
        |  SELECT bucket, SUM(x * r) AS g
        |  FROM x JOIN r2 USING (doc_id) GROUP BY 1
        |), w2 AS (
        |  SELECT bucket,
        |    COALESCE(w1.w, CAST(0 AS DECIMAL(18,6)))
        |      - CAST(round(CAST(g AS DOUBLE) * 0.5 / n, 6)
        |             AS DECIMAL(18,6)) AS w
        |  FROM g2 LEFT JOIN w1 USING (bucket) CROSS JOIN nn
        |), b2 AS (
        |  SELECT (SELECT b FROM b1)
        |    - CAST(round(CAST((SELECT SUM(r) FROM r2) AS DOUBLE)
        |                 * 0.5 / (SELECT n FROM nn), 6)
        |           AS DECIMAL(18,6)) AS b
        |), dotf AS (
        |  SELECT x.doc_id,
        |    SUM(x * COALESCE(w2.w, CAST(0 AS DECIMAL(18,6)))) AS dot
        |  FROM x LEFT JOIN w2 USING (bucket) GROUP BY 1
        |)
        |SELECT lab.doc_id,
        |  CAST(COALESCE(dot, CAST(0 AS DECIMAL(18,6))) + b AS DOUBLE)
        |    AS logit,
        |  round(1.0 / (1.0 + exp(-CAST(
        |      COALESCE(dot, CAST(0 AS DECIMAL(18,6))) + b
        |    AS DOUBLE))), 6) AS p_hat
        |FROM lab LEFT JOIN dotf USING (doc_id) CROSS JOIN b2"""
        .stripMargin))
  )
}
