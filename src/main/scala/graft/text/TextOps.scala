package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language identification,
  * fingerprinting (extends the reference's tag-tokenization surface,
  * Data_manager/TagPreprocessing.py:20-62, to the document domain).
  *
  * Everything is built from codegen'd `functions._` expressions — no
  * UDFs — so whole-stage codegen covers the entire pipeline and the
  * operators run at scan speed on a 100 TB corpus.
  */
object TextOps {

  /** Adjacent token pairs (doc_id, w1, w2) — the shared bigram
    * builder behind [[bigramLogProb]], [[kneserNeyBigram]] and
    * [[knPerplexityFilter]] (one definition: the cross-corpus scores
    * are only comparable if all three pair texts identically).
    * Documents with fewer than two tokens produce no row. Pure
    * per-row array work (zip_with against the 1-shifted slice),
    * exploded once. */
  def bigramPairs(docs: DataFrame, id: Column, text: Column)
      : DataFrame = {
    val tarr = tokens(text)
    docs.select(id.as("doc_id"),
        explode(filter(
          zip_with(tarr, slice(tarr, lit(2),
                               greatest(size(tarr) - 1, lit(0))),
                   (a, b) => struct(a.as("w1"), b.as("w2"))),
          p => p.getField("w2").isNotNull)).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
  }

  /** Whitespace tokenization of lowercased text. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** BPE-ish subword pre-tokenization: the GPT-2-style split into
    * letter runs, digit runs, and punctuation runs (the regex stage
    * that precedes byte-pair merging; merging itself needs a learned
    * vocabulary, so run counts are the engine-portable measure of
    * token load). Codegen'd regexp — scan speed. */
  val bpeishPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+"
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit(bpeishPattern), lit(0))

  /** Stopword sets used by the language-ID heuristic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un"),
    "es" -> Seq("el", "los", "las", "y", "es", "una"))

  private def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Quality features + composite score per document: token count,
    * mean token length, non-alphanumeric ratio, stopword ratio —
    * the standard length/punct/stopword heuristics of corpus filtering.
    * All ratios are exact integer rationals; the composite is rounded
    * to 6 decimals. */
  def qualityFeatures(docs: DataFrame, text: Column): DataFrame = {
    val toks = tokens(text)
    docs
      .withColumn("n_chars", length(text))
      .withColumn("n_tokens", size(toks))
      .withColumn("n_alnum",
        length(regexp_replace(lower(text), "[^a-z0-9 ]", "")))
      .withColumn("n_stop", hitCount(toks, stopwords("en")))
      .withColumn("punct_ratio",
        (col("n_chars") - col("n_alnum")).cast("double") / col("n_chars"))
      .withColumn("stop_ratio",
        col("n_stop").cast("double") / col("n_tokens"))
      .withColumn("mean_token_len",
        (col("n_alnum") - (col("n_tokens") - 1)).cast("double") /
          col("n_tokens"))
      .withColumn("quality", round(
        least(col("n_tokens").cast("double") / 100, lit(1.0)) * 0.4 +
        (lit(1.0) - col("punct_ratio")) * 0.3 +
        least(col("stop_ratio") * 5, lit(1.0)) * 0.3, 6))
  }

  /** N-gram-free stopword-vote language ID: count stopword hits per
    * candidate language, predict the argmax with a deterministic
    * priority order, fall back to "und" when nothing matches. */
  def languageId(docs: DataFrame, text: Column): DataFrame = {
    val toks = tokens(text)
    val withHits = docs
      .withColumn("hits_en", hitCount(toks, stopwords("en")))
      .withColumn("hits_de", hitCount(toks, stopwords("de")))
      .withColumn("hits_fr", hitCount(toks, stopwords("fr")))
      .withColumn("hits_es", hitCount(toks, stopwords("es")))
    withHits.withColumn("pred_lang",
      when(col("hits_en") + col("hits_de") + col("hits_fr") +
           col("hits_es") === 0, "und")
        .when(col("hits_en") >= col("hits_de") &&
              col("hits_en") >= col("hits_fr") &&
              col("hits_en") >= col("hits_es"), "en")
        .when(col("hits_de") >= col("hits_fr") &&
              col("hits_de") >= col("hits_es"), "de")
        .when(col("hits_fr") >= col("hits_es"), "fr")
        .otherwise("es"))
  }

  /** F9 — light suffix-stripping stemmer over a token array (the
    * reference applies Porter stemming to Movielens tags,
    * Data_manager/TagPreprocessing.py:20-62; this is the builtin-
    * expression form — regex suffix rules, no UDF, so it stays inside
    * codegen). */
  def stemLight(toks: Column): Column =
    transform(toks, t =>
      when(length(t) > 5 && t.rlike("(ing|edly)$"),
           regexp_replace(t, "(ing|edly)$", ""))
        .when(length(t) > 4 && t.rlike("(ed|es|ly)$"),
              regexp_replace(t, "(ed|es|ly)$", ""))
        .when(length(t) > 3 && t.rlike("s$") && !t.rlike("(ss|us)$"),
              regexp_replace(t, "s$", ""))
        .otherwise(t))

  /** F9 (exact parity) — Porter stemming over a token array, matching
    * the reference's nltk PorterStemmer (NLTK_EXTENSIONS mode) that
    * tagFilterAndStemming applies per tag
    * (Data_manager/TagPreprocessing.py:41-62). The per-token algorithm
    * is inherently procedural, so this is the engine's one deliberate
    * scalar UDF; the tokenization/normalization around it stays in
    * codegen'd expressions. [[stemLight]] remains the UDF-free
    * approximation for scan-speed pipelines. */
  private val porterUdf = udf((toks: Seq[String]) =>
    if (toks == null) null else toks.map(PorterStemmer.stem))
  def stemPorter(toks: Column): Column = porterUdf(toks)

  /** The full NLTK English stopword list (179 words) — the set the
    * reference's tag pipeline filters against
    * (TagPreprocessing.py:28/50, `nltk.corpus.stopwords.words(
    * 'english')`; the list itself is published public data). */
  val nltkEnglishStopwords: Seq[String] = Seq(
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
    "you're", "you've", "you'll", "you'd", "your", "yours", "yourself",
    "yourselves", "he", "him", "his", "himself", "she", "she's", "her",
    "hers", "herself", "it", "it's", "its", "itself", "they", "them",
    "their", "theirs", "themselves", "what", "which", "who", "whom",
    "this", "that", "that'll", "these", "those", "am", "is", "are",
    "was", "were", "be", "been", "being", "have", "has", "had",
    "having", "do", "does", "did", "doing", "a", "an", "the", "and",
    "but", "if", "or", "because", "as", "until", "while", "of", "at",
    "by", "for", "with", "about", "against", "between", "into",
    "through", "during", "before", "after", "above", "below", "to",
    "from", "up", "down", "in", "out", "on", "off", "over", "under",
    "again", "further", "then", "once", "here", "there", "when",
    "where", "why", "how", "all", "any", "both", "each", "few", "more",
    "most", "other", "some", "such", "no", "nor", "not", "only", "own",
    "same", "so", "than", "too", "very", "s", "t", "can", "will",
    "just", "don", "don't", "should", "should've", "now", "d", "ll",
    "m", "o", "re", "ve", "y", "ain", "aren", "aren't", "couldn",
    "couldn't", "didn", "didn't", "doesn", "doesn't", "hadn", "hadn't",
    "hasn", "hasn't", "haven", "haven't", "isn", "isn't", "ma",
    "mightn", "mightn't", "mustn", "mustn't", "needn", "needn't",
    "shan", "shan't", "shouldn", "shouldn't", "wasn", "wasn't",
    "weren", "weren't", "won", "won't", "wouldn", "wouldn't")

  /** The reference's tagFilter (TagPreprocessing.py:20-37): strip
    * non-alphanumerics, collapse runs of spaces, split, drop RAW tokens
    * found in the NLTK stopword list. Empty-string tokens from
    * leading/trailing separators survive, exactly as in the reference
    * (Python "".split keeps them and "" is not a stopword). */
  def tagFilter(tag: Column): Column = {
    val cleaned = regexp_replace(
      regexp_replace(tag, "[^a-zA-Z0-9]", " "), " +", " ")
    filter(split(cleaned, " "),
           t => !t.isInCollection(nltkEnglishStopwords))
  }

  /** The reference's tagFilterAndStemming pipeline
    * (TagPreprocessing.py:41-62): strip non-alphanumerics, collapse
    * spaces, split, Porter-stem each token, then drop tokens whose
    * STEM is in the full NLTK stopword list — the reference stems
    * first and filters the stemmed form (so e.g. "owned" → "own" is
    * dropped even though "owned" is not a stopword). Empty-string
    * tokens survive, exactly as in the reference. */
  def tagFilterAndStem(tag: Column): Column = {
    val cleaned = regexp_replace(
      regexp_replace(tag, "[^a-zA-Z0-9]", " "), " +", " ")
    filter(stemPorter(split(cleaned, " ")),
           t => !t.isInCollection(nltkEnglishStopwords))
  }

  /** Within-document repetition: the share of word 3-grams that repeat
    * an earlier 3-gram of the SAME document, 1 − distinct/total — the
    * standard repetitive-text filter for LLM training corpora (looping
    * boilerplate scores high, natural prose low). Exact integer
    * rational; scan-shaped (explode → per-doc window → groupBy). */
  def repetitionRatio(docs: DataFrame, id: Column, text: Column)
      : DataFrame =
    graft.dedup.Dedup
      .shingles(docs, id, text, 3, distinctShingles = false)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
           countDistinct(col("shingle")).as("n_distinct"))
      .withColumn("rep_ratio",
        lit(1.0) - col("n_distinct").cast("double") / col("n_grams"))

  /** Benchmark contamination: per corpus document, the share of its
    * DISTINCT word 3-grams that appear anywhere in the benchmark set —
    * the eval-leakage check run before training on scraped corpora.
    * The benchmark shingle set is deduplicated once and the overlap is
    * a semi-join on the shingle key: corpus-scan-shaped, no pairwise
    * document comparison. */
  def contamination(corpus: DataFrame, benchmark: DataFrame,
                    id: Column, text: Column): DataFrame = {
    val c = graft.core.CacheScope.persist(
      graft.dedup.Dedup.shingles(corpus, id, text, 3))
    val bench = graft.dedup.Dedup.shingles(benchmark, id, text, 3)
      .select("shingle").distinct()
    val totals = c.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    val hits = c.join(bench, Seq("shingle"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
    totals.join(hits, Seq("doc_id"), "left")
      .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
      .withColumn("contamination",
        col("n_hit").cast("double") / col("n_grams"))
  }

  /** Corpus-unigram LM quality score per document: the average log2
    * probability of the document's tokens under the corpus's own
    * unigram distribution — the cheap LM-perplexity proxy of corpus
    * filtering (documents of rare/garbled tokens score low, documents
    * of common vocabulary high). The token stream joins its vocabulary
    * counts co-partitioned on the token key — NOT a forced broadcast:
    * the vocabulary is corpus-dependent (billions of distinct tokens
    * at 100 TB), so the join must degrade to shuffle; AQE broadcasts
    * it by itself whenever it is actually small. Only the total-count
    * scalar is broadcast. No N² anything.
    *
    * Cross-engine determinism: the per-token log2(c/N) is rounded to 6
    * decimals BEFORE accumulation and summed as exact decimal, so both
    * engines add identical addends in any order (the repo's standard
    * transcendental + round discipline). `avg_prob` is the pure-integer
    * twin — Σc / (n·N) — exact on any engine. */
  def unigramLogProb(docs: DataFrame, id: Column, text: Column)
      : DataFrame = {
    val toks = graft.core.CacheScope.persist(
      docs.select(id.as("doc_id"),
                  explode(tokens(text)).as("tok")))
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    val total = toks.agg(count(lit(1)).as("n_corpus"))
    toks.join(counts, "tok")
      .crossJoin(broadcast(total))
      .withColumn("logp",
        round(log2(col("c").cast("double") / col("n_corpus")), 6)
          .cast("decimal(18,6)"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
           round(sum(col("logp")).cast("double") / count(lit(1)), 6)
             .as("avg_logp"),
           (sum(col("c").cast("decimal(28,0)")).cast("double") /
              (count(lit(1)) * first(col("n_corpus")))).as("avg_prob"))
  }

  /** Classifier-based quality scoring, trained and applied in one
    * distributed plan — the GPT-3-recipe shape (train a classifier
    * with a curated corpus as the positive class and raw web as the
    * negative, score everything, keep high scorers). The
    * SQL-expressible twin of that logistic/fasttext classifier is
    * smoothed naive-Bayes log-odds (Monroe et al. 2008 "Fightin'
    * Words"): per token,
    *   w(t) = log2( ((c⁺+α)/(N⁺+αV)) / ((c⁻+α)/(N⁻+αV)) ),
    * and a document scores the mean w over its tokens; sign ⇒
    * predicted class.
    *
    * Training is one token-keyed aggregate (class counts per token) +
    * one 3-scalar broadcast; inference joins the |vocab|-bounded
    * weight frame back to the token stream co-partitioned by token —
    * nothing is collected, both phases are the same shuffle axis.
    * Determinism: per-token weights rounded to 6 then summed as exact
    * decimals (the transcendental-aggregate convention). */
  def logOddsQuality(docs: DataFrame, id: Column, text: Column,
                     positive: Column, alpha: Double = 0.5)
      : DataFrame = {
    val toks = graft.core.CacheScope.persist(
      docs.select(id.as("doc_id"), positive.as("pos"),
                  explode(tokens(text)).as("tok")))
    val perTok = toks.groupBy("tok").agg(
      sum(when(col("pos"), 1L).otherwise(0L)).as("cpos"),
      sum(when(col("pos"), 0L).otherwise(1L)).as("cneg"))
    val tot = perTok.agg(sum("cpos").as("npos"), sum("cneg").as("nneg"),
                         count(lit(1)).as("v"))
    val weights = perTok.crossJoin(broadcast(tot))
      .withColumn("w",
        round(log2(((col("cpos") + alpha) /
                      (col("npos") + col("v") * alpha)) /
                   ((col("cneg") + alpha) /
                      (col("nneg") + col("v") * alpha))), 6)
          .cast("decimal(18,6)"))
      .select("tok", "w")
    toks.join(weights, "tok")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
           round(sum(col("w")).cast("double") / count(lit(1)), 6)
             .as("score"))
      .withColumn("predicted",
        when(col("score") > 0, lit("positive")).otherwise(lit("negative")))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020, the
    * filtering recipe behind CCNet/LLaMA web corpora): score TARGET
    * documents under a unigram LM trained on a separate REFERENCE
    * corpus — add-1 smoothing p(tok) = (c+1)/(N+V) keeps
    * out-of-vocabulary tokens finite (c = 0, a LEFT join against the
    * reference counts) — then split the score distribution into
    * head / middle / tail terciles, the buckets the recipe keeps,
    * subsamples, and drops respectively.
    *
    * Differs from [[unigramLogProb]] exactly where the production
    * recipe does: the LM is trained on held-out data (scoring its own
    * training corpus underestimates perplexity), OOV mass exists, and
    * the output is the actionable bucket, not just a score.
    *
    * Scale: reference counts join the target tokens co-partitioned by
    * token (the count frame is |vocab|-sized, never collected); the
    * tercile cuts are one exact-percentile aggregate broadcast as two
    * scalars. Determinism: per-token −log2 rounded to 6 then summed as
    * exact decimals (the engine's transcendental-aggregate
    * convention); the cuts are exact linear-interpolation percentiles
    * (= SQL quantile_cont), and a tercile cut never coincides with a
    * data point it could misclassify — interpolation lands strictly
    * between adjacent distinct order stats, and collapses exactly onto
    * them when they tie. */
  def perplexityBuckets(refDocs: DataFrame, targetDocs: DataFrame,
                        id: Column, text: Column): DataFrame = {
    val refToks = graft.core.CacheScope.persist(
      refDocs.select(explode(tokens(text)).as("tok")))
    val counts = refToks.groupBy("tok").agg(count(lit(1)).as("c"))
    val stats = refToks.agg(count(lit(1)).as("n_ref"),
                            countDistinct(col("tok")).as("v_ref"))
    val tToks = targetDocs.select(id.as("doc_id"),
                                  explode(tokens(text)).as("tok"))
    val scored = graft.core.CacheScope.persist(
      tToks.join(counts, Seq("tok"), "left")
        .na.fill(0L, Seq("c"))
        .crossJoin(broadcast(stats))
        .withColumn("nlogp",
          round(-log2((col("c") + 1).cast("double") /
                        (col("n_ref") + col("v_ref"))), 6)
            .cast("decimal(18,6)"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
             round(sum(col("nlogp")).cast("double") / count(lit(1)), 6)
               .as("score")))
    val cuts = scored.agg(
      percentile(col("score"), lit(1.0 / 3)).as("p33"),
      percentile(col("score"), lit(2.0 / 3)).as("p67"))
    scored.crossJoin(broadcast(cuts))
      .withColumn("bucket",
        when(col("score") <= col("p33"), "head")
          .when(col("score") <= col("p67"), "middle")
          .otherwise("tail"))
      .select("doc_id", "n_tokens", "score", "bucket")
  }

  /** Corpus-bigram LM quality score with add-1 smoothing: per document,
    * the average log2 of p(w2|w1) = (c(w1,w2)+1)/(c(w1)+V) over its
    * bigrams — the stronger perplexity proxy next to
    * [[unigramLogProb]] (word order now matters: scrambled text scores
    * below fluent text with identical token counts). One token explode
    * feeds the bigram counts, the history counts, and the vocabulary
    * scalar; the per-doc aggregation is keyed by document. Per-term
    * round-6 + exact decimal summation, the engine's cross-engine
    * convention for transcendental aggregates. Documents with fewer
    * than two tokens have no bigrams and produce no row. */
  def bigramLogProb(docs: DataFrame, id: Column, text: Column)
      : DataFrame = {
    val toks = graft.core.CacheScope.persist(
      docs.select(id.as("doc_id"), explode(tokens(text)).as("tok")))
    val bg = graft.core.CacheScope.persist(bigramPairs(docs, id, text))
    val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = toks.groupBy(col("tok").as("w1")).agg(count(lit(1)).as("c1"))
    val v = toks.agg(countDistinct("tok").as("v"))
    bg.join(c12, Seq("w1", "w2"))
      .join(broadcast(c1), Seq("w1"))
      .crossJoin(broadcast(v))
      .withColumn("logp",
        round(log2((col("c12") + lit(1.0)) / (col("c1") + col("v"))), 6)
          .cast("decimal(18,6)"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
           // the exact decimal total is the cross-engine-stable score;
           // avg = sum/n re-rounds a quotient that can land exactly on
           // a 5e-7 boundary (measured: doc 375 at sf0.01), so the avg
           // rides along unrounded and the oracle gates on the sum
           sum(col("logp")).cast("double").as("sum_logp"),
           (sum(col("logp")).cast("double") / count(lit(1)))
             .as("avg_logp"))
  }

  /** Interpolated Kneser–Ney bigram LM score (Kneser & Ney, ICASSP
    * 1995; the smoothing family behind KenLM and therefore behind
    * CCNet-style perplexity filtering) — per document, the average
    * log2 of
    *
    *   p(w2|w1) = max(c(w1,w2) − d, 0)/c(w1·)
    *            + d · N1+(w1·)/c(w1·) · N1+(·w2)/B
    *
    * with absolute discount d = 0.75 (exact in binary), where c(w1·)
    * counts w1 AS A HISTORY (last tokens of a document head no bigram
    * and are not histories), N1+(w1·)/N1+(·w2) are the
    * distinct-continuation/distinct-history type counts, and B is the
    * corpus's distinct bigram-type count. Unlike [[bigramLogProb]]'s
    * add-1, the backoff mass goes to tokens by how many CONTEXTS they
    * complete, not how often they occur — "francisco" is frequent but
    * follows only "san", so KN (correctly) scores it low in a fresh
    * context. Scored over the corpus's own counts, so every bigram is
    * observed and the discounted term never vanishes entirely.
    *
    * Scale shape: one bigram explode feeds ONE (w1,w2) count shuffle;
    * the history aggregate (c1, N1+(w1·)) reduces that bigram-TYPE
    * frame — already grouped on w1, no second pass over the corpus —
    * and joins back on w1/w2. None of the count frames broadcast: a
    * web-scale vocabulary (typos, URLs) is itself a corpus-sized axis,
    * so the history and continuation joins shuffle on their natural
    * keys and only the two scalar totals broadcast. Per-term round-6
    * log2 + exact-decimal accumulation (the engine's cross-engine
    * convention); documents with fewer than two tokens produce no
    * row. */
  def kneserNeyBigram(docs: DataFrame, id: Column, text: Column,
                      d: Double = 0.75): DataFrame = {
    require(d > 0 && d < 1, s"discount d must be in (0,1), got $d")
    val bg = graft.core.CacheScope.persist(bigramPairs(docs, id, text))
    // bigram types: the single corpus-scale shuffle; everything below
    // reduces or joins this frame
    val c12 = graft.core.CacheScope.persist(
      bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12")))
    val hist = c12.groupBy("w1")
      .agg(sum("c12").as("c1"), count(lit(1)).as("n1l"))
    val cont = c12.groupBy("w2").agg(count(lit(1)).as("n1r"))
    val totals = c12.agg(count(lit(1)).as("b_types"))
    bg.join(c12, Seq("w1", "w2"))
      .join(hist, Seq("w1"))
      .join(cont, Seq("w2"))
      .crossJoin(broadcast(totals))
      .withColumn("logp",
        round(log2(
          (greatest(col("c12") - lit(d), lit(0.0)) +
            lit(d) * col("n1l") * col("n1r") / col("b_types")) /
          col("c1")), 6).cast("decimal(18,6)"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
           // decimal total is the gated score; the avg rides along
           // unrounded (the q126 boundary lesson)
           sum(col("logp")).cast("double").as("sum_logp"),
           (sum(col("logp")).cast("double") / count(lit(1)))
             .as("avg_logp"))
  }

  /** PII pattern scan: per-document counts of email-shaped and
    * NANP-phone-shaped substrings — the redaction/filter pre-pass of
    * corpus hygiene. Codegen'd regexp over the scan, no UDF; the
    * patterns avoid every Java-vs-RE2 dialect divergence (no
    * lookaround, no backrefs) so the same counts come out of any
    * engine. */
  val emailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val phonePattern = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
  def piiCounts(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(
      id.as("doc_id"),
      regexp_count(lower(text), lit(emailPattern)).as("n_email"),
      regexp_count(text, lit(phonePattern)).as("n_phone"))

  /** PII redaction: replace email-shaped and NANP-phone-shaped
    * substrings with placeholder tags — the masking counterpart of
    * [[piiCounts]] (a training corpus needs the REDACTED text, not
    * just the audit number). Case-insensitive email matching on the
    * ORIGINAL text (unlike the count's lowercase scan, redaction must
    * preserve the surrounding text verbatim), same
    * dialect-divergence-free patterns. Codegen'd regexp_replace over
    * the scan — no UDF, scan speed at any corpus size. Returns
    * (doc_id, text, n_email, n_phone) with the counts of what was
    * masked, so the redaction is auditable row-by-row. */
  val emailPatternCi =
    "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  def redactPii(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(
      id.as("doc_id"),
      regexp_replace(
        regexp_replace(text, lit(emailPatternCi), lit("<EMAIL>")),
        lit(phonePattern), lit("<PHONE>")).as("text"),
      regexp_count(text, lit(emailPatternCi)).as("n_email"),
      regexp_count(text, lit(phonePattern)).as("n_phone"))

  /** Composite corpus filter — the C4/Gopher-style keep/drop decision
    * that production training pipelines run over every document:
    * length band, heuristic quality score, within-document repetition,
    * and corpus-unigram LM score, each surfaced as its own flag column
    * (so drops are attributable) with keep = all rules pass.
    *
    * Plan shape: one codegen'd scan (length/quality flags) plus two
    * doc-keyed aggregations (repetition, LM) joined back on doc_id —
    * three scan-sized stages, no pairwise anything, 100 TB-safe.
    * Documents too short to have a 3-gram have no repetition row and
    * pass that rule (coalesce 0). */
  def qualityFilter(docs: DataFrame, id: Column, text: Column,
                    minTokens: Long, maxTokens: Long,
                    minQuality: Double, maxRep: Double,
                    minAvgLogp: Double): DataFrame = {
    val base = docs.select(id.as("doc_id"), text.as("text"))
    val q = qualityFeatures(base, col("text"))
      .select(col("doc_id"), col("n_tokens"), col("quality"))
    val rep = repetitionRatio(base, col("doc_id"), col("text"))
      .select(col("doc_id"), col("rep_ratio"))
    val lm = unigramLogProb(base, col("doc_id"), col("text"))
      .select(col("doc_id"), col("avg_logp"))
    q.join(rep, Seq("doc_id"), "left").join(lm, Seq("doc_id"), "left")
      .withColumn("rep_ratio",
        round(coalesce(col("rep_ratio"), lit(0.0)), 6))
      .withColumn("f_len",
        (col("n_tokens") >= minTokens &&
         col("n_tokens") <= maxTokens).cast("int"))
      .withColumn("f_quality", (col("quality") >= minQuality).cast("int"))
      .withColumn("f_rep", (col("rep_ratio") <= maxRep).cast("int"))
      .withColumn("f_lm", (col("avg_logp") >= minAvgLogp).cast("int"))
      .withColumn("keep",
        (col("f_len") === 1 && col("f_quality") === 1 &&
         col("f_rep") === 1 && col("f_lm") === 1).cast("int"))
      .select("doc_id", "n_tokens", "quality", "rep_ratio", "avg_logp",
              "f_len", "f_quality", "f_rep", "f_lm", "keep")
  }

  /** Sequence packing — the GPT-style pretraining layout: documents
    * concatenate in a deterministic hash order and the token stream is
    * cut every `budget` tokens into training sequences. Each document
    * gets the sequence id and in-sequence offset where it STARTS (a
    * document may straddle a cut — standard concat-then-cut packing).
    *
    * The global token cumsum is the scale question, and it routes
    * through [[graft.core.Ranking]]'s two-pass range-partitioned
    * prefix sum — parallel windows, broadcast offsets, never a
    * single-reducer ordering, so the packed axis may be the full
    * corpus. Hash order makes the layout reproducible with no seed
    * and independent of input partitioning. */
  def packSequences(docs: DataFrame, id: Column, text: Column,
                    budget: Long): DataFrame = {
    val counted = docs.select(id.as("doc_id"),
                              size(tokens(text)).as("n_tokens"))
      .withColumn("h", md5(col("doc_id").cast("string")))
    val ordered = graft.core.Ranking.withGlobalRankAndCumSum(
      counted, Seq(col("h"), col("doc_id")),
      col("n_tokens").cast("long"), "pos", "cum_tokens")
    ordered
      .withColumn("start_tok", col("cum_tokens") - col("n_tokens"))
      .withColumn("seq_id", floor(col("start_tok") / budget).cast("long"))
      .withColumn("offset", col("start_tok") - col("seq_id") * budget)
      .select("doc_id", "n_tokens", "pos", "seq_id", "offset")
  }

  /** Token-window chunking with stride (the RAG / context-window
    * preprocessing step): each document explodes into chunks of
    * `chunkTokens` tokens starting every `stride` tokens, with the
    * chunk text rematerialized. Scan-shaped: per-document arrays only,
    * fan-out ≈ n_tokens/stride rows per document, no shuffle at all. */
  def chunkDocuments(docs: DataFrame, id: Column, text: Column,
                     chunkTokens: Int, stride: Int): DataFrame = {
    require(stride > 0 && chunkTokens > 0, "positive chunk and stride")
    docs.select(id.as("doc_id"), tokens(text).as("toks"))
      .withColumn("n_tokens", size(col("toks")))
      .filter(col("n_tokens") > 0)
      .withColumn("start",
        explode(sequence(lit(0), col("n_tokens") - 1, lit(stride))))
      .withColumn("chunk_idx", (col("start") / stride).cast("int"))
      .withColumn("chunk",
        slice(col("toks"), col("start") + 1, lit(chunkTokens)))
      .select(col("doc_id"), col("chunk_idx"),
              size(col("chunk")).as("n_chunk_tokens"),
              array_join(col("chunk"), " ").as("chunk_text"))
  }

  /** Document fingerprint: whitespace-normalized lowercase text hashed
    * to a 64-char md5 plus a 60-bit integer prefix — the join key for
    * exact dedup and the hash source for sketching. */
  def fingerprint(docs: DataFrame, text: Column): DataFrame = {
    val norm = regexp_replace(lower(trim(text)), "\\s+", " ")
    docs
      .withColumn("fp_md5", md5(norm))
      .withColumn("fp_long",
        conv(substring(col("fp_md5"), 1, 15), 16, 10).cast("long"))
  }

  /** TF-IDF keyword extraction: the `k` highest-scoring tokens per
    * document, tfidf = tf · ln(N / df) — the standard summarization/
    * topic-tagging pre-pass over a corpus. One token explode feeds
    * both the term frequencies and (via a distinct) the document
    * frequencies; N and the df table broadcast, so the per-doc ranking
    * is the only shuffle and it is keyed by document — corpus-
    * parallel at any size. Deterministic: integer tf/df/N, one ln and
    * one multiply rounded to 6 decimals, ties broken on the token. */
  def tfidfKeywords(docs: DataFrame, id: Column, text: Column,
                    k: Int): DataFrame = {
    val toks = graft.core.CacheScope.persist(
      docs.select(id.as("doc_id"), explode(tokens(text)).as("tok"))
          .filter(length(col("tok")) > 0))
    val df = toks.select("doc_id", "tok").distinct()
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val n = toks.select("doc_id").distinct()
      .agg(count(lit(1)).as("n_docs"))
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val scored = tf.join(broadcast(df), "tok")
      .crossJoin(broadcast(n))
      .withColumn("tfidf", round(
        col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
    val w = Window.partitionBy("doc_id")
      .orderBy(desc("tfidf"), asc("tok"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("tok"), col("tfidf"),
              col("rk").as("rank"))
  }

  /** Per-document n-gram NOVELTY: the share of a document's distinct
    * 3-gram shingles that appear in no other document (corpus
    * document-frequency 1) — the "fraction of unique n-grams"
    * diversity signal of corpus curation (the Gopher/C4 analyses use
    * it to find boilerplate-heavy and template-generated text: low
    * novelty = the document is assembled from corpus-common spans).
    *
    * Plan shape: one distinct-shingle build (per-doc window),
    * one df aggregation keyed by shingle, one shuffle join back on
    * the same shingle key (co-partitioned with the aggregation
    * output — no second exchange on the big side), one per-doc
    * aggregation. The df table is |distinct shingles|-sized and is
    * NEVER broadcast or collected. Documents shorter than 3 tokens
    * have no shingles and are absent from the result (the shingle
    * convention; the oracle agrees by construction). */
  def ngramNovelty(docs: DataFrame, id: Column, text: Column)
      : DataFrame = {
    val sh = graft.core.CacheScope.persist(
      graft.dedup.Dedup.shingles(docs, id, text, 3))
    val df = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    sh.join(df, "shingle")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
           sum((col("df") === 1).cast("long")).as("n_unique"))
      .withColumn("novelty",
                  round(col("n_unique") / col("n_shingles"), 6))
  }

  /** Okapi BM25 text RETRIEVAL: top-k corpus documents per query —
    * the hard-negative-mining / sparse-RAG workhorse, distinct from
    * [[graft.similarity.Weighting.bm25]] which weights a user-item
    * matrix. Classic inverted-index shape: the corpus term-frequency
    * table joins query terms ON THE TERM KEY (only documents sharing
    * a query term are ever scored — the posting-list pruning that
    * makes BM25 serveable over a 100 TB corpus); the term-frequency
    * and doc-length tables shuffle on their natural keys (see the
    * design note below — they are corpus-sized and must NOT be
    * broadcast), only the one-row corpus stats broadcast; then one
    * (qid, doc) sum and one per-query top-k window.
    *
    * Query terms are DISTINCT (qtf = 1 — the common web-search
    * reading; declared, since repeated query terms otherwise multiply
    * their contribution). The idf is Lucene's NON-NEGATIVE form
    * ln(1 + (N − df + 0.5)/(df + 0.5)) — classic Robertson idf goes
    * NEGATIVE for terms in more than half the corpus, letting a
    * document that covers MORE query terms rank below a partial
    * match; the +1 keeps every matched term a non-negative signal.
    * Determinism discipline: idf and each per-term score round to 6
    * decimals, per-pair sums accumulate as exact decimals, the rank
    * orders on the decimal (ties → doc_id).
    *
    * The term-frequency and doc-length tables are corpus-sized and
    * deliberately NOT broadcast-hinted — both derive from the same
    * token explode and shuffle on their natural keys (tok, doc_id);
    * only the one-row corpus stats broadcast. At 10⁹ documents a
    * forced dlen broadcast would be the driver OOM, not a plan.
    *
    * Returns (qid, doc_id, score, rank ≤ k). */
  def searchBm25(docs: DataFrame, docId: Column, text: Column,
                 queries: DataFrame, queryId: Column, queryText: Column,
                 k: Int, k1: Double = 1.2, b: Double = 0.75)
      : DataFrame = {
    // ONE pass over the corpus token stream: tf aggregates it, and
    // dlen/df/stats all derive from tf (len = Σ_tok tf exactly — the
    // same integer as counting dtoks rows per doc), so the token
    // stream is scanned once instead of twice and the persisted frame
    // is the SMALLER tf table (its three consumers: df, dlen, and the
    // query-term join). Measured r14: the separate dlen pass plus the
    // dtoks cache materialization were ~2-3 s of every searchBm25
    // call at sf0.1; at corpus scale this is one fewer full pass over
    // the corpus-sized token stream (guide §1.2 "don't compute things
    // you throw away" / §2.3 aggregate early).
    val tf = graft.core.CacheScope.persist(
      docs.select(docId.as("doc_id"), explode(tokens(text)).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf")))
    val dlen = tf.groupBy("doc_id").agg(sum("tf").as("len"))
    val stats = dlen.agg(count(lit(1)).as("nd"), sum("len").as("ntok"))
      .select(col("nd"),
              (col("ntok").cast("double") / col("nd")).as("avg_len"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val qt = queries.select(queryId.as("qid"),
        explode(array_distinct(tokens(queryText))).as("tok"))
    val term = qt
      .join(tf, "tok")
      .join(df, "tok")
      .join(dlen, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        round(log(lit(1.0) +
                  (col("nd").cast("double") - col("df") + 0.5) /
                  (col("df") + 0.5)), 6))
      .withColumn("contrib", round(
        col("idf") * col("tf") * (k1 + 1) /
          (col("tf") + lit(k1) *
            (lit(1 - b) + lit(b) * col("len") / col("avg_len"))), 6)
        .cast("decimal(18,6)"))
    val scored = term.groupBy("qid", "doc_id")
      .agg(sum("contrib").as("score_dec"))
    val w = Window.partitionBy("qid")
      .orderBy(desc("score_dec"), asc("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("doc_id"),
              col("score_dec").cast("double").as("score"), col("rank"))
  }

  /** First-n-token prefix queries over a document frame — the shared
    * query-construction rule of the q185 gate and the soak's
    * bm25_search op (one definition, so the gate and the scale
    * measurement cannot silently diverge). */
  def prefixQueries(docs: DataFrame, id: Column, text: Column,
                    nTokens: Int): DataFrame =
    docs.select(id.as("qid"),
      concat_ws(" ", slice(tokens(text), 1, nTokens)).as("qtext"))

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009)
    * of N ranked retrieval lists: each list contributes
    * 1/(kRrf + rank) for the documents it ranked, the fused score is
    * the sum, and ties break on doc_id. RRF is the standard
    * sparse+dense hybrid-retrieval combiner (BM25 ∪ embedding ANN)
    * because it needs no score calibration — only ranks — so lists
    * from incommensurable scorers fuse without per-list normalization.
    *
    * Inputs are (qid, doc_id, rank) frames from any retrievers (e.g.
    * [[searchBm25]] and `Ann.bruteForceCosineTopK`/`ivfPqResidualTopK`
    * — the operator is agnostic to how each list was built, including
    * whether a list excludes the query's own document). Scale shape:
    * union of the per-query candidate lists (each already ≤ k·|Q|
    * rows — NOT corpus-sized) and one (qid, doc_id) sum-aggregate +
    * one per-query top-k window; nothing broadcasts. Determinism:
    * each reciprocal rounds to 6 decimals and accumulates as exact
    * decimal; `n_lists` reports how many lists ranked the document
    * (the fusion-coverage diagnostic).
    *
    * Returns (qid, doc_id, n_lists, score, rank ≤ topK). */
  def rrfFuse(rankings: Seq[DataFrame], topK: Int, kRrf: Int = 60)
      : DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking to fuse")
    require(kRrf >= 1, s"kRrf must be >= 1, got $kRrf")
    val normalized = rankings.map(_.select(
      col("qid"), col("doc_id"),
      round(lit(1.0) / (lit(kRrf) + col("rank")), 6)
        .cast("decimal(18,6)").as("w")))
    val scored = normalized.reduce(_ unionByName _)
      .groupBy("qid", "doc_id")
      .agg(count(lit(1)).cast("int").as("n_lists"),
           sum("w").as("score_dec"))
    val w = Window.partitionBy("qid")
      .orderBy(desc("score_dec"), asc("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("qid"), col("doc_id"), col("n_lists"),
              col("score_dec").cast("double").as("score"), col("rank"))
  }

  /** Hard-negative mining for retrieval training (the DPR recipe,
    * Karpukhin et al., EMNLP 2020: the strongest negatives are the
    * top-ranked retrieved documents that are NOT relevant): from a
    * candidate ranking (qid, doc_id, rank) — BM25 or ANN, the miner
    * is retriever-agnostic like [[rrfFuse]] — drop each query's
    * positives and keep the `nNeg` best-ranked survivors, re-ranked
    * densely so downstream samplers see 1..nNeg without gaps.
    *
    * Scale shape: one LEFT ANTI join co-partitioned on (qid, doc_id)
    * — both sides are per-query lists (≤ k·|Q| rows, never
    * corpus-sized) — then the per-query top-n window. Deterministic:
    * ties in the source rank cannot occur (ranks are row_numbers), so
    * the output is a pure function of its inputs.
    *
    * Returns (qid, doc_id, rank, neg_rank ≤ nNeg). */
  def mineHardNegatives(candidates: DataFrame, positives: DataFrame,
                        nNeg: Int): DataFrame = {
    require(nNeg >= 1, s"nNeg must be >= 1, got $nNeg")
    val neg = candidates.select("qid", "doc_id", "rank")
      .join(positives.select("qid", "doc_id"), Seq("qid", "doc_id"),
            "left_anti")
    val w = Window.partitionBy("qid")
      .orderBy(asc("rank"), asc("doc_id"))
    neg.withColumn("neg_rank", row_number().over(w))
      .filter(col("neg_rank") <= nNeg)
  }

  /** Hashed n-gram features of a document frame: unigrams and bigrams
    * (within-document adjacency — bigrams never cross a document
    * boundary) hashed into `nBuckets` buckets via the engine's md5
    * convention. The DSIR featurizer (Xie et al., NeurIPS 2023), but
    * exposed on its own: the hashed bag is also the engine-portable
    * input for any linear text model. One scan + one per-doc ordered
    * window (the `Dedup.shingles` shape); empty tokens from leading /
    * trailing whitespace are dropped on BOTH engines. */
  def hashedNgramFeatures(docs: DataFrame, id: Column, text: Column,
                          nBuckets: Int): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val toks = docs.select(
        id.as("doc_id"),
        posexplode(tokens(text)).as(Seq("pos", "tok")))
      .filter(length(col("tok")) > 0)
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val uni = toks.select(col("doc_id"), col("tok").as("ngram"))
    val bi = toks
      .withColumn("t1", lead("tok", 1).over(w))
      .filter(col("t1").isNotNull)
      .select(col("doc_id"),
              concat_ws(" ", col("tok"), col("t1")).as("ngram"))
    uni.union(bi)
      .withColumn("bucket",
        pmod(conv(substring(md5(col("ngram")), 1, 8), 16, 10)
               .cast("long"),
             lit(nBuckets.toLong)))
      .select("doc_id", "bucket")
  }

  /** DSIR data selection (Xie et al., NeurIPS 2023, "Data Selection
    * for Language Models via Importance Resampling"): choose the `k`
    * raw documents whose hashed-n-gram distribution best matches a
    * (typically small, curated) TARGET corpus, by sampling from the
    * importance-weight distribution rather than taking a hard top-k
    * of weights — the paper's correction for the selection bias a
    * plain argmax induces.
    *
    * Mechanics, each stage keyed and corpus-parallel:
    *  1. featurize both corpora with [[hashedNgramFeatures]]
    *     (unigram+bigram bag hashed into `nBuckets`);
    *  2. fit two add-α-smoothed bag-of-ngrams models over the bucket
    *     space and take per-bucket log ratios
    *     w_b = ln( p̂_target(b) / q̂_raw(b) ), rounded to 6 decimals
    *     (the transcendental-aggregate convention); the weight frame
    *     is ≤ `nBuckets` rows, joined back to the raw feature stream
    *     CO-PARTITIONED on bucket (it reuses the fit's own hash
    *     partitioning — no extra exchange on the corpus side);
    *  3. per-document log importance weight
    *     log ŵ_i = Σ_b f_ib · w_b as an exact decimal sum;
    *  4. Gumbel top-k (Vieira 2014): keep the k documents maximizing
    *     log ŵ_i + g_i with g_i = −ln(−ln(u_i)) — equivalent to
    *     sampling k docs WITHOUT replacement proportionally to ŵ_i.
    *     u_i is the engine's deterministic md5Uniform(seed, doc_id)
    *     draw, so the selection is partition-invariant and
    *     reproducible on any engine.
    *
    * Scale shape: two scans + per-doc windows (featurize), two
    * bucket-keyed aggregates + one ≤nBuckets-row weight frame (fit),
    * one doc-keyed aggregate (score), and a distributed TakeOrdered
    * for the final k — per-partition heads, then a k-row merge; the
    * only driver-sized object is the k-row result. Nothing assumes
    * the target is broadcastable, but DSIR's premise is a small
    * curated target, so its fit cost is negligible next to the raw
    * scan. Documents whose text yields no tokens have no features and
    * are never selected (declared; the oracle agrees by
    * construction).
    *
    * Returns (doc_id, n_feats, logw, rank ≤ k) ordered by the Gumbel
    * key (ties → doc_id); `logw` is the document's log importance
    * weight, the quantity the paper thresholds when diagnosing
    * domain match. */
  def dsirSelect(raw: DataFrame, rawId: Column, rawText: Column,
                 target: DataFrame, targetId: Column,
                 targetText: Column, k: Int, nBuckets: Int = 10000,
                 alpha: Double = 0.5, seed: Long = 7L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val rFeats = graft.core.CacheScope.persist(
      hashedNgramFeatures(raw, rawId, rawText, nBuckets))
    val tFeats = hashedNgramFeatures(target, targetId, targetText,
                                     nBuckets)
    val tCounts = tFeats.groupBy("bucket").agg(count(lit(1)).as("ct"))
    val tTot = tFeats.agg(count(lit(1)).as("nt"))
    val rCounts = rFeats.groupBy("bucket").agg(count(lit(1)).as("cr"))
    val rTot = rFeats.agg(count(lit(1)).as("nr"))
    // Only buckets the raw corpus realizes matter (weights apply per
    // raw occurrence); target-only buckets carry no raw mass. The
    // left join keeps raw buckets absent from the target at ct = 0,
    // where the α smoothing prices them.
    val aB = alpha * nBuckets
    val weights = rCounts.join(tCounts, Seq("bucket"), "left")
      .na.fill(0L, Seq("ct"))
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .withColumn("w",
        round(log(((col("ct") + alpha) / (col("nt") + aB)) /
                  ((col("cr") + alpha) / (col("nr") + aB))), 6)
          .cast("decimal(18,6)"))
      .select("bucket", "w")
    val scored = rFeats.join(weights, "bucket")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum(col("w")).as("logw_dec"))
    val gumbel = round(
        -log(-log(graft.stats.Stats.md5Uniform(
          lit(seed), col("doc_id")))), 6)
      .cast("decimal(18,6)")
    val keyed = scored
      .withColumn("key", col("logw_dec") + gumbel)
    // TakeOrdered picks the k winners distributed; the rank window
    // then runs over the k-row frame only (bounded by construction —
    // the same discipline as recommendGlobal's m-row head).
    val top = keyed.orderBy(desc("key"), asc("doc_id")).limit(k)
    top
      .withColumn("rank",
        row_number().over(Window.orderBy(desc("key"), asc("doc_id"))))
      .select(col("doc_id"), col("n_feats"),
              col("logw_dec").cast("double").as("logw"), col("rank"))
  }

  /** Train a binary quality classifier as full-batch logistic
    * regression over [[hashedNgramFeatures]] — the fastText-style
    * linear-text-model recipe behind classifier-gated corpora
    * (DCLM / FineWeb-Edu: score every document with a cheap linear
    * model over hashed n-grams, keep the top fraction). Full-batch
    * gradient descent, `epochs` plan-level iterations:
    *
    *   p_d = σ(b + Σ_b w_b · x_db),   w ← w − η/N · Σ_d (p_d − y_d)·x_d
    *
    * Scale shape per epoch: the dot products are one co-partitioned
    * LEFT join of the (doc, bucket, count) frame to the ≤`nBuckets`
    * weight frame plus a doc-keyed aggregate; the gradient is the
    * mirror join plus a bucket-keyed aggregate. The weight frame is
    * joined ON THE BUCKET KEY, not broadcast (the hash dimension is a
    * tuning knob — at web scale it is millions of buckets), and the
    * only driver traffic is ONE scalar per epoch (the bias gradient,
    * the connectedComponents convention). Per-epoch lineage is cut to
    * an RDD leaf (the [[graft.ann.Ann.mmrDiversify]] discipline).
    *
    * Determinism: weights live as exact DECIMAL(18,6); dot products
    * and gradients are exact decimal sums (counts × decimal weights);
    * the only transcendental, σ, is rounded to 6 decimals per doc and
    * the update step rounds η·g/N to 6 decimals — both engines round
    * the same IEEE double, the engine's cross-engine convention.
    *
    * Returns the model as (bucket, w) rows plus the bias as the
    * reserved bucket = −1 row; score with
    * [[scoreQualityClassifier]]. */
  def fitQualityClassifier(docs: DataFrame, id: Column, text: Column,
                           label: Column, nBuckets: Int = 2000,
                           epochs: Int = 2, lr: Double = 0.5)
      : DataFrame = {
    require(epochs >= 1 && epochs <= 50,
      s"epochs $epochs outside [1, 50]")
    require(lr > 0, s"learning rate must be positive, got $lr")
    val zeroDec = lit(java.math.BigDecimal.ZERO.setScale(6))
      .cast("decimal(18,6)")
    // a null label would NULL the residual and silently drop the row
    // from every gradient sum while n still counts it, deflating all
    // updates — fail loudly instead (the keepFirstExact discipline)
    val labelChecked = when(label.isNull,
      raise_error(lit("fitQualityClassifier: null label")))
      .otherwise(label)
    val lab = graft.core.CacheScope.persist(
      docs.select(id.as("doc_id"), labelChecked.cast("long").as("y")))
    val x = graft.core.CacheScope.persist(
      hashedNgramFeatures(docs, id, text, nBuckets)
        .groupBy("doc_id", "bucket").agg(count(lit(1)).as("x")))
    val n = lab.count()
    require(n > 0, "no labeled documents")
    var w = x.select(col("bucket"), zeroDec.as("w")).limit(0)
    var b = java.math.BigDecimal.ZERO.setScale(6)
    for (_ <- 1 to epochs) {
      val dots = x.join(w, Seq("bucket"), "left")
        .groupBy("doc_id")
        .agg(sum(col("x") * coalesce(col("w"), zeroDec)).as("dot"))
      val resid = graft.core.CacheScope.persist(
        lab.join(dots, Seq("doc_id"), "left")
          .withColumn("logit",
            coalesce(col("dot"), zeroDec) + lit(b))
          .withColumn("p",
            round(lit(1.0) /
                    (lit(1.0) + exp(-col("logit").cast("double"))), 6)
              .cast("decimal(18,6)"))
          .select(col("doc_id"), (col("p") - col("y")).as("r")))
      val gradW = x.join(resid, Seq("doc_id"))
        .groupBy("bucket").agg(sum(col("x") * col("r")).as("g"))
      // one scalar to the driver per epoch: the bias gradient
      val gradB = resid.agg(sum(col("r")).as("gb")).head.getDecimal(0)
      b = b.subtract(new java.math.BigDecimal(
        gradB.doubleValue() * lr / n)
        .setScale(6, java.math.RoundingMode.HALF_UP))
      val wNext = gradW.join(w, Seq("bucket"), "left")
        .select(col("bucket"),
          (coalesce(col("w"), zeroDec) -
           round(col("g").cast("double") * lr / n, 6)
             .cast("decimal(18,6)")).as("w"))
      // lineage cut: each epoch references w twice (dot + update)
      val snap = graft.core.CacheScope.current.persistRdd(
        wNext.rdd, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // materialize the (≤ nBuckets-row) snapshot, then RELEASE the
      // corpus-sized residual frame eagerly — the connectedComponents
      // storage discipline; without it `epochs` cached |docs|-row
      // frames pile up until scope release
      snap.count()
      resid.unpersist(false)
      w = wNext.sparkSession.createDataFrame(snap, wNext.schema)
    }
    // reserved rows: bucket = -1 carries the bias, bucket = -2 carries
    // the TRAINING nBuckets — scoring with a different bucket count
    // would hash features into the wrong bucket space (every weight
    // lookup silently missing), so the scorer validates it (ADVICE r12)
    w.unionByName(
      lab.limit(1).select(lit(-1L).as("bucket"),
                          lit(b).cast("decimal(18,6)").as("w")))
     .unionByName(
      lab.limit(1).select(lit(-2L).as("bucket"),
                          lit(nBuckets.toLong).cast("decimal(18,6)")
                            .as("w")))
  }

  /** Score documents under a [[fitQualityClassifier]] model: per doc,
    * the exact-decimal dot of its hashed-n-gram counts with the weight
    * frame (joined on the bucket key, never broadcast) plus the
    * bias (the model's bucket = −1 row), and σ(logit) rounded to 6.
    * Docs with no features score at σ(bias). */
  def scoreQualityClassifier(docs: DataFrame, id: Column, text: Column,
                             model: DataFrame, nBuckets: Int)
      : DataFrame = {
    val zeroDec = lit(java.math.BigDecimal.ZERO.setScale(6))
      .cast("decimal(18,6)")
    val wts = model.filter(col("bucket") >= 0)
    val biasRow = model.filter(col("bucket") === -1)
      .select(col("w").as("b"))
    // reserved-row validation, ONE job over the tiny (< 3-row) filter
    // of the small model frame: a model without the bias row would
    // cross-join every document against zero rows (total silent data
    // loss), and an nBuckets mismatch with training would hash every
    // feature into the wrong bucket space — the left join would simply
    // find no weights and mis-score every document (ADVICE r12)
    val reserved = model.filter(col("bucket") < 0)
      .select(col("bucket").cast("long"), col("w")).collect()
    require(reserved.count(_.getLong(0) == -1L) == 1,
      "model must carry exactly one bias row (bucket = -1) — was it " +
      "filtered out upstream?")
    val nbRows = reserved.filter(_.getLong(0) == -2L)
    // FORMAT BREAK (r13, deliberate): models persisted by the
    // pre-nBuckets fitQualityClassifier lack the -2 row and fail this
    // fail-fast — refitting is the only safe migration, because a
    // legacy model cannot prove its bucket space matches the caller's
    require(nbRows.length == 1,
      "model must carry exactly one nBuckets row (bucket = -2) — " +
      "models from the pre-r13 format lack it; refit with " +
      "fitQualityClassifier, which stores it")
    val trainedNb = nbRows(0).getDecimal(1).longValueExact()
    require(trainedNb == nBuckets.toLong,
      s"nBuckets $nBuckets does not match the model's training bucket " +
      s"count $trainedNb — scoring would hash features into the wrong " +
      "bucket space")
    val x = hashedNgramFeatures(docs, id, text, nBuckets)
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("x"))
    val dots = x.join(wts, Seq("bucket"), "left")
      .groupBy("doc_id")
      .agg(sum(col("x") * coalesce(col("w"), zeroDec)).as("dot"))
    docs.select(id.as("doc_id"))
      .join(dots, Seq("doc_id"), "left")
      .crossJoin(broadcast(biasRow))
      .withColumn("logit",
        (coalesce(col("dot"), zeroDec) + col("b")).cast("double"))
      .withColumn("p_hat",
        round(lit(1.0) / (lit(1.0) + exp(-col("logit"))), 6))
      .select("doc_id", "logit", "p_hat")
  }

  /** C4-style line-level corpus cleaning (Raffel et al., JMLR 2020
    * §2.2): the line rules keep only lines that (a) end in a terminal
    * punctuation mark (`.` `!` `?` `"`), (b) carry at least
    * `minWordsPerLine` whitespace words, and (c) do not mention
    * "javascript" (case-insensitive — the classic scraped-page
    * artifact); the page rules then drop any document whose CLEANED
    * line count falls below `minLinesPerDoc`, any document containing
    * "lorem ipsum" (case-insensitive), and any document containing a
    * curly brace (code masquerading as prose). Survivors come back
    * reassembled from their kept lines in original order, with
    * kept/dropped line counts for auditability.
    *
    * Scale shape: the line rules run INSIDE a higher-order
    * `filter` over the split array — per-row array work, zero
    * explode, zero shuffle, fully codegen'd; the page rules are plain
    * predicates on the same row. Scan speed at any corpus size. */
  def cleanLinesC4(docs: DataFrame, id: Column, text: Column,
                   minWordsPerLine: Int = 5,
                   minLinesPerDoc: Int = 3): DataFrame = {
    require(minWordsPerLine > 0, "minWordsPerLine must be positive")
    require(minLinesPerDoc > 0, "minLinesPerDoc must be positive")
    val keepLine = (l: Column) => {
      val t = trim(l)
      (t =!= "") &&
      substring(rtrim(l), -1, 1).isin(".", "!", "?", "\"") &&
      (size(split(t, "\\s+")) >= minWordsPerLine) &&
      !lower(l).contains("javascript")
    }
    // split on \r?\n: a CRLF corpus would otherwise leave a trailing
    // \r on every line (trim/rtrim strip spaces only), failing the
    // terminal-punctuation check everywhere and silently dropping the
    // whole document at the page rule
    docs
      .select(id.as("doc_id"), text.as("_raw"))
      .withColumn("_kept",
        filter(split(col("_raw"), "\\r?\\n"), keepLine))
      .withColumn("_nonempty",
        size(filter(split(col("_raw"), "\\r?\\n"), l => trim(l) =!= "")))
      .filter(size(col("_kept")) >= minLinesPerDoc &&
              !lower(col("_raw")).contains("lorem ipsum") &&
              !col("_raw").contains("{"))
      .select(col("doc_id"),
              array_join(col("_kept"), "\n").as("text"),
              size(col("_kept")).cast("long").as("n_lines_kept"),
              (col("_nonempty") - size(col("_kept"))).cast("long")
                .as("n_lines_dropped"))
  }

  /** Cross-corpus Kneser–Ney perplexity filter — the CCNet recipe
    * (Wenzek et al., LREC 2020): train a KN-smoothed LM on a CURATED
    * reference corpus, score every candidate document's perplexity
    * under it, and keep/bucket by that score. [[kneserNeyBigram]]
    * scores a corpus against its own counts (every bigram observed);
    * this operator scores UNSEEN text, so it carries the full backoff
    * chain:
    *
    *   seen history h:  p(w|h) = max(c(h,w) − d, 0)/c(h)
    *                           + d · N1+(h·)/c(h) · p_cont(w)
    *   unseen history:  p(w|h) = p_cont(w)
    *   p_cont(w) = N1+(·w)/B for in-vocabulary w; OOV continuations
    *   take the <unk> convention of one pseudo-type, p_cont = 1/B
    *   (KenLM routes OOV tokens to <unk> the same way).
    *
    * Returns per target document: n_bigrams, n_oov (bigrams whose
    * (h,w) pair the reference never saw), the exact-decimal sum of
    * log2 p, and `ppl_log2` = −avg log2 p — log2 of the perplexity
    * CCNet thresholds into head/middle/tail buckets (kept in log
    * space, the [[perplexityBuckets]] convention: 2^x would reopen
    * the cross-libm pow drift the round-6 decimal discipline
    * closes).
    *
    * Scale shape: the reference counts are the [[kneserNeyBigram]]
    * towers (one bigram-type shuffle); the target side explodes once
    * and LEFT-joins the three count frames ON THEIR NATURAL KEYS —
    * none broadcast, since a web-scale vocabulary makes every tower
    * corpus-sized. Only the scalar type total broadcasts. Per-term
    * round-6 log2, exact-decimal accumulation (the engine's
    * cross-engine convention). */
  def knPerplexityFilter(ref: DataFrame, refId: Column, refText: Column,
                         target: DataFrame, tgtId: Column,
                         tgtText: Column, d: Double = 0.75): DataFrame = {
    require(d > 0 && d < 1, s"discount d must be in (0,1), got $d")
    val c12 = graft.core.CacheScope.persist(
      bigramPairs(ref, refId, refText)
        .groupBy("w1", "w2").agg(count(lit(1)).as("c12")))
    val hist = c12.groupBy("w1")
      .agg(sum("c12").as("c1"), count(lit(1)).as("n1l"))
    val cont = c12.groupBy("w2").agg(count(lit(1)).as("n1r"))
    val totals = c12.agg(count(lit(1)).as("b_types"))
    // p_cont with the <unk> pseudo-type for OOV continuations
    val pCont = coalesce(col("n1r"), lit(1L)) / col("b_types")
    val p = when(col("c1").isNotNull,
        (greatest(coalesce(col("c12"), lit(0L)) - lit(d), lit(0.0)) +
          lit(d) * col("n1l") * pCont) / col("c1"))
      .otherwise(pCont)
    bigramPairs(target, tgtId, tgtText)
      .join(c12, Seq("w1", "w2"), "left")
      .join(hist, Seq("w1"), "left")
      .join(cont, Seq("w2"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("logp", round(log2(p), 6).cast("decimal(18,6)"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
           sum(col("c12").isNull.cast("long")).as("n_oov"),
           sum(col("logp")).cast("double").as("sum_logp"),
           round(-(sum(col("logp")).cast("double") / count(lit(1))), 6)
             .as("ppl_log2"))
  }
}
