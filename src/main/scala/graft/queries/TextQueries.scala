package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.TextOps
import graft.util.Output.tinySort
import graft.util.Tables.load

/** Text-analysis operator surface over `documents`: quality scoring, token
  * counting, language-ID — wrappers around [[graft.ext.TextOps]].
  */
object TextQueries {

  private val Stopwords = Seq("the", "a", "or", "and", "of")

  def q27TextQuality(spark: SparkSession, dir: String): DataFrame =
    // one fused kernel pass ([[graft.functions.TextStats]] — bit-identical
    // to the TextOps expression forms, so the oracle is untouched);
    // two-step select keeps one kernel call per row (CollapseProject
    // refuses to inline non-cheap expressions)
    load(spark, dir, "documents")
      .select(col("doc_id"),
        graft.functions.TextStats.textStats(col("text"), Stopwords).as("_t"))
      .select(
        col("doc_id"),
        col("_t.n_tokens").cast("long").as("n_tokens"),
        round(col("_t.avg_tok_len"), 4).as("avg_tok_len"),
        round(col("_t.nonalpha_ratio"), 4).as("nonalpha_ratio"),
        round(col("_t.stopword_ratio"), 4).as("stopword_ratio"),
        // unrounded: both engines compute bit-identical doubles here, while
        // round(·,4) diverges when the true value sits on a .00005 boundary
        col("_t.quality").as("quality")
      ).orderBy(col("doc_id"))

  def q28TokenCount(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents").select(
      col("doc_id"),
      size(TextOps.tokens(col("text"))).cast("long").as("ws_tokens"),
      TextOps.reTokenCount(col("text")).cast("long").as("re_tokens"),
      round(length(col("text")).cast("double") /
        greatest(TextOps.reTokenCount(col("text")), lit(1)).cast("double"), 4)
        .as("chars_per_token")
    ).orderBy(col("doc_id"))

  def q29LangId(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "documents")
      .select(col("doc_id"),
        graft.functions.TextStats.textStats(col("text"), Stopwords).as("_t"))
      .select(
        col("doc_id"),
        round(col("_t.s_en"), 4).as("s_en"),
        round(col("_t.s_es"), 4).as("s_es"),
        round(col("_t.s_de"), 4).as("s_de"),
        col("_t.lang_pred").as("lang_pred")
      ).orderBy(col("doc_id"))

  /** q57 — TF-IDF top-3 terms per document ([[graft.ext.Corpus.tfidfTopK]]):
    * corpus-statistics scoring with the scale-correct join shape (document
    * frequency is vocabulary-sized → broadcast; corpus size is one row →
    * broadcast). The output is O(docs·k) with a window + joins upstream, so
    * the dump checkpoints the narrow result rows before the global sort
    * (the q54 pattern — the range partitioner's sampling pass must not
    * re-run the explode/agg/window stack). */
  def q57TfidfTopK(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Corpus.tfidfTopK(load(spark, dir, "documents"), "doc_id", "text", k = 3)
      .localCheckpoint()
      .orderBy(col("doc_id"), col("rk"))

  /** q163 — Okapi BM25 top-k terms per document
    * ([[graft.ext.Corpus.bm25TopK]], k₁ = 1.2, b = 0.75, k = 3): the
    * saturating, length-normalized counterpart of q57's TF-IDF — the
    * weighting retrieval-based curation actually ranks with. Same dump
    * plan as q57: checkpoint the top-k rows, then the cheap global sort. */
  def q163Bm25TopK(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Corpus.bm25TopK(load(spark, dir, "documents"), "doc_id", "text", k = 3)
      .localCheckpoint()
      .orderBy(col("doc_id"), col("rk"))

  /** q164 — CCNet-style LM-quality terciles
    * ([[graft.ext.Corpus.perplexityBuckets]], Wenzek et al. LREC '20):
    * head/middle/tail cut of the held-out half by stupid-backoff score
    * (train = even ids, the q147 split), rolled up per (bucket, source).
    * Output bounded by 3·|sources| → [[tinySort]]. */
  def q164PerplexityBuckets(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents")
    graft.ext.Corpus.perplexityBuckets(docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", "source")
      .transform(tinySort(_, col("bucket"), col("source")))
  }

  /** q170 — tokenizer character-coverage / OOV audit
    * ([[graft.ext.Unigram.charCoverageAudit]]): the SentencePiece
    * `--character_coverage` decision table — train the unigram vocab on
    * the ENGLISH slice only (the mono-lingual-vocab-for-a-multilingual-
    * corpus question), then audit every language's code-point inventory
    * and occurrence mass against the vocab's single-char tier. On this
    * corpus every language shares the a–y alphabet, so coverage is
    * 10000 bp across the board — that IS the measurement; the sub-10000
    * branch (uncovered chars, min code point) is proven on a planted
    * corpus in UnigramSpec. */
  def q170CharCoverage(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents")
    val (vocabRows, _) = graft.ext.Unigram.learnVocab(
      docs.filter(col("lang") === "en"), "text",
      maxTypes = 50, maxPieceLen = 4, seedMulti = 120, emRounds = 2,
      wordLenCap = 16)
    graft.ext.Unigram.charCoverageAudit(docs, "lang", "text", vocabRows)
      .transform(tinySort(_, col("lang")))
  }

  /** q62 — corpus composition statistics ([[graft.ext.Corpus.sourceStats]]):
    * per (source, 100-char length bucket) — doc count, token volume, char
    * range, distinct langs. One map-side-combinable aggregation; output
    * bounded by |sources|·|buckets| → [[tinySort]]. */
  def q62CorpusStats(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Corpus.sourceStats(load(spark, dir, "documents"),
        "source", "text", "n_chars", "lang", bucketWidth = 100)
      .transform(tinySort(_, col("source"), col("char_bucket")))

  /** q59 — inverted index ([[graft.ext.Corpus.invertedIndex]]): per term, df
    * + first-10 postings. Vocabulary-sized output → [[tinySort]]. */
  def q59InvertedIndex(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Corpus.invertedIndex(load(spark, dir, "documents"),
        "doc_id", "text", sampleK = 10)
      .transform(tinySort(_, col("term")))

  /** q66 — per-source heavy hitters ([[graft.ext.Corpus.heavyHitters]]):
    * top-5 tokens by exact count, token tie-break. Output is
    * |sources|·k rows → [[tinySort]]. */
  def q66HeavyHitters(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Corpus.heavyHitters(load(spark, dir, "documents"),
        "source", "text", k = 5)
      .transform(tinySort(_, col("source"), col("rk")))

  /** q151 — vocabulary-growth (Heaps'-law) audit
    * ([[graft.ext.Corpus.vocabGrowth]], 10 prefix buckets): cumulative
    * token/type counts per corpus prefix — the V(N) ≈ K·N^β curve a
    * vocab-size decision or dedup health check reads, in exact integers.
    * Two map-side-combined aggregations (bucket totals, per-type first
    * bucket); the cumulative pass runs on 10 rows. */
  def q151VocabGrowth(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Corpus.vocabGrowth(load(spark, dir, "documents"),
        "doc_id", "text", buckets = 10)
      .transform(tinySort(_, col("bucket")))

  /** q153 — Gopher document-quality rules
    * ([[graft.ext.TextOps.gopherRules]]): the six §A1.1 heuristic screens
    * as integer cross-multiplications, per-document flags plus exact-bp
    * ratio columns. Map-only — no shuffle at any scale; the plain orderBy
    * is the cheap-map-only-dump convention (NOTES). */
  def q153GopherRules(spark: SparkSession, dir: String): DataFrame =
    graft.ext.TextOps.gopherRules(load(spark, dir, "documents"),
        "doc_id", "text")
      .orderBy(col("doc_id"))

  /** q154 — DSIR importance weights ([[graft.ext.Corpus.dsirWeights]],
    * 512 hash buckets): every non-English document ranked by how
    * English-target-like its hashed-unigram distribution is — the
    * data-selection importance weight of Xie et al. NeurIPS '23, with
    * English docs as the target corpus. Bounded bucket models broadcast;
    * the oracle replays hash, Laplace models and the position-ordered
    * ratio product bit-for-bit. */
  def q154DsirWeights(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Corpus.dsirWeights(load(spark, dir, "documents"),
        "doc_id", "text", isTarget = col("lang") === "en", buckets = 512)
      .orderBy(col("doc_id"))

  /** q155 — domain-level quality rollup
    * ([[graft.ext.TextOps.domainQuality]]): the Gopher screens aggregated
    * to the source domain — per-rule failure rates, overall pass rate and
    * the wholesale majority-keep decision, in exact basis points. Map-only
    * rules + ONE bounded domain-key aggregation. */
  def q155DomainQuality(spark: SparkSession, dir: String): DataFrame =
    graft.ext.TextOps.domainQuality(load(spark, dir, "documents"),
        "source", "doc_id", "text")
      .transform(tinySort(_, col("source")))

  /** q157 — BPE compression curve: corpus token count as a function of
    * MERGE COUNT (encode with the first m learned merges, m = 0,2,4,6,8) —
    * the vocabulary-size trade-off curve (Gage '94 / Sennrich '16: every
    * additional merge trades vocabulary slots for sequence length; this
    * curve is the data a vocab-size decision reads, next to q151's Heaps
    * curve and q128's fixed-vocab fertility). m = 0 is the symbol-stream
    * baseline, so `saved_bp` starts at 0 and grows monotonically (each
    * merge can only shorten streams — the BpeSpec law). Each level is one
    * map-only fused-kernel pass ([[graft.ext.Bpe.encodeTokens]], zero
    * shuffles) feeding a single-row aggregation; the baseline row joins
    * the others by broadcast. */
  def q157BpeCurve(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents")
    val merges = graft.ext.Bpe.learnMerges(docs, "text", rounds = 8,
        maxTypes = 50)
      .orderBy(col("round")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val levels = Seq(0, 2, 4, 6, 8).map { m =>
      docs.select(graft.ext.Bpe.encodeTokens(col("text"), merges.take(m)).as("_toks"))
        .agg(sum(size(col("_toks")).cast("long")).as("n_tokens"))
        .select(lit(m.toLong).as("n_merges"), col("n_tokens"))
    }.reduce(_ unionByName _)
      .cache() // 5 rows; two consumers (levels + baseline) — without the
               // cache each would re-run all five corpus encode passes
    val base = levels.filter(col("n_merges") === 0)
      .select(col("n_tokens").as("_base"))
    levels.join(broadcast(base))
      .withColumn("saved_bp", expr(
        "(_base - n_tokens) * 10000 div greatest(_base, 1)").cast("bigint"))
      .withColumn("symbols_per_token_x100", expr(
        "_base * 100 div greatest(n_tokens, 1)").cast("bigint"))
      .drop("_base")
      .transform(tinySort(_, col("n_merges")))
  }

  /** q78 — token vocabulary with cumulative coverage
    * ([[graft.ext.Corpus.tokenVocab]], top-100): corpus-wide frequency
    * ranking plus the fraction of all token occurrences each vocabulary
    * prefix covers — tokenizer-training's first step. */
  def q78TokenVocab(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Corpus.tokenVocab(load(spark, dir, "documents"), "text",
        topK = 100)
      .transform(tinySort(_, col("rank")))

  /** q81 — unigram-LM quality scoring ([[graft.ext.Corpus.unigramLmScore]],
    * top-25 vocabulary, 0.5 OOV pseudo-count): mean/min token probability
    * per document with probabilities summed in document order — the
    * CCNet-style LM-filter dataflow with exactly reproducible doubles. */
  def q81UnigramLm(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Corpus.unigramLmScore(load(spark, dir, "documents"),
        "doc_id", "text", topK = 25)
      .orderBy(col("doc_id"))

  /** q119 — BPE vocabulary learning ([[graft.ext.Bpe.learnMerges]],
    * Sennrich ACL '16): 8 merge rounds over the top-50 word types of the
    * corpus — the subword-tokenizer training primitive. One corpus-scale
    * word-count shuffle; merge learning runs on the collected
    * maxTypes-bounded type table (the industrial trainer split — see the
    * operator scaladoc for the measured 7× over DataFrame rounds).
    * Output: the learned merge table with selection-time pair counts. */
  def q119BpeVocab(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Bpe.learnMerges(load(spark, dir, "documents"), "text",
        rounds = 8, maxTypes = 50)
      .transform(tinySort(_, col("round")))

  /** q124 — BPE corpus encoding ([[graft.ext.Bpe.encodeTokens]] applying
    * [[graft.ext.Bpe.learnMerges]]'s table): learn the q119 vocabulary (8
    * rounds, top-50 types), then tokenize EVERY document with it — the
    * learn→apply pair that completes the tokenizer story (train the
    * vocabulary once, encode the corpus with it). The encode is one
    * map-side fused-kernel call per document (zero shuffles; the merge
    * table is a bounded codegen constant, the same data-derived-literal
    * tier as the IVF centroids). Output per doc: pre-merge symbol count
    * (code points + one sentinel per word — n_symbols − n_tokens = merges
    * applied), token count, and an md5 fingerprint of the exact token
    * stream (chr(1)-joined — a delimiter no token can contain), which
    * pins the full tokenization, not just its length. */
  def q124BpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents")
    val merges = graft.ext.Bpe.learnMerges(docs, "text", rounds = 8,
        maxTypes = 50)
      .orderBy(col("round")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    docs
      .select(col("doc_id"), col("text"),
        graft.ext.Bpe.encodeTokens(col("text"), merges).as("_toks"))
      .select(col("doc_id"),
        (length(regexp_replace(col("text"), " ", "")) +
          size(filter(split(col("text"), " "), w => w =!= "")))
          .cast("long").as("n_symbols"),
        size(col("_toks")).cast("long").as("n_tokens"),
        md5(array_join(col("_toks"), "\u0001").cast("binary")).as("token_fp"))
      .transform(tinySort(_, col("doc_id")))
  }

  /** q128 — tokenizer fertility by language (Ács '19 / the standard
    * multilingual tokenizer-eval table): encode the corpus with the
    * learned BPE table (the q124 kernel) and aggregate per language —
    * docs, words, tokens, FERTILITY (tokens per word, the metric that
    * exposes vocabulary bias against under-represented languages) and
    * COMPRESSION (pre-merge symbols per token). Ratios ship as exact
    * integer basis points (10000·Σa div Σb — corpus-level ratio, not
    * mean-of-per-doc). One map-side encode pass + one language-keyed
    * aggregation; same bounded learn collect as q119/q124. */
  def q128TokenizerFertility(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents")
    val merges = graft.ext.Bpe.learnMerges(docs, "text", rounds = 8,
        maxTypes = 50)
      .orderBy(col("round")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    docs
      .select(col("lang"),
        size(filter(split(col("text"), " "), w => w =!= ""))
          .cast("long").as("_nw"),
        length(regexp_replace(col("text"), " ", "")).cast("long").as("_nc"),
        size(graft.ext.Bpe.encodeTokens(col("text"), merges))
          .cast("long").as("_nt"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_nw")).as("n_words"),
        sum(col("_nt")).as("n_tokens"),
        sum(col("_nc") + col("_nw")).as("n_symbols"))
      .withColumn("fertility_bp", expr("(10000 * n_tokens) div n_words"))
      .withColumn("compression_bp", expr("(10000 * n_symbols) div n_tokens"))
      .transform(tinySort(_, col("lang")))
  }

  /** q159 — unigram-LM tokenizer vocabulary ([[graft.ext.Unigram]], Kudo
    * ACL '18, the SentencePiece default): hard-EM over the bounded type
    * table — char inventory + top-120 substring seeds, two Viterbi-EM
    * rounds (fixed-order IEEE score chains, zero transcendentals), unused
    * multi-char pieces pruned, characters floored at count 1. The
    * industrial tokenizer next to the BPE family (q119/q124/q157). */
  def q159UnigramVocab(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Unigram.learn(load(spark, dir, "documents"), "text")
      .transform(tinySort(_, col("piece")))

  /** q160 — unigram-LM fertility by language (the q128 eval table for the
    * Kudo tokenizer): encode the corpus with the learned unigram
    * vocabulary — one map-side kernel pass
    * ([[graft.functions.UnigramEncode]], per-task type memo) — and
    * aggregate docs/words/chars/tokens per language with exact
    * integer-basis-point fertility and compression. */
  def q160UnigramFertility(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents")
    val (vocabRows, _) = graft.ext.Unigram.learnVocab(docs, "text",
      maxTypes = 50, maxPieceLen = 4, seedMulti = 120, emRounds = 2,
      wordLenCap = 16)
    val vocab = vocabRows.map(p => (p.piece, p.prob))
    docs
      .select(col("lang"),
        size(filter(split(col("text"), " "), w => w =!= ""))
          .cast("long").as("_nw"),
        length(regexp_replace(col("text"), " ", "")).cast("long").as("_nc"),
        size(graft.functions.UnigramEncode.unigramEncode(col("text"), vocab))
          .cast("long").as("_nt"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_nw")).as("n_words"),
        sum(col("_nc")).as("n_chars"), sum(col("_nt")).as("n_tokens"))
      .withColumn("fertility_bp", expr("(10000 * n_tokens) div n_words"))
      .withColumn("compression_bp", expr("(10000 * n_chars) div n_tokens"))
      .transform(tinySort(_, col("lang")))
  }

  /** q162 — tokenizer head-to-head (the table a vocab decision actually
    * reads: Sennrich BPE q128 vs Kudo unigram q160 on the SAME corpus,
    * same budget discipline, per language): token counts, fertilities and
    * the direct uni-vs-BPE token ratio in exact basis points. Asymmetry
    * noted rather than hidden: BPE streams carry the end-of-word sentinel
    * among their symbols (its learned merges can absorb it), the unigram
    * tokenizer has no sentinel — the ratio compares the tokenizers AS
    * DEPLOYED, not a sentinel-normalized abstraction. Both learns are
    * bounded collects; both encodes are one map-side kernel pass each. */
  def q162TokenizerCompare(spark: SparkSession, dir: String): DataFrame = {
    val bpe = q128TokenizerFertility(spark, dir)
      .select(col("lang"), col("n_words"),
        col("n_tokens").as("bpe_tokens"),
        col("fertility_bp").as("bpe_fertility_bp"))
    val uni = q160UnigramFertility(spark, dir)
      .select(col("lang"), col("n_tokens").as("uni_tokens"),
        col("fertility_bp").as("uni_fertility_bp"))
    bpe.join(uni, Seq("lang"))
      .withColumn("uni_vs_bpe_bp", expr("(10000 * uni_tokens) div bpe_tokens"))
      .transform(tinySort(_, col("lang")))
  }

  /** q131 — bigram-LM scoring ([[graft.ext.Corpus.bigramLmScore]]): the
    * stronger perplexity-filter above q81's unigram — per document, mean
    * and min Laplace-smoothed P(w2|w1) with corpus-trained counts. The
    * bigram stats stay a DISTRIBUTED type table (too big for a literal
    * map at any real scale — the scale divide between this and q81's
    * broadcast vocabulary); exact integer counts + one IEEE division per
    * bigram + position-ordered folds, so the oracle replays bit-for-bit. */
  def q131BigramLm(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Corpus.bigramLmScore(load(spark, dir, "documents"),
        "doc_id", "text")
      .orderBy(col("doc_id"))

  /** q147 — trigram stupid-backoff held-out scoring
    * ([[graft.ext.Corpus.stupidBackoffScore]], Brants et al. EMNLP '07):
    * the top of the LM-filter ladder (q81 unigram, q131 bigram) — train
    * counts on the even-id half (the q90 parity split), score the odd-id
    * half, so backoff genuinely engages; per doc the backoff-level census
    * (n_tri/n_bi/n_uni/n_oov) plus min/mean score in fixed IEEE order. */
  def q147StupidBackoff(spark: SparkSession, dir: String): DataFrame = {
    val docs = load(spark, dir, "documents")
    graft.ext.Corpus.stupidBackoffScore(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  /** q149 — batch-padding efficiency audit ([[graft.ext.Batching]]): the
    * training-throughput payoff measurement for the token-count family —
    * default hash batching vs length-bucketed batching over documents
    * (truncate 128, batch 8, bucket width 16), padding waste in exact
    * basis points of processed tokens. Window-free by design: both batch
    * assignments are pure hash expressions a 100 TB writer partitions by. */
  def q149PaddingAudit(spark: SparkSession, dir: String): DataFrame =
    graft.ext.Batching.paddingAudit(load(spark, dir, "documents"),
        "doc_id", "text", maxSeqLen = 128, batchSize = 8, bucketWidth = 16)
      .transform(tinySort(_, col("policy")))

  /** q179 — code-switching / language-mixture audit
    * ([[graft.ext.TextOps.codeSwitchAudit]], 20-word blocks): per-block
    * integer-marker language ID with the fixed priority tie-break, per doc
    * the dominant block language + share in bp and the distinct
    * non-unknown block-language count (≥ 2 = mixed, the CCNet per-line
    * granularity). */
  def q179CodeSwitching(spark: SparkSession, dir: String): DataFrame =
    TextOps.codeSwitchAudit(load(spark, dir, "documents"), "doc_id", "text",
        blockWords = 20)
      .transform(tinySort(_, col("doc_id")))

  /** q192 — fastText-style hashed linear quality classifier
    * ([[graft.ext.TextOps.hashedClassifierReport]], Joulin et al. '17):
    * word unigram+bigram features hashed into 65,536 buckets, fixed
    * integer bucket weights (the deterministic-fake model convention —
    * the scoring path is real, the weights are a stand-in for a trained
    * table), per-source margin calibration rollup. Pure map-side fold
    * over the token array — zero per-token explode — plus one bounded
    * per-source aggregate. */
  def q192HashedClassifier(spark: SparkSession, dir: String): DataFrame =
    TextOps.hashedClassifierReport(load(spark, dir, "documents"),
        "source", "text")
      .transform(tinySort(_, col("source")))

  /** q193 — classifier threshold yield curve
    * ([[graft.ext.TextOps.classifierYieldCurve]], 256-wide margin bins):
    * the FineWeb-Edu calibration sweep — per bin the doc/token mass, per
    * threshold (bin lower edge) the surviving mass at margin ≥ t. Floor
    * binning (exact for negative margins — the q183 lesson); cumulative
    * sums on the constant-key BOUNDED bin window. */
  def q193ClassifierYield(spark: SparkSession, dir: String): DataFrame =
    TextOps.classifierYieldCurve(load(spark, dir, "documents"), "text",
        binWidth = 256L)
      .transform(tinySort(_, col("threshold")))

  /** q194 — per-source quality cap ([[graft.ext.TextOps.domainQualityCap]],
    * top 50 by margin per source, ids break ties): the RefinedWeb-style
    * domain cap with its per-source audit (total vs kept mass and the
    * realized cutoff margin). The rank filter rides Spark's
    * WindowGroupLimit pushdown — local top-k before the exchange
    * (PlanShapeSpec pin). */
  def q194DomainCap(spark: SparkSession, dir: String): DataFrame =
    TextOps.domainQualityCap(load(spark, dir, "documents"), "source",
        "doc_id", "text", k = 50)
      .transform(tinySort(_, col("source")))

  /** q206 — exact-integer ROC/AUC eval of the hashed classifier
    * ([[TextOps.hashedMargin]] scores vs the embeddings table's labels,
    * positive = label >= 5): one row per distinct margin threshold with
    * cumulative TPR/FPR/precision in basis points, plus a summary row
    * carrying the exact AUC — the Mann–Whitney U statistic
    * 2U = Σ_t p_t · (2·neg_below(t) + n_t) over the threshold table, so
    * ties contribute the standard half credit WITHOUT any 0.5 float:
    * everything is integer, DECIMAL(38,0) where products reach P·N
    * (≡ DuckDB HUGEINT — a 100 TB corpus overflows int64 there).
    *
    * Scale shape: one corpus join + one groupBy collapse the corpus to
    * the DISTINCT-MARGIN table (bounded by score resolution × max doc
    * length, corpus-size-independent); the cumulative windows run over
    * that bounded frame under the constant-key idiom (q139's shape). */
  def q206ClassifierAuc(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = load(spark, dir, "documents")
      .select(col("doc_id"), TextOps.hashedMargin(col("text")).as("thr"))
    val lab = load(spark, dir, "embeddings")
      .select(col("vec_id").as("doc_id"),
        (col("label") >= 5).cast("long").as("pos"))
    val g = m.join(lab, Seq("doc_id"))
      .groupBy(col("thr"))
      .agg(sum(col("pos")).as("p"),
        (count(lit(1)) - sum(col("pos"))).as("n"))
    val wkey = substring(col("thr").cast("string"), 0, 0)
    val ord = Window.partitionBy(wkey).orderBy(col("thr").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(wkey)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val c = g
      .withColumn("cp", sum(col("p")).over(ord))
      .withColumn("cn", sum(col("n")).over(ord))
      .withColumn("tp", sum(col("p")).over(whole))
      .withColumn("tn", sum(col("n")).over(whole))
      .localCheckpoint(true) // bounded threshold table, read twice
    val pts = c.select(col("thr"),
      (col("p") + col("n")).as("n_docs"),
      when(col("tp") > 0, expr("cp * 10000L div tp")).as("tpr_bp"),
      when(col("tn") > 0, expr("cn * 10000L div tn")).as("fpr_bp"),
      expr("cp * 10000L div (cp + cn)").as("prec_bp"),
      lit(null).cast("long").as("auc_bp"))
    val tot = c.agg(
        sum(expr("CAST(p AS DECIMAL(38,0)) * (2 * (tn - cn) + n)")).as("u2"),
        max(col("tp")).as("tp"), max(col("tn")).as("tn"))
      .select(lit(null).cast("long").as("thr"),
        (col("tp") + col("tn")).as("n_docs"),
        lit(null).cast("long").as("tpr_bp"),
        lit(null).cast("long").as("fpr_bp"),
        lit(null).cast("long").as("prec_bp"),
        when(col("tp") > 0 && col("tn") > 0, expr(
          "CAST(u2 * 10000 AS DECIMAL(38,0)) div " +
            "(2 * CAST(tp AS DECIMAL(38,0)) * tn)"))
          .cast("long").as("auc_bp"))
    pts.unionByName(tot).transform(tinySort(_, col("thr")))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q206_classifier_auc" -> (q206ClassifierAuc _),
    "q193_classifier_yield" -> (q193ClassifierYield _),
    "q194_domain_cap" -> (q194DomainCap _),
    "q192_hashed_classifier" -> (q192HashedClassifier _),
    "q179_code_switching" -> (q179CodeSwitching _),
    "q159_unigram_vocab" -> (q159UnigramVocab _),
    "q160_unigram_fertility" -> (q160UnigramFertility _),
    "q162_tokenizer_compare" -> (q162TokenizerCompare _),
    "q149_padding_audit" -> (q149PaddingAudit _),
    "q147_stupid_backoff" -> (q147StupidBackoff _),
    "q151_vocab_growth" -> (q151VocabGrowth _),
    "q153_gopher_rules" -> (q153GopherRules _),
    "q154_dsir_weights" -> (q154DsirWeights _),
    "q155_domain_quality" -> (q155DomainQuality _),
    "q157_bpe_curve" -> (q157BpeCurve _),
    "q119_bpe_vocab" -> (q119BpeVocab _),
    "q124_bpe_encode" -> (q124BpeEncode _),
    "q128_tokenizer_fertility" -> (q128TokenizerFertility _),
    "q131_bigram_lm" -> (q131BigramLm _),
    "q78_token_vocab" -> (q78TokenVocab _),
    "q81_unigram_lm" -> (q81UnigramLm _),
    "q27_text_quality" -> (q27TextQuality _),
    "q66_heavy_hitters" -> (q66HeavyHitters _),
    "q28_token_count" -> (q28TokenCount _),
    "q29_lang_id" -> (q29LangId _),
    "q57_tfidf_topk" -> (q57TfidfTopK _),
    "q59_inverted_index" -> (q59InvertedIndex _),
    "q62_corpus_stats" -> (q62CorpusStats _),
    "q163_bm25_topk" -> (q163Bm25TopK _),
    "q164_perplexity_buckets" -> (q164PerplexityBuckets _),
    "q170_char_coverage" -> (q170CharCoverage _)
  )

  private val stopIn = Stopwords.map(w => s"'$w'").mkString(", ")

  /** The q147 stupid-backoff scoring CTE chain ending in the per-doc frame
    * `pd` (doc_id, n_scored, n_tri, n_bi, n_uni, n_oov, min_s, mean_s) —
    * shared by the q147 per-doc dump and the q164 bucket rollup so the
    * backoff arithmetic can never drift. Train = even doc ids, scored =
    * odd (the q90 parity split). */
  private val backoffPerDocCte: String =
    """tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      | trp AS (SELECT doc_id, unnest(toks[1:len(toks)-2]) AS w1,
      |          unnest(toks[2:len(toks)-1]) AS w2,
      |          unnest(toks[3:len(toks)]) AS w3
      |         FROM tk WHERE len(toks) >= 3 AND doc_id % 2 = 0),
      | tbp AS (SELECT unnest(toks[1:len(toks)-1]) AS w1,
      |          unnest(toks[2:len(toks)]) AS w2
      |         FROM tk WHERE len(toks) >= 2 AND doc_id % 2 = 0),
      | tun AS (SELECT unnest(toks) AS w FROM tk WHERE doc_id % 2 = 0),
      | c3 AS (SELECT w1, w2, w3, CAST(COUNT(*) AS BIGINT) AS cnt3
      |        FROM trp GROUP BY 1, 2, 3),
      | cb AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cntb
      |        FROM tbp GROUP BY 1, 2),
      | cu AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cntu FROM tun GROUP BY 1),
      | nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM tun),
      | tp AS (SELECT doc_id, unnest(toks[1:len(toks)-2]) AS w1,
      |         unnest(toks[2:len(toks)-1]) AS w2,
      |         unnest(toks[3:len(toks)]) AS w3,
      |         unnest(range(1, len(toks)-1)) AS pos
      |        FROM tk WHERE len(toks) >= 3 AND doc_id % 2 = 1),
      | sc AS (SELECT t.doc_id, t.pos,
      |     CASE WHEN c3.cnt3 IS NOT NULL
      |            THEN CAST(c3.cnt3 AS DOUBLE) / CAST(b12.cntb AS DOUBLE)
      |          WHEN b23.cntb IS NOT NULL
      |            THEN 0.4 * (CAST(b23.cntb AS DOUBLE) / CAST(u2.cntu AS DOUBLE))
      |          WHEN u3.cntu IS NOT NULL
      |            THEN 0.16 * (CAST(u3.cntu AS DOUBLE) / nn.n)
      |          ELSE 0.16 * (0.5 / nn.n) END AS s,
      |     CASE WHEN c3.cnt3 IS NOT NULL THEN 3
      |          WHEN b23.cntb IS NOT NULL THEN 2
      |          WHEN u3.cntu IS NOT NULL THEN 1 ELSE 0 END AS lvl
      |   FROM tp t
      |   LEFT JOIN c3 ON c3.w1 = t.w1 AND c3.w2 = t.w2 AND c3.w3 = t.w3
      |   LEFT JOIN cb b12 ON b12.w1 = t.w1 AND b12.w2 = t.w2
      |   LEFT JOIN cb b23 ON b23.w1 = t.w2 AND b23.w2 = t.w3
      |   LEFT JOIN cu u2 ON u2.w = t.w2
      |   LEFT JOIN cu u3 ON u3.w = t.w3
      |   CROSS JOIN nn),
      | ag AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_scored,
      |     CAST(SUM(CASE WHEN lvl = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_tri,
      |     CAST(SUM(CASE WHEN lvl = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_bi,
      |     CAST(SUM(CASE WHEN lvl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_uni,
      |     CAST(SUM(CASE WHEN lvl = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
      |     MIN(s) AS min_s, list(s ORDER BY pos) AS ss
      |   FROM sc GROUP BY doc_id),
      | pd AS (SELECT doc_id, n_scored, n_tri, n_bi, n_uni, n_oov, min_s,
      |     list_reduce(ss, (a, b) -> a + b) / CAST(n_scored AS DOUBLE) AS mean_s
      |   FROM ag)""".stripMargin

  /** The q153 Gopher-rule CTE chain (b → m → f) with optional passthrough
    * columns threaded to `f` — shared by the q153 per-doc dump and the
    * q155 domain rollup so the rule arithmetic can never drift. */
  private def gopherCteSql(extra: String*): String = {
    val ex = extra.map(c => s"$c, ").mkString
    s"""WITH b AS (SELECT ${ex}doc_id, text,
      |    string_split(text, ' ') AS toks,
      |    string_split(text, chr(10)) AS lines
      |  FROM documents),
      | m AS (SELECT ${ex}doc_id,
      |    CAST(len(toks) AS BIGINT) AS n_words,
      |    CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS chars,
      |    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
      |      + CAST(length(text) - length(replace(text, '...', '')) AS BIGINT) // 3 AS sym,
      |    CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS alpha,
      |    CAST(len(lines) AS BIGINT) AS n_lines,
      |    CAST(len(list_filter(lines, l -> substring(l, 1, 1) IN ('•', '-')
      |                                     OR substring(l, 1, 2) = '* ')) AS BIGINT) AS bullet,
      |    CAST(len(list_filter(lines, l -> l LIKE '%...' OR l LIKE '%…')) AS BIGINT) AS ell,
      |    CAST((CASE WHEN list_contains(toks, 'the') THEN 1 ELSE 0 END)
      |       + (CASE WHEN list_contains(toks, 'be') THEN 1 ELSE 0 END)
      |       + (CASE WHEN list_contains(toks, 'to') THEN 1 ELSE 0 END)
      |       + (CASE WHEN list_contains(toks, 'of') THEN 1 ELSE 0 END)
      |       + (CASE WHEN list_contains(toks, 'and') THEN 1 ELSE 0 END)
      |       + (CASE WHEN list_contains(toks, 'that') THEN 1 ELSE 0 END)
      |       + (CASE WHEN list_contains(toks, 'have') THEN 1 ELSE 0 END)
      |       + (CASE WHEN list_contains(toks, 'with') THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
      |  FROM b),
      | f AS (SELECT ${ex}doc_id, n_words, n_stop AS n_stopwords,
      |    CAST(chars * 100 // GREATEST(n_words, 1) AS BIGINT) AS mean_wl_x100,
      |    CAST(sym * 10000 // GREATEST(n_words, 1) AS BIGINT) AS symbol_bp,
      |    CAST(alpha * 10000 // GREATEST(n_words, 1) AS BIGINT) AS alpha_bp,
      |    CAST(bullet * 10000 // GREATEST(n_lines, 1) AS BIGINT) AS bullet_bp,
      |    CAST(ell * 10000 // GREATEST(n_lines, 1) AS BIGINT) AS ellipsis_bp,
      |    CAST(CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS INTEGER) AS pass_words,
      |    CAST(CASE WHEN chars >= n_words * 3 AND chars <= n_words * 10 THEN 1 ELSE 0 END AS INTEGER) AS pass_mwl,
      |    CAST(CASE WHEN sym * 10 <= n_words THEN 1 ELSE 0 END AS INTEGER) AS pass_symbol,
      |    CAST(CASE WHEN bullet * 10 < n_lines * 9 AND ell * 10 < n_lines * 3 THEN 1 ELSE 0 END AS INTEGER) AS pass_lines,
      |    CAST(CASE WHEN alpha * 5 >= n_words * 4 THEN 1 ELSE 0 END AS INTEGER) AS pass_alpha,
      |    CAST(CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS INTEGER) AS pass_stop
      |  FROM m)""".stripMargin
  }

  /** DuckDB replay of one BPE merge round r (see [[graft.ext.Bpe]]): pair
    * counts over the weighted symbol table s(r-1), top-1 selection with
    * the (count DESC, a, b) tie-break, greedy non-overlapping application
    * via gaps-and-islands, dense position re-rank. */
  private def bpeRoundSql(r: Int): String = {
    val x = s"s${r - 1}"
    s""" p$r AS MATERIALIZED (SELECT s1.sym AS a, s2.sym AS b, SUM(s1.cnt) AS t
       |   FROM $x s1 JOIN $x s2 ON s1.word = s2.word AND s2.pos = s1.pos + 1
       |   GROUP BY s1.sym, s2.sym),
       | m$r AS MATERIALIZED (SELECT a, b, t FROM p$r ORDER BY t DESC, a ASC, b ASC LIMIT 1),
       | c$r AS MATERIALIZED (SELECT s1.word, s1.pos FROM $x s1
       |   JOIN $x s2 ON s1.word = s2.word AND s2.pos = s1.pos + 1
       |   CROSS JOIN m$r WHERE s1.sym = m$r.a AND s2.sym = m$r.b),
       | k$r AS MATERIALIZED (SELECT word, pos FROM (
       |     SELECT word, pos, MIN(pos) OVER (PARTITION BY word, isl) AS isl0
       |     FROM (SELECT word, pos,
       |         pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS isl
       |       FROM c$r) ci) ck
       |   WHERE (pos - isl0) % 2 = 0),
       | s$r AS MATERIALIZED (SELECT s.word, s.cnt,
       |     row_number() OVER (PARTITION BY s.word ORDER BY s.pos) AS pos,
       |     CASE WHEN kk.pos IS NOT NULL THEN m$r.a || m$r.b ELSE s.sym END AS sym
       |   FROM $x s
       |   CROSS JOIN m$r
       |   LEFT JOIN k$r kk ON s.word = kk.word AND s.pos = kk.pos
       |   LEFT JOIN k$r kp ON s.word = kp.word AND s.pos = kp.pos + 1
       |   WHERE kp.pos IS NULL)"""
  }

  /** The learning CTE chain shared by q119 (reads the merges m1..mR) and
    * q124 (applies them to the corpus): word counts → capped type table →
    * symbol table s0 → R pair-count/select/apply rounds. */
  private def bpeLearnCtes(rounds: Int, maxTypes: Int): String = {
    val roundCtes = (1 to rounds).map(bpeRoundSql).mkString(",\n")
    s"""words0 AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
       |    SELECT unnest(string_split(text, ' ')) AS word FROM documents) u
       |  WHERE word <> '' GROUP BY word),
       | types AS MATERIALIZED (SELECT word, cnt FROM words0
       |   ORDER BY cnt DESC, word ASC LIMIT $maxTypes),
       | s0 AS MATERIALIZED (SELECT word, cnt, CAST(pos AS BIGINT) AS pos,
       |     CASE WHEN pos <= len(word) THEN substring(word, pos, 1)
       |          ELSE ' ' END AS sym
       |   FROM (SELECT word, cnt, unnest(range(1, len(word) + 2)) AS pos
       |         FROM types) v),
       |$roundCtes""".stripMargin
  }

  private def bpeSql(rounds: Int, maxTypes: Int): String = {
    val unions = (1 to rounds).map(r =>
      s"""  SELECT CAST($r AS BIGINT) AS round, a AS lsym, b AS rsym,
         |    a || b AS merged, CAST(t AS BIGINT) AS pair_count FROM m$r"""
        .stripMargin).mkString("\n  UNION ALL\n")
    s"""WITH ${bpeLearnCtes(rounds, maxTypes)}
       |SELECT * FROM (
       |$unions
       |) ORDER BY round""".stripMargin
  }

  /** One ENCODE round r over the uncapped corpus type table: mark pairs
    * matching the LEARNED merge m$r, keep alternating island positions
    * (greedy non-overlapping), rebuild — [[bpeRoundSql]]'s c/k/s triple
    * without the pair-count/selection step (merges come from learning). */
  private def bpeApplyRoundSql(r: Int): String = {
    val x = s"a${r - 1}"
    s""" ca$r AS MATERIALIZED (SELECT s1.word, s1.pos FROM $x s1
       |   JOIN $x s2 ON s1.word = s2.word AND s2.pos = s1.pos + 1
       |   CROSS JOIN m$r WHERE s1.sym = m$r.a AND s2.sym = m$r.b),
       | ka$r AS MATERIALIZED (SELECT word, pos FROM (
       |     SELECT word, pos, MIN(pos) OVER (PARTITION BY word, isl) AS isl0
       |     FROM (SELECT word, pos,
       |         pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS isl
       |       FROM ca$r) ci) ck
       |   WHERE (pos - isl0) % 2 = 0),
       | a$r AS MATERIALIZED (SELECT s.word,
       |     row_number() OVER (PARTITION BY s.word ORDER BY s.pos) AS pos,
       |     CASE WHEN kk.pos IS NOT NULL THEN m$r.a || m$r.b ELSE s.sym END AS sym
       |   FROM $x s
       |   CROSS JOIN m$r
       |   LEFT JOIN ka$r kk ON s.word = kk.word AND s.pos = kk.pos
       |   LEFT JOIN ka$r kp ON s.word = kp.word AND s.pos = kp.pos + 1
       |   WHERE kp.pos IS NULL)"""
  }

  /** q124 replay: learn m1..mR (the q119 CTEs), then encode — per DISTINCT
    * corpus word (encode is word-local, so per-type work + a join back ≡
    * the kernel's per-document pass), R apply rounds, then per-doc token
    * count and chr(1)-joined stream fingerprint in (word-index, position)
    * order — exactly the kernel's word-major token order. */
  private def bpeApplySql(rounds: Int, maxTypes: Int): String = {
    val applyCtes = (1 to rounds).map(bpeApplyRoundSql).mkString(",\n")
    s"""WITH ${bpeLearnCtes(rounds, maxTypes)},
       | wt AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word,
       |          unnest(range(1, len(string_split(text, ' ')) + 1)) AS widx
       |        FROM documents),
       | wtf AS (SELECT doc_id, word, widx FROM wt WHERE word <> ''),
       | atypes AS (SELECT DISTINCT word FROM wtf),
       | a0 AS MATERIALIZED (SELECT word, CAST(pos AS BIGINT) AS pos,
       |     CASE WHEN pos <= len(word) THEN substring(word, pos, 1)
       |          ELSE ' ' END AS sym
       |   FROM (SELECT word, unnest(range(1, len(word) + 2)) AS pos
       |         FROM atypes) v),
       |$applyCtes,
       | enc AS (SELECT w.doc_id, w.widx, a.pos, a.sym
       |         FROM wtf w JOIN a$rounds a ON a.word = w.word),
       | agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |          md5(string_agg(sym, chr(1) ORDER BY widx, pos)) AS token_fp
       |         FROM enc GROUP BY doc_id),
       | met AS (SELECT d.doc_id,
       |          CAST(len(replace(d.text, ' ', '')) AS BIGINT) + w.n_words
       |            AS n_symbols
       |         FROM documents d JOIN (SELECT doc_id,
       |             CAST(COUNT(*) AS BIGINT) AS n_words
       |           FROM wtf GROUP BY 1) w ON w.doc_id = d.doc_id)
       |SELECT m.doc_id, m.n_symbols, g.n_tokens, g.token_fp
       |FROM met m JOIN agg g ON g.doc_id = m.doc_id
       |ORDER BY m.doc_id""".stripMargin
  }

  /** q128 replay: the q124 apply chain, aggregated per language instead
    * of per document. */
  private def bpeFertilitySql(rounds: Int, maxTypes: Int): String = {
    val applyCtes = (1 to rounds).map(bpeApplyRoundSql).mkString(",\n")
    s"""WITH ${bpeLearnCtes(rounds, maxTypes)},
       | wt AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word,
       |          unnest(range(1, len(string_split(text, ' ')) + 1)) AS widx
       |        FROM documents),
       | wtf AS (SELECT doc_id, word, widx FROM wt WHERE word <> ''),
       | atypes AS (SELECT DISTINCT word FROM wtf),
       | a0 AS MATERIALIZED (SELECT word, CAST(pos AS BIGINT) AS pos,
       |     CASE WHEN pos <= len(word) THEN substring(word, pos, 1)
       |          ELSE ' ' END AS sym
       |   FROM (SELECT word, unnest(range(1, len(word) + 2)) AS pos
       |         FROM atypes) v),
       |$applyCtes,
       | tl AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS toks
       |        FROM a$rounds GROUP BY word),
       | pd AS (SELECT w.doc_id,
       |          CAST(COUNT(*) AS BIGINT) AS n_words,
       |          CAST(SUM(tl.toks) AS BIGINT) AS n_tokens
       |        FROM wtf w JOIN tl ON tl.word = w.word GROUP BY w.doc_id)
       |SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(p.n_words) AS BIGINT) AS n_words,
       |  CAST(SUM(p.n_tokens) AS BIGINT) AS n_tokens,
       |  CAST(SUM(len(replace(d.text, ' ', '')) + p.n_words) AS BIGINT)
       |    AS n_symbols,
       |  CAST((10000 * SUM(p.n_tokens)) // SUM(p.n_words) AS BIGINT)
       |    AS fertility_bp,
       |  CAST((10000 * SUM(len(replace(d.text, ' ', '')) + p.n_words))
       |       // SUM(p.n_tokens) AS BIGINT) AS compression_bp
       |FROM documents d JOIN pd p ON p.doc_id = d.doc_id
       |GROUP BY d.lang ORDER BY d.lang""".stripMargin
  }

  /** The unigram-LM learn chain as DuckDB CTEs (q159/q160 replay): type
    * table → char inventory → capped types → substring seeds → per EM
    * round (total → probs → piece candidates → `wordLenCap` Viterbi level
    * tables, one row per (word, pieces-used, end) kept by the shared
    * (score DESC, path ASC) tie-break → best path → usage recount →
    * next vocabulary with the char floor). Ends with `v{emRounds}` (the
    * final counts) and `tf` (their total). */
  /** One Viterbi level ladder as CTEs. The n ≥ 2 step computes
    * score/path in an inner subquery and QUALIFYs OUTSIDE it: in a flat
    * `SELECT l.score * c.prob AS score ... QUALIFY ORDER BY score`,
    * DuckDB resolves `score` to the SOURCE column l.score (the PREFIX's
    * score), silently ranking cells by the wrong key — the r13 bug that
    * made the oracle prefer lexicographic prefixes over better
    * extensions. */
  private def unigramLevels(tag: String, candCte: String,
                            wordLenCap: Int): String =
    (1 to wordLenCap).map { n =>
      if (n == 1)
        s""" ${tag}_1 AS MATERIALIZED (
           |   SELECT word, j, prob AS score, piece AS path
           |   FROM $candCte WHERE i = 0
           |   QUALIFY row_number() OVER
           |     (PARTITION BY word, j ORDER BY score DESC, path) = 1)"""
          .stripMargin
      else
        s""" ${tag}_$n AS MATERIALIZED (
           |   SELECT word, j, score, path FROM (
           |     SELECT c.word AS word, c.j AS j,
           |       l.score * c.prob AS score,
           |       l.path || chr(1) || c.piece AS path
           |     FROM ${tag}_${n - 1} l
           |     JOIN $candCte c ON c.word = l.word AND c.i = l.j) z
           |   QUALIFY row_number() OVER
           |     (PARTITION BY word, j ORDER BY score DESC, path) = 1)"""
          .stripMargin
    }.mkString(",\n")

  private def unigramLearnCtes(maxTypes: Int, maxPieceLen: Int,
                               seedMulti: Int, emRounds: Int,
                               wordLenCap: Int): String = {
    def levelUnion(tag: String): String =
      (1 to wordLenCap).map(n => s"SELECT word, j, score, path FROM ${tag}_$n")
        .mkString("\n     UNION ALL ")
    val rounds = (1 to emRounds).map { r =>
      val prev = s"v${r - 1}"
      s""" t$r AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM $prev),
         | p$r AS (SELECT piece,
         |     CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE) AS prob
         |   FROM $prev CROSS JOIN t$r),
         | cd$r AS MATERIALIZED (SELECT x.word, x.i, x.j, p.piece, p.prob
         |   FROM (SELECT c.word, ui.i - 1 AS i, ui.i - 1 + ul.l AS j,
         |           substring(c.word, ui.i, ul.l) AS sp
         |         FROM cap c,
         |              unnest(range(1, len(c.word) + 1)) AS ui(i),
         |              unnest(range(1, ${maxPieceLen + 1})) AS ul(l)
         |         WHERE ui.i - 1 + ul.l <= len(c.word)) x
         |   JOIN p$r p ON p.piece = x.sp),
         |${unigramLevels(s"l$r", s"cd$r", wordLenCap)},
         | b$r AS (SELECT u.word, u.score, u.path FROM (
         |     ${levelUnion(s"l$r")}) u
         |   JOIN cap c ON c.word = u.word AND u.j = len(c.word)
         |   QUALIFY row_number() OVER
         |     (PARTITION BY u.word ORDER BY u.score DESC, u.path) = 1),
         | u$r AS (SELECT s.piece, CAST(SUM(c.cnt) AS BIGINT) AS cnt
         |   FROM b$r b JOIN cap c ON c.word = b.word,
         |        unnest(string_split(b.path, chr(1))) AS s(piece)
         |   GROUP BY 1),
         | v$r AS (
         |   SELECT ch.piece,
         |     CAST(GREATEST(COALESCE(u.cnt, 0), 1) AS BIGINT) AS cnt
         |   FROM chars ch LEFT JOIN u$r u ON u.piece = ch.piece
         |   UNION ALL
         |   SELECT piece, cnt FROM u$r WHERE len(piece) >= 2)"""
        .stripMargin
    }.mkString(",\n")
    s""" wt AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
       | tw AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM wt
       |        WHERE word <> '' GROUP BY 1),
       | chx AS (SELECT substring(word, p, 1) AS piece, cnt
       |         FROM tw, unnest(range(1, len(word) + 1)) AS u(p)),
       | chars AS (SELECT piece, CAST(SUM(cnt) AS BIGINT) AS cnt
       |           FROM chx GROUP BY 1),
       | cap0 AS (SELECT word, cnt FROM tw
       |          ORDER BY cnt DESC, word LIMIT $maxTypes),
       | cap AS (SELECT word, cnt FROM cap0 WHERE len(word) <= $wordLenCap),
       | mx AS (SELECT substring(word, i, l) AS piece, cnt
       |        FROM cap,
       |             unnest(range(1, len(word) + 1)) AS ui(i),
       |             unnest(range(2, ${maxPieceLen + 1})) AS ul(l)
       |        WHERE i + l - 1 <= len(word)),
       | multis AS (SELECT piece, CAST(SUM(cnt) AS BIGINT) AS cnt
       |            FROM mx GROUP BY 1
       |            ORDER BY cnt DESC, piece LIMIT $seedMulti),
       | v0 AS (SELECT piece, cnt FROM chars
       |        UNION ALL SELECT piece, cnt FROM multis),
       |$rounds,
       | tf AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM v$emRounds)"""
      .stripMargin
  }

  /** q159 replay: the learn chain's final vocabulary with one exact
    * double division per piece. */
  private def unigramVocabSql(maxTypes: Int, maxPieceLen: Int,
                              seedMulti: Int, emRounds: Int,
                              wordLenCap: Int): String =
    s"""WITH ${unigramLearnCtes(maxTypes, maxPieceLen, seedMulti, emRounds, wordLenCap)}
       |SELECT piece, CAST(len(piece) AS INT) AS piece_len, cnt,
       |  CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE) AS prob
       |FROM v$emRounds CROSS JOIN tf ORDER BY piece""".stripMargin

  /** q160 replay: learn, then the SAME Viterbi levels over every DISTINCT
    * corpus word (≤ cap; longer words encode char-wise), joined back to
    * occurrences and rolled up per language. */
  private def unigramFertilitySql(maxTypes: Int, maxPieceLen: Int,
                                  seedMulti: Int, emRounds: Int,
                                  wordLenCap: Int): String = {
    val levelUnion = (1 to wordLenCap)
      .map(n => s"SELECT word, j, score, path FROM e_$n")
      .mkString("\n     UNION ALL ")
    s"""WITH ${unigramLearnCtes(maxTypes, maxPieceLen, seedMulti, emRounds, wordLenCap)},
       | pf AS (SELECT piece,
       |     CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE) AS prob
       |   FROM v$emRounds CROSS JOIN tf),
       | dwords AS (SELECT DISTINCT word FROM wt WHERE word <> ''),
       | dshort AS (SELECT word FROM dwords WHERE len(word) <= $wordLenCap),
       | dlong AS (SELECT word, CAST(len(word) AS BIGINT) AS n_pieces
       |           FROM dwords WHERE len(word) > $wordLenCap),
       | ce AS MATERIALIZED (SELECT x.word, x.i, x.j, p.piece, p.prob
       |   FROM (SELECT c.word, ui.i - 1 AS i, ui.i - 1 + ul.l AS j,
       |           substring(c.word, ui.i, ul.l) AS sp
       |         FROM dshort c,
       |              unnest(range(1, len(c.word) + 1)) AS ui(i),
       |              unnest(range(1, ${maxPieceLen + 1})) AS ul(l)
       |         WHERE ui.i - 1 + ul.l <= len(c.word)) x
       |   JOIN pf p ON p.piece = x.sp),
       |${unigramLevels("e", "ce", wordLenCap)},
       | eb AS (SELECT u.word, u.path FROM (
       |     $levelUnion) u
       |   JOIN dshort c ON c.word = u.word AND u.j = len(c.word)
       |   QUALIFY row_number() OVER
       |     (PARTITION BY u.word ORDER BY u.score DESC, u.path) = 1),
       | enc AS (SELECT word,
       |     CAST(len(string_split(path, chr(1))) AS BIGINT) AS n_pieces
       |   FROM eb
       |   UNION ALL SELECT word, n_pieces FROM dlong),
       | occ AS (SELECT d.lang, w.word
       |   FROM documents d, unnest(string_split(d.text, ' ')) AS w(word)
       |   WHERE w.word <> ''),
       | roll AS (SELECT o.lang, CAST(COUNT(*) AS BIGINT) AS n_words,
       |     CAST(SUM(len(o.word)) AS BIGINT) AS n_chars,
       |     CAST(SUM(e.n_pieces) AS BIGINT) AS n_tokens
       |   FROM occ o JOIN enc e ON e.word = o.word GROUP BY 1),
       | nd AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
       |        FROM documents GROUP BY 1)
       |SELECT r.lang, nd.n_docs, r.n_words, r.n_chars, r.n_tokens,
       |  CAST((10000 * r.n_tokens) // r.n_words AS BIGINT) AS fertility_bp,
       |  CAST((10000 * r.n_chars) // r.n_tokens AS BIGINT) AS compression_bp
       |FROM roll r JOIN nd ON nd.lang = r.lang ORDER BY r.lang""".stripMargin
  }

  /** The [[graft.ext.TextOps.hashedMargin]] bucket-weight expression over a
    * token expression `e`: weight = int of the first 2 hex chars of
    * md5('graft-ftw:' || bucket) − 128, bucket = first 4 hex chars of
    * md5('graft-ft:' || e) — the strpos hex→int idiom. */
  private def ftWeightSql(e: String): String = {
    val h = s"md5('graft-ftw:' || substring(md5('graft-ft:' || $e), 1, 4))"
    s"""((strpos('0123456789abcdef', substring($h, 1, 1)) - 1) * 16
       |       + (strpos('0123456789abcdef', substring($h, 2, 1)) - 1) - 128)""".stripMargin
  }

  /** Shared q192/q193/q194 margin chain: per doc the filtered token list,
    * exact token count, and the [[graft.ext.TextOps.hashedMargin]] replay
    * (unigrams via list_transform, bigrams via range(1, len) positional
    * pairing; COALESCE 0 for empty lists ≡ the 0L fold seed). */
  private[queries] val FtMarginCtes: String =
    s"""t AS (SELECT doc_id, source,
      |     list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |   FROM documents),
      | m AS (SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS ntoks,
      |     COALESCE(list_sum(list_transform(toks, x ->
      |       ${ftWeightSql("x")})), 0)
      |     + COALESCE(list_sum(list_transform(range(1, len(toks)), i ->
      |       ${ftWeightSql("(toks[i] || ' ' || toks[i+1])")})), 0) AS margin
      |   FROM t)""".stripMargin

  val sql: Map[String, String] = Map(
    /* q206: the same margin CTE joined to the labels; cumulative windows
     * over the distinct-threshold frame; the AUC row is the exact
     * rank-sum 2U = Σ p·(2·neg_below + n) in HUGEINT ≡ Spark's
     * DECIMAL(38,0). All `//` operands are non-negative, so DuckDB's
     * truncate-toward-zero ≡ floor (the q193 negative-`//` trap can't
     * fire). */
    "q206_classifier_auc" ->
      s"""WITH $FtMarginCtes,
        | lab AS (SELECT m.margin AS thr,
        |     CASE WHEN e.label >= 5 THEN 1 ELSE 0 END AS pos
        |   FROM m JOIN embeddings e ON e.vec_id = m.doc_id),
        | g AS (SELECT thr, CAST(SUM(pos) AS BIGINT) AS p,
        |     CAST(COUNT(*) - SUM(pos) AS BIGINT) AS n
        |   FROM lab GROUP BY 1),
        | c AS (SELECT *,
        |     SUM(p) OVER (ORDER BY thr DESC
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp,
        |     SUM(n) OVER (ORDER BY thr DESC
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
        |     SUM(p) OVER () AS tp, SUM(n) OVER () AS tn
        |   FROM g),
        | pts AS (SELECT thr, CAST(p + n AS BIGINT) AS n_docs,
        |     CAST(CASE WHEN tp > 0 THEN cp * 10000 // tp END AS BIGINT) AS tpr_bp,
        |     CAST(CASE WHEN tn > 0 THEN cn * 10000 // tn END AS BIGINT) AS fpr_bp,
        |     CAST(cp * 10000 // (cp + cn) AS BIGINT) AS prec_bp,
        |     CAST(NULL AS BIGINT) AS auc_bp
        |   FROM c),
        | tot AS (SELECT CAST(NULL AS BIGINT) AS thr,
        |     CAST(MAX(tp) + MAX(tn) AS BIGINT) AS n_docs,
        |     CAST(NULL AS BIGINT) AS tpr_bp, CAST(NULL AS BIGINT) AS fpr_bp,
        |     CAST(NULL AS BIGINT) AS prec_bp,
        |     CAST(CASE WHEN MAX(tp) > 0 AND MAX(tn) > 0 THEN
        |       (SUM(CAST(p AS HUGEINT) * (2 * (tn - cn) + n)) * 10000)
        |         // (2 * CAST(MAX(tp) AS HUGEINT) * MAX(tn)) END AS BIGINT) AS auc_bp
        |   FROM c)
        |SELECT * FROM pts UNION ALL SELECT * FROM tot ORDER BY thr""".stripMargin,
    /* q192: the same two md5 hops per n-gram (token → 4-hex bucket →
     * 2-hex weight − 128) — see FtMarginCtes. */
    "q192_hashed_classifier" ->
      s"""WITH $FtMarginCtes
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN margin > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |  CAST(SUM(margin) AS BIGINT) AS margin_sum,
        |  CAST(MIN(margin) AS BIGINT) AS margin_min,
        |  CAST(MAX(margin) AS BIGINT) AS margin_max
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    /* q193: DuckDB's `//` TRUNCATES toward zero on negatives (measured:
     * -2366 // 256 = -9, not -10 — the q183 clamp only masked this), so
     * the oracle floors explicitly with the same nonneg-remainder
     * construction Spark uses: (m − ((m % B + B) % B)) // 256 divides an
     * exact multiple, where truncation ≡ floor. Cumulative window over
     * the bounded bin frame. */
    "q193_classifier_yield" ->
      s"""WITH $FtMarginCtes,
        | b AS (SELECT (margin - ((margin % 256 + 256) % 256)) // 256 AS bin,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(ntoks) AS BIGINT) AS n_tokens FROM m GROUP BY 1)
        |SELECT CAST(bin * 256 AS BIGINT) AS threshold, n_docs, n_tokens,
        |  CAST(SUM(n_docs) OVER (ORDER BY bin DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_docs,
        |  CAST(SUM(n_tokens) OVER (ORDER BY bin DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        |FROM b ORDER BY threshold""".stripMargin,
    /* q194: the same margin chain, per-source rank with (margin DESC,
     * doc_id ASC) — the engine's WindowGroupLimit pushdown is invisible
     * to values; totals from the margin-free marginal. */
    "q194_domain_cap" ->
      s"""WITH $FtMarginCtes,
        | r AS (SELECT source, margin, ntoks,
        |       row_number() OVER (PARTITION BY source
        |         ORDER BY margin DESC, doc_id ASC) AS rnk FROM m),
        | kept AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |          CAST(SUM(ntoks) AS BIGINT) AS tokens_kept,
        |          CAST(MIN(margin) AS BIGINT) AS threshold_margin
        |        FROM r WHERE rnk <= 50 GROUP BY 1),
        | tot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |         CAST(SUM(ntoks) AS BIGINT) AS tokens_total FROM m GROUP BY 1)
        |SELECT tot.source, tot.n_docs, tot.tokens_total, kept.n_kept,
        |  kept.tokens_kept, kept.threshold_margin
        |FROM tot JOIN kept USING (source) ORDER BY tot.source""".stripMargin,
    /* q179: 20-word blocks (the q177 slicing), per-block integer marker
     * counts per language, argmax with en > es > de priority on ties
     * (rank 3/2/1, unknown 0), dominant = max count then max rank
     * (two-step replay of the struct max), bp by integer division. */
    "q179_code_switching" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        | nb AS (SELECT doc_id, ws,
        |          CAST((len(ws) + 19) // 20 AS BIGINT) AS n FROM w),
        | b AS (SELECT doc_id,
        |          array_to_string(ws[(bi*20+1):(bi*20+20)], ' ') AS block
        |        FROM (SELECT doc_id, ws, unnest(range(0, n)) AS bi FROM nb)),
        | c AS (SELECT doc_id,
        |   CAST(len(list_filter(string_split(block, ' '),
        |     t -> t IN ('the','a','or','and','fast','slow'))) AS BIGINT) AS c_en,
        |   CAST(len(list_filter(string_split(block, ' '),
        |     t -> t IN ('el','la','los','datos','y'))) AS BIGINT) AS c_es,
        |   CAST(len(list_filter(string_split(block, ' '),
        |     t -> t IN ('der','die','das','und','nicht'))) AS BIGINT) AS c_de
        |   FROM b),
        | lrk AS (SELECT doc_id, CASE
        |     WHEN c_en > 0 AND c_en >= c_es AND c_en >= c_de THEN 3
        |     WHEN c_es > 0 AND c_es > c_en AND c_es >= c_de THEN 2
        |     WHEN c_de > 0 AND c_de > c_en AND c_de > c_es THEN 1
        |     ELSE 0 END AS lr FROM c),
        | bl AS (SELECT doc_id, lr, CAST(COUNT(*) AS BIGINT) AS cnt
        |        FROM lrk GROUP BY 1, 2),
        | agg AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_blocks,
        |           MAX(cnt) AS mx,
        |           CAST(COUNT(DISTINCT CASE WHEN lr > 0 THEN lr END) AS BIGINT)
        |             AS n_langs
        |         FROM bl GROUP BY 1),
        | dom AS (SELECT a.doc_id, a.n_blocks, a.mx, a.n_langs,
        |           MAX(b.lr) AS dom_lr
        |         FROM agg a JOIN bl b ON b.doc_id = a.doc_id AND b.cnt = a.mx
        |         GROUP BY 1, 2, 3, 4)
        |SELECT doc_id, n_blocks,
        |  CASE dom_lr WHEN 3 THEN 'en' WHEN 2 THEN 'es' WHEN 1 THEN 'de'
        |    ELSE 'unknown' END AS dom_lang,
        |  CAST((10000 * mx) // n_blocks AS BIGINT) AS dom_bp, n_langs
        |FROM dom ORDER BY doc_id""".stripMargin,
    "q159_unigram_vocab" -> unigramVocabSql(50, 4, 120, 2, 16),
    "q160_unigram_fertility" -> unigramFertilitySql(50, 4, 120, 2, 16),
    /* q162: the q128 and q160 replay chains INLINED as parenthesized
     * subqueries — each keeps its own WITH scope, so their colliding CTE
     * names (wt, enc, …) never meet — joined on lang. */
    "q162_tokenizer_compare" ->
      s"""SELECT b.lang, b.n_words, b.n_tokens AS bpe_tokens,
         |  b.fertility_bp AS bpe_fertility_bp,
         |  u.n_tokens AS uni_tokens, u.fertility_bp AS uni_fertility_bp,
         |  CAST((10000 * u.n_tokens) // b.n_tokens AS BIGINT) AS uni_vs_bpe_bp
         |FROM (
         |${bpeFertilitySql(rounds = 8, maxTypes = 50)}
         |) b JOIN (
         |${unigramFertilitySql(50, 4, 120, 2, 16)}
         |) u USING (lang)
         |ORDER BY b.lang""".stripMargin,
    "q119_bpe_vocab" -> bpeSql(rounds = 8, maxTypes = 50),
    /* q157: the q124 learn+apply chain, read at INTERMEDIATE merge counts —
     * every a_r state is already materialized, so the curve is one
     * per-type token count + occurrence-weighted sum per level. */
    "q157_bpe_curve" -> {
      val applyCtes = (1 to 8).map(bpeApplyRoundSql).mkString(",\n")
      val ms = Seq(0, 2, 4, 6, 8)
      val tcs = ms.map(m =>
        s" tc$m AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c FROM a$m GROUP BY word)")
        .mkString(",\n")
      val lvls = ms.map(m =>
        s"SELECT $m AS n_merges, CAST(SUM(w.c * t.c) AS BIGINT) AS n_tokens" +
          s" FROM wc w JOIN tc$m t USING (word)")
        .mkString("\n UNION ALL ")
      s"""WITH ${bpeLearnCtes(8, 50)},
         | wt AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word,
         |          unnest(range(1, len(string_split(text, ' ')) + 1)) AS widx
         |        FROM documents),
         | wtf AS (SELECT doc_id, word, widx FROM wt WHERE word <> ''),
         | atypes AS (SELECT DISTINCT word FROM wtf),
         | a0 AS MATERIALIZED (SELECT word, CAST(pos AS BIGINT) AS pos,
         |     CASE WHEN pos <= len(word) THEN substring(word, pos, 1)
         |          ELSE ' ' END AS sym
         |   FROM (SELECT word, unnest(range(1, len(word) + 2)) AS pos
         |         FROM atypes) v),
         |$applyCtes,
         | wc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS c FROM wtf GROUP BY word),
         |$tcs,
         | lv AS ($lvls),
         | b AS (SELECT n_tokens AS base FROM lv WHERE n_merges = 0)
         |SELECT CAST(n_merges AS BIGINT) AS n_merges, n_tokens,
         |  CAST((base - n_tokens) * 10000 // GREATEST(base, 1) AS BIGINT) AS saved_bp,
         |  CAST(base * 100 // GREATEST(n_tokens, 1) AS BIGINT) AS symbols_per_token_x100
         |FROM lv, b ORDER BY n_merges""".stripMargin
    },
    "q124_bpe_encode" -> bpeApplySql(rounds = 8, maxTypes = 50),
    "q128_tokenizer_fertility" -> bpeFertilitySql(rounds = 8, maxTypes = 50),
    /* q131: same Laplace arithmetic — (cnt12+1)/(cnt1+V) one division per
     * bigram; per-doc sum folded in position order (list_reduce's
     * init-free left fold ≡ Spark's 0.0-init fold). */
    /* q149: truncated whitespace token counts, the 60-bit bat: hash, both
     * batch assignments (global ceil-div batch count / per-bucket counts),
     * per-batch max/sum, integral-division padding bp. */
    "q149_padding_audit" ->
      s"""WITH base AS (SELECT doc_id,
        |    LEAST(len(string_split(text, ' ')), 128) AS len,
        |    ${ProfilingQueries.hex60("'bat:' || CAST(doc_id AS VARCHAR)")} AS h
        |  FROM documents),
        | n AS (SELECT COUNT(*) AS n FROM base),
        | hb AS (SELECT h % ((n.n + 7) // 8) AS batch, len FROM base, n),
        | hstat AS (SELECT batch, COUNT(*) AS n_rows, MAX(len) AS max_len,
        |     SUM(len) AS useful FROM hb GROUP BY 1),
        | hroll AS (SELECT 'hash' AS policy,
        |     CAST(COUNT(*) AS BIGINT) AS n_batches,
        |     CAST(SUM(n_rows) AS BIGINT) AS n_rows,
        |     CAST(SUM(useful) AS BIGINT) AS useful_tokens,
        |     CAST(SUM(n_rows * max_len) AS BIGINT) AS cost_tokens
        |   FROM hstat),
        | bk AS (SELECT doc_id, len, h, len // 16 AS bucket FROM base),
        | bc AS (SELECT bucket, COUNT(*) AS bn FROM bk GROUP BY 1),
        | bb AS (SELECT bk.bucket, bk.h % ((bc.bn + 7) // 8) AS sub, bk.len
        |   FROM bk JOIN bc USING (bucket)),
        | bstat AS (SELECT bucket, sub, COUNT(*) AS n_rows, MAX(len) AS max_len,
        |     SUM(len) AS useful FROM bb GROUP BY 1, 2),
        | broll AS (SELECT 'bucketed' AS policy,
        |     CAST(COUNT(*) AS BIGINT) AS n_batches,
        |     CAST(SUM(n_rows) AS BIGINT) AS n_rows,
        |     CAST(SUM(useful) AS BIGINT) AS useful_tokens,
        |     CAST(SUM(n_rows * max_len) AS BIGINT) AS cost_tokens
        |   FROM bstat),
        | u AS (SELECT * FROM hroll UNION ALL SELECT * FROM broll)
        |SELECT policy, n_batches, n_rows, useful_tokens, cost_tokens,
        |  cost_tokens - useful_tokens AS padding_tokens,
        |  CASE WHEN cost_tokens > 0
        |    THEN (10000 * (cost_tokens - useful_tokens)) // cost_tokens
        |    ELSE 0 END AS padding_bp
        |FROM u ORDER BY policy""".stripMargin,
    /* q147: train tables from the even half, trigram stream from the odd
     * half, LEFT joins at every level (held-out n-grams can be unseen),
     * the 3→2→1→0 CASE with literal 0.4/0.16 factors, position-ordered
     * list_reduce fold (the q81/q131 identity). CTE chain shared with the
     * q164 bucket rollup via [[backoffPerDocCte]]. */
    "q147_stupid_backoff" ->
      s"""WITH $backoffPerDocCte
        |SELECT doc_id, n_scored, n_tri, n_bi, n_uni, n_oov, min_s, mean_s
        |FROM pd ORDER BY doc_id""".stripMargin,
    /* q170: the vocab's single-char tier is EXACTLY the training slice's
     * char inventory (characters are floored, never pruned; seeds and EM
     * survivors are all length >= 2), so the oracle needs no EM replay —
     * just the en slice's distinct word-chars as the covered set, and the
     * same space-excluded char explosion per language. All outputs exact
     * integers; the uncovered marker is an integer code-point min, never
     * a collated string min. */
    "q170_char_coverage" ->
      """WITH wf AS (SELECT lang, word
        |            FROM (SELECT lang, unnest(string_split(text, ' ')) AS word
        |                  FROM documents)
        |            WHERE word <> ''),
        | cp AS (SELECT lang, substring(word, CAST(p AS INTEGER), 1) AS ch
        |        FROM (SELECT lang, word,
        |                unnest(generate_series(1, length(word))) AS p
        |              FROM wf)),
        | vch AS (SELECT DISTINCT ch FROM cp WHERE lang = 'en'),
        | occ AS (SELECT lang, ch, CAST(COUNT(*) AS BIGINT) AS occ
        |         FROM cp GROUP BY lang, ch),
        | j AS (SELECT o.lang, o.ch, o.occ, (v.ch IS NOT NULL) AS cov
        |       FROM occ o LEFT JOIN vch v ON o.ch = v.ch)
        |SELECT lang,
        |  CAST(COUNT(*) AS BIGINT) AS n_chars_distinct,
        |  CAST(SUM(CASE WHEN cov THEN 1 ELSE 0 END) AS BIGINT) AS n_chars_covered,
        |  CAST(SUM(occ) AS BIGINT) AS occ_total,
        |  CAST(SUM(CASE WHEN cov THEN occ ELSE 0 END) AS BIGINT) AS occ_covered,
        |  MIN(CASE WHEN NOT cov THEN CAST(unicode(ch) AS BIGINT) END) AS min_uncovered_cp,
        |  (10000 * CAST(SUM(CASE WHEN cov THEN occ ELSE 0 END) AS BIGINT))
        |    // CAST(SUM(occ) AS BIGINT) AS coverage_bp
        |FROM j GROUP BY lang ORDER BY lang""".stripMargin,
    /* q164: the q147 per-doc scores snapped to the 2^20 integer grid
     * (multiply + floor, exact on the bit-portable mean_s), tercile
     * thresholds from the key histogram in exact integer arithmetic
     * (cum·3 ≥ N / cum·3 ≥ 2N), bucket CASE on key vs thresholds, rollup
     * per (bucket, source). */
    "q164_perplexity_buckets" ->
      s"""WITH $backoffPerDocCte,
        | k AS (SELECT doc_id, n_scored,
        |        CAST(floor(mean_s * 1048576.0) AS BIGINT) AS key FROM pd),
        | h AS (SELECT key, CAST(COUNT(*) AS BIGINT) AS c FROM k GROUP BY key),
        | cm AS (SELECT key, SUM(c) OVER (ORDER BY key) AS cum FROM h),
        | nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM k),
        | th AS (SELECT MIN(CASE WHEN cum * 3 >= n THEN key END) AS t1,
        |          MIN(CASE WHEN cum * 3 >= 2 * n THEN key END) AS t2
        |        FROM cm, nd),
        | a AS (SELECT k.doc_id, k.n_scored, k.key,
        |         CASE WHEN key <= t1 THEN 'tail'
        |              WHEN key <= t2 THEN 'middle' ELSE 'head' END AS bucket
        |       FROM k, th)
        |SELECT bucket, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_scored) AS BIGINT) AS tok_scored,
        |  CAST(MIN(key) AS BIGINT) AS min_key,
        |  CAST(MAX(key) AS BIGINT) AS max_key
        |FROM a JOIN documents USING (doc_id)
        |GROUP BY bucket, source ORDER BY bucket, source""".stripMargin,
    "q131_bigram_lm" ->
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks
        |            FROM documents),
        | bp AS (SELECT doc_id, unnest(toks[1:len(toks)-1]) AS w1,
        |         unnest(toks[2:len(toks)]) AS w2,
        |         unnest(range(1, len(toks))) AS pos
        |        FROM tk WHERE len(toks) >= 2),
        | c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt12
        |         FROM bp GROUP BY 1, 2),
        | c1 AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS cnt1
        |        FROM bp GROUP BY 1),
        | vv AS (SELECT COUNT(DISTINCT tok) AS v
        |        FROM (SELECT unnest(toks) AS tok FROM tk) u),
        | pr AS (SELECT b.doc_id, b.pos,
        |         CAST(c.cnt12 + 1 AS DOUBLE) /
        |           CAST(l.cnt1 + (SELECT v FROM vv) AS DOUBLE) AS p
        |        FROM bp b JOIN c12 c ON c.w1 = b.w1 AND c.w2 = b.w2
        |                  JOIN c1 l ON l.w1 = b.w1),
        | ag AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |         MIN(p) AS min_p, list(p ORDER BY pos) AS ps
        |        FROM pr GROUP BY doc_id)
        |SELECT doc_id, n_bigrams, min_p,
        |  list_reduce(ps, (a, b) -> a + b) / CAST(n_bigrams AS DOUBLE) AS mean_p
        |FROM ag ORDER BY doc_id""".stripMargin,
    /* Replays the exact Spark arithmetic: p = CAST(cnt AS DOUBLE)/total and
     * the OOV floor 0.5/total are single IEEE divisions; per-doc sums fold
     * the probability list in document order (list_reduce left fold ==
     * Spark `aggregate` with 0.0 init — 0.0 + p1 == p1 exactly), so every
     * double matches bit-for-bit. */
    "q81_unigram_lm" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
        |             generate_subscripts(string_split(text, ' '), 1) AS i
        |            FROM documents),
        | c AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM tk GROUP BY tok),
        | tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM c),
        | vocab AS (SELECT tok, CAST(cnt AS DOUBLE) / (SELECT total FROM tot) AS p
        |           FROM c ORDER BY cnt DESC, tok ASC LIMIT 25),
        | per AS (SELECT t.doc_id, t.i,
        |          coalesce(v.p, 0.5 / (SELECT total FROM tot)) AS p,
        |          CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS is_oov
        |         FROM tk t LEFT JOIN vocab v ON t.tok = v.tok),
        | agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |          CAST(SUM(is_oov) AS BIGINT) AS oov,
        |          MIN(p) AS min_p,
        |          list(p ORDER BY i) AS ps
        |         FROM per GROUP BY doc_id)
        |SELECT doc_id, n_tokens, oov, min_p,
        |  list_reduce(ps, (a, b) -> a + b) / CAST(n_tokens AS DOUBLE) AS mean_p,
        |  (list_reduce(ps, (a, b) -> a + b) / CAST(n_tokens AS DOUBLE) >= 0.01) AS keep
        |FROM agg ORDER BY doc_id""".stripMargin,
    /* q154: hash16('dsir:'||tok) % 512 bucketing, Laplace bucket models
     * from the en/non-en split, one IEEE multiply-then-divide per bucket
     * ratio, position-ordered product fold (init 1.0 ≡ list_reduce). */
    "q154_dsir_weights" -> {
      val h16 = (0 until 4).map { i =>
        val shift = math.pow(16, 3 - i).toInt
        s"(strpos('0123456789abcdef', substring(md5('dsir:' || tok), ${i + 1}, 1)) - 1) * $shift"
      }.mkString(" + ")
      s"""WITH d AS (SELECT doc_id, lang = 'en' AS tgt,
        |             string_split(text, ' ') AS toks FROM documents),
        | f AS (SELECT doc_id, tgt, i, ($h16) % 512 AS f
        |       FROM (SELECT doc_id, tgt, unnest(toks) AS tok,
        |               generate_subscripts(toks, 1) AS i FROM d)),
        | tc AS (SELECT f, COUNT(*) AS ct FROM f WHERE tgt GROUP BY f),
        | rc AS (SELECT f, COUNT(*) AS cr FROM f WHERE NOT tgt GROUP BY f),
        | tot AS (SELECT (SELECT COALESCE(SUM(ct), 0) FROM tc) AS nt,
        |                (SELECT COALESCE(SUM(cr), 0) FROM rc) AS nr),
        | st AS (SELECT COALESCE(tc.f, rc.f) AS f,
        |          COALESCE(ct, 0) AS ct, COALESCE(cr, 0) AS cr
        |        FROM tc FULL JOIN rc ON tc.f = rc.f),
        | sr AS (SELECT f, CAST(ct + 1 AS DOUBLE) * CAST(nr + 512 AS DOUBLE)
        |               / (CAST(cr + 1 AS DOUBLE) * CAST(nt + 512 AS DOUBLE)) AS r
        |        FROM st, tot),
        | per AS (SELECT f.doc_id, f.i, sr.r
        |         FROM f JOIN sr USING (f) WHERE NOT f.tgt),
        | agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |           MIN(r) AS min_ratio, list(r ORDER BY i) AS rs
        |         FROM per GROUP BY doc_id)
        |SELECT doc_id, n_tokens, min_ratio,
        |  list_reduce(rs, (a, b) -> a * b) AS weight,
        |  (list_reduce(rs, (a, b) -> a * b) >= 1.0) AS keep
        |FROM agg ORDER BY doc_id""".stripMargin
    },
    /* q155: the q153 rule chain carried through `source`, one GROUP BY
     * rollup — failure rates per rule and the majority-keep decision as
     * integer cross-multiplications. */
    "q155_domain_quality" ->
      s"""${gopherCteSql("source")}
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(1 - pass_words) * 10000 // COUNT(*) AS BIGINT) AS fail_words_bp,
        |  CAST(SUM(1 - pass_mwl) * 10000 // COUNT(*) AS BIGINT) AS fail_mwl_bp,
        |  CAST(SUM(1 - pass_symbol) * 10000 // COUNT(*) AS BIGINT) AS fail_symbol_bp,
        |  CAST(SUM(1 - pass_lines) * 10000 // COUNT(*) AS BIGINT) AS fail_lines_bp,
        |  CAST(SUM(1 - pass_alpha) * 10000 // COUNT(*) AS BIGINT) AS fail_alpha_bp,
        |  CAST(SUM(1 - pass_stop) * 10000 // COUNT(*) AS BIGINT) AS fail_stop_bp,
        |  CAST(SUM(pass_words * pass_mwl * pass_symbol * pass_lines
        |           * pass_alpha * pass_stop) * 10000 // COUNT(*) AS BIGINT) AS keep_bp,
        |  CAST(CASE WHEN 2 * SUM(pass_words * pass_mwl * pass_symbol * pass_lines
        |           * pass_alpha * pass_stop) >= COUNT(*) THEN 1 ELSE 0 END AS INTEGER) AS domain_keep
        |FROM f GROUP BY source ORDER BY source""".stripMargin,
    /* q153: all six rule bases recomputed relationally; thresholds are the
     * same integer cross-multiplications, flags INT 0/1. */
    "q153_gopher_rules" ->
      s"""${gopherCteSql()}
        |SELECT *, CAST(pass_words * pass_mwl * pass_symbol * pass_lines
        |               * pass_alpha * pass_stop AS INTEGER) AS keep
        |FROM f ORDER BY doc_id""".stripMargin,
    /* q151: equi-width prefix buckets against the min/max row, per-bucket
     * token totals, per-type MIN(bucket) as first appearance, window
     * cumsum over the 10 bucket rows — all exact integers. */
    "q151_vocab_growth" ->
      """WITH b AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM documents),
        | d AS (SELECT LEAST(9, CAST((doc_id - b.lo) * 10 AS BIGINT) // (b.hi - b.lo + 1)) AS bucket,
        |         text
        |       FROM documents, b),
        | t AS (SELECT bucket, unnest(string_split(text, ' ')) AS tok FROM d),
        | pb AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_tokens FROM t GROUP BY bucket),
        | ft AS (SELECT tok, MIN(bucket) AS bucket FROM t GROUP BY tok),
        | nt AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS new_types FROM ft GROUP BY bucket),
        | j AS (SELECT pb.bucket, pb.n_tokens, COALESCE(nt.new_types, 0) AS new_types
        |       FROM pb LEFT JOIN nt USING (bucket)),
        | c AS (SELECT bucket, n_tokens, new_types,
        |         CAST(SUM(n_tokens) OVER (ORDER BY bucket
        |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
        |         CAST(SUM(new_types) OVER (ORDER BY bucket
        |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_types
        |       FROM j)
        |SELECT bucket, n_tokens, new_types, cum_tokens, cum_types,
        |  CAST((CAST(cum_types AS HUGEINT) * 10000)
        |       // GREATEST(cum_tokens, 1) AS BIGINT) AS type_token_bp
        |FROM c ORDER BY bucket""".stripMargin,
    "q78_token_vocab" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
        | c AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM t GROUP BY token),
        | r AS (SELECT token, cnt,
        |   CAST(row_number() OVER (ORDER BY cnt DESC, token ASC) AS BIGINT) AS rank,
        |   -- HUGEINT window sum cast back (driver hash is dtype-sensitive)
        |   CAST(SUM(cnt) OVER (ORDER BY cnt DESC, token ASC
        |                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_count,
        |   CAST(SUM(cnt) OVER () AS BIGINT) AS total
        | FROM c)
        |SELECT rank, token, cnt, cum_count,
        |  CAST(cum_count AS DOUBLE) / CAST(total AS DOUBLE) AS coverage
        |FROM r WHERE rank <= 100 ORDER BY rank""".stripMargin,
    "q66_heavy_hitters" ->
      """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents),
        | c AS (SELECT source, token, COUNT(*) AS cnt FROM t GROUP BY 1, 2),
        | r AS (SELECT source, token, cnt,
        |         CAST(row_number() OVER (PARTITION BY source ORDER BY cnt DESC, token ASC) AS BIGINT) AS rk
        |       FROM c)
        |SELECT source, token, cnt, rk FROM r WHERE rk <= 5
        |ORDER BY source, rk""".stripMargin,
    "q27_text_quality" ->
      s"""WITH b AS (SELECT doc_id, text, string_split(text, ' ') AS toks, length(text) AS nc FROM documents),
         | m AS (SELECT doc_id, len(toks) AS nt,
         |   CAST(nc - (len(toks) - 1) AS DOUBLE) / greatest(len(toks), 1) AS avg_tok,
         |   CAST(length(regexp_replace(text, '[a-z ]', '', 'g')) AS DOUBLE) / greatest(nc, 1) AS nonalpha,
         |   CAST(len(list_filter(toks, t -> t IN ($stopIn))) AS DOUBLE) / greatest(len(toks), 1) AS stop_r
         | FROM b)
         |SELECT doc_id, nt AS n_tokens,
         |  round(avg_tok, 4) AS avg_tok_len,
         |  round(nonalpha, 4) AS nonalpha_ratio,
         |  round(stop_r, 4) AS stopword_ratio,
         |  0.4 * (1.0 - nonalpha) + 0.3 * least(CAST(nt AS DOUBLE) / 100.0, 1.0) + 0.3 * least(stop_r * 5.0, 1.0) AS quality
         |FROM m ORDER BY doc_id""".stripMargin,
    "q28_token_count" ->
      s"""SELECT doc_id,
         |  len(string_split(text, ' ')) AS ws_tokens,
         |  CAST(len(regexp_extract_all(text, '${TextOps.ReTokenPattern}')) AS BIGINT) AS re_tokens,
         |  round(CAST(length(text) AS DOUBLE) / greatest(len(regexp_extract_all(text, '${TextOps.ReTokenPattern}')), 1), 4) AS chars_per_token
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q29_lang_id" -> {
      val ratios = TextOps.LangMarkers.map { case (lang, words) =>
        val in = words.map(w => s"'$w'").mkString(", ")
        s"CAST(len(list_filter(toks, t -> t IN ($in))) AS DOUBLE) / greatest(len(toks), 1) AS r_$lang"
      }.mkString(",\n   ")
      s"""WITH b AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         | m AS (SELECT doc_id,
         |   $ratios
         | FROM b)
         |SELECT doc_id,
         |  round(r_en, 4) AS s_en, round(r_es, 4) AS s_es, round(r_de, 4) AS s_de,
         |  CASE WHEN r_en >= 0.01 AND r_en >= r_es AND r_en >= r_de THEN 'en'
         |       WHEN r_es >= 0.01 AND r_es >= r_de THEN 'es'
         |       WHEN r_de >= 0.01 THEN 'de'
         |       ELSE 'unknown' END AS lang_pred
         |FROM m ORDER BY doc_id""".stripMargin
    },
    "q57_tfidf_topk" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        | tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY doc_id, term),
        | dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
        | n AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents),
        | s AS (SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
        |         CAST(tf.tf AS DOUBLE) * ln(nd / df) AS tfidf
        |       FROM tf JOIN dfq USING (term), n),
        | r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
        |       FROM s)
        |SELECT doc_id, term, tf, df, CAST(rk AS BIGINT) AS rk
        |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    /* q163: the BM25 formula token-for-token as the Spark tree — every
     * division/multiply correctly rounded on exact-integer inputs, avgdl
     * from INTEGER totals (tok / n), constants folded the same way
     * ((1.2 + 1.0), (1.0 - 0.75)); only ln differs in the last ulp, so
     * the rank is emitted, never the raw score (the q57 discipline). */
    "q163_bm25_topk" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        | tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY doc_id, term),
        | dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
        | dls AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl FROM documents),
        | tot AS (SELECT CAST(count(*) AS DOUBLE) AS n, CAST(sum(dl) AS DOUBLE) AS tok FROM dls),
        | s AS (SELECT tf.doc_id, tf.term, tf.tf, dfq.df, dls.dl,
        |         ln(1.0 + (n - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5)) *
        |         ((CAST(tf AS DOUBLE) * (1.2 + 1.0)) /
        |          (CAST(tf AS DOUBLE) + 1.2 * ((1.0 - 0.75) +
        |            0.75 * (CAST(dl AS DOUBLE) / (tok / n))))) AS bm25
        |       FROM tf JOIN dfq USING (term) JOIN dls USING (doc_id), tot),
        | r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY bm25 DESC, term) AS rk
        |       FROM s)
        |SELECT doc_id, term, tf, df, dl, CAST(rk AS BIGINT) AS rk
        |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    "q59_inverted_index" ->
      """WITH t0 AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        | t AS (SELECT DISTINCT doc_id, term FROM t0),
        | idx AS (SELECT term, CAST(count(*) AS BIGINT) AS df,
        |           array_to_string((list(doc_id ORDER BY doc_id))[1:10], ',') AS postings_sample
        |         FROM t GROUP BY term)
        |SELECT term, df, postings_sample FROM idx ORDER BY term""".stripMargin,
    "q62_corpus_stats" ->
      """SELECT source,
        |  CAST(floor(n_chars / 100) * 100 AS BIGINT) AS char_bucket,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
        |  min(n_chars) AS min_chars,
        |  max(n_chars) AS max_chars,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
        |FROM documents
        |GROUP BY source, floor(n_chars / 100) * 100
        |ORDER BY source, char_bucket""".stripMargin
  )
}
