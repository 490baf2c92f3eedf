package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level text operators for training-data pipelines: fixed-size token
  * chunking with overlap, TF-IDF term scoring, and inverted-index builds.
  *
  * Scale shapes: chunking is a pure map-side explode (no shuffle — each
  * document expands independently); TF-IDF is one map-side-combinable
  * (doc, term) count plus a VOCABULARY-sized document-frequency side that
  * broadcasts; the inverted index bounds its per-term state with the
  * [[TopKAggregator]] so a stopword's posting list never materializes
  * O(corpus) rows in one aggregation buffer.
  */
object Corpus {

  /** Split each document into fixed-size token chunks with overlap — the
    * context-window preparation step of a training pipeline (and the unit
    * RAG ingestion runs per document). Chunk c covers tokens
    * [c·stride, c·stride + chunkSize); starts run while start < n_tokens,
    * so every token is covered and the tail chunk may be short. Pure
    * map-side: tokenization, `sequence` of starts, one explode, `slice` —
    * no shuffle, no UDF; a 100 TB corpus chunks at scan speed. */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
                     chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1 && stride >= 1, s"chunkSize/stride must be >= 1")
    val chunk = slice(col("_toks"), col("start_tok") + 1, lit(chunkSize))
    docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("_toks"))
      .withColumn("start_tok",
        explode(sequence(lit(0), greatest(size(col("_toks")) - 1, lit(0)), lit(stride))))
      .select(
        col(idCol),
        (col("start_tok") / stride).cast("long").as("chunk_id"),
        col("start_tok").cast("long").as("start_tok"),
        size(chunk).cast("long").as("chunk_len"),
        concat_ws(" ", chunk).as("chunk_text"))
  }

  /** Span-level exact deduplication with document reconstruction (the
    * Lee et al. 2021 "Deduplicating Training Data" repeated-substring screen,
    * at non-overlapping span granularity): split every document into
    * fixed-size token spans, keep only each span's FIRST corpus occurrence
    * (ascending (doc, position) order), and stitch the survivors back into a
    * deduplicated document. Catches the cross-document boilerplate that
    * document-level fingerprints ([[Dedup.exactDupGroups]]) miss entirely.
    *
    * Scale shape: spans explode map-side ([[chunkDocuments]] with
    * stride = chunkSize, so volume ≈ corpus tokens); first-occurrence is one
    * map-side-combinable MIN keyed on the span text (a 100 TB corpus would
    * key on a 16-byte span hash instead — same plan); the keep-join shuffles
    * on the same key; reconstruction is one per-doc aggregation whose state
    * is the document's own surviving spans. No window, no collect, nothing
    * all-pairs. Docs that lose every span surface with kept_spans = 0 and
    * empty text — the caller's drop signal. */
  def spanDedup(docs: DataFrame, idCol: String, textCol: String,
                spanTokens: Int): DataFrame = {
    val spans = chunkDocuments(docs, idCol, textCol, spanTokens, spanTokens)
      .select(col(idCol), col("chunk_id"), col("chunk_text"))
    // first occurrence = lexicographic min of (doc, position) — struct
    // ordering gives it in one agg, map-side combinable
    val first = spans.groupBy(col("chunk_text"))
      .agg(min(struct(col(idCol), col("chunk_id"))).as("_first"))
    val kept = spans.join(first, "chunk_text")
      .filter(col(s"_first.$idCol") === col(idCol) &&
        col("_first.chunk_id") === col("chunk_id"))
    val perDoc = spans.groupBy(col(idCol)).agg(count(lit(1)).as("n_spans"))
    val keptAgg = kept.groupBy(col(idCol)).agg(
      count(lit(1)).as("kept_spans"),
      concat_ws(" ", transform(
        sort_array(collect_list(struct(col("chunk_id"), col("chunk_text")))),
        e => e.getField("chunk_text"))).as("text_deduped"))
    perDoc.join(keptAgg, Seq(idCol), "left")
      .select(col(idCol), col("n_spans"),
        coalesce(col("kept_spans"), lit(0L)).as("kept_spans"),
        coalesce(col("text_deduped"), lit("")).as("text_deduped"))
  }

  /** Token-vocabulary build with cumulative coverage — the first step of
    * tokenizer training (and the vocabulary-truncation decision it feeds):
    * corpus-wide token counts ranked by frequency (count desc, token asc),
    * each with the cumulative fraction of all token occurrences a vocabulary
    * cut at that rank would cover.
    *
    * Scale shape: ONE map-side-combinable (token → count) aggregation over
    * the exploded corpus; ranking and the running sum are windows over the
    * VOCABULARY-sized count table, never corpus rows. The window's constant
    * partition key is non-foldable (`substring(token, 0, 0)` — the optimizer
    * strips foldable keys, recreating the unpartitioned-window warning; see
    * q63) — the vocabulary is one partition by design, bounded by |vocab|,
    * and a sharded two-level rank is the escape hatch if a real corpus's
    * vocabulary ever outgrows one partition. */
  /** Vocabulary-growth (Heaps'-law) audit — the corpus-scaling measurement
    * behind tokenizer and vocabulary-size planning (Heaps, "Information
    * Retrieval: Computational and Theoretical Aspects", 1978: distinct
    * type count grows as V(N) ≈ K·N^β, β ≈ 0.4–0.6 for natural text):
    * docs are split into `buckets` equal-width id ranges forming corpus
    * PREFIXES, and each prefix reports cumulative token and type counts —
    * the curve a vocab-size decision (or a dedup health check: duplicated
    * corpora flatten it) reads directly, kept in exact integers
    * (`type_token_bp` instead of a transcendental β fit).
    *
    * Scale shape: bucket assignment is a map-only expression against a
    * broadcast 1-row min/max frame (equi-width on the id — NOT ntile,
    * whose global row_number would funnel the corpus through one task).
    * The corpus is scanned ONCE: a single map-side-combined (type, bucket)
    * count is the only corpus-scale shuffle, and it is cached — it is
    * vocabulary×buckets-sized — so both derived views (per-bucket token
    * totals, per-TYPE first bucket) read the materialized frame instead of
    * re-tokenizing 100 TB. The cumulative pass runs on the `buckets`-row
    * result under the non-foldable constant-key window (the [[tokenVocab]]
    * convention). A type counts as NEW in the first prefix bucket that
    * contains it — min(bucket) per type — so cum_types over bucket b is
    * exactly |types(prefix b)| with no per-prefix re-scan. */
  def vocabGrowth(docs: DataFrame, idCol: String, textCol: String,
                  buckets: Int = 10): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val bounds = docs.agg(min(col(idCol)).as("_lo"), max(col(idCol)).as("_hi"))
    val toks = docs.crossJoin(broadcast(bounds))
      .withColumn("bucket", least(lit(buckets - 1),
        expr(s"CAST(($idCol - _lo) * $buckets AS BIGINT) div (_hi - _lo + 1)")))
      .select(col("bucket"),
        explode(TextOps.tokens(col(textCol))).as("_tok"))
    val typeBucket = toks.groupBy(col("_tok"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .cache() // vocabulary×buckets-sized; input of both derived views
    val perBucket = typeBucket.groupBy(col("bucket"))
      .agg(sum(col("cnt")).as("n_tokens"))
    val newTypes = typeBucket.groupBy(col("_tok"))
      .agg(min(col("bucket")).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("new_types"))
    val one = substring(col("bucket").cast("string"), 0, 0)
    val w = Window.partitionBy(one).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBucket.join(newTypes, Seq("bucket"), "left")
      .withColumn("new_types", coalesce(col("new_types"), lit(0L)))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("cum_types", sum(col("new_types")).over(w))
      .withColumn("type_token_bp", expr(
        "CAST(cum_types AS DECIMAL(38,0)) * 10000 div greatest(cum_tokens, 1)")
        .cast("bigint"))
      .select(col("bucket"), col("n_tokens"), col("new_types"),
        col("cum_tokens"), col("cum_types"), col("type_token_bp"))
  }

  def tokenVocab(docs: DataFrame, textCol: String, topK: Int): DataFrame = {
    val counts = docs
      .select(explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val one = substring(col("token"), 0, 0)
    val w = Window.partitionBy(one).orderBy(col("cnt").desc, col("token").asc)
    counts
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_count", sum(col("cnt")).over(
        Window.partitionBy(one).orderBy(col("cnt").desc, col("token").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum(col("cnt")).over(Window.partitionBy(one)))
      .filter(col("rank") <= topK)
      .select(col("rank"), col("token"), col("cnt"),
        col("cum_count"),
        (col("cum_count").cast("double") / col("total").cast("double"))
          .as("coverage"))
  }

  /** Unigram-LM quality scoring — the exact-arithmetic core of a
    * CCNet-style language-model filter: fit a unigram model on the corpus
    * (top-`topK` tokens by frequency, probability = count/total; everything
    * else scores an out-of-vocabulary floor of `oovPseudoCount`/total),
    * then score each document by its mean and min token probability.
    * Real perplexity filters use logprobs from a trained LM; this keeps the
    * identical dataflow with probabilities summed in DOCUMENT ORDER (left
    * fold over the token array), so every double is bit-reproducible across
    * engines — no `ln` in sight (libm `log` differs in the last ulp across
    * implementations).
    *
    * Scale shape: one map-side-combinable (token → count) aggregation; the
    * top-K vocabulary COLLECTS (bounded by `topK` — the same justified
    * collect as IVF centroids) and ships as a map literal, so scoring is a
    * pure map-side projection over each document's own token array — no
    * explode, no join, no shuffle on the corpus path. The per-row lambda
    * HOFs evaluate interpreted; at ~100-token documents they are far from
    * the q55-kernel regime, and a fused kernel is the known escape hatch. */
  def unigramLmScore(docs: DataFrame, idCol: String, textCol: String,
                     topK: Int, oovPseudoCount: Double = 0.5,
                     keepThreshold: Double = 0.01): DataFrame = {
    val counts = docs
      .select(explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt"))).head().getLong(0)
    val vocab = counts.orderBy(col("cnt").desc, col("token").asc)
      .limit(topK).collect()
      .map(r => (r.getString(0), r.getLong(1).toDouble / total.toDouble))
    val pMap = map(vocab.flatMap { case (t, p) => Seq(lit(t), lit(p)) }: _*)
    val floorP = oovPseudoCount / total.toDouble
    val ps = transform(col("_toks"),
      t => coalesce(element_at(pMap, t), lit(floorP)))
    docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("_toks"))
      .withColumn("_ps", ps)
      .select(col(idCol),
        size(col("_toks")).cast("long").as("n_tokens"),
        size(filter(col("_toks"), t => element_at(pMap, t).isNull))
          .cast("long").as("oov"),
        array_min(col("_ps")).as("min_p"),
        (aggregate(col("_ps"), lit(0.0d), (acc, x) => acc + x) /
          size(col("_toks")).cast("double")).as("mean_p"))
      .withColumn("keep", col("mean_p") >= keepThreshold)
  }

  /** Bigram-LM document scoring — the stronger member of the CCNet-style
    * perplexity-filter family above [[unigramLmScore]]: per document, the
    * mean and min of Laplace-smoothed conditional bigram probabilities
    *
    *   p(w2 | w1) = (c(w1,w2) + 1) / (c(w1,·) + V)
    *
    * with counts from the corpus itself and V its distinct-token count —
    * repetitive or template documents score near their own mass, incoherent
    * token soup scores near the 1/(c+V) floor. Every number is exact:
    * integer counts, one IEEE division per bigram, per-doc sums folded in
    * POSITION order (0.0 + p1 ≡ p1, so Spark's zero-init fold equals
    * DuckDB's init-free list_reduce — the q81 identity).
    *
    * Scale shape: bigram stats are a corpus-bounded TYPE table (Heaps-ish),
    * kept distributed — one (w1,w2) count shuffle, one w1 count shuffle,
    * an equi-join of doc bigrams against the stats (never broadcast: the
    * bigram table outgrows any literal map), and one doc-keyed fold. Every
    * doc bigram exists in the corpus counts by construction, so the join
    * is inner with no OOV branch. */
  def bigramLmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val pairs = docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("_toks"))
      .filter(size(col("_toks")) >= 2)
      .select(col(idCol), posexplode(expr(
        "transform(sequence(1, size(_toks) - 1), " +
          "i -> named_struct('w1', element_at(_toks, i), " +
          "'w2', element_at(_toks, i + 1)))")))
      .select(col(idCol), col("pos"),
        col("col.w1").as("w1"), col("col.w2").as("w2"))
    // pairs feeds three consumers UNmaterialized on purpose: the explode
    // is a cheap map over the scan, and re-running it costs less than
    // writing the exploded frame out (measured: localCheckpoint 1.62 s vs
    // recompute 1.33 s at sf0.1) — the q53 materialize-once discipline
    // applies to expensive upstreams, not map-only expansions
    val c12 = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("cnt12"))
    val c1 = pairs.groupBy(col("w1")).agg(count(lit(1)).as("cnt1"))
    val v = docs.select(explode(TextOps.tokens(col(textCol))).as("t"))
      .agg(countDistinct(col("t"))).head().getLong(0)
    pairs
      .join(c12.join(c1, Seq("w1")), Seq("w1", "w2"))
      .withColumn("_p", (col("cnt12") + 1).cast("double") /
        (col("cnt1") + v).cast("double"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), min(col("_p")).as("min_p"),
        aggregate(sort_array(collect_list(struct(col("pos"), col("_p")))),
          lit(0.0d), (acc, x) => acc + x.getField("_p")).as("_sum"))
      .select(col(idCol), col("n_bigrams"), col("min_p"),
        (col("_sum") / col("n_bigrams").cast("double")).as("mean_p"))
  }

  /** DSIR importance weights (Xie, Santurkar, Ma & Liang, "Data Selection
    * for Language Models via Importance Resampling", NeurIPS '23 — the
    * hashed-n-gram variant): rank RAW-corpus documents by how target-like
    * they are under two HASHED-feature unigram models,
    *
    *   w(doc) = Π_i  p_target(f_i) / p_raw(f_i),
    *   p(f) = (c(f) + 1) / (N + B)   (Laplace over B hash buckets),
    *
    * the importance weight DSIR resamples by (this operator ships the
    * deterministic ranking tier; pair with [[graft.ext.Sampling]]'s
    * integer priority sampling for the resampling step). Feature HASHING
    * is the scale trick that makes it tractable: statistics live in B
    * buckets — not a vocabulary — so both "models" are ≤ B-row tables
    * regardless of corpus size.
    *
    * Numerics: each per-token ratio is computed as
    * (double(c_t+1)·double(N_r+B)) / (double(c_r+1)·double(N_t+B)) —
    * fixed IEEE multiply-then-divide, exact integer inputs at test scale —
    * and the per-doc weight folds those ratios in POSITION order with init
    * 1.0 (1.0·r ≡ r, the multiplicative q81/q131 identity), so the oracle
    * matches bit-for-bit. Products of ≤ a few hundred ratios stay far
    * inside double range; the log-space form needs a transcendental ln
    * that is not bit-portable (the Efraimidis–Spirakis precedent, NOTES).
    *
    * Scale shape: one map-side explode to (doc, pos, bucket); two
    * map-side-combined BOUNDED aggregations (≤ B keys each) build the
    * models; totals ride a broadcast 1-row frame; scoring is one BROADCAST
    * join of the token stream against the ≤ B-row ratio table plus one
    * doc-keyed fold — no corpus-scale shuffle except the per-doc
    * aggregation itself. */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  isTarget: Column, buckets: Int = 512): DataFrame = {
    val feats = docs
      .select(col(idCol), isTarget.cast("boolean").as("_tgt"),
        TextOps.tokens(col(textCol)).as("_toks"))
      .select(col(idCol), col("_tgt"), posexplode(col("_toks")))
      .select(col(idCol), col("_tgt"), col("pos"),
        pmod(TextOps.hash16(concat(lit("dsir:"), col("col"))), lit(buckets)).as("_f"))
    val tgtCounts = feats.filter(col("_tgt"))
      .groupBy(col("_f")).agg(count(lit(1)).as("ct"))
    val rawCounts = feats.filter(!col("_tgt"))
      .groupBy(col("_f")).agg(count(lit(1)).as("cr"))
    val totals = tgtCounts.agg(coalesce(sum(col("ct")), lit(0L)).as("_nt"))
      .crossJoin(rawCounts.agg(coalesce(sum(col("cr")), lit(0L)).as("_nr")))
    val ratios = tgtCounts.join(rawCounts, Seq("_f"), "full")
      .select(col("_f"), coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cr"), lit(0L)).as("cr"))
      .crossJoin(broadcast(totals))
      .select(col("_f"),
        ((col("ct") + 1).cast("double") * (col("_nr") + buckets).cast("double") /
          ((col("cr") + 1).cast("double") * (col("_nt") + buckets).cast("double")))
          .as("_r"))
    feats.filter(!col("_tgt"))
      .join(broadcast(ratios), Seq("_f"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), min(col("_r")).as("min_ratio"),
        aggregate(sort_array(collect_list(struct(col("pos"), col("_r")))),
          lit(1.0d), (acc, x) => acc * x.getField("_r")).as("weight"))
      .withColumn("keep", col("weight") >= 1.0d)
  }

  /** Trigram STUPID-BACKOFF document scoring (Brants, Popat, Xu, Och &
    * Dean, EMNLP '07 — the web-scale LM smoothing built precisely for
    * MapReduce-style distributed n-gram tables, and the scoring behind
    * CCNet-style quality filtering): completes the LM-filter ladder above
    * [[unigramLmScore]] and [[bigramLmScore]] with HELD-OUT scoring — the
    * model counts come from a TRAIN corpus, the scored documents from a
    * disjoint one, so backoff actually engages (a corpus scored on its own
    * counts never backs off: every one of its n-grams has count ≥ 1).
    *
    * Per trigram position:  S(w₃|w₁w₂) = c(w₁w₂w₃)/c(w₁w₂) if the trigram
    * was seen, else 0.4·c(w₂w₃)/c(w₂), else 0.16·c(w₃)/N, else the OOV
    * floor 0.16·(0.5/N) — no normalization, no discounting (Brants' point:
    * at web scale the cheap score ranks as well as Kneser-Ney). The 0.16
    * backoff factor is the LITERAL double 0.16 in both engines (0.4·0.4
    * rounds differently). Every score is IEEE divisions/multiplies in
    * fixed order, per-doc sums fold in POSITION order (the q81/q131
    * identity), so the oracle matches bit-for-bit.
    *
    * Scale shape: the n-gram tables are corpus-bounded TYPE tables kept
    * DISTRIBUTED (the q131 discipline — a web-scale trigram table outgrows
    * any broadcast); scoring is five equi-joins of the document trigram
    * stream against them (shuffles keyed on n-gram keys; every join is
    * LEFT because held-out n-grams can be unseen) and one doc-keyed fold.
    * The only driver scalar is N, the train token count. */
  def stupidBackoffScore(train: DataFrame, score: DataFrame,
                         idCol: String, textCol: String): DataFrame = {
    def toks(df: DataFrame) = df.select(col(idCol), TextOps.tokens(col(textCol)).as("_toks"))
    def trigrams(df: DataFrame) = toks(df)
      .filter(size(col("_toks")) >= 3)
      .select(col(idCol), posexplode(expr(
        "transform(sequence(1, size(_toks) - 2), " +
          "i -> named_struct('w1', element_at(_toks, i), " +
          "'w2', element_at(_toks, i + 1), 'w3', element_at(_toks, i + 2)))")))
      .select(col(idCol), col("pos"),
        col("col.w1").as("w1"), col("col.w2").as("w2"), col("col.w3").as("w3"))
    def bigrams(df: DataFrame) = toks(df)
      .filter(size(col("_toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(_toks) - 1), " +
          "i -> named_struct('w1', element_at(_toks, i), " +
          "'w2', element_at(_toks, i + 1)))")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val unis = toks(train).select(explode(col("_toks")).as("w"))
    val c3 = trigrams(train).groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("cnt3"))
    val cb = bigrams(train).groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("cntb"))
    val cu = unis.groupBy(col("w")).agg(count(lit(1)).as("cntu"))
    val n = unis.count()
    require(n > 0, "stupidBackoffScore: empty training corpus")
    val sc = trigrams(score)
      .join(c3, Seq("w1", "w2", "w3"), "left")
      .join(cb.withColumnRenamed("cntb", "cntb12"), Seq("w1", "w2"), "left")
      .join(cb.select(col("w1").as("w2"), col("w2").as("w3"),
        col("cntb").as("cntb23")), Seq("w2", "w3"), "left")
      .join(cu.select(col("w").as("w2"), col("cntu").as("cntu2")), Seq("w2"), "left")
      .join(cu.select(col("w").as("w3"), col("cntu").as("cntu3")), Seq("w3"), "left")
      .withColumn("s",
        when(col("cnt3").isNotNull,
          col("cnt3").cast("double") / col("cntb12").cast("double"))
          .when(col("cntb23").isNotNull,
            lit(0.4) * (col("cntb23").cast("double") / col("cntu2").cast("double")))
          .when(col("cntu3").isNotNull,
            lit(0.16) * (col("cntu3").cast("double") / lit(n.toDouble)))
          .otherwise(lit(0.16) * (lit(0.5) / lit(n.toDouble))))
      .withColumn("lvl",
        when(col("cnt3").isNotNull, 3)
          .when(col("cntb23").isNotNull, 2)
          .when(col("cntu3").isNotNull, 1).otherwise(0))
    sc.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_scored"),
        sum(when(col("lvl") === 3, 1L).otherwise(0L)).as("n_tri"),
        sum(when(col("lvl") === 2, 1L).otherwise(0L)).as("n_bi"),
        sum(when(col("lvl") === 1, 1L).otherwise(0L)).as("n_uni"),
        sum(when(col("lvl") === 0, 1L).otherwise(0L)).as("n_oov"),
        min(col("s")).as("min_s"),
        aggregate(sort_array(collect_list(struct(col("pos"), col("s")))),
          lit(0.0d), (acc, x) => acc + x.getField("s")).as("_sum"))
      .select(col(idCol), col("n_scored"), col("n_tri"), col("n_bi"),
        col("n_uni"), col("n_oov"), col("min_s"),
        (col("_sum") / col("n_scored").cast("double")).as("mean_s"))
  }

  /** CCNet-style LM-quality bucketing (Wenzek et al., LREC '20: score every
    * document with a reference LM, cut the corpus at the score terciles,
    * keep "head", inspect "middle", drop "tail"): the decision layer on top
    * of [[stupidBackoffScore]] — documents are scored held-out against the
    * train corpus, assigned head/middle/tail by corpus-relative rank, and
    * rolled up per (bucket, group) with doc and scored-token volume.
    *
    * Rank WITHOUT a global sort: each mean score is snapped to an integer
    * grid key ⌊mean_s·2^gridBits⌋ (multiply + floor — exact IEEE ops on the
    * bit-portable q147 score, so the key is engine-identical); the tercile
    * cutoffs come from a HISTOGRAM of those keys, not from ordering the
    * corpus — cum·3 ≥ N and cum·3 ≥ 2N in exact integers pick the
    * thresholds. A grid cell is never split: ties on a cell land in the
    * same bucket, so bucket sizes are terciles up to cell granularity
    * (2^20 cells ≈ 10⁻⁶ score resolution — far finer than LM scores
    * cluster) and assignment is deterministic with no row_number over the
    * corpus.
    *
    * Scale shape: scoring is [[stupidBackoffScore]] (distributed n-gram
    * joins); the histogram is one map-side-combinable count bounded by
    * 2^gridBits cells; the cumulative pass runs the non-foldable
    * constant-key window over that BOUNDED table (the [[tokenVocab]]
    * convention); thresholds are a 1-row broadcast; bucket assignment is
    * map-only. No corpus-scale sort anywhere — the shape CCNet itself uses
    * (they compute cutoffs on a sample; the histogram is the exact
    * equivalent). */
  def perplexityBuckets(train: DataFrame, scoreDocs: DataFrame,
                        idCol: String, textCol: String, groupCol: String,
                        gridBits: Int = 20): DataFrame = {
    require(gridBits >= 1 && gridBits <= 30, s"gridBits in [1,30], got $gridBits")
    val grid = math.pow(2, gridBits) // exact power of two
    // persist lives only for the duration of the call (the
    // truncatedRecallAudit convention, NOT ivfTopK's): the three consumers
    // — histogram, doc total, bucket assignment — all run inside this
    // method and the output is bounded by 3·|groups| rows, so the result
    // is eagerly materialized below and the corpus-sized cache released
    // before returning. Long-lived batch drivers looping over corpora
    // therefore don't accumulate pinned MEMORY_AND_DISK frames.
    val scored = stupidBackoffScore(train, scoreDocs, idCol, textCol)
      .withColumn("key", floor(col("mean_s") * lit(grid)).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hist = scored.groupBy(col("key")).agg(count(lit(1)).as("c"))
    val one = substring(col("key").cast("string"), 0, 0)
    val cum = hist.withColumn("cum",
      sum(col("c")).over(Window.partitionBy(one).orderBy(col("key"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val total = scored.agg(count(lit(1)).as("_nd"))
    val th = cum.crossJoin(broadcast(total)).agg(
      min(when(col("cum") * 3 >= col("_nd"), col("key"))).as("_t1"),
      min(when(col("cum") * 3 >= col("_nd") * 2, col("key"))).as("_t2"))
    val out = Dedup.checkpointStripped(scored
      .join(scoreDocs.select(col(idCol), col(groupCol)), idCol)
      .crossJoin(broadcast(th))
      .withColumn("bucket",
        when(col("key") <= col("_t1"), "tail")
          .when(col("key") <= col("_t2"), "middle")
          .otherwise("head"))
      .groupBy(col("bucket"), col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_scored")).as("tok_scored"),
        min(col("key")).as("min_key"), max(col("key")).as("max_key")))
    scored.unpersist(blocking = false)
    out
  }

  /** Per-document term frequencies over whitespace tokens: one explode into
    * a map-side-combinable (doc, term) count — the shuffle carries at most
    * one row per distinct (doc, term) per input partition. */
  def termFrequencies(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))

  /** TF-IDF top-k terms per document: tf · ln(N/df), rank per doc by score
    * desc then term asc. Join shape at scale: `df` (document frequency) and
    * the scalar corpus size are VOCABULARY-sized / single-row — both
    * broadcast; the only fact-scale shuffles are the (doc, term) count and
    * the per-doc ranking window (each doc's term set is small, so no
    * single-reducer funnel). */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val tf = termFrequencies(docs, idCol, textCol)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("_n_docs"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("tfidf").desc, col("term"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf").cast("double") * log(col("_n_docs").cast("double") / col("df")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      // the raw tf·ln(N/df) double is NOT emitted: ln differs in the last
      // ulp across engines (Math.log vs libm, neither correctly rounded).
      // The RANK is engine-portable — scores collide only at identical
      // (tf, df), where the term tie-break decides
      .select(col(idCol), col("term"), col("tf"), col("df"),
        col("rk").cast("long").as("rk"))
  }

  /** Okapi BM25 top-k terms per document (Robertson & Walker SIGIR '94;
    * the Lucene `+1` idf variant so weights never go negative on
    * majority terms): completes the term-weighting pair next to
    * [[tfidfTopK]] — BM25's tf saturation and length normalization are
    * what industrial retrieval (and retrieval-based data curation)
    * actually rank with.
    *
    * score(t, d) = ln(1 + (N − df + ½)/(df + ½)) ·
    *               tf·(k₁+1) / (tf + k₁·(1 − b + b·dl/avgdl))
    *
    * Float discipline (the q57 precedent): every input to the formula is
    * an exact integer (tf, df, dl, N, Σdl < 2⁵³), each division/multiply
    * is a correctly-rounded IEEE op in a parse tree the oracle mirrors
    * token-for-token, and avgdl is derived from INTEGER totals (Σdl/N),
    * never a pre-rounded double mean. Only `ln` differs in the last ulp
    * across engines, so the raw score is NOT emitted — the RANK is, with
    * the term tie-break deciding genuine score collisions.
    *
    * Scale shape: document length joins the (doc, term) counts on the doc
    * key (fact-scale equi-join, both sides already doc-keyed); document
    * frequency is VOCABULARY-sized and the (N, Σdl) totals are one row —
    * both broadcast; the ranking window partitions per doc (bounded by a
    * doc's distinct terms). Same plan at 100 TB. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String, k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1 && k1 > 0 && b >= 0 && b <= 1,
      s"need k >= 1, k1 > 0, b in [0,1]; got k=$k k1=$k1 b=$b")
    val tf = termFrequencies(docs, idCol, textCol)
    val dl = docs.select(col(idCol),
      size(TextOps.tokens(col(textCol))).cast("long").as("dl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val totals = dl.agg(count(lit(1)).cast("double").as("_n"),
      sum(col("dl")).cast("double").as("_tok"))
    val dfd = col("df").cast("double")
    val idf = log(lit(1.0) +
      (col("_n") - dfd + lit(0.5)) / (dfd + lit(0.5)))
    val tfd = col("tf").cast("double")
    val norm = (tfd * lit(k1 + 1.0)) /
      (tfd + lit(k1) * (lit(1.0 - b) +
        lit(b) * (col("dl").cast("double") / (col("_tok") / col("_n")))))
    val w = Window.partitionBy(col(idCol)).orderBy(col("bm25").desc, col("term"))
    tf.join(dl, idCol)
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(totals))
      .withColumn("bm25", idf * norm)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("dl"),
        col("rk").cast("long").as("rk"))
  }

  /** Heavy hitters: the k most frequent whitespace tokens per group (count
    * desc, token asc tie-break) — the vocabulary-audit operator of a corpus
    * profile (boilerplate detection, stopword discovery, contamination
    * tells). Two shuffles, both benign at scale: the (group, token) count is
    * map-side-combinable, and the ranking window partitions on the group
    * over the VOCABULARY-sized count table — never over corpus rows. Exact
    * counts (no count-min sketch) keep it oracle-checkable; the sketch
    * variant only becomes necessary when per-group vocabularies stop
    * fitting a shuffle partition, which at (20 sources × word-salad) they
    * never do. */
  def heavyHitters(docs: DataFrame, groupCol: String, textCol: String,
                   k: Int): DataFrame = {
    val counts = docs
      .select(col(groupCol), explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col(groupCol), col("token")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("cnt").desc, col("token").asc)
    counts
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Corpus composition statistics: per (source, length-bucket) — document
    * count, whitespace-token volume, char min/max, and distinct-language
    * count. The profiling step that precedes any mixing/budgeting decision
    * (and the report a curation run ships with). One map-side-combinable
    * aggregation keyed on (source, bucket) — output is bounded by
    * |sources|·|buckets|, never corpus-scale; every stat is exact (no
    * approx sketches → oracle-checkable in any engine). */
  def sourceStats(docs: DataFrame, srcCol: String, textCol: String,
                  charsCol: String, langCol: String,
                  bucketWidth: Int = 100): DataFrame = {
    require(bucketWidth >= 1, "bucketWidth must be >= 1")
    docs
      .groupBy(col(srcCol),
        (floor(col(charsCol) / bucketWidth) * bucketWidth).cast("long").as("char_bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(TextOps.tokens(col(textCol))).cast("long")).as("ws_tokens"),
        min(col(charsCol)).as("min_chars"),
        max(col(charsCol)).as("max_chars"),
        countDistinct(col(langCol)).as("n_langs"))
  }

  /** Inverted index over the corpus: per term, document frequency and the
    * first `sampleK` postings (ascending doc id, comma-joined). Posting
    * lists of stopword-frequency terms are O(corpus), so the postings
    * sample aggregates through the bounded [[TopKAggregator]] (map-side
    * partials capped at k entries per term) — the shuffle carries
    * O(vocabulary · k) rows, never a full posting list. */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    sampleK: Int): DataFrame =
    docs.select(col(idCol), explode(array_distinct(TextOps.tokens(col(textCol)))).as("term"))
      .groupBy(col("term"))
      .agg(
        count(lit(1)).as("df"),
        // min-k ids via top-k on score = -id
        TopK.topKAgg(sampleK)(col(idCol), -col(idCol).cast("double")).as("_top"))
      .select(col("term"), col("df"),
        concat_ws(",", transform(col("_top"), e => e.getField("id").cast("string")))
          .as("postings_sample"))
}
