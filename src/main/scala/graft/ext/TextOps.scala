package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language-ID heuristics, fingerprinting.
  *
  * All pure Column expressions (no UDFs) — whole-stage-codegen-friendly and
  * pushdown-transparent, so they run map-side with zero shuffle at any scale.
  */
object TextOps {

  /** Whitespace tokenization (single-space corpus; use [[reTokenCount]] for a
    * regex lexer over arbitrary text). */
  def tokens(c: Column): Column = split(c, " ")

  /** Lowercase, collapse internal whitespace, trim — canonical form for
    * fingerprinting and exact dedup. */
  def normalize(c: Column): Column = trim(regexp_replace(lower(c), "\\s+", " "))

  /** Content fingerprint: md5 of the normalized text. Engine-portable (hex
    * lowercase) — used as the exact-dedup grouping key. */
  def fingerprintMd5(c: Column): Column = md5(normalize(c).cast("binary"))

  /** Deterministic 16-bit hash of a string: integer value of the first 4 hex
    * chars of md5. Portable across engines (DuckDB side reconstructs it with
    * strpos arithmetic), used by SimHash and the multimodal feature stub. */
  def hash16(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 4), 16, 10).cast("int")

  /** BPE-ish lexer token count: alpha runs, digit runs, or single non-space
    * symbols. */
  val ReTokenPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  def reTokenCount(c: Column): Column = regexp_count(c, lit(ReTokenPattern))

  /** Fraction of tokens found in `words` (e.g. a stopword list); null-safe via
    * greatest(1, n). */
  def tokenSetRatio(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")

  /** Marker word lists for the language-ID heuristic. The corpus vocabulary is
    * English-ish; the non-English lists exercise the argmax machinery. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "or", "and", "fast", "slow"),
    "es" -> Seq("el", "la", "los", "datos", "y"),
    "de" -> Seq("der", "die", "das", "und", "nicht")
  )

  /** Per-language marker-ratio scores, aligned with [[langPredict]]. */
  def langScores(toks: Column): Seq[(String, Column)] =
    LangMarkers.map { case (lang, words) => lang -> tokenSetRatio(toks, words) }

  /** Argmax over [[langScores]] with a fixed priority-order tie-break and an
    * `unknown` floor at minScore. */
  def langPredict(scores: Seq[(String, Column)], minScore: Double = 0.01): Column = {
    val chain = scores.zipWithIndex.foldLeft(when(lit(false), lit("unknown"))) {
      case (acc, ((lang, s), i)) =>
        val beatsRest = scores.drop(i + 1)
          .map { case (_, other) => s >= other }
          .foldLeft(s >= minScore)(_ && _)
        acc.when(beatsRest, lit(lang))
    }
    chain.otherwise(lit("unknown"))
  }

  /** Ratio of non-[a-z ] characters — punctuation/noise proxy. */
  def nonAlphaRatio(c: Column): Column =
    length(regexp_replace(c, "[a-z ]", "")).cast("double") /
      greatest(length(c), lit(1)).cast("double")

  /** Mean token length over whitespace tokens. */
  def avgTokenLen(c: Column): Column = {
    val toks = tokens(c)
    (length(c) - (size(toks) - 1)).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** Composite document-quality score in [0,1]: clean characters, reasonable
    * length, natural stopword density. Deterministic double arithmetic —
    * mirrored verbatim in the DuckDB oracle. */
  def qualityScore(c: Column, stopwords: Seq[String] = Seq("the", "a", "or", "and", "of")): Column = {
    val toks = tokens(c)
    lit(0.4) * (lit(1.0) - nonAlphaRatio(c)) +
      lit(0.3) * least(size(toks).cast("double") / 100.0, lit(1.0)) +
      lit(0.3) * least(tokenSetRatio(toks, stopwords) * 5.0, lit(1.0))
  }

  /** fastText-style hashed linear classifier margin (Joulin et al. '17
    * "Bag of Tricks": word unigrams + bigrams, feature hashing into a
    * fixed bucket space, a linear layer — the architecture behind the
    * CCNet/LLaMA quality and language filters). The model here is the
    * DETERMINISTIC-fake convention of the multimodal tier: features hash
    * into 65,536 buckets via the first 4 md5 hex chars (`salt:token`),
    * and each bucket's weight is a fixed integer in [-128, 127] derived
    * from md5 of the bucket key (`saltw:bucket`) — so the full scoring
    * path (tokenize → n-gram → hash → look up → sum) is real and
    * engine-exact while the learned weights are a stand-in a user swaps
    * for a trained table. All-integer arithmetic: the margin replays
    * bit-for-bit in any engine with md5.
    *
    * Scale shape: one `aggregate` fold per n-gram order over the token
    * array — pure map-side, zero per-token explode, zero shuffle; the
    * per-source rollup in [[hashedClassifierReport]] is the only
    * aggregation. */
  def hashedMargin(c: Column, salt: String = "graft-ft"): Column =
    graft.functions.HashedMargin.hashedMargin(c, salt)

  /** The relational HOF twin of [[hashedMargin]] — the specification the
    * codegen kernel is pinned against (ExtSpec kernel ≡ HOF law, the §2.8
    * convention). The kernel replaces this in the hot path: the lambda
    * here runs INTERPRETED with a full md5-hex `conv(substring(...))`
    * expression tree per n-gram (measured 3.6–5.4× slower at sf1, NOTES). */
  private[graft] def hashedMarginHof(c: Column,
                                     salt: String = "graft-ft"): Column = {
    val toks = filter(tokens(c), t => t =!= "")
    def w(t: Column): Column =
      conv(substring(md5(concat(lit(salt + "w:"),
          substring(md5(concat(lit(salt + ":"), t).cast("binary")), 1, 4))
        .cast("binary")), 1, 2), 16, 10).cast("long") - 128L
    val n1 = greatest(size(toks) - 1, lit(0))
    val bigrams = zip_with(slice(toks, lit(1), n1), slice(toks, lit(2), n1),
      (a, b) => concat(a, lit(" "), b))
    aggregate(toks, lit(0L), (acc, t) => acc + w(t)) +
      aggregate(bigrams, lit(0L), (acc, t) => acc + w(t))
  }

  /** Per-source audit of [[hashedMargin]] over a corpus: doc count,
    * positive-class count (margin > 0), and the margin sum/min/max —
    * the quality-filter calibration table a curation run quotes before
    * picking a threshold. */
  def hashedClassifierReport(docs: DataFrame, srcCol: String,
                             textCol: String): DataFrame =
    docs.select(col(srcCol).as("source"),
        hashedMargin(col(textCol)).as("_m"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("_m") > 0, 1L).otherwise(0L)).as("n_pos"),
        sum(col("_m")).as("margin_sum"),
        min(col("_m")).as("margin_min"),
        max(col("_m")).as("margin_max"))

  /** Threshold yield curve for [[hashedMargin]] — the calibration table a
    * curation run reads before picking a filter cutoff (the FineWeb-Edu
    * practice: sweep the classifier threshold, quote surviving doc/token
    * mass at each). Margins bucket by FLOOR division (binWidth-wide bins;
    * `(m − pmod(m, B)) / B` is exact floor for any sign and any B), and
    * `cum_docs`/`cum_tokens` at a row are the survivors at
    * `margin >= threshold` (the bin's lower edge) exactly. NOTE: DuckDB's
    * `//` TRUNCATES toward zero on negatives (measured, r15 — the q183
    * clamp only masked it); the oracle floors with the same
    * nonneg-remainder construction.
    *
    * Scale shape: margin + token count are one map-side pass; the bin
    * aggregate is map-side combined onto a margin-range-bounded key; the
    * cumulative sums ride the constant-key window over the BOUNDED bin
    * frame (never the corpus). */
  def classifierYieldCurve(docs: DataFrame, textCol: String,
                           binWidth: Long = 256L): DataFrame = {
    require(binWidth >= 1, s"binWidth must be >= 1, got $binWidth")
    val toks = filter(tokens(col(textCol)), t => t =!= "")
    // `div`, never `/` (the histogramDrift rule): Spark's `/` on longs is
    // DOUBLE division — exact only below 2^53. The numerator is an exact
    // multiple of binWidth (nonneg pmod subtracted), so integral `div`
    // (truncating) IS floor here, for every long.
    val binned = docs
      .select(hashedMargin(col(textCol)).as("_m"),
        size(toks).cast("long").as("_t"))
      .select(expr(s"(_m - pmod(_m, ${binWidth}L)) div ${binWidth}L")
        .as("_bin"), col("_t"))
      .groupBy(col("_bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_t")).as("n_tokens"))
    val one = substring(col("_bin").cast("string"), 0, 0)
    val wDesc = Window.partitionBy(one).orderBy(col("_bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    binned
      .withColumn("cum_docs", sum(col("n_docs")).over(wDesc))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(wDesc))
      .select((col("_bin") * binWidth).as("threshold"),
        col("n_docs"), col("n_tokens"), col("cum_docs"), col("cum_tokens"))
  }

  /** Per-source quality cap (RefinedWeb/DataComp practice: cap each
    * domain's contribution so one huge low-quality source cannot dominate
    * the mixture — keep the TOP `k` docs per source by [[hashedMargin]],
    * ids breaking exact ties). The output is the per-source audit: total
    * and kept doc/token mass plus `threshold_margin`, the effective
    * cutoff the cap realized (min kept margin — the number that tells a
    * reader how deep into the quality distribution the cap reached).
    *
    * Scale shape: the rank-filter compiles to Spark's WindowGroupLimit
    * pushdown (pinned in PlanShapeSpec) — each task keeps only its local
    * top-k per source BEFORE the window exchange, so the shuffle carries
    * O(tasks · k) rows per source, never the corpus. Totals come from a
    * SECOND, margin-free scan: aggregating the ranked frame instead
    * would force every row through the window and forfeit the pushdown —
    * the deliberate two-scan trade, both map-side combined onto the
    * bounded source key. */
  def domainQualityCap(docs: DataFrame, srcCol: String, idCol: String,
                       textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = filter(tokens(col(textCol)), t => t =!= "")
    val w = Window.partitionBy(col("source"))
      .orderBy(col("_m").desc, col("_id").asc)
    val kept = docs
      .select(col(srcCol).as("source"), col(idCol).cast("long").as("_id"),
        hashedMargin(col(textCol)).as("_m"), size(toks).cast("long").as("_t"))
      .withColumn("_r", row_number().over(w))
      .filter(col("_r") <= k)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("_t")).as("tokens_kept"),
        min(col("_m")).as("threshold_margin"))
    val totals = docs
      .select(col(srcCol).as("source"), size(toks).cast("long").as("_t"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_t")).as("tokens_total"))
    totals.join(kept, Seq("source"))
      .select(col("source"), col("n_docs"), col("tokens_total"),
        col("n_kept"), col("tokens_kept"), col("threshold_margin"))
  }

  /** C4-style line-level boilerplate filter: split a document on newlines and
    * keep only lines that look like prose — at least `minWords` words,
    * terminal punctuation (`.`/`!`/`?`) when `requireTerminal`, and no
    * blocklisted boilerplate phrase (case-insensitive). Returns the ARRAY of
    * kept lines so callers can count, rejoin, or explode.
    *
    * Scale shape: a pure per-row Column expression — map-only at any scale.
    * Word counting is `regexp_count('[^ ]+')` (not split+size) so empty and
    * multi-space lines count identically in every engine. The HOF lambda
    * runs interpreted, but per LINE, not per token — documents have few
    * lines, so this stays off the kernel-rewrite list (see NOTES on hot
    * HOFs). */
  def lineFilter(text: Column, minWords: Int, blocklist: Seq[String],
                 requireTerminal: Boolean = true): Column =
    filter(split(text, "\n"), l => {
      val words = regexp_count(l, lit("[^ ]+")) >= minWords
      val terminal = if (requireTerminal) l.rlike("[.!?]$") else lit(true)
      val clean = blocklist
        .map(p => !lower(l).contains(lit(p)))
        .foldLeft(lit(true))(_ && _)
      words && terminal && clean
    })

  /** Gopher stopword set (Rae et al. 2021, §A1.1): a document must contain
    * at least [[GopherMinStops]] of these to pass the natural-language
    * screen. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")
  val GopherMinStops = 2

  /** Gopher document-level quality rules (Rae et al., "Scaling Language
    * Models: Methods, Analysis & Insights from Training Gopher", 2021
    * §A1.1) — the heuristic screen every major curation stack (Dolma,
    * FineWeb, RedPajama-v2) reimplements, COMPLEMENTING this library's
    * repetition signals (q54 covers the §A1.1 dup-token/top-2-gram tier)
    * and the C4 line filter (q88):
    *
    *   1. word count in [50, 100000]
    *   2. mean word length in [3, 10] characters
    *   3. symbol-to-word ratio ('#' or '...') ≤ 0.1
    *   4. < 90 % of lines bullet-started AND < 30 % ellipsis-ended
    *   5. ≥ 80 % of words contain at least one alphabetic character
    *   6. ≥ 2 of the 8 Gopher stopwords present
    *
    * Every threshold is an INTEGER CROSS-MULTIPLICATION (3n ≤ chars ≤ 10n,
    * 10·sym ≤ words, 5·alpha ≥ 4·words, …) — no division, no floats, so
    * pass/fail is bit-portable by construction; the reported `*_bp` ratio
    * columns are exact integral divisions for human reading. Pure per-row
    * expressions — map-only, NO shuffle: a 100 TB corpus screens at scan
    * speed with the predicate pushed to the reader. Tokenization is the
    * corpus convention (single-space split, empties kept — q27/q78). */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String,
                  passThrough: Seq[String] = Nil): DataFrame = {
    val t = col(textCol)
    val toks = split(t, " ")
    val lines = split(t, "\n")
    val nWords = size(toks).cast("long")
    val sumChars = aggregate(toks, lit(0L), (acc, x) => acc + length(x).cast("long"))
    val nHash = (length(t) - length(regexp_replace(t, "#", ""))).cast("long")
    val nEllSym = ((length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / 3).cast("long")
    val nSym = nHash + nEllSym
    val nAlpha = size(filter(toks, x => x.rlike("[A-Za-z]"))).cast("long")
    val nLines = size(lines).cast("long")
    val nBullet = size(filter(lines, l =>
      substring(l, 1, 1).isin("•", "-") || substring(l, 1, 2) === "* ")).cast("long")
    val nEllLine = size(filter(lines, l => l.endsWith("...") || l.endsWith("…"))).cast("long")
    val nStop = GopherStopwords
      .map(s => array_contains(toks, s).cast("int"))
      .reduce(_ + _).cast("long")
    // exact basis points: 10000·num div max(den,1) — BIGINT integral
    // division (num ≤ chars < 2^31, ×10^4 well inside BIGINT)
    def bp(num: String, den: String): Column =
      expr(s"$num * 10000 div greatest($den, 1)").cast("bigint")
    docs.select(
        (col(idCol) +: passThrough.map(col)) ++ Seq(
          nWords.as("n_words"), sumChars.as("_chars"),
          nSym.as("_sym"), nAlpha.as("_alpha"), nLines.as("_lines"),
          nBullet.as("_bullet"), nEllLine.as("_ell"), nStop.as("n_stopwords")): _*)
      .withColumn("mean_wl_x100", expr(
        "CAST(_chars AS DECIMAL(38,0)) * 100 div greatest(n_words, 1)").cast("bigint"))
      .withColumn("symbol_bp", bp("_sym", "n_words"))
      .withColumn("alpha_bp", bp("_alpha", "n_words"))
      .withColumn("bullet_bp", bp("_bullet", "_lines"))
      .withColumn("ellipsis_bp", bp("_ell", "_lines"))
      .withColumn("pass_words",
        (col("n_words") >= 50 && col("n_words") <= 100000).cast("int"))
      .withColumn("pass_mwl",
        (col("_chars") >= col("n_words") * 3 && col("_chars") <= col("n_words") * 10).cast("int"))
      .withColumn("pass_symbol", (col("_sym") * 10 <= col("n_words")).cast("int"))
      .withColumn("pass_lines",
        (col("_bullet") * 10 < col("_lines") * 9 && col("_ell") * 10 < col("_lines") * 3).cast("int"))
      .withColumn("pass_alpha", (col("_alpha") * 5 >= col("n_words") * 4).cast("int"))
      .withColumn("pass_stop", (col("n_stopwords") >= GopherMinStops).cast("int"))
      .withColumn("keep", (col("pass_words") * col("pass_mwl") * col("pass_symbol")
        * col("pass_lines") * col("pass_alpha") * col("pass_stop")).cast("int"))
      .drop("_chars", "_sym", "_alpha", "_lines", "_bullet", "_ell")
  }

  /** Domain-level quality rollup (the RefinedWeb/FineWeb move: quality
    * decisions aggregate UP from documents to their source domain, because
    * a domain whose documents mostly fail the screens is boilerplate/spam
    * at the source level and should be dropped wholesale — cheaper and
    * higher-precision than per-doc filtering alone): per domain, document
    * count, per-rule FAILURE rates and overall pass rate from
    * [[gopherRules]], all in exact basis points, plus the wholesale
    * `domain_keep` decision (majority of documents pass — the integer
    * cross-multiplication 2·passes ≥ docs).
    *
    * Scale shape: the rules are map-only ([[gopherRules]]); this adds ONE
    * map-side-combined aggregation on the domain key — bounded at
    * |domains| rows — so a 100 TB corpus rolls up in a single bounded
    * shuffle with no join anywhere. */
  def domainQuality(docs: DataFrame, domainCol: String, idCol: String,
                    textCol: String): DataFrame = {
    val rules = gopherRules(docs, idCol, textCol, passThrough = Seq(domainCol))
    def failBp(rule: String) =
      expr(s"sum(1 - $rule) * 10000 div count(1)").cast("bigint")
        .as(s"fail_${rule.stripPrefix("pass_")}_bp")
    rules.groupBy(col(domainCol))
      .agg(
        count(lit(1)).as("n_docs"),
        failBp("pass_words"), failBp("pass_mwl"), failBp("pass_symbol"),
        failBp("pass_lines"), failBp("pass_alpha"), failBp("pass_stop"),
        expr("sum(keep) * 10000 div count(1)").cast("bigint").as("keep_bp"),
        (expr("2 * sum(keep)") >= count(lit(1))).cast("int").as("domain_keep"))
  }

  /** Rolling polynomial hash over tokens: fold(h = (h*31 + hash16(tok)) mod
    * 2^31-1). Order-sensitive (true rolling fingerprint, unlike the md5 of
    * the whole text). Fused codegen kernel
    * ([[graft.functions.RollingTokenHash]]) — the `aggregate` HOF form ran
    * a full md5-hex expression tree interpreted per token. pmod ≡ plain %
    * here: every operand is non-negative. */
  /** Code-switching / language-mixture audit — the intra-document
    * granularity CCNet filters on (a document that flips language
    * mid-stream is split or dropped; fastText runs per line): documents
    * sliced into consecutive `blockWords`-word blocks (the q177
    * pseudo-paragraph unit), each block language-ID'd by INTEGER marker
    * counts (argmax with the [[langPredict]] fixed priority order on ties,
    * `unknown` when zero markers — exact integer compares, never a float
    * ratio, so the oracle replays bit-free), then per doc: block count,
    * dominant block language with its share in exact basis points, and
    * the count of distinct non-unknown block languages (≥ 2 = mixed).
    *
    * Scale shape: blocks and marker counts are map-side (list slicing +
    * HOF filters inside codegen); one (doc, lang) aggregation and one
    * doc rollup — both map-side combined. */
  def codeSwitchAudit(docs: DataFrame, idCol: String, textCol: String,
                      blockWords: Int): DataFrame = {
    val blocks = Dedup.wordBlocks(docs, idCol, textCol, blockWords)
      .select(col("doc_id"), col("block"))
    // per-language integer marker counts; rank encodes the langPredict
    // priority order (first list wins ties)
    val ranked = LangMarkers.reverse.zipWithIndex.map { case ((l, ws), i) =>
      (l, ws, (i + 1).toLong)
    }
    val counted = ranked.foldLeft(blocks) { case (df, (l, words, _)) =>
      df.withColumn(s"_c_$l", size(filter(split(col("block"), " "),
        t => words.map(t === lit(_)).reduce(_ || _))).cast("long"))
    }
    val langRank = ranked.foldLeft(lit(0L)) { case (acc, (l, _, r)) =>
      when(col(s"_c_$l") > 0L &&
        ranked.filter(_._3 > r).map { case (o, _, _) =>
          col(s"_c_$l") > col(s"_c_$o")
        }.foldLeft(lit(true).cast("boolean"))(_ && _) &&
        ranked.filter(_._3 < r).map { case (o, _, _) =>
          col(s"_c_$l") >= col(s"_c_$o")
        }.foldLeft(lit(true).cast("boolean"))(_ && _), lit(r)).otherwise(acc)
    }
    val byLang = counted.withColumn("_lr", langRank)
      .groupBy(col("doc_id"), col("_lr"))
      .agg(count(lit(1)).as("_cnt"))
    val domCase = ranked.foldLeft(when(lit(false), lit("unknown"))) {
      case (acc, (l, _, r)) => acc.when(col("_dom._lr") === r, lit(l))
    }.otherwise(lit("unknown"))
    byLang.groupBy(col("doc_id"))
      .agg(sum(col("_cnt")).as("n_blocks"),
        max(struct(col("_cnt"), col("_lr"))).as("_dom"),
        countDistinct(when(col("_lr") > 0L, col("_lr"))).as("n_langs"))
      .select(col("doc_id"), col("n_blocks"), domCase.as("dom_lang"),
        expr("10000 * _dom._cnt div n_blocks").cast("long").as("dom_bp"),
        col("n_langs").cast("long").as("n_langs"))
  }

  def rollingTokenHash(toks: Column): Column =
    graft.functions.RollingTokenHash.rollingTokenHash(toks)
}
