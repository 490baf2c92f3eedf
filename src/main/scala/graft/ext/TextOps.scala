package graft.ext

import org.apache.spark.sql.Column
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

  /** Rolling polynomial hash over tokens: fold(h = (h*31 + hash16(tok)) mod
    * 2^31-1). Order-sensitive (true rolling fingerprint, unlike the md5 of
    * the whole text). Fused codegen kernel
    * ([[graft.functions.RollingTokenHash]]) — the `aggregate` HOF form ran
    * a full md5-hex expression tree interpreted per token. pmod ≡ plain %
    * here: every operand is non-negative. */
  def rollingTokenHash(toks: Column): Column =
    graft.functions.RollingTokenHash.rollingTokenHash(toks)
}
