package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unigram-LM subword tokenizer training (Kudo, ACL '18 — the SentencePiece
  * `--model_type=unigram` algorithm; the other industrial tokenizer next to
  * BPE, and the one SentencePiece defaults to): model each piece with an
  * independent probability, segment each word with the HIGHEST-PROBABILITY
  * segmentation (Viterbi), and re-estimate piece probabilities from the
  * chosen segmentations — hard (Viterbi) EM.
  *
  * The 100 TB shape is the same industrial-trainer split as
  * [[Bpe.learnMerges]]: the corpus is scanned ONCE into the word-TYPE
  * table (Heaps-bounded), the character inventory is a second bounded
  * aggregation over that TYPE table (alphabet-bounded — never the corpus),
  * and EM runs locally over the `maxTypes`-capped collected types — R
  * synchronous distributed rounds over a vocabulary-sized table would be
  * pure scheduler latency at any scale (the measured BPE lesson, 4.3 s vs
  * milliseconds). Corpus-scale ENCODE is the separate map-side kernel
  * [[graft.functions.UnigramEncode]].
  *
  * Departures from Kudo '18, chosen for exact cross-engine replay and
  * documented here rather than hidden:
  *   - **Hard EM (Viterbi counts), not forward–backward expected counts.**
  *     The E-step assigns each word type its single best segmentation;
  *     the M-step recounts pieces from those. Forward–backward sums
  *     probabilities over ALL segmentations — an inherently
  *     association-order-sensitive float reduction that no two engines
  *     replay bit-for-bit. Viterbi keeps every arithmetic step a FIXED-
  *     ORDER IEEE chain (score' = score · p, one multiply per extension;
  *     probabilities are single divisions count/total), the q147/q154
  *     transcendental-free discipline: comparisons happen in the
  *     probability domain, so no ln/exp ever runs.
  *   - **Count-based seed and prune, not loss-based.** The seed is the
  *     `seedMulti` most frequent substrings (length 2..`maxPieceLen`,
  *     occurrence-weighted, overlaps counted) plus the full character
  *     inventory; a multi-char piece leaves the vocabulary the first EM
  *     round that uses it zero times. Kudo prunes by likelihood-loss
  *     rank; zero-usage pruning is the hard-EM analogue (an unused piece
  *     has exactly zero Viterbi likelihood contribution).
  *   - **Characters are never pruned** (Kudo's character-coverage
  *     invariant) — an unused character keeps count 1, so every corpus
  *     word stays segmentable in every round.
  *
  * Determinism contract (shared bit-for-bit by this trainer, the encode
  * kernel and the DuckDB oracle): per DP cell (pieces-used n, end
  * position j) keep the single best (score DESC, path ASC) candidate,
  * where path is the chr(1)-joined piece list compared in UTF-8 byte
  * order (= code-point order, [[Bpe.compareCodePoints]]); the word's
  * segmentation is the best cell at j = |word| across all n. Word types
  * longer than `wordLenCap` are dropped from TRAINING (the SentencePiece
  * `max_sentencepiece_length`-style bound that keeps the DP — and its
  * relational replay — a fixed 16 levels); at ENCODE time such words
  * fall back to character-wise pieces.
  */
object Unigram {

  /** Trained piece: `cnt` is the final-round usage count (floored at 1
    * for characters), `prob = cnt / Σcnt` as one exact IEEE division. */
  case class Piece(piece: String, piece_len: Int, cnt: Long, prob: Double)

  val Separator = "\u0001"

  /** Learn a unigram-LM vocabulary. Returns (vocab rows, capped types) —
    * the types ride along so callers (specs, fertility audits) can replay
    * segmentations without re-aggregating the corpus. */
  private[graft] def learnVocab(docs: DataFrame, textCol: String,
                                maxTypes: Int, maxPieceLen: Int,
                                seedMulti: Int, emRounds: Int,
                                wordLenCap: Int): (Seq[Piece], Seq[(String, Long)]) = {
    require(maxTypes >= 1 && maxPieceLen >= 2 && seedMulti >= 0 &&
      emRounds >= 1 && wordLenCap >= 1,
      s"bad unigram params: $maxTypes/$maxPieceLen/$seedMulti/$emRounds/$wordLenCap")
    import docs.sparkSession.implicits._

    // ---- the ONE corpus-scale pass: word-type table (map-side combined) ----
    val typesDF = docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

    // character inventory over the FULL type table (alphabet-bounded
    // collect): substring() indexes by code point in both engines
    val chars: Seq[(String, Long)] = typesDF
      .select(explode(sequence(lit(1), length(col("word")))).as("p"),
        col("word"), col("cnt"))
      .select(col("word").substr(col("p"), lit(1)).as("ch"), col("cnt"))
      .groupBy(col("ch")).agg(sum(col("cnt")).as("ccnt"))
      .as[(String, Long)].collect().sortBy(_._1)(utf8Ord).toSeq

    // bounded type collect: top maxTypes by (cnt DESC, word ASC), then the
    // training length cap (applied AFTER the budget, like the oracle)
    val capped: Seq[(String, Long)] = typesDF
      .orderBy(col("cnt").desc, col("word").asc).limit(maxTypes)
      .as[(String, Long)].collect().toSeq
      .filter { case (w, _) => Bpe.codePointSymbols(w).length <= wordLenCap }

    // multi-char seed candidates from the capped types, occurrence-weighted
    // (overlaps counted), top seedMulti by (cnt DESC, piece ASC)
    val multiCounts = scala.collection.mutable.Map.empty[String, Long]
    for ((w, c) <- capped) {
      val syms = Bpe.codePointSymbols(w)
      for (i <- syms.indices; l <- 2 to maxPieceLen if i + l <= syms.length) {
        val piece = syms.slice(i, i + l).mkString
        multiCounts(piece) = multiCounts.getOrElse(piece, 0L) + c
      }
    }
    val multis: Seq[(String, Long)] = multiCounts.toSeq
      .sortBy { case (p, c) => (-c, p) }(
        Ordering.Tuple2(Ordering.Long, utf8Ord)).take(seedMulti)

    val charSet = chars.map(_._1).toSet
    var vocab: Map[String, Long] = (chars ++ multis).toMap

    // ---- hard-EM rounds over the capped type table ----
    for (_ <- 1 to emRounds) {
      val total = vocab.valuesIterator.sum
      val probs: Map[String, Double] =
        vocab.map { case (p, c) => p -> c.toDouble / total.toDouble }
      val used = scala.collection.mutable.Map.empty[String, Long]
      val look: String => java.lang.Double =
        p => probs.get(p).map(java.lang.Double.valueOf).orNull
      for ((w, c) <- capped) {
        val path = viterbi(Bpe.codePointSymbols(w), look, maxPieceLen)
        for (p <- path)
          used(p) = used.getOrElse(p, 0L) + c
      }
      vocab = (chars.map { case (ch, _) =>
        ch -> math.max(used.getOrElse(ch, 0L), 1L) } ++
        used.filter { case (p, _) => !charSet.contains(p) }).toMap
    }

    val total = vocab.valuesIterator.sum
    val rows = vocab.toSeq.sortBy(_._1)(utf8Ord).map { case (p, c) =>
      Piece(p, Bpe.codePointSymbols(p).length, c, c.toDouble / total.toDouble)
    }
    (rows, capped)
  }

  /** The learned vocabulary as a DataFrame (q159's surface). */
  def learn(docs: DataFrame, textCol: String, maxTypes: Int = 50,
            maxPieceLen: Int = 4, seedMulti: Int = 120, emRounds: Int = 2,
            wordLenCap: Int = 16): DataFrame = {
    val (rows, _) = learnVocab(docs, textCol, maxTypes, maxPieceLen,
      seedMulti, emRounds, wordLenCap)
    val spark = docs.sparkSession
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(p =>
        Row(p.piece, p.piece_len, p.cnt, p.prob)), 1),
      StructType(Seq(StructField("piece", StringType, nullable = false),
        StructField("piece_len", IntegerType, nullable = false),
        StructField("cnt", LongType, nullable = false),
        StructField("prob", DoubleType, nullable = false))))
  }

  /** Character-coverage / OOV audit for a trained vocabulary — the
    * SentencePiece `--character_coverage` decision input: per group
    * (language), the raw code-point inventory of the corpus slice versus
    * the vocabulary's single-character tier. Because the trainer floors
    * every training-slice character at count 1 (never pruned), the
    * single-char tier IS the training slice's char inventory — so a
    * language scoring below 10000 bp here has characters the tokenizer
    * can only handle through the kernel's char-wise coverage escape, and
    * the bp number is exactly the occurrence mass that escape would carry.
    *
    * Columns (all exact integers): distinct chars seen / covered, char
    * occurrences total / covered, occurrence-weighted `coverage_bp`
    * (integer basis points — the `--character_coverage` number), and the
    * smallest uncovered code point (NULL when fully covered; integer min,
    * so no collation dependence).
    *
    * Scale shape: chars explode map-side off the word stream (spaces
    * excluded, the trainer's convention); the ONE shuffle keys on
    * (group, char) — an alphabet-bounded, map-side-combinable key space;
    * the covered test is a literal IN over the alphabet-bounded vocab
    * char set; the group rollup is bounded by |groups|. */
  def charCoverageAudit(docs: DataFrame, groupCol: String, textCol: String,
                        pieces: Seq[Piece]): DataFrame = {
    val covered = pieces.filter(_.piece_len == 1).map(_.piece)
    val occ = docs
      .select(col(groupCol), explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .select(col(groupCol),
        explode(sequence(lit(1), length(col("word")))).as("p"), col("word"))
      .select(col(groupCol), col("word").substr(col("p"), lit(1)).as("ch"))
      .groupBy(col(groupCol), col("ch")).agg(count(lit(1)).as("occ"))
      .withColumn("cov", col("ch").isInCollection(covered))
    occ.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_chars_distinct"),
        sum(when(col("cov"), 1L).otherwise(0L)).as("n_chars_covered"),
        sum(col("occ")).as("occ_total"),
        sum(when(col("cov"), col("occ")).otherwise(0L)).as("occ_covered"),
        min(when(!col("cov"), ascii(col("ch")).cast("long")))
          .as("min_uncovered_cp"))
      .withColumn("coverage_bp", expr("(10000 * occ_covered) div occ_total"))
  }

  /** Shared Viterbi (trainer + encode kernel): per DP cell (n pieces, end
    * j) keep the best (score DESC, path ASC in UTF-8 order) candidate;
    * return the best full path's pieces. Assumes every symbol of `syms`
    * is in the vocabulary (the character-coverage invariant); returns a
    * character-wise fallback if not (kernel-only safety escape — cannot
    * fire on the training corpus). */
  private[graft] def viterbi(syms: IndexedSeq[String],
                             lookup: String => java.lang.Double,
                             maxPieceLen: Int): Seq[String] = {
    val L = syms.length
    if (L == 0) return Nil
    // score(n)(j) / path(n)(j); n, j are 1-based, 0 = unset
    val score = Array.fill(L + 1, L + 1)(-1.0)
    val path = Array.ofDim[String](L + 1, L + 1)
    def offer(n: Int, j: Int, s: Double, p: String): Unit =
      if (score(n)(j) < 0 || s > score(n)(j) ||
        (s == score(n)(j) && Bpe.compareCodePoints(p, path(n)(j)) < 0)) {
        score(n)(j) = s; path(n)(j) = p
      }
    for (l <- 1 to math.min(maxPieceLen, L)) {
      val piece = syms.slice(0, l).mkString
      val pr = lookup(piece)
      if (pr != null) offer(1, l, pr.doubleValue, piece)
    }
    for (n <- 2 to L; i <- n - 1 until L if score(n - 1)(i) >= 0;
         l <- 1 to math.min(maxPieceLen, L - i)) {
      val piece = syms.slice(i, i + l).mkString
      val pr = lookup(piece)
      if (pr != null)
        offer(n, i + l, score(n - 1)(i) * pr.doubleValue,
          path(n - 1)(i) + Separator + piece)
    }
    var bestN = -1
    for (n <- 1 to L if score(n)(L) >= 0)
      if (bestN < 0 || score(n)(L) > score(bestN)(L) ||
        (score(n)(L) == score(bestN)(L) &&
          Bpe.compareCodePoints(path(n)(L), path(bestN)(L)) < 0)) bestN = n
    if (bestN < 0) syms // coverage escape: char-wise (cannot fire in training)
    else path(bestN)(L).split(Separator, -1).toSeq
  }

  /** UTF-8 byte order (= code-point order) — the tie-break and output
    * order every engine shares. */
  private[graft] val utf8Ord: Ordering[String] =
    (a, b) => Bpe.compareCodePoints(a, b)
}
