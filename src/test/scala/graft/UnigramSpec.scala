package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Unigram

/** Laws of the unigram-LM tokenizer (q159/q160) — the hand-computed /
  * first-principles replays next to the oracle gate. */
class UnigramSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vocabOf(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Double)] =
    df.collect().map(r => r.getString(0) -> (r.getAs[Long]("cnt"),
      r.getAs[Double]("prob"))).toMap

  test("hand-computed EM: 'ab ab ab c' — the whole-word piece absorbs its letters") {
    // types: ab(3), c(1); chars a:3 b:3 c:1; multi seed ab:3 → T0 = 10.
    // Viterbi 'ab': [ab] p=.3 beats [a][b] .09 → used ab:3, c:1; floors
    // a,b at 1 → v1 = {a:1, b:1, c:1, ab:3}, T=6; round 2 fixed point.
    val docs = Seq((1L, "ab ab ab c")).toDF("doc_id", "text")
    val v = vocabOf(Unigram.learn(docs, "text"))
    assert(v.keySet == Set("a", "b", "c", "ab"))
    assert(v("ab") == ((3L, 0.5)))
    assert(v("a") == ((1L, 1.0 / 6.0)) && v("b") == ((1L, 1.0 / 6.0)) &&
      v("c") == ((1L, 1.0 / 6.0)))
  }

  test("viterbi tie-break: equal scores resolve to the lexicographically smaller path") {
    // two 2-piece segmentations of 'abab' with IDENTICAL scores:
    // p(ab)=p same piece both halves vs p(a)p(bab)... construct equal-prob
    // vocab {ab: p, a: p, bab: p} → [ab|ab] = p² and [a|bab] = p² tie;
    // path 'abab' < 'abab' so the rule must pick [a, bab]
    val probs = Map("ab" -> 0.25, "a" -> 0.25, "bab" -> 0.25)
    val look: String => java.lang.Double =
      s => probs.get(s).map(java.lang.Double.valueOf).orNull
    val path = Unigram.viterbi(graft.ext.Bpe.codePointSymbols("abab"), look, 4)
    assert(path == Seq("a", "bab"))
  }

  test("encode kernel: round-trip, word-major order, memo-safe repeats") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val (rows, _) = Unigram.learnVocab(docs, "text", 50, 4, 120, 2, 16)
    val vocab = rows.map(p => (p.piece, p.prob))
    val enc = docs.select(col("doc_id"), col("text"),
      graft.functions.UnigramEncode.unigramEncode(col("text"), vocab).as("pieces"))
    // reversibility: concatenated pieces == the text without spaces
    val bad = enc.filter(
      array_join(col("pieces"), "") =!= regexp_replace(col("text"), " ", ""))
    assert(bad.count() == 0)
    // fertility sanity: at least one piece per word, at most one per char
    val stats = enc.select(
      size(col("pieces")).cast("long").as("np"),
      size(filter(split(col("text"), " "), w => w =!= "")).cast("long").as("nw"),
      length(regexp_replace(col("text"), " ", "")).cast("long").as("nc"))
      .agg(sum(when(col("np") < col("nw") || col("np") > col("nc"), 1L)
        .otherwise(0L)).as("viol")).head().getLong(0)
    assert(stats == 0L)
  }

  test("character coverage: every corpus character is a vocab piece with cnt >= 1") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val v = vocabOf(Unigram.learn(docs, "text"))
    val chars = docs.select(explode(split(regexp_replace(col("text"), " ", ""), ""))
      .as("ch")).filter(col("ch") =!= "").distinct().as[String].collect()
    chars.foreach { c =>
      assert(v.contains(c) && v(c)._1 >= 1L, s"char '$c' missing or zero") }
  }

  test("words beyond the trainer length cap encode character-wise") {
    val docs = Seq((1L, "ab ab supercalifragilisticexpialidocious"))
      .toDF("doc_id", "text")
    val (rows, _) = Unigram.learnVocab(docs, "text", 50, 4, 120, 2, 16)
    // the 34-char type is dropped from TRAINING (only 'ab' trains) but its
    // characters are in the inventory, so encode falls back char-wise
    val vocab = rows.map(p => (p.piece, p.prob))
    val pieces = docs.select(graft.functions.UnigramEncode
        .unigramEncode(col("text"), vocab).as("p"))
      .head().getSeq[String](0)
    assert(pieces.take(2) == Seq("ab", "ab"))
    assert(pieces.drop(2) == "supercalifragilisticexpialidocious".map(_.toString))
  }

  test("learn is invariant under repartitioning") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(Unigram.learn(docs, "text")) ==
      rows(Unigram.learn(docs.repartition(13), "text")))
  }

  test("hard-EM Viterbi likelihood is non-decreasing over rounds on the corpus") {
    // the classic Viterbi-EM guarantee, checked empirically on the real
    // corpus (the char floor + prune could in principle perturb it; this
    // pins that they don't here): Σ freq·ln(best-path score) per round.
    // ln is spec-only arithmetic — never in the operator or oracle.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def ll(emRounds: Int): Double = {
      val (rows, types) = Unigram.learnVocab(docs, "text", 50, 4, 120, emRounds, 16)
      val probs = rows.map(p => p.piece -> p.prob).toMap
      val look: String => java.lang.Double =
        s => probs.get(s).map(java.lang.Double.valueOf).orNull
      types.map { case (w, c) =>
        val path = Unigram.viterbi(graft.ext.Bpe.codePointSymbols(w), look, 4)
        c * path.map(p => math.log(probs(p))).sum
      }.sum
    }
    assert(ll(2) >= ll(1) - 1e-9)
  }
}
