package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Bpe

/** Unit behavior of BPE vocabulary learning against hand-computed merge
  * sequences — including the greedy-overlap ('aaaa') and vocabulary-
  * exhaustion cases the corpus oracle can't isolate. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def merges(texts: Seq[String], rounds: Int = 8) =
    Bpe.learnMerges(texts.toDF("text"), "text", rounds, maxTypes = 50)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))

  test("greedy non-overlapping application: 'aaaa' fuses pairwise, then exhausts") {
    // word 'aaaa' ×3 docs → symbols [a,a,a,a,' ']:
    //   r1: (a,a) counted WITH overlaps (3 per word ×3 = 9); greedy
    //       application keeps candidates 1,3 → [aa,aa,' ']
    //   r2: (aa,aa)=3 ties (aa,' ')=3 → b-tie-break picks ' ' (0x20 < 'a')
    //   r3: (aa,'aa ')=3 → ['aaaa ']; r4 has no pairs → learning stops early
    val out = merges(Seq("aaaa", "aaaa", "aaaa"))
    assert(out.toSeq == Seq(
      (1L, "a", "a", "aa", 9L),
      (2L, "aa", " ", "aa ", 3L),
      (3L, "aa", "aa ", "aaaa ", 3L)))
  }

  test("highest weighted pair wins across words; marker merges learn whole words") {
    // 'to' ×5, 'ton' ×2: r1 pairs — (t,o)=7, (o,' ')=5, (o,n)=2, (n,' ')=2
    val out = merges(Seq.fill(5)("to").mkString(" ") :: List("ton ton"))
    assert(out.head == (1L, "t", "o", "to", 7L))
    // r2: (to,' ')=5 beats (to,n)=2 → 'to ' — the end-of-word unit
    assert(out(1) == (2L, "to", " ", "to ", 5L))
    // r3: only 'ton' = [to,n,' '] remains: (to,n)=2 TIES (n,' ')=2 and the
    // a-tie-break picks 'n' < 'to'; r4 then fuses the whole word
    assert(out(2) == (3L, "n", " ", "n ", 2L))
    assert(out(3) == (4L, "to", "n ", "ton ", 2L))
  }

  test("deterministic and invariant under repartitioning") {
    val docs = (0 until 60).map(i => s"spark scan ${"ab" * (i % 3 + 1)}")
    val a = Bpe.learnMerges(docs.toDF("text"), "text", 5, 50)
      .orderBy("round").collect().toSeq
    val b = Bpe.learnMerges(docs.toDF("text").repartition(13), "text", 5, 50)
      .orderBy("round").collect().toSeq
    assert(a == b)
    assert(a.size == 5)
  }

  test("type cap bounds the learning set deterministically") {
    // 'zz' is the most frequent word; with maxTypes = 1 only it survives,
    // so merges never see 'qqq'
    val docs = Seq.fill(10)("zz").mkString(" ") :: List("qqq qqq")
    val out = Bpe.learnMerges(docs.toDF("text"), "text", 3, maxTypes = 1)
      .collect().map(_.getString(3))
    assert(out.forall(m => !m.contains("q")))
  }

  test("encode kernel ≡ the HOF fold formulation (the greedy semantics the oracle replays)") {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions._
    val docs = Seq(
      "aaaa aaaa banana aaa",
      "to ton  to",  // double space → empty word contributes nothing
      "low lower lowest 😀a",
      "banana band bandana aaaa to").toDF("text")
    val merges = Bpe.learnMerges(docs, "text", 8, 50).orderBy("round")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    // reference spelling: per word, code-point symbols + sentinel, then one
    // greedy fold per merge round — after fusing, the last element is a+b
    // (strictly longer than a), so the plain fold IS non-overlapping greedy
    def round(syms: Column, a: String, b: String): Column =
      aggregate(syms, array().cast("array<string>"),
        (acc, s) => when(size(acc) > 0 &&
            element_at(acc, -1) === lit(a) && s === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(s))))
    val ref = flatten(transform(
      filter(split(col("text"), " "), w => w =!= ""),
      w => {
        val syms0 = concat(
          transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1))),
          array(lit(" ")))
        merges.foldLeft(syms0) { case (s, (a, b)) => round(s, a, b) }
      }))
    val got = docs.select(Bpe.encodeTokens(col("text"), merges).as("t"),
        ref.as("r")).collect()
    got.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("encode is reversible: concatenated tokens reproduce the words + sentinels") {
    import org.apache.spark.sql.functions._
    val docs = Seq("aaaa  banana to", "lowest band 😀a").toDF("text")
    val merges = Bpe.learnMerges(docs, "text", 6, 50).orderBy("round")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    docs.select(col("text"), Bpe.encodeTokens(col("text"), merges).as("t"))
      .collect().foreach { r =>
        val expected = r.getString(0).split(" ", -1).filter(_.nonEmpty)
          .map(_ + " ").mkString("")
        assert(r.getSeq[String](1).mkString("") == expected)
      }
  }

  test("apply ∘ learn: planted words tokenize to the trainer's final units") {
    import org.apache.spark.sql.functions._
    val docs = Seq("aaaa", "aaaa", "aaaa").toDF("text")
    val merges = Bpe.learnMerges(docs, "text", 8, 50).orderBy("round")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    def enc(s: String): Seq[String] =
      Seq(s).toDF("text")
        .select(Bpe.encodeTokens(col("text"), merges))
        .collect().head.getSeq[String](0)
    assert(enc("aaaa") == Seq("aaaa "))        // the learned whole-word unit
    assert(enc("aa") == Seq("aa "))            // r1 then the (aa,' ') merge
    assert(enc("aaab") == Seq("aa", "a", "b", " ")) // OOV tail stays atomic
  }

  test("underscore + non-BMP input round-trips: the space sentinel never collides") {
    import org.apache.spark.sql.functions._
    // literal underscores everywhere a sentinel-collision bug would bite:
    // leading/trailing/doubled, plus a non-BMP word — the symbol stream must
    // stay unambiguously decodable (split on ' ' recovers the exact words)
    val docs = Seq("__init__ snake_case_name _ a_", "_lead trail_ __ 😀_a")
      .toDF("text")
    val merges = Bpe.learnMerges(docs, "text", 8, 50).orderBy("round")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    docs.select(col("text"), Bpe.encodeTokens(col("text"), merges).as("t"))
      .collect().foreach { r =>
        val words = r.getString(0).split(" ", -1).filter(_.nonEmpty).toSeq
        val stream = r.getSeq[String](1).mkString("")
        // exact reconstruction: every word + its terminal sentinel
        assert(stream == words.map(_ + " ").mkString(""))
        // and DECODE: splitting the stream on the sentinel recovers the
        // original words even when they contain '_' (the old sentinel)
        assert(stream.split(" ", -1).dropRight(1).toSeq == words)
      }
  }

  test("non-BMP input splits on code points, not UTF-16 code units") {
    // '😀' is a surrogate pair (2 UTF-16 units, 1 code point): the word
    // '😀a' must yield symbols [😀, a, ' '] — a code-UNIT split would
    // produce lone surrogates that no other engine's character indexing
    // reproduces. r1 pairs: (😀,a)=3, (a,' ')=3 — tie on count, and the
    // CODE-POINT a-tie-break picks 'a' (0x61) < '😀' (U+1F600).
    val out = merges(Seq("😀a", "😀a", "😀a"), rounds = 2)
    assert(out.head == (1L, "a", " ", "a ", 3L))
    assert(out(1) == (2L, "\ud83d\ude00", "a ", "\ud83d\ude00a ", 3L))
  }

  test("compression curve: token count is monotone non-increasing in merge count; m=0 is the symbol stream") {
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, "low lower lowest low low"), (2L, "low slow glow lower"))
      .toDF("doc_id", "text")
    val learned = Bpe.learnMerges(docs, "text", rounds = 6, maxTypes = 50)
      .orderBy("round").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val counts = (0 to 6).map { m =>
      docs.select(Bpe.encodeTokens(col("text"), learned.take(m)).as("t"))
        .agg(sum(size(col("t")))).head().getLong(0)
    }
    // m=0: every code point + one sentinel per word
    val symbols = Seq("low lower lowest low low", "low slow glow lower")
      .map(t => t.replace(" ", "").length + t.split(" ").length).sum
    assert(counts.head == symbols.toLong)
    counts.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a, s"merge added tokens: $counts")
    }
    assert(counts.last < counts.head, "six merges must compress this corpus")
  }
}
