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
    // word 'aaaa' ×3 docs → symbols [a,a,a,a,_]:
    //   r1: (a,a) counted WITH overlaps (3 per word ×3 = 9); greedy
    //       application keeps candidates 1,3 → [aa,aa,_]
    //   r2: (aa,aa)=3 ties (aa,_)=3 → b-tie-break picks '_' (0x5f < 'a')
    //   r3: (aa,aa_)=3 → [aaaa_]; r4 has no pairs → learning stops early
    val out = merges(Seq("aaaa", "aaaa", "aaaa"))
    assert(out.toSeq == Seq(
      (1L, "a", "a", "aa", 9L),
      (2L, "aa", "_", "aa_", 3L),
      (3L, "aa", "aa_", "aaaa_", 3L)))
  }

  test("highest weighted pair wins across words; marker merges learn whole words") {
    // 'to' ×5, 'ton' ×2: r1 pairs — (t,o)=7, (o,_)=5, (o,n)=2, (n,_)=2
    val out = merges(Seq.fill(5)("to").mkString(" ") :: List("ton ton"))
    assert(out.head == (1L, "t", "o", "to", 7L))
    // r2: (to,_)=5 beats (to,n)=2 → 'to_' — the end-of-word unit
    assert(out(1) == (2L, "to", "_", "to_", 5L))
    // r3: only 'ton' = [to,n,_] remains: (to,n)=2 TIES (n,_)=2 and the
    // a-tie-break picks 'n' < 'to'; r4 then fuses the whole word
    assert(out(2) == (3L, "n", "_", "n_", 2L))
    assert(out(3) == (4L, "to", "n_", "ton_", 2L))
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
}
