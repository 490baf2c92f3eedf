package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Fusion

/** Reciprocal-rank fusion semantics on hand-checked fixtures. */
class FusionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val listA = Seq( // (query_id, cand_id, sim)
    (1L, 100L, 0.9), (1L, 101L, 0.8), (1L, 102L, 0.7),
    (2L, 200L, 0.5)).toDF("query_id", "cand_id", "sim")
  private val listB = Seq(
    (1L, 101L, 0.95), (1L, 103L, 0.85),
    (2L, 200L, 0.6)).toDF("query_id", "cand_id", "sim")

  test("union of candidates, exact two-term scores, fused order") {
    val out = Fusion.reciprocalRankFusion(listA, listB)
      .orderBy("query_id", "fused_rank").collect()
    val q1 = out.filter(_.getLong(0) == 1L)
      .map(r => (r.getLong(1), r.getDouble(4), r.getLong(5)))
    // 101: rank 2 in A, rank 1 in B -> 1/62 + 1/61 (the only double-hit)
    assert(q1.head == ((101L, 1.0 / 62 + 1.0 / 61, 1L)))
    // remaining q1 candidates are single-list, ordered by their bare
    // reciprocal: 100 (rank 1 in A, 1/61) > 103 (rank 2 in B, 1/62) >
    // 102 (rank 3 in A, 1/63)
    assert(q1.map(_._1).toSeq == Seq(101L, 100L, 103L, 102L))
    assert(q1(1)._2 == 1.0 / 61 && q1(2)._2 == 1.0 / 62 && q1(3)._2 == 1.0 / 63)
  }

  test("candidate in both lists at rank 1 fuses to rank 1; ranks survive") {
    val out = Fusion.reciprocalRankFusion(listA, listB)
      .filter("query_id = 2").collect().head
    assert(out.getLong(1) == 200L)
    assert(out.getLong(2) == 1L && out.getLong(3) == 1L) // rank_a, rank_b
    assert(out.getDouble(4) == 1.0 / 61 + 1.0 / 61)
    assert(out.getLong(5) == 1L)
  }

  test("missing-list ranks are null, never zero") {
    val rows = Fusion.reciprocalRankFusion(listA, listB)
      .filter("query_id = 1 AND cand_id = 102").collect()
    assert(rows.head.isNullAt(3) && rows.head.getLong(2) == 3L)
  }
}
