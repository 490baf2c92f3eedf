package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Sketch

/** KMV distinct-count sketch laws: partition invariance (merge order can't
  * change the sketch), exactness below k, and estimator accuracy. */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture = (1 to 20000)
    .map(i => (i % 3L, (i % 4021).toLong)) // 3 groups over 4021 distinct values
    .toDF("g", "v")

  test("sketch and estimate are invariant under repartitioning") {
    val runs = Seq(1, 7, 32).map { n =>
      Sketch.kmvDistinct(fixture.repartition(n), "g", "v", k = 256)
        .orderBy("g").collect().toSeq
    }
    assert(runs.distinct.size == 1)
  }

  test("fewer than k distinct values -> estimate is exact") {
    val small = (1 to 500).map(i => (0L, (i % 37).toLong)).toDF("g", "v")
    val r = Sketch.kmvDistinct(small, "g", "v", k = 256).collect().head
    assert(r.getAs[Long]("exact_distinct") == 37L)
    assert(r.getAs[Long]("sketch_size") == 37L)
    assert(r.getAs[Long]("kmv_estimate") == 37L)
  }

  test("estimate lands within 3 standard errors of exact (k=256 -> ~6.3%)") {
    val out = Sketch.kmvDistinct(fixture, "g", "v", k = 256)
      .collect()
    assert(out.length == 3)
    out.foreach { r =>
      val exact = r.getAs[Long]("exact_distinct").toDouble
      val est = r.getAs[Long]("kmv_estimate").toDouble
      assert(r.getAs[Long]("sketch_size") == 256L)
      assert(math.abs(est - exact) / exact < 3.0 / math.sqrt(256.0),
        s"group ${r.get(0)}: est $est vs exact $exact")
    }
  }

  test("rollup's merged __all__ row equals a sketch built directly over the union") {
    val rollup = Sketch.kmvRollup(fixture, "g", "v", k = 256)
      .filter(col("scope") === Sketch.AllGroups).collect().head
    val direct = Sketch.kmvDistinct(fixture.withColumn("g", lit(0L)), "g", "v", k = 256)
      .collect().head
    assert(rollup.getAs[Long]("sketch_size") == direct.getAs[Long]("sketch_size"))
    assert(rollup.getAs[Long]("kmv_estimate") == direct.getAs[Long]("kmv_estimate"))
    assert(rollup.getAs[Long]("exact_distinct") == 4021L)
  }

  test("duplicates never enter the sketch (value-distinct semantics)") {
    val dup = ((1 to 1000).map(i => (0L, 42L)) ++ Seq((0L, 43L))).toDF("g", "v")
    val r = Sketch.kmvDistinct(dup, "g", "v", k = 8).collect().head
    assert(r.getAs[Long]("sketch_size") == 2L)
    assert(r.getAs[Long]("kmv_estimate") == 2L)
  }

  // ---- Count-Min Sketch (long form) ----

  /** Skewed multiset over 2 groups: value v occurs ~(v mod 50)+1 times. */
  private def cmsFixture = (1 to 12000)
    .map(i => ((i % 2).toLong, (i % 300).toLong))
    .toDF("g", "v")

  test("CMS merge of per-group sketches equals the sketch built directly over the union") {
    val merged = Sketch.cmsMerge(Sketch.cmsLongForm(cmsFixture, "g", "v", d = 4, w = 64))
      .orderBy("r", "bucket").collect().toSeq
    val direct = Sketch.cmsMerge(
        Sketch.cmsLongForm(cmsFixture.withColumn("g", lit(0L)), "g", "v", d = 4, w = 64))
      .orderBy("r", "bucket").collect().toSeq
    assert(merged == direct)
  }

  test("CMS estimate >= exact count for EVERY key, and is partition-invariant") {
    val exact = cmsFixture.groupBy("v").agg(count(lit(1)).as("exact_cnt"))
    val runs = Seq(1, 32).map { n =>
      val sk = Sketch.cmsMerge(Sketch.cmsLongForm(
        cmsFixture.repartition(n), "g", "v", d = 4, w = 64))
      Sketch.cmsEstimate(sk, exact, "v", d = 4, w = 64)
        .orderBy("v").collect().toSeq
    }
    assert(runs.distinct.size == 1)
    runs.head.foreach { r =>
      assert(r.getAs[Long]("cms_estimate") >= r.getAs[Long]("exact_cnt"),
        s"key ${r.get(0)}: CMS under-estimated — impossible by construction")
    }
  }

  test("CMS is exact when the grid is collision-free") {
    // 10 distinct keys into a 4x1024 grid: expect no collisions; every
    // estimate must equal the true count exactly
    val tiny = (1 to 100).map(i => (0L, (i % 10).toLong)).toDF("g", "v")
    val exact = tiny.groupBy("v").agg(count(lit(1)).as("exact_cnt"))
    val sk = Sketch.cmsMerge(Sketch.cmsLongForm(tiny, "g", "v", d = 4, w = 1024))
    Sketch.cmsEstimate(sk, exact, "v", d = 4, w = 1024).collect().foreach { r =>
      assert(r.getAs[Long]("cms_estimate") == r.getAs[Long]("exact_cnt"))
    }
  }
}
