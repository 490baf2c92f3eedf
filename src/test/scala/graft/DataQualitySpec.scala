package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.DataQuality

/** Unit behavior of the data-quality / profiling operators. */
class DataQualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val t = Seq(
    (Some(1L), Some("b")),
    (Some(2L), None),
    (Some(2L), Some("a")),
    (None, Some("a"))
  ).toDF("k", "s")

  test("columnProfile: null/distinct counts and string min/max per column") {
    val p = DataQuality.columnProfile(t, Seq("k", "s"))
      .orderBy("column").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))
    assert(p.toSeq == Seq(
      ("k", 4L, 1L, 2L, "1", "2"),
      ("s", 4L, 1L, 2L, "a", "b")))
  }

  test("columnProfile runs as ONE aggregation action (single job over Expand)") {
    val plan = DataQuality.columnProfile(t, Seq("k", "s"))
      .queryExecution.sparkPlan.toString
    // multi-distinct plans through a single Expand + aggregate chain; a
    // per-column agg + union would show one scan per column
    assert("Expand".r.findAllIn(plan).size == 1, plan)
  }

  test("constraintCounts: fused conditional counts; zero-violation checks emit 0") {
    val c = DataQuality.constraintCounts(t, Seq(
        "null_k" -> col("k").isNull,
        "s_is_z" -> (col("s") === "z")))
      .orderBy("check").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(c.toSeq == Seq(("null_k", 1L), ("s_is_z", 0L)))
  }

  test("orphanCount counts child keys missing from the parent, zero when none") {
    val parent = Seq(1L, 2L).toDF("pk")
    val child = Seq(1L, 1L, 3L, 4L).toDF("fk")
    assert(DataQuality.orphanCount(child, "fk", parent, "pk")
      .head().getLong(0) == 2L)
    assert(DataQuality.orphanCount(Seq(1L).toDF("fk"), "fk", parent, "pk")
      .head().getLong(0) == 0L)
  }

  test("approx profile twin: HLL distinct within 10% of exact; no Expand in the plan") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val cols = Seq("doc_id", "lang", "source")
    val exact = DataQuality.columnProfile(docs, cols).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val approx = DataQuality.columnProfileApprox(docs, cols).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    cols.foreach { c =>
      val (e, a) = (exact(c).toDouble, approx(c).toDouble)
      assert(math.abs(a - e) / e <= 0.10, s"$c: exact=$e approx=$a")
    }
    // the scale claim: the HLL form must NOT expand the input per column
    val plan = DataQuality.columnProfileApprox(docs, cols)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("Expand"), s"approx profile must not Expand:\n$plan")
  }

  test("approx quantile caps within 2% of the exact percentile caps") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = DataQuality.quantileTrimStats(docs, "lang", "n_chars", 0.9)
      .select("lang", "cap").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val approx = DataQuality.approxQuantileCaps(docs, "lang", "n_chars", 0.9)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (g, e) =>
      assert(math.abs(approx(g) - e) / math.max(e, 1.0) <= 0.02,
        s"$g: exact=$e approx=${approx(g)}")
    }
  }

  test("quantileTrimStats: cap is the exact group percentile; keep/drop partition") {
    // group g: values 1..10 → p50 cap = 5.5 → 5 kept, 5 dropped
    val df = (1 to 10).map(v => ("g", v.toLong)).toDF("grp", "v")
    val r = DataQuality.quantileTrimStats(df, "grp", "v", q = 0.5).head()
    assert(r.getAs[Double]("cap") == 5.5)
    assert(r.getAs[Long]("n_total") == 10L)
    assert(r.getAs[Long]("n_kept") == 5L)
    assert(r.getAs[Long]("n_dropped") == 5L)
  }
}
