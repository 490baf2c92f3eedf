package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.RelationalQueries

/** Physical-plan shape assertions — the 100 TB design claims, checked
  * against the plans Spark actually produces.
  */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q05: fact-scale joins degrade to shuffle joins; only true dims stay broadcast") {
    // at test SF everything fits under autoBroadcastJoinThreshold and Spark
    // rightly broadcasts; simulate fact-scale size estimates by disabling
    // auto-broadcast — then ONLY the explicitly hinted dims (nation, region)
    // may build broadcast sides, and orders/customer must shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = RelationalQueries.q05StarRevenue(spark, dir)
        .queryExecution.sparkPlan.toString
      val bhj = "BroadcastHashJoin".r.findAllIn(plan).length
      val shuffle = "SortMergeJoin|ShuffledHashJoin".r.findAllIn(plan).length
      assert(bhj == 2, s"expected exactly the 2 hinted dim joins broadcast, got $bhj:\n$plan")
      assert(shuffle == 2, s"expected 2 shuffle joins for orders/customer, got $shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("column pruning reaches the parquet scan (q33: 3 of 5 event columns)") {
    val plan = RelationalQueries.q33SortDesc(spark, dir)
      .queryExecution.executedPlan.toString
    val readSchema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse(fail(s"no ReadSchema in:\n$plan"))
    val cols = readSchema.split(",").map(_.split(":")(0).trim).toSet
    assert(cols == Set("event_id", "user_id", "value"), s"scan reads: $readSchema")
  }

  test("literal-alternation RLIKE rewrites to Contains ORs; real regex keeps RLike") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // q02 itself (parquet-backed — a LocalRelation would be constant-folded):
    // pure literal alternation → no regex left in the plan
    val plan = RelationalQueries.q02RlikeFilter(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("RLIKE"), s"alternation not rewritten:\n$plan")
    assert(plan.contains("Contains"), plan)
    // semantics preserved, incl. metacharacter patterns staying on the
    // regex engine (else 'wid.et' could not match 'widget')
    val df = Seq("a widget here", "a bolt there", "neither", "wid.et").toDF("s")
    assert(df.filter(lower(col("s")).rlike("widget|bolt")).count() == 2)
    val regex = df.filter(col("s").rlike("wid.et"))
    val plan2 = spark.read.parquet(s"$dir/part.parquet")
      .filter(col("p_name").rlike("wid.et")).queryExecution.optimizedPlan.toString
    assert(plan2.contains("RLIKE"), s"unsafe pattern was rewritten:\n$plan2")
    assert(regex.count() == 2) // 'a widget here' and 'wid.et' both match wid.et
  }

  test("ANN re-ranks (q31 LSH, q43 IVF) use the bounded TopK aggregator, not a Window") {
    // the window form shuffles every in-bucket (query, candidate) pair; the
    // aggregator caps each partition's contribution at k rows per query
    Seq(graft.queries.SimilarityQueries.q31AnnLsh _,
        graft.queries.SimilarityQueries.q43AnnIvf _).foreach { q =>
      val plan = q(spark, dir).queryExecution.sparkPlan.toString
      assert(!plan.contains("Window"), s"window re-rank crept back in:\n$plan")
      assert(plan.contains("ObjectHashAggregate"),
        s"expected the TopKAggregator's ObjectHashAggregate in:\n$plan")
    }
  }

  test("q50 band-OR near-dup joins on buckets — no cartesian product anywhere") {
    // the whole point of banding is that candidates come from bucket
    // equi-joins; a cartesian (or broadcast nested loop) product would mean
    // the all-pairs shape leaked back in
    val plan = graft.queries.SimilarityQueries.q50BandedNearDup(spark, dir)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in banded near-dup:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested-loop in banded near-dup:\n$plan")
  }

  test("filter pushdown reaches the parquet scan (q01: shipdate predicate)") {
    val plan = RelationalQueries.q01PricingSummary(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), s"no pushed filters in:\n$plan")
    assert("LessThanOrEqual\\(l_shipdate".r.findFirstIn(plan).isDefined,
      s"shipdate predicate not pushed:\n$plan")
  }

  test("fresh-id assignment has no single-partition Window and matches key order") {
    // on an initial bulk load the fresh set IS the whole fact table —
    // a no-partition row_number window would funnel it through one task.
    // assignFreshIds must (a) contain no WindowExec at all, (b) still
    // reproduce exactly the row_number-over-key-order ids the oracle expects.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val fresh = Seq(("VINB", 2L), ("VINA", 9L), (null.asInstanceOf[String], 1L), ("VINA", 3L))
      .toDF("vin", "auction_id")
      .withColumn("vehicle_id", lit(null).cast("long"))
      .repartition(4)
    val assigned = graft.star.Facts.assignFreshIds(fresh, maxId = 100L)
    assert(!assigned.queryExecution.sparkPlan.toString.contains("Window"),
      "fresh-id path must not use a Window")
    val got = assigned.select("vin", "auction_id", "vehicle_id")
      .as[(String, Long, Long)].collect().toSet
    // key order (vin asc nulls last, auction_id asc): VINA/3 → 101,
    // VINA/9 → 102, VINB/2 → 103, null/1 → 104
    assert(got == Set(("VINA", 3L, 101L), ("VINA", 9L, 102L),
      ("VINB", 2L, 103L), (null, 1L, 104L)), got.toString)
  }
}
