package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.etl.Silver
import graft.expr.CleanExprs

/** Property tests (SURVEY.md §5.4): A4 idempotence, U1 monotonicity, E10
  * all-or-nothing invariant — over generated inputs (plain ScalaCheck runner,
  * 10 cases each since every case runs Spark jobs).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), p)
    assert(res.passed, res.status.toString)
  }

  private val recGen = for {
    id <- Gen.choose(0, 5)
    ts <- Gen.choose(0L, 100L)
    url <- Gen.alphaLowerStr.map(s => s"u_${s.take(4)}")
  } yield (s"A$id", new java.sql.Timestamp(ts * 3600 * 1000), url)

  test("A4: keepNewest is idempotent, keeps max date, one row per key") {
    check(Prop.forAll(Gen.listOfN(30, recGen)) { recs =>
      recs.isEmpty || {
        val df = recs.toDF("auction_id", "auction_date", "auction_url")
        val once = Silver.keepNewest(df).cache()
        val a = once.orderBy("auction_id", "auction_url").collect().toSeq
        val b = Silver.keepNewest(once).orderBy("auction_id", "auction_url").collect().toSeq
        val maxDates = df.groupBy("auction_id").agg(max("auction_date").as("m"))
          .collect().map(r => r.getString(0) -> r.getTimestamp(1)).toMap
        val newestWon = once.collect().forall(r => r.getTimestamp(1) == maxDates(r.getString(0)))
        val unique = once.groupBy("auction_id").count().filter(col("count") > 1).count() == 0
        once.unpersist()
        a == b && newestWon && unique
      }
    })
  }

  test("connected components: star-contraction ≡ label propagation on random graphs") {
    // both paths must agree with a reference union-find on arbitrary edge
    // sets (self-loops and duplicate edges included by generation)
    val edgeGen = for {
      a <- Gen.choose(0L, 24L)
      b <- Gen.choose(0L, 24L)
    } yield (a, b)
    check(Prop.forAll(Gen.nonEmptyListOf(edgeGen)) { edges =>
      val clean = edges.filter { case (a, b) => a != b }
      clean.isEmpty || {
        // driver-side union-find reference
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        clean.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val want = parent.keys.map(k => k -> find(k)).toMap
        val pairs = clean.toDF("vec_a", "vec_b")
        def labelsOf(df: org.apache.spark.sql.DataFrame) =
          df.select("vec_id", "cluster_id").collect()
            .map(r => r.getLong(0) -> r.getLong(1)).toMap
        val prop = labelsOf(graft.ext.Dedup.duplicateClusters(pairs, "vec_a", "vec_b"))
        val star = labelsOf(graft.ext.Dedup.duplicateClustersStar(pairs, "vec_a", "vec_b"))
        prop == want && star == want
      }
    })
  }

  test("U1: insert-only-new — ids never mutate, keys only grow") {
    val whDir = java.nio.file.Files.createTempDirectory("graft_prop_wh").toString
    val wh = new graft.star.Warehouse(spark, whDir)
    val schema = StructType(Seq(StructField("k", StringType)))
    def candidates(ks: Seq[String]) = spark.createDataFrame(
      new java.util.ArrayList(
        scala.jdk.CollectionConverters.SeqHasAsJava(ks.distinct.map(Row(_))).asJava), schema)
    var seen = Map.empty[String, Long]
    val batches = Seq(Seq("a", "b"), Seq("b", "c", "d"), Seq.empty,
      Seq("a", "d", "e"), Seq("f"), Seq("a", "b", "c", "d", "e", "f"))
    batches.foreach { ks =>
      graft.star.Dims.insertOnlyNew(wh, "prop_dim", candidates(ks), Seq("k"))
      val now = wh.read("prop_dim").collect().map(r => r.getString(1) -> r.getLong(0)).toMap
      seen.foreach { case (k, id) => assert(now(k) == id, s"id for $k changed") }
      assert(now.keySet.size == now.values.toSet.size, "duplicate surrogate ids")
      assert(seen.keySet.subsetOf(now.keySet), "keys must only grow")
      seen = now
    }
    assert(seen.keySet == Set("a", "b", "c", "d", "e", "f"))
  }

  test("novelty conservation: novel grams sum to the distinct-gram vocabulary") {
    // every distinct n-gram is first-seen in exactly one document, so
    // Σ novel_grams == |distinct grams| — on ANY corpus
    val textGen = Gen.listOfN(8, Gen.listOfN(12,
      Gen.oneOf("a", "b", "c", "d", "e")).map(_.mkString(" ")))
    check(Prop.forAll(textGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val nv = graft.ext.Dedup.ngramNovelty(docs, "doc_id", "text", 3)
      val novelSum = nv.agg(org.apache.spark.sql.functions.sum("novel_grams"))
        .head().getLong(0)
      val vocab = graft.ext.Dedup.explodedShingles(docs, "doc_id", "text", 3)
        .select("sg").distinct().count()
      novelSum == vocab
    })
  }

  test("movingStats conservation: last running total per user == exact group sum") {
    val ev = (1 to 200).map { i =>
      (i.toLong, (i % 7).toLong,
        java.sql.Timestamp.valueOf(f"2024-01-01 ${i % 24}%02d:${i % 60}%02d:00"),
        i * 1.01)
    }.toDF("event_id", "user_id", "ts", "value")
    val ms = graft.ext.TimeSeries.movingStats(ev, "user_id", "ts", "event_id", "value")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
      .orderBy(col("rn").desc)
    val lastCum = ms.withColumn("_r", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("_r") === 1).select(col("user_id"), col("cum_sum"))
    val totals = ev.groupBy(col("user_id"))
      .agg(org.apache.spark.sql.functions.sum(col("value").cast("decimal(18,2)"))
        .cast("double").as("tot"))
    assert(lastCum.join(totals, "user_id")
      .filter(col("cum_sum") =!= col("tot")).count() == 0)
    assert(lastCum.count() == 7)
  }

  test("E10: bids parse is all-or-nothing") {
    val bidGen = Gen.listOf(Gen.oneOf(
      Gen.choose(1, 999999).map(n => f"$$$n%,d"),
      Gen.const("garbage")))
    check(Prop.forAll(bidGen) { bids =>
      val out = Seq(Tuple1(bids)).toDF("bids")
        .select(CleanExprs.bidsParse(col("bids")).as("b"))
        .head().getSeq[Long](0)
      if (bids.contains("garbage") || bids.isEmpty) out.isEmpty
      else out.length == bids.length
    })
  }
}
