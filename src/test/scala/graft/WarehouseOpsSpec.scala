package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{Layout, Scd}

/** Unit behavior of the round-7 warehouse/layout operators: SCD Type-2
  * merge, Z-order keys, and the bloom decontamination prefilter.
  */
class WarehouseOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val attrs = Seq("seg", "nat")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("k", "valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]), r.getBoolean(5)))
      .toSeq

  test("scd2: init opens every row; merge closes changed, ignores unchanged, inserts new") {
    val b1 = Seq((1L, "A", 10), (2L, "B", 20), (3L, "C", 30)).toDF("k", "seg", "nat")
    val s1 = Scd.scd2Init(b1, "k", attrs, 1L)
    assert(s1.filter(col("is_current")).count() == 3)

    // k=1 changes, k=2 re-delivered unchanged, k=9 is new; k=3 absent
    val b2 = Seq((1L, "A2", 10), (2L, "B", 20), (9L, "N", 90)).toDF("k", "seg", "nat")
    val s2 = Scd.scd2Merge(s1, b2, "k", attrs, 2L)
    assert(rows(s2) == Seq(
      (1L, "A", 10, 1L, Some(2L), false),
      (1L, "A2", 10, 2L, None, true),
      (2L, "B", 20, 1L, None, true),
      (3L, "C", 30, 1L, None, true),
      (9L, "N", 90, 2L, None, true)))
  }

  test("scd2: reversion creates a third version; closed rows keep valid_from") {
    val b1 = Seq((1L, "A", 10)).toDF("k", "seg", "nat")
    val b2 = Seq((1L, "B", 10)).toDF("k", "seg", "nat")
    val b3 = Seq((1L, "A", 10)).toDF("k", "seg", "nat") // back to the original
    val s = Scd.scd2Merge(
      Scd.scd2Merge(Scd.scd2Init(b1, "k", attrs, 1L), b2, "k", attrs, 2L),
      b3, "k", attrs, 3L)
    assert(rows(s) == Seq(
      (1L, "A", 10, 1L, Some(2L), false),
      (1L, "B", 10, 2L, Some(3L), false),
      (1L, "A", 10, 3L, None, true)))
  }

  test("scd2: attribute comparison is null-safe") {
    val b1 = Seq((1L, Option.empty[String], 10), (2L, Some("B"), 20))
      .toDF("k", "seg", "nat")
    // k=1: NULL -> value is a change; k=2: value -> NULL is a change
    val b2 = Seq((1L, Some("X"), 10), (2L, Option.empty[String], 20))
      .toDF("k", "seg", "nat")
    val s2 = Scd.scd2Merge(Scd.scd2Init(b1, "k", attrs, 1L), b2, "k", attrs, 2L)
    assert(s2.filter(col("is_current")).count() == 2)
    assert(s2.count() == 4)
    // NULL -> NULL is NOT a change
    val s3 = Scd.scd2Merge(s2, Seq((2L, Option.empty[String], 20))
      .toDF("k", "seg", "nat"), "k", attrs, 3L)
    assert(s3.count() == 4)
  }

  test("zValue interleaves bits: (5, 3) at 3 bits -> 27") {
    // x=0b101 contributes bits 0,4 (1+16); y=0b011 contributes bits 1,3 (2+8)
    val z = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zValue(Seq(col("x"), col("y")), 3).as("z"))
      .head().getLong(0)
    assert(z == 27L)
  }

  test("zValue matches a scala reference on random in-range values") {
    val bits = 10
    val data = (0 until 200).map { i =>
      (((i * 2654435761L) & 1023), ((i * 40503L) & 1023))
    }
    def ref(x: Long, y: Long): Long =
      (0 until bits).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
        .reduce(_ | _)
    val got = data.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(Seq(col("x"), col("y")), bits).as("z"))
      .collect()
    got.foreach(r => assert(r.getLong(2) == ref(r.getLong(0), r.getLong(1))))
  }

  test("zorderBy range-partitions on the z key: file N's range precedes file N+1's") {
    val df = (0 until 512).map(i => ((i * 7L) % 64, (i * 13L) % 64)).toDF("x", "y")
    val parts = Layout.zorderBy(df, Seq(col("x"), col("y")), bits = 6, numFiles = 4)
      .withColumn("z", Layout.zValue(Seq(col("x"), col("y")), 6))
      .withColumn("pid", spark_partition_id())
      .groupBy("pid").agg(min("z").as("lo"), max("z").as("hi"), count(lit(1)).as("n"))
      .orderBy("pid").collect()
    assert(parts.map(_.getLong(3)).sum == 512)
    parts.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(2) <= b.getLong(1)) // hi(N) <= lo(N+1)
      case _ =>
    }
  }

  test("rendezvousShard: in-range, roughly uniform, deterministic under repartition") {
    val ids = (0L until 3000L).toDF("id")
    val out = ids.select(col("id"), Layout.rendezvousShard(col("id"), 8).as("s"))
      .cache()
    val counts = out.groupBy("s").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet == (0 until 8).toSet)
    // binomial(3000, 1/8): mean 375, σ ≈ 18 — 5σ bounds
    counts.values.foreach(c => assert(c > 280 && c < 470, s"skewed: $counts"))
    val again = ids.repartition(13)
      .select(col("id"), Layout.rendezvousShard(col("id"), 8).as("s"))
    assert(out.join(again, Seq("id", "s")).count() == 3000)
    out.unpersist()
  }

  test("rendezvousShard: growing the ring moves rows ONLY onto new shards") {
    val ids = (0L until 3000L).toDF("id")
    val both = ids.select(col("id"),
      Layout.rendezvousShard(col("id"), 8).as("old"),
      Layout.rendezvousShard(col("id"), 12).as("nw")).cache()
    // minimal disruption: an old shard's hash is unchanged, so a row never
    // moves between two OLD shards — it either stays or goes to 8..11
    assert(both.filter(col("old") =!= col("nw") && col("nw") < 8).count() == 0)
    // churn ≈ 4/12 of rows (binomial bounds), and every new shard lands rows
    val moved = both.filter(col("old") =!= col("nw")).count()
    assert(moved > 800 && moved < 1200, s"churn $moved of 3000")
    assert(both.filter(col("nw") >= 8).select("nw").distinct().count() == 4)
    both.unpersist()
  }

  test("rangePartitionAudit: conservation, ordered disjoint ranges, full-sample exactness") {
    // values 0..1999 with unique ids; sampleK >= population → the "sample"
    // IS the population, so 8 equi-depth parts must each hold exactly 250
    // rows at load_bp 10000 (the planner's no-sampling-error base case)
    val df = (0L until 2000L).map(i => (i, (i * 7919) % 2000)).toDF("id", "v")
    val out = Layout.rangePartitionAudit(df, col("id"), col("v"),
      parts = 8, sampleK = 4096).orderBy("part_id").collect()
    assert(out.map(_.getAs[Long]("part_id")).toSeq == (0L until 8L))
    assert(out.forall(_.getAs[Long]("n_rows") == 250L))
    assert(out.forall(_.getAs[Long]("load_bp") == 10000L))
    // ranges are disjoint and ordered: part i's max < part i+1's min
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("hi_v") < b.getAs[Long]("lo_v"))
    }
    // sampled path: boundaries from a 256-row sample still conserve rows
    // and keep every partition within sampling error of ideal
    val s = Layout.rangePartitionAudit(df, col("id"), col("v"),
      parts = 4, sampleK = 256).collect()
    assert(s.map(_.getAs[Long]("n_rows")).sum == 2000L)
    s.foreach(r => assert(math.abs(r.getAs[Long]("load_bp") - 10000L) < 3000L,
      s"sampled partition far off ideal: ${r}"))
  }

  test("zone-map pruning: range layout never scans more files than hash, prunes strictly more overall") {
    val out = graft.queries.WarehouseQueries
      .q141ZoneMapPruning(spark, "/root/testdata/sf0.001").collect()
    val byLayout = out.groupBy(_.getString(0))
    val hashByPred = byLayout("hash")
      .map(r => r.getAs[Int]("pred_id") -> r.getAs[Long]("n_scanned")).toMap
    byLayout("range").foreach { r =>
      assert(r.getAs[Long]("n_scanned") <= hashByPred(r.getAs[Int]("pred_id")),
        s"range scanned more than hash: $r")
    }
    val rangePruned = byLayout("range").map(_.getAs[Long]("pruned_bp")).sum
    val hashPruned = byLayout("hash").map(_.getAs[Long]("pruned_bp")).sum
    assert(rangePruned > hashPruned,
      s"range layout should prune strictly more: range=$rangePruned hash=$hashPruned")
    // conservation: every (layout, predicate) accounts for all rows
    out.foreach(r => assert(r.getAs[Long]("rows_scanned") <= r.getAs[Long]("rows_total")))
  }

  test("hilbert index: bijective on the grid, consecutive cells are Manhattan neighbors") {
    import graft.functions.HilbertKernel.xy2d
    // the defining curve property on the full 16×16 grid (bits = 4):
    // every cell gets a distinct position in [0, 256), and walking the
    // curve in position order only ever steps to a grid NEIGHBOR — the
    // locality guarantee Morton z-order breaks at its diagonal jumps
    val cells = for { x <- 0 until 16; y <- 0 until 16 }
      yield (xy2d(4, x, y), (x, y))
    assert(cells.map(_._1).distinct.size == 256)
    assert(cells.map(_._1).min == 0L && cells.map(_._1).max == 255L)
    val walk = cells.sortBy(_._1).map(_._2)
    walk.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve jump between ($x1,$y1) and ($x2,$y2)")
    }
    // the kernel IS the expression path (sanity via the Column API)
    import spark.implicits._
    val got = Seq((3L, 5L)).toDF("x", "y")
      .select(Layout.hilbertValue(col("x"), col("y"), 4).as("h"))
      .collect().head.getLong(0)
    assert(got == xy2d(4, 3L, 5L))
  }

  test("ringShard: in-range, deterministic, successor rule matches a reference ring") {
    val ids = (0L until 3000L).toDF("id")
    val out = ids.select(col("id"), Layout.ringShard(col("id"), 8, 16).as("s"))
      .cache()
    val counts = out.groupBy("s").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.keySet == (0 until 8).toSet)
    // vnode balance is looser than HRW's binomial (arc lengths are
    // exponential-ish) — just require every shard holds a real share
    counts.values.foreach(c => assert(c > 100 && c < 900, s"skewed: $counts"))
    val again = ids.repartition(13)
      .select(col("id"), Layout.ringShard(col("id"), 8, 16).as("s"))
    assert(out.join(again, Seq("id", "s")).count() == 3000)
    // reference successor lookup over the explicitly rebuilt ring,
    // including the wraparound case
    val ring = (for { s <- 0 until 8; v <- 0 until 16 }
      yield (graft.functions.RingKernel.hash60(s"graft-ring:v:$s:$v"), s))
      .sortBy(_._1)
    val got = out.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    (0L until 3000L).foreach { id =>
      val h = graft.functions.RingKernel.hash60(s"graft-ring:i:$id")
      val expect = ring.find(_._1 >= h).getOrElse(ring.head)._2
      assert(got(id) == expect, s"id $id")
    }
    out.unpersist()
  }

  test("ringShard: growing the ring moves rows ONLY onto new shards") {
    val ids = (0L until 3000L).toDF("id")
    val both = ids.select(col("id"),
      Layout.ringShard(col("id"), 8, 16).as("old"),
      Layout.ringShard(col("id"), 12, 16).as("nw")).cache()
    // old vnode positions are unchanged — a row moves iff a NEW shard's
    // vnode landed between its hash and its old successor
    assert(both.filter(col("old") =!= col("nw") && col("nw") < 8).count() == 0)
    val moved = both.filter(col("old") =!= col("nw")).count()
    // E ≈ 1/3 of rows; vnode-arc variance is wider than binomial
    assert(moved > 600 && moved < 1500, s"churn $moved of 3000")
    assert(both.filter(col("nw") >= 8).select("nw").distinct().count() == 4)
    both.unpersist()
  }

  test("bloom prefilter: no false negatives, and bloomDecontaminate == decontaminate") {
    // every third doc carries a common phrase, so corpus docs (i%7!=0)
    // share 3-grams with benchmark docs (i%7==0, overlapping at i%21==0)
    val docs = (0L until 200L).map { i =>
      val words =
        if (i % 3 == 0) s"common phrase alpha beta gamma doc $i"
        else s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f"
      (i, words)
    }.toDF("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 7 =!= 0)
    val bench = docs.filter(col("doc_id") % 7 === 0)

    // no false negatives: every benchmark gram passes its own bloom
    val bg = graft.ext.Dedup.explodedShingles(bench, "doc_id", "text", 3)
      .select(col("sg")).distinct()
    val bloom = graft.functions.BloomPrefilter.build(bg, "sg", 10000L, 0.01)
    assert(bg.filter(!graft.functions.BloomPrefilter.mightContain(bloom, col("sg"))).count() == 0)

    val exact = graft.queries.CurationQueries
      .decontaminate(corpus, bench, "doc_id", "text", 3)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val bloomed = graft.queries.CurationQueries
      .bloomDecontaminate(corpus, bench, "doc_id", "text", 3, 10000L, 0.01)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(bloomed == exact)
    assert(exact.nonEmpty)
  }

  test("pointInTime resolves the version valid at each probe clock") {
    val b1 = Seq((1L, "A", 10), (2L, "B", 20)).toDF("k", "seg", "nat")
    val s1 = Scd.scd2Init(b1, "k", attrs, 1L)
    val s2 = Scd.scd2Merge(s1, Seq((1L, "A2", 10), (9L, "N", 90)).toDF("k", "seg", "nat"),
      "k", attrs, 3L)
    val probes = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 3L), (9L, 1L), (9L, 3L), (7L, 3L))
      .toDF("k", "t")
    val got = Scd.pointInTime(probes, s2, "k", "t")
      .select("k", "t", "seg").orderBy("k", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == Seq(
      (1L, 1L, "A"),  // version A valid [1,3)
      (1L, 2L, "A"),  // still the closed version at t=2
      (1L, 3L, "A2"), // the new current version from t=3
      (2L, 3L, "B"),  // never changed
      (9L, 3L, "N"))) // key born at t=3: its t=1 probe dropped; 7 unknown
  }

  test("mv merge: base+delta refresh ≡ full recompute, schema pinned, associative") {
    val all = (1L to 200L).map(i => (i % 13, i, BigDecimal(i) * 7 / 100))
      .toDF("g", "one", "amt")
      .select(col("g"), col("one"), col("amt").cast("decimal(18,2)").as("amt"))
    def partial(f: org.apache.spark.sql.DataFrame) = f.groupBy("g")
      .agg(count(lit(1)).as("n"),
        sum(col("amt")).cast("decimal(18,2)").as("s"))
    def rows(f: org.apache.spark.sql.DataFrame) = f.orderBy("g").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2))).toSeq
    val full = rows(partial(all))
    // one-shot refresh
    val oneShot = graft.ext.Mv.mergeAggregates(
      partial(all.filter(col("one") <= 120)),
      partial(all.filter(col("one") > 120)), Seq("g"))
    assert(rows(oneShot) == full)
    // two successive delta applications reach the same view (associativity)
    val twoStep = graft.ext.Mv.mergeAggregates(
      graft.ext.Mv.mergeAggregates(
        partial(all.filter(col("one") <= 80)),
        partial(all.filter(col("one") > 80 && col("one") <= 120)), Seq("g")),
      partial(all.filter(col("one") > 120)), Seq("g"))
    assert(rows(twoStep) == full)
    // refresh must not widen dtypes (DECIMAL sum widens to (28,2) unpinned)
    assert(oneShot.schema("s").dataType == partial(all).schema("s").dataType)
  }

  test("pageRankInt ≡ an in-memory integer reference on an asymmetric-degree graph") {
    // 1↔2, 1↔3, 2↔3, 3↔4: node 3 has degree 3, node 4 degree 1
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val got = graft.ext.Graph.pageRankInt(edges, "src", "dst", iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: same fixed-point arithmetic in plain Scala
    val adj = (pairs ++ pairs.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var rank = adj.keys.map(_ -> 1000000000000L).toMap
    for (_ <- 1 to 5) {
      val inflow = adj.toSeq
        .flatMap { case (s, ds) => ds.map(_ -> rank(s) / ds.size) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      rank = rank.map { case (n, _) =>
        n -> (150000000000L + 85L * inflow.getOrElse(n, 0L) / 100L) }
    }
    assert(got == rank)
    // hub 3 outranks leaf 4 and the symmetric 1/2 pair
    assert(got(3L) > got(1L) && got(1L) == got(2L) && got(3L) > got(4L))
  }
}
