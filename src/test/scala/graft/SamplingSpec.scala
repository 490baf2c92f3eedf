package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Sampling

/** Unit behavior of the deterministic sampling operators: hash split and
  * temperature-weighted source mixing. */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val ids = (0L until 2000L).toDF("id")

  test("hashSplit: total partition, deterministic, ~80/10/10 on the 1/256 grid") {
    val out = Sampling.hashSplit(ids, "id").cache()
    assert(out.count() == 2000)
    val bySplit = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    // realized thresholds are 205/256 and 25/256 — binomial around them
    assert(bySplit("train") > 1500 && bySplit("train") < 1700)
    assert(bySplit("val") > 120 && bySplit("val") < 280)
    assert(bySplit("test") > 120 && bySplit("test") < 280)
    // determinism: a second run assigns identical splits
    val again = Sampling.hashSplit(ids, "id")
    assert(out.join(again, Seq("id", "bucket", "split")).count() == 2000)
    out.unpersist()
  }

  test("hashSplit: thresholds land on documented hex literals") {
    assert(Sampling.hexThresholds(Seq(0.8, 0.1, 0.1), 2) == Seq("cd", "e6", "gg"))
    assert(Sampling.hexThresholds(Seq(0.5, 0.5), 2) == Seq("80", "gg"))
    // a weight rounding past the top bucket still catches every row
    assert(Sampling.hexThresholds(Seq(1.0), 2) == Seq("gg"))
  }

  test("hashSplit: split is a function of the id alone (stable under repartition)") {
    val a = Sampling.hashSplit(ids, "id")
    val b = Sampling.hashSplit(ids.repartition(13), "id")
    assert(a.join(b, Seq("id", "split")).count() == 2000)
  }

  test("deterministicShuffle: dense 1..N permutation, salt-stable, salt-sensitive") {
    val out = Sampling.deterministicShuffle(ids, "id").cache()
    // positions are exactly 1..N with no gaps or dups
    assert(out.agg(min("shuffle_pos"), max("shuffle_pos"),
      countDistinct("shuffle_pos")).head().toSeq == Seq(1L, 2000L, 2000L))
    // same salt → identical permutation, any partitioning
    val again = Sampling.deterministicShuffle(ids.repartition(7), "id")
    assert(out.join(again, Seq("id", "shuffle_pos")).count() == 2000)
    // different salt (epoch 2) → a genuinely different order
    val epoch2 = Sampling.deterministicShuffle(ids, "id", salt = "epoch-2")
    assert(out.join(epoch2, Seq("id", "shuffle_pos")).count() < 100)
    // the order is NOT the id order (it is a shuffle)
    val sameAsId = out.filter(col("shuffle_pos") === col("id") + 1).count()
    assert(sameAsId < 100)
    out.unpersist()
  }

  test("temperatureMix: alpha<1 up-weights small sources; rates bounded; deterministic") {
    // 3 sources with 100 / 400 / 1500 rows
    val docs = (0L until 2000L).map { i =>
      val src = if (i < 100) "small" else if (i < 500) "mid" else "big"
      (i, src)
    }.toDF("id", "src")
    val kept = Sampling.temperatureMix(docs, "id", "src", alpha = 0.5, targetFrac = 0.5)
      .cache()
    val rates = kept.select("src", "rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // sqrt weighting: rate(small) > rate(mid) > rate(big)
    assert(rates("small") > rates("mid") && rates("mid") > rates("big"),
      s"rates not monotone: $rates")
    assert(rates.values.forall(r => r > 0 && r <= 1.0))
    // kept counts are within binomial noise of rate * count
    val counts = kept.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("big") - rates("big") * 1500) < 150)
    // deterministic: same kept set on re-run
    val again = Sampling.temperatureMix(docs, "id", "src", alpha = 0.5, targetFrac = 0.5)
    assert(kept.select("id").except(again.select("id")).count() == 0)
    assert(again.select("id").except(kept.select("id")).count() == 0)
    kept.unpersist()
  }

  test("temperatureMix: alpha=1 keeps every source at the uniform target rate") {
    val docs = (0L until 1000L).map(i => (i, s"s${i % 4}")).toDF("id", "src")
    val rates = Sampling.temperatureMix(docs, "id", "src", alpha = 1.0, targetFrac = 0.25)
      .select("rate").distinct().collect().map(_.getDouble(0))
    // p_s = c_s / N → rate = targetFrac exactly, for every source
    assert(rates.toSeq == Seq(0.25))
  }

  // skewed sources: 1500 / 360 / 140 docs
  private lazy val ilvDocs = (0L until 2000L)
    .map(i => (i, if (i < 1500) "big" else if (i < 1860) "mid" else "small"))
    .toDF("id", "src")

  test("interleaveSchedule: stride fairness — a source's per-bucket counts differ by <= 1") {
    val out = Sampling.interleaveSchedule(ilvDocs, "id", "src", nBuckets = 10)
      .collect()
    assert(out.length == 30, "every source must appear in every bucket")
    Seq("big", "mid", "small").foreach { s =>
      val counts = out.filter(_.getString(0) == s).map(_.getAs[Long]("n_docs"))
      assert(counts.max - counts.min <= 1,
        s"source $s buckets ${counts.toSeq} — stride should spread evenly")
      assert(counts.sum == (if (s == "big") 1500 else if (s == "mid") 360 else 140))
    }
  }

  test("interleaveSchedule: positions cover [0, T) and buckets tile it in order") {
    val out = Sampling.interleaveSchedule(ilvDocs, "id", "src", nBuckets = 10)
      .collect()
    assert(out.forall(r => r.getAs[Long]("first_pos") >= 0 &&
      r.getAs[Long]("last_pos") < 2000))
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val byBucket = rows.sortBy(_.getAs[Long]("bucket"))
      // within a source, bucket k's positions all precede bucket k+1's
      byBucket.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("last_pos") < b.getAs[Long]("first_pos"))
        case _ => ()
      }
    }
  }

  test("interleaveSchedule: invariant under repartitioning") {
    val runs = Seq(1, 32).map { n =>
      Sampling.interleaveSchedule(ilvDocs.repartition(n), "id", "src")
        .orderBy("src", "bucket").collect().toSeq
    }
    assert(runs.distinct.size == 1)
  }

  // priority sampling fixture: 2000 items, weight 1 + (id mod 100), two
  // groups by id parity — group sums are known exactly
  private lazy val priDocs = (0L until 2000L).toDF("id")
    .select(col("id"), (lit(1L) + col("id") % 100).as("w"),
      (col("id") % 2).cast("string").as("grp"))

  test("prioritySample: population <= k degenerates to the exact totals") {
    val out = Sampling.prioritySample(priDocs.limit(50), "id", "w", "grp", k = 128)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // every item sampled, τ = 0, so the estimate IS the exact sum
    out.values.foreach { case (nDocs, wExact, nSampled, wEst) =>
      assert(nSampled == nDocs)
      assert(wEst == wExact)
    }
  }

  test("prioritySample: k of N sampled; estimate within DLT variance of the total") {
    val out = Sampling.prioritySample(priDocs, "id", "w", "grp", k = 128).collect()
    val nSampled = out.map(_.getAs[Long]("n_sampled")).sum
    assert(nSampled == 128)
    val wExact = out.map(_.getAs[Long]("w_exact")).sum
    val wEst = out.map(_.getAs[Long]("w_est")).sum
    // Var[Σŵ] ≤ W²/(k−1) ⇒ σ ≈ W/11.3 at k=128; 3σ ≈ 27% of W. The draw
    // is a fixed md5 function, so this is a deterministic check, not a
    // flaky statistical one.
    assert(math.abs(wEst - wExact) < (wExact * 3) / 11,
      s"estimate $wEst strays from exact $wExact beyond 3σ")
  }

  test("prioritySample: per-group estimates are max(w, τ) sums — τ shared globally") {
    val out = Sampling.prioritySample(priDocs, "id", "w", "grp", k = 128)
      .collect()
    // both groups sampled (k=128 across 2 balanced groups)
    assert(out.forall(_.getAs[Long]("n_sampled") > 20))
    // τ ≥ every sampled weight's floor ⇒ w_est ≥ n_sampled · min-weight
    out.foreach { r =>
      assert(r.getAs[Long]("w_est") >= r.getAs[Long]("n_sampled"))
    }
  }

  test("prioritySample: deterministic and invariant under repartitioning") {
    val runs = Seq(1, 32).map { n =>
      Sampling.prioritySample(priDocs.repartition(n), "id", "w", "grp", k = 64)
        .orderBy("grp").collect().toSeq
    }
    assert(runs.distinct.size == 1)
  }

  test("prioritySample: zero/negative weights are excluded from population and sample") {
    val withZero = priDocs.unionByName(
      Seq((9000L, 0L, "z"), (9001L, -5L, "z")).toDF("id", "w", "grp"))
    val out = Sampling.prioritySample(withZero, "id", "w", "grp", k = 64)
    assert(out.filter(col("grp") === "z").count() == 0)
  }

  /** In-JVM twin of the hashSplit 80/10/10 routing — used to PLANT
    * straddling pairs for the clusterAwareSplit laws. */
  private def naiveSplitOf(id: Long): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val hex = d.digest(s"graft-split:$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(2)
    if (hex < "cd") "train" else if (hex < "e6") "val" else "test"
  }

  test("clusterAwareSplit: planted straddling pair is healed (same split, " +
       "zero cluster leaks), naive side counts it once per endpoint") {
    val ids = (0L until 400L).toDF("id")
    // find a pair whose NAIVE splits differ — the leak hashSplit would ship
    val (a, b) = {
      val train = (0L until 400L).find(naiveSplitOf(_) == "train").get
      val test = (0L until 400L).find(naiveSplitOf(_) == "test").get
      (train, test)
    }
    val pairs = Seq((a, b)).toDF("pa", "pb")
    val out = Sampling.clusterAwareSplit(ids, pairs, "id", "pa", "pb")
      .collect().map(r => r.getString(0) -> r).toMap
    // total partition under BOTH assignments
    assert(out.values.map(_.getAs[Long]("n_docs_cluster")).sum == 400L)
    assert(out.values.map(_.getAs[Long]("n_docs_naive")).sum == 400L)
    // the pair leaks under naive routing — once for each endpoint's split
    assert(out(naiveSplitOf(a)).getAs[Long]("naive_cross_pairs") == 1L)
    assert(out(naiveSplitOf(b)).getAs[Long]("naive_cross_pairs") == 1L)
    // and never under cluster routing (the law: computed, comes out 0)
    assert(out.values.forall(_.getAs[Long]("cluster_cross_pairs") == 0L))
    // the healed pair moved ONE doc across: marginals differ by exactly one
    // doc between the two assignments, in the two touched splits only
    val moved = out.values.map(r =>
      math.abs(r.getAs[Long]("n_docs_cluster") - r.getAs[Long]("n_docs_naive"))).sum
    assert(moved == 2L, s"one doc rerouted: |Δ| sums to 2, got $moved")
  }

  test("clusterAwareSplit: no detector pairs degenerates to hashSplit " +
       "marginals exactly; real-corpus run keeps the zero-leak law") {
    val ids = (0L until 500L).toDF("id")
    val noPairs = Seq.empty[(Long, Long)].toDF("pa", "pb")
    val out = Sampling.clusterAwareSplit(ids, noPairs, "id", "pa", "pb")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_docs_cluster"), r.getAs[Long]("n_docs_naive"),
          r.getAs[Long]("naive_cross_pairs"),
          r.getAs[Long]("cluster_cross_pairs")))).toMap
    val want = Sampling.hashSplit(ids, "id").groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet == want.keySet)
    out.foreach { case (s, (nc, nn, nl, cl)) =>
      assert(nc == want(s) && nn == want(s) && nl == 0L && cl == 0L,
        s"split $s: ($nc, $nn, $nl, $cl) vs hashSplit ${want(s)}")
    }
    // real corpus: q51's detector pairs over sf0.001 embeddings — clusters
    // route whole, so the cluster side leaks nothing while naive may
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairs = graft.ext.Similarity.bandedNearDupPairs(emb, "vec_id",
      "embedding", threshold = 0.35, bands = 3, planesPerBand = 6)
    val real = Sampling.clusterAwareSplit(emb, pairs, "vec_id", "vec_a", "vec_b")
      .collect()
    assert(real.map(_.getAs[Long]("n_docs_cluster")).sum == emb.count())
    assert(real.forall(_.getAs[Long]("cluster_cross_pairs") == 0L),
      "cluster-aware routing must never leak a detector pair")
  }
}
