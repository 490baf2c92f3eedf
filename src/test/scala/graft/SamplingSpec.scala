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
}
