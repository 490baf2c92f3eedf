package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.SuffixArray

/** Cost harness for the incremental contamination audit (the r14 verdict
  * ask: prove [[graft.ext.SuffixArray.auditShard]] scales with |shard| +
  * |index|, never |corpus|). Audits a FIXED shard (the same ~1000
  * documents, doc_id ≡ 1 mod 5 below the fixed cutoff — ids present at
  * every SF of the derived corpora) against each given corpus' benchmark
  * index (every 50th doc — the index DOES grow with the corpus, 10× rows
  * at sf1, which is the honest part of the claim: the audit reads shard +
  * index and nothing else). Per corpus, also times the q176-shaped FULL
  * rebuild over corpus ∪ bench for the same-breath comparison.
  *
  * Walls print per rep; quote mins (the JIT-warm figures) in NOTES.
  *
  * Usage: runMain graft.AuditCost [reps] [sfDir ...]
  */
object AuditCost {
  def main(args: Array[String]): Unit = {
    // first arg is reps IF numeric; a path first arg means "default reps,
    // these dirs" — matches the usage line instead of throwing NFE
    val repsOpt = args.headOption.flatMap(a => scala.util.Try(a.toInt).toOption)
    val reps = repsOpt.getOrElse(3)
    val dirArgs = if (repsOpt.isDefined) args.drop(1).toSeq else args.toSeq
    val dirs = if (dirArgs.nonEmpty) dirArgs
      else Seq("/root/testdata/sf0.1", "/root/repo/scale/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cutoff = 5000L // the sf0.1 id space — present in every corpus
    for (dir <- dirs) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val bench = docs.filter(col("doc_id") % 50 === 0)
      val shard = docs.filter(col("doc_id") % 5 === 1 &&
        col("doc_id") < cutoff)
      val nDocs = docs.count()
      val nShard = shard.count()
      val nBench = bench.count()
      // the standing index: built once, persisted; audits read it back
      val ixDir = java.nio.file.Files
        .createTempDirectory("graft_auditcost_ix").toString
      SuffixArray.contaminationIndex(bench, "doc_id", "text", k = 64)
        .write.mode("overwrite").parquet(ixDir)
      val index = spark.read.parquet(ixDir)
      def time(label: String)(f: => Long): Unit =
        for (i <- 1 to reps) {
          val t0 = System.nanoTime()
          val rows = f
          println(f"$dir $label rep$i: wall=${(System.nanoTime() - t0) / 1e9}%.2fs rows=$rows")
        }
      println(s"$dir: corpus=$nDocs shard=$nShard bench=$nBench")
      val nSfx = SuffixArray.wordStartPrefixes(shard, "doc_id", "text", 64).count()
      val nCand = SuffixArray.prunedCandidates(index, shard, "doc_id", "text",
        20, 64).count()
      println(s"$dir: shard suffixes=$nSfx pruned candidates=$nCand " +
        f"(${100.0 * nCand / math.max(1, nSfx)}%.1f%% survive the broadcast prune)")
      time("audit_fixed_shard") {
        SuffixArray.auditShard(index, shard, "doc_id", "text",
          minLen = 20, k = 64).count()
      }
      // the q190 shape: broadcast prefix semi-join drops clean shard
      // suffixes map-side before the range shuffle — same output (the
      // ExtSpec law), cheaper candidates-only insertion sort
      time("audit_fixed_shard_pruned") {
        SuffixArray.auditShardPruned(index, shard, "doc_id", "text",
          minLen = 20, k = 64).count()
      }
      time("full_rebuild") {
        SuffixArray.crossSetMaxLcp(
          docs.withColumn("is_b", col("doc_id") % 50 === 0),
          "doc_id", "text", "is_b", minLen = 20, k = 64).count()
      }
      // ── near-dup twin (r15 verdict #6): the same fixed shard audited
      // against the persisted LSH band index vs. re-banding the standing
      // corpus from text each time. The corpus here is everything NOT in
      // the shard — it grows 10× at sf1 while the shard stays fixed, so
      // the delta between the two rows is exactly the corpus re-band
      // (MinHash kernel over all corpus text) the index amortizes away.
      import graft.ext.Dedup
      val ndCorpus = docs.filter(!(col("doc_id") % 5 === 1 &&
        col("doc_id") < cutoff))
      val ndIxDir = java.nio.file.Files
        .createTempDirectory("graft_auditcost_ndix").toString
      val tb0 = System.nanoTime()
      Dedup.nearDupBandIndex(ndCorpus, "doc_id", "text")
        .write.mode("overwrite").parquet(ndIxDir)
      println(f"$dir neardup_index_build (once, amortized): " +
        f"wall=${(System.nanoTime() - tb0) / 1e9}%.2fs")
      val ndIndex = spark.read.parquet(ndIxDir)
      time("neardup_index_audit") {
        Dedup.nearDupAgainstIndex(ndIndex, shard, "doc_id", "text").count()
      }
      time("neardup_full_reband") {
        Dedup.nearDupAgainstIndex(
          Dedup.nearDupBandIndex(ndCorpus, "doc_id", "text"),
          shard, "doc_id", "text").count()
      }
    }
    spark.stop()
  }
}
