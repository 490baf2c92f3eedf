package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{Corpus, Similarity}

/** Unit behavior of the corpus-level operators (chunking, TF-IDF, inverted
  * index) and int8 embedding quantization. */
class CorpusSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b c d e f g h i j"), // 10 tokens
    (2L, "x y z"), // shorter than one chunk
    (3L, "a a a b b c") // repeats for tf/df
  ).toDF("doc_id", "text")

  test("stupid backoff: hand-computed scores at every backoff level") {
    // train: "a b c a b d" → c(a,b,c)=1, c(a,b)=2, c(a)=2, c(c)=1, N=6
    val train = Seq((0L, "a b c a b d")).toDF("doc_id", "text")
    val score = Seq(
      (1L, "a b c x"), // (a,b,c): trigram hit 1/2; (b,c,x): full OOV floor
      (3L, "x a b"),   // (x,a,b): backoff to bigram 0.4·c(a,b)/c(a) = 0.4
      (5L, "q y c")    // (q,y,c): backoff to unigram 0.16·c(c)/N
    ).toDF("doc_id", "text")
    val out = Corpus.stupidBackoffScore(train, score, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val d1 = out(1L)
    assert(d1.getAs[Long]("n_scored") == 2L)
    assert(d1.getAs[Long]("n_tri") == 1L && d1.getAs[Long]("n_oov") == 1L)
    val floor = 0.16 * (0.5 / 6.0)
    assert(d1.getAs[Double]("min_s") == floor)
    assert(d1.getAs[Double]("mean_s") == (0.5 + floor) / 2.0)
    val d3 = out(3L)
    assert(d3.getAs[Long]("n_bi") == 1L)
    assert(d3.getAs[Double]("mean_s") == 0.4 * (2.0 / 2.0))
    val d5 = out(5L)
    assert(d5.getAs[Long]("n_uni") == 1L)
    assert(d5.getAs[Double]("mean_s") == 0.16 * (1.0 / 6.0))
  }

  test("padding audit: uniform lengths pad zero; width-1 buckets pad zero; conservation") {
    import graft.ext.Batching
    // uniform-length corpus: every batch's max == every member's len
    val uni = (0 until 20).map(i => (i.toLong, "a b c d")).toDF("doc_id", "text")
    val u = Batching.paddingAudit(uni, "doc_id", "text", 128, 4, 16)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(u("hash").getAs[Long]("padding_tokens") == 0L)
    assert(u("bucketed").getAs[Long]("padding_tokens") == 0L)
    // mixed lengths, bucketWidth = 1: bucketed batches are single-length by
    // construction → zero padding; hash batches mix lengths → positive
    val mix = (0 until 40).map(i =>
      (i.toLong, if (i % 2 == 0) "a" else "a b c d e f g h")).toDF("doc_id", "text")
    val m = Batching.paddingAudit(mix, "doc_id", "text", 128, 4, 1)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(m("bucketed").getAs[Long]("padding_tokens") == 0L)
    assert(m("hash").getAs[Long]("padding_tokens") > 0L)
    // conservation: useful tokens identical across policies; rows conserved
    assert(m("hash").getAs[Long]("useful_tokens") ==
      m("bucketed").getAs[Long]("useful_tokens"))
    assert(m("hash").getAs[Long]("n_rows") == 40L &&
      m("bucketed").getAs[Long]("n_rows") == 40L)
    // empty input: _n = 0 used to make the batch count 0 and pmod(_h, 0)
    // an ANSI divide-by-zero; the greatest(·, 1) clamp must instead yield
    // the clean all-zero two-policy report
    val e = Batching.paddingAudit(
        Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(e.keySet == Set("hash", "bucketed"))
    for (p <- e.values; c <- Seq("n_batches", "n_rows", "useful_tokens",
        "cost_tokens", "padding_tokens", "padding_bp"))
      assert(p.getAs[Long](c) == 0L, s"$c on empty input")
  }

  test("heavy hitters: exact counts, count-desc/token-asc order, k bound") {
    val d = Seq(
      ("s1", "a a a b b c"),
      ("s1", "b c c"),
      ("s2", "z z y")
    ).toDF("source", "text")
    val hh = Corpus.heavyHitters(d, "source", "text", k = 2)
      .orderBy("source", "rk").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // s1: a=3, b=3 (tie → token asc), c=3 — a,b win at k=2
    assert(hh.filter(_._1 == "s1").toSeq ==
      Seq(("s1", "a", 3L, 1L), ("s1", "b", 3L, 2L)))
    assert(hh.filter(_._1 == "s2").toSeq ==
      Seq(("s2", "z", 2L, 1L), ("s2", "y", 1L, 2L)))
  }

  test("ngram novelty: first doc fully novel, duplicate fully stale, ratio exact") {
    val d = Seq(
      (1L, "a b c d"),     // grams: abc, bcd — both first here
      (2L, "a b c d"),     // exact dup → novelty 0
      (3L, "a b c x y z")  // abc stale; bcx, cxy, xyz novel → 3/4
    ).toDF("doc_id", "text")
    val nv = graft.ext.Dedup.ngramNovelty(d, "doc_id", "text", 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(nv.toSeq == Seq(
      (1L, 2L, 2L, 1.0),
      (2L, 2L, 0L, 0.0),
      (3L, 4L, 3L, 0.75)))
  }

  test("label centroids: exact integer sums over quantized space, centroid = sum/n") {
    val emb = Seq(
      (0, Seq(127.0f, 0.0f)),   // amax=127 → scale=1 → q=(127,0)
      (0, Seq(0.0f, -127.0f)),  // q=(0,-127)
      (1, Seq(0.0f, 0.0f))      // all-zero vector → q=(0,0), no NaN
    ).toDF("label", "embedding")
    val c = Similarity.labelCentroidsInt8(emb, "label", "embedding")
      .orderBy("label", "pos").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(c.toSeq == Seq(
      (0, 0L, 2L, 127L, 16129L, 63.5),
      (0, 1L, 2L, -127L, 16129L, -63.5),
      (1, 0L, 1L, 0L, 0L, 0.0),
      (1, 1L, 1L, 0L, 0L, 0.0)))
  }

  test("chunking covers every token, tail chunk short, overlap = size - stride") {
    val chunks = Corpus.chunkDocuments(docs, "doc_id", "text", chunkSize = 4, stride = 3)
      .orderBy("doc_id", "chunk_id").collect()
    val d1 = chunks.filter(_.getLong(0) == 1L)
    // starts 0,3,6,9 → lens 4,4,4,1
    assert(d1.map(r => (r.getAs[Long]("start_tok"), r.getAs[Long]("chunk_len"))).toSeq ==
      Seq((0L, 4L), (3L, 4L), (6L, 4L), (9L, 1L)))
    assert(d1.map(_.getAs[String]("chunk_text")).toSeq ==
      Seq("a b c d", "d e f g", "g h i j", "j"))
    // every token index is covered by some chunk
    val covered = d1.flatMap(r => r.getAs[Long]("start_tok") until
      (r.getAs[Long]("start_tok") + r.getAs[Long]("chunk_len"))).toSet
    assert(covered == (0L until 10L).toSet)
    // a document shorter than one chunk yields exactly one full-coverage chunk
    val d2 = chunks.filter(_.getLong(0) == 2L)
    assert(d2.map(r => (r.getAs[Long]("chunk_id"), r.getAs[Long]("chunk_len"),
      r.getAs[String]("chunk_text"))).toSeq == Seq((0L, 3L, "x y z")))
  }

  test("tf-idf: df counts documents not occurrences; rank caps at k; rarer term wins") {
    val top = Corpus.tfidfTopK(docs, "doc_id", "text", k = 2)
    val rows = top.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term"),
      r.getAs[Long]("tf"), r.getAs[Long]("df"), r.getAs[Long]("rk")))
    assert(rows.groupBy(_._1).forall(_._2.length <= 2))
    // "a" occurs in docs 1 and 3 → df 2; "c" too; "x" only doc 2 → df 1
    val byTerm = rows.map(r => r._2 -> r._4).toMap
    assert(byTerm.get("x").forall(_ == 1L))
    // doc 3: tf(a)=3 df(a)=2, tf(b)=2 df(b)=2, tf(c)=1 df(c)=2 — ln(3/2) same
    // for all, so tf decides: a then b
    assert(rows.filter(_._1 == 3L).sortBy(_._5).map(_._2).toSeq == Seq("a", "b"))
  }

  test("inverted index: df = distinct docs per term, postings sorted and bounded") {
    val idx = Corpus.invertedIndex(docs, "doc_id", "text", sampleK = 2)
      .collect().map(r => r.getAs[String]("term") ->
        ((r.getAs[Long]("df"), r.getAs[String]("postings_sample")))).toMap
    assert(idx("a") == (2L, "1,3")) // docs 1 and 3, once each despite repeats
    assert(idx("x") == (1L, "2"))
    // sampleK bounds the sample: term "b" in docs 1,3 → both fit; all terms
    // have ≤ 2 postings listed
    assert(idx.values.forall(_._2.split(",").length <= 2))
  }

  test("int8 quantization: max saturates, zero vector safe, integer summaries bounded") {
    val emb = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(emb, "vec_id", "embedding")
      .orderBy("vec_id").collect()
    val r1 = q(0)
    assert(r1.getAs[Long]("n_dims") == 4L)
    assert(math.abs(r1.getAs[Double]("scale") - 1.0 / 127.0) < 1e-15)
    // 0.5→64 (0.5/ (1/127) = 63.5 → HALF_UP 64), -1.0→-127, 0.25→32, 0→0
    assert(r1.getAs[Long]("q_l1") == 64L + 127L + 32L)
    assert(r1.getAs[Long]("q_sum") == 64L - 127L + 32L)
    assert(r1.getAs[Long]("n_saturated") == 1L)
    val r2 = q(1)
    assert(r2.getAs[Double]("scale") == 0.0)
    assert(r2.getAs[Long]("q_l1") == 0L && r2.getAs[Long]("n_saturated") == 0L)
  }

  test("chunking plan is map-side only: no shuffle exchange") {
    val plan = Corpus.chunkDocuments(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
      "doc_id", "text", 64, 48).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("sourceStats: per-bucket stats partition the corpus; totals exact") {
    val d = Seq(
      ("s1", "a b c", 50L, "en"), ("s1", "d e", 149L, "en"),
      ("s1", "f", 150L, "de"), ("s2", "g h i j", 249L, "en")
    ).toDF("source", "text", "n_chars", "lang")
    val st = Corpus.sourceStats(d, "source", "text", "n_chars", "lang", bucketWidth = 100)
      .orderBy("source", "char_bucket").collect()
    assert(st.map(r => (r.getString(0), r.getLong(1), r.getAs[Long]("n_docs"),
      r.getAs[Long]("ws_tokens"), r.getAs[Long]("n_langs"))).toSeq == Seq(
      ("s1", 0L, 1L, 3L, 1L),   // chars 50 → bucket 0
      ("s1", 100L, 2L, 3L, 2L), // chars 149, 150 → bucket 100; langs {en, de}
      ("s2", 200L, 1L, 4L, 1L)))
  }

  test("semDeDup: list-min id always kept; high threshold keeps all; drops are cluster-local") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Similarity.semDeDup(e, "vec_id", "embedding", threshold = 0.3, nlist = 8)
      .cache()
    assert(out.count() == e.count(), "semDeDup must emit a verdict per vector")
    // the smallest id in every list has no smaller-id mate → always kept
    val minPerList = out.groupBy("list_id").agg(min("vec_id").as("vec_id"))
    val minKept = out.join(minPerList, Seq("list_id", "vec_id"))
    assert(minKept.filter(!col("kept")).count() == 0)
    // a threshold above max cosine drops nothing
    val none = Similarity.semDeDup(e, "vec_id", "embedding", threshold = 1.1, nlist = 8)
    assert(none.filter(!col("kept")).count() == 0)
    // a threshold below min cosine (-1) keeps exactly one vector per list
    val all = Similarity.semDeDup(e, "vec_id", "embedding", threshold = -1.1, nlist = 8)
    val keptPerList = all.filter(col("kept")).groupBy("list_id").count().collect()
    assert(keptPerList.forall(_.getLong(1) == 1L))
    out.unpersist()
  }

  test("spanDedup: first occurrence wins, within-doc dups collapse, total loss surfaces") {
    val d = Seq(
      (1L, "a b c d"),     // spans "a b", "c d" — both first
      (2L, "a b x y"),     // "a b" dup -> keeps "x y"
      (3L, "a b c d"),     // loses everything
      (4L, "p q p q")      // within-doc dup: keeps first "p q" only
    ).toDF("doc_id", "text")
    val out = Corpus.spanDedup(d, "doc_id", "text", spanTokens = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(out == Seq(
      (1L, 2L, 2L, "a b c d"),
      (2L, 2L, 1L, "x y"),
      (3L, 2L, 0L, ""),
      (4L, 2L, 1L, "p q")))
  }

  test("spanDedup: tail span shorter than spanTokens still dedups") {
    val d = Seq((1L, "a b c"), (2L, "z z c")).toDF("doc_id", "text")
    // spans at 2 tokens: d1 = ["a b", "c"], d2 = ["z z", "c"] — the 1-token
    // tail "c" first occurs in d1, so d2 keeps only "z z"
    val out = Corpus.spanDedup(d, "doc_id", "text", spanTokens = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSeq
    assert(out == Seq((1L, 2L, "a b c"), (2L, 1L, "z z")))
  }

  test("bigramLmScore: hand-computed Laplace conditionals, ordered fold") {
    import spark.implicits._
    // corpus: "a b a b" and "a b c" → bigrams: (a,b)×3, (b,a)×1, (b,c)×1;
    // lefts: a→3, b→2; V = 3 distinct tokens
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = graft.ext.Corpus.bigramLmScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("min_p"),
          r.getAs[Double]("mean_p"))).toMap
    val pAB = 4.0 / 6.0 // (3+1)/(3+3)
    val pBA = 2.0 / 5.0 // (1+1)/(2+3)
    val pBC = 2.0 / 5.0
    assert(got(1L) == ((3L, pBA, ((pAB + pBA) + pAB) / 3.0)))
    assert(got(2L) == ((2L, pBC, (pAB + pBC) / 2.0)))
    // invariant under repartitioning (fold order is pinned by position)
    val again = graft.ext.Corpus.bigramLmScore(docs.repartition(7),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("min_p"),
          r.getAs[Double]("mean_p"))).toMap
    assert(again == got)
  }

  test("tokenVocab: exact counts, rank order, cumulative coverage") {
    val d = Seq((1L, "a a a b"), (2L, "b c")).toDF("doc_id", "text")
    // counts: a=3, b=2, c=1; total=6
    val v = Corpus.tokenVocab(d, "text", topK = 2)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSeq
    assert(v == Seq(
      (1L, "a", 3L, 3L, 3.0 / 6.0),
      (2L, "b", 2L, 5L, 5.0 / 6.0)))
  }

  test("vocab growth: prefix cum_types equals a direct distinct count per prefix") {
    val corpus = (0L until 40L)
      .map(i => (i, s"w${i % 7} w${i % 13} shared t$i"))
      .toDF("doc_id", "text")
    val rows = Corpus.vocabGrowth(corpus, "doc_id", "text", buckets = 4)
      .orderBy("bucket").collect()
    assert(rows.length == 4)
    val toks: Long => Seq[String] =
      i => s"w${i % 7} w${i % 13} shared t$i".split(" ").toSeq
    rows.zipWithIndex.foreach { case (r, b) =>
      // equi-width on dense 0..39 ids: bucket b covers ids [10b, 10b+10)
      val prefix = (0L until (b + 1) * 10L).flatMap(toks)
      assert(r.getAs[Long]("cum_tokens") == prefix.size.toLong, s"bucket $b tokens")
      assert(r.getAs[Long]("cum_types") == prefix.distinct.size.toLong, s"bucket $b types")
      assert(r.getAs[Long]("type_token_bp") ==
        prefix.distinct.size.toLong * 10000 / prefix.size)
    }
    // conservation: bucket-local columns sum to the corpus totals
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == rows.last.getAs[Long]("cum_tokens"))
    assert(rows.map(_.getAs[Long]("new_types")).sum == rows.last.getAs[Long]("cum_types"))
  }

  test("DSIR weights: first-principles replay, target-like raw docs outrank soup") {
    val fix = Seq(
      // target corpus: about cats
      (0L, "en", "cat cat feline purr cat whiskers"),
      (1L, "en", "cat purr feline cat"),
      // raw: one target-like doc, one soup doc
      (10L, "de", "cat feline purr"),
      (11L, "de", "xylophone quartz bogon")
    ).toDF("doc_id", "lang", "text")
    val out = Corpus.dsirWeights(fix, "doc_id", "text",
        isTarget = col("lang") === "en", buckets = 64)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(10L, 11L))
    val catW = out(0).getAs[Double]("weight")
    val soupW = out(1).getAs[Double]("weight")
    assert(catW > 1.0, s"target-like doc must look target-like: $catW")
    assert(catW > soupW, s"ranking must prefer target-like: $catW vs $soupW")
    // exact replay from first principles (md5 bucket hash, Laplace
    // models, position-ordered IEEE product with init 1.0)
    def bucket(tok: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"dsir:$tok".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(4)
      Integer.parseInt(hex, 16) % 64
    }
    val tgtToks = Seq("cat cat feline purr cat whiskers", "cat purr feline cat")
      .flatMap(_.split(" ")).map(bucket)
    val rawToks = Seq("cat feline purr", "xylophone quartz bogon")
      .flatMap(_.split(" ")).map(bucket)
    val (nt, nr) = (tgtToks.size.toLong, rawToks.size.toLong)
    def ratio(f: Int): Double = {
      val ct = tgtToks.count(_ == f).toLong
      val cr = rawToks.count(_ == f).toLong
      (ct + 1).toDouble * (nr + 64).toDouble / ((cr + 1).toDouble * (nt + 64).toDouble)
    }
    val expected = "cat feline purr".split(" ").map(bucket)
      .foldLeft(1.0d)((acc, f) => acc * ratio(f))
    assert(catW == expected, s"bit-exact replay: $catW vs $expected")
  }

  test("vocab growth: invariant under repartitioning; duplicated corpus flattens the curve") {
    val corpus = (0L until 40L).map(i => (i, s"w${i % 7} u$i")).toDF("doc_id", "text")
    val Seq(a, b) = Seq(1, 5).map(n =>
      Corpus.vocabGrowth(corpus.repartition(n), "doc_id", "text", buckets = 4)
        .orderBy("bucket").collect().toSeq)
    assert(a == b)
    // an exact-duplicate corpus (every doc repeated) adds tokens but no
    // types beyond the original's: the dedup-health reading of the curve
    val dup = (0L until 40L).map(i => (i, s"w${i % 7} u${i / 2}")).toDF("doc_id", "text")
    val flat = Corpus.vocabGrowth(dup, "doc_id", "text", buckets = 4)
      .orderBy("bucket").collect()
    assert(flat.last.getAs[Long]("cum_types") < a.last.getAs[Long]("cum_types"))
  }

  test("bm25: first-principles replay fixes every rank; dl and df exact") {
    val top = Corpus.bm25TopK(docs, "doc_id", "text", k = 3)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term"),
        r.getAs[Long]("tf"), r.getAs[Long]("df"), r.getAs[Long]("dl"),
        r.getAs[Long]("rk")))
    // independent replay of the Robertson/Lucene formula in plain Scala
    val texts = Map(1L -> "a b c d e f g h i j", 2L -> "x y z", 3L -> "a a a b b c")
    val toks = texts.map { case (id, t) => id -> t.split(" ").toSeq }
    val nDocs = toks.size.toDouble
    val avgdl = toks.values.map(_.length).sum.toDouble / nDocs
    val dfm = toks.values.flatMap(_.distinct).groupBy(identity).map { case (t, o) => t -> o.size }
    def score(id: Long, term: String): Double = {
      val tf = toks(id).count(_ == term).toDouble
      val df = dfm(term).toDouble
      val idf = math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (toks(id).length / avgdl)))
    }
    toks.foreach { case (id, ts) =>
      val expect = ts.distinct.sortBy(t => (-score(id, t), t)).take(3)
      val got = top.filter(_._1 == id).sortBy(_._6)
      assert(got.map(_._2).toSeq == expect, s"doc $id rank order")
      assert(got.forall(_._5 == ts.length.toLong), s"doc $id dl")
    }
    // df counts documents, not occurrences: "a" is in docs 1 and 3
    assert(top.filter(_._2 == "a").forall(_._4 == 2L))
  }

  test("perplexity buckets: exact terciles on distinct keys; volumes conserved") {
    // train trigrams all hit with s = 1.0 (c3(a,b,c)=3 / cb(a,b)=3); each
    // scored doc appends i OOV tokens, so mean_i = (1 + i·floor)/(1+i)
    // strictly decreases with i — nine docs, nine distinct grid keys
    val train = Seq((0L, "a b c a b c a b c", "s")).toDF("doc_id", "text", "source")
    val scored = (0 until 9).map(i =>
      (2L * i + 1, "a b c" + (" o" * i), "s")).toDF("doc_id", "text", "source")
    val out = Corpus.perplexityBuckets(train, scored, "doc_id", "text", "source")
      .collect().map(r => r.getAs[String]("bucket") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("tok_scored"),
          r.getAs[Long]("min_key"), r.getAs[Long]("max_key")))).toMap
    // doc i scores 1+i trigram positions: head = i∈{0,1,2} (highest means),
    // middle = {3,4,5}, tail = {6,7,8}
    assert(out("head")._1 == 3L && out("head")._2 == 6L)
    assert(out("middle")._1 == 3L && out("middle")._2 == 15L)
    assert(out("tail")._1 == 3L && out("tail")._2 == 24L)
    // buckets are key-disjoint and ordered
    assert(out("head")._3 > out("middle")._4 && out("middle")._3 > out("tail")._4)
    // the pure-hit doc sits at exactly key 2^20 (mean_s = 1.0)
    assert(out("head")._4 == (1L << 20))
  }

  test("contamination audit: hit fractions, verdict thresholds, zero-hit docs present") {
    import graft.queries.CurationQueries
    val corpus = Seq((1L, "q w e r t")).toDF("doc_id", "text")
    val bench = Seq(
      (2L, "q w e r"),       // grams {qwe, wer} both in corpus → dirty
      (4L, "q w e x y z"),   // 1 of 4 grams shared → 2500 bp → partial
      (6L, "m n o p")        // no overlap → clean, still reported
    ).toDF("doc_id", "text")
    val out = CurationQueries.contaminationAudit(corpus, bench, "doc_id", "text", n = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_hit"),
          r.getAs[Long]("contam_bp"), r.getAs[String]("verdict")))).toMap
    assert(out(2L) == ((2L, 2L, 10000L, "dirty")))
    assert(out(4L) == ((4L, 1L, 2500L, "partial")))
    assert(out(6L) == ((2L, 0L, 0L, "clean")))
    assert(out.size == 3)
  }
}
