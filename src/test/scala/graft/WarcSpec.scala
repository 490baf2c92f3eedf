package graft

import java.nio.charset.StandardCharsets.UTF_8
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Warc

/** [[Warc]] torture suite under the container-tier discipline (the Mp4/Avi
  * precedent): round-trip law, exhaustive truncation sweep, hostile
  * framing, record cap, and the HTTP-payload split rules. */
class WarcSpec extends AnyFunSuite {

  private def entries = Seq(
    Warc.Entry("warcinfo", None, "application/warc-fields",
      "software: graft-crawler/1.0\r\n".getBytes(UTF_8)),
    Warc.Entry("request", Some("https://example.org/doc/7"),
      "application/http; msgtype=request", Warc.httpRequest("/doc/7")),
    Warc.Entry("response", Some("https://example.org/doc/7"),
      "application/http; msgtype=response",
      Warc.httpResponse("200 OK", "<html><body><p>hello</p></body></html>")))

  test("round-trip: synthesize then parse recovers every record's metadata") {
    val recs = Warc.parse(Warc.synthesize(entries))
    assert(recs.length == 3)
    assert(recs.map(_.warcType) == Seq("warcinfo", "request", "response"))
    assert(recs.map(_.targetUri) ==
      Seq("", "https://example.org/doc/7", "https://example.org/doc/7"))
    assert(recs.map(_.contentLength) == entries.map(_.payload.length.toLong))
    assert(recs.map(_.httpStatus) == Seq(None, None, Some(200)))
    // response body = the octets after the HTTP blank line
    val body = "<html><body><p>hello</p></body></html>"
    assert(recs(2).bodyLen == body.length)
    // request body is empty (headers end the payload)
    assert(recs(1).bodyLen == 0)
    // non-HTTP record: body = whole payload
    assert(recs(0).bodyLen == entries(0).payload.length)
  }

  test("truncation sweep: every prefix parses without throwing, yields only " +
       "complete records, never fabricates fields") {
    val full = Warc.synthesize(entries)
    val complete = Warc.parse(full)
    (0 to full.length).foreach { cut =>
      val recs = Warc.parse(full.take(cut))
      assert(recs.length <= complete.length)
      // every parsed record must equal its full-parse twin exactly
      recs.zip(complete).foreach { case (got, want) => assert(got == want, s"cut=$cut") }
    }
    assert(Warc.parse(full) == complete)
  }

  test("hostile framing stops the walk instead of guessing") {
    // not WARC at all
    assert(Warc.parse("HTTP/1.1 200 OK\r\n\r\n".getBytes(UTF_8)).isEmpty)
    // unparseable Content-Length: framing unusable, stop before the record
    val bad = ("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: xyz\r\n" +
      "\r\npayload\r\n\r\n").getBytes(UTF_8)
    assert(Warc.parse(bad).isEmpty)
    // negative length: same rule
    val neg = ("WARC/1.0\r\nWARC-Type: x\r\nContent-Length: -5\r\n\r\n\r\n\r\n")
      .getBytes(UTF_8)
    assert(Warc.parse(neg).isEmpty)
    // missing header terminator within the cap
    val open = ("WARC/1.0\r\nWARC-Type: x\r\nContent-Length: 3\r\nabc")
      .getBytes(UTF_8)
    assert(Warc.parse(open).isEmpty)
    // declared length past the blob end: complete-records-only
    val overrun = ("WARC/1.0\r\nWARC-Type: x\r\nContent-Length: 9999\r\n\r\nabc")
      .getBytes(UTF_8)
    assert(Warc.parse(overrun).isEmpty)
    // junk between records: first record emitted, walk stops at the junk
    val two = Warc.synthesize(entries.take(1)) ++ "JUNK".getBytes(UTF_8)
    assert(Warc.parse(two).map(_.warcType) == Seq("warcinfo"))
  }

  test("hostile payload CONTENT cannot confuse framing: embedded magic, " +
       "separators, and fake headers ride through as payload bytes") {
    // Content-Length drives framing — a payload containing the record
    // separator, the WARC magic, a fake Content-Length line, or chunked
    // framing noise must be carried verbatim, and the NEXT record must
    // still parse
    val hostile = Seq[Array[Byte]](
      "\r\n\r\nWARC/1.0\r\nContent-Length: 0\r\n\r\n".getBytes(UTF_8),
      ("HTTP/1.1 200 OK\r\n\r\n" + "\r\n\r\n0\r\n\r\n").getBytes(UTF_8),
      Array.fill(64)('\r'.toByte),
      Array[Byte]())
    hostile.foreach { p =>
      val blob = Warc.synthesize(Seq(
        Warc.Entry("resource", Some("u1"), "application/octet-stream", p),
        entries.last))
      val recs = Warc.parse(blob)
      assert(recs.length == 2, s"payload=${new String(p, UTF_8)}")
      assert(recs(0).contentLength == p.length)
      assert(recs(1).warcType == "response" && recs(1).httpStatus.contains(200))
    }
  }

  test("record cap bounds the walk") {
    val many = Warc.synthesize(Seq.fill(10)(entries.head))
    assert(Warc.parse(many).length == 10)
    assert(Warc.parse(many, maxRecords = 3).length == 3)
  }

  test("HTTP split rules: malformed payloads yield no status and no body") {
    // msgtype=response but payload has no HTTP blank line -> body 0, and a
    // status only if the status line parses
    val noBlank = Warc.synthesize(Seq(Warc.Entry("response", Some("u"),
      "application/http; msgtype=response", "HTTP/1.1 200 OK".getBytes(UTF_8))))
    val r = Warc.parse(noBlank).head
    assert(r.bodyLen == 0 && r.httpStatus.contains(200))
    // payload not starting with HTTP/: no status
    val notHttp = Warc.synthesize(Seq(Warc.Entry("response", Some("u"),
      "application/http; msgtype=response", "garbage\r\n\r\nbody".getBytes(UTF_8))))
    assert(Warc.parse(notHttp).head.httpStatus.isEmpty)
    // non-numeric status code: None, body still split
    val badCode = Warc.synthesize(Seq(Warc.Entry("response", Some("u"),
      "application/http; msgtype=response",
      "HTTP/1.1 OK\r\n\r\nbody!".getBytes(UTF_8))))
    val b = Warc.parse(badCode).head
    assert(b.httpStatus.isEmpty && b.bodyLen == 5)
  }

  private def chunkedRec(payload: String) = Warc.parse(Warc.synthesize(Seq(
    Warc.Entry("response", Some("u"), "application/http; msgtype=response",
      payload.getBytes(UTF_8))))).head

  test("chunked transfer-encoding: de-chunk reassembles the body exactly") {
    val body = "<html><body><p>hello chunked world</p></body></html>"
    val rec = Warc.parse(Warc.synthesize(Seq(Warc.Entry("response", Some("u"),
      "application/http; msgtype=response",
      Warc.httpResponseChunked("200 OK", body, body.length / 2))))).head
    assert(rec.httpStatus.contains(200))
    assert(rec.chunkSpans.length == 2)
    assert(rec.bodyLen == body.length)
    // identity-encoded twin yields the same body length and, through the
    // extractor, the same md5 — the q211 transparency law's core
    val plain = Warc.parse(Warc.synthesize(Seq(Warc.Entry("response", Some("u"),
      "application/http; msgtype=response",
      Warc.httpResponse("200 OK", body))))).head
    assert(plain.bodyLen == rec.bodyLen)
    // degenerate cuts collapse to one chunk, still exact
    Seq(0, body.length, 9999).foreach { cut =>
      val r1 = Warc.parse(Warc.synthesize(Seq(Warc.Entry("response", Some("u"),
        "application/http; msgtype=response",
        Warc.httpResponseChunked("200 OK", body, cut))))).head
      assert(r1.chunkSpans.length == 1 && r1.bodyLen == body.length, s"cut=$cut")
    }
  }

  test("chunked framing violations decode to the EMPTY body, never throw") {
    val te = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
    // bad hex digit in the size line
    assert(chunkedRec(te + "xz\r\nhi\r\n0\r\n\r\n").bodyLen == 0)
    // size overruns the payload
    assert(chunkedRec(te + "ff\r\nhi\r\n0\r\n\r\n").bodyLen == 0)
    // missing chunk-data CRLF
    assert(chunkedRec(te + "2\r\nhi0\r\n\r\n").bodyLen == 0)
    // missing 0-terminator
    assert(chunkedRec(te + "2\r\nhi\r\n").bodyLen == 0)
    // chunk extension is out of scope and rejected, not misparsed
    assert(chunkedRec(te + "2;ext=1\r\nhi\r\n0\r\n\r\n").bodyLen == 0)
    // leading-zero-padded size is VALID per RFC 9112 (r17: the cap moved
    // from digit count to the VALUE)
    assert(chunkedRec(te + "00000002\r\nhi\r\n0\r\n\r\n").bodyLen == 2)
    // a chunk VALUE of 2^28 is rejected (single-chunk cap), zeros or not
    assert(chunkedRec(te + "10000000\r\nhi\r\n0\r\n\r\n").bodyLen == 0)
    assert(chunkedRec(te + "0010000000\r\nhi\r\n0\r\n\r\n").bodyLen == 0)
    // empty chunked body (immediate terminator) is VALID and empty
    val r = chunkedRec(te + "0\r\n\r\n")
    assert(r.bodyLen == 0 && r.httpStatus.contains(200))
  }

  test("Transfer-Encoding detection is a header-line parse, not a substring " +
       "scan: 'chunked' elsewhere in the block cannot mis-trigger de-chunking") {
    // identity-encoded response whose headers merely MENTION chunked: the
    // body must ride through verbatim, not be fed to the chunk parser
    val mention = chunkedRec("HTTP/1.1 200 OK\r\n" +
      "Transfer-Encoding: identity\r\nX-Note: prefer chunked replies\r\n\r\n" +
      "hello body")
    assert(mention.bodyLen == "hello body".length && mention.chunkSpans.isEmpty)
    // the FINAL coding decides (RFC 9112 §6.1): gzip, chunked → de-chunk
    val layered = chunkedRec("HTTP/1.1 200 OK\r\n" +
      "Transfer-Encoding: gzip, chunked\r\n\r\n" + "2\r\nhi\r\n0\r\n\r\n")
    assert(layered.bodyLen == 2 && layered.chunkSpans.length == 1)
    // chunked NOT final: no de-chunk
    val notFinal = chunkedRec("HTTP/1.1 200 OK\r\n" +
      "Transfer-Encoding: chunked, gzip\r\n\r\n" + "raw")
    assert(notFinal.chunkSpans.isEmpty && notFinal.bodyLen == 3)
  }

  test("chunked cut unit is CHARACTERS: multibyte bodies cannot be severed " +
       "mid-UTF-8-sequence and the size lines are per-part byte lengths") {
    val body = "café 日本語 text" // é + CJK: 2- and 3-byte sequences
    (0 to body.length).foreach { cut =>
      val rec = chunkedRec(new String(
        Warc.httpResponseChunked("200 OK", body, cut), UTF_8))
      assert(rec.bodyLen == body.getBytes(UTF_8).length, s"cut=$cut")
      assert(rec.httpStatus.contains(200), s"cut=$cut")
    }
  }

  test("parseResync: corruption at every record position yields the exact " +
       "survivors + exact skip accounting; strict parse still stops") {
    val segs = entries.map(e => Warc.synthesize(Seq(e)))
    val full = segs.reduce(_ ++ _)
    val clean = Warc.parseResync(full)
    assert(clean.recs == Warc.parse(full))
    assert(clean.skippedSpans == 0 && clean.skippedBytes == 0L)
    (0 until 3).foreach { k =>
      val blob = segs.zipWithIndex.map { case (s, i) =>
        if (i == k) { val c = s.clone()
          System.arraycopy("JUNK".getBytes(UTF_8), 0, c, 0, 4); c
        } else s
      }.reduce(_ ++ _)
      val r = Warc.parseResync(blob)
      assert(r.recs.map(_.warcType) ==
        entries.zipWithIndex.collect { case (e, i) if i != k => e.warcType },
        s"k=$k")
      // the skipped span is EXACTLY the corrupt record's serialization
      // (for the tail record: the scan-to-EOF branch, same count)
      assert(r.skippedSpans == 1 && r.skippedBytes == segs(k).length.toLong,
        s"k=$k")
      assert(Warc.parse(blob).length == k, s"k=$k") // strict stops there
    }
  }

  test("parseResync: header-level corruption (dead Content-Length) skips " +
       "the record with the same exact accounting") {
    val segs = entries.map(e => Warc.synthesize(Seq(e)))
    val blob = {
      val s = new String(segs(1), UTF_8)
        .replace("Content-Length", "Content-Lxngth") // same byte length
      segs(0) ++ s.getBytes(UTF_8) ++ segs(2)
    }
    val r = Warc.parseResync(blob)
    assert(r.recs.map(_.warcType) == Seq("warcinfo", "response"))
    assert(r.skippedSpans == 1 && r.skippedBytes == segs(1).length.toLong)
  }

  test("parseResync boundary classes: junk between records, missing " +
       "separator, truncated tail, all-junk, and the resync cap") {
    val segs = entries.map(e => Warc.synthesize(Seq(e)))
    // junk between records: both records survive, the junk is the span
    val junky = segs(0) ++ "XXXX".getBytes(UTF_8) ++ segs(1)
    val j = Warc.parseResync(junky)
    assert(j.recs.map(_.warcType) == Seq("warcinfo", "request"))
    assert(j.skippedSpans == 1 && j.skippedBytes == 4L)
    // missing record separator, next record back-to-back: the complete
    // record is KEPT, the anomaly counts as a zero-byte span
    val noSep = segs(0).dropRight(4) ++ segs(1)
    val n = Warc.parseResync(noSep)
    assert(n.recs.map(_.warcType) == Seq("warcinfo", "request"))
    assert(n.skippedSpans == 1 && n.skippedBytes == 0L)
    // truncated tail: survivors + the remainder as one measured span
    val cut = segs(0).length + segs(1).length + 10
    val t = Warc.parseResync(segs.reduce(_ ++ _).take(cut))
    assert(t.recs.map(_.warcType) == Seq("warcinfo", "request"))
    assert(t.skippedSpans == 1 && t.skippedBytes == 10L)
    // all junk: zero records, one span covering the whole blob
    val g = Warc.parseResync("no warc content here at all".getBytes(UTF_8))
    assert(g.recs.isEmpty && g.skippedSpans == 1 && g.skippedBytes == 27L)
    // resync cap: 5 records, 0/2/4 corrupt, maxSpans=2 — the third
    // failure charges the remainder as one final span and stops
    val five = (0 until 5).map(_ => segs(0).clone()).toArray
    Seq(0, 2, 4).foreach(i =>
      System.arraycopy("JUNK".getBytes(UTF_8), 0, five(i), 0, 4))
    val capped = Warc.parseResync(five.reduce(_ ++ _), maxSpans = 2)
    assert(capped.recs.length == 2) // records 1 and 3 survive
    assert(capped.skippedSpans == 3)
    assert(capped.skippedBytes == 3L * segs(0).length)
  }

  test("generative resync fuzz: random corruption patterns over random " +
       "record sequences — survivors exact, accounting exact, never throws") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genEntry: Gen[Warc.Entry] = for {
      t <- Gen.oneOf("warcinfo", "resource", "metadata")
      n <- Gen.chooseNum(0, 120)
      // payloads from a CRLF-free alphabet so a corrupt record's span
      // can't contain a fake boundary — the model then predicts resync
      // exactly (hostile payload CONTENT is covered by its own test)
      p <- Gen.listOfN(n, Gen.oneOf(('a' to 'z') :+ ' '))
    } yield Warc.Entry(t, Some("https://h/x"), "application/octet-stream",
      p.mkString.getBytes(UTF_8))
    val genBlob = for {
      k <- Gen.chooseNum(1, 8)
      es <- Gen.listOfN(k, genEntry)
      mask <- Gen.listOfN(k, Gen.oneOf(true, false, false)) // ~1/3 corrupt
    } yield (es, mask)
    (0 until 80).foreach { i =>
      val (es, mask) = genBlob.pureApply(Gen.Parameters.default, Seed(5100L + i))
      val segs = es.map(e => Warc.synthesize(Seq(e)))
      val blob = segs.zip(mask).map { case (s, corrupt) =>
        if (corrupt) { val c = s.clone()
          System.arraycopy("JUNK".getBytes(UTF_8), 0, c, 0, 4); c
        } else s
      }.reduce(_ ++ _)
      val r = Warc.parseResync(blob)
      // model: survivors are exactly the uncorrupted records in order;
      // each corrupt RUN (consecutive corrupted segments collapse into
      // one scan) is one span covering its segments' serialized bytes
      val wantTypes = es.zip(mask).collect { case (e, false) => e.warcType }
      assert(r.recs.map(_.warcType) == wantTypes, s"seed ${5100 + i}")
      val runs = mask.foldLeft(List.empty[List[Int]] -> 0) {
        case ((acc, idx), corrupt) =>
          val nacc =
            if (!corrupt) acc
            else acc match {
              case h :: t if h.last == idx - 1 => (h :+ idx) :: t
              case _ => List(idx) :: acc
            }
          (nacc, idx + 1)
      }._1
      assert(r.skippedSpans == runs.length, s"seed ${5100 + i}")
      val wantBytes = runs.flatten.map(segs(_).length.toLong).sum
      assert(r.skippedBytes == wantBytes, s"seed ${5100 + i}")
      // conservation: skipped + surviving serializations = whole blob
      assert(r.skippedBytes +
        es.zip(mask).collect { case (e, false) => e }
          .map(e => Warc.synthesize(Seq(e)).length.toLong).sum == blob.length,
        s"seed ${5100 + i}")
    }
  }

  test("gzip layer: round-trip, truncation, garbage, and the zip-bomb guard") {
    val blob = Warc.synthesize(entries)
    val gz = Warc.gzip(blob)
    // round-trip under a generous cap
    assert(Warc.gunzip(gz, 1 << 20).map(_.toSeq).contains(blob.toSeq))
    // parse-through equivalence
    assert(Warc.gunzip(gz, 1 << 20).map(Warc.parse(_)).contains(Warc.parse(blob)))
    // truncated member: no partial output, no throw
    (0 until gz.length by 7).foreach { cut =>
      val r = Warc.gunzip(gz.take(cut), 1 << 20)
      assert(r.isEmpty || r.get.sameElements(blob), s"cut=$cut")
    }
    // garbage is not gzip
    assert(Warc.gunzip("WARC/1.0 not gzip".getBytes(UTF_8), 1 << 20).isEmpty)
    // bomb guard: 1 MiB of zeros compresses to ~1 KiB; a 4 KiB cap must
    // refuse to inflate it rather than allocate the megabyte
    val bomb = Warc.gzip(new Array[Byte](1 << 20))
    assert(bomb.length < (1 << 13))
    assert(Warc.gunzip(bomb, 1 << 12).isEmpty)
    // exact-cap payload still inflates (the guard is > cap, not >= cap)
    val atCap = new Array[Byte](1 << 12)
    assert(Warc.gunzip(Warc.gzip(atCap), 1 << 12).map(_.length).contains(1 << 12))
  }

  test("extractResponseBodies hands the exact body strings to the text tier") {
    val spark = TestSpark.spark
    import spark.implicits._
    val blob = Warc.synthesize(entries :+ Warc.Entry("response", Some("u2"),
      "application/http; msgtype=response",
      Warc.httpResponse("404 Not Found", "gone")))
    val got = Warc.extractResponseBodies(Seq((7L, blob)).toDS())
      .select("blob_id", "uri", "http_status", "body")
      .as[(Long, String, Long, String)].collect().sortBy(_._3).toSeq
    assert(got == Seq(
      (7L, "https://example.org/doc/7", 200L,
        "<html><body><p>hello</p></body></html>"),
      (7L, "u2", 404L, "gone")))
  }

  private def respEntry(payload: Array[Byte]) =
    Warc.Entry("response", Some("u"), "application/http; msgtype=response",
      payload)

  test("Content-Encoding: gzip bodies are the identity twin's CONTENT — " +
       "strings, byte mass and md5 all equal; corrupt/bomb bodies EMPTY") {
    val spark = TestSpark.spark
    import spark.implicits._
    val body = "<html><body><p>packed tight café</p></body></html>"
    val blob = Warc.synthesize(Seq(
      respEntry(Warc.httpResponse("200 OK", body)),
      respEntry(Warc.httpResponseEnc("200 OK", body, None, gzipBody = true))))
    val strs = Warc.extractResponseBodies(Seq((1L, blob)).toDS())
      .select("rec_idx", "body").as[(Long, String)].collect().sortBy(_._1)
    assert(strs.map(_._2).toSeq == Seq(body, body))
    val meta = Warc.extractRecords(Seq((1L, blob)).toDS())
      .select("rec_idx", "body_bytes", "body_md5")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(meta(0)._2 == meta(1)._2 && meta(0)._3 == meta(1)._3)
    assert(meta(0)._2 == body.getBytes(UTF_8).length.toLong)
    // content_length still exposes the wire framing difference
    // corrupt gzip stream: body decodes EMPTY, never throws
    val gzPay = Warc.httpResponseEnc("200 OK", body, None, gzipBody = true)
    gzPay(gzPay.length - 12) = (gzPay(gzPay.length - 12) ^ 0x55).toByte
    val corrupt = Warc.parse(Warc.synthesize(Seq(respEntry(gzPay)))).head
    assert(corrupt.contentGzip)
    assert(Warc.decodedBodyBytes(Warc.synthesize(Seq(respEntry(gzPay))),
      corrupt).isEmpty)
    // bomb guard at the body layer: a 1 MiB-inflating body under a 4 KiB
    // cap refuses to allocate, yields the empty body
    val bombBlob = Warc.synthesize(Seq(respEntry(
      ("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n").getBytes(UTF_8) ++
        Warc.gzip(new Array[Byte](1 << 20)))))
    val bombRec = Warc.parse(bombBlob).head
    assert(Warc.decodedBodyBytes(bombBlob, bombRec, maxOut = 1 << 12).isEmpty)
    // non-final gzip coding (gzip, identity) does NOT mark the body
    val notFinal = Warc.parse(Warc.synthesize(Seq(respEntry(
      ("HTTP/1.1 200 OK\r\nContent-Encoding: gzip, identity\r\n\r\nraw")
        .getBytes(UTF_8))))).head
    assert(!notFinal.contentGzip && notFinal.bodyLen == 3)
  }

  test("Content-Encoding: deflate — BOTH server spellings decode to the " +
       "identity twin's content; hostile streams EMPTY, never a throw (r19)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val body = "<html><body><p>deflated café</p></body></html>"
    // the kernel round-trips both spellings
    assert(Warc.inflate(Warc.deflate(body.getBytes(UTF_8)), 1 << 20)
      .get.toSeq == body.getBytes(UTF_8).toSeq)
    assert(Warc.inflate(Warc.deflate(body.getBytes(UTF_8), raw = true),
      1 << 20).get.toSeq == body.getBytes(UTF_8).toSeq)
    // end-to-end: identity, zlib-wrapped, raw, and raw+latin1 all land
    // on the same decoded string; mass + md5 are over the CONTENT octets
    val blob = Warc.synthesize(Seq(
      respEntry(Warc.httpResponse("200 OK", body)),
      respEntry(Warc.httpResponseCoded("200 OK", body, None, Some("deflate"))),
      respEntry(Warc.httpResponseCoded("200 OK", body, None,
        Some("deflate-raw"))),
      respEntry(Warc.httpResponseCoded("200 OK", body, Some("ISO-8859-1"),
        Some("deflate-raw")))))
    val strs = Warc.extractResponseBodies(Seq((1L, blob)).toDS())
      .select("rec_idx", "body").as[(Long, String)].collect().sortBy(_._1)
    assert(strs.map(_._2).toSeq == Seq(body, body, body, body))
    val meta = Warc.extractRecords(Seq((1L, blob)).toDS())
      .select("rec_idx", "body_bytes", "body_md5")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(meta.take(3).map(_._2).distinct.length == 1)
    assert(meta.take(3).map(_._3).distinct.length == 1)
    assert(meta(0)._2 == body.getBytes(UTF_8).length.toLong)
    // corrupt deflate stream (neither spelling decodes): EMPTY body
    val dfPay = Warc.httpResponseCoded("200 OK", body, None, Some("deflate"))
    dfPay(dfPay.length - 8) = (dfPay(dfPay.length - 8) ^ 0x55).toByte
    val corrupt = Warc.parse(Warc.synthesize(Seq(respEntry(dfPay)))).head
    assert(corrupt.contentDeflate && !corrupt.contentGzip)
    assert(Warc.decodedBodyBytes(Warc.synthesize(Seq(respEntry(dfPay))),
      corrupt).isEmpty)
    // bomb guard: a 1 MiB-inflating deflate body under a 4 KiB cap
    val bombBlob = Warc.synthesize(Seq(respEntry(
      ("HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n")
        .getBytes(UTF_8) ++ Warc.deflate(new Array[Byte](1 << 20)))))
    val bombRec = Warc.parse(bombBlob).head
    assert(bombRec.contentDeflate)
    assert(Warc.decodedBodyBytes(bombBlob, bombRec, maxOut = 1 << 12).isEmpty)
    // truncated stream: EMPTY, never a hang or a throw
    val trunc = Warc.deflate(body.getBytes(UTF_8)).dropRight(4)
    assert(Warc.inflate(trunc, 1 << 20).isEmpty)
    // a codec-less final coding (br) marks NEITHER flag: pass-through
    val br = Warc.parse(Warc.synthesize(Seq(respEntry(
      ("HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\nxyz")
        .getBytes(UTF_8))))).head
    assert(!br.contentGzip && !br.contentDeflate && br.bodyLen == 3)
    // non-final deflate coding (deflate, identity) does NOT mark
    val nf = Warc.parse(Warc.synthesize(Seq(respEntry(
      ("HTTP/1.1 200 OK\r\nContent-Encoding: deflate, identity\r\n\r\nraw")
        .getBytes(UTF_8))))).head
    assert(!nf.contentDeflate && nf.bodyLen == 3)
  }

  test("charset parameter: the declared encoding decodes the body (quoted " +
       "or bare), unknown names fall back to UTF-8") {
    val spark = TestSpark.spark
    import spark.implicits._
    val body = "café déjà vu"
    def bodyOf(payload: Array[Byte]): String =
      Warc.extractResponseBodies(Seq((1L,
        Warc.synthesize(Seq(respEntry(payload))))).toDS())
        .select("body").as[String].collect().head
    // latin-1: 1-byte wire form, exact round-trip
    assert(bodyOf(Warc.httpResponseEnc("200 OK", body,
      Some("ISO-8859-1"))) == body)
    // the charset is load-bearing: raw latin-1 bytes read as UTF-8 would
    // NOT round-trip (0xE9 is an invalid UTF-8 start byte)
    assert(new String(body.getBytes("ISO-8859-1"), UTF_8) != body)
    // quoted charset value
    assert(bodyOf(("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html; charset=\"ISO-8859-1\"\r\n\r\n").getBytes(UTF_8)
      ++ body.getBytes("ISO-8859-1")) == body)
    // unknown charset: UTF-8 fallback, never a throw
    assert(bodyOf(("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html; charset=klingon-8\r\n\r\nascii only")
      .getBytes(UTF_8)) == "ascii only")
    // charset parse records the verbatim value
    val rec = Warc.parse(Warc.synthesize(Seq(respEntry(
      Warc.httpResponseEnc("200 OK", "x", Some("ISO-8859-1")))))).head
    assert(rec.charset == "ISO-8859-1")
    // gzip + latin-1 layered: inflate first, then charset-decode
    assert(bodyOf(Warc.httpResponseEnc("200 OK", body, Some("ISO-8859-1"),
      gzipBody = true)) == body)
  }

  test("charset locator is index-safe under Unicode case expansion and " +
       "finds uppercase CHARSET= (r17 ADVICE)") {
    // U+0130 (İ) lowercases to TWO chars — a lowered-copy index applied
    // back to the original would overrun and throw; parse must not.
    val hostile = Warc.parse(Warc.synthesize(Seq(respEntry(
      ("HTTP/1.1 200 OK\r\n" +
        "Content-Type: text/html; İİİcharset=ISO-8859-1\r\n" +
        "\r\nbody").getBytes(UTF_8)))))
    assert(hostile.head.charset == "ISO-8859-1")
    // uppercase parameter name is found regardless of JVM default locale
    val upper = Warc.parse(Warc.synthesize(Seq(respEntry(
      ("HTTP/1.1 200 OK\r\n" +
        "Content-Type: text/html; CHARSET=ISO-8859-1\r\n" +
        "\r\nbody").getBytes(UTF_8)))))
    assert(upper.head.charset == "ISO-8859-1")
  }

  test("meta-charset prescan: both spellings honored header-lessly, header " +
       "wins over a lying meta, window-bounded, never throws (r18)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val body = "café déjà vu"
    def bodyOf(payload: Array[Byte]): String =
      Warc.extractResponseBodies(Seq((1L,
        Warc.synthesize(Seq(respEntry(payload))))).toDS())
        .select("body").as[String].collect().head
    def page(meta: String) =
      s"<html><head>$meta</head><body>$body</body></html>"
    def plainHdr = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
    // header-less + <meta charset=...>: prescan decodes latin-1 exactly
    val m1 = page("<meta charset=\"ISO-8859-1\">")
    assert(bodyOf(plainHdr.getBytes(UTF_8) ++ m1.getBytes("ISO-8859-1")) == m1)
    // the legacy http-equiv spelling, unquoted value, odd spacing
    val m2 = page("<meta http-equiv=Content-Type " +
      "content=\"text/html; charset = ISO-8859-1\">")
    assert(bodyOf(plainHdr.getBytes(UTF_8) ++ m2.getBytes("ISO-8859-1")) == m2)
    // HTTP header wins over a LYING meta (precedence per spec)
    val m3 = page("<meta charset=\"utf-8\">")
    assert(bodyOf(("HTTP/1.1 200 OK\r\nContent-Type: text/html; " +
      "charset=ISO-8859-1\r\n\r\n").getBytes(UTF_8) ++
      m3.getBytes("ISO-8859-1")) == m3)
    // beyond the 1024-byte window: NOT honored, UTF-8 fallback shreds é
    val m4 = page("<!--" + "x" * 1100 + "--><meta charset=\"ISO-8859-1\">")
    assert(bodyOf(plainHdr.getBytes(UTF_8) ++ m4.getBytes("ISO-8859-1"))
      == m4.replace("é", "�").replace("à", "�"))
    // direct kernel: empty and binary junk never throw
    assert(Warc.sniffCharset(Array.emptyByteArray) == "")
    assert(Warc.sniffCharset(Array.fill[Byte](2000)(0x9c.toByte)) == "")
    // a charset= OUTSIDE a meta tag is not a declaration
    assert(Warc.sniffCharset(
      "<p>set charset=KOI8-R in your editor</p>".getBytes(UTF_8)) == "")
    // DECOY (r19 attribute fidelity): a content attribute merely
    // MENTIONING charset= — no http-equiv — must not hijack the encoding
    assert(Warc.sniffCharset(("<meta name=\"description\" " +
      "content=\"use charset=KOI8-R for this page\">").getBytes(UTF_8)) == "")
    // decoy first, real declaration second: the real one still wins
    assert(Warc.sniffCharset(("<meta name=\"d\" content=\"charset=KOI8-R\">" +
      "<meta charset=\"ISO-8859-1\">").getBytes(UTF_8)) == "ISO-8859-1")
    // http-equiv on some OTHER header does not make content a declaration
    assert(Warc.sniffCharset(("<meta http-equiv=\"refresh\" " +
      "content=\"0; url=x?charset=KOI8-R\">").getBytes(UTF_8)) == "")
    // attribute order reversed on the legacy spelling still parses
    assert(Warc.sniffCharset(("<meta content=\"text/html; charset=KOI8-R\" " +
      "http-equiv=\"Content-Type\">").getBytes(UTF_8)) == "KOI8-R")
    // WHATWG remap: a meta claiming a UTF-16 family is lying about the
    // ASCII-compatible bytes it was decoded from — remapped to UTF-8,
    // never honored verbatim (r19 ADVICE)
    assert(Warc.sniffCharset(
      "<meta charset=\"utf-16\">".getBytes(UTF_8)) == "UTF-8")
    assert(Warc.sniffCharset(
      "<meta charset=\"UTF-16LE\">".getBytes(UTF_8)) == "UTF-8")
    assert(Warc.sniffCharset(
      "<meta charset=\"utf-16be\">".getBytes(UTF_8)) == "UTF-8")
    assert(Warc.sniffCharset(
      "<meta charset=\"x-user-defined\">".getBytes(UTF_8)) == "windows-1252")
    // end-to-end: a lying utf-16 meta decodes the page as UTF-8
    val m5 = page("<meta charset=\"utf-16\">")
    assert(bodyOf(plainHdr.getBytes(UTF_8) ++ m5.getBytes(UTF_8)) == m5)
  }

  test("BOM sniffing is step one: consumed never leaked, beats a lying " +
       "header and a lying meta, works under the content layer (r18)") {
    val spark = TestSpark.spark
    import spark.implicits._
    import java.nio.charset.StandardCharsets.{UTF_16BE, UTF_16LE}
    val body = "café déjà vu"
    def bodyOf(payload: Array[Byte]): String =
      Warc.extractResponseBodies(Seq((1L,
        Warc.synthesize(Seq(respEntry(payload))))).toDS())
        .select("body").as[String].collect().head
    val bom8 = Array(0xEF, 0xBB, 0xBF).map(_.toByte)
    val bomLE = Array(0xFF, 0xFE).map(_.toByte)
    val bomBE = Array(0xFE, 0xFF).map(_.toByte)
    def plainHdr = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
    // UTF-8 BOM: consumed — no U+FEFF at the head of the text
    assert(bodyOf(plainHdr.getBytes(UTF_8) ++ bom8 ++ body.getBytes(UTF_8))
      == body)
    // UTF-16LE BOM beats a lying latin-1 header parameter
    assert(bodyOf(("HTTP/1.1 200 OK\r\nContent-Type: text/html; " +
      "charset=ISO-8859-1\r\n\r\n").getBytes(UTF_8) ++ bomLE ++
      body.getBytes(UTF_16LE)) == body)
    // UTF-16BE BOM beats a lying in-window meta, under gzip
    val metab = "<meta charset=\"ISO-8859-1\">" + body
    assert(bodyOf(("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n" +
      "Content-Type: text/html\r\n\r\n").getBytes(UTF_8) ++
      Warc.gzip(bomBE ++ metab.getBytes(UTF_16BE))) == metab)
    // a lone 0xFF first byte (no 0xFE after) is NOT a BOM: UTF-8 fallback
    assert(bodyOf(plainHdr.getBytes(UTF_8) ++ Array(0xFF.toByte) ++
      "abc".getBytes(UTF_8)) == "�abc")
  }

  test("transfer layer strictly before content layer: a chunked gzip body " +
       "reassembles the stream, THEN inflates (RFC 9110 ordering)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val body = "layered body café through two codings"
    val gz = Warc.gzip(body.getBytes(UTF_8))
    val out = new java.io.ByteArrayOutputStream()
    out.write(("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n" +
      "Transfer-Encoding: chunked\r\n\r\n").getBytes(UTF_8))
    val cut = gz.length / 2 // binary cut mid-stream: reassembly must be exact
    Seq(gz.take(cut), gz.drop(cut)).foreach { p =>
      out.write(f"${p.length}%x\r\n".getBytes(UTF_8))
      out.write(p)
      out.write("\r\n".getBytes(UTF_8))
    }
    out.write("0\r\n\r\n".getBytes(UTF_8))
    val got = Warc.extractResponseBodies(Seq((1L,
      Warc.synthesize(Seq(respEntry(out.toByteArray))))).toDS())
      .select("body").as[String].collect().head
    assert(got == body)
  }

  test("extractConversions: WET-style conversion records round-trip " +
       "arbitrary unicode text, and non-conversion records don't leak in") {
    val spark = TestSpark.spark
    import spark.implicits._
    val texts = Seq("plain ascii", "café 日本語 данные", "", "line1\nline2")
    val blob = Warc.synthesize(
      texts.zipWithIndex.map { case (t, i) =>
        Warc.Entry("conversion", Some(s"https://h/doc/$i"), "text/plain",
          t.getBytes(UTF_8))
      } :+ entries.last) // a response record must NOT appear
    val got = Warc.extractConversions(Seq((3L, blob)).toDS())
      .select("rec_idx", "uri", "content_length", "text")
      .as[(Long, String, Long, String)].collect().sortBy(_._1).toSeq
    assert(got.map(_._4) == texts)
    assert(got.map(_._3) == texts.map(_.getBytes(UTF_8).length.toLong))
    assert(got.forall(_._2.startsWith("https://h/doc/")))
  }

  test("cdxIndex + seekRecord: every indexed extent range-reads back to " +
       "exactly the walked record; stale/corrupt extents yield None (r18)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val members = entries.map(e => Warc.gzip(Warc.synthesize(Seq(e))))
    val blob = members.reduce(_ ++ _)
    val idx = Warc.cdxIndex(Seq((5L, blob)).toDS())
      .select("ordinal", "offset", "length", "uri", "http_status",
        "body_bytes", "body_md5")
      .as[(Long, Long, Long, Option[String], Option[Long], Option[Long],
        Option[String])].collect().toSeq.sortBy(_._1)
    assert(idx.length == entries.length)
    // extents tile the blob exactly
    assert(idx.map(_._3).sum == blob.length.toLong)
    assert(idx.head._2 == 0L)
    // the seek law: every extent reproduces the record the walk saw
    idx.foreach { case (ord, off, len, uri, st, bb, md5) =>
      val got = Warc.seekRecord(blob, off, len)
      assert(got.contains((uri.getOrElse(""), st, bb, md5)), s"ordinal $ord")
    }
    // off-by-one anywhere: not a valid member, None — never a wrong record
    val (_, off1, len1, _, _, _, _) = idx(1)
    assert(Warc.seekRecord(blob, off1 + 1, len1).isEmpty)
    assert(Warc.seekRecord(blob, off1, len1 - 1).isEmpty)
    // out-of-bounds extents are guarded, never a throw
    assert(Warc.seekRecord(blob, -1, 10).isEmpty)
    assert(Warc.seekRecord(blob, blob.length - 4, 400).isEmpty)
    assert(Warc.seekRecord(blob, 0, 0).isEmpty)
  }

  test("extractMetadata: WAT-style metadata records round-trip their " +
       "warc-fields payload; other record types never leak in") {
    val spark = TestSpark.spark
    import spark.implicits._
    val fields = "Status: 200\r\nTitle: café page\r\nOutlinks: /a /b\r\n"
    val blob = Warc.synthesize(Seq(
      Warc.Entry("metadata", Some("https://h/1"), "application/warc-fields",
        fields.getBytes(UTF_8)),
      Warc.Entry("response", Some("https://h/1"),
        "application/http; msgtype=response",
        Warc.httpResponse("200 OK", "body")),
      Warc.Entry("metadata", None, "application/warc-fields",
        "Status: 404\r\n".getBytes(UTF_8))))
    val got = Warc.extractMetadata(Seq((3L, blob)).toDS())
      .select("blob_id", "rec_idx", "uri", "content_length", "fields")
      .as[(Long, Long, Option[String], Long, String)].collect().toSeq
      .sortBy(_._2)
    assert(got == Seq(
      (3L, 0L, Some("https://h/1"), fields.getBytes(UTF_8).length.toLong, fields),
      (3L, 2L, None, 13L, "Status: 404\r\n")))
  }

  test("revisit records: extra WARC headers round-trip, refers-to is " +
       "captured, and revisits never leak into the response row set") {
    val spark = TestSpark.spark
    import spark.implicits._
    val blob = Warc.synthesize(Seq(
      Warc.Entry("revisit", Some("https://h/p?v=2"),
        "application/http; msgtype=response",
        Warc.httpResponse("304 Not Modified", ""),
        extraHeaders = Seq("WARC-Refers-To-Target-URI" -> "https://h/p",
          "WARC-Profile" -> "x/identical-payload-digest")),
      entries.last))
    val recs = Warc.parse(blob)
    assert(recs.length == 2)
    assert(recs.head.warcType == "revisit")
    assert(recs.head.refersTo == "https://h/p")
    assert(recs.head.httpStatus.contains(304) && recs.head.bodyLen == 0)
    assert(recs(1).refersTo == "") // absent header stays empty
    val rv = Warc.extractRevisits(Seq((1L, blob)).toDS())
      .select("uri", "refers_to").as[(String, Option[String])].collect().toSeq
    assert(rv == Seq(("https://h/p?v=2", Some("https://h/p"))))
  }

  test("final record at exact EOF (no trailing separator) is still complete") {
    val full = Warc.synthesize(entries.take(1))
    val noSep = full.dropRight(4)
    assert(Warc.parse(noSep).map(_.warcType) == Seq("warcinfo"))
  }

  test("ETag header surfaces verbatim (quotes and weak prefix preserved — " +
       "RFC 9110 opaque-tag comparison), absent = empty (r18)") {
    def recOf(payload: String) =
      Warc.parse(Warc.synthesize(Seq(respEntry(payload.getBytes(UTF_8))))).head
    assert(recOf("HTTP/1.1 200 OK\r\nETag: \"abc123\"\r\n\r\nx")
      .etag == "\"abc123\"")
    assert(recOf("HTTP/1.1 200 OK\r\netag: W/\"v2\"\r\n\r\nx")
      .etag == "W/\"v2\"") // case-insensitive name, verbatim value
    assert(recOf("HTTP/1.1 200 OK\r\n\r\nx").etag == "")
  }

  test("Location header surfaces case-insensitively, case-preserved value") {
    val rec = Warc.parse(Warc.synthesize(Seq(Warc.Entry("response", Some("u"),
      "application/http; msgtype=response",
      "HTTP/1.1 301 Moved Permanently\r\nlOcAtIoN:  https://Ex.org/Next \r\n\r\n"
        .getBytes(UTF_8))))).head
    assert(rec.httpStatus.contains(301))
    assert(rec.location == "https://Ex.org/Next")
    // builder round-trip + no Location on a plain 200
    val r2 = Warc.parse(Warc.synthesize(Seq(Warc.Entry("response", Some("u"),
      "application/http; msgtype=response",
      Warc.httpRedirect("https://t/x"))))).head
    assert(r2.location == "https://t/x" && r2.bodyLen == 0)
    assert(Warc.parse(Warc.synthesize(Seq(entries.last))).head.location == "")
  }

  test("gzip member walk: boundaries, FNAME headers, truncation, bomb guard") {
    val payloads = entries.map(e => Warc.synthesize(Seq(e)))
    val members = payloads.map(Warc.gzip)
    val stream = members.reduce(_ ++ _)
    val bounds = Warc.gzipMemberBounds(stream)
    assert(bounds.length == 3)
    // boundaries are exact: each member inflates back to its record
    bounds.zip(payloads).foreach { case ((off, len), want) =>
      val m = java.util.Arrays.copyOfRange(stream, off, off + len)
      assert(Warc.gunzip(m, 1 << 20).map(_.toSeq).contains(want.toSeq))
    }
    assert(bounds.map(_._2).sum == stream.length)
    // FNAME-flagged member (header the JDK writer never emits): splice a
    // filename into member 0 — the walk must skip it and still frame
    val withName = {
      val m = members.head
      val out = new java.io.ByteArrayOutputStream()
      out.write(m, 0, 3); out.write(m(3) | 8) // set FNAME
      out.write(m, 4, 6)
      out.write("crawl-00.warc".getBytes(UTF_8)); out.write(0)
      out.write(m, 10, m.length - 10)
      out.toByteArray
    }
    val named = Warc.gzipMemberBounds(withName ++ members(1))
    assert(named.length == 2 && named.head._2 == withName.length)
    // truncation: every prefix yields only complete members, never throws
    (0 until stream.length by 11).foreach { cut =>
      val got = Warc.gzipMemberBounds(stream.take(cut))
      assert(got.length <= 3 && got == bounds.take(got.length), s"cut=$cut")
    }
    // per-member bomb guard: a huge-inflating member stops the walk
    val bomb = Warc.gzip(new Array[Byte](1 << 20)) ++ members.head
    assert(Warc.gzipMemberBounds(bomb, maxOut = 1 << 12).isEmpty)
    // garbage is not a member stream
    assert(Warc.gzipMemberBounds("not gzip at all".getBytes(UTF_8)).isEmpty)
  }

  test("gzMembersResync: torn members, in-place deflate corruption (CRC " +
       "catch), tail junk, bomb member — exact compressed-domain loss") {
    val payloads = entries.map(e => Warc.synthesize(Seq(e)))
    val members = payloads.map(Warc.gzip)
    // clean stream: every payload back, zero loss
    val clean = Warc.gzMembersResync(members.reduce(_ ++ _))
    assert(clean.payloads.map(_.toSeq) == payloads.map(_.toSeq))
    assert(clean.skippedMembers == 0 && clean.skippedMemberBytes == 0)
    // torn member: 64 junk bytes between two valid members
    val junk = Array.fill[Byte](64)('X')
    val torn = Warc.gzMembersResync(members(0) ++ junk ++ members(1))
    assert(torn.payloads.map(_.toSeq) == Seq(payloads(0).toSeq, payloads(1).toSeq))
    assert(torn.skippedMembers == 1 && torn.skippedMemberBytes == 64)
    // junk at EOF: loss measured to the end, nothing fabricated
    val tail = Warc.gzMembersResync(members(0) ++ junk)
    assert(tail.payloads.length == 1 && tail.skippedMembers == 1 &&
      tail.skippedMemberBytes == 64)
    // IN-PLACE corruption mid-member: flip a byte in the middle of the
    // deflate stream — the Inflater may still "finish", only the CRC32
    // trailer check can reject it; the whole member is one skipped span
    // and the walk re-anchors at the NEXT member's magic
    (0 until 8).foreach { d =>
      val bad = members(1).clone()
      val at = bad.length / 2 + d
      bad(at) = (bad(at) ^ 0x5b).toByte
      val r = Warc.gzMembersResync(members(0) ++ bad ++ members(2))
      assert(r.payloads.map(_.toSeq) ==
        Seq(payloads(0).toSeq, payloads(2).toSeq), s"d=$d")
      assert(r.skippedMembers >= 1, s"d=$d")
      assert(r.payloads.map(_.length).sum + 0 ==
        payloads(0).length + payloads(2).length, s"d=$d")
      // loss covers exactly the corrupt member's compressed bytes
      // (resync may count >1 span if a false 1f8b08 appears in the
      // corrupted stream, but the byte total is exact)
      assert(r.skippedMemberBytes == bad.length, s"d=$d")
    }
    // trailer corruption: flip a bit in the ISIZE field
    val badTrailer = members(1).clone()
    badTrailer(badTrailer.length - 1) =
      (badTrailer(badTrailer.length - 1) ^ 1).toByte
    val rt = Warc.gzMembersResync(members(0) ++ badTrailer ++ members(2))
    assert(rt.payloads.map(_.toSeq) == Seq(payloads(0).toSeq, payloads(2).toSeq))
    assert(rt.skippedMemberBytes == badTrailer.length)
    // bomb member: skipped (never allocated past the cap), walk continues
    val bomb = Warc.gzip(new Array[Byte](1 << 20))
    val rb = Warc.gzMembersResync(bomb ++ members(0), maxOut = 1 << 12)
    assert(rb.payloads.map(_.toSeq) == Seq(payloads(0).toSeq))
    assert(rb.skippedMembers == 1 && rb.skippedMemberBytes == bomb.length)
    // garbage-only stream: one span covering everything
    val g = Warc.gzMembersResync("no gzip here".getBytes(UTF_8))
    assert(g.payloads.isEmpty && g.skippedMembers == 1 &&
      g.skippedMemberBytes == 12)
    // member-count cap with bytes remaining: the un-walked tail is
    // charged as ONE final skipped span — loss accounting stays exact
    // at the cap (r19 ADVICE)
    val capped = Warc.gzMembersResync(members.reduce(_ ++ _), maxMembers = 2)
    assert(capped.payloads.map(_.toSeq) ==
      Seq(payloads(0).toSeq, payloads(1).toSeq))
    assert(capped.skippedMembers == 1)
    assert(capped.skippedMemberBytes ==
      members.drop(2).map(_.length.toLong).sum)
    // cap reached exactly at EOF: nothing remains, nothing charged
    val exact = Warc.gzMembersResync(members(0) ++ members(1), maxMembers = 2)
    assert(exact.payloads.length == 2 && exact.skippedMembers == 0 &&
      exact.skippedMemberBytes == 0)
  }

  test("foreign-sidecar BOM honesty: a third-party WET/WAT payload with a " +
       "BOM decodes under it, consumed never leaked; ours stay UTF-8 (r19)") {
    val spark = TestSpark.spark
    import spark.implicits._
    import java.nio.charset.StandardCharsets.UTF_16LE
    val text = "extracted café text"
    val bom8 = Array(0xEF, 0xBB, 0xBF).map(_.toByte)
    val bomLE = Array(0xFF, 0xFE).map(_.toByte)
    val blob = Warc.synthesize(Seq(
      Warc.Entry("conversion", Some("u0"), "text/plain",
        text.getBytes(UTF_8)), // our convention: plain UTF-8
      Warc.Entry("conversion", Some("u1"), "text/plain",
        bom8 ++ text.getBytes(UTF_8)), // foreign, UTF-8 BOM
      Warc.Entry("conversion", Some("u2"), "text/plain",
        bomLE ++ text.getBytes(UTF_16LE)))) // foreign, UTF-16LE
    val texts = Warc.extractConversions(Seq((1L, blob)).toDS())
      .select("rec_idx", "text").as[(Long, String)].collect()
      .sortBy(_._1).map(_._2).toSeq
    assert(texts == Seq(text, text, text),
      "BOM must be honored for the decode and consumed from the text")
    // same rule on the WAT side
    val fields = "Status: 200\r\nTitle: café\r\n"
    val wat = Warc.synthesize(Seq(
      Warc.Entry("metadata", Some("u0"), "application/warc-fields",
        bomLE ++ fields.getBytes(UTF_16LE))))
    val got = Warc.extractMetadata(Seq((1L, wat)).toDS())
      .select("fields").as[String].collect().head
    assert(got == fields)
  }

  test("synthesizeGzMembers: as-written extents ARE the re-walked extents, " +
       "and seeking through them reproduces every record (r19)") {
    val (blob, extents) = Warc.synthesizeGzMembers(entries)
    assert(extents.length == entries.length)
    // extents tile the blob exactly: contiguous, gap-free, end at EOF
    extents.foldLeft(0L) { case (at, (off, len)) =>
      assert(off == at, s"gap or overlap at $off (expected $at)")
      off + len
    }
    assert(extents.last._1 + extents.last._2 == blob.length)
    // the generic member walk reproduces the as-written extents
    assert(Warc.gzipMemberBounds(blob).map { case (o, l) => (o.toLong, l.toLong) }
      == extents)
    // seeking each extent reproduces that record (uri identity)
    extents.zip(entries).foreach { case ((off, len), e) =>
      val got = Warc.seekRecord(blob, off, len)
      assert(got.isDefined, s"seek failed at ($off, $len)")
      assert(got.get._1 == e.targetUri.getOrElse(""),
        s"wrong record at ($off, $len)")
    }
    // an off-by-one extent CANNOT reproduce a record
    val (o0, l0) = extents.head
    assert(Warc.seekRecord(blob, o0 + 1, l0).isEmpty)
    assert(Warc.seekRecord(blob, o0, l0 - 1).isEmpty)
  }

  test("extractHostile: both resync tiers + body encodings compose — rows " +
       "and all four loss columns exact") {
    val spark = TestSpark.spark
    import spark.implicits._
    // five docs: [0] plain, [1] torn member (64 junk bytes), [2] dead
    // record inside a CRC-valid member, [3] gzip+latin1 body, [4] plain
    val body = "café corpus body with enough text"
    def member(id: Int, payload: Array[Byte], mangle: Boolean = false) = {
      val rec = Warc.synthesize(Seq(Warc.Entry("response",
        Some(s"https://example.org/doc/$id"),
        "application/http; msgtype=response", payload)))
      if (mangle) System.arraycopy("JUNK".getBytes(UTF_8), 0, rec, 0, 4)
      (rec, Warc.gzip(rec))
    }
    val (_, m0) = member(0, Warc.httpResponse("200 OK", body))
    val junk = Array.fill[Byte](64)('X')
    val (deadRec, m2) = member(2, Warc.httpResponse("200 OK", body), mangle = true)
    val (_, m3) = member(3, Warc.httpResponseEnc("200 OK", body,
      Some("ISO-8859-1"), gzipBody = true))
    val (_, m4) = member(4, Warc.httpResponse("404 Not Found", body))
    val blob = m0 ++ junk ++ m2 ++ m3 ++ m4
    val got = Warc.extractHostile(Seq((7L, blob)).toDS())
      .as[(Long, Long, String, Long, String, Long, Long, Long, Long)]
      .collect().toSeq.sortBy(_._2)
    assert(got.map(r => (r._2, r._3, r._4, r._5)) == Seq(
      (0L, "https://example.org/doc/0", 200L, body),
      (1L, "https://example.org/doc/3", 200L, body), // recovered + decoded
      (2L, "https://example.org/doc/4", 404L, body)))
    got.foreach { r =>
      assert(r._1 == 7L)
      assert(r._6 == 1L, "skipped_spans: the dead record")
      assert(r._7 == deadRec.length.toLong, "skipped_bytes: its full serialization")
      assert(r._8 == 1L, "skipped_members: the torn member")
      assert(r._9 == 64L, "skipped_member_bytes")
    }
  }

  test("extractHostile: a fully destroyed blob still emits its loss row — " +
       "record fields NULL, every byte charged to skipped_member_bytes (r19)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val body = "still here café"
    val good = Warc.gzip(Warc.synthesize(Seq(Warc.Entry("response",
      Some("https://example.org/doc/9"),
      "application/http; msgtype=response",
      Warc.httpResponse("200 OK", body)))))
    val junkBlob = Array.fill[Byte](512)('X')
    val rows = Warc.extractHostile(
        Seq((1L, junkBlob), (2L, good), (3L, Array.emptyByteArray)).toDS())
      .as[(Long, Option[Long], Option[String], Option[Long], Option[String],
        Long, Long, Long, Long)]
      .collect().toSeq.sortBy(_._1)
    assert(rows.map(_._1) == Seq(1L, 2L, 3L), "one row per blob, ALWAYS")
    // blob 1: all-junk — nothing recoverable, loss row carries the bytes
    val lost = rows(0)
    assert(lost._2.isEmpty && lost._3.isEmpty && lost._4.isEmpty &&
      lost._5.isEmpty, "record fields must be NULL on the loss row")
    assert(lost._8 == 1L && lost._9 == 512L,
      "the destroyed blob's bytes must appear in skipped_member_bytes")
    assert(lost._6 == 0L && lost._7 == 0L)
    // blob 2: intact — the normal row shape, zero loss
    assert(rows(1)._3.contains("https://example.org/doc/9") &&
      rows(1)._5.contains(body))
    assert(rows(1)._6 == 0L && rows(1)._7 == 0L && rows(1)._8 == 0L &&
      rows(1)._9 == 0L)
    // blob 3: EMPTY bytes — zero survivors, zero loss, still observable
    assert(rows(2)._2.isEmpty && rows(2)._6 == 0L && rows(2)._9 == 0L)
  }

  test("generative round-trip: random record sequences with random binary " +
       "payloads survive synthesize → [gzip →] parse metadata-exactly") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genEntry: Gen[Warc.Entry] = for {
      t <- Gen.oneOf("warcinfo", "request", "response", "resource", "metadata")
      u <- Gen.option(Gen.alphaNumStr.map(s => s"https://h/$s"))
      ct <- Gen.oneOf("application/octet-stream", "application/warc-fields",
        "text/plain")
      n <- Gen.chooseNum(0, 300)
      p <- Gen.listOfN(n, Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
    } yield Warc.Entry(t, u, ct, p.map(_.toByte).toArray)
    val genBlob: Gen[List[Warc.Entry]] =
      Gen.chooseNum(0, 8).flatMap(Gen.listOfN(_, genEntry))
    (0 until 60).foreach { i =>
      val es = genBlob.pureApply(Gen.Parameters.default, Seed(4200L + i))
      val blob = Warc.synthesize(es)
      Seq(Warc.parse(blob),
          Warc.gunzip(Warc.gzip(blob), 1 << 22).map(Warc.parse(_)).get)
        .foreach { recs =>
          assert(recs.length == es.length, s"seed ${4200 + i}")
          recs.zip(es).foreach { case (r, e) =>
            assert(r.warcType == e.warcType && r.contentLength == e.payload.length
              && r.targetUri == e.targetUri.getOrElse(""), s"seed ${4200 + i}")
            // non-HTTP content types: body = the whole payload, no status
            assert(r.httpStatus.isEmpty && r.bodyLen == e.payload.length,
              s"seed ${4200 + i}")
          }
        }
    }
  }

  test("generative chunked round-trip: random bodies and cut points " +
       "reassemble exactly") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      n <- Gen.chooseNum(0, 120)
      cs <- Gen.listOfN(n, Gen.oneOf(('a' to 'z') ++ ('0' to '9') :+ ' '))
      cut <- Gen.chooseNum(-3, 130)
    } yield (cs.mkString, cut)
    (0 until 80).foreach { i =>
      val (body, cut) = gen.pureApply(Gen.Parameters.default, Seed(8800L + i))
      val rec = chunkedRec(new String(
        Warc.httpResponseChunked("200 OK", body, cut), UTF_8))
      assert(rec.bodyLen == body.length, s"seed ${8800 + i} cut=$cut")
      assert(rec.httpStatus.contains(200), s"seed ${8800 + i}")
    }
  }
}
