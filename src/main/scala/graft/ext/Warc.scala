package graft.ext

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Dataset}

/** WARC (Web ARChive, ISO 28500) container walk — the format CommonCrawl
  * and every serious crawler actually ship, and therefore the byte-level
  * front door of a 100 TB web pipeline (the [[Html]] extractor's input
  * lives inside these records). Round 16, third member of the container
  * tier after [[Mp4]] and [[Avi]], under the same discipline:
  *
  *   - strictly bounded: every read is inside the array; a declared
  *     Content-Length never frames a record past the blob end
  *     (complete-records-only — a truncated tail record is dropped, it
  *     cannot fabricate fields from bytes it doesn't own);
  *   - guaranteed progress: the cursor strictly advances or the walk
  *     stops; header scans are capped ([[MaxHeaderBytes]]) and the
  *     record count is capped (`maxRecords`);
  *   - never throws on hostile bytes: malformed magic, missing blank
  *     line, unparseable/negative Content-Length all STOP the walk
  *     (framing depends on the length — after a bad length nothing
  *     downstream is trustworthy) and return what was complete so far.
  *     [[parseResync]] is the production twin: same per-record parse,
  *     but a malformed record re-anchors at the next `WARC/1.` version
  *     magic with EXACT loss accounting (spans + bytes) instead of
  *     discarding the rest of the blob.
  *
  * Record grammar (WARC/1.x): a version line, `Name: value` header
  * lines, CRLF CRLF, `Content-Length` payload octets, CRLF CRLF. For
  * `application/http` payloads the HTTP message is split at ITS blank
  * line: status code from the status line (`msgtype=response` only),
  * body = the octets after the HTTP headers.
  */
object Warc {

  /** Max bytes a single record's WARC header block may span. */
  val MaxHeaderBytes = 8192

  private val Crlf = "\r\n"

  /** Case-insensitive `charset=` locator applied to the ORIGINAL
    * header value — never to a lowered copy whose indices can drift
    * under Unicode case expansion (see the Content-Type parse). */
  private val CharsetParam = java.util.regex.Pattern.compile("(?i)charset=")

  /** One record to [[synthesize]]: (WARC-Type, optional target URI,
    * Content-Type, payload octets, extra WARC headers verbatim — e.g.
    * WARC-Refers-To-Target-URI / WARC-Profile on revisit records). */
  final case class Entry(warcType: String, targetUri: Option[String],
                         contentType: String, payload: Array[Byte],
                         extraHeaders: Seq[(String, String)] = Nil)

  /** A parsed record's metadata (offsets index into the source blob).
    * `chunkSpans` is non-empty only for a successfully de-chunked
    * Transfer-Encoding: chunked body — the body octets are the spans
    * CONCATENATED, and bodyOffset/bodyLen summarize them (first span
    * start, total de-chunked length). A chunked body whose framing is
    * malformed decodes to the empty body, same as an HTTP payload with
    * no blank line. `contentGzip` marks a Content-Encoding whose final
    * coding is gzip — the record stays pure span metadata (cheap,
    * equality-safe); consumers inflate through [[decodedBodyBytes]].
    * `charset` is the Content-Type charset parameter verbatim ("" when
    * absent); [[extractResponseBodies]] decodes with it (UTF-8
    * fallback for unknown names). */
  final case class Rec(recIdx: Int, warcType: String, targetUri: String,
                       contentLength: Long, httpStatus: Option[Int],
                       bodyOffset: Int, bodyLen: Int,
                       chunkSpans: Seq[(Int, Int)] = Nil,
                       location: String = "",
                       contentGzip: Boolean = false,
                       charset: String = "",
                       refersTo: String = "",
                       etag: String = "",
                       contentDeflate: Boolean = false)

  /** Serialize records into one WARC blob (the round-trip anchor the
    * torture specs cut prefixes from). */
  def synthesize(entries: Seq[Entry]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    entries.foreach { e =>
      val sb = new StringBuilder
      sb.append("WARC/1.0").append(Crlf)
      sb.append("WARC-Type: ").append(e.warcType).append(Crlf)
      e.targetUri.foreach(u => sb.append("WARC-Target-URI: ").append(u).append(Crlf))
      e.extraHeaders.foreach { case (n, v) =>
        sb.append(n).append(": ").append(v).append(Crlf)
      }
      sb.append("Content-Type: ").append(e.contentType).append(Crlf)
      sb.append("Content-Length: ").append(e.payload.length).append(Crlf)
      sb.append(Crlf)
      out.write(sb.toString.getBytes(UTF_8))
      out.write(e.payload)
      out.write((Crlf + Crlf).getBytes(UTF_8))
    }
    out.toByteArray
  }

  /** HTTP response payload around an HTML body. */
  def httpResponse(status: String, body: String): Array[Byte] =
    (s"HTTP/1.1 $status${Crlf}Content-Type: text/html$Crlf$Crlf$body")
      .getBytes(UTF_8)

  /** HTTP response with the body in Transfer-Encoding: chunked framing,
    * split at CHARACTER `cut` (RFC 9112 §7.1: hex size line, data, CRLF
    * per chunk; 0-size terminator). The split unit is characters — the
    * same unit the SQL oracle's substr() cuts at — and each part is
    * UTF-8-encoded AFTER the split, so multibyte text can never be
    * severed mid-sequence or desynchronize engine and oracle (each
    * chunk's hex size line is that part's UTF-8 BYTE length). Chunk
    * extensions and trailers are not emitted — and not consumed by the
    * parser — by scope. */
  def httpResponseChunked(status: String, body: String, cut: Int): Array[Byte] = {
    val at = math.max(0, math.min(cut, body.length))
    val parts = Seq(body.take(at), body.drop(at)).filter(_.nonEmpty)
      .map(_.getBytes(UTF_8))
    val sb = new StringBuilder
    sb.append(s"HTTP/1.1 $status${Crlf}Transfer-Encoding: chunked$Crlf$Crlf")
    val out = new ByteArrayOutputStream()
    out.write(sb.toString.getBytes(UTF_8))
    parts.foreach { p =>
      out.write(f"${p.length}%x$Crlf".getBytes(UTF_8))
      out.write(p)
      out.write(Crlf.getBytes(UTF_8))
    }
    out.write(s"0$Crlf$Crlf".getBytes(UTF_8))
    out.toByteArray
  }

  /** HTTP response with explicit body encodings — the q217 synthesis:
    * optional Content-Type charset parameter (the body string is encoded
    * in THAT charset), optional Content-Encoding: gzip (the encoded
    * bytes are gzipped — content layer on top of charset layer, the
    * inverse of the parse order). */
  def httpResponseEnc(status: String, body: String,
                      charset: Option[String] = None,
                      gzipBody: Boolean = false): Array[Byte] =
    httpResponseCoded(status, body, charset,
      if (gzipBody) Some("gzip") else None)

  /** [[httpResponseEnc]] generalized over the content coding: `coding`
    * is the `Content-Encoding` token to declare — "gzip", "deflate"
    * (zlib-wrapped, the RFC 9110 meaning), or "deflate-raw" (declares
    * `deflate` but ships RFC 1951 raw bytes — the broken-server
    * spelling the read path must tolerate). */
  def httpResponseCoded(status: String, body: String,
                        charset: Option[String] = None,
                        coding: Option[String] = None): Array[Byte] = {
    val ct = "Content-Type: text/html" +
      charset.map(c => s"; charset=$c").getOrElse("")
    val declared = coding.map {
      case "deflate-raw" => "deflate"
      case c => c
    }
    val ce = declared.map(c => s"Content-Encoding: $c$Crlf").getOrElse("")
    val enc = body.getBytes(charset.map(java.nio.charset.Charset.forName)
      .getOrElse(UTF_8))
    val payload = coding match {
      case Some("gzip") => gzip(enc)
      case Some("deflate") => deflate(enc)
      case Some("deflate-raw") => deflate(enc, raw = true)
      case _ => enc
    }
    (s"HTTP/1.1 $status$Crlf$ct$Crlf$ce$Crlf").getBytes(UTF_8) ++ payload
  }

  /** HTTP request payload for a path. */
  def httpRequest(path: String): Array[Byte] =
    (s"GET $path HTTP/1.1${Crlf}Host: example.org$Crlf$Crlf").getBytes(UTF_8)

  /** HTTP 301 redirect payload (empty body, Location header). */
  def httpRedirect(location: String): Array[Byte] =
    (s"HTTP/1.1 301 Moved Permanently${Crlf}Location: $location$Crlf$Crlf")
      .getBytes(UTF_8)

  /** Decode RFC 9112 chunked framing inside [from, until): Some(spans of
    * chunk DATA) on clean framing, None on any violation — bad hex, a
    * chunk VALUE of 2^28 or more (the single-chunk cap — leading zeros
    * are valid per RFC 9112 and don't count against it), missing CRLFs,
    * data overrunning the payload. Bounds arithmetic is in Long so a
    * declared size near Int.MaxValue cannot wrap negative and slip past
    * the overrun check. Chunk extensions/trailers are out of scope and
    * rejected, keeping the decode deterministic. */
  private def parseChunks(b: Array[Byte], from: Int,
                          until: Int): Option[Seq[(Int, Int)]] = {
    val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var c = from
    while (spans.length < 100000) {
      var i = c
      var size = 0L
      var digits = 0
      while (i < until && b(i) != '\r') {
        val d = Character.digit(b(i), 16)
        if (d < 0) return None
        size = size * 16 + d
        digits += 1
        if (size >= (1L << 28)) return None // cap the VALUE, not the digits
        i += 1
      }
      if (digits == 0 || i + 1 >= until || b(i + 1) != '\n') return None
      val dataStart = i + 2
      if (size == 0) return Some(spans.toSeq) // terminator; trailers ignored
      val dataEnd = dataStart.toLong + size // Long: no Int wrap on huge sizes
      if (dataEnd + 2 > until || b(dataEnd.toInt) != '\r' ||
          b(dataEnd.toInt + 1) != '\n')
        return None
      spans += ((dataStart, dataEnd.toInt))
      c = dataEnd.toInt + 2
    }
    None // chunk-count bomb
  }

  private def indexOfCrlfCrlf(b: Array[Byte], from: Int, until: Int): Int = {
    var i = from
    val end = math.min(until, b.length) - 4 // i+3 must stay in-bounds
    while (i <= end) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  private def startsWith(b: Array[Byte], at: Int, s: String): Boolean = {
    if (at + s.length > b.length) return false
    var i = 0
    while (i < s.length) {
      if (b(at + i) != s.charAt(i)) return false
      i += 1
    }
    true
  }

  /** Parse ONE record at offset `c`: None when framing fails AT `c` (bad
    * magic, unterminated header, unusable Content-Length, truncated
    * payload); Some((record, next cursor, separator-missing flag)) on a
    * complete record. The flag is true when the record ended without its
    * CRLF CRLF separator and more bytes follow — the strict walk stops
    * there, the resync walk scans. */
  private def parseOne(bytes: Array[Byte], c: Int,
                       recIdx: Int): Option[(Rec, Int, Boolean)] = {
      if (!startsWith(bytes, c, "WARC/")) return None
      val hEnd = indexOfCrlfCrlf(bytes, c, c + MaxHeaderBytes)
      if (hEnd < 0) return None
      val header = new String(bytes, c, hEnd - c, UTF_8)
      var warcType = ""
      var uri = ""
      var ctype = ""
      var clen = -1L
      var refersTo = ""
      header.split("\r\n").iterator.drop(1).foreach { line =>
        val i = line.indexOf(':')
        if (i > 0) {
          val name = line.substring(0, i).trim.toLowerCase
          val value = line.substring(i + 1).trim
          name match {
            case "warc-type" => warcType = value
            case "warc-target-uri" => uri = value
            case "warc-refers-to-target-uri" => refersTo = value
            case "content-type" => ctype = value
            case "content-length" =>
              clen = try value.toLong catch { case _: NumberFormatException => -1L }
            case _ => ()
          }
        }
      }
      if (clen < 0) return None // framing unusable past this point
      val pStart = hEnd + 4
      if (clen > bytes.length - pStart) return None // truncated tail
      val pEnd = pStart + clen.toInt
      // HTTP payload split: status from the first line (responses), body
      // after the HTTP blank line; non-HTTP records keep the raw payload
      // as the body with no status
      var status: Option[Int] = None
      var bodyOff = pStart
      var bodyLen = pEnd - pStart
      var spans: Seq[(Int, Int)] = Nil
      var location = ""
      var etag = ""
      var contentGzip = false
      var contentDeflate = false
      var charset = ""
      if (ctype.startsWith("application/http")) {
        val hh = indexOfCrlfCrlf(bytes, pStart, pEnd)
        if (hh >= 0 && hh + 4 <= pEnd) {
          bodyOff = hh + 4
          bodyLen = pEnd - bodyOff
          val httpRaw = new String(bytes, pStart, hh - pStart, UTF_8)
          // Location header (redirect target, case preserved) — the
          // redirect-chain resolver's input (q212)
          httpRaw.split("\r\n").find(_.toLowerCase.startsWith("location:"))
            .foreach(l => location = l.substring("location:".length).trim)
          // ETag (cache validator, value verbatim incl. quotes/W/ —
          // RFC 9110 §8.8.3 comparison is on the whole opaque tag) —
          // the conditional-recrawl reconciler's input (q237)
          httpRaw.split("\r\n").find(_.toLowerCase.startsWith("etag:"))
            .foreach(l => etag = l.substring("etag:".length).trim)
          // Transfer-Encoding is parsed as a HEADER LINE, not a substring
          // scan over the whole block: only a Transfer-Encoding whose
          // FINAL coding (RFC 9112 §6.1: last token of the list) is
          // "chunked" triggers de-chunking — "identity" plus some other
          // header merely mentioning the word cannot mis-detect
          val teChunked = httpRaw.split("\r\n").iterator
            .filter(_.toLowerCase.startsWith("transfer-encoding:"))
            .exists { l =>
              val v = l.substring("transfer-encoding:".length)
              v.split(",").last.trim.toLowerCase == "chunked"
            }
          // Content-Encoding (content layer — applies AFTER de-chunking):
          // final coding gzip/x-gzip or deflate marks the body for
          // consumer-side inflation; same header-line discipline as
          // Transfer-Encoding. Every OTHER coding (br, zstd, …) rides
          // through as its compressed bytes — the JDK ships no codec for
          // them, so they are a documented pass-through (the Multimodal
          // video-stub precedent), never a throw.
          httpRaw.split("\r\n").iterator
            .filter(_.toLowerCase.startsWith("content-encoding:"))
            .foreach { l =>
              val v = l.substring("content-encoding:".length)
                .split(",").last.trim.toLowerCase
              if (v == "gzip" || v == "x-gzip") contentGzip = true
              else if (v == "deflate") contentDeflate = true
            }
          // Content-Type charset parameter, value verbatim (quotes
          // stripped) — the body's DECLARED character encoding. The
          // parameter is located with a case-insensitive regex on the
          // ORIGINAL string: lowering a copy and applying its index back
          // to the original is wrong under Unicode case expansion
          // (U+0130 lowercases to TWO chars, shifting every later
          // index), and default-locale toLowerCase misses "CHARSET="
          // under a Turkish-locale JVM.
          httpRaw.split("\r\n").find(_.toLowerCase.startsWith("content-type:"))
            .foreach { l =>
              val v = l.substring("content-type:".length)
              val m = CharsetParam.matcher(v)
              if (m.find()) {
                var cv = v.substring(m.end())
                val sc = cv.indexOf(';')
                if (sc >= 0) cv = cv.substring(0, sc)
                charset = cv.trim.stripPrefix("\"").stripSuffix("\"")
              }
            }
          if (teChunked) {
            parseChunks(bytes, bodyOff, pEnd) match {
              case Some(sp) =>
                spans = sp
                bodyOff = sp.headOption.map(_._1).getOrElse(bodyOff)
                bodyLen = sp.iterator.map(s => s._2 - s._1).sum
              case None => bodyLen = 0 // malformed framing = empty body
            }
          }
        } else {
          bodyLen = 0
        }
        if (ctype.contains("msgtype=response") && startsWith(bytes, pStart, "HTTP/")) {
          val lineEnd = {
            var i = pStart
            while (i < pEnd && bytes(i) != '\r') i += 1
            i
          }
          val parts = new String(bytes, pStart, lineEnd - pStart, UTF_8).split(" ")
          if (parts.length >= 2)
            status = try Some(parts(1).toInt) catch { case _: NumberFormatException => None }
        }
      }
      val rec = Rec(recIdx, warcType, uri, clen, status, bodyOff, bodyLen,
        spans, location, contentGzip, charset, refersTo, etag, contentDeflate)
      // record separator CRLF CRLF; a record flush at EOF is still complete
      val next = if (startsWith(bytes, pEnd, Crlf + Crlf)) pEnd + 4 else pEnd
      Some((rec, next, next == pEnd && pEnd < bytes.length))
  }

  /** Walk a blob; returns the complete records in order. Never throws.
    * STRICT framing: the walk stops at the first malformed record or
    * missing separator and returns what was complete so far (see
    * [[parseResync]] for the recovering walk). */
  def parse(bytes: Array[Byte], maxRecords: Int = 10000): Seq[Rec] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Rec]
    var c = 0
    while (c < bytes.length && out.length < maxRecords) {
      parseOne(bytes, c, out.length) match {
        case None => return out.toSeq
        case Some((rec, next, sepMissing)) =>
          out += rec
          if (sepMissing) return out.toSeq // junk after payload
          if (next <= c) return out.toSeq // progress guard
          c = next
      }
    }
    out.toSeq
  }

  /** [[parseResync]]'s result: the surviving records plus EXACT loss
    * accounting — how many corrupt spans were skipped and how many bytes
    * they covered. recs.map(_.recIdx) is 0..n-1 over SURVIVORS. */
  final case class ResyncResult(recs: Seq[Rec], skippedSpans: Int,
                                skippedBytes: Long)

  /** First offset >= `from` where a WARC/1.x version magic begins — the
    * resync anchor (the `WARC/1.` spelling cannot collide with the
    * `WARC-`-hyphenated header names inside a record's own header
    * block). */
  private def indexOfMagic(b: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val end = b.length - 7
    while (i <= end) {
      if (b(i) == 'W' && startsWith(b, i, "WARC/1.")) return i
      i += 1
    }
    -1
  }

  /** The RECOVERING walk: like [[parse]], but a malformed record skips
    * forward to the next `WARC/1.` version magic instead of discarding
    * the rest of the blob — on a real 1 GiB CommonCrawl member one
    * corrupt record must not silently drop everything after it. The loss
    * is OBSERVABLE, never silent: every skip is counted (spans) and
    * measured (bytes), so a consumer can alert on loss rates. Discipline
    * unchanged: records that do parse are byte-identical to the strict
    * walk's, the scan only moves forward (progress guard: a failed
    * record's scan starts at its offset + 1), never throws, and the
    * resync count is capped (`maxSpans` — past it the remainder is
    * counted as one final skipped span and the walk stops). */
  def parseResync(bytes: Array[Byte], maxRecords: Int = 10000,
                  maxSpans: Int = 1000): ResyncResult = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Rec]
    var c = 0
    var spans = 0
    var skipped = 0L
    var stop = false
    // scan for the next record magic at or after `scanFrom`; the loss
    // span is [lossFrom, found) — they differ only for the missing-
    // separator case, where the record itself was kept
    def skipFrom(scanFrom: Int, lossFrom: Int): Unit = {
      if (spans >= maxSpans) { // resync cap: remainder = one final span
        skipped += bytes.length - lossFrom
        spans += 1
        stop = true
        return
      }
      spans += 1
      val at = indexOfMagic(bytes, scanFrom)
      if (at < 0) { skipped += bytes.length - lossFrom; stop = true }
      else { skipped += at - lossFrom; c = at }
    }
    while (!stop && c < bytes.length && out.length < maxRecords) {
      parseOne(bytes, c, out.length) match {
        case None => skipFrom(c + 1, c) // strictly after: guaranteed progress
        case Some((rec, next, sepMissing)) =>
          out += rec
          if (sepMissing) skipFrom(next, next) // keep the record, scan the junk
          else if (next <= c) stop = true // progress guard
          else c = next
      }
    }
    ResyncResult(out.toSeq, spans, skipped)
  }

  /** Gzip a blob ([[synthesize]]'s compressed counterpart — CommonCrawl
    * ships `.warc.gz`). */
  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(bytes)
    gz.close()
    out.toByteArray
  }

  /** Record-per-member `.warc.gz` synthesis WITH its CDX sidecar — the
    * archive WRITE path a curation run delivers: each entry serializes
    * to ONE gzip member, members concatenate, and the returned extents
    * are each member's (offset, length) AS WRITTEN — the byte truth a
    * CDX sidecar carries. [[cdxIndex]] over the returned blob must
    * reproduce exactly these extents, and [[seekRecord]] through them
    * must reproduce every record (q243 proves both in one dataflow).
    * Deterministic: the JDK gzip header carries MTIME 0 and no name. */
  def synthesizeGzMembers(entries: Seq[Entry]): (Array[Byte], Seq[(Long, Long)]) = {
    val out = new ByteArrayOutputStream()
    val extents = Seq.newBuilder[(Long, Long)]
    entries.foreach { e =>
      val member = gzip(synthesize(Seq(e)))
      extents += ((out.size.toLong, member.length.toLong))
      out.write(member)
    }
    (out.toByteArray, extents.result())
  }

  /** Deflate-compress a blob — zlib-wrapped (`raw = false`, RFC 1950,
    * what `Content-Encoding: deflate` actually means per RFC 9110) or
    * raw-deflate (`raw = true`, RFC 1951, the spelling broken servers
    * famously ship under the same header — the IE quirk every real
    * client tolerates). [[inflate]] is the tolerant counterpart. */
  def deflate(bytes: Array[Byte], raw: Boolean = false): Array[Byte] = {
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, raw)
    try {
      d.setInput(bytes)
      d.finish()
      val out = new ByteArrayOutputStream(math.max(64, bytes.length / 2))
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  /** Bounded inflate for `Content-Encoding: deflate` bodies with the
    * same bomb guard as [[gunzip]]: tries the SPEC spelling first
    * (zlib-wrapped, RFC 1950), and on any failure retries as raw
    * deflate (RFC 1951) — real servers ship both under the same header
    * name, and a client that honors only one shreds half the web. None
    * on a stream neither spelling can decode, and None the moment the
    * inflated size would exceed `maxOut`. Never throws. */
  def inflate(bytes: Array[Byte], maxOut: Int): Option[Array[Byte]] =
    inflateWith(bytes, maxOut, nowrap = false)
      .orElse(inflateWith(bytes, maxOut, nowrap = true))

  private def inflateWith(bytes: Array[Byte], maxOut: Int,
                          nowrap: Boolean): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater(nowrap)
    try {
      inf.setInput(bytes)
      val out = new ByteArrayOutputStream(math.min(maxOut, 1 << 16))
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        total += n
        if (total > maxOut) return None // bomb guard
        if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
          return None // truncated stream / preset-dictionary (unsupported)
        out.write(buf, 0, n)
      }
      Some(out.toByteArray)
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  /** Bounded gunzip with the ZIP-BOMB guard: None on a corrupt or
    * truncated stream, and None the moment the inflated size would
    * exceed `maxOut` — a hostile member must not be able to allocate
    * beyond the cap, so the copy loop stops AT the cap and probes for
    * one more byte rather than inflating everything first. Multi-member
    * streams concatenate (the JDK reader's behavior, which matches the
    * record-per-member convention CommonCrawl uses). */
  def gunzip(bytes: Array[Byte], maxOut: Int): Option[Array[Byte]] = {
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val out = new ByteArrayOutputStream(math.min(maxOut, 1 << 16))
      val buf = new Array[Byte](8192)
      var total = 0
      var n = in.read(buf)
      while (n >= 0) {
        if (total + n > maxOut) { in.close(); return None } // bomb guard
        out.write(buf, 0, n)
        total += n
        n = in.read(buf)
      }
      in.close()
      Some(out.toByteArray)
    } catch {
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Boundaries (offset, length) of the gzip MEMBERS concatenated in
    * `bytes` — the record-per-member convention CommonCrawl uses so a
    * reader can seek straight to a record. The walk parses each member's
    * header manually (magic, deflate method, FEXTRA/FNAME/FCOMMENT/FHCRC
    * skips), then drives a raw Inflater to find where its deflate stream
    * ends; the 8-byte CRC/ISIZE trailer closes the member. Discipline as
    * everywhere in this file: complete-members-only (a truncated header,
    * stream, or trailer stops the walk), a per-member inflation cap (the
    * zip-bomb guard — scanning must not allocate what it refuses to
    * decode), member-count cap, never throws. */
  def gzipMemberBounds(bytes: Array[Byte], maxOut: Int = 1 << 26,
                       maxMembers: Int = 100000): Seq[(Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var c = 0
    val len = bytes.length
    while (c + 10 <= len && out.length < maxMembers) {
      if ((bytes(c) & 0xff) != 0x1f || (bytes(c + 1) & 0xff) != 0x8b ||
          bytes(c + 2) != 8) return out.toSeq
      val flg = bytes(c + 3) & 0xff
      var h = c + 10
      if ((flg & 4) != 0) { // FEXTRA
        if (h + 2 > len) return out.toSeq
        h += 2 + ((bytes(h) & 0xff) | ((bytes(h + 1) & 0xff) << 8))
      }
      if ((flg & 8) != 0) { while (h < len && bytes(h) != 0) h += 1; h += 1 }
      if ((flg & 16) != 0) { while (h < len && bytes(h) != 0) h += 1; h += 1 }
      if ((flg & 2) != 0) h += 2 // FHCRC
      if (h >= len) return out.toSeq
      val inf = new java.util.zip.Inflater(true)
      var compressed = -1L
      try {
        inf.setInput(bytes, h, len - h)
        val buf = new Array[Byte](8192)
        var total = 0L
        var ok = true
        while (ok && !inf.finished()) {
          val n = inf.inflate(buf)
          total += n
          if (total > maxOut) ok = false // bomb guard
          else if (n == 0 && inf.needsInput()) ok = false // truncated stream
        }
        if (ok) compressed = inf.getBytesRead
      } catch {
        case _: java.util.zip.DataFormatException => return out.toSeq
      } finally inf.end()
      if (compressed < 0) return out.toSeq
      val memberEnd = h + compressed.toInt + 8 // CRC32 + ISIZE trailer
      if (memberEnd > len || memberEnd <= c) return out.toSeq
      out += ((c, memberEnd - c))
      c = memberEnd
    }
    out.toSeq
  }

  /** [[gzMembersResync]]'s result: the inflated payload of every VALID
    * member, plus exact compressed-domain loss accounting — how many
    * corrupt spans the walk re-anchored over and how many compressed
    * bytes they covered. */
  final case class GzResyncResult(payloads: Seq[Array[Byte]],
                                  skippedMembers: Int,
                                  skippedMemberBytes: Long)

  /** Parse ONE gzip member at `c`: header (magic, deflate method, flag
    * fields), raw-inflate under the bomb guard, then VERIFY the trailer —
    * CRC32 of the inflated output and ISIZE (mod 2^32) must both match,
    * so in-place corruption of the deflate stream (which the JDK Inflater
    * can "finish" through with garbage output) is detected, never
    * silently misframed. Some((inflated payload, member end)) only for a
    * fully valid member. */
  private def tryGzMember(bytes: Array[Byte], c: Int,
                          maxOut: Int): Option[(Array[Byte], Int)] = {
    val len = bytes.length
    if (c + 10 > len) return None
    if ((bytes(c) & 0xff) != 0x1f || (bytes(c + 1) & 0xff) != 0x8b ||
        bytes(c + 2) != 8) return None
    val flg = bytes(c + 3) & 0xff
    var h = c + 10
    if ((flg & 4) != 0) { // FEXTRA
      if (h + 2 > len) return None
      h += 2 + ((bytes(h) & 0xff) | ((bytes(h + 1) & 0xff) << 8))
    }
    if ((flg & 8) != 0) { while (h < len && bytes(h) != 0) h += 1; h += 1 }
    if ((flg & 16) != 0) { while (h < len && bytes(h) != 0) h += 1; h += 1 }
    if ((flg & 2) != 0) h += 2 // FHCRC
    if (h >= len) return None
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(bytes, h, len - h)
      val out = new ByteArrayOutputStream(8192)
      val crc = new java.util.zip.CRC32
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        total += n
        if (total > maxOut) return None // bomb guard
        if (n == 0 && inf.needsInput()) return None // truncated stream
        out.write(buf, 0, n)
        crc.update(buf, 0, n)
      }
      val end = h + inf.getBytesRead.toInt + 8 // CRC32 + ISIZE trailer
      if (end > len || end <= c) return None
      def le32(at: Int): Long =
        (bytes(at) & 0xffL) | ((bytes(at + 1) & 0xffL) << 8) |
          ((bytes(at + 2) & 0xffL) << 16) | ((bytes(at + 3) & 0xffL) << 24)
      val t = h + inf.getBytesRead.toInt
      if (le32(t) != crc.getValue) return None // CRC mismatch = corrupt
      if (le32(t + 4) != (total & 0xffffffffL)) return None // ISIZE
      Some((out.toByteArray, end))
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  /** The RECOVERING member walk — [[gzipMemberBounds]]' production twin,
    * the compressed-domain mirror of [[parseResync]]: a member that
    * fails ANY check (magic, header framing, deflate error, truncation,
    * bomb guard, CRC32/ISIZE trailer mismatch) re-anchors the scan at
    * the next gzip magic (`1f 8b 08`) instead of discarding the rest of
    * the blob, and the loss is EXACT — skipped spans counted, skipped
    * compressed bytes measured. Unlike the strict walk this one VERIFIES
    * each member's CRC32 trailer, because resync only makes sense when
    * corruption is detectable: an in-place bit flip in a deflate stream
    * can inflate to garbage without a DataFormatException, and only the
    * CRC catches it. Progress guaranteed (a failed member's rescan
    * starts at its offset + 1), span count capped (`maxSpans` — the
    * remainder past it is one final counted span), never throws. */
  def gzMembersResync(bytes: Array[Byte], maxOut: Int = 1 << 26,
                      maxMembers: Int = 100000,
                      maxSpans: Int = 1000): GzResyncResult = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val len = bytes.length
    var c = 0
    var spans = 0
    var skipped = 0L
    var stop = false
    def findMagic(from: Int): Int = {
      var i = math.max(from, 0)
      val end = len - 3
      while (i <= end) {
        if ((bytes(i) & 0xff) == 0x1f && (bytes(i + 1) & 0xff) == 0x8b &&
            bytes(i + 2) == 8) return i
        i += 1
      }
      -1
    }
    def skipFrom(scanFrom: Int, lossFrom: Int): Unit = {
      if (spans >= maxSpans) { // resync cap: remainder = one final span
        skipped += len - lossFrom
        spans += 1
        stop = true
        return
      }
      spans += 1
      val at = findMagic(scanFrom)
      if (at < 0) { skipped += len - lossFrom; stop = true }
      else { skipped += at - lossFrom; c = at }
    }
    while (!stop && c < len && out.length < maxMembers) {
      tryGzMember(bytes, c, maxOut) match {
        case Some((payload, end)) => out += payload; c = end
        case None => skipFrom(c + 1, c) // strictly after: progress
      }
    }
    // member-count cap with bytes remaining: the tail is neither
    // inflated nor anchored over — charge it as ONE final skipped span
    // (the maxSpans discipline), so "exact loss accounting" holds at
    // every cap, never just the resync one.
    if (!stop && c < len && out.length >= maxMembers) {
      skipped += len - c
      spans += 1
    }
    GzResyncResult(out.toSeq, spans, skipped)
  }

  /** The FULL production read path over record-per-member `.warc.gz`
    * blobs — every hostile-bytes layer composed, each with exact loss
    * accounting at its own level:
    *
    *   1. member walk with compressed-domain resync + CRC verification
    *      ([[gzMembersResync]] — skipped_members / skipped_member_bytes);
    *   2. per-member record parse with inflated-domain resync
    *      ([[parseResync]] — skipped_spans / skipped_bytes summed across
    *      the blob's members; per-member parsing keeps memory O(member),
    *      never O(blob inflated) — the record-per-member convention means
    *      records don't span members, so the accounting equals the
    *      concatenated logical stream's);
    *   3. body recovery through the transfer + content + charset layers
    *      ([[decodedBodyBytes]] + declared-charset decode — the q217
    *      path, applied to records RECOVERED by resync).
    *
    * One row per response record that survived all three layers:
    * (blob_id, rec_idx globally renumbered over survivors, uri,
    * http_status, decoded body) plus the blob's four loss columns —
    * corruption at CommonCrawl scale is an observable column set, never
    * silent data loss. A blob with ZERO surviving records still emits
    * ONE row — record fields all NULL, loss columns populated — so the
    * accounting holds exactly when corruption is worst: a fully
    * destroyed blob's bytes appear in skipped_member_bytes instead of
    * vanishing with the blob (the r18 undercount). Consumers filtering
    * on http_status drop the loss row for free; loss aggregates see
    * every blob. */
  def extractHostile(blobs: Dataset[(Long, Array[Byte])],
                     maxOut: Int = 1 << 26): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions(_.flatMap { case (blobId, gz) =>
      val gw = gzMembersResync(gz, maxOut)
      var spans = 0L
      var skippedB = 0L
      var nextIdx = 0L
      val rows = gw.payloads.flatMap { member =>
        val rr = parseResync(member)
        spans += rr.skippedSpans
        skippedB += rr.skippedBytes
        rr.recs.collect {
          case r if r.httpStatus.isDefined =>
            val body = decodeBodyString(r, decodedBodyBytes(member, r))
            val row = (blobId, Some(nextIdx), Some(r.targetUri),
              Some(r.httpStatus.get.toLong), Some(body))
            nextIdx += 1
            row
        }
      }
      val out = // zero survivors: ONE null-record loss row for the blob
        if (rows.nonEmpty) rows
        else Seq((blobId, None: Option[Long], None: Option[String],
          None: Option[Long], None: Option[String]))
      out.map { case (b, i, u, s, body) =>
        (b, i, u, s, body, spans, skippedB,
          gw.skippedMembers.toLong, gw.skippedMemberBytes)
      }
    }).toDF("blob_id", "rec_idx", "uri", "http_status", "body",
      "skipped_spans", "skipped_bytes", "skipped_members",
      "skipped_member_bytes")
  }

  /** [[extractRecords]] over record-per-member `.warc.gz` blobs: walk the
    * member boundaries ([[gzipMemberBounds]]), inflate each member under
    * the bomb guard, parse its records, and emit rows with a GLOBALLY
    * increasing rec_idx per blob — so a one-record-per-member blob of
    * the same records is output-identical to the uncompressed blob
    * (q214 shares q207's oracle verbatim, the q210 argument one layer
    * deeper). */
  def extractRecordsGzMembers(blobs: Dataset[(Long, Array[Byte])],
                              maxOut: Int = 1 << 26): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions(_.flatMap { case (blobId, gz) =>
      var nextIdx = 0L
      gzipMemberBounds(gz, maxOut).iterator.flatMap { case (off, mlen) =>
        val member = java.util.Arrays.copyOfRange(gz, off, off + mlen)
        gunzip(member, maxOut).iterator.flatMap { bytes =>
          recordRows(blobId, bytes).map { r =>
            val row = r.copy(_2 = nextIdx)
            nextIdx += 1
            row
          }
        }
      }
    }).toDF("blob_id", "rec_idx", "rec_type", "uri", "content_length",
      "http_status", "body_bytes", "body_md5")
  }

  /** Per-record extraction over (blob_id, warc bytes) rows: one output row
    * per complete record — type, target URI, declared length, HTTP status,
    * and the body's byte mass + md5 (response records only; the md5 is
    * over the body octets, so the DuckDB oracle replays it with md5() on
    * the constructed string). mapPartitions batch shape, same as the
    * [[Avi]] extractors: demux cost is the unit of work. */
  /** A record's body octet spans: the de-chunked spans when chunked,
    * else the contiguous body. */
  private def bodySpans(r: Rec): Seq[(Int, Int)] =
    if (r.chunkSpans.nonEmpty) r.chunkSpans
    else Seq((r.bodyOffset, r.bodyOffset + r.bodyLen))

  /** Cap on an inflated Content-Encoding: gzip body (the consumer-side
    * zip-bomb guard — same rule as the container layer). */
  val MaxDecodedBody: Int = 1 << 26

  /** The record's body CONTENT octets: spans concatenated (de-chunked
    * when chunked), then inflated when Content-Encoding marked gzip or
    * deflate — the transfer layer strictly before the content layer,
    * RFC 9110's ordering. Deflate accepts BOTH server spellings (zlib
    * first, raw retry — see [[inflate]]). An undecodable or
    * bomb-guarded compressed body is EMPTY, never a throw (the
    * complete-records rule lifted to the body layer). Codings the JDK
    * has no codec for (br, zstd) were never flagged at parse time and
    * ride through as their compressed bytes — documented pass-through,
    * same rule as the Multimodal video stub. */
  def decodedBodyBytes(bytes: Array[Byte], r: Rec,
                       maxOut: Int = MaxDecodedBody): Array[Byte] = {
    val raw = bodySpans(r) match {
      case Seq((s, e)) => java.util.Arrays.copyOfRange(bytes, s, e)
      case ss =>
        val out = new ByteArrayOutputStream(r.bodyLen)
        ss.foreach { case (s, e) => out.write(bytes, s, e - s) }
        out.toByteArray
    }
    if (r.contentGzip) gunzip(raw, maxOut).getOrElse(Array.emptyByteArray)
    else if (r.contentDeflate)
      inflate(raw, maxOut).getOrElse(Array.emptyByteArray)
    else raw
  }

  /** Charset lookup with the UTF-8 fallback (unknown/illegal names must
    * not throw on hostile crawl headers). */
  private def charsetFor(name: String): java.nio.charset.Charset =
    if (name.isEmpty) UTF_8
    else try java.nio.charset.Charset.forName(name)
    catch { case scala.util.control.NonFatal(_) => UTF_8 }

  /** Bytes the HTML5 prescan may inspect (the spec's 1024-byte window —
    * an encoding declared deeper in the page is NOT honored, by spec). */
  val PrescanWindow = 1024

  /** HTML5 §13.2.3.2-style META-CHARSET PRESCAN (bounded subset): when
    * the HTTP header carries no charset parameter, real pages declare
    * their encoding in markup — `<meta charset=…>` or the legacy
    * `<meta http-equiv="Content-Type" content="…; charset=…">`. The
    * scan reads at most [[PrescanWindow]] bytes of the CONTENT-decoded
    * body, interpreted byte-transparently (ISO-8859-1 — every
    * pre-window byte maps to one char, so indices cannot drift and the
    * scan works for any ASCII-compatible page encoding, which is the
    * spec's own precondition). Returns "" when nothing is declared in
    * the window — the caller falls back to UTF-8. Never throws.
    *
    * ATTRIBUTE FIDELITY (r19, the r17 anchorPairs lesson applied here):
    * each `<meta …>` tag in the window is tokenized into its attributes
    * with quote handling, then the two HTML5 spellings are read off the
    * ATTRIBUTE STRUCTURE — a `charset` attribute, or an
    * `http-equiv=Content-Type` tag's `content` attribute's `charset=`
    * parameter. A content attribute that merely MENTIONS `charset=`
    * (`<meta name="description" content="use charset=utf-8">`) cannot
    * hijack the page encoding, which a flat substring scan allowed.
    *
    * WHATWG "get an encoding" remaps (the prescan only ever runs over
    * ASCII-compatible bytes, so a meta that claims a UTF-16 family
    * encoding is lying about the very bytes it was decoded from):
    * utf-16 / utf-16le / utf-16be → UTF-8; x-user-defined →
    * windows-1252. */
  def sniffCharset(body: Array[Byte]): String = {
    val n = math.min(body.length, PrescanWindow)
    if (n == 0) return ""
    val prefix = new String(body, 0, n,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val m = MetaTag.matcher(prefix)
    while (m.find()) {
      val declared = metaTagCharset(m.group(1))
      if (declared.nonEmpty) return remapPrescan(declared)
    }
    ""
  }

  /** One meta tag's attribute region (everything after `<meta` up to the
    * tag close) — tags are located structurally, attributes parsed by
    * [[metaTagCharset]]. */
  private val MetaTag =
    java.util.regex.Pattern.compile("(?i)<meta[ \\t\\r\\n/]([^>]*)")

  /** The `charset` parameter locator INSIDE a content-type content
    * attribute value — whitespace-tolerant around the `=` (legacy markup
    * writes `charset = X`), unlike the HTTP header's [[CharsetParam]]. */
  private val MetaContentCharset =
    java.util.regex.Pattern.compile("(?i)charset\\s*=\\s*")

  /** WHATWG "get an encoding" remap for prescan results (§13.2.3.3
    * step 4-5 analogue): a UTF-16 family declaration becomes UTF-8,
    * x-user-defined becomes windows-1252. */
  private def remapPrescan(name: String): String =
    name.toLowerCase match {
      case "utf-16" | "utf-16le" | "utf-16be" => "UTF-8"
      case "x-user-defined" => "windows-1252"
      case _ => name
    }

  /** The charset a single meta tag's ATTRIBUTES declare ("" when none):
    * a `charset` attribute wins; else an `http-equiv=content-type` tag's
    * `content` attribute is parsed for its `charset=` parameter (value
    * to the next `;`/quote, quotes stripped). The tokenizer walks
    * name [= value] pairs with quote handling — a `charset=` inside some
    * OTHER attribute's quoted value is structurally invisible. */
  private def metaTagCharset(attrs: String): String = {
    var charsetAttr = ""
    var httpEquiv = ""
    var contentAttr = ""
    var i = 0
    val n = attrs.length
    def isWs(c: Char) = c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '/'
    while (i < n) {
      while (i < n && isWs(attrs.charAt(i))) i += 1
      val nameStart = i
      while (i < n && !isWs(attrs.charAt(i)) && attrs.charAt(i) != '=') i += 1
      val name = attrs.substring(nameStart, i).toLowerCase
      while (i < n && isWs(attrs.charAt(i))) i += 1
      var value = ""
      if (i < n && attrs.charAt(i) == '=') {
        i += 1
        while (i < n && isWs(attrs.charAt(i))) i += 1
        if (i < n && (attrs.charAt(i) == '"' || attrs.charAt(i) == '\'')) {
          val q = attrs.charAt(i)
          i += 1
          val vStart = i
          while (i < n && attrs.charAt(i) != q) i += 1
          value = attrs.substring(vStart, i)
          if (i < n) i += 1 // closing quote
        } else {
          val vStart = i
          while (i < n && !isWs(attrs.charAt(i))) i += 1
          value = attrs.substring(vStart, i)
        }
      }
      if (name.nonEmpty) name match {
        case "charset" => if (charsetAttr.isEmpty) charsetAttr = value.trim
        case "http-equiv" => if (httpEquiv.isEmpty) httpEquiv = value.trim
        case "content" => if (contentAttr.isEmpty) contentAttr = value
        case _ => ()
      }
      if (nameStart == i) i += 1 // progress guard on stray bytes
    }
    if (charsetAttr.nonEmpty) charsetAttr
    else if (httpEquiv.equalsIgnoreCase("content-type") && contentAttr.nonEmpty) {
      val cm = MetaContentCharset.matcher(contentAttr)
      if (cm.find()) {
        var cv = contentAttr.substring(cm.end())
        val sc = cv.indexOf(';')
        if (sc >= 0) cv = cv.substring(0, sc)
        cv.trim.stripPrefix("\"").stripSuffix("\"").trim
          .takeWhile(c => c.isLetterOrDigit || c == '-' || c == '_' || c == '.')
      } else ""
    } else ""
  }

  /** The record's effective charset: the Content-Type header parameter
    * when declared (HTTP wins, per spec precedence), else the meta
    * prescan over the content-decoded body, else UTF-8 (via
    * [[charsetFor]]'s fallback). */
  private def effectiveCharset(r: Rec,
                               body: Array[Byte]): java.nio.charset.Charset =
    charsetFor(if (r.charset.nonEmpty) r.charset else sniffCharset(body))

  /** Byte-order mark at the head of `b`: (charset, BOM length). BOM
    * sniffing is STEP ONE of the HTML5 encoding algorithm (WHATWG HTML
    * §13.2.3.1) — it outranks even the HTTP header, because the byte
    * pattern is unforgeable evidence of the actual encoding while
    * headers routinely lie. */
  private def bomCharset(
      b: Array[Byte]): Option[(java.nio.charset.Charset, Int)] = {
    import java.nio.charset.StandardCharsets.{UTF_16BE, UTF_16LE}
    if (b.length >= 3 && b(0) == 0xEF.toByte && b(1) == 0xBB.toByte &&
      b(2) == 0xBF.toByte) Some((UTF_8, 3))
    else if (b.length >= 2 && b(0) == 0xFE.toByte && b(1) == 0xFF.toByte)
      Some((UTF_16BE, 2))
    else if (b.length >= 2 && b(0) == 0xFF.toByte && b(1) == 0xFE.toByte)
      Some((UTF_16LE, 2))
    else None
  }

  /** Decode a record's CONTENT-decoded body bytes to the body string —
    * the one shared decode for every consumer, full HTML5 precedence:
    * BOM (consumed, never leaked into the text — the JDK does not strip
    * a UTF-8 BOM on its own) > Content-Type charset parameter >
    * in-window `<meta charset=…>` prescan > UTF-8. Never throws
    * (unknown names fall back; malformed sequences decode to U+FFFD). */
  private def decodeBodyString(r: Rec, b: Array[Byte]): String =
    bomCharset(b) match {
      case Some((cs, skip)) => new String(b, skip, b.length - skip, cs)
      case None => new String(b, effectiveCharset(r, b))
    }

  private def recordRows(blobId: Long, bytes: Array[Byte]) =
    rowsFor(blobId, bytes, parse(bytes))

  private def rowsFor(blobId: Long, bytes: Array[Byte], recs: Seq[Rec]) =
    recs.map { r =>
      val (bc, bmd5) =
        if (r.httpStatus.isDefined) {
          val md = java.security.MessageDigest.getInstance("MD5")
          if (r.contentGzip || r.contentDeflate) {
            // mass + md5 are over the CONTENT octets
            val b = decodedBodyBytes(bytes, r)
            md.update(b)
            (Some(b.length.toLong),
              Some(md.digest().map(x => f"$x%02x").mkString))
          } else {
            bodySpans(r).foreach { case (s, e) => md.update(bytes, s, e - s) }
            (Some(r.bodyLen.toLong),
              Some(md.digest().map(x => f"$x%02x").mkString))
          }
        } else (None, None)
      (blobId, r.recIdx.toLong, r.warcType,
        if (r.targetUri.isEmpty) None else Some(r.targetUri),
        r.contentLength, r.httpStatus.map(_.toLong), bc, bmd5)
    }

  /** [[extractRecords]] under the RECOVERING walk ([[parseResync]]): the
    * q207 row set over the surviving records, plus the blob's exact loss
    * accounting on every row (skipped_spans, skipped_bytes — constant per
    * blob) so corruption at CommonCrawl scale is an observable column,
    * never silent data loss. A blob whose every record is corrupt
    * contributes zero rows (its loss is observable through
    * [[parseResync]] directly — documented limitation of the row shape). */
  def extractRecordsResync(blobs: Dataset[(Long, Array[Byte])]): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions(_.flatMap { case (blobId, bytes) =>
      val r = parseResync(bytes)
      rowsFor(blobId, bytes, r.recs).map { t =>
        (t._1, t._2, t._3, t._4, t._5, t._6, t._7, t._8,
          r.skippedSpans.toLong, r.skippedBytes)
      }
    }).toDF("blob_id", "rec_idx", "rec_type", "uri", "content_length",
      "http_status", "body_bytes", "body_md5", "skipped_spans",
      "skipped_bytes")
  }

  def extractRecords(blobs: Dataset[(Long, Array[Byte])]): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions(_.flatMap { case (blobId, bytes) =>
      recordRows(blobId, bytes)
    }).toDF("blob_id", "rec_idx", "rec_type", "uri", "content_length",
      "http_status", "body_bytes", "body_md5")
  }

  /** [[extractRecords]] over `.warc.gz` blobs: bounded [[gunzip]] first
    * (an undecodable or bomb-guarded blob contributes zero rows — the
    * complete-records-only rule lifted to the compression layer), then
    * the SAME walk. Output-identical to extracting the uncompressed
    * blobs, which is exactly what the q210 oracle proves (it shares
    * q207's SQL verbatim). */
  def extractRecordsGz(blobs: Dataset[(Long, Array[Byte])],
                       maxOut: Int = 1 << 26): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions(_.flatMap { case (blobId, gz) =>
      gunzip(gz, maxOut).iterator.flatMap(b => recordRows(blobId, b))
    }).toDF("blob_id", "rec_idx", "rec_type", "uri", "content_length",
      "http_status", "body_bytes", "body_md5")
  }

  /** Decode a derived-archive payload: UTF-8 by the WET/WAT convention,
    * but a BOM a THIRD-PARTY producer shipped is honored — and consumed,
    * never leaked into the text (the r18 body-decode rule applied to
    * sidecars; the JDK does not strip a UTF-8 BOM on its own). */
  private def decodeSidecarText(bytes: Array[Byte], off: Int, len: Int): String =
    bomCharset(java.util.Arrays.copyOfRange(bytes, off, off + len)) match {
      case Some((cs, skip)) =>
        new String(bytes, off + skip, len - skip, cs)
      case None => new String(bytes, off, len, UTF_8)
    }

  /** [[extractRecords]]' sibling for WET-STYLE derived archives: one row
    * per CONVERSION record — the record type CommonCrawl's WET sidecars
    * carry, whose payload is extracted TEXT rather than an HTTP message —
    * (blob_id, rec_idx, uri, content_length, text), payload decoded
    * UTF-8 (WET is UTF-8 by convention) with BOM honesty for foreign
    * archives ([[decodeSidecarText]]). */
  def extractConversions(blobs: Dataset[(Long, Array[Byte])]): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions(_.flatMap { case (blobId, bytes) =>
      parse(bytes).iterator.collect {
        case r if r.warcType == "conversion" =>
          (blobId, r.recIdx.toLong,
            if (r.targetUri.isEmpty) None else Some(r.targetUri),
            r.contentLength,
            decodeSidecarText(bytes, r.bodyOffset, r.bodyLen))
      }
    }).toDF("blob_id", "rec_idx", "uri", "content_length", "text")
  }

  /** CDX-STYLE INDEX over record-per-member `.warc.gz` blobs — the
    * fourth member of the CommonCrawl artifact family (WARC/WAT/WET/
    * CDX): one row per member with its BYTE EXTENT in the compressed
    * blob (offset, length — what a CDX line's offset/length fields
    * carry) plus the record's identity (ordinal, uri, status, body mass
    * + md5). The extent is what makes 100 TB reads cheap: a consumer
    * holding the index range-reads ONE member instead of walking the
    * container ([[seekRecord]] is that read). Offsets are
    * gzip-length-dependent (not SQL-computable), so the oracle checks
    * them INDIRECTLY: q236 seeks through them, and a wrong extent
    * cannot re-produce the right record. */
  def cdxIndex(blobs: Dataset[(Long, Array[Byte])],
               maxOut: Int = 1 << 26): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions(_.flatMap { case (blobId, gz) =>
      gzipMemberBounds(gz, maxOut).iterator.zipWithIndex.flatMap {
        case ((off, mlen), ord) =>
          val member = java.util.Arrays.copyOfRange(gz, off, off + mlen)
          gunzip(member, maxOut).iterator.flatMap { bytes =>
            rowsFor(blobId, bytes, parse(bytes).take(1)).map { t =>
              (blobId, ord.toLong, off.toLong, mlen.toLong,
                t._4, t._6, t._7, t._8)
            }
          }
      }
    }).toDF("blob_id", "ordinal", "offset", "length", "uri",
      "http_status", "body_bytes", "body_md5")
  }

  /** RANDOM-ACCESS read of one indexed member: slice exactly
    * [offset, offset+length) out of the blob, inflate, parse — never
    * walking the members before it (the CDX promise). Bounds-guarded
    * and never throws: an extent outside the blob, a slice that is not
    * a whole valid member, or a member holding no record yields None —
    * a stale or corrupt index row is observable, not a crash. Returns
    * (uri, http_status, body_bytes, body_md5). */
  def seekRecord(gz: Array[Byte], offset: Long, length: Long,
                 maxOut: Int = 1 << 26)
      : Option[(String, Option[Long], Option[Long], Option[String])] = {
    if (offset < 0 || length <= 0 || offset + length > gz.length) return None
    val member = java.util.Arrays.copyOfRange(
      gz, offset.toInt, (offset + length).toInt)
    gunzip(member, maxOut).flatMap { bytes =>
      rowsFor(0L, bytes, parse(bytes).take(1)).headOption
        .map(t => (t._4.getOrElse(""), t._6, t._7, t._8))
    }
  }

  /** [[extractConversions]]' sibling for WAT-STYLE derived archives: one
    * row per METADATA record — the record type CommonCrawl's WAT
    * sidecars carry, whose payload is derived metadata about a capture
    * (headers, outlinks, title) rather than content — (blob_id, rec_idx,
    * uri, content_length, fields), payload decoded UTF-8 with BOM
    * honesty for foreign archives ([[decodeSidecarText]]). */
  def extractMetadata(blobs: Dataset[(Long, Array[Byte])]): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions(_.flatMap { case (blobId, bytes) =>
      parse(bytes).iterator.collect {
        case r if r.warcType == "metadata" =>
          (blobId, r.recIdx.toLong,
            if (r.targetUri.isEmpty) None else Some(r.targetUri),
            r.contentLength,
            decodeSidecarText(bytes, r.bodyOffset, r.bodyLen))
      }
    }).toDF("blob_id", "rec_idx", "uri", "content_length", "fields")
  }

  /** REVISIT records per blob — the storage-dedup mechanism CommonCrawl
    * uses for unchanged pages on recrawl: no body is stored, the record
    * points at the ORIGINAL capture via WARC-Refers-To-Target-URI.
    * (blob_id, rec_idx, uri, refers_to). */
  def extractRevisits(blobs: Dataset[(Long, Array[Byte])]): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions(_.flatMap { case (blobId, bytes) =>
      parse(bytes).iterator.collect {
        case r if r.warcType == "revisit" =>
          (blobId, r.recIdx.toLong, r.targetUri,
            if (r.refersTo.isEmpty) None else Some(r.refersTo))
      }
    }).toDF("blob_id", "rec_idx", "uri", "refers_to")
  }

  /** Per-response CACHE-VALIDATOR rows — the conditional-recrawl
    * reconciler's input (q237): (blob_id, uri, http_status, etag —
    * verbatim opaque tag per RFC 9110, NULL when absent, body mass +
    * md5). A 304 row carries the validator and an empty body: the
    * whole point is that the body did NOT travel. */
  def extractValidators(blobs: Dataset[(Long, Array[Byte])]): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions(_.flatMap { case (blobId, bytes) =>
      val recs = parse(bytes)
      rowsFor(blobId, bytes, recs).zip(recs).collect {
        case ((_, _, _, uri, _, Some(st), bb, md5), r) =>
          (blobId, uri,
            st, if (r.etag.isEmpty) None else Some(r.etag), bb, md5)
      }
    }).toDF("blob_id", "uri", "http_status", "etag", "body_bytes",
      "body_md5")
  }

  /** HTTP-level metadata per response record — the redirect resolver's
    * input (q212): (blob_id, uri, http_status, location — NULL when the
    * response carries none). */
  def extractHttpMeta(blobs: Dataset[(Long, Array[Byte])]): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions(_.flatMap { case (blobId, bytes) =>
      parse(bytes).iterator.collect {
        case r if r.httpStatus.isDefined =>
          (blobId, r.targetUri, r.httpStatus.get.toLong,
            if (r.location.isEmpty) None else Some(r.location))
      }
    }).toDF("blob_id", "uri", "http_status", "location")
  }

  /** Response bodies as STRINGS — the hand-off row set between the
    * container walk and the text extractors (q208 feeds these straight
    * into [[Html]]): one row per response record that parsed a status,
    * (blob_id, rec_idx, uri, http_status, body). Same mapPartitions
    * batch shape as [[extractRecords]]. */
  def extractResponseBodies(blobs: Dataset[(Long, Array[Byte])]): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions(_.flatMap { case (blobId, bytes) =>
      parse(bytes).iterator.collect {
        case r if r.httpStatus.isDefined =>
          // bytes first (concat spans, inflate gzip), ONE decode under
          // the full precedence (BOM > header param > meta prescan >
          // UTF-8) — a multibyte sequence straddling a chunk boundary
          // must decode whole
          val b = decodedBodyBytes(bytes, r)
          val body = decodeBodyString(r, b)
          (blobId, r.recIdx.toLong, r.targetUri, r.httpStatus.get.toLong, body)
      }
    }).toDF("blob_id", "rec_idx", "uri", "http_status", "body")
  }
}
