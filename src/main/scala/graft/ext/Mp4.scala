package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}

/** Real video METADATA tier for the multimodal surface (round-14 verdict
  * task #4): an MP4 / ISO-BMFF (ISO/IEC 14496-12) box walk. The JDK ships
  * no H.264/H.265 decoder, so frame DECODE stays stubbed
  * ([[Multimodal.decode]]'s documented fallback) — but the container layout
  * is pure public-format byte parsing, and everything a curation pipeline
  * filters/joins on lives in the container, not the bitstream: major brand
  * (`ftyp`), movie timescale + duration (`mvhd`, version 0 and 1), track
  * count (`trak`), presentation width/height (`tkhd`, 16.16 fixed point),
  * and the codec fourccs (`stsd` sample-entry formats).
  *
  * Design rules, shared with the image/audio paths:
  *  - map-side only: one pass over the payload bytes per record, no state,
  *    no shuffle — the operator composes with any partitioning upstream;
  *  - STRICTLY bounded: every read is bounds-checked against the payload,
  *    a declared box size is clamped to the bytes that actually exist,
  *    nesting depth is capped, and each step advances ≥ 8 bytes — a
  *    crafted payload (truncated box, size 0/1 tricks, overflowing
  *    largesize, self-nesting) can never throw, loop, or read past the
  *    array (MultimodalSpec torture cases);
  *  - NonFatal-safe: garbage parses to an all-null/zero row, never an
  *    exception (the ADVICE-r13 imageio lesson, applied from the start).
  *
  * The paired [[synthesize]] builder emits structurally real ISO-BMFF
  * (proper box framing, full-box version/flags, 16.16 dimensions, sample
  * entries) and exists for two jobs: the ExtSpec round-trip law
  * (`parse(synthesize(p)) == p`, both mvhd versions) and the q185 oracle —
  * payload parameters derive from `doc_id`, so DuckDB replays the expected
  * metadata arithmetically while Spark must recover it by actually walking
  * the boxes it built.
  */
object Mp4 {

  /** Parsed container metadata. `nTracks` is 0 (not null) when no `moov`
    * parses — "no tracks found" is an observation, not a failure. */
  case class VideoMeta(media_id: Long, major_brand: Option[String],
                       n_tracks: Int, timescale: Option[Long],
                       duration_ms: Option[Long], width: Option[Int],
                       height: Option[Int], codecs: Option[String])

  /** One video-track spec for [[synthesize]]: codec fourcc + presentation
    * size (0×0 for non-visual tracks, the tkhd convention). */
  case class TrackSpec(codec: String, width: Int, height: Int,
                       handler: String = "vide")

  // ---------------------------------------------------------------- builder

  private def u32(v: Long): Array[Byte] = Array(
    (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def u64(v: Long): Array[Byte] = u32(v >>> 32) ++ u32(v & 0xffffffffL)
  private def fourcc(s: String): Array[Byte] = {
    require(s.length == 4, s"fourcc must be 4 chars: '$s'")
    s.getBytes("ISO-8859-1")
  }
  private def box(tpe: String, payloads: Array[Byte]*): Array[Byte] = {
    val body = payloads.foldLeft(Array.emptyByteArray)(_ ++ _)
    u32(8L + body.length) ++ fourcc(tpe) ++ body
  }
  private def fullBoxBody(version: Int): Array[Byte] =
    Array(version.toByte, 0.toByte, 0.toByte, 0.toByte)

  /** Emit a minimal but structurally complete ISO-BMFF file: `ftyp` +
    * `moov(mvhd, trak(tkhd, mdia(mdhr-less minimal mdia: mdhd, hdlr,
    * minf(stbl(stsd(entry))))))` per track. `mvhdVersion` 0 writes 32-bit
    * times, 1 writes 64-bit — both real vintages in the wild. */
  def synthesize(majorBrand: String, timescale: Long, duration: Long,
                 tracks: Seq[TrackSpec], mvhdVersion: Int = 0): Array[Byte] = {
    val ftyp = box("ftyp", fourcc(majorBrand), u32(0), fourcc("isom"))
    val mvhd =
      if (mvhdVersion == 0)
        box("mvhd", fullBoxBody(0), u32(0), u32(0), u32(timescale),
          u32(duration), u32(0x00010000L), Array(1.toByte, 0.toByte),
          new Array[Byte](10), identityMatrix, new Array[Byte](24),
          u32(tracks.size + 1L))
      else
        box("mvhd", fullBoxBody(1), u64(0), u64(0), u32(timescale),
          u64(duration), u32(0x00010000L), Array(1.toByte, 0.toByte),
          new Array[Byte](10), identityMatrix, new Array[Byte](24),
          u32(tracks.size + 1L))
    val traks = tracks.zipWithIndex.map { case (t, i) =>
      val tkhd = box("tkhd", Array(0.toByte, 0.toByte, 0.toByte, 7.toByte),
        u32(0), u32(0), u32(i + 1L), u32(0), u32(duration),
        new Array[Byte](8), new Array[Byte](8), identityMatrix,
        u32(t.width.toLong << 16), u32(t.height.toLong << 16))
      val mdhd = box("mdhd", fullBoxBody(0), u32(0), u32(0), u32(timescale),
        u32(duration), Array(0x55.toByte, 0xc4.toByte), u32(0).take(2))
      val hdlr = box("hdlr", fullBoxBody(0), u32(0), fourcc(t.handler),
        new Array[Byte](12), Array(0.toByte))
      // sample entry: 6 reserved bytes + 2-byte data_reference_index
      val entry = box(t.codec, new Array[Byte](6),
        Array(0.toByte, 1.toByte))
      val stsd = box("stsd", fullBoxBody(0), u32(1), entry)
      val stbl = box("stbl", stsd)
      val minf = box("minf", stbl)
      val mdia = box("mdia", mdhd, hdlr, minf)
      box("trak", tkhd, mdia)
    }
    ftyp ++ box("moov", (mvhd +: traks): _*)
  }

  private val identityMatrix: Array[Byte] =
    u32(0x00010000L) ++ u32(0) ++ u32(0) ++
    u32(0) ++ u32(0x00010000L) ++ u32(0) ++
    u32(0) ++ u32(0) ++ u32(0x40000000L)

  // ----------------------------------------------------------------- parser

  private def readU32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
  private def readU64(b: Array[Byte], off: Int): Long =
    (readU32(b, off) << 32) | readU32(b, off + 4)
  private def readType(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "ISO-8859-1")

  private val Containers = Set("moov", "trak", "mdia", "minf", "stbl")
  private val MaxDepth = 8

  private final class Acc {
    var brand: Option[String] = None
    var timescale: Option[Long] = None
    var duration: Option[Long] = None
    var nTracks = 0
    var width: Option[Int] = None
    var height: Option[Int] = None
    val codecs = scala.collection.mutable.ArrayBuffer.empty[String]
  }

  /** Walk the boxes in `b[from, until)`. Every branch is bounds-guarded:
    * a header that doesn't fit ends the walk; a declared size smaller than
    * the header or reaching past `until` is clamped/ends the walk — a
    * truncated file yields whatever metadata preceded the truncation. */
  private def walk(b: Array[Byte], from: Int, until: Int, depth: Int,
                   acc: Acc): Unit = {
    if (depth > MaxDepth) return
    var off = from
    while (off + 8 <= until) {
      val declared = readU32(b, off)
      val tpe = readType(b, off + 4)
      var header = 8
      var size = declared
      if (declared == 1L) {
        if (off + 16 > until) return
        size = readU64(b, off + 8)
        header = 16
      } else if (declared == 0L) {
        size = (until - off).toLong // "to end of file"
      }
      if (size < header) return // malformed framing: stop, keep what we have
      val end = math.min(until.toLong, off + size).toInt
      val body = off + header
      tpe match {
        case _ if Containers(tpe) =>
          if (tpe == "trak") acc.nTracks += 1
          walk(b, body, end, depth + 1, acc)
        case "ftyp" if acc.brand.isEmpty && body + 4 <= end =>
          acc.brand = Some(readType(b, body))
        case "mvhd" if body + 4 <= end =>
          val version = b(body) & 0xff
          // v1 duration is a u64 at body+24..31 — the guard must cover the
          // READ's last byte (body + 32), not its first (the ADVICE-r15
          // off-by-4: a short-declared v1 mvhd fabricated a duration from a
          // sibling's header bytes, and an array-end truncation threw into
          // the NonFatal net, aborting the walk and dropping later traks)
          if (version == 1 && body + 32 <= end) {
            acc.timescale = Some(readU32(b, body + 20))
            acc.duration = Some(readU64(b, body + 24))
          } else if (version == 0 && body + 20 <= end) {
            acc.timescale = Some(readU32(b, body + 12))
            acc.duration = Some(readU32(b, body + 16))
          }
        case "tkhd" if body + 4 <= end =>
          val version = b(body) & 0xff
          // width/height are the LAST 8 bytes of the box, 16.16 fixed —
          // same offset-from-end for both tkhd versions. They are
          // offsets from the DECLARED end: a truncation-clamped end would
          // read matrix bytes as dimensions, fabricating metadata the cut
          // removed — so dims are taken only from a COMPLETE tkhd box.
          if (off + size <= until && end - 8 >= body + 4) {
            val w = (readU32(b, end - 8) >>> 16).toInt
            val h = (readU32(b, end - 4) >>> 16).toInt
            val okVersion = version == 0 || version == 1
            if (okVersion && w > 0 && h > 0 && acc.width.isEmpty) {
              acc.width = Some(w)
              acc.height = Some(h)
            }
          }
        case "stsd" if body + 8 <= end =>
          // full box: version/flags + entry_count, then sized sample entries
          var e = body + 8
          var n = readU32(b, body + 4)
          while (n > 0 && e + 8 <= end) {
            val esize = readU32(b, e)
            // validate the entry's COMPLETE framing before trusting its
            // fourcc (the tkhd complete-box rule, applied to entries): an
            // undersized header OR a declared size overrunning the box end
            // must not contribute a codec — a final truncated entry would
            // otherwise leak its fourcc before the clamp (r15 verdict #1)
            if (esize < 8 || e + esize > end) n = 0
            else {
              acc.codecs += readType(b, e + 4)
              e = (e + esize).toInt
              n -= 1
            }
          }
        case _ => ()
      }
      // advance ≥ 8 bytes per iteration — structurally loop-free
      off = math.max(end, off + header)
    }
  }

  /** Parse one payload. Never throws; garbage → all-null/zero row. */
  def parseMeta(mediaId: Long, payload: Array[Byte]): VideoMeta = {
    val acc = new Acc
    try walk(payload, 0, payload.length, 0, acc)
    catch { case scala.util.control.NonFatal(_) => () } // belt over braces
    // clamp the hostile-u64 range: a v1 duration read is an arbitrary bit
    // pattern — negative (high bit set) or ×1000-overflowing values would
    // silently wrap in signed arithmetic, so they report as absent instead
    val durationMs = for (ts <- acc.timescale if ts > 0; d <- acc.duration
                          if d >= 0L && d <= Long.MaxValue / 1000L)
      yield d * 1000L / ts
    VideoMeta(mediaId, acc.brand, acc.nTracks, acc.timescale, durationMs,
      acc.width, acc.height,
      if (acc.codecs.isEmpty) None else Some(acc.codecs.mkString(",")))
  }

  /** Container-metadata extraction over (media_id, payload) records — the
    * same mapPartitions batch shape as [[Multimodal.extractFeatures]]
    * (per-partition demuxer init would amortize here). */
  def extractVideoMeta(records: Dataset[(Long, Array[Byte])]): DataFrame = {
    import records.sparkSession.implicits._
    records.mapPartitions(_.map { case (id, payload) =>
      parseMeta(id, payload)
    }).toDF()
  }
}
