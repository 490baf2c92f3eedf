package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}

/** Real video FRAME tier for the multimodal surface (round-15 verdict
  * task #3): MJPEG-in-AVI. [[Mp4]] delivered container METADATA; frame
  * decode stayed stubbed because the JDK ships no H.264 — but it DOES ship
  * a JPEG decoder, and MJPEG-in-AVI is a pure public format (Microsoft's
  * AVI RIFF File Reference / OpenDML): a RIFF container whose `movi` list
  * holds one complete, standalone JPEG per `##dc`/`##db` chunk. So the
  * whole video-frame path — demux the container, decode each frame, emit
  * per-frame features — runs REAL bytes end to end, no codec bindings.
  *
  * Layout walked (all little-endian, vs. ISO-BMFF's big-endian):
  * `RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf)…) LIST('movi'
  * 00dc…))`. `avih` carries µs/frame, total frames and presentation dims;
  * `strh` the stream type + codec fourcc; each video chunk in `movi` is
  * decoded with the same `javax.imageio` stack — and the same 8-bin
  * luminance histogram feature — as the animated-GIF tier
  * ([[Multimodal.extractPerFrameFeatures]]), so downstream consumers are
  * modality-blind.
  *
  * Design rules, shared with the [[Mp4]] walk:
  *  - map-side only: one pass per record, no state, no shuffle;
  *  - STRICTLY bounded: every read is bounds-checked, declared chunk sizes
  *    are clamped to the bytes that exist, list nesting is depth-capped,
  *    and each step advances ≥ 8 bytes — a crafted payload (truncated
  *    chunk, hostile u32 size, odd-size padding tricks, list self-nesting)
  *    can never throw, loop, or read past the array (ExtSpec tortures);
  *  - only COMPLETE chunks contribute: a movi chunk whose declared size
  *    overruns the file is dropped, not clamped into a half-frame (the
  *    Mp4 tkhd/stsd complete-framing rule);
  *  - NonFatal-safe: garbage parses to an all-null/zero row or zero frame
  *    rows, never an exception; an undecodable frame chunk is skipped
  *    without losing its neighbours.
  *
  * The paired [[synthesize]]/[[encodeGrayJpeg]] builders emit structurally
  * real AVI (proper chunk framing, word-alignment padding, 56-byte
  * avih/strh, BITMAPINFOHEADER strf) around real JDK-encoded JPEGs, for
  * the ExtSpec round-trip law and the q199 oracle: solid-gray frames at
  * luminance-bin CENTERS (gray = 32·bin + 16) survive JPEG's DC
  * quantization with every pixel in the planted bin — a solid frame is
  * DC-only, so decode is constant and the error (±2) never crosses the
  * ±16 bin boundary — letting DuckDB replay the dominant bin and its
  * exact 1.0 mass arithmetically while Spark must recover them by
  * actually demuxing and decoding the frames it framed.
  */
object Avi {

  // imageio's default stream cache is a TEMP FILE per encode/decode — 32
  // concurrent codec threads turn into /tmp I/O contention (measured: the
  // q199 repartition made wall WORSE until this). All payloads here are
  // in-memory byte arrays; cache in memory.
  javax.imageio.ImageIO.setUseCache(false)

  /** Parsed container metadata. `n_streams` counts `strh` chunks observed
    * (the Mp4 trak-counting convention: 0 = none found, not a failure). */
  case class AviMeta(media_id: Long, width: Option[Int], height: Option[Int],
                     n_streams: Int, total_frames: Option[Long],
                     us_per_frame: Option[Long], codec: Option[String])

  /** One decoded video frame: true decoded dims (not the avih header's),
    * container context (total video chunks, µs/frame, vids codec fourcc),
    * and the 8-bin normalized luminance histogram the GIF tier emits. */
  case class AviFrame(media_id: Long, frame_idx: Int, width: Int, height: Int,
                      n_frames: Int, us_per_frame: Option[Long],
                      codec: Option[String], feature: Array[Float])

  /** The decoded AUDIO track of an interleaved A/V file: PCM format fields
    * from the `auds` stream's WAVEFORMATEX `strf`, chunk/sample counts, and
    * the same 8-segment RMS energy profile [[Multimodal.decodeAudio]] emits
    * (identical per-sample math, so consumers are modality-blind). One row
    * per payload WITH a decodable PCM track; none otherwise. */
  case class AviAudio(media_id: Long, sample_rate: Long, channels: Int,
                      bits: Int, n_chunks: Int, n_samples: Long,
                      rms: Array[Double])

  // ---------------------------------------------------------------- builder

  private def u32le(v: Long): Array[Byte] = Array(
    v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
  private def u16le(v: Int): Array[Byte] = Array(v.toByte, (v >>> 8).toByte)
  private def fourcc(s: String): Array[Byte] = {
    require(s.length == 4, s"fourcc must be 4 chars: '$s'")
    s.getBytes("ISO-8859-1")
  }

  /** One RIFF chunk: fourcc + LE size + data + pad byte when the data size
    * is odd (RIFF word alignment) — so a chunk's total extent is always
    * even and list bodies never need their own padding. */
  private def chunk(tpe: String, body: Array[Byte]): Array[Byte] = {
    val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray
    fourcc(tpe) ++ u32le(body.length.toLong) ++ body ++ pad
  }
  private def list(listType: String, parts: Array[Byte]*): Array[Byte] = {
    val body = parts.foldLeft(fourcc(listType))(_ ++ _)
    fourcc("LIST") ++ u32le(body.length.toLong) ++ body
  }

  /** Encode a solid-gray JPEG with the JDK's writer. Solid frames are
    * DC-only, so decode is pixel-constant within ±2 of `gray` — pick gray
    * at a histogram-bin center (32·bin + 16) and the decoded dominant bin
    * is certain. */
  def encodeGrayJpeg(width: Int, height: Int, gray: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"dims must be positive: ${width}x$height")
    require(gray >= 0 && gray <= 255, s"gray out of range: $gray")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g2 = img.createGraphics()
    try {
      g2.setColor(new java.awt.Color(gray, gray, gray))
      g2.fillRect(0, 0, width, height)
    } finally g2.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Raw little-endian 16-bit signed PCM of a constant-amplitude tone —
    * the audio analog of [[encodeGrayJpeg]]'s solid frame: every float op
    * on decode (scale by 2⁻¹⁵, square, segment mean, sqrt) is EXACT for a
    * constant sample (partial sums stay integer-scaled under 2⁵³; the
    * mean divides its own multiple; sqrt of an exact square is the exact
    * root), so the oracle replays `c / 32768.0` arithmetically. */
  def encodePcm16(amplitude: Int, nSamples: Int): Array[Byte] = {
    require(amplitude > -32768 && amplitude < 32768, s"amplitude $amplitude")
    val out = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      out(2 * i) = amplitude.toByte
      out(2 * i + 1) = (amplitude >> 8).toByte
      i += 1
    }
    out
  }

  /** Emit a minimal but structurally complete AVI: 56-byte `avih`, a
    * `strl` (56-byte `strh` 'vids' + BITMAPINFOHEADER `strf`) with one
    * `00dc` chunk per pre-encoded JPEG frame — and, when `audioChunks` is
    * non-empty, a SECOND `strl` ('auds' + WAVEFORMATEX `strf`) whose raw
    * PCM rides in `01wb` chunks interleaved after the video frames (movi
    * order is what a demuxer must honor; graft reads streams by the
    * chunk-id digits, not by position). */
  def synthesize(usPerFrame: Long, width: Int, height: Int,
                 frames: Seq[Array[Byte]], handler: String = "MJPG",
                 audioChunks: Seq[Array[Byte]] = Nil, audioRate: Long = 8000L,
                 audioChannels: Int = 1, audioBits: Int = 16): Array[Byte] = {
    val nStreams = if (audioChunks.nonEmpty) 2L else 1L
    val avih = chunk("avih",
      u32le(usPerFrame) ++ u32le(0) ++ u32le(0) ++ u32le(0x10) ++
        u32le(frames.size.toLong) ++ u32le(0) ++ u32le(nStreams) ++ u32le(0) ++
        u32le(width.toLong) ++ u32le(height.toLong) ++ new Array[Byte](16))
    val strh = chunk("strh",
      fourcc("vids") ++ fourcc(handler) ++ u32le(0) ++ u16le(0) ++ u16le(0) ++
        u32le(0) ++ u32le(1) ++ u32le(25) ++ u32le(0) ++
        u32le(frames.size.toLong) ++ u32le(0) ++ u32le(10000) ++ u32le(0) ++
        u16le(0) ++ u16le(0) ++ u16le(width) ++ u16le(height))
    val strf = chunk("strf",
      u32le(40) ++ u32le(width.toLong) ++ u32le(height.toLong) ++
        u16le(1) ++ u16le(24) ++ fourcc("MJPG") ++
        u32le(width.toLong * height * 3) ++ u32le(0) ++ u32le(0) ++
        u32le(0) ++ u32le(0))
    val audioStrl =
      if (audioChunks.isEmpty) Nil
      else {
        val blockAlign = audioChannels * audioBits / 8
        val ash = chunk("strh",
          fourcc("auds") ++ fourcc("NONE") ++ u32le(0) ++
            u16le(0) ++ u16le(0) ++ u32le(0) ++ u32le(1) ++ u32le(audioRate) ++
            u32le(0) ++ u32le(audioChunks.map(_.length.toLong).sum / blockAlign) ++
            u32le(0) ++ u32le(10000) ++ u32le(blockAlign.toLong) ++
            u16le(0) ++ u16le(0) ++ u16le(0) ++ u16le(0))
        // WAVEFORMATEX: tag 1 = PCM
        val asf = chunk("strf",
          u16le(1) ++ u16le(audioChannels) ++ u32le(audioRate) ++
            u32le(audioRate * blockAlign) ++ u16le(blockAlign) ++
            u16le(audioBits) ++ u16le(0))
        Seq(list("strl", ash, asf))
      }
    val hdrl = list("hdrl",
      (avih +: list("strl", strh, strf) +: audioStrl): _*)
    val movi = list("movi",
      (frames.map(f => chunk("00dc", f)) ++
        audioChunks.map(a => chunk("01wb", a))): _*)
    val riffBody = fourcc("AVI ") ++ hdrl ++ movi
    fourcc("RIFF") ++ u32le(riffBody.length.toLong) ++ riffBody
  }

  // ----------------------------------------------------------------- parser

  private def readU32LE(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
  private def readType(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "ISO-8859-1")

  private val MaxDepth = 8

  private def isFrameCc(t: String): Boolean =
    t.length == 4 && t(0) >= '0' && t(0) <= '9' && t(1) >= '0' && t(1) <= '9' &&
      t(2) == 'd' && (t(3) == 'b' || t(3) == 'c')

  /** `${idx}%02dwb` for the discovered auds stream index (hdrl precedes
    * movi in a well-formed file, so the index is known by the time chunks
    * arrive; without one, no chunk qualifies). */
  private def isAudioCc(t: String, audioStream: Option[Int]): Boolean =
    audioStream.exists(i => t.length == 4 &&
      t(0) == ('0' + i / 10).toChar && t(1) == ('0' + i % 10).toChar &&
      t(2) == 'w' && t(3) == 'b' && i < 100)

  private final class Acc {
    var width: Option[Int] = None
    var height: Option[Int] = None
    var nStreams = 0
    var totalFrames: Option[Long] = None
    var usPerFrame: Option[Long] = None
    var codec: Option[String] = None
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    // audio stream state: the FIRST auds strh claims the audio slot; ONLY
    // its own strl's strf (the next strf after that strh) may supply the
    // WAVEFORMATEX — a later auds stream's PCM strf must not be applied to
    // the claimed stream's chunks (they may be compressed; decoding them
    // as someone else's PCM fabricates samples). Its stream INDEX (strh
    // order) names its movi chunk ids — `${idx}%02dwb`.
    var pendingAudioStrf: Boolean = false
    var audioStream: Option[Int] = None
    var audioRate: Option[Long] = None
    var audioChannels: Option[Int] = None
    var audioBits: Option[Int] = None
    val audioChunks = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
  }

  /** Walk the chunks in `b[from, until)`. Every branch is bounds-guarded;
    * a header that doesn't fit ends the walk, a declared size past `until`
    * is clamped for metadata (truncated files yield what preceded the cut)
    * but DISQUALIFIES a frame chunk (no half-JPEGs), and the advance is
    * declared size + odd-padding, floored at 8 bytes — structurally
    * loop-free. */
  private def walk(b: Array[Byte], from: Int, until: Int, depth: Int,
                   inMovi: Boolean, acc: Acc): Unit = {
    if (depth > MaxDepth) return
    var off = from
    while (off + 8 <= until) {
      val tpe = readType(b, off)
      val size = readU32LE(b, off + 4)
      val body = off + 8
      val end = math.min(until.toLong, body + size).toInt
      tpe match {
        case "LIST" if body + 4 <= end =>
          val lt = readType(b, body)
          walk(b, body + 4, end, depth + 1, inMovi || lt == "movi", acc)
        case "avih" if acc.usPerFrame.isEmpty && body + 40 <= end =>
          acc.usPerFrame = Some(readU32LE(b, body))
          acc.totalFrames = Some(readU32LE(b, body + 16))
          val w = readU32LE(b, body + 32)
          val h = readU32LE(b, body + 36)
          // header dims are untrusted u32s — only plausible positives count
          if (w > 0 && h > 0 && w <= Int.MaxValue && h <= Int.MaxValue) {
            acc.width = Some(w.toInt)
            acc.height = Some(h.toInt)
          }
        case "strh" if body + 8 <= end =>
          val st = readType(b, body)
          if (acc.codec.isEmpty && st == "vids")
            acc.codec = Some(readType(b, body + 4))
          // the FIRST auds stream's strh position names its movi chunks
          // (`${idx}%02dwb`) and claims the strl's following strf; any
          // other strh closes a still-pending claim
          acc.pendingAudioStrf = st == "auds" && acc.audioStream.isEmpty
          if (acc.pendingAudioStrf) acc.audioStream = Some(acc.nStreams)
          acc.nStreams += 1
        case "strf" if acc.pendingAudioStrf =>
          // the claimed stream's OWN format box — consumed exactly once,
          // whether or not it is decodable (a non-PCM first auds stream
          // reports as undecodable rather than borrowing a later stream's
          // WAVEFORMATEX)
          acc.pendingAudioStrf = false
          if (body + 16 <= end) {
            // WAVEFORMATEX; only uncompressed PCM (tag 1) is decodable here
            val tag = (b(body) & 0xff) | ((b(body + 1) & 0xff) << 8)
            if (tag == 1) {
              val ch = (b(body + 2) & 0xff) | ((b(body + 3) & 0xff) << 8)
              val bits = (b(body + 14) & 0xff) | ((b(body + 15) & 0xff) << 8)
              if (ch >= 1 && (bits == 8 || bits == 16)) {
                acc.audioChannels = Some(ch)
                acc.audioRate = Some(readU32LE(b, body + 4))
                acc.audioBits = Some(bits)
              }
            }
          }
        case t if inMovi && isFrameCc(t) =>
          // complete chunks only: a declared size overrunning the file
          // must not contribute a truncated frame
          if (body + size <= until) acc.frames += ((body, end))
        case t if inMovi && isAudioCc(t, acc.audioStream) =>
          // same complete-chunk rule: no half-samples from a truncation
          if (body + size <= until) acc.audioChunks += ((body, end))
        case _ => ()
      }
      val adv = 8L + size + (size & 1L)
      off = math.min(until.toLong, math.max(off + adv, off + 8L)).toInt
    }
  }

  private def parseAcc(b: Array[Byte]): Acc = {
    val acc = new Acc
    try {
      if (b.length >= 12 && readType(b, 0) == "RIFF" && readType(b, 8) == "AVI ") {
        val riffEnd = math.min(b.length.toLong, 8L + readU32LE(b, 4)).toInt
        walk(b, 12, riffEnd, 0, inMovi = false, acc)
      }
    } catch { case scala.util.control.NonFatal(_) => () } // belt over braces
    acc
  }

  /** Parse one payload's container metadata. Never throws; non-RIFF or
    * garbage → all-null row with n_streams 0. */
  def parseMeta(mediaId: Long, payload: Array[Byte]): AviMeta = {
    val acc = parseAcc(payload)
    AviMeta(mediaId, acc.width, acc.height, acc.nStreams, acc.totalFrames,
      acc.usPerFrame, acc.codec)
  }

  /** Demux + decode one payload's video frames: every `stride`-th movi
    * video chunk, capped at `maxFrames` (the GIF tier's per-record skew
    * bomb rule — the cap bounds both decode CPU and output multiplicity;
    * sampling is deterministic: first `maxFrames` of the stride sequence).
    * `frame_idx` is the chunk's position in movi order, so it is stable
    * under the cap; an undecodable chunk is skipped without shifting its
    * neighbours' indices. */
  private[graft] def decodeFrames(mediaId: Long, payload: Array[Byte],
                                  stride: Int, maxFrames: Int): Seq[AviFrame] = {
    val acc = parseAcc(payload)
    val n = acc.frames.size
    (0 until n by stride).take(maxFrames).flatMap { i =>
      val (s, e) = acc.frames(i)
      decodeJpegHist(payload, s, e - s).map { case (w, h, hist) =>
        AviFrame(mediaId, i, w, h, n, acc.usPerFrame, acc.codec, hist)
      }
    }
  }

  /** Decode one frame chunk with the JDK stack; same 8-bin normalized
    * luminance histogram as [[Multimodal.decodePerFrame]]. NonFatal, not
    * just IOException: imageio throws RuntimeExceptions on crafted bytes,
    * and one bad frame in an untrusted crawl must skip, not kill the job
    * (the ADVICE-r13 lesson). */
  private def decodeJpegHist(b: Array[Byte], off: Int,
                             len: Int): Option[(Int, Int, Array[Float])] = {
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(b, off, len))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val hist = new Array[Float](8)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
            hist(lum >> 5) += 1f
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toFloat
        Some((w, h, hist.map(_ / n)))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Demux + decode one payload's PCM audio track: the `auds` stream's
    * `##wb` chunks concatenated in movi order (audio frames may split
    * across chunks — the byte stream, not the chunk, is the track),
    * interpreted per the WAVEFORMATEX strf (8-bit unsigned / 16-bit
    * signed LE, channel mix-down by per-frame average), bucketed into the
    * same balanced 8-segment RMS profile as [[Multimodal.decodeAudio]] —
    * identical per-sample math, so the two paths emit comparable
    * features. None when no PCM track parses or it holds no complete
    * frame. */
  private[graft] def decodeAudioTrack(mediaId: Long,
                                      payload: Array[Byte]): Option[AviAudio] = {
    val acc = parseAcc(payload)
    for {
      rate <- acc.audioRate
      ch <- acc.audioChannels
      bits <- acc.audioBits
      if acc.audioChunks.nonEmpty
    } yield {
      val total = acc.audioChunks.map { case (s, e) => e - s }.sum
      val bytes = new Array[Byte](total)
      var off = 0
      acc.audioChunks.foreach { case (s, e) =>
        System.arraycopy(payload, s, bytes, off, e - s)
        off += e - s
      }
      val frameSize = ch * bits / 8
      val frames = bytes.length / frameSize
      val energy = new Array[Double](8)
      val counts = new Array[Long](8)
      var i = 0
      while (i < frames) {
        var c = 0
        var mix = 0.0
        while (c < ch) {
          val o = i * frameSize + c * (bits / 8)
          val s =
            if (bits == 8) ((bytes(o) & 0xff) - 128) / 128.0
            else (((bytes(o + 1) << 8) | (bytes(o) & 0xff))).toShort / 32768.0
          mix += s
          c += 1
        }
        mix /= ch
        val seg = (i.toLong * 8 / frames).toInt
        energy(seg) += mix * mix
        counts(seg) += 1
        i += 1
      }
      val rms = Array.tabulate(8)(s =>
        if (counts(s) > 0) math.sqrt(energy(s) / counts(s)) else 0.0)
      AviAudio(mediaId, rate, ch, bits, acc.audioChunks.size, frames.toLong, rms)
    }
  }.filter(_.n_samples > 0)

  /** Audio-track feature extraction over (media_id, payload) records — the
    * audio half of the A/V demux, same mapPartitions batch shape. One row
    * per payload with a decodable PCM track. */
  def extractAudioFeatures(records: Dataset[(Long, Array[Byte])]): DataFrame = {
    import records.sparkSession.implicits._
    records.mapPartitions(_.flatMap { case (id, p) =>
      decodeAudioTrack(id, p)
    }).toDF()
  }

  /** Container-metadata extraction over (media_id, payload) records — the
    * [[Mp4.extractVideoMeta]] batch shape. */
  def extractAviMeta(records: Dataset[(Long, Array[Byte])]): DataFrame = {
    import records.sparkSession.implicits._
    records.mapPartitions(_.map { case (id, p) => parseMeta(id, p) }).toDF()
  }

  /** Per-frame feature extraction over (media_id, payload) records — one
    * output row per decoded sampled frame, the
    * [[Multimodal.extractPerFrameFeatures]] shape with a REAL video
    * container behind it. Map-side only: embarrassingly parallel, zero
    * shuffle, composes with [[Multimodal.partitionBySize]] upstream for
    * decode-cost skew control. */
  def extractFrameFeatures(records: Dataset[(Long, Array[Byte])], stride: Int,
                           maxFrames: Int): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    require(maxFrames >= 1, s"maxFrames must be >= 1, got $maxFrames")
    import records.sparkSession.implicits._
    records.mapPartitions(_.flatMap { case (id, p) =>
      decodeFrames(id, p, stride, maxFrames)
    }).toDF()
  }
}
