package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Multimodal, TextOps}
import graft.util.Tables.load

/** Multimodal binary-column plumbing surface: opaque payload + typed metadata,
  * with expression-level deterministic pseudo-features (the mapPartitions
  * decode-stub path is exercised in MultimodalSpec; this query keeps the
  * schema/metadata plumbing under the DuckDB oracle).
  */
object MultimodalQueries {

  def q32MultimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.fromDocuments(load(spark, dir, "documents"))
    media.select(
      col("media_id"),
      col("kind"),
      col("meta.n_bytes").as("n_bytes"),
      (lit(1) + TextOps.hash16(col("payload")) % 64).as("fake_width"),
      (lit(1) + floor(col("meta.n_bytes") / 256)).cast("long").as("fake_frames")
    ).orderBy(col("media_id"))
  }

  /** q185 — real MP4/ISO-BMFF container-metadata extraction
    * ([[graft.ext.Mp4]], round-14 verdict task #4). Every document id
    * becomes a structurally real ISO-BMFF payload (proper box framing,
    * both mvhd versions, 16.16 tkhd dimensions, stsd sample entries; ids
    * ≡ 0 mod 31 get md5 garbage instead — the NonFatal path), and the
    * metadata comes back out by WALKING THE BOXES map-side. The oracle
    * replays the planted parameters arithmetically from doc_id — Spark
    * must agree by actually parsing bytes it framed, so any box-offset
    * error (mvhd version fields, fixed-point shifts, entry framing)
    * surfaces as a hash mismatch, not a silent drift.
    *
    * Scale shape: one projection, one mapPartitions — embarrassingly
    * parallel, zero shuffle; at 100 TB this is the same
    * per-split demux pass a real video-curation scan performs. */
  def q185VideoMetadata(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // NO repartition here, unlike q199: the box synthesis/walk is header
    // arithmetic, not codec work — the fan-out exchange measurably costs
    // more than the parallelism buys (A/B min-of-3, r19)
    val ids = load(spark, dir, "documents").select(col("doc_id")).as[Long]
    val records = ids.map { k =>
      val payload =
        if (k % 31 == 0)
          java.security.MessageDigest.getInstance("MD5")
            .digest(BigInt(k).toByteArray)
        else {
          val n = 1 + (k % 3L).toInt
          val tracks = Seq(graft.ext.Mp4.TrackSpec(
              Vector("avc1", "hvc1", "vp09")((k % 3L).toInt),
              16 * (1 + (k % 120L).toInt), 16 * (1 + (k % 68L).toInt))) ++
            (if (n >= 2) Seq(graft.ext.Mp4.TrackSpec("mp4a", 0, 0, "soun")) else Nil) ++
            (if (n >= 3) Seq(graft.ext.Mp4.TrackSpec("tx3g", 0, 0, "text")) else Nil)
          graft.ext.Mp4.synthesize(
            majorBrand = if (k % 2 == 0) "isom" else "mp42",
            timescale = 600L + (k % 1000L) * 10L,
            duration = (k % 90000L) + 60L,
            tracks = tracks,
            mvhdVersion = (k % 2L).toInt)
        }
      (k, payload)
    }
    graft.ext.Mp4.extractVideoMeta(records)
      .localCheckpoint() // O(input) dump: the sort's sampling pass must
      .orderBy(col("media_id")) // not re-run the box walk (q204 pattern)
  }

  /** q199 — real MJPEG-in-AVI FRAME decode ([[graft.ext.Avi]], round-15
    * verdict task #3). Every document id becomes a structurally real AVI
    * (RIFF framing, 56-byte avih/strh, word-alignment padding) whose movi
    * chunks are real JDK-encoded JPEGs — solid gray at luminance-bin
    * CENTERS (gray = 32·bin + 16), so decode survives JPEG's DC
    * quantization with every pixel in the planted bin. Ids ≡ 0 mod 31 get
    * md5 garbage (non-RIFF → zero frame rows — the NonFatal path). Spark
    * must demux the container and DECODE EVERY FRAME to recover the
    * dominant bin and its exact 1.0 mass; the oracle replays the planted
    * parameters arithmetically, so any chunk-framing, padding, or
    * byte-range error surfaces as a hash mismatch.
    *
    * Scale shape: one projection, one mapPartitions flatMap — zero
    * shuffle; per-record decode fan-out is capped (maxFrames) so an
    * adversarial million-chunk AVI cannot skew-bomb a task. */
  def q199AviFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // the id column is one tiny parquet split, but each id fans out into a
    // JPEG encode + container demux + per-frame decode — spread the codec
    // work across the cluster before the map (decode cost, not input bytes,
    // is the unit of work here; Multimodal.partitionBySize is the same idea
    // for real payloads)
    val ids = load(spark, dir, "documents").select(col("doc_id"))
      .repartition(64).as[Long]
    val records = ids.map { k =>
      val payload =
        if (k % 31 == 0)
          java.security.MessageDigest.getInstance("MD5")
            .digest(BigInt(k).toByteArray)
        else {
          val n = 1 + (k % 4L).toInt
          val w = 16 * (1 + (k % 8L).toInt)
          val h = 16 * (1 + (k % 5L).toInt)
          val frames = (0 until n).map(f =>
            graft.ext.Avi.encodeGrayJpeg(w, h, 32 * ((k + f) % 8L).toInt + 16))
          graft.ext.Avi.synthesize(
            usPerFrame = 20000L + (k % 100L) * 100L,
            width = w, height = h, frames = frames)
        }
      (k, payload)
    }
    graft.ext.Avi.extractFrameFeatures(records, stride = 1, maxFrames = 8)
      .select(
        col("media_id"), col("frame_idx"), col("width"), col("height"),
        col("n_frames"), col("us_per_frame"), col("codec"),
        (expr("array_position(feature, array_max(feature))") - 1)
          .cast("int").as("dom_bin"),
        expr("array_max(feature)").cast("double").as("dom_mass"))
      .localCheckpoint() // one JPEG encode+demux+decode pass, not two
      .orderBy(col("media_id"), col("frame_idx"))
  }

  /** q202 — the AUDIO half of the AVI demux ([[graft.ext.Avi
    * .extractAudioFeatures]]): the same per-doc containers as q199 gain an
    * interleaved `auds` PCM stream — TWO `01wb` chunks of constant
    * 16-bit amplitude (c1 then c2), each a multiple of 4 samples, so the
    * 8-segment RMS profile is segment-pure: segments 0–3 read exactly
    * c1/32768 and 4–7 exactly c2/32768 (every float op on a constant
    * sample is exact — see [[graft.ext.Avi.encodePcm16]]). Spark must
    * find the auds strl, parse WAVEFORMATEX, collect the stream's chunks
    * in movi order and concatenate them — a wrong chunk order, a missed
    * chunk, or an off-by-one in the format offsets flips rms_first /
    * rms_last / n_samples and fails the hash. Ids ≡ 0 mod 31 stay the
    * garbage rows (no RIFF → no audio row). Zero-shuffle mapPartitions. */
  def q202AviAudio(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = load(spark, dir, "documents").select(col("doc_id"))
      .repartition(64).as[Long]
    val records = ids.map { k =>
      val payload =
        if (k % 31 == 0)
          java.security.MessageDigest.getInstance("MD5")
            .digest(BigInt(k).toByteArray)
        else {
          val w = 16 * (1 + (k % 4L).toInt)
          val nc = 400 + 8 * (k % 50L).toInt
          val c1 = 500 + (k * 7 % 20000L).toInt
          val c2 = 300 + (k * 13 % 25000L).toInt
          graft.ext.Avi.synthesize(
            usPerFrame = 33366L, width = w, height = w,
            frames = Seq(graft.ext.Avi.encodeGrayJpeg(w, w, 144)),
            audioChunks = Seq(graft.ext.Avi.encodePcm16(c1, nc),
              graft.ext.Avi.encodePcm16(c2, nc)),
            audioRate = 8000L + (k % 1000L))
        }
      (k, payload)
    }
    graft.ext.Avi.extractAudioFeatures(records)
      .select(col("media_id"), col("sample_rate"), col("channels"),
        col("bits"), col("n_chunks"), col("n_samples"),
        element_at(col("rms"), 1).as("rms_first"),
        element_at(col("rms"), 8).as("rms_last"))
      // NO pre-sort localCheckpoint (r20 A/B, 3 matched pairs): the PCM
      // walk is cheap header arithmetic — materializing it costs more
      // than the range-sort sampling pass it saves (0.745 -> 0.653 s min;
      // the r19 steal-clean records moved the same way). q199 keeps its
      // checkpoint: per-frame JPEG decode is the expensive case.
      .orderBy(col("media_id"))
  }

  /** q203 — AVI container METADATA extraction ([[graft.ext.Avi.parseMeta]],
    * the q185 metadata shape for the RIFF container): avih dims/frame-count/
    * µs-per-frame, strh-counted stream count (odd ids gain an interleaved
    * auds strl → 2 streams), vids codec fourcc. Frame payloads are junk
    * bytes — metadata never decodes, so the walk must take every field from
    * the HEADERS it framed, and any offset error (little-endian fields,
    * word-alignment padding, strl association) is a hash mismatch. Ids ≡ 0
    * mod 31 are the garbage rows: all-null metadata with n_streams 0 IN the
    * oracle (the NonFatal arm). Zero-shuffle mapPartitions. */
  def q203AviMetadata(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ids = load(spark, dir, "documents").select(col("doc_id"))
      .repartition(64).as[Long]
    val records = ids.map { k =>
      val payload =
        if (k % 31 == 0)
          java.security.MessageDigest.getInstance("MD5")
            .digest(BigInt(k).toByteArray)
        else {
          val n = 1 + (k % 4L).toInt
          val frames = Seq.fill(n)(Array.fill[Byte](10 + (k % 7L).toInt)(0x55))
          val audio = if (k % 2 == 1)
            Seq(graft.ext.Avi.encodePcm16(1000, 64)) else Nil
          graft.ext.Avi.synthesize(
            usPerFrame = 20000L + (k % 100L) * 100L,
            width = 16 * (1 + (k % 8L).toInt),
            height = 16 * (1 + (k % 5L).toInt),
            frames = frames, audioChunks = audio)
        }
      (k, payload)
    }
    graft.ext.Avi.extractAviMeta(records)
      // NO pre-sort localCheckpoint (r20 A/B, 3 matched pairs): header
      // walk only — 0.659 -> 0.611 s min without it (see q202's note)
      .orderBy(col("media_id"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q32_multimodal_features" -> (q32MultimodalFeatures _),
    "q185_video_metadata" -> (q185VideoMetadata _),
    "q199_avi_frames" -> (q199AviFrames _),
    "q202_avi_audio" -> (q202AviAudio _),
    "q203_avi_metadata" -> (q203AviMetadata _)
  )

  private val hex16 = (0 until 4).map { i =>
    val shift = math.pow(16, 3 - i).toInt
    s"(strpos('0123456789abcdef', substring(md5(text), ${i + 1}, 1)) - 1) * $shift"
  }.mkString(" + ")

  val sql: Map[String, String] = Map(
    "q32_multimodal_features" ->
      s"""SELECT doc_id AS media_id,
         |  'blob:' || source AS kind,
         |  CAST(length(text) AS BIGINT) AS n_bytes,
         |  CAST(1 + ($hex16) % 64 AS INTEGER) AS fake_width,
         |  CAST(1 + length(text) // 256 AS BIGINT) AS fake_frames
         |FROM documents ORDER BY media_id""".stripMargin,
    /* q185: the planted container parameters, replayed arithmetically.
     * duration_ms = ticks*1000 // timescale (both engines integer-floor on
     * positives); codecs = video fourcc by id mod 3, then the audio/text
     * entries the track count adds; ids ≡ 0 mod 31 are the garbage rows —
     * all-null metadata with n_tracks 0. */
    "q185_video_metadata" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 31 = 0 THEN NULL
        |    WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'mp42' END AS major_brand,
        |  CAST(CASE WHEN doc_id % 31 = 0 THEN 0
        |    ELSE 1 + doc_id % 3 END AS INTEGER) AS n_tracks,
        |  CASE WHEN doc_id % 31 = 0 THEN NULL
        |    ELSE 600 + (doc_id % 1000) * 10 END AS timescale,
        |  CASE WHEN doc_id % 31 = 0 THEN NULL
        |    ELSE ((doc_id % 90000) + 60) * 1000
        |      // (600 + (doc_id % 1000) * 10) END AS duration_ms,
        |  CAST(CASE WHEN doc_id % 31 = 0 THEN NULL
        |    ELSE 16 * (1 + doc_id % 120) END AS INTEGER) AS width,
        |  CAST(CASE WHEN doc_id % 31 = 0 THEN NULL
        |    ELSE 16 * (1 + doc_id % 68) END AS INTEGER) AS height,
        |  CASE WHEN doc_id % 31 = 0 THEN NULL
        |    ELSE ['avc1','hvc1','vp09'][CAST(doc_id % 3 AS INTEGER) + 1]
        |      || CASE WHEN doc_id % 3 >= 1 THEN ',mp4a' ELSE '' END
        |      || CASE WHEN doc_id % 3 >= 2 THEN ',tx3g' ELSE '' END
        |    END AS codecs
        |FROM documents ORDER BY media_id""".stripMargin,
    /* q199: the planted AVI/JPEG parameters, replayed arithmetically.
     * One row per (id, frame) for ids not ≡ 0 mod 31 (those are garbage
     * payloads → zero frame rows); dom_bin = (id + frame) % 8 because the
     * frame is solid gray 32·bin + 16 and a solid (DC-only) JPEG decodes
     * pixel-constant within ±2 — never crossing the ±16 bin boundary —
     * so the dominant bin holds exactly 1.0 of the mass. */
    "q199_avi_frames" ->
      """SELECT doc_id AS media_id,
        |  CAST(f AS INTEGER) AS frame_idx,
        |  CAST(16 * (1 + doc_id % 8) AS INTEGER) AS width,
        |  CAST(16 * (1 + doc_id % 5) AS INTEGER) AS height,
        |  CAST(1 + doc_id % 4 AS INTEGER) AS n_frames,
        |  20000 + (doc_id % 100) * 100 AS us_per_frame,
        |  'MJPG' AS codec,
        |  CAST((doc_id + f) % 8 AS INTEGER) AS dom_bin,
        |  1.0 AS dom_mass
        |FROM (SELECT doc_id, unnest(range(1 + doc_id % 4)) AS f
        |      FROM documents WHERE doc_id % 31 <> 0)
        |ORDER BY media_id, frame_idx""".stripMargin,
    /* q202: the planted PCM parameters replayed arithmetically — constant
     * 16-bit samples make every decode-side float op exact, so the RMS of
     * a segment-pure block is literally c/32768.0 in both engines. */
    "q202_avi_audio" ->
      """SELECT doc_id AS media_id,
        |  8000 + (doc_id % 1000) AS sample_rate,
        |  CAST(1 AS INTEGER) AS channels,
        |  CAST(16 AS INTEGER) AS bits,
        |  CAST(2 AS INTEGER) AS n_chunks,
        |  CAST(2 * (400 + 8 * (doc_id % 50)) AS BIGINT) AS n_samples,
        |  CAST(500 + (doc_id * 7) % 20000 AS DOUBLE) / 32768.0 AS rms_first,
        |  CAST(300 + (doc_id * 13) % 25000 AS DOUBLE) / 32768.0 AS rms_last
        |FROM documents WHERE doc_id % 31 <> 0
        |ORDER BY media_id""".stripMargin,
    /* q203: the planted container headers replayed arithmetically; odd ids
     * carry the interleaved auds strl (2 streams), garbage ids the all-null
     * NonFatal arm with n_streams 0. */
    "q203_avi_metadata" ->
      """SELECT doc_id AS media_id,
        |  CAST(CASE WHEN doc_id % 31 = 0 THEN NULL
        |    ELSE 16 * (1 + doc_id % 8) END AS INTEGER) AS width,
        |  CAST(CASE WHEN doc_id % 31 = 0 THEN NULL
        |    ELSE 16 * (1 + doc_id % 5) END AS INTEGER) AS height,
        |  CAST(CASE WHEN doc_id % 31 = 0 THEN 0
        |    WHEN doc_id % 2 = 1 THEN 2 ELSE 1 END AS INTEGER) AS n_streams,
        |  CASE WHEN doc_id % 31 = 0 THEN NULL
        |    ELSE 1 + doc_id % 4 END AS total_frames,
        |  CASE WHEN doc_id % 31 = 0 THEN NULL
        |    ELSE 20000 + (doc_id % 100) * 100 END AS us_per_frame,
        |  CASE WHEN doc_id % 31 = 0 THEN NULL ELSE 'MJPG' END AS codec
        |FROM documents ORDER BY media_id""".stripMargin
  )
}
