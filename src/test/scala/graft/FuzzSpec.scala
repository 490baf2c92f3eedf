package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.time.{Instant, LocalDateTime, ZoneOffset}
import java.util.regex.Pattern

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._
import graft.etl.{Flatten, Silver}
import graft.schema.Schemas

/** Generative differential fuzz of the bronze→silver chain (r15 verdict #2).
  *
  * ScalaCheck generators produce STRUCTURED raw auction records — random
  * missing keys, mixed date shapes (datetime / ISO-T / date-only / epoch-
  * millis string / garbage / null), garbage bids (incl. decimal and empty
  * strings, null elements), 0–3-comma locations, unicode, whole-cell status
  * quirks — which are serialized to raw JSON files in BOTH envelope vintages
  * (map `{url→record}` and list `[record]`). The real Spark chain
  * (`Flatten.bronze ∘ Validate ∘ Silver.clean`, the q184 surface) replays the
  * whole directory in ONE job, and every one of the 45 silver columns is
  * compared row-by-row against [[PandasModel]] — an independent, per-record
  * Scala interpreter of the reference transform
  * (`transform_lambda/main.py:39-316`) written from the pandas semantics, not
  * from the Catalyst expressions.
  *
  * Each generated FILE is its own ScalaCheck seed (`Seed(base+i)`), so a
  * failure reproduces from the printed seed alone. 3 deterministic bases ×
  * 120 files ≈ 360 seeds per `sbt test` run — bounded: three Spark jobs
  * total, not one per case.
  *
  * Scope notes (documented, not fuzzed): whitespace in trimmed fields stays
  * ' ' / '\n' (pandas `.strip()` also eats \t\r — the scraper never emits
  * them, and both oracle sides spell space-trim); URLs stay ASCII with ≥5
  * `/`-segments (fewer is an IndexError crash in the reference too); map
  * keys are unique per file (JSON object semantics).
  */
class FuzzSpec extends AnyFunSuite {
  import FuzzGen._
  import PandasModel.SilverRow

  private lazy val spark = TestSpark.spark

  private def runBatch(base: Long, nFiles: Int): Unit = {
    val dir = Files.createTempDirectory(s"graft_fuzz_$base")
    val files = (0 until nFiles).map { i =>
      genFile(base + i).pureApply(Gen.Parameters.default, Seed(base + i))
    }
    files.zipWithIndex.foreach { case (f, i) =>
      writeFile(dir.resolve(f"raw_$i%04d.json"), renderFile(f))
    }
    val raw = files.flatMap(resolvedRecords)
    val expected = PandasModel.silver(raw)
    // vacuity guard: the batch must actually exercise the chain — plenty of
    // raw records, survivors after validity+dedup, and real dedup pressure.
    assert(raw.size >= 200, s"[seed base $base] only ${raw.size} raw records generated")
    assert(expected.size >= 30, s"[seed base $base] only ${expected.size} model survivors")
    assert(raw.size > expected.size * 2,
      s"[seed base $base] no dedup/validity pressure: ${raw.size} raw vs ${expected.size} kept")
    val got = collectSilver(dir)
    try compare(expected, got, base)
    finally deleteRec(dir)
  }

  /** The actual engine chain, q184's surface: bronze → valid → clean,
    * projected to the 45 insert columns. */
  private def collectSilver(dir: Path): Seq[SilverRow] = {
    val silver = Silver.run(Flatten.bronze(spark, dir.toString + "/*.json"))
      .select(Schemas.insertColumns.map(col).toIndexedSeq: _*)
    silver.collect().toIndexedSeq.map { r =>
      def s(n: String) = Option(r.getAs[String](n))
      def l(n: String) = if (r.isNullAt(r.fieldIndex(n))) None else Some(r.getAs[Long](n))
      def i(n: String) = if (r.isNullAt(r.fieldIndex(n))) None else Some(r.getAs[Int](n).toLong)
      def d(n: String) = if (r.isNullAt(r.fieldIndex(n))) None else Some(r.getAs[Double](n))
      SilverRow(
        auctionDateMicros = Option(r.getAs[java.sql.Timestamp]("auction_date"))
          .map(t => t.getTime / 1000 * 1000000L + t.getNanos / 1000),
        auctionId = s("auction_id"), vin = s("vin"), sellerType = s("seller_type"),
        reserveStatus = s("reserve_status"),
        reserveMet = r.getAs[Boolean]("reserve_met"),
        auctionStatus = s("auction_status"), title = s("auction_title"),
        subtitle = s("auction_subtitle"), make = s("make"), model = s("model"),
        extColor = s("exterior_color"), intColor = s("interior_color"),
        bodyStyle = s("body_style"), mileage = l("mileage"), engine = s("engine"),
        drivetrain = s("drivetrain"), transmission = s("transmission"),
        transmissionType = s("transmission_type"), gears = i("gears"),
        titleStatusCleaned = s("title_status_cleaned"), titleState = s("title_state"),
        city = s("city"), state = s("state"),
        bidCount = l("bid_count"), viewCount = l("view_count"),
        watcherCount = l("watcher_count"), highestBid = d("highest_bid_value"),
        maxBid = l("max_bid"), minBid = l("min_bid"), meanBid = d("mean_bid"),
        medianBid = d("median_bid"), bidRange = l("bid_range"),
        bids = Option(r.getAs[scala.collection.Seq[Long]]("bids")).map(_.toList).getOrElse(Nil),
        highlightCount = i("highlight_count"), equipmentCount = i("equipment_count"),
        modCount = i("mod_count"), flawCount = i("flaw_count"),
        serviceCount = i("service_count"), includedCount = i("included_items_count"),
        videoCount = i("video_count"), manufactureYear = i("manufacture_year"),
        location = s("location"), url = s("auction_url"), seller = s("seller"))
    }
  }

  private def compare(exp: Seq[SilverRow], got: Seq[SilverRow], base: Long): Unit = {
    val eS = exp.sortBy(r => (r.auctionId.getOrElse(""), r.url.getOrElse("")))
    val gS = got.sortBy(r => (r.auctionId.getOrElse(""), r.url.getOrElse("")))
    assert(eS.size == gS.size,
      s"[seed base $base] row count: model=${eS.size} spark=${gS.size}\n" +
        s"model-only ids: ${eS.map(_.auctionId).diff(gS.map(_.auctionId)).take(5)}\n" +
        s"spark-only ids: ${gS.map(_.auctionId).diff(eS.map(_.auctionId)).take(5)}")
    eS.zip(gS).zipWithIndex.foreach { case ((e, g), idx) =>
      assert(e == g,
        s"[seed base $base] row $idx (auction_id=${e.auctionId}, url=${e.url}) diverges:\n" +
          diff(e, g))
    }
  }

  private def diff(e: SilverRow, g: SilverRow): String = {
    val names = classOf[SilverRow].getDeclaredFields.map(_.getName)
    val ep = e.productIterator.toIndexedSeq
    val gp = g.productIterator.toIndexedSeq
    names.indices.filter(i => ep(i) != gp(i))
      .map(i => s"  ${names(i)}: model=${ep(i)} spark=${gp(i)}").mkString("\n")
  }

  private def deleteRec(p: Path): Unit = {
    import scala.jdk.CollectionConverters._
    Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
  }

  test("bronze→silver chain ≡ pandas-semantics model over 360 generated raw files") {
    runBatch(11000L, 120)
    runBatch(23000L, 120)
    runBatch(47000L, 120)
  }
}

// ─────────────────────────────────────────────────────────────────────────────
// Structured raw-record ADT + generators + JSON rendering
// ─────────────────────────────────────────────────────────────────────────────

object FuzzGen {

  case class RawStats(
      reserveStatus: Option[String], auctionStatus: Option[String],
      highestBid: Option[String], buyer: Option[String], sellerU: Option[String],
      bidCount: Option[Long], viewCount: Option[Long], watcherCount: Option[Long],
      auctionDate: Option[String], bids: Option[List[Option[String]]])

  case class RawFacts(
      make: Option[String], model: Option[String], mileage: Option[String],
      vin: Option[String], titleStatus: Option[String], location: Option[String],
      seller: Option[String], engine: Option[String], drivetrain: Option[String],
      transmission: Option[String], bodyStyle: Option[String],
      extColor: Option[String], intColor: Option[String], sellerType: Option[String])

  case class DescList(desc: Option[String], items: Option[List[String]])

  case class RawRec(
      urlField: Option[String], // the record's own auction_url JSON field
      title: Option[String], subtitle: Option[String], dougsTake: Option[String],
      ownership: Option[String], stats: Option[RawStats], facts: Option[RawFacts],
      highlights: Option[DescList], serviceHistory: Option[DescList],
      services: Option[DescList], knownFlaws: Option[List[String]],
      includedItems: Option[List[String]], sellerNotes: Option[List[String]],
      videos: Option[List[String]], equipment: Option[List[String]],
      modifications: Option[List[String]])

  /** One raw file: map envelope pairs (key, rec) — key wins as auction_url —
    * or list envelope recs whose urlField is authoritative. */
  sealed trait RawFile
  case class MapFile(entries: List[(String, RawRec)]) extends RawFile
  case class ListFile(recs: List[RawRec]) extends RawFile

  /** (resolved auction_url, record) pairs exactly as the envelope dispatch
    * defines them (map key wins; reference T:71). */
  def resolvedRecords(f: RawFile): List[(Option[String], RawRec)] = f match {
    case MapFile(es)  => es.map { case (k, r) => (Some(k), r) }
    case ListFile(rs) => rs.map(r => (r.urlField, r))
  }

  // ── value pools ──────────────────────────────────────────────────────────
  private val genOptWeighted: Gen[Boolean] = Gen.frequency(5 -> true, 1 -> false)
  private def opt[T](g: Gen[T]): Gen[Option[T]] =
    genOptWeighted.flatMap(p => if (p) g.map(Some(_)) else Gen.const(None))

  private val dateGen: Gen[Option[String]] = opt(Gen.frequency(
    5 -> (for {
      d <- Gen.choose(1, 28); h <- Gen.choose(0, 23); m <- Gen.choose(0, 59)
    } yield f"2024-05-$d%02d $h%02d:$m%02d:00"),
    2 -> (for {
      d <- Gen.choose(1, 28); h <- Gen.choose(0, 23)
    } yield f"2024-06-$d%02dT$h%02d:30:00"),
    1 -> Gen.choose(1, 28).map(d => f"2024-07-$d%02d"),
    2 -> Gen.choose(0L, 3000000L).map(k => (1714645200000L + k * 1000).toString),
    1 -> Gen.oneOf("soon", "n/a", "", "05/02/2024", "2024-05-02 25:00:00")))

  private val statusGen: Gen[Option[String]] = opt(Gen.oneOf(
    "Sold to winner", "Sold to somebody", "Sold", "sold", "SOLD",
    "Reserve not met, bid to $9,100", "Reserve not met, bid to",
    "Reserve not met", "Cancelled", "Canceled", "canceled by seller",
    "junk status", "", "Unsold", "resold", "Sold to Sold to x",
    "reserve not met, bid to"))

  private val moneyGen: Gen[Option[String]] = opt(Gen.oneOf(
    "$2,500", "2500", "$1,234.56", "junk", "", "$0", "$999,999"))

  /** Locale-independent "$12,345" rendering. */
  private def dollars(v: Long): String =
    "$" + v.toString.reverse.grouped(3).mkString(",").reverse

  private val bidElemGen: Gen[Option[String]] = Gen.frequency(
    8 -> Gen.choose(1L, 99999L).map(v => Some(dollars(v))),
    2 -> Gen.oneOf("2500", "$1", "1,2,3", "$-300").map(Some(_)),
    1 -> Gen.oneOf("junk", "", "$12.5").map(Some(_)),
    1 -> Gen.const(None)) // JSON null element

  private val bidsGen: Gen[Option[List[Option[String]]]] = Gen.frequency(
    1 -> Gen.const(None),
    1 -> Gen.const(Some(Nil)),
    6 -> Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, bidElemGen).map(Some(_))))

  private val mileageGen: Gen[Option[String]] = opt(Gen.oneOf(
    "45,000 miles", "TMU", "1,2,3 mi", "", "about 5,0,0 km", "98765",
    "  44 ", "120,000 km (75,000 mi)"))

  private val titleStatusGen: Gen[Option[String]] = opt(Gen.oneOf(
    "Clean (CA)", "Salvage (NY)", "Clean", "(X)", "Clean (", "A (B) (C)", "",
    // full state names: the J1 disjunctive lookup's BY-NAME arm (state_dim
    // matches "Texas" as state, never as abbr) — exercised by StarFuzzSpec
    "Clean (Texas)", "Salvage (New York)"))

  private val locationGen: Gen[Option[String]] = opt(Gen.oneOf(
    "Dallas, TX 75001", "Austin , TX 78701", "Berlin", "  Lisbon  ",
    "Washington, D.C., DC 20001", "city,", "", ",", "A,B,C",
    "São Paulo, SP", "Zürich,  ZH  8001", "Oslo ,NO"))

  private val drivetrainGen: Gen[Option[String]] = opt(Gen.oneOf(
    "Rear-wheel drive", "Front-wheel drive", "All-wheel drive", "4WD",
    "4WD and AWD", "awd & 4wd", "four-wheel drive", "", "hovercraft",
    "front & rear"))

  private val transmissionGen: Gen[Option[String]] = opt(Gen.oneOf(
    "6-Speed Manual", "Automatic (8-Speed)", "automatic", "CVT", "",
    "Manual 5-speed", "10-speed auto", "semi-AUTOmatic", "Sequential"))

  private val nlSuffixGen: Gen[String] = Gen.oneOf(
    "F-150\nSave", "M3", "  911  \nSave", "Multi\nline\nSave", "",
    "日産 Z\nSave", "Citroën DS")

  private val smallListGen: Gen[Option[List[String]]] = opt(
    Gen.choose(0, 4).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "bé", "c c", "d\nd", ""))))

  private val descListGen: Gen[Option[DescList]] = opt(for {
    d <- opt(Gen.alphaStr.map(_.take(6)))
    items <- smallListGen
  } yield DescList(d, items))

  private val statsGen: Gen[Option[RawStats]] = opt(for {
    rs <- opt(Gen.oneOf("Reserve", "No Reserve", ""))
    st <- statusGen
    hb <- moneyGen
    bu <- opt(Gen.alphaLowerStr.map(_.take(5)))
    su <- opt(Gen.alphaLowerStr.map(_.take(5)))
    bc <- opt(Gen.choose(0L, 40L))
    vc <- opt(Gen.choose(0L, 99999L))
    wc <- opt(Gen.choose(0L, 999L))
    dt <- dateGen
    bd <- bidsGen
  } yield RawStats(rs, st, hb, bu, su, bc, vc, wc, dt, bd))

  private val factsGen: Gen[Option[RawFacts]] = opt(for {
    mk <- opt(Gen.oneOf("Ford", "BMW", "Porsche", "DeLorean", "日産"))
    md <- opt(nlSuffixGen)
    mi <- mileageGen
    vn <- opt(Gen.alphaNumStr.map(_.take(8).toUpperCase))
    ts <- titleStatusGen
    lo <- locationGen
    se <- opt(Gen.oneOf("bob\nFollow", "alice", "  joe  \nFollow", "Chloé"))
    en <- opt(Gen.oneOf("5.0L V8", "2.0L I4 Turbo", ""))
    dr <- drivetrainGen
    tr <- transmissionGen
    bs <- opt(Gen.oneOf("Truck", "Coupe", "SUV", ""))
    ec <- opt(Gen.oneOf("Red", "Blau", ""))
    ic <- opt(Gen.oneOf("Black", "Tan"))
    st <- opt(Gen.oneOf("Dealer", "Private Party", ""))
  } yield RawFacts(mk, md, mi, vn, ts, lo, se, en, dr, tr, bs, ec, ic, st))

  private val recBodyGen: Gen[RawRec] = for {
    ti <- opt(Gen.oneOf("2015 Ford F-150", "1997 BMW 318i", "Car — nice", ""))
    su <- opt(Gen.oneOf("5.0L V8, RWD", "junk row", "líne\ntwo"))
    dt <- opt(Gen.oneOf("nice", "meh", ""))
    ow <- opt(Gen.oneOf("1 owner", "2 owners"))
    st <- statsGen
    fa <- factsGen
    hl <- descListGen
    sh <- descListGen
    sv <- descListGen
    kf <- smallListGen
    ii <- smallListGen
    sn <- smallListGen
    vi <- smallListGen
    eq <- smallListGen
    mo <- smallListGen
  } yield RawRec(None, ti, su, dt, ow, st, fa, hl, sh, sv, kf, ii, sn, vi, eq, mo)

  /** Slug pool: numeric-year, short-year, no-year, empty, padded. */
  private val slugGen: Gen[String] = Gen.oneOf(
    "2015-ford-f150", "1997-bmw-318i", "ford", "97-toyota", "", "2021",
    "x-2015", "0042-pad", "2018-bmw-m3")

  /** URLs are unique within a batch (uniq token in the slug, derived from
    * the caller's file tag — NOT a process-global counter, so a file truly
    * reproduces from its seed alone and a replayed (tag, seed) pair yields
    * byte-identical records) so the keep-newest (date desc, url asc)
    * tie-break is deterministic on BOTH sides; ids are drawn from a small
    * pool so cross-file duplicates are common. */
  private def urlGen(uniq: Long): Gen[String] = for {
    id <- Gen.choose(0, 39).map(i => f"FZ$i%03d")
    slug <- slugGen
    pad <- Gen.oneOf("", " ", "  ") // exercises trim(url)
    trail <- Gen.frequency(9 -> Gen.const(""), 1 -> Gen.const("/"))
  } yield s"$pad" + s"https://carsandbids.com/auctions/$id/$slug-u$uniq$trail" + pad

  /** `fileTag` must be unique per file within a batch (callers pass the
    * seed offset, e.g. base + i): it salts each record's url-uniqueness
    * token (tag·16 + record index — records per file ≤ 5 < 16), keeping
    * urls batch-unique while staying a pure function of (tag, seed). */
  def genFile(fileTag: Long): Gen[RawFile] = for {
    isMap <- Gen.oneOf(true, false)
    n <- Gen.choose(1, 5)
    recs <- Gen.listOfN(n, recBodyGen)
    urls <- Gen.sequence[List[String], String](
      recs.zipWithIndex.map { case (_, j) => urlGen(fileTag * 16 + j) })
    // map env: key authoritative, record's own url field is noise;
    // list env: record's url field is the only url.
    junkUrl <- Gen.oneOf(Some("ignored-key-must-win"), None)
    f <- if (isMap)
      Gen.const(MapFile(urls.zip(recs.map(_.copy(urlField = junkUrl)))))
    else
      Gen.const(ListFile(urls.lazyZip(recs).map((u, r) => r.copy(urlField = Some(u))).toList))
  } yield f

  // ── JSON rendering (UTF-8 raw, escape quote/backslash/control) ──────────
  private def jstr(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"'           => b.append("\\\"")
      case '\\'          => b.append("\\\\")
      case '\n'          => b.append("\\n")
      case c if c < 0x20 => b.append(f"\\u${c.toInt}%04x")
      case c             => b.append(c)
    }
    b.append('"').toString
  }
  private def j(v: Option[String]): String = v.fold("null")(jstr)
  private def jl(v: Option[Long]): String = v.fold("null")(_.toString)
  private def jarr(v: Option[List[String]]): String =
    v.fold("null")(xs => xs.map(jstr).mkString("[", ", ", "]"))
  private def jarrN(v: Option[List[Option[String]]]): String =
    v.fold("null")(xs => xs.map(j).mkString("[", ", ", "]"))
  private def jdesc(v: Option[DescList], itemsKey: String): String =
    v.fold("null")(dl =>
      s"""{"description": ${j(dl.desc)}, "$itemsKey": ${jarr(dl.items)}}""")

  private def renderRec(r: RawRec): String = {
    val stats = r.stats.fold("null")(s =>
      s"""{"reserve_status": ${j(s.reserveStatus)}, "auction_status": ${j(s.auctionStatus)},
         | "highest_bid_value": ${j(s.highestBid)}, "buyer_username": ${j(s.buyer)},
         | "seller_username": ${j(s.sellerU)}, "bid_count": ${jl(s.bidCount)},
         | "view_count": ${jl(s.viewCount)}, "watcher_count": ${jl(s.watcherCount)},
         | "auction_date": ${j(s.auctionDate)}, "bids": ${jarrN(s.bids)}}""".stripMargin)
    val facts = r.facts.fold("null")(f =>
      s"""{"Make": ${j(f.make)}, "Model": ${j(f.model)}, "Mileage": ${j(f.mileage)},
         | "VIN": ${j(f.vin)}, "Title Status": ${j(f.titleStatus)},
         | "Location": ${j(f.location)}, "Seller": ${j(f.seller)},
         | "Engine": ${j(f.engine)}, "Drivetrain": ${j(f.drivetrain)},
         | "Transmission": ${j(f.transmission)}, "Body Style": ${j(f.bodyStyle)},
         | "Exterior Color": ${j(f.extColor)}, "Interior Color": ${j(f.intColor)},
         | "Seller Type": ${j(f.sellerType)}}""".stripMargin)
    s"""{"auction_url": ${j(r.urlField)}, "auction_title": ${j(r.title)},
       | "auction_subtitle": ${j(r.subtitle)}, "dougs_take": ${j(r.dougsTake)},
       | "ownership_history": ${j(r.ownership)},
       | "auction_stats": $stats,
       | "auction_quick_facts": $facts,
       | "auction_highlights": ${jdesc(r.highlights, "bullet_points")},
       | "service_history": ${jdesc(r.serviceHistory, "items")},
       | "services": ${jdesc(r.services, "items")},
       | "known_flaws": ${jarr(r.knownFlaws)}, "included_items": ${jarr(r.includedItems)},
       | "seller_notes": ${jarr(r.sellerNotes)}, "auction_videos": ${jarr(r.videos)},
       | "auction_equipment": ${jarr(r.equipment)}, "modifications": ${jarr(r.modifications)}}""".stripMargin
  }

  def renderFile(f: RawFile): String = f match {
    case MapFile(es) =>
      es.map { case (k, r) => s"${jstr(k)}: ${renderRec(r)}" }
        .mkString("{\n", ",\n", "\n}")
    case ListFile(rs) => rs.map(renderRec).mkString("[\n", ",\n", "\n]")
  }

  def writeFile(p: Path, content: String): Unit =
    Files.write(p, content.getBytes(StandardCharsets.UTF_8))
}

// ─────────────────────────────────────────────────────────────────────────────
// The independent reference model: per-record pandas semantics
// (transform_lambda/main.py:110-316), plain Scala, no Spark.
// ─────────────────────────────────────────────────────────────────────────────

object PandasModel {
  import FuzzGen._

  case class SilverRow(
      auctionDateMicros: Option[Long], auctionId: Option[String],
      vin: Option[String], sellerType: Option[String],
      reserveStatus: Option[String], reserveMet: Boolean,
      auctionStatus: Option[String], title: Option[String],
      subtitle: Option[String], make: Option[String], model: Option[String],
      extColor: Option[String], intColor: Option[String],
      bodyStyle: Option[String], mileage: Option[Long], engine: Option[String],
      drivetrain: Option[String], transmission: Option[String],
      transmissionType: Option[String], gears: Option[Long],
      titleStatusCleaned: Option[String], titleState: Option[String],
      city: Option[String], state: Option[String],
      bidCount: Option[Long], viewCount: Option[Long], watcherCount: Option[Long],
      highestBid: Option[Double], maxBid: Option[Long], minBid: Option[Long],
      meanBid: Option[Double], medianBid: Option[Double], bidRange: Option[Long],
      bids: List[Long], highlightCount: Option[Long], equipmentCount: Option[Long],
      modCount: Option[Long], flawCount: Option[Long], serviceCount: Option[Long],
      includedCount: Option[Long], videoCount: Option[Long],
      manufactureYear: Option[Long], location: Option[String],
      url: Option[String], seller: Option[String])

  // E1: mixed-format parse, then epoch-millis fallback (T:139).
  private val dtFull = Pattern.compile("""\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}:\d{2}""")
  private val dtDate = Pattern.compile("""\d{4}-\d{2}-\d{2}""")
  private val allDigits = Pattern.compile("""\d{12,14}""")
  def parseDate(s: Option[String]): Option[Long] = s.flatMap { v =>
    if (dtFull.matcher(v).matches())
      try Some(LocalDateTime.parse(v.replace(' ', 'T'))
        .toInstant(ZoneOffset.UTC).getEpochSecond * 1000000L)
      catch { case _: Exception => None } // e.g. hour 25 → NaT
    else if (dtDate.matcher(v).matches())
      try Some(LocalDateTime.parse(v + "T00:00:00")
        .toInstant(ZoneOffset.UTC).getEpochSecond * 1000000L)
      catch { case _: Exception => None }
    else if (allDigits.matcher(v).matches())
      Some(Instant.ofEpochMilli(v.toLong).getEpochSecond * 1000000L +
        (v.toLong % 1000) * 1000L)
    else None
  }

  // F1 (T:110-132): contains-match over lowercase, null → invalid.
  private val validTokens = Seq("sold", "reserve not met", "canceled", "cancelled")
  def isValid(status: Option[String]): Boolean =
    status.exists(s => validTokens.exists(s.toLowerCase.contains))

  // E2 / E17 (T:143-146, T:306-314) — NOTE split(-1): keep trailing empties.
  def auctionId(url: String): Option[String] = {
    val parts = url.trim.split("/", -1)
    if (parts.length >= 5) Some(parts(4)) else None
  }
  def manufactureYear(url: String): Option[Long] = {
    val last = url.trim.split("/", -1).last
    toLongOpt(last.split("-", -1).head).filter(v => v >= Int.MinValue && v <= Int.MaxValue)
  }

  // E3 (T:153,189)
  def firstLineTrim(s: Option[String]): Option[String] =
    s.map(v => trimSp(v.split("\n", -1).head))
  private def trimSp(s: String): String = {
    var i = 0; var j = s.length
    while (i < j && s.charAt(i) == ' ') i += 1
    while (j > i && s.charAt(j - 1) == ' ') j -= 1
    s.substring(i, j)
  }

  private def toLongOpt(s: String): Option[Long] =
    if (s.nonEmpty && s.matches("[+-]?\\d+"))
      try Some(s.toLong) catch { case _: Exception => None }
    else None
  private def toDoubleOpt(s: String): Option[Double] =
    try { if (s.trim.isEmpty) None else Some(s.trim.toDouble) }
    catch { case _: Exception => None }

  // E4 (T:157-165)
  private val digitRun = Pattern.compile("[\\d,]+")
  def mileage(s: Option[String]): Option[Long] = s.flatMap { v =>
    val m = digitRun.matcher(v)
    if (m.find()) toLongOpt(m.group(0).replace(",", "")) else None
  }

  // E5 (T:169)
  def money(s: Option[String]): Option[Double] =
    s.flatMap(v => toDoubleOpt(v.replace("$", "").replace(",", "")))

  // E8 (T:183): substring rewrite then whole-cell exact replace.
  def statusCanonical(s: Option[String]): Option[String] = s.map { v =>
    val a = v.replace("Sold to", "Sold")
    if (a == "Reserve not met, bid to") "Reserve not met" else a
  }
  // E9 (T:186) — on the CANONICALIZED status.
  def reserveMet(canon: Option[String]): Boolean =
    canon.exists(_.toLowerCase == "sold")

  // E10 (T:192-198): all-or-nothing; int() semantics (no decimals).
  def bidsParse(b: Option[List[Option[String]]]): List[Long] = b match {
    case None => Nil
    case Some(xs) =>
      val parsed = xs.map(_.flatMap(e => toLongOpt(e.replace("$", "").replace(",", ""))))
      if (parsed.exists(_.isEmpty)) Nil else parsed.map(_.get)
  }

  // E11 (T:202-203)
  private val tsCleanRe = Pattern.compile("^(.*?) \\(")
  private val tsStateRe = Pattern.compile("\\((.*?)\\)")
  def titleStatusCleaned(s: Option[String]): Option[String] = s.flatMap { v =>
    val m = tsCleanRe.matcher(v)
    if (m.find() && m.group(1).nonEmpty) Some(m.group(1)) else None
  }
  def titleState(s: Option[String]): Option[String] = s.flatMap { v =>
    val m = tsStateRe.matcher(v)
    if (m.find() && m.group(1).nonEmpty) Some(m.group(1)) else None
  }

  // E12 (T:207-221): rsplit-once on the LAST comma.
  def locationCity(s: Option[String]): Option[String] = s.map { v =>
    val i = v.lastIndexOf(',')
    if (i >= 0) trimSp(v.substring(0, i)) else trimSp(v)
  }
  def locationState(s: Option[String]): Option[String] = s.flatMap { v =>
    val i = v.lastIndexOf(',')
    if (i < 0) None
    else Some(trimSp(v.substring(i + 1)).split(" ", -1).head)
  }

  // E15 (T:225-241)
  def transmissionType(s: Option[String]): Option[String] = s.flatMap { v =>
    if (v.isEmpty) None
    else if (v.toLowerCase.contains("manual")) Some("Manual")
    else if (v.toLowerCase.contains("auto")) Some("Automatic")
    else Some("Other")
  }
  private val gearsRe = Pattern.compile("(\\d+)-speed")
  def gears(s: Option[String]): Option[Long] = s.flatMap { v =>
    val m = gearsRe.matcher(v.toLowerCase)
    if (m.find()) toLongOpt(m.group(1)).filter(g => g >= Int.MinValue && g <= Int.MaxValue)
    else None
  }

  // E16 (T:245-264): order-exact.
  def drivetrainClass(s: Option[String]): String = {
    val v = s.getOrElse("")
    val d = v.toLowerCase
    if (v.isEmpty) "Other"
    else if (d.contains("4wd") && d.contains("awd")) "4WD/AWD"
    else if (d.contains("front")) "FWD"
    else if (d.contains("rear")) "RWD"
    else if (d.contains("awd") || d.contains("all-wheel")) "AWD"
    else if (d.contains("4wd") || d.contains("four-wheel")) "4WD"
    else "Other"
  }

  // E13 (T:267-290): stats only when n ≥ 2; left-fold mean; exact median.
  def bidStats(bids: List[Long])
      : (Option[Long], Option[Long], Option[Double], Option[Double], Option[Long]) =
    if (bids.size < 2) (None, None, None, None, None)
    else {
      val n = bids.size
      val d = bids.map(_.toDouble)
      val mean = d.foldLeft(0.0)(_ + _) / n
      val sorted = d.sorted
      val half = n / 2
      val median =
        if (n % 2 == 1) sorted(half)
        else (sorted(half - 1) + sorted(half)) / 2.0
      (Some(bids.max), Some(bids.min), Some(mean), Some(median),
        Some(bids.max - bids.min))
    }

  /** Full chain over the resolved (url, record) pairs: flatten defaults →
    * F1 validity → E1+E2 → A4 keep-newest (date desc nulls last, url asc) →
    * E3-E17. */
  def silver(records: Seq[(Option[String], RawRec)]): Seq[SilverRow] = {
    case class Mid(url: Option[String], rec: RawRec, micros: Option[Long],
                   id: Option[String])
    val valid = records
      .filter { case (_, r) => isValid(r.stats.flatMap(_.auctionStatus)) }
      .map { case (u, r) =>
        Mid(u, r, parseDate(r.stats.flatMap(_.auctionDate)),
          u.flatMap(auctionId)) }
    // A4: keep newest per auction_id; ties → smallest url (urls unique in gen)
    val kept = valid.groupBy(_.id).values.map { g =>
      g.minBy(m => (m.micros.fold(1)(_ => 0), m.micros.map(-_).getOrElse(0L),
        m.url.getOrElse("")))
    }.toSeq

    kept.map { m =>
      val r = m.rec
      val st = r.stats
      val fa = r.facts
      val canonStatus = statusCanonical(st.flatMap(_.auctionStatus))
      val bids = bidsParse(st.flatMap(_.bids))
      val (mx, mn, mean, med, rng) = bidStats(bids)
      val highlights = r.highlights.flatMap(_.items).getOrElse(Nil)
      val services = r.services.flatMap(_.items)
        .orElse(r.serviceHistory.flatMap(_.items)).getOrElse(Nil)
      val videos = r.videos.getOrElse(Nil)
      SilverRow(
        auctionDateMicros = m.micros,
        auctionId = m.id,
        vin = fa.flatMap(_.vin),
        sellerType = fa.flatMap(_.sellerType),
        reserveStatus = st.flatMap(_.reserveStatus),
        reserveMet = reserveMet(canonStatus),
        auctionStatus = canonStatus,
        title = r.title, subtitle = r.subtitle,
        make = fa.flatMap(_.make),
        model = firstLineTrim(fa.flatMap(_.model)),
        extColor = fa.flatMap(_.extColor), intColor = fa.flatMap(_.intColor),
        bodyStyle = fa.flatMap(_.bodyStyle),
        mileage = mileage(fa.flatMap(_.mileage)),
        engine = fa.flatMap(_.engine),
        drivetrain = Some(drivetrainClass(fa.flatMap(_.drivetrain))),
        transmission = fa.flatMap(_.transmission),
        transmissionType = transmissionType(fa.flatMap(_.transmission)),
        gears = gears(fa.flatMap(_.transmission)),
        titleStatusCleaned = titleStatusCleaned(fa.flatMap(_.titleStatus)),
        titleState = titleState(fa.flatMap(_.titleStatus)),
        city = locationCity(fa.flatMap(_.location)),
        state = locationState(fa.flatMap(_.location)),
        bidCount = st.flatMap(_.bidCount),
        viewCount = Some(st.flatMap(_.viewCount).getOrElse(0L)),
        watcherCount = Some(st.flatMap(_.watcherCount).getOrElse(0L)),
        highestBid = money(st.flatMap(_.highestBid)),
        maxBid = mx, minBid = mn, meanBid = mean, medianBid = med,
        bidRange = rng, bids = bids,
        highlightCount = Some(highlights.size.toLong),
        equipmentCount = r.equipment.map(_.size.toLong),
        modCount = r.modifications.map(_.size.toLong),
        flawCount = r.knownFlaws.map(_.size.toLong),
        serviceCount = Some(services.size.toLong),
        includedCount = r.includedItems.map(_.size.toLong),
        videoCount = Some(videos.size.toLong),
        manufactureYear = m.url.flatMap(manufactureYear),
        location = fa.flatMap(_.location),
        url = m.url,
        seller = firstLineTrim(fa.flatMap(_.seller)))
    }
  }
}
