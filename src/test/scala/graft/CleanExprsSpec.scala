package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.CleanExprs._

/** E1-E21 edge cases lifted from the reference semantics (SURVEY.md §5.2). */
class CleanExprsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c.as("r")).head().get(0)

  test("E1: parses datetime strings and epoch millis") {
    val r = Seq("2024-05-01 10:00:00", "1714557600000", "garbage")
      .toDF("s").select(parseAuctionDate($"s").cast("string").as("r")).collect().map(_.getString(0))
    assert(r(0) == "2024-05-01 10:00:00")
    assert(r(1) == "2024-05-01 10:00:00") // 1714557600000 ms = same instant
    assert(r(2) == null)
  }

  test("E2: auction id is the 5th URL segment") {
    assert(one(auctionIdFromUrl(lit(" https://carsandbids.com/auctions/ABC123/2015-ford-f150 "))) == "ABC123")
  }

  test("E3: first line trimmed (drops Save/Follow UI text)") {
    assert(one(firstLineTrim(lit(" F-150\nSave "))) == "F-150")
  }

  test("E4: mileage extracts first digit run, null when absent") {
    assert(one(mileage(lit("~45,000 miles (TMU)"))) == 45000L)
    assert(one(mileage(lit("TMU"))) == null)
    assert(one(mileage(lit(null).cast("string"))) == null)
  }

  test("E5: currency strip to double") {
    assert(one(money(lit("$12,345.67"))) == 12345.67)
  }

  test("E7: count coerce with default 0") {
    assert(one(countWithDefault(lit("1,234"))) == 1234L)
    assert(one(countWithDefault(lit(null).cast("string"))) == 0L)
    assert(one(countWithDefault(lit("junk"))) == 0L)
  }

  test("E8: 'Sold to' substring rewrite; 'Reserve not met, bid to' only on exact cell") {
    assert(one(statusCanonical(lit("Sold to winner"))) == "Sold winner")
    assert(one(statusCanonical(lit("Reserve not met, bid to"))) == "Reserve not met")
    // pandas .replace (DataFrame-level) only fires on whole-cell match — kept:
    assert(one(statusCanonical(lit("Reserve not met, bid to $5,000"))) == "Reserve not met, bid to $5,000")
  }

  test("E9: reserve met iff lowercased status is exactly 'sold'") {
    assert(one(reserveMet(lit("Sold"))) == true)
    assert(one(reserveMet(lit("Sold winner"))) == false)
  }

  test("E10: bids all-or-nothing parse") {
    val df = Seq(
      (1, Seq("$1,000", "$2,500")),
      (2, Seq("$1,000", "junk")),
      (3, null.asInstanceOf[Seq[String]])
    ).toDF("id", "bids").select($"id", bidsParse($"bids").as("b")).orderBy($"id")
    val rows = df.collect()
    assert(rows(0).getSeq[Long](1) == Seq(1000L, 2500L))
    assert(rows(1).getSeq[Long](1) == Seq())
    assert(rows(2).getSeq[Long](1) == Seq())
  }

  test("E11: title split, null (not empty string) on no-match") {
    assert(one(titleStatusCleaned(lit("Clean (CA)"))) == "Clean")
    assert(one(titleState(lit("Clean (CA)"))) == "CA")
    assert(one(titleStatusCleaned(lit("Salvage"))) == null)
    assert(one(titleState(lit("Salvage"))) == null)
  }

  test("E12: rsplit-once city/state incl multi-comma and no-comma") {
    def cs(s: String) = (one(locationCity(lit(s))), one(locationState(lit(s))))
    assert(cs("Dallas, TX 75001") == ("Dallas", "TX"))
    assert(cs("Calgary, AB, Canada") == ("Calgary, AB", "Canada"))
    assert(cs("Berlin") == ("Berlin", null))
    assert((one(locationCity(lit(null).cast("string"))),
      one(locationState(lit(null).cast("string")))) == (null, null))
  }

  test("E13: bid stats null unless len >= 2; exact median") {
    val df = Seq(
      (1, Seq(1000L, 2500L, 2000L)),
      (2, Seq(100L)),
      (3, Seq.empty[Long]),
      (4, Seq(10L, 20L))
    ).toDF("id", "bids").select($"id", bidStats($"bids").as("s")).orderBy($"id")
    val r = df.select($"id", $"s.max_bid", $"s.min_bid", $"s.mean_bid", $"s.median_bid", $"s.bid_range").collect()
    assert(r(0) == Row(1, 2500L, 1000L, (1000d + 2500d + 2000d) / 3, 2000d, 1500L))
    assert(r(1) == Row(2, null, null, null, null, null))
    assert(r(2) == Row(3, null, null, null, null, null))
    assert(r(3) == Row(4, 20L, 10L, 15.0, 15.0, 10L))
  }

  test("E14: guarded list count (null-safe, not -1)") {
    val df = Seq((1, Seq("a", "b")), (2, Seq.empty[String]), (3, null.asInstanceOf[Seq[String]]))
      .toDF("id", "xs").select($"id", listCount($"xs").as("n")).orderBy($"id").collect()
    assert(df(0).getInt(1) == 2); assert(df(1).getInt(1) == 0); assert(df(2).isNullAt(1))
  }

  test("E15: transmission classify + gears; null/empty → (null, null)") {
    def t(s: String) = (one(transmissionType(lit(s))), one(gears(lit(s))))
    assert(t("6-Speed Manual") == ("Manual", 6))
    assert(t("Automatic (8-Speed)") == ("Automatic", 8))
    assert(t("Semi-automatic") == ("Automatic", null))
    assert(t("CVT") == ("Other", null))
    assert(t("") == (null, null))
    assert(one(transmissionType(lit(null).cast("string"))) == null)
  }

  test("E16: drivetrain chain order replicated") {
    def d(s: String) = one(drivetrainClass(lit(s)))
    assert(d("switchable 4wd/awd system") == "4WD/AWD")
    assert(d("Front-wheel drive") == "FWD")
    assert(d("Rear-wheel drive") == "RWD")
    assert(d("All-wheel drive") == "AWD")
    assert(d("Four-wheel drive") == "4WD")
    assert(d("hovercraft") == "Other")
    assert(d("") == "Other")
    assert(one(drivetrainClass(lit(null).cast("string"))) == "Other")
  }

  test("E17: manufacture year from last URL segment") {
    assert(one(manufactureYear(lit("https://x/auctions/ID/2015-ford-f150"))) == 2015)
    assert(one(manufactureYear(lit("https://x/auctions/ID/ford"))) == null)
  }

  test("E19: key normalization modes") {
    assert(one(normKey(lit("  MiXeD "), "lower")) == "mixed")
    assert(one(normKey(lit("  MiXeD "), "upper")) == "MIXED")
    assert(one(normKey(lit("  MiXeD "), "none")) == "MiXeD")
  }
}
