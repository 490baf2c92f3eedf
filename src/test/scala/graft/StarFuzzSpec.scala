package graft

import java.nio.file.Files

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.etl.{Flatten, Silver}
import graft.expr.CleanExprs.normKey
import graft.schema.Schemas
import graft.star.{StarLoad, StateSeed, Warehouse}

/** Generative fuzz of the silver→GOLD star load — the q198 chain under the
  * same adversarial inputs FuzzSpec throws at bronze→silver. [[FuzzGen]]
  * produces raw corpora (missing keys, unicode, null patterns, whole-cell
  * quirks, 0–3-comma locations); the REAL engine chain turns them into
  * silver; then [[graft.star.StarLoad]] populates a real warehouse and
  * three structural laws are checked with the expected side computed
  * DRIVER-SIDE — plain Scala map lookups over collected dim tables, never
  * Spark joins — so the load machinery (fused dim passes, null-safe
  * anti-joins, surrogate-id assignment, the bucketed vehicle upsert, the
  * 6-way fact resolution) is verified by an independent re-computation:
  *
  *  1. DIM LAW — each dim's contents are exactly the distinct non-null
  *     normalized staging keys, with ids dense 1..n in key order (the
  *     row_number contract), compound dims under the disjunctive state /
  *     make lookup semantics of the load;
  *  2. JOIN-BACK LAW — every fact row's surrogate keys resolve through
  *     the dims to exactly its staging row's normalized values, including
  *     the deliberate asymmetries (fact's state lookup is abbr-only while
  *     city_dim was loaded disjunctively; a null vin / null make breaks
  *     the vehicle / model match by the `===` null semantics);
  *  3. INCREMENTAL LAW — a second generated batch only APPENDS: every
  *     dim row and fact row of batch 1 survives byte-identically, batch-1
  *     vehicle keys keep their vehicle_id (ON CONFLICT DO UPDATE keeps
  *     the PK), and replayed/overlapping keys take the incoming batch's
  *     attributes.
  *
  * Normalized expected VALUES are computed by Spark expressions over the
  * staging frame (normKey/trim — those are q184/q198-oracle-pinned; Java's
  * trim/lower disagree with Spark's on \n and locale edges, so re-deriving
  * them in Scala would fuzz the wrong thing); everything structural —
  * membership, id order, key resolution — is re-derived in plain Scala.
  */
class StarFuzzSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def genSilver(base: Long, nFiles: Int): DataFrame = {
    val dir = Files.createTempDirectory(s"graft_starfuzz_$base")
    (0 until nFiles).foreach { i =>
      val f = FuzzGen.genFile(base + i).pureApply(Gen.Parameters.default, Seed(base + i))
      FuzzGen.writeFile(dir.resolve(f"raw_$i%04d.json"), FuzzGen.renderFile(f))
    }
    Silver.run(Flatten.bronze(spark, dir.toString + "/*.json"))
  }

  /** The staging frame the load actually consumes, with every normalized
    * key the laws need precomputed by the pinned Spark expressions. */
  private def stagedNorm(silver: DataFrame): Seq[Row] =
    Silver.keepNewest(silver.select(Schemas.insertColumns.map(col).toIndexedSeq: _*))
      .select(
        col("auction_id"), col("auction_url"),
        normKey(col("auction_status")).as("n_status"),
        normKey(col("reserve_status")).as("n_reserve"),
        normKey(col("seller_type")).as("n_seller"),
        normKey(col("body_style")).as("n_body"),
        normKey(col("transmission_type")).as("n_trans"),
        normKey(col("drivetrain"), "upper").as("n_drive"),
        trim(col("make")).as("n_make"), trim(col("model")).as("n_model"),
        trim(col("vin")).as("n_vin"), trim(col("city")).as("n_city"),
        trim(upper(col("title_state"))).as("n_state_abbr"),
        col("title_state"), col("engine"),
        col("exterior_color"), col("interior_color"),
        col("title_status_cleaned"), col("manufacture_year"), col("mileage"),
        col("gears"), col("equipment_count"), col("mod_count"),
        col("flaw_count"), col("service_count"), col("included_items_count"),
        col("view_count"), col("watcher_count"), col("bid_count"),
        col("max_bid"), col("min_bid"), col("mean_bid"), col("median_bid"),
        col("bid_range"), col("bids"), col("highlight_count"),
        col("video_count"), col("auction_title"), col("auction_subtitle"),
        col("auction_date"))
      .collect().toIndexedSeq

  private def s(r: Row, n: String): Option[String] = Option(r.getAs[String](n))
  private def l(r: Row, n: String): Option[Long] =
    if (r.isNullAt(r.fieldIndex(n))) None else Some(r.getAs[Number](n).longValue)
  private def d(r: Row, n: String): Option[Double] =
    if (r.isNullAt(r.fieldIndex(n))) None else Some(r.getAs[Double](n))

  private def dimMap(wh: Warehouse, table: String, key: String): Map[Long, String] =
    wh.read(table).collect().map(r =>
      r.getAs[Long]("id") -> r.getAs[String](key)).toMap

  // (k1 asc nulls last, k2 asc nulls last) — the fused loads' window order
  private def keyOrder(a: (String, Option[Long]), b: (String, Option[Long])): Boolean =
    if (a._1 != b._1) a._1 < b._1
    else (a._2, b._2) match {
      case (Some(x), Some(y)) => x < y
      case (Some(_), None)    => true
      case (None, Some(_))    => false
      case _                  => false
    }

  test("star load over generated corpora: dim law, join-back law, " +
       "incremental append-only law (the q198 chain fuzzed)") {
    val wh = new Warehouse(spark,
      Files.createTempDirectory("graft_starfuzz_wh").toString)
    val silver1 = genSilver(91000L, 80).localCheckpoint(true)
    StarLoad.run(wh, silver1)
    val st1 = stagedNorm(silver1)
    assert(st1.size >= 30, s"only ${st1.size} staged rows — widen the gen")

    // ── shared driver-side lookup structures ─────────────────────────────
    val stateRows = wh.read("state_dim").collect()
    val stateByAbbr = stateRows.map(r =>
      r.getAs[String]("state_abbr") -> r.getAs[Long]("id")).toMap
    val stateByName = stateRows.map(r =>
      r.getAs[String]("state") -> r.getAs[Long]("id")).toMap
    assert(stateByAbbr.size == StateSeed.states.size, "state seed incomplete")
    // the city load's J1 disjunctive lookup, re-derived in Scala: abbr
    // match preferred, RAW (case-sensitive) title_state on both arms
    def disjStateId(ts: Option[String]): Option[Long] =
      ts.flatMap(t => stateByAbbr.get(t).orElse(stateByName.get(t)))

    def makeMap() = dimMap(wh, "vehicle_make_dim", "make")
    val make1 = makeMap()
    val makeIdByKey1 = make1.map(_.swap)

    // ── LAW 1: simple dims — membership + dense id-in-key-order ─────────
    val simpleExpected: Seq[(String, String)] = Seq(
      ("auction_status_dim", "n_status"), ("reserve_status_dim", "n_reserve"),
      ("body_style_dim", "n_body"), ("seller_type_dim", "n_seller"),
      ("drivetrain_dim", "n_drive"), ("transmission_dim", "n_trans"),
      ("vehicle_make_dim", "n_make"))
    val simpleKeyCol = Map(
      "auction_status_dim" -> "status", "reserve_status_dim" -> "status",
      "body_style_dim" -> "body_style", "seller_type_dim" -> "seller_type",
      "drivetrain_dim" -> "drivetrain", "transmission_dim" -> "transmission",
      "vehicle_make_dim" -> "make")
    simpleExpected.foreach { case (table, nCol) =>
      val expected = st1.flatMap(r => s(r, nCol)).distinct.sorted
      assert(expected.nonEmpty, s"$table: no expected keys — gen too narrow")
      val got = wh.read(table).collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[String](simpleKeyCol(table))))
        .sortBy(_._1)
      assert(got.map(_._2).toSeq == expected,
        s"$table membership/id-order diverged from the driver-side model")
      assert(got.map(_._1).toSeq == (1L to expected.size).toSeq,
        s"$table ids not dense 1..n")
    }

    // ── LAW 1 compound: city_dim and vehicle_model_dim ───────────────────
    // the disjunctive lookup's BY-NAME arm must actually fire (full state
    // names in title_state), or the abbr-vs-disjunctive asymmetry checks
    // below are vacuous
    assert(st1.exists(r => s(r, "title_state").exists(t =>
        stateByAbbr.get(t).isEmpty && stateByName.get(t).isDefined)),
      "no full-state-name title_state generated — by-name arm unexercised")
    val cityExpected = st1.flatMap(r =>
        s(r, "n_city").map(c => (c, disjStateId(s(r, "title_state")))))
      .distinct.sortWith(keyOrder)
    val cityGot = wh.read("city_dim").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("city_name"),
        if (r.isNullAt(r.fieldIndex("state_id"))) None
        else Some(r.getAs[Long]("state_id"))))
      .sortBy(_._1)
    assert(cityGot.map(t => (t._2, t._3)).toSeq == cityExpected,
      "city_dim diverged from the Scala disjunctive-lookup model")
    assert(cityGot.map(_._1).toSeq == (1L to cityExpected.size).toSeq)

    val modelExpected = st1.flatMap(r =>
        s(r, "n_model").map(m => (m, s(r, "n_make").flatMap(makeIdByKey1.get))))
      .distinct.sortWith(keyOrder)
    val modelGot = wh.read("vehicle_model_dim").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("model"),
        if (r.isNullAt(r.fieldIndex("make_id"))) None
        else Some(r.getAs[Long]("make_id"))))
      .sortBy(_._1)
    assert(modelGot.map(t => (t._2, t._3)).toSeq == modelExpected,
      "vehicle_model_dim diverged from the Scala make-lookup model")

    // ── LAW 2: fact join-back through driver-side dim lookups ────────────
    val statusById = dimMap(wh, "auction_status_dim", "status")
    val reserveById = dimMap(wh, "reserve_status_dim", "status")
    val sellerById = dimMap(wh, "seller_type_dim", "seller_type")
    val bodyIds = dimMap(wh, "body_style_dim", "body_style").map(_.swap)
    val transIds = dimMap(wh, "transmission_dim", "transmission").map(_.swap)
    val driveIds = dimMap(wh, "drivetrain_dim", "drivetrain").map(_.swap)
    val cityIds = cityGot.map(t => (t._2, t._3) -> t._1).toMap
    val modelIds = modelGot.map(t => (t._2, t._3) -> t._1).toMap
    val vehRows = wh.read("vehicle_dim").collect()
    val vehById = vehRows.map(r => r.getAs[Long]("vehicle_id") -> r).toMap
    val facts = wh.read("auction_fact").collect()
      .map(r => r.getAs[String]("auction_id") -> r).toMap
    val withId = st1.filter(r => s(r, "auction_id").isDefined)
    assert(facts.size == withId.size,
      s"fact rows ${facts.size} != staged non-null-id rows ${withId.size}")

    withId.foreach { r =>
      val aid = s(r, "auction_id").get
      val f = facts.getOrElse(aid, fail(s"fact missing auction_id=$aid"))
      def fid(n: String): Option[Long] = l(f, n)
      // surrogate resolutions: dim id ⟺ normalized staging value
      assert(fid("auction_status").map(statusById) == s(r, "n_status"),
        s"$aid auction_status")
      assert(fid("reserve_status").map(reserveById) == s(r, "n_reserve"),
        s"$aid reserve_status")
      assert(fid("seller_type").map(sellerById) == s(r, "n_seller"),
        s"$aid seller_type")
      // fact state: ABBR-ONLY lookup (deliberately narrower than city's)
      val expState = s(r, "n_state_abbr").flatMap(stateByAbbr.get)
      assert(fid("auction_state") == expState, s"$aid auction_state")
      // fact city: plain === on (trim(city), auction_state) — a null state
      // can never match, even though city_dim holds (city, null) rows
      val expCity = for {
        c <- s(r, "n_city"); sid <- expState
        id <- cityIds.get((c, Some(sid)))
      } yield id
      assert(fid("auction_city") == expCity, s"$aid auction_city")
      // vehicle: key (trim(vin), auction_id), null vin never matches
      val vId = fid("vehicle_id")
      assert(vId.isDefined == s(r, "n_vin").isDefined, s"$aid vehicle_id presence")
      vId.foreach { id =>
        val v = vehById(id)
        assert(Option(v.getAs[String]("vin")) == s(r, "n_vin"), s"$aid vin")
        assert(v.getAs[String]("auction_id") == aid, s"$aid vehicle auction_id")
        assert(Option(v.getAs[String]("engine")) == s(r, "engine"), s"$aid engine")
        assert(Option(v.getAs[String]("exterior_color")) == s(r, "exterior_color"))
        assert(Option(v.getAs[String]("interior_color")) == s(r, "interior_color"))
        assert(Option(v.getAs[String]("title_status")) == s(r, "title_status_cleaned"))
        assert(Option(v.getAs[String]("title_state")) == s(r, "title_state"))
        assert(l(v, "manufacture_year") == l(r, "manufacture_year"), s"$aid year")
        assert(l(v, "mileage") == l(r, "mileage"), s"$aid mileage")
        assert(l(v, "gear_count") == l(r, "gears"), s"$aid gears")
        assert(l(v, "equipment_count") == l(r, "equipment_count"))
        assert(l(v, "flaw_count") == l(r, "flaw_count"))
        assert(l(v, "make_id") == s(r, "n_make").flatMap(makeIdByKey1.get), s"$aid make_id")
        val expModel = for {
          m <- s(r, "n_model"); mk <- s(r, "n_make").flatMap(makeIdByKey1.get)
          id2 <- modelIds.get((m, Some(mk)))
        } yield id2
        assert(l(v, "model_id") == expModel, s"$aid model_id")
        assert(l(v, "body_style_id") == s(r, "n_body").flatMap(bodyIds.get))
        assert(l(v, "transmission_id") == s(r, "n_trans").flatMap(transIds.get))
        assert(l(v, "drivetrain_id") == s(r, "n_drive").flatMap(driveIds.get))
      }
      // measures carried verbatim
      Seq("view_count", "watcher_count", "bid_count", "max_bid", "min_bid",
        "bid_range", "highlight_count", "video_count").foreach(c =>
        assert(l(f, c) == l(r, c), s"$aid $c"))
      Seq("mean_bid", "median_bid").foreach(c =>
        assert(d(f, c) == d(r, c), s"$aid $c"))
      assert(f.getAs[scala.collection.Seq[Long]]("bids") ==
        r.getAs[scala.collection.Seq[Long]]("bids"), s"$aid bids")
      assert(Option(f.getAs[String]("auction_title")) == s(r, "auction_title"))
      assert(Option(f.getAs[String]("auction_url")) == s(r, "auction_url"))
      assert(f.getAs[java.sql.Timestamp]("auction_time") ==
        r.getAs[java.sql.Timestamp]("auction_date"), s"$aid auction_time")
    }

    // ── LAW 3: a second batch (20 files REPLAYED from batch 1 for forced
    // key overlap + 60 fresh) only appends ────────────────────────────────
    val dimSnap = (simpleExpected.map(_._1) ++ Seq("city_dim", "vehicle_model_dim"))
      .map(t => t -> wh.read(t).collect().map(_.toString).toSet).toMap
    val vehSnap = vehRows.map(r =>
      (Option(r.getAs[String]("vin")), r.getAs[String]("auction_id")) ->
        r.getAs[Long]("vehicle_id")).toMap
    val factSnap = facts.map { case (k, r) => k -> r.toString }
    val maxVeh1 = vehSnap.values.max

    val dir2 = Files.createTempDirectory("graft_starfuzz_b2")
    (0 until 60).foreach { i =>
      val f = FuzzGen.genFile(92000L + i).pureApply(Gen.Parameters.default, Seed(92000L + i))
      FuzzGen.writeFile(dir2.resolve(f"raw_$i%04d.json"), FuzzGen.renderFile(f))
    }
    (0 until 20).foreach { i => // true replays: same (tag, seed) pairs as batch 1's first 20 files,
      // so the records — urls included — are byte-identical
      val f = FuzzGen.genFile(91000L + i).pureApply(Gen.Parameters.default, Seed(91000L + i))
      FuzzGen.writeFile(dir2.resolve(f"rep_$i%04d.json"), FuzzGen.renderFile(f))
    }
    val silver2 = Silver.run(Flatten.bronze(spark, dir2.toString + "/*.json"))
      .localCheckpoint(true)
    StarLoad.run(wh, silver2)

    // dims: batch-1 rows survive byte-identically (ids stable, insert-only)
    dimSnap.foreach { case (t, snap) =>
      val after = wh.read(t).collect().map(_.toString).toSet
      assert(snap.subsetOf(after), s"$t lost or rewrote batch-1 rows")
    }
    // vehicle upsert: batch-1 keys keep their PK; fresh keys id above max
    val vehAfter = wh.read("vehicle_dim").collect()
    val vehAfterKeys = vehAfter.map(r =>
      (Option(r.getAs[String]("vin")), r.getAs[String]("auction_id")) ->
        r.getAs[Long]("vehicle_id")).toMap
    vehSnap.foreach { case (k, id) =>
      assert(vehAfterKeys.get(k).contains(id),
        s"vehicle key $k lost its vehicle_id $id (ON CONFLICT must keep the PK)")
    }
    assert((vehAfterKeys.keySet -- vehSnap.keySet).forall(k => vehAfterKeys(k) > maxVeh1),
      "a fresh vehicle key reused a batch-1 id")
    assert((vehAfterKeys.keySet -- vehSnap.keySet).nonEmpty,
      "no fresh vehicle keys — batch 2 too narrow")
    // incoming-wins: for keys staged in BOTH batches, attributes come from
    // batch 2 (ON CONFLICT DO UPDATE rewrites everything but the PK)
    val st2 = stagedNorm(silver2)
    val st2ByKey = st2.flatMap(r => s(r, "auction_id")
      .map(aid => (s(r, "n_vin"), aid) -> r)).toMap
    val vehAfterByKey = vehAfter.map(r =>
      (Option(r.getAs[String]("vin")), r.getAs[String]("auction_id")) -> r).toMap
    val overlap = vehSnap.keySet.intersect(st2ByKey.keySet)
    assert(overlap.nonEmpty, "no vehicle key staged in both batches")
    overlap.foreach { k =>
      val v = vehAfterByKey(k)
      val r2 = st2ByKey(k)
      assert(Option(v.getAs[String]("engine")) == s(r2, "engine"),
        s"vehicle $k engine not incoming-wins")
      assert(Option(v.getAs[String]("title_state")) == s(r2, "title_state"),
        s"vehicle $k title_state not incoming-wins")
      assert(l(v, "mileage") == l(r2, "mileage"),
        s"vehicle $k mileage not incoming-wins")
    }
    // fact: insert-only on auction_id — batch-1 rows byte-identical
    val factAfter = wh.read("auction_fact").collect()
      .map(r => r.getAs[String]("auction_id") -> r.toString).toMap
    factSnap.foreach { case (aid, row) =>
      assert(factAfter.get(aid).contains(row),
        s"fact row $aid changed across the incremental load")
    }
  }
}
