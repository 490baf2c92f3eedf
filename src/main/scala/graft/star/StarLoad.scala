package graft.star

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import graft.etl.Silver
import graft.schema.Schemas

/** The warehouse load, end-to-end (reference `load_lambda/main.py:83-113` +
  * `update_dims.sql`): staging truncate-insert (U3), then the 11-statement
  * star population in dependency order (SURVEY.md §3.3) — independent simple
  * dims → city (needs state) → make → model (needs make) → vehicle (needs 4
  * dims, upsert U2) → fact (needs everything, insert-only U1).
  *
  * The reference's single Postgres transaction becomes write ordering over
  * idempotent steps (U1 anti-join / U2 keyed upsert make re-runs safe —
  * SURVEY.md §4).
  */
object StarLoad {

  /** U3 + P5 + A4 (L:84-107): project the warehouse columns, keep-newest per
    * auction_id, truncate-load `staging`. */
  def loadStaging(wh: Warehouse, processed: DataFrame): DataFrame = {
    val projected = processed.select(Schemas.insertColumns.map(col): _*)
    val deduped = Silver.keepNewest(projected)
    wh.truncateInsert("staging", deduped)
    wh.read("staging")
  }

  /** Full star load from a processed/silver frame. `staging` is cached for
    * the duration — all 11 load steps scan it, and at warehouse scale
    * re-reading the staging table per step is the dominant repeated cost. */
  def run(wh: Warehouse, processed: DataFrame): Unit = {
    StateSeed.ensureSeeded(wh)
    val staging = loadStaging(wh, processed)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      Dims.loadAllSimple(wh, staging)
      Dims.loadCityDim(wh, staging)
      Dims.loadMakeDim(wh, staging)
      Dims.loadModelDim(wh, staging)
      Facts.upsertVehicleDim(wh, staging)
      Facts.insertAuctionFact(wh, staging)
    } finally {
      staging.unpersist()
      ()
    }
  }
}
