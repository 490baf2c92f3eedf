package graft.star

import org.apache.spark.sql.{DataFrame, SparkSession}

/** `state_dim` is pre-seeded in the reference warehouse and never loaded by
  * the pipeline (joined at Q:82-83, Q:216-217; see FIXTURES.md §3). Seed from
  * the public US state/abbreviation list.
  */
object StateSeed {

  val states: Seq[(String, String)] = Seq(
    "Alabama" -> "AL", "Alaska" -> "AK", "Arizona" -> "AZ", "Arkansas" -> "AR",
    "California" -> "CA", "Colorado" -> "CO", "Connecticut" -> "CT",
    "Delaware" -> "DE", "Florida" -> "FL", "Georgia" -> "GA", "Hawaii" -> "HI",
    "Idaho" -> "ID", "Illinois" -> "IL", "Indiana" -> "IN", "Iowa" -> "IA",
    "Kansas" -> "KS", "Kentucky" -> "KY", "Louisiana" -> "LA", "Maine" -> "ME",
    "Maryland" -> "MD", "Massachusetts" -> "MA", "Michigan" -> "MI",
    "Minnesota" -> "MN", "Mississippi" -> "MS", "Missouri" -> "MO",
    "Montana" -> "MT", "Nebraska" -> "NE", "Nevada" -> "NV",
    "New Hampshire" -> "NH", "New Jersey" -> "NJ", "New Mexico" -> "NM",
    "New York" -> "NY", "North Carolina" -> "NC", "North Dakota" -> "ND",
    "Ohio" -> "OH", "Oklahoma" -> "OK", "Oregon" -> "OR",
    "Pennsylvania" -> "PA", "Rhode Island" -> "RI", "South Carolina" -> "SC",
    "South Dakota" -> "SD", "Tennessee" -> "TN", "Texas" -> "TX",
    "Utah" -> "UT", "Vermont" -> "VT", "Virginia" -> "VA",
    "Washington" -> "WA", "West Virginia" -> "WV", "Wisconsin" -> "WI",
    "Wyoming" -> "WY", "District of Columbia" -> "DC")

  def seed(spark: SparkSession): DataFrame = {
    import spark.implicits._
    // coalesce(1): a 51-row local Seq otherwise parallelizes into
    // default-parallelism partitions and the seed write commits 32
    // near-empty files — measurable latency at the head of every load
    states.zipWithIndex
      .map { case ((state, abbr), i) => (i + 1L, state, abbr) }
      .toDF("id", "state", "state_abbr")
      .coalesce(1)
  }

  def ensureSeeded(wh: Warehouse): Unit =
    if (!wh.exists("state_dim")) wh.overwrite("state_dim", seed(wh.spark))
}
