package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling for hub vertices (north_rule: "salted
  * repartitioning for hub vertices").
  *
  * Power-law web graphs concentrate messages on a handful of hub ids; a
  * single-phase groupBy would route every message for a hub into one
  * reducer partition. Spark's partial (map-side) aggregation already
  * collapses per-task duplicates, and AQE skew-join splitting handles the
  * join side; this helper adds the classic two-level salted aggregation
  * for cases where partial-agg hash maps would evict under high
  * distinct-key cardinality — partial sums land on (key, salt) across S
  * reducers, then a second tiny shuffle folds the S partials per key.
  */
object Skew {

  /** Two-phase salted sum: groupBy(key, salt) partial sums, then
    * groupBy(key) final. `saltSource` must be a column whose hash spreads
    * a hub key's rows (e.g. the message's source vertex).
    */
  def saltedSum(df: DataFrame, key: String, value: String,
                saltSource: Column, salts: Int): DataFrame = {
    df.groupBy(col(key), pmod(xxhash64(saltSource), lit(salts)).as("_salt"))
      .agg(sum(col(value)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as(value))
  }
}
