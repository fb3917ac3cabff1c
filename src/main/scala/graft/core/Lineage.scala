package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.graftbridge.Bridge

/** Lineage discipline for iterative algorithms.
  *
  * Iterative DataFrame loops have TWO driver-side blowups:
  *  1. logical-plan growth — state is referenced >= twice per superstep,
  *     so without truncation the plan doubles per iteration;
  *  2. statistics growth — localCheckpoint inherits the origin plan's
  *     sizeInBytes estimate, and join estimates multiply, so the BigInt
  *     estimate squares per iteration and Catalyst's stats visitor
  *     drowns in huge-BigInt arithmetic.
  *
  * truncate() fixes both: eager local checkpoint + fresh default stats.
  * Parquet checkpoints (CheckpointManager) also fix both and add
  * durability; use them at the cadence resumability needs, truncate()
  * in between.
  */
object Lineage {
  def truncate(df: DataFrame): DataFrame = Bridge.localCheckpointFresh(df)

  /** truncate() for frames that were EXPLICITLY pre-partitioned
    * (repartition(p, key)) so that downstream joins/aggregations can
    * reuse the layout: under AQE the checkpoint captures the
    * AdaptiveSparkPlanExec BEFORE finalization, whose outputPartitioning
    * is UnknownPartitioning — every later join then re-shuffles the
    * checkpointed table (measured: the pre-shuffled 2E-row adjacency
    * was re-exchanged EVERY PageRank iteration). Planning the
    * checkpoint statement with AQE off records the real
    * HashPartitioning; AQE is restored immediately after.
    */
  def truncatePartitioned(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val was = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try Bridge.localCheckpointFresh(df)
    finally spark.conf.set("spark.sql.adaptive.enabled", was)
  }

  /** Lazy variant: lineage is cut but materialization happens on the
    * caller's first action — use when that action is an aggregate you
    * need anyway (e.g. a convergence delta), folding two jobs into one.
    */
  def truncateLazy(df: DataFrame): DataFrame =
    Bridge.localCheckpointFresh(df, eager = false)

  /** Free the cached blocks behind a truncated frame once a successor
    * state is materialized — long loops otherwise accumulate one cached
    * RDD per superstep.
    */
  def release(df: DataFrame): Unit = Bridge.releaseCheckpoint(df)
}
