package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.graph.Edges

/** Synchronous label propagation (north_rule addition; not in the
  * reference). Every vertex starts labeled with its own id; each
  * superstep it adopts the most frequent label among its neighbors'
  * previous labels, ties broken by minimum label — fully deterministic,
  * unlike the textbook randomized-order LPA.
  *
  * Superstep = gather join (neighbor labels) + two-level hash
  * aggregation: count per (vertex, label), then argmax per vertex as
  * max(struct(cnt, -label)) — a hash aggregate with map-side partial
  * aggregation, replacing the earlier row_number window whose
  * per-vertex sort shuffled and ordered every (vertex, label) row.
  * Ties still break to the minimum label (the negated field), so
  * results are unchanged.
  */
object LabelPropagation {

  def run(spark: SparkSession, edges: DataFrame, iterations: Int): DataFrame = {
    val nbrs = Edges.neighbors(edges).persist(StorageLevel.MEMORY_AND_DISK)
    // eager truncate materializes in ONE job per superstep (no separate
    // persist+count pass) and keeps the plan/stats flat across iterations
    var labels = graft.core.Lineage.truncate(
      Edges.vertices(edges).select(col("id"), col("id").as("label")))
    for (i <- 1 to iterations) {
      val counts = nbrs.join(labels, nbrs("nbr") === labels("id"))
        .groupBy(nbrs("id").as("vid"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      val next = graft.core.Lineage.truncate(
        counts.groupBy(col("vid").as("id"))
          .agg(max(struct(col("cnt"), (-col("label")).as("neglabel"))).as("m"))
          .select(col("id"), (-col("m.neglabel")).as("label")))
      graft.core.Lineage.release(labels)
      labels = next
    }
    nbrs.unpersist(false)
    labels
  }
}
