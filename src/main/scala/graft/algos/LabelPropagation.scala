package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.graph.Edges

/** Synchronous label propagation (north_rule addition; not in the
  * reference). Every vertex starts labeled with its own id; each
  * superstep it adopts the most frequent label among its neighbors'
  * previous labels, ties broken by minimum label — fully deterministic,
  * unlike the textbook randomized-order LPA.
  *
  * Superstep = gather join (neighbor labels) + two-level aggregation
  * (count per (vertex,label), then windowed argmax per vertex). The
  * window partitions by vertex id, so no global sort; hub vertices have
  * at most `distinct neighbor labels` rows in their window partition.
  */
object LabelPropagation {

  def run(spark: SparkSession, edges: DataFrame, iterations: Int): DataFrame = {
    val nbrs = Edges.neighbors(edges).persist(StorageLevel.MEMORY_AND_DISK)
    // eager truncate materializes in ONE job per superstep (no separate
    // persist+count pass) and keeps the plan/stats flat across iterations
    var labels = graft.core.Lineage.truncate(
      Edges.vertices(edges).select(col("id"), col("id").as("label")))
    val w = Window.partitionBy("vid").orderBy(col("cnt").desc, col("label").asc)
    for (i <- 1 to iterations) {
      val counts = nbrs.join(labels, nbrs("nbr") === labels("id"))
        .groupBy(nbrs("id").as("vid"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      val next = graft.core.Lineage.truncate(
        counts.withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("vid").as("id"), col("label")))
      graft.core.Lineage.release(labels)
      labels = next
    }
    nbrs.unpersist(false)
    labels
  }
}
