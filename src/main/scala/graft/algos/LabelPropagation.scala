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
    val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // adjacency pre-shuffled ONCE on the per-iteration join key and
    // materialized: each superstep's join then only shuffles the V-row
    // label state (the old persist left nbrs scan-partitioned, so the
    // 2E-row side was re-shuffled every iteration)
    val nbrs = graft.core.Lineage.truncatePartitioned(
      Edges.neighbors(edges).repartition(p, col("nbr")))
    // initial labels from the materialized adjacency — same vertex set
    // as Edges.vertices on a canonical edge table, without a second
    // pass over the edge pipeline
    var labels = graft.core.Lineage.truncate(
      nbrs.select(col("id")).distinct()
        .select(col("id"), col("id").as("label")))
    // fixed-shape loop tuning: AQE off + data-sized shuffle width in
    // the small regime (graft.core.LoopConf; data-derived gate)
    val small = graft.core.LoopConf.smallRegime(spark, nbrs.count())
    graft.core.LoopConf.withLoop(spark, small) {
    for (i <- 1 to iterations) {
      // dataset aliases: the initial labels frame derives from nbrs, so
      // its checkpointed attributes share expression ids with nbrs —
      // unqualified column refs would be ambiguous on that first join
      val counts = nbrs.as("n").join(labels.as("l"),
          col("n.nbr") === col("l.id"))
        .groupBy(col("n.id").as("vid"), col("l.label").as("label"))
        .agg(count(lit(1)).as("cnt"))
      val next = graft.core.Lineage.truncate(
        counts.groupBy(col("vid").as("id"))
          .agg(max(struct(col("cnt"), (-col("label")).as("neglabel"))).as("m"))
          .select(col("id"), (-col("m.neglabel")).as("label")))
      graft.core.Lineage.release(labels)
      labels = next
    }
    }
    graft.core.Lineage.release(nbrs)
    labels
  }
}
