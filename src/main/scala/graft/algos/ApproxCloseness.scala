package graft.algos

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.graph.Edges

/** Sampled-source closeness centrality — the SCALE path for the
  * path-centrality family. The reference computes closeness exactly
  * through networkx and its own bench only does so below n = 5000
  * (/root/reference/run_benchmarks.py:312-314); this operator covers
  * the regime above the cutoff with the Eppstein–Wang estimator
  * ("Fast approximation of centrality", SODA'01): run BFS from k
  * uniformly sampled sources and estimate
  *
  *   closeness(v) ~ k * (n - 1) / (n * sum_{s in S} d(s, v))
  *
  * With k = n (all sources) the estimator IS the exact closeness of a
  * connected graph, which the parity test exploits against the
  * nx-exact PathCentralities oracle.
  *
  * Shape: one simultaneous k-source frontier BFS — state is (source,
  * vertex, dist) rows, each level one join of the frontier against the
  * neighbor table, an anti-join against visited, and a min-aggregate;
  * lineage is truncated per level (iterative-loop discipline). Work is
  * O(k * E) total like k independent BFS, but batched through ONE
  * Catalyst plan per level regardless of k; state is at most k * V
  * rows. Sources are a deterministic hash sample (xxhash64), so runs
  * are reproducible across partitionings and cluster sizes.
  *
  * Disconnected graphs: a vertex's sum runs over the sampled sources
  * that REACH it (the estimator is then per-component, consistent with
  * closeness being component-local); vertices reached by no sampled
  * source (or with a zero distance sum) report 0.0 like an isolated
  * vertex.
  */
object ApproxCloseness {

  /** `explicitSources`: caller-chosen source vertex set (one `s`
    * column) overriding the hash sample — used by the SQL-mirrored
    * driver query, whose oracle cannot reproduce xxhash64.
    */
  def run(spark: SparkSession, edges: DataFrame, k: Int,
          seed: Long = 42, maxLevels: Int = 128,
          explicitSources: Option[DataFrame] = None): DataFrame = {
    val nbrs = Edges.neighbors(edges).persist(StorageLevel.MEMORY_AND_DISK)
    val verts = Edges.vertices(edges).persist(StorageLevel.MEMORY_AND_DISK)
    val n = verts.count()

    // deterministic uniform sample: the k smallest xxhash64(id, seed)
    val sources = graft.core.Lineage.truncate(explicitSources.getOrElse(
      verts.orderBy(xxhash64(col("id"), lit(seed)), col("id"))
        .limit(math.min(k.toLong, n).toInt).select(col("id").as("s"))))
    val kEff = sources.count()

    var dist = graft.core.Lineage.truncate(
      sources.select(col("s"), col("s").as("id"), lit(0L).as("dist")))
    var frontier = dist
    var level = 0
    var done = false
    while (!done && level < maxLevels) {
      // expand the frontier one hop; keep only first discoveries
      val next = frontier.join(nbrs, "id")
        .select(col("s"), col("nbr").as("id"), (col("dist") + 1L).as("dist"))
        .join(dist.select(col("s"), col("id")), Seq("s", "id"), "left_anti")
        .groupBy(col("s"), col("id")).agg(min(col("dist")).as("dist"))
      val nf = graft.core.Lineage.truncate(next)
      if (nf.count() == 0) {
        graft.core.Lineage.release(nf)
        done = true
      } else {
        val nd = graft.core.Lineage.truncate(dist.union(nf))
        if (level > 0) graft.core.Lineage.release(frontier)
        graft.core.Lineage.release(dist)
        dist = nd
        frontier = nf
        level += 1
      }
    }

    val est = dist.groupBy("id")
      .agg(sum(col("dist")).as("sd"))
      .select(col("id"),
        when(col("sd") > 0,
          lit(kEff.toDouble * (n - 1).toDouble) / (lit(n.toDouble) * col("sd")))
          .otherwise(lit(0.0)).as("closeness"))
    val out = graft.core.Lineage.truncate(
      verts.join(est, Seq("id"), "left")
        .select(col("id"), coalesce(col("closeness"), lit(0.0)).as("closeness")))
    graft.core.Lineage.release(dist)
    if (level > 0) graft.core.Lineage.release(frontier)
    graft.core.Lineage.release(sources)
    nbrs.unpersist(false)
    verts.unpersist(false)
    out
  }
}
