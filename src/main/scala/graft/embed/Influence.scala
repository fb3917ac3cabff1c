package graft.embed

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.DetRandom
import graft.graph.Edges

/** Influence maximization — the Spark re-expression of
  * /root/reference/graphem/influence.py.
  *
  * Seed selection: top-k vertices by embedding radius
  * (influence.py:10-37) — a TakeOrderedAndProject, no global sort.
  *
  * Influence estimation: Independent Cascades (influence.py:40-82,
  * ndlib semantics per the reference CHANGELOG): every active node gets
  * one chance to activate each inactive neighbor with probability p;
  * influence = count of ever-activated nodes (states 1+2). The
  * activation coin is a pure hash of (src, dst, trial) — deterministic
  * across retries and parallelism, trial-varying like ndlib's per-run
  * RNG.
  */
object Influence {

  /** Top-k ids by radius, ties broken by id (influence.py:32-37). */
  def seedSelection(positions: DataFrame, k: Int): DataFrame =
    ForceLayout.radii(positions)
      .orderBy(desc("radius"), col("id")).limit(k)

  /** One IC simulation; returns the number of ever-active vertices. */
  def icInfluence(spark: SparkSession, edges: DataFrame, seeds: Seq[Long],
                  p: Double, maxIter: Int = 200, trial: Long = 0): Long = {
    import spark.implicits._
    val nbrs = Edges.neighbors(edges)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var active = graft.core.Lineage.truncate(seeds.toDF("id")) // ever-active
    var frontier = active                                  // newly active
    var rounds = 0
    var total = active.count()
    while (rounds < maxIter && frontier.limit(1).count() > 0) {
      val attempts = nbrs.join(frontier, Seq("id"))
        .select(col("id").as("src"), col("nbr").as("dst"))
        .where(DetRandom.uniform(7777L + trial, col("src"), col("dst")) < p)
        .select(col("dst").as("id")).distinct()
      val newly = graft.core.Lineage.truncate(
        attempts.join(active, Seq("id"), "left_anti"))
      val nNew = newly.count()
      if (nNew == 0) {
        if (frontier ne active) graft.core.Lineage.release(frontier)
        frontier = newly
      } else {
        // the new active set is materialized (eager truncate): the old
        // active and frontier caches are dead
        val prevActive = active
        active = graft.core.Lineage.truncate(active.union(newly))
        if (frontier ne prevActive) graft.core.Lineage.release(frontier)
        graft.core.Lineage.release(prevActive)
        frontier = newly
        total += nNew
      }
      rounds += 1
    }
    graft.core.Lineage.release(frontier)
    if (frontier ne active) graft.core.Lineage.release(active)
    nbrs.unpersist(false)
    total
  }

  /** Greedy influence maximization baseline (influence.py:85-126) —
    * test scale only: k passes over a candidate pool, each scoring
    * marginal gain with `trials` IC runs.
    */
  def greedySeeds(spark: SparkSession, edges: DataFrame, k: Int, p: Double,
                  candidates: Seq[Long], trials: Int = 3): Seq[Long] = {
    val chosen = scala.collection.mutable.ArrayBuffer[Long]()
    for (_ <- 0 until k) {
      val best = candidates.filterNot(chosen.contains).maxBy { c =>
        (0 until trials).map(t =>
          icInfluence(spark, edges, (chosen :+ c).toSeq, p, trial = t)).sum
      }
      chosen += best
    }
    chosen.toSeq
  }
}
