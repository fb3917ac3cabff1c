package graft

import org.apache.spark.sql.SparkSession

/** Two-parallelism-level scaling evidence (north_rule: throughput
  * scaling efficiency >= 0.8 from N to 4N executors; no real cluster in
  * the sandbox, so the protocol from BASELINE.md applies: the same job
  * at local[8] vs local[32] on the same input, efficiency =
  * tput(32) / (4 * tput(8))).
  *
  * Run: sbt "runMain graft.ScalingBench [sfDir]"
  */
object ScalingBench {

  /** Fixed-superstep PageRank on a deterministic ~20M-edge ER graph —
    * large enough to be compute-bound on 32 cores, identical input at
    * both parallelism levels (hash-derived, partition-independent).
    */
  private def runAt(cores: Int, nVerts: Long, p: Double,
                    supersteps: Int): (Long, Double, Double) = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.generators.Generators.erSparse(spark, nVerts, p, 42)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m = e.count()
    def onePass(): Double = {
      val t0 = System.nanoTime()
      val r = graft.algos.PageRank.runUndirected(spark, e,
        graft.algos.PageRank.Config(tol = 0.0, maxIter = supersteps))
      r.ranks.agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1))).head()
      (System.nanoTime() - t0) / 1e9
    }
    onePass() // warm-up (JIT + codegen caches)
    val secs = onePass()
    spark.stop()
    (m, secs, m.toDouble * supersteps / secs)
  }

  /** No args: both levels in one JVM (quick look — NOTE the low-core
    * level then still enjoys the full machine for GC/codegen/shuffle
    * threads, understating true scaling). With args "nVerts cores":
    * one level only, meant to be run under `taskset -c` so the JVM
    * really owns only that many CPUs — the honest N-core-host protocol
    * used for BASELINE.md.
    */
  def main(args: Array[String]): Unit = {
    val nVerts = args.headOption.map(_.toLong).getOrElse(2000000L)
    val p = 1e-5
    val supersteps = 8
    if (args.length >= 2) {
      val cores = args(1).toInt
      val (m, s, eps) = runAt(cores, nVerts, p, supersteps)
      println(s"""{"metric":"pagerank_fixed8","cores":$cores,""" +
        s""""n_vertices":$nVerts,"edges":$m,"secs":$s,"eps":$eps}""")
    } else {
      val (m8, s8, eps8) = runAt(8, nVerts, p, supersteps)
      val (m32, s32, eps32) = runAt(32, nVerts, p, supersteps)
      val eff = eps32 / (4.0 * eps8)
      println(s"""{"metric":"scaling_efficiency","value":$eff,""" +
        s""""supersteps":$supersteps,"n_vertices":$nVerts,""" +
        s""""local8":{"edges":$m8,"secs":$s8,"eps":$eps8},""" +
        s""""local32":{"edges":$m32,"secs":$s32,"eps":$eps32}}""")
    }
  }
}
