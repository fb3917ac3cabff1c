package graft.embed

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.Edges

/** Influence-method comparison harness — the Spark re-expression of the
  * reference's influence benchmark (/root/reference/run_benchmarks.py:
  * 379-460): on each generator graph, compare the influence (mean IC
  * count over `trials`) of
  *
  *   - graphem seeds: top-k embedding radii (the signature method),
  *   - greedy seeds: marginal-gain greedy over a degree-ranked
  *     candidate pool (the reference's budgeted greedy),
  *   - random baseline: MEAN influence over `randomSets` seeded random
  *     k-subsets (the reference averages random runs the same way).
  *
  * The reference's harness graphs are n=200; IC evaluation runs
  * driver-local (Influence.icInfluenceLocal — identical counts to the
  * distributed portable-coin loop) exactly like the reference's
  * host-local ndlib loop. The embedding itself runs through the real
  * distributed SpectralInit + ForceLayout path.
  */
object InfluenceBench {

  case class MethodResult(method: String, influence: Double, seeds: Seq[Long])

  case class Report(graph: String, n: Long, m: Long,
                    results: Seq[MethodResult])

  def run(spark: SparkSession, graphName: String, edges: DataFrame,
          k: Int = 10, p: Double = 0.1, trials: Int = 5,
          candidatePool: Int = 50, randomSets: Int = 20,
          layoutIters: Int = 20, seed: Long = 42,
          // the reference influence bench's embedder config
          // (run_benchmarks.py:414-425): d=3, L_min=10, n_neighbors=15
          layoutCfg: ForceLayout.Config = ForceLayout.Config(d = 3,
            lMin = 10.0, kAttr = 0.5, kInter = 0.1, nNeighbors = 15,
            sampleSize = 512)): Report = {
    val e = edges.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m = e.count()
    val nbrs = Influence.collectNeighbors(e)
    val n = nbrs.size.toLong
    val ids = nbrs.keys.toArray.sorted

    def influenceOf(seeds: Seq[Long]): Double =
      (0 until trials).map(t =>
        Influence.icInfluenceLocal(nbrs, seeds, p, trial = t)).sum.toDouble / trials

    // graphem: embed -> top-k radii (influence.py:10-37)
    val init = SpectralInit.run(spark, e, d = layoutCfg.d, gramTol = 1e-6)
    val pos = ForceLayout.run(spark, e, init, layoutIters, layoutCfg)
    val graphemSeeds = Influence.seedSelection(pos, k)
      .select("id").collect().map(_.getLong(0)).toSeq

    // greedy over the top-`candidatePool` degree candidates
    val candidates = Edges.degrees(e)
      .orderBy(desc("degree"), col("id")).limit(candidatePool)
      .select("id").collect().map(_.getLong(0)).toSeq
    val greedy = Influence.greedySeedsLocal(nbrs, k, p, candidates, trials)

    // random baseline: mean over `randomSets` deterministic k-subsets
    val rnd = new scala.util.Random(seed)
    val randomMean = (0 until randomSets).map { _ =>
      val s = rnd.shuffle(ids.toSeq).take(k)
      influenceOf(s)
    }.sum / randomSets

    e.unpersist(false)
    Report(graphName, n, m, Seq(
      MethodResult("graphem_radii", influenceOf(graphemSeeds), graphemSeeds),
      MethodResult("greedy", influenceOf(greedy), greedy),
      MethodResult("random_mean", randomMean, Seq())))
  }

  /** Reference-scale main: the 5 generator families at n=200, k=10,
    * p=0.1 (run_benchmarks.py:379-460), tables through ResultsSink.
    */
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("results")
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // the reference's 5 influence-bench graphs (run_benchmarks.py:379-384)
    val g = graft.generators.Generators
    val graphs = Seq(
      "erdos_renyi" -> g.er(spark, 200, 0.05, 42),
      "random_regular" -> g.randomRegular(spark, 200, 4, 42),
      "watts_strogatz" -> g.ws(spark, 200, 4, 0.1, 42),
      "barabasi_albert" -> g.ba(spark, 200, 3, 42),
      "sbm" -> g.sbm(spark, 50, 4, 0.2, 0.01, 42))
    val reports = graphs.map { case (name, e) => run(spark, name, e) }
    val rows = reports.flatMap(r => r.results.map(mr =>
      (r.graph, r.n, r.m, mr.method, mr.influence)))
      .toDF("graph", "vertices", "edges", "method", "influence")
    graft.core.ResultsSink.save(rows, outDir, "influence_benchmarks")
    val json = reports.map { r =>
      val ms = r.results.map(mr => s""""${mr.method}":${mr.influence}""")
        .mkString(",")
      s"""{"graph":"${r.graph}","n":${r.n},"m":${r.m},$ms}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"influence_bench","results":$json}""")
    spark.stop()
  }
}
