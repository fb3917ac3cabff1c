package graft

import java.nio.file.{Files, Paths}

/** End-to-end harness coverage: the SNAP dataset benchmark composition
  * (readSnap -> embed -> full 6-measure correlation matrix -> tables)
  * and the influence-method comparison (graphem vs greedy vs random).
  */
class HarnessSpec extends SparkSuite {

  test("dataset bench e2e: all six correlations positive on facebook_combined, tables written") {
    val path = s"${DatasetBench.DefaultDataDir}/snap-facebook_combined/facebook_combined.txt"
    assume(new java.io.File(path).exists(), s"fixture missing: $path")
    // reduced iteration count for test wall-clock; the composition and
    // the qualitative result (radius is a centrality proxy on a real
    // social graph) are what this asserts — the main runs 30 iters
    val row = DatasetBench.runDataset(spark, "facebook_combined", path,
      iterations = 5)
    assert(row.vertices == 4039L && row.edgesN == 88234L,
      s"n=${row.vertices} m=${row.edgesN}")
    Seq("degree", "pagerank", "eigenvector",
      "betweenness", "closeness", "load").foreach { m =>
      val rho = row.corrs(m)
      assert(rho > 0.0, s"rho(radius,$m)=$rho")
      val p = row.pValues(m)
      assert(p >= 0.0 && p <= 1.0, s"p(radius,$m)=$p")
    }
    // at n=4039 the strong degree correlation is overwhelmingly
    // significant under the scipy t-approximation
    assert(row.pValues("degree") < 1e-6, s"p=${row.pValues("degree")}")
    // and the sink writes the three table formats
    import spark.implicits._
    val dir = Files.createTempDirectory("dsbench").toString
    val df = Seq((row.dataset, row.vertices, row.edgesN,
      row.corrs("degree"))).toDF("dataset", "vertices", "edges", "corr_degree")
    graft.core.ResultsSink.save(df, dir, "dataset_benchmarks")
    assert(Files.exists(Paths.get(dir, "dataset_benchmarks", "dataset_benchmarks.md")))
    assert(Files.exists(Paths.get(dir, "dataset_benchmarks", "dataset_benchmarks.tex")))
  }

  test("influence comparison: graphem and greedy beat the random-mean baseline on BA") {
    val e = graft.generators.Generators.ba(spark, 120, 3, 11)
    val rep = graft.embed.InfluenceBench.run(spark, "ba_test", e,
      k = 3, p = 0.08, trials = 3, candidatePool = 10, randomSets = 15,
      layoutIters = 3)
    val byMethod = rep.results.map(r => r.method -> r.influence).toMap
    assert(rep.n == 120)
    // hubs dominate IC spread on BA graphs: both informed methods must
    // beat the mean of random seed sets
    assert(byMethod("graphem_radii") >= byMethod("random_mean"),
      s"graphem ${byMethod("graphem_radii")} < random ${byMethod("random_mean")}")
    assert(byMethod("greedy") >= byMethod("random_mean"),
      s"greedy ${byMethod("greedy")} < random ${byMethod("random_mean")}")
    assert(rep.results.find(_.method == "graphem_radii").get.seeds.size == 3)
  }

  test("flagship entry(): pages -> links -> ids -> convergent PageRank -> top URLs") {
    val top = SparkEntry.entry(spark).collect()
    assert(top.length == 20)
    // ranks positive, descending, and urls well-formed
    val ranks = top.map(_.getDouble(1))
    assert(ranks.forall(_ > 0.0))
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b })
    assert(top.map(_.getString(0)).forall(_.startsWith("http")))
  }

  test("local IC evaluator matches the distributed portable-coin loop") {
    val e = graft.generators.Generators.ws(spark, 150, 4, 0.2, 9)
    val nbrs = graft.embed.Influence.collectNeighbors(e)
    val seeds = Seq(0L, 5L, 17L)
    val local = graft.embed.Influence.icInfluenceLocal(nbrs, seeds, 0.15, trial = 2)
    val dist = graft.embed.Influence.icInfluence(spark, e, seeds, 0.15,
      trial = 2, portableHash = true)
    assert(local == dist, s"local $local vs distributed $dist")
  }
}
