package graft

import org.apache.spark.sql.functions._

import graft.embed._
import graft.generators.Generators

/** Embedding invariants mirroring the reference's tests/test_embedder.py
  * and the centrality-correlation claims (README/benchmark):
  * sign/rotation-invariant checks only (reference quirk #5).
  */
class EmbedSpec extends SparkSuite {

  test("spectral init: orthonormal columns, Laplacian eigen-residual small") {
    val e = edgesOf(K4 ++ Seq((3L, 4L), (4L, 5L), (2L, 5L)))
    val pos = SpectralInit.run(spark, e, d = 2)
    val rows = pos.collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(rows.size == 6)
    rows.values.foreach(p => assert(p.length == 2 && p.forall(v => !v.isNaN)))
    // columns orthonormal
    val n = rows.size
    val c0 = rows.toSeq.sortBy(_._1).map(_._2(0)).toArray
    val c1 = rows.toSeq.sortBy(_._1).map(_._2(1)).toArray
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    assert(math.abs(dot(c0, c0) - 1.0) < 1e-6)
    assert(math.abs(dot(c1, c1) - 1.0) < 1e-6)
    assert(math.abs(dot(c0, c1)) < 1e-6)
    // eigen-residual: L v ~ lambda v for the normalized Laplacian
    val ids = rows.keys.toSeq.sorted
    val deg = ids.map(i =>
      (K4 ++ Seq((3L, 4L), (4L, 5L), (2L, 5L)))
        .count(p => p._1 == i || p._2 == i).toDouble)
    val degM = ids.zip(deg).toMap
    def applyL(v: Map[Long, Double]): Map[Long, Double] = {
      val adj = (K4 ++ Seq((3L, 4L), (4L, 5L), (2L, 5L)))
        .flatMap(p => Seq(p, (p._2, p._1)))
      ids.map { i =>
        val s = adj.filter(_._1 == i).map { case (_, j) =>
          v(j) / math.sqrt(degM(i) * degM(j))
        }.sum
        i -> (v(i) - s)
      }.toMap
    }
    for (cIdx <- 0 until 2) {
      val v = rows.map { case (i, p) => i -> p(cIdx) }
      val lv = applyL(v)
      val lambda = ids.map(i => lv(i) * v(i)).sum // Rayleigh quotient
      val resid = math.sqrt(ids.map(i => math.pow(lv(i) - lambda * v(i), 2)).sum)
      assert(resid < 1e-4, s"column $cIdx residual $resid")
      assert(lambda > 1e-8 && lambda < 2.0, s"nontrivial eigenvalue $lambda")
    }
  }

  test("layout: positions finite, shaped, and changed by iterations") {
    val e = Generators.er(spark, 60, 0.1, 42)
    val init = SpectralInit.run(spark, e, d = 2)
    val out = ForceLayout.run(spark, e, init, iterations = 3)
    val rows = out.collect()
    assert(rows.length == init.count())
    rows.foreach { r =>
      val p = r.getSeq[Double](1)
      assert(p.length == 2)
      p.foreach(v => { assert(!v.isNaN && !v.isInfinite && math.abs(v) < 1000) })
    }
    // layout changes positions (test_embedder.py:44-61)
    val i0 = init.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val moved = rows.count(r => {
      val p = r.getSeq[Double](1); val q = i0(r.getLong(0))
      math.abs(p(0) - q(0)) + math.abs(p(1) - q(1)) > 1e-9
    })
    assert(moved > rows.length / 2)
  }

  test("layout: disconnected graphs don't crash (test_embedder.py:63-85)") {
    val e = edgesOf(TwoTriangles)
    val out = ForceLayout.run(spark, e, SpectralInit.run(spark, e, 2), 2)
    assert(out.count() == 6)
    out.collect().foreach(r =>
      r.getSeq[Double](1).foreach(v => assert(!v.isNaN)))
  }

  test("signature: radius correlates with degree and PageRank on BA") {
    val e = Generators.ba(spark, 150, 3, 42)
    val init = SpectralInit.run(spark, e, d = 2)
    val pos = ForceLayout.run(spark, e, init, iterations = 10)
    val radii = ForceLayout.radii(pos)
    val deg = graft.graph.Edges.degrees(e)
    val pr = graft.algos.PageRank.runUndirected(spark, e).ranks
    val joined = radii.join(deg, "id").join(pr, "id")
    val rhoDeg = Correlation.spearman(joined, "radius", "degree")
    val rhoPr = Correlation.spearman(joined, "radius", "rank")
    assert(rhoDeg > 0.5, s"rho(radius, degree)=$rhoDeg")
    assert(rhoPr > 0.5, s"rho(radius, pagerank)=$rhoPr")
  }

  test("correlation NaN-guard on constant measures (quirk #10)") {
    val e = Generators.randomRegular(spark, 20, 3, 42)
    val deg = graft.graph.Edges.degrees(e)
      .withColumn("other", col("id") % 7)
    assert(Correlation.spearman(deg, "degree", "other").isNaN)
  }

  test("spearman matches hand-computed fixtures (ties averaged)") {
    import spark.implicits._
    val df1 = Seq((1.0, 10.0), (2.0, 20.0), (2.0, 20.0), (3.0, 40.0))
      .toDF("a", "b")
    assert(math.abs(Correlation.spearman(df1, "a", "b") - 1.0) < 1e-9)
    val df2 = Seq((1.0, 4.0), (2.0, 3.0), (3.0, 2.0), (4.0, 1.0)).toDF("a", "b")
    assert(math.abs(Correlation.spearman(df2, "a", "b") + 1.0) < 1e-9)
    val df3 = Seq((1.0, 3.0), (2.0, 1.0), (2.0, 1.0), (5.0, 9.0), (7.0, 6.0))
      .toDF("a", "b")
    assert(math.abs(Correlation.spearman(df3, "a", "b") - 0.5789473684) < 1e-9)
  }

  test("IC influence: invariants from test_influence.py") {
    val path = edgesOf(P10)
    // empty seeds -> 0
    assert(Influence.icInfluence(spark, path, Seq(), 0.5) == 0L)
    // seeds count even with p=0
    assert(Influence.icInfluence(spark, path, Seq(0L, 9L), 0.0) == 2L)
    // monotone-ish in p on K8 (allow +-2 slack like the reference)
    val k8 = edgesOf(K8)
    val lo = Influence.icInfluence(spark, k8, Seq(0L), 0.1)
    val hi = Influence.icInfluence(spark, k8, Seq(0L), 0.9)
    assert(hi + 2 >= lo, s"lo=$lo hi=$hi")
    assert(hi >= 6, s"p=0.9 on K8 should reach most vertices, got $hi")
    // disconnected: bounded by component of the seed
    val twoPaths = edgesOf(TwoPaths)
    val inf = Influence.icInfluence(spark, twoPaths, Seq(0L), 1.0)
    assert(inf == 3L, s"component bound violated: $inf")
  }

  test("seed selection: top-k by radius, deterministic") {
    import spark.implicits._
    val pos = Seq(
      (0L, Seq(3.0, 0.0)), (1L, Seq(0.1, 0.1)), (2L, Seq(2.0, 2.0)),
      (3L, Seq(0.0, 1.0))).toDF("id", "pos")
    val seeds = Influence.seedSelection(pos, 2).select("id")
      .collect().map(_.getLong(0)).toSeq
    assert(seeds == Seq(0L, 2L))
  }
}
