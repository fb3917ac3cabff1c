package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.generators.Generators._

/** Structural invariants mirroring the reference's
  * tests/test_generators.py (symmetry/self-loops are enforced by the
  * canonical edge form; here we check canonical-form validity, counts,
  * regularity, bipartiteness, connectivity, reproducibility).
  */
class GeneratorsSpec extends SparkSuite {

  def assertCanonical(e: DataFrame): Unit = {
    assert(e.where(col("src") >= col("dst")).count() == 0, "src<dst violated")
    assert(e.count() == e.distinct().count(), "duplicates")
  }

  test("ER: canonical, edge-count within binomial bounds, reproducible") {
    val e1 = er(spark, 200, 0.05, 42)
    assertCanonical(e1)
    val m = e1.count()
    val expect = 0.05 * 200 * 199 / 2
    assert(m > expect * 0.6 && m < expect * 1.4, s"m=$m expect~$expect")
    assert(er(spark, 200, 0.05, 42).count() == m)
    assert(er(spark, 200, 0.05, 123).except(e1).count() > 0, "seeds should differ")
  }

  test("random regular: exact d-regularity") {
    val e = randomRegular(spark, 30, 3, 42)
    val degs = graft.graph.Edges.degrees(e).select("degree")
      .collect().map(_.getLong(0)).toSet
    assert(degs == Set(3L))
  }

  test("WS: canonical, n vertices, ~n*k/2 edges") {
    val e = ws(spark, 100, 4, 0.3, 42)
    assertCanonical(e)
    val m = e.count()
    assert(m > 150 && m <= 200, s"m=$m")
  }

  test("BA: n vertices, hubs exist (degree skew)") {
    val e = ba(spark, 200, 3, 42)
    assertCanonical(e)
    val degs = graft.graph.Edges.degrees(e)
    assert(degs.count() == 200)
    val maxDeg = degs.agg(max("degree")).head().getLong(0)
    assert(maxDeg >= 15, s"expected a hub, max degree $maxDeg")
  }

  test("SBM: labels split blocks, denser within") {
    val e = sbm(spark, 25, 4, 0.5, 0.02, 42)
    assertCanonical(e)
    val within = e.where((col("src") / 25).cast("long") ===
      (col("dst") / 25).cast("long")).count()
    val across = e.count() - within
    assert(within > across, s"within=$within across=$across")
  }

  test("grid 5x4: exact edge count") {
    val e = grid(spark, 5, 4)
    assertCanonical(e)
    assert(e.count() == (4 * 4 + 5 * 3)) // (w-1)*h + w*(h-1)
  }

  test("balanced tree r=2 h=3: n-1 edges, connected") {
    val e = balancedTree(spark, 2, 3)
    assert(e.count() == 14)
    val cc = graft.algos.ConnectedComponents.run(spark, e)
    assert(cc.select("component").distinct().count() == 1)
  }

  test("caveman 3x5: 3 cliques of 5") {
    val e = caveman(spark, 3, 5)
    assert(e.count() == 3 * 10)
    assertCanonical(e)
  }

  test("complete bipartite 4x6: exact edges, bipartite") {
    val e = completeBipartite(spark, 4, 6)
    assert(e.count() == 24)
    assert(e.where(col("src") >= 4 || col("dst") < 4).count() == 0)
  }

  test("bipartite: no within-side edges") {
    val e = bipartite(spark, 20, 30, 0.2, 42)
    assertCanonical(e)
    assert(e.where(
      (col("src") < 20 && col("dst") < 20) ||
        (col("src") >= 20 && col("dst") >= 20)).count() == 0)
  }

  test("geometric: matches naive distance filter") {
    val e = geometric(spark, 60, 0.25, 42).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // naive oracle with the same hash uniforms
    val pts = spark.range(60).select(col("id"),
      graft.core.DetRandom.uniform(42, col("id"), lit(0)).as("x"),
      graft.core.DetRandom.uniform(42, col("id"), lit(1)).as("y"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val naive = (for {
      a <- 0L until 60L; b <- (a + 1) until 60L
      dx = pts(a)._1 - pts(b)._1; dy = pts(a)._2 - pts(b)._2
      if dx * dx + dy * dy <= 0.25 * 0.25
    } yield (a, b)).toSet
    assert(e == naive)
  }

  test("scale-free: canonical, no self loops, hubs") {
    val e = scaleFree(spark, 150, seed = 42)
    assertCanonical(e)
    val maxDeg = graft.graph.Edges.degrees(e).agg(max("degree")).head().getLong(0)
    assert(maxDeg >= 10)
  }

  test("power cluster: n vertices, more triangles than BA") {
    val e = powerCluster(spark, 100, 3, 0.7, 42)
    assertCanonical(e)
    val tri = graft.algos.TriangleCount.globalCount(spark, e).head().getLong(0)
    assert(tri > 20, s"triangles=$tri")
  }

  test("delaunay: connected, reproducible") {
    val e1 = delaunay(spark, 50, 42)
    assertCanonical(e1)
    val cc = graft.algos.ConnectedComponents.run(spark, e1)
    assert(cc.select("component").distinct().count() == 1)
    assert(delaunay(spark, 50, 42).except(e1).count() == 0)
  }

  test("relaxed caveman: same vertex count, perturbed") {
    val e = relaxedCaveman(spark, 3, 5, 0.3, 42)
    assertCanonical(e)
    assert(e.count() > 0)
  }

  test("erSparse: approximately right edge count at larger n") {
    val e = erSparse(spark, 10000, 0.001, 42)
    assertCanonical(e)
    val m = e.count()
    val expect = 0.001 * 10000 * 9999 / 2
    assert(m > expect * 0.8 && m < expect * 1.1, s"m=$m expect~$expect")
  }
}
