package graft.viz

import java.nio.file.{Path, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Headless SVG plots — the Spark re-expression of the reference's
  * visualization surface (/root/reference/graphem/visualization.py):
  *
  *  - [[scatterFacets]] mirrors `plot_radial_vs_centrality`
  *    (visualization.py:94-127): one scatter facet per centrality
  *    measure against radial distance, 3 per row, with an OLS trendline
  *    (plotly's `trendline='ols'`).
  *  - [[ciFacets]] mirrors the rho + bootstrap-CI readout of
  *    `report_corr` (visualization.py:11-49) as a chart: one facet per
  *    measure, one whiskered point per benchmark config.
  *
  * Scale posture: the OLS fit and the axis ranges are computed with ONE
  * distributed aggregation over ALL rows (exact at any scale); only the
  * plotted INK is bounded — a deterministic hash-ordered sample of at
  * most `maxPoints` rows (TakeOrdered, no global sort). A 100 TB frame
  * plots in one pass with a 2k-point cloud and the exact trendline.
  *
  * Design follows the validated colorblind-safe palette in [[Svg]]
  * (single series per facet -> no legend; the facet title names the
  * measure; text in text tokens; grid recessive). The numeric tables
  * (ResultsSink CSV/MD) are the companion "table view" of every figure.
  */
object Plots {

  final case class Ols(slope: Double, intercept: Double, n: Long)

  /** Closed-form normal-equations fit from sufficient statistics — the
    * ONE copy of the arithmetic shared by [[olsFit]] and the fused
    * multi-column aggregation in [[scatterFacets]] (a degenerate x
    * column fits the horizontal mean line).
    */
  private[viz] def olsFrom(n: Long, sx: Double, sy: Double,
                           sxx: Double, sxy: Double): Ols = {
    if (n == 0) return Ols(Double.NaN, Double.NaN, 0)
    val den = n.toDouble * sxx - sx * sx
    val slope = if (den == 0) 0.0 else (n * sxy - sx * sy) / den
    Ols(slope, (sy - sx * slope) / n, n)
  }

  /** Exact least-squares fit of y on x — one pass, distributed. */
  def olsFit(df: DataFrame, x: String, y: String): Ols = {
    val r = df.select(count(lit(1)), sum(col(x)), sum(col(y)),
      sum(col(x) * col(x)), sum(col(x) * col(y))).head()
    val n = r.getLong(0)
    if (n == 0) Ols(Double.NaN, Double.NaN, 0)
    else olsFrom(n, r.getDouble(1), r.getDouble(2), r.getDouble(3),
      r.getDouble(4))
  }

  private val FW = 300 // facet width
  private val FH = 230
  private val ML = 52; private val MR = 12; private val MT = 26; private val MB = 34

  /** Radius-vs-centrality scatter facets with exact OLS trendlines.
    * `df` must carry numeric columns `x` and each of `ys`.
    */
  def scatterFacets(df: DataFrame, x: String, ys: Seq[String],
                    out: String, title: String,
                    maxPoints: Int = 2000, perRow: Int = 3): Path = {
    require(ys.nonEmpty, "at least one y column")
    val sel = df.select((x +: ys).map(c => col(c).cast("double").as(c)): _*)
    // one aggregation pass: global mins/maxes + all OLS sufficient stats
    val aggCols = Seq(count(lit(1)), min(col(x)), max(col(x)),
      sum(col(x)), sum(col(x) * col(x))) ++
      ys.flatMap(y => Seq(min(col(y)), max(col(y)),
        sum(col(y)), sum(col(x) * col(y))))
    val r = sel.agg(aggCols.head, aggCols.tail: _*).head()
    val n = r.getLong(0)
    val (xLo, xHi) = (r.getDouble(1), r.getDouble(2))
    val (sx, sxx) = (r.getDouble(3), r.getDouble(4))
    val fits = ys.zipWithIndex.map { case (y, i) =>
      val base = 5 + i * 4
      val (yLo, yHi) = (r.getDouble(base), r.getDouble(base + 1))
      (y, yLo, yHi, olsFrom(n, sx, r.getDouble(base + 2), sxx,
        r.getDouble(base + 3)))
    }
    // bounded deterministic ink: hash-ordered top-k, never a full sort
    val pts = sel.orderBy(xxhash64((x +: ys).map(col): _*), col(x))
      .limit(maxPoints).collect()

    val rows = (ys.length + perRow - 1) / perRow
    val doc = new Svg.Doc(perRow * FW + 20, rows * FH + 40)
    doc.text(12, 20, title, size = 13)
    doc.text(12, rows * FH + 34,
      s"n = $n${if (n > pts.length) s", ${pts.length} shown (hash sample)" else ""}; line = exact OLS over all rows",
      size = 10, fill = Svg.TextSecondary)
    fits.zipWithIndex.foreach { case ((y, yLo0, yHi0, ols), i) =>
      val fx = (i % perRow) * FW; val fy = (i / perRow) * FH + 26
      val padY = if (yHi0 > yLo0) (yHi0 - yLo0) * 0.05 else math.max(1e-9, math.abs(yHi0) * 0.05 + 1e-12)
      val (yLo, yHi) = (yLo0 - padY, yHi0 + padY)
      val padX = if (xHi > xLo) (xHi - xLo) * 0.05 else 1.0
      val (pxLo, pxHi) = (xLo - padX, xHi + padX)
      def X(v: Double) = fx + ML + (v - pxLo) / (pxHi - pxLo) * (FW - ML - MR)
      def Y(v: Double) = fy + MT + (yHi - v) / (yHi - yLo) * (FH - MT - MB)
      // frame + recessive grid
      doc.text(fx + ML, fy + 16, y, size = 12, fill = Svg.TextSecondary)
      Svg.ticks(yLo, yHi).foreach { t =>
        doc.line(X(pxLo), Y(t), X(pxHi), Y(t), Svg.Grid, 1.0)
        doc.text(fx + ML - 4, Y(t) + 3, Svg.label(t), size = 9,
          fill = Svg.TextSecondary, anchor = "end")
      }
      Svg.ticks(xLo, xHi, 3).foreach { t =>
        doc.text(X(t), fy + FH - MB + 14, Svg.label(t), size = 9,
          fill = Svg.TextSecondary, anchor = "middle")
      }
      doc.line(X(pxLo), Y(yLo), X(pxHi), Y(yLo), Svg.TextSecondary, 1.0)
      // points (slot-1 blue), then the exact OLS line (slot-2 orange)
      pts.foreach { row =>
        val xv = row.getDouble(0); val yv = row.getDouble(1 + i)
        if (java.lang.Double.isFinite(xv) && java.lang.Double.isFinite(yv))
          doc.circle(X(xv), Y(math.max(yLo, math.min(yHi, yv))), 2.0,
            Svg.Series1, opacity = 0.55)
      }
      if (java.lang.Double.isFinite(ols.slope)) {
        def clampY(v: Double) = math.max(yLo, math.min(yHi, v))
        doc.line(X(xLo), Y(clampY(ols.intercept + ols.slope * xLo)),
          X(xHi), Y(clampY(ols.intercept + ols.slope * xHi)),
          Svg.Series2, 2.0)
      }
      doc.text(fx + FW - MR, fy + FH - MB + 26, x, size = 10,
        fill = Svg.TextSecondary, anchor = "end")
    }
    val p = Paths.get(out)
    doc.writeTo(p)
    p
  }

  final case class CiRow(config: String, measure: String,
                         rho: Double, lo: Double, hi: Double)

  /** One facet per measure; per config a bootstrap-CI whisker + point
    * on a fixed [-1, 1] rho axis (comparable across facets). NaN rhos
    * (constant centrality, quirk #10) leave a labeled gap.
    */
  def ciFacets(rows: Seq[CiRow], out: String, title: String,
               perRow: Int = 3): Path = {
    require(rows.nonEmpty, "at least one CI row")
    val measures = rows.map(_.measure).distinct
    val configs = rows.map(_.config).distinct
    val byKey = rows.map(r => (r.measure, r.config) -> r).toMap
    val fh = FH + 40 // room for rotated config labels
    val nRows = (measures.length + perRow - 1) / perRow
    val doc = new Svg.Doc(perRow * FW + 20, nRows * fh + 40)
    doc.text(12, 20, title, size = 13)
    doc.text(12, nRows * fh + 34,
      "point = Spearman rho; whisker = 95% bootstrap CI", size = 10,
      fill = Svg.TextSecondary)
    measures.zipWithIndex.foreach { case (m, i) =>
      val fx = (i % perRow) * FW; val fy = (i / perRow) * fh + 26
      val plotH = FH - MT - MB
      def Y(v: Double) = fy + MT + (1.0 - v) / 2.0 * plotH
      def X(j: Int) = fx + ML +
        (j + 0.5) / configs.length * (FW - ML - MR)
      doc.text(fx + ML, fy + 16, m, size = 12, fill = Svg.TextSecondary)
      Seq(-1.0, -0.5, 0.0, 0.5, 1.0).foreach { t =>
        doc.line(fx + ML, Y(t), fx + FW - MR, Y(t),
          if (t == 0.0) Svg.TextSecondary else Svg.Grid, 1.0,
          dash = if (t == 0.0) Some("3,3") else None)
        doc.text(fx + ML - 4, Y(t) + 3, Svg.label(t), size = 9,
          fill = Svg.TextSecondary, anchor = "end")
      }
      configs.zipWithIndex.foreach { case (c, j) =>
        byKey.get((m, c)).foreach { r =>
          if (java.lang.Double.isFinite(r.rho)) {
            if (java.lang.Double.isFinite(r.lo) && java.lang.Double.isFinite(r.hi)) {
              doc.line(X(j), Y(r.lo), X(j), Y(r.hi), Svg.Series1, 1.5)
              doc.line(X(j) - 3, Y(r.lo), X(j) + 3, Y(r.lo), Svg.Series1, 1.5)
              doc.line(X(j) - 3, Y(r.hi), X(j) + 3, Y(r.hi), Svg.Series1, 1.5)
            }
            doc.circle(X(j), Y(r.rho), 3.0, Svg.Series1)
          } else
            doc.text(X(j), Y(0.0) - 6, "n/a", size = 8,
              fill = Svg.TextSecondary, anchor = "middle")
        }
        doc.text(X(j), fy + FH - MB + 10, c, size = 8,
          fill = Svg.TextSecondary, anchor = "end", rotate = Some(-35))
      }
    }
    val p = Paths.get(out)
    doc.writeTo(p)
    p
  }
}
