package graft.core

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

/** Benchmark/result table sink — the Spark re-expression of the
  * reference's save_results (/root/reference/run_benchmarks.py:497-522):
  * a result DataFrame is written under outDir/<name>/ as CSV plus
  * Markdown and LaTeX tables. Result tables are SMALL (one row per
  * benchmark config), so formatting happens driver-side after a bounded
  * collect; the CSV goes through the distributed writer so the same call
  * works on a real cluster's shared filesystem.
  */
object ResultsSink {

  val DefaultMaxRows = 10000

  def save(df: DataFrame, outDir: String, name: String,
           formats: Seq[String] = Seq("csv", "markdown", "latex"),
           maxRows: Int = DefaultMaxRows): Unit = {
    val dir = Paths.get(outDir, name)
    Files.createDirectories(dir)
    if (formats.contains("csv"))
      df.coalesce(1).write.mode("overwrite").option("header", "true")
        .csv(dir.resolve(s"$name.csv.d").toString)
    val cols = df.columns
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"ResultsSink is for small result tables (<= $maxRows rows)")
    def fmt(v: Any): String = v match {
      case null => "N/A"
      case d: Double => f"$d%.4f"
      case f: Float => f"$f%.4f"
      case x => x.toString
    }
    if (formats.contains("markdown")) {
      val sb = new StringBuilder(s"# $name\n\n")
      sb.append(cols.mkString("| ", " | ", " |\n"))
      sb.append(cols.map(_ => "---").mkString("| ", " | ", " |\n"))
      rows.foreach { r =>
        sb.append(cols.indices.map(i => fmt(r.get(i)))
          .mkString("| ", " | ", " |\n"))
      }
      Files.writeString(dir.resolve(s"$name.md"), sb.toString)
    }
    if (formats.contains("latex")) {
      def esc(s: String): String =
        s.replace("\\", "\\textbackslash{}").replace("_", "\\_")
          .replace("&", "\\&").replace("%", "\\%").replace("#", "\\#")
      val sb = new StringBuilder
      sb.append("\\begin{table}[ht]\n\\centering\n")
      sb.append(s"\\caption{${esc(name)}}\n")
      sb.append("\\begin{tabular}{" + cols.map(_ => "l").mkString("") + "}\n\\hline\n")
      sb.append(cols.map(esc).mkString(" & ") + " \\\\\n\\hline\n")
      rows.foreach { r =>
        sb.append(cols.indices.map(i => esc(fmt(r.get(i)))).mkString(" & ") + " \\\\\n")
      }
      sb.append("\\hline\n\\end{tabular}\n\\end{table}\n")
      Files.writeString(dir.resolve(s"$name.tex"), sb.toString)
    }
  }
}
