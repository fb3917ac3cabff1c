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
           formats: Seq[String] = Seq("csv", "markdown", "latex", "html"),
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
    // HTML table — reference _save_html (run_benchmarks.py:774-815):
    // styled standalone page, one <table> with header row
    if (formats.contains("html")) {
      def esc(s: String): String =
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      val title = name.split('_').map(_.capitalize).mkString(" ")
      val sb = new StringBuilder
      sb.append("<!DOCTYPE html>\n<html>\n<head>\n")
      sb.append(s"<title>${esc(title)}</title>\n<style>\n")
      sb.append("body { font-family: Arial, sans-serif; margin: 20px; line-height: 1.6; }\n")
      sb.append("table { border-collapse: collapse; width: 100%; margin-top: 20px; margin-bottom: 20px; }\n")
      sb.append("th, td { padding: 8px; text-align: left; border-bottom: 1px solid #ddd; }\n")
      sb.append("th { background-color: #f2f2f2; }\n")
      sb.append("tr:hover { background-color: #f5f5f5; }\n")
      sb.append("</style>\n</head>\n<body>\n")
      sb.append(s"<h1>${esc(title)}</h1>\n<table>\n<tr>")
      cols.foreach(c => sb.append(s"<th>${esc(c)}</th>"))
      sb.append("</tr>\n")
      rows.foreach { r =>
        sb.append("<tr>")
        cols.indices.foreach(i => sb.append(s"<td>${esc(fmt(r.get(i)))}</td>"))
        sb.append("</tr>\n")
      }
      sb.append("</table>\n</body>\n</html>\n")
      Files.writeString(dir.resolve(s"$name.html"), sb.toString)
    }
  }
}
