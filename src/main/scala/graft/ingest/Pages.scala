package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic Common-Crawl-style web-page table synthesis
  * (BASELINE.json input_hint shape: url, warc_ts, html, text, lang).
  *
  * Every field is a pure function of the page id, so the same table
  * materializes identically at any parallelism level and any scale —
  * there is no external data in the sandbox (zero egress), and the link
  * topology is chosen arithmetically so oracles can reconstruct the
  * expected edge table without parsing HTML.
  *
  * Page `i` links to targets (i*31 + j*97) mod n for j = 1..outDegree —
  * a deterministic expander-style topology.
  */
object Pages {

  val Hosts = 20L

  def urlOf(id: Column): Column =
    concat(lit("https://host"), (id % Hosts).cast("string"),
      lit(".example/p"), id.cast("string"))

  def urlOfSql(id: String): String =
    s"'https://host' || CAST(($id) % ${Hosts} AS VARCHAR) || '.example/p' || CAST($id AS VARCHAR)"

  def targetOf(id: Column, j: Int, n: Long): Column =
    (id * 31L + j * 97L) % n

  /** SQL mirror of targetOf; `nExpr` is a SQL expression for n. */
  def targetOfSql(id: String, j: Int, nExpr: String): String =
    s"(($id) * 31 + ${j * 97}) % ($nExpr)"

  /** Anchor markup for the j-th out-link of page `id`. */
  private def anchor(id: Column, j: Int, n: Long): Column = {
    val t = targetOf(id, j, n)
    concat(lit("<a href=\""), urlOf(t), lit("\">anchor "),
      t.cast("string"), lit("</a>"))
  }

  /** Build the page table from (id, text) rows. html embeds `text`
    * byte-identically inside a single <p> element (the input_hint's
    * per-row invariant), plus `outDegree` anchors.
    */
  def fromIdText(idText: DataFrame, n: Long, outDegree: Int = 3): DataFrame = {
    val id = col("id")
    val anchors = (1 to outDegree).map(j => anchor(id, j, n))
    idText.select(
      urlOf(id).as("url"),
      to_timestamp(lit(1356998400L) + id * 60L).as("warc_ts"),
      concat(Seq(
        lit("<html><head><title>p"), id.cast("string"),
        lit("</title></head><body><p>"), col("text"), lit("</p>")) ++
        anchors :+ lit("</body></html>"): _*)
        .cast("binary").as("html"),
      col("text"),
      when(id % 17L === 0L, lit("de")).otherwise(lit("en")).as("lang"))
  }

  /** Fully synthetic page table of n pages with deterministic word-soup
    * text — scalable generation via spark.range (no driver-side data).
    */
  def synthesize(spark: SparkSession, n: Long, outDegree: Int = 3): DataFrame = {
    val base = spark.range(n).select(col("id"),
      concat(lit("Document "), col("id").cast("string"),
        lit(" about topic "), (col("id") % 7L).cast("string"),
        lit(" with token"), (col("id") % 13L).cast("string"),
        lit(" and token"), (col("id") % 17L).cast("string"),
        lit(" content.")).as("text"))
    fromIdText(base, n, outDegree)
  }

  /** Page table whose texts are the driver's `documents` rows (doc_id ->
    * page id) — lets the DuckDB oracle rebuild the identical table.
    */
  def fromDocuments(spark: SparkSession, sfDir: String, outDegree: Int = 3): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))
    val n = docs.count()
    fromIdText(docs, n, outDegree)
  }
}
