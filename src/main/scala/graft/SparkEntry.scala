package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.algos.{ConnectedComponents, LabelPropagation, PageRank, TriangleCount}
import graft.graph.Edges
import graft.ingest.{LinkExtract, Pages, UrlDictionary}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Graph queries run over a deterministic edge table derived from the
  * driver's lineitem parquet with pure modular arithmetic
  * (Edges.fromLineitem), so the DuckDB oracle can rebuild the identical
  * graph. The ingest queries synthesize a Common-Crawl-style page table
  * from the documents parquet, extract links with regex, and densify
  * URLs — the oracle reconstructs the expected output arithmetically.
  * Floating-point scores are emitted as BIGINT nano-units so the
  * driver's value-hash compare is representation-independent.
  */
object SparkEntry {

  private val V = 1000L // vertex-id space of the lineitem-derived graph

  private def edges(s: SparkSession, dir: String): DataFrame =
    Edges.fromLineitem(s, dir, V)

  // ---- shared SQL fragments -----------------------------------------

  private val edgesSqlCte: String =
    s"""edges AS (${Edges.lineitemEdgesSql(V)}),
       |nbrs AS (SELECT src AS id, dst AS nbr FROM edges
       |         UNION ALL SELECT dst AS id, src AS nbr FROM edges),
       |verts AS (SELECT DISTINCT id FROM nbrs)""".stripMargin

  /** 5 unrolled PageRank supersteps over an `edges`/`nbrs` CTE pair. */
  private def pagerankSqlTail: String = {
    def step(prev: String, k: Int): String =
      s"""r$k AS (
         |  SELECT d.id,
         |         (1.0 - 0.85) / d.n + 0.85 * coalesce(s.s, 0.0) AS rank,
         |         d.deg, d.n
         |  FROM deg d
         |  LEFT JOIN (SELECT n.nbr AS id, sum(r.rank / r.deg) AS s
         |             FROM nbrs n JOIN $prev r ON n.id = r.id
         |             GROUP BY n.nbr) s ON s.id = d.id)""".stripMargin
    s"""deg0 AS (SELECT id, CAST(count(*) AS DOUBLE) AS deg FROM nbrs GROUP BY id),
       |deg AS (SELECT id, deg, (SELECT CAST(count(*) AS DOUBLE) FROM deg0) AS n FROM deg0),
       |r0 AS (SELECT id, 1.0 / n AS rank, deg, n FROM deg),
       |${step("r0", 1)},
       |${step("r1", 2)},
       |${step("r2", 3)},
       |${step("r3", 4)},
       |${step("r4", 5)}
       |SELECT id, CAST(round(rank * 1e9, 0) AS BIGINT) AS rank_nano
       |FROM r5 ORDER BY id""".stripMargin
  }

  /** Arithmetic reconstruction of the synthesized link table (one row
    * per anchor of each page built from documents).
    */
  private val linksSqlCte: String = {
    val unions = (1 to 3).map { j =>
      val t = Pages.targetOfSql("doc_id", j, "nn.n")
      s"""SELECT ${Pages.urlOfSql("doc_id")} AS src_url,
         |       ${Pages.urlOfSql(t)} AS dst_url
         |FROM documents, nn""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""nn AS (SELECT count(*) AS n FROM documents),
       |links AS (
       |$unions
       |)""".stripMargin
  }

  // ---- flagship ------------------------------------------------------

  /** Flagship: synthesized web pages -> link extraction -> URL
    * densification -> canonical edges -> convergent PageRank -> top
    * URLs. Exercises every ingest + algo layer end-to-end.
    */
  def entry(spark: SparkSession): DataFrame = {
    val pages = Pages.synthesize(spark, 2000L)
    val links = LinkExtract.links(pages)
    val urls = links.select(col("src_url").as("url"))
      .union(links.select(col("dst_url").as("url")))
    val dict = UrlDictionary.build(spark, urls)
    val e = Edges.canonicalize(UrlDictionary.densify(links, dict))
    val pr = PageRank.runUndirected(spark, e,
      PageRank.Config(maxIter = 50, tol = 1e-6))
    pr.ranks.join(dict, pr.ranks("id") === dict("id"))
      .select(col("url"), col("rank"))
      .orderBy(desc("rank"), col("url")).limit(20)
  }

  // ---- queries -------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // graph layer over the lineitem-derived edge table
    "q_edges" -> ((s, dir) => edges(s, dir).orderBy("src", "dst")),

    "q_degrees" -> ((s, dir) => Edges.degrees(edges(s, dir)).orderBy("id")),

    "q_top_degree" -> ((s, dir) =>
      Edges.degrees(edges(s, dir))
        .orderBy(desc("degree"), col("id")).limit(20)),

    "q_pagerank" -> ((s, dir) =>
      PageRank.fixedIterUndirected(edges(s, dir), 5)
        .select(col("id"),
          round(col("rank") * 1e9, 0).cast("long").as("rank_nano"))
        .orderBy("id")),

    "q_cc" -> ((s, dir) =>
      ConnectedComponents.run(s, edges(s, dir)).orderBy("id")),

    "q_lpa" -> ((s, dir) =>
      LabelPropagation.run(s, edges(s, dir), 3).orderBy("id")),

    "q_triangles" -> ((s, dir) =>
      TriangleCount.globalCount(s, edges(s, dir))),

    // ingest layer: pages -> links -> dictionary -> pagerank
    "q_links" -> ((s, dir) =>
      LinkExtract.links(Pages.fromDocuments(s, dir))
        .orderBy("src_url", "dst_url")),

    "q_url_ids" -> ((s, dir) => {
      val links = LinkExtract.links(Pages.fromDocuments(s, dir))
      val urls = links.select(col("src_url").as("url"))
        .union(links.select(col("dst_url").as("url")))
      UrlDictionary.build(s, urls).orderBy("id")
    }),

    "q_text_parity" -> ((s, dir) =>
      LinkExtract.extractedText(Pages.fromDocuments(s, dir))
        .agg(sum(when(col("extracted_text") =!= col("text"), 1L)
          .otherwise(0L)).as("mismatches"))),

    "q_pagerank_links" -> ((s, dir) => {
      val links = LinkExtract.links(Pages.fromDocuments(s, dir))
      val urls = links.select(col("src_url").as("url"))
        .union(links.select(col("dst_url").as("url")))
      val dict = UrlDictionary.build(s, urls)
      val e = Edges.canonicalize(UrlDictionary.densify(links, dict))
      PageRank.fixedIterUndirected(e, 5)
        .select(col("id"),
          round(col("rank") * 1e9, 0).cast("long").as("rank_nano"))
        .orderBy("id")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q_edges" ->
      s"""WITH $edgesSqlCte
         |SELECT src, dst FROM edges ORDER BY src, dst""".stripMargin,

    "q_degrees" ->
      s"""WITH $edgesSqlCte
         |SELECT id, count(*) AS degree FROM nbrs GROUP BY id ORDER BY id""".stripMargin,

    "q_top_degree" ->
      s"""WITH $edgesSqlCte
         |SELECT id, count(*) AS degree FROM nbrs GROUP BY id
         |ORDER BY degree DESC, id LIMIT 20""".stripMargin,

    "q_pagerank" ->
      s"""WITH $edgesSqlCte,
         |$pagerankSqlTail""".stripMargin,

    "q_cc" ->
      s"""WITH RECURSIVE $edgesSqlCte,
         |reach AS (
         |  SELECT id, id AS comp FROM verts
         |  UNION
         |  SELECT n.nbr AS id, r.comp
         |  FROM reach r JOIN nbrs n ON n.id = r.id
         |  WHERE r.comp < n.nbr)
         |SELECT id, min(comp) AS component FROM reach GROUP BY id ORDER BY id""".stripMargin,

    "q_lpa" -> {
      def step(prev: String, k: Int): String =
        s"""c$k AS (SELECT n.id AS vid, l.label, count(*) AS cnt
           |        FROM nbrs n JOIN $prev l ON n.nbr = l.id GROUP BY n.id, l.label),
           |l$k AS (SELECT vid AS id, label FROM (
           |          SELECT vid, label,
           |                 row_number() OVER (PARTITION BY vid
           |                   ORDER BY cnt DESC, label ASC) AS rn
           |          FROM c$k) WHERE rn = 1)""".stripMargin
      s"""WITH $edgesSqlCte,
         |l0 AS (SELECT id, id AS label FROM verts),
         |${step("l0", 1)},
         |${step("l1", 2)},
         |${step("l2", 3)}
         |SELECT id, label FROM l3 ORDER BY id""".stripMargin
    },

    "q_triangles" ->
      s"""WITH $edgesSqlCte
         |SELECT count(*) AS triangles
         |FROM edges e1
         |JOIN edges e2 ON e2.src = e1.dst
         |JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst""".stripMargin,

    "q_links" ->
      s"""WITH $linksSqlCte
         |SELECT src_url, dst_url FROM links ORDER BY src_url, dst_url""".stripMargin,

    "q_url_ids" ->
      s"""WITH $linksSqlCte,
         |urls AS (SELECT DISTINCT src_url AS url FROM links
         |         UNION SELECT DISTINCT dst_url FROM links)
         |SELECT url, row_number() OVER (ORDER BY url) - 1 AS id
         |FROM urls ORDER BY id""".stripMargin,

    "q_text_parity" ->
      s"""WITH nn AS (SELECT count(*) AS n FROM documents),
         |pages AS (
         |  SELECT doc_id, text,
         |    '<html><head><title>p' || CAST(doc_id AS VARCHAR) ||
         |    '</title></head><body><p>' || text || '</p>' ||
         |    ${(1 to 3).map { j =>
              val t = Pages.targetOfSql("doc_id", j, "nn.n")
              s"""'<a href="' || ${Pages.urlOfSql(t)} || '">anchor ' || CAST($t AS VARCHAR) || '</a>'"""
            }.mkString(" || ")} ||
         |    '</body></html>' AS html
         |  FROM documents, nn)
         |SELECT sum(CASE WHEN regexp_extract(html, '<p>(.*?)</p>', 1) <> text
         |           THEN 1 ELSE 0 END) AS mismatches FROM pages""".stripMargin,

    "q_pagerank_links" ->
      s"""WITH $linksSqlCte,
         |urls AS (SELECT DISTINCT src_url AS url FROM links
         |         UNION SELECT DISTINCT dst_url FROM links),
         |dict AS (SELECT url, row_number() OVER (ORDER BY url) - 1 AS id FROM urls),
         |ide AS (SELECT d1.id AS a, d2.id AS b
         |        FROM links l
         |        JOIN dict d1 ON d1.url = l.src_url
         |        JOIN dict d2 ON d2.url = l.dst_url),
         |edges AS (SELECT DISTINCT least(a, b) AS src, greatest(a, b) AS dst
         |          FROM ide WHERE a <> b),
         |nbrs AS (SELECT src AS id, dst AS nbr FROM edges
         |         UNION ALL SELECT dst AS id, src AS nbr FROM edges),
         |$pagerankSqlTail""".stripMargin,
  )
}
