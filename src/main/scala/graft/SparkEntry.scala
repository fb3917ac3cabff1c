package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.algos.{ConnectedComponents, LabelPropagation, PageRank, TriangleCount}
import graft.graph.Edges

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Graph queries run over a deterministic edge table derived from the
  * driver's lineitem parquet with pure modular arithmetic
  * (Edges.fromLineitem), so the DuckDB oracle can rebuild the identical
  * graph. Floating-point scores are emitted as BIGINT nano-units so the
  * driver's value-hash compare is representation-independent.
  */
object SparkEntry {

  private val V = 1000L // vertex-id space of the derived graph

  private def edges(s: SparkSession, dir: String): DataFrame =
    Edges.fromLineitem(s, dir, V)

  private val edgesSqlCte: String =
    s"""edges AS (${Edges.lineitemEdgesSql(V)}),
       |nbrs AS (SELECT src AS id, dst AS nbr FROM edges
       |         UNION ALL SELECT dst AS id, src AS nbr FROM edges),
       |verts AS (SELECT DISTINCT id FROM nbrs)""".stripMargin

  /** Flagship: synthesized web pages -> link extraction -> URL
    * densification -> canonical edges -> PageRank -> top URLs.
    */
  def entry(spark: SparkSession): DataFrame = {
    val e = edges(spark, "/root/testdata/sf0.001")
    val pr = PageRank.runUndirected(spark, e,
      PageRank.Config(maxIter = 30, tol = 1e-6))
    pr.ranks.orderBy(desc("rank"), col("id")).limit(20)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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

    "q_pagerank" -> {
      def step(prev: String, k: Int): String =
        s"""r$k AS (
           |  SELECT d.id,
           |         (1.0 - 0.85) / d.n + 0.85 * coalesce(s.s, 0.0) AS rank,
           |         d.deg, d.n
           |  FROM deg d
           |  LEFT JOIN (SELECT n.nbr AS id, sum(r.rank / r.deg) AS s
           |             FROM nbrs n JOIN $prev r ON n.id = r.id
           |             GROUP BY n.nbr) s ON s.id = d.id)""".stripMargin
      s"""WITH $edgesSqlCte,
         |deg0 AS (SELECT id, CAST(count(*) AS DOUBLE) AS deg FROM nbrs GROUP BY id),
         |deg AS (SELECT id, deg, (SELECT CAST(count(*) AS DOUBLE) FROM deg0) AS n FROM deg0),
         |r0 AS (SELECT id, 1.0 / n AS rank, deg, n FROM deg),
         |${step("r0", 1)},
         |${step("r1", 2)},
         |${step("r2", 3)},
         |${step("r3", 4)},
         |${step("r4", 5)}
         |SELECT id, CAST(round(rank * 1e9, 0) AS BIGINT) AS rank_nano
         |FROM r5 ORDER BY id""".stripMargin
    },

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
  )
}
