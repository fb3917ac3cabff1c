package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.Edges

/** CSV node/edge pair loader — the Spark re-expression of the
  * reference's SemanticScholarDataset.load()
  * (/root/reference/graphem/datasets.py:635-683): a nodes CSV carries an
  * external-id column; an edges CSV has (source, target) external ids;
  * ids densify to 0..n-1 long vertex ids via the sorted-dictionary
  * pattern; edges with an endpoint MISSING from the nodes table are
  * DROPPED (the reference's paper_to_idx.get -> None skip) — expressed
  * as two inner dictionary joins; the result is symmetrized + deduped to
  * the canonical src < dst edge table (the reference's
  * vstack(edges, reversed) + unique + src<target mask).
  *
  * Documented deviation: the reference numbers vertices by nodes-CSV ROW
  * ORDER. A distributed file read has no stable row order, so ids are
  * dense in SORTED external-id order instead — the graph is identical up
  * to relabeling, and per-vertex results map back to external ids
  * through the returned dictionary.
  */
object CsvGraph {

  /** dict: (ext, id) external-id dictionary; edges: canonical (src, dst). */
  case class Loaded(dict: DataFrame, edges: DataFrame)

  def readCsvPair(spark: SparkSession, nodesCsv: String, edgesCsv: String,
                  idCol: String = "id", srcCol: String = "source",
                  dstCol: String = "target"): Loaded = {
    val nodes = spark.read.option("header", "true").csv(nodesCsv)
      .select(col(idCol).cast("string").as("ext"))
      .where(col("ext").isNotNull)
      .distinct()
    val dict = graft.core.Ids.dense(spark, nodes, Seq("ext"), "id")
    val raw = spark.read.option("header", "true").csv(edgesCsv)
      .select(col(srcCol).cast("string").as("src_ext"),
        col(dstCol).cast("string").as("dst_ext"))
      .where(col("src_ext").isNotNull && col("dst_ext").isNotNull)
    // inner joins drop edges whose endpoints the nodes file doesn't know
    val mapped = raw
      .join(dict.select(col("ext").as("src_ext"), col("id").as("src")), "src_ext")
      .join(dict.select(col("ext").as("dst_ext"), col("id").as("dst")), "dst_ext")
      .select(col("src"), col("dst"))
    Loaded(dict, Edges.canonicalize(mapped))
  }
}
