package graft

import org.apache.spark.sql.functions._

/** Plan audit: print the formatted physical plans of representative
  * queries so pushdown / pruning / codegen / join strategies can be
  * eyeballed per round. Run: sbt "runMain graft.ExplainAudit"
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    def show(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n===== $name =====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        .linesIterator.take(60).mkString("\n"))
    }
    show("edges_from_lineitem (pruning: only 2 of 11 columns read)")(
      graft.graph.Edges.fromLineitem(spark, dir))
    show("q_rel_agg (partial aggregation + codegen)")(
      SparkEntry.queries("q_rel_agg")(spark, dir))
    show("q_doc_tokens (column pruning on documents)")(
      SparkEntry.queries("q_doc_tokens")(spark, dir))
    show("ann topk (broadcast nested loop + bounded-heap ObjectHashAggregate)")(
      SparkEntry.queries("q_ann_topk")(spark, dir))
    show("ann lsh (bucket equi-join, multiprobe explode, bounded top-k; NO window)")(
      SparkEntry.queries("q_ann_lsh")(spark, dir))
    show("spearman (join-based ranks; no Window node in the final plan)")(
      SparkEntry.queries("q_spearman_deg_pr")(spark, dir))
    val t0 = System.nanoTime()
    val n = graft.text.Dedup.minHashNearDups(
      spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
      threshold = 0.9).count()
    println(s"\nminhash timing: $n pairs in ${(System.nanoTime()-t0)/1e9}s")
    spark.stop()
  }
}
