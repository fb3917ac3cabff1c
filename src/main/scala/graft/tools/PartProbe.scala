package graft.tools

import org.apache.spark.sql.functions._

/** Scratch: does a truncated (localCheckpointFresh) repartitioned frame
  * keep its hash partitioning through a join (no Exchange)? */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.range(100000).select(col("id"), (col("id") % 97).as("v"))
    val t = graft.core.Lineage.truncatePartitioned(base.repartition(8, col("id")))
    println("truncated outputPartitioning: " + t.queryExecution.executedPlan.outputPartitioning)
    val other = spark.range(1000).select(col("id"), lit(1.0).as("w"))
    val j = t.join(other, Seq("id"))
    val plan = j.queryExecution.executedPlan.toString
    println(plan.linesIterator.take(25).mkString("\n"))
    // and with AQE actually executed
    j.write.format("noop").mode("overwrite").save()
    println("=== final adaptive plan ===")
    println(j.queryExecution.executedPlan.toString.linesIterator.take(25).mkString("\n"))
    spark.stop()
  }
}
