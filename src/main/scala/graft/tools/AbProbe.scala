package graft.tools

/** Scratch A/B: fixedIterUndirected portableSum on/off. */
object AbProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.graph.Edges.fromLineitem(spark, dir, 1000L)
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.{Column, DataFrame}
    // inline copy of fixedIterUndirected with a pluggable sum expr
    def pr(sumOf: Column => Column): DataFrame = {
      val nbrs = graft.graph.Edges.neighbors(e)
      val deg = nbrs.groupBy("id").agg(count(lit(1)).cast("double").as("deg"))
      val nRow = deg.agg(count(lit(1)).cast("double").as("n"))
      var ranks = deg.crossJoin(nRow)
        .select(col("id"), (lit(1.0) / col("n")).as("rank"), col("deg"), col("n"))
      for (_ <- 1 to 5) {
        val msgs = nbrs.join(ranks, Seq("id"))
          .select(col("nbr").as("mid"), (col("rank") / col("deg")).as("c"))
        val gathered = msgs.groupBy(col("mid")).agg(sumOf(col("c")).as("s"))
        ranks = ranks.join(gathered, ranks("id") === gathered("mid"), "left")
          .select(ranks("id"),
            ((lit(1.0) - lit(0.85)) / col("n") +
              lit(0.85) * coalesce(col("s"), lit(0.0))).as("rank"),
            col("deg"), col("n"))
      }
      ranks.select(col("id"), col("rank"))
    }
    val variants: Seq[(String, Column => Column)] = Seq(
      "decimal" -> (c => graft.core.PortableSum.fixedSum(c, 1e15)),
      "long   " -> (c => graft.core.PortableSum.fixedSumLong(c, 1e15)),
      "native " -> (c => sum(c)))
    for (round <- 1 to 3; (nm, f) <- variants) {
      val t0 = System.nanoTime()
      val n = pr(f).agg(sum("rank")).collect()(0)
      println(f"variant=$nm ${(System.nanoTime() - t0) / 1e9}%6.2f s   (sum=$n)")
    }
    spark.stop()
  }
}
