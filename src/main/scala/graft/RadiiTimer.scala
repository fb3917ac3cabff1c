package graft

object RadiiTimer {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    // warm
    spark.read.parquet(s"$dir/lineitem.parquet").count()
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("q_embed_radii")(spark, dir).count()
      println(f"RADII_RUN $i: ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
