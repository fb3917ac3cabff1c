package graft
object BenchPr {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    // warm-up then measure
    Bench.pagerankThroughput(spark, "/root/testdata/sf0.1")
    val (m, it, s, eps) = Bench.pagerankThroughput(spark, "/root/testdata/sf0.1")
    println(s"PR edges=$m iters=$it secs=$s eps=$eps")
    spark.stop()
  }
}
