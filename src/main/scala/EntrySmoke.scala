object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    println("ENTRY_ROWS=" + df.count())
    df.show(5, false)
    spark.stop()
  }
}
