package graft.tools

/** Scratch: time the flagship entry() end-to-end. */
object EntryProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.entry(spark).collect()
      println(f"ENTRY $i: ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
        s"${rows.length} rows, top=${rows.head.getString(0)}")
    }
    spark.stop()
  }
}
