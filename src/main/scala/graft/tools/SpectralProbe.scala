package graft.tools

/** Scratch: where do SpectralInit-local's seconds go at sf0.1? */
object SpectralProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.graph.Edges.fromLineitem(spark, dir, 1000L)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"edges: ${e.count()}")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass")
      val deg = time("deg count") {
        val d = graft.graph.Edges.degrees(e)
        d.count(); d
      }
      time("edge collect") {
        e.select("src", "dst").collect().length
      }
      time("spectral full") {
        graft.embed.SpectralInit.run(spark, e, d = 2, gramTol = 1e-6).count()
      }
    }
    spark.stop()
  }
}
