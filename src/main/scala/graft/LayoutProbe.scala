package graft

import org.apache.spark.sql.functions._

object LayoutProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.graph.Edges.fromLineitem(spark, dir, 1000L)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"edges: ${e.count()}")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass")
      val init = time("spectral") {
        val i = graft.embed.SpectralInit.run(spark, e, d = 2, gramTol = 1e-6)
        i.count(); i
      }
      val cfg0 = graft.embed.ForceLayout.Config(d = 2,
        progress = Some((it, m) => println(f"  iter $it done at ${m("elapsed_secs")}%.2f s")))
      time("layout 3 iters")(
        graft.embed.ForceLayout.run(spark, e, init, 3, cfg0).count())
    }
    spark.stop()
  }
}
