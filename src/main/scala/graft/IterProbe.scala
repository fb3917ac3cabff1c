package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

object IterProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, (System.nanoTime(),
          Option(js.properties.getProperty("spark.job.description")).getOrElse("")))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = starts.remove(je.jobId)
        if (s != null) {
          val secs = (System.nanoTime() - s._1) / 1e9
          if (secs > 0.15) println(f"  JOB ${je.jobId}%3d ${secs}%6.2f s  ${s._2.take(80)}")
        }
      }
    })
    val e = graft.graph.Edges.fromLineitem(spark, dir, 1000L)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"edges: ${e.count()}")
    val init = graft.embed.SpectralInit.run(spark, e, d = 2, gramTol = 1e-6)
    init.count()
    println("=== layout 3 iters ===")
    val t0 = System.nanoTime()
    graft.embed.ForceLayout.run(spark, e, init, 3,
      graft.embed.ForceLayout.Config(d = 2,
        progress = Some((it, m) => println(f"  == iter $it at ${m("elapsed_secs")}%.2f s")))).count()
    println(f"total: ${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
