package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
object EmbedProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32, appName = "embedprobe")
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    var jobs = 0
    var busy = 0.0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, System.nanoTime())
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = Option(starts.get(j.jobId)).getOrElse(0L)
        val d = (System.nanoTime() - s) / 1e9
        jobs += 1; busy += d
        if (d > 0.5) println(f"job ${j.jobId}%4d took $d%.2f s")
      }
    })
    val e = graft.graph.Edges.fromLineitem(spark, "/root/testdata/sf0.1", 1000L)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"edges=${e.count()}")
    var t0 = System.nanoTime()
    val init = graft.embed.SpectralInit.run(spark, e, d = 2, gramTol = 1e-6)
    val sJobs = jobs; val sBusy = busy
    println(f"spectral_secs=${(System.nanoTime()-t0)/1e9}%.1f jobs=$sJobs jobbusy=$sBusy%.1f")
    t0 = System.nanoTime()
    val pos = graft.embed.ForceLayout.run(spark, e, init, iterations = 3)
    val n = graft.embed.ForceLayout.radii(pos).count()
    println(f"layout_secs=${(System.nanoTime()-t0)/1e9}%.1f rows=$n jobs=${jobs - sJobs} jobbusy=${busy - sBusy}%.1f")
    spark.stop()
  }
}
