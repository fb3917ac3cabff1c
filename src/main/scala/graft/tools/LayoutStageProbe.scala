package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Per-stage attribution of the layout superstep's fused job:
  * runs q_embed_radii's layout twice (warm second pass) with a stage
  * listener printing duration + task count + shuffle bytes per stage.
  * Diagnostic only.
  */
object LayoutStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var record = false
    val listener = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        if (record) {
          val i = s.stageInfo
          val m = i.taskMetrics
          println(f"  stage ${i.stageId}%4d ${i.numTasks}%4d tasks " +
            f"run=${m.executorRunTime / 1000.0}%7.2fs cpu=${m.executorCpuTime / 1e9}%7.2fs " +
            f"srTot=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB " +
            f"swTot=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB  ${i.name.take(80)}")
        }
    }
    spark.sparkContext.addSparkListener(listener)
    val e = graft.graph.Edges.fromLineitem(spark, dir, 1000L)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"edges: ${e.count()}")
    val init = graft.embed.SpectralInit.run(spark, e, d = 2, gramTol = 1e-6)
    init.count()
    // pass 1 (cold, not recorded)
    graft.embed.ForceLayout.run(spark, e, init, 3).count()
    println("--- warm pass, per-stage:")
    record = true
    val t0 = System.nanoTime()
    graft.embed.ForceLayout.run(spark, e, init, 3).count()
    println(f"warm layout total: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
