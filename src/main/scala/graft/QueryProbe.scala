package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Diagnostic: run one named SparkEntry query with a per-job timing
  * listener — `runMain graft.QueryProbe q_spearman_deg_pr [sfDir]`.
  * Shows where a query's wall time goes job-by-job (the bench only
  * reports totals).
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_spearman_deg_pr")
    val dir = args.find(a => !a.startsWith("q"))
      .getOrElse(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
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
          if (secs > 0.05) println(f"  JOB ${je.jobId}%3d ${secs}%6.2f s  ${s._2.take(90)}")
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall = (for (a <- si.completionTime; b <- si.submissionTime)
          yield (a - b) / 1e3).getOrElse(-1.0)
        if (wall > 0.05)
          println(f"    STAGE ${si.stageId}%3d wall=$wall%5.2f cpu=${m.executorCpuTime / 1e9}%6.2f " +
            f"run=${m.executorRunTime / 1e3}%6.2f shR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%7.1fMB " +
            f"shW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%7.1fMB tasks=${si.numTasks}%4d " +
            si.name.take(60))
      }
    })
    // every name after the first runs too (bench-style shared-JVM
    // warm state); each gets 4 passes with per-pass times printed
    val names: Seq[String] =
      if (args.isEmpty) Seq(name) else args.toSeq.takeWhile(_.startsWith("q"))
    for (n <- if (names.isEmpty) Seq(name) else names) {
      val q = SparkEntry.queries(n)
      val times = (1 to 4).map { i =>
        if (i == 4) println(s"=== $n pass $i (job detail) ===")
        val t0 = System.nanoTime()
        q(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$n%-22s passes: ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
