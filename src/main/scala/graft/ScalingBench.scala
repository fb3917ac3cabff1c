package graft

import org.apache.spark.sql.SparkSession

/** Two-parallelism-level scaling evidence (north_rule: throughput
  * scaling efficiency >= 0.8 from N to 4N executors; no real cluster in
  * the sandbox, so the protocol from BASELINE.md applies: the same job
  * at local[8] vs local[32] on the same input, efficiency =
  * tput(32) / (4 * tput(8))).
  *
  * Run: sbt "runMain graft.ScalingBench [sfDir]"
  */
object ScalingBench {

  private def runAt(cores: Int, sfDir: String): (Long, Int, Double, Double) = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up pass (JIT + codegen caches), then measured pass
    Bench.pagerankThroughput(spark, sfDir)
    val r = Bench.pagerankThroughput(spark, sfDir)
    spark.stop()
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val (m8, it8, s8, eps8) = runAt(8, sfDir)
    val (m32, it32, s32, eps32) = runAt(32, sfDir)
    val eff = eps32 / (4.0 * eps8)
    println(s"""{"metric":"scaling_efficiency","value":$eff,""" +
      s""""local8":{"edges":$m8,"iterations":$it8,"secs":$s8,"eps":$eps8},""" +
      s""""local32":{"edges":$m32,"iterations":$it32,"secs":$s32,"eps":$eps32},""" +
      s""""sf":"$sfDir"}""")
  }
}
