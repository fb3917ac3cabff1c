package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for the engine.
  *
  * Scale posture: AQE on (runtime coalescing + skew-join splitting),
  * shuffle partitions matched to the parallelism level instead of the
  * 200 default, UTC pinned. On a real cluster the same builder is used
  * by spark-submit with `master` left to the submitter.
  */
object GraftSession {

  /** Build a local session with `cores` threads. `shufflePartitions`
    * defaults to `cores` — at 100 TB scale this becomes
    * ~2-3x total executor cores, set by the submitter.
    */
  def local(cores: Int, shufflePartitions: Option[Int] = None,
            appName: String = "graft"): SparkSession = {
    val sp = shufflePartitions.getOrElse(cores)
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", sp.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      // TypedImperativeAggregate (BoundedTopKAgg) groups per partition
      // exceed the 128 default, which silently flips ObjectHashAggregate
      // into sort-based mode and SORTS+SPILLS the whole candidate stream
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      .getOrCreate()
  }

  /** Tune an externally-created session (e.g. the driver's Verify/Bench
    * session) with the engine's preferred runtime confs — only the ones
    * settable after session start.
    */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
    spark
  }
}
