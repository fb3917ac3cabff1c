package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dense 0..n-1 id assignment in global sort order WITHOUT a global
  * single-partition sort: range-partition on the sort key, rank locally
  * within each range partition, add broadcast per-partition offsets.
  * Deterministic across parallelism levels (ids depend only on the
  * global sort order, not on the sampled range bounds).
  */
object Ids {

  /** Returns the input columns plus a dense `idName` column. The rows of
    * `df` must be distinct on `sortCols`.
    */
  def dense(spark: SparkSession, df: DataFrame, sortCols: Seq[String],
            idName: String = "id", partitions: Int = 0): DataFrame = {
    val p = if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val keys = sortCols.map(col)
    val ranged = df.repartitionByRange(p, keys: _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val local = ranged
      .withColumn("_pid", spark_partition_id())
      .withColumn("_rn",
        row_number().over(Window.partitionBy("_pid").orderBy(keys: _*)))
    val counts = ranged.groupBy(spark_partition_id().as("_pid"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("_pid").collect()
    var off = 0L
    val offsets = counts.map { r =>
      val o = (r.getInt(0), off); off += r.getLong(1); o
    }
    val offsetsDf = spark.createDataFrame(offsets.toSeq).toDF("_pid", "_off")
    // Materialize before unpersisting: ids are only valid against the
    // exact range bounds the offsets were collected from. Planned with
    // AQE off (truncatePartitioned): this function's contract is an
    // EXPLICIT width p, but under AQE the window's internal exchange is
    // advisory-coalesced to ~1-2 partitions before the checkpoint — the
    // rank then runs nearly serial AND every downstream pass over the
    // checkpointed frame inherits the accidental narrow layout. The ids
    // themselves depend only on the global sort order either way.
    val out = Lineage.truncatePartitioned(local.join(broadcast(offsetsDf), "_pid")
      .withColumn(idName, col("_off") + col("_rn") - 1L)
      .drop("_pid", "_rn", "_off"))
    ranged.unpersist(false)
    out
  }
}
