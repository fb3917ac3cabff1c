package graft.embed

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Spearman rank correlation — the reference's benchmark metric
  * (scipy.stats.spearmanr, /root/reference/graphem/benchmark.py:173-194):
  * average ranks for ties, Pearson correlation of the rank vectors.
  *
  * Ranks are computed WITHOUT any single-partition window: per distinct
  * value, avg rank = (#smaller) + (#equal + 1)/2. The cumulative count
  * over the distinct-value table is two-phase — range-partition on the
  * value, cumulative sum locally within each range partition, then add
  * broadcast per-partition offsets (same pattern as Ids.dense). For a
  * continuous score column distinct ≈ n, so a global-ordered window
  * here would funnel the whole table through ONE task at web scale.
  * Pearson on ranks is the built-in `corr`-shaped aggregate.
  */
object Correlation {

  /** Average-rank column table: (joinKey..., rank) for df's `value`.
    * Deterministic across parallelism: ranks depend only on the global
    * sort order of the values, not on the sampled range bounds.
    */
  private def avgRanks(df: DataFrame, value: String, rankName: String): DataFrame = {
    val spark = df.sparkSession
    val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val counts = df.groupBy(col(value)).agg(count(lit(1)).as("_cnt"))
    val ranged = counts.repartitionByRange(p, col(value))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val wLocal = Window.partitionBy("_pid").orderBy(col(value))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged
      .withColumn("_pid", spark_partition_id())
      .withColumn("_cum", sum(col("_cnt")).over(wLocal))
    // per-partition totals: at most P rows on the driver
    val totals = ranged.groupBy(spark_partition_id().as("_pid"))
      .agg(sum(col("_cnt")).as("_tot")).orderBy("_pid").collect()
    var off = 0L
    val offsets = totals.map { r =>
      val o = (r.getInt(0), off); off += r.getLong(1); o
    }
    val offsetsDf = spark.createDataFrame(offsets.toSeq).toDF("_pid", "_off")
    // Materialize before unpersisting: ranks are only valid against the
    // exact range bounds the offsets were collected from.
    val ranked = graft.core.Lineage.truncate(
      local.join(broadcast(offsetsDf), "_pid")
        .select(col(value),
          (col("_off") + col("_cum") - col("_cnt") + (col("_cnt") + 1) / 2.0)
            .as(rankName)))
    ranged.unpersist(false)
    df.join(ranked, value)
  }

  /** Guarded Pearson over two columns: NULL when either is constant
    * (ANSI mode makes the built-in `corr` throw DIVIDE_BY_ZERO there;
    * the reference reports NaN — quirk #10,
    * /root/reference/run_benchmarks.py:170-181).
    */
  private def pearson(a: Column, b: Column): Column = {
    val cov = covar_pop(a, b)
    val sa = stddev_pop(a)
    val sb = stddev_pop(b)
    when(sa === 0.0 || sb === 0.0, lit(null).cast("double"))
      .otherwise(cov / (sa * sb))
  }

  /** Spearman rho of (a, b) columns of `df`. Returns NaN when either
    * column is constant.
    */
  def spearman(df: DataFrame, a: String, b: String): Double = {
    val withRa = avgRanks(df, a, "_ra")
    val withBoth = avgRanks(withRa, b, "_rb")
    val r = withBoth.agg(pearson(col("_ra"), col("_rb"))).head()
    if (r.isNullAt(0)) Double.NaN else r.getDouble(0)
  }

  /** DataFrame variant for oracle-checked queries: single row with the
    * correlation in integer micro-units.
    */
  def spearmanDf(df: DataFrame, a: String, b: String,
                 outName: String = "spearman_micro"): DataFrame = {
    val withRa = avgRanks(df, a, "_ra")
    val withBoth = avgRanks(withRa, b, "_rb")
    withBoth.agg(round(pearson(col("_ra"), col("_rb")) * 1e6, 0)
      .cast("long").as(outName))
  }
}
