package graft.embed

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spearman rank correlation — the reference's benchmark metric
  * (scipy.stats.spearmanr, /root/reference/graphem/benchmark.py:173-194):
  * average ranks for ties, Pearson correlation of the rank vectors.
  *
  * Ranks are computed WITHOUT a global row_number window: per distinct
  * value, avg rank = (#smaller) + (#equal + 1)/2, built from a groupBy
  * plus a cumulative window over the (much smaller) distinct-value
  * table. Pearson on ranks is the built-in `corr` aggregate.
  */
object Correlation {

  /** Average-rank column table: (joinKey..., rank) for df's `value`. */
  private def avgRanks(df: DataFrame, value: String, rankName: String): DataFrame = {
    val counts = df.groupBy(col(value)).agg(count(lit(1)).as("_cnt"))
    val w = Window.orderBy(col(value))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = counts
      .withColumn("_cum", sum(col("_cnt")).over(w))
      .select(col(value),
        (col("_cum") - col("_cnt") + (col("_cnt") + 1) / 2.0).as(rankName))
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
