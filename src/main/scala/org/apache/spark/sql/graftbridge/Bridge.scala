package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Narrow bridge into Spark's private[sql] Column<->Expression
  * converters, used to build Catalyst expressions the public functions
  * API can't (e.g. bit shifts by a Column amount). Lives under
  * org.apache.spark.sql to satisfy the private[sql] access scope.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager localCheckpoint that does NOT inherit the origin plan's
    * statistics.
    *
    * Dataset.localCheckpoint copies the source plan's sizeInBytes
    * estimate into the resulting LogicalRDD (originStats). In an
    * iterative join loop the join size estimate is the PRODUCT of its
    * children's estimates, so the carried-over BigInt SQUARES every
    * iteration — its digit count doubles, and Catalyst's stats visitor
    * ends up multiplying million-digit BigInts on the driver (observed:
    * iteration wall-time x3-4 per superstep from iteration ~18).
    * Rebuilding the LogicalRDD with originStats = None resets the
    * estimate to the default leaf size each iteration.
    */
  def localCheckpointFresh(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    localCheckpointFresh(df, eager = true)

  /** RDD.unpersist on ANY locally-checkpointed RDD logs a scary
    * "cannot be recomputed after unpersisting" WARN — even here, where
    * every release happens after the successor state is materialized
    * and the frame is provably dead. The warning spams hundreds of
    * lines into every iterative bench run, so a message-targeted DENY
    * filter is installed once, on first release — scoped to that exact
    * message text, so every OTHER rdd-package warning (checkpoint block
    * loss, recompute costs in a host application) still reaches the
    * log. Falls back to raising org.apache.spark.rdd to ERROR if the
    * log4j2 filter API is unavailable.
    */
  private lazy val muteLocalCheckpointWarn: Unit =
    try {
      import org.apache.logging.log4j.core.{Filter, LoggerContext}
      import org.apache.logging.log4j.core.filter.RegexFilter
      val ctx = org.apache.logging.log4j.LogManager
        .getContext(false).asInstanceOf[LoggerContext]
      val filter = RegexFilter.createFilter(
        ".*cannot be recomputed after unpersisting.*",
        null, false, Filter.Result.DENY, Filter.Result.NEUTRAL)
      ctx.getConfiguration.getLoggerConfig("org.apache.spark.rdd")
        .addFilter(filter)
      ctx.updateLoggers()
    } catch {
      case _: Throwable =>
        try org.apache.logging.log4j.core.config.Configurator.setLevel(
          "org.apache.spark.rdd", org.apache.logging.log4j.Level.ERROR)
        catch { case _: Throwable => () } // non-log4j2: keep the noise
    }

  /** Unpersist the RDD behind a localCheckpointFresh frame — call once
    * the frame is provably dead (a successor checkpoint materialized).
    */
  def releaseCheckpoint(df: org.apache.spark.sql.DataFrame): Unit = {
    muteLocalCheckpointWarn
    import org.apache.spark.sql.classic
    import org.apache.spark.sql.execution.LogicalRDD
    df.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.analyzed.collectFirst { case l: LogicalRDD => l }
      .foreach(_.rdd.unpersist(false))
  }

  /** eager=false marks the RDD for checkpointing but defers
    * materialization to the caller's FIRST action on the returned frame
    * — letting an iterative loop fold "materialize new state" and
    * "compute convergence delta" into one job.
    */
  def localCheckpointFresh(df: org.apache.spark.sql.DataFrame,
                           eager: Boolean): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.classic
    import org.apache.spark.sql.execution.LogicalRDD
    val cp = df.localCheckpoint(eager).asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]]
    val spark = cp.sparkSession
    val lr = cp.queryExecution.analyzed.collectFirst {
      case l: LogicalRDD => l
    }.getOrElse(throw new IllegalStateException(
      "localCheckpoint did not produce a LogicalRDD"))
    val fresh = LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
      lr.outputOrdering, lr.isStreaming, None)(spark, None, None)
    classic.Dataset.ofRows(spark, fresh)
  }
}
