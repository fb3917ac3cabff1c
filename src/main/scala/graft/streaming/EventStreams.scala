package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the events table shape.
  *
  * The reference is batch-only (SURVEY §2.9), but a web-scale ingest
  * pipeline needs the streaming versions of its rollups: the same
  * tumbling-window aggregation as the batch q_events_hourly, expressed
  * as readStream -> watermark -> window -> writeStream, so late data is
  * bounded and state is evicted. Batch and streaming share the
  * aggregation logic; the batch query is the correctness oracle for the
  * streaming one (run-to-completion on static input must agree).
  */
object EventStreams {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of event parquet files. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Hourly tumbling-window rollup with a watermark for bounded state:
    * (window_start, event_type, n_events, value_sum).
    */
  def hourlyRollup(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("value_sum"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("value_sum"))

  /** Run a streaming rollup into an in-memory sink (tests/demos);
    * returns the query — callers processAllAvailable() then read the
    * `tableName` table.
    */
  def startMemorySink(rollup: DataFrame, tableName: String): StreamingQuery =
    rollup.writeStream
      .format("memory")
      .queryName(tableName)
      .outputMode(OutputMode.Append()) // watermark allows append finalization
      .start()

  /** STREAMING exact deduplication by event id with bounded state:
    * `dropDuplicatesWithinWatermark` keeps each key only until the
    * watermark passes it, so state is bounded by the number of DISTINCT
    * keys inside the lateness window — the streaming twin of the batch
    * exact-dedup (first occurrence wins; an at-least-once ingest
    * upstream becomes exactly-once downstream as long as redeliveries
    * arrive within the watermark).
    */
  def dedupEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Per-user sessionization state. `open = true`: `sess` is the
    * ordinal of the currently-open session (matching the batch
    * q_events_sessions numbering) and the rest its running aggregate.
    * `open = false`: a TOMBSTONE left behind after an event-time
    * timeout flushed the open session — it carries only the last
    * emitted ordinal so a returning user's next session continues the
    * numbering instead of restarting at 0 (duplicate (user_id, sess)
    * keys otherwise). Tombstones are one tiny record per ever-seen
    * user, the same |users| bound the batch twin's groupBy pays.
    */
  case class SessState(sess: Long, startUs: Long, lastUs: Long,
                       n: Long, sum: Double, open: Boolean)

  /** One closed session — same columns/units as the batch
    * q_events_sessions twin.
    */
  case class SessionRow(user_id: Long, sess: Long, session_start_us: Long,
                        n_events: Long, value_micro: Long)

  /** STATEFUL streaming sessionization (gap windows) — the custom-state
    * path the batch window formulation cannot express incrementally:
    * `flatMapGroupsWithState` keyed by user holds the one open session
    * per user, closes it when a gap > `gapMinutes` arrives, and uses an
    * EVENT-TIME TIMEOUT to flush sessions whose gap has provably passed
    * (watermark > last event + gap) — so every session is eventually
    * emitted exactly once, even for users that simply stop sending,
    * and a flushed user leaves a tombstone carrying the last ordinal
    * so their next session continues the per-user numbering.
    *
    * Scale shape: state is one small fixed-size record per user key
    * (hash-distributed by the streaming state store) — open sessions
    * for active users plus ordinal tombstones for idle ones, i.e.
    * bounded by |ever-seen users|, the same bound the batch twin's
    * groupBy(user) pays; each micro-batch touches only the users
    * present in it plus timed-out keys.
    */
  def sessionize(spark: SparkSession, events: DataFrame,
                 gapMinutes: Int = 30,
                 watermark: String = "1 hour"): Dataset[SessionRow] = {
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val typed = events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[(Long, Long, java.sql.Timestamp, Double)]

    def closed(user: Long, s: SessState): SessionRow =
      SessionRow(user, s.sess, s.startUs, s.n, math.round(s.sum * 1e6))

    typed.groupByKey(_._1)
      .flatMapGroupsWithState[SessState, SessionRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user, it, state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            // watermark passed lastUs + gap: the open session is final.
            // Replace it with a tombstone (not remove) so the ordinal
            // survives the flush; no timeout is set on the tombstone.
            val out = state.getOption.filter(_.open).map { s =>
              state.update(s.copy(n = 0, sum = 0.0, open = false))
              closed(user, s)
            }.toSeq
            out.iterator
          } else {
            // fold this batch's events (in event-time order) into the
            // open session, emitting sessions closed by a gap
            val evs = it.toArray.map { case (_, eid, ts, v) =>
              (ts.getTime * 1000L, eid, v)
            }.sortBy(e => (e._1, e._2))
            var cur = state.getOption
            val out = Seq.newBuilder[SessionRow]
            evs.foreach { case (us, _, v) =>
              cur match {
                case Some(s) if s.open && us - s.lastUs <= gapUs =>
                  // a late-but-within-watermark event may precede the
                  // open session's first event: keep min as the start,
                  // matching the batch twin's min(us)
                  cur = Some(s.copy(startUs = math.min(s.startUs, us),
                    lastUs = math.max(s.lastUs, us),
                    n = s.n + 1, sum = s.sum + v))
                case Some(s) =>
                  // open session closed by this gap, or a tombstone:
                  // either way the next ordinal is s.sess + 1
                  if (s.open) out += closed(user, s)
                  cur = Some(SessState(s.sess + 1, us, us, 1, v, open = true))
                case None =>
                  cur = Some(SessState(0, us, us, 1, v, open = true))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // flush when the watermark proves no event can extend it
              if (s.open)
                state.setTimeoutTimestamp(s.lastUs / 1000L + gapUs / 1000L + 1L)
            }
            out.result().iterator
          }
      }
  }
}
