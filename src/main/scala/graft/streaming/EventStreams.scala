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
  /** Per-user session state. `buf` holds events NOT yet finalized: an
    * event is folded into sessions only once the watermark passes it,
    * because only then is its position in the user's event-time order
    * final. Folding earlier (the pre-round-5 design) silently merged an
    * out-of-order event that preceded the open session's start by more
    * than the gap — the batch twin splits there. State cost: the open
    * session record plus the events inside the watermark window, the
    * inherent price of exact event-time sessionization.
    */
  case class SessState(sess: Long, startUs: Long, lastUs: Long,
                       n: Long, sum: Double, open: Boolean,
                       buf: Seq[(Long, Long, Double)])

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

    // One advance, used by both the data and the timeout branch:
    // buffer incoming events, FINALIZE (fold, in event-time order) only
    // those the watermark has passed — no later arrival can precede
    // them, so finalized events form one globally sorted stream and the
    // fold is EXACTLY the batch twin's sorted-lag computation. The open
    // session closes when a finalized gap follows it or when the
    // watermark proves nothing can extend it; a closed ordinal survives
    // as a tombstone (open = false) so a returning user keeps numbering.
    def advance(user: Long, incoming: Seq[(Long, Long, Double)],
                state: GroupState[SessState]): Iterator[SessionRow] = {
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      var cur = state.getOption
        .getOrElse(SessState(-1L, 0L, 0L, 0L, 0.0, open = false, Nil))
      // `buf` is maintained SORTED by (us, event_id) (round-5 advice):
      // only the incoming batch is sorted (O(i log i)), merged with the
      // sorted buffer in O(|buf| + i), and the finalized prefix splits
      // off already ordered — the old concat + partition + full re-sort
      // was O((|buf| + i) log(|buf| + i)) per trigger for a hot key.
      // Fold order is identical (same (us, event_id) total order).
      val incSorted = incoming.sortBy(e => (e._1, e._2)).toIndexedSeq
      val merged = {
        val b = cur.buf.toIndexedSeq; val n = b.length + incSorted.length
        val m = new scala.collection.mutable.ArrayBuffer[(Long, Long, Double)](n)
        var i = 0; var j = 0
        while (i < b.length && j < incSorted.length) {
          val x = b(i); val y = incSorted(j)
          if (x._1 < y._1 || (x._1 == y._1 && x._2 <= y._2)) { m += x; i += 1 }
          else { m += y; j += 1 }
        }
        while (i < b.length) { m += b(i); i += 1 }
        while (j < incSorted.length) { m += incSorted(j); j += 1 }
        m
      }
      val (fin, keep) = merged.span(_._1 < wmUs)
      val out = Seq.newBuilder[SessionRow]
      fin.foreach { case (us, _, v) =>
        // us >= cur.lastUs by construction: every already-finalized
        // event was below some earlier watermark, us is above it
        if (cur.open && us - cur.lastUs <= gapUs)
          cur = cur.copy(lastUs = us, n = cur.n + 1, sum = cur.sum + v)
        else {
          if (cur.open) out += closed(user, cur)
          cur = SessState(cur.sess + 1, us, us, 1L, v, open = true, Nil)
        }
      }
      if (cur.open && wmUs > cur.lastUs + gapUs) {
        // no future event (all >= wmUs) can merge: the session is final
        out += closed(user, cur)
        cur = cur.copy(n = 0L, sum = 0.0, open = false)
      }
      val next = cur.copy(buf = keep.toSeq)
      state.update(next)
      if (next.open || next.buf.nonEmpty) {
        // wake when the watermark can close the open session or
        // finalize the earliest buffered event, whichever is sooner
        val dueUs = (if (next.open) Seq(next.lastUs + gapUs) else Nil) ++
          next.buf.map(_._1)
        state.setTimeoutTimestamp(math.max(
          dueUs.min / 1000L + 1L, state.getCurrentWatermarkMs() + 1L))
      }
      out.result().iterator
    }

    typed.groupByKey(_._1)
      .flatMapGroupsWithState[SessState, SessionRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user, it, state: GroupState[SessState]) =>
          if (state.hasTimedOut) advance(user, Nil, state)
          else advance(user,
            it.map { case (_, eid, ts, v) =>
              (ts.getTime * 1000L, eid, v)
            }.toSeq, state)
      }
  }
}
