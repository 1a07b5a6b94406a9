package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch event operators: the reference's
  * producer/consumer queue (/root/reference/main.py:473-518) generalizes to
  * a stream of arriving search/event rows; Spark's native answer is
  * readStream -> transforms -> writeStream with watermarked event time.
  */
object StreamOps {

  /** Streaming twin of q14_events_hourly: tumbling 1-hour window with a
    * 2-hour watermark for late data. Works on any DataFrame with (ts:
    * timestamp, event_type, value) — batch or streaming. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  case class Ev(user_id: Long, ts_ms: Long)
  case class SessionState(sessionCount: Long, lastTsMs: Long)
  case class UserSessions(user_id: Long, n_sessions: Long)

  /** Stateful gap sessionization with mapGroupsWithState: per-user session
    * counter that increments when the inter-event gap exceeds `gapMs`.
    *
    * No state timeout here: ProcessingTimeTimeout makes the engine schedule
    * continuous empty micro-batches for timeout checks (each one a full
    * state-store checkpoint), which burns CPU and can keep
    * `processAllAvailable` from ever settling. At scale, bound state growth
    * with an event-time watermark + `flatMapGroupsWithState(EventTimeTimeout)`
    * instead — timeouts then fire only as the watermark advances. */
  def sessionCounts(events: Dataset[Ev], gapMs: Long = 30 * 60 * 1000L): Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, UserSessions](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Ev], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(_.ts_ms)
          var s = state.getOption.getOrElse(SessionState(0L, Long.MinValue))
          sorted.foreach { e =>
            s = if (s.lastTsMs == Long.MinValue || e.ts_ms - s.lastTsMs > gapMs)
              SessionState(s.sessionCount + 1, e.ts_ms)
            else s.copy(lastTsMs = e.ts_ms)
          }
          state.update(s)
          UserSessions(user, s.sessionCount)
      }
  }

  /** Convenience writer for tests/demos: stream to an in-memory sink. */
  def toMemorySink(df: DataFrame, name: String, mode: OutputMode = OutputMode.Update()) =
    df.writeStream.format("memory").queryName(name).outputMode(mode).start()
}
