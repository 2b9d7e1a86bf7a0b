package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A typed event row — the engine's streaming record (the Spark-native
  * generalization of the reference's Kafka (key, value, offset, ts)
  * record after payload parsing). */
final case class Ev(
    event_id: Long,
    ts: java.sql.Timestamp,
    user_id: Long,
    event_type: String,
    value: Double)

/** Per-user running totals carried in the state store. */
final case class UserTotals(user_id: Long, n_events: Long, sum_value: Double)

/** Streaming transforms (SURVEY §2.9). Every transform takes its source
  * DataFrame as a parameter, so the same code runs against:
  *  - MemoryStream (unit tests),
  *  - the rate source (local stand-in — no Kafka jar on this box),
  *  - the Kafka source ([[KafkaSource]], design-complete),
  *  - a plain batch DataFrame (the oracled batch twins in
  *    ops.TimeWindows — watermarks are a no-op in batch mode, which is
  *    exactly what makes twin-equivalence testable).
  *
  * Scale notes: windowed aggregations shuffle once on (window, key) and
  * keep state per open window in the executor state store; watermarks
  * bound that state (no watermark = unbounded state at 100 TB —
  * every transform here therefore takes one).
  */
object Streams {

  /** Tumbling event-time windows: counts + value sum per (window, type). */
  def tumbling(events: DataFrame, size: String = "10 minutes",
               watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), size), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Sliding windows (each event lands in size/slide windows). */
  def sliding(events: DataFrame, size: String = "10 minutes",
              slide: String = "5 minutes",
              watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), size, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Session windows per user, closed after `gap` of event-time silence. */
  def sessions(events: DataFrame, gap: String = "30 minutes",
               watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))

  /** At-least-once → effectively-once: drop replayed event_ids, keeping
    * dedup state only within the watermark horizon (bounded state — the
    * streaming half of the reference's offset-replay story). */
  def dedupWithinWatermark(events: DataFrame,
                           watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Custom state: per-user running totals via flatMapGroupsWithState
    * (the typed state-store API; state lives on executors, partitioned
    * by the group key — scales horizontally with user cardinality). */
  def userTotals(events: Dataset[Ev]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserTotals, UserTotals](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Ev], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(userId, 0L, 0.0))
          var n = prev.n_events
          var s = prev.sum_value
          rows.foreach { e => n += 1; s += e.value }
          val next = UserTotals(userId, n, s)
          state.update(next)
          Iterator.single(next)
      }
  }
}
