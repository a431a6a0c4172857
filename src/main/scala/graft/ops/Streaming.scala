package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Typed event row for the custom-state operators. */
case class StreamEvent(ts: java.sql.Timestamp, user_id: Long, event_type: String, value: Double)

/** Accumulated per-user state carried across micro-batches. */
case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

/** Structured Streaming surface (SURVEY §2C C8/C9/C10): the same
  * declarative expressions as the batch Pipeline windows, applied to an
  * unbounded `events` stream. The reference is batch-only; this is the
  * north-star streaming extension, mapped onto watermarks + event-time
  * windows + session windows (no DStreams, no custom state unless the
  * built-in operators can't express it).
  *
  * These builders take any DataFrame with the `events` schema
  * (ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE) — in
  * production a `readStream` source, in tests a MemoryStream. Batch/
  * streaming parity is exactly Spark's contract: `window()` and
  * `session_window()` are the same expressions Pipeline uses.
  *
  * Scale notes: state size is bounded by the watermark horizon — state
  * for windows older than (max event time - delay) is dropped. Keys are
  * (window, event_type) / (session, user) — the same partitioning story
  * as the batch operators.
  */
object Streaming {

  /** C10/C8 — tumbling hourly counts with a late-data watermark: events
    * later than `delay` behind the max seen event time are dropped. */
  def tumblingCounts(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  /** C9 streaming twin — sliding windows (1 h / 30 min) with watermark. */
  def slidingCounts(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("n"))

  /** Custom state the built-in windows can't express: per-user running
    * totals carried across micro-batches via
    * `KeyValueGroupedDataset.mapGroupsWithState` (the reference's
    * per-sample carry state, unbounded in time). State is one small
    * record per user — bounded by key cardinality, partitioned by the
    * grouping key like every other operator here. */
  def runningUserTotals(events: Dataset[StreamEvent]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (uid: Long, batch: Iterator[StreamEvent], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(uid, 0L, 0.0))
          var n = prev.n_events
          var total = prev.total_value
          batch.foreach { e => n += 1; total += e.value }
          val next = UserTotals(uid, n, total)
          state.update(next)
          next
      }
  }

  /** Stream-stream self-join: pair each purchase with the same user's
    * clicks from the preceding hour (time-bounded interval condition —
    * both watermarks bound the join state Spark retains). */
  def purchaseAttribution(events: DataFrame, delay: String = "10 minutes"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", delay)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", delay)
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("click_ts") >= col("purchase_ts") - expr("interval 1 hour") &&
        col("click_ts") <= col("purchase_ts"))
      .select(col("p_user").as("user_id"), col("purchase_ts"), col("click_ts"), col("value"))
  }

  /** C7 streaming twin — native session windows (30-min inactivity gap):
    * the stateful analog of the batch gaps-and-islands query. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("sw.start").as("session_start"), col("sw.end").as("session_end"),
        col("user_id"), col("n"))
}
