package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Typed event row for the custom-state operators. */
case class StreamEvent(ts: java.sql.Timestamp, user_id: Long, event_type: String, value: Double)

/** Accumulated per-user state carried across micro-batches. */
case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

/** A variant record arriving on the ingest stream (gVCF order). */
case class VarEvent(sample: String, contig: String, start: Long, end: Long, kind: String, gq: Int)

/** The carried per-(sample, contig) spanning block. */
case class BlockState(start: Long, end: Long, gq: Int)

/** A site call densified against the carried block state. `seq` is the
  * producer's event order (source offset / event timestamp): when the
  * same sample re-delivers a call for one site, the HIGHEST seq wins in
  * [[Streaming.streamingCombine]] regardless of which micro-batch each
  * copy lands in. Producers without an order leave the default 0 and
  * get latest-batch-wins (ties resolve by the (covered, gq) total
  * order within a batch, by batch recency across batches). */
case class FilledCall(sample: String, contig: String, pos: Long, covered: Boolean, gq: Int,
    seq: Long = 0L)

/** A combined per-site row re-emitted whenever any member call changes.
  * `ver` is a STRICTLY INCREASING per-site emission version: when a
  * batch advances the site's max [[FilledCall.seq]], ver == that max
  * seq — so for in-order producers, landing emissions in a
  * [[graft.sources.VariantStoreSink]] (`key, ver, payload` layout)
  * makes `VariantStore.readAsOf(t)` replay the combined cohort exactly
  * as it stood after the producer's seq-t events (StreamingSpec pins
  * this end to end). A batch that changes NO member call (a pure
  * duplicate delivery) emits nothing at all — a no-op emission would
  * consume a ver and shift every later seq-advancing emission off its
  * seq. A batch that changes content WITHOUT advancing the max seq (a
  * late sample arriving with a lower seq, or a zero-seq producer's
  * replacement) takes previous-ver + 1 instead: reusing an emitted ver
  * would put two rows at the same (key, ver) and leave the winner to
  * the store's content tiebreak — possibly the STALE emission. The
  * rewritten history becomes visible from the new ver on, which is the
  * honest semantics for late data (a site-level store cannot backdate
  * one sample's cell). First emission of a zero-seq producer is
  * ver 0. */
case class CombinedSite(contig: String, pos: Long, n_samples: Int, calls: String,
    ver: Long = 0L)

/** Per-site streaming-combine state: the latest (seq, rendered call)
  * per sample plus the last emitted version (kept so re-emissions can
  * never reuse a ver — see [[CombinedSite]]). */
case class SiteCombineState(calls: Map[String, (Long, String)], emittedVer: Long)

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
          // the group iterator's post-shuffle order is NOT guaranteed,
          // and double addition is order-sensitive in the low bits — sum
          // in a fixed total order so the carried state is bit-identical
          // across partitionings and re-runs (the project's determinism
          // doctrine; carryForwardFill sorts for the same reason)
          // null-tolerant sort key: ts/event_type are reference-typed, a
          // poison record with a NULL there must not NPE the sort — a
          // crashed task replays the same micro-batch from the
          // checkpoint and wedges the query forever on one bad record.
          // NULLs sort on an explicit null-flag component (strictly
          // after all real values), NOT a sentinel: Long.MinValue / ""
          // are legitimate field values, and aliasing them would quietly
          // turn the key back into a partial order (r20 advice item —
          // the fold only stayed deterministic because count/sum is
          // order-insensitive across equal keys)
          batch.toSeq.sortBy(e =>
              ((e.ts == null, if (e.ts == null) 0L else e.ts.getTime),
                (e.event_type == null,
                  if (e.event_type == null) "" else e.event_type),
                e.value))
            .foreach { e => n += 1; total += e.value }
          val next = UserTotals(uid, n, total)
          state.update(next)
          next
      }
  }

  /** Stream-stream self-join: pair each purchase with the same user's
    * clicks from the preceding hour (time-bounded interval condition —
    * both watermarks bound the join state Spark retains). */
  def purchaseAttribution(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    attribution(events, delay, "inner")

  /** One builder for both attribution variants — the window, watermark,
    * and join condition are the shared semantics; only the join type
    * (drop vs watermark-closed NULL clicks) differs. */
  private def attribution(events: DataFrame, delay: String, joinType: String): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", delay)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", delay)
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("click_ts") >= col("purchase_ts") - expr("interval 1 hour") &&
        col("click_ts") <= col("purchase_ts"),
      joinType)
      .select(col("p_user").as("user_id"), col("purchase_ts"), col("click_ts"), col("value"))
  }

  /** C1 streaming twin — exact dedup on the event identity with state
    * bounded by the watermark horizon: a duplicate arriving within
    * `delay` of the original is dropped; state for keys older than the
    * watermark is evicted (unlike plain `dropDuplicates`, whose state
    * grows forever on an unbounded stream). */
  def dedupWithinWatermark(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("user_id", "ts", "event_type")

  /** The reference's scan carry-state (SURVEY §3.2: per-sample "current
    * spanning block" held while iterating positions in order) as TRUE
    * streaming state: records arrive in genomic order per (sample,
    * contig); blocks update the carried state, sites densify against it
    * — covered = a spanning block exists, gq = the block's (else the
    * site's own). State is ONE small record per (sample, contig), the
    * same bound the reference's scanner holds in memory. */
  def carryForwardFill(vs: Dataset[VarEvent]): Dataset[FilledCall] = {
    import vs.sparkSession.implicits._
    vs.groupByKey(v => (v.sample, v.contig))
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (key: (String, String), batch: Iterator[VarEvent], state: GroupState[BlockState]) =>
          var cur = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[FilledCall]
          // blocks sort before sites at the same position, so a site is
          // always densified against the co-located block — the group
          // iterator's post-shuffle order is not otherwise guaranteed.
          // (end, gq) tiebreakers make the order TOTAL: two blocks
          // sharing a start would otherwise keep their nondeterministic
          // shuffle order (stable sort over an unstable input), and
          // whichever sorted last would win the carried state.
          batch.toSeq.sortBy(v =>
            (v.start, if (v.kind == "block") 0 else 1, v.end, v.gq)).foreach { v =>
            if (v.kind == "block") { cur = Some(BlockState(v.start, v.end, v.gq)) }
            else {
              val spanning = cur.filter(b => v.start >= b.start && v.start <= b.end)
              out += FilledCall(key._1, key._2, v.start,
                covered = spanning.isDefined, gq = spanning.map(_.gq).getOrElse(v.gq))
            }
          }
          cur.foreach(state.update)
          out.iterator
      }
  }

  /** The reference's combine-at-ingest as TRUE streaming state — the
    * streaming twin of the batch `q_combine_incremental`: densified site
    * calls ([[carryForwardFill]] output) arrive per sample; state per
    * (contig, pos) holds the LATEST call per sample (exactly the
    * reference's wide-row bound: one cell per sample per position), and
    * each micro-batch re-emits ONLY the sites it touched, with the full
    * re-combined call list. Adding sample N+1 therefore re-emits its
    * touched sites and never reads or writes any other site's state —
    * the bucket-pruned incremental property, expressed as a stream.
    *
    * Deliberately a SEPARATE query from [[carryForwardFill]] rather
    * than one chained pipeline: Spark disallows chained
    * flatMapGroupsWithState stages, and the two-stage shape is the
    * reference's own architecture — ingest densifies into the store,
    * combine happens from the store (SURVEY §3.1/§3.2). In production
    * the stages connect through the variant store / a log; in tests
    * through a MemoryStream of [[FilledCall]]s. */
  def streamingCombine(calls: Dataset[FilledCall]): Dataset[CombinedSite] = {
    import calls.sparkSession.implicits._
    calls.groupByKey(c => (c.contig, c.pos))
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (key: (String, Long), batch: Iterator[FilledCall],
         state: GroupState[SiteCombineState]) =>
          // The winner criterion is the SAME within and across batches —
          // highest `seq` first — so where a micro-batch boundary falls
          // cannot change the persisted state (a covered→uncovered
          // transition split across batches resolves identically to the
          // two events sharing one batch). Producers without a seq
          // (all-zero default) degrade to the previous semantics:
          // within a batch the (covered, gq) total order (the group
          // iterator's order is NOT guaranteed — never use arrival
          // position), across batches latest-batch-wins (seq ties let
          // the incoming batch replace stored state).
          val best = batch.toSeq
            .groupBy(_.sample)
            .map { case (smp, cs) =>
              // (seq, covered, gq) is a total order here: the rendered
              // call is a function of (covered, gq) alone, so any
              // remaining ties render identically
              val c = cs.maxBy(c => (c.seq, c.covered, c.gq))
              smp -> (c.seq, s"${c.sample}:${if (c.covered) "0/0" else "./."}:${c.gq}")
            }
          val prevState = state.getOption
          val prev = prevState.map(_.calls).getOrElse(Map.empty[String, (Long, String)])
          val upd = best.foldLeft(prev) { case (acc, (smp, cand)) =>
            acc.get(smp) match {
              case Some((storedSeq, _)) if storedSeq > cand._1 => acc // stored is newer
              case _ => acc + (smp -> cand) // newer seq, or tie → latest batch wins
            }
          }
          // No-op batches emit NOTHING: a duplicate delivery that
          // changes no member call must not consume an emission ver —
          // bumping past the max seq on a no-op would permanently shift
          // every later seq-advancing emission off its seq (ver 3 taken
          // by a re-delivered seq-2 state forces the real seq-3 event
          // to ver 4, breaking the readAsOf(t)-replays-seq-t contract
          // for an in-order producer that merely saw one duplicate).
          if (prevState.isDefined && upd == prev) Iterator.empty
          else {
            // strictly monotone emission ver (see CombinedSite doc): the
            // advanced max seq when the batch moved it, else previous+1
            // (a CONTENT change without a seq advance: late sample with
            // a lower seq, or a zero-seq producer's replacement)
            val maxSeq = upd.values.map(_._1).max
            val ver = prevState match {
              case Some(st) if maxSeq <= st.emittedVer => st.emittedVer + 1
              case _ => maxSeq
            }
            state.update(SiteCombineState(upd, ver))
            Iterator.single(CombinedSite(key._1, key._2, upd.size,
              upd.keys.toSeq.sorted.map(k => upd(k)._2).mkString(";"), ver))
          }
      }
  }

  /** Left-outer attribution: every purchase emits — joined to prior-hour
    * clicks when they exist, with NULL click columns materialized only
    * once the watermark proves no matching click can still arrive (the
    * semantically hard part of outer stream-stream joins: the null side
    * is a watermark-closed fact, not an absence-so-far). */
  def purchaseAttributionOuter(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    attribution(events, delay, "left_outer")

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
