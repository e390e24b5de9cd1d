package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY.md §2-B "streaming" row): event-time
  * windows with watermarks, session windows, within-watermark dedup, and a
  * custom stateful sessionizer. Operators take the events schema
  * (ts timestamp, user_id bigint, event_type string, value double). The
  * window aggregations work identically on a readStream source or a batch
  * DataFrame (batch twins oracle-checked as q21/q22);
  * `sessionizeStateful` is STREAMING-ONLY — in a batch query
  * flatMapGroupsWithState never fires EventTimeTimeout, so still-open
  * sessions would be dropped (use the q21 gaps-and-islands form for batch).
  *
  * Scale notes: state size is bounded by the watermark horizon — late data
  * past the watermark is dropped, closed windows/sessions are evicted; state
  * is hash-partitioned by group key across executors.
  */
object StreamingOps {

  /** Tumbling event-time window counts with a watermark. Append mode emits
    * a window only once the watermark passes its end (late rows dropped).
    */
  def tumblingCounts(events: DataFrame, delay: String = "30 minutes",
      win: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), win), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding window variant. */
  def slidingCounts(events: DataFrame, delay: String = "30 minutes",
      win: String = "2 hours", slide: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), win, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))

  /** Built-in session windows: gap-based, merged by the engine. */
  def sessionCounts(events: DataFrame, delay: String = "30 minutes",
      gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"), col("user_id"), col("n_events"))

  /** Stream-static enrichment + windowed rollup — the OTHER canonical
    * streaming join: the dimension side is a bounded static frame
    * (re-read/broadcast per micro-batch, so dimension updates between
    * batches are picked up), the stream side carries the watermark, and
    * the rollup groups by (event-time window, dimension attribute). No
    * join state is kept at all — unlike a stream-stream join, a static
    * side needs no watermark bookkeeping — so this is the shape for
    * enriching a 100 TB/day event stream with a vocabulary-sized
    * dimension. Left join keeps unmatched events under a null attribute
    * (dropping them would silently under-count the stream). The value sum
    * follows the q22 decimal-then-double rule so the batch twin sits on
    * the exact-hash oracle gate.
    *
    * `dim` columns: (user_id, segment). Works identically on a batch
    * frame (the q103/q104 batch-twin convention — watermark is a no-op).
    */
  def enrichedTumblingCounts(events: DataFrame, dim: DataFrame,
      delay: String = "30 minutes", win: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", delay)
      .join(org.apache.spark.sql.functions.broadcast(dim), Seq("user_id"), "left")
      .groupBy(window(col("ts"), win), col("segment"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(9,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("win_start"), col("segment"),
        col("n"), col("sum_value"))

  /** Watermarked stream-stream interval join — the canonical streaming
    * enrichment: each left event joins right events for the same key whose
    * event time falls in [left.ts − lookback, left.ts]. Both sides carry
    * watermarks and the time-range predicate bounds the join state the
    * engine must keep (right rows older than the watermark + lookback are
    * evicted); without the range condition a stream-stream join would need
    * unbounded state. Inner join ⇒ append-mode output as matches finalize.
    *
    * Inputs share the events schema; the right side's columns are suffixed
    * `_r`. At scale the join is hash-partitioned on user_id with state on
    * both sides bounded by (watermark delay + lookback).
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
      delay: String = "30 minutes", lookback: String = "1 hour"): DataFrame = {
    val l = left.withWatermark("ts", delay)
    val r = right
      .select(right.columns.map(c => col(c).as(c + "_r")).toIndexedSeq: _*)
      .withWatermark("ts_r", delay)
    l.join(r,
      col("user_id") === col("user_id_r") &&
        col("ts_r") >= col("ts") - expr(s"INTERVAL $lookback") &&
        col("ts_r") <= col("ts"))
  }

  /** Exactly-once-style dedup bounded by the watermark: duplicates of
    * (user_id, event_type) arriving within the watermark horizon are
    * dropped; state for old keys is evicted as the watermark advances.
    */
  def dedupWithinWatermark(events: DataFrame, delay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  final case class Ev(user_id: Long, ts: Timestamp, event_type: String)
  final case class SessionOut(user_id: Long, sess_start: Timestamp,
      sess_end: Timestamp, n_events: Long)
  final case class SessState(start: Long, end: Long, n: Long)

  /** Custom stateful sessionizer via flatMapGroupsWithState: sessions close
    * when the event-time watermark passes last-event + gap (EventTimeTimeout
    * ⇒ state eviction is watermark-driven, never unbounded).
    */
  def sessionizeStateful(events: Dataset[Ev], gapMs: Long): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Ev], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, new Timestamp(s.start), new Timestamp(s.end), s.n))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                // merge when within gap of EITHER session edge: a late
                // arrival just before the session start must extend the
                // start, not silently inherit it
                case Some(s) if t >= s.start - gapMs && t <= s.end + gapMs =>
                  cur = Some(SessState(math.min(s.start, t), math.max(s.end, t), s.n + 1))
                case Some(s) =>
                  closed ::= SessionOut(userId, new Timestamp(s.start), new Timestamp(s.end), s.n)
                  cur = Some(SessState(t, t, 1))
                case None =>
                  cur = Some(SessState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
