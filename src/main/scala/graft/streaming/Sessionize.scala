package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization — the batch/streaming twin pair (SURVEY §7.4).
  *
  * The reference groups rows into per-day buckets only
  * (`extract_patient_summary.py:141-176`); sessions (maximal runs of
  * events where consecutive gaps stay under a threshold) are the natural
  * generalization a training-data pipeline needs (e.g. segmenting
  * interaction logs before per-session feature extraction).
  *
  * Two implementations with one contract:
  *
  *  - [[batch]]: lag-over-window session-start flags + a running sum to
  *    number sessions — pure window functions, SQL-expressible, so it
  *    carries a DuckDB oracle (q52). Scale shape: ONE shuffle on
  *    user_id; both windows and the final groupBy reuse that
  *    partitioning (no second exchange — the groupBy keys start with
  *    the partition key).
  *
  *  - [[streamSessions]]: `flatMapGroupsWithState` with event-time
  *    timeout — state holds bounded SESSION SUMMARIES per user (never
  *    raw events; one entry unless lateness exceeds the gap), and a
  *    session emits exactly once, when the watermark passes
  *    `end + gap` — the point where no admissible late event can extend,
  *    back-extend, or bridge it, so the append-mode output provably
  *    matches the batch twin. This is the incremental form: a 100 TB
  *    backlog replays through the same code that then tails the live
  *    stream.
  *
  * `SessionizeSpec` pins the two against each other on out-of-order
  * multi-batch input.
  *
  * All timestamps are epoch MICROSECONDS (longs): integer math survives
  * 2024-era epochs where double math loses ulps (see
  * [[graft.Tables.events]]), and both twins share the same gap
  * comparison exactly.
  */
object Sessionize {

  /** One emitted session. */
  final case class Session(
      user_id: Long, session_start_us: Long, session_end_us: Long,
      n_events: Long, sum_value: Double)

  /** Batch sessionization over (user_id: long, tsu: long epoch-micros,
    * value: double) plus `orderCol` as the deterministic tie-break for
    * equal timestamps. Output: one row per (user_id, session_no) with
    * micros bounds and per-session aggregates. */
  def batch(df: DataFrame, gapUs: Long, orderCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tsu", orderCol)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("new_sess",
        when(lag("tsu", 1).over(w).isNull ||
          col("tsu") - lag("tsu", 1).over(w) > gapUs, 1).otherwise(0))
      .withColumn("session_no", sum("new_sess").over(run))
      .groupBy("user_id", "session_no")
      .agg(
        min("tsu").as("session_start_us"),
        max("tsu").as("session_end_us"),
        count(lit(1)).as("n_events"),
        sum("value").as("sum_value"))
  }

  /** One not-yet-final session summary. */
  final case class Open(startUs: Long, lastUs: Long, n: Long, sum: Double)

  /** Per-user state: EVERY session some admissible late event could
    * still touch (extend forward, extend backward, or bridge into a
    * neighbor) — i.e. those with `end + gap >= watermark`. Normally one
    * entry; more only while lateness exceeds the session gap. */
  final case class Pending(sessions: Seq[Open])

  private def closed(user: Long, o: Open): Session =
    Session(user, o.startUs, o.lastUs, o.n, o.sum)

  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000) % 1000

  /** Per-group transition. Events and retained session summaries merge
    * by the SAME rule as the batch twin (attach when the start-to-end
    * gap is <= gapUs — an event can extend a session either direction or
    * bridge two); a session emits only once the watermark passes
    * `end + gap`, when no admissible event can change it anymore. Until
    * then it stays in state (summaries, never raw events), with an
    * event-time timeout at the earliest possible close. */
  private[streaming] def step(gapUs: Long)(
      user: Long, events: Iterator[(Long, java.sql.Timestamp, Double)],
      state: GroupState[Pending]): Iterator[Session] = {
    val wmUs = state.getCurrentWatermarkMs * 1000L
    val items = (state.getOption.map(_.sessions).getOrElse(Seq.empty) ++
        events.map(e => Open(micros(e._2), micros(e._2), 1L, e._3)))
      .sortBy(o => (o.startUs, o.lastUs))
    val merged = ArrayBuffer.empty[Open]
    for (it <- items) {
      if (merged.nonEmpty && it.startUs - merged.last.lastUs <= gapUs) {
        val l = merged.last
        merged(merged.size - 1) =
          Open(l.startUs, math.max(l.lastUs, it.lastUs), l.n + it.n, l.sum + it.sum)
      } else merged += it
    }
    // ripe = closed beyond any admissible event's reach; emit exactly once
    val (ripe, hot) = merged.partition(s => s.lastUs + gapUs < wmUs)
    if (hot.nonEmpty) {
      state.update(Pending(hot.toSeq))
      // earliest possible close, CEILed to ms (flooring could fire the
      // timeout while an on-time event at exactly last+gap is still
      // admissible); must also be strictly past the current watermark
      val nextMs = (hot.map(_.lastUs + gapUs).min + 999) / 1000
      state.setTimeoutTimestamp(math.max(nextMs, state.getCurrentWatermarkMs + 1))
    } else {
      state.remove()
    }
    ripe.iterator.map(closed(user, _))
  }

  /** Streaming twin over (user_id: long, ts: timestamp, value: double).
    * Watermark delay doubles as the out-of-order tolerance; a session
    * emits once the watermark passes its end by `gap`. */
  def streamSessions(df: DataFrame, gapUs: Long,
      lateness: String = "30 minutes"): Dataset[Session] = {
    import df.sparkSession.implicits._
    // No projection between the watermark and the stateful op: the
    // watermarked `ts` attribute must stay visible to groupByKey for the
    // event-time-timeout check; micros conversion happens inside `step`.
    df.select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("value").cast("double"))
      .withWatermark("ts", lateness)
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        step(gapUs))
  }
}
