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
  *    timeout — state is ONE open session per user (constant size, not
  *    the event list), closed sessions emit as soon as the watermark
  *    passes `last_event + gap`. This is the incremental form: a 100 TB
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

  /** Open-session state: constant-size per user. */
  final case class Open(startUs: Long, lastUs: Long, n: Long, sum: Double)

  private def closed(user: Long, o: Open): Session =
    Session(user, o.startUs, o.lastUs, o.n, o.sum)

  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000) % 1000

  /** Per-group transition: merge this batch's events (sorted — Spark
    * hands the iterator in arbitrary order) into the open session,
    * emitting every session closed by a gap; park the still-open tail in
    * state with an event-time timeout at `last + gap`. */
  private[streaming] def step(gapUs: Long)(
      user: Long, events: Iterator[(Long, java.sql.Timestamp, Double)],
      state: GroupState[Open]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator.single(closed(user, s))
    } else {
      val evs = events.map(e => (micros(e._2), e._3)).toArray.sortBy(_._1)
      val out = ArrayBuffer.empty[Session]
      var open = state.getOption
      for ((t, v) <- evs) open match {
        case Some(o) if t - o.lastUs > gapUs =>
          out += closed(user, o)
          open = Some(Open(t, t, 1, v))
        case Some(o) =>
          // late-but-within-watermark event: extends the session backward
          open = Some(Open(math.min(o.startUs, t), math.max(o.lastUs, t),
            o.n + 1, o.sum + v))
        case None =>
          open = Some(Open(t, t, 1, v))
      }
      open.foreach { o =>
        state.update(o)
        // Timeout must be strictly later than the current watermark (other
        // users' events may have pushed it past last+gap already); an
        // already-due session then closes on the very next batch.
        state.setTimeoutTimestamp(
          math.max(o.lastUs / 1000 + gapUs / 1000, state.getCurrentWatermarkMs + 1))
      }
      out.iterator
    }
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
