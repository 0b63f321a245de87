package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CUSUM changepoint alarms — the live twin of the batch
  * closed form ([[graft.ext.TimeSeries.cusum]], q134). The batch side
  * rewrites Page's recursion S_t = max(0, S_{t−1} + z_t − k) as prefix
  * sums minus a running min because a recursive fold has no
  * declarative plan; STREAMING is where the recursion is natural: the
  * per-key state IS (S+, S−), two doubles, updated per event.
  *
  * Event-time correctness: the fold's order matters, so rows buffer in
  * state until the watermark passes them — a row folds only when no
  * admissible event can still precede it (ts < watermark; Spark drops
  * later-arriving rows below the watermark). State per key is the two
  * accumulators plus only the sub-watermark-delay buffer, never
  * history. An event-time timeout flushes buffered rows for keys the
  * stream has gone quiet on.
  *
  * `zCol` is the standardized deviation against FIXED reference
  * (mean, σ) — the textbook online-CUSUM setup: the reference comes
  * from a trained baseline (e.g. q134's moments over history), not
  * from the stream itself.
  */
object StreamingCusum {

  /** One threshold crossing: S (pos or neg side) exceeded `h` at tsu. */
  final case class Alarm(key: Long, tsu: Long, side: String, s: Double)

  /** Per-key state: the two CUSUM accumulators + not-yet-final rows. */
  final case class St(spos: Double, sneg: Double, pending: Seq[(Long, Double)])

  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000) % 1000

  private[streaming] def step(k: Double, h: Double)(
      key: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)],
      state: GroupState[St]): Iterator[Alarm] = {
    val wmUs = state.getCurrentWatermarkMs * 1000L
    val st = state.getOption.getOrElse(St(0.0, 0.0, Seq.empty))
    val all = (st.pending ++ rows.map(r => (micros(r._2), r._3)))
      .sortBy(identity) // (ts, z): total, deterministic fold order
    // ripe = strictly below the watermark: every event Spark will still
    // admit has ts >= wm, so nothing can precede a ripe row anymore
    val (ripe, hot) = all.partition(_._1 < wmUs)
    var sp = st.spos
    var sn = st.sneg
    val out = ArrayBuffer.empty[Alarm]
    for ((t, z) <- ripe) {
      sp = math.max(0.0, sp + (z - k))
      sn = math.max(0.0, sn + (-z - k))
      if (sp > h) out += Alarm(key, t, "pos", sp)
      if (sn > h) out += Alarm(key, t, "neg", sn)
    }
    if (hot.nonEmpty) {
      state.update(St(sp, sn, hot.toSeq))
      // flush when the watermark passes the earliest buffered row even
      // if this key never sees another event; CEIL to ms and keep it
      // strictly past the current watermark (else Spark rejects it)
      val nextMs = (hot.map(_._1).min + 999) / 1000
      state.setTimeoutTimestamp(math.max(nextMs, state.getCurrentWatermarkMs + 1))
    } else if (sp != 0.0 || sn != 0.0) {
      // accumulators persist without a timeout: nothing to flush, the
      // next event for this key resumes the fold
      state.update(St(sp, sn, Seq.empty))
    } else {
      state.remove()
    }
    out.iterator
  }

  /** Alarms over (key: long, ts: timestamp, z: double). Watermark
    * delay = out-of-order tolerance; an alarm emits exactly once, when
    * its row's position in the per-key fold is final. */
  def alarms(df: DataFrame, k: Double, h: Double,
      lateness: String = "30 minutes"): Dataset[Alarm] = {
    import df.sparkSession.implicits._
    df.select(col("key").cast("long"), col("ts").cast("timestamp"),
        col("z").cast("double"))
      .withWatermark("ts", lateness)
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        step(k, h))
  }
}
