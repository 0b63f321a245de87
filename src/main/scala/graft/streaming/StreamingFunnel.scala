package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.ops.Funnel]] — live conversion funnels
  * with exact batch semantics (earliest-STRICTLY-after stage times).
  *
  * Why a stage time can be emitted at all: t_i only ever DECREASES as
  * more events arrive, and any event that could lower a candidate
  * below the watermark would itself be below the watermark — i.e.
  * already dropped by the stream. So a candidate stage time strictly
  * under the current watermark is FINAL; everything newer stays
  * provisional in state.
  *
  * State per user is bounded: the frozen stage-time prefix (≤ nStages
  * longs) plus buffered (stage, ts) pairs no older than the watermark
  * horizon — and only for stages the funnel has not yet passed, since
  * a stage-s event with ts < watermark while t_(s-1) is still unknown
  * can never be used (any future t_(s-1) comes from events at or above
  * the watermark, which its timestamp can no longer exceed).
  */
object StreamingFunnel {

  /** One finalized funnel step: `stage` is 1-based in stage-list order. */
  final case class FunnelStep(user_id: Long, stage: Int, ts_us: Long)

  private[streaming] final case class FEvent(stage: Int, tsUs: Long)
  private[streaming] final case class FState(frozen: Seq[Long], buffer: Seq[FEvent])

  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000) % 1000

  private[streaming] def step(nStages: Int)(
      user: Long, events: Iterator[(Long, Int, java.sql.Timestamp)],
      state: GroupState[FState]): Iterator[FunnelStep] = {
    val wmUs = state.getCurrentWatermarkMs * 1000L
    val st = state.getOption.getOrElse(FState(Nil, Nil))
    var frozen = st.frozen.toVector
    var buf = st.buffer.toVector ++ events.map(e => FEvent(e._2, micros(e._3)))
    val out = ArrayBuffer.empty[FunnelStep]
    var progressed = true
    while (progressed && frozen.size < nStages) {
      val s = frozen.size + 1
      val lastT = frozen.lastOption.getOrElse(Long.MinValue)
      val cand = buf.collect { case e if e.stage == s && e.tsUs > lastT => e.tsUs }
      val t = if (cand.isEmpty) Long.MaxValue else cand.min
      if (t < wmUs) { frozen :+= t; out += FunnelStep(user, s, t) }
      else progressed = false
    }
    // below-watermark events were either just frozen into the prefix or
    // can never be used (see class doc); frozen stages need no events
    buf = buf.filter(e => e.stage > frozen.size && e.tsUs >= wmUs)
    if (frozen.size == nStages || (frozen.isEmpty && buf.isEmpty)) {
      state.remove()
    } else {
      state.update(FState(frozen, buf))
      if (buf.nonEmpty) {
        // earliest possible freeze = watermark passing the oldest
        // buffered candidate; CEIL to ms and stay strictly ahead of
        // the current watermark (same discipline as Sessionize.step)
        val nextMs = (buf.map(_.tsUs).min + 999) / 1000 + 1
        state.setTimeoutTimestamp(math.max(nextMs, state.getCurrentWatermarkMs + 1))
      }
    }
    out.iterator
  }

  /** Streaming funnel over (user_id, event_type, ts). Emits one
    * append-mode row per (user, stage) the moment the watermark proves
    * it final; a user's rows arrive in stage order across batches.
    * Watermark delay doubles as the out-of-order tolerance, exactly as
    * in [[Sessionize.streamSessions]]. */
  def streamFunnel(df: DataFrame, stages: Seq[String],
      lateness: String = "30 minutes"): Dataset[FunnelStep] = {
    require(stages.nonEmpty, "need at least one stage")
    import df.sparkSession.implicits._
    val stageIdx = stages.zipWithIndex
      .foldLeft(lit(0)) { case (acc, (st, i)) =>
        when(col("event_type") === st, i + 1).otherwise(acc) }
    // stage mapping and filter happen BEFORE the watermark so no
    // projection separates the watermarked attribute from the stateful
    // op (the Sessionize.streamSessions caveat)
    df.select(col("user_id").cast("long"), stageIdx.as("stage"),
        col("ts").cast("timestamp"))
      .filter(col("stage") > 0)
      .withWatermark("ts", lateness)
      .as[(Long, Int, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        step(stages.size))
  }
}
