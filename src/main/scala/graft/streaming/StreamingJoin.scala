package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the Structured Streaming
  * surface where BOTH sides are unbounded: match right-side events to
  * left-side events of the same key within `[l.ts, l.ts + window]`.
  *
  * Spark bounds the join state with exactly two pieces of information:
  * each side's watermark (how late events can be) and the time-range
  * condition (how far apart matching events can be). Left rows older
  * than `right watermark − window` and right rows older than the left
  * watermark can never match anything new, so the state store evicts
  * them — without the range condition a stream-stream join would
  * buffer both streams forever, which is why this helper REQUIRES it.
  *
  * Columns are prefixed (`l_`/`r_`) because both sides share names in
  * the common same-source case. Inner join: appends exactly the
  * matched pairs, each once. */
object StreamingJoin {

  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, windowSec: Long,
      lateness: String = "10 minutes"): DataFrame = {
    require(windowSec > 0, s"need windowSec > 0, got $windowSec")
    val l = left.select(col(keyCol).as("l_key"),
        col(tsCol).cast("timestamp").as("l_ts"))
      .withWatermark("l_ts", lateness)
    val r = right.select(col(keyCol).as("r_key"),
        col(tsCol).cast("timestamp").as("r_ts"))
      .withWatermark("r_ts", lateness)
    l.join(r,
      col("l_key") === col("r_key") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $windowSec SECONDS"))
  }
}
