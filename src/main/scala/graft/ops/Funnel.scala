package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-sequence (conversion funnel) analysis: for a stage list
  * (A, B, C, ...), a user reaches stage i+1 at the EARLIEST event of
  * that type strictly AFTER their stage-i time — the standard funnel
  * semantics engines express with MATCH_RECOGNIZE, built here from
  * cascaded min-aggregations.
  *
  * Shape: one equi-join + one groupBy per stage, all keyed on the user
  * — no per-user event arrays ever materialize (the collect_list
  * formulation holds a user's whole history in one row; this one holds
  * a single timestamp per stage), and every stage's input is
  * pre-filtered to its event type, so each shuffle carries only that
  * stage's rows. Drop-off is a null: once t_i is null every later
  * t_j is too (the join is inner on the previous stage).
  */
object Funnel {

  /** Per-user stage times: (userCol, t1..tN), t_i null once the user
    * dropped out before stage i. `tsCol` must be a totally-ordered
    * numeric/timestamp column; ties on it do NOT advance a funnel
    * (strictly-after semantics). */
  def stageTimes(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "need at least one stage")
    val s0 = df.filter(col(typeCol) === stages.head)
      .groupBy(userCol).agg(min(col(tsCol)).as("t1"))
    stages.tail.zipWithIndex.foldLeft(s0) { case (acc, (st, i)) =>
      val prev = s"t${i + 1}"; val next = s"t${i + 2}"
      val nxt = df.filter(col(typeCol) === st)
        .join(acc.select(col(userCol), col(prev)), Seq(userCol))
        .filter(col(tsCol) > col(prev))
        .groupBy(userCol).agg(min(col(tsCol)).as(next))
      acc.join(nxt, Seq(userCol), "left")
    }
  }
}
