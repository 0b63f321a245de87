package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling: per-column row/null/distinct counts in ONE scan —
  * the data-quality report every ingest pipeline fronts its lake with.
  *
  * All per-column aggregates land in a single `agg` so the input is
  * read once; the wide one-row result then unpivots (`stack`) to one
  * row per column. Exact mode uses `count_distinct` per column — each
  * distinct aggregate costs an Expand duplication of the scan rows, so
  * at corpus scale flip `exact = false` (`approx_count_distinct`,
  * single pass, no Expand, ~2% HLL error) — the same exact/approx
  * switch as [[Overview]] day counts and [[ApproxDistinct]].
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    require(cols.forall(df.columns.contains), {
      val missing = cols.filterNot(df.columns.contains)
      s"columns not in frame: ${missing.mkString(", ")}"
    })
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__dst_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', __cnt_$c, __dst_$c").mkString(", ")
    wide.selectExpr("__n",
        s"stack(${cols.size}, $stackArgs) AS (col_name, __cnt, n_distinct)")
      .select(col("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col("__cnt")).as("n_nulls"),
        col("n_distinct"))
  }
}
