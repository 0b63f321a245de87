package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling: per-column row/null/distinct counts in ONE scan —
  * the data-quality report every ingest pipeline fronts its lake with.
  *
  * All per-column aggregates land in a single `agg` so the input is
  * read once; the wide one-row result then unpivots (explode over an
  * array of per-column structs) to one row per column. Exact mode uses
  * `count_distinct` per column — each distinct aggregate costs an
  * Expand duplication of the scan rows, so at corpus scale flip
  * `exact = false` (`approx_count_distinct`, single pass, no Expand,
  * ~2% HLL error) — the same exact/approx switch as [[Overview]] day
  * counts and [[ApproxDistinct]].
  */
object Profile {

  /** Backtick-quote a column name for the parsed-resolver path, so
    * names with dots/spaces/hyphens profile like any other (internal
    * backticks double, per the SQL escape). */
  private def quoted(c: String): String = "`" + c.replace("`", "``") + "`"

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    require(cols.forall(df.columns.contains), {
      val missing = cols.filterNot(df.columns.contains)
      s"columns not in frame: ${missing.mkString(", ")}"
    })
    // typed Column expressions throughout — no generated SQL text, so
    // no column name can break parsing
    val perCol = cols.map { c =>
      val v = col(quoted(c))
      struct(
        lit(c).as("col_name"),
        count(v).as("cnt"),
        (if (exact) countDistinct(v)
         else approx_count_distinct(v)).as("n_distinct"))
    }
    df.agg(count(lit(1)).as("__n"), array(perCol: _*).as("__cols"))
      .select(col("__n"), explode(col("__cols")).as("e"))
      .select(
        col("e.col_name").as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col("e.cnt")).as("n_nulls"),
        col("e.n_distinct").as("n_distinct"))
  }
}
