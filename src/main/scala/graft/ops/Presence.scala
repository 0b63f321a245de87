package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The `data_collection.py` semantics (SURVEY.md §2.6 A14, §2.7 R1):
  * a participant × date × metric presence long table, and its pivoted
  * heatmap matrix.
  */
object Presence {

  /** A14: distinct (groupCols..., date) presence rows
    * (`data_collection.py:101-123`). The reference appends one row per
    * (file, date-with-data); distinct-ing the long table gives the same
    * presence relation. */
  def presenceTable(df: DataFrame, groupCols: Seq[String], tsCol: Column): DataFrame =
    df.select(groupCols.map(col) :+ date_format(to_date(tsCol), "yyyy-MM-dd").as("date"): _*)
      .filter(col("date").isNotNull)
      .distinct()
      .orderBy((groupCols :+ "date").map(col): _*)

  /** R1: pivot_table(index=participant, columns=date, values=metric,
    * aggfunc='count', fill_value=0) (`data_collection.py:64-66`).
    *
    * `pivotValues` must be supplied (or pre-computed) so the plan is a
    * single pass; Spark's value-discovering pivot runs an extra distinct
    * job, which at 100 TB is a full extra scan.
    */
  def pivotMatrix(
      df: DataFrame,
      indexCol: String,
      pivotCol: String,
      valueCol: String,
      pivotValues: Seq[String]): DataFrame =
    df.groupBy(col(indexCol))
      .pivot(pivotCol, pivotValues)
      .agg(count(col(valueCol)))
      .na.fill(0)
      .orderBy(col(indexCol))
}
