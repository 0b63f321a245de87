package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier) per group — Börzsönyi et al. 2001's
  * operator: the points not dominated by any other (dominated =
  * another point is ≤ on the minimized axis AND ≥ on the maximized
  * axis, strictly better on at least one). "Cheapest-but-largest"
  * style queries.
  *
  * The naive definition is an all-pairs anti-join — quadratic, the
  * shape that dies at scale (and exactly what the DuckDB oracle runs,
  * making it a strong cross-algorithm check). The plan here is the
  * sort-based linear scan expressed as windows:
  *
  *   1. per distinct x keep only the max-y rows (same-x points with
  *      lower y are dominated) — one grouped aggregate;
  *   2. in x-ascending order, a surviving x must STRICTLY exceed the
  *      running max of y over all lower x (a lower-x point with y ≥
  *      yours dominates you) — one window pass;
  *   3. join back to recover every tied original row (equal points
  *      don't dominate each other and all belong to the skyline).
  *
  * Two shuffles on (group, x) + one window per group; no self-join of
  * the data with itself.
  */
object Skyline {

  /** Skyline of (`minCol` minimized, `maxCol` maximized) per
    * `groupCols`: the input rows that are Pareto-optimal. */
  def skyline2D(df: DataFrame, groupCols: Seq[String], minCol: String,
      maxCol: String): DataFrame = {
    val gs = groupCols.map(col)
    val perX = df.groupBy(gs :+ col(minCol): _*)
      .agg(max(col(maxCol)).as("__ymax"))
    val w = Window.partitionBy(gs: _*).orderBy(col(minCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val skyX = perX
      .withColumn("__prev", max(col("__ymax")).over(w))
      .filter(col("__prev").isNull || col("__ymax") > col("__prev"))
      .select(gs :+ col(minCol) :+ col("__ymax"): _*)
    df.join(skyX, groupCols :+ minCol)
      .filter(col(maxCol) === col("__ymax"))
      .drop("__ymax")
  }
}
