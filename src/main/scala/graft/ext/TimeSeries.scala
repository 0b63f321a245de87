package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling and smoothing — the pandas idioms the
  * reference leans on (`reindex`/`ffill`/`interpolate`/`ewm`)
  * re-expressed as distributed plans. Everything partitions by the
  * series key and orders by the date column: at 100 TB each series is
  * one window partition, state per partition is O(1) (fill) or one
  * bounded frame (ewma), and nothing collects to the driver.
  */
object TimeSeries {

  /** Complete per-key day grid spanning each key's [min(day), max(day)]
    * — the `reindex(date_range(...))` step. Input must carry one row
    * per (keys, day); output adds the missing days with null values
    * via a left join (one small shuffle on (keys, day)). */
  def dayGrid(daily: DataFrame, keys: Seq[String], dayCol: String): DataFrame = {
    val bounds = daily.groupBy(keys.map(col): _*)
      .agg(min(col(dayCol)).as("__lo"), max(col(dayCol)).as("__hi"))
    val grid = bounds.select(keys.map(col) :+
      explode(sequence(col("__lo"), col("__hi"))).as(dayCol): _*)
    grid.join(daily, keys :+ dayCol, "left")
  }

  /** Forward fill (`ffill`): each null takes the last non-null value
    * in day order. */
  def fillForward(gridded: DataFrame, keys: Seq[String], dayCol: String,
      valueCol: String, outCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gridded.withColumn(outCol,
      last(col(valueCol), ignoreNulls = true).over(w))
  }

  /** Linear interpolation (`interpolate(method='linear')`): each gap
    * is bracketed by its nearest observations via opposing ignoreNulls
    * windows; fill = prev + (next − prev) · elapsed/span. Rounded to
    * `scale` decimals so cross-engine oracles are stable. */
  def interpolateLinear(gridded: DataFrame, keys: Seq[String], dayCol: String,
      valueCol: String, outCol: String, scale: Int = 4): DataFrame = {
    val wPrev = Window.partitionBy(keys.map(col): _*).orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(keys.map(col): _*).orderBy(col(dayCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsDay = when(col(valueCol).isNotNull, col(dayCol))
    gridded
      .withColumn("__pv", last(col(valueCol), ignoreNulls = true).over(wPrev))
      .withColumn("__pd", last(obsDay, ignoreNulls = true).over(wPrev))
      .withColumn("__nv", first(col(valueCol), ignoreNulls = true).over(wNext))
      .withColumn("__nd", first(obsDay, ignoreNulls = true).over(wNext))
      .withColumn(outCol, round(
        when(col(valueCol).isNotNull, col(valueCol))
          .otherwise(col("__pv") + (col("__nv") - col("__pv")) *
            (datediff(col(dayCol), col("__pd")).cast("double") /
              datediff(col("__nd"), col("__pd")).cast("double"))), scale))
      .drop("__pv", "__pd", "__nv", "__nd")
  }

  /** Robust per-key outlier score — the Iglewicz–Hoaglin modified
    * z-score 0.6745·(x − median)/MAD, with MAD = median(|x − median|).
    * Median/MAD are exact rank statistics (no accumulation-order
    * noise), so the score is bit-reproducible across engines; a
    * zero-MAD key (constant series) yields null scores. Two grouped
    * medians + two key-equi-joins — three shuffles on the key, no
    * windows, no driver state. */
  def robustZ(df: DataFrame, keys: Seq[String], valueCol: String,
      outCol: String, scale: Int = 4): DataFrame = {
    val med = df.groupBy(keys.map(col): _*)
      .agg(median(col(valueCol)).as("__med"))
    val withMed = df.join(med, keys)
    val mad = withMed.groupBy(keys.map(col): _*)
      .agg(median(abs(col(valueCol) - col("__med"))).as("__mad"))
    withMed.join(mad, keys)
      .withColumn(outCol, round(
        lit(0.6745) * (col(valueCol) - col("__med")) /
          when(col("__mad") =!= 0.0, col("__mad")), scale))
      .drop("__med", "__mad")
  }

  /** One-sided CUSUM (Page 1954) in CLOSED form: the textbook
    * recursion S_t = max(0, S_{t−1} + (z_t − k)) equals
    * C_t − min(0, min_{j≤t} C_j) for the prefix sums C of (z − k) —
    * so the changepoint detector is two ordered-window passes
    * (running sum, then running min of it), a pure plan with no
    * recursion. `zCol` is the standardized deviation; `k` the
    * allowance (drift half-worth-detecting). Adds `outCol` = S_t.
    * Negative-side detection = call again with −z. */
  def cusum(df: DataFrame, keys: Seq[String], orderCol: String,
      zCol: String, k: Double, outCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__c", sum(col(zCol) - lit(k)).over(w))
      .withColumn(outCol,
        col("__c") - least(lit(0.0), min(col("__c")).over(w)))
      .drop("__c")
  }

  /** Impulse-response weight tables for [[holt]]: `(wS, wB)` where
    * `wS(t-1)(j-1)` is the coefficient of observation j in level s_t
    * (1-based t up to `maxLen`), obtained by running the Holt
    * recursion on coefficient vectors:
    *
    *   s_1 = y_1, b_1 = 0
    *   s_t = α·y_t + (1−α)·(s_{t−1} + b_{t−1})
    *   b_t = β·(s_t − s_{t−1}) + (1−β)·b_{t−1}
    *
    * The SAME doubles are rendered into the DuckDB oracle's literal
    * lists (AnalyticsQueries.holtOracle), so both engines evaluate the
    * identical closed form — the recursive smoother becomes a pure
    * plan with engine-exact parity, the q132 EWMA discipline extended
    * to a two-state recursion. */
  def holtWeights(alpha: Double, beta: Double,
      maxLen: Int): (Seq[Seq[Double]], Seq[Seq[Double]]) = {
    require(alpha > 0 && alpha <= 1 && beta >= 0 && beta <= 1,
      s"alpha in (0,1], beta in [0,1]; got $alpha, $beta")
    val ws = scala.collection.mutable.ArrayBuffer(Seq(1.0))
    val wb = scala.collection.mutable.ArrayBuffer(Seq(0.0))
    for (t <- 2 to maxLen) {
      val sPrev = ws.last :+ 0.0
      val bPrev = wb.last :+ 0.0
      val sCur = sPrev.indices.map { j =>
        val own = if (j == t - 1) alpha else 0.0
        own + (1.0 - alpha) * (sPrev(j) + bPrev(j))
      }
      val bCur = sPrev.indices.map { j =>
        beta * (sCur(j) - sPrev(j)) + (1.0 - beta) * bPrev(j)
      }
      ws += sCur
      wb += bCur
    }
    (ws.toSeq, wb.toSeq)
  }

  /** Holt double-exponential (linear-trend) smoothing + h-step-ahead
    * forecast, in closed form: level/trend at row t are weight-vector
    * dot products with the ordered prefix ([[holtWeights]]), folded by
    * codegen'd zip_with + aggregate over a windowed collect_list — no
    * UDF, no recursion, deterministic under any partitioning. Series
    * longer than `maxLen` fail loudly (per-key series are day-grids:
    * bounded by the calendar, not the corpus). */
  def holt(df: DataFrame, keys: Seq[String], dayCol: String,
      valueCol: String, alpha: Double, beta: Double, horizon: Int,
      maxLen: Int = 64, scale: Int = 4): DataFrame = {
    val (wsT, wbT) = holtWeights(alpha, beta, maxLen)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def dot(pfx: Column, table: Column) = {
      val weights = element_at(table, size(pfx))
      aggregate(zip_with(pfx, weights, (x, wt) => x * wt),
        lit(0.0), (acc, x) => acc + x)
    }
    df.withColumn("__pfx", collect_list(col(valueCol)).over(w))
      .withColumn("__lvl", {
        val guard = when(size(col("__pfx")) > maxLen,
          raise_error(lit(s"holt: series longer than maxLen=$maxLen")))
        coalesce(guard, dot(col("__pfx"), typedLit(wsT)))
      })
      .withColumn("__trd", dot(col("__pfx"), typedLit(wbT)))
      .withColumn("level", round(col("__lvl"), scale))
      .withColumn("forecast",
        round(col("__lvl") + lit(horizon.toDouble) * col("__trd"), scale))
      .drop("__pfx", "__lvl", "__trd")
  }

  /** Exponentially weighted moving average — pandas
    * `ewm(alpha).mean()` (adjust=true) in CLOSED form: at row t,
    * ewma = Σᵢ (1−α)^(t−i)·xᵢ / Σᵢ (1−α)^(t−i) over the ordered
    * prefix. The prefix is a windowed collect_list folded by
    * codegen'd higher-order functions (transform + aggregate) — no
    * UDF, no recursion, deterministic under any partitioning because
    * the window order fixes the fold order. Frame cost is O(len²) per
    * series, the standard trade for expressing a recursive smoother
    * as a pure plan; per-key series lengths (days) stay far below
    * task size at any corpus scale. */
  def ewma(df: DataFrame, keys: Seq[String], dayCol: String,
      valueCol: String, alpha: Double, outCol: String,
      scale: Int = 4): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val beta = 1.0 - alpha
    val prefix = collect_list(col(valueCol)).over(w)
    df.withColumn("__pfx", prefix)
      .withColumn(outCol, {
        val n = size(col("__pfx"))
        val weighted = transform(col("__pfx"),
          (x, i) => x * pow(lit(beta), (n - 1 - i).cast("double")))
        val weights = transform(col("__pfx"),
          (_, i) => pow(lit(beta), (n - 1 - i).cast("double")))
        def total(a: Column) =
          aggregate(a, lit(0.0), (acc, x) => acc + x)
        round(total(weighted) / total(weights), scale)
      })
      .drop("__pfx")
  }
}
