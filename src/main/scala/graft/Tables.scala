package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated TPC-H-ish testdata lake (TESTDATA.md).
  *
  * All queries in [[SparkEntry]] read through here so the physical source
  * (path layout, format) is swappable in one place. At cluster scale the
  * same API would point at a partitioned lake; filters and projections
  * still push down because these are plain parquet scans.
  *
  * `events.ts` is parquet TIMESTAMP(NANOS), which Spark has no native
  * type for (Spark timestamps are microsecond): it is read via the
  * `nanosAsLong` escape hatch and truncated to microseconds — exactly
  * what DuckDB does when it reads the same file (truncation, not
  * rounding — verified), so the oracle sees identical values. The cast
  * to TIMESTAMP_NTZ matches how Spark reads this lake's other (ms)
  * timestamp columns, keeping cross-table comparisons cast-free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts",
        timestamp_micros((col("ts") / 1000).cast("long")).cast("timestamp_ntz"))
  }
}
