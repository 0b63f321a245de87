package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** The scan contract at 100 TB: predicates reach the parquet reader
  * (`PushedFilters`), projections shrink the read schema (`ReadSchema`),
  * and partition-column predicates prune directories before any I/O
  * (`PartitionFilters`). These are free with declarative plans — this
  * spec exists so a refactor that silently breaks them (e.g. a UDF
  * wrapping the filter column) fails loudly. */
class PushdownSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def fmt(d: DataFrame): String =
    d.queryExecution.explainString(FormattedMode)

  test("filters on Tables reads push into the parquet scan") {
    val plan = fmt(Tables(spark, sfDir, "lineitem")
      .filter(col("l_orderkey") < 100).select("l_orderkey", "l_quantity"))
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.matches("(?s).*PushedFilters:[^\\n]*LessThan\\(l_orderkey,100\\).*"), plan)
  }

  test("events' ts derivation does not block pushdown of source-column filters") {
    // Tables.events adds a derived ts column; a filter on a SOURCE
    // column must still reach the scan beneath the projection.
    val plan = fmt(Tables(spark, sfDir, "events").filter(col("user_id") < 5))
    assert(plan.matches("(?s).*PushedFilters:[^\\n]*LessThan\\(user_id,5\\).*"), plan)
  }

  test("projection prunes the read schema to the selected columns") {
    val plan = fmt(Tables(spark, sfDir, "lineitem")
      .groupBy("l_returnflag").agg(sum("l_quantity").as("q")))
    val readSchema = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(readSchema.contains("l_returnflag") && readSchema.contains("l_quantity"),
      readSchema)
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_extendedprice"),
      readSchema)
  }

  test("partition-column predicates prune partitions, not rows") {
    val dir = Files.createTempDirectory("graft-part").toString + "/t"
    df(Seq(("a", 1L), ("a", 2L), ("b", 3L)), "site", "v")
      .write.partitionBy("site").parquet(dir)
    val plan = fmt(spark.read.parquet(dir).filter(col("site") === "a"))
    assert(plan.matches("(?s).*PartitionFilters:[^\\n]*site[^\\n]*=[^\\n]*a.*"), plan)
    // the predicate is fully answered by pruning: nothing pushed to rows
    assert(!plan.matches("(?s).*PushedFilters:[^\\n]*site.*"), plan)
  }
}
