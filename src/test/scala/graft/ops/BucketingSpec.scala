package graft.ops

import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed joins must (a) plan without any Exchange — the write-time
  * shuffle replaces the run-time one — and (b) return exactly the plain
  * join's rows. */
class BucketingSpec extends SparkSpec {

  private def exchanges(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect { case e: Exchange => e }.size

  test("same-bucket-count join is exchange-free and result-identical") {
    val facts = df((1 to 200).map(i => (i.toLong % 40, s"f$i")), "k", "v")
    val dims = df((0 to 39).map(i => (i.toLong, s"d$i")), "k2", "w")
    Bucketing.writeBucketed(facts, "b_facts", "k", nBuckets = 4)
    Bucketing.writeBucketed(dims, "b_dims", "k2", nBuckets = 4)
    try {
      // AQE would wrap the plan stages; disable locally so the collected
      // executedPlan shows the static join shape being asserted.
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      // force SMJ: a broadcast join would hide the bucketing question
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "b_facts", "b_dims", "k", "k2")
      assert(exchanges(joined) === 0, joined.queryExecution.executedPlan.toString)

      val plain = facts.join(dims, col("k") === col("k2"))
      assert(exchanges(plain) > 0) // the shuffle bucketing removed
      assert(rowsOf(joined.select("k", "v", "w").orderBy("k", "v")) ===
        rowsOf(plain.select("k", "v", "w").orderBy("k", "v")))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }

  test("bucketed group-by on the bucket key also skips the exchange") {
    val facts = df((1 to 100).map(i => (i.toLong % 10, i.toLong)), "k", "v")
    Bucketing.writeBucketed(facts, "b_agg", "k", nBuckets = 4)
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val agg = spark.table("b_agg").groupBy("k").agg(sum("v").as("s"))
      assert(exchanges(agg) === 0, agg.queryExecution.executedPlan.toString)
      assert(rowsOf(agg.orderBy("k")) ===
        rowsOf(facts.groupBy("k").agg(sum("v").as("s")).orderBy("k")))
    } finally {
      spark.conf.unset("spark.sql.adaptive.enabled")
      spark.sql("DROP TABLE IF EXISTS b_agg")
    }
  }
}
