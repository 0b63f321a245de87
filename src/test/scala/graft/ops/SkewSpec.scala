package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewSpec extends SparkSpec {

  test("saltedJoin is result-identical to the plain inner join under skew") {
    // 90% of large-side rows carry key 1 (the hot key)
    val large = df((1 to 200).map(i => (if (i <= 180) 1L else i.toLong, s"v$i")),
      "k", "payload")
    val small = df(Seq((1L, "one"), (190L, "rare"), (999L, "unmatched")),
      "sk", "name")
    val salted = rowsOf(Skew.saltedJoin(large, small, "k", "sk", nSalts = 8)
      .orderBy("k", "payload"))
    val plain = rowsOf(large.join(small, col("k") === col("sk")).drop("sk")
      .orderBy("k", "payload"))
    assert(salted === plain)
    assert(salted.size === 181) // 180 hot + key 190
  }

  test("saltedJoin spreads a hot key across multiple salt buckets") {
    val large = df((1 to 100).map(i => (1L, s"v$i")), "k", "payload")
    val small = df(Seq((1L, "one")), "sk", "name")
    val salts = rowsOf(
      large.withColumn("__salt",
        pmod(xxhash64(large.columns.map(col).toIndexedSeq: _*), lit(8)))
        .select("__salt").distinct())
    assert(salts.size > 1, "identical key must still fan out via row hash")
  }
}
