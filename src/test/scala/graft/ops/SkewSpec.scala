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
    val salts = rowsOf(
      large.withColumn("__salt", Skew.saltExpr(large, 8))
        .select("__salt").distinct())
    assert(salts.size > 1, "identical key must still fan out via row hash")
  }

  test("BYTE-IDENTICAL duplicate rows fan out under spreadDuplicates") {
    // values-only hashing collapses these onto one reducer — the
    // canonical dedup-input skew case; the opt-in row-counter term
    // spreads them (input is a deterministic local relation, so the
    // spreading salt's recomputation-stability precondition holds)
    val large = df(Seq.fill(200)((1L, "x")), "k", "payload").repartition(1)
    val salts = rowsOf(
      large.withColumn("__salt", Skew.spreadingSaltExpr(large, 8))
        .select("__salt").distinct())
    assert(salts.size > 1, "identical ROWS must fan out via the id term")
  }

  test("default salt is deterministic across recomputation") {
    // retry-safety: recomputing the same rows must reproduce the same
    // salts (a non-deterministic salt in the shuffle key is the
    // SPARK-23207 lost/duplicated-rows class under partial retries)
    val large = df((1 to 50).map(i => (1L, s"v$i")), "k", "payload")
    val salted = large.withColumn("__salt", Skew.saltExpr(large, 8))
    assert(rowsOf(salted.orderBy("payload")) ===
      rowsOf(salted.orderBy("payload")))
    assert(rowsOf(salted.select("__salt").distinct()).size > 1)
  }

  test("saltedJoin with spreadDuplicates matches the plain join") {
    val large = df(Seq.fill(60)((7L, "dup")) ++ Seq((8L, "b")), "k", "payload")
      .localCheckpoint() // establish the spreading salt's precondition
    val small = df(Seq((7L, "seven"), (8L, "eight")), "sk", "name")
    val salted = rowsOf(Skew.saltedJoin(large, small, "k", "sk", nSalts = 4,
        spreadDuplicates = true).orderBy("k", "payload"))
    val plain = rowsOf(large.join(small, col("k") === col("sk")).drop("sk")
      .orderBy("k", "payload"))
    assert(salted === plain)
  }

  test("saltedJoin works when both keys share a name, keeping the key column") {
    val large = df(Seq((1L, "a"), (2L, "b")), "k", "payload")
    val small = df(Seq((1L, "one"), (2L, "two")), "k", "name")
    val out = Skew.saltedJoin(large, small, "k", "k", nSalts = 4)
    assert(out.columns.toSeq === Seq("k", "payload", "name"))
    assert(rowsOf(out.orderBy("k")) ===
      Seq(Seq(1L, "a", "one"), Seq(2L, "b", "two")))
  }
}
