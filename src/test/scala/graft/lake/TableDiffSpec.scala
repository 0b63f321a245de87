package graft.lake

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TableDiffSpec extends SparkSpec {

  private def t(rows: Seq[(String, Long, Long)]) =
    df(rows, "pt", "id", "v")

  test("identical tables: no changed partitions, empty diff") {
    val a = t(Seq(("p1", 1L, 10L), ("p1", 2L, 20L), ("p2", 3L, 30L)))
    assert(TableDiff.changedPartitions(a, a, Seq("pt")).count() === 0)
    assert(TableDiff.diff(a, a, Seq("pt"), Seq("id")).count() === 0)
  }

  test("classifies added / removed / changed; untouched partitions stay out") {
    val left = t(Seq(
      ("p1", 1L, 10L), ("p1", 2L, 20L), ("p2", 3L, 30L), ("p3", 9L, 90L)))
    val right = t(Seq(
      ("p1", 1L, 11L), // changed
      ("p1", 4L, 40L), // added (2 removed)
      ("p2", 3L, 30L), // untouched partition
      ("p3", 9L, 90L)))
    val changed = TableDiff.changedPartitions(left, right, Seq("pt"))
      .collect().map(_.getString(0)).toSet
    assert(changed === Set("p1"))
    val d = TableDiff.diff(left, right, Seq("pt"), Seq("id"))
      .orderBy("id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(d.toSeq === Seq(
      ("p1", 1L, "changed"), ("p1", 2L, "removed"), ("p1", 4L, "added")))
  }

  test("partition present on only one side surfaces whole") {
    val left = t(Seq(("p1", 1L, 10L)))
    val right = t(Seq(("p1", 1L, 10L), ("p9", 7L, 70L), ("p9", 8L, 80L)))
    val d = TableDiff.diff(left, right, Seq("pt"), Seq("id"))
    assert(d.filter(col("change") === "added").count() === 2)
    assert(d.count() === 2)
  }

  test("even-multiplicity edits: the row count breaks xor cancellation") {
    // two rows swap values — xor of row hashes is unchanged only if the
    // hash ignores the key pairing; here hashes include ids so the xor
    // differs, but ALSO test the count-only case: one row duplicated
    // on the right (same data twice → xor cancels to the single-row
    // value in a keyless world; count catches it regardless)
    val left = t(Seq(("p1", 1L, 10L)))
    val right = t(Seq(("p1", 1L, 10L), ("p1", 1L, 10L)))
    val changed = TableDiff.changedPartitions(left, right, Seq("pt"))
    assert(changed.count() === 1)
  }

  test("scoped scan prunes partition directories (static isin)") {
    val root = java.nio.file.Files.createTempDirectory("graft_diff_prune").toString
    t(Seq(("p1", 1L, 10L), ("p2", 2L, 20L), ("p3", 3L, 30L)))
      .write.partitionBy("pt").parquet(s"$root/l")
    t(Seq(("p1", 1L, 11L), ("p2", 2L, 20L), ("p3", 3L, 30L)))
      .write.partitionBy("pt").parquet(s"$root/r")
    val left = spark.read.parquet(s"$root/l")
    val right = spark.read.parquet(s"$root/r")
    val d = TableDiff.diff(left, right, Seq("pt"), Seq("id"))
    // only the drifted partition joins — PartitionFilters carry the
    // isin, so the row-join stage never lists p2/p3 files
    val scans = d.queryExecution.executedPlan.toString
      .split("\n").filter(_.contains("PartitionFilters"))
    assert(scans.nonEmpty && scans.forall(_.contains("p1")), scans.mkString("\n"))
    assert(d.collect().map(r => (r.getString(0), r.getString(2))).toSeq ===
      Seq(("p1", "changed")))
  }

  test("works over versioned snapshots") {
    val root = java.nio.file.Files.createTempDirectory("graft_diff").toString
    val lake = s"$root/lake"
    t(Seq(("p1", 1L, 10L), ("p2", 2L, 20L)))
      .write.partitionBy("pt").parquet(lake)
    Versioned.init(spark, lake)
    val batch = t(Seq(("p1", 1L, 99L), ("p1", 5L, 50L)))
      .withColumn("__delete", lit(false))
    val v1 = Versioned.mergeInto(spark, lake, batch, Seq("pt"), Seq("id"))
    val d = TableDiff.diff(
        Versioned.snapshot(spark, lake, 0),
        Versioned.snapshot(spark, lake, v1), Seq("pt"), Seq("id"))
      .collect().map(r => (r.getLong(1), r.getString(2))).toSet
    assert(d === Set((1L, "changed"), (5L, "added")))
  }
}
