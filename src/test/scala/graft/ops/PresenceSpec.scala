package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** A14 + R1 (data_collection.py semantics, SURVEY.md §2.6-2.7). */
class PresenceSpec extends SparkSpec {

  private def events = df(Seq(
    ("p1", "hr", "2024-01-01 10:00:00"),
    ("p1", "hr", "2024-01-01 23:00:00"), // same day → one presence row
    ("p1", "steps", "2024-01-02 10:00:00"),
    ("p2", "hr", null.asInstanceOf[String])), // null time dropped
    "participant_id", "metric", "raw")
    .withColumn("ts", to_timestamp(col("raw")))

  test("presenceTable: distinct (keys, date) rows, null times dropped") {
    val d = Presence.presenceTable(events, Seq("participant_id", "metric"), col("ts"))
    assert(rowsOf(d) == Seq(
      Seq("p1", "hr", "2024-01-01"),
      Seq("p1", "steps", "2024-01-02")))
  }

  test("pivotMatrix: explicit value list, count agg, zero-fill") {
    val d = Presence.pivotMatrix(
      events.filter(col("ts").isNotNull),
      "participant_id", "metric", "ts", Seq("hr", "steps"))
    assert(d.columns.toSeq == Seq("participant_id", "hr", "steps"))
    assert(rowsOf(d) == Seq(Seq("p1", 2L, 1L)))
  }
}
