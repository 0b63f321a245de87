package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StatsAggregatorSpec extends SparkSpec {

  test("one-pass aggregator == five built-in agg columns (incl. stddev_pop)") {
    val vals: Seq[(String, java.lang.Double)] = Seq(
      ("a", 1.0), ("a", 2.5), ("a", -3.0), ("a", null), ("a", 7.25),
      ("b", 42.0), ("c", null))
    val d = df(vals, "k", "v").repartition(4) // force partial+final merge
    val viaUdaf = d.groupBy("k")
      .agg(udaf(StatsAggregator).apply(col("v")).as("s"))
      .select(col("k"), col("s.count"), col("s.mean"), col("s.std_dev"),
        col("s.min"), col("s.max"))
      .orderBy("k").collect()
    val builtIn = d.groupBy("k")
      .agg(count(col("v")), avg("v"), stddev_pop(col("v")), min("v"), max("v"))
      .orderBy("k").collect()
    viaUdaf.zip(builtIn).foreach { case (u, b) =>
      assert(u.getString(0) === b.getString(0))
      assert(u.getLong(1) === b.getLong(1))
      (2 to 4).foreach { i =>
        (u.isNullAt(i), b.isNullAt(i)) match {
          case (true, true) =>
          case (false, false) => assert(math.abs(u.getDouble(i) - b.getDouble(i)) < 1e-9,
            s"col $i: ${u.getDouble(i)} vs ${b.getDouble(i)}")
          case other => fail(s"null mismatch at col $i for key ${u.getString(0)}: $other")
        }
      }
    }
    // all-null group 'c' -> count 0, null stats (compute_stats on empty list)
    val c = viaUdaf.find(_.getString(0) == "c").get
    assert(c.getLong(1) === 0L && c.isNullAt(2) && c.isNullAt(4))
  }

  test("typed Dataset usage: groupByKey + toColumn") {
    import spark.implicits._
    val ds = Seq(("a", 2.0), ("a", 4.0), ("b", 10.0)).toDS()
    val r = ds.groupByKey(_._1)
      .mapValues(t => java.lang.Double.valueOf(t._2))
      .agg(StatsAggregator.toColumn)
      .collect().toMap
    assert(r("a").mean === 3.0 && r("a").std_dev === 1.0 && r("b").count === 1L)
  }
}
