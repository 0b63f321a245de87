package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

final case class GV(g: String, v: Double, id: Long)

class TopKAggregatorSpec extends SparkSpec {

  private val data = Seq(
    GV("a", 5.0, 1), GV("a", 9.0, 2), GV("a", 9.0, 3), GV("a", 1.0, 4),
    GV("a", 7.0, 5), GV("b", 2.0, 6), GV("b", 2.0, 7), GV("c", 4.0, 8))

  private def viaAgg(k: Int, parts: Int) =
    df(data).repartition(parts)
      .groupBy("g")
      .agg(TopKAggregator.topK(k, col("v"), col("id")).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).as("rank"),
        col("col.value").as("v"), col("col.tag").as("id"))
      .orderBy("g", "rank")

  private def viaWindow(k: Int) =
    df(data)
      .withColumn("rank", row_number().over(
        Window.partitionBy("g").orderBy(col("v").desc, col("id"))))
      .filter(col("rank") <= k)
      .select(col("g"), col("rank").cast("long").as("rank"), col("v"), col("id"))
      .orderBy("g", "rank")

  test("matches the window-function form, including ties and short groups") {
    for (k <- Seq(1, 2, 3, 10); parts <- Seq(1, 7)) {
      assert(rowsOf(viaAgg(k, parts)) == rowsOf(viaWindow(k)),
        s"mismatch at k=$k parts=$parts")
    }
  }

  test("ties break by tag ascending, deterministically across partitionings") {
    val top = rowsOf(viaAgg(2, 5)).filter(_.head == "a")
    // both 9.0 rows beat 7.0; id=2 outranks id=3
    assert(top == Seq(Seq("a", 1L, 9.0, 2L), Seq("a", 2L, 9.0, 3L)))
  }

  test("reduce keeps the buffer bounded at k") {
    val agg = new TopKAggregator(2)
    val full = (1 to 100).foldLeft(agg.zero)((b, i) =>
      agg.reduce(b, TopKInput(Some(i.toDouble), i.toLong)))
    assert(full == List(TopKEntry(100.0, 100L), TopKEntry(99.0, 99L)))
    // merge of two bounded buffers stays bounded and best-first
    val m = agg.merge(full, List(TopKEntry(150.0, 150L)))
    assert(m == List(TopKEntry(150.0, 150L), TopKEntry(100.0, 100L)))
  }

  test("null values are skipped, not a deserialization crash") {
    val withNulls = df(Seq(
        ("a", Some(5.0), 1L), ("a", None, 2L), ("a", Some(9.0), 3L),
        ("b", None, 4L)),
      "g", "v", "id")
    val out = rowsOf(withNulls.groupBy("g")
      .agg(TopKAggregator.topK(2, col("v"), col("id")).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("col.value"), col("col.tag"))
      .orderBy("g", "col.value"))
    // group b had only a null value: empty top-k, no row after explode
    assert(out == Seq(Seq("a", 5.0, 1L), Seq("a", 9.0, 3L)))
  }
}
