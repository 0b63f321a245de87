package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FuzzyJoinSpec extends SparkSpec {

  private val names = Seq(
    "cold ring", "old ring",   // deletion of 'c'
    "red bolt", "red belt",    // substitution
    "gear", "gears",           // insertion at end
    "widget", "midget",        // substitution at start
    "anvil", "plate",          // far apart
    "ab")                      // below minLen: excluded entirely
    .map(Tuple1(_))

  private def naive = {
    val d = df(names, "s")
    val a = d.toDF("str_a"); val b = d.toDF("str_b")
    a.crossJoin(b)
      .filter(col("str_a") < col("str_b") &&
        length(col("str_a")) >= 3 && length(col("str_b")) >= 3)
      .filter(levenshtein(col("str_a"), col("str_b")) <= 1)
  }

  test("banded ED-1 join == all-pairs levenshtein twin") {
    val banded = Dedup.fuzzyPairsEd1(df(names, "s"), "s")
    assert(rowsOf(banded.orderBy("str_a", "str_b")) ===
      rowsOf(naive.orderBy("str_a", "str_b")))
    // and the fixture actually exercises all three edit kinds
    val pairs = rowsOf(banded).map(r => (r(0).toString, r(1).toString)).toSet
    assert(pairs == Set(
      ("cold ring", "old ring"), ("red belt", "red bolt"),
      ("gear", "gears"), ("midget", "widget")))
  }

  test("exact duplicates pair once; short strings drop via minLen") {
    val d = df(Seq("abc", "abc", "abx", "ab", "ab").map(Tuple1(_)), "s")
    val out = rowsOf(Dedup.fuzzyPairsEd1(d.distinct(), "s").orderBy("str_a"))
    // "ab" excluded (len < 3); distinct inputs "abc" vs "abx" pair once
    assert(out === Seq(Seq("abc", "abx")))
  }
}
