package graft.ops

import graft.SparkSpec

final case class PRow(a: java.lang.Long, b: String)

class ProfileSpec extends SparkSpec {

  private val data = Seq(
    PRow(1L, "x"), PRow(1L, "y"), PRow(null, "x"), PRow(3L, null), PRow(3L, "x"))

  test("row/null/distinct counts per column, nulls excluded from distinct") {
    val out = Profile.profile(df(data), Seq("a", "b"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("a") == ((5L, 1L, 2L))) // values {1, 3}
    assert(out("b") == ((5L, 1L, 2L))) // values {x, y}
  }

  test("approx mode stays within HLL tolerance on small cardinalities") {
    val out = Profile.profile(df(data), Seq("a"), exact = false)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out("a") == 2L) // HLL is exact at tiny cardinality
  }

  test("column names needing quoting (dots, spaces, hyphens) profile fine") {
    val weird = df(data).toDF("value.time", "site name-2")
    val out = Profile.profile(weird, Seq("value.time", "site name-2"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("value.time") == ((5L, 1L, 2L)))
    assert(out("site name-2") == ((5L, 1L, 2L)))
  }

  test("unknown columns fail fast with the offending names") {
    val e = intercept[IllegalArgumentException] {
      Profile.profile(df(data), Seq("a", "nope"))
    }
    assert(e.getMessage.contains("nope"))
  }
}
