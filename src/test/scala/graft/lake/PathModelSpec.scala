package graft.lake

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** S1-S3 path parsing + F1/F2 pruning (SURVEY.md §2.1, §2.3). */
class PathModelSpec extends SparkSpec {

  private val root = "/lake"
  private def inv(paths: String*) =
    df(paths.map(p => (p, 100L)), "path", "size")

  test("parsePaths extracts site/participant/metric + filename timestamp") {
    val d = PathModel.parsePaths(inv(
      "/lake/top/siteA/p001/heart_rate/20241017_0930.csv.gz",
      "/lake/top/siteB/p002/steps/sub/20240101_1200_3.csv.gz"), root)
      .select("site", "participant_id", "metric", "shard_idx")
      .orderBy("site")
    assert(rowsOf(d) == Seq(
      Seq("siteA", "p001", "heart_rate", null),
      Seq("siteB", "p002", "steps", 3)))
  }

  test("parsePaths drops short paths and unparseable timestamps (reference returns None)") {
    val d = PathModel.parsePaths(inv(
      "/lake/top/siteA/short.csv.gz",                      // <4 parts
      "/lake/top/siteA/p001/hr/nodate.csv.gz",             // no timestamp
      "/lake/top/siteA/p001/hr/20241332_9999.csv.gz",      // invalid date
      "/lake/top/siteA/p001/hr/20241017_0930.csv.gz"), root)
    assert(d.count() == 1)
  }

  test("includeExclude: exclude wins over include; include needs >=1 match") {
    val parsed = PathModel.parsePaths(inv(
      "/lake/top/siteA/p001/hr/20240101_0000.csv.gz",
      "/lake/top/siteB/p002/hr/20240101_0000.csv.gz",
      "/lake/top/siteC/p003/hr/20240101_0000.csv.gz"), root)
    val both = PathModel.includeExclude(parsed, Seq("siteA", "siteB"), Seq("siteB"))
    assert(rowsOf(both.select("site")) == Seq(Seq("siteA")))
    val exclOnly = PathModel.includeExclude(parsed, Nil, Seq("p003"))
    assert(exclOnly.count() == 2)
    val all = PathModel.includeExclude(parsed, Nil, Nil)
    assert(all.count() == 3)
  }

  test("includeBySubstring matches any path component substring") {
    val parsed = PathModel.parsePaths(inv(
      "/lake/top/siteA/p001/heart_rate/20240101_0000.csv.gz",
      "/lake/top/siteB/p002/steps/20240101_0000.csv.gz"), root)
    val d = PathModel.includeBySubstring(parsed, Seq("eart"))
    assert(rowsOf(d.select("metric")) == Seq(Seq("heart_rate")))
    assert(PathModel.includeBySubstring(parsed, Nil).count() == 2)
  }
}
