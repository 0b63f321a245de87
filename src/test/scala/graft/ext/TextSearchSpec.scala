package graft.ext

import graft.SparkSpec

final case class Doc(doc_id: Long, text: String)

class TextSearchSpec extends SparkSpec {

  private val docs = Seq(
    Doc(1, "hash join hash join vector"),
    Doc(2, "hash join"),
    Doc(3, "vector vector vector"),
    Doc(4, "scan filter sort"),
    Doc(5, "hash join vector padding padding padding padding padding"))

  test("searchConjunctive returns exactly the docs containing ALL terms") {
    val hits = TextAnalysis.searchConjunctive(
        df(docs), "doc_id", "text", Seq("hash", "join", "vector"))
      .collect().map(_.getLong(0)).toSet
    assert(hits == Set(1L, 5L))
  }

  test("searchConjunctive single term reduces to containment") {
    val hits = TextAnalysis.searchConjunctive(
        df(docs), "doc_id", "text", Seq("vector"))
      .collect().map(_.getLong(0)).toSet
    assert(hits == Set(1L, 3L, 5L))
  }

  test("bm25 ranks full-match short docs above partial matches and long docs") {
    val out = TextAnalysis.bm25(df(docs), "doc_id", "text",
        Seq("hash", "join", "vector"), topK = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val byId = out.map(t => t._1 -> t._2).toMap
    // doc 1 matches all three terms with tf 2/2/1 in 5 tokens — best
    assert(out.head._1 == 1L)
    // doc 5 matches all three but is diluted by length (b·dl/avgdl)
    assert(byId(1L) > byId(5L))
    // doc 4 matches nothing — absent from results entirely
    assert(!byId.contains(4L))
    // n_terms_hit counts distinct matched terms
    assert(out.find(_._1 == 2L).get._3 == 2L)
  }
}
