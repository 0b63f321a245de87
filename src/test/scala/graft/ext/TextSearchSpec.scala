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

  test("lmScore: corpus-frequent bigrams outscore rare ones; hand-check one doc") {
    val corpus = df(Seq(
      Doc(1, "a b a b"), Doc(2, "a b a b"), Doc(3, "a b c d"), Doc(4, "x y")))
    val out = TextAnalysis.lmScore(df(corpus.collect().map(r =>
        Doc(r.getLong(0), r.getString(1))).toSeq), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // "a b" appears 5x corpus-wide; docs made of it beat the rare-bigram docs
    assert(out(1L)._1 > out(3L)._1 && out(3L)._1 > out(4L)._1)
    assert(out(1L)._2 == 3L && out(4L)._2 == 1L)
    // hand check doc 4: V=6 distinct unigrams {a,b,c,d,x,y};
    // bigram (x,y): c12=1, c1(x)=1 → ln(2/7)
    assert(math.abs(out(4L)._1 - math.rint(math.log(2.0 / 7.0) * 10000) / 10000) < 1e-9)
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
