package graft.ext

import graft.SparkSpec

/** Prefix-filtered set-similarity join: the EXACTNESS claim (every
  * Jaccard ≥ τ pair found, nothing below τ emitted) pinned against an
  * all-pairs brute force on random corpora. */
class PrefixJoinSpec extends SparkSpec {

  private def shinglesOf(docs: Seq[(String, String)]) =
    Dedup.shingles(df(docs, "doc_id", "text"), "doc_id", "text", 3)

  private def brute(docs: Seq[(String, String)], tau: Double): Set[(String, String)] = {
    def set(t: String) = t.toLowerCase.split("\\s+").toSeq
      .sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val sets = docs.map { case (id, t) => id -> set(t) }.filter(_._2.nonEmpty)
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      j = (sa & sb).size.toDouble / (sa | sb).size
      if j >= tau
    } yield (ia, ib)).toSet
  }

  test("matches all-pairs brute force on a crafted corpus") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      "d1" -> base,
      "d2" -> base, // exact dup
      "d3" -> (base + " lambda"), // near dup
      "d4" -> "one two three four five six seven eight nine ten",
      "d5" -> "completely different words that share nothing at all here",
      "d6" -> "alpha beta gamma", // tiny: one shingle, subset of d1
      "d7" -> "short text") // < 3 tokens → no shingles
    for (tau <- Seq(0.5, 0.7, 0.9)) {
      val got = Dedup.prefixSimilarityJoin(shinglesOf(docs), "doc_id", tau)
        .select("id_a", "id_b").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(got === brute(docs, tau), s"tau=$tau")
    }
  }

  test("equals brute force on seeded random small corpora") {
    val rnd = new scala.util.Random(42)
    val words = Seq("aa", "bb", "cc", "dd", "ee", "ff")
    for (trial <- 1 to 8) {
      val docs = (0 until 2 + rnd.nextInt(7)).map { i =>
        val n = 3 + rnd.nextInt(6)
        (f"d$i%02d", Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" "))
      }
      val got = Dedup.prefixSimilarityJoin(shinglesOf(docs), "doc_id", 0.6)
        .select("id_a", "id_b").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(got === brute(docs, 0.6), s"trial $trial corpus $docs")
    }
  }

  test("reported similarity is the exact Jaccard in basis points") {
    // d1/d2 share 5 of 8 shingles on each side: |∩|=5, |∪|=11
    val docs = Seq(
      "d1" -> "a b c d e f g h i j",
      "d2" -> "a b c d e f g x y z")
    val rows = Dedup.prefixSimilarityJoin(shinglesOf(docs), "doc_id", 0.3)
      .collect()
    assert(rows.length === 1)
    val Array(r) = rows
    assert((r.getString(0), r.getString(1)) === ("d1", "d2"))
    assert(r.getLong(2) === math.round(10000.0 * 5 / 11))
  }
}
