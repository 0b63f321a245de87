package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BPE trainer: pair counting, greedy merge application, the learn
  * loop against a brute-force local reference, and tokenize
  * round-trips. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential in-memory BPE mirroring the distributed trainer's
    * symbol space exactly: words as symbolized strings (one char per
    * symbol, merges renamed to the same private-use aliases), pair
    * counts by sliding window, argmax with the same (count desc,
    * alias-space pair asc) tie-break, merges applied by Java's
    * literal replace (greedy left-to-right non-overlapping — the
    * identical semantics). The distributed counting/argmax/rewrite
    * must reproduce this sequential run step for step. */
  private def refLearn(words: Map[String, Long], n: Int): Seq[(String, String)] = {
    var syms = words
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    for (i <- 0 until n if !done) {
      val counts = scala.collection.mutable.Map.empty[String, Long]
      for ((w, c) <- syms; j <- 0 until w.length - 1)
        counts(w.substring(j, j + 2)) =
          counts.getOrElse(w.substring(j, j + 2), 0L) + c
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case (p, c) => (-c, p) }._1
        val alias = Bpe.aliasFor(i)
        merges += ((best, alias))
        syms = syms.map { case (w, c) => (w.replace(best, alias), c) }
      }
    }
    merges.result()
  }

  test("wordCounts keeps lowercase alphabetic words of length >= 2") {
    val docs = Seq((1L, "The cat CAT sat; x 42 on the mat"),
      (2L, "cat mat")).toDF("doc_id", "text")
    val got = Bpe.wordCounts(docs, "text").as[(String, Long)]
      .collect().toMap
    // "The"/"CAT" lowercase; "sat;" fails the alpha filter; "x" too short
    assert(got === Map("the" -> 2L, "cat" -> 3L, "on" -> 1L,
      "mat" -> 2L))
  }

  test("pairCounts weights pairs by word frequency") {
    val words = Seq(("abab", 3L), ("ba", 2L)).toDF("w", "cnt")
    val got = Bpe.pairCounts(words).as[(String, Long)].collect().toMap
    assert(got === Map("ab" -> 6L, "ba" -> 5L)) // abab: ab,ba,ab
  }

  test("applyMerge is greedy left-to-right non-overlapping") {
    val words = Seq(("aaa", 1L), ("aaaa", 1L)).toDF("w", "cnt")
    val got = Bpe.applyMerge(words, "aa", "X")
      .as[(String, Long)].collect().toMap.keySet
    assert(got === Set("Xa", "XX"))
  }

  test("learnMerges matches the brute-force reference, merges nest") {
    val freq = Map("lowest" -> 5L, "lower" -> 4L, "low" -> 7L,
      "newest" -> 6L, "newer" -> 3L, "wide" -> 2L, "widest" -> 2L)
    val words = freq.toSeq.toDF("w", "cnt")
    val (merges, fin) = Bpe.learnMerges(words, 6)
    assert(merges === refLearn(freq, 6))
    // the final word table still carries every word exactly once
    assert(fin.count() === freq.size)
  }

  test("tokenize round-trips and respects the merge table") {
    val freq = Seq(("low" , 5L), ("lowest", 3L), ("newest", 2L))
    val words = freq.toDF("w", "cnt")
    val (merges, _) = Bpe.learnMerges(words, 3)
    val toks = words.select(col("w"),
      Bpe.tokenize(col("w"), merges).as("toks"))
      .as[(String, Seq[String])].collect().toMap
    // tokens always reassemble the word
    toks.foreach { case (w, ts) => assert(ts.mkString === w) }
    // at least one multi-char token exists once merges are learned
    assert(toks.values.exists(_.exists(_.length > 1)))
    // and no token straddles a merge inconsistently: every token is
    // either a single char or a learned merge expansion
    val learned = merges.map { case (p, _) =>
      // expand nested aliases to surface text
      var s = p
      var changed = true
      while (changed) {
        val next = merges.foldLeft(s) { case (acc, (pp, aa)) =>
          acc.replace(aa, pp)
        }
        changed = next != s
        s = next
      }
      s
    }.toSet
    toks.values.flatten.foreach { t =>
      assert(t.length == 1 || learned.contains(t), s"unexpected token $t")
    }
  }
}
