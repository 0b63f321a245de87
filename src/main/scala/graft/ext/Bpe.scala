package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING as a distributed pipeline —
  * the Sennrich et al. 2016 algorithm (and the GPT-2/SentencePiece
  * discipline built on it) re-expressed Spark-first.
  *
  * The classic trick: symbols are single characters; a learned merge
  * replaces its two-character pair with a fresh single-character alias
  * from the Unicode private-use area, so "adjacent symbol pair" stays
  * "two adjacent chars" at every step and both counting (substr) and
  * merge application (literal replace, greedy left-to-right
  * non-overlapping — exactly BPE's application order) remain
  * codegen'd string built-ins. No UDF anywhere.
  *
  * Scale shape: training runs on the WORD-FREQUENCY table (corpus
  * tokens collapse to ~1e5–1e6 distinct words at any corpus size — the
  * standard BPE-training compression), so each merge step is one
  * map-side pair explode + one groupBy(pair) shuffle over the word
  * table, and the only driver traffic is the argmax pair (one row per
  * step). The full corpus is touched once at the start (word counts)
  * and never again.
  */
object Bpe {

  /** Lowercased alphabetic word frequencies — the training table.
    * One shuffle on word. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) >= 2 && col("w").rlike("^[a-z]+$"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Adjacent symbol-pair counts weighted by word frequency: for each
    * word the pairs are substr(w, i, 2) for i in 1..len-1 (every
    * symbol — original char or merge alias — is one char). Map-side
    * explode + one groupBy(pair). */
  def pairCounts(words: DataFrame): DataFrame =
    words
      // one-symbol words have no pairs; without the guard Spark's
      // sequence(1, 0) would count DOWN ([1,0]) instead of emptying
      .filter(length(col("w")) >= 2)
      .select(col("cnt"), explode(
        transform(sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy("pair").agg(sum("cnt").as("n"))

  /** The most frequent pair, ties broken lexicographically — BPE's
    * argmax step, deterministic across engines and partitionings. */
  def topPair(pairs: DataFrame): Option[(String, Long)] =
    pairs.orderBy(desc("n"), asc("pair")).limit(1)
      .collect().headOption.map(r => (r.getString(0), r.getLong(1)))

  /** Apply one merge: literal replace of the pair with its
    * single-char alias. Greedy left-to-right non-overlapping — the
    * BPE application order ("aaa" + merge "aa" -> alias+"a"). */
  def applyMerge(words: DataFrame, pair: String, alias: String): DataFrame =
    words.withColumn("w", replace(col("w"), lit(pair), lit(alias)))

  /** Alias for merge step i: Unicode private-use-area char — cannot
    * collide with the [a-z] training alphabet or earlier aliases. */
  def aliasFor(i: Int): String = (0xE000 + i).toChar.toString

  /** Learn `n` merges. Returns the merge table (pair -> alias, in
    * learn order) and the final symbolized word table. Each step
    * eagerly localCheckpoints its word table, so both the lineage and
    * the logical plan stay one step deep no matter how long the merge
    * list (a thousand chained replaces would otherwise drown the
    * analyzer before they touched any data). */
  def learnMerges(words: DataFrame, n: Int): (Seq[(String, String)], DataFrame) = {
    var cur = words.localCheckpoint()
    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var exhausted = false
    while (i < n && !exhausted) {
      topPair(pairCounts(cur)) match {
        case Some((pair, _)) =>
          val alias = aliasFor(i)
          merges += ((pair, alias))
          cur = applyMerge(cur, pair, alias).localCheckpoint()
          i += 1
        case None => exhausted = true // no two-symbol word left
      }
    }
    (merges.result(), cur)
  }

  /** Render a symbolized string back to real text by expanding merge
    * aliases (later merges may reference earlier aliases, so expand in
    * REVERSE learn order). Driver-side map, plan-side chained
    * replaces — usable on any token column. */
  def expandAliases(c: Column, merges: Seq[(String, String)]): Column =
    merges.reverse.foldLeft(c) { case (acc, (pair, alias)) =>
      replace(acc, lit(alias), lit(pair))
    }

  /** Tokenize a word column with a frozen merge table: apply merges in
    * learn order, split into symbols, expand each symbol back to its
    * surface string. Pure plan — chained codegen'd replaces + one
    * split, no per-row driver work. */
  def tokenize(wordCol: Column, merges: Seq[(String, String)]): Column = {
    val symbolized = merges.foldLeft(wordCol) { case (acc, (pair, alias)) =>
      replace(acc, lit(pair), lit(alias))
    }
    // split("") keeps a trailing empty token (Java split, limit -1)
    val symbols = filter(split(symbolized, ""), s => length(s) > 0)
    transform(symbols, s => expandAliases(s, merges))
  }
}
