package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Unit semantics of the curation operators (their end-to-end hashes are
  * pinned by q58–q62; these cover the properties the oracles can't state
  * directly). */
class CurationSpec extends SparkSpec {

  test("decontaminate flags only docs sharing an n-gram with the benchmark") {
    val docs = df(Seq(
      (1L, "the quick brown fox jumps high"),
      (2L, "completely unrelated words entirely elsewhere"),
      (3L, "we say the quick brown again")), "doc_id", "text")
    val bench = df(Seq((100L, "the quick brown fox")), "doc_id", "text")
    val out = rowsOf(Curation.decontaminate(docs, bench, "doc_id", "text")
      .orderBy("doc_id"))
    // doc 1 shares "the quick brown" + "quick brown fox"; doc 3 shares
    // "the quick brown"; doc 2 is clean and must be absent
    assert(out === Seq(Seq(1L, 2L), Seq(3L, 1L)))
  }

  test("redactPii scrubs emails, phones, IPv4s and leaves clean text alone") {
    val d = df(Seq(
      (1L, "mail a.b+c@x-mail.org now"),
      (2L, "call 555-123-4567 or 555.123.4567"),
      (3L, "host 192.168.0.1 up"),
      (4L, "clean text with no identifiers")), "id", "t")
    val out = rowsOf(d.select(col("id"), Curation.redactPii(col("t")),
      Curation.piiCount(col("t"))).orderBy("id"))
    assert(out === Seq(
      Seq(1L, "mail <EMAIL> now", 1),
      Seq(2L, "call <PHONE> or <PHONE>", 2),
      Seq(3L, "host <IP> up", 1),
      Seq(4L, "clean text with no identifiers", 0)))
  }

  test("weightedSample: k per stratum, dominant weight always wins, deterministic") {
    val d = df((1L to 40L).map(i =>
      (i, if (i <= 20) "a" else "b", if (i == 7L) 1e9 else 1.0)),
      "id", "s", "w")
    val out = Curation.weightedSample(d, "id", "s", "w", k = 5)
    val byStratum = out.collect().groupBy(_.getString(1))
    assert(byStratum("a").length == 5 && byStratum("b").length == 5)
    // weight 1e9 vs 1: ln(u)/1e9 ~ 0⁻ beats every unit-weight key
    assert(byStratum("a").map(_.getLong(0)).contains(7L))
    // deterministic across partitionings
    val again = Curation.weightedSample(d.repartition(7), "id", "s", "w", k = 5)
    assert(out.collect().map(_.toSeq).toSet == again.collect().map(_.toSeq).toSet)
    // short stratum returns all its rows
    val small = Curation.weightedSample(d.filter(col("id") <= 3), "id", "s", "w", 5)
    assert(small.count() == 3)
  }

  test("weightedSample drops null and non-positive weights") {
    val d = df(Seq((1L, "a", java.lang.Double.valueOf(2.0)),
      (2L, "a", java.lang.Double.valueOf(0.0)),
      (3L, "a", java.lang.Double.valueOf(-1.0)),
      (4L, "a", null.asInstanceOf[java.lang.Double])), "id", "s", "w")
    val kept = Curation.weightedSample(d, "id", "s", "w", 10)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L))
  }

  test("stratifiedSample: fraction 1 keeps a stratum, 0/absent drops it, deterministic") {
    val d = df((1L to 100L).map(i => (i, if (i % 2 == 0) "a" else "b")),
      "id", "s")
    val all = Curation.stratifiedSample(d, "id", "s", Map("a" -> 1.0))
    assert(rowsOf(all).size === 50) // every "a", no "b" (absent stratum)
    assert(rowsOf(all.select("s").distinct()) === Seq(Seq("a")))
    val half = Curation.stratifiedSample(d, "id", "s", Map("a" -> 0.5, "b" -> 0.5))
    assert(rowsOf(half.orderBy("id")) === rowsOf(half.orderBy("id"))) // reproducible
    val n = rowsOf(half).size
    assert(n > 20 && n < 80, s"~half expected, got $n") // Bernoulli, loose bounds
  }

  test("curationFunnel: verdict precedence, funnel conservation, kept accounting") {
    // stopword filler TAGGED per doc family: quality-relevant stopwords
    // without cross-doc 3-gram overlap (contamination must come only
    // from the deliberately shared spans below)
    def filler(tag: String) =
      Seq("the", "and", "of", "to", "in", "is").map(w => s"$w $tag").mkString(" ")
    val docs = df(Seq(
      // 0 % 5 == 0: benchmark slice
      (0L, "src_a", s"benchmark golden eval sentence alignment ${filler("x")}"),
      // identical pair: 7 keeps (smaller id wins), 12 drops as near_dup
      (7L, "src_a", s"alpha beta gamma delta epsilon zeta eta theta ${filler("a")}"),
      (12L, "src_a", s"alpha beta gamma delta epsilon zeta eta theta ${filler("a")}"),
      // shares exactly 3 distinct 3-grams with benchmark doc 0
      (3L, "src_b", s"benchmark golden eval sentence alignment carried ${filler("b")}"),
      // short: under minTokens
      (4L, "src_b", "tiny junk row"),
      // clean keeper
      (6L, "src_b", s"unique prose nothing shared with others at all ${filler("c")}")),
      "doc_id", "source", "text")
    val out = rowsOf(Curation.curationFunnel(docs, "doc_id", "text", "source",
      benchMod = 5, minTokens = 5, minQuality = 0.0).orderBy("source"))
    // src_a: 3 docs = 1 bench + 1 near_dup + 1 kept (doc 7)
    // src_b: 3 docs = 1 contaminated + 1 low_quality + 1 kept (doc 6)
    assert(out.map(_.take(7)) === Seq(
      Seq("src_a", 3L, 1L, 1L, 0L, 0L, 1L),
      Seq("src_b", 3L, 0L, 0L, 1L, 1L, 1L)))
    // conservation: every doc lands in exactly one bucket
    out.foreach { r =>
      assert(r(1) === Seq(2, 3, 4, 5, 6).map(i => r(i).asInstanceOf[Long]).sum)
    }
  }

  test("packSequences: packs are contiguous start-offset windows per bucket") {
    val d = df((1L to 200L).map(i => (i, 37L + (i % 5) * 11L)), "id", "tok")
    val out = Curation.packSequences(d, "id", "tok", maxTokens = 100L, nBuckets = 4)
    assert(out.count() === 200) // nothing lost
    // per (bucket, pack): total tokens minus the straddling last doc
    // stays under maxTokens (start offsets all inside the pack window)
    val over = out.groupBy("bucket", "pack_no")
      .agg(sum("tok").as("tot"), max("tok").as("mx"))
      .filter(col("tot") - col("mx") >= 100L)
    assert(over.count() === 0)
    // pack numbering starts at 0 in every bucket
    val starts = rowsOf(out.groupBy("bucket").agg(min("pack_no")))
    assert(starts.forall(_(1) == 0L))
  }

  test("chunkDocs: overlapping windows, short tail, short doc = one chunk") {
    val d = df(Seq(
      (1L, "a b c d e f g h"), // 8 tokens, chunk 4 overlap 2 -> stride 2
      (2L, "x y")), "id", "t") // shorter than one chunk
    val out = rowsOf(Curation.chunkDocs(d, "id", "t", chunkTokens = 4, overlap = 2)
      .orderBy("id", "chunk_no"))
    assert(out === Seq(
      Seq(1L, 0L, "a b c d", 4L),
      Seq(1L, 1L, "c d e f", 4L),
      Seq(1L, 2L, "e f g h", 4L),
      Seq(2L, 0L, "x y", 2L)))
    intercept[IllegalArgumentException](
      Curation.chunkDocs(d, "id", "t", chunkTokens = 4, overlap = 4))
  }

  test("capSourceTokens: budget line per source, straddling doc kept, deterministic") {
    val d = df((1L to 40L).map(i => (i, if (i % 2 == 0) "a" else "b", 10L)),
      "id", "tok", "n")
    val capped = Curation.capSourceTokens(d, "id", "n", "tok", budget = 95L)
    // 20 docs x 10 tokens per source; budget 95 keeps exactly 10 (the
    // 10th starts at 90 < 95, the 11th at 100 >= 95)
    val bySrc = rowsOf(capped.groupBy("tok").count().orderBy("tok"))
    assert(bySrc === Seq(Seq("a", 10L), Seq("b", 10L)))
    assert(rowsOf(capped.orderBy("id")) === rowsOf(capped.orderBy("id")))
  }

  test("repetitionScore: 1 - distinct/total over bigram occurrences") {
    val d = df(Seq(
      (1L, "a a a b"),       // bigrams: "a a","a a","a b" -> 1 - 2/3
      (2L, "w x y z"),       // all distinct -> 0.0
      (3L, "only")), "id", "t") // < 2 tokens: no row
    val out = rowsOf(Curation.repetitionScore(d, "id", "t").orderBy("id"))
    assert(out === Seq(Seq(1L, 3L, 2L, 0.3333), Seq(2L, 3L, 3L, 0.0)))
  }

  test("cdcChunks: chunks reassemble exactly; an edit only re-chunks its neighborhood") {
    val base = ('a' to 'z').mkString * 40 // 1040 chars, expected ~16 chunks at divisor 64
    val edited = base.substring(0, 10) + "XYZ" + base.substring(10)
    // non-ASCII: byte-walking hash vs char-based cuts — boundaries
    // shift but reassembly must still hold (doc contract)
    val accented = "héllo wörld — " * 30
    val d = df(Seq((1L, base), (2L, edited), (3L, "tiny"), (4L, accented)),
      "id", "t")
    val out = Curation.cdcChunks(d, "id", "t", k = 8, divisor = 64)
    // chunks concatenate back to the original text, in chunk_no order
    val re = out.orderBy("id", "chunk_no")
      .groupBy("id").agg(concat_ws("", collect_list("chunk")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(re == Map(1L -> base, 2L -> edited, 3L -> "tiny", 4L -> accented))
    // insertion robustness: the tail chunks of the edited doc are the
    // SAME BYTES as the original's tail chunks (fixed windows would
    // shift every one of them)
    def chunks(id: Long) = out.filter(col("id") === id)
      .orderBy("chunk_no").collect().map(_.getString(2)).toSeq
    val (c1, c2) = (chunks(1L), chunks(2L))
    assert(c1.size > 3, s"expected several chunks, got ${c1.size}")
    assert(c1.takeRight(3) == c2.takeRight(3), "tail chunks must survive the edit")
    // short text: one whole-text chunk
    assert(chunks(3L) == Seq("tiny"))
  }

  test("deterministicShuffle: reproducible keys, batches partition the corpus") {
    val d = df((1L to 200L).map(Tuple1(_)), "id")
    val a = Curation.deterministicShuffle(d, "id", "ep0", 8)
    val b = Curation.deterministicShuffle(d, "id", "ep0", 8)
    assert(rowsOf(a.orderBy("id")) === rowsOf(b.orderBy("id")), "same seed, same order")
    // a different seed reshuffles (some key must differ)
    val c = Curation.deterministicShuffle(d, "id", "ep1", 8)
    assert(rowsOf(a.orderBy("id")) !== rowsOf(c.orderBy("id")))
    val batches = a.select("batch").distinct().collect().map(_.getInt(0)).toSet
    assert(batches.subsetOf((0 until 8).toSet) && batches.size > 1)
    assert(a.count() === 200L)
  }

  test("temperatureSample: alpha=1 keeps proportions, alpha=0 flattens, deterministic") {
    val d = df(
      (1L to 900L).map(i => (i, "big")) ++ (1001L to 1100L).map(i => (i, "small")),
      "id", "src")
    // alpha=1: fractions proportional to n -> equal keep fraction both strata
    val w1 = Curation.mixingWeights(d, "src", 1.0, 500L)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(math.abs(w1("big") - 0.5) < 1e-9 && math.abs(w1("small") - 0.5) < 1e-9)
    // alpha=0: uniform weights -> small stratum saturates at frac=1
    val w0 = Curation.mixingWeights(d, "src", 0.0, 500L)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(w0("small") == 1.0 && w0("big") < 0.3)
    // the sample itself is reproducible and respects the thresholds
    val s1 = rowsOf(Curation.temperatureSample(d, "id", "src", 0.5, 500L).orderBy("id"))
    val s2 = rowsOf(Curation.temperatureSample(d, "id", "src", 0.5, 500L).orderBy("id"))
    assert(s1 === s2 && s1.nonEmpty)
  }
}
