package graft.props

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.TestSpark
import graft.ext.Curation
import graft.ops.{MergeData, Overview, Skew, SummaryOps, TimeOps}

/** The property-based tests promised by SURVEY.md §5.4. Each property
  * batches its sample into ONE DataFrame per evaluation, and the suite
  * caps evaluations so `sbt test` stays fast. */
object PipelineProps extends Properties("graft.pipeline") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ------------------------------------------------------------------
  // U1: unionDrift preserves the row multiset and NaN-fills drift
  // (pandas concat semantics, merge-data.py:90).
  // ------------------------------------------------------------------

  private val abGen = Gen.listOf(Gen.zip(Gen.alphaStr.map(_.take(4)), Gen.choose(-100, 100)))

  property("unionDrift multiset preservation + null fill") =
    forAll(abGen, abGen) { (xs, ys) =>
      // NB name drift only: TYPE drift is out of unionByName's scope —
      // Spark requires explicit casts where pandas object-upcasts
      // (SURVEY.md §7.6.3), so the shared column is string on both sides.
      val d1 = xs.map { case (a, b) => (a, b.toString) }.toDF("a", "b")
      val d2 = ys.toDF("b", "c") // drift: shares only column b
      val u = MergeData.unionDrift(Seq(d1, d2))
      val bVals = u.select("b").collect().map(_.get(0)).toSeq
      val expectB = xs.map(_._2.toString) ++ ys.map(_._1)
      u.count() == (xs.size + ys.size).toLong &&
        u.columns.toSet == Set("a", "b", "c") &&
        u.filter(col("a").isNull).count() == ys.size.toLong &&
        u.filter(col("c").isNull).count() == xs.size.toLong &&
        bVals.map(String.valueOf).sorted == expectB.map(String.valueOf).sorted
    }

  // ------------------------------------------------------------------
  // A2: partial stats merged like accumulate_stats == one-pass stats
  // (process-overview.py:168-194).
  // ------------------------------------------------------------------

  private val statsGen = Gen.nonEmptyListOf(Gen.zip(
    Gen.oneOf("k1", "k2", "k3"),
    Gen.choose(1700000000L, 1700000000L + 40L * 86400)))

  property("Overview.stats == reference partial+final merge") =
    forAll(statsGen) { rows =>
      val d = rows.toDF("k", "secs").withColumn("ts", timestamp_seconds(col("secs")))
      val full = Overview.stats(d, Seq("k"), col("ts"))
        .collect().map(r => (r.getString(0),
          (r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))).toMap
      // driver-side partial+final merge, chunked like per-file accumulation
      val merged = rows.grouped(math.max(1, rows.size / 3)).toSeq
        .flatMap(_.groupBy(_._1).map { case (k, grp) =>
          val days = grp.map(t => java.time.LocalDate.ofEpochDay(
            Math.floorDiv(t._2, 86400L)).toString).toSet
          (k, (grp.size.toLong, days.min, days.max, days))
        })
        .groupBy(_._1).map { case (k, parts) =>
          val ds = parts.map(_._2._4).reduce(_ ++ _)
          (k, (parts.map(_._2._1).sum, ds.min, ds.max, ds.size.toLong))
        }
      full == merged
    }

  // ------------------------------------------------------------------
  // W1/W2: unpivot row count == rows x complete column pairs.
  // ------------------------------------------------------------------

  private val unpivotGen = Gen.zip(Gen.choose(1, 4), Gen.choose(0, 12), Gen.oneOf(true, false))

  property("answersUnpivot row count == rows x complete pairs") =
    forAll(unpivotGen) { case (nPairs, nRows, orphan) =>
      val pairCols = (0 until nPairs).flatMap(i => Seq(
        StructField(s"value.answers.$i.questionId", StringType),
        StructField(s"value.answers.$i.value", StringType)))
      val orphanCol =
        if (orphan) Seq(StructField(s"value.answers.$nPairs.questionId", StringType)) else Nil
      val schema = StructType(StructField("participant_id", StringType) +: pairCols ++: orphanCol)
      val rows = (0 until nRows).map { r =>
        Row.fromSeq(s"p$r" +: (0 until nPairs).flatMap(i => Seq(s"q$i", s"v$r-$i"))
          ++: (if (orphan) Seq("orphan") else Nil))
      }
      val d = spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
      SummaryOps.answersUnpivot(d, "value.answers", "value").count() == (nRows * nPairs).toLong
    }

  // ------------------------------------------------------------------
  // Skew: saltedJoin is result-equivalent to the plain inner join,
  // including duplicate keys on BOTH sides and a deliberately hot key.
  // ------------------------------------------------------------------

  private val joinGen = Gen.zip(
    Gen.listOf(Gen.zip(Gen.oneOf("hot", "hot", "k1", "k2", "k3"), Gen.choose(0, 100))),
    Gen.nonEmptyListOf(Gen.zip(Gen.oneOf("hot", "k1", "k2", "k4"), Gen.choose(0, 100))),
    Gen.choose(2, 8))

  property("saltedJoin == plain inner join (multiset)") =
    forAll(joinGen) { case (ls, ss, nSalts) =>
      val large = ls.toDF("k", "v")
      val small = ss.toDF("k2", "w")
      val salted = Skew.saltedJoin(large, small, "k", "k2", nSalts)
        .select("k", "v", "w").collect().map(_.toSeq)
      val plain = large.join(small, col("k") === col("k2"))
        .select("k", "v", "w").collect().map(_.toSeq)
      salted.sortBy(_.mkString("|")).toSeq == plain.sortBy(_.mkString("|")).toSeq
    }

  // ------------------------------------------------------------------
  // P3: isoWeekKey == java.time ISO week-based calendar.
  // ------------------------------------------------------------------

  private val datesGen = Gen.nonEmptyListOf(Gen.choose(-3650L, 25000L)) // ~1960..2038

  property("isoWeekKey matches java.time IsoFields") =
    forAll(datesGen) { epochDays =>
      val d = epochDays.toDF("ed")
        .withColumn("d", date_from_unix_date(col("ed").cast("int")))
        .withColumn("wk", TimeOps.isoWeekKey(col("d")))
      val got = d.select("ed", "wk").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val expect = epochDays.distinct.map { ed =>
        val ld = java.time.LocalDate.ofEpochDay(ed)
        val y = ld.get(java.time.temporal.IsoFields.WEEK_BASED_YEAR)
        val w = ld.get(java.time.temporal.IsoFields.WEEK_OF_WEEK_BASED_YEAR)
        ed -> f"$y%d-W$w%02d"
      }.toMap
      got == expect
    }

  // ------------------------------------------------------------------
  // Winnowing: the native rolling-hash expression is bit-identical to
  // the composed HOF pipeline — including sub-k docs (no rows), sub-w
  // gram counts (single minimum), repeats, and punctuation that the
  // shared normalizer strips.
  // ------------------------------------------------------------------

  private val docGen = Gen.listOf(Gen.frequency(
    (8, Gen.alphaNumChar), (2, Gen.oneOf(' ', '.', ',', '!', 'é'))))
    .map(_.mkString)

  // ------------------------------------------------------------------
  // Sessionize.batch is a partition of the input into maximal runs:
  // every event lands in exactly one session, intra-session order gaps
  // never exceed the threshold, and consecutive sessions of a user are
  // separated by MORE than the threshold (maximality).
  // ------------------------------------------------------------------

  private val gapUs = 1000L
  private val eventsGen = Gen.nonEmptyListOf(Gen.zip(
    Gen.choose(0L, 3L), Gen.choose(0L, 20000L)))

  property("sessionize partitions events into maximal gap-bounded runs") =
    forAll(eventsGen) { evs =>
      val d = evs.distinct.map { case (u, t) => (u, t, 1.0) }.toDF("user_id", "tsu", "value")
      val sess = graft.streaming.Sessionize.batch(d, gapUs, orderCol = "tsu")
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      val byUser = evs.distinct.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      val counted = sess.map(_._4).sum == evs.distinct.size.toLong
      val bounds = sess.forall { case (u, s, e, _) =>
        val inSess = byUser(u).filter(t => t >= s && t <= e)
        // session endpoints are real events and internal gaps stay bounded
        inSess.headOption.contains(s) && inSess.lastOption.contains(e) &&
          inSess.sliding(2).forall { w => w.size < 2 || w(1) - w(0) <= gapUs }
      }
      val maximal = sess.groupBy(_._1).forall { case (_, ss) =>
        ss.sortBy(_._2).sliding(2).forall { w =>
          w.size < 2 || w(1)._2 - w(0)._3 > gapUs
        }
      }
      counted && bounds && maximal
    }

  property("native winnowFingerprints == composed HOF form") =
    forAll(Gen.nonEmptyListOf(docGen)) { texts =>
      val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val native = graft.ext.TextAnalysis
        .winnowFingerprints(d, "doc_id", "text", k = 5, w = 3)
        .orderBy("doc_id", "fp").collect().map(_.toSeq).toSeq
      val composed = graft.ext.TextAnalysis
        .winnowFingerprintsComposed(d, "doc_id", "text", k = 5, w = 3)
        .orderBy("doc_id", "fp").collect().map(_.toSeq).toSeq
      native == composed
    }

  // ------------------------------------------------------------------
  // Curation: chunkDocs covers every token exactly once at overlap 0,
  // and chunk sizes/counts obey the stride arithmetic at any overlap.
  // ------------------------------------------------------------------

  private val chunkGen = Gen.zip(
    Gen.nonEmptyListOf(Gen.choose(1, 40)),  // token counts per doc
    Gen.choose(2, 12),                      // chunkTokens
    Gen.choose(0, 11))                      // overlap (capped below chunk)

  property("chunkDocs: overlap-0 chunks concatenate back to the doc") =
    forAll(chunkGen) { case (lens, chunk, rawOv) =>
      val ov = math.min(rawOv, chunk - 1)
      val docs = lens.zipWithIndex.map { case (n, i) =>
        (i.toLong, (0 until n).map(t => s"t$t").mkString(" "))
      }.toDF("id", "text")
      val chunks = Curation.chunkDocs(docs, "id", "text", chunk, ov)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      val byDoc = chunks.groupBy(_._1)
      byDoc.forall { case (id, cs) =>
        val n = lens(id.toInt)
        val sorted = cs.sortBy(_._2)
        val stride = chunk - ov
        val expectChunks = 1 + math.max(0, math.ceil((n - chunk).toDouble / stride).toInt)
        val sizesOk = sorted.forall { case (_, c, _, ct) =>
          ct == math.min(n - c * stride, chunk.toLong) }
        val reassembled =
          if (ov == 0) sorted.map(_._3).filter(_.nonEmpty).mkString(" ")
          else (0 until n).map(t => s"t$t").mkString(" ") // not applicable
        sorted.length == expectChunks && sizesOk &&
          reassembled == (0 until n).map(t => s"t$t").mkString(" ")
      }
    }

  // ------------------------------------------------------------------
  // RangeJoin: the banded equi-join rewrite must equal the all-pairs
  // theta-join for arbitrary points, intervals, and band widths
  // (negative domains, empty/inverted intervals, boundary hits).
  // ------------------------------------------------------------------

  private val rangeGen = Gen.zip(
    Gen.listOf(Gen.choose(-100L, 100L)),                       // points
    Gen.listOf(Gen.zip(Gen.choose(-100L, 100L), Gen.choose(-20L, 40L))),
    Gen.choose(1L, 50L))                                       // bandWidth

  property("bandedIntervalJoin == crossJoin theta twin") =
    forAll(rangeGen) { case (pts, ivs, w) =>
      val points = pts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("pid", "ts")
      val intervals = ivs.zipWithIndex.map { case ((lo, len), i) =>
        (i.toLong, lo, lo + len) } // len < 0 → inverted: must match nothing
        .toDF("iid", "lo", "hi")
      val banded = graft.ops.RangeJoin.bandedIntervalJoin(
          points, intervals, "ts", "lo", "hi", bandWidth = w)
        .select("pid", "iid").collect().map(_.toSeq).toSeq.sorted(RowOrd)
      val naive = points.crossJoin(intervals)
        .filter(col("ts") >= col("lo") && col("ts") <= col("hi"))
        .select("pid", "iid").collect().map(_.toSeq).toSeq.sorted(RowOrd)
      banded == naive
    }

  private val RowOrd: Ordering[Seq[Any]] =
    Ordering.by(s => (s(0).asInstanceOf[Long], s(1).asInstanceOf[Long]))

  // ------------------------------------------------------------------
  // QuantileSketch: any split of the input, sketched separately and
  // estimated from the raw union, lands within one bin width of the
  // exact quantile — merge losslessness and the error bound in one.
  // ------------------------------------------------------------------

  private val sketchGen = Gen.zip(
    Gen.nonEmptyListOf(Gen.choose(0.0, 100.0)),
    Gen.choose(5, 40),       // nBins over [0, 100] → width 2.5 .. 20
    Gen.choose(0.05, 0.95))  // split point as a fraction

  property("quantile sketch: split+union estimate within one bin of exact") =
    forAll(sketchGen) { case (vals, nBins, cut) =>
      val d = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      val lo = 0.0; val hi = 100.0
      val w = (hi - lo) / nBins
      val thresh = lo + (hi - lo) * cut
      val parts = graft.ops.QuantileSketch.sketchPartials(
          d.filter(col("v") < thresh), Seq.empty, "v", lo, hi, nBins)
        .unionByName(graft.ops.QuantileSketch.sketchPartials(
          d.filter(col("v") >= thresh), Seq.empty, "v", lo, hi, nBins))
      val est = graft.ops.QuantileSketch.estimate(parts, Seq.empty, lo, hi, nBins,
        Seq("p25" -> 0.25, "p75" -> 0.75)).collect().head
      val sorted = vals.sorted
      def exact(q: Double) = sorted(math.ceil(q * vals.size).toInt - 1)
      (1 to 2).zip(Seq(0.25, 0.75)).forall { case (i, q) =>
        math.abs(est.getDouble(i - 1) - exact(q)) <= w + 1e-9
      }
    }

  // ------------------------------------------------------------------
  // Dedup: paragraph dedup invariants — kept-paragraph total equals the
  // corpus-wide distinct paragraph count (each distinct paragraph
  // survives exactly once), the minimum doc id keeps everything, and
  // every doc's counts are conserved.
  // ------------------------------------------------------------------

  private val paraGen = Gen.zip(
    Gen.nonEmptyListOf(Gen.listOf(Gen.choose(0, 5))), // docs as small-vocab token lists
    Gen.choose(1, 4))                                 // paraTokens

  property("dedupParagraphs: distinct paragraphs survive exactly once") =
    forAll(paraGen) { case (docToks, p) =>
      val docs = docToks.zipWithIndex.map { case (ts, i) =>
        (i.toLong, ts.map(t => s"w$t").mkString(" "))
      }.toDF("id", "text")
      val out = graft.ext.Dedup.dedupParagraphs(docs, "id", "text", p)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // re-derive paragraphs with the same windowing rule on the driver
      def parasOf(ts: List[Int]): Seq[String] = {
        val toks = ts.map(t => s"w$t").mkString(" ").toLowerCase
          .split("\\s+", -1).toSeq // split("") == Seq("") like Spark's
        (0 until math.max((toks.size - 1) / p + 1, 1))
          .map(i => toks.slice(i * p, i * p + p).mkString(" "))
      }
      val all = docToks.zipWithIndex.flatMap { case (ts, i) =>
        parasOf(ts).map(t => (i.toLong, t)) }
      val distinctCount = all.map(_._2).distinct.size.toLong
      val minId = 0L
      out.map(_._3).sum == distinctCount &&
        out.forall { case (id, nP, nK) =>
          nP == parasOf(docToks(id.toInt)).size.toLong && nK <= nP } &&
        out.find(_._1 == minId).forall { case (_, nP, nK) =>
          // doc 0 sees every paragraph first unless it repeats one internally
          nK == parasOf(docToks(0)).distinct.size.toLong || nP == nK }
    }

  // ------------------------------------------------------------------
  // TopKAggregator: the buffer algebra is a lawful commutative monoid
  // fold — merge order can never change the result (the property the
  // shuffle relies on).
  // ------------------------------------------------------------------

  private val topkGen = Gen.zip(
    Gen.choose(1, 5),
    Gen.listOf(Gen.zip(Gen.choose(-50, 50), Gen.choose(0L, 20L))))

  property("TopKAggregator merge is order-insensitive and equals a full sort") =
    forAll(topkGen) { case (k, xs) =>
      val agg = new graft.functions.TopKAggregator(k)
      val entries = xs.map { case (v, t) => graft.functions.TopKEntry(v.toDouble, t) }
      val inputs = entries.map(e => graft.functions.TopKInput(Some(e.value), e.tag))
      val expected = entries.sortBy(e => (-e.value, e.tag)).distinct
        .take(k) // driver-side spec: sort everything, keep k
      // NB distinct AFTER sort would drop equal (value, tag) dups the
      // aggregator keeps — so only compare when inputs are distinct
      val distinctIn = entries.distinct.size == entries.size
      val folded = inputs.foldLeft(agg.zero)(agg.reduce)
      val (l, r) = inputs.splitAt(inputs.size / 2)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      val mergedRev = agg.merge(
        r.foldLeft(agg.zero)(agg.reduce), l.foldLeft(agg.zero)(agg.reduce))
      folded == merged && merged == mergedRev &&
        (!distinctIn || folded == entries.sortBy(e => (-e.value, e.tag)).take(k))
    }

  // ------------------------------------------------------------------
  // FreqSketch: count-min never underestimates, for ANY width/depth.
  // ------------------------------------------------------------------

  private val cmsGen = Gen.zip(
    Gen.choose(1, 64), Gen.choose(1, 4),
    Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d", "e", "f")))

  property("FreqSketch estimates dominate exact counts at any geometry") =
    forAll(cmsGen) { case (w, d, xs) =>
      val data = xs.map(Tuple1(_)).toDF("v")
      val sk = graft.ops.FreqSketch.sketchPartials(data, "v", w, d)
      val est = graft.ops.FreqSketch.estimate(
          sk, data.select("v").distinct(), "v", w, d)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      exact.forall { case (k, n) => est(k) >= n }
    }

  // ------------------------------------------------------------------
  // fuzzyPairsEd1 == the all-pairs levenshtein join (exact recall +
  // precision of symmetric-delete banding) on random short strings.
  // ------------------------------------------------------------------

  private val fuzzyGen = Gen.listOf(
    Gen.choose(3, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString)))

  property("fuzzyPairsEd1 == all-pairs levenshtein twin") =
    forAll(fuzzyGen) { words =>
      val d = words.map(Tuple1(_)).toDF("s").distinct()
      val banded = graft.ext.Dedup.fuzzyPairsEd1(d, "s")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      val naive = (for {
        a <- words.distinct; b <- words.distinct
        if a < b && levDist(a, b) <= 1
      } yield (a, b)).toSet
      banded == naive
    }

  // ------------------------------------------------------------------
  // Versioned lake: a random merge-batch sequence applied through the
  // manifest protocol must equal an in-memory key→value model at EVERY
  // committed version — not just the latest: snapshot isolation means
  // history can never change once committed. One change per key per
  // batch (the documented CDC-compaction contract) is enforced by
  // deduping the generated batch keep-last.
  // ------------------------------------------------------------------

  private val opGen = Gen.zip(
    Gen.oneOf("a", "b"), Gen.choose(1L, 4L),
    Gen.choose(-50, 50).map(_.toDouble), Gen.prob(0.3))
  // ELEVEN batches so every generated case crosses the checkpoint
  // cadence (v0 ckpt, v1-v9 deltas, v10 ckpt, v11 delta): the model
  // equality then exercises delta-tail resolution on both sides of a
  // checkpoint with random contents, not just the example-based spec
  private val batchesGen =
    Gen.listOfN(11, Gen.nonEmptyListOf(opGen).map(_.take(3)))

  property("Versioned.mergeInto: every version equals the key-value model") =
    forAll(batchesGen) { batches =>
      val dir = java.nio.file.Files.createTempDirectory("graft_vprop").toFile
      dir.deleteOnExit()
      // partition c is never touched by the generators, so the lake
      // can never become fully empty (empty tables are out of scope)
      val baseRows = Seq(("a", 1L, 1.0, false), ("b", 2L, 2.0, false),
        ("c", 99L, 0.0, false))
      graft.ops.MergeData.writeMerged(spark,
        baseRows.map { case (s, i, v, _) => (s, i, v) }.toDF("site", "id", "v"),
        dir.getAbsolutePath, keys = Seq("site"))
      graft.lake.Versioned.init(spark, dir.getAbsolutePath)

      var model = baseRows.map { case (s, i, v, _) => (s, i) -> v }.toMap
      val states = scala.collection.mutable.ArrayBuffer(model)
      batches.filter(_.nonEmpty).foreach { raw =>
        val batch = raw.groupBy(o => (o._1, o._2)).map(_._2.last).toSeq
        model = batch.foldLeft(model) { case (m, (s, i, v, del)) =>
          if (del) m - ((s, i)) else m + ((s, i) -> v)
        }
        states += model
        graft.lake.Versioned.mergeInto(spark, dir.getAbsolutePath,
          batch.toDF("site", "id", "v", "__delete"),
          Seq("site"), Seq("site", "id"))
      }
      states.zipWithIndex.forall { case (m, ver) =>
        val got = graft.lake.Versioned
          .snapshot(spark, dir.getAbsolutePath, ver.toLong)
          .select("site", "id", "v").collect()
          .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
        got == m
      }
    }

  // ------------------------------------------------------------------
  // MOR deletes under the same model discipline: random interleavings
  // of merge batches, equality deletes, materializations, blind
  // APPENDs (fresh keys), and RESTOREs to uniformly chosen earlier
  // versions — EVERY committed version must equal the in-memory model,
  // with NO forced materialize before merging: mergeInto itself
  // materializes conflicting tombstones scoped to its own commit and
  // carries the rest merge-on-read. Exercises the cases the
  // example-based spec can't enumerate: delete-of-deleted (no commit),
  // materialize-with-nothing (no commit), merge of a key re-inserted
  // while its tombstone still pends, merges that leave non-conflicting
  // tombstones pending across further deletes, appends landing over
  // pending unrelated tombstones, restores that re-open pending
  // tombstones, and restore-then-diverge histories.
  // ------------------------------------------------------------------

  private sealed trait MorStep
  private case class MorMerge(ops: List[(String, Long, Double, Boolean)]) extends MorStep
  private case class MorDel(site: String, id: Long) extends MorStep
  private case object MorMat extends MorStep
  private case class MorAppend(rows: List[(String, Double)]) extends MorStep
  private case class MorRestore(sel: Int) extends MorStep

  private val morStepGen: Gen[MorStep] = Gen.frequency(
    (3, Gen.nonEmptyListOf(opGen).map(l => MorMerge(l.take(3)))),
    (3, Gen.zip(Gen.oneOf("a", "b"), Gen.choose(1L, 4L))
      .map { case (s, i) => MorDel(s, i) }),
    (1, Gen.const(MorMat)),
    (2, Gen.nonEmptyListOf(Gen.zip(Gen.oneOf("a", "b"),
      Gen.choose(0.0, 9.0))).map(l => MorAppend(l.take(2)))),
    (1, Gen.choose(0, 16).map(MorRestore(_))))

  property("Versioned MOR deletes: every version equals the key-value model") =
    forAll(Gen.listOfN(4, morStepGen)) { steps =>
      val dir = java.nio.file.Files.createTempDirectory("graft_vmorprop").toFile
      dir.deleteOnExit()
      val baseRows = Seq(("a", 1L, 1.0), ("b", 2L, 2.0), ("c", 99L, 0.0))
      graft.ops.MergeData.writeMerged(spark,
        baseRows.toDF("site", "id", "v"),
        dir.getAbsolutePath, keys = Seq("site"))
      graft.lake.Versioned.init(spark, dir.getAbsolutePath)

      var model = baseRows.map { case (s, i, v) => (s, i) -> v }.toMap
      val states = scala.collection.mutable.ArrayBuffer(model)
      var curV = 0L
      def record(v: Long): Unit =
        if (v > curV) { require(v == curV + 1); states += model; curV = v }
      def materialize(): Unit =
        record(graft.lake.Versioned.materializeDeletes(
          spark, dir.getAbsolutePath, Seq("site")))
      // appended keys come from a disjoint id range (blind appends must
      // never duplicate a live key; colliding-with-tombstone appends are
      // refused by design and out of this property's model)
      var nextAppendId = 100L
      steps.foreach {
        case MorDel(s, i) =>
          val v = graft.lake.Versioned.deleteWhere(spark, dir.getAbsolutePath,
            col("site") === s && col("id") === i, Seq("site", "id"))
          if (model.contains((s, i))) model -= ((s, i))
          record(v) // no-match deletes commit nothing; record is a no-op
        case MorMat => materialize()
        case MorMerge(raw) =>
          val batch = raw.groupBy(o => (o._1, o._2)).map(_._2.last).toSeq
          model = batch.foldLeft(model) { case (m, (s, i, v, del)) =>
            if (del) m - ((s, i)) else m + ((s, i) -> v)
          }
          record(graft.lake.Versioned.mergeInto(spark, dir.getAbsolutePath,
            batch.toDF("site", "id", "v", "__delete"),
            Seq("site"), Seq("site", "id")))
        case MorAppend(rows) =>
          val withIds = rows.map { case (s, v) =>
            val id = nextAppendId; nextAppendId += 1; (s, id, v) }
          model ++= withIds.map { case (s, i, v) => (s, i) -> v }
          record(graft.lake.Versioned.append(spark, dir.getAbsolutePath,
            withIds.toDF("site", "id", "v"), Seq("site")))
        case MorRestore(sel) =>
          // roll back to a uniformly chosen committed version; the
          // model rolls back with it (a restore targeting the current
          // state commits nothing — record is a no-op)
          val target = (sel % (curV + 1)).toLong
          model = states(target.toInt)
          record(graft.lake.Versioned.restore(spark, dir.getAbsolutePath,
            target))
      }
      states.zipWithIndex.forall { case (m, ver) =>
        val got = graft.lake.Versioned
          .snapshot(spark, dir.getAbsolutePath, ver.toLong)
          .select("site", "id", "v").collect()
          .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
        got == m
      }
    }

  private def levDist(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }
}
