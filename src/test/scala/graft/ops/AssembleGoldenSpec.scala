package graft.ops

import java.nio.file.{Files, Paths, StandardOpenOption}
import java.sql.Date

import graft.SparkSpec

/** Golden-file contract for the assembled summary document — the
  * reference's actual deliverable (`extract_patient_summary.py:430-435`
  * writes one nested JSON per (participant, time_key) bucket). The
  * checked-in golden pins the FULL nested serialization byte-for-byte:
  * field order, key-sorted maps, unrounded stats values, and the
  * defaultdict bucket semantics (a bucket exists when ANY stage produced
  * rows for it, with zero/absent fields for the silent stages).
  *
  * Regenerate deliberately by deleting the golden file and re-running —
  * the spec records the new bytes and FAILS, so a drift can never
  * self-bless in one run.
  */
class AssembleGoldenSpec extends SparkSpec {

  private def d(s: String) = Date.valueOf(s)

  test("assemble serializes to the checked-in golden documents, byte-stable") {
    // hand-authored long-form stage inputs (the shapes produced by
    // featureLong / sliderLong / histogramLong / questionnaireLong)
    val fl = df(Seq(
      ("p1", "2024-01", "steps", d("2024-01-03"), Option(1000.0)),
      ("p1", "2024-01", "steps", d("2024-01-04"), Option(1250.0)),
      ("p1", "2024-01", "steps", d("2024-01-04"), Option.empty[Double]), // junk: counts, no day/value
      ("p1", "2024-01", "heart_rate", d("2024-01-03"), Option(61.0)),
      ("p2", "2024-02", "steps", d("2024-02-10"), Option(900.0))),
      "participant_id", "time_key", "feature", "day", "value")
    val sl = df(Seq(
      ("p1", "2024-01", "mood", d("2024-01-03"), Option(4.0)),
      ("p1", "2024-01", "mood", d("2024-01-05"), Option(2.0)),
      ("p1", "2024-01", "calm", d("2024-01-05"), Option.empty[Double])),
      "participant_id", "time_key", "domain", "day", "value")
    val hl = df(Seq(
      ("p1", "2024-01", "wellbeing", "q_sleep", "good"),
      ("p1", "2024-01", "wellbeing", "q_sleep", "good"),
      ("p1", "2024-01", "wellbeing", "q_sleep", "bad"),
      ("p1", "2024-01", "behavior", "q_walk", "yes"),
      ("p3", "2024-03", "wellbeing", "q_sleep", "good")), // histogram-only bucket
      "participant_id", "time_key", "domain", "questionId", "response")
    val ql = df(Seq(
      ("p1", "2024-01", d("2024-01-03")),
      ("p1", "2024-01", d("2024-01-03")),
      ("p2", "2024-02", d("2024-02-11"))),
      "participant_id", "time_key", "day")

    val doc = SummaryOps.assemble(
      SummaryOps.dataSummary(fl),
      SummaryOps.featureStats(fl),
      Some(SummaryOps.questionnaireCounts(ql)),
      Some(SummaryOps.sliderStats(sl)),
      Some(SummaryOps.histogramCounts(hl)))

    val actual = doc.orderBy("participant_id", "time_key")
      .toJSON.collect().mkString("", "\n", "\n")

    val goldenPath = Paths.get("src/test/resources/golden/assemble_docs.jsonl")
    if (!Files.exists(goldenPath)) {
      Files.createDirectories(goldenPath.getParent)
      Files.write(goldenPath, actual.getBytes("UTF-8"),
        StandardOpenOption.CREATE_NEW)
      fail(s"golden file recorded at $goldenPath — inspect and re-run")
    }
    val golden = new String(Files.readAllBytes(goldenPath), "UTF-8")
    assert(actual === golden)

    // determinism: a second evaluation of the same plan yields the same
    // bytes (key-sorted maps — collect_list order alone would not)
    val again = doc.orderBy("participant_id", "time_key")
      .toJSON.collect().mkString("", "\n", "\n")
    assert(again === golden)
  }
}
