package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.SummaryOps._

/** Spec-grammar + assembly coverage for the extract_patient_summary
  * pipeline (reference `extract_patient_summary.py:34-91,380-435`). */
class SummaryOpsSpec extends SparkSpec {

  // ---- spec-string grammar (5-vs-6 field overloading, :34-57) ----

  test("parseFeature 6-field = filter variant") {
    val f = parseFeature("steps:connect_fitbit:value.time:value.key:Steps:value.intVal", 7)
    assert(f === FeatureSpec("steps", "connect_fitbit", "value.time",
      "value.intVal", Some("value.key"), Some("Steps"), None, 7))
  }

  test("parseFeature 5-field = unit variant") {
    val f = parseFeature("hr:fitbit_hr:value.time:value.bpm:bpm", 0)
    assert(f === FeatureSpec("hr", "fitbit_hr", "value.time",
      "value.bpm", None, None, Some("bpm"), 0))
  }

  test("parseFeature rejects other arities like the reference") {
    intercept[IllegalArgumentException](parseFeature("a:b:c", 0))
    intercept[IllegalArgumentException](parseFeature("a:b:c:d:e:f:g", 0))
  }

  test("questionnaire/slider/histogram spec arities") {
    assert(parseQuestionnaire("qfile:value.timeCompleted") ===
      QuestionnaireSpec("qfile", "value.timeCompleted"))
    intercept[IllegalArgumentException](parseQuestionnaire("only-one"))
    assert(parseSlider("mood:qf:value.answers:slider_:value:startTime") ===
      SliderSpec("mood", "qf", "value.answers", "slider_", "value", "startTime"))
    intercept[IllegalArgumentException](parseSlider("a:b:c"))
    assert(parseHistogram("wb:qf:value.answers:q_1:value:startTime") ===
      HistogramSpec("wb", "qf", "value.answers", "q_1", "value", "startTime"))
    intercept[IllegalArgumentException](parseHistogram("a:b"))
  }

  // ---- W1/W2 unpivot plan construction ----

  private def answersDf = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("participant_id", StringType),
      StructField("value.answers.0.questionId", StringType),
      StructField("value.answers.0.value", StringType),
      StructField("value.answers.1.questionId", StringType),
      StructField("value.answers.1.value", StringType),
      StructField("value.answers.2.questionId", StringType))) // orphan: no value col
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row("p1", "slider_a", "3", "q_x", "yes", "slider_orphan"),
        Row("p2", "slider_b", "junk", "q_y", "no", "slider_orphan")),
      schema)
  }

  test("answersUnpivot explodes only complete pairs (value_col-in-row check)") {
    val up = answersUnpivot(answersDf, "value.answers", "value")
    assert(up.count() === 4) // 2 rows x 2 complete pairs; orphan pair skipped
    assert(!rowsOf(up.select("questionId")).flatten.contains("slider_orphan"))
  }

  test("answersUnpivot requires at least one pair") {
    intercept[IllegalArgumentException](
      answersUnpivot(df(Seq(("p1", 1)), "participant_id", "x"), "value.answers", "value"))
  }

  // ---- J1 routing determinism ----

  test("routeFeatures: first (lowest-priority-index) matching spec wins") {
    val inv = df(Seq(
      Tuple1("/lake/s1/p1/connect_fitbit_intraday_steps/f.csv.gz"),
      Tuple1("/lake/s1/p1/connect_fitbit/f.csv.gz"),
      Tuple1("/lake/s1/p1/other/f.csv.gz")), "path")
    val specs = Seq(
      FeatureSpec("steps_intraday", "connect_fitbit_intraday", "t", "v", None, None, None, 0),
      FeatureSpec("fitbit_any", "connect_fitbit", "t", "v", None, None, None, 1))
    val routed = SummaryOps.routeFeatures(spark, inv, specs)
      .select("path", "feature").orderBy("path")
    assert(rowsOf(routed) === Seq(
      Seq("/lake/s1/p1/connect_fitbit/f.csv.gz", "fitbit_any"),
      Seq("/lake/s1/p1/connect_fitbit_intraday_steps/f.csv.gz", "steps_intraday")))
  }

  // ---- document assembly: empty-stage paths (:380-435) ----

  test("assemble with absent questionnaire/slider/histogram stages") {
    val fl = df(Seq(
      ("p1", "2024-01", "steps", java.sql.Date.valueOf("2024-01-05"), Some(10.0)),
      ("p1", "2024-01", "steps", java.sql.Date.valueOf("2024-01-06"), None)),
      "participant_id", "time_key", "feature", "day", "value")
    val doc = SummaryOps.assemble(
      SummaryOps.dataSummary(fl), SummaryOps.featureStats(fl), None, None, None)
    val r = doc.collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[String]("site") === "p1") // quirk §2.11.2: site = participant
    val qr = row.getAs[org.apache.spark.sql.Row]("questionnaire_responses")
    assert(qr.getAs[Long]("total_responses") === 0L)
    assert(qr.isNullAt(qr.fieldIndex("slider")))
    assert(qr.isNullAt(qr.fieldIndex("histogram")))
    val ds = row.getAs[org.apache.spark.sql.Row]("data_summary")
    assert(ds.getAs[Long]("total_days_with_data") === 1L) // null value contributes no day
  }

  test("assemble keeps buckets produced by ANY stage (defaultdict semantics)") {
    val fl = df(Seq(
      ("p1", "2024-01", "steps", java.sql.Date.valueOf("2024-01-05"), Some(1.0))),
      "participant_id", "time_key", "feature", "day", "value")
    // questionnaire has a bucket (p2, 2024-02) that features never saw
    val q = SummaryOps.questionnaireCounts(df(Seq(
      ("p2", "2024-02", java.sql.Date.valueOf("2024-02-01"))),
      "participant_id", "time_key", "day"))
    val doc = SummaryOps.assemble(
      SummaryOps.dataSummary(fl), SummaryOps.featureStats(fl), Some(q), None, None)
    assert(rowsOf(doc.select("participant_id", "time_key").orderBy("participant_id")) ===
      Seq(Seq("p1", "2024-01"), Seq("p2", "2024-02")))
  }
}
