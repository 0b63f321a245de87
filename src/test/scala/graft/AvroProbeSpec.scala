package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Probe: Spark 4 ships the complete Avro FileFormat inside spark-sql
  * (`org.apache.spark.sql.avro.AvroFileFormat`) but does NOT register
  * the `avro` short name (no DataSourceRegister service entry on this
  * classpath) — the fully-qualified class name is the supported spelling
  * here. This spec pins that both directions round-trip faithfully. */
class AvroProbeSpec extends SparkSpec {

  private val fmt = "org.apache.spark.sql.avro.AvroFileFormat"

  test("avro write+read round-trips via the fully-qualified FileFormat") {
    val dir = Files.createTempDirectory("graft-avro").toString
    val src = df(Seq(
      (1L, "alpha", 1.5, true),
      (2L, "beta", -2.25, false),
      (3L, null, 0.0, true)), "id", "name", "score", "flag")
    src.write.format(fmt).mode("overwrite").save(dir)
    val back = spark.read.format(fmt).load(dir)
    assert(back.schema.fieldNames.sorted.toSeq === Seq("flag", "id", "name", "score"))
    assert(rowsOf(back.orderBy("id")) === rowsOf(src.orderBy("id")))
  }
}
