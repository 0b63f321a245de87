package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.SparkSpec

/** S4/S7: gzip CSV reading and sidecar-schema materialization. */
class ReadersSpec extends SparkSpec {

  test("sidecarStructType parses Spark DataType JSON round-trip") {
    val st = StructType(Seq(
      StructField("value.time", DoubleType), StructField("value.key", StringType)))
    assert(Readers.sidecarStructType(st.json) === st)
  }

  test("sidecarStructType parses a flat {col: sqlType} object, order preserved") {
    val st = Readers.sidecarStructType(
      """{"value.time": "double", "value.key": "string", "n": "bigint"}""")
    assert(st.fields.map(_.name).toSeq === Seq("value.time", "value.key", "n"))
    assert(st("value.time").dataType === DoubleType)
    assert(st("n").dataType === LongType)
  }

  test("sidecarStructType rejects non-object / non-string-typed shapes") {
    intercept[IllegalArgumentException](Readers.sidecarStructType("[1,2]"))
    intercept[IllegalArgumentException](Readers.sidecarStructType("""{"a": 1}"""))
  }

  test("csvGzWithSidecar applies the sidecar schema on read (no inference)") {
    val dir = Files.createTempDirectory("graft-readers").toString
    val gz = new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(s"$dir/20240101_0000.csv.gz"))
    gz.write("value.time,value.key\n1.5,steps\n,hr\n".getBytes)
    gz.close()
    Files.write(java.nio.file.Paths.get(s"$dir/schema.json"),
      """{"value.time": "double", "value.key": "string"}""".getBytes)
    val d = Readers.csvGzWithSidecar(spark, Seq(s"$dir/20240101_0000.csv.gz"), s"$dir/schema.json")
    assert(d.schema("value.time").dataType === DoubleType)
    assert(rowsOf(d.orderBy("`value.key`")) === Seq(Seq(null, "hr"), Seq(1.5, "steps")))
  }
}
