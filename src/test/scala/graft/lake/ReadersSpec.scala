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

  test("scanLake's bounded inference skips hidden/staging files the scan excludes") {
    // an in-flight write under _temporary/ (truncated gzip) and a
    // dot-file: Spark's scan filters both; the inference SAMPLE must
    // too, or it reads a file the scan never would (and here, crashes
    // on the truncated gzip)
    val root = Files.createTempDirectory("graft-scanlake").toString
    def gz(path: String, content: String): Unit = {
      val f = new java.io.File(path); f.getParentFile.mkdirs()
      val o = new java.util.zip.GZIPOutputStream(new java.io.FileOutputStream(f))
      o.write(content.getBytes); o.close()
    }
    gz(s"$root/m1/20240101_0000.csv.gz", "a,b\n1,x\n2,y\n")
    gz(s"$root/m1/.partial.csv.gz", "zzz\n")
    Files.createDirectories(java.nio.file.Paths.get(s"$root/m1/_temporary/0"))
    // truncated garbage that would fail any read
    Files.write(java.nio.file.Paths.get(s"$root/m1/_temporary/0/part.csv.gz"),
      Array[Byte](0x1f, 0x0b, 0x00))
    val d = Readers.scanLake(spark, root) // default bounded inference
    assert(d.columns.toSeq === Seq("a", "b", "path"))
    assert(d.count() === 2) // the real scan also excluded both hidden files
  }

  test("skipCorrupt drops a garbage .csv.gz like the reference's per-file except") {
    val root = Files.createTempDirectory("graft-scanlake-corrupt").toString
    def gz(path: String, content: String): Unit = {
      val f = new java.io.File(path); f.getParentFile.mkdirs()
      val o = new java.util.zip.GZIPOutputStream(new java.io.FileOutputStream(f))
      o.write(content.getBytes); o.close()
    }
    gz(s"$root/m1/20240101_0000.csv.gz", "a,b\n1,x\n2,y\n")
    // a VISIBLE corrupt upload: gzip magic then garbage, a real-world
    // truncated device upload (not a hidden/staging file)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/m1/20240102_0000.csv.gz"),
      Array[Byte](0x1f, 0x8b.toByte, 0x00, 0x33, 0x44))
    // fail-fast default: the corrupt file kills the scan
    intercept[org.apache.spark.SparkException] {
      Readers.scanLake(spark, root).count()
    }
    // reference semantics (merge-data.py:77-87): skip it, keep the rest
    val tolerant = Readers.scanLake(spark, root, skipCorrupt = true)
    assert(tolerant.columns.toSeq === Seq("a", "b", "path"))
    assert(tolerant.count() === 2)

    // corrupt file sorts FIRST in its directory: the inference sample
    // must skip to the next readable file, not silently drop the
    // directory's schema contribution (its healthy columns c,d would
    // otherwise never be inferred)
    val root2 = Files.createTempDirectory("graft-scanlake-corrupt2").toString
    gz(s"$root2/m2/20240105_0000.csv.gz", "c,d\n7,z\n")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root2/m2/20240101_0000.csv.gz"),
      Array[Byte](0x1f, 0x8b.toByte, 0x00, 0x11, 0x22))
    val t2 = Readers.scanLake(spark, root2, skipCorrupt = true)
    assert(t2.columns.toSeq === Seq("c", "d", "path"))
    assert(t2.count() === 1)
  }
}
