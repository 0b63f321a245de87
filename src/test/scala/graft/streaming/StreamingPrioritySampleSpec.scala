package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ops.PrioritySample

/** The streamed sample (re-finished union of per-batch candidate
  * increments) must equal the batch sample over the same rows —
  * membership, ranks, AND estimation weights — across checkpointed
  * runs. */
class StreamingPrioritySampleSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("g", StringType), StructField("id", StringType),
    StructField("w", DoubleType)))

  private def writeCsv(dir: String, name: String,
      rows: Seq[(String, String, Double)]): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, name),
      ("g,id,w" +: rows.map { case (g, i, w) => s"$g,$i,$w" })
        .mkString("\n").getBytes)
  }

  test("streamed sample equals the batch sample, across runs") {
    val base = Files.createTempDirectory("graft-spsample").toString
    val (root, out, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    val k = 10
    val batch1 = (1 to 40).map(i => ("g1", f"a$i%03d", 1.0 + i % 7)) ++
      (1 to 15).map(i => ("g2", f"b$i%03d", 2.0))
    val batch2 = (41 to 80).map(i => ("g1", f"a$i%03d", 1.0 + i % 5))
    writeCsv(root, "a.csv", batch1)
    val s1 = spark.readStream.option("header", "true").schema(schema).csv(root)
    StreamingPrioritySample.start(s1, "id", "w", k, Seq("g"), out, ckpt)
      .awaitTermination()
    writeCsv(root, "b.csv", batch2)
    val s2 = spark.readStream.option("header", "true").schema(schema).csv(root)
    StreamingPrioritySample.start(s2, "id", "w", k, Seq("g"), out, ckpt)
      .awaitTermination()

    val got = StreamingPrioritySample.sample(spark, out, "id", "w", k, Seq("g"))
      .orderBy("g", "rn").collect().map(_.toSeq)
    val want = PrioritySample.sampleByGroup(
        df(batch1 ++ batch2, "g", "id", "w"), "id", "w", k, Seq("g"))
      .orderBy("g", "rn").collect().map(_.toSeq)
    assert(got.toSeq === want.toSeq)
    // g2 is exhaustive after run 1 (15 > k though — so it has a tau);
    // sanity: both groups fully sampled at k
    assert(got.count(_.head == "g1") === k)
    assert(got.count(_.head == "g2") === k)
  }
}
