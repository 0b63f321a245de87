package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ext.Similarity

/** Streaming IVF maintenance must equal its batch twin: vectors arriving
  * over micro-batches land as increment partitions, probes see them
  * immediately, and base results stay undisturbed. */
class StreamingIvfIngestSpec extends SparkSpec {

  private def vec(seed: Int): Seq[Float] =
    (0 until 8).map(d => math.sin(seed * 31 + d * 7).toFloat)

  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  private def writeBatch(dir: String, name: String, rows: Seq[(Long, Seq[Float])]): Unit = {
    Files.createDirectories(Paths.get(dir))
    val lines = rows.map { case (id, v) => s"""{"vec_id":$id,"embedding":[${v.mkString(",")}]}""" }
    Files.write(Paths.get(dir, name), lines.mkString("\n").getBytes)
  }

  test("streamed increments == batch append: probe-reachable, replay-safe layout") {
    val root = Files.createTempDirectory("graft-sivf").toString
    val (idx, in, ckpt) = (s"$root/idx", s"$root/in", s"$root/ckpt")
    val base = (0L until 60L).map(i => (i, vec(i.toInt)))
    Similarity.writeIvfIndex(
      df(base, "vec_id", "embedding"), "vec_id", "embedding", idx, nCells = 8)

    // batch 1: an exact copy of vector 2 under a new id + a novel vector
    writeBatch(in, "b1.json", Seq((102L, base(2)._2), (110L, vec(987))))
    val s1 = spark.readStream.schema(schema).json(in)
    StreamingIvfIngest.start(s1, idx, "vec_id", "embedding", ckpt)
      .awaitTermination()

    val probes = df(base.filter(_._1 < 5), "vec_id", "embedding")
    val after1 = Similarity.ivfTopKFromIndex(spark, idx, probes,
      "vec_id", "embedding", k = 3, nProbe = 8)
    val v2top = after1.filter(col("probe_id") === 2 && col("rank") === 1).collect()(0)
    assert(v2top.getAs[Long]("neighbor_id") == 102L)
    assert(v2top.getAs[Double]("sim") == 1.0)

    // batch 2 arrives later: a copy of vector 3 — incremental pickup
    writeBatch(in, "b2.json", Seq((103L, base(3)._2)))
    val s2 = spark.readStream.schema(schema).json(in)
    StreamingIvfIngest.start(s2, idx, "vec_id", "embedding", ckpt)
      .awaitTermination()
    val v3top = Similarity.ivfTopKFromIndex(spark, idx, probes,
        "vec_id", "embedding", k = 3, nProbe = 8)
      .filter(col("probe_id") === 3 && col("rank") === 1).collect()(0)
    assert(v3top.getAs[Long]("neighbor_id") == 103L)
    assert(v3top.getAs[Double]("sim") == 1.0)

    // the increment tree is batch_id-partitioned (the replay-overwrite
    // unit) and the base tree is untouched
    val incBatches = spark.read.parquet(s"$idx/cells_inc")
      .select("batch_id").distinct().count()
    assert(incBatches == 2L)
    assert(spark.read.parquet(s"$idx/cells").count() == 60L)

    // streamed index content == the batch twin's content (same rows)
    val twin = Files.createTempDirectory("graft-sivf-twin").toString
    Similarity.writeIvfIndex(
      df(base, "vec_id", "embedding"), "vec_id", "embedding", twin, nCells = 8)
    Similarity.appendToIvfIndex(spark, twin,
      df(Seq((102L, base(2)._2), (110L, vec(987)), (103L, base(3)._2)),
        "vec_id", "embedding"), "vec_id", "embedding")
    val streamedRows = Similarity.readIndexCells(spark, idx)
      .select("neighbor_id", "cell_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val twinRows = Similarity.readIndexCells(spark, twin)
      .select("neighbor_id", "cell_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamedRows == twinRows)
  }

  test("crash after increment write, before commit: replay never double-inserts") {
    val root = Files.createTempDirectory("graft-sivf-kill").toString
    val (idx, in, ckpt) = (s"$root/idx", s"$root/in", s"$root/ckpt")
    val base = (0L until 40L).map(i => (i, vec(i.toInt)))
    Similarity.writeIvfIndex(
      df(base, "vec_id", "embedding"), "vec_id", "embedding", idx, nCells = 4)
    writeBatch(in, "b1.json", Seq((200L, vec(55)), (201L, vec(56))))

    // attempt 1 dies INSIDE the commit window, increment already on disk
    val armed = new java.util.concurrent.atomic.AtomicBoolean(true)
    val s1 = spark.readStream.schema(schema).json(in)
    val q1 = StreamingIvfIngest.start(s1, idx, "vec_id", "embedding", ckpt,
      afterBatch = _ =>
        if (armed.getAndSet(false))
          throw new RuntimeException("injected crash after write, before commit"))
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination()
    }
    assert(spark.read.parquet(s"$idx/cells_inc").count() == 2L,
      "crash landed before the write - wrong window")

    // restart: batch 0 replays with the same id, overwrites its partitions
    val s2 = spark.readStream.schema(schema).json(in)
    StreamingIvfIngest.start(s2, idx, "vec_id", "embedding", ckpt)
      .awaitTermination()
    val inc = Similarity.readIndexCells(spark, idx)
      .filter(col("neighbor_id") >= 200L)
      .select("neighbor_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(inc == Seq(200L, 201L), s"double-inserted or lost: $inc")
  }
}
