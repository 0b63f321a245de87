package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-shot dev tool (not part of the driver contract): build an
  * N×-scaled clone of the volume-bearing tables (events, documents,
  * embeddings) so scaling exponents can be MEASURED instead of argued —
  * the sf0.1 bench cannot see a latent quadratic that only wakes up at
  * 10× the data (SCALING.md records the measured trend).
  *
  * Each copy shifts the primary key far past the source range; document
  * text is prefixed with a per-copy token so near-dup structure is
  * preserved WITHOUT creating cross-copy exact-duplicate clusters
  * (which would quadratically inflate pair counts and measure the
  * fixture, not the operator). The remaining small tables are
  * symlinked from the source dir.
  *
  * Usage: runMain graft.ScaleClone <srcSfDir> <outDir> <copies>
  */
object ScaleClone {

  private def replicate(df: DataFrame, copies: Int)
      (tweak: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until copies).map(i => tweak(df, i)).reduce(_.unionByName(_))

  def main(args: Array[String]): Unit = {
    val (src, out, copies) = (args(0), args(1), args(2).toInt)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // raw read keeps events.ts as int64 nanos (no TIMESTAMP(NANOS)
    // type to preserve on the rewrite; Tables.events handles both)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    val ev = spark.read.parquet(s"$src/events.parquet")
    replicate(ev, copies) { (d, i) =>
      d.withColumn("event_id", col("event_id") + lit(i * 1000000000L))
    }.write.mode("overwrite").parquet(s"$out/events.parquet")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    replicate(docs, copies) { (d, i) =>
      val t = if (i == 0) col("text") else concat(lit(s"c$i "), col("text"))
      d.withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
        .withColumn("text", t)
        .withColumn("n_chars", length(t).cast("long"))
    }.write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    replicate(emb, copies) { (d, i) =>
      d.withColumn("vec_id", col("vec_id") + lit(i * 10000000L))
    }.write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    Tables.names.filterNot(Seq("events", "documents", "embeddings").contains)
      .foreach { t =>
        val link = java.nio.file.Paths.get(out, s"$t.parquet")
        if (!java.nio.file.Files.exists(link))
          java.nio.file.Files.createSymbolicLink(
            link, java.nio.file.Paths.get(src, s"$t.parquet"))
      }
    println(s"scaled clone ($copies x) at $out")
    spark.stop()
  }
}
