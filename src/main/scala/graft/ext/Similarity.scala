package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import DetHash._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Brute-force cosine top-k is the exact baseline (probe-set × corpus,
  * pruned by a row_number window). The scale path is random-hyperplane
  * LSH ([[rpBucket]]): candidates only within matching sign-buckets, so
  * the join is an equi-join on the bucket key rather than a cross join.
  *
  * All arithmetic is done in DOUBLE after an explicit cast — float
  * accumulation order would otherwise differ between engines and break
  * the oracle hash.
  */
object Similarity {

  /** Cosine similarity between two Array[Float] columns, computed in
    * double. `aggregate` evaluates sequentially per row inside codegen —
    * no shuffle, no UDF. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) = aggregate(
      zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Brute-force cosine top-k: for each probe row, the k nearest corpus
    * rows (excluding itself). Ranking uses the ROUNDED similarity with
    * the neighbor id as tie-break, so results are reproducible across
    * engines and runs. Broadcast the probe side: the corpus never
    * shuffles. */
  def bruteForceTopK(
      corpus: DataFrame, probes: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("vec"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    c.crossJoin(broadcast(p))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosine(col("probe_vec"), col("vec")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "sim", "rank")
  }

  /** All near-duplicate pairs by cosine threshold (embedding-space
    * near-dup dedup). All-pairs form for oracle-checkable sizes; compose
    * with [[rpBuckets]] for the LSH-pruned variant at scale. */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String, minSim: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim", round(cosine(col("vec_a"), col("vec_b")), 4))
      .filter(col("sim") >= minSim)
      .select("id_a", "id_b", "sim")
  }

  /** Random-hyperplane LSH bucket key: `nBits` sign bits of projections
    * onto deterministic pseudo-random planes. Plane weight (bit, dim) is
    * derived from [[DetHash.hash52]] of "rp-<bit>-<dim>" mapped to
    * [-1000, 1000] — reproducible in SQL, no RNG state. */
  def rpBucket(vec: Column, nBits: Int, dim: Int): Column = {
    val bitCols = (0 until nBits).map { bit =>
      val proj = (0 until dim).map { d =>
        val w = (hash52Const(s"rp-$bit-$d") % 2001L) - 1000L
        get(vec, lit(d)).cast("double") * lit(w.toDouble)
      }.reduce(_ + _)
      when(proj >= 0, shiftleft(lit(1L), bit)).otherwise(0L)
    }
    bitCols.reduce(_ + _)
  }

  /** Driver-side constant twin of [[DetHash.hash52]] (same md5-prefix
    * semantics) for baking plane weights into the plan as literals. */
  def hash52Const(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 13), 16)
  }

  /** ANN via random-hyperplane LSH: candidates share a bucket; exact
    * cosine + top-k inside buckets only. */
  def annTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
      nBits: Int, dim: Int, probeFilter: Column): DataFrame = {
    val bucketed = df.withColumn("bucket", rpBucket(col(vecCol), nBits, dim))
    val a = bucketed.filter(probeFilter)
      .select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"), col("bucket"))
    val b = bucketed
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("vec"), col("bucket"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    a.join(b, "bucket")
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("sim", round(cosine(col("probe_vec"), col("vec")), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "sim", "rank")
  }
}
