package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic hashing that evaluates to IDENTICAL values in Spark and
  * DuckDB, so sketch-based operators (MinHash, SimHash, LSH) can be
  * oracle-checked exactly rather than "rows > 0".
  *
  * Trick: md5 hex strings are identical everywhere; a 13-hex-char prefix
  * is 52 bits — inside both BIGINT and the float53 mantissa — parsed with
  * `conv(_, 16, 10)` in Spark and a `('0x' || _)::BIGINT` cast in DuckDB.
  * Spark's native `hash`/`xxhash64` would be faster but have no DuckDB
  * twin; at scale swap [[hash52]] for `xxhash64` behind the same API.
  */
object DetHash {

  /** Modulus for the MinHash universal-hash family: fits products of
    * (1e9 × 1e5) safely inside a BIGINT. */
  val P: Long = 1000000007L

  /** 52-bit deterministic hash of a string column. */
  def hash52(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 13), 16, 10).cast("long")

  /** Scale-path 52-bit hash: the top bits of Spark's codegen'd
    * `xxhash64`, an order of magnitude cheaper than the md5-hex parse
    * above (no digest, no string round-trip). It has no DuckDB twin, so
    * operators using it get rows-only driver checks; `ExtSpec`
    * property-pins it to the md5 path instead (identical LSH recall on
    * exact duplicates, est_jaccard 1.0 on identical shingle sets). */
  def fastHash52(c: Column): Column =
    shiftrightunsigned(xxhash64(c), 12)

  /** DuckDB rendering of [[hash52]] over a SQL expression. */
  def sqlHash52(expr: String): String =
    s"('0x' || substr(md5($expr), 1, 13))::BIGINT"

  /** 32-bit variant (8 hex chars) for SimHash bit extraction. */
  def hash32(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long")

  def sqlHash32(expr: String): String =
    s"('0x' || substr(md5($expr), 1, 8))::BIGINT"

  /** Fixed universal-hash coefficients (a, b) for the MinHash signature:
    * h_j(x) = (a_j * (x mod P) + b_j) mod P. 16 functions = 4 bands × 4
    * rows. Constants are arbitrary but FROZEN — they define the sketch. */
  val minhashCoeffs: Seq[(Long, Long)] = Seq(
    (737L, 1123L), (947L, 2017L), (1409L, 3251L), (2111L, 4597L),
    (2693L, 5881L), (3331L, 7177L), (4001L, 8513L), (4787L, 9973L),
    (5443L, 11251L), (6101L, 12553L), (6841L, 13901L), (7583L, 15259L),
    (8291L, 16633L), (9011L, 17989L), (9733L, 19391L), (10459L, 20753L))

  /** Spark MinHash column for coefficient j over a pre-hashed value. */
  def minhash(hv: Column, j: Int): Column = {
    val (a, b) = minhashCoeffs(j)
    (lit(a) * (hv % P) + lit(b)) % P
  }

  /** DuckDB rendering of [[minhash]]. */
  def sqlMinhash(hvExpr: String, j: Int): String = {
    val (a, b) = minhashCoeffs(j)
    s"(($a * ($hvExpr % $P) + $b) % $P)"
  }
}
