package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the native [[CosineSimilarity]] expression to the composed
  * `aggregate(zip_with(...))` formulation it replaced: identical values
  * (bit-exact, not approximate — same widening and accumulation order)
  * and identical null semantics, across float/double element types,
  * length mismatches, null elements, and null arrays.
  */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-expression composed form, kept verbatim as the spec twin. */
  private def composedCosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) = aggregate(
      zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  private def vecs(seed: Int, n: Int, dim: Int): Seq[Array[Float]] =
    (0 until n).map { i =>
      val r = new scala.util.Random(seed + i)
      Array.fill(dim)(r.nextFloat() * 2f - 1f)
    }

  test("native == composed, bit-exact, over random float vectors") {
    val rows = vecs(1, 64, 48).zip(vecs(2, 64, 48))
    val df = rows.toDF("a", "b")
      .withColumn("native", VectorFunctions.cosineSim(col("a"), col("b")))
      .withColumn("composed", composedCosine(col("a"), col("b")))
    val got = df.select("native", "composed").collect()
    assert(got.length == 64)
    got.foreach { r =>
      // == not approx: the doc's parity claim is exact FP equality
      assert(r.getDouble(0) == r.getDouble(1), s"native ${r.getDouble(0)} != composed ${r.getDouble(1)}")
    }
  }

  test("mixed float/double sides (IVF centroid shape)") {
    val df = vecs(3, 16, 8).map(v => (v, v.map(_.toDouble * 0.5 + 0.1))).toDF("f", "d")
      .withColumn("native", VectorFunctions.cosineSim(col("f"), col("d")))
      .withColumn("composed", composedCosine(col("f"), col("d")))
    df.collect().foreach { r =>
      assert(r.getDouble(2) == r.getDouble(3))
    }
  }

  test("null semantics: length mismatch, null element, null array") {
    val df = Seq(
      (Some(Array(1f, 2f)), Some(Array(1f, 2f, 3f))), // length mismatch
      (Some(Array(1f, 2f)), None), // null array
      (Some(Array(1f, 2f)), Some(Array(1f, 2f))) // control
    ).toDF("a", "b")
      // null element via a transform that nulls index 0 of b when a[0] < 0
      .union(Seq((Some(Array(-1f, 2f)), Some(Array(3f, 4f)))).toDF("a", "b"))
      .withColumn("b2",
        when(element_at(col("a"), 1) < 0,
          transform(col("b"), (x, i) => when(i === 0, lit(null)).otherwise(x)))
          .otherwise(col("b")))
      .withColumn("native", VectorFunctions.cosineSim(col("a"), col("b2")))
      .withColumn("composed", composedCosine(col("a"), col("b2")))
    val got = df.select("native", "composed").collect()
    assert(got.length == 4)
    got.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1),
        s"null-semantics drift: native=${r.get(0)} composed=${r.get(1)}")
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1))
    }
    // the three degenerate rows are null, the control row is not
    assert(got.count(_.isNullAt(0)) == 3)
  }

  test("interpreted eval matches codegen (collect forces codegen; eval is direct)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    val a = Array(0.6f, -0.2f, 0.9f)
    val b = Array(0.1f, 0.4f, -0.5f)
    val lit = (v: Array[Float]) => Literal.create(
      ArrayData.toArrayData(v), ArrayType(FloatType, containsNull = false))
    val direct = CosineSimilarity(lit(a), lit(b)).eval(null).asInstanceOf[Double]
    val viaDf = Seq((a, b)).toDF("a", "b")
      .select(VectorFunctions.cosineSim(col("a"), col("b"))).head.getDouble(0)
    assert(direct == viaDf)
  }
}
