package graft

import org.apache.spark.sql.functions._

import graft.functions.dist

/** Numeric-parity tests for the distance kernels (mirrors
  * `Test/src/DistanceTest.cpp:88-96` SIMD-vs-scalar equivalence: here
  * codegen path vs plain Scala reference impl).
  */
class DistanceSpec extends SparkSpec {
  import spark.implicits._

  private def refL2sq(a: Seq[Double], b: Seq[Double]) =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
  private def refDot(a: Seq[Double], b: Seq[Double]) =
    a.zip(b).map { case (x, y) => x * y }.sum

  private def evalDist(metric: String, a: Seq[Double], b: Seq[Double]): Double = {
    val df = Seq((a.map(_.toFloat), b.map(_.toFloat))).toDF("a", "b")
    df.select(dist.byName(metric)(col("a"), col("b"))).head.getDouble(0)
  }

  test("l2sq is SQUARED euclidean (reference semantics)") {
    assert(evalDist("l2sq", Seq(0, 0), Seq(3, 4)) === 25.0)
  }

  test("cosine distance of identical vectors is 0, orthogonal is 1") {
    assert(math.abs(evalDist("cos", Seq(1, 2, 3), Seq(1, 2, 3))) < 1e-12)
    assert(math.abs(evalDist("cos", Seq(1, 0), Seq(0, 1)) - 1.0) < 1e-12)
  }

  test("ip is negated dot") {
    assert(evalDist("ip", Seq(1, 2), Seq(3, 4)) === -11.0)
  }

  test("zero-norm cosine yields distance 1") {
    assert(evalDist("cos", Seq(0, 0), Seq(1, 2)) === 1.0)
  }

  test("mixed float/double operands widen exactly") {
    val df = Seq((Seq(1.5f, 2.5f), Seq(0.5, 1.0))).toDF("a", "b")
      .withColumn("b", col("b").cast("array<double>"))
    val got = df.select(dist.l2sq(col("a"), col("b"))).head.getDouble(0)
    assert(got === (1.0 + 2.25))
  }

  test("property: codegen kernels match scalar reference (seeded sweep)") {
    val rnd = new scala.util.Random(42)
    // batch all cases into one DataFrame pass (one Spark job, not 40)
    val cases = Seq.fill(20) {
      (Seq.fill(8)((rnd.nextDouble() * 200 - 100).toFloat),
        Seq.fill(8)((rnd.nextDouble() * 200 - 100).toFloat))
    }
    import spark.implicits._
    val got = cases.toDF("a", "b")
      .select(dist.l2sq(col("a"), col("b")), dist.dot(col("a"), col("b")))
      .collect()
    cases.zip(got).foreach { case ((a, b), row) =>
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      assert(math.abs(row.getDouble(0) - refL2sq(ad, bd)) < 1e-9)
      assert(math.abs(row.getDouble(1) - refDot(ad, bd)) < 1e-9)
    }
  }

  test("interpreted eval matches codegen") {
    // force interpreted path by eval'ing the expression directly
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    val a = Literal.create(new GenericArrayData(Array(1.0f, 2.0f)), ArrayType(FloatType))
    val b = Literal.create(new GenericArrayData(Array(4.0f, 6.0f)), ArrayType(FloatType))
    val e = graft.functions.VectorDistance(a, b, "l2sq")
    assert(e.eval(null) === 25.0)
  }
}
