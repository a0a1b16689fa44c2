package graft

import org.apache.spark.sql.functions._

import graft.operators.Joins

class JoinsSpec extends SparkSpec {

  test("range join: boundary inclusivity, multi-bucket intervals, bucket-width invariance") {
    import spark.implicits._
    val pts = Seq((1L, 10.0), (2L, 19.0), (3L, 20.0), (4L, 35.0), (5L, 100.0))
      .toDF("pid", "x")
    val iv = Seq((10L, 10.0, 20.0), (11L, 18.0, 40.0)).toDF("band", "lo", "hi")
    def run(w: Long) = Joins.rangeJoin(pts, iv, w)
      .select("band", "pid").as[(Long, Long)].collect().toSet
    val expected = Set(
      (10L, 1L), (10L, 2L), (10L, 3L), // [10,20] takes 10, 19, 20 (both ends inclusive)
      (11L, 2L), (11L, 3L), (11L, 4L)) // [18,40] takes 19, 20, 35
    assert(run(5) === expected)
    // the answer cannot depend on the bucketing granularity
    assert(run(1) === expected && run(1000) === expected)
  }

  test("salted join is row-for-row the plain join on a skewed fixture; nulls survive") {
    import spark.implicits._
    // one hot key (0) carrying 80% of the fact side, plus a null saltOn row
    val fact = ((1 to 80).map(i => (0L, i.toLong, s"v$i")) ++
      (1 to 20).map(i => (i.toLong, 1000L + i, s"w$i")))
      .toDF("k", "line", "payload")
      .unionByName(Seq((0L, Option.empty[Long], "nullline"))
        .toDF("k", "line", "payload"))
    val dim = (0 to 20).map(i => (i.toLong, s"dim$i")).toDF("k", "dval")
    val salted = Joins.saltedJoin(fact, dim, "k", "line", 8)
      .select("k", "payload", "dval").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted.toSeq
    val plain = fact.join(dim, Seq("k"))
      .select("k", "payload", "dval").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted.toSeq
    assert(salted === plain)
    assert(salted.count(_._2 == "nullline") === 1)
    // the hot key genuinely fans out over multiple salt values
    val saltSpread = fact.where(col("k") === 0L)
      .select((graft.functions.Hash60(
        coalesce(col("line").cast("string"), lit(""))) % 8).as("s"))
      .distinct().count()
    assert(saltSpread >= 4, s"hot key only used $saltSpread salts")
  }

  test("range join equals the theta-join on a random fixture") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pts = (1 to 300).map(i => (i.toLong, rnd.nextInt(1000).toDouble)).toDF("pid", "x")
    val iv = (1 to 40).map { i =>
      val lo = rnd.nextInt(950).toDouble
      (i.toLong, lo, lo + rnd.nextInt(120))
    }.toDF("band", "lo", "hi")
    val bucketed = Joins.rangeJoin(pts, iv, 64)
      .select("band", "pid").as[(Long, Long)].collect().toSet
    val theta = pts.join(iv, col("x") >= col("lo") && col("x") <= col("hi"))
      .select("band", "pid").as[(Long, Long)].collect().toSet
    assert(bucketed === theta)
    assert(theta.nonEmpty)
  }
}
