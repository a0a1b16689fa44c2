package graft

import org.apache.spark.sql.functions._

import graft.operators.Joins

class JoinsSpec extends SparkSpec {

  test("coalesceIntervals: overlap and touch merge, gaps split, keys isolate, " +
      "duplicates collapse into one island") {
    import spark.implicits._
    val iv = Seq(
      (1L, 0L, 10L), (1L, 5L, 20L),   // overlap -> one island [0, 20]
      (1L, 20L, 30L),                 // touching (lo == prev hi) -> still merges
      (1L, 40L, 50L), (1L, 40L, 50L), // duplicate rows, gap before -> island of 2
      (2L, 0L, 100L)                  // other key
    ).toDF("k", "lo", "hi")
    val got = graft.operators.Joins.coalesceIntervals(iv, "k", "lo", "hi")
      .orderBy("k", "island_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, 0L, 30L, 3L), (1L, 40L, 50L, 2L), (2L, 0L, 100L, 1L)))
    // coverage never double-counts: summed island lengths <= summed inputs
    val covered = got.filter(_._1 == 1L).map(r => r._3 - r._2).sum
    assert(covered === 40L)
  }

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

  test("bloom semi-join equals the plain semi-join; the pre-filter genuinely prunes") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // 2000 fact rows over a 500-key space; 40 matching keys
    val fact = (1 to 2000).map(i => (rnd.nextInt(500).toLong, i.toLong))
      .toDF("k", "line")
      .unionByName(Seq((Option.empty[Long], 9999L)).toDF("k", "line"))
    val keys = (0 until 40).map(i => (i * 7L, s"m$i")).toDF("k", "tag")
    val got = Joins.bloomSemiJoin(fact, keys, "k", numBits = 1 << 12, numHashes = 3)
      .select("k", "line").as[(Long, Long)].collect().toSet
    val plain = fact.join(keys.select("k").distinct(), Seq("k"), "left_semi")
      .select("k", "line").as[(Long, Long)].collect().toSet
    assert(got === plain && got.nonEmpty)
    // the Bloom pass alone must keep every true match (no false negatives)
    // and kill most of the non-matching fact rows
    val bits = Joins.bloomBits(keys.select("k").distinct(), "k", 1 << 12, 3)
    val pass = fact.where(col("k").isNotNull &&
      Joins.bloomMightContain(bits, col("k"), 1 << 12, 3)).count()
    assert(pass >= plain.size, "bloom dropped a true match")
    assert(pass < fact.count() / 2, s"bloom pruned nothing: $pass rows passed")
  }

  test("fuzzy join: blocked pairs match brute force within blocks, each pair once") {
    import spark.implicits._
    val df = Seq(
      (1L, "red widget", 5, "widget"), (2L, "rad widget", 5, "widget"),
      (3L, "red widget", 5, "widget"), (4L, "blue widget", 5, "widget"),
      (5L, "red widget", 6, "widget"), // different block: never paired with 1
      (6L, "red gear", 5, "gear"))
      .toDF("id", "name", "size", "noun")
    val got = Joins.fuzzyJoin(df, "id", "name", Seq("size", "noun"), 2)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSet
    // within block (5, widget): (1,2)=1, (1,3)=0, (2,3)=1, (1,4)=3>2, (2,4)=4>2, (3,4)=3>2
    assert(got === Set((1L, 2L, 1), (1L, 3L, 0), (2L, 3L, 1)))
  }

  test("changelog merge: upsert, delete, insert, same-version delete wins, replay idempotent") {
    import spark.implicits._
    val snap = Seq(
      (1L, 0L, false, "A", 10.0), (2L, 0L, false, "B", 20.0),
      (3L, 0L, false, "C", 30.0), (4L, 0L, false, "D", 40.0))
      .toDF("k", "version", "del", "status", "price")
    val changes = Seq(
      (2L, 1L, false, "B2", 21.0),            // upsert
      (2L, 2L, false, "B3", 22.0),            // later upsert wins
      (3L, 1L, true, "C", 30.0),              // delete
      (4L, 1L, true, "D", 40.0),              // delete...
      (4L, 1L, false, "D2", 41.0),            // ...same-version upsert loses
      (9L, 1L, false, "N", 90.0))             // insert
      .toDF("k", "version", "del", "status", "price")
    def run(s: org.apache.spark.sql.DataFrame) =
      Joins.applyChangelog(s, changes, "k", "version", "del")
        .select("k", "version", "status", "price")
        .as[(Long, Long, String, Double)].collect().toSet
    val expected = Set(
      (1L, 0L, "A", 10.0), (2L, 2L, "B3", 22.0), (9L, 1L, "N", 90.0))
    assert(run(snap) === expected)
    // replaying the merged view against the same batch changes nothing
    val merged = Joins.applyChangelog(snap, changes, "k", "version", "del")
      .withColumn("del", lit(false))
      .select("k", "version", "del", "status", "price")
    assert(run(merged) === expected)
  }

  test("TPC-H anchor semantics: Q13 keeps the zero-order bucket, Q21 matches " +
    "brute-force EXISTS/NOT-EXISTS, Q16 never counts excluded suppliers") {
    val d = sf0001
    // Q13: custdist must cover EVERY customer — zero-order ones included
    // (the left-outer point an inner join silently breaks)
    val q13 = SparkEntry.queries("q199_tpch_q13")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nCust = Tables.customer(spark, d).count()
    assert(q13.map(_._2).sum === nCust, "custdist must partition the customers")
    // brute-force the filtered-outer histogram: customers absent from the
    // filtered orders land in the 0 bucket, not nowhere
    val perCust = Tables.orders(spark, d)
      .where(col("o_orderpriority") =!= "5-LOW")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expect13 = Tables.customer(spark, d).select(col("c_custkey"))
      .collect().map(r => perCust.getOrElse(r.getLong(0), 0L))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(q13.toMap === expect13)
    // Q21: brute-force the double-quantified predicate on the small fixture
    val li = Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"), col("o_orderstatus"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
          .as("late"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getBoolean(3)))
    val bySupp = li.filter(t => t._3 == "F" && t._4)
      .filter { case (ok, sk, _, _) =>
        li.exists(o => o._1 == ok && o._2 != sk) &&
          !li.exists(o => o._1 == ok && o._2 != sk && o._3 == "F" && o._4)
      }
      .groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val sName = Tables.supplier(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val expect = bySupp.map { case (sk, n) => (sName(sk), n) }
    val got = SparkEntry.queries("q204_tpch_q21")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === expect)
    // Q16: no group may count more suppliers than the non-excluded pool
    val nGood = Tables.supplier(spark, d).where(col("s_acctbal") >= 0).count()
    val maxCnt = SparkEntry.queries("q202_tpch_q16")(spark, d)
      .agg(max(col("supplier_cnt"))).head.getLong(0)
    assert(maxCnt <= nGood)
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

  test("skyline: matches brute-force dominance on a random fixture; " +
      "duplicates and ties survive; bucket-count invariance") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pts = (1 to 400).map(i =>
      (i.toLong, rnd.nextInt(50).toDouble, rnd.nextInt(50))) ++
      // a planted duplicate frontier pair: (0,0) twice — neither dominates
      Seq((401L, 0.0, 0), (402L, 0.0, 0))
    val df = pts.toDF("id", "x", "y")
    def brute(ps: Seq[(Long, Double, Int)]) = ps.filter { p =>
      !ps.exists(q => q._2 <= p._2 && q._3 <= p._3 &&
        (q._2 < p._2 || q._3 < p._3))
    }.map(_._1).toSet
    val expect = brute(pts)
    assert(expect.contains(401L) && expect.contains(402L))
    for (b <- Seq(1, 4, 64)) {
      val got = Joins.skyline(df, "x", "y", buckets = b)
        .select("id").as[Long].collect().toSet
      assert(got === expect, s"buckets=$b")
    }
  }

  test("scd2: interval chaining, delete closes without opening, " +
      "delete-beats-upsert tie, insert-only key") {
    import spark.implicits._
    val snap = Seq((1L, 0L, false, "A"), (2L, 0L, false, "A"),
      (3L, 0L, false, "A")).toDF("k", "version", "del", "attr")
    val changes = Seq(
      (1L, 1L, false, "B"),  // key 1: update → two intervals
      (2L, 1L, true, "A"),   // key 2: delete closes v0, opens nothing
      (3L, 1L, true, "A"),   // key 3: same-version tie —
      (3L, 1L, false, "C"),  //   the delete must win
      (4L, 2L, false, "D"))  // key 4: insert-only, current from v2
      .toDF("k", "version", "del", "attr")
    val got = Joins.scd2(snap, changes, "k", "version", "del")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
      .sortBy(r => (r._1, r._3))
    assert(got.toSeq === Seq(
      (1L, "B", 1L, -1L, true),
      (1L, "A", 0L, 1L, false),
      (2L, "A", 0L, 1L, false),
      (3L, "A", 0L, 1L, false),
      (4L, "D", 2L, -1L, true)).sortBy(r => (r._1, r._3)))
  }

  test("skyline local prune never drops a frontier point on an " +
      "anti-correlated (all-frontier) fixture") {
    import spark.implicits._
    // y = 100 - x: every point is on the frontier
    val df = (0 to 100).map(i => (i.toLong, i.toDouble, 100 - i))
      .toDF("id", "x", "y")
    assert(Joins.skyline(df, "x", "y", buckets = 8).count() === 101)
  }
}
