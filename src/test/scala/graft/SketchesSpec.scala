package graft

import org.apache.spark.sql.functions._

import graft.functions.Sketches
import graft.operators.TextAnalysis

class SketchesSpec extends SparkSpec {

  private def tokenStream = Tables.documents(spark, sf0001)
    .select(explode(TextAnalysis.tokens(col("text"))).as("token"))

  test("cms estimates never under-count, and are exact without collisions") {
    import spark.implicits._
    val toks = tokenStream.cache()
    val truth = toks.groupBy("token").count()
      .as[(String, Long)].collect().toMap
    // narrow sketch: collisions expected, but min-over-rows only over-counts
    val sk = Sketches.cmsSketch(toks, "token", width = 128, depth = 4)
    val est = Sketches.cmsEstimate(
      toks.distinct(), sk, "token", width = 128, depth = 4)
      .as[(String, Long)].collect().toMap
    truth.foreach { case (t, c) =>
      assert(est(t) >= c, s"under-count for $t: ${est(t)} < $c")
    }
    // wide sketch: with buckets >> distinct tokens, most probes are exact —
    // and every probe is still bounded below by the truth
    val wide = Sketches.cmsEstimate(
      toks.distinct(),
      Sketches.cmsSketch(toks, "token", width = 65536, depth = 4),
      "token", width = 65536, depth = 4)
      .as[(String, Long)].collect().toMap
    val exact = truth.count { case (t, c) => wide(t) == c }
    assert(exact >= truth.size * 9 / 10, s"only $exact/${truth.size} exact at width 65536")
  }

  test("cms: an item the stream never contained estimates 0") {
    import spark.implicits._
    val sk = Sketches.cmsSketch(tokenStream, "token", width = 65536, depth = 4)
    val est = Sketches.cmsEstimate(
      Seq("zzzz_never_a_token_qqqq").toDF("token"), sk, "token", 65536, 4)
      .as[(String, Long)].collect().toMap
    assert(est("zzzz_never_a_token_qqqq") === 0L)
  }

  test("cms sketches merge by per-bucket sum") {
    import spark.implicits._
    val a = tokenStream.limit(2000)
    val b = tokenStream.exceptAll(a)
    val merged = Sketches.cmsSketch(a, "token", 512, 4)
      .unionByName(Sketches.cmsSketch(b, "token", 512, 4))
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
    val whole = Sketches.cmsSketch(tokenStream, "token", 512, 4)
    assert(merged.exceptAll(whole).count() === 0)
    assert(whole.exceptAll(merged).count() === 0)
  }

  test("misra-gries local buffer: superset guarantee and counter lower bounds") {
    import graft.functions.MgBuffer
    val rnd = new scala.util.Random(7)
    // skewed stream: items "h0".."h3" each ~12% of the stream, long tail
    val stream = Seq.fill(4000) {
      val r = rnd.nextInt(100)
      if (r < 48) s"h${r / 12}" else s"t${rnd.nextInt(500)}"
    }
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val k = 16
    val buf = new MgBuffer(k)
    stream.foreach(buf.add(_))
    val bar = stream.size.toLong / (k + 1)
    truth.foreach { case (t, c) =>
      if (c > bar) assert(buf.counts.contains(t), s"missing heavy item $t ($c > $bar)")
    }
    buf.counts.foreach { case (t, est) =>
      val c = truth(t)
      assert(est <= c, s"$t over-counted: $est > $c")
      assert(est >= c - bar, s"$t under-counted past the bound: $est < $c - $bar")
    }
    assert(buf.counts.size <= k)
  }

  test("misra-gries merge keeps the guarantee across arbitrary splits") {
    import graft.functions.MgBuffer
    val rnd = new scala.util.Random(11)
    val stream = Seq.fill(6000) {
      val r = rnd.nextInt(100)
      if (r < 40) s"h${r / 10}" else s"t${rnd.nextInt(800)}"
    }
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val k = 16
    // 7 uneven shards, merged pairwise in a skewed tree
    val shards = stream.grouped(900).toSeq.map { sl =>
      val b = new MgBuffer(k); sl.foreach(b.add(_)); b
    }
    val merged = shards.reduceLeft { (a, b) => a.mergeFrom(b); a }
    val bar = stream.size.toLong / (k + 1)
    truth.foreach { case (t, c) =>
      if (c > bar)
        assert(merged.counts.contains(t), s"merge lost heavy item $t ($c > $bar)")
    }
    merged.counts.foreach { case (t, est) =>
      assert(est <= truth(t), s"$t over-counted after merge")
    }
    assert(merged.counts.size <= k)
  }

  test("heavyHitters = exact tokens above the 1/phi bar (sketch is invisible)") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001)
    val got = TextAnalysis.heavyHitters(docs, phi = 30, capacity = 64)
      .select("token", "cnt").as[(String, Long)].collect().toMap
    val toks = tokenStream
    val n = toks.count()
    val exact = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * 30 > n)
      .as[(String, Long)].collect().toMap
    assert(got === exact)
    assert(got.nonEmpty, "fixture should clear the 1/30 bar somewhere")
  }

  test("hll registers merge by per-bucket max; estimate lands near the truth") {
    import spark.implicits._
    val toks = tokenStream.cache()
    val regs = Sketches.hllRegisters(toks, "token", p = 8)
    // merge property
    val a = toks.limit(2000)
    val b = toks.exceptAll(a)
    val merged = Sketches.hllRegisters(a, "token", 8)
      .unionByName(Sketches.hllRegisters(b, "token", 8))
      .groupBy("bucket").agg(max("register").as("register"))
    assert(merged.exceptAll(regs).count() === 0)
    assert(regs.exceptAll(merged).count() === 0)
    // accuracy: p=8 gives ~6.5% standard error; allow 3 sigma
    val truth = toks.distinct().count().toDouble
    val est = Sketches.hllEstimate(regs, 8)
    assert(math.abs(est - truth) / truth < 0.2, s"est $est vs true $truth")
  }

  test("kmv: unfilled sketches are EXACT counts and exact intersections") {
    import spark.implicits._
    // 5 and 4 distinct values, 3 shared — k=64 holds everything
    val df = (Seq("a", "b", "c", "d", "e").map(("s1", _)) ++
      Seq("c", "d", "e", "f").map(("s2", _))).toDF("src", "v")
    val sk = Sketches.kmv(df, "src", "v", 64)
    val r = Sketches.kmvOverlap(
      sk.where(col("src") === "s1"), sk.where(col("src") === "s2"), 64).head()
    assert(r.getDouble(1) === 5.0)
    assert(r.getDouble(2) === 4.0)
    assert(r.getDouble(3) === 6.0) // |union| exact
    assert(r.getDouble(4) === 3.0) // |intersection| exact (share 3/6 · 6)
  }

  test("kmv mergeability: sketch of the union == bottom-k merge of the sketches") {
    import spark.implicits._
    val a = (0 until 300).map(i => ("k", s"a$i")).toDF("src", "v")
    val b = (0 until 300).map(i => ("k", s"b$i")).toDF("src", "v")
    val k = 32
    val whole = Sketches.kmv(a.union(b), "src", "v", k)
      .head().getSeq[Long](1)
    val ska = Sketches.kmv(a, "src", "v", k).head().getSeq[Long](1)
    val skb = Sketches.kmv(b, "src", "v", k).head().getSeq[Long](1)
    val merged = (ska ++ skb).distinct.sorted.take(k)
    assert(whole === merged, "bottom-k of sketch union must equal union sketch")
  }

  test("kmv estimator lands near the truth on full sketches; union ≥ each side") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001)
    val toks = docs.select(col("source"),
      explode(TextAnalysis.tokens(col("text"))).as("token"))
    val sk = Sketches.kmv(toks, "source", "token", 64)
    val r = Sketches.kmvOverlap(
      sk.where(col("source") === "src0"),
      sk.where(col("source") === "src1"), 64).head()
    val truthA = toks.where(col("source") === "src0")
      .select("token").distinct().count().toDouble
    val truthB = toks.where(col("source") === "src1")
      .select("token").distinct().count().toDouble
    // bottom-64 standard error ~ 1/sqrt(62) ≈ 13%; allow 3 sigma
    assert(math.abs(r.getDouble(1) - truthA) / truthA < 0.4,
      s"est_a ${r.getDouble(1)} vs $truthA")
    assert(math.abs(r.getDouble(2) - truthB) / truthB < 0.4,
      s"est_b ${r.getDouble(2)} vs $truthB")
    assert(r.getDouble(3) >= math.max(r.getDouble(1), r.getDouble(2)) * 0.6)
    assert(r.getDouble(4) <= r.getDouble(3))
  }
}
