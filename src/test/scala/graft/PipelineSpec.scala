package graft

import graft.operators.Pipeline

/** End-to-end curation pipeline composition (q71's operator): each stage
  * must remove exactly its kind of offender and nothing else.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("curriculum: per-source tiers are quality-ordered, pct spans [0,1]") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf0001)
    val cur = Pipeline.curriculum(docs, 4).cache()
    // every (source, tier) respects ordering: max quality of tier t+1 never
    // exceeds min quality of tier t (quality DESC fills tier 1 first)
    val byTier = cur.groupBy("source", "tier")
      .agg(min(col("quality")).as("lo"), max(col("quality")).as("hi"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    byTier.keys.groupBy(_._1).foreach { case (src, ks) =>
      val tiers = ks.map(_._2).toSeq.sorted
      assert(tiers === (1 to tiers.max), s"$src: missing tier")
      tiers.sliding(2).foreach {
        case Seq(a, b) =>
          assert(byTier((src, b))._2 <= byTier((src, a))._1,
            s"$src: tier $b quality overlaps above tier $a")
        case _ =>
      }
      // ntile balance: sizes differ by at most 1
      val sizes = tiers.map(t => byTier((src, t))._3)
      assert(sizes.max - sizes.min <= 1, s"$src: unbalanced ntile $sizes")
    }
    val mm = cur.agg(min(col("pct")), max(col("pct"))).head()
    assert(mm.getDouble(0) === 0.0 && mm.getDouble(1) === 1.0)
    cur.unpersist()
    ()
  }

  test("profile: exact counts, null accounting, deterministic modal value") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (Some("a"), 1L), (Some("a"), 2L), (Some("b"), 2L), (None, 3L)
    ).toDF("s", "k")
    val got = Pipeline.profile(df, Seq("s", "k")).orderBy("column").collect()
    val k = got(0) // "k" sorts before "s"
    assert((k.getString(0), k.getLong(1), k.getLong(2), k.getLong(3)) ===
      (("k", 4L, 0L, 3L)))
    assert((k.getString(4), k.getString(5)) === (("1", "3"))) // lexicographic
    assert((k.getString(6), k.getLong(7)) === (("2", 2L)))
    assert(k.getDouble(8) === 0.5)
    val s = got(1)
    assert((s.getString(0), s.getLong(1), s.getLong(2), s.getLong(3)) ===
      (("s", 4L, 1L, 2L)))
    assert((s.getString(6), s.getLong(7)) === (("a", 2L)))
    assert(s.getDouble(8) === 0.5)
  }

  test("mixtureBudgetSelect: per-source greedy prefix under the weighted budget") {
    import org.apache.spark.sql.functions._
    import graft.operators.TextAnalysis
    val docs = Tables.documents(spark, sf0001)
    val total = 2000L
    val got = Pipeline.mixtureBudgetSelect(docs, total).cache()
    // every kept row respects ITS source budget, and budgets split the total
    assert(got.where(col("cum_tokens") > col("src_budget")).count() === 0)
    val budgets = got.select("source", "src_budget").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(budgets.values.sum <= total,
      "floor'd per-source budgets must not exceed the total")
    // greedy-prefix check on one source: kept set == the quality-DESC
    // prefix whose running token total stays within the budget
    val src = budgets.keys.min
    val ordered = docs.where(col("source") === src)
      .select(col("doc_id"), TextAnalysis.quality(col("text")).as("q"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .collect().sortBy(r => (-r.getDouble(1), r.getLong(0)))
    var cum = 0L
    val expect = ordered.takeWhile { r => cum += r.getLong(2); cum <= budgets(src) }
      .map(_.getLong(0)).toSet
    val kept = got.where(col("source") === src)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === expect, s"$src greedy prefix mismatch")
    got.unpersist()
    ()
  }

  test("kAnonymity flags small quasi-classes; kAnonymize suppresses exactly them") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      ("en", "web"), ("en", "web"), ("en", "web"), // class of 3: safe at k=3
      ("fr", "web"),                               // class of 1: at risk
      ("en", "book"), ("en", "book")               // class of 2: at risk
    ).toDF("lang", "src")
    val audit = Pipeline.kAnonymity(df, Seq("lang", "src"), 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    assert(audit(("en", "web")) === ((3L, false)))
    assert(audit(("fr", "web")) === ((1L, true)))
    assert(audit(("en", "book")) === ((2L, true)))
    val kept = Pipeline.kAnonymize(df, Seq("lang", "src"), 3)
    assert(kept.count() === 3)
    assert(kept.where(col("src") =!= "web" || col("lang") =!= "en").count() === 0)
  }

  test("groupAwareSplit keeps near-dup groups whole; leakageAudit proves it " +
    "and catches the per-doc split's straddle") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sf0001)
    val pairs = Dedup.minhashDedup(docs, 0.3).cache()
    assert(pairs.count() > 0, "fixture has no near-dup pairs — test is vacuous")
    val groups = Dedup.canonicalGroups(docs, pairs)
    // group-keyed split: every member of a group carries ONE split
    val gs = Pipeline.groupAwareSplit(docs, groups).cache()
    val splitsPerGroup = gs.groupBy("canon_id")
      .agg(countDistinct(col("split")).as("k"))
      .agg(max(col("k"))).head().getLong(0)
    assert(splitsPerGroup === 1L, "a near-dup group straddles splits")
    // audit: zero off-diagonal for the group split
    val auditG = Pipeline.leakageAudit(gs.select(col("doc_id"), col("split")), pairs)
      .where(col("split_a") =!= col("split_b")).count()
    assert(auditG === 0L)
    // the naive per-doc split leaks on a planted cross-split pair: force it
    // by splitting a known pair's members apart
    val p0 = pairs.select("a", "b").head()
    val forced = docs.select(col("doc_id"),
      when(col("doc_id") === p0.getLong(0), "train")
        .when(col("doc_id") === p0.getLong(1), "test")
        .otherwise("train").as("split"))
    val auditN = Pipeline.leakageAudit(forced, pairs)
      .where(col("split_a") =!= col("split_b"))
      .agg(coalesce(sum(col("n_pairs")), lit(0L))).head().getLong(0)
    assert(auditN >= 1L, "planted cross-split pair not counted")
    gs.unpersist(); pairs.unpersist()
    ()
  }

  test("interleave: schedule prefixes honor the mixture; unlisted sources drop") {
    import org.apache.spark.sql.functions._
    val docs = (0L until 300L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val weights = Seq(("src0", 0.6), ("src1", 0.3)).toDF("source", "weight")
    val sched = Pipeline.interleave(docs, weights)
      .orderBy("sched_key", "doc_id").collect()
    // src2 is unlisted → dropped entirely
    assert(sched.length === 200)
    assert(!sched.exists(_.getString(1) == "src2"))
    // determinism: same call, same schedule
    val again = Pipeline.interleave(docs, weights)
      .orderBy("sched_key", "doc_id").collect()
    assert(sched.map(_.getLong(0)).toSeq === again.map(_.getLong(0)).toSeq)
    // mixture property: every prefix carries sources near the 2:1 ratio —
    // after n draws, src0 count is within 1 of 2/3·n scaled by availability
    for (n <- Seq(30, 90, 150)) {
      val c0 = sched.take(n).count(_.getString(1) == "src0")
      val expected = n * (0.6 / 0.9)
      assert(math.abs(c0 - expected) <= 1.0,
        s"prefix $n: src0 count $c0 vs expected $expected")
    }
    // sched_key is (rank - 0.5)/w exactly
    val r = sched.find(x => x.getString(1) == "src1" && x.getInt(2) == 1).get
    assert(r.getDouble(3) === 0.5 / 0.3)
  }

  test("profile modal tie resolves to the smallest value string") {
    import org.apache.spark.sql.functions._
    val df = Seq("b", "b", "a", "a").toDF("v")
    val got = Pipeline.profile(df, Seq("v")).head()
    assert(got.getString(6) === "a")
  }

  test("profile keeps an all-NULL column as a row with NULL stats") {
    import org.apache.spark.sql.functions._
    val df = Seq(1L, 2L).toDF("k")
      .withColumn("dead", lit(null).cast("string"))
    val got = Pipeline.profile(df, Seq("dead", "k")).orderBy("column").collect()
    val dead = got(0)
    assert((dead.getString(0), dead.getLong(1), dead.getLong(2), dead.getLong(3)) ===
      (("dead", 2L, 2L, 0L)))
    assert(dead.isNullAt(4) && dead.isNullAt(5) && dead.isNullAt(6))
    assert(dead.isNullAt(7) && dead.isNullAt(8))
  }

  test("qualityQuantiles = exact type-1 quantiles of the collected per-doc scores") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf0001)
    val pcts = Seq(25, 50, 75, 90)
    val got = Pipeline.qualityQuantiles(docs, pcts)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val vals = docs
      .select(graft.operators.TextAnalysis.quality(col("text")).as("v"))
      .as[Double].collect().sorted
    val n = vals.length
    pcts.foreach { p =>
      val rank = (p * n + 99) / 100 // ceil(p·n/100) in integers
      assert(got(p) === vals(rank - 1), s"p$p")
    }
    assert(got.values.toSeq.sorted === pcts.map(got).sorted, "monotone")
  }

  test("curate composes quality floor, exact dedup, near-dup dedup, decontamination") {
    val base = "the quick brown fox jumps over the lazy dog near the river bank"
    val corpus = Seq(
      (1L, base), // keeper (canonical of 2 and 3)
      (2L, base), // exact duplicate → dropped
      (3L, base + " today"), // near duplicate → dropped
      (4L, "!!!???!!!"), // tokenless garbage → quality floor drops it
      (5L, "completely separate eval benchmark question about spark engines"), // leaked eval doc
      (6L, "an entirely different clean document with plenty of the usual words in it")
    ).toDF("doc_id", "text")
    val evalSet = Seq(
      (100L, "completely separate eval benchmark question about spark engines")
    ).toDF("doc_id", "text")
    val kept = Pipeline.curate(corpus, evalSet,
      minQuality = 0.3, jaccardThreshold = 0.3, maxOverlap = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 6L), s"kept $kept")
    // an empty eval set only disables decontamination, nothing else
    val keptNoEval = Pipeline.curate(corpus, evalSet.limit(0),
      minQuality = 0.3, jaccardThreshold = 0.3, maxOverlap = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(keptNoEval === Set(1L, 5L, 6L), s"kept $keptNoEval")
  }

  test("contamination is bounded and monotone in the eval set") {
    val docs = Tables.documents(spark, sf0001)
    val corpus = docs.where(org.apache.spark.sql.functions.col("doc_id") % 5 =!= 0)
    val evalSmall = docs.where(org.apache.spark.sql.functions.col("doc_id") % 10 === 0)
    val evalBig = docs.where(org.apache.spark.sql.functions.col("doc_id") % 5 === 0)
    val small = graft.operators.Dedup.contamination(corpus, evalSmall)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val big = graft.operators.Dedup.contamination(corpus, evalBig)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(small.values.forall(c => c >= 0.0 && c <= 1.0))
    // a SUPERSET eval set can only raise (never lower) any doc's overlap
    assert(small.forall { case (id, c) => big(id) >= c - 1e-9 },
      "contamination decreased under a larger eval set")
  }

  test("sourceStats reports per-source count, mean quality, and dup rate") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "srcA"),
      (2L, "the quick brown fox jumps over the lazy dog", "srcA"), // dup of 1
      (3L, "a different document for the first source today", "srcA"),
      (4L, "the only document of the second source", "srcB")
    ).toDF("doc_id", "text", "source")
    val r = Pipeline.sourceStats(docs)
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("srcA").getLong(1) === 3L && r("srcB").getLong(1) === 1L)
    // srcA has one non-canonical duplicate of three docs
    assert(r("srcA").getDouble(3) === 0.3333 && r("srcB").getDouble(3) === 0.0)
    // mean quality matches the per-doc scores exactly (DECIMAL-summed)
    val perDoc = graft.operators.TextAnalysis.stats(docs)
      .collect().map(x => x.getLong(0) -> x.getDouble(6)).toMap
    val expectA = BigDecimal((perDoc(1L) + perDoc(2L) + perDoc(3L)) / 3)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r("srcA").getDouble(2) === expectA)
  }

  test("mixtureSample keeps each source near its target weight, deterministically") {
    import org.apache.spark.sql.functions._
    val docs = spark.range(4000).select(
      col("id").as("doc_id"), lit("text").as("text"),
      concat(lit("s"), pmod(col("id"), lit(4))).as("source"))
    val weights = Seq("s0" -> 0.1, "s1" -> 0.5, "s2" -> 1.0)
    val kept = Pipeline.mixtureSample(docs, weights, defaultWeight = 0.9)
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 1000 draws per source; the hash draw should land within ±6% absolute
    assert(math.abs(kept.getOrElse("s0", 0L) - 100L) <= 60, s"s0=${kept.get("s0")}")
    assert(math.abs(kept("s1") - 500L) <= 60, s"s1=${kept("s1")}")
    assert(kept("s2") === 1000L, "weight 1.0 must keep everything")
    assert(math.abs(kept("s3") - 900L) <= 60, s"s3=${kept("s3")}")
    // deterministic: the same salt re-selects the identical doc set
    val a = Pipeline.mixtureSample(docs, weights).select("doc_id").collect().toSet
    val b = Pipeline.mixtureSample(docs, weights).select("doc_id").collect().toSet
    assert(a === b)
    // a different salt draws a genuinely different sample
    val c = Pipeline.mixtureSample(docs, weights, salt = "other")
      .select("doc_id").collect().toSet
    assert(a !== c)
  }

  test("mixtureSample draws against integer thresholds (no float-boundary ambiguity)") {
    import org.apache.spark.sql.functions._
    val docs = spark.range(10000).select(
      col("id").as("doc_id"), lit("t").as("text"), lit("s0").as("source"))
    // 0.07·10000 is not exactly representable in double — the integer
    // threshold round(0.07·10000)=700 makes the keep set engine-independent:
    // exactly the docs whose draw is < 700
    val kept = Pipeline.mixtureSample(docs, Seq("s0" -> 0.07))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val draws = docs.select(col("doc_id"),
      (graft.functions.Hash60(concat(col("doc_id").cast("string"), lit(":mix")))
        % 10000L).as("u")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kept === draws.filter(_._2 < 700L).keySet)
  }

  test("mixtureUpsample repeats by whole weight plus fractional draw; w<=1 matches mixtureSample") {
    import org.apache.spark.sql.functions._
    val docs = spark.range(2000).select(
      col("id").as("doc_id"), lit("t").as("text"),
      when(col("id") % 2 === 0, "hi").otherwise("lo").as("source"))
    val up = Pipeline.mixtureUpsample(docs, Seq("hi" -> 2.5, "lo" -> 0.3))
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n"), max(col("rep")).as("maxRep"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val hi = up.filter(_._2 == "hi")
    assert(hi.forall(t => t._3 == 2 || t._3 == 3), "hi docs get 2 or 3 copies")
    assert(hi.exists(_._3 == 3) && hi.exists(_._3 == 2), "fractional draw splits hi docs")
    // rep is a dense 0-based index
    up.foreach(t => assert(t._4 == t._3 - 1, s"rep gap for ${t._1}"))
    // the fractional-keep decision for w<=1 is mixtureSample's keep set
    val lo = up.filter(_._2 == "lo").map(_._1).toSet
    val sampled = Pipeline.mixtureSample(docs, Seq("hi" -> 2.5, "lo" -> 0.3))
      .where(col("source") === "lo")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(lo === sampled)
    assert(lo.nonEmpty && lo.size < 1000, "lo keeps a strict non-empty subset")
  }

  test("qualityQuantileFloor keeps each source's own top quantile") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val kept = Pipeline.qualityQuantileFloor(docs, 0.4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val scored = docs.select(col("doc_id"), col("source"),
      graft.operators.TextAnalysis.quality(col("text")).as("q"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    scored.groupBy(_._2).foreach { case (src, ds) =>
      val inSrc = ds.sortBy(d => (d._3, d._1))
      val keptSrc = inSrc.filter(d => kept(d._1))
      // the kept set is the TOP of the per-source (quality, id) order —
      // a suffix of the ascending sort — and roughly the top 60%
      assert(keptSrc.toSeq === inSrc.takeRight(keptSrc.length).toSeq, s"source $src")
      val frac = keptSrc.length.toDouble / inSrc.length
      assert(frac > 0.4 && frac < 0.8, s"source $src kept $frac")
    }
  }

  test("tokenBudgetSelect takes a quality-ordered prefix per source within budget") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val budget = 300L
    val got = Pipeline.tokenBudgetSelect(docs, budget)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.nonEmpty)
    got.foreach { case (_, _, cum) => assert(cum <= budget) }
    val order = docs.select(col("doc_id"), col("source"),
      graft.operators.TextAnalysis.quality(col("text")).as("q"),
      size(graft.operators.TextAnalysis.tokens(col("text"))).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3)))
    order.groupBy(_._2).foreach { case (src, ds) =>
      val ranked = ds.sortBy(d => (-d._3, d._1))
      val keptIds = got.filter(_._2 == src).map(_._1).toSet
      // greedy prefix: the kept docs are exactly the longest head of the
      // quality-descending order whose token cumsum fits the budget
      val prefix = ranked.map(_._4.toLong).scanLeft(0L)(_ + _).tail
        .takeWhile(_ <= budget).length
      assert(keptIds === ranked.take(prefix).map(_._1).toSet, s"source $src")
    }
  }

  test("qualityQuantileFloorApprox agrees with the exact histogram form at high accuracy") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val exact = Pipeline.qualityQuantileFloor(docs, 0.4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val approx = Pipeline.qualityQuantileFloorApprox(docs, 0.4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(approx.nonEmpty && approx.size < docs.count())
    // the two forms place the per-source cutoff at most a rank apart
    // (nearest-rank vs percent_rank definitions; amplified on tiny fixture
    // sources) — every disagreement must sit BETWEEN the two thresholds,
    // never mid-distribution
    val scored = docs.select(col("doc_id"), col("source"),
      graft.operators.TextAnalysis.quality(col("text")).as("q"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    scored.groupBy(_._2).foreach { case (src, ds) =>
      def thr(kept: Set[Long]): Double =
        ds.filter(d => kept(d._1)).map(_._3).minOption.getOrElse(Double.MaxValue)
      val lo = math.min(thr(exact), thr(approx))
      val hi = math.max(thr(exact), thr(approx))
      ds.filter(d => exact(d._1) != approx(d._1)).foreach { d =>
        assert(d._3 >= lo && d._3 < hi,
          s"source $src: doc ${d._1} (q=${d._3}) differs outside cutoff band [$lo,$hi)")
      }
    }
    val overlap = (exact & approx).size.toDouble / math.max(exact.size, approx.size)
    assert(overlap >= 0.85, s"exact/approx overlap $overlap")
  }

  test("shardAssign: reproducible balanced permutation with dense per-shard ranks") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val n = docs.count()
    val a = Pipeline.shardAssign(docs, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // a permutation: every doc exactly once, shards in range
    assert(a.length === n.toInt)
    assert(a.map(_._1).toSet.size === n.toInt)
    assert(a.forall(t => t._2 >= 0 && t._2 < 8))
    // dense ranks per shard starting at 1
    a.groupBy(_._2).foreach { case (sh, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq, s"shard $sh")
    }
    // uniform draw: no shard hoards the corpus (md5 balance, loose bound)
    assert(a.groupBy(_._2).values.map(_.length).max < n / 8 * 2)
    // reproducible; a new salt is a different permutation of the same docs
    val b = Pipeline.shardAssign(docs, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.sorted.toSeq === b.sorted.toSeq)
    val c = Pipeline.shardAssign(docs, 8, salt = "other")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(c.sorted.toSeq !== a.sorted.toSeq)
    assert(c.map(_._1).toSet === a.map(_._1).toSet)
  }

  test("packSequences cuts per-bucket token streams at the budget") {
    import org.apache.spark.sql.functions._
    // 40 docs of 10 tokens each, ONE bucket, budget 64: packs of 6.4 docs
    val docs = spark.range(40).select(col("id").as("doc_id"),
      lit(Seq.fill(10)("tok").mkString(" ")).as("text"))
    val r = Pipeline.packSequences(docs, budgetTokens = 64L, buckets = 1)
      .orderBy("doc_id").collect()
    assert(r.forall(_.getLong(1) === 0L), "one bucket expected")
    assert(r.forall(x => x.getLong(4) >= 0 && x.getLong(4) < 64),
      "pack offsets must sit inside the budget")
    // pack ids are non-decreasing in id order and start at 0
    val packs = r.map(_.getLong(3)).toSeq
    assert(packs.head === 0L && packs.zip(packs.tail).forall { case (p, n) => n >= p })
    // total tokens 400 → first token of the last doc is at offset 390 → pack 6
    assert(packs.last === (390 / 64).toLong)
    // multi-bucket: each bucket's stream packs independently from offset 0
    val multi = Pipeline.packSequences(docs, budgetTokens = 64L, buckets = 4)
      .collect()
    val byBucket = multi.groupBy(_.getLong(1))
    assert(byBucket.keySet === Set(0L, 1L, 2L, 3L))
    byBucket.values.foreach { rows =>
      val first = rows.minBy(_.getLong(0))
      assert(first.getLong(3) === 0L && first.getLong(4) === 0L,
        "every bucket stream must start at pack 0 offset 0")
    }
  }

  test("curateV2 wires the rule gate, LM floor, and dedup chain together") {
    import org.apache.spark.sql.functions._
    import graft.operators.TextAnalysis
    val fluent = (1 to 10).map(i =>
      (i.toLong, s"the quick brown fox number $i jumps over the lazy dog " +
        "and runs along the river bank with the happy sound of water"))
    val docs = (fluent ++ Seq(
      (20L, fluent.head._2), // exact duplicate of doc 1 → dropped
      (21L, "too short here"), // rule gate: < 10 tokens → dropped
      (22L, "zq wv xk jj pq mn rr tt uu vv ww yy zz aa bb cc dd ee the of") // gibberish bigrams
    )).toDF("doc_id", "text")
    val evalDocs = Seq((100L, "completely separate holdout material")).toDF("doc_id", "text")
    // place the LM floor between the gibberish doc's score and the fluent
    // docs' scores (components are oracle-gated; this test checks WIRING)
    val scores = TextAnalysis.ngramLmScore(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val floor = (scores(22L) + fluent.map(f => scores(f._1)).min) / 2
    val kept = Pipeline.curateV2(docs, evalDocs, floor, 0.9, 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(1L) && !kept.contains(20L), "exact dup must drop, canonical stays")
    assert(!kept.contains(21L), "rule-gate failure must drop")
    assert(!kept.contains(22L), "LM-floor failure must drop")
    assert((2L to 10L).forall(kept.contains), s"fluent docs survive: $kept")
  }

  test("stratifiedSplit: deterministic, stable under growth, ~80/10/10") {
    val docs = (0L until 1000L).map(i => (i, s"doc $i", s"src${i % 3}"))
      .toDF("doc_id", "text", "source")
    val s1 = Pipeline.stratifiedSplit(docs).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val frac = s1.values.groupBy(identity).view.mapValues(_.size / 1000.0).toMap
    assert(math.abs(frac("train") - 0.8) < 0.05, s"train share: $frac")
    assert(math.abs(frac("val") - 0.1) < 0.03 && math.abs(frac("test") - 0.1) < 0.03)
    // growth stability: the first 500 docs keep their split when 500 more arrive
    val s2 = Pipeline.stratifiedSplit(docs.where("doc_id < 500")).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(s2.forall { case (id, sp) => s1(id) == sp })
  }

  test("mixtureWeights: sums to one, alpha<1 flattens toward uniform") {
    val docs = Seq(
      (1L, "a b c d e f g h i j k l m n o p q r s t", "big"),
      (2L, "a b c d e f g h i j k l m n o p q r s t", "big"),
      (3L, "a b", "small")
    ).toDF("doc_id", "text", "source")
    val w = Pipeline.mixtureWeights(docs, alpha = 0.5).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(math.abs(w.values.sum - 1.0) < 1e-4, s"weights: $w")
    // natural share of small = 2/42; sqrt-tempering must lift it above that
    assert(w("small") > 2.0 / 42.0 && w("big") < 40.0 / 42.0)
  }

  test("training-set assembly: stages only shrink, shards cover, positions are dense") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf0001)
    val manifest = Pipeline.assembleTrainingSet(
      docs, col("lang") === "en", impFloor = -0.02,
      window = 32, stride = 24, numShards = 16).cache()
    val survivors = manifest.select("doc_id").distinct()
    // survivors passed the rule gate (stage monotonicity)
    val gatedIds = graft.operators.TextAnalysis.ruleFilter(docs)
      .where(col("keep")).select("doc_id")
    assert(survivors.exceptAll(gatedIds).count() === 0)
    assert(survivors.count() > 0 && survivors.count() < docs.count())
    // no surviving doc is a non-canonical exact duplicate
    val kept = docs.join(survivors, Seq("doc_id"), "left_semi")
    assert(graft.operators.Dedup.exact(kept)
      .where(col("doc_id") =!= col("canon_id")).count() === 0)
    // positions are dense 1..n within every shard (a loader can seek)
    val bad = manifest.groupBy("shard")
      .agg(count(lit(1)).as("n"), max(col("pos")).as("mx"), min(col("pos")).as("mn"))
      .where(col("mx") =!= col("n") || col("mn") =!= 1L)
    assert(bad.count() === 0)
  }

  test("quality percentile: histogram form equals the naive per-source percent_rank") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf0001)
    val got = Pipeline.qualityPercentile(docs)
    val w = Window.partitionBy(col("source"))
      .orderBy(graft.operators.TextAnalysis.quality(col("text")))
    val reference = docs.select(col("doc_id"), col("source"),
      round(percent_rank().over(w), 6).as("pr"))
    assert(got.exceptAll(reference).count() === 0)
    assert(reference.exceptAll(got).count() === 0)
    // range sanity: [0, 1], with both ends attained in a multi-doc source
    val ext = got.agg(min(col("pr")), max(col("pr"))).head()
    assert(ext.getDouble(0) === 0.0 && ext.getDouble(1) === 1.0)
  }

  test("source cap: two-level rank equals the single-window reference, caps exactly") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import graft.functions.Hash60
    val docs = Tables.documents(spark, sf0001)
    val capped = Pipeline.sourceCap(docs, maxDocs = 10)
    // exact cap: min(cap, source size) survivors per source
    val bySrc = capped.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val inSrc = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    inSrc.foreach { case (s, n) =>
      assert(bySrc(s) === math.min(10L, n), s"source $s: ${bySrc.get(s)} of $n")
    }
    // identical to the naive one-window-per-source formulation
    val w = Window.partitionBy(col("source"))
      .orderBy(Hash60(concat_ws("|", lit("cap"), col("doc_id"))), col("doc_id"))
    val reference = docs
      .withColumn("pick_rank", row_number().over(w).cast("long"))
      .where(col("pick_rank") <= 10)
      .select(col("doc_id"), col("source"), col("pick_rank"))
    assert(capped.exceptAll(reference).count() === 0)
    assert(reference.exceptAll(capped).count() === 0)
  }

  test("weightedSample: top-k aggregate equals the sorted race; weight bias is real") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 400 docs, weights 1 or 20 (heavy docs are ids 0-99)
    val docs = (0 until 400)
      .map(i => (i.toLong, if (i < 100) 20.0 else 1.0))
      .toDF("doc_id", "w")
    val k = 50
    val got = Pipeline.weightedSample(docs, col("w"), k)
      .select("doc_id").as[Long].collect().toSet
    assert(got.size === k)
    // reference: sort the SAME race keys (computed by the operator's own
    // column) and take the k smallest — the aggregate must agree
    val keys = Pipeline.weightedSample(docs, col("w"), 400)
      .select("doc_id", "race_key").as[(Long, Double)].collect()
      .sortBy { case (id, key) => (key, id) }.take(k).map(_._1).toSet
    assert(got === keys)
    // Exponential(20) arrivals beat Exponential(1) ~20:1 — with 100 heavy
    // vs 300 light docs the 50 winners should be dominated by heavy ids
    val heavy = got.count(_ < 100)
    assert(heavy > 30, s"only $heavy/50 winners were heavy-weight docs")
    // zero/negative/null weights can never win
    val withBad = docs.withColumn("w",
      when(col("doc_id") % 2 === 0, lit(-1.0)).otherwise(col("w")))
    val oddOnly = Pipeline.weightedSample(withBad, col("w"), 30)
      .select("doc_id").as[Long].collect()
    assert(oddOnly.forall(_ % 2 === 1))
  }

  test("zorderKey matches the bit-interleave reference and preserves quadrant locality") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map(i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    val rnd = new scala.util.Random(3)
    val pts = (1 to 200).map(_ => (rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Pipeline.zorderKey(col("x"), col("y"), 8).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z === ref(x, y, 8), s"($x,$y)") }
    // locality: all points of a 16×16 quadrant occupy ONE contiguous
    // z-range of exactly 256 codes — the property that makes z-sorted
    // layout prune on either dimension
    val quad = for (x <- 16L until 32L; y <- 32L until 48L) yield ref(x, y, 8)
    assert(quad.max - quad.min === 255L && quad.toSet.size === 256)
  }

  test("psi: zero on identical snapshots, grows with planted drift, bins partition") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // identical distributions → every term is 0 (p_a == p_b exactly:
    // equal counts and equal totals make the divides bit-identical)
    val same = (0 until 400).map(i => (i % 2 == 0, ((i / 2) % 10) / 10.0 + 0.05))
      .toDF("snap", "score")
    val zero = graft.operators.Eval.psi(same)
    assert(zero.agg(sum(abs(col("term")))).first().getDouble(0) === 0.0)
    assert(zero.agg(sum(col("n_a") + col("n_b"))).first().getLong(0) === 400L)
    // planted shift: snapshot A low scores, B high → large positive PSI
    val drift = ((0 until 200).map(i => (true, 0.15 + (i % 2) * 0.1)) ++
      (0 until 200).map(i => (false, 0.75 + (i % 2) * 0.1)))
      .toDF("snap", "score")
    val psiSum = graft.operators.Eval.psi(drift)
      .agg(sum(col("term"))).first().getDouble(0)
    assert(psiSum > 0.25, s"planted drift read PSI=$psiSum")
  }

  test("groupQuantiles: hand-exact per-group percentiles, lower-value rank rule") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (Seq.fill(3)(("a", 10L)) ++ Seq.fill(6)(("a", 20L)) ++
      Seq(("a", 99L)) ++ (1L to 4L).map(v => ("b", v)))
      .toDF("source", "v")
    val got = Pipeline.groupQuantiles(df, "source", "v", Seq(25, 50, 90, 100))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    // a: n=10, cum(10)=3, cum(20)=9, cum(99)=10 → p25=10, p50=20, p90=20, p100=99
    assert(got(("a", 25)) === 10L && got(("a", 50)) === 20L)
    assert(got(("a", 90)) === 20L && got(("a", 100)) === 99L)
    // b: 1,2,3,4 → p25=1, p50=2, p90=4, p100=4
    assert(got(("b", 25)) === 1L && got(("b", 50)) === 2L &&
      got(("b", 90)) === 4L && got(("b", 100)) === 4L)
  }

  test("madOutliers: flags the planted outlier, not the tight cluster; MAD=0 degeneracy") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // source A: scores clustered at 0.50±0.02 plus one planted 0.95 —
    // median 0.50, MAD 0.01 (deviations 0,1,1,2,2 → lower median 100),
    // flag bar 4.4478·MAD = 445 → only the planted doc (d=4500) flags
    val a = Seq((1L, "a", 0.50), (2L, "a", 0.49), (3L, "a", 0.51),
      (4L, "a", 0.48), (5L, "a", 0.52), (6L, "a", 0.95))
    // source B: over half identical → MAD 0, every off-median doc flags
    val b = Seq((10L, "b", 0.30), (11L, "b", 0.30), (12L, "b", 0.30),
      (13L, "b", 0.31))
    val docs = (a ++ b).toDF("doc_id", "source", "q")
    val got = Pipeline.madOutliers(docs, col("q"))
      .select("doc_id").as[Long].collect().toSet
    assert(got === Set(6L, 13L))
  }

  test("calibration: integer-exact bin stats on a hand-checked fixture") {
    import spark.implicits._
    val scored = Seq(
      (true, 0.95), (false, 0.95), (true, 1.0),  // bin 9
      (false, 0.05), (false, 0.0),               // bin 0
      (true, 0.5))                               // bin 5
      .toDF("gold", "score")
    val rows = graft.operators.Eval.calibration(scored, 10)
      .orderBy("bin").collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(0, 5, 9))
    val bin9 = rows(2)
    assert(bin9.getLong(1) === 3 && bin9.getLong(2) === 2)
    // mean score (0.95+0.95+1.0)/3 = 0.966667; pos rate 2/3
    assert(bin9.getDouble(3) === 0.966667 && bin9.getDouble(4) === 0.666667)
    // brier: ((9500-10000)^2 + (9500-0)^2 + (10000-10000)^2)/3/1e8 = 0.30166*
    assert(math.abs(bin9.getDouble(5) - ((500.0 * 500 + 9500.0 * 9500) / 3 / 1e8)) < 1e-6)
    val bin0 = rows(0)
    assert(bin0.getLong(1) === 2 && bin0.getLong(2) === 0 &&
      bin0.getDouble(4) === 0.0)
  }

  test("corpusDiff: added/removed/changed classified; unchanged omitted") {
    import spark.implicits._
    val prev = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
    val cur = Seq((1L, "alpha"), (2L, "beta CHANGED"), (4L, "delta"))
      .toDF("doc_id", "text")
    val got = Pipeline.corpusDiff(prev, cur).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq === Seq((2L, "changed"), (3L, "removed"), (4L, "added")))
  }

  test("groupOls: exact line recovers corr=1/beta=2; degenerate variance " +
      "emits NULL, never NaN") {
    import spark.implicits._
    val pts = Seq(
      ("a", 1L, 3L), ("a", 2L, 5L), ("a", 3L, 7L),   // y = 2x + 1 exactly
      ("b", 4L, 1L), ("b", 4L, 9L),                   // zero x-variance
      ("c", 1L, 5L), ("c", 2L, 5L)                    // zero y-variance
    ).toDF("g", "x", "y")
    val got = graft.operators.Eval.groupOls(pts, "g", "x", "y")
      .orderBy("g").collect()
    val a = got(0)
    assert(a.getLong(1) === 3L && a.getDouble(2) === 1.0 && a.getDouble(3) === 2.0)
    val b = got(1)
    assert(b.isNullAt(2) && b.isNullAt(3), s"zero x-variance must NULL: $b")
    val c = got(2)
    assert(c.isNullAt(2), s"zero y-variance must NULL corr: $c")
    assert(c.getDouble(3) === 0.0, s"flat y over varying x is slope 0: $c")
  }

  test("constraintAudit: every check family counts its violations on a " +
      "hand fixture; nulls excluded from domain checks") {
    import spark.implicits._
    val fact = Seq(
      (Some(1L), Some(10.0), Some("O")),
      (Some(1L), Some(-5.0), Some("F")),   // dup key; below range
      (Some(2L), Some(20.0), Some("X")),   // bad status
      (None, Some(999.0), None),           // null key; above range
      (Some(9L), None, Some("O"))          // orphan key (dim has 1, 2)
    ).toDF("k", "price", "status")
    val dim = Seq(1L, 2L).toDF("dk")
    val got = Pipeline.constraintAudit(fact,
      notNull = Seq("k"), unique = Seq("k"),
      ranges = Seq(("price", 0.0, 100.0)),
      accepted = Seq(("status", Seq("O", "F"))),
      refs = Seq(("k", dim, "dk")))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSeq.sorted
    assert(got === Seq(
      ("accepted_values", "status", 4L, 1L),
      ("in_range", "price", 4L, 2L),
      ("not_null", "k", 5L, 1L),
      ("ref_integrity", "k", 4L, 1L),
      ("unique", "k", 4L, 1L)))
  }

  test("coverageSelect: greedy max-marginal-coverage order on a hand " +
      "corpus; id tiebreak; exhaustion stops early") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c"),        // 3 tokens
      (2L, "a b c d"),      // 4 tokens — round 1 winner
      (3L, "e f"),          // 2 new after doc 2 — round 2 winner
      (4L, "a e"),          // fully covered after rounds 1-2
      (5L, "g")             // 1 new — round 3 winner
    ).toDF("doc_id", "text")
    val got = Pipeline.coverageSelect(docs, rounds = 6)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1, 2L, 4L), (2, 3L, 2L), (3, 5L, 1L)),
      s"greedy picks diverge: $got")
    // tie in round 1 (docs 1 and 2 both 3 tokens) → smaller id wins
    val tie = Seq((2L, "x y z"), (1L, "p q r")).toDF("doc_id", "text")
    val t1 = Pipeline.coverageSelect(tie, rounds = 1).collect()(0)
    assert(t1.getLong(1) === 1L)
  }

  test("preferencePairs: rank-i best pairs rank-i worst per group; " +
      "zero-margin and self pairs dropped") {
    import spark.implicits._
    val docs = Seq(
      ("s1", 1L, 0.9), ("s1", 2L, 0.7), ("s1", 3L, 0.5), ("s1", 4L, 0.1),
      ("s2", 5L, 0.4), ("s2", 6L, 0.4)   // all-tied group → no pairs
    ).toDF("source", "doc_id", "score")
    val got = Pipeline.preferencePairs(docs, "score", pairs = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq.sorted
    // s1: (best1=1, worst1=4, .8), (best2=2, worst2=3, .2)
    assert(got === Seq(("s1", 1L, 1L, 4L, 0.8), ("s1", 2L, 2L, 3L, 0.2)))
  }

  test("jackknifeMean: closed-form leave-one-out means and deltas") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 5.0), ("c", 7.0), ("c", 9.0))
      .toDF("g", "v")
    val got = graft.operators.Eval.jackknifeMean(df, "g", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sorted
    assert(got === Seq(
      ("a", 3L, BigDecimal(21.0 / 3).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble),
      ("b", 4L, 5.0),
      ("c", 3L, 3.0)))
    // single-group frame: no leave-one-out rows (nt == ng)
    val one = Seq(("a", 1.0)).toDF("g", "v")
    assert(graft.operators.Eval.jackknifeMean(one, "g", "v").count() === 0L)
  }

  test("temporalEmbargoSplit + audit: gap rows dropped, shared entities " +
      "counted once") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, to_timestamp}
    val rows = Seq(
      (1L, "2024-01-01 00:00:00"), (1L, "2024-01-25 00:00:00"), // both sides
      (2L, "2024-01-05 00:00:00"),                              // train only
      (3L, "2024-01-21 00:00:00"),                              // gap → gone
      (4L, "2024-01-24 00:00:00"), (4L, "2024-01-26 00:00:00")  // test only
    ).toDF("user_id", "_ts")
      .withColumn("ts", to_timestamp(col("_ts"))).drop("_ts")
    val split = Pipeline.temporalEmbargoSplit(
      rows, "ts", "2024-01-20 00:00:00", 72)
    assert(split.count() === 5L, "the gap row is removed")
    val got = Pipeline.temporalSplitAudit(split, "user_id")
      .orderBy("split").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === Seq(("test", 3L, 2L, 1L), ("train", 2L, 2L, 1L)))
  }

  test("gini: equal values → 0; full concentration → (n−1)/n; " +
      "hand histogram value") {
    import spark.implicits._
    val eq = Seq(5L, 5L, 5L, 5L).toDF("v")
    assert(Pipeline.gini(eq, "v").collect()(0).getDouble(2) === 0.0)
    val conc = Seq(0L, 0L, 0L, 100L).toDF("v")
    // ranks 1..4, Σrank·x = 4·100 → G = 800/(4·100) − 5/4 = 0.75
    assert(Pipeline.gini(conc, "v").collect()(0).getDouble(2) === 0.75)
    // values 1,2,3,4: Σrank·x = 1+4+9+16 = 30 → 60/40 − 5/4 = 0.25
    val g = Pipeline.gini(Seq(3L, 1L, 4L, 2L).toDF("v"), "v").collect()(0)
    assert((g.getLong(0), g.getLong(1), g.getDouble(2)) === ((4L, 10L, 0.25)))
    // duplicate values use the closed-form rank-block sum
    val dup = Pipeline.gini(Seq(1L, 1L, 2L).toDF("v"), "v").collect()(0)
    // ranks: 1,2 → value 1; 3 → 2; Σ = 1+2+6 = 9 → 18/12 − 4/3 = 1/6
    assert(dup.getDouble(2) === BigDecimal(1.0 / 6).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("waterfillAllocate: saturation re-flows surplus proportionally; " +
      "exact integer rounds") {
    import spark.implicits._
    val per = Seq(("a", 1000L, 100L), ("b", 1000L, 10000L),
      ("c", 2000L, 10000L)).toDF("source", "weight1e6", "cap")
    val got = Pipeline.waterfillAllocate(per, 4000L).collect()
      .map(r => (r.getString(0), r.getLong(3), r.getBoolean(4)))
      .toSeq.sortBy(_._1)
    // round 1: a gets 1000 ≥ cap 100 → saturates; round 2 splits the
    // remaining 3900 over w 1000:2000 → 1300 / 2600
    assert(got === Seq(("a", 100L, true), ("b", 1300L, false),
      ("c", 2600L, false)))
    // budget above Σcaps: everyone saturates at cap
    val all = Pipeline.waterfillAllocate(per, 1000000L).collect()
      .map(r => (r.getString(0), r.getLong(3), r.getBoolean(4)))
      .toSeq.sortBy(_._1)
    assert(all === Seq(("a", 100L, true), ("b", 10000L, true),
      ("c", 10000L, true)))
    // degenerate zero weights: nothing allocated, nothing saturated
    val zw = Seq(("a", 0L, 5L)).toDF("source", "weight1e6", "cap")
    val gz = Pipeline.waterfillAllocate(zw, 100L).collect()(0)
    assert(gz.getLong(3) === 0L && !gz.getBoolean(4))
  }

  test("neymanAllocate: zero-variance stratum gets nothing; population " +
      "clamp flags; largest-remainder tie breaks by stratum") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // A has spread (sigma 5000), B is constant (sigma 0) → all budget to A
    val ab = ((1 to 5).map(i => ("A", 0L)) ++ (1 to 5).map(i => ("A", 10000L))
      ++ (1 to 10).map(i => ("B", 7000L))).toDF("source", "u")
    val got = Pipeline.neymanAllocate(ab, "source", col("u"), 6L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(got("A") === ((10L, 5000.0, 6L, false)))
    assert(got("B") === ((10L, 0.0, 0L, false)))
    // budget beyond the only eligible population: clamp + flag
    val gc = Pipeline.neymanAllocate(ab, "source", col("u"), 20L)
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getBoolean(4)))
      .toMap
    assert(gc("A") === ((10L, true)) && gc("B") === ((0L, false)))
    // equal weights, budget 3: quotas 1.5/1.5 → remainder tie → the
    // lexicographically smaller stratum takes the extra unit
    val eq = (Seq(("A", 0L), ("A", 1000L)) ++ Seq(("B", 0L), ("B", 1000L)))
      .toDF("source", "u")
    val ge = Pipeline.neymanAllocate(eq, "source", col("u"), 3L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(ge === Map("A" -> 2L, "B" -> 1L))
  }

  test("isotonic PAV: violating adjacent rates pool; monotone input stays " +
      "unpooled; calibrate joins every score to its block") {
    import spark.implicits._
    import graft.operators.Eval
    // score 1: 0/2, score 2: 2/2, score 3: 1/2 → (2,3) violate → pool 3/4
    val scored = Seq((1L, false), (1L, false), (2L, true), (2L, true),
      (3L, true), (3L, false)).toDF("score", "keep")
    val blocks = Eval.isotonicFit(scored)
    assert(blocks === Seq(Eval.IsoBlock(1L, 1L, 2L, 0L),
      Eval.IsoBlock(2L, 3L, 4L, 3L)))
    val cal = Eval.isotonicCalibrate(scored, blocks)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(cal(1L) === ((2L, 0L, 0.0)))
    assert(cal(2L) === ((2L, 2L, 0.75)) && cal(3L) === ((2L, 1L, 0.75)))
    // already monotone: blocks stay per-score
    val mono = Seq((1L, false), (1L, true), (2L, true), (2L, true))
      .toDF("score", "keep")
    assert(Eval.isotonicFit(mono) === Seq(Eval.IsoBlock(1L, 1L, 2L, 1L),
      Eval.IsoBlock(2L, 2L, 2L, 2L)))
  }

  test("cuped: a perfectly predictive covariate removes all shared " +
      "variance — hand-computed theta, adjusted means, reduction") {
    import spark.implicits._
    import graft.operators.Eval
    // y = 2x + effect (0 control / 1 treatment), x balanced across arms:
    // theta = 2 exactly; var_adj = var(effect) = 0.25; means unchanged
    val units = Seq(
      ("control", 1L, 2L), ("control", 2L, 4L), ("control", 3L, 6L),
      ("treatment", 1L, 3L), ("treatment", 2L, 5L), ("treatment", 3L, 7L))
      .toDF("variant", "x", "y")
    val got = Eval.cuped(units, 1.0).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
        r.getDouble(7))).toMap
    assert(got("control") === ((3L, 4.0, 4.0, 2.0, 2.916667, 0.25, 0.914286)))
    assert(got("treatment") === ((3L, 5.0, 5.0, 2.0, 2.916667, 0.25, 0.914286)))
  }

  test("bootstrapCi: constant values collapse the CI to the mean; CI is " +
      "ordered and deterministic") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.operators.Eval
    val const = (1L to 50L).map(i => ("s1", i, 7000L)).toDF("source", "id", "u")
    val rc = Eval.bootstrapCi(const, "source", "id", col("u"), 1e4)
      .collect()(0)
    assert((rc.getLong(1), rc.getDouble(2), rc.getDouble(3),
      rc.getDouble(4)) === ((50L, 0.7, 0.7, 0.7)))
    val spread = (1L to 200L).map(i => ("s1", i, (i % 13) * 1000L))
      .toDF("source", "id", "u")
    val r1 = Eval.bootstrapCi(spread, "source", "id", col("u"), 1e4).collect()(0)
    val r2 = Eval.bootstrapCi(spread, "source", "id", col("u"), 1e4).collect()(0)
    assert(r1 === r2)
    assert(r1.getDouble(3) <= r1.getDouble(4))
    assert(r1.getDouble(3) <= r1.getDouble(2) &&
      r1.getDouble(2) <= r1.getDouble(4))
  }

  test("packingReport: hand-counted budget arithmetic at maxLen 4") {
    import spark.implicits._
    val docs = Seq(("s1", "a b c d e f"), ("s1", "a b"))
      .toDF("source", "text")
    val r = Pipeline.packingReport(docs, 4).collect()(0)
    // tokens 6+2: one overflow doc, 2 truncated, 6 kept, ceil(6/4)=2 bins,
    // fill 6/8
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6), r.getDouble(7)) ===
      ((2L, 8L, 1L, 2L, 6L, 2L, 0.75)))
  }

  test("winsorizedStats: p20/p80 clamp on 1..10 — hand mean/std") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = (1 to 10).map(v => ("s1", v.toLong)).toDF("source", "u")
    val r = Pipeline.winsorizedStats(docs, col("u"), 20, 80).collect()(0)
    // lo=2 hi=8 → clamped [2,2,3,4,5,6,7,8,8,8]: Σ=53 Σ²=335
    // mean 5.3, var 33.5−5.3² = 5.41, std 2.325941
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) === ((2L, 8L, 10L)))
    assert(r.getDouble(4) === 5.3 && r.getDouble(5) === 2.325941)
  }

  test("kendallTau: perfect concordance 1, reverse −1, balanced ties 0, " +
      "degenerate margin guarded to 0") {
    import spark.implicits._
    import graft.operators.Eval
    val up = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("x", "y")
    assert(Eval.kendallTau(up, "x", "y").collect()(0).getDouble(1) === 1.0)
    val down = Seq((1L, 3L), (2L, 2L), (3L, 1L)).toDF("x", "y")
    assert(Eval.kendallTau(down, "x", "y").collect()(0).getDouble(1) === -1.0)
    // 2×2 balanced: one concordant, one discordant, four tied pairs
    val bal = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)).toDF("x", "y")
    val rb = Eval.kendallTau(bal, "x", "y").collect()(0)
    assert(rb.getLong(0) === 4L && rb.getDouble(1) === 0.0)
    // all-tied y margin: τ-b undefined → 0.0 by contract
    val deg = Seq((1L, 5L), (2L, 5L)).toDF("x", "y")
    assert(Eval.kendallTau(deg, "x", "y").collect()(0).getDouble(1) === 0.0)
  }

  test("ksStat: identical samples → 0; disjoint point masses → 1; " +
      "hand two-value case → 0.5") {
    import spark.implicits._
    import graft.operators.Eval
    val a = Seq(1.0, 2.0, 3.0).toDF("v")
    val same = Eval.ksStat(a, a, "v").collect()(0)
    assert((same.getLong(0), same.getLong(1), same.getDouble(2)) ===
      ((3L, 3L, 0.0)))
    // point mass at 0 vs point mass at 2.5: at v=0 the gap is 1
    val pa = Seq(0.0, 0.0).toDF("v"); val pb = Seq(2.5, 2.5).toDF("v")
    assert(Eval.ksStat(pa, pb, "v").collect()(0).getDouble(2) === 1.0)
    // a = {0, 1}, b = {0, 2}: gaps 0 at v=0, 0.5 at v=1, 0 at v=2
    val ha = Seq(0.0, 1.0).toDF("v"); val hb = Seq(0.0, 2.0).toDF("v")
    assert(Eval.ksStat(ha, hb, "v").collect()(0).getDouble(2) === 0.5)
  }

  test("fdrDrift: a fully-drifted group alarms, an identical-halves group " +
      "doesn't; BH ranks and the one-term p are the hand values") {
    import graft.operators.Eval
    // "drift": early all 0, late all 10 → D = 1, p = 2e^{-2·25/10} = 2e^{-5}
    // "stable": both halves {0, 1} → D = 0 → p clamps to 1
    val rows =
      (0 until 5).flatMap(i => Seq(("drift", 0L, false), ("drift", 10L, true),
        ("stable", i.toLong % 2, false), ("stable", i.toLong % 2, true)))
    val out = Eval.fdrDrift(rows.toDF("source", "u", "late"),
        "source", "u", "late")
      .collect().map(r => r.getString(0) -> r).toMap
    val d = out("drift"); val s = out("stable")
    assert((d.getLong(1), d.getLong(2), d.getDouble(3)) === ((5L, 5L, 1.0)))
    assert(d.getDouble(4) === BigDecimal(2.0 * math.exp(-5.0))
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert((d.getLong(5), d.getBoolean(6)) === ((1L, true)))
    assert((s.getDouble(3), s.getDouble(4)) === ((0.0, 1.0)))
    assert((s.getLong(5), s.getBoolean(6)) === ((2L, false)))
  }

  test("conformalInterval: hand median/radius/coverage on one group") {
    import graft.operators.Eval
    // calibration 0,10,20,30,40: median (k=3) = 20; residuals 0,10,10,20,20
    // with k = min(5, ceil(6·9/10)) = 5 → qhat = 20. Eval 15/40 covered,
    // 45 not → coverage 2/3.
    val rows = Seq(0L, 10L, 20L, 30L, 40L).map(v => ("g", v, true)) ++
      Seq(15L, 45L, 40L).map(v => ("g", v, false))
    val r = Eval.conformalInterval(rows.toDF("source", "u", "cal"),
      "source", "u", "cal").head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
      ((5L, 3L, 20L, 20L)))
    assert(r.getDouble(5) === BigDecimal(2.0 / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("quantileNormalize: equal-size disjoint-range sources map onto the " +
      "SAME pooled quantiles; mapping covers every (source, v); monotone") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // source A scores 1..4, source B scores 11..14 — after normalization
    // the p-th percentile of each source lands on the same pooled value
    val docs = (Seq(1, 2, 3, 4).map(v => ("A", v.toDouble)) ++
      Seq(11, 12, 13, 14).map(v => ("B", v.toDouble))).toDF("source", "v")
    val got = Pipeline.quantileNormalize(docs, "source", col("v"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    assert(got.size === 8 && got.values.forall(_._2 === 1L))
    // pooled sorted: 1 2 3 4 11 12 13 14; levels .25/.5/.75/1 → 2 4 12 14
    assert(got(("A", 1.0))._1 === 2.0 && got(("B", 11.0))._1 === 2.0)
    assert(got(("A", 2.0))._1 === 4.0 && got(("B", 12.0))._1 === 4.0)
    assert(got(("A", 3.0))._1 === 12.0 && got(("B", 13.0))._1 === 12.0)
    assert(got(("A", 4.0))._1 === 14.0 && got(("B", 14.0))._1 === 14.0)
    // duplicate values fold into one mapping row carrying the doc count
    val dup = Seq(("C", 5.0), ("C", 5.0), ("C", 7.0)).toDF("source", "v")
    val gd = Pipeline.quantileNormalize(dup, "source", col("v"))
      .collect().map(r => (r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    assert(gd === Seq((5.0, 5.0, 2L), (7.0, 7.0, 1L)))
  }

  test("wasserstein1: identical samples → 0; shifted point masses → the " +
      "shift; hand two-segment case") {
    import spark.implicits._
    import graft.operators.Eval
    val a = Seq(1.0, 2.0, 3.0).toDF("v")
    val same = Eval.wasserstein1(a, a, "v").collect()(0)
    assert((same.getLong(0), same.getLong(1), same.getDouble(2)) ===
      ((3L, 3L, 0.0)))
    // point mass at 0 vs point mass at 2.5 → W1 = 2.5
    val pa = Seq(0.0, 0.0).toDF("v"); val pb = Seq(2.5, 2.5).toDF("v")
    assert(Eval.wasserstein1(pa, pb, "v").collect()(0).getDouble(2) === 2.5)
    // a = {0, 1}, b = {0, 2}: |CDF| diff is 0 on [0,1), 0.5 on [1,2) → 0.5
    val ha = Seq(0.0, 1.0).toDF("v"); val hb = Seq(0.0, 2.0).toDF("v")
    assert(Eval.wasserstein1(ha, hb, "v").collect()(0).getDouble(2) === 0.5)
    // single shared value on both sides: no segment, W1 = 0
    val one = Seq(7.0).toDF("v")
    assert(Eval.wasserstein1(one, one, "v").collect()(0).getDouble(2) === 0.0)
  }

  test("rboAt: analytic k=2 p=0.5 cases — agreement 0.75, swapped 0.25, " +
      "disjoint 0.0") {
    import spark.implicits._
    import graft.operators.Eval
    def rk(rows: (Long, Int, Long)*) =
      rows.toSeq.toDF("query_id", "rank", "id")
    val a = rk((1L, 1, 10L), (1L, 2, 20L))
    // identical prefixes: w(1)+w(2) = 0.625 + 0.125
    assert(Eval.rboAt(a, a, 2, 0.5).collect()(0).getDouble(1) === 0.75)
    // same ids, opposite order: both matches at depth 2 → 2·0.125
    val b = rk((1L, 1, 20L), (1L, 2, 10L))
    assert(Eval.rboAt(a, b, 2, 0.5).collect()(0).getDouble(1) === 0.25)
    // disjoint ids: zero matches → 0.0 via the query-list left join
    val c = rk((1L, 1, 30L), (1L, 2, 40L))
    assert(Eval.rboAt(a, c, 2, 0.5).collect()(0).getDouble(1) === 0.0)
  }

  test("mapAt: hand AP — hits at ranks 1 and 3 of 2 relevant → 5/6; " +
      "zero-hit query → 0") {
    import spark.implicits._
    import graft.operators.Eval
    def rk(rows: (Long, Int, Long)*) =
      rows.toSeq.toDF("query_id", "rank", "id")
    val truth = rk((1L, 1, 10L), (1L, 2, 20L), (2L, 1, 10L))
    // q1: rank1 = hit (P=1), rank2 = miss, rank3 = hit (P=2/3) → AP =
    // (1 + 2/3)/2; q2: all misses → 0.0
    val res = rk((1L, 1, 10L), (1L, 2, 99L), (1L, 3, 20L),
      (2L, 1, 77L), (2L, 2, 88L), (2L, 3, 99L))
    val got = Eval.mapAt(res, truth, 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def r8(x: Double) = BigDecimal(x).setScale(8,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = BigDecimal(r8(1.0 / 1 / 2) + r8(2.0 / 3 / 2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) === want && got(2L) === 0.0)
    // perfect ranking → AP = 1
    val perfect = Eval.mapAt(truth, truth, 3).collect()
      .map(r => r.getDouble(1))
    assert(perfect.forall(_ === 1.0))
  }

  test("benfordAudit: integer-cents digit extraction; non-positive and " +
      "null values dropped; zero-count digits kept") {
    import spark.implicits._
    val vals = Seq(Some(1.23), Some(0.05), Some(9.99), Some(2.00),
      Some(-3.0), None, Some(0.004)).toDF("v")
    val got = Pipeline.benfordAudit(vals, "v").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq.sortBy(_._1)
    assert(got.map(_._1) === (1 to 9))
    val byDigit = got.map(g => g._1 -> g._2).toMap
    assert(byDigit === Map(1 -> 1L, 2 -> 1L, 3 -> 0L, 4 -> 0L, 5 -> 1L,
      6 -> 0L, 7 -> 0L, 8 -> 0L, 9 -> 1L))
    assert(got.head._3 === 0.25 && got.head._4 === 0.30103)
  }
}
